"""Minimal PDF text extraction for the parse-tika fallback tier.

Reference: ``plugin/parse-tika`` routes ``application/pdf`` (an
unmapped type, so the ``*`` chain of parse-plugins.xml:27-29) through
Tika's PDF parser; ``parse-tika/src/test/.../TestPdfParser.java``
pins the contract — the parse text of a PDF document must contain the
page's text ("A VERY SMALL PDF FILE"), for both a plain and an
(empty-password) encrypted sample.

Real Tika/PDFBox is a JVM library outside this sandbox. This module
implements the deterministic subset with the stdlib:

- ``FlateDecode`` (zlib) and unfiltered content streams;
- text-show operators ``Tj``, ``'``, ``"``, ``TJ`` with literal
  strings (including escape sequences and octal escapes) and hex
  strings; one output line per show op, streams joined in document
  order — a deterministic, layout-free analog of Tika's text;
- ``/Title`` from the Info dictionary;
- ``/URI`` link-annotation actions as outlinks (Tika exposes link
  annotations; the reference admits them through the outlink
  normalize/filter chain like any other link).

Deviation (documented): encrypted documents (``/Encrypt`` in the
trailer) are DECLINED with a failed parse — RC4/AES decryption is out
of scope here, whereas PDFBox decrypts the empty-password sample.

``make_pdf`` builds a small valid single-page PDF (correct xref
offsets, optional FlateDecode) so tests and the oracle query can
round-trip documents through the exact production parse path.
"""

from __future__ import annotations

import re
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Extraction (pure functions — unit-testable without Spark)
# ---------------------------------------------------------------------------

# <<dict>> stream\r?\n ... endstream   (dict may be absent in theory,
# but a stream keyword is always preceded by its dict in valid PDFs)
_STREAM_RE = re.compile(
    rb"<<(?P<dict>(?:[^<>]|<<(?:[^<>]|<<[^<>]*>>)*>>)*)>>\s*"
    rb"stream\r?\n(?P<body>.*?)(?:\r?\n)?endstream",
    re.DOTALL,
)

# PDF literal string: ( ... ) with \-escapes; balanced unescaped
# parens inside are legal PDF but out of scope for this subset.
_LIT = rb"\((?P<lit>(?:[^()\\]|\\.)*)\)"
_HEX = rb"<(?P<hex>[0-9A-Fa-f\s]*)>"
_SHOW_RE = re.compile(
    rb"(?:" + _LIT + rb"|" + _HEX + rb")\s*(?:Tj|')"
    rb"|\[(?P<arr>(?:[^\[\]\\]|\\.)*)\]\s*TJ",
    re.DOTALL,
)
_ARR_ELEM_RE = re.compile(rb"(?:" + _LIT + rb"|" + _HEX + rb")", re.DOTALL)
_TITLE_RE = re.compile(rb"/Title\s*(?:" + _LIT + rb"|" + _HEX + rb")", re.DOTALL)
_URI_RE = re.compile(rb"/URI\s*(?:" + _LIT + rb"|" + _HEX + rb")", re.DOTALL)

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}
_ESC_RE = re.compile(rb"\\([0-7]{1,3}|\r\n|\n|\r|.)", re.DOTALL)


def _unescape(lit: bytes) -> bytes:
    def sub(m: re.Match) -> bytes:
        e = m.group(1)
        if e in (b"\r\n", b"\n", b"\r"):  # line continuation
            return b""
        if e[:1].isdigit() and e.isdigit():
            return bytes([int(e, 8) & 0xFF])
        return _ESCAPES.get(e, e)

    return _ESC_RE.sub(sub, lit)


def _string_of(m: re.Match) -> bytes:
    lit, hx = m.group("lit"), m.group("hex")
    if lit is not None:
        return _unescape(lit)
    hx = re.sub(rb"\s", b"", hx or b"")
    if len(hx) % 2:
        hx += b"0"  # PDF pads an odd final hex digit with 0
    return bytes.fromhex(hx.decode("ascii"))


def _pdf_text_ops(content: bytes) -> list[str]:
    """One decoded string per show operator, in stream order."""
    out = []
    for m in _SHOW_RE.finditer(content):
        arr = m.group("arr")
        if arr is not None:
            s = b"".join(_string_of(e) for e in _ARR_ELEM_RE.finditer(arr))
        else:
            s = _string_of(m)
        out.append(s.decode("utf-8", errors="replace"))
    return out


def pdf_extract(data: bytes, max_stream_bytes: int = 1 << 26) -> dict:
    """Parse a PDF blob into ``{pdf_ok, pdf_status, title, text, uris}``.

    Corrupt FlateDecode streams are skipped (an image-only or
    partially damaged document still yields its readable text, like
    Tika); only a missing magic or an /Encrypt trailer fails the parse.
    """
    if not data or not data.startswith(b"%PDF-"):
        return {
            "pdf_ok": False,
            "pdf_status": "failed: not a pdf document",
            "title": "",
            "text": "",
            "uris": [],
        }
    # the trailer's /Encrypt reference marks an encrypted document;
    # search the raw bytes (trailer dicts are never inside streams in
    # the documents this subset targets)
    if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", data):
        return {
            "pdf_ok": False,
            "pdf_status": "failed: encrypted pdf declined",
            "title": "",
            "text": "",
            "uris": [],
        }

    decoded_streams: list[bytes] = []
    for m in _STREAM_RE.finditer(data):
        d, body = m.group("dict"), m.group("body")
        if b"/FlateDecode" in d:
            try:
                body = zlib.decompress(body, bufsize=1 << 16)
            except zlib.error:
                continue
        if len(body) <= max_stream_bytes:
            decoded_streams.append(body)

    lines: list[str] = []
    for s in decoded_streams:
        lines.extend(_pdf_text_ops(s))

    title = ""
    tm = _TITLE_RE.search(data)
    if tm:
        title = _string_of(tm).decode("utf-8", errors="replace")

    uris: list[str] = []
    seen = set()
    for blob in (data, *decoded_streams):
        for um in _URI_RE.finditer(blob):
            u = _string_of(um).decode("utf-8", errors="replace")
            if u not in seen:
                seen.add(u)
                uris.append(u)

    return {
        "pdf_ok": True,
        "pdf_status": "success",
        "title": title,
        "text": "\n".join(lines),
        "uris": uris,
    }


# ---------------------------------------------------------------------------
# Deterministic writer (tests + oracle round-trip through the real path)
# ---------------------------------------------------------------------------


def _esc_lit(s: str) -> bytes:
    return (
        s.encode("utf-8")
        .replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
    )


def make_pdf(
    lines: list[str],
    title: str | None = None,
    uris: tuple[str, ...] | list[str] = (),
    compress: bool = True,
) -> bytes:
    """A valid deterministic single-page PDF: one ``Tj`` per line in
    a (optionally FlateDecode) content stream, ``/Title`` Info entry,
    one ``/URI`` link annotation per entry of ``uris``."""
    content = b"BT /F1 12 Tf 72 720 Td 14 TL\n"
    for i, line in enumerate(lines):
        if i:
            content += b"T*\n"
        content += b"(" + _esc_lit(line) + b") Tj\n"
    content += b"ET\n"
    filt = b""
    if compress:
        content = zlib.compress(content, 9)
        filt = b"/Filter /FlateDecode "

    annot_ids = list(range(6, 6 + len(uris)))
    annots = b""
    if annot_ids:
        annots = (
            b"/Annots ["
            + b" ".join(b"%d 0 R" % i for i in annot_ids)
            + b"] "
        )

    objs: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (
            3,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> "
            + annots
            + b"/Contents 4 0 R >>",
        ),
        (
            4,
            b"<< "
            + filt
            + b"/Length %d >>\nstream\n" % len(content)
            + content
            + b"\nendstream",
        ),
        (
            5,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        ),
    ]
    for oid, uri in zip(annot_ids, uris):
        objs.append(
            (
                oid,
                b"<< /Type /Annot /Subtype /Link /Rect [72 0 540 712] "
                b"/Border [0 0 0] /A << /S /URI /URI ("
                + _esc_lit(uri)
                + b") >> >>",
            )
        )
    info_id = 6 + len(uris)
    if title is not None:
        objs.append((info_id, b"<< /Title (" + _esc_lit(title) + b") >>"))

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for oid, body in objs:
        offsets[oid] = len(out)
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    xref_at = len(out)
    n = max(offsets) + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for oid in range(1, n):
        out += b"%010d 00000 n \n" % offsets.get(oid, 0)
    trailer = b"<< /Size %d /Root 1 0 R " % n
    if title is not None:
        trailer += b"/Info %d 0 R " % info_id
    trailer += b">>"
    out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark wrapper
# ---------------------------------------------------------------------------

_PDF_FIELDS = [
    T.StructField("pdf_ok", T.BooleanType()),
    T.StructField("pdf_status", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("uris", T.ArrayType(T.StringType())),
]

PDF_PARSE_SCHEMA = T.StructType(
    [T.StructField("url_hash", T.StringType()), *_PDF_FIELDS]
)


def pdf_parse_rows(
    slice_df: DataFrame,
    id_col: str = "url_hash",
    bytes_col: str = "bytes",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *passthrough, pdf_ok, pdf_status, title, text, uris) per
    input row — Arrow-batched; only the pdf slice of a dispatch ever
    reaches this. ``passthrough`` columns ride through the batch so
    the caller needs no join back onto the slice (one output row per
    input row, no shuffle)."""
    import pandas as pd

    schema = T.StructType(
        [T.StructField(id_col, T.StringType())]
        + [T.StructField(c, slice_df.schema[c].dataType) for c in passthrough]
        + _PDF_FIELDS
    )
    cols = [f.name for f in schema.fields]

    def _parse(it):
        for pdf in it:
            recs = []
            for i in range(len(pdf)):
                blob = pdf[bytes_col].iat[i]
                r = pdf_extract(bytes(blob) if blob is not None else b"")
                r[id_col] = pdf[id_col].iat[i]
                for c in passthrough:
                    r[c] = pdf[c].iat[i]
                recs.append(r)
            yield pd.DataFrame(recs, columns=cols)

    return slice_df.select(
        id_col, *passthrough, bytes_col
    ).mapInPandas(_parse, schema)
