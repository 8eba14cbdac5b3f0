"""OpenDocument / RTF / image-header extraction for the parse-tika tier.

Reference contracts (``plugin/parse-tika`` test suite):

- ``TestOOParser.java`` — ``ootest.odt`` / ``ootest.sxw`` (zip
  containers, text in ``content.xml``) must parse to the sample's
  paragraph text;
- ``TestRTFParser.java`` — ``test.rtf`` must yield title
  ``"test rft document"`` (the ``{\\info{\\title ...}}`` destination)
  and the document's plain text;
- ``TestImageMetadata.java`` — ``nutch_logo_tm.gif`` must expose
  ``width``/``height`` page metadata (Tika reads the image header; no
  pixel decode involved).

All three are implemented with the stdlib (zipfile + ElementTree for
ODF, a group-stack tokenizer for RTF, header arithmetic for
GIF/PNG/JPEG) and run Arrow-batched on the content-type slice the
dispatch routes here. ``make_odt`` / ``make_rtf`` build deterministic
documents so tests and the oracle query round-trip through the real
parse path.
"""

from __future__ import annotations

import io
import re
import struct
import zipfile
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# OpenDocument / OpenOffice-1.x (zip of content.xml; dc:title in meta.xml)
# ---------------------------------------------------------------------------

_TEXT_TAGS = ("}p", "}h")


def odf_extract(data: bytes, max_member_bytes: int = 1 << 26) -> dict:
    """Paragraph text (one line per text:p / text:h, document order)
    and the dc:title of an ODT/SXW container."""
    import xml.etree.ElementTree as ET

    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except (zipfile.BadZipFile, OSError):
        return {"ok": False, "status": "failed: corrupt container", "title": "", "text": ""}

    def _member(name: str) -> bytes | None:
        try:
            info = zf.getinfo(name)
        except KeyError:
            return None
        if info.file_size > max_member_bytes:
            return None
        with zf.open(info) as f:  # stream-capped like zip_entries
            return f.read(max_member_bytes)

    content = _member("content.xml")
    if content is None:
        return {"ok": False, "status": "failed: no content.xml", "title": "", "text": ""}
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return {"ok": False, "status": "failed: malformed content.xml", "title": "", "text": ""}
    lines = []
    for el in root.iter():
        if isinstance(el.tag, str) and el.tag.endswith(_TEXT_TAGS):
            lines.append("".join(el.itertext()))

    title = ""
    meta = _member("meta.xml")
    if meta:
        try:
            for el in ET.fromstring(meta).iter():
                if isinstance(el.tag, str) and el.tag.endswith("}title"):
                    title = el.text or ""
                    break
        except ET.ParseError:
            pass
    return {"ok": True, "status": "success", "title": title, "text": "\n".join(lines)}


def make_odt(
    paragraphs: list[str], title: str | None = None, mimetype: str = "application/vnd.oasis.opendocument.text"
) -> bytes:
    """A deterministic minimal ODT/SXW container (fixed zip timestamps)."""
    from xml.sax.saxutils import escape

    content = (
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:text>"
        + "".join(f"<text:p>{escape(p)}</text:p>" for p in paragraphs)
        + "</office:text></office:body></office:document-content>"
    )
    meta = (
        '<office:document-meta '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/">'
        "<office:meta><dc:title>"
        + escape(title or "")
        + "</dc:title></office:meta></office:document-meta>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, payload in (
            ("mimetype", mimetype.encode()),
            ("content.xml", content.encode()),
            ("meta.xml", meta.encode()),
        ):
            zi = zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0))
            zf.writestr(zi, payload)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# RTF (group-stack tokenizer; {\info{\title ...}} -> title)
# ---------------------------------------------------------------------------

_RTF_SKIP_DESTS = {
    "fonttbl",
    "colortbl",
    "stylesheet",
    "pict",
    "themedata",
    "filetbl",
    "listtable",
    "generator",
}
_RTF_TOKEN = re.compile(
    rb"\\'([0-9a-fA-F]{2})"  # hex escape
    rb"|\\u(-?\d+) ?\??"  # \uN with optional fallback '?'
    rb"|\\([a-zA-Z]+)(-?\d+)? ?"  # control word
    rb"|\\([^a-zA-Z])"  # control symbol
    rb"|([{}])"
    rb"|([^\\{}]+)",
    re.DOTALL,
)


def rtf_extract(data: bytes) -> dict:
    """Plain text + info-title of an RTF document. Unknown control
    words are dropped; skip-destinations (fonttbl, pict, ...) and
    ignorable ``{\\*`` groups contribute nothing."""
    if not data.lstrip()[:5].startswith(b"{\\rtf"):
        return {"ok": False, "status": "failed: not rtf", "title": "", "text": ""}
    text_parts: list[str] = []
    title_parts: list[str] = []
    # stack entries: (skipping, in_info, in_title)
    stack: list[tuple[bool, bool, bool]] = []
    skipping, in_info, in_title = False, False, False
    pending_dest = False  # just opened a group: next control word may name a destination

    def emit(s: str) -> None:
        if skipping:
            return
        if in_title:
            title_parts.append(s)
        else:
            text_parts.append(s)

    for m in _RTF_TOKEN.finditer(data):
        hx, uni, word, _param, sym, brace, plain = (
            m.group(1),
            m.group(2),
            m.group(3),
            m.group(4),
            m.group(5),
            m.group(6),
            m.group(7),
        )
        if brace == b"{":
            stack.append((skipping, in_info, in_title))
            pending_dest = True
            continue
        if brace == b"}":
            if stack:
                skipping, in_info, in_title = stack.pop()
            pending_dest = False
            continue
        if sym is not None:
            if sym == b"*" and pending_dest:
                skipping = True  # {\* ...}: ignorable destination
            elif sym in (b"\\", b"{", b"}") :
                emit(sym.decode())
            elif sym == b"~":
                emit("\xa0")  # \~ is a non-breaking space
            pending_dest = False
            continue
        if word is not None:
            w = word.decode()
            if pending_dest:
                if w in _RTF_SKIP_DESTS:
                    skipping = True
                elif w == "info":
                    in_info = True
                elif w == "title" and in_info:
                    in_title = True
            if w == "par" or w == "line":
                emit("\n")
            elif w == "tab":
                emit("\t")
            pending_dest = False
            continue
        pending_dest = False
        if hx is not None:
            emit(bytes([int(hx, 16)]).decode("cp1252", errors="replace"))
        elif uni is not None:
            code = int(uni)
            emit(chr(code + 65536 if code < 0 else code))
        elif plain is not None:
            emit(plain.replace(b"\r", b"").replace(b"\n", b"").decode("cp1252", errors="replace"))
    return {
        "ok": True,
        "status": "success",
        "title": "".join(title_parts).strip(),
        "text": "".join(text_parts).strip(),
    }


def make_rtf(text_lines: list[str], title: str | None = None) -> bytes:
    def esc(s: str) -> str:
        return s.replace("\\", "\\\\").replace("{", "\\{").replace("}", "\\}")

    info = "{\\info{\\title %s}}" % esc(title) if title is not None else ""
    body = "\\par ".join(esc(line) for line in text_lines)
    return (
        "{\\rtf1\\ansi{\\fonttbl{\\f0 Times New Roman;}}%s\\f0 %s}"
        % (info, body)
    ).encode("cp1252")


# ---------------------------------------------------------------------------
# Image headers: width/height metadata (GIF / PNG / JPEG), no decode
# ---------------------------------------------------------------------------


def image_dims(data: bytes) -> tuple[int, int] | None:
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return w, h
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24 and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return w, h
    if data[:2] == b"\xff\xd8":  # JPEG: scan for a frame header (SOFn)
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return w, h
            i += 2 + seglen
    return None


def make_gif_header(width: int, height: int) -> bytes:
    """A header-only GIF stub: valid logical-screen descriptor, no
    image data (the dims parse is header arithmetic, like Tika's)."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"


def make_png_header(width: int, height: int) -> bytes:
    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    crc = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + crc
    )


def make_jpeg_header(width: int, height: int) -> bytes:
    sof0 = struct.pack(">BHH", 8, height, width) + b"\x03"
    return (
        b"\xff\xd8"
        + b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + b"\xff\xc0"
        + struct.pack(">H", 2 + len(sof0))
        + sof0
    )


# ---------------------------------------------------------------------------
# Spark wrapper: one slice, three families, routed by content type
# ---------------------------------------------------------------------------

ODF_TYPES = (
    "application/vnd.oasis.opendocument.text",
    "application/vnd.sun.xml.writer",
)
RTF_TYPES = ("application/rtf", "text/rtf")
IMAGE_TYPES = ("image/gif", "image/png", "image/jpeg")

_OFFICE_FIELDS = [
    T.StructField("office_ok", T.BooleanType()),
    T.StructField("office_status", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
]

OFFICE_PARSE_SCHEMA = T.StructType(
    [T.StructField("url_hash", T.StringType()), *_OFFICE_FIELDS]
)


def office_parse_rows(
    slice_df: DataFrame,
    id_col: str = "url_hash",
    bytes_col: str = "bytes",
    content_type_col: str = "content_type",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *passthrough, ok, status, title, text, meta) per
    ODF/RTF/image row — Arrow-batched; only the office slice of a
    dispatch reaches this. ``passthrough`` columns ride through the
    batch so the caller needs no join back onto the slice."""
    import pandas as pd

    schema = T.StructType(
        [T.StructField(id_col, T.StringType())]
        + [T.StructField(c, slice_df.schema[c].dataType) for c in passthrough]
        + _OFFICE_FIELDS
    )
    cols = [f.name for f in schema.fields]

    def _parse(it):
        for pdf in it:
            recs = []
            for i in range(len(pdf)):
                ctype = pdf[content_type_col].iat[i]
                blob = pdf[bytes_col].iat[i]
                blob = bytes(blob) if blob is not None else b""
                meta: dict[str, str] = {}
                if ctype in ODF_TYPES:
                    r = odf_extract(blob)
                elif ctype in RTF_TYPES:
                    r = rtf_extract(blob)
                else:
                    dims = image_dims(blob)
                    if dims is None:
                        r = {"ok": False, "status": "failed: unreadable image header", "title": "", "text": ""}
                    else:
                        r = {"ok": True, "status": "success", "title": "", "text": ""}
                        meta = {"width": str(dims[0]), "height": str(dims[1])}
                rec = {
                    id_col: pdf[id_col].iat[i],
                    "office_ok": r["ok"],
                    "office_status": r["status"],
                    "title": r["title"],
                    "text": r["text"],
                    "meta": meta,
                }
                for c in passthrough:
                    rec[c] = pdf[c].iat[i]
                recs.append(rec)
            yield pd.DataFrame(recs, columns=cols)

    sel = [id_col, *passthrough]
    if content_type_col not in sel:
        sel.append(content_type_col)
    sel.append(bytes_col)
    return slice_df.select(*sel).mapInPandas(_parse, schema)
