"""Charset detection for fetched payloads.

Reference: ``util/EncodingDetector.java`` — clue list in priority
order (with the ICU statistical detector off at its default
``encodingdetector.charset.min.confidence = -1``):

1. the HTTP ``Content-Type`` header's ``charset=`` parameter
   (``autoDetectClues`` adds the header clue first),
2. sniffed from the first 2000 bytes (``sniffCharacterEncoding``):
   ``<meta http-equiv=content-type ...charset=...>`` (single or double
   quotes, NUTCH-1006), then the HTML5 ``<meta charset=...>``, then a
   UTF-8 / UTF-16LE / UTF-16BE BOM,
3. the configured default (``parser.character.encoding.default`` =
   ``windows-1252``).

Aliases (``EncodingDetector`` static block): iso-8859-1 →
windows-1252, euc-kr → x-windows-949, x-euc-cn → gb18030.

Spark shape: one Column expression — binary substring for the BOM,
US-ASCII-decoded head for the meta regexes (the reference also pads
bytes to chars and matches ASCII patterns), all under whole-stage
codegen; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: sniffCharacterEncoding CHUNK_SIZE
CHUNK_SIZE = 2000

#: EncodingDetector ALIASES (lower-cased; applied to every clue)
ALIASES = {
    "iso-8859-1": "windows-1252",
    "euc-kr": "x-windows-949",
    "x-euc-cn": "gb18030",
}

_CHARSET = r"charset=\s*([a-zA-Z][_\-0-9a-zA-Z]*)"
# metaPattern + charsetPattern composed (the reference first isolates
# the http-equiv meta tag, then extracts charset= inside it)
_META_HTTP_EQUIV = (
    r"(?i)<meta\s+[^>]*http-equiv=(?:\"|')?content-type(?:\"|')?[^>]*>"
)
_META_HTML5 = r"(?i)<meta\s+charset\s*=\s*[\"']?([a-zA-Z][_\-0-9a-zA-Z]*)[^>]*>"


def _alias(enc: Column) -> Column:
    out = F.lower(enc)
    for k, v in ALIASES.items():
        out = F.when(out == k, F.lit(v)).otherwise(out)
    return out


def sniff_encoding_col(
    content: Column,
    header_content_type: Column | None = None,
    default: str = "windows-1252",
) -> Column:
    """Detected charset name (lower-cased) for a binary payload, with
    the reference's clue priority. ``header_content_type`` is the raw
    HTTP Content-Type header value (may be a plain mime type)."""
    # ISO-8859-1 maps every byte 1:1 to U+0000..U+00FF — exactly the
    # reference's pad-byte-to-16-bit trick, and never malformed under
    # Spark 4's strict decode (US-ASCII would throw on the BOM bytes)
    head = F.decode(F.substring(content, 1, CHUNK_SIZE), "ISO-8859-1")
    meta_tag = F.regexp_extract(head, _META_HTTP_EQUIV, 0)
    meta = F.regexp_extract(meta_tag, "(?i)" + _CHARSET, 1)
    html5 = F.regexp_extract(head, _META_HTML5, 1)
    bom3 = F.substring(content, 1, 3)
    bom2 = F.substring(content, 1, 2)
    bom = (
        F.when(bom3 == F.lit(b"\xef\xbb\xbf"), "utf-8")
        .when(bom2 == F.lit(b"\xff\xfe"), "utf-16le")
        .when(bom2 == F.lit(b"\xfe\xff"), "utf-16be")
        .otherwise("")
    )
    header = (
        F.regexp_extract(header_content_type, "(?i)" + _CHARSET, 1)
        if header_content_type is not None
        else F.lit("")
    )
    first = F.coalesce(
        *[F.nullif(c, F.lit("")) for c in (header, meta, html5, bom)],
        F.lit(default),
    )
    return _alias(first)
