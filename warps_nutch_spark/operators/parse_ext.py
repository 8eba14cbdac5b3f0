"""parse-ext: delegate parsing to an external command per content type.

Reference: ``plugin/parse-ext/.../ExtParser.java``:

- per content type the plugin config carries ``{command, timeout,
  encoding}`` (setConf, :140-175; default timeout 30 s); a content
  type with no command -> ParseStatus.FAILED "No external command
  defined" (:49-53);
- truncated content (raw length != the Content-Length header) ->
  FAILED_TRUNCATED without invoking the command (:69-77);
- the command runs as ``command + " " + contentType`` with the raw
  bytes on stdin and the extracted text on stdout in ``encoding``
  (:79-103); non-zero exit -> FAILED with the stderr text (:113);
- outlinks come from the generic ``OutlinkExtractor.getOutlinks``
  URL_PATTERN regex over the extracted text (:131), title is empty.

Spark shape: ``mapInPandas`` — per-row subprocess I/O is exactly the
reference's CommandRunner and inherently imperative; everything
downstream (outlink regex) is also exposed as a declarative column
(``text_outlinks_col``) so the common path stays JVM-side.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# parse/OutlinkExtractor.java:61 URL_PATTERN, compiled CASE_INSENSITIVE
# (:95-97) -> embedded (?i); every match becomes an outlink (:106-119).
URL_PATTERN = (
    r"([A-Za-z][A-Za-z0-9+.-]{1,120}:[A-Za-z0-9/]"
    r"(([A-Za-z0-9$_.+!*,;/?:@&~=-])|%[A-Fa-f0-9]{2}){1,333}"
    r"(#([a-zA-Z0-9][a-zA-Z0-9$_.+!*,;/?:@&~=%-]{0,1000}))?)"
)
_URL_RE = re.compile("(?i)" + URL_PATTERN)

EXT_PARSE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("parse_ok", T.BooleanType()),
        T.StructField("parse_status", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("outlinks", T.ArrayType(T.StringType())),
    ]
)

DEFAULT_TIMEOUT_S = 30.0  # ExtParser.TIMEOUT_DEFAULT


def extract_text_outlinks(text: str) -> list[str]:
    """OutlinkExtractor.getOutlinks over plain text (group 0 of every
    URL_PATTERN match, document order, duplicates kept)."""
    return [m.group(0) for m in _URL_RE.finditer(text or "")]


def text_outlinks_col(text: Column) -> Column:
    """Declarative form of the same extraction (JVM-side regex)."""
    return F.regexp_extract_all(text, F.lit("(?i)" + URL_PATTERN), 0)


def ext_parse(
    df: DataFrame,
    type_params: dict[str, tuple[str, float, str]],
    url_col: str = "url",
    bytes_col: str = "bytes",
    content_type_col: str = "content_type",
    content_length_col: str | None = None,
) -> DataFrame:
    """Run the configured external command over each row's raw bytes.

    ``type_params`` maps content type -> (command, timeout_s,
    encoding), the TYPE_PARAMS_MAP analog. Emits one row per input:
    ``parse_ok`` + a ParseStatus-like reason string, the stdout text,
    and URL_PATTERN outlinks over it.
    """
    import shlex
    import subprocess

    import pandas as pd

    cols = [url_col, bytes_col, content_type_col]
    if content_length_col:
        cols.append(content_length_col)
    proj = df.select(*cols)

    def _one(url, raw, ctype, clen) -> dict:
        out = {
            "url": url,
            "parse_ok": False,
            "parse_status": None,
            "text": None,
            "outlinks": None,
        }
        params = type_params.get(ctype or "")
        if params is None:
            out["parse_status"] = (
                f"failed: no external command defined for contentType: {ctype}"
            )
            return out
        command, timeout_s, encoding = params
        raw = bytes(raw) if raw is not None else b""
        if clen is not None and len(raw) != int(clen):
            out["parse_status"] = (
                f"failed_truncated: content truncated at {len(raw)} bytes"
            )
            return out
        try:
            proc = subprocess.run(
                shlex.split(command) + [ctype],
                input=raw,
                capture_output=True,
                timeout=timeout_s or DEFAULT_TIMEOUT_S,
            )
        except (subprocess.TimeoutExpired, OSError) as e:
            out["parse_status"] = f"failed: {type(e).__name__}"
            return out
        if proc.returncode != 0:
            err = proc.stderr.decode(encoding, errors="replace")[:200]
            out["parse_status"] = f"failed: exit {proc.returncode}: {err}"
            return out
        text = proc.stdout.decode(encoding, errors="replace")
        out.update(
            parse_ok=True,
            parse_status="success",
            text=text,
            outlinks=extract_text_outlinks(text),
        )
        return out

    def _batch(it):
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                clen = (
                    int(r[content_length_col])
                    if content_length_col and pd.notna(r[content_length_col])
                    else None
                )
                rows.append(
                    _one(r[url_col], r[bytes_col], r[content_type_col], clen)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in EXT_PARSE_SCHEMA.fields]
            )

    return proj.mapInPandas(_batch, EXT_PARSE_SCHEMA)
