"""ARC web-archive reader: archive files -> fetched-content rows.

Reference: ``tools/arc/ArcRecordReader.java`` (+ ``ArcInputFormat``):
"Arc files are essentially tars of gzips. Each record in an arc file
is a compressed gzip. Multiple records are concatenated together to
form a complete arc" (:43-46). The reader inflates one gzip member
per record; the FIRST line of the inflated bytes is the ARC header
(``URL IP date mimetype length``), the rest is the raw content
(:262-275). The first record of every ARC file is the file
description record (``filedesc://...`` version block).

Spark shape: ``spark.read.format("binaryFile")`` lists the archive
files (one task per file — ARC corpora ship as many ~100 MB
``.arc.gz`` parts, so file-level parallelism IS the split strategy),
then a ``mapInPandas`` walks each file's gzip members with
``zlib.decompressobj``'s ``unused_data`` chaining — exact member
boundaries, no magic-number rescans or false positives (the
reference's split-scan overshoot, ArcRecordReader.java:283-287, is a
workaround for reading MID-file; whole-member iteration doesn't need
it). Output rows are protocol-response-shaped so they feed
``parse_dispatch`` directly (the ArcSegmentCreator role).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("arc_file", T.StringType()),
        T.StructField("record_index", T.IntegerType()),
        T.StructField("url", T.StringType()),
        T.StructField("ip", T.StringType()),
        T.StructField("fetch_ms", T.LongType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("declared_length", T.LongType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("is_filedesc", T.BooleanType()),
        T.StructField("arc_ok", T.BooleanType()),
    ]
)


def _arc_date_ms(ts: str) -> int | None:
    """ARC date YYYYMMDDHHMMSS (UTC) -> epoch ms."""
    import calendar
    import time as _time

    try:
        return calendar.timegm(_time.strptime(ts[:14], "%Y%m%d%H%M%S")) * 1000
    except (ValueError, OverflowError):
        return None


def iter_arc_members(blob: bytes, max_member_bytes: int = 1 << 28):
    """Yield the inflated bytes of each concatenated gzip member.
    A member that fails to inflate ends the iteration (truncated or
    corrupt tail); inflation is capped per member (untrusted input)."""
    import zlib

    rest = blob
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out = d.decompress(rest, max_member_bytes)
        except zlib.error:
            return
        if not d.eof:
            # whole blob was offered in one call, so a member that
            # never reached its gzip trailer is truncated (or blew the
            # inflation cap) -> stop, don't yield garbage
            return
        yield out
        rest = d.unused_data


def parse_arc_record(inflated: bytes) -> dict:
    """Split one inflated record into (header fields, raw content):
    the first line is ``URL IP date mimetype length``
    (ArcRecordReader.java:262-275)."""
    eol = inflated.find(b"\n")
    if eol < 0:
        return {"arc_ok": False}
    header = inflated[:eol].decode("utf-8", errors="replace").strip()
    raw = inflated[eol + 1 :]
    parts = header.split(" ")
    if len(parts) < 5:
        return {"arc_ok": False}
    url, ip, date, mime, length = parts[0], parts[1], parts[2], parts[3], parts[4]
    return {
        "url": url,
        "ip": ip,
        "fetch_ms": _arc_date_ms(date),
        "content_type": mime,
        "declared_length": int(length) if length.isdigit() else None,
        "bytes": raw,
        "is_filedesc": url.startswith("filedesc://"),
        "arc_ok": True,
    }


def arc_records_from_blobs(
    blobs: DataFrame,
    keep_filedesc: bool = False,
    max_member_bytes: int = 1 << 28,
) -> DataFrame:
    """One row per ARC record from a ``(path: string, content: binary)``
    DataFrame of whole archive blobs — the shared core of ``read_arc``
    (binaryFile input) and the in-memory oracle query (synthesized
    archives); both must agree because this IS the same code path."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _records(it):
        cols = [f.name for f in ARC_RECORD_SCHEMA.fields]
        for pdf in it:
            rows = []
            for fname, blob in zip(pdf["path"], pdf["content"]):
                for i, member in enumerate(
                    iter_arc_members(bytes(blob), max_member_bytes)
                ):
                    rec = {"arc_file": fname, "record_index": i}
                    rec.update(parse_arc_record(member))
                    rows.append(rec)
            out = pd.DataFrame(rows, columns=cols)
            out["record_index"] = out["record_index"].astype("int32")
            out["fetch_ms"] = out["fetch_ms"].astype("Int64")
            out["declared_length"] = out["declared_length"].astype("Int64")
            yield out

    recs = blobs.select("path", "content").mapInPandas(
        _records, ARC_RECORD_SCHEMA
    )
    if not keep_filedesc:
        recs = recs.filter(~F.coalesce(F.col("is_filedesc"), F.lit(False)))
    return recs


def read_arc(
    spark: SparkSession,
    path: str,
    keep_filedesc: bool = False,
    max_member_bytes: int = 1 << 28,
) -> DataFrame:
    """Read ``.arc.gz`` archives under ``path`` into one row per ARC
    record. ``keep_filedesc`` retains each file's version block row."""
    files = spark.read.format("binaryFile").load(path)
    return arc_records_from_blobs(
        files, keep_filedesc=keep_filedesc, max_member_bytes=max_member_bytes
    )
