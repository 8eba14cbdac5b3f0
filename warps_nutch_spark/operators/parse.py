"""Parse: decode fetched payloads, extract caption + outlinks, sign.

Reference mapping (SURVEY.md §2.5):
- X1 parser dispatch by contentType (``parse/ParseUtil.java:83-148``)
  -> a single vectorized decode over WNIM image bytes (the graft's
  only content type), run via ``mapInPandas`` (Arrow batches);
- X2 outlink extraction (``parse/OutlinkExtractor.java``) -> outlinks
  already ride the fetch result (the protocol returns them, like DOM
  anchors); parse owns their post-processing;
- X3 outlink normalize/filter/dedup/limit (``ParseUtil.java:196-274``)
  -> pure built-ins AFTER the UDF: transform(canonicalize) + asset
  suffix filter (js/css/jpg/png/jpeg/gif, line 236) + array_distinct
  + slice(db.max.outlinks.per.page);
- X4 signature: md5 of raw content, fallback md5(url)
  (``crawl/MD5Signature.java:44-66``) -> ``F.md5`` on bytes; plus the
  image pHash per input_hint;
- PARSE_MARK gate: only rows fetched in this batch are parsed
  (``ParserMapper.java:121-130``).

The decode is the only Python-side work and it is Arrow-batched; all
column logic after it is JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import CrawlConfig
from ..functions import codec, urls
from ..functions.status import CrawlStatus

PARSE_FIELDS = [
    T.StructField("image_id", T.StringType()),
    T.StructField("caption", T.StringType()),
    T.StructField("phash", T.LongType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("decode_ok", T.BooleanType()),
]

ASSET_SUFFIX_RE = r"\.(js|css|jpg|png|jpeg|gif)([?#].*)?$"


def process_outlinks_col(out_urls, cfg: CrawlConfig):
    """X3 outlink pipeline as one array expression (ParseUtil.java:
    196-274): canonicalize each raw URL, drop rejects (NULL) and asset
    suffixes, dedup preserving first occurrence, cap at
    db.max.outlinks.per.page. Pure built-ins — JVM-side, and the same
    logic is oracle-checked by the `outlink_normalize` driver query."""
    canon = F.transform(
        F.coalesce(out_urls, F.array().cast("array<string>")),
        lambda u: urls.canonicalize_col(u),
    )
    return F.slice(
        F.array_distinct(
            F.filter(canon, lambda u: u.isNotNull() & ~u.rlike(ASSET_SUFFIX_RE))
        ),
        1,
        cfg.max_outlinks_per_page,
    )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Input batches carry ONLY (url_hash, bytes); output carries ONLY
    (url_hash, parse columns) — the payload bytes never make the
    Python -> JVM return trip (they rejoin JVM-side by url_hash).
    This halves the Arrow traffic of the decode stage, which is
    memory-bandwidth-bound, not CPU-bound."""
    for pdf in batches:
        n = len(pdf)
        image_id = [None] * n
        caption = [None] * n
        phash = [None] * n
        ws = [None] * n
        hs = [None] * n
        fmts = [None] * n
        ok = [False] * n
        for i, blob in enumerate(pdf["bytes"]):
            if blob is None:
                continue
            try:
                px, cap, w, h, fmt = codec.decode_full(bytes(blob))
            except Exception:
                continue  # truncated/corrupt content (F12 analog)
            caption[i] = cap
            phash[i] = codec.phash(px)
            ws[i], hs[i], fmts[i] = w, h, fmt
            ok[i] = True
            if cap and cap.startswith("caption of "):
                image_id[i] = cap.split(" ")[2]
        yield pd.DataFrame(
            {
                "url_hash": pdf["url_hash"],
                "image_id": pd.array(image_id, dtype="string"),
                "caption": pd.array(caption, dtype="string"),
                "phash": pd.array(phash, dtype="Int64"),
                "w": pd.array(ws, dtype="Int32"),
                "h": pd.array(hs, dtype="Int32"),
                "fmt": pd.array(fmts, dtype="string"),
                "decode_ok": ok,
            }
        )


def parse(
    fetch_results: DataFrame,
    cfg: CrawlConfig,
    batch_id: str,
) -> DataFrame:
    """Returns fetch rows + parse columns + processed ``outlinks``
    array<struct<url,anchor>>. Non-success rows pass through with null
    parse columns (their redirect outlinks still get processed)."""
    gated = fetch_results.filter(
        (F.col("batch_id") == batch_id) & F.col("fetched")
    )
    # Python sees only (url_hash, bytes): distribute decode evenly
    # (salt within host is fine post-fetch) with an explicit partition
    # count so AQE's byte-based view can't serialize the Python stage
    n_parts = max(cfg.salt_factor * 16, 32)
    decode_in = gated.select("url_hash", "bytes").repartition(
        n_parts, F.xxhash64("url_hash", F.lit(cfg.partition_seed))
    )
    parse_schema = T.StructType(
        [T.StructField("url_hash", T.StringType())] + PARSE_FIELDS
    )
    parse_cols = decode_in.mapInPandas(_decode_batches, schema=parse_schema)
    # bytes + carry columns rejoin JVM-side. parse_cols is bounded by
    # the fetchlist (<= topN rows, ~100 bytes each): broadcast it while
    # topN is comfortably under the broadcast limit so the payload
    # bytes are never shuffled again; at the reference's big-cluster
    # sizing (topN = 10k x slaves) fall back to a shuffle join on
    # url_hash and let AQE pick the strategy.
    if cfg.top_n * 100 <= 512 * 1024 * 1024:
        parse_cols = F.broadcast(parse_cols)
    decoded = gated.join(parse_cols, on="url_hash", how="left")

    # X4 signature: md5(bytes) (NULL when no content — the old
    # `signature` column still holds the frontier's previous value,
    # which updatedb needs for the modified-state compare)
    decoded = decoded.withColumn(
        "new_signature",
        F.when(F.col("bytes").isNotNull(), F.md5(F.col("bytes"))).otherwise(
            F.lit(None).cast("string")
        ),
    )

    # X3 outlink pipeline, all JVM-side
    processed = (
        decoded.withColumn("out_canon", process_outlinks_col(F.col("out_urls"), cfg))
        .withColumn(
            "outlinks",
            F.transform(
                F.col("out_canon"),
                lambda u: F.struct(u.alias("url"), F.lit("").alias("anchor")),
            ),
        )
        .drop("out_canon")
    )
    return processed.withColumn("parsed_batch", F.lit(batch_id))


def payload_rows(parsed: DataFrame) -> DataFrame:
    """Project the input_hint payload table (image_id, bytes, w, h,
    fmt, caption, phash) from parsed rows — dedup by image_id (the
    dup-content fixture maps two URLs to one payload)."""
    return (
        parsed.filter(F.col("decode_ok") & (F.col("new_status") == CrawlStatus.FETCHED))
        .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
        .dropDuplicates(["image_id"])
    )
