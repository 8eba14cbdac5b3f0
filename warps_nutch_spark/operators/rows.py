"""Frontier row construction with schema defaults.

The reference builds new WebPage rows in ``crawl/SeedBuilder.java``
(seeds) and ``dbupdate/ReduceDatumBuilder.java:76-96`` (discovered
outlinks); this module centralizes the Spark equivalent so every
operator produces schema-complete rows for the mechanical MERGE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import schema
from ..config import CrawlConfig
from ..functions import urls
from ..functions.status import CrawlStatus


def page_category_col(url: Column) -> Column:
    """Page-category classifier (CrawlFilter.java:48-151
    sniffPageCategoryByUrlPattern): regex rules over the URL path."""
    return (
        F.when(url.rlike(r"://[^/]+/?$") | url.rlike(r"/(index|default)[^/]*$"), "INDEX")
        .when(url.rlike(r"/search([/?#]|$)") | url.rlike(r"[?&](q|query|s|search)="), "SEARCH")
        .when(url.rlike(r"/media/") | url.rlike(r"\.(jpg|jpeg|png|gif|mp4|webm)$"), "MEDIA")
        .when(url.rlike(r"/detail/") | url.rlike(r"/[a-z]+/\d+([/.?#]|$)"), "DETAIL")
        .otherwise("UNKNOWN")
    )


def complete_rows(df: DataFrame, cfg: CrawlConfig, now_ms: int) -> DataFrame:
    """Fill every missing frontier column with its schema default.
    ``df`` must already have ``url``; url_hash/host are derived if
    absent."""
    cols = {f.name: f.dataType.simpleString() for f in schema.FRONTIER.fields}
    out = df
    if "url_hash" not in out.columns:
        out = out.withColumn("url_hash", urls.url_hash_col(F.col("url")))
    if "host" not in out.columns:
        out = out.withColumn("host", urls.host_col(F.col("url")))
    defaults: dict[str, Column] = {
        "host_bucket": F.lit(None).cast("int"),
        "status": F.lit(CrawlStatus.UNFETCHED),
        "fetch_time": F.lit(now_ms),
        "prev_fetch_time": F.lit(0).cast("long"),
        "modified_time": F.lit(0).cast("long"),
        "prev_modified_time": F.lit(0).cast("long"),
        "fetch_interval": F.lit(cfg.default_fetch_interval_sec),
        "retries_since_fetch": F.lit(0),
        "score": F.lit(0.0).cast("float"),
        "cash": F.lit(0.0).cast("float"),
        "distance": F.lit(0),
        "priority": F.lit(cfg.priority_default),
        "batch_id": F.lit(None).cast("string"),
        "generated_batch": F.lit(None).cast("string"),
        "fetched_batch": F.lit(None).cast("string"),
        "parsed_batch": F.lit(None).cast("string"),
        "updated_batch": F.lit(None).cast("string"),
        "signature": F.lit(None).cast("string"),
        "prev_signature": F.lit(None).cast("string"),
        "protocol_status": F.lit(None).cast(schema.PROTOCOL_STATUS),
        "outlinks": F.lit(None).cast(schema.FRONTIER["outlinks"].dataType),
        "repr_url": F.lit(None).cast("string"),
        "inlinks": F.lit(None).cast(schema.FRONTIER["inlinks"].dataType),
        "image_id": F.lit(None).cast("string"),
        "caption": F.lit(None).cast("string"),
        "phash": F.lit(None).cast("long"),
        "is_seed": F.lit(False),
    }
    for name, default in defaults.items():
        if name not in out.columns:
            out = out.withColumn(name, default)
        else:
            out = out.withColumn(name, F.col(name).cast(cols[name]))
    return out.select(*cols.keys())
