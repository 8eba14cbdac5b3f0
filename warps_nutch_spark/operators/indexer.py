"""Index sink (S8): IndexDocument construction + pluggable write.

Reference: ``mapreduce/IndexJob.java:51-160`` builds an
``IndexDocument`` per fetched+parsed page via the IndexingFilter chain
(url/host/content fields from ``plugin/index-basic/.../
BasicIndexingFilter.java:71-120``, anchors from index-anchor) and
writes to Solr/Elastic. Here the document build is a declarative
projection; the sink is a ``df.write`` to any Spark-supported target
(parquet/json dir in the sandbox; on a cluster swap the format string
for an ES/Solr connector — same DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import urls
from ..functions.status import CrawlStatus


def build_index_documents(frontier: DataFrame, batch_id: str | None = None) -> DataFrame:
    """One index document per FETCHED page (IndexJob scan guard:
    UPDATEDB_MARK present -> here updated_batch/fetched state)."""
    docs = frontier.filter(F.col("status") == CrawlStatus.FETCHED)
    if batch_id is not None:
        docs = docs.filter(F.col("fetched_batch") == batch_id)
    return docs.select(
        F.col("url_hash").alias("id"),
        F.col("url"),
        F.col("host"),
        urls.domain_col(F.col("host")).alias("domain"),
        F.col("caption").alias("content"),
        F.col("image_id"),
        F.col("phash"),
        F.col("score").cast("double").alias("boost"),
        (F.col("fetch_time") / 1000).cast("timestamp").alias("tstamp"),
        F.col("batch_id"),
        # index-anchor (AnchorIndexingFilter): distinct non-empty
        # anchor texts from the stored inlink state
        F.array_distinct(
            F.filter(
                F.transform(
                    F.coalesce(F.col("inlinks"), F.array()),
                    lambda s: s.getField("anchor"),
                ),
                lambda a: a.isNotNull() & (a != ""),
            )
        ).alias("anchors"),
        # representative URL when the page redirected (reprUrl field)
        F.col("repr_url"),
    )


def write_index(docs: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Sandbox sink. Production: ``docs.write.format("es")...`` or a
    Solr connector — the document DataFrame is identical."""
    docs.write.mode("append").format(fmt).save(path)
