"""URLPartitioner modes (byHost/byDomain) — TestURLPartitioner
semantics: same host (or domain) -> same politeness queue; the queue
is never fetched concurrently; byDomain serializes sibling subdomains."""

import pandas as pd
from pyspark.sql import functions as F

from warps_nutch_spark.config import make_test_config
from warps_nutch_spark.operators import fetch as fetch_op
from warps_nutch_spark.operators.rows import complete_rows

NOW = 1_700_000_000_000
WEB = (6, 80, 42)


def _fl(spark, cfg, urls):
    df = complete_rows(
        spark.createDataFrame(pd.DataFrame({"url": urls})), cfg, NOW
    )
    return df.withColumn("generated_batch", F.lit("b1")).withColumn(
        "batch_id", F.lit("b1")
    )


def test_by_host_mode_parallel_subdomains(spark):
    cfg = make_test_config(crawl_delay_ms=1000, partition_mode="host")
    urls = ["http://a.site.test/detail/1", "http://b.site.test/detail/1"]
    res = fetch_op.fetch(_fl(spark, cfg, urls), None, cfg, NOW, "b1", WEB).toPandas()
    # different hosts -> independent clocks, both start at round start
    assert (res.fetch_ts == NOW).all()


def test_by_domain_mode_serializes_subdomains(spark):
    cfg = make_test_config(crawl_delay_ms=1000, partition_mode="domain")
    urls = ["http://a.site.test/detail/1", "http://b.site.test/detail/1"]
    res = fetch_op.fetch(_fl(spark, cfg, urls), None, cfg, NOW, "b1", WEB).toPandas()
    ts = sorted(res.fetch_ts)
    assert ts[1] - ts[0] >= 1000  # one queue: politeness spacing applies
