"""IcebergFrontierStore smoke test against a REAL Iceberg catalog.

The sandbox has no iceberg-spark-runtime jar and no network to fetch
one, so this is a skip-unless hook (VERDICT r4 stretch item 10): a
cluster user sets ``WNS_ICEBERG_JAR`` to a local
``iceberg-spark-runtime-<spark>-<scala>.jar`` and gets a tested MERGE
INTO path:

    WNS_ICEBERG_JAR=/path/to/iceberg-spark-runtime-4.0_2.13-x.y.z.jar \\
        python -m pytest tests/test_iceberg_store.py -v

The test builds its OWN SparkSession (the shared fixture's session has
no Iceberg catalog configured), creates a hadoop-type catalog in a temp
dir, writes a 3-row frontier table, merges a 2-row update batch through
``IcebergFrontierStore.merge`` (1 update + 1 insert), and asserts the
merged state — the exact statement the parquet MOR store emulates
(``store/frontier.py`` docstring)."""

import os

import pytest

ICEBERG_JAR = os.environ.get("WNS_ICEBERG_JAR", "")

pytestmark = pytest.mark.skipif(
    not (ICEBERG_JAR and os.path.exists(ICEBERG_JAR)),
    reason="iceberg-spark-runtime jar not available (set WNS_ICEBERG_JAR); "
    "the sandbox has no network to fetch it — run on a cluster/dev box",
)


def test_iceberg_merge_roundtrip(tmp_path):
    from pyspark.sql import SparkSession

    from warps_nutch_spark.store.frontier import IcebergFrontierStore

    warehouse = str(tmp_path / "warehouse")
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("wns-iceberg-smoke")
        .config("spark.jars", ICEBERG_JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.wns", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.wns.type", "hadoop")
        .config("spark.sql.catalog.wns.warehouse", warehouse)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        spark.sql(
            "CREATE TABLE wns.db.frontier "
            "(url_hash STRING, url STRING, host STRING, score DOUBLE) "
            "USING iceberg"
        )
        spark.createDataFrame(
            [("h1", "http://a/1", "a", 1.0),
             ("h2", "http://a/2", "a", 2.0),
             ("h3", "http://b/3", "b", 3.0)],
            ["url_hash", "url", "host", "score"],
        ).writeTo("wns.db.frontier").append()

        store = IcebergFrontierStore(spark, "wns.db.frontier")
        updates = spark.createDataFrame(
            [("h2", "http://a/2", "a", 20.0),     # WHEN MATCHED -> replace
             ("h4", "http://c/4", "c", 4.0)],     # WHEN NOT MATCHED -> insert
            ["url_hash", "url", "host", "score"],
        )
        store.merge(updates, {"op": "updatedb", "batch_id": "batch-0001"})

        got = {
            r.url_hash: r.score for r in store.read().collect()
        }
        assert got == {"h1": 1.0, "h2": 20.0, "h3": 3.0, "h4": 4.0}
    finally:
        spark.stop()
