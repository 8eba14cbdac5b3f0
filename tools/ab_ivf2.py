"""Split the indexed probe: pair-build+score vs top-k window.
Scratch measurement tool for OPTIMIZATION_r06."""

from __future__ import annotations

import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_local/sf1"
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("ab-ivf2")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from warps_nutch_spark.queries import _t
    from warps_nutch_spark.queries_ext import _IVF_CENTROIDS, _SJ_K, _SJ_PROBE
    from warps_nutch_spark.operators.ann import (
        _pair_scores_by_id,
        _probe_table,
        dim_of,
        ivf_write_index,
    )
    from warps_nutch_spark.operators.skew import spread

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = emb.filter(F.col("vec_id").between(1, _IVF_CENTROIDS)).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    corpus = emb.filter(F.col("vec_id") >= 16)
    queries = emb.filter((F.col("vec_id") % 61 == 0) & (F.col("vec_id") >= 16)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    path = os.path.join(tempfile.mkdtemp(prefix="wns-abivf2-"), "index")
    ivf_write_index(corpus, cent, path)

    d = dim_of(cent, "ce")
    for rep in range(3):
        t0 = time.time()
        probe = _probe_table(queries, cent, _SJ_PROBE, "query_id", d=d)
        probed_ids = sorted(
            r["centroid_id"] for r in probe.select("centroid_id").distinct().collect()
        )
        idx = spark.read.parquet(path).filter(F.col("centroid_id").isin(probed_ids))
        vecs = idx.select("vec_id", "embedding").unionByName(
            queries.select(F.col("query_id").alias("vec_id"), F.col("qe").alias("embedding"))
        )
        pair_ids = spread(
            idx.select("centroid_id", "vec_id")
            .join(probe.select("query_id", "centroid_id"), on="centroid_id")
            .select(F.col("query_id").alias("id_a"), F.col("vec_id").alias("id_b"))
        )
        t1 = time.time()
        fast = _pair_scores_by_id(vecs, pair_ids, "vec_id")
        scored = fast.select(
            F.col("id_a").alias("query_id"),
            F.col("id_b").alias("vec_id"),
            F.round(F.col("_dot") / (F.col("_na") * F.col("_nb")), 4).alias("cosine"),
        )
        t2 = time.time()
        scored.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        topw = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
        out = (
            scored.withColumn("_rn", F.row_number().over(topw))
            .filter(F.col("_rn") <= _SJ_K)
            .select("query_id", "vec_id", "cosine", F.col("_rn").cast("bigint").alias("rank"))
        )
        out.write.format("noop").mode("overwrite").save()
        t4 = time.time()
        n = pair_ids.count()
        t5 = time.time()
        print(
            f"rep{rep}: plan_setup={t1-t0:.2f}s collect_vecs={t2-t1:.2f}s "
            f"score_noop={t3-t2:.2f}s window_full={t4-t3:.2f}s pairs_count={t5-t4:.2f}s n={n}",
            flush=True,
        )


if __name__ == "__main__":
    main()
