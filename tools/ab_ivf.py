"""Decompose embedding_sim_join_indexed at sf1: index write vs probe.
Scratch measurement tool for OPTIMIZATION_r06."""

from __future__ import annotations

import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_local/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("ab-ivf")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from warps_nutch_spark.queries import _t
    from warps_nutch_spark.queries_ext import _IVF_CENTROIDS, _SJ_K, _SJ_PROBE
    from warps_nutch_spark.operators.ann import (
        ivf_assign,
        ivf_topk_batch_indexed,
        ivf_write_index,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = emb.filter(F.col("vec_id").between(1, _IVF_CENTROIDS)).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    corpus = emb.filter(F.col("vec_id") >= 16)
    queries = emb.filter((F.col("vec_id") % 61 == 0) & (F.col("vec_id") >= 16)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    print(f"corpus={corpus.count()} queries={queries.count()}")

    for r in range(reps):
        t0 = time.time()
        ivf_assign(corpus, cent).write.format("noop").mode("overwrite").save()
        t1 = time.time()
        path = os.path.join(tempfile.mkdtemp(prefix="wns-abivf-"), "index")
        ivf_write_index(corpus, cent, path)
        t2 = time.time()
        ivf_topk_batch_indexed(
            spark, path, cent, queries, k=_SJ_K, n_probe=_SJ_PROBE
        ).write.format("noop").mode("overwrite").save()
        t3 = time.time()
        print(
            f"rep{r}: assign={t1-t0:.2f}s write_index={t2-t1:.2f}s probe={t3-t2:.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
