"""A/B the CC convergence test: fingerprint-equality (old) vs
structural star-forest detection (new) over the SAME persisted pair
inputs, alternating within one session. Scratch measurement tool for
OPTIMIZATION_r06; not part of the bench contract."""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warps_nutch_spark.operators.cc import (
    _converged,
    _large_star,
    _small_star,
    connected_components,
)


def _fingerprint_old(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def cc_old(pairs, src_col, dst_col, max_iter=20):
    edges = (
        pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev = _fingerprint_old(edges)
    iters = 0
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        iters += 1
        cur = _fingerprint_old(edges)
        if cur == prev:
            break
        prev = cur
    nodes = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return nodes.unionByName(roots).distinct(), iters


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_local/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("ab-cc")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from warps_nutch_spark.queries import _ANN_BAND_LEN, _ANN_BANDS, _ANN_PLANES, _ANN_THRESHOLD, _t
    from warps_nutch_spark.operators.ann import lsh_cosine_dedup

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planes = [
        [float(v) for v in r["embedding"]]
        for r in emb.filter(F.col("vec_id").between(1, _ANN_PLANES))
        .orderBy("vec_id")
        .collect()
    ]
    pairs = lsh_cosine_dedup(emb, planes, _ANN_BANDS, _ANN_BAND_LEN, _ANN_THRESHOLD)
    pairs = pairs.persist()
    n = pairs.count()
    print(f"pairs: {n}")

    # equivalence once: identical rows
    new_df = connected_components(pairs, "vec_a", "vec_b")
    old_df, old_iters = cc_old(pairs, "vec_a", "vec_b")
    diff = new_df.exceptAll(old_df).count() + old_df.exceptAll(new_df).count()
    print(f"equivalence exceptAll diff rows: {diff} (old iters={old_iters})")
    assert diff == 0

    for r in range(reps):
        for name, fn in (("old", lambda: cc_old(pairs, "vec_a", "vec_b")[0]),
                         ("new", lambda: connected_components(pairs, "vec_a", "vec_b"))):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            print(f"rep{r} {name}: {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
