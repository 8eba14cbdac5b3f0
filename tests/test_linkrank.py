"""LinkRank power iteration (scoring-link plugin's external score)."""

import pandas as pd
from pyspark.sql import functions as F

from warps_nutch_spark.operators.linkrank import (
    SCALE,
    generator_sort_value,
    indexer_score,
    linkrank,
)


def _run(spark, nodes, edges, iters):
    ndf = spark.createDataFrame(pd.DataFrame({"node": nodes}))
    edf = spark.createDataFrame(pd.DataFrame(edges, columns=["u", "v"]))
    out = linkrank(ndf, edf, iterations=iters).toPandas()
    return dict(zip(out["node"], out["score_u6"]))


def test_cycle_is_fixed_point(spark):
    # 3-cycle, all out-degrees 1: score' = 150000 + 85% of 1.0 = 1.0
    got = _run(spark, [0, 1, 2], [(0, 1), (1, 2), (2, 0)], iters=4)
    assert got == {0: SCALE, 1: SCALE, 2: SCALE}


def test_star_two_iterations_exact(spark):
    # 1 -> 0, 2 -> 0: hand-computed integer-domain values
    got1 = _run(spark, [0, 1, 2], [(1, 0), (2, 0)], iters=1)
    assert got1 == {0: 150_000 + (85 * 2 * SCALE) // 100, 1: 150_000, 2: 150_000}
    got2 = _run(spark, [0, 1, 2], [(1, 0), (2, 0)], iters=2)
    assert got2 == {0: 150_000 + (85 * 300_000) // 100, 1: 150_000, 2: 150_000}


def test_dangling_and_isolated_nodes_get_base(spark):
    # node 9 isolated (in nodes, no edges); node 0 dangling (outlink
    # source only): both settle at the damped base after one step
    got = _run(spark, [0, 1, 9], [(0, 1)], iters=2)
    assert got[9] == 150_000
    assert got[0] == 150_000
    assert got[1] > 150_000


def test_plugin_formula_columns(spark):
    df = spark.createDataFrame(pd.DataFrame({"score": [2.0], "init_sort": [3.0]}))
    row = df.select(
        generator_sort_value(F.col("score"), F.col("init_sort")).alias("g"),
        indexer_score(F.col("score"), normalized_score=0.5).alias("ix"),
    ).collect()[0]
    assert row["g"] == 6.0 and row["ix"] == 1.0
