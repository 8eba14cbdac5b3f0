"""LinkRank-style iterative link-analysis scoring — the score source
for the reference's scoring-link plugin.

Reference semantics (``plugin/scoring-link/.../LinkAnalysisScoringFilter.java``):
initialScore = 0, distribute/update are no-ops — the plugin expects an
EXTERNAL link-analysis pass to populate page scores, then
``generatorSortValue = score * initSort`` and ``indexerScore =
normalizedScore * score``. This module is that external pass,
expressed as damped power iteration over the outlink graph (the
classic PageRank recurrence the Nutch webgraph/LinkRank job computes).

Hash-stable arithmetic: scores live in integer micro-units (1.0 =
1_000_000) and every step is integer division/sum — associative,
commutative, accumulation-order independent — so a DuckDB oracle
unrolling the same iterations matches bit-for-bit (float sums would
diverge by partition order; see opic_update's scaled-integer fix).

Recurrence (damping d = damp_num/damp_den, default 85/100):

    contrib(u -> v) = score(u) DIV outdeg(u)
    score'(v) = (1e6 - d*1e6)/1 ... concretely:
    score'(v) = base + (damp_num * SUM contrib(.. -> v)) DIV damp_den
    base      = ((damp_den - damp_num) * 1_000_000) DIV damp_den

Dangling nodes keep contributing nothing (their mass leaks — the
simplified formulation; the reference's LinkRank does the same unless
its loops option is on).

Scale shape: each iteration is one join edges⋈scores on u (both sides
partitionable by the same key) + one groupBy v — two shuffles per
iteration, state is one row per node. At 10^10 nodes the right
physical layout is both edges and scores bucketed by node id so the
join co-locates; ``checkpoint_every`` truncates lineage so K=50 does
not deepen the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("u").agg(F.count("*").alias("odeg"))


def linkrank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damp_num: int = 85,
    damp_den: int = 100,
    checkpoint_every: int = 8,
) -> DataFrame:
    """(node, score_u6) after ``iterations`` damped power steps.

    ``nodes``: one column ``node`` (every rankable page, including
    dangling/unlinked ones). ``edges``: columns ``u``, ``v`` (directed
    outlinks, self-loops ignored)."""
    e = edges.filter(F.col("u") != F.col("v"))
    deg = out_degrees(e)
    base = ((damp_den - damp_num) * SCALE) // damp_den
    scores = nodes.select("node", F.lit(SCALE).cast("long").alias("score_u6"))
    for i in range(iterations):
        contribs = (
            scores.join(e, scores["node"] == e["u"])
            .join(deg, on="u")
            .select(
                F.col("v").alias("node"),
                F.expr("score_u6 DIV odeg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("inflow"))
        )
        scores = (
            nodes.join(contribs, on="node", how="left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damp_num} * coalesce(inflow, 0L)) DIV {damp_den}")
                ).cast("long").alias("score_u6"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            scores = scores.localCheckpoint()
    return scores


def generator_sort_value(score_col, init_sort_col):
    """LinkAnalysisScoringFilter.generatorSortValue:72-75: the
    generator orders by page score x initSort."""
    return score_col * init_sort_col


def indexer_score(score_col, normalized_score: float = 1.0):
    """LinkAnalysisScoringFilter.indexerScore:88-91."""
    return F.lit(normalized_score) * score_col
