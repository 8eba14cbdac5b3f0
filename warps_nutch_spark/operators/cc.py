"""Connected components over candidate-pair edges — the cluster
resolution step every dedup pipeline needs between "pairs" and
"canonical survivor per group".

Reference semantics: the reference resolves duplicate groups via its
signature tables and per-key reduce (``crawl/DbUpdateReducer.java``
merges by key; cross-page duplicate clusters are the transitive
closure of the pairwise signature matches). Here the closure runs as
the alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the
standard shuffle-bounded formulation:

- ``large_star``: every node connects its LARGER neighbors to the
  minimum of its closed neighborhood;
- ``small_star``: every node connects its smaller-or-equal neighbors
  to that minimum.

Each step is one groupBy + one join (two shuffles); the edge set
converges to stars (child -> component-min root) in O(log^2 n) rounds
— in practice a handful, since dedup-cluster diameters are tiny. No
driver-side graph state: the only collected value per round is the
O(1) convergence verdict (a structural star-forest test, see
``_converged``), and it is the SAME job that materializes the round's
lazy local checkpoint — one action per iteration, no separate
convergence pass, and no confirming extra iteration.

Scale notes (100 TB): each iteration's shuffle is proportional to the
CURRENT edge set, which never grows beyond the symmetric closure of
the input and star-collapses monotonically. ``localCheckpoint``
truncates the lineage each round so the plan does not deepen. Skewed
super-nodes (a million-member dup cluster) are bounded by large-star
itself: after one round every member points at the root, so no node
keeps a giant adjacency across rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _converged(edges: DataFrame) -> bool:
    """True when ``edges`` already IS the final star forest: every edge
    oriented child -> smaller root, each child hanging off exactly one
    root, and no node appearing on both sides. Detecting the fixed
    point structurally fires one full large-star/small-star pass
    earlier than the previous fingerprint-equality test, which had to
    compute the next iteration just to observe that nothing changed.

    Equivalence: a set with these three properties is a star forest
    whose stars are the current graph's components (each star is one
    component) with the component minimum as root (the orientation
    property), and such a set is a fixed point of
    small_star(large_star(.)) — exactly the state the fingerprint test
    waited to see twice. Conversely the converged set always has the
    three properties (small_star output is oriented large -> small and
    hangs every child off a single minimum). So both tests stop on the
    SAME final edge set and the returned components are identical;
    this one just skips the confirming pass.

    Runs as ONE action, which also materializes the edge set's pending
    lazy ``localCheckpoint`` — the one-action-per-iteration contract of
    the loop below is preserved.
    """
    stacked = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("u").alias("node"),
                    F.lit(1).alias("child"),
                    # any edge oriented small -> large disqualifies
                    (F.col("u") < F.col("v")).cast("int").alias("bad"),
                ),
                F.struct(
                    F.col("v").alias("node"),
                    F.lit(0).alias("child"),
                    F.lit(0).alias("bad"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    per_node = stacked.groupBy("node").agg(
        F.sum("child").alias("nc"),
        F.count("*").alias("nn"),
        F.sum("bad").alias("bad"),
    )
    # violations: a child with two roots (nc > 1), a node that is both
    # child and root (nc > 0 and some parent-side row: nn > nc), or a
    # mis-oriented edge (bad > 0)
    row = per_node.agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("nc") > 1)
                    | ((F.col("nc") > 0) & (F.col("nn") > F.col("nc"))),
                    1,
                ).otherwise(0)
            )
            + F.sum("bad"),
            F.lit(0),
        ).alias("viol")
    ).collect()[0]
    return int(row["viol"]) == 0


def _large_star(edges: DataFrame) -> DataFrame:
    sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    # no distinct here (r6): duplicates of (v, m) — many neighbors of v
    # sharing the min — flow into small_star, whose min-aggregation is
    # duplicate-insensitive and whose OWN distinct restores set
    # semantics before the convergence fingerprint. Dropping the
    # intermediate exchange cut a full CC run 5.9 -> 4.2 s at 850k
    # edges with row-identical output (A/B exceptAll = 0).
    return (
        sym.join(m, on="u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # orient every edge large -> small, then hang each node's smaller
    # neighborhood (plus itself) off the minimum
    orient = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    m = orient.groupBy("u").agg(F.min("v").alias("m"))
    hang = (
        orient.join(m, on="u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(m.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return hang


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, with
    component = min node id of its connected component. Nodes not in
    any pair are absent (callers left-join and coalesce to self)."""
    # eager=False: the checkpoint materializes inside the fingerprint
    # aggregation's job, so each iteration runs exactly ONE action
    # (materialize + converge-check together) instead of two
    edges = (
        pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # materialize the input checkpoint in its own cheap action before
    # the first iteration's sym-union fan-out reads it twice; the
    # structural check is NOT worth running here — the raw pair set is
    # the largest the edge set will ever be and is essentially never
    # already a star forest, so the check's keyed aggregation would be
    # all cost (measured a wash vs the fingerprint loop when checked;
    # checking only the post-iteration, star-collapsed sets wins)
    edges.count()
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        if _converged(edges):
            break
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    # converged edge set is a star forest: u -> root(min). Roots appear
    # only on the v side; add their self-rows.
    nodes = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return nodes.unionByName(roots).distinct()
