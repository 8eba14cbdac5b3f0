"""Skew-handling primitives.

AQE's skew-join split handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``); these explicit forms are
for the shapes AQE can't rewrite — windows over a hot key, and joins
where one side must be replicated deterministically (e.g. joining the
full outlink explode against per-host state when one host is 12% of
the corpus, the bench's Zipf hot host).

Semantics are identical to the unsalted forms (oracle-checked by the
``salted_host_agg`` driver query); only the physical distribution
changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scan_is_narrow(df: DataFrame) -> bool:
    """True when ``df``'s current physical partitioning has fewer
    partitions than the session's cores — the "one small parquet file
    -> one task" input-skew case (guide §2.5). At real scale the scan
    has >= cores partitions and this returns False, so spreads guarded
    by it are scale-adaptive no-ops, not constants tuned to local mode."""
    sc = df.sparkSession.sparkContext
    try:
        return df.rdd.getNumPartitions() < sc.defaultParallelism
    except Exception:
        return False


def spread(df: DataFrame, by: str | None = None) -> DataFrame:
    """Explicit repartition to the session's core count. Two distinct
    reasons to use this over relying on the scan split / AQE:

    1. a single small input file yields ONE scan partition, serializing
       every expression evaluated in that stage;
    2. AQE's byte-based partition coalescing can collapse a few-MB but
       compute-DENSE intermediate (per-row array math: dots, shingles,
       hashes) back to 1-6 tasks; an explicit user repartition(n) is
       exempt from AQE coalescing.

    Callers gate on :func:`scan_is_narrow` (or equivalent knowledge
    that the relation is batch-bounded) so a 100 TB corpus is never
    blanket-reshuffled."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    return df.repartition(n, F.col(by)) if by else df.repartition(n)


def spread_narrow_scan(df: DataFrame) -> DataFrame:
    """:func:`spread` applied only when the input is narrower than the
    core count (the common operator-entry guard)."""
    return spread(df) if scan_is_narrow(df) else df


def salted_two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: list,
    salt_from: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot keys: partial aggregate on
    (key, salt) — salt derived from a high-cardinality column so one
    hot key's rows land in ``buckets`` partitions — then final
    aggregate on key. ``aggs`` are (partial_expr, final_expr, name)
    triples where the partial computes per-salt and the final combines.

    NOTE: plain groupBy already map-side-combines; this form matters
    when the per-key state is too big for one reducer (huge
    collect_list / distinct counts on a hot key)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(buckets))
    )
    partial = salted.groupBy(key, "_salt").agg(
        *[p.alias(f"_p_{name}") for p, _, name in aggs]
    )
    return partial.groupBy(key).agg(
        *[f(F.col(f"_p_{name}")).alias(name) for _, f, name in aggs]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: each big-side row salts into one of
    ``buckets`` sub-keys (deterministic xxhash64 over its columns, so
    one hot key's rows spread evenly) and the small side is replicated
    ``buckets`` times via a broadcast range. Row-level results are
    identical to ``big.join(small, key, how)``."""
    if how not in ("inner", "left"):
        # right/full would duplicate unmatched small-side rows once per
        # replica; semi/anti lose the salt column semantics
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    bsalt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(buckets))
    b = big.withColumn("_salt", bsalt)
    s = small.crossJoin(
        F.broadcast(
            b.sparkSession.range(buckets).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = b.join(s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
