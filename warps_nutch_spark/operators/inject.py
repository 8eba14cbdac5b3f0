"""Inject: seed list -> frontier upsert.

Reference: ``mapreduce/InjectJob.java:47-100`` + seed-line parsing in
``crawl/SeedBuilder.java:69-169`` (one URL per line, ``#`` comments,
``\\t key=value`` metadata; reserved keys ``nutch.score`` and
``nutch.fetchIntervalSec``), row build at ``SeedBuilder.java:69-135``:
seed score = db.score.injected, cash = score (OPIC injectedScore,
``OPICScoringFilter.java:81-86``), fetchInterval = 60 s, distance 0,
priority FETCH_PRIORITY_SEED.

Spark shape: read the text file declaratively, split metadata with
built-ins (no UDF), canonicalize, build schema-complete rows, MERGE
into the frontier. Re-injecting an existing URL refreshes its seed
fields (score/priority/interval/is_seed) but keeps its crawl state —
matching Gora upsert-by-field semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions import urls
from ..store.frontier import FrontierStore
from .rows import complete_rows


def parse_seed_lines(spark: SparkSession, path_or_df) -> DataFrame:
    """Seed text -> (url, seed_score, seed_interval). Pure built-ins:
    split on tab, parse key=value pairs via map_from_entries."""
    if isinstance(path_or_df, str):
        raw = spark.read.text(path_or_df)
    else:
        raw = path_or_df  # DataFrame with a 'value' column (for tests)
    lines = (
        raw.select(F.trim("value").alias("line"))
        .filter((F.col("line") != "") & ~F.col("line").startswith("#"))
    )
    parts = lines.withColumn("parts", F.split("line", "\t"))
    kvs = parts.withColumn(
        "meta",
        F.map_from_entries(
            F.expr(
                "transform(filter(slice(parts, 2, 1000), p -> instr(p, '=') > 0),"
                " p -> struct(split(p, '=')[0] as key,"
                " substring(p, instr(p, '=') + 1) as value))"
            )
        ),
    )
    return kvs.select(
        F.element_at("parts", 1).alias("raw_url"),
        F.col("meta").getItem("nutch.score").cast("float").alias("seed_score"),
        F.col("meta")
        .getItem("nutch.fetchIntervalSec")
        .cast("int")
        .alias("seed_interval"),
    )


def build_seed_rows(
    seeds: DataFrame, cfg: CrawlConfig, now_ms: int, batch_id: str
) -> DataFrame:
    canon = (
        seeds.withColumn("url", urls.canonicalize_col(F.col("raw_url")))
        .filter(F.col("url").isNotNull())
        .drop("raw_url")
        .dropDuplicates(["url"])
    )
    rows = canon.select(
        "url",
        F.coalesce(F.col("seed_score"), F.lit(float(cfg.injected_score)))
        .cast("float")
        .alias("score"),
        F.coalesce(F.col("seed_interval"), F.lit(cfg.seed_fetch_interval_sec))
        .cast("int")
        .alias("fetch_interval"),
    )
    rows = (
        rows.withColumn("cash", F.col("score"))  # OPIC injectedScore
        .withColumn("priority", F.lit(cfg.priority_seed))
        .withColumn("distance", F.lit(0))
        .withColumn("is_seed", F.lit(True))
        .withColumn("batch_id", F.lit(batch_id))
    )
    return complete_rows(rows, cfg, now_ms)


def inject(
    store: FrontierStore,
    seeds: DataFrame,
    cfg: CrawlConfig,
    now_ms: int,
    batch_id: str = "inject",
) -> DataFrame:
    """Upsert seeds. Existing rows keep crawl state but take the seed
    score/priority/interval/flags; new rows insert whole."""
    seed_rows = build_seed_rows(seeds, cfg, now_ms, batch_id)
    try:
        current = store.read()
    except FileNotFoundError:
        store.init(seed_rows, {"op": "inject", "batch_id": batch_id})
        return seed_rows

    seed_fields = ["score", "cash", "priority", "fetch_interval", "is_seed", "distance"]
    existing = current.join(
        seed_rows.select("url_hash", *[F.col(c).alias(f"seed_{c}") for c in seed_fields]),
        on="url_hash",
        how="inner",
    )
    for c in seed_fields:
        existing = existing.withColumn(c, F.col(f"seed_{c}")).drop(f"seed_{c}")
    new = seed_rows.join(current.select("url_hash"), on="url_hash", how="left_anti")
    updates = existing.select(*seed_rows.columns).unionByName(new)
    store.merge(updates, {"op": "inject", "batch_id": batch_id})
    return updates


def seeds_from_template(spark: SparkSession, url_format: str) -> DataFrame:
    """SeedGenerator (``crawl/SeedGenerator.java``): expand one
    ``prefix{{{min,max}}}suffix`` numeric-range placeholder into a seed
    URL list — ``spark.range(min, max+1)`` so a billion-URL seed set
    generates distributed, never driver-side. Returns a ``value``
    column (the seed-file line shape ``parse_seed_lines`` consumes)."""
    import re

    m = re.search(r"\{\{\{(\d+),(\d+)\}\}\}", url_format)
    if not m:
        raise ValueError("url_format needs one {{{min,max}}} placeholder")
    lo, hi = int(m.group(1)), int(m.group(2))
    prefix, suffix = url_format[: m.start()], url_format[m.end():]
    return spark.range(lo, hi + 1).select(
        F.concat(F.lit(prefix), F.col("id").cast("string"), F.lit(suffix)).alias(
            "value"
        )
    )
