"""OPIC-style scoring as pure column expressions.

Mirrors the reference plugin ``scoring-opic``
(``OPICScoringFilter.java``):

- injected page: score = injected score, cash = score (lines 81-86)
- newly discovered page: score = 0, cash = 0 (lines 92-97)
- generator sort value = score * init_sort (lines 100-103)
- distribute: score_unit = cash / all_outlink_count; outlink receives
  positional score (outlink_count - position, MapDatumBuilder.java:191-193)
  plus score_unit * (internal|external factor) by same-host test
  (lines 140-176); source page cash resets to 0
- update: score += sum(inlink contributions); cash += same sum
  (lines 106-137)

All of these are pure functions of row columns -> implemented as Spark
Column builders; nothing needs a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import CrawlConfig


def generator_sort_value(score: Column, init_sort: float = 1.0) -> Column:
    return score * F.lit(float(init_sort))


def outlink_contribution(
    cash: Column,
    outlink_count: Column,
    position: Column,
    from_host: Column,
    to_host: Column,
    cfg: CrawlConfig,
) -> Column:
    """Per-outlink score contribution: positional score + OPIC cash
    share scaled by the internal/external link factor."""
    positional = (outlink_count - position).cast("float")
    unit = F.when(outlink_count > 0, cash / outlink_count.cast("float")).otherwise(
        F.lit(0.0)
    )
    factor = F.when(
        to_host == from_host, F.lit(float(cfg.internal_score_factor))
    ).otherwise(F.lit(float(cfg.external_score_factor)))
    return (positional + unit * factor).cast("float")


def updated_score(old_score: Column, inlink_sum: Column) -> Column:
    return (old_score + F.coalesce(inlink_sum, F.lit(0.0))).cast("float")


def updated_cash(old_cash: Column, inlink_sum: Column) -> Column:
    return (old_cash + F.coalesce(inlink_sum, F.lit(0.0))).cast("float")
