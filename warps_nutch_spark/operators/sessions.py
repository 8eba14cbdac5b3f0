"""Sessionization: gap-based session windows over an event stream —
the batch analog of Structured Streaming's ``session_window`` (and the
operator a training-data pipeline uses to segment interaction logs).

Pure window functions: one shuffle on the session key. The streaming
form of the same semantics is ``F.session_window(ts, gap)`` in
``streaming/``; this batch form is oracle-checkable (lag + running sum
is ANSI SQL) and exact for late data since batch sees everything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ntz_epoch_us(ts: Column) -> Column:
    """Microseconds since epoch for a naive (TIMESTAMP_NTZ) column,
    computed from date/time parts so the result is independent of
    spark.sql.session.timeZone — exactly DuckDB's epoch_us(ts) on the
    same naive value. (unix_micros() rejects NTZ, and casting NTZ ->
    TIMESTAMP would inject the session zone.)"""
    days = F.unix_date(F.to_date(ts)).cast("long")
    mins = days * 1440 + F.hour(ts) * 60 + F.minute(ts)
    # date_part SECOND carries the fractional part (decimal seconds)
    frac_us = F.round(F.date_part(F.lit("SECOND"), ts) * 1_000_000, 0).cast("long")
    return mins * 60_000_000 + frac_us


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    key: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign each event a per-key session id: a gap longer than
    ``gap_minutes`` between consecutive events starts a new session.
    Returns the input plus ``session_id`` (1-based per key)."""
    us = ntz_epoch_us(F.col(ts_col))
    w = Window.partitionBy(key).orderBy(F.asc(ts_col), F.asc(order_tiebreak))
    gap_us = gap_minutes * 60 * 1_000_000
    new_session = (
        F.when(F.lag(us).over(w).isNull(), F.lit(1))
        .when(us - F.lag(us).over(w) > gap_us, F.lit(1))
        .otherwise(F.lit(0))
    )
    return events.withColumn(
        "session_id", F.sum(new_session).over(w).cast("bigint")
    )


def session_stats(sessions: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-session aggregates (count, span, value sum)."""
    us = ntz_epoch_us(F.col("ts"))
    return sessions.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
