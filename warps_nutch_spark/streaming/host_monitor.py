"""Stateful streaming per-host fetch monitor.

Streaming analog of the reference's in-memory queue accounting:
``fetch/TasksMonitor.java:343-397`` keeps per-queue fetch counts and
average response times, and ``fetch/FetchMonitor.java:437-460``
detaches queues whose average exceeds the slow threshold. Here the
same running state lives in the Structured Streaming state store via
``applyInPandasWithState`` — the custom-stateful-operator escape
hatch — so it survives restarts from the checkpoint and scales by
host-hash partitioning of the state store (one state row per host,
never a global structure).

Emission contract (update mode): one row per host per trigger that
saw that host; ``slow`` flips once the running average crosses the
threshold (and stays flipped by construction of a running mean over
all history). Hosts idle past ``idle_timeout_ms`` are evicted with a
final ``evicted=true`` row, bounding state like the reference's
detach.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FETCH_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("ok", T.BooleanType()),
    ]
)

MONITOR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("n_fetches", T.LongType()),
        T.StructField("n_failures", T.LongType()),
        T.StructField("total_ms", T.LongType()),
        T.StructField("avg_ms", T.DoubleType()),
        T.StructField("slow", T.BooleanType()),
        T.StructField("evicted", T.BooleanType()),
    ]
)

# state: (n_fetches, n_failures, total_ms)
MONITOR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_fetches", T.LongType()),
        T.StructField("n_failures", T.LongType()),
        T.StructField("total_ms", T.LongType()),
    ]
)


def host_fetch_monitor(
    events: DataFrame,
    slow_avg_ms: int = 5_000,
    idle_timeout_ms: int = 0,
    output_mode: str = "update",
) -> DataFrame:
    """events (host, duration_ms, ok) stream -> stateful per-host
    running counters + slow flag (TasksMonitor semantics)."""

    def update(key, pdfs, state: GroupState):
        (host,) = key
        if state.hasTimedOut:
            n, f, tot = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "host": host,
                        "n_fetches": n,
                        "n_failures": f,
                        "total_ms": tot,
                        "avg_ms": (tot / n) if n else 0.0,
                        "slow": bool(n and tot / n > slow_avg_ms),
                        "evicted": True,
                    }
                ]
            )
            return
        n, f, tot = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            f += int((~pdf["ok"].astype(bool)).sum())
            tot += int(pdf["duration_ms"].sum())
        state.update((n, f, tot))
        if idle_timeout_ms > 0:
            state.setTimeoutDuration(idle_timeout_ms)
        avg = (tot / n) if n else 0.0
        yield pd.DataFrame(
            [
                {
                    "host": host,
                    "n_fetches": n,
                    "n_failures": f,
                    "total_ms": tot,
                    "avg_ms": avg,
                    "slow": bool(n and avg > slow_avg_ms),
                    "evicted": False,
                }
            ]
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=MONITOR_OUTPUT_SCHEMA,
        stateStructType=MONITOR_STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=timeout,
    )
