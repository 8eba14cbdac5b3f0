"""applyInPandasWithState host monitor: running counters, slow flag,
and checkpoint-restart state recovery."""

import os

import pandas as pd

from warps_nutch_spark.streaming.host_monitor import (
    FETCH_EVENT_SCHEMA,
    host_fetch_monitor,
)


def _write_events(spark, path, rows, fname):
    pdf = pd.DataFrame(rows, columns=["host", "duration_ms", "ok"])
    spark.createDataFrame(pdf, schema=FETCH_EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    _ = fname  # file layout handled by append


def _run_once(spark, src, ckpt, sink):
    stream = (
        spark.readStream.schema(FETCH_EVENT_SCHEMA).parquet(src)
    )
    out = host_fetch_monitor(stream, slow_avg_ms=1000, output_mode="append")
    q = (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(sink).toPandas()


def test_host_monitor_counters_and_restart(spark, tmp_path):
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    _write_events(
        spark,
        src,
        [("a.test", 500, True), ("a.test", 700, True), ("b.test", 3000, False)],
        "b0",
    )
    sink = str(tmp_path / "out")
    out1 = _run_once(spark, src, ckpt, sink).set_index("host")
    assert out1.loc["a.test", "n_fetches"] == 2
    assert out1.loc["a.test", "total_ms"] == 1200
    assert not out1.loc["a.test", "slow"]  # avg 600 <= 1000
    assert out1.loc["b.test", "slow"]  # avg 3000 > 1000
    assert out1.loc["b.test", "n_failures"] == 1

    # restart with more events: state recovers from the checkpoint and
    # keeps accumulating (TasksMonitor's running averages, durable)
    _write_events(spark, src, [("a.test", 5000, True)], "b1")
    all2 = _run_once(spark, src, ckpt, sink)
    # parquet sink appends across runs: take the latest emission per host
    out2 = (
        all2.sort_values("n_fetches").groupby("host").last()
    )
    assert out2.loc["a.test", "n_fetches"] == 3
    assert out2.loc["a.test", "total_ms"] == 6200
    # running avg 2066 > 1000 -> host has become slow
    assert out2.loc["a.test", "slow"]
    # b.test got no new events in run 2 -> no new emission appended
    assert len(all2[all2["host"] == "b.test"]) == 1
