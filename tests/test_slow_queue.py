"""Q5 slow-queue eviction: per-request response times advance the
politeness clock (FetchQueue nextFetchTime = endTime + delay) and
slow hosts are detached for subsequent rounds."""

import numpy as np
from pyspark.sql import functions as F

from warps_nutch_spark.config import make_test_config
from warps_nutch_spark.operators import fetch as fetch_op
from warps_nutch_spark.operators.rows import complete_rows
from warps_nutch_spark.plans.round import RoundDriver
from warps_nutch_spark.simweb import SimWeb

NOW = 1_700_000_000_000
WEB = (20, 40, 42)  # host5 and host18 are slow (hi % 13 == 5)


def test_clock_includes_response_time(spark):
    import pandas as pd

    cfg = make_test_config(slow_host_avg_ms=1500, crawl_delay_ms=1000,
                           round_time_limit_ms=10_000_000)
    urls = [f"http://host5.test/detail/{i}" for i in (1, 9, 17)]
    df = complete_rows(spark.createDataFrame(pd.DataFrame({"url": urls})), cfg, NOW)
    fl = df.withColumn("generated_batch", F.lit("b1")).withColumn("batch_id", F.lit("b1"))
    res = fetch_op.fetch(fl, None, cfg, NOW, "b1", WEB).toPandas().sort_values("fetch_ts")
    web = SimWeb(*WEB)
    # spacing between consecutive requests = delay + previous duration
    ts = res.fetch_ts.to_numpy()
    dur = res.fetch_duration_ms.to_numpy()
    for k in range(1, len(ts)):
        assert ts[k] - ts[k - 1] == 1000 + dur[k - 1]
    # slow host: durations include the +3000ms component
    assert (dur > 3000).all()


def test_slow_hosts_detached_next_round(spark, tmp_path):
    cfg = make_test_config(
        slow_host_avg_ms=1500,
        crawl_delay_ms=100,
        round_time_limit_ms=10_000_000,
        top_n=10_000,
        max_per_host=50,
    )
    web = SimWeb(*WEB)
    drv = RoundDriver(spark, str(tmp_path / "crawl"), cfg, WEB, NOW)
    seeds = spark.createDataFrame([(u,) for u in web.seeds(3)], ["value"])
    drv.inject(seeds)
    drv.run_round(0)
    detached = {r["host"] for r in drv.unreachable_hosts().collect()}
    assert "host5.test" in detached  # slow host evicted
    assert "host0.test" not in detached
    # round 1 fetchlist excludes detached hosts
    drv.run_round(1)
    fl_hosts = {
        r["host"]
        for r in drv._read_stage("batch-0001", "generate").select("host").collect()
    }
    assert "host5.test" not in fl_hosts
    assert len(fl_hosts) > 0
