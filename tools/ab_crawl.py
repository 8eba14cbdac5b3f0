"""Standalone crawl-bench replica (same session config and workload as
bench.py's run_crawl_bench) for round-driver experiments.
Usage: python tools/ab_crawl.py [aqe_on|aqe_off] [rounds]
Scratch measurement tool for OPTIMIZATION_r06."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def main():
    aqe = "false" if (len(sys.argv) > 1 and sys.argv[1] == "aqe_off") else "true"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("wns-ab-crawl")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 16)))
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from warps_nutch_spark.config import CrawlConfig
    from warps_nutch_spark.plans.round import RoundDriver
    from warps_nutch_spark.simweb import SimWeb

    CRAWL_WEB = (2000, 60, 42)
    web = SimWeb(*CRAWL_WEB)
    cfg = CrawlConfig(
        top_n=100_000,
        max_per_host=200,
        crawl_delay_ms=1000,
        round_time_limit_ms=3_600_000,
        host_buckets=64,
        bloom_partitions=16,
        bloom_capacity_per_partition=2_000_000,
    )
    seeds = spark.createDataFrame([(u,) for u in web.seeds(4)], ["value"])

    def one_crawl(label):
        wd = tempfile.mkdtemp(prefix="wns-abcrawl-")
        try:
            drv = RoundDriver(spark, wd, cfg, CRAWL_WEB)
            t0 = time.time()
            stats = drv.run(seeds, rounds=rounds)
            elapsed = time.time() - t0
            fetched = sum(s["fetched"] for s in stats)
            updated = sum(s["updated"] for s in stats)
            for s in stats:
                print(
                    label, s["batch_id"], "elapsed", round(s["elapsed_sec"], 1),
                    "stages", s["stage_sec"], flush=True,
                )
            print(
                f"{label} AQE={aqe} total={elapsed:.1f}s fetched={fetched} "
                f"updated={updated} urls_per_sec={round((fetched + updated) / elapsed, 1)}",
                flush=True,
            )
        finally:
            shutil.rmtree(wd, ignore_errors=True)

    one_crawl("warmup")
    one_crawl("measured")
    spark.stop()


if __name__ == "__main__":
    main()
