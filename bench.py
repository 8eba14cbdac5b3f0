"""Benchmark harness (driver contract).

Runs the headline operator queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus a crawl-round
throughput benchmark (the BASELINE.json metric: URLs fetched+updated
per second per round) on a Zipf-skewed SimWeb frontier.

Output protocol (r2 postmortem: the driver tail-buffers stdout, so a
single giant line got its head truncated and parsed as null):
  - full per-query timing map + crawl detail -> BENCH/bench_full.json
    (and an earlier stdout line, best-effort)
  - FINAL stdout line = compact headline-only JSON the driver parses:
    {"metric": ..., "value": urls/sec, "unit": "urls/sec",
     "queries": {...}, "sf": ..., "cpus": N, "crawl": {per-round stage_sec}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
# single-threaded BLAS in python workers: each of N workers spawning a
# full OpenBLAS pool thrashes N*cores threads (measured 5x slowdown)
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# bench-crawl scale: ~120k-page web, 2k hosts, Zipf-skewed (hot host
# ~12%), 2 rounds. Politeness time is virtual, so wall-clock measures
# engine work, not sleeps.
CRAWL_WEB = (
    int(os.environ.get("WNS_BENCH_HOSTS", "2000")),
    int(os.environ.get("WNS_BENCH_PAGES_BASE", "60")),
    42,
)
# 3 rounds so the per-round stage_sec trend shows updatedb cost is
# O(updates), not O(frontier) (the merge-on-read fix)
CRAWL_ROUNDS = int(os.environ.get("WNS_BENCH_ROUNDS", "3"))


def box_noise_probe() -> dict:
    """Tenant-contention telemetry: load average + a 1-thread numpy
    matmul (memory-bandwidth-bound; ~0.25-0.8 s on a quiet box, 2-8 s
    under neighbor contention). Recorded before/after the suite so any
    bench artifact carries the noise conditions it was measured under
    (the box bursts to load 10-17 and its single-thread memory
    bandwidth drops ~5-8x, which is invisible in steal%).
    """
    probe: dict = {"load_avg_1m": round(os.getloadavg()[0], 2)}
    try:
        import numpy as np

        rng = np.random.default_rng(0)
        a = rng.random((1200, 1200))
        b = rng.random((1200, 1200))
        a @ b  # warm allocator/BLAS
        t0 = time.time()
        for _ in range(3):
            a @ b
        probe["matmul_1t_sec"] = round(time.time() - t0, 2)
    except Exception:
        probe["matmul_1t_sec"] = None
    return probe


def run_crawl_bench(spark) -> dict:
    from warps_nutch_spark.config import CrawlConfig
    from warps_nutch_spark.plans.round import RoundDriver
    from warps_nutch_spark.simweb import SimWeb

    wd = tempfile.mkdtemp(prefix="wns-bench-")
    try:
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
        drv = RoundDriver(spark, wd, cfg, CRAWL_WEB)
        seeds = spark.createDataFrame([(u,) for u in web.seeds(4)], ["value"])
        t0 = time.time()
        stats = drv.run(seeds, rounds=CRAWL_ROUNDS)
        elapsed = time.time() - t0
        fetched = sum(s["fetched"] for s in stats)
        updated = sum(s["updated"] for s in stats)
        return {
            "elapsed_sec": round(elapsed, 2),
            "rounds": CRAWL_ROUNDS,
            "fetched": fetched,
            "updated": updated,
            "urls_per_sec": round((fetched + updated) / elapsed, 1),
            "per_round": [
                {k: (round(v, 2) if isinstance(v, float) else v) for k, v in s.items()}
                for s in stats
            ],
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def main() -> None:
    from pyspark.sql import SparkSession

    from warps_nutch_spark.queries import QUERIES

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("warps-nutch-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("WNS_BENCH_DRIVER_MEM", "24g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so the first timed query is
    # not charged session startup (it was ~4 s of pure warmup)
    for t in ("documents", "embeddings", "events", "orders"):
        try:
            spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()
        except Exception:
            pass

    noise_pre = box_noise_probe()
    timings: dict[str, float] = {}
    total0 = time.time()
    for name, fn in QUERIES.items():
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()  # force full execution
        timings[name] = round(time.time() - t0, 3)
        _ = n

    t0 = time.time()
    crawl = run_crawl_bench(spark)
    timings["crawl_round"] = round(time.time() - t0, 3)
    total = round(time.time() - total0, 3)
    noise_post = box_noise_probe()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # headline metric = the BASELINE.json crawl throughput; suite
    # wall-time reported separately (r1 mislabeled the suite seconds as
    # the throughput value)
    headline = {
        "metric": "urls_fetched_plus_updated_per_sec",
        "value": crawl["urls_per_sec"],
        "unit": "urls/sec",
        "suite_wall_sec": total,
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "box_noise": {"pre": noise_pre, "post": noise_post},
        "crawl": {
            "rounds": crawl["rounds"],
            "fetched": crawl["fetched"],
            "updated": crawl["updated"],
            "elapsed_sec": crawl["elapsed_sec"],
            "per_round_stage_sec": [
                {
                    k: v
                    for k, v in s.items()
                    if k.endswith("_sec") or k in ("fetched", "updated")
                }
                for s in crawl["per_round"]
            ],
        },
    }
    # full detail (all per-round counters) to a file + an EARLY stdout
    # line; the driver tail-buffers stdout so the parseable headline
    # must be the compact FINAL line
    full_path = os.path.join(_REPO, "BENCH", "bench_full.json")
    os.makedirs(os.path.dirname(full_path), exist_ok=True)
    with open(full_path, "w") as fh:
        json.dump({**headline, "crawl_detail": crawl}, fh, indent=1)
    # early lines: full per-query timings + crawl detail (best effort —
    # the driver may truncate these; the canonical copy is bench_full.json)
    print(json.dumps({"queries": timings}))
    print(json.dumps({"crawl_detail": crawl}))
    sys.stdout.flush()
    # FINAL line = the one the driver parses. r2+r3 postmortem: embedding
    # the 60+-entry queries map here pushed the line past the driver's
    # ~2.2 KB tail buffer and the HEAD (metric/value) got cut -> parsed
    # null. Keep it headline-only.
    compact = {k: v for k, v in headline.items() if k not in ("queries", "crawl")}
    compact["crawl"] = {
        k: v for k, v in headline["crawl"].items() if k != "per_round_stage_sec"
    }
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
