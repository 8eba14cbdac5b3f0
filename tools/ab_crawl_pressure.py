"""Does suite memory/session state slow the crawl? Run N heavy queries
first (like bench.py does), then the crawl, optionally with a
System.gc() + clearCache between. Scratch tool for OPTIMIZATION_r06.
Usage: python tools/ab_crawl_pressure.py [none|gc] [n_queries]"""

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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata_local/sf1")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "none"
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("wns-ab-pressure")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from warps_nutch_spark.queries import QUERIES

    heavy = [
        "dedup_simhash_jaccard", "embedding_cosine_dedup", "embedding_sim_join",
        "embedding_dedup_components", "parse_msoffice", "dedup_minhash_lsh",
        "text_profile_signature", "rolling_fingerprint", "simhash_pairs",
        "parse_pdf", "parse_office", "dedup_ngram_jaccard", "opic_update",
        "generate_topn", "inlink_anchors", "image_dedup_components",
        "dedup_components", "embedding_sim_join_indexed", "outlink_normalize",
        "urlfilter_plugins",
    ][:nq]
    t0 = time.time()
    for name in heavy:
        QUERIES[name](spark, SF_DIR).count()
    print(f"pressure: {len(heavy)} queries in {time.time()-t0:.1f}s", flush=True)

    if mode == "gc":
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)
        print("ran clearCache + System.gc", flush=True)
    elif mode == "gconly":
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)
        print("ran System.gc only", flush=True)

    from warps_nutch_spark.config import CrawlConfig
    from warps_nutch_spark.plans.round import RoundDriver
    from warps_nutch_spark.simweb import SimWeb

    CRAWL_WEB = (2000, 60, 42)
    web = SimWeb(*CRAWL_WEB)
    cfg = CrawlConfig(
        top_n=100_000, max_per_host=200, crawl_delay_ms=1000,
        round_time_limit_ms=3_600_000, host_buckets=64,
        bloom_partitions=16, bloom_capacity_per_partition=2_000_000,
    )
    seeds = spark.createDataFrame([(u,) for u in web.seeds(4)], ["value"])
    wd = tempfile.mkdtemp(prefix="wns-abpress-")
    try:
        drv = RoundDriver(spark, wd, cfg, CRAWL_WEB)
        t0 = time.time()
        stats = drv.run(seeds, rounds=3)
        elapsed = time.time() - t0
        for s in stats:
            print(s["batch_id"], round(s["elapsed_sec"], 1), s["stage_sec"], flush=True)
        f = sum(s["fetched"] for s in stats); u = sum(s["updated"] for s in stats)
        print(f"mode={mode} crawl={elapsed:.1f}s urls_per_sec={round((f+u)/elapsed,1)}")
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
