"""Profile the updatedb.plan_write stage (VERDICT r4 item 1).

Reproduces the bench crawl (2000 hosts, Zipf, local[32]) up to the
start of round-2 updatedb, then times each sub-plan separately:

  1. store.read()                    (frontier MOR scan)
  2. explode+agg contributions       (the one shuffle)
  3. full merge_rows compute (count) (no write)
  4. merge_rows parquet write        (the stage artifact)

Usage: python tools/profile_updatedb.py [round_to_profile]
"""

from __future__ import annotations

import os
import sys
import tempfile
import shutil
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

from pyspark.sql import SparkSession, functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WEB = (2000, 60, 42)
PROFILE_ROUND = int(sys.argv[1]) if len(sys.argv) > 1 else 1  # 0-based


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile-updatedb")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from warps_nutch_spark.queries import ensure_worker_imports

    ensure_worker_imports(spark)
    from warps_nutch_spark.config import CrawlConfig
    from warps_nutch_spark.plans.round import RoundDriver
    from warps_nutch_spark.operators import updatedb as upd_op
    from warps_nutch_spark.simweb import SimWeb

    wd = tempfile.mkdtemp(prefix="wns-prof-")
    try:
        web = SimWeb(*WEB)
        cfg = CrawlConfig(
            top_n=100_000,
            max_per_host=200,
            crawl_delay_ms=1000,
            round_time_limit_ms=3_600_000,
            host_buckets=64,
            bloom_partitions=16,
            bloom_capacity_per_partition=2_000_000,
        )
        drv = RoundDriver(spark, wd, cfg, WEB)
        seeds = spark.createDataFrame([(u,) for u in web.seeds(4)], ["value"])
        drv.inject(seeds)
        for r in range(PROFILE_ROUND):
            t0 = time.time()
            drv.run_round(r)
            print(f"round {r} full: {time.time()-t0:.2f}s", flush=True)

        # run the profile round up to parse, then hand-time updatedb
        r = PROFILE_ROUND
        t0 = time.time()
        part = drv.run_round(r, stop_after="parse")
        print(f"round {r} through parse: {time.time()-t0:.2f}s "
              f"stages={part['stage_sec']}", flush=True)
        batch_id = part["batch_id"]
        now = drv.round_now(r)

        fetchlist = drv._read_stage(batch_id, "generate")
        parsed = drv._read_stage(batch_id, "parse")
        if "bytes" in parsed.columns:
            parsed = parsed.drop("bytes")

        t = time.time()
        frontier = drv.store.read()
        n_frontier = frontier.count()
        print(f"[1] frontier MOR read+count: {time.time()-t:.2f}s "
              f"({n_frontier} rows)", flush=True)
        t = time.time()
        n_frontier = drv.store.read().count()
        print(f"[1b] second MOR read+count: {time.time()-t:.2f}s", flush=True)

        t = time.time()
        contribs = upd_op.explode_contributions(parsed, cfg)
        n_c = contribs.count()
        print(f"[2] explode contributions: {time.time()-t:.2f}s ({n_c} rows)",
              flush=True)
        t = time.time()
        agg = upd_op.aggregate_contributions(contribs, cfg)
        n_a = agg.count()
        print(f"[2b] aggregate contributions: {time.time()-t:.2f}s ({n_a} rows)",
              flush=True)

        cached = []
        t = time.time()
        merge_rows, counters = upd_op.updatedb(
            frontier, parsed, cfg, now, batch_id, drv.urlseen,
            cached_out=cached,
            prev_state=fetchlist.select("url_hash", "inlinks", "repr_url"),
        )
        n_m = merge_rows.count()
        print(f"[3] merge_rows compute+count: {time.time()-t:.2f}s ({n_m} rows)",
              flush=True)

        t = time.time()
        mr = drv.store.with_bucket(merge_rows.drop("host_bucket"))
        out = os.path.join(wd, "profile_out")
        mr.write.mode("overwrite").parquet(out)
        print(f"[4] merge_rows write (after [3] ran the plan once): "
              f"{time.time()-t:.2f}s", flush=True)
        t = time.time()
        mr2 = spark.read.parquet(out)
        mr2.write.mode("overwrite").parquet(out + "2")
        print(f"[4b] rewrite from parquet (pure IO): {time.time()-t:.2f}s",
              flush=True)
        for df in cached:
            df.unpersist()

        # [5]/[6]: the EXACT in-round plan_write tail (fresh updatedb()
        # call, persist, dropped-marks joins, with_bucket, stage write),
        # with and without the python_stage_parallelism wrapper.
        from warps_nutch_spark.plans.round import python_stage_parallelism
        from contextlib import nullcontext

        def run_tail(tag, ctx_factory, stage_name):
            t = time.time()
            cached2 = []
            frontier2 = drv.store.read()
            merge_rows2, counters2 = upd_op.updatedb(
                frontier2, parsed, cfg, now, batch_id, drv.urlseen,
                cached_out=cached2,
                prev_state=fetchlist.select("url_hash", "inlinks", "repr_url"),
            )
            merge_rows2 = merge_rows2.persist()
            cached2.append(merge_rows2)
            dropped = fetchlist.select(*frontier2.columns).join(
                parsed.select("url_hash"), on="url_hash", how="left_anti"
            )
            marks = dropped.select(
                "url_hash", F.col("generated_batch").alias("_keep_mark")
            )
            mr3 = (
                merge_rows2.join(marks, on="url_hash", how="left")
                .withColumn(
                    "generated_batch",
                    F.coalesce(F.col("_keep_mark"), F.col("generated_batch")),
                )
                .drop("_keep_mark")
            )
            dropped_rest = dropped.join(
                mr3.select("url_hash"), on="url_hash", how="left_anti"
            )
            mr3 = mr3.unionByName(dropped_rest.select(*mr3.columns))
            mr3 = drv.store.with_bucket(mr3.drop("host_bucket"))
            with ctx_factory():
                mr3.write.mode("overwrite").parquet(
                    os.path.join(wd, stage_name)
                )
            print(f"[{tag}] in-round tail: {time.time()-t:.2f}s", flush=True)
            for df in cached2:
                df.unpersist()

        run_tail("5-with-psp", lambda: python_stage_parallelism(spark), "tail_psp")
        run_tail("6-no-psp", nullcontext, "tail_nopsp")
        run_tail("7-with-psp-again", lambda: python_stage_parallelism(spark), "tail_psp2")
    finally:
        shutil.rmtree(wd, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
