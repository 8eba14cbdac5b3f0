"""Extra measurement harness for optimization work (guide §1).

NOT part of the driver contract — bench.py is frozen; this file exists
so per-query isolation runs, noop-sink timing, and plan dumps do not
touch it.

Usage:
  python bench_extra.py [--sf DIR] [--mode count|noop] [--repeat N]
                        [--plans OUTDIR] [--queries a,b,c]

- mode=count reproduces bench.py's timing methodology (df.count()),
  which is what the driver times; mode=noop forces every column of
  every row (guide §1.4) to expose compute hidden by count()'s pruning.
- --plans writes .explain("formatted") for each selected query to
  OUTDIR/<name>.txt before timing.
Emits one JSON line per query and a final summary JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--mode", choices=("count", "noop"), default="count")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--queries", default=None, help="comma-separated names; default all")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from warps_nutch_spark.queries import QUERIES

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("wns-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(args.cpus, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("WNS_BENCH_DRIVER_MEM", "24g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("documents", "embeddings", "events", "orders"):
        try:
            spark.read.parquet(os.path.join(args.sf, f"{t}.parquet")).count()
        except Exception:
            pass

    names = list(QUERIES) if not args.queries else args.queries.split(",")
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
    timings: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        if args.plans:
            import contextlib
            import io

            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        samples = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            if args.mode == "count":
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        timings[name] = samples
        print(json.dumps({"query": name, "sec": samples}), flush=True)
    print(
        json.dumps(
            {
                "sf": args.sf,
                "mode": args.mode,
                "total_min_sec": round(sum(min(s) for s in timings.values()), 2),
                "queries_min": {k: min(v) for k, v in timings.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
