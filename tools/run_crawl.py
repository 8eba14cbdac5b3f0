"""spark-submit entry point for the crawl engine (north_rule:
``spark-submit --py-files`` packaging).

Package and run:

    cd /root/repo && zip -r /tmp/wns.zip warps_nutch_spark
    spark-submit --py-files /tmp/wns.zip tools/run_crawl.py \
        --workdir /data/crawl --rounds 4 --hosts 2000 --seeds-per-host 4

On a real cluster add executor/memory flags and (for the Iceberg
frontier) --packages org.apache.iceberg:iceberg-spark-runtime plus
--frontier-table catalog.db.frontier.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--hosts", type=int, default=2000)
    p.add_argument("--pages-base", type=int, default=60)
    p.add_argument("--seeds-per-host", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--top-n", type=int, default=100_000)
    p.add_argument("--max-per-host", type=int, default=200)
    p.add_argument("--crawl-delay-ms", type=int, default=5_000)
    p.add_argument("--seeds-file", default=None, help="real seed list (overrides SimWeb seeds)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("warps-nutch-spark-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from warps_nutch_spark.config import CrawlConfig
    from warps_nutch_spark.plans.round import RoundDriver
    from warps_nutch_spark.simweb import SimWeb

    web_params = (args.hosts, args.pages_base, args.seed)
    cfg = CrawlConfig(
        top_n=args.top_n,
        max_per_host=args.max_per_host,
        crawl_delay_ms=args.crawl_delay_ms,
    )
    drv = RoundDriver(spark, args.workdir, cfg, web_params)
    if args.seeds_file:
        seeds = args.seeds_file
    else:
        seeds = spark.createDataFrame(
            [(u,) for u in SimWeb(*web_params).seeds(args.seeds_per_host)], ["value"]
        )
    stats = drv.run(seeds, rounds=args.rounds)
    print(json.dumps({"rounds": stats}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
