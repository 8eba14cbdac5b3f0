"""Executor-scaling evidence: N=1 vs 4N=4 *executor processes*.

The north rule's criterion is throughput scaling from N to 4N
**executors** on a cluster. Threads inside one local JVM are a poor
proxy (shared GC, scheduler, memory bus — see BENCH/BASELINE.md);
the faithful sandbox proxy is separate JVM processes over a
host-sharded frontier, which is exactly how a real cluster partitions
this workload (the frontier is bucketed by host hash; politeness
queues are per-host, so shards never coordinate).

Protocol (identical total work in both arms, by construction):
- split the SimWeb host space into 4 shards (host_idx % 4);
- each shard is a self-contained crawl job (own seeds, own frontier,
  own URL-seen), run in a local[2] JVM;
- arm A: run the 4 shard jobs SEQUENTIALLY (1 executor);
- arm B: run the same 4 jobs CONCURRENTLY (4 executors);
- efficiency = sum(T_A_shards) / (4 * max(T_B_shards)).

Run: WNS_EXEC_CORES=1 PYTHONPATH=. python tools/executor_scaling.py
Appends results to BENCH/BASELINE.md.

HEADLINE PROTOCOL IS local[1] PER EXECUTOR (WNS_EXEC_CORES=1 — every
round's headline number used it). At local[2], 4 concurrent JVMs + up
to 8 Python workers oversubscribe this tenant VM's ~8 effective cores
and the measurement reads the box ceiling (~0.63), not the engine —
measured r5: 1.019 at local[1] vs 0.64/0.63 at local[2], same engine,
quiet box, probes in the artifacts.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, os, json, shutil, tempfile, time
sys.path.insert(0, os.environ["WNS_REPO"]) ; os.environ["PYTHONPATH"] = os.environ["WNS_REPO"]
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
from pyspark.sql import SparkSession
from warps_nutch_spark.config import CrawlConfig
from warps_nutch_spark.plans.round import RoundDriver
from warps_nutch_spark.simweb import SimWeb

shard = int(os.environ["WNS_SHARD"]); n_shards = int(os.environ["WNS_NSHARDS"])
web_params = tuple(json.loads(os.environ["WNS_WEB"]))
rounds = int(os.environ["WNS_ROUNDS"])
cores = os.environ.get("WNS_EXEC_CORES", "2")
spark = (SparkSession.builder.master(f"local[{cores}]")
         .config("spark.sql.shuffle.partitions", str(int(cores) * 4))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "6g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
web = SimWeb(*web_params)
cfg = CrawlConfig(top_n=100_000, max_per_host=400, crawl_delay_ms=1000,
                  round_time_limit_ms=3_600_000, host_buckets=16,
                  bloom_partitions=8, bloom_capacity_per_partition=1_000_000)
# shard = this executor's slice of the host space
seed_urls = [u for i, u in enumerate(web.seeds(8))
             if (i // 8) % n_shards == shard]
wd = tempfile.mkdtemp(prefix=f"wns-exec-{shard}-")
try:
    drv = RoundDriver(spark, wd, cfg, web_params)
    seeds = spark.createDataFrame([(u,) for u in seed_urls], ["value"])
    t0 = time.time()
    stats = drv.run(seeds, rounds=rounds)
    elapsed = time.time() - t0
    fetched = sum(s["fetched"] for s in stats)
    updated = sum(s["updated"] for s in stats)
    print("WNS_RESULT " + json.dumps({
        "shard": shard, "elapsed_sec": round(elapsed, 2),
        "fetched": fetched, "updated": updated}))
finally:
    shutil.rmtree(wd, ignore_errors=True)
    spark.stop()
"""


def launch(shard: int, n_shards: int, web, rounds: int) -> subprocess.Popen:
    env = dict(
        os.environ,
        WNS_REPO=REPO,
        WNS_SHARD=str(shard),
        WNS_NSHARDS=str(n_shards),
        WNS_WEB=json.dumps(list(web)),
        WNS_ROUNDS=str(rounds),
    )
    return subprocess.Popen(
        [sys.executable, "-c", CHILD], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def collect(p: subprocess.Popen) -> dict:
    out, _ = p.communicate()
    for line in out.splitlines():
        if line.startswith("WNS_RESULT "):
            return json.loads(line[len("WNS_RESULT "):])
    raise RuntimeError(f"shard failed:\n{out[-2000:]}")


def probe() -> dict:
    out = {"load_1m": round(os.getloadavg()[0], 2)}
    try:
        import numpy as np

        rng = np.random.default_rng(0)
        a = rng.random((1200, 1200))
        b = rng.random((1200, 1200))
        a @ b
        t0 = time.time()
        for _ in range(3):
            a @ b
        out["matmul_1t_sec"] = round(time.time() - t0, 2)
    except Exception:
        pass
    return out


def main():
    web = (4000, 400, 42, 8)
    rounds = 2
    n = 4

    probes = {"pre_sequential": probe()}
    # arm A: sequential (1 executor)
    seq = []
    for s in range(n):
        p = launch(s, n, web, rounds)
        seq.append(collect(p))
        print(f"sequential shard {s}: {seq[-1]['elapsed_sec']}s", flush=True)
    t_seq = sum(r["elapsed_sec"] for r in seq)
    probes["between_arms"] = probe()

    # arm B: concurrent (4 executors)
    t0 = time.time()
    procs = [launch(s, n, web, rounds) for s in range(n)]
    conc = [collect(p) for p in procs]
    t_conc_wall = time.time() - t0
    t_conc = max(r["elapsed_sec"] for r in conc)
    for r in conc:
        print(f"concurrent shard {r['shard']}: {r['elapsed_sec']}s", flush=True)
    probes["post_concurrent"] = probe()

    urls_total = sum(r["fetched"] + r["updated"] for r in seq)
    eff = t_seq / (n * t_conc)
    summary = {
        "web": {"hosts": web[0], "pages_base": web[1], "dim_spread": web[3]},
        "rounds": rounds,
        "box_noise": probes,
        "executors": {"N": 1, "4N": n, "cores_each": int(os.environ.get("WNS_EXEC_CORES", "2"))},
        "urls_total": urls_total,
        "sequential_sec": round(t_seq, 2),
        "concurrent_max_sec": round(t_conc, 2),
        "concurrent_wall_sec": round(t_conc_wall, 2),
        "throughput_1x_urls_per_sec": round(urls_total / t_seq, 1),
        "throughput_4x_urls_per_sec": round(urls_total / t_conc_wall, 1),
        "scaling_efficiency_1_to_4_executors": round(eff, 3),
        "per_shard_sequential": seq,
        "per_shard_concurrent": conc,
    }
    print(json.dumps(summary, indent=1))

    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(f"""

## Executor-scaling evidence (N=1 vs 4N=4 executor processes)

Separate JVM processes (local[{os.environ.get('WNS_EXEC_CORES', '2')}] each) over a host-sharded frontier —
the faithful sandbox proxy for N -> 4N *executors* (a real cluster
partitions this workload exactly this way: frontier bucketed by host
hash, per-host politeness queues, no cross-executor coordination).
Identical total work in both arms: the same 4 shard jobs run
sequentially (1 executor) vs concurrently (4 executors).

| arm | executors | time (s) | throughput (URLs/s) |
|---|---|---|---|
| sequential | 1 | {t_seq:.1f} | {urls_total / t_seq:.1f} |
| concurrent | 4 | {t_conc_wall:.1f} (max shard {t_conc:.1f}) | {urls_total / t_conc_wall:.1f} |

**Scaling efficiency 1 -> 4 executors = sum(T_seq) / (4 x max(T_conc))
= {eff:.3f}**

```json
{json.dumps(summary, indent=1)}
```
""")
    print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
