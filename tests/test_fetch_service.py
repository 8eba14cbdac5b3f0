"""Crowdsourcing fetch mode: task leasing + forwarded-result ingest
must be mode-transparent — parse/updatedb see the same fetch-result
rows the native engine produces (FetchMode.CROWDSOURCING,
fetch/service/FetchResource.java, plugin/protocol-crowd)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from warps_nutch_spark import simweb
from warps_nutch_spark.config import make_test_config
from warps_nutch_spark.functions.status import ProtocolStatus
from warps_nutch_spark.operators import fetch as fetch_op
from warps_nutch_spark.operators import fetch_service as svc
from warps_nutch_spark.operators.rows import complete_rows

NOW = 1_700_000_000_000
WEB = (6, 80, 42)


def _fetchlist(spark, cfg, urls, batch="b1"):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    rows = complete_rows(df, cfg, NOW)
    return rows.withColumn("generated_batch", F.lit(batch)).withColumn(
        "batch_id", F.lit(batch)
    )


def _simulate_workers(leased_pdf, web, n_workers=3):
    """External workers: fetch each leased task via the deterministic
    SimWeb protocol and submit forwarded responses."""
    hi, j, valid = simweb.parse_urls(leased_pdf["url"])
    http = web.http_status(hi, j)
    http[~valid] = 404
    rows = []
    for k in range(len(leased_pdf)):
        out_urls = None
        blob = None
        if http[k] == 200:
            blob = web.render_payload_batch(hi[k : k + 1], j[k : k + 1])[0]
            out_urls = web.outlinks_of(hi[k : k + 1], j[k : k + 1])[0]
        elif http[k] in (301, 302):
            out_urls = [str(web.redirect_target(hi[k : k + 1], j[k : k + 1])[0])]
        rows.append(
            {
                "url_hash": leased_pdf["url_hash"].iloc[k],
                "http_status": int(http[k]),
                "bytes": blob,
                "out_urls": out_urls,
                "fetch_ts": NOW + k,
                "fetch_duration_ms": 5,
                "worker_id": f"worker-{k % n_workers}",
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture()
def web():
    return simweb.SimWeb(*WEB)


def test_crowd_mode_matches_native_fetch(spark, web):
    cfg = make_test_config(crawl_delay_ms=1000)
    j = np.arange(60)
    ok = web.http_status(np.full(60, 0), j) >= 0
    urls = [f"http://host0.test/{simweb.CATEGORIES[x % 8]}/{x}" for x in j[ok][:20]]
    urls += [f"http://host1.test/{simweb.CATEGORIES[x % 8]}/{x}" for x in j[ok][:20]]
    fl = _fetchlist(spark, cfg, urls)
    robots = spark.createDataFrame(web.robots())

    native = {
        r["url"]: r
        for r in fetch_op.fetch(fl, robots, cfg, NOW, "b1", WEB).collect()
    }

    tasks, denied = svc.emit_fetch_tasks(fl, robots, cfg, "b1")
    task_pdf = tasks.select("url_hash", "url").toPandas()
    submitted = spark.createDataFrame(_simulate_workers(task_pdf, web))
    crowd = {
        r["url"]: r
        for r in svc.ingest_fetch_results(tasks, denied, submitted, "b1", NOW).collect()
    }

    assert set(native) == set(crowd)
    for url, n in native.items():
        c = crowd[url]
        if not n["fetched"]:
            continue  # budget semantics differ (workers have no clock)
        assert c["fetched"], url
        assert c["proto_code"] == n["proto_code"], url
        assert c["new_status"] == n["new_status"], url
        assert (c["bytes"] is None) == (n["bytes"] is None), url
        if n["bytes"] is not None:
            assert bytes(c["bytes"]) == bytes(n["bytes"]), url
        assert (c["out_urls"] or []) == (n["out_urls"] or []), url


def test_crowd_unreturned_tasks_stay_unfetched(spark, web):
    cfg = make_test_config()
    j = np.arange(40)
    ok = web.http_status(np.full(40, 0), j) == 200
    urls = [f"http://host0.test/{simweb.CATEGORIES[x % 8]}/{x}" for x in j[ok][:10]]
    fl = _fetchlist(spark, cfg, urls)
    tasks, denied = svc.emit_fetch_tasks(fl, None, cfg, "b1")
    task_pdf = tasks.select("url_hash", "url").toPandas()
    # workers only return half the tasks
    submitted = spark.createDataFrame(_simulate_workers(task_pdf.iloc[:5], web))
    res = svc.ingest_fetch_results(tasks, denied, submitted, "b1", NOW).toPandas()
    assert (~res.fetched).sum() == len(task_pdf) - 5
    unret = res[~res.fetched]
    # pending-requeue semantics: status untouched, no protocol verdict
    assert unret["proto_code"].isna().all()
    assert (unret["new_status"] == unret["status"]).all()


def test_lease_fairness_across_queues(spark, web):
    cfg = make_test_config()
    urls = [f"http://host{h}.test/doc/{i}" for h in range(4) for i in range(10)]
    fl = _fetchlist(spark, cfg, urls)
    tasks, denied = svc.emit_fetch_tasks(fl, None, cfg, "b1")
    leased = svc.lease_tasks(tasks, count=8, per_queue=2).toPandas()
    assert len(leased) == 8
    # fair: no queue over its per_queue allotment
    assert leased.groupby("queue_id").size().max() <= 2
    # duplicate submissions: first worker (earliest fetch_ts) wins
    task_pdf = tasks.select("url_hash", "url").toPandas().iloc[:3]
    sub = _simulate_workers(task_pdf, web)
    dup = sub.copy()
    dup["fetch_ts"] = dup["fetch_ts"] + 1000
    dup["worker_id"] = "late-worker"
    both = spark.createDataFrame(pd.concat([dup, sub]))
    res = svc.ingest_fetch_results(tasks, denied, both, "b1", NOW)
    got = res.filter(F.col("fetched")).select("url", "fetch_ts").toPandas()
    assert (got["fetch_ts"] < NOW + 1000).all()


def test_crowd_mode_crawl_matches_native_end_to_end(spark, tmp_path_factory):
    """Two full crawls over the same SimWeb — one native, one
    crowdsourced — must agree on the URL-seen set, statuses, scores,
    cash and distances (fetch timestamps legitimately differ: workers
    have no virtual politeness clock, so schedule times shift)."""
    from warps_nutch_spark.plans.round import RoundDriver

    web = simweb.SimWeb(*WEB)
    seeds = spark.createDataFrame([(u,) for u in web.seeds(3)], ["value"])

    def crawl(mode, wd):
        cfg = make_test_config(
            top_n=300, max_per_host=60, crawl_delay_ms=1000,
            round_time_limit_ms=600_000, host_buckets=4,
            bloom_partitions=4, fetch_mode=mode,
        )
        drv = RoundDriver(spark, str(wd), cfg, WEB, NOW)
        drv.run(seeds, rounds=2)
        return (
            drv.store.read()
            .select("url", "status", "score", "cash", "distance")
            .toPandas()
            .sort_values("url")
            .reset_index(drop=True)
        )

    a = crawl("native", tmp_path_factory.mktemp("native"))
    b = crawl("crowd", tmp_path_factory.mktemp("crowd"))
    assert list(a.url) == list(b.url)
    assert (a.status == b.status).all()
    assert (a.distance == b.distance).all()
    assert ((a.score - b.score).abs() < 1e-3).all()
    assert ((a.cash - b.cash).abs() < 1e-3).all()
