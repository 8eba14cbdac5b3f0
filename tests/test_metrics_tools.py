"""NutchMetrics report files (tools/NutchMetrics.java) and the
distributed ResolveUrls check (tools/ResolveUrls.java)."""

import os

from pyspark.sql import functions as F

from warps_nutch_spark.functions.status import CrawlStatus
from warps_nutch_spark.metrics import FILE_UNREACHABLE_HOSTS, NutchMetrics
from warps_nutch_spark.operators.resolve_urls import resolve_summary, resolve_urls


def test_unreachable_hosts_roundtrip(spark, workdir):
    m = NutchMetrics(workdir)
    assert m.load_unreachable_hosts() == set()
    hosts = spark.createDataFrame([("b.test",), ("a.test",)], ["host"])
    assert m.write_unreachable_hosts(hosts) == 2
    # merge semantics + sorted file (the reference's TreeSet)
    m.write_unreachable_hosts(["c.test", "a.test"])
    with open(os.path.join(m.dir, FILE_UNREACHABLE_HOSTS)) as f:
        assert f.read() == "a.test\nb.test\nc.test\n"
    # a fresh instance on the same dir loads the persisted state
    # (TasksMonitor.java:103 loadUnreachableHosts)
    assert NutchMetrics(workdir).load_unreachable_hosts() == {
        "a.test", "b.test", "c.test",
    }


def test_redirect_and_history_reports(spark, workdir):
    m = NutchMetrics(workdir)
    fr = spark.createDataFrame(
        [
            ("http://a.test/1", "http://a.test/new", CrawlStatus.REDIR_PERM, 0, 10),
            ("http://a.test/2", "http://a.test/tmp", CrawlStatus.REDIR_TEMP, 0, 10),
            ("http://a.test/3", None, CrawlStatus.FETCHED, 5, 9),
            ("http://a.test/4", None, CrawlStatus.FETCHED, 0, 9),
        ],
        "url string, repr_url string, status int, prev_fetch_time long,"
        " fetch_time long",
    )
    assert m.report_redirects(fr, "b0") == 2
    with open(os.path.join(m.dir, "fetch-redirects-b0.txt")) as f:
        lines = f.read().splitlines()
    assert any(
        ln.startswith("[PERM] - ") and ln.endswith("-> http://a.test/new")
        for ln in lines
    )
    assert any(ln.startswith("[TEMP] - ") for ln in lines)

    # only rows fetched at least twice reach the history report
    assert m.report_fetch_time_history(fr, "b0") == 1
    with open(os.path.join(m.dir, "fetch-time-history-b0.txt")) as f:
        (line,) = f.read().splitlines()
    assert "fetchTimeHistory : 5,9" in line and "status : fetched" in line

    seeds = spark.createDataFrame(
        [("http://seed.test/", "http://a.test/1")], ["seed_url", "url"]
    )
    assert m.report_urls_from_seed(seeds, "b0") == 1


def test_resolve_urls_distributed(spark):
    # lambda pickles by value — workers can't import the test module
    _fake_resolver = lambda host: (  # noqa: E731
        (_ for _ in ()).throw(OSError("unknown host"))
        if "bad" in host
        else "127.0.0.1"
    )
    urls = [
        "http://ok1.test/a",
        "http://ok2.test/b",
        "http://bad.test/c",
        "not a url",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = resolve_urls(df, resolver=_fake_resolver)
    rows = {r["url"]: r for r in out.collect()}
    assert rows["http://ok1.test/a"]["resolved"] is True
    assert rows["http://bad.test/c"]["resolved"] is False
    assert rows["not a url"]["resolved"] is False  # no host -> errored
    assert rows["http://ok2.test/b"]["host"] == "ok2.test"
    s = resolve_summary(out)
    assert s == {
        "total": 4,
        "resolved": 2,
        "errored": 2,
        "avg_millis": s["avg_millis"],
    }
