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


def test_domain_statistics_modes(spark):
    from warps_nutch_spark.functions.status import CrawlStatus
    from warps_nutch_spark.sources.readers import domain_statistics

    fr = spark.createDataFrame(
        [
            ("http://a.x.test/1", "a.x.test", CrawlStatus.FETCHED),
            ("http://b.x.test/2", "b.x.test", CrawlStatus.FETCHED),
            ("http://c.org/3", "c.org", CrawlStatus.UNFETCHED),
        ],
        "url string, host string, status int",
    )
    host = {r["key"]: r["cnt"] for r in domain_statistics(fr, "host").collect()}
    assert host == {"a.x.test": 1, "b.x.test": 1, "FETCHED": 2,
                    "NOT_FETCHED": 1}
    dom = {r["key"]: r["cnt"] for r in domain_statistics(fr, "domain").collect()}
    assert dom["x.test"] == 2  # two-label registered domain
    suf = {r["key"]: r["cnt"] for r in domain_statistics(fr, "suffix").collect()}
    assert suf["test"] == 2 and "org" not in suf  # unfetched rows excluded
    import pytest as _p

    with _p.raises(ValueError):
        domain_statistics(fr, "tld")


def test_sniff_encoding_edges(spark):
    from pyspark.sql import functions as F

    from warps_nutch_spark.functions.encoding import sniff_encoding_col

    rows = [
        # meta tag past 2000 bytes -> NOT sniffed (CHUNK_SIZE contract)
        (1, b" " * 2100 + b"<meta charset=utf-8>", None),
        # single-quoted http-equiv (NUTCH-1006)
        (2, b"<meta http-equiv='content-type' content='text/html;"
            b" charset=UTF-16BE'>", None),
        # UTF-16BE BOM
        (3, b"\xfe\xffplain", None),
        # header beats everything
        (4, b"<meta charset=utf-8>", "text/html; charset=ISO-8859-1"),
    ]
    df = spark.createDataFrame(rows, "id int, content binary, header string")
    out = {
        r["id"]: r["enc"]
        for r in df.select(
            "id", sniff_encoding_col(F.col("content"), F.col("header")).alias("enc")
        ).collect()
    }
    assert out == {
        1: "windows-1252",  # default — meta is out of the sniff window
        2: "utf-16be",
        3: "utf-16be",
        4: "windows-1252",  # header iso-8859-1 -> alias
    }
