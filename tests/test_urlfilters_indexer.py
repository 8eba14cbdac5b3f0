"""URL filter family (F5/F6), index sink (S8), stale-mark
regeneration (F9), and WebTableReader analogs (S9/S10)."""

import pandas as pd
from pyspark.sql import functions as F

from warps_nutch_spark.config import make_test_config
from warps_nutch_spark.functions.status import CrawlStatus
from warps_nutch_spark.functions.urlfilters import (
    RegexUrlFilter,
    apply_filter_chain,
    domain_filter,
)
from warps_nutch_spark.operators import generate as gen_op
from warps_nutch_spark.operators.indexer import build_index_documents
from warps_nutch_spark.operators.rows import complete_rows
from warps_nutch_spark.sources import readers

NOW = 1_700_000_000_000


def test_regex_filter_first_match_wins_scalar_and_col(spark):
    f = RegexUrlFilter.parse_rules(
        """
        # comment
        -\\.(gif|zip)$
        +^http://good\\.
        -.
        """
    )
    cases = {
        "http://good.test/a.gif": False,  # deny rule first
        "http://good.test/page": True,
        "http://bad.test/page": False,  # falls to final deny
        None: False,
    }
    for url, want in cases.items():
        assert f.accepts(url) is want, url
    df = spark.createDataFrame(
        [(u,) for u in cases if u is not None], ["url"]
    )
    got = df.select("url", f.accepts_col(F.col("url")).alias("ok")).collect()
    for row in got:
        assert row["ok"] == cases[row["url"]]


def test_default_rules_block_assets_and_traps(spark):
    f = RegexUrlFilter()
    assert not f.accepts("http://a.test/img/logo.png")
    assert not f.accepts("ftp://a.test/file")
    assert not f.accepts("http://a.test/x/x/x/x/x/page")  # repeated segment
    assert f.accepts("http://a.test/detail/7")


def test_filter_chain_and_domain_filter(spark):
    df = spark.createDataFrame(
        [("http://a.test/p.css",), ("http://a.test/keep",), ("http://b.other/keep",)],
        ["url"],
    )
    out = apply_filter_chain(df, deny_suffixes=[".css"])
    assert {r["url"] for r in out.collect()} == {
        "http://a.test/keep",
        "http://b.other/keep",
    }
    allowed = spark.createDataFrame([("a.test",)], ["domain"])
    out2 = domain_filter(df, allowed)
    assert {r["url"] for r in out2.collect()} == {
        "http://a.test/p.css",
        "http://a.test/keep",
    }


def test_index_documents(spark):
    cfg = make_test_config()
    fr = complete_rows(
        spark.createDataFrame(
            pd.DataFrame({"url": ["http://a.test/1", "http://a.test/2"]})
        ),
        cfg,
        NOW,
    )
    fr = fr.withColumn(
        "status",
        F.when(F.col("url").endswith("/1"), CrawlStatus.FETCHED).otherwise(
            CrawlStatus.GONE
        ),
    ).withColumn("caption", F.lit("cap"))
    docs = build_index_documents(fr).collect()
    assert len(docs) == 1
    d = docs[0]
    assert d["url"] == "http://a.test/1" and d["content"] == "cap"
    assert d["domain"] == "a.test" and len(d["id"]) == 40


def test_stale_mark_regeneration(spark):
    cfg = make_test_config(regen_rounds=2)
    fr = complete_rows(
        spark.createDataFrame(
            pd.DataFrame({"url": ["http://a.test/1", "http://a.test/2"]})
        ),
        cfg,
        NOW,
    )
    fr = fr.withColumn(
        "generated_batch",
        F.when(F.col("url").endswith("/1"), "batch-0000").otherwise("batch-0003"),
    )
    # round 4: mark from round 0 is stale (4-0 >= 2), round 3 is fresh
    got = {
        r["url"]
        for r in gen_op.generate(fr, cfg, NOW, "batch-0004", current_round=4).collect()
    }
    assert got == {"http://a.test/1"}


def test_webtable_reader_analogs(spark):
    cfg = make_test_config()
    fr = complete_rows(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "url": [f"http://h{i % 2}.test/p/{i}" for i in range(6)],
                    "score": [float(i) for i in range(6)],
                }
            )
        ),
        cfg,
        NOW,
    )
    stats = {r["status_name"]: r["n"] for r in readers.frontier_stats(fr).collect()}
    assert stats == {"unfetched": 6}
    dumped = readers.dump(fr, url_regex=r"/p/[0-2]$", columns=["url", "score"])
    assert dumped.count() == 3 and dumped.columns == ["url", "score"]
    one = readers.get_url(fr, "http://h1.test/p/3").collect()
    assert len(one) == 1 and one[0]["score"] == 3.0
    hosts = {r["host"]: r for r in readers.build_host_table(fr).collect()}
    assert hosts["h0.test"]["page_count"] == 3
    assert hosts["h1.test"]["avg_score"] == 3.0


def test_index_lang_field(spark):
    """language-identifier parity: docs gain a lang field from their
    content via the trigram scorer."""
    import pandas as pd

    from warps_nutch_spark.operators.indexer import with_lang_field

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": ["a", "b", "c"],
                "content": [
                    "the quick brown fox and the lazy dog went to the market",
                    "el perro y el gato estaban en la casa con los ninos",
                    None,
                ],
            }
        )
    )
    out = with_lang_field(docs).toPandas().set_index("id")
    assert out.loc["a", "lang"] == "en"
    assert out.loc["b", "lang"] == "es"
    assert out.loc["c", "lang"] == "unknown"
    assert set(out.columns) == {"content", "lang"}
