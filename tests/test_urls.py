"""URL function semantics vs golden vectors derived from the reference
(TestTableUtil.java round-trips; BasicURLNormalizer + regex-normalize
default rules)."""

import pandas as pd
import pytest

from warps_nutch_spark.functions import urls

CANON_GOLDEN = [
    # basic normalizer semantics (BasicURLNormalizer.java:95-201)
    ("HTTP://Foo.COM/", "http://foo.com/"),
    ("http://foo.com:80/bar", "http://foo.com/bar"),
    ("https://foo.com:443/bar", "https://foo.com/bar"),
    ("http://foo.com:8080/bar", "http://foo.com:8080/bar"),
    ("http://foo.com/a/./b.html", "http://foo.com/a/b.html"),
    ("http://foo.com/a/../b.html", "http://foo.com/b.html"),
    ("http://foo.com/a//b//c", "http://foo.com/a/b/c"),
    ("http://foo.com", "http://foo.com/"),
    ("http://foo.com/page#frag", "http://foo.com/page"),
    # regex normalizer default rules (regex-normalize-default.xml)
    (
        "http://foo.com/page;jsessionid=1E6FEC0D14D044541DD84D2D013D29ED",
        "http://foo.com/page",
    ),
    ("http://foo.com/p?a=1&sid=ABC123&b=2", "http://foo.com/p?a=1&b=2"),
    ("http://foo.com/p?&a=1", "http://foo.com/p?a=1"),
    ("http://foo.com/p?a=1&&b=2", "http://foo.com/p?a=1&b=2"),
    ("http://foo.com/p?a=1&", "http://foo.com/p?a=1"),
    ("http://foo.com/p?", "http://foo.com/p"),
    ("not a url", None),
]


@pytest.mark.parametrize("raw,expected", CANON_GOLDEN)
def test_canonicalize_scalar(raw, expected):
    assert urls.canonicalize(raw) == expected


def test_canonicalize_series_matches_scalar():
    raws = pd.Series([r for r, _ in CANON_GOLDEN])
    got = urls.canonicalize_series(raws)
    for i, (_, expected) in enumerate(CANON_GOLDEN):
        v = got.iloc[i]
        assert (None if pd.isna(v) else v) == expected


REVERSE_GOLDEN = [
    # TableUtil.java:51-117 semantics
    (
        "http://bar.foo.com:8983/to/index.html?a=b",
        "com.foo.bar:http:8983/to/index.html?a=b",
    ),
    ("http://www.example.org/", "org.example.www:http/"),
    ("http://example.org/path", "org.example:http/path"),
    ("http://host0.test/detail/3", "test.host0:http/detail/3"),
]


@pytest.mark.parametrize("url,key", REVERSE_GOLDEN)
def test_reverse_url(url, key):
    assert urls.reverse_url(url) == key
    assert urls.unreverse_url(key) == url


def test_host_and_domain():
    assert urls.host_of("http://bar.foo.com:81/x") == "bar.foo.com"
    assert urls.domain_of("bar.foo.com") == "foo.com"
    assert urls.domain_of("localhost") == "localhost"
    assert urls.host_of("garbage") is None


def test_url_hash_is_sha1_hex():
    h = urls.url_hash("http://foo.com/")
    assert len(h) == 40 and int(h, 16) >= 0


def test_canonicalize_col_rejects_garbage(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("not a url",), (":::",), ("http://ok.test/x",)], ["url"])
    got = df.select(urls.canonicalize_col(F.col("url")).alias("c")).toPandas()["c"]
    assert list(got.isna()) == [True, True, False]


def test_spark_column_forms(spark):
    from pyspark.sql import functions as F

    rows = [(r,) for r, e in CANON_GOLDEN if e is not None]
    df = spark.createDataFrame(rows, ["url"])
    got = (
        df.select(
            urls.canonicalize_col(F.col("url")).alias("canon"),
            F.col("url"),
        )
        .toPandas()
    )
    for _, row in got.iterrows():
        assert row["canon"] == urls.canonicalize(row["url"])

    df2 = spark.createDataFrame([(u,) for u, _ in REVERSE_GOLDEN], ["url"])
    got2 = df2.select(
        urls.reverse_url_col(F.col("url")).alias("rev"), "url"
    ).toPandas()
    for _, row in got2.iterrows():
        assert row["rev"] == urls.reverse_url(row["url"])

    got3 = df2.select(
        urls.host_col(F.col("url")).alias("h"),
        urls.domain_col(urls.host_col(F.col("url"))).alias("d"),
        "url",
    ).toPandas()
    for _, row in got3.iterrows():
        assert row["h"] == urls.host_of(row["url"])
        assert row["d"] == urls.domain_of(urls.host_of(row["url"]))


# golden vectors from the reference's TestURLUtil.java chooseRepr test
_A = "http://www.a.com"
_B = "http://www.b.com"
_ASUB = "http://www.news.a.com"
_AQ = "http://www.a.com?y=1"
_AP = "http://www.a.com/xyz/index.html"
_AP2 = "http://www.a.com/abc/page.html"
_AP3 = "http://www.news.a.com/abc/page.html"

CHOOSE_REPR_VECTORS = [
    (_A, _B, True, _B),    # 1) different domain -> dst
    (_A, _B, False, _B),
    (_A, _AQ, False, _A),  # 2) permanent and root -> src
    (_A, _AP, False, _A),
    (_AP, _A, False, _A),  # 3) permanent, not root, dst root -> dst
    (_AP, _AP2, False, _AP2),  # 4) permanent, neither root -> dst
    (_A, _AP, True, _A),   # 5) temp, src root, dst not -> src
    (_AP, _A, True, _A),   # 6) temp, not root, dst root -> dst
    (_AP, _AP2, True, _AP2),  # 7) temp same host: shorter path wins
    (_AP, _AP3, True, _AP),   # 7) temp diff host: fewer subdomains
    (_A, _ASUB, True, _A),    # 8) temp both root: fewer subdomains
]


@pytest.mark.parametrize("src,dst,temp,want", CHOOSE_REPR_VECTORS)
def test_choose_repr_golden_vectors(src, dst, temp, want):
    assert urls.choose_repr(src, dst, temp) == want


def test_choose_repr_col_matches_scalar(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(s, d, t) for s, d, t, _ in CHOOSE_REPR_VECTORS], ["src", "dst", "temp"]
    )
    got = df.select(
        urls.choose_repr_col(F.col("src"), F.col("dst"), F.col("temp")).alias("r")
    ).collect()
    for row, (_, _, _, want) in zip(got, CHOOSE_REPR_VECTORS):
        assert row["r"] == want
