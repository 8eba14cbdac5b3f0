"""Parser dispatch (ParserFactory/ParseUtil + parse-plugins.xml):
content-type routing, first-success chain fallback, the '*' fallback
tier, and parser-not-found when no fallback is configured."""

import io
import zipfile

import pandas as pd
import pytest

from warps_nutch_spark.operators.parse_dispatch import parse_dispatch

RSS = b"""<?xml version="1.0"?><rss><channel>
<item><link>http://feed.example/a</link><title>A</title><description>first</description></item>
<item><link>http://feed.example/b</link><title>B</title><description><b>second</b></description></item>
</channel></rss>"""

HTML = (
    b"<html><head><title>T</title></head>"
    b'<body>hello <a href="/next">go</a></body></html>'
)

JS = b'var u = "http://js.example/page"; var r = "sub/rel.html";'


def _zip_blob():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.txt", "alpha see http://zipped.example/x")
        zf.writestr("b.txt", "beta")
    return buf.getvalue()


@pytest.fixture(scope="module")
def dispatched(spark):
    rows = [
        ("h1", "http://s.example/p", "text/html", HTML),
        ("r1", "http://s.example/feed", "application/rss+xml", RSS),
        ("j1", "http://s.example/app.js", "application/x-javascript", JS),
        ("z1", "http://s.example/a.zip", "application/zip", _zip_blob()),
        ("z2", "http://s.example/bad.zip", "application/zip", b"not a zip"),
        ("t1", "http://s.example/readme", "text/plain", b"see http://plain.example/y"),
        ("b1", "http://s.example/blob", "application/octet-stream", b"\x00\x01"),
    ]
    pdf = pd.DataFrame(rows, columns=["url_hash", "url", "content_type", "bytes"])
    out = parse_dispatch(spark.createDataFrame(pdf)).toPandas().set_index("url_hash")
    assert len(out) == len(rows)  # exactly one result row per input
    return out


def test_html_routed_to_parse_html(dispatched):
    h = dispatched.loc["h1"]
    assert h["parsed_by"] == "parse-html" and h["parse_ok"]
    assert h["title"] == "T" and "hello" in h["text"]
    assert [o["url"] for o in h["outlinks"]] == ["http://s.example/next"]
    assert h["outlinks"][0]["anchor"] == "go"


def test_rss_chain_tika_declines_then_feed_parses(dispatched):
    r = dispatched.loc["r1"]
    # parse-plugins.xml maps rss -> [parse-tika, feed]; the tika tier
    # declines non-text/* so the feed parser must have produced this
    assert r["parsed_by"] == "feed" and r["parse_ok"]
    assert [o["url"] for o in r["outlinks"]] == [
        "http://feed.example/a",
        "http://feed.example/b",
    ]
    assert r["outlinks"][1]["anchor"] == "B"
    assert "second" in r["text"] and "<b>" not in r["text"]


def test_js_and_zip_and_text_backends(dispatched):
    j = dispatched.loc["j1"]
    assert j["parsed_by"] == "parse-js" and j["parse_ok"]
    urls = [o["url"] for o in j["outlinks"]]
    assert "http://js.example/page" in urls
    assert "http://s.example/sub/rel.html" in urls

    z = dispatched.loc["z1"]
    assert z["parsed_by"] == "parse-zip" and z["parse_ok"]
    assert "alpha" in z["text"] and "beta" in z["text"]
    assert [o["url"] for o in z["outlinks"]] == ["http://zipped.example/x"]
    bad = dispatched.loc["z2"]
    assert not bad["parse_ok"] and "corrupt" in bad["parse_status"]

    t = dispatched.loc["t1"]
    assert t["parsed_by"] == "parse-tika" and t["parse_ok"]
    assert [o["url"] for o in t["outlinks"]] == ["http://plain.example/y"]


def test_star_fallback_and_parser_not_found(spark, dispatched):
    # octet-stream is unmapped -> '*' chain (parse-tika) which declines
    b = dispatched.loc["b1"]
    assert b["parsed_by"] == "parse-tika" and not b["parse_ok"]

    # without a '*' entry the unmapped type is ParserNotFound
    pdf = pd.DataFrame(
        [("b1", "http://s.example/blob", "application/octet-stream", b"\x00")],
        columns=["url_hash", "url", "content_type", "bytes"],
    )
    out = parse_dispatch(
        spark.createDataFrame(pdf), plugins={"text/html": ["parse-html"]}
    ).toPandas()
    assert not out.iloc[0]["parse_ok"]
    assert "parser not found" in out.iloc[0]["parse_status"]
