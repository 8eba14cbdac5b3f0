"""parse-html DOM walk (operators/parse_html.py): linkParams outlink
harvest, base-href override, script/style text skipping, robots meta,
anchor text, and malformed-markup tolerance — DOMContentUtils.java +
HTMLMetaProcessor.java semantics."""

import pandas as pd

from warps_nutch_spark.operators.parse_html import html_parse


def _parse_one(spark, html, url="http://h.test/dir/page.html"):
    df = spark.createDataFrame(
        pd.DataFrame({"url_hash": ["x"], "html": [html], "url": [url]})
    )
    return html_parse(df).toPandas().iloc[0]


def test_linkparams_tags_and_anchor_text(spark):
    html = """
    <html><head><title>The  Title</title>
      <link href="/style.css" rel="stylesheet"></head>
    <body>Intro text.
      <a href="sub/next.html">read <b>more</b> here</a>
      <area href="/map/1">
      <form action="/submit">
      <frame src="/f1"><iframe src="/f2"></iframe>
      <script src="/app.js">var skipped = "INVISIBLE";</script>
      <style>.also-skipped {}</style>
      <img src="pic.png">
    </body></html>"""
    row = _parse_one(spark, html)
    assert row["title"] == "The Title"
    # script/style content never reaches the text (getTextHelper:143-146)
    assert "INVISIBLE" not in row["text"] and "also-skipped" not in row["text"]
    assert row["text"].startswith("Intro text.")
    links = {o["url"]: o["anchor"] for o in row["outlinks"]}
    # relative resolves against the page directory; root-relative
    # against the origin (URLUtil.resolveURL)
    assert links["http://h.test/dir/sub/next.html"] == "read more here"
    assert links["http://h.test/map/1"] == ""
    assert links["http://h.test/submit"] == ""
    assert links["http://h.test/f1"] == "" and links["http://h.test/f2"] == ""
    assert links["http://h.test/app.js"] == ""
    assert links["http://h.test/style.css"] == ""
    assert links["http://h.test/dir/pic.png"] == ""
    assert not row["noindex"] and not row["nofollow"]


def test_base_href_overrides_resolution(spark):
    html = '<base href="http://other.test/b/"><a href="x.html">x</a>'
    row = _parse_one(spark, html)
    assert row["base_url"] == "http://other.test/b/"
    assert row["outlinks"][0]["url"] == "http://other.test/b/x.html"


def test_robots_meta_directives(spark):
    for content, ni, nf in [
        ("noindex", True, False),
        ("nofollow", False, True),
        ("noindex, nofollow", True, True),
        ("none", True, True),
        ("all", False, False),
    ]:
        row = _parse_one(
            spark, f'<meta name="robots" content="{content}"><p>t</p>'
        )
        assert (row["noindex"], row["nofollow"]) == (ni, nf), content


def test_malformed_markup_never_fails_the_stage(spark):
    rows = pd.DataFrame(
        {
            "url_hash": ["a", "b", "c"],
            "html": [
                "<a href='/ok'>unclosed <b>tags<p>everywhere",
                "<<<>>>&&& not html at all \x01",
                None,
            ],
            "url": ["http://h.test/"] * 3,
        }
    )
    out = html_parse(spark.createDataFrame(rows)).toPandas().set_index("url_hash")
    assert len(out) == 3
    # note: html.parser only captures double-quoted/unquoted attrs the
    # same way; single quotes are fine too
    assert out.loc["a", "outlinks"][0]["url"] == "http://h.test/ok"
    assert out.loc["c", "text"] == ""
