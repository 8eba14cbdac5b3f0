"""robots.txt raw parsing (functions/robots.py): RFC 9309 /
crawler-commons group selection, longest-match allow/disallow, and the
fetch-a-robots.txt -> parse -> gate integration."""

import pandas as pd

from warps_nutch_spark.functions.robots import (
    allowed,
    parse_robots_col,
    parse_robots_text,
)

SAMPLE = """
# comments are stripped   \t
User-agent: GoodBot
User-agent: wns-crawler
Disallow: /private
Allow: /private/open
Crawl-delay: 2.5

User-agent: *
Disallow: /
"""


def test_group_selection_specific_beats_star():
    r = parse_robots_text(SAMPLE, "wns")  # substring of wns-crawler
    assert r["disallow"] == ["/private"]
    assert r["allow"] == ["/private/open"]
    assert r["crawl_delay_ms"] == 2500
    # unknown agent falls back to the '*' group
    r2 = parse_robots_text(SAMPLE, "evilbot")
    assert r2["disallow"] == ["/"] and r2["crawl_delay_ms"] is None


def test_rfc9309_longest_match_allow_wins_ties():
    rules = {"disallow": ["/private"], "allow": ["/private/open"]}
    assert allowed("/public/x", rules)
    assert not allowed("/private/secret", rules)
    assert allowed("/private/open/doc", rules)  # longer Allow wins
    # equal length: Allow wins
    assert allowed("/a/b", {"disallow": ["/a/"], "allow": ["/a/"]})
    # empty rules allow everything
    assert allowed("/anything", {"disallow": [], "allow": []})


def test_parse_edge_cases():
    # rules before any group are ignored; empty Disallow allows all
    r = parse_robots_text(
        "Disallow: /orphan\nUser-agent: wns\nDisallow:\nCrawl-delay: nope\n",
        "wns",
    )
    assert r == {"disallow": [], "allow": [], "crawl_delay_ms": None}
    # multiple matching groups merge; first crawl-delay wins
    multi = (
        "User-agent: wns\nDisallow: /a\nCrawl-delay: 1\n\n"
        "User-agent: wns\nDisallow: /b\nCrawl-delay: 9\n"
    )
    r2 = parse_robots_text(multi, "wns")
    assert r2["disallow"] == ["/a", "/b"] and r2["crawl_delay_ms"] == 1000
    # case-insensitive fields and agents
    r3 = parse_robots_text("USER-AGENT: WNS\nDISALLOW: /x\n", "wns")
    assert r3["disallow"] == ["/x"]
    assert parse_robots_text(None, "wns") == {
        "disallow": [], "allow": [], "crawl_delay_ms": None,
    }


def test_fetched_robots_feed_the_gate(spark, tmp_path):
    """End-to-end: crawl a robots.txt with the file protocol, parse the
    raw bytes, and feed the structured rules into the engine's robots
    gate column — denied paths match the pure-Python decision."""
    import os

    from pyspark.sql import functions as F

    from warps_nutch_spark.operators.fetch import robots_denied_col
    from warps_nutch_spark.operators.protocol_file import fetch_file_urls

    root = os.path.realpath(str(tmp_path))
    with open(root + "/robots.txt", "w") as f:
        f.write(SAMPLE)
    fetched = fetch_file_urls(
        spark.createDataFrame(pd.DataFrame({"url": [f"file://{root}/robots.txt"]})),
        allowed_roots=[root],
    ).select(
        F.lit("h.test").alias("host"),
        F.col("content").cast("string").alias("robots_txt"),
    )
    rules = parse_robots_col(fetched, agent="wns", id_col="host")
    probes = spark.createDataFrame(
        pd.DataFrame({"host": ["h.test"] * 3,
                      "path": ["/private/secret", "/private/open/x", "/ok"]})
    )
    joined = probes.join(rules, on="host")
    got = (
        joined.select(
            "path", robots_denied_col(F.col("path"), F.col("disallow")).alias("denied")
        )
        .toPandas()
        .set_index("path")
    )
    # prefix gate (engine form, disallow-only) agrees with the pure
    # decision wherever no Allow overrides apply
    assert bool(got.loc["/private/secret", "denied"])
    assert not bool(got.loc["/ok", "denied"])
    # the Allow override is applied by the full RFC decision
    r = parse_robots_text(SAMPLE, "wns")
    assert allowed("/private/open/x", r) and not allowed("/private/secret", r)
