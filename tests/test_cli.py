"""bin/nutch-verb CLI (warps_nutch_spark/cli.py): inject, crawl,
readdb (stats/dump/url/host), index, parsechecker, indexchecker —
driven in-process against the shared Spark session."""

import json
import os

import pytest

from warps_nutch_spark.cli import main


@pytest.fixture()
def seeds_file(tmp_path):
    from warps_nutch_spark.simweb import SimWeb

    web = SimWeb(5, 60, 7)
    p = tmp_path / "seeds.txt"
    p.write_text("\n".join(web.seeds(2)) + "\n")
    return str(p)


WEB = "5,60,7"


def _crawl_args(wd, seeds):
    return [
        "--workdir", wd, "--seeds", seeds, "--web", WEB,
        "--top-n", "200", "--max-per-host", "50",
        "--round-time-limit-ms", "600000", "--host-buckets", "4",
    ]


def test_cli_crawl_readdb_index_roundtrip(spark, tmp_path, seeds_file, capsys):
    wd = str(tmp_path / "crawl")

    assert main(["crawl", *_crawl_args(wd, seeds_file), "--rounds", "2"], spark=spark) == 0
    rounds = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(rounds) == 2 and rounds[1]["fetched"] > 0

    # readdb --stats
    assert main(["readdb", "--workdir", wd, "--host-buckets", "4", "--stats"], spark=spark) == 0
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["rows"] > 0 and stats["by_status"]

    # readdb --dump
    assert main(["readdb", "--workdir", wd, "--host-buckets", "4", "--dump", "5"], spark=spark) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 5 and all("url" in json.loads(l) for l in lines)

    # readdb --url (existing vs missing rc)
    url = json.loads(lines[0])["url"]
    assert main(["readdb", "--workdir", wd, "--host-buckets", "4", "--url", url], spark=spark) == 0
    capsys.readouterr()
    assert main(["readdb", "--workdir", wd, "--host-buckets", "4", "--url", "http://nope.test/x"], spark=spark) == 1
    capsys.readouterr()

    # readdb --host (partition-pruned read)
    host = url.split("/")[2]
    assert main(["readdb", "--workdir", wd, "--host-buckets", "4", "--host", host], spark=spark) == 0
    hosted = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert hosted and all(host in h["url"] for h in hosted)

    # index -> parquet dir
    out = str(tmp_path / "idx")
    assert main(["index", "--workdir", wd, "--host-buckets", "4", "--out", out], spark=spark) == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert res["indexed_docs"] > 0
    assert spark.read.parquet(out).count() == res["indexed_docs"]


def test_cli_inject_only(spark, tmp_path, seeds_file, capsys):
    wd = str(tmp_path / "inj")
    n_seeds = len(open(seeds_file).read().split())
    assert main(["inject", *_crawl_args(wd, seeds_file)], spark=spark) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["injected_frontier_rows"] == n_seeds


def test_cli_checkers(spark, tmp_path, capsys):
    from warps_nutch_spark.simweb import SimWeb

    url = SimWeb(5, 60, 7).seeds(1)[0]
    wd = str(tmp_path / "chk")
    assert main(["parsechecker", "--url", url, "--web", WEB, "--workdir", wd], spark=spark) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["url"] == url and "proto_code" in out
    rc = main(["indexchecker", "--url", url, "--web", WEB, "--workdir", wd], spark=spark)
    outs = capsys.readouterr().out.strip()
    assert rc in (0, 1) and outs  # doc or explicit not-indexed verdict
    if rc == 0:
        assert "url" in json.loads(outs)
