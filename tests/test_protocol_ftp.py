"""protocol-ftp fetcher vs a live in-process FTP server: FtpResponse
code mapping (200/304/300/404/401/500), truncation with true
Content-Length, directory listings, and crawl-the-tree parity with
protocol-file over the same tree."""

import os

import pandas as pd

from tests.ftp_test_server import MiniFtpServer
from warps_nutch_spark.operators.protocol_ftp import fetch_ftp_urls


def _mk_tree(tmp_path):
    root = os.path.realpath(str(tmp_path)) + "/site"
    os.makedirs(root + "/sub")
    with open(root + "/a.txt", "w") as f:
        f.write("alpha " * 10)
    with open(root + "/b.html", "w") as f:
        f.write("<html>beta</html>")
    with open(root + "/sub/c.json", "w") as f:
        f.write('{"k": 1}')
    return root


def _fetch(spark, urls, **kw):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    return fetch_ftp_urls(df, **kw).toPandas().set_index("url")


def test_ftp_response_codes_and_listing(spark, tmp_path):
    root = _mk_tree(tmp_path)
    with MiniFtpServer(root) as base:
        out = _fetch(
            spark,
            [
                f"{base}/a.txt",
                f"{base}/missing.txt",
                f"{base}/",
                f"{base}/sub",          # file-less path that CWDs -> 300
                f"{base}/sub/c.json",
            ],
        )
    a = out.loc[f"{base}/a.txt"]
    assert a["code"] == 200
    assert bytes(a["content"]).decode().startswith("alpha")
    assert a["content_type"] == "text/plain"
    assert a["content_length"] == os.path.getsize(root + "/a.txt")
    assert a["last_modified_ms"] is not None
    assert out.loc[f"{base}/missing.txt", "code"] == 404
    d = out.loc[f"{base}/"]
    assert d["code"] == 200 and d["content_type"] == "text/html"
    assert b"a.txt" in bytes(d["content"]) and b"sub/" in bytes(d["content"])
    # dir fetched as a file -> 300 redirect to path + "/"
    # (FtpResponse.java:394-401)
    s = out.loc[f"{base}/sub"]
    assert s["code"] == 300 and s["location"] == "/sub/"
    assert out.loc[f"{base}/sub/c.json", "code"] == 200


def test_ftp_truncation_keeps_true_length(spark, tmp_path):
    root = _mk_tree(tmp_path)
    with open(root + "/big.txt", "wb") as f:
        f.write(b"x" * 10_000)
    with MiniFtpServer(root) as base:
        out = _fetch(spark, [f"{base}/big.txt"], max_content_length=100)
    row = out.iloc[0]
    assert row["code"] == 200
    assert len(bytes(row["content"])) == 100
    assert row["content_length"] == 10_000  # TRUE size (FtpResponse:327)


def test_ftp_not_modified_304(spark, tmp_path):
    root = _mk_tree(tmp_path)
    future = int((os.path.getmtime(root + "/a.txt") + 3600) * 1000)
    with MiniFtpServer(root) as base:
        df = spark.createDataFrame(
            pd.DataFrame({"url": [f"{base}/a.txt"], "mod": [future]})
        )
        out = fetch_ftp_urls(df, modified_col="mod").toPandas()
    assert out.iloc[0]["code"] == 304


def test_ftp_auth_and_connect_failures(spark, tmp_path):
    root = _mk_tree(tmp_path)
    with MiniFtpServer(root, user="alice", password="secret") as base:
        out = _fetch(
            spark,
            [
                f"{base}/a.txt",                       # wrong default creds -> 401
                base.replace("ftp://", "ftp://alice:secret@") + "/a.txt",
            ],
        )
    assert out.iloc[0]["code"] == 401
    assert out.iloc[1]["code"] == 200
    # nothing listening -> 500 (FtpResponse.java:181)
    dead = _fetch(spark, ["ftp://127.0.0.1:1/none.txt"], timeout_s=2.0)
    assert dead.iloc[0]["code"] == 500


def test_ftp_crawls_same_tree_as_file_protocol(spark, tmp_path):
    """Protocol-agnostic pipeline: the FTP listing exposes the same
    child links as the file protocol's listing over one tree."""
    from warps_nutch_spark.operators.protocol_file import (
        fetch_file_urls,
        listing_outlinks,
    )

    root = _mk_tree(tmp_path)
    with MiniFtpServer(root) as base:
        ftp_listing = _fetch(spark, [f"{base}/"]).iloc[0]
    file_df = spark.createDataFrame(pd.DataFrame({"url": [f"file://{root}/"]}))
    file_listing = fetch_file_urls(file_df).toPandas().iloc[0]
    ftp_links = listing_outlinks(f"{base}/", bytes(ftp_listing["content"]))
    file_links = listing_outlinks(
        f"file://{root}/", bytes(file_listing["content"])
    )
    assert [l.rsplit("/", 1)[-1] or l.rsplit("/", 2)[-2] + "/" for l in ftp_links] == [
        l.rsplit("/", 1)[-1] or l.rsplit("/", 2)[-2] + "/" for l in file_links
    ]
