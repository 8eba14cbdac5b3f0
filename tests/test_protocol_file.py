"""protocol-file fetcher: FileResponse semantics + crawl-the-tree E2E."""

import os

import pandas as pd

from warps_nutch_spark.operators.protocol_file import (
    fetch_file_urls,
    listing_outlinks,
)


def _mk_tree(tmp_path):
    root = os.path.realpath(str(tmp_path)) + "/site"
    os.makedirs(root + "/sub")
    with open(root + "/a.txt", "w") as f:
        f.write("alpha " * 10)
    with open(root + "/b.html", "w") as f:
        f.write("<html>beta</html>")
    with open(root + "/sub/c.json", "w") as f:
        f.write('{"k": 1}')
    os.symlink(root + "/a.txt", root + "/link.txt")
    return root


def _fetch(spark, urls, **kw):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    out = fetch_file_urls(df, **kw).toPandas().set_index("url")
    return out


def test_file_response_codes(spark, tmp_path):
    root = _mk_tree(tmp_path)
    out = _fetch(
        spark,
        [
            f"file://{root}/a.txt",
            f"file://{root}/missing.txt",
            f"file://{root}/link.txt",
            f"file://{root}/",
            f"http://{root}/a.txt",
        ],
    )
    a = out.loc[f"file://{root}/a.txt"]
    assert a["code"] == 200
    assert bytes(a["content"]).decode().startswith("alpha")
    assert a["content_type"] == "text/plain"
    assert a["content_length"] == os.path.getsize(root + "/a.txt")
    assert out.loc[f"file://{root}/missing.txt", "code"] == 404
    # symlink -> 300 redirect to canonical target (FileResponse:141-148)
    link = out.loc[f"file://{root}/link.txt"]
    assert link["code"] == 300
    assert link["location"] == f"file://{root}/a.txt"
    # directory -> synthetic listing
    d = out.loc[f"file://{root}/"]
    assert d["code"] == 200 and d["content_type"] == "text/html"
    assert b"a.txt" in bytes(d["content"]) and b"sub/" in bytes(d["content"])
    # wrong scheme
    assert out.loc[f"http://{root}/a.txt", "code"] == 400


def test_not_modified_304(spark, tmp_path):
    root = _mk_tree(tmp_path)
    url = f"file://{root}/a.txt"
    mtime_ms = int(os.stat(root + "/a.txt").st_mtime * 1000)
    df = spark.createDataFrame(
        pd.DataFrame({"url": [url, url], "modified_time": [mtime_ms, mtime_ms - 10_000]})
    )
    out = fetch_file_urls(df, modified_col="modified_time").toPandas()
    codes = sorted(out["code"].tolist())
    assert codes == [200, 304]


def test_truncation_keeps_true_length(spark, tmp_path):
    root = _mk_tree(tmp_path)
    out = _fetch(spark, [f"file://{root}/a.txt"], max_content_length=8)
    row = out.iloc[0]
    assert len(bytes(row["content"])) == 8
    assert row["content_length"] == os.path.getsize(root + "/a.txt")


def test_crawl_file_tree_discovers_all(spark, tmp_path):
    """BFS over listings: every regular file is reached through the
    synthetic directory pages, like the reference crawling file: seeds."""
    root = _mk_tree(tmp_path)
    seen, frontier, fetched_files = set(), [f"file://{root}/"], set()
    for _ in range(5):
        frontier = [u for u in frontier if u not in seen]
        if not frontier:
            break
        seen.update(frontier)
        out = _fetch(spark, frontier)
        nxt = []
        for url, row in out.iterrows():
            if row["code"] == 300 and row["location"]:
                nxt.append(row["location"])
            elif row["code"] == 200 and row["content_type"] == "text/html" and url.endswith("/"):
                nxt.extend(listing_outlinks(url, bytes(row["content"])))
            elif row["code"] == 200:
                fetched_files.add(url)
        frontier = nxt
    assert fetched_files == {
        f"file://{root}/a.txt",
        f"file://{root}/b.html",
        f"file://{root}/sub/c.json",
    }


def test_allowed_roots_confinement(spark, tmp_path):
    """Untrusted outlinks must not read outside the configured roots:
    paths outside get 403 (checked on the symlink-resolved path, so an
    inside symlink pointing outside is also refused, not redirected)."""
    root = _mk_tree(tmp_path)
    outside = os.path.realpath(str(tmp_path)) + "/secret.txt"
    with open(outside, "w") as f:
        f.write("credential material")
    os.symlink(outside, root + "/sneaky.txt")
    out = _fetch(
        spark,
        [
            f"file://{root}/a.txt",
            f"file://{outside}",
            f"file://{root}/sneaky.txt",
            f"file://{root}/../secret.txt",
        ],
        allowed_roots=[root],
    )
    assert out.loc[f"file://{root}/a.txt", "code"] == 200
    assert out.loc[f"file://{outside}", "code"] == 403
    assert out.loc[f"file://{root}/sneaky.txt", "code"] == 403
    assert out.loc[f"file://{root}/../secret.txt", "code"] == 403
