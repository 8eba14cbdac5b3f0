"""protocol-http fetcher vs a live in-process HTTP server: HttpBase
code->ProtocolStatus mapping (200/300/301/302/304/400/401/404/410),
gzip inflation, stream truncation with true Content-Length, redirect
Location resolution, If-Modified-Since, transport-error
classification (unknown host / connection refused), and
crawl-the-tree parity with protocol-file over the same directory."""

import gzip
import http.server
import os
import threading

import pandas as pd

from warps_nutch_spark.functions.status import ProtocolStatus
from warps_nutch_spark.operators.protocol_http import fetch_http_urls

BIG = (b"0123456789" * 20_000)  # 200 KB, over the 64 KB default cap


class _Handler(http.server.BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):  # quiet
        pass

    def _send(self, code, body=b"", ctype="text/html", extra=()):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in extra:
            self.send_header(k, v)
        self.end_headers()
        if body:
            self.wfile.write(body)

    def do_GET(self):
        p = self.path
        if p == "/ok":
            self._send(
                200,
                b"<html>ok</html>",
                extra=[("Last-Modified", "Wed, 01 Jan 2020 00:00:00 GMT")],
            )
        elif p == "/gz":
            body = gzip.compress(b"inflated " * 100)
            self._send(200, body, extra=[("Content-Encoding", "gzip")])
        elif p == "/big":
            self._send(200, BIG, ctype="text/plain")
        elif p == "/moved":
            self._send(301, extra=[("Location", "/ok")])
        elif p == "/temp":
            self._send(302, extra=[("Location", "relative/target")])
        elif p == "/choices":
            self._send(300, extra=[("Location", "/ok")])
        elif p == "/maybe-modified":
            if self.headers.get("If-Modified-Since"):
                self._send(304)
            else:
                self._send(200, b"fresh")
        elif p == "/auth":
            self._send(401, extra=[("WWW-Authenticate", 'Basic realm="x"')])
        elif p == "/gone":
            self._send(410)
        elif p == "/bad":
            self._send(400)
        elif p == "/boom":
            self._send(500)
        else:
            self._send(404)


class _MiniHttpServer:
    def __enter__(self):
        self.srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self.thread = threading.Thread(target=self.srv.serve_forever, daemon=True)
        self.thread.start()
        return f"http://127.0.0.1:{self.srv.server_address[1]}"

    def __exit__(self, *a):
        self.srv.shutdown()
        self.srv.server_close()


def _fetch(spark, urls, **kw):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    return fetch_http_urls(df, **kw).toPandas().set_index("url")


def test_http_code_mapping_and_content(spark):
    with _MiniHttpServer() as base:
        out = _fetch(
            spark,
            [
                f"{base}/ok",
                f"{base}/moved",
                f"{base}/temp",
                f"{base}/choices",
                f"{base}/auth",
                f"{base}/gone",
                f"{base}/bad",
                f"{base}/missing",
                f"{base}/boom",
            ],
        )
    ok = out.loc[f"{base}/ok"]
    assert ok["code"] == 200
    assert bytes(ok["content"]) == b"<html>ok</html>"
    assert ok["protocol_status"] == ProtocolStatus.SUCCESS
    assert ok["last_modified_ms"] == 1577836800000
    # redirects: Location resolved against the request URL
    mv = out.loc[f"{base}/moved"]
    assert mv["code"] == 301 and mv["protocol_status"] == ProtocolStatus.MOVED
    assert mv["location"] == f"{base}/ok"
    tm = out.loc[f"{base}/temp"]
    assert tm["protocol_status"] == ProtocolStatus.TEMP_MOVED
    assert tm["location"] == f"{base}/relative/target"
    assert (
        out.loc[f"{base}/choices", "protocol_status"] == ProtocolStatus.MOVED
    )
    assert (
        out.loc[f"{base}/auth", "protocol_status"] == ProtocolStatus.ACCESS_DENIED
    )
    assert out.loc[f"{base}/gone", "protocol_status"] == ProtocolStatus.GONE
    assert out.loc[f"{base}/bad", "protocol_status"] == ProtocolStatus.GONE
    assert (
        out.loc[f"{base}/missing", "protocol_status"] == ProtocolStatus.NOTFOUND
    )
    assert (
        out.loc[f"{base}/boom", "protocol_status"] == ProtocolStatus.EXCEPTION
    )


def test_http_gzip_truncation_modified(spark):
    with _MiniHttpServer() as base:
        out = _fetch(
            spark,
            [f"{base}/gz", f"{base}/big", f"{base}/maybe-modified"],
            max_content_length=1024,
        )
        # If-Modified-Since sent when a modified time exists -> 304
        _SPARK["s"] = spark
        df = pd.DataFrame(
            {"url": [f"{base}/maybe-modified"], "modified_ms": [1600000000000]}
        )
        notmod = (
            fetch_http_urls(_spark_df(df), modified_col="modified_ms")
            .toPandas()
            .iloc[0]
        )
    gz = out.loc[f"{base}/gz"]
    # inflated despite the 1 KB cap on the wire body; cap applies to
    # the INFLATED text too (processGzipEncoded)
    assert bytes(gz["content"]).startswith(b"inflated ")
    assert len(bytes(gz["content"])) <= 1024
    big = out.loc[f"{base}/big"]
    assert len(bytes(big["content"])) == 1024  # stream-truncated
    assert big["content_length"] == len(BIG)  # TRUE size from the header
    assert big["code"] == 200
    assert notmod["code"] == 304
    assert notmod["protocol_status"] == ProtocolStatus.NOTMODIFIED
    # no If-Modified-Since -> 200
    assert out.loc[f"{base}/maybe-modified", "code"] == 200


_SPARK = {}


def _spark_df(pdf):
    return _SPARK["s"].createDataFrame(pdf)


def test_http_transport_errors(spark):
    _SPARK["s"] = spark
    out = _fetch(
        spark,
        [
            "http://no-such-host-wns-test.invalid/x",
            "http://127.0.0.1:1/refused",
            "gopher://example.com/x",
        ],
        timeout_s=2.0,
        max_retry=2,
    )
    assert (
        out.loc["http://no-such-host-wns-test.invalid/x", "protocol_status"]
        == ProtocolStatus.UNKNOWN_HOST
    )
    assert (
        out.loc["http://127.0.0.1:1/refused", "protocol_status"]
        == ProtocolStatus.TIMEOUT
    )
    assert (
        out.loc["gopher://example.com/x", "protocol_status"]
        == ProtocolStatus.EXCEPTION
    )


def test_http_crawl_tree_parity_with_file(spark, tmp_path):
    """Serve a directory over HTTP (stdlib dir listings) and crawl it
    breadth-first via the generic listing outlink extractor; the set
    of fetched files must equal protocol-file's crawl of the same
    tree."""
    from functools import partial

    from warps_nutch_spark.operators.protocol_file import (
        fetch_file_urls,
        listing_outlinks,
    )

    _SPARK["s"] = spark
    root = os.path.realpath(str(tmp_path)) + "/site"
    os.makedirs(root + "/sub")
    for rel, data in [
        ("a.txt", "alpha"),
        ("b.html", "<html>beta</html>"),
        ("sub/c.json", '{"k": 1}'),
    ]:
        with open(os.path.join(root, rel), "w") as f:
            f.write(data)

    handler = partial(http.server.SimpleHTTPRequestHandler, directory=root)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        def crawl(seed, fetch):
            seen, files, frontier = set(), {}, [seed]
            while frontier:
                batch = [u for u in frontier if u not in seen]
                seen.update(batch)
                frontier = []
                if not batch:
                    break
                out = fetch(batch)
                for url, row in out.iterrows():
                    if row["code"] != 200:
                        continue
                    if (row["content_type"] or "").startswith("text/html") and (
                        url.endswith("/")
                    ):
                        frontier.extend(
                            listing_outlinks(url, bytes(row["content"]))
                        )
                    else:
                        files[url.replace(seed, "")] = bytes(row["content"])
            return files

        http_files = crawl(base + "/", lambda us: _fetch(spark, us))
        file_files = crawl(
            f"file://{root}/",
            lambda us: fetch_file_urls(_spark_df(pd.DataFrame({"url": us})))
            .toPandas()
            .set_index("url"),
        )
        assert set(http_files) == set(file_files) == {
            "a.txt",
            "b.html",
            "sub/c.json",
        }
        for k in http_files:
            assert http_files[k] == file_files[k]
    finally:
        srv.shutdown()
        srv.server_close()
