"""ES-compatible bulk index sink: NDJSON construction, file shards,
and the live HTTP pusher against an in-process bulk endpoint."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest

from warps_nutch_spark.operators.indexer import (
    deletes_bulk_ndjson,
    push_bulk_http,
    to_bulk_ndjson,
    write_bulk_files,
)


def _docs_df(spark, n=20):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [f"sha-{i:03d}" for i in range(n)],
                "url": [f"http://h{i % 3}.test/doc/{i}" for i in range(n)],
                "content": [f"caption {i}" for i in range(n)],
                "boost": [float(i) for i in range(n)],
            }
        )
    )


class _BulkCollector(BaseHTTPRequestHandler):
    requests: list[tuple[str, bytes, str]] = []
    lock = threading.Lock()

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        with _BulkCollector.lock:
            _BulkCollector.requests.append(
                (self.path, body, self.headers.get("Content-Type", ""))
            )
        resp = json.dumps({"took": 1, "errors": False, "items": []}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def bulk_server():
    _BulkCollector.requests = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _BulkCollector)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _parse_bulk(body: bytes):
    """-> list of (action_dict, source_dict|None) entries."""
    lines = [json.loads(l) for l in body.decode().splitlines() if l]
    out, i = [], 0
    while i < len(lines):
        action = lines[i]
        kind = next(iter(action))
        if kind == "index":
            out.append((action, lines[i + 1]))
            i += 2
        else:
            out.append((action, None))
            i += 1
    return out


def test_bulk_ndjson_shape(spark):
    lines = to_bulk_ndjson(_docs_df(spark, 3), index_name="pages").collect()
    assert len(lines) == 3
    for row in lines:
        action, source = (json.loads(x) for x in row["line"].split("\n"))
        assert action["index"]["_index"] == "pages"
        assert action["index"]["_id"] == source["id"]
        assert source["url"].startswith("http://")


def test_bulk_file_shards_roundtrip(spark, tmp_path):
    docs = _docs_df(spark)
    write_bulk_files(to_bulk_ndjson(docs), str(tmp_path / "bulk"))
    back = spark.read.text(str(tmp_path / "bulk"))
    # every non-empty line parses; ids survive exactly once
    ids = []
    for row in back.collect():
        for line in row["value"].split("\n"):
            d = json.loads(line)
            if "index" in d and "_id" in d.get("index", {}):
                ids.append(d["index"]["_id"])
    assert sorted(ids) == sorted(f"sha-{i:03d}" for i in range(20))


def test_push_bulk_http_live(spark, bulk_server):
    docs = _docs_df(spark).repartition(4)
    push_bulk_http(
        to_bulk_ndjson(docs, index_name="pages"),
        bulk_server,
        max_bulk_docs=3,
    )
    got = _BulkCollector.requests
    assert got, "no bulk requests received"
    all_ids = []
    for path, body, ctype in got:
        assert path == "/_bulk"
        assert ctype == "application/x-ndjson"
        entries = _parse_bulk(body)
        # ElasticIndexWriter flush policy: never more than max_bulk_docs
        assert len(entries) <= 3
        for action, source in entries:
            assert action["index"]["_index"] == "pages"
            assert action["index"]["_id"] == source["id"]
            all_ids.append(source["id"])
    # exactly-once delivery of every doc
    assert sorted(all_ids) == sorted(f"sha-{i:03d}" for i in range(20))


def test_push_bulk_http_raises_on_item_errors(spark):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_error_handler())
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with pytest.raises(Exception):
            push_bulk_http(
                to_bulk_ndjson(_docs_df(spark, 4)),
                f"http://127.0.0.1:{srv.server_address[1]}",
            )
    finally:
        srv.shutdown()


def _make_error_handler():
    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers["Content-Length"]))
            resp = json.dumps({"errors": True, "items": [{"status": 400}]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):
            pass

    return H


def test_delete_actions(spark):
    keys = spark.createDataFrame(pd.DataFrame({"id": ["a", "b"]}))
    lines = deletes_bulk_ndjson(keys, index_name="pages").collect()
    acts = [json.loads(r["line"]) for r in lines]
    assert {a["delete"]["_id"] for a in acts} == {"a", "b"}


def test_solr_json_lines_and_push(spark, bulk_server):
    from warps_nutch_spark.operators.indexer import to_solr_json

    docs = _docs_df(spark, 7)
    lines = to_solr_json(docs)
    for row in lines.collect():
        d = json.loads(row["line"])
        assert d["id"].startswith("sha-") and "url" in d
    # same transport, Solr-shaped endpoint path
    push_bulk_http(lines, bulk_server, max_bulk_docs=4)
    got = [json.loads(l) for _, body, _ in _BulkCollector.requests
           for l in body.decode().splitlines() if l and "index" not in json.loads(l)]
    assert {d["id"] for d in got if "id" in d} >= {f"sha-{i:03d}" for i in range(7)}
