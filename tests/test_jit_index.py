"""JIT indexing: per-round bulk docs == batch IndexJob over the final
frontier, for the fields stable across the two build points."""

import json
import os

from pyspark.sql import functions as F

from warps_nutch_spark.config import make_test_config
from warps_nutch_spark.operators.indexer import build_index_documents
from warps_nutch_spark.plans.round import RoundDriver
from warps_nutch_spark.simweb import SimWeb

START = 1_700_000_000_000
WEB = (5, 50, 11)


def _read_bulk_docs(spark, path):
    docs = []
    for fn in os.listdir(path):
        if not fn.startswith("part-"):
            continue
        with open(os.path.join(path, fn)) as f:
            lines = [l for l in f.read().splitlines() if l]
        assert len(lines) % 2 == 0, "bulk shard must pair action+source lines"
        for i in range(0, len(lines), 2):
            action, source = json.loads(lines[i]), json.loads(lines[i + 1])
            source["_id"] = action["index"]["_id"]
            source["_index"] = action["index"]["_index"]
            docs.append(source)
    return docs


def test_jit_docs_match_batch_index_job(spark, tmp_path):
    wd = str(tmp_path / "crawl")
    cfg = make_test_config(
        top_n=200,
        max_per_host=50,
        crawl_delay_ms=500,
        round_time_limit_ms=600_000,
        index_jit=True,
        index_min_text_length=0,
        index_name="pages",
    )
    web = SimWeb(*WEB)
    drv = RoundDriver(spark, wd, cfg, WEB, START)
    drv.inject(spark.createDataFrame([(u,) for u in web.seeds(3)], ["value"]))
    for r in range(2):
        drv.run_round(r)

    frontier = drv.store.read()
    jit_by_batch = {}
    for r in range(2):
        batch = f"batch-{r:04d}"
        path = os.path.join(wd, "index", batch)
        assert os.path.exists(path), f"missing JIT shard dir for {batch}"
        for d in _read_bulk_docs(spark, path):
            assert d["_index"] == "pages"
            jit_by_batch.setdefault(batch, {})[d["_id"]] = d

    total_jit = sum(len(v) for v in jit_by_batch.values())
    assert total_jit > 0

    # A page's LATEST fetch wins in the frontier (seeds re-fetch in
    # round 1), so the batch IndexJob for an old batch is rightly
    # empty for re-fetched pages. The JIT<->batch contract is:
    # every final-frontier FETCHED doc must equal the JIT doc written
    # in its own fetch round, and every JIT doc must be a page the
    # frontier knows.
    batch_docs = {
        (row["batch_id"], row["id"]): row.asDict()
        for row in build_index_documents(frontier).collect()
    }
    assert batch_docs, "no FETCHED docs in final frontier"
    for (batch, _id), bd in batch_docs.items():
        jd = jit_by_batch.get(batch, {}).get(_id)
        assert jd is not None, f"batch doc {_id} missing from JIT round {batch}"
        # stable fields agree (score/anchors/tstamp legitimately move
        # between fetch time and the post-updatedb frontier)
        assert jd["url"] == bd["url"]
        assert jd["content"] == bd["content"]
        assert jd["image_id"] == bd["image_id"]
        assert jd["phash"] == bd["phash"]
        assert jd["host"] == bd["host"]
    known_hashes = {
        row["url_hash"] for row in frontier.select("url_hash").collect()
    }
    for batch, docs in jit_by_batch.items():
        assert set(docs) <= known_hashes


def test_jit_min_text_length_filter(spark, tmp_path):
    wd = str(tmp_path / "crawl2")
    cfg = make_test_config(
        top_n=200,
        max_per_host=50,
        crawl_delay_ms=500,
        round_time_limit_ms=600_000,
        index_jit=True,
        index_min_text_length=10_000,  # filters everything (captions are short)
        index_name="pages",
    )
    web = SimWeb(*WEB)
    drv = RoundDriver(spark, wd, cfg, WEB, START)
    drv.inject(spark.createDataFrame([(u,) for u in web.seeds(3)], ["value"]))
    drv.run_round(0)
    path = os.path.join(wd, "index", "batch-0000")
    n = spark.read.text(path).count() if os.path.exists(path) else 0
    assert n == 0


def test_jit_live_push_to_bulk_endpoint(spark, tmp_path):
    """With index_endpoint set, every JIT round also POSTs its bulk
    entries to the live endpoint — the fetcher -> JITIndexer ->
    ElasticIndexWriter deployment shape, end to end."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    received = []
    lock = threading.Lock()

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            with lock:
                received.append((self.path, body))
            resp = _json.dumps({"errors": False}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        wd = str(tmp_path / "crawl")
        cfg = make_test_config(
            top_n=120,
            max_per_host=40,
            crawl_delay_ms=500,
            round_time_limit_ms=600_000,
            index_jit=True,
            index_min_text_length=0,
            index_name="live",
            index_endpoint=f"http://127.0.0.1:{srv.server_address[1]}",
        )
        web = SimWeb(*WEB)
        drv = RoundDriver(spark, wd, cfg, WEB, START)
        drv.inject(spark.createDataFrame([(u,) for u in web.seeds(2)], ["value"]))
        drv.run_round(0)
    finally:
        srv.shutdown()
    assert received, "no live bulk requests"
    pushed_ids = set()
    for path, body in received:
        assert path == "/_bulk"
        lines = [_json.loads(l) for l in body.decode().splitlines() if l]
        for i in range(0, len(lines), 2):
            assert lines[i]["index"]["_index"] == "live"
            pushed_ids.add(lines[i]["index"]["_id"])
    shard_ids = {
        d["_id"] for d in _read_bulk_docs(spark, os.path.join(wd, "index", "batch-0000"))
    }
    assert pushed_ids == shard_ids and pushed_ids
