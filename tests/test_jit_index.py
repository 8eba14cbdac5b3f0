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
