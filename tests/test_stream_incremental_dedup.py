"""Streaming ingest-admission dedup vs the batch operator.

Pins: (1) the row-local band computation equals minhash_band_table's
output exactly; (2) the stream-static collision join sees every
batch-side candidate; (3) the foreachBatch admission pipeline's
verdicts are bit-identical to running minhash_incremental_dedup on
the same rows, including across a checkpoint-recovered second file."""

import json
import os

import pandas as pd

from warps_nutch_spark.operators.dedup import (
    minhash_band_table,
    minhash_incremental_dedup,
)
from warps_nutch_spark.streaming.incremental_dedup import (
    documents_stream,
    duplicate_hits_stream,
    minhash_bands_row_local,
    run_stream_incremental_dedup,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
OTHER = "one two three four five six seven eight nine ten"


def _corpus(spark):
    return spark.createDataFrame(
        pd.DataFrame([(1, BASE), (2, OTHER)], columns=["doc_id", "text"])
    )


def test_row_local_bands_equal_grouped_bands(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {tuple(r) for r in minhash_bands_row_local(docs).collect()}
    b = {tuple(r) for r in minhash_band_table(docs).collect()}
    assert a == b and a


def _write_doc_file(d, name, rows):
    path = os.path.join(d, name)
    with open(path + ".tmp", "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    os.rename(path + ".tmp", path)  # atomic drop for the file source


def test_stream_admission_equals_batch(spark, workdir):
    corpus_bands_path = os.path.join(workdir, "corpus_bands")
    minhash_band_table(_corpus(spark)).write.parquet(corpus_bands_path)
    corpus_bands = spark.read.parquet(corpus_bands_path)

    drop = os.path.join(workdir, "incoming")
    os.makedirs(drop)
    batch1 = [(10, BASE), (11, "totally novel content nothing shared here")]
    batch2 = [(12, BASE), (13, "totally novel content nothing shared here"),
              (14, OTHER)]
    _write_doc_file(drop, "b1.json", batch1)

    out = os.path.join(workdir, "verdicts")
    ckpt = os.path.join(workdir, "ckpt")
    stream = documents_stream(spark, drop)
    q = run_stream_incremental_dedup(stream, corpus_bands, out, ckpt)
    q.awaitTermination(120)

    # second file lands; a NEW query with the same checkpoint resumes
    # and processes only the new file
    _write_doc_file(drop, "b2.json", batch2)
    q2 = run_stream_incremental_dedup(
        documents_stream(spark, drop), corpus_bands, out, ckpt
    )
    q2.awaitTermination(120)

    got = {
        r["doc_id"]: r["dup_of"]
        for r in spark.read.parquet(out).collect()
    }
    # batch twin, per micro-batch (the stream dedups WITHIN a file drop
    # too: doc 13 repeats doc 11's text but they arrived in different
    # batches, so 13 is only checked against the corpus + batch2)
    expect = {}
    for rows in (batch1, batch2):
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        v = minhash_incremental_dedup(
            minhash_bands_row_local(df), corpus_bands
        ).collect()
        expect.update({r["doc_id"]: r["dup_of"] for r in v})
    assert got == expect
    assert got[10] == 1 and got[12] == 1 and got[14] == 2
    assert 11 not in got and 13 not in got  # admitted (novel per batch)


def test_duplicate_hits_stream_collisions(spark, workdir):
    corpus_bands = minhash_band_table(_corpus(spark))
    drop = os.path.join(workdir, "incoming2")
    os.makedirs(drop)
    _write_doc_file(drop, "b.json", [(20, BASE), (21, "unrelated words only")])
    hits_path = os.path.join(workdir, "hits")
    q = (
        duplicate_hits_stream(documents_stream(spark, drop), corpus_bands)
        .writeStream.format("parquet")
        .option("path", hits_path)
        .option("checkpointLocation", os.path.join(workdir, "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    hits = spark.read.parquet(hits_path).collect()
    assert {(r["doc_id"], r["corpus_doc_id"]) for r in hits} == {(20, 1)}
