"""Streaming ingest-admission dedup: new documents arriving as a
stream are near-dup-checked against the persisted corpus LSH state.

This is the Structured-Streaming face of
:func:`..operators.dedup.minhash_incremental_dedup` — the rolling
100 TB pipeline shape where the corpus band table
(``minhash_band_table`` output, written once, bucketed by (band, key))
is STATIC and every micro-batch of crawled documents joins against it.
Composes the reference's signature-dedup contract
(``crawl/SignatureComparator.java`` semantics) with Spark's
stream-static join.

Two building blocks:

- :func:`minhash_bands_row_local` — the band keys computed entirely
  inside each row (shingle array -> ``array_min`` minhashes ->
  posexplode). ZERO shuffle, which is what makes it legal in a
  streaming plan (no stateful aggregation needed before the join).
  This is the array-domain minhash form: it loses to explode+groupBy
  in the batch SELF-join pipeline (see the A/B note in
  ``operators/dedup.py``) but is exactly right here — single consumer,
  no exchange to reuse, and streaming forbids the groupBy anyway.
- :func:`duplicate_hits_stream` — stateless stream-static INNER join:
  one row per (new doc band) x (corpus bucket) collision. Sinks that
  need doc-level admission aggregate per micro-batch via
  :func:`run_stream_incremental_dedup` (foreachBatch reusing the exact
  batch operator, so stream and batch verdicts are bit-identical —
  pinned by test).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def minhash_bands_row_local(
    docs: DataFrame,
    n_hashes: int = 4,
    n_bands: int = 2,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, key) band-bucket rows with the signatures computed
    row-locally (same values as ``minhash_band_table`` — the min over
    md5(shingle || ':i') is duplicate-insensitive, so skipping the
    distinct/groupBy changes nothing). Streaming-safe: no shuffle."""
    if n_hashes % n_bands != 0:
        raise ValueError(f"n_hashes={n_hashes} not divisible by n_bands={n_bands}")
    r = n_hashes // n_bands
    t = docs.select(F.col(id_col), F.split(text_col, " ").alias("t")).filter(
        F.size("t") >= shingle_n
    )
    sh_arr = F.expr(
        f"transform(sequence(1, size(t)-{shingle_n - 1}),"
        f" i -> array_join(slice(t, i, {shingle_n}), ' '))"
    )

    def _minhash(i: int):
        suffix = F.lit(f":{i}")
        # single-arg lambda: a 2-arg transform lambda would receive the
        # array index as its second argument
        return F.array_min(
            F.transform(sh_arr, lambda s: F.md5(F.concat(s, suffix)))
        ).alias(f"h{i}")

    mh = t.select(F.col(id_col), *[_minhash(i) for i in range(n_hashes)])
    return mh.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.concat(*[F.col(f"h{b * r + j}") for j in range(r)])
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "key"),
    )


def documents_stream(
    spark: SparkSession, drop_dir: str, schema: str = "doc_id long, text string"
) -> DataFrame:
    """File-source stream of new documents (one JSON doc per line)."""
    return spark.readStream.schema(schema).json(drop_dir)


def duplicate_hits_stream(
    stream_docs: DataFrame,
    corpus_bands: DataFrame,
    id_col: str = "doc_id",
    **band_kw,
) -> DataFrame:
    """Stateless collision stream: one row per LSH bucket the new doc
    shares with the corpus — (doc_id, band, key, corpus_doc_id). A
    stream-static inner join needs no watermark and no state store;
    with the corpus table bucketed by (band, key) the static side
    never reshuffles."""
    new_bands = minhash_bands_row_local(stream_docs, id_col=id_col, **band_kw)
    c = corpus_bands.select(
        F.col("band"), F.col("key"), F.col(id_col).alias("corpus_doc_id")
    )
    return new_bands.join(c, on=["band", "key"], how="inner")


def run_stream_incremental_dedup(
    stream_docs: DataFrame,
    corpus_bands: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    **band_kw,
):
    """Admission pipeline: every micro-batch runs the EXACT batch
    operator (``minhash_incremental_dedup``) against the static corpus
    bands and appends its (doc_id, dup_of) verdicts to ``out_dir`` —
    stream results are bit-identical to running the batch operator on
    the same rows. foreachBatch is the documented pattern for reusing
    batch-only plans (self-joins/aggregations) per micro-batch; the
    checkpoint makes a killed stream resume without re-emitting
    finished batches."""
    from ..operators.dedup import minhash_incremental_dedup

    os.makedirs(out_dir, exist_ok=True)

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        bands = minhash_bands_row_local(batch_df, id_col=id_col, **band_kw)
        verdicts = minhash_incremental_dedup(bands, corpus_bands, id_col=id_col)
        # batch-keyed OVERWRITE, never a blind append: foreachBatch can
        # replay a batch after a crash between the write and the
        # checkpoint commit; the replay rewrites its own partition dir
        # instead of duplicating rows (same invariant as the round
        # driver's payload writes). Readers see ingest_batch as a
        # partition column of out_dir.
        verdicts.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"ingest_batch={int(batch_id)}")
        )

    return (
        stream_docs.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
