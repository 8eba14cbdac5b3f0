"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow-batched pandas stages.

This is the scale path a 100 TB training-data pipeline needs: payload
bytes stay opaque to Catalyst (BinaryType), metadata (w/h/fmt/phash)
is columnar and prunable, and all byte-touching work happens in
``mapInPandas`` batches sized by
``spark.sql.execution.arrow.maxRecordsPerBatch``.

Real vs stubbed (the container has no PIL/imageio/ffmpeg):
- WNIM payloads (the synthetic corpus codec) decode/resize/feature
  FOR REAL via ``functions.codec`` — the Spark-side plumbing (schema,
  partitioning, UDF signature, batch shape) is fully exercised;
- external formats (real JPEG/PNG/audio/video) route to clearly
  marked stubs that raise NotImplementedError unless
  ``allow_stub=True``, in which case a deterministic fake is
  produced so pipelines can be integration-tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import codec

FEATURE_SCHEMA_FIELDS = [
    T.StructField("mm_w", T.IntegerType()),
    T.StructField("mm_h", T.IntegerType()),
    T.StructField("mm_fmt", T.StringType()),
    T.StructField("mm_mean_r", T.DoubleType()),
    T.StructField("mm_mean_g", T.DoubleType()),
    T.StructField("mm_mean_b", T.DoubleType()),
    T.StructField("mm_std", T.DoubleType()),
    T.StructField("mm_phash", T.LongType()),
    T.StructField("mm_ok", T.BooleanType()),
]


def _decode_any(blob: bytes, allow_stub: bool) -> np.ndarray:
    """Decode a payload: WNIM natively; external formats stubbed."""
    if blob[:4] == codec.MAGIC:
        return codec.decode_image(blob)
    # ---- STUB: external image codecs are not available in this
    # container (no PIL/imageio). On a real cluster, decode JPEG/PNG
    # here via PIL.Image.open(io.BytesIO(blob)).
    if not allow_stub:
        raise NotImplementedError(
            "external image codec (JPEG/PNG) not available in sandbox; "
            "pass allow_stub=True for a deterministic fake decode"
        )
    seed = int.from_bytes(blob[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    return codec.synth_pixels(seed, 32, 32)


def image_features(
    df: DataFrame, bytes_col: str = "bytes", allow_stub: bool = False, partitions: int | None = None
) -> DataFrame:
    """Append decoded-image feature columns (dims, channel means,
    std, pHash). One decode per row, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            cols = {f.name: [None] * n for f in FEATURE_SCHEMA_FIELDS}
            cols["mm_ok"] = [False] * n
            for i, blob in enumerate(pdf[bytes_col]):
                if blob is None:
                    continue
                try:
                    px = _decode_any(bytes(blob), allow_stub)
                except NotImplementedError:
                    raise
                except Exception:
                    continue
                h, w = px.shape[:2]
                cols["mm_w"][i] = w
                cols["mm_h"][i] = h
                cols["mm_fmt"][i] = (
                    codec.image_dims(bytes(blob))[2]
                    if bytes(blob)[:4] == codec.MAGIC
                    else "stub"
                )
                cols["mm_mean_r"][i] = float(px[..., 0].mean())
                cols["mm_mean_g"][i] = float(px[..., 1].mean())
                cols["mm_mean_b"][i] = float(px[..., 2].mean())
                cols["mm_std"][i] = float(px.std())
                cols["mm_phash"][i] = codec.phash(px)
                cols["mm_ok"][i] = True
            out = pdf.copy()
            for f in FEATURE_SCHEMA_FIELDS:
                dtype = {
                    "mm_w": "Int32", "mm_h": "Int32", "mm_fmt": "string",
                    "mm_mean_r": "Float64", "mm_mean_g": "Float64",
                    "mm_mean_b": "Float64", "mm_std": "Float64",
                    "mm_phash": "Int64", "mm_ok": "boolean",
                }[f.name]
                out[f.name] = pd.array(cols[f.name], dtype=dtype)
            yield out

    src = df
    if partitions:
        src = src.repartition(partitions)
    schema = T.StructType(list(df.schema.fields) + FEATURE_SCHEMA_FIELDS)
    return src.mapInPandas(run, schema=schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    bytes_col: str = "bytes",
    out_col: str = "resized_bytes",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic nearest-index resample of WNIM payloads,
    re-encoded losslessly (captions preserved)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf[bytes_col]:
                if blob is None:
                    out.append(None)
                    continue
                try:
                    px, cap, w, h, fmt = codec.decode_full(bytes(blob))
                except Exception:
                    out.append(None)
                    continue
                yi = (np.arange(target_h) * h) // target_h
                xi = (np.arange(target_w) * w) // target_w
                rs = px[np.ix_(yi, xi)]
                out.append(codec.encode_image(rs, "png", caption=cap))
            yield pdf.assign(**{out_col: out})

    src = df.repartition(partitions) if partitions else df
    schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, T.BinaryType())])
    return src.mapInPandas(run, schema=schema)


def frame_sample_video(df: DataFrame, every_n: int = 30, bytes_col: str = "bytes") -> DataFrame:
    """STUB — video frame sampling.

    The Spark-side contract is real: input (id, bytes, meta...) ->
    output one row per sampled frame with (frame_idx, frame_bytes).
    Decoding requires ffmpeg/pyav, absent in this container; on a real
    cluster replace ``_sample`` with an av.open(BytesIO(blob)) loop.
    """

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video decoding unavailable in sandbox (no ffmpeg/pyav); "
            "plumbing contract: one output row per sampled frame"
        )

    return df.mapInPandas(run, schema=out_schema)
