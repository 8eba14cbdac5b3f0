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


AUDIO_FEATURE_FIELDS = [
    T.StructField("au_channels", T.IntegerType()),
    T.StructField("au_sample_rate", T.IntegerType()),
    T.StructField("au_n_samples", T.LongType()),
    T.StructField("au_duration_sec", T.DoubleType()),
    T.StructField("au_rms", T.DoubleType()),
    T.StructField("au_peak", T.DoubleType()),
    T.StructField("au_zero_cross_rate", T.DoubleType()),
    T.StructField("au_ok", T.BooleanType()),
]


def decode_pcm(
    blob: bytes, default_rate: int = 16_000, allow_raw: bool = False
) -> tuple[np.ndarray, int, int]:
    """REAL audio decode without external libs: RIFF/WAVE PCM16 (the
    uncompressed interchange format — a ~40-byte header walk), plus raw
    s16le PCM ONLY when the caller asserts the corpus is headerless raw
    PCM via ``allow_raw=True`` — by default unknown magic is a decode
    FAILURE (ValueError), not silently interpreted as samples: arbitrary
    binary decoded as s16le yields plausible-looking garbage features.
    Returns (samples float32 in [-1, 1] shaped (n, ch), sample_rate,
    channels). Compressed formats (mp3/ogg/flac) need a codec library
    and raise NotImplementedError — the stub gate, same policy as
    external image formats."""
    if blob[:3] == b"ID3" or blob[:4] in (b"OggS", b"fLaC"):
        raise NotImplementedError(
            "compressed audio (mp3/ogg/flac) needs a codec library not "
            "present in the sandbox; decode via soundfile/pyav on a cluster"
        )
    rate, channels, data = default_rate, 1, blob
    if not (blob[:4] == b"RIFF" and blob[8:12] == b"WAVE") and not allow_raw:
        raise ValueError(
            "unknown audio container (not RIFF/WAVE PCM); pass "
            "allow_raw=True only for corpora known to be raw s16le"
        )
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        pos = 12
        fmt_ok = False
        data = b""
        while pos + 8 <= len(blob):
            cid = blob[pos : pos + 4]
            size = int.from_bytes(blob[pos + 4 : pos + 8], "little")
            body = blob[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                audio_fmt = int.from_bytes(body[0:2], "little")
                if audio_fmt != 1:  # only PCM is codec-free
                    raise NotImplementedError("non-PCM WAVE needs a codec library")
                channels = int.from_bytes(body[2:4], "little")
                rate = int.from_bytes(body[4:8], "little")
                bits = int.from_bytes(body[14:16], "little")
                if bits != 16:
                    raise NotImplementedError("only 16-bit PCM WAVE supported")
                fmt_ok = True
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if not fmt_ok:
            raise ValueError("WAVE without fmt chunk")
    arr = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(np.float32)
    arr = arr / 32768.0
    n = len(arr) // channels * channels
    return arr[:n].reshape(-1, channels), rate, channels


def audio_features(
    df: DataFrame,
    bytes_col: str = "bytes",
    default_rate: int = 16_000,
    partitions: int | None = None,
    allow_raw: bool = False,
) -> DataFrame:
    """Append audio feature columns (duration, RMS, peak, zero-crossing
    rate) — real vectorized numpy over PCM samples, Arrow-batched.

    Per-row failures (including NotImplementedError on a compressed
    blob) land as ``au_ok=False`` instead of aborting the whole Spark
    stage — one bad row in a 100 TB corpus must not kill the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            cols = {f.name: [None] * n for f in AUDIO_FEATURE_FIELDS}
            cols["au_ok"] = [False] * n
            for i, blob in enumerate(pdf[bytes_col]):
                if blob is None:
                    continue
                try:
                    samples, rate, ch = decode_pcm(bytes(blob), default_rate, allow_raw)
                except Exception:
                    continue
                mono = samples.mean(axis=1)
                cols["au_channels"][i] = ch
                cols["au_sample_rate"][i] = rate
                cols["au_n_samples"][i] = len(mono)
                cols["au_duration_sec"][i] = len(mono) / rate if rate else 0.0
                cols["au_rms"][i] = float(np.sqrt((mono**2).mean())) if len(mono) else 0.0
                cols["au_peak"][i] = float(np.abs(mono).max()) if len(mono) else 0.0
                cols["au_zero_cross_rate"][i] = (
                    float((np.diff(np.signbit(mono)) != 0).mean()) if len(mono) > 1 else 0.0
                )
                cols["au_ok"][i] = True
            out = pdf.copy()
            dtypes = {
                "au_channels": "Int32", "au_sample_rate": "Int32",
                "au_n_samples": "Int64", "au_duration_sec": "Float64",
                "au_rms": "Float64", "au_peak": "Float64",
                "au_zero_cross_rate": "Float64", "au_ok": "boolean",
            }
            for f in AUDIO_FEATURE_FIELDS:
                out[f.name] = pd.array(cols[f.name], dtype=dtypes[f.name])
            yield out

    src = df.repartition(partitions) if partitions else df
    schema = T.StructType(list(df.schema.fields) + AUDIO_FEATURE_FIELDS)
    return src.mapInPandas(run, schema=schema)


def chunk_audio(
    df: DataFrame,
    chunk_sec: float = 1.0,
    bytes_col: str = "bytes",
    default_rate: int = 16_000,
    allow_raw: bool = False,
) -> DataFrame:
    """One output row per fixed-length chunk (the audio analog of
    video frame sampling): (chunk_idx, chunk_bytes as raw s16le mono).
    Real chunking math; same mapInPandas explode shape the video
    sampler contracts.

    The source blob column is DROPPED from the output — keeping it
    would copy the whole original blob into every chunk row
    (n_chunks x blob bytes of pure amplification)."""
    kept = [f for f in df.schema.fields if f.name != bytes_col]
    out_schema = T.StructType(
        kept
        + [
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("chunk_bytes", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                blob = row[bytes_col]
                if blob is None:
                    continue
                try:
                    samples, rate, _ = decode_pcm(bytes(blob), default_rate, allow_raw)
                except Exception:
                    continue
                mono = (samples.mean(axis=1) * 32767.0).astype("<i2")
                step = max(1, int(chunk_sec * rate))
                base = {k: v for k, v in row.to_dict().items() if k != bytes_col}
                for ci in range(0, len(mono), step):
                    r = dict(base)
                    r["chunk_idx"] = ci // step
                    r["chunk_bytes"] = mono[ci : ci + step].tobytes()
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)


def frame_sample_video(df: DataFrame, every_n: int = 30, bytes_col: str = "bytes") -> DataFrame:
    """Video frame sampling over the WNVM container: one output row
    per sampled frame, carrying the frame's WNIM blob (feed it to
    image_features/phash downstream). Sampling skips frames at the
    container level — unsampled frames are never decoded. Non-WNVM
    blobs (real mp4 etc. — ffmpeg/pyav absent in this sandbox) yield
    no rows; on a cluster swap codec.iter_video_frames for an
    av.open() loop at this one call site."""

    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != bytes_col]
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                blob = row[bytes_col]
                if blob is None:
                    continue
                try:
                    codec.video_info(bytes(blob))  # generator below is lazy
                except ValueError:
                    continue
                frames = codec.iter_video_frames(bytes(blob))
                base = {k: v for k, v in row.to_dict().items() if k != bytes_col}
                for idx, fblob in frames:
                    if idx % every_n:
                        continue
                    r = dict(base)
                    r["frame_idx"] = idx
                    r["frame_bytes"] = fblob
                    rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)


ZIP_ENTRY_SCHEMA_FIELDS = [
    T.StructField("entry_name", T.StringType()),
    T.StructField("entry_size", T.LongType()),
    T.StructField("entry_bytes", T.BinaryType()),
    T.StructField("zip_ok", T.BooleanType()),
]


def zip_entries(
    df,
    bytes_col: str = "bytes",
    id_col: str = "url_hash",
    max_entry_bytes: int = 1 << 20,
    max_declared_entry_bytes: int = 1 << 28,
):
    """Explode zip archives into one row per member file
    (``plugin/parse-zip/.../ZipTextExtractor.java:73-110``: iterate
    entries, skip directories, dispatch each member's bytes to its own
    parser — here the member bytes come back as a BinaryType column
    for the regular parse dispatch). A corrupt archive yields a single
    ``zip_ok=false`` row instead of failing the stage.

    mapInPandas + stdlib zipfile: per-row Python is legitimate here
    (binary decode), and the blob never round-trips through more than
    its own batch.

    Zip-bomb hardening: crawled archives are untrusted, so members are
    stream-truncated at ``max_entry_bytes`` (never fully inflated into
    memory first), and entries whose DECLARED size exceeds
    ``max_declared_entry_bytes`` are skipped outright.
    """
    import io
    import zipfile

    import pandas as pd

    out_schema = T.StructType(
        [T.StructField(id_col, T.StringType())] + ZIP_ENTRY_SCHEMA_FIELDS
    )

    def _batches(it):
        for pdf in it:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    with zipfile.ZipFile(io.BytesIO(bytes(blob))) as zf:
                        for info in zf.infolist():
                            if info.is_dir():
                                continue
                            if info.file_size > max_declared_entry_bytes:
                                continue
                            # read only the cap from the decompressor —
                            # a bomb entry never materializes past it
                            with zf.open(info) as member:
                                data = member.read(max_entry_bytes)
                            rows.append(
                                {
                                    id_col: rid,
                                    "entry_name": info.filename,
                                    "entry_size": int(info.file_size),
                                    "entry_bytes": data,
                                    "zip_ok": True,
                                }
                            )
                except Exception:
                    rows.append(
                        {
                            id_col: rid,
                            "entry_name": None,
                            "entry_size": None,
                            "entry_bytes": None,
                            "zip_ok": False,
                        }
                    )
            out = pd.DataFrame(rows, columns=[id_col] + [f.name for f in ZIP_ENTRY_SCHEMA_FIELDS])
            out["entry_size"] = out["entry_size"].astype("Int64")
            yield out

    return df.select(id_col, bytes_col).mapInPandas(_batches, out_schema)
