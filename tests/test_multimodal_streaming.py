"""Multimodal binary-column operators + Structured Streaming ingest."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from warps_nutch_spark.config import make_test_config
from warps_nutch_spark.functions import codec
from warps_nutch_spark.operators import multimodal as mm
from warps_nutch_spark.store.frontier import ParquetFrontierStore


def _payload_df(spark, n=6):
    rows = []
    for i in range(n):
        px = codec.synth_pixels(i, 20 + i, 16 + i)
        fmt = "png" if i % 2 == 0 else "jpeg"
        rows.append(
            {
                "image_id": f"img-{i}",
                "bytes": codec.encode_image(px, fmt, caption=f"cap {i}"),
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows))


def test_image_features_real_decode(spark):
    df = _payload_df(spark)
    out = mm.image_features(df).toPandas().set_index("image_id")
    for i in range(6):
        row = out.loc[f"img-{i}"]
        assert row["mm_ok"]
        assert (row["mm_w"], row["mm_h"]) == (20 + i, 16 + i)
        px = codec.synth_pixels(i, 20 + i, 16 + i)
        if i % 2 == 0:  # lossless
            assert row["mm_mean_r"] == pytest.approx(px[..., 0].mean())
            assert row["mm_phash"] == codec.phash(px)


def test_image_features_external_format_stub_gate(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"image_id": ["x"], "bytes": [b"\x89PNG\r\n fake png bytes"]})
    )
    with pytest.raises(Exception, match="external image codec|NotImplementedError"):
        mm.image_features(df, allow_stub=False).collect()
    out = mm.image_features(df, allow_stub=True).toPandas()
    assert out.mm_ok.iloc[0] and out.mm_fmt.iloc[0] == "stub"


def test_resize_images(spark):
    df = _payload_df(spark, 3)
    out = mm.resize_images(df, 8, 8).toPandas()
    for _, row in out.iterrows():
        px, cap, w, h, fmt = codec.decode_full(bytes(row["resized_bytes"]))
        assert (w, h) == (8, 8) and px.shape == (8, 8, 3)
        assert cap == f"cap {row['image_id'].split('-')[1]}"


def test_frame_sample_video_skips_foreign_containers(spark):
    # a WNIM image is not a WNVM video: no rows, no stage failure
    df = _payload_df(spark, 1)
    out = mm.frame_sample_video(df)
    assert "frame_idx" in out.columns and "frame_bytes" in out.columns
    assert out.count() == 0


def test_streaming_ingest_dedup_and_merge(spark, workdir):
    from warps_nutch_spark.streaming import frontier_stream as fs

    cfg = make_test_config()
    store = ParquetFrontierStore(spark, f"{workdir}/frontier", host_buckets=4)
    drop = f"{workdir}/drop"
    os.makedirs(drop)
    ts = pd.Timestamp("2024-01-01")
    batch1 = pd.DataFrame(
        {
            "url": [
                "http://a.test/1",
                "HTTP://A.TEST:80/1",  # same after canonicalization
                "http://b.test/2#frag",
                "not a url",
            ],
            "discovered_at": [ts] * 4,
            "from_url": ["s"] * 4,
            "score_hint": [1.0, 1.0, 2.0, 0.0],
        }
    )
    spark.createDataFrame(batch1).write.mode("append").parquet(drop)
    fs.run_ingest(spark, drop, store, cfg, 1_700_000_000_000, f"{workdir}/ckpt")
    rows = {r["url"]: r for r in store.read().collect()}
    assert set(rows) == {"http://a.test/1", "http://b.test/2"}
    assert rows["http://b.test/2"]["score"] == 2.0
    assert rows["http://a.test/1"]["status"] == 1  # UNFETCHED

    # second drop: one known URL (deduped by anti-join), one new
    batch2 = pd.DataFrame(
        {
            "url": ["http://a.test/1", "http://c.test/3"],
            "discovered_at": [ts + pd.Timedelta(minutes=1)] * 2,
            "from_url": ["s"] * 2,
            "score_hint": [9.0, 3.0],
        }
    )
    spark.createDataFrame(batch2).write.mode("append").parquet(drop)
    fs.run_ingest(spark, drop, store, cfg, 1_700_000_000_000, f"{workdir}/ckpt")
    rows = {r["url"]: r for r in store.read().collect()}
    assert set(rows) == {"http://a.test/1", "http://b.test/2", "http://c.test/3"}
    assert rows["http://a.test/1"]["score"] == 1.0  # existing row untouched


def test_streaming_ingest_feeds_bloom(spark, workdir):
    """Every frontier-insertion path must feed the shared Bloom filter
    (its no-false-negative invariant is what lets batch updatedb trust
    maybe_seen=False): stream-ingested URLs must probe as maybe-seen."""
    import pandas as pd
    from pyspark.sql import functions as F

    from warps_nutch_spark.store.urlseen import BloomUrlSeen
    from warps_nutch_spark.streaming import frontier_stream as fs

    cfg = make_test_config()
    store = ParquetFrontierStore(spark, f"{workdir}/bl-frontier", host_buckets=4)
    seen = BloomUrlSeen(f"{workdir}/bl-urlseen", 4, 10_000, 0.01)
    drop = f"{workdir}/bl-drop"
    os.makedirs(drop)
    batch = pd.DataFrame(
        {
            "url": [f"http://h{i % 3}.test/s/{i}" for i in range(30)],
            "discovered_at": [pd.Timestamp("2024-01-01")] * 30,
            "from_url": ["s"] * 30,
            "score_hint": [0.0] * 30,
        }
    )
    spark.createDataFrame(batch).write.mode("append").parquet(drop)
    fs.run_ingest(
        spark, drop, store, cfg, 1_700_000_000_000, f"{workdir}/bl-ckpt",
        urlseen=seen,
    )
    probed = seen.maybe_seen(store.read().select("url_hash"), "url_hash")
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def _wav_bytes(freq_hz, rate=8000, sec=0.5, channels=1):
    """Hand-built RIFF/WAVE PCM16 (no audio libs needed)."""
    import struct

    import numpy as np

    t = np.arange(int(rate * sec)) / rate
    mono = (np.sin(2 * np.pi * freq_hz * t) * 16384).astype("<i2")
    data = np.repeat(mono, channels).tobytes() if channels > 1 else mono.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_audio_features_real_wav_decode(spark):
    import numpy as np

    from warps_nutch_spark.operators.multimodal import audio_features, decode_pcm

    blobs = [_wav_bytes(440), _wav_bytes(100, channels=2), None]
    df = spark.createDataFrame([(i, b) for i, b in enumerate(blobs)], "id int, bytes binary")
    rows = {r["id"]: r for r in audio_features(df).collect()}
    assert rows[0]["au_ok"] and rows[1]["au_ok"] and not rows[2]["au_ok"]
    assert rows[0]["au_sample_rate"] == 8000
    assert rows[1]["au_channels"] == 2
    assert abs(rows[0]["au_duration_sec"] - 0.5) < 1e-6
    # 440 Hz sine at 8 kHz: RMS = amp/sqrt(2) ~ 0.3536, zcr ~ 2f/rate
    assert abs(rows[0]["au_rms"] - 16384 / 32768 / np.sqrt(2)) < 0.01
    assert abs(rows[0]["au_zero_cross_rate"] - 2 * 440 / 8000) < 0.01
    # scalar decode agrees with the UDF path
    samples, rate, ch = decode_pcm(_wav_bytes(440))
    assert (rate, ch, len(samples)) == (8000, 1, 4000)


def test_audio_chunking_explodes_rows(spark):
    from warps_nutch_spark.operators.multimodal import chunk_audio

    df = spark.createDataFrame([(1, _wav_bytes(50, sec=2.2))], "id int, bytes binary")
    out = chunk_audio(df, chunk_sec=1.0).collect()
    assert [r["chunk_idx"] for r in sorted(out, key=lambda r: r["chunk_idx"])] == [0, 1, 2]
    # full chunks carry exactly 1s of s16le mono; the tail is shorter
    sizes = [len(bytes(r["chunk_bytes"])) for r in sorted(out, key=lambda r: r["chunk_idx"])]
    assert sizes[0] == sizes[1] == 8000 * 2
    assert 0 < sizes[2] < 8000 * 2


def test_audio_compressed_formats_stub_gate(spark):
    import pytest as pt

    from warps_nutch_spark.operators.multimodal import decode_pcm

    with pt.raises(NotImplementedError):
        decode_pcm(b"ID3\x04" + b"\x00" * 100)
    with pt.raises(NotImplementedError):
        decode_pcm(b"OggS" + b"\x00" * 100)


def test_audio_unknown_magic_is_failure_not_garbage(spark):
    """Arbitrary binary must NOT silently decode as raw s16le: default
    is decode failure (au_ok=False); allow_raw=True opts a known-raw
    corpus back in."""
    import numpy as np
    import pytest as pt

    from warps_nutch_spark.operators.multimodal import audio_features, decode_pcm

    junk = b"\x89PNG\r\n\x1a\n" + b"\xde\xad\xbe\xef" * 64
    with pt.raises(ValueError):
        decode_pcm(junk)
    raw = (np.sin(np.arange(1600) / 10) * 16384).astype("<i2").tobytes()
    samples, rate, ch = decode_pcm(raw, default_rate=16_000, allow_raw=True)
    assert (rate, ch, len(samples)) == (16_000, 1, 1600)

    df = spark.createDataFrame([(0, junk), (1, raw)], "id int, bytes binary")
    rows = {r["id"]: r for r in audio_features(df).collect()}
    assert not rows[0]["au_ok"] and not rows[1]["au_ok"]  # default: no raw
    rows = {r["id"]: r for r in audio_features(df, allow_raw=True).collect()}
    # allow_raw is the caller asserting the whole corpus is raw s16le
    assert rows[1]["au_ok"]


def test_audio_compressed_row_does_not_abort_stage(spark):
    """A single mp3/ogg blob in the batch lands as au_ok=False instead
    of raising NotImplementedError through mapInPandas and killing the
    whole Spark stage."""
    from warps_nutch_spark.operators.multimodal import audio_features

    blobs = [(0, _wav_bytes(440)), (1, b"ID3\x04" + b"\x00" * 100), (2, b"OggS" + b"\x00" * 50)]
    df = spark.createDataFrame(blobs, "id int, bytes binary")
    rows = {r["id"]: r for r in audio_features(df).collect()}
    assert rows[0]["au_ok"] and not rows[1]["au_ok"] and not rows[2]["au_ok"]


def test_audio_chunks_drop_source_blob(spark):
    """chunk_audio must not amplify the source blob into every chunk."""
    from warps_nutch_spark.operators.multimodal import chunk_audio

    df = spark.createDataFrame([(1, _wav_bytes(50, sec=2.2))], "id int, bytes binary")
    out = chunk_audio(df, chunk_sec=1.0)
    assert "bytes" not in out.columns and "chunk_bytes" in out.columns
    assert out.count() == 3


def _video_df(spark):
    vids = []
    for v in range(2):
        frames = []
        base = codec.synth_pixels(v * 7, 24, 20)
        for i in range(10):
            px = base.copy()
            px[:2, :2] = np.clip(px[:2, :2].astype(int) + i, 0, 255).astype(px.dtype)
            frames.append(px)
        vids.append({"video_id": f"v{v}", "bytes": codec.encode_video(frames, fps=10)})
    vids.append({"video_id": "junk", "bytes": b"not a video"})
    return spark.createDataFrame(pd.DataFrame(vids))


def test_frame_sample_video_real(spark):
    out = mm.frame_sample_video(_video_df(spark), every_n=3).toPandas()
    # junk blob yields no rows; each real video samples frames 0,3,6,9
    assert set(out["video_id"]) == {"v0", "v1"}
    assert sorted(out[out["video_id"] == "v0"]["frame_idx"]) == [0, 3, 6, 9]
    # sampled frame decodes to the original pixels (lossless fmt)
    row = out[(out["video_id"] == "v0") & (out["frame_idx"] == 0)].iloc[0]
    px = codec.decode_image(bytes(row["frame_bytes"]))
    assert px.shape == (20, 24, 3)
    base = codec.synth_pixels(0, 24, 20)
    assert (px == base).all()


def test_video_frame_phash_near_dup_pipeline(spark):
    """Sampled frames -> per-frame pHash -> banded Hamming pairs: the
    video near-dup path composes from existing image ops."""
    from warps_nutch_spark.operators.dedup import hamming_pairs_int64

    frames = mm.frame_sample_video(_video_df(spark), every_n=3)
    feats = mm.image_features(frames, bytes_col="frame_bytes")
    sigs = feats.filter(F.col("mm_ok")).select(
        F.concat_ws(":", "video_id", F.col("frame_idx").cast("string")).alias(
            "image_id"
        ),
        F.col("mm_phash").alias("phash"),
    )
    pairs = hamming_pairs_int64(
        sigs, sig_col="phash", id_col="image_id", n_bands=8, max_hamming=7
    ).toPandas()
    # same-video frames differ by a tiny brightness nudge -> near-dups;
    # at least the within-video pairs must surface
    same_video = [
        (a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])
        if a.split(":")[0] == b.split(":")[0]
    ]
    assert len(same_video) >= 4
