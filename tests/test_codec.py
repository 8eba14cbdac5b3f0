"""Codec invariants from BASELINE.json input_hint: lossless exactness,
lossy PSNR >= 40 dB, deterministic phash, duplicate-content pairs."""

import numpy as np

from warps_nutch_spark.functions import codec
from warps_nutch_spark import simweb


def test_lossless_roundtrip_exact():
    px = codec.synth_pixels(7, 33, 17)
    data = codec.encode_image(px, "png")
    out = codec.decode_image(data)
    assert np.array_equal(px, out)
    assert codec.psnr(px, out) == float("inf")
    assert codec.image_dims(data) == (33, 17, "png")


def test_lossy_psnr_at_least_40db():
    for seed in [1, 42, 99, 12345]:
        px = codec.synth_pixels(seed, 48, 48)
        out = codec.decode_image(codec.encode_image(px, "jpeg"))
        assert codec.psnr(px, out) >= 40.0


def test_phash_deterministic_and_discriminative():
    a = codec.phash(codec.synth_pixels(1, 32, 32))
    a2 = codec.phash(codec.synth_pixels(1, 32, 32))
    b = codec.phash(codec.synth_pixels(2, 32, 32))
    assert a == a2
    assert codec.hamming64(a, b) > 4  # different content -> far hashes
    # int64 range (Spark LongType safe)
    assert -(2**63) <= a < 2**63


def test_phash_robust_to_lossy_encode():
    px = codec.synth_pixels(5, 40, 40)
    lossy = codec.decode_image(codec.encode_image(px, "jpeg"))
    assert codec.hamming64(codec.phash(px), codec.phash(lossy)) <= 4


def test_simweb_duplicate_content_pairs():
    web = simweb.SimWeb(n_hosts=4, pages_per_host_base=64, seed=42)
    # find a dup-category odd page
    hi = np.array([0, 0])
    # category 'dup' is index 6 of 8 -> j % 8 == 6; pairs are (6, 14)
    j = np.array([6, 14])
    seeds = web.payload_seed(hi, j)
    assert seeds[0] == seeds[1]
    b0 = web.render_payload(0, 6)
    b1 = web.render_payload(0, 14)
    assert b0 == b1  # same payload bytes, different URL


def test_simweb_deterministic_across_instances():
    w1 = simweb.SimWeb(n_hosts=6, pages_per_host_base=100, seed=42)
    w2 = simweb.SimWeb(n_hosts=6, pages_per_host_base=100, seed=42)
    hi = np.arange(6)
    j = np.arange(6) * 3
    assert (w1.http_status(hi, j) == w2.http_status(hi, j)).all()
    assert w1.outlinks_of(hi, j) == w2.outlinks_of(hi, j)
    assert w1.render_payload(1, 2) == w2.render_payload(1, 2)


def test_simweb_zipf_skew():
    web = simweb.SimWeb(n_hosts=20, pages_per_host_base=1000, seed=42)
    total = web.host_sizes.sum()
    assert web.host_sizes[0] / total > 0.25  # hot host ~30% of mass
