"""Deterministic image codec + perceptual hash for the image+caption
payload corpus (BASELINE.json input_hint shape).

The container has no PIL/imageio, so payload ``bytes`` use a tiny
self-describing format ("WNIM") implemented in pure numpy+zlib:

- mode 0 ("png"-class, lossless): zlib-compressed raw RGB8.
- mode 1 ("jpeg"-class, lossy): 5-bit uniform quantization per channel,
  zlib-compressed. Max per-pixel error 4 -> PSNR ~= 40.7 dB, which
  satisfies the input_hint invariant "decoded-pixel PSNR >= 40 dB for
  lossy" deterministically.

The perceptual hash is a DCT pHash (32x32 grayscale -> DCT-II -> top
8x8 AC block -> median threshold -> 64-bit int), fully vectorizable via
numpy. This stands in for the reference's page ``signature`` (MD5 of
content, ``crawl/MD5Signature.java:44-66``) on image payloads.

Everything here is batch-oriented: the public functions accept numpy
arrays / lists and are called from Arrow-batched pandas UDFs only.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"WNIM"
MODE_LOSSLESS = 0
MODE_LOSSY = 1

_HEADER = struct.Struct("<4sBBHHBB")  # magic, ver, mode, w, h, channels, pad


def encode_image(pixels: np.ndarray, fmt: str = "png", caption: str | None = None) -> bytes:
    """Encode an (h, w, 3) uint8 array. fmt 'png' -> lossless,
    'jpeg' -> lossy 5-bit quantization. An optional caption travels as
    a trailing metadata block (so parse genuinely extracts it from the
    fetched content, like the reference's text extraction)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expect (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    mode = MODE_LOSSLESS if fmt == "png" else MODE_LOSSY
    if mode == MODE_LOSSY:
        payload = (pixels >> 3).astype(np.uint8).tobytes()
    else:
        payload = pixels.tobytes()
    cap = (caption or "").encode("utf-8")
    return (
        _HEADER.pack(MAGIC, 1, mode, w, h, 3, 0)
        + zlib.compress(payload, 6)
        + struct.pack("<I", len(cap))
        + cap
    )


def _split(data: bytes) -> tuple[tuple, np.ndarray, bytes]:
    hdr = _HEADER.unpack_from(data)
    if hdr[0] != MAGIC or hdr[1] != 1:
        raise ValueError("not a WNIM payload")
    d = zlib.decompressobj()
    raw = np.frombuffer(d.decompress(data[_HEADER.size :]), dtype=np.uint8)
    return hdr, raw, d.unused_data


def decode_image(data: bytes) -> np.ndarray:
    """Decode WNIM bytes back to an (h, w, 3) uint8 array."""
    (_, _, mode, w, h, channels, _), raw, _ = _split(data)
    px = raw.reshape(h, w, channels)
    if mode == MODE_LOSSY:
        # dequantize to bin centers: q*8 + 4 (max error 4 -> PSNR >= 40 dB)
        px = np.minimum(px.astype(np.uint16) * 8 + 4, 255).astype(np.uint8)
    return px


def decode_caption(data: bytes) -> str | None:
    """Extract the trailing caption block (None if absent/empty)."""
    _, _, tail = _split(data)
    if len(tail) < 4:
        return None
    (n,) = struct.unpack_from("<I", tail)
    cap = tail[4 : 4 + n].decode("utf-8")
    return cap or None


def decode_full(data: bytes) -> tuple[np.ndarray, str | None, int, int, str]:
    """One-pass decode: (pixels, caption, w, h, fmt) with a single
    zlib decompression (the hot path for the parse stage)."""
    (_, _, mode, w, h, channels, _), raw, tail = _split(data)
    px = raw.reshape(h, w, channels)
    if mode == MODE_LOSSY:
        px = np.minimum(px.astype(np.uint16) * 8 + 4, 255).astype(np.uint8)
    cap = None
    if len(tail) >= 4:
        (n,) = struct.unpack_from("<I", tail)
        cap = tail[4 : 4 + n].decode("utf-8") or None
    return px, cap, w, h, ("png" if mode == MODE_LOSSLESS else "jpeg")


def image_dims(data: bytes) -> tuple[int, int, str]:
    """(w, h, fmt) from the header without decoding the payload."""
    magic, ver, mode, w, h, _, _ = _HEADER.unpack_from(data)
    if magic != MAGIC:
        raise ValueError("not a WNIM payload")
    return w, h, "png" if mode == MODE_LOSSLESS else "jpeg"


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# --------------------------------------------------------------------------
# perceptual hash (DCT pHash)
# --------------------------------------------------------------------------
_N = 32
_DCT_M = None


def _dct_matrix(n: int = _N) -> np.ndarray:
    global _DCT_M
    if _DCT_M is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
        m[0, :] = np.sqrt(1.0 / n)
        # float32: halves the matmul bandwidth; the hash thresholds on
        # the median so the precision loss never flips a bit in practice
        # (verified by the determinism tests)
        _DCT_M = m.astype(np.float32)
    return _DCT_M


def _to_gray32(pixels: np.ndarray) -> np.ndarray:
    h, w = pixels.shape[:2]
    # resample FIRST (32x32), then weight channels — ~4x less gray math
    yi = (np.arange(_N) * h) // _N
    xi = (np.arange(_N) * w) // _N
    small = pixels[np.ix_(yi, xi)].astype(np.float32)
    return 0.299 * small[..., 0] + 0.587 * small[..., 1] + 0.114 * small[..., 2]


def phash(pixels: np.ndarray) -> int:
    """64-bit perceptual hash of an (h, w, 3) uint8 image (signed int64
    so it round-trips a Spark LongType column)."""
    g = _to_gray32(pixels)
    m = _dct_matrix()
    d = m @ g @ m.T
    block = d[:8, :8].copy()
    flat = block.flatten()
    med = np.median(flat[1:])  # exclude DC term from the threshold
    bits = (flat > med).astype(np.uint64)
    bits[0] = 0  # DC bit pinned for stability
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(np.int64(val))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


# --------------------------------------------------------------------------
# deterministic synthetic image generation (seeded by an integer id)
# --------------------------------------------------------------------------
def synth_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic pseudo-image: smooth gradients + seeded noise so
    pHashes are non-degenerate and decode checks are meaningful."""
    rng = np.random.default_rng(seed & 0x7FFFFFFF)
    y = np.linspace(0, 1, h)[:, None]
    x = np.linspace(0, 1, w)[None, :]
    base = np.stack(
        [
            127 + 120 * np.sin(2 * np.pi * ((seed % 7 + 1) * x + y)),
            127 + 120 * np.cos(2 * np.pi * ((seed % 5 + 1) * y - x)),
            127 + 120 * np.sin(2 * np.pi * (x * y * (seed % 3 + 1) + 0.1)),
        ],
        axis=-1,
    )
    noise = rng.integers(-16, 17, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# WNVM: the video container twin of WNIM — a header + N length-prefixed
# WNIM frames. Real enough that frame sampling, per-frame decode, and
# per-frame pHash run genuinely in the sandbox; a production cluster
# swaps the codec for ffmpeg/pyav at the same call sites.
# --------------------------------------------------------------------------
VIDEO_MAGIC = b"WNVM"
_VHEADER = struct.Struct("<4sBHI")  # magic, ver, fps, n_frames


def encode_video(frames: list[np.ndarray], fps: int = 30, fmt: str = "png") -> bytes:
    if not frames:
        raise ValueError("empty video")
    out = [_VHEADER.pack(VIDEO_MAGIC, 1, fps, len(frames))]
    for px in frames:
        blob = encode_image(px, fmt)
        out.append(struct.pack("<I", len(blob)))
        out.append(blob)
    return b"".join(out)


def video_info(data: bytes) -> tuple[int, int]:
    """(fps, n_frames); raises ValueError on a non-WNVM blob."""
    if len(data) < _VHEADER.size or data[:4] != VIDEO_MAGIC:
        raise ValueError("not a WNVM video")
    _, _, fps, n = _VHEADER.unpack_from(data)
    return fps, n


def iter_video_frames(data: bytes):
    """Yield (frame_idx, wnim_blob) without decoding pixels — sampling
    can skip frames at container level (no wasted decode)."""
    fps, n = video_info(data)
    off = _VHEADER.size
    for i in range(n):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        yield i, data[off : off + ln]
        off += ln
