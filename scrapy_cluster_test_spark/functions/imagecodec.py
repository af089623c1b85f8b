"""Image payload codecs for the fetch simulator and per-row invariants.

The graft input table carries opaque ``bytes`` image payloads
(BASELINE.json input_hint). No image library ships in this container
(no PIL/opencv), so:

* ``fmt='png'``  → a real, spec-conformant PNG encoder/decoder written on
  zlib (truecolor 8-bit, filter 0). Lossless → exact pixel roundtrip.
* ``fmt='jpeg'`` → **deterministic lossy stand-in** (documented): the 'QIMG'
  codec quantizes each channel to the nearest multiple of 4 and zlib-
  compresses. Max per-pixel error 2 → PSNR ≈ 46 dB ≥ the 40 dB invariant.
  The Spark-side plumbing (binary column, Arrow-batched decode UDF, PSNR
  verification) is identical to what a real JPEG codec would use; only the
  byte format differs. Swap ``encode_qimg``/``decode_qimg`` for
  PIL.Image.save/open(quality=95) on a cluster with codecs installed.

All functions operate on ``numpy.uint8`` arrays of shape (h, w, 3) and are
used inside Arrow-vectorized pandas UDFs (see sources/fetchsim.py) — never
row-at-a-time Python over a DataFrame.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """RGB8 (h, w, 3) → PNG bytes (color type 2, bit depth 8, filter 0)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise NotImplementedError("only truecolor 8-bit non-interlaced PNG")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, 1 + w * 3)
    if not (raw[:, 0] == 0).all():
        raise NotImplementedError("only filter type 0 supported")
    return raw[:, 1:].reshape(h, w, 3).copy()


_QIMG_MAGIC = b"QIMG"


def encode_qimg(img: np.ndarray) -> bytes:
    """Deterministic lossy stand-in for JPEG: quantize channels to the
    nearest multiple of 4, zlib-compress. PSNR vs source ≈ 46 dB."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    q = (((img.astype(np.uint16) + 2) >> 2) << 2).clip(0, 255).astype(np.uint8)
    return _QIMG_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_qimg(data: bytes) -> np.ndarray:
    assert data[:4] == _QIMG_MAGIC, "not a QIMG"
    w, h = struct.unpack(">II", data[4:12])
    return np.frombuffer(zlib.decompress(data[12:]), np.uint8).reshape(h, w, 3).copy()


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(img)
    if fmt == "jpeg":
        return encode_qimg(img)
    raise NotImplementedError(
        f"fmt={fmt!r}: real JPEG/WebP codecs are not available in this container; "
        "plug a PIL-backed encoder here on a full cluster image"
    )


def decode_image(data: bytes) -> np.ndarray:
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:4] == _QIMG_MAGIC:
        return decode_qimg(data)
    raise NotImplementedError("unknown image payload format")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# ---------------------------------------------------------------------------
# Perceptual hash (DCT-based pHash, public algorithm) — recomputable from
# decoded pixels; drives the synthetic link graph (FIXTURES.md §4).
# ---------------------------------------------------------------------------

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
        m[0, :] = np.sqrt(1.0 / n)
        _DCT32 = m
    return _DCT32


def phash64(img: np.ndarray) -> int:
    """64-bit DCT perceptual hash (signed, to fit Spark LongType).

    gray → average-pool to 32×32 → 2D DCT → top-left 8×8 (skipping DC) →
    sign bits vs median."""
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    assert h % 32 == 0 and w % 32 == 0, "datagen uses sizes divisible by 32"
    pooled = gray.reshape(32, h // 32, 32, w // 32).mean(axis=(1, 3))
    m = _dct_matrix(32)
    d = m @ pooled @ m.T
    block = d[:8, :8].flatten()[1:]  # drop DC term
    med = np.median(block)
    bits = 0
    for i, v in enumerate(block):
        if v > med:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= (1 << 63) else bits
