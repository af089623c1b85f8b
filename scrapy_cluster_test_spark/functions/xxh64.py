"""Pure-Python XXH64 (public xxHash algorithm, https://github.com/Cyan4973/xxHash
spec) matching Spark SQL's ``xxhash64`` function, which uses seed 42 and
hashes a string column's UTF-8 bytes.

Used only by the single-threaded oracle simulator and the datagen — the
Spark pipeline itself always uses the native ``F.xxhash64`` (JVM,
codegen'd). Parity is asserted in tests/test_urlkit.py.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Unsigned 64-bit xxHash of ``data``."""
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        i = 0
        limit = n - 32
        while i <= limit:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
        i = 0
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxh64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Signed 64-bit hash of a string's UTF-8 bytes — equals Spark's
    ``F.xxhash64(string_col)``."""
    return _signed(xxh64(s.encode("utf-8"), seed))


def xxh64_long(v: int, seed: int = SPARK_SEED) -> int:
    """Signed 64-bit hash of a LongType value — equals Spark's
    ``F.xxhash64(long_col)`` (hashes the 8-byte little-endian value)."""
    return _signed(xxh64((v & _M).to_bytes(8, "little"), seed))


def xxh64_long2(a: int, b: int, seed: int = SPARK_SEED) -> int:
    """Equals Spark's ``F.xxhash64(colA, colB)`` for two LongType columns:
    Spark chains per-column hashes, using the running hash as the seed for
    the next column."""
    h1 = xxh64((a & _M).to_bytes(8, "little"), seed)
    return _signed(xxh64((b & _M).to_bytes(8, "little"), h1))
