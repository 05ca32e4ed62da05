"""Pure-Python XXH64 — bit-identical to Spark SQL's ``xxhash64``.

Spark's ``xxhash64(col)`` is XXH64 with seed 42 over the value's byte
representation (UTF-8 bytes for strings, little-endian 8 bytes for longs).
The sequential reference-semantics oracle (tests/oracle) must assign the
same url_hash/host_hash values the engine computes JVM-side, and no xxhash
python package exists in the sandbox, so the public XXH64 algorithm is
implemented here (spec: github.com/Cyan4973/xxHash — public domain spec).
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data``; returns *signed* int64 (Spark LongType range)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            (a, b, c, d) = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = _round(v1, a), _round(v2, b), _round(v3, c), _round(v4, d)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M
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
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def xxh64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Matches Spark ``xxhash64(string_col)``."""
    return xxh64(s.encode("utf-8"), seed)


def xxh64_long(v: int, seed: int = SPARK_SEED) -> int:
    """Matches Spark ``xxhash64(long_col)`` (little-endian 8-byte repr)."""
    return xxh64(struct.pack("<q", v), seed)
