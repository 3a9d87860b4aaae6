"""Pure-Python XXH64 with Spark's `xxhash64()` chaining semantics.

Independent re-implementation of the public XXH64 algorithm (Yann Collet,
xxhash.com, BSD) as specialized by Spark's
`org.apache.spark.sql.catalyst.expressions.XxHash64` /
`org.apache.spark.unsafe.hash.XXH64`:

- strings hash their UTF-8 bytes via the byte-stream algorithm,
- longs hash via the fixed 8-byte fast path (`hashLong`),
- ints hash via the fixed 4-byte fast path (`hashInt`),
- a multi-argument call chains left-to-right: the running hash is the
  seed for the next argument; the initial seed is 42.

Used by tools/pin_golden.py's independent oracle path: every pinned query
whose engine-side plan uses `F.xxhash64` gets its values re-derived here,
outside Spark, so a bug in the engine's query composition cannot
self-certify. Pure Python — slow per call, but the pinned fixtures are
hundreds of rows.
"""

from __future__ import annotations

import struct

_M = (1 << 64) - 1  # wrap to uint64

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: the 8-byte fast path (unsigned result)."""
    value &= _M
    seed &= _M
    h = (seed + P5 + 8) & _M
    h ^= (_rotl((value * P2) & _M, 31) * P1) & _M
    h = (_rotl(h, 27) * P1 + P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt: the 4-byte fast path (unsigned result)."""
    value &= 0xFFFFFFFF
    seed &= _M
    h = (seed + P5 + 4) & _M
    h ^= (value * P1) & _M
    h = (_rotl(h, 23) * P2 + P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Spark XXH64.hashUnsafeBytes: byte-stream XXH64, little-endian
    word reads (unsigned result)."""
    seed &= _M
    length = len(data)
    off = 0
    if length >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed
        v4 = (seed - P1) & _M
        while off <= length - 32:
            w1, w2, w3, w4 = struct.unpack_from("<QQQQ", data, off)
            v1 = (_rotl((v1 + w1 * P2) & _M, 31) * P1) & _M
            v2 = (_rotl((v2 + w2 * P2) & _M, 31) * P1) & _M
            v3 = (_rotl((v3 + w3 * P2) & _M, 31) * P1) & _M
            v4 = (_rotl((v4 + w4 * P2) & _M, 31) * P1) & _M
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & _M, 31) * P1) & _M
            h = (h * P1 + P4) & _M
    else:
        h = (seed + P5) & _M
    h = (h + length) & _M
    while off <= length - 8:
        (w,) = struct.unpack_from("<Q", data, off)
        h ^= (_rotl((w * P2) & _M, 31) * P1) & _M
        h = (_rotl(h, 27) * P1 + P4) & _M
        off += 8
    if off <= length - 4:
        (w,) = struct.unpack_from("<I", data, off)
        h ^= (w * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        off += 4
    while off < length:
        h ^= (data[off] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        off += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*values, seed: int = 42) -> int:
    """Replicate `F.xxhash64(v1, v2, ...)`: chain left-to-right with the
    running hash as the next seed. Python str hashes as a UTF-8 string
    column, Python int as a LONG column UNLESS wrapped in Int32() (Spark
    `F.lit(42)` builds an IntegerType literal — 4-byte path). Returns the
    SIGNED 64-bit value Spark's LongType carries."""
    h = seed
    for v in values:
        if isinstance(v, Int32):
            h = hash_int(v.value, h)
        elif isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = hash_bytes(bytes(v), h)
        elif isinstance(v, int):
            h = hash_long(v, h)
        else:
            raise TypeError(f"unsupported xxhash64 operand: {type(v)}")
    return _to_signed(h)


class Int32:
    """Marker: hash this int through the IntegerType (4-byte) path, the
    way Spark treats `F.lit(<python int that fits 32 bits>)`."""

    __slots__ = ("value",)

    def __init__(self, value: int):
        self.value = value
