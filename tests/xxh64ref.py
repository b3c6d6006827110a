"""Pure-Python reference of Spark SQL's xxhash64 expression.

xxHash64 is a public-domain algorithm (Yann Collet,
github.com/Cyan4973/xxHash); Spark's expression applies it per-argument
with hash chaining — the running hash is the seed for the next argument
(org.apache.spark.sql.catalyst.expressions.XXH64, seed 42):

  int32  → hashInt(v)     (4-byte block finalizer)
  int64  → hashLong(v)    (8-byte block finalizer)
  string → XXH64 over the UTF-8 bytes

Used by tests only: it lets pytest pin the exact values of the
minhash/simhash queries that have no DuckDB oracle (DuckDB has no
Spark-compatible xxhash64), per VERDICT round-2 item 4.
"""

from __future__ import annotations

import struct

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def _to_unsigned(h: int) -> int:
    return h & M


def hash_int(v: int, seed: int) -> int:
    """Spark XXH64.hashInt — signed in, signed out."""
    h = (_to_unsigned(seed) + P5 + 4) & M
    h ^= ((v & 0xFFFFFFFF) * P1) & M
    h = (_rotl(h, 23) * P2 + P3) & M
    return _to_signed(_fmix(h))


def hash_long(v: int, seed: int) -> int:
    """Spark XXH64.hashLong — signed in, signed out."""
    h = (_to_unsigned(seed) + P5 + 8) & M
    h ^= (_rotl((_to_unsigned(v) * P2) & M, 31) * P1) & M
    h = (_rotl(h, 27) * P1 + P4) & M
    return _to_signed(_fmix(h))


def hash_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte string (Spark hashUnsafeBytes)."""
    seed = _to_unsigned(seed)
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed
        v4 = (seed - P1) & M
        while off <= n - 32:
            k1, k2, k3, k4 = struct.unpack_from("<4Q", data, off)
            v1 = (_rotl((v1 + k1 * P2) & M, 31) * P1) & M
            v2 = (_rotl((v2 + k2 * P2) & M, 31) * P1) & M
            v3 = (_rotl((v3 + k3 * P2) & M, 31) * P1) & M
            v4 = (_rotl((v4 + k4 * P2) & M, 31) * P1) & M
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M, 31) * P1) & M
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while off <= n - 8:
        (k,) = struct.unpack_from("<Q", data, off)
        h ^= (_rotl((k * P2) & M, 31) * P1) & M
        h = (_rotl(h, 27) * P1 + P4) & M
        off += 8
    if off <= n - 4:
        (k,) = struct.unpack_from("<I", data, off)
        h ^= (k * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        off += 4
    while off < n:
        h ^= (data[off] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        off += 1
    return _to_signed(_fmix(h))


def xxhash64(*args, seed: int = SPARK_SEED) -> int:
    """F.xxhash64(*args) — chains per-argument hashes like Spark.

    str → UTF-8 bytes; bool/int: Python ints tagged 'i' hash as int32,
    plain ints as int64 (Spark's IntegerType literals vs LongType
    columns). Pass ('i', v) for an int32 argument.
    """
    h = seed
    for a in args:
        if isinstance(a, tuple) and a[0] == "i":
            h = hash_int(a[1], h)
        elif isinstance(a, str):
            h = hash_bytes(a.encode("utf-8"), h)
        elif isinstance(a, bytes):
            h = hash_bytes(a, h)
        elif isinstance(a, int):
            h = hash_long(a, h)
        else:
            raise TypeError(f"unsupported arg {type(a)}")
    return h
