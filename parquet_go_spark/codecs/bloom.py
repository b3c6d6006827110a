"""Split-block bloom filter (parquet SBBF layout).

Mirrors /root/reference/bloom/block.go:16-28 and bloom/filter.go:16-76:
32-byte blocks of 8 uint32 words; a value sets one bit per word, with
the bit index derived by multiplying the low 32 hash bits by one of 8
fixed odd salts and taking the top 5 bits. Block selection uses the
high 32 bits scaled to the block count (fixed-point trick, filter.go).

The value hash is a vectorized splitmix64-based hash (not xxhash64 as
in the reference — no vectorized xxhash is available here); the filter
is self-consistent: build and probe use the same hash. Serialized form:
uvarint n_blocks | raw little-endian block words.
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import _native
from .bytearrays import ByteArrays
from .kinds import Kind
from .varint import read_uvarint, write_uvarint

#: compiled per-value hash for byte arrays (same blob bytes as the
#: numpy reference below — the kernel implements the identical
#: polynomial, so filters built by either path probe correctly with
#: the other); None → numpy fallback (see _native.py)
_NATIVE = _native.load()
_U8P = ctypes.POINTER(ctypes.c_uint8)
_I64P = ctypes.POINTER(ctypes.c_int64)
_U64P = ctypes.POINTER(ctypes.c_uint64)

SALT = np.array(
    [0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
     0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31],
    dtype=np.uint32,
)  # bloom/block.go:20-28

_K1 = np.uint64(0x9E3779B97F4A7C15)
_K2 = np.uint64(0xBF58476D1CE4E5B9)
_K3 = np.uint64(0x94D049BB133111EB)

BITS_PER_VALUE = 10  # default sizing, ~1% fpp (README.md:395-465)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x + _K1).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * _K2
    x = (x ^ (x >> np.uint64(27))) * _K3
    return x ^ (x >> np.uint64(31))


def hash_values(values, kind: int) -> np.ndarray:
    """Vectorized 64-bit hash per value (numeric or byte-array)."""
    if kind == Kind.BYTE_ARRAY:
        assert isinstance(values, ByteArrays)
        n = len(values)
        if _NATIVE is not None and n:
            raw = np.ascontiguousarray(values.data[: values.offsets[-1]])
            out = np.empty(n, dtype=np.uint64)
            _NATIVE.poly64(
                raw.ctypes.data_as(_U8P),
                values.offsets.ctypes.data_as(_I64P),
                n, out.ctypes.data_as(_U64P),
            )
            return out
        data = values.data[: values.offsets[-1]].astype(np.uint64)
        lens = values.lengths
        # polynomial accumulation per value: sum(byte * K2^(pos_in_value))
        # computed via segmented weighted sums, then mixed with length
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        csum = np.cumsum(lens) - lens
        pos = np.arange(len(data), dtype=np.int64) - np.repeat(csum, lens)
        # position weights: K2^pos mod 2^64 (precomputed table up to max len)
        maxp = int(pos.max()) + 1 if len(pos) else 1
        w = np.empty(maxp, dtype=np.uint64)
        acc_w = 1
        for i in range(maxp):  # ≤ max value length, not per value
            w[i] = acc_w
            acc_w = (acc_w * int(_K2)) & 0xFFFFFFFFFFFFFFFF
        acc = np.zeros(n, dtype=np.uint64)
        np.add.at(acc, row, data * w[pos])
        return _mix64(acc ^ (lens.astype(np.uint64) * _K3))
    a = np.ascontiguousarray(values)
    if a.ndim == 2:
        # FIXED_LEN_BYTE_ARRAY rows: fold each row's bytes into 8-byte
        # words and chain-mix them (width is ≤16 in practice, so this is
        # 2-3 vectorized passes, not per-value work)
        rows, width = a.shape
        pad = (-width) % 8
        if pad:
            a = np.concatenate(
                [a, np.zeros((rows, pad), dtype=np.uint8)], axis=1
            )
        words = a.view("<u8").reshape(rows, -1)
        acc = np.zeros(rows, dtype=np.uint64)
        for j in range(words.shape[1]):
            acc = _mix64(acc ^ words[:, j])
        return acc
    if a.dtype == bool:
        a = a.astype(np.uint8)
    if a.dtype.kind == "f":
        # normalize -0.0 → +0.0 before the bit view: the final exact
        # filter treats them as equal, so the bloom must too (a probe of
        # 0.0 pruning a chunk holding only -0.0 would be a false
        # negative — parquet writers normalize stats the same way)
        a = np.where(a == 0, 0, a)
    u = a.view({1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}[a.itemsize])
    return _mix64(u.astype(np.uint64))


def _block_index(h: np.ndarray, n_blocks: int) -> np.ndarray:
    return ((h >> np.uint64(32)) * np.uint64(n_blocks)) >> np.uint64(32)


def _bit_masks(h: np.ndarray) -> np.ndarray:
    """(n, 8) uint32 word masks: one bit per word per value."""
    lo = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    x = lo[:, None] * SALT[None, :]  # uint32 wrap
    return (np.uint32(1) << (x >> np.uint32(27))).astype(np.uint32)


def build(values, kind: int, bits_per_value: int = BITS_PER_VALUE) -> bytes:
    """Build a filter sized for len(values) distinct-ish values."""
    h = hash_values(values, kind)
    n = max(len(h), 1)
    n_blocks = max(1, (n * bits_per_value + 255) // 256)
    words = np.zeros((n_blocks, 8), dtype=np.uint32)
    bi = _block_index(h, n_blocks).astype(np.int64)
    masks = _bit_masks(h)
    np.bitwise_or.at(words, (bi[:, None], np.arange(8)[None, :]), masks)
    out = bytearray()
    write_uvarint(out, n_blocks)
    out += words.astype("<u4").tobytes()
    return bytes(out)


def might_contain(blob: bytes, values, kind: int) -> np.ndarray:
    """Vectorized membership probe → bool per value (no false negatives)."""
    mv = memoryview(blob)
    n_blocks, pos = read_uvarint(mv, 0)
    words = np.frombuffer(mv, dtype="<u4", offset=pos).reshape(n_blocks, 8)
    h = hash_values(values, kind)
    bi = _block_index(h, n_blocks).astype(np.int64)
    masks = _bit_masks(h)
    got = words[bi]  # (n, 8)
    return np.all((got & masks) == masks, axis=1)
