"""Vectorized bit packing/unpacking (LSB-first and MSB-first).

The numpy analog of the reference's SIMD bit-pack kernels
(/root/reference/encoding/rle/rle_amd64.s and the purego fallbacks):
values are expanded to a (n, width) bit matrix and folded with
np.packbits/np.unpackbits — no per-value Python.
"""

from __future__ import annotations

import numpy as np


def pack_le(values: np.ndarray, width: int) -> bytes:
    """Pack ints at `width` bits each, LSB-first within the stream.

    This is the parquet bit-packed layout used by hybrid RLE groups and
    DELTA_BINARY_PACKED miniblocks.
    """
    n = len(values)
    if n == 0 or width == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    # slab so the bit-expansion temp stays cache-sized (see _SLAB_BYTES);
    # slab boundaries stay byte-aligned when n*width % 8 == 0 per slab,
    # so pick a multiple of 8 values per slab
    step = max(8, (_SLAB_BYTES // (width * 8)) & ~7)
    if n <= step:
        bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        return np.packbits(bits.reshape(-1), bitorder="little").tobytes()
    parts = []
    for s in range(0, n, step):
        sl = v[s:s + step]
        bits = ((sl[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        parts.append(np.packbits(bits.reshape(-1), bitorder="little"))
    return b"".join(p.tobytes() for p in parts)


def unpack_le(buf, n: int, width: int) -> np.ndarray:
    """Inverse of pack_le; returns uint64 values."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    arr = np.frombuffer(buf, dtype=np.uint8, count=(n * width + 7) // 8)
    shifts = np.arange(width, dtype=np.uint64)
    # slab (byte-aligned: step % 8 == 0 values) — see _SLAB_BYTES
    step = max(8, (_SLAB_BYTES // (width * 8)) & ~7)
    out = np.empty(n, dtype=np.uint64)
    for s in range(0, n, step):
        n_s = min(step, n - s)
        chunk = arr[s * width // 8: (s + n_s) * width // 8 + 1]
        bits = np.unpackbits(chunk, bitorder="little")[: n_s * width]
        out[s:s + n_s] = (bits.reshape(n_s, width).astype(np.uint64)
                          << shifts).sum(axis=1, dtype=np.uint64)
    return out


# Row-slab bound for the (slab, m, width) uint64 bit-expansion temp.
# One big call's temp (tens of MB) falls out of cache and saturates this
# class of host's memory bus — measured 12x slower than the same values
# packed in cache-sized slices. 2 MB slabs keep every temp in L2/L3 and
# make pack/unpack cost linear in k regardless of call size.
_SLAB_BYTES = 2 << 20


def pack_le_rows(mat: np.ndarray, width: int) -> np.ndarray:
    """Pack each row of (k, m) ints at `width` bits → (k, m*width/8) uint8.

    m*width must be a multiple of 8 (true for 32-value miniblocks).
    Used to pack all DELTA_BINARY_PACKED miniblocks of equal bit-width in
    one vectorized shot.
    """
    k, m = mat.shape
    if width == 0:
        return np.empty((k, 0), dtype=np.uint8)
    v = np.ascontiguousarray(mat, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    out = np.empty((k, m * width // 8), dtype=np.uint8)
    step = max(1, _SLAB_BYTES // (m * width * 8))
    for s in range(0, k, step):
        sl = v[s:s + step]
        bits = ((sl[:, :, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        out[s:s + step] = np.packbits(
            bits.reshape(len(sl), m * width), axis=1, bitorder="little"
        )
    return out


def unpack_le_rows(bytemat: np.ndarray, m: int, width: int) -> np.ndarray:
    """Inverse of pack_le_rows: (k, m*width/8) uint8 → (k, m) uint64."""
    k = bytemat.shape[0]
    if width == 0:
        return np.zeros((k, m), dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    out = np.empty((k, m), dtype=np.uint64)
    step = max(1, _SLAB_BYTES // (m * width * 8))
    for s in range(0, k, step):
        sl = bytemat[s:s + step]
        bits = np.unpackbits(sl, axis=1, bitorder="little")[:, : m * width]
        bits = bits.reshape(len(sl), m, width)
        out[s:s + step] = (bits.astype(np.uint64) << shifts).sum(
            axis=2, dtype=np.uint64
        )
    return out


def pack_be(values: np.ndarray, width: int) -> bytes:
    """MSB-first packing — the deprecated BIT_PACKED levels layout
    (reference: /root/reference/encoding/bitpacked/bitpacked.go:21-119)."""
    n = len(values)
    if n == 0 or width == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="big").tobytes()


def unpack_be(buf, n: int, width: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    arr = np.frombuffer(buf, dtype=np.uint8, count=(n * width + 7) // 8)
    bits = np.unpackbits(arr, bitorder="big")[: n * width].reshape(n, width)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Element-wise bit length of uint64 values, exact for the full range.

    float64 log2 is inexact above 2^53, so split into hi/lo 32-bit halves
    and use np.frexp (exact for ints < 2^53) on each half.
    """
    x = x.astype(np.uint64, copy=False)
    hi = (x >> np.uint64(32)).astype(np.float64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.float64)
    bl_hi = np.where(hi > 0, np.frexp(hi)[1], 0)
    bl_lo = np.where(lo > 0, np.frexp(lo)[1], 0)
    return np.where(hi > 0, 32 + bl_hi, bl_lo).astype(np.int64)
