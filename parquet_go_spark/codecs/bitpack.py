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
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_le(buf, n: int, width: int) -> np.ndarray:
    """Inverse of pack_le; returns uint64 values."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    arr = np.frombuffer(buf, dtype=np.uint8, count=(n * width + 7) // 8)
    bits = np.unpackbits(arr, bitorder="little")[: n * width].reshape(n, width)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)


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
    bits = ((v[:, :, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(k, m * width), axis=1, bitorder="little")


def unpack_le_rows(bytemat: np.ndarray, m: int, width: int) -> np.ndarray:
    """Inverse of pack_le_rows: (k, m*width/8) uint8 → (k, m) uint64."""
    k = bytemat.shape[0]
    if width == 0:
        return np.zeros((k, m), dtype=np.uint64)
    bits = np.unpackbits(bytemat, axis=1, bitorder="little")[:, : m * width]
    bits = bits.reshape(k, m, width)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits.astype(np.uint64) << shifts).sum(axis=2, dtype=np.uint64)


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
