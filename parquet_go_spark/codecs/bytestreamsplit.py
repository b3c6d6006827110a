"""BYTE_STREAM_SPLIT encoding (parquet code 9).

Byte-plane transpose: byte j of every k-byte value goes to stream j
(/root/reference/encoding/bytestreamsplit/bytestreamsplit.go:23-105).
No size change by itself; improves downstream general-purpose
compression. One-line transpose in numpy — the vectorized equivalent of
the reference's SIMD kernels (bytestreamsplit_amd64.s).
"""

from __future__ import annotations

import numpy as np

from .kinds import KIND_DTYPES


def encode(values: np.ndarray, byte_width: int) -> bytes:
    a = np.ascontiguousarray(values)
    raw = a.view(np.uint8).reshape(-1, byte_width)
    return raw.T.copy().tobytes()


def decode(buf, n: int, byte_width: int, kind: int | None = None) -> np.ndarray:
    raw = np.frombuffer(buf, dtype=np.uint8, count=n * byte_width)
    out = raw.reshape(byte_width, n).T.copy()
    if kind is not None:
        return out.reshape(-1).view(KIND_DTYPES[kind])
    return out  # (n, byte_width) uint8 for FLBA
