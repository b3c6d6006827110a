"""Deprecated BIT_PACKED levels encoding (parquet code 4).

MSB-first bit packing of small ints, levels-only in the format
(/root/reference/encoding/bitpacked/bitpacked.go:21-119). Kept for
parity with the reference's codec registry.
"""

from __future__ import annotations

import numpy as np

from .bitpack import pack_be, unpack_be


def encode_levels(levels: np.ndarray, width: int) -> bytes:
    return pack_be(levels.astype(np.uint64), width)


def decode_levels(buf, n: int, width: int) -> np.ndarray:
    return unpack_be(buf, n, width).astype(np.uint8)
