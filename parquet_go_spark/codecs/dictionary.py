"""Dictionary build/lookup kernels.

Reference semantics: /root/reference/dictionary.go:43-83 (Insert/Lookup/
Index/Bounds), dictionary_byte_array.go:14-70 (byte-array dedupe via
hash map — here pyarrow's C++ dictionary_encode), writer.go:2049-2077
(size-cap fallback handled by the selector, see selector.py).

The dictionary page itself is PLAIN-encoded values; the data page holds
int32 indexes in RLE_DICTIONARY framing (dictionary.go:110-125).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .bytearrays import ByteArrays


def factorize_numeric(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Returns (uniques, indexes) — uniques sorted ascending (deterministic)."""
    uniques, inverse = np.unique(values, return_inverse=True)
    return uniques, inverse.astype(np.int32)


def factorize_byte_array(values: ByteArrays) -> tuple[ByteArrays, np.ndarray]:
    """Returns (unique values in first-occurrence order, int32 indexes)."""
    arr = values.to_arrow()
    denc = arr.dictionary_encode()
    indexes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int32)
    uniques = ByteArrays.from_arrow(denc.dictionary)
    return uniques, indexes


def lookup_numeric(uniques: np.ndarray, indexes: np.ndarray) -> np.ndarray:
    return uniques[indexes]


def lookup_byte_array(uniques: ByteArrays, indexes: np.ndarray) -> ByteArrays:
    """Gather: vectorized take on the flat (data, offsets) layout."""
    lens = uniques.lengths
    out_lens = lens[indexes]
    n = len(indexes)
    offsets = np.zeros(n + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(out_lens)
    total = int(offsets[-1])
    if total == 0:
        return ByteArrays(np.empty(0, np.uint8), offsets)
    csum = offsets[:-1]
    within = np.arange(total, dtype=np.int64) - np.repeat(csum, out_lens)
    src = np.repeat(uniques.offsets[:-1][indexes], out_lens) + within
    return ByteArrays(uniques.data[src], offsets)


def dict_size_bytes(uniques) -> int:
    """Approximate in-memory dictionary footprint — drives the
    DictionaryMaxBytes fallback rule (writer.go:2049-2061)."""
    if isinstance(uniques, ByteArrays):
        return int(uniques.offsets[-1]) + 4 * len(uniques)
    return int(uniques.nbytes)
