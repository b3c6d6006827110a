"""Parquet hybrid RLE / bit-packed encoding (code 3) + RLE_DICTIONARY (8).

Format semantics from /root/reference/encoding/rle/rle.go:30-576:
  stream of runs, each headed by a uvarint h:
    h & 1 == 0 → RLE run: h>>1 repeats of one value stored in
                 ceil(bit_width/8) LE bytes
    h & 1 == 1 → bit-packed run: h>>1 *groups of 8* values packed
                 LSB-first at bit_width
  BOOLEAN data pages prepend a 4-byte LE payload length (rle.go:48-56).
  RLE_DICTIONARY prepends one byte holding the index bit-width
  (/root/reference/encoding/rle/dictionary.go:23-59).

Encoder policy (like the reference's 8-value-group scan,
rle.go:141-249): classify each aligned group of 8 as constant or not;
merge adjacent constant groups of equal value into RLE runs, adjacent
non-constant groups into bit-packed runs. Decode tolerates empty runs
and truncated trailing runs (encoding_test.go:218).

Vectorization: group classification, run-boundary detection, and bit
packing are numpy; the per-run header loop is O(n/8) worst case and
amortizes to one Python iteration per run.
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import _native
from .bitpack import bit_length_u64, pack_le, unpack_le
from .varint import read_uvarint, write_uvarint

#: compiled hybrid kernels (widths 1..32; byte-identical streams to the
#: numpy reference below — the C encoder replicates the 8-value-group
#: merge policy exactly, so golden sizes and blobs are unchanged);
#: None → numpy fallback (see _native.py)
_NATIVE = _native.load()
_U8P = ctypes.POINTER(ctypes.c_uint8)
_U64P = ctypes.POINTER(ctypes.c_uint64)


def encode_hybrid(values: np.ndarray, width: int) -> bytes:
    """Encode unsigned ints (each < 2**width) as hybrid RLE/bit-packed."""
    n = len(values)
    out = bytearray()
    if n == 0:
        return b""
    if width == 0:
        # only value 0 is representable; one RLE run, 0-byte value
        write_uvarint(out, n << 1)
        return bytes(out)
    if _NATIVE is not None and 1 <= width <= 32:
        v = np.ascontiguousarray(values, dtype=np.uint64)
        vbytes = (width + 7) // 8
        cap = 64 + (n + 8) * vbytes + (n // 8 + 2) * 10
        buf = np.empty(cap, dtype=np.uint8)
        ln = _NATIVE.rle_encode(
            v.ctypes.data_as(_U64P), n, width, buf.ctypes.data_as(_U8P))
        return buf[:ln].tobytes()
    v = np.ascontiguousarray(values, dtype=np.uint64)
    pad = (-n) % 8
    if pad:
        v = np.concatenate([v, np.full(pad, v[-1], dtype=np.uint64)])
    g = v.reshape(-1, 8)
    const = (g == g[:, :1]).all(axis=1)
    gval = g[:, 0]
    ng = len(g)
    same_as_prev = np.zeros(ng, dtype=bool)
    if ng > 1:
        same_as_prev[1:] = (const[1:] & const[:-1] & (gval[1:] == gval[:-1])) | (
            ~const[1:] & ~const[:-1]
        )
    starts = np.flatnonzero(~same_as_prev)
    ends = np.append(starts[1:], ng)
    vbytes = (width + 7) // 8
    for s, e in zip(starts.tolist(), ends.tolist()):
        if const[s]:
            count = (e - s) * 8
            if e == ng and pad:
                count -= pad  # exact count for the trailing run
            write_uvarint(out, count << 1)
            out += int(gval[s]).to_bytes(vbytes, "little")
        else:
            groups = e - s
            write_uvarint(out, (groups << 1) | 1)
            out += pack_le(v[s * 8 : e * 8], width)
    return bytes(out)


def decode_hybrid(buf, n: int, width: int) -> np.ndarray:
    """Decode n values; returns uint64. Tolerates empty and truncated runs."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if _NATIVE is not None and 1 <= width <= 32:
        raw = np.frombuffer(bytes(buf), dtype=np.uint8)
        out = np.empty(n, dtype=np.uint64)
        rc = _NATIVE.rle_decode(
            raw.ctypes.data_as(_U8P), len(raw), n, width,
            out.ctypes.data_as(_U64P))
        if rc == n:
            return out
        # malformed varint header: fall through to the tolerant numpy
        # path (mirrors its behavior on garbage input)
    mv = memoryview(buf) if not isinstance(buf, (bytes, bytearray)) else buf
    parts: list[np.ndarray] = []
    got = 0
    pos = 0
    end = len(buf)
    vbytes = (width + 7) // 8
    while got < n and pos < end:
        h, pos = read_uvarint(mv, pos)
        if h & 1:
            groups = h >> 1
            cnt = groups * 8
            nbytes = groups * width  # 8 values * width bits / 8
            vals = unpack_le(mv[pos : pos + nbytes], cnt, width)
            pos += nbytes
            parts.append(vals)
            got += cnt
        else:
            cnt = h >> 1
            val = int.from_bytes(mv[pos : pos + vbytes], "little") if vbytes else 0
            pos += vbytes
            if cnt == 0:
                continue  # tolerate empty runs (encoding_test.go:218)
            parts.append(np.full(cnt, val, dtype=np.uint64))
            got += cnt
    if not parts:
        return np.zeros(n, dtype=np.uint64)
    result = parts[0] if len(parts) == 1 else np.concatenate(parts)
    if len(result) < n:
        result = np.concatenate([result, np.zeros(n - len(result), dtype=np.uint64)])
    return result[:n]


def encode_boolean(values: np.ndarray) -> bytes:
    """BOOLEAN RLE data page: 4-byte LE payload length + hybrid at width 1."""
    payload = encode_hybrid(values.astype(np.uint64), 1)
    return len(payload).to_bytes(4, "little") + payload


def decode_boolean(buf, n: int) -> np.ndarray:
    ln = int.from_bytes(bytes(buf[:4]), "little")
    return decode_hybrid(buf[4 : 4 + ln], n, 1).astype(bool)


def encode_levels(levels: np.ndarray, width: int) -> bytes:
    """Rep/def level encoding (data page v2 layout: bare hybrid stream)."""
    return encode_hybrid(levels.astype(np.uint64), width)


def decode_levels(buf, n: int, width: int) -> np.ndarray:
    return decode_hybrid(buf, n, width).astype(np.uint8)


def index_bit_width(max_index: int) -> int:
    """bits.Len32(max index) — the reference's index width rule
    (/root/reference/encoding/rle/dictionary.go:23-30)."""
    if max_index <= 0:
        return 0
    return int(max_index).bit_length()


def encode_dictionary_indexes(indexes: np.ndarray) -> bytes:
    """RLE_DICTIONARY data page: 1 byte bit-width, then hybrid stream."""
    n = len(indexes)
    if n == 0:
        return bytes([0])
    width = index_bit_width(int(indexes.max()))
    return bytes([width]) + encode_hybrid(indexes.astype(np.uint64), width)


def decode_dictionary_indexes(buf, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int32)
    width = buf[0]
    return decode_hybrid(buf[1:], n, width).astype(np.int32)


def run_count(values: np.ndarray) -> int:
    """Number of maximal equal-runs — a selector statistic."""
    if len(values) == 0:
        return 0
    return int(np.count_nonzero(values[1:] != values[:-1])) + 1


def max_bit_width(values: np.ndarray) -> int:
    if len(values) == 0:
        return 0
    return int(bit_length_u64(values.astype(np.uint64)).max())
