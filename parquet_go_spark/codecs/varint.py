"""ULEB128 uvarint + zigzag helpers (parquet spec framing primitives).

Used for hybrid-RLE run headers and DELTA_BINARY_PACKED block headers
(reference semantics: /root/reference/encoding/rle/rle.go:141-201,
/root/reference/encoding/delta/binary_packed.go:169-175). Varints are
per-run/per-block, never per-value, so a Python loop here is off the
hot path.
"""

from __future__ import annotations

_MASK64 = (1 << 64) - 1


def write_uvarint(out: bytearray, v: int) -> None:
    v &= _MASK64
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def read_uvarint(buf, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("uvarint too long")


def zigzag_encode(v: int) -> int:
    """64-bit zigzag: maps signed ints to unsigned, small magnitude first."""
    return ((v << 1) ^ (v >> 63)) & _MASK64


def zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_zigzag_varint(out: bytearray, v: int) -> None:
    write_uvarint(out, zigzag_encode(v))


def read_zigzag_varint(buf, pos: int) -> tuple[int, int]:
    u, pos = read_uvarint(buf, pos)
    return zigzag_decode(u), pos
