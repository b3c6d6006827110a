"""Thrift compact-protocol WRITER — the mirror of the reader in
tests/parquet_rawpages.py, built from the public thrift compact spec
(field header = (delta<<4)|type with zigzag-varint ids, lists are
(size<<4)|elem with varint overflow, integers zigzag varints).

Only the subset parquet-format metadata needs: bool/i32/i64/binary/
list/struct. Values are plain Python; nested structs are pre-encoded
bytes (build inside-out)."""

from __future__ import annotations

BOOL = 1  # wire: 1=true, 2=false, chosen per value
I32 = 5
I64 = 6
BINARY = 8
LIST = 9
STRUCT = 12


def _uvarint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _write_value(out: bytearray, t: int, v, elem: int | None) -> None:
    if t == BOOL:
        # bool as a LIST element: one byte, 1=true 2=false (compact spec)
        out.append(1 if v else 2)
    elif t in (I32, I64):
        _uvarint(out, _zigzag(int(v)))
    elif t == BINARY:
        b = v.encode() if isinstance(v, str) else bytes(v)
        _uvarint(out, len(b))
        out += b
    elif t == LIST:
        items = list(v)
        if len(items) < 15:
            out.append((len(items) << 4) | elem)
        else:
            out.append(0xF0 | elem)
            _uvarint(out, len(items))
        for it in items:
            _write_value(out, elem, it, None)
    elif t == STRUCT:
        out += v  # pre-encoded struct bytes
    else:
        raise ValueError(f"thrift compact write type {t}")


def struct(fields: list[tuple[int, int, object] | tuple[int, int, object, int]]) -> bytes:
    """Encode one struct. fields: (field_id, type, value[, list_elem_type]),
    any order; None values are skipped (optional fields)."""
    out = bytearray()
    last = 0
    for f in sorted(fields, key=lambda f: f[0]):
        fid, t, v = f[0], f[1], f[2]
        elem = f[3] if len(f) > 3 else None
        if v is None:
            continue
        wire = (1 if v else 2) if t == BOOL else t
        delta = fid - last
        if 0 < delta <= 15:
            out.append((delta << 4) | wire)
        else:
            out.append(wire)
            _uvarint(out, _zigzag(fid))
        if t != BOOL:
            _write_value(out, t, v, elem)
        last = fid
    out.append(0)
    return bytes(out)
