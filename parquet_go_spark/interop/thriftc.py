"""Thrift compact-protocol WRITER — the mirror of the reader in
tests/parquet_rawpages.py, built from the public thrift compact spec
(field header = (delta<<4)|type with zigzag-varint ids, lists are
(size<<4)|elem with varint overflow, integers zigzag varints).

Only the subset parquet-format metadata needs: bool/i32/i64/binary/
list/struct. Values are plain Python; nested structs are pre-encoded
bytes (build inside-out)."""

from __future__ import annotations

BOOL = 1  # wire: 1=true, 2=false, chosen per value
I16 = 4
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
    elif t in (I16, I32, I64):
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


# ---- compact-protocol READER -----------------------------------------
# The inverse of the writer above (same public thrift compact spec);
# previously lived in tests/parquet_rawpages.py, promoted here so the
# engine can walk parquet footers itself (bloom-filter probing needs
# ColumnMetaData.bloom_filter_offset before any data page is read).

def _read_uvarint(buf, pos):
    shift = result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _read_value(t: int, buf, pos):
    if t == 1:
        return True, pos
    if t == 2:
        return False, pos
    if t == 3:
        b = buf[pos]
        return (b - 256 if b >= 128 else b), pos + 1
    if t in (4, 5, 6):
        v, pos = _read_uvarint(buf, pos)
        return _unzigzag(v), pos
    if t == 7:
        import struct as _s

        return _s.unpack_from("<d", buf, pos)[0], pos + 8
    if t == 8:
        ln, pos = _read_uvarint(buf, pos)
        return bytes(buf[pos : pos + ln]), pos + ln
    if t in (9, 10):
        hdr = buf[pos]
        pos += 1
        size, et = hdr >> 4, hdr & 0xF
        if size == 15:
            size, pos = _read_uvarint(buf, pos)
        out = []
        for _ in range(size):
            if et in (1, 2):  # bool ELEMENTS are one byte: 1=true 2=false
                out.append(buf[pos] == 1)
                pos += 1
            else:
                v, pos = _read_value(et, buf, pos)
                out.append(v)
        return out, pos
    if t == 11:
        size, pos = _read_uvarint(buf, pos)
        out = {}
        if size:
            kv = buf[pos]
            pos += 1
            kt, vt = kv >> 4, kv & 0xF
            for _ in range(size):
                k, pos = _read_value(kt, buf, pos)
                v, pos = _read_value(vt, buf, pos)
                out[k] = v
        return out, pos
    if t == 12:
        return read_struct(buf, pos)
    raise ValueError(f"thrift compact type {t}")


def read_struct(buf, pos):
    """Compact-protocol struct → {field_id: value} (nested structs as
    dicts, bools inline in the field header)."""
    out = {}
    last_id = 0
    while True:
        b = buf[pos]
        pos += 1
        if b == 0:
            return out, pos
        delta, t = b >> 4, b & 0xF
        if delta:
            fid = last_id + delta
        else:
            v, pos = _read_uvarint(buf, pos)
            fid = _unzigzag(v)
        last_id = fid
        val, pos = _read_value(t, buf, pos)
        out[fid] = val
