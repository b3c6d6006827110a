"""VARIANT binary encoding — decode + encode of the parquet VARIANT
logical type's (metadata, value) byte pair, per the public spec
(apache/parquet-format VariantEncoding.md; behavior cross-checked
against /root/reference/variant/{metadata,decoding,types}.go).

Layout recap:

- metadata: header byte = version(0-3, must be 1) | sorted<<4 |
  (offset_size-1)<<6; then dict_size (offset_size LE bytes), then
  dict_size+1 offsets, then the concatenated UTF-8 field-name bytes.
- value: header byte; bits 0-1 = basic type (0 primitive, 1 short
  string, 2 object, 3 array).
  - primitive: bits 2-7 = primitive type id (see _PRIM_* below).
  - short string: bits 2-7 = length (< 64), bytes follow.
  - object: bits 2-3 = field_offset_size-1, bits 4-5 = field_id_size-1,
    bit 6 = is_large; then num (1 or 4 LE), num field ids, num+1
    offsets, then the concatenated field values.
  - array: bits 2-3 = offset_size-1, bit 4 = is_large; then num,
    num+1 offsets, values.

Decoded Python normal form: None, bool, int, float, str, bytes,
decimal.Decimal, datetime.date / datetime / time, uuid.UUID, dict,
list. Encode accepts the same shapes (ints pick the smallest width,
floats encode as double, strings under 64 bytes as short strings,
object fields sorted by name per the spec's field-order rule)."""

from __future__ import annotations

import datetime as _dt
import decimal
import struct
import uuid as _uuid

_UTC = _dt.timezone.utc

# primitive type ids (value header bits 2-7 when basic type is 0)
_P_NULL, _P_TRUE, _P_FALSE = 0, 1, 2
_P_INT8, _P_INT16, _P_INT32, _P_INT64 = 3, 4, 5, 6
_P_DOUBLE = 7
_P_DEC4, _P_DEC8, _P_DEC16 = 8, 9, 10
_P_DATE, _P_TS, _P_TS_NTZ = 11, 12, 13
_P_FLOAT, _P_BINARY, _P_STRING = 14, 15, 16
_P_TIME, _P_TS_NANOS, _P_TS_NTZ_NANOS, _P_UUID = 17, 18, 19, 20

_EPOCH = _dt.datetime(1970, 1, 1)
_EPOCH_UTC = _dt.datetime(1970, 1, 1, tzinfo=_UTC)


def _uint(buf: bytes, pos: int, size: int) -> int:
    return int.from_bytes(buf[pos:pos + size], "little")


def decode_metadata(buf: bytes) -> tuple[list[str], int]:
    """→ (field-name dictionary, bytes consumed)."""
    if not buf:
        raise ValueError("variant metadata: empty")
    h = buf[0]
    if h & 0x0F != 1:
        raise ValueError(f"variant metadata: unsupported version {h & 0x0F}")
    osz = ((h >> 6) & 0x03) + 1
    n = _uint(buf, 1, osz)
    pos = 1 + osz
    offs = [_uint(buf, pos + i * osz, osz) for i in range(n + 1)]
    base = pos + (n + 1) * osz
    if base + offs[n] > len(buf):
        raise ValueError("variant metadata: dictionary exceeds data")
    strings = [buf[base + offs[i]:base + offs[i + 1]].decode("utf-8")
               for i in range(n)]
    return strings, base + offs[n]


def decode_value(names: list[str], buf: bytes, pos: int = 0):
    """→ (python value, bytes consumed from pos)."""
    if pos >= len(buf):
        raise ValueError("variant value: empty")
    h = buf[pos]
    basic = h & 0x03
    info = h >> 2
    body = pos + 1
    if basic == 1:  # short string
        end = body + info
        return buf[body:end].decode("utf-8"), 1 + info
    if basic == 0:
        return _decode_primitive(info, buf, body)
    osz = ((h >> 2) & 0x03) + 1
    if basic == 2:  # object
        idsz = ((h >> 4) & 0x03) + 1
        large = (h >> 6) & 0x01
        num = _uint(buf, body, 4 if large else 1)
        p = body + (4 if large else 1)
        ids = [_uint(buf, p + i * idsz, idsz) for i in range(num)]
        p += num * idsz
        offs = [_uint(buf, p + i * osz, osz) for i in range(num + 1)]
        p += (num + 1) * osz
        out = {}
        for i in range(num):
            v, _ = decode_value(names, buf, p + offs[i])
            out[names[ids[i]]] = v
        return out, (p + offs[num]) - pos
    # basic == 3: array
    large = (h >> 4) & 0x01
    num = _uint(buf, body, 4 if large else 1)
    p = body + (4 if large else 1)
    offs = [_uint(buf, p + i * osz, osz) for i in range(num + 1)]
    p += (num + 1) * osz
    out = [decode_value(names, buf, p + offs[i])[0] for i in range(num)]
    return out, (p + offs[num]) - pos


def _decode_primitive(pt: int, buf: bytes, p: int):
    def i(size):  # little-endian signed
        return int.from_bytes(buf[p:p + size], "little", signed=True)

    if pt == _P_NULL:
        return None, 1
    if pt == _P_TRUE:
        return True, 1
    if pt == _P_FALSE:
        return False, 1
    if pt == _P_INT8:
        return i(1), 2
    if pt == _P_INT16:
        return i(2), 3
    if pt == _P_INT32:
        return i(4), 5
    if pt == _P_INT64:
        return i(8), 9
    if pt == _P_DOUBLE:
        return struct.unpack("<d", buf[p:p + 8])[0], 9
    if pt == _P_FLOAT:
        return struct.unpack("<f", buf[p:p + 4])[0], 5
    if pt in (_P_DEC4, _P_DEC8, _P_DEC16):
        w = {_P_DEC4: 4, _P_DEC8: 8, _P_DEC16: 16}[pt]
        scale = buf[p]
        unscaled = int.from_bytes(buf[p + 1:p + 1 + w], "little",
                                  signed=True)
        with decimal.localcontext() as ctx:
            ctx.prec = 60
            val = decimal.Decimal(unscaled).scaleb(-scale)
        return val, 2 + w
    if pt == _P_DATE:
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=i(4)), 5
    if pt == _P_TS:
        return _EPOCH_UTC + _dt.timedelta(microseconds=i(8)), 9
    if pt == _P_TS_NTZ:
        return _EPOCH + _dt.timedelta(microseconds=i(8)), 9
    if pt == _P_TIME:
        return (_dt.datetime.min + _dt.timedelta(microseconds=i(8))).time(), 9
    if pt in (_P_TS_NANOS, _P_TS_NTZ_NANOS):
        micros, rem = divmod(i(8), 1000)
        base = _EPOCH_UTC if pt == _P_TS_NANOS else _EPOCH
        # sub-microsecond precision has no datetime slot: keep exact by
        # returning (datetime, leftover_ns) only when needed
        val = base + _dt.timedelta(microseconds=micros)
        return (val if rem == 0 else (val, rem)), 9
    if pt == _P_UUID:
        return _uuid.UUID(bytes=bytes(buf[p:p + 16])), 17
    if pt == _P_BINARY:
        n = _uint(buf, p, 4)
        return bytes(buf[p + 4:p + 4 + n]), 5 + n
    if pt == _P_STRING:
        n = _uint(buf, p, 4)
        return buf[p + 4:p + 4 + n].decode("utf-8"), 5 + n
    raise ValueError(f"variant value: unknown primitive type {pt}")


def decode(metadata: bytes, value: bytes):
    """(metadata blob, value blob) → python value."""
    names, _ = decode_metadata(metadata)
    v, _ = decode_value(names, value)
    return v


def decode_bin(blob: bytes):
    """A .variant.bin golden (metadata directly followed by value) →
    python value (the reference's splitVariantBin + Decode)."""
    names, used = decode_metadata(blob)
    v, _ = decode_value(names, blob, used)
    return v


# ---------------------------------------------------------------- encode

def _size_code(max_val: int) -> int:
    if max_val <= 0xFF:
        return 0
    if max_val <= 0xFFFF:
        return 1
    if max_val <= 0xFFFFFF:
        return 2
    return 3


def _collect_names(obj, names: dict[str, int]) -> None:
    if isinstance(obj, dict):
        for k, v in obj.items():
            if k not in names:
                names[k] = len(names)
            _collect_names(v, names)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            _collect_names(v, names)


def encode_metadata(names: list[str]) -> bytes:
    blobs = [n.encode("utf-8") for n in names]
    total = sum(len(b) for b in blobs)
    code = _size_code(max(total, len(blobs)))
    osz = code + 1
    is_sorted = all(blobs[i] < blobs[i + 1] for i in range(len(blobs) - 1))
    out = bytearray([1 | (0x10 if is_sorted else 0) | (code << 6)])
    out += len(blobs).to_bytes(osz, "little")
    off = 0
    for b in blobs:
        out += off.to_bytes(osz, "little")
        off += len(b)
    out += off.to_bytes(osz, "little")
    for b in blobs:
        out += b
    return bytes(out)


def _encode_int(v: int) -> bytes:
    for pt, w in ((_P_INT8, 1), (_P_INT16, 2), (_P_INT32, 4), (_P_INT64, 8)):
        lo, hi = -(1 << (8 * w - 1)), (1 << (8 * w - 1)) - 1
        if lo <= v <= hi:
            return bytes([pt << 2]) + v.to_bytes(w, "little", signed=True)
    raise ValueError(f"variant encode: int {v} exceeds int64")


def encode_value(obj, name_ids: dict[str, int]) -> bytes:
    if obj is None:
        return bytes([_P_NULL << 2])
    if obj is True:
        return bytes([_P_TRUE << 2])
    if obj is False:
        return bytes([_P_FALSE << 2])
    if isinstance(obj, int):
        return _encode_int(obj)
    if isinstance(obj, float):
        return bytes([_P_DOUBLE << 2]) + struct.pack("<d", obj)
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        if len(b) < 64:
            return bytes([(len(b) << 2) | 1]) + b
        return (bytes([_P_STRING << 2])
                + len(b).to_bytes(4, "little") + b)
    if isinstance(obj, bytes):
        return (bytes([_P_BINARY << 2])
                + len(obj).to_bytes(4, "little") + obj)
    if isinstance(obj, decimal.Decimal):
        sign, digits, exp = obj.as_tuple()
        scale = max(0, -exp)
        with decimal.localcontext() as ctx:
            ctx.prec = 60
            unscaled = int(obj.scaleb(scale).to_integral_value())
        for pt, w in ((_P_DEC4, 4), (_P_DEC8, 8), (_P_DEC16, 16)):
            lo, hi = -(1 << (8 * w - 1)), (1 << (8 * w - 1)) - 1
            if lo <= unscaled <= hi and scale <= 0xFF:
                return (bytes([pt << 2, scale])
                        + unscaled.to_bytes(w, "little", signed=True))
        raise ValueError("variant encode: decimal exceeds decimal16")
    if isinstance(obj, _dt.datetime):
        if obj.tzinfo is not None:
            micros = (obj - _EPOCH_UTC) // _dt.timedelta(microseconds=1)
            return bytes([_P_TS << 2]) + micros.to_bytes(
                8, "little", signed=True)
        micros = (obj - _EPOCH) // _dt.timedelta(microseconds=1)
        return bytes([_P_TS_NTZ << 2]) + micros.to_bytes(
            8, "little", signed=True)
    if isinstance(obj, _dt.date):
        days = (obj - _dt.date(1970, 1, 1)).days
        return bytes([_P_DATE << 2]) + days.to_bytes(4, "little", signed=True)
    if isinstance(obj, _uuid.UUID):
        return bytes([_P_UUID << 2]) + obj.bytes
    if isinstance(obj, dict):
        # spec rule: object fields sorted by field NAME
        items = sorted(obj.items(), key=lambda kv: kv[0])
        vals = [encode_value(v, name_ids) for _, v in items]
        ids = [name_ids[k] for k, _ in items]
        total = sum(len(v) for v in vals)
        ocode = _size_code(total)
        icode = _size_code(max(ids, default=0))
        osz, isz = ocode + 1, icode + 1
        large = 1 if len(items) > 0xFF else 0
        out = bytearray([(ocode << 2) | (icode << 4) | (large << 6) | 2])
        out += len(items).to_bytes(4 if large else 1, "little")
        for fid in ids:
            out += fid.to_bytes(isz, "little")
        off = 0
        for v in vals:
            out += off.to_bytes(osz, "little")
            off += len(v)
        out += off.to_bytes(osz, "little")
        for v in vals:
            out += v
        return bytes(out)
    if isinstance(obj, (list, tuple)):
        vals = [encode_value(v, name_ids) for v in obj]
        total = sum(len(v) for v in vals)
        ocode = _size_code(total)
        osz = ocode + 1
        large = 1 if len(vals) > 0xFF else 0
        out = bytearray([(ocode << 2) | (large << 4) | 3])
        out += len(vals).to_bytes(4 if large else 1, "little")
        off = 0
        for v in vals:
            out += off.to_bytes(osz, "little")
            off += len(v)
        out += off.to_bytes(osz, "little")
        for v in vals:
            out += v
        return bytes(out)
    raise TypeError(f"variant encode: unsupported type {type(obj)}")


def encode(obj) -> tuple[bytes, bytes]:
    """python value → (metadata blob, value blob)."""
    names: dict[str, int] = {}
    _collect_names(obj, names)
    ordered = list(names)
    return encode_metadata(ordered), encode_value(
        obj, {n: i for i, n in enumerate(ordered)})


# ---------------------------------------------- shredded write (nested)

# Spec grammar for the write direction (mirrors the reference's
# variant_shredded_write.go case tables over Python values):
#   "boolean" | "int"/"int32" | "bigint"/"int64" | "double" | "string"
#   | "binary" | "date"                      -> primitive typed_value
#   {"field": spec, ...}                     -> object typed_value group
#   [spec]  (single element)                 -> array typed_value group
_INT_SPECS = {"int": 32, "int32": 32, "integer": 32,
              "bigint": 64, "int64": 64, "long": 64}


def _typed_match(v, spec: str) -> bool:
    """Strict primitive matching (variant_shredded_write.go:212-300's
    variantToParquetValue). Python-slice adaptation: JSON/Python ints
    carry no intrinsic width, so an int matches an integer spec iff it
    fits that type's range; bool never matches int (and vice versa);
    no numeric widening (int never matches double)."""
    s = spec.lower()
    if v is None:
        return False  # variant null always falls back to the value col
    if isinstance(v, bool):
        return s == "boolean"
    if isinstance(v, int):
        w = _INT_SPECS.get(s)
        return w is not None and -(1 << (w - 1)) <= v < (1 << (w - 1))
    if isinstance(v, float):
        return s == "double"
    if isinstance(v, str):
        return s == "string"
    if isinstance(v, bytes):
        return s == "binary"
    if isinstance(v, _dt.datetime):
        return False  # timestamps stay residual in this slice
    if isinstance(v, _dt.date):
        return s == "date"
    return False


def _shred(v, spec, ids: dict[str, int]):
    """One occurrence → {"value": bytes|None, "typed_value": ...} group.

    Case tables (VariantShredding.md; variant_shredded_write.go):
    - exact type match → typed_value set, value null;
    - mismatch (incl. variant null) → whole value variant-encoded into
      value, typed_value null;
    - object vs object spec: shredded fields recurse field-wise (absent
      field → null group = both columns null), residual fields encode
      as an object into value (null when fully shredded); shredded
      field names never appear in value;
    - array vs array spec: every element shreds through the element
      group; variant null elements become variant null (0x00) in the
      element's value column (the fallback case applied per element).
    """
    if isinstance(spec, dict):
        if isinstance(v, dict):
            typed = {}
            for fname, fspec in spec.items():
                typed[fname] = (_shred(v[fname], fspec, ids)
                                if fname in v else None)
            resid = {k: w for k, w in v.items() if k not in spec}
            return {"value": encode_value(resid, ids) if resid else None,
                    "typed_value": typed}
        return {"value": encode_value(v, ids), "typed_value": None}
    if isinstance(spec, (list, tuple)):
        if len(spec) != 1:
            raise ValueError("array spec must have exactly one element")
        if isinstance(v, (list, tuple)):
            return {"value": None,
                    "typed_value": [_shred(e, spec[0], ids) for e in v]}
        return {"value": encode_value(v, ids), "typed_value": None}
    if not isinstance(spec, str):
        raise TypeError(f"bad shredding spec node: {spec!r}")
    if _typed_match(v, spec):
        return {"value": None, "typed_value": v}
    return {"value": encode_value(v, ids), "typed_value": None}


def shred_row(v, spec) -> tuple[bytes, dict]:
    """Python value + shredding spec → (metadata, shredded group).

    The group is the nested {"value", "typed_value"} Python form that
    ``reconstruct_shredded`` consumes, so
    ``reconstruct_shredded(meta, g["value"], g["typed_value"]) == v``
    holds for every (value, spec) pair — the write/read contract the
    round-trip tests pin. Metadata covers every object field name of
    the value recursively, shredded or not (VariantShredding.md: "All
    field names of a Variant, whether shredded or not, must be present
    in the metadata"), so residuals and reconstruction share one
    dictionary."""
    names: dict[str, int] = {}
    _collect_names(v, names)
    ordered = list(names)
    return encode_metadata(ordered), _shred(
        v, spec, {n: i for i, n in enumerate(ordered)})


# ---------------------------------------------- shredded reconstruction

_MISSING = object()


def reconstruct_shredded(metadata: bytes, value: bytes | None, typed_value):
    """Shredded columns → the logical variant value (the read-direction
    rule of the VariantShredding spec, mirroring the reference's
    variant_shredded_read.go behavior):

    - typed_value non-null → it IS the value. An OBJECT typed_value
      arrives as a dict of field-name → {value, typed_value} groups
      (each reconstructs recursively; a field with both null is ABSENT)
      and merges with the residual `value` object's unshredded fields;
      a LIST typed_value is a list of such groups.
    - typed_value null → decode `value` as variant binary.
    - both null at the top level → variant null."""
    names, _ = decode_metadata(metadata)
    v = _rec_shred(names, value, typed_value)
    return None if v is _MISSING else v


def _rec_shred(names, value_bytes, typed):
    if isinstance(typed, dict):  # shredded OBJECT: field groups
        out = {}
        for k, grp in typed.items():
            fv = _MISSING if grp is None else _rec_shred(
                names, grp.get("value"), grp.get("typed_value"))
            if fv is not _MISSING:
                out[k] = fv
        if value_bytes is not None:  # partially shredded: residual fields
            resid, _ = decode_value(names, bytes(value_bytes))
            if not isinstance(resid, dict):
                raise ValueError(
                    "variant shredded: residual of an object typed_value "
                    "must be an object")
            for k, v in resid.items():
                out.setdefault(k, v)
        return out
    if isinstance(typed, list):  # shredded ARRAY: element groups
        out = []
        for e in typed:
            ev = _rec_shred(names, (e or {}).get("value"),
                            (e or {}).get("typed_value"))
            # a null/empty element group has no value to carry — map to
            # variant null rather than leaking the _MISSING sentinel
            out.append(None if ev is _MISSING else ev)
        return out
    if typed is not None:
        return typed
    if value_bytes is not None:
        return decode_value(names, bytes(value_bytes))[0]
    return _MISSING
