"""Minimal raw-page extractor for parquet files — test-support only.

Parses just enough of the public parquet-format spec (thrift compact
protocol, file footer, page headers) to hand REFERENCE-ENCODED page
payloads to our decoders: the byte-compatibility oracle the reference
exercises via file_test.go:26-29 over testdata/*.parquet. Nothing here
is used by the engine itself (Spark reads parquet natively); it exists
so tests can prove our DELTA_*/RLE kernels decode bytes produced by
OTHER writers (parquet-mr, impala), not only their own output.

Thrift compact protocol per the public thrift spec: field header is
(delta<<4)|type with zigzag-varint field ids, lists are (size<<4)|elem
with varint overflow, integers are zigzag varints.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa


def _uvarint(buf, pos):
    shift = result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag(v: int) -> int:
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
        v, pos = _uvarint(buf, pos)
        return _zigzag(v), pos
    if t == 7:
        import struct

        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == 8:
        ln, pos = _uvarint(buf, pos)
        return bytes(buf[pos : pos + ln]), pos + ln
    if t in (9, 10):
        hdr = buf[pos]
        pos += 1
        size, et = hdr >> 4, hdr & 0xF
        if size == 15:
            size, pos = _uvarint(buf, pos)
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
        size, pos = _uvarint(buf, pos)
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
            v, pos = _uvarint(buf, pos)
            fid = _zigzag(v)
        last_id = fid
        val, pos = _read_value(t, buf, pos)
        out[fid] = val


_CODEC_NAMES = {0: None, 1: "snappy", 2: "gzip", 4: "brotli",
                5: "lz4", 6: "zstd", 7: "lz4_raw"}


@dataclass
class RawPage:
    page_type: int          # 0 data v1, 2 dictionary, 3 data v2
    num_values: int
    num_nulls: int | None   # v2 header carries it; None for v1
    encoding: int           # parquet format encoding code
    payload: bytes          # decompressed page payload (levels + values)
    def_level_bytes: int    # v2 only: explicit level section length
    rep_level_bytes: int


@dataclass
class RawColumn:
    name: str
    physical_type: int      # 0 bool,1 i32,2 i64,4 float,5 double,6 ba,7 flba
    optional: bool
    num_values: int
    pages: list


def read_columns(path: str) -> list[RawColumn]:
    """Parse footer + walk each column chunk's pages (first row group)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"PAR1" and data[-4:] == b"PAR1"
    flen = int.from_bytes(data[-8:-4], "little")
    fmd, _ = read_struct(data, len(data) - 8 - flen)
    schema = fmd[2]
    # leaf schema elements: skip the root (has num_children), flat files only
    leaves = [el for el in schema[1:] if 5 not in el]
    rg = fmd[4][0]
    out = []
    for cc, leaf in zip(rg[1], leaves):
        meta = cc[3]
        codec = _CODEC_NAMES[meta[4]]
        start = meta.get(11) or meta[9]  # dictionary page first if present
        total = meta[7]
        num_values = meta[5]
        pages = []
        pos = start
        seen = 0
        while seen < num_values:
            hdr, body = read_struct(data, pos)
            ptype = hdr[1]
            raw = data[body : body + hdr[3]]
            dlb = rlb = 0
            nulls = None
            if ptype == 0:
                # v1: the whole payload (levels + values) is compressed
                if codec:
                    raw = pa.Codec(codec).decompress(raw, hdr[2], asbytes=True)
                ph = hdr[5]
                nv, enc = ph[1], ph[2]
            elif ptype == 3:
                # v2: rep+def level sections are NEVER compressed; only
                # the values section is (when is_compressed, field 7)
                ph = hdr[8]
                nv, enc = ph[1], ph[4]
                nulls = ph.get(2, 0)
                dlb, rlb = ph.get(5, 0), ph.get(6, 0)
                lvl = rlb + dlb
                if codec and ph.get(7, True):
                    vals = pa.Codec(codec).decompress(
                        raw[lvl:], hdr[2] - lvl, asbytes=True
                    )
                    raw = bytes(raw[:lvl]) + vals
            elif ptype == 2:
                if codec:
                    raw = pa.Codec(codec).decompress(raw, hdr[2], asbytes=True)
                ph = hdr[7]
                nv, enc = ph[1], ph[2]
            else:
                raise ValueError(f"page type {ptype}")
            pages.append(RawPage(ptype, nv, nulls, enc, raw, dlb, rlb))
            if ptype != 2:
                seen += nv
            pos = body + hdr[3]
        out.append(RawColumn(
            name=meta[3][-1].decode(), physical_type=meta[1],
            optional=leaf.get(3, 0) == 1, num_values=num_values,
            pages=pages,
        ))
    return out


def split_levels(page: RawPage, optional: bool):
    """Page payload → (def_levels_hybrid_bytes | None, values_bytes).

    Flat schemas only (no repetition levels). V1 def levels carry a
    4-byte LE length prefix; v2 levels are a raw hybrid stream of
    def_level_bytes bytes located before the values section."""
    buf = page.payload
    if page.page_type == 3:
        lvl = page.rep_level_bytes + page.def_level_bytes
        dl = buf[page.rep_level_bytes : lvl] if page.def_level_bytes else None
        return dl, buf[lvl:]
    if not optional:
        return None, buf
    ln = int.from_bytes(buf[:4], "little")
    return buf[4 : 4 + ln], buf[4 + ln :]


def page_nonnull(page: RawPage, def_levels) -> int:
    """Non-null value count for a page (v2 header states it; v1 derives
    it from the decoded def levels)."""
    if page.num_nulls is not None:
        return page.num_values - page.num_nulls
    if def_levels is None:
        return page.num_values
    import numpy as np

    from parquet_go_spark.codecs import rle

    dl = rle.decode_hybrid(
        np.frombuffer(def_levels, dtype=np.uint8), page.num_values, 1
    )
    return int(dl.sum())
