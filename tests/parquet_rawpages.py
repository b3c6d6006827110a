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

# the compact-protocol reader was promoted into the package (the engine
# needs footer access for bloom probing); re-exported here for the tests
from parquet_go_spark.interop.thriftc import read_struct  # noqa: F401


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
