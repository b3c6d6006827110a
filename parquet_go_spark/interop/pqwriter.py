"""Write real .parquet files from our codec payloads.

The engine's page payloads ARE parquet-spec encodings (the golden-decode
suite proves byte-compatibility in the read direction against
parquet-mr/impala-written pages); this module adds the file container —
thrift compact page headers + footer metadata per the public
parquet-format spec — so pyarrow, DuckDB, and Spark's own parquet-mr
reader validate our encoded bytes end-to-end. Mirrors the reference
being a full parquet writer (writer.go) rather than a private format.

Scope: flat schemas plus LIST and MAP groups (true Dremel rep/def
levels), required/optional leaves, data pages v1 AND v2
(the reference's default is v2, config.go:27-31), multiple row groups,
row-group Statistics with the reference's truncate-with-carry bound
rule (column_index.go:684-700), encodings PLAIN / RLE(boolean) /
DELTA_BINARY_PACKED / DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY /
BYTE_STREAM_SPLIT / RLE_DICTIONARY, page compression
none/snappy/gzip/zstd.
"""

from __future__ import annotations

import struct as _struct
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from parquet_go_spark.codecs import (
    bytestreamsplit as bss,
    delta,
    dictionary,
    plain,
    rle,
)
from parquet_go_spark.codecs.bytearrays import ByteArrays
from parquet_go_spark.codecs.chunk import _outer
from parquet_go_spark.codecs.kinds import Codec, Kind, KIND_WIDTHS
from parquet_go_spark.interop import pqbloom, thriftc as tc

# parquet-format PageType / CompressionCodec / ConvertedType enums
_DATA_PAGE = 0
_DICTIONARY_PAGE = 2
_DATA_PAGE_V2 = 3
_COMPRESSION = {None: 0, "snappy": 1, "gzip": 2, "brotli": 4, "zstd": 6,
                "lz4_raw": 7, "lz4_legacy": 5}


def _compress(name: str, payload: bytes) -> bytes:
    """Page-body compression. "lz4_legacy" writes codec 5 in Hadoop
    block framing ([BE32 usize][BE32 csize][lz4 block]) — the flavor
    parquet-mr emits, readable by pyarrow/parquet-mr and by our
    pqreader's try-each-framing decode; "lz4_raw" (codec 7) is the
    reference's LZ4 codec (compress/lz4/lz4.go)."""
    if name == "lz4_legacy":
        blk = pa.Codec("lz4_raw").compress(payload, asbytes=True)
        return (len(payload).to_bytes(4, "big")
                + len(blk).to_bytes(4, "big") + blk)
    return _outer(name).compress(payload, asbytes=True)
_CONVERTED = {"string": 0, "date": 6, "timestamp_micros": 10}


def _logical_fields(logical: str | None) -> list:
    """SchemaElement annotation fields for a leaf. Plain names map to
    the legacy ConvertedType; "decimal(p,s)" additionally writes
    scale/precision and the modern DecimalType logicalType (union
    field 5) so every reader generation agrees on the value space."""
    if logical is None:
        return []
    if logical.startswith("decimal("):
        pr, sc = (int(x) for x in logical[len("decimal("):-1].split(","))
        return [
            (6, tc.I32, 5), (7, tc.I32, sc), (8, tc.I32, pr),
            (10, tc.STRUCT, tc.struct([
                (5, tc.STRUCT, tc.struct([(1, tc.I32, sc),
                                          (2, tc.I32, pr)])),
            ])),
        ]
    return [(6, tc.I32, _CONVERTED.get(logical))]


def _dec_flba(kind: int, logical: str | None) -> bool:
    """FLBA decimals are big-endian two's complement: raw byte order is
    NOT value order across signs, so min/max statistics and page
    indexes are omitted for them (null bounds = never prunable) rather
    than risking a reader pruning away real matches."""
    return (kind == Kind.FIXED_LEN_BYTE_ARRAY and logical is not None
            and logical.startswith("decimal("))

_MAGIC = b"PAR1"
STAT_TRUNCATE = 16  # same bound as the manifest stats (config.go:29)


@dataclass
class ColumnSpec:
    """One leaf column. `values` holds only non-null values (ndarray /
    ByteArrays / bool ndarray); `validity` (bool ndarray over all rows)
    marks an optional column. encoding=None picks a default per kind.

    LIST columns (`array<scalar>`): pass the FLATTENED element values
    in `values` plus per-row element counts in `lengths`; `validity`
    then marks null LISTS (elements themselves are required). The
    column is written as the spec's 3-level LIST group with true
    Dremel repetition/definition levels (rep 0/1; def 0=null list,
    1=empty list, 2=element)."""

    name: str
    kind: int
    values: object
    validity: np.ndarray | None = None
    flba_size: int | None = None
    encoding: int | None = None
    logical: str | None = None  # "string" | "date" | "timestamp_micros"
    lengths: np.ndarray | None = None  # list columns: elements per row


@dataclass
class MapColumnSpec:
    """One map<K,V> column → TWO leaf chunks sharing the entry lengths:
    a required key leaf and an optional value leaf (entry_validity marks
    present values; `values` of the value leaf holds only non-null
    ones). Written as the spec's 3-level MAP group
    `optional group <name> (MAP) { repeated group key_value {
    required K key; optional V value } }`."""

    name: str
    key: ColumnSpec    # kind/values/flba/encoding/logical of the key leaf
    value: ColumnSpec  # same for the value leaf (null-stripped values)
    lengths: np.ndarray = None          # entries per row
    validity: np.ndarray | None = None  # null MAPS (rows)
    entry_validity: np.ndarray | None = None  # per entry: value present?


@dataclass
class NestedLeaf:
    """One leaf of an arbitrarily nested column, with its Dremel entry
    streams already computed (the write-direction shred lives in
    export._nested_spec). `values` holds the null-stripped leaf values
    in entry order; `rep`/`de` are uint8 per entry; `row_starts` maps
    row index → first entry index (length n_rows+1), which is what lets
    pages break on row boundaries; `val_cum` maps entry index → value
    index (cumsum of de == max_def)."""

    path: list  # path segments BELOW the column name
    kind: int
    values: object
    rep: np.ndarray
    de: np.ndarray
    max_rep: int
    max_def: int
    row_starts: np.ndarray
    val_cum: np.ndarray
    flba_size: int | None = None
    encoding: int | None = None
    logical: str | None = None


@dataclass
class NestedColumnSpec:
    """One column of ANY nesting (struct/list composition, nullable at
    every level) → one chunk per leaf with true rep/def streams. The
    schema subtree is pre-built by the shredder (`schema_elements` is a
    list of thriftc SchemaElement structs, root group first)."""

    name: str
    n_rows: int
    leaves: list  # [NestedLeaf]
    schema_elements: list  # prebuilt tc.struct(...) blobs


@dataclass
class StructColumnSpec:
    """One struct<...> column → one leaf chunk per field, written as
    the group `<optional|required> group <name> { fields... }`. Each
    field's ColumnSpec carries null-stripped PRESENT values and (if the
    field is nullable) a row-level validity that is False wherever the
    field is null OR the whole struct is null; `validity` here marks
    null STRUCTS. Field def levels then run 0..2 (null struct / field
    null / present), or a subset when either side is required."""

    name: str
    fields: list  # [(field_name, ColumnSpec)]
    validity: np.ndarray | None = None  # null structs (rows)


def _default_encoding(spec: ColumnSpec) -> int:
    k = spec.kind
    if k in (Kind.INT32, Kind.INT64):
        return Codec.DELTA_BINARY_PACKED
    if k in (Kind.FLOAT, Kind.DOUBLE):
        # NOT BYTE_STREAM_SPLIT: Spark's vectorized reader rejects BSS
        # in v1 data pages (pyarrow/DuckDB accept it; pass encoding=
        # Codec.BYTE_STREAM_SPLIT explicitly for those readers)
        return Codec.PLAIN
    if k == Kind.BOOLEAN:
        return Codec.RLE
    n = len(spec.values)
    if n:
        cap = min(n, 4096)
        if isinstance(spec.values, ByteArrays):
            sample = _slice_values(spec.values, 0, cap).to_pylist()
        elif k == Kind.FIXED_LEN_BYTE_ARRAY:
            # 2-D (n, width) rows are unhashable; hash their bytes
            sample = [row.tobytes()
                      for row in np.asarray(spec.values)[:cap]]
        else:
            sample = list(np.asarray(spec.values)[:cap])
        if len(set(sample)) * 2 <= len(sample):
            return Codec.RLE_DICTIONARY
    return (Codec.DELTA_LENGTH_BYTE_ARRAY
            if k == Kind.BYTE_ARRAY else Codec.PLAIN)


def _encode_values(vals, kind: int, codec: int, flba_size) -> bytes:
    if codec == Codec.PLAIN:
        if kind == Kind.BOOLEAN:
            return plain.encode_boolean(np.asarray(vals, dtype=bool))
        if kind == Kind.BYTE_ARRAY:
            return plain.encode_byte_array(vals)
        if kind == Kind.FIXED_LEN_BYTE_ARRAY:
            return plain.encode_flba(vals, flba_size)
        return plain.encode_numeric(np.asarray(vals), kind)
    if codec == Codec.RLE:
        return rle.encode_boolean(np.asarray(vals, dtype=bool))
    if codec == Codec.DELTA_BINARY_PACKED:
        bits = 32 if kind == Kind.INT32 else 64
        return delta.encode_binary_packed(np.asarray(vals), bits)
    if codec == Codec.DELTA_LENGTH_BYTE_ARRAY:
        return delta.encode_length_byte_array(vals)
    if codec == Codec.DELTA_BYTE_ARRAY:
        return delta.encode_byte_array(vals)
    if codec == Codec.BYTE_STREAM_SPLIT:
        return bss.encode(np.asarray(vals), KIND_WIDTHS[kind])
    raise ValueError(f"unsupported parquet-interop codec {codec}")


def _slice_values(vals, lo: int, hi: int):
    if isinstance(vals, ByteArrays):
        o = vals.offsets
        return ByteArrays(vals.data[o[lo]:o[hi]], o[lo:hi + 1] - o[lo])
    return vals[lo:hi]


# ---------------------------------------------------------------------------
# statistics (ColumnMetaData field 12) — raw plain-encoded bounds with
# the reference's truncate-then-carry upper-bound rule for byte arrays
# ---------------------------------------------------------------------------

def _truncate_max_bytes(b: bytes) -> bytes | None:
    if len(b) <= STAT_TRUNCATE:
        return b
    t = bytearray(b[:STAT_TRUNCATE])
    for i in range(len(t) - 1, -1, -1):
        if t[i] < 0xFF:
            t[i] += 1
            return bytes(t[: i + 1])
    return None  # all 0xFF — no representable upper bound


_STAT_FMT = {Kind.INT32: "<i", Kind.INT64: "<q",
             Kind.FLOAT: "<f", Kind.DOUBLE: "<d"}


def _stat_bounds(vals, kind: int, logical: str | None = None,
                 ) -> tuple[bytes | None, bytes | None]:
    """(min_value, max_value) plain-encoded, or (None, None).

    FLBA decimals (see _dec_flba) always get (None, None): byte order
    is not value order across signs, and null bounds are never
    prunable — safer than a reader pruning away real matches."""
    lo, hi, _, _ = _stat_bounds_exact(vals, kind, logical)
    return lo, hi


def _stat_bounds_exact(vals, kind: int, logical: str | None = None,
                       ) -> tuple[bytes | None, bytes | None, bool, bool]:
    """(min_value, max_value, min_exact, max_exact). The exact flags
    say whether the bound IS the actual extreme value (fixed-width
    kinds always; BYTE_ARRAY only when no truncation happened) — they
    become Statistics.is_min/max_value_exact (fields 8/7), which is
    what lets a footer-only aggregate report min/max for strings."""
    if len(vals) == 0 or _dec_flba(kind, logical):
        return None, None, False, False
    if kind == Kind.BOOLEAN:
        a = np.asarray(vals, dtype=bool)
        return bytes([int(a.min())]), bytes([int(a.max())]), True, True
    if kind in _STAT_FMT:
        a = np.asarray(vals)
        if kind in (Kind.FLOAT, Kind.DOUBLE):
            # parquet-mr parity (PARQUET-1222): a float chunk/page
            # containing ANY NaN writes NO bounds. Readers prune with
            # NaN-blind comparators (Spark orders NaN above every
            # double), so NaN-skipping bounds let `x = NaN` prune away
            # the very group holding the matching rows — silent row
            # loss in parquet-mr/Spark, reproduced before this rule.
            nan = np.isnan(a)
            if nan.any():
                return None, None, False, False
            if a.size == 0:
                return None, None, False, False
        lo, hi = a.min(), a.max()
        if kind in (Kind.FLOAT, Kind.DOUBLE):
            # spec-recommended zero normalization: min -0.0, max +0.0
            if lo == 0:
                lo = -0.0
            if hi == 0:
                hi = 0.0
        f = _STAT_FMT[kind]
        return _struct.pack(f, lo), _struct.pack(f, hi), True, True
    if kind == Kind.FIXED_LEN_BYTE_ARRAY:
        a = np.ascontiguousarray(vals, dtype=np.uint8)
        idx = np.lexsort(a.T[::-1])
        return a[idx[0]].tobytes(), a[idx[-1]].tobytes(), True, True
    # BYTE_ARRAY: unsigned lexicographic, truncated with carry
    import pyarrow as pa
    import pyarrow.compute as pc
    mm = pc.min_max(vals.to_arrow() if isinstance(vals, ByteArrays)
                    else pa.array(list(vals), pa.binary()))
    lo = mm["min"].as_py() or b""
    hi = mm["max"].as_py() or b""
    return (lo[:STAT_TRUNCATE], _truncate_max_bytes(hi),
            len(lo) <= STAT_TRUNCATE, len(hi) <= STAT_TRUNCATE)


def _statistics_struct(vals, kind: int, null_count: int,
                       logical: str | None = None) -> bytes:
    lo, hi, lo_ex, hi_ex = _stat_bounds_exact(vals, kind, logical)
    return tc.struct([
        (3, tc.I64, null_count),
        (5, tc.BINARY, hi),
        (6, tc.BINARY, lo),
        (7, tc.BOOL, None if hi is None else hi_ex),
        (8, tc.BOOL, None if lo is None else lo_ex),
    ])


# ---------------------------------------------------------------------------
# pages
# ---------------------------------------------------------------------------

def _list_levels(lens: np.ndarray, valid: np.ndarray | None,
                 entry_valid: np.ndarray | None = None):
    """Dremel entry streams for one page of a repeated column →
    (rep uint8[E], def uint8[E]): each row contributes its elements
    (rep 0 for the first, 1 after) or ONE placeholder entry
    (def 1 empty / def 0 null container, rep 0). Element def is 2 for
    a required leaf; with `entry_valid` (an optional leaf under the
    repeated group, e.g. a MAP's value) present elements get def 3 and
    null ones def 2."""
    lens = np.where(valid, lens, 0) if valid is not None else lens
    epr = np.maximum(lens, 1)
    E = int(epr.sum())
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(epr[:-1], out=starts[1:])
    rep = np.ones(E, dtype=np.uint8)
    rep[starts] = 0
    if entry_valid is None:
        de = np.full(E, 2, dtype=np.uint8)
    else:
        # scatter per-element validity into the entry stream
        de = np.full(E, 3, dtype=np.uint8)
        mask = np.ones(E, dtype=bool)
        mask[starts[lens == 0]] = False  # placeholder slots
        de[mask] = np.where(entry_valid, 3, 2).astype(np.uint8)
    ph = starts[lens == 0]  # placeholder entries
    if valid is None:
        de[ph] = 1
    else:
        de[ph] = np.where(valid[lens == 0], 1, 0).astype(np.uint8)
    return rep, de


def _page(page_type: int, payload: bytes, header_field: tuple,
          compression: str | None,
          precompressed: bytes = b"", crypto=None,
          page_ord: int = 0) -> tuple[bytes, int, int]:
    """→ (page bytes, uncompressed size, stored size). `precompressed`
    bytes (v2 level streams) are excluded from compression but counted
    in both sizes; page sizes are payload-only per the spec.

    crypto (pqcrypt.ChunkCrypto) switches to the modular-encryption
    layout: [page-header module][page-body module], where the header's
    compressed_page_size is the size of the ENTIRE body module (length
    prefix included) so any spec reader can slice it, the CRC is
    omitted (the GCM tags authenticate both parts), and the module
    AADs carry the page kind plus — for data pages — the ordinal."""
    import zlib

    raw_len = len(precompressed) + len(payload)
    if compression:
        payload = _compress(compression, payload)
    stored = len(precompressed) + len(payload)
    if crypto is not None:
        from parquet_go_spark.interop import pqcrypt

        is_dict = page_type == _DICTIONARY_PAGE
        hdr_t = (pqcrypt.DICTIONARY_PAGE_HEADER if is_dict
                 else pqcrypt.DATA_PAGE_HEADER)
        body_t = (pqcrypt.DICTIONARY_PAGE if is_dict
                  else pqcrypt.DATA_PAGE)
        body_mod = pqcrypt.encrypt_module(
            crypto.key,
            pqcrypt.module_aad(crypto.file_aad, body_t, crypto.rg,
                               crypto.col, page_ord),
            precompressed + payload)
        head = tc.struct([
            (1, tc.I32, page_type),
            (2, tc.I32, raw_len),
            (3, tc.I32, len(body_mod)),
            header_field,
        ])
        head_mod = pqcrypt.encrypt_module(
            crypto.key,
            pqcrypt.module_aad(crypto.file_aad, hdr_t, crypto.rg,
                               crypto.col, page_ord),
            head)
        return (head_mod + body_mod,
                len(head) + raw_len,
                len(head_mod) + len(body_mod))
    # page checksum: CRC32 of the page bytes as stored (everything after
    # the header), reinterpreted signed for the thrift i32 field; readers
    # with checksum verification on re-compute it
    c = zlib.crc32(precompressed + payload)
    crc = c - (1 << 32) if c >= (1 << 31) else c
    head = tc.struct([
        (1, tc.I32, page_type),
        (2, tc.I32, raw_len),
        (3, tc.I32, stored),
        (4, tc.I32, crc),
        header_field,
    ])
    return (head + precompressed + payload,
            len(head) + raw_len,
            len(head) + stored)


def _write_chunk(out: bytearray, spec: ColumnSpec, row_lo: int, row_hi: int,
                 compression: str | None, page_rows: int,
                 page_version: int, statistics: bool,
                 nn_cum: np.ndarray | None,
                 path: list[str] | None = None,
                 def_levels: np.ndarray | None = None,
                 def_width: int = 1, crypto=None) -> dict:
    """Append one column CHUNK (pages for rows [row_lo, row_hi)) to
    `out`; return a dict with everything the footer needs (the
    ColumnChunk struct is built later, once the page-index offsets are
    known).

    The default is a top-level leaf whose def stream (bit width 1) is
    derived from spec.validity. A STRUCT field leaf instead passes
    explicit `def_levels` (uint8 per row, e.g. 0 null struct / 1 field
    null / 2 present) with `def_width`; spec.validity must then be the
    value-presence mask (def == max)."""
    codec = spec.encoding
    vals = spec.values
    n_rows = row_hi - row_lo
    if spec.validity is not None:
        vlo_all, vhi_all = int(nn_cum[row_lo]), int(nn_cum[row_hi])
    else:
        vlo_all, vhi_all = row_lo, row_hi
    chunk_vals = _slice_values(vals, vlo_all, vhi_all)
    null_count = n_rows - (vhi_all - vlo_all)

    dict_offset = None
    encodings = {Codec.PLAIN, Codec.RLE, codec}
    total_raw = total_stored = 0

    indexes = None
    if codec == Codec.RLE_DICTIONARY:
        if spec.kind == Kind.BYTE_ARRAY:
            uniques, indexes = dictionary.factorize_byte_array(chunk_vals)
        elif np.asarray(chunk_vals).ndim == 2:
            uniques, indexes = dictionary.factorize_flba(chunk_vals)
        else:
            uniques, indexes = dictionary.factorize_numeric(
                np.asarray(chunk_vals))
        dict_offset = len(out)
        pg, raw, stored = _page(
            _DICTIONARY_PAGE,
            _encode_values(uniques, spec.kind, Codec.PLAIN, spec.flba_size),
            (7, tc.STRUCT, tc.struct([
                (1, tc.I32, len(uniques)), (2, tc.I32, Codec.PLAIN),
            ])),
            compression, crypto=crypto,
        )
        out += pg
        total_raw += raw
        total_stored += stored

    data_offset = len(out)
    pages = []  # per data page, for the ColumnIndex/OffsetIndex
    for lo in range(row_lo, row_hi, page_rows):
        hi = min(lo + page_rows, row_hi)
        if spec.validity is not None:
            vlo, vhi = int(nn_cum[lo]), int(nn_cum[hi])
        else:
            vlo, vhi = lo, hi
        page_vals = _slice_values(vals, vlo, vhi)
        if indexes is not None:
            body = rle.encode_dictionary_indexes(
                indexes[vlo - vlo_all:vhi - vlo_all])
        else:
            body = _encode_values(page_vals, spec.kind, codec,
                                  spec.flba_size)
        if def_levels is not None:
            page_def = def_levels[lo:hi]
        elif spec.validity is not None:
            page_def = spec.validity[lo:hi].astype(np.uint8)
        else:
            page_def = None
        if page_version == 2:
            dl = (rle.encode_levels(page_def, def_width)
                  if page_def is not None else b"")
            pg, raw, stored = _page(
                _DATA_PAGE_V2, body,
                (8, tc.STRUCT, tc.struct([
                    (1, tc.I32, hi - lo),
                    (2, tc.I32, (hi - lo) - (vhi - vlo)),
                    (3, tc.I32, hi - lo),
                    (4, tc.I32, codec),
                    (5, tc.I32, len(dl)),
                    (6, tc.I32, 0),
                    (7, tc.BOOL, bool(compression)),
                ])),
                compression, precompressed=dl,
                crypto=crypto, page_ord=len(pages),
            )
        else:
            payload = body
            if page_def is not None:
                dpay = rle.encode_hybrid(
                    page_def.astype(np.uint64), def_width)
                payload = (len(dpay).to_bytes(4, "little") + dpay + body)
            pg, raw, stored = _page(
                _DATA_PAGE, payload,
                (5, tc.STRUCT, tc.struct([
                    (1, tc.I32, hi - lo), (2, tc.I32, codec),
                    (3, tc.I32, Codec.RLE), (4, tc.I32, Codec.RLE),
                ])),
                compression, crypto=crypto, page_ord=len(pages),
            )
        page_off = len(out)
        out += pg
        total_raw += raw
        total_stored += stored
        lo_b, hi_b = _stat_bounds(page_vals, spec.kind, spec.logical)
        pages.append({
            "offset": page_off,
            "size": len(pg),
            "first_row": lo - row_lo,
            "null_count": (hi - lo) - (vhi - vlo),
            "null_page": vhi == vlo,
            "min": lo_b, "max": hi_b,
        })

    meta_fields = [
        (1, tc.I32, spec.kind),
        (2, tc.LIST, sorted(encodings), tc.I32),
        (3, tc.LIST, path or [spec.name], tc.BINARY),
        (4, tc.I32, _COMPRESSION[compression]),
        (5, tc.I64, n_rows),
        (6, tc.I64, total_raw),
        (7, tc.I64, total_stored),
        (9, tc.I64, data_offset),
        (11, tc.I64, dict_offset),
        (12, tc.STRUCT,
         _statistics_struct(chunk_vals, spec.kind, null_count,
                            spec.logical)
         if statistics else None),
    ]
    return {
        "meta_fields": meta_fields,
        "file_offset": dict_offset if dict_offset is not None else data_offset,
        "pages": pages,
        "total_raw": total_raw,
    }


def _write_list_chunk(out: bytearray, spec: ColumnSpec, row_lo: int,
                      row_hi: int, compression: str | None, page_rows: int,
                      page_version: int, statistics: bool,
                      elem_cum: np.ndarray,
                      path: list[str] | None = None,
                      entry_valid: np.ndarray | None = None,
                      val_cum: np.ndarray | None = None,
                      crypto=None) -> dict:
    """Append one repeated-leaf column chunk: flattened element pages
    with true rep/def level streams. Pages break on ROW boundaries, so
    a record never splits across pages. `elem_cum` maps row index →
    entry index (null rows contribute 0).

    The default is the 3-level LIST group's required element. For an
    OPTIONAL leaf under the repeated group (a MAP's value), pass
    `entry_valid` (per entry: value present?) and `val_cum` (entry
    index → null-stripped value index); def levels then run 0..3."""
    codec = spec.encoding
    vals = spec.values
    n_rows = row_hi - row_lo

    def vof(e: int) -> int:  # entry index → value index
        return int(val_cum[e]) if val_cum is not None else int(e)

    elo_all, ehi_all = int(elem_cum[row_lo]), int(elem_cum[row_hi])
    vlo_all, vhi_all = vof(elo_all), vof(ehi_all)
    chunk_vals = _slice_values(vals, vlo_all, vhi_all)

    dict_offset = None
    encodings = {Codec.PLAIN, Codec.RLE, codec}
    total_raw = total_stored = 0
    indexes = None
    if codec == Codec.RLE_DICTIONARY:
        if spec.kind == Kind.BYTE_ARRAY:
            uniques, indexes = dictionary.factorize_byte_array(chunk_vals)
        elif np.asarray(chunk_vals).ndim == 2:
            uniques, indexes = dictionary.factorize_flba(chunk_vals)
        else:
            uniques, indexes = dictionary.factorize_numeric(
                np.asarray(chunk_vals))
        dict_offset = len(out)
        pg, raw, stored = _page(
            _DICTIONARY_PAGE,
            _encode_values(uniques, spec.kind, Codec.PLAIN, spec.flba_size),
            (7, tc.STRUCT, tc.struct([
                (1, tc.I32, len(uniques)), (2, tc.I32, Codec.PLAIN),
            ])),
            compression, crypto=crypto,
        )
        out += pg
        total_raw += raw
        total_stored += stored

    max_def = 3 if entry_valid is not None else 2
    data_offset = len(out)
    pages = []
    total_entries = 0
    for lo in range(row_lo, row_hi, page_rows):
        hi = min(lo + page_rows, row_hi)
        elo, ehi = int(elem_cum[lo]), int(elem_cum[hi])
        vlo, vhi = vof(elo), vof(ehi)
        page_vals = _slice_values(vals, vlo, vhi)
        if indexes is not None:
            body = rle.encode_dictionary_indexes(
                indexes[vlo - vlo_all:vhi - vlo_all])
        else:
            body = _encode_values(page_vals, spec.kind, codec,
                                  spec.flba_size)
        rep, de = _list_levels(
            np.asarray(spec.lengths[lo:hi]),
            spec.validity[lo:hi] if spec.validity is not None else None,
            entry_valid[elo:ehi] if entry_valid is not None else None)
        n_ent = len(rep)
        total_entries += n_ent
        if page_version == 2:
            rl = rle.encode_levels(rep, 1)
            dl = rle.encode_levels(de, 2)
            pg, raw, stored = _page(
                _DATA_PAGE_V2, body,
                (8, tc.STRUCT, tc.struct([
                    (1, tc.I32, n_ent),
                    (2, tc.I32, int((de < max_def).sum())),
                    (3, tc.I32, hi - lo),
                    (4, tc.I32, codec),
                    (5, tc.I32, len(dl)),
                    (6, tc.I32, len(rl)),
                    (7, tc.BOOL, bool(compression)),
                ])),
                compression, precompressed=rl + dl,
                crypto=crypto, page_ord=len(pages),
            )
        else:
            rpay = rle.encode_hybrid(rep.astype(np.uint64), 1)
            dpay = rle.encode_hybrid(de.astype(np.uint64), 2)
            payload = (len(rpay).to_bytes(4, "little") + rpay
                       + len(dpay).to_bytes(4, "little") + dpay + body)
            pg, raw, stored = _page(
                _DATA_PAGE, payload,
                (5, tc.STRUCT, tc.struct([
                    (1, tc.I32, n_ent), (2, tc.I32, codec),
                    (3, tc.I32, Codec.RLE), (4, tc.I32, Codec.RLE),
                ])),
                compression, crypto=crypto, page_ord=len(pages),
            )
        page_off = len(out)
        out += pg
        total_raw += raw
        total_stored += stored
        lo_b, hi_b = _stat_bounds(page_vals, spec.kind, spec.logical)
        pages.append({
            "offset": page_off,
            "size": len(pg),
            "first_row": lo - row_lo,
            "null_count": n_ent - (vhi - vlo),
            "null_page": vhi == vlo,
            "min": lo_b, "max": hi_b,
        })

    meta_fields = [
        (1, tc.I32, spec.kind),
        (2, tc.LIST, sorted(encodings), tc.I32),
        (3, tc.LIST, path or [spec.name, "list", "element"], tc.BINARY),
        (4, tc.I32, _COMPRESSION[compression]),
        (5, tc.I64, total_entries),
        (6, tc.I64, total_raw),
        (7, tc.I64, total_stored),
        (9, tc.I64, data_offset),
        (11, tc.I64, dict_offset),
        (12, tc.STRUCT,
         _statistics_struct(chunk_vals, spec.kind,
                            total_entries - (vhi_all - vlo_all),
                            spec.logical)
         if statistics else None),
    ]
    return {
        "meta_fields": meta_fields,
        "file_offset": dict_offset if dict_offset is not None else data_offset,
        "pages": pages,
        "total_raw": total_raw,
    }


def _write_nested_chunk(out: bytearray, leaf: NestedLeaf, name: str,
                        row_lo: int, row_hi: int, compression: str | None,
                        page_rows: int, page_version: int,
                        statistics: bool, crypto=None) -> dict:
    """Append one arbitrarily nested leaf chunk: precomputed rep/def
    entry streams at their true widths, pages broken on ROW boundaries
    via `row_starts` (an entry with rep 0 starts a record, so a record
    never splits across pages — the same invariant the 1-level list
    writer keeps)."""
    codec = leaf.encoding
    vals = leaf.values
    n_rows = row_hi - row_lo
    rep_width = max(int(leaf.max_rep).bit_length(), 0)
    def_width = max(int(leaf.max_def).bit_length(), 0)

    elo_all = int(leaf.row_starts[row_lo])
    ehi_all = int(leaf.row_starts[row_hi])
    vlo_all = int(leaf.val_cum[elo_all])
    vhi_all = int(leaf.val_cum[ehi_all])
    chunk_vals = _slice_values(vals, vlo_all, vhi_all)

    dict_offset = None
    encodings = {Codec.PLAIN, Codec.RLE, codec}
    total_raw = total_stored = 0
    indexes = None
    if codec == Codec.RLE_DICTIONARY:
        if leaf.kind == Kind.BYTE_ARRAY:
            uniques, indexes = dictionary.factorize_byte_array(chunk_vals)
        elif np.asarray(chunk_vals).ndim == 2:
            uniques, indexes = dictionary.factorize_flba(chunk_vals)
        else:
            uniques, indexes = dictionary.factorize_numeric(
                np.asarray(chunk_vals))
        dict_offset = len(out)
        pg, raw, stored = _page(
            _DICTIONARY_PAGE,
            _encode_values(uniques, leaf.kind, Codec.PLAIN, leaf.flba_size),
            (7, tc.STRUCT, tc.struct([
                (1, tc.I32, len(uniques)), (2, tc.I32, Codec.PLAIN),
            ])),
            compression, crypto=crypto,
        )
        out += pg
        total_raw += raw
        total_stored += stored

    data_offset = len(out)
    pages = []
    total_entries = 0
    for lo in range(row_lo, row_hi, page_rows):
        hi = min(lo + page_rows, row_hi)
        elo, ehi = int(leaf.row_starts[lo]), int(leaf.row_starts[hi])
        vlo, vhi = int(leaf.val_cum[elo]), int(leaf.val_cum[ehi])
        page_vals = _slice_values(vals, vlo, vhi)
        if indexes is not None:
            body = rle.encode_dictionary_indexes(
                indexes[vlo - vlo_all:vhi - vlo_all])
        else:
            body = _encode_values(page_vals, leaf.kind, codec,
                                  leaf.flba_size)
        rep = leaf.rep[elo:ehi]
        de = leaf.de[elo:ehi]
        n_ent = ehi - elo
        total_entries += n_ent
        if page_version == 2:
            rl = (rle.encode_levels(rep, rep_width)
                  if leaf.max_rep else b"")
            dl = (rle.encode_levels(de, def_width)
                  if leaf.max_def else b"")
            pg, raw, stored = _page(
                _DATA_PAGE_V2, body,
                (8, tc.STRUCT, tc.struct([
                    (1, tc.I32, n_ent),
                    (2, tc.I32, int(n_ent - (vhi - vlo))),
                    (3, tc.I32, hi - lo),
                    (4, tc.I32, codec),
                    (5, tc.I32, len(dl)),
                    (6, tc.I32, len(rl)),
                    (7, tc.BOOL, bool(compression)),
                ])),
                compression, precompressed=rl + dl,
                crypto=crypto, page_ord=len(pages),
            )
        else:
            payload = b""
            if leaf.max_rep:
                rpay = rle.encode_hybrid(rep.astype(np.uint64), rep_width)
                payload += len(rpay).to_bytes(4, "little") + rpay
            if leaf.max_def:
                dpay = rle.encode_hybrid(de.astype(np.uint64), def_width)
                payload += len(dpay).to_bytes(4, "little") + dpay
            payload += body
            pg, raw, stored = _page(
                _DATA_PAGE, payload,
                (5, tc.STRUCT, tc.struct([
                    (1, tc.I32, n_ent), (2, tc.I32, codec),
                    (3, tc.I32, Codec.RLE), (4, tc.I32, Codec.RLE),
                ])),
                compression, crypto=crypto, page_ord=len(pages),
            )
        page_off = len(out)
        out += pg
        total_raw += raw
        total_stored += stored
        lo_b, hi_b = _stat_bounds(page_vals, leaf.kind, leaf.logical)
        pages.append({
            "offset": page_off,
            "size": len(pg),
            "first_row": lo - row_lo,
            "null_count": n_ent - (vhi - vlo),
            "null_page": vhi == vlo,
            "min": lo_b, "max": hi_b,
        })

    meta_fields = [
        (1, tc.I32, leaf.kind),
        (2, tc.LIST, sorted(encodings), tc.I32),
        (3, tc.LIST, [name] + list(leaf.path), tc.BINARY),
        (4, tc.I32, _COMPRESSION[compression]),
        (5, tc.I64, total_entries),
        (6, tc.I64, total_raw),
        (7, tc.I64, total_stored),
        (9, tc.I64, data_offset),
        (11, tc.I64, dict_offset),
        (12, tc.STRUCT,
         _statistics_struct(chunk_vals, leaf.kind,
                            total_entries - (vhi_all - vlo_all),
                            leaf.logical)
         if statistics else None),
    ]
    return {
        "meta_fields": meta_fields,
        "file_offset": dict_offset if dict_offset is not None else data_offset,
        "pages": pages,
        "total_raw": total_raw,
    }


def _boundary_order(pages: list[dict], kind: int) -> int:
    """BoundaryOrder over non-null pages: 1 ASC, 0 UNORDERED (always a
    safe claim per the spec). Numeric bounds must be compared as VALUES
    — their little-endian stat bytes do not sort like the numbers —
    while BYTE_ARRAY/FLBA bounds compare in byte space (the column's
    unsigned-lexicographic sort order)."""
    mins = [p["min"] for p in pages if not p["null_page"]]
    maxs = [p["max"] for p in pages if not p["null_page"]]
    if not mins or any(m is None for m in mins + maxs):
        return 0
    if kind in _STAT_FMT:
        f = _STAT_FMT[kind]
        mins = [_struct.unpack(f, m)[0] for m in mins]
        maxs = [_struct.unpack(f, m)[0] for m in maxs]
    elif kind == Kind.BOOLEAN:
        mins, maxs = [m[0] for m in mins], [m[0] for m in maxs]
    if all(a <= b for a, b in zip(mins, mins[1:])) and \
       all(a <= b for a, b in zip(maxs, maxs[1:])):
        return 1
    return 0


def _page_index_structs(chunk: dict, kind: int) -> tuple[bytes | None, bytes]:
    """(ColumnIndex or None, OffsetIndex) thrift structs for one column
    chunk. ColumnIndex is omitted when any non-null page lacks a
    representable bound (all-0xFF max truncation)."""
    pages = chunk["pages"]
    column_index = None
    if all(p["null_page"] or (p["min"] is not None and p["max"] is not None)
           for p in pages):
        column_index = tc.struct([
            (1, tc.LIST, [p["null_page"] for p in pages], tc.BOOL),
            (2, tc.LIST,
             [b"" if p["null_page"] else p["min"] for p in pages], tc.BINARY),
            (3, tc.LIST,
             [b"" if p["null_page"] else p["max"] for p in pages], tc.BINARY),
            (4, tc.I32, _boundary_order(pages, kind)),
            (5, tc.LIST, [p["null_count"] for p in pages], tc.I64),
        ])
    offset_index = tc.struct([
        (1, tc.LIST, [
            tc.struct([
                (1, tc.I64, p["offset"]),
                (2, tc.I32, p["size"]),
                (3, tc.I64, p["first_row"]),
            ]) for p in pages
        ], tc.STRUCT),
    ])
    return column_index, offset_index


def write_table(path: str, columns: list[ColumnSpec], *,
                compression: str | None = None,
                page_rows: int = 65536,
                row_group_rows: int | None = None,
                page_version: int = 1,
                statistics: bool = True,
                page_index: bool = True,
                sorting_columns: list[int] | None = None,
                bloom_columns: list[str] | None = None,
                bloom_fpp: float = 0.01,
                encryption=None) -> dict:
    """Write one parquet file. Returns a summary
    {n_rows, file_bytes, row_groups, encodings: {col: codec id}}.

    bloom_columns: leaf names (dotted for struct fields) to write
    split-block bloom filters for, per row group — XXH64 spec hashing,
    built from the chunk's distinct values (the reference builds from
    the dictionary, writer.go:2089-2095 — same filter, inserts are
    idempotent). Boolean and repeated (LIST/MAP) leaves are skipped.

    encryption (pqcrypt.FileEncryption): parquet modular encryption,
    AES_GCM_V1 — the write-side mirror of the reference's
    WithEncryption (encrypt.go EncryptionConfig, writer.go:2452-2479).
    Every leaf is encrypted with the footer key unless it has its own
    entry in column_keys (→ ENCRYPTION_WITH_COLUMN_KEY with the
    ColumnMetaData in its own encrypted module) or is opted out via
    plaintext_columns. Page indexes and bloom filters of encrypted
    columns are written as encrypted modules. plaintext_footer=True
    keeps a readable footer (statistics stripped from the visible
    ColumnMetaData) signed with a 28-byte GCM tag under PAR1 magic;
    the default writes the PARE encrypted-footer layout. Both layouts
    decrypt through our pqreader AND through pyarrow (use
    pqcrypt.wrapped_encryption for PKMT1 key material a pyarrow
    CryptoFactory resolves)."""
    if not columns:
        raise ValueError("no columns")
    if page_version not in (1, 2):
        raise ValueError("page_version must be 1 or 2")
    file_unique = file_aad = None
    if encryption is not None:
        from parquet_go_spark.interop import pqcrypt

        if not isinstance(encryption, pqcrypt.FileEncryption):
            raise TypeError(
                "encryption must be a pqcrypt.FileEncryption")
        file_unique = encryption.file_unique()
        file_aad = bytes(encryption.aad_prefix) + file_unique
    n_rows = None
    for c in columns:
        if isinstance(c, NestedColumnSpec):
            rows = c.n_rows
        elif isinstance(c, StructColumnSpec):
            if c.validity is not None:
                rows = len(c.validity)
            else:
                f0 = c.fields[0][1]
                rows = (len(f0.validity) if f0.validity is not None
                        else len(f0.values))
        elif isinstance(c, MapColumnSpec) or c.lengths is not None:
            rows = len(c.lengths)
        elif c.validity is not None:
            rows = len(c.validity)
        else:
            rows = len(c.values)
        if n_rows is None:
            n_rows = rows
        elif rows != n_rows:
            raise ValueError(f"column {c.name}: {rows} rows, expected {n_rows}")
        if isinstance(c, NestedColumnSpec):
            for lf in c.leaves:
                if len(lf.row_starts) != rows + 1:
                    raise ValueError(
                        f"nested column {c.name}/{'.'.join(lf.path)}: "
                        f"row_starts has {len(lf.row_starts)} slots for "
                        f"{rows} rows")
            continue
        if isinstance(c, StructColumnSpec):
            n_present = (int(c.validity.sum())
                         if c.validity is not None else rows)
            for fname, part in c.fields:
                if part.validity is None:
                    if len(part.values) != n_present:
                        raise ValueError(
                            f"struct column {c.name}.{fname}: "
                            f"{len(part.values)} values for {n_present} "
                            "present structs")
                    continue
                if len(part.validity) != rows:
                    raise ValueError(
                        f"struct column {c.name}.{fname}: validity has "
                        f"{len(part.validity)} rows, expected {rows}")
                if c.validity is not None and \
                        bool(np.any(part.validity & ~c.validity)):
                    raise ValueError(
                        f"struct column {c.name}.{fname}: field marked "
                        "present inside a null struct")
                if len(part.values) != int(part.validity.sum()):
                    raise ValueError(
                        f"struct column {c.name}.{fname}: values must be "
                        "null-stripped")
        elif isinstance(c, MapColumnSpec):
            lens = np.asarray(c.lengths, dtype=np.int64)
            eff = (np.where(c.validity, lens, 0)
                   if c.validity is not None else lens)
            n_ent = int(eff.sum())
            if len(c.key.values) != n_ent:
                raise ValueError(
                    f"map column {c.name}: {len(c.key.values)} keys "
                    f"for {n_ent} entries")
            if c.entry_validity is not None:
                if len(c.entry_validity) != n_ent:
                    raise ValueError(
                        f"map column {c.name}: entry_validity has "
                        f"{len(c.entry_validity)} slots for {n_ent} entries")
                if len(c.value.values) != int(c.entry_validity.sum()):
                    raise ValueError(
                        f"map column {c.name}: values must be null-stripped")
            elif len(c.value.values) != n_ent:
                raise ValueError(
                    f"map column {c.name}: {len(c.value.values)} values "
                    f"for {n_ent} entries")
        elif c.lengths is None and c.validity is not None and \
                len(c.values) != int(c.validity.sum()):
            raise ValueError(f"column {c.name}: values must be null-stripped")

    # expand top-level columns into LEAF chunks (a MAP contributes two:
    # required key + optional value sharing the entry lengths/levels)
    leaves = []
    used = {}
    first_leaf = []  # top-level column idx → its first leaf idx
    for c in columns:
        first_leaf.append(len(leaves))
        if isinstance(c, NestedColumnSpec):
            for lf in c.leaves:
                if lf.encoding is None:
                    lf.encoding = _default_encoding(lf)
                used[".".join([c.name] + list(lf.path))] = lf.encoding
                leaves.append({
                    "nested": lf, "spec": None,
                    "path": [c.name] + list(lf.path), "repeated": False,
                    "cum": None, "entry_valid": None, "val_cum": None,
                })
            continue
        if isinstance(c, StructColumnSpec):
            sv = c.validity
            for fname, part in c.fields:
                fv = part.validity
                max_def = ((1 if sv is not None else 0)
                           + (1 if fv is not None else 0))
                pres = fv if fv is not None else sv
                de = None
                if max_def:
                    de = np.full(n_rows, max_def, dtype=np.uint8)
                    if fv is not None:
                        de[~fv] = max_def - 1
                    if sv is not None:
                        de[~sv] = 0
                enc = (part.encoding if part.encoding is not None
                       else _default_encoding(part))
                used[f"{c.name}.{fname}"] = enc
                spec = ColumnSpec(fname, part.kind, part.values, pres,
                                  part.flba_size, enc, part.logical)
                leaves.append({
                    "spec": spec,
                    "cum": (np.concatenate(
                        [[0], np.cumsum(pres.astype(np.int64))])
                        if pres is not None else None),
                    "repeated": False,
                    "path": [c.name, fname],
                    "entry_valid": None, "val_cum": None,
                    "def_levels": de,
                    "def_width": 2 if max_def == 2 else 1,
                })
            continue
        if isinstance(c, MapColumnSpec):
            lens = np.asarray(c.lengths, dtype=np.int64)
            eff = (np.where(c.validity, lens, 0)
                   if c.validity is not None else lens)
            ecum = np.concatenate([[0], np.cumsum(eff)])
            for role, part in (("key", c.key), ("value", c.value)):
                enc = (part.encoding if part.encoding is not None
                       else _default_encoding(part))
                used[f"{c.name}.{role}"] = enc
                spec = ColumnSpec(role, part.kind, part.values, c.validity,
                                  part.flba_size, enc, part.logical, eff)
                ev = c.entry_validity if role == "value" else None
                leaves.append({
                    "spec": spec, "cum": ecum, "repeated": True,
                    "path": [c.name, "key_value", role],
                    "entry_valid": ev,
                    "val_cum": (np.concatenate(
                        [[0], np.cumsum(ev.astype(np.int64))])
                        if ev is not None else None),
                })
            continue
        enc = c.encoding if c.encoding is not None else _default_encoding(c)
        used[c.name] = enc
        spec = ColumnSpec(c.name, c.kind, c.values, c.validity,
                          c.flba_size, enc, c.logical, c.lengths)
        if c.lengths is not None:
            lens = np.asarray(c.lengths, dtype=np.int64)
            if c.validity is not None:
                lens = np.where(c.validity, lens, 0)
            cum = np.concatenate([[0], np.cumsum(lens)])
        elif c.validity is not None:
            cum = np.concatenate(
                [[0], np.cumsum(c.validity.astype(np.int64))])
        else:
            cum = None
        leaves.append({"spec": spec, "cum": cum,
                       "repeated": c.lengths is not None,
                       "path": None, "entry_valid": None, "val_cum": None})

    # dotted leaf names — the column_keys / plaintext_columns /
    # bloom_columns addressing space
    for lf in leaves:
        if lf.get("path"):
            lf["dotted"] = ".".join(lf["path"])
        elif lf.get("nested") is not None:
            lf["dotted"] = ".".join(lf["nested"].path)
        else:
            lf["dotted"] = lf["spec"].name

    out = bytearray(b"PARE" if encryption is not None
                    and not encryption.plaintext_footer else _MAGIC)
    rg_rows = row_group_rows or max(n_rows, 1)
    groups = []  # [(rows, byte_size, [chunk dict, ...])]
    for rg_i, g_lo in enumerate(range(0, max(n_rows, 1), rg_rows)):
        g_hi = min(g_lo + rg_rows, n_rows)
        if g_hi <= g_lo and n_rows > 0:
            break
        cryptos = [None] * len(leaves)
        if encryption is not None:
            from parquet_go_spark.interop import pqcrypt

            cryptos = [
                None if (k := encryption.key_for(lf["dotted"])) is None
                else pqcrypt.ChunkCrypto(k, file_aad, rg_i, col_i)
                for col_i, lf in enumerate(leaves)
            ]
        chunks = [
            _write_nested_chunk(
                out, lf["nested"], lf["path"][0], g_lo, g_hi, compression,
                page_rows, page_version, statistics, crypto=cr)
            if lf.get("nested") is not None else
            _write_list_chunk(
                out, lf["spec"], g_lo, g_hi, compression, page_rows,
                page_version, statistics, lf["cum"], path=lf["path"],
                entry_valid=lf["entry_valid"], val_cum=lf["val_cum"],
                crypto=cr)
            if lf["repeated"] else
            _write_chunk(
                out, lf["spec"], g_lo, g_hi, compression, page_rows,
                page_version, statistics, lf["cum"], path=lf["path"],
                def_levels=lf.get("def_levels"),
                def_width=lf.get("def_width", 1), crypto=cr)
            for lf, cr in zip(leaves, cryptos)
        ]
        for ch, cr, lf in zip(chunks, cryptos, leaves):
            ch["crypto"] = cr
            ch["dotted"] = lf["dotted"]
        # RowGroup.total_byte_size is the UNCOMPRESSED data size per the
        # spec, not the stored bytes
        groups.append((g_lo, g_hi,
                       sum(ch["total_raw"] for ch in chunks), chunks))
        if n_rows == 0:
            break

    # bloom filters go between the data pages and the page indexes
    # (parquet-mr's layout); ColumnMetaData records offset+length
    if bloom_columns:
        wanted = set(bloom_columns)
        for g_lo, g_hi, _, chunks in groups:
            for ch, lf in zip(chunks, leaves):
                spec = lf["spec"]
                name = (".".join(lf["path"]) if lf["path"]
                        else spec.name)
                if (name not in wanted or lf["repeated"]
                        or lf.get("nested") is not None
                        or spec.kind == Kind.BOOLEAN):
                    continue
                cum = lf["cum"]
                vlo, vhi = ((int(cum[g_lo]), int(cum[g_hi]))
                            if cum is not None else (g_lo, g_hi))
                vals = _slice_values(spec.values, vlo, vhi)
                hashes = pqbloom.spec_hashes(
                    vals, spec.kind, flba_size=spec.flba_size)
                cr = ch.get("crypto")
                if cr is not None:
                    from parquet_go_spark.interop import pqcrypt

                    header, bits = pqbloom.bloom_parts(
                        hashes, fpp=bloom_fpp)
                    blob = pqcrypt.encrypt_module(
                        cr.key, pqcrypt.module_aad(
                            cr.file_aad, pqcrypt.BLOOM_HEADER,
                            cr.rg, cr.col), header)
                    blob += pqcrypt.encrypt_module(
                        cr.key, pqcrypt.module_aad(
                            cr.file_aad, pqcrypt.BLOOM_BITSET,
                            cr.rg, cr.col), bits)
                else:
                    blob = pqbloom.bloom_blob(hashes, fpp=bloom_fpp)
                ch["meta_fields"].append((14, tc.I64, len(out)))
                ch["meta_fields"].append((15, tc.I32, len(blob)))
                out += blob

    # page indexes live between the pages and the footer; their offsets
    # are recorded per ColumnChunk (fields 6/7 column index, 4/5 offset
    # index), which is why ColumnChunk structs are only built now
    if page_index:
        for _, _, _, chunks in groups:
            for ch, lf in zip(chunks, leaves):
                lkind = (lf["nested"].kind if lf.get("nested") is not None
                         else lf["spec"].kind)
                ci, oi = _page_index_structs(ch, lkind)
                cr = ch.get("crypto")
                if cr is not None:
                    from parquet_go_spark.interop import pqcrypt

                    if ci is not None:
                        ci = pqcrypt.encrypt_module(
                            cr.key, pqcrypt.module_aad(
                                cr.file_aad, pqcrypt.COLUMN_INDEX,
                                cr.rg, cr.col), ci)
                    oi = pqcrypt.encrypt_module(
                        cr.key, pqcrypt.module_aad(
                            cr.file_aad, pqcrypt.OFFSET_INDEX,
                            cr.rg, cr.col), oi)
                if ci is not None:
                    ch["ci_off"], ch["ci_len"] = len(out), len(ci)
                    out += ci
                ch["oi_off"], ch["oi_len"] = len(out), len(oi)
                out += oi

    plaintext_mode = encryption is not None and encryption.plaintext_footer
    row_groups = []
    for rg_i, (g_lo, g_hi, g_bytes, chunks) in enumerate(groups):
        chunk_structs = []
        for ch in chunks:
            cr = ch.get("crypto")
            meta_bytes = tc.struct(ch["meta_fields"])
            fields = [
                (2, tc.I64, ch["file_offset"]),
                (4, tc.I64, ch.get("oi_off")),
                (5, tc.I32, ch.get("oi_len")),
                (6, tc.I64, ch.get("ci_off")),
                (7, tc.I32, ch.get("ci_len")),
            ]
            if cr is None:
                fields.append((3, tc.STRUCT, meta_bytes))
            else:
                from parquet_go_spark.interop import pqcrypt

                dotted = ch["dotted"]
                own_key = dotted in encryption.column_keys
                if own_key:
                    # ENCRYPTION_WITH_COLUMN_KEY {path_in_schema,
                    # key_metadata}; the ColumnMetaData travels only as
                    # its own encrypted module (field 9) — never
                    # plaintext inside an encrypted footer, stripped
                    # when the footer itself is plaintext
                    fields.append((8, tc.STRUCT, tc.struct([
                        (2, tc.STRUCT, tc.struct([
                            (1, tc.LIST, dotted.split("."), tc.BINARY),
                            (2, tc.BINARY,
                             encryption.column_key_metadata.get(dotted)),
                        ])),
                    ])))
                else:
                    # ENCRYPTION_WITH_FOOTER_KEY (empty struct)
                    fields.append((8, tc.STRUCT, tc.struct([
                        (1, tc.STRUCT, tc.struct([])),
                    ])))
                if own_key or plaintext_mode:
                    fields.append((9, tc.BINARY, pqcrypt.encrypt_module(
                        cr.key, pqcrypt.module_aad(
                            cr.file_aad, pqcrypt.COLUMN_METADATA,
                            cr.rg, cr.col), meta_bytes)))
                if plaintext_mode:
                    # visible copy: statistics stripped (they would
                    # leak plaintext bounds); the full metadata rides
                    # in field 9 and is restored after decryption
                    fields.append((3, tc.STRUCT, tc.struct(
                        [f for f in ch["meta_fields"] if f[0] != 12])))
                elif not own_key:
                    # footer-key column inside an ENCRYPTED footer:
                    # the plain metadata is already confidential
                    fields.append((3, tc.STRUCT, meta_bytes))
            chunk_structs.append(tc.struct(fields))
        rg_fields = [
            (1, tc.LIST, chunk_structs, tc.STRUCT),
            (2, tc.I64, g_bytes),
            (3, tc.I64, g_hi - g_lo),
            # ordinal (i16): encrypted readers (parquet-cpp/-mr) key
            # every module AAD on THIS field, not the positional index
            (7, tc.I16, rg_i),
        ]
        if sorting_columns:
            # SortingColumn{column_idx, descending=false, nulls_first=false};
            # column_idx indexes the row group's LEAF chunks, so translate
            # the caller's top-level column indexes
            rg_fields.append((4, tc.LIST, [
                tc.struct([(1, tc.I32, first_leaf[i]), (2, tc.BOOL, False),
                           (3, tc.BOOL, False)])
                for i in sorting_columns
            ], tc.STRUCT))
        row_groups.append(tc.struct(rg_fields))

    schema = [tc.struct([
        (4, tc.BINARY, "schema"), (5, tc.I32, len(columns)),
    ])]
    for c in columns:
        if isinstance(c, NestedColumnSpec):
            schema.extend(c.schema_elements)
            continue
        if isinstance(c, StructColumnSpec):
            # <optional|required> group <name> { one leaf per field }
            schema.append(tc.struct([
                (3, tc.I32, 1 if c.validity is not None else 0),
                (4, tc.BINARY, c.name),
                (5, tc.I32, len(c.fields)),
            ]))
            for fname, part in c.fields:
                schema.append(tc.struct([
                    (1, tc.I32, part.kind),
                    (2, tc.I32, part.flba_size
                     if part.kind == Kind.FIXED_LEN_BYTE_ARRAY else None),
                    (3, tc.I32, 1 if part.validity is not None else 0),
                    (4, tc.BINARY, fname),
                    *_logical_fields(part.logical),
                ]))
        elif isinstance(c, MapColumnSpec):
            # optional group <name> (MAP) { repeated group key_value {
            #   required K key; <optional|required> V value } }
            # (ConvertedType MAP = 1; the inner group carries no
            # annotation per the modern spec)
            schema.append(tc.struct([
                (3, tc.I32, 1), (4, tc.BINARY, c.name),
                (5, tc.I32, 1), (6, tc.I32, 1),
            ]))
            schema.append(tc.struct([
                (3, tc.I32, 2), (4, tc.BINARY, "key_value"), (5, tc.I32, 2),
            ]))
            for role, part, rep in (("key", c.key, 0),
                                    ("value", c.value,
                                     1 if c.entry_validity is not None
                                     else 0)):
                schema.append(tc.struct([
                    (1, tc.I32, part.kind),
                    (2, tc.I32, part.flba_size
                     if part.kind == Kind.FIXED_LEN_BYTE_ARRAY else None),
                    (3, tc.I32, rep),
                    (4, tc.BINARY, role),
                    *_logical_fields(part.logical),
                ]))
        elif c.lengths is not None:
            # 3-level LIST group (always optional so the def scheme is
            # the constant 0=null/1=empty/2=element):
            # optional group <name> (LIST) { repeated group list {
            #   required <type> element } }
            schema.append(tc.struct([
                (3, tc.I32, 1), (4, tc.BINARY, c.name),
                (5, tc.I32, 1), (6, tc.I32, 3),  # ConvertedType LIST
            ]))
            schema.append(tc.struct([
                (3, tc.I32, 2), (4, tc.BINARY, "list"), (5, tc.I32, 1),
            ]))
            schema.append(tc.struct([
                (1, tc.I32, c.kind),
                (2, tc.I32, c.flba_size
                 if c.kind == Kind.FIXED_LEN_BYTE_ARRAY else None),
                (3, tc.I32, 0),
                (4, tc.BINARY, "element"),
                *_logical_fields(c.logical),
            ]))
        else:
            schema.append(tc.struct([
                (1, tc.I32, c.kind),
                (2, tc.I32, c.flba_size
                 if c.kind == Kind.FIXED_LEN_BYTE_ARRAY else None),
                (3, tc.I32, 1 if c.validity is not None else 0),
                (4, tc.BINARY, c.name),
                *_logical_fields(c.logical),
            ]))

    # ColumnOrder = union{1: TypeDefinedOrder{}} per leaf — readers only
    # trust min_value/max_value statistics when column_orders is declared
    type_order = tc.struct([(1, tc.STRUCT, tc.struct([]))])
    fmd_fields = [
        (1, tc.I32, 1),
        (2, tc.LIST, schema, tc.STRUCT),
        (3, tc.I64, n_rows),
        (4, tc.LIST, row_groups, tc.STRUCT),
        (6, tc.BINARY, "parquet_go_spark interop writer"),
        (7, tc.LIST, [type_order] * len(leaves), tc.STRUCT),
    ]
    if encryption is None:
        footer = tc.struct(fmd_fields)
        out += footer
        out += len(footer).to_bytes(4, "little")
        out += _MAGIC
    else:
        from parquet_go_spark.interop import pqcrypt

        supply = bool(encryption.aad_prefix) \
            and not encryption.store_aad_prefix
        algo = tc.struct([(1, tc.STRUCT, tc.struct([
            (1, tc.BINARY, encryption.aad_prefix
             if encryption.aad_prefix and encryption.store_aad_prefix
             else None),
            (2, tc.BINARY, file_unique),
            (3, tc.BOOL, supply),
        ]))])
        if plaintext_mode:
            # PAR1 + readable footer carrying the algorithm (field 8)
            # and signing-key metadata (field 9), then a 28-byte
            # [nonce][GCM tag] over the footer bytes
            fmd_fields.append((8, tc.STRUCT, algo))
            fmd_fields.append(
                (9, tc.BINARY, encryption.footer_key_metadata))
            footer = tc.struct(fmd_fields)
            sig = pqcrypt.sign_footer(
                encryption.footer_key, file_aad, footer)
            out += footer + sig
            out += (len(footer) + len(sig)).to_bytes(4, "little")
            out += _MAGIC
        else:
            # PARE: plaintext FileCryptoMetaData, then the whole
            # FileMetaData as one encrypted module
            footer = tc.struct(fmd_fields)
            fcm = tc.struct([
                (1, tc.STRUCT, algo),
                (2, tc.BINARY, encryption.footer_key_metadata),
            ])
            mod = pqcrypt.encrypt_module(
                encryption.footer_key,
                pqcrypt.module_aad(file_aad, pqcrypt.FOOTER), footer)
            out += fcm + mod
            out += (len(fcm) + len(mod)).to_bytes(4, "little")
            out += b"PARE"
    with open(path, "wb") as f:
        f.write(out)
    return {"n_rows": n_rows, "file_bytes": len(out),
            "row_groups": len(row_groups), "encodings": used}
