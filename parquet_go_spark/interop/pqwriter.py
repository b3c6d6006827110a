"""Write real .parquet files from our codec payloads.

The engine's page payloads ARE parquet-spec encodings (the golden-decode
suite proves byte-compatibility in the read direction against
parquet-mr/impala-written pages); this module adds the file container —
thrift compact page headers + footer metadata per the public
parquet-format spec — so pyarrow, DuckDB, and Spark's own parquet-mr
reader validate our encoded bytes end-to-end. Mirrors the reference
being a full parquet writer (writer.go) rather than a private format.

Scope: flat schemas, required/optional leaves, one row group per file,
data page v1, encodings PLAIN / RLE(boolean) / DELTA_BINARY_PACKED /
DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY / BYTE_STREAM_SPLIT /
RLE_DICTIONARY, page compression none/snappy/gzip/zstd.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

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
from parquet_go_spark.interop import thriftc as tc

# parquet-format PageType / CompressionCodec / ConvertedType enums
_DATA_PAGE = 0
_DICTIONARY_PAGE = 2
_COMPRESSION = {None: 0, "snappy": 1, "gzip": 2, "brotli": 4, "zstd": 6}
_CONVERTED = {"string": 0, "date": 6, "timestamp_micros": 10}

_MAGIC = b"PAR1"


@dataclass
class ColumnSpec:
    """One leaf column. `values` holds only non-null values (ndarray /
    ByteArrays / bool ndarray); `validity` (bool ndarray over all rows)
    marks an optional column. encoding=None picks a default per kind."""

    name: str
    kind: int
    values: object
    validity: np.ndarray | None = None
    flba_size: int | None = None
    encoding: int | None = None
    logical: str | None = None  # "string" | "date"


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
        uniq = len(set(spec.values.to_pylist())) if isinstance(
            spec.values, ByteArrays
        ) else len(np.unique(np.asarray(spec.values)))
        if uniq * 2 <= n:
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


def _def_levels_section(validity: np.ndarray) -> bytes:
    """V1 def-level section: 4-byte LE length + RLE hybrid, bit width 1."""
    payload = rle.encode_hybrid(validity.astype(np.uint64), 1)
    return len(payload).to_bytes(4, "little") + payload


def _page(page_type: int, payload: bytes, header_field: tuple,
          compression: str | None) -> tuple[bytes, int, int]:
    """→ (header+payload bytes, uncompressed size, compressed size),
    sizes counted the parquet way (header + payload)."""
    raw_len = len(payload)
    if compression:
        payload = _outer(compression).compress(payload, asbytes=True)
    head = tc.struct([
        (1, tc.I32, page_type),
        (2, tc.I32, raw_len),
        (3, tc.I32, len(payload)),
        header_field,
    ])
    return (head + payload,
            len(head) + raw_len,
            len(head) + len(payload))


def _write_column(out: bytearray, spec: ColumnSpec, n_rows: int,
                  compression: str | None, page_rows: int) -> bytes:
    """Append the column chunk's pages to `out`; return the ColumnChunk
    thrift struct."""
    codec = spec.encoding
    vals = spec.values
    if spec.kind == Kind.BYTE_ARRAY and not isinstance(vals, ByteArrays):
        vals = ByteArrays.from_pylist(list(vals))

    dict_offset = None
    encodings = {Codec.PLAIN, Codec.RLE}
    total_raw = total_comp = 0

    indexes = None
    if codec == Codec.RLE_DICTIONARY:
        if spec.kind == Kind.BYTE_ARRAY:
            uniques, indexes = dictionary.factorize_byte_array(vals)
        else:
            uniques, indexes = dictionary.factorize_numeric(np.asarray(vals))
        dict_offset = len(out)
        pg, raw, comp = _page(
            _DICTIONARY_PAGE,
            _encode_values(uniques, spec.kind, Codec.PLAIN, spec.flba_size),
            (7, tc.STRUCT, tc.struct([
                (1, tc.I32, len(uniques)), (2, tc.I32, Codec.PLAIN),
            ])),
            compression,
        )
        out += pg
        total_raw += raw
        total_comp += comp
    encodings.add(codec)

    # optional columns: map page row ranges → non-null value ranges
    nn_cum = None
    if spec.validity is not None:
        nn_cum = np.concatenate(
            [[0], np.cumsum(spec.validity.astype(np.int64))])

    data_offset = len(out)
    for lo in range(0, n_rows, page_rows):
        hi = min(lo + page_rows, n_rows)
        if spec.validity is not None:
            vlo, vhi = int(nn_cum[lo]), int(nn_cum[hi])
        else:
            vlo, vhi = lo, hi
        if indexes is not None:
            body = rle.encode_dictionary_indexes(indexes[vlo:vhi])
        else:
            body = _encode_values(_slice_values(vals, vlo, vhi),
                                  spec.kind, codec, spec.flba_size)
        payload = body
        if spec.validity is not None:
            payload = _def_levels_section(spec.validity[lo:hi]) + body
        pg, raw, comp = _page(
            _DATA_PAGE, payload,
            (5, tc.STRUCT, tc.struct([
                (1, tc.I32, hi - lo), (2, tc.I32, codec),
                (3, tc.I32, Codec.RLE), (4, tc.I32, Codec.RLE),
            ])),
            compression,
        )
        out += pg
        total_raw += raw
        total_comp += comp

    meta = tc.struct([
        (1, tc.I32, spec.kind),
        (2, tc.LIST, sorted(encodings), tc.I32),
        (3, tc.LIST, [spec.name], tc.BINARY),
        (4, tc.I32, _COMPRESSION[compression]),
        (5, tc.I64, n_rows),
        (6, tc.I64, total_raw),
        (7, tc.I64, total_comp),
        (9, tc.I64, data_offset),
        (11, tc.I64, dict_offset),
    ])
    return tc.struct([
        (2, tc.I64, dict_offset if dict_offset is not None else data_offset),
        (3, tc.STRUCT, meta),
    ])


def write_table(path: str, columns: list[ColumnSpec], *,
                compression: str | None = None,
                page_rows: int = 65536) -> dict:
    """Write one parquet file (single row group). Returns a summary
    {n_rows, file_bytes, encodings: {col: codec id}}."""
    if not columns:
        raise ValueError("no columns")
    n_rows = None
    for c in columns:
        rows = len(c.validity) if c.validity is not None else len(c.values)
        if n_rows is None:
            n_rows = rows
        elif rows != n_rows:
            raise ValueError(f"column {c.name}: {rows} rows, expected {n_rows}")
        if c.validity is not None and len(c.values) != int(c.validity.sum()):
            raise ValueError(f"column {c.name}: values must be null-stripped")

    out = bytearray(_MAGIC)
    chunks = []
    used = {}
    for c in columns:
        enc = c.encoding if c.encoding is not None else _default_encoding(c)
        used[c.name] = enc
        c2 = ColumnSpec(c.name, c.kind, c.values, c.validity, c.flba_size,
                        enc, c.logical)
        chunks.append(_write_column(out, c2, n_rows, compression, page_rows))

    schema = [tc.struct([
        (4, tc.BINARY, "schema"), (5, tc.I32, len(columns)),
    ])]
    for c in columns:
        schema.append(tc.struct([
            (1, tc.I32, c.kind),
            (2, tc.I32, c.flba_size
             if c.kind == Kind.FIXED_LEN_BYTE_ARRAY else None),
            (3, tc.I32, 1 if c.validity is not None else 0),
            (4, tc.BINARY, c.name),
            (6, tc.I32, _CONVERTED.get(c.logical)),
        ]))

    row_group = tc.struct([
        (1, tc.LIST, chunks, tc.STRUCT),
        (2, tc.I64, len(out) - 4),
        (3, tc.I64, n_rows),
    ])
    footer = tc.struct([
        (1, tc.I32, 1),
        (2, tc.LIST, schema, tc.STRUCT),
        (3, tc.I64, n_rows),
        (4, tc.LIST, [row_group], tc.STRUCT),
        (6, tc.BINARY, "parquet_go_spark interop writer"),
    ])
    out += footer
    out += len(footer).to_bytes(4, "little")
    out += _MAGIC
    with open(path, "wb") as f:
        f.write(out)
    return {"n_rows": n_rows, "file_bytes": len(out), "encodings": used}
