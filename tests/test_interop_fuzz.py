"""Property fuzz for the parquet interop writer: random kinds,
encodings, null patterns, page/row-group geometry, page versions, and
compressions must ALL round-trip bit-exact through pyarrow — the same
adversarial-shapes strategy the codec round-trip fuzz uses, applied to
the file container."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from parquet_go_spark.codecs.bytearrays import ByteArrays
from parquet_go_spark.codecs.kinds import Codec, Kind
from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table

_ENCODINGS = {
    Kind.INT32: [Codec.PLAIN, Codec.DELTA_BINARY_PACKED,
                 Codec.RLE_DICTIONARY],
    Kind.INT64: [Codec.PLAIN, Codec.DELTA_BINARY_PACKED,
                 Codec.RLE_DICTIONARY],
    Kind.DOUBLE: [Codec.PLAIN, Codec.BYTE_STREAM_SPLIT],
    Kind.FLOAT: [Codec.PLAIN, Codec.BYTE_STREAM_SPLIT],
    Kind.BOOLEAN: [Codec.PLAIN, Codec.RLE],
    Kind.BYTE_ARRAY: [Codec.PLAIN, Codec.DELTA_LENGTH_BYTE_ARRAY,
                      Codec.DELTA_BYTE_ARRAY, Codec.RLE_DICTIONARY],
}


@st.composite
def _column_case(draw):
    kind = draw(st.sampled_from(sorted(_ENCODINGS)))
    codec = draw(st.sampled_from(_ENCODINGS[kind]))
    n = draw(st.integers(1, 700))
    seed = draw(st.integers(0, 2**31 - 1))
    nullable = draw(st.booleans())
    return kind, codec, n, seed, nullable


def _gen_values(kind: int, count: int, rng) -> object:
    if kind == Kind.INT32:
        return rng.integers(-(2**31), 2**31, count, dtype=np.int64).astype(
            np.int32)
    if kind == Kind.INT64:
        return rng.integers(-(2**62), 2**62, count).astype(np.int64)
    if kind == Kind.DOUBLE:
        return rng.standard_normal(count) * 10.0 ** rng.integers(-3, 9)
    if kind == Kind.FLOAT:
        return rng.standard_normal(count).astype(np.float32)
    if kind == Kind.BOOLEAN:
        return rng.random(count) > 0.5
    lens = rng.integers(0, 24, count)
    return ByteArrays.from_pylist([
        bytes(rng.integers(0, 256, ln, dtype=np.int64).astype(np.uint8))
        for ln in lens
    ])


@settings(max_examples=40, deadline=None)
@given(case=_column_case(),
       page_rows=st.integers(1, 300),
       rg_rows=st.one_of(st.none(), st.integers(1, 400)),
       page_version=st.sampled_from([1, 2]),
       compression=st.sampled_from([None, "snappy", "zstd"]))
def test_fuzz_roundtrip_via_pyarrow(tmp_path_factory, case, page_rows,
                                    rg_rows, page_version, compression):
    kind, codec, n, seed, nullable = case
    rng = np.random.default_rng(seed)
    validity = None
    count = n
    if nullable:
        validity = rng.random(n) > 0.35
        count = int(validity.sum())
    vals = _gen_values(kind, count, rng)
    p = str(tmp_path_factory.mktemp("fz") / "f.parquet")
    write_table(p, [ColumnSpec("c", kind, vals, validity=validity,
                               encoding=codec)],
                page_rows=page_rows, row_group_rows=rg_rows,
                page_version=page_version, compression=compression)
    # checksum-verified read: CRCs, page indexes, stats, footer all
    # consistent, values bit-exact
    t = pq.ParquetFile(p, page_checksum_verification=True).read()
    got = t.column("c").to_pylist()

    if kind == Kind.BYTE_ARRAY:
        flat = vals.to_pylist()
    elif kind == Kind.BOOLEAN:
        flat = [bool(v) for v in vals]
    else:
        flat = list(vals)
    exp = []
    j = 0
    if validity is None:
        exp = flat
    else:
        for v in validity:
            exp.append(flat[j] if v else None)
            j += v
    if kind in (Kind.DOUBLE, Kind.FLOAT):
        assert len(got) == len(exp)
        for g, e in zip(got, exp):
            assert (g is None) == (e is None)
            if g is not None:
                assert g == e or (np.isnan(g) and np.isnan(e))
    else:
        assert got == exp
