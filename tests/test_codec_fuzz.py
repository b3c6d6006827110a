"""Property-based fuzzing of every codec — pytest analog of the
reference's fuzz targets (/root/reference/encoding/fuzz/fuzz.go:13+,
rle/rle_test.go:19-29, delta/delta_test.go:12-26)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_go_spark.codecs import bytestreamsplit, delta, plain, rle
from parquet_go_spark.codecs.bytearrays import ByteArrays
from parquet_go_spark.codecs.kinds import Kind

SET = settings(max_examples=60, deadline=None)

int32s = st.lists(st.integers(-(2**31), 2**31 - 1), max_size=400)
int64s = st.lists(st.integers(-(2**63), 2**63 - 1), max_size=400)
# skew toward repeats to exercise RLE runs
small_ints = st.lists(st.integers(0, 7), max_size=400)
byte_lists = st.lists(st.binary(max_size=40), max_size=150)


@SET
@given(int32s)
def test_fuzz_delta_bp_int32(vals):
    a = np.array(vals, dtype=np.int32)
    buf = delta.encode_binary_packed(a, 32)
    got, consumed = delta.decode_binary_packed(buf, 32)
    assert consumed == len(buf)
    assert np.array_equal(got, a)


@SET
@given(int64s)
def test_fuzz_delta_bp_int64(vals):
    a = np.array(vals, dtype=np.int64)
    buf = delta.encode_binary_packed(a, 64)
    got, consumed = delta.decode_binary_packed(buf, 64)
    assert consumed == len(buf)
    assert np.array_equal(got, a)


@SET
@given(small_ints, st.integers(3, 32))
def test_fuzz_rle_hybrid(vals, width):
    a = np.array(vals, dtype=np.uint64)
    buf = rle.encode_hybrid(a, width)
    assert np.array_equal(rle.decode_hybrid(buf, len(a), width), a)


@SET
@given(st.lists(st.booleans(), max_size=500))
def test_fuzz_rle_boolean(vals):
    a = np.array(vals, dtype=bool)
    buf = rle.encode_boolean(a)
    assert np.array_equal(rle.decode_boolean(buf, len(a)), a)


@SET
@given(byte_lists)
def test_fuzz_delta_byte_array(vals):
    ba = ByteArrays.from_pylist(vals)
    buf = delta.encode_byte_array(ba)
    assert delta.decode_byte_array(buf, len(vals)).to_pylist() == vals


@SET
@given(byte_lists)
def test_fuzz_delta_length_byte_array(vals):
    ba = ByteArrays.from_pylist(vals)
    buf = delta.encode_length_byte_array(ba)
    assert delta.decode_length_byte_array(buf, len(vals)).to_pylist() == vals


@SET
@given(byte_lists)
def test_fuzz_plain_byte_array(vals):
    ba = ByteArrays.from_pylist(vals)
    buf = plain.encode_byte_array(ba)
    assert plain.decode_byte_array(buf, len(vals)).to_pylist() == vals


@SET
@given(st.lists(st.floats(allow_nan=False, width=64), max_size=300))
def test_fuzz_bss_double(vals):
    a = np.array(vals, dtype=np.float64)
    buf = bytestreamsplit.encode(a, 8)
    assert np.array_equal(bytestreamsplit.decode(buf, len(a), 8, Kind.DOUBLE), a)
