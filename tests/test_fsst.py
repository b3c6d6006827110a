"""FSST round-trip + ratio tests (paper-derived extension codec)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_go_spark.codecs import fsst, plain
from parquet_go_spark.codecs.bytearrays import ByteArrays

VECTORS = [
    [],
    [b""],
    [b"a"],
    [b"hello world", b"", b"hello hello hello"],
    [b"\xff"],  # escape byte as data
    [b"\xff" * 9, b"x\xffy"],  # runs of escape bytes
    [b"abc" * 100] * 5,
    [bytes(range(256))],
    [b"def foo():\n    return bar\n", b"def baz():\n    return qux\n"] * 50,
]


@pytest.mark.parametrize("vec", VECTORS)
def test_fsst_roundtrip(vec):
    ba = ByteArrays.from_pylist(vec)
    blob = fsst.encode_byte_array(ba)
    assert fsst.decode_byte_array(blob).to_pylist() == vec


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(max_size=60), max_size=120))
def test_fsst_fuzz(vals):
    ba = ByteArrays.from_pylist(vals)
    blob = fsst.encode_byte_array(ba)
    assert fsst.decode_byte_array(blob).to_pylist() == vals


def test_fsst_compresses_source_code():
    rng = np.random.default_rng(7)
    kw = ["def ", "return ", "import ", "for i in range(", "    ", "self.",
          "value", " = ", "# note\n", "):\n", "class ", "print("]
    lines = [("".join(rng.choice(kw, 8)) + f"v{i % 53}\n").encode() for i in range(3000)]
    ba = ByteArrays.from_pylist(lines)
    blob = fsst.encode_byte_array(ba)
    plain_size = len(plain.encode_byte_array(ba))
    assert len(blob) < plain_size / 2  # ≥2x on code-like text
    assert fsst.decode_byte_array(blob) == ba


def test_fsst_deterministic():
    vals = [f"path/to/file_{i % 17}.py".encode() for i in range(500)]
    ba = ByteArrays.from_pylist(vals)
    assert fsst.encode_byte_array(ba) == fsst.encode_byte_array(ba)


def test_fsst_table_serialization_roundtrip():
    data = np.frombuffer(b"the quick brown fox jumps over the lazy dog " * 50, dtype=np.uint8)
    table = fsst.train(data)
    blob = table.serialize()
    back, consumed = fsst.FsstTable.deserialize(blob, 0)
    assert consumed == len(blob)
    assert np.array_equal(back.lengths, table.lengths)
    assert np.array_equal(back.keys, table.keys)
