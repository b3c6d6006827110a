"""Split-block bloom filter: no false negatives, useful fpp, and
bloom-pruned point lookup through the pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_go_spark.codecs import bloom
from parquet_go_spark.codecs.bytearrays import ByteArrays
from parquet_go_spark.codecs.kinds import Kind


def test_no_false_negatives_int64():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1 << 40, 5000).astype(np.int64)
    blob = bloom.build(vals, Kind.INT64)
    assert bloom.might_contain(blob, vals, Kind.INT64).all()


def test_false_positive_rate_int64():
    rng = np.random.default_rng(2)
    vals = np.arange(10_000, dtype=np.int64)
    blob = bloom.build(vals, Kind.INT64)
    absent = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    fpp = bloom.might_contain(blob, absent, Kind.INT64).mean()
    assert fpp < 0.05, fpp  # ~1% expected at 10 bits/value


def test_no_false_negatives_byte_array():
    vals = ByteArrays.from_pylist([f"key-{i}".encode() for i in range(3000)])
    blob = bloom.build(vals, Kind.BYTE_ARRAY)
    assert bloom.might_contain(blob, vals, Kind.BYTE_ARRAY).all()
    absent = ByteArrays.from_pylist([f"other-{i}".encode() for i in range(3000)])
    assert bloom.might_contain(blob, absent, Kind.BYTE_ARRAY).mean() < 0.05


def test_double_and_float():
    vals = np.linspace(0, 1, 1000)
    blob = bloom.build(vals, Kind.DOUBLE)
    assert bloom.might_contain(blob, vals, Kind.DOUBLE).all()


def test_bloom_point_decode(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from parquet_go_spark.plans import pipeline

    out = str(tmp_path_factory.mktemp("enc") / "orders")
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    pipeline.encode_table(spark, df, out, repo_col="o_orderpriority",
                          salt_cols=["o_orderkey"], sort_cols=["o_orderkey"])
    key = df.select("o_custkey").head()[0]
    got = sorted(
        r["o_orderkey"]
        for r in pipeline.bloom_point_decode(
            spark, out, "o_custkey", key,
            columns_subset=["o_orderkey"],
        ).collect()
    )
    want = sorted(
        r["o_orderkey"]
        for r in df.where(F.col("o_custkey") == key).collect()
    )
    assert got == want and len(got) >= 1


@pytest.mark.skipif(bloom._NATIVE is None, reason="no C toolchain on this host")
def test_native_byte_array_hash_matches_numpy(monkeypatch):
    """The compiled poly64 kernel must reproduce the numpy reference
    hash bit-for-bit: filters built by one path are probed by the other
    (mixed deployments / resume across hosts with and without cc)."""
    rng = np.random.default_rng(11)
    lens = np.concatenate([
        rng.integers(0, 50, 4000),          # short values + empties
        rng.integers(1000, 4000, 100),      # content-sized values
        [0, 0, 1],
    ]).astype(np.int64)
    data = rng.integers(0, 256, int(lens.sum()), dtype=np.uint8)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    vals = ByteArrays(data, offsets)
    h_native = bloom.hash_values(vals, Kind.BYTE_ARRAY)
    monkeypatch.setattr(bloom, "_NATIVE", None)
    h_numpy = bloom.hash_values(vals, Kind.BYTE_ARRAY)
    assert np.array_equal(h_native, h_numpy)
    # cross-path build/probe: numpy-built filter, native probe hashes
    blob = bloom.build(vals, Kind.BYTE_ARRAY)
    monkeypatch.undo()
    assert bloom.might_contain(blob, vals, Kind.BYTE_ARRAY).all()
