"""Null (optional-column) support: validity bitmap round trips at the
chunk level and through the Spark pipeline — the flat-schema analog of
definition levels (/root/reference/column_buffer_optional.go:11-30)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_go_spark.codecs import chunk as chunklib, selector
from parquet_go_spark.codecs.bytearrays import ByteArrays
from parquet_go_spark.codecs.kinds import Codec, Kind


@pytest.mark.parametrize("codec,dict_wrap", [
    (Codec.PLAIN, False), (Codec.DELTA_BINARY_PACKED, False),
    (Codec.PLAIN, True),
])
def test_chunk_nulls_int64(codec, dict_wrap):
    rng = np.random.default_rng(7)
    validity = rng.random(1000) > 0.3
    values = rng.integers(0, 100, int(validity.sum())).astype(np.int64)
    blob = chunklib.encode_chunk(values, Kind.INT64, codec,
                                 dict_wrap=dict_wrap, validity=validity)
    dec, meta = chunklib.decode_chunk(blob)
    assert meta["n"] == 1000
    assert np.array_equal(meta["validity"], validity)
    assert np.array_equal(dec, values)


@pytest.mark.parametrize("codec", [
    Codec.PLAIN, Codec.DELTA_LENGTH_BYTE_ARRAY, Codec.FSST,
])
def test_chunk_nulls_byte_array(codec):
    rng = np.random.default_rng(9)
    validity = rng.random(500) > 0.5
    vals = ByteArrays.from_pylist(
        [f"value_{i}".encode() * (i % 5 + 1) for i in range(int(validity.sum()))]
    )
    blob = chunklib.encode_chunk(vals, Kind.BYTE_ARRAY, codec, validity=validity)
    dec, meta = chunklib.decode_chunk(blob)
    assert np.array_equal(meta["validity"], validity)
    assert dec == vals


def test_chunk_all_null():
    validity = np.zeros(64, dtype=bool)
    blob = chunklib.encode_chunk(np.empty(0, np.int64), Kind.INT64,
                                 Codec.PLAIN, validity=validity)
    dec, meta = chunklib.decode_chunk(blob)
    assert meta["n"] == 64 and len(dec) == 0
    assert not meta["validity"].any()


def test_selector_with_validity():
    rng = np.random.default_rng(3)
    validity = rng.random(2000) > 0.2
    values = rng.integers(0, 10, int(validity.sum())).astype(np.int64)
    blob, info = selector.select_and_encode(values, Kind.INT64, validity=validity)
    dec, meta = chunklib.decode_chunk(blob)
    assert np.array_equal(dec, values)
    assert np.array_equal(meta["validity"], validity)


def test_pipeline_nullable_roundtrip(spark, tmp_path_factory):
    from parquet_go_spark.plans import pipeline

    out = str(tmp_path_factory.mktemp("enc") / "nullable")
    df = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .withColumn("o_orderstatus",
                    F.when(F.col("o_orderkey") % 3 == 0, None)
                    .otherwise(F.col("o_orderstatus")))
        .withColumn("o_custkey",
                    F.when(F.col("o_orderkey") % 5 == 0, None)
                    .otherwise(F.col("o_custkey")))
    )
    pipeline.encode_table(spark, df, out, repo_col="o_orderpriority",
                          salt_cols=["o_orderkey"], sort_cols=["o_orderkey"])
    res = pipeline.verify_roundtrip(spark, df, out)
    assert res["ok"], res
    m = pipeline.manifest(spark, out)
    nc = {r["column"]: r["nc"] for r in
          m.groupBy("column").agg(F.sum("null_count").alias("nc")).collect()}
    n_null_status = df.where(F.col("o_orderstatus").isNull()).count()
    assert nc["o_orderstatus"] == n_null_status
    assert nc["o_orderkey"] == 0
