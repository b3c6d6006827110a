"""End-to-end Spark pipeline tests: encode → manifest → decode → verify,
idempotent resume, and skew-bounded chunking."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_go_spark.plans import pipeline
from parquet_go_spark.sources.repogen import repos_table


@pytest.fixture(scope="module")
def small_repos(spark):
    return repos_table(spark, 2000, seed=42, n_repos=40).cache()


def test_encode_decode_roundtrip(spark, small_repos, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("enc") / "blobs")
    stats = pipeline.encode_table(
        spark, small_repos, out,
        salt_cols=["path", "commit"], sort_cols=["path", "commit"],
        target_chunk_bytes=1 << 20,
    )
    assert stats["chunks"] > 0
    assert stats["ratio"] > 1.0  # net compression on the repo table
    res = pipeline.verify_roundtrip(spark, small_repos, out)
    assert res["ok"], res


def test_manifest_has_lineage(spark, small_repos, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("enc") / "blobs")
    pipeline.encode_table(spark, small_repos, out, salt_cols=["path", "commit"])
    m = pipeline.manifest(spark, out)
    rows = m.collect()
    assert all(len(r["sha256"]) == 64 for r in rows)
    assert {r["column"] for r in rows} == {"repo", "path", "commit", "lang", "content"}
    # every chunk has every column
    per_chunk = m.groupBy("chunk_id").agg(F.countDistinct("column").alias("c")).collect()
    assert all(r["c"] == 5 for r in per_chunk)


def test_resume_skips_done_chunks(spark, small_repos, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("enc") / "blobs")
    s1 = pipeline.encode_table(spark, small_repos, out, salt_cols=["path", "commit"])
    m1 = pipeline.manifest(spark, out).orderBy("chunk_id", "column").collect()
    # second run: everything already done → nothing re-encoded, no dupes
    s2 = pipeline.encode_table(spark, small_repos, out, salt_cols=["path", "commit"])
    assert s2["skipped_chunks"] == s1["chunks"]
    m2 = pipeline.manifest(spark, out).orderBy("chunk_id", "column").collect()
    assert len(m2) == len(m1)
    # deterministic lineage: identical sha256 + enc_bytes per chunk/column
    assert [(r["chunk_id"], r["column"], r["sha256"], r["enc_bytes"]) for r in m1] == [
        (r["chunk_id"], r["column"], r["sha256"], r["enc_bytes"]) for r in m2
    ]


def test_resume_encodes_only_missing(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("enc") / "blobs")
    full = repos_table(spark, 1500, seed=7, n_repos=20).cache()
    half = full.where(F.xxhash64("path") % 2 == 0)
    pipeline.encode_table(spark, half, out, salt_cols=["path", "commit"])
    n_half = pipeline.manifest(spark, out).select("chunk_id").distinct().count()
    # note: chunk membership depends on bucket counts; to keep keys stable
    # across the two runs we fix target bytes large → 1 bucket per repo
    stats = pipeline.encode_table(spark, full, out, salt_cols=["path", "commit"])
    assert stats["skipped_chunks"] == n_half
    # decoded rows = union of the two encodes (half overlap is re-encoded
    # only for repos whose chunk wasn't complete)
    assert pipeline.manifest(spark, out).select("chunk_id").distinct().count() >= n_half


def test_skew_bounded_chunks(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("enc") / "blobs")
    df = repos_table(spark, 4000, seed=42, n_repos=10)  # very skewed
    pipeline.encode_table(
        spark, df, out, salt_cols=["path", "commit"], target_chunk_bytes=1 << 20
    )
    m = pipeline.manifest(spark, out)
    per_chunk = (
        m.groupBy("chunk_id").agg(F.sum("raw_bytes").alias("b")).collect()
    )
    # the giant repo got split: no chunk above ~2x the target
    assert max(r["b"] for r in per_chunk) < 2 * (1 << 20)
    giant = m.where(F.col("repo").contains("repo0")).select("bucket").distinct().count()
    assert giant > 1


def test_typed_columns_roundtrip(spark, tmp_path_factory):
    """lineitem-style table: ints, doubles, strings, timestamp."""
    out = str(tmp_path_factory.mktemp("enc") / "blobs")
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    stats = pipeline.encode_table(
        spark, df, out, repo_col="l_returnflag",
        salt_cols=["l_orderkey", "l_linenumber"],
        sort_cols=["l_orderkey", "l_linenumber"],
    )
    assert stats["chunks"] > 0
    res = pipeline.verify_roundtrip(spark, df, out)
    assert res["ok"], res
