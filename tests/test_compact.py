"""Compaction: merge blob tables with verbatim splice of full chunks
and re-encode of undersized ones (MergeRowGroups + writer_copy analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_go_spark.plans import pipeline
from parquet_go_spark.sources.repogen import repos_table


def test_compact_two_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("compact")
    a_path, b_path, out = str(base / "a"), str(base / "b"), str(base / "out")

    full = repos_table(spark, 2400, seed=5, n_repos=20).cache()
    a = full.where(F.pmod(F.xxhash64("path"), F.lit(2)) == 0)
    b = full.where(F.pmod(F.xxhash64("path"), F.lit(2)) == 1)
    # tiny target → many undersized chunks in both inputs
    for df, pth in ((a, a_path), (b, b_path)):
        pipeline.encode_table(
            spark, df, pth, salt_cols=["path", "commit"],
            sort_cols=["path", "commit"], target_chunk_bytes=64 << 10,
        )
    n_in = (
        pipeline.manifest(spark, a_path).select("chunk_id").distinct().count()
        + pipeline.manifest(spark, b_path).select("chunk_id").distinct().count()
    )

    res = pipeline.compact_tables(
        spark, [a_path, b_path], out,
        salt_cols=["path", "commit"], sort_cols=["path", "commit"],
        min_chunk_bytes=256 << 10,
    )
    assert res["merged_small_chunks"] > 0
    assert res["chunks"] < n_in  # compaction actually reduced chunk count
    # content integrity: decoded rows == union of both inputs
    out_res = pipeline.verify_roundtrip(spark, full, out)
    assert out_res["ok"], out_res


def test_compact_unifies_schemas(spark, tmp_path_factory):
    """MergeNodes/Convert analog: inputs with different column sets merge
    to the union schema; missing columns decode as NULL."""
    base = tmp_path_factory.mktemp("compact_schema")
    a_path, b_path, out = str(base / "a"), str(base / "b"), str(base / "out")

    a = spark.createDataFrame(
        [("r", i, f"text-{i}") for i in range(100)],
        "repo string, k bigint, body string",
    )
    b = spark.createDataFrame(
        [("r", 1000 + i, f"text-{i}", float(i)) for i in range(100)],
        "repo string, k bigint, body string, score double",
    )
    for df, pth in ((a, a_path), (b, b_path)):
        pipeline.encode_table(spark, df, pth, salt_cols=["k"],
                              sort_cols=["k"], resume=False)

    res = pipeline.compact_tables(
        spark, [a_path, b_path], out, salt_cols=["k"], sort_cols=["k"],
    )
    dec = pipeline.decode_table(spark, out)
    assert set(dec.columns) == {"repo", "k", "body", "score"}
    assert dec.count() == 200
    # a's rows null-filled on the added column; b's rows keep their score
    assert dec.where(F.col("k") < 1000).where(
        F.col("score").isNotNull()).count() == 0
    got = {r["k"]: r["score"] for r in dec.where(F.col("k") >= 1000).collect()}
    assert got == {1000 + i: float(i) for i in range(100)}


def test_compact_conflicting_types_raises(spark, tmp_path_factory):
    import pytest as _pytest

    base = tmp_path_factory.mktemp("compact_conflict")
    a_path, b_path = str(base / "a"), str(base / "b")
    a = spark.createDataFrame([("r", 1, "x")], "repo string, k bigint, v string")
    b = spark.createDataFrame([("r", 2, 3.5)], "repo string, k bigint, v double")
    for df, pth in ((a, a_path), (b, b_path)):
        pipeline.encode_table(spark, df, pth, salt_cols=["k"],
                              sort_cols=["k"], resume=False)
    with _pytest.raises(ValueError, match="conflicting"):
        pipeline.compact_tables(spark, [a_path, b_path], str(base / "out"),
                                salt_cols=["k"], sort_cols=["k"])


def test_compact_unifies_nested_columns(spark, tmp_path_factory):
    """A table missing a list/map column unifies via EMPTY containers
    (the engine's nested input surface is non-null; null entries live in
    the values-stream validity, so empty is the representable convert
    analog)."""
    base = tmp_path_factory.mktemp("compact_nested")
    a_path, b_path, out = str(base / "a"), str(base / "b"), str(base / "out")

    a = spark.createDataFrame(
        [("r", i) for i in range(50)], "repo string, k bigint"
    )
    b = spark.createDataFrame(
        [("r", 100 + i) for i in range(50)], "repo string, k bigint"
    ).select(
        "repo", "k",
        F.array(F.lit("t1"), F.lit("t2")).alias("tags"),
        F.create_map(F.lit("a"), F.lit("1")).alias("attrs"),
    )
    for df, pth in ((a, a_path), (b, b_path)):
        pipeline.encode_table(spark, df, pth, salt_cols=["k"],
                              sort_cols=["k"], resume=False)

    pipeline.compact_tables(
        spark, [a_path, b_path], out, salt_cols=["k"], sort_cols=["k"],
        min_chunk_bytes=1 << 30,  # force re-encode of everything
    )
    dec = pipeline.decode_table(spark, out)
    assert set(dec.columns) == {"repo", "k", "tags", "attrs"}
    assert dec.count() == 100
    filled = dec.where(F.col("k") < 100)
    assert filled.where(F.size("tags") != 0).count() == 0
    assert filled.where(F.size("attrs") != 0).count() == 0
    kept = dec.where(F.col("k") >= 100).first()
    assert kept["tags"] == ["t1", "t2"] and kept["attrs"] == {"a": "1"}
