"""Python Data Source (spark.read.format("colcodec")): full-table read
equals the source, pushed filters prune chunks task-side (stats + bloom)
without ever changing results, and SQL views compose over the format."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from parquet_go_spark.plans import pipeline
from parquet_go_spark.sources import datasource
from parquet_go_spark.sources.datasource import _chunk_survives


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dsstore"))
    src = spark.createDataFrame(
        [(i, f"grp{i % 4}", f"name-{i:05d}", float(i) / 7) for i in range(4000)],
        "k bigint, grp string, name string, price double",
    )
    pipeline.encode_table(spark, src, d, repo_col="grp", salt_cols=["k"],
                          sort_cols=["k"], resume=False)
    datasource.register(spark)
    return d, src


def test_full_read_equals_source(spark, store):
    d, src = store
    df = spark.read.format("colcodec").load(d)
    assert df.schema == src.schema
    got = sorted(map(tuple, df.collect()))
    exp = sorted(map(tuple, src.collect()))
    assert got == exp


def test_pushed_filters_stay_exact(spark, store):
    d, src = store
    df = spark.read.format("colcodec").load(d)
    cases = [
        F.col("k") == 7,
        (F.col("k") > 3900) & (F.col("grp") == "grp1"),
        F.col("name").isin("name-00001", "name-03999", "name-99999"),
        F.col("price") <= 1.0,
        F.col("k") == -5,  # refuted everywhere → empty
    ]
    for cond in cases:
        got = sorted(map(tuple, df.where(cond).collect()))
        exp = sorted(map(tuple, src.where(cond).collect()))
        assert got == exp, str(cond)


def test_sql_view_over_format(spark, store):
    d, src = store
    spark.read.format("colcodec").load(d).createOrReplaceTempView("ds_t")
    n = spark.sql(
        "SELECT count(*) AS n FROM ds_t WHERE k % 2 = 0 AND grp = 'grp2'"
    ).collect()[0]["n"]
    assert n == src.where("k % 2 = 0 AND grp = 'grp2'").count()


def test_chunk_survives_semantics():
    types = {"k": "bigint", "name": "string"}
    stats = {"k": ("100", "200"), "name": ("aaa", "mmm")}
    blooms = {"k": None, "name": None}
    ok = lambda f: _chunk_survives(f, types, stats, blooms)  # noqa: E731
    assert ok([("k", "eq", 150)])
    assert not ok([("k", "eq", 99)])
    assert not ok([("k", "gt", 200)])
    assert ok([("k", "gte", 200)])
    assert not ok([("k", "lt", 100)])
    assert ok([("k", "lte", 100)])
    assert ok([("name", "eq", "bbb")])
    assert not ok([("name", "eq", "zzz")])
    assert ok([("name", "in", ["zzz", "bbb"])])
    assert not ok([("name", "in", ["zzz", "nnn"])])
    # NULL bounds are unbounded → never prunable
    assert ok([("k", "eq", 99)]) is False
    assert _chunk_survives([("k", "eq", 99)], types,
                           {"k": (None, None)}, {"k": None})
    # unknown column/type: kept
    assert ok([("other", "eq", 1)])


def test_bloom_refutes_inside_bounds():
    import numpy as np

    from parquet_go_spark.codecs import bloom as bloomlib
    from parquet_go_spark.codecs.kinds import Kind

    present = np.array([100, 150, 200], dtype=np.int64)
    blob = bloomlib.build(present, Kind.INT64)
    types = {"k": "bigint"}
    stats = {"k": ("100", "200")}
    assert _chunk_survives([("k", "eq", 150)], types, stats, {"k": blob})
    # 137 is inside [100, 200] but not in the chunk: the bloom prunes
    # what min/max cannot (false positives possible, never negatives)
    hits = sum(
        _chunk_survives([("k", "eq", v)], types, stats, {"k": blob})
        for v in range(101, 200) if v not in (150,)
    )
    assert hits < 20  # ~1% fpp on 98 absent probes


def test_datasource_partition_per_file(spark, store):
    d, _ = store
    from parquet_go_spark.sources.datasource import ColcodecReader
    cols = pipeline._read_schema_sidecar(d)
    parts = ColcodecReader(d, cols).partitions()
    files = [f for f in os.listdir(d)
             if f.endswith(".parquet") and not f.startswith(("_", "."))]
    assert len(parts) == len(files) > 0
