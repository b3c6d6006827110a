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


@pytest.fixture(scope="module")
def typed_store(spark, tmp_path_factory):
    """Columns in every physical kind the pruner touches: int32 with
    negatives, float32, date, timestamp, and a double column containing
    NaN — the shapes where kind-mismatched bloom probes / datetime
    literals / NaN bounds would silently drop rows."""
    import datetime as dt
    import math

    d = str(tmp_path_factory.mktemp("dstyped"))
    rows = [
        (
            i,
            f"g{i % 3}",
            int(i - 600),                       # int32, negatives
            float((i - 600) / 4.0),             # float32
            dt.date(2024, 1, 1) + dt.timedelta(days=i % 400),
            dt.datetime(2024, 1, 1, 12, 0, 0)
            + dt.timedelta(minutes=i),
            float("nan") if i % 100 == 0 else float(i) / 3.0,
        )
        for i in range(1200)
    ]
    src = spark.createDataFrame(
        rows,
        "k bigint, grp string, i32 int, f32 float, d date, "
        "ts timestamp, price double",
    )
    pipeline.encode_table(spark, src, d, repo_col="grp", salt_cols=["k"],
                          sort_cols=["k"], resume=False)
    datasource.register(spark)
    return d, src


def test_pushdown_typed_columns_exact(spark, typed_store):
    import datetime as dt

    d, src = typed_store
    df = spark.read.format("colcodec").load(d)
    cases = [
        F.col("i32") == -5,                       # int32 bloom, negative
        F.col("i32").isin(-5, 599, 10**10),       # in incl. out-of-range
        F.col("f32") == F.lit(2.25).cast("float"),  # float32 bloom
        F.col("d") == F.lit(dt.date(2024, 2, 1)),   # date literal
        F.col("ts") == F.lit(
            dt.datetime(2024, 1, 1, 13, 40)),       # timestamp literal
        F.col("ts") > F.lit(dt.datetime(2024, 1, 1, 23, 0)),
        F.col("price") == 2.0,  # chunk min/max poisoned by NaN: must
                                # still find 2.0 (NaN bounds unbounded)
    ]
    for cond in cases:
        got = sorted(map(str, df.where(cond).collect()))
        exp = sorted(map(str, src.where(cond).collect()))
        assert got == exp and got, str(cond)


def test_probe_key_conversions():
    import datetime as dt

    from parquet_go_spark.sources.datasource import _probe_key, _stat_key

    assert _probe_key("date", dt.date(1970, 1, 2)) == 1
    # naive LTZ literal = driver-local wall clock (Spark's pushdown
    # contract); NTZ naive = the stored wall clock directly
    naive = dt.datetime(1970, 1, 1, 0, 0, 1)
    local_utc = naive.astimezone(dt.timezone.utc).replace(tzinfo=None)
    exp = (local_utc - dt.datetime(1970, 1, 1)) \
        // dt.timedelta(microseconds=1)
    assert _probe_key("timestamp", naive) == exp
    assert _probe_key("timestamp_ntz", naive) == 1_000_000
    aware = dt.datetime(1970, 1, 1, 1, 0, 1, tzinfo=dt.timezone(
        dt.timedelta(hours=1)))
    assert _probe_key("timestamp", aware) == 1_000_000
    assert _probe_key("bigint", "not-an-int") is None
    assert _probe_key("double", float("nan")) is None
    assert _stat_key("double", "nan") is None  # NaN bound = unbounded


def test_write_path_roundtrip_append_overwrite(spark, tmp_path):
    import datetime as dt

    datasource.register(spark)
    d = str(tmp_path / "wstore")
    rows = [(i, f"g{i % 3}", f"text {i}", float(i) / 3,
             dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i))
            for i in range(2000)]
    src = spark.createDataFrame(
        rows, "k bigint, grp string, txt string, price double, ts timestamp")
    src.write.format("colcodec").option("repo_col", "grp") \
       .mode("append").save(d)
    back = spark.read.format("colcodec").load(d)
    assert sorted(map(str, back.collect())) == sorted(map(str, src.collect()))
    # append accumulates; overwrite replaces
    head = spark.createDataFrame(rows[:50], src.schema)
    head.write.format("colcodec").option("repo_col", "grp") \
        .mode("append").save(d)
    assert spark.read.format("colcodec").load(d).count() == 2050
    head.write.format("colcodec").option("repo_col", "grp") \
        .mode("overwrite").save(d)
    assert spark.read.format("colcodec").load(d).count() == 50
    # filters work over the written store
    assert spark.read.format("colcodec").load(d) \
        .where(F.col("k") == 7).count() == 1
    # commit swept the staging dir
    assert not os.path.exists(os.path.join(d, ".staging"))


def test_write_append_schema_mismatch_raises(spark, tmp_path):
    datasource.register(spark)
    d = str(tmp_path / "wmismatch")
    a = spark.createDataFrame([(1, "x")], "k bigint, grp string")
    a.write.format("colcodec").option("repo_col", "grp") \
     .mode("append").save(d)
    b = spark.createDataFrame([(1.5, "x")], "k double, grp string")
    with pytest.raises(Exception, match="schema differs"):
        b.write.format("colcodec").option("repo_col", "grp") \
         .mode("append").save(d)


def test_write_rejects_unknown_repo_col(spark, tmp_path):
    datasource.register(spark)
    a = spark.createDataFrame([(1, "x")], "k bigint, grp string")
    with pytest.raises(Exception, match="repo_col"):
        a.write.format("colcodec").option("repo_col", "nope") \
         .mode("append").save(str(tmp_path / "wbad"))


def test_write_null_repo_rows_survive(spark, tmp_path):
    """NULL repo values group under "None" for placement but the rows —
    and their true null — survive the round trip."""
    datasource.register(spark)
    d = str(tmp_path / "wnull")
    src = spark.createDataFrame(
        [(1, "a", 1.0), (2, None, 2.0), (3, "a", 3.0), (4, None, 4.0)],
        "k bigint, grp string, v double")
    src.write.format("colcodec").option("repo_col", "grp") \
       .mode("append").save(d)
    back = spark.read.format("colcodec").load(d)
    assert sorted(map(str, back.collect())) == sorted(map(str, src.collect()))


def test_write_appends_decode_through_pipeline(spark, tmp_path):
    """Two separate append jobs must produce globally-unique chunk ids:
    pipeline.decode_table groups blob rows by chunk_id ACROSS files, so
    a cross-job collision would merge two chunks' streams."""
    datasource.register(spark)
    d = str(tmp_path / "wjobs")
    a = spark.createDataFrame(
        [(i, "g0", f"a{i}") for i in range(300)],
        "k bigint, grp string, txt string")
    b = spark.createDataFrame(
        [(i, "g0", f"b{i}") for i in range(300, 600)], a.schema)
    a.write.format("colcodec").option("repo_col", "grp") \
     .mode("append").save(d)
    b.write.format("colcodec").option("repo_col", "grp") \
     .mode("append").save(d)
    man = pipeline.manifest(spark, d)
    ids = [r["chunk_id"] for r in man.select("chunk_id").distinct().collect()]
    assert len(ids) == len(set(ids))
    dec = pipeline.decode_table(spark, d)
    exp = a.unionAll(b)
    assert sorted(map(str, dec.collect())) == sorted(map(str, exp.collect()))


def test_write_schema_mismatch_fails_at_plan_time(spark, tmp_path):
    """A mismatched append is rejected in writer() — before Spark runs
    any encode task."""
    datasource.register(spark)
    d = str(tmp_path / "wplan")
    a = spark.createDataFrame([(1, "x")], "k bigint, grp string")
    a.write.format("colcodec").option("repo_col", "grp") \
     .mode("append").save(d)
    b = spark.createDataFrame([(1.5, "x")], "k double, grp string")
    with pytest.raises(Exception, match="schema differs"):
        b.write.format("colcodec").option("repo_col", "grp") \
         .mode("append").save(d)


def test_streaming_sink_exactly_once(spark, tmp_path):
    """writeStream.format("colcodec"): micro-batches land as
    batch-stamped files; restarting from the same checkpoint processes
    only new input, and a replayed batch commits nothing twice."""
    datasource.register(spark)
    src_dir = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)
    schema = "k bigint, grp string, txt string"
    df1 = spark.createDataFrame(
        [(i, f"g{i % 3}", f"t{i}") for i in range(400)], schema)
    df1.write.parquet(src_dir + "/f1")

    def run_once():
        q = (spark.readStream.schema(schema)
             .option("maxFilesPerTrigger", "1").parquet(src_dir + "/*")
             .writeStream.format("colcodec").option("repo_col", "grp")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start(store))
        q.awaitTermination(120)

    run_once()
    assert spark.read.format("colcodec").load(store).count() == 400
    df2 = spark.createDataFrame(
        [(i, f"g{i % 3}", f"t{i}") for i in range(400, 700)], schema)
    df2.write.parquet(src_dir + "/f2")
    run_once()
    assert spark.read.format("colcodec").load(store).count() == 700
    run_once()  # no new input: nothing duplicates
    got = sorted(map(str, spark.read.format("colcodec").load(store).collect()))
    exp = sorted(map(str, df1.unionAll(df2).collect()))
    assert got == exp


def test_streaming_source_tails_store(spark, tmp_path):
    """readStream.format("colcodec"): offsets are file-set diffs, so a
    checkpointed query emits exactly the files added since its last run
    — no re-emission, no misses."""
    datasource.register(spark)
    store = str(tmp_path / "sstore")
    ckpt = str(tmp_path / "sckpt")
    outdir = str(tmp_path / "sout")
    schema = "k bigint, grp string, txt string"
    df1 = spark.createDataFrame(
        [(i, f"g{i % 3}", f"t{i}") for i in range(300)], schema)
    df1.write.format("colcodec").option("repo_col", "grp") \
       .mode("append").save(store)

    def run_once():
        q = (spark.readStream.format("colcodec").load(store)
             .writeStream.format("parquet").option("path", outdir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(outdir).count() == 300
    df2 = spark.createDataFrame(
        [(i, f"g{i % 3}", f"t{i}") for i in range(300, 500)], schema)
    df2.write.format("colcodec").option("repo_col", "grp") \
       .mode("append").save(store)
    run_once()
    assert spark.read.parquet(outdir).count() == 500
    run_once()  # no new files
    got = sorted(map(str, spark.read.parquet(outdir).collect()))
    exp = sorted(map(str, df1.unionAll(df2).collect()))
    assert got == exp


def test_stream_sink_partial_commit_recovers(spark, tmp_path):
    """A crash mid-rename leaves batch files without the .done marker;
    the replay must clear the partials and rewrite the batch in full —
    never mistake a partial batch for a committed one."""
    datasource.register(spark)
    store = str(tmp_path / "pstore")
    ckpt = str(tmp_path / "pckpt")
    src_dir = str(tmp_path / "pin")
    os.makedirs(src_dir)
    schema = "k bigint, grp string"
    df1 = spark.createDataFrame(
        [(i, f"g{i % 2}") for i in range(200)], schema)
    df1.write.parquet(src_dir + "/f1")

    def run_once():
        q = (spark.readStream.schema(schema).parquet(src_dir + "/*")
             .writeStream.format("colcodec").option("repo_col", "grp")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start(store))
        q.awaitTermination(120)

    run_once()
    # simulate the mid-commit crash: marker gone, one batch file gone
    markers = [f for f in os.listdir(store) if f.endswith(".done")]
    assert markers
    os.unlink(os.path.join(store, markers[0]))
    parts = sorted(f for f in os.listdir(store) if f.endswith(".parquet"))
    os.unlink(os.path.join(store, parts[0]))
    # wipe the checkpoint so the batch REPLAYS from scratch
    import shutil as _sh
    _sh.rmtree(ckpt)
    run_once()
    back = spark.read.format("colcodec").load(store)
    assert sorted(map(str, back.collect())) == sorted(map(str, df1.collect()))


def test_stream_sink_rejects_complete_mode(spark, tmp_path):
    datasource.register(spark)
    schema = "k bigint, grp string"
    src_dir = str(tmp_path / "cin")
    os.makedirs(src_dir)
    spark.createDataFrame([(1, "a")], schema).write.parquet(src_dir + "/f1")
    agg = (spark.readStream.schema(schema).parquet(src_dir + "/*")
           .groupBy("grp").count())
    with pytest.raises(Exception, match="append output mode only"):
        q = (agg.writeStream.format("colcodec").option("repo_col", "grp")
             .outputMode("complete")
             .option("checkpointLocation", str(tmp_path / "cckpt"))
             .trigger(availableNow=True).start(str(tmp_path / "cstore")))
        q.awaitTermination(60)


def test_stream_source_detects_rewrite(spark, tmp_path):
    """Overwrite/compaction under a tailing reader must fail loudly,
    not silently re-emit rewritten files as new data."""
    from parquet_go_spark.sources.datasource import ColcodecStreamReader

    datasource.register(spark)
    store = str(tmp_path / "rwstore")
    schema = "k bigint, grp string"
    df = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    df.write.format("colcodec").option("repo_col", "grp") \
      .mode("append").save(store)
    rdr = ColcodecStreamReader(store, pipeline._read_schema_sidecar(store))
    start = rdr.latestOffset()
    df.write.format("colcodec").option("repo_col", "grp") \
      .mode("overwrite").save(store)
    end = rdr.latestOffset()
    with pytest.raises(RuntimeError, match="rewritten"):
        rdr.partitions(start, end)


def test_chunk_survives_null_tests():
    """isnull/notnull prune on the manifest's null_count/n_rows alone
    — no stats, no bloom, unknown stays kept."""
    types = {"v": "double"}
    st = {"v": (None, None)}
    no_nulls = {"v": (0, 100)}
    all_null = {"v": (100, 100)}
    some = {"v": (40, 100)}
    f_isnull = [("v", "isnull", None)]
    f_notnull = [("v", "notnull", None)]
    assert not _chunk_survives(f_isnull, types, st, {}, no_nulls)
    assert _chunk_survives(f_isnull, types, st, {}, all_null)
    assert _chunk_survives(f_isnull, types, st, {}, some)
    assert not _chunk_survives(f_notnull, types, st, {}, all_null)
    assert _chunk_survives(f_notnull, types, st, {}, no_nulls)
    assert _chunk_survives(f_notnull, types, st, {}, some)
    # unknown null info: always keep; absent nulls dict: keep
    assert _chunk_survives(f_isnull, types, st, {}, {"v": (None, None)})
    assert _chunk_survives(f_isnull, types, st, {})


def test_datasource_null_filters_exact(spark, tmp_path):
    """IS NULL / IS NOT NULL through the colcodec data source equal the
    source DataFrame, with nulls concentrated so chunks actually
    prune (null-free repos refuted for IS NULL)."""
    d = str(tmp_path / "nullstore")
    src = spark.createDataFrame(
        [(i, f"grp{i % 3}",
          None if i % 3 == 0 else float(i)) for i in range(3000)],
        "k bigint, grp string, v double",
    )
    # grp0 rows carry ALL the nulls; grp1/grp2 chunks are null-free
    pipeline.encode_table(spark, src, d, repo_col="grp",
                          sort_cols=["k"], resume=False)
    datasource.register(spark)
    # fresh load PER QUERY — the documented safe pattern under the
    # upstream Spark 4.1 readInfo-caching bug (see module docstring
    # and test_python_ds_relation_reuse_upstream_caveat)
    for cond in ("v IS NULL", "v IS NOT NULL",
                 "v IS NULL AND k < 100", "v IS NOT NULL OR k = 0"):
        df = spark.read.format("colcodec").load(d)
        got = sorted(map(tuple, df.where(cond).collect()))
        exp = sorted(map(tuple, src.where(cond).collect()))
        assert got == exp, cond
    from pyspark.sql.datasource import IsNotNull, IsNull

    got = datasource._translate_filters(
        [IsNull(("v",)), IsNotNull(("k",))], {"v": "double", "k": "bigint"})
    assert got == [("v", "isnull", None), ("k", "notnull", None)]


def test_python_ds_relation_reuse_upstream_caveat(spark, tmp_path):
    """PINS an UPSTREAM Spark 4.1 behavior (not ours): with
    spark.sql.python.filterPushdown.enabled, the JVM caches planned
    partitions per relation (PythonDataSourceV2.readInfo) and filter
    pushdown overwrites the cache — so a REUSED DataFrame serves the
    first pushed query's pruned scan to a later query that pushes
    nothing. Demonstrated on a minimal source with NO instance state,
    proving it is not this package's reader. If this test starts
    failing on a future Spark, the caching was fixed: delete the
    caveat from sources/datasource.py + sources/pqread.py docstrings
    and this pin."""
    from pyspark.sql.datasource import (
        DataSource, DataSourceReader, EqualTo)

    class MiniReader(DataSourceReader):
        def __init__(self):
            self.keep = None

        def pushFilters(self, filters):  # noqa: N802
            fs = list(filters)
            for f in fs:
                if isinstance(f, EqualTo):
                    self.keep = f.value
            return iter(fs)

        def read(self, partition):
            for i in range(10):
                if self.keep is None or i == self.keep:
                    yield (i,)

    class MiniSource(DataSource):
        @classmethod
        def name(cls):
            return "minids_upstream_pin"

        def schema(self):
            return "k int"

        def reader(self, schema):
            return MiniReader()

    prior = spark.conf.get("spark.sql.python.filterPushdown.enabled",
                           None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(MiniSource)
        df = spark.read.format("minids_upstream_pin").load()
        assert df.where("k = 3").count() == 1
        # UPSTREAM BUG: reused relation serves the pruned scan (≠ 10)
        assert df.count() == 1
        # the safe pattern: a fresh relation per query is exact
        assert spark.read.format(
            "minids_upstream_pin").load().count() == 10
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set(
                "spark.sql.python.filterPushdown.enabled", prior)
