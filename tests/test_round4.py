"""Round-4 regressions: ADVICE fixes (timestamp-LTZ pruning tz, native
cache-dir trust, overwrite commit ordering + stale-marker sweep, eager
pushFilters) and the round-4 surface added on top of them."""

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

from parquet_go_spark.plans import pipeline
from parquet_go_spark.sources import datasource


# ---------------------------------------------------------------- ADVICE 1
def test_probe_key_timestamp_uses_local_tz(monkeypatch):
    """A naive TimestampType (LTZ) literal is driver-local wall clock;
    under a non-UTC local tz the epoch micros must shift by the zone
    offset (treating it as UTC silently prunes matching chunks)."""
    from parquet_go_spark.sources.datasource import _probe_key

    monkeypatch.setenv("TZ", "Etc/GMT-3")  # POSIX sign: UTC+3
    time.tzset()
    try:
        naive = dt.datetime(2024, 1, 1, 12, 0, 0)
        got = _probe_key("timestamp", naive)
        utc_wall = dt.datetime(2024, 1, 1, 9, 0, 0)  # 12:00+03 → 09:00Z
        exp = (utc_wall - dt.datetime(1970, 1, 1)) \
            // dt.timedelta(microseconds=1)
        assert got == exp
        # NTZ naive values are the stored wall clock — tz-independent
        exp_ntz = (naive - dt.datetime(1970, 1, 1)) \
            // dt.timedelta(microseconds=1)
        assert _probe_key("timestamp_ntz", naive) == exp_ntz
    finally:
        monkeypatch.delenv("TZ")
        time.tzset()


# ---------------------------------------------------------------- ADVICE 2
def test_native_cache_dir_per_user_0700(monkeypatch, tmp_path):
    from parquet_go_spark.codecs import _native

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    d = _native._cache_dir("cafebabe")
    assert d is not None and str(tmp_path) in d
    assert f"-{os.getuid()}-" in os.path.basename(d)
    assert (os.stat(d).st_mode & 0o777) == 0o700


@pytest.mark.skipif(os.getuid() != 0, reason="needs root to fake ownership")
def test_native_cache_dir_refuses_foreign_owner(monkeypatch, tmp_path):
    from parquet_go_spark.codecs import _native

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    victim = os.path.join(
        str(tmp_path), f"colcodec-native-{os.getuid()}-attack01")
    os.makedirs(victim)
    os.chown(victim, 12345, 12345)  # another user pre-created the path
    assert _native._cache_dir("attack01") is None


# ------------------------------------------------------------ ADVICE 3 + 4
def test_overwrite_commit_clears_markers_and_staging(spark, tmp_path):
    datasource.register(spark)
    d = str(tmp_path / "owstore")
    src = spark.createDataFrame(
        [(i, f"g{i % 2}", float(i)) for i in range(200)],
        "k bigint, grp string, x double")
    src.write.format("colcodec").option("repo_col", "grp") \
       .mode("append").save(d)
    # simulate a dead streaming query + a crashed job's staging dir
    open(os.path.join(d, "_q0-b00000000.done"), "w").close()
    stale = os.path.join(d, ".staging-deadbeef")
    os.makedirs(stale)
    head = spark.createDataFrame(
        [(1, "g1", 1.0)], "k bigint, grp string, x double")
    head.write.format("colcodec").option("repo_col", "grp") \
        .mode("overwrite").save(d)
    names = os.listdir(d)
    assert not any(n.endswith(".done") for n in names)
    assert not any(n.startswith(".staging") for n in names)
    assert spark.read.format("colcodec").load(d).count() == 1
    # a fresh streaming query restarting batchIds at 0 now really writes
    sq = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .select(
            F.col("value").alias("k"),
            F.lit("g0").alias("grp"),
            F.col("value").cast("double").alias("x"),
        )
        .writeStream.format("colcodec")
        .option("repo_col", "grp")
        .option("path", d)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(60)
    assert spark.read.format("colcodec").load(d).count() >= 1


# ---------------------------------------------------------------- ADVICE 5
def test_push_filters_assigns_eagerly():
    from pyspark.sql.datasource import EqualTo

    from parquet_go_spark.sources.datasource import ColcodecReader

    r = ColcodecReader("/nonexistent", [("k", "bigint")])
    out = r.pushFilters([EqualTo(("k",), 7)])
    # NOT consumed — yet the translation must already be in place
    assert r._filters == [("k", "eq", 7)]
    assert [type(f).__name__ for f in out] == ["EqualTo"]
