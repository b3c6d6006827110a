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


# ------------------------------------------------- VERDICT #2: IVF at scale
def test_ivf_kernel_matches_literal_assignment(spark):
    """The broadcast-matrix mapInArrow kernel must assign every vector
    to the same cell as the literal array_max path (incl. degenerate
    rows and zero-norm centroids)."""
    import numpy as np

    from parquet_go_spark.operators import similarity

    rng = np.random.default_rng(17)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(120)]
    rows += [(900, [0.0] * 8), (901, [float("nan")] + [1.0] * 7)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = similarity.ivf_centroids(df, "embedding", "vec_id", 6)
    cents[2] = (cents[2][0], [0.0] * 8)  # zero-norm centroid never wins
    lit = {r["id"]: r["cell_id"] for r in similarity.ivf_assign(
        df, "embedding", "vec_id", cents, use_kernel=False).collect()}
    ker = {r["id"]: r["cell_id"] for r in similarity.ivf_assign(
        df, "embedding", "vec_id", cents, use_kernel=True).collect()}
    assert lit == ker


def test_ivf_kernel_engages_at_scale_with_bounded_plan(spark):
    """n_cells=4096 × dim=256: the plan must be O(1) in the centroid
    count (broadcast + ArrowEval, no million-literal expression and no
    codegen fallback risk), and assignment must still be narrow."""
    import numpy as np

    from parquet_go_spark.operators import similarity

    rng = np.random.default_rng(23)
    cents = [(i, [float(x) for x in rng.normal(size=256)])
             for i in range(4096)]
    rows = [(i, [float(x) for x in rng.normal(size=256)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = similarity.ivf_assign(df, "embedding", "vec_id", cents)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert len(plan) < 100_000  # 4096×256 literals would be tens of MB
    got = out.collect()
    assert len(got) == 50
    # argmax parity with numpy on a spot row
    cm = np.array([c for _, c in cents])
    cm = cm / np.sqrt((cm * cm).sum(axis=1))[:, None]
    v = np.array(rows[0][1])
    exp_cell = int(np.argmax(cm @ (v / np.sqrt((v * v).sum()))))
    assert {r["id"]: r["cell_id"] for r in got}[0] == exp_cell


def test_ivf_train_partial_sums_any_dim(spark):
    """ivf_train's per-iteration plan must not grow with dim (partial-sum
    kernel, not dim agg expressions) and must still converge on blobs."""
    import numpy as np

    from parquet_go_spark.operators import similarity

    rng = np.random.default_rng(31)
    dim = 96
    blobs = []
    for b in range(3):
        center = rng.normal(size=dim) * 5
        for i in range(15):
            blobs.append((b * 15 + i,
                          [float(v) for v in center + rng.normal(0, .2, dim)]))
    df = spark.createDataFrame(blobs, "vec_id bigint, embedding array<double>")
    trained = similarity.ivf_train(df, "embedding", "vec_id",
                                   n_cells=3, iters=2)
    assigned = similarity.ivf_assign(df, "embedding", "vec_id", trained,
                                     use_kernel=False)
    cells = {r["id"]: r["cell_id"] for r in assigned.collect()}
    for b in range(3):
        assert len({cells[b * 15 + i] for i in range(15)}) == 1


# ----------------------------------------- VERDICT #5: decimal stat pruning
def test_decimal_probe_and_stat_keys():
    from decimal import Decimal

    from parquet_go_spark.sources.datasource import _probe_key, _stat_key

    assert _stat_key("decimal(12,2)", "725") == 725
    assert _probe_key("decimal(12,2)", Decimal("7.25")) == 725
    assert _probe_key("decimal(12,2)", 7) == 700
    # more fractional digits than the scale: no exact representation —
    # rounding would mis-prune range predicates, so keep (None)
    assert _probe_key("decimal(12,2)", Decimal("7.251")) is None
    assert _probe_key("decimal(38,2)", Decimal("1" * 30 + ".25")) \
        == int("1" * 30 + "25")


def test_decimal_chunk_survives_prunes_and_keeps():
    from decimal import Decimal

    from parquet_go_spark.sources.datasource import _chunk_survives

    types = {"price": "decimal(12,2)"}
    stats = {"price": ("100", "999")}  # unscaled: 1.00 .. 9.99
    f_in = [("price", "eq", Decimal("5.00"))]
    f_out = [("price", "gt", Decimal("10.00"))]
    assert _chunk_survives(f_in, types, stats, {})
    assert not _chunk_survives(f_out, types, stats, {})
    assert not _chunk_survives(
        [("price", "lt", Decimal("1.00"))], types, stats, {})
    # inexact literal: never prune
    assert _chunk_survives(
        [("price", "eq", Decimal("5.001"))], types, stats, {})


def test_decimal_pushdown_end_to_end(spark, tmp_path):
    """Decimal predicates over the data source: pruning engages (chunks
    whose unscaled bounds refute the filter are skipped) with results
    identical to the source — incl. a decimal(38,2) FLBA(16) column."""
    from decimal import Decimal

    datasource.register(spark)
    d = str(tmp_path / "decstore")
    src = spark.createDataFrame(
        [(i, f"g{i % 4}") for i in range(2000)], "k bigint, grp string"
    ).select(
        "k", "grp",
        (F.col("k") / 4).cast("decimal(12,2)").alias("price"),
        (F.concat(F.col("k").cast("string"),
                  F.lit("00000000000000000.25"))
         .cast("decimal(38,2)")).alias("big"),
    )
    pipeline.encode_table(spark, src, d, repo_col="grp", salt_cols=["k"],
                          sort_cols=["k"], resume=False)
    df = spark.read.format("colcodec").load(d)
    cases = [
        F.col("price") == F.lit(Decimal("7.25")).cast("decimal(12,2)"),
        F.col("price") > F.lit(Decimal("490.00")).cast("decimal(12,2)"),
        F.col("price") <= F.lit(Decimal("1.50")).cast("decimal(12,2)"),
        F.col("big") == F.lit(Decimal("700000000000000000.25"))
        .cast("decimal(38,2)"),
    ]
    for cond in cases:
        got = sorted(map(str, df.where(cond).collect()))
        exp = sorted(map(str, src.where(cond).collect()))
        assert got == exp and got, str(cond)


# ------------------------------------------ VERDICT #3: O(1) stream offsets
def test_stream_source_offsets_stay_o1(spark, tmp_path):
    """Offsets must not grow with the store: a long-lived tail over many
    appended files keeps the checkpoint entry O(1) (watermark + same-ns
    ties), while each batch still emits exactly the new files."""
    import json

    from parquet_go_spark.sources.datasource import ColcodecStreamReader

    datasource.register(spark)
    store = str(tmp_path / "o1store")
    schema = "k bigint, grp string"

    def append(lo, hi):
        spark.createDataFrame(
            [(i, f"g{i % 2}") for i in range(lo, hi)], schema
        ).write.format("colcodec").option("repo_col", "grp") \
         .mode("append").save(store)

    append(0, 50)
    rdr = ColcodecStreamReader(store, pipeline._read_schema_sidecar(store))
    prev = rdr.initialOffset()
    sizes, emitted = [], set()
    for r in range(6):
        append(50 * (r + 1), 50 * (r + 2))
        cur = rdr.latestOffset()
        sizes.append(len(json.dumps(cur)))
        parts = rdr.partitions(prev, cur)
        names = {os.path.basename(p.path) for p in parts}
        assert not (names & emitted), "re-emission"
        emitted |= names
        prev = cur
    # all files emitted exactly once by the final round
    all_files = {f for f in os.listdir(store)
                 if f.endswith(".parquet") and not f.startswith(("_", "."))}
    assert emitted == all_files and len(all_files) >= 7
    # offset stays O(1): bounded, not ~bytes-per-file
    assert max(sizes) < 400, sizes
    assert sizes[-1] <= sizes[0] + 100  # no growth trend with file count


def test_stream_source_accepts_v1_offsets(spark, tmp_path):
    """Old checkpoints carry v1 {"files": [...]} offsets; the transition
    batch must emit exactly the files not in that list and still detect
    rewrites against it."""
    import pytest as _pytest

    from parquet_go_spark.sources.datasource import ColcodecStreamReader

    datasource.register(spark)
    store = str(tmp_path / "v1store")
    schema = "k bigint, grp string"
    spark.createDataFrame([(1, "a"), (2, "b")], schema) \
        .write.format("colcodec").option("repo_col", "grp") \
        .mode("append").save(store)
    files0 = sorted(f for f in os.listdir(store)
                    if f.endswith(".parquet") and not f.startswith(("_", ".")))
    spark.createDataFrame([(3, "a")], schema) \
        .write.format("colcodec").option("repo_col", "grp") \
        .mode("append").save(store)
    rdr = ColcodecStreamReader(store, pipeline._read_schema_sidecar(store))
    end = rdr.latestOffset()
    parts = rdr.partitions({"files": files0}, end)
    names = {os.path.basename(p.path) for p in parts}
    all_now = {f for f in os.listdir(store)
               if f.endswith(".parquet") and not f.startswith(("_", "."))}
    assert names == all_now - set(files0) and names
    # rewrite detection against a v1 start
    for f in files0:
        os.unlink(os.path.join(store, f))
    with _pytest.raises(RuntimeError, match="rewritten"):
        rdr.partitions({"files": files0}, rdr.latestOffset())


# --------------------------------------- VERDICT #4: VARIANT binary + shred
def test_variant_codec_roundtrip_zoo():
    import decimal
    import uuid as _uuid

    from parquet_go_spark.codecs import variant as V

    zoo = [None, True, False, 0, -5, 127, 128, -32768, 2**40, 3.5,
           "hi", "x" * 100, b"\x00\x01", decimal.Decimal("123.45"),
           dt.date(2024, 2, 1), dt.datetime(2024, 1, 1, 12, 0, 0),
           dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=dt.timezone.utc),
           _uuid.UUID(int=42), [1, "a", None, [2.5]],
           {"b": 1, "a": {"c": [True]}}, {}, []]
    for obj in zoo:
        m, v = V.encode(obj)
        assert V.decode(m, v) == obj, obj
    # malformed: bad version, truncated dictionary
    with pytest.raises(ValueError):
        V.decode_metadata(b"\x02\x00")
    with pytest.raises(ValueError):
        V.decode_metadata(b"\x01\x02\x00\x00\xff")


def test_variant_shredded_golden_fixtures():
    """The reference's canonical parquet-java shredded VARIANT fixtures
    (variant_column_reader_test.go:383-390): read each case through OUR
    pqreader, reconstruct the variant from (metadata, value,
    typed_value), and compare against the .variant.bin goldens decoded
    by OUR variant codec — covering scalar, list (with an unshredded
    element mix), and partially-shredded object typed_values."""
    from parquet_go_spark.codecs import variant as V
    from parquet_go_spark.interop import pqreader

    base = "/root/reference/testdata/shredded_variant"
    for case, n in (("case-004", 1), ("case-045", 4), ("case-134", 1)):
        rows = pqreader.read_rows(f"{base}/{case}.parquet")
        assert len(rows) == n
        for i, r in enumerate(rows):
            var = r["var"]
            got = V.reconstruct_shredded(
                var["metadata"], var["value"], var["typed_value"])
            want = V.decode_bin(
                open(f"{base}/{case}_row-{i}.variant.bin", "rb").read())
            assert got == want, (case, i, got, want)


def test_variant_shred_unshred_pipeline(spark):
    import json

    from parquet_go_spark.operators import variant as vops

    rows = [(i, json.dumps(
        {"a": i, "b": f"s{i}", "c": i * 7 % 13, "d": f"p{i % 3}"}
        if i % 4 else {"a": i, "b": f"s{i}"})) for i in range(200)]
    df = spark.createDataFrame(rows, "k bigint, js string")
    sh = vops.shred_json(df, "js", [("a", "bigint"), ("b", "string")])
    # fully-shredded rows carry a NULL residual (the spec's rule)
    n_resid = sh.where(F.col("var.value").isNotNull()).count()
    assert n_resid == 200 - len([i for i in range(200) if i % 4 == 0])
    out = str(spark.conf.get("spark.local.dir", "/tmp")) + "/varstore"
    import shutil as _sh
    import tempfile as _tf
    out = _tf.mkdtemp(prefix="varstore-")
    pipeline.encode_table(
        spark, sh.withColumn("grp", (F.col("k") % 5).cast("string")),
        out, repo_col="grp", salt_cols=["k"], sort_cols=["k"],
        resume=False)
    un = vops.unshred_json(pipeline.decode_table(spark, out), "var")
    got = {r["k"]: r["json"] for r in un.collect()}
    for i, js in rows:
        exp = json.dumps(dict(sorted(json.loads(js).items())),
                         separators=(",", ":"))
        assert got[i] == exp, i
    _sh.rmtree(out, ignore_errors=True)


# --------------------------------------- VERDICT #6: read-direction parquet
def _canon_type(t):
    """All-nullable, default-field-name version of an Arrow type, so
    files compare on VALUES (our reader normalizes list item names and
    required-ness — metadata, not data)."""
    import pyarrow as pa

    if pa.types.is_struct(t):
        return pa.struct([pa.field(f.name, _canon_type(f.type))
                          for f in t])
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pa.list_(_canon_type(t.value_type))
    if pa.types.is_map(t):
        return pa.map_(_canon_type(t.key_type), _canon_type(t.item_type))
    return t


def test_pqreader_reference_corpus_matches_pyarrow():
    """EVERY .parquet file in the reference's testdata decodes through
    our kernels equal to pyarrow — flat scalars, every encoding, v2
    pages, INT96, all decimal physical forms (INT32/INT64/BYTE_ARRAY/
    FLBA), the null type, deep nesting (list-of-list-of-list, map of
    map, impala legacy 2-level lists, bare repeated groups)."""
    import glob as _glob

    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    files = sorted(_glob.glob("/root/reference/testdata/*.parquet"))
    assert len(files) >= 45
    for path in files:
        ours = pqreader.read_table(path)
        ref = pq.read_table(path)
        assert ours.num_rows == ref.num_rows, path
        for name in ref.schema.names:
            a = ours.column(name).combine_chunks()
            b = ref.column(name).combine_chunks()
            ct = _canon_type(b.type)
            a = a.cast(ct) if a.type != ct else a
            b = b.cast(ct) if b.type != ct else b
            assert a.equals(b), (path, name)


def test_pqreader_deep_nesting_stress(tmp_path):
    """Synthetic list<list<int>> / list<struct<list>> / map<.., list>
    with nulls at EVERY level, across many tiny pages and several row
    groups — the depth-general Dremel assembly must agree with pyarrow
    on its own files."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    rng = random.Random(42)

    def inner():
        r = rng.random()
        if r < 0.15:
            return None
        if r < 0.3:
            return []
        return [None if rng.random() < 0.2 else rng.randrange(1000)
                for _ in range(rng.randrange(1, 5))]

    def outer():
        r = rng.random()
        if r < 0.1:
            return None
        if r < 0.2:
            return []
        return [inner() for _ in range(rng.randrange(1, 4))]

    n = 2000
    ll = [outer() for _ in range(n)]
    ls = [None if rng.random() < 0.1 else
          [{"a": rng.randrange(50),
            "b": inner()} for _ in range(rng.randrange(3))]
          for _ in range(n)]
    mp = [None if rng.random() < 0.1 else
          [(f"k{j}", inner()) for j in range(rng.randrange(3))]
          for _ in range(n)]
    tbl = pa.table({
        "ll": pa.array(ll, type=pa.list_(pa.list_(pa.int64()))),
        "ls": pa.array(ls, type=pa.list_(pa.struct(
            [("a", pa.int32()), ("b", pa.list_(pa.int64()))]))),
        "mp": pa.array(mp, type=pa.map_(pa.string(),
                                        pa.list_(pa.int64()))),
    })
    path = str(tmp_path / "deep.parquet")
    pq.write_table(tbl, path, row_group_size=700, data_page_size=512,
                   use_dictionary=False)
    ours = pqreader.read_table(path)
    ref = pq.read_table(path)
    for name in ref.schema.names:
        a = ours.column(name).combine_chunks()
        b = ref.column(name).combine_chunks()
        ct = _canon_type(b.type)
        a = a.cast(ct) if a.type != ct else a
        b = b.cast(ct) if b.type != ct else b
        assert a.equals(b), name


def test_pqreader_roundtrips_our_writer(spark, tmp_path):
    """Everything our pqwriter exports — flat scalars, LIST, MAP,
    STRUCT — must decode back bit-equal through pqreader (write
    direction round 3, read direction round 4; the exporter does not
    write decimals, so none appear here)."""
    from parquet_go_spark.interop import export as iexport
    from parquet_go_spark.interop import pqreader

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(500)], "k bigint, grp string"
    ).select(
        "k", "grp",
        (F.col("k") / 4.0).alias("price"),
        F.array(F.col("k").cast("float"),
                (F.col("k") * 2).cast("float")).alias("vec"),
        F.create_map(F.lit("s"), F.col("grp")).alias("attrs"),
        F.struct(F.col("grp").alias("g"),
                 F.when(F.col("k") % 4 == 0, None)
                 .otherwise(F.col("k")).alias("kk")).alias("props"),
    )
    d = str(tmp_path / "pqx")
    iexport.export_parquet(spark, df, d, repo_col="grp",
                           salt_cols=["k"], target_chunk_bytes=64 << 10)
    import glob as _glob
    import pyarrow as pa

    parts = [pqreader.read_table(p)
             for p in sorted(_glob.glob(d + "/*.parquet"))]
    ours = pa.concat_tables(parts)
    import pyarrow.parquet as pq
    ref = pq.read_table(d)
    key = lambda t: sorted(map(str, t.to_pylist()))  # noqa: E731
    assert key(ours) == key(ref)
    assert ours.num_rows == 500


def test_pqreader_rejects_malformed(tmp_path):
    from parquet_go_spark.interop import pqreader

    bad = tmp_path / "bad.parquet"
    bad.write_bytes(b"NOPE" + b"\x00" * 64 + b"NOPE")
    with pytest.raises(ValueError, match="not a parquet"):
        pqreader.read_table(str(bad))
    trunc = tmp_path / "trunc.parquet"
    trunc.write_bytes(b"PAR1" + b"\xff\xff\xff\x7f" + b"PAR1")
    with pytest.raises(ValueError):
        pqreader.read_table(str(trunc))


def test_pqreader_spark_read_distributed(spark, tmp_path):
    from parquet_go_spark.interop import export as iexport
    from parquet_go_spark.interop import pqreader

    src = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i) / 3) for i in range(1000)],
        "k bigint, grp string, x double")
    d = str(tmp_path / "pqspark")
    iexport.export_parquet(spark, src, d, repo_col="grp",
                           salt_cols=["k"], target_chunk_bytes=32 << 10)
    back = pqreader.spark_read(spark, d)
    assert sorted(map(str, back.collect())) == sorted(map(str, src.collect()))


# ------------------------------------- VERDICT #8: data-source plan pinning
def test_datasource_read_pruning_shape(spark, tmp_path, monkeypatch):
    """Pin the task-side pruning shape of ColcodecReader.read(): the
    pre-scan touches ONLY metadata columns (never the blob bytes), the
    surviving-chunk decode uses a row-level chunk_id dataset filter, and
    a refuted-everywhere filter decodes nothing at all."""
    import pyarrow.parquet as pq

    from parquet_go_spark.sources.datasource import ColcodecReader, EqualTo

    d = str(tmp_path / "pinstore")
    src = spark.createDataFrame(
        [(i, f"g{i % 4}", float(i)) for i in range(2000)],
        "k bigint, grp string, x double")
    pipeline.encode_table(spark, src, d, repo_col="grp", salt_cols=["k"],
                          sort_cols=["k"], resume=False)
    cols = pipeline._read_schema_sidecar(d)

    calls = []
    real_read = pq.read_table

    def spy(path, *a, **kw):
        calls.append(kw)
        return real_read(path, *a, **kw)

    monkeypatch.setattr(pq, "read_table", spy)

    r = ColcodecReader(d, cols)
    r.pushFilters([EqualTo(("k",), 7)])
    parts = r.partitions()
    rows = [row for p in parts for b in (r.read(p) or []) for row in [b]]
    # 1) the FIRST read per file is metadata-only: no blob column
    meta_calls = [c for c in calls if c.get("columns")]
    assert meta_calls and all("blob" not in c["columns"]
                              for c in meta_calls)
    # 2) surviving chunks decode through a row-level chunk_id filter —
    #    and the survivors are a PROPER subset of the store's chunks
    data_calls = [c for c in calls
                  if c.get("filters") and
                  any(f[0] == "chunk_id" for f in c["filters"])]
    assert data_calls
    kept = {cid for c in data_calls
            for f in c["filters"] if f[0] == "chunk_id"
            for cid in f[2]}
    all_chunks = set(
        pipeline.manifest(spark, d).select("chunk_id").distinct()
        .toPandas()["chunk_id"])
    assert kept and kept < all_chunks
    # 3) decoded output still contains the match (Spark re-filters later)
    import pyarrow as pa
    got = pa.Table.from_batches(
        [b for p in r.partitions() for b in (r.read(p) or [])])
    assert 7 in set(got.column("k").to_pylist())

    # 4) refuted everywhere: nothing decodes — no chunk_id'd data read
    calls.clear()
    r2 = ColcodecReader(d, cols)
    r2.pushFilters([EqualTo(("k",), -10**9)])
    out = [b for p in r2.partitions() for b in (r2.read(p) or [])]
    assert out == []
    assert not [c for c in calls if c.get("filters") and
                any(f[0] == "chunk_id" for f in c["filters"])]


# ----------------------------------------------- review-pass regressions
def test_pqreader_big_endian_flba_decimals(tmp_path):
    """Parquet stores FLBA decimals big-endian two's-complement at ANY
    width (parquet-mr writes minimal bytes) — not our blob store's LE
    words. Externally written decimal columns must decode exactly."""
    import decimal

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    vals = [decimal.Decimal("12345678901234567890123456789012345.67"),
            decimal.Decimal("-0.01"), decimal.Decimal("7.25"), None]
    tbl = pa.table({
        "big": pa.array(vals, pa.decimal128(38, 2)),
        "small": pa.array([decimal.Decimal("1.5"), None,
                           decimal.Decimal("-2.25"),
                           decimal.Decimal("99.99")],
                          pa.decimal128(10, 2)),
    })
    p = str(tmp_path / "dec.parquet")
    pq.write_table(tbl, p, use_dictionary=False)
    ours = pqreader.read_table(p)
    assert ours.column("big").to_pylist() == tbl.column("big").to_pylist()
    assert ours.column("small").to_pylist() \
        == tbl.column("small").to_pylist()


def test_pqreader_decimal256_and_int_backed(tmp_path):
    """Spec-legal DECIMAL precision > 38 (BYTE_ARRAY / FLBA >= 17 bytes)
    maps to decimal256 like pyarrow, not an uncontrolled ArrowInvalid;
    DuckDB's INT32/INT64-backed decimals take the vectorized
    _values_to_decimal path and still decode exactly."""
    import decimal

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    vals = [decimal.Decimal("12345678901234567890123456789012345678.90"),
            decimal.Decimal("-0.01"), None]
    tbl = pa.table({"huge": pa.array(vals, pa.decimal256(40, 2))})
    p = str(tmp_path / "dec256.parquet")
    pq.write_table(tbl, p, use_dictionary=False)
    ours = pqreader.read_table(p)
    assert ours.schema.field("huge").type == pa.decimal256(40, 2)
    assert ours.column("huge").to_pylist() == vals

    # int32/int64 physical decimals (DuckDB writes these forms)
    p2 = str(tmp_path / "decint.parquet")
    duckdb.connect().execute(
        "COPY (SELECT (i - 500)/4.0::decimal(9,2) AS d32,"
        "             (i * 1000000 - 13)/8.0::decimal(18,3) AS d64 "
        "      FROM range(1000) t(i)) TO '" + p2 + "' (FORMAT parquet)")
    ref = pq.read_table(p2)
    got = pqreader.read_table(p2)
    assert got.schema == ref.schema
    assert got.to_pylist() == ref.to_pylist()


def test_compact_export_inherits_decimals(spark, tmp_path):
    """Small-file compaction on an export directory whose schema now
    carries DECIMAL columns (round-4 write feature) must run and keep
    values exact — to_spark() used to KeyError on decimal128(p, s)."""
    import glob

    import pyarrow.parquet as pq

    from parquet_go_spark.interop.compact import compact_export
    from parquet_go_spark.interop.export import export_parquet

    df = spark.createDataFrame(
        [(i, f"g{i % 40}") for i in range(4000)], "k bigint, grp string"
    ).select(
        "k", "grp",
        (F.col("k") / 4 - 100).cast("decimal(12,2)").alias("price"),
        (F.concat(F.col("k").cast("string"),
                  F.lit("00000000000000000.25")).cast("decimal(38,2)")
         ).alias("big"),
    )
    out = str(tmp_path / "deccmp")
    export_parquet(spark, df, out, repo_col="grp", salt_cols=["k"])
    before = sorted(glob.glob(out + "/*.parquet"))
    done = compact_export(spark, out, small_bytes=4 << 20,
                          target_bytes=2 << 20)
    after = sorted(glob.glob(out + "/*.parquet"))
    assert done.count() > 0 and len(after) < len(before)
    cols = ["k", "grp", "price", "big"]
    assert sorted(map(str, spark.read.parquet(out + "/*.parquet")
                      .select(*cols).collect())) \
        == sorted(map(str, df.select(*cols).collect()))
    assert pq.read_table(out).num_rows == 4000


def test_shred_json_nested_residual(spark):
    """Residual values may be nested objects/arrays: the metadata
    dictionary must cover their keys recursively (was: KeyError in the
    executor), and the round trip must reproduce them."""
    import json

    from parquet_go_spark.operators import variant as vops

    rows = [(1, json.dumps({"a": 1, "x": {"y": 2, "z": [1, 2]}, "w": [
        {"q": "s"}]}))]
    df = spark.createDataFrame(rows, "k bigint, js string")
    sh = vops.shred_json(df, "js", [("a", "bigint")])
    got = vops.unshred_json(sh, "var").collect()[0]["json"]
    assert json.loads(got) == {"a": 1, "x": {"y": 2, "z": [1, 2]},
                               "w": [{"q": "s"}]}


def test_reconstruct_shredded_null_array_element():
    from parquet_go_spark.codecs import variant as V

    meta = V.encode_metadata([])
    got = V.reconstruct_shredded(
        meta, None,
        [{"value": None, "typed_value": "a"}, None,
         {"value": None, "typed_value": None}])
    assert got == ["a", None, None]  # never the _MISSING sentinel


def test_ivf_kernel_tolerates_null_and_ragged_vectors(spark):
    import numpy as np

    from parquet_go_spark.operators import similarity

    rng = np.random.default_rng(41)
    rows = [(i, [float(x) for x in rng.normal(size=6)]) for i in range(40)]
    rows += [(900, None), (901, [1.0, 2.0]),  # null + wrong-dim
             (902, [0.0] * 6)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = similarity.ivf_centroids(
        df.where(F.col("vec_id") < 40), "embedding", "vec_id", 4)
    lit = {r["id"]: r["cell_id"] for r in similarity.ivf_assign(
        df, "embedding", "vec_id", cents, use_kernel=False).collect()}
    ker = {r["id"]: r["cell_id"] for r in similarity.ivf_assign(
        df, "embedding", "vec_id", cents, use_kernel=True).collect()}
    assert lit == ker and 900 in ker
    # training ignores degenerate rows instead of crashing
    trained = similarity.ivf_train(df, "embedding", "vec_id",
                                   n_cells=4, iters=1, cents=cents)
    assert len(trained) == 4


def test_bloom_point_decode_inexact_decimal_returns_empty(spark, tmp_path):
    from decimal import Decimal

    d = str(tmp_path / "bpstore")
    src = spark.createDataFrame(
        [(i, f"g{i % 2}") for i in range(200)], "k bigint, grp string"
    ).select("k", "grp",
             (F.col("k") / 4).cast("decimal(12,2)").alias("price"))
    pipeline.encode_table(spark, src, d, repo_col="grp", salt_cols=["k"],
                          sort_cols=["k"], resume=False)
    out = pipeline.bloom_point_decode(spark, d, "price", Decimal("7.251"))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["k", "grp", "price"]


def test_translate_filters_anchors_naive_timestamps():
    """Naive TimestampType literals must resolve to UTC on the DRIVER
    (pushFilters side) — executors may run in a different OS tz and
    would otherwise mis-prune."""
    from pyspark.sql.datasource import EqualTo, In

    from parquet_go_spark.sources.datasource import _translate_filters

    naive = dt.datetime(2024, 1, 1, 12, 0, 0)
    out = _translate_filters(
        [EqualTo(("ts",), naive), In(("ts",), (naive,)),
         EqualTo(("nts",), naive)],
        {"ts": "timestamp", "nts": "timestamp_ntz"})
    assert out[0][2].tzinfo is not None          # anchored, aware
    assert out[1][2][0].tzinfo is not None
    assert out[2][2].tzinfo is None              # NTZ stays wall-clock


def test_pqreader_read_schema_footer_only(spark, tmp_path):
    from parquet_go_spark.interop import export as iexport
    from parquet_go_spark.interop import pqreader

    src = spark.createDataFrame(
        [(i, f"g{i % 2}", float(i)) for i in range(100)],
        "k bigint, grp string, x double")
    d = str(tmp_path / "schonly")
    iexport.export_parquet(spark, src, d, repo_col="grp", salt_cols=["k"])
    import glob as _glob
    f = sorted(_glob.glob(d + "/*.parquet"))[0]
    assert pqreader.read_schema(f) == pqreader.read_table(f).schema


# ------------------------------------------- round-4: decimal parquet WRITE
def test_export_parquet_decimals_all_readers(spark, tmp_path):
    """DECIMAL columns (INT32/INT64/FLBA(16)-backed, incl. negatives and
    a struct field) export as spec parquet — ConvertedType DECIMAL +
    scale/precision + DecimalType logicalType, FLBA big-endian — and
    read back equal through Spark's parquet-mr, pyarrow, DuckDB, and
    our own pqreader. FLBA decimal chunks carry NO min/max stats (raw
    byte order is not value order across signs — null bounds can never
    mis-prune)."""
    import glob as _glob

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import export as iexport
    from parquet_go_spark.interop import pqreader

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(2000)], "k bigint, grp string"
    ).select(
        "k", "grp",
        (F.col("k") / 4 - 100).cast("decimal(12,2)").alias("price"),
        ((F.col("k") % 7) - 3).cast("decimal(7,0)").alias("small"),
        (F.concat(F.col("k").cast("string"),
                  F.lit("00000000000000000.25")).cast("decimal(38,2)")
         * F.when(F.col("k") % 2 == 0, -1).otherwise(1)).alias("big"),
        F.struct((F.col("k") / 8).cast("decimal(10,3)").alias("sp"))
        .alias("s"),
    )
    d = str(tmp_path / "decexp")
    iexport.export_parquet(spark, df, d, repo_col="grp", salt_cols=["k"])
    cols = ["k", "grp", "price", "small", "big", "s"]
    exp = sorted(map(str, df.select(*cols).collect()))
    assert sorted(map(str,
                      spark.read.parquet(d).select(*cols).collect())) == exp
    ref = pq.read_table(d)
    assert str(ref.schema.field("big").type) == "decimal128(38, 2)"
    assert str(ref.schema.field("small").type) == "decimal128(7, 0)"
    con = duckdb.connect()
    n, lo, hi = con.execute(
        f"SELECT count(*), min(big), max(big) "
        f"FROM read_parquet('{d}/*.parquet')").fetchone()
    assert n == 2000 and lo < 0 < hi
    ours = pa.concat_tables([pqreader.read_table(p) for p in
                             sorted(_glob.glob(d + "/*.parquet"))])
    assert sorted(map(str, ours.to_pylist())) \
        == sorted(map(str, ref.to_pylist()))
    # FLBA decimal chunks: no Statistics bounds, no ColumnIndex
    f0 = sorted(_glob.glob(d + "/*.parquet"))[0]
    md = pq.ParquetFile(f0).metadata
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            if col.path_in_schema == "big":
                st = col.statistics
                assert st is None or not st.has_min_max
            if col.path_in_schema == "price":  # INT64-backed: stats kept
                assert col.statistics.has_min_max


# -------------------------------------- round-4: reader-side pruning
def _count_chunk_reads(monkeypatch):
    """Patch _read_leaf_chunk to count decoded chunks (pruned row
    groups must never reach it)."""
    from parquet_go_spark.interop import pqreader

    calls = []
    orig = pqreader._read_leaf_chunk

    def spy(data, meta, leaf, *a, **kw):
        calls.append(leaf.path)
        return orig(data, meta, leaf, *a, **kw)

    monkeypatch.setattr(pqreader, "_read_leaf_chunk", spy)
    return calls


def test_pqreader_predicate_prunes_row_groups(monkeypatch, tmp_path):
    """predicate=(col, op, v) skips row groups refuted by footer
    min/max stats WITHOUT reading their data pages, on an externally
    written (pyarrow) file, and returns exactly the matching rows."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    n = 8000
    tbl = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "name": pa.array([f"row-{i:06d}" for i in range(n)]),
        "price": pa.array([i / 7.0 for i in range(n)], pa.float64()),
    })
    p = str(tmp_path / "sorted.parquet")
    pq.write_table(tbl, p, row_group_size=1000)  # 8 row groups
    assert pq.ParquetFile(p).metadata.num_row_groups == 8

    calls = _count_chunk_reads(monkeypatch)
    got = pqreader.read_table(p, predicate=("k", ">=", 7500))
    assert got.num_rows == 500
    assert got.column("k").to_pylist() == list(range(7500, 8000))
    assert len(calls) == 3  # one surviving row group × 3 columns

    calls.clear()
    got = pqreader.read_table(p, columns=["k", "name"],
                              predicate=("k", "=", 2500))
    assert got.to_pylist() == [{"k": 2500, "name": "row-002500"}]
    assert len(calls) == 2  # 1 rg × 2 projected columns

    # string stats prune too (possibly-truncated bounds stay sound)
    calls.clear()
    got = pqreader.read_table(p, predicate=("name", "<", "row-000010"))
    assert got.num_rows == 10
    assert len(calls) == 3

    # refuted everywhere: zero data bytes touched
    calls.clear()
    got = pqreader.read_table(p, predicate=("k", ">", 10**9))
    assert got.num_rows == 0 and calls == []

    # exactness: predicate inside a surviving group == pyarrow filter
    exp = tbl.filter(pc.less(pc.field("price"), 3.0))
    got = pqreader.read_table(p, predicate=("price", "<", 3.0))
    assert got.to_pylist() == exp.to_pylist()


def test_pqreader_bloom_prunes_within_stat_range(monkeypatch, tmp_path):
    """An equality probe that stats cannot refute (value inside
    [min, max]) still skips the row group via its split-block bloom."""
    import numpy as np

    from parquet_go_spark.interop import pqreader
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table
    from parquet_go_spark.codecs.kinds import Kind

    evens = np.arange(0, 2000, 2, dtype=np.int64)  # 3 is inside [0,1998]
    write_table(str(tmp_path / "ev.parquet"),
                [ColumnSpec("k", Kind.INT64, evens)],
                row_group_rows=500, bloom_columns=["k"])
    p = str(tmp_path / "ev.parquet")

    calls = _count_chunk_reads(monkeypatch)
    got = pqreader.read_table(p, predicate=("k", "=", 3))
    assert got.num_rows == 0 and calls == []  # all 4 rgs bloom-refuted

    got = pqreader.read_table(p, predicate=("k", "=", 1002))
    assert got.column("k").to_pylist() == [1002]
    assert len(calls) == 1  # only the owning row group decoded


def test_pqreader_predicate_typed_columns(tmp_path):
    """Timestamps (aware + naive-as-UTC literals), dates, and decimals
    (int-backed stats; FLBA(16) via bloom) prune and filter exactly."""
    import datetime as _dt
    import decimal

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    base = _dt.datetime(2024, 5, 1, tzinfo=_dt.timezone.utc)
    n = 4000
    tbl = pa.table({
        "ts": pa.array([base + _dt.timedelta(minutes=i) for i in range(n)],
                       pa.timestamp("us", tz="UTC")),
        "day": pa.array([_dt.date(2024, 1, 1) + _dt.timedelta(days=i % 90)
                         for i in range(n)]),
        "amt": pa.array([decimal.Decimal(i) / 100 for i in range(n)],
                        pa.decimal128(9, 2)),
    })
    p = str(tmp_path / "typed.parquet")
    pq.write_table(tbl, p, row_group_size=1000)

    cut_aware = base + _dt.timedelta(minutes=3990)
    got = pqreader.read_table(p, predicate=("ts", ">=", cut_aware))
    assert got.num_rows == 10
    # naive literal == same instant read as UTC
    cut_naive = cut_aware.replace(tzinfo=None)
    same = pqreader.read_table(p, predicate=("ts", ">=", cut_naive))
    assert same.num_rows == 10

    got = pqreader.read_table(p, predicate=("day", "=", _dt.date(2024, 1, 5)))
    assert got.num_rows == len(
        [1 for i in range(n) if i % 90 == 4])

    got = pqreader.read_table(
        p, predicate=("amt", "<", decimal.Decimal("1.00")))
    assert got.num_rows == 100

    # INT64-backed decimals (DuckDB's physical form): stats PRUNE
    import duckdb

    p3 = str(tmp_path / "decint64.parquet")
    duckdb.connect().execute(
        "COPY (SELECT (i/100.0)::decimal(18,2) AS amt FROM range(4000) "
        "t(i) ORDER BY i) TO '" + p3
        + "' (FORMAT parquet, ROW_GROUP_SIZE 1000)")
    got = pqreader.read_table(
        p3, predicate=("amt", ">=", decimal.Decimal("39.50")))
    assert got.num_rows == 50

    # FLBA(16) decimal: stats are unusable by design, bloom still prunes
    from parquet_go_spark.interop.pqwriter import write_table

    vals = [decimal.Decimal(i * 2) / 100 for i in range(2000)]  # evens
    # build FLBA(16) big-endian rows the way the writer does
    import numpy as np
    ints = [int(v.scaleb(2)) for v in vals]
    rows = np.frombuffer(
        b"".join(i.to_bytes(16, "big", signed=True) for i in ints),
        np.uint8).reshape(-1, 16)
    from parquet_go_spark.interop.pqwriter import ColumnSpec
    from parquet_go_spark.codecs.kinds import Kind
    p2 = str(tmp_path / "flbadec.parquet")
    write_table(p2, [ColumnSpec("amt", Kind.FIXED_LEN_BYTE_ARRAY, rows,
                                flba_size=16, logical="decimal(38,2)")],
                row_group_rows=500, bloom_columns=["amt"])
    got = pqreader.read_table(
        p2, predicate=("amt", "=", decimal.Decimal("0.03")))  # odd: absent
    assert got.num_rows == 0
    got = pqreader.read_table(
        p2, predicate=("amt", "=", decimal.Decimal("10.02")))
    assert got.num_rows == 1


def test_pqreader_predicate_errors(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from parquet_go_spark.interop import pqreader

    tbl = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                    "tags": pa.array([[1], [2], [3]],
                                     pa.list_(pa.int64()))})
    p = str(tmp_path / "err.parquet")
    pq.write_table(tbl, p)
    with _pt.raises(ValueError, match="unsupported predicate op"):
        pqreader.read_table(p, predicate=("k", "~", 1))
    with _pt.raises(ValueError, match="not found"):
        pqreader.read_table(p, predicate=("zz", "=", 1))
    with _pt.raises(ValueError, match="scalar column"):
        pqreader.read_table(p, predicate=("tags", "=", 1))
    with _pt.raises(ValueError, match="not in the projected"):
        pqreader.read_table(p, columns=["tags"], predicate=("k", "=", 1))
    with _pt.raises(ValueError, match="not representable"):
        pqreader.read_table(p, predicate=("k", "=", "abc"))


def test_pqreader_spark_read_pushdown(spark, tmp_path):
    """spark_read ships projection + predicate into every task; result
    matches Spark's own parquet reader with the same filter."""
    import glob

    from parquet_go_spark.interop import pqreader

    d = str(tmp_path / "sr")
    spark.range(20000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("n-"), F.col("id")).alias("name"),
        (F.col("id") % 97).cast("double").alias("v"),
    ).repartition(4).write.parquet(d)
    assert len(glob.glob(d + "/*.parquet")) == 4

    ours = pqreader.spark_read(spark, d, columns=["k", "name"],
                               predicate=("k", "<", 250))
    assert [f.name for f in ours.schema.fields] == ["k", "name"]
    exp = (spark.read.parquet(d).where(F.col("k") < 250)
           .select("k", "name"))
    assert sorted(map(str, ours.collect())) == sorted(map(str,
                                                          exp.collect()))


def test_pqreader_predicate_never_drops_rows_fuzz(tmp_path):
    """Property: for ANY table/row-group split/op/literal, pruned+
    filtered read_table equals pyarrow's unpruned read + compute
    filter. Catches unsound stat comparisons (the failure mode that
    silently loses rows)."""
    from hypothesis import given, settings, HealthCheck
    from hypothesis import strategies as st

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    pc_ops = {"=": pc.equal, "<": pc.less, "<=": pc.less_equal,
              ">": pc.greater, ">=": pc.greater_equal}

    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        data=st.data(),
        kind=st.sampled_from(["i64", "f64", "str"]),
        op=st.sampled_from(["=", "<", "<=", ">", ">="]),
        rg=st.integers(min_value=1, max_value=50),
        sort=st.booleans(),
        pageidx=st.booleans(),
    )
    def check(data, kind, op, rg, sort, pageidx):
        n = data.draw(st.integers(min_value=1, max_value=120))
        if kind == "i64":
            elems = st.integers(min_value=-2**63, max_value=2**63 - 1)
            typ = pa.int64()
        elif kind == "f64":
            elems = st.floats(allow_nan=False, width=64)
            typ = pa.float64()
        else:
            elems = st.text(max_size=20)
            typ = pa.string()
        vals = data.draw(st.lists(
            st.one_of(st.none(), elems), min_size=n, max_size=n))
        lit = data.draw(elems)
        if sort:
            vals = sorted([v for v in vals if v is not None]) \
                + [v for v in vals if v is None]
        tbl = pa.table({"x": pa.array(vals, typ)})
        p = str(tmp_path / f"fuzz-{kind}.parquet")
        pq.write_table(tbl, p, row_group_size=rg,
                       write_page_index=pageidx,
                       data_page_size=64 if pageidx else None)
        got = pqreader.read_table(p, predicate=("x", op, lit))
        exp = tbl.filter(pc_ops[op](tbl.column("x"), pa.scalar(lit, typ)))
        assert got.column("x").to_pylist() == exp.column("x").to_pylist()

    check()


def test_pqreader_page_level_skipping(monkeypatch, tmp_path):
    """Inside a surviving row group, pages refuted by the ColumnIndex
    never decode, and the other projected columns decode only the
    pages overlapping the surviving rows (OffsetIndex alignment) —
    the column_index.go search-path analog."""
    import numpy as np
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table
    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.codecs.bytearrays import ByteArrays

    n = 20000
    k = np.arange(n, dtype=np.int64)
    names = ByteArrays.from_pylist(
        [f"row-{i:07d}".encode() for i in range(n)])
    price = (k % 977).astype(np.float64)
    p = str(tmp_path / "paged.parquet")
    write_table(p, [ColumnSpec("k", Kind.INT64, k),
                    ColumnSpec("name", Kind.BYTE_ARRAY, names,
                               logical="string"),
                    ColumnSpec("price", Kind.DOUBLE, price)],
                page_rows=1000, row_group_rows=n)  # 1 rg × 20 pages/col
    assert pq.ParquetFile(p).metadata.num_row_groups == 1

    pages = []
    orig = pqreader._decode_page

    def spy(data, pos, leaf, codec, dictionary_vals, *a, **kw):
        out = orig(data, pos, leaf, codec, dictionary_vals, *a, **kw)
        if out[0] == "data":
            pages.append(leaf.path)
        return out

    monkeypatch.setattr(pqreader, "_decode_page", spy)

    got = pqreader.read_table(p, predicate=("k", ">=", 18500))
    assert got.column("k").to_pylist() == list(range(18500, n))
    assert got.column("name").to_pylist()[0] == "row-0018500"
    # 2 surviving pages (18000-18999, 19000-19999) × 3 columns
    assert len(pages) == 6

    pages.clear()
    got = pqreader.read_table(p, columns=["k", "price"],
                              predicate=("k", "=", 4242))
    assert got.to_pylist() == [{"k": 4242, "price": float(4242 % 977)}]
    assert len(pages) == 2  # one page per projected column

    # rows with nulls in OTHER columns keep alignment across pages
    valid = (k % 3 != 0)
    p2 = str(tmp_path / "pagednull.parquet")
    write_table(p2, [ColumnSpec("k", Kind.INT64, k),
                     ColumnSpec("v", Kind.DOUBLE, price[valid],
                                validity=valid)],
                page_rows=1000, row_group_rows=n)
    got = pqreader.read_table(p2, predicate=("k", ">=", 17777))
    exp = [None if i % 3 == 0 else float(i % 977)
           for i in range(17777, n)]
    assert got.column("v").to_pylist() == exp


def test_pqreader_page_skipping_external_pyarrow(tmp_path):
    """Page skipping on a pyarrow-written file (write_page_index=True)
    gives the same rows as pyarrow's own filtered read."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    n = 50000
    tbl = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "tag": pa.array([f"t{i % 17}" for i in range(n)]),
    })
    p = str(tmp_path / "pa_paged.parquet")
    pq.write_table(tbl, p, row_group_size=n, data_page_size=4096,
                   write_page_index=True, use_dictionary=False)
    got = pqreader.read_table(p, predicate=("k", "<", 123))
    exp = tbl.filter(pc.less(pc.field("k"), 123))
    assert got.column("k").to_pylist() == exp.column("k").to_pylist()
    assert got.column("tag").to_pylist() == exp.column("tag").to_pylist()


def test_pqreader_row_range_seek(monkeypatch, tmp_path):
    """row_range=(start, stop) is the SeekToRow analog (reader.go):
    row groups outside the range read zero chunks; with page indexes a
    partially-covered group decodes only the overlapping pages; nested
    schemas fall back to decode+slice but stay exact."""
    import pyarrow as pa
    import pyarrow.compute as pc  # noqa: F401
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    n = 10000
    tbl = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "name": pa.array([f"r{i}" for i in range(n)]),
    })
    p = str(tmp_path / "seek.parquet")
    pq.write_table(tbl, p, row_group_size=1000, data_page_size=2048,
                   write_page_index=True, use_dictionary=False)

    calls = _count_chunk_reads(monkeypatch)
    got = pqreader.read_table(p, row_range=(4500, 4600))
    assert got.to_pylist() == tbl.slice(4500, 100).to_pylist()
    assert calls == []  # partial group went through the page path

    # spanning a group boundary, mixing full and partial groups
    got = pqreader.read_table(p, row_range=(2990, 5010))
    assert got.to_pylist() == tbl.slice(2990, 2020).to_pylist()

    # out-of-file tail clamps; empty range is empty
    assert pqreader.read_table(p, row_range=(n - 5, n + 99)).num_rows == 5
    assert pqreader.read_table(p, row_range=(42, 42)).num_rows == 0

    # composes with a predicate (range first, then exact filter)
    got = pqreader.read_table(p, row_range=(1000, 3000),
                              predicate=("k", ">=", 2500))
    assert got.column("k").to_pylist() == list(range(2500, 3000))

    # nested fallback: list column, no page path — still exact
    tbl2 = pa.table({
        "k": pa.array(range(500), pa.int64()),
        "tags": pa.array([[i, i + 1] if i % 5 else None
                          for i in range(500)],
                         pa.list_(pa.int64())),
    })
    p2 = str(tmp_path / "seeknested.parquet")
    pq.write_table(tbl2, p2, row_group_size=100)
    got = pqreader.read_table(p2, row_range=(150, 260))
    assert got.to_pylist() == tbl2.slice(150, 110).to_pylist()

    with pytest.raises(ValueError, match="row_range"):
        pqreader.read_table(p, row_range=(5, 1))


def test_pqreader_conjunctive_predicates(monkeypatch, tmp_path):
    """A list of predicates ANDs: row groups/pages must survive every
    conjunct (each pruning on its own column's page grid), and the row
    filter applies all of them."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    n = 20000
    tbl = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "rev": pa.array(range(n, 0, -1), pa.int64()),  # descending
        "name": pa.array([f"x{i}" for i in range(n)]),
    })
    p = str(tmp_path / "conj.parquet")
    pq.write_table(tbl, p, row_group_size=n, data_page_size=2048,
                   write_page_index=True, use_dictionary=False)

    calls = _count_chunk_reads(monkeypatch)
    got = pqreader.read_table(
        p, predicate=[("k", ">=", 5000), ("rev", ">=", n - 5250)])
    exp = tbl.filter(
        pc.and_kleene(pc.greater_equal(pc.field("k"), 5000),
                      pc.greater_equal(pc.field("rev"), n - 5250)))
    assert got.to_pylist() == exp.to_pylist()
    assert got.num_rows == 251
    assert calls == []  # page path: both conjuncts intersected

    # contradictory conjuncts: refuted at the page level, zero decode
    got = pqreader.read_table(
        p, predicate=[("k", "<", 100), ("k", ">", 15000)])
    assert got.num_rows == 0 and calls == []

    with pytest.raises(ValueError, match="empty predicate"):
        pqreader.read_table(p, predicate=[])


def test_pqreader_spark_read_bloom_file_prune(spark, monkeypatch, tmp_path):
    """spark_read equality conjuncts prune whole FILES via their
    split-block blooms before any decode task launches."""
    import numpy as np

    from parquet_go_spark.interop import pqreader, pqbloom
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table
    from parquet_go_spark.codecs.kinds import Kind

    d = tmp_path / "bfiles"
    d.mkdir()
    for fi in range(4):
        k = np.arange(fi * 1000, fi * 1000 + 1000, 2, dtype=np.int64)
        write_table(str(d / f"part-{fi}.parquet"),
                    [ColumnSpec("k", Kind.INT64, k)],
                    bloom_columns=["k"])

    probed = []
    orig = pqbloom.prune_files

    def spy(paths, column, values, kind, flba_size=None, spark=None,
            decryption=None):
        out = orig(paths, column, values, kind, flba_size=flba_size,
                   spark=spark, decryption=decryption)
        probed.append((len(list(paths)), len(out)))
        return out

    monkeypatch.setattr(pqbloom, "prune_files", spy)

    got = pqreader.spark_read(spark, str(d), predicate=("k", "=", 2500))
    assert [r["k"] for r in got.collect()] == [2500]
    assert probed == [(4, 1)]  # 3 of 4 files never became tasks

    probed.clear()
    got = pqreader.spark_read(spark, str(d), predicate=("k", "=", 2501))
    assert got.collect() == []  # odd: bloom-refuted everywhere
    assert probed == [(4, 0)]

    probed.clear()
    got = pqreader.spark_read(spark, str(d), predicate=("k", "=", 2500),
                              bloom_prune_files=False)
    assert [r["k"] for r in got.collect()] == [2500]
    assert probed == []


def test_pqreader_out_of_range_int_literals(tmp_path):
    """Integer literals outside the column's physical range are valid
    constant comparisons, never errors or wrapped-value bloom probes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    tbl = pa.table({"k": pa.array([1, None, 3, 2**31 - 1],
                                  pa.int32())})
    p = str(tmp_path / "oor.parquet")
    pq.write_table(tbl, p)
    assert pqreader.read_table(p, predicate=("k", "=", 2**40)).num_rows == 0
    assert pqreader.read_table(
        p, predicate=("k", "<", 2**40)).column("k").to_pylist() \
        == [1, 3, 2**31 - 1]  # null never satisfies a comparison
    assert pqreader.read_table(p, predicate=("k", ">", 2**40)).num_rows == 0
    assert pqreader.read_table(
        p, predicate=("k", ">=", -2**40)).num_rows == 3
    assert pqreader.read_table(p, predicate=("k", "<", -2**40)).num_rows == 0


def test_pqreader_float32_predicate_no_row_loss(tmp_path):
    """A double literal on a FLOAT (float32) column must round through
    float32 in STAT space exactly as the row mask does — comparing the
    unrounded double against float32 bounds pruned matching rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    tbl = pa.table({"x": pa.array(
        np.full(100, np.float32(0.1)), pa.float32())})
    p = str(tmp_path / "f32.parquet")
    pq.write_table(tbl, p, row_group_size=10)
    assert pqreader.read_table(p, predicate=("x", "=", 0.1)).num_rows == 100
    assert pqreader.read_table(p, predicate=("x", "<=", 0.1)).num_rows == 100
    assert pqreader.read_table(p, predicate=("x", ">=", 0.1)).num_rows == 100
    big = pa.table({"x": pa.array(np.full(10, np.float32(1e20)),
                                  pa.float32())})
    p2 = str(tmp_path / "f32big.parquet")
    pq.write_table(big, p2)
    assert pqreader.read_table(p2, predicate=("x", "<=", 1e20)).num_rows == 10


def test_pqreader_timestamp_beyond_ns_horizon(tmp_path):
    """datetime literals past the int64-nanosecond horizon (year 2262)
    on ns columns are constant comparisons, not OverflowErrors."""
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    base = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)
    tbl = pa.table({"ts": pa.array(
        [base + _dt.timedelta(seconds=i) for i in range(10)],
        pa.timestamp("ns", tz="UTC"))})
    p = str(tmp_path / "ns.parquet")
    pq.write_table(tbl, p)
    far = _dt.datetime(2500, 1, 1, tzinfo=_dt.timezone.utc)
    assert pqreader.read_table(p, predicate=("ts", "<", far)).num_rows == 10
    assert pqreader.read_table(p, predicate=("ts", ">", far)).num_rows == 0
    assert pqreader.read_table(p, predicate=("ts", "=", far)).num_rows == 0
    old = _dt.datetime(1500, 1, 1, tzinfo=_dt.timezone.utc)
    assert pqreader.read_table(p, predicate=("ts", ">=", old)).num_rows == 10


def test_pqreader_unknown_column_order_distrusts_stats(tmp_path):
    """Stats are trusted only when every column_orders entry is the
    TYPE_ORDER union field; an unknown future order must not prune."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    tbl = pa.table({"k": pa.array(range(100), pa.int64())})
    p = str(tmp_path / "ord.parquet")
    pq.write_table(tbl, p)
    with open(p, "rb") as fh:
        import os as _os
        fmd = pqreader._read_footer_file(fh, _os.path.getsize(p), p)
    root = pqreader._parse_schema(fmd[2])
    pqreader._annotate(root, 0, 0, ())
    assert pqreader._compile_predicate(root, fmd, ("k", "=", 5)).trust
    fmd_future = dict(fmd)
    fmd_future[7] = [{9: {}}]  # a ColumnOrder union we don't know
    assert not pqreader._compile_predicate(
        root, fmd_future, ("k", "=", 5)).trust
    assert not pqreader._compile_predicate(
        root, {k: v for k, v in fmd.items() if k != 7},
        ("k", "=", 5)).trust


def test_pqreader_spark_read_validates_on_driver(spark, tmp_path):
    """A bad predicate fails at the driver footer parse — never as a
    per-task error inside a launched job — regardless of
    bloom_prune_files."""
    d = str(tmp_path / "val")
    spark.range(100).selectExpr("id AS k", "id + 1 AS v") \
        .coalesce(1).write.parquet(d)

    from parquet_go_spark.interop import pqreader

    for bp in (True, False):
        with pytest.raises(ValueError, match="unsupported predicate op"):
            pqreader.spark_read(spark, d, predicate=("k", "~", 1),
                                bloom_prune_files=bp)
        with pytest.raises(ValueError, match="not found"):
            pqreader.spark_read(spark, d, predicate=("zz", "=", 1),
                                bloom_prune_files=bp)
        with pytest.raises(ValueError, match="not in the projected"):
            pqreader.spark_read(spark, d, columns=["v"],
                                predicate=("k", "=", 1),
                                bloom_prune_files=bp)


def test_pqreader_predicate_differential_over_corpus():
    """Pruned+filtered reads over the ENTIRE reference corpus must
    equal pyarrow's unpruned read + compute filter — every real-world
    footer quirk (legacy stats, truncated bounds, INT96, dictionary
    pages, v1/v2 levels) goes through the predicate path."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    pc_ops = {"=": pc.equal, ">=": pc.greater_equal, "<": pc.less}
    files = sorted(_glob.glob("/root/reference/testdata/*.parquet"))
    covered = 0
    for path in files:
        ref = pq.read_table(path)
        # first flat scalar column with a usable literal
        target = None
        for fld in ref.schema:
            t = fld.type
            if (pa.types.is_integer(t) or pa.types.is_floating(t)
                    or pa.types.is_string(t)) \
                    and ref.column(fld.name).null_count < ref.num_rows \
                    and ref.num_rows > 0:
                target = fld.name
                break
        if target is None:
            continue
        col = ref.column(target).combine_chunks()
        lit = col.drop_null()[len(col.drop_null()) // 2].as_py()
        if isinstance(lit, float) and lit != lit:
            continue
        for op in ("=", ">=", "<"):
            got = pqreader.read_table(path, predicate=(target, op, lit))
            exp = ref.filter(pc_ops[op](ref.column(target),
                                        pa.scalar(lit, col.type)))
            assert got.num_rows == exp.num_rows, (path, op, lit)
            ga = got.column(target).combine_chunks()
            ea = exp.column(target).combine_chunks()
            if ga.type != ea.type:
                ga = ga.cast(ea.type)
            assert ga.equals(ea), (path, op, lit)
        for op, fn in (("isnull", pc.is_null), ("notnull", pc.is_valid)):
            got = pqreader.read_table(path, predicate=(target, op))
            exp = ref.filter(fn(ref.column(target)))
            assert got.num_rows == exp.num_rows, (path, op)
        covered += 1
    assert covered >= 25  # most of the corpus exercises the path


def test_pqreader_spark_read_split_row_groups(spark, tmp_path):
    """split_row_groups=True decodes one row GROUP per input slice —
    parallelism scales with data, not file count — and stays exact
    with projection + predicate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    n = 40000
    tbl = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "name": pa.array([f"n{i}" for i in range(n)]),
    })
    d = tmp_path / "split"
    d.mkdir()
    # TWO files, 8 row groups each: per-file parallelism would cap at 2
    pq.write_table(tbl.slice(0, n // 2), str(d / "a.parquet"),
                   row_group_size=2500)
    pq.write_table(tbl.slice(n // 2), str(d / "b.parquet"),
                   row_group_size=2500)

    got = pqreader.spark_read(spark, str(d), split_row_groups=True)
    assert got.rdd.getNumPartitions() == 16  # one slice per row group
    assert sorted(r["k"] for r in got.collect()) == list(range(n))

    filt = pqreader.spark_read(spark, str(d), columns=["k"],
                               predicate=("k", "<", 100),
                               split_row_groups=True)
    assert sorted(r["k"] for r in filt.collect()) == list(range(100))


def test_pqreader_in_predicate(monkeypatch, tmp_path):
    """op 'in': stats refute only when every member is outside
    [min, max], blooms probe all members at once, the row mask is
    exact is_in, and out-of-range/inexact members drop soundly."""
    import datetime as _dt

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table
    from parquet_go_spark.codecs.kinds import Kind

    n = 8000
    tbl = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "name": pa.array([f"w{i}" for i in range(n)]),
    })
    p = str(tmp_path / "in.parquet")
    pq.write_table(tbl, p, row_group_size=1000)

    calls = _count_chunk_reads(monkeypatch)
    got = pqreader.read_table(p, predicate=("k", "in", [10, 4500, 4501]))
    assert sorted(got.column("k").to_pylist()) == [10, 4500, 4501]
    assert len(calls) == 4  # row groups 0 and 4 survive × 2 columns

    calls.clear()
    got = pqreader.read_table(
        p, predicate=("k", "in", [10**12, -5]))  # out of data range
    assert got.num_rows == 0 and calls == []

    # strings + mixed members; duplicates collapse
    got = pqreader.read_table(
        p, predicate=("name", "in", ["w7", "w7", "w7999", "absent"]))
    assert sorted(got.column("name").to_pylist()) == ["w7", "w7999"]

    # bloom refutes an in-range member set (evens only, probe odds)
    evens = np.arange(0, 2000, 2, dtype=np.int64)
    p2 = str(tmp_path / "inev.parquet")
    write_table(p2, [ColumnSpec("k", Kind.INT64, evens)],
                row_group_rows=500, bloom_columns=["k"])
    calls.clear()
    got = pqreader.read_table(p2, predicate=("k", "in", [3, 777, 1999]))
    assert got.num_rows == 0 and calls == []
    got = pqreader.read_table(p2, predicate=("k", "in", [3, 1002]))
    assert got.column("k").to_pylist() == [1002]
    assert len(calls) == 1

    # timestamps: per-member exact semantics OR together
    base = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)
    ts = pa.table({"ts": pa.array(
        [base + _dt.timedelta(hours=i) for i in range(50)],
        pa.timestamp("us", tz="UTC"))})
    p3 = str(tmp_path / "ints.parquet")
    pq.write_table(ts, p3)
    got = pqreader.read_table(p3, predicate=(
        "ts", "in", [base + _dt.timedelta(hours=7),
                     base + _dt.timedelta(hours=7, microseconds=1),
                     _dt.datetime(2500, 1, 1, tzinfo=_dt.timezone.utc)]))
    assert got.num_rows == 1

    with pytest.raises(ValueError, match="non-empty list"):
        pqreader.read_table(p, predicate=("k", "in", []))


# ------------------------------------------ round-4: pqread data source
def test_pqread_datasource_end_to_end(spark, tmp_path):
    """spark.read.format('pqread') decodes arbitrary parquet through
    our kernels and matches Spark's own reader, with WHERE clauses
    pushed into the stat/bloom/page pruning."""
    from parquet_go_spark.sources import pqread

    pqread.register(spark)
    d = str(tmp_path / "ds")
    spark.range(30000).selectExpr(
        "id AS k", "concat('n', id) AS name",
        "CAST(id % 93 AS double) AS v",
        "timestamp_micros(CAST(id * 1000000 AS long)) AS ts",
    ).repartition(3).write.parquet(d)

    ours = spark.read.format("pqread").load(d)
    exp = spark.read.parquet(d)
    assert set(ours.columns) == set(exp.columns)
    assert ours.count() == 30000
    q1 = ours.where((F.col("k") >= 29990) | (F.col("k") < 5))
    e1 = exp.where((F.col("k") >= 29990) | (F.col("k") < 5))
    assert sorted(map(str, q1.select(*sorted(ours.columns)).collect())) \
        == sorted(map(str, e1.select(*sorted(exp.columns)).collect()))
    q2 = ours.where((F.col("k") < 100) & F.col("name").isin("n7", "n42"))
    assert sorted(r["k"] for r in q2.collect()) == [7, 42]
    q3 = ours.where(F.col("ts") < F.lit("1970-01-01 00:00:10").cast(
        "timestamp"))
    assert q3.count() == 10


def test_pqread_reader_pushes_only_safe_predicates(tmp_path):
    """Driver-side unit check: float32 columns and uncompilable
    predicates never push (read_table filters EXACTLY, so a semantic
    mismatch with Spark would drop rows); everything else does."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    from parquet_go_spark.sources.pqread import PqreadReader

    tbl = pa.table({
        "k": pa.array(range(100), pa.int64()),
        "f32": pa.array([float(i) for i in range(100)], pa.float32()),
        "name": pa.array([f"s{i}" for i in range(100)]),
    })
    d = tmp_path / "safe"
    d.mkdir()
    pq.write_table(tbl, str(d / "a.parquet"))

    r = PqreadReader(str(d))
    out = list(r.pushFilters([
        EqualTo(("k",), 5),
        GreaterThan(("f32",), 1.5),        # float32: never pushed
        In(("name",), ("s1", "s2")),
        EqualTo(("missing",), 1),          # unknown column: not pushed
    ]))
    assert len(out) == 4  # Spark re-applies everything
    assert r._preds == [("k", "=", 5), ("name", "in", ["s1", "s2"])]

    # read() applies the pushed predicates exactly
    parts = r.partitions()
    got = [b for p in parts for b in r.read(p)]
    assert sum(b.num_rows for b in got) == 0  # k=5 AND name in = ∅


def test_pqreader_in_null_and_float_members(tmp_path):
    """SQL semantics for odd 'in' members: NULL never matches (and
    never resurrects null rows), non-integral / NaN / inf floats on an
    int column match nothing, integral floats match exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    tbl = pa.table({"k": pa.array([2, 5, None], pa.int64()),
                    "s": pa.array(["x", "y", None])})
    p = str(tmp_path / "innull.parquet")
    pq.write_table(tbl, p)

    got = pqreader.read_table(p, predicate=("s", "in", ["x", None]))
    assert got.column("s").to_pylist() == ["x"]  # null rows stay out
    got = pqreader.read_table(p, predicate=("s", "in", [None]))
    assert got.num_rows == 0
    got = pqreader.read_table(p, predicate=("k", "in", [2.5]))
    assert got.num_rows == 0  # used to truncate 2.5 → 2 and match
    got = pqreader.read_table(
        p, predicate=("k", "in", [2.0, float("nan"), float("inf")]))
    assert got.column("k").to_pylist() == [2]


def test_pqreader_float_literal_on_int_column(tmp_path):
    """Scalar float literals on integer columns evaluate exactly:
    pa.scalar's silent 2.5 → 2 truncation matched the wrong rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    tbl = pa.table({"k": pa.array([2, 3, 5, None], pa.int64())})
    p = str(tmp_path / "fint.parquet")
    pq.write_table(tbl, p)
    rt = pqreader.read_table
    assert rt(p, predicate=("k", "=", 2.5)).num_rows == 0
    assert rt(p, predicate=("k", "<", 2.5)).column("k").to_pylist() == [2]
    assert rt(p, predicate=("k", ">", 2.5)).column("k").to_pylist() == [3, 5]
    assert rt(p, predicate=("k", ">=", 3.0)).column("k").to_pylist() == [3, 5]
    assert rt(p, predicate=("k", "=", float("nan"))).num_rows == 0
    assert rt(p, predicate=("k", "<", float("inf"))).num_rows == 3
    assert rt(p, predicate=("k", ">", float("inf"))).num_rows == 0
    assert rt(p, predicate=("k", ">", float("-inf"))).num_rows == 3
    assert rt(p, predicate=("k", "<", 1e300)).num_rows == 3


def test_pqread_handles_ns_and_session_tz(spark, tmp_path):
    """INT96/ns files read through the data source without safe-cast
    crashes (sub-µs truncates like Spark), nested ns casts too, and
    timestamp filters are NEVER pushed (session-tz semantics are
    invisible to a DataSourceReader) yet results stay exact under a
    non-UTC session timezone."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.datasource import GreaterThan

    from parquet_go_spark.sources import pqread
    from parquet_go_spark.sources.pqread import PqreadReader

    pqread.register(spark)
    d = tmp_path / "nsdir"
    d.mkdir()
    tbl = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "ts": pa.array([1001, 2_000_000_000], pa.timestamp("ns")),
        "s": pa.array([{"inner": 1001}, {"inner": 5000}],
                      pa.struct([("inner", pa.timestamp("ns"))])),
    })
    pq.write_table(tbl, str(d / "a.parquet"))

    df = spark.read.format("pqread").load(str(d))
    rows = df.orderBy("k").collect()
    assert len(rows) == 2  # 1001 ns truncates to 1 µs, no crash
    assert rows[1]["ts"].second == 2

    # timestamps never push; the k filter still does
    r = PqreadReader(str(d))
    r.pushFilters([GreaterThan(("ts",), dt.datetime(2024, 1, 1)),
                   GreaterThan(("k",), 1)])
    assert r._preds == [("k", ">", 1)]

    # exactness under a non-UTC session tz (filters applied by
    # Spark, never pushed): compare on a µs dir BOTH readers accept —
    # spark.read.parquet itself rejects the ns-annotated file above
    # (PARQUET_TYPE_ILLEGAL), which our reader decodes
    d2 = str(tmp_path / "usdir")
    spark.range(100).selectExpr(
        "id AS k", "timestamp_micros(CAST(id * 1000000 AS long)) AS ts"
    ).coalesce(1).write.parquet(d2)
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got = (spark.read.format("pqread").load(d2)
               .where("ts >= timestamp'1969-12-31 19:00:50'").count())
        exp = (spark.read.parquet(d2)
               .where("ts >= timestamp'1969-12-31 19:00:50'").count())
        assert got == exp > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_pqreader_verify_checksums(tmp_path):
    """verify_checksums=True accepts intact pages and rejects a
    corrupted page byte with a clear error (negative control mirrors
    the writer-side pyarrow CRC oracle)."""
    import numpy as np
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table
    from parquet_go_spark.codecs.kinds import Kind

    k = np.arange(50000, dtype=np.int64)
    p = str(tmp_path / "crc.parquet")
    write_table(p, [ColumnSpec("k", Kind.INT64, k)], page_rows=5000)
    good = pqreader.read_table(p, verify_checksums=True)
    assert good.num_rows == 50000

    md = pq.ParquetFile(p).metadata
    off = md.row_group(0).column(0).data_page_offset
    data = bytearray(open(p, "rb").read())
    # flip a byte INSIDE the first page's body: parse its header to
    # find where the body starts (offset guessing is layout-luck)
    from parquet_go_spark.interop.thriftc import read_struct
    hdr, body = read_struct(bytes(data), off)
    assert hdr[3] > 8  # compressed page size: room to flip inside
    data[body + hdr[3] // 2] ^= 0xFF
    bad = str(tmp_path / "crcbad.parquet")
    open(bad, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="CRC mismatch"):
        pqreader.read_table(bad, verify_checksums=True)


def test_pqreader_offset_index_head_gap_raises(monkeypatch, tmp_path):
    """An OffsetIndex whose pages all claim to start 50 rows late (head
    gap; spans between pages stay mutually consistent) must trip the
    decoded-rows-vs-footer guard, not silently truncate. Regression:
    required (max_def == 0) columns once derived their row count from
    the REQUESTED ranges, making the guard vacuous exactly when every
    projected column was required."""
    import numpy as np

    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop import pqreader
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table

    n = 10000
    p = str(tmp_path / "headgap.parquet")
    write_table(p, [ColumnSpec("k", Kind.INT64,
                               np.arange(n, dtype=np.int64))],
                page_rows=1024)

    real = pqreader._offset_index

    def shifted(f, cc):
        locs = real(f, cc)
        return None if locs is None else [
            (o, s, r + 50) for o, s, r in locs]

    monkeypatch.setattr(pqreader, "_offset_index", shifted)
    with pytest.raises(ValueError, match="rows, footer says"):
        pqreader.read_table(p, row_range=(0, 60))


# ------------------------------------------------- footer aggregates


def _write_agg_fixture(path: str, seed: int = 7, n: int = 5000,
                       all_null_v: bool = False) -> dict:
    """Mixed-type file via OUR writer (5 row groups, small pages):
    returns the expected per-column python aggregates."""
    import numpy as np

    from parquet_go_spark.codecs.delta import ByteArrays
    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table

    rng = np.random.default_rng(seed)
    k = rng.permutation(n).astype(np.int64)
    fvalid = rng.random(n) > 0.1
    fv = rng.normal(size=int(fvalid.sum()))
    if all_null_v:
        fvalid = np.zeros(n, dtype=bool)
        fv = np.zeros(0, dtype=np.float64)
    svalid = rng.random(n) > 0.2
    s = [f"s{i % 97:02d}" for i in range(int(svalid.sum()))]
    ls = ["x" * 30 + f"{i % 13:04d}" for i in range(n)]  # > 16 B: truncated
    d = rng.integers(10000, 20000, n).astype(np.int32)
    t = rng.integers(0, 10**15, n).astype(np.int64)
    dec = rng.integers(-10**7, 10**7, n).astype(np.int32)
    write_table(path, [
        ColumnSpec("k", Kind.INT64, k),
        ColumnSpec("v", Kind.DOUBLE, fv, validity=fvalid),
        ColumnSpec("s", Kind.BYTE_ARRAY, ByteArrays.from_pylist(
            [x.encode() for x in s]), validity=svalid, logical="string"),
        ColumnSpec("ls", Kind.BYTE_ARRAY, ByteArrays.from_pylist(
            [x.encode() for x in ls]), logical="string"),
        ColumnSpec("d", Kind.INT32, d, logical="date"),
        ColumnSpec("t", Kind.INT64, t, logical="timestamp_micros"),
        ColumnSpec("dec", Kind.INT32, dec, logical="decimal(9,2)"),
    ], page_rows=512, row_group_rows=1024)
    return {"n": n}


def _dt_us(dt):
    import datetime as _dt

    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    return (dt - epoch) // _dt.timedelta(microseconds=1)


def test_footer_aggregates_matches_duckdb(tmp_path):
    """min/max/count/null_count from footer bytes equal DuckDB's full
    scan on the same file — incl. date/timestamp/decimal logical
    values; truncated string bounds honestly report None."""
    import duckdb

    from parquet_go_spark.interop import pqreader

    p = str(tmp_path / "agg.parquet")
    info = _write_agg_fixture(p)
    fa = pqreader.footer_aggregates(p)
    assert fa["rows"] == info["n"]

    con = duckdb.connect()
    for col in ("k", "v", "s", "d", "t", "dec"):
        cnt, lo, hi = con.execute(
            f"SELECT count({col}), min({col}), max({col}) "
            f"FROM read_parquet('{p}')").fetchone()
        a = fa["columns"][col]
        assert a["count"] == cnt, col
        assert a["null_count"] == info["n"] - cnt, col
        if col == "t":
            assert _dt_us(a["min"]) == _dt_us(lo)
            assert _dt_us(a["max"]) == _dt_us(hi)
        else:
            assert a["min"] == lo, (col, a["min"], lo)
            assert a["max"] == hi, (col, a["max"], hi)
    # long strings: bounds were truncated at 16 B → not the extreme
    # values → None (count still exact)
    a = fa["columns"]["ls"]
    assert a["count"] == info["n"] and a["min"] is None and a["max"] is None


def test_footer_aggregates_reads_no_data_pages(monkeypatch, tmp_path):
    """The whole point: no page is ever decoded, no chunk loaded."""
    from parquet_go_spark.interop import pqreader

    p = str(tmp_path / "agg.parquet")
    _write_agg_fixture(p, n=2000)

    def boom(*a, **k):
        raise AssertionError("footer_aggregates touched a data page")

    monkeypatch.setattr(pqreader, "_decode_page", boom)
    monkeypatch.setattr(pqreader, "_load_chunk", boom)
    fa = pqreader.footer_aggregates(p)
    assert fa["columns"]["k"]["max"] == 1999


def test_footer_aggregates_pyarrow_file(tmp_path):
    """Interop: pyarrow writes no exactness flags, so variable-length
    string bounds stay None while fixed-width columns aggregate."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    n = 3000
    tbl = pa.table({
        "i": pa.array([(i * 37) % n for i in range(n)], pa.int64()),
        "f": pa.array([float(i % 101) / 7 for i in range(n)]),
        "name": pa.array([f"n{i % 55}" for i in range(n)]),
    })
    p = str(tmp_path / "pa_agg.parquet")
    pq.write_table(tbl, p, row_group_size=700)
    fa = pqreader.footer_aggregates(p, columns=["i", "f", "name"])
    con = duckdb.connect()
    for col in ("i", "f"):
        cnt, lo, hi = con.execute(
            f"SELECT count({col}), min({col}), max({col}) "
            f"FROM read_parquet('{p}')").fetchone()
        a = fa["columns"][col]
        assert (a["count"], a["min"], a["max"]) == (cnt, lo, hi), col
    nm = fa["columns"]["name"]
    assert nm["count"] == n and nm["min"] is None and nm["max"] is None


def test_footer_aggregates_untrusted_order(monkeypatch, tmp_path):
    """No declared TypeDefinedOrder → bounds unusable (None), counts
    unaffected — the same trust rule as predicate pruning."""
    from parquet_go_spark.interop import pqreader

    p = str(tmp_path / "agg.parquet")
    _write_agg_fixture(p, n=1000)
    monkeypatch.setattr(pqreader, "_footer_trusted", lambda fmd: False)
    fa = pqreader.footer_aggregates(p)
    a = fa["columns"]["k"]
    assert a["min"] is None and a["max"] is None
    assert a["count"] == 1000 and a["null_count"] == 0


def test_footer_aggregates_merge_all_null_file(tmp_path):
    """A file whose column is entirely null contributes its counts but
    must NOT poison the merged min/max."""
    from parquet_go_spark.interop import pqreader

    pa_ = str(tmp_path / "a.parquet")
    pb_ = str(tmp_path / "b.parquet")
    _write_agg_fixture(pa_, n=1000, all_null_v=True)
    _write_agg_fixture(pb_, n=1000, seed=11)
    merged = pqreader.merge_aggregates([
        pqreader.footer_aggregates(pa_), pqreader.footer_aggregates(pb_)])
    only_b = pqreader.footer_aggregates(pb_)["columns"]["v"]
    v = merged["columns"]["v"]
    assert merged["rows"] == 2000
    assert v["null_count"] == 1000 + only_b["null_count"]
    assert v["min"] == only_b["min"] and v["max"] == only_b["max"]


def test_spark_footer_aggregates_many_files(spark, tmp_path):
    """Distributed path (> 64 files): per-file footers aggregate in
    tasks and merge to exactly DuckDB's answer over the glob."""
    import duckdb
    import numpy as np

    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop import pqreader
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table

    d = tmp_path / "many"
    d.mkdir()
    rng = np.random.default_rng(3)
    for i in range(70):
        k = rng.integers(-10**9, 10**9, 40).astype(np.int64)
        valid = rng.random(40) > 0.3
        x = rng.normal(size=int(valid.sum()))
        write_table(str(d / f"f{i:03d}.parquet"), [
            ColumnSpec("k", Kind.INT64, k),
            ColumnSpec("x", Kind.DOUBLE, x, validity=valid),
        ])
    got = pqreader.spark_footer_aggregates(spark, str(d))
    con = duckdb.connect()
    rows, ck, lok, hik, cx, lox, hix = con.execute(
        "SELECT count(*), count(k), min(k), max(k), count(x), min(x), "
        f"max(x) FROM read_parquet('{d}/*.parquet')").fetchone()
    assert got["rows"] == rows
    assert got["columns"]["k"] == {
        "count": ck, "null_count": rows - ck, "min": lok, "max": hik}
    assert got["columns"]["x"] == {
        "count": cx, "null_count": rows - cx, "min": lox, "max": hix}


# ------------------------------------------- isnull / notnull predicates


def _write_null_fixture(path: str):
    """4 row groups × 1000 rows: v is null-free in groups 0/2, ALL null
    in group 1, half null in group 3. k is required throughout."""
    import numpy as np

    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table

    n = 4000
    k = np.arange(n, dtype=np.int64)
    valid = np.ones(n, dtype=bool)
    valid[1000:2000] = False
    valid[3000:4000:2] = False
    v = (k * 3)[valid].astype(np.float64)
    write_table(path, [
        ColumnSpec("k", Kind.INT64, k),
        ColumnSpec("v", Kind.DOUBLE, v, validity=valid),
    ], row_group_rows=1000, page_rows=250)
    return valid


def test_pqreader_isnull_prunes_null_free_groups(monkeypatch, tmp_path):
    """('v','isnull') decodes no chunk of the null-free row groups —
    null_count pruning needs NO column-order trust — and returns
    exactly pyarrow's is_null rows."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    p = str(tmp_path / "nulls.parquet")
    _write_null_fixture(p)
    calls = _count_chunk_reads(monkeypatch)
    got = pqreader.read_table(p, predicate=("v", "isnull"))
    ref = pq.read_table(p)
    exp = ref.filter(pc.is_null(ref.column("v")))
    assert got.num_rows == exp.num_rows == 1500
    assert got.column("k").to_pylist() == exp.column("k").to_pylist()
    # groups 0 and 2 are refuted by null_count == 0: with the page
    # index engaged the surviving groups decode via the page reader,
    # so NO whole chunk is ever loaded; without it, at most the two
    # surviving groups' chunks appear
    assert all(c == ("k",) or c == ("v",) for c in calls)
    assert len(calls) <= 4  # ≤ 2 columns × 2 surviving groups


def test_pqreader_notnull_skips_all_null_group(monkeypatch, tmp_path):
    """('v','notnull') refutes the all-null row group and the all-null
    pages inside the half-null group."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    p = str(tmp_path / "nulls.parquet")
    _write_null_fixture(p)
    got = pqreader.read_table(p, predicate=[("v", "notnull")])
    ref = pq.read_table(p)
    exp = ref.filter(pc.is_valid(ref.column("v")))
    assert got.num_rows == exp.num_rows == 2500
    assert got.column("v").to_pylist() == exp.column("v").to_pylist()


def test_pqreader_isnull_required_column_reads_nothing(
        monkeypatch, tmp_path):
    """IS NULL on a REQUIRED column is refuted from the schema alone:
    zero chunks decode, zero rows return."""
    from parquet_go_spark.interop import pqreader

    p = str(tmp_path / "nulls.parquet")
    _write_null_fixture(p)
    calls = _count_chunk_reads(monkeypatch)
    got = pqreader.read_table(p, predicate=("k", "isnull"))
    assert got.num_rows == 0
    assert calls == []


def test_pqreader_isnull_composes_with_comparison(tmp_path):
    """['v' isnull] AND ['k' >= lit] — mixed conjunction through both
    pruning paths stays exact."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    p = str(tmp_path / "nulls.parquet")
    _write_null_fixture(p)
    got = pqreader.read_table(
        p, predicate=[("v", "isnull"), ("k", ">=", 3000)])
    ref = pq.read_table(p)
    exp = ref.filter(pc.and_kleene(
        pc.is_null(ref.column("v")),
        pc.greater_equal(ref.column("k"), 3000)))
    assert got.num_rows == exp.num_rows == 500
    assert got.column("k").to_pylist() == exp.column("k").to_pylist()


def test_pqread_ds_pushes_null_filters(spark, tmp_path):
    """WHERE v IS NULL / IS NOT NULL through the pqread data source
    equals spark.read.parquet, and the filters actually translate —
    including on float32/timestamp columns (no literal, so the
    comparison-semantics exclusions don't apply)."""
    import numpy as np
    from pyspark.sql.datasource import EqualTo, IsNotNull, IsNull

    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table
    from parquet_go_spark.sources import pqread
    from parquet_go_spark.interop import pqreader

    d = tmp_path / "store"
    d.mkdir()
    _write_null_fixture(str(d / "part-0.parquet"))

    pqread.register(spark)
    ours = (spark.read.format("pqread").load(str(d))
            .where("v IS NULL").orderBy("k"))
    ref = (spark.read.parquet(str(d))
           .where("v IS NULL").orderBy("k"))
    assert ours.collect() == ref.collect()
    ours2 = (spark.read.format("pqread").load(str(d))
             .where("v IS NOT NULL AND k < 500").orderBy("k"))
    ref2 = (spark.read.parquet(str(d))
            .where("v IS NOT NULL AND k < 500").orderBy("k"))
    assert ours2.collect() == ref2.collect()

    # unit: translation includes null tests on comparison-excluded
    # columns (float32), but never on unknown columns
    f32 = str(tmp_path / "f32.parquet")
    write_table(f32, [ColumnSpec(
        "x", Kind.FLOAT, np.zeros(5, np.float32),
        validity=np.ones(5, bool))])
    import os as _os
    with open(f32, "rb") as fh:
        fmd = pqreader._read_footer_file(
            fh, _os.path.getsize(f32), f32)
    root = pqreader._parse_schema(fmd[2])
    pqreader._annotate(root, 0, 0, ())
    got = pqread._translate(
        [IsNull(("x",)), IsNotNull(("x",)), EqualTo(("x",), 1.0),
         IsNull(("nope",))],
        pqread._pushable_columns(root), pqread._flat_columns(root))
    assert got == [("x", "isnull", None), ("x", "notnull", None)]


# ------------------------------------------------------ OR predicates


def test_pqreader_or_cross_column(monkeypatch, tmp_path):
    """("or", [k<100, v isnull]) — a row group where BOTH disjuncts
    are refuted (k out of range AND null_count 0) is skipped; rows
    satisfying either branch come back exactly (Kleene OR)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    p = str(tmp_path / "nulls.parquet")
    _write_null_fixture(p)  # 4 rgs; rg2 (k 2000-2999) null-free
    got = pqreader.read_table(
        p, predicate=("or", [("k", "<", 100), ("v", "isnull")]))
    ref = pq.read_table(p)
    exp = ref.filter(pc.or_kleene(
        pc.less(ref.column("k"), 100), pc.is_null(ref.column("v"))))
    assert got.num_rows == exp.num_rows == 1600
    assert got.column("k").to_pylist() == exp.column("k").to_pylist()
    # group-level: rg2 satisfies neither branch → must never decode.
    # spy AFTER the positive check so the first read is unobserved
    calls = _count_chunk_reads(monkeypatch)
    pages = []
    orig = pqreader._decode_page

    def pspy(data, pos, leaf, codec, dictionary_vals, *a, **kw):
        out = orig(data, pos, leaf, codec, dictionary_vals, *a, **kw)
        if out[0] == "data":
            pages.append(leaf.path)
        return out

    monkeypatch.setattr(pqreader, "_decode_page", pspy)
    pqreader.read_table(
        p, predicate=("or", [("k", "<", 100), ("v", "isnull")]))
    assert len(calls) + len(pages) > 0  # something was read...
    # ...but nothing from rg2: its k-range is 2000-2999, so no decoded
    # k page/chunk may contain those values
    got2 = pqreader.read_table(
        p, predicate=("or", [("k", "<", 100), ("v", "isnull")]))
    assert not any(2000 <= v < 3000 for v in got2.column("k").to_pylist())


def test_pqreader_or_page_union(monkeypatch, tmp_path):
    """Same-column OR unions the surviving page sets: k<100 OR
    k>=19900 on a 20-page group decodes exactly the first and last
    pages of each projected column."""
    import numpy as np

    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop import pqreader
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table

    n = 20000
    k = np.arange(n, dtype=np.int64)
    price = (k % 977).astype(np.float64)
    p = str(tmp_path / "orpages.parquet")
    write_table(p, [ColumnSpec("k", Kind.INT64, k),
                    ColumnSpec("price", Kind.DOUBLE, price)],
                page_rows=1000, row_group_rows=n)

    pages = []
    orig = pqreader._decode_page

    def spy(data, pos, leaf, codec, dictionary_vals, *a, **kw):
        out = orig(data, pos, leaf, codec, dictionary_vals, *a, **kw)
        if out[0] == "data":
            pages.append(leaf.path)
        return out

    monkeypatch.setattr(pqreader, "_decode_page", spy)
    got = pqreader.read_table(
        p, predicate=("or", [("k", "<", 100), ("k", ">=", 19900)]))
    assert got.column("k").to_pylist() == (
        list(range(100)) + list(range(19900, n)))
    assert len(pages) == 4  # (first + last page) × 2 columns


def test_pqreader_nested_and_or(tmp_path):
    """("and", [("or", [...]), notnull]) — nesting composes, and an
    uninformed OR disjunct soundly disables page pruning for that
    subtree without changing results."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    p = str(tmp_path / "nulls.parquet")
    _write_null_fixture(p)
    pred = ("and", [("or", [("k", "<", 1200), ("k", ">=", 3500)]),
                    ("v", "notnull")])
    got = pqreader.read_table(p, predicate=pred)
    ref = pq.read_table(p)
    exp = ref.filter(pc.and_kleene(
        pc.or_kleene(pc.less(ref.column("k"), 1200),
                     pc.greater_equal(ref.column("k"), 3500)),
        pc.is_valid(ref.column("v"))))
    assert got.num_rows == exp.num_rows
    assert got.column("k").to_pylist() == exp.column("k").to_pylist()


def test_pqreader_or_kleene_null_semantics(tmp_path):
    """NULL OR TRUE = TRUE (row kept), NULL OR FALSE = NULL (row
    dropped) — matches SQL exactly, pinned against pyarrow Kleene."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    p = str(tmp_path / "nulls.parquet")
    _write_null_fixture(p)
    pred = ("or", [("v", ">", 1e12), ("k", "<", 1010)])
    got = pqreader.read_table(p, predicate=pred)
    ref = pq.read_table(p)
    exp = ref.filter(pc.or_kleene(
        pc.greater(ref.column("v"), 1e12),
        pc.less(ref.column("k"), 1010)))
    # rows 1000-1009 have v NULL but k<1010 TRUE → kept;
    # rows 1010-1999 have v NULL and k<1010 FALSE → dropped
    assert got.num_rows == exp.num_rows == 1010
    assert got.column("k").to_pylist() == exp.column("k").to_pylist()


def test_spark_read_or_predicate(spark, tmp_path):
    """spark_read with an OR tree equals Spark's own parquet reader
    with the same WHERE clause."""
    from parquet_go_spark.interop import pqreader

    d = tmp_path / "ordir"
    d.mkdir()
    _write_null_fixture(str(d / "part-0.parquet"))
    _write_null_fixture(str(d / "part-1.parquet"))
    ours = pqreader.spark_read(
        spark, str(d),
        predicate=("or", [("k", "<", 100), ("v", "isnull")]),
    ).orderBy("k").collect()
    ref = (spark.read.parquet(str(d))
           .where("k < 100 OR v IS NULL").orderBy("k").collect())
    assert ours == ref


# -------------------------------------------------- string predicates


def _write_sorted_names(path: str, n: int = 20000, width: int = 7):
    import numpy as np

    from parquet_go_spark.codecs.bytearrays import ByteArrays
    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table

    names = ByteArrays.from_pylist(
        [f"row-{i:0{width}d}".encode() for i in range(n)])
    write_table(path, [
        ColumnSpec("name", Kind.BYTE_ARRAY, names, logical="string"),
        ColumnSpec("k", Kind.INT64, np.arange(n, dtype=np.int64)),
    ], page_rows=1000, row_group_rows=5000)


def test_pqreader_startswith_prunes(monkeypatch, tmp_path):
    """startswith on a sorted string column: row groups and pages
    outside the prefix range never decode; rows come back exactly."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    p = str(tmp_path / "names.parquet")
    _write_sorted_names(p)  # 4 rgs × 5 pages; "row-0012xxx" in rg 2

    pages = []
    orig = pqreader._decode_page

    def spy(data, pos, leaf, codec, dictionary_vals, *a, **kw):
        out = orig(data, pos, leaf, codec, dictionary_vals, *a, **kw)
        if out[0] == "data":
            pages.append(leaf.path)
        return out

    monkeypatch.setattr(pqreader, "_decode_page", spy)
    got = pqreader.read_table(p, predicate=("name", "startswith",
                                            "row-0012"))
    ref = pq.read_table(p)
    exp = ref.filter(pc.starts_with(ref.column("name"),
                                    pattern="row-0012"))
    assert got.num_rows == exp.num_rows == 1000
    assert got.column("k").to_pylist() == list(range(12000, 13000))
    # rows 12000-12999 = page 2 of rg 2 (pages are 1000 rows): one
    # page per projected column; every other rg refuted by stats
    assert len(pages) == 2


def test_pqreader_startswith_truncated_stats_sound(tmp_path):
    """Strings and prefixes LONGER than the 16-byte stat truncation:
    pruning must never drop a matching row (lo is a prefix of the true
    min, hi carries above the true max — both sides stay sound)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    p = str(tmp_path / "long.parquet")
    _write_sorted_names(p, n=8000, width=20)  # 24-char values
    for prefix in ("row-", "row-0000000000000004",  # 20 chars > 16
                   "row-00000000000000049", "nope"):
        got = pqreader.read_table(
            p, predicate=("name", "startswith", prefix))
        ref = pq.read_table(p)
        exp = ref.filter(pc.starts_with(ref.column("name"),
                                        pattern=prefix))
        assert got.num_rows == exp.num_rows, prefix
        assert (got.column("name").to_pylist()
                == exp.column("name").to_pylist()), prefix


def test_pqreader_prefix_upper_edges():
    from parquet_go_spark.interop import pqreader

    assert pqreader._prefix_upper(b"abc") == b"abd"
    assert pqreader._prefix_upper(b"ab\xff") == b"ac"
    assert pqreader._prefix_upper(b"\xff\xff") is None
    assert pqreader._prefix_upper(b"") is None
    # all-0xFF prefix: only the hi-side test applies, nothing breaks
    assert not pqreader._bounds_refute(b"\xff\xfe", b"\xff\xff\x01",
                                       "startswith", b"\xff\xff")
    assert pqreader._bounds_refute(b"a", b"b", "startswith", b"c")
    assert pqreader._bounds_refute(b"d", b"e", "startswith", b"c")


def test_pqreader_endswith_contains(tmp_path):
    """Mask-only string ops return exactly pyarrow's rows (no pruning
    claimed, full correctness required) and compose under OR."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    p = str(tmp_path / "names.parquet")
    _write_sorted_names(p, n=3000)
    ref = pq.read_table(p)
    got = pqreader.read_table(p, predicate=("name", "endswith", "99"))
    exp = ref.filter(pc.ends_with(ref.column("name"), pattern="99"))
    assert got.column("name").to_pylist() == exp.column("name").to_pylist()
    got = pqreader.read_table(p, predicate=("name", "contains", "002"))
    exp = ref.filter(pc.match_substring(ref.column("name"),
                                        pattern="002"))
    assert got.num_rows == exp.num_rows > 0
    got = pqreader.read_table(p, predicate=(
        "or", [("name", "startswith", "row-00001"),
               ("name", "endswith", "7")]))
    exp = ref.filter(pc.or_kleene(
        pc.starts_with(ref.column("name"), pattern="row-00001"),
        pc.ends_with(ref.column("name"), pattern="7")))
    assert got.column("name").to_pylist() == exp.column("name").to_pylist()


def test_pqread_ds_pushes_string_filters(spark, tmp_path):
    """LIKE 'prefix%' / endswith / contains through the pqread data
    source equal spark.read.parquet, and translation maps them."""
    from pyspark.sql.datasource import (
        StringContains, StringEndsWith, StringStartsWith)

    from parquet_go_spark.sources import pqread

    d = tmp_path / "store"
    d.mkdir()
    _write_sorted_names(str(d / "part-0.parquet"), n=4000)
    pqread.register(spark)
    for cond in ("name LIKE 'row-00012%'", "name LIKE '%7'",
                 "name LIKE '%-002%'"):
        ours = (spark.read.format("pqread").load(str(d))
                .where(cond).orderBy("k").collect())
        ref = (spark.read.parquet(str(d))
               .where(cond).orderBy("k").collect())
        assert ours == ref, cond
    got = pqread._translate(
        [StringStartsWith(("name",), "ab"),
         StringEndsWith(("name",), "cd"),
         StringContains(("name",), "ef")],
        {"name"}, {"name"})
    assert got == [("name", "startswith", "ab"),
                   ("name", "endswith", "cd"),
                   ("name", "contains", "ef")]


def test_footer_aggregates_per_field_poisoning(tmp_path):
    """A truncated (inexact) MIN must not lose the provable MAX —
    bounds poison independently, through the merge too."""
    from parquet_go_spark.codecs.bytearrays import ByteArrays
    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop import pqreader
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table

    pa_ = str(tmp_path / "a.parquet")
    write_table(pa_, [ColumnSpec("s", Kind.BYTE_ARRAY,
                                 ByteArrays.from_pylist(
                                     [b"a" * 30 + b"x", b"b", b"charlie"]),
                                 logical="string")])
    fa = pqreader.footer_aggregates(pa_)["columns"]["s"]
    assert fa["min"] is None          # 31-byte min was truncated
    assert fa["max"] == "charlie"     # short max stays provable
    pb_ = str(tmp_path / "b.parquet")
    write_table(pb_, [ColumnSpec("s", Kind.BYTE_ARRAY,
                                 ByteArrays.from_pylist([b"dog", b"ant"]),
                                 logical="string")])
    merged = pqreader.merge_aggregates([
        pqreader.footer_aggregates(pa_), pqreader.footer_aggregates(pb_)])
    assert merged["columns"]["s"]["min"] is None
    assert merged["columns"]["s"]["max"] == "dog"


def test_pqreader_startswith_binary_bytes(tmp_path):
    """Arbitrary (non-UTF-8) byte prefixes work on BINARY columns via
    the slice-compare mask; endswith/contains reject undecodable bytes
    at COMPILE time, before any page is read."""
    from parquet_go_spark.codecs.bytearrays import ByteArrays
    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop import pqreader
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table

    vals = [b"\xff\x01\x02", b"\xff\x01", b"\xfe\x00", b"plain", b"\xff"]
    p = str(tmp_path / "bin.parquet")
    write_table(p, [ColumnSpec("b", Kind.BYTE_ARRAY,
                               ByteArrays.from_pylist(vals))])
    got = pqreader.read_table(p, predicate=("b", "startswith",
                                            b"\xff\x01"))
    assert sorted(got.column("b").to_pylist()) == [b"\xff\x01",
                                                  b"\xff\x01\x02"]
    with pytest.raises(ValueError, match="valid UTF-8"):
        pqreader.read_table(p, predicate=("b", "contains", b"\xff"))


def test_pqreader_list_form_null_leaf(tmp_path):
    """['col', 'isnull'] — the list spelling of the null-test leaf —
    parses as a leaf, not a 2-element conjunction of strings."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    p = str(tmp_path / "nulls.parquet")
    _write_null_fixture(p)
    got = pqreader.read_table(p, predicate=["v", "isnull"])
    ref = pq.read_table(p)
    exp = ref.filter(pc.is_null(ref.column("v")))
    assert got.num_rows == exp.num_rows == 1500


# ------------------------------------------------------- != predicate


def test_pqreader_not_equal(monkeypatch, tmp_path):
    """!= refutes a row group only when it is provably constant == v;
    rows match pyarrow's not_equal exactly."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop import pqreader
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table

    # rg0: constant 7s, rg1: mixed, rg2: constant 9s
    k = np.concatenate([np.full(1000, 7), np.arange(1000),
                        np.full(1000, 9)]).astype(np.int64)
    p = str(tmp_path / "ne.parquet")
    write_table(p, [ColumnSpec("k", Kind.INT64, k)],
                row_group_rows=1000, page_index=False)
    calls = _count_chunk_reads(monkeypatch)
    got = pqreader.read_table(p, predicate=("k", "!=", 7))
    ref = pq.read_table(p)
    exp = ref.filter(pc.not_equal(ref.column("k"), 7))
    assert got.column("k").to_pylist() == exp.column("k").to_pylist()
    assert len(calls) == 2  # constant-7 group refuted without a read


def test_pqreader_not_equal_float_nan_sound(tmp_path):
    """A float chunk whose stats read constant [v, v] can still hold
    NaN rows that satisfy != v — float columns must never stat-refute
    a != (NaN is invisible to parquet bounds)."""
    import math

    import numpy as np

    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop import pqreader
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table

    x = np.array([5.0, 5.0, np.nan, 5.0, np.nan], dtype=np.float64)
    p = str(tmp_path / "nan.parquet")
    write_table(p, [ColumnSpec("x", Kind.DOUBLE, x)])
    got = pqreader.read_table(p, predicate=("x", "!=", 5.0))
    vals = got.column("x").to_pylist()
    assert len(vals) == 2 and all(math.isnan(v) for v in vals)


def test_pqread_ds_not_equal_and_null_safe(spark, tmp_path):
    """Translation of Not/EqualNullSafe: NOT(= v) → !=, NOT(IS NULL) →
    notnull, <=> NULL → isnull, <=> v → =; NOT(<=> v) is NOT pushed
    (it keeps null rows, unlike !=). End-to-end != equals Spark."""
    from pyspark.sql.datasource import (
        EqualNullSafe, EqualTo, IsNull, Not)

    from parquet_go_spark.sources import pqread

    d = tmp_path / "store"
    d.mkdir()
    _write_null_fixture(str(d / "part-0.parquet"))
    pqread.register(spark)
    for cond in ("k != 1500", "NOT (k = 1500)", "k <=> 1500",
                 "NOT (v <=> 300.0)"):
        ours = (spark.read.format("pqread").load(str(d))
                .where(cond).orderBy("k").collect())
        ref = (spark.read.parquet(str(d))
               .where(cond).orderBy("k").collect())
        assert ours == ref, cond

    got = pqread._translate(
        [Not(EqualTo(("k",), 5)), Not(IsNull(("k",))),
         EqualNullSafe(("v",), None), EqualNullSafe(("k",), 5),
         Not(EqualNullSafe(("k",), 5))],
        {"k", "v"}, {"k", "v"})
    assert got == [("k", "!=", 5), ("k", "notnull", None),
                   ("v", "isnull", None), ("k", "=", 5)]


def test_pqread_ds_nan_literals_never_push(spark, tmp_path):
    """Spark orders NaN above every double and NaN = NaN is TRUE;
    Arrow compares IEEE. Any filter carrying a NaN literal must not
    push — else `x < NaN` (true for every non-NaN row in Spark)
    returns nothing. Equality against Spark's own reader proves no
    row is lost."""
    import numpy as np

    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table
    from parquet_go_spark.sources import pqread

    d = tmp_path / "nanstore"
    d.mkdir()
    x = np.array([1.0, np.nan, 2.0, np.nan, 3.0], dtype=np.float64)
    write_table(str(d / "part-0.parquet"),
                [ColumnSpec("x", Kind.DOUBLE, x),
                 ColumnSpec("k", Kind.INT64,
                            np.arange(5, dtype=np.int64))])
    pqread.register(spark)

    def key(rows):  # nan != nan breaks Row equality: compare shapes
        return [(r["k"], r["x"] != r["x"], None if r["x"] != r["x"]
                 else r["x"]) for r in rows]

    for cond in ("x < CAST('NaN' AS DOUBLE)",
                 "x = CAST('NaN' AS DOUBLE)",
                 "x != CAST('NaN' AS DOUBLE)",
                 "x IN (1.0, CAST('NaN' AS DOUBLE))"):
        ours = (spark.read.format("pqread").load(str(d))
                .where(cond).orderBy("k").collect())
        ref = (spark.read.parquet(str(d))
               .where(cond).orderBy("k").collect())
        assert key(ours) == key(ref), cond
    # the x < NaN case must actually return the non-NaN rows
    n = (spark.read.format("pqread").load(str(d))
         .where("x < CAST('NaN' AS DOUBLE)").count())
    assert n == 3


def test_pqwriter_nan_chunks_omit_bounds(tmp_path):
    """PARQUET-1222 parity: a float chunk containing NaN writes no
    min/max statistics and no ColumnIndex, so NaN-blind readers
    (Spark/parquet-mr) can never prune away the NaN rows."""
    import numpy as np
    import pyarrow.parquet as pq

    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table

    x = np.array([1.0, np.nan, 3.0], dtype=np.float64)
    p = str(tmp_path / "nan.parquet")
    write_table(p, [ColumnSpec("x", Kind.DOUBLE, x)])
    st = pq.ParquetFile(p).metadata.row_group(0).column(0).statistics
    assert st is None or not st.has_min_max
    assert st is not None and st.null_count == 0  # counts survive
    # NaN-free chunks keep their bounds
    p2 = str(tmp_path / "clean.parquet")
    write_table(p2, [ColumnSpec(
        "x", Kind.DOUBLE, np.array([1.0, 3.0]))])
    st2 = pq.ParquetFile(p2).metadata.row_group(0).column(0).statistics
    assert st2.has_min_max and st2.min == 1.0 and st2.max == 3.0


def test_pqreader_predicate_tree_fuzz(tmp_path):
    """Property: ANY random AND/OR tree over =,!=,<,<=,>,>=,in,
    isnull,notnull,startswith leaves equals pyarrow's unpruned Kleene
    evaluation — pruning (row-group, page union/intersection) must
    never change results."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    int_lit = st.integers(min_value=-50, max_value=150)
    str_lit = st.text(alphabet="abcx", max_size=4)

    leaf = st.one_of(
        st.tuples(st.just("x"),
                  st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
                  int_lit),
        st.tuples(st.just("x"), st.just("in"),
                  st.lists(int_lit, min_size=1, max_size=4)),
        st.tuples(st.just("x"),
                  st.sampled_from(["isnull", "notnull"])),
        st.tuples(st.just("s"), st.just("startswith"), str_lit),
        st.tuples(st.just("s"),
                  st.sampled_from(["=", "<", ">="]), str_lit),
    )
    tree = st.recursive(
        leaf,
        lambda kids: st.tuples(st.sampled_from(["and", "or"]),
                               st.lists(kids, min_size=1, max_size=3)),
        max_leaves=6)

    def ref_mask(tbl, node):
        if isinstance(node[0], str) and node[0] in ("and", "or"):
            ms = [ref_mask(tbl, p) for p in node[1]]
            out = ms[0]
            comb = pc.and_kleene if node[0] == "and" else pc.or_kleene
            for m in ms[1:]:
                out = comb(out, m)
            return out
        col, op = node[0], node[1]
        arr = tbl.column(col)
        if op == "isnull":
            return pc.is_null(arr)
        if op == "notnull":
            return pc.is_valid(arr)
        if op == "in":
            vset = pa.array(sorted(set(node[2])), arr.type)
            return pc.is_in(arr, value_set=vset)
        if op == "startswith":
            return pc.starts_with(arr, pattern=node[2])
        fn = {"=": pc.equal, "!=": pc.not_equal, "<": pc.less,
              "<=": pc.less_equal, ">": pc.greater,
              ">=": pc.greater_equal}[op]
        return fn(arr, pa.scalar(node[2], arr.type))

    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(data=st.data(), pred=tree,
           rg=st.integers(min_value=1, max_value=40),
           pageidx=st.booleans(), sort=st.booleans())
    def check(data, pred, rg, pageidx, sort):
        n = data.draw(st.integers(min_value=1, max_value=100))
        xs = data.draw(st.lists(st.one_of(st.none(), int_lit),
                                min_size=n, max_size=n))
        ss = data.draw(st.lists(
            st.one_of(st.none(), st.text(alphabet="abcx", max_size=6)),
            min_size=n, max_size=n))
        if sort:
            xs = sorted((v for v in xs if v is not None)) \
                + [None] * sum(v is None for v in xs)
        tbl = pa.table({"x": pa.array(xs, pa.int64()),
                        "s": pa.array(ss, pa.string())})
        p = str(tmp_path / "treefuzz.parquet")
        pq.write_table(tbl, p, row_group_size=rg,
                       write_page_index=pageidx,
                       data_page_size=64 if pageidx else None)
        got = pqreader.read_table(p, predicate=pred)
        exp = tbl.filter(ref_mask(tbl, pred))
        assert got.column("x").to_pylist() == exp.column("x").to_pylist()
        assert got.column("s").to_pylist() == exp.column("s").to_pylist()

    check()


def test_pqread_ds_gt_on_double_keeps_nan_rows(spark, tmp_path):
    """`x > 1.5` is TRUE for NaN rows in Spark (NaN orders above every
    double) but FALSE under IEEE — so > / >= on double columns must
    never push. Regression: pushing dropped the NaN rows entirely."""
    import numpy as np

    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table
    from parquet_go_spark.sources import pqread

    d = tmp_path / "gtnan"
    d.mkdir()
    x = np.array([1.0, np.nan, 2.0, np.nan, 3.0], dtype=np.float64)
    write_table(str(d / "part-0.parquet"),
                [ColumnSpec("x", Kind.DOUBLE, x),
                 ColumnSpec("k", Kind.INT64,
                            np.arange(5, dtype=np.int64))])
    pqread.register(spark)
    for cond, expect in (("x > 1.5", 4), ("x >= 2.0", 4),
                         ("x < 1.5", 1), ("x <= 2.0", 2)):
        ours = (spark.read.format("pqread").load(str(d))
                .where(cond).count())
        ref = (spark.read.parquet(str(d)).where(cond).count())
        assert ours == ref == expect, cond
    # ints/strings keep > pushdown: only double columns opt out
    from pyspark.sql.datasource import GreaterThan

    got = pqread._translate(
        [GreaterThan(("k",), 1), GreaterThan(("x",), 1.0)],
        {"k", "x"}, {"k", "x"}, {"x"})
    assert got == [("k", ">", 1)]


def test_footer_aggregates_fuzz(tmp_path):
    """Property: for ANY table (nulls, NaN, duplicate extremes, long
    strings, any row-group split, pyarrow- or pqwriter-written),
    footer_aggregates' count/null_count are exactly right and each
    bound is either None or exactly the scan answer — never a wrong
    value. NaN rows are excluded from float bounds (parquet stats
    semantics), so float columns containing NaN must report None on
    our writer (bounds omitted) and non-NaN-min/max on pyarrow's."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(data=st.data(),
           kind=st.sampled_from(["i64", "f64", "str"]),
           rg=st.integers(min_value=1, max_value=30))
    def check(data, kind, rg):
        n = data.draw(st.integers(min_value=1, max_value=80))
        if kind == "i64":
            elems = st.integers(min_value=-2**62, max_value=2**62)
            typ = pa.int64()
        elif kind == "f64":
            elems = st.floats(width=64)  # NaN/inf allowed
            typ = pa.float64()
        else:
            elems = st.text(max_size=40)  # > 16 B triggers truncation
            typ = pa.string()
        vals = data.draw(st.lists(st.one_of(st.none(), elems),
                                  min_size=n, max_size=n))
        arr = pa.array(vals, typ)
        p = str(tmp_path / "aggfuzz.parquet")
        pq.write_table(pa.table({"x": arr}), p, row_group_size=rg)
        a = pqreader.footer_aggregates(p)["columns"]["x"]
        nn = arr.drop_null()
        assert a["null_count"] == arr.null_count
        assert a["count"] == len(nn)
        if kind == "f64":
            nn = nn.filter(pc.is_valid(pc.if_else(
                pc.is_nan(nn), pa.nulls(len(nn), typ), nn)))
        if a["min"] is not None:
            assert len(nn) and a["min"] == pc.min(nn).as_py()
        if a["max"] is not None:
            assert len(nn) and a["max"] == pc.max(nn).as_py()

    check()


# ----------------------------------- nested-projection page trimming


def test_pqreader_nested_projection_page_trim(monkeypatch, tmp_path):
    """A LIST column in the projection no longer disables page
    skipping: a point predicate on the flat key decodes ONE page per
    column — the list column's pages trim by row through the rep
    stream (pages pin to row boundaries whenever a page index
    exists)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    n = 20000
    tbl = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "tags": pa.array([[i, i + 1, i + 2] for i in range(n)],
                         pa.list_(pa.int64())),
    })
    p = str(tmp_path / "nestpage.parquet")
    pq.write_table(tbl, p, row_group_size=n, data_page_size=4096,
                   write_page_index=True, use_dictionary=False)

    pages = []
    orig = pqreader._decode_page

    def spy(data, pos, leaf, codec, dictionary_vals, *a, **kw):
        out = orig(data, pos, leaf, codec, dictionary_vals, *a, **kw)
        if out[0] == "data":
            pages.append(leaf.path)
        return out

    monkeypatch.setattr(pqreader, "_decode_page", spy)
    got = pqreader.read_table(p, predicate=("k", "=", 13579))
    assert got.to_pylist() == [
        {"k": 13579, "tags": [13579, 13580, 13581]}]
    # one key page decoded; the list column decodes only the pages
    # overlapping that page's row span (its pages hold fewer rows —
    # a handful out of >100), never the whole chunk
    from collections import Counter

    c = Counter(pages)
    assert c[("k",)] == 1
    assert 1 <= c[("tags", "list", "element")] <= 6


def test_pqreader_nested_row_range_page_trim(monkeypatch, tmp_path):
    """row_range over a schema with a LIST column decodes only the
    overlapping pages (previously whole-group decode + slice)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    n = 10000
    tbl = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "tags": pa.array([[f"t{i}", f"u{i}"] for i in range(n)],
                         pa.list_(pa.string())),
    })
    p = str(tmp_path / "nestseek.parquet")
    pq.write_table(tbl, p, row_group_size=n, data_page_size=2048,
                   write_page_index=True, use_dictionary=False)

    pages = []
    orig = pqreader._decode_page

    def spy(data, pos, leaf, codec, dictionary_vals, *a, **kw):
        out = orig(data, pos, leaf, codec, dictionary_vals, *a, **kw)
        if out[0] == "data":
            pages.append(leaf.path)
        return out

    monkeypatch.setattr(pqreader, "_decode_page", spy)
    got = pqreader.read_table(p, row_range=(4000, 4100))
    assert got.num_rows == 100
    assert got.column("k").to_pylist() == list(range(4000, 4100))
    assert got.column("tags")[0].as_py() == ["t4000", "u4000"]
    # far fewer pages than the whole chunk for both columns
    from collections import Counter

    c = Counter(pages)
    assert 0 < c[("k",)] <= 3
    assert 0 < c[("tags", "list", "element")] <= 3


def test_pqreader_struct_and_deep_nested_page_trim(tmp_path):
    """Struct fields and deep nesting (list<struct<list>>) stay exact
    under the page-trimmed path — every row range assembles the same
    values pyarrow produces."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    n = 5000
    tbl = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "s": pa.array([{"a": i, "b": f"x{i}"} for i in range(n)],
                      pa.struct([("a", pa.int64()), ("b", pa.string())])),
        "deep": pa.array(
            [[{"v": [i, i + 1]}] if i % 3 else None for i in range(n)],
            pa.list_(pa.struct([("v", pa.list_(pa.int64()))]))),
    })
    p = str(tmp_path / "deeppage.parquet")
    pq.write_table(tbl, p, row_group_size=n, data_page_size=1024,
                   write_page_index=True, use_dictionary=False)
    for pred, rr in ((("k", ">=", 4321), None), (("k", "<", 17), None),
                     (None, (1234, 1300)),
                     ([("k", ">=", 100), ("k", "<", 130)], None)):
        got = pqreader.read_table(p, predicate=pred, row_range=rr)
        if pred is not None:
            conj = pred if isinstance(pred, list) else [pred]
            mask = None
            for c_, op, lit in conj:
                m = {"<": pc.less, ">=": pc.greater_equal}[op](
                    tbl.column(c_), lit)
                mask = m if mask is None else pc.and_kleene(mask, m)
            exp = tbl.filter(mask)
        else:
            exp = tbl.slice(rr[0], rr[1] - rr[0])
        assert got.num_rows == exp.num_rows, (pred, rr)
        for col in ("k", "s", "deep"):
            assert got.column(col).to_pylist() \
                == exp.column(col).to_pylist(), (pred, rr, col)


def test_pqreader_our_list_writer_page_trim(monkeypatch, tmp_path):
    """Our own writer's LIST pages (3-level group, pages break on row
    boundaries) trim the same way."""
    import numpy as np

    from parquet_go_spark.codecs.kinds import Kind
    from parquet_go_spark.interop import pqreader
    from parquet_go_spark.interop.pqwriter import ColumnSpec, write_table

    n = 8000
    lens = np.full(n, 2, dtype=np.int64)
    elems = np.arange(2 * n, dtype=np.int64)
    p = str(tmp_path / "ourlist.parquet")
    write_table(p, [
        ColumnSpec("k", Kind.INT64, np.arange(n, dtype=np.int64)),
        ColumnSpec("vals", Kind.INT64, elems, lengths=lens),
    ], page_rows=1000, row_group_rows=n)

    pages = []
    orig = pqreader._decode_page

    def spy(data, pos, leaf, codec, dictionary_vals, *a, **kw):
        out = orig(data, pos, leaf, codec, dictionary_vals, *a, **kw)
        if out[0] == "data":
            pages.append(leaf.path)
        return out

    monkeypatch.setattr(pqreader, "_decode_page", spy)
    got = pqreader.read_table(p, predicate=("k", "=", 4242))
    assert got.to_pylist() == [{"k": 4242, "vals": [8484, 8485]}]
    from collections import Counter

    c = Counter(pages)
    assert c[("k",)] == 1 and c[("vals", "list", "element")] == 1


# ------------------------------------------- struct-field predicates


def test_pqreader_struct_field_predicate(monkeypatch, tmp_path):
    """('s.a', op, lit) filters on a struct field with the same
    stat/page pruning as a top-level column; a null parent struct
    behaves like a null field (SQL s.a semantics)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from parquet_go_spark.interop import pqreader

    n = 12000
    structs = [None if i % 997 == 0 else
               {"a": i, "b": f"v{i:05d}"} for i in range(n)]
    tbl = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "s": pa.array(structs,
                      pa.struct([("a", pa.int64()), ("b", pa.string())])),
    })
    p = str(tmp_path / "structpred.parquet")
    pq.write_table(tbl, p, row_group_size=3000, data_page_size=2048,
                   write_page_index=True, use_dictionary=False)

    calls = _count_chunk_reads(monkeypatch)
    got = pqreader.read_table(p, predicate=("s.a", ">=", 11000))
    sa = pc.struct_field(tbl.column("s").combine_chunks(), "a")
    exp = tbl.filter(pc.greater_equal(sa, 11000))
    assert got.num_rows == exp.num_rows
    assert got.column("k").to_pylist() == exp.column("k").to_pylist()
    # rows 11000+ live in the last of 4 row groups: the other three
    # are stat-refuted (page path handles the survivor)
    assert not any(v < 9000 for v in got.column("k").to_pylist())

    # equality + string field + isnull on the field (null parent rows
    # count as null fields) + OR composition
    got = pqreader.read_table(p, predicate=("s.b", "=", "v00042"))
    assert got.column("k").to_pylist() == [42]
    got = pqreader.read_table(p, predicate=("s.a", "isnull"))
    exp = tbl.filter(pc.is_null(sa))
    assert got.column("k").to_pylist() == exp.column("k").to_pylist()
    got = pqreader.read_table(
        p, predicate=("or", [("s.a", "<", 5), ("s.b", "startswith",
                                               "v0119")]))
    sb = pc.struct_field(tbl.column("s").combine_chunks(), "b")
    exp = tbl.filter(pc.or_kleene(
        pc.less(sa, 5), pc.starts_with(sb, pattern="v0119")))
    assert got.column("k").to_pylist() == exp.column("k").to_pylist()


def test_pqreader_struct_field_predicate_errors(tmp_path):
    """Unknown field, repeated path, and a literal dotted column name
    all resolve sensibly (exact top-level name wins over the split)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pt

    from parquet_go_spark.interop import pqreader

    tbl = pa.table({
        "s.a": pa.array([1, 2, 3], pa.int64()),  # literal dotted name
        "tags": pa.array([[1], [2], [3]], pa.list_(pa.int64())),
        "s": pa.array([{"a": 9}, {"a": 8}, {"a": 7}],
                      pa.struct([("a", pa.int64())])),
    })
    p = str(tmp_path / "dotted.parquet")
    pq.write_table(tbl, p)
    # exact top-level "s.a" column wins: matches [1,2,3], not s.a=9
    got = pqreader.read_table(p, predicate=("s.a", "=", 2))
    assert got.num_rows == 1 and got.column("s.a").to_pylist() == [2]
    with _pt.raises(ValueError, match="not found"):
        pqreader.read_table(p, predicate=("s.zzz", "=", 1))
    with _pt.raises(ValueError, match="not found"):
        pqreader.read_table(p, predicate=("tags.element", "=", 1))
