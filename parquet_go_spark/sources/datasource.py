"""Python Data Source (Spark 4) exposing an encoded blob store as a
first-class Spark table: ``spark.read.format("colcodec").load(path)``.

The reference exposes its container through ``parquet.OpenFile`` /
``reader.Read`` (/root/reference/file.go:65-130, reader.go:63-65); the
idiomatic Spark 4 equivalent of that entry point is the Python Data
Source API, so the blob store plugs into plain ``spark.read`` —
joins, SQL views, and writes compose without calling into the pipeline
module.

Scale shape:

- ``partitions()`` lists the blob parquet FILES (a driver-side listing,
  not a data read): every chunk's blob rows are written by one task, so
  a chunk never straddles files and one file is one self-contained unit
  of decode work.
- Filter pushdown (``pushFilters``, Spark 4.1) does NOT prune on the
  driver: the accepted filters ride into every task, and ``read()``
  first scans only its file's metadata columns (chunk_id, column,
  stream, min_val, max_val, bloom — KBs), drops chunks whose stats or
  split-block bloom refute the filters, and decodes survivors. Pruning
  cost is distributed with the scan; the driver never loops over files.
  All filters are returned to Spark for exact re-evaluation, so bloom
  false positives and truncated bounds can never corrupt results (same
  contract as the reference's page skipping, search.go:6-95).

SPARK 4.1 CAVEAT (upstream, applies to EVERY python data source with
``spark.sql.python.filterPushdown.enabled``): the JVM caches planned
partitions per relation (``PythonDataSourceV2.readInfo``) and filter
pushdown overwrites that cache, so a DataFrame OBJECT reused across
queries serves the first pushed query's pruned scan to a later query
that pushes nothing — silently losing rows even though Spark applies
the later filter exactly (the pruned-away chunks never reach it).
Reproduced with a minimal 20-line source; our filters already ride
inside each InputPartition, so no reader state is involved. Create
the DataFrame per query (``spark.read.format("colcodec").load(p)``
is a driver-side listing, milliseconds). Pinned in tests so a Spark
fix is noticed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructField, StructType


@dataclass
class _FileSlice(InputPartition):
    path: str
    # filters ride IN the partition: Spark's python-datasource worker
    # REUSES one reader instance across queries on the same DataFrame,
    # and a query with no pushable filters never calls pushFilters —
    # reader-instance filter state would silently apply the PREVIOUS
    # query's pruning (reproduced: q1 `v IS NULL AND k < 100` then q2
    # `v IS NOT NULL OR k = 0` returned only q1-pruned rows)
    filters: tuple = ()


def _decode_blob_table(tbl, cols):
    """Decode a table of blob rows through the one-chunk-at-a-time
    kernel — shared by the batch reader and the streaming source."""
    from parquet_go_spark.plans import pipeline

    if tbl.num_rows == 0:
        return
    tbl = tbl.sort_by("chunk_id")  # kernel holds one chunk at a time
    decode = pipeline._decode_stream_fn(cols)
    yield from decode(tbl.to_batches())


def _stat_key(spark_type: str, stat: str):
    """Manifest min/max string → comparable value, mirroring
    pipeline._stat_expr: byte space for strings/binary (latin-1 round
    trip of the truncated bound bytes), int for the integer family
    (timestamps are stored as epoch micros, dates as epoch days),
    float for floats. Returns None — meaning "unbounded, keep" — for
    types we don't compare and for NaN float bounds (a chunk holding
    any NaN records NaN min/max; NaN compares false both ways and must
    never prune)."""
    import math

    if stat is None:
        return None
    try:
        if spark_type in ("string", "binary"):
            return stat.encode("latin-1")
        if spark_type in ("int", "bigint", "timestamp", "timestamp_ntz",
                          "date"):
            return int(stat)
        if spark_type.startswith("decimal("):
            return int(stat)  # manifest stores the UNSCALED integer
        if spark_type in ("float", "double"):
            f = float(stat)
            return None if math.isnan(f) else f
    except (ValueError, TypeError):
        return None
    return None  # containers: no task-side pruning, keep


def _probe_key(spark_type: str, value):
    """User filter literal → the same comparison space (mirrors
    pipeline._probe_expr). Spark pushes timestamp literals as
    datetime.datetime and date literals as datetime.date — convert to
    the encoded representation (micros / epoch days, matching
    pipeline._arrow_to_values). Returns None — "cannot compare, keep
    the chunk" — on any unexpected value shape: pruning must only ever
    skip work, never guess."""
    import datetime as _dt
    import math

    if value is None:
        return None
    try:
        if spark_type in ("string", "binary"):
            return (value.encode("utf-8") if isinstance(value, str)
                    else bytes(value))
        if spark_type in ("timestamp", "timestamp_ntz"):
            if isinstance(value, _dt.datetime):
                if value.tzinfo is not None:
                    value = value.astimezone(
                        _dt.timezone.utc).replace(tzinfo=None)
                elif spark_type == "timestamp":
                    # Spark delivers TimestampType (LTZ) literals as
                    # naive datetimes in the driver's LOCAL timezone,
                    # while manifest stats hold UTC epoch micros —
                    # interpret via the local tz (naive .astimezone()
                    # does exactly that), never as UTC: a wrong offset
                    # here silently prunes chunks holding real matches.
                    # timestamp_ntz naive values ARE the stored wall
                    # clock and convert directly.
                    value = value.astimezone(
                        _dt.timezone.utc).replace(tzinfo=None)
                epoch = _dt.datetime(1970, 1, 1)
                return ((value - epoch) // _dt.timedelta(microseconds=1))
            return int(value)
        if spark_type == "date":
            if isinstance(value, _dt.datetime):
                value = value.date()
            if isinstance(value, _dt.date):
                return (value - _dt.date(1970, 1, 1)).days
            return int(value)
        if spark_type in ("int", "bigint"):
            if isinstance(value, bool) or not isinstance(value, int):
                return None
            return int(value)
        if spark_type.startswith("decimal("):
            # scale the literal into the manifest's UNSCALED-int space
            # (mirrors pipeline._probe_expr); inexact literals → None =
            # keep the chunk (rounding would mis-prune range predicates)
            from parquet_go_spark.plans.pipeline import (_decimal_info,
                                                         _unscaled)

            dp = _decimal_info(spark_type)
            if dp is None:
                return None
            return _unscaled(value, dp[1])
        if spark_type in ("float", "double"):
            f = float(value)
            return None if math.isnan(f) else f
    except (ValueError, TypeError, OverflowError):
        return None
    return None


def _chunk_survives(filters, col_types, stats, blooms,
                    nulls=None) -> bool:
    """Can a chunk possibly hold rows matching ALL filters?

    stats: {column: (min_str|None, max_str|None)}; blooms:
    {column: bloom blob bytes|None}; nulls:
    {column: (null_count|None, n_rows|None)}. NULL bounds mean
    unbounded — unprunable (matches pruned_decode's keep rule)."""
    import numpy as np

    from parquet_go_spark.codecs import bloom as bloomlib
    from parquet_go_spark.codecs.bytearrays import ByteArrays
    from parquet_go_spark.codecs.kinds import Kind

    for col, op, value in filters:
        if op in ("isnull", "notnull"):
            nc, nr = (nulls or {}).get(col, (None, None))
            if nc is None:
                continue  # unknown: keep
            if op == "isnull" and nc == 0:
                return False  # provably no NULL rows in this chunk
            if op == "notnull" and nr is not None and nc == nr:
                return False  # provably ALL rows NULL
            continue
        spark_type = col_types.get(col)
        if spark_type is None or col not in stats:
            continue
        mn_s, mx_s = stats[col]
        mn = _stat_key(spark_type, mn_s)
        mx = _stat_key(spark_type, mx_s)
        probes = value if op == "in" else [value]
        keys = [_probe_key(spark_type, v) for v in probes]
        if any(k is None for k in keys):
            continue
        if op in ("eq", "in"):
            alive = [
                k for k in keys
                if (mn is None or k >= mn) and (mx is None or k <= mx)
            ]
            if not alive:
                return False
            blob = blooms.get(col)
            if blob is not None:
                # probe with the column's PHYSICAL kind and dtype — the
                # filter was built from those bits (pipeline._col_kind);
                # an int64/double probe of an int32/float bloom hashes
                # differently and would be a silent false negative
                if spark_type in ("string", "binary"):
                    vals = ByteArrays.from_pylist(alive)
                    kind = Kind.BYTE_ARRAY
                elif spark_type.startswith("decimal("):
                    from parquet_go_spark.plans import pipeline

                    # probe in the column's PHYSICAL decimal space
                    # (unscaled int32/int64, or the FLBA(16) int128
                    # little-endian words — same layout the bloom was
                    # built from, pipeline._col_kind/_decimal_to_values)
                    kind = pipeline._col_kind(spark_type)
                    dp = pipeline._decimal_info(spark_type)
                    if dp[0] <= 18:
                        np_dt = np.int32 if dp[0] <= 9 else np.int64
                        try:
                            vals = np.array(alive, dtype=np_dt)
                        except OverflowError:
                            continue
                        if any(int(v) != int(a)
                               for v, a in zip(vals, alive)):
                            continue  # wrap = silent false negative
                    else:
                        mask64 = (1 << 64) - 1
                        words = np.array(
                            [[v & mask64, (v >> 64) & mask64]
                             for v in alive], dtype=np.uint64)
                        vals = words.view(np.uint8).reshape(len(alive), 16)
                else:
                    from parquet_go_spark.plans import pipeline

                    kind = pipeline._col_kind(spark_type)
                    np_dt = {Kind.INT32: np.int32, Kind.INT64: np.int64,
                             Kind.FLOAT: np.float32,
                             Kind.DOUBLE: np.float64}.get(kind)
                    if np_dt is None:
                        continue  # no safe bloom probe for this kind
                    try:
                        vals = np.array(alive, dtype=np_dt)
                    except OverflowError:
                        continue  # probe outside the physical range
                    if vals.dtype.kind == "i" and any(
                        int(v) != int(a) for v, a in zip(vals, alive)
                    ):
                        continue  # silent wrap would be a false negative
                if not bool(
                    bloomlib.might_contain(blob, vals, kind).any()
                ):
                    return False
        elif op in ("gt", "gte") and mx is not None:
            if mx < keys[0] or (op == "gt" and mx == keys[0]):
                return False
        elif op in ("lt", "lte") and mn is not None:
            if mn > keys[0] or (op == "lt" and mn == keys[0]):
                return False
    return True


def _anchor_tz(col_type: str, value):
    """Resolve naive TimestampType literals on the DRIVER: pushFilters
    runs driver-side, but _chunk_survives runs on executors whose OS tz
    can differ — a naive datetime shipped as-is would be interpreted in
    the WRONG zone there and silently prune matching chunks. Recursive
    over In-lists."""
    import datetime as _dt

    if isinstance(value, (list, tuple)):
        return [_anchor_tz(col_type, v) for v in value]
    if (col_type == "timestamp" and isinstance(value, _dt.datetime)
            and value.tzinfo is None):
        return value.astimezone(_dt.timezone.utc)
    return value


def _translate_filters(filters, col_types):
    """Spark Filter objects → picklable (col, op, value) triples for the
    columns/types we can prune on. Unsupported filters are ignored here
    (Spark re-applies everything exactly — we only skip work)."""
    out = []
    for f in filters:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:
            continue
        col = attr[0]
        if col_types.get(col) is None:
            continue
        t = col_types[col]
        if isinstance(f, (IsNull, IsNotNull)):
            # no literal: prunes on the manifest's null_count alone
            out.append((col, "isnull" if isinstance(f, IsNull)
                        else "notnull", None))
        elif isinstance(f, EqualTo):
            out.append((col, "eq", _anchor_tz(t, f.value)))
        elif isinstance(f, In):
            out.append((col, "in", _anchor_tz(t, list(f.value))))
        elif isinstance(f, GreaterThan):
            out.append((col, "gt", _anchor_tz(t, f.value)))
        elif isinstance(f, GreaterThanOrEqual):
            out.append((col, "gte", _anchor_tz(t, f.value)))
        elif isinstance(f, LessThan):
            out.append((col, "lt", _anchor_tz(t, f.value)))
        elif isinstance(f, LessThanOrEqual):
            out.append((col, "lte", _anchor_tz(t, f.value)))
    return out


class ColcodecReader(DataSourceReader):
    def __init__(self, path: str, cols: list[tuple[str, str]]):
        self._path = path
        self._cols = cols
        self._filters: list[tuple[str, str, object]] = []

    def pushFilters(self, filters):
        scalar_types = {
            c: t for c, t in self._cols
            if not (t.startswith("array<") or t.startswith("map<")
                    or t.startswith("struct<"))
        }
        self._filters = _translate_filters(filters, scalar_types)
        # we only SKIP chunks; Spark must still evaluate every filter
        # exactly (bloom fpp / truncated bounds admit false positives).
        # Assign eagerly and return a plain iterator — as a generator,
        # self._filters would only be set if Spark drained the result,
        # and pruning would silently disengage if it ever short-circuits
        return iter(filters)

    def partitions(self):
        import os

        # snapshot the filters into the slices and RESET the instance:
        # the next query on this reused reader may legitimately skip
        # pushFilters (nothing pushable), and stale pruning from the
        # previous query would silently drop its rows. A re-planned
        # query that does push calls pushFilters again first; one that
        # doesn't merely loses pruning, never correctness.
        filters, self._filters = tuple(self._filters), []
        files = sorted(
            f for f in os.listdir(self._path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        return [_FileSlice(os.path.join(self._path, f), filters)
                for f in files]

    def read(self, partition: _FileSlice | None):
        import pyarrow.parquet as pq

        from parquet_go_spark.plans import pipeline

        if partition is None:  # empty store: Spark passes one None slice
            return

        col_types = dict(self._cols)
        if partition.filters:
            # metadata columns only — the blob column (the file's bulk)
            # is not touched until chunks survive; bloom bitsets are
            # read only for the filtered columns' values streams
            filter_cols = sorted({c for c, _, _ in partition.filters})
            # null tests read neither stats nor bitsets; bloom bitsets
            # are the largest metadata stream — fetch them only when a
            # comparison/equality op is actually present
            null_only = all(op in ("isnull", "notnull")
                            for _, op, _ in partition.filters)
            meta_cols = ["chunk_id", "column", "stream",
                         "null_count", "n_rows"]
            if not null_only:
                meta_cols += ["min_val", "max_val", "bloom"]
            meta = pq.read_table(
                partition.path,
                columns=meta_cols,
                filters=[("stream", "=", "values"),
                         ("column", "in", filter_cols)],
            )
            per_chunk: dict[str, tuple[dict, dict, dict]] = {}
            for row in meta.to_pylist():  # blob-row count: metadata scale
                st, bl, nu = per_chunk.setdefault(
                    row["chunk_id"], ({}, {}, {}))
                if not null_only:
                    st[row["column"]] = (row["min_val"], row["max_val"])
                    bl[row["column"]] = row["bloom"]
                nu[row["column"]] = (row["null_count"], row["n_rows"])
            keep = {
                cid for cid, (st, bl, nu) in per_chunk.items()
                if _chunk_survives(partition.filters, col_types, st, bl, nu)
            }
            # chunks with no values stream for any filtered column are
            # never pruned
            all_ids = pq.read_table(
                partition.path, columns=["chunk_id"]).column(0).to_pylist()
            keep |= {cid for cid in all_ids if cid not in per_chunk}
            if not keep:
                return  # every chunk refuted by stats/bloom
            # row-level dataset filter: refuted chunks' blob rows are
            # dropped during the scan, not materialized then discarded
            tbl = pq.read_table(
                partition.path,
                filters=[("chunk_id", "in", sorted(keep))],
            )
        else:
            tbl = pq.read_table(partition.path)
        yield from _decode_blob_table(tbl, self._cols)


class ColcodecDataSource(DataSource):
    """spark.read.format("colcodec").load(<encode_table out_path>)."""

    @classmethod
    def name(cls) -> str:
        return "colcodec"

    def _cols(self) -> list[tuple[str, str]]:
        from parquet_go_spark.plans import pipeline

        path = self.options.get("path")
        if not path:
            raise ValueError("colcodec: .load(<blob store path>) required")
        return pipeline._read_schema_sidecar(path)

    def schema(self) -> StructType:
        from parquet_go_spark.plans import pipeline

        return StructType([
            StructField(name, pipeline._spark_dtype(t))
            for name, t in self._cols()
        ])

    def reader(self, schema: StructType) -> ColcodecReader:
        return ColcodecReader(self.options["path"], self._cols())

    def streamReader(self, schema: StructType):  # noqa: N802
        return ColcodecStreamReader(self.options["path"], self._cols())

    def writer(self, schema: StructType, overwrite: bool):
        import os
        import uuid

        path = self.options.get("path")
        if not path:
            raise ValueError("colcodec: .save(<blob store path>) required")
        cols = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        repo_col = self.options.get("repo_col", cols[0][0])
        if repo_col not in dict(cols):
            raise ValueError(f"colcodec: repo_col {repo_col!r} not in schema")
        w = ColcodecArrowWriter(
            path, cols, repo_col,
            self.options.get("compression"),
            int(self.options.get("target_chunk_bytes", 8 << 20)),
            overwrite,
            uuid.uuid4().hex[:12],  # per-JOB token: chunk-id namespace
            # + private staging dir, so concurrent/successive appends
            # never collide
        )
        if os.path.isdir(path):
            w._check_schema()  # fail fast at plan time, before any task
        return w

    def streamWriter(self, schema: StructType, overwrite: bool):  # noqa: N802
        import os
        import uuid

        if overwrite:
            raise ValueError(
                "colcodec sink supports append output mode only "
                "(complete/truncate would rewrite the store every batch)")
        path = self.options.get("path")
        if not path:
            raise ValueError("colcodec: .start(<blob store path>) required")
        cols = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        repo_col = self.options.get("repo_col", cols[0][0])
        if repo_col not in dict(cols):
            raise ValueError(f"colcodec: repo_col {repo_col!r} not in schema")
        w = ColcodecStreamWriter(
            path, cols, repo_col,
            self.options.get("compression"),
            int(self.options.get("target_chunk_bytes", 8 << 20)),
            overwrite,
            uuid.uuid4().hex[:12],
            sink_id=self.options.get("sink_id", "q0"),
        )
        if os.path.isdir(path):
            w._check_schema()  # fail fast at plan time, before any batch
        return w


def register(spark) -> None:
    """Register the format for this session (executors import this
    module from --py-files; registration itself is driver-side).
    Python-data-source filter pushdown ships disabled by default in
    Spark 4.1 — enable it so pushFilters() is honored (runtime-settable
    SQL conf)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ColcodecDataSource)


@dataclass
class _StagedFile(WriterCommitMessage):
    staged: str


class _CommitLock:
    """Exclusive flock over <store>/._commit.lock held across the
    [stamp mtimes + rename in] section of every commit. The stream
    source's watermark offsets order files by commit-time mtime;
    without serialization, a committer that stamps its files and then
    stalls past another job's commit would rename files in BEHIND the
    watermark — data the tail would silently skip. Driver-side, once
    per job commit: contention-free in practice."""

    def __init__(self, store: str):
        import os

        self._path = os.path.join(store, "._commit.lock")
        self._fd = None

    def __enter__(self):
        import fcntl
        import os

        self._fd = os.open(self._path, os.O_CREAT | os.O_RDWR, 0o644)
        fcntl.flock(self._fd, fcntl.LOCK_EX)
        return self

    def __exit__(self, *exc):
        import fcntl
        import os

        fcntl.flock(self._fd, fcntl.LOCK_UN)
        os.close(self._fd)
        self._fd = None
        return False


class ColcodecArrowWriter(DataSourceArrowWriter):
    """df.write.format("colcodec").save(store) — the DIRECT write path.

    Each task encodes its own partition: rows are grouped by the repo
    column with a size-triggered flush (a task holds at most one
    target-sized buffer per repo — the same bounded-memory profile as
    the pipeline's encode kernel), chunks stream into a staged parquet
    file, and the driver-side commit writes the schema sidecar FIRST and
    then atomically renames staged files into the store — a crash at any
    point leaves either a fully-valid store or a job-private
    .staging-<job> directory the commit/abort sweep removes (never
    orphaned data files without a sidecar). Chunk ids embed a per-job
    token, so appends from different jobs can never collide when decode
    paths group blob rows by chunk_id across files. NULL repo values
    group under the key "None" (the grouping key only drives chunk
    placement and naming — the encoded columns keep the true values).
    Chunk placement follows the DataFrame's own partitioning; for
    planned/salted/range layouts and manifest resume use
    pipeline.encode_table (this path trades planning for plain
    spark.write composability)."""

    def __init__(self, path: str, cols: list[tuple[str, str]],
                 repo_col: str, compression: str | None,
                 target_chunk_bytes: int, overwrite: bool, token: str):
        self._path = path
        self._cols = cols
        self._repo_col = repo_col
        self._compression = compression
        self._target = target_chunk_bytes
        self._overwrite = overwrite
        self._token = token

    # -- executor side ----------------------------------------------
    def write(self, iterator):
        import os
        import uuid

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        from parquet_go_spark.plans import pipeline

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        staging = os.path.join(self._path, f".staging-{self._token}")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"w-{uuid.uuid4().hex}.parquet")

        writer = None
        fsst_cache: dict = {}
        bufs: dict[str, list] = {}
        sizes: dict[str, int] = {}
        seqs: dict[str, int] = {}

        def flush(repo: str):
            nonlocal writer
            tbl = pa.Table.from_batches(bufs.pop(repo))
            sizes.pop(repo)
            seq = seqs.get(repo, 0)
            seqs[repo] = seq + 1
            rec = pipeline._encode_one_chunk(
                tbl, self._cols, repo, seq, self._compression,
                f"@w{self._token}p{pid}", fsst_cache=fsst_cache)
            if writer is None:
                writer = pq.ParquetWriter(
                    staged, pipeline._BLOB_ARROW_SCHEMA)
            writer.write_table(pa.Table.from_batches([rec]))

        for batch in iterator:
            n = batch.num_rows
            if n == 0:
                continue
            # single-pass grouping (the encode kernel's idiom): one
            # dictionary-encode + one stable argsort per batch, then
            # contiguous slices per repo — not one filter scan per
            # distinct value. NULLs group under "None".
            repos = pc.fill_null(
                pc.cast(batch.column(self._repo_col), pa.string()), "None")
            dictized = pc.dictionary_encode(repos)
            rcodes = np.asarray(dictized.indices).astype(np.int64)
            rdict = dictized.dictionary
            order = np.argsort(rcodes, kind="stable")
            sorted_codes = rcodes[order]
            change = np.ones(n, dtype=bool)
            change[1:] = sorted_codes[1:] != sorted_codes[:-1]
            starts = np.flatnonzero(change)
            data = batch.take(pa.array(order))
            for i, st in enumerate(starts):
                e = starts[i + 1] if i + 1 < len(starts) else n
                repo = rdict[int(sorted_codes[st])].as_py()
                sl = data.slice(st, e - st)
                bufs.setdefault(repo, []).append(sl)
                sizes[repo] = sizes.get(repo, 0) + sl.nbytes
                if sizes[repo] >= self._target:
                    flush(repo)
        for repo in list(bufs):
            flush(repo)
        if writer is None:
            # Spark 4.1 rejects a None commit message despite the API
            # docstring — return an empty marker for empty partitions
            return _StagedFile(staged="")
        writer.close()
        return _StagedFile(staged=staged)

    # -- driver side -------------------------------------------------
    def _check_schema(self):
        import os

        from parquet_go_spark.plans import pipeline

        sidecar = os.path.join(self._path, "_colcodec_schema.json")
        if os.path.exists(sidecar) and not self._overwrite:
            existing = pipeline._read_schema_sidecar(self._path)
            if existing != self._cols:
                raise ValueError(
                    "colcodec append: schema differs from the store's "
                    f"({existing} vs {self._cols}); use "
                    "pipeline.compact_tables for schema-unifying merges")

    def commit(self, messages):
        import os
        import shutil

        from parquet_go_spark.plans import pipeline

        os.makedirs(self._path, exist_ok=True)
        self._check_schema()  # backstop; writer() already failed fast
        # overwrite: snapshot what must go BEFORE renaming the new files
        # in — old data is deleted only once the full new dataset is in
        # place (names never collide: per-job token), so a mid-commit
        # crash leaves at worst old+new rows (recoverable duplicates),
        # never a sidecar-valid but emptied store. Stale streaming
        # `_q*-b*.done` markers must go too: a later streaming query on
        # the cleared store restarting batchIds at 0 would read them as
        # committed replays and silently drop its first batches.
        doomed = []
        if self._overwrite:
            for f in os.listdir(self._path):
                data = f.endswith(".parquet") and not f.startswith(("_", "."))
                marker = f.startswith("_q") and f.endswith(".done")
                if data or marker:
                    doomed.append(f)
        # sidecar BEFORE the renames: a crash mid-commit must never
        # leave data files that no sidecar describes
        pipeline._write_schema_sidecar(self._path, self._cols)
        staged = [m.staged for m in messages if m is not None and m.staged]
        with _CommitLock(self._path):
            for i, src in enumerate(staged):
                os.utime(src)  # commit-time mtime BEFORE the rename:
                # the stream source's watermark offsets order files by
                # mtime — a listed file must never carry its (older)
                # task-write time, and the lock keeps concurrent
                # committers' stamp+rename sections from interleaving
                os.replace(
                    src,
                    os.path.join(self._path,
                                 f"part-w{self._token}-{i:05d}.parquet"))
        for f in doomed:
            try:
                os.unlink(os.path.join(self._path, f))
            except FileNotFoundError:
                pass
        if self._overwrite:
            for f in os.listdir(self._path):  # crashed jobs' staging dirs
                if (f.startswith(".staging-")
                        and f != f".staging-{self._token}"):
                    shutil.rmtree(os.path.join(self._path, f),
                                  ignore_errors=True)
        shutil.rmtree(os.path.join(self._path, f".staging-{self._token}"),
                      ignore_errors=True)

    def abort(self, messages):
        import os
        import shutil

        for m in messages:
            if m is not None and m.staged and os.path.exists(m.staged):
                os.unlink(m.staged)
        shutil.rmtree(os.path.join(self._path, f".staging-{self._token}"),
                      ignore_errors=True)


class ColcodecStreamWriter(ColcodecArrowWriter, DataSourceStreamArrowWriter):
    """df.writeStream.format("colcodec") — the store as a Structured
    Streaming sink (append output mode). Tasks encode exactly like the
    batch writer (the write() method is shared); per micro-batch the
    driver commit renames staged files to sink/batch-stamped names and
    then drops an empty `_q<sink_id>-b<batchId>.done` marker — the
    marker, written LAST, is the replay check, so a crash mid-rename
    leaves an unmarked partial batch that the replay fully rewrites
    (partial files are cleared first) instead of being mistaken for a
    committed one. Exactly-once is scoped by `sink_id` (option,
    default "q0"): one streaming query per sink_id per store — a second
    query (or a fresh checkpoint, which restarts batchIds at 0) must
    set its own sink_id or its early batches would look like replays.
    Chunk ids stay globally unique (per-task uuid token inside the
    blobs), so decode paths that group by chunk_id across files are
    safe either way."""

    def __init__(self, *args, sink_id: str = "q0"):
        super().__init__(*args)
        self._sink_id = sink_id

    def _marker(self, batchId):  # noqa: N803
        import os

        return os.path.join(
            self._path, f"_q{self._sink_id}-b{batchId:08d}.done")

    def _sweep_staging(self):
        """Clear retried-task orphans: micro-batches run sequentially,
        so at commit time nothing else writes to this job's staging."""
        import os
        import shutil

        shutil.rmtree(os.path.join(self._path, f".staging-{self._token}"),
                      ignore_errors=True)

    def commit(self, messages, batchId):  # noqa: N803 (Spark API name)
        import os

        from parquet_go_spark.plans import pipeline

        os.makedirs(self._path, exist_ok=True)
        self._check_schema()
        staged = [m.staged for m in messages if m is not None and m.staged]
        prefix = f"part-q{self._sink_id}-b{batchId:08d}-"
        if os.path.exists(self._marker(batchId)):
            # fully-committed batch replayed: drop the duplicate staging
            for src in staged:
                if os.path.exists(src):
                    os.unlink(src)
            self._sweep_staging()
            return
        # no marker: any same-prefix files are a crashed partial commit —
        # clear them and rewrite the whole batch from the fresh staging
        for f in os.listdir(self._path):
            if f.startswith(prefix):
                os.unlink(os.path.join(self._path, f))
        pipeline._write_schema_sidecar(self._path, self._cols)
        with _CommitLock(self._path):
            for i, src in enumerate(staged):
                os.utime(src)  # commit-time mtime (watermark order)
                os.replace(src, os.path.join(
                    self._path, f"{prefix}{self._token}-{i:05d}.parquet"))
        open(self._marker(batchId), "w").close()  # marker LAST
        self._sweep_staging()

    def abort(self, messages, batchId):  # noqa: N803
        import os

        for m in messages:
            if m is not None and m.staged and os.path.exists(m.staged):
                os.unlink(m.staged)


class ColcodecStreamReader(DataSourceStreamReader):
    """spark.readStream.format("colcodec").load(store) — tail a growing
    blob store with O(1) offsets (VERDICT r3 #3: the v1 design carried
    the FULL file list in every offset — MBs per checkpoint entry on a
    10⁵-file store).

    Offset v2 is a commit-time-mtime WATERMARK: {"hw": <max mtime_ns>,
    "pend": [names AT the watermark], "n": <emitted count>}. Both write
    paths stamp files with commit-time mtimes before renaming them in,
    so arrival order is mtime order (single store host — the same
    assumption Spark's FileStreamSource makes with maxFileAge) and
    "emitted" is simply mtime < hw, plus the pend tie-list at exactly
    hw (ties are same-nanosecond commits — a handful of names, never
    the store). `n` keeps the rewrite guard: if fewer than n
    previously-emitted files remain, the store was rewritten under the
    reader and the query fails loudly instead of re-emitting rewritten
    data. v1 {"files": [...]} offsets from old checkpoints are still
    honored for the transition batch. Each new file is one input
    partition decoded executor-side with the same one-chunk-at-a-time
    kernel as the batch reader."""

    def __init__(self, path: str, cols: list[tuple[str, str]]):
        self._path = path
        self._cols = cols

    def _listing(self) -> dict[str, int]:
        """{name: mtime_ns} of the store's data files."""
        import os

        try:
            names = os.listdir(self._path)
        except FileNotFoundError:
            return {}
        out = {}
        for f in names:
            if not f.endswith(".parquet") or f.startswith(("_", ".")):
                continue
            try:
                out[f] = os.stat(os.path.join(self._path, f)).st_mtime_ns
            except FileNotFoundError:
                continue  # renamed away mid-listing
        return out

    @staticmethod
    def _emitted_by(off: dict, name: str, mtime_ns: int) -> bool:
        if "files" in off:  # v1 offset (old checkpoint): explicit set
            return name in set(off["files"])
        hw = off.get("hw", -1)
        return mtime_ns < hw or (
            mtime_ns == hw and name in set(off.get("pend", ())))

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API name)
        return {"v": 2, "hw": -1, "pend": [], "n": 0}

    def latestOffset(self) -> dict:  # noqa: N802
        listing = self._listing()
        if not listing:
            return {"v": 2, "hw": -1, "pend": [], "n": 0}
        hw = max(listing.values())
        pend = sorted(f for f, mt in listing.items() if mt == hw)
        return {"v": 2, "hw": hw, "pend": pend, "n": len(listing)}

    def partitions(self, start: dict, end: dict):
        import os

        listing = self._listing()
        was = [f for f, mt in listing.items()
               if self._emitted_by(start, f, mt)]
        expect = len(start["files"]) if "files" in start \
            else start.get("n", 0)
        if len(was) < expect:
            # overwrite mode or compact_tables rewrote the store under
            # the reader: watermark offsets would re-emit rewritten
            # data as "new" (duplicates downstream). Fail loudly — a
            # rewritten store needs a fresh checkpoint.
            raise RuntimeError(
                "colcodec stream source: store was rewritten while being "
                f"tailed ({expect - len(was)} previously-emitted files "
                "vanished); restart the query with a fresh checkpoint")
        if "files" not in start and len(was) > expect:
            # a file LANDED BEHIND the watermark (mtime ≤ hw but never
            # counted): a writer bypassed the commit lock (e.g. files
            # copied in by hand, or a non-colcodec writer without
            # commit-time stamping). Silently skipping it would lose
            # rows forever — fail loudly instead.
            raise RuntimeError(
                "colcodec stream source: "
                f"{len(was) - expect} file(s) appeared BEHIND the "
                "offset watermark (stamped before the last batch but "
                "renamed in after it); the store is being written by "
                "something that bypasses the colcodec commit protocol — "
                "restart with a fresh checkpoint to pick them up")
        new = sorted(
            f for f, mt in listing.items()
            if self._emitted_by(end, f, mt)
            and not self._emitted_by(start, f, mt))
        return [_FileSlice(os.path.join(self._path, f)) for f in new]

    def read(self, partition: _FileSlice):
        import pyarrow.parquet as pq

        yield from _decode_blob_table(
            pq.read_table(partition.path), self._cols)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean: offsets are self-contained watermarks
