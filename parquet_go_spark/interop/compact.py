"""Small-file compaction for exported parquet directories — the
MergeRowGroups/compaction analog (merge.go:25, writer_copy.go) for the
interop path. A long-running export (streaming appends, many tiny
repos) accumulates small files; at cluster scale the file count itself
becomes the bottleneck (listing, task scheduling, footer reads), so
compaction folds files below a size threshold into consolidated ones.

Distribution shape: the driver reads ONLY the export summary manifest
(metadata-scale), bin-packs small files into merge jobs, and ships each
job to an executor that reads its files with pyarrow and rewrites one
merged file through our writer. Big files are never touched or read —
the verbatim-copy fast path. Merged files inherit the sources'
compression codec and declared sort order (re-sorting the concatenated
rows) unless overridden.

Crash safety (commit protocol):
  1. executors write merged output to `<name>.pending` — invisible to
     `*.parquet` globs — and never delete anything;
  2. the driver swaps in the rewritten manifest (old manifest retained
     as `_export_manifest_old` until the swap lands);
  3. the driver renames every pending file to its final name;
  4. a reconcile sweep deletes .parquet files the manifest no longer
     lists (the merged-away sources — and any orphans).
A crash before (2) leaves the directory untouched (pendings are
garbage-collected on the next run); a crash between (2) and (4) leaves
sources visible and merged files pending — readers still see exactly
one copy of every row — and the next run finishes the commit.

Manifest bookkeeping: merged-away files' rows become TOMBSTONES
(file_bytes = -1, file → the compacted file) so every (repo, bucket)
key stays recorded — export resume keys survive any number of
compaction rounds. Compacted file names take their part number above
the live manifest maximum, so repeated compactions never collide."""

from __future__ import annotations

import os
import shutil
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F

from parquet_go_spark.interop.export import (
    _SUMMARY_ARROW, _SUMMARY_SCHEMA, _file_name, _reconcile_dir, _to_specs,
)
from parquet_go_spark.interop import pqbloom
from parquet_go_spark.interop.pqwriter import write_table
from parquet_go_spark.plans import pipeline as _pipeline

_ARROW_TO_SPARK = {
    "string": "string", "large_string": "string", "binary": "binary",
    "int64": "bigint", "int32": "int", "double": "double",
    "float": "float", "bool": "boolean",
    "timestamp[us, tz=UTC]": "timestamp", "timestamp[us]": "timestamp",
    "date32[day]": "date",
}

_PQ_CODEC = {"UNCOMPRESSED": None, "SNAPPY": "snappy", "GZIP": "gzip",
             "ZSTD": "zstd", "BROTLI": "brotli"}

INHERIT = "__inherit__"


def _merge_fn(out_dir: str, columns, compression, page_rows: int):
    # file-footer SortingColumn indexes address LEAF chunks; a MAP
    # column contributes two leaves and a STRUCT one per field, so map
    # them back to top-level column positions for Arrow sorting and
    # for write_table
    leaf_to_top = []
    for j, (_, t) in enumerate(columns):
        if t.startswith("map<"):
            leaf_to_top += [j, j]
        else:
            sf = _pipeline._struct_fields(t)
            leaf_to_top += [j] * (len(sf) if sf else 1)

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        rows = []
        for batch in batches:
            for job in batch.to_pylist():
                files = job["files"].split("\n")
                paths = [os.path.join(out_dir, f) for f in files]
                # inherit the sources' codec + declared sort order
                md = pq.ParquetFile(paths[0]).metadata
                comp = compression
                if comp == INHERIT:
                    comp = _PQ_CODEC.get(
                        md.row_group(0).column(0).compression)
                sorting = [leaf_to_top[s.column_index]
                           for s in (md.row_group(0).sorting_columns or [])]
                # inherit bloom-filtered columns too (footer-only scan)
                bloom_cols = pqbloom.bloom_column_names(paths[0]) or None
                # promote: source files may disagree on nullability (a
                # file whose slice had no nulls declares the column —
                # or a MAP's value leaf — required)
                tbl = pa.concat_tables([pq.read_table(p) for p in paths],
                                       promote_options="default")
                if sorting:
                    names = [columns[i][0] for i in sorting]
                    tbl = tbl.take(pc.sort_indices(
                        tbl, sort_keys=[(n, "ascending") for n in names]))
                name = _file_name(job["repo"], job["bucket"], job["part"])
                pending = os.path.join(out_dir, name) + ".pending"
                info = write_table(pending, _to_specs(tbl, columns),
                                   compression=comp, page_rows=page_rows,
                                   sorting_columns=sorting or None,
                                   bloom_columns=bloom_cols)
                rows.append({
                    "file": name, "repo": job["repo"],
                    "bucket": job["bucket"], "part": job["part"],
                    "n_rows": info["n_rows"],
                    "file_bytes": info["file_bytes"],
                })
        if rows:
            yield pa.RecordBatch.from_pylist(rows, schema=_SUMMARY_ARROW)

    return fn


def _recover(spark: SparkSession, out_dir: str, mpath: str) -> None:
    """Finish or garbage-collect a previous run's interrupted commit."""
    old = mpath + "_old"
    if not os.path.isdir(mpath) and os.path.isdir(old):
        os.rename(old, mpath)  # manifest swap died mid-way — roll back
    elif os.path.isdir(old):
        shutil.rmtree(old, ignore_errors=True)
    pendings = [f for f in os.listdir(out_dir) if f.endswith(".pending")]
    if not pendings:
        return
    listed = {
        r.file for r in
        spark.read.parquet(mpath).where(F.col("file_bytes") > 0)
        .select("file").collect()
    }
    for p in pendings:
        final = p[: -len(".pending")]
        path = os.path.join(out_dir, p)
        if final in listed:  # manifest swap landed: finish the commit
            os.replace(path, os.path.join(out_dir, final))
        else:  # swap never landed: the pending file is garbage
            os.remove(path)
    _reconcile_dir(spark, out_dir, mpath)


def compact_export(
    spark: SparkSession,
    out_dir: str,
    *,
    small_bytes: int = 4 << 20,
    target_bytes: int = 64 << 20,
    compression: str | None = INHERIT,
    page_rows: int = 65536,
) -> DataFrame:
    """Fold exported files smaller than `small_bytes` into merged files
    of ~`target_bytes` (an export dir has one schema). Returns the
    summary of compacted files written. compression defaults to
    inheriting each job's source codec."""
    mpath = os.path.join(out_dir, "_export_manifest")
    _recover(spark, out_dir, mpath)
    manifest = spark.read.parquet(mpath)
    rows = [r.asDict() for r in manifest.collect()]
    # tombstones (file_bytes <= 0) are resume keys, never merge inputs
    small = [r for r in rows if 0 < r["file_bytes"] < small_bytes]
    if len(small) < 2:
        return spark.createDataFrame([], _SUMMARY_SCHEMA)

    # metadata-scale bin-packing on the driver, ACROSS repo boundaries:
    # at tiny-repo scale (10^8 one-file repos) per-repo compaction would
    # fold nothing — the row-level repo column keeps per-row lineage, a
    # merged file is just a container. Repo-sorted packing keeps each
    # repo's rows in as few files as possible. Resume keys survive in
    # the merged-away rows' tombstones, so the merged file's own
    # (repo, bucket, part) only needs to be unique: parts number above
    # the manifest maximum so repeated rounds never reuse a name.
    next_part = {}
    for r in rows:
        next_part[r["repo"]] = max(next_part.get(r["repo"], 0),
                                   int(r["part"]) + 1)
    small.sort(key=lambda r: (r["repo"], r["bucket"], r["part"]))
    jobs = []
    cur, cur_bytes = [], 0

    def close():
        nonlocal cur, cur_bytes
        if len(cur) >= 2:
            repo = cur[0]["repo"]
            part = next_part[repo]
            next_part[repo] = part + 1
            jobs.append({
                "repo": repo,
                "bucket": int(cur[0]["bucket"]),
                "part": part,
                "files": "\n".join(r["file"] for r in cur),
            })
        cur, cur_bytes = [], 0

    for r in small:
        if cur and cur_bytes >= target_bytes:
            close()
        cur.append(r)
        cur_bytes += r["file_bytes"]
    close()
    if not jobs:
        return spark.createDataFrame([], _SUMMARY_SCHEMA)

    import pyarrow.parquet as pq

    sample = pq.read_schema(os.path.join(out_dir, small[0]["file"]))

    def to_spark(t):
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return f"array<{to_spark(t.value_type)}>"
        if pa.types.is_map(t):
            return f"map<{to_spark(t.key_type)},{to_spark(t.item_type)}>"
        if pa.types.is_struct(t):
            inner = ",".join(f"{f.name}:{to_spark(f.type)}" for f in t)
            return f"struct<{inner}>"
        if pa.types.is_decimal(t):
            return f"decimal({t.precision},{t.scale})"
        return _ARROW_TO_SPARK[str(t)]

    columns = [(f.name, to_spark(f.type)) for f in sample]

    jobs_df = spark.createDataFrame(
        [(j["repo"], j["bucket"], j["part"], j["files"]) for j in jobs],
        "repo string, bucket long, part long, files string",
    ).repartition(min(len(jobs), spark.sparkContext.defaultParallelism))
    fn = _merge_fn(out_dir, columns, compression, page_rows)
    summary = jobs_df.mapInArrow(fn, _SUMMARY_SCHEMA).cache()
    summary.count()  # all pending files written; nothing deleted yet

    # manifest rewrite: merged rows → tombstones pointing at their
    # compacted file (resume keys preserved), plus the new file rows
    merged_to = {}
    for j in jobs:
        name = _file_name(j["repo"], j["bucket"], j["part"])
        for f in j["files"].split("\n"):
            merged_to[f] = name
    mapping = spark.createDataFrame(
        list(merged_to.items()), "file string, new_file string")
    rewritten = (
        manifest.join(F.broadcast(mapping), on="file", how="left")
        .withColumn("file", F.coalesce("new_file", "file"))
        .withColumn(
            "file_bytes",
            F.when(F.col("new_file").isNotNull(), F.lit(-1))
            .otherwise(F.col("file_bytes")))
        .withColumn(
            "n_rows",
            F.when(F.col("new_file").isNotNull(), F.lit(0))
            .otherwise(F.col("n_rows")))
        .drop("new_file")
        .unionByName(summary)
    )
    tmp_m = mpath + "_tmp"
    rewritten.write.mode("overwrite").parquet(tmp_m)
    old_m = mpath + "_old"
    os.rename(mpath, old_m)
    os.rename(tmp_m, mpath)
    shutil.rmtree(old_m, ignore_errors=True)

    # commit: make merged files visible, then sweep the merged-away
    # sources (any file the new manifest doesn't list)
    for j in jobs:
        name = _file_name(j["repo"], j["bucket"], j["part"])
        path = os.path.join(out_dir, name)
        os.replace(path + ".pending", path)
    _reconcile_dir(spark, out_dir, mpath)
    return summary
