"""Round-5 additions.

- Bounded-driver compaction planning (VERDICT r4 "what's wrong" #2):
  _plan_jobs must never collect() the manifest, and its greedy bin
  semantics must be identical to the round-4 driver-side planner.
"""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import DataFrame

from parquet_go_spark.interop import compact


def _synth_manifest(spark, n_rows: int, seed: int = 11):
    """Synthetic export manifest: many tiny repos plus a few multi-part
    ones, sizes spanning small/large, with tombstones sprinkled in."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        repo = f"org{i % 977}/repo{i % 9973}"
        bucket = i % 4
        part = i // 9973
        kind = rng.random()
        if kind < 0.05:
            size = -1  # tombstone (resume key)
        elif kind < 0.85:
            size = rng.randint(1, 100_000)  # small
        else:
            size = rng.randint(5_000_000, 50_000_000)  # big, untouched
        rows.append((f"f{i}.parquet", repo, bucket, part,
                     max(size, 0) // 100, size))
    return spark.createDataFrame(
        rows,
        "file string, repo string, bucket long, part long, "
        "n_rows long, file_bytes long",
    )


def _reference_greedy(rows, small_bytes, target_bytes):
    """The round-4 collect()-based planner, verbatim semantics, as the
    equivalence oracle for the streaming planner."""
    small = [r for r in rows if 0 < r["file_bytes"] < small_bytes]
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
            jobs.append((repo, int(cur[0]["bucket"]), part,
                         "\n".join(r["file"] for r in cur)))
        cur, cur_bytes = [], 0

    for r in small:
        if cur and cur_bytes >= target_bytes:
            close()
        cur.append(r)
        cur_bytes += r["file_bytes"]
    close()
    return sorted(jobs)


@pytest.mark.parametrize("n_rows", [100_000])
def test_plan_jobs_bounded_driver_and_greedy_identical(
    spark, monkeypatch, n_rows
):
    """Plan a 100k-row manifest with DataFrame.collect FORBIDDEN (the
    round-4 planner collect()ed every row — a driver OOM at the module's
    advertised 10^8-file regime) and assert the planned jobs are
    IDENTICAL to the reference driver-side greedy."""
    manifest = _synth_manifest(spark, n_rows)
    ref_rows = [r.asDict() for r in manifest.collect()]  # oracle only

    small_bytes, target_bytes = 200_000, 400_000
    want = _reference_greedy(ref_rows, small_bytes, target_bytes)
    assert len(want) > 1000, "fixture must produce a real job load"

    real_collect = DataFrame.collect

    def forbidden(self, *a, **kw):
        raise AssertionError(
            "compaction planning must not collect() a DataFrame")

    monkeypatch.setattr(DataFrame, "collect", forbidden)
    try:
        with tempfile.TemporaryDirectory() as spill:
            jobs_df, n_jobs, sample = compact._plan_jobs(
                spark, manifest, small_bytes, target_bytes, spill)
            assert jobs_df is not None and sample is not None
            monkeypatch.setattr(DataFrame, "collect", real_collect)
            got = sorted(
                (r.repo, int(r.bucket), int(r.part), r.files)
                for r in jobs_df.collect()
            )
    finally:
        monkeypatch.setattr(DataFrame, "collect", real_collect)

    assert n_jobs == len(want)
    assert got == want


def test_plan_jobs_no_jobs_when_nothing_small(spark):
    manifest = spark.createDataFrame(
        [("a.parquet", "r", 0, 0, 10, 9_000_000),
         ("b.parquet", "r", 0, 1, 10, 9_000_000)],
        "file string, repo string, bucket long, part long, "
        "n_rows long, file_bytes long",
    )
    with tempfile.TemporaryDirectory() as spill:
        jobs_df, n_jobs, _ = compact._plan_jobs(
            spark, manifest, 1_000_000, 4_000_000, spill)
    assert jobs_df is None and n_jobs == 0
