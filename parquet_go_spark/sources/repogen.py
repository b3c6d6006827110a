"""Deterministic synthetic source-code repository table.

Generates the north-star input `(repo, path, commit, lang, content)`
(BASELINE.json input_hint) as a pure function of the global row id —
fully vectorized inside mapInArrow, independent of partitioning, so the
same (n_rows, seed) always produces the identical table. No external
data.

Shape choices follow FIXTURES.md F1:
  repo    Zipf-skewed over R repos (a few giants — exercises salting)
  path    hierarchical with shared directory prefixes (DELTA_BYTE_ARRAY)
  commit  40-char hex of a row hash (high entropy — defeats dictionary)
  lang    ~25 categorical values, skewed per repo (RLE_DICTIONARY bait)
  content synthetic source code assembled from a fixed 256-line pool by
          row-hash indexed gather (FSST/dictionary bait), length
          varying ~100B-4KB
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from parquet_go_spark.codecs.bytearrays import ByteArrays
from parquet_go_spark.codecs.dictionary import lookup_byte_array

LANGS = [
    "python", "go", "rust", "java", "javascript", "typescript", "c", "cpp",
    "ruby", "php", "swift", "kotlin", "scala", "shell", "html", "css",
    "sql", "yaml", "json", "markdown", "perl", "lua", "haskell", "r", "julia",
]
EXTS = ["py", "go", "rs", "java", "js", "ts", "c", "cc", "rb", "php",
        "swift", "kt", "scala", "sh", "html", "css", "sql", "yaml", "json",
        "md", "pl", "lua", "hs", "r", "jl"]

_K1 = np.uint64(0x9E3779B97F4A7C15)
_K2 = np.uint64(0xBF58476D1CE4E5B9)
_K3 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — the per-row deterministic hash."""
    x = (x + _K1).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * _K2
    x = (x ^ (x >> np.uint64(27))) * _K3
    return x ^ (x >> np.uint64(31))


_MASK64 = (1 << 64) - 1


def _h(ids: np.ndarray, salt: int) -> np.ndarray:
    s = np.uint64((salt * int(_K3)) & _MASK64)
    return _mix(ids.astype(np.uint64) ^ s)


import functools


@functools.lru_cache(maxsize=4)
def _line_pool(seed: int) -> ByteArrays:
    """Fixed pool of 256 code-like lines (seeded, deterministic)."""
    rng = np.random.default_rng(seed)
    kw = ["def ", "return ", "import ", "for ", "while ", "if ", "else:",
          "class ", "self.", "print(", " = ", " == ", "lambda ", "yield ",
          "try:", "except ", "with open(", "range(", "len(", "append("]
    idents = [f"var_{i}" for i in range(40)] + ["result", "data", "value",
                                                "items", "count", "index"]
    lines = []
    for _ in range(256):
        parts = rng.choice(kw, 3).tolist() + rng.choice(idents, 2).tolist()
        rng.shuffle(parts)
        lines.append(("    " * int(rng.integers(0, 3)) + "".join(parts) + "\n").encode())
    return ByteArrays.from_pylist(lines)


def generate_batch(ids: np.ndarray, seed: int = 42, n_repos: int = 200,
                   n_orgs: int = 20) -> pa.RecordBatch:
    """Generate rows for the given global ids — pure function of (ids, seed)."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    u = ids.astype(np.uint64) ^ np.uint64((seed * int(_K1)) & _MASK64)

    # Zipf-skewed repo assignment: u01^3 concentrates mass near repo 0
    u01 = (_h(u, 1) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    repo_idx = np.minimum((u01**3 * n_repos).astype(np.int64), n_repos - 1)
    org_idx = (_mix(repo_idx.astype(np.uint64) + np.uint64(seed)) % np.uint64(n_orgs)).astype(np.int64)
    repos = np.char.add(
        np.char.add(np.char.add("org", org_idx.astype("U")), "/repo"),
        repo_idx.astype("U"),
    )

    # lang: 80% the repo's primary language, else a hash-picked one
    prim = (_mix(repo_idx.astype(np.uint64)) % np.uint64(len(LANGS))).astype(np.int64)
    alt = (_h(u, 2) % np.uint64(len(LANGS))).astype(np.int64)
    use_prim = (_h(u, 3) % np.uint64(10)) < np.uint64(8)
    lang_idx = np.where(use_prim, prim, alt)
    langs = np.array(LANGS)[lang_idx]
    exts = np.array(EXTS)[lang_idx]

    # path: shared hierarchical prefixes
    d1 = (_h(u, 4) % np.uint64(8)).astype(np.int64)
    d2 = (_h(u, 5) % np.uint64(24)).astype(np.int64)
    fid = (_h(u, 6) % np.uint64(5000)).astype(np.int64)
    paths = np.char.add(
        np.char.add(
            np.char.add(
                np.char.add(np.char.add("src/module", d1.astype("U")), "/pkg"),
                d2.astype("U"),
            ),
            np.char.add("/file_", fid.astype("U")),
        ),
        np.char.add(".", exts),
    )

    # commit: 40 hex chars from 2.5 64-bit hashes — vectorized nibble expand
    hexd = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
    raw = np.empty((n, 20), dtype=np.uint8)
    raw[:, :8] = _h(u, 7).astype(">u8").view(np.uint8).reshape(n, 8)
    raw[:, 8:16] = _h(u, 8).astype(">u8").view(np.uint8).reshape(n, 8)
    raw[:, 16:20] = (_h(u, 9) & np.uint64(0xFFFFFFFF)).astype(">u4").view(np.uint8).reshape(n, 4)
    nib = np.empty((n, 40), dtype=np.uint8)
    nib[:, 0::2] = raw >> 4
    nib[:, 1::2] = raw & 15
    commit_bytes = hexd[nib].reshape(-1)
    commits = ByteArrays(
        commit_bytes, np.arange(n + 1, dtype=np.int64) * 40
    )

    # content: per-row line count (skewed), lines gathered from the pool
    pool = _line_pool(seed)
    lc01 = (_h(u, 10) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    n_lines = (3 + (lc01**2) * 120).astype(np.int64)  # 3..123 lines
    total_lines = int(n_lines.sum())
    row_of_line = np.repeat(np.arange(n, dtype=np.int64), n_lines)
    csum = np.cumsum(n_lines) - n_lines
    j = np.arange(total_lines, dtype=np.int64) - np.repeat(csum, n_lines)
    line_hash = _mix(u[row_of_line] + j.astype(np.uint64) * _K2)
    line_idx = (line_hash % np.uint64(256)).astype(np.int32)
    flat = lookup_byte_array(pool, line_idx)  # all lines of all rows, in order
    # fold line boundaries into row boundaries
    line_lens = flat.lengths
    row_bytes = np.bincount(row_of_line, weights=line_lens, minlength=n).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(row_bytes)
    content = ByteArrays(flat.data, offsets)

    return pa.RecordBatch.from_arrays(
        [
            pa.array(repos, pa.string()),
            pa.array(paths, pa.string()),
            commits.to_arrow(pa.string()),
            pa.array(langs, pa.string()),
            content.to_arrow(pa.string()),
        ],
        names=["repo", "path", "commit", "lang", "content"],
    )


def repos_table(spark, n_rows: int, seed: int = 42, n_repos: int = 200,
                partitions: int | None = None):
    """Distributed generation: spark.range → mapInArrow(generate_batch)."""
    import pyspark.sql.functions as F  # noqa: N812

    rng = spark.range(0, n_rows, 1, numPartitions=partitions or spark.sparkContext.defaultParallelism)

    schema = "repo string, path string, commit string, lang string, content string"

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            yield generate_batch(ids, seed=seed, n_repos=n_repos)

    return rng.mapInArrow(gen, schema)
