"""Per-chunk codec auto-selector.

Generalizes the reference's static-with-one-dynamic-rule selection
(/root/reference/node.go:542-562 defaults, writer.go:2049-2077
dictionary-size fallback) into a measured, deterministic decision:

  1. compute cheap per-chunk stats (NDV on a sample, run count,
     sortedness, bit-width, sample byte entropy, prefix affinity)
  2. shortlist candidate codecs per kind using those stats — this
     mirrors the reference's canEncode matrix (encoding.go:136-160)
     plus its defaults (BYTE_ARRAY → DELTA_LENGTH, else PLAIN)
  3. trial-encode the shortlist and keep the smallest blob

The decision is a pure function of the chunk bytes (sampling is
positional, not random), so re-running a partition reproduces the
identical blob — required for idempotent manifest resume.
"""

from __future__ import annotations

import numpy as np

from . import chunk as chunklib
from . import delta, fsst, registry, rle
from .bitpack import bit_length_u64
from .bytearrays import ByteArrays
from .kinds import Codec, Kind

DICT_MAX_BYTES = 1 << 20  # per-chunk dictionary cap (DictionaryMaxBytes analog)
DICT_NDV_RATIO = 0.5  # dictionary viable when sample NDV/n below this
SAMPLE = 4096  # stat sample size (positional prefix — deterministic)
FSST_MIN_BYTES = 1 << 10  # below this, table overhead dominates


def column_stats(values, kind: int) -> dict:
    """Cheap deterministic stats driving the shortlist."""
    n = len(values)
    st: dict = {"n": n, "kind": kind}
    if n == 0:
        st.update(ndv_ratio=0.0, runs=0, sorted=True, raw_bytes=0)
        return st
    if kind == Kind.BYTE_ARRAY:
        st["raw_bytes"] = int(values.offsets[-1])
        lens = values.lengths
        take = min(n, SAMPLE)
        # sample NDV via first-take distinct (arrow dictionary on slice)
        sl = ByteArrays(
            values.data[: values.offsets[take]], values.offsets[: take + 1]
        )
        arr = sl.to_arrow()
        st["ndv_ratio"] = len(arr.unique()) / take
        st["avg_len"] = float(lens.mean())
        # prefix affinity: mean shared prefix between neighbors on sample
        pref = delta._prefix_lengths(sl)
        st["avg_prefix"] = float(pref[1:].mean()) if take > 1 else 0.0
        return st
    a = np.asarray(values).reshape(len(values), -1) if kind == Kind.FIXED_LEN_BYTE_ARRAY else np.asarray(values)
    if kind == Kind.FIXED_LEN_BYTE_ARRAY:
        st["raw_bytes"] = a.size
        take = min(n, SAMPLE)
        st["ndv_ratio"] = len(np.unique(a[:take], axis=0)) / take
        return st
    st["raw_bytes"] = a.nbytes
    take = min(n, SAMPLE)
    s = a[:take]
    st["ndv_ratio"] = len(np.unique(s)) / take
    if kind in (Kind.INT32, Kind.INT64):
        st["sorted"] = bool(np.all(s[1:] >= s[:-1])) if take > 1 else True
        st["runs"] = rle.run_count(s)
        st["min"] = int(a.min())
        st["max_bits"] = (
            int(bit_length_u64(a.astype(np.uint64)).max()) if st["min"] >= 0 else 64
        )
    elif kind == Kind.BOOLEAN:
        st["runs"] = rle.run_count(s)
    return st


def shortlist(stats: dict) -> list[tuple[int, bool]]:
    """Candidate (codec, dict_wrap) list per kind — the canEncode analog.
    Registered custom codecs (registry.py, the RegisterEncoding analog)
    that opted into selection compete alongside the built-ins."""
    base = _builtin_shortlist(stats)
    base.extend((cid, False) for cid in registry.selectable_for(stats))
    return base


def _builtin_shortlist(stats: dict) -> list[tuple[int, bool]]:
    kind = stats["kind"]
    ndv = stats.get("ndv_ratio", 1.0)
    cands: list[tuple[int, bool]] = []
    if kind == Kind.BOOLEAN:
        return [(Codec.PLAIN, False), (Codec.RLE, False)]
    if kind in (Kind.INT32, Kind.INT64):
        cands.append((Codec.DELTA_BINARY_PACKED, False))
        cands.append((Codec.PLAIN, False))
        if stats.get("min", -1) >= 0 and stats.get("max_bits", 64) <= 32:
            cands.append((Codec.RLE, False))
        if ndv < DICT_NDV_RATIO:
            cands.append((Codec.DELTA_BINARY_PACKED, True))
        return cands
    if kind in (Kind.FLOAT, Kind.DOUBLE):
        cands.append((Codec.PLAIN, False))
        cands.append((Codec.BYTE_STREAM_SPLIT, False))
        if ndv < DICT_NDV_RATIO:
            cands.append((Codec.PLAIN, True))
        return cands
    if kind == Kind.FIXED_LEN_BYTE_ARRAY:
        cands.append((Codec.PLAIN, False))
        cands.append((Codec.BYTE_STREAM_SPLIT, False))
        if ndv < DICT_NDV_RATIO:
            cands.append((Codec.PLAIN, True))
        return cands
    # BYTE_ARRAY: DELTA_LENGTH is the reference default ("always
    # preferred to PLAIN", node.go:542-562)
    cands.append((Codec.DELTA_LENGTH_BYTE_ARRAY, False))
    if stats.get("avg_prefix", 0.0) >= 2.0:
        cands.append((Codec.DELTA_BYTE_ARRAY, False))
    if ndv < DICT_NDV_RATIO:
        # the dict page itself is small → encode uniques with DELTA_LENGTH;
        # viability gated by the DictionaryMaxBytes analog
        est_dict_bytes = stats["raw_bytes"] * ndv
        if est_dict_bytes <= DICT_MAX_BYTES:
            cands.append((Codec.DELTA_LENGTH_BYTE_ARRAY, True))
    if stats["raw_bytes"] >= FSST_MIN_BYTES and ndv > 0.01:
        cands.append((Codec.FSST, False))
    return cands


TRIAL_BYTES = 256 << 10  # big chunks: trial-encode a positional sample
TRIAL_MIN_ROWS = 256
FSST_RETRAIN_FACTOR = 1.25  # reused-table drift bound: retrain when the
# trial ratio degrades beyond this vs the ratio at training time


def _fsst_trial(trial_values, kind, flba_size, compression, sampled, cap,
                fsst_state):
    """Trial-encode FSST, reusing a cached symbol table when the caller
    scoped one (training amortization) and retraining on distribution
    drift: if the reused table's trial ratio is worse than
    FSST_RETRAIN_FACTOR × the ratio recorded when it was trained, the
    content distribution has shifted and a fresh table is built — so
    reuse can cost at most the drift bound, never a missed fresh-FSST
    win on shifted data."""
    raw = max(int(trial_values.offsets[-1]), 1)
    table = fsst_state.get("table") if fsst_state is not None else None
    fresh = table is None
    if fresh:
        table = fsst.train(trial_values.data[:raw])
    blob = chunklib.encode_chunk(
        trial_values, kind, Codec.FSST, flba_size=flba_size,
        compression=compression, capture=None if sampled else cap,
        fsst_table=table,
    )
    if not fresh and (
        len(blob) / raw
        > FSST_RETRAIN_FACTOR * fsst_state.get("ratio", float("inf"))
    ):
        table = fsst.train(trial_values.data[:raw])
        blob = chunklib.encode_chunk(
            trial_values, kind, Codec.FSST, flba_size=flba_size,
            compression=compression, capture=None if sampled else cap,
            fsst_table=table,
        )
        fresh = True
    if fresh and fsst_state is not None:
        fsst_state["table"] = table
        fsst_state["ratio"] = len(blob) / raw
    return blob, table


def _trial_slice(values, kind: int):
    """Positional prefix of ~TRIAL_BYTES (deterministic — no RNG)."""
    n = len(values)
    if kind == Kind.BYTE_ARRAY:
        take = int(np.searchsorted(values.offsets, TRIAL_BYTES))
        take = max(min(take, n), min(TRIAL_MIN_ROWS, n))
        return ByteArrays(
            values.data[: values.offsets[take]], values.offsets[: take + 1]
        )
    a = np.asarray(values)
    width = a.itemsize if a.ndim == 1 else a.shape[1]
    take = max(min(TRIAL_BYTES // max(width, 1), n), min(TRIAL_MIN_ROWS, n))
    return a[:take]


def select_and_encode(
    values, kind: int, *, flba_size: int | None = None, zstd: bool = False,
    compression: str | None = None,
    validity: np.ndarray | None = None,
    fsst_state: dict | None = None,
) -> tuple[bytes, dict]:
    """Trial-encode the shortlist; return (smallest blob, info).

    Chunks larger than 4×TRIAL_BYTES are not fully encoded once per
    candidate: the shortlist competes on a deterministic positional
    sample, and only the winner encodes the full chunk (the measured
    analog of parquet-go's static defaults + dynamic dictionary
    fallback, writer.go:2049-2077).

    fsst_state: optional mutable dict scoped by the caller to one
    (repo, column, stream). The first chunk trains an FSST symbol
    table (on the trial slice) and stores it under "table"; later
    chunks reuse it for both the trial and the full encode, amortizing
    the ~GENERATIONS×parse training cost across a column's chunks —
    the batch-level analog of parquet-go training its dictionary once
    per row group (writer.go:2049-2077) rather than per page. With
    reuse active the FSST candidate's size (and thus the codec choice)
    depends on task-local history, not on the chunk bytes alone; this
    is safe because blobs stay self-describing (the table is embedded
    in every blob) and resume/replay dedupe on chunk ids, never on
    blob identity. The selector still guards ratio: a stale table that
    compresses poorly simply loses the trial to DELTA_LENGTH/dict."""
    if compression is None and zstd:
        compression = "zstd"
    stats = column_stats(values, kind)
    # nulls: candidates compete on the null-stripped values (the validity
    # bitmap costs the same under every codec); the winner re-encodes
    # with the validity prefix attached
    sampled = stats["raw_bytes"] > 4 * TRIAL_BYTES or validity is not None
    trial_values = _trial_slice(values, kind) if sampled else values
    best_blob = None
    best = None
    capture: dict = {}
    trials = {}
    fsst_table = None
    for codec, dict_wrap in shortlist(stats):
        cap: dict = {}
        try:
            if codec == Codec.FSST and not dict_wrap:
                blob, fsst_table = _fsst_trial(
                    trial_values, kind, flba_size, compression,
                    sampled, cap, fsst_state,
                )
            else:
                blob = chunklib.encode_chunk(
                    trial_values, kind, codec,
                    dict_wrap=dict_wrap, flba_size=flba_size,
                    compression=compression,
                    capture=None if sampled else cap,
                )
        except Exception:
            continue
        key = (len(blob), codec, dict_wrap)  # deterministic tie-break
        trials[f"{codec}{'+dict' if dict_wrap else ''}"] = len(blob)
        if best is None or key < best:
            best = key
            best_blob = blob
            capture = cap
    if best is None:  # fall back to PLAIN, which supports every kind
        best_blob = chunklib.encode_chunk(
            values, kind, Codec.PLAIN, flba_size=flba_size,
            compression=compression, validity=validity,
        )
        best = (len(best_blob), Codec.PLAIN, False)
    elif sampled:  # encode the full chunk with the winning codec only;
        # capture the full-chunk uniques so callers can build bloom
        # filters from the dictionary for free (writer.go:2089-2095)
        capture = {}
        best_blob = chunklib.encode_chunk(
            values, kind, best[1],
            dict_wrap=best[2], flba_size=flba_size,
            compression=compression,
            validity=validity, capture=capture,
            fsst_table=fsst_table if best[1] == Codec.FSST else None,
        )
        best = (len(best_blob), best[1], best[2])
    info = {
        "codec": best[1],
        "dict": best[2],
        "enc_bytes": best[0],
        "raw_bytes": stats["raw_bytes"],
        "n": stats["n"],
        "trials": trials,
        "sampled": sampled,
        "uniques": capture.get("uniques"),
    }
    return best_blob, info
