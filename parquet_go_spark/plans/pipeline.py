"""The distributed encode/decode/verify pipeline.

Spark-first equivalent of the reference's write path (writer.go:97-163,
/root/reference/writer.go:2365-2500) and read path (file.go:65-130,
reader.go:31-71), restructured around Spark's execution model
(SURVEY.md §3.1-3.2):

  encode:  input DataFrame
           → per-repo size agg (small, broadcast back)            [stats]
           → salt: bucket = xxhash64(path, commit) % n_buckets    [skew]
           → groupBy(repo, bucket).applyInPandas(encode_chunk)    [kernel]
           → parquet blobs table + manifest (same files; manifest
             reads prune the blob column for free — columnar)
  decode:  blobs → groupBy(chunk_id).applyInPandas(decode_chunk)
  verify:  decode → sha2(content) per row vs source               [oracle]
  resume:  recompute chunk keys → broadcast left-anti join against
           completed manifest chunk ids → encode only the gap
           (the dataflow analog of writer_copy.go:22-36's
           "never redo finished work")

Skew: n_buckets is per-repo ceil(bytes / target_chunk_bytes), so one
giant repo becomes many bounded chunks while small repos stay single-
chunk — per-chunk dictionaries remain meaningful (SURVEY.md §7.4.6).
All per-value work happens in vectorized numpy inside applyInPandas;
Spark handles shuffle, spill, and retries.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, BooleanType, DateType, DoubleType, FloatType,
    IntegerType, LongType, StringType, StructField, StructType,
    TimestampNTZType, TimestampType,
)

from parquet_go_spark.codecs import bloom as bloomlib
from parquet_go_spark.codecs import chunk as chunklib
from parquet_go_spark.codecs import selector
from parquet_go_spark.codecs.bytearrays import ByteArrays
from parquet_go_spark.codecs.kinds import Kind

TARGET_CHUNK_BYTES = 8 << 20  # soft upper bound per chunk (all columns):
# small enough that one chunk is a ~2 s task even through the FSST path
# (Python-kernel bound), big enough for meaningful per-chunk dictionaries

# Column-index truncation limit for byte-array min/max stats — the
# DefaultColumnIndexSizeLimit analog (/root/reference/config.go:27,
# column_index.go:499-533).
STAT_TRUNCATE = 16

MANIFEST_COLUMNS = [
    "chunk_id", "repo", "bucket", "column", "stream", "n_rows", "kind",
    "codec", "dict", "zstd", "spark_type", "raw_bytes", "enc_bytes",
    "sha256", "min_val", "max_val", "null_count", "def_hist", "rep_hist",
    "bloom",
]

BLOB_SCHEMA = StructType(
    [
        StructField("chunk_id", StringType(), False),
        StructField("repo", StringType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("column", StringType(), False),
        StructField("stream", StringType(), False),
        StructField("n_rows", LongType(), False),
        StructField("kind", IntegerType(), False),
        StructField("codec", IntegerType(), False),
        StructField("dict", BooleanType(), False),
        StructField("zstd", BooleanType(), False),
        StructField("spark_type", StringType(), False),
        StructField("raw_bytes", LongType(), False),
        StructField("enc_bytes", LongType(), False),
        StructField("sha256", StringType(), False),
        StructField("min_val", StringType(), True),
        StructField("max_val", StringType(), True),
        StructField("null_count", LongType(), False),
        StructField("def_hist", ArrayType(LongType()), True),
        StructField("rep_hist", ArrayType(LongType()), True),
        StructField("bloom", BinaryType(), True),
        StructField("blob", BinaryType(), False),
    ]
)

_KIND_BY_SPARK = {
    "string": Kind.BYTE_ARRAY,
    "binary": Kind.BYTE_ARRAY,
    "bigint": Kind.INT64,
    "int": Kind.INT32,
    "double": Kind.DOUBLE,
    "float": Kind.FLOAT,
    "boolean": Kind.BOOLEAN,
    "timestamp": Kind.INT64,  # encoded as unix micros
    "timestamp_ntz": Kind.INT64,
    "date": Kind.INT32,  # days since epoch
}

# Per-element width of scalar list columns, used only by the planning
# size estimate (_row_size_expr). Lists shred as lengths + flattened
# element streams via the recursive _shred_column walk (the reference's
# LIST node, node.go:505-525).
_LIST_ELEM_WIDTH = {
    "array<float>": 4,
    "array<int>": 4,
    "array<double>": 8,
    "array<bigint>": 8,
}


def _list_elem(spark_type: str) -> str | None:
    """Parse 'array<T>' → element type string T (arbitrary T), else
    None — the generic LIST node (node.go:505-525)."""
    if spark_type.startswith("array<") and spark_type.endswith(">"):
        return spark_type[len("array<"):-1]
    return None


def _is_container(spark_type: str) -> bool:
    return (spark_type.startswith("array<")
            or spark_type.startswith("struct<")
            or spark_type.startswith("map<"))


def _struct_fields(spark_type: str) -> list[tuple[str, str]] | None:
    """Parse 'struct<a:int,b:string,...>' → [(name, type), ...], else
    None. Splits on depth-0 commas only, so decimal(p,s) and other
    parenthesized field types parse correctly. Field types may nest
    arbitrarily — shredding recurses like the reference
    (schema.go:341-430)."""
    if not spark_type.startswith("struct<") or not spark_type.endswith(">"):
        return None
    inner = spark_type[len("struct<"):-1]
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(inner):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(inner[start:i])
            start = i + 1
    if inner:
        parts.append(inner[start:])
    out = []
    for fld in parts:
        fname, ftype = fld.split(":", 1)
        out.append((fname.strip(), ftype.strip()))
    return out


def _map_kv(spark_type: str) -> tuple[str, str] | None:
    """Parse 'map<K,V>' → (key_type, value_type), else None. A map is
    the reference's MAP node — a repeated key_value group over two leaf
    columns (node.go:528-540, schema.go key_value shredding); here it
    encodes as three streams: entry-count lengths (the repetition-level
    analog shared by both leaves), flattened keys, and flattened values
    with a validity bitmap (keys are required, values nullable — the
    parquet MAP contract)."""
    if not spark_type.startswith("map<") or not spark_type.endswith(">"):
        return None
    inner = spark_type[len("map<"):-1]
    depth = 0
    for i, ch in enumerate(inner):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            return inner[:i], inner[i + 1:]
    raise ValueError(f"malformed map type {spark_type!r}")


def _decimal_info(spark_type: str) -> tuple[int, int] | None:
    """Parse 'decimal(p,s)' → (precision, scale), else None."""
    if not spark_type.startswith("decimal(") or not spark_type.endswith(")"):
        return None
    p, s = spark_type[len("decimal("):-1].split(",")
    return int(p), int(s)


def _unscaled(value, scale: int) -> int | None:
    """Probe literal → the decimal column's UNSCALED integer, or None
    when no exact representation exists (more fractional digits than the
    scale — rounding would compare the WRONG value and mis-prune). Runs
    under a widened decimal context: the default 28-digit precision
    silently rounds decimal(38,*) probes."""
    import decimal
    from decimal import Decimal

    with decimal.localcontext() as ctx:
        ctx.prec = 60
        try:
            scaled = Decimal(str(value)).scaleb(scale)
        except decimal.InvalidOperation:
            return None
        if scaled != scaled.to_integral_value():
            return None
        return int(scaled)


def _decimal_kind(precision: int) -> int:
    """DECIMAL physical mapping by precision — the reference's
    type_decimal.go:18 rule: unscaled INT32 for p≤9, INT64 for p≤18,
    FIXED_LEN_BYTE_ARRAY(16) beyond (the full decimal128 words)."""
    if precision <= 9:
        return Kind.INT32
    if precision <= 18:
        return Kind.INT64
    return Kind.FIXED_LEN_BYTE_ARRAY


def _col_kind(spark_type: str) -> int:
    """Physical kind of a scalar type; containers validate recursively
    (arbitrary nesting, like the reference's recursive schema shredding,
    schema.go:341-430) and return a sentinel — per-leaf kinds are
    resolved during shredding. Map keys must be scalar (the parquet MAP
    key contract, node.go:528-540)."""
    dp = _decimal_info(spark_type)
    if dp is not None:
        return _decimal_kind(dp[0])
    el = _list_elem(spark_type)
    if el is not None:
        _col_kind(el)
        return Kind.BYTE_ARRAY  # sentinel; per-leaf kinds used in encode
    sf = _struct_fields(spark_type)
    if sf is not None:
        for _, ftype in sf:
            _col_kind(ftype)
        return Kind.BYTE_ARRAY
    mk = _map_kv(spark_type)
    if mk is not None:
        ktype, vtype = mk
        if _is_container(ktype):
            raise ValueError(f"map keys must be scalar: {ktype}")
        _col_kind(ktype)
        _col_kind(vtype)
        return Kind.BYTE_ARRAY
    if spark_type not in _KIND_BY_SPARK:
        raise ValueError(f"unsupported column type {spark_type}")
    return _KIND_BY_SPARK[spark_type]


def _decimal_words(arr: pa.Array) -> np.ndarray:
    """decimal128 Arrow array → (n, 2) little-endian int64 words
    (low, high) via a zero-copy buffer view."""
    n = len(arr)
    buf = arr.buffers()[1]
    words = np.frombuffer(buf, dtype="<i8", count=2 * (arr.offset + n))
    return words.reshape(-1, 2)[arr.offset:]


def _decimal_to_values(arr: pa.Array, precision: int):
    """decimal128 → unscaled int32/int64 ndarray, or (n,16) uint8 FLBA."""
    words = _decimal_words(arr)
    if precision <= 9:
        return words[:, 0].astype(np.int32)
    if precision <= 18:
        # a value that fits int64 has its low word == the int64 value
        # (two's-complement truncation is exact within range)
        return np.ascontiguousarray(words[:, 0])
    return np.ascontiguousarray(words).view(np.uint8).reshape(-1, 16)


def _values_to_decimal(values, precision: int, scale: int) -> pa.Array:
    n = len(values)
    if precision <= 18:
        v = np.asarray(values, dtype=np.int64)
        words = np.empty((n, 2), dtype="<i8")
        words[:, 0] = v
        words[:, 1] = v >> 63  # arithmetic shift sign-extends to 0 / -1
        buf = pa.py_buffer(words.tobytes())
    else:
        buf = pa.py_buffer(
            np.ascontiguousarray(values, dtype=np.uint8).tobytes()
        )
    return pa.Array.from_buffers(pa.decimal128(precision, scale), n, [None, buf])


def _series_to_values(s: pd.Series, spark_type: str):
    """pandas column → kernel value container (ByteArrays or ndarray)."""
    if spark_type in ("string", "binary"):
        arr = pa.Array.from_pandas(s, type=pa.binary() if spark_type == "binary" else pa.string())
        return ByteArrays.from_arrow(arr)
    dp = _decimal_info(spark_type)
    if dp is not None:
        arr = pa.Array.from_pandas(s, type=pa.decimal128(*dp))
        return _decimal_to_values(arr, dp[0])
    if spark_type in ("timestamp", "timestamp_ntz"):
        return s.values.astype("datetime64[us]").astype(np.int64)
    if spark_type == "date":
        return s.values.astype("datetime64[D]").astype(np.int32)
    dt = {"bigint": np.int64, "int": np.int32, "double": np.float64,
          "float": np.float32, "boolean": bool}[spark_type]
    return s.to_numpy(dtype=dt)


def _arrow_to_values(arr: pa.Array, spark_type: str):
    """Arrow column → kernel value container, zero per-row boxing."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("null values not supported in encode columns")
    if spark_type in ("string", "binary"):
        return ByteArrays.from_arrow(arr)
    dp = _decimal_info(spark_type)
    if dp is not None:
        return _decimal_to_values(arr, dp[0])
    if spark_type in ("timestamp", "timestamp_ntz"):
        return np.asarray(arr.cast(pa.int64()))  # micros since epoch
    if spark_type == "date":
        return np.asarray(arr.cast(pa.int32()))  # days since epoch
    if spark_type == "boolean":
        return arr.to_numpy(zero_copy_only=False)
    return np.asarray(arr)


def _flba_to_byte_values(values: np.ndarray) -> ByteArrays:
    """(n, w) FLBA rows → variable-length ByteArrays container
    (delegates to the codec layer's offset construction)."""
    return chunklib._flba_to_byte_arrays(values, values.shape[1])


def _values_to_arrow(values, spark_type: str) -> pa.Array:
    """Kernel value container → Arrow column, zero per-row boxing."""
    dp = _decimal_info(spark_type)
    if dp is not None:
        return _values_to_decimal(values, *dp)
    if spark_type == "string":
        return values.to_arrow(pa.string())
    if spark_type == "binary":
        if isinstance(values, np.ndarray):  # FLBA-upgraded uniform chunk
            values = _flba_to_byte_values(values)
        return values.to_arrow(pa.binary())
    if spark_type == "timestamp":
        return pa.array(values, pa.int64()).cast(pa.timestamp("us", tz="UTC"))
    if spark_type == "timestamp_ntz":
        return pa.array(values, pa.int64()).cast(pa.timestamp("us"))
    if spark_type == "date":
        return pa.array(values, pa.int32()).cast(pa.date32())
    return pa.array(values)


def _values_to_series(values, spark_type: str) -> pd.Series:
    dp = _decimal_info(spark_type)
    if dp is not None:
        return _values_to_decimal(values, *dp).to_pandas()
    if spark_type == "string":
        return values.to_arrow(pa.string()).to_pandas()
    if spark_type == "binary":
        if isinstance(values, np.ndarray):  # FLBA-upgraded uniform chunk
            values = _flba_to_byte_values(values)
        return values.to_arrow(pa.binary()).to_pandas()
    if spark_type in ("timestamp", "timestamp_ntz"):
        return pd.Series(values.astype("datetime64[us]"))
    if spark_type == "date":
        return pd.Series(values.astype("datetime64[D]").astype("datetime64[us]")).dt.date
    return pd.Series(values)


def _column_sha256(values, spark_type: str, validity=None) -> str:
    """Deterministic digest of a column chunk (length-framed for strings,
    raw little-endian for fixed kinds) — the manifest lineage field."""
    h = hashlib.sha256()
    if validity is not None:
        h.update(np.packbits(validity).tobytes())
    if spark_type in ("string", "binary"):
        h.update(values.lengths.astype("<i8").tobytes())
        h.update(values.data[: values.offsets[-1]].tobytes())
    else:
        h.update(np.ascontiguousarray(values).tobytes())
    return h.hexdigest()


def _truncate_max(b: bytes) -> str | None:
    """Truncate a byte-array max stat to STAT_TRUNCATE bytes while keeping
    it an upper bound: chop, then increment the last byte with carry
    (the reference's column-index truncation, column_index.go:684-700)."""
    if len(b) <= STAT_TRUNCATE:
        return b.decode("latin-1")
    t = bytearray(b[:STAT_TRUNCATE])
    for i in range(len(t) - 1, -1, -1):
        if t[i] < 0xFF:
            t[i] += 1
            return bytes(t[: i + 1]).decode("latin-1")
    return None  # all 0xFF — no representable upper bound


def _chunk_stats(values, spark_type: str) -> tuple[str | None, str | None]:
    """(min_val, max_val) as round-trippable strings, or (None, None)."""
    if spark_type in ("string", "binary"):
        if len(values) == 0:
            return None, None
        arr = values.to_arrow()
        mm = pa.compute.min_max(arr)
        lo = mm["min"].as_py() or b""
        hi = mm["max"].as_py() or b""
        return lo[:STAT_TRUNCATE].decode("latin-1"), _truncate_max(hi)
    dp = _decimal_info(spark_type)
    if dp is not None and dp[0] > 18:
        # FLBA(16) decimals: lexsort the (high, low-unsigned) word pairs
        # to find the int128 extremes, stored as unscaled-int strings
        a = np.ascontiguousarray(values, dtype=np.uint8)
        if a.size == 0:
            return None, None
        words = a.view("<i8").reshape(-1, 2)
        lo_w, hi_w = words[:, 0].view(np.uint64), words[:, 1]
        order = np.lexsort((lo_w, hi_w))
        to_int = lambda i: (  # noqa: E731
            (int(words[i, 1]) << 64) | int(lo_w[i])
        )
        return repr(to_int(order[0])), repr(to_int(order[-1]))
    a = np.asarray(values)
    if a.size == 0 or a.dtype == bool:
        return None, None
    return repr(a.min().item()), repr(a.max().item())


def _encode_one(values, kind, spark_type, compression, base,
                stream="values", validity=None, fsst_cache=None,
                def_hist=None, rep_hist=None):
    # UUID-ish upgrade (type_uuid.go:14 analog): a binary chunk whose
    # values all share one width w ≤ 64 encodes as FLBA(w) — dropping
    # the per-value length framing and unlocking the BYTE_STREAM_SPLIT
    # and FLBA-dict kernels. Physical-only: stats, sha256, and bloom
    # stay in logical byte-array space (probes don't know the physical
    # kind), and decode rebuilds plain binary from the blob's own
    # header, so ragged and uniform chunks of one column can coexist.
    enc_values = values
    flba_upgraded = False
    if (kind == Kind.BYTE_ARRAY and spark_type == "binary"
            and isinstance(values, ByteArrays) and len(values)):
        lens = values.lengths
        w = int(lens[0])
        if 1 <= w <= 64 and bool((lens == w).all()):
            enc_values = np.ascontiguousarray(
                values.data[: values.offsets[-1]]
            ).reshape(-1, w)
            kind = Kind.FIXED_LEN_BYTE_ARRAY
            flba_upgraded = True
    flba_size = None
    if kind == Kind.FIXED_LEN_BYTE_ARRAY:
        flba_size = enc_values.shape[1] if len(enc_values) else 16
    # FSST training amortization (VERDICT r2 #3): one symbol table per
    # (repo, column, stream) per task, trained on the first chunk's
    # trial slice and reused by every later chunk of that column —
    # sub-chunk splits and streaming waves stop paying the
    # GENERATIONS×parse training cost. ~2 KB/entry; capped below.
    fsst_state = None
    if fsst_cache is not None and kind == Kind.BYTE_ARRAY:
        ck = (base.get("repo"), base.get("column"), stream)
        if ck not in fsst_cache and len(fsst_cache) >= 512:
            # evict the OLDEST entry (insertion order), not the whole
            # cache: a clear() would force every still-active column to
            # retrain, the exact cost amortization exists to avoid
            fsst_cache.pop(next(iter(fsst_cache)))
        fsst_state = fsst_cache.setdefault(ck, {})
    blob, info = selector.select_and_encode(
        enc_values, kind, flba_size=flba_size, compression=compression,
        validity=validity, fsst_state=fsst_state,
    )
    mn, mx = _chunk_stats(values, spark_type)
    null_count = 0 if validity is None else int(len(validity) - validity.sum())
    # split-block bloom per chunk (bloom/block.go analog); levels/list
    # streams carry no bloom. Dict-wrapped chunks build the filter from
    # the dictionary uniques already in hand (writer.go:2089-2095):
    # identical no-false-negative semantics, NDV-proportional cost.
    bf = None
    if stream == "values" and len(values) and kind != Kind.BOOLEAN:
        uniq = info.get("uniques")
        if flba_upgraded:
            # hash in byte-array space: bloom_point_decode probes with
            # the LOGICAL type's hashing and must not see the upgrade
            if uniq is not None:
                uniq = _flba_to_byte_values(uniq)
            bf = bloomlib.build(uniq if uniq is not None else values,
                                Kind.BYTE_ARRAY)
        else:
            bf = bloomlib.build(uniq if uniq is not None else enc_values,
                                kind)
    rec = dict(base)
    rec.update(
        stream=stream, kind=kind, codec=info["codec"], dict=info["dict"],
        zstd=compression is not None, spark_type=spark_type, raw_bytes=info["raw_bytes"],
        enc_bytes=len(blob),
        sha256=_column_sha256(values, spark_type, validity),
        min_val=mn, max_val=mx, null_count=null_count,
        def_hist=def_hist, rep_hist=rep_hist, bloom=bf, blob=blob,
    )
    return rec


def _join_stream(prefix: str, seg: str) -> str:
    return seg if not prefix else f"{prefix}/{seg}"


def _level_hists(ancestors, n_slots: int, null_count: int):
    """Definition/repetition level histograms for one leaf — the
    writer_statistics.go:20-44 analog, computed vectorized from the
    lengths chain instead of per-entry level streams.

    With k repeated ancestors (lengths arrays, outermost first), the
    Dremel entry counts are closed-form: rep histogram
    [n_rows, c_1 − nonempty_1, …, c_k − nonempty_k] (an entry repeats
    at level j iff it starts a non-first element of a level-j list);
    def histogram [empty_1, …, empty_k, leaf_nulls, leaf_values]
    (an entry stops at level j−1 iff the level-j list is empty; lists
    add exactly one def level each and the nullable leaf adds the
    last). Null containers (round 5) pose as empty in their lengths
    stream, so the histogram folds them into the empty bucket — the
    parquet-exact null/empty distinction lives in the 'valid' streams,
    not these diagnostic stats."""
    k = len(ancestors)
    n_rows = len(ancestors[0]) if k else n_slots
    rep = [n_rows] + [
        int(l.sum()) - int((l > 0).sum()) for l in ancestors
    ]
    de = [int((l == 0).sum()) for l in ancestors]
    de += [null_count, n_slots - null_count]
    return de, rep


def _shred_column(arr, spark_type: str, prefix: str = "", ancestors=()):
    """Recursively shred ONE Arrow column into flat streams — the
    Deconstruct analog at arbitrary nesting depth (the reference walks
    the schema tree the same way, schema.go:341-430 +
    column_buffer_repeated.go). Yields
    (stream_name, values, kind, leaf_spark_type, validity,
    def_hist, rep_hist); level histograms are carried on leaf streams
    only (lengths streams ARE the levels).

    Stream naming reproduces the original one-level names exactly
    (scalar → 'values', list → 'lengths'+element streams, struct field
    → 'f:<name>', map → 'lengths'/'keys'/'values') and extends them
    with '/'-joined path segments for deeper nests, e.g.
    struct<a:struct<x:int>> → 'f:a/f:x';
    array<array<int>>        → 'lengths', 'item/lengths', 'item';
    map<string,array<string>>→ 'lengths', 'keys', 'values/lengths',
                               'values'.
    Every repeated level contributes one shared lengths stream (the
    repetition-level analog); scalar leaves carry a validity bitmap
    (the definition-level analog). Null contract, applied recursively:
    scalar leaves may be null anywhere (including list elements);
    container values may be null at any level too (round 5) — a null
    container emits a boolean 'valid' stream for its domain and rides
    through the lengths/child streams as empty/all-null."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    el = _list_elem(spark_type)
    mk = _map_kv(spark_type)
    sf = _struct_fields(spark_type)
    if el is not None:
        if arr.null_count:
            # nullable container: one boolean 'valid' stream per nesting
            # domain (round 5 — the write direction of nested VARIANT
            # shredding produces null groups/lists at every level); null
            # lists ride as length-0 in the lengths stream and the
            # reconstructor re-marks them null from 'valid'
            valid = np.asarray(arr.is_valid())
            yield (_join_stream(prefix, "valid"), valid,
                   Kind.BOOLEAN, "boolean", None, None, None)
        lengths = np.asarray(
            pa.compute.fill_null(
                pa.compute.list_value_length(arr), 0)).astype(np.int32)
        yield (_join_stream(prefix, "lengths"), lengths,
               Kind.INT32, "int", None, None, None)
        # list/map elements need a distinguishing 'item' segment (their
        # own lengths stream would collide with ours); struct and scalar
        # elements keep the parent prefix — which is what reproduces the
        # legacy 'values' / 'f:<name>' names
        child_prefix = (_join_stream(prefix, "item")
                        if (_list_elem(el) is not None
                            or _map_kv(el) is not None)
                        else prefix)
        yield from _shred_column(arr.flatten(), el, child_prefix,
                                 ancestors + (lengths,))
    elif mk is not None:
        ktype, vtype = mk
        # cast map → list<struct<key,value>> (slice-safe; pyarrow's
        # list kernels have no map variants), then shred
        arr = arr.cast(pa.list_(pa.struct([
            pa.field("key", arr.type.key_type, nullable=False),
            pa.field("value", arr.type.item_type),
        ])))
        if arr.null_count:
            valid = np.asarray(arr.is_valid())
            yield (_join_stream(prefix, "valid"), valid,
                   Kind.BOOLEAN, "boolean", None, None, None)
        lengths = np.asarray(
            pa.compute.fill_null(
                pa.compute.list_value_length(arr), 0)).astype(np.int32)
        yield (_join_stream(prefix, "lengths"), lengths,
               Kind.INT32, "int", None, None, None)
        entries = arr.flatten()
        keys = entries.field(0)
        if keys.null_count:
            raise ValueError("map keys must be non-null")
        yield from _shred_column(keys, ktype, _join_stream(prefix, "keys"),
                                 ancestors + (lengths,))
        yield from _shred_column(
            entries.field(1), vtype, _join_stream(prefix, "values"),
            ancestors + (lengths,))
    elif sf is not None:
        if arr.null_count:
            valid = np.asarray(arr.is_valid())
            # 's:valid', not 'valid': a struct ELEMENT of a list shares
            # the list's prefix (legacy naming), so the struct's
            # validity must not collide with the list's own 'valid'
            # ('s:' can't collide with fields, which are 'f:<name>')
            yield (_join_stream(prefix, "s:valid"), valid,
                   Kind.BOOLEAN, "boolean", None, None, None)
        # StructArray.flatten() merges the parent validity into each
        # child, so null structs ride as all-null fields; the 'valid'
        # stream restores the null-struct vs all-null-fields distinction
        for (fname, ftype), child in zip(sf, arr.flatten()):
            yield from _shred_column(
                child, ftype, _join_stream(prefix, f"f:{fname}"), ancestors)
    else:
        validity = None
        n_slots = len(arr)
        if arr.null_count:
            validity = np.asarray(arr.is_valid())
            arr = arr.drop_null()
        de, rep = _level_hists(ancestors, n_slots, n_slots - len(arr))
        yield (prefix or "values", _arrow_to_values(arr, spark_type),
               _col_kind(spark_type), spark_type, validity, de, rep)


_BLOB_ARROW_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.string()), ("repo", pa.string()),
        ("bucket", pa.int32()), ("column", pa.string()),
        ("stream", pa.string()), ("n_rows", pa.int64()),
        ("kind", pa.int32()), ("codec", pa.int32()),
        ("dict", pa.bool_()), ("zstd", pa.bool_()),
        ("spark_type", pa.string()), ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()), ("sha256", pa.string()),
        ("min_val", pa.string()), ("max_val", pa.string()),
        ("null_count", pa.int64()),
        ("def_hist", pa.list_(pa.int64())),
        ("rep_hist", pa.list_(pa.int64())),
        ("bloom", pa.binary()), ("blob", pa.binary()),
    ]
)


def _encode_chunk_batches(tbl: pa.Table, columns, repo: str, bucket: int,
                          compression: str | None,
                          sort_cols: list[str] | None = None,
                          chunk_suffix: str = "",
                          target_bytes: int | None = None,
                          split_offset: int = 0,
                          force_split: bool = False,
                          fsst_cache: dict | None = None):
    """Encode one (repo, bucket) group's columns → manifest+blob record
    batches (a generator: one batch per emitted chunk).

    Sorting happens HERE with Arrow's C++ sort_indices + take, not with
    Spark's sortWithinPartitions: a JVM row sort of wide string rows cost
    more than the encode kernels themselves, while a per-group columnar
    sort is nearly free.

    Groups larger than 2× target_bytes split into row-range sub-chunks
    AFTER the sort (ids '#<bucket>s<i><suffix>'): the safety net that
    bounds chunk size when the planner's size estimate under-bucketed a
    repo (metadata-based sizing uses a global average row size), the
    dynamic analog of the reference's page-flush size checks
    (writer.go:262-267).

    split_offset/force_split support the streaming-flush caller
    (_encode_stream_fn): a group flushed in several waves numbers its
    sub-chunks continuously (s<offset>, s<offset+1>, …) and keeps the
    s-tag even for a single-chunk wave so ids never collide across
    waves."""
    if sort_cols:
        idx = pa.compute.sort_indices(
            tbl, sort_keys=[(c, "ascending") for c in sort_cols]
        )
        tbl = tbl.take(idx)
    n_splits = 1
    if target_bytes and tbl.nbytes > 2 * target_bytes:
        n_splits = -(-tbl.nbytes // target_bytes)
    rows_per = -(-tbl.num_rows // n_splits)
    for si in range(n_splits):
        sub = tbl.slice(si * rows_per, rows_per)
        if sub.num_rows == 0:
            continue
        # split tag goes BEFORE the batch suffix so streaming-resume's
        # endswith(chunk_suffix) filter still recognizes split chunks as
        # done on replay (a replayed micro-batch must not re-encode them)
        tag = f"s{split_offset + si}" if (n_splits > 1 or force_split) else ""
        yield _encode_one_chunk(sub, columns, repo, bucket,
                                compression, tag + chunk_suffix,
                                fsst_cache=fsst_cache)


def _encode_one_chunk(tbl: pa.Table, columns, repo: str, bucket: int,
                      compression: str | None,
                      chunk_suffix: str,
                      fsst_cache: dict | None = None) -> pa.RecordBatch:
    base = {
        "chunk_id": f"{repo}#{bucket}{chunk_suffix}", "repo": repo,
        "bucket": bucket, "n_rows": tbl.num_rows,
    }
    recs = []
    for name, spark_type in columns:
        b = dict(base, column=name)
        for (stream, values, kind, leaf_type, validity,
             de, rep) in _shred_column(tbl.column(name), spark_type):
            recs.append(_encode_one(values, kind, leaf_type, compression,
                                    b, stream=stream, validity=validity,
                                    fsst_cache=fsst_cache,
                                    def_hist=de, rep_hist=rep))
    return pa.RecordBatch.from_pylist(recs, schema=_BLOB_ARROW_SCHEMA)


def _encode_stream_fn(columns: list[tuple[str, str]],
                      compression: str | None,
                      sort_cols: list[str], chunk_suffix: str = "",
                      target_bytes: int | None = None):
    """mapInArrow encode kernel: the partition is hash-partitioned on
    (__repo, __bucket) but NOT sorted — batch slices are accumulated per
    group in a dict. No pandas conversion and no JVM row sort anywhere:
    strings stay in Arrow buffers end to end, and ordering is a
    per-group columnar sort inside _encode_chunk_batches.

    Memory is bounded by SIZE-TRIGGERED FLUSH, the page-flush analog of
    writer.go:262-267: whenever a group's buffered slices cross
    2× target_bytes it is encoded and yielded IMMEDIATELY as an
    's<i>'-tagged sub-chunk and its buffers dropped — a task never
    holds its whole partition share, only ≤2× target per in-flight
    group plus one incoming Arrow batch (VERDICT r2 #1: the previous
    exhaust-then-encode design buffered the entire partition, ~GBs per
    task at 100 TB with fixed n_parts). Groups that never hit the
    threshold still encode as one chunk after input exhaustion."""
    data_cols = [c for c, _ in columns]
    flush_bytes = 2 * target_bytes if target_bytes else None

    def fn(batches):
        import pyarrow.compute as pc

        groups: dict[tuple, list[pa.RecordBatch]] = {}
        gbytes: dict[tuple, int] = {}
        flushed: dict[tuple, int] = {}  # sub-chunks already emitted
        fsst_cache: dict = {}  # (repo, column, stream) -> trained table

        def drain(key, final):
            repo, bucket = key
            tbl = pa.Table.from_batches(groups.pop(key))
            gbytes[key] = 0
            start = flushed.get(key, 0)
            # any early-flushed group keeps s-tags on ALL its chunks
            # (including the final wave) so ids never collide
            force = (not final) or start > 0
            count = 0
            for rb in _encode_chunk_batches(
                tbl, columns, repo, bucket, compression, sort_cols,
                chunk_suffix, target_bytes,
                split_offset=start, force_split=force,
                fsst_cache=fsst_cache,
            ):
                count += 1
                yield rb
            flushed[key] = start + count

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            repos = batch.column("__repo")
            buckets = np.asarray(batch.column("__bucket"))
            dictized = pc.dictionary_encode(repos)
            rcodes = np.asarray(dictized.indices).astype(np.int64)
            rdict = dictized.dictionary
            key_code = (rcodes << 32) | buckets.astype(np.int64)
            order = np.argsort(key_code, kind="stable")
            sorted_keys = key_code[order]
            change = np.ones(n, dtype=bool)
            change[1:] = sorted_keys[1:] != sorted_keys[:-1]
            starts = np.flatnonzero(change)
            data = batch.select(data_cols).take(pa.array(order))
            for i, s in enumerate(starts):
                e = starts[i + 1] if i + 1 < len(starts) else n
                code = sorted_keys[s]
                key = (rdict[int(code >> 32)].as_py(), int(code & 0xFFFFFFFF))
                sl = data.slice(s, e - s)
                groups.setdefault(key, []).append(sl)
                gbytes[key] = gbytes.get(key, 0) + sl.nbytes
                if flush_bytes and gbytes[key] >= flush_bytes:
                    yield from drain(key, final=False)
        for key in list(groups):
            yield from drain(key, final=True)

    return fn


def _row_size_expr(df: DataFrame):
    size_expr = F.lit(0)
    for c, t in df.dtypes:
        dp = _decimal_info(t)
        if t in ("string", "binary"):
            size_expr = size_expr + F.coalesce(F.octet_length(F.col(c)), F.lit(0))
        elif t == "array<string>":
            size_expr = size_expr + F.aggregate(
                F.col(c), F.lit(0), lambda acc, x: acc + F.octet_length(x)
            ) + F.size(F.col(c)) * F.lit(4) + F.lit(4)
        elif t in _LIST_ELEM_WIDTH:
            size_expr = (size_expr
                         + F.size(F.col(c)) * F.lit(_LIST_ELEM_WIDTH[t])
                         + F.lit(4))
        elif t.startswith("array<"):
            # nested lists: rough per-element cost — planning only
            # shapes bucket counts; the encode kernel's size-triggered
            # flush bounds any underestimate
            size_expr = size_expr + F.size(F.col(c)) * F.lit(24) + F.lit(4)
        elif dp is not None:
            size_expr = size_expr + F.lit(16 if dp[0] > 18 else 8)
        elif t.startswith("struct<"):
            size_expr = size_expr + F.lit(16)  # rough per-row struct cost
        elif t.startswith("map<"):
            # rough per-entry cost; planning only shapes bucket counts and
            # the encode kernel splits any group exceeding 2x the target
            size_expr = size_expr + F.size(F.col(c)) * F.lit(24) + F.lit(4)
        elif t in ("bigint", "double", "timestamp", "timestamp_ntz"):
            size_expr = size_expr + F.lit(8)
        else:
            size_expr = size_expr + F.lit(4)
    return size_expr


RANGE_GRANULARITY = 128  # quantile resolution for the range layout
RANGE_GRANULARITY2 = 32  # secondary-key quantile resolution (compound)
RANGE_SUBSPLIT = 8  # max secondary sub-buckets per coarse primary range


def _order_surrogate(col, spark_type: str):
    """An orderable numeric surrogate of a sort key, for quantile
    computation: strings/binary use their first 7 bytes packed big-endian
    into a bigint (prefix order == byte order; ties within a 7-byte
    prefix collapse to one quantile, which only costs resolution)."""
    if spark_type in ("string", "binary"):
        h = F.hex(F.encode(col, "UTF-8")) if spark_type == "string" else F.hex(col)
        return F.conv(F.rpad(F.substring(h, 1, 14), 14, "0"), 16, 10).cast("bigint")
    return col.cast("double")


def compute_range_bounds(df: DataFrame, repo_col: str, key_cols,
                         size_expr, target_chunk_bytes: int):
    """Per-repo byte totals and sort-key quantile boundaries →
    (primary_bounds, secondary_bounds | None). The SortingWriter
    analog's planning step (sorting.go:23-127): disjoint key ranges per
    chunk instead of hash-interleaved ones, which is what makes min/max
    pruning actually prune. With ≥2 key_cols the split is hierarchical
    (SortingColumns, config.go:411): coarse primary ranges, secondary
    quantiles conditional on each coarse range."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    types = dict(df.dtypes)
    key = _order_surrogate(F.col(key_cols[0]), types[key_cols[0]])
    pcts = [i / RANGE_GRANULARITY for i in range(1, RANGE_GRANULARITY)]
    agg = df.groupBy(F.col(repo_col)).agg(
        F.sum(size_expr).alias("__bytes"),
        F.percentile_approx(key, pcts, 10000).alias("__bnds"),
    )
    agg = agg.withColumn(
        "__n_buckets",
        F.greatest(
            F.lit(1), F.ceil(F.col("__bytes") / F.lit(target_chunk_bytes))
        ).cast("int"),
    )
    if len(key_cols) == 1:
        b1 = agg.select(
            F.col(repo_col), "__n_buckets", "__bnds",
            F.col("__n_buckets").alias("__n1"),
            F.lit(1).alias("__w"),
        )
        return b1, None
    # Compound sort keys (the reference's SortingColumns,
    # sorting.go:23-127 + config.go:411): the primary key splits each
    # repo into __n1 COARSE ranges; each coarse range splits into __w
    # sub-buckets by quantiles of the secondary key CONDITIONAL on the
    # coarse range (a global secondary quantile would skew bucket sizes
    # whenever the keys correlate). Two wins at scale: (a) chunk ranges
    # are disjoint in lexicographic (k1, k2) prefix order, so stats
    # prune on k1, and on k2 within a k1 range; (b) a LOW-CARDINALITY
    # primary key no longer collapses planning into a handful of giant
    # single-task groups — the secondary split restores parallelism
    # while the per-group columnar sort keeps chunks k2-ordered.
    b1 = agg.select(
        F.col(repo_col), "__n_buckets", "__bnds",
        F.greatest(F.lit(1), F.ceil(
            F.col("__n_buckets") / F.lit(RANGE_SUBSPLIT)
        )).cast("int").alias("__n1"),
        F.least(F.col("__n_buckets"), F.lit(RANGE_SUBSPLIT))
        .cast("int").alias("__w"),
    )
    keyed1 = df.join(F.broadcast(b1), on=repo_col, how="inner")
    coarse = _coarse_bucket_expr(key)
    key2 = _order_surrogate(F.col(key_cols[1]), types[key_cols[1]])
    pcts2 = [i / RANGE_GRANULARITY2 for i in range(1, RANGE_GRANULARITY2)]
    b2 = (
        keyed1.withColumn("__coarse", coarse)
        .groupBy(F.col(repo_col), "__coarse")
        .agg(F.percentile_approx(key2, pcts2, 10000).alias("__bnds2"))
    )
    return b1, b2


def _coarse_bucket_expr(key):
    """Primary-key quantile position → coarse range index [0, __n1).
    Shared by bounds computation and row assignment so both phases
    agree on the coarse split (the columns __bnds/__n1 come from the
    joined bounds table)."""
    pos = F.aggregate(
        F.col("__bnds"), F.lit(0),
        lambda acc, b: acc + F.when(key >= b, 1).otherwise(0),
    )
    return F.least(
        F.floor(pos * F.col("__n1") / F.lit(RANGE_GRANULARITY)).cast("int"),
        F.col("__n1") - 1,
    )


def plan_chunks_range(df: DataFrame, repo_col: str, sort_keys,
                      bounds: DataFrame,
                      bounds2: DataFrame | None = None) -> DataFrame:
    """Assign rows to range-ordered buckets from precomputed boundaries:
    bucket = quantile-position of the sort key scaled to the repo's
    bucket count. Chunk key ranges are (approximately) disjoint, so
    chunk min/max stats prune instead of overlapping (VERDICT: the
    xxhash bucket layout made every chunk span the full key range).

    With bounds2 (compound sort keys) the bucket id is
    coarse * __w + sub, where sub comes from the secondary key's
    conditional quantiles — the lexicographic (k1, k2) split."""
    sort_keys = [sort_keys] if isinstance(sort_keys, str) else list(sort_keys)
    types = dict(df.dtypes)
    key = _order_surrogate(F.col(sort_keys[0]), types[sort_keys[0]])
    # LEFT join: a resumed run over a grown input may contain repos that
    # were absent when the _bounds sidecar was computed — an inner join
    # would silently drop their rows (data loss). Unmatched repos fall
    # back to a single bucket 0; the encode kernel's group splitting
    # bounds their chunk sizes regardless.
    out = df.join(F.broadcast(bounds), on=repo_col, how="left")
    if bounds2 is None:
        pos = F.aggregate(
            F.col("__bnds"), F.lit(0),
            lambda acc, b: acc + F.when(key >= b, 1).otherwise(0),
        )
        bucket = F.floor(
            pos * F.col("__n_buckets") / F.lit(RANGE_GRANULARITY)
        ).cast("int")
        bucket = F.least(bucket, F.col("__n_buckets") - 1)
    else:
        key2 = _order_surrogate(F.col(sort_keys[1]), types[sort_keys[1]])
        out = out.withColumn("__coarse", _coarse_bucket_expr(key))
        out = out.join(
            F.broadcast(bounds2), on=[repo_col, "__coarse"], how="left"
        )
        pos2 = F.aggregate(
            F.col("__bnds2"), F.lit(0),
            lambda acc, b: acc + F.when(key2 >= b, 1).otherwise(0),
        )
        sub = F.least(
            F.floor(pos2 * F.col("__w") / F.lit(RANGE_GRANULARITY2))
            .cast("int"),
            F.col("__w") - 1,
        )
        bucket = F.col("__coarse") * F.col("__w") + F.coalesce(sub, F.lit(0))
    return (
        out.withColumn("__repo", F.col(repo_col).cast("string"))
        .withColumn("__bucket", F.coalesce(bucket.cast("int"), F.lit(0)))
        .drop("__n_buckets", "__bnds", "__n1", "__w", "__coarse", "__bnds2")
    )


def _avg_row_bytes_from_metadata(df: DataFrame) -> float | None:
    """Average row size of df's input parquet files, read from their
    footers only (driver-side, no data scan): parquet row groups record
    total_byte_size (ENCODED-uncompressed page bytes — dictionary/RLE
    applied, outer compression not) + num_rows, so this UNDERSTATES
    logical row bytes on highly repetitive data. That bias is safe:
    planning only shapes bucket counts, and the encode kernel splits any
    group that exceeds 2× the target regardless. Returns None when the
    plan has no parquet file inputs (derived DataFrames, other formats).

    This is the catalog-statistics path the reference gets from file
    metadata (file.go footer reads): planning a 100 TB encode must not
    cost a second 100 TB scan."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    if any(not f.endswith(".parquet") for f in files):
        return None

    # Footer reads are distributed as a Spark job over the path list when
    # there are many files: at 100 TB ≈ 10⁵-10⁶ input files a sequential
    # driver loop is minutes-to-hours of single-threaded time (VERDICT r2
    # #2) while the job stays zero-data-bytes (footers only, ~KBs each).
    # Small file counts skip the job-scheduling overhead.
    if len(files) > _FOOTER_DRIVER_MAX:
        spark = df.sparkSession
        slices = min(len(files), spark.sparkContext.defaultParallelism * 4)
        try:
            parts = (
                spark.sparkContext.parallelize(files, slices)
                .mapPartitions(_footer_stats_partition)
                .collect()
            )
        except Exception:
            return None
        if any(tb < 0 for tb, _ in parts):
            return None
        total_bytes = sum(tb for tb, _ in parts)
        total_rows = sum(tr for _, tr in parts)
    else:
        total_bytes, total_rows = _footer_stats(files)
        if total_bytes < 0:
            return None
    if total_rows == 0:
        return None
    return total_bytes / total_rows


_FOOTER_DRIVER_MAX = 64  # above this, footer reads run as a Spark job


def _footer_stats(paths) -> tuple[int, int]:
    """(total_byte_size, num_rows) summed over parquet footers;
    (-1, 0) if any footer is unreadable."""
    import pyarrow.parquet as pq

    total_bytes = total_rows = 0
    for f in paths:
        path = f[len("file:"):] if f.startswith("file:") else f
        try:
            md = pq.ParquetFile(path).metadata
        except Exception:
            return -1, 0
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            total_bytes += rg.total_byte_size
            total_rows += rg.num_rows
    return total_bytes, total_rows


def _footer_stats_partition(paths):
    yield _footer_stats(list(paths))


def plan_chunks(df: DataFrame, repo_col: str, salt_cols: list[str],
                target_chunk_bytes: int = TARGET_CHUNK_BYTES,
                exact_sizes: bool = True,
                size_mode: str | None = None) -> DataFrame:
    """Assign every row a bounded-size (repo, bucket) chunk key.

    One small aggregation + a broadcast join back; the heavy table is
    only shuffled once, by groupBy in encode_table.

    size_mode:
      "metadata" — per-repo COUNT (a repo-column-only scan: Spark prunes
        every other column, ~1-5% of table bytes on content-heavy data)
        × the global average row size read from parquet FOOTERS (driver-
        side, zero data bytes). Underestimates for repos with atypically
        large rows are bounded by the encode kernel's group splitting.
        This is the 100 TB default: planning never re-reads the data.
      "exact" — sums exact per-repo bytes in one full scan (a 100 TB
        job reads 200 TB; only right when footers are unavailable AND
        skew by row size is extreme).
      "sample" — deterministic 1% row-hash sample; only worthwhile when
        the storage layer can prune the sample read (Iceberg sample
        partitions) — with plain parquet it reads everything anyway.
      None/default — "metadata" when footer stats exist, else "exact".

    exact_sizes is the legacy flag: True→default resolution, False→sample.
    """
    if size_mode is None:
        size_mode = "auto" if exact_sizes else "sample"
    size_expr = _row_size_expr(df)
    avg = None
    if size_mode in ("auto", "metadata"):
        avg = _avg_row_bytes_from_metadata(df)
        if avg is None and size_mode == "metadata":
            raise ValueError("size_mode='metadata': no parquet footer stats")
    if avg is not None:
        counts = df.groupBy(F.col(repo_col)).agg(F.count(F.lit(1)).alias("__n"))
        sizes = counts.withColumn(
            "__bytes", (F.col("__n") * F.lit(float(avg))).cast("bigint")
        )
    elif size_mode in ("auto", "exact"):
        sizes = df.groupBy(F.col(repo_col)).agg(F.sum(size_expr).alias("__bytes"))
    else:
        salt_hash = F.xxhash64(*[F.col(c) for c in salt_cols])
        sample_avg = (
            df.where(F.pmod(salt_hash, F.lit(100)) == 0)
            .groupBy(F.col(repo_col))
            .agg(F.avg(size_expr).alias("__avg"))
        )
        counts = df.groupBy(F.col(repo_col)).agg(F.count(F.lit(1)).alias("__n"))
        global_avg = F.expr("avg(__avg) over ()")  # fallback for unsampled repos
        sizes = (
            counts.join(F.broadcast(sample_avg), on=repo_col, how="left")
            .withColumn("__avg", F.coalesce(F.col("__avg"), global_avg, F.lit(256.0)))
            .withColumn("__bytes", (F.col("__n") * F.col("__avg")).cast("bigint"))
        )
    sizes = sizes.withColumn(
        "__n_buckets",
        F.greatest(
            F.lit(1), F.ceil(F.col("__bytes") / F.lit(target_chunk_bytes))
        ).cast("int"),
    ).select(F.col(repo_col), "__n_buckets")
    out = df.join(F.broadcast(sizes), on=repo_col, how="inner")
    return (
        out.withColumn("__repo", F.col(repo_col).cast("string"))
        .withColumn(
            "__bucket",
            F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.col("__n_buckets")).cast("int"),
        )
        .drop("__n_buckets")
    )


def encode_table(
    spark: SparkSession,
    df: DataFrame,
    out_path: str,
    *,
    repo_col: str = "repo",
    salt_cols: list[str] | None = None,
    sort_cols: list[str] | None = None,
    target_chunk_bytes: int = TARGET_CHUNK_BYTES,
    zstd: bool = False,
    compression: str | None = None,
    resume: bool = True,
    chunk_suffix: str = "",
    exact_sizes: bool = True,
    size_mode: str | None = None,
    layout: str = "hash",
) -> dict:
    """Encode df into a blobs+manifest parquet table at out_path.

    layout="hash" buckets rows by xxhash64(salt_cols) — fastest, but
    chunk key ranges interleave. layout="range" buckets by sort-key
    quantiles (disjoint chunk ranges → min/max pruning works, the
    SortingWriter analog); its boundaries are persisted to a `_bounds`
    sidecar BEFORE encoding so resumed runs reuse the exact same
    assignment (percentile sketches are not bit-stable across runs).

    Returns summary metrics (chunks encoded, bytes, ratio, skipped)."""
    salt_cols = salt_cols or [c for c, _ in df.dtypes if c != repo_col][:2]
    sort_cols = sort_cols if sort_cols is not None else salt_cols
    columns = df.dtypes
    for _, t in columns:
        _col_kind(t)  # validate early

    if layout == "range":
        bounds_path = os.path.join(out_path, "_bounds")
        bounds2_path = os.path.join(out_path, "_bounds2")
        range_keys = sort_cols[:2]  # compound split uses first two keys
        if not (resume and _table_exists(bounds_path)):
            bounds, bounds2 = compute_range_bounds(
                df, repo_col, range_keys, _row_size_expr(df),
                target_chunk_bytes,
            )
            bounds.write.mode("overwrite").parquet(bounds_path)
            if bounds2 is not None:
                bounds2.write.mode("overwrite").parquet(bounds2_path)
        b1 = spark.read.parquet(bounds_path)
        if "__w" not in b1.columns:  # pre-compound sidecar compat
            b1 = b1.withColumn("__n1", F.col("__n_buckets")).withColumn(
                "__w", F.lit(1)
            )
        b2 = (
            spark.read.parquet(bounds2_path)
            if len(range_keys) > 1 and _table_exists(bounds2_path)
            else None
        )
        keyed = plan_chunks_range(
            df, repo_col, range_keys if b2 is not None else range_keys[0],
            b1, b2,
        )
    else:
        keyed = plan_chunks(df, repo_col, salt_cols, target_chunk_bytes,
                            exact_sizes=exact_sizes, size_mode=size_mode)

    skipped = 0
    if resume and _table_exists(out_path):
        m = manifest(spark, out_path)
        if chunk_suffix:
            # streaming replays: only chunks of THIS micro-batch count as
            # done — other batches legitimately reuse (repo, bucket).
            # Match both id layouts: current runs put the split tag
            # BEFORE the suffix ('s0@b7'), tables written by older runs
            # put it after ('@b7s0') — a replay must recognize both as
            # done or it re-appends duplicate blobs
            import re as _re

            m = m.where(F.col("chunk_id").rlike(
                _re.escape(chunk_suffix) + r"(s\d+)?$"))
        done = m.select("repo", "bucket").distinct()
        cond = (keyed["__repo"] == done["repo"]) & (keyed["__bucket"] == done["bucket"])
        keyed = keyed.join(F.broadcast(done), on=cond, how="left_anti")
        skipped = done.count()

    import time as _time

    t0 = _time.time()
    comp = compression or ("zstd" if zstd else None)
    fn = _encode_stream_fn(columns, comp, sort_cols, chunk_suffix,
                           target_bytes=target_chunk_bytes)
    # explicit partition count: AQE's advisory-size coalescing would
    # otherwise merge this shuffle into a handful of 64 MB partitions and
    # starve the Python encode kernels of parallelism; 4x parallelism
    # keeps the straggler tail short when group sizes vary
    n_parts = spark.sparkContext.defaultParallelism * 4
    parts = keyed.repartition(n_parts, "__repo", "__bucket")
    encoded = parts.mapInArrow(fn, BLOB_SCHEMA)
    encoded.write.mode("append").parquet(out_path)
    write_sec = _time.time() - t0

    _write_schema_sidecar(out_path, columns)

    m = manifest(spark, out_path)
    agg = m.agg(
        F.countDistinct("chunk_id").alias("chunks"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
    ).collect()[0]
    return {
        "chunks": agg["chunks"],
        "raw_bytes": agg["raw_bytes"],
        "enc_bytes": agg["enc_bytes"],
        "ratio": (agg["raw_bytes"] or 0) / max(agg["enc_bytes"] or 1, 1),
        "skipped_chunks": skipped,
        # time from call to write commit — the job itself, excluding the
        # post-hoc manifest summary aggregation below
        "write_sec": round(write_sec, 2),
    }


def _table_exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def _write_schema_sidecar(out_path: str, columns: list[tuple[str, str]]) -> None:
    with open(os.path.join(out_path, "_colcodec_schema.json"), "w") as f:
        json.dump({"columns": [{"name": c, "type": t} for c, t in columns]}, f)


def _read_schema_sidecar(out_path: str) -> list[tuple[str, str]]:
    with open(os.path.join(out_path, "_colcodec_schema.json")) as f:
        doc = json.load(f)
    return [(c["name"], c["type"]) for c in doc["columns"]]


def manifest(spark: SparkSession, out_path: str) -> DataFrame:
    """Manifest view — columnar pruning means the blob column is never
    read. The read uses the EXPLICIT blob schema so tables written
    before a manifest-schema extension (def_hist/rep_hist are round-3
    additions) still resolve: files lacking a column yield nulls, which
    is exactly the no-statistics-recorded meaning."""
    return (spark.read.schema(BLOB_SCHEMA).parquet(out_path)
            .select(*MANIFEST_COLUMNS))


_SPARK_TYPE_NAMES = {
    "string": StringType(), "binary": BinaryType(), "bigint": LongType(),
    "int": IntegerType(), "double": DoubleType(), "float": FloatType(),
    "boolean": BooleanType(), "timestamp": TimestampType(), "timestamp_ntz": TimestampNTZType(),
    "date": DateType(),
}


def _spark_dtype(spark_type: str):
    """Type string → Spark DataType, recursing through arbitrary
    nesting (the decode-output schema mirror of _shred_column)."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType

    if spark_type in _SPARK_TYPE_NAMES:
        return _SPARK_TYPE_NAMES[spark_type]
    dp = _decimal_info(spark_type)
    if dp is not None:
        return DecimalType(*dp)
    el = _list_elem(spark_type)
    if el is not None:
        return ArrayType(_spark_dtype(el), True)
    sf = _struct_fields(spark_type)
    if sf is not None:
        return StructType([
            StructField(fn, _spark_dtype(ft), True) for fn, ft in sf
        ])
    mk = _map_kv(spark_type)
    if mk is not None:
        return MapType(_spark_dtype(mk[0]), _spark_dtype(mk[1]), True)
    raise ValueError(f"unsupported column type {spark_type}")


def _out_field(name: str, spark_type: str) -> StructField:
    return StructField(name, _spark_dtype(spark_type), True)


def _decode_stream_fn(cols: list[tuple[str, str]]):
    """Build the mapInArrow decode kernel. Input blob rows arrive sorted
    by chunk_id within the partition (repartition + sortWithinPartitions
    upstream), so the kernel holds exactly ONE chunk's decoded streams at
    a time and yields it the moment the chunk_id changes — peak memory is
    one decoded chunk per task, never the whole partition. Factored out
    of _decode_blobs so tests can drive it directly and assert the
    streaming behavior (yield-before-exhaustion)."""
    col_types = dict(cols)

    def _rebuild(values, validity, spark_type: str) -> pa.Array:
        arr = _values_to_arrow(values, spark_type)
        if validity is not None:
            # scatter non-null values back to full rows: take with
            # a masked index array (mask=True → null)
            idx = np.cumsum(validity) - 1
            index = pa.array(np.where(validity, idx, 0), mask=~validity)
            arr = arr.take(index)
        return arr

    def _unshred(st: dict, spark_type: str, prefix: str, n: int) -> pa.Array:
        """Recursive Reconstruct — the inverse of _shred_column, walking
        the same stream-name grammar. st maps stream name →
        (values, validity) for one column of one chunk; n is the row
        count of the current nesting domain."""
        el = _list_elem(spark_type)
        mk = _map_kv(spark_type)
        sf = _struct_fields(spark_type)

        def _cont_valid(pfx, stream="valid"):
            """Container validity (round-5 nullable-container grammar);
            stores written before it simply lack the stream → all
            present. Structs use 's:valid' (see _shred_column)."""
            vkey = _join_stream(pfx, stream)
            if vkey in st:
                return np.asarray(st[vkey][0]).astype(bool)
            return None

        if el is not None:
            lengths, _ = st[_join_stream(prefix, "lengths")]
            assert len(lengths) == n
            offsets = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(lengths, out=offsets[1:])
            child_prefix = (_join_stream(prefix, "item")
                            if (_list_elem(el) is not None
                                or _map_kv(el) is not None)
                            else prefix)
            child = _unshred(st, el, child_prefix, int(offsets[-1]))
            valid = _cont_valid(prefix)
            if valid is None:
                off_arr = pa.array(offsets, pa.int32())
            else:
                # a null offset marks the list itself null (final
                # offset stays non-null per the Arrow layout)
                off_arr = pa.array(
                    offsets, pa.int32(),
                    mask=np.concatenate([~valid, [False]]))
            return pa.ListArray.from_arrays(off_arr, child)
        if mk is not None:
            ktype, vtype = mk
            lengths, _ = st[_join_stream(prefix, "lengths")]
            assert len(lengths) == n
            offsets = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(lengths, out=offsets[1:])
            n_flat = int(offsets[-1])
            karr = _unshred(st, ktype, _join_stream(prefix, "keys"), n_flat)
            iarr = _unshred(st, vtype, _join_stream(prefix, "values"), n_flat)
            valid = _cont_valid(prefix)
            if valid is None:
                off_arr = pa.array(offsets, pa.int32())
            else:
                off_arr = pa.array(
                    offsets, pa.int32(),
                    mask=np.concatenate([~valid, [False]]))
            return pa.MapArray.from_arrays(off_arr, karr, iarr)
        if sf is not None:
            children = [
                _unshred(st, ftype, _join_stream(prefix, f"f:{fname}"), n)
                for fname, ftype in sf
            ]
            valid = _cont_valid(prefix, "s:valid")
            return pa.StructArray.from_arrays(
                children, names=[fname for fname, _ in sf],
                mask=pa.array(~valid) if valid is not None else None)
        arr = _rebuild(*st[prefix or "values"], spark_type)
        assert len(arr) == n
        return arr

    def _assemble(acc: dict, n_rows: int) -> pa.RecordBatch:
        arrays = [
            _unshred(acc[name], spark_type, "", n_rows)
            for name, spark_type in cols
        ]
        return pa.RecordBatch.from_arrays(arrays, names=[c for c, _ in cols])

    def decode(batches):
        cur_id = None
        cur_acc: dict = {}  # column -> stream -> (values, validity)
        cur_rows = 0
        for batch in batches:
            cids = batch.column("chunk_id")
            names = batch.column("column")
            streams = batch.column("stream")
            nr = batch.column("n_rows")
            blob_col = batch.column("blob")
            for i in range(batch.num_rows):  # one iteration per blob ROW
                cid = cids[i].as_py()  # (metadata scale: one per column
                # per chunk, thousands of values each — not per value)
                if cid != cur_id:
                    if cur_id is not None:
                        yield _assemble(cur_acc, cur_rows)
                    cur_id, cur_acc = cid, {}
                name = names[i].as_py()
                values, meta = chunklib.decode_chunk(blob_col[i].as_py())
                cur_rows = nr[i].as_py()
                cur_acc.setdefault(name, {})[streams[i].as_py()] = (
                    values, meta["validity"]
                )
                ctype = col_types.get(name)
                if ctype is None or not _is_container(ctype):
                    # scalar columns: the values stream covers every row;
                    # nested streams live on flattened domains
                    assert meta["n"] == cur_rows
        if cur_id is not None:
            yield _assemble(cur_acc, cur_rows)

    return decode


def _decode_blobs(blobs: DataFrame, cols: list[tuple[str, str]]) -> DataFrame:
    """Arrow-native decode: hash-partition blob rows by chunk_id, SORT by
    chunk_id within partitions (cheap — metadata-scale row count), and
    stream them through the one-chunk-in-flight kernel."""
    out_schema = StructType([_out_field(c, t) for c, t in cols])
    n_parts = blobs.sparkSession.sparkContext.defaultParallelism * 4
    parts = blobs.repartition(n_parts, "chunk_id").sortWithinPartitions(
        "chunk_id"
    )
    return parts.mapInArrow(_decode_stream_fn(cols), out_schema)


def decode_table(spark: SparkSession, out_path: str,
                 columns_subset: list[str] | None = None) -> DataFrame:
    """blobs table → original rows (order within chunks preserved).

    columns_subset prunes both the output AND the blobs that are read —
    the analog of reader.go:63-65 projection (Spark's parquet reader
    never materializes the skipped blob cells: columnar pruning)."""
    columns = _read_schema_sidecar(out_path)
    blobs = spark.read.parquet(out_path)
    if columns_subset is not None:
        keep = set(columns_subset)
        columns = [(c, t) for c, t in columns if c in keep]
        blobs = blobs.where(F.col("column").isin([c for c, _ in columns]))
    return _decode_blobs(blobs, columns)


def bloom_point_decode(
    spark: SparkSession,
    out_path: str,
    column: str,
    value,
    columns_subset: list[str] | None = None,
) -> DataFrame:
    """Point lookup via per-chunk split-block bloom filters: decode only
    chunks whose bloom might contain `value`, then apply the exact
    filter. No false negatives, so the result is exact (bloom.go:189+,
    README.md:395-465). The probe runs over manifest rows only —
    metadata scale, never the data."""
    columns = dict(_read_schema_sidecar(out_path))
    col_type = columns[column]
    # array<scalar> columns: the bloom lives on the flattened element
    # stream, so the probe is an ELEMENT value and the exact filter is
    # membership, not equality
    elem = _list_elem(col_type)
    spark_type = elem if elem is not None else col_type
    if elem is not None and _is_container(elem):
        raise ValueError(
            f"bloom_point_decode: no scalar bloom stream for {col_type}")
    kind = _col_kind(spark_type)
    dp = _decimal_info(spark_type)
    if spark_type in ("string", "binary"):
        probe_vals = ByteArrays.from_pylist(
            [value.encode() if isinstance(value, str) else value]
        )
    elif dp is not None:
        unscaled = _unscaled(value, dp[1])
        if unscaled is None:
            # a literal finer than the column's scale can equal NO
            # stored value: the semantically-correct answer is an
            # EMPTY result (decode nothing), not an error
            empty = manifest(spark, out_path).where(F.lit(False)) \
                .select("chunk_id").distinct()
            blobs = spark.read.parquet(out_path).join(
                F.broadcast(empty), "chunk_id", "left_semi")
            return _decode_blobs(blobs, _read_schema_sidecar(out_path))
        if dp[0] <= 9:
            probe_vals = np.array([unscaled], dtype=np.int32)
        elif dp[0] <= 18:
            probe_vals = np.array([unscaled], dtype=np.int64)
        else:
            mask64 = (1 << 64) - 1
            words = np.array(
                [[unscaled & mask64, (unscaled >> 64) & mask64]],
                dtype=np.uint64,
            )
            probe_vals = words.view(np.uint8).reshape(1, 16)
    else:
        np_dt = {Kind.INT64: np.int64, Kind.INT32: np.int32,
                 Kind.DOUBLE: np.float64, Kind.FLOAT: np.float32}[kind]
        probe_vals = np.array([value], dtype=np_dt)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def probe(blooms: pd.Series) -> pd.Series:
        out = []
        for b in blooms:  # manifest rows only — metadata scale
            if b is None:
                out.append(True)  # no bloom recorded → cannot prune
            else:
                out.append(bool(
                    bloomlib.might_contain(bytes(b), probe_vals, kind)[0]
                ))
        return pd.Series(out)

    m = manifest(spark, out_path).where(
        (F.col("column") == column) & (F.col("stream") == "values")
    )
    chunk_ids = m.where(probe(F.col("bloom"))).select("chunk_id").distinct()
    blobs = spark.read.parquet(out_path).join(
        F.broadcast(chunk_ids), "chunk_id", "left_semi"
    )
    cols = _read_schema_sidecar(out_path)
    if columns_subset is not None:
        keep = set(columns_subset) | {column}
        cols = [(c, t) for c, t in cols if c in keep]
        blobs = blobs.where(F.col("column").isin([c for c, _ in cols]))
    out = _decode_blobs(blobs, cols)
    if elem is not None:
        return out.where(F.array_contains(F.col(column), F.lit(value)))
    return out.where(F.col(column) == F.lit(value))


def _stat_expr(spark_type: str, col):
    """Parse a manifest min/max string back to a comparable value.

    Integer-family stats cast to bigint (NOT double: above 2^53 a double
    cast rounds and can silently prune a chunk containing the probed
    key). String stats are latin-1-decoded raw bytes; re-encoding with
    ISO-8859-1 recovers the exact bytes so the comparison happens in
    byte space — the reference compares truncated byte bounds the same
    way (column_index.go:499-533), never via re-encoded text."""
    if spark_type in ("int", "bigint", "timestamp", "timestamp_ntz", "date"):
        return col.cast("bigint")  # repr(int) parses losslessly as bigint
    if _decimal_info(spark_type) is not None:
        return col.cast("decimal(38,0)")  # unscaled ints, up to int128
    if spark_type in ("float", "double"):
        return col.cast("double")
    return F.encode(col, "ISO-8859-1")  # raw bound bytes, unsigned compare


def _probe_expr(spark_type: str, value):
    """A probe literal comparable against _stat_expr's output."""
    if value is None:
        return None
    if spark_type in ("string", "binary"):
        b = value.encode("utf-8") if isinstance(value, str) else bytes(value)
        return F.lit(b)  # binary literal: byte-space comparison
    if spark_type in ("int", "bigint", "timestamp", "timestamp_ntz", "date"):
        return F.lit(int(value)).cast("bigint")
    dp = _decimal_info(spark_type)
    if dp is not None:
        # stats hold UNSCALED ints; scale the user's probe to match.
        # Inexact literals (more fractional digits than the scale) have
        # no unscaled representation → None = unbounded, never prune.
        unscaled = _unscaled(value, dp[1])
        if unscaled is None:
            return None
        return F.lit(str(unscaled)).cast("decimal(38,0)")
    return F.lit(value).cast("double")


def pruned_decode(
    spark: SparkSession,
    out_path: str,
    column: str,
    lo=None,
    hi=None,
    columns_subset: list[str] | None = None,
) -> DataFrame:
    """Decode only chunks whose [min_val, max_val] intersects [lo, hi],
    then apply the exact row filter — the Spark analog of page skipping
    via the column index (search.go:6-95, column_index.go)."""
    columns = dict(_read_schema_sidecar(out_path))
    spark_type = columns[column]
    m = manifest(spark, out_path).where(
        (F.col("column") == column) & (F.col("stream") == "values")
    )
    mn = _stat_expr(spark_type, F.col("min_val"))
    mx = _stat_expr(spark_type, F.col("max_val"))
    # NULL bounds mean "unbounded", never "prunable": _truncate_max
    # returns None for an all-0xFF prefix, and boolean/empty chunks
    # record no stats at all — such chunks must always be kept.
    p_lo = _probe_expr(spark_type, lo)  # None = not comparable, keep
    p_hi = _probe_expr(spark_type, hi)
    keep_lo = (
        F.lit(True) if p_lo is None
        else (F.col("max_val").isNull() | (mx >= p_lo))
    )
    keep_hi = (
        F.lit(True) if p_hi is None
        else (F.col("min_val").isNull() | (mn <= p_hi))
    )
    chunk_ids = m.where(keep_lo & keep_hi).select("chunk_id").distinct()

    blobs = spark.read.parquet(out_path).join(
        F.broadcast(chunk_ids), "chunk_id", "left_semi"
    )
    cols = _read_schema_sidecar(out_path)
    if columns_subset is not None:
        keep = set(columns_subset) | {column}
        cols = [(c, t) for c, t in cols if c in keep]
        blobs = blobs.where(F.col("column").isin([c for c, _ in cols]))
    out = _decode_blobs(blobs, cols)
    c = F.col(column)
    if lo is not None:
        out = out.where(c >= F.lit(lo))
    if hi is not None:
        out = out.where(c <= F.lit(hi))
    return out


def _fill_expr(typ: str):
    """Fill expression for a column absent from a source table during
    schema-unifying compaction (the convert.go null-fill rule), made
    representable under the encode null contract at every nesting
    level: scalars null-fill; list/map columns fill with EMPTY
    containers; struct columns fill with a struct of per-field
    recursive fills (a struct-typed field is itself non-null)."""
    if _list_elem(typ) is not None:
        return F.array().cast(typ)
    if _map_kv(typ) is not None:
        return F.create_map().cast(typ)
    sf = _struct_fields(typ)
    if sf is not None:
        return F.struct(*[_fill_expr(ft).alias(fn) for fn, ft in sf])
    return F.lit(None).cast(typ)


def compact_tables(
    spark: SparkSession,
    in_paths: list[str],
    out_path: str,
    *,
    repo_col: str = "repo",
    salt_cols: list[str] | None = None,
    sort_cols: list[str] | None = None,
    min_chunk_bytes: int = 1 << 20,
    target_chunk_bytes: int = TARGET_CHUNK_BYTES,
) -> dict:
    """Merge several blobs tables into one — the MergeRowGroups analog
    (/root/reference/merge.go:25-125). Chunks at or above min_chunk_bytes
    are spliced VERBATIM (blob bytes copied without decode — the
    writer_copy.go:14-60 fast path); undersized chunks are decoded,
    regrouped, and re-encoded into full-size chunks.

    Schemas need not be identical: like the reference's MergeNodes +
    Convert (merge.go:25, convert.go:370), inputs are unified to the
    ordered union of their columns. Tables already matching the union
    schema keep the verbatim fast path; tables missing columns are
    decoded, null-filled to the union, and re-encoded (a column absent
    from a source table decodes as NULL — the convert.go null-fill
    rule). A shared column name with two different types is an error."""
    # in-place compaction would overwrite input blobs that the lazy
    # 'big'/'small_rows' plans still need to read — refuse loudly
    out_real = os.path.realpath(out_path)
    for pth in in_paths:
        if os.path.realpath(pth) == out_real:
            raise ValueError(
                f"compact_tables: out_path {out_path!r} is also an input; "
                "write to a fresh directory and move afterwards"
            )
    schemas = [_read_schema_sidecar(pth) for pth in in_paths]
    union: list[tuple[str, str]] = []
    seen: dict[str, str] = {}
    for sc in schemas:
        for name, typ in sc:
            if name in seen:
                if seen[name] != typ:
                    raise ValueError(
                        f"compact_tables: column {name!r} has conflicting "
                        f"types {seen[name]!r} vs {typ!r}"
                    )
            else:
                seen[name] = typ
                union.append((name, typ))
    cols = union

    verbatim_parts = []
    convert_dfs = []
    for i, pth in enumerate(in_paths):
        if schemas[i] == union:
            verbatim_parts.append(
                spark.read.parquet(pth).withColumn(
                    "chunk_id", F.concat(F.lit(f"t{i}:"), F.col("chunk_id"))
                )
            )
        else:
            d = decode_table(spark, pth)
            have = {c for c, _ in schemas[i]}
            for name, typ in union:
                if name not in have:
                    d = d.withColumn(name, _fill_expr(typ))
            convert_dfs.append(d.select([c for c, _ in union]))

    n_small = 0
    if verbatim_parts:
        blobs = verbatim_parts[0]
        for pdf in verbatim_parts[1:]:
            blobs = blobs.unionByName(pdf)
        sizes = blobs.groupBy("chunk_id").agg(F.sum("raw_bytes").alias("b"))
        small_ids = sizes.where(F.col("b") < min_chunk_bytes).select("chunk_id")
        big = blobs.join(F.broadcast(small_ids), "chunk_id", "left_anti")
        big.write.mode("overwrite").parquet(out_path)
        _write_schema_sidecar(out_path, cols)
        n_small = small_ids.count()
        if n_small:
            convert_dfs.append(_decode_blobs(
                blobs.join(F.broadcast(small_ids), "chunk_id", "left_semi"),
                cols,
            ))
    else:
        os.makedirs(out_path, exist_ok=True)
        _write_schema_sidecar(out_path, cols)

    if convert_dfs:
        rows = convert_dfs[0]
        for d in convert_dfs[1:]:
            rows = rows.unionByName(d)
        encode_table(
            spark, rows, out_path,
            repo_col=repo_col, salt_cols=salt_cols, sort_cols=sort_cols,
            target_chunk_bytes=target_chunk_bytes, resume=False,
            chunk_suffix="@compact",
        )
    m = manifest(spark, out_path)
    return {
        "chunks": m.select("chunk_id").distinct().count(),
        "merged_small_chunks": n_small,
        "converted_tables": len(convert_dfs) - (1 if n_small else 0),
    }


def verify_roundtrip(spark: SparkSession, source: DataFrame, out_path: str,
                     content_col: str = "content") -> dict:
    """Per-row sha256 invariant (BASELINE.json input_hint): the decoded
    table must contain exactly the same multiset of row hashes."""
    cols = [c for c, _ in source.dtypes]
    decoded = decode_table(spark, out_path)
    h = lambda df: df.select(  # noqa: E731
        F.sha2(
            F.concat_ws(
                "\x1f",
                *[F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
                  for c in cols],
            ),
            256,
        ).alias("h")
    )
    src = h(source).groupBy("h").count()
    dec = h(decoded).groupBy("h").count()
    diff = src.join(dec, "h", "full_outer").where(
        F.coalesce(src["count"], F.lit(0)) != F.coalesce(dec["count"], F.lit(0))
    )
    n_src = source.count()
    n_dec = decoded.count()
    n_bad = diff.count()
    return {"rows_source": n_src, "rows_decoded": n_dec, "hash_mismatches": n_bad,
            "ok": n_src == n_dec and n_bad == 0}
