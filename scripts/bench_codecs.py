"""Per-codec micro-benchmark — the BenchmarkEncode/BenchmarkDecode analog
(/root/reference/encoding/encoding_test.go:604-658, 762-808): every codec
x kind over seeded data shaped like the reference's generators
(ints uniform [0,100), floats [0,1), byte arrays len 1..21, plus a
code-like text column for FSST), reporting MB/s each way.

Usage: python scripts/bench_codecs.py [n_values]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from parquet_go_spark.codecs import chunk as chunklib
from parquet_go_spark.codecs.bytearrays import ByteArrays
from parquet_go_spark.codecs.kinds import Codec, Kind

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
rng = np.random.default_rng(1)

ints32 = rng.integers(0, 100, N).astype(np.int32)
ints64 = rng.integers(0, 100, N).astype(np.int64)
doubles = rng.random(N)
floats = doubles.astype(np.float32)
bools = rng.random(N) > 0.5

lens = rng.integers(1, 22, N)
data = rng.integers(32, 127, int(lens.sum())).astype(np.uint8)
offsets = np.zeros(N + 1, dtype=np.int64)
offsets[1:] = np.cumsum(lens)
short_ba = ByteArrays(data, offsets)

from parquet_go_spark.sources.repogen import generate_batch

code_ba = ByteArrays.from_arrow(
    generate_batch(np.arange(N // 40), seed=42, n_repos=100).column(4)
)

CASES = [
    ("PLAIN/int64", ints64, Kind.INT64, Codec.PLAIN, {}),
    ("PLAIN/double", doubles, Kind.DOUBLE, Codec.PLAIN, {}),
    ("PLAIN/byte_array", short_ba, Kind.BYTE_ARRAY, Codec.PLAIN, {}),
    ("PLAIN/boolean", bools, Kind.BOOLEAN, Codec.PLAIN, {}),
    ("RLE/boolean", bools, Kind.BOOLEAN, Codec.RLE, {}),
    ("RLE/int32", ints32, Kind.INT32, Codec.RLE, {}),
    ("RLE_DICT/int64", ints64, Kind.INT64, Codec.PLAIN, {"dict_wrap": True}),
    ("RLE_DICT/byte_array", short_ba, Kind.BYTE_ARRAY,
     Codec.DELTA_LENGTH_BYTE_ARRAY, {"dict_wrap": True}),
    ("DELTA_BP/int32", ints32, Kind.INT32, Codec.DELTA_BINARY_PACKED, {}),
    ("DELTA_BP/int64", ints64, Kind.INT64, Codec.DELTA_BINARY_PACKED, {}),
    ("DELTA_LENGTH/byte_array", short_ba, Kind.BYTE_ARRAY,
     Codec.DELTA_LENGTH_BYTE_ARRAY, {}),
    ("DELTA_BYTE_ARRAY/byte_array", short_ba, Kind.BYTE_ARRAY,
     Codec.DELTA_BYTE_ARRAY, {}),
    ("BYTE_STREAM_SPLIT/float", floats, Kind.FLOAT, Codec.BYTE_STREAM_SPLIT, {}),
    ("BYTE_STREAM_SPLIT/double", doubles, Kind.DOUBLE, Codec.BYTE_STREAM_SPLIT, {}),
    ("FSST/code_text", code_ba, Kind.BYTE_ARRAY, Codec.FSST, {}),
]


def raw_mb(values, kind):
    if kind == Kind.BYTE_ARRAY:
        return int(values.offsets[-1]) / 1e6
    return np.asarray(values).nbytes / 1e6


def main() -> None:
    results = {}
    print(f"| codec/kind | n | raw MB | enc MB/s | dec MB/s | ratio |")
    print("|---|---|---|---|---|---|")
    for name, values, kind, codec, kw in CASES:
        mb = raw_mb(values, kind)
        best_e = best_d = float("inf")
        blob = None
        for _ in range(3):
            t0 = time.time()
            blob = chunklib.encode_chunk(values, kind, codec, **kw)
            best_e = min(best_e, time.time() - t0)
            t0 = time.time()
            dec, _ = chunklib.decode_chunk(blob)
            best_d = min(best_d, time.time() - t0)
        if kind == Kind.BYTE_ARRAY:
            assert dec == values
        else:
            assert np.array_equal(np.asarray(dec), np.asarray(values))
        ratio = mb * 1e6 / len(blob)
        results[name] = {
            "enc_mbps": round(mb / best_e, 1),
            "dec_mbps": round(mb / best_d, 1),
            "ratio": round(ratio, 2),
        }
        print(f"| {name} | {len(values)} | {mb:.1f} | {mb/best_e:.1f} "
              f"| {mb/best_d:.1f} | {ratio:.2f} |")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
