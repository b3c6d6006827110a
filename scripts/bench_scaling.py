"""Scaling-efficiency evidence: the same encode job at local[8] and
local[32] on identical input (the sandbox proxy for N vs 4N executors —
BASELINE.json north_rule; no real cluster here).

Each run is a separate process (a JVM's master is fixed at startup).
Prints a JSON summary and a markdown table ready for BASELINE.md.

Usage: python scripts/bench_scaling.py [rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, rows: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_ENCODE_ONLY="1",
        BENCH_ENCODE_ROWS=str(rows),
        BENCH_ENCODE_REPS="1",  # scaling inputs are GB-scale; one sample
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    r8 = run(n, rows)
    r32 = run(4 * n, rows)
    speedup = r8["encode_sec"] / r32["encode_sec"]
    eff = speedup / 4
    summary = {
        "rows": rows,
        "raw_gb": round(r8["encode_raw_bytes"] / 1e9, 3),
        "cores_n": n, "cores_4n": 4 * n,
        "t8_sec": r8["encode_sec"],
        "t32_sec": r32["encode_sec"],
        "gbps_8": r8["encode_gbps"],
        "gbps_32": r32["encode_gbps"],
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "decode_t8": r8["decode_sec"],
        "decode_t32": r32["decode_sec"],
        "decode_speedup": round(r8["decode_sec"] / r32["decode_sec"], 3),
        "ratio": r8["encode_ratio"],
    }
    print(json.dumps(summary))
    print()
    print("| cores | encode sec | encode GB/s | decode sec |")
    print("|---|---|---|---|")
    print(f"| local[{n}] | {r8['encode_sec']} | {r8['encode_gbps']} | {r8['decode_sec']} |")
    print(f"| local[{4*n}] | {r32['encode_sec']} | {r32['encode_gbps']} | {r32['decode_sec']} |")
    print(f"\nspeedup N→4N: {speedup:.2f}x; scaling efficiency (÷4): {eff:.3f}")


if __name__ == "__main__":
    main()
