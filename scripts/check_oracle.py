"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf_dir and compares
against oracle_sql() via DuckDB: row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted,
values canonicalized to strings).

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import glob
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object and len(s) and isinstance(s.iloc[0], (bytes, bytearray)):
            df[c] = s.map(lambda b: b.hex())
        elif str(s.dtype).startswith("float"):
            df[c] = s.map(lambda x: repr(float(x)))
        elif str(s.dtype).startswith("datetime"):
            df[c] = s.astype(str)
        else:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.log.level", "ERROR")
        .getOrCreate()
    )

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = f.split("/")[-1].replace(".parquet", "")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(spd)} rows  [{dt:.1f}s]")
            n_pass += 1
            continue
        try:
            opd = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        if len(spd) != len(opd):
            print(f"FAIL {name}: rows {len(spd)} vs {len(opd)}  [{dt:.1f}s]")
            n_fail += 1
            continue
        if sorted(spd.columns) != sorted(opd.columns):
            print(f"FAIL {name}: cols {sorted(spd.columns)} vs {sorted(opd.columns)}")
            n_fail += 1
            continue
        cs, co = canon(spd), canon(opd)
        if cs.equals(co):
            print(f"ok   {name}: {len(spd)} rows match  [{dt:.1f}s]")
            n_pass += 1
        else:
            neq = (cs != co).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(cs)} rows differ  [{dt:.1f}s]")
            bad = neq[neq].index[:3]
            for i in bad:
                print("  spark :", cs.loc[i].to_dict())
                print("  oracle:", co.loc[i].to_dict())
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
