"""Mimic the driver's correctness gate: Spark queries vs DuckDB oracles.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
Compares row counts, column names, and order-insensitive values.  With
query names given, only those queries run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if isinstance(v, float):
                canon_row.append(round(v, 6))
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(rows, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from csd363_sin_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    failures = 0
    for name, fn in qs.items():
        got_df = fn(spark, sf_dir).toPandas()
        if name not in osql:
            print(f"{name:40s} rows-only: {len(got_df)} rows")
            continue
        exp_df = con.execute(osql[name]).fetchdf()
        ok_cols = sorted(got_df.columns) == sorted(exp_df.columns)
        ok_rows = len(got_df) == len(exp_df)
        ok_vals = ok_cols and ok_rows and canon(got_df) == canon(exp_df)
        # the driver hashes TYPED values: an int64 Spark column vs a DuckDB
        # HUGEINT (-> float64 in pandas) mismatches even when values agree.
        # Compare dtype *kinds* (int/float/bool/object) per column to catch it.
        ok_types = ok_cols and all(
            got_df[c].dtype.kind == exp_df[c].dtype.kind for c in got_df.columns
        )
        status = "OK" if ok_vals and ok_types else "MISMATCH"
        if not (ok_vals and ok_types):
            failures += 1
        if ok_vals and not ok_types:
            bad = [
                (c, str(got_df[c].dtype), str(exp_df[c].dtype))
                for c in got_df.columns
                if got_df[c].dtype.kind != exp_df[c].dtype.kind
            ]
            print(f"{name:40s} TYPE-MISMATCH {bad}")
        print(
            f"{name:40s} {status}  spark={len(got_df)} oracle={len(exp_df)} "
            f"cols_ok={ok_cols}"
        )
        if not ok_vals and ok_cols and ok_rows:
            g, x = canon(got_df), canon(exp_df)
            diffs = [(a, b) for a, b in zip(g, x) if a != b][:3]
            for a, b in diffs:
                print(f"   spark={a}\n   oracle={b}")
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
