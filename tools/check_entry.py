"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the given sf dir, compare row
count, schema (column names), and values (columns sorted by name, rows
sorted).  Usage: python tools/check_entry.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from strucmotif_search_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"schema: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"rows: spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = normalize(spark_df), normalize(oracle_df)
    if len(a) == len(b):
        for c in a.columns:
            if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                import numpy as np

                av = a[c].astype(float).to_numpy()
                bv = b[c].astype(float).to_numpy()
                bad = ~(
                    (av == bv)
                    | (pd.isna(av) & pd.isna(bv))
                )
                if bad.any():
                    i = int(bad.argmax())
                    problems.append(
                        f"col {c}: {int(bad.sum())} mismatches, first at row {i}: "
                        f"{av[i]!r} vs {bv[i]!r}"
                    )
            else:
                neq = (a[c] != b[c]).to_numpy()
                if neq.any():
                    i = int(neq.argmax())
                    problems.append(
                        f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                        f"{a[c].iloc[i]!r} vs {b[c].iloc[i]!r}"
                    )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("check-entry", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures.append(name)
            print(f"FAIL {name} ({len(sdf)} vs {len(odf)} rows):")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
