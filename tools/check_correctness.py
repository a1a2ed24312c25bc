#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in <outDir>, executes the corresponding
oracle SQL (oracle_sql.json) in DuckDB against the same source tables,
then compares row count, column names, and an order-insensitive value
hash (columns sorted by name, rows sorted by all columns, values
stringified). Usage:

    python3 tools/check_correctness.py <sfDir> <outDir>
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notnull(df), None)
    for c in df.columns:
        df[c] = df[c].map(lambda v: f"{v}")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        if name not in oracles:
            n_skip += 1
            print(f"SKIP  {name} (no oracle; rows-only)")
            continue
        try:
            got = canon(pd.read_parquet(qdir))
            want = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL  {name}: exception {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
        elif not got.equals(want):
            diff = (got != want).any(axis=1)
            print(f"FAIL  {name}: {int(diff.sum())} differing rows; first:")
            print("  spark:", got[diff].head(2).to_dict("records"))
            print("  duck :", want[diff].head(2).to_dict("records"))
            n_fail += 1
        else:
            n_pass += 1
            print(f"PASS  {name} ({len(got)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
