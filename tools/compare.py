#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfdir> <verify_outdir> [query ...]
Registers each parquet table from sfdir, runs oracle_sql.json entries,
and compares against the Spark parquet dumps (columns sorted by name,
rows sorted, values hashed) — same spirit as CORRECTNESS_r{N}.json.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

def canon(df):
    # STRICT driver-canon replica (tools/check_correctness.py): values
    # stringified verbatim, so a dtype drift (e.g. DuckDB `//` returning
    # DOUBLE -> "226333.0" vs BIGINT "226333") FAILS here exactly as it
    # would at the round gate. No astype coercion anywhere.
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notnull(df), None)
    for c in df.columns:
        df[c] = df[c].map(lambda v: f"{v}")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def h(df):
    return hashlib.md5(df.to_csv(index=False, float_format="%.9g").encode()).hexdigest()

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        # Spark-style directory datasets (e.g. the ScaleUp sf1 replica)
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for q, sql in sorted(oracles.items()):
        if only and q not in only:
            continue
        spark_dir = f"{outdir}/{q}"
        if not os.path.isdir(spark_dir):
            print(f"{q:28s} MISSING spark output"); n_fail += 1; continue
        try:
            sdf = canon(pd.read_parquet(spark_dir))
            odf = canon(con.sql(sql).df())
        except Exception as e:
            print(f"{q:28s} ERROR {str(e)[:160]}"); n_fail += 1; continue
        rows = len(sdf) == len(odf)
        schema = list(sdf.columns) == list(odf.columns)
        odf2 = odf
        hmatch = rows and schema and h(sdf) == h(odf2)
        ok = rows and schema and hmatch
        n_pass += ok; n_fail += (not ok)
        mark = "PASS" if ok else "FAIL"
        print(f"{q:28s} {mark} rows={len(sdf)}/{len(odf)} schema={schema} hash={hmatch}")
        if not ok and rows and schema:
            neq = (sdf != odf2).any(axis=1)
            print(sdf[neq].head(3)); print(odf2[neq].head(3))
    print(f"== {n_pass} pass, {n_fail} fail ==")

if __name__ == "__main__":
    main()
