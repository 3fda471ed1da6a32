#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
<verifyOutDir>/oracle_sql.json in DuckDB with views over <sfDir>/*.parquet,
and compares row counts, sorted-column names, and a canonicalized value hash
(columns sorted by name, rows sorted, floats rounded to 6 significant-ish
decimals).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))],
            ignore_index=True)
        if name not in oracle:
            print(f"[rows-only] {name}: rows={len(spark_df)}")
            continue
        duck_df = con.execute(oracle[name]).df()
        a, b = canon(spark_df), canon(duck_df)
        ok_cols = list(a.columns) == list(b.columns)
        ok_rows = len(a) == len(b)
        ok_vals = ok_cols and ok_rows and a.equals(b)
        status = "PASS" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(f"[{status}] {name}: spark_rows={len(a)} duck_rows={len(b)} cols_match={ok_cols} vals_match={ok_vals}")
        if status == "FAIL":
            print("  spark cols:", list(a.columns))
            print("  duck  cols:", list(b.columns))
            if ok_cols and ok_rows:
                neq = ~(a.eq(b) | (a.isna() & b.isna()))
                bad = neq.any(axis=1)
                print("  first diffs (spark vs duck):")
                print(pd.concat([a[bad].head(3), b[bad].head(3)], keys=["spark", "duck"]).to_string())
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
