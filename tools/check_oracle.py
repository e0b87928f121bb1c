#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB (tables = parquet
views named after the files in sfDir), and compares: row count, sorted
column names, and values (rows sorted, columns sorted by name).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string via repr with float rounding
    def norm(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)
    out = df.applymap(norm)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in sorted(glob.glob(res_dir + "/*.parquet"))],
                ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); n_fail += 1; continue
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"FAIL {name}: value mismatch on {diff.sum()} rows; first:")
            idx = diff[diff].index[:3]
            for i in idx:
                print(f"  spark: {a.loc[i].to_dict()}")
                print(f"  duck : {b.loc[i].to_dict()}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(a)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
