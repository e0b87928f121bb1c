#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<q>/ parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json[q] in DuckDB over the sfDir tables,
then compares row count, sorted-by-name schema, and a value hash the
same way the driver does.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        for v in row:
            if isinstance(v, float):
                v = round(v, 6)
            h.update(repr(v).encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    import os
    for t in TABLES:
        # tolerate partially generated sfDirs: a missing table only
        # breaks the queries that reference it, not the whole run
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    if not names:
        names = sorted(oracle)
    failed = []
    for q in names:
        # one broken query must record FAIL and keep going — aborting
        # the loop hides every remaining result
        try:
            spark = pd.read_parquet(f"{out_dir}/{q}")
        except Exception as e:
            print(f"{q}: FAIL spark-read error: {e}")
            failed.append(q)
            continue
        if q not in oracle:
            print(f"{q}: rows-only, spark_rows={len(spark)}")
            continue
        try:
            ora = con.sql(oracle[q]).df()
        except Exception as e:
            print(f"{q}: FAIL oracle error: {e}")
            failed.append(q)
            continue
        s, o = norm(spark), norm(ora)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        # STRICT: hash the oracle frame exactly as pandas materialized
        # it from DuckDB — the driver does the same, so any dtype drift
        # (e.g. HUGEINT -> float64 from an un-CAST sum(BIGINT)) must
        # fail HERE, not only on the driver.
        hmatch = schema and rows and value_hash(s) == value_hash(o)
        dtype_only = False
        if schema and rows and not hmatch:
            # diagnose: would the old lenient coercion have passed?
            try:
                o2 = o.astype({c: s[c].dtype for c in s.columns})
                dtype_only = value_hash(s) == value_hash(o2)
            except Exception:
                pass
        o2 = o
        status = "OK" if (rows and schema and hmatch) else "FAIL"
        if dtype_only:
            print(f"{q}: DTYPE-ONLY mismatch — values equal after "
                  f"coercion; CAST the oracle's final select "
                  f"(driver would fail this). oracle dtypes: "
                  f"{dict(o.dtypes.astype(str))} spark dtypes: "
                  f"{dict(s.dtypes.astype(str))}")
        print(f"{q}: {status} rows={rows}({len(s)}/{len(o)}) "
              f"schema={schema} hash={hmatch}")
        if status == "FAIL":
            failed.append(q)
            print("  spark cols:", list(s.columns))
            print("  oracle cols:", list(o.columns))
            print("  spark head:\n", s.head(5))
            print("  oracle head:\n", o2.head(5))
            both = s.merge(o2, how="outer", indicator=True)
            diff = both[both["_merge"] != "both"]
            print("  diff rows:\n", diff.head(10))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
