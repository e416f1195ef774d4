#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load Spark's parquet result, run the
oracle SQL from oracle_sql.json in DuckDB over views of sfDir's tables, then
compare schema-insensitively: columns sorted by name, rows sorted, values
compared exactly (floats bit-for-bit; int widths ignored; naive/aware
timestamp mismatch reported).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                if getattr(df[c].dt, "tz", None) is not None:
                    df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            except Exception:
                pass
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        spark_df = pq.read_table(qdir).to_pandas()
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(spark_df)}"
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR {e}"
            continue
        a, b = norm(spark_df.copy()), norm(duck_df.copy())
        if list(a.columns) != list(b.columns):
            results[name] = f"COLS-MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWS-MISMATCH spark={len(a)} duck={len(b)}"
            continue
        bad = []
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
                eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
            else:
                eq = (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).values
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append(f"{c}[row{i}]: spark={av[i]!r} duck={bv[i]!r}")
        results[name] = "OK rows=%d" % len(a) if not bad else "VAL-MISMATCH " + "; ".join(bad[:3])
    width = max(len(k) for k in results) if results else 0
    nok = 0
    for k in sorted(results):
        ok = results[k].startswith("OK") or results[k].startswith("NO-ORACLE")
        nok += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'}  {k:<{width}}  {results[k]}")
    print(f"== {len(results)} queries, {nok} failing")
    sys.exit(1 if nok else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
