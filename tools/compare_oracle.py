#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a view named after the table, runs every
oracle_sql.json entry, and compares against the Spark parquet dump: columns
sorted by name, rows sorted, values hashed (floats rounded via repr).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output"); n_bad += 1; continue
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        try:
            duck_df = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); n_bad += 1; continue
        ok_schema = list(spark_df.columns) == list(duck_df.columns)
        ok_rows = len(spark_df) == len(duck_df)
        ok_vals = False
        if ok_schema and ok_rows:
            try:
                pd.testing.assert_frame_equal(
                    spark_df, duck_df, check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).split("\n")[0:6]
                print(f"{name}: VALUE MISMATCH: {' | '.join(msg)}")
        status = "OK" if (ok_schema and ok_rows and ok_vals) else \
            f"FAIL schema={ok_schema} rows={ok_rows}({len(spark_df)}/{len(duck_df)}) vals={ok_vals}"
        if not (ok_schema and ok_rows and ok_vals):
            n_bad += 1
            if not ok_schema:
                print(f"  spark cols={list(spark_df.columns)} duck cols={list(duck_df.columns)}")
        print(f"{name}: {status}")
    return n_bad

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
