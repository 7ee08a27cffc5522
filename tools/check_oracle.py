#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir parquet
tables, and compares row count, column names/dtypes, and values (columns
sorted by name, rows sorted by all columns) — strictest plausible reading of
"row/schema/hash match".
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
# a SPARK_GRAFT_ONLY-filtered Verify run marks its outDir: queries
# outside the filter keep stale parquet from earlier runs, so a
# full-suite compare here would false-green on them (r10 ADVICE)
if os.path.exists(f"{out_dir}/_PARTIAL"):
    sys.exit(f"REFUSE: {out_dir} is a partial dump (SPARK_GRAFT_ONLY="
             + open(f"{out_dir}/_PARTIAL").read().strip().replace("\n", ",")
             + "); compare those queries directly or re-run Verify unfiltered")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def canon(df):
    # columns sorted by name; rows kept in QUERY order — every query carries
    # a total ORDER BY, so row-order-exact equality must hold (strictest
    # possible reading of the driver's hash compare)
    df = df[sorted(df.columns)]
    for c in df.columns:  # normalize datetime resolution (ns vs us metadata)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)

fails, passes = [], []
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    got = canon(pd.concat([pd.read_parquet(f) for f in files]))
    try:
        exp = canon(con.sql(oracle[name]).df())
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}")); continue
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns: spark={list(got.columns)} duck={list(exp.columns)}")); continue
    if [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
        fails.append((name, f"dtypes: spark={dict(got.dtypes.astype(str))} duck={dict(exp.dtypes.astype(str))}"))
        # keep going to also check values
    if len(got) != len(exp):
        fails.append((name, f"rows: spark={len(got)} duck={len(exp)}")); continue
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
        passes.append(name)
    except AssertionError as e:
        fails.append((name, "values differ: " + str(e).split("\n")[-2][:200]))

print(f"PASS {len(passes)}/{len(oracle)}: {' '.join(passes)}")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
sys.exit(1 if fails else 0)
