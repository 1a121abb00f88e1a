#!/usr/bin/env python3
"""Emulate the driver's pandas-path correctness compare (the one that
canonicalizes Spark parquet Decimals as Decimal('x.00') while DuckDB results
arrive float64 — the round-1 hash-fail root cause).

Spark side: pandas.read_parquet on Verify's dump.
Oracle side: duckdb .df() on the same oracle SQL.
Compare: sort columns by name, sort rows by all columns, str()-hash cells.

Usage: python3 tools/check_oracle_pandas.py [outDir] [sfDir] [maxOracleRows]

maxOracleRows (optional): on derived big tiers, outputs larger than this
are checked rows-only instead of value-for-value (same contract as
check_oracle.py — hashing a 60 M-row result proves nothing the standard
tiers don't, and takes minutes per query).
Dev tooling only — not part of the shipped Scala library.
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
max_oracle_rows = int(sys.argv[3]) if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
import os
for t in TABLES:
    path = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(path):  # Spark directory-style parquet (derived tiers)
        path += "/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def df_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for _, row in df.iterrows():
        h.update("|".join(str(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()


n_pass = n_fail = n_big = 0
for name in sorted(oracle):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    if max_oracle_rows is not None:
        n = sum(len(pd.read_parquet(f)) for f in files)
        if n > max_oracle_rows:
            print(f"BIG  {name}: {n} rows > cap, rows-only {'OK' if n > 0 else 'EMPTY!'}")
            n_big += 1
            continue
    try:
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        want = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"ERR  {name}: {type(e).__name__}: {e}")
        n_fail += 1
        continue
    problems = []
    if list(got.columns) != list(want.columns):
        problems.append(f"cols {list(got.columns)} vs {list(want.columns)}")
    elif len(got) != len(want):
        problems.append(f"rows {len(got)} vs {len(want)}")
    elif df_hash(got) != df_hash(want):
        problems.append("hash mismatch")
        for i in range(len(got)):
            g = [str(v) for v in got.iloc[i]]
            w = [str(v) for v in want.iloc[i]]
            if g != w:
                problems.append(f"first diff row {i}: {g} vs {w}")
                break
    if problems:
        print(f"FAIL {name}: " + "; ".join(problems))
        n_fail += 1
    else:
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1

declared = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{out_dir}/*/")}
rows_only = declared - set(oracle)
for name in sorted(rows_only):
    n = len(pd.concat([pd.read_parquet(f)
                       for f in glob.glob(f"{out_dir}/{name}/*.parquet")]))
    print(f"ROWS-ONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")

print(f"\n{n_pass} pass / {n_fail} fail / {len(rows_only)} rows-only" +
      (f" / {n_big} over-cap (rows-only)" if max_oracle_rows is not None else ""))
sys.exit(1 if n_fail else 0)
