#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate: run graft.Verify output against
DuckDB oracle SQL and compare per-query (rows / schema-names / value hash).

Usage: python3 tools/check_oracle.py [outDir] [sfDir] [maxOracleRows]
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)

maxOracleRows (optional): on derived big tiers, outputs larger than this
are checked rows-only instead of value-for-value — running a 60 M-row
oracle query through DuckDB and hashing both sides proves nothing the
standard tiers' hash checks don't, and takes minutes per query.

Dev tooling only — not part of the shipped Scala library.
"""
import sys, json, glob, hashlib
import duckdb

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

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in rows:
        h.update("|".join(norm_cell(row[i]) for i in order).encode())
        h.update(b"\n")
    return h.hexdigest()

n_pass = n_fail = n_big = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    if max_oracle_rows is not None:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
        if n > max_oracle_rows:
            print(f"BIG  {name}: {n} rows > cap, rows-only {'OK' if n > 0 else 'EMPTY!'}")
            n_big += 1
            continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
        got_cols = [d[0] for d in con.description]
        want = con.execute(oracle[name]).fetchall()
        want_cols = [d[0] for d in con.description]
    except Exception as e:
        print(f"FAIL {name}: {e}")
        n_fail += 1
        continue
    problems = []
    if sorted(got_cols) != sorted(want_cols):
        problems.append(f"cols {sorted(got_cols)} vs {sorted(want_cols)}")
    if len(got) != len(want):
        problems.append(f"rows {len(got)} vs {len(want)}")
    if not problems and table_hash(got, got_cols) != table_hash(want, want_cols):
        problems.append("hash mismatch")
        for i, (g, w) in enumerate(zip(got, want)):
            go = [g[got_cols.index(c)] for c in sorted(got_cols)]
            wo = [w[want_cols.index(c)] for c in sorted(want_cols)]
            if [norm_cell(x) for x in go] != [norm_cell(x) for x in wo]:
                problems.append(f"first diff row {i}: {go} vs {wo}")
                break
    if problems:
        print(f"FAIL {name}: " + "; ".join(problems))
        n_fail += 1
    else:
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1

declared = set()
for d in glob.glob(f"{out_dir}/*/"):
    declared.add(d.rstrip("/").split("/")[-1])
rows_only = declared - set(oracle)
for name in sorted(rows_only):
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
    print(f"ROWS-ONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")

print(f"\n{n_pass} pass / {n_fail} fail / {len(rows_only)} rows-only" +
      (f" / {n_big} over-cap (rows-only)" if max_oracle_rows is not None else ""))
sys.exit(1 if n_fail else 0)
