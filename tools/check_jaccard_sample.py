#!/usr/bin/env python3
"""Bounded row-sample value check for q_jaccard_pairs on tiers where the
full DuckDB oracle (a quadratic block self-join) times out.

The engine's output is ≤50 (id_a, id_b, jaccard) rows; for exactly those
pairs, the per-pair jaccard is recomputed in DuckDB from the tier's own
documents table (linear in the named docs, not quadratic in the corpus)
and compared value-for-value. This validates every emitted similarity;
top-50 completeness is covered by the hash gate at the oracle-feasible
tiers (same plan, same tie-break).

Usage: check_jaccard_sample.py <engine_out_dir> <sfDir>
  engine_out_dir: the SweepTier/Verify dump dir containing q_jaccard_pairs
"""
import glob
import sys

import duckdb

out_dir, sf = sys.argv[1], sys.argv[2]
con = duckdb.connect()

spark_files = glob.glob(f"{out_dir}/q_jaccard_pairs/*.parquet") or [
    f"{out_dir}/q_jaccard_pairs"
]
rows = con.execute(
    f"SELECT id_a, id_b, jaccard FROM read_parquet({spark_files!r}) ORDER BY 1, 2"
).fetchall()
if not rows:
    print("FAIL: engine output is empty")
    sys.exit(1)

doc_files = glob.glob(f"{sf}/documents.parquet/*.parquet") or [
    f"{sf}/documents.parquet"
]
ids = sorted({r[0] for r in rows} | {r[1] for r in rows})
con.execute(
    f"""CREATE TEMP TABLE w AS
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS w
        FROM read_parquet({doc_files!r})
        WHERE doc_id IN ({','.join(str(i) for i in ids)})"""
)
bad = 0
for id_a, id_b, got in rows:
    (exp,) = con.execute(
        """SELECT CAST(CAST(round(
               (len(a.w) + len(b.w) - len(list_distinct(list_concat(a.w, b.w))))
               / CAST(len(list_distinct(list_concat(a.w, b.w))) AS DOUBLE), 6)
             AS DECIMAL(18,6)) AS DOUBLE)
           FROM w a, w b WHERE a.doc_id = ? AND b.doc_id = ?""",
        [id_a, id_b],
    ).fetchone()
    if exp != got:
        bad += 1
        print(f"MISMATCH ({id_a},{id_b}): engine {got} vs duckdb {exp}")
if bad:
    print(f"FAIL: {bad}/{len(rows)} pair values diverge")
    sys.exit(1)
print(f"PASS: all {len(rows)} emitted pair similarities match DuckDB per-pair recompute")
