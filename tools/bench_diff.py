#!/usr/bin/env python3
"""Sanity-diff two bench captures before trusting the newer one.

A bench artifact captured under competing load looks exactly like a real
regression (round 6 shipped a 69.4 s artifact for a 39.7 s suite). The
tell is UNTOUCHED queries moving together: a code change moves the
queries it touches; box load inflates everything. This script flags both
per-query moves beyond a ratio threshold and the uniform-inflation
pattern, so a polluted capture fails loudly instead of shipping.

Usage: python3 tools/bench_diff.py OLD NEW [ratio]
  OLD/NEW: either a driver artifact (BENCH_rN.json, with "tail"/"parsed")
           or Bench's own target/bench.json (with "queries").
  ratio:   per-query flag threshold, default 1.5.

Exit 1 if any query moved beyond the threshold (slower OR faster — a big
speedup on an untouched query means the OLD capture was the bad one).
"""
import json
import re
import statistics
import sys


def load_queries(path):
    d = json.load(open(path))
    if "queries" in d:
        return d["queries"]
    # Driver artifact: "tail" keeps only the LAST 2000 chars of Bench's
    # summary line, so the queries map is truncated at the FRONT. Regex
    # out every complete "q_name":seconds pair that survived — a partial
    # baseline still catches load pollution on the queries it covers.
    # (Never fall back to parsed.queries_file: it names target/bench.json,
    # which the next local run overwrites.)
    tail = d.get("tail", "")
    pairs = re.findall(r'"(q_\w+)":([0-9]+\.[0-9]+)', tail)
    if not pairs:
        raise SystemExit(f"{path}: no per-query numbers found")
    print(f"note: {path} is a truncated driver artifact; "
          f"{len(pairs)} per-query numbers recovered")
    return {q: float(v) for q, v in pairs}


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load_queries(sys.argv[1]), load_queries(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries between the two captures")
    moved = []
    ratios = []
    for q in common:
        o, n = old[q], new[q]
        if o <= 0 or n <= 0:
            continue
        r = n / o
        ratios.append(r)
        if r > ratio or r < 1 / ratio:
            moved.append((q, o, n, r))
    med = statistics.median(ratios)
    print(f"{len(common)} common queries; median ratio new/old = {med:.2f}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new-only (no baseline): {' '.join(only_new)}")
    for q, o, n, r in sorted(moved, key=lambda t: -t[3]):
        print(f"  FLAG {q}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    if med > 1.25 or med < 0.8:
        print(
            f"UNIFORM SHIFT: median ratio {med:.2f} across ALL common "
            "queries — one capture ran on a loaded/different box; do not "
            "compare per-query numbers, re-capture instead."
        )
    if moved:
        sys.exit(1)
    print("OK: no per-query move beyond "
          f"{ratio}x; captures are comparable.")


if __name__ == "__main__":
    main()
