#!/usr/bin/env python3
"""Compare two BENCH_FULL.json dumps and flag per-query regressions.

Usage: python3 tools/benchdiff.py OLD.json NEW.json [threshold]

Prints queries slower than `threshold`x (default 1.5) their old time,
new queries, and removed queries. Bench noise on a busy box is 10-30%;
re-run idle before believing anything under 2x.
"""
import json
import sys

old_path, new_path = sys.argv[1], sys.argv[2]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
old = json.load(open(old_path))
new = json.load(open(new_path))
oq, nq = old["queries"], new["queries"]

print(f"total: {old['value']}s ({old.get('n', len(oq))} queries) -> "
      f"{new['value']}s ({new.get('n', len(nq))} queries)")
regressed = [(k, oq[k], nq[k]) for k in sorted(oq.keys() & nq.keys())
             if nq[k] > thr * oq[k] and nq[k] - oq[k] > 0.2]
for k, a, b in sorted(regressed, key=lambda t: t[1] - t[2]):
    print(f"  REGRESSED {k}: {a:.2f}s -> {b:.2f}s ({b / a:.1f}x)")
for k in sorted(nq.keys() - oq.keys()):
    print(f"  NEW       {k}: {nq[k]:.2f}s")
for k in sorted(oq.keys() - nq.keys()):
    print(f"  REMOVED   {k} (was {oq[k]:.2f}s)")
if not regressed:
    print("  no per-query regressions above "
          f"{thr}x (+0.2s absolute)")
