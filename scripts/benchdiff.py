#!/usr/bin/env python3
"""Mechanical round-over-round bench comparison (dev tooling, not shipped).

Usage: benchdiff.py OLD.json NEW.json [--threshold 1.25]

Inputs are Bench's JSON (BENCH_LOCAL.json with `variance`, or the driver's
BENCH_r{N}.json with `queries` only). Per query the run-to-run range is
[min, min * spread] (spread = max/min across the interleaved attempts;
1.0 when no variance field). A query is flagged ONLY when the two ranges
do not overlap — a min that moved inside either range is machine noise,
not a plan change — AND the slower side is above the 0.3 s floor where
sub-100 ms jitter dominates. Exits 1 on any regression so precommit-style
wiring can gate on it.
"""
import argparse
import json
import sys

ap = argparse.ArgumentParser()
ap.add_argument("old")
ap.add_argument("new")
ap.add_argument("--threshold", type=float, default=1.25,
                help="extra ratio a non-overlapping move must exceed to be "
                     "flagged (default 1.25)")
ap.add_argument("--floor", type=float, default=0.3,
                help="ignore queries where both mins are below this many "
                     "seconds (default 0.3)")
args = ap.parse_args()

old = json.load(open(args.old))
new = json.load(open(args.new))

mo, mn = old.get("method"), new.get("method")
if mo and mn and mo != mn:
    print(f"INCOMPARABLE: methods differ\n  old: {mo}\n  new: {mn}")
    sys.exit(2)
if old.get("sf") != new.get("sf"):
    print(f"INCOMPARABLE: sf differs (old {old.get('sf')}, new {new.get('sf')})")
    sys.exit(2)

qo, qn = old["queries"], new["queries"]
vo, vn = old.get("variance", {}), new.get("variance", {})

added = sorted(set(qn) - set(qo))
removed = sorted(set(qo) - set(qn))
regressions, improvements = [], []
for k in sorted(set(qo) & set(qn)):
    o, n = qo[k], qn[k]
    o_hi = o * max(vo.get(k, 1.0), 1.0)
    n_hi = n * max(vn.get(k, 1.0), 1.0)
    if max(o, n) < args.floor:
        continue
    if n > o_hi * args.threshold:          # new min above old range: slower
        regressions.append((k, o, n, n / o if o > 0 else float("inf")))
    elif n_hi * args.threshold < o:        # new range below old min: faster
        improvements.append((k, o, n, n / o if o > 0 else 0.0))

t_old, t_new = old.get("value"), new.get("value")
common_old = sum(qo[k] for k in qo if k in qn)
common_new = sum(qn[k] for k in qn if k in qo)
print(f"total: {t_old} s ({len(qo)} queries) -> {t_new} s ({len(qn)} queries)")
if common_old:
    print(f"like-for-like ({len(set(qo) & set(qn))} shared): "
          f"{common_old:.1f} s -> {common_new:.1f} s "
          f"({common_new / common_old:.3f}x)")
for label, rows in (("REGRESSION", regressions), ("improvement", improvements)):
    for k, o, n, r in rows:
        print(f"  {label} {k}: {o:.3f} s -> {n:.3f} s ({r:.2f}x)")
if added:
    print(f"  added: {added}")
if removed:
    print(f"  removed: {removed}")
if not regressions and not improvements:
    print("  no per-query moves outside noise ranges")
sys.exit(1 if regressions else 0)
