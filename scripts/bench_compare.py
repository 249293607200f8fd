#!/usr/bin/env python3
"""Compare two bench per-query JSON lines (or a BENCH_r*.json driver record's
tail) and print shared-query deltas, worst regressions first.

Usage: bench_compare.py <old: BENCH_rN.json | bench log> <new: bench log>
"""
import json
import re
import sys


def load(path):
    txt = open(path).read()
    try:
        rec = json.loads(txt)
        if isinstance(rec, dict) and "tail" in rec:
            txt = rec["tail"]
    except json.JSONDecodeError:
        pass
    m = re.findall(r'"metric":"per_query".*', txt)
    if m:
        return json.loads(m[-1])["queries"]
    pairs = re.findall(r'"(q[0-9]+[a-z_0-9]*)":([0-9.]+)', txt)
    return {k: float(v) for k, v in pairs}


old, new = load(sys.argv[1]), load(sys.argv[2])
shared = sorted(set(old) & set(new), key=lambda q: new[q] - old[q], reverse=True)
so, sn = sum(old[q] for q in shared), sum(new[q] for q in shared)
print(f"shared {len(shared)} queries: old {so:.1f}s -> new {sn:.1f}s ({sn/so:.2f}x)")
print(f"{'query':44s} {'old':>7s} {'new':>7s} {'delta':>7s}")
for q in shared[:15]:
    print(f"{q:44s} {old[q]:7.2f} {new[q]:7.2f} {new[q]-old[q]:+7.2f}")
only_new = sorted(set(new) - set(old), key=lambda q: -new[q])
if only_new:
    print(f"\nnew-only: {sum(new[q] for q in only_new):.1f}s over {len(only_new)} queries; top:")
    for q in only_new[:8]:
        print(f"  {q:42s} {new[q]:7.2f}")
