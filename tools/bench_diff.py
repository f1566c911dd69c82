#!/usr/bin/env python3
"""Mechanical per-query bench diff between two bench artifacts.

Reads two BENCH_FULL/BENCH_sf1-style JSONs (or driver BENCH_r{N}.json
wrappers with the line under "tail"/"parsed") and prints every common
query whose ratio exceeds the threshold, using `queries_norm` when both
sides carry it (per-query probe normalization, r13) and falling back to
raw `queries` otherwise. This replaces the manual probe arithmetic that
cost three rounds of verdict time.

Usage: bench_diff.py <old.json> <new.json> [ratio_threshold=1.5]
"""
import sys, json

def load(path):
    d = json.load(open(path))
    # driver wrapper: the stdout line is stored stringified under "tail"
    if "queries" not in d:
        for k in ("parsed",):
            if isinstance(d.get(k), dict) and "queries" in d[k]:
                d = d[k]; break
        else:
            t = d.get("tail")
            if isinstance(t, str):
                i = t.find('{"metric"')
                if i < 0:
                    # tail may start mid-line; find the queries map heuristically
                    i = 0
                d = json.loads(t[i:]) if i >= 0 and t[i:].startswith("{") else d
    if "queries" not in d:
        sys.exit(f"{path}: no queries map found")
    return d

old, new = load(sys.argv[1]), load(sys.argv[2])
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

def maps(d):
    q = d["queries"]
    qn = d.get("queries_norm")
    return q, qn if isinstance(qn, dict) else None

oq, on = maps(old)
nq, nn = maps(new)
use_norm = on is not None and nn is not None
# Two-anchor consistency (r13 VERDICT #2): when either artifact says its
# CPU and scan host factors disagree (>30%), the probe normalization is
# unattributable — fall back to raw times and say so.
for side, d in (("old", old), ("new", new)):
    hf = d.get("host_factor")
    if isinstance(hf, dict) and hf.get("consistent") is False:
        print(f"WARNING: {side} artifact's probe anchors disagree "
              f"(cpu={hf.get('cpu')} scan={hf.get('scan')}) - using RAW times")
        use_norm = False
common = sorted(set(oq) & set(nq))
src_o, src_n = (on, nn) if use_norm else (oq, nq)
print(f"common queries: {len(common)}  basis: "
      f"{'queries_norm (per-query probe-normalized)' if use_norm else 'raw queries'}")
if not common:
    sys.exit("no common queries between the two artifacts - nothing to diff")
tot_o = sum(src_o.get(q, oq[q]) for q in common)
tot_n = sum(src_n.get(q, nq[q]) for q in common)
if tot_o <= 0:
    sys.exit(f"old common-subset total is {tot_o} - ratios undefined")
print(f"common-subset total: {tot_o:.1f}s -> {tot_n:.1f}s = {tot_n/tot_o:.3f}x")
flagged = []
for q in common:
    a, b = src_o.get(q, oq[q]), src_n.get(q, nq[q])
    if a > 0 and b / a >= thr and b >= 0.15:  # ignore sub-150ms jitter rows
        flagged.append((b / a, q, a, b))
for r, q, a, b in sorted(flagged, reverse=True):
    print(f"{r:5.2f}x  {q}: {a:.3f} -> {b:.3f}  (raw {oq[q]:.3f} -> {nq[q]:.3f})")
if not flagged:
    print(f"no common query at or above {thr}x")
only_new = sorted(set(nq) - set(oq))
if only_new:
    print("new queries:", ", ".join(f"{q}={nq[q]}" for q in only_new))
