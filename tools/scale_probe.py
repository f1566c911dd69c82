#!/usr/bin/env python3
"""Scale-probe analysis: per-query scaling exponents across two bench runs.

Usage: scale_probe.py <bench_log_small> <bench_log_big> [decades]

Each input is a `graft.Bench` stdout capture (the FULL JSON line is the
first line carrying "queries"); the two runs must cover the same query
subset at two data scales. `decades` is log10(big/small) of the data size
(default 1.0 — e.g. sf1 -> sf10).

For each common query prints t_small, t_big, the growth ratio, and the
implied per-decade exponent e = log10(ratio)/decades (e = 1 is linear in
data size; the r13 verdict's bar for the scale headliners is ratio <=
~13x per decade, i.e. e <= ~1.11, beyond the fixed barrier floor).
Exits nonzero if any query exceeds the bar so a CI-style caller can gate.
"""
import sys, json, math

BAR_RATIO_PER_DECADE = 13.0


def load(path):
    best = None
    with open(path) as f:
        for line in f:
            i = line.find('{"metric"')
            if i < 0:
                continue
            try:
                d = json.loads(line[i:])
            except json.JSONDecodeError:
                continue
            if isinstance(d.get("queries"), dict):
                # prefer the FULL line (has query_started_at); the compact
                # line lacks it
                if best is None or "query_started_at" in d:
                    best = d
    if best is None:
        sys.exit(f"no bench JSON line with a queries map in {path}")
    return best


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    small, big = load(sys.argv[1]), load(sys.argv[2])
    decades = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    qs, qb = small["queries"], big["queries"]
    common = sorted(set(qs) & set(qb))
    if not common:
        sys.exit("no common queries between the two runs")
    failed_s = set(small.get("failed") or [])
    failed_b = set(big.get("failed") or [])
    print(f"{'query':44s} {'t_small':>8s} {'t_big':>8s} {'ratio':>7s} "
          f"{'exp/decade':>10s}")
    worst = []
    for q in common:
        if q in failed_s or q in failed_b:
            print(f"{q:44s} FAILED in {'small' if q in failed_s else 'big'} run")
            worst.append((q, float("inf")))
            continue
        ts, tb = qs[q], qb[q]
        if ts <= 0:
            print(f"{q:44s} t_small={ts} — skipped")
            continue
        ratio = tb / ts
        exp = math.log10(ratio) / decades if ratio > 0 else float("-inf")
        flag = "  <-- over bar" if ratio > BAR_RATIO_PER_DECADE ** decades else ""
        print(f"{q:44s} {ts:8.2f} {tb:8.2f} {ratio:6.2f}x {exp:10.3f}{flag}")
        if ratio > BAR_RATIO_PER_DECADE ** decades:
            worst.append((q, ratio))
    tot_s = sum(qs[q] for q in common if q not in failed_s and q not in failed_b)
    tot_b = sum(qb[q] for q in common if q not in failed_s and q not in failed_b)
    print(f"{'TOTAL':44s} {tot_s:8.2f} {tot_b:8.2f} "
          f"{tot_b / tot_s:6.2f}x {math.log10(tot_b / tot_s) / decades:10.3f}")
    cb_s = small.get("cache_build_sec")
    cb_b = big.get("cache_build_sec")
    print(f"(cache_build_sec: {cb_s} -> {cb_b}; staging_sec: "
          f"{small.get('staging_sec')} -> {big.get('staging_sec')})")
    if worst:
        print(f"\n{len(worst)} queries over the {BAR_RATIO_PER_DECADE}x/decade "
              f"bar: {', '.join(q for q, _ in worst)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
