#!/usr/bin/env python3
"""Per-query-timeout DuckDB compare for sf1-scale verify outputs.

Same compare semantics as tools/check_oracle.py (sort cols by name, sort
rows, exact compare, -0.0 != 0.0), but each oracle runs in a killable
child process so one pathological oracle cannot hang the whole pass.

Usage: compare_subset.py <sfDir> <verifyOutDir> [timeoutSec] [only] [skip]
  only/skip: comma-separated query names ('' = none).
Example (the r12 full-surface sf1 pass):
  python3 tools/compare_subset.py target/sf1 /tmp/verify_sf1 900 '' q_dedup_cluster
  python3 tools/compare_subset.py target/sf1 /tmp/verify_sf1 5400 q_dedup_cluster  # solo later
"""
import sys, json, math, glob, os, multiprocessing as mp

SF = sys.argv[1]
OUT = sys.argv[2]
TIMEOUT = int(sys.argv[3]) if len(sys.argv) > 3 else 900
ONLY = sys.argv[4].split(',') if len(sys.argv) > 4 and sys.argv[4] else None
SKIP = set(sys.argv[5].split(',')) if len(sys.argv) > 5 and sys.argv[5] else set()

def run_one(name, sql, q):
    try:
        import duckdb, pandas as pd
        con = duckdb.connect()
        for t in ["region","nation","customer","supplier","part","orders",
                  "lineitem","events","documents","embeddings"]:
            p = f"{SF}/{t}.parquet"
            if os.path.isdir(p): p = f"{p}/*.parquet"
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
        if not files: q.put((name,"FAIL","no spark output")); return
        s = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        d = con.execute(sql).df()
        sc, dc = sorted(s.columns), sorted(d.columns)
        if sc != dc: q.put((name,"FAIL",f"columns {sc} vs {dc}")); return
        s, d = s[sc], d[sc]
        if len(s) != len(d): q.put((name,"FAIL",f"rows {len(s)} vs {len(d)}")); return
        for df in (s, d):
            for c in df.columns:
                if str(df[c].dtype).startswith("datetime"):
                    df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        key = list(s.columns)
        s = s.sort_values(key, na_position="first").reset_index(drop=True)
        d = d.sort_values(key, na_position="first").reset_index(drop=True)
        import numpy as np
        for c in s.columns:
            sv, dv = s[c], d[c]
            # Vectorized compare (the per-.iloc Python loop dominated the
            # per-query timeout budget at sf1 row counts); the row loop
            # below runs only to report the first mismatching row.
            sn = pd.isna(sv).to_numpy()
            dn = pd.isna(dv).to_numpy()
            bad = sn != dn
            both = ~sn & ~dn
            if both.any():
                a, b = sv.to_numpy()[both], dv.to_numpy()[both]
                with np.errstate(invalid="ignore"):
                    neq = a != b
                    if a.dtype.kind == "f" and b.dtype.kind == "f":
                        neq = neq | (np.copysign(1.0, a) != np.copysign(1.0, b))
                    elif a.dtype.kind == "O" or b.dtype.kind == "O":
                        # object-dtype columns can hold Python floats: the
                        # old per-element loop caught -0.0 vs 0.0 there too,
                        # so keep that check elementwise for float instances
                        neq = np.asarray(neq, dtype=bool)
                        for j in range(len(a)):
                            if (not neq[j] and isinstance(a[j], float)
                                    and isinstance(b[j], float)
                                    and math.copysign(1.0, a[j]) != math.copysign(1.0, b[j])):
                                neq[j] = True
                bad[np.flatnonzero(both)[np.asarray(neq, dtype=bool)]] = True
            if bad.any():
                i = int(np.flatnonzero(bad)[0])
                a, b = sv.iloc[i], dv.iloc[i]
                q.put((name,"FAIL",f"row {i} col {c}: spark={a!r} duck={b!r}")); return
        q.put((name,"PASS",f"{len(s)} rows"))
    except Exception as e:
        q.put((name,"FAIL",f"{type(e).__name__}: {e}"))

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
names = sorted(oracle)
if ONLY: names = [n for n in names if n in ONLY]
names = [n for n in names if n not in SKIP]
npass = nfail = 0
for name in names:
    q = mp.Queue()
    p = mp.Process(target=run_one, args=(name, oracle[name], q))
    p.start(); p.join(TIMEOUT)
    if p.is_alive():
        p.terminate(); p.join()
        print(f"TIMEOUT {name} (> {TIMEOUT}s)", flush=True); nfail += 1
    else:
        # The child may exit before its Queue payload finishes flushing
        # through the pipe — get_nowait() here misreported completed
        # children as dead. Wait a bounded beat for the payload first.
        try: n, st, msg = q.get(timeout=5)
        except Exception:
            print(f"FAIL {name}: child died", flush=True); nfail += 1; continue
        print(f"{st} {n}: {msg}", flush=True)
        if st == "PASS": npass += 1
        else: nfail += 1
print(f"{npass} pass, {nfail} fail, {len(names)} attempted")
