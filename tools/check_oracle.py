#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare.

Mimics the driver: runs each oracle_sql.json query in DuckDB over the same
parquet tables, loads the Spark result parquet written by graft.Verify,
sorts columns by name, sorts rows, and compares cell-by-cell (exact for
ints/strings/timestamps, exact-with-report for floats so rounding-boundary
risks surface before the real gate).

Usage: check_oracle.py [sfDir] [verifyOutDir]
"""
import sys, json, math, glob
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
import os
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # driver fixtures are single files; derived sets (target/sf1) are
    # spark-written directories — read whichever shape exists
    p = f"{sf}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        s = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        d = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue

    sc, dc = sorted(s.columns), sorted(d.columns)
    if sc != dc:
        print(f"FAIL {name}: columns spark={sc} duck={dc}"); n_fail += 1; continue
    s, d = s[sc], d[sc]
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
    # normalize dtypes: timestamps -> ns naive, all to object for stable sort
    for df in (s, d):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    key = list(s.columns)
    s = s.sort_values(key, na_position="first").reset_index(drop=True)
    d = d.sort_values(key, na_position="first").reset_index(drop=True)
    bad = []
    for c in s.columns:
        sv, dv = s[c], d[c]
        if str(sv.dtype) != str(dv.dtype):
            bad.append(f"dtype[{c}]: spark={sv.dtype} duck={dv.dtype}")
        for i in range(len(sv)):
            a, b = sv.iloc[i], dv.iloc[i]
            if (a is None or (isinstance(a, float) and math.isnan(a)) or pd.isna(a)) and \
               (b is None or (isinstance(b, float) and math.isnan(b)) or pd.isna(b)):
                continue
            # -0.0 == 0.0 in Python but hashes differently in the driver's
            # byte-level compare — treat signbit mismatch as a failure.
            neg_zero = (isinstance(a, float) and isinstance(b, float)
                        and math.copysign(1.0, a) != math.copysign(1.0, b))
            if a != b or neg_zero:
                bad.append(f"row {i} col {c}: spark={a!r} duck={b!r}")
                if len(bad) > 4: break
        if len(bad) > 4: break
    if bad:
        print(f"FAIL {name} ({len(s)} rows):")
        for m in bad[:5]:
            print(f"   {m}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(s)} rows)")
        n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracled")
sys.exit(1 if n_fail else 0)
