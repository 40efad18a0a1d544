#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check.py [sfdir] [outdir]
Runs after `sbt "runMain graft.Verify <sfdir> <outdir>"`.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{outdir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark result"); fail += 1; continue
    try:
        got = pd.read_parquet(res_dir)
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}"); fail += 1; continue
    g = got[sorted(got.columns)].reset_index(drop=True)
    e = exp[sorted(exp.columns)].reset_index(drop=True)
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); fail += 1; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fail += 1; continue
    # The driver's hash compare canonicalizes integer WIDTH (int32 == int64)
    # but not KIND: DuckDB HUGEINT surfaces as object/float and hash-
    # mismatches Spark BIGINT even when values agree. Flag kind-level drift.
    dt = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
          if g[c].dtype.kind != e[c].dtype.kind
          and not ({g[c].dtype.kind, e[c].dtype.kind} <= {'i', 'u'})]
    # dtype drift is a WARNING, not an instant fail: the value compare below
    # still runs, so a legitimately-agreeing float-vs-int pair shows up as
    # "OK (dtype drift)" locally — but the drift is still surfaced because
    # the driver's hash compare may not canonicalize that case.
    drift = f" [dtype drift {dt}]" if dt else ""
    if dt:
        print(f"WARN {name}: dtype drift {dt} — values compared anyway")
    bad = None
    for c in g.columns:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            m = ~(np.isclose(gv.astype(float), ev.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True)
                  | (gv.isna() & ev.isna()))
        else:
            m = ~((gv == ev) | (gv.isna() & ev.isna()))
        if m.any():
            i = int(np.argmax(m.values))
            bad = (c, i, gv.iloc[i], ev.iloc[i], int(m.sum()))
            break
    if bad:
        c, i, gv, ev, n = bad
        print(f"FAIL {name}: col {c} row {i}: got {gv!r} exp {ev!r} ({n} mismatches, {len(g)} rows)")
        fail += 1
    else:
        print(f"OK   {name} ({len(g)} rows x {len(g.columns)} cols){drift}")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
