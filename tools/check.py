#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, exact values).

Dtype-STRICT by default (round 6): the pandas dtype of every compared
column must match exactly between the Spark dump and the DuckDB oracle.
Both sides are materialized through DuckDB (got via read_parquet, exp via
the oracle SQL), so a drift like DuckDB typing SUM(BIGINT) as HUGEINT
(→ float64) against Spark's int64 fails loudly here, exactly as it fails
the driver's typed hash. Pass --lenient to restore the old value-only
compare (int 5 == float 5.0) for debugging.

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify] [--lenient] [names...]
"""
import json, subprocess, sys, glob, os

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
flags = [a for a in sys.argv[3:]]
skip_verify = "--skip-verify" in flags
lenient = "--lenient" in flags
only = [a for a in flags if not a.startswith("--")]

repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if not skip_verify:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
        cwd=repo_root, capture_output=True, text=True, timeout=1800)
    sys.stdout.write("\n".join(l for l in r.stdout.splitlines()
                               if "[verify]" in l or "error" in l.lower()) + "\n")
    if r.returncode != 0:
        print("VERIFY RUN FAILED"); print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)

import duckdb, pandas as pd
import numpy as np

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(d for d in os.listdir(outdir) if os.path.isdir(f"{outdir}/{d}"))
if only:
    names = [n for n in names if n in only]

fails = []
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name:28s} NO OUTPUT"); fails.append(name); continue
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
    if name not in oracle:
        print(f"{name:28s} rows-only: {len(got)} rows {'OK' if len(got)>0 else 'EMPTY!'}")
        if len(got) == 0: fails.append(name)
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE SQL ERROR: {str(e).splitlines()[0][:120]}")
        fails.append(name); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"{name:28s} COLUMN MISMATCH got={list(got.columns)} exp={list(exp.columns)}")
        fails.append(name); continue
    if len(got) != len(exp):
        print(f"{name:28s} ROWCOUNT got={len(got)} exp={len(exp)}")
        fails.append(name); continue
    if not lenient:
        # Strict dtype gate: the driver hashes typed values, so an
        # int64-vs-float64 (HUGEINT/DOUBLE) drift is a driver failure even
        # when every value compares equal. Catch it here.
        bad_dtypes = [(c, str(got[c].dtype), str(exp[c].dtype))
                      for c in got.columns if got[c].dtype != exp[c].dtype]
        if bad_dtypes:
            print(f"{name:28s} DTYPE MISMATCH " +
                  "; ".join(f"{c}: got={g} exp={e}" for c, g, e in bad_dtypes))
            fails.append(name); continue
    g = got.sort_values(list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    eq = True
    for c in g.columns:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            same = (gv.isna() & ev.isna()) | (gv == ev)
        else:
            same = (gv.isna() & ev.isna()) | (gv.astype(object) == ev.astype(object))
        if not same.all():
            bad = (~same).to_numpy().nonzero()[0][:3]
            print(f"{name:28s} VALUE MISMATCH col={c} rows={bad.tolist()} "
                  f"got={gv.iloc[bad].tolist()} exp={ev.iloc[bad].tolist()}")
            eq = False; break
    if eq:
        print(f"{name:28s} OK ({len(got)} rows)")
    else:
        fails.append(name)

print(f"\n{len(names)-len(fails)}/{len(names)} pass; FAILS: {fails}")
sys.exit(1 if fails else 0)
