#!/usr/bin/env python3
"""Time DuckDB executing every oracle SQL from a Verify dump over the same
parquet tables — the measurable same-workload baseline for the BENCH
figures (the reference itself publishes no numbers; DuckDB running the
identical SQL is the honest single-node comparison).

Usage: python3 tools/bench_duckdb.py [sfdir] [outdir] [names...]
  sfdir  defaults to /root/testdata/sf0.1
  outdir a previous tools/check.py / graft.Verify output dir holding
         oracle_sql.json (default /tmp/graft_verify)
Prints one JSON line: {"total": sec, "queries": {name: sec | -1}}.
"""
import json, sys, time

import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
only = sys.argv[3:]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(n for n in oracle if not only or n in only)

times = {}
for name in names:
    t0 = time.time()
    try:
        con.execute(oracle[name]).fetchall()
        times[name] = round(time.time() - t0, 3)
    except Exception as e:
        sys.stderr.write(f"{name} failed: {e}\n")
        times[name] = -1
total = round(sum(v for v in times.values() if v >= 0), 3)
print(json.dumps({"total": total, "queries": times}))
