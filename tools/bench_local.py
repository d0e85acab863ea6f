#!/usr/bin/env python3
"""Full per-round bench evidence: run graft.Bench (Spark, local[32]) and
tools/bench_duckdb.py (DuckDB on the identical oracle SQL) at the same SF,
then write the COMPLETE merged per-query map to BENCH_LOCAL_r{N}.json —
the driver's BENCH_r{N}.json artifact keeps only a 2 KB stdout tail, so
this tracked file is the round's citable evidence for every query.

Usage: python3 tools/bench_local.py <round> [sfdir] [verify_outdir]
  round         round number N → writes BENCH_LOCAL_r{N}.json in repo root
  sfdir         default /root/testdata/sf0.1
  verify_outdir a graft.Verify dump holding oracle_sql.json
                (default /tmp/graft_verify — run tools/check.py first)
"""
import json, os, subprocess, sys

if len(sys.argv) < 2:
    sys.exit(__doc__)
rnd = int(sys.argv[1])
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_verify"
repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
bench_out = "/tmp/graft_bench_local.json"

env = dict(os.environ, SPARK_GRAFT_SF_DIR=sfdir, SPARK_GRAFT_BENCH_OUT=bench_out)
r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                   cwd=repo_root, env=env, capture_output=True, text=True,
                   timeout=3600)
if r.returncode != 0 or not os.path.exists(bench_out):
    print("SPARK BENCH FAILED"); print(r.stdout[-3000:]); print(r.stderr[-2000:])
    sys.exit(1)
spark = json.load(open(bench_out))

d = subprocess.run([sys.executable, "tools/bench_duckdb.py", sfdir, outdir],
                   cwd=repo_root, capture_output=True, text=True, timeout=3600)
duck = json.loads(d.stdout) if d.returncode == 0 else {"error": d.stderr[-2000:]}

merged = {
    "round": rnd, "sf": sfdir,
    "spark_total_sec": spark.get("value"),
    "duckdb_total_sec": duck.get("total"),
    "spark_queries": spark.get("queries"),
    "duckdb_queries": duck.get("queries"),
    "skew": spark.get("skew"),
    "failed": spark.get("failed"),
}
path = os.path.join(repo_root, f"BENCH_LOCAL_r{rnd}.json")
with open(path, "w") as f:
    json.dump(merged, f, indent=1, sort_keys=True)
print(f"wrote {path}: spark {merged['spark_total_sec']}s "
      f"vs duckdb {merged['duckdb_total_sec']}s, failed={merged['failed']}")
