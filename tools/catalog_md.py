#!/usr/bin/env python3
"""Generate QUERIES.md — the per-query catalog index: oracle row count at
sf0.01 plus measured Spark (graft.Bench, min-of-2 warm) and DuckDB
(tools/bench_duckdb.py, identical oracle SQL) seconds at sf0.1.

Usage: python3 tools/catalog_md.py <verify_outdir> <bench_json> <duckdb_json>
Writes QUERIES.md in the repo root.
"""
import glob
import json
import os
import re
import sys

outdir, bench_path, duck_path = sys.argv[1], sys.argv[2], sys.argv[3]
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

line = open(bench_path).read()
bench = json.loads(line[line.index("{"):])["queries"]
duck = json.loads(open(duck_path).read())["queries"]

import duckdb
con = duckdb.connect()
rows = {}
for name in sorted(os.listdir(outdir)):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if files:
        rows[name] = con.execute(
            f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]

def qnum(n):
    m = re.match(r"[qx](\d+)_", n)
    return int(m.group(1)) if m else 0

names = sorted(rows, key=lambda n: (n[0], qnum(n)))

# Exact-baseline queries and their production-scale twins. These ship as
# oracle-checked CATALOG entries because they are the recall/correctness
# references the scale paths are tested against — they are NOT the form
# to run on a large corpus, and the note says what to run instead.
BASELINE_NOTES = {
    "x02_dedup_jaccard":
        "**exact baseline** (quadratic inverted-index self-join) — production: "
        "x27 LSH candidates → exact-Jaccard verify (~linear in candidates)",
    "x05_ann_bruteforce":
        "**exact baseline** (all-pairs cosine) — production: x06 bucketed "
        "sign-LSH top-k (shuffles codes, not vectors)",
    "x07_embed_neardup":
        "**exact baseline** (all-pairs) — production: banded sign-LSH "
        "(`Similarity.nearDupPairsBanded`, feeds x25 clustering)",
    "x113_lsh_recall":
        "**eval harness** — probe-restricted exact truth grades the x03 "
        "band stage; run before committing banding parameters to a corpus",
    "x176_bitext_margin":
        "**exact baseline** (per-language-pair cross product) — production: "
        "x177 margin over IVF candidate lists (Θ(N^1.5) vs N²)",
    "x177_bitext_margin_ivf":
        "scale path of x176 (`Similarity.ivfTopKLarge`, per-side ⌊√N⌋ "
        "coarse models, gated candidate join); 10× gate sublinear",
}

groups = [
    ("Reference operators (SURVEY §2, q01–q40)", lambda n: n.startswith("q")),
    ("Training-data extensions (x01–x35)",
     lambda n: n.startswith("x") and qnum(n) <= 35),
    ("Curation operators (x36–x61)",
     lambda n: n.startswith("x") and 36 <= qnum(n) <= 61),
    ("Corpus layout / analytics (x62+)",
     lambda n: n.startswith("x") and qnum(n) >= 62),
]

# Bench class boundary (r11 verdict #3): a query whose DuckDB twin
# finishes under this wall at sf0.1 is OVERHEAD-BOUND — the ratio
# column measures Spark's fixed per-query job overhead (~0.2-0.7 s)
# against a sub-toy frame, not the plans. Overhead-bound rows grade on
# absolute wall + job census + the 10x scale gate (SCALE.md "Grading
# rule"); data-bound rows grade on the ratio.
DATA_BOUND_TWIN_SEC = 0.3

out = ["# QUERIES — the oracle-checked catalog",
       "",
       "One row per `SparkEntry.queries` entry. Every query has a full DuckDB",
       "value oracle (`SparkEntry.oracleSql`); `rows` is the sf0.01 oracle",
       "output size, timings are sf0.1 on the same 32-core box (Spark:",
       "`graft.Bench` min-of-2 warm through the noop sink; DuckDB: identical",
       "oracle SQL via `tools/bench_duckdb.py`).",
       "",
       "`class` (r11 verdict #3): **data** if the DuckDB twin took ≥ "
       f"{DATA_BOUND_TWIN_SEC} s at sf0.1 (the ratio measures the plans), "
       "**ovhd** otherwise (the twin is so small that the ratio measures "
       "Spark's fixed per-query job overhead against a toy frame — these "
       "rows grade on absolute wall + census + the 10× scale gate; see "
       "SCALE.md \"Grading rule\").",
       ""]
tot_s = tot_d = 0.0
for title, pred in groups:
    members = [n for n in names if pred(n)]
    if not members:
        continue
    out += [f"## {title}", "",
            "| query | sf0.01 rows | spark s | duckdb s | ratio | class | notes |",
            "|---|---|---|---|---|---|---|"]
    for n in members:
        s, dd = bench.get(n), duck.get(n)
        ratio = f"{dd / s:.1f}×" if s and dd and s > 0 else "—"
        s_txt = f"{s:.2f}" if s is not None else "—"
        d_txt = f"{dd:.2f}" if dd is not None else "—"
        cls = ("data" if dd is not None and dd >= DATA_BOUND_TWIN_SEC
               else "ovhd" if dd is not None else "—")
        note = BASELINE_NOTES.get(n, "")
        out.append(f"| {n} | {rows[n]} | {s_txt} | {d_txt} | {ratio} | {cls} | {note} |")
        if s and s > 0:
            tot_s += s
        if dd:
            tot_d += dd
    out.append("")
overall = f"{tot_d / tot_s:.1f}× overall" if tot_s > 0 else "n/a"
out += [f"**Totals:** {len(names)} queries; Spark {tot_s:.1f} s vs DuckDB "
        f"{tot_d:.1f} s on the identical workload ({overall}).", ""]
open(os.path.join(repo, "QUERIES.md"), "w").write("\n".join(out))
print(f"QUERIES.md: {len(names)} queries, spark {tot_s:.1f}s duckdb {tot_d:.1f}s")
