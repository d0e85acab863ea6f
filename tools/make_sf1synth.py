#!/usr/bin/env python3
"""Synthesize an sf1-equivalent testdata dir: documents at 10x sf0.1.

Ten shards, each a copy of the sf0.1 documents table with doc_ids offset
by k*1_000_000. Shards k>0 suffix EVERY word with a letter-only shard tag
("xb".."xj" — letters only, so TextOps.normalize cannot split the tag
back off and resurrect the original token; an earlier "~k" tag did
exactly that and produced cross-shard clusters). This (a) keeps every
shard's INTERNAL duplicate/near-duplicate structure intact — two docs
identical in sf0.1 stay identical inside shard k, since the perturbation
is a pure function of the word — and (b) zeroes cross-shard token overlap
entirely, so candidate pairs scale ~10x with rows instead of ~100x from
inflated cluster sizes. That is the honest 10x shape: ten sf0.1-like
shards, per-row work and output volume both linear.

Other tables are copied from sf0.1 unchanged (the scaling queries only
read documents; the copies keep Tables.load working for anything else).

Usage: python3 tools/make_sf1synth.py [outDir]   # default /tmp/graft_sf1synth
"""
import shutil
import sys
from pathlib import Path

import duckdb

SRC = Path("/root/testdata/sf0.1")


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1synth")
    out.mkdir(parents=True, exist_ok=True)
    for p in SRC.glob("*.parquet"):
        if p.name != "documents.parquet":
            shutil.copy(p, out / p.name)
    con = duckdb.connect()
    shards = []
    for k in range(10):
        if k == 0:
            shards.append(f"""
              SELECT doc_id, text, lang, source, n_chars
              FROM read_parquet('{SRC}/documents.parquet')""")
        else:
            tag = chr(ord('a') + k)
            shards.append(f"""
              SELECT doc_id + {k * 1_000_000} AS doc_id,
                list_aggregate(list_transform(string_split(text, ' '),
                  w -> w || 'x{tag}'),
                  'string_agg', ' ') AS text,
                lang, source,
                CAST(NULL AS BIGINT) AS n_chars
              FROM read_parquet('{SRC}/documents.parquet')""")
    union = " UNION ALL ".join(shards)
    con.execute(f"""
      COPY (SELECT doc_id, text, lang, source,
              COALESCE(n_chars, length(text)) AS n_chars
            FROM ({union}) ORDER BY doc_id)
      TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    n, avg = con.execute(
        f"SELECT count(*), avg(length(text)) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()
    print(f"{out}/documents.parquet: {n} rows, avg len {avg:.1f}")


if __name__ == "__main__":
    main()
