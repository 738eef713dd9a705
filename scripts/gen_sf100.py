#!/usr/bin/env python3
"""Generate a BENCH-ONLY sf100 dataset — documents + embeddings ONLY.

THIRD decade of the scaling ladder (VERDICT r18 #3): 10x the sf10 corpus
(5M docs / 2M vectors), for pricing the persisted/incremental SERVING
faces a third decade deep — the sized-feed ladder and the expunged
quintet should stay flat (≤ ~1.3x) from sf10 to sf100, which is the
100 TB extrapolation with three points instead of two.

Same replication contract as gen_sf10.py one level up: replica k shifts
doc_id/vec_id by k * 500000 (the sf10 documents stride), replica 0 is the
sf10 corpus verbatim, other replicas get per-replica token suffixes
('#k' — distinct from sf1's '~k' and sf10's '@k') / embedding offsets so
dedup/shingle faces see fresh content. 10-file-per-replica directories
keep the Spark scan parallel (100 files total).

Usage: python3 scripts/gen_sf100.py [dst_dir]  (default /tmp/testdata_sf100)
Requires /tmp/testdata_sf10 (scripts/gen_sf10.py) to exist.
"""
import os
import shutil
import sys

import duckdb

SRC = "/tmp/testdata_sf10"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf100"
K = 10
STRIDE = 500_000  # sf10 documents cardinality

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.sql("PRAGMA threads=16")


def gen(table, select_tpl):
    out = f"{DST}/{table}.parquet"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for k in range(K):
        con.sql(f"COPY ({select_tpl.format(k=k)}) TO "
                f"'{out}/part-{k:02d}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{out}/*.parquet'").fetchone()[0]
    print(f"{table}: {n} rows in {K} files", flush=True)


gen("documents", f"""
  SELECT doc_id + {{k}} * {STRIDE} AS doc_id,
         CASE WHEN {{k}} = 0 THEN text
              ELSE array_to_string(
                list_transform(string_split(text, ' '), w -> w || '#' || {{k}}), ' ')
         END AS text,
         lang, source,
         length(CASE WHEN {{k}} = 0 THEN text
              ELSE array_to_string(
                list_transform(string_split(text, ' '), w -> w || '#' || {{k}}), ' ')
         END) AS n_chars
  FROM '{SRC}/documents.parquet/*.parquet'""")

gen("embeddings", f"""
  SELECT vec_id + {{k}} * {STRIDE} AS vec_id,
         CASE WHEN {{k}} = 0 THEN embedding
              ELSE CAST(list_transform(embedding, (x, i) ->
                x + (({{k}} * 41 + i) % 13 - 6) * 0.005) AS FLOAT[])
         END AS embedding,
         label
  FROM '{SRC}/embeddings.parquet/*.parquet'""")

print(f"done -> {DST}")
