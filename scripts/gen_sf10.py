#!/usr/bin/env python3
"""Generate a BENCH-ONLY sf10 dataset — documents + embeddings ONLY.

Second decade of the scaling ladder (VERDICT r15 #9): 10x the sf1 corpus
(500k docs / 200k vectors), for pricing ONLY the persisted/incremental
SERVING faces — the keys whose 100 TB story depends on pruning, not
scanning (ir6b/ir9/ir10/ir14*, dd18/dd20/dd21, ss2b/ss9/ss10/ss12/ss11,
kg6/kg7/kg8, mm7/mm8/mm9, ir16/ir17). The relational tables are not
generated; graft.Bench's per-table-guarded warmup tolerates their absence
and the targeted SPARK_GRAFT_BENCH_ONLY run never touches them.

Same replication contract as gen_sf1.py: replica k shifts doc_id/vec_id
by k * 50000 (the documents stride, so doc<->embedding joins stay
replica-consistent), replica 0 is the sf1 corpus verbatim, other
replicas get per-replica token suffixes / embedding offsets so
dedup/shingle faces see fresh content. 10-file-per-replica directories
keep the Spark scan parallel.

Usage: python3 scripts/gen_sf10.py [dst_dir]  (default /tmp/testdata_sf10)
Requires /tmp/testdata_sf1 (scripts/gen_sf1.py) to exist.
"""
import os
import shutil
import sys

import duckdb

SRC = "/tmp/testdata_sf1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf10"
K = 10
STRIDE = 50000  # sf1 documents cardinality

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
    print(f"{table}: {n} rows in {K} files")


gen("documents", f"""
  SELECT doc_id + {{k}} * {STRIDE} AS doc_id,
         CASE WHEN {{k}} = 0 THEN text
              ELSE array_to_string(
                list_transform(string_split(text, ' '), w -> w || '@' || {{k}}), ' ')
         END AS text,
         lang, source,
         length(CASE WHEN {{k}} = 0 THEN text
              ELSE array_to_string(
                list_transform(string_split(text, ' '), w -> w || '@' || {{k}}), ' ')
         END) AS n_chars
  FROM '{SRC}/documents.parquet/*.parquet'""")

gen("embeddings", f"""
  SELECT vec_id + {{k}} * {STRIDE} AS vec_id,
         CASE WHEN {{k}} = 0 THEN embedding
              ELSE CAST(list_transform(embedding, (x, i) ->
                x + (({{k}} * 37 + i) % 11 - 5) * 0.007) AS FLOAT[])
         END AS embedding,
         label
  FROM '{SRC}/embeddings.parquet/*.parquet'""")
