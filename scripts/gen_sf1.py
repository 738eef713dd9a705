#!/usr/bin/env python3
"""Generate a BENCH-ONLY sf1 dataset (10x sf0.1) for the scaling sweep.

Replicates each scalable sf0.1 table 10x with FK-consistent key shifts
(replica k shifts every key by k * <table cardinality>), so joins fan out
exactly as a real 10x corpus would. Content columns are perturbed so
near-dup/shingle queries don't see a degenerate corpus of exact 10x
duplicates: document tokens get a per-replica suffix (replica 0 is the
original corpus verbatim), embedding components get a small deterministic
per-replica offset. Timestamp physical types are preserved (events.ts
stays TIMESTAMP(NANOS) — graft.Tables normalizes it; order/ship dates
stay ms).

NOT an oracle corpus: correctness stays pinned at sf0.01. This exists so
BENCH can measure one more decade of scaling (VERDICT r6 item 4).

Usage: python3 scripts/gen_sf1.py [dst_dir]   (default /tmp/testdata_sf1)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
K = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.sql("PRAGMA threads=16")
con.sql(f"CREATE VIEW reps AS SELECT unnest(range({K})) AS k")

# tables big enough that a single parquet file would serialize the Spark
# scan (a file smaller than maxPartitionBytes is ONE task no matter how
# many row groups): write these as multi-file directories, the layout any
# real warehouse produces
MULTI_FILE = {"orders", "lineitem", "events", "documents", "embeddings"}


def gen(table, select_sql):
    out = f"{DST}/{table}.parquet"
    if table in MULTI_FILE:
        import shutil
        shutil.rmtree(out, ignore_errors=True)
        if os.path.exists(out):
            os.remove(out)
        # one file per replica: a 10-file directory gives the Spark scan 10
        # independent splits (PER_THREAD_OUTPUT stays 1 file here because the
        # small source scan never parallelizes)
        os.makedirs(out)
        for k in range(K):
            part_sql = select_sql.replace("CROSS JOIN reps",
                                          f"CROSS JOIN (SELECT {k} AS k) reps")
            con.sql(f"COPY ({part_sql}) TO '{out}/part-{k:02d}.parquet' "
                    "(FORMAT PARQUET)")
        pat = f"'{out}/*.parquet'"
    else:
        con.sql(f"COPY ({select_sql}) TO '{out}' (FORMAT PARQUET)")
        pat = f"'{out}'"
    n = con.sql(f"SELECT count(*) FROM {pat}").fetchone()[0]
    nf = len(os.listdir(out)) if os.path.isdir(out) else 1
    print(f"{table}: {n} rows in {nf} file(s)")


def src(table):
    return f"'{SRC}/{table}.parquet'"


# dimension constants: copy verbatim
for small in ["region", "nation"]:
    gen(small, f"SELECT * FROM {src(small)}")

gen("customer", f"""
  SELECT c_custkey + k * 15000 AS c_custkey,
         c_name || '~' || k AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM {src('customer')} CROSS JOIN reps ORDER BY c_custkey""")

gen("supplier", f"""
  SELECT s_suppkey + k * 1000 AS s_suppkey,
         s_name || '~' || k AS s_name, s_nationkey, s_acctbal
  FROM {src('supplier')} CROSS JOIN reps ORDER BY s_suppkey""")

gen("part", f"""
  SELECT p_partkey + k * 20000 AS p_partkey,
         p_name || '~' || k AS p_name, p_brand, p_type, p_size, p_retailprice
  FROM {src('part')} CROSS JOIN reps ORDER BY p_partkey""")

gen("orders", f"""
  SELECT o_orderkey + k * 150000 AS o_orderkey,
         o_custkey + k * 15000 AS o_custkey,
         o_orderstatus, o_totalprice,
         CAST(o_orderdate AS TIMESTAMP_MS) AS o_orderdate, o_orderpriority
  FROM {src('orders')} CROSS JOIN reps""")

gen("lineitem", f"""
  SELECT l_orderkey + k * 150000 AS l_orderkey,
         l_partkey + k * 20000 AS l_partkey,
         l_suppkey + k * 1000 AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus,
         CAST(l_shipdate AS TIMESTAMP_MS) AS l_shipdate
  FROM {src('lineitem')} CROSS JOIN reps""")

# this duckdb build writes TIMESTAMP_NS back as us; raw epoch-nanos BIGINT
# reads identically under spark.sql.legacy.parquet.nanosAsLong (a LONG
# column), which is all graft.Tables' `ts div 1000` normalization needs
gen("events", f"""
  SELECT event_id + k * 100000 AS event_id,
         epoch_ns(ts) AS ts,
         user_id + k * 1500 AS user_id,
         event_type, value, props
  FROM {src('events')} CROSS JOIN reps""")

# replica 0 is the original corpus verbatim; other replicas suffix every
# token so shingle/minhash queries see fresh content, not 10x exact dups
gen("documents", f"""
  SELECT doc_id + k * 5000 AS doc_id,
         CASE WHEN k = 0 THEN text
              ELSE array_to_string(
                list_transform(string_split(text, ' '), w -> w || '~' || k), ' ')
         END AS text,
         lang, source,
         length(CASE WHEN k = 0 THEN text
              ELSE array_to_string(
                list_transform(string_split(text, ' '), w -> w || '~' || k), ' ')
         END) AS n_chars
  FROM {src('documents')} CROSS JOIN reps""")

# vec_id shifts by the DOCUMENTS stride (5000, not embeddings' own 2000):
# documents.doc_id joins embeddings.vec_id (j6/al8/gap queries), so each
# replica's vectors must land inside its own doc-id range — a 2000 shift
# paired replica-k vectors with replica-0 text (review r7)
gen("embeddings", f"""
  SELECT vec_id + k * 5000 AS vec_id,
         CAST(list_transform(embedding, (x, i) ->
           x + ((k * 31 + i) % 7 - 3) * 0.01) AS FLOAT[]) AS embedding,
         label
  FROM {src('embeddings')} CROSS JOIN reps""")

print(f"done -> {DST}")
