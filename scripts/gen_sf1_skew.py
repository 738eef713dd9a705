#!/usr/bin/env python3
"""Generate a BENCH-ONLY sf1-scale SKEWED corpus (documents + embeddings).

Every serving number so far rides UNIFORM synthetic data; production corpora
are Zipfian (VERDICT r18 #2). This corpus stresses exactly the plans the
uniform data never does, at the same 50k-doc / 20k-vector scale as
/tmp/testdata_sf1, so per-key readings are directly comparable:

  * Zipf(s=1.1) token distribution over a 10k-word vocab whose HEAD is the
    30-word uniform vocab in frequency order, "the" at rank 1 (~14% of all
    token positions -> df("the") ~= every doc). Stresses: the hot postings
    bucket in ir6b/ir9/ir24/batchServe (one bucket holds a stopword's
    corpus-sized postings list), Layout.writePartitioned's one-file-per-
    bucket write, ta1/ta6's token aggregations.
  * ONE near-duplicate cluster holding 5% of docs (doc_id % 20 == 7):
    clones of a single 60-token template with 2 mutated positions each.
    Stresses: dd3's LSH band buckets (a 2.5k-doc bucket -> ~3M candidate
    pairs), dd4's Jaccard verify fan-out, dd8's giant connected component,
    dd15's hot shingle, sm10's cluster-keyed fold.
  * ONE hub entity ("hash join" injected into doc_id % 10 == 3, i.e. 10% of
    docs; "table scan" into ~1%, "sort merge" into ~1%). Stresses: kg1's
    per-doc entity self-join and groupBy(e1,e2) with a hub key, kg2's
    PageRank mass concentration, fm1's match fan-out.
  * ONE hot embedding cluster (vec_id % 10 == 3, 10% of vectors within a
    tiny ball). Stresses: IVF cell skew in ss2b/ss9/ss11/ss14 (one cell
    holds 10% of the corpus), dd6/dd12's cosine near-dup blocking.
  * Zipfian `source` column (src0 holds ~50% of docs) for sm5's domain
    mixture and any source-keyed groupBy.

NOT an oracle corpus: correctness stays pinned at sf0.01 uniform. Schema is
byte-identical to the sf1 tables (doc_id i64, text str, lang str, source
str, n_chars i64; vec_id i64, embedding list<float32>, label i32), written
as 10-file directories so the Spark scan parallelizes.

Deterministic: seeded python Random, no time/env dependence.

Usage: python3 scripts/gen_sf1_skew.py [dst_dir] (default /tmp/testdata_sf1_skew)
"""
import os
import random
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1_skew"
N_DOCS = 50_000
N_VECS = 20_000
DIM = 64
N_FILES = 10

# uniform-corpus vocab in observed frequency order, "the" promoted to rank 1
HEAD = ["the", "spark", "window", "merge", "table", "column", "vector",
        "stream", "value", "data", "small", "join", "filter", "big", "group",
        "hash", "customer", "sort", "order", "slow", "line", "part", "fast",
        "row", "agg", "key", "query", "a", "scan", "batch"]
VOCAB = HEAD + [f"w{i:05d}" for i in range(len(HEAD), 10_000)]
ZIPF_S = 1.1

rng = random.Random(20260816)

# cumulative Zipf weights for O(log V) sampling via bisect
import bisect
weights = [1.0 / (r + 1) ** ZIPF_S for r in range(len(VOCAB))]
cum = []
tot = 0.0
for w in weights:
    tot += w
    cum.append(tot)


def zipf_token(r):
    return VOCAB[bisect.bisect_left(cum, r.random() * tot)]


LANGS = ["en"] * 8 + ["fr", "zh", "de", "es"]

# one 60-token template; every cluster member mutates exactly 2 positions
template = [zipf_token(rng) for _ in range(60)]


def make_doc(doc_id):
    r = random.Random(doc_id * 2654435761 % (1 << 31))
    if doc_id % 20 == 7:  # the near-dup cluster: 5% of the corpus
        toks = list(template)
        for pos in (r.randrange(60), (r.randrange(59) + 31) % 60):
            toks[pos] = VOCAB[30 + r.randrange(2000)]
    else:
        n = 10 + r.randrange(91)
        toks = [zipf_token(r) for _ in range(n)]
    if doc_id % 10 == 3:   # the hub entity: 10% of docs
        toks[len(toks) // 2:len(toks) // 2] = ["hash", "join"]
    if doc_id % 97 == 5:   # minor entities keep the kg graph connected
        toks[:0] = ["table", "scan"]
    if doc_id % 101 == 9:
        toks.extend(["sort", "merge"])
    text = " ".join(toks)
    lang = LANGS[r.randrange(len(LANGS))]
    return text, lang


# geometric source picker: src0 ~50%, src1 ~25%, ... clamped at src19
def source_of(r):
    k = 0
    while k < 19 and r.random() >= 0.5:
        k += 1
    return f"src{k}"


os.makedirs(DST, exist_ok=True)

out = f"{DST}/documents.parquet"
shutil.rmtree(out, ignore_errors=True)
os.makedirs(out)
per = N_DOCS // N_FILES
for f in range(N_FILES):
    ids, texts, langs, sources, nchars = [], [], [], [], []
    for doc_id in range(f * per, (f + 1) * per):
        r = random.Random(doc_id * 2654435761 % (1 << 31))
        text, lang = make_doc(doc_id)
        ids.append(doc_id)
        texts.append(text)
        langs.append(lang)
        sources.append(source_of(r))
        nchars.append(len(text))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(nchars, pa.int64()),
    })
    pq.write_table(t, f"{out}/part-{f:02d}.parquet")
print(f"documents: {N_DOCS} rows in {N_FILES} files")

out = f"{DST}/embeddings.parquet"
shutil.rmtree(out, ignore_errors=True)
os.makedirs(out)
center = [random.Random(99).uniform(-0.5, 0.5) for _ in range(DIM)]
per = N_VECS // N_FILES
for f in range(N_FILES):
    ids, vecs, labels = [], [], []
    for vec_id in range(f * per, (f + 1) * per):
        r = random.Random(vec_id * 40503 % (1 << 31) + 7)
        if vec_id % 10 == 3:  # hot cluster: 10% of vectors in a tiny ball
            v = [c + r.uniform(-0.01, 0.01) for c in center]
        else:
            v = [r.uniform(-1.0, 1.0) for _ in range(DIM)]
        ids.append(vec_id)
        vecs.append([float(x) for x in v])
        labels.append(vec_id % 10)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(t, f"{out}/part-{f:02d}.parquet")
print(f"embeddings: {N_VECS} rows in {N_FILES} files")
print(f"done -> {DST}")
