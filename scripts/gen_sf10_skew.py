#!/usr/bin/env python3
"""Generate a BENCH-ONLY sf10-scale SKEWED corpus (documents + embeddings).

The 10x sibling of gen_sf1_skew.py (VERDICT r19 #5: the count-gated salt
has never fired on real data — the sf1 skew corpus's hottest postings
bucket is ~49k rows against the 2^20 default gate). At 500k docs the
stopword bucket holds ~500k postings rows, so with the documented
GRAFT_ROWS_PER_FILE=100000 bench override the hot census is NON-EMPTY and
the salted write path runs for real: hot buckets split into <=32 sorted
files, cold buckets keep the one-file layout byte-for-byte.

Same distributions as sf1_skew (Zipf s=1.1 tokens, 5% template cluster,
hub entity, hot IVF cell, geometric sources), same schema, same seeds per
doc_id — only the scale changes. NOT an oracle corpus.

Usage: python3 scripts/gen_sf10_skew.py [dst] (default /tmp/testdata_sf10_skew)
"""
import os
import random
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf10_skew"
N_DOCS = 500_000
N_VECS = 200_000
DIM = 64
N_FILES = 32

HEAD = ["the", "spark", "window", "merge", "table", "column", "vector",
        "stream", "value", "data", "small", "join", "filter", "big", "group",
        "hash", "customer", "sort", "order", "slow", "line", "part", "fast",
        "row", "agg", "key", "query", "a", "scan", "batch"]
VOCAB = HEAD + [f"w{i:05d}" for i in range(len(HEAD), 10_000)]
ZIPF_S = 1.1

rng = random.Random(20260816)

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
    if doc_id % 97 == 5:
        toks[:0] = ["table", "scan"]
    if doc_id % 101 == 9:
        toks.extend(["sort", "merge"])
    text = " ".join(toks)
    lang = LANGS[r.randrange(len(LANGS))]
    return text, lang


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
        if vec_id % 10 == 3:
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
