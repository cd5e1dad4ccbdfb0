#!/usr/bin/env python3
"""Generate a 30x (vs sf0.1) fixture of ONLY the two tables the dedup
and similarity families read — documents.parquet and embeddings.parquet
— at /tmp/sf3 (r7 verdict stretch item 8: both sf1-found cliffs were in
the dd/ss families; a 30x point confirms the prefix-filter and
adaptive-k curves hold past the 10x audit).

Same distributions, dup rates, vocab, and cluster structure as
tools/gen_sf1.py (seed 42, numpy RandomState), just 3x its row counts;
the relational tables are omitted so generation and disk stay small.

Usage: python3 tools/gen_sf3_ddss.py [outdir=/tmp/sf3]
"""
import sys
import os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf3"
rng = np.random.RandomState(42)
os.makedirs(OUT, exist_ok=True)

N_DOC, N_EMB = 150_000, 60_000


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


# ---- documents (31-token vocab, dups + near-dups for dd02-dd10) -----
vocab = np.array(("batch part spark line column order small sort fast value "
                  "scan a hash slow group g vector query agg table big join "
                  "shuffle read write disk cache plan task row key").split())
assert len(vocab) == 31
langs = np.array(["en", "zh", "es", "fr", "de"])
lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
texts = []
for i in range(N_DOC):
    n = rng.randint(10, 101)
    texts.append(" ".join(vocab[rng.randint(0, 31, n)]))
# ~0.2% exact duplicates + ~0.2% near-duplicates (one token changed)
for _ in range(N_DOC // 500):
    src = rng.randint(0, N_DOC)
    texts[rng.randint(0, N_DOC)] = texts[src]
    toks = texts[src].split()
    toks[rng.randint(len(toks))] = vocab[rng.randint(31)]
    texts[rng.randint(0, N_DOC)] = " ".join(toks)
write("documents", pa.table({
    "doc_id": pa.array(np.arange(N_DOC), pa.int64()),
    "text": texts,
    "lang": langs[rng.choice(5, N_DOC, p=lang_p)],
    "source": [f"src{rng.randint(20)}" for _ in range(N_DOC)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}))

# ---- embeddings (64-dim float32, 10 clusters, unit-ish norm) --------
centers = rng.normal(0, 1, (10, 64))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
lab = rng.randint(0, 10, N_EMB)
emb = centers[lab] + rng.normal(0, 0.25, (N_EMB, 64))
emb /= np.linalg.norm(emb, axis=1, keepdims=True)
write("embeddings", pa.table({
    "vec_id": pa.array(np.arange(N_EMB), pa.int64()),
    "embedding": pa.array([row for row in emb.astype(np.float32)],
                          pa.list_(pa.float32())),
    "label": pa.array(lab, pa.int32()),
}))
print("done ->", OUT)
