#!/usr/bin/env python3
"""Generate a ZIPFIAN-VOCABULARY documents fixture for the dedup-family
at-scale audit (r10 verdict item #2, carried from r9 #1).

Why: every graded documents table (driver testdata AND /tmp/sf1 AND
/tmp/sf3) draws tokens UNIFORMLY from a 31-word vocabulary. At 150 000
docs that saturates the shingle index's df<=100 stop-shingle prune —
all 29 791 possible trigrams have df >= 123, so the pruned index is
EMPTY and dd02/dd06/dd09-dd13's "30x cold cost" measured the degenerate
all-pruned regime, not the realistic one the prefix-filtered PPJoin is
designed for. Real text is Zipfian: most shingles are rare (df=1..10,
the join's working set), a thin head is common (pruned). This fixture
plants that regime: 30 000-word vocab, token probability ~ 1/rank^1.07
(the classic fit for natural-language unigrams), doc lengths 10-100,
plus the same 0.2% exact + 0.2% one-token-changed near-duplicates the
uniform fixtures plant (so dd01/dd03-dd05/dd08 still have signal).

Embeddings are generated exactly like tools/gen_sf3_ddss.py (10-cluster
64-dim unit vectors, seed 42) scaled to n_emb, so a dd-family bench run
(which includes dd07/dd07b) works against the same directory.

The fixture is SCALE-PARAMETERIZED so the cold-cost curve lives in one
vocab regime: generate 1x/10x/30x points and bench each.

Usage: python3 tools/gen_zipf_docs.py [outdir=/tmp/sf3_zipf]
           [n_doc=150000] [n_emb=60000]
       # curve points:
       python3 tools/gen_zipf_docs.py /tmp/zipf1x  5000  2000
       python3 tools/gen_zipf_docs.py /tmp/zipf10x 50000 20000
       python3 tools/gen_zipf_docs.py /tmp/zipf30x 150000 60000
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf3_zipf"
N_DOC = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
N_EMB = int(sys.argv[3]) if len(sys.argv) > 3 else 60_000
V, ZIPF_S = 30_000, 1.07

rng = np.random.RandomState(42)
os.makedirs(OUT, exist_ok=True)

# ---- documents: Zipfian unigram draw over a 30k vocab ---------------
ranks = np.arange(1, V + 1)
p = 1.0 / ranks ** ZIPF_S
p /= p.sum()
vocab = np.array([f"w{r}" for r in ranks])
lens = rng.randint(10, 101, N_DOC)
offsets = np.concatenate([[0], np.cumsum(lens)])
all_toks = vocab[rng.choice(V, offsets[-1], p=p)]
texts = [" ".join(all_toks[offsets[i]:offsets[i + 1]]) for i in range(N_DOC)]
# ~0.2% exact duplicates + ~0.2% near-duplicates (one token changed),
# same planting scheme as gen_sf1.py / gen_sf3_ddss.py
for _ in range(N_DOC // 500):
    src = rng.randint(0, N_DOC)
    texts[rng.randint(0, N_DOC)] = texts[src]
    toks = texts[src].split()
    toks[rng.randint(len(toks))] = vocab[rng.choice(V, p=p)]
    texts[rng.randint(0, N_DOC)] = " ".join(toks)
langs = np.array(["en", "zh", "es", "fr", "de"])
lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
pq.write_table(pa.table({
    "doc_id": pa.array(np.arange(N_DOC), pa.int64()),
    "text": texts,
    "lang": langs[rng.choice(5, N_DOC, p=lang_p)],
    "source": [f"src{rng.randint(20)}" for _ in range(N_DOC)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}), f"{OUT}/documents.parquet")
print(f"documents: {N_DOC} rows (vocab {V}, zipf s={ZIPF_S})")

# ---- embeddings: identical scheme to gen_sf3_ddss.py ----------------
centers = rng.normal(0, 1, (10, 64))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
lab = rng.randint(0, 10, N_EMB)
emb = centers[lab] + rng.normal(0, 0.25, (N_EMB, 64))
emb /= np.linalg.norm(emb, axis=1, keepdims=True)
pq.write_table(pa.table({
    "vec_id": pa.array(np.arange(N_EMB), pa.int64()),
    "embedding": pa.array([row for row in emb.astype(np.float32)],
                          pa.list_(pa.float32())),
    "label": pa.array(lab, pa.int32()),
}), f"{OUT}/embeddings.parquet")
print(f"embeddings: {N_EMB} rows")

# quick regime check: trigram df distribution on a sample
sample = texts[:: max(1, N_DOC // 5000)][:5000]
from collections import Counter
dfc = Counter()
for t in sample:
    tk = t.split()
    dfc.update(set(zip(tk, tk[1:], tk[2:])))
n = len(dfc)
common = sum(1 for v in dfc.values() if v > 100)
print(f"sample trigram stats: {n} distinct in {len(sample)} docs, "
      f"{common} with df>100 ({100.0 * common / max(n, 1):.2f}%)")
print("done ->", OUT)
