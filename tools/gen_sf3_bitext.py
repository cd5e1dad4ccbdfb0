#!/usr/bin/env python3
"""Generate a 30x-scale BITEXT-REALISTIC embeddings fixture for the
ss10b recall audit (r8 verdict item #2): /tmp/sf3's embeddings have NO
true pairs — every within-cluster cosine is a near-tie, so ANY top-1
alignment metric (identity or tie-collapsed) measures noise-argmax
stability, not shortlist recall. This fixture plants the structure real
margin mining runs on: 60% of label-0 (source) vectors get a TRUE
counterpart on the label-1 (target) side — the source vector plus
per-pair noise whose scale is lognormal-drawn, giving a Zipf-ish spread
of distinct pair margins (cos ~0.85-0.99) — and the rest of both shards
are cluster distractors (cos ~0.2). Exact top-1 for a paired source is
its true counterpart by a wide margin; ANN agreement against it
measures what the shortlist actually recalls.

Shard sizes are 30x the sf0.1 graded scale (A~200 -> 6000/side).

Usage: python3 tools/gen_sf3_bitext.py [outdir=/tmp/sf3_bitext]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf3_bitext"
rng = np.random.RandomState(43)
os.makedirs(OUT, exist_ok=True)

N_SIDE, DIM, N_CLUSTER, PAIR_FRAC = 6000, 64, 10, 0.6

centers = rng.normal(0, 1, (N_CLUSTER, DIM))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)

# source side: cluster structure like the graded fixtures
a_lab = rng.randint(0, N_CLUSTER, N_SIDE)
a = centers[a_lab] + rng.normal(0, 0.25, (N_SIDE, DIM))
a /= np.linalg.norm(a, axis=1, keepdims=True)

# target side: true counterparts for a PAIR_FRAC subset of sources,
# distractors (independent cluster noise) for the rest
b = centers[rng.randint(0, N_CLUSTER, N_SIDE)] + \
    rng.normal(0, 0.25, (N_SIDE, DIM))
paired_src = rng.choice(N_SIDE, int(N_SIDE * PAIR_FRAC), replace=False)
# lognormal noise scale: median cos ~0.97, tail down to ~0.85 — a
# realistic spread of distinct margins instead of near-ties
sigma = np.exp(rng.normal(np.log(0.03), 0.5, paired_src.size))
b[paired_src] = a[paired_src] + \
    sigma[:, None] * rng.normal(0, 1, (paired_src.size, DIM))
b /= np.linalg.norm(b, axis=1, keepdims=True)

emb = np.vstack([a, b]).astype(np.float32)
lab = np.concatenate([np.zeros(N_SIDE, np.int32), np.ones(N_SIDE, np.int32)])
pq.write_table(pa.table({
    "vec_id": pa.array(np.arange(2 * N_SIDE), pa.int64()),
    "embedding": pa.array([row for row in emb], pa.list_(pa.float32())),
    "label": pa.array(lab, pa.int32()),
}), f"{OUT}/embeddings.parquet")
true_cos = (a[paired_src] * b[paired_src]).sum(axis=1)
print(f"wrote {2 * N_SIDE} rows -> {OUT}; {paired_src.size} true pairs, "
      f"cos p5/p50/p95 = {np.percentile(true_cos, 5):.3f}/"
      f"{np.percentile(true_cos, 50):.3f}/{np.percentile(true_cos, 95):.3f}")
