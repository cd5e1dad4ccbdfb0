#!/usr/bin/env python3
"""Generate the DIAL-CROSSING fixture for the beyond-clamp band layouts
(r15 candidate (a)): 700k documents and 700k embeddings — past the
2^19 = 524,288 boundary where simhashBitsWide exceeds 15 and mm07/st19
switch from the legacy narrow layout to the wide 4 x 30-bit-lane layout
over a 120-bit fingerprint / 120-plane signature.

Same schemes as the committed at-scale fixtures so the curves compose:
documents follow gen_mm_hotband.py (20% byte-identical "black frame"
payloads + Zipfian 30k-vocab text with ~0.2% planted exact dups);
embeddings follow gen_sf1.py/gen_sf3_ddss.py (64-dim float32, 10
clusters, unit norm) with one planted delta-side exact copy so the
wide layout's conviction path has a pinned witness.

Usage: python3 tools/gen_wide_cross.py [outdir=/tmp/widecross] [n=700000] [parity]

The optional `parity` mode exists because the single-node DuckDB
oracle cannot chew the default fixture at 660k+ docs: Zipfian texts
share 16-char tiles heavily, the distinct-pair space of the banded
self-joins runs to ~10^8-10^9, and DuckDB spills >60 GB before
finishing one query. Parity needs BIT-EXACTNESS of the wide layout
(dial, lanes, prune, decisions), not adversarial density — so parity
mode keeps the planted structure that exercises every decision path
(the 20% byte-identical BLACK hot cluster for the prune, ~0.2% exact
copies for convictions, one embedding twin) but draws every other
payload/embedding UNIFORMLY unique (random-hex texts, unclustered
vectors), keeping per-band df near the uniform expectation and both
engines' pair volumes in the low millions. The default (long-Zipf)
form remains the candidate-volume/wall probe fixture.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/widecross"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 700_000
PARITY = len(sys.argv) > 3 and sys.argv[3] == "parity"
V, ZIPF_S, HOT_FRAC = 30_000, 1.07, 0.20

rng = np.random.RandomState(42)
os.makedirs(OUT, exist_ok=True)

# ---- documents: gen_mm_hotband.py scheme at the crossing scale ------
if PARITY:
    # unique random-hex payloads, 2-4 tiles each: per-band df stays near
    # uniform so the oracle's pair joins stay small
    # every tile doc-unique (a shared filler tile would bias whole
    # payload classes toward one sign pattern and re-explode the bands)
    import hashlib
    nt = rng.randint(2, 5, N)
    texts = [(hashlib.md5(f"parity:{i}:a".encode()).hexdigest()
              + hashlib.md5(f"parity:{i}:b".encode()).hexdigest())[:16 * nt[i]]
             for i in range(N)]
else:
    ranks = np.arange(1, V + 1)
    p = 1.0 / ranks ** ZIPF_S
    p /= p.sum()
    vocab = np.array([f"w{r}" for r in ranks])
    lens = rng.randint(10, 101, N)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    all_toks = vocab[rng.choice(V, offsets[-1], p=p)]
    texts = [" ".join(all_toks[offsets[i]:offsets[i + 1]]) for i in range(N)]
for _ in range(N // 500):
    texts[rng.randint(0, N)] = texts[rng.randint(0, N)]
BLACK = "\x00BLACKFRAME\x00\x00\x00\x00\x00" * 5  # 80 chars = 5 16-byte tiles
hot = rng.choice(N, int(N * HOT_FRAC), replace=False)
for i in hot:
    texts[i] = BLACK
langs = np.array(["en", "zh", "es", "fr", "de"])
lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
pq.write_table(pa.table({
    "doc_id": pa.array(np.arange(N), pa.int64()),
    "text": texts,
    "lang": langs[rng.choice(5, N, p=lang_p)],
    "source": [f"src{rng.randint(20)}" for _ in range(N)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}), f"{OUT}/documents.parquet")
r = 8 + sum(N > (1 << (12 + i)) for i in range(22))
print(f"documents: {N} rows, hot cluster {len(hot)}, dial r={r} "
      f"({'WIDE' if r > 15 else 'narrow'} mode)")

# ---- embeddings: gen_sf1.py scheme + a planted delta-side copy ------
if PARITY:
    # unclustered vectors: sign signatures spread uniformly, candidate
    # volume stays ~uniform-df on both engines
    lab = rng.randint(0, 10, N)
    emb = rng.normal(0, 1, (N, 64))
else:
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.randint(0, 10, N)
    emb = centers[lab] + rng.normal(0, 0.25, (N, 64))
emb /= np.linalg.norm(emb, axis=1, keepdims=True)
emb = emb.astype(np.float32)
# plant: the last vector (id N-1) copies corpus vector 1 exactly; ids
# are assigned so the copy lands on the %5==0 delta side when N%5==1,
# otherwise just overwrite the highest delta-side id
copy_id = N - 1
while copy_id % 5 != 0:
    copy_id -= 1
emb[copy_id] = emb[1]
lab[copy_id] = lab[1]
pq.write_table(pa.table({
    "vec_id": pa.array(np.arange(N), pa.int64()),
    "embedding": pa.array([row for row in emb], pa.list_(pa.float32())),
    "label": pa.array(lab, pa.int32()),
}), f"{OUT}/embeddings.parquet")
n_corp = sum(1 for i in range(N) if i % 5 != 0)
r_e = 8 + sum(n_corp > (1 << (12 + i)) for i in range(22))
print(f"embeddings: {N} rows ({n_corp} corpus), planted copy id {copy_id} "
      f"of corpus id 1, index dial r={r_e} "
      f"({'WIDE' if r_e > 15 else 'narrow'} mode)")
print("done ->", OUT)
