#!/usr/bin/env python3
"""Generate a HOT-BAND documents fixture for the mm07 at-scale audit
(r14, the r13 verdict #1 done-bar: "an mm07 Zipf/hot-band 30x leg
showing near-linear growth").

Why: every graded documents table has unique-ish payloads, so mm07's
perceptual bands stay cold (sf0.1 max band df 55 vs a max(100, N/8)
prune cut) and its measured scale curve never exercises the regime the
stop-band prune exists for. Real binary corpora are NOT like that:
black frames, blank pages, and constant-fill payloads are a large
constant FRACTION of crawled video/image data, they all tile to the
same fingerprint, and the resulting hot band makes the banded
candidate joins quadratic in the cluster size.

This fixture plants that regime: 20% of payloads are byte-identical
"black frames" (one perceptual fingerprint -> 4 bands with df =
0.2*0.8*N_DOC on the corpus side, far above the N/8 cut at every
scale), the rest are Zipfian text payloads (30k vocab, the
gen_zipf_docs.py scheme) with ~0.2% planted exact duplicates so the
sub-threshold evidence path has signal too. Without the prune the
candidate volume grows ~(0.2N)^2; with it the curve should stay
near-linear — that is the measurement.

Scale-parameterized like gen_zipf_docs.py; mm07 reads only documents:

    python3 tools/gen_mm_hotband.py /tmp/mmhot1x  5000
    python3 tools/gen_mm_hotband.py /tmp/mmhot10x 50000
    python3 tools/gen_mm_hotband.py /tmp/mmhot30x 150000
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mmhot30x"
N_DOC = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
V, ZIPF_S, HOT_FRAC = 30_000, 1.07, 0.20

rng = np.random.RandomState(42)
os.makedirs(OUT, exist_ok=True)

ranks = np.arange(1, V + 1)
p = 1.0 / ranks ** ZIPF_S
p /= p.sum()
vocab = np.array([f"w{r}" for r in ranks])
lens = rng.randint(10, 101, N_DOC)
offsets = np.concatenate([[0], np.cumsum(lens)])
all_toks = vocab[rng.choice(V, offsets[-1], p=p)]
texts = [" ".join(all_toks[offsets[i]:offsets[i + 1]]) for i in range(N_DOC)]
# ~0.2% exact duplicates among the normal payloads (sub-threshold
# evidence signal, the gen_zipf_docs.py planting scheme)
for _ in range(N_DOC // 500):
    texts[rng.randint(0, N_DOC)] = texts[rng.randint(0, N_DOC)]
# the hot cluster: 20% byte-identical constant-fill payloads ("black
# frames") spread uniformly over doc_ids so both the %5 delta and the
# corpus sides carry their share
# unit padded to exactly 16 chars (r14 ADVICE #2: the 15-char unit
# yielded 4 tiles + 11 untiled chars, not the documented 5)
BLACK = "\x00BLACKFRAME\x00\x00\x00\x00\x00" * 5  # 80 chars = 5 16-byte tiles
hot = rng.choice(N_DOC, int(N_DOC * HOT_FRAC), replace=False)
for i in hot:
    texts[i] = BLACK

langs = np.array(["en", "zh", "es", "fr", "de"])
lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
pq.write_table(pa.table({
    "doc_id": pa.array(np.arange(N_DOC), pa.int64()),
    "text": texts,
    "lang": langs[rng.choice(5, N_DOC, p=lang_p)],
    "source": [f"src{rng.randint(20)}" for _ in range(N_DOC)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}), f"{OUT}/documents.parquet")
n_hot_corpus = sum(1 for i in hot if i % 5 != 0)
n_corp = sum(1 for i in range(N_DOC) if i % 5 != 0)
# mirror mm07's corpus-adaptive dial (r15, beyond-clamp chain: the
# wide 4x30-bit-lane layout activates past 2^19 docs where r > 15):
# r = 8 + #{i: N > 2^(12+i)}, relative stop cut max(100, 32*Ncorp/2^r)
r = 8 + sum(N_DOC > (1 << (12 + i)) for i in range(22))
print(f"documents: {N_DOC} rows, hot cluster {len(hot)} "
      f"({n_hot_corpus} corpus-side; r={r}, prune cut max(100, "
      f"{32.0 * n_corp / (1 << r):.0f}))")
print("done ->", OUT)
