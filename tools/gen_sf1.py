#!/usr/bin/env python3
"""Generate a local sf1 fixture (10x sf0.1) at /tmp/sf1 — VERDICT r3
stretch item 9: turn "no scale-dependent nondeterminism" into a
measured row at 10x the driver's max scale.

The driver's generator is not in this repo, so this synthesizer only
matches the driver fixtures' SCHEMAS (physical parquet types as of
the r5-era fixtures: events.ts timestamp[ns], order/ship dates
timestamp[ms], float32 list embeddings; the r6+ driver fixtures emit
events.ts as timestamp[us] — keeping ns HERE is deliberate, it
exercises the legacy nanosAsLong branch of Tables.events while the
driver fixtures exercise the native-timestamp branch) and their broad value distributions
(cardinality ratios, value domains, duplicate/near-duplicate docs so
the dedup family has work to do). That is sufficient for what sf1
measures: Spark-vs-DuckDB agreement and bench scaling on the SAME
data — fixture fidelity to the driver's rows is neither possible nor
needed. Deterministic: numpy seed 42.

Usage: python3 tools/gen_sf1.py [outdir=/tmp/sf1] [mult=1]

`mult` multiplies every generated row count (r17 verdict #4: the full-
surface sf3 audit needs ALL tables at 30x sf0.1, i.e. mult=3 — one
generator keeps the sf1 and sf3 points on identical distributions so
the 0.1/1/3 scale curve is apples-to-apples). mult=1 reproduces the
historical sf1 fixture byte-for-byte (same seed, same rng call order).
"""
import sys
import shutil
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 1
SRC = "/root/testdata/sf0.1"
SCALE = 10 * MULT
rng = np.random.RandomState(42)

import os
os.makedirs(OUT, exist_ok=True)

def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")

# region/nation are fixed dimensions — copy the driver's verbatim
for t in ("region", "nation"):
    shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    print(f"{t}: copied")

N_CUST, N_SUPP, N_PART = 150_000 * MULT, 10_000 * MULT, 200_000 * MULT
N_ORD, N_EVT = 1_500_000 * MULT, 1_000_000 * MULT
N_DOC, N_EMB = 50_000 * MULT, 20_000 * MULT

# ---- customer / supplier / part --------------------------------------
seg = np.array(["MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD"])
write("customer", pa.table({
    "c_custkey": pa.array(np.arange(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.randint(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": seg[rng.randint(0, 5, N_CUST)],
}))
write("supplier", pa.table({
    "s_suppkey": pa.array(np.arange(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.randint(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2),
}))
colors = ["large", "hot", "blue", "red", "green", "small", "dim", "light"]
nouns = ["ring", "bolt", "screw", "pin", "cap", "gear", "rod", "plate"]
types = np.array(["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"])
write("part", pa.table({
    "p_partkey": pa.array(np.arange(N_PART), pa.int64()),
    "p_name": [f"{colors[rng.randint(8)]} {nouns[rng.randint(8)]}" for _ in range(N_PART)],
    "p_brand": [f"Brand#{rng.randint(25)}" for _ in range(N_PART)],
    "p_type": types[rng.randint(0, 6, N_PART)],
    "p_size": pa.array(rng.randint(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(rng.uniform(900, 2000, N_PART), 2),
}))

# ---- orders / lineitem ----------------------------------------------
T0 = np.datetime64("1995-01-01")
odate_days = rng.randint(0, 2404, N_ORD)  # through 2001-08
status = np.array(["O", "F", "P"])
prio = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
odate_ms = (T0 + odate_days.astype("timedelta64[D]")).astype("datetime64[ms]")
write("orders", pa.table({
    "o_orderkey": pa.array(np.arange(N_ORD), pa.int64()),
    "o_custkey": pa.array(rng.randint(0, N_CUST, N_ORD), pa.int64()),
    "o_orderstatus": status[rng.randint(0, 3, N_ORD)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
    "o_orderdate": pa.array(odate_ms, pa.timestamp("ms")),
    "o_orderpriority": prio[rng.randint(0, 5, N_ORD)],
}))
nlines = rng.randint(1, 8, N_ORD)  # 1..7, mean ~4
l_ord = np.repeat(np.arange(N_ORD), nlines)
N_LI = len(l_ord)
l_num = np.concatenate([np.arange(1, n + 1) for n in nlines])
ship_ms = (np.repeat(odate_days, nlines)
           + rng.randint(1, 121, N_LI)).astype("timedelta64[D]")
ship_ms = (T0 + ship_ms).astype("datetime64[ms]")
rflag = np.array(["A", "N", "R"])
lstat = np.array(["O", "F"])
write("lineitem", pa.table({
    "l_orderkey": pa.array(l_ord, pa.int64()),
    "l_partkey": pa.array(rng.randint(0, N_PART, N_LI), pa.int64()),
    "l_suppkey": pa.array(rng.randint(0, N_SUPP, N_LI), pa.int64()),
    "l_linenumber": pa.array(l_num, pa.int32()),
    "l_quantity": rng.randint(1, 51, N_LI).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, N_LI), 2),
    "l_discount": np.round(rng.randint(0, 11, N_LI) / 100.0, 2),
    "l_tax": np.round(rng.randint(0, 9, N_LI) / 100.0, 2),
    "l_returnflag": rflag[rng.randint(0, 3, N_LI)],
    "l_linestatus": lstat[rng.randint(0, 2, N_LI)],
    "l_shipdate": pa.array(ship_ms, pa.timestamp("ms")),
}))

# ---- events (timestamp[ns]!) ----------------------------------------
E0 = np.datetime64("2024-01-01", "ns")
ets = np.sort(E0 + (rng.uniform(0, 30 * 86400, N_EVT) * 1e9).astype("timedelta64[ns]"))
etype = np.array(["click", "view", "purchase", "signup", "error"])
write("events", pa.table({
    "event_id": pa.array(np.arange(N_EVT), pa.int64()),
    "ts": pa.array(ets, pa.timestamp("ns")),
    "user_id": pa.array(rng.randint(0, 15000, N_EVT), pa.int64()),
    "event_type": etype[rng.randint(0, 5, N_EVT)],
    "value": np.round(rng.uniform(0, 561, N_EVT), 2),
    "props": [f'{{"k": {rng.randint(100)}}}' for _ in range(N_EVT)],
}))

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
