#!/usr/bin/env python3
"""Generate a 30x (vs sf0.1) fixture of ONLY the tables the GRAPH
family reads — orders, lineitem, supplier — at /tmp/sf3g (r13 verdict
optional item #8: the graph family had no multi-scale row beyond sf1;
gr01's edge build and gr02's component search both join
orders x lineitem, so a 30x point tests whether the persisted-edge
layout and the stats-chosen local/distributed union-find dial hold).

Same distributions and seed-42 scheme as tools/gen_sf1.py, 3x its
orders (gr03 reads documents and already has the /tmp/sf3 30x point).

Usage: python3 tools/gen_sf3_graph.py [outdir=/tmp/sf3g]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf3g"
rng = np.random.RandomState(42)
os.makedirs(OUT, exist_ok=True)

N_CUST, N_SUPP, N_PART = 150_000, 10_000, 200_000
N_ORD = 4_500_000  # 3x gen_sf1.py


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


write("supplier", pa.table({
    "s_suppkey": pa.array(np.arange(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.randint(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2),
}))

T0 = np.datetime64("1995-01-01")
odate_days = rng.randint(0, 2404, N_ORD)
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

nlines = rng.randint(1, 8, N_ORD)
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
print("done ->", OUT)
