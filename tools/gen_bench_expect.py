#!/usr/bin/env python3
"""Regenerate BENCH_EXPECT.json from one or more clean full-surface
bench artifacts (BENCH_LOCAL.json-format files passed as argv).

Pin = the MIN over the given runs' per-query de-noised minima, rounded
up to 3 decimals. Every query gets a pin (r7 verdict item #1: universal
spike protection — unpinned heavies recorded single spiked samples in
r6 AND r7). graft.Bench retries (up to twice, budgeted) any query whose
best exceeds max(1.5x pin, pin + 0.5s).

Usage: python3 tools/gen_bench_expect.py BENCH_A.json [BENCH_B.json ...]
"""
import json
import math
import sys

runs = [json.load(open(p)) for p in sys.argv[1:]]
assert runs, "pass at least one bench artifact"
queries = {}
for r in runs:
    for k, v in r["queries"].items():
        queries[k] = min(queries.get(k, float("inf")), v)

comment = (
    "Pinned clean timings (sec, sf0.1 local[32]) for UNIVERSAL bench "
    "spike protection (r7 verdict item #1). graft.Bench gives a query up "
    "to TWO extra runs whenever its best time so far exceeds 1.5x the "
    "value here AND the excess is > 0.5s absolute (budgeted by "
    "heavyBudget). Every query is pinned: r6 (dd02 21.4s vs 0.3s clean) "
    "and r7 (dd05 33.7s vs 0.02s, st01b 10.3s vs 2.4s) both saw UNPINNED "
    "queries record single spiked samples under driver-box load. "
    "Hand-regenerated per round from committed clean runs via "
    "tools/gen_bench_expect.py; BENCH_LOCAL.json cannot serve this role "
    "because driver runs overwrite it with possibly-spiked values."
)
out = {"_comment": comment}
for k in sorted(queries):
    out[k] = math.ceil(queries[k] * 1000) / 1000
with open("BENCH_EXPECT.json", "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {len(queries)} pins to BENCH_EXPECT.json")
