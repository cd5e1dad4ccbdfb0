#!/usr/bin/env python3
"""Merge bench artifacts produced by SEPARATE JVM runs into one record.

Purpose (r12 verdict #2): at the >=10x audit scales the streaming
family's micro-batch queries are latency-bound and absorb the suite
JVM's accumulated state when they run after ~150 other queries
(+1.5-7.6 s/query at sf1 with unchanged code — adjudicated solo in
NOTES r12). closing.sh therefore runs the >=10x full-surface audit as
TWO sbt invocations — SPARK_GRAFT_EXCLUDE=st for the main surface and
SPARK_GRAFT_ONLY=st for the streaming family, each a fresh JVM — and
this script merges the two JSON lines into the committed artifact,
stamping `fresh_jvm_families` so the split is visible in the record.

Usage:
  python3 tools/merge_bench.py MAIN.json FAMILY.json [FAMILY2.json ...]
      --fresh st[,mm] > merged.json

Per-query maps must be disjoint (the EXCLUDE/ONLY prefixes guarantee
it; overlaps are an invocation error and refuse). Totals are sums,
budget_exhausted is OR, failures concatenate, `sf` must agree.
"""
import json
import sys

args = sys.argv[1:]
fresh = []
paths = []
i = 0
while i < len(args):
    if args[i] == "--fresh":
        fresh = [x for x in args[i + 1].split(",") if x]
        i += 2
    else:
        paths.append(args[i])
        i += 1

assert len(paths) >= 2, "pass at least two bench artifacts"
# r14 ADVICE #1: with --fresh omitted the per-artifact prefix check
# below is vacuously False and every merge fails even on valid inputs —
# the flag is how the merged record documents its JVM split, so require
# it explicitly instead of silently accepting an undocumented merge
assert fresh, "pass --fresh with the family prefixes merged from separate JVMs"
runs = [json.load(open(p)) for p in paths]

sfs = {r["sf"] for r in runs}
assert len(sfs) == 1, f"artifacts span different sf dirs: {sfs}"

merged = dict(runs[0])
for i, r in enumerate(runs[1:], start=1):
    # coverage: a family artifact that selected ZERO queries (env typo,
    # renamed family) must refuse here, not merge into an artifact that
    # silently misses the whole family (r13 ADVICE #2)
    assert r["queries"], f"family artifact {paths[i]} contains no queries"
    assert any(q.startswith(f) for f in fresh for q in r["queries"]), (
        f"family artifact {paths[i]} has no query matching any --fresh "
        f"prefix {fresh}: {sorted(r['queries'])[:5]}")
    overlap = set(merged["queries"]) & set(r["queries"])
    assert not overlap, f"per-query maps overlap: {sorted(overlap)[:5]}"
    # `load` and `priced` joined r17 (per-query loadavg/steal evidence
    # and median-iter pricing — r16 verdict #1); merged like the other
    # per-query maps so the family JVM's contention evidence survives
    for key in ("queries", "first_runs", "runs", "load", "priced"):
        if key in merged or key in r:
            merged[key] = {**merged.get(key, {}), **r.get(key, {})}
    # value_wall joined r17 (unpriced sum): older artifacts lack it, in
    # which case value == value_wall by construction — fall back to
    # value on BOTH sides so a merged record never covers a fraction of
    # the surface while the protocol string claims the full unpriced sum
    # (r17 ADVICE #1: dict(runs[0]) kept only the main pass's value_wall)
    merged["value_wall"] = (
        merged.get("value_wall", merged["value"])
        + r.get("value_wall", r["value"]))
    merged["value"] += r["value"]
    merged["first_run_sum"] += r["first_run_sum"]
    merged["budget_exhausted"] = (
        merged.get("budget_exhausted", False) or r.get("budget_exhausted", False))
    merged["over_pin"] = merged.get("over_pin", 0) + r.get("over_pin", 0)
    merged["contended"] = (
        merged.get("contended", False) or r.get("contended", False))
    merged["failures"] = merged.get("failures", []) + r.get("failures", [])
    for tkey in ("iter_times", "stage_times"):
        if tkey in r:
            merged[tkey] = {**merged.get(tkey, {}), **r[tkey]}
# every --fresh prefix must have contributed from SOME family artifact
for f in fresh:
    assert any(q.startswith(f) for r in runs[1:] for q in r["queries"]), (
        f"--fresh prefix '{f}' matched no query in any family artifact")
merged["fresh_jvm_families"] = fresh
merged["protocol"] = merged.get("protocol", "") + (
    "; merged by tools/merge_bench.py from one JVM per family in "
    "fresh_jvm_families plus one for the rest (r12 verdict #2: suite-JVM "
    "state inflated latency-bound streaming queries at >=10x scales)")

json.dump(merged, sys.stdout)
sys.stdout.write("\n")
