#!/usr/bin/env bash
# Round-closing audit protocol (r8 verdict item #8: the sf1 full-surface
# audit is part of the standing close, by construction). Run with the
# box otherwise idle — bench numbers are meaningless under load.
#
#   bash tools/closing.sh                # full close (~25 min)
#   bash tools/closing.sh --quick        # skip sf1/sf3 (the per-commit gate)
#   bash tools/closing.sh --audits-only  # only the sf1/sf3 steps
#
# Steps:
#   1. sbt test                 — full spec suite must be green
#   2. Verify + DuckDB parity   — sf0.01 (the driver's t2 gate) AND sf0.1
#   3. clean full bench, sf0.1  — writes BENCH_LOCAL.json (claims record)
#   4. sf1 full-surface audit   — 10x fixture (generated if missing),
#                                 reps=1, captured to BENCH_SF1_LOCAL.json
#   5. sf3 dd/ss family audit   — 30x fixture for the two families with
#                                 scale cliffs (generated if missing)
# After: regenerate pins from the clean run —
#   python3 tools/gen_bench_expect.py BENCH_LOCAL.json
# (the generator REFUSES >1.5x pin raises without --allow-raise + a
# NOTES.md entry) — then commit artifacts + NOTES with the numbers.
set -euo pipefail
cd "$(dirname "$0")/.."

QUICK=${1:-}

if [ "$QUICK" != "--audits-only" ]; then
echo "== 1. spec suite =="
sbt -batch test

echo "== 2. verify + parity (sf0.01, sf0.1) =="
for SF in sf0.01 sf0.1; do
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/$SF /tmp/closing_verify_$SF" \
    > "/tmp/closing_verify_$SF.log" 2>&1
  python3 tools/parity.py "/root/testdata/$SF" "/tmp/closing_verify_$SF" | tail -1
done

echo "== 3. clean full bench (sf0.1) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch 'runMain graft.Bench' 2>/dev/null | grep '"metric"' | tail -1

fi

if [ "$QUICK" != "--quick" ]; then
  echo "== 4. sf1 full-surface audit (10x) =="
  [ -d /tmp/sf1 ] || python3 tools/gen_sf1.py
  # full stdout to a log first: piping sbt output straight through
  # grep/sed is how r9 lost the per-query map (and '^BENCH_JSON' also
  # matches the COMPACT line — anchor the exact prefix).
  # The streaming family runs in its OWN JVM (r12 verdict #2): its
  # micro-batch queries are latency-bound and absorb the suite JVM's
  # accumulated state when they follow ~150 other queries (+1.5-7.6 s
  # per query at sf1 with unchanged code — NOTES r12 solo adjudication).
  # Two sbt invocations = two JVMs by construction; merge_bench.py
  # stamps the split into the committed artifact.
  SPARK_GRAFT_EXCLUDE=st SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_REPS=1 \
    sbt -batch 'runMain graft.Bench' > /tmp/closing_sf1_main.log 2>/dev/null
  grep '^BENCH_JSON: ' /tmp/closing_sf1_main.log | tail -1 \
    | sed 's/^BENCH_JSON: //' > /tmp/closing_sf1_main.json
  SPARK_GRAFT_ONLY=st SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_REPS=1 \
    sbt -batch 'runMain graft.Bench' > /tmp/closing_sf1_st.log 2>/dev/null
  grep '^BENCH_JSON: ' /tmp/closing_sf1_st.log | tail -1 \
    | sed 's/^BENCH_JSON: //' > /tmp/closing_sf1_st.json
  python3 tools/merge_bench.py /tmp/closing_sf1_main.json \
    /tmp/closing_sf1_st.json --fresh st > BENCH_SF1_LOCAL.json
  python3 - <<'PY'
import json
d = json.load(open("BENCH_SF1_LOCAL.json"))
st = sum(v for k, v in d["queries"].items() if k.startswith("st"))
print(f"sf1: {len(d['queries'])} queries, {len(d['failures'])} failures, "
      f"total {d['value']:.1f}s (first {d['first_run_sum']:.1f}s; "
      f"st family {st:.1f}s in its own JVM)")
assert not d["failures"], f"sf1 audit failures: {d['failures']}"
assert d.get("fresh_jvm_families") == ["st"], "merge marker missing"
PY

  echo "== 5. sf3 dd/ss family audit (30x) =="
  [ -d /tmp/sf3 ] || python3 tools/gen_sf3_ddss.py
  SPARK_GRAFT_ONLY=dd,ss SPARK_GRAFT_SF_DIR=/tmp/sf3 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_REPS=1 \
    sbt -batch 'runMain graft.Bench' > /tmp/closing_sf3.log 2>/dev/null
  grep '^BENCH_JSON: ' /tmp/closing_sf3.log | tail -1 \
    | sed 's/^BENCH_JSON: //' > /tmp/closing_sf3.json
  python3 - <<'PY'
import json
d = json.load(open("/tmp/closing_sf3.json"))
print(f"sf3 dd/ss: {len(d['queries'])} queries, {len(d['failures'])} failures, "
      f"first-run sum {d['first_run_sum']:.1f}s (/tmp/closing_sf3.json)")
assert not d["failures"], f"sf3 audit failures: {d['failures']}"
PY
  echo "== 6. sf3 FULL-surface audit (30x, r17 verdict #4) =="
  # all tables at 30x sf0.1 via the parameterized sf1 generator (mult=3)
  # so the 0.1/1/3 scale curve sits on identical distributions; st
  # family in its own JVM like the sf1 audit, merged into the committed
  # artifact
  [ -d /tmp/sf3full ] || python3 tools/gen_sf1.py /tmp/sf3full 3
  SPARK_GRAFT_EXCLUDE=st SPARK_GRAFT_SF_DIR=/tmp/sf3full SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_REPS=1 \
    sbt -batch 'runMain graft.Bench' > /tmp/closing_sf3full_main.log 2>/dev/null
  grep '^BENCH_JSON: ' /tmp/closing_sf3full_main.log | tail -1 \
    | sed 's/^BENCH_JSON: //' > /tmp/closing_sf3full_main.json
  SPARK_GRAFT_ONLY=st SPARK_GRAFT_SF_DIR=/tmp/sf3full SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_REPS=1 \
    sbt -batch 'runMain graft.Bench' > /tmp/closing_sf3full_st.log 2>/dev/null
  grep '^BENCH_JSON: ' /tmp/closing_sf3full_st.log | tail -1 \
    | sed 's/^BENCH_JSON: //' > /tmp/closing_sf3full_st.json
  python3 tools/merge_bench.py /tmp/closing_sf3full_main.json \
    /tmp/closing_sf3full_st.json --fresh st > BENCH_SF3_LOCAL.json
  python3 - <<'PY'
import json
d = json.load(open("BENCH_SF3_LOCAL.json"))
st = sum(v for k, v in d["queries"].items() if k.startswith("st"))
print(f"sf3 full: {len(d['queries'])} queries, {len(d['failures'])} failures, "
      f"total {d['value']:.1f}s (first {d['first_run_sum']:.1f}s; "
      f"st family {st:.1f}s in its own JVM)")
assert not d["failures"], f"sf3 audit failures: {d['failures']}"
assert d.get("fresh_jvm_families") == ["st"], "merge marker missing"
PY
fi

echo "== closing protocol complete =="
