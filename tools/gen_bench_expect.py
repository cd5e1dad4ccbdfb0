#!/usr/bin/env python3
"""Regenerate BENCH_EXPECT.json from one or more clean full-surface
bench artifacts (BENCH_LOCAL.json-format files passed as argv).

Pin = the MIN over the given runs' per-query de-noised minima, rounded
up to 3 decimals. Every query gets a pin (r7 verdict item #1: universal
spike protection — unpinned heavies recorded single spiked samples in
r6 AND r7). graft.Bench retries (up to twice, budgeted) any query whose
best exceeds max(1.5x pin, pin + 0.5s).

Declared-coverage gate (r11 verdict item #1): every QueryDef declared in
the Scala source must end up with a pin — an unpinned query is exempt
from the spike-retry protocol, exactly the hole that let r6's dd02
artifact stand and left the five r11 post-close queries unprotected.
The script scans --src (default src/main/scala) for QueryDef
declarations and REFUSES to write a pin file that misses any of them;
active only when writing the real pin file (basename BENCH_EXPECT.json),
so tooling tests against scratch expect paths stay self-contained.

Pin-raise guard (r8 verdict item #7; hardened r11 per r10 verdict
item #4): a pin may only be RAISED by more than 1.5x AND more than
+0.5s absolute over its committed value (the same two-sided rule the
bench's spike retry uses, so sub-second noise on tiny pins can't trip
it) when (a) the query is named in --allow-raise and (b) NOTES.md
names it on a structured justification line of the form

    pin-raise: <query> [<query> ...] — <reason>

(the query name must appear as a word on a line starting `pin-raise:`,
BEFORE the em-dash/`--` reason separator — r11 ADVICE: a query name
inside the reason text is prose, not a justification; a stale mention
of the name elsewhere in NOTES.md never counted).
Otherwise the script refuses — a regression can never silently become
the new baseline.

Usage: python3 tools/gen_bench_expect.py BENCH_A.json [BENCH_B.json ...]
         [--allow-raise q1,q2] [--expect PATH] [--notes PATH] [--src DIR]
"""
import json
import math
import os
import re
import statistics
import sys

RAISE_FACTOR = 1.5
RAISE_SLACK_S = 0.5

args = sys.argv[1:]
allow_raise = set()
expect_path = "BENCH_EXPECT.json"
notes_path = "NOTES.md"
src_dir = "src/main/scala"
paths = []
i = 0
while i < len(args):
    if args[i] == "--allow-raise":
        allow_raise |= set(x for x in args[i + 1].split(",") if x)
        i += 2
    elif args[i] == "--expect":
        expect_path = args[i + 1]
        i += 2
    elif args[i] == "--notes":
        notes_path = args[i + 1]
        i += 2
    elif args[i] == "--src":
        src_dir = args[i + 1]
        i += 2
    else:
        paths.append(args[i])
        i += 1

runs = [json.load(open(p)) for p in paths]
assert runs, "pass at least one bench artifact"
# the dir the pins are calibrated at, stamped into the pin file as
# "_pin_dir" (r14 verdict #2): graft.Bench disables pin-based spike
# retries when SPARK_GRAFT_SF_DIR points elsewhere — the >=10x audits
# were burning ~138 s of futile heavy retries against sf0.1 pins and
# always stamping budget_exhausted=true
pin_dirs = {r.get("sf") for r in runs if r.get("sf")}
assert len(pin_dirs) <= 1, f"artifacts span different sf dirs: {pin_dirs}"
pin_dir = pin_dirs.pop() if pin_dirs else "/root/testdata/sf0.1"
queries = {}
for r in runs:
    for k, v in r["queries"].items():
        queries[k] = min(queries.get(k, float("inf")), v)
    # ml04's per-iteration MEDIAN pin (r12 verdict #3): EM wall time has
    # a 28.9-35.5s run-to-run spread at sf0.1, so graft.Bench guards
    # ml04 on median(iter_times) instead of wall time when this key is
    # pinned. statistics.median averages the two middles on even length
    # — graft.Bench computes the identical statistic.
    for q, its in (r.get("iter_times") or {}).items():
        if its:
            k = q + ":iter_median"
            queries[k] = min(queries.get(k, float("inf")),
                             statistics.median(its))

# cold-first pins for memoized queries (r13 verdict #3): a query whose
# de-noised pin is a memo-warm minimum (dd16's band index, ss15's epoch
# fit, mm07's admission frame) has a first run that exceeds the spike
# rule BY CONSTRUCTION in every fresh JVM, burning heavy retries that
# cannot beat the pin. Where the clean runs' own cold sample would trip
# the guard, emit a secondary `<query>:cold` pin = the cleanest observed
# cold run; graft.Bench checks it only while the cold sample is the only
# one (runs == 1). Same-shaped queries whose cold run is within the
# spike envelope get no :cold key — the wall pin already covers them.
cold = {}
for r in runs:
    for k, v in (r.get("first_runs") or {}).items():
        cold[k] = min(cold.get(k, float("inf")), v)
for k, v in cold.items():
    pin = queries.get(k)
    if pin is not None and v > max(1.5 * pin, pin + 0.5):
        queries[k + ":cold"] = v

prev = {}
if os.path.exists(expect_path):
    prev = {k: v for k, v in json.load(open(expect_path)).items()
            if not k.startswith("_")}
notes = open(notes_path).read() if os.path.exists(notes_path) else ""
# structured pin-raise justifications: only names appearing on a line
# that STARTS `pin-raise:` (after optional list bullet), and only in the
# name list BEFORE the reason separator — 'pin-raise: q1 — slower than
# q2' justifies q1, not q2 (r11 ADVICE #1)
pin_raise_names = set()
for line in notes.splitlines():
    m = re.match(r"^\s*(?:[-*]\s*)?pin-raise:\s*(.*)$", line)
    if m:
        name_part = re.split(r"—|--", m.group(1), maxsplit=1)[0]
        # ':' belongs in the name token (r14 ADVICE #3): suffixed pin
        # keys like 'dd16_incremental_band_index:cold' must be
        # justifiable via NOTES.md, not only via --allow-raise
        pin_raise_names |= set(re.findall(r"[A-Za-z0-9_:]+", name_part))

new_pins = {k: math.ceil(v * 1000) / 1000 for k, v in queries.items()}

# declared-coverage gate: only for the real pin file. A missing src
# dir REFUSES instead of skipping (r12 ADVICE #3: a wrong-cwd
# invocation silently reopened the exact unpinned-query hole this
# gate closes while still writing the real pin file).
if os.path.basename(expect_path) == "BENCH_EXPECT.json":
    if not os.path.isdir(src_dir):
        sys.stderr.write(
            f"REFUSING: source dir '{src_dir}' not found — run from the "
            "repo root (or pass --src) so the declared-coverage gate can "
            "scan QueryDef declarations\n")
        sys.exit(1)
    declared = set()
    for root, _, files in os.walk(src_dir):
        for fn in files:
            if fn.endswith(".scala"):
                with open(os.path.join(root, fn)) as f:
                    declared |= set(re.findall(
                        r'QueryDef\.(?:sql|rowsOnly)\(\s*"([A-Za-z0-9_]+)"',
                        f.read()))
    missing = sorted(declared - set(new_pins))
    if missing:
        sys.stderr.write(
            "REFUSING: declared queries without a pin (regenerate from a "
            "clean FULL-surface bench of the CURRENT tree):\n  "
            + " ".join(missing) + "\n")
        sys.exit(1)
    if not declared:
        sys.stderr.write(f"REFUSING: no QueryDef declarations under {src_dir}\n")
        sys.exit(1)

offenders = []
for k, v in sorted(new_pins.items()):
    if k in prev and prev[k] > 0 and v > prev[k] * RAISE_FACTOR \
            and v > prev[k] + RAISE_SLACK_S:
        why = []
        if k not in allow_raise:
            why.append("not in --allow-raise")
        if k not in pin_raise_names:
            why.append(f"no 'pin-raise: {k} ...' line in {notes_path}")
        if why:
            offenders.append(
                f"  {k}: {prev[k]:.3f}s -> {v:.3f}s "
                f"(>{RAISE_FACTOR}x raise; {'; '.join(why)})")
if offenders:
    sys.stderr.write(
        "REFUSING to raise pins (a regression must not become the new "
        "baseline):\n" + "\n".join(offenders) + "\n"
        "Re-run with --allow-raise <names> after documenting the cause "
        f"on a 'pin-raise: <name> — reason' line in {notes_path}.\n")
    sys.exit(1)

comment = (
    "Pinned clean timings (sec, sf0.1 local[32]) for UNIVERSAL bench "
    "spike protection (r7 verdict item #1). graft.Bench gives a query up "
    "to TWO extra runs whenever its best time so far exceeds 1.5x the "
    "value here AND the excess is > 0.5s absolute (budgeted by "
    "heavyBudget). Every query is pinned: r6 (dd02 21.4s vs 0.3s clean) "
    "and r7 (dd05 33.7s vs 0.02s, st01b 10.3s vs 2.4s) both saw UNPINNED "
    "queries record single spiked samples under driver-box load. "
    "Hand-regenerated per round from committed clean runs via "
    "tools/gen_bench_expect.py (which refuses >1.5x pin raises unless "
    "--allow-raise + a NOTES.md entry, and refuses to omit any declared "
    "query); BENCH_LOCAL.json cannot serve this role because driver "
    "runs overwrite it with possibly-spiked values."
)
out = {"_comment": comment, "_pin_dir": pin_dir}
for k in sorted(new_pins):
    out[k] = new_pins[k]
with open(expect_path, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {len(queries)} pins to {expect_path}")
