#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate: run each oracle SQL in DuckDB
over the same parquet tables and compare against the Spark results dumped
by graft.Verify. Bit-exact comparison (the driver hash-compares).

Usage: python3 tools/parity.py [sfdir] [verify_out]
(run `sbt "runMain graft.Verify <sfdir> <verify_out>"` first)
"""
import sys, json, glob, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).fetchall()
        want_cols = [d[0] for d in con.description]
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}")
        fail += 1
        continue
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    got = con.execute(f"SELECT * FROM '{files[0]}'").fetchall()
    got_cols = [d[0] for d in con.description]
    # driver sorts columns by name before hashing — do the same
    wperm = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
    gperm = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
    if sorted(want_cols) != sorted(got_cols):
        print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(want_cols)}")
        fail += 1
        continue
    w = [tuple(r[i] for i in wperm) for r in want]
    g = [tuple(r[i] for i in gperm) for r in got]
    if len(w) != len(g):
        print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
        fail += 1
        continue
    bad = None
    for i, (rw, rg) in enumerate(zip(w, g)):
        if rw != rg:
            # report first difference with detail
            for j, (a, b) in enumerate(zip(rw, rg)):
                if a != b and not (isinstance(a, float) and isinstance(b, float)
                                   and math.isnan(a) and math.isnan(b)):
                    bad = (i, sorted(want_cols)[j], a, b)
                    break
            if bad:
                break
    if bad:
        i, c, a, b = bad
        print(f"FAIL {name}: row {i} col {c}: oracle={a!r} spark={b!r}")
        fail += 1
    else:
        print(f"ok   {name} ({len(w)} rows)")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
