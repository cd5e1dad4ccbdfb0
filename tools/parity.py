#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate: run each oracle SQL in DuckDB
over the same parquet tables and compare against the Spark results dumped
by graft.Verify.

Faithful to the driver: both sides are materialized as pandas DataFrames
(con.execute(...).df()), columns sorted by name, rows sorted by ALL
columns, then compared dtype-strictly. This reproduces both driver
failure classes the tuple-based v1 of this script missed:
  - dtype coercion (DuckDB HUGEINT -> float64 vs Spark int64) fails the
    strict compare even when values are numerically equal;
  - array-typed cells crash pandas sort_values (TypeError: unhashable
    numpy.ndarray) exactly as they crash the driver's harness.

Usage: python3 tools/parity.py [sfdir] [verify_out]
(run `sbt "runMain graft.Verify <sfdir> <verify_out>"` first)
"""
import sys, json, glob
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
# DuckDB's default temp dir is the CWD — a big spill (the 700k-doc
# wide-mode oracles hit 60 GB) must land on /tmp, not inside the repo
con.execute("PRAGMA temp_directory='/tmp/duckdb_parity_spill'")
import os
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # fixture dirs (e.g. the dial-crossing /tmp/widecross) carry only
    # the tables their queries read — skip ONLY absent files; a corrupt
    # or unreadable parquet must fail here, not as a confusing per-query
    # error later (r15 ADVICE #5)
    if os.path.exists(f"{SF}/{t}.parquet"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def canon(df):
    """Sort columns by name, rows by all columns — like the driver.
    Raises (like the driver) if a cell is unsortable (e.g. ndarray)."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def first_diff(w, g):
    """(row, col, oracle_val, spark_val, dtype_note) of first mismatch."""
    for c in w.columns:
        if str(w[c].dtype) != str(g[c].dtype):
            return (-1, c, str(w[c].dtype), str(g[c].dtype), "dtype")
    for i in range(len(w)):
        rw, rg = w.iloc[i], g.iloc[i]
        for c in w.columns:
            a, b = rw[c], rg[c]
            # NA-robust compare: `a != b` raises TypeError when exactly
            # one side is pandas.NA (ambiguous boolean) — diagnose via
            # isna first so the mismatch-reporting path can't crash
            try:
                na_a, na_b = bool(pd.isna(a)), bool(pd.isna(b))
            except (TypeError, ValueError):
                na_a = na_b = False  # array-likes: fall through to !=
            if na_a and na_b:
                continue
            if na_a != na_b or a != b:
                return (i, c, a, b, "value")
    return None


oracle = json.load(open(f"{OUT}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}")
        fail += 1
        continue
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    flist = ", ".join(f"'{f}'" for f in sorted(files))
    got = con.execute(f"SELECT * FROM read_parquet([{flist}])").df()
    if sorted(want.columns) != sorted(got.columns):
        print(f"FAIL {name}: cols spark={sorted(got.columns)} oracle={sorted(want.columns)}")
        fail += 1
        continue
    if len(want) != len(got):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
        fail += 1
        continue
    try:
        w, g = canon(want), canon(got)
    except Exception as e:
        print(f"FAIL {name}: pandas sort crash (driver would too): "
              f"{type(e).__name__}: {str(e)[:120]}")
        fail += 1
        continue
    if w.equals(g):
        print(f"ok   {name} ({len(w)} rows)")
        ok += 1
    else:
        d = first_diff(w, g)
        if d is None:
            # equals() is dtype-strict; diff may be dtype-only at a level
            # first_diff's str() compare missed — dump dtypes
            print(f"FAIL {name}: dtype-strict mismatch; "
                  f"oracle={list(map(str, w.dtypes))} spark={list(map(str, g.dtypes))}")
        elif d[4] == "dtype":
            print(f"FAIL {name}: col {d[1]} dtype oracle={d[2]} spark={d[3]}")
        else:
            print(f"FAIL {name}: row {d[0]} col {d[1]}: oracle={d[2]!r} spark={d[3]!r}")
        fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
