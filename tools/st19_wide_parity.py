#!/usr/bin/env python3
"""st19 wide-mode decision-table parity at dial-crossing scale (r15
verdict #2): runs the COMMITTED st19 oracle against the Spark dump on
the 660k `gen_wide_cross.py parity` fixture, staged CTE-by-CTE.

Two mechanical deviations from `parity.py`'s run-the-string form, both
forced by DuckDB 1.0 planner/executor costs at 660k rows and both
equivalence-preserving by construction:

1. Each top-level CTE body is materialized ONCE as a temp table in
   order (the inlined form re-evaluates shared CTEs exponentially —
   the one-string run burned >24 CPU-h without finishing).
2. The `b` signing CTE's 120 plane-literal lambda dots are replaced by
   a join against a `planes` table holding THE SAME constants PARSED
   OUT OF THE COMMITTED SQL STRING, with the same left-to-right lambda
   dot per plane (IEEE order preserved, so not a single sign bit can
   move). The literal form constructs the 64-element list per row per
   plane: measured 229 ms/row/thread = 42 CPU-h for `b` alone; the
   plane-table form signs 660k rows in 16 s at 28 threads. Every other
   CTE body runs VERBATIM.

Result (2026-08-16, r16): 8,786,437 decision rows bit-exact, index
dial r=16 (wide, 4x30-bit lanes) on both engines, planted twin
(delta copy of corpus id 1) convicted on all 4 bands at cos 1.0.

Usage:
  python3 tools/gen_wide_cross.py /tmp/widecross_par 660000 parity
  SPARK_GRAFT_ONLY=st19 sbt 'runMain graft.Verify /tmp/widecross_par /tmp/verify_st19w'
  python3 tools/st19_wide_parity.py
"""
import duckdb, json, re, time, glob
import pandas as pd
t0=time.time()
con=duckdb.connect(); con.execute("SET threads=28")
con.execute("PRAGMA temp_directory='/tmp/duckdb_staged_spill'")
for t in ["documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/tmp/widecross_par/{t}.parquet'")
sql=json.load(open('/tmp/verify_st19w/oracle_sql.json'))['st19_stream_simhash_admission']

# plane constants parsed FROM the committed SQL (sig = first 60 arrays,
# sig_hi = next 60), so the staged run can only test the shipped planes
arrs=re.findall(r'\[(\s*-?1e0(?:,\s*-?1e0){63})\]', sql)
assert len(arrs)==120
planes=[[float(x) for x in a.replace(' ','').split(',')] for a in arrs]
pl=pd.DataFrame({'p':range(120),'w':planes})
con.register('pl_df', pl)
con.execute("CREATE TABLE planes AS SELECT p, w FROM pl_df")

cte_re=re.compile(r'(\w+) AS \(')
def split_ctes(s):
    out=[]; i=0; n=len(s)
    while True:
        m=cte_re.match(s, i)
        if not m: break
        name=m.group(1); j=m.end(); depth=1
        while depth>0:
            c=s[j]
            if c=='(': depth+=1
            elif c==')': depth-=1
            j+=1
        out.append((name, s[m.end():j-1]))
        while j<n and s[j] in ',\n\r\t ': j+=1
        i=j
    return out, s[i:]
ctes, final = split_ctes(sql[5:])

B2 = """
SELECT vec_id, embedding,
  SUM(CASE WHEN p < 60 AND dot > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS sig,
  SUM(CASE WHEN p >= 60 AND dot > 0 THEN CAST(1 AS BIGINT) << (p - 60) ELSE 0 END) AS sig_hi,
  sqrt(list_sum(list_transform(range(1, len(embedding)+1),
    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
FROM (
  SELECT e.vec_id, e.embedding, planes.p,
    list_sum(list_transform(range(1, len(e.embedding)+1),
      i -> CAST(e.embedding[i] AS DOUBLE) * planes.w[i])) AS dot
  FROM embeddings e, planes)
GROUP BY vec_id, embedding
"""

# Verbatim spot-check (r16 ADVICE #3): the staged run substitutes the
# committed `b` signing CTE with the plane-table form, so by itself it
# verifies Spark against the SUBSTITUTE. Before trusting it, run the
# committed `b` body VERBATIM on a deterministic ~100-row sample and
# assert sig/sig_hi/nrm equality with the plane-table form on the same
# rows — if the substitute and the committed expression ever diverge,
# this trips instead of the parity silently passing.
b_verbatim = dict(ctes)['b']
t1=time.time()
con2=duckdb.connect(); con2.execute("SET threads=28")
con2.execute("CREATE VIEW embeddings AS SELECT * FROM "
             "'/tmp/widecross_par/embeddings.parquet' WHERE vec_id % 6600 = 0")
con2.register('pl_df', pl)
con2.execute("CREATE TABLE planes AS SELECT p, w FROM pl_df")
vb = con2.execute(f"SELECT vec_id, sig, sig_hi, nrm FROM ({b_verbatim}) "
                  "ORDER BY vec_id").df()
pt = con2.execute(f"SELECT vec_id, sig, sig_hi, nrm FROM ({B2}) "
                  "ORDER BY vec_id").df()
assert len(vb) > 0 and len(vb) == len(pt), (len(vb), len(pt))
for c in ['vec_id','sig','sig_hi']:
    assert (vb[c].values == pt[c].values).all(), f"verbatim-b mismatch on {c}"
assert (vb['nrm'].values == pt['nrm'].values).all(), "verbatim-b mismatch on nrm"
print(f"verbatim-b spot-check: {len(vb)} rows bit-equal to plane-table "
      f"form in {time.time()-t1:.1f}s", flush=True)
con2.close()

for name, q in ctes:
    t1=time.time()
    if name == 'b':
        # substituted: plane-table signing, same ordered lambda dot,
        # same plane constants (parsed above); all other bodies verbatim
        q = B2
    con.execute(f"CREATE TEMP TABLE {name} AS {q}")
    n=con.execute(f"SELECT COUNT(*) FROM {name}").fetchone()[0]
    print(f"  {name}: {n} rows in {time.time()-t1:.1f}s", flush=True)
t1=time.time()
w=con.execute(final).df()
print(f"final: {len(w)} rows in {time.time()-t1:.1f}s", flush=True)
g=pd.concat([pd.read_parquet(x) for x in glob.glob('/tmp/verify_st19w/st19_stream_simhash_admission/*.parquet')])
def canon(df):
    df=df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind='mergesort').reset_index(drop=True)
w,g=canon(w),canon(g)
print('rows', len(w), len(g))
same = len(w)==len(g)
if same:
    for c in w.columns:
        if str(w[c].dtype)!=str(g[c].dtype):
            print('dtype diff', c, w[c].dtype, g[c].dtype)
        eq = (w[c].values==g[c].values)
        if not eq.all():
            neq=~eq
            print('MISMATCH col',c,'count',int(neq.sum()), 'oracle', w[c].values[neq][:3], 'spark', g[c].values[neq][:3])
            same=False
print('PARITY', 'OK bit-exact' if same else 'FAIL', f'total {time.time()-t0:.0f}s')
