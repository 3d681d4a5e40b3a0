#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare to the Spark parquet dumps in
the verify outDir (columns sorted by name, rows sorted, values hashed).
Usage: compare_oracle.py <sfDir> <verifyOutDir> [name1,name2,...]
"""
import json, sys, glob, math
import duckdb, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.10g}"
    return str(v)

fails = 0
for name in sorted(oracle):
    if only is not None and name not in only: continue
    sql = oracle[name]
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    if sorted(sdf.columns) != sorted(odf.columns):
        print(f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        fails += 1
        continue
    a, b = canon(sdf), canon(odf)
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
        fails += 1
        continue
    mismatch = None
    for c in a.columns:
        av = [norm(x) for x in a[c]]
        bv = [norm(x) for x in b[c]]
        if av != bv:
            idx = next(i for i in range(len(av)) if av[i] != bv[i])
            mismatch = (c, idx, av[idx], bv[idx])
            break
    if mismatch:
        c, i, x, y = mismatch
        print(f"FAIL {name}: col {c} row {i}: spark={x} oracle={y}")
        fails += 1
    else:
        print(f"PASS {name} ({len(a)} rows)")

# rows-only entries (queries without oracle)
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = d.rstrip("/").split("/")[-1]
    if name in oracle: continue
    if only is not None and name not in only: continue
    files = glob.glob(f"{d}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    print(f"ROWS {name}: {n}")
print(f"\n{fails} failures")
