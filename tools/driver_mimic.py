"""Driver mimic: plain SparkSession (driver's own config, NOT the engine's
session factory), import __spark_entry__, smoke entry(), then run every
queries() entry at sf0.01 against oracle_sql() via DuckDB.

Usage: python tools/driver_mimic.py [substring ...]
With arguments, only queries whose name contains ANY substring run (the
entry() smoke still runs) — the per-batch verification loop new queries
need without the full 10-minute sweep."""
import sys, math, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]").appName("driver-mimic")
         .config("spark.ui.enabled", "false").getOrCreate())  # deliberately default ANSI/TZ
import __spark_entry__ as mod

t0 = time.time()
df = mod.entry(spark)
rows = df.collect()
print(f"ENTRY: {len(rows)} rows, schema={[f.name for f in df.schema]}, {time.time()-t0:.1f}s")
assert len(rows) > 0

import os

import duckdb
SF = os.environ.get("MIMIC_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon_cell(v):
    if v is None: return "N"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.10g}"
    return str(v)

qs, oracles = mod.queries(), mod.oracle_sql()
wanted = sys.argv[1:]
if wanted:
    qs = {n: f for n, f in qs.items() if any(w in n for w in wanted)}
    print(f"FILTER: {len(qs)} queries match {wanted}")
fails = []
for name, fn in qs.items():
    t0 = time.time()
    try:
        sdf = fn(spark, SF)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:
        fails.append((name, f"SPARK ERROR: {type(e).__name__}: {str(e)[:200]}"))
        print(f"  {name}: SPARK ERROR"); continue
    if name not in oracles:
        print(f"  {name}: rows-only, {len(srows)} rows, {time.time()-t0:.1f}s"); continue
    rel = con.sql(oracles[name]); dcols = rel.columns; drows = rel.fetchall()
    ok_cols = sorted(scols) == sorted(dcols)
    ok_count = len(srows) == len(drows)
    order = sorted(range(len(scols)), key=lambda i: scols[i])
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
    cs = sorted(tuple(canon_cell(r[i]) for i in order) for r in srows)
    cd = sorted(tuple(canon_cell(r[i]) for i in dorder) for r in drows)
    ok_vals = cs == cd
    status = "OK" if (ok_cols and ok_count and ok_vals) else "MISMATCH"
    if status != "OK":
        detail = f"cols={ok_cols} count={ok_count}({len(srows)}/{len(drows)}) vals={ok_vals}"
        if ok_cols and ok_count and not ok_vals:
            diff = [(a,b) for a,b in zip(cs,cd) if a!=b][:2]
            detail += f" first_diff={diff}"
        fails.append((name, detail))
    print(f"  {name}: {status} {len(srows)} rows, {time.time()-t0:.1f}s")

print(f"\n{len(qs)-len(fails)}/{len(qs)} queries OK")
for n, d in fails: print("FAIL", n, d)
sys.exit(1 if fails else 0)
