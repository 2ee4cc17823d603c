#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: compare Verify output parquet
against SparkEntry.oracleSql run in DuckDB on the same tables.
Usage: python3 tools/check_oracles.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize values to strings with float rounding for stable compare
    def norm(v):
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)
    df = df.apply(lambda c: c.map(norm))
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails, passes, skips = [], [], []
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracle:
        skips.append((name, len(spark_df)))
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle error: {str(e).splitlines()[0]}")); continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        fails.append((name, f"columns: spark={list(a.columns)} duck={list(b.columns)}")); continue
    if len(a) != len(b):
        fails.append((name, f"rows: spark={len(a)} duck={len(b)}")); continue
    if not a.equals(b):
        diff = (a != b).any(axis=1)
        i = diff.idxmax()
        fails.append((name, f"values differ at row {i}: spark={a.loc[i].tolist()} duck={b.loc[i].tolist()}"))
        continue
    passes.append((name, len(a)))

print(f"PASS {len(passes)}  FAIL {len(fails)}  rows-only {len(skips)}")
for n, r in passes: print(f"  pass {n} ({r} rows)")
for n, r in skips: print(f"  rows-only {n} ({r} rows)")
for n, m in fails: print(f"  FAIL {n}: {m}")
sys.exit(1 if fails else 0)
