#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: compare Verify output parquet
against SparkEntry.oracleSql run in DuckDB on the same tables.
Usage: python3 tools/check_oracles.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
from decimal import Decimal
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def colkind(c: pd.Series) -> str:
    """Dtype CLASS of a column — int / float / bool / str / decimal / time.

    The driver's hash is dtype-sensitive where our string-normalized value
    compare is not: DuckDB HUGEINT (e.g. sum(BIGINT) window derivatives that
    skip a CAST back to BIGINT) lands in pandas as float64 and renders "100"
    == Spark's int64 "100" under {v:.6g}, yet hash-mismatches at the driver
    (round-10 t19). Comparing the kind BEFORE values closes that blind spot.
    """
    k = c.dtype.kind
    if k in "iu": return "int"
    if k == "f": return "float"
    if k == "b": return "bool"
    if k in "mM": return "time"
    nn = c.dropna()
    if len(nn) == 0: return "empty"
    v = nn.iloc[0]
    if isinstance(v, bool): return "bool"
    if isinstance(v, Decimal): return "decimal"
    if isinstance(v, int): return "int"
    if isinstance(v, float): return "float"
    if isinstance(v, str): return "str"
    return "other"

# decimal is the one numeric class where the two readers legitimately
# disagree on the pandas container (pyarrow → object Decimal, duckdb →
# Decimal or float64 depending on version); everything else must match.
_COMPAT = {("decimal", "float"), ("float", "decimal"),
           ("decimal", "int"), ("int", "decimal")}

def kinds_ok(a: str, b: str) -> bool:
    return a == b or a == "empty" or b == "empty" or (a, b) in _COMPAT

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
    # dtype-class gate BEFORE the string-normalized value compare
    sk = spark_df.reindex(sorted(spark_df.columns), axis=1)
    dk = duck_df.reindex(sorted(duck_df.columns), axis=1)
    kind_bad = [f"{col}: spark={colkind(sk[col])} duck={colkind(dk[col])}"
                for col in sk.columns if not kinds_ok(colkind(sk[col]), colkind(dk[col]))]
    if kind_bad:
        fails.append((name, "dtype class mismatch — " + "; ".join(kind_bad))); continue
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
