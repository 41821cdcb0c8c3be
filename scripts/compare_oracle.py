#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dumped
by graft.Verify, run its oracle SQL in DuckDB over the same parquet tables,
sort columns by name and rows by value, and compare."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray))
                              else (str(v) if v is not None else None))
        # decimals → float for uniformity
        try:
            import decimal
            if df[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
                df[c] = df[c].astype(float)
        except Exception:
            pass
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

fails, passes, skipped = [], [], []
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark_df = duckdb.connect().execute(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracle:
        skipped.append((name, len(spark_df)))
        continue
    try:
        ora_df = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    a, b = canon(spark_df), canon(ora_df)
    if list(a.columns) != list(b.columns):
        fails.append((name, f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"))
        continue
    if len(a) != len(b):
        fails.append((name, f"row count differs: spark={len(a)} oracle={len(b)}"))
        continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
        passes.append(name)
    except AssertionError as e:
        fails.append((name, str(e).split("\n")[0] + " | " + "\n".join(str(e).split("\n")[1:4])))

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"ROWS-ONLY {len(skipped)}: {' '.join(f'{n}({r})' for n, r in skipped)}")
print(f"FAIL {len(fails)}:")
for n, msg in fails:
    print(f"  {n}: {msg[:500]}")
sys.exit(1 if fails else 0)
