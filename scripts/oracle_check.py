#!/usr/bin/env python3
"""Pre-validate every catalog oracle: run the dumped oracle SQL in DuckDB
against the testdata tables and compare rows/schema-names/values with the
Spark parquet output from graft.Verify. Mirrors the driver's compare
(sort columns by name, order-insensitive row hash)."""
import duckdb, json, sys, math

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
vout = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f"{vout}/oracle_sql.json"))

def norm(v):
    if isinstance(v, bool): return str(int(v))
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return f"{v:.9g}"
    if isinstance(v, int): return f"{v:.9g}"
    return str(v)

npass = nfail = 0
import os
for q in sorted(os.listdir(vout)):
    if q == "oracle_sql.json": continue
    sdf = con.execute(f"SELECT * FROM read_parquet('{vout}/{q}/*.parquet')").df()
    if q not in oracle:
        print(f"{q:28s} rows_only spark_rows={len(sdf)}")
        continue
    try:
        odf = con.execute(oracle[q]).df()
    except Exception as e:
        print(f"{q:28s} ORACLE_SQL_ERROR {e}"); nfail += 1; continue
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        print(f"{q:28s} SCHEMA spark={scols} oracle={ocols}"); nfail += 1; continue
    if len(sdf) != len(odf):
        print(f"{q:28s} ROWS spark={len(sdf)} oracle={len(odf)}"); nfail += 1; continue
    sh = sorted("|".join(norm(v) for v in row) for row in sdf[scols].itertuples(index=False))
    oh = sorted("|".join(norm(v) for v in row) for row in odf[scols].itertuples(index=False))
    if sh != oh:
        diffs = [(a, b) for a, b in zip(sh, oh) if a != b][:3]
        print(f"{q:28s} HASH first diffs: {diffs}"); nfail += 1; continue
    npass += 1
print(f"\n{npass} PASS, {nfail} FAIL")
sys.exit(1 if nfail else 0)
