#!/usr/bin/env python3
"""Local emulation of the driver's t2 gate: run Verify output vs DuckDB.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

For each query in oracle_sql.json: execute the SQL in DuckDB (with a view
per parquet table), load the Spark parquet result, sort columns by name,
sort rows, and compare values exactly. Reports per-query PASS/FAIL.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return tbl

def norm(tbl):
    import pandas as pd
    df = tbl.to_pandas() if not isinstance(tbl, __import__("pandas").DataFrame) else tbl
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for f in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_tbl = load_spark(outdir, name)
        if spark_tbl is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck = con.sql(sql).to_df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        s, d = norm(spark_tbl), norm(duck)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1; continue
        # dtype-level report (schema mismatch hint), then exact value compare
        bad = []
        for c in s.columns:
            sv, dv = s[c], d[c]
            if str(sv.dtype) != str(dv.dtype):
                bad.append(f"dtype[{c}]: {sv.dtype} vs {dv.dtype}")
            try:
                neq = (sv.astype(object).where(sv.notna(), None)
                       != dv.astype(object).where(dv.notna(), None))
                cnt = int(neq.sum())
                if cnt:
                    i = neq[neq].index[0]
                    bad.append(f"value[{c}]: {cnt} diffs, first row {i}: "
                               f"{sv.iloc[i]!r} vs {dv.iloc[i]!r}")
            except Exception as e:
                bad.append(f"cmp[{c}]: {e}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:4])); n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
