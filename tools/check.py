#!/usr/bin/env python3
"""Local emulation of the driver's t2 gate: run Verify output vs DuckDB.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

For each query in oracle_sql.json: execute the SQL in DuckDB (with a view
per parquet table), load the Spark parquet result, sort columns by name,
sort rows, and compare values exactly. Reports per-query PASS/FAIL.
"""
import json, sys, glob, os, time
import duckdb
import pyarrow.parquet as pq

# Optional: --json <path> writes a per-query artifact {name: {ok, rows, sec}}
# so every round ships a builder-run gate record (VERDICT r12 Next #1b).

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
    argv = list(sys.argv[1:])
    json_path = None
    usage = "usage: check.py <sfDir> <verifyOutDir> [--json <path>] [query ...]"
    if "--json" in argv:
        i = argv.index("--json")
        # a trailing --json with no path must die with a usage line, not
        # an IndexError traceback after the expensive Spark run
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            sys.exit(usage)
        json_path = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) < 2:
        sys.exit(usage)
    sfdir, outdir = argv[0], argv[1]
    only = set(argv[2:])
    record = {}
    t_all = time.time()
    con = duckdb.connect()
    for f in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        spark_tbl = load_spark(outdir, name)
        if spark_tbl is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            record[name] = {"ok": False, "err": "no spark output"}; continue
        try:
            duck = con.sql(sql).to_df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1
            record[name] = {"ok": False, "err": f"duckdb: {e}"[:200]}; continue
        s, d = norm(spark_tbl), norm(duck)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1; record[name] = {"ok": False, "err": "columns"}; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); n_fail += 1
            record[name] = {"ok": False, "err": f"rows {len(s)} vs {len(d)}"}; continue
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
        sec = round(time.time() - t0, 2)
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:4])); n_fail += 1
            record[name] = {"ok": False, "err": "; ".join(bad[:4])[:200], "sec": sec}
        else:
            print(f"PASS {name} ({len(s)} rows, {sec}s)"); n_pass += 1
            record[name] = {"ok": True, "rows": len(s), "sec": sec}
    total = round(time.time() - t_all, 1)
    print(f"== {n_pass} pass, {n_fail} fail ({total}s oracle wall)")
    if json_path:
        with open(json_path, "w") as fh:
            json.dump({"pass": n_pass, "fail": n_fail, "total_sec": total,
                       "queries": record}, fh, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)

main()
