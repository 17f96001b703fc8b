#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Reads oracle_sql.json + per-query parquet dirs from the Verify outDir, runs
each oracle against the same sf tables in DuckDB, and reports rows / schema /
value match per query (values compared exactly after sorting columns by name
and rows by all columns — the strictest plausible driver behavior).
"""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        print(f"{name}: MISSING spark output"); fail += 1; continue
    spark_df = pq.read_table(files).to_pandas()
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fail += 1; continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(s.columns)} duck={list(d.columns)}"); fail += 1; continue
    if len(s) != len(d):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(s)} duck={len(d)}"); fail += 1; continue
    # array-valued cells (list<...> columns) are unhashable for sort_values;
    # canonicalize them to tuples on BOTH sides first
    def tuplify(df):
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(
                    lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "__len__")
                    and not isinstance(v, (str, bytes)) else v)
        return df
    s, d = tuplify(s), tuplify(d)
    sv = s.sort_values(list(s.columns)).reset_index(drop=True)
    dv = d.sort_values(list(d.columns)).reset_index(drop=True)
    # dtype check (schema-match proxy)
    dt_mismatch = [(c, str(sv[c].dtype), str(dv[c].dtype)) for c in s.columns
                   if str(sv[c].dtype) != str(dv[c].dtype)]
    try:
        pd.testing.assert_frame_equal(sv, dv, check_dtype=False, check_exact=True)
        ok = True
    except AssertionError as e:
        ok = False
        msg = str(e).split("\n")[0:6]
    if ok and not dt_mismatch:
        print(f"{name}: OK ({len(s)} rows)")
    elif ok:
        print(f"{name}: VALUES OK but DTYPE MISMATCH {dt_mismatch}"); fail += 1
    else:
        print(f"{name}: VALUE MISMATCH {' | '.join(msg)}"); fail += 1
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
