#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the same
testdata parquet tables, and compares: schema (column names sorted), row
count, and values (rows sorted, compared exactly; floats compared bitwise
after round-trip through repr to surface any ulp drift).
"""
import json, sys, math, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result parquet"); fail += 1; continue
    try:
        spark_df = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").fetchdf()
        duck_df = con.sql(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"FAIL {name}: columns spark={sc} duck={dc}"); fail += 1; continue
    s = spark_df[sc]; d = duck_df[dc]
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); fail += 1; continue
    def norm(df):
        rows = []
        for row in df.itertuples(index=False):
            vals = []
            for v in row:
                if isinstance(v, float):
                    vals.append("NaN" if math.isnan(v) else repr(v))
                else:
                    vals.append(str(v))
            rows.append(tuple(vals))
        return sorted(rows)
    sn, dn = norm(s), norm(d)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        print(f"FAIL {name}: value mismatch; first diffs (spark vs duck): {diffs}")
        fail += 1
    else:
        print(f"OK   {name}: {len(s)} rows")
print(f"\n{'ALL OK' if fail == 0 else str(fail) + ' FAILURES'} / {len(oracle)} oracle queries")
sys.exit(1 if fail else 0)
