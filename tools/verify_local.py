#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify.scala's
parquet dumps against the DuckDB oracle, cell by cell, and print the first
mismatches per column. Usage:

  python3 tools/verify_local.py [sf_dir] [out_dir] [only_csv]
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None

oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")


def norm(v):
    import decimal
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.floating,)):
        return repr(float(v))
    return str(v)


fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    sql = oracle[name]
    files = sorted(glob.glob(f'{out_dir}/{name}/*.parquet'))
    if not files:
        print(f'{name}: NO SPARK OUTPUT')
        fails += 1
        continue
    s = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
    try:
        o = con.execute(sql).fetchdf()
    except Exception as e:
        print(f'{name}: ORACLE ERROR {e}')
        fails += 1
        continue
    status = []
    if len(s) != len(o):
        status.append(f'rows {len(s)} vs {len(o)}')
    sc, oc = sorted(s.columns), sorted(o.columns)
    if sc != oc:
        status.append(f'schema {sc} vs {oc}')
    if not status:
        for c in sc:
            a = s[c].reset_index(drop=True).map(norm)
            b = o[c].reset_index(drop=True).map(norm)
            neq = (a != b).values
            if neq.any():
                i = int(np.argmax(neq))
                status.append(
                    f'col {c} row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r} '
                    f'({int(neq.sum())} diffs)')
    if status:
        fails += 1
        print(f'{name}: FAIL  ' + ' | '.join(status))
    else:
        print(f'{name}: ok ({len(s)} rows)')

print(f'\n{fails} failures')
sys.exit(1 if fails else 0)
