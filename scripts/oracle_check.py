#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles: compare Verify output vs DuckDB.

Usage: python3 scripts/oracle_check.py [verify_out_dir] [sf_dir]
"""
import duckdb, json, os, sys
import pyarrow.parquet as pq
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails, oks = [], 0
dirs = [d for d in os.listdir(out) if os.path.isdir(f'{out}/{d}')]
for name in sorted(dirs):
    d = f'{out}/{name}'
    if name not in oracle:
        n = len(pq.read_table(d))
        print(f'{"ROWS" if n else "EMPTY!":6} {name} ({n} rows, no oracle)')
        continue
    try:
        got = pq.read_table(d).to_pandas()
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f'ERR {e}')); continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f'cols {list(got.columns)} vs {list(exp.columns)}')); continue
    if len(got) != len(exp):
        fails.append((name, f'rows {len(got)} vs {len(exp)}')); continue
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
        oks += 1
        print(f'OK     {name} ({len(got)} rows)')
    except Exception as e:
        lines = str(e).splitlines()
        fails.append((name, lines[0] + ' | ' + lines[-1]))
for n, m in fails:
    print(f'FAIL   {n}: {m[:300]}')
print(f'== {oks} ok, {len(fails)} fail ==')
sys.exit(1 if fails else 0)
