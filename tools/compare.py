#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's oracle SQL in
DuckDB against the same parquet tables and diff against the Spark outputs.
Usage: python3 tools/compare.py [verify_out_dir] [sf_dir]
"""
import json, duckdb, os, sys
import pyarrow.parquet as pq

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    pdir = f'{out}/{name}'
    if not os.path.isdir(pdir):
        fails.append((name, 'NO SPARK OUTPUT')); continue
    try:
        dres = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f'ORACLE SQL ERROR: {str(e).splitlines()[0][:200]}')); continue
    sres = pq.read_table(pdir).to_pandas()
    dcols, scols = sorted(dres.columns), sorted(sres.columns)
    if dcols != scols:
        fails.append((name, f'SCHEMA MISMATCH spark={scols} duck={dcols}')); continue
    try:
        d = dres[dcols].round(6).astype(str).sort_values(dcols).reset_index(drop=True)
        s = sres[scols].round(6).astype(str).sort_values(scols).reset_index(drop=True)
    except Exception as e:
        fails.append((name, f'COMPARE ERROR: {e}')); continue
    if len(d) != len(s):
        fails.append((name, f'ROWS spark={len(s)} duck={len(d)}')); continue
    if not d.equals(s):
        diff = (d != s).any(axis=1)
        i = diff[diff].index[:3]
        fails.append((name,
                      f'VALUE MISMATCH rows {list(i)}: spark={s.loc[i].values.tolist()[:2]} '
                      f'duck={d.loc[i].values.tolist()[:2]}'))
    else:
        print(f'OK   {name} ({len(s)} rows)')
for n, m in fails:
    print(f'FAIL {n}: {m}')
print(f'\n{len(oracle) - len(fails)}/{len(oracle)} pass')
sys.exit(1 if fails else 0)
