#!/usr/bin/env python3
"""Dev-only correctness checker mirroring the driver's t2 gate:
run graft.Verify output parquet vs DuckDB oracle SQL on the same tables.
Usage: python3 scripts/check.py <sfDir> <outDir>"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    pdir = f'{outdir}/{name}'
    if not os.path.isdir(pdir):
        print(f'{name}: MISSING spark output'); fail += 1; continue
    try:
        spark_df = pd.concat([pd.read_parquet(p) for p in sorted(glob.glob(f'{pdir}/*.parquet'))])
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f'{name}: ERROR {e}'); fail += 1; continue
    # driver sorts columns by name before hashing values
    s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    d = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
    if list(s.columns) != list(d.columns):
        print(f'{name}: SCHEMA mismatch spark={list(s.columns)} duck={list(d.columns)}'); fail += 1; continue
    if len(s) != len(d):
        print(f'{name}: ROWS mismatch spark={len(s)} duck={len(d)}'); fail += 1; continue
    mismatch = None
    for c in s.columns:
        a, b = s[c], d[c]
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            eqs = (a.isna() & b.isna()) | (a == b)
        else:
            try:
                eqs = (a.isna() & b.isna()) | (a.astype(object) == b.astype(object))
            except Exception:
                eqs = a.astype(str) == b.astype(str)
        if not bool(eqs.all()):
            i = int((~eqs).idxmax())
            mismatch = f'col {c} row {i}: spark={a.iloc[i]!r} ({a.dtype}) duck={b.iloc[i]!r} ({b.dtype})'
            break
        # dtype compatibility note (driver may be stricter)
        if a.dtype != b.dtype:
            print(f'  [warn] {name}.{c}: dtype spark={a.dtype} duck={b.dtype}')
    if mismatch:
        print(f'{name}: VALUE mismatch {mismatch}'); fail += 1
    else:
        print(f'{name}: OK ({len(s)} rows)'); ok += 1
print(f'\n{ok} OK, {fail} FAIL')
sys.exit(1 if fail else 0)
