import duckdb, json, sys, glob
import pyarrow.parquet as pq
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_r1'
con = duckdb.connect()
import os
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    # driver testdata is a single parquet file; Spark-written inputs
    # (e.g. the ScaleUp 10x set) are part-file directories
    p = f'{sfdir}/{t}.parquet'
    if os.path.isdir(p):
        p = f'{p}/*.parquet'
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
oracles = json.load(open(f'{outdir}/oracle_sql.json'))
def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df
fails = 0
for name, sql in sorted(oracles.items()):
    try:
        exp = canon(con.execute(sql).df())
        files = glob.glob(f'{outdir}/{name}/*.parquet')
        got = canon(pq.ParquetDataset(files).read().to_pandas())
        if list(exp.columns) != list(got.columns):
            print(f'FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}'); fails+=1; continue
        if len(exp) != len(got):
            print(f'FAIL {name}: rows exp={len(exp)} got={len(got)}'); fails+=1; continue
        # numeric compare exact after casting
        eq = True
        for c in exp.columns:
            a, b = exp[c], got[c]
            try:
                if not (a.astype('float64').values == b.astype('float64').values).all(): eq=False
            except Exception:
                if not (a.astype(str).values == b.astype(str).values).all(): eq=False
            if not eq:
                bad = (a.astype(str).values != b.astype(str).values)
                import numpy as np
                idx = np.nonzero(bad)[0][:3] if bad.any() else []
                print(f'  col {c} first diffs:', [(exp[c].iloc[i], got[c].iloc[i]) for i in idx])
                break
        print(('OK  ' if eq else 'FAIL') + f' {name}: {len(got)} rows')
        fails += 0 if eq else 1
    except Exception as e:
        print(f'ERROR {name}: {e}'); fails += 1
sys.exit(1 if fails else 0)
