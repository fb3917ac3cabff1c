"""Subset oracle check: like check_oracle.py but only for the query
names given as argv[3:] — used for sf0.1 spot checks where the full
recursive-CTE oracles (q_cc, q_eigencentrality) would make DuckDB spill
tens of GB of temp."""
import duckdb, json, sys, glob
import pyarrow.parquet as pq

sfdir = sys.argv[1]
outdir = sys.argv[2]
names = sys.argv[3:]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracles = json.load(open(f'{outdir}/oracle_sql.json'))
def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df
fails = 0
for name in names:
    sql = oracles[name]
    exp = canon(con.execute(sql).df())
    files = glob.glob(f'{outdir}/{name}/*.parquet')
    got = canon(pq.ParquetDataset(files).read().to_pandas())
    if list(exp.columns) != list(got.columns):
        print(f'FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}'); fails += 1; continue
    if len(exp) != len(got):
        print(f'FAIL {name}: rows exp={len(exp)} got={len(got)}'); fails += 1; continue
    eq = True
    for c in exp.columns:
        a, b = exp[c], got[c]
        try:
            if not (a.astype('float64').values == b.astype('float64').values).all(): eq = False
        except Exception:
            if not (a.astype(str).values == b.astype(str).values).all(): eq = False
        if not eq:
            import numpy as np
            bad = (a.astype(str).values != b.astype(str).values)
            idx = np.nonzero(bad)[0][:3] if bad.any() else []
            print(f'  col {c} first diffs:', [(exp[c].iloc[i], got[c].iloc[i]) for i in idx])
            break
    print(('OK  ' if eq else 'FAIL') + f' {name}: {len(got)} rows')
    fails += 0 if eq else 1
sys.exit(1 if fails else 0)
