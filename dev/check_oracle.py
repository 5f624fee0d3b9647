#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query output
under OUTDIR (parquet written by graft.Verify), run the matching oracle SQL
from oracle_sql.json in DuckDB over the raw testdata tables, and compare
(sort columns by name, sort rows, value-compare).

Usage: check_oracle.py OUTDIR SFDIR
"""
import json, sys, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            continue
        got = duckdb.connect().execute(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracles:
            print(f"  {name}: NO-ORACLE rows={len(got)}")
            continue
        try:
            want = con.execute(oracles[name]).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                print(f"✗ {name}: COLUMN MISMATCH got={list(g.columns)} want={list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"✗ {name}: ROWCOUNT got={len(g)} want={len(w)}")
                n_fail += 1
                continue
            eq = g.equals(w)
            if not eq:
                # tolerate dtype-only diffs by value compare
                diff = (g.astype(str) != w.astype(str)).any(axis=1)
                bad = diff.sum()
                if bad == 0:
                    eq = True
            if eq:
                print(f"✓ {name}: rows={len(g)}")
                n_pass += 1
            else:
                print(f"✗ {name}: {bad} differing rows of {len(g)}")
                print("   got :", g[diff].head(3).to_dict('records'))
                print("   want:", w[diff].head(3).to_dict('records'))
                n_fail += 1
        except Exception as e:
            print(f"✗ {name}: oracle error {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
