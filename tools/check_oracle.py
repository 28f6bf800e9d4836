#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query dumped by
graft.Verify, run its oracle SQL in DuckDB over the same sf parquet tables
and compare values (columns sorted by name, rows as dumped).

Usage: check_oracle.py <sfDir> <verifyOutDir>
NOTE: dev tool only — the Scala library has no dependency on this.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

import gate_common

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # list/array cells -> tuples so pandas can compare them elementwise
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list,)) or
                type(v).__name__ == 'ndarray' else v)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    gate_common.register_views(con, sf_dir)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        dump = f"{out_dir}/{name}"
        if not os.path.isdir(dump):
            print(f"FAIL {name}: no spark dump"); n_bad += 1; continue
        files = sorted(glob.glob(f"{dump}/*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        got, exp = norm(got), norm(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_bad += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_bad += 1; continue
        bad_cols = []
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                pd.testing.assert_series_equal(
                    a.reset_index(drop=True), b.reset_index(drop=True),
                    check_dtype=False, check_names=False, check_exact=True)
            except AssertionError:
                bad_cols.append(c)
        if bad_cols:
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                a, b = got[c].reset_index(drop=True), exp[c].reset_index(drop=True)
                try:
                    neq = ~((a == b) | (a.isna() & b.isna()))
                    i = neq[neq].index[:3]
                    print(f"   {c}: spark={list(a[i])} duck={list(b[i])} at rows {list(i)}")
                except Exception as e:
                    print(f"   {c}: (diff print failed: {e})")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
