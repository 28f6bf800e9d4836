#!/usr/bin/env python3
"""Strict mirror of the driver's hash gate: sorts columns by name, sorts
rows, and compares pandas hashes (dtype-SENSITIVE, unlike
check_oracle.py's value-wise compare). Catches HUGEINT-vs-int64 class
mismatches before the driver does.

Usage: check_hash.py <sfDir> <verifyOutDir>
NOTE: dev tool only — the Scala library has no dependency on this.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark dump"); n_bad += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in files],
                                 ignore_index=True))
            exp = norm(con.execute(sql).df())
            h1 = pd.util.hash_pandas_object(got, index=False).sum()
            h2 = pd.util.hash_pandas_object(exp, index=False).sum()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__} {e}"); n_bad += 1; continue
        if h1 != h2:
            dt1 = dict(got.dtypes.astype(str)); dt2 = dict(exp.dtypes.astype(str))
            diff = {c: (dt1[c], dt2.get(c)) for c in dt1 if dt1[c] != dt2.get(c)}
            print(f"FAIL {name}: hash mismatch; dtype diffs: {diff or 'none (value diff)'}")
            n_bad += 1; continue
        n_ok += 1
    print(f"== {n_ok} hash-ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
