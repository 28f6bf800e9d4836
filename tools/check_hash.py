#!/usr/bin/env python3
"""Strict mirror of the driver's hash gate: sorts columns by name, sorts
rows, and compares pandas hashes (dtype-SENSITIVE, unlike
check_oracle.py's value-wise compare). Catches HUGEINT-vs-int64 class
mismatches before the driver does. Canonical form + hash live in
gate_common.py — one spelling shared with second_sf_sweep.py.

Usage: check_hash.py <sfDir> <verifyOutDir>
NOTE: dev tool only — the Scala library has no dependency on this.
"""
import sys, json, glob
import duckdb
import pandas as pd

import gate_common


def main(sf_dir, out_dir):
    con = duckdb.connect()
    gate_common.register_views(con, sf_dir)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark dump"); n_bad += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True)
            exp = con.execute(sql).df()
            h1 = gate_common.frame_hash(got)  # frame_hash norms internally
            h2 = gate_common.frame_hash(exp)
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
