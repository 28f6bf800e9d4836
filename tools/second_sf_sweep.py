#!/usr/bin/env python3
"""Second-scale-factor oracle sweep (VERDICT r14 item 4, institutionalized).

The driver's CORRECTNESS gate runs at ONE scale factor (sf0.01); a
geometry-dependent regression (banding recall, df caps, window sizes)
can pass there and break elsewhere. This tool re-runs the full
rows+schema+hash gate at a SECOND SF — sf0.001 by convention — and
writes a CORRECTNESS_rN-shaped JSON artifact with a `_meta` header.

Known, documented divergences are WHITELISTED by (sf, query), each
with a SHAPE PREDICATE pinning the documented divergence — a non-pass
row is recorded `whitelisted: true` (not a failure) only when the
predicate also holds, so the whitelist cannot absorb a future crash /
schema change / bulk row loss of the same query. Current whitelist:
  - q81_dedup_minhash at sf0.001: one band-miss pair — docs
    (33, 1000436) at j = 0.778, miss probability (1-j^3)^4 ~ 8% is
    deterministic at this fixture geometry (scaladoc'd in LlmOps.q81;
    measured absent at the gate SFs sf0.01/sf0.1).

Usage:
  second_sf_sweep.py <sfDir> <verifyOutDir> <outJson>
Expects `graft.Verify <sfDir> <verifyOutDir>` to have run already;
tools/second_sf_sweep.sh drives both steps.

NOTE: dev/driver tool only (duckdb + pandas) — the Scala library has no
dependency on this.
"""
import sys, os, json, glob, datetime
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# (sf, query) -> (reason, shape predicate). The predicate pins the
# DOCUMENTED divergence shape, so the whitelist cannot absorb a future
# genuine regression of the same query (crash, schema change, bulk row
# loss) — only the specific ~1-pair band miss stays whitelisted.
WHITELIST = {
    ("sf0.001", "q81_dedup_minhash"): (
        "documented sf0.001 band-miss pair: docs (33, 1000436) at "
        "j=0.778, (1-j^3)^4 ~ 8% deterministic at this fixture geometry "
        "(LlmOps.q81 scaladoc); absent at the gate SFs sf0.01/sf0.1",
        # exactly a small engine-side deficit: no error, schema intact,
        # oracle has 1-2 more rows (the missed pair)
        lambda r: r["err"] is None and r["schema_match"]
        and r["oracle_rows"] is not None and r["spark_rows"] is not None
        and 1 <= r["oracle_rows"] - r["spark_rows"] <= 2),
}


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir, out_dir, out_json):
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    dumps = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # the gate iterates the UNION of dump dirs and oracle keys: a query
    # that crashed inside graft.Verify (which logs and continues,
    # writing no dump dir) must surface as a FAIL row here, not vanish
    names = sorted(set(dumps) | set(oracles))
    result, n_pass, n_white, n_fail, n_noracle = {}, 0, 0, 0, 0
    for name in names:
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        try:
            if name not in dumps:
                raise RuntimeError("no spark dump — query failed in Verify")
            got = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True) if files else pd.DataFrame()
            row["spark_rows"] = len(got)
            if name not in oracles:
                row["err"] = "no_oracle"; n_noracle += 1
                result[name] = row
                print(f"--   {name}: no oracle (declared sketch/spec op)")
                continue
            exp = con.execute(oracles[name]).df()
            row["oracle_rows"] = len(exp)
            row["rows_match"] = len(got) == len(exp)
            row["schema_match"] = sorted(got.columns) == sorted(exp.columns)
            g, e = norm(got), norm(exp)
            h1 = pd.util.hash_pandas_object(g, index=False).sum()
            h2 = pd.util.hash_pandas_object(e, index=False).sum()
            row["hash_match"] = bool(h1 == h2)
        except Exception as ex:
            row["err"] = f"{type(ex).__name__}: {ex}"
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
        wl = WHITELIST.get((sf_tag, name))
        if ok:
            n_pass += 1
            print(f"ok   {name} ({row['spark_rows']} rows)")
        elif wl is not None and wl[1](row):
            row["whitelisted"] = True
            row["whitelist_reason"] = wl[0]
            n_white += 1
            print(f"WL   {name}: diverges as documented "
                  f"(rows {row['spark_rows']} vs {row['oracle_rows']})")
        else:
            n_fail += 1
            print(f"FAIL {name}: rows={row['rows_match']} "
                  f"schema={row['schema_match']} hash={row['hash_match']} "
                  f"err={row['err']}")
        result[name] = row
    meta = {"sf": sf_tag, "sf_dir": sf_dir,
            "generated": datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds"),
            "tool": "tools/second_sf_sweep.py",
            "summary": {"pass": n_pass, "whitelisted": n_white,
                        "fail": n_fail, "no_oracle": n_noracle,
                        "total": len(result)}}
    out = {"_meta": meta}
    out.update(result)
    with open(out_json, "w") as f:
        json.dump(out, f, indent=2)
    print(f"== {n_pass} pass, {n_white} whitelisted, {n_fail} fail, "
          f"{n_noracle} no-oracle -> {out_json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
