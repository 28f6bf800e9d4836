"""Shared conventions of the local correctness gates — ONE spelling.

check_hash.py (the strict dtype-sensitive mirror of the driver's pandas
hash) and second_sf_sweep.py (the second-SF artifact) both import this,
so the second-SF gate can never drift onto a different hash convention
than the primary one; check_oracle.py shares the view registration.

NOTE: dev/driver tool only — the Scala library has no dependency on this.
"""
import os
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def register_views(con, sf_dir):
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")


def norm(df):
    """Column-sorted, row-sorted frame — the hash gate's canonical form."""
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def frame_hash(df):
    """Dtype-SENSITIVE hash over the canonical form (catches the
    HUGEINT-vs-int64 oracle class the value-wise compare forgives)."""
    return pd.util.hash_pandas_object(norm(df), index=False).sum()
