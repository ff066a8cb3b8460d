"""Keyed-aligned cross-engine diff for one suite key on one data dir.

check.py's driver-faithful compare sorts rows by ALL columns, so a single
genuine value diff dislocates the whole alignment and reports hundreds of
phantom per-column diffs. This tool aligns on the natural key instead
((symbol, ts) / (doc_id, ...) — any unique column subset found) and
prints only the genuinely differing rows.

    python tools/fuzz_diff.py <data_dir> <key> [max_rows]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

KEY_CANDIDATES = [
    ["symbol", "ts"], ["doc_id"], ["vec_id"], ["doc_id", "seg"],
    ["doc_id", "sample_j"], ["query_id", "rank"], ["user_id"],
    ["symbol"], ["ts"], ["lang", "source"],
]


def main():
    d, key = sys.argv[1], sys.argv[2]
    max_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import __spark_entry__ as E
    from check import get_spark

    spark = get_spark()
    qs, orc = E.queries(), E.oracle_sql()
    sdf = qs[key](spark, d).toPandas()
    con = duckdb.connect()
    from pandas_ta_spark.sources.bars import TABLES

    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    odf = con.execute(orc[key]).df()
    con.close()
    print(f"rows spark={len(sdf)} oracle={len(odf)}")
    kc = next((k for k in KEY_CANDIDATES
               if set(k) <= set(sdf.columns)
               and not sdf.duplicated(k).any()
               and not odf.duplicated(k).any()), None)
    if kc is None:
        print("no unique natural key found; falling back to positional"
              " sort on all columns")
        kc = sorted(sdf.columns)
    sdf = sdf.sort_values(kc).reset_index(drop=True)
    odf = odf.sort_values(kc).reset_index(drop=True)
    n_bad = 0
    for c in sdf.columns:
        if c in kc:
            continue
        x = pd.to_numeric(sdf[c], errors="coerce") \
            if sdf[c].dtype != object else sdf[c]
        y = pd.to_numeric(odf[c], errors="coerce") \
            if odf[c].dtype != object else odf[c]
        if np.issubdtype(np.asarray(x).dtype, np.number):
            x, y = x.astype(float), y.astype(float)
            neq = ~((x.isna() & y.isna()) | (x == y))
        else:
            neq = ~(x.eq(y) | (x.isna() & y.isna()))
        if neq.any():
            n_bad += int(neq.sum())
            idx = np.where(neq)[0]
            print(f"\n== {c}: {len(idx)} genuine diffs")
            for i in idx[:max_rows]:
                print(f"   {dict(sdf.loc[i, kc])}  s={x[i]!r}  o={y[i]!r}")
    print(f"\ntotal genuine cell diffs: {n_bad} (aligned on {kc})")


if __name__ == "__main__":
    main()
