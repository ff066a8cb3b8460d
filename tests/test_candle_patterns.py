"""Per-pattern candle evidence (VERDICT r11 ask #5).

The composite ``cdl_pattern_all`` gate key value-checks all 66 pattern
columns through ONE hash, so a single-pattern break fails without naming
itself. This test compares every pattern column INDEPENDENTLY against
the same DuckDB twin on the sf0.01 gate corpus: a failure names the exact
pattern(s) and the first divergent (symbol, ts) rows.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"


def test_each_candle_pattern_matches_duckdb_twin(spark):
    from pandas_ta_spark.operators.candles import ALL_PATTERNS, cdl_pattern
    from pandas_ta_spark.registry import default_instance
    from pandas_ta_spark.sources.bars import TABLES, bars_from_events_cached

    ind = default_instance("cdl_pattern_all")
    sdf = (ind.query(bars_from_events_cached(spark, SF_DIR))
           .toPandas().sort_values(["symbol", "ts"]).reset_index(drop=True))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    odf = (con.execute(ind.oracle()).df()
           .sort_values(["symbol", "ts"]).reset_index(drop=True))
    con.close()

    assert len(sdf) == len(odf) and len(sdf) > 0
    # every one of the 66 patterns must contribute exactly one column
    pattern_cols = [c for c in sdf.columns if c not in ("symbol", "ts")]
    assert len(pattern_cols) == len(ALL_PATTERNS) == 66
    # the dispatcher's per-pattern output naming is resolvable back to
    # the pattern list (a rename would silently orphan a pattern)
    for n in ALL_PATTERNS:
        single = cdl_pattern(n)
        assert len(single.outputs) == 1
        assert single.outputs[0] in pattern_cols, n

    broken: list[str] = []
    details: list[str] = []
    for c in pattern_cols:
        x = sdf[c].astype(float).to_numpy()
        y = odf[c].astype(float).to_numpy()
        neq = ~((np.isnan(x) & np.isnan(y)) | (x == y))
        if neq.any():
            broken.append(c)
            i = int(np.flatnonzero(neq)[0])
            details.append(
                f"{c}: {int(neq.sum())} rows differ; first at "
                f"(symbol={sdf['symbol'][i]}, ts={sdf['ts'][i]}): "
                f"spark={x[i]} duckdb={y[i]}")
    assert not broken, (
        f"{len(broken)} candle pattern(s) diverge from the DuckDB twin: "
        f"{broken}\n" + "\n".join(details))

    # sanity: the corpus actually exercises the patterns — a dispatcher
    # bug that zeroes every column would otherwise pass the parity check
    fired = sum(bool((sdf[c].astype(float).fillna(0) != 0).any())
                for c in pattern_cols)
    assert fired >= 20, f"only {fired}/66 patterns fire on sf0.01"
