"""Second-look classifier for fuzz-gate failures: grid-vs-ulp.

The engine's cross-engine contract is EXACT equality on a 1e-6 absolute
grid. That grid is only representable while |output| * 1e6 < 2^53
(~9.0e9) — beyond that, floor(x*1e6+0.5) rounds ulps, and two engines
whose doubles differ by one last ulp legitimately disagree in the
grid's last digit (e.g. rolling variance of 1e6-scale prices: outputs
~2.5e11, ulp 6.1e-5). This tool re-runs a failing key keyed-aligned and
classifies it:

  ulp_drift  — every diff is on a beyond-grid output (|v|*1e6 >= 2^53)
               and within 4 ulps of the larger value: the comparison
               grid ran out of mantissa, not a semantics bug.
  grid_edge  — every diff is ulp_drift OR exactly one 1e-6 grid step
               (the true value sits at a half-grid boundary and the two
               engines' last-ulp-different upstream doubles — e.g.
               numpy pairwise sums vs a segment tree — straddle it),
               AND such rows are RARE (<= max(3, 0.5%) of the output):
               a systematic rounding-formula bug would hit most rows
               and stays `real`. This is the documented limit of
               absolute-grid equality between two independent engines
               without full integer arithmetic everywhere.
  real       — anything else (NaN-pattern diffs, >1-grid-step diffs at
               in-domain magnitude, or grid-edge diffs on too many
               rows).

Prints one JSON line: {"key": ..., "verdict": ..., "n_diffs": ...,
"worst_rel": ...}. Used by fuzz_gate.py to downgrade ulp_drift failures
to recorded-but-non-gating.

    python tools/fuzz_reexamine.py <data_dir> <key> [key ...]
"""

from __future__ import annotations

import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

GRID_LIMIT = 2.0 ** 53 / 1e6  # |v| above this: 1e-6 grid unrepresentable
ULP_TOL = 4
MIN_ROWS_FOR_RATE = 600  # 0.5% of this = 3 rows, the old absolute floor


def classify(sdf: pd.DataFrame, odf: pd.DataFrame) -> dict:
    from fuzz_diff import KEY_CANDIDATES

    if len(sdf) != len(odf) or sorted(sdf.columns) != sorted(odf.columns):
        return {"verdict": "real", "n_diffs": -1,
                "why": "row-count or column mismatch"}
    kc = next((k for k in KEY_CANDIDATES
               if set(k) <= set(sdf.columns)
               and not sdf.duplicated(k).any()
               and not odf.duplicated(k).any()), None)
    if kc is None:
        kc = sorted(sdf.columns)
    sdf = sdf.sort_values(kc).reset_index(drop=True)
    odf = odf.sort_values(kc).reset_index(drop=True)
    n_diffs = n_edge = 0
    worst_rel, all_ulp, all_edge = 0.0, True, True
    for c in sdf.columns:
        if c in kc:
            continue
        x = pd.to_numeric(sdf[c], errors="coerce") \
            if sdf[c].dtype != object else sdf[c]
        y = pd.to_numeric(odf[c], errors="coerce") \
            if odf[c].dtype != object else odf[c]
        if not np.issubdtype(np.asarray(x).dtype, np.number):
            neq = ~(x.eq(y) | (x.isna() & y.isna()))
            if neq.any():
                n_diffs += int(neq.sum())
                all_ulp = all_edge = False
            continue
        x, y = x.astype(float), y.astype(float)
        neq = ~((x.isna() & y.isna()) | (x == y))
        for i in np.where(neq)[0]:
            n_diffs += 1
            xv, yv = x[i], y[i]
            if math.isnan(xv) or math.isnan(yv):
                all_ulp = all_edge = False  # NaN-pattern: always real
                continue
            m = max(abs(xv), abs(yv))
            d = abs(xv - yv)
            worst_rel = max(worst_rel, d / m if m else float("inf"))
            is_ulp = m > GRID_LIMIT and d <= ULP_TOL * math.ulp(m)
            if not is_ulp:
                all_ulp = False
                if d <= 1.5e-6:  # at most one grid step
                    n_edge += 1
                else:
                    all_edge = False
    # Rate-only downgrade (ADVICE r11): the old max(3, rows*0.5%) floor
    # let up to 3 genuinely divergent rows pass un-gated on small outputs
    # regardless of rate. Now a grid_edge verdict requires BOTH a large
    # enough output for a rate to mean anything (>= MIN_ROWS_FOR_RATE)
    # and <= 0.5% of rows on the boundary; any edge diff on a small
    # output is classified real and gates. Keys downgraded here are also
    # surfaced in fuzz_gate's exit-summary JSON (grid_edge_keys).
    rare = len(sdf) >= MIN_ROWS_FOR_RATE and n_edge <= len(sdf) * 0.005
    if n_diffs and all_ulp:
        verdict = "ulp_drift"
    elif n_diffs and all_edge and rare:
        verdict = "grid_edge"
    else:
        verdict = "real"
    return {"verdict": verdict, "n_diffs": n_diffs, "n_grid_edge": n_edge,
            "worst_rel": worst_rel, "aligned_on": kc}


def main(argv: list[str]) -> int:
    d, keys = argv[0], argv[1:]
    import __spark_entry__ as E
    from check import get_spark

    spark = get_spark()
    qs, orc = E.queries(), E.oracle_sql()
    from pandas_ta_spark.sources.bars import TABLES

    for k in keys:
        try:
            sdf = qs[k](spark, d).toPandas()
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
            odf = con.execute(orc[k]).df()
            con.close()
            out = classify(sdf, odf)
        except Exception as exc:  # noqa: BLE001 — report, don't abort the rest
            out = {"verdict": "real", "n_diffs": -1,
                   "why": f"{type(exc).__name__}: {exc}"[:300]}
        out["key"] = k
        print("REEXAMINE " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
