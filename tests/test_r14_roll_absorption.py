"""r14 ROLL absorption: the converted Arrow kernels must be EXACT under
epoch-chunked execution (plans/kernels.py _run_chunked) — the declared
carry_rows/lead_rows are the contract that lets one hot symbol split
into parallel chunks at 100 TB without changing a single output bit.

Each converted indicator runs whole-group vs chunked-with-tiny-epochs on
a 2-symbol frame and must match bit-for-bit (NaN == NaN)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _frame(spark, n=1200, symbols=("A", "B")):
    rng = np.random.default_rng(7)
    frames = []
    for s in symbols:
        close = 100 + np.cumsum(rng.normal(0, 0.6, n))
        # inject flat stretches (constant-frame guards) and v=0 rows
        close[200:210] = close[200]
        vol = rng.integers(1, 900, n).astype("float64")
        vol[300:303] = 0.0
        frames.append(pd.DataFrame({
            "symbol": s,
            "ts": pd.date_range("2022-01-01", periods=n, freq="min"),
            "open": close + rng.normal(0, 0.1, n),
            "high": close + np.abs(rng.normal(0.2, 0.1, n)),
            "low": close - np.abs(rng.normal(0.2, 0.1, n)),
            "close": close,
            "volume": vol,
        }))
    return spark.createDataFrame(pd.concat(frames)).repartition(3)


# (factory path, kwargs) for every kernel converted in r14 with a finite
# carry — xsignals/hilo are unbounded-state (carry None) and never chunk
CONVERTED = [
    ("momentum.ao", {}), ("momentum.apo", {}), ("momentum.bias", {}),
    ("momentum.cmo", {}), ("momentum.cg", {}), ("momentum.cfo", {}),
    ("momentum.cti", {}), ("momentum.er", {}), ("momentum.psl", {}),
    ("trend.chop", {}), ("trend.dpo", {"centered": True}),
    ("trend.dpo", {"centered": False}), ("trend.qstick", {}),
    ("trend.ttm_trend", {}), ("trend.vhf", {}),
    ("trend.tsignals", {}), ("trend.long_run", {}), ("trend.short_run", {}),
    ("volatility.ui", {}), ("volatility.accbands", {}),
    ("volume.cmf", {}), ("volume.eom", {}),
    ("overlap.trima", {}), ("overlap.vwma", {}),
    ("overlap.linreg", {}), ("overlap.linreg", {"mode": "slope"}),
    ("overlap.linreg", {"mode": "intercept"}),
    ("overlap.linreg", {"mode": "r"}), ("overlap.linreg", {"mode": "tsf"}),
    ("overlap.sma", {"length": 20}),
]


@pytest.mark.parametrize("path,kw", CONVERTED,
                         ids=[f"{p.split('.')[1]}{i}" for i, (p, kw)
                              in enumerate(CONVERTED)])
def test_chunked_equals_whole_group(spark, path, kw):
    import importlib

    from pandas_ta_spark.plans.kernels import run_kernels

    mod_name, fn_name = path.split(".")
    mod = importlib.import_module(f"pandas_ta_spark.operators.{mod_name}")
    ind = getattr(mod, fn_name)(**kw)
    assert ind.kernel is not None, path
    assert ind.kernel.carry_rows is not None, path
    df = _frame(spark)
    kernels = [ind.kernel]
    # chunk barely above the declared carry/lead: the hardest split
    chunk = max(ind.kernel.carry_rows, ind.kernel.lead_rows) + 3
    whole = (run_kernels(df, kernels, chunk_rows=0)
             .toPandas().sort_values(["symbol", "ts"]).reset_index(drop=True))
    chunked = (run_kernels(df, kernels, chunk_rows=chunk)
               .toPandas().sort_values(["symbol", "ts"]).reset_index(drop=True))
    assert list(whole.columns) == list(chunked.columns)
    for c in ind.kernel.outputs:
        a = whole[c].to_numpy()
        b = chunked[c].to_numpy()
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all(), (path, c, int((~same).sum()),
                            a[~same][:5], b[~same][:5])
