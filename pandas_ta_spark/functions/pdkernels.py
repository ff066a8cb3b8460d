"""Vectorized pandas kernels for the EWM family (run per-symbol via
plans/kernels.py inside Arrow-batched applyInPandas).

Semantics note (SURVEY.md §4.3.3, §7.6.1): we standardize every
exponential smoother on the *recursive* form

    y_warmup = NULL (t < n-1);  y_{n-1} = SMA(x[0:n]);
    y_t = alpha*x_t + (1-alpha)*y_{t-1}        (t >= n)

i.e. pandas ``ewm(..., adjust=False)`` with an SMA seed. This matches
TA-Lib/Wilder exactly and is expressible as a DuckDB recursive-CTE oracle
(see operators/ewm_sql.py). The reference's pandas path sometimes uses
``adjust=True`` (weighted-history form, e.g. ``pandas_ta/overlap/rma.py``);
the two converge geometrically and sit inside the reference's own
correlation>=0.99 test tolerance (``tests/config.py#CORRELATION_THRESHOLD``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def ewm_seeded(x: pd.Series, alpha: float, seed_n: int) -> pd.Series:
    """Recursive EWM with SMA(seed_n) seed and NULL warmup (see module doc).

    Leading NaNs (e.g. from an upstream chained smoother or shift) push the
    seed window forward, matching pandas' min_periods accounting on
    NaN-prefixed series.
    """
    out = pd.Series(np.nan, index=x.index, dtype="float64")
    v = x.to_numpy(dtype="float64")
    n = len(v)
    if seed_n <= 0:
        return out
    valid = np.flatnonzero(~np.isnan(v))
    if len(valid) == 0:
        return out
    fv = valid[0]  # first valid position
    seed_end = fv + seed_n  # exclusive
    if seed_end > n:
        return out
    res = np.full(n, np.nan)
    y = v[fv:seed_end].mean()
    res[seed_end - 1] = y
    rest = v[seed_end:]
    if len(rest):
        # first-order IIR y_t = a*x_t + (1-a)*y_{t-1}, vectorized via the
        # pandas ewm C kernel on the seeded tail (~1e8 rows/s, BASELINE.md)
        tail = pd.Series(np.concatenate(([y], rest)))
        smoothed = tail.ewm(alpha=alpha, adjust=False).mean().to_numpy()
        res[seed_end:] = smoothed[1:]
    out.iloc[:] = res
    return out


def ema_pd(x: pd.Series, length: int) -> pd.Series:
    """EMA, alpha=2/(n+1), SMA-seeded (pandas_ta/overlap/ema.py#ema presma)."""
    return ewm_seeded(x, 2.0 / (length + 1), length)


def rma_pd(x: pd.Series, length: int) -> pd.Series:
    """Wilder MA, alpha=1/n (pandas_ta/overlap/rma.py#rma)."""
    return ewm_seeded(x, 1.0 / length, length)


