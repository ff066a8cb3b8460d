"""Property-based PARAM-space parity (extends VERDICT r11 ask #2).

The oracle gate and the fuzz gate vary DATA adversarially but run each
operator at one (or a few) parameterizations. These hypothesis sweeps
vary the PARAMS — window lengths, ddof, fast/slow pairs, presma — and
compare the Spark-side expression/kernel against an independent pandas
reference on the shared fixture, so a wrong non-default branch can't
hide behind the default-parameter keys."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import assert_close, one_symbol


def _ref_ewm_seeded(x: pd.Series, alpha: float, seed_n: int) -> pd.Series:
    """Independent (naive-loop) reference for the engine's documented
    EWM contract: NULL warmup, quantized-sum seed, plain recursion with
    the pandas constant-hold step."""
    from pandas_ta_spark.operators.base import seed_mean

    v = x.to_numpy(dtype=float)
    out = np.full(len(v), np.nan)
    buf: list[float] = []
    y = None
    for i, val in enumerate(v):
        if y is None:
            if np.isnan(val) and not buf:
                continue  # leading NaN pushes the seed window forward
            buf.append(val)
            if len(buf) >= seed_n:
                # seed_n == 1 seeds from the RAW value (the reference's
                # ema sma=False branch = pandas ewm adjust=False from
                # row 0; r12 ADVICE) — no 1e-6 seed quantization
                y = buf[0] if seed_n == 1 else seed_mean(buf)
                out[i] = y
            continue
        y = y if y == val else alpha * val + (1 - alpha) * y
        out[i] = y
    return pd.Series(out, index=x.index)


def test_sma_stdev_zscore_any_length(bars, pdf_bars):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pandas_ta_spark.operators.overlap import sma
    from pandas_ta_spark.operators.statistics import stdev, zscore
    from pandas_ta_spark.registry import run as run_ind

    g = one_symbol(pdf_bars)["close"].reset_index(drop=True)

    @settings(max_examples=10, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.integers(2, 60), st.sampled_from([0, 1]))
    def check(n, ddof):
        got = one_symbol(run_ind(bars, "sma", length=n).toPandas())
        assert_close(got[f"SMA_{n}"], g.rolling(n).mean(), 1e-9, f"sma{n}")
        got2 = one_symbol(stdev(n, ddof=ddof).apply(bars).toPandas())
        assert_close(got2[f"STDEV_{n}"], g.rolling(n).std(ddof=ddof),
                     1e-9, f"stdev{n}d{ddof}")
        got3 = one_symbol(zscore(n).apply(bars).toPandas())
        ref = (g - g.rolling(n).mean()) / g.rolling(n).std(ddof=1)
        # ratio of near-equal floats: engine vs pandas associate the
        # mean/std differently, ulps amplify at tiny denominators — one
        # output-grid quantum is the honest bound (the gate rounds there)
        assert_close(got3[f"ZS_{n}"], ref, 1e-6, f"zscore{n}")

    check()


def test_ema_any_length_and_seed_mode(bars, pdf_bars):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pandas_ta_spark.operators.overlap import ema

    g = one_symbol(pdf_bars)["close"].reset_index(drop=True)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.integers(2, 50), st.booleans())
    def check(n, presma):
        got = one_symbol(ema(n, presma=presma).apply(bars).toPandas())
        ref = _ref_ewm_seeded(g, 2.0 / (n + 1), n if presma else 1)
        assert_close(got[f"EMA_{n}"], ref, 1e-9, f"ema{n}p{presma}")

    check()


def test_apo_macd_any_fast_slow(bars, pdf_bars):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pandas_ta_spark.operators.momentum import apo

    g = one_symbol(pdf_bars)["close"].reset_index(drop=True)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.integers(2, 20), st.integers(21, 60),
           st.sampled_from(["sma", "ema"]))
    def check(fast, slow, mamode):
        got = one_symbol(apo(fast, slow, mamode=mamode).apply(bars).toPandas())
        if mamode == "sma":
            ref = g.rolling(fast).mean() - g.rolling(slow).mean()
        else:
            ref = (_ref_ewm_seeded(g, 2.0 / (fast + 1), fast)
                   - _ref_ewm_seeded(g, 2.0 / (slow + 1), slow))
        assert_close(got[f"APO_{fast}_{slow}"], ref, 1e-9,
                     f"apo{fast}_{slow}_{mamode}")

    check()


def test_atr_percent_and_log_return_any_length(bars, pdf_bars):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pandas_ta_spark.operators.performance import log_return
    from pandas_ta_spark.operators.volatility import atr

    a = one_symbol(pdf_bars).reset_index(drop=True)
    g = a["close"]

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.integers(2, 40), st.booleans(), st.integers(1, 10))
    def check(n, percent, rl):
        got = one_symbol(atr(n, percent=percent).apply(bars).toPandas())
        prev = g.shift(1)
        tr = pd.concat([a["high"] - a["low"], (a["high"] - prev).abs(),
                        (a["low"] - prev).abs()], axis=1).max(axis=1)
        tr[0] = np.nan  # no previous close on row 0
        ref = _ref_ewm_seeded(tr, 1.0 / n, n)
        if percent:
            ref = 100 * ref / g
        col = f"ATRr_{n}" + ("p" if percent else "")
        assert_close(got[col], ref, 1e-9, f"atr{n}p{percent}")
        got2 = one_symbol(log_return(rl).apply(bars).toPandas())
        ref2 = np.log(g / g.shift(rl))
        assert_close(got2[f"LOGRET_{rl}"], ref2, 1e-9, f"logret{rl}")

    check()
