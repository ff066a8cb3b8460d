"""Single-core pandas baseline for the 24-ind and all-145 strategies.

BASELINE.md's per-kernel rows price one primitive at a time; this script
prices the two STRATEGY workloads bench.py times on Spark, on the
execution substrate the reference uses (pandas 2.2.x in one process on
one core) over the same sf0.1 tick series (100k rows, 5 symbols).

Two op classes:

- KERNEL ops (74 suite entries): the engine's own per-symbol pandas
  kernels (``Indicator.kernel.fn``) ARE the single-core pandas
  implementation — exactly what runs inside applyInPandas, so the
  baseline reuses them verbatim.
- EXPRESSION ops (window SQL on Spark): hand-written pandas equivalents
  of the public pandas-ta formulas below. These are COST-faithful (same
  primitive rolling/ewm/cum ops, same window sizes); outputs are not
  value-asserted here — value parity is the DuckDB oracle gate's job.

A SparkSession is created only to BUILD the indicator objects (Column
construction needs a JVM); nothing Spark-side is timed. Timings are
best-of-3, whole strategy per symbol group, summed over groups.

Usage:  python tools/pandas_baseline.py [sf_dir]
Prints one JSON line: {"pandas_24ind_sec": ..., "pandas_all145_sec": ...}
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def tick_frame() -> pd.DataFrame:
    """The pandas twin of bench.tick_bars: per-event tick series."""
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet",
                         columns=["event_type", "ts", "event_id", "value"])
    ts = ev["ts"]
    if np.issubdtype(ts.dtype, np.integer):  # TIMESTAMP(NANOS) as int64
        ts = pd.to_datetime(ts, unit="ns")
    micros = ts.astype("int64") // 1000 + ev["event_id"] % 1000
    v = ev["value"].astype("float64")
    df = pd.DataFrame({
        "symbol": ev["event_type"],
        "ts": pd.to_datetime(micros, unit="us"),
        "open": v, "high": v, "low": v, "close": v,
        "volume": 1.0,
    })
    return df.sort_values(["symbol", "ts"]).reset_index(drop=True)


# ------------------------------------------------------------ helpers ----

def _wroll(x: pd.Series, w: np.ndarray, normalize: bool = True) -> pd.Series:
    from pandas_ta_spark.functions.pdkernels import wroll_pd

    return wroll_pd(x, list(w), normalize=normalize)


def _sma(x, n):
    return x.rolling(n).mean()


def _wma(x, n):
    return _wroll(x, np.arange(1, n + 1, dtype=float))


def _tr(g):
    pc = g["close"].shift(1)
    return pd.concat([g["high"] - g["low"], (g["high"] - pc).abs(),
                      (g["low"] - pc).abs()], axis=1).max(axis=1)


def _linreg(x: pd.Series, n: int, slope_only: bool = False) -> pd.Series:
    # slope via centered-index weights (one weighted roll, no per-window
    # Python): slope = sum((i - ibar) * y_i) / sum((i - ibar)^2)
    i = np.arange(n, dtype=float)
    wslope = (i - i.mean()) / ((i - i.mean()) ** 2).sum()
    slope = _wroll(x, wslope, normalize=False)
    if slope_only:
        return slope
    return x.rolling(n).mean() + slope * (n - 1 - i.mean())


def _bar(g: pd.DataFrame):
    """Candle-anatomy accessor: b(k, attr) -> Series at lag k (the pandas
    twin of operators/candles.py:_Bar). Memoized per (k, attr) so one
    pattern evaluation prices ONE pass of shifts/compares, matching the
    Spark expression's single codegen stage."""
    cache: dict = {}

    def b(k: int, attr: str):
        key = (k, attr)
        if key in cache:
            return cache[key]
        if attr in ("o", "h", "l", "c"):
            col = {"o": "open", "h": "high", "l": "low", "c": "close"}[attr]
            v = g[col].shift(k) if k else g[col]
        elif attr == "body":
            v = (b(k, "c") - b(k, "o")).abs()
        elif attr == "rng":
            v = b(k, "h") - b(k, "l")
        elif attr == "top":
            v = np.maximum(b(k, "o"), b(k, "c"))
        elif attr == "bot":
            v = np.minimum(b(k, "o"), b(k, "c"))
        elif attr == "mid":
            v = (b(k, "o") + b(k, "c")) / 2
        elif attr == "losh":
            v = b(k, "bot") - b(k, "l")
        elif attr == "green":
            v = b(k, "c") > b(k, "o")
        elif attr == "red":
            v = b(k, "c") < b(k, "o")
        elif attr == "doji":
            v = (b(k, "rng") > 0) & (b(k, "body") <= 0.05 * b(k, "rng"))
        elif attr == "maru":
            v = (b(k, "rng") > 0) & (b(k, "body") >= 0.95 * b(k, "rng"))
        elif attr == "longb":
            v = (b(k, "rng") > 0) & (b(k, "body") >= 0.5 * b(k, "rng"))
        else:  # pragma: no cover
            raise KeyError(attr)
        cache[key] = v
        return v

    return b


# Expression-op pandas equivalents (public pandas-ta formulas), keyed by
# suite key. Each fn(g) -> one or more Series over one symbol group.
def _expr_ops():
    def cdl_pattern_all(g):
        # 66 lag-comparison patterns; each is a handful of shift/compare
        # ops — priced as a composite boolean per pattern
        o, h, l, c = g["open"], g["high"], g["low"], g["close"]
        body = (c - o).abs()
        rng = h - l
        outs = []
        for k in range(66):
            outs.append(((body > body.shift(1)) & (rng < rng.shift(1))
                         & (c > o.shift(2)) & (l > l.shift(k % 5 + 1))))
        return outs

    def vwap(g):
        tp = (g["high"] + g["low"] + g["close"]) / 3
        day = g["ts"].dt.normalize()
        pv = (tp * g["volume"]).groupby(day).cumsum()
        vv = g["volume"].groupby(day).cumsum()
        return pv / vv

    def td_seq(g):
        c = g["close"]
        up = (c > c.shift(4)).astype(int)
        grp = (up != up.shift()).cumsum()
        return up.groupby(grp).cumcount() + 1

    def nvi(g, sign):
        v, c = g["volume"], g["close"]
        r = c.pct_change() * 100
        mask = (v < v.shift(1)) if sign else (v > v.shift(1))
        return r.where(mask, 0.0).cumsum()

    def obv(g):
        s = np.sign(g["close"].diff()).fillna(0)
        return (s * g["volume"]).cumsum()

    def decay(g, n=5):
        c = g["close"]
        i = pd.Series(np.arange(len(c), dtype=float), index=c.index)
        return np.maximum((c + i / n).cummax() - i / n, 0.0)

    def fib(n):
        a, b, out = 1.0, 1.0, []
        for _ in range(n):
            out.append(a)
            a, b = b, a + b
        return np.array(out)

    def alma_w(n, sigma=6.0, dist=0.85):
        m = dist * (n - 1)
        s = n / sigma
        i = np.arange(n, dtype=float)
        return np.exp(-((i - m) ** 2) / (2 * s * s))

    def creasing(g, inc, n=1, strict=False):
        d = g["close"].diff(1 if strict else n)
        f = ((d > 0) if inc else (d < 0)).astype(float)
        return f.rolling(n).min() if strict else f

    return {
        "hl2": lambda g: (g["high"] + g["low"]) / 2,
        "hlc3": lambda g: (g["high"] + g["low"] + g["close"]) / 3,
        "ohlc4": lambda g: (g["open"] + g["high"] + g["low"] + g["close"]) / 4,
        "wcp": lambda g: (g["high"] + g["low"] + 2 * g["close"]) / 4,
        "sma_20": lambda g: _sma(g["close"], 20),
        "sma_200_large": lambda g: _sma(g["close"], 200),
        "midpoint_2": lambda g: (g["close"].rolling(2).max() + g["close"].rolling(2).min()) / 2,
        "midprice_2": lambda g: (g["high"].rolling(2).max() + g["low"].rolling(2).min()) / 2,
        "vwma_10": lambda g: (g["close"] * g["volume"]).rolling(10).sum()
        / g["volume"].rolling(10).sum(),
        "trima_10": lambda g: _sma(_sma(g["close"], 6), 5),
        "linreg_14": lambda g: _linreg(g["close"], 14),
        "linreg_slope_14": lambda g: _linreg(g["close"], 14, slope_only=True),
        "wma_10": lambda g: _wma(g["close"], 10),
        "pwma_10": lambda g: _wroll(g["close"], np.array(
            [math.comb(9, k) for k in range(10)], dtype=float)),
        "fwma_10": lambda g: _wroll(g["close"], fib(10)),
        "swma_10": lambda g: _wroll(g["close"], np.array(
            [min(k + 1, 10 - k) for k in range(10)], dtype=float)),
        "sinwma_14": lambda g: _wroll(g["close"], np.sin(
            np.pi * (np.arange(14) + 1) / 15)),
        "alma_10": lambda g: _wroll(g["close"], alma_w(10)),
        "hma_10": lambda g: _wma(2 * _wma(g["close"], 5) - _wma(g["close"], 10), 3),
        "vwap": vwap,
        "hilo_13_21": lambda g: np.where(
            g["close"] > _sma(g["high"], 13).shift(1),
            _sma(g["low"], 21), _sma(g["high"], 13)),
        "mom_10": lambda g: g["close"].diff(10),
        "roc_10": lambda g: g["close"].pct_change(10) * 100,
        "slope_1": lambda g: g["close"].diff(1),
        "slope_angle_1": lambda g: np.degrees(np.arctan(g["close"].diff(1))),
        "bop": lambda g: (g["close"] - g["open"]) / (g["high"] - g["low"]),
        "ao_5_34": lambda g: _sma((g["high"] + g["low"]) / 2, 5)
        - _sma((g["high"] + g["low"]) / 2, 34),
        "apo_12_26": lambda g: _sma(g["close"], 12) - _sma(g["close"], 26),
        "bias_26": lambda g: g["close"] / _sma(g["close"], 26) - 1,
        "cfo_9": lambda g: 100 * (g["close"] - _linreg(g["close"], 9)) / g["close"],
        "cg_10": lambda g: _wroll(g["close"], np.arange(10, 0, -1, dtype=float))
        / g["close"].rolling(10).sum() * -1,
        "cmo_14": lambda g: (lambda up, dn: 100 * (up - dn) / (up + dn))(
            g["close"].diff().clip(lower=0).rolling(14).sum(),
            (-g["close"].diff()).clip(lower=0).rolling(14).sum()),
        "coppock": lambda g: _wma(g["close"].pct_change(14) * 100
                                  + g["close"].pct_change(11) * 100, 10),
        "cti_12": lambda g: _linreg(g["close"], 12, slope_only=True)
        / g["close"].rolling(12).std(),
        "er_10": lambda g: g["close"].diff(10).abs()
        / g["close"].diff().abs().rolling(10).sum(),
        "psl_12": lambda g: 100 * (g["close"].diff() > 0).rolling(12).sum() / 12,
        "td_seq": td_seq,
        "drawdown": lambda g: [
            g["close"].cummax() - g["close"],
            1 - g["close"] / g["close"].cummax(),
            np.log(g["close"].cummax()) - np.log(g["close"]),
        ],
        "log_return_1": lambda g: np.log(g["close"] / g["close"].shift(1)),
        "log_return_5": lambda g: np.log(g["close"] / g["close"].shift(5)),
        "cum_log_return": lambda g: np.log(g["close"] / g["close"].shift(1)).cumsum(),
        "percent_return_1": lambda g: g["close"].pct_change(),
        "percent_return_5": lambda g: g["close"].pct_change(5),
        "cum_percent_return": lambda g: (1 + g["close"].pct_change()).cumprod() - 1,
        "chop_14": lambda g: 100 * np.log10(
            _tr(g).rolling(14).sum()
            / (g["high"].rolling(14).max() - g["low"].rolling(14).min())
        ) / np.log10(14),
        "decay_5": decay,
        "increasing_1": lambda g: creasing(g, True),
        "decreasing_1": lambda g: creasing(g, False),
        "increasing_strict_4": lambda g: creasing(g, True, 4, True),
        "decreasing_strict_4": lambda g: creasing(g, False, 4, True),
        "dpo_20": lambda g: g["close"] - _sma(g["close"], 20).shift(-11),
        "qstick_10": lambda g: _sma(g["close"] - g["open"], 10),
        "ttm_trend_6": lambda g: (g["close"]
                                  > _sma((g["high"] + g["low"]) / 2, 6)),
        "vhf_28": lambda g: (g["close"].rolling(28).max()
                             - g["close"].rolling(28).min()).abs()
        / g["close"].diff().abs().rolling(28).sum(),
        "tsignals_8_21": lambda g: (lambda t: [t, t.diff().clip(lower=0),
                                               (1 - t), (-t.diff()).clip(lower=0)])(
            (_sma(g["close"], 8) > _sma(g["close"], 21)).astype(float)),
        "long_run_8_21": lambda g: (creasing(g, True, 2)
                                    .astype(bool) & True),
        "short_run_8_21": lambda g: (creasing(g, False, 2)
                                     .astype(bool) & True),
        "xsignals_z30": lambda g: (lambda z: [(z > 1).astype(float),
                                              (z < -1).astype(float)])(
            (g["close"] - _sma(g["close"], 30)) / g["close"].rolling(30).std()),
        "true_range": _tr,
        "pdist": lambda g: 2 * (g["high"] - g["low"]) \
        - (g["close"] - g["open"]).abs() + (g["open"] - g["close"].shift(1)).abs(),
        "ui_14": lambda g: np.sqrt((
            (100 * (g["close"] - g["close"].rolling(14).max())
             / g["close"].rolling(14).max()) ** 2).rolling(14).mean()),
        "accbands_20": lambda g: [
            _sma(g["low"] * (1 - 4 * (g["high"] - g["low"])
                             / (g["high"] + g["low"])), 20),
            _sma((g["high"] + g["low"]) / 2, 20),
            _sma(g["high"] * (1 + 4 * (g["high"] - g["low"])
                              / (g["high"] + g["low"])), 20),
        ],
        "obv": obv,
        "ad": lambda g: (((g["close"] - g["low"]) - (g["high"] - g["close"]))
                         / (g["high"] - g["low"]) * g["volume"]).cumsum(),
        "cmf_20": lambda g: (((g["close"] - g["low"]) - (g["high"] - g["close"]))
                             / (g["high"] - g["low"]) * g["volume"]).rolling(20).sum()
        / g["volume"].rolling(20).sum(),
        "eom_14": lambda g: _sma(
            ((g["high"] + g["low"]) / 2).diff()
            * (g["high"] - g["low"]) / g["volume"].replace(0, np.nan), 14),
        "nvi_1": lambda g: nvi(g, True),
        "pvi_1": lambda g: nvi(g, False),
        "pvol": lambda g: g["close"] * g["volume"],
        "pvr": lambda g: np.select(
            [(g["close"].diff() >= 0) & (g["volume"].diff() >= 0),
             (g["close"].diff() >= 0), (g["volume"].diff() >= 0)],
            [1.0, 2.0, 3.0], 4.0),
        "pvt": lambda g: (g["close"].pct_change() * g["volume"]).cumsum(),
        "cdl_doji_10": lambda g: (g["close"] - g["open"]).abs()
        < 0.1 * _sma(g["high"] - g["low"], 10),
        "cdl_inside": lambda g: (g["high"] < g["high"].shift(1))
        & (g["low"] > g["low"].shift(1)),
        "cdl_pattern_all": cdl_pattern_all,
        # r13: the six STANDALONE multi-bar pattern keys bench swept into
        # the all-ind headline in r12 (VERDICT r12 "What's wrong" #1) —
        # without these rows plan() SystemExits and BENCH ships null
        # ratios. Same lag/boolean primitives as the Spark expressions
        # (operators/candles.py:1111-1325): cost-faithful, shift+compare.
        "cdl_abandonedbaby": lambda g: (lambda b: (
            (b(2, "red") & b(1, "doji") & (b(1, "h") < b(2, "l"))
             & b(0, "green") & (b(0, "l") > b(1, "h"))
             & (b(0, "c") > b(2, "mid")))
            | (b(2, "green") & b(1, "doji") & (b(1, "l") > b(2, "h"))
               & b(0, "red") & (b(0, "h") < b(1, "l"))
               & (b(0, "c") < b(2, "mid")))))(_bar(g)),
        "cdl_3starsinsouth": lambda g: (lambda b: (
            b(2, "red") & (b(2, "losh") > b(2, "body"))
            & b(1, "red") & (b(1, "body") < b(2, "body"))
            & (b(1, "l") > b(2, "l"))
            & b(0, "red") & (b(0, "body") < b(1, "body"))
            & (b(0, "h") <= b(1, "h")) & (b(0, "l") >= b(1, "l"))))(_bar(g)),
        "cdl_hikkake_mod": lambda g: (lambda b: (lambda ins: (
            (ins & (b(0, "h") < b(1, "h")) & (b(0, "l") < b(1, "l"))
             & (b(1, "c") <= b(1, "l") + b(1, "rng") / 3))
            | (ins & (b(0, "h") > b(1, "h")) & (b(0, "l") > b(1, "l"))
               & (b(1, "c") >= b(1, "h") - b(1, "rng") / 3))))(
            (b(1, "h") < b(2, "h")) & (b(1, "l") > b(2, "l"))
            & (b(1, "rng") > 0)))(_bar(g)),
        "cdl_concealbabyswall": lambda g: (lambda b: (
            b(3, "red") & b(3, "maru") & b(2, "red") & b(2, "maru")
            & b(1, "red") & (b(1, "top") < b(2, "c"))
            & (b(1, "h") > b(2, "c"))
            & b(0, "red") & (b(0, "h") > b(1, "h"))
            & (b(0, "c") < b(1, "l"))))(_bar(g)),
        "cdl_mathold": lambda g: (lambda b: (
            b(4, "green") & b(4, "longb") & b(3, "red")
            & (b(3, "bot") > b(4, "c"))
            & (b(2, "l") > b(4, "mid")) & (b(1, "l") > b(4, "mid"))
            & b(0, "green")
            & (b(0, "c") > np.maximum(np.maximum(b(3, "h"), b(2, "h")),
                                      b(1, "h")))))(_bar(g)),
        "cdl_risefall3methods": lambda g: (lambda b: (lambda held: (
            (b(4, "green") & b(4, "longb")
             & b(3, "red") & b(2, "red") & b(1, "red")
             & held(3) & held(2) & held(1)
             & (b(2, "c") < b(3, "c")) & (b(1, "c") < b(2, "c"))
             & b(0, "green") & (b(0, "c") > b(4, "c")))
            | (b(4, "red") & b(4, "longb")
               & b(3, "green") & b(2, "green") & b(1, "green")
               & held(3) & held(2) & held(1)
               & (b(2, "c") > b(3, "c")) & (b(1, "c") > b(2, "c"))
               & b(0, "red") & (b(0, "c") < b(4, "c")))))(
            lambda k: (b(k, "h") <= b(4, "h"))
            & (b(k, "l") >= b(4, "l"))))(_bar(g)),
        "above_sma_20": lambda g: (g["close"] >= _sma(g["close"], 20)),
        "below_sma_20": lambda g: (g["close"] <= _sma(g["close"], 20)),
        "cross_above_sma_20": lambda g: (lambda a: a & ~a.shift(1).fillna(False))(
            g["close"] > _sma(g["close"], 20)),
        "cross_below_sma_20": lambda g: (lambda a: a & ~a.shift(1).fillna(False))(
            g["close"] < _sma(g["close"], 20)),
        "cross_value_100": lambda g: (lambda a: a & ~a.shift(1).fillna(False))(
            g["close"] > 100),
    }


def build_workloads():
    """(kernel fns, expression fns) for the 24-ind and all-145 sets."""
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[2]")
             .config("spark.ui.showConsoleProgress", "false")
             .appName("pandas-baseline-build").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from bench import all_indicators, strategy_indicators
    from pandas_ta_spark.registry import _SUITE, default_instance

    expr = _expr_ops()

    # map expression indicators to their suite key by OUTPUT COLUMNS —
    # outputs uniquely identify (op, params), so a fresh bench instance
    # binds to exactly the variant Spark runs (a name-prefix match could
    # price sma_200_large for sma_20). Unmatched ops are a hard error:
    # silently dropping one would understate the published baseline.
    # setdefault: param-variant suite keys (r12: apo_ema_12_26,
    # qstick_ema_10, ema_noseed_10, ...) share output columns with their
    # defaults; the DEFAULT key (first in suite order) must win or every
    # default expression op would resolve to its un-priced variant
    outs_to_key: dict = {}
    for k in _SUITE:
        outs_to_key.setdefault(tuple(default_instance(k).outputs), k)

    def plan(inds):
        kernels, exprs, missing = [], [], []
        for ind in inds:
            if ind.kernel is not None:
                kernels.append(ind.kernel)
                continue
            key = outs_to_key.get(tuple(ind.outputs))
            if key in expr:
                exprs.append(expr[key])
            else:
                missing.append(ind.key)
        if missing:
            raise SystemExit(f"no pandas equivalent for: {missing}")
        return kernels, exprs, missing

    s24 = strategy_indicators()
    a145 = all_indicators()
    w24, wall = plan(s24), plan(a145)
    return w24, wall, len(s24), len(a145)


def run(df: pd.DataFrame, kernels, exprs) -> int:
    n_cols = 0
    for _, g in df.groupby("symbol", sort=False):
        g = g.reset_index(drop=True)
        for spec in kernels:
            out = spec.fn(g[["ts", *spec.inputs]].copy())
            n_cols += len(spec.outputs)
            del out
        for fn in exprs:
            r = fn(g)
            n_cols += len(r) if isinstance(r, list) else 1
            del r
    return n_cols


def main():
    (k24, e24, m24), (ka, ea, ma), n24, nall = (*build_workloads(),)
    df = tick_frame()
    print(f"rows={len(df)} 24ind: {len(k24)}k+{len(e24)}e missing={m24}",
          file=sys.stderr)
    print(f"all: {len(ka)}k+{len(ea)}e missing={ma}", file=sys.stderr)
    res = {}
    for label, (ks, es) in (("pandas_24ind_sec", (k24, e24)),
                            ("pandas_all145_sec", (ka, ea))):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            run(df, ks, es)
            best = min(best, time.time() - t0)
        res[label] = round(best, 3)
    res["rows"] = len(df)
    res["n_24"] = n24
    res["n_all"] = nall
    print(json.dumps(res))


if __name__ == "__main__":
    main()
