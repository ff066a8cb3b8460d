"""overlap/ package ops (SURVEY.md §2.2) — moving averages & price overlays.

Every factory returns an ``Indicator`` carrying both the Catalyst
expression pipeline and its DuckDB oracle twin. ROLL/WROLL/PROJ ops stay
entirely JVM-side (whole-stage codegen over one shared (symbol, ts) window
sort); EWM ops run as pandas kernels in the single batched applyInPandas
pass (plans/kernels.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_ta_spark.functions import mathutils as mu
from pandas_ta_spark.functions.naming import name
from pandas_ta_spark.functions.pdkernels import ema_pd, ewm_seeded, rma_pd
from pandas_ta_spark.functions.windows import (
    SQL_W_ORDER,
    masked,
    roll,
    shift,
    sql_masked,
    sql_roll,
    sql_shift,
    sql_wroll,
    w_order,
    w_rows,
    wroll,
)
from pandas_ta_spark.operators.base import Indicator, KernelSpec

CAT = "overlap"


# ---------------------------------------------------------------- PROJ ----

def hl2():
    """(high+low)/2 — pandas_ta/overlap/hl2.py#hl2."""
    out = "HL2"
    e = (F.col("high") + F.col("low")) / 2
    return Indicator("hl2", [out], CAT, final={out: e},
                     sql_final={out: "(high + low) / 2"})


def hlc3():
    """(h+l+c)/3 — pandas_ta/overlap/hlc3.py#hlc3."""
    out = "HLC3"
    e = (F.col("high") + F.col("low") + F.col("close")) / 3
    return Indicator("hlc3", [out], CAT, final={out: e},
                     sql_final={out: "(high + low + close) / 3"})


def ohlc4():
    """(o+h+l+c)/4 — pandas_ta/overlap/ohlc4.py#ohlc4."""
    out = "OHLC4"
    e = (F.col("open") + F.col("high") + F.col("low") + F.col("close")) / 4
    return Indicator("ohlc4", [out], CAT, final={out: e},
                     sql_final={out: "(open + high + low + close) / 4"})


def wcp():
    """weighted close (h+l+2c)/4 — pandas_ta/overlap/wcp.py#wcp."""
    out = "WCP"
    e = (F.col("high") + F.col("low") + 2 * F.col("close")) / 4
    return Indicator("wcp", [out], CAT, final={out: e},
                     sql_final={out: "(high + low + 2 * close) / 4"})


# ---------------------------------------------------------------- ROLL ----

def sma(length: int = 10, src: str = "close"):
    """Rolling mean — pandas_ta/overlap/sma.py#sma."""
    out = name("SMA", length)
    return Indicator("sma", [out], CAT,
                     final={out: roll(F.avg, src, length)},
                     sql_final={out: sql_roll("avg", src, length)})


def midpoint(length: int = 2):
    """(max(c,n)+min(c,n))/2 — pandas_ta/overlap/midpoint.py#midpoint."""
    out = name("MIDPOINT", length)
    e = (roll(F.max, "close", length) + roll(F.min, "close", length)) / 2
    s = (f"({sql_roll('max', 'close', length)} + "
         f"{sql_roll('min', 'close', length)}) / 2")
    return Indicator("midpoint", [out], CAT, final={out: e}, sql_final={out: s})


def midprice(length: int = 2):
    """(HH_n+LL_n)/2 — pandas_ta/overlap/midprice.py#midprice."""
    out = name("MIDPRICE", length)
    e = (roll(F.max, "high", length) + roll(F.min, "low", length)) / 2
    s = (f"({sql_roll('max', 'high', length)} + "
         f"{sql_roll('min', 'low', length)}) / 2")
    return Indicator("midprice", [out], CAT, final={out: e}, sql_final={out: s})


def vwma(length: int = 10):
    """SMA(c*v,n)/SMA(v,n) — pandas_ta/overlap/vwma.py#vwma."""
    out = name("VWMA", length)
    pv = F.col("close") * F.col("volume")
    e = roll(F.sum, pv, length) / roll(F.sum, "volume", length)
    s = (f"({sql_masked(f'sum(close * volume) OVER ({_wr(length)})', 'close * volume', length)})"
         f" / ({sql_roll('sum', 'volume', length)})")
    return Indicator("vwma", [out], CAT, final={out: e}, sql_final={out: s})


def trima(length: int = 10):
    """SMA(SMA(c, half), half), half = round(0.5*(n+1)) —
    pandas_ta/overlap/trima.py#trima (same half-length for BOTH nested
    SMAs, e.g. length=10 -> 6,6)."""
    out = name("TRIMA", length)
    half = round(0.5 * (length + 1))
    tmp = f"_trima_{length}_inner"
    return Indicator(
        "trima", [out], CAT,
        stages=[{tmp: roll(F.avg, "close", half)}],
        final={out: roll(F.avg, tmp, half)},
        sql_stages=[{tmp: sql_roll("avg", "close", half)}],
        sql_final={out: sql_roll("avg", tmp, half)},
    )


def linreg(length: int = 14, mode: str = "linreg"):
    """Rolling OLS vs bar position 1..n — pandas_ta/overlap/linreg.py#linreg.

    The regression runs against the global per-symbol row number: an affine
    shift of the reference's 1..n x-axis, so slope and the fitted endpoint
    value are identical. modes: linreg (endpoint), slope, intercept*, tsf.
    (*intercept differs from the reference by the slope*(rn-n) shift; we
    expose the endpoint-consistent value: fitted line at window start.)
    """
    kind = {"linreg": "LR", "slope": "LRm", "intercept": "LRb", "tsf": "LRtsf", "r": "LRr"}[mode]
    out = name(kind, length)
    tmp = f"_linreg_{length}_rn"
    rn_col = F.row_number().over(w_order()).cast("double")
    x = F.col(tmp)
    slope_e = masked(F.regr_slope(F.col("close"), x).over(w_rows(length)), "close", length)
    icpt_e = masked(F.regr_intercept(F.col("close"), x).over(w_rows(length)), "close", length)
    r_e = masked(F.corr(F.col("close"), x).over(w_rows(length)), "close", length)
    if mode == "slope":
        fin = slope_e
    elif mode == "intercept":
        fin = icpt_e + slope_e * (x - length + 1)
    elif mode == "r":
        fin = r_e
    elif mode == "tsf":
        fin = icpt_e + slope_e * (x + 1)
    else:
        fin = icpt_e + slope_e * x
    wr = _wr(length)
    s_slope = sql_masked(f"regr_slope(close, {tmp}) OVER ({wr})", "close", length)
    s_icpt = sql_masked(f"regr_intercept(close, {tmp}) OVER ({wr})", "close", length)
    s_r = sql_masked(f"corr(close, {tmp}) OVER ({wr})", "close", length)
    if mode == "slope":
        s_fin = s_slope
    elif mode == "intercept":
        s_fin = f"({s_icpt}) + ({s_slope}) * ({tmp} - {length} + 1)"
    elif mode == "r":
        s_fin = s_r
    elif mode == "tsf":
        s_fin = f"({s_icpt}) + ({s_slope}) * ({tmp} + 1)"
    else:
        s_fin = f"({s_icpt}) + ({s_slope}) * {tmp}"
    return Indicator(
        "linreg", [out], CAT,
        stages=[{tmp: rn_col}],
        final={out: fin},
        sql_stages=[{tmp: f"CAST(row_number() OVER ({SQL_W_ORDER}) AS DOUBLE)"}],
        sql_final={out: s_fin},
    )


# --------------------------------------------------------------- WROLL ----

def _wr(n: int) -> str:
    from pandas_ta_spark.functions.windows import sql_w_rows

    return sql_w_rows(n)


def _weighted(key: str, kind: str, length: int, weights: list[float], src: str = "close"):
    out = name(kind, length)
    return Indicator(key, [out], CAT,
                     final={out: wroll(src, weights)},
                     sql_final={out: sql_wroll(src, weights)})


def wma(length: int = 10, src: str = "close"):
    """Linear-weighted MA — pandas_ta/overlap/wma.py#wma.
    wroll weights are newest-first: weight n for lag 0 ... 1 for lag n-1."""
    return _weighted("wma", "WMA", length, list(reversed(mu.linear_weights(length))), src)


def pwma(length: int = 10):
    """Pascal-weighted MA — pandas_ta/overlap/pwma.py#pwma (symmetric)."""
    return _weighted("pwma", "PWMA", length, mu.pascals_triangle(length, weighted=True))


def fwma(length: int = 10):
    """Fibonacci-weighted MA — pandas_ta/overlap/fwma.py#fwma (asc: newest
    gets the largest Fibonacci weight -> reversed for lag order)."""
    return _weighted("fwma", "FWMA", length, list(reversed(mu.fibonacci(length))))


def swma(length: int = 10):
    """Symmetric-triangle-weighted MA — pandas_ta/overlap/swma.py#swma."""
    return _weighted("swma", "SWMA", length, mu.symmetric_triangle(length))


def sinwma(length: int = 14):
    """Sine-weighted MA — pandas_ta/overlap/sinwma.py#sinwma (symmetric)."""
    return _weighted("sinwma", "SINWMA", length, mu.sine_weights(length))


def alma(length: int = 10, sigma: float = 6.0, distribution_offset: float = 0.85):
    """Arnaud Legoux MA — pandas_ta/overlap/alma.py#alma. Gaussian weights
    peak toward the newest bar (offset 0.85): weight index i counts from the
    oldest bar, lag order reverses."""
    out = name("ALMA", length, sigma, distribution_offset)
    ws = list(reversed(mu.alma_weights(length, sigma, distribution_offset)))
    return Indicator("alma", [out], CAT,
                     final={out: wroll("close", ws)},
                     sql_final={out: sql_wroll("close", ws)})


def hma(length: int = 10):
    """Hull MA: WMA(2*WMA(c,n/2) - WMA(c,n), sqrt(n)) —
    pandas_ta/overlap/hma.py#hma."""
    out = name("HMA", length)
    half, root = length // 2, int(length ** 0.5)
    w_half = list(reversed(mu.linear_weights(half)))
    w_full = list(reversed(mu.linear_weights(length)))
    w_root = list(reversed(mu.linear_weights(root)))
    tmp = f"_hma_{length}_raw"
    return Indicator(
        "hma", [out], CAT,
        stages=[{tmp: 2 * wroll("close", w_half) - wroll("close", w_full)}],
        final={out: wroll(tmp, w_root)},
        sql_stages=[{tmp: f"2 * ({sql_wroll('close', w_half)}) - ({sql_wroll('close', w_full)})"}],
        sql_final={out: sql_wroll(tmp, w_root)},
    )


# ----------------------------------------------------------------- CUM ----

def vwap(anchor: str = "day"):
    """Anchored VWAP: cumulative sum(hlc3*v)/sum(v) within (symbol, anchor
    period) — pandas_ta/overlap/vwap.py#vwap. The anchor becomes part of the
    window partition key, so at scale each day's accumulation is independent
    (no cross-day state; partition pruning applies on the anchor)."""
    from pyspark.sql import Window

    out = f"VWAP_{anchor[0].upper()}"
    tp = (F.col("high") + F.col("low") + F.col("close")) / 3
    w = (
        Window.partitionBy("symbol", F.date_trunc(anchor, F.col("ts")))
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # fixed-point numerator: deterministic across engines/partition orders
    # (see functions/windows.py cumsum_fixed); volume sums are integers
    # already and stay exact
    q = F.floor(tp * F.col("volume") * 1e8 + F.lit(0.5)).cast("long")
    e = (F.sum(q).over(w) / F.lit(1e8)) / F.sum("volume").over(w)
    sw = (f"PARTITION BY symbol, date_trunc('{anchor}', ts) ORDER BY ts "
          f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
    s = (f"(sum(CAST(floor((high + low + close) / 3 * volume * 1e8 + 0.5) AS BIGINT))"
         f" OVER ({sw}) / 1e8) / sum(volume) OVER ({sw})")
    return Indicator("vwap", [out], CAT, final={out: e}, sql_final={out: s})


# ----------------------------------------------------------------- EWM ----

def _ewm_kernel(key: str, out: str, fn, inputs=("close",), sql_full=None):
    return Indicator(key, [out], CAT,
                     kernel=KernelSpec(fn, [out], list(inputs)),
                     sql_full=sql_full)


def ema(length: int = 10):
    """EMA alpha=2/(n+1), SMA-seeded — pandas_ta/overlap/ema.py#ema."""
    out = name("EMA", length)

    def fn(pdf):
        pdf[out] = ema_pd(pdf["close"], length)
        return pdf

    from pandas_ta_spark.operators.ewm_sql import sql_ewm_simple

    return _ewm_kernel("ema", out, fn,
                       sql_full=sql_ewm_simple(out, "close", 2.0 / (length + 1), length))


def rma(length: int = 10):
    """Wilder MA alpha=1/n — pandas_ta/overlap/rma.py#rma."""
    out = name("RMA", length)

    def fn(pdf):
        pdf[out] = rma_pd(pdf["close"], length)
        return pdf

    from pandas_ta_spark.operators.ewm_sql import sql_ewm_simple

    return _ewm_kernel("rma", out, fn,
                       sql_full=sql_ewm_simple(out, "close", 1.0 / length, length))


def dema(length: int = 10):
    """2*EMA - EMA(EMA) — pandas_ta/overlap/dema.py#dema."""
    out = name("DEMA", length)

    def fn(pdf):
        e1 = ema_pd(pdf["close"], length)
        e2 = ema_pd(e1, length)
        pdf[out] = 2 * e1 - e2
        return pdf

    return _ewm_kernel("dema", out, fn)


def tema(length: int = 10):
    """3*(EMA1-EMA2) + EMA3 — pandas_ta/overlap/tema.py#tema."""
    out = name("TEMA", length)

    def fn(pdf):
        e1 = ema_pd(pdf["close"], length)
        e2 = ema_pd(e1, length)
        e3 = ema_pd(e2, length)
        pdf[out] = 3 * (e1 - e2) + e3
        return pdf

    return _ewm_kernel("tema", out, fn)


def t3(length: int = 10, a: float = 0.7):
    """Tillson T3: six chained EMAs, vfactor polynomial combine —
    pandas_ta/overlap/t3.py#t3."""
    out = name("T3", length, a)
    c1 = -(a ** 3)
    c2 = 3 * a * a + 3 * a ** 3
    c3 = -6 * a * a - 3 * a - 3 * a ** 3
    c4 = a ** 3 + 3 * a * a + 3 * a + 1

    def fn(pdf):
        e = pdf["close"]
        es = []
        for _ in range(6):
            e = ema_pd(e, length)
            es.append(e)
        _, _, e3, e4, e5, e6 = es
        pdf[out] = c1 * e6 + c2 * e5 + c3 * e4 + c4 * e3
        return pdf

    return _ewm_kernel("t3", out, fn)


def zlma(length: int = 10):
    """Zero-lag EMA: EMA(2c - c.shift(lag)), lag=(n-1)//2 —
    pandas_ta/overlap/zlma.py#zlma."""
    out = name("ZL_EMA", length)
    lag = (length - 1) // 2

    def fn(pdf):
        src = 2 * pdf["close"] - pdf["close"].shift(lag)
        pdf[out] = ema_pd(src, length)
        return pdf

    return _ewm_kernel("zlma", out, fn)


FACTORIES = {
    "hl2": hl2, "hlc3": hlc3, "ohlc4": ohlc4, "wcp": wcp, "sma": sma,
    "midpoint": midpoint, "midprice": midprice, "vwma": vwma, "trima": trima,
    "linreg": linreg, "wma": wma, "pwma": pwma, "fwma": fwma, "swma": swma,
    "sinwma": sinwma, "alma": alma, "hma": hma, "vwap": vwap, "ema": ema,
    "rma": rma, "dema": dema, "tema": tema, "t3": t3, "zlma": zlma,
}

# driver-facing default-parameter instances (queries()/oracle_sql() keys)
SUITE = {
    "hl2": hl2, "hlc3": hlc3, "ohlc4": ohlc4, "wcp": wcp,
    "sma_20": lambda: sma(20), "midpoint_2": midpoint, "midprice_2": midprice,
    "vwma_10": vwma, "trima_10": trima, "linreg_14": linreg,
    "linreg_slope_14": lambda: linreg(14, "slope"),
    "wma_10": wma, "pwma_10": pwma, "fwma_10": fwma, "swma_10": swma,
    "sinwma_14": sinwma, "alma_10": alma, "hma_10": hma, "vwap": vwap,
    "ema_10": ema, "rma_10": rma, "dema_10": dema, "tema_10": tema,
    "t3_10": t3, "zlma_10": zlma,
}
