"""volatility/ package ops (SURVEY.md §2.6).

true_range/bbands/donchian/ui/pdist/accbands are pure window SQL; the
ATR/KC/MASSI/RVI/THERMO/ABERRATION family smooths with SMA-seeded EWM
kernels (Arrow pass) and carries exact recursive-CTE oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_ta_spark.functions.naming import name
from pandas_ta_spark.functions.windows import (
    masked,
    roll,
    shift,
    sql_diff,
    sql_masked,
    sql_roll,
    sql_shift,
    sql_w_rows,
    w_rows,
    sql_const_guard,
)
from pandas_ta_spark.operators.base import Indicator, KernelSpec
from pandas_ta_spark.operators.ewm_sql import EwmStage, ewm_pipeline_sql
from pandas_ta_spark.operators.momentum import (
    EPS,
    _nzr,
    _sql_nzr,
    _sql_true_range,
    pd_true_range,
)
from pandas_ta_spark.functions.pdkernels import ema_pd, rma_pd

CAT = "volatility"


def true_range(drift: int = 1):
    """max(h-l, |h-prevc|, |l-prevc|), NULL first row —
    pandas_ta/volatility/true_range.py#true_range."""
    out = name("TRUERANGE", drift)
    prevc = shift("close", drift)
    e = F.when(prevc.isNull(), None).otherwise(
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - prevc),
            F.abs(F.col("low") - prevc),
        )
    )
    return Indicator("true_range", [out], CAT, final={out: e},
                     sql_final={out: _sql_true_range(drift)})


def atr(length: int = 14, percent: bool = False):
    """RMA(TR, n) — pandas_ta/volatility/atr.py#atr (mamode rma)."""
    out = name("ATRr", length) + ("p" if percent else "")

    def fn(pdf):
        tr = pd_true_range(pdf, pdf["close"].shift(1))
        a = rma_pd(tr, length)
        pdf[out] = 100 * a / pdf["close"] if percent else a
        return pdf

    fin = "100 * _a / close" if percent else "_a"
    sql = ewm_pipeline_sql(
        [EwmStage("_a", "_tr", 1.0 / length, length)],
        {out: fin},
        pre={"_tr": _sql_true_range()},
    )
    return Indicator("atr", [out], CAT,
                     kernel=KernelSpec(fn, [out], ["high", "low", "close"]),
                     sql_full=sql)


def natr(length: int = 14):
    """100 * ATR/c — pandas_ta/volatility/natr.py#natr."""
    out = name("NATR", length)

    def fn(pdf):
        tr = pd_true_range(pdf, pdf["close"].shift(1))
        pdf[out] = 100 / pdf["close"] * rma_pd(tr, length)
        return pdf

    sql = ewm_pipeline_sql(
        [EwmStage("_a", "_tr", 1.0 / length, length)],
        {out: "100 / close * _a"},
        pre={"_tr": _sql_true_range()},
    )
    return Indicator("natr", [out], CAT,
                     kernel=KernelSpec(fn, [out], ["high", "low", "close"]),
                     sql_full=sql)


def bbands(length: int = 5, std: float = 2.0, ddof: int = 0):
    """Bollinger Bands: BBL/BBM/BBU/BBB/BBP —
    pandas_ta/volatility/bbands.py#bbands (default ddof=0)."""
    suffix = f"{length}_{std}"
    outs = [f"BB{x}_{suffix}" for x in ("L", "M", "U", "B", "P")]
    mid_c, sd_c = f"_bb_mid", f"_bb_sd"
    sd_agg = "stddev_pop" if ddof == 0 else "stddev_samp"

    def fn(pdf):
        import numpy as np

        from pandas_ta_spark.functions.pdkernels import roll_mean_pd, roll_std_pd

        mid = roll_mean_pd(pdf["close"], length)
        sd = roll_std_pd(pdf["close"], length, ddof)
        low = mid - std * sd
        up = mid + std * sd
        rng = up - low
        rng = rng + np.where(rng == 0, EPS, 0.0)
        pdf[outs[0]] = low
        pdf[outs[1]] = mid
        pdf[outs[2]] = up
        pdf[outs[3]] = 100 * (up - low) / mid
        pdf[outs[4]] = (pdf["close"] - low) / rng
        return pdf

    s_low = f"({mid_c} - {std!r} * {sd_c})"
    s_up = f"({mid_c} + {std!r} * {sd_c})"
    return Indicator(
        "bbands", outs, CAT,
        kernel=KernelSpec(fn, outs, ["close"], carry_rows=length - 1),
        sql_stages=[{mid_c: sql_roll("avg", "close", length),
                     # constant-frame std pinned to exact 0, matching the
                     # kernel (pdkernels.roll_const_mask rationale)
                     sd_c: sql_const_guard(
                         "close", length, "0.0",
                         sql_roll(sd_agg, "close", length))}],
        sql_final={
            outs[0]: s_low,
            outs[1]: mid_c,
            outs[2]: s_up,
            outs[3]: f"100 * ({s_up} - {s_low}) / {mid_c}",
            outs[4]: f"(close - {s_low}) / {_sql_nzr(s_up, s_low)}",
        },
    )


def donchian(lower_length: int = 20, upper_length: int = 20):
    """DCL/DCM/DCU — pandas_ta/volatility/donchian.py#donchian."""
    suffix = f"{lower_length}_{upper_length}"
    outs = [f"DC{x}_{suffix}" for x in ("L", "M", "U")]

    def fn(pdf):
        from pandas_ta_spark.functions.pdkernels import roll_max_pd, roll_min_pd

        ll = roll_min_pd(pdf["low"], lower_length)
        hh = roll_max_pd(pdf["high"], upper_length)
        pdf[outs[0]] = ll
        pdf[outs[1]] = (ll + hh) / 2
        pdf[outs[2]] = hh
        return pdf

    s_ll = sql_roll("min", "low", lower_length)
    s_hh = sql_roll("max", "high", upper_length)
    return Indicator(
        "donchian", outs, CAT,
        kernel=KernelSpec(fn, outs, ["high", "low"],
                          carry_rows=max(lower_length, upper_length) - 1),
        sql_final={outs[0]: s_ll,
                   outs[1]: f"(({s_ll}) + ({s_hh})) / 2",
                   outs[2]: s_hh},
    )


def kc(length: int = 20, scalar: float = 2.0, tr: bool = True):
    """Keltner Channel (ema basis ± scalar*ema(TR)) —
    pandas_ta/volatility/kc.py#kc."""
    suffix = f"{length}_{scalar if scalar != int(scalar) else int(scalar)}"
    outs = [f"KC{x}e_{suffix}" for x in ("L", "B", "U")]

    def fn(pdf):
        basis = ema_pd(pdf["close"], length)
        rng = (
            pd_true_range(pdf, pdf["close"].shift(1))
            if tr
            else pdf["high"] - pdf["low"]
        )
        band = ema_pd(rng, length)
        pdf[outs[0]] = basis - scalar * band
        pdf[outs[1]] = basis
        pdf[outs[2]] = basis + scalar * band
        return pdf

    rng_sql = _sql_true_range() if tr else "(high - low)"
    a = 2.0 / (length + 1)
    sql = ewm_pipeline_sql(
        [EwmStage("_basis", "close", a, length), EwmStage("_band", "_rng", a, length)],
        {outs[0]: f"_basis - {scalar!r} * _band",
         outs[1]: "_basis",
         outs[2]: f"_basis + {scalar!r} * _band"},
        pre={"_rng": rng_sql},
    )
    return Indicator("kc", outs, CAT,
                     kernel=KernelSpec(fn, outs, ["high", "low", "close"]),
                     sql_full=sql)


def massi(fast: int = 9, slow: int = 25):
    """Mass Index: sum(EMA(h-l,f)/EMA(EMA(h-l,f),f), slow) —
    pandas_ta/volatility/massi.py#massi."""
    out = name("MASSI", fast, slow)

    def fn(pdf):
        hl = pdf["high"] - pdf["low"]
        e1 = ema_pd(hl, fast)
        e2 = ema_pd(e1, fast)
        pdf[out] = (e1 / e2).rolling(slow).sum()
        return pdf

    a = 2.0 / (fast + 1)
    sql = ewm_pipeline_sql(
        [
            EwmStage("_e1", "high - low", a, fast),
            EwmStage("_e2", "_e1", a, fast),
            {"_ratio": "_e1 / _e2"},
        ],
        {out: sql_roll("sum", "_ratio", slow)},
    )
    return Indicator("massi", [out], CAT,
                     kernel=KernelSpec(fn, [out], ["high", "low"]),
                     sql_full=sql)


def pdist(drift: int = 1):
    """2(h-l) - |c-o| + |o - c.shift| — pandas_ta/volatility/pdist.py#pdist."""
    out = "PDIST"
    prevc = shift("close", drift)
    e = (
        2 * (F.col("high") - F.col("low"))
        - F.abs(F.col("close") - F.col("open"))
        + F.abs(F.col("open") - prevc)
    )
    sp = sql_shift("close", drift)
    s = f"2 * (high - low) - abs(close - open) + abs(open - ({sp}))"
    return Indicator("pdist", [out], CAT, final={out: e}, sql_final={out: s})


def ui(length: int = 14, scalar: float = 100.0):
    """Ulcer Index: sqrt(sum(d^2, n)/n), d = scalar*(c - HH(c,n))/HH —
    pandas_ta/volatility/ui.py#ui."""
    out = name("UI", length)
    d = "_ui_d"
    s_hh = sql_roll("max", "close", length)

    def fn(pdf):
        import numpy as np

        from pandas_ta_spark.functions.pdkernels import (
            div0_np, roll_max_pd, roll_sum_seq_pd,
        )

        import pandas as pd

        c = pdf["close"]
        hh = roll_max_pd(c, length)
        dd = pd.Series(div0_np(scalar * (c - hh), hh) ** 2, index=c.index)
        pdf[out] = np.sqrt(roll_sum_seq_pd(dd, length) / length)
        return pdf

    return Indicator(
        "ui", [out], CAT,
        kernel=KernelSpec(fn, [out], ["close"],
                          carry_rows=2 * (length - 1)),
        sql_stages=[{d: f"({scalar!r} * (close - ({s_hh})) / ({s_hh})) ** 2"}],
        sql_final={out: f"sqrt(({sql_roll('sum', d, length)}) / {length})"},
    )


def accbands(length: int = 20, c: float = 4.0):
    """Acceleration Bands — pandas_ta/volatility/accbands.py#accbands."""
    outs = [f"ACCB{x}_{length}" for x in ("L", "M", "U")]
    lo_c, hi_c = "_accb_lo", "_accb_hi"
    s_ratio = f"({_sql_nzr('high', 'low')} / {_sql_nzr('high + low', '0.0')})"

    def fn(pdf):
        from pandas_ta_spark.functions.pdkernels import nzr_np, roll_mean_seq_pd

        import pandas as pd

        h, low = pdf["high"], pdf["low"]
        ratio = nzr_np(h, low) / nzr_np(h + low, 0.0)
        pdf[outs[0]] = roll_mean_seq_pd(
            pd.Series(low * (1 - c * ratio), index=h.index), length)
        pdf[outs[1]] = roll_mean_seq_pd(pdf["close"], length)
        pdf[outs[2]] = roll_mean_seq_pd(
            pd.Series(h * (1 + c * ratio), index=h.index), length)
        return pdf

    return Indicator(
        "accbands", outs, CAT,
        kernel=KernelSpec(fn, outs, ["high", "low", "close"],
                          carry_rows=length - 1),
        sql_stages=[{lo_c: f"low * (1 - {c!r} * {s_ratio})",
                     hi_c: f"high * (1 + {c!r} * {s_ratio})"}],
        sql_final={outs[0]: sql_roll("avg", lo_c, length),
                   outs[1]: sql_roll("avg", "close", length),
                   outs[2]: sql_roll("avg", hi_c, length)},
    )


def rvi(length: int = 14, scalar: float = 100.0, drift: int = 1):
    """Relative Volatility Index: EMA of up/down-split rolling std —
    pandas_ta/volatility/rvi.py#rvi (mamode ema). NULL while either the
    std window or the diff is warming up."""
    out = name("RVI", length)

    def fn(pdf):
        import numpy as np

        sd = pdf["close"].rolling(length).std()  # ddof=1
        d = pdf["close"].diff(drift)
        pos = sd.where(d > 0, 0.0)
        neg = sd.where(d <= 0, 0.0)
        nan = sd.isna() | d.isna()
        pos[nan] = np.nan
        neg[nan] = np.nan
        p = ema_pd(pos, length)
        n = ema_pd(neg, length)
        pdf[out] = scalar * p / (p + n)
        return pdf

    s_sd = sql_roll("stddev_samp", "close", length)
    s_d = sql_diff("close", drift)
    pos = (f"CASE WHEN ({s_sd}) IS NULL OR ({s_d}) IS NULL THEN NULL"
           f" WHEN ({s_d}) > 0 THEN ({s_sd}) ELSE 0.0 END")
    neg = (f"CASE WHEN ({s_sd}) IS NULL OR ({s_d}) IS NULL THEN NULL"
           f" WHEN ({s_d}) <= 0 THEN ({s_sd}) ELSE 0.0 END")
    a = 2.0 / (length + 1)
    sql = ewm_pipeline_sql(
        [EwmStage("_p", "_pos", a, length), EwmStage("_n", "_neg", a, length)],
        {out: f"{scalar!r} * _p / (_p + _n)"},
        pre={"_pos": pos, "_neg": neg},
    )
    return Indicator("rvi", [out], CAT,
                     kernel=KernelSpec(fn, [out], ["close"]),
                     sql_full=sql)


def thermo(length: int = 20, long: float = 2.0, short: float = 0.5, drift: int = 1):
    """Elder Thermometer + EMA + long/short flags —
    pandas_ta/volatility/thermo.py#thermo."""
    suffix = f"{length}_{long if long != int(long) else int(long)}_{short}"
    o_t, o_ma = f"THERMO_{suffix}", f"THERMOma_{suffix}"
    o_l, o_s = f"THERMOl_{suffix}", f"THERMOs_{suffix}"

    def fn(pdf):
        import numpy as np

        tl = (pdf["low"].shift(drift) - pdf["low"]).abs()
        th = (pdf["high"] - pdf["high"].shift(drift)).abs()
        t = th.where(th > tl, tl)
        ma = ema_pd(t, length)
        pdf[o_t] = t
        pdf[o_ma] = ma
        pdf[o_l] = (t < ma * long).astype(float).where(ma.notna(), np.nan)
        pdf[o_s] = (t > ma * short).astype(float).where(ma.notna(), np.nan)
        return pdf

    s_tl = f"abs(({sql_shift('low', drift)}) - low)"
    s_th = f"abs(high - ({sql_shift('high', drift)}))"
    t_sql = f"CASE WHEN ({s_th}) > ({s_tl}) THEN ({s_th}) ELSE ({s_tl}) END"
    sql = ewm_pipeline_sql(
        [EwmStage("_ma", "_t", 2.0 / (length + 1), length)],
        {
            o_t: "_t",
            o_ma: "_ma",
            o_l: f"CASE WHEN _ma IS NULL THEN NULL ELSE CAST(_t < _ma * {long!r} AS DOUBLE) END",
            o_s: f"CASE WHEN _ma IS NULL THEN NULL ELSE CAST(_t > _ma * {short!r} AS DOUBLE) END",
        },
        pre={"_t": t_sql},
    )
    return Indicator("thermo", [o_t, o_ma, o_l, o_s], CAT,
                     kernel=KernelSpec(fn, [o_t, o_ma, o_l, o_s], ["high", "low"]),
                     sql_full=sql)


def aberration(length: int = 5, atr_length: int = 15):
    """ATR bands around SMA(hlc3) — pandas_ta/volatility/aberration.py."""
    outs = [f"ABER_{x}_{length}_{atr_length}" for x in ("ZG", "SG", "XG", "ATR")]

    def fn(pdf):
        tp = (pdf["high"] + pdf["low"] + pdf["close"]) / 3
        zg = tp.rolling(length).mean()
        a = rma_pd(pd_true_range(pdf, pdf["close"].shift(1)), atr_length)
        pdf[outs[0]] = zg
        pdf[outs[1]] = zg + a
        pdf[outs[2]] = zg - a
        pdf[outs[3]] = a
        return pdf

    s_zg = sql_masked(
        f"avg((high + low + close) / 3) OVER ({sql_w_rows(length)})",
        "close", length,
    )
    sql = ewm_pipeline_sql(
        [EwmStage("_a", "_tr", 1.0 / atr_length, atr_length), {"_zg": s_zg}],
        {outs[0]: "_zg", outs[1]: "_zg + _a", outs[2]: "_zg - _a", outs[3]: "_a"},
        pre={"_tr": _sql_true_range()},
    )
    return Indicator("aberration", outs, CAT,
                     kernel=KernelSpec(fn, outs, ["high", "low", "close"]),
                     sql_full=sql)


def hwc(na: float = 0.2, nb: float = 0.1, nc: float = 0.1, nd: float = 0.1,
        scalar: float = 1.0):
    """Holt-Winter Channel: hwma recursion ± scaled variance channel —
    pandas_ta/volatility/hwc.py#hwc (sequential; Arrow kernel)."""
    outs = ["HWM", "HWU", "HWL"]

    def fn(pdf):
        import numpy as np

        x = pdf["close"].to_numpy()
        n = len(pdf)
        mid = np.full(n, np.nan)
        up = np.full(n, np.nan)
        lo = np.full(n, np.nan)
        last_a = last_v = var = 0.0
        last_f = x[0] if n else 0.0
        last_price = x[0] if n else 0.0
        for i in range(n):
            fl = (1 - na) * (last_f + last_v + 0.5 * last_a) + na * x[i]
            v = (1 - nb) * (last_v + last_a) + nb * (fl - last_f)
            a2 = (1 - nc) * last_a + nc * (v - last_v)
            m = fl + v + 0.5 * a2
            var = (1 - nd) * var + nd * (last_price - m) ** 2
            stddev = var ** 0.5
            mid[i] = m
            up[i] = m + scalar * stddev
            lo[i] = m - scalar * stddev
            last_f, last_v, last_a, last_price = fl, v, a2, x[i]
        pdf[outs[0]], pdf[outs[1]], pdf[outs[2]] = mid, up, lo
        return pdf

    from pandas_ta_spark.operators.ewm_sql import recursive_oracle

    # anchor mirrors i=0 from (f=x0, v=0, a=0, var=0, last_price=x0);
    # all step expressions fully inlined (no lateral aliases)
    a_f0 = f"((1 - {na!r}) * (b.close + 0 + 0.5 * 0) + {na!r} * b.close)"
    a_v0 = f"((1 - {nb!r}) * (0 + 0) + {nb!r} * ({a_f0} - b.close))"
    a_a0 = f"((1 - {nc!r}) * 0 + {nc!r} * ({a_v0} - 0))"
    a_m0 = f"({a_f0} + {a_v0} + 0.5 * {a_a0})"
    a_var0 = f"((1 - {nd!r}) * 0 + {nd!r} * (b.close - {a_m0}) ** 2)"
    s_f = f"((1 - {na!r}) * (r._f + r._v + 0.5 * r._a) + {na!r} * b.close)"
    s_v = f"((1 - {nb!r}) * (r._v + r._a) + {nb!r} * ({s_f} - r._f))"
    s_a = f"((1 - {nc!r}) * r._a + {nc!r} * ({s_v} - r._v))"
    s_m = f"({s_f} + {s_v} + 0.5 * {s_a})"
    s_var = f"((1 - {nd!r}) * r._var + {nd!r} * (b._pc - {s_m}) ** 2)"
    sd = "(_var ** 0.5)"  # kernel uses var ** 0.5, not sqrt
    m_out = "(_f + _v + 0.5 * _a)"
    sql = recursive_oracle(
        pre={"_pc": "lag(close, 1) OVER (PARTITION BY symbol ORDER BY ts)"},
        anchor_where="b._rn = 1",
        anchor_state={"_f": a_f0, "_v": a_v0, "_a": a_a0, "_var": a_var0},
        step_state={"_f": s_f, "_v": s_v, "_a": s_a, "_var": s_var},
        step_inputs=["close", "_pc"],
        final={
            outs[0]: m_out,
            outs[1]: f"({m_out} + {scalar!r} * {sd})",
            outs[2]: f"({m_out} - {scalar!r} * {sd})",
        },
    )
    return Indicator("hwc", outs, CAT, kernel=KernelSpec(fn, outs, ["close"]),
                     sql_full=sql)


FACTORIES = {
    "hwc": hwc,
    "true_range": true_range, "atr": atr, "natr": natr, "bbands": bbands,
    "donchian": donchian, "kc": kc, "massi": massi, "pdist": pdist, "ui": ui,
    "accbands": accbands, "rvi": rvi, "thermo": thermo, "aberration": aberration,
}

SUITE = {
    "hwc": hwc,
    "true_range": true_range, "atr_14": atr,
    "atr_14_percent": lambda: atr(14, percent=True),
    "natr_14": natr,
    "bbands_5_2.0": bbands,
    "bbands_ddof1_5_2.0": lambda: bbands(5, 2.0, ddof=1), "donchian_20": donchian, "kc_20": kc,
    "massi_9_25": massi, "pdist": pdist, "ui_14": ui, "accbands_20": accbands,
    "rvi_14": rvi, "thermo_20": thermo, "aberration_5_15": aberration,
}
