"""candles/ + cycles/ package ops (SURVEY.md §2.8).

cdl_doji/cdl_inside/cdl_z are lag/window projections; ha (Heikin-Ashi)
carries a per-row open recursion and ebsw a band-pass IIR loop — both run
as Arrow kernels, value-checked against recursive-CTE DuckDB twins
(operators/ewm_sql.py) like every other key; the suite has no rows-only
checks.
"""

from __future__ import annotations

import functools

from pyspark.sql import functions as F

from pandas_ta_spark.functions.naming import name
from pandas_ta_spark.functions.windows import (
    diff,
    roll,
    shift,
    sql_diff,
    sql_roll,
    sql_shift,
)
from pandas_ta_spark.operators.base import Indicator, KernelSpec

CAT = "candles"


def cdl_doji(length: int = 10, factor: float = 10.0):
    """Doji: |c-o| < factor% of SMA(h-l, n); encoded 100/0 —
    pandas_ta/candles/cdl_doji.py#cdl_doji."""
    out = f"CDL_DOJI_{length}_{factor / 100}"
    t = "_doji_rng"
    body = F.abs(F.col("close") - F.col("open"))
    avg_rng = roll(F.avg, t, length)
    e = F.when(avg_rng.isNull(), None).otherwise(
        F.when(body < F.lit(factor / 100) * avg_rng, 100.0).otherwise(0.0)
    )
    s_avg = sql_roll("avg", t, length)
    s = (f"CASE WHEN ({s_avg}) IS NULL THEN NULL"
         f" WHEN abs(close - open) < {factor / 100!r} * ({s_avg})"
         f" THEN 100.0 ELSE 0.0 END")
    return Indicator(
        "cdl_doji", [out], CAT,
        stages=[{t: F.col("high") - F.col("low")}],
        final={out: e},
        sql_stages=[{t: "(high - low)"}],
        sql_final={out: s},
    )


def cdl_inside(asbool: bool = False):
    """Inside bar signed by candle color —
    pandas_ta/candles/cdl_inside.py#cdl_inside."""
    out = "CDL_INSIDE"
    inside = (diff("high", 1) < 0) & (diff("low", 1) > 0)
    color = F.when(F.col("close") >= F.col("open"), 1.0).otherwise(-1.0)
    e = F.when(inside, color).otherwise(0.0)
    s_in = f"(({sql_diff('high', 1)}) < 0 AND ({sql_diff('low', 1)}) > 0)"
    s_color = "CASE WHEN close >= open THEN 1.0 ELSE -1.0 END"
    s = f"CASE WHEN coalesce({s_in}, false) THEN ({s_color}) ELSE 0.0 END"
    return Indicator("cdl_inside", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_z(length: int = 30):
    """Z-scored OHLC — pandas_ta/candles/cdl_z.py#cdl_z (Arrow kernel:
    8 sliding mean/stddev frames, same per-frame recompute as the
    absorbed statistics ops; SQL twin unchanged)."""
    from pandas_ta_spark.functions.windows import sql_const_guard

    cols = ["open", "high", "low", "close"]
    outs = [f"{c}_Z_{length}" for c in cols]
    sql_final = {}
    for c, o in zip(cols, outs):
        # constant frame -> 0/0 -> NULL on both engines
        # (pdkernels.roll_const_mask rationale)
        sql_final[o] = sql_const_guard(
            c, length, "CAST(NULL AS DOUBLE)",
            f"({c} - ({sql_roll('avg', c, length)}))"
            f" / ({sql_roll('stddev_samp', c, length)})")

    def fn(pdf):
        import numpy as np

        from pandas_ta_spark.functions.pdkernels import (
            roll_const_mask, roll_mean_pd, roll_std_pd)

        for c, o in zip(cols, outs):
            x = pdf[c]
            z = (x - roll_mean_pd(x, length)) / roll_std_pd(x, length)
            z[roll_const_mask(x, length)] = np.nan
            pdf[o] = z
        return pdf

    return Indicator(
        "cdl_z", outs, CAT,
        kernel=KernelSpec(fn, outs, cols, carry_rows=length - 1),
        sql_final=sql_final)


def ha():
    """Heikin-Ashi: ha_open is a per-row recursion —
    pandas_ta/candles/ha.py#ha (Arrow kernel; vectorized except the open
    chain, which is a first-order average recursion)."""
    outs = ["HA_open", "HA_high", "HA_low", "HA_close"]

    def fn(pdf):
        import numpy as np

        o = pdf["open"].to_numpy()
        h = pdf["high"].to_numpy()
        low = pdf["low"].to_numpy()
        c = pdf["close"].to_numpy()
        n = len(pdf)
        hc = (o + h + low + c) / 4
        ho = np.empty(n)
        if n:
            ho[0] = (o[0] + c[0]) / 2
            for i in range(1, n):
                ho[i] = (ho[i - 1] + hc[i - 1]) / 2
        pdf[outs[0]] = ho
        pdf[outs[1]] = np.maximum.reduce([h, ho, hc])
        pdf[outs[2]] = np.minimum.reduce([low, ho, hc])
        pdf[outs[3]] = hc
        return pdf

    from pandas_ta_spark.operators.ewm_sql import recursive_oracle

    sql = recursive_oracle(
        pre={"_hc": "(open + high + low + close) / 4"},
        anchor_where="b._rn = 1",
        anchor_state={"_y": "(b.open + b.close) / 2", "_hcp": "b._hc"},
        step_state={"_y": "(r._y + r._hcp) / 2", "_hcp": "b._hc"},
        step_inputs=["_hc"],
        final={
            outs[0]: "_y",
            outs[1]: "greatest(b.high, _y, b._hc)",
            outs[2]: "least(b.low, _y, b._hc)",
            outs[3]: "b._hc",
        },
    )
    return Indicator("ha", outs, CAT,
                     kernel=KernelSpec(fn, outs, ["open", "high", "low", "close"]),
                     sql_full=sql)


def ebsw(length: int = 40, bars: int = 10):
    """Ehlers Even Better SineWave: recursive band-pass —
    pandas_ta/cycles/ebsw.py#ebsw (sequential IIR; Arrow kernel)."""
    import math

    out = name("EBSW", length, bars)

    def fn(pdf):
        import numpy as np

        c = pdf["close"].to_numpy()
        n = len(pdf)
        res = np.full(n, np.nan)
        # no group-size gate: the oracle anchors at row 1 and emits from
        # row 2 for ANY group size — a kernel-side `n >= length` refusal
        # made sub-length groups all-NaN on Spark only (fuzz gate, tiny
        # profile). Warmup row 1 stays NaN via the loop start.
        last_close = c[0] if n else 0.0
        last_hp = 0.0
        filt_hist = [0.0, 0.0]
        alpha1 = (1 - math.sin(2 * math.pi / length)) / math.cos(2 * math.pi / length)
        angle = math.sqrt(2) * math.pi / bars
        a1 = math.exp(-angle)
        b1 = 2 * a1 * math.cos(angle)
        c2, c3 = b1, -a1 * a1
        c1 = 1 - c2 - c3
        for i in range(1, n):
            hp = 0.5 * (1 + alpha1) * (c[i] - last_close) + alpha1 * last_hp
            filt = c1 * (hp + last_hp) / 2 + c2 * filt_hist[1] + c3 * filt_hist[0]
            wave = (filt + filt_hist[1] + filt_hist[0]) / 3
            pwr = (filt ** 2 + filt_hist[1] ** 2 + filt_hist[0] ** 2) / 3
            res[i] = wave / math.sqrt(pwr) if pwr > 0 else float("nan")
            filt_hist = [filt_hist[1], filt]
            last_close, last_hp = c[i], hp
        pdf[out] = res
        return pdf

    from pandas_ta_spark.operators.ewm_sql import recursive_oracle

    alpha1 = (1 - math.sin(2 * math.pi / length)) / math.cos(2 * math.pi / length)
    angle = math.sqrt(2) * math.pi / bars
    a1 = math.exp(-angle)
    b1 = 2 * a1 * math.cos(angle)
    c2, c3 = b1, -a1 * a1
    c1 = 1 - c2 - c3
    al = repr(alpha1)
    hp = f"(0.5 * (1 + {al}) * (b.close - r._lc) + {al} * r._lhp)"
    filt = f"({c1!r} * ({hp} + r._lhp) / 2 + {c2!r} * r._f1 + {c3!r} * r._f0)"
    wave = f"(({filt} + r._f1 + r._f0) / 3)"
    pwr = f"(({filt} ** 2 + r._f1 ** 2 + r._f0 ** 2) / 3)"
    sql = recursive_oracle(
        pre={},
        anchor_where="b._rn = 1",
        anchor_state={"_lc": "b.close", "_lhp": "0.0", "_f0": "0.0",
                      "_f1": "0.0", "_out": "CAST(NULL AS DOUBLE)"},
        step_state={
            "_lc": "b.close",
            "_lhp": hp,
            "_f0": "r._f1",
            "_f1": filt,
            "_out": f"CASE WHEN {pwr} > 0 THEN {wave} / sqrt({pwr}) END",
        },
        step_inputs=["close"],
        final={out: "_out"},
    )
    return Indicator("ebsw", [out], CAT, kernel=KernelSpec(fn, [out], ["close"]),
                     sql_full=sql)


def _body():
    return F.abs(F.col("close") - F.col("open"))


def _color():
    return F.when(F.col("close") >= F.col("open"), 1.0).otherwise(-1.0)


_S_BODY = "abs(close - open)"
_S_COLOR = "CASE WHEN close >= open THEN 1.0 ELSE -1.0 END"


def cdl_engulfing():
    """Engulfing: current body engulfs the previous opposite-color body;
    +-100 by direction (TA-Lib CDL_ENGULFING semantics)."""
    out = "CDL_ENGULFING"
    po, pc = shift("open", 1), shift("close", 1)
    bull = (pc < po) & (F.col("close") > F.col("open")) & \
        (F.col("open") <= pc) & (F.col("close") >= po)
    bear = (pc > po) & (F.col("close") < F.col("open")) & \
        (F.col("open") >= pc) & (F.col("close") <= po)
    e = F.when(bull, 100.0).when(bear, -100.0).otherwise(0.0)
    spo, spc = sql_shift("open", 1), sql_shift("close", 1)
    s_bull = (f"(({spc}) < ({spo}) AND close > open"
              f" AND open <= ({spc}) AND close >= ({spo}))")
    s_bear = (f"(({spc}) > ({spo}) AND close < open"
              f" AND open >= ({spc}) AND close <= ({spo}))")
    s = (f"CASE WHEN coalesce({s_bull}, false) THEN 100.0"
         f" WHEN coalesce({s_bear}, false) THEN -100.0 ELSE 0.0 END")
    return Indicator("cdl_engulfing", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_harami():
    """Harami: current body inside the previous opposite-color body."""
    out = "CDL_HARAMI"
    po, pc = shift("open", 1), shift("close", 1)
    bull = (pc < po) & (F.col("close") > F.col("open")) & \
        (F.col("open") > pc) & (F.col("close") < po)
    bear = (pc > po) & (F.col("close") < F.col("open")) & \
        (F.col("open") < pc) & (F.col("close") > po)
    e = F.when(bull, 100.0).when(bear, -100.0).otherwise(0.0)
    spo, spc = sql_shift("open", 1), sql_shift("close", 1)
    s_bull = (f"(({spc}) < ({spo}) AND close > open"
              f" AND open > ({spc}) AND close < ({spo}))")
    s_bear = (f"(({spc}) > ({spo}) AND close < open"
              f" AND open < ({spc}) AND close > ({spo}))")
    s = (f"CASE WHEN coalesce({s_bull}, false) THEN 100.0"
         f" WHEN coalesce({s_bear}, false) THEN -100.0 ELSE 0.0 END")
    return Indicator("cdl_harami", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_hammer():
    """Hammer: long lower shadow (>= 2x body), tiny upper shadow."""
    out = "CDL_HAMMER"
    body = _body()
    lower = F.least(F.col("open"), F.col("close")) - F.col("low")
    upper = F.col("high") - F.greatest(F.col("open"), F.col("close"))
    e = F.when((body > 0) & (lower >= 2 * body) & (upper <= body), 100.0).otherwise(0.0)
    s_low = "(least(open, close) - low)"
    s_up = "(high - greatest(open, close))"
    s = (f"CASE WHEN {_S_BODY} > 0 AND {s_low} >= 2 * {_S_BODY}"
         f" AND {s_up} <= {_S_BODY} THEN 100.0 ELSE 0.0 END")
    return Indicator("cdl_hammer", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_shooting_star():
    """Shooting star: long upper shadow (>= 2x body), tiny lower shadow."""
    out = "CDL_SHOOTINGSTAR"
    body = _body()
    lower = F.least(F.col("open"), F.col("close")) - F.col("low")
    upper = F.col("high") - F.greatest(F.col("open"), F.col("close"))
    e = F.when((body > 0) & (upper >= 2 * body) & (lower <= body), -100.0).otherwise(0.0)
    s_low = "(least(open, close) - low)"
    s_up = "(high - greatest(open, close))"
    s = (f"CASE WHEN {_S_BODY} > 0 AND {s_up} >= 2 * {_S_BODY}"
         f" AND {s_low} <= {_S_BODY} THEN -100.0 ELSE 0.0 END")
    return Indicator("cdl_shooting_star", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_marubozu(factor: float = 0.95):
    """Marubozu: body >= factor of full range, signed by color."""
    out = "CDL_MARUBOZU"
    rng = F.col("high") - F.col("low")
    e = F.when((rng > 0) & (_body() >= factor * rng), 100.0 * _color()).otherwise(0.0)
    s = (f"CASE WHEN (high - low) > 0 AND {_S_BODY} >= {factor!r} * (high - low)"
         f" THEN 100.0 * ({_S_COLOR}) ELSE 0.0 END")
    return Indicator("cdl_marubozu", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_piercing():
    """Piercing line: red candle, then a green that opens below its close
    and closes above its body midpoint (but below its open)."""
    out = "CDL_PIERCING"
    po, pc = shift("open", 1), shift("close", 1)
    mid = (po + pc) / 2
    bull = (pc < po) & (F.col("close") > F.col("open")) & \
        (F.col("open") < pc) & (F.col("close") > mid) & (F.col("close") < po)
    e = F.when(bull, 100.0).otherwise(0.0)
    spo, spc = sql_shift("open", 1), sql_shift("close", 1)
    s_mid = f"((({spo}) + ({spc})) / 2)"
    s_bull = (f"(({spc}) < ({spo}) AND close > open AND open < ({spc})"
              f" AND close > {s_mid} AND close < ({spo}))")
    s = f"CASE WHEN coalesce({s_bull}, false) THEN 100.0 ELSE 0.0 END"
    return Indicator("cdl_piercing", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_dark_cloud_cover():
    """Dark cloud cover: the bearish mirror of the piercing line."""
    out = "CDL_DARKCLOUDCOVER"
    po, pc = shift("open", 1), shift("close", 1)
    mid = (po + pc) / 2
    bear = (pc > po) & (F.col("close") < F.col("open")) & \
        (F.col("open") > pc) & (F.col("close") < mid) & (F.col("close") > po)
    e = F.when(bear, -100.0).otherwise(0.0)
    spo, spc = sql_shift("open", 1), sql_shift("close", 1)
    s_mid = f"((({spo}) + ({spc})) / 2)"
    s_bear = (f"(({spc}) > ({spo}) AND close < open AND open > ({spc})"
              f" AND close < {s_mid} AND close > ({spo}))")
    s = f"CASE WHEN coalesce({s_bear}, false) THEN -100.0 ELSE 0.0 END"
    return Indicator("cdl_dark_cloud_cover", [out], CAT,
                     final={out: e}, sql_final={out: s})


def _three_in_a_row(bullish: bool):
    kind = "CDL_3WHITESOLDIERS" if bullish else "CDL_3BLACKCROWS"
    sign = 100.0 if bullish else -100.0

    def green(o, c):
        return (c > o) if bullish else (c < o)

    o0, c0 = F.col("open"), F.col("close")
    o1, c1 = shift("open", 1), shift("close", 1)
    o2, c2 = shift("open", 2), shift("close", 2)
    stair = (c0 > c1) & (c1 > c2) if bullish else (c0 < c1) & (c1 < c2)
    inside = (
        (o0 > F.least(o1, c1)) & (o0 < F.greatest(o1, c1))
        & (o1 > F.least(o2, c2)) & (o1 < F.greatest(o2, c2))
    )
    cond = green(o0, c0) & green(o1, c1) & green(o2, c2) & stair & inside
    e = F.when(cond, F.lit(sign)).otherwise(0.0)
    so1, sc1 = sql_shift("open", 1), sql_shift("close", 1)
    so2, sc2 = sql_shift("open", 2), sql_shift("close", 2)
    op = ">" if bullish else "<"
    s_green = (f"(close {op} open AND ({sc1}) {op} ({so1})"
               f" AND ({sc2}) {op} ({so2}))")
    s_stair = f"(close {op} ({sc1}) AND ({sc1}) {op} ({sc2}))"
    s_inside = (
        f"(open > least(({so1}), ({sc1})) AND open < greatest(({so1}), ({sc1}))"
        f" AND ({so1}) > least(({so2}), ({sc2}))"
        f" AND ({so1}) < greatest(({so2}), ({sc2})))"
    )
    s = (f"CASE WHEN coalesce({s_green} AND {s_stair} AND {s_inside}, false)"
         f" THEN {sign!r} ELSE 0.0 END")
    return Indicator(kind.lower(), [kind], CAT, final={kind: e}, sql_final={kind: s})


def cdl_3whitesoldiers():
    return _three_in_a_row(True)


def cdl_3blackcrows():
    return _three_in_a_row(False)


def _star(bullish: bool):
    """Morning/evening star: big candle against the trend, a small-body
    star gapping past its close, then a reversal candle closing beyond the
    first body's midpoint (TA-Lib CDL_MORNINGSTAR/CDL_EVENINGSTAR shape,
    body-gap variant)."""
    kind = "CDL_MORNINGSTAR" if bullish else "CDL_EVENINGSTAR"
    sign = 100.0 if bullish else -100.0
    o0, c0 = F.col("open"), F.col("close")
    o1, c1 = shift("open", 1), shift("close", 1)
    o2, c2 = shift("open", 2), shift("close", 2)
    mid2 = (o2 + c2) / 2
    if bullish:
        cond = (c2 < o2) & (F.greatest(o1, c1) < c2) & (c0 > o0) & (c0 > mid2)
    else:
        cond = (c2 > o2) & (F.least(o1, c1) > c2) & (c0 < o0) & (c0 < mid2)
    e = F.when(cond, F.lit(sign)).otherwise(0.0)
    so1, sc1 = sql_shift("open", 1), sql_shift("close", 1)
    so2, sc2 = sql_shift("open", 2), sql_shift("close", 2)
    s_mid2 = f"((({so2}) + ({sc2})) / 2)"
    if bullish:
        s_cond = (f"(({sc2}) < ({so2}) AND greatest(({so1}), ({sc1})) < ({sc2})"
                  f" AND close > open AND close > {s_mid2})")
    else:
        s_cond = (f"(({sc2}) > ({so2}) AND least(({so1}), ({sc1})) > ({sc2})"
                  f" AND close < open AND close < {s_mid2})")
    s = f"CASE WHEN coalesce({s_cond}, false) THEN {sign!r} ELSE 0.0 END"
    return Indicator(kind.lower(), [kind], CAT, final={kind: e}, sql_final={kind: s})


def cdl_morning_star():
    return _star(True)


def cdl_evening_star():
    return _star(False)


def cdl_hanging_man():
    """Hanging man: hammer shape (long lower shadow) appearing after a
    green candle — bearish reversal context proxy."""
    out = "CDL_HANGINGMAN"
    body = _body()
    lower = F.least(F.col("open"), F.col("close")) - F.col("low")
    upper = F.col("high") - F.greatest(F.col("open"), F.col("close"))
    prev_green = shift("close", 1) > shift("open", 1)
    e = F.when((body > 0) & (lower >= 2 * body) & (upper <= body) & prev_green,
               -100.0).otherwise(0.0)
    s_low = "(least(open, close) - low)"
    s_up = "(high - greatest(open, close))"
    s_prev = f"(({sql_shift('close', 1)}) > ({sql_shift('open', 1)}))"
    s = (f"CASE WHEN coalesce({_S_BODY} > 0 AND {s_low} >= 2 * {_S_BODY}"
         f" AND {s_up} <= {_S_BODY} AND {s_prev}, false)"
         f" THEN -100.0 ELSE 0.0 END")
    return Indicator("cdl_hanging_man", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_inverted_hammer():
    """Inverted hammer: shooting-star shape after a red candle — bullish
    reversal context proxy."""
    out = "CDL_INVERTEDHAMMER"
    body = _body()
    lower = F.least(F.col("open"), F.col("close")) - F.col("low")
    upper = F.col("high") - F.greatest(F.col("open"), F.col("close"))
    prev_red = shift("close", 1) < shift("open", 1)
    e = F.when((body > 0) & (upper >= 2 * body) & (lower <= body) & prev_red,
               100.0).otherwise(0.0)
    s_low = "(least(open, close) - low)"
    s_up = "(high - greatest(open, close))"
    s_prev = f"(({sql_shift('close', 1)}) < ({sql_shift('open', 1)}))"
    s = (f"CASE WHEN coalesce({_S_BODY} > 0 AND {s_up} >= 2 * {_S_BODY}"
         f" AND {s_low} <= {_S_BODY} AND {s_prev}, false)"
         f" THEN 100.0 ELSE 0.0 END")
    return Indicator("cdl_inverted_hammer", [out], CAT, final={out: e}, sql_final={out: s})


def _long_legged_doji(bullish: bool, body_pct: float = 0.05,
                      shadow_pct: float = 0.6, tiny_pct: float = 0.1):
    """Dragonfly (open=close=high, long lower shadow) / gravestone
    (open=close=low, long upper shadow) doji, range-relative thresholds."""
    kind = "CDL_DRAGONFLYDOJI" if bullish else "CDL_GRAVESTONEDOJI"
    sign = 100.0 if bullish else -100.0
    rng = F.col("high") - F.col("low")
    body = _body()
    lower = F.least(F.col("open"), F.col("close")) - F.col("low")
    upper = F.col("high") - F.greatest(F.col("open"), F.col("close"))
    big, small = (lower, upper) if bullish else (upper, lower)
    cond = ((rng > 0) & (body <= body_pct * rng)
            & (small <= tiny_pct * rng) & (big >= shadow_pct * rng))
    e = F.when(cond, F.lit(sign)).otherwise(0.0)
    s_low = "(least(open, close) - low)"
    s_up = "(high - greatest(open, close))"
    s_big, s_small = (s_low, s_up) if bullish else (s_up, s_low)
    s_cond = (f"((high - low) > 0 AND {_S_BODY} <= {body_pct!r} * (high - low)"
              f" AND {s_small} <= {tiny_pct!r} * (high - low)"
              f" AND {s_big} >= {shadow_pct!r} * (high - low))")
    s = f"CASE WHEN {s_cond} THEN {sign!r} ELSE 0.0 END"
    return Indicator(kind.lower(), [kind], CAT, final={kind: e}, sql_final={kind: s})


def cdl_dragonfly_doji():
    return _long_legged_doji(True)


def cdl_gravestone_doji():
    return _long_legged_doji(False)


def _tweezers(bottom: bool, tol_pct: float = 0.1):
    """Tweezers top/bottom: two opposite-color candles with matching
    highs (top) or lows (bottom), tolerance relative to the prior range."""
    kind = "CDL_TWEEZERSBOTTOM" if bottom else "CDL_TWEEZERSTOP"
    sign = 100.0 if bottom else -100.0
    ext, s_ext = ("low", "low") if bottom else ("high", "high")
    e0, e1 = F.col(ext), shift(ext, 1)
    prev_rng = shift("high", 1) - shift("low", 1)
    o0, c0 = F.col("open"), F.col("close")
    o1, c1 = shift("open", 1), shift("close", 1)
    colors = ((c1 < o1) & (c0 > o0)) if bottom else ((c1 > o1) & (c0 < o0))
    cond = (prev_rng > 0) & (F.abs(e0 - e1) <= tol_pct * prev_rng) & colors
    e = F.when(cond, F.lit(sign)).otherwise(0.0)
    se1 = sql_shift(s_ext, 1)
    s_rng = f"(({sql_shift('high', 1)}) - ({sql_shift('low', 1)}))"
    so1, sc1 = sql_shift("open", 1), sql_shift("close", 1)
    s_colors = (f"(({sc1}) < ({so1}) AND close > open)" if bottom
                else f"(({sc1}) > ({so1}) AND close < open)")
    s_cond = (f"({s_rng} > 0 AND abs({s_ext} - ({se1})) <= {tol_pct!r} * {s_rng}"
              f" AND {s_colors})")
    s = f"CASE WHEN coalesce({s_cond}, false) THEN {sign!r} ELSE 0.0 END"
    return Indicator(kind.lower(), [kind], CAT, final={kind: e}, sql_final={kind: s})


def cdl_tweezers_top():
    return _tweezers(False)


def cdl_tweezers_bottom():
    return _tweezers(True)


def _three_inside(up: bool):
    """3-inside-up/down: harami (small t-1 body inside the big t-2 body,
    opposite colors) confirmed by t closing beyond the t-2 open."""
    kind = "CDL_3INSIDEUP" if up else "CDL_3INSIDEDOWN"
    sign = 100.0 if up else -100.0
    o0, c0 = F.col("open"), F.col("close")
    o1, c1 = shift("open", 1), shift("close", 1)
    o2, c2 = shift("open", 2), shift("close", 2)
    if up:
        harami = (c2 < o2) & (c1 > o1) & (o1 > c2) & (c1 < o2)
        confirm = (c0 > o0) & (c0 > o2)
    else:
        harami = (c2 > o2) & (c1 < o1) & (o1 < c2) & (c1 > o2)
        confirm = (c0 < o0) & (c0 < o2)
    e = F.when(harami & confirm, F.lit(sign)).otherwise(0.0)
    so1, sc1 = sql_shift("open", 1), sql_shift("close", 1)
    so2, sc2 = sql_shift("open", 2), sql_shift("close", 2)
    if up:
        s_cond = (f"(({sc2}) < ({so2}) AND ({sc1}) > ({so1})"
                  f" AND ({so1}) > ({sc2}) AND ({sc1}) < ({so2})"
                  f" AND close > open AND close > ({so2}))")
    else:
        s_cond = (f"(({sc2}) > ({so2}) AND ({sc1}) < ({so1})"
                  f" AND ({so1}) < ({sc2}) AND ({sc1}) > ({so2})"
                  f" AND close < open AND close < ({so2}))")
    s = f"CASE WHEN coalesce({s_cond}, false) THEN {sign!r} ELSE 0.0 END"
    return Indicator(kind.lower(), [kind], CAT, final={kind: e}, sql_final={kind: s})


def cdl_3inside_up():
    return _three_inside(True)


def cdl_3inside_down():
    return _three_inside(False)


_S_RNG = "(high - low)"
_S_LOWER = "(least(open, close) - low)"
_S_UPPER = "(high - greatest(open, close))"


def _rng():
    return F.col("high") - F.col("low")


def _lower():
    return F.least(F.col("open"), F.col("close")) - F.col("low")


def _upper():
    return F.col("high") - F.greatest(F.col("open"), F.col("close"))


def cdl_spinning_top():
    """Spinning top: small body, both shadows longer than the body,
    signed by color (TA-Lib CDL_SPINNINGTOP shape)."""
    out = "CDL_SPINNINGTOP"
    body = _body()
    cond = (body > 0) & (_upper() > body) & (_lower() > body)
    e = F.when(cond, 100.0 * _color()).otherwise(0.0)
    s = (f"CASE WHEN {_S_BODY} > 0 AND {_S_UPPER} > {_S_BODY}"
         f" AND {_S_LOWER} > {_S_BODY}"
         f" THEN 100.0 * ({_S_COLOR}) ELSE 0.0 END")
    return Indicator("cdl_spinning_top", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_highwave():
    """High wave: tiny body (<=10% of range) with both shadows >=30% of
    range — indecision, signed by color."""
    out = "CDL_HIGHWAVE"
    rng = _rng()
    cond = ((rng > 0) & (_body() <= 0.1 * rng)
            & (_upper() >= 0.3 * rng) & (_lower() >= 0.3 * rng))
    e = F.when(cond, 100.0 * _color()).otherwise(0.0)
    s = (f"CASE WHEN {_S_RNG} > 0 AND {_S_BODY} <= 0.1 * {_S_RNG}"
         f" AND {_S_UPPER} >= 0.3 * {_S_RNG} AND {_S_LOWER} >= 0.3 * {_S_RNG}"
         f" THEN 100.0 * ({_S_COLOR}) ELSE 0.0 END")
    return Indicator("cdl_highwave", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_longleggeddoji():
    """Long-legged doji: doji body (<=5% of range), both shadows >=30%
    of range; unsigned 100."""
    out = "CDL_LONGLEGGEDDOJI"
    rng = _rng()
    cond = ((rng > 0) & (_body() <= 0.05 * rng)
            & (_upper() >= 0.3 * rng) & (_lower() >= 0.3 * rng))
    e = F.when(cond, 100.0).otherwise(0.0)
    s = (f"CASE WHEN {_S_RNG} > 0 AND {_S_BODY} <= 0.05 * {_S_RNG}"
         f" AND {_S_UPPER} >= 0.3 * {_S_RNG} AND {_S_LOWER} >= 0.3 * {_S_RNG}"
         f" THEN 100.0 ELSE 0.0 END")
    return Indicator("cdl_longleggeddoji", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_rickshawman():
    """Rickshaw man: long-legged doji whose body midpoint sits near the
    middle of the range (within 10%)."""
    out = "CDL_RICKSHAWMAN"
    rng = _rng()
    mid_off = F.abs((F.col("open") + F.col("close")) / 2
                    - (F.col("high") + F.col("low")) / 2)
    cond = ((rng > 0) & (_body() <= 0.05 * rng)
            & (_upper() >= 0.3 * rng) & (_lower() >= 0.3 * rng)
            & (mid_off <= 0.1 * rng))
    e = F.when(cond, 100.0).otherwise(0.0)
    s_mid = "abs((open + close) / 2 - (high + low) / 2)"
    s = (f"CASE WHEN {_S_RNG} > 0 AND {_S_BODY} <= 0.05 * {_S_RNG}"
         f" AND {_S_UPPER} >= 0.3 * {_S_RNG} AND {_S_LOWER} >= 0.3 * {_S_RNG}"
         f" AND {s_mid} <= 0.1 * {_S_RNG} THEN 100.0 ELSE 0.0 END")
    return Indicator("cdl_rickshawman", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_takuri():
    """Takuri: dragonfly doji with an exceptionally long lower shadow
    (>=80% of range)."""
    out = "CDL_TAKURI"
    rng = _rng()
    cond = ((rng > 0) & (_body() <= 0.05 * rng)
            & (_upper() <= 0.1 * rng) & (_lower() >= 0.8 * rng))
    e = F.when(cond, 100.0).otherwise(0.0)
    s = (f"CASE WHEN {_S_RNG} > 0 AND {_S_BODY} <= 0.05 * {_S_RNG}"
         f" AND {_S_UPPER} <= 0.1 * {_S_RNG} AND {_S_LOWER} >= 0.8 * {_S_RNG}"
         f" THEN 100.0 ELSE 0.0 END")
    return Indicator("cdl_takuri", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_belthold():
    """Belt hold: long body (>=50% of range) opening at its extreme —
    green with no lower shadow (+100) or red with no upper shadow (-100),
    shadow tolerance 5% of range."""
    out = "CDL_BELTHOLD"
    rng = _rng()
    body = _body()
    long_body = (rng > 0) & (body >= 0.5 * rng)
    bull = long_body & (F.col("close") > F.col("open")) & (_lower() <= 0.05 * rng)
    bear = long_body & (F.col("close") < F.col("open")) & (_upper() <= 0.05 * rng)
    e = F.when(bull, 100.0).when(bear, -100.0).otherwise(0.0)
    s_long = f"({_S_RNG} > 0 AND {_S_BODY} >= 0.5 * {_S_RNG})"
    s = (f"CASE WHEN {s_long} AND close > open AND {_S_LOWER} <= 0.05 * {_S_RNG}"
         f" THEN 100.0"
         f" WHEN {s_long} AND close < open AND {_S_UPPER} <= 0.05 * {_S_RNG}"
         f" THEN -100.0 ELSE 0.0 END")
    return Indicator("cdl_belthold", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_closing_marubozu():
    """Closing marubozu: long body (>=50% of range) with no shadow on the
    closing side (5% tolerance), signed by color."""
    out = "CDL_CLOSINGMARUBOZU"
    rng = _rng()
    long_body = (rng > 0) & (_body() >= 0.5 * rng)
    bull = long_body & (F.col("close") > F.col("open")) & (_upper() <= 0.05 * rng)
    bear = long_body & (F.col("close") < F.col("open")) & (_lower() <= 0.05 * rng)
    e = F.when(bull, 100.0).when(bear, -100.0).otherwise(0.0)
    s_long = f"({_S_RNG} > 0 AND {_S_BODY} >= 0.5 * {_S_RNG})"
    s = (f"CASE WHEN {s_long} AND close > open AND {_S_UPPER} <= 0.05 * {_S_RNG}"
         f" THEN 100.0"
         f" WHEN {s_long} AND close < open AND {_S_LOWER} <= 0.05 * {_S_RNG}"
         f" THEN -100.0 ELSE 0.0 END")
    return Indicator("cdl_closing_marubozu", [out], CAT,
                     final={out: e}, sql_final={out: s})


def cdl_counterattack(tol_pct: float = 0.1):
    """Counterattack: opposite-color candles with (near-)equal closes,
    tolerance relative to the prior range."""
    out = "CDL_COUNTERATTACK"
    po, pc = shift("open", 1), shift("close", 1)
    prev_rng = shift("high", 1) - shift("low", 1)
    near = (prev_rng > 0) & (F.abs(F.col("close") - pc) <= tol_pct * prev_rng)
    bull = near & (pc < po) & (F.col("close") > F.col("open"))
    bear = near & (pc > po) & (F.col("close") < F.col("open"))
    e = F.when(bull, 100.0).when(bear, -100.0).otherwise(0.0)
    spo, spc = sql_shift("open", 1), sql_shift("close", 1)
    s_rng = f"(({sql_shift('high', 1)}) - ({sql_shift('low', 1)}))"
    s_near = f"({s_rng} > 0 AND abs(close - ({spc})) <= {tol_pct!r} * {s_rng})"
    s = (f"CASE WHEN coalesce({s_near} AND ({spc}) < ({spo}) AND close > open,"
         f" false) THEN 100.0"
         f" WHEN coalesce({s_near} AND ({spc}) > ({spo}) AND close < open,"
         f" false) THEN -100.0 ELSE 0.0 END")
    return Indicator("cdl_counterattack", [out], CAT,
                     final={out: e}, sql_final={out: s})


def cdl_homing_pigeon():
    """Homing pigeon: two red candles, the second body inside the first
    body — bullish 100."""
    out = "CDL_HOMINGPIGEON"
    po, pc = shift("open", 1), shift("close", 1)
    cond = ((pc < po) & (F.col("close") < F.col("open"))
            & (F.col("open") <= po) & (F.col("close") >= pc))
    e = F.when(cond, 100.0).otherwise(0.0)
    spo, spc = sql_shift("open", 1), sql_shift("close", 1)
    s_cond = (f"(({spc}) < ({spo}) AND close < open"
              f" AND open <= ({spo}) AND close >= ({spc}))")
    s = f"CASE WHEN coalesce({s_cond}, false) THEN 100.0 ELSE 0.0 END"
    return Indicator("cdl_homing_pigeon", [out], CAT,
                     final={out: e}, sql_final={out: s})


def cdl_matching_low(tol_pct: float = 0.05):
    """Matching low: two red candles closing at (near-)equal lows —
    support, bullish 100."""
    out = "CDL_MATCHINGLOW"
    po, pc = shift("open", 1), shift("close", 1)
    prev_rng = shift("high", 1) - shift("low", 1)
    cond = ((pc < po) & (F.col("close") < F.col("open")) & (prev_rng > 0)
            & (F.abs(F.col("close") - pc) <= tol_pct * prev_rng))
    e = F.when(cond, 100.0).otherwise(0.0)
    spo, spc = sql_shift("open", 1), sql_shift("close", 1)
    s_rng = f"(({sql_shift('high', 1)}) - ({sql_shift('low', 1)}))"
    s_cond = (f"(({spc}) < ({spo}) AND close < open AND {s_rng} > 0"
              f" AND abs(close - ({spc})) <= {tol_pct!r} * {s_rng})")
    s = f"CASE WHEN coalesce({s_cond}, false) THEN 100.0 ELSE 0.0 END"
    return Indicator("cdl_matching_low", [out], CAT,
                     final={out: e}, sql_final={out: s})


def cdl_stick_sandwich(tol_pct: float = 0.1):
    """Stick sandwich: red, green trading above, red closing back at the
    first red close (tolerance vs the t-2 range) — bullish 100."""
    out = "CDL_STICKSANDWICH"
    o1, c1 = shift("open", 1), shift("close", 1)
    o2, c2 = shift("open", 2), shift("close", 2)
    rng2 = shift("high", 2) - shift("low", 2)
    cond = ((c2 < o2) & (c1 > o1) & (c1 > c2)
            & (F.col("close") < F.col("open")) & (rng2 > 0)
            & (F.abs(F.col("close") - c2) <= tol_pct * rng2))
    e = F.when(cond, 100.0).otherwise(0.0)
    so1, sc1 = sql_shift("open", 1), sql_shift("close", 1)
    so2, sc2 = sql_shift("open", 2), sql_shift("close", 2)
    s_rng2 = f"(({sql_shift('high', 2)}) - ({sql_shift('low', 2)}))"
    s_cond = (f"(({sc2}) < ({so2}) AND ({sc1}) > ({so1}) AND ({sc1}) > ({sc2})"
              f" AND close < open AND {s_rng2} > 0"
              f" AND abs(close - ({sc2})) <= {tol_pct!r} * {s_rng2})")
    s = f"CASE WHEN coalesce({s_cond}, false) THEN 100.0 ELSE 0.0 END"
    return Indicator("cdl_stick_sandwich", [out], CAT,
                     final={out: e}, sql_final={out: s})


def _three_outside(up: bool):
    """3-outside-up/down: engulfing at t-1 confirmed by t closing beyond
    the t-1 close."""
    kind = "CDL_3OUTSIDEUP" if up else "CDL_3OUTSIDEDOWN"
    sign = 100.0 if up else -100.0
    c0 = F.col("close")
    o1, c1 = shift("open", 1), shift("close", 1)
    o2, c2 = shift("open", 2), shift("close", 2)
    if up:
        engulf = (c2 < o2) & (c1 > o1) & (o1 <= c2) & (c1 >= o2)
        confirm = c0 > c1
    else:
        engulf = (c2 > o2) & (c1 < o1) & (o1 >= c2) & (c1 <= o2)
        confirm = c0 < c1
    e = F.when(engulf & confirm, F.lit(sign)).otherwise(0.0)
    so1, sc1 = sql_shift("open", 1), sql_shift("close", 1)
    so2, sc2 = sql_shift("open", 2), sql_shift("close", 2)
    if up:
        s_cond = (f"(({sc2}) < ({so2}) AND ({sc1}) > ({so1})"
                  f" AND ({so1}) <= ({sc2}) AND ({sc1}) >= ({so2})"
                  f" AND close > ({sc1}))")
    else:
        s_cond = (f"(({sc2}) > ({so2}) AND ({sc1}) < ({so1})"
                  f" AND ({so1}) >= ({sc2}) AND ({sc1}) <= ({so2})"
                  f" AND close < ({sc1}))")
    s = f"CASE WHEN coalesce({s_cond}, false) THEN {sign!r} ELSE 0.0 END"
    return Indicator(kind.lower(), [kind], CAT, final={kind: e}, sql_final={kind: s})


def cdl_3outside_up():
    return _three_outside(True)


def cdl_3outside_down():
    return _three_outside(False)


def cdl_kicking(factor: float = 0.95):
    """Kicking: opposite-color marubozus separated by a full gap —
    +100 when the white marubozu gaps above the black, -100 mirrored."""
    out = "CDL_KICKING"
    rng = _rng()
    rng1 = shift("high", 1) - shift("low", 1)
    body1 = F.abs(shift("close", 1) - shift("open", 1))
    maru0 = (rng > 0) & (_body() >= factor * rng)
    maru1 = (rng1 > 0) & (body1 >= factor * rng1)
    green0 = F.col("close") > F.col("open")
    red1 = shift("close", 1) < shift("open", 1)
    bull = maru0 & maru1 & green0 & red1 & (F.col("low") > shift("high", 1))
    bear = (maru0 & maru1 & ~green0 & ~red1
            & (F.col("high") < shift("low", 1)))
    e = F.when(bull, 100.0).when(bear, -100.0).otherwise(0.0)
    sh1, sl1 = sql_shift("high", 1), sql_shift("low", 1)
    so1, sc1 = sql_shift("open", 1), sql_shift("close", 1)
    s_rng1 = f"(({sh1}) - ({sl1}))"
    s_body1 = f"abs(({sc1}) - ({so1}))"
    s_maru0 = f"({_S_RNG} > 0 AND {_S_BODY} >= {factor!r} * {_S_RNG})"
    s_maru1 = f"({s_rng1} > 0 AND {s_body1} >= {factor!r} * {s_rng1})"
    s = (f"CASE WHEN coalesce({s_maru0} AND {s_maru1} AND close > open"
         f" AND ({sc1}) < ({so1}) AND low > ({sh1}), false) THEN 100.0"
         f" WHEN coalesce({s_maru0} AND {s_maru1} AND close <= open"
         f" AND ({sc1}) >= ({so1}) AND high < ({sl1}), false) THEN -100.0"
         f" ELSE 0.0 END")
    return Indicator("cdl_kicking", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_separating_lines(tol_pct: float = 0.05):
    """Separating lines: opposite-color candle pair sharing the open
    (tolerance vs the prior range); the second continues the trend its
    color implies."""
    out = "CDL_SEPARATINGLINES"
    po, pc = shift("open", 1), shift("close", 1)
    prev_rng = shift("high", 1) - shift("low", 1)
    same_open = (prev_rng > 0) & (F.abs(F.col("open") - po) <= tol_pct * prev_rng)
    bull = same_open & (pc < po) & (F.col("close") > F.col("open"))
    bear = same_open & (pc > po) & (F.col("close") < F.col("open"))
    e = F.when(bull, 100.0).when(bear, -100.0).otherwise(0.0)
    spo, spc = sql_shift("open", 1), sql_shift("close", 1)
    s_rng = f"(({sql_shift('high', 1)}) - ({sql_shift('low', 1)}))"
    s_open = f"({s_rng} > 0 AND abs(open - ({spo})) <= {tol_pct!r} * {s_rng})"
    s = (f"CASE WHEN coalesce({s_open} AND ({spc}) < ({spo}) AND close > open,"
         f" false) THEN 100.0"
         f" WHEN coalesce({s_open} AND ({spc}) > ({spo}) AND close < open,"
         f" false) THEN -100.0 ELSE 0.0 END")
    return Indicator("cdl_separating_lines", [out], CAT,
                     final={out: e}, sql_final={out: s})


def cdl_thrusting():
    """Thrusting: red candle, then a green opening below its close that
    closes above the prior close but under the body midpoint — bearish
    continuation -100."""
    out = "CDL_THRUSTING"
    po, pc = shift("open", 1), shift("close", 1)
    mid = (po + pc) / 2
    cond = ((pc < po) & (F.col("close") > F.col("open"))
            & (F.col("open") < pc) & (F.col("close") > pc)
            & (F.col("close") < mid))
    e = F.when(cond, -100.0).otherwise(0.0)
    spo, spc = sql_shift("open", 1), sql_shift("close", 1)
    s_mid = f"((({spo}) + ({spc})) / 2)"
    s_cond = (f"(({spc}) < ({spo}) AND close > open AND open < ({spc})"
              f" AND close > ({spc}) AND close < {s_mid})")
    s = f"CASE WHEN coalesce({s_cond}, false) THEN -100.0 ELSE 0.0 END"
    return Indicator("cdl_thrusting", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_onneck(tol_pct: float = 0.05):
    """On-neck: red candle, then a green opening below its low and
    closing back at that low (tolerance vs the prior range) — bearish
    continuation -100."""
    out = "CDL_ONNECK"
    po, pc = shift("open", 1), shift("close", 1)
    pl = shift("low", 1)
    prev_rng = shift("high", 1) - pl
    cond = ((pc < po) & (F.col("close") > F.col("open"))
            & (F.col("open") < pl) & (prev_rng > 0)
            & (F.abs(F.col("close") - pl) <= tol_pct * prev_rng))
    e = F.when(cond, -100.0).otherwise(0.0)
    spo, spc = sql_shift("open", 1), sql_shift("close", 1)
    spl = sql_shift("low", 1)
    s_rng = f"(({sql_shift('high', 1)}) - ({spl}))"
    s_cond = (f"(({spc}) < ({spo}) AND close > open AND open < ({spl})"
              f" AND {s_rng} > 0"
              f" AND abs(close - ({spl})) <= {tol_pct!r} * {s_rng})")
    s = f"CASE WHEN coalesce({s_cond}, false) THEN -100.0 ELSE 0.0 END"
    return Indicator("cdl_onneck", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_inneck(tol_pct: float = 0.1):
    """In-neck: red candle, then a green opening below its low and
    closing just inside the prior close (within tol of the prior range
    above it) — bearish continuation -100."""
    out = "CDL_INNECK"
    po, pc = shift("open", 1), shift("close", 1)
    pl = shift("low", 1)
    prev_rng = shift("high", 1) - pl
    cond = ((pc < po) & (F.col("close") > F.col("open"))
            & (F.col("open") < pl) & (prev_rng > 0)
            & (F.col("close") >= pc)
            & (F.col("close") <= pc + tol_pct * prev_rng))
    e = F.when(cond, -100.0).otherwise(0.0)
    spo, spc = sql_shift("open", 1), sql_shift("close", 1)
    spl = sql_shift("low", 1)
    s_rng = f"(({sql_shift('high', 1)}) - ({spl}))"
    s_cond = (f"(({spc}) < ({spo}) AND close > open AND open < ({spl})"
              f" AND {s_rng} > 0 AND close >= ({spc})"
              f" AND close <= ({spc}) + {tol_pct!r} * {s_rng})")
    s = f"CASE WHEN coalesce({s_cond}, false) THEN -100.0 ELSE 0.0 END"
    return Indicator("cdl_inneck", [out], CAT, final={out: e}, sql_final={out: s})


def cdl_doji_star():
    """Doji star: long candle, then a doji whose body gaps beyond the
    prior close — +100 after a red candle (gap down), -100 after a green
    (gap up)."""
    out = "CDL_DOJISTAR"
    rng = _rng()
    rng1 = shift("high", 1) - shift("low", 1)
    body1 = F.abs(shift("close", 1) - shift("open", 1))
    doji0 = (rng > 0) & (_body() <= 0.05 * rng)
    long1 = (rng1 > 0) & (body1 >= 0.5 * rng1)
    pc = shift("close", 1)
    red1 = pc < shift("open", 1)
    green1 = pc > shift("open", 1)
    bull = doji0 & long1 & red1 & (F.greatest(F.col("open"), F.col("close")) < pc)
    bear = doji0 & long1 & green1 & (F.least(F.col("open"), F.col("close")) > pc)
    e = F.when(bull, 100.0).when(bear, -100.0).otherwise(0.0)
    so1, sc1 = sql_shift("open", 1), sql_shift("close", 1)
    s_rng1 = f"(({sql_shift('high', 1)}) - ({sql_shift('low', 1)}))"
    s_body1 = f"abs(({sc1}) - ({so1}))"
    s_doji0 = f"({_S_RNG} > 0 AND {_S_BODY} <= 0.05 * {_S_RNG})"
    s_long1 = f"({s_rng1} > 0 AND {s_body1} >= 0.5 * {s_rng1})"
    s = (f"CASE WHEN coalesce({s_doji0} AND {s_long1} AND ({sc1}) < ({so1})"
         f" AND greatest(open, close) < ({sc1}), false) THEN 100.0"
         f" WHEN coalesce({s_doji0} AND {s_long1} AND ({sc1}) > ({so1})"
         f" AND least(open, close) > ({sc1}), false) THEN -100.0"
         f" ELSE 0.0 END")
    return Indicator("cdl_doji_star", [out], CAT, final={out: e}, sql_final={out: s})


# ---------------------------------------------------------------------------
# Tranche 4: paired-expression builder. Every remaining TA-Lib-inventory
# pattern is lag-window boolean logic; defining each condition ONCE as a
# (Spark Column, SQL string) pair keeps the two engines mirror-exact by
# construction instead of by hand.
# ---------------------------------------------------------------------------


class _P:
    """Paired (Spark Column, ANSI-SQL string) expression."""

    __slots__ = ("c", "s")

    def __init__(self, c, s):
        self.c, self.s = c, s

    @staticmethod
    def wrap(v):
        return v if isinstance(v, _P) else _P(F.lit(float(v)), repr(float(v)))

    def _bin(self, other, fc, op, flip: bool = False):
        o = _P.wrap(other)
        a, b = (o, self) if flip else (self, o)
        return _P(fc(a.c, b.c), f"({a.s} {op} {b.s})")

    def __add__(self, o): return self._bin(o, lambda a, b: a + b, "+")
    def __radd__(self, o): return self._bin(o, lambda a, b: a + b, "+", True)
    def __sub__(self, o): return self._bin(o, lambda a, b: a - b, "-")
    def __rsub__(self, o): return self._bin(o, lambda a, b: a - b, "-", True)
    def __mul__(self, o): return self._bin(o, lambda a, b: a * b, "*")
    def __rmul__(self, o): return self._bin(o, lambda a, b: a * b, "*", True)
    def __truediv__(self, o): return self._bin(o, lambda a, b: a / b, "/")
    def __lt__(self, o): return self._bin(o, lambda a, b: a < b, "<")
    def __le__(self, o): return self._bin(o, lambda a, b: a <= b, "<=")
    def __gt__(self, o): return self._bin(o, lambda a, b: a > b, ">")
    def __ge__(self, o): return self._bin(o, lambda a, b: a >= b, ">=")
    def __and__(self, o): return self._bin(o, lambda a, b: a & b, "AND")
    def __or__(self, o): return self._bin(o, lambda a, b: a | b, "OR")

    def __invert__(self):
        return _P(~self.c, f"(NOT {self.s})")


def _pc(col: str, k: int = 0) -> _P:
    if k == 0:
        return _P(F.col(col), col)
    return _P(shift(col, k), f"({sql_shift(col, k)})")


def _pabs(p: _P) -> _P:
    return _P(F.abs(p.c), f"abs({p.s})")


def _pleast(*ps: _P) -> _P:
    return _P(F.least(*[p.c for p in ps]),
              f"least({', '.join(p.s for p in ps)})")


def _pgreatest(*ps: _P) -> _P:
    return _P(F.greatest(*[p.c for p in ps]),
              f"greatest({', '.join(p.s for p in ps)})")


class _Bar:
    """Candle anatomy at lag ``k`` as paired expressions."""

    def __init__(self, k: int = 0):
        self.o = _pc("open", k)
        self.h = _pc("high", k)
        self.l = _pc("low", k)
        self.c = _pc("close", k)

    @property
    def body(self): return _pabs(self.c - self.o)

    @property
    def rng(self): return self.h - self.l

    @property
    def green(self): return self.c > self.o

    @property
    def red(self): return self.c < self.o

    @property
    def top(self): return _pgreatest(self.o, self.c)

    @property
    def bot(self): return _pleast(self.o, self.c)

    @property
    def upsh(self): return self.h - self.top

    @property
    def losh(self): return self.bot - self.l

    @property
    def mid(self): return 0.5 * (self.o + self.c)

    def doji(self, pct: float = 0.05):
        return (self.rng > 0) & (self.body <= pct * self.rng)

    def marubozu(self, factor: float = 0.95):
        return (self.rng > 0) & (self.body >= factor * self.rng)

    def long_body(self, factor: float = 0.5):
        return (self.rng > 0) & (self.body >= factor * self.rng)


def _signed(name_: str, out: str, bull: _P | None = None,
            bear: _P | None = None, stages=None, sql_stages=None):
    """Emit a +-100/0 pattern Indicator from paired conditions."""
    e = F.lit(0.0)
    parts = []
    if bull is not None:
        parts.append(f"WHEN coalesce({bull.s}, false) THEN 100.0")
    if bear is not None:
        parts.append(f"WHEN coalesce({bear.s}, false) THEN -100.0")
    s = "CASE " + " ".join(parts) + " ELSE 0.0 END"
    if bull is not None and bear is not None:
        e = F.when(bull.c, 100.0).when(bear.c, -100.0).otherwise(0.0)
    elif bull is not None:
        e = F.when(bull.c, 100.0).otherwise(0.0)
    elif bear is not None:
        e = F.when(bear.c, -100.0).otherwise(0.0)
    return Indicator(name_, [out], CAT, final={out: e}, sql_final={out: s},
                     stages=stages or [], sql_stages=sql_stages or [])


def cdl_2crows():
    """Two crows: long green, then a red gapping above it, then a second
    red opening inside the first red's body and closing into the green
    body (TA-Lib CDL_2CROWS shape)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    bear = (b2.green & (b2.body > 0) & b1.red & (b1.bot > b2.c)
            & b0.red & (b0.o > b1.c) & (b0.o < b1.o)
            & (b0.c < b2.c) & (b0.c > b2.o))
    return _signed("cdl_2crows", "CDL_2CROWS", bear=bear)


def cdl_tristar():
    """Tristar: three dojis; the middle one's body gaps below both
    neighbors (bull) or above both (bear) — TA-Lib CDL_TRISTAR shape."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    dojis = b0.doji() & b1.doji() & b2.doji()
    bull = dojis & (b1.top < b0.bot) & (b1.top < b2.bot)
    bear = dojis & (b1.bot > b0.top) & (b1.bot > b2.top)
    return _signed("cdl_tristar", "CDL_TRISTAR", bull=bull, bear=bear)


def cdl_harami_cross():
    """Harami cross: a doji contained inside the previous opposite-color
    body (TA-Lib CDL_HARAMICROSS shape)."""
    b0, b1 = _Bar(0), _Bar(1)
    bull = b1.red & b0.doji() & (b0.top < b1.o) & (b0.bot > b1.c)
    bear = b1.green & b0.doji() & (b0.top < b1.c) & (b0.bot > b1.o)
    return _signed("cdl_harami_cross", "CDL_HARAMICROSS", bull=bull, bear=bear)


def cdl_hikkake():
    """Hikkake: inside bar then a false breakout — breakdown below the
    inside bar flags bullish, breakup flags bearish (TA-Lib CDL_HIKKAKE
    shape; the 3-bar confirmation leg that TA-Lib appends as +-200 is
    intentionally omitted — this engine flags at the trigger bar)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    inside1 = (b1.h < b2.h) & (b1.l > b2.l)
    bull = inside1 & (b0.h < b1.h) & (b0.l < b1.l)
    bear = inside1 & (b0.h > b1.h) & (b0.l > b1.l)
    return _signed("cdl_hikkake", "CDL_HIKKAKE", bull=bull, bear=bear)


def cdl_hikkake_mod():
    """Modified hikkake: hikkake whose inside bar closes in the third of
    its range nearest the coming fake move (TA-Lib CDL_HIKKAKEMOD shape,
    same confirmation-leg omission as cdl_hikkake)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    third = 1.0 / 3.0
    inside1 = (b1.h < b2.h) & (b1.l > b2.l) & (b1.rng > 0)
    bull = (inside1 & (b0.h < b1.h) & (b0.l < b1.l)
            & (b1.c <= b1.l + third * b1.rng))
    bear = (inside1 & (b0.h > b1.h) & (b0.l > b1.l)
            & (b1.c >= b1.h - third * b1.rng))
    return _signed("cdl_hikkake_mod", "CDL_HIKKAKEMOD", bull=bull, bear=bear)


def cdl_3linestrike():
    """Three-line strike: three stacked same-color candles then an
    opposite candle engulfing all three closes back past the first open;
    sign follows the three-candle trend (TA-Lib CDL_3LINESTRIKE)."""
    b0, b1, b2, b3 = _Bar(0), _Bar(1), _Bar(2), _Bar(3)
    bull = (b3.green & b2.green & b1.green & (b1.c > b2.c) & (b2.c > b3.c)
            & b0.red & (b0.o > b1.c) & (b0.c < b3.o))
    bear = (b3.red & b2.red & b1.red & (b1.c < b2.c) & (b2.c < b3.c)
            & b0.green & (b0.o < b1.c) & (b0.c > b3.o))
    return _signed("cdl_3linestrike", "CDL_3LINESTRIKE", bull=bull, bear=bear)


def cdl_3starsinsouth():
    """Three stars in the south: shrinking red candles with drying lower
    shadows, the last inside its predecessor (TA-Lib CDL_3STARSINSOUTH
    shape; bullish only)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    bull = (b2.red & (b2.losh > b2.body)
            & b1.red & (b1.body < b2.body) & (b1.l > b2.l)
            & b0.red & (b0.body < b1.body)
            & (b0.h <= b1.h) & (b0.l >= b1.l))
    return _signed("cdl_3starsinsouth", "CDL_3STARSINSOUTH", bull=bull)


def cdl_abandonedbaby():
    """Abandoned baby: a doji whose whole RANGE gaps away from both
    neighbors, then a reversal past the first candle's midpoint
    (TA-Lib CDL_ABANDONEDBABY shape)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    bull = (b2.red & b1.doji() & (b1.h < b2.l)
            & b0.green & (b0.l > b1.h) & (b0.c > b2.mid))
    bear = (b2.green & b1.doji() & (b1.l > b2.h)
            & b0.red & (b0.h < b1.l) & (b0.c < b2.mid))
    return _signed("cdl_abandonedbaby", "CDL_ABANDONEDBABY",
                   bull=bull, bear=bear)


def cdl_advanceblock():
    """Advance block: three rising greens with shrinking bodies and a
    growing upper shadow — a stalling advance (TA-Lib CDL_ADVANCEBLOCK
    shape; bearish warning only)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    bear = (b0.green & b1.green & b2.green
            & (b0.c > b1.c) & (b1.c > b2.c)
            & (b0.o > b1.o) & (b0.o < b1.c)
            & (b1.o > b2.o) & (b1.o < b2.c)
            & (b0.body < b1.body) & (b1.body < b2.body)
            & (b0.upsh > b1.upsh))
    return _signed("cdl_advanceblock", "CDL_ADVANCEBLOCK", bear=bear)


def cdl_breakaway():
    """Breakaway: long candle, a body gap continuing the move, two drift
    bars, then a reversal closing inside the gap (TA-Lib CDL_BREAKAWAY
    shape)."""
    b0, b1, b2, b3, b4 = _Bar(0), _Bar(1), _Bar(2), _Bar(3), _Bar(4)
    bull = (b4.red & (b4.body > 0) & b3.red & (b3.top < b4.c)
            & (b2.c < b3.c) & (b1.c < b2.c)
            & b0.green & (b0.c > b3.top) & (b0.c < b4.bot))
    bear = (b4.green & (b4.body > 0) & b3.green & (b3.bot > b4.c)
            & (b2.c > b3.c) & (b1.c > b2.c)
            & b0.red & (b0.c < b3.bot) & (b0.c > b4.top))
    return _signed("cdl_breakaway", "CDL_BREAKAWAY", bull=bull, bear=bear)


def cdl_concealbabyswall():
    """Concealing baby swallow: two red marubozus, a red gapping down
    whose high pokes back into the prior body, then a red engulfing it
    entirely (TA-Lib CDL_CONCEALBABYSWALL shape; bullish only)."""
    b0, b1, b2, b3 = _Bar(0), _Bar(1), _Bar(2), _Bar(3)
    bull = (b3.red & b3.marubozu() & b2.red & b2.marubozu()
            & b1.red & (b1.top < b2.c) & (b1.h > b2.c)
            & b0.red & (b0.h > b1.h) & (b0.c < b1.l))
    return _signed("cdl_concealbabyswall", "CDL_CONCEALBABYSWALL", bull=bull)


def cdl_morning_doji_star():
    """Morning doji star: morning star whose middle candle is a doji
    (TA-Lib CDL_MORNINGDOJISTAR shape)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    bull = (b2.red & b1.doji() & (b1.top < b2.c)
            & b0.green & (b0.c > b2.mid))
    return _signed("cdl_morning_doji_star", "CDL_MORNINGDOJISTAR", bull=bull)


def cdl_evening_doji_star():
    """Evening doji star: evening star whose middle candle is a doji
    (TA-Lib CDL_EVENINGDOJISTAR shape)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    bear = (b2.green & b1.doji() & (b1.bot > b2.c)
            & b0.red & (b0.c < b2.mid))
    return _signed("cdl_evening_doji_star", "CDL_EVENINGDOJISTAR", bear=bear)


def cdl_gapsidesidewhite(tol: float = 0.5):
    """Up/down-gap side-by-side white lines: two similar green candles
    both gapping the same way from the bar before them; signed by gap
    direction (TA-Lib CDL_GAPSIDESIDEWHITE shape)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    similar = ((_pabs(b0.body - b1.body) <= tol * b1.body)
               & (_pabs(b0.o - b1.o) <= tol * b1.body))
    greens = b0.green & b1.green & (b1.body > 0)
    bull = greens & similar & (b1.bot > b2.top) & (b0.bot > b2.top)
    bear = greens & similar & (b1.top < b2.bot) & (b0.top < b2.bot)
    return _signed("cdl_gapsidesidewhite", "CDL_GAPSIDESIDEWHITE",
                   bull=bull, bear=bear)


def cdl_identical3crows(tol: float = 0.1):
    """Identical three crows: three reds, each opening at (within
    ``tol`` of range of) the prior close and closing lower
    (TA-Lib CDL_IDENTICAL3CROWS shape)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    bear = (b2.red & b1.red & b0.red
            & (b1.c < b2.c) & (b0.c < b1.c)
            & (b2.rng > 0) & (b1.rng > 0)
            & (_pabs(b1.o - b2.c) <= tol * b2.rng)
            & (_pabs(b0.o - b1.c) <= tol * b1.rng))
    return _signed("cdl_identical3crows", "CDL_IDENTICAL3CROWS", bear=bear)


def cdl_kicking_by_length(factor: float = 0.95):
    """Kicking, signed by the LONGER marubozu's direction
    (TA-Lib CDL_KICKINGBYLENGTH shape)."""
    b0, b1 = _Bar(0), _Bar(1)
    base_bull = (b0.marubozu(factor) & b1.marubozu(factor)
                 & b0.green & b1.red & (b0.l > b1.h))
    base_bear = (b0.marubozu(factor) & b1.marubozu(factor)
                 & b0.red & b1.green & (b0.h < b1.l))
    longer0 = b0.rng >= b1.rng
    bull = (base_bull & longer0) | (base_bear & ~longer0)
    bear = (base_bear & longer0) | (base_bull & ~longer0)
    return _signed("cdl_kicking_by_length", "CDL_KICKINGBYLENGTH",
                   bull=bull, bear=bear)


def cdl_ladderbottom():
    """Ladder bottom: three descending reds, a red with a real upper
    shadow, then a green opening above the prior open
    (TA-Lib CDL_LADDERBOTTOM shape; bullish only)."""
    b0, b1, b2, b3, b4 = _Bar(0), _Bar(1), _Bar(2), _Bar(3), _Bar(4)
    bull = (b4.red & b3.red & b2.red & (b3.c < b4.c) & (b2.c < b3.c)
            & b1.red & (b1.rng > 0) & (b1.upsh > 0.05 * b1.rng)
            & b0.green & (b0.o > b1.o))
    return _signed("cdl_ladderbottom", "CDL_LADDERBOTTOM", bull=bull)


def _line(long_: bool, length: int = 10):
    kind = "CDL_LONGLINE" if long_ else "CDL_SHORTLINE"
    t = "_line_body"
    avg = _P(roll(F.avg, t, length), f"({sql_roll('avg', t, length)})")
    b0 = _Bar(0)
    size = (b0.body > avg) if long_ else (b0.body < avg)
    cond = size & (b0.body > 0) & (b0.upsh < b0.body) & (b0.losh < b0.body)
    ind = _signed(kind.lower(), kind,
                  bull=cond & b0.green, bear=cond & b0.red,
                  stages=[{t: _body()}], sql_stages=[{t: _S_BODY}])
    return ind


def cdl_longline(length: int = 10):
    """Long line: body above its rolling average with both shadows
    shorter than the body; signed by color (TA-Lib CDL_LONGLINE shape)."""
    return _line(True, length)


def cdl_shortline(length: int = 10):
    """Short line: body below its rolling average with both shadows
    shorter than the body; signed by color (TA-Lib CDL_SHORTLINE shape)."""
    return _line(False, length)


def cdl_mathold():
    """Mat hold: long green, a small red gapping up, a drift holding
    above the first midpoint, then a green breaking the drift's highs
    (TA-Lib CDL_MATHOLD shape; bullish only)."""
    b0, b1, b2, b3, b4 = _Bar(0), _Bar(1), _Bar(2), _Bar(3), _Bar(4)
    bull = (b4.green & b4.long_body() & b3.red & (b3.bot > b4.c)
            & (b2.l > b4.mid) & (b1.l > b4.mid)
            & b0.green & (b0.c > _pgreatest(b3.h, b2.h, b1.h)))
    return _signed("cdl_mathold", "CDL_MATHOLD", bull=bull)


def cdl_risefall3methods():
    """Rising/falling three methods: long candle, three small
    counter-color bars held inside its range, then a continuation close
    beyond the first close (TA-Lib CDL_RISEFALL3METHODS shape)."""
    b0, b1, b2, b3, b4 = _Bar(0), _Bar(1), _Bar(2), _Bar(3), _Bar(4)

    def held(b):
        return (b.h <= b4.h) & (b.l >= b4.l)

    bull = (b4.green & b4.long_body() & b3.red & b2.red & b1.red
            & held(b3) & held(b2) & held(b1)
            & (b2.c < b3.c) & (b1.c < b2.c)
            & b0.green & (b0.c > b4.c))
    bear = (b4.red & b4.long_body() & b3.green & b2.green & b1.green
            & held(b3) & held(b2) & held(b1)
            & (b2.c > b3.c) & (b1.c > b2.c)
            & b0.red & (b0.c < b4.c))
    return _signed("cdl_risefall3methods", "CDL_RISEFALL3METHODS",
                   bull=bull, bear=bear)


def cdl_stalledpattern(tol: float = 0.2):
    """Stalled pattern (deliberation): two advancing greens then a small
    green riding the prior shoulder (TA-Lib CDL_STALLEDPATTERN shape;
    bearish warning only)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    bear = (b0.green & b1.green & b2.green
            & (b0.c > b1.c) & (b1.c > b2.c) & (b1.body > 0)
            & (b0.body < 0.5 * b1.body)
            & (_pabs(b0.o - b1.c) <= tol * b1.body))
    return _signed("cdl_stalledpattern", "CDL_STALLEDPATTERN", bear=bear)


def cdl_tasukigap():
    """Tasuki gap: a body gap in trend direction, then a counter candle
    opening inside the gapping body and closing inside the gap WITHOUT
    filling it (TA-Lib CDL_TASUKIGAP shape)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    bull = (b2.green & b1.green & (b1.bot > b2.top)
            & b0.red & (b0.o > b1.bot) & (b0.o < b1.top)
            & (b0.c < b1.bot) & (b0.c > b2.top))
    bear = (b2.red & b1.red & (b1.top < b2.bot)
            & b0.green & (b0.o < b1.top) & (b0.o > b1.bot)
            & (b0.c > b1.top) & (b0.c < b2.bot))
    return _signed("cdl_tasukigap", "CDL_TASUKIGAP", bull=bull, bear=bear)


def cdl_unique3river():
    """Unique three river: long red, a red harami making a new low, then
    a small green holding above that low (TA-Lib CDL_UNIQUE3RIVER shape;
    bullish only)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    bull = (b2.red & b2.long_body()
            & b1.red & (b1.top < b2.top) & (b1.bot > b2.bot) & (b1.l < b2.l)
            & b0.green & (b0.body < b1.body) & (b0.o > b1.l) & (b0.c < b1.c))
    return _signed("cdl_unique3river", "CDL_UNIQUE3RIVER", bull=bull)


def cdl_upsidegap2crows():
    """Upside gap two crows: long green, a red gapping above it, then a
    red engulfing that red but closing above the green close — the gap
    survives (TA-Lib CDL_UPSIDEGAP2CROWS shape; bearish only)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    bear = (b2.green & b2.long_body() & b1.red & (b1.bot > b2.c)
            & b0.red & (b0.o > b1.o) & (b0.c < b1.c) & (b0.c > b2.c))
    return _signed("cdl_upsidegap2crows", "CDL_UPSIDEGAP2CROWS", bear=bear)


def cdl_xsidegap3methods():
    """Up/downside gap three methods: a body gap in trend direction, then
    a counter candle opening inside the gapping body and closing INSIDE
    the first body — filling the gap (TA-Lib CDL_XSIDEGAP3METHODS
    shape)."""
    b0, b1, b2 = _Bar(0), _Bar(1), _Bar(2)
    bull = (b2.green & b1.green & (b1.bot > b2.top)
            & b0.red & (b0.o > b1.bot) & (b0.o < b1.top)
            & (b0.c < b2.top) & (b0.c > b2.bot))
    bear = (b2.red & b1.red & (b1.top < b2.bot)
            & b0.green & (b0.o < b1.top) & (b0.o > b1.bot)
            & (b0.c > b2.bot) & (b0.c < b2.top))
    return _signed("cdl_xsidegap3methods", "CDL_XSIDEGAP3METHODS",
                   bull=bull, bear=bear)


# native set: the reference's non-TA-Lib fallback is doji+inside
# (candles/cdl_pattern.py#ALL_PATTERNS); the rest are this engine's
# native extensions of the TA-Lib CDL_* inventory
ALL_PATTERNS = ["doji", "inside", "engulfing", "harami", "hammer",
                "shootingstar", "marubozu", "piercing", "darkcloudcover",
                "3whitesoldiers", "3blackcrows",
                "morningstar", "eveningstar", "hangingman", "invertedhammer",
                "dragonflydoji", "gravestonedoji", "tweezerstop",
                "tweezersbottom", "3insideup", "3insidedown",
                "spinningtop", "highwave", "longleggeddoji", "rickshawman",
                "takuri", "belthold", "closingmarubozu", "counterattack",
                "homingpigeon", "matchinglow", "sticksandwich",
                "3outsideup", "3outsidedown", "kicking", "separatinglines",
                "thrusting", "onneck", "inneck", "dojistar",
                "2crows", "tristar", "haramicross", "hikkake", "hikkakemod",
                "3linestrike", "3starsinsouth", "abandonedbaby",
                "advanceblock", "breakaway", "concealbabyswall",
                "morningdojistar", "eveningdojistar", "gapsidesidewhite",
                "identical3crows", "kickingbylength", "ladderbottom",
                "longline", "shortline", "mathold", "risefall3methods",
                "stalledpattern", "tasukigap", "unique3river",
                "upsidegap2crows", "xsidegap3methods"]

_PATTERN_FACTORIES = {
    "doji": cdl_doji,
    "inside": cdl_inside,
    "engulfing": cdl_engulfing,
    "harami": cdl_harami,
    "hammer": cdl_hammer,
    "shootingstar": cdl_shooting_star,
    "marubozu": cdl_marubozu,
    "piercing": cdl_piercing,
    "darkcloudcover": cdl_dark_cloud_cover,
    "3whitesoldiers": cdl_3whitesoldiers,
    "3blackcrows": cdl_3blackcrows,
    "morningstar": cdl_morning_star,
    "eveningstar": cdl_evening_star,
    "hangingman": cdl_hanging_man,
    "invertedhammer": cdl_inverted_hammer,
    "dragonflydoji": cdl_dragonfly_doji,
    "gravestonedoji": cdl_gravestone_doji,
    "tweezerstop": cdl_tweezers_top,
    "tweezersbottom": cdl_tweezers_bottom,
    "3insideup": cdl_3inside_up,
    "3insidedown": cdl_3inside_down,
    "spinningtop": cdl_spinning_top,
    "highwave": cdl_highwave,
    "longleggeddoji": cdl_longleggeddoji,
    "rickshawman": cdl_rickshawman,
    "takuri": cdl_takuri,
    "belthold": cdl_belthold,
    "closingmarubozu": cdl_closing_marubozu,
    "counterattack": cdl_counterattack,
    "homingpigeon": cdl_homing_pigeon,
    "matchinglow": cdl_matching_low,
    "sticksandwich": cdl_stick_sandwich,
    "3outsideup": cdl_3outside_up,
    "3outsidedown": cdl_3outside_down,
    "kicking": cdl_kicking,
    "separatinglines": cdl_separating_lines,
    "thrusting": cdl_thrusting,
    "onneck": cdl_onneck,
    "inneck": cdl_inneck,
    "dojistar": cdl_doji_star,
    "2crows": cdl_2crows,
    "tristar": cdl_tristar,
    "haramicross": cdl_harami_cross,
    "hikkake": cdl_hikkake,
    "hikkakemod": cdl_hikkake_mod,
    "3linestrike": cdl_3linestrike,
    "3starsinsouth": cdl_3starsinsouth,
    "abandonedbaby": cdl_abandonedbaby,
    "advanceblock": cdl_advanceblock,
    "breakaway": cdl_breakaway,
    "concealbabyswall": cdl_concealbabyswall,
    "morningdojistar": cdl_morning_doji_star,
    "eveningdojistar": cdl_evening_doji_star,
    "gapsidesidewhite": cdl_gapsidesidewhite,
    "identical3crows": cdl_identical3crows,
    "kickingbylength": cdl_kicking_by_length,
    "ladderbottom": cdl_ladderbottom,
    "longline": cdl_longline,
    "shortline": cdl_shortline,
    "mathold": cdl_mathold,
    "risefall3methods": cdl_risefall3methods,
    "stalledpattern": cdl_stalledpattern,
    "tasukigap": cdl_tasukigap,
    "unique3river": cdl_unique3river,
    "upsidegap2crows": cdl_upsidegap2crows,
    "xsidegap3methods": cdl_xsidegap3methods,
}


def cdl_pattern(name_: str = "all"):
    """Candle pattern dispatcher — pandas_ta/candles/cdl_pattern.py.

    Memoized per pattern-set: building all 66 patterns' expressions costs
    ~6s of py4j round-trips and the Indicator is immutable by convention,
    so one instance per process serves every caller."""
    return _cdl_pattern_cached(name_)


@functools.lru_cache(maxsize=None)
def _cdl_pattern_cached(name_: str):
    names = ALL_PATTERNS if name_ == "all" else [name_]
    parts = []
    for n in names:
        if n not in _PATTERN_FACTORIES:
            raise ValueError(f"unsupported pattern {n!r}; native set: {ALL_PATTERNS}")
        parts.append(_PATTERN_FACTORIES[n]())
    stages, sql_stages, final, sql_final, outs = [], [], {}, {}, []
    for p in parts:
        stages.extend(p.stages)
        sql_stages.extend(p.sql_stages or [])
        final.update(p.final)
        sql_final.update(p.sql_final or {})
        outs.extend(p.outputs)
    return Indicator("cdl_pattern", outs, CAT, stages=stages, final=final,
                     sql_stages=sql_stages, sql_final=sql_final)


FACTORIES = {
    "cdl_doji": cdl_doji, "cdl_inside": cdl_inside, "cdl_z": cdl_z,
    "ha": ha, "ebsw": ebsw, "cdl_pattern": cdl_pattern,
    "cdl_engulfing": cdl_engulfing, "cdl_harami": cdl_harami,
    "cdl_hammer": cdl_hammer, "cdl_shooting_star": cdl_shooting_star,
    "cdl_marubozu": cdl_marubozu, "cdl_piercing": cdl_piercing,
    "cdl_dark_cloud_cover": cdl_dark_cloud_cover,
    "cdl_3whitesoldiers": cdl_3whitesoldiers,
    "cdl_3blackcrows": cdl_3blackcrows,
    "cdl_morning_star": cdl_morning_star,
    "cdl_evening_star": cdl_evening_star,
    "cdl_hanging_man": cdl_hanging_man,
    "cdl_inverted_hammer": cdl_inverted_hammer,
    "cdl_dragonfly_doji": cdl_dragonfly_doji,
    "cdl_gravestone_doji": cdl_gravestone_doji,
    "cdl_tweezers_top": cdl_tweezers_top,
    "cdl_tweezers_bottom": cdl_tweezers_bottom,
    "cdl_3inside_up": cdl_3inside_up,
    "cdl_3inside_down": cdl_3inside_down,
    "cdl_spinning_top": cdl_spinning_top,
    "cdl_highwave": cdl_highwave,
    "cdl_longleggeddoji": cdl_longleggeddoji,
    "cdl_rickshawman": cdl_rickshawman,
    "cdl_takuri": cdl_takuri,
    "cdl_belthold": cdl_belthold,
    "cdl_closing_marubozu": cdl_closing_marubozu,
    "cdl_counterattack": cdl_counterattack,
    "cdl_homing_pigeon": cdl_homing_pigeon,
    "cdl_matching_low": cdl_matching_low,
    "cdl_stick_sandwich": cdl_stick_sandwich,
    "cdl_3outside_up": cdl_3outside_up,
    "cdl_3outside_down": cdl_3outside_down,
    "cdl_kicking": cdl_kicking,
    "cdl_separating_lines": cdl_separating_lines,
    "cdl_thrusting": cdl_thrusting,
    "cdl_onneck": cdl_onneck,
    "cdl_inneck": cdl_inneck,
    "cdl_doji_star": cdl_doji_star,
    "cdl_2crows": cdl_2crows,
    "cdl_tristar": cdl_tristar,
    "cdl_harami_cross": cdl_harami_cross,
    "cdl_hikkake": cdl_hikkake,
    "cdl_hikkake_mod": cdl_hikkake_mod,
    "cdl_3linestrike": cdl_3linestrike,
    "cdl_3starsinsouth": cdl_3starsinsouth,
    "cdl_abandonedbaby": cdl_abandonedbaby,
    "cdl_advanceblock": cdl_advanceblock,
    "cdl_breakaway": cdl_breakaway,
    "cdl_concealbabyswall": cdl_concealbabyswall,
    "cdl_morning_doji_star": cdl_morning_doji_star,
    "cdl_evening_doji_star": cdl_evening_doji_star,
    "cdl_gapsidesidewhite": cdl_gapsidesidewhite,
    "cdl_identical3crows": cdl_identical3crows,
    "cdl_kicking_by_length": cdl_kicking_by_length,
    "cdl_ladderbottom": cdl_ladderbottom,
    "cdl_longline": cdl_longline,
    "cdl_shortline": cdl_shortline,
    "cdl_mathold": cdl_mathold,
    "cdl_risefall3methods": cdl_risefall3methods,
    "cdl_stalledpattern": cdl_stalledpattern,
    "cdl_tasukigap": cdl_tasukigap,
    "cdl_unique3river": cdl_unique3river,
    "cdl_upsidegap2crows": cdl_upsidegap2crows,
    "cdl_xsidegap3methods": cdl_xsidegap3methods,
}

SUITE = {
    "cdl_doji_10": cdl_doji, "cdl_inside": cdl_inside, "cdl_z_30": cdl_z,
    "ha": ha, "ebsw_40": ebsw, "cdl_pattern_all": cdl_pattern,
    # standalone keys for the trickiest multi-bar patterns (VERDICT r11
    # ask #5): a break in one of these names itself in the DRIVER
    # artifact, not just in the composite hash / the per-pattern pytest
    "cdl_abandonedbaby": lambda: cdl_pattern("abandonedbaby"),
    "cdl_risefall3methods": lambda: cdl_pattern("risefall3methods"),
    "cdl_mathold": lambda: cdl_pattern("mathold"),
    "cdl_concealbabyswall": lambda: cdl_pattern("concealbabyswall"),
    "cdl_hikkake_mod": lambda: cdl_pattern("hikkakemod"),
    "cdl_3starsinsouth": lambda: cdl_pattern("3starsinsouth"),
}
