"""trend/ package ops (SURVEY.md §2.5).

aroon uses the reversed-argmax window trick (functions/windows.py
bars_since_extreme); decay uses the monotone-transform rewrite that turns
the per-row recursion into a single expanding max (exact for non-negative
series — SURVEY.md §2.5 decay row); adx/cksp/amat smooth with the shared
EWM kernel pass + recursive-CTE oracles; psar is the flagship per-row
state machine (plans/kernels.py), value-checked against a recursive-CTE
DuckDB twin like every other key — the suite has no rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_ta_spark.functions.naming import name
from pandas_ta_spark.functions.pdkernels import ema_pd, rma_pd
from pandas_ta_spark.functions.windows import (
    SQL_W_ALL,
    SQL_W_ORDER,
    bars_since_extreme,
    diff,
    masked,
    roll,
    shift,
    sql_diff,
    sql_masked,
    sql_roll,
    sql_shift,
    sql_w_rows,
    w_all,
    w_order,
    w_rows,
)
from pandas_ta_spark.operators.base import Indicator, KernelSpec
from pandas_ta_spark.operators.ewm_sql import EwmStage, ewm_pipeline_sql
from pandas_ta_spark.operators.momentum import _sql_true_range, pd_true_range

CAT = "trend"


def aroon(length: int = 14, scalar: float = 100.0):
    """AROONU/D = scalar*(n - bars_since_extreme)/n over n+1 rows —
    pandas_ta/trend/aroon.py#aroon (recent_maximum_index, latest tie wins)."""
    up_o, dn_o = name("AROONU", length), name("AROOND", length)
    osc_o = name("AROONOSC", length)
    rn_c = "_aroon_rn"
    hh_c, ll_c = "_aroon_hh", "_aroon_ll"

    def fn(pdf):
        from pandas_ta_spark.functions.pdkernels import dist_to_extreme_pd

        dh = dist_to_extreme_pd(pdf["high"], length + 1, True)
        dl = dist_to_extreme_pd(pdf["low"], length + 1, False)
        pdf[dn_o] = scalar * (length - dl) / length
        pdf[up_o] = scalar * (length - dh) / length
        pdf[osc_o] = pdf[up_o] - pdf[dn_o]
        return pdf

    # SQL twin of bars_since_extreme: distance to latest max = 1-based
    # position of the frame max in the REVERSED frame list, minus 1
    # (first occurrence in reversed order == latest tie, matching the
    # reference's reversed argmax and Spark's max_by(rn, struct(v, rn)))
    wr = sql_w_rows(length + 1)

    def s_dist(val: str, is_max: bool) -> str:
        agg = "max" if is_max else "min"
        lst = f"list({val}) OVER ({wr})"
        inner = (f"list_position(list_reverse({lst}),"
                 f" list_aggregate({lst}, '{agg}')) - 1")
        return sql_masked(f"CAST(({inner}) AS BIGINT)", val, length + 1)

    return Indicator(
        "aroon", [dn_o, up_o, osc_o], CAT,
        kernel=KernelSpec(fn, [dn_o, up_o, osc_o], ["high", "low"], carry_rows=length),
        sql_stages=[{rn_c: f"row_number() OVER ({SQL_W_ORDER})"},
                    {hh_c: s_dist("high", True), ll_c: s_dist("low", False)}],
        sql_final={
            dn_o: f"{scalar!r} * ({length} - {ll_c}) / {length}",
            up_o: f"{scalar!r} * ({length} - {hh_c}) / {length}",
            osc_o: (f"{scalar!r} * ({length} - {hh_c}) / {length}"
                    f" - {scalar!r} * ({length} - {ll_c}) / {length}"),
        },
    )


def chop(length: int = 14, atr_length: int = 1, scalar: float = 100.0):
    """Choppiness: scalar*log10(sum(TR,n)/(HH-LL))/log10(n) —
    pandas_ta/trend/chop.py#chop."""
    out = name("CHOP", length, atr_length, scalar)
    tr_c = "_chop_tr"

    def fn(pdf):
        import math

        import numpy as np

        from pandas_ta_spark.functions.pdkernels import (
            div0_np, roll_max_pd, roll_min_pd, roll_sum_seq_pd,
        )

        h, low, c = pdf["high"], pdf["low"], pdf["close"]
        prevc = c.shift(1)
        tr = np.maximum(np.maximum(h - low, (h - prevc).abs()),
                        (low - prevc).abs())
        arg = div0_np(roll_sum_seq_pd(tr, length),
                      roll_max_pd(h, length) - roll_min_pd(low, length))
        # engines' log10(x <= 0) -> NULL (non-ANSI); numpy would emit
        # -inf/NaN-with-warning instead
        with np.errstate(all="ignore"):
            lg = np.where(arg > 0, np.log10(np.where(arg > 0, arg, 1.0)),
                          np.nan)
        pdf[out] = scalar * lg / math.log10(float(length))
        return pdf

    s_hh = sql_roll("max", "high", length)
    s_ll = sql_roll("min", "low", length)
    s = (f"{scalar!r} * log10(({sql_roll('sum', tr_c, length)})"
         f" / (({s_hh}) - ({s_ll}))) / log10({float(length)!r})")
    return Indicator(
        "chop", [out], CAT,
        kernel=KernelSpec(fn, [out], ["high", "low", "close"],
                          carry_rows=length),
        sql_stages=[{tr_c: _sql_true_range()}],
        sql_final={out: s},
    )


def _spark_true_range(drift: int = 1):
    prevc = shift("close", drift)
    return F.when(prevc.isNull(), None).otherwise(
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - prevc),
            F.abs(F.col("low") - prevc),
        )
    )


def decay(length: int = 5, mode: str = "linear"):
    """Linear decay: out_t = max(c_t, out_{t-1} - 1/n, 0) —
    pandas_ta/trend/decay.py#decay. Monotone-transform rewrite: with
    m_t = max_{i<=t}(c_i + rn_i/n), out_t = max(m_t - rn_t/n, 0) — exact
    for the non-negative series the engine handles (0-floor commutes);
    one expanding max instead of a sequential kernel."""
    out = name("LDECAY", length)
    t = "_decay_aug"
    rn = F.row_number().over(w_order())
    e = F.greatest(F.max(t).over(w_all()) - rn / F.lit(float(length)), F.lit(0.0))
    s_rn = f"row_number() OVER ({SQL_W_ORDER})"
    s = (f"greatest(max({t}) OVER ({SQL_W_ALL})"
         f" - ({s_rn}) / {float(length)!r}, 0.0)")
    return Indicator(
        "decay", [out], CAT,
        stages=[{t: F.col("close") + F.row_number().over(w_order()) / F.lit(float(length))}],
        final={out: e},
        sql_stages=[{t: f"close + ({s_rn}) / {float(length)!r}"}],
        sql_final={out: s},
    )


def _creasing(increasing_: bool, length: int = 1, strict: bool = False,
              asint: bool = True, percent: float | None = None,
              drift: int = 1):
    """increasing/decreasing — pandas_ta/trend/increasing.py,
    decreasing.py. NaN diff compares False (0), matching pandas.

    ``strict``: the last ``length`` values are monotone, i.e. the
    length-1 consecutive ``drift``-step moves ending at the current row
    all satisfy the comparison — SURVEY §2.5's "monotone each step",
    expressed as a windowed min over per-step 0/1 flags (one window
    pass, no shift chain; the reference loops shifts to the same
    length-1 comparison count). ``percent`` scales the lagged side of
    the strict comparison by (1 ± percent/100); in the non-strict
    length-diff the scaling multiplies both ends and cancels, so only
    the output name changes — same as the reference. ``asint`` False
    emits booleans instead of 0/1."""
    kind = "INC" if increasing_ else "DEC"
    # Indicator key must be the registry factory name ("increasing"/
    # "decreasing"), not the output prefix — tools/gen_coverage.py groups
    # suite keys by it (the r6 "(helper)" COVERAGE.md rows were this bug)
    key = "increasing" if increasing_ else "decreasing"
    pct = float(percent) if percent else None
    props = f"_{length}_{pct}" if pct is not None else f"_{length}"
    out = f"{'S' if strict else ''}{kind}{props}"
    op = ">" if increasing_ else "<"
    if strict:
        scale = None if pct is None else (
            (1 + 0.01 * pct) if increasing_ else (1 - 0.01 * pct))
        lag = shift("close", drift)
        rhs = lag * F.lit(scale) if scale is not None else lag
        cond = (F.col("close") > rhs) if increasing_ else (F.col("close") < rhs)
        # parameterized per (kind, pct, drift): increasing+decreasing in
        # ONE strategy previously collided on a shared "_creasing_step"
        # (the layer-merge conflict apply_strategy now rejects); pct is
        # embedded identifier-safe (./- would break the unquoted column
        # in the SQL twin — str(5e-05) carries a minus sign)
        t = (f"_{key}_step_{drift}"
             + (f"_{str(pct).replace('.', 'p').replace('-', 'm')}"
                if pct is not None else ""))
        s_lag = sql_shift("close", drift)
        s_rhs = f"({s_lag}) * {scale!r}" if scale is not None else f"({s_lag})"
        # length values = length-1 steps; length<=1 degenerates to the
        # single current-row step, matching the reference
        n_steps = max(length - 1, 1)
        flag = F.min(t).over(w_rows(n_steps))
        s_flag = f"min({t}) OVER ({sql_w_rows(n_steps)})"
        e = flag if asint else (flag == 1.0)
        s = s_flag if asint else f"({s_flag}) = 1.0"
        return Indicator(
            key, [out], CAT,
            stages=[{t: F.when(cond, 1.0).otherwise(0.0)}],
            final={out: e},
            sql_stages=[{t: f"CASE WHEN close {op} {s_rhs} THEN 1.0 ELSE 0.0 END"}],
            sql_final={out: s},
        )
    d = diff("close", length)
    cond = (d > 0) if increasing_ else (d < 0)
    e = F.when(cond, 1.0).otherwise(0.0) if asint else F.coalesce(cond, F.lit(False))
    s_d = sql_diff("close", length)
    s = (f"CASE WHEN ({s_d}) {op} 0 THEN 1.0 ELSE 0.0 END" if asint
         else f"coalesce(({s_d}) {op} 0, FALSE)")
    return Indicator(key, [out], CAT, final={out: e}, sql_final={out: s})


def increasing(length: int = 1, **kw):
    return _creasing(True, length, **kw)


def decreasing(length: int = 1, **kw):
    return _creasing(False, length, **kw)


def dpo(length: int = 20, centered: bool = True):
    """Detrended Price Osc (centered default => documented look-ahead) —
    pandas_ta/trend/dpo.py#dpo: dpo_u = c_u - lead(SMA(c,n), n/2+1)."""
    out = name("DPO", length)
    t = length // 2 + 1
    sma_c = f"_dpo_sma_{length}"
    if centered:
        s = f"close - lead({sma_c}, {t}) OVER ({SQL_W_ORDER})"
    else:
        s = f"close - ({sql_shift(sma_c, t)})"

    def fn(pdf):
        from pandas_ta_spark.functions.pdkernels import roll_mean_seq_pd

        sm = roll_mean_seq_pd(pdf["close"], length)
        pdf[out] = pdf["close"] - sm.shift(-t if centered else t)
        return pdf

    return Indicator(
        "dpo", [out], CAT,
        kernel=KernelSpec(fn, [out], ["close"],
                          carry_rows=length - 1 + (0 if centered else t),
                          lead_rows=t if centered else 0),
        sql_stages=[{sma_c: sql_roll("avg", "close", length)}],
        sql_final={out: s},
    )


def qstick(length: int = 10, mamode: str = "sma"):
    """MA(c - o, n), default SMA — pandas_ta/trend/qstick.py#qstick.

    mamode="ema" smooths the candle body with the SMA-seeded EMA kernel
    (recursive-CTE oracle) instead of the window avg."""
    out = name("QS", length)
    t = "_qs_co"
    if mamode == "ema":
        def fn(pdf):
            pdf[out] = ema_pd(pdf["close"] - pdf["open"], length)
            return pdf

        sql = ewm_pipeline_sql(
            [EwmStage("_qs", t, 2.0 / (length + 1), length)],
            {out: "_qs"},
            pre={t: "(close - open)"},
        )
        return Indicator("qstick", [out], CAT,
                         kernel=KernelSpec(fn, [out], ["open", "close"]),
                         sql_full=sql)
    def fn_sma(pdf):
        from pandas_ta_spark.functions.pdkernels import roll_mean_seq_pd

        pdf[out] = roll_mean_seq_pd(pdf["close"] - pdf["open"], length)
        return pdf

    return Indicator(
        "qstick", [out], CAT,
        kernel=KernelSpec(fn_sma, [out], ["open", "close"],
                          carry_rows=length - 1),
        sql_stages=[{t: "(close - open)"}],
        sql_final={out: sql_roll("avg", t, length)},
    )


def ttm_trend(length: int = 6):
    """close vs SMA(hl2, n): 1/-1 — pandas_ta/trend/ttm_trend.py."""
    out = name("TTM_TRND", length)
    t = "_ttm_avg"

    def fn(pdf):
        import numpy as np

        from pandas_ta_spark.functions.pdkernels import roll_mean_seq_pd

        avg = roll_mean_seq_pd((pdf["high"] + pdf["low"]) / 2, length)
        pdf[out] = np.where(np.isnan(avg), np.nan,
                            np.where(pdf["close"] > avg, 1.0, -1.0))
        return pdf

    s = (f"CASE WHEN {t} IS NULL THEN NULL"
         f" WHEN close > {t} THEN 1.0 ELSE -1.0 END")
    return Indicator(
        "ttm_trend", [out], CAT,
        kernel=KernelSpec(fn, [out], ["high", "low", "close"],
                          carry_rows=length - 1),
        sql_stages=[{t: sql_masked(
            f"avg((high + low) / 2) OVER ({sql_w_rows(length)})", "close", length)}],
        sql_final={out: s},
    )


def vhf(length: int = 28, drift: int = 1):
    """Vertical Horizontal Filter: |HH-LL| / sum(|diff|) —
    pandas_ta/trend/vhf.py#vhf (on close)."""
    out = name("VHF", length)
    t = "_vhf_absd"

    def fn(pdf):
        from pandas_ta_spark.functions.pdkernels import (
            div0_np, roll_max_pd, roll_min_pd, roll_sum_seq_pd,
        )

        c = pdf["close"]
        num = (roll_max_pd(c, length) - roll_min_pd(c, length)).abs()
        pdf[out] = div0_np(num, roll_sum_seq_pd(c.diff(drift).abs(), length))
        return pdf

    s_hh = sql_roll("max", "close", length)
    s_ll = sql_roll("min", "close", length)
    s = f"abs(({s_hh}) - ({s_ll})) / ({sql_roll('sum', t, length)})"
    return Indicator(
        "vhf", [out], CAT,
        kernel=KernelSpec(fn, [out], ["close"],
                          carry_rows=drift + length - 1),
        sql_stages=[{t: f"abs({sql_diff('close', drift)})"}],
        sql_final={out: s},
    )


def vortex(length: int = 14, drift: int = 1):
    """VI+ = sum(|h - l.shift|)/sum(TR); VI- mirrored —
    pandas_ta/trend/vortex.py#vortex."""
    op, om = name("VTXP", length), name("VTXM", length)
    tr_c, vp_c, vm_c = "_vtx_tr", "_vtx_p", "_vtx_m"
    s_pl, s_ph = sql_shift("low", drift), sql_shift("high", drift)
    s_vmp = f"CASE WHEN ({s_pl}) IS NULL THEN NULL ELSE abs(high - ({s_pl})) END"
    s_vmm = f"CASE WHEN ({s_ph}) IS NULL THEN NULL ELSE abs(low - ({s_ph})) END"
    s_str = sql_roll("sum", tr_c, length)

    def fn(pdf):
        from pandas_ta_spark.functions.pdkernels import roll_sum_pd

        h, low, c = pdf["high"], pdf["low"], pdf["close"]
        tr = pd_true_range(pdf, c.shift(drift))
        str_ = roll_sum_pd(tr, length)
        pdf[op] = roll_sum_pd((h - low.shift(drift)).abs(), length) / str_
        pdf[om] = roll_sum_pd((low - h.shift(drift)).abs(), length) / str_
        return pdf

    return Indicator(
        "vortex", [op, om], CAT,
        kernel=KernelSpec(fn, [op, om], ["high", "low", "close"],
                          carry_rows=length - 1 + drift),
        sql_stages=[{tr_c: _sql_true_range(drift), vp_c: s_vmp, vm_c: s_vmm}],
        sql_final={op: f"({sql_roll('sum', vp_c, length)}) / ({s_str})",
                   om: f"({sql_roll('sum', vm_c, length)}) / ({s_str})"},
    )


def adx(length: int = 14, lensig: int | None = None, scalar: float = 100.0):
    """ADX/DMP/DMN via RMA chains — pandas_ta/trend/adx.py#adx."""
    lensig = lensig or length
    oa = name("ADX", lensig)
    op, om = name("DMP", length), name("DMN", length)
    a = 1.0 / length

    def fn(pdf):
        import numpy as np

        atr_ = rma_pd(pd_true_range(pdf, pdf["close"].shift(1)), length)
        up = pdf["high"].diff(1)
        dn = -pdf["low"].diff(1)
        pos = up.where((up > dn) & (up > 0), 0.0)
        neg = dn.where((dn > up) & (dn > 0), 0.0)
        pos[up.isna()] = np.nan
        neg[dn.isna()] = np.nan
        k = scalar / atr_
        dmp = k * rma_pd(pos, length)
        dmn = k * rma_pd(neg, length)
        dx = scalar * (dmp - dmn).abs() / (dmp + dmn)
        pdf[oa] = rma_pd(dx, lensig)
        pdf[op] = dmp
        pdf[om] = dmn
        return pdf

    s_up = sql_diff("high", 1)
    s_dn = f"(-({sql_diff('low', 1)}))"
    pos = (f"CASE WHEN ({s_up}) IS NULL THEN NULL"
           f" WHEN ({s_up}) > ({s_dn}) AND ({s_up}) > 0 THEN ({s_up}) ELSE 0.0 END")
    neg = (f"CASE WHEN ({s_dn}) IS NULL THEN NULL"
           f" WHEN ({s_dn}) > ({s_up}) AND ({s_dn}) > 0 THEN ({s_dn}) ELSE 0.0 END")
    sql = ewm_pipeline_sql(
        [
            EwmStage("_atr", "_tr", a, length),
            EwmStage("_rp", "_pos", a, length),
            EwmStage("_rn2", "_neg", a, length),
            {"_dmp": f"{scalar!r} / _atr * _rp", "_dmn": f"{scalar!r} / _atr * _rn2"},
            {"_dx": f"{scalar!r} * abs(_dmp - _dmn) / (_dmp + _dmn)"},
            EwmStage("_adx", "_dx", 1.0 / lensig, lensig),
        ],
        {oa: "_adx", op: "_dmp", om: "_dmn"},
        pre={"_tr": _sql_true_range(), "_pos": pos, "_neg": neg},
    )
    return Indicator("adx", [oa, op, om], CAT,
                     kernel=KernelSpec(fn, [oa, op, om], ["high", "low", "close"]),
                     sql_full=sql)


def cksp(p: int = 10, x: float = 1.0, q: int = 9):
    """Chande Kroll Stop — pandas_ta/trend/cksp.py#cksp."""
    ol, os_ = name("CKSPl", p, x, q), name("CKSPs", p, x, q)

    def fn(pdf):
        atr_ = rma_pd(pd_true_range(pdf, pdf["close"].shift(1)), p)
        ls0 = pdf["high"].rolling(p).max() - x * atr_
        ss0 = pdf["low"].rolling(p).min() + x * atr_
        pdf[ol] = ls0.rolling(q).max()
        pdf[os_] = ss0.rolling(q).min()
        return pdf

    sql = ewm_pipeline_sql(
        [
            EwmStage("_atr", "_tr", 1.0 / p, p),
            {"_ls0": f"({sql_roll('max', 'high', p)}) - {x!r} * _atr",
             "_ss0": f"({sql_roll('min', 'low', p)}) + {x!r} * _atr"},
        ],
        {ol: sql_roll("max", "_ls0", q), os_: sql_roll("min", "_ss0", q)},
        pre={"_tr": _sql_true_range()},
    )
    return Indicator("cksp", [ol, os_], CAT,
                     kernel=KernelSpec(fn, [ol, os_], ["high", "low", "close"]),
                     sql_full=sql)


def amat(fast: int = 8, slow: int = 21, lookback: int = 2,
         mamode: str = "ema"):
    """Archer MA Trends: long_run/short_run of MA(fast) vs MA(slow) —
    pandas_ta/trend/amat.py#amat, trend/long_run.py#long_run.

    mamode selects the smoother for both legs (default "ema" as the
    reference; "sma" swaps in rolling means — window exprs, no kernel)."""
    tag = mamode[0]  # AMATe_* / AMATs_* (reference naming)
    ol = f"AMAT{tag}_LR_{fast}_{slow}_{lookback}"
    os_ = f"AMAT{tag}_SR_{fast}_{slow}_{lookback}"

    def fn(pdf):
        from pandas_ta_spark.operators.base import np_flag_quantize

        if mamode == "sma":
            ef = pdf["close"].rolling(fast).mean()
            es = pdf["close"].rolling(slow).mean()
        else:
            ef = ema_pd(pdf["close"], fast)
            es = ema_pd(pdf["close"], slow)
        # quantized-diff thresholds — base.py flag_quantize rationale
        fq = np_flag_quantize(ef.diff(lookback))
        sq = np_flag_quantize(es.diff(lookback))
        fi, fd = fq > 0, fq < 0
        si, sd = sq > 0, sq < 0
        pdf[ol] = ((fi & sd) | (fi & si)).astype(float)
        pdf[os_] = ((fd & si) | (fd & sd)).astype(float)
        return pdf

    def s_d(col):
        from pandas_ta_spark.operators.base import sql_flag_quantize

        return sql_flag_quantize(
            f"{col} - lag({col}, {lookback})"
            f" OVER (PARTITION BY symbol ORDER BY _rn)")

    fi, fd = f"({s_d('_ef')} > 0)", f"({s_d('_ef')} < 0)"
    si, sd = f"({s_d('_es')} > 0)", f"({s_d('_es')} < 0)"
    if mamode == "sma":
        steps = [{
            "_ef": sql_masked(f"avg(close) OVER ({sql_w_rows(fast)})",
                              "close", fast),
            "_es": sql_masked(f"avg(close) OVER ({sql_w_rows(slow)})",
                              "close", slow),
        }]
    else:
        steps = [
            EwmStage("_ef", "close", 2.0 / (fast + 1), fast),
            EwmStage("_es", "close", 2.0 / (slow + 1), slow),
        ]
    sql = ewm_pipeline_sql(
        steps,
        # coalesce: pandas bool-of-NaN compares False (0.0) in warmup
        {ol: f"CAST(coalesce(({fi} AND {sd}) OR ({fi} AND {si}), false) AS DOUBLE)",
         os_: f"CAST(coalesce(({fd} AND {si}) OR ({fd} AND {sd}), false) AS DOUBLE)"},
    )
    return Indicator("amat", [ol, os_], CAT,
                     kernel=KernelSpec(fn, [ol, os_], ["close"]),
                     sql_full=sql)


def tsignals(fast: int = 8, slow: int = 21):
    """Trend signals of trend := SMA(fast) > SMA(slow) —
    pandas_ta/trend/tsignals.py#tsignals (trend input bound to the classic
    MA-cross for the driver suite; any boolean Column works via
    ``tsignals_of``)."""
    from pandas_ta_spark.operators.base import (
        flag_quantize,
        sql_flag_quantize,
    )

    # quantized MA-cross — base.py flag_quantize rationale (equal-MA
    # stretches put the true difference at exactly 0)
    s_trend = ("(" + sql_flag_quantize(
        f"({sql_roll('avg', 'close', fast)})"
        f" - ({sql_roll('avg', 'close', slow)})") + " > 0)")

    outs = ["TS_Trends", "TS_Trades", "TS_Entries", "TS_Exits"]

    def fn(pdf):
        import numpy as np

        from pandas_ta_spark.functions.pdkernels import roll_mean_seq_pd
        from pandas_ta_spark.operators.base import np_flag_quantize

        c = pdf["close"]
        fq = np_flag_quantize(
            (roll_mean_seq_pd(c, fast)
             - roll_mean_seq_pd(c, slow)).to_numpy())
        t = np.where(np.isnan(fq), np.nan, (fq > 0).astype("float64"))
        prev = np.concatenate(([np.nan], t[:-1]))
        trades = t - np.where(np.isnan(prev), 0.0, prev)
        pdf[outs[0]] = t
        pdf[outs[1]] = trades
        pdf[outs[2]] = np.where(np.isnan(trades), np.nan,
                                (trades == 1).astype("float64"))
        pdf[outs[3]] = np.where(np.isnan(trades), np.nan,
                                (trades == -1).astype("float64"))
        return pdf

    # SQL twin: identical strings to tsignals_of's oracle side
    t = "_ts_trend"
    s_prev = sql_shift(t, 1)
    s_trades = f"({t} - coalesce({s_prev}, 0.0))"
    return Indicator(
        "tsignals", outs, CAT,
        kernel=KernelSpec(fn, outs, ["close"],
                          carry_rows=max(fast, slow)),
        sql_stages=[{t: f"CAST({s_trend} AS DOUBLE)"}],
        sql_final={
            outs[0]: t,
            outs[1]: s_trades,
            outs[2]: f"CAST({s_trades} = 1 AS DOUBLE)",
            outs[3]: f"CAST({s_trades} = -1 AS DOUBLE)",
        },
    )


def tsignals_of(trend, s_trend: str):
    """TS_Trends/TS_Trades/TS_Entries/TS_Exits from a boolean trend."""
    outs = ["TS_Trends", "TS_Trades", "TS_Entries", "TS_Exits"]
    t = "_ts_trend"
    cur = F.col(t)
    prev = shift(t, 1)
    trades = cur - F.coalesce(prev, F.lit(0.0))
    s_prev = sql_shift(t, 1)
    s_trades = f"({t} - coalesce({s_prev}, 0.0))"
    return Indicator(
        "tsignals", outs, CAT,
        stages=[{t: trend.cast("double")}],
        final={
            outs[0]: cur,
            outs[1]: trades,
            outs[2]: (trades == 1).cast("double"),
            outs[3]: (trades == -1).cast("double"),
        },
        sql_stages=[{t: f"CAST({s_trend} AS DOUBLE)"}],
        sql_final={
            outs[0]: t,
            outs[1]: s_trades,
            outs[2]: f"CAST({s_trades} = 1 AS DOUBLE)",
            outs[3]: f"CAST({s_trades} = -1 AS DOUBLE)",
        },
    )


def _run_bools(increasing_first: bool, fast_n: int, slow_n: int, length: int):
    """Shared long_run/short_run machinery over the classic SMA pair —
    pandas_ta/trend/long_run.py#long_run, #short_run. NaN diffs compare
    False (0.0), matching pandas."""
    from pandas_ta_spark.operators.base import (
        flag_quantize,
        sql_flag_quantize,
    )

    f_c, s_c = f"_run_f{fast_n}", f"_run_s{slow_n}"
    # quantized-diff thresholds — base.py flag_quantize rationale (the
    # two engines' windowed avg differ in the last ulp: per-row frame
    # re-aggregation vs segment tree)
    fd = flag_quantize(F.col(f_c) - shift(f_c, length))
    sd = flag_quantize(F.col(s_c) - shift(s_c, length))
    fi, fde = fd > 0, fd < 0
    si, sde = sd > 0, sd < 0
    if increasing_first:  # long: potential bottom or both rising
        e = (fi & sde) | (fi & si)
    else:  # short: potential top or both falling
        e = (fde & si) | (fde & sde)
    s_fd = sql_flag_quantize(f"{f_c} - ({sql_shift(f_c, length)})")
    s_sd = sql_flag_quantize(f"{s_c} - ({sql_shift(s_c, length)})")
    s_fi, s_fde = f"({s_fd} > 0)", f"({s_fd} < 0)"
    s_si, s_sde = f"({s_sd} > 0)", f"({s_sd} < 0)"
    if increasing_first:
        s_e = f"(({s_fi} AND {s_sde}) OR ({s_fi} AND {s_si}))"
    else:
        s_e = f"(({s_fde} AND {s_si}) OR ({s_fde} AND {s_sde}))"
    stages = [{f_c: roll(F.avg, "close", fast_n), s_c: roll(F.avg, "close", slow_n)}]
    sql_stages = [{f_c: sql_roll("avg", "close", fast_n),
                   s_c: sql_roll("avg", "close", slow_n)}]
    return e, s_e, stages, sql_stages


def _run_kernel(out, increasing_first: bool, fast_n: int, slow_n: int,
                length: int):
    """Arrow-kernel twin of _run_bools: three-valued NULL combinations
    all coalesce to 0.0, which numpy's NaN-compares-False reproduces."""
    def fn(pdf):
        from pandas_ta_spark.functions.pdkernels import roll_mean_seq_pd
        from pandas_ta_spark.operators.base import np_flag_quantize

        c = pdf["close"]
        mf = roll_mean_seq_pd(c, fast_n)
        ms = roll_mean_seq_pd(c, slow_n)
        fq = np_flag_quantize((mf - mf.shift(length)).to_numpy())
        sq = np_flag_quantize((ms - ms.shift(length)).to_numpy())
        fi, fde = fq > 0, fq < 0
        si, sde = sq > 0, sq < 0
        if increasing_first:
            e = (fi & sde) | (fi & si)
        else:
            e = (fde & si) | (fde & sde)
        pdf[out] = e.astype("float64")
        return pdf

    return KernelSpec(fn, [out], ["close"],
                      carry_rows=max(fast_n, slow_n) - 1 + length)


def long_run(fast_n: int = 8, slow_n: int = 21, length: int = 2):
    out = name("LR", length)
    e, s_e, stages, sql_stages = _run_bools(True, fast_n, slow_n, length)
    return Indicator(
        "long_run", [out], CAT,
        kernel=_run_kernel(out, True, fast_n, slow_n, length),
        sql_stages=sql_stages,
        sql_final={out: f"CAST(coalesce({s_e}, false) AS DOUBLE)"},
    )


def short_run(fast_n: int = 8, slow_n: int = 21, length: int = 2):
    out = name("SR", length)
    e, s_e, stages, sql_stages = _run_bools(False, fast_n, slow_n, length)
    return Indicator(
        "short_run", [out], CAT,
        kernel=_run_kernel(out, False, fast_n, slow_n, length),
        sql_stages=sql_stages,
        sql_final={out: f"CAST(coalesce({s_e}, false) AS DOUBLE)"},
    )


def xsignals(length: int = 30, xa: float = 1.0, xb: float = -1.0):
    """Cross signals — pandas_ta/trend/xsignals.py#xsignals: enter when
    the signal (here zscore(close, n), any window signal works) crosses
    above xa, exit when it crosses below xb. State held between events
    via last(ignorenulls) — no kernel."""
    from pandas_ta_spark.functions.windows import SQL_W_ALL, w_all

    outs = ["XS_Trends", "XS_Trades", "XS_Entries", "XS_Exits"]
    sig_c, ev_c, st_c = "_xs_sig", "_xs_ev", "_xs_state"

    def fn(pdf):
        import numpy as np
        import pandas as pd

        from pandas_ta_spark.functions.pdkernels import (
            div0_np, roll_mean_seq_pd, roll_std_welford_pd,
        )

        c = pdf["close"]
        sig_v = div0_np(c - roll_mean_seq_pd(c, length),
                        roll_std_welford_pd(c, length, 1))
        prev_v = np.concatenate(([np.nan], sig_v[:-1]))
        up = (sig_v > xa) & (prev_v <= xa)  # NaN compares False
        dn = (sig_v < xb) & (prev_v >= xb)
        ev = np.where(up, 1.0, np.where(dn, 0.0, np.nan))
        state = (pd.Series(ev, index=c.index).ffill()
                 .fillna(0.0).to_numpy())
        prev_st = np.concatenate(([0.0], state[:-1]))
        trades = state - prev_st
        pdf[outs[0]] = state
        pdf[outs[1]] = trades
        pdf[outs[2]] = (trades == 1).astype("float64")
        pdf[outs[3]] = (trades == -1).astype("float64")
        return pdf

    s_sig = (f"((close - ({sql_roll('avg', 'close', length)}))"
             f" / ({sql_roll('stddev_samp', 'close', length)}))")
    s_prev = sql_shift(sig_c, 1)
    s_up = f"({sig_c} > {xa!r} AND ({s_prev}) <= {xa!r})"
    s_dn = f"({sig_c} < {xb!r} AND ({s_prev}) >= {xb!r})"
    s_ev = f"CASE WHEN {s_up} THEN 1.0 WHEN {s_dn} THEN 0.0 END"
    s_state = f"coalesce(last_value({ev_c} IGNORE NULLS) OVER ({SQL_W_ALL}), 0.0)"
    s_trades = f"({st_c} - coalesce({sql_shift(st_c, 1)}, 0.0))"
    return Indicator(
        "xsignals", outs, CAT,
        kernel=KernelSpec(fn, outs, ["close"]),
        sql_stages=[{sig_c: s_sig}, {ev_c: s_ev}, {st_c: s_state}],
        sql_final={
            outs[0]: st_c,
            outs[1]: s_trades,
            outs[2]: f"CAST({s_trades} = 1 AS DOUBLE)",
            outs[3]: f"CAST({s_trades} = -1 AS DOUBLE)",
        },
    )


def psar(af0: float = 0.02, af: float = 0.02, max_af: float = 0.2):
    """Parabolic SAR state machine — pandas_ta/trend/psar.py#psar.
    Per-row data-dependent recursion: Arrow kernel per symbol (the one
    class of op that is genuinely sequential); value-checked against a
    recursive-CTE DuckDB twin (operators/ewm_sql.py)."""
    suffix = f"{af}_{max_af}"
    outs = [f"PSARl_{suffix}", f"PSARs_{suffix}", f"PSARaf_{suffix}", f"PSARr_{suffix}"]

    def fn(pdf):
        import numpy as np

        high = pdf["high"].to_numpy().tolist()
        low = pdf["low"].to_numpy().tolist()
        close = pdf["close"].to_numpy().tolist()
        n = len(pdf)
        psar_l = np.full(n, np.nan)
        psar_s = np.full(n, np.nan)
        af_arr = np.full(n, np.nan)
        rev = np.zeros(n)
        if n < 2:
            # the oracle's anchor row emits af0 (and rev 0) for ANY
            # group, including a single-row one — mirror it (fuzz gate)
            if n == 1:
                af_arr[0] = af0
            pdf[outs[0]], pdf[outs[1]] = psar_l, psar_s
            pdf[outs[2]], pdf[outs[3]] = af_arr, rev
            return pdf
        falling = (high[0] + low[0]) / 2 > close[1] if n > 1 else False
        cur_af = af0
        sar = high[0] if falling else low[0]
        ep = low[0] if falling else high[0]
        af_arr[0] = af0
        for i in range(1, n):
            sar = sar + cur_af * (ep - sar)
            if falling:
                reverse = high[i] > sar
                if low[i] < ep:
                    ep = low[i]
                    cur_af = min(cur_af + af, max_af)
                sar = max(sar, high[i - 1], high[i - 2] if i > 1 else high[i - 1])
            else:
                reverse = low[i] < sar
                if high[i] > ep:
                    ep = high[i]
                    cur_af = min(cur_af + af, max_af)
                sar = min(sar, low[i - 1], low[i - 2] if i > 1 else low[i - 1])
            if reverse:
                sar = ep
                ep = low[i] if not falling else high[i]
                falling = not falling
                cur_af = af0
                ep = low[i] if falling else high[i]
            if falling:
                psar_s[i] = sar
            else:
                psar_l[i] = sar
            af_arr[i] = cur_af
            rev[i] = float(reverse)
        pdf[outs[0]] = psar_l
        pdf[outs[1]] = psar_s
        pdf[outs[2]] = af_arr
        pdf[outs[3]] = rev
        return pdf

    sql = _psar_oracle(outs, af0, af, max_af)
    return Indicator("psar", outs, CAT,
                     kernel=KernelSpec(fn, outs, ["high", "low", "close"]),
                     sql_full=sql)


def _psar_oracle(outs, af0: float, af: float, max_af: float) -> str:
    """PSAR state machine as a recursive CTE: state (falling, sar, ep,
    af, rev) mirrors the kernel's exact update sequencing (accelerate ->
    clamp vs two prior extremes -> reverse), fully inlined (no lateral
    aliases)."""
    from pandas_ta_spark.operators.ewm_sql import recursive_oracle

    a0, ai, am = repr(float(af0)), repr(float(af)), repr(float(max_af))
    sar_mid = "(r._sar + r._af * (r._ep - r._sar))"
    falling = "(r._falling = 1)"
    reverse = (f"(CASE WHEN {falling} THEN b.high > {sar_mid}"
               f" ELSE b.low < {sar_mid} END)")
    ep_upd = (f"(CASE WHEN {falling} THEN"
              f" (CASE WHEN b.low < r._ep THEN b.low ELSE r._ep END)"
              f" ELSE (CASE WHEN b.high > r._ep THEN b.high ELSE r._ep END) END)")
    af_upd = (f"(CASE WHEN {falling} THEN"
              f" (CASE WHEN b.low < r._ep THEN least(r._af + {ai}, {am}) ELSE r._af END)"
              f" ELSE (CASE WHEN b.high > r._ep THEN least(r._af + {ai}, {am}) ELSE r._af END) END)")
    sar_clamp = (f"(CASE WHEN {falling}"
                 f" THEN greatest({sar_mid}, b._hp1, coalesce(b._hp2, b._hp1))"
                 f" ELSE least({sar_mid}, b._lp1, coalesce(b._lp2, b._lp1)) END)")
    new_falling = (f"(CASE WHEN {reverse} THEN 1 - r._falling"
                   f" ELSE r._falling END)")
    sar_fin = f"(CASE WHEN {reverse} THEN {ep_upd} ELSE {sar_clamp} END)"
    ep_fin = (f"(CASE WHEN {reverse} THEN"
              f" (CASE WHEN {new_falling} = 1 THEN b.low ELSE b.high END)"
              f" ELSE {ep_upd} END)")
    af_fin = f"(CASE WHEN {reverse} THEN {a0} ELSE {af_upd} END)"
    wo = "PARTITION BY symbol ORDER BY ts"
    return recursive_oracle(
        pre={
            "_c1": f"lead(close, 1) OVER ({wo})",
            "_hp1": f"lag(high, 1) OVER ({wo})",
            "_hp2": f"lag(high, 2) OVER ({wo})",
            "_lp1": f"lag(low, 1) OVER ({wo})",
            "_lp2": f"lag(low, 2) OVER ({wo})",
        },
        anchor_where="b._rn = 1",
        anchor_state={
            "_falling": "CASE WHEN (b.high + b.low) / 2 > b._c1 THEN 1 ELSE 0 END",
            "_sar": "CASE WHEN (b.high + b.low) / 2 > b._c1 THEN b.high ELSE b.low END",
            "_ep": "CASE WHEN (b.high + b.low) / 2 > b._c1 THEN b.low ELSE b.high END",
            "_af": a0,
            "_rev": "0.0",
        },
        step_state={
            "_falling": new_falling,
            "_sar": sar_fin,
            "_ep": ep_fin,
            "_af": af_fin,
            "_rev": f"CAST({reverse} AS DOUBLE)",
        },
        step_inputs=["high", "low", "_hp1", "_hp2", "_lp1", "_lp2"],
        final={
            outs[0]: "CASE WHEN b._rn > 1 AND _falling = 0 THEN _sar END",
            outs[1]: "CASE WHEN b._rn > 1 AND _falling = 1 THEN _sar END",
            outs[2]: "_af",
            outs[3]: "CASE WHEN b._rn = 1 THEN 0.0 ELSE _rev END",
        },
    )


FACTORIES = {
    "aroon": aroon, "chop": chop, "decay": decay, "increasing": increasing,
    "decreasing": decreasing, "dpo": dpo, "qstick": qstick,
    "ttm_trend": ttm_trend, "vhf": vhf, "vortex": vortex, "adx": adx,
    "cksp": cksp, "amat": amat, "tsignals": tsignals, "psar": psar,
    "long_run": long_run, "short_run": short_run, "xsignals": xsignals,
}

SUITE = {
    "aroon_14": aroon, "chop_14": chop, "decay_5": decay,
    "increasing_1": increasing, "decreasing_1": decreasing,
    "increasing_strict_4": lambda: increasing(4, strict=True),
    "decreasing_strict_4": lambda: decreasing(4, strict=True),
    "dpo_20": dpo,
    "qstick_10": qstick, "qstick_ema_10": lambda: qstick(10, mamode="ema"),
    "ttm_trend_6": ttm_trend, "vhf_28": vhf,
    "vortex_14": vortex, "adx_14": adx, "cksp_10_1_9": cksp,
    "amat_8_21_2": amat,
    "amat_sma_8_21_2": lambda: amat(8, 21, 2, mamode="sma"),
    "tsignals_8_21": tsignals, "psar": psar,
    "long_run_8_21": long_run, "short_run_8_21": short_run,
    "xsignals_z30": xsignals,
}
