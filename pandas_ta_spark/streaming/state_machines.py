"""Streaming twins for the remaining KERNEL-class state machines
(VERDICT r11 ask #6): psar, qqe, stc, hwc, ebsw.

Same contract as streaming/indicators.py: one applyInPandasWithState
update function per op, state carried across micro-batches, EXACT batch
parity row-for-row against the Arrow kernels (trend.psar, momentum.qqe,
momentum.stc, volatility.hwc, candles.ebsw — themselves twins of
pandas_ta/trend/psar.py#psar, momentum/qqe.py#qqe, momentum/stc.py#stc,
volatility/hwc.py#hwc, cycles/ebsw.py#ebsw). EWM seeds flow through the
shared quantized form (base.seed_mean) like everywhere else, and the
recursion steps reuse _ewm_step's pandas constant-hold semantics, so the
replay gate's 1e-9 tolerance is comfortably met (the recursions are
bit-identical in practice).

Serialization convention: ring/seed buffers are CSV strings of
repr(float) with "nan" for a missing (None) slot — the same flat-state
style the existing twins use (applyInPandasWithState state rows cannot
hold arrays).
"""

from __future__ import annotations

import math as _math

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pandas_ta_spark.operators.base import seed_mean
from pandas_ta_spark.streaming.indicators import _ewm_step, _one_chunk


def _dump(vals) -> str:
    return ",".join("nan" if v is None else repr(float(v)) for v in vals)


def _load(s: str) -> list:
    out = []
    for tok in s.split(","):
        if tok == "":
            continue
        v = float(tok)
        out.append(None if _math.isnan(v) else v)
    return out


def _opt(x):
    """NaN-in-state -> None (DoubleType state columns can't hold None
    round-trips distinctly from NaN, so NaN encodes 'unset')."""
    return None if (x is None or _math.isnan(x)) else x


def _nan(x):
    return float("nan") if x is None else x


class _Ewm:
    """Incremental twin of pdkernels.ewm_seeded for streams whose input
    is leading-None-then-continuous (every chained smoother here):
    collect the first ``n`` non-None inputs (leading Nones push the seed
    forward, pandas min_periods accounting), seed with the shared
    quantized form (base.seed_mean), then the bitwise pandas step.
    A None AFTER seeding holds the value and emits None (bar streams
    never produce one; documented, not exercised)."""

    __slots__ = ("alpha", "n", "buf", "val")

    def __init__(self, alpha: float, n: int, buf=None, val=None):
        self.alpha, self.n = alpha, n
        self.buf = buf if buf is not None else []
        self.val = val

    def step(self, x):
        if self.val is None:
            if x is None:
                return None
            self.buf.append(x)
            if len(self.buf) >= self.n:
                self.val = seed_mean(self.buf)
                self.buf = []
            return self.val
        if x is None:
            return None
        self.val = _ewm_step(self.alpha, x, self.val)
        return self.val


# ------------------------------------------------------------- PSAR ----

PSAR_OUT_SCHEMA = StructType([
    StructField("symbol", StringType()),
    StructField("ts", TimestampType()),
    StructField("close", DoubleType()),
    StructField("psarl", DoubleType()),
    StructField("psars", DoubleType()),
    StructField("psaraf", DoubleType()),
    StructField("psarr", DoubleType()),
])

# carried: rows seen, falling flag, sar/ep/af, the last two highs/lows
# (the clamp at row i reads high[i-1] and high[i-2])
PSAR_STATE_SCHEMA = StructType([
    StructField("nseen", LongType()),
    StructField("falling", DoubleType()),
    StructField("sar", DoubleType()),
    StructField("ep", DoubleType()),
    StructField("af", DoubleType()),
    StructField("hm1", DoubleType()),
    StructField("hm2", DoubleType()),
    StructField("lm1", DoubleType()),
    StructField("lm2", DoubleType()),
])


def streaming_psar(ticks: DataFrame, af0: float = 0.02, af: float = 0.02,
                   max_af: float = 0.2,
                   watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming Parabolic SAR per symbol — the accelerate ->
    clamp -> reverse state machine (trend.psar's Arrow kernel,
    pandas_ta/trend/psar.py#psar) carried across micro-batches."""

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            (nseen, falling_d, sar, ep, cur_af,
             hm1, hm2, lm1, lm2) = state.get
            falling = bool(falling_d)
            sar, ep = _opt(sar), _opt(ep)
            hm2, lm2 = _opt(hm2), _opt(lm2)
        else:
            nseen, falling, sar, ep, cur_af = 0, False, None, None, af0
            hm1 = hm2 = lm1 = lm2 = None
        for pdf in _one_chunk(pdfs):
            pdf = pdf.sort_values("ts")
            rows = {k: [] for k in ("ts", "close", "psarl", "psars",
                                    "psaraf", "psarr")}
            for ts, h, l, c in zip(pdf["ts"], pdf["high"], pdf["low"],
                                   pdf["close"]):
                h, l, c = float(h), float(l), float(c)
                out_l = out_s = None
                if nseen == 0:
                    # batch row 0: af0, rev 0, no sar (single-row groups
                    # included — the oracle's anchor contract)
                    out_af, out_rev = af0, 0.0
                else:
                    if nseen == 1:
                        # bootstrap from rows 0 and 1 (hm1/lm1 hold row 0)
                        falling = (hm1 + lm1) / 2 > c
                        cur_af = af0
                        sar = hm1 if falling else lm1
                        ep = lm1 if falling else hm1
                    sar = sar + cur_af * (ep - sar)
                    if falling:
                        reverse = h > sar
                        if l < ep:
                            ep = l
                            cur_af = min(cur_af + af, max_af)
                        sar = max(sar, hm1, hm2 if hm2 is not None else hm1)
                    else:
                        reverse = l < sar
                        if h > ep:
                            ep = h
                            cur_af = min(cur_af + af, max_af)
                        sar = min(sar, lm1, lm2 if lm2 is not None else lm1)
                    if reverse:
                        sar = ep
                        falling = not falling
                        cur_af = af0
                        ep = l if falling else h
                    if falling:
                        out_s = sar
                    else:
                        out_l = sar
                    out_af, out_rev = cur_af, float(reverse)
                hm2, lm2 = hm1, lm1
                hm1, lm1 = h, l
                nseen += 1
                rows["ts"].append(ts)
                rows["close"].append(c)
                rows["psarl"].append(out_l)
                rows["psars"].append(out_s)
                rows["psaraf"].append(out_af)
                rows["psarr"].append(out_rev)
            yield pd.DataFrame({"symbol": key[0], **rows})
        state.update((nseen, float(falling), _nan(sar), _nan(ep), cur_af,
                      _nan(hm1), _nan(hm2), _nan(lm1), _nan(lm2)))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update, outputStructType=PSAR_OUT_SCHEMA,
        stateStructType=PSAR_STATE_SCHEMA,
        outputMode="append", timeoutConf="NoTimeout")


# -------------------------------------------------------------- QQE ----

QQE_OUT_SCHEMA = StructType([
    StructField("symbol", StringType()),
    StructField("ts", TimestampType()),
    StructField("close", DoubleType()),
    StructField("qqe", DoubleType()),
    StructField("rsima", DoubleType()),
    StructField("qqel", DoubleType()),
    StructField("qqes", DoubleType()),
])

# carried: the four chained smoothers (RSI's two Wilder RMAs, the RSI-MA
# EMA, the double-smoothed ATR-of-RSI EMAs) + the trailing-band machine
QQE_STATE_SCHEMA = StructType([
    StructField("last_close", DoubleType()),
    StructField("gains_buf", StringType()),
    StructField("losses_buf", StringType()),
    StructField("pg", DoubleType()),
    StructField("pl", DoubleType()),
    StructField("rsima_buf", StringType()),
    StructField("rsima_val", DoubleType()),
    StructField("prev_rsima", DoubleType()),
    StructField("maatr_buf", StringType()),
    StructField("maatr_val", DoubleType()),
    StructField("dar_buf", StringType()),
    StructField("dar_val", DoubleType()),
    StructField("started", DoubleType()),
    StructField("lb", DoubleType()),
    StructField("sb", DoubleType()),
    StructField("tr", DoubleType()),
])


def streaming_qqe(ticks: DataFrame, length: int = 14, smooth: int = 5,
                  factor: float = 4.236,
                  watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming QQE per symbol: RSI -> EMA -> double-EMA
    ATR-of-RSI -> trailing long/short band flip machine (momentum.qqe,
    pandas_ta/momentum/qqe.py#qqe), exact batch parity."""
    a_rma = 1.0 / length
    wilders = 2 * length - 1
    a_sm = 2.0 / (smooth + 1)
    a_w = 2.0 / (wilders + 1)

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            (last_close, g_s, l_s, pg, pl, rm_s, rm_v, prev_m,
             ma_s, ma_v, da_s, da_v, started_d, lb, sb, tr) = state.get
            gains, losses = _load(g_s), _load(l_s)
            pg, pl, prev_m = _opt(pg), _opt(pl), _opt(prev_m)
            rsima = _Ewm(a_sm, smooth, _load(rm_s), _opt(rm_v))
            maatr = _Ewm(a_w, wilders, _load(ma_s), _opt(ma_v))
            darw = _Ewm(a_w, wilders, _load(da_s), _opt(da_v))
            started = bool(started_d)
            lb, sb = _opt(lb), _opt(sb)
        else:
            last_close, gains, losses, pg, pl, prev_m = None, [], [], None, None, None
            rsima = _Ewm(a_sm, smooth)
            maatr = _Ewm(a_w, wilders)
            darw = _Ewm(a_w, wilders)
            started, lb, sb, tr = False, None, None, 1.0
        for pdf in _one_chunk(pdfs):
            pdf = pdf.sort_values("ts")
            rows = {k: [] for k in ("ts", "close", "qqe", "rsima",
                                    "qqel", "qqes")}
            for ts, close in zip(pdf["ts"], pdf["close"]):
                c = float(close)
                rsi = None
                if last_close is not None:
                    d = c - last_close
                    g, lo = max(d, 0.0), max(-d, 0.0)
                    if pg is None:
                        gains.append(g)
                        losses.append(lo)
                        if len(gains) >= length:
                            pg = seed_mean(gains)
                            pl = seed_mean(losses)
                    else:
                        pg = _ewm_step(a_rma, g, pg)
                        pl = _ewm_step(a_rma, lo, pl)
                    if pg is not None and (pg + pl):
                        rsi = 100.0 * pg / (pg + pl)
                m = rsima.step(rsi)
                atr_rsi = (abs(m - prev_m)
                           if m is not None and prev_m is not None else None)
                ma = maatr.step(atr_rsi)
                dv = darw.step(ma)
                dar = dv * factor if dv is not None else None
                out_q = out_l = out_s = None
                if m is not None and dar is not None:
                    nl, ns = m - dar, m + dar
                    if started:
                        # the update reads the PREVIOUS bands; the flip
                        # compares against them too (batch sequencing)
                        old_lb, old_sb = lb, sb
                        lb = max(old_lb, nl) if prev_m > old_lb else nl
                        sb = min(old_sb, ns) if prev_m < old_sb else ns
                        if m > old_sb:
                            tr = 1.0
                        elif m < old_lb:
                            tr = -1.0
                    else:
                        lb, sb = nl, ns
                        started = True
                    out_q = lb if tr == 1.0 else sb
                    out_l, out_s = lb, sb
                prev_m = m
                last_close = c
                rows["ts"].append(ts)
                rows["close"].append(c)
                rows["qqe"].append(out_q)
                rows["rsima"].append(m)
                rows["qqel"].append(out_l)
                rows["qqes"].append(out_s)
            yield pd.DataFrame({"symbol": key[0], **rows})
        state.update((
            _nan(last_close), _dump(gains[:length]), _dump(losses[:length]),
            _nan(pg), _nan(pl),
            _dump(rsima.buf), _nan(rsima.val), _nan(prev_m),
            _dump(maatr.buf), _nan(maatr.val),
            _dump(darw.buf), _nan(darw.val),
            float(started), _nan(lb), _nan(sb), tr,
        ))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update, outputStructType=QQE_OUT_SCHEMA,
        stateStructType=QQE_STATE_SCHEMA,
        outputMode="append", timeoutConf="NoTimeout")


# -------------------------------------------------------------- STC ----

STC_OUT_SCHEMA = StructType([
    StructField("symbol", StringType()),
    StructField("ts", TimestampType()),
    StructField("close", DoubleType()),
    StructField("stc", DoubleType()),
    StructField("stcmacd", DoubleType()),
    StructField("stcstoch", DoubleType()),
])

# carried: shared close seed buffer + both EMAs (macd layer), the two
# rolling min/max rings (line, pf) and the two %K smoothers
STC_STATE_SCHEMA = StructType([
    StructField("closes", StringType()),
    StructField("nseen", LongType()),
    StructField("ef", DoubleType()),
    StructField("es", DoubleType()),
    StructField("ring1", StringType()),
    StructField("prev_pf", DoubleType()),
    StructField("ring2", StringType()),
    StructField("prev_stc", DoubleType()),
])


def streaming_stc(ticks: DataFrame, tclength: int = 10, fast: int = 12,
                  slow: int = 26, factor: float = 0.5,
                  watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming Schaff Trend Cycle per symbol: grid-rounded
    MACD line -> rolling-stochastic -> %K smoother, twice (momentum.stc,
    pandas_ta/momentum/stc.py#stc). The stoch stages consume the ROUNDED
    line exactly like the batch kernel (py_round == np_round formula)."""
    from pandas_ta_spark.operators.base import py_round

    af, asl = 2.0 / (fast + 1), 2.0 / (slow + 1)

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            (cl_s, nseen, ef, es, r1_s, prev_pf, r2_s, prev_stc) = state.get
            closes = _load(cl_s)
            ef, es = _opt(ef), _opt(es)
            ring1, ring2 = _load(r1_s), _load(r2_s)
            prev_pf, prev_stc = _opt(prev_pf), _opt(prev_stc)
        else:
            closes, nseen, ef, es = [], 0, None, None
            ring1, ring2, prev_pf, prev_stc = [], [], None, None
        for pdf in _one_chunk(pdfs):
            pdf = pdf.sort_values("ts")
            rows = {k: [] for k in ("ts", "close", "stc", "stcmacd",
                                    "stcstoch")}
            for ts, close in zip(pdf["ts"], pdf["close"]):
                c = float(close)
                nseen += 1
                if ef is None or es is None:
                    closes.append(c)
                if ef is None:
                    if nseen >= fast:
                        ef = seed_mean(closes[:fast])
                else:
                    ef = _ewm_step(af, c, ef)
                if es is None:
                    if nseen >= slow:
                        es = seed_mean(closes[:slow])
                else:
                    es = _ewm_step(asl, c, es)
                # drop the seed buffer only once BOTH smoothers exist —
                # clearing at es-seed time assumed slow >= fast; with
                # fast > slow the ef seed would read a restarted buffer
                if ef is not None and es is not None and closes:
                    closes = []
                # guard BOTH smoothers: with fast > slow, es seeds
                # before ef and (None - float) would kill the query
                line = (py_round(ef - es)
                        if ef is not None and es is not None else None)
                # stage 1: rolling stoch of the line, %K-smoothed
                ring1.append(line)
                if len(ring1) > tclength:
                    ring1.pop(0)
                pf = None
                if len(ring1) == tclength and all(v is not None for v in ring1):
                    hh, ll = max(ring1), min(ring1)
                    rng = hh - ll
                    s1 = (100.0 * (line - ll) / rng if rng > 0 else
                          (prev_pf if prev_pf is not None else 0.0))
                    prev_pf = (s1 if prev_pf is None
                               else prev_pf + factor * (s1 - prev_pf))
                    pf = prev_pf
                # stage 2: rolling stoch of pf, %K-smoothed
                ring2.append(pf)
                if len(ring2) > tclength:
                    ring2.pop(0)
                out = None
                if len(ring2) == tclength and all(v is not None for v in ring2):
                    hh2, ll2 = max(ring2), min(ring2)
                    rng2 = hh2 - ll2
                    raw = (100.0 * (pf - ll2) / rng2 if rng2 > 0 else
                           (prev_stc if prev_stc is not None else 0.0))
                    prev_stc = (raw if prev_stc is None
                                else prev_stc + factor * (raw - prev_stc))
                    out = prev_stc
                rows["ts"].append(ts)
                rows["close"].append(c)
                rows["stc"].append(out)
                rows["stcmacd"].append(line)
                rows["stcstoch"].append(pf)
            yield pd.DataFrame({"symbol": key[0], **rows})
        state.update((
            # both seeds draw from this buffer: cap at the LONGER span
            # (closes[:slow] truncated the ef seed when fast > slow)
            _dump(closes[:max(fast, slow)]), nseen, _nan(ef), _nan(es),
            _dump(ring1), _nan(prev_pf), _dump(ring2), _nan(prev_stc),
        ))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update, outputStructType=STC_OUT_SCHEMA,
        stateStructType=STC_STATE_SCHEMA,
        outputMode="append", timeoutConf="NoTimeout")


# -------------------------------------------------------------- HWC ----

HWC_OUT_SCHEMA = StructType([
    StructField("symbol", StringType()),
    StructField("ts", TimestampType()),
    StructField("close", DoubleType()),
    StructField("hwm", DoubleType()),
    StructField("hwu", DoubleType()),
    StructField("hwl", DoubleType()),
])

HWC_STATE_SCHEMA = StructType([
    StructField("started", DoubleType()),
    StructField("f", DoubleType()),
    StructField("v", DoubleType()),
    StructField("a", DoubleType()),
    StructField("var", DoubleType()),
    StructField("last_price", DoubleType()),
])


def streaming_hwc(ticks: DataFrame, na: float = 0.2, nb: float = 0.1,
                  nc: float = 0.1, nd: float = 0.1, scalar: float = 1.0,
                  watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming Holt-Winter Channel per symbol (volatility.hwc,
    pandas_ta/volatility/hwc.py#hwc): the level/velocity/acceleration
    triple plus the variance channel — O(1) state, exact batch parity."""

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            started_d, last_f, last_v, last_a, var, last_price = state.get
            started = bool(started_d)
        else:
            started, last_f, last_v, last_a, var, last_price = (
                False, 0.0, 0.0, 0.0, 0.0, 0.0)
        for pdf in _one_chunk(pdfs):
            pdf = pdf.sort_values("ts")
            rows = {k: [] for k in ("ts", "close", "hwm", "hwu", "hwl")}
            for ts, close in zip(pdf["ts"], pdf["close"]):
                c = float(close)
                if not started:
                    last_f, last_price = c, c
                    started = True
                fl = (1 - na) * (last_f + last_v + 0.5 * last_a) + na * c
                v = (1 - nb) * (last_v + last_a) + nb * (fl - last_f)
                a2 = (1 - nc) * last_a + nc * (v - last_v)
                m = fl + v + 0.5 * a2
                var = (1 - nd) * var + nd * (last_price - m) ** 2
                stddev = var ** 0.5
                rows["ts"].append(ts)
                rows["close"].append(c)
                rows["hwm"].append(m)
                rows["hwu"].append(m + scalar * stddev)
                rows["hwl"].append(m - scalar * stddev)
                last_f, last_v, last_a, last_price = fl, v, a2, c
            yield pd.DataFrame({"symbol": key[0], **rows})
        state.update((float(started), last_f, last_v, last_a, var,
                      last_price))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update, outputStructType=HWC_OUT_SCHEMA,
        stateStructType=HWC_STATE_SCHEMA,
        outputMode="append", timeoutConf="NoTimeout")


# ------------------------------------------------------------- EBSW ----

EBSW_OUT_SCHEMA = StructType([
    StructField("symbol", StringType()),
    StructField("ts", TimestampType()),
    StructField("close", DoubleType()),
    StructField("ebsw", DoubleType()),
])

EBSW_STATE_SCHEMA = StructType([
    StructField("started", DoubleType()),
    StructField("last_close", DoubleType()),
    StructField("last_hp", DoubleType()),
    StructField("f0", DoubleType()),
    StructField("f1", DoubleType()),
])


def streaming_ebsw(ticks: DataFrame, length: int = 40, bars: int = 10,
                   watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming Even Better SineWave per symbol (candles.ebsw,
    pandas_ta/cycles/ebsw.py#ebsw): high-pass + 2-pole super smoother
    IIR, wave/power normalization — O(1) state, exact batch parity."""
    alpha1 = ((1 - _math.sin(2 * _math.pi / length))
              / _math.cos(2 * _math.pi / length))
    angle = _math.sqrt(2) * _math.pi / bars
    a1 = _math.exp(-angle)
    b1 = 2 * a1 * _math.cos(angle)
    c2, c3 = b1, -a1 * a1
    c1 = 1 - c2 - c3

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            started_d, last_close, last_hp, f0, f1 = state.get
            started = bool(started_d)
        else:
            started, last_close, last_hp, f0, f1 = False, 0.0, 0.0, 0.0, 0.0
        for pdf in _one_chunk(pdfs):
            pdf = pdf.sort_values("ts")
            rows = {k: [] for k in ("ts", "close", "ebsw")}
            for ts, close in zip(pdf["ts"], pdf["close"]):
                c = float(close)
                out = None
                if not started:
                    last_close = c  # batch row 0: warmup, no output
                    started = True
                else:
                    hp = (0.5 * (1 + alpha1) * (c - last_close)
                          + alpha1 * last_hp)
                    filt = c1 * (hp + last_hp) / 2 + c2 * f1 + c3 * f0
                    wave = (filt + f1 + f0) / 3
                    pwr = (filt ** 2 + f1 ** 2 + f0 ** 2) / 3
                    if pwr > 0:
                        out = wave / _math.sqrt(pwr)
                    f0, f1 = f1, filt
                    last_close, last_hp = c, hp
                rows["ts"].append(ts)
                rows["close"].append(c)
                rows["ebsw"].append(out)
            yield pd.DataFrame({"symbol": key[0], **rows})
        state.update((float(started), last_close, last_hp, f0, f1))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update, outputStructType=EBSW_OUT_SCHEMA,
        stateStructType=EBSW_STATE_SCHEMA,
        outputMode="append", timeoutConf="NoTimeout")
