"""Volatility-estimator + market-microstructure pack (beyond-reference).

Range-based OHLC volatility estimators and microstructure telemetry a
quant user of the reference would reach for next — none exist in
pandas-ta 0.3.14b (SURVEY.md §2 lists no range-based vol estimator;
``stdev``/``true_range`` are the closest), but every one is a published,
public formula:

- Parkinson (1980) high/low range variance;
- Garman & Klass (1980) OHLC variance;
- Rogers & Satchell (1991) drift-independent OHLC variance;
- Yang & Zhang (2000) overnight-gap-robust composite variance;
- Amihud (2002) illiquidity (|return| per unit of dollar volume);
- Corwin & Schultz (2012) bid-ask spread estimator from 2-bar ranges;
- Roll (1984) implied spread from the serial covariance of price
  changes;
- Hurst exponent via the aggregated-variance method (non-overlapping
  k-bar return variances regressed on ln k);
- AR(1) mean-reversion half-life of the log price;
- risk-adjusted telemetry: rolling Sharpe/Sortino and exact
  order-statistic 95% VaR/CVaR.

Cross-engine determinism follows the regime-pack playbook
(ext/relational.py BETA_SCALE rationale): every log is quantized to a
1e-6 BIGINT at the source, rolling second moments are exact-integer
window sums (associative -> identical under Spark's sequential frames
and DuckDB's segment trees), and float constants are injected as ONE
Python ``repr`` literal used by both engines with the SAME op order.
Mixed decimal-literal arithmetic is kept one-operand-double at every
step (DuckDB parses bare numeric literals as DECIMAL; ``dec * BIGINT``
stays exact decimal and its later double promotion can differ from
Spark's double multiply by 1 ulp — so expressions divide/multiply
serially against already-double values instead).

Global (per-symbol, unbounded-history) moment sums use DECIMAL(38,0) /
HUGEINT: int64 ``n * Sxx`` wraps around ~1e5 volatile bars while DuckDB
silently promotes — the r8 overflow class (see lead_lag_corr).

Scale shape: every rolling query is ONE shuffle on symbol (all window
sums share one (symbol, ts) sort); the two global regressions are the
same shuffle followed by a map-side-combinable aggregation emitting one
row per symbol. Nothing collects; nothing cross-joins.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandas_ta_spark.ext import ExtQuery
from pandas_ta_spark.operators.base import round_col, sql_round
from pandas_ta_spark.sources.bars import bars_from_events_cached, with_bars_cte

MS_N = 20            # rolling estimator window (bars)
MS_SCALE = 1e6       # 1e-6 log quantization: |ln| <= ~10.6 on the
                     # synthetic bars -> |q| <= 1.1e7, q^2 <= 1.2e14,
                     # 20-row sums <= 2.4e15, n*S forms <= 4.9e16 — all
                     # comfortably inside int64 (BETA_SCALE class bounds)
ILLIQ_SCALE = 1e9    # Amihud per-bar ratio quantization (|r|/dv <= ~900
                     # here -> 9e11; 20-row sum 1.8e13, int64-safe)
ILLIQ_MAX = 9e9      # per-bar ratio cap: 9e9 * ILLIQ_SCALE = 9e18 stays
                     # inside int64 (Spark's non-ANSI overflow cast
                     # SATURATES where DuckDB errors — see amihud)
I64_BAR_MAX = 9e18  # per-bar magnitude guard before a ::long quantize:
                    # Spark's non-ANSI cast SATURATES to Long.MAX past
                    # 2^63 (silently poisoning sums) while DuckDB errors
                    # — the same trap class ILLIQ_MAX/SPREAD_MAX close
KYLE_VOL_MAX = 1e17  # kyle-specific per-bar |sv| cap: the SECOND moments
                     # must fit the 128-bit accumulators, not just sv
                     # itself in int64. With MS_N=20, |sv| < 1e17 bounds
                     # |sx| <= 2e18, so sx*sx and n*sxx <= 4e36 — inside
                     # decimal(38,0) (~1e38; non-ANSI Spark silently
                     # NULLs past it) AND DuckDB HUGEINT (~1.7e38; hard
                     # error) with >=20x margin, while the streaming twin's
                     # unbounded python ints agree by construction. Under
                     # the bare I64_BAR_MAX guard, volumes >= ~6.5e17
                     # opened a three-way saturate-vs-error-vs-value
                     # divergence (ADVICE r9). Pinned cross-engine in
                     # tests/test_guard_primitives.py.
CS_SCALE = 1e8       # Corwin-Schultz spread quantization: spreads are
                     # O(1e-3..0.5); 1e-8 resolution keeps the documented
                     # exp() 1-ulp cross-engine risk ~1e-5 per sf0.1 run
FOURLN2_N = 4.0 * math.log(2.0) * MS_N       # Parkinson denominator
GK_C2 = 2.0 * math.log(2.0) - 1.0            # Garman-Klass close-open term
YZ_K = 0.34 / (1.34 + (MS_N + 1) / (MS_N - 1))  # Yang-Zhang blend weight
CS_DEN = 3.0 - 2.0 * math.sqrt(2.0)          # Corwin-Schultz alpha denom
CS_DENQ = CS_DEN * MS_SCALE                  # same, in 1e-6-quant units
LN2 = 0.6931471805599453

_WS_SQL = "PARTITION BY symbol ORDER BY ts"
_WR_SQL = f"{_WS_SQL} ROWS BETWEEN {MS_N - 1} PRECEDING AND CURRENT ROW"


def _ws():
    return Window.partitionBy("symbol").orderBy("ts")


def _wr():
    return _ws().rowsBetween(-(MS_N - 1), 0)


def _q(col):
    """Quantize a log-space double to the exact 1e-6 BIGINT grid."""
    return F.floor(col * F.lit(MS_SCALE) + F.lit(0.5)).cast("long")


def _sql_q(e: str) -> str:
    return f"CAST(floor(({e}) * {MS_SCALE!r} + 0.5) AS BIGINT)"


def _qlog(num, den):
    """Quantized ln(num/den), NULL unless BOTH sides are strictly
    positive and non-NaN. The guard is load-bearing cross-engine
    semantics, not defensive style: sf0.1 bars contain zero lows, and
    there ln(0/close) ERRORS in DuckDB ("cannot take logarithm of
    zero") while Spark's ANSI-off log/division silently yield NULL —
    the engines diverge exactly on the dirty rows. NaN needs its OWN
    leg because NaN > 0 is TRUE in both engines, and an unguarded NaN
    diverges three ways: Spark floor(NaN)::long is silently 0 (a fake
    zero return in every window), DuckDB's BIGINT cast hard-errors,
    and the streaming twins' isfinite check drops the row. +inf needs
    ITS own leg too (inf > 0 is true, ln(inf) is inf, and the BIGINT
    cast saturates in Spark / errors in DuckDB — same class); a
    num != inf test excludes it exactly (inf = inf in both engines'
    total order, and -inf already fails > 0). With the shared guard a
    non-positive, NaN or infinite price makes the row invalid (joins
    no window sum) in BOTH engines, matching the streaming _lnq."""
    return _q(_glog(num, den))


def _glog(num, den):
    """Guarded UNQUANTIZED ln(num/den) — the same legs as _qlog (whose
    docstring carries the full cross-engine rationale) for call sites
    that keep the return in double space (e.g. signal_equity's
    strat_ret). A failed guard yields NULL, which quantization
    (floor/cast of NULL) also maps to NULL — so _qlog == _q(_glog).

    The RATIO gets its own guard legs: two individually-finite positive
    sides can still overflow the double division (1e308/1e-320 -> inf,
    where ln(inf)=inf saturates Spark's ::long while DuckDB's CAST
    errors) or underflow it (1e-320/1e308 -> 0, where ln(0) is NULL in
    Spark and a hard error in DuckDB) — found by the adversarial
    primitive-parity test, not by any corpus.

    The ratio uses try_divide, NOT the / operator: the division now
    sits in the WHEN condition (evaluated on every row, unlike the old
    then-branch-only division), and under Spark 4's DEFAULT ANSI mode a
    bare close/0.0 there aborts the whole query, where the engine's
    documented posture (load_table sets ansi=false) and DuckDB both
    yield NULL — try_divide is NULL in both modes."""
    inf = F.lit(float("inf"))
    r = F.try_divide(num, den)
    return F.when((num > F.lit(0)) & (den > F.lit(0))
                  & ~F.isnan(num) & ~F.isnan(den)
                  & (num != inf) & (den != inf)
                  & (r > F.lit(0)) & (r != inf),
                  F.log(r))


def _sql_qlog(num: str, den: str) -> str:
    """DuckDB twin of _qlog (CASE short-circuits, so ln never sees a
    non-positive argument; a NULL side compares NULL -> not-true)."""
    return _sql_q(_sql_glog(num, den))


def _sql_glog(num: str, den: str) -> str:
    """DuckDB twin of _glog (incl. the ratio overflow/underflow legs).
    _sql_q over the whole CASE keeps NULL rows NULL (floor/CAST of
    NULL), so _sql_qlog composes exactly."""
    return (f"(CASE WHEN ({num}) > 0 AND ({den}) > 0 "
            f"AND isfinite({num}) AND isfinite({den}) "
            f"AND ({num}) / ({den}) > 0 "
            f"AND isfinite(({num}) / ({den})) THEN "
            f"ln(({num}) / ({den})) END)")


def _qx_close():
    """Quantized guarded ln(close) — the log-PRICE (not ratio) variant
    of _qlog, single-sourced for ar1/pair/mdd (the e652874 inf-guard
    fix had to be hand-applied to each inlined copy; never again)."""
    return F.when((F.col("close") > 0) & ~F.isnan(F.col("close"))
                  & (F.col("close") != F.lit(float("inf"))),
                  _q(F.log(F.col("close"))))


_SQL_QX_CLOSE = (f"CASE WHEN close > 0 AND isfinite(close) "
                 f"THEN {_sql_q('ln(close)')} END")


# ------------------------------------------------------- Parkinson ----

def parkinson(bars: DataFrame, length: int = MS_N) -> DataFrame:
    """Parkinson (1980) range volatility: sigma_P over the trailing
    ``length`` bars = sqrt( sum(ln(high/low)^2) / (4 ln2 * n) ).

    qu = 1e-6-quantized ln(high/low) >= 0; the rolling sum of qu^2 is
    exact-integer, and the emission is two serial double divisions by a
    shared repr literal — identical in both engines. ONE shuffle on
    symbol."""
    assert length == MS_N, "oracle twin is generated for MS_N"
    qu = _qlog(F.col("high"), F.col("low"))
    df = bars.select("symbol", "ts", qu.alias("qu"))
    wr = _wr()
    n = F.count("qu").over(wr)
    su2 = F.sum(F.col("qu") * F.col("qu")).over(wr)
    # var in q^2 units: su2 / (4 ln2 * n), computed as su2/C/n with C the
    # single double literal (keeps every intermediate a double op)
    vol = F.when(
        n >= length,
        F.sqrt(su2.cast("double") / F.lit(FOURLN2_N)) / F.lit(MS_SCALE),
    )
    return df.select(
        "symbol", "ts", n.cast("long").alias("n_obs"),
        round_col(vol).alias("vol_p"),
    )


def _parkinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parkinson(bars_from_events_cached(spark, sf_dir))


PARKINSON_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, ts, {_sql_qlog('high', 'low')} AS qu
    FROM bars
),
acc AS (
    SELECT symbol, ts,
           count(qu) OVER w AS n,
           sum(qu * qu) OVER w AS su2
    FROM r
    WINDOW w AS ({_WR_SQL})
)
SELECT symbol, ts, CAST(n AS BIGINT) AS n_obs,
       {sql_round(f"CASE WHEN n >= {MS_N} THEN "
                  f"sqrt(CAST(su2 AS DOUBLE) / {FOURLN2_N!r}) "
                  f"/ {MS_SCALE!r} END")} AS vol_p
FROM acc
""".strip())


# ----------------------------------------------------- Garman-Klass ----

def garman_klass(bars: DataFrame, length: int = MS_N) -> DataFrame:
    """Garman & Klass (1980) OHLC volatility over the trailing window:
    var = mean( 0.5*ln(h/l)^2 - (2 ln2 - 1)*ln(c/o)^2 ).

    Two quantized series (qu = ln(h/l), qv = ln(c/o)) with a shared
    validity guard (qu*qv NULL-propagation) so n counts complete rows;
    both squared sums are exact integers; the estimator itself can go
    negative on gap-dominated windows — emitted NULL then (documented
    estimator domain, deterministic: the sign test runs on identical
    doubles)."""
    assert length == MS_N
    qu = _qlog(F.col("high"), F.col("low"))
    qv = _qlog(F.col("close"), F.col("open"))
    df = bars.select("symbol", "ts", qu.alias("qu"), qv.alias("qv"))
    wr = _wr()
    pair = F.col("qu") * F.col("qv")
    n = F.count(pair).over(wr)
    su2 = F.sum(F.when(pair.isNotNull(), F.col("qu") * F.col("qu"))).over(wr)
    sv2 = F.sum(F.when(pair.isNotNull(), F.col("qv") * F.col("qv"))).over(wr)
    var_q = (su2.cast("double") * F.lit(0.5)
             - sv2.cast("double") * F.lit(GK_C2)) / n
    vol = F.when(
        (n >= length) & (var_q > 0), F.sqrt(var_q) / F.lit(MS_SCALE))
    return df.select(
        "symbol", "ts", n.cast("long").alias("n_obs"),
        round_col(vol).alias("vol_gk"),
    )


def _garman_klass(spark: SparkSession, sf_dir: str) -> DataFrame:
    return garman_klass(bars_from_events_cached(spark, sf_dir))


GARMAN_KLASS_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, ts,
           {_sql_qlog('high', 'low')} AS qu,
           {_sql_qlog('close', 'open')} AS qv
    FROM bars
),
acc AS (
    SELECT symbol, ts,
           count(qu * qv) OVER w AS n,
           sum(CASE WHEN qu * qv IS NOT NULL THEN qu * qu END) OVER w AS su2,
           sum(CASE WHEN qu * qv IS NOT NULL THEN qv * qv END) OVER w AS sv2
    FROM r
    WINDOW w AS ({_WR_SQL})
),
v AS (
    SELECT symbol, ts, n,
           (CAST(su2 AS DOUBLE) * 0.5
            - CAST(sv2 AS DOUBLE) * {GK_C2!r}) / n AS var_q
    FROM acc
)
SELECT symbol, ts, CAST(n AS BIGINT) AS n_obs,
       {sql_round(f"CASE WHEN n >= {MS_N} AND var_q > 0 "
                  f"THEN sqrt(var_q) / {MS_SCALE!r} END")} AS vol_gk
FROM v
""".strip())


# -------------------------------------------------- Rogers-Satchell ----

def rogers_satchell(bars: DataFrame, length: int = MS_N) -> DataFrame:
    """Rogers & Satchell (1991) drift-independent OHLC volatility:
    var = mean( ln(h/c)ln(h/o) + ln(l/c)ln(l/o) ).

    All four logs are quantized; each per-bar term is a product of two
    BIGINTs (exact, and non-negative by construction: both h-terms >= 0,
    both l-terms <= 0), so the rolling sum is an exact non-negative
    integer and the emission is serial double division + sqrt."""
    assert length == MS_N
    hc = _qlog(F.col("high"), F.col("close"))
    ho = _qlog(F.col("high"), F.col("open"))
    lc = _qlog(F.col("low"), F.col("close"))
    lo = _qlog(F.col("low"), F.col("open"))
    rs = hc * ho + lc * lo
    df = bars.select("symbol", "ts", rs.alias("rs"))
    wr = _wr()
    n = F.count("rs").over(wr)
    srs = F.sum("rs").over(wr)
    vol = F.when(
        n >= length,
        F.sqrt(srs.cast("double") / n) / F.lit(MS_SCALE),
    )
    return df.select(
        "symbol", "ts", n.cast("long").alias("n_obs"),
        round_col(vol).alias("vol_rs"),
    )


def _rogers_satchell(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rogers_satchell(bars_from_events_cached(spark, sf_dir))


ROGERS_SATCHELL_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, ts,
           {_sql_qlog('high', 'close')} * {_sql_qlog('high', 'open')}
           + {_sql_qlog('low', 'close')} * {_sql_qlog('low', 'open')} AS rs
    FROM bars
),
acc AS (
    SELECT symbol, ts,
           count(rs) OVER w AS n,
           sum(rs) OVER w AS srs
    FROM r
    WINDOW w AS ({_WR_SQL})
)
SELECT symbol, ts, CAST(n AS BIGINT) AS n_obs,
       {sql_round(f"CASE WHEN n >= {MS_N} THEN "
                  f"sqrt(CAST(srs AS DOUBLE) / n) / {MS_SCALE!r} END")} AS vol_rs
FROM acc
""".strip())


# ------------------------------------------------------ Yang-Zhang ----

def yang_zhang(bars: DataFrame, length: int = MS_N) -> DataFrame:
    """Yang & Zhang (2000) composite volatility — the
    overnight-gap-robust estimator: var = Vo + k*Vc + (1-k)*Vrs, with
    Vo = sample var of the overnight return ln(open/prev_close),
    Vc = sample var of ln(close/open), Vrs the Rogers-Satchell mean,
    and k = 0.34 / (1.34 + (n+1)/(n-1)) at the fixed window length.

    One shared validity guard (overnight lag + all logs present) keeps
    every count/sum on the same row set; all moments are exact-int
    window sums; k and (1-k) are single repr literals multiplied against
    already-double variances in the same order on both engines."""
    assert length == MS_N
    ws, wr = _ws(), _wr()
    qo = _qlog(F.col("open"), F.lag("close").over(ws))
    qc = _qlog(F.col("close"), F.col("open"))
    hc = _qlog(F.col("high"), F.col("close"))
    ho = _qlog(F.col("high"), F.col("open"))
    lc = _qlog(F.col("low"), F.col("close"))
    lo = _qlog(F.col("low"), F.col("open"))
    rs = hc * ho + lc * lo
    df = bars.select(
        "symbol", "ts", qo.alias("qo"), qc.alias("qc"), rs.alias("rs"))
    v = F.when(
        F.col("qo").isNotNull() & F.col("qc").isNotNull()
        & F.col("rs").isNotNull(), F.lit(1))
    df = df.select("symbol", "ts", "qo", "qc", "rs", v.alias("v"))
    n = F.count("v").over(wr)
    so = F.sum(F.when(F.col("v").isNotNull(), F.col("qo"))).over(wr)
    qo2 = F.sum(F.when(F.col("v").isNotNull(),
                       F.col("qo") * F.col("qo"))).over(wr)
    sc = F.sum(F.when(F.col("v").isNotNull(), F.col("qc"))).over(wr)
    qc2 = F.sum(F.when(F.col("v").isNotNull(),
                       F.col("qc") * F.col("qc"))).over(wr)
    srs = F.sum(F.when(F.col("v").isNotNull(), F.col("rs"))).over(wr)
    vo = (n * qo2 - so * so).cast("double") / (n * (n - F.lit(1)))
    vc = (n * qc2 - sc * sc).cast("double") / (n * (n - F.lit(1)))
    vrs = srs.cast("double") / n
    var_q = vo + vc * F.lit(YZ_K) + vrs * F.lit(1.0 - YZ_K)
    vol = F.when(
        (n >= length) & (var_q > 0), F.sqrt(var_q) / F.lit(MS_SCALE))
    return df.select(
        "symbol", "ts", n.cast("long").alias("n_obs"),
        round_col(vol).alias("vol_yz"),
    )


def _yang_zhang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return yang_zhang(bars_from_events_cached(spark, sf_dir))


YANG_ZHANG_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, ts,
           {_sql_qlog('open', f'lag(close) OVER ({_WS_SQL})')} AS qo,
           {_sql_qlog('close', 'open')} AS qc,
           {_sql_qlog('high', 'close')} * {_sql_qlog('high', 'open')}
           + {_sql_qlog('low', 'close')} * {_sql_qlog('low', 'open')} AS rs
    FROM bars
),
g AS (
    SELECT symbol, ts, qo, qc, rs,
           CASE WHEN qo IS NOT NULL AND qc IS NOT NULL
                     AND rs IS NOT NULL THEN 1 END AS v
    FROM r
),
acc AS (
    SELECT symbol, ts,
           count(v) OVER w AS n,
           sum(CASE WHEN v IS NOT NULL THEN qo END) OVER w AS so,
           sum(CASE WHEN v IS NOT NULL THEN qo * qo END) OVER w AS qo2,
           sum(CASE WHEN v IS NOT NULL THEN qc END) OVER w AS sc,
           sum(CASE WHEN v IS NOT NULL THEN qc * qc END) OVER w AS qc2,
           sum(CASE WHEN v IS NOT NULL THEN rs END) OVER w AS srs
    FROM g
    WINDOW w AS ({_WR_SQL})
),
v AS (
    SELECT symbol, ts, n,
           CAST(n * qo2 - so * so AS DOUBLE) / (n * (n - 1))
           + CAST(n * qc2 - sc * sc AS DOUBLE) / (n * (n - 1)) * {YZ_K!r}
           + CAST(srs AS DOUBLE) / n * {1.0 - YZ_K!r} AS var_q
    FROM acc
)
SELECT symbol, ts, CAST(n AS BIGINT) AS n_obs,
       {sql_round(f"CASE WHEN n >= {MS_N} AND var_q > 0 "
                  f"THEN sqrt(var_q) / {MS_SCALE!r} END")} AS vol_yz
FROM v
""".strip())


# ---------------------------------------------------------- Amihud ----

def amihud(bars: DataFrame, length: int = MS_N) -> DataFrame:
    """Amihud (2002) illiquidity over the trailing window:
    ILLIQ = mean( |r_t| / (close_t * volume_t) ).

    The per-bar ratio is a chain of deterministic double ops over the
    quantized |return| and the double dollar volume, then itself
    quantized to the 1e-9 grid so the rolling MEAN is an exact-integer
    sum (a raw double rolling sum is order-dependent: Spark's sequential
    frame vs DuckDB's segment tree disagree in the last ulp).

    Validity: the row needs a valid return (aq), a strictly-positive
    non-NaN dollar volume, AND a quantized ratio inside int64 — a
    near-zero dv pushes ratio*1e9 past 2^63, where Spark's non-ANSI
    cast SATURATES to Long.MAX (poisoning the rolling sum) while DuckDB
    errors; ILLIQ_MAX makes such bars invalid in both engines (an
    effectively untradeable bar carries no liquidity signal anyway)."""
    assert length == MS_N
    ws, wr = _ws(), _wr()
    aq = F.abs(_qlog(F.col("close"), F.lag("close").over(ws)))
    dv = F.col("close") * F.col("volume")  # dv == 0 divides to NULL in
    # BOTH engines (probed: DuckDB x/0.0 and Spark ANSI-off agree)
    ratio = (aq.cast("double") / F.lit(MS_SCALE)) / dv
    iq = F.when(
        (dv > F.lit(0)) & ~F.isnan(dv) & (dv != F.lit(float("inf")))
        & (ratio < F.lit(ILLIQ_MAX)),
        F.floor(ratio * F.lit(ILLIQ_SCALE) + F.lit(0.5)).cast("long"))
    df = bars.select("symbol", "ts", iq.alias("iq"))
    n = F.count("iq").over(wr)
    s = F.sum("iq").over(wr)
    illiq = F.when(
        n >= length, s.cast("double") / n / F.lit(ILLIQ_SCALE))
    return df.select(
        "symbol", "ts", n.cast("long").alias("n_obs"),
        round_col(illiq, 9).alias("illiq"),
    )


def _amihud(spark: SparkSession, sf_dir: str) -> DataFrame:
    return amihud(bars_from_events_cached(spark, sf_dir))


AMIHUD_SQL = with_bars_cte(f"""
, q AS (
    SELECT symbol, ts, close * volume AS dv,
           (CAST(abs({_sql_qlog('close', f'lag(close) OVER ({_WS_SQL})')})
                 AS DOUBLE) / {MS_SCALE!r}) / (close * volume) AS ratio
    FROM bars
),
r AS (
    SELECT symbol, ts,
           CASE WHEN dv > 0 AND isfinite(dv) AND ratio < {ILLIQ_MAX!r}
                THEN CAST(floor(ratio * {ILLIQ_SCALE!r} + 0.5) AS BIGINT)
           END AS iq
    FROM q
),
acc AS (
    SELECT symbol, ts,
           count(iq) OVER w AS n,
           sum(iq) OVER w AS s
    FROM r
    WINDOW w AS ({_WR_SQL})
)
SELECT symbol, ts, CAST(n AS BIGINT) AS n_obs,
       {sql_round(f"CASE WHEN n >= {MS_N} THEN "
                  f"CAST(s AS DOUBLE) / n / {ILLIQ_SCALE!r} END", 9)} AS illiq
FROM acc
""".strip())


# ------------------------------------------------------- Kyle's lambda ----

def kyle_lambda(bars: DataFrame, length: int = MS_N) -> DataFrame:
    """Kyle (1985) lambda — rolling price impact: the OLS slope of the
    quantized log return dp on tick-rule signed volume sv =
    sign(dp) * floor(volume) over the trailing MS_N bars. The inverse
    market-depth estimate that complements `amihud_illiq_20` (impact
    per unit signed flow rather than per dollar traded); bars have no
    trade signs, so the tick rule signs the bar's own return — the
    standard low-frequency proxy.

    Exactness: dp is on the shared 1e-6 log grid (_qlog guard: a
    zero/NaN/inf close invalidates the bar in BOTH engines); sv is an
    exact BIGINT (floor(volume), guarded finite/non-negative and
    < KYLE_VOL_MAX — a dirty volume invalidates the pair without
    touching dp's own validity). Second moments accumulate in
    DECIMAL(38,0)/HUGEINT, NOT int64: volume magnitude is unbounded at
    100 TB (1e9-share bars put sv^2 at 1e18, the int64 wrap class of
    trap #6), unlike the bounded 24-row log-quant kernels — and the
    KYLE_VOL_MAX cap in turn keeps sx*sx / n*sxx inside THOSE 128-bit
    accumulators (see the constant's derivation).
    lambda = (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2) / 1e6
    is ONE double division of exact integers (division first, then the
    grid descale), reported on the 1e-12 grid — lambda lives at
    ~1e-7 ln-price per unit volume, far below the default 1e-6 grid.

    Plan: ONE shuffle on symbol; the sign lag, pair masks, and all five
    rolling sums share the same (symbol, ts) sort."""
    assert length == MS_N
    ws, wr = _ws(), _wr()
    dp = _qlog(F.col("close"), F.lag("close").over(ws))
    # the < KYLE_VOL_MAX leg closes BOTH saturate-vs-error traps: a
    # finite volume >= 2^63 would saturate Spark's non-ANSI ::long while
    # the DuckDB twin's CAST hard-errors, and a volume >= ~6.5e17 keeps
    # sv itself int64-clean but overflows the sx*sx / n*sxx second
    # moments (decimal(38,0) silent-NULL vs HUGEINT hard-error vs the
    # streaming twin's real python-int value — ADVICE r9)
    vol_ok = ((F.col("volume") >= 0) & ~F.isnan(F.col("volume"))
              & (F.col("volume") < F.lit(KYLE_VOL_MAX)))
    sv = F.when(vol_ok,
                F.signum(dp.cast("double")).cast("long")
                * F.floor(F.col("volume")).cast("long"))
    df = bars.select("symbol", "ts", dp.alias("dp"), sv.alias("sv"))
    d38 = "decimal(38,0)"
    pair = F.col("sv").isNotNull()  # sv valid => dp valid (sign(NULL)=NULL)
    n = F.count(F.when(pair, 1)).over(wr)
    sx = F.sum(F.when(pair, F.col("sv")).cast(d38)).over(wr)
    sy = F.sum(F.when(pair, F.col("dp")).cast(d38)).over(wr)
    sxy = F.sum(F.when(pair, F.col("sv")).cast(d38) * F.col("dp")).over(wr)
    sxx = F.sum(F.when(pair, F.col("sv")).cast(d38) * F.col("sv")).over(wr)
    nd = n.cast(d38)
    cov_s = nd * sxy - sx * sy
    var_s = nd * sxx - sx * sx
    lam = F.when(
        (n >= length) & (var_s > 0),
        (cov_s.cast("double") / var_s.cast("double")) / F.lit(MS_SCALE))
    return df.select(
        "symbol", "ts", n.cast("long").alias("n_obs"),
        round_col(lam, 12).alias("kyle_lambda"),
    )


def _kyle_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kyle_lambda(bars_from_events_cached(spark, sf_dir))


KYLE_LAMBDA_SQL = with_bars_cte(f"""
, d AS (
    SELECT symbol, ts,
           {_sql_qlog('close', f'lag(close) OVER ({_WS_SQL})')} AS dp,
           CASE WHEN volume >= 0 AND NOT isnan(volume)
                     AND volume < {KYLE_VOL_MAX!r}
                THEN CAST(sign({_sql_qlog('close',
                                          f'lag(close) OVER ({_WS_SQL})')})
                          AS BIGINT)
                     * CAST(floor(volume) AS BIGINT)
           END AS sv
    FROM bars
),
acc AS (
    SELECT symbol, ts,
           count(CASE WHEN sv IS NOT NULL THEN 1 END) OVER w AS n,
           sum(CASE WHEN sv IS NOT NULL
                    THEN CAST(sv AS HUGEINT) END) OVER w AS sx,
           sum(CASE WHEN sv IS NOT NULL
                    THEN CAST(dp AS HUGEINT) END) OVER w AS sy,
           sum(CASE WHEN sv IS NOT NULL
                    THEN CAST(sv AS HUGEINT) * dp END) OVER w AS sxy,
           sum(CASE WHEN sv IS NOT NULL
                    THEN CAST(sv AS HUGEINT) * sv END) OVER w AS sxx
    FROM d
    WINDOW w AS ({_WR_SQL})
)
SELECT symbol, ts, CAST(n AS BIGINT) AS n_obs,
       {sql_round(f"CASE WHEN n >= {MS_N} AND n * sxx - sx * sx > 0 THEN "
                  "(CAST(n * sxy - sx * sy AS DOUBLE) "
                  "/ CAST(n * sxx - sx * sx AS DOUBLE)) "
                  f"/ {MS_SCALE!r} END", 12)} AS kyle_lambda
FROM acc
""".strip())


# -------------------------------------------------- Corwin-Schultz ----

def corwin_schultz(bars: DataFrame, length: int = MS_N) -> DataFrame:
    """Corwin & Schultz (2012) 2-bar high-low spread estimator plus its
    trailing-window mean.

    beta = ln(h/l)^2 summed over the bar pair; gamma = the 2-bar-span
    range squared; alpha = (sqrt(2b)-sqrt(b))/(3-2*sqrt(2)) -
    sqrt(g/(3-2*sqrt(2))); S = 2(e^a - 1)/(1 + e^a), floored at 0 (the
    standard negative-spread treatment). All inputs are quantized ints,
    every float step is the same op chain in both engines; exp() is not
    IEEE-correctly-rounded, so the spread is quantized at 1e-8 (flip
    risk ~1e-5 per sf0.1 run — the documented ln-class caveat). The mean
    is then an exact-integer rolling sum."""
    assert length == MS_N
    ws, wr = _ws(), _wr()
    qu = _qlog(F.col("high"), F.col("low"))
    qup = F.lag(qu).over(ws)
    hh = F.greatest(F.col("high"), F.lag("high").over(ws))
    ll = F.least(F.col("low"), F.lag("low").over(ws))
    qg = _qlog(hh, ll)
    bq = qu * qu + qup * qup
    gq = qg * qg
    alpha = (
        (F.sqrt(bq.cast("double") * F.lit(2.0)) - F.sqrt(bq.cast("double")))
        / F.lit(CS_DENQ)
        - F.sqrt(gq.cast("double") / F.lit(CS_DEN)) / F.lit(MS_SCALE)
    )
    ea = F.exp(alpha)
    # explicit NULL guard: greatest(NULL, 0.0) is 0.0 in BOTH engines
    # (NULL-skipping greatest), which would turn the pair-less first bar
    # into a spurious zero spread instead of a warm-up NULL
    spread = F.when(
        alpha.isNotNull(),
        F.greatest(
            (ea - F.lit(1.0)) * F.lit(2.0) / (F.lit(1.0) + ea), F.lit(0.0)))
    sq = F.floor(spread * F.lit(CS_SCALE) + F.lit(0.5)).cast("long")
    df = bars.select("symbol", "ts", sq.alias("sq"))
    n = F.count("sq").over(wr)
    s = F.sum("sq").over(wr)
    cs = F.col("sq").cast("double") / F.lit(CS_SCALE)
    ma = F.when(n >= length, s.cast("double") / n / F.lit(CS_SCALE))
    return df.select(
        "symbol", "ts", n.cast("long").alias("n_obs"),
        round_col(cs, 8).alias("cs_spread"),
        round_col(ma, 8).alias("cs_spread_ma"),
    )


def _corwin_schultz(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corwin_schultz(bars_from_events_cached(spark, sf_dir))


CORWIN_SCHULTZ_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, ts,
           {_sql_qlog('high', 'low')} AS qu,
           lag({_sql_qlog('high', 'low')}) OVER ({_WS_SQL}) AS qup,
           {_sql_qlog(f"greatest(high, lag(high) OVER ({_WS_SQL}))",
                      f"least(low, lag(low) OVER ({_WS_SQL}))")} AS qg
    FROM bars
),
a AS (
    SELECT symbol, ts,
           (sqrt(CAST(qu * qu + qup * qup AS DOUBLE) * 2.0)
            - sqrt(CAST(qu * qu + qup * qup AS DOUBLE))) / {CS_DENQ!r}
           - sqrt(CAST(qg * qg AS DOUBLE) / {CS_DEN!r}) / {MS_SCALE!r}
           AS alpha
    FROM r
),
s AS (
    SELECT symbol, ts,
           CAST(floor(
               CASE WHEN alpha IS NOT NULL THEN
                   greatest((exp(alpha) - 1.0) * 2.0 / (1.0 + exp(alpha)),
                            0.0)
               END * {CS_SCALE!r} + 0.5) AS BIGINT) AS sq
    FROM a
),
acc AS (
    SELECT symbol, ts, sq,
           count(sq) OVER w AS n,
           sum(sq) OVER w AS s
    FROM s
    WINDOW w AS ({_WR_SQL})
)
SELECT symbol, ts, CAST(n AS BIGINT) AS n_obs,
       {sql_round(f"CAST(sq AS DOUBLE) / {CS_SCALE!r}", 8)} AS cs_spread,
       {sql_round(f"CASE WHEN n >= {MS_N} THEN "
                  f"CAST(s AS DOUBLE) / n / {CS_SCALE!r} END", 8)}
       AS cs_spread_ma
FROM acc
""".strip())


# -------------------------------------------- Hurst (aggregated var) ----

HURST_KS = (1, 2, 4, 8, 16)
_HURST_X = [math.log(float(k)) for k in HURST_KS]
_HURST_SX = math.fsum(_HURST_X)
_HURST_DEN = len(HURST_KS) * math.fsum(x * x for x in _HURST_X) \
    - _HURST_SX * _HURST_SX
HURST_MIN_NK = 8  # each k-horizon needs a usable variance


def _hurst_slope_expr(ys, lit):
    """Shared OLS-slope construction: ys are the 5 ln-variance terms
    (engine columns or SQL strings); returns slope/2. Left-associated
    fixed-order sums — no data-dependent float ordering."""
    sxy = None
    sy = None
    for x, y in zip(_HURST_X, ys):
        t = y * lit(x)
        sxy = t if sxy is None else sxy + t
        sy = y if sy is None else sy + y
    slope = (sxy * lit(float(len(HURST_KS))) - sy * lit(_HURST_SX)) \
        / lit(_HURST_DEN)
    return slope / lit(2.0)


def hurst_aggvar(bars: DataFrame) -> DataFrame:
    """Hurst exponent per symbol via the aggregated-variance method:
    variance of NON-OVERLAPPING k-bar log returns for k in
    {1,2,4,8,16}, then H = OLS-slope of ln var(k) on ln k over the five
    points, halved. H ~ 0.5 random walk, > 0.5 persistent, < 0.5
    anti-persistent — long-memory telemetry over the whole history.

    Non-overlap: row_number % k == 0 keeps one k-return per disjoint
    span (identical tie-free ordering both engines — ts is unique per
    symbol). Global moment sums are DECIMAL(38,0)/HUGEINT (unbounded
    history — the int64-wrap class); each variance is one double
    division of exact 128-bit ints, the regression is a fixed
    5-term expression with repr-literal x values. One shuffle, one row
    per symbol."""
    ws = _ws()
    rn = F.row_number().over(ws)
    cols = ["symbol"]
    d38 = "decimal(38,0)"
    sel = bars.select(
        "symbol", "ts", "close", rn.alias("rn"),
        *[F.lag("close", k).over(ws).alias(f"c{k}") for k in HURST_KS])
    for k in HURST_KS:
        qk = F.when(
            F.col("rn") % k == 0,
            _qlog(F.col("close"), F.col(f"c{k}")))
        sel = sel.withColumn(f"q{k}", qk)
    aggs = [F.count(F.lit(1)).alias("n_bars")]
    for k in HURST_KS:
        qk = F.col(f"q{k}")
        aggs += [
            F.count(qk).alias(f"n{k}"),
            F.sum(qk.cast(d38)).alias(f"s{k}"),
            F.sum((qk * qk).cast(d38)).alias(f"p{k}"),
        ]
    g = sel.groupBy("symbol").agg(*aggs)
    ys = []
    ok = None
    for k in HURST_KS:
        n = F.col(f"n{k}")
        var_k = (n.cast(d38) * F.col(f"p{k}")
                 - F.col(f"s{k}") * F.col(f"s{k}")).cast("double") \
            / (n * (n - F.lit(1)))
        cond = (n >= HURST_MIN_NK) & (var_k > 0)
        ok = cond if ok is None else (ok & cond)
        ys.append(F.log(var_k))
    h = F.when(ok, _hurst_slope_expr(ys, F.lit))
    return g.select(
        "symbol", F.col("n_bars").cast("long").alias("n_bars"),
        round_col(h).alias("hurst"),
    )


def _hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hurst_aggvar(bars_from_events_cached(spark, sf_dir))


def _hurst_sql() -> str:
    qcols = ",\n           ".join(
        f"CASE WHEN rn % {k} = 0 THEN "
        f"{_sql_qlog('close', f'lag(close, {k}) OVER ({_WS_SQL})')} END AS q{k}"
        for k in HURST_KS)
    aggs = ",\n           ".join(
        f"count(q{k}) AS n{k}, sum(CAST(q{k} AS HUGEINT)) AS s{k}, "
        f"sum(CAST(q{k} AS HUGEINT) * q{k}) AS p{k}"
        for k in HURST_KS)
    vars_ = ",\n           ".join(
        f"CAST(n{k} * p{k} - s{k} * s{k} AS DOUBLE) / (n{k} * (n{k} - 1)) "
        f"AS v{k}"
        for k in HURST_KS)
    ok = " AND ".join(
        f"n{k} >= {HURST_MIN_NK} AND v{k} > 0" for k in HURST_KS)

    class _S(str):
        def __mul__(self, o):
            return _S(f"({self}) * ({o})")

        def __add__(self, o):
            return _S(f"({self}) + ({o})")

        def __sub__(self, o):
            return _S(f"({self}) - ({o})")

        def __truediv__(self, o):
            return _S(f"({self}) / ({o})")

    slope = _hurst_slope_expr(
        [_S(f"ln(v{k})") for k in HURST_KS], lambda x: _S(repr(x)))
    return with_bars_cte(f"""
, r AS (
    SELECT symbol, ts, close,
           row_number() OVER ({_WS_SQL}) AS rn,
           {qcols}
    FROM bars
),
g AS (
    SELECT symbol, count(*) AS n_bars,
           {aggs}
    FROM r
    GROUP BY symbol
),
v AS (
    SELECT *, {vars_}
    FROM g
)
SELECT symbol, CAST(n_bars AS BIGINT) AS n_bars,
       {sql_round(f"CASE WHEN {ok} THEN {slope} END")} AS hurst
FROM v
""".strip())


HURST_SQL = _hurst_sql()


# ------------------------------------------------ AR(1) half-life ----

def ar1_half_life(bars: DataFrame) -> DataFrame:
    """AR(1) mean-reversion half-life of the log price per symbol:
    regress (x_t - x_{t-1}) on x_{t-1} for x = 1e-6-quantized ln(close);
    half-life = -ln2 / ln(1 + b) when -1 < b < 0 (else NULL — no mean
    reversion). The delta is computed ON the quantized grid, so both
    regression variables are exact ints and b is one double division of
    DECIMAL(38,0)/HUGEINT moment sums (unbounded history). One shuffle,
    one row per symbol; the slope is emitted alongside so a random-walk
    series (b ~ 0, NULL half-life) is still informative."""
    ws = _ws()
    x = _qx_close()
    df = bars.select("symbol", "ts", x.alias("x"))
    xp = F.lag("x").over(ws)
    df = df.select(
        "symbol", xp.alias("xp"), (F.col("x") - xp).alias("y"))
    d38 = "decimal(38,0)"
    # y-null filter matters once closes can be non-positive: count(*)
    # counts rows the sums would skip otherwise
    g = df.filter(F.col("xp").isNotNull()
                  & F.col("y").isNotNull()).groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xp").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum((F.col("xp") * F.col("y")).cast(d38)).alias("sxy"),
        F.sum((F.col("xp") * F.col("xp")).cast(d38)).alias("sxx"),
    )
    n = F.col("n").cast(d38)
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    b = F.when((F.col("n") >= 2) & (den > 0),
               num.cast("double") / den.cast("double"))
    hl = F.when(
        (b > -1.0) & (b < 0.0),
        F.lit(-LN2) / F.log(F.lit(1.0) + b))
    return g.select(
        "symbol", F.col("n").cast("long").alias("n_obs"),
        round_col(b).alias("ar1_slope"),
        round_col(hl).alias("half_life_bars"),
    )


def _ar1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ar1_half_life(bars_from_events_cached(spark, sf_dir))


AR1_SQL = with_bars_cte(f"""
, x AS (
    SELECT symbol, ts,
           {_SQL_QX_CLOSE} AS x
    FROM bars
),
d AS (
    SELECT symbol,
           lag(x) OVER ({_WS_SQL}) AS xp,
           x - lag(x) OVER ({_WS_SQL}) AS y
    FROM x
),
g AS (
    SELECT symbol, count(*) AS n,
           sum(CAST(xp AS HUGEINT)) AS sx,
           sum(CAST(y AS HUGEINT)) AS sy,
           sum(CAST(xp AS HUGEINT) * y) AS sxy,
           sum(CAST(xp AS HUGEINT) * xp) AS sxx
    FROM d
    WHERE xp IS NOT NULL AND y IS NOT NULL
    GROUP BY symbol
),
b AS (
    SELECT symbol, n,
           CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) END AS b
    FROM g
)
SELECT symbol, CAST(n AS BIGINT) AS n_obs,
       {sql_round('b')} AS ar1_slope,
       {sql_round(f"CASE WHEN b > -1.0 AND b < 0.0 "
                  f"THEN (-{LN2!r}) / ln(1.0 + b) END")} AS half_life_bars
FROM b
""".strip())





# ------------------------------------------- risk-adjusted telemetry ----

def rolling_sharpe(bars: DataFrame, length: int = MS_N) -> DataFrame:
    """Rolling per-bar Sharpe ratio: mean(r) / sample-std(r) over the
    trailing window of 1-bar log returns (no annualization — per-bar
    units; multiply by sqrt(bars/year) downstream). Both moments come
    from exact-integer window sums, and because mean and std share the
    1e-6 quantization the ratio needs NO rescaling. One symbol
    shuffle."""
    assert length == MS_N
    ws, wr = _ws(), _wr()
    q = _qlog(F.col("close"), F.lag("close").over(ws))
    df = bars.select("symbol", "ts", q.alias("q"))
    n = F.count("q").over(wr)
    s = F.sum("q").over(wr)
    q2 = F.sum(F.col("q") * F.col("q")).over(wr)
    mean = s.cast("double") / n
    var = (n * q2 - s * s).cast("double") / (n * (n - F.lit(1)))
    sharpe = F.when((n >= length) & (n * q2 - s * s > 0),
                    mean / F.sqrt(var))
    return df.select(
        "symbol", "ts", n.cast("long").alias("n_obs"),
        round_col(sharpe).alias("sharpe"),
    )


def _sharpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_sharpe(bars_from_events_cached(spark, sf_dir))


SHARPE_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, ts,
           {_sql_qlog('close', f'lag(close) OVER ({_WS_SQL})')} AS q
    FROM bars
),
acc AS (
    SELECT symbol, ts,
           count(q) OVER w AS n,
           sum(q) OVER w AS s,
           sum(q * q) OVER w AS q2
    FROM r
    WINDOW w AS ({_WR_SQL})
)
SELECT symbol, ts, CAST(n AS BIGINT) AS n_obs,
       {sql_round(f"CASE WHEN n >= {MS_N} AND n * q2 - s * s > 0 THEN "
                  "(CAST(s AS DOUBLE) / n) "
                  "/ sqrt(CAST(n * q2 - s * s AS DOUBLE) / (n * (n - 1))) "
                  "END")} AS sharpe
FROM acc
""".strip())


def rolling_sortino(bars: DataFrame, length: int = MS_N) -> DataFrame:
    """Rolling per-bar Sortino ratio: mean(r) / downside-deviation over
    the trailing window, dd = sqrt(mean(min(r, 0)^2)). The downside leg
    is exact-integer too (least of a quantized BIGINT and 0). NB
    least/greatest are NULL-SKIPPING in both engines (the cs_spread
    lesson), so the clamp is wrapped in an explicit validity CASE."""
    assert length == MS_N
    ws, wr = _ws(), _wr()
    q = _qlog(F.col("close"), F.lag("close").over(ws))
    df = bars.select("symbol", "ts", q.alias("q"))
    d = F.when(F.col("q").isNotNull(), F.least(F.col("q"), F.lit(0)))
    df = df.select("symbol", "ts", "q", d.alias("d"))
    n = F.count("q").over(wr)
    s = F.sum("q").over(wr)
    d2 = F.sum(F.col("d") * F.col("d")).over(wr)
    mean = s.cast("double") / n
    dd = F.sqrt(d2.cast("double") / n)
    sortino = F.when((n >= length) & (d2 > 0), mean / dd)
    return df.select(
        "symbol", "ts", n.cast("long").alias("n_obs"),
        round_col(sortino).alias("sortino"),
    )


def _sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_sortino(bars_from_events_cached(spark, sf_dir))


SORTINO_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, ts,
           {_sql_qlog('close', f'lag(close) OVER ({_WS_SQL})')} AS q
    FROM bars
),
c AS (
    SELECT symbol, ts, q,
           CASE WHEN q IS NOT NULL THEN least(q, 0) END AS d
    FROM r
),
acc AS (
    SELECT symbol, ts,
           count(q) OVER w AS n,
           sum(q) OVER w AS s,
           sum(d * d) OVER w AS d2
    FROM c
    WINDOW w AS ({_WR_SQL})
)
SELECT symbol, ts, CAST(n AS BIGINT) AS n_obs,
       {sql_round(f"CASE WHEN n >= {MS_N} AND d2 > 0 THEN "
                  "(CAST(s AS DOUBLE) / n) "
                  "/ sqrt(CAST(d2 AS DOUBLE) / n) END")} AS sortino
FROM acc
""".strip())


VAR_N = 100   # order-statistic window (needs enough tail mass: 5% of
              # 20 bars is one element — the window minimum)
VAR_K = 5     # ceil(0.05 * VAR_N): the 95% VaR rank, and the CVaR
              # averaging depth


def var_cvar(bars: DataFrame) -> DataFrame:
    """Rolling historical 95% VaR and CVaR (expected shortfall) per
    symbol: VaR = the VAR_K-th smallest of the trailing VAR_N 1-bar log
    returns (an EXACT order statistic — no interpolation), CVaR = the
    mean of those VAR_K tail returns (exact-integer sum / VAR_K).

    Rows with an invalid return (warm-up lag, non-positive close) are
    dropped BEFORE the window in BOTH engines, so the frame is the last
    VAR_N valid returns — Spark's collect_list skips NULLs while
    DuckDB's list() keeps them, making the pre-filter the only
    frame definition the engines agree on (and the semantically useful
    one). Order-statistic windows hold O(VAR_N) values per row — the
    same cost class as the TA quantile/median ops; at 100 TB the
    alternative is a two-pass t-digest/bucketed approximation, which
    trades the exactness this op exists to provide."""
    ws = _ws()
    q = _qlog(F.col("close"), F.lag("close").over(ws))
    df = (bars.select("symbol", "ts", q.alias("q"))
          .filter(F.col("q").isNotNull()))
    wr = _ws().rowsBetween(-(VAR_N - 1), 0)
    srt = F.sort_array(F.collect_list("q").over(wr))
    n = F.size(srt)
    var_q = F.element_at(srt, VAR_K)
    tail_sum = F.aggregate(
        F.slice(srt, 1, VAR_K), F.lit(0).cast("long"), lambda a, x: a + x)
    full = n >= VAR_N
    return df.select(
        "symbol", "ts", n.cast("long").alias("n_obs"),
        round_col(F.when(full, var_q.cast("double") / F.lit(MS_SCALE)))
        .alias("var_95"),
        round_col(F.when(
            full,
            tail_sum.cast("double") / F.lit(float(VAR_K)) / F.lit(MS_SCALE)))
        .alias("cvar_95"),
    )


def _var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return var_cvar(bars_from_events_cached(spark, sf_dir))


VAR_CVAR_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, ts,
           {_sql_qlog('close', f'lag(close) OVER ({_WS_SQL})')} AS q
    FROM bars
),
v AS (
    SELECT symbol, ts, q FROM r WHERE q IS NOT NULL
),
acc AS (
    SELECT symbol, ts,
           list_sort(list(q) OVER w) AS srt
    FROM v
    WINDOW w AS ({_WS_SQL} ROWS BETWEEN {VAR_N - 1} PRECEDING
                 AND CURRENT ROW)
)
SELECT symbol, ts, CAST(len(srt) AS BIGINT) AS n_obs,
       {sql_round(f"CASE WHEN len(srt) >= {VAR_N} THEN "
                  f"CAST(srt[{VAR_K}] AS DOUBLE) / {MS_SCALE!r} END")}
       AS var_95,
       {sql_round(f"CASE WHEN len(srt) >= {VAR_N} THEN "
                  f"CAST(list_sum(srt[1:{VAR_K}]) AS DOUBLE) "
                  f"/ {float(VAR_K)!r} / {MS_SCALE!r} END")} AS cvar_95
FROM acc
""".strip())


# -------------------------------------------------- Roll (1984) spread ----

DELTA_SCALE = 1e4  # price-change quantization (price units, not logs:
                   # Roll's estimator lives in price space). Price space
                   # has NO a-priori magnitude bound (a BRK.A-class
                   # symbol's |dq| ~ 1.8e8 puts n*Sxy past 2^63), so the
                   # moment sums go through DECIMAL(38,0)/HUGEINT like
                   # the other unbounded-magnitude paths — Spark wraps
                   # int64 silently where DuckDB promotes


def roll_spread(bars: DataFrame, length: int = MS_N) -> DataFrame:
    """Roll (1984) implied effective spread: s = 2 * sqrt(-cov) where
    cov is the rolling first-order serial covariance of price CHANGES —
    bid-ask bounce makes adjacent changes negatively correlated, and
    the bounce magnitude recovers the spread. Positive-cov windows are
    emitted NULL (the estimator's documented domain, as in the paper).

    dq = 1e-4-quantized (close_t - close_{t-1}); the pair
    (dq_t, dq_{t-1}) feeds exact-integer covariance sums restricted to
    complete pairs (the x*y NULL-propagation guard), so cov is one
    double expression over exact ints. Validity needs finite closes
    only — price changes have no positivity domain (NaN legs explicit:
    NaN > 0 traps don't apply, but floor(NaN) still would). One symbol
    shuffle; emitted in price units."""
    assert length == MS_N
    ws, wr = _ws(), _wr()
    c, cp = F.col("close"), F.lag("close").over(ws)
    inf = F.lit(float("inf"))
    dq = F.when(~F.isnan(c) & ~F.isnan(cp)
                & (F.abs(c) != inf) & (F.abs(cp) != inf),
                F.floor((c - cp) * F.lit(DELTA_SCALE) + F.lit(0.5))
                .cast("long"))
    df = bars.select("symbol", "ts", dq.alias("dq"))
    dqp = F.lag("dq").over(ws)
    df = df.select("symbol", "ts", "dq", dqp.alias("dqp"))
    d38 = "decimal(38,0)"
    pair = F.col("dq").cast(d38) * F.col("dqp")
    n = F.count(pair).over(wr)
    sx = F.sum(F.when(pair.isNotNull(), F.col("dq").cast(d38))).over(wr)
    sy = F.sum(F.when(pair.isNotNull(), F.col("dqp").cast(d38))).over(wr)
    sxy = F.sum(pair).over(wr)
    cov_s = n.cast(d38) * sxy - sx * sy
    cov = cov_s.cast("double") / (n * (n - F.lit(1)))
    spread = F.when((n >= length) & (cov_s < 0),
                    F.sqrt(-cov) * F.lit(2.0) / F.lit(DELTA_SCALE))
    return df.select(
        "symbol", "ts", n.cast("long").alias("n_obs"),
        round_col(spread).alias("roll_spread"),
    )


def _roll_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    return roll_spread(bars_from_events_cached(spark, sf_dir))


ROLL_SPREAD_SQL = with_bars_cte(f"""
, d AS (
    SELECT symbol, ts,
           CASE WHEN isfinite(close)
                     AND isfinite(lag(close) OVER ({_WS_SQL})) THEN
               CAST(floor((close - lag(close) OVER ({_WS_SQL}))
                          * {DELTA_SCALE!r} + 0.5) AS BIGINT)
           END AS dq
    FROM bars
),
p AS (
    SELECT symbol, ts, dq,
           lag(dq) OVER ({_WS_SQL}) AS dqp
    FROM d
),
acc AS (
    -- pair-completeness guards test null-ness directly: `dq * dqp IS
    -- NOT NULL` computed the BIGINT product first, which overflows at
    -- |dq| ~ 1e10 (1e6-scale prices x the 1e4 quantizer — fuzz gate)
    SELECT symbol, ts,
           count(CASE WHEN dq IS NOT NULL AND dqp IS NOT NULL
                      THEN 1 END) OVER w AS n,
           sum(CASE WHEN dq IS NOT NULL AND dqp IS NOT NULL
                    THEN CAST(dq AS HUGEINT) END) OVER w AS sx,
           sum(CASE WHEN dq IS NOT NULL AND dqp IS NOT NULL
                    THEN CAST(dqp AS HUGEINT) END) OVER w AS sy,
           sum(CAST(dq AS HUGEINT) * dqp) OVER w AS sxy
    FROM p
    WINDOW w AS ({_WR_SQL})
)
SELECT symbol, ts, CAST(n AS BIGINT) AS n_obs,
       {sql_round(f"CASE WHEN n >= {MS_N} AND n * sxy - sx * sy < 0 THEN "
                  "sqrt(-(CAST(n * sxy - sx * sy AS DOUBLE) "
                  "/ (n * (n - 1)))) "
                  f"* 2.0 / {DELTA_SCALE!r} END")} AS roll_spread
FROM acc
""".strip())


# ------------------------------------------------ pairs-trading spread ----

PAIR_N = 24        # rolling z window over the spread (one hourly day)
SPREAD_MAX = 1e8   # |spread| validity cap in 1e-6 log units: sq^2 <=
                   # 1e16, 24-row sums <= 2.4e17, n*Q <= 5.8e18 — int64
                   # stays safe even for pathological hedge ratios
PAIR_TOP_N = 100   # default candidate-universe bound: the S^2 pair
                   # fan-out runs over at most top_n symbols selected by
                   # dollar volume (100 -> <=4950 pairs regardless of
                   # universe size); the sf testdata's 5 symbols all
                   # qualify, so the gate oracle is unchanged


def _top_dollar_volume(bars: DataFrame, top_n: int) -> DataFrame:
    """Top-n symbols by total dollar volume — the candidate universe for
    the S^2 cross-sectional ops. One map-side-partial groupBy to S rows,
    then a deterministic (dv desc, symbol) pick; the result is a tiny
    relation meant to be broadcast-semi-joined onto the bar stream.

    The rank key is an exact-integer sum of per-bar floor(close*volume)
    (guarded non-negative, finite, < I64_BAR_MAX; DECIMAL(38,0)
    accumulation — per-symbol totals exceed int64 long before 100 TB),
    NOT a raw double sum: double accumulation is partition-order-
    dependent, so near-tied symbols could swap in/out of the universe
    between runs, and one NaN close would rank its symbol FIRST (NaN
    sorts above every real value under desc). Invalid-everywhere
    symbols sort last (NULL desc default)."""
    dv = F.col("close") * F.col("volume")
    dvq = F.when((dv >= 0) & ~F.isnan(dv) & (dv < F.lit(I64_BAR_MAX)),
                 F.floor(dv).cast("long"))
    return (bars.groupBy("symbol")
            .agg(F.sum(dvq.cast("decimal(38,0)")).alias("dv"))
            .orderBy(F.desc("dv"), "symbol")
            .limit(top_n)
            .select("symbol"))


# Distinct-symbol count per (applicationId, semantic plan hash, input
# fingerprint): the top-N bound is an identity when the whole universe
# fits inside top_n, and the gate/bench corpus (5 symbols) hits exactly
# that case — the candidate groupBy+limit+broadcast stages are ~0.38 s
# of pure fixed overhead there (measured r10). The count is a BOUND,
# not just a perf artifact, so staleness must be impossible:
#   * file-scan plans fold the scan's file listing into the key —
#     overwrite/append at the same path (same semanticHash, Spark part
#     file names are fresh per write job) lands on a new key and
#     re-counts, so growth past top_n re-materializes the semi-join;
#   * non-file plans (localCheckpoint snapshots, local relations) have
#     no listing, but their canonicalized plan hashes the backing RDD /
#     rows, which cannot change under the key;
#   * anything unkeyable returns None and the caller bounds
#     unconditionally (the safe direction).
# `invalidate_symbol_counts()` is the explicit hook for write paths.
_SYMBOL_COUNT_CACHE: dict[tuple[str, int, int], int] = {}
_SYMBOL_COUNT_CACHE_MAX = 256


def invalidate_symbol_counts() -> None:
    """Drop every cached universe count — call after rewriting bar data
    in-place when the writer bypasses Spark's fresh-part-file naming
    (e.g. mutating bytes of existing files)."""
    _SYMBOL_COUNT_CACHE.clear()


def _symbol_count_cached(bars: DataFrame) -> int | None:
    try:
        h = int(bars._jdf.queryExecution().analyzed().semanticHash())
        app = bars.sparkSession.sparkContext.applicationId
        # data-version signal: the analyzed plan's file listing (cheap —
        # the file index is already built and cached by analysis)
        fp = hash(tuple(sorted(bars.inputFiles())))
    except Exception:
        return None  # unkeyable plan: caller bounds unconditionally
    key = (app, h, fp)
    n = _SYMBOL_COUNT_CACHE.get(key)
    if n is None:
        for stale in [k for k in _SYMBOL_COUNT_CACHE if k[0] != app]:
            del _SYMBOL_COUNT_CACHE[stale]
        if len(_SYMBOL_COUNT_CACHE) >= _SYMBOL_COUNT_CACHE_MAX:
            _SYMBOL_COUNT_CACHE.clear()
        # NULL symbols never survive the semi-join (null keys match
        # nothing), so they must not count toward the universe either —
        # both paths below filter them, keeping elided/bounded
        # row-identical
        n = (bars.filter(F.col("symbol").isNotNull())
             .select("symbol").distinct().count())
        _SYMBOL_COUNT_CACHE[key] = n
    return n


def bound_universe(bars: DataFrame, top_n: int | None,
                   symbols=None) -> DataFrame:
    """Restrict a bar stream to the pair-candidate universe: an explicit
    symbol list, or the top_n dollar-volume names (broadcast semi-join —
    no shuffle of the bar stream). top_n=None and symbols=None leaves
    the stream unbounded (the caller opts back into S^2). When the
    session-cached distinct-symbol count already fits inside top_n the
    semi-join is skipped — every NON-NULL symbol qualifies, so the
    result is identical (the elided path applies the same
    symbol-IS-NOT-NULL filter the equi-join implies; Catalyst drops it
    when the schema is already non-nullable) and the small-universe
    case pays one cached count instead of four candidate stages per
    query."""
    if symbols is not None:
        return bars.filter(F.col("symbol").isin(list(symbols)))
    if top_n is not None:
        n = _symbol_count_cached(bars)
        if n is not None and n <= top_n:
            return bars.filter(F.col("symbol").isNotNull())
        cand = _top_dollar_volume(bars, top_n)
        return bars.join(F.broadcast(cand), "symbol", "left_semi")
    return bars


def pair_spread_z(bars: DataFrame, top_n: int | None = PAIR_TOP_N,
                  symbols=None) -> DataFrame:
    """Stat-arb pair telemetry: for every unordered symbol pair
    (a < b), fit the GLOBAL hedge ratio beta = OLS slope of ln(close_a)
    on ln(close_b) over the aligned hourly grid, then score the spread
    x_a - beta * x_b with a rolling z over the trailing PAIR_N bars —
    the entry/exit signal of a pairs strategy, and a cross-sectional
    op the one-frame-per-instrument reference cannot express.

    Architecture is a SINGLE-PASS window fit: after the ts-aligned
    self-join, the 128-bit global moments come from unbounded window
    aggregates over the pair partition — the same exchange the rolling
    z needs anyway — so the join executes ONCE and there is no
    aggregate+join-back round trip (the review pass measured the
    broadcast variant executing the S^2 join twice). A degenerate fit
    (n < 2 or zero x_b variance) emits NULL beta/z rows instead of
    dropping the pair. The spread is re-quantized (floor+0.5) so the
    rolling mean/std are exact-integer window sums; |spread| >
    SPREAD_MAX (a diverged fit) makes the row invalid in both engines
    instead of silently wrapping int64.

    Scale: the S^2 fan-out is BOUNDED BY DEFAULT — the pair universe is
    the top ``top_n`` symbols by dollar volume (or an explicit
    ``symbols`` list), applied as a broadcast semi-join before the
    ts-align, so a 10k-symbol corpus still joins at most
    top_n*(top_n-1)/2 pairs. ``top_n=None`` opts back into the full
    S^2 (telemetry on small universes only)."""
    bars = bound_universe(bars, top_n, symbols)
    x = _qx_close()
    xdf = (bars.select("symbol", "ts", x.alias("x"))
           .filter(F.col("x").isNotNull()))
    a = xdf.select(F.col("symbol").alias("sym_a"), "ts",
                   F.col("x").alias("xa"))
    b = xdf.select(F.col("symbol").alias("sym_b"), "ts",
                   F.col("x").alias("xb"))
    p = a.join(b, "ts").filter(F.col("sym_a") < F.col("sym_b"))
    d38 = "decimal(38,0)"
    wall = Window.partitionBy("sym_a", "sym_b")
    n = F.count(F.lit(1)).over(wall)
    sx = F.sum(F.col("xa").cast(d38)).over(wall)
    sy = F.sum(F.col("xb").cast(d38)).over(wall)
    sxy = F.sum((F.col("xa") * F.col("xb")).cast(d38)).over(wall)
    syy = F.sum((F.col("xb") * F.col("xb")).cast(d38)).over(wall)
    nd = n.cast(d38)
    den = nd * syy - sy * sy
    beta = F.when(
        (n >= 2) & (den > 0),
        (nd * sxy - sx * sy).cast("double") / den.cast("double"))
    j = p.select("sym_a", "sym_b", "ts", "xa", "xb", beta.alias("beta"))
    spread = F.col("xa").cast("double") - F.col("beta") * F.col("xb")
    sq = F.when((spread < F.lit(SPREAD_MAX)) & (spread > F.lit(-SPREAD_MAX)),
                F.floor(spread + F.lit(0.5)).cast("long"))
    j = j.select("sym_a", "sym_b", "ts", "beta", sq.alias("sq"))
    wp = Window.partitionBy("sym_a", "sym_b").orderBy("ts")
    wr = wp.rowsBetween(-(PAIR_N - 1), 0)
    nn = F.count("sq").over(wr)
    s = F.sum("sq").over(wr)
    q2 = F.sum(F.col("sq") * F.col("sq")).over(wr)
    var_s = nn * q2 - s * s
    z = F.when(
        (nn >= PAIR_N) & (var_s > 0),
        (F.col("sq").cast("double") - s.cast("double") / nn)
        / F.sqrt(var_s.cast("double") / (nn * (nn - F.lit(1)))))
    return j.select(
        "sym_a", "sym_b", "ts",
        nn.cast("long").alias("n_obs"),
        round_col(F.col("beta")).alias("beta"),
        round_col(z).alias("spread_z"),
    )


def _pair_spread_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pair_spread_z(bars_from_events_cached(spark, sf_dir))


PAIR_SPREAD_SQL = with_bars_cte(f"""
, x AS (
    SELECT symbol, ts,
           {_SQL_QX_CLOSE} AS x
    FROM bars
),
v AS (SELECT symbol, ts, x FROM x WHERE x IS NOT NULL),
p AS (
    SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.ts,
           a.x AS xa, b.x AS xb
    FROM v a JOIN v b ON a.ts = b.ts AND a.symbol < b.symbol
),
g AS (
    SELECT sym_a, sym_b, ts, xa, xb,
           count(*) OVER pw AS n,
           sum(CAST(xa AS HUGEINT)) OVER pw AS sx,
           sum(CAST(xb AS HUGEINT)) OVER pw AS sy,
           sum(CAST(xa AS HUGEINT) * xb) OVER pw AS sxy,
           sum(CAST(xb AS HUGEINT) * xb) OVER pw AS syy
    FROM p
    WINDOW pw AS (PARTITION BY sym_a, sym_b)
),
bt AS (
    SELECT sym_a, sym_b, ts, xa, xb,
           CASE WHEN n >= 2 AND n * syy - sy * sy > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * syy - sy * sy AS DOUBLE) END AS beta
    FROM g
),
sp AS (
    SELECT sym_a, sym_b, ts, beta,
           CASE WHEN (CAST(xa AS DOUBLE) - beta * xb) < {SPREAD_MAX!r}
                     AND (CAST(xa AS DOUBLE) - beta * xb)
                         > -{SPREAD_MAX!r}
                THEN CAST(floor((CAST(xa AS DOUBLE) - beta * xb) + 0.5)
                          AS BIGINT)
           END AS sq
    FROM bt
),
acc AS (
    SELECT sym_a, sym_b, ts, beta, sq,
           count(sq) OVER w AS nn,
           sum(sq) OVER w AS s,
           sum(sq * sq) OVER w AS q2
    FROM sp
    WINDOW w AS (PARTITION BY sym_a, sym_b ORDER BY ts
                 ROWS BETWEEN {PAIR_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT sym_a, sym_b, ts, CAST(nn AS BIGINT) AS n_obs,
       {sql_round('beta')} AS beta,
       {sql_round(f"CASE WHEN nn >= {PAIR_N} AND nn * q2 - s * s > 0 THEN "
                  "(CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) / nn) "
                  "/ sqrt(CAST(nn * q2 - s * s AS DOUBLE) / (nn * (nn - 1))) "
                  "END")} AS spread_z
FROM acc
""".strip())


# ------------------------------------------------ rolling max drawdown ----

def rolling_mdd(bars: DataFrame) -> DataFrame:
    """Rolling maximum drawdown of the LOG price over the trailing
    VAR_N valid bars: mdd = max over j in the window of
    (prefix-max_{k<=j} x_k - x_j), in log units (exp(-mdd) is the
    worst peak-to-trough ratio inside the window) — the third leg of
    the rolling tail-risk family next to VaR/CVaR.

    Exactness: x is the 1e-6-quantized ln(close); the drawdown is a
    LEFT-ASSOCIATED integer fold over the window list — every
    comparison and subtraction is exact-int. The fold input is a
    ts-SORTED struct list on BOTH engines because DuckDB's windowed
    list() does NOT guarantee frame order (segment-tree combining),
    and the DuckDB side folds via a correlated running-max subquery
    rather than list_reduce — DuckDB 1.0 mis-evaluates list_reduce
    over WINDOW-produced list columns (probed: the identical literal
    list folds correctly; see the oracle's inline comment). Same
    pre-filter frame convention as var_cvar (the last VAR_N VALID
    closes); same O(VAR_N)-values-per-row window cost class as the
    order-statistic ops."""
    x = _qx_close()
    df = (bars.select("symbol", "ts", x.alias("x"))
          .filter(F.col("x").isNotNull()))
    wr = _ws().rowsBetween(-(VAR_N - 1), 0)
    # collect (ts, x) and SORT explicitly: DuckDB's windowed list() does
    # not guarantee frame order (segment-tree combining emitted ~8% of
    # frames out of order in the gate), and the drawdown fold is order-
    # sensitive — unlike var_cvar's sorted order statistics. Both
    # engines sort the struct list by the unique ts, making the fold
    # input identical by construction.
    lst = F.sort_array(
        F.collect_list(F.struct(F.col("ts").alias("t"),
                                F.col("x").alias("x"))).over(wr))
    n = F.size(lst)
    init = F.struct(
        F.lit(-(2 ** 62)).cast("long").alias("pm"),
        F.lit(0).cast("long").alias("mdd"))
    st = F.aggregate(
        lst, init,
        lambda a, v: F.struct(
            F.greatest(a["pm"], v["x"]).alias("pm"),
            F.greatest(a["mdd"],
                       F.greatest(a["pm"], v["x"]) - v["x"]).alias("mdd")))
    mdd = F.when(n >= VAR_N,
                 st["mdd"].cast("double") / F.lit(MS_SCALE))
    return df.select(
        "symbol", "ts", n.cast("long").alias("n_obs"),
        round_col(mdd).alias("mdd_log"),
    )


def _rolling_mdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_mdd(bars_from_events_cached(spark, sf_dir))


ROLLING_MDD_SQL = with_bars_cte(f"""
, x AS (
    SELECT symbol, ts,
           {_SQL_QX_CLOSE} AS x
    FROM bars
),
v AS (SELECT symbol, ts, x FROM x WHERE x IS NOT NULL),
acc AS (
    SELECT symbol, ts,
           list_sort(list({{'t': ts, 'x': x}}) OVER w) AS lst
    FROM v
    WINDOW w AS ({_WS_SQL} ROWS BETWEEN {VAR_N - 1} PRECEDING
                 AND CURRENT ROW)
),
f AS (
    -- NOT list_reduce: DuckDB 1.0 evaluates list_reduce over a
    -- WINDOW-produced list column incorrectly for a fraction of rows
    -- (the same lambda over the identical list as a literal returns
    -- the right fold — probed; likely vectorized-state bleed), so the
    -- running-max fold runs as a correlated subquery over the
    -- unnested list instead, where window semantics are sound.
    SELECT symbol, ts, len(lst) AS n,
           (SELECT max(pm - v) FROM (
               SELECT v, max(v) OVER (ORDER BY idx) AS pm
               FROM (SELECT unnest(list_transform(lst, e -> e.x)) AS v,
                            unnest(generate_series(1, len(lst))) AS idx))
            z) AS mdd_q
    FROM acc
)
SELECT symbol, ts, CAST(n AS BIGINT) AS n_obs,
       {sql_round(f"CASE WHEN n >= {VAR_N} THEN "
                  f"CAST(mdd_q AS DOUBLE) / {MS_SCALE!r} END")} AS mdd_log
FROM f
""".strip())


SUITE = {
    "vol_parkinson_20": ExtQuery(_parkinson, PARKINSON_SQL),
    "vol_garman_klass_20": ExtQuery(_garman_klass, GARMAN_KLASS_SQL),
    "vol_rogers_satchell_20": ExtQuery(_rogers_satchell,
                                       ROGERS_SATCHELL_SQL),
    "vol_yang_zhang_20": ExtQuery(_yang_zhang, YANG_ZHANG_SQL),
    "amihud_illiq_20": ExtQuery(_amihud, AMIHUD_SQL),
    "kyle_lambda_20": ExtQuery(_kyle_lambda, KYLE_LAMBDA_SQL),
    "cs_spread_2_20": ExtQuery(_corwin_schultz, CORWIN_SCHULTZ_SQL),
    "hurst_aggvar": ExtQuery(_hurst, HURST_SQL),
    "ar1_half_life": ExtQuery(_ar1, AR1_SQL),
    "rolling_sharpe_20": ExtQuery(_sharpe, SHARPE_SQL),
    "rolling_sortino_20": ExtQuery(_sortino, SORTINO_SQL),
    "var_cvar_95_100": ExtQuery(_var_cvar, VAR_CVAR_SQL),
    "roll_spread_20": ExtQuery(_roll_spread, ROLL_SPREAD_SQL),
    "pair_spread_z_24": ExtQuery(_pair_spread_z, PAIR_SPREAD_SQL),
    "rolling_mdd_100": ExtQuery(_rolling_mdd, ROLLING_MDD_SQL),
}
