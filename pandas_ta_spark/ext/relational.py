"""Relational time-series operators Spark lacks as built-ins: as-of join
and gap sessionization (SURVEY.md §7.5 "custom operators" tier).

Both are implemented as compositions of existing DataFrame ops — one
shuffle each, no range-predicate blow-up, no UDFs:

- As-of join uses the union-and-carry trick: tag bar rows and event rows,
  sort each symbol partition once on (ts, tag), and carry the last bar
  forward with ``last(..., ignorenulls=True)``. This is the distributed
  rewrite of a MergeJoin-based point-in-time join: cost is one shuffle on
  the join key + one sort, independent of how many events share a bar
  (an inequality-join plan would degenerate to broadcast-nested-loop).
- Sessionization is two stacked windows (lag -> running sum) plus one
  aggregation, the canonical gap-based session assignment.

DuckDB oracles use the engine's *native* ``ASOF JOIN`` operator and plain
window SQL — independent implementations of the same semantics.

Timestamps: testdata parquet stores ts as timestamp[us] without a zone
(Spark TIMESTAMP_NTZ / DuckDB naive TIMESTAMP); all arithmetic uses
``timestampdiff(MICROSECOND, ..)`` / ``date_diff('microsecond', ..)``,
which are exact integer microsecond differences in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandas_ta_spark.ext import ExtQuery
from pandas_ta_spark.operators.base import (
    APPROX_PERCENTILE_ACCURACY,
    rank_pick,
    round_col,
    sql_rank_pick,
    sql_round,
    use_approx_percentile,
)
from pandas_ta_spark.sources.bars import (
    bars_from_events_cached,
    load_table,
    with_bars_cte,
)

SESSION_GAP_US = 1800 * 1_000_000  # 30 min


# ------------------------------------------------------------ as-of join ----

def asof_join(ev: DataFrame, bars: DataFrame) -> DataFrame:
    """Point-in-time join: each event gets the latest COMPLETED hourly bar
    (bar_ts strictly before the event's own hour — a bar's close is only
    knowable once its hour has ended, so same-hour matches would leak the
    future). ``ev`` carries (event_id, symbol, ts, value); ``bars`` the
    canonical layout.

    Union-and-carry plan: bar rows sort after event rows at the same
    ordering timestamp (tag column), so ``last(bar, ignorenulls=True)``
    over (symbol ORDER BY ord_ts, tag) carries exactly the bars with
    ts < date_trunc(hour, event.ts). ONE shuffle on symbol; scales with
    rows, not with events-per-bar (reference has no such operator; DuckDB
    ships it natively as ASOF JOIN — used as the oracle).
    """
    e = ev.select(
        "symbol",
        F.date_trunc("hour", F.col("ts")).alias("ord_ts"),
        F.lit(0).alias("is_bar"),
        "event_id", "ts", "value",
    )
    b = bars.select(
        "symbol",
        F.col("ts").alias("ord_ts"),
        F.lit(1).alias("is_bar"),
        F.struct(F.col("ts").alias("bar_ts"), F.col("close").alias("bar_close")).alias("bar"),
    )
    u = e.unionByName(b, allowMissingColumns=True)
    w = (
        Window.partitionBy("symbol")
        .orderBy("ord_ts", "is_bar")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("b", F.last("bar", ignorenulls=True).over(w))
        .filter(F.col("is_bar") == 0)
        .select(
            "event_id", "symbol", "ts", "value",
            F.col("b.bar_ts").alias("bar_ts"),
            F.col("b.bar_close").alias("bar_close"),
        )
    )


def _asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate wiring of ``asof_join``: sf events vs their derived bars."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("event_type").alias("symbol"), "ts", "value"
    )
    return asof_join(ev, bars_from_events_cached(spark, sf_dir))


ASOF_JOIN_SQL = with_bars_cte("""
SELECT e.event_id, e.event_type AS symbol, e.ts, e.value,
       b.ts AS bar_ts, b.close AS bar_close
FROM events e
ASOF LEFT JOIN bars b
  ON e.event_type = b.symbol AND b.ts < date_trunc('hour', e.ts)
""".strip())


def _asof_hour_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The point-in-time LOOKUP TABLE itself as a query: per
    (symbol, event-hour), the prevailing completed bar — the
    materialized validity-interval expansion that
    `streaming.relational.stream_asof_attach` serves stateless as-of
    joins from (r8). Exposing it as an oracled query value-checks the
    interval logic (hour truncation, gap spanning, latest-bar-per-hour
    fold) against DuckDB's independent generate_series construction."""
    from pandas_ta_spark.streaming.relational import asof_lookup_table

    return asof_lookup_table(bars_from_events_cached(spark, sf_dir))


ASOF_HOUR_LOOKUP_SQL = with_bars_cte("""
, l AS (
    SELECT symbol, ts AS bar_ts, close AS bar_close,
           lead(ts) OVER (PARTITION BY symbol ORDER BY ts) AS next_ts
    FROM bars
),
exp AS (
    SELECT symbol, bar_ts, bar_close,
           unnest(generate_series(
               date_trunc('hour', bar_ts) + INTERVAL 1 HOUR,
               greatest(
                   coalesce(date_trunc('hour', next_ts) + INTERVAL 1 HOUR,
                            date_trunc('hour', bar_ts) + INTERVAL 1 HOUR),
                   date_trunc('hour', bar_ts) + INTERVAL 1 HOUR),
               INTERVAL 1 HOUR)) AS h
    FROM l
)
SELECT symbol, h,
       arg_max(bar_ts, bar_ts) AS bar_ts,
       arg_max(bar_close, bar_ts) AS bar_close
FROM exp
GROUP BY symbol, h
""".strip())


# --------------------------------------------------------- sessionization ----

def _sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap to
    the previous event exceeds 30 min. lag -> running sum assigns session
    numbers in one window pass; a groupBy emits the session manifest.
    Everything shuffles ONCE on user_id (the window and the groupBy share
    the partitioning, so AQE reuses the exchange)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # strict > matches Spark's native session_window(gap) merge rule (an
    # event at exactly prev + gap still MERGES; only a strictly larger gap
    # splits) — keeps the streaming twin (streaming/sessions.py)
    # row-compatible with this batch op
    gap = F.expr(f"timestampdiff(MICROSECOND, _prev_ts, ts) > {SESSION_GAP_US}")
    sess = (
        ev.withColumn("_prev_ts", F.lag("ts").over(w))
        .withColumn(
            "_new_s",
            F.when(F.col("_prev_ts").isNull() | gap, 1).otherwise(0),
        )
        .withColumn("session_no", F.sum("_new_s").over(w).cast("long"))
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.countDistinct("event_type").alias("n_event_types"),
        )
        # integer `div` on the exact microsecond difference — bit-identical
        # to the oracle's `//` (no double rounding)
        .withColumn(
            "duration_sec",
            F.expr("timestampdiff(MICROSECOND, session_start, session_end)"
                   " div 1000000"),
        )
        .select("user_id", "session_no", "n_events", "session_start",
                "session_end", "duration_sec", "n_event_types")
    )


SESSIONIZE_SQL = f"""
WITH o AS (
    SELECT user_id, event_id, ts, event_type,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
f AS (
    SELECT user_id, event_id, ts, event_type,
           CASE WHEN prev_ts IS NULL
                     OR date_diff('microsecond', prev_ts, ts) > {SESSION_GAP_US}
                THEN 1 ELSE 0 END AS new_s
    FROM o
),
s AS (
    SELECT user_id, ts, event_type,
           CAST(sum(new_s) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS BIGINT) AS session_no
    FROM f
)
SELECT user_id, session_no,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       date_diff('microsecond', min(ts), max(ts)) // 1000000 AS duration_sec,
       count(DISTINCT event_type) AS n_event_types
FROM s GROUP BY 1, 2
""".strip()


# ------------------------------------------------- multi-timeframe asof ----

MTF_SMA_N = 20


# NOTE: the union-and-carry below intentionally mirrors asof_join's
# mechanism (tagged sides, (ts, tag) sort, last-ignorenulls carry).
# Any change to the strictly-before / tie-order rule there must land
# here too — the two encode the same point-in-time semantics.
def _mtf_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-timeframe composition: an hourly-bar indicator (SMA-20 of
    close) attached to every raw event by as-of join — tick-level signals
    conditioned on a higher-timeframe trend, the standard MTF pattern the
    reference leaves to the user (pandas_ta docs suggest manual resample
    + merge_asof).

    Same union-and-carry plan as ``_asof_join``: the bar side first runs
    its window aggregate per symbol, then both sides share ONE shuffle on
    symbol for the carry window. Strictly past bars only (no intra-hour
    leakage)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("event_type").alias("symbol"), "ts", "value"
    )
    bars = bars_from_events_cached(spark, sf_dir)
    wb = (
        Window.partitionBy("symbol")
        .orderBy("ts")
        .rowsBetween(-(MTF_SMA_N - 1), 0)
    )
    sma = F.when(
        F.count("close").over(wb) >= MTF_SMA_N, F.avg("close").over(wb)
    )
    b = bars.select(
        "symbol",
        F.col("ts").alias("ord_ts"),
        F.lit(1).alias("is_bar"),
        F.struct(
            F.col("ts").alias("bar_ts"), sma.alias("sma_1h")
        ).alias("bar"),
    )
    e = ev.select(
        "symbol",
        F.date_trunc("hour", F.col("ts")).alias("ord_ts"),
        F.lit(0).alias("is_bar"),
        "event_id", "ts", "value",
    )
    u = e.unionByName(b, allowMissingColumns=True)
    w = (
        Window.partitionBy("symbol")
        .orderBy("ord_ts", "is_bar")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("b", F.last("bar", ignorenulls=True).over(w))
        .filter(F.col("is_bar") == 0)
        .select(
            "event_id", "symbol", "ts", "value",
            F.col("b.bar_ts").alias("bar_ts"),
            # shared 1e-6 rounding: DuckDB evaluates sliding-window avg
            # with a segment tree (pairwise sums), Spark with a running
            # accumulator — last-ulp divergence (~1e-14) is expected
            round_col(F.col("b.sma_1h")).alias("sma_1h"),
        )
    )


MTF_SMA_SQL = with_bars_cte(f"""
, bsma AS (
    SELECT symbol, ts,
           CASE WHEN count(close) OVER (
                    PARTITION BY symbol ORDER BY ts
                    ROWS BETWEEN {MTF_SMA_N - 1} PRECEDING AND CURRENT ROW
                ) >= {MTF_SMA_N}
                THEN avg(close) OVER (
                    PARTITION BY symbol ORDER BY ts
                    ROWS BETWEEN {MTF_SMA_N - 1} PRECEDING AND CURRENT ROW
                ) END AS sma_1h
    FROM bars
)
SELECT e.event_id, e.event_type AS symbol, e.ts, e.value,
       b.ts AS bar_ts, {sql_round('b.sma_1h')} AS sma_1h
FROM events e
ASOF LEFT JOIN bsma b
  ON e.event_type = b.symbol AND b.ts < date_trunc('hour', e.ts)
""".strip())


# --------------------------------------------------- retention cohorts ----

def _retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    by day-offset of subsequent activity — the standard engagement rollup
    over an event log. Distinct (user, day) -> window-min cohort (no
    self-join) -> (cohort, offset) counts: three exchanges total. All
    exact integers; day arithmetic via date_trunc/datediff, identical in
    both engines."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    days = ev.select("user_id", F.date_trunc("day", F.col("ts")).alias("day")).distinct()
    # first-seen as a window min (no self-join); (user, day) is distinct,
    # so (user, day_offset) is unique and count(*) == count(DISTINCT user)
    # without the expand of a distinct aggregate
    w = Window.partitionBy("user_id")
    return (
        days.withColumn("cohort_day", F.min("day").over(w))
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("long").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


RETENTION_SQL = """
WITH days AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
coh AS (
    SELECT day, min(day) OVER (PARTITION BY user_id) AS cohort_day FROM days
)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
       count(*) AS n_users
FROM coh
GROUP BY 1, 2
""".strip()


# ------------------------------------------------------- funnel analysis ----

FUNNEL_STAGES = ("view", "click", "purchase")


def _funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel per user: first view, first click AFTER
    that view, first purchase AFTER that click (strict event-time order —
    unordered membership would overcount).

    The three stage timestamps are CHAINED WINDOW MINIMA over ONE
    hash(user_id) partitioning: stage k's conditional min reads stage
    k-1's column, so Catalyst stacks three Window nodes behind a single
    Exchange (the staged-join formulation costs 12). One final
    aggregation dedups to a per-user stage vector. Exact: only min() over
    timestamps and null checks."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = ev.withColumn("t_view", t_view)
    t_click = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
               F.col("ts"))
    ).over(w)
    staged = staged.withColumn("t_click", t_click)
    t_purchase = F.min(
        F.when((F.col("event_type") == "purchase")
               & (F.col("ts") > F.col("t_click")), F.col("ts"))
    ).over(w)
    staged = staged.withColumn("t_purchase", t_purchase)
    return (
        staged.groupBy("user_id")
        .agg(
            F.first("t_view").alias("t_view"),
            F.first("t_click").alias("t_click"),
            F.first("t_purchase").alias("t_purchase"),
        )
        .select(
            "user_id", "t_view", "t_click", "t_purchase",
            (F.col("t_view").isNotNull().cast("int")
             + F.col("t_click").isNotNull().cast("int")
             + F.col("t_purchase").isNotNull().cast("int")).alias("stages_reached"),
        )
    )


FUNNEL_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (
    SELECT user_id, min(ts) AS t_view FROM events
    WHERE event_type = 'view' GROUP BY 1
),
c AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN v ON v.user_id = e.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t_view
    GROUP BY 1
),
p AS (
    SELECT e.user_id, min(e.ts) AS t_purchase
    FROM events e JOIN c ON c.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    GROUP BY 1
)
SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
       (CASE WHEN v.t_view IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS stages_reached
FROM u
LEFT JOIN v ON v.user_id = u.user_id
LEFT JOIN c ON c.user_id = u.user_id
LEFT JOIN p ON p.user_id = u.user_id
""".strip()


# ----------------------------------------------------- daily resampling ----

def _bars_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-anchor OHLCV resampling — the same single-aggregation
    derivation as the hourly bars every indicator consumes, exercised at
    a coarser anchor (the reference's resample-to-timeframe path)."""
    from pandas_ta_spark.sources.bars import bars_from_events

    return bars_from_events(spark, sf_dir, anchor="day")


def _bars_daily_oracle() -> str:
    from pandas_ta_spark.sources.bars import bars_from_events_sql

    return bars_from_events_sql("day")


def _xsec_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional return ranking: at every bar timestamp, rank each
    symbol's 1-bar return against ALL symbols trading that bar — the
    momentum/reversal factor construction step of any cross-sectional
    strategy, and a whole-panel operator the reference's
    one-frame-per-instrument model cannot express.

    Plan: one per-symbol window pass for the return (hash(symbol)
    shuffle), then one per-timestamp ranking pass (hash(ts) shuffle) —
    the two orthogonal partitionings a panel op inherently needs; both
    key on high-cardinality uniform columns at scale. First-bar rows
    (NULL return) are excluded BEFORE ranking: Spark orders NULLS FIRST
    ascending where DuckDB defaults NULLS LAST, so keeping them would
    make ranks engine-dependent. Ties break by symbol, making ranks
    unique and the percentile deterministic."""
    bars = bars_from_events_cached(spark, sf_dir)
    ws = Window.partitionBy("symbol").orderBy("ts")
    ret = F.col("close") / F.lag("close").over(ws) - 1
    r = bars.select("symbol", "ts", ret.alias("ret_1")).filter(
        F.col("ret_1").isNotNull()
    )
    wt = Window.partitionBy("ts").orderBy("ret_1", "symbol")
    wn = Window.partitionBy("ts")
    n = F.count(F.lit(1)).over(wn)
    rk = F.row_number().over(wt)
    pct = F.when(n > 1, (rk - 1).cast("double") / (n - 1).cast("double")) \
        .otherwise(F.lit(0.5))
    return r.select(
        "symbol", "ts", round_col(F.col("ret_1")).alias("ret_1"),
        rk.cast("long").alias("xsec_rank"),
        n.cast("long").alias("n_xsec"),
        round_col(pct).alias("xsec_pct"),
    )


XSEC_SCALE = 1e6   # quantization for order-independent cross-symbol sums
XSEC_WINSOR = 10.0  # +-1000% return clamp BEFORE standardizing — the
                    # standard factor-construction winsorization, and what
                    # keeps q and q*q inside BIGINT (the r6 BETA_SCALE
                    # overflow lesson: raw bar returns reach 1e3+ when a
                    # close passes near zero, and (ret*1e6)^2 overflows)


def _xsec_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional z-score of the 1-bar return: how extreme each
    symbol's move is relative to the panel AT THAT TIMESTAMP — the
    standardization step between raw returns and a factor model.

    Returns are WINSORIZED at +-XSEC_WINSOR before standardizing (the
    standard factor-construction step: a single near-zero close would
    otherwise own the panel's variance); the raw return is still
    reported. Determinism across engines AND partitionings: the
    per-timestamp moment sums aggregate 1e6-quantized BIGINTs (integer
    addition is order-independent, so Spark's partial-agg merge order
    and DuckDB agree exactly), then mean/std/z derive through one shared
    double expression chain. Degenerate panels (n < 2 or zero variance)
    emit NULL, identically on both sides."""
    bars = bars_from_events_cached(spark, sf_dir)
    ws = Window.partitionBy("symbol").orderBy("ts")
    ret = F.col("close") / F.lag("close").over(ws) - 1
    r = bars.select("symbol", "ts", ret.alias("ret_1")).filter(
        F.col("ret_1").isNotNull()
    )
    wret = F.least(F.greatest(F.col("ret_1"), F.lit(-XSEC_WINSOR)),
                   F.lit(XSEC_WINSOR))
    q = F.floor(wret * F.lit(XSEC_SCALE) + F.lit(0.5)).cast("long")
    wt = Window.partitionBy("ts")
    rq = r.withColumn("q", q)
    s1 = F.sum("q").over(wt).cast("double")
    s2 = F.sum(F.col("q") * F.col("q")).over(wt).cast("double")
    nd = F.count(F.lit(1)).over(wt).cast("double")
    var = (s2 - s1 * s1 / nd) / (nd - F.lit(1.0))
    z = F.when(
        (nd > 1) & (var > 0),
        (F.col("q").cast("double") - s1 / nd) / F.sqrt(var),
    )
    return rq.select(
        "symbol", "ts", round_col(F.col("ret_1")).alias("ret_1"),
        F.count(F.lit(1)).over(wt).cast("long").alias("n_xsec"),
        round_col(z).alias("xsec_z"),
    )


XSEC_ZSCORE_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, ts,
           close / lag(close) OVER (PARTITION BY symbol ORDER BY ts) - 1
               AS ret_1
    FROM bars
),
nn AS (
    SELECT symbol, ts, ret_1,
           CAST(floor(least(greatest(ret_1, -{XSEC_WINSOR!r}),
                            {XSEC_WINSOR!r}) * {XSEC_SCALE!r} + 0.5)
                AS BIGINT) AS q
    FROM r WHERE ret_1 IS NOT NULL
),
m AS (
    SELECT symbol, ts, ret_1, q,
           CAST(sum(q) OVER (PARTITION BY ts) AS DOUBLE) AS s1,
           CAST(sum(q * q) OVER (PARTITION BY ts) AS DOUBLE) AS s2,
           CAST(count(*) OVER (PARTITION BY ts) AS DOUBLE) AS nd,
           CAST(count(*) OVER (PARTITION BY ts) AS BIGINT) AS n_xsec
    FROM nn
)
SELECT symbol, ts, {sql_round('ret_1')} AS ret_1, n_xsec,
       {sql_round('''CASE WHEN nd > 1
             AND (s2 - s1 * s1 / nd) / (nd - 1.0) > 0
            THEN (CAST(q AS DOUBLE) - s1 / nd)
                 / sqrt((s2 - s1 * s1 / nd) / (nd - 1.0)) END''')} AS xsec_z
FROM m
""".strip())


XSEC_RANK_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, ts,
           close / lag(close) OVER (PARTITION BY symbol ORDER BY ts) - 1
               AS ret_1
    FROM bars
),
nn AS (SELECT * FROM r WHERE ret_1 IS NOT NULL)
SELECT symbol, ts, {sql_round('ret_1')} AS ret_1,
       CAST(row_number() OVER (PARTITION BY ts ORDER BY ret_1, symbol)
            AS BIGINT) AS xsec_rank,
       CAST(count(*) OVER (PARTITION BY ts) AS BIGINT) AS n_xsec,
       {sql_round('''CASE WHEN count(*) OVER (PARTITION BY ts) > 1
            THEN CAST(row_number() OVER (PARTITION BY ts
                                         ORDER BY ret_1, symbol) - 1
                      AS DOUBLE)
                 / CAST(count(*) OVER (PARTITION BY ts) - 1 AS DOUBLE)
            ELSE 0.5 END''')} AS xsec_pct
FROM nn
""".strip())


BT_FAST, BT_SLOW = 8, 21


def _signal_equity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized signal backtest: SMA(8)>SMA(21) trend -> next-bar
    position -> position-gated log returns -> cumulative equity curve.
    The reference stops at signal columns (tsignals); this closes the
    loop to the number a strategy author actually wants, still as ONE
    window pass per symbol — no per-trade loop.

    Exactness: the cumulative strategy return uses the fixed-point
    BIGINT running sum (functions/windows.py cumsum_fixed) — float
    cumsums associate differently across engines and partition merge
    orders; integer sums are exact — and equity = exp(cum) is one
    identical IEEE call on an identical double. Position is lagged one
    bar (no look-ahead: the signal fires on a bar's close, the position
    exists from the next bar)."""
    from pandas_ta_spark.functions.windows import cumsum_fixed

    bars = bars_from_events_cached(spark, sf_dir)
    ws = Window.partitionBy("symbol").orderBy("ts")

    def sma(n):
        wr = ws.rowsBetween(-(n - 1), 0)
        return F.when(F.count("close").over(wr) >= n,
                      F.avg("close").over(wr))

    trend = F.when(
        sma(BT_FAST).isNotNull() & sma(BT_SLOW).isNotNull(),
        (sma(BT_FAST) > sma(BT_SLOW)).cast("int"),
    )
    df = bars.select("symbol", "ts", "close", trend.alias("trend"))
    pos = F.lag("trend").over(ws)
    # guarded (unquantized) log return: a zero/NaN/inf close must yield
    # a NULL strat_ret in BOTH engines (DuckDB ln(0) hard-errors), which
    # coalesce() then books as a flat day — see microstructure._glog
    from pandas_ta_spark.ext.microstructure import _glog

    lr = _glog(F.col("close"), F.lag("close").over(ws))
    df = df.select(
        "symbol", "ts", pos.alias("position"),
        (pos * lr).alias("strat_ret"),
    )
    contrib = F.coalesce(F.col("strat_ret"), F.lit(0.0))
    cum = cumsum_fixed(contrib)
    return df.select(
        "symbol", "ts", "position",
        round_col(F.col("strat_ret")).alias("strat_ret"),
        round_col(cum).alias("cum_ret"),
        round_col(F.exp(cum)).alias("equity"),
    )


def _signal_equity_oracle() -> str:
    from pandas_ta_spark.functions.windows import sql_cumsum_fixed

    def sma(n):
        w = (f"PARTITION BY symbol ORDER BY ts "
             f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW")
        return (f"CASE WHEN count(close) OVER ({w}) >= {n} "
                f"THEN avg(close) OVER ({w}) END")

    return with_bars_cte(f"""
, t AS (
    SELECT symbol, ts, close,
           CASE WHEN ({sma(BT_FAST)}) IS NOT NULL
                 AND ({sma(BT_SLOW)}) IS NOT NULL
                THEN CAST(({sma(BT_FAST)}) > ({sma(BT_SLOW)}) AS INT)
           END AS trend
    FROM bars
),
p AS (
    SELECT symbol, ts,
           lag(trend) OVER (PARTITION BY symbol ORDER BY ts) AS position,
           lag(trend) OVER (PARTITION BY symbol ORDER BY ts)
             * {_sql_glog_ret()}
             AS strat_ret
    FROM t
),
c AS (
    SELECT symbol, ts, position, strat_ret,
           {sql_cumsum_fixed("coalesce(strat_ret, 0.0)")} AS cum
    FROM p
)
SELECT symbol, ts, position,
       {sql_round('strat_ret')} AS strat_ret,
       {sql_round('cum')} AS cum_ret,
       {sql_round('exp(cum)')} AS equity
FROM c
""".strip())


def _series_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol series-integrity audit — the reference's single-frame
    checks (`df.ta.datetime_ordered`, NaN scans) generalized to a
    distributed profile: row/distinct-ts/null counts, time span, and
    hour-bucket coverage (distinct hours vs the span's hour count — the
    gap telemetry a backfill job consumes). One groupBy, all counters
    exact integers; the pipeline health dashboard you run before
    trusting any indicator output."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    # NTZ-pure epoch micros: unix_micros(CAST(ts AS TIMESTAMP)) would
    # interpret the naive value in the SESSION timezone (half-hour-offset
    # or DST zones shift hour buckets vs DuckDB's tz-free epoch_us)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    hour = F.floor(us / F.lit(3_600_000_000)).cast("long")
    out = (
        ev.groupBy(F.col("event_type").alias("symbol"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("ts").alias("n_distinct_ts"),
            F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
            F.min("ts").alias("ts_min"),
            F.max("ts").alias("ts_max"),
            F.countDistinct(hour).alias("n_hours_present"),
            (F.floor(F.max(us) / F.lit(3_600_000_000))
             - F.floor(F.min(us) / F.lit(3_600_000_000)) + 1)
            .cast("long").alias("n_hours_span"),
        )
        .select(
            "symbol", "n_rows", "n_distinct_ts",
            (F.col("n_rows") - F.col("n_distinct_ts")).alias("n_dup_ts"),
            "n_null_value", "ts_min", "ts_max",
            "n_hours_present", "n_hours_span",
            (F.col("n_hours_span") - F.col("n_hours_present"))
            .alias("n_hour_gaps"),
        )
    )
    return out


SERIES_INTEGRITY_SQL = """
SELECT event_type AS symbol,
       count(*) AS n_rows,
       count(DISTINCT ts) AS n_distinct_ts,
       count(*) - count(DISTINCT ts) AS n_dup_ts,
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_value,
       min(ts) AS ts_min,
       max(ts) AS ts_max,
       count(DISTINCT floor(epoch_us(ts) / 3600000000.0)) AS n_hours_present,
       CAST(floor(max(epoch_us(ts)) / 3600000000.0)
           - floor(min(epoch_us(ts)) / 3600000000.0) + 1 AS BIGINT)
           AS n_hours_span,
       CAST((floor(max(epoch_us(ts)) / 3600000000.0)
           - floor(min(epoch_us(ts)) / 3600000000.0) + 1)
           - count(DISTINCT floor(epoch_us(ts) / 3600000000.0)) AS BIGINT)
           AS n_hour_gaps
FROM events
GROUP BY 1
""".strip()


def _bars_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute OHLCV resampling — the sub-hour timeframe date_trunc
    anchors cannot express; exact integer epoch-microsecond bucketing
    shared with the oracle (sources/bars.py bars_from_events_bucketed)."""
    from pandas_ta_spark.sources.bars import bars_from_events_bucketed

    return bars_from_events_bucketed(spark, sf_dir, minutes=15)


def _bars_15m_oracle() -> str:
    from pandas_ta_spark.sources.bars import bars_from_events_bucketed_sql

    return bars_from_events_bucketed_sql(minutes=15)


# ----------------------------------------------------- forward ichimoku ----

# shared by the Spark query AND its oracle so the twins cannot drift
ICHI_TENKAN, ICHI_KIJUN, ICHI_SENKOU = 9, 26, 52


def _ichimoku_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference ichimoku's SECOND return frame (the kijun-1-row
    forward cloud per symbol) as a suite query — the historical frame is
    oracled under the `ichimoku` key; this value-checks the projection
    (row subsetting + ts advancement) too."""
    from pandas_ta_spark.operators.overlap import ichimoku_forward

    bars = bars_from_events_cached(spark, sf_dir)
    out = ichimoku_forward(bars, ICHI_TENKAN, ICHI_KIJUN, ICHI_SENKOU)
    isa, isb = f"ISA_{ICHI_TENKAN}", f"ISB_{ICHI_KIJUN}"
    return out.select(
        "symbol", "ts",
        round_col(F.col(isa)).alias(isa),
        round_col(F.col(isb)).alias(isb),
    )


def _ichimoku_fwd_oracle() -> str:
    from pandas_ta_spark.functions.windows import sql_roll

    def mid(n: int) -> str:
        return (f"((({sql_roll('max', 'high', n)}) +"
                f" ({sql_roll('min', 'low', n)})) / 2)")

    fwd = ICHI_KIJUN - 1
    body = f""", aug AS (
    SELECT symbol, ts,
           (({mid(ICHI_TENKAN)}) + ({mid(ICHI_KIJUN)})) / 2 AS isa,
           {mid(ICHI_SENKOU)} AS isb,
           row_number() OVER (PARTITION BY symbol ORDER BY ts) AS rn,
           count(*) OVER (PARTITION BY symbol) AS mx
    FROM bars
)
SELECT symbol, ts + INTERVAL {fwd} HOUR AS ts,
       {sql_round('isa')} AS "ISA_{ICHI_TENKAN}",
       {sql_round('isb')} AS "ISB_{ICHI_KIJUN}"
FROM aug WHERE rn > mx - {fwd}"""
    return with_bars_cte(body)


# --------------------------------------------- cross-sectional beta ----

BETA_N = 24  # one day of hourly bars
# 1e-6 log-return quantization: |ln r| <= ~10 on the synthetic bars, so
# q <= 1e7, per-window sums <= 2.4e8, and every BIGINT product in the
# beta formula stays <= ~6e16 — comfortably inside 2^63 (simple returns
# reach ~8e3 here and overflowed even at this scale)
BETA_SCALE = 1e6


def _qret(lag_n: int = 1):
    """Guarded quantized log return ln(close / close[-lag_n]) on the
    (symbol, ts) ordering — microstructure's _qlog guard (positivity +
    NaN + inf legs on BOTH engines' semantics) reused for every
    log-return quantization in this module (ADVICE r8: an unguarded
    floor(ln(...))::long silently fabricates a 0 return on a NaN close
    in Spark, hard-errors in DuckDB, and diverges from the streaming
    twins' _lnq isfinite leg — a dirty close must yield an invalid row
    in all three). BETA_SCALE == microstructure MS_SCALE == 1e6, so the
    quantization grid is unchanged."""
    from pandas_ta_spark.ext.microstructure import _qlog

    ws = Window.partitionBy("symbol").orderBy("ts")
    return _qlog(F.col("close"), F.lag("close", lag_n).over(ws))


def _sql_qret(lag_n: int = 1) -> str:
    """DuckDB twin of _qret: same guard legs via microstructure's
    _sql_qlog over an inline lag window expression."""
    from pandas_ta_spark.ext.microstructure import _sql_qlog

    prev = f"lag(close, {lag_n}) OVER (PARTITION BY symbol ORDER BY ts)"
    return _sql_qlog("close", prev)


def _sql_glog_ret() -> str:
    """Guarded UNQUANTIZED SQL log return (signal_equity's strat_ret)."""
    from pandas_ta_spark.ext.microstructure import _sql_glog

    prev = "lag(close) OVER (PARTITION BY symbol ORDER BY ts)"
    return _sql_glog("close", prev)


def _rolling_corr_sums(x: str, y: str, ws):
    """Exact-integer rolling second-moment sums over the trailing BETA_N
    rows of the (symbol, ts) ordering: (n, n*Sxy - Sx*Sy, n*Sxx - Sx^2,
    n*Syy - Sy^2) for quantized-BIGINT columns ``x`` and ``y`` — the
    shared kernel of rolling_beta_24 and ret_autocorr_24. Rows where
    either side is NULL (warm-up lags) are excluded from every sum via
    the x*y NULL-propagation guard, so n counts complete pairs only.
    All sums are exact integers (associative -> identical under Spark's
    sequential frames and DuckDB's segment trees)."""
    wr = ws.rowsBetween(-(BETA_N - 1), 0)
    xy = F.col(x) * F.col(y)  # null if either side is null
    n = F.count(xy).over(wr)
    sx = F.sum(F.when(xy.isNotNull(), F.col(x))).over(wr)
    sy = F.sum(F.when(xy.isNotNull(), F.col(y))).over(wr)
    sxy = F.sum(xy).over(wr)
    sxx = F.sum(F.when(xy.isNotNull(), F.col(x) * F.col(x))).over(wr)
    syy = F.sum(F.when(xy.isNotNull(), F.col(y) * F.col(y))).over(wr)
    return n, n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy


def _rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling market beta and correlation per symbol — a CROSS-SECTIONAL
    operator the reference cannot express (pandas-ta sees one instrument
    per DataFrame; the equal-weight market return needs the whole panel).

    Per hourly bar: r = ln(close/lag(close)) (log returns — the synthetic
    prices span 0.01..387, so simple returns reach ~8000 and overflow the
    exact-integer power sums; log returns are bounded ~[-8, 9]); the
    market return is the
    equal-weight mean across symbols at the same ts (a partitionBy(ts)
    window — no join); beta/corr over the trailing BETA_N bars.

    Exactness: returns are quantized to 1e-6 BIGINTs (BETA_SCALE), so every rolling
    power sum (sum q, sum q^2, sum q*qm) is exact-integer — associative,
    hence identical under Spark's sequential frames and DuckDB's segment
    trees — and beta = (n*Sxy - Sx*Sy) / (n*Syy - Sy^2) is one exact-int
    division. No catastrophic cancellation of engine-divergent floats
    (the naive avg(xy)-avg(x)avg(y) form differences ~1e-6 floats whose
    last ulps differ per engine). corr converts the exact-int variance
    terms to doubles only for the final sqrt/divide (identical IEEE ops).

    100 TB shape: one shuffle to the ts panel (market window), one back
    to (symbol, ts) ordering for the rolling sums — both sized to the
    bar relation, which is already resampled far below tick volume."""
    bars = bars_from_events_cached(spark, sf_dir)
    ws = Window.partitionBy("symbol").orderBy("ts")
    df = bars.select("symbol", "ts", _qret().alias("q"))
    wt = Window.partitionBy("ts")
    # integer market mean at the same BETA_SCALE (1e6): exact sum / count, one
    # double division + floor -> identical integer in both engines
    qm = F.floor(
        F.sum("q").over(wt).cast("double") / F.count("q").over(wt) + F.lit(0.5)
    ).cast("long")
    df = df.select("symbol", "ts", "q", qm.alias("qm"))
    n, cov_s, varx_s, vary_s = _rolling_corr_sums("q", "qm", ws)
    full = n >= BETA_N
    beta = F.when(full & (vary_s != 0), cov_s / vary_s)
    corr = F.when(
        full & (varx_s > 0) & (vary_s > 0),
        cov_s.cast("double")
        / F.sqrt(varx_s.cast("double") * vary_s.cast("double")),
    )
    return df.select(
        "symbol", "ts",
        n.cast("long").alias("n_obs"),
        round_col(beta).alias("beta"),
        round_col(corr).alias("corr"),
    )


ROLLING_BETA_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, ts, {_sql_qret()} AS q
    FROM bars
),
mkt AS (
    SELECT symbol, ts, q,
           CAST(floor(CAST(sum(q) OVER (PARTITION BY ts) AS DOUBLE)
                      / count(q) OVER (PARTITION BY ts) + 0.5) AS BIGINT) AS qm
    FROM r
),
acc AS (
    SELECT symbol, ts,
           count(q * qm) OVER w AS n,
           sum(CASE WHEN q * qm IS NOT NULL THEN q END) OVER w AS sx,
           sum(CASE WHEN q * qm IS NOT NULL THEN qm END) OVER w AS sy,
           sum(q * qm) OVER w AS sxy,
           sum(CASE WHEN q * qm IS NOT NULL THEN q * q END) OVER w AS sxx,
           sum(CASE WHEN q * qm IS NOT NULL THEN qm * qm END) OVER w AS syy
    FROM mkt
    WINDOW w AS (PARTITION BY symbol ORDER BY ts
                 ROWS BETWEEN {BETA_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts, CAST(n AS BIGINT) AS n_obs,
       {sql_round(f"CASE WHEN n >= {BETA_N} AND n * syy - sy * sy <> 0 "
                  "THEN (n * sxy - sx * sy) / (n * syy - sy * sy) END")} AS beta,
       {sql_round(f"CASE WHEN n >= {BETA_N} AND n * sxx - sx * sx > 0 "
                  "AND n * syy - sy * sy > 0 "
                  "THEN CAST(n * sxy - sx * sy AS DOUBLE) "
                  "/ sqrt(CAST(n * sxx - sx * sx AS DOUBLE) "
                  "* CAST(n * syy - sy * sy AS DOUBLE)) END")} AS corr
FROM acc
""".strip())


# ------------------------------------------------ gap-fill resampling ----

def bars_gapfill(bars: DataFrame) -> DataFrame:
    """Gap-filled hourly close series per symbol — the distributed
    ``resample('1h').ffill()`` (pandas semantics the reference's users
    lean on before computing indicators over sparse sessions): a full
    hour spine from each symbol's first to last bar, close carried
    forward across missing hours, volume ZERO on them (an empty bucket
    traded nothing — carrying volume forward would fabricate turnover),
    and an is_gap flag so downstream ops can mask fabricated rows.

    Plan: the spine is an explode of one min/max-per-symbol aggregate
    (rows = hours spanned, exactly the output size), zero-join-fanout
    left join on (symbol, h) — hour spreads the symbol key, no skew —
    then ONE ordered window pass for the carry. The DuckDB twin fills
    via the engine's native ASOF JOIN (b.ts <= h) instead of a carry
    window: independent mechanisms, identical semantics.

    NULL-close bars (ADVICE r8): is_gap tests bar EXISTENCE on both
    sides (a join marker here, b.ts IS NULL in the twin) — a present
    bar carrying a NULL close is is_gap=0, and close_ff carries the
    last NON-NULL close over it in both engines (ignorenulls here, a
    close-filtered ASOF side in the twin)."""
    hour = F.expr("INTERVAL 1 HOUR")
    span = bars.groupBy("symbol").agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx"))
    spine = span.select(
        "symbol", F.explode(F.sequence("mn", "mx", hour)).alias("h"))
    j = spine.join(
        bars.select("symbol", F.col("ts").alias("h"), "close", "volume",
                    F.lit(1).alias("present")),
        ["symbol", "h"], "left")
    w = (
        Window.partitionBy("symbol").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "symbol", "h",
        round_col(F.last("close", ignorenulls=True).over(w)).alias("close_ff"),
        round_col(F.coalesce("volume", F.lit(0.0))).alias("volume"),
        F.col("present").isNull().cast("int").alias("is_gap"),
    )


def _bars_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bars_gapfill(bars_from_events_cached(spark, sf_dir))


BARS_GAPFILL_SQL = with_bars_cte(f"""
, span AS (
    SELECT symbol, min(ts) AS mn, max(ts) AS mx FROM bars GROUP BY 1
),
spine AS (
    SELECT symbol, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
    FROM span
)
SELECT s.symbol, s.h,
       {sql_round('f.close')} AS close_ff,
       {sql_round('coalesce(b.volume, 0)')} AS volume,
       CASE WHEN b.ts IS NULL THEN 1 ELSE 0 END AS is_gap
FROM spine s
ASOF LEFT JOIN (SELECT * FROM bars WHERE close IS NOT NULL) f
    ON f.symbol = s.symbol AND f.ts <= s.h
LEFT JOIN bars b ON b.symbol = s.symbol AND b.ts = s.h
""".strip())


# ---------------------------------------------- return autocorrelation ----

def ret_autocorr(bars: DataFrame) -> DataFrame:
    """Rolling lag-1 return autocorrelation per symbol — the
    regime-detection statistic (positive = momentum regime, negative =
    mean-reversion; the practitioner's rolling variance-ratio proxy).
    Same exact-integer kernel as rolling_beta_24 (shared
    ``_rolling_corr_sums``), with the market return replaced by the
    PREVIOUS bar's own return: corr(r_t, r_{t-1}) over the trailing
    BETA_N bars.

    ONE shuffle on symbol; two stacked lag expressions and the rolling
    sums reuse the same (symbol, ts) sort."""
    ws = Window.partitionBy("symbol").orderBy("ts")
    df = (bars.select("symbol", "ts", _qret().alias("q"))
          .select("symbol", "ts", "q", F.lag("q").over(ws).alias("ql")))
    n, cov_s, varx_s, vary_s = _rolling_corr_sums("q", "ql", ws)
    full = n >= BETA_N
    ac = F.when(
        full & (varx_s > 0) & (vary_s > 0),
        cov_s.cast("double")
        / F.sqrt(varx_s.cast("double") * vary_s.cast("double")),
    )
    return df.select(
        "symbol", "ts",
        n.cast("long").alias("n_obs"),
        round_col(ac).alias("autocorr"),
    )


def _ret_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ret_autocorr(bars_from_events_cached(spark, sf_dir))


RET_AUTOCORR_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, ts, {_sql_qret()} AS q
    FROM bars
),
l AS (
    SELECT symbol, ts, q,
           lag(q) OVER (PARTITION BY symbol ORDER BY ts) AS ql
    FROM r
),
acc AS (
    SELECT symbol, ts,
           count(q * ql) OVER w AS n,
           sum(CASE WHEN q * ql IS NOT NULL THEN q END) OVER w AS sx,
           sum(CASE WHEN q * ql IS NOT NULL THEN ql END) OVER w AS sy,
           sum(q * ql) OVER w AS sxy,
           sum(CASE WHEN q * ql IS NOT NULL THEN q * q END) OVER w AS sxx,
           sum(CASE WHEN q * ql IS NOT NULL THEN ql * ql END) OVER w AS syy
    FROM l
    WINDOW w AS (PARTITION BY symbol ORDER BY ts
                 ROWS BETWEEN {BETA_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts, CAST(n AS BIGINT) AS n_obs,
       {sql_round(f"CASE WHEN n >= {BETA_N} AND n * sxx - sx * sx > 0 "
                  "AND n * syy - sy * sy > 0 "
                  "THEN CAST(n * sxy - sx * sy AS DOUBLE) "
                  "/ sqrt(CAST(n * sxx - sx * sx AS DOUBLE) "
                  "* CAST(n * syy - sy * sy AS DOUBLE)) END")} AS autocorr
FROM acc
""".strip())


# ------------------------------------------------- drawdown durations ----

def drawdown_episodes(bars: DataFrame) -> DataFrame:
    """Time-under-water manifest: one row per drawdown EPISODE (a maximal
    run of bars strictly below the running close high), with start/end
    timestamps, bar count, and the episode's deepest drawdown — the
    duration/depth analytics the scalar ``drawdown`` op (cummax - close)
    cannot answer ("how LONG was the longest stretch under water?").

    The sessionization trick, not a join: at_high = (close >= cummax)
    marks recovery bars; its running sum is the episode group id (every
    underwater bar inherits the id of the last high before it), so ONE
    ordered window pass assigns episodes and one aggregation emits the
    manifest. First bar is a high by construction (cummax = close), so
    group ids start at 1 and underwater rows always follow some high."""
    ws = Window.partitionBy("symbol").orderBy("ts")
    wall = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mx = F.max("close").over(wall)
    at_high = (F.col("close") >= mx).cast("long")
    df = bars.select(
        "symbol", "ts", "close",
        mx.alias("mx"), at_high.alias("at_high"))
    df = df.withColumn("grp", F.sum("at_high").over(wall))
    return (
        df.filter(F.col("at_high") == 0)
        .groupBy("symbol", "grp")
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.count(F.lit(1)).alias("n_bars"),
            round_col(F.max(F.col("mx") - F.col("close"))).alias("max_dd"),
        )
        .select("symbol", F.col("grp").cast("long").alias("episode"),
                "start_ts", "end_ts", "n_bars", "max_dd")
    )


def _drawdown_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return drawdown_episodes(bars_from_events_cached(spark, sf_dir))


DRAWDOWN_EPISODES_SQL = with_bars_cte(f"""
, m AS (
    SELECT symbol, ts, close,
           max(close) OVER w AS mx,
           CASE WHEN close >= max(close) OVER w THEN 1 ELSE 0 END AS at_high
    FROM bars
    WINDOW w AS (PARTITION BY symbol ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
g AS (
    SELECT symbol, ts, close, mx, at_high,
           sum(at_high) OVER (PARTITION BY symbol ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS grp
    FROM m
)
SELECT symbol, CAST(grp AS BIGINT) AS episode,
       min(ts) AS start_ts, max(ts) AS end_ts,
       count(*) AS n_bars,
       {sql_round('max(mx - close)')} AS max_dd
FROM g WHERE at_high = 0
GROUP BY symbol, grp
""".strip())


# ---------------------------------------------------- variance ratio ----

VR_Q = 5  # aggregation horizon of the Lo-MacKinlay statistic


def variance_ratio(bars: DataFrame) -> DataFrame:
    """Rolling Lo-MacKinlay variance ratio per symbol:
    VR(q) = Var(r_q) / (q * Var(r_1)) over the trailing BETA_N bars,
    where r_1 is the 1-bar log return and r_q the q-bar log return.
    VR ~ 1 under a random walk, > 1 in trending (momentum) regimes,
    < 1 under mean reversion — the classical regime test
    (Lo & MacKinlay 1988), complementing ``ret_autocorr_24``.

    Exactness: both returns are quantized to BIGINT; the shared
    ``_rolling_corr_sums`` kernel yields n*Sxx - Sx^2 for each as exact
    integers restricted to rows where BOTH horizons exist (shared n), so
    VR is ONE double division of two exact integers — identical in both
    engines. ONE shuffle on symbol; the q-horizon lag reuses the same
    (symbol, ts) sort."""
    ws = Window.partitionBy("symbol").orderBy("ts")
    df = bars.select("symbol", "ts", _qret().alias("q1"),
                     _qret(VR_Q).alias("qq"))
    n, _cov, var1_s, varq_s = _rolling_corr_sums("q1", "qq", ws)
    full = n >= BETA_N
    vr = F.when(
        full & (var1_s > 0),
        varq_s.cast("double") / (F.lit(float(VR_Q)) * var1_s.cast("double")),
    )
    return df.select(
        "symbol", "ts",
        n.cast("long").alias("n_obs"),
        round_col(vr).alias("vr"),
    )


def _variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    return variance_ratio(bars_from_events_cached(spark, sf_dir))


VARIANCE_RATIO_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, ts,
           {_sql_qret()} AS q1,
           {_sql_qret(VR_Q)} AS qq
    FROM bars
),
acc AS (
    SELECT symbol, ts,
           count(q1 * qq) OVER w AS n,
           sum(CASE WHEN q1 * qq IS NOT NULL THEN q1 END) OVER w AS sx,
           sum(CASE WHEN q1 * qq IS NOT NULL THEN qq END) OVER w AS sy,
           sum(CASE WHEN q1 * qq IS NOT NULL THEN q1 * q1 END) OVER w AS sxx,
           sum(CASE WHEN q1 * qq IS NOT NULL THEN qq * qq END) OVER w AS syy
    FROM r
    WINDOW w AS (PARTITION BY symbol ORDER BY ts
                 ROWS BETWEEN {BETA_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts, CAST(n AS BIGINT) AS n_obs,
       {sql_round(f"CASE WHEN n >= {BETA_N} AND n * sxx - sx * sx > 0 "
                  "THEN CAST(n * syy - sy * sy AS DOUBLE) "
                  f"/ ({float(VR_Q)!r} * CAST(n * sxx - sx * sx AS DOUBLE)) "
                  "END")} AS vr
FROM acc
""".strip())


# ---------------------------------------------- session distribution ----

SESSION_QS = (0.5, 0.9)


def _session_stats(spark: SparkSession, sf_dir: str,
                   approx: bool | None = None) -> DataFrame:
    """Session-distribution rollup: the one-row summary product analytics
    puts on a dashboard — session count, rank-selected p50/p90 duration,
    mean events per session, and bounce share (single-event sessions).
    Composes the sessionize_30m manifest, so the gap rule and its
    streaming twin stay single-sourced.

    Below the size threshold percentiles are exact rank picks
    (floor((n-1)*q)+1 over a deterministic (duration, user_id,
    session_no) order); the global rank window sorts the SESSION
    manifest, orders of magnitude smaller than the event log. Above it
    (``approx=None`` auto-gates on Catalyst's size estimate) the window
    swaps to mergeable ``approx_percentile`` — same schema, no
    single-partition sort. Ratios divide exact integers either way."""
    s = _sessionize(spark, sf_dir)
    if approx is None:
        approx = use_approx_percentile(s)
    if approx:
        n_total = F.count(F.lit(1))
        return s.agg(
            n_total.alias("n_sessions"),
            *[F.percentile_approx(
                "duration_sec", q, APPROX_PERCENTILE_ACCURACY)
              .alias(f"p{int(q * 100)}_duration_sec")
              for q in SESSION_QS],
            round_col(F.sum("n_events").cast("double") / n_total)
            .alias("mean_events"),
            round_col(F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
                      .cast("double") / n_total).alias("bounce_share"),
        )
    n = F.count(F.lit(1)).over(Window.partitionBy())
    rk = F.row_number().over(Window.partitionBy().orderBy(
        "duration_sec", "user_id", "session_no"))
    ranked = s.select(
        "duration_sec", "n_events", rk.alias("rk"), n.alias("n"))
    picks = [
        rank_pick(q, F.col("duration_sec"), F.col("rk"), F.col("n"))
        .alias(f"p{int(q * 100)}_duration_sec")
        for q in SESSION_QS
    ]
    return ranked.agg(
        F.max("n").alias("n_sessions"),
        *picks,
        round_col(F.sum("n_events").cast("double") / F.max("n"))
        .alias("mean_events"),
        round_col(F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
                  .cast("double") / F.max("n")).alias("bounce_share"),
    )


def _session_stats_oracle() -> str:
    picks = ",\n       ".join(
        f"{sql_rank_pick(q, 'duration_sec')}"
        f" AS p{int(q * 100)}_duration_sec" for q in SESSION_QS)
    return f"""
WITH sess AS (
{SESSIONIZE_SQL}
),
ranked AS (
    SELECT duration_sec, n_events,
           row_number() OVER (ORDER BY duration_sec, user_id, session_no)
               AS rk,
           count(*) OVER () AS n
    FROM sess
)
SELECT max(n) AS n_sessions,
       {picks},
       {sql_round('CAST(sum(n_events) AS DOUBLE) / max(n)')} AS mean_events,
       {sql_round('CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) '
                  'AS DOUBLE) / max(n)')} AS bounce_share
FROM ranked
""".strip()


# ------------------------------------------------- hourly seasonality ----

def _hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraday seasonality profile per (symbol, hour-of-day): mean
    absolute log return (volatility clock — the U-shape every venue
    shows) and mean volume. The calendar-bucket analytics a
    one-frame-per-instrument reference leaves to the user.

    Exactness: |r| quantized to BIGINT, volume already integral, so
    both folds are exact integer sums; the two means are single double
    divisions. The return mean averages over bars WITH a previous bar
    (n_rets); the volume mean averages over ALL bars in the bucket
    (n_bars) — a symbol's first bar trades volume but has no return,
    and must not be dropped from the volume clock. ONE shuffle on
    symbol for the return lag, then one 24*S-group aggregation with
    map-side partials. Output 24*S rows."""
    bars = bars_from_events_cached(spark, sf_dir)
    aq = F.abs(_qret())
    df = bars.select(
        "symbol", F.hour("ts").alias("hod"),
        aq.alias("aq"),
        F.floor(F.col("volume")).cast("long").alias("vol"))
    g = (df.groupBy("symbol", "hod")
         .agg(F.count(F.lit(1)).alias("n_bars"),
              F.count("aq").alias("n_rets"),
              F.sum("aq").alias("saq"), F.sum("vol").alias("sv")))
    return g.select(
        "symbol", F.col("hod").cast("long").alias("hod"),
        "n_bars", "n_rets",
        round_col(F.when(
            F.col("n_rets") > 0,
            F.col("saq").cast("double") / F.col("n_rets")
            / F.lit(BETA_SCALE))).alias("mean_abs_ret"),
        round_col(F.col("sv").cast("double") / F.col("n_bars"))
        .alias("mean_volume"),
    )


HOURLY_SEASONALITY_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, CAST(hour(ts) AS BIGINT) AS hod,
           abs({_sql_qret()}) AS aq,
           CAST(floor(volume) AS BIGINT) AS vol
    FROM bars
)
SELECT symbol, hod, count(*) AS n_bars, count(aq) AS n_rets,
       {sql_round("CASE WHEN count(aq) > 0 THEN "
                  "CAST(sum(aq) AS DOUBLE) / count(aq) "
                  f"/ {BETA_SCALE!r} END")} AS mean_abs_ret,
       {sql_round('CAST(sum(vol) AS DOUBLE) / count(*)')} AS mean_volume
FROM r
GROUP BY symbol, hod
""".strip())


# ---------------------------------------------------- lead-lag matrix ----

def lead_lag_corr(bars: DataFrame, top_n: int | None = 100,
                  symbols=None) -> DataFrame:
    """Cross-symbol lead-lag matrix: for every ORDERED symbol pair
    (leader, follower), corr(r_follower(t), r_leader(t-1)) over the
    aligned hourly grid — "does yesterday's move in A predict today's
    move in B?". A cross-sectional operator the one-frame-per-instrument
    reference cannot express at all.

    Plan: quantized returns (one shuffle on symbol), the leader side
    pre-lagged with the SAME sort, then a single equi-join on ts and one
    (leader, follower) aggregation of exact-integer corr sums — the
    final corr is one double expression over exact integers, identical
    in both engines. Output is S*(S-1) rows over the candidate universe.

    Scale: the S^2 fan-out is BOUNDED BY DEFAULT (top_n=100, matching
    pair_spread_z's PAIR_TOP_N) — the universe is the top ``top_n``
    dollar-volume symbols (or an explicit ``symbols`` list), applied as
    a broadcast semi-join before the return computation, so both join
    sides shrink together; the join itself stays an equi-join either
    way. ``top_n=None`` opts back into the full S^2."""
    from pandas_ta_spark.ext.microstructure import bound_universe

    bars = bound_universe(bars, top_n, symbols)
    ws = Window.partitionBy("symbol").orderBy("ts")
    # both lags in ONE window pass over one relation; the self-join's two
    # sides are projections of it, so the exchange is computed once and
    # reused (ReusedExchange in the physical plan)
    rets = bars.select("symbol", "ts", _qret().alias("q")).select(
        "symbol", "ts", "q", F.lag("q").over(ws).alias("ql"))
    lead = rets.select(F.col("symbol").alias("leader"), "ts", "ql")
    foll = rets.select(F.col("symbol").alias("follower"), "ts", "q")
    j = (foll.join(lead, "ts")
         .filter(F.col("leader") != F.col("follower"))
         .filter(F.col("q").isNotNull() & F.col("ql").isNotNull()))
    # 128-bit second moments (DECIMAL(38,0) / the oracle's HUGEINT): the
    # history is UNBOUNDED — unlike the 24-row rolling kernels, int64
    # n*Sxx would wrap around ~1e5 volatile hourly bars (the r6
    # BETA_SCALE overflow class) while DuckDB silently promotes
    d38 = "decimal(38,0)"
    g = j.groupBy("leader", "follower").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("q").cast(d38)).alias("sx"),
        F.sum(F.col("ql").cast(d38)).alias("sy"),
        F.sum((F.col("q") * F.col("ql")).cast(d38)).alias("sxy"),
        F.sum((F.col("q") * F.col("q")).cast(d38)).alias("sxx"),
        F.sum((F.col("ql") * F.col("ql")).cast(d38)).alias("syy"),
    )
    n, sx, sy = F.col("n").cast("decimal(38,0)"), F.col("sx"), F.col("sy")
    cov_s = n * F.col("sxy") - sx * sy
    varx_s = n * F.col("sxx") - sx * sx
    vary_s = n * F.col("syy") - sy * sy
    corr = F.when(
        (n >= 2) & (varx_s > 0) & (vary_s > 0),
        cov_s.cast("double")
        / F.sqrt(varx_s.cast("double") * vary_s.cast("double")),
    )
    return g.select(
        "leader", "follower",
        n.cast("long").alias("n_obs"),
        round_col(corr).alias("leadlag_corr"),
    )


def _lead_lag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # default bound (<=9900 ordered pairs); the sf testdata's 5 symbols
    # all qualify, so the gate oracle below needs no universe CTE
    return lead_lag_corr(bars_from_events_cached(spark, sf_dir))


LEAD_LAG_SQL = with_bars_cte(f"""
, r AS (
    SELECT symbol, ts, {_sql_qret()} AS q
    FROM bars
),
l AS (
    SELECT symbol AS leader, ts,
           lag(q) OVER (PARTITION BY symbol ORDER BY ts) AS ql
    FROM r
),
acc AS (
    SELECT l.leader, f.symbol AS follower,
           count(*) AS n,
           sum(CAST(f.q AS HUGEINT)) AS sx,
           sum(CAST(l.ql AS HUGEINT)) AS sy,
           sum(CAST(f.q AS HUGEINT) * l.ql) AS sxy,
           sum(CAST(f.q AS HUGEINT) * f.q) AS sxx,
           sum(CAST(l.ql AS HUGEINT) * l.ql) AS syy
    FROM r f JOIN l ON f.ts = l.ts AND f.symbol <> l.leader
    WHERE f.q IS NOT NULL AND l.ql IS NOT NULL
    GROUP BY l.leader, f.symbol
)
SELECT leader, follower, CAST(n AS BIGINT) AS n_obs,
       {sql_round("CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 "
                  "AND n * syy - sy * sy > 0 "
                  "THEN CAST(n * sxy - sx * sy AS DOUBLE) "
                  "/ sqrt(CAST(n * sxx - sx * sx AS DOUBLE) "
                  "* CAST(n * syy - sy * sy AS DOUBLE)) END")} AS leadlag_corr
FROM acc
""".strip())


SUITE = {
    "rolling_beta_24": ExtQuery(_rolling_beta, ROLLING_BETA_SQL),
    "ret_autocorr_24": ExtQuery(_ret_autocorr, RET_AUTOCORR_SQL),
    "variance_ratio_5_24": ExtQuery(_variance_ratio, VARIANCE_RATIO_SQL),
    "lead_lag_corr_1h": ExtQuery(_lead_lag_corr, LEAD_LAG_SQL),
    "hourly_seasonality": ExtQuery(_hourly_seasonality,
                                   HOURLY_SEASONALITY_SQL),
    "drawdown_episodes": ExtQuery(_drawdown_episodes, DRAWDOWN_EPISODES_SQL),
    "bars_gapfill_1h": ExtQuery(_bars_gapfill, BARS_GAPFILL_SQL),
    "xsec_rank_ret1": ExtQuery(_xsec_rank, XSEC_RANK_SQL),
    "xsec_zscore_ret1": ExtQuery(_xsec_zscore, XSEC_ZSCORE_SQL),
    "bars_daily": ExtQuery(_bars_daily, _bars_daily_oracle()),
    "bars_15m": ExtQuery(_bars_15m, _bars_15m_oracle()),
    "series_integrity": ExtQuery(_series_integrity, SERIES_INTEGRITY_SQL),
    "signal_equity_8_21": ExtQuery(_signal_equity, _signal_equity_oracle()),
    "ichimoku_forward": ExtQuery(_ichimoku_fwd, _ichimoku_fwd_oracle()),
    "asof_join_bars": ExtQuery(_asof_join, ASOF_JOIN_SQL),
    "asof_hour_lookup": ExtQuery(_asof_hour_lookup, ASOF_HOUR_LOOKUP_SQL),
    "funnel_view_click_purchase": ExtQuery(_funnel, FUNNEL_SQL),
    "sessionize_30m": ExtQuery(_sessionize, SESSIONIZE_SQL),
    "session_stats_30m": ExtQuery(_session_stats, _session_stats_oracle()),
    "mtf_sma_asof": ExtQuery(_mtf_sma, MTF_SMA_SQL),
    "retention_cohorts": ExtQuery(_retention_cohorts, RETENTION_SQL),
}
