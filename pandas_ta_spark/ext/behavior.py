"""Event-log behavior analytics: last-touch attribution, RFM
segmentation, and robust rate-anomaly telemetry (SURVEY.md §7.5 tier —
the event-stream rollups a 100 TB product-analytics / training-telemetry
pipeline runs daily; none exist in the reference, which sees one
instrument per DataFrame).

Cross-engine determinism rules (ext/__init__ rationale):

- attribution is pure timestamp/integer arithmetic (microsecond diffs);
- RFM quantile boundaries are exact interpolated percentiles of INTEGER
  metrics — (a+b)/2-style doubles that both engines produce bit-equal —
  and scores compare integers against those boundaries (no global-sort
  ntile: see ``_rfm`` docstring for the 100 TB rationale);
- rate anomaly uses median/MAD of integer counts (0.25-step-exact
  doubles), one literal multiply and one division, rounded via the
  shared ``round_col``/``sql_round`` pair.
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
from pandas_ta_spark.sources.bars import load_table

# ----------------------------------------------- last-touch attribution ----


def attribution_last_touch(ev: DataFrame) -> DataFrame:
    """Attribute each purchase to the user's latest click STRICTLY before
    it (marketing last-touch). ``ev`` carries (event_id, user_id, ts,
    event_type).

    Union-and-carry, the same one-shuffle shape as ``asof_join``: click
    rows and purchase rows sort together per user on (ts, is_click,
    event_id) — purchases (0) before clicks (1) at equal ts, so a
    same-instant click never attributes (strictly-before) — and
    ``last(click, ignorenulls=True)`` carries the prevailing click
    forward. Ties between clicks at one timestamp resolve to the highest
    event_id (the ascending sort carries the last one), mirrored in the
    oracle by a max(event_id) pre-aggregation under DuckDB's native
    ASOF JOIN — two independent mechanisms, identical semantics.

    100 TB shape: ONE shuffle on user_id + one sort; cost scales with
    rows, never with purchases x clicks (the self-join formulation is a
    range-join blow-up). Purchases with no prior click keep NULL click
    columns — dropping them would silently overstate attribution."""
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts",
        F.lit(1).alias("is_click"),
        F.col("event_id").alias("ord_id"),
        F.struct(
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_event_id"),
        ).alias("click"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.lit(0).alias("is_click"),
        F.col("event_id").alias("ord_id"),
        F.lit(None).cast(clicks.schema["click"].dataType).alias("click"),
    )
    u = buys.unionByName(clicks).withColumn("event_id", F.col("ord_id"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click", "ord_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("c", F.last("click", ignorenulls=True).over(w))
        .filter(F.col("is_click") == 0)
        .select(
            "event_id", "user_id", "ts",
            F.col("c.click_event_id").alias("click_event_id"),
            F.col("c.click_ts").alias("click_ts"),
            F.expr("timestampdiff(MICROSECOND, c.click_ts, ts)").alias("gap_us"),
        )
    )


def _attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type")
    return attribution_last_touch(ev)


ATTRIBUTION_SQL = """
WITH c AS (
    SELECT user_id, ts, max(event_id) AS click_event_id
    FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
p AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts,
       c.click_event_id, c.ts AS click_ts,
       date_diff('microsecond', c.ts, p.ts) AS gap_us
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND c.ts < p.ts
""".strip()


# --------------------------------------------------- RFM segmentation ----

RFM_QS = (0.2, 0.4, 0.6, 0.8)  # quintile boundaries


def _rfm(spark: SparkSession, sf_dir: str,
         approx: bool | None = None) -> DataFrame:
    """RFM segmentation: per user, recency (days since last activity,
    anchored to the corpus max day), frequency (event count), monetary
    (purchase value in exact cents), each scored 1-5 against the
    population quintiles, plus a coarse segment label.

    NOT ntile: a global ntile(5) funnels every user through ONE sorted
    partition — the classic 100 TB scale-killer. Instead the quintile
    BOUNDARIES are one 4-double-per-metric aggregate, broadcast, and
    scoring is a pure projection (1 + #boundaries strictly below the
    metric), so the plan is two aggregations + a broadcast join however
    many users exist. Past the size threshold (``approx=None``
    auto-gates on Catalyst's input-size estimate) the boundary agg
    swaps to approx_percentile (mergeable sketch, fixed-size partial
    buffers — the exact `percentile` aggregate buffers every value)
    with nothing else changing; the exact interpolated form below it
    is what DuckDB can reproduce bit-for-bit (integer metrics ->
    (a+b)/2-exact boundaries).

    Monetary sums exact integer cents (floor(value*100+0.5)), the
    fixed-point rule used by every unbounded sum in this repo."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.date_trunc("day", F.col("ts"))).alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.coalesce(
            F.sum(F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))),
            F.lit(0),
        ).alias("monetary_cents"),
    )
    # ONE 1-row aggregate carries the anchor AND all three boundary
    # arrays (the first draft used a third branch — and a third scan of
    # the event log — just for the anchor). recency = anchor - last_day
    # is a monotone DECREASING transform of last_day, and linear-
    # interpolated percentiles commute with such transforms by
    # reflection: Q_recency(q) = anchor - Q_last_day(1-q). Day numbers
    # are exact integers, so the identity is exact up to the shared
    # interpolation arithmetic.
    qs = list(RFM_QS)
    # 1-q for the symmetric quintile grid == the grid reversed — using
    # the canonical literals avoids 1-0.8 = 0.19999999999999996 leaking
    # into the generated SQL
    rev_qs = list(reversed(RFM_QS))
    assert all(a + b == 1 for a, b in zip(qs, rev_qs))
    epoch = "DATE'1970-01-01'"
    if approx is None:
        approx = use_approx_percentile(per_user)
    if approx:
        # same reflection identity (rank-based picks commute with
        # monotone transforms within the sketch's rank error); sketch
        # buffers are fixed-size and mergeable, so the 1-row exchange
        # moves KB, not the full per-user relation
        acc = APPROX_PERCENTILE_ACCURACY
        pctl = (lambda col, grid:
                f"approx_percentile({col}, array({', '.join(map(str, grid))}),"
                f" {acc})")
    else:
        pctl = (lambda col, grid:
                f"percentile({col}, array({', '.join(map(str, grid))}))")
    bounds = per_user.agg(
        F.max("last_day").alias("anchor_day"),
        F.expr(pctl(f"datediff(last_day, {epoch})", rev_qs)).alias("db"),
        F.expr(pctl("frequency", qs)).alias("fb"),
        F.expr(pctl("monetary_cents", qs)).alias("mb"),
    ).select(
        "anchor_day",
        # boundaries 1e-6-rounded on BOTH engines: true boundary values
        # are q-grid fractions of integer metrics, so the shared floor
        # rule absorbs the engines' interpolation-arithmetic ulps (the
        # reflected form here vs the oracle's direct quantile_cont)
        F.expr(f"transform(db, x -> floor((datediff(anchor_day, {epoch})"
               " - x) * 1000000.0 + 0.5) / 1000000.0)").alias("rb"),
        F.expr("transform(fb, x -> floor(x * 1000000.0 + 0.5)"
               " / 1000000.0)").alias("fb"),
        F.expr("transform(mb, x -> floor(x * 1000000.0 + 0.5)"
               " / 1000000.0)").alias("mb"),
    )

    def score_above(metric: str, arr: str):
        # 1 + number of boundaries the metric strictly exceeds
        return (F.lit(1) + sum(
            (F.col(metric) > F.col(arr)[i]).cast("int") for i in range(4)
        )).cast("int")

    def score_below(metric: str, arr: str):
        # recency: LOWER is better -> count boundaries it is strictly under
        return (F.lit(1) + sum(
            (F.col(metric) < F.col(arr)[i]).cast("int") for i in range(4)
        )).cast("int")

    scored = (
        per_user.crossJoin(F.broadcast(bounds))
        .withColumn(
            "recency_days",
            F.datediff(F.col("anchor_day"), F.col("last_day")).cast("long"))
        .select(
            "user_id", "recency_days", "frequency", "monetary_cents",
            score_below("recency_days", "rb").alias("r_score"),
            score_above("frequency", "fb").alias("f_score"),
            score_above("monetary_cents", "mb").alias("m_score"),
        )
    )
    segment = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion")
        .when(F.col("r_score") >= 4, "recent")
        .when(F.col("f_score") >= 4, "loyal_at_risk")
        .when(F.col("m_score") >= 4, "big_spender_lapsed")
        .otherwise("hibernating")
    )
    return scored.withColumn("segment", segment)


def _rfm_oracle() -> str:
    qs = ", ".join(str(q) for q in RFM_QS)

    def above(metric: str, b: str) -> str:
        return "1 + " + " + ".join(
            f"CASE WHEN {metric} > {b}[{i + 1}] THEN 1 ELSE 0 END"
            for i in range(4))

    def below(metric: str, b: str) -> str:
        return "1 + " + " + ".join(
            f"CASE WHEN {metric} < {b}[{i + 1}] THEN 1 ELSE 0 END"
            for i in range(4))

    return f"""
WITH per_user AS (
    SELECT user_id,
           max(date_trunc('day', ts)) AS last_day,
           count(*) AS frequency,
           CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0)
                AS BIGINT) AS monetary_cents
    FROM events GROUP BY 1
),
anchor AS (SELECT max(date_trunc('day', ts)) AS anchor_day FROM events),
base AS (
    SELECT user_id,
           CAST(date_diff('day', last_day, anchor_day) AS BIGINT)
               AS recency_days,
           frequency, monetary_cents
    FROM per_user, anchor
),
bounds AS (
    SELECT list_transform(quantile_cont(recency_days, [{qs}]),
                          x -> floor(x * 1000000.0 + 0.5) / 1000000.0) AS rb,
           list_transform(quantile_cont(frequency, [{qs}]),
                          x -> floor(x * 1000000.0 + 0.5) / 1000000.0) AS fb,
           list_transform(quantile_cont(monetary_cents, [{qs}]),
                          x -> floor(x * 1000000.0 + 0.5) / 1000000.0) AS mb
    FROM base
),
scored AS (
    SELECT user_id, recency_days, frequency, monetary_cents,
           CAST({below('recency_days', 'rb')} AS INT) AS r_score,
           CAST({above('frequency', 'fb')} AS INT) AS f_score,
           CAST({above('monetary_cents', 'mb')} AS INT) AS m_score
    FROM base, bounds
)
SELECT user_id, recency_days, frequency, monetary_cents,
       r_score, f_score, m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
            WHEN r_score >= 4 THEN 'recent'
            WHEN f_score >= 4 THEN 'loyal_at_risk'
            WHEN m_score >= 4 THEN 'big_spender_lapsed'
            ELSE 'hibernating' END AS segment
FROM scored
""".strip()


# ------------------------------------------------ rate-anomaly telemetry ----

MAD_K = 1.4826  # consistency constant: MAD -> sigma under normality
ANOMALY_Z = 3.5


# NOTE: the zero-filled hour spine below (span min/max -> sequence
# explode -> left join -> coalesce 0) is the same gap-fill rule as
# relational.py's bars_gapfill; keep the inclusive bounds and 1-hour
# step aligned if either changes.
def rate_anomaly(ev: DataFrame) -> DataFrame:
    """Robust per-stream rate anomaly: hourly event counts per
    event_type (ZERO-FILLED over each type's hour span — a silent outage
    is the anomaly that matters most), flagged by the median/MAD robust
    z-score (|z| > 3.5), the standard telemetry rule that a single spike
    cannot poison the way a mean/stdev baseline can.

    Plan: one count aggregation, a per-type hour spine (explode of one
    4-row-per-type min/max agg) zero-filled by a co-partitioned left
    join on (event_type, hour) — the hour component spreads the 5-value
    type key, so no skew — then median and MAD as two stacked window
    aggregates over one per-type partitioning of the already-tiny hourly
    relation. Counts are integers, so both medians are
    interpolated (a+b)/2-exact doubles; z is one literal multiply + one
    division, rounded through the shared helper; the flag tests the
    ROUNDED z so both engines flag identical rows. ``ev`` carries
    (event_type, ts)."""
    counts = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hour = F.expr("INTERVAL 1 HOUR")
    span = counts.groupBy("event_type").agg(
        F.min("h").alias("mn"), F.max("h").alias("mx"))
    spine = span.select(
        "event_type", F.explode(F.sequence("mn", "mx", hour)).alias("h"))
    filled = (
        spine.join(counts, ["event_type", "h"], "left")
        .select("event_type", "h", F.coalesce("n", F.lit(0)).alias("n"))
    )
    # median + MAD as STACKED WINDOW aggregates over one event_type
    # partitioning, not separate groupBy+join branches: the first draft's
    # aggregate-then-broadcast-back shape made Catalyst re-derive the
    # counts lineage per branch — 15 Exchanges and four scans of the
    # events relation in the audit. The window form scans events ONCE;
    # per-type serialization is harmless because the windowed relation is
    # the per-hour aggregate (hours x types rows), ~6 orders smaller than
    # the event log it summarizes.
    wt = Window.partitionBy("event_type")
    filled = filled.withColumn(
        "med", F.expr("percentile(n, 0.5D)").over(wt))
    filled = filled.withColumn(
        "mad", F.expr("percentile(abs(n - med), 0.5D)").over(wt))
    z = round_col(
        (F.col("n") - F.col("med")) / (F.lit(MAD_K) * F.col("mad")))
    return filled.select(
        "event_type", "h", "n",
        round_col(F.col("med")).alias("med"),
        round_col(F.col("mad")).alias("mad"),
        F.when(F.col("mad") > 0, z).alias("robust_z"),
        F.when(F.col("mad") > 0, (F.abs(z) > ANOMALY_Z).cast("int"))
        .otherwise(F.lit(0)).alias("is_anomaly"),
    )


RATE_ANOMALY_SQL = f"""
WITH counts AS (
    SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
    FROM events GROUP BY 1, 2
),
span AS (
    SELECT event_type, min(h) AS mn, max(h) AS mx FROM counts GROUP BY 1
),
spine AS (
    SELECT event_type,
           unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
    FROM span
),
filled AS (
    SELECT s.event_type, s.h, coalesce(c.n, 0) AS n
    FROM spine s LEFT JOIN counts c
      ON c.event_type = s.event_type AND c.h = s.h
),
med AS (
    SELECT event_type, median(n) AS med FROM filled GROUP BY 1
),
j AS (
    SELECT f.event_type, f.h, f.n, m.med
    FROM filled f JOIN med m ON m.event_type = f.event_type
),
mad AS (
    SELECT event_type, median(abs(n - med)) AS mad FROM j GROUP BY 1
)
SELECT j.event_type, j.h, j.n,
       {sql_round('j.med')} AS med,
       {sql_round('d.mad')} AS mad,
       CASE WHEN d.mad > 0
            THEN {sql_round(f'(j.n - j.med) / ({MAD_K!r} * d.mad)')} END
           AS robust_z,
       CASE WHEN d.mad > 0 THEN
           CASE WHEN abs({sql_round(f'(j.n - j.med) / ({MAD_K!r} * d.mad)')})
                     > {ANOMALY_Z!r} THEN 1 ELSE 0 END
       ELSE 0 END AS is_anomaly
FROM j JOIN mad d ON d.event_type = j.event_type
""".strip()


def _rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rate_anomaly(
        load_table(spark, sf_dir, "events").select("event_type", "ts"))


# ------------------------------------------- event transition matrix ----

def event_transition_matrix(ev: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event_type | current event_type) — the session-flow
    fingerprint (view -> click -> purchase vs view -> error loops) that
    feeds funnel design and sequence-model training data audits.

    Determinism: sequences order by (ts, event_id) so same-instant events
    have one canonical order in both engines; counts are exact integers
    and each probability is ONE double division. Plan: one shuffle on
    user_id for the lag, one (from, to) aggregation with map-side
    partials (at most |types|^2 groups), one tiny window for the
    row-normalizing denominator."""
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(wu).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    g = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(Window.partitionBy("from_type"))
    return g.select(
        "from_type", "to_type", "n",
        round_col(F.col("n").cast("double") / tot.cast("double"))
        .alias("prob"),
    )


def _transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_transition_matrix(
        load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "event_type"))


TRANSITION_MATRIX_SQL = f"""
WITH pairs AS (
    SELECT lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS from_type,
           event_type AS to_type
    FROM events
),
g AS (
    SELECT from_type, to_type, count(*) AS n
    FROM pairs WHERE from_type IS NOT NULL
    GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       {sql_round('CAST(n AS DOUBLE) / CAST(sum(n) OVER '
                  '(PARTITION BY from_type) AS DOUBLE)')} AS prob
FROM g
""".strip()


# --------------------------------------------- conversion lag profile ----

CONV_QS = (0.5, 0.9, 0.99)


def _conversion_lags(spark: SparkSession, sf_dir: str,
                     approx: bool | None = None) -> DataFrame:
    """Click-to-purchase latency profile: rank-selected p50/p90/p99 of
    the attribution gap — "how stale is the click we credit?", the
    distribution the attribution window policy is tuned against.

    Below the size threshold percentiles are EXACT rank picks (sorted
    rank floor((n-1)*q)+1, the same convention as source_token_profile
    — not an interpolating engine builtin), so both engines select the
    identical BIGINT microsecond gap. Above it (``approx=None`` auto-
    gates on Catalyst's input-size estimate; pass True/False to force)
    the rank window — a single-partition sort of every attributed row —
    swaps to mergeable ``approx_percentile``: same output schema, same
    member-of-multiset semantics within rank error n/accuracy, map-side
    partial sketches instead of a global sort."""
    attributed = _attribution(spark, sf_dir).filter(
        F.col("click_event_id").isNotNull())
    if approx is None:
        approx = use_approx_percentile(attributed)
    if approx:
        return attributed.agg(
            F.count(F.lit(1)).alias("n_conversions"),
            *[F.percentile_approx(
                "gap_us", q, APPROX_PERCENTILE_ACCURACY)
              .alias(f"p{int(q * 100)}_gap_us") for q in CONV_QS])
    n = F.count(F.lit(1)).over(Window.partitionBy())
    rk = F.row_number().over(
        Window.partitionBy().orderBy("gap_us", "event_id"))
    ranked = attributed.select(
        F.col("gap_us"), rk.alias("rk"), n.alias("n"))
    picks = [
        rank_pick(q, F.col("gap_us"), F.col("rk"), F.col("n"))
        .alias(f"p{int(q * 100)}_gap_us")
        for q in CONV_QS
    ]
    return ranked.agg(F.max("n").alias("n_conversions"), *picks)


def _conversion_lags_oracle() -> str:
    picks = ",\n       ".join(
        f"{sql_rank_pick(q, 'gap_us')} AS p{int(q * 100)}_gap_us"
        for q in CONV_QS)
    return f"""
WITH attributed AS (
    SELECT event_id, gap_us FROM ({ATTRIBUTION_SQL})
    WHERE click_event_id IS NOT NULL
),
ranked AS (
    SELECT gap_us,
           row_number() OVER (ORDER BY gap_us, event_id) AS rk,
           count(*) OVER () AS n
    FROM attributed
)
SELECT max(n) AS n_conversions,
       {picks}
FROM ranked
""".strip()


# ------------------------------------------------------ active users ----

WAU_DAYS = 7


def _active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the canonical
    engagement rollup. Exact distributed WAU without a distinct-over-
    window (which Spark cannot express and a self-join would blow up):
    each (user, active-day) row is EXPLODED to the 7 trailing windows it
    contributes to, then one count-distinct per window day — shuffle
    volume is 7x the deduped (user, day) relation, never events x days.

    Counts are exact integers; stickiness = dau/wau is one double
    division. Output only days with at least one active user (the DAU
    spine; zero-activity days belong to the gap-fill op's spine
    treatment). Early days carry partial trailing windows, the standard
    convention."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    ud = (ev.select("user_id", F.date_trunc("day", "ts").alias("aday"))
          .distinct())
    # ONE chain, one scan: DAU falls out of the same exploded relation as
    # the offset-0 contribution, so no second branch re-derives `ud`
    ex = ud.select(
        "user_id", "aday",
        F.explode(F.sequence(
            F.col("aday"),
            F.col("aday") + F.expr(f"INTERVAL {WAU_DAYS - 1} DAYS"),
            F.expr("INTERVAL 1 DAY"))).alias("day"))
    g = (ex.groupBy("day").agg(
        F.count_distinct(
            F.when(F.col("day") == F.col("aday"), F.col("user_id")))
        .alias("dau"),
        F.count_distinct("user_id").alias("wau"))
        .filter(F.col("dau") > 0))
    return g.select(
        "day", "dau", "wau",
        round_col(F.col("dau").cast("double") / F.col("wau").cast("double"))
        .alias("stickiness"))


ACTIVE_USERS_SQL = f"""
WITH ud AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS aday FROM events
),
ex AS (
    SELECT ud.user_id, ud.aday, w.day
    FROM ud, LATERAL (
        SELECT unnest(generate_series(
            ud.aday, ud.aday + INTERVAL {WAU_DAYS - 1} DAY,
            INTERVAL 1 DAY)) AS day
    ) w
)
SELECT day,
       count(DISTINCT CASE WHEN day = aday THEN user_id END) AS dau,
       count(DISTINCT user_id) AS wau,
       {sql_round('CAST(count(DISTINCT CASE WHEN day = aday THEN user_id '
                  'END) AS DOUBLE) / CAST(count(DISTINCT user_id) '
                  'AS DOUBLE)')} AS stickiness
FROM ex
GROUP BY day
HAVING count(DISTINCT CASE WHEN day = aday THEN user_id END) > 0
""".strip()


SUITE = {
    "attribution_last_touch": ExtQuery(_attribution, ATTRIBUTION_SQL),
    "active_users_daily": ExtQuery(_active_users, ACTIVE_USERS_SQL),
    "user_rfm_segments": ExtQuery(_rfm, _rfm_oracle()),
    "events_rate_anomaly": ExtQuery(_rate_anomaly, RATE_ANOMALY_SQL),
    "event_transition_matrix": ExtQuery(
        _transition_matrix, TRANSITION_MATRIX_SQL),
    "conversion_lag_percentiles": ExtQuery(
        _conversion_lags, _conversion_lags_oracle()),
}
