"""Streaming point-in-time attach: each event in a stream gets the
latest COMPLETED bar from a static bar table — the online twin of
``ext.relational.asof_join`` (VERDICT r7 ask #8).

The batch op's union-and-carry (one ordered window pass with
``last(ignorenulls)``) has no streaming equivalent — ordered windows
over unbounded streams are inexpressible. The streaming-native shape is
the one every point-in-time feature store serves with: materialize the
static side into VALIDITY INTERVALS once at plan build (bar at ts=T
prevails for event-hours h in (T, next_T] — "strictly before the
event's hour" exactly as batch), explode the intervals into an
hour-keyed lookup, and attach via a stateless stream-static equi-join
on (symbol, event_hour). Event hours past the last bar clamp to the
last bar's validity via a broadcast per-symbol max — so the join stays
an equi-join with NO watermark and NO state store at all.

100 TB shape: the lookup is bar-table-sized (hourly bars => one row per
bar-hour of span; the explode adds rows only across bar gaps), keyed
uniformly by (symbol, hour); the per-symbol clamp table is
symbol-cardinality-sized and broadcast. Every micro-batch does a hash
join against it — no ordering assumptions between stream and reference
data, no late-data hazard (the reference side is immutable history; a
bar that hasn't closed is by definition not in it).

Exactness: parity-tested bit-identical to batch ``asof_join`` over the
same inputs (tests/test_streaming_custom.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def asof_lookup_table(bars: DataFrame) -> DataFrame:
    """Per-(symbol, event-hour) prevailing bar: the validity-interval
    expansion of the static bar table.

    Hour keys are hour-truncated, so the construction is safe for ANY
    bar spacing, not just canonical hourly bars (code-review r8: the
    original `sequence(bar_ts + 1h, next_ts)` threw when consecutive
    bars were under an hour apart, and sub-hourly bars can map several
    bars onto one event hour). Each bar claims hours from
    trunc(bar_ts)+1h (the first hour it is strictly before) through
    trunc(next_ts)+1h (where its successor takes over); `greatest`
    guards the degenerate <=0-length case, overlapping claims are
    resolved by keeping the LATEST bar per (symbol, hour) — a
    max-struct aggregation, no sort — and bar_ts < h holds by
    construction. ONE window pass for lead + one explode + one
    aggregation; output rows ~= hours spanned per symbol."""
    hour = F.expr("INTERVAL 1 HOUR")
    w = Window.partitionBy("symbol").orderBy("ts")
    start = F.date_trunc("hour", F.col("bar_ts")) + hour
    stop = F.greatest(
        F.coalesce(F.date_trunc("hour", F.col("next_ts")) + hour, start),
        start,
    )
    return (
        bars.select(
            "symbol",
            F.col("ts").alias("bar_ts"),
            F.col("close").alias("bar_close"),
            F.lead("ts").over(w).alias("next_ts"),
        )
        .withColumn("h", F.explode(F.sequence(start, stop, hour)))
        .groupBy("symbol", "h")
        .agg(F.max(F.struct("bar_ts", "bar_close")).alias("b"))
        .select("symbol", "h",
                F.col("b.bar_ts").alias("bar_ts"),
                F.col("b.bar_close").alias("bar_close"))
    )


def stream_asof_attach(events: DataFrame, bars: DataFrame) -> DataFrame:
    """Attach the latest completed bar to each streamed event.

    ``events`` is a streaming DataFrame with (event_id, symbol, ts,
    value); ``bars`` a STATIC bar table in the canonical layout. Emits
    (event_id, symbol, ts, value, bar_ts, bar_close) — the batch
    ``asof_join`` columns; events before a symbol's first bar carry NULL
    bar columns, exactly as batch.

    Stateless: two stream-static joins (broadcast per-symbol clamp +
    hash lookup on (symbol, hour)), no watermark required."""
    clamp = F.broadcast(
        bars.groupBy("symbol").agg(
            # hour-truncated so the clamp target is always a lookup key
            # even for non-hour-aligned final bars
            (F.date_trunc("hour", F.max("ts"))
             + F.expr("INTERVAL 1 HOUR")).alias("_clamp_h"))
    )
    lookup = asof_lookup_table(bars)
    ev = (
        events.select("event_id", "symbol", "ts", "value")
        .withColumn("_h", F.date_trunc("hour", F.col("ts")))
        # events beyond the last bar's validity hour clamp down to it:
        # their as-of match is the final bar, same as batch's carry
        .join(clamp, "symbol", "left")
        .withColumn("_h", F.least("_h", "_clamp_h"))
    )
    return (
        ev.join(
            lookup,
            on=[ev["symbol"] == lookup["symbol"], ev["_h"] == lookup["h"]],
            how="left",
        )
        .select(
            "event_id", ev["symbol"].alias("symbol"), "ts", "value",
            "bar_ts", "bar_close",
        )
    )


# ------------------------------------------- last-touch attribution twin ----

ATTRIB_OUT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("click_event_id", LongType()),
    StructField("click_ts", TimestampType()),
    StructField("gap_us", LongType()),
])

# carried: the prevailing click as (epoch-us, event_id); -1 = none yet
ATTRIB_STATE_SCHEMA = StructType([
    StructField("click_us", LongType()),
    StructField("click_id", LongType()),
])


def stream_attribution_attach(events: DataFrame) -> DataFrame:
    """Online last-touch attribution: each streamed purchase is attributed
    to the user's latest click STRICTLY before it — the streaming twin of
    ``ext.behavior.attribution_last_touch``.

    Unlike the as-of attach, BOTH sides here are the stream (the click
    reference data is being produced by the very stream it serves), so
    the stateless interval-lookup trick does not apply; this is the
    canonical keyed-state shape: ``applyInPandasWithState`` per user
    carrying ONE (click_ts, click_event_id) pair — the max-(ts, id)
    click seen — across micro-batches. State is two longs per user,
    independent of history length; output is purchase-rows only.

    Ordering contract (same as the indicator twins, parity-tested in
    tests/test_streaming_custom.py): per-user event-time order across
    micro-batches. Within a batch, rows process in (ts, purchase-first,
    event_id) order, so a same-instant click never attributes its own
    purchase (strictly-before), and click ties at one timestamp resolve
    to the highest event_id — bit-identical to the batch union-and-carry."""

    def update(key, pdfs, state):
        import pandas as pd

        click_us, click_id = state.get if state.exists else (-1, -1)
        from pandas_ta_spark.streaming.indicators import _one_chunk

        for pdf in _one_chunk(pdfs):
            pdf = pdf.assign(
                _p=(pdf["event_type"] != "purchase").astype("int64"))
            pdf = pdf.sort_values(["ts", "_p", "event_id"])
            out = {k: [] for k in ("event_id", "user_id", "ts",
                                   "click_event_id", "click_ts", "gap_us")}
            for eid, ts, etype in zip(
                    pdf["event_id"], pdf["ts"], pdf["event_type"]):
                us = ts.value // 1000
                if etype == "purchase":
                    out["event_id"].append(eid)
                    out["user_id"].append(key[0])
                    out["ts"].append(ts)
                    if click_id >= 0:
                        out["click_event_id"].append(click_id)
                        out["click_ts"].append(
                            pd.Timestamp(click_us * 1000))
                        out["gap_us"].append(us - click_us)
                    else:
                        out["click_event_id"].append(None)
                        out["click_ts"].append(pd.NaT)
                        out["gap_us"].append(None)
                elif etype == "click" and (us, eid) > (click_us, click_id):
                    click_us, click_id = us, int(eid)
            # explicit dtypes: empty/None-bearing object columns don't
            # survive the Arrow handoff on their own
            yield pd.DataFrame({
                "event_id": pd.array(out["event_id"], dtype="Int64"),
                "user_id": pd.array(out["user_id"], dtype="Int64"),
                "ts": pd.to_datetime(out["ts"]),
                "click_event_id": pd.array(out["click_event_id"],
                                           dtype="Int64"),
                "click_ts": pd.to_datetime(out["click_ts"]),
                "gap_us": pd.array(out["gap_us"], dtype="Int64"),
            })
        state.update((click_us, click_id))

    ev = events.select("event_id", "user_id", "ts", "event_type").filter(
        F.col("event_type").isin("click", "purchase"))
    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ATTRIB_OUT_SCHEMA,
        stateStructType=ATTRIB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# --------------------------------------------- rate-anomaly serving twin ----

def stream_rate_anomaly(events: DataFrame, baseline: DataFrame,
                        window: str = "1 hour",
                        watermark: str = "2 hours") -> DataFrame:
    """Online rate-anomaly flagging: tumbling event-time count windows
    per event_type, scored against a STATIC per-type (med, mad)
    baseline — the production shape for ``ext.behavior.rate_anomaly``
    (fit the robust baseline offline on history, serve the z-score
    online; refit on whatever cadence drift demands).

    ``baseline`` is one row per event_type with (med, mad) — exactly the
    batch op's output columns, which are EXACT multiples of 0.5/0.25 so
    the 1e-6 output rounding is the identity on them and batch/stream
    z-scores match bit-for-bit (parity-tested on the flagged spike).

    Scope: a stream only scores windows that contain events — the
    zero-count OUTAGE rows the batch op's spine zero-fill surfaces do
    not exist online (nothing arrives to trigger them); detecting
    silence online is a processing-time-timeout concern (a heartbeat
    check against the watermark clock), deliberately out of this
    operator. State: one count per open (type, window) until the
    watermark closes it; the baseline join is stateless broadcast."""
    from pandas_ta_spark.ext.behavior import ANOMALY_Z, MAD_K
    from pandas_ta_spark.operators.base import round_col

    counts = (
        events.select("event_type", "ts")
        .withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    z = round_col(
        (F.col("n") - F.col("med")) / (F.lit(MAD_K) * F.col("mad")))
    return (
        counts.join(F.broadcast(baseline), "event_type", "left")
        .select(
            "event_type", F.col("w.start").alias("h"), "n",
            F.when(F.col("mad") > 0, z).alias("robust_z"),
            F.when(F.col("mad") > 0, (F.abs(z) > ANOMALY_Z).cast("int"))
            .otherwise(F.lit(0)).alias("is_anomaly"),
        )
    )
