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
