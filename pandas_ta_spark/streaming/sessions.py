"""Streaming sessionization — the Structured Streaming twin of
ext/relational.py::_sessionize.

Uses Spark's NATIVE ``session_window`` (gap-merged event-time windows
with watermark-driven state eviction) rather than a hand-rolled
``applyInPandasWithState`` loop: session merging, cross-micro-batch
state, and late-data handling are exactly what the built-in operator
implements, and it stays JVM-side. Both ops share the built-in's gap
rule (an event at EXACTLY ``gap`` after the previous one still merges;
only a strictly larger gap splits), so batch and streaming agree
row-for-row — asserted by
tests/test_streaming_custom.py::test_streaming_sessions_match_batch.

``count(DISTINCT ...)`` is unsupported inside streaming aggregations;
``size(collect_set(...))`` is the standard rewrite (per-session
cardinalities are tiny, so the set state is bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_sessions(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Per-user gap sessions over an event stream. State is one open
    session per user (bounded); the shuffle hashes on user_id; closed
    sessions finalize once the watermark passes their end."""
    ev = events.withWatermark("ts", watermark)
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.size(F.collect_set("event_type")).cast("long").alias("n_event_types"),
        )
        .withColumn(
            "duration_sec",
            F.expr("timestampdiff(MICROSECOND, session_start, session_end)"
                   " div 1000000"),
        )
        .select("user_id", "session_start", "session_end", "n_events",
                "duration_sec", "n_event_types")
    )
