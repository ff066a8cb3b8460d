"""Streaming cross-sectional (panel) operators.

The batch panel ops (ext/relational: xsec rank/z-score, rolling beta)
standardize each symbol against ALL symbols at the same timestamp. On a
stream that per-timestamp panel is exactly an event-time window group:
one watermarked aggregation collects the panel, and the standardization
itself is a pure projection over the collected rows — a single stateful
operator, state bounded by (symbols x in-flight windows).

The per-symbol RETURN is an upstream concern (the stateful indicator
machinery in streaming/indicators.py carries per-symbol state across
micro-batches); this module takes a (symbol, ts, ret_1) stream and does
the panel-hard part.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_xsec_zscore(
    rets: DataFrame,
    *,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-timestamp winsorized z-score over a return stream —
    BIT-IDENTICAL to the batch ``xsec_zscore_ret1`` for the same
    (symbol, ts, ret_1) rows.

    ``rets`` needs (symbol, ts, ret_1). Each timestamp's panel
    is collected once (collect_list of quantized BIGINTs — the same
    1e6 fixed-point moments as the batch op, summed as exact integers
    inside the projection, so results match the batch op and the DuckDB
    oracle regardless of arrival order); z derives through the identical
    double chain. Degenerate panels (n < 2, zero variance) emit NULL.
    Emission happens when the watermark passes the ts (append mode).
    """
    from pandas_ta_spark.ext.relational import XSEC_SCALE, XSEC_WINSOR
    from pandas_ta_spark.operators.base import round_col

    wret = F.least(F.greatest(F.col("ret_1"), F.lit(-XSEC_WINSOR)),
                   F.lit(XSEC_WINSOR))
    q = F.floor(wret * F.lit(XSEC_SCALE) + F.lit(0.5)).cast("long")
    # grouping DIRECTLY on the watermarked event-time column: each bar
    # timestamp is its own panel (a window() group would merge panels
    # when bars are finer than the window, and Spark rejects carrying
    # two event-time columns); state for a ts evicts once the watermark
    # passes it
    panel = (
        rets.filter(F.col("ret_1").isNotNull())
        .select("symbol", "ts", "ret_1", q.alias("q"))
        .withWatermark("ts", watermark)
        .groupBy("ts")
        .agg(F.collect_list(
            F.struct("symbol", "ret_1", "q")).alias("panel"))
    )
    # exact-integer moments folded from the collected panel (addition
    # order inside aggregate() is array order, but INTEGER addition is
    # order-independent, so any arrival order gives the batch sums)
    s1 = F.expr(
        "aggregate(panel, CAST(0 AS BIGINT), (acc, x) -> acc + x.q)"
    ).cast("double")
    s2 = F.expr(
        "aggregate(panel, CAST(0 AS BIGINT), (acc, x) -> acc + x.q * x.q)"
    ).cast("double")
    nd = F.size("panel").cast("double")
    rows = (
        panel.withColumn("s1", s1).withColumn("s2", s2).withColumn("nd", nd)
        .withColumn("n_xsec", F.size("panel").cast("long"))
        .select("ts", "s1", "s2", "nd", "n_xsec",
                F.explode("panel").alias("x"))
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("nd")) \
        / (F.col("nd") - F.lit(1.0))
    z = F.when(
        (F.col("nd") > 1) & (var > 0),
        (F.col("x.q").cast("double") - F.col("s1") / F.col("nd"))
        / F.sqrt(var),
    )
    return rows.select(
        F.col("x.symbol").alias("symbol"), "ts",
        round_col(F.col("x.ret_1")).alias("ret_1"),
        "n_xsec",
        round_col(z).alias("xsec_z"),
    )


def stream_xsec_rank(
    rets: DataFrame,
    *,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-timestamp cross-sectional rank/percentile over a return
    stream — BIT-IDENTICAL to the batch ``xsec_rank_ret1`` for the same
    (symbol, ts, ret_1) rows.

    The collected panel is sorted ONCE per timestamp inside the
    projection by (ret_1, symbol) — the batch row_number ordering — and
    posexplode assigns the ranks; the percentile derives through the
    identical double chain ((rank-1)/(n-1), 0.5 for singleton panels).
    Raw doubles sort identically in any engine, so arrival order and
    micro-batch splits cannot change the ranking."""
    from pandas_ta_spark.operators.base import round_col

    panel = (
        rets.filter(F.col("ret_1").isNotNull())
        .select("symbol", "ts", "ret_1")
        .withWatermark("ts", watermark)
        .groupBy("ts")
        .agg(F.collect_list(F.struct("ret_1", "symbol")).alias("panel"))
    )
    rows = (
        panel
        .withColumn("n_xsec", F.size("panel").cast("long"))
        .select(
            "ts", "n_xsec",
            F.posexplode(F.array_sort("panel")).alias("pos", "x"),
        )
    )
    pct = F.when(
        F.col("n_xsec") > 1,
        F.col("pos").cast("double") / (F.col("n_xsec") - 1).cast("double"),
    ).otherwise(F.lit(0.5))
    return rows.select(
        F.col("x.symbol").alias("symbol"), "ts",
        round_col(F.col("x.ret_1")).alias("ret_1"),
        (F.col("pos") + 1).cast("long").alias("xsec_rank"),
        "n_xsec",
        round_col(pct).alias("xsec_pct"),
    )
