"""AGG-shaped ops: volume profile (the reference's one small-table op).

pandas_ta/volume/vp.py#vp bins the close range into ``width`` buckets and
splits volume by up/down move. Here per symbol: two aggregations (range,
then bucketed groupBy), both map-side partial — no windows, no kernels.
mean_close uses quantized integer sums (deterministic under any partition
merge order — functions/windows.py cumsum_fixed rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from pandas_ta_spark.ext import ExtQuery
from pandas_ta_spark.sources.bars import bars_from_events

WIDTH = 10


def _vp(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = bars_from_events(spark, sf_dir)
    w = Window.partitionBy("symbol")
    wo = Window.partitionBy("symbol").orderBy("ts")
    mn = F.min("close").over(w)
    mx = F.max("close").over(w)
    bucket = F.least(
        F.lit(WIDTH - 1),
        F.floor((F.col("close") - mn) / (mx - mn) * WIDTH),
    ).cast("int")
    up = F.col("close") >= F.lag("close", 1).over(wo)
    df = bars.select(
        "symbol", "close", "volume",
        bucket.alias("bucket"),
        up.alias("up"),
    )
    qclose = F.floor(F.col("close") * 1e8 + F.lit(0.5)).cast("long")
    return (
        df.groupBy("symbol", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_bars"),
            (F.sum(qclose) / 1e8 / F.count(F.lit(1))).alias("mean_close"),
            F.sum(F.when(F.col("up"), F.col("volume")).otherwise(0.0)).alias("pos_volume"),
            F.sum(F.when(~F.col("up") | F.col("up").isNull(), F.col("volume"))
                  .otherwise(0.0)).alias("neg_volume"),
            F.sum("volume").alias("total_volume"),
        )
    )


def _vp_oracle() -> str:
    from pandas_ta_spark.sources.bars import BARS_FROM_EVENTS_SQL

    return f"""
WITH bars AS (
{BARS_FROM_EVENTS_SQL}
),
b AS (
    SELECT symbol, close, volume,
           CAST(least({WIDTH - 1}, floor((close - min(close) OVER (PARTITION BY symbol))
               / (max(close) OVER (PARTITION BY symbol)
                  - min(close) OVER (PARTITION BY symbol)) * {WIDTH})) AS INT) AS bucket,
           close >= lag(close, 1) OVER (PARTITION BY symbol ORDER BY ts) AS up
    FROM bars
)
SELECT symbol, bucket, count(*) AS n_bars,
       sum(CAST(floor(close * 1e8 + 0.5) AS BIGINT)) / 1e8 / count(*) AS mean_close,
       sum(CASE WHEN up THEN volume ELSE 0.0 END) AS pos_volume,
       sum(CASE WHEN NOT up OR up IS NULL THEN volume ELSE 0.0 END) AS neg_volume,
       sum(volume) AS total_volume
FROM b GROUP BY 1, 2
""".strip()


SUITE = {
    "vp_10": ExtQuery(_vp, _vp_oracle()),
}
