from pandas_ta_spark.sources.bars import (
    BAR_SCHEMA,
    BARS_FROM_EVENTS_SQL,
    bars_from_events,
    bars_from_orders,
    load_table,
    resample_bars,
    with_bars_cte,
)
from pandas_ta_spark.sources.formats import (
    bars_from_csv,
    bars_from_json,
    bars_from_orc,
    bars_from_parquet,
    ticker,
)

__all__ = [
    "BAR_SCHEMA",
    "BARS_FROM_EVENTS_SQL",
    "bars_from_csv",
    "bars_from_events",
    "bars_from_json",
    "bars_from_orc",
    "bars_from_orders",
    "bars_from_parquet",
    "load_table",
    "resample_bars",
    "ticker",
    "with_bars_cte",
]
