from pandas_ta_spark.sources.bars import (
    BAR_SCHEMA,
    BARS_FROM_EVENTS_SQL,
    bars_from_events,
    bars_from_orders,
    load_table,
    with_bars_cte,
)

__all__ = [
    "BAR_SCHEMA",
    "BARS_FROM_EVENTS_SQL",
    "bars_from_events",
    "bars_from_orders",
    "load_table",
    "with_bars_cte",
]
