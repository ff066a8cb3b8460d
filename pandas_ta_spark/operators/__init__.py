from pandas_ta_spark.operators import (
    base,
    candles,
    momentum,
    overlap,
    performance,
    signal_ops,
    statistics,
    trend,
    volatility,
    volume,
)

__all__ = [
    "base", "candles", "momentum", "overlap", "performance", "signal_ops",
    "statistics", "trend", "volatility", "volume",
]
