from pandas_ta_spark.streaming.indicators import (
    stream_bars,
    streaming_atr,
    streaming_ema,
    streaming_macd,
    streaming_rsi,
    streaming_supertrend,
)

__all__ = ["stream_bars", "streaming_atr", "streaming_ema",
           "streaming_macd", "streaming_rsi", "streaming_supertrend"]
