from pandas_ta_spark.streaming.indicators import stream_bars, streaming_ema

__all__ = ["stream_bars", "streaming_ema"]
