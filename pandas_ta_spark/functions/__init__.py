from pandas_ta_spark.functions import naming, signals, windows

__all__ = ["naming", "signals", "windows"]
