from pandas_ta_spark.operators import base, overlap

__all__ = ["base", "overlap"]
