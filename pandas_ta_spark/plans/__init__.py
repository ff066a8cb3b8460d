from pandas_ta_spark.plans.kernels import run_kernels

__all__ = ["run_kernels"]
