from pandas_ta_spark.plans.kernels import run_kernels
from pandas_ta_spark.plans.strategy import apply_strategy

__all__ = ["run_kernels", "apply_strategy"]
