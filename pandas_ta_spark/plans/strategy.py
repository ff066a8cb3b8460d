"""Strategy planner: many indicators -> ONE plan.

The reference's ``df.ta.strategy(...)`` (``pandas_ta/core.py#strategy``)
loops over indicators, optionally fanning out with multiprocessing and
pickling the whole DataFrame per task. Here a strategy is declarative
composition (SURVEY.md §3.3):

- every KERNEL/EWM indicator's pandas kernel is batched into a SINGLE
  ``groupBy("symbol").applyInPandas`` pass (one shuffle + one Arrow
  round-trip regardless of kernel count);
- every window-expressible indicator contributes Column expressions over
  the shared ``Window.partitionBy("symbol").orderBy("ts")`` spec, which
  Catalyst collapses into one WindowExec chain after one exchange + one
  sort (SURVEY.md §4.2).

Net: a 50-indicator strategy costs the same shuffles as one indicator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pandas_ta_spark.operators.base import Indicator
from pandas_ta_spark.plans.kernels import run_kernels


def apply_strategy(df: DataFrame, inds: list[Indicator], keep_temps: bool = False) -> DataFrame:
    """Append every indicator's output columns in one composite plan."""
    kernels = [i.kernel for i in inds if i.kernel is not None]
    if kernels:
        df = run_kernels(df, kernels)
    temps: list[str] = []
    for ind in inds:
        for stage in ind.stages:
            df = df.withColumns(stage)
            temps.extend(k for k in stage if k not in temps)
        if ind.final:
            df = df.withColumns(ind.final)
    if temps and not keep_temps:
        df = df.drop(*temps)
    return df
