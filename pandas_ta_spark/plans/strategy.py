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
    """Append every indicator's output columns in one composite plan.

    Stage maps are merged ACROSS indicators layer by layer (an
    indicator's stage k only references its own stages < k or bar
    columns), so 24 indicators with 2 stages each become 3 projection
    layers, not 48 — fewer Window/Project nodes, one codegen span per
    layer, same single exchange+sort."""
    temps: list[str] = []
    max_stages = max((len(i.stages) for i in inds), default=0)
    for k in range(max_stages):
        layer: dict = {}
        for ind in inds:
            if len(ind.stages) > k:
                layer.update(ind.stages[k])
        if layer:
            df = df.withColumns(layer)
            temps.extend(c for c in layer if c not in temps)
    finals: dict = {}
    for ind in inds:
        finals.update(ind.final)
    if finals:
        df = df.withColumns(finals)
    if temps and not keep_temps:
        df = df.drop(*temps)
    # kernels LAST: groupBy(symbol).applyInPandas's ClusteredDistribution
    # is satisfied by the window stage's hash(symbol) partitioning, saving
    # one full shuffle (kernel-first would re-exchange for the windows —
    # measured 3 vs 2 Exchange nodes). No indicator's window stages read
    # kernel outputs, so the reorder is safe.
    kernels = [i.kernel for i in inds if i.kernel is not None]
    if kernels:
        df = run_kernels(df, kernels)
    return df
