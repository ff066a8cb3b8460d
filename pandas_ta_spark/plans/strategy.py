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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pandas_ta_spark.functions.windows import SYMBOL, TS
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


def apply_strategy_chunked(
    df: DataFrame,
    inds: list[Indicator],
    lookback: int,
    chunk: str = "30 days",
) -> DataFrame:
    """``apply_strategy`` for per-symbol series too long for one window
    partition — the expression-path twin of ``plans/kernels.py``'s
    epoch-chunked execution (which covers the Arrow kernel pass only).

    WindowExec buffers an entire (symbol) partition; a multi-year tick
    series for one instrument can exceed executor memory. This splits
    each symbol into time chunks, REPLICATES the trailing ``lookback``
    rows of every chunk into its successor (the carry), computes the
    strategy per (symbol, chunk) sub-series — bounded buffering — and
    drops the carry copies. Results are EXACTLY the unchunked ones
    because every retained row sees >= lookback rows of true history in
    its frame, provided:

    - every indicator is bounded-lookback: ROLL/WROLL/lag window ops
      with max window/shift <= lookback. CUM/EWM/KERNEL indicators need
      unbounded history and MUST NOT be passed here (kernels have their
      own exact chunking via ``KernelSpec.carry_rows``; cumsums are
      O(1)-state and don't hit the buffering wall in the first place);
    - every chunk holds >= lookback rows per symbol (choose ``chunk``
      duration accordingly; a sparse symbol violating this would see a
      truncated frame where the unchunked plan sees a full one).

    Plan shape: ONE extra bounded window pass (row_number per
    (symbol, chunk), buffer = chunk size) to pick the carry rows, one
    union, then the normal strategy over the salted symbol — the same
    shuffles as ``apply_strategy``, each partition now chunk-sized.
    """
    # .cast: parquet TIMESTAMP_NTZ inputs — unix_micros wants TIMESTAMP
    us = F.unix_micros(F.col(TS).cast("timestamp"))
    # parse "N days"/"N hours" without relying on engine interval math
    qty, unit = chunk.split()
    per = {"day": 86_400_000_000, "days": 86_400_000_000,
           "hour": 3_600_000_000, "hours": 3_600_000_000}[unit]
    chunk_us = int(qty) * per
    base = df.withColumn("_chk", F.floor(us / F.lit(chunk_us)).cast("long"))
    wdesc = Window.partitionBy(SYMBOL, "_chk").orderBy(F.col(TS).desc())
    carry = (
        base.withColumn("_rnd", F.row_number().over(wdesc))
        .filter(F.col("_rnd") <= lookback)
        .drop("_rnd")
        .withColumn("_chk", F.col("_chk") + 1)
        .withColumn("_carry", F.lit(1))
    )
    u = base.withColumn("_carry", F.lit(0)).unionByName(carry)
    salted = u.withColumn("_sym", F.col(SYMBOL)).withColumn(
        SYMBOL, F.concat_ws("#", SYMBOL, F.col("_chk").cast("string"))
    )
    out = apply_strategy(salted, inds)
    return (
        out.filter(F.col("_carry") == 0)
        .withColumn(SYMBOL, F.col("_sym"))
        .drop("_sym", "_chk", "_carry")
    )
