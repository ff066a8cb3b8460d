"""Batched per-symbol kernel runner (EWM + KERNEL kinds).

The reference runs ~35 indicators as exponential recursions or per-row
Python state machines (SURVEY.md §2 legend EWM/KERNEL — ema, rsi, macd,
supertrend, psar, kama, ...). These are not expressible as SQL window
functions, so they run as ONE ``groupBy("symbol").applyInPandas`` pass:
Arrow ships each symbol's bars to Python once, every requested kernel
column is computed vectorized in pandas (the reference's own substrate, so
parity is exact), and Arrow ships the result back.

Scale notes (100 TB):
- one shuffle on symbol, independent of how many kernels are requested —
  a strategy with 30 EWM indicators costs the same exchange as one;
- constraint: a whole (symbol) group must fit in one executor's memory
  (SURVEY.md §4.3.4). Time-series are naturally bounded per symbol
  (~1e7 rows); for longer series, chunk by (symbol, epoch) and carry seed
  rows across epochs — see streaming/ for the stateful variant;
- pandas ewm/cum kernels are O(n) sequential per group but vectorized in C,
  measured at 1e8 rows/s (BASELINE.md) — the per-group sort dominates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType

from pandas_ta_spark.operators.base import KernelSpec

# per-(symbol) group memory bound (SURVEY §4.3.4): a whole group must fit
# one executor. 20M rows x ~8 cols x 8B ~= 1.3 GB — beyond that, chunk by
# (symbol, epoch) and carry seed state (see streaming/indicators.py for
# the state-carry pattern).
MAX_GROUP_ROWS = int(os.environ.get("PTS_MAX_KERNEL_GROUP_ROWS", 20_000_000))


def run_kernels(df: DataFrame, specs: list[KernelSpec]) -> DataFrame:
    """Append every spec's output columns in a single applyInPandas pass."""
    if not specs:
        return df
    # applyInPandas resolves pass-through columns by unquoted name; dotted
    # names (BBL_5_2.0) break it — rename around the pass
    dotted = {c: c.replace(".", "․") for c in df.columns if "." in c}
    if dotted:
        df = df.withColumnsRenamed(dotted)
        out = run_kernels(df, specs)
        return out.withColumnsRenamed({v: k for k, v in dotted.items()})
    existing = set(df.columns)
    new_fields = []
    seen: set[str] = set()
    for s in specs:
        for o in s.outputs:
            if o in existing or o in seen:
                raise ValueError(f"kernel output column collision: {o}")
            seen.add(o)
            new_fields.append(StructField(o, DoubleType(), True))
    out_schema = StructType(list(df.schema.fields) + new_fields)
    fns = [s.fn for s in specs]

    def runner(pdf):
        if len(pdf) > MAX_GROUP_ROWS:
            raise ValueError(
                f"kernel group of {len(pdf)} rows exceeds the per-executor "
                f"bound ({MAX_GROUP_ROWS}); chunk the symbol by epoch and "
                f"carry seed state (PTS_MAX_KERNEL_GROUP_ROWS overrides)"
            )
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        for fn in fns:
            pdf = fn(pdf)
        return pdf

    return df.groupBy("symbol").applyInPandas(runner, out_schema)
