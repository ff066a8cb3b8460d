"""pandas_ta_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``preslavrachev/pandas-ta`` (a fork of the
public pandas-ta technical-analysis library).

This is NOT a port: the reference is an eagerly-evaluated, single-machine
pandas library (see SURVEY.md §3/§4 — no plan, no optimizer). Here every
indicator is declared as Catalyst ``Column`` expressions over
``Window.partitionBy("symbol").orderBy("ts")`` (ROLL/WROLL/CUM/PROJ kinds)
or as an Arrow-batched ``applyInPandas`` kernel (EWM/KERNEL kinds), so one
multi-indicator "strategy" compiles to a single shuffle + a single grouped
kernel pass and scales out across symbols/partitions.

Reference parity citations use the ``pandas_ta/<file>.py#<symbol>``
convention from SURVEY.md §0 (the /root/reference mount was empty; claims
derive from the public pandas-ta 0.3.14b layout).

Layout:
    sources/    bars data model + loaders (parquet tables -> OHLCV bars)
    functions/  window-spec builders, warmup masks, naming, math/signal utils
    operators/  one module per reference package (momentum, overlap, ...)
    plans/      strategy planner + batched applyInPandas kernel runner
    ext/        LLM-data-pipeline extensions (dedup, similarity, text, media)
    streaming/  Structured Streaming variants (applyInPandasWithState)
    custom.py   user-defined indicator loading (pandas_ta/custom.py twin)
"""

from pandas_ta_spark.version import __version__
from pandas_ta_spark.accessor import TA
from pandas_ta_spark.registry import Category, indicators, make, run as ta
from pandas_ta_spark.custom import bind, create_dir, import_dir
from pandas_ta_spark.strategy_spec import (
    AllStrategy,
    CommonStrategy,
    Strategy,
)
from pandas_ta_spark.sources.formats import (
    bars_from_csv,
    bars_from_json,
    bars_from_orc,
    bars_from_parquet,
    ticker,
)

__all__ = ["__version__", "Category", "indicators", "make", "ta", "TA",
           "bind", "create_dir", "import_dir",
           "Strategy", "AllStrategy", "CommonStrategy",
           "bars_from_csv", "bars_from_json", "bars_from_orc", "bars_from_parquet",
           "ticker"]
