"""The ``ta`` accessor — the reference's ``df.ta`` namespace re-expressed
for Spark (pandas_ta/core.py#AnalysisIndicators).

pandas registers an accessor on every DataFrame; Spark DataFrames are
immutable plans, so here the accessor is an explicit thin wrapper::

    from pandas_ta_spark import TA
    t = TA(bars)
    out = t(kind="rsi", length=14)          # string dispatch, appends cols
    out = t.strategy([...])                 # one-plan batch
    t.cores, t.time_range, t.last_run       # introspection properties

Property parity map (pandas_ta/core.py properties -> here):

- ``adjusted``   get/set: when set, that column is presented as ``close``
  to every subsequent indicator call (#adjusted's "use adj_close").
- ``categories`` list of operator categories (#categories).
- ``cores``      Spark owns parallelism: reads the session's default
  parallelism; the setter is accepted-but-advisory (#cores's
  multiprocessing pool size has no Spark meaning — the plan already fans
  out per partition).
- ``datetime_ordered`` / ``reverse`` / ``to_utc`` delegate to
  sources/bars.py + functions/timeutils.py (#datetime_ordered, #reverse,
  #to_utc).
- ``exchange``   get/set, validated against EXCHANGE_TZ (#exchange).
- ``last_run``   UTC timestamp of the accessor's most recent indicator /
  strategy call (#last_run; set by _post_process there, by __call__ and
  strategy() here).
- ``time_range`` span of the ts column in years (#time_range).
- ``version``    the engine version string (#version).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandas_ta_spark.version import __version__


class TA:
    """Explicit ``df.ta``-style accessor over a bars DataFrame."""

    def __init__(self, df: DataFrame, exchange: str = "NYSE"):
        from pandas_ta_spark.functions.timeutils import EXCHANGE_TZ

        if exchange not in EXCHANGE_TZ:
            raise ValueError(f"unknown exchange {exchange!r};"
                             f" known: {sorted(EXCHANGE_TZ)}")
        self._df = df
        self._exchange = exchange
        self._adjusted: str | None = None
        self._cores_hint: int | None = None
        self._last_run: _dt.datetime | None = None

    # -- the wrapped frame (with the adjusted-close substitution applied) --

    @property
    def df(self) -> DataFrame:
        if self._adjusted:
            return self._df.withColumn("close", F.col(self._adjusted))
        return self._df

    # -- properties (pandas_ta/core.py#AnalysisIndicators properties) --

    @property
    def adjusted(self) -> str | None:
        return self._adjusted

    @adjusted.setter
    def adjusted(self, value: str | None) -> None:
        if value is not None and value not in self._df.columns:
            raise ValueError(f"no column {value!r} in DataFrame")
        self._adjusted = value

    @property
    def categories(self) -> list[str]:
        from pandas_ta_spark.registry import Category

        return sorted(Category)

    @property
    def cores(self) -> int:
        if self._cores_hint is not None:
            return self._cores_hint
        return self._df.sparkSession.sparkContext.defaultParallelism

    @cores.setter
    def cores(self, value: int) -> None:
        # Spark owns task parallelism; kept as an advisory hint so
        # reference code that assigns df.ta.cores keeps working.
        self._cores_hint = int(value)

    @property
    def exchange(self) -> str:
        return self._exchange

    @exchange.setter
    def exchange(self, value: str) -> None:
        from pandas_ta_spark.functions.timeutils import EXCHANGE_TZ

        if value not in EXCHANGE_TZ:
            raise ValueError(f"unknown exchange {value!r};"
                             f" known: {sorted(EXCHANGE_TZ)}")
        self._exchange = value

    @property
    def last_run(self) -> _dt.datetime | None:
        return self._last_run

    @property
    def datetime_ordered(self) -> bool:
        from pandas_ta_spark.sources.bars import datetime_ordered

        return datetime_ordered(self._df)

    @property
    def reverse(self) -> DataFrame:
        from pandas_ta_spark.sources.bars import reverse

        return reverse(self._df)

    @property
    def time_range(self) -> float:
        """Span of the ts column in years (pandas_ta/core.py#time_range)."""
        row = self._df.agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).collect()[0]
        if row["lo"] is None:
            return 0.0
        return (row["hi"] - row["lo"]).total_seconds() / (365.25 * 86400)

    @property
    def version(self) -> str:
        return __version__

    # -- behavior --

    def to_utc(self) -> DataFrame:
        from pandas_ta_spark.functions.timeutils import EXCHANGE_TZ, to_utc

        hours = EXCHANGE_TZ[self._exchange]
        sign = "+" if hours >= 0 else "-"
        h, m = int(abs(hours)), int(round((abs(hours) % 1) * 60))
        return to_utc(self._df, f"GMT{sign}{h:02d}:{m:02d}")

    def indicators(self) -> list[str]:
        from pandas_ta_spark.registry import indicators

        return indicators()

    def constants(self, values: dict) -> DataFrame:
        from pandas_ta_spark.sources.bars import constants

        return constants(self._df, values)

    def __call__(self, kind: str, **params) -> DataFrame:
        """String dispatch (pandas_ta/core.py#__call__); ``col_names``
        renames the outputs positionally, as in the reference."""
        from pandas_ta_spark.registry import make

        post = {k: params.pop(k) for k in ("offset", "fillna", "fill_method")
                if k in params}
        col_names = params.pop("col_names", None)
        ind = make(kind, **params)
        out = ind.apply(self.df, **post)
        if col_names:
            if isinstance(col_names, str):
                col_names = (col_names,)
            if len(col_names) != len(ind.outputs):
                raise ValueError(
                    f"col_names needs {len(ind.outputs)} names for "
                    f"{kind!r} (outputs {ind.outputs}), got {col_names}")
            out = out.withColumnsRenamed(dict(zip(ind.outputs, col_names)))
        self._last_run = _dt.datetime.now(_dt.timezone.utc)
        return out

    def __getattr__(self, name: str):
        """Attribute dispatch — the reference's primary calling
        convention (``df.ta.rsi(length=14)``): any registered indicator
        name becomes a bound method. Only reached when normal attribute
        lookup fails, so real methods/properties always win."""
        if name.startswith("_"):
            raise AttributeError(name)
        # __getattr__ also fires when a REAL property's body raises
        # AttributeError internally (code-review r8) — don't mask that
        # with a misleading "not an indicator" message
        if any(name in klass.__dict__ for klass in type(self).__mro__):
            raise AttributeError(
                f"TA.{name} exists but its evaluation raised "
                f"AttributeError — the error is inside the property, "
                f"not a missing attribute")
        from pandas_ta_spark.registry import _FACTORIES

        if name.lower() not in _FACTORIES:
            raise AttributeError(
                f"{name!r} is neither a TA attribute nor a registered "
                f"indicator (see indicators())")

        def call(**params) -> DataFrame:
            return self(name, **params)

        call.__name__ = name
        return call

    def strategy(self, indicators_, exclude=(), **kwargs) -> DataFrame:
        """Batch many indicators into ONE plan (core.py#strategy — but a
        plan, not a multiprocessing loop; see plans/strategy.py).

        Accepts every reference argument form: a ``Strategy`` dataclass
        (``ta`` dicts with close/prefix/suffix handling), a category
        string, ``"all"``/``AllStrategy``, or a list of Indicator
        objects; ``exclude`` filters indicator kinds by name
        (strategy_spec.resolve_strategy)."""
        from pandas_ta_spark.plans.strategy import apply_strategy
        from pandas_ta_spark.strategy_spec import resolve_strategy

        out = apply_strategy(self.df, resolve_strategy(indicators_, exclude),
                             **kwargs)
        self._last_run = _dt.datetime.now(_dt.timezone.utc)
        return out
