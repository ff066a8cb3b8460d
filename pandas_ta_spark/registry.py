"""Indicator registry + string dispatch.

Twin of the reference's user API surface (``pandas_ta/core.py#Category``,
``#AnalysisIndicators.__call__``, ``pandas_ta/overlap/ma.py#ma``): maps
indicator names to factories so users can dispatch by string
(``ta(df, "rsi", length=14)``), list available indicators, and batch many
into one plan (plans/strategy.py).

Each operators module exports ``FACTORIES`` (name -> factory returning an
``Indicator``) and ``SUITE`` (driver-facing default-parameter instances
keyed ``{name}_{params}`` used by __spark_entry__.py queries()/oracle_sql()).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from pandas_ta_spark.operators.base import Indicator


def _modules():
    import importlib

    # A broken operators module must fail LOUDLY: swallowing ImportError
    # here silently shrinks queries()/oracle_sql() and the driver's gate
    # would just check fewer operators (round 1's failure mode).
    return [
        importlib.import_module(f"pandas_ta_spark.operators.{m}")
        for m in (
            "overlap",
            "momentum",
            "statistics",
            "performance",
            "trend",
            "volatility",
            "volume",
            "candles",
            "signal_ops",
        )
    ]


def _build():
    factories: dict[str, Callable[..., Indicator]] = {}
    category: dict[str, list[str]] = {}
    suite: dict[str, Callable[[], Indicator]] = {}
    for mod in _modules():
        cat = getattr(mod, "CAT", mod.__name__.rsplit(".", 1)[-1])
        facs = getattr(mod, "FACTORIES", {})
        factories.update(facs)
        category.setdefault(cat, []).extend(sorted(facs))
        suite.update(getattr(mod, "SUITE", {}))
    return factories, category, suite


_FACTORIES, Category, _SUITE = _build()


def indicators() -> list[str]:
    """All registered indicator names (pandas_ta/core.py#indicators)."""
    return sorted(_FACTORIES)


def get(kind: str) -> Callable[..., Indicator]:
    try:
        return _FACTORIES[kind.lower()]
    except KeyError:
        raise ValueError(f"unknown indicator: {kind!r} (see indicators())") from None


def make(kind: str, **params) -> Indicator:
    return get(kind)(**params)


def run(df: DataFrame, kind: str, **params) -> DataFrame:
    """String dispatch: append one indicator's outputs to a bars DataFrame
    (the reference's ``df.ta(kind=..., append=True)``)."""
    return make(kind, **params).apply(df)


def default_instance(key: str) -> Indicator:
    """Memoized default-parameter instance for a suite key.

    Building an Indicator is pure driver-side expression construction
    (hundreds of py4j calls for the wide ones — the 66-pattern candle
    dispatcher alone cost ~6s per build), and the result is immutable by
    convention (apply()/apply_strategy only read stages/final/kernel), so
    one instance per process is correct. Unresolved Columns stay valid for
    the lifetime of the JVM backing the py4j gateway — i.e. any number of
    SparkSessions in one process."""
    inst = _DEFAULTS.get(key)
    if inst is None:
        inst = _DEFAULTS[key] = _SUITE[key]()
    return inst


_DEFAULTS: dict[str, Indicator] = {}


def standard_suite() -> dict[str, Indicator]:
    """Default-parameter instance per op — the driver correctness surface."""
    return {k: default_instance(k) for k in _SUITE}
