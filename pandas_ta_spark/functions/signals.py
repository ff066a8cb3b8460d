"""Signal utilities: above/below/cross comparisons.

Twins of ``pandas_ta/utils/_signals.py#above``, ``#below``, ``#cross``,
``#above_value``, ``#cross_value``. The reference returns int 0/1 Series
named ``{A}_A_{B}`` (above), ``{A}_B_{B}`` (below), ``{A}_XA_{B}`` (cross
above), ``{A}_XB_{B}`` (cross below). Pure projections + one lag — stays
inside whole-stage codegen, shares the canonical (symbol, ts) sort.

Grid-tie semantics (user contract — also documented in README
"Signal comparison semantics"): every comparison thresholds the
1e-6-QUANTIZED difference (operators/base.py flag_quantize) by default.
When one side is a computed aggregate (the classic close-vs-SMA pair), a
true tie would otherwise be decided by the engines' differing last ulps
— and the grid is what the reported values round to anyway, so signals
agree with what users see. Two visible consequences: (1) above(a, b)
returns 1 when a is within half a grid step (~5e-7) below b, and
(2) NaN comparands yield NULL, not a 0 flag. Both diverge from upstream
pandas_ta's strict raw comparisons; users feeding RAW (un-rounded)
inputs can opt out with ``quantize=False``, which compares the raw
doubles and maps NaN/NULL comparands to 0 exactly like pandas boolean
indexing. (a - b) >= 0 is exactly equivalent to a >= b in IEEE doubles
(a != b implies a - b != 0 with gradual underflow), so the quantized
rewrite changes nothing off the grid edges."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pandas_ta_spark.functions.windows import shift, sql_shift
from pandas_ta_spark.operators.base import flag_quantize, sql_flag_quantize


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _qd(a: Column | str, b: Column | str) -> Column:
    return flag_quantize(_col(a) - _col(b))


def _raw_flag(cond: Column, *cols: Column) -> Column:
    """Strict-comparison flag with pandas boolean-indexing semantics:
    NaN/NULL comparands compare False -> 0 (upstream pandas_ta's raw
    contract), never NULL."""
    bad = None
    for c in cols:
        t = F.isnan(c) | c.isNull()
        bad = t if bad is None else (bad | t)
    return F.when(bad, F.lit(0)).otherwise(cond.cast("int"))


def above(a: Column | str, b: Column | str, quantize: bool = True) -> Column:
    """1 where a >= b else 0 (pandas_ta/utils/_signals.py#_above_below).

    quantize=False opts out of the grid-tie contract (module docstring)
    for raw un-rounded inputs: strict IEEE comparison, NaN/NULL -> 0."""
    if quantize:
        return (_qd(a, b) >= 0).cast("int")
    ca, cb = _col(a), _col(b)
    return _raw_flag(ca >= cb, ca, cb)


def below(a: Column | str, b: Column | str, quantize: bool = True) -> Column:
    if quantize:
        return (_qd(a, b) <= 0).cast("int")
    ca, cb = _col(a), _col(b)
    return _raw_flag(ca <= cb, ca, cb)


def above_value(a: Column | str, value: float, quantize: bool = True) -> Column:
    return above(a, F.lit(float(value)), quantize)


def below_value(a: Column | str, value: float, quantize: bool = True) -> Column:
    return below(a, F.lit(float(value)), quantize)


def cross(a: Column | str, b: Column | str, above: bool = True,
          quantize: bool = True) -> Column:
    """1 on the bar where a crosses above (below) b:
    now a > b (a < b) and previously a <= b (a >= b) —
    pandas_ta/utils/_signals.py#cross. The previous-row comparison reads
    the SHIFTED quantized diff, so both rows sit on the same grid.
    quantize=False: strict raw comparisons, NaN/NULL rows -> 0."""
    if quantize:
        d = _qd(a, b)
        pd_ = shift(d, 1)
        if above:
            e = (d > 0) & (pd_ <= 0)
        else:
            e = (d < 0) & (pd_ >= 0)
        return e.cast("int")
    ca, cb = _col(a), _col(b)
    pa, pb = shift(ca, 1), shift(cb, 1)
    e = ((ca > cb) & (pa <= pb)) if above else ((ca < cb) & (pa >= pb))
    return _raw_flag(e, ca, cb, pa, pb)


def cross_value(a: Column | str, value: float, above: bool = True,
                quantize: bool = True) -> Column:
    return cross(_col(a), F.lit(float(value)), above, quantize)


# ----------------------------------------------------------- SQL twins ----

def _sql_qd(a: str, b: str) -> str:
    return sql_flag_quantize(f"({a}) - ({b})")


def sql_above(a: str, b: str) -> str:
    return f"CAST({_sql_qd(a, b)} >= 0 AS INT)"


def sql_below(a: str, b: str) -> str:
    return f"CAST({_sql_qd(a, b)} <= 0 AS INT)"


def sql_cross(a: str, b: str, above: bool = True) -> str:
    d = _sql_qd(a, b)
    pd_ = sql_shift(d, 1)
    if above:
        return f"CAST(({d} > 0) AND ({pd_} <= 0) AS INT)"
    return f"CAST(({d} < 0) AND ({pd_} >= 0) AS INT)"


# raw (quantize=False) twins — strict IEEE comparison, NaN/NULL -> 0.
# DuckDB orders NaN ABOVE every value in comparisons (Spark comparisons
# on NaN are false), so the NaN guard is load-bearing, not defensive.
# Cross-engine exactness contract: raw twins are only hash-stable when
# BOTH comparands are engine-independent bit-identical values (raw
# input columns, literals, lags thereof) — a derived value like a
# rolling mean may differ in the last ulp between engines, which is the
# case the default quantized path exists for.

def _sql_raw_flag(cond: str, *cols: str) -> str:
    bad = " OR ".join(f"(({c}) IS NULL OR isnan({c}))" for c in cols)
    return f"(CASE WHEN {bad} THEN 0 ELSE CAST({cond} AS INT) END)"


def sql_above_raw(a: str, b: str) -> str:
    return _sql_raw_flag(f"({a}) >= ({b})", a, b)


def sql_below_raw(a: str, b: str) -> str:
    return _sql_raw_flag(f"({a}) <= ({b})", a, b)


def sql_cross_raw(a: str, b: str, above: bool = True) -> str:
    pa, pb = sql_shift(a, 1), sql_shift(b, 1)
    if above:
        cond = f"(({a}) > ({b})) AND (({pa}) <= ({pb}))"
    else:
        cond = f"(({a}) < ({b})) AND (({pa}) >= ({pb}))"
    return _sql_raw_flag(cond, a, b, pa, pb)
