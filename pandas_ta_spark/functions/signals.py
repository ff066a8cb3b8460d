"""Signal utilities: above/below/cross comparisons.

Twins of ``pandas_ta/utils/_signals.py#above``, ``#below``, ``#cross``,
``#above_value``, ``#cross_value``. The reference returns int 0/1 Series
named ``{A}_A_{B}`` (above), ``{A}_B_{B}`` (below), ``{A}_XA_{B}`` (cross
above), ``{A}_XB_{B}`` (cross below). Pure projections + one lag — stays
inside whole-stage codegen, shares the canonical (symbol, ts) sort.

Every comparison thresholds the 1e-6-QUANTIZED difference
(operators/base.py flag_quantize): when one side is a computed aggregate
(the classic close-vs-SMA pair), a true tie is decided by the engines'
differing last ulps otherwise — and the grid is what the reported values
round to anyway, so signals agree with what users see. (a - b) >= 0 is
exactly equivalent to a >= b in IEEE doubles (a != b implies a - b != 0
with gradual underflow), so the rewrite changes nothing off the grid
edges."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pandas_ta_spark.functions.windows import shift, sql_shift
from pandas_ta_spark.operators.base import flag_quantize, sql_flag_quantize


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _qd(a: Column | str, b: Column | str) -> Column:
    return flag_quantize(_col(a) - _col(b))


def above(a: Column | str, b: Column | str) -> Column:
    """1 where a >= b else 0 (pandas_ta/utils/_signals.py#_above_below)."""
    return (_qd(a, b) >= 0).cast("int")


def below(a: Column | str, b: Column | str) -> Column:
    return (_qd(a, b) <= 0).cast("int")


def above_value(a: Column | str, value: float) -> Column:
    return above(a, F.lit(float(value)))


def below_value(a: Column | str, value: float) -> Column:
    return below(a, F.lit(float(value)))


def cross(a: Column | str, b: Column | str, above: bool = True) -> Column:
    """1 on the bar where a crosses above (below) b:
    now a > b (a < b) and previously a <= b (a >= b) —
    pandas_ta/utils/_signals.py#cross. The previous-row comparison reads
    the SHIFTED quantized diff, so both rows sit on the same grid."""
    d = _qd(a, b)
    pd_ = shift(d, 1)
    if above:
        e = (d > 0) & (pd_ <= 0)
    else:
        e = (d < 0) & (pd_ >= 0)
    return e.cast("int")


def cross_value(a: Column | str, value: float, above: bool = True) -> Column:
    return cross(_col(a), F.lit(float(value)), above)


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
