"""Signal utilities: above/below/cross comparisons.

Twins of ``pandas_ta/utils/_signals.py#above``, ``#below``, ``#cross``,
``#above_value``, ``#cross_value``. The reference returns int 0/1 Series
named ``{A}_A_{B}`` (above), ``{A}_B_{B}`` (below), ``{A}_XA_{B}`` (cross
above), ``{A}_XB_{B}`` (cross below). Pure projections + one lag — stays
inside whole-stage codegen, shares the canonical (symbol, ts) sort.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pandas_ta_spark.functions.windows import shift, sql_shift


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def above(a: Column | str, b: Column | str) -> Column:
    """1 where a >= b else 0 (pandas_ta/utils/_signals.py#_above_below)."""
    return (_col(a) >= _col(b)).cast("int")


def below(a: Column | str, b: Column | str) -> Column:
    return (_col(a) <= _col(b)).cast("int")


def above_value(a: Column | str, value: float) -> Column:
    return (_col(a) >= F.lit(float(value))).cast("int")


def below_value(a: Column | str, value: float) -> Column:
    return (_col(a) <= F.lit(float(value))).cast("int")


def cross(a: Column | str, b: Column | str, above: bool = True) -> Column:
    """1 on the bar where a crosses above (below) b:
    now a > b (a < b) and previously a <= b (a >= b) —
    pandas_ta/utils/_signals.py#cross."""
    ca, cb = _col(a), _col(b)
    pa, pb = shift(ca, 1), shift(cb, 1)
    if above:
        e = (ca > cb) & (pa <= pb)
    else:
        e = (ca < cb) & (pa >= pb)
    return e.cast("int")


def cross_value(a: Column | str, value: float, above: bool = True) -> Column:
    return cross(_col(a), F.lit(float(value)), above)


# ----------------------------------------------------------- SQL twins ----

def sql_above(a: str, b: str) -> str:
    return f"CAST(({a}) >= ({b}) AS INT)"


def sql_below(a: str, b: str) -> str:
    return f"CAST(({a}) <= ({b}) AS INT)"


def sql_cross(a: str, b: str, above: bool = True) -> str:
    pa, pb = sql_shift(a, 1), sql_shift(b, 1)
    if above:
        return f"CAST((({a}) > ({b})) AND (({pa}) <= ({pb})) AS INT)"
    return f"CAST((({a}) < ({b})) AND (({pa}) >= ({pb})) AS INT)"
