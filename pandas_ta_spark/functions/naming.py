"""Reference column-naming conventions.

pandas-ta names outputs ``f"{KIND}_{param1}_{param2}"`` with raw Python
param formatting — ints bare, floats with their repr (``BBL_5_2.0``), see
``pandas_ta/momentum/rsi.py#rsi`` (``result.name = f"RSI_{length}"``),
``pandas_ta/volatility/bbands.py#bbands``. The driver's oracle compare
sorts columns by name, so these aliases must match byte-for-byte between
queries() and oracle_sql().
"""

from __future__ import annotations


def p(x) -> str:
    """Format one parameter the way pandas-ta f-strings do (raw str():
    ints bare, floats keep their '.0')."""
    return str(x)


def name(kind: str, *params) -> str:
    """e.g. name('RSI', 14) -> 'RSI_14'; name('BBL', 5, 2.0) -> 'BBL_5_2.0'."""
    parts = [kind] + [p(x) for x in params]
    return "_".join(parts)
