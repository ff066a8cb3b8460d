"""performance/ package ops (SURVEY.md §2.3) — returns & drawdown.

PROJ/CUM kinds: lag expressions and expanding-window aggregates over the
shared (symbol, ts) ordering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_ta_spark.functions.naming import name
from pandas_ta_spark.functions.windows import (
    SQL_W_ALL,
    shift,
    sql_shift,
    w_all,
)
from pandas_ta_spark.operators.base import Indicator

CAT = "performance"


def drawdown():
    """DD = cummax(c) - c, DD_PCT = 1 - c/cummax, DD_LOG = ln(cummax/c) —
    pandas_ta/performance/drawdown.py#drawdown."""
    mx = F.max("close").over(w_all())
    smx = f"max(close) OVER ({SQL_W_ALL})"
    return Indicator(
        "drawdown", ["DD", "DD_PCT", "DD_LOG"], CAT,
        final={
            "DD": mx - F.col("close"),
            "DD_PCT": 1 - F.col("close") / mx,
            "DD_LOG": F.log(mx) - F.log("close"),
        },
        sql_final={
            "DD": f"({smx}) - close",
            "DD_PCT": f"1 - close / ({smx})",
            "DD_LOG": f"ln({smx}) - ln(close)",
        },
    )


def log_return(length: int = 1, cumulative: bool = False):
    """ln(c/c.shift(n)); cumulative -> ln(c/first(c)) —
    pandas_ta/performance/log_return.py#log_return."""
    if cumulative:
        out = name("CUMLOGRET", length)
        first = F.first("close").over(w_all())
        e = F.log(F.col("close") / first)
        s = f"ln(close / (first(close) OVER ({SQL_W_ALL})))"
    else:
        out = name("LOGRET", length)
        e = F.log(F.col("close") / shift("close", length))
        s = f"ln(close / ({sql_shift('close', length)}))"
    return Indicator("log_return", [out], CAT, final={out: e}, sql_final={out: s})


def percent_return(length: int = 1, cumulative: bool = False):
    """c/c.shift(n) - 1; cumulative -> c/first(c) - 1 —
    pandas_ta/performance/percent_return.py#percent_return."""
    if cumulative:
        out = name("CUMPCTRET", length)
        e = F.col("close") / F.first("close").over(w_all()) - 1
        s = f"close / (first(close) OVER ({SQL_W_ALL})) - 1"
    else:
        out = name("PCTRET", length)
        e = F.col("close") / shift("close", length) - 1
        s = f"close / ({sql_shift('close', length)}) - 1"
    return Indicator("percent_return", [out], CAT, final={out: e}, sql_final={out: s})


FACTORIES = {
    "drawdown": drawdown, "log_return": log_return,
    "percent_return": percent_return,
}

SUITE = {
    "drawdown": drawdown,
    "log_return_1": log_return, "log_return_5": lambda: log_return(5),
    "cum_log_return": lambda: log_return(cumulative=True),
    "percent_return_1": percent_return,
    "percent_return_5": lambda: percent_return(5),
    "cum_percent_return": lambda: percent_return(cumulative=True),
}
