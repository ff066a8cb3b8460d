"""Signal utilities as driver-checkable indicators (SURVEY.md §2.9 —
pandas_ta/utils/_signals.py). The suite binds them to the classic
close-vs-SMA(20) pair; any two Columns work via functions/signals.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_ta_spark.functions import signals as sig
from pandas_ta_spark.functions.windows import roll, sql_roll
from pandas_ta_spark.operators.base import Indicator

CAT = "signals"


def _sma_pair(length: int = 20):
    c = f"_sig_sma{length}"
    stage = {c: roll(F.avg, "close", length)}
    sql_stage = {c: sql_roll("avg", "close", length)}
    return c, stage, sql_stage


def above(length: int = 20):
    """close >= SMA(n) as 0/1 — utils/_signals.py#above. NULL while the
    MA warms up (comparison with NULL)."""
    c, stage, sql_stage = _sma_pair(length)
    out = f"close_A_SMA_{length}"
    return Indicator(
        "above", [out], CAT, stages=[stage],
        final={out: sig.above("close", c)},
        sql_stages=[sql_stage],
        sql_final={out: sig.sql_above("close", c)},
    )


def below(length: int = 20):
    c, stage, sql_stage = _sma_pair(length)
    out = f"close_B_SMA_{length}"
    return Indicator(
        "below", [out], CAT, stages=[stage],
        final={out: sig.below("close", c)},
        sql_stages=[sql_stage],
        sql_final={out: sig.sql_below("close", c)},
    )


def cross(length: int = 20, above_: bool = True):
    """Cross events — utils/_signals.py#cross: now on one side,
    previously on the other; name pattern {A}_XA_{B} / {A}_XB_{B}."""
    c, stage, sql_stage = _sma_pair(length)
    kind = "XA" if above_ else "XB"
    out = f"close_{kind}_SMA_{length}"
    return Indicator(
        "cross", [out], CAT, stages=[stage],
        final={out: sig.cross("close", c, above=above_)},
        sql_stages=[sql_stage],
        sql_final={out: sig.sql_cross("close", c, above=above_)},
    )


def cross_value(value: float = 100.0, above_: bool = True):
    """close crossing a constant — utils/_signals.py#cross_value."""
    kind = "XAv" if above_ else "XBv"
    out = f"close_{kind}_{value}"
    return Indicator(
        "cross_value", [out], CAT,
        final={out: sig.cross_value("close", value, above=above_)},
        sql_final={out: sig.sql_cross("close", repr(float(value)), above=above_)},
    )


def above_value_raw(value: float = 100.0):
    """close >= constant with quantize=False (r11 strict opt-out), as a
    value-checked oracle key. Raw twins compare un-rounded doubles, so
    the oracle contract holds only for engine-independent comparands —
    here the raw parquet close against a literal (a rolling mean would
    differ in the last ulp between engines; that case is what the
    default grid-quantized signals exist for)."""
    v = repr(float(value))
    out = f"close_A_{value}_RAW"
    return Indicator(
        "above_value", [out], CAT,
        final={out: sig.above_value("close", value, quantize=False)},
        sql_final={out: sig.sql_above_raw("close", v)},
    )


def cross_value_raw(value: float = 100.0, above_: bool = True):
    """cross_value with quantize=False — strict IEEE comparisons on the
    raw close and its lag (engine-stable comparands, see
    above_value_raw)."""
    v = repr(float(value))
    kind = "XAv" if above_ else "XBv"
    out = f"close_{kind}_{value}_RAW"
    return Indicator(
        "cross_value", [out], CAT,
        final={out: sig.cross_value("close", value, above=above_,
                                    quantize=False)},
        sql_final={out: sig.sql_cross_raw("close", v, above=above_)},
    )


FACTORIES = {
    "above": above, "below": below, "cross": cross, "cross_value": cross_value,
    "above_value_raw": above_value_raw, "cross_value_raw": cross_value_raw,
}

SUITE = {
    "above_sma_20": above, "below_sma_20": below,
    "cross_above_sma_20": cross,
    "cross_below_sma_20": lambda: cross(above_=False),
    "cross_value_100": cross_value,
    "above_value_100_raw": above_value_raw,
    "cross_value_100_raw": cross_value_raw,
}
