"""Adversarial cross-engine parity for the shared guard/rounding
primitives — the trap catalog as ONE executable table.

Every cross-engine bug class this repo has hit (ln(0) hard-error vs
NULL, floor(NaN)::long fabricating zeros, inf saturate-vs-error,
rounding-boundary ulps) funnels through four primitives: round_col /
sql_round / py_round and _qlog / _sql_qlog / _lnq (+ the unquantized
_glog twins). The op-level gate only exercises them on clean corpus
values; this test feeds one adversarial value grid (zeros, signed
zeros, subnormals, rounding-grid boundaries, huge magnitudes, inf,
NaN) plus seeded random log-space values through ALL THREE engines in
one vectorized pass each and requires exact agreement — so a primitive
regression is caught at the primitive, not two rounds later as a red
driver row."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest  # noqa: F401

ADVERSARIAL = [
    0.0, -0.0, 1.0, -1.0, 0.5, -0.5,
    # 1e-6 rounding-grid boundaries (the floor(x*1e6+0.5) half points)
    0.0000005, 0.0000015, -0.0000005, 1.0000005, 123.4567895,
    0.49999999999, 0.50000000001,
    # magnitudes
    1e-320, 5e-324, 1e-12, 1e6, 1e12, 1e15, 662.0,
    # dirty
    float("inf"), float("-inf"), float("nan"),
    # price-ish
    0.01, 387.0, 99.99999949999999, 100.0000005,
]


def _values():
    rng = np.random.default_rng(17)
    vals = list(ADVERSARIAL)
    vals += list(np.exp(rng.normal(0, 3, 200)))      # positive log-space
    vals += list(rng.normal(0, 100, 100))            # signed
    return [float(v) for v in vals]


def _nan_eq(a, b):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
    return a == b


def _col(df, name):
    out = []
    for v in df[name]:
        if v is None or (isinstance(v, float) and pd.isna(v)):
            out.append(None)
        elif pd.isna(v):  # pandas NA from nullable int
            out.append(None)
        else:
            out.append(float(v))
    return out


def test_round_and_qlog_primitives_cross_engine(spark):
    from pandas_ta_spark.ext.microstructure import (
        MS_SCALE,
        _glog,
        _qlog,
        _sql_glog,
        _sql_qlog,
    )
    from pandas_ta_spark.operators.base import py_round, round_col, sql_round
    from pandas_ta_spark.streaming.indicators import _lnq

    from pyspark.sql import functions as F

    # the engine's documented session posture (load_table sets it for
    # every real query path): non-ANSI, where x/0.0 is NULL in BOTH
    # engines instead of Spark 4's ANSI divide-by-zero error
    spark.conf.set("spark.sql.ansi.enabled", "false")

    vals = _values()
    # pair every value with a rotated copy so the (num, den) grid hits
    # dirty/clean combinations on both sides
    pairs = pd.DataFrame({
        "a": vals,
        "b": vals[7:] + vals[:7],
    })

    sdf = spark.createDataFrame(pairs)
    got_s = sdf.select(
        round_col(F.col("a")).alias("r"),
        _qlog(F.col("a"), F.col("b")).alias("q"),
        _glog(F.col("a"), F.col("b")).alias("g"),
    ).toPandas()

    con = duckdb.connect()
    con.register("pairs", pairs)
    got_d = con.execute(f"""
        SELECT {sql_round('a')} AS r,
               {_sql_qlog('a', 'b')} AS q,
               {_sql_glog('a', 'b')} AS g
        FROM pairs
    """).df()

    n_checked = 0
    for i, (a, b) in enumerate(zip(pairs["a"], pairs["b"])):
        # round primitive: Spark vs DuckDB on everything; python on
        # finite values (py_round is only reached behind twin guards,
        # and math.floor(inf) raises by design)
        rs, rd = _col(got_s, "r")[i], _col(got_d, "r")[i]
        assert _nan_eq(rs, rd), f"round: a={a!r} spark={rs!r} duck={rd!r}"
        if math.isfinite(a):
            assert _nan_eq(py_round(a), rs), \
                f"py_round: a={a!r} py={py_round(a)!r} spark={rs!r}"
        # guarded log ratio: the VALIDITY pattern (which rows are
        # invalid) must agree EXACTLY across all three engines — that is
        # the bug class the guards exist for. Values agree up to the
        # documented JVM-vs-libm ln 1-ulp difference: raw doubles within
        # 4 ulps, quantized BIGINTs within 1 grid quantum (a boundary-
        # straddling ulp flips one floor — absorbed by every op-level
        # tolerance, and empirically absent on corpus values where the
        # exact gate stays green).
        qs, qd = _col(got_s, "q")[i], _col(got_d, "q")[i]
        gs, gd = _col(got_s, "g")[i], _col(got_d, "g")[i]
        lq = _lnq(a, b, MS_SCALE)
        lqf = float(lq) if lq is not None else None
        assert (qs is None) == (qd is None) == (lqf is None), \
            f"qlog validity: ({a!r},{b!r}) {qs!r}/{qd!r}/{lqf!r}"
        assert (gs is None) == (gd is None), \
            f"glog validity: ({a!r},{b!r}) {gs!r}/{gd!r}"
        if qs is not None:
            assert abs(qs - qd) <= 1 and abs(qs - lqf) <= 1, \
                f"qlog value: ({a!r},{b!r}) {qs!r}/{qd!r}/{lqf!r}"
        if gs is not None:
            assert gd == gs or abs(gd - gs) <= 4 * abs(
                np.spacing(gs)), f"glog: ({a!r},{b!r}) {gs!r} vs {gd!r}"
        n_checked += 1
    assert n_checked == len(pairs)
    # the dirty legs genuinely fired: every NaN/inf/non-positive input
    # produced an invalid (None) qlog in every engine
    dirty = [i for i, (a, b) in enumerate(zip(pairs["a"], pairs["b"]))
             if not (a > 0 and b > 0 and math.isfinite(a)
                     and math.isfinite(b))]
    assert dirty, "adversarial grid lost its dirty rows"
    for i in dirty:
        assert _col(got_s, "q")[i] is None
        assert _col(got_d, "q")[i] is None
