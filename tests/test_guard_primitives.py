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

# pairs that must hit specific ratio legs regardless of how the rotated
# grid lines up: overflow (finite/finite -> inf), underflow
# (finite/finite -> 0.0, the ln(0) DuckDB-hard-error leg), and their
# clean neighbours
EXPLICIT_PAIRS = [
    (1e308, 1e-320),   # ratio overflows to inf
    (5e-324, 1e6),     # ratio underflows to 0.0
    (1e-320, 1e308),   # ratio underflows to 0.0 (both subnormal-ish)
    (1e308, 1.0),      # huge but finite ratio (ln ~ 709, valid)
    (1.0, 1e308),      # tiny but nonzero ratio (ln ~ -709, valid)
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

    vals = _values()
    # pair every value with a rotated copy so the (num, den) grid hits
    # dirty/clean combinations on both sides, plus the explicit
    # ratio-leg pairs
    pairs = pd.DataFrame({
        "a": vals + [p[0] for p in EXPLICIT_PAIRS],
        "b": vals[7:] + vals[:7] + [p[1] for p in EXPLICIT_PAIRS],
    })

    # the engine's documented session posture (load_table sets it for
    # every real query path): non-ANSI, where x/0.0 is NULL in BOTH
    # engines instead of Spark 4's ANSI divide-by-zero error. Saved and
    # RESTORED: the conftest session is shared, and leaking the flag
    # would make later tests order-dependent.
    saved_ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        sdf = spark.createDataFrame(pairs)
        got_s = sdf.select(
            round_col(F.col("a")).alias("r"),
            _qlog(F.col("a"), F.col("b")).alias("q"),
            _glog(F.col("a"), F.col("b")).alias("g"),
        ).toPandas()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", saved_ansi)

    con = duckdb.connect()
    con.register("pairs", pairs)
    got_d = con.execute(f"""
        SELECT {sql_round('a')} AS r,
               {_sql_qlog('a', 'b')} AS q,
               {_sql_glog('a', 'b')} AS g
        FROM pairs
    """).df()

    rs_all, rd_all = _col(got_s, "r"), _col(got_d, "r")
    qs_all, qd_all = _col(got_s, "q"), _col(got_d, "q")
    gs_all, gd_all = _col(got_s, "g"), _col(got_d, "g")

    n_checked = 0
    for i, (a, b) in enumerate(zip(pairs["a"], pairs["b"])):
        # round primitive: all three twins on EVERYTHING, including the
        # identity band (NaN/inf/huge pass through unrounded — the
        # branch this round added; dropping it from any one twin must
        # fail here)
        rs, rd = rs_all[i], rd_all[i]
        assert _nan_eq(rs, rd), f"round: a={a!r} spark={rs!r} duck={rd!r}"
        # pandas collapses NULL and NaN in float64 columns, so _col
        # maps NaN -> None for the engine sides; normalize the python
        # side identically (py_round(NaN) IS NaN via the identity band)
        pr = py_round(a)
        pr = None if (isinstance(pr, float) and math.isnan(pr)) else pr
        assert _nan_eq(pr, rs), \
            f"py_round: a={a!r} py={pr!r} spark={rs!r}"
        # guarded log ratio: the VALIDITY pattern (which rows are
        # invalid) must agree EXACTLY across all three engines — that is
        # the bug class the guards exist for. Values agree up to the
        # documented JVM-vs-libm ln 1-ulp difference: raw doubles within
        # 4 ulps, quantized BIGINTs within 1 grid quantum (a boundary-
        # straddling ulp flips one floor — absorbed by every op-level
        # tolerance, and empirically absent on corpus values where the
        # exact gate stays green).
        qs, qd = qs_all[i], qd_all[i]
        gs, gd = gs_all[i], gd_all[i]
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

    # the dirty legs genuinely fired, including BOTH ratio legs: every
    # NaN/inf/non-positive input AND every overflowing/underflowing
    # ratio produced an invalid (None) qlog in every engine
    def _ratio_ok(a, b):
        if not (a > 0 and b > 0 and math.isfinite(a) and math.isfinite(b)):
            return False
        r = a / b
        return r > 0 and math.isfinite(r)

    dirty = [i for i, (a, b) in enumerate(zip(pairs["a"], pairs["b"]))
             if not _ratio_ok(a, b)]
    over = [i for i, (a, b) in enumerate(zip(pairs["a"], pairs["b"]))
            if a > 0 and b > 0 and math.isfinite(a) and math.isfinite(b)
            and math.isinf(a / b)]
    under = [i for i, (a, b) in enumerate(zip(pairs["a"], pairs["b"]))
             if a > 0 and b > 0 and math.isfinite(a) and math.isfinite(b)
             and a / b == 0.0]
    assert over and under, "ratio-leg pairs missing from the grid"
    for i in dirty:
        assert qs_all[i] is None
        assert qd_all[i] is None


def test_kyle_vol_cap_closes_second_moment_overflow(spark):
    """KYLE_VOL_MAX (ADVICE r9): sv inside int64 is NOT enough — the
    second moments sx*sx and n*sxx must fit decimal(38,0) AND HUGEINT.
    Under the bare I64_BAR_MAX guard, a window of ~8e17-share bars kept
    every sv int64-clean yet put n*sxx at ~2.6e38: Spark's non-ANSI
    decimal silently NULLed lambda, DuckDB hard-errored, and the
    streaming twin's unbounded python ints computed a real value — a
    three-way divergence invisible to the corpus gate (sf volumes are
    tiny). This pins (a) the static bound, (b) all-engine agreement on
    a planted near-cap / above-cap / ordinary volume grid, including
    that near-cap FULL windows stay finite (the silent-NULL class) and
    above-cap bars are invalid everywhere."""
    from pandas_ta_spark.ext.microstructure import (
        KYLE_LAMBDA_SQL,
        KYLE_VOL_MAX,
        MS_N,
        MS_SCALE,
        kyle_lambda,
    )
    from pandas_ta_spark.sources.bars import BARS_FROM_EVENTS_SQL

    # (a) static invariant: worst-case same-sign window second moments
    # fit both 128-bit accumulators with margin, and sv fits int64
    worst = (MS_N * KYLE_VOL_MAX) ** 2          # bounds sx*sx and n*sxx
    assert worst * 20 < 10.0 ** 38              # Spark decimal(38,0)
    assert worst * 20 < 1.7e38                  # DuckDB HUGEINT
    assert KYLE_VOL_MAX < 2.0 ** 63

    # (b) planted grid: phase1 near-cap valid, phase2 the old trap
    # class (int64-clean but second-moment-overflowing), phase3 ordinary
    n = 4 * MS_N
    p1_end, p2_end = MS_N + 2, 2 * MS_N + 2
    closes, vols, p = [], [], 100.0
    for i in range(n):
        p *= 1.002 if i % 2 == 0 else 1.0 / 1.001
        closes.append(p)
        vols.append(KYLE_VOL_MAX * 0.9 if i < p1_end
                    else KYLE_VOL_MAX * 8.0 if i < p2_end
                    else 1000.0 + i)
    pdf = pd.DataFrame({
        "symbol": "K",
        "ts": pd.date_range("2024-01-01", periods=n, freq="h"),
        "open": closes, "high": [c * 1.01 for c in closes],
        "low": [c * 0.99 for c in closes], "close": closes,
        "volume": vols,
    })

    saved_ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        got_s = (kyle_lambda(spark.createDataFrame(pdf))
                 .toPandas().sort_values("ts").reset_index(drop=True))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", saved_ansi)

    # the REAL SQL twin, re-rooted at the planted bars (must not error:
    # pre-fix this query HUGEINT-overflowed on phase2)
    prefix = f"WITH bars AS (\n{BARS_FROM_EVENTS_SQL}\n)\n"
    assert KYLE_LAMBDA_SQL.startswith(prefix)
    con = duckdb.connect()
    con.register("planted", pdf)
    got_d = (con.execute("WITH bars AS (SELECT * FROM planted)\n"
                         + KYLE_LAMBDA_SQL[len(prefix):])
             .df().sort_values("ts").reset_index(drop=True))

    # third way: unbounded python ints with the streaming twin's guard
    exp, ring, prev = [], [], None
    for close, vol in zip(closes, vols):
        dp = (int(math.floor(math.log(close / prev) * MS_SCALE + 0.5))
              if prev is not None else None)
        prev = close
        entry = None
        if dp is not None and 0 <= vol < KYLE_VOL_MAX and math.isfinite(vol):
            sign = 1 if dp > 0 else (-1 if dp < 0 else 0)
            entry = (sign * int(math.floor(vol)), dp)
        ring.append(entry)
        if len(ring) > MS_N:
            ring.pop(0)
        xs = [q for q in ring if q is not None]
        lam = None
        if len(xs) >= MS_N:
            sx = sum(x for x, _ in xs)
            sy = sum(y for _, y in xs)
            var_s = len(xs) * sum(x * x for x, _ in xs) - sx * sx
            if var_s > 0:
                cov_s = (len(xs) * sum(x * y for x, y in xs) - sx * sy)
                lam = float(cov_s) / float(var_s) / MS_SCALE
        exp.append(lam)

    ls, ld = _col(got_s, "kyle_lambda"), _col(got_d, "kyle_lambda")
    assert len(ls) == len(ld) == n
    for i in range(n):
        assert (ls[i] is None) == (ld[i] is None) == (exp[i] is None), \
            f"validity i={i} vol={vols[i]!r}: {ls[i]!r}/{ld[i]!r}/{exp[i]!r}"
        if ls[i] is not None:
            assert abs(ls[i] - ld[i]) <= 1e-15 + 1e-9 * abs(ls[i]), i
            assert abs(ls[i] - exp[i]) <= 1e-12 + 1e-6 * abs(exp[i]), i
    # the phases genuinely fired: near-cap full windows FINITE (the
    # silent-NULL overflow would None them), above-cap rows invalid,
    # and the window recovers to finite on ordinary volumes
    assert any(v is not None for v in ls[MS_N:p1_end]), "phase1 vacuous"
    assert all(v is None for v in ls[p1_end:p2_end + MS_N - 1]), \
        "above-cap bar contributed to a window"
    assert ls[-1] is not None, "phase3 never recovered"


def test_seed_mean_three_path_parity():
    """r12 seed unification (ADVICE r11): base.seed_mean (the batch +
    streaming path), its numpy-slice usage, and the DuckDB evaluation of
    ewm_sql.sql_seed_mean must produce BIT-IDENTICAL seeds for any
    finite in-guard window — including half-grid-boundary means that the
    old three-association scheme could round to different grid points.
    Out-of-guard windows (inf/NaN/huge) take the legacy branch on both
    sides, which py_round passes through unrounded."""
    import duckdb as ddb

    from pandas_ta_spark.operators.base import SEED_GUARD, py_round, seed_mean
    from pandas_ta_spark.operators.ewm_sql import sql_seed_mean

    rng = np.random.default_rng(7)
    windows = [
        # half-grid boundary: mean lands exactly on k + 0.5e-6
        [1.0000005, 1.0000005, 1.0000005],
        [0.1, 0.2, 0.3000001],
        list(rng.uniform(-1e6, 1e6, 14)),
        list(rng.uniform(-1e-5, 1e-5, 30)),
        list(rng.uniform(1e9, 9e12 - 1, 10)),   # near the guard, inside
        [-5.5e-7, 5.5e-7],                       # signed tie
        [9e12, 1.0, 2.0],                        # guard breach -> legacy
        [float("nan"), 1.0],                     # NaN -> legacy (NaN out)
    ]
    con = ddb.connect()
    frame = "(ORDER BY rn ROWS BETWEEN {n} PRECEDING AND CURRENT ROW)"
    for w in windows:
        w = [float(v) for v in w]
        got_py = seed_mean(w)
        # numpy-slice entry point (the exact call ewm_seeded makes)
        got_np = seed_mean(np.asarray(w, dtype="float64"))
        rows = ", ".join(
            f"({i}, {chr(39) + 'NaN' + chr(39) if math.isnan(v) else repr(v)}::DOUBLE)"
            for i, v in enumerate(w))
        expr = sql_seed_mean("x", frame.format(n=len(w) - 1))
        sql_val = con.execute(
            f"SELECT {expr} AS s FROM (VALUES {rows}) t(rn, x) "
            f"ORDER BY rn DESC LIMIT 1").fetchone()[0]
        # the CTE anchors on sql_round(_sma) — apply the same twin
        from pandas_ta_spark.operators.base import _ROUND_GUARD  # noqa: F401

        got_sql = py_round(float(sql_val)) if sql_val is not None else None
        for name, got in (("numpy", got_np), ("duckdb", got_sql)):
            if math.isnan(got_py):
                assert got is None or math.isnan(got), (name, w, got)
            else:
                assert got == got_py, (name, w, got, got_py)
    con.close()
