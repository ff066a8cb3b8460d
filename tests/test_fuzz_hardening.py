"""Regression pins for the adversarial-data fuzz findings (r11).

Each test reconstructs the minimal data shape that diverged between the
Spark engine and its DuckDB oracle under tools/fuzz_gate.py, and
asserts exact cross-engine parity (tools/check.py's driver-faithful
compare). Classes covered:

- warmup off-by-one at minimum group size (vidya / ebsw / psar)
- 128-bit fixed-point cumsums (Spark floor-LONG saturation vs DuckDB)
- constant-window dispersion (exact 0 / NULL on both engines)
- zero-denominator rolling ratios (brar)
- pandas ewm's constant-series hold guard (ema chain flags: aobv/amat)
- unicode byte semantics in the media oracles (_md5_hex contract)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check import compare  # noqa: E402
from fuzz_gate import EVENT_TYPES, _documents, _events, _write_like  # noqa: E402


def _write_events(d, ts_us, event_type, value, user_id=None):
    n = len(value)
    rng = np.random.default_rng(0)
    uid = user_id if user_id is not None else rng.integers(0, 10, n)
    _write_like("events", os.path.join(d, "events.parquet"),
                _events(rng, n, ts_us, uid, event_type, value))


def _hourly_ts(n, start="2024-01-01T00:30:00"):
    base = np.datetime64(start, "us")
    return base + (np.arange(n, dtype=np.int64)
                   * 3_600_000_000).astype("timedelta64[us]")


def _run_pair(spark, d, key):
    import __spark_entry__ as E

    qs, orc = E.queries(), E.oracle_sql()
    sdf = qs[key](spark, d).toPandas()
    con = duckdb.connect()
    for t in ("events", "documents"):
        p = os.path.join(d, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    odf = con.execute(orc[key]).df()
    con.close()
    return sdf, odf


def _assert_parity(spark, d, keys):
    for k in keys:
        sdf, odf = _run_pair(spark, d, k)
        msg = compare(sdf, odf)
        assert not msg, f"{k}: {msg}"


def test_min_group_size_boundaries(spark, tmp_path):
    """One symbol with EXACTLY vidya's length bars, one sub-ebsw-length
    symbol, one single-row symbol: the kernels must emit exactly what
    the oracles emit (fuzz: vidya suppressed its anchor at n == length,
    ebsw refused sub-length groups, psar dropped the single-row af0)."""
    d = str(tmp_path)
    rng = np.random.default_rng(3)
    # view: 14 bars (vidya_14 anchor boundary); click: 20 bars (< ebsw
    # 40); signup: 1 bar (psar single row)
    seg = [("view", 14), ("click", 20), ("signup", 1)]
    ts, et, val = [], [], []
    for sym, n in seg:
        t = _hourly_ts(n)
        ts.append(t)
        et.extend([sym] * n)
        val.extend(np.round(rng.uniform(10, 500, n), 2))
    _write_events(d, np.concatenate(ts), et, np.asarray(val))
    _assert_parity(spark, d, ["vidya_14", "ebsw_40", "psar"])
    # the boundary rows actually materialize (not all-NULL)
    sdf, _ = _run_pair(spark, d, "vidya_14")
    v = sdf[sdf.symbol == "view"].sort_values("ts")["VIDYA_14"]
    assert v.notna().sum() == 1  # the anchor row at n == length
    sdf, _ = _run_pair(spark, d, "ebsw_40")
    e = sdf[sdf.symbol == "click"].sort_values("ts")["EBSW_40_10"]
    assert e.notna().any()  # sub-length group still emits from row 2
    sdf, _ = _run_pair(spark, d, "psar")
    row = sdf[sdf.symbol == "signup"].iloc[0]
    assert row["PSARaf_0.02_0.2"] == 0.02 and row["PSARr_0.02_0.2"] == 0.0


def test_cumsum_fixed_128bit_parity(spark, tmp_path):
    """Fixed-point cumsums at violent price ratios.

    In-domain (ratio capped at 1e6): exact parity — quantized terms stay
    inside the long-floor range and sums are bit-identical 128-bit ints.

    Beyond domain (1e-9 <-> 1e9, quantized terms ~1e28): Spark's
    floor-LONG used to SATURATE silently at 9.2e18 while DuckDB stayed
    exact (fuzz: maxabs ~1.9e13 garbage). With the deterministic ±2^62
    term clamp the SUMS are bit-identical; the residual is DuckDB's
    not-correctly-rounded hugeint->double on the final cast (windows.py
    Q_SAT note) — assert the ulp bound instead of exactness there."""
    import math

    d = str(tmp_path)
    n = 80
    val = np.where(np.arange(n) % 2 == 0, 1.0, 1e6)  # in-domain whiplash
    _write_events(d, _hourly_ts(n), ["purchase"] * n, val)
    _assert_parity(spark, d, ["pvt", "nvi_1", "pvi_1", "obv", "ad"])

    d2 = str(tmp_path / "beyond")
    os.makedirs(d2)
    val = np.where(np.arange(n) % 2 == 0, 1e-9, 1e9)  # beyond domain
    _write_events(d2, _hourly_ts(n), ["purchase"] * n, val)
    sdf, odf = _run_pair(spark, d2, "pvt")
    s = sdf.sort_values("ts")["PVT"].astype(float).to_numpy()
    o = odf.sort_values("ts")["PVT"].astype(float).to_numpy()
    for x, y in zip(s, o):
        if math.isnan(x) and math.isnan(y):
            continue
        assert abs(x - y) <= 4 * math.ulp(max(abs(x), abs(y))), (x, y)


def test_constant_window_dispersion(spark, tmp_path):
    """A constant price series: dispersion is EXACTLY 0 (stdev/variance/
    bbands width) and moment ratios are NULL (zscore/skew/kurtosis/
    cdl_z) on BOTH engines — the computed path's noise/noise garbage
    diverged per engine (fuzz, extreme profile)."""
    d = str(tmp_path)
    n = 50
    _write_events(d, _hourly_ts(n), ["view"] * n, np.full(n, 0.0001))
    _assert_parity(spark, d, [
        "stdev_30", "variance_30", "zscore_30", "skew_30", "kurtosis_30",
        "cdl_z_30", "bbands_5_2.0", "squeeze_20", "squeeze_pro_20"])
    sdf, _ = _run_pair(spark, d, "stdev_30")
    got = sdf.sort_values("ts")["STDEV_30"].iloc[-1]
    assert got == 0.0
    sdf, _ = _run_pair(spark, d, "zscore_30")
    assert sdf["ZS_30"].isna().all()


def test_brar_zero_denominator_is_null(spark, tmp_path):
    """Strictly-increasing prices make every bar's open == low, so the
    o-l window sum is EXACTLY 0 for the whole series: AR must be NULL on
    both engines (numpy's x/0 = inf diverged from SQL NULL)."""
    d = str(tmp_path)
    n = 40
    _write_events(d, _hourly_ts(n), ["view"] * n,
                  np.arange(1, n + 1, dtype=np.float64))
    _assert_parity(spark, d, ["brar_26"])
    sdf, _ = _run_pair(spark, d, "brar_26")
    assert sdf["AR_26"].isna().all()


def test_ewm_constant_hold_flags(spark, tmp_path):
    """A long flat stretch drives EMA diffs to exactly 0, where pandas'
    constant-series hold guard and the raw recursion disagree in the
    last ulp — run flags (aobv/amat) and the EMA chain itself must stay
    cross-engine exact (flag_quantize + the EwmStage guard)."""
    d = str(tmp_path)
    rng = np.random.default_rng(11)
    n = 120
    val = np.concatenate([
        np.round(rng.uniform(50, 60, 30), 2),
        np.full(60, 55.0),                      # flat stretch
        np.round(rng.uniform(50, 60, 30), 2)])
    _write_events(d, _hourly_ts(n), ["view"] * n, val)
    _assert_parity(spark, d, [
        "aobv", "amat_8_21_2", "ema_10", "macd_12_26_9",
        "tsignals_8_21", "long_run_8_21", "short_run_8_21",
        "stc_10_12_26"])


def test_media_unicode_byte_parity(spark, tmp_path):
    """Multi-byte utf-8 payloads: the media oracles must read true
    PAYLOAD BYTES (hex-pair arithmetic) and hashes must follow the
    _md5_hex contract — per-char ord()/md5(varchar) matched only while
    the corpus was ASCII."""
    d = str(tmp_path)
    texts = [
        "数据处理引擎在大规模语料上运行去重检索任务的字节级测试",
        "mixed 中文 and english tokens in one 文档 here with extra words",
        "café résumé naïve coöperate São Paulo Zürich emoji 🚀🎉",
        "plain ascii document with enough bytes to fill many frames",
        "Привет мир это русский текст для теста медиа байтов",
    ] * 4
    _write_like("documents", os.path.join(d, "documents.parquet"),
                _documents(texts,
                           ["zh", "en", "fr", "en", "ru"] * 4,
                           [f"src{i % 3}" for i in range(len(texts))]))
    _assert_parity(spark, d, [
        "media_meta", "media_features", "media_frame_sample",
        "media_resize_8"])
    # the fingerprint contract itself: md5 of the UPPERCASE hex
    import hashlib

    from pandas_ta_spark.ext.media import _md5_hex

    payload = texts[0].encode()[:16]
    assert _md5_hex(payload) == hashlib.md5(
        payload.hex().upper().encode()).hexdigest()


def test_flag_quantize_nan_parity(spark):
    """NaN comparands: Spark floor(DOUBLE) maps NaN to 0 (LONG) while
    DuckDB keeps NaN (> 0 true) — flag_quantize must yield NULL on both
    so downstream coalesce renders identical false flags."""
    from pyspark.sql import functions as F

    from pandas_ta_spark.operators.base import flag_quantize, sql_flag_quantize

    row = spark.range(1).select(
        flag_quantize(F.lit(float("nan"))).alias("q_nan"),
        flag_quantize(F.lit(2.5e-7)).alias("q_tiny"),
        flag_quantize(F.lit(-3.2)).alias("q_neg"),
    ).collect()[0]
    assert row["q_nan"] is None
    assert row["q_tiny"] == 0 and row["q_neg"] == -3200000
    nan_expr = sql_flag_quantize("'NaN'::DOUBLE")
    got = duckdb.connect().execute(
        f"SELECT {nan_expr},"
        f" {sql_flag_quantize('2.5e-7')},"
        f" {sql_flag_quantize('-3.2')}").fetchone()
    assert got[0] is None and got[1] == 0 and got[2] == -3200000


def test_grid_edge_downgrade_is_rate_only():
    """ADVICE r11: the grid_edge downgrade requires a large enough output
    for a rate to be meaningful. On small outputs ANY one-grid-step diff
    is classified real (gating); on large outputs the 0.5% rate budget
    applies — and the old max(3, ...) absolute floor is gone."""
    from fuzz_reexamine import MIN_ROWS_FOR_RATE, classify

    def frames(n, n_edge):
        ids = np.arange(n, dtype=np.int64)
        base = np.linspace(1.0, 2.0, n)
        other = base.copy()
        other[:n_edge] = other[:n_edge] + 1e-6  # exactly one grid step
        a = pd.DataFrame({"doc_id": ids, "v": base})
        b = pd.DataFrame({"doc_id": ids, "v": other})
        return a, b

    # small output: 1 edge diff on 100 rows -> real, not grid_edge
    small = classify(*frames(100, 1))
    assert small["verdict"] == "real"
    # large output: 3 edge rows on 1000 (0.3% <= 0.5%) -> grid_edge
    large = classify(*frames(1000, 3))
    assert large["verdict"] == "grid_edge"
    # large output over budget: 9 rows on 1000 (0.9%) -> real
    over = classify(*frames(1000, 9))
    assert over["verdict"] == "real"
    # the boundary constant is what the gate documents
    assert MIN_ROWS_FOR_RATE == 600
