"""Replay parity for the r12 streaming twins (VERDICT r11 ask #6):
psar, qqe, stc, hwc, ebsw vs their batch Arrow kernels, with state
crossing micro-batch boundaries (including the PSAR bootstrap split:
the first chunk holds ONLY row 0, so the falling/sar/ep bootstrap at
row 1 must come entirely from carried state)."""

from __future__ import annotations

import pandas as pd

from tests.conftest import assert_close, one_symbol


def _replay(spark, tmp_path, name, pdf, cols, build, splits):
    src = tmp_path / f"{name}_src"
    src.mkdir()
    a = pdf[["symbol", "ts", *cols]].copy()
    a["ts"] = a["ts"].astype("datetime64[ms]")
    lo = 0
    for i, hi in enumerate([*splits, len(a)]):
        a.iloc[lo:hi].to_parquet(src / f"p{i}.parquet")
        lo = hi
    ddl = ", ".join(["symbol string", "ts timestamp"]
                    + [f"{c} double" for c in cols])
    stream = (spark.readStream.schema(ddl)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (build(stream).writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.sql(f"SELECT * FROM {name}").toPandas()
           .sort_values("ts").reset_index(drop=True))
    assert len(got) == len(a)
    return got


def _batch_ref(factory, pdf_bars):
    return factory.kernel.fn(
        one_symbol(pdf_bars)[["symbol", "ts", "open", "high", "low",
                              "close", "volume"]]
        .reset_index(drop=True).copy())


def test_streaming_psar_matches_batch(spark, pdf_bars, tmp_path):
    from pandas_ta_spark.operators.trend import psar
    from pandas_ta_spark.streaming import streaming_psar

    a = one_symbol(pdf_bars)
    got = _replay(spark, tmp_path, "psar_stream", a,
                  ["high", "low", "close"], streaming_psar,
                  splits=[1, 90, 200])  # row-0-only first chunk: bootstrap
    ref = _batch_ref(psar(), pdf_bars)
    assert_close(got["psarl"], ref["PSARl_0.02_0.2"], 1e-9, "psarl")
    assert_close(got["psars"], ref["PSARs_0.02_0.2"], 1e-9, "psars")
    assert_close(got["psaraf"], ref["PSARaf_0.02_0.2"], 1e-9, "psaraf")
    assert_close(got["psarr"], ref["PSARr_0.02_0.2"], 1e-9, "psarr")
    # the state machine actually flips on this corpus
    assert (got["psarr"] == 1.0).any()


def test_streaming_qqe_matches_batch(spark, pdf_bars, tmp_path):
    from pandas_ta_spark.operators.momentum import qqe
    from pandas_ta_spark.streaming import streaming_qqe

    a = one_symbol(pdf_bars)
    got = _replay(spark, tmp_path, "qqe_stream", a, ["close"],
                  streaming_qqe, splits=[40, 120, 220])
    ref = _batch_ref(qqe(), pdf_bars)
    assert_close(got["qqe"], ref["QQE_14_5_4.236"], 1e-9, "qqe")
    assert_close(got["rsima"], ref["QQE_14_5_4.236_RSIMA"], 1e-9, "rsima")
    assert_close(got["qqel"], ref["QQEl_14_5_4.236"], 1e-9, "qqel")
    assert_close(got["qqes"], ref["QQEs_14_5_4.236"], 1e-9, "qqes")
    assert got["qqe"].notna().sum() > 100


def test_streaming_stc_matches_batch(spark, pdf_bars, tmp_path):
    from pandas_ta_spark.operators.momentum import stc
    from pandas_ta_spark.streaming import streaming_stc

    a = one_symbol(pdf_bars)
    # split mid-seed (close buffer), mid-ring1 warmup, and post-warmup
    got = _replay(spark, tmp_path, "stc_stream", a, ["close"],
                  streaming_stc, splits=[20, 40, 150])
    ref = _batch_ref(stc(), pdf_bars)
    assert_close(got["stc"], ref["STC_10_12_26_0.5"], 1e-9, "stc")
    assert_close(got["stcmacd"], ref["STCmacd_10_12_26_0.5"], 1e-9, "macd")
    assert_close(got["stcstoch"], ref["STCstoch_10_12_26_0.5"], 1e-9, "pf")
    assert got["stc"].notna().sum() > 100


def test_streaming_hwc_matches_batch(spark, pdf_bars, tmp_path):
    from pandas_ta_spark.operators.volatility import hwc
    from pandas_ta_spark.streaming import streaming_hwc

    a = one_symbol(pdf_bars)
    got = _replay(spark, tmp_path, "hwc_stream", a, ["close"],
                  streaming_hwc, splits=[1, 77])
    ref = _batch_ref(hwc(), pdf_bars)
    assert_close(got["hwm"], ref["HWM"], 1e-9, "hwm")
    assert_close(got["hwu"], ref["HWU"], 1e-9, "hwu")
    assert_close(got["hwl"], ref["HWL"], 1e-9, "hwl")
    assert got["hwm"].notna().all()  # emits from row 0


def test_streaming_ebsw_matches_batch(spark, pdf_bars, tmp_path):
    from pandas_ta_spark.operators.candles import ebsw
    from pandas_ta_spark.streaming import streaming_ebsw

    a = one_symbol(pdf_bars)
    got = _replay(spark, tmp_path, "ebsw_stream", a, ["close"],
                  streaming_ebsw, splits=[1, 130])
    ref = _batch_ref(ebsw(), pdf_bars)
    assert_close(got["ebsw"], ref["EBSW_40_10"], 1e-9, "ebsw")
    assert got["ebsw"].notna().sum() >= len(a) - 2


def test_streaming_state_machines_multi_symbol(spark, pdf_bars, tmp_path):
    """Both symbols in one stream: per-symbol state isolation (a B-row
    between two A-rows must not perturb A's recursion)."""
    from pandas_ta_spark.operators.volatility import hwc
    from pandas_ta_spark.streaming import streaming_hwc

    a = pdf_bars.sort_values(["ts", "symbol"]).reset_index(drop=True)
    got = _replay(spark, tmp_path, "hwc_multi", a, ["close"],
                  streaming_hwc, splits=[100, 333])
    for sym in ("A", "B"):
        ref = hwc().kernel.fn(
            one_symbol(pdf_bars, sym)[["symbol", "ts", "open", "high",
                                       "low", "close", "volume"]]
            .reset_index(drop=True).copy())
        g = (got[got["symbol"] == sym].sort_values("ts")
             .reset_index(drop=True))
        assert_close(g["hwm"], ref["HWM"], 1e-9, f"hwm-{sym}")
        assert_close(g["hwu"], ref["HWU"], 1e-9, f"hwu-{sym}")


def test_streaming_stc_fast_gt_slow_survives(spark, pdf_bars, tmp_path):
    """fast > slow seeds the slow smoother FIRST; the MACD line must stay
    None until BOTH smoothers exist instead of raising (None - float)
    executor-side (r12 ADVICE). Parity vs the batch kernel still holds."""
    from pandas_ta_spark.operators.momentum import stc
    from pandas_ta_spark.streaming import streaming_stc

    a = one_symbol(pdf_bars)
    got = _replay(spark, tmp_path, "stc_swap_stream", a, ["close"],
                  lambda s: streaming_stc(s, fast=26, slow=12),
                  splits=[15, 40, 150])
    ref = _batch_ref(stc(fast=26, slow=12), pdf_bars)
    assert_close(got["stc"], ref["STC_10_26_12_0.5"], 1e-9, "stc")
