"""Streaming variants, custom-op loading, offset/fillna post-processing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import assert_close, one_symbol


def test_streaming_ema_matches_batch(spark, pdf_bars, tmp_path):
    """Stateful streaming EMA (applyInPandasWithState, availableNow file
    stream, two parquet chunks => state carried across micro-batches)
    must equal the batch SMA-seeded kernel."""
    src = tmp_path / "stream_src"
    src.mkdir()
    a = one_symbol(pdf_bars)[["symbol", "ts", "close"]].copy()
    a["ts"] = a["ts"].astype("datetime64[ms]")  # ns parquet needs nanosAsLong
    a.iloc[:120].to_parquet(src / "part1.parquet")
    a.iloc[120:].to_parquet(src / "part2.parquet")

    from pandas_ta_spark.streaming import streaming_ema

    stream = (
        spark.readStream.schema("symbol string, ts timestamp, close double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_ema(stream, length=10)
    q = (
        out.writeStream.format("memory").queryName("ema_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM ema_stream").toPandas()
        .sort_values("ts").reset_index(drop=True)
    )
    assert len(got) == len(a)
    from pandas_ta_spark.functions.pdkernels import ema_pd

    ref = ema_pd(a["close"].reset_index(drop=True), 10)
    assert_close(got["ema"], ref, tol=1e-9, name="streaming-ema")


def test_streaming_rsi_matches_batch(spark, pdf_bars, tmp_path):
    src = tmp_path / "rsi_src"
    src.mkdir()
    a = one_symbol(pdf_bars)[["symbol", "ts", "close"]].copy()
    a["ts"] = a["ts"].astype("datetime64[ms]")
    a.iloc[:100].to_parquet(src / "p1.parquet")
    a.iloc[100:].to_parquet(src / "p2.parquet")
    from pandas_ta_spark.streaming import streaming_rsi

    stream = (
        spark.readStream.schema("symbol string, ts timestamp, close double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_rsi(stream, length=14)
        .writeStream.format("memory").queryName("rsi_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM rsi_stream").toPandas()
        .sort_values("ts").reset_index(drop=True)
    )
    from pandas_ta_spark.functions.pdkernels import rma_pd

    c = a["close"].reset_index(drop=True)
    d = c.diff(1)
    pg = rma_pd(d.clip(lower=0), 14)
    pl = rma_pd((-d).clip(lower=0), 14)
    ref = 100 * pg / (pg + pl)
    assert_close(got["rsi"], ref, tol=1e-9, name="streaming-rsi")


def test_stream_bars_schema(spark, pdf_bars, tmp_path):
    src = tmp_path / "ev_src"
    src.mkdir()
    ev = one_symbol(pdf_bars).rename(columns={"symbol": "event_type", "close": "value"})
    ev = ev[["event_type", "ts", "value"]].copy()
    ev["ts"] = ev["ts"].astype("datetime64[ms]")
    ev.to_parquet(src / "p.parquet")
    from pandas_ta_spark.streaming import stream_bars

    stream = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .parquet(str(src))
    )
    bars = stream_bars(stream)
    q = (
        bars.writeStream.format("memory").queryName("bars_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM bars_stream").toPandas()
    assert set(got.columns) == {"symbol", "ts", "open", "high", "low", "close", "volume"}
    assert len(got) > 0
    assert (got["high"] >= got["low"]).all()


def test_custom_import_dir(spark, bars, tmp_path):
    (tmp_path / "double_sma.py").write_text(
        "from pyspark.sql import functions as F\n"
        "from pandas_ta_spark.functions.windows import roll, sql_roll\n"
        "from pandas_ta_spark.operators.base import Indicator\n"
        "def double_sma(length=10):\n"
        "    out = f'DSMA_{length}'\n"
        "    return Indicator('double_sma', [out], 'custom',\n"
        "                     final={out: 2 * roll(F.avg, 'close', length)},\n"
        "                     sql_final={out: f\"2 * ({sql_roll('avg', 'close', length)})\"})\n"
    )
    import pandas_ta_spark as pts
    from pandas_ta_spark.custom import import_dir

    names = import_dir(str(tmp_path))
    assert names == ["double_sma"]
    assert "double_sma" in pts.indicators()
    out = pts.ta(bars, "double_sma", length=5)
    assert "DSMA_5" in out.columns
    pdf = one_symbol(out.toPandas())
    assert_close(pdf["DSMA_5"],
                 2 * pdf["close"].rolling(5).mean(), name="custom-op")


def test_offset_and_fillna(bars, pdf_bars):
    from pandas_ta_spark.operators.overlap import sma

    ind = sma(5)
    got = one_symbol(ind.apply(bars, offset=2).toPandas())
    ref = one_symbol(pdf_bars)["close"].rolling(5).mean().shift(2)
    assert_close(got["SMA_5"], ref, name="offset")
    got2 = one_symbol(sma(5).apply(bars, fillna=0.0).toPandas())
    assert got2["SMA_5"].isna().sum() == 0
    assert (got2["SMA_5"].iloc[:4] == 0.0).all()
    got3 = one_symbol(sma(5).apply(bars, fill_method="ffill").toPandas())
    assert got3["SMA_5"].isna().sum() == 4  # nothing before first value


def test_streaming_supertrend_matches_batch(spark, pdf_bars, tmp_path):
    """The sequential band/flip state machine carried across micro-batches
    (3 file-chunks => state crosses two batch boundaries) must equal the
    batch Arrow kernel row-for-row."""
    src = tmp_path / "st_src"
    src.mkdir()
    a = one_symbol(pdf_bars)[["symbol", "ts", "high", "low", "close"]].copy()
    a["ts"] = a["ts"].astype("datetime64[ms]")
    a.iloc[:90].to_parquet(src / "p1.parquet")
    a.iloc[90:200].to_parquet(src / "p2.parquet")
    a.iloc[200:].to_parquet(src / "p3.parquet")
    from pandas_ta_spark.streaming import streaming_supertrend

    stream = (
        spark.readStream
        .schema("symbol string, ts timestamp, high double, low double, close double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_supertrend(stream, length=7, multiplier=3.0)
        .writeStream.format("memory").queryName("st_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM st_stream").toPandas()
        .sort_values("ts").reset_index(drop=True)
    )
    assert len(got) == len(a)
    from pandas_ta_spark.operators.overlap import supertrend

    ref = supertrend(7, 3.0).kernel.fn(
        one_symbol(pdf_bars)[["symbol", "ts", "open", "high", "low", "close",
                              "volume"]].reset_index(drop=True).copy())
    assert_close(got["supert"], ref["SUPERT_7_3.0"], tol=1e-9, name="st-trend")
    assert_close(got["supertd"], ref["SUPERTd_7_3.0"], tol=1e-9, name="st-dir")
    assert_close(got["supertl"], ref["SUPERTl_7_3.0"], tol=1e-9, name="st-long")
    assert_close(got["superts"], ref["SUPERTs_7_3.0"], tol=1e-9, name="st-short")


def test_streaming_atr_matches_batch(spark, pdf_bars, tmp_path):
    """Wilder-RMA-of-TR state carried across micro-batches must equal the
    batch volatility.atr kernel row-for-row."""
    src = tmp_path / "atr_src"
    src.mkdir()
    a = one_symbol(pdf_bars)[["symbol", "ts", "high", "low", "close"]].copy()
    a["ts"] = a["ts"].astype("datetime64[ms]")
    a.iloc[:80].to_parquet(src / "p1.parquet")
    a.iloc[80:].to_parquet(src / "p2.parquet")
    from pandas_ta_spark.streaming import streaming_atr

    stream = (
        spark.readStream
        .schema("symbol string, ts timestamp, high double, low double, close double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_atr(stream, length=14)
        .writeStream.format("memory").queryName("atr_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM atr_stream").toPandas()
        .sort_values("ts").reset_index(drop=True)
    )
    assert len(got) == len(a)
    from pandas_ta_spark.operators.volatility import atr

    ref = atr(14).kernel.fn(
        one_symbol(pdf_bars)[["symbol", "ts", "open", "high", "low", "close",
                              "volume"]].reset_index(drop=True).copy())
    assert_close(got["atr"], ref["ATRr_14"], tol=1e-9, name="streaming-atr")


def test_streaming_macd_matches_batch(spark, pdf_bars, tmp_path):
    """Three SMA-seeded EMA recursions (fast/slow/signal) carried across
    micro-batches must equal the batch momentum.macd kernel."""
    src = tmp_path / "macd_src"
    src.mkdir()
    a = one_symbol(pdf_bars)[["symbol", "ts", "close"]].copy()
    a["ts"] = a["ts"].astype("datetime64[ms]")
    a.iloc[:70].to_parquet(src / "p1.parquet")
    a.iloc[70:150].to_parquet(src / "p2.parquet")
    a.iloc[150:].to_parquet(src / "p3.parquet")
    from pandas_ta_spark.streaming import streaming_macd

    stream = (
        spark.readStream.schema("symbol string, ts timestamp, close double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_macd(stream, fast=12, slow=26, signal=9)
        .writeStream.format("memory").queryName("macd_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM macd_stream").toPandas()
        .sort_values("ts").reset_index(drop=True)
    )
    assert len(got) == len(a)
    from pandas_ta_spark.operators.momentum import macd

    ref = macd().kernel.fn(
        one_symbol(pdf_bars)[["symbol", "ts", "open", "high", "low", "close",
                              "volume"]].reset_index(drop=True).copy())
    assert_close(got["macd"], ref["MACD_12_26_9"], tol=1e-9, name="streaming-macd")
    assert_close(got["macdh"], ref["MACDh_12_26_9"], tol=1e-9, name="streaming-macdh")
    assert_close(got["macds"], ref["MACDs_12_26_9"], tol=1e-9, name="streaming-macds")
