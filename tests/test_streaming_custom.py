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


def test_stream_dedup_exact_across_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark state must drop a dup arriving in a
    LATER micro-batch (file) than its first copy."""
    src = tmp_path / "docs_src"
    src.mkdir()
    ts = pd.Timestamp("2026-01-01 00:00:00")
    f1 = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alpha beta", "unique one", "  ALPHA beta "],  # 0==2 normalized
        "ingest_ts": [ts, ts, ts + pd.Timedelta(minutes=1)],
    })
    f2 = pd.DataFrame({
        "doc_id": [3, 4],
        "text": ["alpha beta", "fresh text"],  # 3 dups batch-1's hash
        "ingest_ts": [ts + pd.Timedelta(minutes=2), ts + pd.Timedelta(minutes=3)],
    })
    for df in (f1, f2):
        df["ingest_ts"] = df["ingest_ts"].astype("datetime64[ms]")
    f1.to_parquet(src / "a1.parquet")
    f2.to_parquet(src / "a2.parquet")

    from pandas_ta_spark.streaming import stream_dedup_exact

    stream = (
        spark.readStream.schema("doc_id long, text string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream_dedup_exact(stream, watermark="1 hour")
        .writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_stream").toPandas()
    # 5 docs, 3 distinct normalized hashes -> exactly 3 survivors,
    # one per hash, and the cross-batch dup (doc 3) must be gone
    assert len(got) == 3
    assert got["text_hash"].nunique() == 3
    assert 3 not in set(got["doc_id"])
    assert {1, 4} <= set(got["doc_id"])


def test_stream_quality_matches_batch(spark, tmp_path):
    """The streaming quality filter must emit exactly the batch query's
    keepers with identical scores (same Column exprs by construction)."""
    rng = np.random.default_rng(5)
    words = ["the", "of", "lorem", "ipsum", "data", "spark", "stream",
             "quality", "token", "corpus"]
    texts = [" ".join(rng.choice(words, size=n))
             for n in rng.integers(3, 60, size=40)]
    docs = pd.DataFrame({
        "doc_id": range(40), "text": texts,
        "lang": ["en"] * 40, "source": ["s"] * 40, "n_chars": [1] * 40,
    })
    docs.to_parquet(f"{tmp_path}/documents.parquet")
    src = tmp_path / "q_src"
    src.mkdir()
    d = docs.copy()
    d["ingest_ts"] = pd.Timestamp("2026-01-01").as_unit("ms")
    d[["doc_id", "text", "ingest_ts"]].to_parquet(src / "b1.parquet")

    from pandas_ta_spark.ext.text import SUITE
    from pandas_ta_spark.streaming import stream_quality_keep

    batch = SUITE["text_quality"].query(spark, str(tmp_path)).toPandas()
    batch_keep = batch[batch["keep"] == 1].set_index("doc_id")

    stream = (
        spark.readStream.schema("doc_id long, text string, ingest_ts timestamp")
        .parquet(str(src))
    )
    q = (
        stream_quality_keep(stream)
        .writeStream.format("memory").queryName("quality_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM quality_stream").toPandas().set_index("doc_id")
    assert set(got.index) == set(batch_keep.index)
    assert np.allclose(got["quality_score"].sort_index(),
                       batch_keep["quality_score"].sort_index())


def test_stream_token_rate_windows(spark, tmp_path):
    src = tmp_path / "rate_src"
    src.mkdir()
    ts = pd.Timestamp("2026-01-01 00:30:00")
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["a b c", "d e", "f", "g h i j", "k", "l m"],
        "source": ["s1", "s1", "s2", "s1", "s2", "s2"],
        "ingest_ts": [ts, ts, ts,
                      ts + pd.Timedelta(hours=1),
                      ts + pd.Timedelta(hours=1),
                      ts + pd.Timedelta(hours=3)],  # 3rd window, flushes w1+w2
    })
    docs["ingest_ts"] = docs["ingest_ts"].astype("datetime64[ms]")
    docs.to_parquet(src / "r1.parquet")

    from pandas_ta_spark.streaming import stream_token_rate

    stream = (
        spark.readStream
        .schema("doc_id long, text string, source string, ingest_ts timestamp")
        .parquet(str(src))
    )
    q = (
        stream_token_rate(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("memory").queryName("rate_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM rate_stream").toPandas()
        .set_index(["source", "window_start"]).sort_index()
    )
    w0 = pd.Timestamp("2026-01-01 00:00:00")
    assert got.loc[("s1", w0), "n_tokens"] == 5  # "a b c" + "d e"
    assert got.loc[("s1", w0), "n_docs"] == 2
    assert got.loc[("s2", w0), "n_tokens"] == 1
    assert got.loc[("s1", w0 + pd.Timedelta(hours=1)), "n_tokens"] == 4


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Native session_window streaming sessionization must agree with the
    batch lag->running-sum sessionize (ext/relational.py) row-for-row:
    same session boundaries (only a gap strictly > threshold splits), same
    per-session aggregates. Two parquet chunks force cross-micro-batch
    session-state merging; complete output mode emits every session."""
    src = tmp_path / "sess_src"
    src.mkdir()
    rng = np.random.default_rng(7)
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = []
    t = {u: base for u in range(4)}
    for i in range(300):
        u = int(rng.integers(0, 4))
        # mix of small intra-session gaps and >30min session breaks,
        # including one exact-1800s boundary gap per user
        gap_s = [60.0, 120.5, 1800.0, 2400.0][int(rng.integers(0, 4))]
        t[u] = t[u] + pd.Timedelta(seconds=gap_s)
        rows.append((i, u, t[u], f"et{int(rng.integers(0, 3))}"))
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    pdf["ts"] = pdf["ts"].astype("datetime64[ms]")
    pdf.iloc[:150].to_parquet(src / "p1.parquet")
    pdf.iloc[150:].to_parquet(src / "p2.parquet")

    from pandas_ta_spark.streaming import stream_sessions

    stream = (
        spark.readStream
        .schema("event_id long, user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream_sessions(stream, gap="30 minutes", watermark="10 minutes")
        .writeStream.format("memory").queryName("sess_stream")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM sess_stream").toPandas()
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    )

    # batch twin over the same rows (same >= gap rule)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = spark.read.parquet(str(src))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr("timestampdiff(MICROSECOND, _prev_ts, ts) > 1800000000")
    sess = (
        ev.withColumn("_prev_ts", F.lag("ts").over(w))
        .withColumn("_new_s", F.when(F.col("_prev_ts").isNull() | gap, 1).otherwise(0))
        .withColumn("session_no", F.sum("_new_s").over(w))
    )
    exp = (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.countDistinct("event_type").alias("n_event_types"),
        )
        .toPandas()
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for col in ["user_id", "n_events", "session_start", "session_end",
                "n_event_types"]:
        assert (got[col] == exp[col]).all(), col


def test_materialize_reliable_checkpoint(tmp_path):
    """materialize() upgrades to a RELIABLE checkpoint when the session
    has a checkpoint dir (cluster deployments: survives executor loss);
    without one it localCheckpoints. Runs in a SUBPROCESS with its own
    SparkContext: setCheckpointDir is irreversible, and setting it on the
    shared session fixture would silently flip every test that happens to
    run later onto the reliable-checkpoint path (ordering-dependent)."""
    import subprocess
    import sys
    import textwrap

    ckdir = str(tmp_path / "reliable_ck")
    script = textwrap.dedent(f"""
        import pathlib
        from pyspark.sql import SparkSession
        from pandas_ta_spark.ckpt import materialize

        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.sql.shuffle.partitions", "2")
                 .config("spark.ui.showConsoleProgress", "false")
                 .appName("ckpt-isolated-test").getOrCreate())
        assert materialize(spark.range(5)).count() == 5  # localCheckpoint path
        spark.sparkContext.setCheckpointDir({ckdir!r})
        assert materialize(spark.range(7)).count() == 7
        # reliable checkpoints write RDD files under the configured dir
        files = [p for p in pathlib.Path({ckdir!r}).rglob("*") if p.is_file()]
        assert files, "no reliable checkpoint files written"
        spark.stop()
        print("CKPT_OK")
    """)
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, cwd="/root/repo", timeout=300)
    assert "CKPT_OK" in r.stdout, r.stderr[-2000:]


def test_stream_split_matches_batch(spark, tmp_path):
    """Streaming split assignment equals the batch query row for row
    (same hash Column by construction), across micro-batch boundaries."""
    import pandas as pd

    docs = pd.DataFrame({
        "doc_id": range(60),
        "text": [f"doc number {i}" for i in range(60)],
        "lang": ["en"] * 60, "source": ["s"] * 60, "n_chars": [1] * 60,
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    src = tmp_path / "docs_src"
    src.mkdir()
    docs.iloc[:30][["doc_id", "text"]].to_parquet(src / "b1.parquet")
    docs.iloc[30:][["doc_id", "text"]].to_parquet(src / "b2.parquet")

    from pandas_ta_spark.ext import SUITE
    from pandas_ta_spark.streaming import stream_split_assign

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream_split_assign(stream)
        .writeStream.format("memory").queryName("split_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (spark.sql("SELECT doc_id, split FROM split_stream").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = (SUITE["split_assign"].query(spark, sf).toPandas()
            [["doc_id", "split"]].sort_values("doc_id").reset_index(drop=True))
    assert got.equals(want)


def test_stream_neardup_flags_cross_batch_bucketmate(spark, tmp_path):
    """A near-dup arriving in a LATER micro-batch must be flagged as a
    candidate (shares a band bucket with the first copy); unrelated text
    must not be."""
    src = tmp_path / "nd_src"
    src.mkdir()
    ts = pd.Timestamp("2026-01-01 00:00:00")
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "today while the sun shines bright over the green hills")
    f1 = pd.DataFrame({
        "doc_id": [0, 2],
        "text": [base,
                 "completely different words about spark window functions"],
        "ingest_ts": [ts, ts + pd.Timedelta(minutes=1)],
    })
    f2 = pd.DataFrame({
        "doc_id": [1],
        "text": [base.replace("today", "tomorrow")],
        "ingest_ts": [ts + pd.Timedelta(minutes=2)],
    })
    for df in (f1, f2):
        df["ingest_ts"] = df["ingest_ts"].astype("datetime64[ms]")
    f1.to_parquet(src / "a1.parquet")
    f2.to_parquet(src / "a2.parquet")

    from pandas_ta_spark.streaming import stream_neardup_candidates

    stream = (
        spark.readStream.schema("doc_id long, text string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream_neardup_candidates(stream, watermark="1 hour")
        .writeStream.format("memory").queryName("neardup_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM neardup_stream").toPandas()
    flagged = set(got[got["is_candidate"]]["doc_id"])
    assert 1 in flagged          # later near-dup collides with doc 0's bucket
    assert 0 not in flagged      # first copy is never a candidate
    assert 2 not in flagged      # unrelated doc shares no bucket
    # the collision bucket records doc 0 as first-seen
    hit = got[(got["doc_id"] == 1) & got["is_candidate"]]
    assert (hit["first_doc_id"] == 0).all()
    # every doc emits one row per band
    assert got.groupby("doc_id").size().eq(4).all()


def test_stream_band_keys_match_batch_signature(spark, tmp_path):
    """The stream's stateless per-row band keys must equal the batch
    derivation's explode+groupBy-min signature keys bit-for-bit."""
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["the quick brown fox jumps over the lazy dog today",
                 "completely different words about spark window functions",
                 "a third short document with its own shingles entirely"],
    })
    sdf = spark.createDataFrame(docs)

    # stream-side expressions evaluated in batch mode
    from pyspark.sql import functions as F

    from pandas_ta_spark.streaming.corpus import _band_key_stream_exprs

    hs, bands, _ks = _band_key_stream_exprs()
    stream_keys = (
        sdf.select("doc_id",
                   F.split(F.lower(F.trim(F.col("text"))), " ").alias("toks"))
        .select("doc_id", F.expr(hs).alias("hs"))
        .select("doc_id", *[F.expr(e).alias(f"b{b}") for b, e in bands])
        .toPandas().set_index("doc_id").sort_index()
    )

    # batch-side: the ext/dedup signature pipeline (shingle explode ->
    # groupBy min), reproduced exactly as _dedup_minhash_impl builds it
    from pandas_ta_spark.ext.dedup import (
        N_BANDS,
        N_HASHES,
        _shingles_spark,
    )

    sh = _shingles_spark(sdf)
    hx = F.md5("shingle")
    hashed = sh.select(
        "doc_id",
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("bigint").alias("h1"),
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("bigint").alias("h2"),
    )
    mins = [
        F.min((F.col("h1") + F.lit(j) * F.col("h2")) % F.lit(2**32)).alias(f"mh{j}")
        for j in range(N_HASHES)
    ]
    sig = hashed.groupBy("doc_id").agg(*mins)
    rpb = N_HASHES // N_BANDS
    batch_keys = (
        sig.select(
            "doc_id",
            *[F.concat_ws("_", *[F.col(f"mh{b * rpb + r}") for r in range(rpb)])
              .alias(f"b{b}") for b in range(N_BANDS)],
        )
        .toPandas().set_index("doc_id").sort_index()
    )
    pd.testing.assert_frame_equal(stream_keys, batch_keys)


def test_stream_quality_lr_matches_batch(spark, tmp_path):
    """The streaming LR quality filter must emit exactly the batch
    query's keepers with identical rounded scores (same Column exprs)."""
    rng = np.random.default_rng(11)
    words = ["the", "of", "and", "lorem", "ipsum", "data", "spark",
             "stream", "quality", "token", "corpus", "model"]
    texts = [" ".join(rng.choice(words, size=n))
             for n in rng.integers(3, 80, size=40)]
    docs = pd.DataFrame({
        "doc_id": range(40), "text": texts,
        "lang": ["en"] * 40, "source": ["s"] * 40, "n_chars": [1] * 40,
    })
    docs.to_parquet(f"{tmp_path}/documents.parquet")
    src = tmp_path / "qlr_src"
    src.mkdir()
    d = docs.copy()
    d["ingest_ts"] = pd.Timestamp("2026-01-01").as_unit("ms")
    d[["doc_id", "text", "ingest_ts"]].to_parquet(src / "b1.parquet")

    from pandas_ta_spark.ext.text import SUITE
    from pandas_ta_spark.streaming import stream_quality_lr_keep

    batch = SUITE["quality_lr_score"].query(spark, str(tmp_path)).toPandas()
    batch_keep = batch[batch["keep"] == 1].set_index("doc_id")
    assert len(batch_keep) > 0  # weights must actually keep something

    stream = (
        spark.readStream.schema("doc_id long, text string, ingest_ts timestamp")
        .parquet(str(src))
    )
    q = (
        stream_quality_lr_keep(stream)
        .writeStream.format("memory").queryName("quality_lr_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM quality_lr_stream").toPandas().set_index("doc_id")
    assert set(got.index) == set(batch_keep.index)
    for c in ("z", "p_keep"):
        assert np.allclose(got[c].sort_index(), batch_keep[c].sort_index())


def test_streaming_topk_ivf_matches_batch(spark, tmp_path):
    """The streaming ANN probe must emit BIT-IDENTICAL top-k rows to the
    batch _topk_ivf for the same query vectors against the same session
    index (same centroids, lists, left-associated dots, tie-breaks)."""
    import pandas as pd

    from pandas_ta_spark.ext.similarity import N_QUERIES, SUITE
    from pandas_ta_spark.streaming import stream_topk_ivf

    sf_dir = "/root/testdata/sf0.01"
    batch = (SUITE["topk_cosine_ivf"].query(spark, sf_dir).toPandas()
             .sort_values(["query_id", "rank"]).reset_index(drop=True))

    # stream the gate's 10 query vectors; a late flusher row (its window
    # never closes, so it is absent from append-mode output) advances the
    # watermark past the real queries' window
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .filter(f"vec_id < {N_QUERIES}")
           .select("vec_id", "embedding").toPandas())
    ts = pd.Timestamp("2026-01-01 00:10:00")
    q = pd.DataFrame({
        "query_id": emb["vec_id"],
        "embedding": emb["embedding"],
        "ingest_ts": ts,
    })
    flusher = pd.DataFrame({
        "query_id": [9999],
        "embedding": [emb["embedding"].iloc[0]],
        "ingest_ts": [ts + pd.Timedelta(hours=4)],
    })
    src = tmp_path / "q_src"
    src.mkdir()
    for df, name in ((q, "a1"), (flusher, "a2")):
        d = df.copy()
        d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
        d.to_parquet(src / f"{name}.parquet")

    stream = (
        spark.readStream
        .schema("query_id long, embedding array<double>, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qh = (
        stream_topk_ivf(stream, spark, sf_dir)
        .writeStream.format("memory").queryName("ann_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = (spark.sql("SELECT query_id, match_id, rank, score FROM ann_stream")
           .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True))

    assert len(got) == len(batch) > 0
    for c in ("query_id", "match_id", "rank"):
        assert got[c].tolist() == batch[c].tolist(), c
    assert got["score"].tolist() == batch["score"].tolist()  # bit-identical


def test_streaming_topk_ivfpq_matches_batch(spark, tmp_path):
    """The streaming IVF-PQ server (expression LUT over codebook
    literals + code-wide candidates) must emit BIT-IDENTICAL top-k rows
    to the batch _topk_ivfpq — exact-integer ADC scores included."""
    import pandas as pd

    from pandas_ta_spark.ext.similarity import N_QUERIES, SUITE
    from pandas_ta_spark.streaming import stream_topk_ivfpq

    sf_dir = "/root/testdata/sf0.01"
    batch = (SUITE["topk_cosine_ivfpq"].query(spark, sf_dir).toPandas()
             .sort_values(["query_id", "rank"]).reset_index(drop=True))

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .filter(f"vec_id < {N_QUERIES}")
           .select("vec_id", "embedding").toPandas())
    ts = pd.Timestamp("2026-01-01 00:10:00")
    q = pd.DataFrame({
        "query_id": emb["vec_id"],
        "embedding": emb["embedding"],
        "ingest_ts": ts,
    })
    flusher = pd.DataFrame({
        "query_id": [9999],
        "embedding": [emb["embedding"].iloc[0]],
        "ingest_ts": [ts + pd.Timedelta(hours=4)],
    })
    src = tmp_path / "qpq_src"
    src.mkdir()
    for df, name in ((q, "a1"), (flusher, "a2")):
        d = df.copy()
        d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
        d.to_parquet(src / f"{name}.parquet")

    stream = (
        spark.readStream
        .schema("query_id long, embedding array<double>, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qh = (
        stream_topk_ivfpq(stream, spark, sf_dir)
        .writeStream.format("memory").queryName("annpq_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = (spark.sql("SELECT query_id, match_id, rank, score FROM annpq_stream")
           .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True))

    assert len(got) == len(batch) > 0
    for c in ("query_id", "match_id", "rank"):
        assert got[c].tolist() == batch[c].tolist(), c
    assert got["score"].tolist() == batch["score"].tolist()  # exact ints / 1e6


def test_streaming_topk_ivf_resubmission_idempotent(spark, tmp_path):
    """ADVICE r7: resubmitting the SAME query vector twice inside one
    event-time window must not duplicate match_id/rank rows — the
    (window, query_id) fold drops duplicate candidates (array_distinct)
    before the slice, so the output equals the single-submission batch
    shape exactly."""
    import pandas as pd

    from pandas_ta_spark.ext.similarity import N_QUERIES, SUITE
    from pandas_ta_spark.streaming import stream_topk_ivf

    sf_dir = "/root/testdata/sf0.01"
    batch = (SUITE["topk_cosine_ivf"].query(spark, sf_dir).toPandas()
             .sort_values(["query_id", "rank"]).reset_index(drop=True))

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .filter(f"vec_id < {N_QUERIES}")
           .select("vec_id", "embedding").toPandas())
    ts = pd.Timestamp("2026-01-01 00:10:00")
    q = pd.DataFrame({
        "query_id": emb["vec_id"],
        "embedding": emb["embedding"],
        "ingest_ts": ts,
    })
    q2 = q.copy()
    q2["ingest_ts"] = ts + pd.Timedelta(minutes=5)  # same 1h window
    flusher = pd.DataFrame({
        "query_id": [9999],
        "embedding": [emb["embedding"].iloc[0]],
        "ingest_ts": [ts + pd.Timedelta(hours=4)],
    })
    src = tmp_path / "q_src_dup"
    src.mkdir()
    for df, name in ((q, "a1"), (q2, "a2"), (flusher, "a3")):
        d = df.copy()
        d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
        d.to_parquet(src / f"{name}.parquet")

    stream = (
        spark.readStream
        .schema("query_id long, embedding array<double>, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qh = (
        stream_topk_ivf(stream, spark, sf_dir)
        .writeStream.format("memory").queryName("ann_stream_dup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = (spark.sql(
        "SELECT query_id, match_id, rank, score FROM ann_stream_dup")
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True))

    # one row per (query, rank) — NOT doubled — and identical to batch
    assert len(got) == len(batch) > 0
    for c in ("query_id", "match_id", "rank"):
        assert got[c].tolist() == batch[c].tolist(), c
    assert got["score"].tolist() == batch["score"].tolist()


def test_streaming_xsec_zscore_matches_batch(spark, tmp_path):
    """The streaming panel standardization must emit BIT-IDENTICAL rows
    to the batch xsec_zscore_ret1 when fed the same (symbol, ts, ret_1)
    stream — even with the panel split ACROSS micro-batches (integer
    moments are arrival-order-independent)."""
    import numpy as np
    import pandas as pd

    from pandas_ta_spark.ext.relational import SUITE
    from pandas_ta_spark.streaming import stream_xsec_zscore

    sf_dir = "/root/testdata/sf0.01"
    batch = (SUITE["xsec_zscore_ret1"].query(spark, sf_dir).toPandas()
             .sort_values(["ts", "symbol"]).reset_index(drop=True))

    # reconstruct the same per-symbol returns the batch op consumed
    from pandas_ta_spark.sources.bars import bars_from_events_cached
    from pyspark.sql import Window, functions as F

    bars = bars_from_events_cached(spark, sf_dir)
    ws = Window.partitionBy("symbol").orderBy("ts")
    rets = (bars.select(
        "symbol", "ts",
        (F.col("close") / F.lag("close").over(ws) - 1).alias("ret_1"))
        .filter(F.col("ret_1").isNotNull()).toPandas())

    # split each timestamp's panel across TWO files (micro-batches) and
    # append a late flusher to advance the watermark past every window
    rets = rets.sort_values(["ts", "symbol"]).reset_index(drop=True)
    half_a = rets.iloc[::2]
    half_b = rets.iloc[1::2]
    # two flusher files: the watermark computed for a batch uses the
    # PREVIOUS batches' max event time, so emitting the final panel
    # needs one more batch after the clock-advancing row
    # the flusher carries a REAL return: parquet NaN is NOT null in
    # Spark, so a NaN row would slip past isNotNull() with a NULL
    # quantization — give it a value and drop its symbol from the
    # comparison instead
    flusher = pd.DataFrame({
        "symbol": ["zz"],
        "ts": [rets["ts"].max() + pd.Timedelta(hours=5)],
        "ret_1": [0.5],
    })
    flusher2 = flusher.assign(ts=flusher["ts"] + pd.Timedelta(hours=1))
    src = tmp_path / "xsec_src"
    src.mkdir()
    for df, name in ((half_a, "a1"), (half_b, "a2"), (flusher, "a3"),
                     (flusher2, "a4")):
        d = df.copy()
        d["ts"] = d["ts"].astype("datetime64[us]")
        d.to_parquet(src / f"{name}.parquet")

    stream = (
        spark.readStream
        .schema("symbol string, ts timestamp, ret_1 double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qh = (
        stream_xsec_zscore(stream)
        .writeStream.format("memory").queryName("xsec_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = (spark.sql("SELECT symbol, ts, ret_1, n_xsec, xsec_z FROM xsec_stream")
           .toPandas())
    got = (got[got["symbol"] != "zz"]
           .sort_values(["ts", "symbol"]).reset_index(drop=True))

    assert len(got) == len(batch) > 0
    assert got["symbol"].tolist() == batch["symbol"].tolist()
    assert (got["ts"] == batch["ts"]).all()
    assert got["n_xsec"].tolist() == batch["n_xsec"].tolist()
    for c in ("ret_1", "xsec_z"):
        a, b = got[c], batch[c]
        assert ((a == b) | (a.isna() & b.isna())).all(), c  # bit-identical


def test_stream_dedup_vs_corpus_matches_batch_pairs(spark, tmp_path):
    """The online ingestion gate must reproduce the batch near-dup
    semantics exactly: streaming the corpus's OWN documents against the
    static index yields (a) every doc matching itself at jaccard 1.0 and
    (b) exactly the batch dedup_minhash_lsh pair set (both orientations)
    with bit-identical jaccard values."""
    import pandas as pd

    from pandas_ta_spark.ext.dedup import SUITE
    from pandas_ta_spark.streaming import stream_dedup_vs_corpus

    sf_dir = "/root/testdata/sf0.01"
    batch = SUITE["dedup_minhash_lsh"].query(spark, sf_dir).toPandas()
    batch_pairs = {
        (int(r.doc_a), int(r.doc_b)): float(r.jaccard)
        for r in batch.itertuples()
    }

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").toPandas())
    ts = pd.Timestamp("2026-01-01 00:10:00")
    docs["ingest_ts"] = ts
    src = tmp_path / "gate_src"
    src.mkdir()
    d = docs.copy()
    d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
    d.to_parquet(src / "a1.parquet")

    stream = (
        spark.readStream
        .schema("doc_id long, text string, ingest_ts timestamp")
        .parquet(str(src))
    )
    qh = (
        stream_dedup_vs_corpus(stream, spark, sf_dir)
        .writeStream.format("memory").queryName("gate_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = spark.sql(
        "SELECT doc_id, corpus_doc_id, jaccard FROM gate_stream").toPandas()

    self_hits = got[got["doc_id"] == got["corpus_doc_id"]]
    n_docs_shingleable = len(docs[docs["text"].str.split().str.len() >= 3])
    assert len(self_hits) == n_docs_shingleable
    assert (self_hits["jaccard"] == 1.0).all()

    cross = got[got["doc_id"] != got["corpus_doc_id"]]
    got_pairs = {}
    for r in cross.itertuples():
        a, b = sorted((int(r.doc_id), int(r.corpus_doc_id)))
        got_pairs[(a, b)] = float(r.jaccard)
    assert set(got_pairs) == set(batch_pairs)
    for k in batch_pairs:
        assert got_pairs[k] == batch_pairs[k], k  # bit-identical
    # both orientations emitted (every streamed doc sees its dup)
    assert len(cross) == 2 * len(batch_pairs)


def test_stream_decontamination_gate_matches_batch(spark, tmp_path):
    """The ingestion-time decontamination gate must reproduce the batch
    contamination_minhash results exactly: aggregating the streamed
    (train doc, eval doc) collisions per train doc gives the same
    flagged set, hit counts and max jaccard."""
    import pandas as pd

    from pandas_ta_spark.ext.dedup import (
        FUZZY_EVAL_MOD, FUZZY_EVAL_REM, SUITE,
    )
    from pandas_ta_spark.streaming import stream_decontamination_gate

    sf_dir = "/root/testdata/sf0.01"
    batch = (SUITE["contamination_minhash"].query(spark, sf_dir).toPandas()
             .sort_values("train_id").reset_index(drop=True))

    # Stream the WHOLE corpus, eval slice included (ADVICE r7: the gate
    # must drop eval-slice doc_ids itself — a full replay used to emit
    # eval-vs-eval self-collisions the batch op's ~is_eval filter never
    # reports, and only pre-split streams were tested).
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").toPandas())
    assert (docs["doc_id"] % FUZZY_EVAL_MOD == FUZZY_EVAL_REM).any()
    replay = docs.copy()
    replay["ingest_ts"] = pd.Timestamp("2026-01-01 00:10:00")
    replay["ingest_ts"] = replay["ingest_ts"].astype("datetime64[ms]")
    src = tmp_path / "decon_src"
    src.mkdir()
    replay.to_parquet(src / "a1.parquet")

    stream = (
        spark.readStream
        .schema("doc_id long, text string, ingest_ts timestamp")
        .parquet(str(src))
    )
    qh = (
        stream_decontamination_gate(stream, spark, sf_dir)
        .writeStream.format("memory").queryName("decon_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = spark.sql(
        "SELECT doc_id, corpus_doc_id, jaccard FROM decon_stream").toPandas()

    # no eval-slice doc passed the gate's own train filter
    assert (got["doc_id"] % FUZZY_EVAL_MOD != FUZZY_EVAL_REM).all()

    agg = (got.groupby("doc_id")
           .agg(n_eval_matches=("corpus_doc_id", "size"),
                max_jaccard=("jaccard", "max"))
           .reset_index().rename(columns={"doc_id": "train_id"})
           .sort_values("train_id").reset_index(drop=True))
    assert len(agg) == len(batch) > 0
    assert agg["train_id"].tolist() == batch["train_id"].tolist()
    assert agg["n_eval_matches"].tolist() == batch["n_eval_matches"].tolist()
    assert agg["max_jaccard"].tolist() == batch["max_jaccard"].tolist()


def test_streaming_xsec_rank_matches_batch(spark, tmp_path):
    """Streaming cross-sectional rank must emit BIT-IDENTICAL rows to
    the batch xsec_rank_ret1, panels split across micro-batches."""
    import pandas as pd

    from pandas_ta_spark.ext.relational import SUITE
    from pandas_ta_spark.streaming import stream_xsec_rank

    sf_dir = "/root/testdata/sf0.01"
    batch = (SUITE["xsec_rank_ret1"].query(spark, sf_dir).toPandas()
             .sort_values(["ts", "symbol"]).reset_index(drop=True))

    from pandas_ta_spark.sources.bars import bars_from_events_cached
    from pyspark.sql import Window, functions as F

    bars = bars_from_events_cached(spark, sf_dir)
    ws = Window.partitionBy("symbol").orderBy("ts")
    rets = (bars.select(
        "symbol", "ts",
        (F.col("close") / F.lag("close").over(ws) - 1).alias("ret_1"))
        .filter(F.col("ret_1").isNotNull()).toPandas()
        .sort_values(["ts", "symbol"]).reset_index(drop=True))
    flusher = pd.DataFrame({
        "symbol": ["zz"],
        "ts": [rets["ts"].max() + pd.Timedelta(hours=5)],
        "ret_1": [0.5],
    })
    flusher2 = flusher.assign(ts=flusher["ts"] + pd.Timedelta(hours=1))
    src = tmp_path / "xrank_src"
    src.mkdir()
    for df, name in ((rets.iloc[::2], "a1"), (rets.iloc[1::2], "a2"),
                     (flusher, "a3"), (flusher2, "a4")):
        d = df.copy()
        d["ts"] = d["ts"].astype("datetime64[us]")
        d.to_parquet(src / f"{name}.parquet")

    stream = (
        spark.readStream
        .schema("symbol string, ts timestamp, ret_1 double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qh = (
        stream_xsec_rank(stream)
        .writeStream.format("memory").queryName("xrank_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = (spark.sql("SELECT * FROM xrank_stream").toPandas())
    got = (got[got["symbol"] != "zz"]
           .sort_values(["ts", "symbol"]).reset_index(drop=True))

    assert len(got) == len(batch) > 0
    assert got["symbol"].tolist() == batch["symbol"].tolist()
    assert got["xsec_rank"].tolist() == batch["xsec_rank"].tolist()
    assert got["n_xsec"].tolist() == batch["n_xsec"].tolist()
    for c in ("ret_1", "xsec_pct"):
        a, b = got[c], batch[c]
        assert ((a == b) | (a.isna() & b.isna())).all(), c


def test_stream_asof_attach_matches_batch(spark, tmp_path):
    """The stateless point-in-time attach (validity-interval lookup +
    stream-static equi-join) must reproduce the batch union-and-carry
    asof_join bit-for-bit: same matched bar per event — including events
    before the first bar (NULL bar) and events past the last bar (clamp
    to the final bar) — with events split across micro-batches."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pandas_ta_spark.ext.relational import asof_join
    from pandas_ta_spark.sources.bars import bars_from_events_cached, load_table
    from pandas_ta_spark.streaming import stream_asof_attach

    sf_dir = "/root/testdata/sf0.01"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("event_type").alias("symbol"), "ts", "value")
    bars = bars_from_events_cached(spark, sf_dir)
    batch = (asof_join(ev, bars).toPandas()
             .sort_values("event_id").reset_index(drop=True))

    epd = ev.toPandas()
    # exercise the clamp path: an event one day past the last bar
    late = pd.DataFrame({
        "event_id": [10_000_001],
        "symbol": [epd["symbol"].iloc[0]],
        "ts": [epd["ts"].max() + pd.Timedelta(days=1)],
        "value": [1.0],
    })
    src = tmp_path / "asof_src"
    src.mkdir()
    for df, name in ((epd.iloc[::2], "a1"), (epd.iloc[1::2], "a2"),
                     (late, "a3")):
        d = df.copy()
        d["ts"] = d["ts"].astype("datetime64[us]")
        d.to_parquet(src / f"{name}.parquet")

    stream = (
        spark.readStream
        .schema("event_id long, symbol string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qh = (
        stream_asof_attach(stream, bars)
        .writeStream.format("memory").queryName("asof_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = (spark.sql("SELECT * FROM asof_stream").toPandas()
           .sort_values("event_id").reset_index(drop=True))

    late_row = got[got["event_id"] == 10_000_001]
    got = got[got["event_id"] != 10_000_001].reset_index(drop=True)

    assert len(got) == len(batch) > 0
    assert got["event_id"].tolist() == batch["event_id"].tolist()
    assert got["symbol"].tolist() == batch["symbol"].tolist()
    for c in ("bar_ts", "bar_close"):
        a, b = got[c], batch[c]
        assert ((a == b) | (a.isna() & b.isna())).all(), c
    # batch has NULL-bar rows (events in the first hour) — the stream
    # must reproduce them as NULLs, not drop them
    assert batch["bar_ts"].isna().any()
    # the past-the-end event clamps to the symbol's final bar
    sym = late["symbol"].iloc[0]
    final_bar = bars.filter(F.col("symbol") == sym).agg(
        F.max("ts")).collect()[0][0]
    assert late_row["bar_ts"].iloc[0] == final_bar


def test_stream_span_dup_gate_matches_batch(spark, tmp_path):
    """Replaying the corpus through the span gate must reproduce the
    batch dedup_spans rows exactly: same per-doc n_spans, n_dup_spans
    and dup_span_frac (the only_doc self-exclusion makes a doc's
    corpus-resident own spans not count as dups), docs split across
    micro-batches."""
    import pandas as pd

    from pandas_ta_spark.ext.dedup import SUITE
    from pandas_ta_spark.streaming import stream_span_dup_gate

    sf_dir = "/root/testdata/sf0.01"
    batch = (SUITE["dedup_spans"].query(spark, sf_dir).toPandas()
             .sort_values("doc_id").reset_index(drop=True))

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").toPandas())
    ts = pd.Timestamp("2026-01-01 00:10:00")
    docs["ingest_ts"] = ts
    flusher = pd.DataFrame({
        "doc_id": [99_999_999],
        "text": ["word " * 30],
        "ingest_ts": [ts + pd.Timedelta(hours=5)],
    })
    src = tmp_path / "span_gate_src"
    src.mkdir()
    for df, name in ((docs.iloc[::2], "a1"), (docs.iloc[1::2], "a2"),
                     (flusher, "a3")):
        d = df.copy()
        d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
        d.to_parquet(src / f"{name}.parquet")

    stream = (
        spark.readStream
        .schema("doc_id long, text string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qh = (
        stream_span_dup_gate(stream, spark, sf_dir)
        .writeStream.format("memory").queryName("span_gate_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = (spark.sql("SELECT doc_id, n_spans, n_dup_spans, dup_span_frac "
                     "FROM span_gate_stream").toPandas())
    got = (got[got["doc_id"] != 99_999_999]
           .sort_values("doc_id").reset_index(drop=True))

    assert len(got) == len(batch) > 0
    assert got["doc_id"].tolist() == batch["doc_id"].tolist()
    assert got["n_spans"].tolist() == batch["n_spans"].tolist()
    assert got["n_dup_spans"].tolist() == batch["n_dup_spans"].tolist()
    assert got["dup_span_frac"].tolist() == batch["dup_span_frac"].tolist()
    # sanity: the corpus actually contains span-level dups
    assert (batch["n_dup_spans"] > 0).any()


def test_stream_semdedup_gate_matches_batch(spark, tmp_path):
    """Replaying the corpus embeddings through the semantic gate must
    reproduce the batch neardup_cosine_lsh pair set (both orientations,
    self-matches excluded) with bit-identical fixed-point scores —
    stateless plan, vectors split across micro-batches."""
    import pandas as pd

    from pandas_ta_spark.ext.similarity import SUITE
    from pandas_ta_spark.streaming import stream_semdedup_gate

    sf_dir = "/root/testdata/sf0.01"
    batch = SUITE["neardup_cosine_lsh"].query(spark, sf_dir).toPandas()
    batch_pairs = {
        (int(r.vec_a), int(r.vec_b)): float(r.score)
        for r in batch.itertuples()
    }

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding").toPandas())
    ts = pd.Timestamp("2026-01-01 00:10:00")
    emb["ingest_ts"] = ts
    # planted dups: exact copies of three corpus vectors under fresh ids
    # — same bucket by construction, cosine exactly 1.0. Keeps the test
    # non-vacuous even when the organic corpus has no >=0.99 pairs.
    planted = emb.iloc[[3, 47, 200]].copy()
    planted_src = planted["vec_id"].tolist()
    planted["vec_id"] = [1_000_001, 1_000_002, 1_000_003]
    planted["ingest_ts"] = ts
    src = tmp_path / "sem_gate_src"
    src.mkdir()
    for df, name in ((emb.iloc[::2], "a1"), (emb.iloc[1::2], "a2"),
                     (planted, "a3")):
        d = df.copy()
        d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
        d.to_parquet(src / f"{name}.parquet")

    stream = (
        spark.readStream
        .schema("vec_id long, embedding array<double>, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qh = (
        stream_semdedup_gate(stream, spark, sf_dir)
        .writeStream.format("memory").queryName("sem_gate_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = spark.sql(
        "SELECT vec_id, corpus_vec_id, score FROM sem_gate_stream").toPandas()

    assert (got["vec_id"] != got["corpus_vec_id"]).all()
    # planted exact copies MUST be flagged against their source vectors
    # at score exactly 1.0 (dot(e,e)/(n*n) is exactly 1 for a bit-equal
    # copy) — the non-vacuous half of the test
    pl = got[got["vec_id"] >= 1_000_000]
    hits = {(int(r.vec_id), int(r.corpus_vec_id), float(r.score))
            for r in pl.itertuples()}
    for pid, src_id in zip((1_000_001, 1_000_002, 1_000_003), planted_src):
        assert (pid, int(src_id), 1.0) in hits, (pid, src_id, hits)
    # corpus replay reproduces the batch pair set with identical scores
    replay = got[got["vec_id"] < 1_000_000]
    got_pairs = {}
    for r in replay.itertuples():
        a, b = sorted((int(r.vec_id), int(r.corpus_vec_id)))
        got_pairs[(a, b)] = float(r.score)
    assert set(got_pairs) == set(batch_pairs)
    for k in batch_pairs:
        assert got_pairs[k] == batch_pairs[k], k  # bit-identical
    # both orientations emitted (every streamed vector sees its dup)
    assert len(replay) == 2 * len(batch_pairs)


def test_streaming_topk_two_stage_matches_batch(spark, tmp_path):
    """two_stage=True (per-inverted-list partial top-k, chained windowed
    aggregations) must emit BIT-IDENTICAL rows to batch for both the
    flat-IVF and IVF-PQ servers — the exactness claim of the
    distributed two-stage top-k."""
    import pandas as pd

    from pandas_ta_spark.ext.similarity import N_QUERIES, SUITE
    from pandas_ta_spark.streaming import stream_topk_ivf, stream_topk_ivfpq

    sf_dir = "/root/testdata/sf0.01"
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .filter(f"vec_id < {N_QUERIES}")
           .select("vec_id", "embedding").toPandas())
    ts = pd.Timestamp("2026-01-01 00:10:00")
    q = pd.DataFrame({
        "query_id": emb["vec_id"],
        "embedding": emb["embedding"],
        "ingest_ts": ts,
    })
    flusher = pd.DataFrame({
        "query_id": [9999],
        "embedding": [emb["embedding"].iloc[0]],
        "ingest_ts": [ts + pd.Timedelta(hours=4)],
    })

    for tag, server, batch_key in (
        ("ivf2", stream_topk_ivf, "topk_cosine_ivf"),
        ("ivfpq2", stream_topk_ivfpq, "topk_cosine_ivfpq"),
    ):
        batch = (SUITE[batch_key].query(spark, sf_dir).toPandas()
                 .sort_values(["query_id", "rank"]).reset_index(drop=True))
        src = tmp_path / f"q_src_{tag}"
        src.mkdir()
        for df, name in ((q, "a1"), (flusher, "a2")):
            d = df.copy()
            d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
            d.to_parquet(src / f"{name}.parquet")
        stream = (
            spark.readStream
            .schema("query_id long, embedding array<double>, "
                    "ingest_ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        qh = (
            server(stream, spark, sf_dir, two_stage=True)
            .writeStream.format("memory").queryName(f"ann_{tag}")
            .outputMode("append").trigger(availableNow=True).start()
        )
        qh.awaitTermination(180)
        got = (spark.sql(f"SELECT query_id, match_id, rank, score "
                         f"FROM ann_{tag}")
               .toPandas().sort_values(["query_id", "rank"])
               .reset_index(drop=True))
        assert len(got) == len(batch) > 0, tag
        for c in ("query_id", "match_id", "rank"):
            assert got[c].tolist() == batch[c].tolist(), (tag, c)
        assert got["score"].tolist() == batch["score"].tolist(), tag


def test_stream_curation_gate_matches_batch(spark, tmp_path):
    """Replaying the corpus through the composed curation gate must
    reproduce the batch survivor decision per document: keep ==
    (keep-list kept) AND (quality keep) AND (hash sample) — with the
    near-dup/exact clauses resolved against the corpus indexes, so the
    result is arrival-order independent (docs split across
    micro-batches prove it)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pandas_ta_spark.ext.dedup import SUITE as DSUITE
    from pandas_ta_spark.ext.sampling import (
        SAMPLE_DEFAULT, SAMPLE_THRESHOLDS, _doc_hash,
    )
    from pandas_ta_spark.ext.text import quality_exprs
    from pandas_ta_spark.streaming import stream_curation_gate

    sf_dir = "/root/testdata/sf0.01"
    kl = DSUITE["dedup_keep_list"].query(spark, sf_dir)
    q = quality_exprs()
    thr = F.lit(SAMPLE_DEFAULT)
    for src, t in SAMPLE_THRESHOLDS.items():
        thr = F.when(F.col("source") == src, F.lit(t)).otherwise(thr)
    docs_sdf = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = (
        docs_sdf.select(
            "doc_id",
            ((q["keep"] == 1)
             & (F.substring(_doc_hash(), 1, 2) < thr)).alias("qs"))
        .join(kl, "doc_id")
        .select("doc_id",
                (F.col("qs") & (F.col("kept") == 1)).cast("int")
                .alias("keep"))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )

    docs = docs_sdf.select("doc_id", "source", "text").toPandas()
    ts = pd.Timestamp("2026-01-01 00:10:00")
    docs["ingest_ts"] = ts
    # planted junk doc: one token repeated — fails the quality rules
    # (TTR), exercising the q_keep clause the organic corpus never
    # trips (all 500 sf0.01 docs pass quality)
    junk = pd.DataFrame({
        "doc_id": [90_000_001], "source": ["src0"],
        "text": [("spam " * 50).strip()],
        "ingest_ts": [ts],
    })
    # planted exact copy of a corpus doc under a fresh id — the corpus
    # has no organic exact-text dups, so this exercises exact_keep
    copy = pd.DataFrame({
        "doc_id": [90_000_002], "source": ["src0"],
        "text": [docs["text"].iloc[7]],
        "ingest_ts": [ts],
    })
    flusher = pd.DataFrame({
        "doc_id": [99_999_999], "source": ["s"],
        "text": ["flush " * 10],
        "ingest_ts": [ts + pd.Timedelta(hours=5)],
    })
    src = tmp_path / "cur_gate_src"
    src.mkdir()
    for df, name in ((docs.iloc[::2], "a1"), (docs.iloc[1::2], "a2"),
                     (junk, "a3"), (copy, "a4"), (flusher, "a5")):
        d = df.copy()
        d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
        d.to_parquet(src / f"{name}.parquet")

    stream = (
        spark.readStream
        .schema("doc_id long, source string, text string, "
                "ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qh = (
        stream_curation_gate(stream, spark, sf_dir)
        .writeStream.format("memory").queryName("cur_gate_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = (spark.sql("SELECT doc_id, keep, q_keep, s_keep, exact_keep, "
                     "near_dup FROM cur_gate_stream").toPandas())
    junk_row = got[got["doc_id"] == 90_000_001]
    copy_row = got[got["doc_id"] == 90_000_002]
    got = (got[got["doc_id"] < 90_000_000]
           .sort_values("doc_id").reset_index(drop=True))

    assert len(got) == len(expected) > 0  # ONE decision row per doc
    assert got["doc_id"].tolist() == expected["doc_id"].tolist()
    assert got["keep"].tolist() == expected["keep"].tolist()
    # the planted junk doc fails quality and is dropped
    assert len(junk_row) == 1
    assert not junk_row["q_keep"].iloc[0]
    assert junk_row["keep"].iloc[0] == 0
    # the planted exact copy fails exact_keep (corpus already owns the
    # text under a lower id) and is dropped
    assert len(copy_row) == 1
    assert not copy_row["exact_keep"].iloc[0]
    assert copy_row["keep"].iloc[0] == 0
    # the remaining clauses discriminate on the organic corpus (which
    # has near-dups and sample splits, but no organic exact dups)
    assert (~got["s_keep"]).any() and got["s_keep"].any()
    assert got["exact_keep"].all()
    assert got["near_dup"].any() and (~got["near_dup"]).any()


def test_stream_media_features_matches_batch(spark, tmp_path):
    """Streaming multimodal ingestion (binary payload + Arrow mapInPandas
    feature extraction) must emit exactly the batch media_features rows,
    docs split across micro-batches."""
    import pandas as pd

    from pandas_ta_spark.ext.media import SUITE
    from pandas_ta_spark.streaming import stream_media_features

    sf_dir = "/root/testdata/sf0.01"
    batch = (SUITE["media_features"].query(spark, sf_dir).toPandas()
             .sort_values("doc_id").reset_index(drop=True))

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").toPandas())
    docs["ingest_ts"] = pd.Timestamp("2026-01-01 00:10:00")
    docs["ingest_ts"] = docs["ingest_ts"].astype("datetime64[ms]")
    src = tmp_path / "media_src"
    src.mkdir()
    docs.iloc[::2].to_parquet(src / "a1.parquet")
    docs.iloc[1::2].to_parquet(src / "a2.parquet")

    stream = (
        spark.readStream
        .schema("doc_id long, text string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qh = (
        stream_media_features(stream)
        .writeStream.format("memory").queryName("media_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(120)
    got = (spark.sql("SELECT * FROM media_stream").toPandas()
           .sort_values("doc_id").reset_index(drop=True))

    assert len(got) == len(batch) > 0
    for c in ("doc_id", "n_bytes", "frame_count", "first_frame_hash"):
        assert got[c].tolist() == batch[c].tolist(), c
    assert got["mean_byte"].tolist() == batch["mean_byte"].tolist()


def test_stream_curation_sink_writes_survivors(spark, tmp_path):
    """The end-to-end loop: streaming the corpus through the curation
    sink must land EXACTLY the batch survivor set in the
    source-partitioned lake, with text intact and partition pruning
    available on source."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pandas_ta_spark.ext.dedup import SUITE as DSUITE
    from pandas_ta_spark.ext.sampling import (
        SAMPLE_DEFAULT, SAMPLE_THRESHOLDS, _doc_hash,
    )
    from pandas_ta_spark.ext.text import quality_exprs
    from pandas_ta_spark.streaming import stream_curation_sink

    sf_dir = "/root/testdata/sf0.01"
    kl = DSUITE["dedup_keep_list"].query(spark, sf_dir)
    q = quality_exprs()
    thr = F.lit(SAMPLE_DEFAULT)
    for src_name, t in SAMPLE_THRESHOLDS.items():
        thr = F.when(F.col("source") == src_name, F.lit(t)).otherwise(thr)
    docs_sdf = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = (
        docs_sdf.select(
            "doc_id", "source", "text",
            ((q["keep"] == 1)
             & (F.substring(_doc_hash(), 1, 2) < thr)).alias("qs"))
        .join(kl, "doc_id")
        .filter(F.col("qs") & (F.col("kept") == 1))
        .select("doc_id", "source", "text")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )

    docs = docs_sdf.select("doc_id", "source", "text").toPandas()
    docs["ingest_ts"] = pd.Timestamp("2026-01-01 00:10:00")
    docs["ingest_ts"] = docs["ingest_ts"].astype("datetime64[ms]")
    src = tmp_path / "sink_src"
    src.mkdir()
    docs.iloc[::2].to_parquet(src / "a1.parquet")
    docs.iloc[1::2].to_parquet(src / "a2.parquet")

    stream = (
        spark.readStream
        .schema("doc_id long, source string, text string, "
                "ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out_dir = str(tmp_path / "lake")
    qh = stream_curation_sink(stream, spark, sf_dir, out_dir,
                              str(tmp_path / "sink_ck"))
    qh.awaitTermination(180)

    lake = (spark.read.parquet(out_dir).toPandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert len(lake) == len(expected) > 0
    assert lake["doc_id"].tolist() == expected["doc_id"].tolist()
    assert lake["source"].tolist() == expected["source"].tolist()
    assert lake["text"].tolist() == expected["text"].tolist()
    # partitioned layout: one subdir per source actually present
    import os
    parts = {d for d in os.listdir(out_dir) if d.startswith("source=")}
    assert parts == {f"source={s}" for s in expected["source"].unique()}


def test_stream_asof_attach_spans_bar_gaps(spark, tmp_path):
    """Validity intervals must carry a bar across MISSING bar hours
    (trading halts): an event whose hour has no bar attaches the most
    recent earlier bar; an event exactly at a bar's own hour attaches
    the PREVIOUS bar (strictly-before semantics); an event before the
    first bar gets NULL."""
    import pandas as pd

    from pandas_ta_spark.streaming import stream_asof_attach

    bars_pd = pd.DataFrame({
        "symbol": "A",
        "ts": pd.to_datetime(["2026-01-01 01:00", "2026-01-01 02:00",
                              "2026-01-01 05:00"]),  # 03/04 missing
        "open": [1.0, 2.0, 5.0], "high": [1.0, 2.0, 5.0],
        "low": [1.0, 2.0, 5.0], "close": [1.0, 2.0, 5.0],
        "volume": [1.0, 1.0, 1.0],
    })
    bars = spark.createDataFrame(bars_pd)

    events = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "symbol": "A",
        "ts": pd.to_datetime([
            "2026-01-01 00:30",  # before first bar -> NULL
            "2026-01-01 02:15",  # hour 02 -> bar 01:00 (strictly before)
            "2026-01-01 03:40",  # gap hour -> bar 02:00 carried
            "2026-01-01 04:10",  # gap hour -> bar 02:00 still
            "2026-01-01 09:00",  # past last bar -> clamp to 05:00
        ]),
        "value": 1.0,
    })
    events["ts"] = events["ts"].astype("datetime64[us]")
    src = tmp_path / "asof_gap_src"
    src.mkdir()
    events.to_parquet(src / "a1.parquet")

    stream = (
        spark.readStream
        .schema("event_id long, symbol string, ts timestamp, value double")
        .parquet(str(src))
    )
    qh = (
        stream_asof_attach(stream, bars)
        .writeStream.format("memory").queryName("asof_gap_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(120)
    got = (spark.sql("SELECT event_id, bar_ts, bar_close FROM asof_gap_stream")
           .toPandas().sort_values("event_id").reset_index(drop=True))

    assert got["bar_ts"].isna().iloc[0]
    want = {2: "2026-01-01 01:00", 3: "2026-01-01 02:00",
            4: "2026-01-01 02:00", 5: "2026-01-01 05:00"}
    for eid, bts in want.items():
        row = got[got["event_id"] == eid]
        assert row["bar_ts"].iloc[0] == pd.Timestamp(bts), eid
    assert got["bar_close"].tolist()[1:] == [1.0, 2.0, 2.0, 5.0]


def test_stream_corpus_ingest_grows_its_index(spark, tmp_path):
    """The self-maintaining ingest loop: a document accepted in batch 1
    must REJECT its exact copy and its near-dup arriving in batch 2
    (the accepted-index join — neither text exists in the static
    corpus), in-batch exact dups resolve to the lower id, sample-fail
    and corpus-dup docs never land, and novel keepers do."""
    import hashlib

    import pandas as pd

    from pandas_ta_spark.ext.sampling import SAMPLE_THRESHOLDS
    from pandas_ta_spark.streaming import stream_corpus_ingest

    sf_dir = "/root/testdata/sf0.01"
    thr = SAMPLE_THRESHOLDS["src1"]  # "cc"

    def sample_ok(doc_id):
        return hashlib.md5(f"sample|{doc_id}".encode()).hexdigest()[:2] < thr

    ids = iter(range(2_000_000, 2_001_000))

    def pick(ok=True):
        for i in ids:
            if sample_ok(i) == ok:
                return i
        raise AssertionError("id pool exhausted")

    # quality-passing novel texts: 20+ distinct tokens incl. a stopword
    def novel(tag):
        words = [f"{tag}{i}" for i in range(25)]
        return "the " + " ".join(words)

    a_id, b_id = pick(), pick()
    b2_id = pick()
    assert b_id < b2_id
    sfail_id = pick(ok=False)
    corpus_text = (spark.read.parquet(f"{sf_dir}/documents.parquet")
                   .select("text").limit(1).collect()[0][0])
    c_id = pick()
    batch1 = pd.DataFrame({
        "doc_id": [a_id, b_id, b2_id, sfail_id, c_id],
        "source": "src1",
        "text": [novel("alpha"), novel("beta"), novel("beta"),
                 novel("gamma"), corpus_text],
        "ingest_ts": pd.Timestamp("2026-01-01 00:10:00"),
    })
    a2_id, a3_id, d_id = pick(), pick(), pick()
    # out-of-order arrival: a near-dup with a LOWER id than its
    # accepted twin — first-accepted-wins must still reject it
    # (code-review r8: the lower-id-only rule would have let it pass)
    low_id = next(i for i in range(1_900_000, 1_999_999)
                  if sample_ok(i))
    assert low_id < a_id
    batch2 = pd.DataFrame({
        "doc_id": [a2_id, a3_id, d_id, low_id],
        "source": "src1",
        "text": [novel("alpha"),              # exact copy of accepted A
                 novel("alpha") + " extra",   # near-dup of accepted A
                 novel("delta"),              # novel keeper
                 novel("alpha") + " later"],  # lower-id near-dup of A
        "ingest_ts": pd.Timestamp("2026-01-01 00:20:00"),
    })
    src = tmp_path / "ingest_src"
    src.mkdir()
    for df, name in ((batch1, "a1"), (batch2, "a2")):
        d = df.copy()
        d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
        d.to_parquet(src / f"{name}.parquet")

    stream = (
        spark.readStream
        .schema("doc_id long, source string, text string, "
                "ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    lake = str(tmp_path / "ingest_lake")
    qh = stream_corpus_ingest(stream, spark, sf_dir, lake,
                              str(tmp_path / "ingest_ck"))
    qh.awaitTermination(240)

    got = (spark.read.parquet(f"{lake}/docs").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == sorted([a_id, b_id, d_id])
    # the growing index really grew: batch-2 rejections were vs
    # ACCEPTED signatures, not the static corpus
    band_idx = spark.read.parquet(f"{lake}/band_index")
    assert band_idx.filter(f"corpus_doc_id = {a_id}").count() == 4  # N_BANDS
    exact_idx = spark.read.parquet(f"{lake}/exact_index").toPandas()
    assert set(exact_idx["exact_min"]) == {a_id, b_id, d_id}


def test_compact_ingest_lake_preserves_decisions(spark, tmp_path):
    """Compacting the ingest lake's appended index dirs must not change
    any future gate decision: same band-key set, same per-hash exact
    minima, fewer files — and a doc that the pre-compaction index
    rejected is still rejected after."""
    import hashlib
    import os

    import pandas as pd

    from pandas_ta_spark.ext.sampling import SAMPLE_THRESHOLDS
    from pandas_ta_spark.streaming import (
        compact_ingest_lake, stream_corpus_ingest,
    )

    sf_dir = "/root/testdata/sf0.01"
    thr = SAMPLE_THRESHOLDS["src1"]
    ids = iter(range(3_000_000, 3_001_000))

    def pick():
        for i in ids:
            if hashlib.md5(f"sample|{i}".encode()).hexdigest()[:2] < thr:
                return i
        raise AssertionError("id pool exhausted")

    def novel(tag):
        return "the " + " ".join(f"{tag}{i}" for i in range(25))

    a_id = pick()
    b1 = pd.DataFrame({
        "doc_id": [a_id], "source": "src1", "text": [novel("omega")],
        "ingest_ts": pd.Timestamp("2026-01-01 00:10:00"),
    })
    src = tmp_path / "cmp_src"
    src.mkdir()
    d = b1.copy()
    d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
    d.to_parquet(src / "a1.parquet")
    lake = str(tmp_path / "cmp_lake")
    stream = (
        spark.readStream
        .schema("doc_id long, source string, text string, "
                "ingest_ts timestamp")
        .parquet(str(src))
    )
    stream_corpus_ingest(stream, spark, sf_dir, lake,
                         str(tmp_path / "cmp_ck1")).awaitTermination(180)

    before_band = (spark.read.parquet(f"{lake}/band_index").toPandas()
                   .sort_values(["band", "bkey"]).reset_index(drop=True))
    before_exact = (spark.read.parquet(f"{lake}/exact_index").toPandas()
                    .sort_values("hh").reset_index(drop=True))

    stats = compact_ingest_lake(spark, lake)
    assert stats["band_rows"] == len(before_band)
    assert stats["exact_rows"] == len(before_exact)
    after_band = (spark.read.parquet(f"{lake}/band_index").toPandas()
                  .sort_values(["band", "bkey"]).reset_index(drop=True))
    after_exact = (spark.read.parquet(f"{lake}/exact_index").toPandas()
                   .sort_values("hh").reset_index(drop=True))
    assert after_band.equals(before_band)
    assert after_exact.equals(before_exact)
    # single data file per compacted index
    for sub in ("band_index", "exact_index"):
        files = [f for f in os.listdir(f"{lake}/{sub}")
                 if f.endswith(".parquet")]
        assert len(files) == 1, sub

    # the compacted index still rejects a copy of the accepted doc
    a2_id = pick()
    b2 = pd.DataFrame({
        "doc_id": [a2_id], "source": "src1", "text": [novel("omega")],
        "ingest_ts": pd.Timestamp("2026-01-01 00:20:00"),
    })
    src2 = tmp_path / "cmp_src2"
    src2.mkdir()
    d = b2.copy()
    d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
    d.to_parquet(src2 / "a1.parquet")
    stream2 = (
        spark.readStream
        .schema("doc_id long, source string, text string, "
                "ingest_ts timestamp")
        .parquet(str(src2))
    )
    stream_corpus_ingest(stream2, spark, sf_dir, lake,
                         str(tmp_path / "cmp_ck2")).awaitTermination(180)
    docs_out = spark.read.parquet(f"{lake}/docs").toPandas()
    assert a_id in set(docs_out["doc_id"])
    assert a2_id not in set(docs_out["doc_id"])


def test_stream_asof_attach_subhourly_bars(spark, tmp_path):
    """Non-hour-aligned and sub-hourly bars (code-review r8: these used
    to throw in sequence() or duplicate hour keys): several bars inside
    one hour resolve to the LATEST strictly-before bar per event hour,
    no duplicated event rows, no exceptions."""
    import pandas as pd

    from pandas_ta_spark.streaming import stream_asof_attach

    bars_pd = pd.DataFrame({
        "symbol": "A",
        "ts": pd.to_datetime(["2026-01-01 01:10", "2026-01-01 01:40",
                              "2026-01-01 02:30"]),
        "open": [1.0, 2.0, 3.0], "high": [1.0, 2.0, 3.0],
        "low": [1.0, 2.0, 3.0], "close": [1.0, 2.0, 3.0],
        "volume": 1.0,
    })
    bars = spark.createDataFrame(bars_pd)
    events = pd.DataFrame({
        "event_id": [1, 2, 3],
        "symbol": "A",
        "ts": pd.to_datetime([
            "2026-01-01 02:05",  # hour 02 -> latest bar < 02:00 is 01:40
            "2026-01-01 03:20",  # hour 03 -> 02:30
            "2026-01-01 07:00",  # past end -> clamp to 02:30
        ]),
        "value": 1.0,
    })
    events["ts"] = events["ts"].astype("datetime64[us]")
    src = tmp_path / "asof_sub_src"
    src.mkdir()
    events.to_parquet(src / "a1.parquet")
    stream = (
        spark.readStream
        .schema("event_id long, symbol string, ts timestamp, value double")
        .parquet(str(src))
    )
    qh = (
        stream_asof_attach(stream, bars)
        .writeStream.format("memory").queryName("asof_sub_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(120)
    got = (spark.sql("SELECT event_id, bar_close FROM asof_sub_stream")
           .toPandas().sort_values("event_id").reset_index(drop=True))
    assert got["event_id"].tolist() == [1, 2, 3]  # no duplicated rows
    assert got["bar_close"].tolist() == [2.0, 3.0, 3.0]


def test_stream_vector_ingest_serves_added_vectors(spark, tmp_path):
    """FAISS-add path: vectors ingested online must be assigned to the
    SAME inverted list as their corpus twins (frozen quantizer, shared
    argmax) and become immediately servable — a query equal to a copied
    vector's source must return the new copy at rank 1 with cosine
    exactly 1.0."""
    import pandas as pd

    from pandas_ta_spark.ext.similarity import N_QUERIES, _ivf_lists
    from pandas_ta_spark.streaming import stream_topk_ivf, stream_vector_ingest

    sf_dir = "/root/testdata/sf0.01"
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding").toPandas())
    # copy three corpus vectors (NOT query vectors) under fresh ids
    src_rows = emb[emb["vec_id"].isin([100, 150, 220])].copy()
    added = src_rows.copy()
    id_map = {100: 5_000_100, 150: 5_000_150, 220: 5_000_220}
    added["vec_id"] = added["vec_id"].map(id_map)
    ts = pd.Timestamp("2026-01-01 00:10:00")
    added["ingest_ts"] = ts
    added["ingest_ts"] = added["ingest_ts"].astype("datetime64[ms]")
    vsrc = tmp_path / "vec_src"
    vsrc.mkdir()
    added.to_parquet(vsrc / "a1.parquet")
    lake = str(tmp_path / "vec_lake")
    vstream = (
        spark.readStream
        .schema("vec_id long, embedding array<double>, ingest_ts timestamp")
        .parquet(str(vsrc))
    )
    stream_vector_ingest(vstream, spark, sf_dir, lake,
                         str(tmp_path / "vec_ck")).awaitTermination(180)

    # frozen-quantizer assignment parity: each copy landed in its
    # source's inverted list
    _, _, lists = _ivf_lists(spark, sf_dir)
    static = {r["vec_id"]: r["centroid_id"] for r in lists.collect()}
    lake_rows = {r["vec_id"]: r["centroid_id"]
                 for r in spark.read.parquet(f"{lake}/vectors").collect()}
    assert set(lake_rows) == set(id_map.values())
    for src_id, new_id in id_map.items():
        assert lake_rows[new_id] == static[src_id], (src_id, new_id)

    # serve: queries = the three SOURCE vectors; the added copies must
    # be rank-1 matches at score exactly 1.0
    q = src_rows.rename(columns={"vec_id": "query_id"}).copy()
    q["ingest_ts"] = ts
    flusher = pd.DataFrame({
        "query_id": [9999],
        "embedding": [src_rows["embedding"].iloc[0]],
        "ingest_ts": [ts + pd.Timedelta(hours=4)],
    })
    qsrc = tmp_path / "vec_q_src"
    qsrc.mkdir()
    for df, name in ((q, "a1"), (flusher, "a2")):
        d = df.copy()
        d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
        d.to_parquet(qsrc / f"{name}.parquet")
    qstream = (
        spark.readStream
        .schema("query_id long, embedding array<double>, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(qsrc))
    )
    qh = (
        stream_topk_ivf(qstream, spark, sf_dir, extra_vectors_dir=lake)
        .writeStream.format("memory").queryName("vec_serve")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = spark.sql("SELECT query_id, match_id, rank, score FROM vec_serve "
                    "WHERE rank = 1").toPandas()
    for src_id, new_id in id_map.items():
        row = got[got["query_id"] == src_id]
        assert len(row) == 1, src_id
        assert row["match_id"].iloc[0] == new_id
        assert row["score"].iloc[0] == 1.0


def test_stream_embedding_drift(spark, tmp_path):
    """Drift telemetry: replaying the corpus in one window gives
    cos_to_corpus exactly 1.0 (same mean by construction, fixed-point
    exact); a shifted copy in a later window reads < 1."""
    import numpy as np
    import pandas as pd

    from pandas_ta_spark.streaming import stream_embedding_drift

    sf_dir = "/root/testdata/sf0.01"
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding").toPandas())
    ts = pd.Timestamp("2026-01-01 00:10:00")
    same = emb.copy()
    same["ingest_ts"] = ts
    shifted = emb.copy()
    shifted["embedding"] = shifted["embedding"].map(
        lambda v: [float(x) + 0.5 for x in v])
    shifted["ingest_ts"] = ts + pd.Timedelta(hours=2)
    flusher = emb.iloc[:1].copy()
    flusher["ingest_ts"] = ts + pd.Timedelta(hours=8)
    src = tmp_path / "drift_src"
    src.mkdir()
    for df, name in ((same, "a1"), (shifted, "a2"), (flusher, "a3")):
        d = df.copy()
        d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
        d.to_parquet(src / f"{name}.parquet")
    stream = (
        spark.readStream
        .schema("vec_id long, embedding array<double>, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qh = (
        stream_embedding_drift(stream, spark, sf_dir)
        .writeStream.format("memory").queryName("drift_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = (spark.sql("SELECT * FROM drift_stream").toPandas()
           .sort_values("window_start").reset_index(drop=True))
    assert len(got) == 2
    assert got["n_vecs"].tolist() == [len(emb), len(emb)]
    # the dimension sums are exact ints, but cos carries sqrt(n)*sqrt(n)
    # != n (IEEE), so identical means read 1.0 +/- a couple of ulps
    assert abs(got["cos_to_corpus"].iloc[0] - 1.0) < 1e-12
    assert got["cos_to_corpus"].iloc[1] < 0.999


def test_stream_vector_ingest_serves_ivfpq(spark, tmp_path):
    """IndexIVFPQ add(): ingested vectors are PQ-encoded with the FROZEN
    session codebooks, so the IVF-PQ server ADC-scores them. A copy of a
    corpus vector has identical codes, hence an ADC score exactly equal
    to its source's — querying with a fresh id must return source and
    copy at adjacent ranks with equal scores (tie broken by id)."""
    import pandas as pd

    from pandas_ta_spark.streaming import stream_topk_ivfpq, stream_vector_ingest

    sf_dir = "/root/testdata/sf0.01"
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding").toPandas())
    src_row = emb[emb["vec_id"] == 123].copy()
    added = src_row.copy()
    added["vec_id"] = [5_100_123]
    ts = pd.Timestamp("2026-01-01 00:10:00")
    added["ingest_ts"] = ts
    added["ingest_ts"] = added["ingest_ts"].astype("datetime64[ms]")
    vsrc = tmp_path / "pq_vec_src"
    vsrc.mkdir()
    added.to_parquet(vsrc / "a1.parquet")
    lake = str(tmp_path / "pq_vec_lake")
    vstream = (
        spark.readStream
        .schema("vec_id long, embedding array<double>, ingest_ts timestamp")
        .parquet(str(vsrc))
    )
    stream_vector_ingest(vstream, spark, sf_dir, lake,
                         str(tmp_path / "pq_vec_ck")).awaitTermination(180)
    # codes landed and match the source's static codes exactly
    from pandas_ta_spark.ext.similarity import _pq_index

    _, _, _, codes = _pq_index(spark, sf_dir)
    src_codes = {r["m"]: r["code"]
                 for r in codes.filter("vec_id = 123").collect()}
    lake_codes = {r["m"]: r["code"]
                  for r in spark.read.parquet(f"{lake}/codes").collect()}
    assert lake_codes == src_codes

    q = pd.DataFrame({
        "query_id": [6_000_001],
        "embedding": src_row["embedding"].tolist(),
        "ingest_ts": [ts],
    })
    flusher = q.copy()
    flusher["query_id"] = [9999]
    flusher["ingest_ts"] = [ts + pd.Timedelta(hours=4)]
    qsrc = tmp_path / "pq_q_src"
    qsrc.mkdir()
    for df, name in ((q, "a1"), (flusher, "a2")):
        d = df.copy()
        d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
        d.to_parquet(qsrc / f"{name}.parquet")
    qstream = (
        spark.readStream
        .schema("query_id long, embedding array<double>, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(qsrc))
    )
    qh = (
        stream_topk_ivfpq(qstream, spark, sf_dir, extra_vectors_dir=lake)
        .writeStream.format("memory").queryName("pq_vec_serve")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = (spark.sql("SELECT match_id, rank, score FROM pq_vec_serve "
                     "WHERE query_id = 6000001").toPandas()
           .set_index("match_id"))
    assert 123 in got.index and 5_100_123 in got.index
    assert got.loc[123, "score"] == got.loc[5_100_123, "score"]
    assert got.loc[5_100_123, "rank"] == got.loc[123, "rank"] + 1  # id tie-break


def test_stream_vector_ingest_replay_is_harmless(spark, tmp_path):
    """code-review r8: an at-least-once replay appends duplicate lake
    rows; before the per-(vec_id) and per-(vec_id, m) folds this made
    codes_wide arrays over-long, NULLed the ADC sum and surfaced the
    corrupted candidate at RANK 1. Ingesting the same batch twice must
    now serve identically to once — no NULL scores, no duplicated
    match_ids, one rank per candidate."""
    import pandas as pd

    from pandas_ta_spark.streaming import stream_topk_ivfpq, stream_vector_ingest

    sf_dir = "/root/testdata/sf0.01"
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding").toPandas())
    src_row = emb[emb["vec_id"] == 321].copy()
    added = src_row.copy()
    added["vec_id"] = [5_200_321]
    ts = pd.Timestamp("2026-01-01 00:10:00")
    added["ingest_ts"] = ts
    added["ingest_ts"] = added["ingest_ts"].astype("datetime64[ms]")
    vsrc = tmp_path / "rp_vec_src"
    vsrc.mkdir()
    added.to_parquet(vsrc / "a1.parquet")
    lake = str(tmp_path / "rp_vec_lake")
    for ck in ("rp_ck1", "rp_ck2"):  # second run = replayed appends
        vstream = (
            spark.readStream
            .schema("vec_id long, embedding array<double>, "
                    "ingest_ts timestamp")
            .parquet(str(vsrc))
        )
        stream_vector_ingest(vstream, spark, sf_dir, lake,
                             str(tmp_path / ck)).awaitTermination(180)
    # duplicate rows really are in the lake (the hazard is real)
    assert spark.read.parquet(f"{lake}/codes").count() > 8  # > M_SUB

    q = pd.DataFrame({
        "query_id": [6_100_001],
        "embedding": src_row["embedding"].tolist(),
        "ingest_ts": [ts],
    })
    flusher = q.copy()
    flusher["query_id"] = [9999]
    flusher["ingest_ts"] = [ts + pd.Timedelta(hours=4)]
    qsrc = tmp_path / "rp_q_src"
    qsrc.mkdir()
    for df, name in ((q, "a1"), (flusher, "a2")):
        d = df.copy()
        d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
        d.to_parquet(qsrc / f"{name}.parquet")
    qstream = (
        spark.readStream
        .schema("query_id long, embedding array<double>, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(qsrc))
    )
    qh = (
        stream_topk_ivfpq(qstream, spark, sf_dir, extra_vectors_dir=lake)
        .writeStream.format("memory").queryName("rp_serve")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = spark.sql("SELECT match_id, rank, score FROM rp_serve "
                    "WHERE query_id = 6100001").toPandas()
    assert got["score"].notna().all()
    assert got["match_id"].is_unique
    assert sorted(got["rank"]) == list(range(1, len(got) + 1))
    row = got[got["match_id"] == 5_200_321]
    assert len(row) == 1  # the added copy serves exactly once
    src = got[got["match_id"] == 321]
    assert len(src) == 1 and row["score"].iloc[0] == src["score"].iloc[0]


def test_stream_curation_gate_consults_accepted_lake(spark, tmp_path):
    """The continuous gate pointed at an ingest lake must flag docs
    that near-dup or exact-dup PREVIOUSLY ACCEPTED streamed docs (not
    in the static corpus), id-order-free."""
    import hashlib

    import pandas as pd

    from pandas_ta_spark.ext.sampling import SAMPLE_THRESHOLDS
    from pandas_ta_spark.streaming import stream_corpus_ingest, stream_curation_gate

    sf_dir = "/root/testdata/sf0.01"
    thr = SAMPLE_THRESHOLDS["src1"]
    ids = iter(range(4_000_000, 4_001_000))

    def pick():
        for i in ids:
            if hashlib.md5(f"sample|{i}".encode()).hexdigest()[:2] < thr:
                return i
        raise AssertionError("exhausted")

    def novel(tag):
        return "the " + " ".join(f"{tag}{i}" for i in range(25))

    a_id = pick()
    seed = pd.DataFrame({
        "doc_id": [a_id], "source": "src1", "text": [novel("kappa")],
        "ingest_ts": pd.Timestamp("2026-01-01 00:10:00"),
    })
    src = tmp_path / "gl_src"
    src.mkdir()
    d = seed.copy()
    d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
    d.to_parquet(src / "a1.parquet")
    lake = str(tmp_path / "gl_lake")
    stream = (
        spark.readStream
        .schema("doc_id long, source string, text string, "
                "ingest_ts timestamp")
        .parquet(str(src))
    )
    stream_corpus_ingest(stream, spark, sf_dir, lake,
                         str(tmp_path / "gl_ck")).awaitTermination(180)

    # a LOWER-id near-dup and an exact copy, streamed through the
    # continuous gate with the lake attached
    low_id = next(i for i in range(3_900_000, 3_999_999)
                  if hashlib.md5(f"sample|{i}".encode()).hexdigest()[:2] < thr)
    copy_id = pick()
    probe = pd.DataFrame({
        "doc_id": [low_id, copy_id],
        "source": "src1",
        "text": [novel("kappa") + " tail", novel("kappa")],
        "ingest_ts": pd.Timestamp("2026-01-01 01:10:00"),
    })
    flusher = pd.DataFrame({
        "doc_id": [99_999_999], "source": ["src1"],
        "text": ["flush " * 10],
        "ingest_ts": [pd.Timestamp("2026-01-01 06:00:00")],
    })
    src2 = tmp_path / "gl_src2"
    src2.mkdir()
    for df, name in ((probe, "a1"), (flusher, "a2")):
        d = df.copy()
        d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
        d.to_parquet(src2 / f"{name}.parquet")
    stream2 = (
        spark.readStream
        .schema("doc_id long, source string, text string, "
                "ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src2))
    )
    qh = (
        stream_curation_gate(stream2, spark, sf_dir,
                             accepted_lake_dir=lake)
        .writeStream.format("memory").queryName("gl_gate")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = (spark.sql("SELECT doc_id, exact_keep, near_dup, keep FROM gl_gate")
           .toPandas().set_index("doc_id"))
    # lower-id near-dup of the ACCEPTED doc: flagged despite its id
    assert bool(got.loc[low_id, "near_dup"])
    assert got.loc[low_id, "keep"] == 0
    # exact copy: the lake's exact index owns the hash under a_id
    assert not got.loc[copy_id, "exact_keep"]
    assert got.loc[copy_id, "keep"] == 0


def test_asof_lookup_property_vs_merge_asof(spark):
    """Property pin for the validity-interval construction: for random
    bar spacings (sub-hourly runs, multi-hour gaps, several symbols),
    attaching events through the hour-keyed lookup must equal pandas
    merge_asof on (symbol, event-hour) with strictly-before semantics —
    for every event hour within the lookup's span."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from pandas_ta_spark.streaming.relational import asof_lookup_table

    rng = np.random.default_rng(11)
    rows = []
    for sym in ("A", "B", "C"):
        t = pd.Timestamp("2026-01-01 00:05")
        for i in range(40):
            # mixed spacing: 10 minutes to 7 hours
            t = t + pd.Timedelta(minutes=int(rng.integers(10, 7 * 60)))
            rows.append((sym, t, float(rng.normal(100, 5))))
    bars_pd = pd.DataFrame(rows, columns=["symbol", "ts", "close"])
    bars = spark.createDataFrame(
        bars_pd.assign(open=bars_pd["close"], high=bars_pd["close"],
                       low=bars_pd["close"], volume=1.0))

    lookup = (asof_lookup_table(bars).toPandas()
              .sort_values(["symbol", "h"]).reset_index(drop=True))

    # expected: for each (symbol, h) in the lookup, the latest bar with
    # ts strictly below h
    for sym, grp in lookup.groupby("symbol"):
        b = (bars_pd[bars_pd["symbol"] == sym]
             .sort_values("ts").reset_index(drop=True))
        for r in grp.itertuples():
            prior = b[b["ts"] < r.h]
            assert len(prior) > 0, (sym, r.h)
            want = prior.iloc[-1]
            assert r.bar_ts == want["ts"], (sym, r.h)
            assert r.bar_close == want["close"], (sym, r.h)
        # completeness: every hour from the first bar's next hour to the
        # last bar's next hour is present exactly once
        first_h = (b["ts"].iloc[0].floor("h") + pd.Timedelta(hours=1))
        last_h = (b["ts"].iloc[-1].floor("h") + pd.Timedelta(hours=1))
        hours = pd.date_range(first_h, last_h, freq="h")
        assert grp["h"].tolist() == list(hours)


def test_read_ingest_lake_folds_replays(spark, tmp_path):
    """Replaying an ingest batch duplicates doc rows in the lake;
    read_ingest_lake must return exactly one row per doc with content
    intact."""
    import hashlib

    import pandas as pd

    from pandas_ta_spark.ext.sampling import SAMPLE_THRESHOLDS
    from pandas_ta_spark.streaming import read_ingest_lake, stream_corpus_ingest

    sf_dir = "/root/testdata/sf0.01"
    thr = SAMPLE_THRESHOLDS["src1"]
    a_id = next(i for i in range(7_000_000, 7_001_000)
                if hashlib.md5(f"sample|{i}".encode()).hexdigest()[:2] < thr)
    text = "the " + " ".join(f"tau{i}" for i in range(25))
    seed = pd.DataFrame({
        "doc_id": [a_id], "source": "src1", "text": [text],
        "ingest_ts": pd.Timestamp("2026-01-01 00:10:00"),
    })
    src = tmp_path / "rl_src"
    src.mkdir()
    d = seed.copy()
    d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
    d.to_parquet(src / "a1.parquet")
    lake = str(tmp_path / "rl_lake")
    for ck in ("rl_ck1", "rl_ck2"):  # second run = replay
        stream = (
            spark.readStream
            .schema("doc_id long, source string, text string, "
                    "ingest_ts timestamp")
            .parquet(str(src))
        )
        stream_corpus_ingest(stream, spark, sf_dir, lake,
                             str(tmp_path / ck)).awaitTermination(180)
    raw = spark.read.parquet(f"{lake}/docs")
    assert raw.count() == 2  # the duplication is real
    folded = read_ingest_lake(spark, lake).toPandas()
    assert len(folded) == 1
    assert folded["doc_id"].iloc[0] == a_id
    assert folded["text"].iloc[0] == text


def test_streaming_bbands_matches_batch(spark, pdf_bars, tmp_path):
    """The rolling-window state class: a ring buffer of the last n
    closes carried across micro-batches must reproduce the batch bbands
    kernel row-for-row (window spans the batch boundary)."""
    src = tmp_path / "bb_src"
    src.mkdir()
    a = one_symbol(pdf_bars)[["symbol", "ts", "close"]].copy()
    a["ts"] = a["ts"].astype("datetime64[ms]")
    a.iloc[:97].to_parquet(src / "p1.parquet")   # split mid-window
    a.iloc[97:].to_parquet(src / "p2.parquet")
    from pandas_ta_spark.streaming import streaming_bbands

    stream = (
        spark.readStream.schema("symbol string, ts timestamp, close double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_bbands(stream, length=5, std=2.0)
        .writeStream.format("memory").queryName("bb_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM bb_stream").toPandas()
        .sort_values("ts").reset_index(drop=True)
    )
    assert len(got) == len(a)
    c = a["close"].reset_index(drop=True)
    mid = c.rolling(5).mean()
    sd = c.rolling(5).std(ddof=0)
    assert_close(got["bbm"], mid, tol=1e-9, name="bb-mid")
    assert_close(got["bbl"], mid - 2 * sd, tol=1e-9, name="bb-low")
    assert_close(got["bbu"], mid + 2 * sd, tol=1e-9, name="bb-up")


def test_streaming_donchian_matches_batch(spark, pdf_bars, tmp_path):
    """Rolling order statistics carried across micro-batches (ring
    buffer spans the boundary) must equal the batch rolling min/max."""
    src = tmp_path / "dc_src"
    src.mkdir()
    a = one_symbol(pdf_bars)[["symbol", "ts", "high", "low"]].copy()
    a["ts"] = a["ts"].astype("datetime64[ms]")
    a.iloc[:110].to_parquet(src / "p1.parquet")
    a.iloc[110:].to_parquet(src / "p2.parquet")
    from pandas_ta_spark.streaming import streaming_donchian

    stream = (
        spark.readStream
        .schema("symbol string, ts timestamp, high double, low double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_donchian(stream, lower_length=20, upper_length=20)
        .writeStream.format("memory").queryName("dc_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (spark.sql("SELECT * FROM dc_stream").toPandas()
           .sort_values("ts").reset_index(drop=True))
    assert len(got) == len(a)
    lo = a["low"].reset_index(drop=True).rolling(20).min()
    hi = a["high"].reset_index(drop=True).rolling(20).max()
    assert_close(got["dcl"], lo, tol=1e-9, name="dc-low")
    assert_close(got["dcu"], hi, tol=1e-9, name="dc-up")
    assert_close(got["dcm"], (lo + hi) / 2, tol=1e-9, name="dc-mid")


def test_stream_perplexity_gate_matches_batch(spark, tmp_path):
    """Replaying the corpus through the perplexity gate must reproduce
    the batch perplexity_unigram scores exactly (no unseen tokens on
    replay); a planted gibberish doc scores the OOV mass — strictly
    higher than every in-corpus doc."""
    import pandas as pd

    from pandas_ta_spark.ext.text import SUITE
    from pandas_ta_spark.streaming import stream_perplexity_gate

    sf_dir = "/root/testdata/sf0.01"
    batch = (SUITE["perplexity_unigram"].query(spark, sf_dir).toPandas()
             .sort_values("doc_id").reset_index(drop=True))

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").toPandas())
    ts = pd.Timestamp("2026-01-01 00:10:00")
    docs["ingest_ts"] = ts
    junk = pd.DataFrame({
        "doc_id": [90_000_001],
        "text": ["zzqx" + " ".join(f"qwzx{i}xx" for i in range(20))],
        "ingest_ts": [ts],
    })
    flusher = pd.DataFrame({
        "doc_id": [99_999_999], "text": ["flush " * 10],
        "ingest_ts": [ts + pd.Timedelta(hours=5)],
    })
    src = tmp_path / "ppl_src"
    src.mkdir()
    for df, name in ((docs.iloc[::2], "a1"), (docs.iloc[1::2], "a2"),
                     (junk, "a3"), (flusher, "a4")):
        d = df.copy()
        d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
        d.to_parquet(src / f"{name}.parquet")

    stream = (
        spark.readStream
        .schema("doc_id long, text string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qh = (
        stream_perplexity_gate(stream, spark, sf_dir)
        .writeStream.format("memory").queryName("ppl_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = (spark.sql("SELECT doc_id, n_tokens, avg_neg_logp "
                     "FROM ppl_stream").toPandas())
    junk_row = got[got["doc_id"] == 90_000_001]
    got = (got[got["doc_id"] < 90_000_000]
           .sort_values("doc_id").reset_index(drop=True))

    assert len(got) == len(batch) > 0
    assert got["doc_id"].tolist() == batch["doc_id"].tolist()
    assert got["n_tokens"].tolist() == batch["n_tokens"].tolist()
    assert got["avg_neg_logp"].tolist() == batch["avg_neg_logp"].tolist()
    # the gibberish doc reads as maximally surprising
    assert junk_row["avg_neg_logp"].iloc[0] > got["avg_neg_logp"].max()


def test_stream_trending_terms(spark, tmp_path):
    """Top-k tokens per window must equal an independent pandas count
    (count desc, token asc tie-break), windows isolated."""
    import pandas as pd

    from pandas_ta_spark.streaming import stream_trending_terms

    ts1 = pd.Timestamp("2026-01-01 00:10:00")
    ts2 = pd.Timestamp("2026-01-01 02:10:00")
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["apple apple banana cherry",
                 "banana apple date",
                 "zebra zebra zebra yak",
                 "yak zebra apple"],
        "ingest_ts": [ts1, ts1, ts2, ts2],
    })
    flusher = pd.DataFrame({
        "doc_id": [9], "text": ["flush"],
        "ingest_ts": [ts2 + pd.Timedelta(hours=6)],
    })
    src = tmp_path / "tt_src"
    src.mkdir()
    for df, name in ((docs, "a1"), (flusher, "a2")):
        d = df.copy()
        d["ingest_ts"] = d["ingest_ts"].astype("datetime64[ms]")
        d.to_parquet(src / f"{name}.parquet")
    stream = (
        spark.readStream
        .schema("doc_id long, text string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qh = (
        stream_trending_terms(stream, k=3)
        .writeStream.format("memory").queryName("tt_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(120)
    got = (spark.sql("SELECT * FROM tt_stream").toPandas()
           .sort_values(["window_start", "rank"]).reset_index(drop=True))
    w1 = got[got["window_start"] == ts1.floor("h")]
    assert w1["token"].tolist() == ["apple", "banana", "cherry"]
    assert w1["n"].tolist() == [3, 2, 1]
    w2 = got[got["window_start"] == ts2.floor("h")]
    assert w2["token"].tolist() == ["zebra", "yak", "apple"]
    assert w2["n"].tolist() == [4, 2, 1]


def test_stream_attribution_attach_matches_batch(spark, tmp_path):
    """The keyed-state last-click carry must reproduce the batch
    union-and-carry attribution bit-for-bit over an in-order replay of
    the full events table — including purchases before any click (NULL
    attribution) and state carried across micro-batch boundaries (the
    replay splits mid-corpus, so most users' prevailing click lives in
    an earlier batch than the purchase it attributes)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pandas_ta_spark.ext.behavior import attribution_last_touch
    from pandas_ta_spark.sources.bars import load_table
    from pandas_ta_spark.streaming import stream_attribution_attach

    sf_dir = "/root/testdata/sf0.01"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type")
    batch = (attribution_last_touch(ev).toPandas()
             .sort_values("event_id").reset_index(drop=True))

    epd = (ev.toPandas().sort_values(["ts", "event_id"])
           .reset_index(drop=True))
    epd["ts"] = epd["ts"].astype("datetime64[us]")
    src = tmp_path / "attrib_src"
    src.mkdir()
    # sequential time-ordered chunks: the stateful twin's documented
    # ordering contract (per-user in-order arrival)
    n = len(epd)
    for i, (lo, hi) in enumerate(
            ((0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n))):
        epd.iloc[lo:hi].to_parquet(src / f"b{i}.parquet")

    stream = (
        spark.readStream
        .schema("event_id long, user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    qh = (
        stream_attribution_attach(stream)
        .writeStream.format("memory").queryName("attrib_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = (spark.sql("SELECT * FROM attrib_stream").toPandas()
           .sort_values("event_id").reset_index(drop=True))

    assert len(got) == len(batch) > 0
    assert got["event_id"].tolist() == batch["event_id"].tolist()
    assert got["user_id"].tolist() == batch["user_id"].tolist()
    for c in ("ts", "click_event_id", "click_ts", "gap_us"):
        a, b = got[c], batch[c]
        ok = (a == b) | (a.isna() & b.isna())
        assert ok.all(), (c, got[~ok].head(), batch[~ok].head())
    # both edge classes really occurred in the corpus
    assert batch["click_event_id"].isna().any()
    assert batch["click_event_id"].notna().any()


def test_stream_rate_anomaly_matches_batch(spark, tmp_path):
    """Windowed streamed counts scored against the batch-fitted (med,
    mad) baseline must match the batch robust z-scores and flags exactly
    on every NON-EMPTY hour — including the planted spike — while the
    zero-count outage row is batch-only (the documented online scope:
    silence produces no window to score)."""
    import pandas as pd

    from pandas_ta_spark.ext.behavior import rate_anomaly
    from pandas_ta_spark.streaming import stream_rate_anomaly

    rows = []
    base = pd.Timestamp("2024-01-01")
    for h in range(41):
        if h == 20:
            continue  # outage hour: batch-only zero-fill
        n = 100 if h == 30 else (9, 10, 11)[h % 3]
        for i in range(n):
            rows.append(("api", base + pd.Timedelta(hours=h, seconds=i)))
    epd = pd.DataFrame(rows, columns=["event_type", "ts"])
    epd["ts"] = epd["ts"].astype("datetime64[us]")

    ev = spark.createDataFrame(epd)
    batch = (rate_anomaly(ev).toPandas()
             .sort_values("h").reset_index(drop=True))
    baseline = (rate_anomaly(ev)
                .select("event_type", "med", "mad").distinct())

    src = tmp_path / "rate_src"
    src.mkdir()
    half = len(epd) // 2
    epd.iloc[:half].to_parquet(src / "a1.parquet")
    epd.iloc[half:].to_parquet(src / "a2.parquet")
    # watermark flush: append-mode windows only emit once the watermark
    # passes their end — a far-future sentinel (own window never closes,
    # so it cannot leak into the output) releases the tail hours
    pd.DataFrame({
        "event_type": ["sentinel"],
        "ts": [(epd["ts"].max() + pd.Timedelta(days=2))],
    }).astype({"ts": "datetime64[us]"}).to_parquet(src / "a3.parquet")
    stream = (
        spark.readStream.schema("event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    qh = (
        stream_rate_anomaly(stream, baseline)
        .writeStream.format("memory").queryName("rate_anom_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qh.awaitTermination(180)
    got = (spark.sql("SELECT * FROM rate_anom_stream").toPandas()
           .sort_values("h").reset_index(drop=True))

    nonempty = batch[batch["n"] > 0].reset_index(drop=True)
    assert len(got) == len(nonempty) == 40
    assert got["h"].tolist() == nonempty["h"].tolist()
    assert got["n"].tolist() == nonempty["n"].tolist()
    assert got["robust_z"].tolist() == nonempty["robust_z"].tolist()
    assert got["is_anomaly"].tolist() == nonempty["is_anomaly"].tolist()
    assert got["is_anomaly"].sum() == 1  # the spike flags online
    assert batch["is_anomaly"].sum() == 2  # spike + outage offline
