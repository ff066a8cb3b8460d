"""Independent-recompute tests for the r8 regime/diversity ops.

The oracle gate (tools/check.py) proves Spark == DuckDB on the driver
tables; these tests recompute each statistic a THIRD way — numpy/pandas
with the same integer quantization — so a shared misreading of the
definition in both SQL dialects would still be caught. Plus planted-input
semantics for drawdown_episodes (episode boundaries the synthetic corpus
may never isolate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest  # noqa: F401  (fixtures)

SF_DIR = "/root/testdata/sf0.001"

N = 24          # BETA_N
SCALE = 1e6     # BETA_SCALE


def _rounded(x):
    return np.floor(x * 1e6 + 0.5) / 1e6


def _quant_log_ret(close: np.ndarray, lag: int = 1) -> np.ndarray:
    """floor(ln(c_t / c_{t-lag}) * 1e6 + 0.5) as float array with NaN
    warm-up — the exact quantization both engines use."""
    r = np.full(len(close), np.nan)
    r[lag:] = np.log(close[lag:] / close[:-lag])
    q = np.floor(r * SCALE + 0.5)
    return q


def _win_sums(vals: np.ndarray, mask: np.ndarray, n: int):
    """Exact trailing-n-row sums of int64(vals where mask else 0) and of
    the mask count, via int64 cumsums (no float rolling — the products
    reach ~5e15 where float64 rolling would start rounding)."""
    v = np.where(mask, vals, 0).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(v)])
    cm = np.concatenate([[0], np.cumsum(mask.astype(np.int64))])
    lo = np.maximum(0, np.arange(1, len(vals) + 1) - n)
    return cs[1:] - cs[lo], cm[1:] - cm[lo]


def _bars_pdf(spark):
    from pandas_ta_spark.sources.bars import bars_from_events_cached

    return (bars_from_events_cached(spark, SF_DIR).toPandas()
            .sort_values(["symbol", "ts"]).reset_index(drop=True))


def test_ret_autocorr_matches_numpy(spark):
    from pandas_ta_spark.ext.relational import SUITE

    got = (SUITE["ret_autocorr_24"].query(spark, SF_DIR).toPandas()
           .sort_values(["symbol", "ts"]).reset_index(drop=True))
    bars = _bars_pdf(spark)

    frames = []
    for sym, g in bars.groupby("symbol", sort=True):
        c = g["close"].to_numpy()
        q = _quant_log_ret(c)
        ql = np.concatenate([[np.nan], q[:-1]])
        pair = ~np.isnan(q) & ~np.isnan(ql)
        qi, yi = q.copy(), ql.copy()
        qi[~pair] = 0
        yi[~pair] = 0
        sx, n = _win_sums(qi, pair, N)
        sy, _ = _win_sums(yi, pair, N)
        sxy, _ = _win_sums(qi * yi, pair, N)
        sxx, _ = _win_sums(qi * qi, pair, N)
        syy, _ = _win_sums(yi * yi, pair, N)
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        ok = (n >= N) & (vx > 0) & (vy > 0)
        ac = np.where(ok, cov / np.sqrt(vx.astype(float) * vy.astype(float)),
                      np.nan)
        frames.append(pd.DataFrame(
            {"symbol": sym, "ts": g["ts"].to_numpy(), "n_obs": n,
             "autocorr": _rounded(ac)}))
    exp = pd.concat(frames, ignore_index=True)

    assert got["n_obs"].tolist() == exp["n_obs"].tolist()
    ga, ea = got["autocorr"].to_numpy(), exp["autocorr"].to_numpy()
    assert np.array_equal(np.isnan(ga), np.isnan(ea))
    assert np.nanmax(np.abs(ga - ea), initial=0.0) <= 2e-5


def test_variance_ratio_matches_numpy(spark):
    from pandas_ta_spark.ext.relational import SUITE, VR_Q

    got = (SUITE["variance_ratio_5_24"].query(spark, SF_DIR).toPandas()
           .sort_values(["symbol", "ts"]).reset_index(drop=True))
    bars = _bars_pdf(spark)

    frames = []
    for sym, g in bars.groupby("symbol", sort=True):
        c = g["close"].to_numpy()
        q1 = _quant_log_ret(c, 1)
        qq = _quant_log_ret(c, VR_Q)
        pair = ~np.isnan(q1) & ~np.isnan(qq)
        a, b = q1.copy(), qq.copy()
        a[~pair] = 0
        b[~pair] = 0
        sx, n = _win_sums(a, pair, N)
        sy, _ = _win_sums(b, pair, N)
        sxx, _ = _win_sums(a * a, pair, N)
        syy, _ = _win_sums(b * b, pair, N)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        ok = (n >= N) & (vx > 0)
        vr = np.where(ok, vy.astype(float) / (VR_Q * vx.astype(float)),
                      np.nan)
        frames.append(pd.DataFrame(
            {"symbol": sym, "n_obs": n, "vr": _rounded(vr)}))
    exp = pd.concat(frames, ignore_index=True)

    assert got["n_obs"].tolist() == exp["n_obs"].tolist()
    gv, ev = got["vr"].to_numpy(), exp["vr"].to_numpy()
    assert np.array_equal(np.isnan(gv), np.isnan(ev))
    assert np.nanmax(np.abs(gv - ev), initial=0.0) <= 2e-5
    # regime sanity: VR is positive wherever defined
    assert np.nanmin(gv, initial=np.inf) > 0


def test_lead_lag_matches_pandas(spark):
    from pandas_ta_spark.ext.relational import SUITE

    got = (SUITE["lead_lag_corr_1h"].query(spark, SF_DIR).toPandas()
           .sort_values(["leader", "follower"]).reset_index(drop=True))
    bars = _bars_pdf(spark)

    parts = []
    for sym, g in bars.groupby("symbol", sort=True):
        q = _quant_log_ret(g["close"].to_numpy())
        parts.append(pd.DataFrame({
            "symbol": sym, "ts": g["ts"].to_numpy(), "q": q,
            "ql": np.concatenate([[np.nan], q[:-1]])}))
    rets = pd.concat(parts, ignore_index=True)
    foll = rets[["symbol", "ts", "q"]].rename(columns={"symbol": "follower"})
    lead = rets[["symbol", "ts", "ql"]].rename(columns={"symbol": "leader"})
    j = foll.merge(lead, on="ts")
    j = j[(j.leader != j.follower) & j.q.notna() & j.ql.notna()]
    rows = []
    for (ld, fl), g in j.groupby(["leader", "follower"], sort=True):
        x = g["q"].to_numpy().astype(np.int64)
        y = g["ql"].to_numpy().astype(np.int64)
        n = len(x)
        cov = n * (x * y).sum() - x.sum() * y.sum()
        vx = n * (x * x).sum() - x.sum() ** 2
        vy = n * (y * y).sum() - y.sum() ** 2
        corr = (cov / np.sqrt(float(vx) * float(vy))
                if n >= 2 and vx > 0 and vy > 0 else np.nan)
        rows.append((ld, fl, n, _rounded(corr)))
    exp = pd.DataFrame(
        rows, columns=["leader", "follower", "n_obs", "leadlag_corr"])

    assert got["leader"].tolist() == exp["leader"].tolist()
    assert got["follower"].tolist() == exp["follower"].tolist()
    assert got["n_obs"].tolist() == exp["n_obs"].tolist()
    gv = got["leadlag_corr"].to_numpy()
    ev = exp["leadlag_corr"].to_numpy()
    assert np.array_equal(np.isnan(gv), np.isnan(ev))
    assert np.nanmax(np.abs(gv - ev), initial=0.0) <= 2e-5


def test_hourly_seasonality_matches_pandas(spark):
    from pandas_ta_spark.ext.relational import SUITE

    got = (SUITE["hourly_seasonality"].query(spark, SF_DIR).toPandas()
           .sort_values(["symbol", "hod"]).reset_index(drop=True))
    bars = _bars_pdf(spark)

    parts = []
    for sym, g in bars.groupby("symbol", sort=True):
        aq = np.abs(_quant_log_ret(g["close"].to_numpy()))
        parts.append(pd.DataFrame({
            "symbol": sym, "hod": g["ts"].dt.hour.to_numpy(),
            "aq": aq, "vol": g["volume"].to_numpy()}))
    df = pd.concat(parts, ignore_index=True)
    # volume averages over ALL bars; returns only over bars with a lag
    exp = (df.groupby(["symbol", "hod"], sort=True)
           .agg(n_bars=("vol", "size"), n_rets=("aq", "count"),
                saq=("aq", "sum"), sv=("vol", "sum"))
           .reset_index())

    assert got["n_bars"].tolist() == exp["n_bars"].tolist()
    assert got["n_rets"].tolist() == exp["n_rets"].tolist()
    assert np.allclose(
        got["mean_abs_ret"],
        _rounded(exp["saq"] / exp["n_rets"] / SCALE), atol=1e-9)
    assert np.allclose(
        got["mean_volume"],
        _rounded(exp["sv"] / exp["n_bars"]), atol=1e-9)


def test_drawdown_episodes_planted(spark):
    """Episode boundaries on a hand-built series: recovery bars (close at
    a new/equal running high) split episodes; depth is vs the high that
    STARTED the episode; a final unrecovered run still emits."""
    from pandas_ta_spark.ext.relational import drawdown_episodes

    t0 = pd.Timestamp("2024-01-01")
    closes = [5.0, 4.0, 3.0, 5.0, 2.0, 6.0, 1.0]
    pdf = pd.DataFrame({
        "symbol": "A",
        "ts": [t0 + pd.Timedelta(hours=i) for i in range(len(closes))],
        "close": closes,
    })
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    out = (drawdown_episodes(spark.createDataFrame(pdf)).toPandas()
           .sort_values("episode").reset_index(drop=True))

    # ep1: bars 1-2 under the close-5 high, deepest 5-3=2
    # ep2: bar 4 under the (revisited) 5 high, deepest 3
    # ep3: bar 6 under the 6 high, deepest 5 — never recovers, still a row
    assert len(out) == 3
    assert out["n_bars"].tolist() == [2, 1, 1]
    assert out["max_dd"].tolist() == [2.0, 3.0, 5.0]
    assert out.loc[0, "start_ts"] == pdf.ts[1]
    assert out.loc[0, "end_ts"] == pdf.ts[2]
    assert out.loc[2, "start_ts"] == pdf.ts[6]


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().strip(" ").split(" ") if t != ""]


def test_lexical_diversity_matches_python(spark):
    from collections import Counter

    from pandas_ta_spark.ext.text import SUITE

    got = (SUITE["lexical_diversity"].query(spark, SF_DIR).toPandas()
           .sort_values("source").reset_index(drop=True))
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    rows = []
    for src, g in docs.groupby("source", sort=True):
        c = Counter(t for txt in g["text"] for t in _tokens(txt))
        n_tok = sum(c.values())
        n_typ = len(c)
        n_hap = sum(1 for v in c.values() if v == 1)
        rows.append((src, n_tok, n_typ, n_hap,
                     _rounded(n_typ / n_tok), _rounded(n_hap / n_typ)))
    exp = pd.DataFrame(rows, columns=[
        "source", "n_tokens", "n_types", "n_hapax", "ttr", "hapax_share"])

    assert got["source"].tolist() == exp["source"].tolist()
    for col in ("n_tokens", "n_types", "n_hapax"):
        assert got[col].tolist() == exp[col].tolist()
    assert np.allclose(got["ttr"], exp["ttr"], atol=1e-9)
    assert np.allclose(got["hapax_share"], exp["hapax_share"], atol=1e-9)


def test_unigram_kl_matches_python(spark):
    """Third-way recompute with the same per-term 1e-9 quantization and
    the same tail decomposition; also KL >= 0 within quantization noise
    (Gibbs' inequality) and KL(corpus slice that IS the corpus) -> 0."""
    from collections import Counter

    from pandas_ta_spark.ext.text import SUITE

    got = (SUITE["unigram_kl_by_source"].query(spark, SF_DIR).toPandas()
           .sort_values("source").reset_index(drop=True))
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    per_src: dict[str, Counter] = {}
    corpus: Counter = Counter()
    for src, g in docs.groupby("source", sort=True):
        c = Counter(t for txt in g["text"] for t in _tokens(txt))
        per_src[src] = c
        corpus.update(c)
    n = sum(corpus.values())

    rows = []
    for src in sorted(per_src):
        c = per_src[src]
        ns = sum(c.values())
        s9 = 0
        for tok, cst in c.items():
            p = cst / ns
            s9 += int(np.floor(
                p * (np.log(p) - np.log(float(corpus[tok]))) * 1e9 + 0.5))
        rows.append((src, ns, len(c),
             _rounded((s9 / 1e9 + np.log(float(n)))
                      / 0.6931471805599453)))
    exp = pd.DataFrame(rows, columns=[
        "source", "n_tokens", "n_types", "kl_bits"])

    assert got["source"].tolist() == exp["source"].tolist()
    assert got["n_tokens"].tolist() == exp["n_tokens"].tolist()
    assert got["n_types"].tolist() == exp["n_types"].tolist()
    assert np.allclose(got["kl_bits"], exp["kl_bits"], atol=2e-6)
    assert (got["kl_bits"] >= -1e-6).all()  # Gibbs, up to quantization


def test_streaming_ret_autocorr_matches_batch(spark, tmp_path):
    """The streaming twin (26-close ring buffer, applyInPandasWithState)
    must reproduce the batch windowed statistic bit-for-bit across
    micro-batch boundaries, per symbol — including the unsaturated-buffer
    warm-up rows that straddle the chunk split."""
    from pandas_ta_spark.ext.relational import ret_autocorr
    from pandas_ta_spark.streaming import streaming_ret_autocorr

    rng = np.random.default_rng(11)
    frames = []
    t0 = pd.Timestamp("2024-01-01")
    for sym in ("A", "B"):
        n = 90
        close = np.round(np.exp(np.cumsum(rng.normal(0, 0.02, n))) * 50, 4)
        frames.append(pd.DataFrame({
            "symbol": sym,
            "ts": [t0 + pd.Timedelta(hours=i) for i in range(n)],
            "close": close}))
    bars = pd.concat(frames, ignore_index=True)
    bars["ts"] = bars["ts"].astype("datetime64[ms]")

    src = tmp_path / "rac_src"
    src.mkdir()
    # split INSIDE the rolling window so state must carry the buffer
    bars.groupby("symbol").head(40).to_parquet(src / "p1.parquet")
    bars.groupby("symbol").tail(50).to_parquet(src / "p2.parquet")

    stream = (
        spark.readStream.schema("symbol string, ts timestamp, close double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_ret_autocorr(stream)
        .writeStream.format("memory").queryName("rac_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (spark.sql("SELECT * FROM rac_stream").toPandas()
           .sort_values(["symbol", "ts"]).reset_index(drop=True))

    exp = (ret_autocorr(spark.createDataFrame(bars)).toPandas()
           .sort_values(["symbol", "ts"]).reset_index(drop=True))

    assert len(got) == len(exp) == 180
    assert got["symbol"].tolist() == exp["symbol"].tolist()
    assert got["n_obs"].tolist() == exp["n_obs"].tolist()
    ga, ea = got["autocorr"].to_numpy(), exp["autocorr"].to_numpy()
    assert np.array_equal(np.isnan(ga), np.isnan(ea))
    # python math.log vs JVM ln can differ by 1 ulp at a floor boundary
    assert np.nanmax(np.abs(ga - ea), initial=0.0) <= 2e-5


def test_streaming_variance_ratio_matches_batch(spark, tmp_path):
    """The VR twin shares the rolling-buffer runner with the autocorr
    twin (different pair + tail); parity with the batch op across a
    chunk split that lands inside the 29-close buffer."""
    from pandas_ta_spark.ext.relational import variance_ratio
    from pandas_ta_spark.streaming import streaming_variance_ratio

    rng = np.random.default_rng(23)
    frames = []
    t0 = pd.Timestamp("2024-01-01")
    for sym in ("A", "B"):
        n = 80
        close = np.round(np.exp(np.cumsum(rng.normal(0, 0.03, n))) * 20, 4)
        frames.append(pd.DataFrame({
            "symbol": sym,
            "ts": [t0 + pd.Timedelta(hours=i) for i in range(n)],
            "close": close}))
    bars = pd.concat(frames, ignore_index=True)
    bars["ts"] = bars["ts"].astype("datetime64[ms]")

    src = tmp_path / "vr_src"
    src.mkdir()
    bars.groupby("symbol").head(35).to_parquet(src / "p1.parquet")
    bars.groupby("symbol").tail(45).to_parquet(src / "p2.parquet")

    stream = (
        spark.readStream.schema("symbol string, ts timestamp, close double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_variance_ratio(stream)
        .writeStream.format("memory").queryName("vr_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (spark.sql("SELECT * FROM vr_stream").toPandas()
           .sort_values(["symbol", "ts"]).reset_index(drop=True))

    exp = (variance_ratio(spark.createDataFrame(bars)).toPandas()
           .sort_values(["symbol", "ts"]).reset_index(drop=True))

    assert len(got) == len(exp) == 160
    assert got["n_obs"].tolist() == exp["n_obs"].tolist()
    gv, ev = got["vr"].to_numpy(), exp["vr"].to_numpy()
    assert np.array_equal(np.isnan(gv), np.isnan(ev))
    assert np.nanmax(np.abs(gv - ev), initial=0.0) <= 2e-5


def test_streaming_drawdown_episodes_matches_batch(spark, tmp_path):
    """O(1)-state episode monitor: every episode that CLOSES before
    end-of-stream must equal the batch manifest row exactly (id, span,
    depth), across a chunk split landing mid-episode; the still-open
    final episode stays in state (documented append-mode contract)."""
    from pandas_ta_spark.ext.relational import drawdown_episodes
    from pandas_ta_spark.streaming import streaming_drawdown_episodes

    rng = np.random.default_rng(31)
    frames = []
    t0 = pd.Timestamp("2024-01-01")
    for sym in ("A", "B"):
        n = 120
        close = np.round(np.exp(np.cumsum(rng.normal(0, 0.05, n))) * 10, 4)
        frames.append(pd.DataFrame({
            "symbol": sym,
            "ts": [t0 + pd.Timedelta(hours=i) for i in range(n)],
            "close": close}))
    bars = pd.concat(frames, ignore_index=True)
    bars["ts"] = bars["ts"].astype("datetime64[ms]")

    src = tmp_path / "dd_src"
    src.mkdir()
    bars.groupby("symbol").head(55).to_parquet(src / "p1.parquet")
    bars.groupby("symbol").tail(65).to_parquet(src / "p2.parquet")

    stream = (
        spark.readStream.schema("symbol string, ts timestamp, close double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_drawdown_episodes(stream)
        .writeStream.format("memory").queryName("dd_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = (spark.sql("SELECT * FROM dd_stream").toPandas()
           .sort_values(["symbol", "episode"]).reset_index(drop=True))

    exp = (drawdown_episodes(spark.createDataFrame(bars)).toPandas()
           .sort_values(["symbol", "episode"]).reset_index(drop=True))
    # drop per symbol any final episode still open at end-of-stream:
    # open iff the episode's end is the series' last bar (underwater
    # with no later recovery bar)
    last_ts = bars.groupby("symbol")["ts"].max()
    keep = [r.end_ts != last_ts[r.symbol] for _, r in exp.iterrows()]
    exp = exp[np.array(keep)].reset_index(drop=True)

    assert len(got) == len(exp) > 0
    for col in ("symbol", "episode", "n_bars"):
        assert got[col].tolist() == exp[col].tolist()
    assert got["start_ts"].tolist() == exp["start_ts"].tolist()
    assert got["end_ts"].tolist() == exp["end_ts"].tolist()
    assert np.allclose(got["max_dd"], exp["max_dd"], atol=1e-9)


def test_embedding_norm_by_label_no_int64_overflow(spark, tmp_path):
    """Regression pin for the 128-bit moment sums: a label with 4000
    unit-norm vectors drives n*sq and s*s past int64 (~9.2e18) — the
    wrapped arithmetic produced sqrt(negative) -> NaN std before the
    DECIMAL(38,0)/HUGEINT fix, while DuckDB silently promoted."""
    import duckdb

    from pandas_ta_spark.ext.similarity import (
        NORM_BY_LABEL_SQL,
        SUITE,
    )

    rng = np.random.default_rng(7)
    n, dim = 4000, 8
    v = rng.normal(size=(n, dim))
    v /= np.linalg.norm(v, axis=1, keepdims=True)  # exact-ish unit norms
    pdf = pd.DataFrame({
        "vec_id": np.arange(n),
        "embedding": [row.astype(np.float32) for row in v],
        "label": np.int32(1),
    })
    d = tmp_path / "ovf"
    d.mkdir()
    pdf.to_parquet(d / "embeddings.parquet")

    got = SUITE["embedding_norm_by_label"].query(spark, str(d)).toPandas()
    assert len(got) == 1
    assert got.loc[0, "n_vecs"] == n
    assert 0.99 < got.loc[0, "mean_norm"] < 1.01
    assert np.isfinite(got.loc[0, "std_norm"])      # NaN under int64 wrap
    assert got.loc[0, "std_norm"] >= 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM '{d / 'embeddings.parquet'}'")
    oracle = con.execute(NORM_BY_LABEL_SQL).fetchdf()
    assert abs(got.loc[0, "std_norm"] - oracle.loc[0, "std_norm"]) <= 1e-9
    assert abs(got.loc[0, "mean_norm"] - oracle.loc[0, "mean_norm"]) <= 1e-9


def test_bucketing_is_session_timezone_independent(spark):
    """15-minute buckets and hour-coverage audits must treat naive
    timestamps as-is: under a half-hour-offset session timezone the old
    unix_micros(CAST(ts AS TIMESTAMP)) round-trip shifted every bucket
    boundary by 30 minutes (and silently emitted a TZ-typed column)."""
    from pyspark.sql import functions as F

    from pandas_ta_spark.ext.relational import SUITE
    from pandas_ta_spark.sources.bars import bars_from_events_bucketed

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        b = bars_from_events_bucketed(spark, SF_DIR, minutes=15)
        mins = (b.select(F.minute("ts").alias("m")).distinct().toPandas()
                ["m"].sort_values().tolist())
        # naive quarter-hour boundaries — a +5:30 interpretation would
        # land them on :15/:45-shifted phases via the +30min offset
        assert set(mins) <= {0, 15, 30, 45}
        assert dict(b.dtypes)["ts"] == "timestamp_ntz"

        si = (SUITE["series_integrity"].query(spark, SF_DIR).toPandas()
              .sort_values("symbol").reset_index(drop=True))
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        si_utc = (SUITE["series_integrity"].query(spark, SF_DIR).toPandas()
                  .sort_values("symbol").reset_index(drop=True))
        for col in ("n_hours_present", "n_hours_span", "n_hour_gaps"):
            assert si[col].tolist() == si_utc[col].tolist()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_streaming_state_fold_survives_multi_chunk_groups(spark, tmp_path):
    """applyInPandasWithState hands big groups over as multiple arrow
    chunks in shuffle order; before the _one_chunk concat the per-chunk
    sorts appended closes to the ring buffer out of ts order. Force
    tiny chunks and assert the autocorr twin still matches batch."""
    from pandas_ta_spark.ext.relational import ret_autocorr
    from pandas_ta_spark.streaming import streaming_ret_autocorr

    rng = np.random.default_rng(43)
    n = 400
    t0 = pd.Timestamp("2024-01-01")
    bars = pd.DataFrame({
        "symbol": "A",
        "ts": [t0 + pd.Timedelta(hours=i) for i in range(n)],
        "close": np.round(np.exp(np.cumsum(rng.normal(0, 0.02, n))) * 50, 4),
    })
    bars["ts"] = bars["ts"].astype("datetime64[ms]")
    src = tmp_path / "chunk_src"
    src.mkdir()
    # shuffle row order on disk too: chunk boundaries then split the
    # group at arbitrary (non-ts) positions
    bars.sample(frac=1, random_state=1).to_parquet(src / "p1.parquet")

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
        stream = (spark.readStream
                  .schema("symbol string, ts timestamp, close double")
                  .parquet(str(src)))
        q = (streaming_ret_autocorr(stream)
             .writeStream.format("memory").queryName("chunk_stream")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got = (spark.sql("SELECT * FROM chunk_stream").toPandas()
           .sort_values("ts").reset_index(drop=True))
    exp = (ret_autocorr(spark.createDataFrame(bars)).toPandas()
           .sort_values("ts").reset_index(drop=True))
    assert len(got) == n
    assert got["n_obs"].tolist() == exp["n_obs"].tolist()
    ga, ea = got["autocorr"].to_numpy(), exp["autocorr"].to_numpy()
    assert np.array_equal(np.isnan(ga), np.isnan(ea))
    assert np.nanmax(np.abs(ga - ea), initial=0.0) <= 2e-5


def test_strategy_duplicate_kind_different_params(spark):
    """Two instances of one indicator kind with different params in one
    strategy must each compute from their OWN windows: before temps were
    parameterized, the layer merge silently computed both hilo outputs
    from the second instance's midpoint lengths."""
    import pandas as pd

    from pandas_ta_spark.plans.strategy import apply_strategy
    from pandas_ta_spark.registry import make
    from tests.conftest import make_pdf

    bars = spark.createDataFrame(make_pdf(200))
    both = (apply_strategy(bars, [make("hilo", high_length=13, low_length=21),
                                  make("hilo", high_length=5, low_length=8)])
            .toPandas().sort_values("ts").reset_index(drop=True))
    solo = (apply_strategy(bars, [make("hilo", high_length=5, low_length=8)])
            .toPandas().sort_values("ts").reset_index(drop=True))
    solo13 = (apply_strategy(bars, [make("hilo", high_length=13,
                                         low_length=21)])
              .toPandas().sort_values("ts").reset_index(drop=True))
    pd.testing.assert_series_equal(both["HILO_5_8"], solo["HILO_5_8"])
    pd.testing.assert_series_equal(both["HILO_13_21"], solo13["HILO_13_21"])
    # the two parameterizations genuinely differ on this fixture
    assert not both["HILO_13_21"].round(6).equals(both["HILO_5_8"].round(6))

    # future indicators with unparameterized temps fail LOUDLY
    import pytest
    from pyspark.sql import functions as F

    from pandas_ta_spark.operators.base import Indicator

    def fake(n):
        return Indicator("fake", [f"OUT_{n}"], "test",
                         stages=[{"_fake_tmp": F.lit(float(n))}],
                         final={f"OUT_{n}": F.col("_fake_tmp")})

    with pytest.raises(ValueError, match="_fake_tmp"):
        apply_strategy(bars, [fake(1), fake(2)])


def test_dirty_close_yields_invalid_rows_not_fake_zeros(spark):
    """ADVICE r8 (medium): every log-return quantization in relational.py
    must go through the shared _qlog guard, so a zero/NaN/inf close makes
    the affected returns INVALID (NULL) instead of Spark's non-ANSI
    floor(NaN)::long fabricating a 0 return while the DuckDB twin
    hard-errors and the streaming twins drop the row.

    The guard's semantics are exactly "dirty close == NULL close": both
    return legs touching the bar become NULL and every downstream window
    statistic sees one fewer complete pair. So the pin is an equality:
    each op over bars with planted dirty closes must equal the same op
    over bars where those closes are NULL."""
    from pandas_ta_spark.ext.relational import (
        lead_lag_corr,
        ret_autocorr,
        variance_ratio,
    )

    t0 = pd.Timestamp("2024-01-01")
    frames = []
    for sym, seed in (("A", 3), ("B", 4)):
        rng = np.random.default_rng(seed)
        c = 100 + np.cumsum(rng.normal(0, 1, 120))
        frames.append(pd.DataFrame(
            {"symbol": sym, "ts": pd.date_range(t0, periods=120, freq="h"),
             "open": c, "high": c + 0.5, "low": c - 0.5, "close": c,
             "volume": 7.0}))
    pdf = pd.concat(frames, ignore_index=True)
    dirty = pdf.copy()
    dirty.loc[40, "close"] = 0.0          # DuckDB ln(0) class
    dirty.loc[80, "close"] = float("nan")  # floor(NaN)::long class
    dirty.loc[150, "close"] = float("inf")  # saturating-cast class
    nulled = pdf.copy()
    nulled.loc[[40, 80, 150], "close"] = None

    for op in (ret_autocorr, variance_ratio, lead_lag_corr):
        got = (op(spark.createDataFrame(dirty)).toPandas()
               .sort_values(list(op(spark.createDataFrame(dirty)).columns))
               .reset_index(drop=True))
        want = (op(spark.createDataFrame(nulled)).toPandas()
                .sort_values(list(got.columns)).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # and the dirty rows really did invalidate something: fewer
        # complete pairs than the clean series would have
        clean = op(spark.createDataFrame(pdf)).toPandas()
        assert got["n_obs"].sum() < clean["n_obs"].sum()
