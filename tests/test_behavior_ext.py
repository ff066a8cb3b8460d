"""Edge-case and parity tests for the r8 behavior/resample/mix ops.

The oracle gate (tools/check.py) proves cross-engine equality on the
driver tables; these tests prove the SEMANTICS on planted inputs the
synthetic corpus may never hit — same-instant attribution ties, missing
bar hours, zero-count outage flagging — plus independent pandas/numpy
recomputation of the full RFM and temperature-mix outputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest  # noqa: F401  (fixtures)

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _ts(s: str):
    return pd.Timestamp(s).to_pydatetime()


def test_attribution_last_touch_semantics(spark):
    """Strictly-before rule, max-event_id tie-break, NULL for
    click-less purchases."""
    from pandas_ta_spark.ext.behavior import attribution_last_touch

    rows = [
        # user 1: click at the SAME instant as the purchase must NOT
        # attribute (strictly before); the later purchase attributes the
        # 10:00 click
        (1, 1, _ts("2024-01-01 10:00:00"), "click"),
        (2, 1, _ts("2024-01-01 10:00:00"), "purchase"),
        (3, 1, _ts("2024-01-01 10:05:00"), "purchase"),
        # user 2: purchase with no click ever -> NULLs
        (4, 2, _ts("2024-01-01 09:00:00"), "purchase"),
        # user 3: two clicks at one instant -> the higher event_id wins
        (5, 3, _ts("2024-01-01 11:00:00"), "click"),
        (6, 3, _ts("2024-01-01 11:00:00"), "click"),
        (7, 3, _ts("2024-01-01 11:01:00"), "purchase"),
        # noise: views never attribute
        (8, 1, _ts("2024-01-01 10:04:00"), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    out = (attribution_last_touch(ev).toPandas()
           .set_index("event_id").sort_index())

    assert out.index.tolist() == [2, 3, 4, 7]
    assert pd.isna(out.loc[2, "click_event_id"])  # same-instant excluded
    assert out.loc[3, "click_event_id"] == 1
    assert out.loc[3, "gap_us"] == 5 * 60 * 1_000_000
    assert pd.isna(out.loc[4, "click_event_id"])
    assert out.loc[7, "click_event_id"] == 6  # tie -> max event_id


def test_bars_gapfill_planted_gap(spark):
    """A missing bar hour gets the carried close, zero volume, and the
    gap flag; present hours pass through."""
    from pandas_ta_spark.ext.relational import bars_gapfill

    rows = [
        ("A", _ts("2024-01-01 00:00:00"), 10.0, 5.0),
        # 01:00 missing (halt)
        ("A", _ts("2024-01-01 02:00:00"), 12.0, 3.0),
        ("B", _ts("2024-01-01 00:00:00"), 7.0, 1.0),
    ]
    bars = spark.createDataFrame(
        rows, "symbol string, ts timestamp, close double, volume double")
    out = (bars_gapfill(bars).toPandas()
           .sort_values(["symbol", "h"]).reset_index(drop=True))

    a = out[out["symbol"] == "A"]
    assert len(a) == 3  # full spine 00..02
    assert a["is_gap"].tolist() == [0, 1, 0]
    assert a["close_ff"].tolist() == [10.0, 10.0, 12.0]  # ffill across gap
    assert a["volume"].tolist() == [5.0, 0.0, 3.0]  # empty hour trades 0
    b = out[out["symbol"] == "B"]
    assert len(b) == 1 and b["is_gap"].iloc[0] == 0


def test_bars_gapfill_null_close_bar_cross_engine(spark):
    """ADVICE r8: is_gap must test bar EXISTENCE on both engines — a
    present bar carrying a NULL close is is_gap=0 with the last
    non-NULL close carried over it, in Spark AND in the DuckDB twin
    (whose bars CTE is swapped for the same planted relation here)."""
    import duckdb

    from pandas_ta_spark.ext.relational import BARS_GAPFILL_SQL, bars_gapfill

    rows = [
        # LEADING NULL close: spine rows before the first valid close
        # must still exist in BOTH engines (the twin's close-filtered
        # ASOF side needs ASOF LEFT JOIN — inner ASOF drops them)
        ("A", _ts("2023-12-31 23:00:00"), None, 1.0),
        ("A", _ts("2024-01-01 00:00:00"), 10.0, 5.0),
        ("A", _ts("2024-01-01 01:00:00"), None, 2.0),  # present, NULL close
        # 02:00 missing (halt)
        ("A", _ts("2024-01-01 03:00:00"), 12.0, 3.0),
    ]
    bars = spark.createDataFrame(
        rows, "symbol string, ts timestamp, close double, volume double")
    got = (bars_gapfill(bars).toPandas()
           .sort_values("h").reset_index(drop=True))
    assert got["is_gap"].tolist() == [0, 0, 0, 1, 0]
    assert got["close_ff"].isna().tolist() == [True, False, False, False,
                                               False]
    assert got["close_ff"].tolist()[1:] == [10.0, 10.0, 10.0, 12.0]
    assert got["volume"].tolist() == [1.0, 5.0, 2.0, 0.0, 3.0]

    # the twin, over the same planted bars (CTE body swapped)
    suffix = BARS_GAPFILL_SQL[BARS_GAPFILL_SQL.index(", span"):]
    sql = "WITH bars AS (SELECT * FROM planted_bars)\n" + suffix
    con = duckdb.connect()
    con.register("planted_bars", pd.DataFrame(
        rows, columns=["symbol", "ts", "close", "volume"]))
    odf = con.execute(sql).df().sort_values("h").reset_index(drop=True)
    assert len(odf) == len(got)  # inner ASOF would drop the leading row
    assert odf["is_gap"].tolist() == got["is_gap"].tolist()
    pd.testing.assert_series_equal(odf["close_ff"], got["close_ff"],
                                   check_dtype=False, check_exact=True)
    assert odf["volume"].tolist() == got["volume"].tolist()


def test_rate_anomaly_outage_and_spike_flagged(spark):
    """The zero-filled outage hour and the spike hour must both flag;
    ordinary jitter must not."""
    from pandas_ta_spark.ext.behavior import rate_anomaly

    rows = []
    eid = 0
    base = _ts("2024-01-01 00:00:00")
    for h in range(41):
        if h == 20:
            continue  # planted outage: no events at all this hour
        n = 100 if h == 30 else (9, 10, 11)[h % 3]  # spike at h=30
        for i in range(n):
            rows.append(("api", base + pd.Timedelta(hours=h, seconds=i)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = (rate_anomaly(ev).toPandas()
           .sort_values("h").reset_index(drop=True))

    assert len(out) == 41  # zero-filled spine, not 40 present hours
    outage = out[out["h"] == base + pd.Timedelta(hours=20)].iloc[0]
    spike = out[out["h"] == base + pd.Timedelta(hours=30)].iloc[0]
    assert outage["n"] == 0 and outage["is_anomaly"] == 1
    assert spike["n"] == 100 and spike["is_anomaly"] == 1
    assert out["is_anomaly"].sum() == 2  # jitter hours stay quiet
    assert out["robust_z"].notna().all()  # mad > 0 here


def test_rfm_parity_vs_pandas(spark):
    """Full-frame parity of metrics, quintile scores, and segment labels
    against an independent pandas/numpy recomputation (numpy 'linear'
    quantiles == SQL interpolated percentile)."""
    from pandas_ta_spark.ext.behavior import RFM_QS, _rfm

    got = (_rfm(spark, SF_DIR).toPandas()
           .sort_values("user_id").reset_index(drop=True))

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    day = ev["ts"].dt.floor("D")
    anchor = day.max()
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64").where(
        ev["event_type"] == "purchase", 0)
    base = pd.DataFrame({
        "user_id": ev["user_id"], "day": day, "cents": cents,
    }).groupby("user_id").agg(
        last_day=("day", "max"), frequency=("day", "size"),
        monetary_cents=("cents", "sum"),
    ).reset_index()
    base["recency_days"] = (anchor - base["last_day"]).dt.days

    def scores(metric: pd.Series, lower_better: bool) -> pd.Series:
        b = np.quantile(metric.to_numpy(), RFM_QS, method="linear")
        if lower_better:
            return 1 + sum((metric.to_numpy() < bi).astype(int) for bi in b)
        return 1 + sum((metric.to_numpy() > bi).astype(int) for bi in b)

    base = base.sort_values("user_id").reset_index(drop=True)
    r = scores(base["recency_days"], True)
    f = scores(base["frequency"], False)
    m = scores(base["monetary_cents"], False)

    assert got["user_id"].tolist() == base["user_id"].tolist()
    assert got["recency_days"].tolist() == base["recency_days"].tolist()
    assert got["frequency"].tolist() == base["frequency"].tolist()
    assert got["monetary_cents"].tolist() == base["monetary_cents"].tolist()
    assert got["r_score"].tolist() == list(r)
    assert got["f_score"].tolist() == list(f)
    assert got["m_score"].tolist() == list(m)
    seg = np.where((r >= 4) & (f >= 4), "champion",
          np.where(r >= 4, "recent",
          np.where(f >= 4, "loyal_at_risk",
          np.where(m >= 4, "big_spender_lapsed", "hibernating"))))
    assert got["segment"].tolist() == list(seg)
    assert got["r_score"].between(1, 5).all()


def test_mix_temperature_parity_and_flattening(spark):
    """Exact parity vs numpy recomputation, plus the economics: sqrt
    temperature boosts rare languages (boost > 1) at the expense of the
    head (boost < 1), weights and shares each summing to ~1."""
    from pandas_ta_spark.ext.sampling import SQRT_SCALE, _mix_temperature

    got = (_mix_temperature(spark, SF_DIR).toPandas()
           .sort_values("lang").reset_index(drop=True))

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    n = docs.groupby("lang").size().sort_index()
    s = np.floor(np.sqrt(n.to_numpy().astype(float)) * SQRT_SCALE + 0.5)
    tot_n, tot_s = n.sum(), s.sum()

    def rnd(x):
        return np.floor(x * 1e6 + 0.5) / 1e6

    assert got["lang"].tolist() == list(n.index)
    assert got["n_docs"].tolist() == n.tolist()
    assert np.array_equal(got["share"], rnd(n.to_numpy() / tot_n))
    assert np.array_equal(got["weight"], rnd(s / tot_s))
    assert np.array_equal(
        got["expected_docs"], np.floor(s / tot_s * tot_n + 0.5))
    # flattening: smallest lang boosted hardest, largest suppressed
    srt = got.sort_values("n_docs")
    assert srt["boost"].iloc[0] > 1 > srt["boost"].iloc[-1]
    assert (srt["boost"].diff().dropna() <= 1e-12).all()  # monotone down
    assert abs(got["weight"].sum() - 1) < 1e-4
    assert abs(got["share"].sum() - 1) < 1e-4


def test_perplexity_bigram_flags_word_salad(spark, tmp_path):
    """Same tokens, shuffled order: the bigram LM must score the
    word-salad doc strictly higher (more surprising) than the
    in-distribution docs, while a unigram model cannot tell them apart.
    Also pins the <2-token drop rule."""
    import pandas as pd

    from pandas_ta_spark.ext.text import SUITE

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "the cat sat on the mat",
            "the cat sat on the mat",
            "the cat sat on the mat",
            "mat the on sat cat the",  # word salad: same bag of words
            "solo",                    # <2 tokens -> no bigrams, dropped
        ],
        "lang": ["en"] * 5,
        "source": ["s"] * 5,
        "n_chars": [22, 22, 22, 22, 4],
    })
    d = tmp_path / "ppl_docs"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet")

    out = (SUITE["perplexity_bigram"].query(spark, str(d)).toPandas()
           .set_index("doc_id").sort_index())
    assert out.index.tolist() == [0, 1, 2, 3]  # doc 4 dropped
    assert (out["n_bigrams"] == 5).all()
    normal = out.loc[0, "avg_neg_logp"]
    salad = out.loc[3, "avg_neg_logp"]
    assert salad > normal
    assert out.loc[1, "avg_neg_logp"] == normal == out.loc[2, "avg_neg_logp"]


def test_bars_gapfill_property_vs_pandas_resample(spark):
    """bars_gapfill IS the distributed resample('1h').ffill(): random
    gappy bar sets must match pandas' own resample semantics — ffilled
    close, zero-summed volume, empty buckets flagged — per symbol."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pandas_ta_spark.ext.relational import bars_gapfill

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.data())
    def check(data):
        rng = np.random.default_rng(data.draw(st.integers(0, 10_000)))
        t0 = pd.Timestamp("2024-01-01")
        frames = []
        for sym in ("A", "B", "C"):
            hours = np.sort(rng.choice(
                np.arange(200), size=int(rng.integers(2, 40)),
                replace=False))
            frames.append(pd.DataFrame({
                "symbol": sym,
                "ts": [t0 + pd.Timedelta(hours=int(h)) for h in hours],
                "close": np.round(rng.uniform(1, 100, len(hours)), 4),
                "volume": rng.integers(1, 50, len(hours)).astype(float),
            }))
        bars = pd.concat(frames, ignore_index=True)
        bars["ts"] = bars["ts"].astype("datetime64[us]")

        got = (bars_gapfill(spark.createDataFrame(bars)).toPandas()
               .sort_values(["symbol", "h"]).reset_index(drop=True))

        exp_frames = []
        for sym, g in bars.groupby("symbol"):
            r = g.set_index("ts").sort_index().resample("1h")
            exp_frames.append(pd.DataFrame({
                "symbol": sym,
                "h": r.size().index,
                "close_ff": r["close"].last().ffill().to_numpy(),
                "volume": r["volume"].sum().to_numpy(),
                "is_gap": (r.size() == 0).astype("int32").to_numpy(),
            }))
        exp = (pd.concat(exp_frames, ignore_index=True)
               .sort_values(["symbol", "h"]).reset_index(drop=True))

        assert got["symbol"].tolist() == exp["symbol"].tolist()
        assert got["h"].tolist() == exp["h"].tolist()
        assert np.allclose(got["close_ff"], exp["close_ff"], atol=1e-6)
        assert np.array_equal(got["volume"], exp["volume"])
        assert got["is_gap"].tolist() == exp["is_gap"].tolist()

    check()


def test_attribution_property_vs_pandas(spark):
    """Random interleaved click/purchase streams: attribution must equal
    an independent O(n^2)-free pandas recompute (per-user running max of
    (ts, event_id) over strictly-earlier clicks)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pandas_ta_spark.ext.behavior import attribution_last_touch

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.data())
    def check(data):
        rng = np.random.default_rng(data.draw(st.integers(0, 10_000)))
        t0 = pd.Timestamp("2024-01-01")
        n = int(rng.integers(20, 120))
        ev = pd.DataFrame({
            "event_id": np.arange(n, dtype="int64"),
            "user_id": rng.integers(1, 6, n).astype("int64"),
            # coarse second grid -> plenty of exact ts collisions
            "ts": [t0 + pd.Timedelta(seconds=int(s))
                   for s in rng.integers(0, 50, n)],
            "event_type": rng.choice(
                ["click", "purchase", "view"], n,
                p=[0.45, 0.35, 0.2]),
        })
        ev["ts"] = ev["ts"].astype("datetime64[us]")

        got = (attribution_last_touch(spark.createDataFrame(ev)).toPandas()
               .sort_values("event_id").reset_index(drop=True))

        rows = []
        for _, g in ev.groupby("user_id"):
            clicks = g[g["event_type"] == "click"]
            for _, p in g[g["event_type"] == "purchase"].iterrows():
                prior = clicks[clicks["ts"] < p["ts"]]
                if len(prior):
                    best = prior.sort_values(
                        ["ts", "event_id"]).iloc[-1]
                    rows.append((p["event_id"], p["user_id"], p["ts"],
                                 best["event_id"], best["ts"],
                                 (p["ts"] - best["ts"]).value // 1000))
                else:
                    rows.append((p["event_id"], p["user_id"], p["ts"],
                                 None, pd.NaT, None))
        exp = (pd.DataFrame(rows, columns=got.columns)
               .sort_values("event_id").reset_index(drop=True))

        assert got["event_id"].tolist() == exp["event_id"].tolist()
        for c in ("click_event_id", "click_ts", "gap_us"):
            a, b = got[c], exp[c]
            assert ((a == b) | (a.isna() & b.isna())).all(), c

    check()


def test_event_transition_matrix_planted(spark):
    """Same-instant events take the (ts, event_id) canonical order; rows
    normalize per from_type; single-event users contribute nothing."""
    from pandas_ta_spark.ext.behavior import event_transition_matrix

    rows = [
        # user 1: view -> click -> purchase
        (1, 1, _ts("2024-01-01 10:00:00"), "view"),
        (2, 1, _ts("2024-01-01 10:01:00"), "click"),
        (3, 1, _ts("2024-01-01 10:02:00"), "purchase"),
        # user 2: two same-instant events -> event_id order (view then
        # click), then an error
        (4, 2, _ts("2024-01-01 11:00:00"), "view"),
        (5, 2, _ts("2024-01-01 11:00:00"), "click"),
        (6, 2, _ts("2024-01-01 11:05:00"), "error"),
        # user 3: a single event, no transitions
        (7, 3, _ts("2024-01-01 12:00:00"), "view"),
        # user 4: view -> view (self-transition)
        (8, 4, _ts("2024-01-01 13:00:00"), "view"),
        (9, 4, _ts("2024-01-01 13:30:00"), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    out = (event_transition_matrix(ev).toPandas()
           .set_index(["from_type", "to_type"]).sort_index())

    assert out.loc[("view", "click"), "n"] == 2   # users 1 and 2
    assert out.loc[("click", "purchase"), "n"] == 1
    assert out.loc[("click", "error"), "n"] == 1
    assert out.loc[("view", "view"), "n"] == 1    # user 4
    assert ("purchase", "error") not in out.index
    # row-normalization: view fans out to click (2/3) and view (1/3)
    assert abs(out.loc[("view", "click"), "prob"] - 2 / 3) < 1e-6
    assert abs(out.loc[("view", "view"), "prob"] - 1 / 3) < 1e-6
    # click fans out 50/50
    assert abs(out.loc[("click", "purchase"), "prob"] - 0.5) < 1e-9
    # u1: 2 transitions, u2: 2, u3: 0, u4: 1
    assert int(out["n"].sum()) == 5


def test_conversion_lag_percentiles_exact_rank(spark, tmp_path):
    """The emitted percentiles are exact members of the gap multiset at
    sorted rank floor((n-1)*q)+1 — checked by independent recompute on
    the sf0.001 events."""
    import numpy as np

    from pandas_ta_spark.ext.behavior import SUITE

    sf = "/root/testdata/sf0.001"
    got = SUITE["conversion_lag_percentiles"].query(spark, sf).toPandas()
    att = (SUITE["attribution_last_touch"].query(spark, sf).toPandas())
    gaps = np.sort(att.loc[att.click_event_id.notna(), "gap_us"]
                   .to_numpy().astype(np.int64))
    n = len(gaps)
    assert got.loc[0, "n_conversions"] == n
    for q, col in ((0.5, "p50_gap_us"), (0.9, "p90_gap_us"),
                   (0.99, "p99_gap_us")):
        assert got.loc[0, col] == gaps[int(np.floor((n - 1) * q))]


def test_percentile_swap_boundary_parity(spark):
    """The size-gated approx_percentile branch (VERDICT r10 ask #3) is
    schema-identical and rank-consistent with the exact branch at the
    boundary: forcing each branch on the SAME corpus yields identical
    column names/dtypes, identical counts/ratios, each approx
    percentile an actual multiset member within one sorted rank of the
    exact pick (accuracy >> n), and RFM scores that move at most one
    notch for boundary-sitting users."""
    import numpy as np

    from pandas_ta_spark.ext.behavior import (
        SUITE, _conversion_lags, _rfm)
    from pandas_ta_spark.ext.relational import _session_stats

    sf = "/root/testdata/sf0.001"

    def rank_neighborhood(sorted_vals, q, got):
        idx = int(np.floor((len(sorted_vals) - 1) * q))
        lo, hi = max(0, idx - 1), min(len(sorted_vals) - 1, idx + 1)
        assert got in set(sorted_vals[lo:hi + 1].tolist()), (
            q, got, sorted_vals[lo:hi + 1])

    # conversion lags ----------------------------------------------------
    def names_types(df):
        return [(f.name, f.dataType) for f in df.schema.fields]

    ex = _conversion_lags(spark, sf, approx=False)
    ap = _conversion_lags(spark, sf, approx=True)
    assert names_types(ex) == names_types(ap)
    exp, app = ex.toPandas(), ap.toPandas()
    assert exp.loc[0, "n_conversions"] == app.loc[0, "n_conversions"]
    att = SUITE["attribution_last_touch"].query(spark, sf).toPandas()
    gaps = np.sort(att.loc[att.click_event_id.notna(), "gap_us"]
                   .to_numpy().astype(np.int64))
    for q, col in ((0.5, "p50_gap_us"), (0.9, "p90_gap_us"),
                   (0.99, "p99_gap_us")):
        rank_neighborhood(gaps, q, app.loc[0, col])

    # session stats ------------------------------------------------------
    ex = _session_stats(spark, sf, approx=False)
    ap = _session_stats(spark, sf, approx=True)
    assert names_types(ex) == names_types(ap)
    exp, app = ex.toPandas(), ap.toPandas()
    assert exp.loc[0, "n_sessions"] == app.loc[0, "n_sessions"]
    assert exp.loc[0, "mean_events"] == app.loc[0, "mean_events"]
    assert exp.loc[0, "bounce_share"] == app.loc[0, "bounce_share"]
    from pandas_ta_spark.ext.relational import _sessionize
    durs = np.sort(_sessionize(spark, sf).toPandas()["duration_sec"]
                   .to_numpy().astype(np.int64))
    for q, col in ((0.5, "p50_duration_sec"), (0.9, "p90_duration_sec")):
        rank_neighborhood(durs, q, app.loc[0, col])

    # RFM ----------------------------------------------------------------
    ex = _rfm(spark, sf, approx=False)
    ap = _rfm(spark, sf, approx=True)
    assert names_types(ex) == names_types(ap)
    exp = ex.toPandas().set_index("user_id").sort_index()
    app = ap.toPandas().set_index("user_id").sort_index()
    assert exp.index.equals(app.index)
    for m in ("recency_days", "frequency", "monetary_cents"):
        assert (exp[m] == app[m]).all()  # metrics identical, only
        #                                   boundaries move
    for s in ("r_score", "f_score", "m_score"):
        assert (exp[s] - app[s]).abs().max() <= 1
    assert app["segment"].isin(
        ["champion", "recent", "loyal_at_risk", "big_spender_lapsed",
         "hibernating"]).all()


def test_percentile_swap_auto_gate(spark):
    """approx=None auto-gates on Catalyst's input-size estimate: the
    tiny gate corpus stays on the oracle-checked exact plan (a
    SinglePartition full-row window), and shrinking the threshold to 0
    flips the SAME call to the sketch plan (no row_number window)."""
    from pandas_ta_spark.ext.relational import _session_stats
    from pandas_ta_spark.operators import base as B

    sf = "/root/testdata/sf0.001"
    plan_exact = (_session_stats(spark, sf)
                  ._jdf.queryExecution().optimizedPlan().toString())
    assert "row_number" in plan_exact
    old = B.PERCENTILE_EXACT_MAX_BYTES
    B.PERCENTILE_EXACT_MAX_BYTES = 0
    try:
        plan_approx = (_session_stats(spark, sf)
                       ._jdf.queryExecution().optimizedPlan().toString())
    finally:
        B.PERCENTILE_EXACT_MAX_BYTES = old
    assert "row_number" not in plan_approx
    assert "percentile_approx" in plan_approx


def test_active_users_daily_vs_pandas(spark):
    """DAU/WAU/stickiness recomputed independently in pandas (set algebra
    per day, brute-force trailing-7 union) on the sf0.001 events."""
    import numpy as np

    from pandas_ta_spark.ext.behavior import SUITE

    sf = "/root/testdata/sf0.001"
    got = (SUITE["active_users_daily"].query(spark, sf).toPandas()
           .sort_values("day").reset_index(drop=True))

    ev = pd.read_parquet(f"{sf}/events.parquet")[["user_id", "ts"]]
    ev["day"] = ev["ts"].dt.floor("D")
    by_day = {d: set(g["user_id"]) for d, g in ev.groupby("day")}
    days = sorted(by_day)
    rows = []
    for d in days:
        week = set()
        for k in range(7):
            week |= by_day.get(d - pd.Timedelta(days=k), set())
        rows.append((d, len(by_day[d]), len(week)))
    exp = pd.DataFrame(rows, columns=["day", "dau", "wau"])

    assert got["day"].tolist() == exp["day"].tolist()
    assert got["dau"].tolist() == exp["dau"].tolist()
    assert got["wau"].tolist() == exp["wau"].tolist()
    assert np.allclose(got["stickiness"],
                       np.floor(exp.dau / exp.wau * 1e6 + 0.5) / 1e6,
                       atol=1e-9)
