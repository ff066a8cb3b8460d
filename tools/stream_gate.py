"""Streaming parity gate (VERDICT r10 ask #4): a per-round ARTIFACT for
the streaming twins, equivalent to the CORRECTNESS rows the batch ops get.

Two sections, one JSON:

1. ``replay`` — drives each streaming twin (19 stateful indicator twins
   plus the corpus / panel / session / asof families) over the DRIVER
   corpus replayed as a micro-batch file stream (3 time-ordered parquet
   chunks, ``maxFilesPerTrigger=1``, availableNow), then compares its
   full output against the batch operator on the identical input:
   row counts, key alignment, exact non-float columns, float columns
   within each twin's documented tolerance (1e-9 for the arithmetic
   twins; 2e-5 for the ln-quantized family — python math.log vs JVM ln
   is 1 ulp at a floor boundary, see tests/test_regime_ext.py).
2. ``pytest`` — the full streaming parity pytest suite (the planted
   edge-case coverage: mid-window splits, replays, resubmission
   idempotency, cross-batch state), parsed from junit XML into
   per-test verdicts.

Usage:
    python tools/stream_gate.py [--round N] [--sf-dir DIR] [--skip-pytest]

Writes STREAM_r{N}.json at the repo root and exits non-zero if any twin
fails either section.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

BARS_DDL = ("symbol string, ts timestamp, open double, high double, "
            "low double, close double, volume double")


def _specs():
    """(name, stream_builder, batch_builder, key_cols, tol,
    batch_post) per twin. batch_builder returns the batch op SELECTED/
    RENAMED to the twin's output columns so the compare is by name."""
    from pyspark.sql import functions as F

    from pandas_ta_spark.ext import microstructure as MS
    from pandas_ta_spark.ext import relational as RL
    from pandas_ta_spark.operators.base import qcol
    from pandas_ta_spark.registry import make
    from pandas_ta_spark import streaming as ST

    def reg(kind, out_map, **params):
        def build(bars):
            df = make(kind, **params).apply(bars)
            return df.select(
                "symbol", "ts",
                *[qcol(src).alias(dst) for src, dst in out_map.items()])
        return build

    def drop_open_episodes(exp_pdf, bars_pdf):
        # the stream cannot emit an episode that is still underwater at
        # end-of-stream (documented append-mode contract)
        last_ts = bars_pdf.groupby("symbol")["ts"].max()
        keep = [r.end_ts != last_ts[r.symbol] for r in exp_pdf.itertuples()]
        return exp_pdf[keep].reset_index(drop=True)

    kts = ["symbol", "ts"]
    return [
        ("ema_10", lambda s: ST.streaming_ema(s, length=10),
         reg("ema", {"EMA_10": "ema"}, length=10), kts, 1e-9, None),
        ("rsi_14", lambda s: ST.streaming_rsi(s, length=14),
         reg("rsi", {"RSI_14": "rsi"}, length=14), kts, 1e-9, None),
        ("supertrend_7", lambda s: ST.streaming_supertrend(s, length=7),
         reg("supertrend",
             {"SUPERT_7_3.0": "supert", "SUPERTd_7_3.0": "supertd",
              "SUPERTl_7_3.0": "supertl", "SUPERTs_7_3.0": "superts"},
             length=7), kts, 1e-9, None),
        ("atr_14", lambda s: ST.streaming_atr(s, length=14),
         reg("atr", {"ATRr_14": "atr"}, length=14), kts, 1e-9, None),
        ("macd_12_26_9", lambda s: ST.streaming_macd(s),
         reg("macd", {"MACD_12_26_9": "macd", "MACDh_12_26_9": "macdh",
                      "MACDs_12_26_9": "macds"}), kts, 1e-9, None),
        ("bbands_5", lambda s: ST.streaming_bbands(s, length=5, std=2.0),
         reg("bbands", {"BBL_5_2.0": "bbl", "BBM_5_2.0": "bbm",
                        "BBU_5_2.0": "bbu"}, length=5), kts, 1e-9, None),
        ("donchian_20_20", lambda s: ST.streaming_donchian(s),
         reg("donchian", {"DCL_20_20": "dcl", "DCM_20_20": "dcm",
                          "DCU_20_20": "dcu"}), kts, 1e-9, None),
        ("parkinson_20", lambda s: ST.streaming_parkinson(s),
         lambda b: MS.parkinson(b), kts, 2e-5, None),
        ("yang_zhang_20", lambda s: ST.streaming_yang_zhang(s),
         lambda b: MS.yang_zhang(b), kts, 2e-5, None),
        ("var_cvar_95_100", lambda s: ST.streaming_var_cvar(s),
         lambda b: MS.var_cvar(b), kts, 2e-5, None),
        ("kyle_lambda_20", lambda s: ST.streaming_kyle_lambda(s),
         lambda b: MS.kyle_lambda(b), kts, 2e-5, None),
        ("ret_autocorr_24", lambda s: ST.streaming_ret_autocorr(s),
         lambda b: RL.ret_autocorr(b), kts, 2e-5, None),
        ("variance_ratio_5_24", lambda s: ST.streaming_variance_ratio(s),
         lambda b: RL.variance_ratio(b), kts, 2e-5, None),
        ("drawdown_episodes", lambda s: ST.streaming_drawdown_episodes(s),
         lambda b: RL.drawdown_episodes(b), ["symbol", "episode"], 1e-9,
         drop_open_episodes),
        # r12 (VERDICT r11 ask #6): the remaining KERNEL state machines
        ("psar", lambda s: ST.streaming_psar(s),
         reg("psar", {"PSARl_0.02_0.2": "psarl", "PSARs_0.02_0.2": "psars",
                      "PSARaf_0.02_0.2": "psaraf",
                      "PSARr_0.02_0.2": "psarr"}), kts, 1e-9, None),
        ("qqe_14_5", lambda s: ST.streaming_qqe(s),
         reg("qqe", {"QQE_14_5_4.236": "qqe",
                     "QQE_14_5_4.236_RSIMA": "rsima",
                     "QQEl_14_5_4.236": "qqel",
                     "QQEs_14_5_4.236": "qqes"}), kts, 1e-9, None),
        ("stc_10_12_26", lambda s: ST.streaming_stc(s),
         reg("stc", {"STC_10_12_26_0.5": "stc",
                     "STCmacd_10_12_26_0.5": "stcmacd",
                     "STCstoch_10_12_26_0.5": "stcstoch"}), kts, 1e-9, None),
        ("hwc", lambda s: ST.streaming_hwc(s),
         reg("hwc", {"HWM": "hwm", "HWU": "hwu", "HWL": "hwl"}),
         kts, 1e-9, None),
        ("ebsw_40_10", lambda s: ST.streaming_ebsw(s),
         reg("ebsw", {"EBSW_40_10": "ebsw"}), kts, 1e-9, None),
    ]


def _compare(name, got, exp, key_cols, tol):
    """Row/key/value parity between the stream output and the batch op;
    returns (ok, detail dict)."""
    import numpy as np

    detail = {"rows_stream": int(len(got)), "rows_batch": int(len(exp)),
              "tol": tol}
    if len(got) != len(exp):
        detail["error"] = "row count mismatch"
        return False, detail
    if len(got) == 0:
        detail["error"] = "empty output"
        return False, detail
    got = got.sort_values(key_cols).reset_index(drop=True)
    exp = exp.sort_values(key_cols).reset_index(drop=True)
    shared = [c for c in exp.columns if c in set(got.columns)]
    value_cols = [c for c in shared if c not in key_cols]
    if not value_cols:
        detail["error"] = f"no shared value columns (stream "\
                          f"{list(got.columns)}, batch {list(exp.columns)})"
        return False, detail
    detail["cols"] = value_cols
    bad = {}
    for c in key_cols:
        if not got[c].equals(exp[c]):
            bad[c] = "key misalignment"
    for c in value_cols:
        g, e = got[c], exp[c]
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            ga = g.to_numpy(dtype=float)
            ea = e.to_numpy(dtype=float)
            if not np.array_equal(np.isnan(ga), np.isnan(ea)):
                bad[c] = "NaN mask mismatch"
                continue
            mx = float(np.nanmax(np.abs(ga - ea), initial=0.0))
            if mx > tol:
                bad[c] = f"max |delta| {mx:g} > {tol:g}"
        else:
            if not g.equals(e):
                n_bad = int((g != e).sum())
                bad[c] = f"{n_bad} unequal values"
    if bad:
        detail["mismatch"] = bad
        return False, detail
    return True, detail


def run_replay(sf_dir: str) -> dict:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.ui.retainedExecutions", "5")
        .appName("stream-gate")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandas_ta_spark.sources.bars import bars_from_events

    bars_pdf = (bars_from_events(spark, sf_dir).toPandas()
                .sort_values(["ts", "symbol"]).reset_index(drop=True))
    bars_pdf["ts"] = bars_pdf["ts"].astype("datetime64[ms]")

    replay_dir = tempfile.mkdtemp(prefix="stream_gate_src_")
    out: dict = {}
    try:
        # 3 time-ordered chunks: every twin carries state across at
        # least two micro-batch boundaries that land mid-window
        n = len(bars_pdf)
        cuts = [0, n // 3, 2 * n // 3, n]
        for i in range(3):
            bars_pdf.iloc[cuts[i]:cuts[i + 1]].to_parquet(
                f"{replay_dir}/chunk{i}.parquet")
        batch_bars = spark.read.parquet(replay_dir)

        for name, s_build, b_build, key_cols, tol, post in _specs():
            t0 = time.time()
            entry: dict = {}
            try:
                stream = (
                    spark.readStream.schema(BARS_DDL)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(replay_dir)
                )
                sink = f"sg_{name.replace('.', '_')}"
                q = (s_build(stream)
                     .writeStream.format("memory").queryName(sink)
                     .outputMode("append").trigger(availableNow=True)
                     .start())
                q.awaitTermination(300)
                got = spark.sql(f"SELECT * FROM {sink}").toPandas()
                spark.catalog.dropTempView(sink)
                exp = b_build(batch_bars).toPandas()
                if post is not None:
                    exp = post(exp, bars_pdf)
                ok, detail = _compare(name, got, exp, key_cols, tol)
            except Exception as exc:  # noqa: BLE001 — recorded, not raised
                ok, detail = False, {"error": f"{type(exc).__name__}: {exc}"}
            entry.update(detail)
            entry["ok"] = ok
            entry["sec"] = round(time.time() - t0, 3)
            out[name] = entry
            state = "ok" if ok else "FAIL"
            print(f"replay {name:24s} {state}  {entry['sec']:.1f}s",
                  flush=True)
    finally:
        shutil.rmtree(replay_dir, ignore_errors=True)
        spark.stop()
    return out


def run_replay_corpus(sf_dir: str) -> dict:
    """Driver-corpus replay parity for the corpus / panel / relational /
    session twins: each streaming op replayed over the driver tables as
    a micro-batch file stream and compared field-by-field against its
    batch counterpart on identical input. Comparisons are EXACT (tol 0)
    except where a twin's pytest documents a tolerance."""
    import pandas as pd
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("stream-gate-corpus")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandas_ta_spark.ext.media import SUITE as MEDIA_SUITE
    from pandas_ta_spark.ext.relational import SUITE as REL_SUITE
    from pandas_ta_spark.ext.relational import _sessionize, asof_join
    from pandas_ta_spark.ext.sampling import split_expr
    from pandas_ta_spark.ext.text import quality_exprs, quality_lr_exprs
    from pandas_ta_spark.sources.bars import bars_from_events, load_table
    from pandas_ta_spark import streaming as ST

    out: dict = {}
    base_dir = tempfile.mkdtemp(prefix="stream_gate_corpus_")

    def replay(name, frames, ddl, build, exp_df, key_cols, tol,
               mode="append", drop=None):
        t0 = time.time()
        try:
            d = os.path.join(base_dir, name)
            os.makedirs(d, exist_ok=True)
            for i, f in enumerate(frames):
                f.to_parquet(os.path.join(d, f"c{i}.parquet"))
            stream = (spark.readStream.schema(ddl)
                      .option("maxFilesPerTrigger", 1).parquet(d))
            sink = f"sgc_{name}"
            q = (build(stream).writeStream.format("memory")
                 .queryName(sink).outputMode(mode)
                 .trigger(availableNow=True).start())
            q.awaitTermination(300)
            got = spark.sql(f"SELECT * FROM {sink}").toPandas()
            spark.catalog.dropTempView(sink)
            if drop is not None:
                got = drop(got)
            exp = exp_df if isinstance(exp_df, pd.DataFrame) \
                else exp_df.toPandas()
            ok, detail = _compare(name, got, exp, key_cols, tol)
        except Exception as exc:  # noqa: BLE001 — recorded, not raised
            ok, detail = False, {"error": f"{type(exc).__name__}: {exc}"}
        detail["ok"] = ok
        detail["sec"] = round(time.time() - t0, 3)
        out[name] = detail
        print(f"replay {name:24s} {'ok' if ok else 'FAIL'}"
              f"  {detail['sec']:.1f}s", flush=True)

    def chunks3(pdf):
        n = len(pdf)
        return [pdf.iloc[:n // 3], pdf.iloc[n // 3:2 * n // 3],
                pdf.iloc[2 * n // 3:]]

    try:
        docs_sdf = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source", "n_chars")
        docs = docs_sdf.toPandas().sort_values("doc_id")
        t0 = pd.Timestamp("2026-01-01 00:10:00")
        docs["ingest_ts"] = (t0 + pd.to_timedelta(
            docs["doc_id"].astype("int64") % 3000, unit="s")
        ).astype("datetime64[ms]")
        DOCS_DDL = ("doc_id long, text string, lang string, source string,"
                    " n_chars long, ingest_ts timestamp")
        docs_batch = spark.createDataFrame(docs)

        # stateless corpus twins: batch = the same scoring/assignment
        # expressions applied batch-side to the identical frame
        qx = quality_exprs()
        replay("quality_keep", chunks3(docs), DOCS_DDL,
               ST.stream_quality_keep,
               docs_batch.select(
                   "doc_id", qx["n_tokens"].alias("n_tokens"),
                   qx["quality_score"].alias("quality_score"),
                   qx["keep"].alias("keep"))
               .filter(F.col("keep") == 1).drop("keep"),
               ["doc_id"], 0.0)
        qlr = quality_lr_exprs()
        replay("quality_lr_keep", chunks3(docs), DOCS_DDL,
               ST.stream_quality_lr_keep,
               docs_batch.select(
                   "doc_id", qlr["n_tokens"].alias("n_tokens"),
                   qlr["z"].alias("z"), qlr["p_keep"].alias("p_keep"),
                   qlr["keep"].alias("keep"))
               .filter(F.col("keep") == 1).drop("keep"),
               ["doc_id"], 0.0)
        replay("split_assign", chunks3(docs), DOCS_DDL,
               ST.stream_split_assign,
               docs_batch.select("doc_id", "text",
                                 split_expr().alias("split")),
               ["doc_id"], 0.0)

        # media features: Arrow mapInPandas over the binary column
        replay("media_features", chunks3(docs), DOCS_DDL,
               ST.stream_media_features,
               MEDIA_SUITE["media_features"].query(spark, sf_dir),
               ["doc_id"], 0.0)

        # exact dedup: first-seen per normalized-text hash. Same-batch
        # tie order is engine-internal, so compare per-hash KEPT COUNTS
        # (exactly one survivor per hash, hash sets equal), not doc ids.
        h = F.md5(F.lower(F.trim(F.col("text"))))
        exp_hashes = (docs_batch.select(h.alias("text_hash"))
                      .groupBy("text_hash")
                      .agg(F.lit(1).cast("long").alias("n_kept")))
        replay("dedup_exact", chunks3(docs), DOCS_DDL,
               lambda s: ST.stream_dedup_exact(s, watermark="6 hours"),
               exp_hashes, ["text_hash"], 0.0,
               drop=lambda g: g.groupby("text_hash", as_index=False)
               .size().rename(columns={"size": "n_kept"}))

        # token rate: watermarked tumbling windows; two flusher docs
        # advance the watermark past every real window, then drop them
        flush = docs.iloc[:1].copy()
        flush["source"] = "zz_flush"
        flush["ingest_ts"] = pd.Series(
            [t0 + pd.Timedelta(hours=6)], index=flush.index
        ).astype("datetime64[ms]")
        flush2 = flush.copy()
        flush2["ingest_ts"] = (flush["ingest_ts"]
                               + pd.Timedelta(hours=1)).astype("datetime64[ms]")
        n_tok = F.size(F.split(F.lower(F.trim(F.col("text"))), " ")) \
            .cast("long")
        exp_rate = (docs_batch
                    .select("source", "ingest_ts", n_tok.alias("n_tok"))
                    .groupBy("source",
                             F.window("ingest_ts", "1 hour").alias("w"))
                    .agg(F.count(F.lit(1)).alias("n_docs"),
                         F.sum("n_tok").alias("n_tokens"))
                    .select("source",
                            F.col("w.start").alias("window_start"),
                            "n_docs", "n_tokens"))
        replay("token_rate", chunks3(docs) + [flush, flush2], DOCS_DDL,
               lambda s: ST.stream_token_rate(s, window="1 hour",
                                              watermark="1 hour"),
               exp_rate, ["source", "window_start"], 0.0,
               drop=lambda g: g[g["source"] != "zz_flush"])

        # sessions: native session_window vs the batch lag->running-sum
        # sessionize on the driver event log (complete mode emits all)
        ev = (load_table(spark, sf_dir, "events")
              .select("event_id", "user_id", "ts", "event_type")
              .toPandas().sort_values(["ts", "event_id"]))
        ev["ts"] = ev["ts"].astype("datetime64[us]")
        exp_sess = _sessionize(spark, sf_dir).drop("session_no")
        replay("sessions_30m", chunks3(ev),
               "event_id long, user_id long, ts timestamp,"
               " event_type string",
               lambda s: ST.stream_sessions(s, gap="30 minutes",
                                            watermark="10 minutes"),
               exp_sess, ["user_id", "session_start"], 0.0,
               mode="complete")

        # asof attach: stream events against the static bar relation;
        # one past-the-end event exercises the clamp, dropped before
        # the compare (the batch side never saw it)
        bars = bars_from_events(spark, sf_dir)
        ev_sdf = load_table(spark, sf_dir, "events").select(
            "event_id", F.col("event_type").alias("symbol"), "ts", "value")
        exp_asof = asof_join(ev_sdf, bars)
        epd = ev_sdf.toPandas().sort_values("event_id")
        epd["ts"] = epd["ts"].astype("datetime64[us]")
        late = epd.iloc[:1].copy()
        late["event_id"] = 10_000_001
        late["ts"] = pd.Series([epd["ts"].max() + pd.Timedelta(days=1)],
                               index=late.index).astype("datetime64[us]")
        replay("asof_attach", chunks3(epd) + [late],
               "event_id long, symbol string, ts timestamp, value double",
               lambda s: ST.stream_asof_attach(s, bars),
               exp_asof, ["event_id"], 0.0,
               drop=lambda g: g[g["event_id"] != 10_000_001])

        # panel standardization/rank: per-ts panels split across TWO
        # micro-batches (integer moments are arrival-order-independent),
        # two flusher rows advance the watermark past the last panel
        ws = Window.partitionBy("symbol").orderBy("ts")
        rets = (bars.select(
            "symbol", "ts",
            (F.col("close") / F.lag("close").over(ws) - 1).alias("ret_1"))
            .filter(F.col("ret_1").isNotNull()).toPandas()
            .sort_values(["ts", "symbol"]).reset_index(drop=True))
        fl = pd.DataFrame({
            "symbol": ["zz"],
            "ts": [rets["ts"].max() + pd.Timedelta(hours=5)],
            "ret_1": [0.5]})
        fl2 = fl.assign(ts=fl["ts"] + pd.Timedelta(hours=1))
        xframes = []
        for f in (rets.iloc[::2], rets.iloc[1::2], fl, fl2):
            f = f.copy()
            f["ts"] = f["ts"].astype("datetime64[us]")
            xframes.append(f)
        RETS_DDL = "symbol string, ts timestamp, ret_1 double"
        for key, twin in (("xsec_zscore_ret1", ST.stream_xsec_zscore),
                          ("xsec_rank_ret1", ST.stream_xsec_rank)):
            replay(key, xframes, RETS_DDL, twin,
                   REL_SUITE[key].query(spark, sf_dir),
                   ["ts", "symbol"], 0.0,
                   drop=lambda g: g[g["symbol"] != "zz"])
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)
        spark.stop()
    return out


def run_pytests() -> dict:
    """The planted-edge-case streaming suite, parsed to per-test rows."""
    import xml.etree.ElementTree as ET

    xml_path = tempfile.mktemp(prefix="stream_gate_", suffix=".xml")
    targets = [
        "tests/test_streaming_custom.py",
        "tests/test_streaming_state_machines.py",
        "tests/test_microstructure_ext.py",
        "tests/test_regime_ext.py",
    ]
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", *targets,
         "-k", "stream", f"--junitxml={xml_path}"],
        cwd=REPO, capture_output=True, text=True, timeout=3600)
    tests: dict = {}
    try:
        root = ET.parse(xml_path).getroot()
        for case in root.iter("testcase"):
            name = case.get("name")
            failed = (case.find("failure") is not None
                      or case.find("error") is not None)
            skipped = case.find("skipped") is not None
            tests[name] = {
                "ok": not failed and not skipped,
                "skipped": skipped,
                "sec": round(float(case.get("time", 0)), 2),
            }
    except Exception as exc:  # noqa: BLE001
        tests["_parse_error"] = {"ok": False,
                                 "error": f"{type(exc).__name__}: {exc}",
                                 "stdout_tail": proc.stdout[-2000:]}
    finally:
        if os.path.exists(xml_path):
            os.unlink(xml_path)
    return tests


def main() -> int:
    args = sys.argv[1:]
    rnd = int(os.environ.get("SPARK_GRAFT_ROUND", "11"))
    sf_dir = "/root/testdata/sf0.001"
    skip_pytest = False
    i = 0
    while i < len(args):
        if args[i] == "--round":
            rnd = int(args[i + 1]); i += 2
        elif args[i] == "--sf-dir":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--skip-pytest":
            skip_pytest = True; i += 1
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    replay = run_replay(sf_dir)
    replay.update(run_replay_corpus(sf_dir))
    result = {"sf_dir": sf_dir, "replay": replay}
    if not skip_pytest:
        result["pytest"] = run_pytests()

    n_fail = sum(1 for v in replay.values() if not v["ok"])
    n_pyfail = sum(1 for v in result.get("pytest", {}).values()
                   if not v.get("ok") and not v.get("skipped"))
    result["summary"] = {
        "replay_total": len(replay), "replay_fail": n_fail,
        "pytest_total": len(result.get("pytest", {})),
        "pytest_fail": n_pyfail,
    }
    out_path = os.path.join(REPO, f"STREAM_r{rnd}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["summary"]))
    print(f"wrote {out_path}")
    return 1 if (n_fail or n_pyfail) else 0


if __name__ == "__main__":
    raise SystemExit(main())
