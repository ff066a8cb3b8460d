"""Streaming-path throughput measurements (not part of the driver's
bench.py — run manually: python tools/bench_streaming.py [sf_dir]).

Measures end-to-end wall time and rows/sec for the continuous-query
twins against file-backed streams, availableNow-triggered so a run
processes a bounded backlog and terminates:

- dedup_gate: the online ingestion dedup gate (stream docs vs the
  static corpus MinHash index with full Jaccard verify);
- ann_ivf: the streaming IVF top-k server over a replicated query
  backlog;
- quality_keep: the stateless quality filter (pure expression path).

The numbers answer "what backlog drain rate does one local[*] node
sustain" — the per-node figure a capacity plan multiplies out; index
build time is reported separately (one-time, session-cached). Mostly
FIXED micro-batch overhead at these backlog sizes (a few seconds per
availableNow drain regardless of rows), so treat rows/sec as a floor:
r7 reference on local[32], sf0.1 backlog — dedup gate 5000 docs in
~6s (~800 docs/s; corpus index build 8s one-time), eval-slice
decontamination gate ~1.3k docs/s (eval index 0.8s), stateless quality
filter ~6-8k docs/s, IVF and IVF-PQ ANN 200 queries in ~7s each
(31k-corpus candidate scoring plus ~4s fixed cost), panel z-score
20k rows / 400 panels in ~2s. Rates scale with backlog size and corpus
partitioning, not with these absolute numbers.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    import pandas as pd
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "31")
        .config("spark.sql.adaptive.enabled", "false")  # streaming: no AQE
        .config("spark.driver.memory", "16g")
        .appName("pandas-ta-spark-stream-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandas_ta_spark.ext.similarity import N_QUERIES
    from pandas_ta_spark.streaming import (
        stream_decontamination_gate, stream_dedup_vs_corpus,
        stream_quality_keep, stream_semdedup_gate, stream_span_dup_gate,
        stream_topk_ivf, stream_topk_ivfpq, stream_xsec_zscore,
    )
    from pandas_ta_spark.streaming.corpus import (
        _corpus_dedup_index, _corpus_span_index,
    )

    out: dict = {"metric": "streaming_throughput", "sf_dir": SF_DIR}
    ts = pd.Timestamp("2026-01-01")

    def drain(builder, src_df, schema, name, n_rows, extra=None):
        """Run one availableNow drain. ``extra`` (optional list of
        DataFrames) lands as separate files with maxFilesPerTrigger=1 —
        the watermark-flush pattern for append-mode window twins, whose
        windows only emit once a LATER batch advances the watermark."""
        d = tempfile.mkdtemp(prefix=f"sbench_{name}_")
        src_df.to_parquet(f"{d}/a1.parquet")
        for i, e in enumerate(extra or []):
            path = f"{d}/b{i}.parquet"
            e.to_parquet(path)
            # FileStreamSource orders batches by mtime: on a coarse-
            # granularity filesystem the sentinel could tie with the
            # data file and process FIRST, advancing the watermark past
            # all real rows (everything dropped as late, telemetry
            # silently vacuous). Bump the sentinel's mtime explicitly.
            t_future = time.time() + 5 * (i + 1)
            os.utime(path, (t_future, t_future))
        reader = spark.readStream.schema(schema)
        if extra:
            reader = reader.option("maxFilesPerTrigger", 1)
        stream = reader.parquet(d)
        t0 = time.time()
        q = (builder(stream)
             .writeStream.format("noop")
             .option("checkpointLocation", tempfile.mkdtemp(prefix="sb_ck_"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(300)
        dt = time.time() - t0
        out[f"{name}_sec"] = round(dt, 3)
        out[f"{name}_rows_per_sec"] = round(n_rows / dt)
        # state telemetry: the bounded-state claims as MEASURED numbers —
        # operator count, peak total state rows, and peak state bytes
        # across the run's progress events (0/0/0 for stateless gates).
        # bytes/rows is the per-key state footprint a capacity plan
        # multiplies by key cardinality.
        n_ops = rows_peak = bytes_peak = 0
        for prog in q.recentProgress:
            ops = prog.get("stateOperators") or []
            n_ops = max(n_ops, len(ops))
            rows_peak = max(rows_peak,
                            sum(o.get("numRowsTotal", 0) for o in ops))
            bytes_peak = max(bytes_peak,
                             sum(o.get("memoryUsedBytes", 0) for o in ops))
        out[f"{name}_state_ops"] = n_ops
        out[f"{name}_state_rows_peak"] = rows_peak
        out[f"{name}_state_bytes_peak"] = bytes_peak

    # one-time index builds (session-cached), reported separately
    t0 = time.time()
    _corpus_dedup_index(spark, SF_DIR)
    out["dedup_index_build_sec"] = round(time.time() - t0, 3)

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").toPandas())
    docs["ingest_ts"] = ts
    docs["ingest_ts"] = docs["ingest_ts"].astype("datetime64[ms]")
    drain(lambda st: stream_dedup_vs_corpus(st, spark, SF_DIR),
          docs, "doc_id long, text string, ingest_ts timestamp",
          "dedup_gate", len(docs))
    drain(stream_quality_keep,
          docs.assign(lang="en", source="s"),
          "doc_id long, text string, ingest_ts timestamp, lang string,"
          " source string",
          "quality_keep", len(docs))

    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .filter(f"vec_id < {N_QUERIES}")
           .select("vec_id", "embedding").toPandas())
    reps = 20  # 200-query backlog from the 10 gate vectors
    q = pd.concat([emb.assign(query_id=emb["vec_id"] + 1000 * i)
                   for i in range(reps)], ignore_index=True)
    q = q[["query_id", "embedding"]]
    q["embedding"] = q["embedding"].map(list)
    q["ingest_ts"] = ts
    q["ingest_ts"] = q["ingest_ts"].astype("datetime64[ms]")
    drain(lambda st: stream_topk_ivf(st, spark, SF_DIR),
          q, "query_id long, embedding array<double>, ingest_ts timestamp",
          "ann_ivf", len(q))
    drain(lambda st: stream_topk_ivfpq(st, spark, SF_DIR),
          q, "query_id long, embedding array<double>, ingest_ts timestamp",
          "ann_ivfpq", len(q))
    # two-stage fold (bounded per-list state): same backlog, so the
    # *_rows_per_sec delta IS the cost of the extra stateful stage
    drain(lambda st: stream_topk_ivf(st, spark, SF_DIR, two_stage=True),
          q, "query_id long, embedding array<double>, ingest_ts timestamp",
          "ann_ivf_two_stage", len(q))

    # span + semantic gates (r8): index builds reported separately,
    # replays drive the same corpus through each gate
    t0 = time.time()
    _corpus_span_index(spark, SF_DIR)
    out["span_index_build_sec"] = round(time.time() - t0, 3)
    drain(lambda st: stream_span_dup_gate(st, spark, SF_DIR),
          docs, "doc_id long, text string, ingest_ts timestamp",
          "span_gate", len(docs))
    emb_all = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
               .select("vec_id", "embedding").toPandas())
    emb_all["embedding"] = emb_all["embedding"].map(list)
    emb_all["ingest_ts"] = ts
    emb_all["ingest_ts"] = emb_all["ingest_ts"].astype("datetime64[ms]")
    drain(lambda st: stream_semdedup_gate(st, spark, SF_DIR),
          emb_all,
          "vec_id long, embedding array<double>, ingest_ts timestamp",
          "semdedup_gate", len(emb_all))
    from pandas_ta_spark.ext.dedup import FUZZY_EVAL_MOD, FUZZY_EVAL_REM

    t0 = time.time()
    _corpus_dedup_index(
        spark, SF_DIR,
        corpus_pred=f"doc_id % {FUZZY_EVAL_MOD} = {FUZZY_EVAL_REM}")
    out["decon_index_build_sec"] = round(time.time() - t0, 3)
    drain(lambda st: stream_decontamination_gate(st, spark, SF_DIR),
          docs, "doc_id long, text string, ingest_ts timestamp",
          "decon_gate", len(docs))

    # perplexity gate: LM scoring at the door (vocab build separate)
    from pandas_ta_spark.streaming import stream_perplexity_gate
    from pandas_ta_spark.streaming.corpus import _corpus_vocab_logp

    t0 = time.time()
    _corpus_vocab_logp(spark, SF_DIR)
    out["vocab_build_sec"] = round(time.time() - t0, 3)
    drain(lambda st: stream_perplexity_gate(st, spark, SF_DIR),
          docs, "doc_id long, text string, ingest_ts timestamp",
          "perplexity_gate", len(docs))

    # composed curation gate (quality+sample+exact+near-dup in one query)
    from pandas_ta_spark.streaming import stream_curation_gate
    from pandas_ta_spark.streaming.corpus import _corpus_exact_index

    t0 = time.time()
    _corpus_exact_index(spark, SF_DIR)
    out["exact_index_build_sec"] = round(time.time() - t0, 3)
    docs_src = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
                .select("doc_id", "source", "text").toPandas())
    docs_src["ingest_ts"] = ts
    docs_src["ingest_ts"] = docs_src["ingest_ts"].astype("datetime64[ms]")
    drain(lambda st: stream_curation_gate(st, spark, SF_DIR),
          docs_src,
          "doc_id long, source string, text string, ingest_ts timestamp",
          "curation_gate", len(docs_src))

    # the full self-maintaining ingest loop (gate + in-batch dedup +
    # lake/index writes) — foreachBatch drives its own query, so it
    # bypasses drain(); replays the corpus as one batch
    from pandas_ta_spark.streaming import stream_corpus_ingest

    d = tempfile.mkdtemp(prefix="sbench_ingest_")
    docs_src.to_parquet(f"{d}/a1.parquet")
    ing_stream = (spark.readStream
                  .schema("doc_id long, source string, text string,"
                          " ingest_ts timestamp")
                  .parquet(d))
    t0 = time.time()
    stream_corpus_ingest(
        ing_stream, spark, SF_DIR,
        tempfile.mkdtemp(prefix="sbench_ingest_lake_"),
        tempfile.mkdtemp(prefix="sbench_ingest_ck_"),
    ).awaitTermination(300)
    dt = time.time() - t0
    out["corpus_ingest_sec"] = round(dt, 3)
    out["corpus_ingest_rows_per_sec"] = round(len(docs_src) / dt)

    import numpy as np
    rng = np.random.default_rng(1)
    n_panel = 20_000
    panel = pd.DataFrame({
        "symbol": [f"s{i % 50}" for i in range(n_panel)],
        "ts": pd.Timestamp("2026-01-01")
        + pd.to_timedelta(np.repeat(np.arange(n_panel // 50), 50), unit="h"),
        "ret_1": rng.normal(0, 0.01, n_panel),
    })
    panel["ts"] = panel["ts"].astype("datetime64[ms]")
    drain(stream_xsec_zscore,
          panel, "symbol string, ts timestamp, ret_1 double",
          "xsec_zscore", len(panel))

    # last-touch attribution: keyed two-long state per user, full events
    # replay (clicks + purchases after the in-gate filter)
    from pandas_ta_spark.sources.bars import load_table
    from pandas_ta_spark.streaming import stream_attribution_attach

    ev = (load_table(spark, SF_DIR, "events")
          .select("event_id", "user_id", "ts", "event_type").toPandas()
          .sort_values(["ts", "event_id"]))
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    drain(stream_attribution_attach,
          ev, "event_id long, user_id long, ts timestamp, event_type string",
          "attribution_gate", len(ev))

    # rolling regime telemetry: 26-close ring buffer per symbol
    from pandas_ta_spark.sources.bars import bars_from_events_cached
    from pandas_ta_spark.streaming import streaming_ret_autocorr

    bars = (bars_from_events_cached(spark, SF_DIR)
            .select("symbol", "ts", "close").toPandas()
            .sort_values(["symbol", "ts"]))
    bars["ts"] = bars["ts"].astype("datetime64[us]")
    drain(streaming_ret_autocorr,
          bars, "symbol string, ts timestamp, close double",
          "ret_autocorr", len(bars))

    from pandas_ta_spark.streaming import (
        streaming_drawdown_episodes,
        streaming_variance_ratio,
    )

    drain(streaming_variance_ratio,
          bars, "symbol string, ts timestamp, close double",
          "variance_ratio", len(bars))
    drain(streaming_drawdown_episodes,
          bars, "symbol string, ts timestamp, close double",
          "drawdown_episodes", len(bars))

    # microstructure twins: OHLC ring (yang-zhang) + return ring (VaR)
    # + value ring (parkinson)
    from pandas_ta_spark.streaming import (
        streaming_parkinson,
        streaming_var_cvar,
        streaming_yang_zhang,
    )

    obars = (bars_from_events_cached(spark, SF_DIR)
             .select("symbol", "ts", "open", "high", "low", "close",
                     "volume").toPandas()
             .sort_values(["symbol", "ts"]))
    obars["ts"] = obars["ts"].astype("datetime64[us]")
    oschema = ("symbol string, ts timestamp, open double, high double, "
               "low double, close double, volume double")
    drain(streaming_yang_zhang, obars, oschema, "yang_zhang", len(obars))
    drain(streaming_var_cvar, obars, oschema, "var_cvar", len(obars))
    drain(streaming_parkinson, obars, oschema, "parkinson", len(obars))

    # r9: live Kyle-lambda price-impact monitor ((sv, dp) ring/symbol)
    from pandas_ta_spark.streaming import streaming_kyle_lambda

    drain(streaming_kyle_lambda, obars, oschema, "kyle_lambda", len(obars))

    # r12: the five remaining KERNEL-class state-machine twins
    from pandas_ta_spark.streaming import (
        streaming_ebsw,
        streaming_hwc,
        streaming_psar,
        streaming_qqe,
        streaming_stc,
    )

    drain(streaming_psar, obars, oschema, "psar", len(obars))
    cbars = bars  # (symbol, ts, close) frame from the regime block
    cschema = "symbol string, ts timestamp, close double"
    drain(streaming_qqe, cbars, cschema, "qqe", len(cbars))
    drain(streaming_stc, cbars, cschema, "stc", len(cbars))
    drain(streaming_hwc, cbars, cschema, "hwc", len(cbars))
    drain(streaming_ebsw, cbars, cschema, "ebsw", len(cbars))

    # the three r8 twins previously missing rows (VERDICT r8 ask #8)
    # point-in-time as-of attach: STATELESS two stream-static joins —
    # state columns must read 0
    from pyspark.sql import functions as F

    from pandas_ta_spark.streaming import stream_asof_attach

    barsdf = bars_from_events_cached(spark, SF_DIR)
    evp = (load_table(spark, SF_DIR, "events")
           .select("event_id", F.col("event_type").alias("symbol"),
                   "ts", "value").toPandas()
           .sort_values(["ts", "event_id"]))
    evp["ts"] = evp["ts"].astype("datetime64[us]")
    drain(lambda st: stream_asof_attach(st, barsdf),
          evp, "event_id long, symbol string, ts timestamp, value double",
          "asof_attach", len(evp))

    # windowed rate anomaly vs the batch-fitted (med, mad) baseline;
    # far-future sentinel flushes the append-mode windows
    from pandas_ta_spark.ext.behavior import rate_anomaly
    from pandas_ta_spark.streaming import stream_rate_anomaly

    ev_t = load_table(spark, SF_DIR, "events").select("event_type", "ts")
    baseline = rate_anomaly(ev_t).select(
        "event_type", "med", "mad").distinct()
    epd = ev_t.toPandas().sort_values("ts")
    epd["ts"] = epd["ts"].astype("datetime64[us]")
    sentinel = pd.DataFrame({
        "event_type": ["sentinel"],
        "ts": [epd["ts"].max() + pd.Timedelta(days=2)],
    }).astype({"ts": "datetime64[us]"})
    drain(lambda st: stream_rate_anomaly(st, baseline),
          epd, "event_type string, ts timestamp",
          "rate_anomaly", len(epd), extra=[sentinel])

    # per-window embedding drift vs the corpus mean (same flush pattern)
    from pandas_ta_spark.streaming import stream_embedding_drift

    flusher = emb_all.iloc[:1].copy()
    flusher["ingest_ts"] = ts + pd.Timedelta(hours=8)
    flusher["ingest_ts"] = flusher["ingest_ts"].astype("datetime64[ms]")
    drain(lambda st: stream_embedding_drift(st, spark, SF_DIR),
          emb_all,
          "vec_id long, embedding array<double>, ingest_ts timestamp",
          "embedding_drift", len(emb_all), extra=[flusher])

    print(json.dumps(out))


if __name__ == "__main__":
    main()
