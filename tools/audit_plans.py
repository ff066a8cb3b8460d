"""Physical-plan audit: regenerate PLANS.md.

For each headline query, count the plan nodes that dominate cost at scale
(shuffles, sorts, Python/Arrow passes, codegen breaks) straight from the
executedPlan — the "is this the plan you'd want at 100 TB" evidence,
machine-generated so it cannot drift from the code.

Run: python tools/audit_plans.py  (writes /root/repo/PLANS.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"

NODES = {
    "Exchange": r"Exchange (?!SinglePartition)",  # data shuffles (not collect)
    "SinglePart": r"Exchange SinglePartition",
    "ScalarReduce": None,  # computed below, carved out of SinglePart
    "Sort": r"\bSort \[",
    "ArrowPass": r"FlatMapGroupsInPandas|MapInPandas|ArrowEvalPython",
    "PyRowUDF": r"BatchEvalPython",
    "BroadcastJoin": r"BroadcastHashJoin",
    "SortMergeJoin": r"SortMergeJoin",
    "NestedLoop": r"BroadcastNestedLoopJoin|CartesianProduct",
    "Codegen": r"\*\(\d+\)",
}


def count_nodes(plan: str) -> dict[str, int]:
    out = {}
    for k, pat in NODES.items():
        if pat is not None:
            out[k] = len(re.findall(pat, plan))
    out["Codegen"] = len(set(re.findall(r"\*\((\d+)\)", plan)))
    # split SinglePartition exchanges into ROW-BEARING ones (a window /
    # sort / limit funnels the full relation through one partition —
    # the scale signal this audit exists to catch) vs partial-aggregate
    # scalar reduces (the exchange moves one fixed-size agg buffer per
    # map partition — the only way any engine produces a 1-row result,
    # benign at any scale). The child line of the exchange tells them
    # apart: a partial agg renders as functions=[partial_...].
    lines = plan.splitlines()
    row_bearing = scalar = 0
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            nxt = lines[i + 1] if i + 1 < len(lines) else ""
            if "partial_" in nxt:
                scalar += 1
            else:
                row_bearing += 1
    out["SinglePart"] = row_bearing
    out["ScalarReduce"] = scalar
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    import tempfile

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        # the bucketed re-read audit writes a managed table; keep the
        # warehouse out of the repo
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="plans_wh_"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench as B
    from pandas_ta_spark.ext import SUITE as EXT
    from pandas_ta_spark.plans.strategy import apply_strategy
    from pandas_ta_spark.registry import make
    from pandas_ta_spark.sources.bars import bars_from_events

    bars = bars_from_events(spark, SF)
    queries = {
        "sma_20 (single op)": lambda: make("sma", length=20).apply(bars),
        "rsi_14 (EWM kernel)": lambda: make("rsi", length=14).apply(bars),
        "strategy_24ind (one plan)": lambda: apply_strategy(
            bars, B.strategy_indicators()),
        "strategy_all145ind (242 cols)": lambda: apply_strategy(
            bars, B.all_indicators()),
    }
    # the r13 skew auto-router backend, forced (the audit corpus is too
    # small to trigger the router): the plan the hot-symbol route runs
    from pandas_ta_spark.plans.strategy import (
        apply_strategy_chunked_rows, split_chunkable)

    _lb, _safe, _ = split_chunkable(B.strategy_indicators())
    queries["strategy_bounded (row-chunked skew route)"] = (
        lambda: apply_strategy_chunked_rows(bars, _safe, _lb, 65_536))
    for key in ("dedup_exact", "dedup_minhash_lsh", "topk_cosine",
                "topk_cosine_lsh", "topk_cosine_ivf", "contamination_ngrams",
                "corpus_rarity", "text_stats", "text_repetition",
                "sample_hash_deterministic", "shard_pack_tokens",
                "mix_rebalance_lang", "asof_join_bars", "sessionize_30m",
                "mtf_sma_asof", "retention_cohorts",
                "funnel_view_click_purchase", "embedding_label_centroids",
                "dedup_spans", "semdedup_keep", "split_assign",
                "dedup_overlap_by_source_pair", "media_features",
                "ichimoku_forward", "tfidf_top_terms", "ngram_novelty",
                "pii_scrub", "contamination_minhash", "embedding_quantize_sq",
                "ivf_cluster_profile", "source_token_profile",
                "topk_cosine_pq", "topk_cosine_ivfpq", "rolling_beta_24",
                "quality_lr_score", "bars_15m", "series_integrity",
                "signal_equity_8_21",
                # r7 additions
                "semdedup_cc_clusters", "media_frame_sample",
                "media_resize_8", "xsec_rank_ret1", "xsec_zscore_ret1",
                # r8 additions
                "asof_hour_lookup", "embedding_drift_by_slice",
                "curation_decisions", "perplexity_unigram",
                "attribution_last_touch", "user_rfm_segments",
                "events_rate_anomaly", "bars_gapfill_1h",
                "mix_temperature_sqrt", "perplexity_bigram",
                "ret_autocorr_24", "drawdown_episodes", "variance_ratio_5_24",
                "lead_lag_corr_1h", "hourly_seasonality",
                "unigram_kl_by_source", "lexical_diversity",
                "event_transition_matrix", "conversion_lag_percentiles",
                "session_stats_30m", "embedding_norm_by_label",
                "active_users_daily",
                # microstructure pack (late r8)
                "vol_parkinson_20", "vol_yang_zhang_20", "amihud_illiq_20",
                "cs_spread_2_20", "hurst_aggvar", "ar1_half_life",
                "rolling_sharpe_20", "var_cvar_95_100", "roll_spread_20",
                "doc_chunk_128_16", "pair_spread_z_24",
                # r9 additions
                "kyle_lambda_20", "contamination_prefix",
                "mix_epochs_plan",
                # r13 additions
                "topk_cosine_pq_rerank", "topk_pq_rerank_recall"):
        queries[key] = (lambda k: lambda: EXT[k].query(spark, SF))(key)

    # the size-gated approx_percentile branch (VERDICT r10 ask #3): what
    # these three queries plan as once the input estimate crosses
    # PERCENTILE_EXACT_MAX_BYTES — forced here so the audit shows the
    # large-input plan (no row-bearing SinglePart window/sort)
    from pandas_ta_spark.ext.behavior import _conversion_lags, _rfm
    from pandas_ta_spark.ext.relational import _session_stats

    queries["conversion_lag_percentiles (approx, large-input)"] = (
        lambda: _conversion_lags(spark, SF, approx=True))
    queries["session_stats_30m (approx, large-input)"] = (
        lambda: _session_stats(spark, SF, approx=True))
    queries["user_rfm_segments (approx, large-input)"] = (
        lambda: _rfm(spark, SF, approx=True))

    rows = []
    for name, build in queries.items():
        df = build()
        plan = df._jdf.queryExecution().executedPlan().toString()
        rows.append((name, count_nodes(plan)))

    # bucketed re-read: bucketBy(symbol) pre-pays the strategy shuffle at
    # write time — the audit row must show Exchange = 0 on the re-read
    # (the 100 TB repeated-scan story; bench.py measures the wall time)
    from pandas_ta_spark.sources.bars import write_bars_bucketed

    try:
        write_bars_bucketed(bars, "plans_audit_bucketed", buckets=8)
        t = spark.table("plans_audit_bucketed")
        plan = (apply_strategy(t, B.strategy_indicators())
                ._jdf.queryExecution().executedPlan().toString())
        rows.append(("strategy_24ind (bucketed re-read)", count_nodes(plan)))
    finally:
        spark.sql("DROP TABLE IF EXISTS plans_audit_bucketed")

    cols = list(NODES)
    lines = [
        "# PLANS — physical-plan audit (generated by tools/audit_plans.py)",
        "",
        "Node counts from `executedPlan` at sf0.01 (AQE on, pre-execution",
        "plan — AQE may further coalesce at runtime). What to look for:",
        "**Exchange** = shuffles (the scale cost), **ArrowPass** = batched",
        "Python passes (exactly one per strategy regardless of indicator",
        "count), **PyRowUDF/NestedLoop** should be 0 everywhere except the",
        "documented brute-force baseline, **Codegen** = distinct",
        "whole-stage-codegen spans.",
        "",
        "| query | " + " | ".join(cols) + " |",
        "|---|" + "---|" * len(cols),
    ]
    for name, c in rows:
        lines.append(
            f"| {name} | " + " | ".join(str(c[k]) for k in cols) + " |")
    lines.append("")
    lines.append("Notes:")
    lines.append("- `topk_cosine` is the labelled brute-force baseline — its")
    lines.append("  NestedLoop join broadcasts the 10-row query side by design;")
    lines.append("  the LSH/IVF variants replace it with hash joins on")
    lines.append("  bucket/list keys. IVF's remaining NestedLoops broadcast the")
    lines.append("  K=8-row centroid table (scan cost K per row, the IVF")
    lines.append("  assignment itself); its pre-execution Exchange count")
    lines.append("  overstates runtime cost — the persisted vector relation's")
    lines.append("  exchanges are reused across the train/assign/probe phases.")
    lines.append("- recall telemetry rows (`topk_pq_rerank_recall`) COMPOSE the")
    lines.append("  brute baseline as their ground truth, so they inherit its")
    lines.append("  broadcast-10-row NestedLoop (twice: the per-query k count")
    lines.append("  and the hit join) — baseline instances, not scan joins.")
    lines.append("- `mix_rebalance_lang`'s NestedLoop broadcasts a single-row")
    lines.append("  computed quota; `tfidf_top_terms`'s NestedLoop is the same")
    lines.append("  pattern (1-row source-count cross join). Its exchanges past")
    lines.append("  the first explode+groupBy move vocabulary-sized relations,")
    lines.append("  not the corpus.")
    lines.append("- `embedding_quantize_sq` broadcasts the DIM-row min/max")
    lines.append("  table back onto the exploded vectors; codes are a map")
    lines.append("  stage.")
    lines.append("- `dedup_minhash_lsh` reports 0 exchanges because the audit")
    lines.append("  sees the post-materialization scan; the derivation plan")
    lines.append("  (persist-shared shingles, band self-join) is documented in")
    lines.append("  ext/dedup.py. CC clustering is iterative (plan per round),")
    lines.append("  audited separately there.")
    lines.append("- `pair_spread_z_24` / `lead_lag_corr_1h`: the r9 top-N")
    lines.append("  dollar-volume universe bound is ELIDED here (r10) — the")
    lines.append("  session-cached symbol count fits top_n, so the audited")
    lines.append("  plan is semi-join-free. At a 10k-symbol universe the")
    lines.append("  bound re-appears as 4 candidate-sized exchanges (groupBy")
    lines.append("  to S rows, sort+limit, broadcast back) and keeps the pair")
    lines.append("  fan-out O(top_n^2); pinned by test_pair_universe_bound.")
    lines.append("- **SinglePart** counts ROW-BEARING single-partition")
    lines.append("  exchanges only (window/sort/limit funneling the full")
    lines.append("  relation through one task — the scale-killer);")
    lines.append("  **ScalarReduce** is the partial-aggregate final reduce")
    lines.append("  (one fixed-size buffer per map partition — how any")
    lines.append("  engine yields a 1-row result, benign at any scale).")
    lines.append("- The `(approx, large-input)` rows are the size-gated")
    lines.append("  approx_percentile branch of the three percentile queries")
    lines.append("  (past PERCENTILE_EXACT_MAX_BYTES): SinglePart=0 — the")
    lines.append("  exact rank window is replaced by a mergeable sketch;")
    lines.append("  parity at the boundary is pinned by")
    lines.append("  test_percentile_swap_boundary_parity.")
    lines.append("- Codegen shows 0 for AQE-wrapped plans pre-execution; spans")
    lines.append("  materialize at runtime.")
    lines.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"wrote PLANS.md: {len(rows)} queries audited")


if __name__ == "__main__":
    main()
