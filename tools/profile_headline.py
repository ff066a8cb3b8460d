"""Decompose the headline 24-ind strategy cost at the bench config.

Stages timed separately (median of 5 after 3 warmups, bench protocol):
  window_only  — strat24 minus kernels (expression stages only)
  kernel_only  — just the batched applyInPandas pass over raw bars
  full         — apply_strategy(ticks, strat24) (the bench headline)
  passthrough  — kernel pass cost vs the width of the pass-through frame
                 (full strategy frame vs narrow bars): how much of the
                 Arrow round-trip is column width.

Run on a quiet box: python tools/profile_headline.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "11")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.windowExec.buffer.in.memory.threshold", "1048576")
        .config("spark.sql.windowExec.buffer.spill.threshold", "2097152")
        .config("spark.driver.memory", "16g")
        .appName("profile-headline")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import strategy_indicators, tick_bars
    from pandas_ta_spark.plans.strategy import apply_strategy
    from pandas_ta_spark.plans.kernels import run_kernels

    ticks = tick_bars(spark, sf_dir).repartition(8)
    ticks.cache().count()
    strat24 = strategy_indicators()
    window_inds = [i for i in strat24 if i.kernel is None]
    kernel_specs = [i.kernel for i in strat24 if i.kernel is not None]

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def bench_fn(fn, warm=3, reps=5):
        for _ in range(warm):
            force(fn())
        out = []
        for _ in range(reps):
            t0 = time.time()
            force(fn())
            out.append(time.time() - t0)
        return round(median(out), 3), [round(x, 3) for x in out]

    results = {}
    results["noop_scan"] = bench_fn(lambda: ticks)
    results["window_only"] = bench_fn(
        lambda: apply_strategy(ticks, window_inds))
    results["kernel_only_narrow"] = bench_fn(
        lambda: run_kernels(ticks, kernel_specs))
    results["full"] = bench_fn(lambda: apply_strategy(ticks, strat24))
    # window stage then kernels on the wide frame (what full does) —
    # difference vs kernel_only_narrow isolates the pass-through width
    wide = apply_strategy(ticks, window_inds)
    results["kernel_after_windows"] = bench_fn(
        lambda: run_kernels(wide, kernel_specs))

    # arrow batch-size sensitivity on the full plan
    for batch in ("10000", "65536", "262144"):
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", batch)
        results[f"full_arrowbatch_{batch}"] = bench_fn(
            lambda: apply_strategy(ticks, strat24))
    spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
