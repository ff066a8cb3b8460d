"""r14: decompose the all-145 wall further (profile_all145 found
candles ~0.6s, rest ~9s): window-expression indicators vs the Arrow
kernel pass, plus layer counts and codegen span counts.

Run: python tools/profile_all145_v2.py
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
        .appName("profile-all145-v2")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import all_indicators, force, tick_bars
    from pandas_ta_spark.plans.strategy import apply_strategy

    ticks = tick_bars(spark, sf_dir).repartition(11, "symbol")
    ticks.cache().count()

    inds = all_indicators()
    kern = [i for i in inds if i.kernel is not None]
    expr = [i for i in inds if i.kernel is None]
    expr_nc = [i for i in expr if i.category != "candles"]
    print(f"inds={len(inds)} kernel={len(kern)} expr={len(expr)} "
          f"expr_noncandle={len(expr_nc)}", flush=True)
    stage_counts = {}
    for i in expr_nc:
        stage_counts[i.key] = len(i.stages)
    print("max expr stages:", max(stage_counts.values()),
          "sum:", sum(stage_counts.values()), flush=True)

    def bench_fn(fn, warm=2, reps=5):
        for _ in range(warm):
            fn()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return round(median(ts), 3), [round(t, 3) for t in ts]

    out = {}
    for name, workload in (
            ("kernel_only", kern), ("expr_only", expr),
            ("expr_noncandle", expr_nc), ("full", inds)):
        m, ts = bench_fn(
            lambda w=workload: force(
                apply_strategy(ticks, w, auto_chunk_rows=None)))
        df = apply_strategy(ticks, workload, auto_chunk_rows=None)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_win = plan.count("Window ")
        n_proj = plan.count("Project ")
        n_cg = plan.count("WholeStageCodegen")
        out[name] = {"median": m, "reps": ts, "Window": n_win,
                     "Project": n_proj, "Codegen": n_cg,
                     "n_cols": len(df.columns)}
        print(f"{name} {m} {ts} win={n_win} proj={n_proj} cg={n_cg} "
              f"cols={len(df.columns)}", flush=True)

    print(json.dumps({"metric": "all145_profile_v2", **out}))


if __name__ == "__main__":
    main()
