"""r14: executorCpuTime/executorRunTime attribution per strategy
component (cached-scan floor, 24ind, expr-only, kernel-only, full 145),
via the UI REST API. CPU time is less box-weather-sensitive than wall.

    python tools/profile_cpu.py [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
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
        .appName("profile-cpu")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import all_indicators, force, strategy_indicators, tick_bars
    from pandas_ta_spark.plans.strategy import apply_strategy

    ticks = tick_bars(spark, sf_dir).repartition(11, "symbol")
    ticks.cache().count()
    inds = all_indicators()
    strat24 = strategy_indicators()
    kern = [i for i in inds if i.kernel is not None]
    expr = [i for i in inds if i.kernel is None]
    expr_nc = [i for i in expr if i.category != "candles"]

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def totals():
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
            ss = json.loads(r.read())
        return (sum(s["executorRunTime"] for s in ss),
                sum(s["executorCpuTime"] // 1_000_000 for s in ss),
                sum(s["jvmGcTime"] for s in ss))

    variants = {
        "noop_floor": lambda: ticks,
        "strat24": lambda: apply_strategy(ticks, strat24,
                                          auto_chunk_rows=None),
        "expr_noncandle": lambda: apply_strategy(ticks, expr_nc,
                                                 auto_chunk_rows=None),
        "expr_all": lambda: apply_strategy(ticks, expr,
                                           auto_chunk_rows=None),
        "kernel_only": lambda: apply_strategy(ticks, kern,
                                              auto_chunk_rows=None),
        "full145": lambda: apply_strategy(ticks, inds,
                                          auto_chunk_rows=None),
    }
    for b in variants.values():
        force(b())  # warm each once
    out = {}
    keys = list(variants)
    for rep in range(reps):
        for k in (keys if rep % 2 == 0 else keys[::-1]):
            r0, c0, g0 = totals()
            t0 = time.time()
            force(variants[k]())
            wall = time.time() - t0
            r1, c1, g1 = totals()
            agg = out.setdefault(k, dict(wall=[], run=[], cpu=[], gc=[]))
            agg["wall"].append(round(wall, 3))
            agg["run"].append(round((r1 - r0) / 1000, 3))
            agg["cpu"].append(round((c1 - c0) / 1000, 3))
            agg["gc"].append(round((g1 - g0) / 1000, 3))
    import statistics
    for k in keys:
        a = out[k]
        print(f"{k:15s} wall_med={statistics.median(a['wall']):7.3f} "
              f"run_med={statistics.median(a['run']):8.3f} "
              f"cpu_med={statistics.median(a['cpu']):8.3f} "
              f"gc_med={statistics.median(a['gc']):6.3f}")
        print(f"    walls={a['wall']}\n    cpus={a['cpu']}")
    print(json.dumps({k: out[k] for k in keys}))


if __name__ == "__main__":
    main()
