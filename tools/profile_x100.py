"""r15 ask #5: why does tick_strategy_24ind_x100scale not scale with
cores (PERF_r14 scaling ratio 0.93 at 8-vs-32)?

Runs the bench's exact x100 shape under local[N], reports wall + stage
metric attribution (executorRunTime/CpuTime/GC, shuffle bytes) and the
Python-worker share, so the serial/bandwidth component is visible.

    SPARK_GRAFT_CPUS=8 python tools/profile_x100.py [reps]
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
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "61")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.windowExec.buffer.in.memory.threshold", "1048576")
        .config("spark.sql.windowExec.buffer.spill.threshold", "2097152")
        .config("spark.driver.memory", "16g")
        .appName(f"profile-x100-c{cpus}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from bench import force, strategy_indicators, tick_bars
    from pandas_ta_spark.plans.strategy import apply_strategy

    ticks = tick_bars(spark, sf_dir).repartition(61, "symbol")
    ticks.cache().count()
    strat24 = strategy_indicators()

    rep = F.explode(F.sequence(F.lit(0), F.lit(99))).alias("rep")
    rep_df = (
        ticks.select("*", rep)
        .select(
            F.concat("symbol", F.lit("#"), F.col("rep")).alias("symbol"),
            "ts", "open", "high", "low", "close", "volume",
        )
    )
    t0 = time.time()
    rep_df.cache().count()
    cache_s = round(time.time() - t0, 3)

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def totals():
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
            ss = json.loads(r.read())
        return {
            "run": sum(s["executorRunTime"] for s in ss),
            "cpu": sum(s["executorCpuTime"] // 1_000_000 for s in ss),
            "gc": sum(s["jvmGcTime"] for s in ss),
            "shr": sum(s.get("shuffleReadBytes", 0) for s in ss),
            "shw": sum(s.get("shuffleWriteBytes", 0) for s in ss),
        }

    walls, deltas = [], []
    force(apply_strategy(rep_df, strat24))  # warm
    for _ in range(reps):
        m0 = totals()
        t0 = time.time()
        force(apply_strategy(rep_df, strat24))
        walls.append(round(time.time() - t0, 3))
        m1 = totals()
        deltas.append({k: m1[k] - m0[k] for k in m0})
    print("X100JSON " + json.dumps({
        "cpus": int(cpus), "cache_s": cache_s, "walls": walls,
        "stage_deltas": deltas,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
