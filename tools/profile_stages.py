"""r14: per-stage metric breakdown for a strategy execution via the UI
REST API (guide §7.1: executorRunTime / executorCpuTime / jvmGcTime /
shuffle bytes per stage — robust against box-weather wall noise).

    python tools/profile_stages.py [24|145|x100] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "145"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "11" if which != "x100" else "61")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.windowExec.buffer.in.memory.threshold", "1048576")
        .config("spark.sql.windowExec.buffer.spill.threshold", "2097152")
        .config("spark.driver.memory", "16g")
        .appName("profile-stages")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import all_indicators, force, strategy_indicators, tick_bars
    from pandas_ta_spark.plans.strategy import apply_strategy

    ticks = tick_bars(spark, sf_dir).repartition(11, "symbol")
    ticks.cache().count()
    if which == "x100":
        from pyspark.sql import functions as F
        rep = F.explode(F.sequence(F.lit(0), F.lit(99))).alias("rep")
        ticks = (ticks.select("*", rep)
                 .select(F.concat("symbol", F.lit("#"), F.col("rep"))
                         .alias("symbol"),
                         "ts", "open", "high", "low", "close", "volume"))
        ticks.cache().count()
    inds = strategy_indicators() if which in ("24", "x100") else all_indicators()

    def run():
        force(apply_strategy(ticks, inds, auto_chunk_rows=None))

    run()  # warm
    run()
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
            return json.loads(r.read())

    seen = {s["stageId"] for s in stages()}
    walls = []
    for _ in range(reps):
        t0 = time.time()
        run()
        walls.append(round(time.time() - t0, 3))
    total = {}
    for s in stages():
        if s["stageId"] in seen:
            continue
        key = (s["name"].split("\n")[0][:60])
        agg = total.setdefault(key, dict(n=0, tasks=0, run=0, cpu=0, gc=0,
                                         ser=0, des=0, sched=0,
                                         shr=0, shw=0, inp=0))
        agg["n"] += 1
        agg["tasks"] += s["numCompleteTasks"]
        agg["run"] += s["executorRunTime"]
        agg["cpu"] += s["executorCpuTime"] // 1_000_000
        agg["gc"] += s["jvmGcTime"]
        agg["ser"] += s["resultSerializationTime"]
        agg["des"] += s["executorDeserializeTime"]
        agg["shr"] += s["shuffleReadBytes"]
        agg["shw"] += s["shuffleWriteBytes"]
        agg["inp"] += s["inputBytes"]
    print(f"\nwalls={walls} (reps={reps})")
    print(f"{'stage':60s} {'n':>3} {'tasks':>5} {'run_s':>8} {'cpu_s':>8} "
          f"{'gc_s':>6} {'des_s':>6} {'shr_MB':>7} {'shw_MB':>7}")
    for k, a in sorted(total.items(), key=lambda kv: -kv[1]["run"]):
        print(f"{k:60s} {a['n']:>3} {a['tasks']:>5} {a['run']/1000:>8.2f} "
              f"{a['cpu']/1000:>8.2f} {a['gc']/1000:>6.2f} "
              f"{a['des']/1000:>6.2f} {a['shr']/1e6:>7.1f} {a['shw']/1e6:>7.1f}")
    grand = {k: sum(a[k] for a in total.values()) for k in
             ("run", "cpu", "gc", "des")}
    print(f"{'TOTAL':60s} {'':>3} {'':>5} {grand['run']/1000:>8.2f} "
          f"{grand['cpu']/1000:>8.2f} {grand['gc']/1000:>6.2f} "
          f"{grand['des']/1000:>6.2f}")


if __name__ == "__main__":
    main()
