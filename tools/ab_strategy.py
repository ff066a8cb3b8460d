"""Interleaved A/B of the strategy headline queries (r15, VERDICT r14
ask #2: adjudicate the ROLL absorption on wall clock).

Runs the three driver-benched strategy shapes in ONE session with the
bench's exact confs/caching and prints one `ABJSON {...}` line. The
driver loop (tools/ab_loop.sh) runs this script alternately from two
checkouts (HEAD vs the pre-absorption parent) so box-weather noise is
sampled identically by both variants.

    python tools/ab_strategy.py <repo_dir> [label]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(sys.argv[1]) if len(sys.argv) > 1 else \
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LABEL = sys.argv[2] if len(sys.argv) > 2 else os.path.basename(REPO)
sys.path.insert(0, REPO)
os.chdir(REPO)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "61")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.windowExec.buffer.in.memory.threshold", "1048576")
        .config("spark.sql.windowExec.buffer.spill.threshold", "2097152")
        .config("spark.driver.memory", "16g")
        .appName(f"ab-strategy-{LABEL}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from bench import all_indicators, force, strategy_indicators, tick_bars
    from pandas_ta_spark.plans.strategy import apply_strategy

    ticks = tick_bars(spark, sf_dir).repartition(61, "symbol")
    ticks.cache().count()
    strat24 = strategy_indicators()
    all_inds = all_indicators()

    def timed(build, warm, n):
        for _ in range(warm):
            force(build())
        reps = []
        for _ in range(n):
            t0 = time.time()
            force(build())
            reps.append(round(time.time() - t0, 3))
        return reps

    spark.conf.set("spark.sql.shuffle.partitions", "11")
    r24 = timed(lambda: apply_strategy(ticks, strat24), 3, 7)
    r145 = timed(lambda: apply_strategy(ticks, all_inds), 1, 5)
    spark.conf.set("spark.sql.shuffle.partitions", "61")

    rep = F.explode(F.sequence(F.lit(0), F.lit(99))).alias("rep")
    rep_df = (
        ticks.select("*", rep)
        .select(
            F.concat("symbol", F.lit("#"), F.col("rep")).alias("symbol"),
            "ts", "open", "high", "low", "close", "volume",
        )
    )
    rep_df.cache().count()
    rx100 = timed(lambda: apply_strategy(rep_df, strat24), 0, 3)
    rep_df.unpersist(blocking=True)

    def med(v):
        return sorted(v)[len(v) // 2]

    print("ABJSON " + json.dumps({
        "label": LABEL, "repo": REPO,
        "r24": r24, "r145": r145, "rx100": rx100,
        "med24": med(r24), "med145": med(r145), "minx100": min(rx100),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
