"""Decompose the all-145 strategy wall (VERDICT r13 ask #3: r11 6.77s ->
r13 ~8-10s at a fixed 153-op workload; find where the ~2s went).

Sections (median of 5 after 2 warmups, bench protocol, bench config):
  plan_build      — python-side apply_strategy() plan construction only
  full            — the bench headline (all 145+ ind, one plan)
  no_candles      — same strategy minus every candles-category indicator
  candles_only    — just the candle indicators (66-pattern bulk + 6
                    standalone multi-bar + doji/inside/z/ha/ebsw)
  full_nocodegen  — full with whole-stage codegen OFF (isolates janino
                    compile + huge-method fallback effects)

Run on a quiet box: python tools/profile_all145.py
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
        .appName("profile-all145")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import all_indicators, force, tick_bars
    from pandas_ta_spark.plans.strategy import apply_strategy

    ticks = tick_bars(spark, sf_dir).repartition(8)
    ticks.cache().count()

    inds = all_indicators()
    candles = [i for i in inds if i.category == "candles"]
    rest = [i for i in inds if i.category != "candles"]
    print(f"inds={len(inds)} candles={len(candles)} rest={len(rest)}",
          flush=True)

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

    t0 = time.time()
    for _ in range(3):
        apply_strategy(ticks, inds, auto_chunk_rows=None)
    out["plan_build_sec"] = round((time.time() - t0) / 3, 3)
    print(f"plan_build {out['plan_build_sec']}", flush=True)

    for name, workload in (
            ("full", inds), ("no_candles", rest), ("candles_only", candles)):
        m, ts = bench_fn(
            lambda w=workload: force(
                apply_strategy(ticks, w, auto_chunk_rows=None)))
        out[name] = {"median": m, "reps": ts}
        print(f"{name} {m} {ts}", flush=True)

    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    m, ts = bench_fn(
        lambda: force(apply_strategy(ticks, inds, auto_chunk_rows=None)))
    out["full_nocodegen"] = {"median": m, "reps": ts}
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    print(f"full_nocodegen {m} {ts}", flush=True)

    out["overlap_sec"] = round(
        out["no_candles"]["median"] + out["candles_only"]["median"]
        - out["full"]["median"], 3)
    print(json.dumps({"metric": "all145_profile", **out}))


if __name__ == "__main__":
    main()
