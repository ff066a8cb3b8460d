"""NPROBE/K recall-latency curve for the IVF ANN index (VERDICT r7 ask #4).

Recall@5 at the shipped setting (K=8, NPROBE=2) is structurally capped
by NPROBE/K — the probe scans ~NPROBE/K of the corpus, and a neighbor
whose list isn't probed is unreachable no matter how good training is.
This tool MEASURES the trade-off a 100 TB operator prices before
changing serving defaults: for each (K_CENTROIDS, NPROBE) point it
rebuilds/reuses the session index, runs the exact `_ivf_recall`
composition (IVF vs brute-force top-5) and times the steady-state probe
(best of 3 after an untimed warm/build call).

The sweep monkeypatches the module constants — bench-only telemetry;
the oracle gate always runs at the shipped constants (both the Spark
query and the DuckDB oracle read the same module values, so parity is
insensitive to what ships, but CI pins the measured defaults).

Usage: python tools/ivf_curve.py [sf_dir]
Prints one JSON line per point + a final summary line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("ivf-curve")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandas_ta_spark.ext import similarity as S

    shipped = (S.K_CENTROIDS, S.NPROBE)
    points = []
    try:
        for k in (8, 16):
            S.K_CENTROIDS = k
            # new coarse quantizer => rebuild the index for this K
            S._IVF_CACHE.clear()
            S.NPROBE = 1
            t0 = time.time()
            force(S._topk_ivf(spark, SF_DIR))  # builds + first probe
            build_sec = round(time.time() - t0, 3)
            for nprobe in (1, 2, 3, 4, 6, 8):
                if nprobe > k:
                    continue
                S.NPROBE = nprobe
                rec = (S._ivf_recall(spark, SF_DIR)
                       .agg({"recall": "avg"}).collect()[0][0])
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    force(S._topk_ivf(spark, SF_DIR))
                    best = min(best, time.time() - t0)
                pt = {"k_centroids": k, "nprobe": nprobe,
                      "recall_at_5": round(float(rec), 4),
                      "probe_sec": round(best, 3),
                      "frac_scanned": round(nprobe / k, 3)}
                if nprobe == 1:
                    pt["build_plus_first_probe_sec"] = build_sec
                points.append(pt)
                print(json.dumps(pt), flush=True)
    finally:
        S.K_CENTROIDS, S.NPROBE = shipped
        S._IVF_CACHE.clear()
    print(json.dumps({"sf_dir": SF_DIR, "shipped": {
        "k_centroids": shipped[0], "nprobe": shipped[1]}, "curve": points}))


if __name__ == "__main__":
    main()
