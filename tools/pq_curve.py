"""PQ shortlist-width / recall curve (VERDICT r13 ask #9).

For each shortlist width R, measures mean/min recall@5 of the
ADC-shortlist + exact-rerank pipeline vs brute force at the base dir
(default sf0.01) and, when present, the x10 replica. Writes
PQ_CURVE.json — the evidence behind the production R_RERANK choice.

    python tools/pq_curve.py [--widths 25,50,100,200,400]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main() -> int:
    widths = [25, 50, 100, 200, 400]
    args = sys.argv[1:]
    if args and args[0] == "--widths":
        widths = [int(x) for x in args[1].split(",")]
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pandas_ta_spark.ext.similarity import R_RERANK, _pq_rerank_recall

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .appName("pq-curve").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    dirs = [("base", os.environ.get("CHECK_SF_DIR",
                                    "/root/testdata/sf0.01"))]
    x10 = "/tmp/sfx10_sf0.01"
    if os.path.isdir(x10):
        dirs.append(("x10", x10))

    report: dict = {"r_rerank_production": R_RERANK, "widths": {}}
    t0 = time.time()
    for r in widths:
        entry = {}
        for tag, d in dirs:
            row = (_pq_rerank_recall(spark, d, r_rerank=r)
                   .agg(F.avg("recall").alias("mean"),
                        F.min("recall").alias("min"),
                        F.count(F.lit(1)).alias("n")).first())
            entry[tag] = {"mean_recall": round(float(row["mean"]), 6),
                          "min_recall": round(float(row["min"]), 6),
                          "n_queries": int(row["n"])}
            print(f"R={r} {tag}: mean {entry[tag]['mean_recall']:.4f} "
                  f"min {entry[tag]['min_recall']:.4f}", flush=True)
        report["widths"][str(r)] = entry
    report["wall_sec"] = round(time.time() - t0, 1)
    out = os.path.join(REPO, "PQ_CURVE.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
