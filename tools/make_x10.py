"""Build a 10x-replicated copy of an sf dir for scale-up oracle checks.

The gate proves Spark == DuckDB at sf0.01/sf0.1; scale-DEPENDENT
divergence (fixed-point overflow like the r6 BETA_SCALE class,
partition-count effects, window-buffer paths) only shows up on larger
inputs. This writes /tmp/sfx10_<base>: documents/embeddings/events
replicated 10x with DISTINCT ids (texts token-salted per replica so
dedup structure grows linearly, embeddings perturbed so geometry stays
non-degenerate, events id-shifted on the same timeline so the bar grid
keeps its shape at 10x volume), and the small TPC-H tables copied
through. Then:

    python tools/make_x10.py [sf_dir]
    CHECK_SF_DIR=/tmp/sfx10_sf0.1 python tools/check.py <keys>
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))




def _flatten(out: str, name: str) -> None:
    """Spark writes a part-file directory; check.py's DuckDB views read
    single files (`FROM '<dir>/<t>.parquet'`) — collapse the coalesce(1)
    output to one flat file under the exact table name."""
    d = f"{out}/_{name}_dir"
    part = glob.glob(f"{d}/part-*.parquet")
    assert len(part) == 1, part
    target = f"{out}/{name}.parquet"
    if os.path.isdir(target):
        shutil.rmtree(target)
    shutil.move(part[0], target)
    shutil.rmtree(d)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    base = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/sfx10_{base}"
    os.makedirs(out, exist_ok=True)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("make-x10").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandas_ta_spark.sources.bars import load_table

    rep = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep")

    docs = load_table(spark, sf_dir, "documents")
    salted = F.array_join(
        F.transform(F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.col("rep").cast("string"))),
        " ")
    (docs.select("*", rep)
         .select((F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
                 salted.alias("text"), "lang", "source",
                 F.length(salted).alias("n_chars"))
         .coalesce(1)
         .write.mode("overwrite").parquet(f"{out}/_documents_dir"))
    _flatten(out, "documents")

    emb = load_table(spark, sf_dir, "embeddings")
    pert = F.transform(F.col("embedding"),
                       lambda x: x + F.col("rep").cast("double") * F.lit(0.001))
    (emb.select("*", rep)
        .select((F.col("vec_id") * 10 + F.col("rep")).alias("vec_id"),
                pert.alias("embedding"), "label")
        .coalesce(1)
        .write.mode("overwrite").parquet(f"{out}/_embeddings_dir"))
    _flatten(out, "embeddings")

    ev = load_table(spark, sf_dir, "events")
    (ev.select("*", rep)
       .select((F.col("event_id") * 10 + F.col("rep")).alias("event_id"),
               "ts",
               (F.col("user_id") * 10 + F.col("rep")).alias("user_id"),
               "event_type", "value", "props")
       .coalesce(1)
       .write.mode("overwrite").parquet(f"{out}/_events_dir"))
    _flatten(out, "events")

    from pandas_ta_spark.sources.bars import TABLES

    replicated = {"documents", "embeddings", "events"}
    for t in [t for t in TABLES if t not in replicated]:
        src = f"{sf_dir}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)
    print(out)


if __name__ == "__main__":
    main()
