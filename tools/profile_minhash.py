"""Isolated profile of dedup_minhash_lsh + shard_pack_tokens at sf0.1.

Times each stage of the minhash derivation separately to find where the
r5 regression (3.04s vs 1.32s r3) lives. Run uncontended.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "61")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.showConsoleProgress", "false")
    .appName("minhash-profile")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F

from pandas_ta_spark.ext import SUITE as EXT
from pandas_ta_spark.ext import dedup as D
from pandas_ta_spark.sources.bars import load_table


def t(label, fn):
    t0 = time.time()
    r = fn()
    dt = time.time() - t0
    print(f"{label:40s} {dt:7.3f}s  {r if isinstance(r, int) else ''}")
    return r


def force(df):
    df.write.format("noop").mode("overwrite").save()


# warm JVM + scan
docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
t("warm: docs count", lambda: docs.count())
t("warm: docs count again", lambda: docs.count())

# stage timings (fresh, no persist)
sh_plain = D._shingles_spark(docs)
t("shingles distinct (no persist)", lambda: sh_plain.count())

from pyspark import StorageLevel

sh = D._shingles_spark(docs).persist(StorageLevel.MEMORY_AND_DISK)
t("shingles persist+count", lambda: sh.count())

mins = [
    F.min(F.substring(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle"))), 1, 8)).alias(f"mh{j}")
    for j in range(D.N_HASHES)
]
sig = sh.groupBy("doc_id").agg(*mins, F.count(F.lit(1)).alias("n_sh"))
t("signatures from persisted sh", lambda: sig.count())
sig_p = sig.persist(StorageLevel.MEMORY_AND_DISK)
t("signatures persist+count", lambda: sig_p.count())
sh.unpersist()
sig_p.unpersist()

# full query, 3 cold runs (what bench measures)
for i in range(3):
    t(f"full dedup_minhash_lsh run {i}", lambda: force(EXT["dedup_minhash_lsh"].query(spark, sf_dir)))

# shard_pack isolated, 3 runs
for i in range(3):
    t(f"shard_pack_tokens run {i}", lambda: force(EXT["shard_pack_tokens"].query(spark, sf_dir)))

spark.stop()
