"""Build an Nx-replicated copy of an sf dir for scale-up oracle checks.

The gate proves Spark == DuckDB at sf0.01/sf0.1; scale-DEPENDENT
divergence (fixed-point overflow like the r6 BETA_SCALE class,
partition-count effects, window-buffer paths) only shows up on larger
inputs. This writes /tmp/sfx<N>_<base>: documents/embeddings/events
replicated Nx with DISTINCT ids (texts token-salted per replica so
dedup structure grows linearly, embeddings perturbed so geometry stays
non-degenerate, events id-shifted on the same timeline so the bar grid
keeps its shape at Nx volume), and the small TPC-H tables copied
through. Then:

    python tools/make_x10.py [sf_dir] [n]
    CHECK_SF_DIR=/tmp/sfx10_sf0.1 python tools/check.py <keys>
    CHECK_SF_DIR=/tmp/sfx100_sf0.01 python tools/check.py <keys>

Replica ids are OFFSET, not interleaved: doc_id = orig + (max+1)*rep.
The old orig*10+rep scheme made doc_id % 10 == rep, so the FUZZY eval
split (doc_id % 10 == 7) selected exactly replica 7 — and per-replica
token salting means replica-7 fingerprints only match replica-7 docs,
all of which were eval: contamination keys compared empty-vs-empty and
the scale evidence was vacuous (ADVICE r9). Offsetting preserves each
replica's original mod-10 eval/train mix, so every replica contributes
matched contamination pairs; the build asserts that below.
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
    n_rep = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    base = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/sfx{n_rep}_{base}"
    os.makedirs(out, exist_ok=True)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName(f"make-x{n_rep}").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pandas_ta_spark.sources.bars import load_table

    rep = F.explode(F.sequence(F.lit(0), F.lit(n_rep - 1))).alias("rep")

    def offset(col: str, stride: int):
        """orig + (max+1)*rep: distinct across replicas. Replica r's
        mod-10 residues are the original's ROTATED by (stride*rep) % 10
        — not preserved per-doc, but every replica keeps a full residue
        mix, so the FUZZY eval/train split lands in every replica (the
        invariant the build asserts below)."""
        return (F.col(col) + F.lit(stride) * F.col("rep")).alias(col)

    docs = load_table(spark, sf_dir, "documents")
    doc_stride = docs.agg(F.max("doc_id")).first()[0] + 1
    salted = F.array_join(
        F.transform(F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.col("rep").cast("string"))),
        " ")
    (docs.select("*", rep)
         .select(offset("doc_id", doc_stride),
                 salted.alias("text"), "lang", "source",
                 F.length(salted).alias("n_chars"))
         .coalesce(1)
         .write.mode("overwrite").parquet(f"{out}/_documents_dir"))
    _flatten(out, "documents")

    emb = load_table(spark, sf_dir, "embeddings")
    vec_stride = emb.agg(F.max("vec_id")).first()[0] + 1
    pert = F.transform(F.col("embedding"),
                       lambda x: x + F.col("rep").cast("double") * F.lit(0.001))
    (emb.select("*", rep)
        .select(offset("vec_id", vec_stride),
                pert.alias("embedding"), "label")
        .coalesce(1)
        .write.mode("overwrite").parquet(f"{out}/_embeddings_dir"))
    _flatten(out, "embeddings")

    ev = load_table(spark, sf_dir, "events")
    ev_stride = ev.agg(F.max("event_id")).first()[0] + 1
    user_stride = ev.agg(F.max("user_id")).first()[0] + 1
    (ev.select("*", rep)
       .select(offset("event_id", ev_stride), "ts",
               offset("user_id", user_stride),
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

    # The replica scheme's contract (ADVICE r9): every replica must carry
    # BOTH eval- and train-split docs, or the FUZZY contamination keys'
    # scale evidence is vacuous (empty-vs-empty).
    from pandas_ta_spark.ext.dedup import FUZZY_EVAL_MOD, FUZZY_EVAL_REM

    split = (spark.read.parquet(f"{out}/documents.parquet")
             .groupBy((F.col("doc_id") / doc_stride).cast("long").alias("rep"),
                      (F.col("doc_id") % FUZZY_EVAL_MOD == FUZZY_EVAL_REM)
                      .alias("is_eval"))
             .count().collect())
    per_rep: dict[int, set[bool]] = {}
    for row in split:
        per_rep.setdefault(row["rep"], set()).add(row["is_eval"])
    assert len(per_rep) == n_rep, sorted(per_rep)
    for r, sides in per_rep.items():
        assert sides == {True, False}, (
            f"replica {r} lacks an eval/train mix: {sides}")
    print(out)


if __name__ == "__main__":
    main()
