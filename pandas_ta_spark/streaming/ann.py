"""Online ANN serving: a stream of query vectors probed against the
session's trained IVF index (the batch index of ext/similarity).

The serving shape every resident vector engine runs: the index (K-row
centroid table + inverted file + vector relation) is a STATIC build
artifact trained once (`ext/similarity._ivf_lists`, cached per session);
queries arrive continuously and each micro-batch probes only the NPROBE
nearest inverted lists. Structured Streaming expresses this as
stream-static joins — the stream side stays tiny (queries), the static
side is the index — plus one watermarked per-query aggregation for the
top-k (append mode emits a query's result once its event-time window
closes).

Probe selection embeds the K centroids as literal expressions (collected
once at plan-build — exactly the "centroids live in server memory" of a
real ANN deployment; K is 8 rows). Candidate scoring reuses the same
left-associated dot products as the batch op, so stream results are
BIT-IDENTICAL to `_topk_ivf` for the same query vectors (parity-tested).

Scale notes: per-query candidates are ~NPROBE/K of the corpus, held as
one collect_list per (window, query) state entry until the watermark
closes the window — bounded by list sizes. For corpora where a single
list outgrows state comfort, pre-reduce with a coarser per-(query,
centroid) partial top-k before the final fold (the standard two-stage
top-k); the single-stage form keeps the plan minimal here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_topk_ivf(
    queries: DataFrame,
    spark: SparkSession,
    sf_dir: str,
    *,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Probe a query-vector stream against the session IVF index.

    ``queries`` needs (query_id, embedding array<float/double>,
    ingest_ts). Emits (window_start, query_id, match_id, rank, score)
    rows — the batch `_topk_ivf` columns plus the event-time window —
    once the query's window passes the watermark.

    Query ids share the corpus id namespace for parity with the batch
    gate op (a corpus vector with the same id is excluded as a
    self-match); external serving should namespace query ids disjointly,
    which makes the exclusion inert."""
    from pandas_ta_spark.ext.similarity import (
        NPROBE, TOP_K, _dot_str, _ivf_lists,
    )

    v, centn, lists = _ivf_lists(spark, sf_dir)

    q = queries.select(
        "query_id",
        "ingest_ts",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("qe"),
    )
    q = q.withColumn("qn", F.sqrt(F.expr(_dot_str("qe", "qe"))))

    # NPROBE nearest centroids per streamed query, as ONE expression over
    # the K collected centroid literals: sort ascending by
    # (-score, centroid_id) == score DESC, id ASC — the batch tie-break.
    cents = sorted(centn.collect(), key=lambda r: r["centroid_id"])
    probe_structs = []
    for r in cents:
        dot = " + ".join(
            f"qe[{i}] * CAST({float(r['ce'][i])!r} AS DOUBLE)"
            for i in range(len(r["ce"]))
        )
        score = f"(({dot}) / (qn * CAST({float(r['cn'])!r} AS DOUBLE)))"
        probe_structs.append(
            f"struct(-({score}) AS negscore, {int(r['centroid_id'])}L AS cid)"
        )
    probes = F.expr(
        "slice(array_sort(array(" + ", ".join(probe_structs) + f")), 1, {NPROBE})"
    )
    probed = (
        q.withColumn("p", F.explode(probes))
        .select("query_id", "ingest_ts", "qe", "qn",
                F.col("p.cid").alias("centroid_id"))
    )

    # stream-static joins: inverted lists supply candidate ids, the
    # vector relation supplies candidate embeddings; scoring is the
    # batch op's left-associated dot, so doubles agree bit-for-bit
    mv = lists.join(v, "vec_id").select(
        "centroid_id", F.col("vec_id").alias("match_id"),
        F.col("e").alias("me"), F.col("nrm").alias("mn"),
    )
    scored = (
        probed.join(mv, "centroid_id")
        .filter(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id", "ingest_ts", "match_id",
            (F.expr(_dot_str("qe", "me")) / (F.col("qn") * F.col("mn")))
            .alias("score"),
        )
    )

    # top-k fold per (event-time window, query): ascending sort of
    # (-score, match_id) structs == score DESC, match_id ASC
    folded = (
        scored.withWatermark("ingest_ts", watermark)
        .groupBy(F.window("ingest_ts", window).alias("w"), "query_id")
        .agg(F.collect_list(
            F.struct((-F.col("score")).alias("negscore"), "match_id")
        ).alias("cands"))
        .select(
            F.col("w.start").alias("window_start"), "query_id",
            F.posexplode(F.slice(F.array_sort("cands"), 1, TOP_K))
            .alias("pos", "c"),
        )
    )
    return folded.select(
        "window_start", "query_id",
        F.col("c.match_id").alias("match_id"),
        (F.col("pos") + 1).alias("rank"),
        (F.floor(-F.col("c.negscore") * 1e6 + F.lit(0.5)) / 1e6).alias("score"),
    )
