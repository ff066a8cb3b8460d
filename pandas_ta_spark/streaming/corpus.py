"""Streaming corpus curation: the LLM-pipeline ops as continuous queries.

A training-data pipeline at 100 TB is rarely a one-shot batch — documents
arrive continuously. These are the streaming twins of the ext/ batch ops:

- exact dedup as `dropDuplicatesWithinWatermark` on the text hash: state
  holds one entry per distinct hash and EXPIRES at the watermark, so an
  unbounded stream runs with bounded state (the batch twin is
  ext/dedup._dedup_exact);
- quality filtering reuses the EXACT batch Column expressions
  (ext/text.quality_exprs) — stateless, so batch/stream parity is by
  construction, not re-implementation;
- per-source token telemetry as a watermarked tumbling-window aggregate
  (the corpus analogue of stream_bars).

All keyed state hashes on uniform md5/source keys — no skew at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(docs: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """First-seen exact dedup on a document stream.

    Input needs (doc_id, text, ingest_ts). Emits only the first document
    per normalized-text hash; later copies are dropped while their hash is
    in state, and state older than the watermark is evicted — the
    deliberate streaming tradeoff (a dup arriving later than the watermark
    gap passes; the periodic batch job catches it)."""
    h = F.md5(F.lower(F.trim(F.col("text"))))
    return (
        docs.select("doc_id", "text", "ingest_ts", h.alias("text_hash"))
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def stream_quality_keep(docs: DataFrame) -> DataFrame:
    """Streaming quality filter: the batch scoring expressions applied to
    a stream (stateless projection+filter — survives any micro-batch
    boundary trivially). Emits scored keepers only."""
    from pandas_ta_spark.ext.text import quality_exprs

    q = quality_exprs()
    return (
        docs.select(
            "doc_id",
            q["n_tokens"].alias("n_tokens"),
            q["quality_score"].alias("quality_score"),
            q["keep"].alias("keep"),
        )
        # reuse the batch-side keep expression verbatim: batch/stream
        # parity holds by construction even if the threshold changes
        .filter(F.col("keep") == 1)
        .drop("keep")
    )


def stream_token_rate(docs: DataFrame, window: str = "1 hour",
                      watermark: str = "2 hours") -> DataFrame:
    """Per-source token throughput in tumbling event-time windows — the
    corpus-ingest telemetry query (docs/sec and tokens/sec per source,
    late data handled by the watermark)."""
    n_tok = F.size(F.split(F.lower(F.trim(F.col("text"))), " ")).cast("long")
    return (
        docs.select("source", "ingest_ts", n_tok.alias("n_tok"))
        .withWatermark("ingest_ts", watermark)
        .groupBy("source", F.window("ingest_ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .select("source", F.col("w.start").alias("window_start"),
                "n_docs", "n_tokens")
    )


def stream_split_assign(docs: DataFrame) -> DataFrame:
    """Streaming train/val/test assignment: the batch split Column
    applied to a document stream. Stateless projection — deterministic
    across micro-batch boundaries, restarts, and reprocessing, because
    the assignment hashes only the doc id (never arrival order or
    time)."""
    from pandas_ta_spark.ext.sampling import split_expr

    return docs.select("doc_id", "text", split_expr().alias("split"))
