"""Training-data curation ops: deterministic sampling + shard packing.

The corpus-side complement to dedup/similarity (SURVEY.md §7.5): once a
100 TB corpus is deduped and quality-filtered, a training pipeline still
needs (a) reproducible downsampling — per-source rates, no RNG state, any
re-run or backfill selects the SAME documents; (b) stratified quotas —
bounded doc counts per (lang, source) cell; (c) packing documents into
fixed token-budget shards for sequence-packing data loaders.

Determinism rules: selection is by md5 (identical hex in both engines),
compared LEXICOGRAPHICALLY (no portable hex->int across engines — see
ext/__init__ docstring); shard cumsums are exact BIGINT token counts, so
partition merge order cannot change a shard boundary.

100 TB shape: hash sampling and quota filters are one scan + one window
or filter (no shuffle for the hash filter — it pushes into the scan
stage); shard packing shuffles once on the pack key (source) and runs one
window cumsum per partition. All pure built-ins — whole-stage codegen,
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_ta_spark.ext import ExtQuery
from pandas_ta_spark.operators.base import round_col, sql_round
from pandas_ta_spark.sources.bars import load_table

# per-source keep thresholds on the first 2 hex chars of md5(doc key):
# substr(md5,1,2) is uniform over 256 values; threshold 'T' keeps
# int('T',16)/256 of the source's docs (src0 -> 20%, src1 -> 80%, ...).
SAMPLE_THRESHOLDS = {"src0": "33", "src1": "cc", "src2": "80", "src3": "1a"}
SAMPLE_DEFAULT = "66"
QUOTA_PER_CELL = 3
SHARD_TOKEN_BUDGET = 500


def _doc_hash():
    # hash the doc_id rendered as a string with a fixed salt: independent
    # of text content (a near-identical doc pair must not co-select), and
    # identical int->string rendering in both engines
    return F.md5(F.concat(F.lit("sample|"), F.col("doc_id").cast("string")))


def _sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-source downsampling: keep iff the first 2 hex
    chars of md5('sample|' || doc_id) sort below the source's threshold.
    A pure filter — pipelines into the scan, no shuffle, and any executor
    count or re-run selects the identical document set."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    h2 = F.substring(_doc_hash(), 1, 2)
    thr = F.lit(SAMPLE_DEFAULT)
    for src, t in SAMPLE_THRESHOLDS.items():
        thr = F.when(F.col("source") == src, F.lit(t)).otherwise(thr)
    return (
        docs.select("doc_id", "source", (h2 < thr).cast("int").alias("sampled"))
    )


def _sample_hash_oracle() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN '{t}'" for s, t in SAMPLE_THRESHOLDS.items()
    )
    return f"""
SELECT doc_id, source,
       CASE WHEN substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 2)
                 < (CASE {cases} ELSE '{SAMPLE_DEFAULT}' END)
            THEN 1 ELSE 0 END AS sampled
FROM documents
""".strip()


def _sample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified quota: at most QUOTA_PER_CELL docs per (lang, source)
    cell, chosen by hash order (deterministic shuffle) with doc_id as the
    final tiebreak. One window over the cell key — at scale the cells are
    the natural partition and the quota bounds every cell's output."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    w = Window.partitionBy("lang", "source").orderBy(_doc_hash(), "doc_id")
    return (
        docs.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= QUOTA_PER_CELL)
        .select("doc_id", "lang", "source", "pick")
    )


def _sample_quota_oracle() -> str:
    return f"""
SELECT doc_id, lang, source, pick FROM (
    SELECT doc_id, lang, source,
           row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5('sample|' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS pick
    FROM documents
) WHERE pick <= {QUOTA_PER_CELL}
""".strip()


def _shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed token-budget shards per source: docs are
    laid out in doc_id order, shard_id = exclusive-prefix-sum(tokens) div
    budget — the streaming-friendly first-fit layout a sequence-packing
    loader consumes. Token counts are exact BIGINTs, so the window cumsum
    is order-stable across engines and executor merges. Output is the
    shard manifest (docs + tokens per shard)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    n_tok = F.size(F.split(F.lower(F.trim(F.col("text"))), " ")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    per_doc = (
        docs.select("doc_id", "source", n_tok.alias("n_tok"))
        .select(
            "doc_id", "source", "n_tok",
            F.floor(excl / F.lit(SHARD_TOKEN_BUDGET)).cast("long").alias("shard_id"),
        )
    )
    return (
        per_doc.groupBy("source", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )


def _shard_pack_oracle() -> str:
    return f"""
WITH tok AS (
    SELECT doc_id, source,
           CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tok
    FROM documents
),
placed AS (
    SELECT doc_id, source, n_tok,
           CAST(floor(
               coalesce(sum(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {SHARD_TOKEN_BUDGET}
           ) AS BIGINT) AS shard_id
    FROM tok
)
SELECT source, shard_id, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id
FROM placed GROUP BY source, shard_id
""".strip()


def _curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline as ONE composed query:

        survivors = dedup keep-list  ∧  quality keep  ∧  hash sample
        output    = survivors packed into token-budget shards

    Each stage is the already-oracled operator reused verbatim — the point
    is composition: Catalyst fuses the quality/sample filters into one
    scan-side projection and the pipeline stays a single plan (no
    intermediate materialization a hand-rolled pipeline would pay).
    """
    from pandas_ta_spark.ext.dedup import _dedup_keep_list
    from pandas_ta_spark.ext.text import quality_exprs

    kept = _dedup_keep_list(spark, sf_dir).filter(F.col("kept") == 1).select("doc_id")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    q = quality_exprs()
    h2 = F.substring(_doc_hash(), 1, 2)
    thr = F.lit(SAMPLE_DEFAULT)
    for src, t in SAMPLE_THRESHOLDS.items():
        thr = F.when(F.col("source") == src, F.lit(t)).otherwise(thr)
    survivors = (
        docs.join(kept, "doc_id")
        .filter((q["keep"] == 1) & (h2 < thr))
        .select("doc_id", "source", q["n_tokens"].cast("long").alias("n_tok"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    placed = survivors.select(
        "doc_id", "source", "n_tok",
        F.floor(excl / F.lit(SHARD_TOKEN_BUDGET)).cast("long").alias("shard_id"),
    )
    return placed.groupBy("source", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )


def _curation_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation decision WITH per-clause flags — the batch
    form of the streaming curation gate's output (r8), over the corpus
    itself: (q_keep, s_keep, exact_keep, near_dup, keep). Value-checking
    this against an independently-composed DuckDB oracle pins the gate
    clause logic (keep-list id rule, hash sample, exact-min ownership)
    the streaming parity tests rely on."""
    from pyspark.sql import functions as F

    from pandas_ta_spark.streaming.corpus import _curation_marked

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .withColumn("ingest_ts",
                    F.lit("2026-01-01 00:00:00").cast("timestamp"))
    )
    marked = _curation_marked(docs, spark, sf_dir)
    return (
        marked.groupBy("doc_id")
        .agg(
            F.first("q_keep").cast("int").alias("q_keep"),
            F.first("s_keep").cast("int").alias("s_keep"),
            F.first("exact_keep").cast("int").alias("exact_keep"),
            F.max(F.coalesce("hit", F.lit(0))).alias("near_dup"),
        )
        .select(
            "doc_id", "q_keep", "s_keep", "exact_keep", "near_dup",
            ((F.col("q_keep") == 1) & (F.col("s_keep") == 1)
             & (F.col("exact_keep") == 1) & (F.col("near_dup") == 0))
            .cast("int").alias("keep"),
        )
    )


def _curation_decisions_oracle() -> str:
    from pandas_ta_spark.ext.dedup import _pair_ctes
    from pandas_ta_spark.ext.text import _STOP_IN

    cases = " ".join(
        f"WHEN source = '{s}' THEN '{t}'" for s, t in SAMPLE_THRESHOLDS.items()
    )
    return f"""
WITH {_pair_ctes()},
near AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
keepers AS (
    SELECT min(doc_id) AS doc_id FROM documents
    GROUP BY md5(lower(trim(text)))
),
q AS (
    SELECT doc_id,
           CAST((CASE WHEN len(toks) >= 10 AND len(toks) <= 1000
                      THEN 0.4 ELSE 0.0 END
                 + CASE WHEN len(list_distinct(toks)) / len(toks) >= 0.2
                        THEN 0.3 ELSE 0.0 END
                 + CASE WHEN len(list_filter(toks, x -> x IN ({_STOP_IN})))
                             / len(toks) BETWEEN 0.01 AND 0.5
                        THEN 0.3 ELSE 0.0 END) >= 0.7 AS INT) AS q_keep
    FROM tok
),
base AS (
    SELECT d.doc_id, q.q_keep,
           CAST(substring(md5('sample|' || CAST(d.doc_id AS VARCHAR)), 1, 2)
                < (CASE {cases} ELSE '{SAMPLE_DEFAULT}' END) AS INT) AS s_keep,
           CAST(k.doc_id IS NOT NULL AS INT) AS exact_keep,
           CAST(n.doc_id IS NOT NULL AS INT) AS near_dup
    FROM documents d
    JOIN q ON q.doc_id = d.doc_id
    LEFT JOIN keepers k ON k.doc_id = d.doc_id
    LEFT JOIN near n ON n.doc_id = d.doc_id
)
SELECT doc_id, q_keep, s_keep, exact_keep, near_dup,
       CAST(q_keep = 1 AND s_keep = 1 AND exact_keep = 1 AND near_dup = 0
            AS INT) AS keep
FROM base
""".strip()


def _curation_pipeline_oracle() -> str:
    from pandas_ta_spark.ext.dedup import _pair_ctes
    from pandas_ta_spark.ext.text import _STOP_IN

    cases = " ".join(
        f"WHEN source = '{s}' THEN '{t}'" for s, t in SAMPLE_THRESHOLDS.items()
    )
    return f"""
WITH {_pair_ctes()},
near AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
keepers AS (
    SELECT min(doc_id) AS doc_id FROM documents
    GROUP BY md5(lower(trim(text)))
),
quality AS (
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tok,
           (CASE WHEN len(toks) >= 10 AND len(toks) <= 1000 THEN 0.4 ELSE 0.0 END
            + CASE WHEN len(list_distinct(toks)) / len(toks) >= 0.2
                   THEN 0.3 ELSE 0.0 END
            + CASE WHEN len(list_filter(toks, x -> x IN ({_STOP_IN}))) / len(toks)
                        BETWEEN 0.01 AND 0.5
                   THEN 0.3 ELSE 0.0 END) AS score
    FROM tok
),
survivors AS (
    SELECT d.doc_id, d.source, q.n_tok
    FROM documents d
    JOIN keepers k ON k.doc_id = d.doc_id
    JOIN quality q ON q.doc_id = d.doc_id
    WHERE d.doc_id NOT IN (SELECT doc_id FROM near)
      AND q.score >= 0.7
      AND substr(md5('sample|' || CAST(d.doc_id AS VARCHAR)), 1, 2)
            < (CASE {cases} ELSE '{SAMPLE_DEFAULT}' END)
),
placed AS (
    SELECT doc_id, source, n_tok,
           CAST(floor(
               coalesce(sum(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {SHARD_TOKEN_BUDGET}
           ) AS BIGINT) AS shard_id
    FROM survivors
)
SELECT source, shard_id, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id
FROM placed GROUP BY source, shard_id
""".strip()


def _mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced mixture: downsample every language to the size of
    the SMALLEST language (uniform mixing weights), picking docs by
    deterministic hash order. Unlike ``sample_hash`` (fixed thresholds),
    the keep quota is COMPUTED from the data: one tiny aggregate
    (count per lang -> min) broadcast against the ranked corpus. At scale
    that aggregate is a few rows regardless of corpus size; the only real
    shuffle is the per-lang ranking window."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    quota = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_lang"))
        .agg(F.min("n_lang").alias("quota"))
    )
    w = Window.partitionBy("lang").orderBy(_doc_hash(), "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(quota))
        .select(
            "doc_id", "lang",
            (F.col("rk") <= F.col("quota")).cast("int").alias("picked"),
        )
    )


def _mix_rebalance_oracle() -> str:
    return """
WITH q AS (
    SELECT min(n_lang) AS quota
    FROM (SELECT count(*) AS n_lang FROM documents GROUP BY lang)
),
r AS (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('sample|' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS rk
    FROM documents
)
SELECT doc_id, lang,
       CASE WHEN rk <= q.quota THEN 1 ELSE 0 END AS picked
FROM r, q
""".strip()


# --------------------------------------------------- train/val/test split ----

SPLIT_TRAIN_PCT = 90
SPLIT_VAL_PCT = 5  # remainder is test


def split_expr():
    """The train/val/test assignment Column — shared verbatim by the
    batch query and the streaming twin (stream_split_assign), so
    batch/stream parity holds by construction."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))), 1, 8),
        16, 10,
    ).cast("bigint")
    bucket = h % 100
    return (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )


def _split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = the first 8 hex
    chars of md5('split|' || doc_id) mod 100. A pure projection — no
    shuffle, pushes into the scan, identical on any rerun/executor count,
    and independent of the sampling salt so split and sampling decisions
    are uncorrelated. The eval-leakage complement to the dedup keep-list:
    assignment by content-independent id hash never moves a doc between
    splits when its text is edited."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return docs.select("doc_id", "source", split_expr().alias("split"))


def _split_assign_oracle() -> str:
    return f"""
SELECT doc_id, source,
       CASE WHEN b < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN b < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM (
    SELECT doc_id, source,
           CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8)
                AS BIGINT) % 100 AS b
    FROM documents
)
""".strip()


# ------------------------------------------- temperature mixing weights ----

SQRT_SCALE = 1_000_000  # sqrt(n) quantization: exact-integer weight sums


def _mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixing weights, T=2 (alpha=0.5): the
    multilingual-pretraining upsampling rule w_l = n_l^0.5 / sum n^0.5
    (mBERT/XLM-R style) that lifts low-resource languages without the
    flattening of ``mix_rebalance_lang``'s uniform quota. Emits, per
    language: raw share p, temperature weight w, the boost factor w/p,
    and the expected document count at the reweighted mix.

    alpha=0.5 is chosen deliberately: sqrt is IEEE-exact in BOTH engines
    (a general pow(n, 0.3) goes through exp/ln whose last ulp is libm-
    specific), and quantizing sqrt(n) to 1e-6 BIGINTs makes the
    normalizing sum EXACT-integer — associative, so any aggregation
    order gives the same total. Every emitted double is then a single
    division (or multiply+floor) of exact integers: bit-identical
    cross-engine, no rounding-boundary lottery.

    Plan shape at 100 TB: one count-by-lang aggregate (map-side partial),
    a 1-row total broadcast back — no shuffle of the corpus itself; the
    weights table this emits is what ``sample_stratified_quota``-style
    samplers consume downstream."""
    docs = load_table(spark, sf_dir, "documents").select("lang")
    per = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    s = F.floor(F.sqrt(F.col("n_docs").cast("double")) * SQRT_SCALE
                + F.lit(0.5)).cast("long")
    per = per.withColumn("s", s)
    tot = per.agg(F.sum("n_docs").alias("tot_n"), F.sum("s").alias("tot_s"))
    w = F.col("s").cast("double") / F.col("tot_s")
    return per.crossJoin(F.broadcast(tot)).select(
        "lang", "n_docs",
        round_col(F.col("n_docs").cast("double") / F.col("tot_n"))
        .alias("share"),
        round_col(w).alias("weight"),
        # boost = w/p computed DIVISION-FIRST: the integer products
        # s*tot_n / tot_s*n_docs wrap int64 around 4e8 docs/language
        # (Spark non-ANSI wraps silently, DuckDB raises — the d5b5572
        # cross-engine divergence class)
        round_col((F.col("s").cast("double") / F.col("tot_s"))
                  / (F.col("n_docs").cast("double") / F.col("tot_n")))
        .alias("boost"),
        F.floor(w * F.col("tot_n") + F.lit(0.5)).cast("long")
        .alias("expected_docs"),
    )


def _mix_temperature_oracle() -> str:
    return f"""
WITH per AS (
    SELECT lang, count(*) AS n_docs,
           CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * {SQRT_SCALE}
                      + 0.5) AS BIGINT) AS s
    FROM documents GROUP BY 1
),
tot AS (SELECT sum(n_docs) AS tot_n, sum(s) AS tot_s FROM per)
SELECT lang, n_docs,
       {sql_round('CAST(n_docs AS DOUBLE) / tot_n')} AS share,
       {sql_round('CAST(s AS DOUBLE) / tot_s')} AS weight,
       {sql_round('(CAST(s AS DOUBLE) / tot_s) / (CAST(n_docs AS DOUBLE) / tot_n)')} AS boost,
       CAST(floor(CAST(s AS DOUBLE) / tot_s * tot_n + 0.5) AS BIGINT)
           AS expected_docs
FROM per, tot
""".strip()


EPOCH_BUDGET_X = 3  # token budget = 3x the corpus (the "how many epochs
                    # can each source sustain" planning question)


def _mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch plan per source for a temperature-weighted token budget —
    the pretraining-mix planning table: given BUDGET = EPOCH_BUDGET_X x
    total corpus tokens and sqrt-temperature source weights (same
    alpha=0.5 IEEE-exactness rationale as `mix_temperature_sqrt`), how
    many tokens each source is allotted and how many EPOCHS (passes
    over its own data) that implies — with a repeat_gt4 flag marking
    sources pushed past the ~4-epoch repetition-harm threshold
    (Muennighoff et al. 2023), the signal to cap-and-redistribute.

    Exactness: per-source token counts are exact BIGINT sums of
    whitespace-token counts; sqrt(n_tokens) quantizes to 1e-6 BIGINTs so
    the normalizing sum is exact-integer; target_tokens is one
    floor(double) of exact operands and epochs ONE double division —
    bit-identical cross-engine. Plan shape at 100 TB: one token-count
    aggregate with map-side partials (S rows out), a 1-row total
    broadcast back — the corpus shuffles nothing."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    ntok = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    per = (docs.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(ntok.cast("long")).alias("n_tokens")))
    s = F.floor(F.sqrt(F.col("n_tokens").cast("double")) * SQRT_SCALE
                + F.lit(0.5)).cast("long")
    per = per.withColumn("s", s)
    tot = per.agg(F.sum("n_tokens").alias("tot_tok"),
                  F.sum("s").alias("tot_s"))
    w = F.col("s").cast("double") / F.col("tot_s")
    budget = (F.col("tot_tok") * F.lit(EPOCH_BUDGET_X)).cast("double")
    target = F.floor(w * budget + F.lit(0.5)).cast("long")
    df = per.crossJoin(F.broadcast(tot)).withColumn("target_tokens", target)
    epochs = (F.col("target_tokens").cast("double") / F.col("n_tokens"))
    return df.select(
        "source", "n_docs", "n_tokens",
        round_col(w).alias("weight"),
        "target_tokens",
        round_col(epochs).alias("epochs"),
        (epochs > F.lit(4.0)).cast("int").alias("repeat_gt4"),
    )


def _mix_epochs_oracle() -> str:
    return f"""
WITH per AS (
    SELECT source, count(*) AS n_docs,
           CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\\s+')))
                AS BIGINT) AS n_tokens
    FROM documents GROUP BY 1
),
q AS (
    SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * {SQRT_SCALE}
                         + 0.5) AS BIGINT) AS s
    FROM per
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tok,
               CAST(sum(s) AS BIGINT) AS tot_s FROM q),
t AS (
    SELECT source, n_docs, n_tokens,
           CAST(s AS DOUBLE) / tot_s AS w,
           CAST(floor(CAST(s AS DOUBLE) / tot_s
                      * CAST(tot_tok * {EPOCH_BUDGET_X} AS DOUBLE) + 0.5)
                AS BIGINT) AS target_tokens
    FROM q, tot
)
SELECT source, n_docs, n_tokens,
       {sql_round('w')} AS weight,
       target_tokens,
       {sql_round('CAST(target_tokens AS DOUBLE) / n_tokens')} AS epochs,
       CAST(CAST(target_tokens AS DOUBLE) / n_tokens > 4.0 AS INT)
           AS repeat_gt4
FROM t
""".strip()


SUITE = {
    "sample_hash_deterministic": ExtQuery(_sample_hash, _sample_hash_oracle()),
    "mix_epochs_plan": ExtQuery(_mix_epochs, _mix_epochs_oracle()),
    "mix_temperature_sqrt": ExtQuery(_mix_temperature, _mix_temperature_oracle()),
    "split_assign": ExtQuery(_split_assign, _split_assign_oracle()),
    "mix_rebalance_lang": ExtQuery(_mix_rebalance, _mix_rebalance_oracle()),
    "sample_stratified_quota": ExtQuery(_sample_quota, _sample_quota_oracle()),
    "shard_pack_tokens": ExtQuery(_shard_pack, _shard_pack_oracle()),
    "curation_pipeline": ExtQuery(_curation_pipeline, _curation_pipeline_oracle()),
    "curation_decisions": ExtQuery(_curation_decisions, _curation_decisions_oracle()),
}
