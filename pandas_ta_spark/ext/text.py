"""Text analysis over the documents table (SURVEY.md §7.5).

Token counting, quality scoring, n-gram-heuristic language ID, and
document fingerprinting — all pure built-in functions (split/filter/md5),
no UDFs: at 100 TB these run inside whole-stage codegen on a pruned
2-column scan. Ratios divide exact integers, so both engines produce
identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandas_ta_spark.ext import ExtQuery
from pandas_ta_spark.operators.base import (
    rank_pick,
    round_col,
    sql_rank_pick,
    sql_round,
)
from pandas_ta_spark.sources.bars import load_table

STOPWORDS = ("the", "a", "of", "and", "to", "in")
LN2 = 0.6931471805599453  # kl_bits really is bits: nats / ln 2
LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
}


def _toks():
    return F.split(F.lower(F.trim(F.col("text"))), " ")


def _text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = _toks()
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    n_chars = F.length("text")
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_unique_tokens"),
        n_stop.alias("n_stopwords"),
        (n_uniq / n_tok).alias("type_token_ratio"),
        (n_stop / n_tok).alias("stopword_ratio"),
        # trimmed length: the raw n_chars counts the padding the
        # tokenizer trims, overstating token length on padded text
        ((F.length(F.trim(F.col("text"))) - (n_tok - 1)) / n_tok)
        .alias("avg_token_len"),
    )


_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)

TEXT_STATS_SQL = f"""
WITH t AS (
    SELECT doc_id, text, string_split(lower(trim(text)), ' ') AS toks
    FROM documents
)
SELECT doc_id,
       length(text) AS n_chars_calc,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_unique_tokens,
       len(list_filter(toks, x -> x IN ({_STOP_IN}))) AS n_stopwords,
       len(list_distinct(toks)) / len(toks) AS type_token_ratio,
       len(list_filter(toks, x -> x IN ({_STOP_IN}))) / len(toks) AS stopword_ratio,
       (length(trim(text)) - (len(toks) - 1)) / len(toks) AS avg_token_len
FROM t
""".strip()


def _lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-heuristic language ID: stopword-marker hit counts per
    language, argmax with deterministic tiebreak (en > de > fr)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    toks = _toks()

    def marker_count(markers):
        # closure factory: a single-arg lambda (a 2-arg lambda with a
        # default is treated as the (x, i) form by PySpark)
        return F.size(F.filter(toks, lambda x: x.isin(*markers)))

    scores = {lang: marker_count(m) for lang, m in LANG_MARKERS.items()}
    pred = (
        F.when((scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"]), "en")
        .when(scores["de"] >= scores["fr"], "de")
        .otherwise("fr")
    )
    return docs.select(
        "doc_id",
        scores["en"].alias("score_en"),
        scores["de"].alias("score_de"),
        scores["fr"].alias("score_fr"),
        pred.alias("lang_pred"),
        (pred == F.col("lang")).cast("int").alias("lang_match"),
    )


def _lang_sql() -> str:
    s = {
        lang: f"len(list_filter(toks, x -> x IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in LANG_MARKERS.items()
    }
    pred = (f"CASE WHEN {s['en']} >= {s['de']} AND {s['en']} >= {s['fr']} THEN 'en'"
            f" WHEN {s['de']} >= {s['fr']} THEN 'de' ELSE 'fr' END")
    return f"""
WITH t AS (
    SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS toks
    FROM documents
)
SELECT doc_id,
       {s['en']} AS score_en,
       {s['de']} AS score_de,
       {s['fr']} AS score_fr,
       {pred} AS lang_pred,
       CAST(({pred}) = lang AS INT) AS lang_match
FROM t
""".strip()


def quality_exprs() -> dict:
    """Quality-score Columns over a `text` column: bounded combination of
    length, diversity, and stopword signals (C4/Gopher-style rule scoring,
    integer-exact). Shared by the batch query and the streaming filter —
    every expression is stateless, so it is streaming-safe by construction."""
    toks = _toks()
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    len_ok = (n_tok >= 10) & (n_tok <= 1000)
    ttr = n_uniq / n_tok
    stop_ratio = n_stop / n_tok
    score = (
        F.when(len_ok, 0.4).otherwise(0.0)
        + F.when(ttr >= 0.2, 0.3).otherwise(0.0)
        + F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.5), 0.3).otherwise(0.0)
    )
    return {
        "n_tokens": n_tok,
        "quality_score": score,
        "keep": (score >= 0.7).cast("int"),
    }


def _text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    q = quality_exprs()
    return docs.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        q["quality_score"].alias("quality_score"),
        q["keep"].alias("keep"),
    )


TEXT_QUALITY_SQL = f"""
WITH t AS (
    SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
    FROM documents
),
m AS (
    SELECT doc_id, len(toks) AS n_tok,
           len(list_distinct(toks)) / len(toks) AS ttr,
           len(list_filter(toks, x -> x IN ({_STOP_IN}))) / len(toks) AS sr
    FROM t
)
SELECT doc_id, n_tok AS n_tokens,
       (CASE WHEN n_tok >= 10 AND n_tok <= 1000 THEN 0.4 ELSE 0.0 END
        + CASE WHEN ttr >= 0.2 THEN 0.3 ELSE 0.0 END
        + CASE WHEN sr >= 0.01 AND sr <= 0.5 THEN 0.3 ELSE 0.0 END) AS quality_score,
       CAST((CASE WHEN n_tok >= 10 AND n_tok <= 1000 THEN 0.4 ELSE 0.0 END
        + CASE WHEN ttr >= 0.2 THEN 0.3 ELSE 0.0 END
        + CASE WHEN sr >= 0.01 AND sr <= 0.5 THEN 0.3 ELSE 0.0 END) >= 0.7 AS INT) AS keep
FROM m
""".strip()


# Logistic quality classifier — the fastText/linear-probe stand-in for
# model-based quality filtering (the rule score above is the C4/Gopher
# shape; production pipelines run BOTH). Weights are literals "trained
# offline" and shipped with the engine, so scoring is a pure codegen map
# stage: broadcast-free, shuffle-free, identical in both engines.
LR_BIAS = -2.0
LR_W_LOGLEN = 0.55      # ln(1 + n_tok)
LR_W_TTR = 1.8          # type-token ratio
LR_W_STOP = 2.2         # stopword ratio
LR_W_MEANLEN = -0.15    # mean token length


def quality_lr_exprs() -> dict:
    """Linear-model quality Columns over a `text` column: z = w·x over
    four cheap features, p = sigmoid(z). `keep` compares the ROUNDED
    z >= 0 (== p >= 0.5) so the decision is made on the pre-sigmoid
    linear form — one fewer transcendental in the decision path — and on
    the same 1e-6-rounded value both engines hash, so a libm ln
    last-ulp flip at z ~ 0 cannot make `keep` disagree while z agrees.
    Feature order in z is left-associated and mirrored in the SQL twin.
    Stateless expressions shared by the batch query and the streaming
    filter (streaming-safe by construction, like quality_exprs)."""
    toks = _toks()
    n_tok = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_tok
    stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))) / n_tok
    # exact-integer char sum / exact count -> identical double
    mean_len = (
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x)).cast("double") / n_tok
    )
    z = (
        F.lit(LR_BIAS)
        + F.lit(LR_W_LOGLEN) * F.log(F.lit(1.0) + n_tok)
        + F.lit(LR_W_TTR) * ttr
        + F.lit(LR_W_STOP) * stop
        + F.lit(LR_W_MEANLEN) * mean_len
    )
    return {
        "n_tokens": n_tok.cast("long"),
        "z": round_col(z),
        "p_keep": round_col(F.lit(1.0) / (F.lit(1.0) + F.exp(-z))),
        "keep": (round_col(z) >= 0).cast("int"),
    }


def _quality_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    q = quality_lr_exprs()
    return docs.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        q["z"].alias("z"),
        q["p_keep"].alias("p_keep"),
        q["keep"].alias("keep"),
    )


def _quality_lr_sql() -> str:
    z = (f"{LR_BIAS!r} + {LR_W_LOGLEN!r} * ln(1.0 + len(toks))"
         f" + {LR_W_TTR!r} * (len(list_distinct(toks)) / len(toks))"
         f" + {LR_W_STOP!r} * (len(list_filter(toks, x -> x IN ({_STOP_IN})))"
         f" / len(toks))"
         f" + {LR_W_MEANLEN!r} * (CAST(list_sum(list_transform(toks,"
         f" x -> CAST(len(x) AS BIGINT))) AS DOUBLE) / len(toks))")
    return f"""
WITH t AS (
    SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
    FROM documents
),
m AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, {z} AS z FROM t)
SELECT doc_id, n_tokens,
       {sql_round('z')} AS z,
       {sql_round('1.0 / (1.0 + exp(-z))')} AS p_keep,
       CAST(({sql_round('z')}) >= 0 AS INT) AS keep
FROM m
""".strip()


def _fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-doc hash + min-shingle rolling-hash
    fingerprint (winnowing-lite: min over word-3-gram hashes)."""
    from pandas_ta_spark.ext.dedup import _shingles_spark

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    whole = docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("doc_hash")
    )
    sh = _shingles_spark(docs)
    minsh = sh.groupBy("doc_id").agg(
        F.min(F.substring(F.md5("shingle"), 1, 16)).alias("min_shingle_fp")
    )
    return whole.join(minsh, "doc_id", "left")


def _fingerprint_sql() -> str:
    from pandas_ta_spark.ext.dedup import _shingle_sql

    return f"""
WITH {_shingle_sql()},
m AS (
    SELECT doc_id, min(substr(md5(shingle), 1, 16)) AS min_shingle_fp
    FROM sh GROUP BY doc_id
)
SELECT d.doc_id, md5(lower(trim(d.text))) AS doc_hash, m.min_shingle_fp
FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
""".strip()


def _lang_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rollup per (lang, source): doc counts + exact-integer char
    stats — map-side partial aggregation, the canonical 100 TB reduce."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars") / F.count(F.lit(1))).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


LANG_SOURCE_AGG_SQL = """
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_chars) AS BIGINT) / count(*) AS avg_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents GROUP BY 1, 2
""".strip()


def _events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-column handling: parse events.props JSON into a typed map
    (from_json) and aggregate — the multimodal-metadata pattern."""
    from pyspark.sql.types import IntegerType, MapType, StringType

    ev = load_table(spark, sf_dir, "events").select("event_type", "props")
    m = F.from_json("props", MapType(StringType(), IntegerType()))
    k = m["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            (F.sum("k") / F.count("k")).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


EVENTS_PROPS_SQL = r"""
WITH e AS (
    SELECT event_type,
           TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS INT) AS k
    FROM events
)
SELECT event_type, count(*) AS n_events,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(sum(k) AS BIGINT) / count(k) AS avg_k,
       min(k) AS min_k, max(k) AS max_k
FROM e GROUP BY 1
""".strip()


BPE_PATTERN = r"[a-z0-9]+|[^a-z0-9\s]"


def _token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-ish: words + digit runs + punctuation as
    separate tokens (the pre-tokenizer regex shape of byte-pair
    encoders), alongside whitespace tokens for comparison."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    low = F.lower(F.col("text"))
    bpe = F.size(F.regexp_extract_all(low, F.lit(BPE_PATTERN), F.lit(0)))
    ws = F.size(F.split(F.trim(low), r"\s+"))
    return docs.select(
        "doc_id",
        bpe.alias("n_tokens_bpe"),
        ws.alias("n_tokens_ws"),
        (bpe / ws).alias("bpe_to_ws_ratio"),
    )


TOKEN_COUNT_BPE_SQL = rf"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{BPE_PATTERN}')) AS n_tokens_bpe,
       len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens_ws,
       len(regexp_extract_all(lower(text), '{BPE_PATTERN}'))
           / len(regexp_split_to_array(trim(lower(text)), '\s+')) AS bpe_to_ws_ratio
FROM documents
""".strip()


def _text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals: max term frequency (degenerate
    docs repeat one token), its ratio to doc length, and the duplicate-
    bigram fraction (boilerplate detector).

    Term frequencies go through explode -> two-level groupBy (map-side
    partial aggregation both levels); bigram stats stay entirely inside
    array expressions on the pruned 2-column scan — no shuffle for that
    branch, one broadcast-free join on doc_id at the end. All ratios
    divide exact BIGINTs."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # bind the token array once per row (a lambda referencing the split
    # expression directly would re-split the text per element — O(n^2))
    t = docs.select(
        "doc_id",
        _toks().alias("toks"),
    )
    tf = (
        t.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.max("c").alias("max_tf"),
        )
    )
    # bigram list via transform over an index sequence (JVM-side, no UDF);
    # guarded: Spark's sequence() DESCENDS when start > stop
    bg = F.when(
        F.size("toks") >= 2,
        F.expr("transform(sequence(0, size(toks) - 2),"
               " i -> concat(toks[i], ' ', toks[i + 1]))"),
    ).otherwise(F.array().cast("array<string>"))
    bgs = t.select(
        "doc_id",
        F.size(bg).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(bg)).cast("long").alias("n_distinct_bigrams"),
    )
    dup_frac = F.when(
        F.col("n_bigrams") > 0,
        (F.col("n_bigrams") - F.col("n_distinct_bigrams")) / F.col("n_bigrams"),
    ).otherwise(F.lit(0.0))
    return (
        tf.join(bgs, "doc_id")
        .select(
            "doc_id", "n_tokens", "n_distinct_tokens", "max_tf",
            (F.col("max_tf") / F.col("n_tokens")).alias("top_token_ratio"),
            "n_bigrams", "n_distinct_bigrams",
            dup_frac.alias("dup_bigram_frac"),
        )
    )


TEXT_REPETITION_SQL = """
WITH t AS (
    SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks FROM documents
),
tf AS (
    SELECT doc_id, tok, count(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
    GROUP BY 1, 2
),
a AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct_tokens, max(c) AS max_tf
    FROM tf GROUP BY 1
),
bg AS (
    SELECT doc_id,
           list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i + 1]) AS bgs
    FROM t
),
b AS (
    SELECT doc_id, CAST(len(bgs) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(bgs)) AS BIGINT) AS n_distinct_bigrams
    FROM bg
)
SELECT a.doc_id, a.n_tokens, a.n_distinct_tokens, a.max_tf,
       a.max_tf / a.n_tokens AS top_token_ratio,
       b.n_bigrams, b.n_distinct_bigrams,
       CASE WHEN b.n_bigrams > 0
            THEN (b.n_bigrams - b.n_distinct_bigrams) / b.n_bigrams
            ELSE 0.0 END AS dup_bigram_frac
FROM a JOIN b ON b.doc_id = a.doc_id
""".strip()


RARE_THRESHOLD = 50  # corpus occurrences below this => "rare" token


def _corpus_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics quality scoring: per document, how rare its
    vocabulary is relative to the WHOLE corpus (out-of-distribution /
    noise detector — the exact-arithmetic stand-in for unigram-LM
    perplexity, whose log() last-ulp behavior differs across engines).

    Two aggregation scopes in one plan: a corpus-wide token frequency
    table (vocabulary-sized — shuffle-joined on token, NOT broadcast: at
    100 TB the vocabulary does not fit one executor) feeding a per-doc
    rollup. All outputs are exact BIGINT counts and int/int ratios."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(_toks()).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("cnt") < RARE_THRESHOLD, 1).otherwise(0))
            .alias("n_rare"),
            F.min("cnt").alias("min_tok_freq"),
            F.sum("cnt").alias("sum_tok_freq"),
        )
        .select(
            "doc_id", "n_tokens", "n_rare",
            (F.col("n_rare") / F.col("n_tokens")).alias("rare_ratio"),
            "min_tok_freq",
            (F.col("sum_tok_freq") / F.col("n_tokens")).alias("mean_tok_freq"),
        )
    )


CORPUS_RARITY_SQL = f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
    FROM documents
),
freq AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1)
SELECT t.doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN f.cnt < {RARE_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rare,
       CAST(sum(CASE WHEN f.cnt < {RARE_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
           / count(*) AS rare_ratio,
       min(f.cnt) AS min_tok_freq,
       CAST(sum(f.cnt) AS BIGINT) / count(*) AS mean_tok_freq
FROM tok t JOIN freq f ON f.tok = t.tok
GROUP BY t.doc_id
""".strip()


TOP_TERMS_K = 5


def _tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top distinguishing terms per source: tf-idf ranking with an
    exact-integer score tf * (n_sources - df + 1) instead of tf*log(N/df)
    (log()'s last-ulp behavior differs across engines; the integer
    surrogate is order-equivalent for ranking within a source when df
    spans the full range, and is exactly reproducible).

    100 TB shape: explode -> two vocabulary-sized hash aggregations
    (map-side partials both), the scalar source count broadcast via a
    1-row cross join, and a per-source window for the top-k. The window
    partitions by source — bounded fan-in per partition because each
    source's vocabulary row count is vocabulary-sized, not corpus-sized."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    toks = docs.select("source", F.explode(_toks()).alias("term"))
    tf = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_src = docs.agg(F.count_distinct("source").alias("n_sources"))
    scored = (
        tf.join(df_tab, "term")
        .crossJoin(F.broadcast(n_src))
        .withColumn("score", F.col("tf") * (F.col("n_sources") - F.col("df") + 1))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_TERMS_K)
        .select("source", "term", "tf", "df", "score", "rank")
    )


TFIDF_TOP_TERMS_SQL = f"""
WITH tok AS (
    SELECT source, unnest(string_split(lower(trim(text)), ' ')) AS term
    FROM documents
),
tf AS (SELECT source, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
ns AS (SELECT count(DISTINCT source) AS n_sources FROM documents),
scored AS (
    SELECT t.source, t.term, t.tf, d.df,
           t.tf * (ns.n_sources - d.df + 1) AS score
    FROM tf t JOIN dfq d ON d.term = t.term CROSS JOIN ns
),
ranked AS (
    SELECT source, term, tf, df, score,
           row_number() OVER (PARTITION BY source
                              ORDER BY score DESC, term) AS rank
    FROM scored
)
SELECT source, term, tf, df, score, rank
FROM ranked WHERE rank <= {TOP_TERMS_K}
""".strip()


def _ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM novelty scoring: per document, how much of its bigram
    stream is unseen elsewhere in the corpus — the exact-arithmetic
    stand-in for bigram-LM perplexity filtering (high novel_frac = the
    model has no support for these transitions = noise/OOD candidate;
    complements `corpus_rarity`, which is unigram-level).

    Plan: one bigram explode collapsed IMMEDIATELY to per-(doc, bigram)
    instance counts (map-side partial absorbs in-doc repetition before
    the shuffle) and MATERIALIZED, so the dfreq branch reads the pair
    blocks instead of re-running scan+split+explode+agg (one corpus
    scan, not two); then doc frequency as a plain groupBy(bh) count,
    one hash join between the two pair-sized relations, one per-doc
    rollup. The whole chain runs inside the input-sized shuffle scope:
    the post-explode stages are a 4-deep shuffle chain, and with the
    bench/gate's coalescing-off 61-partition config each link pays
    O(parts^2) tiny block fetches — measured 1.7s for the dfreq stage
    alone at 61 parts vs 0.5s at 8 (AQE coalescing does this at runtime
    in prod; the clamp is a no-op at 100 TB input sizes). A window
    count-over-bh variant avoids the join but pays WindowExec's
    per-group setup on ~|vocabulary| one-row groups — measured worse.
    All outputs are exact BIGINTs and int/int ratios — no float
    summation order to disagree on. At 100 TB every shuffle and the
    checkpoint are pair-relation-sized (same cost class as the dedup
    shingle pass), and the df side is vocabulary-sized — never
    broadcast, never collected."""
    from pandas_ta_spark.ext.dedup import _input_bytes, _shuffle_sized_to_input

    with _shuffle_sized_to_input(spark, _input_bytes(spark, sf_dir, "documents")):
        return _ngram_novelty_impl(spark, sf_dir)


def _ngram_novelty_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # bind the token array ONCE per row: referencing split(...) inside the
    # transform lambda re-splits the text per element (O(tokens^2) chars)
    t = docs.select(
        "doc_id",
        _toks().alias("toks"),
    )
    bg = F.when(
        F.size("toks") >= 2,
        F.expr("transform(sequence(0, size(toks) - 2),"
               " i -> concat(toks[i], ' ', toks[i + 1]))"),
    ).otherwise(F.array().cast("array<string>"))
    # group on xxhash64 of the bigram, not the string: the bigram never
    # appears in the output, so the shuffles and the join move 8-byte
    # longs instead of ~25-byte strings (collision odds at vocabulary
    # scale are ~|V|^2/2^65 — negligible next to hardware error rates)
    from pandas_ta_spark.ckpt import materialize

    pairs = materialize(
        t.select("doc_id", F.explode(bg).alias("bigram"))
        .select("doc_id", F.xxhash64("bigram").alias("bh"))
        .groupBy("doc_id", "bh")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dfreq = pairs.groupBy("bh").agg(
        F.count(F.lit(1)).alias("n_docs_with"))
    # materialize INSIDE the sized-shuffle scope: the caller's conf
    # restore happens on return, and Spark reads shuffle.partitions at
    # execution time — a lazy return would run the whole post-checkpoint
    # chain at the session default
    return materialize(
        pairs.join(dfreq, "bh")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("n_docs_with") == 1, F.col("cnt")).otherwise(0))
            .cast("long").alias("n_novel"),
            F.min("n_docs_with").alias("min_bigram_df"),
            F.max("n_docs_with").alias("max_bigram_df"),
        )
        .select(
            "doc_id", "n_bigrams", "n_novel",
            (F.col("n_novel") / F.col("n_bigrams")).alias("novel_frac"),
            "min_bigram_df", "max_bigram_df",
        )
    )


NGRAM_NOVELTY_SQL = """
WITH t AS (
    SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks FROM documents
),
bg AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i + 1])) AS bigram
    FROM t WHERE len(toks) >= 2
),
dfq AS (
    SELECT bigram, count(DISTINCT doc_id) AS n_docs_with FROM bg GROUP BY 1
)
SELECT b.doc_id,
       count(*) AS n_bigrams,
       CAST(sum(CASE WHEN d.n_docs_with = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel,
       CAST(sum(CASE WHEN d.n_docs_with = 1 THEN 1 ELSE 0 END) AS BIGINT)
           / count(*) AS novel_frac,
       min(d.n_docs_with) AS min_bigram_df,
       max(d.n_docs_with) AS max_bigram_df
FROM bg b JOIN dfq d ON d.bigram = b.bigram
GROUP BY b.doc_id
""".strip()


# PII / policy scrubbing. The email and IPv4 patterns use only syntax
# with identical semantics in Java regex (Spark) and RE2 (DuckDB):
# ASCII classes, bounded repetition, \\b word boundaries. The synthetic
# corpus contains no digits or '@' (verified), so those counters also
# pin the zero-hit path; the denylist pattern matches real tokens so the
# redaction branch is value-checked end to end.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
DENYLIST = ("hash", "merge", "scan")
DENY_PATTERN = r"\b(" + "|".join(DENYLIST) + r")\b"
REDACTED = "<scrubbed>"


def _pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy scrubbing pass: count PII-shaped matches (email, IPv4) and
    denylisted terms per document, and emit the hash + length of the
    denylist-redacted text — the transform a curation pipeline applies
    before packing shards.

    All four expressions are JVM regex built-ins over the pruned
    2-column scan (whole-stage codegen, no shuffle at all); at 100 TB
    this is a pure map stage that pipelines into whatever sink follows."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    red = F.regexp_replace(F.col("text"), DENY_PATTERN, REDACTED)
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL)).alias("n_email"),
        F.regexp_count(F.col("text"), F.lit(PII_IPV4)).alias("n_ipv4"),
        F.regexp_count(F.col("text"), F.lit(DENY_PATTERN)).alias("n_denylist"),
        F.length(red).alias("n_chars_redacted"),
        F.md5(red).alias("redacted_md5"),
    )


PII_SCRUB_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_email,
       len(regexp_extract_all(text, '{PII_IPV4}')) AS n_ipv4,
       len(regexp_extract_all(text, '{DENY_PATTERN}')) AS n_denylist,
       length(regexp_replace(text, '{DENY_PATTERN}', '{REDACTED}', 'g'))
           AS n_chars_redacted,
       md5(regexp_replace(text, '{DENY_PATTERN}', '{REDACTED}', 'g'))
           AS redacted_md5
FROM documents
""".strip()


PROFILE_QS = (0.1, 0.5, 0.9)


def _source_token_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length profile: doc count, exact mean, and exact
    discrete p10/p50/p90 of the whitespace token count — the length-
    distribution dashboard a curation pipeline watches per crawl (shifted
    percentiles = a source changed its extraction).

    Percentile selection is row_number arithmetic on integers — value at
    sorted rank floor((n-1)*q)+1 — NOT an engine percentile builtin:
    Spark's `percentile` and DuckDB's `quantile_cont` interpolate with
    differently-associated FP expressions, while rank selection is exact
    in both. One sort per source inside one window pass; at 100 TB the
    documented swap is approx_percentile (the exact form stays as the
    oracle-parity baseline, same trade as topk_cosine vs LSH/IVF)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    d = docs.select("source", F.size(_toks()).alias("n_tok"))
    w = Window.partitionBy("source").orderBy("n_tok")
    ranked = d.withColumn("rn", F.row_number().over(w))
    stats = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    )
    r = ranked.join(F.broadcast(stats), "source")
    picks = [
        rank_pick(q, F.col("n_tok"), F.col("rn"), F.col("n_docs"))
        .alias(f"p{int(q * 100)}_tokens")
        for q in PROFILE_QS
    ]
    return (
        r.groupBy("source")
        .agg(F.max("n_docs").alias("n_docs"),
             F.max("total_tokens").alias("total_tokens"), *picks)
        .select(
            "source", "n_docs",
            (F.col("total_tokens") / F.col("n_docs")).alias("mean_tokens"),
            *[f"p{int(q * 100)}_tokens" for q in PROFILE_QS],
        )
    )


def _source_token_profile_sql() -> str:
    picks = ", ".join(
        f"{sql_rank_pick(q, 'n_tok', rk='rn', n='n_docs')}"
        f" AS p{int(q * 100)}_tokens"
        for q in PROFILE_QS
    )
    return f"""
WITH d AS (
    SELECT source, len(string_split(lower(trim(text)), ' ')) AS n_tok
    FROM documents
),
ranked AS (
    SELECT source, n_tok,
           row_number() OVER (PARTITION BY source ORDER BY n_tok) AS rn
    FROM d
),
stats AS (
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens
    FROM d GROUP BY source
),
r AS (SELECT k.*, s.n_docs, s.total_tokens
      FROM ranked k JOIN stats s USING (source))
SELECT source, max(n_docs) AS n_docs,
       CAST(max(total_tokens) AS BIGINT) / max(n_docs) AS mean_tokens,
       {picks}
FROM r GROUP BY source
""".strip()


def _perplexity_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filtering signal: score every document
    under a unigram LM fitted on the corpus itself (add-one smoothing),
    reporting mean negative log-prob per token — high values mark
    out-of-distribution junk, the classic "train a LM on good text,
    drop what it finds surprising" curation pass (here the LM and the
    corpus coincide; production fits on the reference corpus and scores
    the candidate one, same plan shape).

    Cross-engine determinism: ln((c+1)/(N+V)) is computed ONCE per
    DISTINCT token in the vocab relation and immediately quantized to a
    1e-6 BIGINT, so per-doc folds are exact integer sums (order-free)
    and the single float division at the end is 1e-6-rounded. Plan:
    one token explode, one vocab groupBy (uniform keys, map-side
    partials), one join back on token, one per-doc fold — the same
    cost class as tf-idf."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(_toks()).alias("token"),
    ).filter(F.col("token") != "")
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    totals = vocab.agg(
        F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("v"))
    lp6 = F.floor(
        -F.log((F.col("c") + 1).cast("double")
               / (F.col("n_total") + F.col("v")).cast("double"))
        * 1e6 + F.lit(0.5)
    ).cast("long")
    scored = (
        tok.join(F.broadcast(vocab.crossJoin(F.broadcast(totals))
                             .select("token", lp6.alias("nlp6"))), "token")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.sum("nlp6").alias("s6"))
    )
    return scored.select(
        "doc_id", "n_tokens",
        (F.floor(F.col("s6") / F.col("n_tokens") + F.lit(0.5)) / 1e6)
        .alias("avg_neg_logp"),
    )


PERPLEXITY_UNIGRAM_SQL = """
WITH tok AS (
    SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS token
    FROM documents
),
tk AS (SELECT doc_id, token FROM tok WHERE token <> ''),
vocab AS (SELECT token, count(*) AS c FROM tk GROUP BY token),
totals AS (SELECT sum(c) AS n_total, count(*) AS v FROM vocab),
lp AS (
    SELECT token,
           CAST(floor(-ln(CAST(c + 1 AS DOUBLE)
                          / CAST(n_total + v AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT) AS nlp6
    FROM vocab CROSS JOIN totals
),
scored AS (
    SELECT doc_id, count(*) AS n_tokens, sum(nlp6) AS s6
    FROM tk JOIN lp USING (token)
    GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       floor(CAST(s6 AS DOUBLE) / n_tokens + 0.5) / 1000000.0
           AS avg_neg_logp
FROM scored
""".strip()


def _perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity signal — the context-aware step up from
    ``perplexity_unigram`` toward CCNet's KenLM filter: score every
    document by its mean negative log-prob under an add-one-smoothed
    bigram model P(w2|w1) = (c12+1)/(c1+V) fitted on the corpus itself
    (V = unigram vocab size, so the conditional normalizes exactly).
    A doc full of individually-common words in never-seen orders scores
    high here but low under the unigram model — word-salad spam, shuffled
    boilerplate, template stuffing.

    Bigrams come from zipping the token array against itself shifted by
    one (slice+arrays_zip, pure map stage — NO per-doc ordering window;
    the DuckDB twin zips two aligned unnests the same way). Per-bigram
    -ln p is computed once per DISTINCT bigram type and quantized to a
    1e-6 BIGINT, so per-doc folds are exact integer sums, order-free
    under any partitioning.

    100 TB: unlike the unigram vocab, the bigram table is NOT broadcast
    (type count grows ~linearly with corpus size toward V^2); the
    score-join shuffles on the uniform (w1, w2) key instead. Docs under
    two tokens have no bigrams and drop from the output, identically in
    both engines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    l = F.filter(_toks(), lambda x: x != F.lit(""))
    toks = docs.select(F.explode(l).alias("token"))
    vsize = toks.agg(F.count_distinct("token").alias("v"))
    n1 = F.size(F.col("l")) - 1
    big = (
        docs.select("doc_id", l.alias("l"))
        .filter(F.size("l") >= 2)
        .select("doc_id", F.explode(F.arrays_zip(
            F.slice("l", 1, n1).alias("w1"),
            F.slice("l", 2, n1).alias("w2"))).alias("pr"))
        .select("doc_id", "pr.w1", "pr.w2")
    )
    bcnt = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = bcnt.groupBy("w1").agg(F.sum("c12").alias("c1"))
    nlp6 = F.floor(
        -F.log((F.col("c12") + 1).cast("double")
               / (F.col("c1") + F.col("v")).cast("double"))
        * 1e6 + F.lit(0.5)
    ).cast("long")
    lp = (bcnt.join(ctx, "w1").crossJoin(F.broadcast(vsize))
          .select("w1", "w2", nlp6.alias("nlp6")))
    scored = (
        big.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             F.sum("nlp6").alias("s6"))
    )
    return scored.select(
        "doc_id", "n_bigrams",
        (F.floor(F.col("s6") / F.col("n_bigrams") + F.lit(0.5)) / 1e6)
        .alias("avg_neg_logp"),
    )


PERPLEXITY_BIGRAM_SQL = """
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split(lower(trim(text)), ' '),
                       x -> x <> '') AS l
    FROM documents
),
vsize AS (
    SELECT count(DISTINCT t.token) AS v
    FROM (SELECT unnest(l) AS token FROM toks) t
),
big AS (
    SELECT doc_id,
           unnest(list_slice(l, 1, length(l) - 1)) AS w1,
           unnest(list_slice(l, 2, length(l))) AS w2
    FROM toks WHERE length(l) >= 2
),
bcnt AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c12) AS c1 FROM bcnt GROUP BY 1),
lp AS (
    SELECT b.w1, b.w2,
           CAST(floor(-ln(CAST(b.c12 + 1 AS DOUBLE)
                          / CAST(x.c1 + vsize.v AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT) AS nlp6
    FROM bcnt b JOIN ctx x USING (w1) CROSS JOIN vsize
),
scored AS (
    SELECT doc_id, count(*) AS n_bigrams, sum(nlp6) AS s6
    FROM big JOIN lp USING (w1, w2)
    GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       floor(CAST(s6 AS DOUBLE) / n_bigrams + 0.5) / 1000000.0
           AS avg_neg_logp
FROM scored
""".strip()


def _source_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, token) -> count relation shared by unigram_kl_by_source
    and lexical_diversity — ONE tokenization definition, one corpus
    explode + one uniform-key shuffle per consumer (the SQL twins share
    the matching ``_ST_COUNTS_CTE``). A tokenization-rule change lands
    in both ops and both engines together or not at all."""
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select(
        "source",
        F.explode(_toks()).alias("token"),
    ).filter(F.col("token") != "")
    return tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("cst"))


_ST_COUNTS_CTE = """
WITH tok AS (
    SELECT source, unnest(string_split(lower(trim(text)), ' ')) AS token
    FROM documents
),
tk AS (SELECT source, token FROM tok WHERE token <> ''),
st AS (SELECT source, token, count(*) AS cst FROM tk GROUP BY source, token)
""".strip()


def _unigram_kl_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-shift telemetry: KL(P_source || P_corpus) over unigram
    distributions, per source — the lexical counterpart of
    ``embedding_drift_by_slice``. High KL marks sources whose token mix
    diverges from the corpus (a new crawl slice gone weird, a template
    farm, a domain worth up/down-weighting in the mixing step).

    KL = sum_t p_t * ln(p_t / q_t) over tokens present in the source
    (p_t = 0 terms vanish; q_t > 0 whenever p_t > 0 because the corpus
    contains the source), computed via the decomposition
    sum p*(ln p - ln ct) + ln n (since sum p = 1): the corpus total n
    then enters ONCE per source at the 20-row tail instead of riding
    every term, so no scalar broadcast and no second corpus pass.

    Every count is an exact integer; each term's double is computed
    ONCE per (source, token) from the same parse tree in both engines
    and immediately quantized to a 1e-9 BIGINT, so the per-source fold
    is an order-free integer sum; the tail adds ln(n) as one double op.

    Plan: one token explode -> (source, token) counts (ONE corpus
    shuffle on uniform keys, map-side partials), then a single chain of
    partition-windows over that counts relation (by token for ct, by
    source for ns — vocabulary-sized partitions, no corpus re-scan),
    one per-source aggregation, and n recovered as sum(ns) over the
    final #sources rows. Output rows = #sources."""
    st = _source_token_counts(spark, sf_dir)
    wt = Window.partitionBy("token")
    wsrc = Window.partitionBy("source")
    st = st.select(
        "source", "cst",
        F.sum("cst").over(wt).alias("ct"),
        F.sum("cst").over(wsrc).alias("ns"),
        F.count(F.lit(1)).over(wsrc).alias("n_types"))
    p = F.col("cst").cast("double") / F.col("ns").cast("double")
    term9 = F.floor(
        p * (F.log(p) - F.log(F.col("ct").cast("double")))
        * F.lit(1e9) + F.lit(0.5)).cast("long")
    g = st.groupBy("source").agg(
        F.max("ns").alias("n_tokens"),
        F.max("n_types").alias("n_types"),
        F.sum(term9).alias("s9"))
    n = F.sum("n_tokens").over(Window.partitionBy())
    return g.select(
        "source", "n_tokens", "n_types",
        round_col((F.col("s9").cast("double") / F.lit(1e9)
                   + F.log(n.cast("double"))) / F.lit(LN2))
        .alias("kl_bits"),
    )


UNIGRAM_KL_SQL = f"""
{_ST_COUNTS_CTE},
w AS (
    SELECT source, cst,
           sum(cst) OVER (PARTITION BY token) AS ct,
           sum(cst) OVER (PARTITION BY source) AS ns,
           count(*) OVER (PARTITION BY source) AS n_types
    FROM st
),
terms AS (
    SELECT source, ns, n_types,
           CAST(floor(
               (CAST(cst AS DOUBLE) / CAST(ns AS DOUBLE))
               * (ln(CAST(cst AS DOUBLE) / CAST(ns AS DOUBLE))
                  - ln(CAST(ct AS DOUBLE)))
               * 1000000000.0 + 0.5) AS BIGINT) AS t9
    FROM w
)
SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens, max(n_types) AS n_types,
       {sql_round('(CAST(sum(t9) AS DOUBLE) / 1000000000.0'
                  ' + ln(CAST(sum(max(ns)) OVER () AS DOUBLE)))'
                  f' / {LN2!r}')} AS kl_bits
FROM terms GROUP BY source
""".strip()


def _lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity profile per source: type-token ratio and hapax
    share (fraction of the source's vocabulary occurring exactly once) —
    the cheap template/boilerplate detector: generated or templated
    sources have low TTR and a thin hapax tail, organic text is
    hapax-heavy (Zipf). All counts are exact integers; the two ratios
    are single double divisions, identical in both engines.

    Plan: same (source, token) counts relation as the KL query (one
    explode + one uniform-key shuffle), then one per-source
    re-aggregation. Output rows = #sources."""
    st = _source_token_counts(spark, sf_dir)
    g = st.groupBy("source").agg(
        F.sum("cst").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("cst") == 1, 1).otherwise(0)).alias("n_hapax"))
    return g.select(
        "source", "n_tokens", "n_types", "n_hapax",
        round_col(F.col("n_types").cast("double")
                  / F.col("n_tokens").cast("double")).alias("ttr"),
        round_col(F.col("n_hapax").cast("double")
                  / F.col("n_types").cast("double")).alias("hapax_share"),
    )


LEXICAL_DIVERSITY_SQL = f"""
{_ST_COUNTS_CTE},
g AS (
    SELECT source, CAST(sum(cst) AS BIGINT) AS n_tokens, count(*) AS n_types,
           CAST(sum(CASE WHEN cst = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
    FROM st GROUP BY source
)
SELECT source, n_tokens, n_types, n_hapax,
       {sql_round('CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)')}
           AS ttr,
       {sql_round('CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE)')}
           AS hapax_share
FROM g
""".strip()


# ------------------------------------------------- document chunking ----

CHUNK_TOK = 128   # tokens per training chunk
CHUNK_OVL = 16    # overlap between adjacent chunks
CHUNK_STRIDE = CHUNK_TOK - CHUNK_OVL


def doc_chunks(docs: DataFrame, passthrough: tuple = ()) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard pretraining chunking step (context-window packing inputs).
    chunk i covers tokens [i*STRIDE, i*STRIDE + CHUNK); a doc with
    n <= CHUNK tokens is one chunk; otherwise 1 + ceil((n-CHUNK)/STRIDE)
    chunks so the tail is always covered (the last chunk may be short).

    Emits (doc_id, chunk_id, start_tok, n_tok, chunk_hash) — the hash
    (md5 of the space-rejoined slice, identical in both engines) is the
    dedup/lineage key downstream packing and exact-dedup steps join on.

    100 TB shape: ZERO shuffles — tokenize, a small integer sequence,
    one explode, a slice: pure map-side projection, fan-out ~n/STRIDE
    rows per doc (linear in corpus tokens, the floor for any chunker).
    ``passthrough`` names extra input columns carried onto every chunk
    row (e.g. source) so downstream per-chunk rollups need NO join
    back to the doc relation — the chunker is a projection, and one
    more projected column is free."""
    toks = _toks()
    n = F.size(toks)
    extra = F.when(n <= CHUNK_TOK, F.lit(0)).otherwise(
        F.floor((n - CHUNK_TOK + CHUNK_STRIDE - 1) / F.lit(CHUNK_STRIDE))
        .cast("int"))
    pt = list(passthrough)
    d = docs.select("doc_id", *pt, toks.alias("toks"), extra.alias("extra"))
    d = d.select(
        "doc_id", *pt, "toks",
        F.explode(F.sequence(F.lit(0), F.col("extra"))).alias("chunk_id"))
    sl = F.slice(F.col("toks"),
                 F.col("chunk_id") * CHUNK_STRIDE + 1, CHUNK_TOK)
    return d.select(
        "doc_id", *pt,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("chunk_id") * CHUNK_STRIDE).cast("long").alias("start_tok"),
        F.size(sl).cast("long").alias("n_tok"),
        F.md5(F.concat_ws(" ", sl)).alias("chunk_hash"),
    )


def _doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_chunks(load_table(spark, sf_dir, "documents")
                      .select("doc_id", "text"))


DOC_CHUNKS_SQL = f"""
WITH d AS (
    SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
    FROM documents
),
m AS (
    SELECT doc_id, toks,
           CASE WHEN len(toks) <= {CHUNK_TOK} THEN 0
                ELSE CAST(floor((len(toks) - {CHUNK_TOK} + {CHUNK_STRIDE - 1})
                                / {CHUNK_STRIDE}) AS INT)
           END AS extra
    FROM d
),
e AS (
    SELECT doc_id, toks,
           unnest(generate_series(0, extra)) AS chunk_id
    FROM m
)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
       CAST(len(toks[chunk_id * {CHUNK_STRIDE} + 1
                     : chunk_id * {CHUNK_STRIDE} + {CHUNK_TOK}])
            AS BIGINT) AS n_tok,
       md5(array_to_string(toks[chunk_id * {CHUNK_STRIDE} + 1
                                : chunk_id * {CHUNK_STRIDE} + {CHUNK_TOK}],
                           ' ')) AS chunk_hash
FROM e
""".strip()


def chunk_dup_rate(docs: DataFrame) -> DataFrame:
    """Boilerplate-contamination telemetry built ON the chunker: the
    share of each source's 128-token chunks whose hash appears more
    than once ANYWHERE in the corpus (headers, footers, templated spans
    — the content exact-dedup misses because the doc ids differ). Per
    source: total chunks, duplicated chunks, dup_rate.

    Plan (the 100 TB shape): the chunker carries ``source`` as a
    passthrough projection column (shuffle-free — a later review pass
    caught that the doc_id join-back this replaced sort-merge-shuffled
    the FULL row-level chunk stream at scale, where the one-row-per-doc
    side is far beyond any broadcast threshold), so the FIRST exchange
    is already the groupBy(chunk_hash, source).count() partial agg that
    shrinks the stream to distinct (hash, source) pairs; global
    multiplicity is then a window sum over that tiny aggregated
    relation, and the per-source rollup ends it. Exact integers end to
    end except the final ratio (one double division). (The first cut
    did count(*) OVER (PARTITION BY chunk_hash) on the ROW-LEVEL
    stream — a full sort-shuffle with zero partial agg.) The DuckDB
    twin keeps a doc_id join: it is a correctness oracle, not a plan."""
    ch = doc_chunks(docs.select("doc_id", "text", "source"),
                    passthrough=("source",))
    g1 = ch.groupBy("chunk_hash", "source").agg(
        F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("chunk_hash")
    mult = F.sum("c").over(w)
    g2 = g1.select("source", "c", mult.alias("mult"))
    g = g2.groupBy("source").agg(
        F.sum("c").alias("n_chunks"),
        F.sum(F.when(F.col("mult") > 1, F.col("c")).otherwise(F.lit(0)))
        .alias("n_dup"),
    )
    return g.select(
        "source",
        F.col("n_chunks").cast("long").alias("n_chunks"),
        F.col("n_dup").cast("long").alias("n_dup"),
        round_col(F.col("n_dup").cast("double") / F.col("n_chunks"))
        .alias("dup_rate"),
    )


def _chunk_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_dup_rate(load_table(spark, sf_dir, "documents")
                          .select("doc_id", "text", "source"))


CHUNK_DUP_RATE_SQL = f"""
WITH ch AS (
    SELECT * FROM ({DOC_CHUNKS_SQL}) cq
),
j AS (
    SELECT ch.chunk_hash, d.source
    FROM ch JOIN documents d USING (doc_id)
),
g1 AS (
    SELECT chunk_hash, source, count(*) AS c
    FROM j
    GROUP BY chunk_hash, source
),
g2 AS (
    SELECT source, c,
           sum(c) OVER (PARTITION BY chunk_hash) AS mult
    FROM g1
),
g AS (
    SELECT source, sum(c) AS n_chunks,
           sum(CASE WHEN mult > 1 THEN c ELSE 0 END) AS n_dup
    FROM g2
    GROUP BY source
)
SELECT source, CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(n_dup AS BIGINT) AS n_dup,
       {sql_round('CAST(n_dup AS DOUBLE) / n_chunks')} AS dup_rate
FROM g
""".strip()


SUITE = {
    "doc_chunk_128_16": ExtQuery(_doc_chunks, DOC_CHUNKS_SQL),
    "chunk_dup_rate": ExtQuery(_chunk_dup_rate, CHUNK_DUP_RATE_SQL),
    "source_token_profile": ExtQuery(
        _source_token_profile, _source_token_profile_sql()),
    "unigram_kl_by_source": ExtQuery(_unigram_kl_by_source, UNIGRAM_KL_SQL),
    "lexical_diversity": ExtQuery(_lexical_diversity, LEXICAL_DIVERSITY_SQL),
    "tfidf_top_terms": ExtQuery(_tfidf_top_terms, TFIDF_TOP_TERMS_SQL),
    "ngram_novelty": ExtQuery(_ngram_novelty, NGRAM_NOVELTY_SQL),
    "pii_scrub": ExtQuery(_pii_scrub, PII_SCRUB_SQL),
    "token_count_bpe": ExtQuery(_token_count_bpe, TOKEN_COUNT_BPE_SQL),
    "text_repetition": ExtQuery(_text_repetition, TEXT_REPETITION_SQL),
    "corpus_rarity": ExtQuery(_corpus_rarity, CORPUS_RARITY_SQL),
    "text_stats": ExtQuery(_text_stats, TEXT_STATS_SQL),
    "perplexity_unigram": ExtQuery(_perplexity_unigram, PERPLEXITY_UNIGRAM_SQL),
    "perplexity_bigram": ExtQuery(_perplexity_bigram, PERPLEXITY_BIGRAM_SQL),
    "text_lang_id": ExtQuery(_lang_id, _lang_sql()),
    "text_quality": ExtQuery(_text_quality, TEXT_QUALITY_SQL),
    "quality_lr_score": ExtQuery(_quality_lr, _quality_lr_sql()),
    "text_fingerprint": ExtQuery(_fingerprint, _fingerprint_sql()),
    "lang_source_agg": ExtQuery(_lang_source_agg, LANG_SOURCE_AGG_SQL),
    "events_props_agg": ExtQuery(_events_props, EVENTS_PROPS_SQL),
}
