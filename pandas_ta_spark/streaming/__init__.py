from pandas_ta_spark.streaming.corpus import (
    stream_decontamination_gate,
    stream_dedup_exact,
    stream_dedup_vs_corpus,
    stream_neardup_candidates,
    stream_perplexity_gate,
    stream_quality_keep,
    stream_curation_gate,
    compact_ingest_lake,
    read_ingest_lake,
    stream_corpus_ingest,
    stream_curation_sink,
    stream_media_features,
    stream_quality_lr_keep,
    stream_semdedup_gate,
    stream_span_dup_gate,
    stream_split_assign,
    stream_token_rate,
    stream_trending_terms,
)
from pandas_ta_spark.streaming.ann import (
    stream_topk_ivf,
    stream_topk_ivfpq,
    stream_embedding_drift,
    stream_vector_ingest,
)
from pandas_ta_spark.streaming.panel import stream_xsec_rank, stream_xsec_zscore
from pandas_ta_spark.streaming.relational import (
    stream_asof_attach,
    stream_attribution_attach,
    stream_rate_anomaly,
)
from pandas_ta_spark.streaming.sessions import stream_sessions
from pandas_ta_spark.streaming.indicators import (
    stream_bars,
    streaming_bbands,
    streaming_donchian,
    streaming_atr,
    streaming_ema,
    streaming_macd,
    streaming_ret_autocorr,
    streaming_rsi,
    streaming_supertrend,
    streaming_variance_ratio,
)

__all__ = ["stream_bars", "streaming_atr", "streaming_bbands",
           "streaming_donchian", "streaming_ema",
           "streaming_macd", "streaming_ret_autocorr",
           "streaming_rsi", "streaming_supertrend",
           "streaming_variance_ratio",
           "stream_decontamination_gate",
           "stream_dedup_exact", "stream_dedup_vs_corpus",
           "stream_neardup_candidates",
           "stream_quality_keep", "stream_quality_lr_keep", "stream_token_rate",
           "stream_split_assign", "stream_sessions", "stream_topk_ivf",
           "stream_topk_ivfpq", "stream_xsec_rank", "stream_xsec_zscore",
           "stream_asof_attach", "stream_attribution_attach",
           "stream_rate_anomaly", "stream_span_dup_gate",
           "stream_semdedup_gate", "stream_curation_gate",
           "stream_media_features", "stream_curation_sink",
           "stream_corpus_ingest", "compact_ingest_lake",
           "stream_vector_ingest", "stream_embedding_drift",
           "read_ingest_lake", "stream_perplexity_gate", "stream_trending_terms"]
