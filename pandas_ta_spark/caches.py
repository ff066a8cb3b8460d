"""Session-cache release for bounded-memory multi-key gate runs.

The engine memoizes expensive per-corpus builds at module level
(materialized bars, LSH pair tables, IVF/PQ codebooks, streaming corpus
indexes) keyed by (applicationId, dir, fingerprint) — correct and fast
for a long-lived session running MANY queries over ONE corpus. But an
ad-hoc multi-key gate over several HEAVY keys (the x100 embedding pair
keys) accumulates every key's pinned relations in one process: a
3-pair-key `tools/check.py` invocation was kernel-OOM-killed at ~103 GB
RSS (r13 judge log) where single-key processes peak far lower.

``release_session_caches`` drops every module-level cache (unpersisting
Spark relations), clears the Spark catalog cache, and trims freed
glibc arenas back to the OS — called by tools/check.py between keys in
ad-hoc mode so sequential heavy keys stay bounded.
"""

from __future__ import annotations

import gc
import sys

# module -> cache attribute names. Only modules ALREADY imported are
# drained (sys.modules lookup, no import side effects); keep this map in
# sync when adding a new module-level cache.
_CACHE_SITES: dict[str, list[str]] = {
    "pandas_ta_spark.sources.bars": ["_BARS_CACHE"],
    "pandas_ta_spark.ext.dedup": ["_PAIRS_CACHE"],
    "pandas_ta_spark.ext.similarity": ["_VECS_CACHE", "_IVF_CACHE",
                                       "_PQ_CACHE"],
    "pandas_ta_spark.ext.microstructure": ["_SYMBOL_COUNT_CACHE"],
    "pandas_ta_spark.streaming.ann": ["_CORPUS_MEAN_CACHE"],
    "pandas_ta_spark.streaming.corpus": [
        "_CORPUS_INDEX_CACHE", "_SPAN_INDEX_CACHE",
        "_BANDED_VEC_INDEX_CACHE", "_EXACT_INDEX_CACHE", "_VOCAB_CACHE"],
}


def release_session_caches(spark=None) -> int:
    """Drop every module-level cache entry; return the count dropped.

    DataFrame-valued entries are unpersisted (non-blocking) before the
    reference is dropped; checkpointed/persisted blocks are then
    reclaimed by Spark's ContextCleaner once the JVM GCs. Passing the
    active session also clears the catalog cache and nudges a JVM GC so
    block cleanup doesn't wait for organic allocation pressure."""
    dropped = 0
    for mod_name, attr_names in _CACHE_SITES.items():
        mod = sys.modules.get(mod_name)
        if mod is None:
            continue
        for attr in attr_names:
            cache = getattr(mod, attr, None)
            if not isinstance(cache, dict):
                continue
            for key in list(cache):
                val = cache.pop(key)
                if hasattr(val, "unpersist"):
                    try:
                        val.unpersist(blocking=False)
                    except Exception:
                        pass
                dropped += 1
    if spark is not None:
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        try:  # nudge ContextCleaner (classic local mode only)
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    gc.collect()
    try:
        # glibc keeps freed arena pages mapped (RSS stays high and the
        # next key's peak stacks on top); trim returns them to the OS.
        import ctypes

        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass
    return dropped
