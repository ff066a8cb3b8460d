"""LLM-data-pipeline extensions (BASELINE.json north star; SURVEY.md §7.5).

First-class components alongside the TA operator inventory: deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity search
(brute-force cosine top-k + LSH-bucketed ANN), text analysis (token
stats, quality scoring, language ID, fingerprinting), multimodal binary
plumbing, and the volume-profile AGG op.

Each entry is an ``ExtQuery``: a driver-facing query callable plus an
optional DuckDB oracle. Cross-engine determinism rules used throughout:

- hashes are md5 hex strings (identical in Spark and DuckDB); ordering
  hashes lexicographically replaces integer conversion (no portable
  hex->int in both engines);
- dot products and norms are generated as explicit left-associated term
  sums — the same IEEE addition order in both engines gives bit-identical
  doubles;
- ratios divide exact integers; unbounded sums quantize to integers
  first (functions/windows.py cumsum_fixed rationale).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ExtQuery:
    query: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


def _build():
    from pandas_ta_spark.ext import (
        agg,
        behavior,
        dedup,
        media,
        microstructure,
        relational,
        sampling,
        similarity,
        text,
    )

    suite: dict[str, ExtQuery] = {}
    for mod in (dedup, similarity, text, media, agg, sampling, relational,
                behavior, microstructure):
        suite.update(mod.SUITE)
    return suite


SUITE = _build()

__all__ = ["ExtQuery", "SUITE"]
