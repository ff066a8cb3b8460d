"""Multimodal column plumbing (SURVEY.md §7.5; builder brief).

Image/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partition-preserving
mapInPandas, Arrow batch shape — is real and tested; the actual
image/audio DECODE step is stubbed (the decoder libraries are not in this
container): ``decode_stub`` produces deterministic fake features and
documents exactly where PIL/torchaudio/ffmpeg would plug in.

100 TB notes: binary payloads ride the same parquet scan (no extra
shuffle); mapInPandas streams Arrow batches so one oversized asset never
materializes a whole partition; metadata extraction is a projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pandas_ta_spark.ext import ExtQuery
from pandas_ta_spark.sources.bars import load_table


def with_media_column(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    The test corpus has no real media, so the payload is the utf-8 bytes
    of the text column — the schema and execution path are identical to a
    real image/audio column."""
    content = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.lit("application/fake").alias("mime"),
        F.length(content).alias("n_bytes"),
        (F.length("text") % 64 + 1).cast("int").alias("width"),
        (F.size(F.split(F.col("text"), " ")) % 64 + 1).cast("int").alias("height"),
    )
    return docs.select("doc_id", content.alias("content"), meta.alias("media_meta"))


def _media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    m = with_media_column(docs)
    return m.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )


MEDIA_META_SQL = """
SELECT doc_id,
       'application/fake' AS mime,
       octet_length(encode(text)) AS n_bytes,
       CAST(length(text) % 64 + 1 AS INT) AS width,
       CAST(len(string_split(text, ' ')) % 64 + 1 AS INT) AS height
FROM documents
""".strip()


FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("mean_byte", DoubleType()),
    StructField("frame_count", IntegerType()),
    StructField("first_frame_hash", StringType()),
])


def decode_stub(payload: bytes, kind: str = "image"):
    """WHERE A REAL DECODER PLUGS IN. PIL.Image.open / torchaudio.load /
    ffmpeg frame-sampling are not available in this container, so this
    raises for real media kinds and the feature extractor falls back to
    deterministic byte-level pseudo-features (keeps the Arrow pipeline
    exercised end to end)."""
    raise NotImplementedError(
        f"no {kind} decoder in this environment; "
        "swap in PIL/torchaudio/ffmpeg here"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    mapInPandas: each Arrow batch becomes a pandas frame; the stubbed
    decoder path degrades to byte statistics, the real one would emit
    image tensors / audio frames with the same batch shape."""
    import hashlib

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = pdf["content"]
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], payloads):
                try:
                    decode_stub(bytes(payload))  # real decoder hook
                    raise AssertionError("unreachable in this container")
                except NotImplementedError:
                    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                    rows.append({
                        "doc_id": int(doc_id),
                        "n_bytes": int(arr.size),
                        "mean_byte": float(np.floor(arr.mean() * 1e6 + 0.5) / 1e6)
                        if arr.size else 0.0,
                        "frame_count": int(arr.size // 16),
                        "first_frame_hash": hashlib.md5(bytes(payload[:16])).hexdigest(),
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(gen, FEATURE_SCHEMA)


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_features(with_media_column(docs))


SUITE = {
    "media_meta": ExtQuery(_media_meta, MEDIA_META_SQL),
    "media_features": ExtQuery(_media_features, None),  # rows-only: stubbed decode
}
