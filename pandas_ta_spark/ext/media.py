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

    mapInPandas: each Arrow batch becomes a pandas frame. The decoder is
    probed ONCE per batch; with no decoder available the fallback
    computes byte statistics VECTORIZED across the whole batch (one
    buffer concat + one int64 cumsum, per-row sums by offset difference —
    no per-row Python loop). Only the real-decoder branch iterates
    per asset, because decoders are inherently per-asset."""
    import hashlib

    def gen(batches):
        import numpy as np
        import pandas as pd

        cols = [f.name for f in FEATURE_SCHEMA.fields]
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["content"]]
            try:
                decode_stub(payloads[0] if payloads else b"")
                # REAL DECODER BRANCH (unreachable in this container):
                # per-asset loop is correct here — decoding is per-asset
                rows = [decode_stub(p) for p in payloads]
                yield pd.DataFrame(rows, columns=cols)
                continue
            except NotImplementedError:
                pass
            # vectorized fallback: exact integer byte sums via cumsum
            # differences (no reduceat zero-length edge cases)
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                               count=len(payloads))
            concat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            csum = np.concatenate(([0], np.cumsum(concat, dtype=np.int64)))
            ends = np.cumsum(lens)
            sums = csum[ends] - csum[ends - lens]
            mean = np.zeros(len(lens), dtype=np.float64)
            nz = lens > 0
            mean[nz] = np.floor(sums[nz] / lens[nz] * 1e6 + 0.5) / 1e6
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": lens,
                "mean_byte": mean,
                "frame_count": (lens // 16).astype("int32"),
                # md5 is per-row by nature; hashing 16-byte slices is cheap
                "first_frame_hash": [
                    hashlib.md5(p[:16]).hexdigest() for p in payloads
                ],
            }, columns=cols)

    return df.mapInPandas(gen, FEATURE_SCHEMA)


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_features(with_media_column(docs))


# Oracle for the decoder-independent fallback features. The test payload
# is utf-8 text and the corpus is pure ASCII (verified: octet_length ==
# char length across testdata), so byte positions == char positions and
# every fallback column is plain SQL: octet_length, per-char ord() sum,
# md5 of the 16-byte prefix. A real-decoder deployment would drop back to
# rows-only for tensor outputs.
MEDIA_FEATURES_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CASE WHEN length(text) = 0 THEN 0.0 ELSE
           floor(list_sum(list_transform(range(1, length(text) + 1),
                                         i -> ord(substr(text, i, 1))))
                 / length(text) * 1e6 + 0.5) / 1e6 END AS mean_byte,
       CAST(octet_length(encode(text)) // 16 AS INT) AS frame_count,
       md5(substr(text, 1, 16)) AS first_frame_hash
FROM documents
""".strip()


SUITE = {
    "media_meta": ExtQuery(_media_meta, MEDIA_META_SQL),
    "media_features": ExtQuery(_media_features, MEDIA_FEATURES_SQL),
}
