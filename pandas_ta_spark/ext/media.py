"""Multimodal column plumbing (SURVEY.md §7.5; builder brief).

Image/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schema, partition-preserving
mapInPandas, Arrow batch shape — is real and tested; the actual
image/audio DECODE step is stubbed (the decoder libraries are not in this
container): ``decode_stub`` produces deterministic fake features and
documents exactly where PIL/torchaudio/ffmpeg would plug in.

PRODUCTION DECODER CONTRACT (the ``decode_stub`` plug-in boundary):
a decoder is ONE callable ``decoder(payload: bytes, kind: str) ->
numpy.ndarray`` registered via ``set_decoder`` BEFORE the query is
built (the media ops capture it at plan-construction time, so it ships
to executors inside the pickled mapInPandas closure — registering
after ``extract_features(df)`` has returned does not retrofit the
plan). Shape contract by ``kind``:

- ``"image"``: (H, W) or (H, W, C) uint8;
- ``"audio"``: (n_samples,) or (channels, n_samples);
- ``"video"``: (n_frames, ...) — axis 0 is the frame axis; frame
  sampling indexes it and hashes ``frame.tobytes()``.

Failure semantics: raise ``ValueError`` for an UNDECODABLE payload —
the asset degrades per-row (NULL feature columns in
``extract_features``; zero emitted frames/segments in
``sample_frames``/``resize_thumb``) and never aborts the job or drops
the batch. Raising ``NotImplementedError`` (the unregistered default)
routes the whole batch to the deterministic byte-level fallback, which
is what the exact DuckDB oracles check; a registered real decoder
makes the tensor-derived columns rows-only by design. The injected-
decoder pytest (tests/test_api_and_ext.py::test_media_injected_decoder)
drives a fake decoder through all three ops end to end.

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


def _md5_hex(b: bytes) -> str:
    """Fingerprint contract for frame/first-frame hashes: md5 over the
    UPPERCASE HEX encoding of the slice bytes (not the raw bytes).
    Hex-of-bytes is bijective, so the fingerprint quality is identical —
    and it is the only byte-exact form a SQL oracle can reproduce:
    DuckDB's md5() accepts VARCHAR only (no BLOB overload), while
    hex(encode(text)) round-trips arbitrary payload bytes losslessly.
    ASCII corpora hashed raw == hex only by accident; unicode payloads
    exposed the divergence (fuzz gate, unicode profile)."""
    import hashlib

    return hashlib.md5(b.hex().upper().encode()).hexdigest()


def _sql_byte(hx: str, i: str) -> str:
    """SQL for the byte value at 1-based byte index ``i`` of the
    uppercase-hex string ``hx`` — the DuckDB twin of payload[i-1]."""
    h1 = f"ord(substr({hx}, 2*({i})-1, 1))"
    h2 = f"ord(substr({hx}, 2*({i}), 1))"
    return (f"((({h1}) - CASE WHEN ({h1}) >= 65 THEN 55 ELSE 48 END) * 16"
            f" + (({h2}) - CASE WHEN ({h2}) >= 65 THEN 55 ELSE 48 END))")


FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("mean_byte", DoubleType()),
    StructField("frame_count", IntegerType()),
    StructField("first_frame_hash", StringType()),
])


# The registered decoder (module docstring: PRODUCTION DECODER
# CONTRACT). None -> every media op uses its deterministic byte-level
# fallback, which is what the exact oracles check.
_DECODER = None


def set_decoder(fn) -> None:
    """Register ``fn(payload: bytes, kind: str) -> np.ndarray`` as THE
    decoder. Must run before the media query is BUILT — the ops capture
    the decoder into their mapInPandas closure at plan time."""
    global _DECODER
    _DECODER = fn


def clear_decoder() -> None:
    global _DECODER
    _DECODER = None


def get_decoder():
    return _DECODER


def decode_stub(payload: bytes, kind: str = "image"):
    """WHERE A REAL DECODER PLUGS IN (see the module docstring for the
    full contract). PIL.Image.open / torchaudio.load / ffmpeg
    frame-sampling are not available in this container, so with no
    registered decoder this raises NotImplementedError and the feature
    extractor falls back to deterministic byte-level pseudo-features
    (keeps the Arrow pipeline exercised end to end)."""
    if _DECODER is not None:
        return _DECODER(payload, kind)
    raise NotImplementedError(
        f"no {kind} decoder in this environment; "
        "swap in PIL/torchaudio/ffmpeg here"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    mapInPandas: each Arrow batch becomes a pandas frame. The decoder
    (captured at plan time — module docstring contract) drives the real
    branch; with none registered the fallback computes byte statistics
    VECTORIZED across the whole batch (one buffer concat + one int64
    cumsum, per-row sums by offset difference — no per-row Python
    loop). Only the real-decoder branch iterates per asset, because
    decoders are inherently per-asset.

    The decoder is called with each asset's ACTUAL kind, derived from
    ``media_meta.mime`` when the input carries it (``image/*`` /
    ``audio/*`` / ``video/*`` prefix; anything else — including the
    test corpus's ``application/fake`` — defaults to ``"image"``), so
    a kind-dispatching production decoder decodes video as video
    (ADVICE r10). Decoded-tensor features: mean_byte = floor-rounded
    mean of the decoded array; frame_count = shape[0] along the frame
    axis for a ``video`` asset (or for a >=3-d video-SHAPED return
    from a non-video request, e.g. an animated-image decode), else 1;
    first_frame_hash = the _md5_hex fingerprint of the first frame's
    (or whole array's) raw bytes; a ValueError payload keeps its row
    with NULL tensor features."""
    dec = get_decoder()
    has_meta = "media_meta" in df.columns

    def _kind(mime) -> str:
        top = str(mime).split("/", 1)[0] if mime else ""
        return top if top in ("image", "audio", "video") else "image"

    def gen(batches):
        import numpy as np
        import pandas as pd

        cols = [f.name for f in FEATURE_SCHEMA.fields]

        def real_branch(pdf, payloads):
            # per-asset loop is correct here — decoding is inherently
            # per-asset. ValueError degrades the row (NULL tensor
            # features); an empty video tensor (shape (0, ...)) is a
            # legal decode with frame_count 0 and the hash of an empty
            # buffer — never an abort.
            if has_meta:
                kinds = [_kind(m["mime"] if m is not None else None)
                         for m in pdf["media_meta"]]
            else:
                kinds = ["image"] * len(payloads)
            out = {c: [] for c in cols}
            for doc_id, p, kind in zip(pdf["doc_id"], payloads, kinds):
                out["doc_id"].append(int(doc_id))
                out["n_bytes"].append(len(p))
                try:
                    a = np.asarray(dec(p, kind))
                except ValueError:
                    out["mean_byte"].append(None)
                    out["frame_count"].append(None)
                    out["first_frame_hash"].append(None)
                    continue
                framed = (kind == "video" and a.ndim >= 1) or a.ndim >= 3
                first = a[0] if framed and a.shape[0] else a
                out["mean_byte"].append(
                    float(np.floor(float(a.astype(np.float64).mean())
                                   * 1e6 + 0.5) / 1e6)
                    if a.size else 0.0)
                out["frame_count"].append(
                    int(a.shape[0]) if framed else 1)
                out["first_frame_hash"].append(
                    _md5_hex(np.ascontiguousarray(first).tobytes()))
            return pd.DataFrame(out, columns=cols).astype(
                {"frame_count": "Int32"})

        for pdf in batches:
            payloads = [bytes(p) for p in pdf["content"]]
            if dec is not None:
                try:
                    yield real_branch(pdf, payloads)
                    continue
                except NotImplementedError:
                    pass  # contract: route the whole batch to fallback
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
                    _md5_hex(p[:16]) for p in payloads
                ],
            }, columns=cols)

    return df.mapInPandas(gen, FEATURE_SCHEMA)


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_features(with_media_column(docs))


# Oracle for the decoder-independent fallback features, BYTE-exact for
# any unicode payload: hex(encode(text)) exposes the utf-8 bytes to SQL
# (2 hex chars per byte), byte values come from hex-pair arithmetic
# (_sql_byte), and hashes follow the _md5_hex contract (md5 of the
# uppercase hex slice — DuckDB md5 has no BLOB overload). The previous
# per-CHAR ord()/substr() forms matched only while the corpus was pure
# ASCII (fuzz gate, unicode profile). A real-decoder deployment would
# drop back to rows-only for tensor outputs.
MEDIA_FEATURES_SQL = f"""
WITH h AS (
    SELECT doc_id, hex(encode(text)) AS hx,
           octet_length(encode(text)) AS nb
    FROM documents
)
SELECT doc_id,
       CAST(nb AS BIGINT) AS n_bytes,
       CASE WHEN nb = 0 THEN 0.0 ELSE
           floor(CAST(list_sum(list_transform(range(1, nb + 1),
                                              i -> {_sql_byte('hx', 'i')}))
                      AS DOUBLE) / nb * 1e6 + 0.5) / 1e6 END AS mean_byte,
       CAST(nb // 16 AS INT) AS frame_count,
       md5(substr(hx, 1, 32)) AS first_frame_hash
FROM h
""".strip()


FRAME_BYTES = 16     # fake frame size (one 16-byte slice per frame)
N_FRAME_SAMPLES = 4  # frames sampled per asset (evenly spaced)

FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("sample_j", IntegerType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_hash", StringType()),
    StructField("frame_mean", DoubleType()),
])


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame sampling over a binary "video" column: up to
    N_FRAME_SAMPLES evenly-spaced FRAME_BYTES-slices per asset, ONE
    INPUT ROW -> MANY OUTPUT ROWS — the Arrow batch shape a real ffmpeg
    frame sampler has (mapInPandas generators may change row counts
    freely). Frame j of an asset with fc frames is index
    (j * fc) // n_take (exact integer math, identical in the SQL twin).
    A registered decoder (module docstring contract) samples the same
    indices along the decoded array's frame axis (``kind="video"``;
    hash/mean over ``frame.tobytes()`` with the _md5_hex fingerprint; a
    ValueError payload emits zero frames); the fallback slices the
    payload bytes — same offsets, same plumbing."""
    dec = get_decoder()

    def gen(batches):
        import numpy as np
        import pandas as pd

        cols = [f.name for f in FRAME_SCHEMA.fields]

        def emit(out, doc_id, j, fidx, fb, a, denom):
            out["doc_id"].append(int(doc_id))
            out["sample_j"].append(j)
            out["frame_idx"].append(fidx)
            out["frame_hash"].append(_md5_hex(fb))
            out["frame_mean"].append(
                float(np.floor(int(a.sum()) / denom * 1e6 + 0.5) / 1e6))

        def real_branch(pdf):
            out = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                try:
                    frames = np.asarray(dec(bytes(payload), "video"))
                except ValueError:
                    continue  # undecodable asset: zero frames
                fc = int(frames.shape[0]) if frames.ndim else 0
                if fc == 0:
                    continue
                n_take = min(N_FRAME_SAMPLES, fc)
                for j in range(n_take):
                    fidx = (j * fc) // n_take
                    fb = np.ascontiguousarray(frames[fidx]).tobytes()
                    a = np.frombuffer(fb, dtype=np.uint8)
                    emit(out, doc_id, j, fidx, fb, a, len(fb) if fb else 1)
            return pd.DataFrame(out, columns=cols)

        def fallback(pdf):
            out = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                p = bytes(payload)
                fc = len(p) // FRAME_BYTES
                if fc == 0:
                    continue
                n_take = min(N_FRAME_SAMPLES, fc)
                for j in range(n_take):
                    fidx = (j * fc) // n_take
                    fb = p[fidx * FRAME_BYTES:(fidx + 1) * FRAME_BYTES]
                    a = np.frombuffer(fb, dtype=np.uint8)
                    emit(out, doc_id, j, fidx, fb, a, FRAME_BYTES)
            return pd.DataFrame(out, columns=cols)

        for pdf in batches:
            if dec is not None:
                try:
                    yield real_branch(pdf)
                    continue
                except NotImplementedError:
                    pass  # contract: route the whole batch to fallback
            yield fallback(pdf)

    return df.mapInPandas(gen, FRAME_SCHEMA)


def _media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return sample_frames(with_media_column(docs))


# Byte-exact twin of the fallback sampler: frame slices come from the
# hex encoding (32 hex chars = 16 payload bytes), hashes follow the
# _md5_hex contract, means use hex-pair byte values — see
# MEDIA_FEATURES_SQL's unicode rationale.
MEDIA_FRAME_SAMPLE_SQL = f"""
WITH f AS (
    SELECT doc_id, hex(encode(text)) AS hx,
           octet_length(encode(text)) // {FRAME_BYTES} AS fc
    FROM documents
),
t AS (
    SELECT doc_id, hx, fc, least({N_FRAME_SAMPLES}, fc) AS n_take
    FROM f WHERE fc > 0
),
s AS (
    SELECT doc_id, u.j AS sample_j, (u.j * fc) // n_take AS frame_idx,
           substr(hx, ((u.j * fc) // n_take) * {2 * FRAME_BYTES} + 1,
                  {2 * FRAME_BYTES}) AS frh
    FROM t, unnest(range(0, n_take)) AS u(j)
)
SELECT doc_id, CAST(sample_j AS INT) AS sample_j,
       CAST(frame_idx AS INT) AS frame_idx,
       md5(frh) AS frame_hash,
       floor(CAST(list_sum(list_transform(range(1, {FRAME_BYTES} + 1),
                                          i -> {_sql_byte('frh', 'i')}))
                  AS DOUBLE) / {FRAME_BYTES}.0 * 1e6 + 0.5) / 1e6 AS frame_mean
FROM s
""".strip()


N_THUMB_SEGS = 8

THUMB_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("seg", IntegerType()),
    StructField("seg_len", LongType()),
    StructField("seg_mean", DoubleType()),
])


def resize_thumb(df: DataFrame) -> DataFrame:
    """Deterministic "resize": downsample each asset's byte sequence to
    N_THUMB_SEGS bucket means (segment s covers bytes
    [s*nb//8, (s+1)*nb//8) — exact integer boundaries, every segment
    non-empty for nb >= 8). This is the 1-D analogue of an image
    thumbnail resize, with the real pixel resample plugging in at
    `decode_stub`; the fallback is FULLY vectorized across the batch —
    one buffer concat + one int64 cumsum, per-segment sums by cumsum
    difference at the absolute boundaries (no per-asset loop at all).
    A registered decoder (module docstring contract) downsamples the
    DECODED array's flattened bytes at the same segment boundaries
    (``kind="image"``; ValueError -> zero segments for that asset)."""
    dec = get_decoder()

    def gen(batches):
        import numpy as np
        import pandas as pd

        cols = [f.name for f in THUMB_SCHEMA.fields]

        def real_branch(pdf):
            out = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                try:
                    a = np.asarray(dec(bytes(payload), "image"))
                except ValueError:
                    continue
                flat = np.frombuffer(
                    np.ascontiguousarray(a).tobytes(),
                    dtype=np.uint8).astype(np.int64)
                nb = flat.size
                if nb < N_THUMB_SEGS:
                    continue
                for s in range(N_THUMB_SEGS):
                    lo = s * nb // N_THUMB_SEGS
                    hi = (s + 1) * nb // N_THUMB_SEGS
                    out["doc_id"].append(int(doc_id))
                    out["seg"].append(s)
                    out["seg_len"].append(hi - lo)
                    out["seg_mean"].append(float(
                        np.floor(int(flat[lo:hi].sum()) / (hi - lo)
                                 * 1e6 + 0.5) / 1e6))
            return pd.DataFrame(out, columns=cols).astype(
                {"seg": "int32", "seg_len": "int64"})

        for pdf in batches:
            if dec is not None:
                try:
                    yield real_branch(pdf)
                    continue
                except NotImplementedError:
                    pass  # contract: route the whole batch to fallback
            payloads = [bytes(p) for p in pdf["content"]]
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                               count=len(payloads))
            keep = lens >= N_THUMB_SEGS
            ids = pdf["doc_id"].to_numpy()[keep]
            klens = lens[keep]
            concat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            csum = np.concatenate(([0], np.cumsum(concat, dtype=np.int64)))
            starts = np.cumsum(lens) - lens
            kstarts = starts[keep]
            segs = np.arange(N_THUMB_SEGS, dtype=np.int64)
            lo = kstarts[:, None] + (segs[None, :] * klens[:, None]) // N_THUMB_SEGS
            hi = kstarts[:, None] + ((segs[None, :] + 1) * klens[:, None]) // N_THUMB_SEGS
            sums = csum[hi] - csum[lo]
            seg_len = hi - lo
            mean = np.floor(sums / seg_len * 1e6 + 0.5) / 1e6
            yield pd.DataFrame({
                "doc_id": np.repeat(ids, N_THUMB_SEGS).astype("int64"),
                "seg": np.tile(segs, len(ids)).astype("int32"),
                "seg_len": seg_len.ravel(),
                "seg_mean": mean.ravel(),
            }, columns=cols)

    return df.mapInPandas(gen, THUMB_SCHEMA)


def _media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return resize_thumb(with_media_column(docs))


# Byte-exact twin of the fallback thumbnailer: segment sums read true
# payload bytes via hex-pair arithmetic — see MEDIA_FEATURES_SQL's
# unicode rationale.
MEDIA_RESIZE_SQL = f"""
WITH f AS (
    SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
    FROM documents
),
s AS (
    SELECT doc_id, hx, u.s AS seg,
           (u.s * nb) // {N_THUMB_SEGS} AS lo,
           ((u.s + 1) * nb) // {N_THUMB_SEGS} AS hi
    FROM f, unnest(range(0, {N_THUMB_SEGS})) AS u(s)
    WHERE nb >= {N_THUMB_SEGS}
)
SELECT doc_id, CAST(seg AS INT) AS seg,
       CAST(hi - lo AS BIGINT) AS seg_len,
       floor(CAST(list_sum(list_transform(range(lo + 1, hi + 1),
                                          i -> {_sql_byte('hx', 'i')}))
                  AS DOUBLE) / CAST(hi - lo AS DOUBLE) * 1e6 + 0.5) / 1e6
           AS seg_mean
FROM s
""".strip()


SUITE = {
    "media_meta": ExtQuery(_media_meta, MEDIA_META_SQL),
    "media_features": ExtQuery(_media_features, MEDIA_FEATURES_SQL),
    "media_frame_sample": ExtQuery(_media_frame_sample, MEDIA_FRAME_SAMPLE_SQL),
    "media_resize_8": ExtQuery(_media_resize, MEDIA_RESIZE_SQL),
}
