"""File-format connectors for the canonical bars schema.

The reference ingests whatever pandas reads — CSV/JSON OHLCV files are
the overwhelmingly common case (pandas_ta/core.py works on any
DataFrame; its docs/examples use ``pd.read_csv``). The Spark-first
versions below:

- pass the EXPLICIT bar schema to the reader, so Spark never runs the
  schema-inference pre-scan (a full extra pass over 100 TB of text);
- keep the scan pruned: readers project the canonical columns only, and
  CSV/JSON pushdown still prunes files by partition directories;
- normalize into ``BAR_SCHEMA`` (symbol, ts, open, high, low, close,
  volume) so every operator downstream is source-agnostic; headers are
  matched case-insensitively (``Close`` == ``close``), like Spark's own
  default resolver;
- FAIL FAST on unparseable timestamps: a bounded 1000-row sample is
  parse-checked at connector-call time, so a mismatched ts format
  surfaces as an immediate error instead of NULL-ordered windows (the
  session runs non-ANSI for indicator semantics, where to_timestamp
  yields silent NULLs).

``ticker()``-style remote fetch stays out of scope (SURVEY §2.9):
``spark.read`` against an exported file/table IS the cluster-native
replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_ta_spark.sources.bars import BAR_SCHEMA

_CANON = [f.name for f in BAR_SCHEMA.fields]


def _ts_expr(df: DataFrame, ts_format: str | None):
    ts = F.col("ts")
    ts_type = dict(df.dtypes).get("ts")
    if ts_format is not None:
        return F.to_timestamp(ts, ts_format)
    if ts_type == "string":
        return F.to_timestamp(ts)
    if ts_type == "bigint":
        # epoch-nanos int64 — the repo's parquet TIMESTAMP(NANOS)
        # convention (see sources/bars.py load_table). A bare
        # cast("timestamp") would read the int as epoch SECONDS.
        return F.timestamp_micros((ts / 1000).cast("long"))
    return ts.cast("timestamp")


def _normalize(df: DataFrame, ts_format: str | None) -> DataFrame:
    # case-insensitive header mapping (Close == close), like Spark's
    # default resolver; last-one-wins on true case collisions
    lower = {c.lower(): c for c in df.columns}
    missing = [c for c in _CANON if c not in lower]
    if missing:
        raise ValueError(f"bars source missing columns: {missing}")
    df = df.select(*[F.col(lower[c]).alias(c) for c in _CANON])
    ts = _ts_expr(df, ts_format)
    # bounded fail-fast: a wrong ts format turns EVERY row's ts NULL
    # silently under non-ANSI to_timestamp; checking a 1000-row sample
    # costs one tiny job and catches it at the connector instead of in
    # NULL-ordered windows far downstream
    bad = (
        df.limit(1000)
        .select(F.col("ts").alias("raw"), ts.alias("parsed"))
        .filter(F.col("raw").isNotNull() & F.col("parsed").isNull())
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"bars source ts value {bad[0]['raw']!r} does not parse as a "
            "timestamp; pass ts_format= with the source's pattern"
        )
    return df.select(
        F.col("symbol").cast("string").alias("symbol"),
        ts.cast("timestamp").alias("ts"),
        *[F.col(c).cast("double").alias(c)
          for c in ("open", "high", "low", "close", "volume")],
    )


def bars_from_csv(spark: SparkSession, path: str, *, header: bool = True,
                  sep: str = ",", ts_format: str | None = None) -> DataFrame:
    """Read OHLCV bars from CSV without an inference pre-scan.

    With a header, columns are mapped BY NAME (no schema passed — Spark
    then names the all-string columns from the header instead of
    assigning a schema positionally, which would silently scramble any
    file whose column order differs); extra columns are simply pruned by
    the projection. Headerless files must be in the canonical column
    order and get the explicit schema. Casts happen in the projection
    where Catalyst folds them into the scan."""
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if not header:
        reader = reader.schema(", ".join(f"{c} STRING" for c in _CANON))
    return _normalize(reader.csv(path), ts_format)


def bars_from_json(spark: SparkSession, path: str, *,
                   ts_format: str | None = None) -> DataFrame:
    """Read OHLCV bars from line-delimited JSON with an explicit schema
    (no sampling pass; unknown keys are simply never parsed)."""
    fields = ", ".join(
        f"{c} {'STRING' if c in ('symbol', 'ts') else 'DOUBLE'}"
        for c in _CANON
    )
    df = spark.read.schema(fields).json(path)
    return _normalize(df, ts_format)


def bars_from_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read bars already in (or castable to) the canonical layout from
    parquet — column pruning + predicate pushdown for free. Sets the
    nanos-as-long legacy conf itself: pandas-exported parquet stores
    datetime64[ns] as TIMESTAMP(NANOS), which Spark 4's reader otherwise
    rejects, and relying on an earlier load_table() call to have flipped
    it would make this connector order-dependent."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _normalize(spark.read.parquet(path), None)
