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
  volume) so every operator downstream is source-agnostic.

``ticker()``-style remote fetch stays out of scope (SURVEY §2.9):
``spark.read`` against an exported file/table IS the cluster-native
replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_ta_spark.sources.bars import BAR_SCHEMA

_CANON = [f.name for f in BAR_SCHEMA.fields]


def _normalize(df: DataFrame, ts_format: str | None) -> DataFrame:
    missing = [c for c in _CANON if c not in df.columns]
    if missing:
        raise ValueError(f"bars source missing columns: {missing}")
    ts = F.col("ts")
    ts_type = dict(df.dtypes).get("ts")
    if ts_format is not None:
        ts = F.to_timestamp(ts, ts_format)
    elif ts_type == "string":
        ts = F.to_timestamp(ts)
    elif ts_type == "bigint":
        # epoch-nanos int64 — the repo's parquet TIMESTAMP(NANOS)
        # convention (see sources/bars.py load_table). A bare
        # cast("timestamp") would read the int as epoch SECONDS.
        ts = F.timestamp_micros((ts / 1000).cast("long"))
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
    fields = ("symbol STRING, ts STRING, open DOUBLE, high DOUBLE, "
              "low DOUBLE, close DOUBLE, volume DOUBLE")
    df = spark.read.schema(fields).json(path)
    return _normalize(df, ts_format)


def bars_from_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read bars already in (or castable to) the canonical layout from
    parquet — column pruning + predicate pushdown for free."""
    return _normalize(spark.read.parquet(path), None)
