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

``ticker()`` (pandas_ta/core.py#ticker, utils/data/yahoofinance.py)
is re-expressed as an OFFLINE vendor-directory adapter: the reference's
yfinance/AlphaVantage HTTP fetch is a non-starter cluster-side (every
executor hammering a rate-limited endpoint), so the cluster-native
shape is "vendor exports land in a directory; ``ticker()`` resolves
symbol -> file, normalizes to the canonical bars layout, and resamples
to the requested interval". The remote HTTP hop itself stays out of
scope (no network in this environment, and it belongs in an ingestion
job, not a query engine).
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
        # Vendor exports disagree on the epoch unit (yfinance JSON ships
        # seconds, many feeds milliseconds, this repo's parquet NANOS) —
        # a fixed assumption silently lands everything in 1970 (or year
        # 52970). Magnitude-dispatch per value: the unit bands are ~3
        # orders of magnitude apart, so any timestamp between 1973 and
        # 5138 resolves unambiguously. All arithmetic is exact integer
        # (`div`, not the double path, which drifts 1us on ~1.5% of
        # ns-scale values — see sources/bars.py).
        return F.expr("""
            timestamp_micros(CASE
                WHEN abs(ts) < 100000000000 THEN ts * 1000000
                WHEN abs(ts) < 100000000000000 THEN ts * 1000
                WHEN abs(ts) < 100000000000000000 THEN ts
                ELSE ts div 1000 END)""")
    return ts.cast("timestamp")


# vendor files commonly name the time column Date/Datetime/Timestamp
# (yfinance CSV exports use "Date"); accept those as ts aliases
_TS_ALIASES = ("ts", "date", "datetime", "timestamp", "time")


def _normalize(df: DataFrame, ts_format: str | None,
               strict: bool = False) -> DataFrame:
    # case-insensitive header mapping (Close == close), like Spark's
    # default resolver; last-one-wins on true case collisions
    lower = {c.lower(): c for c in df.columns}
    if "ts" not in lower:
        for a in _TS_ALIASES:
            if a in lower:
                lower["ts"] = lower[a]
                break
    missing = [c for c in _CANON if c not in lower]
    if missing:
        raise ValueError(f"bars source missing columns: {missing}")
    df = df.select(*[F.col(lower[c]).alias(c) for c in _CANON])
    ts = _ts_expr(df, ts_format)
    # bounded fail-fast: a wrong ts format turns EVERY row's ts NULL
    # silently under non-ANSI to_timestamp; checking a 1000-row sample
    # (an ARBITRARY, partition-order-dependent 1000 rows — ADVICE r8)
    # costs one tiny job and catches it at the connector instead of in
    # NULL-ordered windows far downstream. strict=True scans the whole
    # source instead: the check becomes exhaustive at the price of one
    # full pass — the right trade for a one-time ingest of an untrusted
    # feed, the wrong one inside a hot re-read loop.
    bad = (
        (df if strict else df.limit(1000))
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
    out = df.select(
        F.col("symbol").cast("string").alias("symbol"),
        ts.cast("timestamp").alias("ts"),
        *[F.col(c).cast("double").alias(c)
          for c in ("open", "high", "low", "close", "volume")],
    )
    # same bounded fail-fast for the numeric columns: the engine's
    # window min_periods masks (functions/windows.py masked()) and EWM
    # kernel seeds REQUIRE non-null OHLCV — a NULL close from an empty
    # CSV cell would silently diverge from the SQL oracles downstream,
    # so reject it at the connector
    nulls = (
        (out if strict else out.limit(1000))
        .filter(" OR ".join(
            f"{c} IS NULL"
            for c in ("open", "high", "low", "close", "volume")))
        .limit(1)
        .collect()
    )
    if nulls:
        raise ValueError(
            "bars source has NULL/unparseable OHLCV values "
            f"(first: {nulls[0].asDict()}); the indicator engine "
            "requires complete bars — clean or filter the source first"
            + ("" if strict else
               " (checked a 1000-row sample; pass strict=True for a "
               "full-scan check)"))
    return out


def bars_from_csv(spark: SparkSession, path: str, *, header: bool = True,
                  sep: str = ",", ts_format: str | None = None,
                  strict: bool = False) -> DataFrame:
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
    return _normalize(reader.csv(path), ts_format, strict)


def bars_from_json(spark: SparkSession, path: str, *,
                   ts_format: str | None = None,
                   strict: bool = False) -> DataFrame:
    """Read OHLCV bars from line-delimited JSON with an explicit schema
    (no sampling pass; unknown keys are simply never parsed)."""
    fields = ", ".join(
        f"{c} {'STRING' if c in ('symbol', 'ts') else 'DOUBLE'}"
        for c in _CANON
    )
    df = spark.read.schema(fields).json(path)
    return _normalize(df, ts_format, strict)


def ticker(
    spark: SparkSession,
    symbol: str,
    source_dir: str,
    *,
    interval: str | None = None,
    start: str | None = None,
    end: str | None = None,
    ts_format: str | None = None,
) -> DataFrame:
    """Offline twin of the reference's ``df.ta.ticker()``
    (pandas_ta/core.py#ticker, utils/data/yahoofinance.py): resolve one
    instrument from a vendor-export directory, normalize to the
    canonical bars layout, optionally slice [start, end) and resample.

    ``source_dir`` holds one file per instrument — ``{symbol}.parquet``
    / ``.csv`` / ``.json`` (checked in that order; symbol matching is
    case-insensitive on the stem). Vendor single-instrument exports
    usually lack a symbol column (yfinance CSVs are
    ``Date,Open,High,Low,Close,...``); one is injected. ``interval``
    accepts ``"15m"``/``"4h"``/``"1d"``-style strings and resamples
    with OHLC semantics via ``resample_bars`` when the target is
    requested. ``start``/``end`` are timestamp strings filtered on the
    parsed ts — for parquet sources the predicate pushes into the scan.

    The reference's remote HTTP fetch is deliberately NOT reproduced:
    cluster-side, a thousand executors hammering a rate-limited vendor
    endpoint is an anti-pattern — ingestion lands exports in
    ``source_dir`` (one job), and this adapter serves every query from
    the files. Unknown symbols fail fast with the available inventory.
    """
    import os

    from pandas_ta_spark.sources.bars import resample_bars

    stems = {}
    try:
        for fn in sorted(os.listdir(source_dir)):
            stem, ext = os.path.splitext(fn)
            stems.setdefault(stem.lower(), {})[ext.lower()] = fn
    except FileNotFoundError:
        raise ValueError(f"ticker source_dir does not exist: {source_dir}")
    entry = stems.get(symbol.lower())
    if entry is None:
        raise ValueError(
            f"no vendor file for symbol {symbol!r} in {source_dir}; "
            f"available: {sorted(stems)}"
        )
    for ext in (".parquet", ".csv", ".json"):
        if ext in entry:
            path = f"{source_dir}/{entry[ext]}"
            break
    else:
        raise ValueError(
            f"symbol {symbol!r} has no supported extension in "
            f"{source_dir}: {sorted(entry)}"
        )
    if ext == ".parquet":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(path)
    elif ext == ".csv":
        raw = spark.read.option("header", "true").csv(path)
    else:
        raw = spark.read.json(path)
    if not any(c.lower() == "symbol" for c in raw.columns):
        raw = raw.withColumn("symbol", F.lit(symbol))
    df = _normalize(raw, ts_format)
    if start is not None:
        df = df.filter(F.col("ts") >= F.to_timestamp(F.lit(start)))
    if end is not None:
        df = df.filter(F.col("ts") < F.to_timestamp(F.lit(end)))
    if interval is not None:
        df = resample_bars(df, _interval_minutes(interval))
    return df


def _interval_minutes(interval: str) -> int:
    """Parse a reference-style interval string ("15m", "4h", "1d",
    "1w") to minutes."""
    import re

    m = re.fullmatch(r"(\d+)\s*(m|min|h|d|w)", interval.strip().lower())
    if not m:
        raise ValueError(
            f"unsupported interval {interval!r}; use e.g. 15m, 4h, 1d, 1w"
        )
    per = {"m": 1, "min": 1, "h": 60, "d": 1440, "w": 10080}[m.group(2)]
    return int(m.group(1)) * per


def bars_from_parquet(spark: SparkSession, path: str,
                      strict: bool = False) -> DataFrame:
    """Read bars already in (or castable to) the canonical layout from
    parquet — column pruning + predicate pushdown for free. Sets the
    nanos-as-long legacy conf itself: pandas-exported parquet stores
    datetime64[ns] as TIMESTAMP(NANOS), which Spark 4's reader otherwise
    rejects, and relying on an earlier load_table() call to have flipped
    it would make this connector order-dependent."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _normalize(spark.read.parquet(path), None, strict)


def bars_from_orc(spark: SparkSession, path: str,
                  ts_format: str | None = None,
                  strict: bool = False) -> DataFrame:
    """Read bars from ORC — the other columnar lake format Spark reads
    natively (Hive-era lakes are usually ORC). Same free column pruning
    + predicate pushdown as parquet; no nanos quirk (ORC timestamps are
    microsecond-class), so the shared _normalize handles epoch or
    string ts like the other connectors."""
    return _normalize(spark.read.orc(path), ts_format, strict)
