"""Time/calendar helpers — twins of pandas_ta/utils/_time.py.

``to_utc`` converts the ts column; the *_to_date helpers slice a bars
frame to the current month/quarter/year relative to each symbol's latest
timestamp (calendar-window filters push down to the scan when bars are
date-partitioned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# exchange -> UTC offset hours (public reference metadata,
# pandas_ta/__init__.py#EXCHANGE_TZ)
EXCHANGE_TZ = {
    "NZSX": 12, "ASX": 11, "TSE": 9, "HKE": 8, "SSE": 8, "SGX": 8,
    "NSE": 5.5, "DIFX": 4, "RTS": 3, "JSE": 2, "FWB": 1, "LSE": 1,
    "BMF": -2, "NYSE": -4, "TSX": -4,
}

# bars-per-year constants (pandas_ta/__init__.py#RATE)
RATE = {
    "DAYS_PER_MONTH": 21, "MINUTES_PER_HOUR": 60, "MONTHS_PER_YEAR": 12,
    "QUARTERS_PER_YEAR": 4, "TRADING_DAYS_PER_YEAR": 252,
    "TRADING_HOURS_PER_DAY": 6.5, "WEEKS_PER_YEAR": 52, "YEARLY": 1,
}


def to_utc(df: DataFrame, tz: str) -> DataFrame:
    """Interpret ts as wall-clock in tz and convert to UTC
    (utils/_time.py#to_utc)."""
    return df.withColumn("ts", F.to_utc_timestamp("ts", tz))


def _to_date(df: DataFrame, unit: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("symbol")
    latest = F.max("ts").over(w)
    return df.withColumn("_latest", latest).filter(
        F.date_trunc(unit, F.col("ts")) == F.date_trunc(unit, F.col("_latest"))
    ).drop("_latest")


def df_month_to_date(df: DataFrame) -> DataFrame:
    """Rows in each symbol's latest month (utils/_time.py#df_month_to_date)."""
    return _to_date(df, "month")


def df_quarter_to_date(df: DataFrame) -> DataFrame:
    return _to_date(df, "quarter")


def df_year_to_date(df: DataFrame) -> DataFrame:
    return _to_date(df, "year")
