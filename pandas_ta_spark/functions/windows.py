"""Window-spec builders, warmup masks, and SQL twins.

The heart of the engine: ~70% of reference ops are ROLL/WROLL/CUM window
kinds (SURVEY.md §2.10). Everything here produces Catalyst expressions over
``Window.partitionBy("symbol").orderBy("ts")`` so that an arbitrary number
of indicators sharing that spec collapse into a handful of WindowExec
operators after ONE exchange + ONE sort (SURVEY.md §4.2) — the property
that keeps a 100-indicator strategy at a single shuffle on a 1000-executor
cluster.

Warmup parity (SURVEY.md §4.3.1): pandas ``rolling(n)`` emits NaN for the
first n-1 rows; Spark would emit partial aggregates over the short leading
frame. Every ROLL expression is therefore masked with
``count(x) OVER frame >= n`` — the exact analogue of pandas
``min_periods=n`` (counts non-null values in the frame).

Each Python builder has a SQL twin (``sql_*``) used to generate the DuckDB
oracle strings for the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

SYMBOL = "symbol"
TS = "ts"
CUM_SCALE = 1e8


def w_order() -> WindowSpec:
    """The canonical per-instrument ordering: one spec shared by every op."""
    return Window.partitionBy(SYMBOL).orderBy(TS)


def w_rows(n: int) -> WindowSpec:
    """Trailing fixed window of n rows (pandas rolling(n) analogue)."""
    return w_order().rowsBetween(-(n - 1), 0)


def w_all() -> WindowSpec:
    """Expanding window from partition start (pandas expanding/cumsum)."""
    return w_order().rowsBetween(Window.unboundedPreceding, 0)


BAR_COLS = frozenset({"open", "high", "low", "close", "volume"})


def masked(expr: Column, src: Column | str, n: int, min_periods: int | None = None) -> Column:
    """NULL-mask warmup rows: emit expr only once >= min_periods non-null
    source values are inside the trailing n-row frame (pandas min_periods).

    For base bar columns (never NULL by schema) the count-in-frame test
    reduces to ``row_number() >= n`` — one shared ranking function across
    every op in a strategy instead of one count-window per op. Staged
    columns (which may carry warmup NULLs) keep the exact count test.
    """
    mp = n if min_periods is None else min_periods
    if isinstance(src, str) and src in BAR_COLS and mp == n:
        return F.when(rn() >= n, expr)
    src_col = F.col(src) if isinstance(src, str) else src
    return F.when(F.count(src_col).over(w_rows(n)) >= mp, expr)


def roll(agg_fn, src: Column | str, n: int, min_periods: int | None = None) -> Column:
    """Masked rolling aggregate: roll(F.avg, 'close', 20) == pandas
    close.rolling(20).mean() including warmup NaN->NULL parity."""
    src_col = F.col(src) if isinstance(src, str) else src
    return masked(agg_fn(src_col).over(w_rows(n)), src_col, n, min_periods)


# Sliding-frame aggregates recompute O(w) work per row in WindowExec; for
# large windows the cumsum-difference rewrite (SURVEY §4.3.2) computes the
# same sum in O(1)/row from running totals. Combined with fixed-point
# quantization the difference is EXACT (integer arithmetic — no
# cancellation), so the rewrite is numerically safe at any window size.
LARGE_WINDOW_THRESHOLD = 128


def cumsum_int(src: Column | str, scale: float = CUM_SCALE) -> Column:
    """Stage 1 of the rewrite: expanding BIGINT sum of quantized terms
    (exact, associative). Window functions cannot nest, so the difference
    step lives in a later stage — see overlap.sma(large=True)."""
    src_col = F.col(src) if isinstance(src, str) else src
    q = F.floor(src_col * scale + F.lit(0.5)).cast("long")
    return F.sum(q).over(w_all())


def sql_cumsum_int(src_sql: str, scale: float = CUM_SCALE) -> str:
    return (f"sum(CAST(floor(({src_sql}) * {scale!r} + 0.5) AS BIGINT))"
            f" OVER ({SQL_W_ALL})")


def wroll(src: Column | str, weights: list[float], normalize: bool = True) -> Column:
    """Weighted rolling dot-product (WROLL kind: wma/pwma/fwma/sinwma/alma/
    cg/swma families — SURVEY.md §2 legend).

    Expressed as a sum of lag() terms: for the short windows TA uses
    (n <= ~60) this stays inside whole-stage codegen and shares the single
    (symbol, ts) sort — no collect_list materialization, no Python.
    weights[i] multiplies lag i (weights[0] = current row).
    """
    src_col = F.col(src) if isinstance(src, str) else src
    n = len(weights)
    total = sum(weights) if normalize else 1.0
    acc = F.lit(0.0)
    for i, w in enumerate(weights):
        term = src_col if i == 0 else F.lag(src_col, i).over(w_order())
        acc = acc + F.lit(w / total) * term
    return masked(acc, src if isinstance(src, str) else src_col, n)


def shift(src: Column | str, k: int = 1) -> Column:
    """pandas Series.shift(k) — F.lag over the canonical ordering."""
    src_col = F.col(src) if isinstance(src, str) else src
    if k == 0:
        return src_col
    return F.lag(src_col, k).over(w_order()) if k > 0 else F.lead(src_col, -k).over(w_order())


def diff(src: Column | str, k: int = 1) -> Column:
    """pandas Series.diff(k)."""
    src_col = F.col(src) if isinstance(src, str) else src
    return src_col - shift(src_col, k)


def cumsum_fixed(term: Column, scale: float = CUM_SCALE) -> Column:
    """Deterministic expanding sum: quantize terms to 1/scale integers
    (shared floor formula), sum exactly as BIGINT, divide back.

    Float summation is association-order-dependent — Spark and DuckDB (and
    two runs of a distributed engine with different partition merge orders)
    disagree in the last ulp, which breaks exact value-hash comparison and
    run-to-run reproducibility at 100 TB. Integer summation is exact and
    associative, so every engine/ordering produces bit-identical results.
    Costs 1e-8 absolute quantization per term (documented tolerance for
    golden-parity tests of CUM ops)."""
    q = F.floor(term * scale + F.lit(0.5)).cast("long")
    return F.sum(q).over(w_all()) / F.lit(scale)


def sql_cumsum_fixed(term_sql: str, scale: float = CUM_SCALE) -> str:
    """DuckDB twin of cumsum_fixed — same quantization, exact BIGINT sum."""
    return (f"(sum(CAST(floor(({term_sql}) * {scale!r} + 0.5) AS BIGINT))"
            f" OVER ({SQL_W_ALL}) / {scale!r})")


def rn() -> Column:
    """1-based row position within the instrument (warmup masks, argmax tricks)."""
    return F.row_number().over(w_order())


def bars_since_extreme(val: Column | str, n: int, is_max: bool) -> Column:
    """Distance (in rows) to the most recent max/min in the trailing n-row
    frame, latest-tie-wins — the reference's reversed argmax
    (``pandas_ta/utils/_core.py#recent_maximum_index``, used by aroon).

    max_by(rn, struct(value, rn)) picks the row with the largest (value, rn)
    pair, so ties resolve to the most recent row, matching the reference's
    reversed-array argmax.
    """
    val_col = F.col(val) if isinstance(val, str) else val
    row = rn()
    key = F.struct(val_col if is_max else -val_col, row)
    best_rn = F.max_by(row, key).over(w_rows(n))
    return masked(row - best_rn, val_col, n)


# --------------------------------------------------------------------------
# SQL twins (DuckDB oracle generation). Frame syntax is ANSI and identical
# in Spark SQL and DuckDB.
# --------------------------------------------------------------------------

SQL_W_ORDER = "PARTITION BY symbol ORDER BY ts"


def sql_w_rows(n: int) -> str:
    return f"{SQL_W_ORDER} ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW"


SQL_W_ALL = f"{SQL_W_ORDER} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"


def sql_masked(expr_sql: str, src_sql: str, n: int, min_periods: int | None = None) -> str:
    mp = n if min_periods is None else min_periods
    return (
        f"CASE WHEN count({src_sql}) OVER ({sql_w_rows(n)}) >= {mp} "
        f"THEN {expr_sql} END"
    )


def sql_roll(agg: str, src_sql: str, n: int, min_periods: int | None = None) -> str:
    return sql_masked(f"{agg}({src_sql}) OVER ({sql_w_rows(n)})", src_sql, n, min_periods)


def sql_wroll(src_sql: str, weights: list[float], normalize: bool = True) -> str:
    n = len(weights)
    total = sum(weights) if normalize else 1.0
    terms = []
    for i, w in enumerate(weights):
        term = src_sql if i == 0 else f"lag({src_sql}, {i}) OVER ({SQL_W_ORDER})"
        terms.append(f"({w / total!r}) * ({term})")
    return sql_masked(" + ".join(terms), src_sql, n)


def sql_shift(src_sql: str, k: int = 1) -> str:
    if k == 0:
        return src_sql
    fn = "lag" if k > 0 else "lead"
    return f"{fn}({src_sql}, {abs(k)}) OVER ({SQL_W_ORDER})"


def sql_diff(src_sql: str, k: int = 1) -> str:
    return f"(({src_sql}) - {sql_shift(src_sql, k)})"
