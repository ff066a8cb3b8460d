"""Recursive-CTE DuckDB oracles for the EWM family.

The engine's exponential smoothers standardize on the SMA-seeded recursive
form (functions/pdkernels.py):

    y = NULL                       while fewer than n source values seen
    y[seed] = SMA(x, n)            at the n-th source value
    y[t] = a*x[t] + (1-a)*y[t-1]   after

That recursion is not a SQL window function, but it IS expressible as a
recursive CTE: the anchor row is the seed (the unique row where the
cumulative non-null count of x reaches n), and the recursive step walks
rn -> rn+1 per symbol. DuckDB executes this exactly, giving the driver a
true value-level oracle for EWM ops (instead of the weaker rows-only
check). Chained smoothers (DEMA/TEMA/MACD signal, ... —
pandas_ta/overlap/dema.py#dema, pandas_ta/momentum/macd.py#macd) compose:
each stage's recursion reads the previous stage's output relation.

Only used to GENERATE oracle strings; Spark execution runs the Arrow
kernels in plans/kernels.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pandas_ta_spark.functions.windows import SQL_W_ORDER
from pandas_ta_spark.operators.base import SEED_GUARD, _SCALE, sql_round


def sql_seed_mean(x: str, frame: str) -> str:
    """DuckDB twin of base.seed_mean over a window frame.

    Quantize each input to the 1e-6 grid (floor(x*1e6+0.5): the exact
    double op sequence py_round uses), sum EXACTLY as HUGEINT, then
    divide with the same float-op order as the Python side
    ((double(sum)/count)/1e6). The guard branch (any non-finite or
    >= SEED_GUARD input in the frame: max(abs) is NaN-poisoned in
    DuckDB, so one predicate covers inf/NaN/huge) falls back to the
    legacy window avg — matching seed_mean's legacy sum()/n branch up
    to association, in the band where py_round passes values through
    unrounded anyway. Divides by count(x) (not the nominal n) so
    interior-NULL frames keep today's avg semantics.
    """
    # window exprs are evaluated for every row BEFORE the CASE picks a
    # branch, so the HUGEINT cast must never see NaN/inf/huge: clamp
    # each element to 0 outside the guard (the outer CASE discards the
    # clamped sum whenever any element is out-of-guard, so the substituted
    # zeros are never read) — without this, one NaN row hard-errors the
    # whole oracle instead of taking the legacy branch
    # (test_seed_mean_three_path_parity).
    q1 = (f"CAST(floor((CASE WHEN abs({x}) < {SEED_GUARD!r} THEN ({x})"
          f" ELSE 0.0 END) * {_SCALE!r} + 0.5) AS HUGEINT)")
    return (
        f"(CASE WHEN max(abs({x})) OVER {frame} < {SEED_GUARD!r}"
        f" THEN (CAST(sum({q1})"
        f" OVER {frame} AS DOUBLE) / count(({x})) OVER {frame}) / {_SCALE!r}"
        f" ELSE avg(({x})) OVER {frame} END)"
    )


@dataclass
class EwmStage:
    """One smoother: out = EWM(src_sql, alpha) seeded by SMA(seed_n).

    ``src_sql`` may reference bar columns, previously defined ``pre``
    columns, or the outputs of earlier stages.
    """

    out: str
    src_sql: str
    alpha: float
    seed_n: int


def ewm_pipeline_sql(
    steps: list,
    final: dict[str, str],
    pre: dict[str, str] | None = None,
) -> str:
    """Full DuckDB query: bars CTE -> optional pre-computed columns ->
    interleaved steps -> SELECT symbol, ts, rounded finals.

    Each step is either an ``EwmStage`` (recursive smoother) or a plain
    ``dict[name, sql_expr]`` (projection/window CTE over the previous
    relation — used for e.g. the MACD line between its EMAs and its
    signal smoother, or rolling sums after a smoother chain).
    ``final`` maps output alias -> SQL expr over bar/pre/step columns.
    """
    from pandas_ta_spark.sources.bars import BARS_FROM_EVENTS_SQL

    ctes = [f"bars AS MATERIALIZED (\n{BARS_FROM_EVENTS_SQL}\n)"]
    pre_sql = ""
    if pre:
        pre_sql = ", " + ", ".join(f"({e}) AS {a}" for a, e in pre.items())
    ctes.append(
        "base AS MATERIALIZED (SELECT *"
        + pre_sql
        + f", row_number() OVER ({SQL_W_ORDER}) AS _rn FROM bars)"
    )
    prev = _emit_ewm_ctes(steps, "base", ctes)
    outs = ", ".join(
        f"{sql_round(e)} AS \"{a}\"" for a, e in final.items()
    )
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + f"\nSELECT symbol, ts, {outs} FROM {prev}"
    )


def _emit_ewm_ctes(steps: list, start_rel: str, ctes: list[str],
                   tag: str = "") -> str:
    """Append the CTE chain for interleaved EWM/projection steps; returns
    the name of the final relation. Shared by ewm_pipeline_sql and
    recursive_oracle (state machines fed by smoother chains)."""
    prev = start_rel
    for k, step in enumerate(steps):
        k = f"{tag}{k}"
        if isinstance(step, dict):
            cols = ", ".join(f"({e}) AS {a}" for a, e in step.items())
            ctes.append(f"e{k} AS MATERIALIZED (SELECT *, {cols} FROM {prev})")
            prev = f"e{k}"
            continue
        st = step
        a = repr(float(st.alpha))
        n = st.seed_n
        s_rel = f"s{k}"
        p_rel = f"p{k}"
        r_rel = f"r{k}"
        o_rel = f"o{k}"
        seed_frame = (f"(PARTITION BY symbol ORDER BY _rn"
                      f" ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)")
        ctes.append(
            f"{s_rel} AS MATERIALIZED (SELECT *, ({st.src_sql}) AS _x{k},"
            f" count(({st.src_sql})) OVER (PARTITION BY symbol ORDER BY _rn) AS _nv{k},"
            f" {sql_seed_mean(st.src_sql, seed_frame)} AS _sma{k}"
            f" FROM {prev})"
        )
        # recursion walks a slim (symbol, rn, x) projection; wide bar
        # columns rejoin only once at the end — keeps the per-iteration
        # join cheap
        ctes.append(
            f"{p_rel} AS MATERIALIZED (SELECT symbol, _rn, _x{k}, _nv{k}, _sma{k} FROM {s_rel})"
        )
        # step formula mirrors pandas ewm(adjust=False) BITWISE,
        # including its constant-series guard ("avoid numerical errors
        # on constant series", pandas window/aggregations.pyx): when the
        # running value already EQUALS the input, pandas holds it
        # exactly, while the raw recursion a*x + (1-a)*x can drift a
        # last-ulp off x (alpha-and-value dependent) — which flipped
        # 1e-6-grid roundings and threshold flags against the kernels
        # on constant stretches (fuzz gate). Off the guard, pandas
        # computes (1-a)*y + a*x — commutatively identical to the form
        # below (verified bit-exact on random series).
        # seed: quantized SMA for n > 1 (the kernel's py_round twin,
        # pdkernels.ewm_seeded seed note); n == 1 passes the RAW first
        # value through un-rounded — the reference's ema(sma=False)
        # branch seeds from the value itself, and a single double needs
        # no association-free form (r12 ADVICE; kernel twin mirrors).
        seed_expr = f"_x{k}" if n == 1 else sql_round(f"_sma{k}")
        ctes.append(
            f"{r_rel} AS ("
            f"SELECT symbol, _rn, {seed_expr} AS _y"
            f" FROM {p_rel} WHERE _nv{k} = {n}"
            f" UNION ALL "
            f"SELECT s.symbol, s._rn,"
            f" CASE WHEN r._y = s._x{k} THEN r._y"
            f" ELSE {a} * s._x{k} + (1 - {a}) * r._y END"
            f" FROM {p_rel} s JOIN {r_rel} r"
            f" ON s.symbol = r.symbol AND s._rn = r._rn + 1)"
        )
        ctes.append(
            f"{o_rel} AS MATERIALIZED (SELECT s.*, r._y AS {st.out}"
            f" FROM {s_rel} s LEFT JOIN {r_rel} r USING (symbol, _rn))"
        )
        prev = o_rel
    return prev


def recursive_oracle(
    pre: dict[str, str],
    anchor_where: str,
    anchor_state: dict[str, str],
    step_state: dict[str, str],
    final: dict[str, str],
    step_inputs: list[str] | None = None,
    pre2: dict[str, str] | None = None,
    ewm_steps: list | None = None,
) -> str:
    """General per-symbol recursion oracle for KERNEL-class state machines
    (Heikin-Ashi open chain, McGinley, Super Smoother, Holt-Winter, KAMA,
    VIDYA, ...).

    - ``pre``: window/projection columns computed on the base relation
      (rolling sums, diffs — anything the state update reads);
    - ``pre2``: a second projection layer over ``pre`` (for window
      functions of ``pre`` columns — windows cannot nest);
    - ``anchor_where``: predicate (over base ``b``) selecting each
      symbol's single seed row;
    - ``anchor_state``: state columns at the seed row (exprs over base);
    - ``step_state``: state columns at row t from current row ``b.*`` and
      previous state ``r.*``;
    - ``final``: outputs over the base row joined with its state row.
    """
    from pandas_ta_spark.sources.bars import BARS_FROM_EVENTS_SQL

    pre_sql = ""
    if pre:
        pre_sql = ", " + ", ".join(f"({e}) AS {a}" for a, e in pre.items())
    state_cols = list(anchor_state)
    assert list(step_state) == state_cols, "anchor/step state columns must match"
    # the anchor fixes the recursion's column types: bare literals would
    # type as narrow DECIMALs and overflow on later iterations
    anchor = ", ".join(
        f"CAST(({e}) AS DOUBLE) AS {c}" for c, e in anchor_state.items()
    )
    step = ", ".join(f"({e}) AS {c}" for c, e in step_state.items())
    outs = ", ".join(f"{sql_round(e)} AS \"{a}\"" for a, e in final.items())
    # recursion iterates once per row: keep the per-iteration join slim by
    # projecting only the columns the step actually reads
    slim_cols = ", ".join(["symbol", "_rn"] + (step_inputs or []))
    base_rel = "base"
    extra_ctes: list[str] = []
    if ewm_steps:
        base_rel = _emit_ewm_ctes(ewm_steps, base_rel, extra_ctes, tag="w")
    if pre2:
        cols2 = ", ".join(f"({e}) AS {a}" for a, e in pre2.items())
        extra_ctes.append(
            f"base2 AS MATERIALIZED (SELECT *, {cols2} FROM {base_rel})"
        )
        base_rel = "base2"
    extra = ("".join(c + ",\n" for c in extra_ctes))
    return f"""WITH RECURSIVE bars AS MATERIALIZED (
{BARS_FROM_EVENTS_SQL}
),
base AS MATERIALIZED (SELECT *{pre_sql}, row_number() OVER ({SQL_W_ORDER}) AS _rn FROM bars),
{extra}slim AS MATERIALIZED (SELECT {slim_cols} FROM {base_rel}),
r AS (
    SELECT b.symbol, b._rn, {anchor} FROM {base_rel} b WHERE {anchor_where}
    UNION ALL
    SELECT b.symbol, b._rn, {step}
    FROM slim b JOIN r ON b.symbol = r.symbol AND b._rn = r._rn + 1
)
SELECT b.symbol, b.ts, {outs}
FROM {base_rel} b LEFT JOIN r USING (symbol, _rn)"""


def sql_ewm_simple(out: str, src_sql: str, alpha: float, seed_n: int) -> str:
    """Oracle for a single SMA-seeded smoother of a bar column (ema/rma)."""
    return ewm_pipeline_sql(
        [EwmStage("_ewm0", src_sql, alpha, seed_n)],
        {out: "_ewm0"},
    )
