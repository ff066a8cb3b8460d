"""Strategy planner: many indicators -> ONE plan.

The reference's ``df.ta.strategy(...)`` (``pandas_ta/core.py#strategy``)
loops over indicators, optionally fanning out with multiprocessing and
pickling the whole DataFrame per task. Here a strategy is declarative
composition (SURVEY.md §3.3):

- every KERNEL/EWM indicator's pandas kernel is batched into a SINGLE
  ``groupBy("symbol").applyInPandas`` pass (one shuffle + one Arrow
  round-trip regardless of kernel count);
- every window-expressible indicator contributes Column expressions over
  the shared ``Window.partitionBy("symbol").orderBy("ts")`` spec, which
  Catalyst collapses into one WindowExec chain after one exchange + one
  sort (SURVEY.md §4.2).

Net: a 50-indicator strategy costs the same shuffles as one indicator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import re

from pandas_ta_spark.functions.windows import SYMBOL, TS
from pandas_ta_spark.operators.base import Indicator
from pandas_ta_spark.plans.kernels import run_kernels


def apply_strategy(df: DataFrame, inds: list[Indicator], keep_temps: bool = False) -> DataFrame:
    """Append every indicator's output columns in one composite plan.

    Stage maps are merged ACROSS indicators layer by layer (an
    indicator's stage k only references its own stages < k or bar
    columns), so 24 indicators with 2 stages each become 3 projection
    layers, not 48 — fewer Window/Project nodes, one codegen span per
    layer, same single exchange+sort."""
    temps: list[str] = []
    seen: dict[str, str] = {}  # temp name -> expression repr
    max_stages = max((len(i.stages) for i in inds), default=0)
    for k in range(max_stages):
        layer: dict = {}
        for ind in inds:
            if len(ind.stages) > k:
                for tname, expr in ind.stages[k].items():
                    # same kind twice with different params must not
                    # silently overwrite a shared temp (the layer merge
                    # would compute BOTH outputs from the second
                    # expression); identical redefinitions dedupe
                    r = str(expr)
                    if seen.setdefault(tname, r) != r:
                        raise ValueError(
                            f"strategy temp column '{tname}' redefined "
                            f"with a different expression by {ind.key} — "
                            "parameterize the temp name (see hma's "
                            "_hma_{length}_raw convention)")
                    layer[tname] = expr
        if layer:
            df = df.withColumns(layer)
            temps.extend(c for c in layer if c not in temps)
    finals: dict = {}
    for ind in inds:
        finals.update(ind.final)
    if finals:
        df = df.withColumns(finals)
    if temps and not keep_temps:
        df = df.drop(*temps)
    # kernels LAST: groupBy(symbol).applyInPandas's ClusteredDistribution
    # is satisfied by the window stage's hash(symbol) partitioning, saving
    # one full shuffle (kernel-first would re-exchange for the windows —
    # measured 3 vs 2 Exchange nodes). No indicator's window stages read
    # kernel outputs, so the reorder is safe.
    kernels = [i.kernel for i in inds if i.kernel is not None]
    if kernels:
        df = run_kernels(df, kernels)
    return df


def _strip_lag_over(s: str) -> str:
    """Remove every ``lag(<args>) OVER (<clause>)`` segment from ``s``,
    matching the argument parens with a balanced scan (regex can't bound
    the nesting depth of generated arithmetic like eom's
    ``lag(((high + low) / 2), 1)``). Malformed/unclosed parens leave the
    segment in place — conservative: the survivor's frameless OVER
    clause then flags the indicator not-chunkable (refusal, never
    silent divergence)."""
    out, i = [], 0
    while True:
        m = re.search(r"\blag\s*\(", s[i:])
        if not m:
            out.append(s[i:])
            return "".join(out)
        start = i + m.start()
        j = i + m.end()  # first char after the opening paren
        depth = 1
        while j < len(s) and depth:
            depth += {"(": 1, ")": -1}.get(s[j], 0)
            j += 1
        tail = re.match(r"\s*OVER\s*\([^()]*\)", s[j:]) if not depth else None
        if tail is None:  # unbalanced or no OVER: keep the text as-is
            out.append(s[i:j])
            i = j
        else:
            out.append(s[i:start])
            i = j + tail.end()


def expression_lookback(ind: Indicator):
    """Max rows of history an expression-path indicator's windows read,
    introspected from its SQL twin (ADVICE r6: the chunked contract must
    be checkable for window-expression indicators, not just kernels).

    The SQL stage/final strings are maintained in lockstep with the
    Spark Column expressions (the repo's oracle contract), so the depths
    parsed here — `N PRECEDING` frames and `lag(x, N)` offsets — are the
    Spark plan's depths. Returns:

    - an int: bounded — exact under chunking iff <= lookback;
    - ``None``: NOT chunk-safe — the expressions are position-dependent
      or unbounded (`UNBOUNDED PRECEDING`, `row_number`/`rank`, or any
      `lead`): their values change when the partition is split, so
      chunked output would silently diverge from the unchunked plan.

    Kernel-only indicators return 0 (their history lives in the kernel's
    ``carry_rows``, checked separately): when the indicator has NO Spark
    expression stages, its SQL strings exist purely as the DuckDB oracle
    twin and never execute on Spark — an oracle that happens to use a
    positional trick (aroon's reversed ``list_position`` argmax renders
    as ``row_number``) must not veto chunking of a kernel whose finite
    ``carry_rows`` already passed the kernel check (found while building
    the r11 skew bench: aroon is a carry_rows=14 kernel yet was
    rejected on its oracle's shape).
    """
    if ind.kernel is not None and not ind.stages and not ind.final:
        return 0  # kernel-only execution: SQL twin is oracle-only
    parts: list[str] = []
    for st in ind.sql_stages or []:
        parts.extend(st.values())
    if ind.sql_final:
        parts.extend(ind.sql_final.values())
    if not parts:
        return None  # expression stages with no SQL twin: unknowable
    s = " ".join(parts)
    if ("UNBOUNDED PRECEDING" in s or re.search(r"\brow_number\s*\(", s)
            or re.search(r"\brank\s*\(", s) or re.search(r"\blead\s*\(", s)
            # position-dependent regardless of frame (ADVICE r7: \brank\(
            # can't match after an underscore, so these need own tokens)
            or re.search(r"\b(percent_rank|dense_rank|ntile|cume_dist)\s*\(", s)):
        return None
    # Implicit-frame running aggregates (ADVICE r7): `sum(x) OVER
    # (PARTITION BY s ORDER BY ts)` defaults to RANGE UNBOUNDED
    # PRECEDING without the literal text the check above looks for.
    # Strip the frameless-by-design bounded navigation calls
    # (`lag(...) OVER (...)` — depth counted below) with a balanced-
    # paren scan (lag args nest arbitrarily deep in generated SQL —
    # eom's is two levels), then treat ANY remaining ORDER BY
    # OVER-clause lacking an explicit ROWS frame as unbounded.
    stripped = _strip_lag_over(s)
    for m in re.finditer(r"OVER\s*\(([^()]*)\)", stripped):
        clause = m.group(1).upper()
        if "ORDER BY" in clause and "ROWS" not in clause:
            return None
    # Depths COMPOSE across stages: stage k's windows read stage k-1's
    # temps, so a row of stage-k output needs (stage-k depth) rows of
    # stage k-1, each of which needs (stage k-1 depth) rows of input —
    # hma(16) = wroll(close,16) then wroll(tmp,4) truly needs 15+3 rows,
    # not max(15,3). Summing per-stage maxima is the exact bound for a
    # linear stage chain and a safe over-estimate when a later stage
    # reads bar columns directly.
    def _depth_of(exprs) -> int:
        t = " ".join(exprs)
        d = 0
        for m in re.finditer(r"(\d+)\s+PRECEDING", t):
            d = max(d, int(m.group(1)))
        # lag offsets: sql_shift/sql_wroll always emit `lag(<expr>, N)
        # OVER`; match the offset right before `) OVER` so nested parens
        # in <expr> don't confuse the scan. A bare `lag(x) OVER`
        # (offset 1) never occurs in generated SQL but costs nothing.
        if re.search(r"\blag\s*\(", t):
            d = max(d, 1)
        for m in re.finditer(r",\s*(\d+)\s*\)\s*OVER", t):
            d = max(d, int(m.group(1)))
        return d

    depth = sum(_depth_of(st.values()) for st in ind.sql_stages or [])
    if ind.sql_final:
        depth += _depth_of(ind.sql_final.values())
    return depth


def apply_strategy_chunked(
    df: DataFrame,
    inds: list[Indicator],
    lookback: int,
    chunk: str = "30 days",
    validate: bool = False,
) -> DataFrame:
    """``apply_strategy`` for per-symbol series too long for one window
    partition — the expression-path twin of ``plans/kernels.py``'s
    epoch-chunked execution (which covers the Arrow kernel pass only).

    WindowExec buffers an entire (symbol) partition; a multi-year tick
    series for one instrument can exceed executor memory. This splits
    each symbol into time chunks, REPLICATES the trailing ``lookback``
    rows of every chunk into its successor (the carry), computes the
    strategy per (symbol, chunk) sub-series — bounded buffering — and
    drops the carry copies. Results are EXACTLY the unchunked ones
    because every retained row sees >= lookback rows of true history in
    its frame, provided:

    - every indicator is bounded-lookback: ROLL/WROLL/lag window ops
      with max window/shift <= lookback, or kernels whose declared
      ``carry_rows`` fits inside ``lookback`` (their carry replicas ARE
      exactly the history the kernel needs). BOTH halves of the
      contract are now ENFORCED (ADVICE r6): EWM/unbounded/too-deep
      kernels are rejected via ``carry_rows``/``lead_rows``, and
      expression indicators are depth-checked via
      ``expression_lookback`` (SQL-twin introspection) — deeper-than-
      lookback windows, cumulative/position-dependent expressions
      (CUM, row_number, lead) all raise instead of silently diverging
      (CUM ops are O(1)-state anyway: run them unchunked);
    - every NON-EMPTY chunk holds >= lookback rows per symbol (set
      ``validate=True`` to enforce with one cheap extra aggregation —
      default off to keep the plan count-free). Carries jump to the next
      non-empty chunk, so empty chunks (trading halts, holidays) are
      exact for free; only an undersized non-empty chunk can truncate a
      frame the unchunked plan would fill.

    Plan shape: ONE extra bounded window pass (row_number per
    (symbol, chunk), buffer = chunk size) to pick the carry rows, a
    broadcast join against the tiny (symbol, chunk) successor map, one
    union, then the normal strategy over the salted symbol — the same
    shuffles as ``apply_strategy``, each partition now chunk-sized.
    """
    # bounded-lookback kernels (finite carry_rows <= lookback, no
    # forward-looking rows) chunk exactly like window expressions: the
    # carry replicas are precisely the history their declared carry
    # needs. Unbounded (EWM, carry_rows=None), deeper-than-lookback, or
    # lead-consuming kernels would silently reseed per chunk — reject.
    bad = [
        i for i in inds
        if i.kernel is not None and (
            i.kernel.carry_rows is None
            or i.kernel.carry_rows > lookback
            or getattr(i.kernel, "lead_rows", 0)
        )
    ]
    if bad:
        raise ValueError(
            "apply_strategy_chunked requires bounded-lookback indicators "
            "(window exprs or kernels with carry_rows <= lookback and no "
            "lead_rows); EWM/unbounded kernels have their own chunking "
            f"(plans/kernels.py): {[i.outputs for i in bad]}"
        )
    # expression-path depth check (ADVICE r6): a window-expression
    # indicator deeper than the lookback — sma(50) under lookback=30 —
    # used to be ACCEPTED and silently diverge; introspect each
    # indicator's SQL-twin depth (kept in lockstep with the Spark
    # expressions) and enforce the same contract the kernels get.
    too_deep = []
    unbounded = []
    for i in inds:
        d = expression_lookback(i)
        if d is None:
            unbounded.append(i)
        elif d > lookback:
            too_deep.append((i, d))
    if unbounded:
        raise ValueError(
            "apply_strategy_chunked cannot chunk position-dependent or "
            "unbounded expression indicators (cumulative windows, "
            "row_number/rank, lead): their values change when the "
            "partition is split, so chunked output would silently "
            "diverge from the unchunked plan: "
            f"{[i.outputs for i in unbounded]}"
        )
    if too_deep:
        raise ValueError(
            "expression indicator(s) read more history than "
            f"lookback={lookback} — retained rows near chunk starts "
            "would see truncated frames and silently diverge from the "
            "unchunked plan: "
            f"{[(i.outputs, d) for i, d in too_deep]}. "
            "Raise lookback to at least the max depth."
        )
    # .cast: parquet TIMESTAMP_NTZ inputs — unix_micros wants TIMESTAMP
    us = F.unix_micros(F.col(TS).cast("timestamp"))
    # parse "N days"/"N hours" without relying on engine interval math
    qty, unit = chunk.split()
    per = {"day": 86_400_000_000, "days": 86_400_000_000,
           "hour": 3_600_000_000, "hours": 3_600_000_000}[unit]
    chunk_us = int(qty) * per
    base = df.withColumn("_chk", F.floor(us / F.lit(chunk_us)).cast("long"))
    # successor map: carries target the next chunk that actually has
    # rows, so a symbol dark for whole chunks still hands its history
    # across the gap (chunk c+1 empty -> c's tail lands in c+2). Tiny
    # relation (symbols x chunks), broadcast.
    wnext = Window.partitionBy(SYMBOL).orderBy("_chk")
    succ = (
        base.select(SYMBOL, "_chk").distinct()
        .withColumn("_next", F.lead("_chk").over(wnext))
        .filter(F.col("_next").isNotNull())
    )
    if validate:
        counts = (
            base.groupBy(SYMBOL, "_chk").count()
            .withColumn("_last", F.lead("_chk").over(wnext).isNull())
            .filter(~F.col("_last") & (F.col("count") < lookback))
        )
        offenders = counts.limit(5).collect()
        if offenders:
            raise ValueError(
                f"chunk(s) with < lookback={lookback} rows would truncate "
                f"frames vs the unchunked plan: "
                f"{[(r[SYMBOL], r['_chk'], r['count']) for r in offenders]}"
            )
    wdesc = Window.partitionBy(SYMBOL, "_chk").orderBy(F.col(TS).desc())
    carry = (
        base.withColumn("_rnd", F.row_number().over(wdesc))
        .filter(F.col("_rnd") <= lookback)
        .drop("_rnd")
        .join(F.broadcast(succ), [SYMBOL, "_chk"])
        .withColumn("_chk", F.col("_next"))
        .drop("_next")
        .withColumn("_carry", F.lit(1))
    )
    u = base.withColumn("_carry", F.lit(0)).unionByName(carry)
    salted = u.withColumn("_sym", F.col(SYMBOL)).withColumn(
        SYMBOL, F.concat_ws("#", SYMBOL, F.col("_chk").cast("string"))
    )
    out = apply_strategy(salted, inds)
    return (
        out.filter(F.col("_carry") == 0)
        .withColumn(SYMBOL, F.col("_sym"))
        .drop("_sym", "_chk", "_carry")
    )
