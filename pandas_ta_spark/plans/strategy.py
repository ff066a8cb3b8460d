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

import weakref

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

import re

from pandas_ta_spark.functions.windows import SYMBOL, TS
from pandas_ta_spark.operators.base import Indicator
from pandas_ta_spark.plans.kernels import run_kernels

# Per-symbol row count above which apply_strategy auto-routes the
# chunk-safe indicators through the row-chunked path (VERDICT r12 ask
# #4: the 14x hot-symbol skew blowup was opt-in-mitigated only). Above
# ~1M rows one symbol's WindowExec partition is a single external-sorted
# task — minutes of serialized work per window chain at 100 TB — while
# row-chunking turns it into (rows / chunk) parallel tasks with a
# lookback carry, bit-identical outputs.
AUTO_CHUNK_ROWS = 1_000_000

# routing decisions memoized per DataFrame OBJECT (bench reps and
# resident engines re-apply strategies to the same cached frame; the
# groupBy count that sizes the hottest symbol then runs once, not per
# call). Keyed weakly: dropping the frame drops the entry.
_HOT_ROWS_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


# below this optimizer-estimated input size no symbol can hold
# AUTO_CHUNK_ROWS rows (1M OHLCV rows are >= ~40 MB in any layout), so
# the router skips even the count JOB — zero cost for test-sized and
# headline-sized frames. The estimate comes from plan statistics
# (parquet footers / cache metadata), not a job.
_AUTO_CHUNK_MIN_BYTES = 32 << 20


def _plan_maybe_big(df: DataFrame) -> bool:
    try:
        sz = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        return int(str(sz)) >= _AUTO_CHUNK_MIN_BYTES
    except Exception:  # stats unavailable (connect, exotic plans):
        # route to the plain path rather than paying an eager count JOB
        # at plan-build time for every call (ADVICE r13): a caller on a
        # stats-less frontend who actually has a hot symbol can still
        # opt in via apply_strategy_chunked_rows explicitly.
        return False


def _max_rows_per_symbol(df: DataFrame) -> int:
    try:
        return _HOT_ROWS_CACHE[df]
    except (KeyError, TypeError):
        pass
    if not _plan_maybe_big(df):
        hot = 0  # provably below threshold without running a job
    else:
        row = df.groupBy(SYMBOL).count().agg(F.max("count")).first()
        hot = int(row[0] or 0)
    try:
        _HOT_ROWS_CACHE[df] = hot
    except TypeError:  # unhashable/unweakrefable frame: just don't memo
        pass
    return hot


def _auto_chunk_size(df: DataFrame, hot: int, lb: int) -> int:
    """Row-chunk size for the auto route, sized from cluster parallelism.

    The r13 heuristic ``max(65_536, 32*lb, hot//1024)`` floored at 64k
    rows: a 1.6M-row hot symbol became ~24 chunks — fewer tasks than
    cores, so the routed plan ran 2.70x the uniform bar where the
    opt-in time-chunked path (~1000 chunks) ran 1.63x (VERDICT r13 ask
    #4). Target ~8 tasks per core for the hot symbol so stragglers
    amortize, floored to keep the lookback-carry overhead (lb extra
    rows per chunk) under ~1%, capped at 1M rows so one chunk's
    WindowExec buffer stays executor-sized at any corpus scale."""
    try:
        par = max(1, df.sparkSession.sparkContext.defaultParallelism)
    except Exception:  # connect / no context: a sane mid value
        par = 16
    target = max(1, hot // (8 * par))
    return max(4096, 32 * lb, min(target, 1_048_576))


def split_chunkable(inds: list[Indicator]):
    """Partition a strategy into (lookback, chunk-safe, not-chunk-safe).

    Chunk-safe = the exact predicates ``apply_strategy_chunked``
    enforces: kernels with finite ``carry_rows`` and no ``lead_rows``;
    expression indicators whose SQL-twin-introspected lookback is
    bounded. ``lookback`` is the max depth over the safe set."""
    lb, safe, unsafe = 0, [], []
    for ind in inds:
        if ind.kernel is not None and (
                ind.kernel.carry_rows is None
                or getattr(ind.kernel, "lead_rows", 0)):
            unsafe.append(ind)
            continue
        depth = expression_lookback(ind)
        if depth is None:
            unsafe.append(ind)
            continue
        lb = max(lb, depth, ind.kernel.carry_rows if ind.kernel else 0)
        safe.append(ind)
    return lb, safe, unsafe


def apply_strategy(df: DataFrame, inds: list[Indicator], keep_temps: bool = False,
                   auto_chunk_rows: int | None = AUTO_CHUNK_ROWS,
                   kernel_chunk_rows: int | None = None) -> DataFrame:
    """Append every indicator's output columns in one composite plan.

    Stage maps are merged ACROSS indicators layer by layer (an
    indicator's stage k only references its own stages < k or bar
    columns), so 24 indicators with 2 stages each become 3 projection
    layers, not 48 — fewer Window/Project nodes, one codegen span per
    layer, same single exchange+sort.

    Skew auto-routing (``auto_chunk_rows``, default 1M; pass ``None``
    to pin the single-pass plan): when the hottest symbol holds more
    rows than the threshold (one memoized count-by-symbol job), the
    chunk-safe indicators run through ``apply_strategy_chunked_rows``
    — bit-identical outputs, hot partition split into parallel
    (symbol, chunk) tasks — and the rest (EWM/cumulative: genuinely
    sequential per symbol) append on top via the plain path. Removes
    the measured 14x hot-symbol trap without the caller asking."""
    if (auto_chunk_rows and not keep_temps and len(inds) > 0
            and not df.isStreaming):
        # size gate FIRST: split_chunkable regex-introspects every
        # indicator's SQL twin (~153 long strings for the all-ind
        # strategy) — running it before the cheap stats/memoized-count
        # gate added ~10% to every all-ind plan build (r13 bench find).
        # Streaming frames skip routing entirely (a count job can't run
        # on an unstarted stream); NOTE the router may run one
        # groupBy(symbol).count() job at plan-BUILD time on large batch
        # frames — pass auto_chunk_rows=None to keep plan build lazy.
        hot = _max_rows_per_symbol(df)
        from pandas_ta_spark.plans.kernels import CHUNK_ROWS as _KCHUNK

        if 0 < hot < _KCHUNK and kernel_chunk_rows is None:
            # the router's (memoized) count proves every symbol group is
            # epoch-sized: pin the kernel pass to whole-group execution,
            # skipping _run_chunked's groupBy(symbol, epoch) layer (one
            # Exchange + one row_number window) that the stats-only gate
            # would conservatively keep
            kernel_chunk_rows = 0
        if hot > auto_chunk_rows:
            lb, safe, unsafe = split_chunkable(inds)
            if safe:
                chunk_rows = _auto_chunk_size(df, hot, lb)
                out = apply_strategy_chunked_rows(df, safe, lb, chunk_rows)
                if unsafe:
                    # the non-chunkable half runs on the NARROW original
                    # frame and joins back on the (symbol, ts) key —
                    # stacking it on the chunked output instead re-ran
                    # the chunked subtree inside its exchange and
                    # shuffled every chunked column through the kernel
                    # pass (measured 30.7s vs 24s plain on the skew
                    # bench; the join shape runs the two independent
                    # stage trees concurrently). Exactness assumes
                    # (symbol, ts) uniquely keys rows AND is non-NULL —
                    # the same assumption every per-symbol window here
                    # makes (an inner join on a NULL key would silently
                    # drop the row the plain path keeps).
                    unsafe_outs = {c for i in unsafe for c in i.outputs}
                    drop_cols = [c for c in df.columns
                                 if c not in (SYMBOL, TS)
                                 and c not in unsafe_outs]
                    add = apply_strategy(df, unsafe, auto_chunk_rows=None)
                    out = out.join(add.drop(*drop_cols), [SYMBOL, TS])
                    # restore plain-path column order (ADVICE r13: the
                    # join shape appended unsafe outputs last regardless
                    # of indicator order). The plain path appends
                    # expression finals in indicator order and THEN the
                    # kernel outputs (run_kernels goes last), so mirror
                    # that two-pass order, not flat indicator order.
                    want = list(df.columns)
                    for i in inds:
                        want += [c for c in i.final if c not in want]
                    for i in inds:
                        if i.kernel is not None:
                            want += [c for c in i.kernel.outputs
                                     if c not in want]
                    ordered, seen_c = [], set()
                    for c in want + out.columns:
                        if c in out.columns and c not in seen_c:
                            seen_c.add(c)
                            ordered.append(c)
                    # backtick-quote: bare-string select parses dotted
                    # output names (CCI_14_0.015, BBL_5_2.0) as struct
                    # field access
                    out = out.select(
                        *[F.col(f"`{c}`") for c in ordered])
                return out
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
        df = run_kernels(df, kernels, kernel_chunk_rows)
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
    _reject_unchunkable(inds, lookback)
    if any(i.kernel is not None and getattr(i.kernel, "pos_dependent", False)
           for i in inds):
        # position-dependent kernels (OLS family) need the global rank
        # to keep chunked x bit-identical to the whole-group x; only
        # pay the rank subtree when such a kernel is present
        from pandas_ta_spark.plans.kernels import global_rn0

        df = global_rn0(df, out="_pts_rn0")
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
    return _salt_apply_unsalt(u, inds)


def _salt_apply_unsalt(u: DataFrame, inds: list[Indicator]) -> DataFrame:
    """Shared tail of the chunked paths: salt symbol with the chunk id,
    run the normal one-plan strategy over the salted key (auto-routing
    off — the groups are chunk-bounded by construction), drop carries."""
    salted = u.withColumn("_sym", F.col(SYMBOL)).withColumn(
        SYMBOL, F.concat_ws("#", SYMBOL, F.col("_chk").cast("string"))
    )
    # kernel_chunk_rows=0: the salted (symbol, chunk) groups are
    # chunk-bounded by construction, so the kernel pass must not stack
    # its own epoch-chunk layer (an extra Exchange) on top
    out = apply_strategy(salted, inds, auto_chunk_rows=None,
                         kernel_chunk_rows=0)
    out = (
        out.filter(F.col("_carry") == 0)
        .withColumn(SYMBOL, F.col("_sym"))
        .drop("_sym", "_chk", "_carry")
    )
    # the global rank (kept for position-dependent kernels) is plumbing,
    # not output
    return out.drop("_pts_rn0") if "_pts_rn0" in out.columns else out


def _reject_unchunkable(inds: list[Indicator], lookback: int) -> None:
    """The chunked-exactness contract, both halves (ADVICE r6).

    Bounded-lookback kernels (finite ``carry_rows <= lookback``, no
    forward-looking rows) chunk exactly like window expressions: the
    carry replicas are precisely the history their declared carry
    needs. Unbounded (EWM, carry_rows=None), deeper-than-lookback, or
    lead-consuming kernels would silently reseed per chunk — reject.
    Expression indicators are depth-checked via ``expression_lookback``
    (SQL-twin introspection): a window deeper than the lookback —
    sma(50) under lookback=30 — used to be ACCEPTED and silently
    diverge; cumulative/position-dependent expressions (CUM,
    row_number, lead) raise instead of silently diverging."""
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


def apply_strategy_chunked_rows(
    df: DataFrame,
    inds: list[Indicator],
    lookback: int,
    chunk_rows: int = 262_144,
) -> DataFrame:
    """``apply_strategy_chunked`` with ROW-count chunks instead of time
    chunks — the auto-routing backend (see ``apply_strategy``).

    Time chunks need a validation aggregation to promise every
    non-empty chunk holds >= lookback rows (sparse symbols can land an
    undersized chunk and truncate a frame). Row chunks make that
    guarantee BY CONSTRUCTION: chunk k of a symbol is rows
    [k*chunk_rows, (k+1)*chunk_rows) of its ts-ordered sequence, so
    every non-last chunk has exactly ``chunk_rows >= lookback`` rows
    and the trailing-``lookback`` carry always fills its successor's
    frames — bit-identical to the unchunked plan, count-free.

    Plan shape: one bucket-parallel rank (plans/kernels.global_rn0 —
    r15: the previous single-window row_number buffered the WHOLE hot
    symbol in one sort task, a ~7s straggler that made this path 2x
    the time-chunked one on the 1.6M-row skew bench), a broadcast
    anti-filter is unnecessary (carries to a chunk beyond the symbol's
    last row can't exist: the filter keeps only tails whose successor
    chunk index exists among the base rows), then the shared
    salt/apply/unsalt tail. Determinism note: like every per-symbol
    window in this engine, exactness assumes (symbol, ts) uniquely
    orders rows."""
    if chunk_rows < max(lookback, 1):
        raise ValueError(
            f"chunk_rows={chunk_rows} < lookback={lookback}: non-last "
            "chunks could not carry enough history")
    _reject_unchunkable(inds, lookback)
    # single-subtree chunk assignment: each row EXPLODES into its own
    # chunk entry plus (when it sits in the trailing-lookback positions)
    # a carry entry for chunk k+1 — no union, so the rank subtree
    # evaluates ONCE per action (the union/succ-map shape re-ran the
    # per-symbol sort 3x: measured 9.3s -> 6.5s on the 1.6M-row skew
    # bench). Carries past a symbol's last chunk land in phantom
    # (symbol, chunk) groups holding only carry rows — computed over
    # <= lookback rows and fully dropped by the _carry filter, which is
    # cheaper than the broadcast successor map that suppressed them.
    from pandas_ta_spark.plans.kernels import global_rn0

    # the rank stays aboard as _pts_rn0: position-dependent kernels (the
    # OLS family, KernelSpec.pos_dependent) read it inside the salted
    # pass so their x positions stay GLOBAL — without it each
    # (symbol, chunk) group reseeds x at 1 and the fit differs from the
    # plain path at the last ulp (caught by
    # tests/test_r15_rank_and_router.py)
    base = global_rn0(df, out="_pts_rn0")
    chk = F.floor(F.col("_pts_rn0") / F.lit(chunk_rows)).cast("long")
    pos = F.col("_pts_rn0") % F.lit(chunk_rows)
    pairs = F.array(
        F.struct(chk.alias("_chk"), F.lit(0).alias("_carry")),
        F.when(pos >= F.lit(chunk_rows - lookback),
               F.struct((chk + F.lit(1)).alias("_chk"),
                        F.lit(1).alias("_carry"))),
    )
    u = (
        base.select("*", F.explode(
            F.filter(pairs, lambda x: x.isNotNull())).alias("_pc"))
        .withColumn("_chk", F.col("_pc._chk"))
        .withColumn("_carry", F.col("_pc._carry"))
        .drop("_pc")
    )
    return _salt_apply_unsalt(u, inds)
