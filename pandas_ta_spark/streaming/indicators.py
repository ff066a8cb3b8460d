"""Structured Streaming variants (SURVEY.md §2.10 extension path).

The reference is batch-only; these are the streaming extension: ordered
windows don't exist in Structured Streaming, so

- bars derive from event streams via watermarked tumbling windows
  (``F.window`` + event-time watermark for late data);
- stateful indicators (the EWM/KERNEL class) run per symbol via
  ``applyInPandasWithState``: each micro-batch updates the carried
  recursion state (seed buffer + last smoothed value), emitting exactly
  the batch engine's SMA-seeded semantics (functions/pdkernels.py).

At scale state is per-symbol (bounded), shuffles hash on symbol, and
late events beyond the watermark are dropped deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pandas_ta_spark.operators.base import py_round, seed_mean

# bound ONCE at module scope: _lnq runs ~window-length times per
# arriving row in every twin — per-call `import math` + attribute
# lookups were the exact cost the old _make_quant closure avoided
import math as _math

_floor, _log, _isfinite = _math.floor, _math.log, _math.isfinite


def _one_chunk(pdfs):
    """applyInPandasWithState hands a group over as MULTIPLE arrow chunks
    in shuffle order (chunk size ~ spark.sql.execution.arrow.
    maxRecordsPerBatch); the state folds below are order-sensitive, so
    concat to ONE frame first — the body's own sort_values then orders
    the whole micro-batch, not each chunk independently."""
    import pandas as pd

    chunks = list(pdfs)
    if not chunks:
        return
    yield pd.concat(chunks) if len(chunks) > 1 else chunks[0]


def _ewm_step(alpha: float, x: float, y: float) -> float:
    """pandas ewm(adjust=False) step, BITWISE: hold exactly when the
    running value already equals the input (pandas' constant-series
    guard — the raw recursion a*x + (1-a)*x can drift a last-ulp off x),
    else the plain recursion. Keeps the streaming twins bit-identical
    to the batch kernels (pdkernels.ewm_seeded) and the recursive-CTE
    oracles (ewm_sql) on constant stretches. SMA seeds use the shared
    association-free quantized form (base.seed_mean) on all paths."""
    return y if y == x else alpha * x + (1 - alpha) * y


def stream_bars(events: DataFrame, anchor: str = "1 hour",
                watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window OHLCV bars from an event stream —
    the streaming twin of sources/bars.py::bars_from_events."""
    ev = events.withWatermark("ts", watermark)
    return (
        ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.window("ts", anchor).alias("w"),
        )
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count(F.lit(1)).cast("double").alias("volume"),
        )
        .select("symbol", F.col("w.start").alias("ts"),
                "open", "high", "low", "close", "volume")
    )


EMA_OUT_SCHEMA = StructType([
    StructField("symbol", StringType()),
    StructField("ts", TimestampType()),
    StructField("close", DoubleType()),
    StructField("ema", DoubleType()),
])

# carried recursion state: seed buffer (csv of pending values) + last ema
EMA_STATE_SCHEMA = StructType([
    StructField("pending", StringType()),
    StructField("last_ema", DoubleType()),
])


def streaming_ema(ticks: DataFrame, length: int = 10,
                  watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming EMA per symbol (applyInPandasWithState).

    Exact batch parity: NULL until ``length`` values arrive, then the
    SMA seed, then the alpha recursion — state carries the seed buffer
    and last smoothed value across micro-batches."""
    alpha = 2.0 / (length + 1)

    def update(key, pdfs, state):
        import math

        import pandas as pd

        if state.exists:
            pending_s, last = state.get
            pending = [float(x) for x in pending_s.split(",") if x != ""]
            if last is not None and math.isnan(last):
                last = None  # NaN encodes "still seeding" in the state row
        else:
            pending, last = [], None
        for pdf in _one_chunk(pdfs):
            pdf = pdf.sort_values("ts")
            out_ts, out_close, out_ema = [], [], []
            for ts, close in zip(pdf["ts"], pdf["close"]):
                if last is None:
                    pending.append(float(close))
                    if len(pending) >= length:
                        last = seed_mean(pending)
                        val = last
                    else:
                        val = None
                else:
                    last = _ewm_step(alpha, float(close), last)
                    val = last
                out_ts.append(ts)
                out_close.append(float(close))
                out_ema.append(val)
            yield pd.DataFrame({
                "symbol": key[0], "ts": out_ts,
                "close": out_close, "ema": out_ema,
            })
        state.update((",".join(str(x) for x in pending[:length]),
                      last if last is not None else float("nan")))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=EMA_OUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


RSI_OUT_SCHEMA = StructType([
    StructField("symbol", StringType()),
    StructField("ts", TimestampType()),
    StructField("close", DoubleType()),
    StructField("rsi", DoubleType()),
])

# carried: last close, pending gain/loss seed buffers, both RMA values
RSI_STATE_SCHEMA = StructType([
    StructField("last_close", DoubleType()),
    StructField("pending_g", StringType()),
    StructField("pending_l", StringType()),
    StructField("pg", DoubleType()),
    StructField("pl", DoubleType()),
])


def streaming_rsi(ticks: DataFrame, length: int = 14,
                  watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming RSI per symbol: the two Wilder RMA recursions
    carried across micro-batches, exact batch-kernel parity
    (momentum.rsi semantics)."""
    alpha = 1.0 / length

    def update(key, pdfs, state):
        import math

        import pandas as pd

        def parse(s):
            return [float(x) for x in s.split(",") if x != ""]

        if state.exists:
            last_close, pg_s, pl_s, pg, pl = state.get
            gains, losses = parse(pg_s), parse(pl_s)
            if pg is not None and math.isnan(pg):
                pg = pl = None
        else:
            last_close, gains, losses, pg, pl = None, [], [], None, None
        for pdf in _one_chunk(pdfs):
            pdf = pdf.sort_values("ts")
            out_ts, out_close, out_rsi = [], [], []
            for ts, close in zip(pdf["ts"], pdf["close"]):
                close = float(close)
                val = None
                if last_close is not None:
                    d = close - last_close
                    g, l = max(d, 0.0), max(-d, 0.0)
                    if pg is None:
                        gains.append(g)
                        losses.append(l)
                        if len(gains) >= length:
                            pg = seed_mean(gains)
                            pl = seed_mean(losses)
                    else:
                        pg = _ewm_step(alpha, g, pg)
                        pl = _ewm_step(alpha, l, pl)
                    if pg is not None and (pg + pl):
                        val = 100.0 * pg / (pg + pl)
                last_close = close
                out_ts.append(ts)
                out_close.append(close)
                out_rsi.append(val)
            yield pd.DataFrame({
                "symbol": key[0], "ts": out_ts,
                "close": out_close, "rsi": out_rsi,
            })
        state.update((
            last_close,
            ",".join(str(x) for x in gains[:length]),
            ",".join(str(x) for x in losses[:length]),
            pg if pg is not None else float("nan"),
            pl if pl is not None else float("nan"),
        ))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=RSI_OUT_SCHEMA,
        stateStructType=RSI_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


ST_OUT_SCHEMA = StructType([
    StructField("symbol", StringType()),
    StructField("ts", TimestampType()),
    StructField("close", DoubleType()),
    StructField("supert", DoubleType()),
    StructField("supertd", DoubleType()),
    StructField("supertl", DoubleType()),
    StructField("superts", DoubleType()),
])

# carried: last close (TR), TR seed buffer, Wilder ATR, final bands, dir
ST_STATE_SCHEMA = StructType([
    StructField("last_close", DoubleType()),
    StructField("pending_tr", StringType()),
    StructField("atr", DoubleType()),
    StructField("prev_fub", DoubleType()),
    StructField("prev_flb", DoubleType()),
    StructField("direction", DoubleType()),
])


def streaming_supertrend(ticks: DataFrame, length: int = 7,
                         multiplier: float = 3.0,
                         watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming SuperTrend per symbol — the genuinely-sequential
    band/flip state machine (overlap.supertrend's Arrow kernel,
    pandas_ta/overlap/supertrend.py#supertrend) carried across
    micro-batches: state = (last close, TR seed buffer, Wilder ATR, final
    upper/lower bands, direction). Exact batch parity row-for-row."""
    alpha = 1.0 / length

    def update(key, pdfs, state):
        import math

        import pandas as pd

        if state.exists:
            last_close, pend_s, atr, pfub, pflb, dir_ = state.get
            pending = [float(x) for x in pend_s.split(",") if x != ""]
            atr = None if (atr is not None and math.isnan(atr)) else atr
            pfub = None if (pfub is not None and math.isnan(pfub)) else pfub
            pflb = None if (pflb is not None and math.isnan(pflb)) else pflb
        else:
            last_close, pending, atr, pfub, pflb, dir_ = None, [], None, None, None, 1.0
        for pdf in _one_chunk(pdfs):
            pdf = pdf.sort_values("ts")
            rows = {k: [] for k in ("ts", "close", "supert", "supertd",
                                    "supertl", "superts")}
            for ts, h, l, c in zip(pdf["ts"], pdf["high"], pdf["low"], pdf["close"]):
                h, l, c = float(h), float(l), float(c)
                trend = d_out = long_ = short = None
                if last_close is not None:
                    tr = max(h - l, abs(h - last_close), abs(l - last_close))
                    if atr is None:
                        pending.append(tr)
                        if len(pending) >= length:
                            atr = seed_mean(pending)
                    else:
                        atr = _ewm_step(alpha, tr, atr)
                if atr is not None:
                    hl2 = (h + l) / 2
                    ub = hl2 + multiplier * atr
                    lb = hl2 - multiplier * atr
                    if pfub is None:
                        fub, flb = ub, lb  # first valid-ATR row: no output yet
                    else:
                        fub = ub if (ub < pfub or last_close > pfub) else pfub
                        flb = lb if (lb > pflb or last_close < pflb) else pflb
                        if c > pfub:
                            dir_ = 1.0
                        elif c < pflb:
                            dir_ = -1.0
                        d_out = dir_
                        if dir_ == 1.0:
                            trend = long_ = flb
                        else:
                            trend = short = fub
                    pfub, pflb = fub, flb
                last_close = c
                rows["ts"].append(ts)
                rows["close"].append(c)
                rows["supert"].append(trend)
                rows["supertd"].append(d_out)
                rows["supertl"].append(long_)
                rows["superts"].append(short)
            yield pd.DataFrame({"symbol": key[0], **rows})
        nan = float("nan")
        state.update((
            last_close,
            ",".join(repr(x) for x in pending[:length]),
            atr if atr is not None else nan,
            pfub if pfub is not None else nan,
            pflb if pflb is not None else nan,
            dir_,
        ))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=ST_OUT_SCHEMA,
        stateStructType=ST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


ATR_OUT_SCHEMA = StructType([
    StructField("symbol", StringType()),
    StructField("ts", TimestampType()),
    StructField("close", DoubleType()),
    StructField("atr", DoubleType()),
])

# carried: last close (for TR), TR seed buffer, Wilder RMA value
ATR_STATE_SCHEMA = StructType([
    StructField("last_close", DoubleType()),
    StructField("pending_tr", StringType()),
    StructField("atr", DoubleType()),
])


def streaming_atr(ticks: DataFrame, length: int = 14,
                  watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming ATR per symbol: Wilder RMA of the true range
    carried across micro-batches, exact batch parity with
    volatility.atr (TR is NULL on the first row, so the SMA seed covers
    TR rows 2..length+1 and the first ATR lands on row length+1)."""
    alpha = 1.0 / length

    def update(key, pdfs, state):
        import math

        import pandas as pd

        if state.exists:
            last_close, pend_s, atr = state.get
            pending = [float(x) for x in pend_s.split(",") if x != ""]
            atr = None if (atr is not None and math.isnan(atr)) else atr
        else:
            last_close, pending, atr = None, [], None
        for pdf in _one_chunk(pdfs):
            pdf = pdf.sort_values("ts")
            out_ts, out_close, out_atr = [], [], []
            for ts, h, l, c in zip(pdf["ts"], pdf["high"], pdf["low"], pdf["close"]):
                h, l, c = float(h), float(l), float(c)
                if last_close is not None:
                    tr = max(h - l, abs(h - last_close), abs(l - last_close))
                    if atr is None:
                        pending.append(tr)
                        if len(pending) >= length:
                            atr = seed_mean(pending)
                    else:
                        atr = _ewm_step(alpha, tr, atr)
                last_close = c
                out_ts.append(ts)
                out_close.append(c)
                out_atr.append(atr)
            yield pd.DataFrame({
                "symbol": key[0], "ts": out_ts,
                "close": out_close, "atr": out_atr,
            })
        state.update((
            last_close,
            ",".join(repr(x) for x in pending[:length]),
            atr if atr is not None else float("nan"),
        ))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=ATR_OUT_SCHEMA,
        stateStructType=ATR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


MACD_OUT_SCHEMA = StructType([
    StructField("symbol", StringType()),
    StructField("ts", TimestampType()),
    StructField("close", DoubleType()),
    StructField("macd", DoubleType()),
    StructField("macdh", DoubleType()),
    StructField("macds", DoubleType()),
])

# carried: close seed buffer (shared by fast/slow), both EMAs, the MACD-
# line seed buffer for the signal EMA, and the signal value
MACD_STATE_SCHEMA = StructType([
    StructField("pending_close", StringType()),
    StructField("nseen", DoubleType()),
    StructField("ef", DoubleType()),
    StructField("es", DoubleType()),
    StructField("pending_line", StringType()),
    StructField("sig", DoubleType()),
])


def streaming_macd(ticks: DataFrame, fast: int = 12, slow: int = 26,
                   signal: int = 9, watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming MACD per symbol: three SMA-seeded EMA
    recursions (fast, slow, signal-on-line) carried across micro-batches,
    exact batch parity with momentum.macd. The close seed buffer is
    shared — fast seeds on its first ``fast`` closes, slow on the first
    ``slow``; the signal EMA seeds on the first ``signal`` MACD-line
    values (which begin once slow is seeded)."""
    af, as_, ag = 2.0 / (fast + 1), 2.0 / (slow + 1), 2.0 / (signal + 1)

    def update(key, pdfs, state):
        import math

        import pandas as pd

        def parse(s):
            return [float(x) for x in s.split(",") if x != ""]

        def denan(x):
            return None if (x is not None and math.isnan(x)) else x

        if state.exists:
            pc_s, nseen, ef, es, pl_s, sig = state.get
            closes, lines = parse(pc_s), parse(pl_s)
            nseen = int(nseen)
            ef, es, sig = denan(ef), denan(es), denan(sig)
        else:
            closes, lines, nseen, ef, es, sig = [], [], 0, None, None, None
        for pdf in _one_chunk(pdfs):
            pdf = pdf.sort_values("ts")
            rows = {k: [] for k in ("ts", "close", "macd", "macdh", "macds")}
            for ts, c in zip(pdf["ts"], pdf["close"]):
                c = float(c)
                nseen += 1
                if es is None:
                    closes.append(c)
                if ef is None:
                    if nseen >= fast:
                        ef = seed_mean(closes[:fast])
                else:
                    ef = _ewm_step(af, c, ef)
                if es is None:
                    if nseen >= slow:
                        es = seed_mean(closes[:slow])
                        closes = []
                else:
                    es = _ewm_step(as_, c, es)
                line = hist = None
                if es is not None:
                    line = ef - es
                    if sig is None:
                        lines.append(line)
                        if len(lines) >= signal:
                            sig = seed_mean(lines[:signal])
                    else:
                        sig = _ewm_step(ag, line, sig)
                    if sig is not None:
                        hist = line - sig
                rows["ts"].append(ts)
                rows["close"].append(c)
                rows["macd"].append(line)
                rows["macdh"].append(hist)
                rows["macds"].append(sig if es is not None else None)
            yield pd.DataFrame({"symbol": key[0], **rows})
        nan = float("nan")
        state.update((
            ",".join(repr(x) for x in closes[:slow]),
            float(nseen),
            ef if ef is not None else nan,
            es if es is not None else nan,
            ",".join(repr(x) for x in lines[:signal]),
            sig if sig is not None else nan,
        ))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=MACD_OUT_SCHEMA,
        stateStructType=MACD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


BBANDS_OUT_SCHEMA = StructType([
    StructField("symbol", StringType()),
    StructField("ts", TimestampType()),
    StructField("close", DoubleType()),
    StructField("bbl", DoubleType()),
    StructField("bbm", DoubleType()),
    StructField("bbu", DoubleType()),
])

# carried: ring buffer of the last `length` closes (csv)
BBANDS_STATE_SCHEMA = StructType([
    StructField("buf", StringType()),
])


def streaming_bbands(ticks: DataFrame, length: int = 5, std: float = 2.0,
                     ddof: int = 0, watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming Bollinger Bands per symbol — the ROLLING-WINDOW
    class of indicator as a continuous query (EMA/RSI/ATR cover the
    recursive class; this carries a bounded RING BUFFER of the last
    ``length`` closes instead of a recursion seed). Exact batch-kernel
    parity: NULL until the window fills, then mean ± std·stdev(ddof)
    over exactly the last ``length`` values.

    State per symbol is ``length`` doubles — bounded regardless of
    stream length, hash-sharded on symbol like the other twins."""

    def update(key, pdfs, state):
        import math

        import pandas as pd

        buf = ([float(x) for x in state.get[0].split(",") if x != ""]
               if state.exists else [])
        for pdf in _one_chunk(pdfs):
            pdf = pdf.sort_values("ts")
            rows = {"ts": [], "close": [], "bbl": [], "bbm": [], "bbu": []}
            for ts, close in zip(pdf["ts"], pdf["close"]):
                buf.append(float(close))
                if len(buf) > length:
                    buf.pop(0)
                if len(buf) == length:
                    m = sum(buf) / length
                    var = sum((x - m) ** 2 for x in buf) / (length - ddof)
                    sd = math.sqrt(var)
                    lo, up = m - std * sd, m + std * sd
                else:
                    m = lo = up = None
                rows["ts"].append(ts)
                rows["close"].append(float(close))
                rows["bbl"].append(lo)
                rows["bbm"].append(m)
                rows["bbu"].append(up)
            yield pd.DataFrame({"symbol": key[0], **rows})
        state.update((",".join(repr(x) for x in buf),))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=BBANDS_OUT_SCHEMA,
        stateStructType=BBANDS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


DONCHIAN_OUT_SCHEMA = StructType([
    StructField("symbol", StringType()),
    StructField("ts", TimestampType()),
    StructField("dcl", DoubleType()),
    StructField("dcm", DoubleType()),
    StructField("dcu", DoubleType()),
])

# carried: ring buffers of the last max(lower,upper) highs and lows
DONCHIAN_STATE_SCHEMA = StructType([
    StructField("highs", StringType()),
    StructField("lows", StringType()),
])


def streaming_donchian(ticks: DataFrame, lower_length: int = 20,
                       upper_length: int = 20,
                       watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming Donchian channel per symbol: rolling min/max
    over bounded high/low ring buffers (the order-statistic member of
    the rolling-window state class; `streaming_bbands` covers the
    moment member). Exact batch parity: NULL until both windows fill,
    dcl = min(low, lower_length), dcu = max(high, upper_length),
    dcm = (dcl + dcu) / 2."""
    keep = max(lower_length, upper_length)

    def update(key, pdfs, state):
        import pandas as pd

        def parse(s):
            return [float(x) for x in s.split(",") if x != ""]

        highs, lows = ((parse(state.get[0]), parse(state.get[1]))
                       if state.exists else ([], []))
        for pdf in _one_chunk(pdfs):
            pdf = pdf.sort_values("ts")
            rows = {"ts": [], "dcl": [], "dcm": [], "dcu": []}
            for ts, hi, lo in zip(pdf["ts"], pdf["high"], pdf["low"]):
                highs.append(float(hi))
                lows.append(float(lo))
                if len(highs) > keep:
                    highs.pop(0)
                    lows.pop(0)
                if len(highs) >= keep:
                    dcl = min(lows[-lower_length:])
                    dcu = max(highs[-upper_length:])
                    dcm = 0.5 * (dcl + dcu)
                else:
                    dcl = dcm = dcu = None
                rows["ts"].append(ts)
                rows["dcl"].append(dcl)
                rows["dcm"].append(dcm)
                rows["dcu"].append(dcu)
            yield pd.DataFrame({"symbol": key[0], **rows})
        state.update((",".join(repr(x) for x in highs),
                      ",".join(repr(x) for x in lows)))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=DONCHIAN_OUT_SCHEMA,
        stateStructType=DONCHIAN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# ----------------------------------------------- rolling regime twins ----

def _rolling_regime_twin(ticks: DataFrame, stat_name: str, long_lag: int,
                         pairs_fn, final_fn, watermark: str) -> DataFrame:
    """Shared runner for the rolling-window REGIME statistics
    (ext/relational.py's exact-integer second-moment family) as
    continuous queries: per symbol, a bounded ring buffer of the last
    BETA_N + long_lag closes re-derives the quantized return pairs per
    arriving bar and folds the exact-integer sums (python ints are
    unbounded, matching both batch engines' BIGINT arithmetic).

    Pair validity needs NO extra state: while the buffer is unsaturated
    its index 0 IS the series start, so rows at buffer index < long_lag
    lack one of the lags; once saturated (cap = BETA_N + long_lag) every
    window row has both lags inside the buffer by construction —
    the same rule in both phases.

    ``pairs_fn(buf, s, m) -> iterable[(x, y) | None]`` builds ALL the
    window's quantized pairs in one pass per arriving row (each log
    return computed once, not per neighboring pair); a None entry marks
    a pair invalidated by a non-positive/NaN close — excluded from every
    sum exactly like the batch twins' NULL log returns, instead of
    poisoning the query with a math-domain error persisted in state.
    ``final_fn(n, sx, sy, sxy, sxx, syy) -> float | None`` emits the
    statistic. The window sums are refolded from the buffer each row
    (~BETA_N int ops — deliberate: O(1) incremental add/evict would be
    bit-identical but needs 6 more state fields and eviction-validity
    bookkeeping, and per-row Python work is not the measured bottleneck
    at the ~3k rows/s the Arrow/state plumbing sustains). State = cap
    closes per symbol (CSV string), hash-sharded. Rows WITHIN one
    micro-batch are globally re-ordered by ts before folding; ACROSS
    triggers the buffer appends in arrival order — in-order delivery
    per symbol across triggers is the documented precondition (the
    batch twins order globally and have no such constraint). Matches
    batch up to the 1-ulp python-libm vs JVM ln difference at a
    quantization-floor boundary (parity tests pin 2e-5)."""
    from pandas_ta_spark.ext.relational import BETA_N

    cap = BETA_N + long_lag
    out_schema = StructType([
        StructField("symbol", StringType()),
        StructField("ts", TimestampType()),
        StructField("n_obs", LongType()),
        StructField(stat_name, DoubleType()),
    ])
    state_schema = StructType([StructField("closes", StringType())])

    def update(key, pdfs, state):
        import pandas as pd

        buf = ([float(x) for x in state.get[0].split(",") if x != ""]
               if state.exists else [])
        # ONE global ts sort per micro-batch: a large group arrives as
        # several arrow chunks in shuffle order — per-chunk sorting
        # would append closes to the ring buffer out of order
        pdf = None
        for pdf in _one_chunk(pdfs):  # chunk-order + empty-group guard
            pdf = pdf.sort_values("ts")
        if pdf is None:
            import pandas as _pd

            pdf = _pd.DataFrame({c: [] for c in ("ts", "open", "high",
                                                 "low", "close")})
        rows = {"ts": [], "n_obs": [], stat_name: []}
        for ts, close in zip(pdf["ts"], pdf["close"]):
            buf.append(float(close))
            if len(buf) > cap:
                buf.pop(0)
            m = len(buf)
            n = sx = sy = sxy = sxx = syy = 0
            for p in pairs_fn(buf, max(0, m - BETA_N), m):
                if p is None:  # bad-close pair, excluded like batch NULL
                    continue
                x, y = p
                n += 1
                sx += x
                sy += y
                sxy += x * y
                sxx += x * x
                syy += y * y
            rows["ts"].append(ts)
            rows["n_obs"].append(n)
            rows[stat_name].append(final_fn(n, sx, sy, sxy, sxx, syy))
        yield pd.DataFrame({"symbol": key[0], **rows})
        state.update((",".join(repr(x) for x in buf),))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def _lnq(a: float, b: float, scale: float) -> int | None:
    """THE shared quantized-log-with-validity-guard for every streaming
    twin: floor(ln(a/b)*scale + 0.5), or None unless both sides are
    strictly positive AND FINITE. The finite leg is load-bearing: a
    vendor inf price passes a bare a > 0 check, log(inf) is inf, and
    int(floor(inf)) raises OverflowError — a poison pill that aborts
    the micro-batch and kills the query (the e78ecf5 bad-close class).
    NaN fails a > 0; inf needs isfinite. Single-sourced so a guard
    fix lands in every twin at once (the _toks() lesson); math
    functions are bound once at module scope — this is the per-row
    hot path."""
    if not (a > 0 and b > 0 and _isfinite(a) and _isfinite(b)):
        return None
    r = a / b
    # ratio legs: finite positives can still overflow the division to
    # inf (int(floor(inf)) raises — the poison-pill class) or underflow
    # it to 0 (log(0) raises ValueError); matches _glog/_sql_glog
    if not (r > 0 and _isfinite(r)):
        return None
    return int(_floor(_log(r) * scale + 0.5))


def _make_quant():
    """Quantizer closure over the shared _lnq with BETA_SCALE bound once
    (the pair builder runs ~BETA_N times per arriving row)."""
    from pandas_ta_spark.ext.relational import BETA_SCALE

    def quant(buf, i, lag):
        return _lnq(buf[i], buf[i - lag], BETA_SCALE)

    return quant


def streaming_ret_autocorr(ticks: DataFrame,
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ext/relational.py::ret_autocorr — rolling lag-1
    return autocorrelation as a continuous query (batch parity up to
    the runner's documented 1-ulp ln caveat; pinned across micro-batch
    splits by test_streaming_ret_autocorr_matches_batch)."""
    import math

    from pandas_ta_spark.ext.relational import BETA_N

    q = _make_quant()

    def pairs(buf, s, m):
        # one log per row: q_i for i in [s-1, m) covers both pair sides
        lo = max(1, s - 1)
        qs = {i: q(buf, i, 1) for i in range(lo, m)}
        return [(qs[i], qs[i - 1])
                if qs[i] is not None and qs[i - 1] is not None else None
                for i in range(max(s, 2), m)]

    def final(n, sx, sy, sxy, sxx, syy):
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if n >= BETA_N and vx > 0 and vy > 0:
            return py_round(cov / math.sqrt(float(vx) * float(vy)))
        return None

    return _rolling_regime_twin(ticks, "autocorr", 2, pairs, final,
                                watermark)


def streaming_variance_ratio(ticks: DataFrame,
                             watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ext/relational.py::variance_ratio — the rolling
    Lo-MacKinlay VR(q) regime statistic as a continuous query. Pair =
    (1-bar return, q-bar return) at the same row, so long_lag = VR_Q and
    the buffer caps at BETA_N + VR_Q closes per symbol."""
    import math

    from pandas_ta_spark.ext.relational import BETA_N, VR_Q

    q = _make_quant()

    def pairs(buf, s, m):
        out = []
        for i in range(max(s, VR_Q), m):
            a, b = q(buf, i, 1), q(buf, i, VR_Q)
            out.append((a, b) if a is not None and b is not None else None)
        return out

    def final(n, sx, sy, sxy, sxx, syy):
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if n >= BETA_N and vx > 0:
            return py_round(float(vy) / (VR_Q * float(vx)))
        return None

    return _rolling_regime_twin(ticks, "vr", VR_Q, pairs, final, watermark)


def streaming_drawdown_episodes(ticks: DataFrame,
                                watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ext/relational.py::drawdown_episodes — the live
    time-under-water monitor. O(1) STATE per symbol (running close high,
    highs-seen counter, open-episode accumulators — no buffer at all):
    an underwater bar extends the open episode; a recovery bar (close >=
    running high) EMITS the closed episode row and resets.

    Emission contract (append mode): episodes emit when they CLOSE. The
    batch op additionally reports a still-open final episode; here that
    tail lives in state until its recovery arrives — the parity test
    compares against batch episodes that closed before end-of-stream.
    Episode ids match the batch sessionization exactly: the id is the
    count of high bars seen before the episode opened (first bar is a
    high by construction, so ids start at 1)."""
    out_schema = StructType([
        StructField("symbol", StringType()),
        StructField("episode", LongType()),
        StructField("start_ts", TimestampType()),
        StructField("end_ts", TimestampType()),
        StructField("n_bars", LongType()),
        StructField("max_dd", DoubleType()),
    ])
    # mx, highs_seen, open-episode (start/end ns, n_bars, deepest dd)
    state_schema = StructType([
        StructField("mx", DoubleType()),
        StructField("highs", LongType()),
        StructField("start_ns", LongType()),
        StructField("end_ns", LongType()),
        StructField("n_bars", LongType()),
        StructField("max_dd", DoubleType()),
    ])

    def update(key, pdfs, state):
        import math

        import pandas as pd

        if state.exists:
            mx, highs, start_ns, end_ns, n_bars, max_dd = state.get
            if mx is not None and math.isnan(mx):  # pre-first-bar sentinel
                mx = None
        else:
            mx, highs, start_ns, end_ns, n_bars, max_dd = (
                None, 0, 0, 0, 0, 0.0)
        pdf = None
        for pdf in _one_chunk(pdfs):  # chunk-order + empty-group guard
            pdf = pdf.sort_values("ts")
        if pdf is None:
            import pandas as _pd

            pdf = _pd.DataFrame({c: [] for c in ("ts", "open", "high",
                                                 "low", "close")})
        rows = {"episode": [], "start_ts": [], "end_ts": [],
                "n_bars": [], "max_dd": []}
        for ts, close in zip(pdf["ts"], pdf["close"]):
            close = float(close)
            if close != close:  # NaN close: poisons every later
                continue        # comparison — drop, documented
            if mx is None or close >= mx:
                if n_bars > 0:  # recovery closes the open episode
                    rows["episode"].append(highs)
                    rows["start_ts"].append(pd.Timestamp(start_ns))
                    rows["end_ts"].append(pd.Timestamp(end_ns))
                    rows["n_bars"].append(n_bars)
                    rows["max_dd"].append(py_round(max_dd))
                    n_bars, max_dd = 0, 0.0
                highs += 1
                mx = close if mx is None else max(mx, close)
            else:
                if n_bars == 0:
                    start_ns = int(ts.value)
                n_bars += 1
                end_ns = int(ts.value)
                max_dd = max(max_dd, mx - close)
        yield pd.DataFrame({"symbol": key[0], **rows})
        state.update((mx if mx is not None else float("nan"),
                      highs, start_ns, end_ns, n_bars, max_dd))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def streaming_yang_zhang(ticks: DataFrame,
                         watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ext/microstructure.py::yang_zhang — the
    overnight-gap-robust composite volatility estimator as a continuous
    query over an OHLC bar stream (columns: symbol, ts, open, high,
    low, close).

    State = ring buffer of the last MS_N + 1 OHLC rows per symbol (the
    +1 supplies the oldest window row's prev-close for the overnight
    return). Each arriving bar appends and refolds the trailing-MS_N
    exact-integer moment sums with python ints (unbounded, matching
    BIGINT), then emits the batch emission formula verbatim — the same
    float op order, float(int) conversions mirroring CAST AS DOUBLE.
    While the buffer is unsaturated its index 0 is the series start, so
    the row at buffer index 0 has no overnight return — the same
    validity rule the batch lag produces. A bar with a non-positive or
    NaN price yields None quant values: the row still OCCUPIES its
    window slot (batch ROWS frames count it) but joins no sum — the
    batch NULL-propagation guard. Same in-order-across-triggers
    precondition and 1-ulp python-vs-JVM ln caveat as the regime twins
    (_rolling_regime_twin); rows within one micro-batch are globally
    re-sorted by ts before folding (arrow chunks arrive in shuffle
    order)."""
    import math

    from pandas_ta_spark.ext.microstructure import MS_N, MS_SCALE, YZ_K

    cap = MS_N + 1
    omk = 1.0 - YZ_K
    out_schema = StructType([
        StructField("symbol", StringType()),
        StructField("ts", TimestampType()),
        StructField("n_obs", LongType()),
        StructField("vol_yz", DoubleType()),
    ])
    state_schema = StructType([StructField("ohlc", StringType())])

    def q2(a, b):  # the shared guard+quantizer at MS_SCALE
        return _lnq(a, b, MS_SCALE)

    def update(key, pdfs, state):
        import pandas as pd

        buf = []
        if state.exists:
            for tok in state.get[0].split(";"):
                if tok:
                    o, h, l, c = tok.split(":")
                    buf.append((float(o), float(h), float(l), float(c)))
        pdf = None
        for pdf in _one_chunk(pdfs):  # chunk-order + empty-group guard
            pdf = pdf.sort_values("ts")
        if pdf is None:
            import pandas as _pd

            pdf = _pd.DataFrame({c: [] for c in ("ts", "open", "high",
                                                 "low", "close")})
        rows = {"ts": [], "n_obs": [], "vol_yz": []}
        for ts, o, h, l, c in zip(pdf["ts"], pdf["open"], pdf["high"],
                                  pdf["low"], pdf["close"]):
            buf.append((float(o), float(h), float(l), float(c)))
            if len(buf) > cap:
                buf.pop(0)
            m = len(buf)
            n = so = qo2 = sc = qc2 = srs = 0
            for j in range(max(0, m - MS_N), m):
                oj, hj, lj, cj = buf[j]
                if j == 0:
                    continue  # no prev close: overnight return NULL
                qo = q2(oj, buf[j - 1][3])
                qc = q2(cj, oj)
                hc, ho = q2(hj, cj), q2(hj, oj)
                lc, lo = q2(lj, cj), q2(lj, oj)
                if None in (qo, qc, hc, ho, lc, lo):
                    continue  # batch validity guard: row joins no sum
                rs = hc * ho + lc * lo
                n += 1
                so += qo
                qo2 += qo * qo
                sc += qc
                qc2 += qc * qc
                srs += rs
            vol = None
            if n >= MS_N:
                vo = float(n * qo2 - so * so) / (n * (n - 1))
                vc = float(n * qc2 - sc * sc) / (n * (n - 1))
                vrs = float(srs) / n
                var = vo + vc * YZ_K + vrs * omk
                if var > 0:
                    vol = py_round(math.sqrt(var) / MS_SCALE)
            rows["ts"].append(ts)
            rows["n_obs"].append(n)
            rows["vol_yz"].append(vol)
        yield pd.DataFrame({"symbol": key[0], **rows})
        state.update((";".join(
            f"{o!r}:{h!r}:{l!r}:{c!r}" for o, h, l, c in buf),))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def streaming_var_cvar(ticks: DataFrame,
                       watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ext/microstructure.py::var_cvar — live rolling
    historical 95% VaR / CVaR per symbol over a close stream.

    State = the previous close plus a ring of the last VAR_N quantized
    VALID returns (the batch op pre-filters invalid returns before its
    window, so the streaming frame is the same last-VAR_N-valid set by
    construction). A bar with a non-positive/NaN close (or following
    one) produces no valid return: it emits NOTHING — the batch output
    has no row for it either — but still becomes the next bar's lag
    base, exactly like the batch lag over unfiltered bars. Emission
    mirrors the batch float chain op-for-op (float(int) = CAST AS
    DOUBLE, /VAR_K as float literal, /MS_SCALE). Same
    in-order-across-triggers precondition and 1-ulp ln caveat as the
    other twins; micro-batch rows are globally ts-sorted before the
    fold."""
    from pandas_ta_spark.ext.microstructure import MS_SCALE, VAR_K, VAR_N

    out_schema = StructType([
        StructField("symbol", StringType()),
        StructField("ts", TimestampType()),
        StructField("n_obs", LongType()),
        StructField("var_95", DoubleType()),
        StructField("cvar_95", DoubleType()),
    ])
    state_schema = StructType([
        StructField("prev_close", DoubleType()),
        StructField("ring", StringType()),
    ])

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            prev, ring_s = state.get
            if prev is not None and prev != prev:  # NaN sentinel
                prev = None
            ring = [int(t) for t in ring_s.split(",") if t != ""]
        else:
            prev, ring = None, []
        pdf = None
        for pdf in _one_chunk(pdfs):  # chunk-order + empty-group guard
            pdf = pdf.sort_values("ts")
        if pdf is None:
            import pandas as _pd

            pdf = _pd.DataFrame({c: [] for c in ("ts", "open", "high",
                                                 "low", "close")})
        rows = {"ts": [], "n_obs": [], "var_95": [], "cvar_95": []}
        for ts, close in zip(pdf["ts"], pdf["close"]):
            close = float(close)
            q = _lnq(close, prev, MS_SCALE) if prev is not None else None
            prev = close
            if q is None:
                continue  # batch filters invalid returns out of output
            ring.append(q)
            if len(ring) > VAR_N:
                ring.pop(0)
            n = len(ring)
            var = cvar = None
            if n >= VAR_N:
                srt = sorted(ring)
                var = py_round(float(srt[VAR_K - 1]) / MS_SCALE)
                cvar = py_round(
                    float(sum(srt[:VAR_K])) / float(VAR_K) / MS_SCALE)
            rows["ts"].append(ts)
            rows["n_obs"].append(n)
            rows["var_95"].append(var)
            rows["cvar_95"].append(cvar)
        yield pd.DataFrame({"symbol": key[0], **rows})
        state.update((prev if prev is not None else float("nan"),
                      ",".join(str(x) for x in ring)))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def streaming_parkinson(ticks: DataFrame,
                        watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ext/microstructure.py::parkinson — the
    simplest vol-estimator twin: each bar's quantized range log
    qu = floor(ln(high/low)*1e6+0.5) is computable on arrival (no
    lags), so state is just the ring of the last MS_N VALUES (None for
    an invalid bar — it still occupies its window slot exactly like
    the batch ROWS frame counts it). Emission mirrors the batch float
    chain: float(su2) / FOURLN2_N (the single shared repr literal),
    sqrt, / MS_SCALE. Same in-order precondition and 1-ulp ln caveat
    as the other twins."""
    import math

    from pandas_ta_spark.ext.microstructure import (
        FOURLN2_N,
        MS_N,
        MS_SCALE,
    )

    out_schema = StructType([
        StructField("symbol", StringType()),
        StructField("ts", TimestampType()),
        StructField("n_obs", LongType()),
        StructField("vol_p", DoubleType()),
    ])
    state_schema = StructType([StructField("ring", StringType())])

    def update(key, pdfs, state):
        import pandas as pd

        ring = ([None if t == "n" else int(t)
                 for t in state.get[0].split(",") if t != ""]
                if state.exists else [])
        pdf = None
        for pdf in _one_chunk(pdfs):  # chunk-order + empty-group guard
            pdf = pdf.sort_values("ts")
        if pdf is None:
            import pandas as _pd

            pdf = _pd.DataFrame({c: [] for c in ("ts", "open", "high",
                                                 "low", "close")})
        rows = {"ts": [], "n_obs": [], "vol_p": []}
        for ts, h, l in zip(pdf["ts"], pdf["high"], pdf["low"]):
            qu = _lnq(float(h), float(l), MS_SCALE)
            ring.append(qu)
            if len(ring) > MS_N:
                ring.pop(0)
            vals = [v for v in ring if v is not None]
            n = len(vals)
            vol = None
            if n >= MS_N:
                su2 = sum(v * v for v in vals)
                vol = py_round(
                    math.sqrt(float(su2) / FOURLN2_N) / MS_SCALE)
            rows["ts"].append(ts)
            rows["n_obs"].append(n)
            rows["vol_p"].append(vol)
        yield pd.DataFrame({"symbol": key[0], **rows})
        state.update((",".join("n" if v is None else str(v)
                               for v in ring),))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def streaming_kyle_lambda(ticks: DataFrame,
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of ext/microstructure.py::kyle_lambda — live
    rolling price impact per symbol over a (close, volume) stream.

    State = the previous close plus a ring of the last MS_N bars'
    (sv, dp) pairs, where an INVALID bar (no previous close, dirty
    close via the shared _lnq guard, or a volume that is negative,
    NaN, or >= KYLE_VOL_MAX — the batch op's second-moment-overflow
    guard, mirrored so all three twins agree on validity)
    holds its window slot as None without contributing, exactly like
    the batch ROWS window over unfiltered bars. Every bar emits a row
    (n_obs = valid pairs in the trailing window; lambda NULL until the
    window is full), matching the batch output row-for-row. Sums fold
    in unbounded python ints — the streaming analogue of the batch
    DECIMAL(38,0)/HUGEINT moments (volume magnitude is unbounded).
    Emission mirrors the batch float chain: float(cov)/float(var),
    then /MS_SCALE, rounded on the 1e-12 grid. Same
    in-order-across-triggers precondition and 1-ulp ln caveat as the
    other twins."""
    from pandas_ta_spark.ext.microstructure import (
        KYLE_VOL_MAX,
        MS_N,
        MS_SCALE,
    )

    out_schema = StructType([
        StructField("symbol", StringType()),
        StructField("ts", TimestampType()),
        StructField("n_obs", LongType()),
        StructField("kyle_lambda", DoubleType()),
    ])
    state_schema = StructType([
        StructField("prev_close", DoubleType()),
        StructField("ring", StringType()),
    ])

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            prev, ring_s = state.get
            if prev is not None and prev != prev:  # NaN sentinel
                prev = None
            ring = []
            for tok in ring_s.split(","):
                if tok == "":
                    continue
                if tok == "x":
                    ring.append(None)
                else:
                    a, b = tok.split(":")
                    ring.append((int(a), int(b)))
        else:
            prev, ring = None, []
        pdf = None
        for pdf in _one_chunk(pdfs):  # chunk-order + empty-group guard
            pdf = pdf.sort_values("ts")
        if pdf is None:
            pdf = pd.DataFrame({c: [] for c in ("ts", "open", "high",
                                                "low", "close", "volume")})
        rows = {"ts": [], "n_obs": [], "kyle_lambda": []}
        for ts, close, vol in zip(pdf["ts"], pdf["close"], pdf["volume"]):
            close, vol = float(close), float(vol)
            dp = _lnq(close, prev, MS_SCALE) if prev is not None else None
            prev = close
            entry = None
            if (dp is not None and vol >= 0 and _isfinite(vol)
                    and vol < KYLE_VOL_MAX):
                sign = 1 if dp > 0 else (-1 if dp < 0 else 0)
                entry = (sign * int(_floor(vol)), dp)
            ring.append(entry)
            if len(ring) > MS_N:
                ring.pop(0)
            n = sx = sy = sxy = sxx = 0
            for p in ring:
                if p is None:
                    continue
                x, y = p
                n += 1
                sx += x
                sy += y
                sxy += x * y
                sxx += x * x
            lam = None
            var_s = n * sxx - sx * sx
            if n >= MS_N and var_s > 0:
                lam = py_round(
                    float(n * sxy - sx * sy) / float(var_s) / MS_SCALE, 12)
            rows["ts"].append(ts)
            rows["n_obs"].append(n)
            rows["kyle_lambda"].append(lam)
        yield pd.DataFrame({"symbol": key[0], **rows})
        state.update((prev if prev is not None else float("nan"),
                      ",".join("x" if p is None else f"{p[0]}:{p[1]}"
                               for p in ring)))

    ticks = ticks.withWatermark("ts", watermark)
    return ticks.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
