"""Strategy specification + normalization — the reference's user-facing
``Strategy`` surface (pandas_ta/core.py#Strategy, #AllStrategy,
#CommonStrategy, #strategy argument normalization) re-expressed for the
plan-based engine.

The reference turns a Strategy into a multiprocessing loop of eager
per-indicator calls; here it normalizes to a list of ``Indicator`` plan
fragments that ``plans/strategy.apply_strategy`` compiles into ONE plan
(single shuffle, batched Arrow pass). Accepted specs, matching the
reference's ``df.ta.strategy(...)`` argument forms:

- a ``Strategy`` dataclass (``ta`` = list of ``{"kind": ..., params}``
  dicts; ``close`` selects the source column; ``prefix``/``suffix``
  rename outputs);
- a category string (``"momentum"``, ``"overlap"``, ...) — every
  indicator of that category at default parameters;
- ``"all"`` / ``AllStrategy`` — the full default suite (collision-free
  subset, as the bench's all-indicator strategy);
- a list of ``Indicator`` objects (the native form) passes through.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pandas_ta_spark.operators.base import Indicator, KernelSpec


@dataclass
class Strategy:
    """pandas_ta/core.py#Strategy: named bundle of indicator requests.

    ``ta=None`` means "all indicators" (the reference's AllStrategy
    convention)."""

    name: str
    ta: list[dict] | None = None
    description: str = ""
    created: str = ""

    def __post_init__(self):
        if not isinstance(self.name, str) or not self.name:
            raise ValueError("Strategy 'name' must be a non-empty string")
        if self.ta is not None:
            ok = isinstance(self.ta, list) and len(self.ta) > 0 and all(
                isinstance(d, dict) and isinstance(d.get("kind"), str)
                for d in self.ta
            )
            if not ok:
                raise ValueError(
                    "Strategy 'ta' must be a non-empty list of dicts, "
                    "each with a string 'kind'")


AllStrategy = Strategy(
    name="All",
    description="All the indicators with their default settings.",
)

# the reference's CommonStrategy: price SMAs + a volume SMA under a
# VOLUME_ prefix (pandas_ta/core.py#CommonStrategy)
CommonStrategy = Strategy(
    name="Common Price and Volume SMAs",
    ta=[
        {"kind": "sma", "length": 10},
        {"kind": "sma", "length": 20},
        {"kind": "sma", "length": 50},
        {"kind": "sma", "length": 200},
        {"kind": "sma", "close": "volume", "length": 20,
         "prefix": "VOLUME"},
    ],
    description="Common Price SMAs: 10, 20, 50, 200 and Volume SMA: 20.",
)


def _renamed(ind: Indicator, prefix: str | None, suffix: str | None,
             col_names=None) -> Indicator:
    """Output-column rename (the reference's prefix/suffix/col_names
    kwargs; ``col_names`` is the positional full-rename tuple).

    Expression-path indicators rename outputs plus the matching
    ``final``/``sql_final`` keys (stage temps are dropped anyway).
    Kernel-path indicators wrap the Arrow kernel so its output frame is
    renamed after execution (r14: the ROLL absorption moved sma and
    friends to kernels, which CommonStrategy's VOLUME_ prefix must
    still rename)."""
    if not prefix and not suffix and not col_names:
        return ind

    if col_names:
        if isinstance(col_names, str):
            col_names = (col_names,)
        if len(col_names) != len(ind.outputs):
            raise ValueError(
                f"col_names needs {len(ind.outputs)} names for "
                f"{ind.key!r} (outputs {ind.outputs}), got {col_names}")
        mapping = dict(zip(ind.outputs, col_names))
    else:
        mapping = {}

    def rn(c: str) -> str:
        out = mapping.get(c, c)
        if prefix:
            out = f"{prefix}_{out}"
        if suffix:
            out = f"{out}_{suffix}"
        return out

    kernel = None
    if ind.kernel is not None:
        k = ind.kernel
        kmap = {c: rn(c) for c in k.outputs}
        base_fn = k.fn

        def fn2(pdf, _fn=base_fn, _m=kmap, _in=tuple(k.inputs)):
            # run on a narrow copy (ts + declared inputs + the chunk
            # position column) and splice back ONLY the renamed outputs:
            # a global frame rename would clobber a sibling kernel's
            # same-named column (CommonStrategy has SMA_20 and the
            # VOLUME_-prefixed sma(20) in one pass), while copying the
            # whole group frame doubled peak per-group memory at the
            # 20M-row bound (ADVICE r14)
            cols = [c for c in ("ts", "_pts_rn0", *_in) if c in pdf.columns]
            sub = _fn(pdf[cols].copy())
            for old, new in _m.items():
                pdf[new] = sub[old]
            return pdf

        kernel = KernelSpec(fn2, [rn(c) for c in k.outputs],
                            k.inputs, k.carry_rows, k.lead_rows,
                            pos_dependent=k.pos_dependent)

    return Indicator(
        ind.key,
        [rn(c) for c in ind.outputs],
        ind.category,
        stages=ind.stages,
        final={rn(c): e for c, e in ind.final.items()},
        sql_stages=ind.sql_stages,
        sql_final=({rn(c): e for c, e in ind.sql_final.items()}
                   if ind.sql_final is not None else None),
        sql_full=ind.sql_full,
        kernel=kernel,
    )


def _all_defaults(exclude: set[str],
                  kinds: set[str] | None = None) -> list[Indicator]:
    """Every default-suite indicator whose outputs don't collide — the
    same collision rule as the bench's all-indicator strategy (dm/adx
    share DMP/DMN; cdl_pattern_all covers cdl_doji/inside). ``kinds``
    optionally restricts to a category's indicator names (the single
    definition of the suite walk — code-review r8)."""
    from pandas_ta_spark.registry import _SUITE, default_instance

    seen: set[str] = set()
    inds: list[Indicator] = []
    for key in _SUITE:
        ind = default_instance(key)
        if ind.key in exclude or (kinds is not None and ind.key not in kinds):
            continue
        if any(o in seen for o in ind.outputs):
            continue
        seen.update(ind.outputs)
        inds.append(ind)
    return inds


def resolve_strategy(spec, exclude=()) -> list[Indicator]:
    """Normalize any accepted strategy spec to a list of Indicators."""
    from pandas_ta_spark.registry import Category, make

    if isinstance(exclude, str):  # exclude="rsi" must not mean {'r','s','i'}
        exclude = (exclude,)
    exclude = {e.lower() for e in exclude}
    if isinstance(spec, Strategy):
        if spec.ta is None:
            return _all_defaults(exclude)
        out = []
        for d in spec.ta:
            d = dict(d)
            kind = d.pop("kind")
            if kind.lower() in exclude:
                continue
            prefix = d.pop("prefix", None)
            suffix = d.pop("suffix", None)
            col_names = d.pop("col_names", None)
            if "close" in d:  # reference spelling for the source column
                d["src"] = d.pop("close")
            out.append(_renamed(make(kind, **d), prefix, suffix, col_names))
        return out
    if isinstance(spec, str):
        if spec.lower() == "all":
            return _all_defaults(exclude)
        if spec.lower() in Category:
            return _all_defaults(exclude, kinds=set(Category[spec.lower()]))
        raise ValueError(
            f"unknown strategy {spec!r}: not 'all' or a category "
            f"({sorted(Category)})")
    # already a list of Indicator plan fragments — but exclude still
    # applies (ADVICE r8: the passthrough silently kept excluded kinds,
    # unlike every other spec form)
    return [ind for ind in spec if ind.key.lower() not in exclude]
