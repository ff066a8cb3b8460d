"""User-defined custom indicators (pandas_ta/custom.py#import_dir, #bind).

The reference loads user .py files from a directory and binds them onto
the DataFrame accessor. Here a custom module defines factories returning
``Indicator`` (Column-expression ops get the oracle/strategy machinery
for free; pandas kernels ride the shared applyInPandas pass) and either
exports ``FACTORIES = {name: factory}`` or a single function named after
the file.

    # ~/my_ta/double_sma.py
    from pyspark.sql import functions as F
    from pandas_ta_spark.functions.windows import roll, sql_roll
    from pandas_ta_spark.operators.base import Indicator

    def double_sma(length=10):
        out = f"DSMA_{length}"
        return Indicator("double_sma", [out], "custom",
                         final={out: 2 * roll(F.avg, "close", length)},
                         sql_final={out: f"2 * ({sql_roll('avg', 'close', length)})"})

    import_dir("~/my_ta")          # -> ta(df, "double_sma", length=5)
"""

from __future__ import annotations

import importlib.util
from pathlib import Path
from typing import Callable

from pandas_ta_spark.operators.base import Indicator


def bind(name: str, factory: Callable[..., Indicator]) -> None:
    """Register one custom factory under the 'custom' category
    (pandas_ta/custom.py#bind)."""
    from pandas_ta_spark import registry

    registry._FACTORIES[name.lower()] = factory
    registry.Category.setdefault("custom", [])
    if name.lower() not in registry.Category["custom"]:
        registry.Category["custom"].append(name.lower())


def create_dir(path: str) -> Path:
    """Create (if needed) a custom-indicator directory
    (pandas_ta/custom.py#create_dir)."""
    p = Path(path).expanduser()
    p.mkdir(parents=True, exist_ok=True)
    return p


def import_dir(path: str, verbose: bool = False) -> list[str]:
    """Load every .py in ``path`` and register its factories
    (pandas_ta/custom.py#import_dir). Returns the registered names."""
    registered: list[str] = []
    for py in sorted(Path(path).expanduser().glob("*.py")):
        if py.name.startswith("_"):
            continue
        spec = importlib.util.spec_from_file_location(f"pts_custom_{py.stem}", py)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        facs = getattr(mod, "FACTORIES", None)
        if facs is None:
            fn = getattr(mod, py.stem, None)
            if fn is None:
                if verbose:
                    print(f"skip {py.name}: no FACTORIES dict or {py.stem}()")
                continue
            facs = {py.stem: fn}
        for name, factory in facs.items():
            bind(name, factory)
            registered.append(name.lower())
        if verbose:
            print(f"loaded {py.name}: {sorted(facs)}")
    return registered
