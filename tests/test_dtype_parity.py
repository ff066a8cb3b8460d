"""Cross-engine dtype-family parity for every ext query with an oracle.

The driver's value hash stringifies cell values, so a column that is
int64 on the Spark side and float64 on the DuckDB side hash-mismatches
("662" vs "662.0") even when every value is exactly equal. That is how
lang_source_agg / events_props_agg went red in CORRECTNESS_r08.json:
DuckDB promotes sum(INT) to HUGEINT, which pandas materializes as
float64, while Spark emits BIGINT. The house style is CAST(sum(...) AS
BIGINT) in the oracle; this test pins the whole class for the ext
suite (the SURVEY §2 operator suite is all driver-evidenced already)
so it cannot recur on keys that have not yet had a driver appearance.

Runs at sf0.001 (dtypes are scale-independent) and exempts
null-carrying columns: pandas upcasts nullable ints to float64 on both
sides, and a null-pattern divergence is a value failure the gate's
value compare reports separately.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _ext_items():
    from pandas_ta_spark.ext import SUITE

    return [(k, e) for k, e in SUITE.items() if e.oracle is not None]


@pytest.mark.parametrize("key", [k for k, _ in _ext_items()])
def test_ext_oracle_dtype_parity(spark, ducks, key):
    from tools.check import kind_mismatches

    from pandas_ta_spark.ext import SUITE

    ext = SUITE[key]
    sdf = ext.query(spark, SF_DIR).toPandas()
    odf = ducks.execute(ext.oracle).df()
    mism = kind_mismatches(sdf, odf)
    assert not mism, f"{key}: dtype family mismatch vs DuckDB oracle: {mism}"
