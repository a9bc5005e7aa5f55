"""Oracle output-type lint: no engine-private numeric types may reach
the driver's fetch path.

The driver compares Spark and DuckDB results through a dataframe fetch
(pandas/arrow), where DuckDB's HUGEINT (the type of ``sum(BIGINT)`` —
including WINDOW sums) and DECIMAL columns materialize differently than
plain ``fetchall`` Python ints/floats, so a value that hashes clean in
the fetchall-based replica (tools/check_correctness.py) can hash red on
the driver.  This is exactly what made ``sketch_quantile_hist`` /
``sketch_quantile_stream`` the only round-9 red cells: both left a
window-sum ``n`` column uncast.

DuckDB resolves result types in the binder without executing the query,
so this sweep over every oracle is cheap.  Any flagged column must be
CAST to BIGINT / DOUBLE inside the oracle SQL.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E
from usearch_spark.schema import TESTDATA_TABLES

from tests.conftest import SF_SMOKE

_BANNED_EXACT = {"HUGEINT", "UHUGEINT", "UBIGINT"}
_BANNED_PREFIX = ("DECIMAL",)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TESTDATA_TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", sorted(E.oracle_sql()))
def test_oracle_output_types_portable(con, name):
    rel = con.sql(E.oracle_sql()[name])
    flagged = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) in _BANNED_EXACT or str(t).startswith(_BANNED_PREFIX)
    ]
    assert not flagged, (
        f"oracle '{name}' leaves engine-private numeric types in its output "
        f"{flagged}; CAST to BIGINT/DOUBLE in the SQL"
    )
