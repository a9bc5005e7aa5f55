"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import pytest

import __spark_entry__ as E

from tests.conftest import SF_SMOKE


def test_entry_runs(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "score"}


def test_queries_have_oracles(spark):
    qs = E.queries()
    oracles = E.oracle_sql()
    # every oracle key must have a query; queries may omit oracles (rows-only)
    assert set(oracles) <= set(qs)


@pytest.mark.slow  # full 326-query surface sweep at sf0.001 — minutes, not seconds
def test_all_queries_run_smoke(spark):
    for name, fn in E.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        df.limit(5).collect()
