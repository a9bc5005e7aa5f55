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


def test_r15_gate_window_composition():
    """The r14-verdict rotation ask, pinned by position: the 50-entry
    driver window = the 7 never-driver-gated round-14 queries followed by
    the 43 oldest aged entries (resuming after type_market_share), and
    the freshly-gated r14 window sits at the back."""
    qs = list(E.queries())
    assert qs[:7] == [
        "graph_ppr_push", "events_mad_late", "eval_ece",
        "customer_retention", "events_psi", "events_ljungbox", "orders_rfm",
    ]
    assert qs[7] == "returned_revenue" and qs[49] == "small_quantity_revenue"
    # the r14-gated cohort (freshest) is entirely outside the window
    for gated in ("pricing_summary", "search_related", "type_market_share"):
        assert qs.index(gated) >= 50
