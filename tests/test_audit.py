"""Data-quality audit primitives (operators/audit.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usearch_spark.operators.audit import duplicate_keys, orphan_rows, rule_violations


def test_rule_violations_one_scan(spark):
    df = spark.createDataFrame([(1, "a"), (-2, None), (3, "c")], "x int, s string")
    out = rule_violations(
        df,
        {"x_positive": F.col("x") <= 0, "s_not_null": F.col("s").isNull()},
    ).collect()
    got = {r["check"]: (r["n_violations"], r["n_checked"]) for r in out}
    assert got == {"x_positive": (1, 3), "s_not_null": (1, 3)}


def test_rule_violations_quoted_name_is_safe(spark):
    """Check names are data, not SQL — a single quote must not break the
    plan (previously interpolated into selectExpr)."""
    df = spark.createDataFrame([(1,)], "x int")
    out = rule_violations(df, {"x isn't null": F.col("x").isNull()}).collect()
    assert out[0]["check"] == "x isn't null" and out[0]["n_violations"] == 0


def test_rule_violations_empty_rules_raises(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError):
        rule_violations(df, {})


def test_duplicate_keys_and_orphans(spark):
    child = spark.createDataFrame([(1,), (1,), (2,), (9,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    dup = duplicate_keys(child, "fk", "fk_unique").collect()[0]
    assert (dup["n_violations"], dup["n_checked"]) == (1, 4)
    orp = orphan_rows(child, parent, "fk", "pk", "fk_exists").collect()[0]
    assert (orp["n_violations"], orp["n_checked"]) == (1, 4)
