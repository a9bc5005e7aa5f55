"""Data-profiling operators (usearch_spark/operators/profile.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usearch_spark.operators.profile import column_profile, key_skew_stats


def test_key_skew_stats_ranks_hot_keys(spark):
    # key "a" x6, "b" x3, "c" x1 -> mean 10/3
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_stats(df, "k", top_n=2).collect()
    assert [(r["rk"], r["key"], r["cnt"]) for r in out] == [(1, "a", 6), (2, "b", 3)]
    top = out[0]
    assert top["share"] == 0.6
    assert top["ratio_to_mean"] == pytest.approx(1.8)  # 6 / (10/3)


def test_key_skew_stats_tie_breaks_by_key(spark):
    df = spark.createDataFrame([("b",), ("a",), ("a",), ("b",)], "k string")
    out = key_skew_stats(df, "k", top_n=2).collect()
    assert [r["key"] for r in out] == ["a", "b"]


def test_key_skew_stats_no_global_window_over_keyspace(spark):
    # the rank window runs on the top-n rows, never on the full key space:
    # the plan's top-k must be TakeOrderedAndProject below the window
    df = spark.createDataFrame([("a",), ("b",)], "k string")
    plan = key_skew_stats(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_column_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "a long, b string"
    )
    out = {r["column"]: r for r in column_profile(df, ["a", "b"]).collect()}
    assert out["a"]["n_rows"] == 3 and out["a"]["n_null"] == 0
    assert out["a"]["n_distinct"] == 2
    assert (out["a"]["min_val"], out["a"]["max_val"]) == ("1", "2")
    assert out["b"]["n_null"] == 1 and out["b"]["n_distinct"] == 2
    assert (out["b"]["min_val"], out["b"]["max_val"]) == ("x", "y")


def test_column_profile_single_pass(spark):
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    plan = column_profile(df, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_column_profile_requires_columns(spark):
    with pytest.raises(ValueError):
        column_profile(spark.range(1), [])
