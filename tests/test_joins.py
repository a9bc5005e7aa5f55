"""Skew-hardened join helpers (plans/joins.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usearch_spark.plans.joins import salted_join
from usearch_spark.plans.lint import errors, lint_plan


def _skewed(spark):
    # one hot key (90% of rows) + a long tail; right side has multiplicity
    left = spark.range(2000).select(
        F.when(F.col("id") < 1800, F.lit("hot")).otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("k1900", 3), ("k1901", 4), ("absent", 5)], "k string, rv int"
    )
    return left, right


def test_salted_join_matches_plain_inner(spark):
    left, right = _skewed(spark)
    plain = sorted(map(tuple, left.join(right, "k").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k", salts=4).collect()))
    assert salted == plain and len(plain) == 1800 * 2 + 2


def test_salted_join_matches_plain_left(spark):
    left, right = _skewed(spark)
    plain = sorted(map(tuple, left.join(right, "k", "left").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k", salts=4, how="left").collect()))
    assert salted == plain


def test_salted_join_spreads_hot_key(spark):
    """The mechanism itself: the hot key's rows land on several distinct
    (key, salt) join keys, and the plan is linter-clean."""
    left, right = _skewed(spark)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(4))
    n_salts = left.filter(F.col("k") == "hot").select(salt.alias("s")).distinct().count()
    assert n_salts == 4
    out = salted_join(left, right, "k", salts=4)
    assert errors(lint_plan(out)) == []


def test_salted_join_rejects_unsupported_how(spark):
    left, right = _skewed(spark)
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")


def test_salted_join_spreads_exact_duplicate_rows(spark):
    """Exact-duplicate rows of a hot key must NOT share one salt — the
    per-row disambiguator spreads them across reduce tasks."""
    left = spark.range(2000).select(F.lit("hot").alias("k"), F.lit(1).alias("lv"))
    right = spark.createDataFrame([("hot", 9)], "k string, rv int")
    out = salted_join(left, right, "k", salts=8)
    assert out.count() == 2000
    # reconstruct the salts the join used: >1 distinct value proves spread
    from pyspark.sql.functions import monotonically_increasing_id, pmod, xxhash64, lit

    salts = (
        left.select(pmod(xxhash64(monotonically_increasing_id(), "k", "lv"), lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert salts > 1


def test_salted_join_rejects_salt_column_collision(spark):
    left = spark.createDataFrame([("a", 0)], "k string, __usearch_salt int")
    right = spark.createDataFrame([("a", 1)], "k string, rv int")
    with pytest.raises(ValueError, match="__usearch_salt"):
        salted_join(left, right, "k")
