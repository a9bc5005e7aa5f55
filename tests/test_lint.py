"""Plan-linter tests: each anti-pattern detected on a synthetic plan, and
the repo-wide sweep — every entry query must lint free of ERROR findings."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from usearch_spark.plans.lint import errors, lint_plan

SF = "/root/testdata/sf0.001"


def codes(df, level=None):
    fs = lint_plan(df)
    if level:
        fs = [f for f in fs if f["level"] == level]
    return {f["code"] for f in fs}


def test_detects_global_window(spark):
    df = spark.range(100).withColumn("rn", F.row_number().over(Window.orderBy("id")))
    assert "GLOBAL_WINDOW" in codes(df, "error")


def test_partitioned_window_is_clean(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.partitionBy(F.col("id") % 10).orderBy("id"))
    )
    assert "GLOBAL_WINDOW" not in codes(df)


def test_partitioned_window_without_order_is_clean(spark):
    """A partition-wide aggregation frame (partitionBy, no orderBy) is a
    per-group total, not a global window — the 2-list plan shape must be
    disambiguated from the ordered-global case by the ASC/DESC markers."""
    df = spark.range(100).withColumn(
        "t", F.count(F.lit(1)).over(Window.partitionBy(F.col("id") % 10))
    )
    assert "GLOBAL_WINDOW" not in codes(df)


def test_global_unordered_window_is_flagged(spark):
    df = spark.range(100).withColumn(
        "t", F.count(F.lit(1)).over(Window.partitionBy())
    )
    assert "GLOBAL_WINDOW" in codes(df, "error")


def test_literal_partition_window_is_flagged(spark):
    """partitionBy(lit(0)) routes every row to ONE task exactly like an
    empty spec (it only silences the WindowExec warning) — the linter must
    not be fooled by the constant partition key."""
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.partitionBy(F.lit(0)).orderBy("id"))
    )
    assert "GLOBAL_WINDOW" in codes(df, "error")


def test_detects_row_at_a_time_python_udf(spark):
    from pyspark.sql.functions import udf

    plus_one = udf(lambda x: x + 1, "long")
    # row-at-a-time UDFs require legacy eval; guard if this build forbids them
    spark.conf.set("spark.sql.execution.pythonUDF.arrow.enabled", "false")
    try:
        df = spark.range(10).select(plus_one(F.col("id")).alias("y"))
        assert "PY_ROW_UDF" in codes(df, "error")
    finally:
        spark.conf.unset("spark.sql.execution.pythonUDF.arrow.enabled")


def test_detects_cartesian(spark):
    # both-sides-big cartesian (no broadcast): disable auto-broadcast so
    # the planner can't bound one side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a, b = spark.range(10), spark.range(10)
        got = codes(a.crossJoin(b))
        assert "CARTESIAN" in got or "NESTED_LOOP" in got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_broadcast_scalar_cross_is_warn_not_error(spark):
    thresh = spark.range(100).agg(F.avg("id").alias("t"))
    df = spark.range(100).crossJoin(F.broadcast(thresh)).filter(F.col("id") > F.col("t"))
    assert not errors(lint_plan(df))  # WARN at most


def test_equi_join_is_clean(spark):
    a = spark.range(1000).withColumnRenamed("id", "k")
    b = spark.range(1000).withColumnRenamed("id", "k")
    df = a.join(b, "k")
    assert not errors(lint_plan(df))


# Justified exceptions: the linter can't see row counts, so global windows
# over PROVABLY tiny inputs are allowed here with the reason recorded.
# (Both sites partition by lit(0) — semantically still global, flagged by
# the literal-partition detector — purely so WindowExec does not spam its
# "No Partition Defined" warning on every bench/driver run.)
ALLOWED = {
    # prefix-sum window runs over per-partition totals: one row per shuffle
    # partition, not the data (operators/pack.py)
    "corpus_pack": {"GLOBAL_WINDOW"},
    # rank window runs over the already-reduced top_n rows (<= 10), after
    # a distributed TakeOrderedAndProject (operators/profile.py)
    "skew_stats": {"GLOBAL_WINDOW"},
}


# Heavy graph/iterative plans whose CONSTRUCTION alone (driver-side loop
# unrolling + per-round checkpoints at lint time) costs 10s+ each: the
# lint still covers them in the full suite, the default loop skips them.
_LINT_SLOW = {
    "graph_mst", "graph_louvain_dist", "graph_coarsen_levels", "sim_mmr",
    "graph_louvain_refined", "graph_louvain", "graph_partition_kway",
    "graph_eccentricity", "graph_coarsen", "corpus_coverage_select",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _LINT_SLOW else n
        for n in sorted(__import__("__spark_entry__").queries())
    ],
)
def test_entry_queries_lint_clean(spark, name):
    """Repo-wide sweep: no entry query may plan a cartesian product, a
    row-at-a-time Python stage, or a global window (unless allowlisted
    above with the reason)."""
    import __spark_entry__ as E

    df = E.queries()[name](spark, SF)
    errs = [f for f in errors(lint_plan(df)) if f["code"] not in ALLOWED.get(name, set())]
    assert not errs, f"{name}: {errs}"
