"""Data-quality expectation auditing — the dbt-test / Great-Expectations
surface a warehouse pipeline runs before publishing a table.

Three primitives, each returning the same (check, n_violations, n_checked)
shape so audits compose with unionByName into one report:

  - rule_violations: arbitrary boolean predicates evaluated in ONE scan
    (conditional sums inside a single aggregate — adding a rule adds a
    column, not a pass);
  - duplicate_keys: uniqueness check as count(*) - count(distinct);
  - orphan_rows: referential integrity as a left join null-probe (the
    join keys shuffle once; Spark broadcasts the parent side when small).

At 100 TB an audit's cost should be one scan per table plus one join per
FK — exactly what these compile to.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rule_violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate every predicate in one aggregate pass over ``df``.
    ``rules`` maps check-name -> violation condition (true = bad row)."""
    if not rules:
        raise ValueError("rule_violations requires at least one rule")
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_v{i}")
        for i, cond in enumerate(rules.values())
    ] + [F.count(F.lit(1)).alias("_n")]
    row = df.agg(*aggs)
    # check names are user strings — pass them as typed literals via
    # F.stack, never interpolated into SQL text
    stack_args: list[Column] = []
    for i, name in enumerate(rules):
        stack_args += [F.lit(name), F.col(f"_v{i}")]
    return row.select(
        F.stack(F.lit(len(rules)), *stack_args).alias("check", "n_violations"),
        F.col("_n").alias("n_checked"),
    )


def duplicate_keys(df: DataFrame, key: str, check_name: str) -> DataFrame:
    """Uniqueness: surplus rows beyond one per key value."""
    return df.agg(
        (F.count(F.lit(1)) - F.countDistinct(key)).cast("long").alias("n_violations"),
        F.count(F.lit(1)).alias("n_checked"),
    ).select(F.lit(check_name).alias("check"), "n_violations", "n_checked")


def orphan_rows(
    child: DataFrame, parent: DataFrame, fk: str, pk: str, check_name: str
) -> DataFrame:
    """Referential integrity: child rows whose FK matches no parent PK."""
    p = parent.select(F.col(pk).alias("_pk")).dropDuplicates(["_pk"])
    j = child.select(F.col(fk).alias("_fk")).join(p, F.col("_fk") == F.col("_pk"), "left")
    return j.agg(
        F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0)).cast("long").alias("n_violations"),
        F.count(F.lit(1)).alias("n_checked"),
    ).select(F.lit(check_name).alias("check"), "n_violations", "n_checked")
