"""Data-profiling operators: key-skew diagnostics and column profiles.

At 100 TB the first question about any join or aggregation is "how skewed
is the key?" — a handful of hot keys turns a balanced shuffle into a
straggler.  These operators answer it with ordinary aggregations (one
shuffle keyed by the column under test), producing small driver-sized
reports; they are the observability companion to the engine's skew
mitigations (AQE skew-join, LSH bucket caps, stop-shingle df caps).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def key_skew_stats(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Top-``top_n`` hottest keys of a column with their share of all rows
    and their ratio to the mean key frequency.

    One groupBy(key) shuffle with partial aggregation, then a distributed
    top-k (TakeOrderedAndProject, no global window) against totals carried
    via a single-row broadcast cross join.  ratio_to_mean >> 1 on the top
    key is the straggler signal.

    Output: (rk, key, cnt, share, ratio_to_mean), rk 1-based by cnt desc
    with the key value as tie-break.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_nkeys")
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key")).limit(top_n)
    joined = top.crossJoin(F.broadcast(totals))
    # window ranks only the already-reduced top_n rows, not the key space
    # (lint-allowlisted global window; WindowExec's warning for the two
    # known-tiny sites is demoted via the logger conf in session.get_spark
    # — a constant partition key does not survive the optimizer)
    w_rank = F.row_number().over(Window.orderBy(F.col("cnt").desc(), F.col("key")))
    # exact-integer rational rounds (counts are ints): q = (num·10^k) DIV
    # total + twice-remainder half-up bump, one cast + one divide each —
    # the decimal boundary cannot flip cross-engine
    return joined.select(
        w_rank.alias("rk"),
        "key",
        "cnt",
        (
            F.expr(
                "(cnt * 1000000) DIV _total"
                " + CASE WHEN 2 * ((cnt * 1000000) % _total) >= _total"
                " THEN 1 ELSE 0 END"
            ).cast("double")
            / F.lit(1000000.0)
        ).alias("share"),
        (
            F.expr(
                "(cnt * _nkeys * 10000) DIV _total"
                " + CASE WHEN 2 * ((cnt * _nkeys * 10000) % _total) >= _total"
                " THEN 1 ELSE 0 END"
            ).cast("double")
            / F.lit(10000.0)
        ).alias("ratio_to_mean"),
    )


def column_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column profile: row count, nulls, exact distinct count, min/max
    (as strings, so heterogeneous column types share one report schema).

    All columns profile in ONE aggregation pass (Spark expands multiple
    DISTINCT aggregates internally); at 100 TB swap the exact distinct for
    ``approx_count_distinct`` — the report schema doesn't change.

    Output: (column, n_rows, n_null, n_distinct, min_val, max_val).
    """
    if not cols:
        raise ValueError("at least one column required")
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.countDistinct(c).alias(f"_dist_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_val"),
                F.col(f"_max_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select(
        "p.column", "p.n_rows", "p.n_null", "p.n_distinct", "p.min_val", "p.max_val"
    )
