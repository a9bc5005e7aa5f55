"""As-of join: for each left row, the most recent right row at or before
its timestamp, per key.

Spark has no native ASOF JOIN; the scalable encoding is the union-sort
trick: tag both sides, sort by (key, ts, side-priority), and carry the last
right row forward with a window `last(..., ignorenulls=True)`.  One shuffle
on the key, no range-explode, no per-group Python.  (The alternative —
``applyInPandas`` + ``pd.merge_asof`` per key group — ships every row
through Arrow; use it only when the window trick can't express the
tolerance semantics.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right.right_ts <= left.left_ts`` and the same ``on`` key (NULLs when
    no such row exists).

    Ties (right ts == left ts) take the right row, matching DuckDB/pandas
    ``merge_asof(direction='backward')`` semantics.
    """
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    r_tagged = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_ts"),
            *[F.col(c) for c in right_value_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    for c in left.columns:
        if c != on and c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_value_cols:
        if c not in l_tagged.columns:
            l_tagged = l_tagged.withColumn(c, F.lit(None).cast(dict(r_tagged.dtypes)[c]))

    unioned = l_tagged.select(r_tagged.columns + [c for c in l_tagged.columns if c not in r_tagged.columns]) \
        .unionByName(r_tagged, allowMissingColumns=True)

    # right rows sort before left rows at equal ts (_side 0 < 1) so an
    # exact-tie right row is visible to the left row's window
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w).alias(c + suffix)
            for c in right_value_cols
        ],
        F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True).over(w).alias("_ts" + suffix),
    )
    out = carried.filter(F.col("_side") == 1).drop("_side", "_ts", *right_value_cols)
    return out.withColumnRenamed("_ts" + suffix, right_ts + suffix)
