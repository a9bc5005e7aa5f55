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
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """For each left row: columns of the nearest right row at-or-before
    (``direction='backward'``) or at-or-after (``'forward'``) its timestamp
    with the same ``on`` key (NULLs when no such row exists).

    Ties (right ts == left ts) take the right row in either direction,
    matching pandas ``merge_asof`` / DuckDB ASOF semantics.  Among several
    right rows sharing the matched timestamp the greatest (by value-column
    tuple) wins — an explicit deterministic tie-break where the naive
    window encoding is partition-order-dependent.

    ``tolerance`` (optional) voids matches farther than the given distance:
    pass a number for numeric timestamps, or a literal interval column
    (``F.expr("INTERVAL 30 MINUTES")``) for timestamp columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (on, right_ts)]
    clash = set(right_value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"right value columns {sorted(clash)} collide with left columns; "
            f"alias them on the right side before asof_join"
        )

    # NULL keys never match (DuckDB ASOF / merge_asof semantics): left NULL
    # rows pass through with NULL results; right NULL rows are dropped
    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    # carry the matched right row as ONE struct, so every value column and
    # the matched timestamp come from the SAME row (independently-carried
    # columns would skip a NULL field and stitch values from older rows)
    r_tagged = (
        right.filter(F.col(on).isNotNull())
        .select(
            F.col(on),
            F.col(right_ts).alias("_ts"),
            F.struct(
                F.col(right_ts).alias("_match_ts"), *[F.col(c) for c in right_value_cols]
            ).alias("_right_row"),
        )
        .withColumn("_side", F.lit(0))
    )
    l_prepped = l_tagged.withColumn("_right_row", F.lit(None).cast(dict(r_tagged.dtypes)["_right_row"]))
    unioned = l_prepped.unionByName(r_tagged, allowMissingColumns=True)

    # right rows sort before left rows at equal ts (_side 0 < 1) so an
    # exact-tie right row is visible to the left row's window; _right_row in
    # the ordering makes duplicate right timestamps deterministic.  Forward
    # = the same scan over reversed time.
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_right_row").asc()]
    else:
        order = [F.col("_ts").desc(), F.col("_side").asc(), F.col("_right_row").asc()]
    w = Window.partitionBy(on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    carried = unioned.withColumn(
        "_matched", F.last(F.when(F.col("_side") == 0, F.col("_right_row")), ignorenulls=True).over(w)
    )
    if tolerance is not None:
        dist = (
            F.col("_ts") - F.col("_matched._match_ts")
            if direction == "backward"
            else F.col("_matched._match_ts") - F.col("_ts")
        )
        carried = carried.withColumn("_matched", F.when(dist <= tolerance, F.col("_matched")))
    out = carried.filter(F.col("_side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"_matched.{c}").alias(c + suffix) for c in right_value_cols],
        F.col("_matched._match_ts").alias(right_ts + suffix),
    )
    return out


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: each left row matched to every interval
    with ``start <= ts <= end`` — via the BINNED equi-join encoding, not a
    raw theta-join.

    A naive inequality join is a cross product with a filter (O(|L| x |I|)
    — the thing that cannot run at 100 TB).  Binning makes it an equi-join:
    each left row keys on floor(ts / bin_width); each interval explodes to
    the bins it covers; the join is hash/equi on the bin with the exact
    containment predicate as a residual filter.  Cost is
    O(|L| + |I| * span/bin_width) rows shuffled, and the bin key
    co-partitions both sides.  A left row lives in exactly one bin, so a
    single (row, interval) match cannot duplicate.

    ``ts_col``/``start_col``/``end_col`` must share one numeric domain
    (e.g. epoch micros); pick ``bin_width`` near the typical interval span
    so most intervals explode to O(1) bins.
    """
    lb = left.withColumn("_bin", (F.col(ts_col) / bin_width).cast("long"))
    ib = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.col(start_col) / bin_width).cast("long"),
                (F.col(end_col) / bin_width).cast("long"),
            )
        ),
    )
    cond = (
        (lb["_bin"] == ib["_bin"])
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) <= F.col(end_col))
    )
    return lb.join(ib, cond, how).drop("_bin")
