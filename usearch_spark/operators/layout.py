"""Data-layout operators: Z-order (Morton) clustering keys.

At 100 TB the cheapest query is the one that never reads the file: engines
skip files whose column min/max stripes exclude the predicate.  Min/max
skipping works only if the LAYOUT puts similar values together — sorting
by one column destroys locality of every other.  The standard multi-column
answer (Delta OPTIMIZE ZORDER BY, ClickHouse/Databricks practice; Morton
1966) interleaves the bits of the clustering columns so a range partition
of the interleaved key keeps EVERY column's per-file min/max range narrow
at once.

This module computes Morton keys as pure JVM-side integer bit arithmetic
(shiftright/AND/shiftleft — engine-portable, oracle-replayable bit for
bit) and a locality REPORT: bucket the keyspace, and per bucket emit each
dimension's (min, max, count).  Narrow per-bucket rectangles ARE the
file-skipping guarantee — the report is the measurable form of "would a
partkey predicate prune most buckets?".

Usage at scale: ``df.repartitionByRange(n, zorder_key(...))`` then write;
the report query double-checks the clustering quality after compaction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a_sql: str, b_sql: str, bits: int = 16) -> Column:
    """Morton-interleave two NON-NEGATIVE integer expressions: bit j of
    ``a`` lands at position 2j, bit j of ``b`` at 2j+1.  Values must fit
    in ``bits`` bits (callers quantize/clamp first); the result fits in
    2·bits bits of a BIGINT.  Pure shift/AND/OR integer ops — identical
    in Spark and any SQL oracle."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in 1..31")
    terms = [
        f"(shiftleft(shiftright({a_sql}, {j}) & 1, {2 * j})"
        f" | shiftleft(shiftright({b_sql}, {j}) & 1, {2 * j + 1}))"
        for j in range(bits)
    ]
    return F.expr(" | ".join(terms))


def zorder_locality_report(
    df: DataFrame,
    a_col: str,
    b_col: str,
    bits: int = 16,
    bucket_bits: int = 8,
) -> DataFrame:
    """Bucket the Morton keyspace into 2^bucket_bits ranges and report each
    bucket's per-dimension bounding rectangle: (zbucket, n_rows, a_min,
    a_max, b_min, b_max).  Dimensions are min-max normalized onto the
    full ``bits``-bit grid first — exact integer scaling
    q = ((x − min)·(2^bits − 1)) DIV max(range, 1), so the interleave
    uses every key bit regardless of the columns' natural magnitudes
    (scale-free: the same query works at any SF).  One tiny min/max
    aggregate broadcasts, then one scan + one partial-aggregated groupBy
    on the bucket id; at 100 TB this is the post-OPTIMIZE audit that
    proves min/max skipping will fire for BOTH dimensions."""
    top = (1 << bits) - 1
    ranges = df.agg(
        F.min(a_col).alias("_alo"),
        F.max(a_col).alias("_ahi"),
        F.min(b_col).alias("_blo"),
        F.max(b_col).alias("_bhi"),
    )
    norm = df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")).crossJoin(
        F.broadcast(ranges)
    )
    aq = f"((a - _alo) * {top}) DIV greatest(_ahi - _alo, 1)"
    bq = f"((b - _blo) * {top}) DIV greatest(_bhi - _blo, 1)"
    z = zorder_key(aq, bq, bits)
    shift = 2 * bits - bucket_bits
    return (
        norm.select("a", "b", z.alias("z"))
        .groupBy(F.expr(f"shiftright(z, {shift})").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("a").alias("a_min"),
            F.max("a").alias("a_max"),
            F.min("b").alias("b_min"),
            F.max("b").alias("b_max"),
        )
    )
