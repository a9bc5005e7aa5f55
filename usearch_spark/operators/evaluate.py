"""Ranking-metric evaluation operators.

Model-evaluation companions to the dedup/classify operators: given a
score column and a binary label, measure how well the score RANKS the
positives — the metric a training-data pipeline uses to validate a
quality-scoring or classifier stage before trusting it to filter a
corpus (reference parity: the reference ships scorer stages —
summarize.go's match-ratio scorer — but no ranking evaluation; this is
part of the LLM-pipeline extension surface).

Everything is exact-integer until one final IEEE divide, so results are
engine-reproducible bit-for-bit (the repo's established determinism
contract): AUC is computed from the Mann-Whitney U statistic over
integer rank sums, never from a float sweep over thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_auc(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact per-group ROC AUC via the Mann-Whitney U statistic.

    AUC = P(score_pos > score_neg) + 0.5 * P(score_pos == score_neg),
    which with midrank tie handling is ``(R1 - n1*(n1+1)/2) / (n1*n0)``
    where ``R1`` is the sum of the positives' average ranks over the
    combined group.  Ranks are never materialized per row: rows collapse
    to one row per (group, score) with a count and a positive count, the
    rank block each distinct score occupies is recovered from a running
    count (``lower`` = rows strictly below), and the average rank of the
    block is ``lower + (cnt + 1) / 2`` — so ``2*R1`` is the integer
    ``sum(pos * (2*lower + cnt + 1))``.  The only float operation is the
    final ``(2*R1 - n1*(n1+1)) / (2*n1*n0)`` divide (long→double
    conversion is correctly rounded, so the chain is bit-identical
    across engines even past 2^53).

    Degenerate groups (no positives or no negatives) emit NULL auc
    rather than a 0/0.

    Distributed shape at 100 TB: one shuffle to (group, score) — the
    partial-aggregated collapse makes row volume the number of DISTINCT
    scores per group, not documents; the running count is a window
    ordered by score WITHIN each group partition (bounded by distinct
    scores, never global); the final per-group agg is partial-agg safe.
    No UDFs, no collects.

    Output: group_cols + (n_pos, n_neg, auc).
    """
    agg = df.groupBy(*group_cols, score_col).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("pos"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = agg.withColumn("lower", F.sum("cnt").over(w) - F.col("cnt"))
    g = ranked.groupBy(*group_cols).agg(
        F.sum("pos").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).alias("n_neg"),
        F.sum(
            F.col("pos") * (F.lit(2) * F.col("lower") + F.col("cnt") + F.lit(1))
        ).alias("two_r1"),
    )
    two_u1 = F.col("two_r1") - F.col("n_pos") * (F.col("n_pos") + F.lit(1))
    return g.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            two_u1.cast("double")
            / (F.lit(2) * F.col("n_pos") * F.col("n_neg")).cast("double"),
        ).alias("auc"),
    )
