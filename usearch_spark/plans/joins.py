"""Skew-hardened join helpers.

The first lever against join skew is AQE's skew-join handling
(spark.sql.adaptive.skewJoin.enabled, on by default in session.py): it
splits oversized shuffle partitions at runtime.  Manual salting remains
the tool for the cases AQE can't fix — a single key so hot that ONE join
key value exceeds an executor (AQE splits partitions, not keys), or
deterministic-layout requirements where runtime re-planning is unwanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key salt pattern: every LEFT row picks a
    pseudo-random salt (xxhash64 of its whole row — deterministic, no rand()
    so retries/speculation see the same salt), the RIGHT side is replicated
    once per salt value, and the join keys on (key, salt).  A key with N
    matching left rows now spreads across ``salts`` reduce tasks instead
    of one.

    Semantics: identical row multiset to ``left.join(right, on, how)`` for
    'inner' and 'left' joins — each left row meets exactly one replica of
    every matching right row.  Cost: the right side shuffles ``salts``
    times larger; use when left is huge-and-skewed and right is the
    moderate side (for small rights just broadcast instead).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_col = "__usearch_salt"
    if salt_col in left.columns or salt_col in right.columns:
        raise ValueError(f"column {salt_col!r} already exists on a join input")
    # mix a per-row disambiguator into the hash: exact-duplicate rows of a
    # hot key must NOT share a salt, or they all funnel into one reduce
    # task anyway.  monotonically_increasing_id is partition-deterministic
    # (partition_id << 33 | offset), so retries/speculation still see the
    # same salt for the same row — unlike rand().
    salt = F.pmod(
        F.xxhash64(F.monotonically_increasing_id(), *[F.col(c) for c in left.columns]),
        F.lit(salts),
    )
    lsalted = left.withColumn(salt_col, salt)
    rsalted = right.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<bigint>"))
    )
    return lsalted.join(rsalted, [on, salt_col], how).drop(salt_col)
