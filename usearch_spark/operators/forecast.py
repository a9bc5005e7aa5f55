"""Time-series smoothing/forecast: Holt's linear-trend double
exponential smoothing over per-group daily series.

The monitoring layer of a large pipeline wants a cheap next-week
forecast per metric stream (ingest volume per source, error counts per
type) — Holt 1957 / Winters 1960 double exponential smoothing is the
standard O(1)-state recurrence:

    l_t = alpha·y_t + (1−alpha)·(l_{t−1} + b_{t−1})
    b_t = beta·(l_t − l_{t−1}) + (1−beta)·b_{t−1}
    forecast(h) = l_T + h·b_T

Distributed shape: the recurrence is inherently sequential IN t but the
series are short (days) and the GROUPS are many — so the scan/count
aggregation does the corpus-sized work (one partial-aggregated shuffle
of (group, day) counts) and the fold runs per group over a bounded
in-row array (sort_array + F.aggregate — JVM-side, no window over the
raw events, no UDF).  At 100 TB the per-day pre-aggregation is the
point: the fold input is |groups|·|days| rows, a dimension.

Determinism contract: alpha/beta default to 0.5/0.25 — EXACT binary
fractions, so every multiply/add in the chain is one correctly-rounded
IEEE primitive on identical operands in identical order; DuckDB's
list_reduce replays the fold bit-for-bit (the events_ewma contract,
extended to a struct accumulator).  Initialization is the
textbook l_2 = y_2, b_2 = y_2 − y_1, folding from y_3 (groups need
>= 2 points; shorter groups are excluded by both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def holt_forecast(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizon: int = 7,
) -> DataFrame:
    """Per-group Holt smoothing of DAILY COUNTS: aggregate ``df`` to
    (group, day, n) — one shuffle with map-side combine — then fold the
    day-ordered counts through the level/trend recurrence.  Returns
    (group_cols..., n_days, level, trend, forecast) with forecast the
    ``horizon``-step-ahead linear extrapolation.  ``alpha``/``beta``
    must be exact binary fractions for the cross-engine bit-identity
    contract (asserted)."""
    daily = df.groupBy(*group_cols, day_col.alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return holt_from_daily(daily, group_cols, alpha=alpha, beta=beta, horizon=horizon)


def holt_from_daily(
    daily: DataFrame,
    group_cols: list[str],
    alpha: float = 0.5,
    beta: float = 0.25,
    horizon: int = 7,
) -> DataFrame:
    """The Holt fold over PRE-AGGREGATED (group_cols..., d, n) daily
    counts — the entry point for incrementally-maintained rollups (a
    streaming daily rollup merged by count addition feeds this
    unchanged, since integer addition commutes with the fold's input)."""
    for p in (alpha, beta):
        assert p == float.fromhex(float(p).hex()) and (p * 1024) == int(p * 1024), (
            "alpha/beta must be exact binary fractions (k/1024) for the "
            "cross-engine determinism contract"
        )
    per = daily.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(F.struct("d", "n"))).alias("seq")
    )
    vals = F.transform(F.col("seq"), lambda s: s["n"].cast("double"))
    y1, y2 = F.element_at(vals, 1), F.element_at(vals, 2)
    rest = F.slice(vals, 3, F.greatest(F.size(vals) - 2, F.lit(0)))
    a, b1 = F.lit(float(alpha)), F.lit(float(beta))

    def step(acc, x):
        lv = a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
        # l' is written out twice (Spark lambdas can't bind locals); the
        # oracle repeats the identical expression, so both engines
        # evaluate the same chain twice — same bits either way
        return F.struct(
            lv.alias("l"),
            (
                b1 * (a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"]) - acc["l"])
                + (F.lit(1.0) - b1) * acc["b"]
            ).alias("b"),
        )

    folded = F.aggregate(
        rest, F.struct(y2.alias("l"), (y2 - y1).alias("b")), step
    )
    return (
        per.filter(F.size("seq") >= 2)
        .select(
            *group_cols,
            F.size("seq").cast("long").alias("n_days"),
            folded["l"].alias("level"),
            folded["b"].alias("trend"),
            (folded["l"] + F.lit(float(horizon)) * folded["b"]).alias("forecast"),
        )
    )
