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

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
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
        assert (p * 1024) == int(p * 1024), (
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


def holt_backtest(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
    alpha: float = 0.5,
    beta: float = 0.25,
    n_origins: int = 7,
    m: int = 7,
) -> DataFrame:
    """Rolling-origin one-step-ahead BACKTEST of the Holt forecaster with
    MASE against the seasonal-naive baseline — the evaluation a pipeline
    runs before trusting :func:`holt_forecast` to monitor a metric
    stream (Hyndman & Koehler 2006: MASE < 1 means the model beats the
    naive y_t = y_{t-m} predictor on the held-out points).

    For each of the last ``n_origins`` days, the Holt recurrence is
    re-fit on the series STRICTLY BEFORE that day (textbook init
    l_2 = y_2, b_2 = y_2 - y_1, fold from y_3 — the exact
    :func:`holt_from_daily` chain) and its one-step forecast
    ``l + b`` is scored against the actual; the seasonal-naive error
    at the same origin is ``|y_t - y_{t-m}|``.  Reported per group:

        mae_model = mean over origins of |forecast - actual|
        mae_naive = mean over origins of |y_t - y_{t-m}|
        mase      = mae_model / mae_naive   (NULL when the naive
                    errors are all zero)

    Distributed shape: identical to the forecast folds — ONE
    partial-aggregated (group, day) count shuffle does the corpus-sized
    work; the ``n_origins`` refits are bounded in-row ``F.aggregate``
    folds over prefixes of the day array (|groups| rows in flight, no
    window over raw events, no UDF, nothing on the driver).  At 100 TB
    the refit cost is |groups| * n_origins * |days| fused multiply-adds
    — dimension-sized.

    Determinism: alpha/beta must be exact binary fractions (asserted);
    every fold step, the error |(l + b) - y|, and the two mean divides
    are identical IEEE chains both engines (errors summed in origin
    order, one divide per mean, one divide for the ratio), so a SQL
    oracle unrolling the same ``n_origins`` folds replays the result
    bit-for-bit.  Groups shorter than ``n_origins + max(m, 2)`` days
    are excluded by both engines (every origin needs a >= 2-point
    training prefix and a t-m actual).
    """
    for p in (alpha, beta):
        assert (p * 1024) == int(p * 1024), (
            "alpha/beta must be exact binary fractions (k/1024) for the "
            "cross-engine determinism contract"
        )
    assert n_origins >= 1 and m >= 1
    daily = df.groupBy(*group_cols, day_col.alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    per = daily.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(F.struct("d", "n"))).alias("seq")
    )
    min_len = n_origins + max(m, 2)
    per = per.filter(F.size("seq") >= min_len)
    vals = F.transform(F.col("seq"), lambda s: s["n"].cast("double"))
    per = per.withColumn("_vals", vals)
    v = F.col("_vals")
    a, b1 = F.lit(float(alpha)), F.lit(float(beta))

    def step(acc, x):
        lv = a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
        # l' is written out twice (fold lambdas can't bind locals); the
        # oracle repeats the identical expression — same bits either way
        return F.struct(
            lv.alias("l"),
            (
                b1 * (a * x + (F.lit(1.0) - a) * (acc["l"] + acc["b"]) - acc["l"])
                + (F.lit(1.0) - b1) * acc["b"]
            ).alias("b"),
        )

    y1, y2 = F.element_at(v, 1), F.element_at(v, 2)
    errs, naives = [], []
    for h in range(1, n_origins + 1):
        # train on vals[1..o], predict index o+1 (1-based); the last
        # origin (h = n_origins) predicts the final day of the series
        o = F.size("_vals") - F.lit(n_origins + 1 - h)
        folded = F.aggregate(
            F.slice(v, 3, o - F.lit(2)),
            F.struct(y2.alias("l"), (y2 - y1).alias("b")),
            step,
        )
        actual = F.element_at(v, o + F.lit(1))
        errs.append(F.abs(folded["l"] + folded["b"] - actual))
        naives.append(F.abs(actual - F.element_at(v, o + F.lit(1 - m))))

    hd = F.lit(float(n_origins))
    mae_model = reduce(lambda x, y: x + y, errs) / hd
    mae_naive = reduce(lambda x, y: x + y, naives) / hd
    # raw doubles out, like holt_from_daily's level/trend/forecast: every
    # chain is bit-identical across engines, so no rounding is needed —
    # and the static round-over-div lint stays clean
    return per.select(
        *group_cols,
        F.size("_vals").cast("long").alias("n_days"),
        F.lit(n_origins).cast("long").alias("n_origins"),
        mae_model.alias("mae_model"),
        mae_naive.alias("mae_naive"),
        F.when(mae_naive > F.lit(0.0), mae_model / mae_naive).alias("mase"),
    )


def holt_winters_forecast(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
    m: int = 7,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
) -> DataFrame:
    """Per-group additive HOLT-WINTERS (triple exponential smoothing,
    Winters 1960) of daily counts: Holt's level/trend recurrence plus a
    rotating length-``m`` seasonal queue.  Same distributed shape as
    :func:`holt_forecast` — one partial-aggregated (group, day) count
    shuffle does the corpus-sized work; the fold is a bounded in-row
    ``F.aggregate`` whose accumulator is the (m+2)-element array
    ``[l, b, s_1..s_m]``."""
    daily = df.groupBy(*group_cols, day_col.alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return holt_winters_from_daily(
        daily, group_cols, m=m, alpha=alpha, beta=beta, gamma=gamma
    )


def holt_winters_from_daily(
    daily: DataFrame,
    group_cols: list[str],
    m: int = 7,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
) -> DataFrame:
    """Additive Holt-Winters over pre-aggregated (group..., d, n) rows.

        l_t = alpha*(y_t - s_{t-m}) + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
        s_t = gamma*(y_t - l_{t-1} - b_{t-1}) + (1-gamma)*s_{t-m}

    Initialization is the textbook two-season start (groups with fewer
    than 2m days are excluded by both engines): l_0 = mean(y_1..y_m),
    b_0 = mean of the m season-over-season diffs / m, s_i = y_i - l_0,
    folding from y_{m+1}.  Forecast is the m-step-ahead
    ``l_T + m*b_T + s_T``.

    Determinism: smoothing constants must be exact binary fractions
    (asserted) so each fold step is the same correctly-rounded IEEE
    chain on both engines; the two init means are left-associated
    ``F.aggregate`` sums each closed by ONE divide, which DuckDB's
    ``list_reduce`` replays in the identical order.  The seasonal queue
    rotates by array slicing — no index arithmetic on floats anywhere.
    """
    for p in (alpha, beta, gamma):
        assert (p * 1024) == int(p * 1024), (
            "alpha/beta/gamma must be exact binary fractions (k/1024) for "
            "the cross-engine determinism contract"
        )
    per = daily.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(F.struct("d", "n"))).alias("seq")
    )
    vals = F.transform(F.col("seq"), lambda s: s["n"].cast("double"))
    a, bb, g = F.lit(float(alpha)), F.lit(float(beta)), F.lit(float(gamma))
    one = F.lit(1.0)
    md = F.lit(float(m))

    fsum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    l0 = fsum(F.slice(vals, 1, m)) / md
    b0 = (
        fsum(
            F.zip_with(
                F.slice(vals, m + 1, m), F.slice(vals, 1, m), lambda x, y: x - y
            )
        )
        / md
        / md
    )
    per = (
        per.filter(F.size("seq") >= 2 * m)
        .withColumn("_vals", vals)
        .withColumn("_l0", l0)
        .withColumn("_b0", b0)
    )
    seasons0 = F.transform(
        F.slice(F.col("_vals"), 1, m), lambda x: x - F.col("_l0")
    )
    init = F.concat(F.array(F.col("_l0"), F.col("_b0")), seasons0)
    rest = F.slice(
        F.col("_vals"), m + 1, F.greatest(F.size("_vals") - m, F.lit(0))
    )

    def step(acc, y):
        l, b = F.element_at(acc, 1), F.element_at(acc, 2)
        s_old = F.element_at(acc, 3)
        lv = a * (y - s_old) + (one - a) * (l + b)
        # l' is re-derived inline for b' (fold lambdas can't bind
        # locals); the oracle repeats the identical expression
        bv = bb * (a * (y - s_old) + (one - a) * (l + b) - l) + (one - bb) * b
        sv = g * (y - l - b) + (one - g) * s_old
        return F.concat(
            F.array(lv, bv), F.slice(acc, 4, m - 1), F.array(sv)
        )

    folded = F.aggregate(rest, init, step)
    return per.select(
        *group_cols,
        F.size("_vals").cast("long").alias("n_days"),
        F.element_at(folded, 1).alias("level"),
        F.element_at(folded, 2).alias("trend"),
        F.element_at(folded, m + 2).alias("season_last"),
        (
            F.element_at(folded, 1)
            + md * F.element_at(folded, 2)
            + F.element_at(folded, m + 2)
        ).alias("forecast"),
    )


def cusum_changepoints(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
) -> DataFrame:
    """Per-group one-sided CUSUM drift detection (Page 1954) over daily
    counts: the cumulative sum of positive deviations from the group
    mean, reset at zero —

        s_t = max(0, s_{t-1} + (y_t - mean))

    — reporting the peak statistic and the day it peaked (the classic
    "when did this metric start running hot" monitor).  Same shape as
    the forecast folds: one partial-aggregated (group, day) count
    shuffle, then a bounded in-row fold whose accumulator is the
    4-element array [s, best, best_day_idx, idx].

    Determinism: counts are integral doubles, the mean is one exact
    integer-sum divide, each fold step is an identical IEEE chain both
    engines, the argmax takes the EARLIEST strict maximum, and a group
    that never deviates positively reports a NULL change day."""
    daily = df.groupBy(*group_cols, day_col.alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return cusum_from_daily(daily, group_cols)


def cusum_from_daily(
    daily: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """:func:`cusum_changepoints` over PRE-AGGREGATED (group..., d, n)
    daily counts — the entry point for incrementally-maintained rollups
    (count addition commutes with the fold input, so a streamed daily
    rollup feeds this unchanged; the decompose_from_daily contract)."""
    per = daily.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(F.struct("d", "n"))).alias("seq")
    )
    vals = F.transform(F.col("seq"), lambda s: s["n"].cast("double"))
    days = F.transform(F.col("seq"), lambda s: s["d"])
    mu = F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x) / F.size(
        "seq"
    ).cast("double")
    per = per.withColumn("_mu", mu).withColumn("_days", days).withColumn("_vals", vals)

    def step(acc, x):
        s, best = F.element_at(acc, 1), F.element_at(acc, 2)
        bidx, idx = F.element_at(acc, 3), F.element_at(acc, 4)
        # s' is re-derived inline (fold lambdas can't bind locals); the
        # oracle repeats the identical expression
        sp = F.greatest(F.lit(0.0), s + (x - F.col("_mu")))
        return F.array(
            sp,
            F.when(
                F.greatest(F.lit(0.0), s + (x - F.col("_mu"))) > best,
                F.greatest(F.lit(0.0), s + (x - F.col("_mu"))),
            ).otherwise(best),
            F.when(
                F.greatest(F.lit(0.0), s + (x - F.col("_mu"))) > best,
                idx + F.lit(1.0),
            ).otherwise(bidx),
            idx + F.lit(1.0),
        )

    folded = F.aggregate(
        F.col("_vals"),
        F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)),
        step,
    )
    per = per.withColumn("_st", folded)
    best, bidx = F.element_at("_st", 2), F.element_at("_st", 3)
    return per.select(
        *group_cols,
        F.size("_vals").cast("long").alias("n_days"),
        F.col("_mu").alias("mean_daily"),
        best.alias("cusum_max"),
        F.when(
            best > F.lit(0.0),
            F.date_format(
                F.element_at(F.col("_days"), bidx.cast("int")), "yyyy-MM-dd"
            ),
        ).alias("change_day"),
    )


def decompose_daily(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
    m: int = 7,
) -> DataFrame:
    """Classical additive TREND/SEASONAL/REMAINDER decomposition of
    per-group daily counts (the moving-average decomposition STL
    approximates; Cleveland et al. 1990 §2 baseline):

        trend_t    = centered MA(m) of the counts (NULL at the edges
                     where the window is short)
        seasonal_w = mean over the trend-covered days of weekday w of
                     (y_t − trend_t), NOT re-centered
        remainder  = y − trend − seasonal

    The window is row-centered over OBSERVED days — a gappy series
    should be grid-filled first (events_resample's LOCF shape).

    Distributed shape: one partial-aggregated (group, day) count
    shuffle; the MA is a bounded ±(m div 2) rows frame over a
    group-partitioned window (never global, never over raw events);
    the seasonal means are a second dimension-sized agg.

    Determinism: counts are integers, so m·trend = Σ window counts and
    m·cntw·seasonal = Σ (m·y − masum) are EXACT integer columns;
    every output is one exact-integer→double cast + one divide —
    bit-identical across engines, no float summation anywhere.
    Weekday is epoch-day arithmetic ((d − 1970-01-05) mod 7, Monday=0)
    — never a locale/engine-dependent dayofweek call.
    """
    daily = df.groupBy(*group_cols, day_col.alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return decompose_from_daily(daily, group_cols, m=m)


def decompose_from_daily(
    daily: DataFrame,
    group_cols: list[str],
    m: int = 7,
) -> DataFrame:
    """The decomposition over PRE-AGGREGATED (group_cols..., d, n) daily
    counts — the entry point for incrementally-maintained rollups
    (count addition commutes with every integer numerator here, so a
    streamed daily rollup feeds this unchanged; the holt_from_daily
    contract)."""
    assert m % 2 == 1, "centered MA needs an odd window"
    h = m // 2
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("d")
        .rowsBetween(-h, h)
    )
    # the MA frame is (group, day)-sized — a dimension — and feeds BOTH
    # the seasonal-mean aggregate and the output join; materialized once
    # so the caller's daily aggregation (and any upstream event scan)
    # runs a single time, not once per consumer
    t = daily.withColumn("_masum", F.sum("n").over(w)).withColumn(
        "_cnt", F.count("n").over(w)
    ).withColumn(
        "_wd",
        F.pmod(F.datediff(F.col("d"), F.lit("1970-01-05").cast("date")), F.lit(7)),
    ).localCheckpoint(eager=True)
    md = F.lit(m).cast("long")
    det = t.filter(F.col("_cnt") == m).select(
        *group_cols,
        "_wd",
        (md * F.col("n") - F.col("_masum")).alias("_det"),
    )
    seas = det.groupBy(*group_cols, "_wd").agg(
        F.sum("_det").alias("_snum"), F.count(F.lit(1)).alias("_cntw")
    )
    j = t.join(seas, [*group_cols, "_wd"], "left")
    trend = F.when(
        F.col("_cnt") == m,
        F.col("_masum").cast("double") / md.cast("double"),
    )
    seasonal = F.when(
        F.col("_snum").isNotNull(),
        F.col("_snum").cast("double") / (md * F.col("_cntw")).cast("double"),
    )
    remainder = F.when(
        (F.col("_cnt") == m) & F.col("_snum").isNotNull(),
        (
            md * F.col("_cntw") * F.col("n")
            - F.col("_cntw") * F.col("_masum")
            - F.col("_snum")
        ).cast("double")
        / (md * F.col("_cntw")).cast("double"),
    )
    return j.select(
        *group_cols,
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        remainder.alias("remainder"),
    )


def stl_anomalies(
    dec: DataFrame,
    group_cols: list[str],
    c: float = 3.0,
) -> DataFrame:
    """Residual ANOMALY FLAGS over a decomposition (the r11-verdict ask
    — the natural consumer of a trend/seasonal split the pipeline
    already trusts): a day is anomalous when its |remainder| exceeds
    ``c`` × the group's MAD (median absolute deviation of the
    remainders, the robust scale estimate that one outlier can't
    inflate the way σ can — Leys et al. 2013).

    ``dec`` is a :func:`decompose_daily` / :func:`decompose_from_daily`
    output; edge days with NULL remainder are excluded (they carry no
    residual to judge).

    Determinism: each remainder is ONE exact-integer→double divide
    (the decomposition's contract), so both engines hold bit-identical
    doubles; the median is computed EXPLICITLY — rank |r| with a
    (|r|, day) tie-broken group window, average the (t+1) div 2 and
    (t+2) div 2 ranked values as (lo + hi) / 2 (odd t selects one row
    twice: (x + x)/2 ≡ x) — never an engine median() whose even-count
    interpolation is implementation-defined.  The flag compares
    identical doubles against an identical c·MAD product: bit-exact
    decisions with NO new rounding site.

    Distributed shape: input is already (group, day)-sized (dimension
    rows, not events); one group-partitioned rank window + a two-row
    min/max agg per group.  No UDFs, no collects.

    Output: group_cols + (day, n, remainder, mad, is_anomaly).
    """
    r = dec.filter(F.col("remainder").isNotNull()).select(
        *group_cols,
        "day",
        "n",
        "remainder",
        F.abs(F.col("remainder")).alias("_ar"),
    )
    w = Window.partitionBy(*group_cols).orderBy("_ar", "day")
    wt = Window.partitionBy(*group_cols)
    ranked = r.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_t", F.count(F.lit(1)).over(wt)
    )
    mad = (
        ranked.filter(
            (F.col("_rn") == F.expr("(_t + 1) div 2"))
            | (F.col("_rn") == F.expr("(_t + 2) div 2"))
        )
        .groupBy(*group_cols)
        .agg(((F.min("_ar") + F.max("_ar")) / F.lit(2.0)).alias("mad"))
    )
    return (
        r.join(mad, group_cols)
        .select(
            *group_cols,
            "day",
            "n",
            "remainder",
            "mad",
            (F.col("_ar") > F.lit(c) * F.col("mad")).alias("is_anomaly"),
        )
    )


def sax_symbols(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
    w: int = 6,
    alphabet: int = 4,
) -> DataFrame:
    """SAX-style SYMBOLIC representation of per-group daily counts (Lin
    et al. 2003, rank-discretized variant): the day series is PAA-split
    into ``w`` equal segments (first w·(T div w) days), each segment's
    total is ranked within the group, and ranks map to an
    ``alphabet``-letter symbol — 'a' = lowest-volume segments.  The
    resulting word ("acdbba") is the shape signature time-series
    indexing/motif mining runs on instead of the raw floats.

    The classic SAX discretizes z-normalized PAA means against Gaussian
    breakpoints; the rank variant replaces mean/σ (float boundary
    decisions) with EXACT integer segment-sum comparisons — at the cost
    of an equal-depth rather than Gaussian alphabet — so every letter
    is an integer decision and the word is bit-identical by
    construction (no float appears anywhere).

    Distributed shape: one partial-aggregated (group, day) count
    shuffle, then w² integer comparisons over a bounded in-row array
    per group.  Groups shorter than ``w`` days are excluded.

    Output: group_cols + (n_days, n_segments, sax).
    """
    assert 2 <= alphabet <= 26 and w >= alphabet
    daily = df.groupBy(*group_cols, day_col.alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    per = daily.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(F.struct("d", "n"))).alias("seq")
    ).filter(F.size("seq") >= w)
    vals = F.transform(F.col("seq"), lambda s: s["n"].cast("long"))
    per = per.withColumn("_vals", vals)
    t = F.size("_vals")
    # exact integer T div w: T - (T mod w) is a multiple of w
    seg_len = ((t - F.pmod(t, F.lit(w))) / F.lit(w)).cast("int")
    per = per.withColumn("_sl", seg_len)
    sums = F.transform(
        F.sequence(F.lit(0), F.lit(w - 1)),
        lambda i: F.aggregate(
            F.slice(F.col("_vals"), i * F.col("_sl") + 1, F.col("_sl")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    per = per.withColumn("_sums", sums)
    letters = [chr(ord("a") + (r * alphabet) // w) for r in range(w)]
    lut = F.array(*[F.lit(ch) for ch in letters])

    def letter(i):
        # rank-1 = segments strictly before (sum, index)-lexicographically
        rm1 = F.size(
            F.filter(
                F.sequence(F.lit(1), F.lit(w)),
                lambda j: (
                    F.element_at(F.col("_sums"), j) < F.element_at(F.col("_sums"), i)
                )
                | (
                    (F.element_at(F.col("_sums"), j) == F.element_at(F.col("_sums"), i))
                    & (j < i)
                ),
            )
        )
        return F.element_at(lut, rm1 + 1)

    word = F.array_join(
        F.transform(F.sequence(F.lit(1), F.lit(w)), letter), ""
    )
    return per.select(
        *group_cols,
        t.cast("long").alias("n_days"),
        F.lit(w).cast("long").alias("n_segments"),
        word.alias("sax"),
    )


def daily_acf(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
    max_lag: int = 7,
) -> DataFrame:
    """Per-group AUTOCORRELATION function of daily counts at lags
    1..max_lag — the Box-Jenkins diagnostic that tells a pipeline
    whether a metric stream carries weekly structure worth a seasonal
    model (the events_holt_winters / events_stl decision input):

        acf_k = Σ_{t<=T−k} (y_t − ȳ)(y_{t+k} − ȳ) / Σ (y_t − ȳ)²

    Multiplying the centered terms by T clears the mean's denominator:
    with c_t = T·y_t − S (S = Σy, both exact integers) the statistic is
    Σ c_t·c_{t+k} / Σ c_t² — EXACT int64 numerator and denominator and
    ONE long→double divide per lag; the T² scale cancels.  A constant
    series (zero denominator) reports NULL.

    Distributed shape: the usual one partial-aggregated (group, day)
    count shuffle; the lag products fold over bounded in-row arrays.
    Bound: |c| ≤ T·max(y), so T²·max(y)²·T must stay under 2^63 —
    fine for daily dimensions (T ≤ ~3000, y ≤ ~10^6).

    Output: group_cols + (n_days, lag, acf), one row per lag.
    """
    daily = df.groupBy(*group_cols, day_col.alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    per = daily.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(F.struct("d", "n"))).alias("seq")
    ).filter(F.size("seq") > max_lag)
    vals = F.transform(F.col("seq"), lambda s: s["n"].cast("long"))
    per = per.withColumn("_vals", vals)
    t = F.size("_vals").cast("long")
    s = F.aggregate(F.col("_vals"), F.lit(0).cast("long"), lambda a, x: a + x)
    c = F.transform(F.col("_vals"), lambda y: t * y - s)
    per = per.withColumn("_c", c)
    den = F.aggregate(
        F.zip_with(F.col("_c"), F.col("_c"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    lags = []
    for k in range(1, max_lag + 1):
        ln = F.size("_c") - F.lit(k)
        num = F.aggregate(
            F.zip_with(
                F.slice(F.col("_c"), 1, ln),
                F.slice(F.col("_c"), F.lit(k + 1), ln),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        lags.append(
            F.struct(
                F.lit(k).cast("long").alias("lag"),
                F.when(den > 0, num.cast("double") / den.cast("double")).alias(
                    "acf"
                ),
            )
        )
    return per.select(
        *group_cols,
        F.size("_vals").cast("long").alias("n_days"),
        F.explode(F.array(*lags)).alias("_l"),
    ).select(*group_cols, "n_days", F.col("_l.lag").alias("lag"), F.col("_l.acf").alias("acf"))


def ljung_box(
    acf_frame: DataFrame,
    group_cols: list[str],
    k: int = 7,
    crit: float = 14.067140449340169,
) -> DataFrame:
    """Per-group LJUNG-BOX portmanteau test (Ljung & Box 1978) over a
    :func:`daily_acf` result — the single yes/no "is there ANY serial
    correlation up to lag K" gate that closes the Box-Jenkins loop
    daily_acf opens (per-lag eyeballing doesn't control joint size;
    Q does):

        Q = T·(T+2) · Σ_{j=1..K} r_j² / (T − j)   ~  χ²_K under H0

    ``crit`` defaults to the χ²₇ 95th percentile (14.0671404493…),
    PRECOMPUTED and injected as a literal per the engine-portability
    rule (never recompute a transcendental constant engine-side).

    Determinism: each r_j is daily_acf's exact-integer divide; Q is a
    FIXED left-associated IEEE chain over j = 1..K (explicit additions,
    not a group aggregate — summation order is part of the contract and
    the oracle spells out the identical chain), closed by round-at-6.
    A NULL r_j (constant series) propagates to NULL Q and NULL verdict.

    Distributed shape: one collect_list-free groupBy pivot of the
    K-row-per-group ACF frame.  Output: group_cols + (n_days, q_stat,
    lb_crit, significant).
    """
    m = acf_frame.groupBy(*group_cols).agg(
        F.max("n_days").alias("_t"),
        F.map_from_entries(F.collect_list(F.struct("lag", "acf"))).alias("_m"),
    )
    t = F.col("_t").cast("double")
    chain = None
    for j in range(1, k + 1):
        r = F.element_at(F.col("_m"), F.lit(j).cast("long"))
        term = (r * r) / (t - F.lit(float(j)))
        chain = term if chain is None else chain + term
    q = F.round((t * (t + F.lit(2.0))) * chain, 6)
    return m.select(
        *group_cols,
        F.col("_t").alias("n_days"),
        q.alias("q_stat"),
        F.lit(crit).alias("lb_crit"),
        (q > F.lit(crit)).alias("significant"),
    )


def mann_kendall_trend(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
) -> DataFrame:
    """Per-group Mann-Kendall TREND TEST + Theil-Sen slope over daily
    counts (Mann 1945, Kendall 1975; Sen 1968) — the nonparametric "is
    this metric drifting, and how fast" monitor that needs no
    distributional assumption (the robust companion to the CUSUM
    level-shift detector):

        S     = Σ_{i<j} sgn(y_j − y_i)          (integer)
        tau_a = S / (T·(T−1)/2)                 (one divide)
        slope = median over pairs of (y_j − y_i) / (d_j − d_i)
                (days are epoch-day integers, so gaps weigh correctly)

    Determinism: S and every pairwise comparison are exact integers;
    each pairwise slope is ONE int→double divide (bit-identical), the
    slope median sorts those identical doubles and averages the two
    middle ranks as (lo + hi)/2 — the explicit stl_anomalies median
    contract, never an engine median().

    Distributed shape: one partial-aggregated (group, day) count
    shuffle, then T² bounded in-row work over the day array (T = days
    per group — a dimension, not row volume).  No UDFs, no collects.

    Output: group_cols + (n_days, s_stat, tau_a, sen_slope).
    """
    daily = df.groupBy(*group_cols, day_col.alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    per = daily.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(F.struct("d", "n"))).alias("seq")
    ).filter(F.size("seq") >= 2)
    per = per.withColumn(
        "_v", F.transform(F.col("seq"), lambda s: s["n"].cast("long"))
    ).withColumn(
        "_e",
        F.transform(
            F.col("seq"),
            lambda s: F.datediff(s["d"], F.lit("1970-01-01").cast("date")).cast(
                "long"
            ),
        ),
    )
    t = F.size("_v")

    def el(col, i):
        return F.element_at(F.col(col), i.cast("int"))

    sign = lambda a, b: (  # noqa: E731
        F.when(a > b, F.lit(1)).when(a < b, F.lit(-1)).otherwise(F.lit(0))
    ).cast("long")
    s_stat = F.aggregate(
        F.sequence(F.lit(1), t - 1),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.aggregate(
            F.sequence(i + 1, t),
            F.lit(0).cast("long"),
            lambda a2, j: a2 + sign(el("_v", j), el("_v", i)),
        ),
    )
    slopes = F.array_sort(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), t - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, t),
                    lambda j: (el("_v", j) - el("_v", i)).cast("double")
                    / (el("_e", j) - el("_e", i)).cast("double"),
                ),
            )
        )
    )
    per = per.withColumn("_s", s_stat).withColumn("_sl", slopes)
    p = F.size("_sl")
    lo = F.element_at("_sl", ((p + 1) / 2).cast("int"))
    hi = F.element_at("_sl", ((p + 2) / 2).cast("int"))
    return per.select(
        *group_cols,
        t.cast("long").alias("n_days"),
        F.col("_s").alias("s_stat"),
        (
            F.col("_s").cast("double")
            / (t.cast("long") * (t.cast("long") - 1) / 2).cast("double")
        ).alias("tau_a"),
        ((lo + hi) / F.lit(2.0)).alias("sen_slope"),
    )


def kaplan_meier(
    per_subject: DataFrame,
    group_cols: list[str],
    dur_col: str = "dur",
    event_col: str = "evt",
) -> DataFrame:
    """Per-group Kaplan-Meier SURVIVAL CURVE (Kaplan & Meier 1958) over
    right-censored durations — the retention/churn estimator: given one
    row per subject with an integer duration and an event flag (1 =
    the terminal event was observed, 0 = censored — still alive when
    observation ended),

        S(t) = Π_{s ≤ t} (n_s − d_s) / n_s

    with n_s the subjects still at risk just before time s and d_s the
    events at s (censored subjects at s count at-risk AT s — the
    standard deaths-before-censorings convention).

    Distributed shape: one (group, subject) collapse does the
    corpus-sized work, a second collapse to (group, duration) makes the
    fold input |groups|·|distinct durations| — a dimension; the curve
    itself is T² bounded in-row folds.  No UDFs, no collects, no global
    window.

    Determinism: n_s, d_s, c_s are exact integers; each survival factor
    is ONE exact-integer-valued-double divide (d_s = 0 gives n/n = 1.0
    exactly, so zero-event times are harmless inside the product) and
    the product folds in DURATION ORDER — the events_ewma order-pinned
    IEEE-chain contract, no rounding site.

    Output: group_cols + (duration, n_risk, n_events, n_censored,
    survival), one row per duration with at least one event.
    """
    g = per_subject.groupBy(*group_cols, dur_col).agg(
        F.sum(F.col(event_col).cast("long")).alias("_d"),
        (F.count(F.lit(1)) - F.sum(F.col(event_col).cast("long"))).alias("_c"),
    )
    per = g.groupBy(*group_cols).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(dur_col).alias("t"), "_d", "_c"))
        ).alias("seq")
    )
    n_total = F.aggregate(
        F.col("seq"), F.lit(0).cast("long"), lambda acc, s: acc + s["_d"] + s["_c"]
    )
    per = per.withColumn("_n", n_total)

    def before(i):
        # subjects removed strictly before the i-th duration (1-indexed)
        return F.aggregate(
            F.slice(F.col("seq"), 1, i - 1),
            F.lit(0).cast("long"),
            lambda acc, s: acc + s["_d"] + s["_c"],
        )

    def surv(i):
        # fold [at_risk, survival] through the first i durations; both
        # accumulator slots read the PRE-step acc, so the factor uses
        # the at-risk count just before each time
        return F.element_at(
            F.aggregate(
                F.slice(F.col("seq"), 1, i),
                F.array(F.col("_n").cast("double"), F.lit(1.0)),
                lambda acc, s: F.array(
                    F.element_at(acc, 1) - s["_d"] - s["_c"],
                    F.element_at(acc, 2)
                    * (
                        (F.element_at(acc, 1) - s["_d"].cast("double"))
                        / F.element_at(acc, 1)
                    ),
                ),
            ),
            2,
        )

    rows = per.select(
        *group_cols,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("seq")),
                lambda i: F.struct(
                    F.element_at(F.col("seq"), i)["t"].alias("t"),
                    F.element_at(F.col("seq"), i)["_d"].alias("d"),
                    F.element_at(F.col("seq"), i)["_c"].alias("c"),
                    (F.col("_n") - before(i)).alias("nr"),
                    surv(i).alias("s"),
                ),
            )
        ).alias("e"),
    )
    return rows.filter(F.col("e.d") > 0).select(
        *group_cols,
        F.col("e.t").cast("long").alias("duration"),
        F.col("e.nr").cast("long").alias("n_risk"),
        F.col("e.d").cast("long").alias("n_events"),
        F.col("e.c").cast("long").alias("n_censored"),
        F.col("e.s").alias("survival"),
    )


def seasonal_strength(
    dec: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Per-group TREND and SEASONAL STRENGTH of a decomposition
    (Hyndman & Athanasopoulos, *Forecasting: Principles and Practice*
    §STL features; Wang, Smith & Hyndman 2006):

        F_T = max(0, 1 − Var(R) / Var(T + R))     (detrended strength)
        F_S = max(0, 1 − Var(R) / Var(S + R))     (deseasonalized)

    — the 0..1 scores a pipeline reads to decide whether a series
    deserves a trend/seasonal model at all (the events_acf question,
    answered on the decomposition's own terms).

    ``dec`` is a :func:`decompose_daily` / :func:`decompose_from_daily`
    output; only days with a full window (non-NULL remainder) enter.

    Determinism: every component value is already a bit-identical
    single-divide double (the decomposition contract); the sums behind
    each mean and variance fold in DAY ORDER over bounded in-row
    arrays (the events_ewma order-pinned IEEE-chain contract), and the
    closing 1 − ratio / max(0, ·) chain is identical on both engines.
    No rounding site.  Groups need ≥ 2 qualifying days; zero-variance
    denominators emit NULL.

    Output: group_cols + (n_days, f_trend, f_season).
    """
    r = dec.filter(F.col("remainder").isNotNull()).select(
        *group_cols,
        "day",
        F.col("remainder").alias("_r"),
        (F.col("trend") + F.col("remainder")).alias("_tr"),
        (F.col("seasonal") + F.col("remainder")).alias("_sr"),
    )
    per = r.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(F.struct("day", "_r", "_tr", "_sr"))).alias(
            "seq"
        )
    ).filter(F.size("seq") >= 2)
    n = F.size("seq").cast("double")

    def arr(field):
        return F.transform(F.col("seq"), lambda s: s[field])

    def mean(a):
        return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x) / n

    def var(a, m):
        return (
            F.aggregate(a, F.lit(0.0), lambda acc, x: acc + (x - m) * (x - m)) / n
        )

    per = (
        per.withColumn("_mr", mean(arr("_r")))
        .withColumn("_mtr", mean(arr("_tr")))
        .withColumn("_msr", mean(arr("_sr")))
        .withColumn("_vr", var(arr("_r"), F.col("_mr")))
        .withColumn("_vtr", var(arr("_tr"), F.col("_mtr")))
        .withColumn("_vsr", var(arr("_sr"), F.col("_msr")))
    )
    return per.select(
        *group_cols,
        F.size("seq").cast("long").alias("n_days"),
        F.when(
            F.col("_vtr") > 0,
            F.greatest(F.lit(0.0), F.lit(1.0) - F.col("_vr") / F.col("_vtr")),
        ).alias("f_trend"),
        F.when(
            F.col("_vsr") > 0,
            F.greatest(F.lit(0.0), F.lit(1.0) - F.col("_vr") / F.col("_vsr")),
        ).alias("f_season"),
    )


def pettitt_changepoint(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
) -> DataFrame:
    """Per-group PETTITT single-changepoint test (Pettitt 1979) over the
    daily count series — the nonparametric "WHEN did this metric shift"
    locator that complements the detectors already in the family:
    CUSUM assumes a known target mean, Mann-Kendall asks IF the series
    drifts; Pettitt points at the most likely abrupt-change day with no
    distributional assumption.

        U_t = Σ_{i≤t} Σ_{j>t} sgn(x_j − x_i)      (exact integer)
        K   = max_t |U_t|,  t* = argmax (first on ties)

    computed via the O(T²) recurrence U_t = U_{t−1} + V_t with
    V_t = Σ_j sgn(x_j − x_t), rather than the naive O(T³) rescan.
    U_{t*} > 0 means the right segment dominates (upward shift).
    The p-value approximation 2·exp(−6K²/(T³+T²)) is a transcendental —
    deliberately NOT computed engine-side (the ndcg_discounts contract:
    no engine-side transcendentals); callers compare K against the
    published critical values.

    Determinism: every V_t, U_t, K and the argmax position are exact
    integers (first-occurrence ties pinned); the segment means are ONE
    int→double divide each — bit-identical, no rounding site.

    Distributed shape: one partial-aggregated (group, day) count
    shuffle, then T²-bounded in-row folds over the day array (T = days
    per group — a dimension, not row volume).  No UDFs, no collects, no
    global window.

    Output: group_cols + (n_days, k_stat, u_star, cp_day — last day of
    the pre-change segment as yyyy-MM-dd, mean_before, mean_after).
    """
    daily = df.groupBy(*group_cols, day_col.alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    per = (
        daily.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list(F.struct("d", "n"))).alias("seq"))
        .filter(F.size("seq") >= 3)
    )
    per = per.withColumn(
        "_v", F.transform(F.col("seq"), lambda s: s["n"].cast("long"))
    )
    t = F.size("_v")

    def el(col, i):
        return F.element_at(F.col(col), i.cast("int"))

    sign = lambda a, b: (  # noqa: E731
        F.when(a > b, F.lit(1)).when(a < b, F.lit(-1)).otherwise(F.lit(0))
    ).cast("long")
    # V_t = sum_j sgn(x_j - x_t); U_t = prefix sum of V (exact recurrence)
    per = per.withColumn(
        "_vt",
        F.transform(
            F.sequence(F.lit(1), t),
            lambda tt: F.aggregate(
                F.sequence(F.lit(1), t),
                F.lit(0).cast("long"),
                lambda a, j: a + sign(el("_v", j), el("_v", tt)),
            ),
        ),
    ).withColumn(
        "_u",
        F.transform(
            F.sequence(F.lit(1), t - 1),
            lambda tt: F.aggregate(
                F.sequence(F.lit(1), tt),
                F.lit(0).cast("long"),
                lambda a, s: a + el("_vt", s),
            ),
        ),
    )
    absu = F.transform(F.col("_u"), lambda u: F.abs(u))
    per = (
        per.withColumn("_k", F.array_max(absu))
        .withColumn("_ts", F.array_position(absu, F.col("_k")))
    )
    tstar = F.col("_ts")
    sum_to = lambda hi: F.aggregate(  # noqa: E731
        F.sequence(F.lit(1), hi),
        F.lit(0).cast("long"),
        lambda a, i: a + el("_v", i),
    )
    return per.select(
        *group_cols,
        t.cast("long").alias("n_days"),
        F.col("_k").alias("k_stat"),
        el("_u", tstar).alias("u_star"),
        F.date_format(el("seq", tstar)["d"], "yyyy-MM-dd").alias("cp_day"),
        (sum_to(tstar).cast("double") / tstar.cast("double")).alias("mean_before"),
        (
            (sum_to(t) - sum_to(tstar)).cast("double")
            / (t.cast("long") - tstar).cast("double")
        ).alias("mean_after"),
    )


def croston_forecast(
    demand: DataFrame,
    group_cols: list[str],
    day_col: str = "d",
    qty_col: str = "q",
    alpha: float = 0.125,
) -> DataFrame:
    """CROSTON intermittent-demand forecast (Croston 1972) with the
    Syntetos-Boylan bias correction (SBA, 2005) — the estimator for
    series that are mostly ZEROS (slow-moving parts, sporadic demand),
    where SES/Holt over calendar days chase zeros to a useless mean:
    smooth the nonzero demand SIZE z and the inter-demand INTERVAL p
    separately, each by simple exponential smoothing at the demand
    POINTS only; the per-period rate is z/p (SBA multiplies by
    1 − α/2).

    Input: PRE-AGGREGATED nonzero demand days (group_cols..., day,
    qty > 0) — zero days are represented by the day GAPS, so the
    upstream rollup never materializes them (the sparsity is the point
    at 100 TB).

    Initialization (pinned): z₀ = first demand, p₀ = first
    inter-demand gap; the fold runs over demand points 2..T with
        z' = α·q_t + (1−α)·z,   p' = α·i_t + (1−α)·p
    — groups need ≥ 2 demand days.

    Determinism: α must be an exact binary fraction (the holt_from_daily
    contract) so α and 1−α are exact doubles; gaps and quantities are
    exact-integer-valued doubles; the fold is an order-pinned IEEE
    chain the oracle replays verbatim (list accumulator), and the close
    is one divide (+ one exact multiply for SBA) — bit-identical.

    Distributed shape: one partial-aggregated (group, day) collapse,
    then T-bounded in-row folds over the demand-day array.  No UDFs, no
    collects, no global window.

    Output: group_cols + (n_demand_days, level_z, interval_p,
    forecast_per_day, sba_per_day).
    """
    assert (alpha * 1024) == int(alpha * 1024), (
        "alpha must be an exact binary fraction (k/1024) for the "
        "cross-engine determinism contract"
    )
    a, oma = float(alpha), 1.0 - float(alpha)
    sba = 1.0 - float(alpha) / 2.0
    per = (
        demand.groupBy(*group_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(day_col).alias("d"), qty_col))
            ).alias("seq")
        )
        .filter(F.size("seq") >= 2)
    )
    epoch = F.transform(
        F.col("seq"),
        lambda s: F.datediff(s["d"], F.lit("1970-01-01").cast("date")).cast("long"),
    )
    qs = F.transform(F.col("seq"), lambda s: s[qty_col].cast("double"))
    per = per.withColumn("_e", epoch).withColumn("_q", qs)
    t = F.size("seq")

    def el(col, i):
        return F.element_at(F.col(col), i.cast("int"))

    steps = F.transform(
        F.sequence(F.lit(2), t),
        lambda tt: F.struct(
            el("_q", tt).alias("q"),
            (el("_e", tt) - el("_e", tt - 1)).cast("double").alias("i"),
        ),
    )
    init = F.struct(
        F.element_at("_q", 1).alias("z"),
        (F.element_at("_e", 2) - F.element_at("_e", 1)).cast("double").alias("p"),
    )
    folded = F.aggregate(
        steps,
        init,
        lambda acc, x: F.struct(
            (F.lit(a) * x["q"] + F.lit(oma) * acc["z"]).alias("z"),
            (F.lit(a) * x["i"] + F.lit(oma) * acc["p"]).alias("p"),
        ),
    )
    per = per.withColumn("_f", folded)
    rate = F.col("_f")["z"] / F.col("_f")["p"]
    return per.select(
        *group_cols,
        t.cast("long").alias("n_demand_days"),
        F.col("_f")["z"].alias("level_z"),
        F.col("_f")["p"].alias("interval_p"),
        rate.alias("forecast_per_day"),
        (F.lit(sba) * rate).alias("sba_per_day"),
    )


def runs_test(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
) -> DataFrame:
    """Per-group WALD-WOLFOWITZ RUNS TEST of the daily count series —
    the randomness audit that catches what the level detectors can't
    name: too FEW runs above/below the median means regime clustering
    (the series lingers on one side — trends, shifts), too MANY means
    oscillation (negative autocorrelation, e.g. batch-skip patterns).
    The final sanity gate after Pettitt/Mann-Kendall come back clean.

    Days are scored above (1) / below (0) the EXPLICIT two-rank median
    (ties to the median are dropped — the standard convention);
    R = 1 + sign changes in day order, and with a = 2·n₁·n₀:

        z = (n·(R−1) − a) · sqrt(n−1) / sqrt(a·(a−n))

    (the n²-cleared form of (R − E[R])/σ_R with E[R] = 1 + a/n,
    σ²_R = a(a−n)/(n²(n−1))).

    Determinism: the median is an exact half-integer double, every
    above/below decision compares exact values, R, n₁, n₀, a and the
    numerator are exact int64, and the close is two IEEE sqrts + one
    multiply + one divide in fixed order — bit-identical, no rounding
    site.  One-sided or constant series (a ≤ n) emit NULL z.

    Distributed shape: one (group, day) count shuffle, then T-bounded
    in-row folds.  No UDFs, no collects, no global window.

    Output: group_cols + (n_days, n_kept, n_above, n_below, n_runs, z).
    """
    daily = df.groupBy(*group_cols, day_col.alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    per = (
        daily.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list(F.struct("d", "n"))).alias("seq"))
        .filter(F.size("seq") >= 2)
    )
    per = per.withColumn(
        "_v", F.transform(F.col("seq"), lambda s: s["n"].cast("long"))
    ).withColumn("_sv", F.array_sort(F.transform(F.col("seq"), lambda s: s["n"].cast("long"))))
    t = F.size("_v")
    lo = F.element_at("_sv", ((t + 1) / 2).cast("int"))
    hi = F.element_at("_sv", ((t + 2) / 2).cast("int"))
    med = (lo + hi) / F.lit(2.0)
    signs = F.filter(
        F.transform(
            F.col("_v"),
            lambda x: F.when(x.cast("double") > med, F.lit(1))
            .when(x.cast("double") < med, F.lit(0))
            .otherwise(F.lit(-1)),
        ),
        lambda s: s >= 0,
    )
    per = per.withColumn("_s", signs)
    m = F.size("_s")

    def el(col, i):
        return F.element_at(F.col(col), i.cast("int"))

    changes = F.aggregate(
        F.sequence(F.lit(2), m),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(el("_s", i) != el("_s", i - 1), F.lit(1)).otherwise(F.lit(0)),
    )
    n1 = F.aggregate(
        F.col("_s"), F.lit(0).cast("long"), lambda acc, s: acc + s
    )
    per = (
        per.filter(m >= 2)
        .withColumn("_r", changes + F.lit(1))
        .withColumn("_n1", n1)
        .withColumn("_m", m.cast("long"))
    )
    n0 = F.col("_m") - F.col("_n1")
    a = F.lit(2) * F.col("_n1") * n0
    num = F.col("_m") * (F.col("_r") - F.lit(1)) - a
    return per.select(
        *group_cols,
        t.cast("long").alias("n_days"),
        F.col("_m").alias("n_kept"),
        F.col("_n1").alias("n_above"),
        n0.alias("n_below"),
        F.col("_r").alias("n_runs"),
        F.when(
            a > F.col("_m"),
            (num.cast("double") * F.sqrt((F.col("_m") - F.lit(1)).cast("double")))
            / F.sqrt((a * (a - F.col("_m"))).cast("double")),
        ).alias("z"),
    )


def esd_outliers(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
    rounds: int = 3,
) -> DataFrame:
    """Generalized-ESD style ITERATIVE outlier extraction (Rosner 1983)
    over the daily count series — the masking-resistant companion to
    the single-pass detectors (a huge spike inflates the std enough to
    hide a second spike; ESD re-studentizes after REMOVING each
    extreme, so round 2 sees round 1's spike gone): per group,
    ``rounds`` iterations of "take the max studentized deviation, then
    recompute".  The t-quantile significance ladder is deliberately NOT
    computed engine-side (transcendental); callers compare scores to
    published λ_i values.

    Determinism: the per-round argmax is decided on the EXACT integer
    |n·x − S| (argmax |x − mean| needs no divide — n and S = Σx are
    int64), ties to the earliest day; the reported score closes as
    |n·x − S| / (n·sqrt((n·Q − S²)/(n·(n−1)))) — an int→double + sqrt
    + multiply + divide fixed chain, bit-identical.  Groups need
    ≥ rounds + 2 days; a constant remainder (n·Q = S²) scores NULL.

    Distributed shape: one (group, day) count shuffle, then bounded
    in-row folds (rounds × T work per group).  No UDFs, no collects,
    no global window.

    Output: one row per (group, round): group_cols + (esd_rank, day,
    n_events, esd_score).
    """
    daily = df.groupBy(*group_cols, day_col.alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    per = (
        daily.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list(F.struct("d", "n"))).alias("seq"))
        .filter(F.size("seq") >= rounds + 2)
    )
    per = per.withColumn(
        "_v", F.transform(F.col("seq"), lambda s: s["n"].cast("long"))
    )
    t = F.size("_v")

    def el(col, i):
        return F.element_at(F.col(col), i.cast("int"))

    def _mk_active(prev_cols):
        # single-arg closure factory: F.filter feeds a 2-arg lambda the
        # element INDEX as its second argument (the documented pitfall)
        def pred(i):
            c = F.lit(True)
            for p in prev_cols:
                c = c & (i != F.col(p))
            return c

        return pred

    def _mk_dev(n_name, s_name):
        def dev(i):
            return F.abs(F.col(n_name) * el("_v", i) - F.col(s_name))

        return dev

    def _mk_cmp(dev_fn, max_name):
        def cmp_(i):
            return dev_fn(i) == F.col(max_name)

        return cmp_

    for r in range(1, rounds + 1):
        prev = [f"_i{j}" for j in range(1, r)]
        per = per.withColumn(
            f"_a{r}", F.filter(F.sequence(F.lit(1), t), _mk_active(list(prev)))
        )
        a = F.col(f"_a{r}")
        per = (
            per.withColumn(f"_n{r}", F.size(a).cast("long"))
            .withColumn(
                f"_s{r}",
                F.aggregate(
                    a, F.lit(0).cast("long"), lambda acc, i: acc + el("_v", i)
                ),
            )
            .withColumn(
                f"_q{r}",
                F.aggregate(
                    a,
                    F.lit(0).cast("long"),
                    lambda acc, i: acc + el("_v", i) * el("_v", i),
                ),
            )
        )
        n_r, s_r, q_r = (F.col(f"_n{r}"), F.col(f"_s{r}"), F.col(f"_q{r}"))

        dev = _mk_dev(f"_n{r}", f"_s{r}")
        mname = f"_m{r}"
        per = per.withColumn(
            f"_m{r}", F.array_max(F.transform(a, dev))
        ).withColumn(
            f"_i{r}",
            F.element_at(
                F.filter(a, _mk_cmp(dev, mname)), 1
            ),
        )
        var = (n_r * q_r - s_r * s_r).cast("double") / (
            n_r * (n_r - F.lit(1))
        ).cast("double")
        per = per.withColumn(
            f"_sc{r}",
            F.when(
                n_r * q_r - s_r * s_r > 0,
                F.col(f"_m{r}").cast("double")
                / (n_r.cast("double") * F.sqrt(var)),
            ),
        ).withColumn(
            f"_day{r}",
            F.date_format(el("seq", F.col(f"_i{r}"))["d"], "yyyy-MM-dd"),
        ).withColumn(f"_x{r}", el("_v", F.col(f"_i{r}")))
    arr = F.array(
        *[
            F.struct(
                F.lit(r).cast("long").alias("esd_rank"),
                F.col(f"_day{r}").alias("day"),
                F.col(f"_x{r}").alias("n_events"),
                F.col(f"_sc{r}").alias("esd_score"),
            )
            for r in range(1, rounds + 1)
        ]
    )
    return per.select(*group_cols, F.explode(arr).alias("s")).select(
        *group_cols, "s.esd_rank", "s.day", "s.n_events", "s.esd_score"
    )


def seasonal_mann_kendall(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
    period_col: Column,
) -> DataFrame:
    """SEASONAL Mann-Kendall trend test (Hirsch & Slack 1984) over daily
    counts — the weekly-seasonality-robust form of
    :func:`mann_kendall_trend`: a strong weekday cycle floods the plain
    test with cross-weekday comparisons that are seasonality, not
    trend; here S sums ONLY within-season (per-weekday) pairwise signs,

        S = Σ_w S_w,   Var = Σ_w [n_w(n_w−1)(2n_w+5)
                                  − Σ_ties t(t−1)(2t+5)] / 18
        z = S / sqrt(Var)

    with the full tie correction per season, and the seasonal Sen slope
    is the pooled two-rank median of within-season pairwise slopes.
    Season labels only partition (they never enter arithmetic), so
    engine dow conventions can't matter.

    Determinism: every pairwise sign, S_w, and the 18-scaled variance
    numerator are exact int64; z closes with one int→double, one
    divide-by-18, one sqrt, one divide — fixed chain; each pairwise
    slope is one int→double divide and the pooled median is the
    explicit two-rank average — bit-exact throughout.

    Distributed shape: one (group, season, day) count shuffle, per-track
    T² bounded in-row folds (7 tracks per group), one final collapse.
    No UDFs, no collects, no global window.

    Output: group_cols + (n_days, s_stat, var18_num, z, sen_slope).
    """
    daily = df.groupBy(
        *group_cols, period_col.alias("w"), day_col.alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    per = daily.groupBy(*group_cols, "w").agg(
        F.sort_array(F.collect_list(F.struct("d", "n"))).alias("seq")
    )
    per = per.withColumn(
        "_v", F.transform(F.col("seq"), lambda s: s["n"].cast("long"))
    ).withColumn(
        "_e",
        F.transform(
            F.col("seq"),
            lambda s: F.datediff(s["d"], F.lit("1970-01-01").cast("date")).cast(
                "long"
            ),
        ),
    )
    t = F.size("_v")

    def el(col, i):
        return F.element_at(F.col(col), i.cast("int"))

    sign = lambda a, b: (  # noqa: E731
        F.when(a > b, F.lit(1)).when(a < b, F.lit(-1)).otherwise(F.lit(0))
    ).cast("long")
    # guarded fold domains: F.sequence(a, b) with b < a yields a DESCENDING
    # range, so single-day tracks must get an empty domain, not a guard
    # around the fold (when() does not prevent evaluation)
    dom_pairs = F.when(t >= 2, F.sequence(F.lit(1), t - 1)).otherwise(
        F.array().cast("array<int>")
    )
    dom_run = F.when(t >= 2, F.sequence(F.lit(2), t)).otherwise(
        F.array().cast("array<int>")
    )
    s_w = F.when(
        t >= 2,
        F.aggregate(
            dom_pairs,
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.aggregate(
                F.sequence(i + 1, t),
                F.lit(0).cast("long"),
                lambda a2, j: a2 + sign(el("_v", j), el("_v", i)),
            ),
        ),
    ).otherwise(F.lit(0).cast("long"))
    # tie-corrected variance numerator (x18): n(n-1)(2n+5) - sum over tie
    # groups t(t-1)(2t+5); tie sizes from an in-row sorted-run scan
    sv = F.array_sort(F.col("_v"))
    run = F.aggregate(
        dom_run,
        F.struct(
            F.lit(1).cast("long").alias("run"), F.lit(0).cast("long").alias("acc")
        ),
        lambda st, i: F.struct(
            F.when(
                F.element_at(sv, i.cast("int"))
                == F.element_at(sv, (i - 1).cast("int")),
                st["run"] + 1,
            )
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.when(
                F.element_at(sv, i.cast("int"))
                == F.element_at(sv, (i - 1).cast("int")),
                st["acc"],
            )
            .otherwise(
                st["acc"]
                + st["run"] * (st["run"] - 1) * (F.lit(2) * st["run"] + 5)
            )
            .alias("acc"),
        ),
        lambda st: st["acc"]
        + st["run"] * (st["run"] - 1) * (F.lit(2) * st["run"] + 5),
    )
    var_w = F.when(
        t >= 2,
        t.cast("long") * (t.cast("long") - 1) * (F.lit(2) * t.cast("long") + 5)
        - run,
    ).otherwise(F.lit(0).cast("long"))
    slopes_w = F.when(
        t >= 2,
        F.flatten(
            F.transform(
                dom_pairs,
                lambda i: F.transform(
                    F.sequence(i + 1, t),
                    lambda j: (el("_v", j) - el("_v", i)).cast("double")
                    / (el("_e", j) - el("_e", i)).cast("double"),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<double>"))
    per = (
        per.withColumn("_sw", s_w)
        .withColumn("_vw", var_w)
        .withColumn("_slw", slopes_w)
        .withColumn("_t", t.cast("long"))
    )
    g = per.groupBy(*group_cols).agg(
        F.sum("_t").alias("n_days"),
        F.sum("_sw").alias("s_stat"),
        F.sum("_vw").alias("var18_num"),
        F.array_sort(F.flatten(F.collect_list("_slw"))).alias("_sl"),
    )
    p = F.size("_sl")
    lo = F.element_at("_sl", ((p + 1) / 2).cast("int"))
    hi = F.element_at("_sl", ((p + 2) / 2).cast("int"))
    return g.select(
        *group_cols,
        "n_days",
        "s_stat",
        "var18_num",
        F.when(
            F.col("var18_num") > 0,
            F.col("s_stat").cast("double")
            / F.sqrt(F.col("var18_num").cast("double") / F.lit(18.0)),
        ).alias("z"),
        F.when(p > 0, (lo + hi) / F.lit(2.0)).alias("sen_slope"),
    )


def theil_sen_fit(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
) -> DataFrame:
    """THEIL-SEN line fit + GOODNESS OF FIT over the daily counts — the
    closing half of the robust-trend story: events_trend's
    :func:`mann_kendall_trend` answers "is there drift and how fast";
    this fits the full robust line (Sen slope + the median-of-residuals
    intercept, Conover's form) and scores it with MAE and R² against
    the mean baseline, so a pipeline can decide whether the trend model
    EXPLAINS the series or merely exists.

    Determinism: the slope is the two-rank median of exact
    one-divide pairwise slopes; the intercept is the two-rank median of
    (y_i − slope·e_i) doubles (identical multiply-subtract chains);
    residual folds run in DAY ORDER (the events_ewma order-pinned
    contract); SS_tot uses the exact integer numerator T·Σy² − (Σy)²
    with one divide — bit-exact throughout.

    Distributed shape: one (group, day) count shuffle, T²-bounded
    in-row folds.  No UDFs, no collects, no global window.

    Output: group_cols + (n_days, sen_slope, intercept, mae, r2).
    """
    daily = df.groupBy(*group_cols, day_col.alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    per = (
        daily.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list(F.struct("d", "n"))).alias("seq"))
        .filter(F.size("seq") >= 3)
    )
    per = per.withColumn(
        "_v", F.transform(F.col("seq"), lambda s: s["n"].cast("long"))
    ).withColumn(
        "_e",
        F.transform(
            F.col("seq"),
            lambda s: F.datediff(s["d"], F.lit("1970-01-01").cast("date")).cast(
                "long"
            ),
        ),
    )
    t = F.size("_v")

    def el(col, i):
        return F.element_at(F.col(col), i.cast("int"))

    slopes = F.array_sort(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), t - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, t),
                    lambda j: (el("_v", j) - el("_v", i)).cast("double")
                    / (el("_e", j) - el("_e", i)).cast("double"),
                ),
            )
        )
    )
    per = per.withColumn("_sl", slopes)
    p = F.size("_sl")
    slope = (
        F.element_at("_sl", ((p + 1) / 2).cast("int"))
        + F.element_at("_sl", ((p + 2) / 2).cast("int"))
    ) / F.lit(2.0)
    per = per.withColumn("_slope", slope)
    resid0 = F.array_sort(
        F.transform(
            F.sequence(F.lit(1), t),
            lambda i: el("_v", i).cast("double")
            - F.col("_slope") * el("_e", i).cast("double"),
        )
    )
    per = per.withColumn("_r0", resid0)
    b = (
        F.element_at("_r0", ((t + 1) / 2).cast("int"))
        + F.element_at("_r0", ((t + 2) / 2).cast("int"))
    ) / F.lit(2.0)
    per = per.withColumn("_b", b)
    res = lambda i: (  # noqa: E731
        el("_v", i).cast("double")
        - (F.col("_slope") * el("_e", i).cast("double") + F.col("_b"))
    )
    sae = F.aggregate(
        F.sequence(F.lit(1), t),
        F.lit(0.0),
        lambda acc, i: acc + F.abs(res(i)),
    )
    ssr = F.aggregate(
        F.sequence(F.lit(1), t),
        F.lit(0.0),
        lambda acc, i: acc + res(i) * res(i),
    )
    sy = F.aggregate(
        F.col("_v"), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    sy2 = F.aggregate(
        F.col("_v"), F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    tot_num = (t.cast("long") * sy2 - sy * sy).cast("double")
    per = (
        per.withColumn("_sae", sae)
        .withColumn("_ssr", ssr)
        .withColumn("_tot", tot_num)
    )
    return per.select(
        *group_cols,
        t.cast("long").alias("n_days"),
        F.col("_slope").alias("sen_slope"),
        F.col("_b").alias("intercept"),
        (F.col("_sae") / t.cast("double")).alias("mae"),
        F.when(
            F.col("_tot") > 0,
            F.lit(1.0)
            - F.col("_ssr") / (F.col("_tot") / t.cast("double")),
        ).alias("r2"),
    )


def daily_pacf(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
    max_lag: int = 7,
) -> DataFrame:
    """Per-group PARTIAL AUTOCORRELATION function of daily counts at lags
    1..max_lag via the Durbin-Levinson recursion (Box & Jenkins 1970) —
    the AR-order diagnostic beside :func:`daily_acf`: ACF says "is there
    memory?", PACF says "how many AR lags explain it" (the cutoff picks
    p for an AR(p) model of the metric stream).

        phi_{1,1} = r_1
        phi_{k,k} = (r_k − Σ_j phi_{k−1,j}·r_{k−j})
                    / (1 − Σ_j phi_{k−1,j}·r_j)
        phi_{k,j} = phi_{k−1,j} − phi_{k,k}·phi_{k−1,k−j}

    Determinism: each r_k is daily_acf's ONE divide of exact int64 sums
    (identical doubles on both engines), and the recursion is a FIXED
    finite IEEE chain over them — unrolled here and in the oracle with
    the identical textual operation order (j ascending, left-assoc), so
    every phi is bit-identical.  Each level's coefficients are
    checkpointed real columns (one tiny job per level over
    group-cardinality rows), which keeps Catalyst's expression trees
    linear instead of exponentially inlined.

    Distributed shape: one (group, day) partial-agg collapse, in-row
    array folds for the r_k, then max_lag − 1 driver-free levels over a
    group-cardinality frame.  Output: group_cols + (n_days, lag, pacf).
    """
    daily = df.groupBy(*group_cols, day_col.alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    per = (
        daily.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list(F.struct("d", "n"))).alias("seq"))
        .filter(F.size("seq") > max_lag)
    )
    vals = F.transform(F.col("seq"), lambda s: s["n"].cast("long"))
    per = per.withColumn("_vals", vals)
    t = F.size("_vals").cast("long")
    s = F.aggregate(F.col("_vals"), F.lit(0).cast("long"), lambda a, x: a + x)
    per = per.withColumn("_c", F.transform(F.col("_vals"), lambda y: t * y - s))
    den = F.aggregate(
        F.zip_with(F.col("_c"), F.col("_c"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    cols = [F.size("_vals").cast("long").alias("n_days")]
    for k in range(1, max_lag + 1):
        ln = F.size("_c") - F.lit(k)
        num = F.aggregate(
            F.zip_with(
                F.slice(F.col("_c"), 1, ln),
                F.slice(F.col("_c"), F.lit(k + 1), ln),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        cols.append(
            F.when(den > 0, num.cast("double") / den.cast("double")).alias(f"_r{k}")
        )
    lev = per.select(*group_cols, *cols).localCheckpoint(eager=True)
    lev = lev.withColumn("_p1_1", F.col("_r1")).localCheckpoint(eager=True)
    for k in range(2, max_lag + 1):
        num_terms = None
        den_terms = None
        for j in range(1, k):
            nt = F.col(f"_p{k-1}_{j}") * F.col(f"_r{k-j}")
            dt = F.col(f"_p{k-1}_{j}") * F.col(f"_r{j}")
            num_terms = nt if num_terms is None else num_terms + nt
            den_terms = dt if den_terms is None else den_terms + dt
        lev = lev.withColumn(
            f"_p{k}_{k}",
            (F.col(f"_r{k}") - num_terms) / (F.lit(1.0) - den_terms),
        )
        for j in range(1, k):
            lev = lev.withColumn(
                f"_p{k}_{j}",
                F.col(f"_p{k-1}_{j}") - F.col(f"_p{k}_{k}") * F.col(f"_p{k-1}_{k-j}"),
            )
        lev = lev.localCheckpoint(eager=True)
    out = F.array(
        *[
            F.struct(
                F.lit(k).cast("long").alias("lag"),
                F.round(F.col(f"_p{k}_{k}"), 6).alias("pacf"),
            )
            for k in range(1, max_lag + 1)
        ]
    )
    return lev.select(*group_cols, "n_days", F.explode(out).alias("_l")).select(
        *group_cols, "n_days", F.col("_l.lag").alias("lag"), F.col("_l.pacf").alias("pacf")
    )


def safety_stock(
    df: DataFrame,
    group_cols: list[str],
    day_col: Column,
    qty_col: str,
    lead_days: int = 7,
    z: float = 1.645,
) -> DataFrame:
    """Per-group SAFETY STOCK and REORDER POINT from daily demand (the
    textbook King/normal-approximation formula, deterministic lead
    time):

        ss  = z · σ_daily · sqrt(L)
        rop = mean_daily · L + ss

    — the inventory planning number next to parts_croston's intermittent
    forecast (Croston says WHAT demand to expect; this says how much
    buffer a service level z needs).

    Determinism: daily demands are exact integer sums, mean and variance
    come from the n²-cleared integer identity (T·ΣQ² − S²), σ is ONE
    sqrt over the exact-integer double (sqrt is IEEE-correctly-rounded
    on both engines), and ss/rop are fixed left-associated IEEE chains
    over those values with injected literals — bit-exact with one
    closing round each.

    Distributed shape: one (group, day) partial-agg collapse, one group
    aggregate.  No windows, no UDFs.

    Output: group_cols + (n_days, total_qty, mean_daily, sigma_daily,
    safety_stock, reorder_point).
    """
    daily = df.groupBy(*group_cols, day_col.alias("_d")).agg(
        F.sum(F.col(qty_col).cast("long")).alias("_q")
    )
    g = daily.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("_q").alias("total_qty"),
        F.sum(F.col("_q") * F.col("_q")).alias("_q2"),
    )
    t = F.col("n_days").cast("double")
    mean = F.col("total_qty").cast("double") / t
    sigma = (
        F.sqrt(
            (F.col("n_days") * F.col("_q2") - F.col("total_qty") * F.col("total_qty"))
            .cast("double")
        )
        / t
    )
    ss = F.lit(z) * sigma * F.sqrt(F.lit(float(lead_days)))
    return g.select(
        *group_cols,
        "n_days",
        "total_qty",
        F.round(mean, 6).alias("mean_daily"),
        F.round(sigma, 6).alias("sigma_daily"),
        F.round(ss, 6).alias("safety_stock"),
        F.round(mean * F.lit(float(lead_days)) + ss, 6).alias("reorder_point"),
    )
