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

from pyspark.sql import Column, DataFrame, Window
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


def iqr_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Per-group Tukey-fence OUTLIER audit of an integer value column
    (Tukey 1977): quartiles via the TUKEY HINGES (median of the lower /
    upper half, the half including the median when n is odd), fences at
    Q1 − k·IQR and Q3 + k·IQR, and the count of rows outside each fence
    — the box-plot rule a data-quality pass runs before trusting a
    numeric column.

    Determinism is trivial by construction: values are integers, each
    hinge is a two-rank average (lo + hi) / 2 — an EXACT double ending
    in .0 or .5 — so IQR, the k·IQR product (k = 1.5 is itself exact
    binary), both fences, and every fence comparison are exact; no
    rounding site, no summation order anywhere.  The value at a given
    sorted rank is well-defined for a multiset, so no id tie-break is
    needed.

    Hinge positions (1-indexed): m = (n+1) div 2, Q1 averages ranks
    ((m+1) div 2, (m+2) div 2), Q3 mirrors them at (n+1−hi, n+1−lo).

    Distributed shape: one group-partitioned rank window over the
    (group, value) rows + one partial-agg groupBy + one fence
    broadcast-join back.  No UDFs, no collects.

    Output: group_cols + (n, q1, q3, iqr, fence_lo, fence_hi, n_low,
    n_high).
    """
    wt = Window.partitionBy(*group_cols)
    v = F.col(value_col).cast("long")
    ranked = df.select(*group_cols, v.alias("_v")).select(
        *group_cols,
        "_v",
        F.row_number().over(
            Window.partitionBy(*group_cols).orderBy("_v")
        ).alias("_rn"),
        F.count(F.lit(1)).over(wt).alias("_n"),
    )
    lo1, hi1 = F.expr("((_n + 1) div 2 + 1) div 2"), F.expr("((_n + 1) div 2 + 2) div 2")
    lo3, hi3 = F.col("_n") + 1 - hi1, F.col("_n") + 1 - lo1
    is_q1 = (F.col("_rn") == lo1) | (F.col("_rn") == hi1)
    is_q3 = (F.col("_rn") == lo3) | (F.col("_rn") == hi3)
    hinges = ranked.groupBy(*group_cols).agg(
        F.max("_n").alias("n"),
        F.min(F.when(is_q1, F.col("_v"))).alias("_l1"),
        F.max(F.when(is_q1, F.col("_v"))).alias("_h1"),
        F.min(F.when(is_q3, F.col("_v"))).alias("_l3"),
        F.max(F.when(is_q3, F.col("_v"))).alias("_h3"),
    )
    q1 = (F.col("_l1") + F.col("_h1")).cast("double") / F.lit(2.0)
    q3 = (F.col("_l3") + F.col("_h3")).cast("double") / F.lit(2.0)
    fences = hinges.select(
        *group_cols,
        "n",
        q1.alias("q1"),
        q3.alias("q3"),
        (q3 - q1).alias("iqr"),
        (q1 - F.lit(k) * (q3 - q1)).alias("fence_lo"),
        (q3 + F.lit(k) * (q3 - q1)).alias("fence_hi"),
    )
    return (
        ranked.join(F.broadcast(fences), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.max("n").alias("n"),
            F.max("q1").alias("q1"),
            F.max("q3").alias("q3"),
            F.max("iqr").alias("iqr"),
            F.max("fence_lo").alias("fence_lo"),
            F.max("fence_hi").alias("fence_hi"),
            F.sum(
                F.when(F.col("_v").cast("double") < F.col("fence_lo"), 1).otherwise(0)
            ).cast("long").alias("n_low"),
            F.sum(
                F.when(F.col("_v").cast("double") > F.col("fence_hi"), 1).otherwise(0)
            ).cast("long").alias("n_high"),
        )
    )


def gini_concentration(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    top_den: int = 10,
) -> DataFrame:
    """Per-group GINI coefficient + top-decile share of a non-negative
    integer value column — the concentration audit (is one customer /
    source / tenant dominating the group?) a pipeline runs before
    trusting per-group aggregates, and the inequality summary behind
    every Lorenz curve:

        gini = Σ_i (2i − n − 1)·x_(i) / (n · Σx)      (x rank-ordered)

    Determinism: ranks come from a fully tie-broken group window (the
    weighted sum is permutation-invariant within ties, so the tie-break
    changes nothing); each term (2i − n − 1)·x_i is exact int64
    (< 2⁵³ for n ≤ ~3M and values ≤ ~10¹⁰ cents — bounds documented),
    the sum is an exact DECIMAL(38,0), and the close is one
    decimal→double cast + one double multiply for n·Σx + ONE divide —
    the embedding_covariance lossless-sum contract.  The top-share is
    a second exact-integer conditional sum with one divide.  All-zero
    groups emit NULL.

    Distributed shape: one group-partitioned rank window + one size
    join + one partial-agg groupBy — identical to the established
    confusion-cut shape.  No UDFs, no collects.

    Output: group_cols + (n, total, gini, top_share).
    """
    ws = Window.partitionBy(*group_cols).orderBy(F.col(value_col), F.col(id_col))
    ranked = df.select(
        *group_cols,
        F.col(value_col).cast("long").alias("_x"),
        F.row_number().over(ws).alias("_rn"),
    )
    sized = ranked.join(
        ranked.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n")), group_cols
    )
    coef = F.lit(2) * F.col("_rn") - F.col("n") - F.lit(1)
    in_top = F.col("_rn") > F.col("n") - F.expr(f"n div {top_den}")
    g = sized.groupBy(*group_cols).agg(
        F.max("n").alias("n"),
        F.sum("_x").alias("total"),
        F.sum((coef * F.col("_x")).cast("decimal(38,0)")).alias("_w"),
        F.sum(F.when(in_top, F.col("_x")).otherwise(F.lit(0))).alias("_t"),
    )
    dbl = lambda c: c.cast("double")  # noqa: E731
    return g.select(
        *group_cols,
        "n",
        "total",
        F.when(
            F.col("total") > 0,
            dbl(F.col("_w")) / (dbl(F.col("n")) * dbl(F.col("total"))),
        ).alias("gini"),
        F.when(F.col("total") > 0, dbl(F.col("_t")) / dbl(F.col("total"))).alias(
            "top_share"
        ),
    )


def chisq_uniformity(
    df: DataFrame,
    group_cols: list[str],
    cat_col: Column,
    alias: str = "cat",
) -> DataFrame:
    """Per-group CHI-SQUARE uniformity statistic over a categorical
    column — the load-balance / seasonality-flatness audit (are events
    spread evenly over weekdays?  rows over shards?) with k−1 degrees
    of freedom against the uniform null over the k OBSERVED categories.

    The n² clearing makes it one divide:  with o_c the category counts
    and n = Σo, E = n/k, so

        chi2 = Σ (o − n/k)² / (n/k)  =  (k·Σo² − n²) / n

    Determinism: k, Σo² and n² are exact int64 (documented bound:
    n ≤ ~3M per group keeps n² < 2⁵³ so the int→double close is exact;
    counts per category ≤ 3·10⁷ keep k·Σo² in int64 far beyond that),
    ONE final divide — bit-exact, no rounding site.

    Distributed shape: one partial-aggregated (group, category) count
    shuffle (row volume = distinct categories), one final groupBy.  No
    windows at all, no UDFs, no collects.

    Output: group_cols + (k_cats, n, chi2).
    """
    o = df.groupBy(*group_cols, cat_col.alias(alias)).agg(
        F.count(F.lit(1)).alias("_o")
    )
    g = o.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("k_cats"),
        F.sum("_o").alias("n"),
        F.sum(F.col("_o") * F.col("_o")).alias("_o2"),
    )
    return g.select(
        *group_cols,
        "k_cats",
        "n",
        (
            (F.col("k_cats") * F.col("_o2") - F.col("n") * F.col("n")).cast("double")
            / F.col("n").cast("double")
        ).alias("chi2"),
    )


def round_amount_audit(
    df: DataFrame,
    group_cols: list[str],
    cents_col: str,
    modulus: int = 100,
) -> DataFrame:
    """ROUND-AMOUNT forensic audit (the Nigrini number-duplication /
    round-number test): per group, the count and share of amounts that
    are exact multiples of ``modulus`` cents, with a binomial z-score
    against the GLOBAL round-amount rate — groups whose fabricated or
    hand-keyed amounts cluster on round numbers light up (|z| large),
    the classic invoice-fraud screen next to the Benford digit tests.

    Determinism: counts are exact integers, the global rate p and the
    group share are each ONE long→double divide, and
    z = (r − n·p)/sqrt(n·p·(1−p)) is a fixed IEEE chain over those
    identical doubles (sqrt is correctly rounded by IEEE-754 on both
    engines) — bit-exact with one closing round.  Degenerate global
    rates p ∈ {0, 1} (modulus 1, or all/none round) yield NULL z
    instead of NaN — there is no binomial spread to standardize by.

    Distributed shape: one partial-agg groupBy for the groups, one
    1-row global aggregate broadcast-crossed back.  No windows, no
    UDFs, no collects.

    Output: group_cols + (n, n_round, share, expected_round, z).
    """
    is_round = (F.pmod(F.col(cents_col).cast("long"), F.lit(modulus)) == 0).cast(
        "long"
    )
    per = df.select(*group_cols, is_round.alias("_r")).groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"), F.sum("_r").alias("n_round")
    )
    glob = per.agg(
        F.sum("n").alias("_gn"), F.sum("n_round").alias("_gr")
    ).select((F.col("_gr").cast("double") / F.col("_gn").cast("double")).alias("_p"))
    np_ = F.col("n").cast("double") * F.col("_p")
    return per.crossJoin(F.broadcast(glob)).select(
        *group_cols,
        "n",
        "n_round",
        (F.col("n_round").cast("double") / F.col("n").cast("double")).alias("share"),
        F.round(np_, 6).alias("expected_round"),
        F.when(
            (F.col("_p") > 0.0) & (F.col("_p") < 1.0),
            (F.col("n_round").cast("double") - np_)
            / F.sqrt(np_ * (F.lit(1.0) - F.col("_p"))),
        ).alias("z"),
    )


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    cents_col: str,
) -> DataFrame:
    """Per-group MEDIAN-ABSOLUTE-DEVIATION outlier audit (Hampel
    identifier, the robust cousin of iqr_outliers): median and MAD of an
    integer-cents column, plus the count of rows whose robust z-score
    |x − med| / (1.4826·MAD) exceeds 3 — the outlier rule that, unlike
    mean/stddev, survives the outliers it is hunting.

    Determinism — every decision is EXACT INTEGER: the median is the
    two-middle-rank sum med2 = lo + hi (2× median in cents, exact int),
    deviations dev2 = |2·x − med2| are ints, MAD rides as
    mad4 = lo' + hi' (4× MAD in cents, exact int), and the outlier
    comparison clears all denominators —

        |x − med| > 3·1.4826·MAD   ⇔   20000·dev2 > 44478·mad4

    — so no float influences any count; the two output floats are one
    divide each (med2/200, mad4/400).

    Distributed shape: rows collapse to (group, value) CELLS first, so
    every rank lookup is a running-count threshold over value-cardinality
    cells (the events_percentiles_exact shape) — never a row-volume
    window.  Thin wrapper over :func:`mad_outliers_from_cells`.

    Output: group_cols + (n, median, mad, n_outliers).
    """
    cells = (
        df.select(*group_cols, F.col(cents_col).cast("long").alias("_v"))
        .groupBy(*group_cols, "_v")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    return mad_outliers_from_cells(cells, group_cols, val_col="_v", cnt_col="_cnt")


def mad_outliers_from_cells(
    cells: DataFrame,
    group_cols: list[str],
    val_col: str = "_v",
    cnt_col: str = "_cnt",
) -> DataFrame:
    """:func:`mad_outliers` from pre-aggregated (group, value, count)
    CELLS — the count-additive form a streamed rollup maintains (cells
    merge by addition, so a drained incremental rollup feeds this and
    shares the batch oracle verbatim, the sketch_ams_stream contract).
    The two-middle-rank picks are running-count threshold lookups on the
    cell table: the value at sorted rank r is the smallest value whose
    cumulative count reaches r, identical to the row-rank formulation.
    Same output columns and exact arithmetic as mad_outliers."""

    def two_middle(frame: DataFrame, vc: str, cc: str, out: str) -> DataFrame:
        w = Window.partitionBy(*group_cols).orderBy(vc)
        cum = frame.withColumn("_cum", F.sum(cc).over(w))
        tot = frame.groupBy(*group_cols).agg(F.sum(cc).alias("_n"))
        j = cum.join(tot, group_cols)
        lo_thr = F.expr("(_n + 1) div 2")
        hi_thr = F.expr("(_n + 2) div 2")
        return j.groupBy(*group_cols).agg(
            F.max("_n").alias("_n"),
            (
                F.min(F.when(F.col("_cum") >= lo_thr, F.col(vc)))
                + F.min(F.when(F.col("_cum") >= hi_thr, F.col(vc)))
            ).alias(out),
        )

    # value-cardinality cells, materialized once: un-checkpointed, the
    # upstream cell pipeline re-ran under every consumer (median window,
    # totals, deviation cells — 19 physical base scans for events_mad);
    # same for the deviation cells and the |groups|-row stat frames,
    # each of which feeds 2-3 downstream joins
    vals = cells.select(
        *group_cols, F.col(val_col).alias("_v"), F.col(cnt_col).alias("_cnt")
    ).localCheckpoint(eager=True)
    med = (
        two_middle(vals, "_v", "_cnt", "med2")
        .select(*group_cols, F.col("_n").alias("n"), "med2")
        .localCheckpoint(eager=True)
    )
    dev = (
        vals.join(F.broadcast(med.select(*group_cols, "med2")), group_cols)
        .select(
            *group_cols,
            F.abs(F.lit(2) * F.col("_v") - F.col("med2")).alias("_d"),
            "_cnt",
        )
        .groupBy(*group_cols, "_d")
        .agg(F.sum("_cnt").alias("_cnt"))
        .localCheckpoint(eager=True)
    )
    mad = two_middle(dev, "_d", "_cnt", "mad4").select(*group_cols, "mad4")
    stats = med.join(mad, group_cols).localCheckpoint(eager=True)
    outl = (
        dev.join(F.broadcast(stats.select(*group_cols, "mad4")), group_cols)
        .filter(F.lit(20000) * F.col("_d") > F.lit(44478) * F.col("mad4"))
        .groupBy(*group_cols)
        .agg(F.sum("_cnt").alias("n_outliers"))
    )
    return stats.join(outl, group_cols, "left").select(
        *group_cols,
        "n",
        (F.col("med2").cast("double") / F.lit(200.0)).alias("median"),
        (F.col("mad4").cast("double") / F.lit(400.0)).alias("mad"),
        F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
    )


def simpson_diversity(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
) -> DataFrame:
    """Per-group SIMPSON DIVERSITY of a categorical key (Simpson 1949 /
    Gini-Simpson; "effective number" per Hill 1973): with c_k the key
    counts and N = Σc_k,

        gini_simpson   = 1 − Σc_k²/N²   (chance two draws differ)
        effective_keys = N²/Σc_k²       (Hill number of order 2)

    — the exact log-free diversity measures (entropy needs engine
    transcendentals; these need none), the audit behind "is this event
    stream dominated by a handful of users?".

    Determinism: counts and squared sums are exact integers carried in
    lossless DECIMAL(38,0) (N² at 100-TB cardinalities overflows int64),
    each output is ONE decimal→double divide (correctly rounded on both
    engines) with one closing round.

    Distributed shape: one (group, key) partial-agg collapse, then one
    group aggregate over key-cardinality rows.  No windows, no UDFs.

    Output: group_cols + (n, n_keys, gini_simpson, effective_keys).
    """
    cells = df.groupBy(*group_cols, key_col).agg(F.count(F.lit(1)).alias("c"))
    return simpson_diversity_from_cells(cells, group_cols, cnt_col="c")


def simpson_diversity_from_cells(
    cells: DataFrame,
    group_cols: list[str],
    cnt_col: str = "c",
) -> DataFrame:
    """:func:`simpson_diversity` from pre-aggregated (group, key, count)
    CELLS — the count-additive form a streamed rollup maintains (cells
    merge by addition, so a drained incremental rollup feeds this and
    shares the batch oracle verbatim, the sketch_ams_stream contract).
    Same output columns and exact arithmetic as simpson_diversity."""
    d38 = "decimal(38,0)"
    g = cells.groupBy(*group_cols).agg(
        F.sum(cnt_col).alias("n"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.col(cnt_col).cast(d38) * F.col(cnt_col).cast(d38)).alias("_s2"),
    )
    n2 = F.col("n").cast(d38) * F.col("n").cast(d38)
    return g.select(
        *group_cols,
        "n",
        "n_keys",
        ((n2 - F.col("_s2")).cast("double") / n2.cast("double")).alias(
            "gini_simpson"
        ),
        (n2.cast("double") / F.col("_s2").cast("double")).alias("effective_keys"),
    )
