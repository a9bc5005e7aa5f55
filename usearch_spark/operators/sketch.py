"""Mergeable frequency sketches: count-min and Bloom membership.

The reference engine's analytics are exact; at 100 TB the first thing a
pipeline adds is sub-linear summaries — a count-min sketch for heavy-hitter
frequency estimation and a Bloom filter for membership pruning before an
expensive join.  Both are built here as plain DataFrames (rows of
(seed, bucket, cnt) / (bucket,)), which makes them:

  - one partial-aggregated groupBy to build (a shuffle of at most
    depth x width rows, independent of input size);
  - mergeable across partitions/days by summing buckets (CMS) or unioning
    bits (Bloom) — the property that makes sketches work in a
    map-reduce/streaming setting;
  - deterministic: buckets are md5-prefix strings of "seed:key", so an
    external SQL engine reproduces the sketch bit-for-bit (the correctness
    gate replays sketch construction AND estimation in DuckDB).

Estimate error is the textbook bound: CMS overestimates by at most
eps * N with probability 1 - delta for width = e/eps, depth = ln(1/delta);
Bloom false-positive rate ~ (1 - e^{-kn/m})^k.  Tests pin the
over-estimate-only invariant rather than exact error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(seed: Column, key: Column, prefix_len: int) -> Column:
    """Deterministic bucket id: first ``prefix_len`` hex chars of
    md5("<seed>:<key>") — a string bucket, so no engine-specific
    hex-to-int conversion is needed to replicate it."""
    return F.substring(
        F.md5(F.concat(seed.cast("string"), F.lit(":"), key.cast("string"))), 1, prefix_len
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    prefix_len: int = 2,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over ``key_col``: rows (seed, bucket, cnt),
    one row per non-empty cell.  ``prefix_len`` hex chars give a width of
    16^prefix_len buckets (2 -> 256).  ``weight_col`` makes it a weighted
    frequency sketch (sums instead of counts); NULL weights contribute 0
    (coalesced), matching the unweighted form's count-every-row
    semantics instead of silently dropping nullable-weight rows.

    Cost shape: explode by depth (a cheap JVM-side array explode), one
    partial-aggregated groupBy on (seed, bucket) — the shuffle carries at
    most depth x 16^prefix_len rows no matter how large the input is.
    """
    seeds = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed")
    w = (
        F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
        if weight_col
        else F.lit(1).cast("long")
    )
    return (
        df.select(F.col(key_col).alias("k"), w.alias("w"))
        .select("k", "w", seeds)
        .select("seed", _bucket(F.col("seed"), F.col("k"), prefix_len).alias("bucket"), "w")
        .groupBy("seed", "bucket")
        .agg(F.sum("w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    prefix_len: int = 2,
) -> DataFrame:
    """Point-query the sketch for every row of ``probes``: the estimate is
    min over seeds of the addressed cell (0 if any cell is empty).
    Returns (key_col, est) — est >= true count always (CMS never
    underestimates).  The sketch side is tiny (<= depth x width rows), so
    the join broadcasts; probing N keys is one map-side join, no shuffle
    of the probe side."""
    keys = probes.select(F.col(key_col).alias("k")).dropDuplicates(["k"])
    seeds = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed")
    addressed = keys.select("k", seeds).select(
        "k", "seed", _bucket(F.col("seed"), F.col("k"), prefix_len).alias("bucket")
    )
    joined = addressed.join(F.broadcast(sketch), ["seed", "bucket"], "left").select(
        "k", F.coalesce(F.col("cnt"), F.lit(0)).alias("cell")
    )
    return joined.groupBy("k").agg(F.min("cell").alias("est")).select(
        F.col("k").alias(key_col), "est"
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    hashes: int = 3,
    prefix_len: int = 3,
) -> DataFrame:
    """Bloom filter as a DataFrame of set bit ids: rows (bucket,), one per
    distinct set bit across ``hashes`` md5-prefix hash functions (bit
    space = 16^prefix_len).  Mergeable by union; size is bounded by the
    bit space regardless of input."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(hashes)])).alias("seed")
    return (
        df.select(F.col(key_col).alias("k"))
        .select("k", seeds)
        .select(_bucket(F.col("seed"), F.col("k"), prefix_len).alias("bucket"), F.col("seed"))
        .select(F.concat(F.col("seed").cast("string"), F.lit("/"), F.col("bucket")).alias("bit"))
        .dropDuplicates(["bit"])
    )


def bloom_maybe_contains(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    hashes: int = 3,
    prefix_len: int = 3,
) -> DataFrame:
    """Membership test: a probe key 'maybe' belongs iff ALL ``hashes`` of
    its bits are set (no false negatives; false positives at the textbook
    rate).  Returns (key_col, maybe int).  The bloom side broadcasts —
    this is the join-pruning shape: filter a huge probe side with a tiny
    sketch before the real join."""
    keys = probes.select(F.col(key_col).alias("k")).dropDuplicates(["k"])
    seeds = F.explode(F.array(*[F.lit(i) for i in range(hashes)])).alias("seed")
    addressed = keys.select("k", seeds).select(
        "k",
        F.concat(
            F.col("seed").cast("string"),
            F.lit("/"),
            _bucket(F.col("seed"), F.col("k"), prefix_len),
        ).alias("bit"),
    )
    hit = addressed.join(F.broadcast(bloom), "bit", "left_semi").groupBy("k").agg(
        F.count(F.lit(1)).alias("n_set")
    )
    return keys.join(hit, "k", "left").select(
        F.col("k").alias(key_col),
        (F.coalesce(F.col("n_set"), F.lit(0)) == hashes).cast("int").alias("maybe"),
    )


def hll_sketch(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """HyperLogLog distinct-count sketch as a DataFrame: one register row
    (group..., reg, rho) per (group, register) — at most 16 rows per
    group no matter how many keys flow in.  MERGEABLE by construction:
    sketches over any partition of the data combine via
    :func:`hll_merge` (max per register), the defining property that lets
    per-day / per-shard sketches roll up without touching raw data.

    Registers come from the shared portable core (functions/hll.py): the
    key is cast to its canonical string and md5-hashed, so any engine —
    and a SQL oracle — reproduces the register values bit-for-bit
    (unlike Spark's built-in approx_count_distinct, whose sketch is
    engine-private; see the approx_distinct query's tolerance-flag gate
    for that one).  Shuffle carries only register rows: the groupBy
    partial-aggregates map-side to <= 16 rows per group per partition.
    """
    from usearch_spark.functions.hll import hll_reg_sql, hll_rho_sql

    base = df.select(*group_cols, F.col(key_col).cast("string").alias("_k"))
    return (
        base.select(
            *group_cols,
            F.expr(hll_reg_sql("_k")).cast("int").alias("reg"),
            F.expr(hll_rho_sql("_k")).cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register rows down to ``group_cols`` (possibly []): max per
    register — the HLL union.  Rolling per-shard sketches into a global
    one is this single tiny aggregation."""
    return sketch.groupBy(*group_cols, "reg").agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Distinct-count estimates from register rows: (group..., est) with
    est rounded at 6.  One double division per group over an exact
    integer register sum; the linear-counting small-range branch uses
    precomputed constants (functions/hll.hll_estimate_sql), so the
    estimate is engine-portable and hash-gateable."""
    from usearch_spark.functions.hll import HLL_SHIFT, hll_estimate_sql

    agg = sketch.groupBy(*group_cols).agg(
        F.expr(f"sum(shiftleft(CAST(1 AS BIGINT), {HLL_SHIFT} - rho))").alias(
            "s_present"
        ),
        F.count(F.lit(1)).alias("nreg"),
    )
    return agg.select(
        *group_cols, F.round(F.expr(hll_estimate_sql()), 6).alias("est")
    )


# --- mergeable log-histogram quantile sketch ----------------------------


def log_hist_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    cents: int = 100,
) -> DataFrame:
    """Mergeable quantile sketch as a log-scaled histogram: values are
    fixed-pointed (floor(x·cents + 0.5)), then binned by (bit length,
    top-3-bits) — ~4 sub-buckets per octave, <= ~4·log2(max) rows per
    group regardless of input size, giving a guaranteed relative-error
    quantile summary: the estimate is the bin LOWER bound, and a bin at
    sub-bucket width 1/4 octave spans up to 25% above that bound (the
    widest case is sub3=4, lower bound 2^b, next boundary 1.25·2^b), so
    the worst-case relative error is 25% by construction.  The quantile cousin of the HLL/CMS/
    Bloom family: counts are plain integers, so sketches MERGE by bin
    addition (merge-of-parts == sketch-of-whole exactly), and every
    decision — fixed-point, bit length via the binary string, shifts —
    is exact integer arithmetic any engine reproduces bit-for-bit.

    Returns (group_cols..., blen, sub3, cnt): sub3 is the top 3 bits
    (in [4, 7] for blen >= 3, the raw value below), so (blen, sub3)
    ascending is exactly bin-lower-bound ascending.  Non-positive
    values land in bin (0, 0) — count them, estimate them as 0."""
    v = F.floor(F.col(value_col).cast("double") * F.lit(float(cents)) + F.lit(0.5))
    # expressions below go through selectExpr so the shift amounts can be
    # column-valued (F.shiftright wants literals)
    return (
        df.select(*group_cols, v.alias("_v"))
        .selectExpr(
            *group_cols,
            "CASE WHEN _v <= 0 THEN 0 ELSE length(bin(_v)) END AS blen",
            "CASE WHEN _v <= 0 THEN CAST(0 AS BIGINT) "
            "ELSE shiftright(_v, greatest(length(bin(_v)) - 3, 0)) END AS sub3",
        )
        .groupBy(*group_cols, "blen", "sub3")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def log_hist_merge(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge sketches over finer groupings (days, partitions) by bin
    addition — exact, the defining sketch property."""
    return sketch.groupBy(*group_cols, "blen", "sub3").agg(
        F.sum("cnt").alias("cnt")
    )


def log_hist_quantile(
    sketch: DataFrame,
    group_cols: list[str],
    q_num: int,
    q_den: int,
    cents: int = 100,
    out_col: str = "est",
) -> DataFrame:
    """Quantile estimate from a (blen, sub3, cnt) sketch: the lower bound
    of the first bin (in value order) whose cumulative count reaches
    ceil(q·N) — the rank threshold is exact integer arithmetic
    ((q_num·N + q_den − 1) div q_den), the bin lower bound
    reconstructs as sub3 << (blen − 3) (an exact integer), and the ONLY
    float op is the final single divide by ``cents``."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("blen", "sub3")
    cum = sketch.withColumn("cum", F.sum("cnt").over(w))
    tot = sketch.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    thr = F.expr(f"CAST(({q_num} * n + {q_den} - 1) DIV {q_den} AS BIGINT)")
    return (
        cum.join(tot, group_cols)
        .filter(F.col("cum") >= thr)
        .groupBy(*group_cols)
        .agg(
            F.min_by(F.struct("blen", "sub3"), F.struct("blen", "sub3")).alias("_b"),
            F.max("n").alias("n"),
        )
        .select(
            *group_cols,
            "n",
            (
                F.expr("shiftleft(_b.sub3, greatest(_b.blen - 3, 0))").cast("double")
                / F.lit(float(cents))
            ).alias(out_col),
        )
    )


def mg_summary(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Misra-Gries heavy-hitter summary: at most ``k`` (key, est) counters
    with est = count − c_(k+1), where c_(k+1) is the (k+1)-th largest
    exact count (0 when the key space is <= k).  The classic guarantee
    holds: count − N/(k+1) <= est <= count, so every key with frequency
    above N/(k+1) survives — the deterministic frequent-items summary
    of the portable sketch family (HLL distincts, CMS frequencies,
    Bloom membership, log-hist quantiles).

    Distributed shape: ONE partial-aggregated count shuffle, then a
    TakeOrderedAndProject of k+1 rows (never a global window) and a
    broadcast threshold subtraction; ties at the threshold compress to
    zero and drop, which is exactly what caps the summary at k rows.
    All-integer arithmetic with (count DESC, key) total order — any
    engine replays the summary bit for bit (Agarwal et al. 2012's
    mergeable-summaries formulation)."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("key")).limit(k + 1)
    top = top.localCheckpoint(eager=True)  # tiny; feeds both threshold + output
    thr = top.agg(
        F.when(F.count(F.lit(1)) == k + 1, F.min("cnt")).otherwise(F.lit(0)).alias("thr")
    )
    return (
        top.crossJoin(F.broadcast(thr))
        .select("key", (F.col("cnt") - F.col("thr")).alias("est"))
        .filter(F.col("est") > 0)
    )


def mg_merge(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Merge two Misra-Gries summaries (Agarwal et al. 2012): add
    counters by key, subtract the merged (k+1)-th largest, drop <= 0.
    The merged summary carries the combined-stream guarantee
    (est >= count − (N_a + N_b)/(k+1)), which is what lets per-batch
    summaries fold into one corpus-wide frequent-items answer."""
    summed = (
        a.unionByName(b).groupBy("key").agg(F.sum("est").alias("cnt"))
    )
    top = summed.orderBy(F.col("cnt").desc(), F.col("key")).limit(k + 1)
    top = top.localCheckpoint(eager=True)
    thr = top.agg(
        F.when(F.count(F.lit(1)) == k + 1, F.min("cnt")).otherwise(F.lit(0)).alias("thr")
    )
    return (
        top.crossJoin(F.broadcast(thr))
        .select("key", (F.col("cnt") - F.col("thr")).alias("est"))
        .filter(F.col("est") > 0)
    )


# --- KMV / bottom-k distinct sketch -------------------------------------

_KMV_BITS = 60  # 15 hex digits of md5 -> uniform integers in [0, 16^15)
_KMV_SPACE = 16 ** 15


def _kmv_hash(key: Column) -> Column:
    """Uniform 60-bit integer hash: the first 15 hex chars of md5(key) as
    a base-10 BIGINT — exact integer both engines (DuckDB:
    CAST('0x'||substr(md5(k),1,15) AS BIGINT)), no float in sight."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")


_KMV_SALT = 32


def _bottom_k(hv: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """k smallest DISTINCT hash values per group, computed as a two-level
    tree top-k so no single task ever sorts a whole group: dedup (one
    partial-aggregated shuffle), then bottom-k within each of
    ``_KMV_SALT`` hash-salt slices of the group (parallel per-slice
    window sorts), then bottom-k of the <= SALT·k survivors per group
    (a tiny partitioned window).  The k smallest of a group are the k
    smallest of its slices' k smallest, so the result is EXACTLY the
    direct per-group bottom-k — an oracle can replay it with one plain
    row_number.  Never a global window."""
    from pyspark.sql import Window

    w1 = Window.partitionBy(*group_cols, "_salt").orderBy("hv")
    w2 = Window.partitionBy(*group_cols).orderBy("hv")
    return (
        hv.dropDuplicates([*group_cols, "hv"])
        .withColumn("_salt", F.pmod(F.col("hv"), F.lit(_KMV_SALT)))
        .withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .drop("_salt", "_r", "_r2")
    )


def kmv_sketch(
    df: DataFrame, key_col: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct sketch: per group, the
    ``k`` smallest distinct 60-bit hashes of ``key_col`` — Beyer et al.
    2007, "On Synopses for Distinct-Value Estimation Under Multiset
    Operations".  The member of the portable sketch family (HLL / CMS /
    Bloom / log-hist / Misra-Gries) that supports SET OPERATIONS: unlike
    HLL registers, bottom-k sketches compose under union (min-k of the
    parts' min-ks) AND support intersection estimation via the k-smallest
    of the union (:func:`kmv_intersect_estimate`) — the "how many users
    did BOTH" question HLL cannot answer without inclusion-exclusion
    error blowup.

    Rows: (group_cols..., hv), <= k per group.  Every value is an exact
    integer, so sketches replay bit-for-bit in any engine and MERGE by
    re-ranking the union (:func:`kmv_merge` — merge-of-parts ==
    sketch-of-whole exactly, since the k smallest of a union are among
    the parts' k smallest)."""
    hv = df.select(*group_cols, _kmv_hash(F.col(key_col)).alias("hv"))
    return _bottom_k(hv, group_cols, k)


def kmv_merge(sketch: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Merge sketches over finer groupings (days, partitions): min-k of
    the unioned rows — exact, the defining bottom-k property."""
    return _bottom_k(sketch.select(*group_cols, "hv"), group_cols, k)


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = 64, out_col: str = "est"
) -> DataFrame:
    """Distinct-count estimate per group: EXACT n when the group holds
    fewer than ``k`` hashes (the sketch saw every distinct value), else
    the unbiased KMV estimator (k-1)·2^60 / h_k with h_k the k-th
    smallest hash.  The numerator is a single exact double literal
    ((k-1)·2^60 is an integer times a power of two), h_k casts
    correctly-rounded, one IEEE divide — bit-identical across engines.
    Returns (group_cols..., n_sketch, est)."""
    num = float((k - 1) * _KMV_SPACE)
    assert num == (k - 1) * _KMV_SPACE  # exact double literal
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"), F.max("hv").alias("_hk")
    )
    return agg.select(
        *group_cols,
        "n_sketch",
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(F.lit(num) / F.col("_hk").cast("double"))
        .alias(out_col),
    )


def kmv_intersect_estimate(
    sk_a: DataFrame, sk_b: DataFrame, k: int = 64
) -> DataFrame:
    """Intersection estimate from two single-group KMV sketches (column
    ``hv``): K = the k smallest of the DISTINCT union, m = |K|,
    c = |{v in K : v in A and v in B}|; then jaccard = c/m,
    union_est = m if m < k else (k-1)·2^60/h_k, and
    intersect_est = jaccard · union_est (Beyer et al. 2007 §4).  When
    m < k the sketches saw everything and the chain collapses to the
    exact c.  One divide + one multiply of engine-identical doubles.

    Returns one row: (m, c, union_est, jaccard, intersect_est).  Scale
    shape: both sketches are <= k rows — every join here broadcasts and
    the whole estimate is O(k)."""
    num = float((k - 1) * _KMV_SPACE)
    union_k = (
        sk_a.select("hv")
        .unionByName(sk_b.select("hv"))
        .dropDuplicates(["hv"])
        .orderBy("hv")
        .limit(k)
    )
    marked = (
        union_k.join(
            F.broadcast(sk_a.select("hv", F.lit(1).alias("_a"))), "hv", "left"
        )
        .join(F.broadcast(sk_b.select("hv", F.lit(1).alias("_b"))), "hv", "left")
    )
    agg = marked.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(
            F.when(F.col("_a").isNotNull() & F.col("_b").isNotNull(), 1).otherwise(0)
        ).alias("c"),
        F.max("hv").alias("_hk"),
    )
    return agg.select(
        "m",
        "c",
        F.when(F.col("m") < k, F.col("m").cast("double"))
        .otherwise(F.lit(num) / F.col("_hk").cast("double"))
        .alias("union_est"),
        (F.col("c").cast("double") / F.col("m").cast("double")).alias("jaccard"),
        (
            (F.col("c").cast("double") / F.col("m").cast("double"))
            * F.when(F.col("m") < k, F.col("m").cast("double")).otherwise(
                F.lit(num) / F.col("_hk").cast("double")
            )
        ).alias("intersect_est"),
    )


# --- AMS F2 (second frequency moment) sketch ------------------------------


def ams_f2(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    r: int = 9,
    b: int = 3,
) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon, Matias & Szegedy 1996):
    estimate F2 = Σ_k f_k² — the SELF-JOIN SIZE of the stream on
    ``key_col``, the skew statistic a planner consults before picking a
    join strategy — from ``r`` one-pass ±1 counters instead of a
    per-key aggregation.

    Each counter Z_i = Σ_rows s_i(key) with s_i(key) = ±1 from BIT i
    of the portable 60-bit md5 hash of the key — ONE hash per row
    serves all ``r`` counters (md5 bits are independent uniform, the
    standard bits-of-one-hash construction; r ≤ 60); E[Z_i²] = F2.
    The estimator is the classic median-of-means: ``r`` counters in
    ``b``-sized groups, the median of the group means (computed as the
    two-rank median of the exact integer group SUMS, then ONE divide
    by b — no float mean per group).

    The exact F2 rides along for the quality display (a per-key
    aggregation — the thing the sketch avoids at scale; at 100 TB the
    sketch side is ONE partial-agg pass with r conditional sums and no
    per-key state, while the exact side shuffles the key dimension).

    Determinism: signs are integer md5-parity decisions, every Z_i and
    group sum is an exact int64 (|Z_i| <= n_rows, so group sums stay
    int64 under ~10^18/b rows), the median is the explicit two-rank
    average, and the single divide closes it — bit-identical.

    Output: group_cols + (n_rows, f2_exact, f2_est).
    """
    cells = df.groupBy(*group_cols, key_col).agg(F.count(F.lit(1)).alias("_n"))
    return ams_f2_from_cells(cells, key_col, group_cols, cnt_col="_n", r=r, b=b)


def ams_f2_from_cells(
    cells: DataFrame,
    key_col: str,
    group_cols: list[str],
    cnt_col: str = "n",
    r: int = 9,
    b: int = 3,
) -> DataFrame:
    """:func:`ams_f2` over the PRE-COLLAPSED (group..., key, cnt) cell
    table — the stream-twin entry point (the group_auc_from_cells
    contract): every counter is COUNT-LINEAR, Z_i = Σ_cells ±cnt, so a
    streamed (group, key) count rollup merged by addition feeds this
    unchanged and the batch oracle is shared verbatim.  The exact F2
    falls out of the SAME aggregate (Σ cnt²), so sketch + exact are ONE
    partial-agg pass over the cell dimension — no second scan, no join
    (also the batch path now, via the collapse in :func:`ams_f2`)."""
    assert r % b == 0 and (r // b) % 2 == 1, "need an odd number of groups"
    assert r <= _KMV_BITS, "one 60-bit hash serves all counters"
    hashed = cells.select(
        *group_cols,
        F.col(cnt_col).cast("long").alias("_c"),
        _kmv_hash(F.col(key_col).cast("string")).alias("_h"),
    )
    sums = [
        F.sum(
            F.when(
                F.pmod(F.shiftright(F.col("_h"), i), F.lit(2)) == 1, F.col("_c")
            ).otherwise(-F.col("_c"))
        ).cast("long").alias(f"_z{i}")
        for i in range(r)
    ]
    g = hashed.groupBy(*group_cols).agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("f2_exact"),
        *sums,
    )
    group_sums = [
        sum(
            (F.col(f"_z{i}") * F.col(f"_z{i}") for i in range(gi * b, (gi + 1) * b)),
            F.lit(0).cast("long"),
        )
        for gi in range(r // b)
    ]
    zs = F.array_sort(F.array(*group_sums))
    n_groups = r // b
    med = F.element_at(zs, (n_groups + 1) // 2)
    return g.select(
        *group_cols,
        "n_rows",
        "f2_exact",
        (med.cast("double") / F.lit(float(b))).alias("f2_est"),
    )
