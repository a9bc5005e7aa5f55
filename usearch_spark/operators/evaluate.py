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
    return group_auc_from_cells(agg, group_cols, score_col)


def group_auc_from_cells(
    cells: DataFrame,
    group_cols: list[str],
    score_col: str,
) -> DataFrame:
    """:func:`group_auc` over the PRE-COLLAPSED (group..., score, cnt,
    pos) cell table — the entry point for incrementally-maintained
    rollups: both cell columns are COUNT-ADDITIVE, so a streamed
    (group, score, label) rollup merged by addition feeds this
    unchanged and the batch oracle is shared verbatim (the
    holt_from_daily contract, applied to a ranking metric)."""
    agg = cells
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


def ann_recall_at_k(
    emb: DataFrame,
    n_queries: int = 16,
    k: int = 10,
    n_clusters: int = 8,
    n_probe: int = 2,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the IVF approximate-nearest-neighbor path against the
    exact cosine ground truth — the eval that decides whether an ANN
    index's n_probe budget is good enough before a pipeline trusts it
    for semantic dedup / retrieval (the standard ANN-benchmarks metric).

    The first ``n_queries`` vectors play the query sample.  Ground
    truth is the exact brute-force cosine top-k over the corpus
    (excluding self); the ANN side replays the IVF retrieval exactly as
    ``sim_ann_ivf`` serves it — the deterministic fixed-iteration
    k-means coarse quantizer (clustering.kmeans_centroids: smallest-k
    init, round-6 means, ties to lower cid), nearest-``n_probe``-cell
    probing per query, cosine top-k among the probed candidates.
    recall@k = |truth ∩ approx| / k per query.

    Distributed shape at 100 TB: the quantizer/assignment is the IVF
    build itself (broadcast k-row centroids, one partial-agg shuffle
    per Lloyd step); the truth pass is ONE corpus scan fused over all
    ``n_queries`` broadcast queries (the eval's inherent exact-scan
    cost — bounded by the query-sample size, not corpus²); the ANN
    pass touches only probed cells.  Per-query top-k windows partition
    by query id — never global.  No UDFs, no driver collects.

    Determinism: every discrete decision (cell assignment, probe
    choice, top-k membership) orders by a deterministically-derived
    score with full tie-breaks, and the hit count is exact-integer with
    ONE final divide by k — the gate-proven sim_ann_ivf contract
    extended to a query sample.
    """
    from usearch_spark.operators.clustering import (
        _as_vecs,
        _dist2,
        kmeans_assign,
        kmeans_centroids,
    )
    from usearch_spark.operators.similarity import cosine

    vecs = _as_vecs(emb, id_col, vec_col)
    cent = kmeans_centroids(
        emb, k=n_clusters, iters=kmeans_iters, id_col=id_col, vec_col=vec_col
    )
    assigned = kmeans_assign(vecs, cent).select("vec_id", "cid")
    q = vecs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("varr").alias("qarr")
    )
    # probe choice: n_probe nearest centroids per query (same squared-L2
    # fold and (dist, cid) tie-break as the assignment)
    pj = (
        q.withColumn("_one", F.lit(1))
        .join(F.broadcast(cent.withColumn("_one", F.lit(1))), "_one")
        .drop("_one")
        .select("qid", "cid", _dist2(F.col("qarr"), F.col("carr")).alias("dq"))
    )
    wp = Window.partitionBy("qid").orderBy("dq", "cid")
    probe = (
        pj.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= n_probe)
        .select("qid", "cid")
    )
    wk = Window.partitionBy("qid").orderBy(F.col("c").desc(), "vec_id")
    cand = (
        F.broadcast(probe)
        .join(assigned, "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
    )
    ann = (
        cand.join(vecs, "vec_id")
        .join(F.broadcast(q), "qid")
        .select("qid", "vec_id", cosine(F.col("varr"), F.col("qarr")).alias("c"))
        .withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") <= k)
        .select("qid", "vec_id")
    )
    truth = (
        vecs.withColumn("_one", F.lit(1))
        .join(F.broadcast(q.withColumn("_one", F.lit(1))), "_one")
        .drop("_one")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine(F.col("varr"), F.col("qarr")).alias("c"))
        .withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") <= k)
        .select("qid", "vec_id")
    )
    return (
        truth.join(ann.withColumn("_hit", F.lit(1)), ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hits"))
        .select(
            "qid",
            "n_hits",
            (F.col("n_hits").cast("double") / F.lit(float(k))).alias("recall_at_k"),
        )
    )


def ndcg_discounts(k: int) -> list[float]:
    """The k NDCG position discounts 1/log2(i+1), i = 1..k, computed
    ONCE in Python — both the Spark plan and the SQL oracle inject these
    exact doubles as literals, removing any cross-engine libm log2
    divergence from the metric."""
    import math

    return [1.0 / math.log2(i + 1) for i in range(1, k + 1)]


def group_ndcg(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    rel_col: str,
    id_col: str,
    k: int = 20,
) -> DataFrame:
    """Per-group NDCG@k (Järvelin & Kekäläinen 2002) of a score column
    against graded integer relevance — the position-weighted companion
    to :func:`group_auc` (AUC asks "does the score rank positives
    above negatives at all"; NDCG asks "are the HIGH grades at the TOP,
    where a consumer will look").

        DCG@k  = Σ_{i=1..k} (2^rel_i − 1) / log2(i + 1)   over the
                 score-ranked top k (ties broken by id)
        IDCG@k = the same sum over the k highest grades in the group
        NDCG   = DCG / IDCG   (NULL when every grade is 0)

    Distributed shape at 100 TB: both top-k's are rank-windows
    PARTITIONED BY the group (never global) that keep k rows per group;
    the gain folds run over k-element in-row arrays.  No UDFs, no
    collects.

    Determinism: grades are integers, so 2^rel − 1 is an exact double
    (pow(2, int) is exact in both engines' libm); the position
    discounts 1/log2(i+1) are NOT recomputed engine-side — log2 is a
    libm call whose last ulp may differ across engines — but injected
    as k PYTHON double literals (the _ppr_oracle_sql trick), so each
    gain term is one exact-gain × literal-weight multiply and the fold
    sums in RANK ORDER (array order); one final divide.  Raw doubles
    out (no rounding needed).

    Output: group_cols + (n_rows, dcg, idcg, ndcg).
    """
    ws = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    wi = Window.partitionBy(*group_cols).orderBy(
        F.col(rel_col).desc(), F.col(id_col)
    )
    weights = F.array(*[F.lit(w) for w in ndcg_discounts(k)])

    def dcg_of(col_rels):
        # gains in rank order: (2^rel - 1) * literal discount, folded
        # left-to-right — the array IS the rank order
        terms = F.zip_with(
            col_rels,
            F.slice(weights, 1, F.size(col_rels)),
            lambda x, w: (F.pow(F.lit(2.0), x.cast("double")) - F.lit(1.0)) * w,
        )
        return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)

    n_per = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    top = (
        df.withColumn("_rn", F.row_number().over(ws))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_rn", F.col(rel_col).alias("_r")))),
                lambda s: s["_r"],
            ).alias("_rels")
        )
        .select(*group_cols, dcg_of(F.col("_rels")).alias("dcg"))
    )
    ideal = (
        df.withColumn("_rn", F.row_number().over(wi))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_rn", F.col(rel_col).alias("_r")))),
                lambda s: s["_r"],
            ).alias("_rels")
        )
        .select(*group_cols, dcg_of(F.col("_rels")).alias("idcg"))
    )
    return (
        n_per.join(top, group_cols)
        .join(ideal, group_cols)
        .select(
            *group_cols,
            "n_rows",
            "dcg",
            "idcg",
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).alias("ndcg"),
        )
    )


def calibration_bins(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    id_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-group RELIABILITY DIAGRAM + Brier score of a score column
    against a binary label — the calibration eval that decides whether a
    scorer's magnitudes (not just its ranking, which AUC/NDCG already
    cover) can be trusted as probabilities.

    The score is turned into a predicted probability by its in-group
    rank percentile p = rank/n (the standard uncalibrated-score
    treatment), rows land in ``n_bins`` equal-population bins by
    bin = (rank−1)·n_bins div n, and each bin reports

        mean_pred = Σ rank / (n · n_bin)        (mean percentile)
        obs_rate  = positives / n_bin           (empirical frequency)
        brier     = Σ (p − y)² / n_bin
                  = Σ (rank − y·n)² / (n² · n_bin)

    A calibrated scorer tracks obs_rate ≈ mean_pred per bin.

    Determinism: ranks are integers from a fully-tie-broken
    group-partitioned window, every numerator (Σrank, positives,
    Σ(rank−y·n)²) is an exact integer aggregate, and each output is ONE
    int→double divide — bit-identical across engines by construction.
    Bound: Σ(rank−y·n)² ≤ n³, so groups must stay under ~2M rows for
    int64 (percentile calibration bins are per-segment dimensions, not
    per-corpus).

    Output: group_cols + (bin, n_bin, mean_pred, obs_rate, brier).
    """
    w = Window.partitionBy(*group_cols).orderBy(score_col, id_col)
    ranked = df.select(
        *group_cols,
        F.col(label_col).cast("long").alias("_y"),
        F.row_number().over(w).cast("long").alias("_rank"),
    )
    n = ranked.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    j = ranked.join(n, group_cols).withColumn(
        "bin",
        F.expr(f"CAST(((_rank - 1) * {n_bins}) div _n AS INT)"),
    )
    g = j.groupBy(*group_cols, "bin").agg(
        F.count(F.lit(1)).alias("n_bin"),
        F.sum("_rank").alias("_sum_rank"),
        F.sum("_y").alias("_n_pos"),
        F.sum(
            (F.col("_rank") - F.col("_y") * F.col("_n"))
            * (F.col("_rank") - F.col("_y") * F.col("_n"))
        ).alias("_sq"),
        F.max("_n").alias("_n"),
    )
    return g.select(
        *group_cols,
        "bin",
        "n_bin",
        (
            F.col("_sum_rank").cast("double")
            / (F.col("_n") * F.col("n_bin")).cast("double")
        ).alias("mean_pred"),
        (F.col("_n_pos").cast("double") / F.col("n_bin").cast("double")).alias(
            "obs_rate"
        ),
        (
            F.col("_sq").cast("double")
            / (F.col("_n") * F.col("_n") * F.col("n_bin")).cast("double")
        ).alias("brier"),
    )


def rbo_weights(k: int, p: float = 0.9) -> list[float]:
    """The k truncated rank-biased-overlap weights (1−p)·p^(d−1)/d,
    d = 1..k, computed ONCE in Python (p-powers by repeated multiply) —
    both engines inject these exact doubles as literals, so no
    cross-engine pow/libm call appears in the metric."""
    out, pw = [], 1.0
    for d in range(1, k + 1):
        out.append((1.0 - p) * pw / d)
        pw *= p
    return out


def group_rbo(
    df: DataFrame,
    group_cols: list[str],
    score_a: str,
    score_b: str,
    id_col: str,
    k: int = 50,
    p: float = 0.9,
) -> DataFrame:
    """Per-group truncated Rank-Biased Overlap (Webber, Moffat & Zobel
    2010) between TWO rankings of the same items:

        RBO@k = Σ_{d=1..k} (1−p)·p^(d−1) · |A_d ∩ B_d| / d

    where A_d/B_d are the top-d prefixes by the two scores — the
    ranker-agreement eval (e.g. old scorer vs new scorer before a
    swap): 1 ⇒ identical prefixes at every depth, → 0 as the tops
    diverge; top-weighted by p like a user scanning down a result page.

    Distributed shape: two group-partitioned rank windows; an item with
    ranks (ra, rb) joins both prefixes from depth m = max(ra, rb), so
    overlap_d = |{v : m(v) ≤ d}| — ONE count-per-m aggregate (≤ k rows
    per group), then a bounded in-row fold.  Never a set-intersection
    per depth, no collects.

    Determinism: overlaps are exact integer prefix counts; the weights
    are injected Python literals; the fold multiplies int-valued
    doubles by literals and sums in DEPTH ORDER — bit-identical.

    Output: group_cols + (n_rows, overlap_at_k, rbo).
    """
    wa = Window.partitionBy(*group_cols).orderBy(
        F.col(score_a).desc(), F.col(id_col)
    )
    wb = Window.partitionBy(*group_cols).orderBy(
        F.col(score_b).desc(), F.col(id_col)
    )
    ranked = df.select(
        *group_cols,
        F.row_number().over(wa).alias("_ra"),
        F.row_number().over(wb).alias("_rb"),
    )
    n_per = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    cm = (
        ranked.withColumn("_m", F.greatest("_ra", "_rb"))
        .filter(F.col("_m") <= k)
        .groupBy(*group_cols, "_m")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(*group_cols)
        .agg(F.collect_list(F.struct("_m", "_c")).alias("_mc"))
    )
    weights = F.array(*[F.lit(w) for w in rbo_weights(k, p)])
    # overlap_d = Σ counts with m <= d (exact int); rbo folds in depth order
    overlap = lambda d: F.aggregate(  # noqa: E731
        F.filter(F.col("_mc"), lambda s: s["_m"] <= d),
        F.lit(0).cast("long"),
        lambda acc, s: acc + s["_c"],
    )
    terms = F.transform(
        F.sequence(F.lit(1), F.lit(k)),
        lambda d, i: overlap(d).cast("double") * F.element_at(weights, i + 1),
    )
    rbo = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    return (
        n_per.join(cm, group_cols, "left")
        .select(
            *group_cols,
            "n_rows",
            F.coalesce(overlap(F.lit(k)), F.lit(0)).cast("long").alias(
                "overlap_at_k"
            ),
            F.coalesce(rbo, F.lit(0.0)).alias("rbo"),
        )
    )


def group_ks(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group two-sample Kolmogorov–Smirnov separation of a score
    between positives and negatives — the scorecard industry's
    companion to AUC (KS = max over thresholds of
    |CDF_pos(t) − CDF_neg(t)|, the single best cut's separating power;
    AUC integrates over all cuts, KS reports the peak).

    Same distributed collapse as :func:`group_auc`: one shuffle to
    (group, score) with count/positive-count, running sums over a
    group-partitioned score-ordered window, then a per-group argmax.
    KS never touches a float until the END: the objective maximizes
    |cum_pos·n_neg − cum_neg·n_pos| (exact integers), the argmax
    carries a (−metric, score) struct-min tie-break (ties to the
    LOWEST threshold score), and the reported statistic is that exact
    integer over n_pos·n_neg — one long→double divide.

    Degenerate groups (no positives or no negatives) emit NULL.

    Output: group_cols + (n_pos, n_neg, ks, ks_score).
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
    # the running-sum cell frame (one row per distinct (group, score) — a
    # dimension) feeds both the per-group totals and the argmax join;
    # materialized once so the caller's input pipeline + the collapse +
    # window run a single time, not once per consumer
    r = agg.select(
        *group_cols,
        F.col(score_col).alias("_s"),
        F.sum("pos").over(w).alias("_cp"),
        (F.sum("cnt").over(w) - F.sum("pos").over(w)).alias("_cn"),
    ).localCheckpoint(eager=True)
    tot = r.groupBy(*group_cols).agg(
        F.max("_cp").alias("n_pos"), F.max("_cn").alias("n_neg")
    )
    j = r.join(tot, group_cols)
    num = F.abs(F.col("_cp") * F.col("n_neg") - F.col("_cn") * F.col("n_pos"))
    best = j.groupBy(*group_cols).agg(
        F.max("n_pos").alias("n_pos"),
        F.max("n_neg").alias("n_neg"),
        F.min(F.struct((-num).alias("_m"), F.col("_s").alias("_t"))).alias("_b"),
    )
    return best.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            (-F.col("_b._m")).cast("double")
            / (F.col("n_pos") * F.col("n_neg")).cast("double"),
        ).alias("ks"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0), F.col("_b._t")
        ).alias("ks_score"),
    )


def ap_lcm(k: int) -> int:
    """lcm(1..k) — the common denominator that makes every precision@i
    term of AP@k an exact integer (the harmonic-centrality recipe).
    lcm(1..20) = 232_792_560, so the AP@20 numerator is bounded by
    k² · lcm ≈ 9.3e10 — comfortably int64."""
    import math

    out = 1
    for i in range(1, k + 1):
        out = math.lcm(out, i)
    return out


def group_avg_precision(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    id_col: str,
    k: int = 20,
) -> DataFrame:
    """Per-group Average Precision@k of a score against a binary label —
    the area-under-the-precision-recall-curve companion to
    :func:`group_ndcg` (NDCG weights positions by a fixed discount; AP
    weights each HIT by the precision achieved at its rank):

        AP@k = (1/m) Σ_{i=1..k} rel_i · P@i,   P@i = hits_i / i,
        m = min(n_pos, k)

    Mean-average-precision over groups is the caller's trivial final
    mean; the per-group rows are the useful diagnostic.

    Determinism: with L = lcm(1..k) injected as a Python int literal,
    the numerator N = Σ rel_i · hits_i · (L div i) is an EXACT int64
    (hits_i and i are window integers), and AP@k = N / (L·m) is one
    long→double divide — bit-identical across engines.  Groups with no
    positives emit NULL.

    Distributed shape at 100 TB: one group-partitioned rank window
    (never global), truncated to k rows per group before the running
    hit count; the untruncated positive count is a partial-agg
    groupBy.  No UDFs, no collects.

    Output: group_cols + (n_pos, hits_at_k, ap_at_k).
    """
    L = ap_lcm(k)
    ws = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    wh = (
        Window.partitionBy(*group_cols)
        .orderBy("_rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lab = F.col(label_col).cast("long")
    n_per = df.groupBy(*group_cols).agg(F.sum(lab).alias("n_pos"))
    top = (
        df.select(*group_cols, lab.alias("_y"), F.row_number().over(ws).alias("_rn"))
        .filter(F.col("_rn") <= k)
        .withColumn("_hits", F.sum("_y").over(wh))
        .groupBy(*group_cols)
        .agg(
            F.max("_hits").alias("hits_at_k"),
            F.sum(
                F.col("_y") * F.col("_hits") * F.expr(f"{L} div _rn")
            ).alias("_num"),
        )
    )
    m = F.least(F.col("n_pos"), F.lit(k))
    return (
        n_per.join(top, group_cols)
        .select(
            *group_cols,
            "n_pos",
            "hits_at_k",
            F.when(
                F.col("n_pos") > 0,
                F.col("_num").cast("double") / (F.lit(L) * m).cast("double"),
            ).alias("ap_at_k"),
        )
    )


def group_mrr(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    id_col: str,
    k: int = 20,
) -> DataFrame:
    """Per-group Reciprocal Rank@k — the "how far down is the first
    relevant result" eval (the metric for known-item retrieval):
    rr = 1/rank of the first positive under the score ordering, 0 when
    no positive lands in the top k, NULL when the group has no
    positives at all.  Mean-reciprocal-rank is the caller's final mean
    over groups.

    Determinism: first_rank is an integer from a fully-tie-broken
    group-partitioned rank window; rr is ONE int→double divide (or an
    exact 0.0/NULL) — bit-identical by construction.

    Distributed shape: the rank window partitions by the group (never
    global) and the first-positive argmin is a conditional MIN inside a
    partial-agg groupBy.  No UDFs, no collects.

    Output: group_cols + (n_pos, first_rank, rr_at_k).
    """
    ws = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    lab = F.col(label_col).cast("long")
    ranked = df.select(
        *group_cols, lab.alias("_y"), F.row_number().over(ws).alias("_rn")
    )
    g = ranked.groupBy(*group_cols).agg(
        F.sum("_y").alias("n_pos"),
        F.min(F.when(F.col("_y") > 0, F.col("_rn"))).cast("long").alias("first_rank"),
    )
    return g.select(
        *group_cols,
        "n_pos",
        "first_rank",
        F.when(
            (F.col("n_pos") > 0) & (F.col("first_rank") <= k),
            F.lit(1.0) / F.col("first_rank").cast("double"),
        )
        .otherwise(F.when(F.col("n_pos") > 0, F.lit(0.0)))
        .alias("rr_at_k"),
    )


def group_classification_metrics(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    id_col: str,
    top_den: int = 10,
) -> DataFrame:
    """Per-group THRESHOLD classification metrics of a score against a
    binary label: predict positive for the top ``1/top_den`` of the
    group by score (the budget-cut a filtering pipeline actually
    deploys — "keep the best decile"), then report the confusion counts
    and precision / recall / F1 / accuracy.

    Determinism: the cut is the integer rank bound pp = n div top_den
    over a fully-tie-broken group window, every confusion count is an
    exact integer, and each metric is ONE int→double divide — F1 uses
    the single-divide identity 2PR/(P+R) = 2·TP/(PP+POS), accuracy is
    (n − PP − POS + 2·TP)/n.  Bit-identical across engines; degenerate
    denominators emit NULL.

    Distributed shape: one group-partitioned rank window + one
    partial-agg groupBy.  No UDFs, no collects.

    Output: group_cols + (n, n_pos, n_pred, tp, prec, rec, f1,
    accuracy).
    """
    ws = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    lab = F.col(label_col).cast("long")
    ranked = df.select(
        *group_cols, lab.alias("_y"), F.row_number().over(ws).alias("_rn")
    )
    # the rank cut needs the group size, so join it in rather than
    # nesting a window inside the aggregate (which Spark rejects)
    sized = ranked.join(
        ranked.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n")), group_cols
    )
    pred = F.col("_rn") <= F.expr(f"n div {top_den}")
    g = sized.groupBy(*group_cols).agg(
        F.max("n").alias("n"),
        F.sum("_y").alias("n_pos"),
        F.max(F.expr(f"n div {top_den}")).alias("n_pred"),
        F.sum(F.when(pred, F.col("_y")).otherwise(F.lit(0))).alias("tp"),
    )
    dbl = lambda c: c.cast("double")  # noqa: E731
    return g.select(
        *group_cols,
        "n",
        "n_pos",
        "n_pred",
        "tp",
        F.when(F.col("n_pred") > 0, dbl(F.col("tp")) / dbl(F.col("n_pred"))).alias("prec"),
        F.when(F.col("n_pos") > 0, dbl(F.col("tp")) / dbl(F.col("n_pos"))).alias("rec"),
        F.when(
            F.col("n_pred") + F.col("n_pos") > 0,
            dbl(F.lit(2) * F.col("tp")) / dbl(F.col("n_pred") + F.col("n_pos")),
        ).alias("f1"),
        (
            dbl(F.col("n") - F.col("n_pred") - F.col("n_pos") + F.lit(2) * F.col("tp"))
            / dbl(F.col("n"))
        ).alias("accuracy"),
    )


def group_spearman(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Spearman rank correlation with midrank tie handling —
    the monotone-association eval (does MORE x mean MORE y, whatever
    the shape), the rank-robust companion to the Pearson
    price_quantity_corr.

    rho = Pearson over midranks.  With DOUBLED midranks (2·midrank =
    2·lower + cnt + 1 from the :func:`group_auc` rank-block collapse —
    always an integer) centered by their exact group mean (Σ 2R =
    n(n+1), so c = 2R − (n+1) sums to EXACTLY zero), the co-moments
    need no mean subtraction:

        rho = Σ cx·cy / (sqrt(Σ cx²) · sqrt(Σ cy²))

    Determinism: cx, cy and all three co-moment sums are exact int64
    (|c| < n ⇒ Σc² < n³ — groups must stay under ~2M rows, the
    calibration_bins dimension bound); int64→double conversion and
    IEEE sqrt are both correctly rounded, and the final
    multiply+divide chain is identical on both engines — bit-exact
    with NO rounding site.  Constant columns (all cx = 0) emit NULL.

    Distributed shape: one (group, x, y) cell collapse materialized
    once, two (group, value) projections with group-partitioned
    running-count windows (bounded by distinct values), two hash joins
    back to the cells, one cell-weighted partial-agg groupBy.  No
    UDFs, no collects.

    Output: group_cols + (n, spearman_rho).
    """
    # One bounded (group, x, y) cell table, materialized once: the per-value
    # counts behind both midrank windows, the group sizes, AND the co-moment
    # sums are exact integer aggregates of it (Σ over rows of cx·cy equals
    # Σ over cells of c·cx·cy — integer addition is associative), so the
    # caller's input pipeline runs one time instead of four.
    cells = (
        df.groupBy(*group_cols, x_col, y_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )

    def rank2(col: str, alias: str) -> DataFrame:
        agg = cells.groupBy(*group_cols, col).agg(F.sum("_c").alias("_cnt"))
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return agg.select(
            *group_cols,
            col,
            (
                F.lit(2) * (F.sum("_cnt").over(w) - F.col("_cnt"))
                + F.col("_cnt")
                + F.lit(1)
            ).alias(alias),
        )

    n_per = cells.groupBy(*group_cols).agg(F.sum("_c").alias("n"))
    j = (
        cells.join(rank2(x_col, "_rx2"), [*group_cols, x_col])
        .join(rank2(y_col, "_ry2"), [*group_cols, y_col])
        .join(n_per, group_cols)
    )
    cx = F.col("_rx2") - (F.col("n") + F.lit(1))
    cy = F.col("_ry2") - (F.col("n") + F.lit(1))
    g = j.groupBy(*group_cols).agg(
        F.max("n").alias("n"),
        F.sum(F.col("_c") * cx * cy).alias("_scc"),
        F.sum(F.col("_c") * cx * cx).alias("_sxx"),
        F.sum(F.col("_c") * cy * cy).alias("_syy"),
    )
    return g.select(
        *group_cols,
        "n",
        F.when(
            (F.col("_sxx") > 0) & (F.col("_syy") > 0),
            F.col("_scc").cast("double")
            / (
                F.sqrt(F.col("_sxx").cast("double"))
                * F.sqrt(F.col("_syy").cast("double"))
            ),
        ).alias("spearman_rho"),
    )


def group_gains(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Per-group cumulative GAINS/LIFT table — the scorecard view of a
    ranker (how much of the positive mass the top d deciles capture,
    and how much better than random that is):

        capture_d = cum_pos_d / total_pos
        lift_d    = (cum_pos_d / cum_n_d) / (total_pos / n)
                  = cum_pos_d · n / (cum_n_d · total_pos)   — ONE divide

    Rows land in ``n_buckets`` equal-population buckets by the
    calibration_bins integer rank cut ((rank−1)·n_buckets div n).

    Determinism: ranks come from a fully-tie-broken group window, every
    count and both numerators are exact integers, and each metric is
    one int→double divide — bit-identical.  Groups with no positives
    emit NULL capture/lift.

    Distributed shape: one group-partitioned rank window + a
    (group, bucket) partial agg + a ≤ n_buckets-row cumulative window
    per group.  No UDFs, no collects.

    Output: group_cols + (bucket, n_bucket, n_pos, cum_n, cum_pos,
    capture, lift).
    """
    ws = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    lab = F.col(label_col).cast("long")
    ranked = df.select(
        *group_cols, lab.alias("_y"), F.row_number().over(ws).alias("_rn")
    )
    sized = ranked.join(
        ranked.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n")), group_cols
    ).withColumn("bucket", F.expr(f"CAST(((_rn - 1) * {n_buckets}) div _n AS INT)"))
    b = sized.groupBy(*group_cols, "bucket").agg(
        F.count(F.lit(1)).alias("n_bucket"),
        F.sum("_y").alias("n_pos"),
        F.max("_n").alias("_n"),
    )
    wc = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*group_cols)
    c = b.withColumn("cum_n", F.sum("n_bucket").over(wc)).withColumn(
        "cum_pos", F.sum("n_pos").over(wc)
    ).withColumn("_tp", F.sum("n_pos").over(wt))
    return c.select(
        *group_cols,
        "bucket",
        "n_bucket",
        "n_pos",
        F.col("cum_n").cast("long").alias("cum_n"),
        F.col("cum_pos").cast("long").alias("cum_pos"),
        F.when(
            F.col("_tp") > 0,
            F.col("cum_pos").cast("double") / F.col("_tp").cast("double"),
        ).alias("capture"),
        F.when(
            F.col("_tp") > 0,
            (F.col("cum_pos") * F.col("_n")).cast("double")
            / (F.col("cum_n") * F.col("_tp")).cast("double"),
        ).alias("lift"),
    )


def group_kendall(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Kendall tau-b rank correlation — the concordance eval
    completing the correlation family (Pearson price_quantity_corr,
    Spearman :func:`group_spearman`): over all row pairs,

        tau_b = (C − D) / (sqrt(n0 − n1) · sqrt(n0 − n2))

    with C/D the concordant/discordant pair counts, n0 = n(n−1)/2 and
    n1/n2 the x-tie / y-tie pair counts (Kendall 1945).

    The pair counts are NEVER enumerated: each (x, y) cell's
    contribution is c · (rows strictly below in BOTH coordinates),
    computed from |Y| per-y-class running counts — the cell table
    joins the group's distinct y values (row volume n·|Y|) and a
    (group, y-class) window ordered by x with a RANGE … 1 PRECEDING
    frame counts the strict-x prefix per class.  This is exact for any
    tie structure and costs O(n·|Y|), so it fits score-vs-SMALL-
    CARDINALITY-label evaluation (the common case: a continuous score
    against a count or a grade); |Y| is the caller's documented bound,
    not a sample.

    Determinism: C, D, n0, n1, n2 are exact int64 (C ≤ n², so groups
    must stay under ~3B pairs — the group_spearman dimension bound);
    the close is int→double + IEEE sqrt + multiply + divide, all
    correctly rounded — bit-identical, no rounding site.  Groups where
    either factor is 0 (a constant column) emit NULL.

    Output: group_cols + (n, n_concordant, n_discordant, tau_b).
    """
    # The (group, x, y) cell table is the single bounded artifact every
    # other statistic projects from exactly: the distinct-y classes, the
    # x-tie and y-tie counts are all integer aggregates of cells.
    # Materializing it once replaces four physical re-derivations of the
    # caller's (possibly join-heavy) input with one.
    cells = (
        df.groupBy(*group_cols, x_col, y_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=True)
    )
    ys = cells.select(*group_cols, F.col(y_col).alias("_v")).distinct()
    e = cells.join(ys, group_cols).withColumn(
        "_cv", F.when(F.col(y_col) == F.col("_v"), F.col("_c")).otherwise(F.lit(0))
    )
    wv = (
        Window.partitionBy(*group_cols, "_v")
        .orderBy(F.col(x_col).cast("long"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    e = e.withColumn("_cum", F.coalesce(F.sum("_cv").over(wv), F.lit(0)))
    back = e.groupBy(*group_cols, x_col, y_col, "_c").agg(
        F.sum(F.when(F.col("_v") < F.col(y_col), F.col("_cum")).otherwise(F.lit(0))).alias("_less"),
        F.sum(F.when(F.col("_v") > F.col(y_col), F.col("_cum")).otherwise(F.lit(0))).alias("_more"),
    )
    # tie-pair counts per coordinate — per-value row counts are exact
    # integer sums of the cells over the other coordinate
    tx = (
        cells.groupBy(*group_cols, x_col)
        .agg(F.sum("_c").alias("_t"))
        .groupBy(*group_cols)
        .agg(F.sum(F.expr("_t * (_t - 1) div 2")).alias("_n1"))
    )
    ty = (
        cells.groupBy(*group_cols, y_col)
        .agg(F.sum("_c").alias("_t"))
        .groupBy(*group_cols)
        .agg(F.sum(F.expr("_t * (_t - 1) div 2")).alias("_n2"))
    )
    g = (
        back.groupBy(*group_cols)
        .agg(
            F.sum("_c").alias("n"),
            F.sum(F.col("_c") * F.col("_less")).alias("n_concordant"),
            F.sum(F.col("_c") * F.col("_more")).alias("n_discordant"),
        )
        .join(tx, group_cols)
        .join(ty, group_cols)
    )
    n0 = F.expr("n * (n - 1) div 2")
    f1 = (n0 - F.col("_n1")).cast("double")
    f2 = (n0 - F.col("_n2")).cast("double")
    return g.select(
        *group_cols,
        "n",
        "n_concordant",
        "n_discordant",
        F.when(
            (n0 > F.col("_n1")) & (n0 > F.col("_n2")),
            (F.col("n_concordant") - F.col("n_discordant")).cast("double")
            / (F.sqrt(f1) * F.sqrt(f2)),
        ).alias("tau_b"),
    )


def _top_cut_confusion(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    id_col: str,
    top_den: int,
) -> DataFrame:
    """Shared confusion-count frame for the top-``1/top_den`` deployment
    cut (the :func:`group_classification_metrics` cut, factored so MCC
    and kappa reuse it): one group-partitioned tie-broken rank window,
    one size join, one partial-agg groupBy.  Every output column is an
    exact int64: group_cols + (n, n_pos, n_pred, tp)."""
    ws = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    ranked = df.select(
        *group_cols,
        F.col(label_col).cast("long").alias("_y"),
        F.row_number().over(ws).alias("_rn"),
    )
    sized = ranked.join(
        ranked.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n")), group_cols
    )
    pred = F.col("_rn") <= F.expr(f"n div {top_den}")
    return sized.groupBy(*group_cols).agg(
        F.max("n").alias("n"),
        F.sum("_y").alias("n_pos"),
        F.max(F.expr(f"n div {top_den}")).alias("n_pred"),
        F.sum(F.when(pred, F.col("_y")).otherwise(F.lit(0))).alias("tp"),
    )


def group_mcc(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    id_col: str,
    top_den: int = 10,
) -> DataFrame:
    """Per-group MATTHEWS correlation coefficient of the top-``1/top_den``
    deployment cut against a binary label — the single-number confusion
    summary that stays honest under class imbalance (precision/recall/F1
    ignore TN; accuracy saturates).  The chance-corrected geometric
    companion to :func:`group_classification_metrics` on the same cut.

        MCC = (TP·TN − FP·FN) / sqrt(PP·POS·(n−PP)·(n−POS))

    Determinism: the numerator TP·TN − FP·FN and both pair products
    PP·POS and (n−PP)·(n−POS) are exact int64 (each factor ≤ n, so the
    products need n ≤ ~3M — the established per-group bound — and are
    < 2⁵³, hence exactly representable as doubles); the close is
    int→double conversions + two IEEE sqrts + one multiply + one divide
    in a fixed order — every step correctly rounded, bit-identical
    across engines with NO rounding site.  Any zero marginal emits NULL
    (MCC undefined).

    Distributed shape: one group-partitioned rank window + one
    partial-agg groupBy (via :func:`_top_cut_confusion`).  No UDFs, no
    collects; scales in the group count, not the corpus.

    Output: group_cols + (n, n_pos, n_pred, tp, mcc).
    """
    g = _top_cut_confusion(df, group_cols, score_col, label_col, id_col, top_den)
    n, pp, pos, tp = F.col("n"), F.col("n_pred"), F.col("n_pos"), F.col("tp")
    tn = n - pp - pos + tp
    num = tp * tn - (pp - tp) * (pos - tp)
    d1 = pp * pos
    d2 = (n - pp) * (n - pos)
    return g.select(
        *group_cols,
        "n",
        "n_pos",
        "n_pred",
        "tp",
        F.when(
            (d1 > 0) & (d2 > 0),
            num.cast("double") / (F.sqrt(d1.cast("double")) * F.sqrt(d2.cast("double"))),
        ).alias("mcc"),
    )


def group_kappa(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    id_col: str,
    top_den: int = 10,
) -> DataFrame:
    """Per-group COHEN'S KAPPA of the top-``1/top_den`` deployment cut
    against a binary label — chance-corrected agreement: how much better
    than a marginal-preserving random rater the cut agrees with the
    label.  The linear chance-corrected companion to :func:`group_mcc`
    (which is the geometric one) — kappa is what a labeling-pipeline
    audit quotes when the classes are imbalanced enough that raw
    accuracy is vacuous.

    Single-divide identity (n² clears both the p_o and p_e divides):

        kappa = (n·(TP+TN) − PP·POS − (n−PP)·(n−POS))
                / (n² − PP·POS − (n−PP)·(n−POS))

    Determinism: every term is an exact int64 (bounded by n² < 2⁵³ for
    n ≤ ~3M per group, the established bound) and the close is ONE
    int→double divide — bit-identical, no rounding site.  A degenerate
    chance term (n² = p_e numerator: both marginals constant) emits
    NULL.

    Distributed shape: identical to :func:`group_mcc` — one rank
    window, one groupBy.

    Output: group_cols + (n, n_pos, n_pred, tp, kappa).
    """
    g = _top_cut_confusion(df, group_cols, score_col, label_col, id_col, top_den)
    n, pp, pos, tp = F.col("n"), F.col("n_pred"), F.col("n_pos"), F.col("tp")
    po_num = n - pp - pos + F.lit(2) * tp  # TP + TN
    pe_num = pp * pos + (n - pp) * (n - pos)
    return g.select(
        *group_cols,
        "n",
        "n_pos",
        "n_pred",
        "tp",
        F.when(
            n * n != pe_num,
            (n * po_num - pe_num).cast("double") / (n * n - pe_num).cast("double"),
        ).alias("kappa"),
    )


def group_mcnemar(
    df: DataFrame,
    group_cols: list[str],
    score_a_col: str,
    score_b_col: str,
    label_col: str,
    id_col: str,
    top_den: int = 10,
) -> DataFrame:
    """Per-group McNEMAR paired test between TWO rankers deployed as
    top-``1/top_den`` cuts on the SAME rows — the champion/challenger
    gate: is model B's disagreement with model A systematic or noise?
    Only the discordant pairs matter:

        b = #(A correct, B wrong),  c = #(A wrong, B correct)
        chi2 = (b − c)² / (b + c)

    Determinism: both rank cuts are integer bounds over fully tie-broken
    group windows, b and c are exact integer counts, (b−c)² is exact
    int64 (< 2⁵³ for groups ≤ ~3M rows), and the statistic is ONE
    int→double divide — bit-identical.  b + c = 0 (the models never
    split a verdict) emits NULL.

    Distributed shape: two rank windows over the SAME group
    partitioning (one exchange, two sorts), one size join, one
    partial-agg groupBy.  No UDFs, no collects.

    Output: group_cols + (n, a_correct, b_correct, only_a, only_b,
    mcnemar_chi2).
    """
    wa = Window.partitionBy(*group_cols).orderBy(
        F.col(score_a_col).desc(), F.col(id_col)
    )
    wb = Window.partitionBy(*group_cols).orderBy(
        F.col(score_b_col).desc(), F.col(id_col)
    )
    ranked = df.select(
        *group_cols,
        F.col(label_col).cast("long").alias("_y"),
        F.row_number().over(wa).alias("_ra"),
        F.row_number().over(wb).alias("_rb"),
    )
    sized = ranked.join(
        ranked.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n")), group_cols
    )
    cut = F.expr(f"n div {top_den}")
    ca = (F.col("_ra") <= cut) == (F.col("_y") == 1)
    cb = (F.col("_rb") <= cut) == (F.col("_y") == 1)
    one = lambda c: F.sum(F.when(c, F.lit(1)).otherwise(F.lit(0)))  # noqa: E731
    g = sized.groupBy(*group_cols).agg(
        F.max("n").alias("n"),
        one(ca).alias("a_correct"),
        one(cb).alias("b_correct"),
        one(ca & ~cb).alias("only_a"),
        one(~ca & cb).alias("only_b"),
    )
    b, c = F.col("only_a"), F.col("only_b")
    return g.select(
        *group_cols,
        "n",
        "a_correct",
        "b_correct",
        "only_a",
        "only_b",
        F.when(
            b + c > 0, ((b - c) * (b - c)).cast("double") / (b + c).cast("double")
        ).alias("mcnemar_chi2"),
    )


def group_mannwhitney(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group MANN-WHITNEY U test with tie correction — the
    significance companion to :func:`group_auc`: AUC answers "how well
    does the score separate", the tie-corrected z answers "is the
    separation more than noise" (the normal approximation is standard
    for n ≳ 20 per side).

        U₁ = R₁ − n₁(n₁+1)/2            (2·U₁ exact int64, the AUC
                                         rank-block machinery)
        σ² = n₁n₀/12 · [(n+1) − Σ(t³−t)/(n(n−1))]
        z  = (2U₁ − n₁n₀) / (2·σ)

    Determinism: 2R₁, n₁n₀, Σ(t³−t) and n(n−1) are exact int64
    (per-group n ≤ ~2M keeps t³ < 2⁶³; int64→double conversion is
    correctly rounded past 2⁵³, the group_auc contract); the close is a
    FIXED IEEE chain — one divide for the tie term, one subtract, one
    multiply, divide by 12, sqrt, scale, final divide — identical on
    both engines, bit-exact.  Degenerate groups (one-sided labels, or
    all scores tied ⇒ σ = 0) emit NULL z.

    Distributed shape: identical to group_auc — one partial-aggregated
    (group, score) collapse (row volume = distinct scores), one
    group-partitioned running-count window, one final groupBy.  No
    UDFs, no collects.

    Output: group_cols + (n_pos, n_neg, u1, z).
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
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tie_sum"),
    )
    n1, n0 = F.col("n_pos"), F.col("n_neg")
    n = n1 + n0
    two_u1 = F.col("two_r1") - n1 * (n1 + F.lit(1))
    dbl = lambda c: c.cast("double")  # noqa: E731
    # fixed IEEE chain, written identically in the SQL oracle
    tie_term = dbl(F.col("tie_sum")) / dbl(n * (n - F.lit(1)))
    var = dbl(n1 * n0) * (dbl(n + F.lit(1)) - tie_term) / F.lit(12.0)
    return g.select(
        *group_cols,
        "n_pos",
        "n_neg",
        (dbl(two_u1) / F.lit(2.0)).alias("u1"),
        F.when(
            (n1 > 0) & (n0 > 0) & (F.col("tie_sum") < n * n * n - n),
            dbl(two_u1 - n1 * n0) / (F.lit(2.0) * F.sqrt(var)),
        ).alias("z"),
    )


def poisson_thresholds(max_w: int = 6, space: int = 16 ** 15) -> list[int]:
    """Integer CDF thresholds for a deterministic Poisson(1) draw from a
    uniform 60-bit hash: t_k = floor(P(X ≤ k)·space) for k = 0..max_w−1
    (draws ≥ max_w clamp — P(X ≥ 6) < 6·10⁻⁴).  Computed ONCE in Python
    and INJECTED as int literals on both engines (the ndcg_discounts
    no-engine-side-transcendentals contract), so every weight decision
    is an exact integer compare."""
    import math

    acc, out = 0.0, []
    for k in range(max_w):
        acc += math.exp(-1) / math.factorial(k)
        out.append(int(acc * space))
    return out


def group_auc_bootstrap(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    id_col: str,
    n_boot: int = 20,
    max_w: int = 6,
) -> DataFrame:
    """Per-group AUC with a POISSON-BOOTSTRAP percentile interval — the
    error bar the point estimate lacks: is segment A's 0.74 really
    better than B's 0.71, or inside resampling noise?  The classic
    n-out-of-n bootstrap is undistributable (it needs a global sample
    index); the POISSON bootstrap (Chamandy et al. 2012, the
    large-scale standard) gives each row an independent Poisson(1)
    weight per replicate — here a DETERMINISTIC draw: the 60-bit md5 of
    (id, replicate) compared against injected integer CDF thresholds
    (:func:`poisson_thresholds`), so every weight is an exact integer
    decision and the whole resampling plan is hash-checkable.

    Each replicate's AUC is the weighted Mann-Whitney over (group,
    replicate, score) cells — :func:`group_auc_from_cells` verbatim,
    windows partitioned per (group, replicate), exact integers + one
    divide.  The interval is the two-pinned-rank percentile band over
    the sorted replicate AUCs (lo = rank max(1, B div 10), hi = rank
    B − B div 10 + 1 — the 10th/90th percentiles at B = 20), sorted on
    bit-identical doubles.

    Distributed shape: one explode to (B+1)×rows (B is a constant;
    replicate 0 carries the point estimate with weight 1), one cell
    collapse (distinct scores × (B+1) — a dimension), the proven
    rank-block window, then a B-bounded in-row sort per group.  No
    UDFs, no collects.

    Output: group_cols + (auc, n_boot_valid, ci_lo, ci_hi).
    """
    from functools import reduce as _reduce
    from operator import add as _add

    from usearch_spark.operators.sketch import _kmv_hash

    ts = poisson_thresholds(max_w)
    # replicate 0 is the POINT ESTIMATE riding the same explode with a
    # constant weight 1: its cells (cnt = count, pos = sum(y)) and the
    # shared group_auc_from_cells math are integer-for-integer the
    # group_auc(df, ...) computation, so the auc double is bit-identical
    # — and the upstream base pipeline runs ONCE instead of once per
    # branch (the point branch used to physically re-derive it)
    reps = df.select(
        *group_cols,
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("long").alias("_y"),
        F.col(id_col).cast("string").alias("_id"),
    ).withColumn("_b", F.explode(F.sequence(F.lit(0), F.lit(n_boot))))
    u = _kmv_hash(
        F.concat(F.col("_id"), F.lit(":"), F.col("_b").cast("string"))
    )
    w = F.when(
        F.col("_b") == 0, F.lit(1).cast("long")
    ).otherwise(_reduce(_add, [(u >= F.lit(t)).cast("long") for t in ts]))
    cells = (
        reps.withColumn("_w", w)
        .filter(F.col("_w") > 0)
        .groupBy(*group_cols, "_b", "_s")
        .agg(
            F.sum("_w").alias("cnt"),
            F.sum(F.col("_w") * F.col("_y")).alias("pos"),
        )
    )
    # one row per (group, replicate) — dimension-sized; materializing it
    # keeps the point/band self-join below from re-running the corpus
    # cell collapse under both sides
    per_rep = group_auc_from_cells(
        cells, [*group_cols, "_b"], "_s"
    ).localCheckpoint(eager=True)
    band = (
        per_rep.filter(F.col("_b") >= 1)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("auc")).alias("_arr"))
        .withColumn("_n", F.size("_arr"))
    )
    lo = F.expr("try_element_at(_arr, CAST(greatest(1, _n div 10) AS INT))")
    hi = F.expr(
        "try_element_at(_arr, CAST(least(_n, _n - _n div 10 + 1) AS INT))"
    )
    point = per_rep.filter(F.col("_b") == 0).select(*group_cols, "auc")
    return point.join(band, group_cols).select(
        *group_cols,
        "auc",
        F.col("_n").cast("long").alias("n_boot_valid"),
        F.when(F.col("_n") > 0, lo).alias("ci_lo"),
        F.when(F.col("_n") > 0, hi).alias("ci_hi"),
    )


def brier_scaled(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group BRIER SCORE (Brier 1950) of an INTEGER-scaled probability
    forecast: ``score_col`` holds integer scores s_i in [0, D] (the
    prediction is p_i = s_i/D) and ``label_col`` holds 0/1 outcomes.
    With D the global score span,

        brier = Σ (s_i − y_i·D)² / (n·D²)

    — the mean squared probability error, companion to eval_calibration
    (reliability bins) and eval_auc (ranking): AUC can look healthy while
    the probabilities themselves are off; Brier catches that.

    Determinism: the numerator is an EXACT int64 sum of squared integer
    residuals (callers size D so n·D² < 2⁶³ per group — documented
    contract, same as the LSH dot budget), the denominator n·D² is an
    exact int64, and the score is ONE long→double divide + round — no
    float accumulation anywhere.  Degenerate edge: a single distinct
    score (D = 0) gives NULL brier, not NaN/Inf — the forecast carries
    no information to score.

    Distributed shape: one partial-agg groupBy.  No windows, no UDFs.

    Output: group_cols + (n, n_pos, brier).
    """
    span = df.agg(
        (F.max(score_col).cast("long") - F.min(score_col).cast("long")).alias("_d"),
        F.min(score_col).cast("long").alias("_lo"),
    )
    resid = F.col("_s") - F.col("_lo") - F.col("_y") * F.col("_d")
    return (
        df.select(
            *group_cols,
            F.col(score_col).cast("long").alias("_s"),
            F.col(label_col).cast("long").alias("_y"),
        )
        .crossJoin(F.broadcast(span))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("n_pos"),
            F.sum(resid * resid).alias("_num"),
            F.max("_d").alias("_dd"),
        )
        .select(
            *group_cols,
            "n",
            "n_pos",
            F.when(
                F.col("_dd") > 0,
                F.col("_num").cast("double")
                / (F.col("n") * F.col("_dd") * F.col("_dd")).cast("double"),
            ).alias("brier"),
        )
    )


def population_stability_index(
    ref: DataFrame,
    cur: DataFrame,
    group_cols: list[str],
    val_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-group POPULATION STABILITY INDEX (the standard model-input
    drift monitor; PSI < 0.1 stable, > 0.25 action): quantile bins are
    cut on the REFERENCE period's integer values, both periods are
    binned against those cuts, and

        PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)

    with p/q the reference/current bin shares.  The score-level
    companion to corpus_js_drift's token-level divergence.

    Determinism (the corpus_js_drift transcendental contract, carried
    by the floor-quantization trick instead of an allow-listed round):
    bin CUTS are exact integers — cut_k = the smallest value whose
    running cell count reaches ceil(k·n_ref/n_bins), a rank-threshold
    lookup on (group, value) CELLS, never a float quantile — and bin
    assignment compares integers, so binning is bit-stable.  Each bin's
    contribution (p−q)·ln(p/q) is ALWAYS ≥ 0 and is one identical IEEE
    chain on both engines, quantized to an EXACT int64 in 1e-9 units by
    floor(x·1e9 + 0.5) (half-up; non-negative, so no half-away
    asymmetry); the per-group PSI is the exact integer sum of the
    quantized terms, and the only output floats are two single
    int→double divides.  Empty bins clamp their count to 1 (the
    standard zero-replacement) on BOTH engines.

    Distributed shape: two (group, value) cell collapses, one
    group-partitioned running-count window over CELLS (value
    cardinality, not row volume), broadcast cut arrays, two partial-agg
    bin counts.  No global windows, no UDFs, no collects.

    Output: group_cols + (bin, n_ref, n_cur, psi_contrib, psi) — one
    row per bin, psi repeated per group (the js_total pattern).
    """
    def cells(df: DataFrame, cnt: str) -> DataFrame:
        return (
            df.select(*group_cols, F.col(val_col).alias("_v"))
            .groupBy(*group_cols, "_v")
            .agg(F.count(F.lit(1)).alias(cnt))
        )

    # the cell collapses are the ONLY base-data passes; materialize each
    # once (value-cardinality rows — a dimension, never row volume).
    # Un-checkpointed, the ref cell pipeline re-ran under every consumer
    # (totals, the cut window, the bin count) — 32 physical base scans
    # for the events_psi entry
    cr = cells(ref, "_cr").localCheckpoint(eager=True)
    cc = cells(cur, "_cc").localCheckpoint(eager=True)
    tot_r = cr.groupBy(*group_cols).agg(F.sum("_cr").alias("_nr"))
    tot_c = cc.groupBy(*group_cols).agg(F.sum("_cc").alias("_nc"))
    w = Window.partitionBy(*group_cols).orderBy("_v")
    cum = cr.withColumn("_cum", F.sum("_cr").over(w)).join(tot_r, group_cols)
    kframe = ref.sparkSession.range(1).select(
        F.explode(F.sequence(F.lit(1), F.lit(n_bins - 1))).alias("_k")
    )
    cuts = (
        cum.select(*group_cols, "_v", "_cum", "_nr")
        .crossJoin(F.broadcast(kframe))
        .filter(
            F.col("_cum")
            >= F.expr(f"(_k * _nr + {n_bins} - 1) div {n_bins}")
        )
        .groupBy(*group_cols, "_k")
        .agg(F.min("_v").alias("_cut"))
    )
    # one row per group; shared by both binned() broadcasts
    carr = cuts.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.struct("_k", "_cut"))).alias("_s")
    ).select(
        *group_cols, F.expr("transform(_s, x -> x._cut)").alias("_cuts")
    ).localCheckpoint(eager=True)

    def binned(cell: DataFrame, cnt: str) -> DataFrame:
        b = F.expr(
            "aggregate(_cuts, 0, (acc, c) -> acc + IF(_v > c, 1, 0))"
        ).alias("bin")
        return (
            cell.join(F.broadcast(carr), group_cols)
            .select(*group_cols, b, F.col(cnt))
            .groupBy(*group_cols, "bin")
            .agg(F.sum(cnt).alias(cnt))
        )

    br = binned(cr, "_cr")
    bc = binned(cc, "_cc")
    grid = (
        br.join(bc, [*group_cols, "bin"], "full")
        .select(
            *group_cols,
            "bin",
            F.coalesce("_cr", F.lit(0)).alias("n_ref"),
            F.coalesce("_cc", F.lit(0)).alias("n_cur"),
        )
        .join(tot_r, group_cols)
        .join(tot_c, group_cols)
    )
    p = F.greatest(F.col("n_ref"), F.lit(1)).cast("double") / F.col("_nr").cast(
        "double"
    )
    q = F.greatest(F.col("n_cur"), F.lit(1)).cast("double") / F.col("_nc").cast(
        "double"
    )
    contrib = F.floor(
        ((p - q) * F.log(p / q)) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    # n_bins rows per group; the per/total fuse below is a self-join, so
    # without this the whole bin-grid pipeline would execute twice
    per = grid.select(
        *group_cols, "bin", "n_ref", "n_cur", contrib.alias("_t")
    ).localCheckpoint(eager=True)
    tot = per.groupBy(*group_cols).agg(
        (F.sum("_t").cast("double") / F.lit(1e9)).alias("psi")
    )
    return per.join(tot, group_cols).select(
        *group_cols,
        "bin",
        "n_ref",
        "n_cur",
        (F.col("_t").cast("double") / F.lit(1e9)).alias("psi_contrib"),
        "psi",
    )


def expected_calibration_error(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    id_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-group EXPECTED CALIBRATION ERROR (Naeini et al. 2015, the
    one-number summary of :func:`calibration_bins`' reliability diagram):
    with rank-percentile predictions p = rank/N in ``n_bins``
    equal-population bins,

        ECE = Σ_b (n_b/N)·|obs_b − pred_b|
        MCE = max_b |obs_b − pred_b|

    — the headline a model-monitoring dashboard tracks next to AUC
    (ranking can stay healthy while the probabilities drift; ECE is the
    drift number).

    Determinism — exact to the last bit: per bin,
    n_b·|obs_b − pred_b| = |pos_b·N − Σrank_b| / N, an EXACT int64
    numerator, so ECE = Σ_b |pos_b·N − Σrank_b| / N² is ONE
    long→double divide and MCE a max over per-bin single divides (each
    bit-exact, max order-independent).  Bound: the summed numerator is
    ≤ N², so groups must stay under ~3e9 rows for int64 — the same
    per-segment-dimension contract as calibration_bins.

    Distributed shape: one tie-broken group window for ranks (the
    calibration_bins shape), one partial-agg groupBy per bin, one
    per-group fold.  No UDFs, no collects.

    Output: group_cols + (n, n_bins_used, ece, mce).
    """
    w = Window.partitionBy(*group_cols).orderBy(score_col, id_col)
    ranked = df.select(
        *group_cols,
        F.col(label_col).cast("long").alias("_y"),
        F.row_number().over(w).cast("long").alias("_rank"),
    )
    n = ranked.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    j = ranked.join(n, group_cols).withColumn(
        "bin", F.expr(f"CAST(((_rank - 1) * {n_bins}) div _n AS INT)")
    )
    g = j.groupBy(*group_cols, "bin").agg(
        F.count(F.lit(1)).alias("n_bin"),
        F.sum("_rank").alias("_sum_rank"),
        F.sum("_y").alias("_n_pos"),
        F.max("_n").alias("_n"),
    )
    term = F.abs(F.col("_n_pos") * F.col("_n") - F.col("_sum_rank"))
    return (
        g.select(*group_cols, "n_bin", "_n", term.alias("_t"))
        .groupBy(*group_cols)
        .agg(
            F.max("_n").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_bins_used"),
            (
                F.sum("_t").cast("double")
                / (F.max("_n") * F.max("_n")).cast("double")
            ).alias("ece"),
            F.max(
                F.col("_t").cast("double")
                / (F.col("n_bin") * F.col("_n")).cast("double")
            ).alias("mce"),
        )
    )


def two_proportion_ztest(
    df: DataFrame,
    arm_col: str,
    success_col: str,
) -> DataFrame:
    """A/B-TEST evaluation: the pooled two-proportion z-test over a
    2-arm experiment frame (one row per unit, ``arm_col`` in {0, 1},
    ``success_col`` in {0, 1}):

        z = (p1 − p0) / sqrt( p̂(1−p̂)(1/n0 + 1/n1) ),   p̂ pooled

    with the relative lift (p1 − p0)/p0 — the conversion-experiment
    readout every growth pipeline runs; |z| > 1.96 is the usual 95%
    call.

    Determinism: all counts are exact integers; every rate is one
    divide; z and lift are fixed left-associated IEEE chains (sqrt
    correctly rounded) over those identical doubles — bit-exact with
    one closing round.  Degenerate arms are guarded: a zero-success
    control (x0 = 0) yields NULL lift instead of engine-dependent
    Inf, and a pooled rate of exactly 0 or 1 (se = 0) yields NULL z —
    both mirrored verbatim in the oracle.

    Distributed shape: ONE partial-agg aggregate over the unit frame;
    the test statistic assembles on a 1-row frame.  No windows, no
    UDFs.

    Output: one row (n0, x0, p0, n1, x1, p1, lift, z).
    """
    a = F.col(arm_col).cast("long")
    s = F.col(success_col).cast("long")
    g = df.agg(
        F.sum(F.when(a == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(a == 0, s).otherwise(0)).cast("long").alias("x0"),
        F.sum(F.when(a == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(a == 1, s).otherwise(0)).cast("long").alias("x1"),
    )
    p0 = F.col("x0").cast("double") / F.col("n0").cast("double")
    p1 = F.col("x1").cast("double") / F.col("n1").cast("double")
    pp = (F.col("x0") + F.col("x1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n0").cast("double")
            + F.lit(1.0) / F.col("n1").cast("double")
        )
    )
    return g.select(
        "n0",
        "x0",
        F.round(p0, 6).alias("p0"),
        "n1",
        "x1",
        F.round(p1, 6).alias("p1"),
        F.when(F.col("x0") > 0, (p1 - p0) / p0).alias("lift"),
        F.when(
            (F.col("x0") + F.col("x1") > 0)
            & (F.col("x0") + F.col("x1") < F.col("n0") + F.col("n1")),
            (p1 - p0) / se,
        ).alias("z"),
    )
