"""Descriptive graph statistics: degree distributions and triangle counts.

The reference's graph surface is scans + iterative BSP algorithms
(linkgraph/graph/graph.go, bsp/); these are the one-shot analytic
companions a graph analytics engine needs next to PageRank/SSSP —
degree histograms for skew diagnostics (what breaks a shuffle at 100 TB
is exactly a heavy-tailed out-degree), triangle counts for clustering
structure.

Scale notes:
  - Degree distribution is two narrow aggs (groupBy key -> count, then
    groupBy count -> count); both partial-aggregate map-side, the second
    agg's input is already tiny (one row per distinct degree).
  - Triangle counting enumerates wedges via two self-joins on the
    canonicalized (a < b) edge list.  The classic optimization baked in
    here: joining on the canonical orientation only (a<b<c) counts every
    triangle exactly once, cutting the wedge intermediate ~6x vs naive
    both-direction joins.  At 100 TB the edge list is bucketed by vertex
    so the self-joins co-locate; degree-ordered orientation (low-degree
    vertex first) would further bound wedge fan-out under skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from usearch_spark.plans.iterative import release_local_checkpoint


def degree_distribution(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Histogram of out- and in-degrees: (side, degree, n_vertices).

    ``side`` is 'out' (per-src) or 'in' (per-dst).  Input edges are assumed
    deduplicated; duplicates would inflate degrees.
    """
    out_d = edges.groupBy(F.col(src).alias("v")).agg(F.count(F.lit(1)).alias("degree"))
    in_d = edges.groupBy(F.col(dst).alias("v")).agg(F.count(F.lit(1)).alias("degree"))
    return (
        out_d.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
        .select(F.lit("out").alias("side"), "degree", "n_vertices")
        .unionByName(
            in_d.groupBy("degree")
            .agg(F.count(F.lit(1)).alias("n_vertices"))
            .select(F.lit("in").alias("side"), "degree", "n_vertices")
        )
    )


def canonical_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected edge set in canonical (a < b) orientation, deduplicated.
    Accepts a directed or both-directions edge list."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def project_bipartite(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_weight: int = 1,
    max_dst_degree: int | None = None,
    edges_deduped: bool = False,
) -> DataFrame:
    """Project a bipartite src→dst edge set onto the src side:
    (a, b, weight) with a < b and weight = number of shared dst vertices.

    The self-join explodes quadratically in each dst's degree — the classic
    scale hazard of co-occurrence projection.  ``max_dst_degree`` drops hub
    dst vertices above the cap BEFORE the join (the same df-cap pattern the
    dedup shingle join uses): a dst shared by thousands of sources
    contributes near-zero signal but O(d²) pairs.  At 100 TB this cap is
    what keeps the projection runnable; the weight then undercounts only
    on dropped hubs, which callers opt into explicitly.

    ``edges_deduped``: skip the defensive (s, d) dedup shuffle when the
    caller's edge set already enforces identity (e.g. the persisted graph
    artifact) — same contract as pagerank's flag.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if not edges_deduped:
        e = e.dropDuplicates(["s", "d"])
    if max_dst_degree is not None:
        keep = (
            e.groupBy("d")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") <= max_dst_degree)
            .select("d")
        )
        e = e.join(keep, "d", "left_semi")
    left = e.select(F.col("s").alias("a"), "d")
    right = e.select(F.col("s").alias("b"), "d")
    pairs = (
        left.join(right, "d", "inner")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    if min_weight > 1:
        pairs = pairs.filter(F.col("weight") >= min_weight)
    return pairs


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_dst_degree: int | None = None,
    edges_deduped: bool = False,
) -> DataFrame:
    """Link-prediction scores over a bipartite src→dst graph projected on
    the src side: AA(a,b) = Σ_{shared dst z} 1/ln(deg(z)) — the classic
    Adamic-Adar weighting where rare shared neighbors count more than
    hubs.  Returns (a, b, aa_score, n_common) with a < b.

    Same scale shape (and the same hub-cap lever) as
    :func:`project_bipartite`: the per-dst self-join is the quadratic
    hazard, and ``max_dst_degree`` drops hub dst vertices before the join
    — which AA ALSO wants semantically, since a hub's 1/ln(deg) weight is
    near zero.  deg(z) >= 2 for any shared neighbor, so ln never hits 0.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if not edges_deduped:
        e = e.dropDuplicates(["s", "d"])
    deg = e.groupBy("d").agg(F.count(F.lit(1)).alias("dg"))
    if max_dst_degree is not None:
        deg = deg.filter(F.col("dg") <= max_dst_degree)
        e = e.join(deg.select("d"), "d", "left_semi")
    w = deg.select("d", (F.lit(1.0) / F.log(F.col("dg").cast("double"))).alias("w"))
    left = e.select(F.col("s").alias("a"), "d")
    right = e.select(F.col("s").alias("b"), "d")
    return (
        left.join(right, "d")
        .filter(F.col("a") < F.col("b"))
        .join(w, "d")
        .groupBy("a", "b")
        .agg(
            F.round(F.sum("w"), 6).alias("aa_score"),
            F.count(F.lit(1)).alias("n_common"),
        )
    )


def kcore_peel(
    vertices: DataFrame,
    edges: DataFrame,
    k: int,
    rounds: int = 4,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    vertices_cover_edges: bool = False,
) -> DataFrame:
    """k-core peeling, ``rounds`` synchronous rounds: repeatedly drop
    vertices whose degree within the surviving set is < k.  Returns the
    survivors with their final in-core degree (id, core_degree).

    Fixed-round form (like coloring/LPA) so a SQL oracle can unroll the
    identical recurrence; on most graphs peeling stabilizes in a handful
    of rounds, and extra rounds are no-ops.  Per round: one semi-join of
    the edge list against the survivor set + one degree agg — both keyed
    on vertex id.  The undirected edge set is materialized once.
    """
    und = canonical_edges(edges, src, dst)
    both = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).localCheckpoint(
        eager=True
    )
    alive = vertices.select(F.col(id_col).alias("id")).dropDuplicates(["id"]).localCheckpoint(eager=True)
    n_alive = alive.count()
    deg = None
    # 2-generation liveness: the lazy `deg` of round r still references
    # round r-1's alive checkpoint (the final result joins it), so only
    # the checkpoint TWO generations back is provably dead
    stale, older = alive, None
    for r in range(rounds):
        if r == 0 and vertices_cover_edges:
            # caller guarantees every edge endpoint is a vertex, so round
            # 1's semi-joins are identity — skip both shuffles
            e_alive = both
        else:
            e_alive = both.join(
                alive.select(F.col("id").alias("a")), "a", "left_semi"
            ).join(alive.select(F.col("id").alias("b")), "b", "left_semi")
        deg = e_alive.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("core_degree"))
        alive = deg.filter(F.col("core_degree") >= k).select("id").localCheckpoint(eager=True)
        release_local_checkpoint(older)
        older, stale = stale, alive
        n_next = alive.count()
        if n_next == n_alive:
            # fixpoint: every further round recomputes the identical
            # (alive, deg) pair, so stopping early returns exactly the
            # fixed-round result
            break
        n_alive = n_next
    if deg is None:
        return alive.withColumn("core_degree", F.lit(0).cast("long"))
    return alive.join(deg, "id", "inner").select("id", "core_degree")


def _coreness_local(e: DataFrame, rounds: int, id_type: str) -> DataFrame:
    """Single-task numpy mirror of the h-index iteration: the doubled
    edge list ships once through Arrow, one task runs every round, and
    the per-endpoint (id, val) frame comes back (the final left join
    against the vertex set stays in DataFrame-land, shared with the
    distributed path).  All decisions are integer (counts, ranks,
    max-min) — bit-identical to the distributed recurrence by
    construction, including the unchanged-total early exit (h is
    monotone non-increasing, so a stable total is a fixpoint and the
    early exit returns exactly the fixed-round result)."""

    def solve(batches):
        import ctypes as _ct
        import gc as _gc

        # worker prelude (see session.udf_worker_prelude for the measured
        # pathology): malloc heap reuse + cyclic gc paused for the body,
        # ONE sweep in the epilogue after the big frames are dropped
        try:
            _libc = _ct.CDLL("libc.so.6", use_errno=True)
            _libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
            _libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
        except Exception:
            pass  # non-glibc: skip
        _gc.disable()
        import numpy as np
        import pandas as pd

        parts = list(batches)
        df = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"a": [], "b": []})
        )
        if df.empty:
            _gc.enable()
            return
        # factorize both endpoint columns against ONE id universe
        codes, ids = pd.factorize(pd.concat([df["a"], df["b"]], ignore_index=True))
        m = len(df)
        ai, bi = codes[:m], codes[m:]
        n = len(ids)
        # group edges by a once — the CSR layout is round-invariant
        order = np.argsort(ai, kind="stable")
        ai_s, bi_s = ai[order], bi[order]
        counts = np.bincount(ai_s, minlength=n)
        # every id appears as `a` in the doubled edge set, so every group
        # is non-empty and reduceat over the starts covers all n vertices
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        h = counts.astype("int64")  # h0 = degree
        total = int(h.sum())
        big = np.int64(m + 1)  # > any h value; composite sort key base
        rn_base = np.arange(m, dtype="int64") - np.repeat(starts, counts) + 1
        for _ in range(rounds):
            vals = h[bi_s]
            # per-group DESC value order via one composite argsort
            ord2 = np.argsort(ai_s * big + (big - 1 - vals), kind="stable")
            vals_sorted = vals[ord2]
            # rn restarts at 1 per group (ord2 keeps groups contiguous)
            cand = np.where(vals_sorted >= rn_base, rn_base, 0)
            h = np.maximum.reduceat(cand, starts)
            t_next = int(h.sum())
            if t_next == total:
                break  # monotone non-increasing: unchanged total = fixpoint
            total = t_next
        out = pd.DataFrame({"id": ids, "val": h.astype("int32")})
        del df, parts
        _gc.enable(); _gc.collect()
        yield out

    return e.coalesce(1).mapInPandas(solve, schema=f"id {id_type}, val int")


def coreness(
    vertices: DataFrame,
    edges: DataFrame,
    rounds: int = 8,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    strategy: str = "auto",
) -> DataFrame:
    """Per-vertex core NUMBER (full coreness decomposition), rounds-bounded:
    the h-index iteration of Lü et al. 2016 — h₀(v) = degree(v),
    h_{t+1}(v) = H-index of {h_t(u) : u ~ v} — which converges to the core
    number monotonically from above.  The classic Batagelj–Zaversnik peel
    is inherently sequential (remove ONE min-degree vertex at a time); the
    h-index form is the distributed-native equivalent: every vertex updates
    in the same per-round join + per-key window, so one round is one
    edges⋈h shuffle regardless of |V|.

    Fixed-round form like kcore_peel so a SQL oracle can unroll the
    identical recurrence; h values only decrease, so an unchanged total is
    a fixpoint and early exit returns exactly the fixed-round result.
    Ties inside the per-vertex H-index window don't affect the result
    (max-min over a multiset), so the row_number tie order is free.

    Relation to :func:`kcore_peel` (pinned in tests): once converged,
    coreness(v) >= k  iff  v survives the k-core peel.

    ``strategy``: like katz/harmonic — "auto" runs the IDENTICAL h-index
    recurrence as a single-task numpy solve when |V|+|E| is at or below
    ``LOCAL_SOLVE_MAX_ROWS`` (eight distributed rounds of join + window
    + agg are pure scheduling floor at bench scale), and the
    per-round DataFrame loop above it (the only shape that scales).
    Every decision in the recurrence is an integer (degrees, ranks,
    max-min, the unchanged-total early exit), so the two paths are
    bit-identical and the oracle is strategy-independent.

    Returns (id, coreness) for every vertex, 0 for isolated ones.
    """
    from pyspark.sql import Window

    from usearch_spark.plans.iterative import (
        LOCAL_SOLVE_MAX_ROWS,
        checkpoint_with_metrics,
        loop_tuned_session,
    )

    und = canonical_edges(edges, src, dst)
    e = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b"))).localCheckpoint(
        eager=True
    )
    v = vertices.select(F.col(id_col).alias("id")).dropDuplicates(["id"])
    n_rows = v.count() + e.count()
    spark = vertices.sparkSession
    if strategy == "auto":
        strategy = "local" if n_rows <= LOCAL_SOLVE_MAX_ROWS else "distributed"
    if strategy == "local":
        id_type = dict(e.dtypes)["a"]
        h_local = _coreness_local(e, rounds, id_type)
        return v.join(h_local, "id", "left").select(
            "id", F.coalesce(F.col("val"), F.lit(0)).alias("coreness")
        )
    h0 = e.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).cast("int").alias("val"))
    with loop_tuned_session(spark, n_rows):
        # the fixpoint detector (Σ val) rides inside each round's checkpoint
        # job — no separate .agg().first() action per round
        h, m = checkpoint_with_metrics(h0, total=F.coalesce(F.sum("val"), F.lit(0)))
        total = int(m["total"])
        for _ in range(rounds):
            nb = e.join(h.select(F.col("id").alias("b"), "val"), "b").select("a", "val")
            w = Window.partitionBy("a").orderBy(F.desc("val"))
            nxt = (
                nb.withColumn("rn", F.row_number().over(w))
                .groupBy(F.col("a").alias("id"))
                .agg(
                    F.max(F.when(F.col("val") >= F.col("rn"), F.col("rn")).otherwise(0))
                    .cast("int")
                    .alias("val")
                )
            )
            prev_h = h
            h, m = checkpoint_with_metrics(nxt, total=F.coalesce(F.sum("val"), F.lit(0)))
            release_local_checkpoint(prev_h)
            t_next = int(m["total"])
            if t_next == total:
                break  # h is monotone non-increasing: unchanged total = fixpoint
            total = t_next
    return v.join(h, "id", "left").select(
        "id", F.coalesce(F.col("val"), F.lit(0)).alias("coreness")
    )


def maximal_matching(
    vertices: DataFrame,
    edges: DataFrame,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic maximal matching by local-minimum edge selection
    (the parallel symmetry-breaking pattern of Luby's algorithm, applied
    to edges): each round, an edge joins the matching iff its priority is
    the strict minimum among ALL edges sharing either endpoint; matched
    vertices drop out and the rest re-compete.  Expected O(log n) rounds;
    a maximal matching is the standard coarsening/contraction primitive
    (multilevel partitioners, graph sparsifiers).

    Priorities are md5 strings of the LENGTH-PREFIXED canonical edge
    ("len(a):a|len(b):b") — length prefixes make the encoding injective
    for arbitrary id strings (a bare "a|b" concat would alias e.g.
    ('x|','y') and ('x','|y'), letting two edges that share a vertex
    both pass the strict-min filter).  One global total order any engine
    reproduces, no rand(), so the matching is deterministic and
    SQL-replayable.  Null-id edges never reach the priority: canonical
    orientation collapses them to a == b and they are filtered.  Per
    round: one per-vertex min agg + one anti-join, both keyed on vertex
    ids.  Returns the matching as canonical (a, b) rows.  Fixed-round
    form (extra rounds past the empty edge set are no-ops) so an oracle
    can unroll it.
    """
    from usearch_spark.plans.iterative import checkpoint_with_metrics, loop_tuned_session

    e = canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    matching = None
    prev_e = e  # sel checkpoints stay live (matching unions them); e does not
    # the rounds are classic small fixed-shape supersteps: size their
    # shuffles to the live edge set and skip AQE's per-job barriers
    with loop_tuned_session(vertices.sparkSession, e.count()):
        for _ in range(rounds):
            pr = F.md5(
                F.concat(
                    F.length("a").cast("string"), F.lit(":"), F.col("a"),
                    F.lit("|"),
                    F.length("b").cast("string"), F.lit(":"), F.col("b"),
                )
            )
            ep = e.withColumn("pr", pr)
            incid = ep.select(F.col("a").alias("v"), "pr").unionAll(
                ep.select(F.col("b").alias("v"), "pr")
            )
            vmin = incid.groupBy("v").agg(F.min("pr").alias("vmin"))
            sel = (
                ep.join(vmin.select(F.col("v").alias("a"), F.col("vmin").alias("ma")), "a")
                .join(vmin.select(F.col("v").alias("b"), F.col("vmin").alias("mb")), "b")
                .filter((F.col("pr") == F.col("ma")) & (F.col("pr") == F.col("mb")))
                .select("a", "b")
                .localCheckpoint(eager=True)
            )
            matching = sel if matching is None else matching.unionAll(sel)
            touched = sel.select(F.col("a").alias("v")).unionAll(sel.select(F.col("b").alias("v")))
            # the survivor count rides the checkpoint job (one action per
            # round instead of checkpoint + isEmpty)
            e, m = checkpoint_with_metrics(
                e.join(touched.select(F.col("v").alias("a")), "a", "left_anti")
                .join(touched.select(F.col("v").alias("b")), "b", "left_anti"),
                cnt=F.count(F.lit(1)),
            )
            release_local_checkpoint(prev_e)
            prev_e = e
            if int(m["cnt"]) == 0:
                break
    if matching is None:
        return e.select("a", "b")  # empty frame with the right schema
    return matching.select("a", "b")


def coarsen_graph(
    vertices: DataFrame,
    edges: DataFrame,
    rounds: int = 8,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """One multilevel coarsening round: contract the deterministic maximal
    matching — each matched pair becomes one supervertex (named by its
    smaller member), unmatched vertices survive as themselves — and
    return the coarse weighted edge list (sa, sb, weight) with weight =
    number of original edges collapsed onto the supervertex pair
    (self-loops dropped).  Roughly halves the graph per level; this is
    the contraction step of METIS-style multilevel partitioners and of
    graph sparsification pipelines."""
    m = maximal_matching(vertices, edges, rounds=rounds, src=src, dst=dst)
    v = vertices.select(F.col(id_col).alias("v")).dropDuplicates(["v"])
    pair_map = m.select(F.col("b").alias("v"), F.col("a").alias("rep")).unionByName(
        m.select(F.col("a").alias("v"), F.col("a").alias("rep"))
    )
    mapping = v.join(pair_map, "v", "left").select(
        "v", F.coalesce(F.col("rep"), F.col("v")).alias("rep")
    )
    e = canonical_edges(edges, src, dst)
    mapped = (
        e.join(mapping.select(F.col("v").alias("a"), F.col("rep").alias("ra")), "a")
        .join(mapping.select(F.col("v").alias("b"), F.col("rep").alias("rb")), "b")
        .filter(F.col("ra") != F.col("rb"))
    )
    return (
        mapped.select(
            F.least("ra", "rb").alias("sa"), F.greatest("ra", "rb").alias("sb")
        )
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


from usearch_spark.functions.hll import (  # noqa: E402 — shared HLL core
    HLL_M,
    HLL_SHIFT,
    hll_estimate_sql,
    hll_reg_sql,
    hll_rho_sql,
)


def hyperball_harmonic(
    vertices: DataFrame,
    edges: DataFrame,
    rounds: int = 4,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    states_hint: list | None = None,
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): approximate harmonic centrality
    for EVERY vertex via HyperLogLog-counter BFS —
    harmonic(v) = Σ_t (|B(v,t)| − |B(v,t−1)|)/t with ball sizes |B(v,t)|
    estimated by a 16-register HLL per vertex.  This is the form that is
    SF-INDEPENDENT at 100 TB: state is O(|V|·m) rows regardless of how
    many vertices each ball contains (the exact sampled-source
    :func:`harmonic_centrality` costs one traversal per sample source;
    HyperBall covers all sources at once, trading exactness for the HLL
    error ~1.04/√m).

    Scale shape: per round, ONE edges⋈state shuffle ships neighbor
    registers and a (v, reg) max-combine folds them — identical cost
    profile to the h-index coreness loop; no per-source dimension.

    Hash-gate determinism (no rand(), no platform math):
      * registers are md5-derived — index = first hex digit, rank =
        leading zero bits of the next 14 hex chars (:func:`hll_reg_sql` /
        :func:`hll_rho_sql` emit the SAME SQL text both engines run);
      * the HLL sum Σ 2^(−M_j) is computed as the exact INTEGER
        Σ 2^(58−M_j) (empty registers contribute 2^58), so no
        float-summation-order dependence exists; the estimate is one
        double division alpha_c / S_scaled;
      * the small-range linear-counting correction m·ln(m/V) uses
        PRECOMPUTED ln constants (V has only 15 possible values) baked
        into the shared estimator SQL (:func:`hll_estimate_sql`) — no
        engine log() whose ulp behavior could differ; the harmonic
        ACCUMULATION mirrors the oracle's op order term by term, so the
        result is bit-identical.

    Returns (id, harmonic_approx, ball_approx) with both estimates
    rounded at 6.  ``states_hint``: pre-materialized register states from
    :func:`hll_register_states`, so callers running several
    HyperBall-family queries on the same graph pay the register BFS once.
    """
    from usearch_spark.plans.iterative import loop_tuned_session

    states = states_hint if states_hint is not None else hll_register_states(
        vertices, edges, rounds, id_col, src, dst
    )
    with loop_tuned_session(vertices.sparkSession, _states_rows(states)) as _:
        return _hyperball_loop(states)


def _states_rows(states) -> int:
    """Shuffle-sizing hint for the accumulation joins: the register-state
    row count of the final round (already materialized — count is
    metadata-cheap on a checkpointed frame)."""
    return states[-1][1].count()


def hll_register_states(
    vertices: DataFrame,
    edges: DataFrame,
    rounds: int = 4,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
) -> list:
    """Materialize the per-round HLL register states ONCE as a list of
    (t, checkpointed frame) — the expensive register-BFS shared by
    :func:`hyperball_harmonic` and :func:`hyperball_neighborhood` (pass
    the list via ``states_hint``, the same share-the-corpus-pass pattern
    as the covariance/PCA trio)."""
    from usearch_spark.plans.iterative import loop_tuned_session

    v = vertices.select(F.col(id_col).alias("v")).dropDuplicates(["v"]).localCheckpoint(
        eager=True
    )
    e = canonical_edges(edges, src, dst)
    und = e.select(F.col("a").alias("x"), F.col("b").alias("y")).unionByName(
        e.select(F.col("b").alias("x"), F.col("a").alias("y"))
    ).localCheckpoint(eager=True)
    # per-round work is |V|*m register rows — size the shuffle to it (the
    # default partition count turns each tiny round into scheduling floor)
    with loop_tuned_session(v.sparkSession, v.count() * HLL_M) as _:
        return list(_hll_states(v, und, rounds))


def _hll_estimate_frame(st: DataFrame) -> DataFrame:
    """(v, e) ball estimates from a register state frame.  shiftleft's
    Python API wants a literal bit count; the SQL form takes an
    expression (and mirrors the oracle's `<<` exactly).  The estimator
    itself is ONE shared SQL text (hll_estimate_sql) evaluated verbatim
    by both engines."""
    return st.groupBy("v").agg(
        F.expr(f"sum(shiftleft(CAST(1 AS BIGINT), {HLL_SHIFT} - rho))").alias(
            "s_present"
        ),
        F.count(F.lit(1)).alias("nreg"),
    ).select("v", F.expr(hll_estimate_sql()).alias("e"))


def _hll_states(v: DataFrame, und: DataFrame, rounds: int):
    """Yield (t, register-state frame) for t = 0..rounds, each state
    checkpointed.  DELTA propagation (Boldi & Vigna's systolic
    optimization): only registers that IMPROVED last round ship along
    edges this round — by monotonicity of max-combine the per-round
    states are identical to full re-shipping, but late rounds (when most
    balls have saturated) move a fraction of the register volume."""
    state = v.select(
        "v",
        F.expr(hll_reg_sql("v")).cast("int").alias("reg"),
        F.expr(hll_rho_sql("v")).cast("int").alias("rho"),
    ).localCheckpoint(eager=True)
    yield 0, state
    delta = state
    for t in range(1, rounds + 1):
        shipped = und.join(delta.withColumnRenamed("v", "y"), "y").select(
            F.col("x").alias("v"), "reg", "rho"
        )
        cand = shipped.groupBy("v", "reg").agg(F.max("rho").alias("crho"))
        merged = (
            state.join(cand, ["v", "reg"], "full")
            .select(
                "v",
                "reg",
                F.greatest(
                    F.coalesce(F.col("rho"), F.lit(-1)), F.coalesce(F.col("crho"), F.lit(-1))
                ).alias("rho"),
                (
                    F.coalesce(F.col("crho"), F.lit(-1))
                    > F.coalesce(F.col("rho"), F.lit(-1))
                ).alias("_new"),
            )
            .localCheckpoint(eager=True)
        )
        state = merged.select("v", "reg", "rho")
        delta = merged.filter(F.col("_new")).select("v", "reg", "rho")
        yield t, state


def _hyperball_loop(states: list) -> DataFrame:
    h = None
    for t, state in states:
        est = _hll_estimate_frame(state)
        if t == 0:
            h = est.select("v", F.lit(0.0).alias("h"), F.col("e").alias("e_prev"))
            continue
        # h stays LAZY: the accumulation is a shallow chain of |rounds|
        # joins over |V|-row frames — checkpointing it per round cost one
        # extra action each (a third of the query's wall clock at sf0.1)
        h = h.join(est, "v").select(
            "v",
            (F.col("h") + (F.col("e") - F.col("e_prev")) / F.lit(float(t))).alias("h"),
            F.col("e").alias("e_prev"),
        )
    # ONE materialization of the whole lazy chain inside the tuned session
    # (the caller's context restores partition confs on exit — an unlazy
    # return would execute the joins under the untuned settings)
    return h.select(
        F.col("v").alias("id"),
        F.round("h", 6).alias("harmonic_approx"),
        F.round("e_prev", 6).alias("ball_approx"),
    ).localCheckpoint(eager=True)


def hyperball_neighborhood(
    vertices: DataFrame,
    edges: DataFrame,
    rounds: int = 4,
    coverage: float = 0.9,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    states_hint: list | None = None,
) -> DataFrame:
    """The NEIGHBORHOOD FUNCTION and effective diameter — what HyperBall
    was built for (Boldi & Vigna ran it on the Facebook graph for the
    "four degrees of separation" result): N(t) = Σ_v |B(v,t)| estimated
    per round from the same HLL register states as
    :func:`hyperball_harmonic`, and the ``coverage``-effective diameter
    = the interpolated t at which N(t) reaches coverage·N(rounds).

    Returns one row per round: (t, nf, eff_diameter) with the diameter
    as a constant column.  Per-vertex estimates quantize to round-6
    decimals before the corpus-wide sum, so N(t) is order-independent
    and the whole curve replays in the oracle; the interpolation
    d = (t−1) + (cov·N(R) − N(t−1)) / (N(t) − N(t−1)) mirrors the
    oracle's op order exactly.  The per-round scalar collect is
    metadata-scale (one decimal per round).  ``states_hint``: share the
    register BFS with :func:`hyperball_harmonic` via
    :func:`hll_register_states`."""
    from usearch_spark.plans.iterative import loop_tuned_session

    spark = vertices.sparkSession
    states = states_hint if states_hint is not None else hll_register_states(
        vertices, edges, rounds, id_col, src, dst
    )
    nf: list[float] = []
    with loop_tuned_session(spark, _states_rows(states)) as _:
        for t, state in states:
            dec = (
                _hll_estimate_frame(state)
                .agg(F.sum(F.round("e", 6).cast("decimal(24,6)")).alias("nf"))
                .first()["nf"]
            )
            nf.append(float(dec))  # decimal -> double, correctly rounded
    target = coverage * nf[rounds]
    t_star = next(t for t in range(rounds + 1) if nf[t] >= target)
    if t_star == 0:
        d_eff = 0.0
    else:
        d_eff = (t_star - 1) + (target - nf[t_star - 1]) / (nf[t_star] - nf[t_star - 1])
    return spark.createDataFrame(
        [(t, nf[t], d_eff) for t in range(rounds + 1)],
        "t int, nf double, eff_diameter double",
    )


def modularity(
    communities: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    community_col: str = "community",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Newman modularity of a community assignment over the undirected
    edge set: Q = Σ_c [ e_c/m − (d_c/(2m))² ] — the standard quality
    score for any partitioner's output (label propagation, k-way parts,
    dedup clusters).  Returns one row per community
    (community, n_members, internal_edges, degree_sum, q_contrib) with
    the global Q as a constant ``modularity`` column.

    Scale shape: two joins of the edge list against the (vertex →
    community) map plus two narrow aggs — nothing quadratic; the
    community map broadcasts when small.  Hash-gate determinism: every
    input is an integer (e_c, d_c, m), so each contribution is computed
    EXACTLY — Q_c = (4m·e_c − d_c²)/(4m²) quantized at 1e-12 by integer
    long division with a half-away-from-zero bump (2·remainder vs
    divisor), never by rounding a double quotient (the boundary class
    behind every lifetime red cell; see embedding_covariance).  The
    rounded contributions are exact 1e-12 integers, so the global Q is
    an exact integer sum + ONE double divide — order-independent and
    bit-identical on any engine.  Widths: all scale-0 decimals, exact
    for m up to ~2.5e12 edges (4m²·1e12 < 1e38).

    ``communities`` must COVER every edge endpoint (any partitioner's
    total assignment does): an edge with an unmapped endpoint silently
    drops from the internal-edge count via the inner join, skewing Q.
    """
    und = canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    m = und.count()
    comm = communities.select(
        F.col(id_col).alias("v"), F.col(community_col).alias("c")
    )
    ca = comm.select(F.col("v").alias("a"), F.col("c").alias("ca"))
    cb = comm.select(F.col("v").alias("b"), F.col("c").alias("cb"))
    tagged = und.join(ca, "a").join(cb, "b")
    internal = (
        tagged.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dsum = (
        comm.join(deg, "v", "left")
        .groupBy("c")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.coalesce(F.col("deg"), F.lit(0))).alias("degree_sum"),
        )
    )
    # exact-integer round-12: num_u = (4m·1e12)·e_c − 1e12·d_c² is the
    # contribution numerator in 1e-12·(4m²) units; q12 = half-away
    # integer division by 4m² gives round(Q_c, 12)·1e12 exactly.
    d_units = 4 * m * m
    per = (
        dsum.join(internal, "c", "left")
        .select(
            F.col("c").alias("community"),
            "n_members",
            F.coalesce(F.col("internal_edges"), F.lit(0)).alias("internal_edges"),
            "degree_sum",
        )
        .withColumn(
            "num_u",
            F.expr(f"CAST('{4 * m * 10**12}' AS DECIMAL(38,0))")
            * F.col("internal_edges").cast("decimal(18,0)")
            - F.expr("CAST('1000000000000' AS DECIMAL(13,0))")
            * F.col("degree_sum").cast("decimal(18,0)")
            * F.col("degree_sum").cast("decimal(18,0)"),
        )
        .withColumn("a_u", F.abs(F.col("num_u")))
        .withColumn("sgn", F.when(F.col("num_u") < 0, F.lit(-1)).otherwise(F.lit(1)))
        .withColumn(
            "q12",
            F.col("sgn")
            * (
                F.expr(f"a_u DIV CAST('{d_units}' AS DECIMAL(32,0))")
                + F.expr(
                    f"CASE WHEN (a_u % CAST('{d_units}' AS DECIMAL(32,0))) * 2"
                    f" >= CAST('{d_units}' AS DECIMAL(33,0)) THEN 1 ELSE 0 END"
                )
            ),
        )
    )
    total = per.agg(
        (F.sum("q12").cast("double") / F.lit(1e12)).alias("modularity")
    )
    return per.select(
        "community",
        "n_members",
        "internal_edges",
        "degree_sum",
        (F.col("q12").cast("double") / F.lit(1e12)).alias("q_contrib"),
    ).crossJoin(F.broadcast(total))


def densest_subgraph(
    vertices: DataFrame,
    edges: DataFrame,
    rounds: int = 8,
    eps: float = 0.1,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Approximate DENSEST SUBGRAPH by parallel peeling (Charikar 2000 /
    Bahmani, Kumar & Vassilvitskii 2012): per round, with survivors S and
    density ρ = |E(S)|/|S|, every vertex of degree <= 2(1+eps)·ρ is
    removed AT ONCE; the answer is the survivor set of the round with the
    maximum density seen (ties: earliest round).  Guarantees density
    >= ρ*/(2(1+eps)) in O(log n) rounds — the MapReduce-native form of
    the greedy peel (the sequential remove-one-min-degree variant is
    O(|V|) rounds, a non-starter at scale).

    The dense core is the "community nucleus" lens next to k-core /
    k-truss: k-core fixes the degree bound, densest-subgraph OPTIMIZES
    average degree.  Per round: two semi-joins (edges among survivors) +
    one degree agg — the kcore_peel cost shape; the per-round density and
    threshold are driver-side arithmetic on two counts, so the loop is
    deterministic and a SQL oracle unrolls the identical recurrence
    (union every round's survivor list, pick the best round's).

    Returns (id, density): the best round's survivors, each carrying that
    round's exact |E|/|S| double (no rounding — both engines compute the
    identical IEEE division of two integers).
    """
    und = canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    s = vertices.select(F.col(id_col).alias("id")).dropDuplicates(["id"]).localCheckpoint(
        eager=True
    )
    c_thr = 2.0 * (1.0 + eps)
    best_density, best_members = -1.0, s
    prev_e_s, prev_s = None, None
    for _ in range(rounds):
        e_s = und.join(s.select(F.col("id").alias("a")), "a", "left_semi").join(
            s.select(F.col("id").alias("b")), "b", "left_semi"
        ).localCheckpoint(eager=True)
        # the previous round's survivor frames are dead once this round's
        # e_s materializes — except a survivor set still held as the best
        release_local_checkpoint(prev_e_s)
        if prev_s is not None and prev_s is not best_members:
            release_local_checkpoint(prev_s)
        prev_e_s, prev_s = e_s, s
        n = s.count()
        if n == 0:
            break
        m = e_s.count()
        density = m / n  # IEEE double of two ints — identical in any engine
        if density > best_density:
            best_density, best_members = density, s
        thr = c_thr * density
        deg = (
            e_s.select(F.col("a").alias("id"))
            .unionAll(e_s.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        s = (
            s.join(deg, "id", "left")
            .filter(F.coalesce(F.col("deg"), F.lit(0)) > thr)
            .select("id")
            .localCheckpoint(eager=True)
        )
    return best_members.select("id", F.lit(best_density).alias("density"))


def partition_kway(
    vertices: DataFrame,
    edges: DataFrame,
    k: int,
    levels: int = 2,
    match_rounds: int = 5,
    refine_rounds: int = 1,
    eps: float = 0.3,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """METIS-style multilevel k-way edge-cut partitioning — T1's 100-TB
    form: the reference shards the CRAWL by URL range
    (monolith/partition/range.go:21-95); sharding the GRAPH itself needs
    an edge-cut partitioner so BSP supersteps ship few cross-shard
    messages.  Three phases, all deterministic and SQL-replayable:

    1. COARSEN ``levels`` times via the deterministic maximal matching
       (:func:`maximal_matching`): matched pairs contract into weighted
       supervertices (weight = member count), parallel edges merge their
       weights.  Each level roughly halves the graph, so the expensive
       phases run on a ~2^levels-times-smaller graph.
    2. INITIAL ASSIGNMENT on the coarsest graph by weighted prefix
       ranges: supervertices sorted by (weight desc, id), each assigned
       part = floor(k · cum_weight_before / total_weight) — balanced by
       construction, one window over the (tiny, coarsened) frame.
    3. UNCOARSEN + REFINE: walking back up the hierarchy, each level
       projects parts through its contraction map, then runs
       ``refine_rounds`` synchronous boundary-refinement rounds: every
       vertex scores its edge weight into each neighboring part,
       proposes the max-gain move (ties: smaller part id), and per
       destination part only the top-(capacity slack) movers by
       (gain desc, md5(v)) are accepted — the balance cap is
       ceil((1+eps)·total/k).  Jacobi-style parallel moves (standard for
       distributed refinement): per round one edges⋈parts join + two
       bounded windows, no driver data loop.

    Returns (id, part, part_weight, edge_cut): every ORIGINAL vertex
    with its 0-based part, the part's total vertex weight (balance is
    hash-gated), and the global edge cut as a constant column.

    Balance guarantee: refinement is weight-cumulative against the cap,
    so it never pushes a part past ceil((1+eps)·|V|/k).  The prefix-range
    initial assignment can overshoot a part by at most
    (max supervertex weight − 1) <= 2^levels − 1 when a heavy
    supervertex straddles a range boundary — choose
    eps >= k·(2^levels − 1)/|V| for a hard end-to-end cap.
    """
    import math

    v0 = vertices.select(F.col(id_col).alias("v")).dropDuplicates(["v"])
    wsum = v0.count()
    cap = math.ceil((1.0 + eps) * wsum / k)
    cur_v = v0.withColumn("w", F.lit(1).cast("long")).localCheckpoint(eager=True)
    cur_e = (
        canonical_edges(edges, src, dst)
        .withColumn("weight", F.lit(1).cast("long"))
        .localCheckpoint(eager=True)
    )
    hierarchy: list[tuple[DataFrame, DataFrame, DataFrame]] = []
    for _ in range(levels):
        m = maximal_matching(
            cur_v.select(F.col("v").alias("id")),
            cur_e,
            rounds=match_rounds,
            src="a",
            dst="b",
        )
        pair_map = m.select(F.col("b").alias("v"), F.col("a").alias("rep")).unionByName(
            m.select(F.col("a").alias("v"), F.col("a").alias("rep"))
        )
        lmap = (
            cur_v.select("v")
            .join(pair_map, "v", "left")
            .select("v", F.coalesce(F.col("rep"), F.col("v")).alias("rep"))
            .localCheckpoint(eager=True)
        )
        hierarchy.append((cur_v, cur_e, lmap))
        new_v = (
            cur_v.join(lmap, "v")
            .groupBy(F.col("rep").alias("v"))
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
        new_e = (
            cur_e.join(lmap.select(F.col("v").alias("a"), F.col("rep").alias("ra")), "a")
            .join(lmap.select(F.col("v").alias("b"), F.col("rep").alias("rb")), "b")
            .filter(F.col("ra") != F.col("rb"))
            .select(
                F.least("ra", "rb").alias("a"),
                F.greatest("ra", "rb").alias("b"),
                "weight",
            )
            .groupBy("a", "b")
            .agg(F.sum("weight").alias("weight"))
            .localCheckpoint(eager=True)
        )
        cur_v, cur_e = new_v, new_e

    # phase 2: weighted prefix-range assignment on the coarsest frame.
    # The window is single-partition BY DESIGN: the input is the
    # coarsened graph (~|V|/2^levels supervertices), bounded by phase 1.
    from pyspark.sql import Window

    win = Window.orderBy(F.col("w").desc(), F.col("v")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    parts = cur_v.select(
        "v",
        F.least(
            F.lit(k - 1),
            F.floor(F.lit(k) * (F.sum("w").over(win) - F.col("w")) / F.lit(wsum)),
        )
        .cast("int")
        .alias("part"),
    ).localCheckpoint(eager=True)

    # phase 3: project down + refine at every level
    prev_parts = parts  # the phase-2 checkpoint, superseded by the first refine
    for lvl_v, lvl_e, lmap in reversed(hierarchy):
        parts = lmap.join(
            parts.withColumnRenamed("v", "rep"), "rep"
        ).select("v", "part")
        for _ in range(refine_rounds):
            parts = _refine_round(lvl_v, lvl_e, parts, k, cap).localCheckpoint(eager=True)
            release_local_checkpoint(prev_parts)
            prev_parts = parts

    sizes = (
        parts.join(hierarchy[0][0], "v")
        .groupBy("part")
        .agg(F.sum("w").alias("part_weight"))
    )
    e_orig = hierarchy[0][1]
    cut = (
        e_orig.join(parts.select(F.col("v").alias("a"), F.col("part").alias("pa")), "a")
        .join(parts.select(F.col("v").alias("b"), F.col("part").alias("pb")), "b")
        .filter(F.col("pa") != F.col("pb"))
        .agg(F.coalesce(F.sum("weight"), F.lit(0)).alias("edge_cut"))
    )
    return (
        parts.join(F.broadcast(sizes), "part")
        .crossJoin(F.broadcast(cut))
        .select(F.col("v").alias("id"), "part", "part_weight", "edge_cut")
    )


def _refine_round(
    lvl_v: DataFrame, lvl_e: DataFrame, parts: DataFrame, k: int, cap: int
) -> DataFrame:
    """One synchronous boundary-refinement round at one hierarchy level
    (see :func:`partition_kway` phase 3).  All windows partition by a
    vertex or a part — never a global sort over unbounded data."""
    from pyspark.sql import Window

    pe = lvl_e
    pa = parts.select(F.col("v").alias("a"), F.col("part").alias("part_a"))
    pb = parts.select(F.col("v").alias("b"), F.col("part").alias("part_b"))
    ej = pe.join(pa, "a").join(pb, "b")
    wvq = (
        ej.select(F.col("a").alias("v"), F.col("part_b").alias("q"), "weight")
        .unionByName(ej.select(F.col("b").alias("v"), F.col("part_a").alias("q"), "weight"))
        .groupBy("v", "q")
        .agg(F.sum("weight").alias("wq"))
    )
    internal = (
        parts.join(wvq, (parts.v == wvq.v) & (parts.part == wvq.q), "left")
        .select(parts.v.alias("v"), "part", F.coalesce(F.col("wq"), F.lit(0)).alias("int_w"))
    )
    cand = (
        wvq.join(internal, "v")
        .filter(F.col("q") != F.col("part"))
        .withColumn("gain", F.col("wq") - F.col("int_w"))
        .filter(F.col("gain") > 0)
    )
    best = cand.withColumn(
        "rn", F.row_number().over(Window.partitionBy("v").orderBy(F.col("gain").desc(), "q"))
    ).filter(F.col("rn") == 1)
    sizes = (
        parts.join(lvl_v, "v").groupBy("part").agg(F.sum("w").alias("sz"))
    )
    # acceptance is WEIGHT-cumulative, not row-counted: movers into q are
    # admitted in (gain desc, md5(v)) order while their cumulative vertex
    # weight still fits the part's slack — a weight-4 supervertex consumes
    # 4 units of capacity, so a refined part never exceeds the cap
    accepted = (
        best.join(lvl_v, "v")
        .join(sizes.select(F.col("part").alias("q"), "sz"), "q", "left")
        .withColumn(
            "cumw",
            F.sum("w").over(
                Window.partitionBy("q")
                .orderBy(F.col("gain").desc(), F.md5(F.col("v")))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .filter(F.col("cumw") <= F.lit(cap) - F.coalesce(F.col("sz"), F.lit(0)))
        .select("v", F.col("q").alias("new_part"))
    )
    return parts.join(accepted, "v", "left").select(
        "v", F.coalesce(F.col("new_part"), F.col("part")).alias("part")
    )


def _edge_support(e: DataFrame) -> DataFrame:
    """Per-edge triangle support over a canonical (a < b) edge set:
    (a, b, support).  Each triangle (a<b<c) found once via the two-hop
    join credits its three edges."""
    e1 = e.select(F.col("a").alias("ta"), F.col("b").alias("tb"))
    e2 = e.select(F.col("a").alias("tb"), F.col("b").alias("tc"))
    e3 = e.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = e1.join(e2, "tb", "inner").join(e3, ["ta", "tc"], "inner")
    sides = (
        tri.select(F.col("ta").alias("a"), F.col("tb").alias("b"))
        .unionAll(tri.select(F.col("tb").alias("a"), F.col("tc").alias("b")))
        .unionAll(tri.select(F.col("ta").alias("a"), F.col("tc").alias("b")))
    )
    sup = sides.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))
    return e.join(sup, ["a", "b"], "left").select(
        "a", "b", F.coalesce(F.col("support"), F.lit(0)).cast("long").alias("support")
    )


def ktruss(
    vertices: DataFrame,
    edges: DataFrame,
    k: int,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-truss edge peeling, ``rounds`` synchronous rounds: repeatedly drop
    edges supported by fewer than k-2 triangles among the surviving edges.
    Returns the surviving canonical edges with their final in-truss
    support: (a, b, support).

    The edge-analog of :func:`kcore_peel` and the standard cohesion
    refinement above triangle counting; fixed-round form so a SQL oracle
    can unroll the identical recurrence (extra rounds past the fixpoint
    are no-ops, so early exit is exact).  Per round: one triangle
    enumeration (two joins on the canonical orientation) + one count —
    everything keyed on vertex ids.  ``vertices`` is unused beyond API
    symmetry with the other graph stats.
    """
    e = canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    n_edges = e.count()
    min_sup = k - 2
    prev_e = e
    for _ in range(rounds):
        sup = _edge_support(e)
        e = sup.filter(F.col("support") >= min_sup).select("a", "b").localCheckpoint(eager=True)
        release_local_checkpoint(prev_e)
        prev_e = e
        n_next = e.count()
        if n_next == n_edges:
            break  # fixpoint: supports can only drop when edges drop
        n_edges = n_next
    return _edge_support(e)


def triangles_per_vertex(
    vertices: DataFrame, edges: DataFrame, id_col: str = "id", src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-vertex triangle participation count: (id, n_triangles), zero
    included for triangle-free vertices.

    Enumerates each triangle once as (a < b < c): e(a,b) ⋈ e(b,c) ⋈ e(a,c),
    then credits all three corners.
    """
    e = canonical_edges(edges, src, dst)
    e1 = e.select(F.col("a").alias("ta"), F.col("b").alias("tb"))
    e2 = e.select(F.col("a").alias("tb"), F.col("b").alias("tc"))
    e3 = e.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = e1.join(e2, "tb", "inner").join(e3, ["ta", "tc"], "inner")
    corners = (
        tri.select(F.col("ta").alias("v"))
        .unionAll(tri.select(F.col("tb").alias("v")))
        .unionAll(tri.select(F.col("tc").alias("v")))
    )
    counts = corners.groupBy("v").agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        vertices.join(counts, vertices[id_col] == counts["v"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
        )
    )


def _local_bfs_frame(
    vertices, e, sources: list, rounds: int, mode: str, undirected: bool = False
) -> DataFrame:
    """Single-task numpy solve for the sampled-source BFS family — the same
    adaptive escape hatch as pagerank's local strategy: below
    LOCAL_SOLVE_MAX_ROWS the per-round scheduling floor dwarfs the math, so
    vertices+edges stream through ONE mapInPandas task that runs the
    identical rounds-bounded recurrence (harmonic sums or Brandes
    sigma/delta sweeps) with array ops.  ``e`` is the both-directions edge
    list, or — with ``undirected=True`` — the CANONICAL (a < b) list, which
    the solver mirrors in numpy after transfer: half the Arrow volume for
    the same adjacency (measured ~25% off the sf0.1 harmonic wall clock).
    Output schema matches the distributed path exactly (parity pinned in
    tests)."""
    id_type = dict(vertices.dtypes)[vertices.columns[0]]
    payload = vertices.select(
        F.col(vertices.columns[0]).alias("a"), F.lit(None).cast(id_type).alias("b")
    ).unionByName(e.select(F.col("a"), F.col("b")))
    srcs = list(sources)

    def solve(batches):
        import ctypes as _ct
        import gc as _gc

        # worker prelude (see session.udf_worker_prelude for the measured
        # pathology): (1) malloc heap reuse — large numpy temporaries
        # otherwise re-mmap and re-FAULT every task, and fresh pages on
        # this host are a fault-cost lottery (THP zero+compact storms);
        # (2) pause cyclic gc for the body — threshold sweeps re-trace
        # the millions of surviving row objects (ONE sweep in the
        # epilogue after the big frames are dropped)
        try:
            _libc = _ct.CDLL("libc.so.6", use_errno=True)
            _libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
            _libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
        except Exception:
            pass  # non-glibc: skip
        _gc.disable()
        import numpy as np
        import pandas as pd

        parts = list(batches)
        df = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame({"a": [], "b": []})
        is_edge = df["b"].notna()
        vids = df.loc[~is_edge, "a"].to_numpy()
        nv = len(vids)
        if nv == 0:
            _gc.enable()  # early exit: re-arm cyclic gc for the worker
            return
        idx = pd.Series(np.arange(nv), index=vids)
        a_vals = df.loc[is_edge, "a"]
        b_vals = df.loc[is_edge, "b"]
        if a_vals.dtype != vids.dtype:
            a_vals = a_vals.astype(vids.dtype)
        if b_vals.dtype != vids.dtype:
            b_vals = b_vals.astype(vids.dtype)
        src_f = idx.reindex(a_vals).to_numpy()
        dst_f = idx.reindex(b_vals).to_numpy()
        known = ~np.isnan(src_f) & ~np.isnan(dst_f)
        es = src_f[known].astype("int64")
        ed = dst_f[known].astype("int64")
        if undirected:
            # canonical edges arrive once; mirror them here (same rows the
            # JVM-side unionAll would have shipped, at half the transfer)
            es, ed = np.concatenate([es, ed]), np.concatenate([ed, es])
        # CSR adjacency
        order = np.argsort(es, kind="stable")
        es, ed = es[order], ed[order]
        ptr = np.zeros(nv + 1, dtype="int64")
        np.add.at(ptr, es + 1, 1)
        ptr = np.cumsum(ptr)

        def edge_ranges(nodes):
            """Concatenated CSR edge indices of ``nodes`` — the ragged
            np.repeat trick, no per-node Python loop (r5 verdict nit)."""
            counts = ptr[nodes + 1] - ptr[nodes]
            total = int(counts.sum())
            if total == 0:
                return np.array([], dtype="int64")
            starts = np.repeat(ptr[nodes], counts)
            offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
            return starts + offs

        hnum = np.zeros(nv, dtype="int64")  # Σ L/d — exact integer units
        reached = np.zeros(nv, dtype="int64")
        bc = np.zeros(nv)
        for s in srcs:
            if s not in idx.index:
                continue
            s_i = int(idx[s])
            dist = np.full(nv, -1, dtype="int64")
            sigma = np.zeros(nv)
            dist[s_i] = 0
            sigma[s_i] = 1.0
            frontier = np.array([s_i], dtype="int64")
            levels = [frontier]
            for lev in range(1, rounds + 1):
                # neighbors of the frontier, with per-edge sigma credit
                eidx = edge_ranges(frontier)
                if len(eidx) == 0:
                    levels.append(np.array([], dtype="int64"))
                    continue
                nbr = ed[eidx]
                srcs_of = es[eidx]
                fresh_mask = dist[nbr] == -1
                newly = np.unique(nbr[fresh_mask])
                # sigma: sum over edges from dist==lev-1 into each new node
                # (nbr[i] in newly <=> fresh_mask[i] — dist hasn't been
                # updated yet — so no np.isin sort pass is needed)
                useful = (dist[srcs_of] == lev - 1) & fresh_mask
                np.add.at(sigma, nbr[useful], sigma[srcs_of[useful]])
                dist[newly] = lev
                frontier = newly
                levels.append(newly)
            hit = dist > 0
            hnum[hit] += lcm_val // dist[hit]
            reached += hit.astype("int64")
            if mode == "betweenness":
                delta = np.zeros(nv)
                for lev in range(rounds, 0, -1):
                    w_nodes = levels[lev] if lev < len(levels) else np.array([], dtype="int64")
                    if len(w_nodes) == 0:
                        continue
                    eidx = edge_ranges(w_nodes)
                    w_of = es[eidx]
                    p_of = ed[eidx]
                    pred = dist[p_of] == lev - 1
                    contrib = sigma[p_of[pred]] / sigma[w_of[pred]] * (1.0 + delta[w_of[pred]])
                    np.add.at(delta, p_of[pred], contrib)
                mask = np.ones(nv, dtype=bool)
                mask[s_i] = False
                bc[mask] += delta[mask]
        if mode == "harmonic":
            out = pd.DataFrame({"id": vids, "hnum": hnum, "n_reached": reached})
        else:
            out = pd.DataFrame({"id": vids, "betweenness": bc * 0.5})
        # gc epilogue: drop the big build frames, then pay the ONE cyclic
        # sweep of the task here instead of N threshold sweeps mid-build
        del df, parts
        _gc.enable(); _gc.collect()
        yield out

    lcm_val = _lcm_upto(rounds)
    schema = (
        f"id {id_type}, hnum long, n_reached long"
        if mode == "harmonic"
        else f"id {id_type}, betweenness double"
    )
    raw = payload.coalesce(1).mapInPandas(solve, schema=schema).localCheckpoint(eager=True)
    if mode == "harmonic":
        # same exact fixed-point quantization as the distributed path —
        # the numpy pass only accumulates the integer Σ lcm/d numerator
        return raw.select(
            "id",
            _harmonic_fixed6(F.col("hnum"), lcm_val).alias("harmonic"),
            "n_reached",
        )
    # round in Spark, not numpy: np.round is half-even while F.round is
    # half-up — the distributed path and the SQL oracles use the latter
    return raw.select("id", F.round("betweenness", 6).alias("betweenness"))


def _lcm_upto(n: int) -> int:
    """lcm(1..n) — the exact common denominator for Σ 1/d over integer
    BFS distances d <= n."""
    from math import gcd

    out = 1
    for i in range(2, n + 1):
        out = out * i // gcd(out, i)
    return out


def _harmonic_fixed6(hnum, L: int):
    """round-half-up(hnum/L, 6dp) as exact integer arithmetic, emitted as
    a double via one cast + one divide: round6 = floor(hnum/L * 1e6 +
    1/2) == (hnum*2_000_000 + L) div (2L) for hnum >= 0.  The quotient
    is taken as (num - num mod d) / d — the dividend is an exact
    multiple of d, so the double division is exact (no `div` Column
    operator exists in the Python API; this stays expression-tree
    based and engine-portable)."""
    num2 = hnum.cast("long") * F.lit(2000000).cast("long") + F.lit(L).cast("long")
    d = F.lit(2 * L).cast("long")
    q = ((num2 - F.pmod(num2, d)) / d).cast("long")
    return q.cast("double") / F.lit(1000000.0)


def harmonic_centrality(
    vertices: DataFrame,
    edges: DataFrame,
    sources: list,
    rounds: int = 4,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    strategy: str = "auto",
) -> DataFrame:
    """Sampled-source harmonic centrality, ``rounds``-bounded: unweighted
    BFS distances from each source over the undirected edge set, then
    harmonic(v) = Σ_{s: 0 < d(s,v) <= rounds} 1/d(s,v).

    The sampled-source estimator is how closeness-family centralities run
    at scale (all-pairs BFS is |V| full traversals); the sample size trades
    variance for cost.  The multi-source trick: the source id is carried as
    a STATE DIMENSION (state rows are (s, id, dist)), so every BFS advances
    in the SAME per-round join — one edges⋈state shuffle per round for the
    whole sample instead of one loop per source.  Fixed-round form like
    kcore_peel, so a SQL oracle can unroll the identical recurrence.

    Returns (id, harmonic, n_reached) for every vertex (zeros where no
    source reaches it).

    ``strategy``: like pagerank — "auto" runs the identical recurrence as
    a single-task numpy solve below LOCAL_SOLVE_MAX_ROWS (the per-round
    scheduling floor dwarfs the math there); "distributed" forces the
    per-round DataFrame loop.
    """
    from usearch_spark.plans.iterative import LOCAL_SOLVE_MAX_ROWS, loop_tuned_session

    und = canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    v = vertices.select(F.col(id_col).alias("id")).dropDuplicates(["id"])
    n_rows = v.count() + 2 * und.count()  # both-directions row count
    if strategy == "auto":
        strategy = "local" if n_rows <= LOCAL_SOLVE_MAX_ROWS else "distributed"
    if strategy == "local":
        # ship the canonical half; the solver mirrors it after transfer
        return _local_bfs_frame(v, und, sources, rounds, "harmonic", undirected=True)
    spark = vertices.sparkSession
    # state id columns take the VERTEX frame's id type (bigint vertex ids
    # must not silently coerce to string — join/union coercion can lose
    # precision on large ids), same as _local_bfs_frame
    id_type = dict(v.dtypes)["id"]
    state = spark.createDataFrame(
        [(str(s), str(s), 0) for s in sources], "s string, id string, dist int"
    ).select(F.col("s").cast(id_type), F.col("id").cast(id_type), "dist")
    with loop_tuned_session(spark, n_rows) as n_part:
        # partition the doubled edge frame by the join key ONCE: the union
        # scans as UnknownPartitioning, so without this every round pays a
        # full 2|E| exchange (guide §2.4 — share one exchange); the
        # checkpoint's LogicalRDD carries hashpartitioning(a, n_part) and
        # the per-round join re-uses it.  shuffle_hash on the state side
        # then moves ONLY the state — no per-round driver-side broadcast
        # build of the edge frame, no edge re-sort: the scale-safe shape.
        # (Single-partition loops skip the repartition — nothing to save.)
        e = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        if n_part > 1:
            e = e.repartition(n_part, "a")
        e = e.localCheckpoint(eager=True)
        release_local_checkpoint(und)  # folded into e; loop reads only e
        prev_state = None
        for _ in range(rounds):
            msgs = state.hint("shuffle_hash").join(e, state.id == e.a).select(
                "s", F.col("b").alias("id"), (F.col("dist") + 1).alias("dist")
            )
            state = (
                state.unionByName(msgs)
                .groupBy("s", "id")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True)
            )
            release_local_checkpoint(prev_state)
            prev_state = state
    release_local_checkpoint(e)  # the final state no longer references it
    # exact fixed-point: distances are integers in [1, rounds], so
    # Σ 1/d = (Σ L/d) / L with L = lcm(1..rounds) — an exact integer
    # numerator; the 6dp half-up quantization is pure integer arithmetic
    # (floor(x*1e6 + 1/2) == (num*2e6 + L) div 2L for num >= 0) and the
    # only float op is ONE long->double cast + ONE divide, so no
    # summation-order or round-boundary exposure anywhere
    L = _lcm_upto(rounds)
    per = state.filter(F.col("dist") > 0).groupBy("id").agg(
        F.sum(F.expr(f"CAST({L} AS BIGINT) div CAST(dist AS BIGINT)")).alias("hnum"),
        F.count(F.lit(1)).alias("n_reached"),
    )
    v = vertices.select(F.col(id_col).alias("id"))
    return v.join(per, "id", "left").select(
        "id",
        F.coalesce(_harmonic_fixed6(F.col("hnum"), L), F.lit(0.0)).alias("harmonic"),
        F.coalesce(F.col("n_reached"), F.lit(0)).alias("n_reached"),
    )


def betweenness_centrality(
    vertices: DataFrame,
    edges: DataFrame,
    sources: list,
    rounds: int = 4,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    halve_undirected: bool = True,
    strategy: str = "auto",
) -> DataFrame:
    """Sampled-source betweenness centrality (Brandes 2001, the
    pivot-sampling estimator of Brandes/Pich 2007): exact dependency
    accumulation from each source in ``sources``, summed.  With all
    vertices as sources this IS exact betweenness; a fixed sample is the
    standard scale estimator (cost = |S| BFS traversals, not |V|).

    Like :func:`harmonic_centrality`, the source id is a state dimension:
    (s, id, dist, sigma) rows advance every source's level-synchronous BFS
    in the same per-round join, and the backward sweep accumulates
    δ(v) = Σ_succ σ_v/σ_w · (1 + δ_w) level by level with the same
    source-parallel joins.  ``rounds`` bounds the BFS depth (paths longer
    than ``rounds`` contribute nothing — callers size it to the graph's
    effective diameter).

    Returns (id, betweenness) for every vertex; for undirected graphs each
    (s,t) pair is seen from both endpoints when both are sampled, so the
    conventional /2 is applied unless ``halve_undirected=False``.
    """
    und = canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    if not halve_undirected:
        # the local solver hard-codes the undirected /2; keep the flag's
        # semantics by forcing the distributed path for the rare caller
        strategy = "distributed" if strategy == "auto" else strategy
    from usearch_spark.plans.iterative import LOCAL_SOLVE_MAX_ROWS, loop_tuned_session

    v_in = vertices.select(F.col(id_col).alias("id")).dropDuplicates(["id"])
    n_rows = v_in.count() + 2 * und.count()  # both-directions row count
    if strategy == "auto":
        strategy = "local" if n_rows <= LOCAL_SOLVE_MAX_ROWS else "distributed"
    if strategy == "local":
        # ship the canonical half; the solver mirrors it after transfer
        return _local_bfs_frame(v_in, und, sources, rounds, "betweenness", undirected=True)
    spark = vertices.sparkSession
    id_type = dict(v_in.dtypes)["id"]
    state = spark.createDataFrame(
        [(str(s), str(s), 0, 1.0) for s in sources], "s string, id string, dist int, sigma double"
    ).select(F.col("s").cast(id_type), F.col("id").cast(id_type), "dist", "sigma")
    with loop_tuned_session(spark, n_rows) as n_part:
        # partition the doubled edge frame by the forward join key ONCE
        # (guide §2.4): the unionAll scans as UnknownPartitioning, so
        # without this every forward round re-exchanges all 2|E| rows; the
        # checkpoint's LogicalRDD carries hashpartitioning(a, n_part) and
        # each round's join re-uses it.  (Single-partition loops skip the
        # repartition — nothing to save.)
        e = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        if n_part > 1:
            e = e.repartition(n_part, "a")
        e = e.localCheckpoint(eager=True)
        release_local_checkpoint(und)  # folded into e; loop reads only e
        prev_cp = None
        for r in range(1, rounds + 1):
            frontier = state.filter(F.col("dist") == r - 1)
            # shuffle_hash on the frontier side: without it the planner
            # BROADCASTS the 2|E| edge frame every superstep whenever its
            # estimate fits the threshold (a single-threaded driver-side
            # hash build of millions of rows, rebuilt per round), and
            # falls back to sort-merge (re-SORTING the edge frame per
            # round) once it doesn't.  Hashing the frontier keeps the
            # frontier the only moving side — the scale-safe shape
            msgs = (
                frontier.hint("shuffle_hash").join(e, frontier.id == e.a)
                .select("s", F.col("b").alias("id"), F.col("sigma").alias("m"))
                .groupBy("s", "id")
                .agg(F.sum("m").alias("sigma"))
            )
            fresh = msgs.join(state.select("s", "id"), ["s", "id"], "left_anti").select(
                "s", "id", F.lit(r).alias("dist"), "sigma"
            )
            state = state.unionByName(fresh).localCheckpoint(eager=True)
            release_local_checkpoint(prev_cp)
            prev_cp = state

        # the backward sweep joins on the OTHER endpoint: re-key the edge
        # checkpoint by b once so the per-level joins reuse the partitioning
        # (one 2|E| exchange total instead of one per level)
        if n_part > 1:
            e_b = e.repartition(n_part, "b").localCheckpoint(eager=True)
            release_local_checkpoint(e)
        else:
            e_b = e
        delta = state.withColumn("delta", F.lit(0.0))
        for lev in range(rounds, 0, -1):
            w = delta.filter(F.col("dist") == lev).select(
                "s", F.col("id").alias("wid"), F.col("sigma").alias("sw"), F.col("delta").alias("dw")
            )
            contribs = (
                w.hint("shuffle_hash").join(e_b, w.wid == e_b.b)
                .select("s", F.col("a").alias("pid"), "sw", "dw")
                .join(
                    delta.filter(F.col("dist") == lev - 1).select(
                        "s", F.col("id").alias("pid"), F.col("sigma").alias("sp")
                    ),
                    ["s", "pid"],
                )
                .groupBy("s", "pid")
                .agg(F.sum(F.col("sp") / F.col("sw") * (F.lit(1.0) + F.col("dw"))).alias("add"))
            )
            delta = (
                delta.join(
                    contribs.withColumnRenamed("pid", "id"), ["s", "id"], "left"
                )
                .select(
                    "s",
                    "id",
                    "dist",
                    "sigma",
                    (F.col("delta") + F.when(F.col("dist") == lev - 1, F.coalesce(F.col("add"), F.lit(0.0))).otherwise(F.lit(0.0))).alias("delta"),
                )
                .localCheckpoint(eager=True)
            )
            # frees the superseded delta — and, on the first backward
            # level, the forward sweep's final state (its rows are now
            # folded into this delta checkpoint)
            release_local_checkpoint(prev_cp)
            prev_cp = delta
    release_local_checkpoint(e_b)  # the final delta no longer references it
    per = (
        delta.filter(F.col("id") != F.col("s"))
        .groupBy("id")
        .agg(F.sum("delta").alias("bc"))
    )
    scale = 0.5 if halve_undirected else 1.0
    v = vertices.select(F.col(id_col).alias("id"))
    return v.join(per, "id", "left").select(
        "id", F.round(F.coalesce(F.col("bc"), F.lit(0.0)) * F.lit(scale), 6).alias("betweenness")
    )


def coarsen_levels(
    vertices: DataFrame,
    edges: DataFrame,
    levels: int = 2,
    rounds: int = 8,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Hierarchical contraction: recurse maximal-matching contraction
    ``levels`` times and return (id, cluster) mapping every ORIGINAL
    vertex to its top-level supervertex — the multilevel hierarchy a
    METIS-style partitioner builds before k-way assignment (each level
    roughly halves the graph, so L levels shrink it ~2^L x before any
    expensive algorithm runs).

    Deterministic end to end: each level's matching uses md5 edge
    priorities on the CURRENT level's supervertex names, and mappings
    compose by joins — no rand(), no driver loops over data."""
    v = vertices.select(F.col(id_col).alias("id")).dropDuplicates(["id"])
    mapping = v.select("id", F.col("id").alias("rep"))
    cur_v = v.select(F.col("id").alias("v"))
    cur_e = canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    prev_lmap = prev_mapping = None
    for _ in range(levels):
        m = maximal_matching(
            cur_v.select(F.col("v").alias("id")), cur_e, rounds=rounds, src="a", dst="b"
        ).localCheckpoint(eager=True)
        pair_map = m.select(F.col("b").alias("v"), F.col("a").alias("lrep")).unionByName(
            m.select(F.col("a").alias("v"), F.col("a").alias("lrep"))
        )
        lmap = cur_v.join(pair_map, "v", "left").select(
            "v", F.coalesce(F.col("lrep"), F.col("v")).alias("lrep")
        ).localCheckpoint(eager=True)
        # every consumer of the previous level's lmap (this level's m and
        # the join above) has now materialized; m itself is folded in too
        release_local_checkpoint(prev_lmap)
        release_local_checkpoint(m)
        prev_lmap = lmap
        prev_mapping, mapping = mapping, (
            mapping.join(lmap, mapping.rep == lmap.v)
            .select("id", F.col("lrep").alias("rep"))
            .localCheckpoint(eager=True)
        )
        release_local_checkpoint(prev_mapping)
        prev_cur_e, cur_e = cur_e, (
            cur_e.join(lmap.select(F.col("v").alias("a"), F.col("lrep").alias("ra")), "a")
            .join(lmap.select(F.col("v").alias("b"), F.col("lrep").alias("rb")), "b")
            .filter(F.col("ra") != F.col("rb"))
            .select(F.least("ra", "rb").alias("a"), F.greatest("ra", "rb").alias("b"))
            .dropDuplicates(["a", "b"])
            .localCheckpoint(eager=True)
        )
        release_local_checkpoint(prev_cur_e)
        cur_v = lmap.select(F.col("lrep").alias("v")).dropDuplicates(["v"])
    return mapping.select("id", F.col("rep").alias("cluster"))


def _louvain_local_move(
    und_w: DataFrame, deg: DataFrame, m: int, labels: DataFrame, rounds: int
) -> DataFrame:
    """Synchronous Louvain local-move rounds over a WEIGHTED undirected
    edge list: every vertex simultaneously adopts the neighboring (or
    own) community maximizing the modularity gain of joining it after
    notionally leaving its own — argmax_c of the EXACT INTEGER score
    2m·k_{v,c} − k_v·(Σtot_c − k_v·[c = c_v])  (ΔQ·2m², constants
    dropped), ties to the smaller community id.  Integer scores mean no
    float boundary in the move decision, so a SQL oracle replays every
    round bit-for-bit; widths: fits int64 for total edge weight up to
    ~1e9 (score <= 2m·k_v <= 4m²).

    Synchronous updates can SWAP-oscillate (two mutually-attracted
    vertices trade communities forever — the classic parallel-Louvain
    pathology), so moves alternate direction by round parity: even
    rounds admit only moves to a SMALLER community id, odd rounds only
    to a larger one (staying put is always admitted).  A swap needs both
    directions in the same round, so it cannot happen; each admitted
    move is still the argmax over its half-space, so gain stays >= 0.
    The gate is a function of the ROUND INDEX, not of data, which keeps
    the recurrence trivially SQL-replayable.

    ``und_w``: (a, b, w) canonical weighted edges; ``deg``: (v, k)
    weighted degrees (2·self-loop weight already included for coarse
    graphs — self-loops must NOT appear in und_w, they are constant
    under any move); ``labels``: (v, c) initial assignment."""
    inc = und_w.select(
        F.col("a").alias("v"), F.col("b").alias("nb"), "w"
    ).unionAll(und_w.select(F.col("b").alias("v"), F.col("a").alias("nb"), "w"))
    for t in range(rounds):
        lab_nb = labels.select(F.col("v").alias("nb"), F.col("c").alias("nc"))
        kvc = (
            inc.join(lab_nb, "nb")
            .groupBy("v", F.col("nc").alias("c"))
            .agg(F.sum("w").alias("kvc"))
        )
        sig = (
            labels.join(deg, "v")
            .groupBy("c")
            .agg(F.sum("k").alias("tot"))
        )
        own = labels.select("v", "c", F.lit(0).cast("long").alias("kvc_own"))
        cand = (
            kvc.join(own.select("v", "c", "kvc_own"), ["v", "c"], "full")
            .select(
                "v",
                "c",
                F.coalesce(F.col("kvc"), F.col("kvc_own"), F.lit(0)).alias("kvc"),
            )
        )
        scored = (
            cand.join(sig, "c")
            .join(labels.select("v", F.col("c").alias("own_c")), "v")
            .join(deg, "v")
            .select(
                "v",
                "c",
                "own_c",
                (
                    F.lit(2 * m).cast("long") * F.col("kvc")
                    - F.col("k")
                    * (
                        F.col("tot")
                        - F.when(F.col("c") == F.col("own_c"), F.col("k")).otherwise(
                            F.lit(0)
                        )
                    )
                ).alias("score"),
            )
        )
        gate = (
            (F.col("c") < F.col("own_c"))
            if t % 2 == 0
            else (F.col("c") > F.col("own_c"))
        )
        best = (
            scored.filter((F.col("c") == F.col("own_c")) | gate)
            .groupBy("v")
            .agg(F.min_by(F.struct((-F.col("score")).alias("ns"), "c"),
                          F.struct((-F.col("score")).alias("ns"), "c")).alias("b"))
            .select("v", F.col("b.c").alias("newc"))
        )
        prev_labels = labels
        labels = (
            labels.join(best, "v", "left")
            .select("v", F.coalesce(F.col("newc"), F.col("c")).alias("c"))
            .localCheckpoint(eager=True)  # |V| rows; truncates round lineage
        )
        # no-op on round 0 (the caller's labels frame is not a bare
        # checkpoint); frees each superseded round from round 1 on
        release_local_checkpoint(prev_labels)
    return labels


def _louvain_local_py(
    und: list, verts: list, m: int, rounds: int, coarse_rounds: int
) -> dict:
    """Driver-side solve of the EXACT louvain recurrence for graphs under
    the LOCAL_SOLVE_MAX_ROWS switch (the shortest_path size-switch
    pattern): identical integer scores, round-parity gates, and
    (-score, c) tie-breaks, so the result is bit-identical to the
    distributed plan — the oracle pins both paths."""
    from collections import defaultdict

    deg: dict = defaultdict(int)
    for a, b, w in und:
        deg[a] += w
        deg[b] += w
    for v in verts:
        deg.setdefault(v, 0)

    def local_move(edges_w, dg, labels, n_rounds):
        for t in range(n_rounds):
            kvc: dict = defaultdict(int)
            nbrs: dict = defaultdict(set)
            for a, b, w in edges_w:
                kvc[(a, labels[b])] += w
                kvc[(b, labels[a])] += w
                nbrs[a].add(labels[b])
                nbrs[b].add(labels[a])
            tot: dict = defaultdict(int)
            for v, c in labels.items():
                tot[c] += dg[v]
            new = {}
            for v, own in labels.items():
                best = None
                for c in nbrs[v] | {own}:
                    if not (c == own or (c < own if t % 2 == 0 else c > own)):
                        continue
                    score = 2 * m * kvc.get((v, c), 0) - dg[v] * (
                        tot[c] - (dg[v] if c == own else 0)
                    )
                    key = (-score, c)
                    if best is None or key < best:
                        best = key
                new[v] = best[1] if best is not None else own
            labels = new
        return labels

    labels = local_move(und, deg, {v: v for v in deg}, rounds)
    cw: dict = defaultdict(int)
    for a, b, w in und:
        ca, cb = labels[a], labels[b]
        if ca != cb:
            key = (min(ca, cb), max(ca, cb))
            cw[key] += w
    cdeg: dict = defaultdict(int)
    for v, c in labels.items():
        cdeg[c] += deg[v]
    coarse = local_move(
        [(a, b, w) for (a, b), w in cw.items()],
        cdeg,
        {c: c for c in cdeg},
        coarse_rounds,
    )
    return {v: coarse[c] for v, c in labels.items()}


def louvain(
    vertices: DataFrame,
    edges: DataFrame,
    rounds: int = 4,
    coarse_rounds: int = 4,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    strategy: str = "auto",
) -> DataFrame:
    """One full Louvain level (Blondel et al. 2008): synchronous
    local-move rounds on the unit-weight graph, AGGREGATION of the
    result (communities become weighted super-vertices; internal edges
    become self-loop weight folded into the coarse degree), then
    local-move rounds on the coarse graph, projected back to
    (id, community).  Modularity never decreases across the aggregation
    (same partition, same Q), and each integer-argmax move is greedy on
    ΔQ — the standard ascent, made deterministic by synchronous updates,
    exact integer scores, and smaller-community-id tie-breaks (the same
    contract as the label_prop / modularity gates).

    Scale shape per round: one edges⋈labels shuffle for the
    neighbor-community weights, two narrow aggs (community strength,
    per-vertex argmax) — the Pregel-family cost envelope; aggregation is
    one groupBy over the edge list.  The coarse graph is |communities|
    vertices, so phase-2 rounds cost a fraction of phase 1."""
    und = (
        canonical_edges(edges, src, dst)
        .select("a", "b", F.lit(1).cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )
    m = int(und.agg(F.sum("w")).first()[0] or 0)
    verts = vertices.select(F.col(id_col).alias("v")).dropDuplicates(["v"])
    from usearch_spark.plans.iterative import LOCAL_SOLVE_MAX_ROWS

    if strategy == "auto":
        strategy = (
            "local"
            if m + verts.count() <= LOCAL_SOLVE_MAX_ROWS
            else "distributed"
        )
    if strategy == "local" and m > 0:
        # driver-side exact solve: 2 tiny collects + ~10 python rounds
        # beat ~10 Spark job waves of pure scheduling overhead by ~7x at
        # bench scale; above the row switch the distributed plan takes
        # over with the identical recurrence
        from pyspark.sql import types as T

        und_rows = [(r["a"], r["b"], int(r["w"])) for r in und.collect()]
        vrows = [r["v"] for r in verts.collect()]
        lab = _louvain_local_py(und_rows, vrows, m, rounds, coarse_rounds)
        id_type = verts.schema[0].dataType
        return vertices.sparkSession.createDataFrame(
            sorted(lab.items()),
            T.StructType(
                [
                    T.StructField(id_col, id_type),
                    T.StructField("community", id_type),
                ]
            ),
        )
    deg = (
        und.select(F.col("a").alias("v"), "w")
        .unionAll(und.select(F.col("b").alias("v"), "w"))
        .groupBy("v")
        .agg(F.sum("w").alias("k"))
    )
    deg = verts.join(deg, "v", "left").select(
        "v", F.coalesce(F.col("k"), F.lit(0).cast("long")).alias("k")
    )
    labels = verts.select("v", F.col("v").alias("c"))
    if m == 0:
        return labels.select(F.col("v").alias(id_col), F.col("c").alias("community"))
    labels = _louvain_local_move(und_w=und, deg=deg, m=m, labels=labels, rounds=rounds)
    # aggregation: communities -> weighted coarse graph (self-loops folded
    # into the coarse degree, NOT into the coarse edge list)
    la = labels.select(F.col("v").alias("a"), F.col("c").alias("ca"))
    lb = labels.select(F.col("v").alias("b"), F.col("c").alias("cb"))
    tagged = und.join(la, "a").join(lb, "b")
    coarse_edges = (
        tagged.filter(F.col("ca") != F.col("cb"))
        .select(
            F.least("ca", "cb").alias("a"),
            F.greatest("ca", "cb").alias("b"),
            "w",
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    coarse_deg = (
        labels.join(deg, "v")
        .groupBy(F.col("c").alias("v"))
        .agg(F.sum("k").alias("k"))  # includes 2*self_loop: sum of member degrees
    )
    coarse_labels = coarse_deg.select("v", F.col("v").alias("c"))
    coarse_labels = _louvain_local_move(
        und_w=coarse_edges, deg=coarse_deg, m=m, labels=coarse_labels,
        rounds=coarse_rounds,
    )
    return (
        labels.join(
            coarse_labels.select(F.col("v").alias("c"), F.col("c").alias("cc")),
            "c",
        )
        .select(F.col("v").alias(id_col), F.col("cc").alias("community"))
    )


def refine_communities(
    communities: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    community_col: str = "community",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Leiden-style refinement (Traag et al. 2019, the guarantee Louvain
    lacks): split every INTERNALLY DISCONNECTED community into its
    connected parts — connected components over the internal-edge
    subgraph only, each part labeled by its minimum vertex id (parts of
    different communities can never merge, so min-ids stay unique).
    Modularity never decreases: each part keeps its internal edges while
    the degree-sum square strictly shrinks on any real split
    (Σ dᵢ² < (Σ dᵢ)²), so Q(refined) >= Q(input) always — pinned in
    pytest and scored by the exact-integer :func:`modularity`.

    Scale shape: one edges⋈labels tag to drop cross-community edges,
    then the existing :func:`~usearch_spark.plans.pregel.
    connected_components` machinery (size-switched local solve /
    distributed min-label propagation) on the remaining subgraph."""
    from usearch_spark.plans.pregel import connected_components

    comm = communities.select(
        F.col(id_col).alias("v"), F.col(community_col).alias("c")
    )
    und = canonical_edges(edges, src, dst)
    la = comm.select(F.col("v").alias("a"), F.col("c").alias("ca"))
    lb = comm.select(F.col("v").alias("b"), F.col("c").alias("cb"))
    internal = (
        und.join(la, "a").join(lb, "b").filter(F.col("ca") == F.col("cb"))
        .select("a", "b")
    )
    res = connected_components(
        comm.select(F.col("v").alias("id")), internal, src_col="a", dst_col="b"
    )
    return res.state.select(
        F.col("id").alias(id_col), F.col("value").alias("community")
    )


def reciprocity(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """RECIPROCITY of a directed graph (Newman 2003 network-stats
    family): the fraction of directed edges whose reverse edge also
    exists — one row (n_edges, n_reciprocal, reciprocity).

    Distributed shape: dedup, one self-equi-join on the reversed key,
    one global count agg.  Determinism: two exact integer counts + one
    divide."""
    # the deduped edge set (a dimension — distinct directed lanes) feeds
    # both sides of the reversed-key self-join; materialized once so the
    # caller's edge-building pipeline doesn't execute under each side
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=True)
    )
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b")).withColumn(
        "_r", F.lit(1)
    )
    j = e.join(rev, ["a", "b"], "left")
    out = j.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.coalesce("_r", F.lit(0))).cast("long").alias("n_reciprocal"),
    )
    return out.select(
        "n_edges",
        "n_reciprocal",
        F.when(
            F.col("n_edges") > 0,
            F.col("n_reciprocal").cast("double") / F.col("n_edges").cast("double"),
        ).alias("reciprocity"),
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """DEGREE ASSORTATIVITY coefficient of the undirected graph (Newman
    2002): the Pearson correlation of endpoint degrees over the
    SYMMETRIZED edge list — do high-degree vertices attach to other
    hubs (r > 0) or to leaves (r < 0)?

    Over the 2m ordered pairs (j, k) the two marginals coincide, so

        r = (2m·Σjk − (Σj)²) / (2m·Σj² − (Σj)²)

    — numerator and denominator are EXACT integers (degrees are
    counts; bound: 2m·Σj² ≤ 4m²·d_max², keep m·d_max under ~1.5e9) and
    the close is ONE int→double divide; no sqrt, no rounding site.

    Distributed shape: canonical-edge dedup, a degree groupBy, two
    degree joins, one global agg.  Output: one row (n_edges,
    assortativity — NULL for degree-regular graphs)."""
    e = canonical_edges(edges, src, dst)
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    j = (
        sym.join(deg.select(F.col("id").alias("u"), F.col("d").alias("dj")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("d").alias("dk")), "v")
    )
    g = j.agg(
        F.count(F.lit(1)).alias("_m2"),
        F.sum("dj").alias("_sj"),
        F.sum(F.col("dj") * F.col("dk")).alias("_sjk"),
        F.sum(F.col("dj") * F.col("dj")).alias("_sjj"),
    )
    num = F.col("_m2") * F.col("_sjk") - F.col("_sj") * F.col("_sj")
    den = F.col("_m2") * F.col("_sjj") - F.col("_sj") * F.col("_sj")
    return g.select(
        (F.col("_m2") / F.lit(2)).cast("long").alias("n_edges"),
        F.when(den != 0, num.cast("double") / den.cast("double")).alias(
            "assortativity"
        ),
    )


def butterfly_count(
    edges: DataFrame, left: str = "src", right: str = "dst"
) -> DataFrame:
    """BUTTERFLY (2×2 biclique) census of a bipartite graph
    (Sanei-Mehri, Sariyüce & Tirthapura 2018) — the bipartite analogue
    of the triangle count: a butterfly is two left vertices sharing two
    right vertices, the smallest cohesion motif a two-mode network has
    (co-supply redundancy in the supplier↔part graph).  Reported per
    wedge so graphs of different size compare:

        W = Σ_r C(deg_r, 2)   (wedges: left pairs through one right)
        B = Σ_{left pairs} C(c, 2)   (c = shared right vertices)

    and W is also Σ_pairs c, so BOTH come from one pair table.

    Distributed shape: ONE self-equi-join on the wedge-center (right)
    key — the join partitions on that key and the pair aggregate is
    partial-agg safe; cost is Σ deg_r², so callers should put the
    BOUNDED-degree side on the right (parts have supply-chain-bounded
    fanout; a skew cap on deg_r is the documented 100-TB mitigation).
    The final stats are two 1-row aggregates broadcast-crossed.  No
    windows, no UDFs, no collects.

    Determinism: every count is an exact int64 (pair order within the
    self-join only relabels pairs, never changes c), one final divide.

    Output: one row (n_edges, n_left, n_right, n_wedges, n_butterflies,
    butterflies_per_wedge — NULL when wedge-free).

    Input edges are deduplicated on (left, right) here: a duplicate
    edge would inflate wedge and butterfly counts quadratically, so the
    census is defined over the SIMPLE bipartite graph (n_edges is the
    distinct-edge count).
    """
    e = edges.select(F.col(left).alias("l"), F.col(right).alias("r")).dropDuplicates(
        ["l", "r"]
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(b, "r")
        .filter(F.col("a.l") < F.col("b.l"))
        .groupBy(F.col("a.l").alias("l1"), F.col("b.l").alias("l2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wb = pairs.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_wedges"),
        F.coalesce(F.sum(F.expr("c * (c - 1) div 2")), F.lit(0))
        .cast("long")
        .alias("n_butterflies"),
    )
    stats = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.countDistinct("l").alias("n_left"),
        F.countDistinct("r").alias("n_right"),
    )
    return stats.crossJoin(F.broadcast(wb)).select(
        "n_edges",
        "n_left",
        "n_right",
        "n_wedges",
        "n_butterflies",
        F.when(
            F.col("n_wedges") > 0,
            F.col("n_butterflies").cast("double") / F.col("n_wedges").cast("double"),
        ).alias("butterflies_per_wedge"),
    )


def rich_club(
    edges: DataFrame,
    thresholds: list[int],
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """RICH-CLUB curve of an undirected graph (Zhou & Mondragón 2004;
    Colizza et al. 2006 normalization is a caller-side division): for
    each degree threshold k, the edge density among the "club" of
    vertices with degree > k —

        phi(k) = 2·E_k / (n_k·(n_k − 1))

    — rising phi(k) means hubs preferentially interconnect (the core
    a routing/partitioning strategy should pin), the curve-form
    refinement of the one-number degree_assortativity.

    Distributed shape: degrees from one groupBy; each edge joins its
    two endpoint degrees (two hash joins) and collapses to its MIN
    degree; then every threshold is a CONDITIONAL SUM inside ONE
    aggregate over the two dimension-sized count tables (degree
    histogram + min-degree histogram) — no per-k rescan, no global
    window, no non-equi join; the k-row unpivot is driver-free
    inline().  Thresholds are a fixed log grid, so the scan count is
    independent of |K|.

    Determinism: n_k, E_k exact int64, phi ONE divide (n_k < 2 emits
    NULL).

    Output: one row per threshold (k, n_nodes, n_edges, phi).
    """
    e = canonical_edges(edges, src, dst)
    deg = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # dimension-sized histograms: degree -> node count, min-degree -> edges
    dh = deg.groupBy("d").agg(F.count(F.lit(1)).alias("nc"))
    da = deg.select(F.col("id").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("d").alias("db"))
    eh = (
        e.join(da, "a")
        .join(db, "b")
        .select(F.least("da", "db").alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("ec"))
    )
    nodes = dh.agg(
        *[
            F.coalesce(F.sum(F.when(F.col("d") > k, F.col("nc"))), F.lit(0))
            .cast("long")
            .alias(f"_n{k}")
            for k in thresholds
        ]
    )
    club = eh.agg(
        *[
            F.coalesce(F.sum(F.when(F.col("m") > k, F.col("ec"))), F.lit(0))
            .cast("long")
            .alias(f"_e{k}")
            for k in thresholds
        ]
    )
    row = nodes.crossJoin(F.broadcast(club))
    structs = ", ".join(
        f"struct(cast({k} as bigint) as k, _n{k} as n_nodes, _e{k} as n_edges)"
        for k in thresholds
    )
    tall = row.select(F.expr(f"inline(array({structs}))"))
    return tall.select(
        "k",
        "n_nodes",
        "n_edges",
        F.when(
            F.col("n_nodes") >= 2,
            (F.lit(2) * F.col("n_edges")).cast("double")
            / (F.col("n_nodes") * (F.col("n_nodes") - F.lit(1))).cast("double"),
        ).alias("phi"),
    )


def bipartite_check(
    vertices: DataFrame,
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-component BIPARTITENESS verdict via the DOUBLE-COVER
    reduction — the data-quality audit that VERIFIES claimed two-mode
    structure (an edge table sold as supplier↔part must 2-color; an
    odd cycle means mixed-mode contamination): build the bipartite
    double cover (each vertex split into parity copies v|0, v|1, each
    undirected edge {u,v} becoming {u|0,v|1} and {u|1,v|0}) and run
    ordinary CONNECTED COMPONENTS on it — a component of the original
    graph is bipartite iff its two cover copies stay in DIFFERENT
    cover components (an odd cycle glues them).  One CC run answers
    every component at once; the two cover labels of v also hand back
    the 2-coloring (side = which cover component holds v|0).

    Distributed shape: the cover doubles |V| and |E| and reuses the
    proven components machinery (local solve under the row bound, else
    min-label pregel / star contraction at scale).  No new iteration
    code, no collects.

    Determinism: labels are min-ids over string vertex names — every
    verdict and side count is an exact discrete decision.

    Output: one row per original component — (component = least cover
    label, n_vertices, is_bipartite, side0, side1 — sides NULL for odd
    components).
    """
    from usearch_spark.plans.pregel import connected_components

    e = canonical_edges(edges, src, dst)
    v = vertices.select(F.col("id"))
    dc_v = v.select(F.concat(F.col("id"), F.lit("|0")).alias("id")).unionAll(
        v.select(F.concat(F.col("id"), F.lit("|1")).alias("id"))
    )
    dc_e = e.select(
        F.concat(F.col("a"), F.lit("|0")).alias("src"),
        F.concat(F.col("b"), F.lit("|1")).alias("dst"),
    ).unionAll(
        e.select(
            F.concat(F.col("a"), F.lit("|1")).alias("src"),
            F.concat(F.col("b"), F.lit("|0")).alias("dst"),
        )
    )
    res = connected_components(dc_v, dc_e)
    lab = res.state.select(
        F.expr("substring(id, 1, length(id) - 2)").alias("v"),
        F.expr("substring(id, length(id), 1)").alias("p"),
        F.col("value").alias("l"),
    )
    per_v = lab.groupBy("v").agg(
        F.max(F.when(F.col("p") == "0", F.col("l"))).alias("l0"),
        F.max(F.when(F.col("p") == "1", F.col("l"))).alias("l1"),
    )
    keyed = per_v.select(
        "v",
        F.least("l0", "l1").alias("component"),
        (F.col("l0") == F.col("l1")).cast("int").alias("odd"),
        (F.col("l0") < F.col("l1")).cast("long").alias("s0"),
        (F.col("l0") > F.col("l1")).cast("long").alias("s1"),
    )
    g = keyed.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_vertices"),
        (F.max("odd") == 0).alias("is_bipartite"),
        F.sum("s0").alias("_s0"),
        F.sum("s1").alias("_s1"),
    )
    return g.select(
        "component",
        "n_vertices",
        "is_bipartite",
        F.when(F.col("is_bipartite"), F.col("_s0")).alias("side0"),
        F.when(F.col("is_bipartite"), F.col("_s1")).alias("side1"),
    )


def conductance(
    communities: DataFrame,
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    comm_col: str = "community",
) -> DataFrame:
    """Per-community CONDUCTANCE phi(C) = cut(C) / min(vol(C), 2m - vol(C))
    (Kannan, Vempala & Vetta 2004) over the undirected deduped graph -- the
    bottleneck score that grades a partition by its weakest boundary, the
    detect->measure companion modularity can't provide (modularity rewards
    global structure; conductance exposes the single leaky community).

    cut(C) = vol(C) - 2*internal(C), so one degree join and one
    endpoint-community join produce every number; all counts exact int64,
    ONE divide per community (den = 0 -> NULL: an isolated or whole-graph
    community has no boundary to score).

    Distributed shape: degrees from one groupBy; internal edges from one
    hash join of both endpoint labels; partial-agg collapses by community.
    No windows, no UDFs, no collects.

    Output: (community, n_members, volume, cut_edges, conductance).
    """
    uw = canonical_edges(edges, src, dst)
    lab = communities.select(F.col(id_col).alias("_v"), F.col(comm_col).alias("_c"))
    deg = (
        uw.select(F.col("a").alias("_v"))
        .unionAll(uw.select(F.col("b").alias("_v")))
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    vol = (
        lab.join(deg, "_v", "left")
        .groupBy("_c")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.coalesce("_d", F.lit(0))).alias("volume"),
        )
    )
    la = lab.select(F.col("_v").alias("a"), F.col("_c").alias("_ca"))
    lb = lab.select(F.col("_v").alias("b"), F.col("_c").alias("_cb"))
    internal = (
        uw.join(la, "a")
        .join(lb, "b")
        .filter(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("_c"))
        .agg(F.count(F.lit(1)).alias("_int"))
    )
    m = uw.agg(F.count(F.lit(1)).alias("_m"))
    g = (
        vol.join(internal, "_c", "left")
        .withColumn("_int", F.coalesce("_int", F.lit(0)))
        .crossJoin(F.broadcast(m))
    )
    cut = F.col("volume") - F.lit(2) * F.col("_int")
    den = F.least(F.col("volume"), F.lit(2) * F.col("_m") - F.col("volume"))
    return g.select(
        F.col("_c").alias("community"),
        "n_members",
        "volume",
        cut.alias("cut_edges"),
        F.when(den > 0, cut.cast("double") / den.cast("double")).alias(
            "conductance"
        ),
    )


def link_prediction_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_dst_degree: int | None = None,
    edges_deduped: bool = False,
) -> DataFrame:
    """CLASSIC LINK-PREDICTION score panel over a bipartite src→dst graph
    projected on the src side (Liben-Nowell & Kleinberg 2003) — the three
    standard baselines next to :func:`adamic_adar`'s weighted one, all
    from a single pair table:

        common_neighbors = |Γ(a) ∩ Γ(b)|            (exact int)
        jaccard          = |Γ∩| / |Γ(a) ∪ Γ(b)|     (one divide)
        pref_attachment  = deg(a)·deg(b)            (exact int)

    Distributed shape: the per-dst self-join is the ONE quadratic
    surface (same hazard and same ``max_dst_degree`` hub-cap lever as
    adamic_adar / project_bipartite — hub dsts are both the cost AND the
    least informative shared neighbors); degrees join in by key.
    Pairs with no shared dst never materialize (their CN is 0 by
    construction), matching the standard sparse formulation.

    Determinism: every score but jaccard is an exact integer; jaccard is
    one long→double divide of exact integers + round.

    Output: (a, b, common_neighbors, deg_a, deg_b, jaccard,
    pref_attachment) with a < b.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if not edges_deduped:
        e = e.dropDuplicates(["s", "d"])
    if max_dst_degree is not None:
        keep = (
            e.groupBy("d")
            .agg(F.count(F.lit(1)).alias("dg"))
            .filter(F.col("dg") <= max_dst_degree)
            .select("d")
        )
        e = e.join(keep, "d", "left_semi")
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    left = e.select(F.col("s").alias("a"), "d")
    right = e.select(F.col("s").alias("b"), "d")
    cn = (
        left.join(right, "d")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
    )
    return (
        cn.join(deg.select(F.col("s").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("s").alias("b"), F.col("deg").alias("deg_b")), "b")
        .select(
            "a",
            "b",
            "common_neighbors",
            "deg_a",
            "deg_b",
            (
                F.col("common_neighbors").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common_neighbors")).cast(
                    "double"
                )
            ).alias("jaccard"),
            (F.col("deg_a") * F.col("deg_b")).alias("pref_attachment"),
        )
    )


def katz_centrality(
    vertices: DataFrame,
    edges: DataFrame,
    beta: float = 0.01,
    steps: int = 10,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    edges_deduped: bool = False,
    strategy: str = "auto",
) -> DataFrame:
    """KATZ CENTRALITY by fixed-iteration truncated power series (Katz
    1953): x = Σ_k β^k·(Aᵀ)^k·1, computed as the recurrence

        x_0 = 1;   x_{t+1}(v) = 1 + β · Σ_{u→v} x_t(u)

    — the walk-counting centrality that, unlike PageRank, does NOT
    normalize by out-degree (a vertex passes its full influence along
    every edge), the standard influence measure when edges are
    endorsements.  Convergence needs β < 1/λ_max; with ``steps`` fixed
    the result is the exact degree-``steps`` truncation, which is what
    the oracle unrolls.

    Distributed shape: per step ONE message join (edges ⋈ state on src)
    + one partial-aggregated sum per dst + a vertex left-join —
    identical to the PageRank superstep minus the degree division;
    state is checkpointed per step to keep lineage flat.

    Determinism: the per-dst float sum is the same class as the
    gate-proven PageRank message aggregate — callers round (8dp
    established) downstream.

    Output: (id, score) — raw, unrounded.
    """
    from usearch_spark.plans.iterative import LOCAL_SOLVE_MAX_ROWS

    v = vertices.select(F.col(id_col).alias("id")).dropDuplicates(["id"]).localCheckpoint(
        eager=True
    )
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not edges_deduped:
        e = e.dropDuplicates(["src", "dst"])
    e = e.localCheckpoint(eager=True)
    if strategy == "auto":
        strategy = (
            "local"
            if v.count() + e.count() <= LOCAL_SOLVE_MAX_ROWS
            else "distributed"
        )
    if strategy == "local":
        return _katz_local(v, e, beta, steps)
    x = v.withColumn("score", F.lit(1.0))
    prev = None
    for _ in range(steps):
        msg = (
            x.join(e, x["id"] == e["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("score").alias("_m"))
        )
        x = (
            v.join(msg, "id", "left")
            .select(
                "id",
                (F.lit(1.0) + F.lit(beta) * F.coalesce(F.col("_m"), F.lit(0.0))).alias(
                    "score"
                ),
            )
            .localCheckpoint(eager=True)
        )
        release_local_checkpoint(prev)  # superseded step's blocks, freed now
        prev = x
    return x


def _katz_local(v: DataFrame, e: DataFrame, beta: float, steps: int) -> DataFrame:
    """Single-task Katz solve (the pagerank/_sssp local pattern): vertices
    and edges stream through one mapInPandas task; each step is a numpy
    bincount mat-vec of the identical recurrence.  Below
    LOCAL_SOLVE_MAX_ROWS the per-superstep job floor dwarfs the math —
    measured ~1.5x faster than the 10-superstep distributed loop on the
    1.2M-edge sf0.1 graph (the solve itself is ~half the wall clock; the
    string-id reindex dominates the rest, same as _pagerank_local);
    above the threshold the distributed loop is the only path that
    scales.
    Float parity with the distributed loop is the PageRank-local class
    (per-dst sum order differs in ulps; callers round, 8dp gate-proven)."""
    id_type = dict(v.dtypes)["id"]
    payload = v.select(
        F.col("id").alias("a"), F.lit(None).cast(id_type).alias("b")
    ).unionByName(
        e.select(F.col("src").cast(id_type).alias("a"), F.col("dst").cast(id_type).alias("b"))
    )

    def solve(batches):
        import ctypes as _ct
        import gc as _gc

        # worker prelude (see session.udf_worker_prelude for the measured
        # pathology): (1) malloc heap reuse — large numpy temporaries
        # otherwise re-mmap and re-FAULT every task, and fresh pages on
        # this host are a fault-cost lottery (THP zero+compact storms);
        # (2) pause cyclic gc for the body — threshold sweeps re-trace
        # the millions of surviving row objects (ONE sweep in the
        # epilogue after the big frames are dropped)
        try:
            _libc = _ct.CDLL("libc.so.6", use_errno=True)
            _libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
            _libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
        except Exception:
            pass  # non-glibc: skip
        _gc.disable()
        import numpy as np
        import pandas as pd

        parts = list(batches)
        df = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"a": [], "b": []})
        )
        is_edge = df["b"].notna()
        vids = df.loc[~is_edge, "a"].to_numpy()
        nv = len(vids)
        if nv == 0:
            _gc.enable()  # early exit: re-arm cyclic gc for the worker
            return
        idx = pd.Series(np.arange(nv), index=vids)
        a_vals = df.loc[is_edge, "a"]
        b_vals = df.loc[is_edge, "b"]
        if a_vals.dtype != vids.dtype:
            a_vals = a_vals.astype(vids.dtype)
        if b_vals.dtype != vids.dtype:
            b_vals = b_vals.astype(vids.dtype)
        src_f = idx.reindex(a_vals).to_numpy()
        dst_f = idx.reindex(b_vals).to_numpy()
        known = ~(np.isnan(src_f) | np.isnan(dst_f))
        src = src_f[known].astype("int64")
        dst = dst_f[known].astype("int64")
        x = np.ones(nv, dtype="float64")
        for _ in range(steps):
            msg = np.bincount(dst, weights=x[src], minlength=nv)
            x = 1.0 + beta * msg
        # gc epilogue: drop the big build frames, then pay the ONE cyclic
        # sweep of the task here instead of N threshold sweeps mid-build
        del df, parts
        _gc.enable(); _gc.collect()
        yield pd.DataFrame({"id": vids, "score": x})

    one = payload.coalesce(1)
    return one.mapInPandas(
        solve, schema=f"id {id_type}, score double"
    ).localCheckpoint(eager=True)
