"""PageRank with the reference's exact semantics (SURVEY §2.11 G1), as an
iterative DataFrame loop.

Parity with reference pagerank/compute.go:24-103 + calculator.go:86-124 +
config.go:39-49:
  - step 1 initializes every score to 1/N (scores sum to 1);
  - step t>=2:  score = (1-d)/N + d * sum(incoming msgs)
                        + d * residual_{t-1}
    where a non-dead-end vertex sends score/out_degree to each neighbor and
    each dead-end adds score/N to the residual accumulator read the NEXT
    step (double-buffered residual_0/1 == our "residual from previous
    ranks");
  - SAD = sum(|new - old|) per step; converge when step > 1 and SAD <
    min_sad (default 0.001); damping d = 0.85;
  - self-edges dropped (calculator.go:66-70).

Scale shape per iteration: one join ranks⋈edges on id==src (edges
pre-partitioned by src and cached — only ranks shuffles), one groupBy dst
(partial aggregation map-side), one small dead-end agg (broadcast-joined
against out_degrees), and a left join back onto the vertex set.  Lineage is
truncated every iteration via the fixpoint harness.

Two physical strategies behind one API (strategy="auto"):
  - "distributed": the per-superstep DataFrame loop above — the 100-TB
    path; work per step dominates the fixed per-job cost.
  - "local": when |V|+|E| fits one task (default <= 2M rows), the whole
    graph flows through ONE mapInPandas task that runs the identical
    recurrence as numpy bincount mat-vecs.  On small/medium graphs the
    distributed loop's cost is pure job-scheduling floor (~0.5s/superstep
    for milliseconds of math), so collapsing N supersteps into one Spark
    job is a 5-20x wall-clock win.  This is executor-side compute (NOT a
    driver collect): the plan stays a DataFrame end-to-end and the switch
    point is a row-count threshold, so at 1000x data it simply stays on
    the distributed path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from usearch_spark.plans.iterative import (
    LOCAL_SOLVE_MAX_ROWS,
    IterationResult,
    checkpoint_with_metrics,
    loop_tuned_session,
    release_local_checkpoint,
    run_fixpoint,
)


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    min_sad: float = 0.001,
    max_steps: int = 100,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    strategy: str = "auto",
    edges_deduped: bool = False,
    init_scores: DataFrame | None = None,
) -> IterationResult:
    """Returns IterationResult whose state is (id, score).

    ``vertices``: one row per vertex id.  ``edges``: (src, dst) rows; edges
    whose src equals dst are dropped; duplicate edges count once (the
    reference stores at most one edge per (src,dst) pair).

    ``strategy``: "auto" picks "local" (single-task numpy solve inside
    mapInPandas) when |V|+|E| <= LOCAL_SOLVE_MAX_ROWS, else "distributed"
    (per-superstep DataFrame loop).  Both run the identical recurrence.

    ``edges_deduped``: callers that already dropped self-edges and
    (src,dst) duplicates (e.g. a store that enforces edge identity) set
    this to skip the defensive dedup — one full edge shuffle saved.

    ``init_scores``: optional (id, score) warm start — the INCREMENTAL
    form of the reference's hourly pagerank pass: seed from the previous
    pass's converged ranks instead of uniform 1/N and the SAD criterion
    converges in a few steps on a mildly-changed graph instead of ~10+.
    Vertices absent from the warm set (new pages) start at 1/N; the whole
    vector is renormalized to sum 1, so the recurrence's mass-conservation
    invariant holds regardless of graph churn.  The fixpoint is identical
    to a cold run — the warm start changes step COUNT, not the answer.
    """
    spark = vertices.sparkSession

    # materialize the deduped vertex set ONCE: it feeds the count, the init
    # join, and (via lineage) every step — without this, a derived input
    # (e.g. vertices = union of edge endpoints over a big fact table) is
    # re-scanned and re-shuffled for each of those uses
    v = vertices.select(F.col(id_col).alias("id")).dropDuplicates(["id"]).localCheckpoint(eager=True)
    n = v.count()
    if n == 0:
        empty = v.withColumn("score", F.lit(0.0))
        return IterationResult(state=empty, steps=0, converged=True, history=[])

    e0 = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not edges_deduped:
        e0 = e0.filter(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])
    e0 = e0.localCheckpoint(eager=True)
    n_edges = e0.count()

    s0 = None
    if init_scores is not None:
        # coalesce new vertices to 1/N, renormalize to sum 1, materialize
        # (the init feeds the first superstep AND the local payload)
        warm = v.join(
            init_scores.select(F.col("id"), F.col("score").alias("_ws")), "id", "left"
        ).select("id", F.coalesce(F.col("_ws"), F.lit(1.0 / n)).alias("_ws"))
        total = warm.agg(F.sum("_ws").alias("_tot"))
        s0 = (
            warm.join(F.broadcast(total))
            .select("id", (F.col("_ws") / F.col("_tot")).alias("s0"))
            .localCheckpoint(eager=True)
        )

    if strategy == "auto":
        strategy = "local" if n + n_edges <= LOCAL_SOLVE_MAX_ROWS else "distributed"
    if strategy == "local":
        return _pagerank_local(spark, v, n, e0, damping, min_sad, max_steps, init=s0)
    # loop partitions sized by the DOMINANT per-step volume: the ranks⋈edges
    # join moves |E| rows, usually >> |V| (a vertex-count sizing left a 500k-
    # edge graph on 2 partitions — 2 tasks on a 32-core box)
    with loop_tuned_session(spark, max(n, n_edges)) as n_part:
        return _pagerank_loop(spark, v, n, e0, damping, min_sad, max_steps, n_part, init=s0)


def personalized_pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    sources: list,
    damping: float = 0.85,
    min_sad: float = 0.001,
    max_steps: int = 100,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    strategy: str = "auto",
    edges_deduped: bool = False,
) -> IterationResult:
    """Personalized PageRank (random walk with restart): the teleport mass
    (1-d) and the dead-end residual both flow to the ``sources`` set
    (uniformly within it) instead of to every vertex.

    Recurrence:  r_0 = p;   r_t = (1-d)·p + d·(Σ msgs) + d·residual·p
    with p_i = 1/|sources| for i in sources else 0 — the standard PPR
    variant of the reference recurrence (compute.go:24-103), same SAD
    stopping rule.  Same two physical strategies as :func:`pagerank`:
    single-task numpy solve for small graphs, per-superstep DataFrame loop
    at scale (the teleport vector rides the state as one extra column).
    """
    spark = vertices.sparkSession
    if not sources:
        raise ValueError("personalized_pagerank needs a non-empty source set")
    v = vertices.select(F.col(id_col).alias("id")).dropDuplicates(["id"]).localCheckpoint(eager=True)
    n = v.count()
    if n == 0:
        empty = v.withColumn("score", F.lit(0.0))
        return IterationResult(state=empty, steps=0, converged=True, history=[])

    e0 = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not edges_deduped:
        e0 = e0.filter(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])
    e0 = e0.localCheckpoint(eager=True)
    n_edges = e0.count()
    p_val = 1.0 / len(set(sources))
    p_col = F.when(F.col("id").isin(list(set(sources))), F.lit(p_val)).otherwise(F.lit(0.0))
    if strategy == "auto":
        strategy = "local" if n + n_edges <= LOCAL_SOLVE_MAX_ROWS else "distributed"
    if strategy == "local":
        return _pagerank_local(
            spark, v, n, e0, damping, min_sad, max_steps, teleport=p_col
        )
    with loop_tuned_session(spark, max(n, n_edges)) as n_part:
        return _ppr_loop(spark, v, e0, damping, min_sad, max_steps, n_part, p_col)


def _ppr_push_local(e, seeds, p_val, d, omd, eps, rounds, id_type):
    """Single-task numpy mirror of the forward-push loop (the katz/harmonic
    local-solve pattern): the deduped edge list ships once through Arrow,
    one task runs all ``rounds`` pushes, and only the touched (id, p, r)
    rows come back.  Float chains per vertex are op-for-op the distributed
    recurrence (multiply-then-add; kept + Σ pushes + seed credit); the
    per-destination push sum accumulates in edge order, the same
    summation-order class the 8dp closing round already absorbs between
    Spark's partial aggs and DuckDB.  Support membership is exact: a
    vertex is touched iff it ever receives a push."""
    seed_list = list(seeds)

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

        parts = [b for b in batches]
        df = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"src": [], "dst": []})
        )
        src = df["src"].to_numpy()
        dst = df["dst"].to_numpy()
        seed_arr = np.asarray(seed_list)
        if len(src) and seed_arr.dtype != src.dtype:
            seed_arr = seed_arr.astype(src.dtype)
        ids, inv = np.unique(np.concatenate([src, dst, seed_arr]), return_inverse=True)
        ns = len(src)
        si, di, seed_idx = inv[:ns], inv[ns : 2 * ns], inv[2 * ns :]
        n = len(ids)
        od = np.bincount(si, minlength=n).astype("float64")
        has_out = od > 0
        p = np.zeros(n)
        r = np.zeros(n)
        r[seed_idx] = p_val
        touched = np.zeros(n, dtype=bool)
        touched[seed_idx] = True
        for _ in range(rounds):
            # dead mass of the CURRENT state (the distributed loop's
            # checkpoint metric), credited to the seeds this round
            dead_mass = float(r[(~has_out) & (r > 0.0)].sum())
            fr = r > eps * od
            mask = (fr & has_out)[si]
            add_r = np.zeros(n)
            if mask.any():
                np.add.at(add_r, di[mask], d * r[si[mask]] / od[si[mask]])
                touched[di[mask]] = True
            seed_add = (d * dead_mass) * p_val
            p = p + np.where(fr, omd * r, 0.0)
            r = np.where(fr, 0.0, r) + add_r
            r[seed_idx] += seed_add
        out = pd.DataFrame({"id": ids[touched], "p": p[touched], "r": r[touched]})
        # gc epilogue: drop the big build frames, then pay the ONE cyclic
        # sweep of the task here instead of N threshold sweeps mid-build
        del df, parts
        _gc.enable(); _gc.collect()
        yield out

    return e.coalesce(1).mapInPandas(solve, schema=f"id {id_type}, p double, r double")


def ppr_forward_push(
    edges: DataFrame,
    sources: list,
    damping: float = 0.85,
    rounds: int = 10,
    eps: float = 0.0,
    src_col: str = "src",
    dst_col: str = "dst",
    edges_deduped: bool = False,
    strategy: str = "auto",
) -> DataFrame:
    """Personalized PageRank by FORWARD LOCAL PUSH (Andersen, Chung &
    Lang 2006, the single-seed PPR shape at scale): instead of iterating
    a dense |V|-row score vector like :func:`personalized_pagerank`, the
    state is the SPARSE (id, p, r) pair — p the settled estimate, r the
    un-pushed residual — seeded with r = 1/|sources| on the seeds only.
    Each synchronous round pushes every frontier vertex at once:

        p += (1-d)·r          (teleport share settles)
        d·r/od  ->  each out-neighbor's r
        d·r     ->  the seed distribution, for dead ends

    — the same teleport/dead-end semantics as the reference recurrence
    (compute.go:24-103 via personalized_pagerank): in the fixpoint limit
    p equals the stationary PPR vector, and Σr bounds the truncation
    error by (d)^rounds.

    FRONTIER BOUND (the 100-TB story): state rows exist only where mass
    has arrived, so after k rounds the support is contained in the
    k-hop out-ball of the seed set — each round's only shuffle is
    frontier⋈edges, proportional to the BALL's out-degree, never |V|.
    With ``eps`` > 0 the classic ACL threshold (push only r > eps·od)
    additionally caps TOTAL pushed volume at O(1/(eps·(1-d))) — the
    production knob for planet-scale graphs where an approximation is
    acceptable; the oracled entry runs eps = 0 (push-all), which keeps
    the discrete frontier decision EXACT (support membership — a
    positive sum of positives — is summation-order-safe, unlike an
    eps-threshold on a float sum) so the DuckDB oracle can unroll the
    identical recurrence.

    Returns the sparse touched set as (id, score, residual), both
    rounded to 8dp (the graph_ppr float-parity class: linear float ops
    only, one closing round).

    ``strategy``: like katz/harmonic — "auto" runs the IDENTICAL push
    recurrence as a single-task numpy solve inside mapInPandas when the
    edge count is at or below ``LOCAL_SOLVE_MAX_ROWS`` (ten distributed
    supersteps on a tiny frontier are pure scheduling floor at bench
    scale), and the per-superstep DataFrame loop above it (the only
    shape that scales — force with ``strategy="distributed"``).  The
    oracle is strategy-independent: both paths apply the same per-vertex
    float chain (p + (1-d)·r; kept + Σ pushes + seed credit) closed by
    the shared single 8dp round, and support membership stays exact
    (a vertex is touched iff it ever RECEIVES a push, not a float test).
    """
    from usearch_spark.plans.iterative import (
        LOCAL_SOLVE_MAX_ROWS,
        release_local_checkpoint,
    )

    spark = edges.sparkSession
    if not sources:
        raise ValueError("ppr_forward_push needs a non-empty source set")
    e0 = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not edges_deduped:
        e0 = e0.filter(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])
    e = e0.localCheckpoint(eager=True)
    seeds = sorted(set(sources))
    p_val = 1.0 / len(seeds)
    d, omd = damping, 1.0 - damping
    id_type = dict(e.dtypes)["src"]
    if strategy == "auto":
        strategy = "local" if e.count() <= LOCAL_SOLVE_MAX_ROWS else "distributed"
    if strategy == "local":
        state = _ppr_push_local(e, seeds, p_val, d, omd, eps, rounds, id_type)
        return state.select(
            "id",
            F.round("p", 8).alias("score"),
            F.round("r", 8).alias("residual"),
        )
    out_deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
        .withColumnRenamed("src", "id")
        .localCheckpoint(eager=True)
    )
    seed_df = spark.createDataFrame([(str(s),) for s in seeds], "id string").select(
        F.col("id").cast(id_type)
    )
    fr = F.col("r") > F.lit(eps) * F.coalesce(F.col("od"), F.lit(0)).cast("double")
    dm_metric = F.coalesce(
        F.sum(F.when(F.col("od").isNull() & (F.col("r") > F.lit(0.0)), F.col("r"))),
        F.lit(0.0),
    )
    state, m = checkpoint_with_metrics(
        seed_df.withColumn("p", F.lit(0.0))
        .withColumn("r", F.lit(p_val))
        .join(out_deg, "id", "left"),
        dm=dm_metric,
    )
    dead_mass = float(m["dm"])
    prev = state
    with loop_tuned_session(spark, e.count()):
        for _ in range(rounds):
            msgs = (
                state.filter(fr & F.col("od").isNotNull())
                .hint("shuffle_hash")
                .join(e, state["id"] == e["src"])
                .select(
                    F.col("dst").alias("id"),
                    (F.lit(d) * F.col("r") / F.col("od").cast("double")).alias("mr"),
                )
                .groupBy("id")
                .agg(F.sum("mr").alias("add_r"))
            )
            seed_add = (d * dead_mass) * p_val  # driver float, like _ppr_loop's residual
            base = state.select("id", "p", "r", "od").join(msgs, "id", "full")
            nxt = base.select(
                "id",
                (
                    F.coalesce(F.col("p"), F.lit(0.0))
                    + F.when(fr, F.lit(omd) * F.col("r")).otherwise(F.lit(0.0))
                ).alias("p"),
                (
                    F.when(fr, F.lit(0.0)).otherwise(F.coalesce(F.col("r"), F.lit(0.0)))
                    + F.coalesce(F.col("add_r"), F.lit(0.0))
                    + F.when(
                        F.col("id").isin(seeds), F.lit(seed_add)
                    ).otherwise(F.lit(0.0))
                ).alias("r"),
            ).drop("od").join(out_deg, "id", "left")
            state, m = checkpoint_with_metrics(nxt, dm=dm_metric)
            release_local_checkpoint(prev)
            prev = state
            dead_mass = float(m["dm"])
    return state.select(
        "id",
        F.round("p", 8).alias("score"),
        F.round("r", 8).alias("residual"),
    )


def weighted_pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    min_sad: float = 0.001,
    max_steps: int = 100,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    strategy: str = "auto",
) -> IterationResult:
    """PageRank over a WEIGHTED edge set: a vertex distributes its score
    proportionally to edge weights (msg = score·w/Σw_out) instead of
    uniformly over out-degree; dead-end residual and SAD stopping are
    unchanged from :func:`pagerank`.

    Duplicate (src,dst) edges keep their max weight (deterministic dedup);
    self-edges are dropped.  Same adaptive local/distributed split.
    """
    spark = vertices.sparkSession
    v = vertices.select(F.col(id_col).alias("id")).dropDuplicates(["id"]).localCheckpoint(eager=True)
    n = v.count()
    if n == 0:
        empty = v.withColumn("score", F.lit(0.0))
        return IterationResult(state=empty, steps=0, converged=True, history=[])
    e0 = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.max("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    n_edges = e0.count()
    if strategy == "auto":
        strategy = "local" if n + n_edges <= LOCAL_SOLVE_MAX_ROWS else "distributed"
    if strategy == "local":
        return _weighted_pagerank_local(v, n, e0, damping, min_sad, max_steps)
    with loop_tuned_session(spark, max(n, n_edges)) as n_part:
        return _weighted_pagerank_loop(v, n, e0, damping, min_sad, max_steps, n_part)


def _weighted_pagerank_local(v, n, e0, damping, min_sad, max_steps) -> IterationResult:
    import math

    id_type = dict(v.dtypes)["id"]
    payload = v.select(
        F.col("id").alias("a"), F.lit(None).cast(id_type).alias("b"), F.lit(None).cast("double").alias("w")
    ).unionByName(
        e0.select(
            F.col("src").cast(id_type).alias("a"),
            F.col("dst").cast(id_type).alias("b"),
            F.col("w"),
        )
    )
    d = damping
    track_sad = min_sad > 0.0

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
        df = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame({"a": [], "b": [], "w": []})
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
        w_all = df.loc[is_edge, "w"].to_numpy(dtype="float64")
        src_known = ~np.isnan(src_f)
        both = src_known & ~np.isnan(dst_f)
        outw = np.bincount(src_f[src_known].astype("int64"), weights=w_all[src_known], minlength=nv)
        src = src_f[both].astype("int64")
        dst = dst_f[both].astype("int64")
        w = w_all[both]
        dead = outw == 0.0
        score = np.full(nv, 1.0 / nv)
        sads: list[float] = []
        steps = 0
        converged = False
        for _ in range(max_steps):
            res_prev = score[dead].sum() / nv
            msg = np.bincount(dst, weights=score[src] * w / outw[src], minlength=nv)
            new = (1.0 - d) / nv + d * msg + d * res_prev
            sad = float(np.abs(new - score).sum()) if track_sad else math.inf
            sads.append(sad)
            score = new
            steps += 1
            if track_sad and sad < min_sad:
                converged = True
                break
        # gc epilogue: drop the big build frames, then pay the ONE cyclic
        # sweep of the task here instead of N threshold sweeps mid-build
        del df, parts
        _gc.enable(); _gc.collect()
        yield pd.DataFrame(
            {
                "id": vids,
                "score": score,
                "steps": np.int32(steps),
                "converged": converged,
                "sads": [sads] + [None] * (nv - 1),
            }
        )

    out = payload.coalesce(1).mapInPandas(
        solve, schema=f"id {id_type}, score double, steps int, converged boolean, sads array<double>"
    ).localCheckpoint(eager=True)
    meta = out.select("steps", "converged", "sads").first()
    if meta is None:
        return IterationResult(state=out.select("id", "score"), steps=0, converged=True, history=[])
    history = [{"sad": s} for s in (meta["sads"] or [])]
    return IterationResult(
        state=out.select("id", "score"),
        steps=int(meta["steps"]),
        converged=bool(meta["converged"]),
        history=history,
    )


def _weighted_pagerank_loop(v, n, e0, damping, min_sad, max_steps, n_part) -> IterationResult:
    # localCheckpoint (not .cache()) for the loop-invariant frames: eager
    # blocks the loop reads directly, released the moment the loop ends —
    # .cache() pinned them until the caller's clearCache (r15-verdict #3)
    e = e0.repartition(n_part, "src").localCheckpoint(eager=True)
    out_w = (
        e.groupBy("src")
        .agg(F.sum("w").alias("outw"))
        .withColumnRenamed("src", "id")
        .localCheckpoint(eager=True)
    )
    res_metric = (
        F.coalesce(F.sum(F.when(F.col("outw").isNull(), F.col("score"))), F.lit(0.0)) / n
    )
    ranks, init_metrics = checkpoint_with_metrics(
        v.withColumn("score", F.lit(1.0 / n)).join(out_w, "id", "left").repartition(n_part, "id"),
        res=res_metric,
    )
    residual = {"prev": float(init_metrics["res"])}
    d = damping
    track_sad = min_sad > 0.0

    def step_fn(current: DataFrame, step: int):
        contribs = (
            current.filter(F.col("outw").isNotNull())
            .hint("shuffle_hash")
            .join(e, F.col("id") == e.src, "inner")
            .select(
                F.col("dst").alias("id"),
                (F.col("score") * F.col("w") / F.col("outw")).alias("msg"),
            )
            .groupBy("id")
            .agg(F.sum("msg").alias("msg_sum"))
        )
        new_ranks = (
            current.withColumnRenamed("score", "old_score")
            .join(contribs.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d) * F.coalesce(F.col("msg_sum"), F.lit(0.0))
                    + F.lit(d * residual["prev"])
                ).alias("score"),
                "old_score",
                "outw",
            )
        )
        new_ranks, metrics = checkpoint_with_metrics(
            new_ranks,
            project=["id", "score", "outw"],
            sad=F.coalesce(F.sum(F.abs(F.col("score") - F.col("old_score"))), F.lit(0.0)),
            res=res_metric,
        )
        residual["prev"] = float(metrics["res"])
        sad = float(metrics["sad"]) if track_sad else float("inf")
        return new_ranks, {"sad": sad}

    result = run_fixpoint(
        ranks,
        step_fn,
        should_continue=lambda m, step: m["sad"] >= min_sad,
        max_steps=max_steps,
        checkpoint_every=10**9,
    )
    release_local_checkpoint(e)
    release_local_checkpoint(out_w)
    result.state = result.state.select("id", "score")
    return result


def _ppr_loop(spark, v, e0, damping, min_sad, max_steps, n_part, p_col) -> IterationResult:
    """Distributed PPR superstep loop — same plan shape as _pagerank_loop
    (one edge join + one agg + one state join per step, metrics observed on
    the checkpoint job) with the teleport weight as a state column."""
    e = e0.repartition(n_part, "src").localCheckpoint(eager=True)
    out_deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .withColumnRenamed("src", "id")
        .localCheckpoint(eager=True)
    )

    # residual = total score stranded on dead ends (NOT divided by N: PPR
    # redistributes it through the teleport vector, not uniformly)
    res_metric = F.coalesce(F.sum(F.when(F.col("outdeg").isNull(), F.col("score"))), F.lit(0.0))

    ranks, init_metrics = checkpoint_with_metrics(
        v.withColumn("p", p_col)
        .withColumn("score", F.col("p"))
        .join(out_deg, "id", "left")
        .repartition(n_part, "id"),
        res=res_metric,
    )
    residual = {"prev": float(init_metrics["res"])}
    d = damping
    track_sad = min_sad > 0.0

    def step_fn(current: DataFrame, step: int):
        contribs = (
            current.filter(F.col("outdeg").isNotNull())
            .hint("shuffle_hash")
            .join(e, F.col("id") == e.src, "inner")
            .select(F.col("dst").alias("id"), (F.col("score") / F.col("outdeg")).alias("msg"))
            .groupBy("id")
            .agg(F.sum("msg").alias("msg_sum"))
        )
        new_ranks = (
            current.withColumnRenamed("score", "old_score")
            .join(contribs.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                "p",
                (
                    F.lit(1.0 - d) * F.col("p")
                    + F.lit(d) * F.coalesce(F.col("msg_sum"), F.lit(0.0))
                    + F.lit(d * residual["prev"]) * F.col("p")
                ).alias("score"),
                "old_score",
                "outdeg",
            )
        )
        new_ranks, metrics = checkpoint_with_metrics(
            new_ranks,
            project=["id", "p", "score", "outdeg"],
            sad=F.coalesce(F.sum(F.abs(F.col("score") - F.col("old_score"))), F.lit(0.0)),
            res=res_metric,
        )
        residual["prev"] = float(metrics["res"])
        sad = float(metrics["sad"]) if track_sad else float("inf")
        return new_ranks, {"sad": sad}

    result = run_fixpoint(
        ranks,
        step_fn,
        should_continue=lambda m, step: m["sad"] >= min_sad,
        max_steps=max_steps,
        checkpoint_every=10**9,
    )
    release_local_checkpoint(e)
    release_local_checkpoint(out_deg)
    result.state = result.state.select("id", "score")
    return result


def _pagerank_local(spark, v, n, e0, damping, min_sad, max_steps, teleport=None, init=None) -> IterationResult:
    """Single-task solve: vertices and edges stream through one mapInPandas
    task which runs the reference recurrence with numpy bincount mat-vecs.
    One Spark job materializes the result; steps/SAD history ride along as
    constant columns so the driver reads them from the checkpointed output
    without recomputing."""
    import math

    id_type = dict(v.dtypes)["id"]
    # vertex rows carry the teleport weight in ``w`` (null on edge rows);
    # uniform pagerank passes teleport=None and ``w`` stays null throughout.
    # A warm start rides the same pattern in ``s`` (normalized init score).
    w_col = teleport if teleport is not None else F.lit(None).cast("double")
    vsel = v if init is None else v.join(init, "id")
    s_col = F.col("s0") if init is not None else F.lit(None).cast("double")
    payload = vsel.select(
        F.col("id").alias("a"), F.lit(None).cast(id_type).alias("b"), w_col.alias("w"), s_col.alias("s")
    ).unionByName(
        e0.select(
            F.col("src").cast(id_type).alias("a"),
            F.col("dst").cast(id_type).alias("b"),
            F.lit(None).cast("double").alias("w"),
            F.lit(None).cast("double").alias("s"),
        )
    )

    d = damping
    personalized = teleport is not None
    warm = init is not None
    track_sad = min_sad > 0.0

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
            else pd.DataFrame({"a": [], "b": [], "w": [], "s": []})
        )
        is_edge = df["b"].notna()
        vids = df.loc[~is_edge, "a"].to_numpy()
        nv = len(vids)
        if nv == 0:
            _gc.enable()  # early exit: re-arm cyclic gc for the worker
            return
        idx = pd.Series(np.arange(nv), index=vids)
        # nullable columns coerce integral ids to float64 in pandas — bring
        # edge endpoints back to the vertex dtype before the index lookup
        a_vals = df.loc[is_edge, "a"]
        b_vals = df.loc[is_edge, "b"]
        if a_vals.dtype != vids.dtype:
            a_vals = a_vals.astype(vids.dtype)
        if b_vals.dtype != vids.dtype:
            b_vals = b_vals.astype(vids.dtype)
        src_f = idx.reindex(a_vals).to_numpy()
        dst_f = idx.reindex(b_vals).to_numpy()
        # parity with the distributed loop: out-degree counts every edge
        # whose SOURCE is a known vertex (e.groupBy('src') there), while
        # message delivery additionally needs a known destination (the left
        # join back onto the vertex set drops unknown-dst messages)
        src_known = ~np.isnan(src_f)
        both = src_known & ~np.isnan(dst_f)
        outdeg = np.bincount(src_f[src_known].astype("int64"), minlength=nv).astype("float64")
        src = src_f[both].astype("int64")
        dst = dst_f[both].astype("int64")
        dead = outdeg == 0.0
        if personalized:
            pvec = df.loc[~is_edge, "w"].to_numpy(dtype="float64")
            score = pvec.copy()
        elif warm:
            score = df.loc[~is_edge, "s"].to_numpy(dtype="float64")
        else:
            score = np.full(nv, 1.0 / nv)
        sads: list[float] = []
        steps = 0
        converged = False
        for _ in range(max_steps):
            msg = np.bincount(dst, weights=score[src] / outdeg[src], minlength=nv)
            if personalized:
                # dead-end mass restarts through the teleport vector
                res_prev = score[dead].sum()
                new = (1.0 - d) * pvec + d * msg + d * res_prev * pvec
            else:
                res_prev = score[dead].sum() / nv  # residual of the CURRENT state
                new = (1.0 - d) / nv + d * msg + d * res_prev
            sad = float(np.abs(new - score).sum()) if track_sad else math.inf
            sads.append(sad)
            score = new
            steps += 1
            if track_sad and sad < min_sad:
                converged = True
                break
        # gc epilogue: drop the big build frames, then pay the ONE cyclic
        # sweep of the task here instead of N threshold sweeps mid-build
        del df, parts
        _gc.enable(); _gc.collect()
        yield pd.DataFrame(
            {
                "id": vids,
                "score": score,
                "steps": np.int32(steps),
                "converged": converged,
                # history only on row 0 — duplicating a 60-float list onto
                # every vertex row would be O(|V|*steps) dead weight
                "sads": [sads] + [None] * (nv - 1),
            }
        )

    out = payload.coalesce(1).mapInPandas(
        solve,
        schema=f"id {id_type}, score double, steps int, converged boolean, sads array<double>",
    ).localCheckpoint(eager=True)
    meta = out.select("steps", "converged", "sads").first()
    if meta is None:  # empty vertex set -> solver yielded no rows
        return IterationResult(state=out.select("id", "score"), steps=0, converged=True, history=[])
    history = [{"sad": s} for s in (meta["sads"] or [])]
    return IterationResult(
        state=out.select("id", "score"),
        steps=int(meta["steps"]),
        converged=bool(meta["converged"]),
        history=history,
    )


def _pagerank_loop(spark, v, n, e0, damping, min_sad, max_steps, n_part, init=None) -> IterationResult:
    e = e0.repartition(n_part, "src").localCheckpoint(eager=True)
    out_deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .withColumnRenamed("src", "id")
        .localCheckpoint(eager=True)
    )

    res_metric = (
        F.coalesce(F.sum(F.when(F.col("outdeg").isNull(), F.col("score"))), F.lit(0.0)) / n
    )

    # step 1: uniform 1/N (reference compute.go:44-48), or the normalized
    # warm-start vector when given; carry out-degree on the state so
    # per-step dead-end mass needs no extra join.  The dead-end residual of
    # THIS state — read by the NEXT step, the reference's double-buffered
    # residual_0/1 accumulator — is observed during the same
    # materialization and carried forward as a driver-side scalar, so a step
    # needs no residual subquery/broadcast of its own.
    v_init = (
        v.withColumn("score", F.lit(1.0 / n))
        if init is None
        else v.join(init, "id").withColumnRenamed("s0", "score")
    )
    ranks, init_metrics = checkpoint_with_metrics(
        v_init.join(out_deg, "id", "left").repartition(n_part, "id"),
        res=res_metric,
    )
    residual = {"prev": float(init_metrics["res"])}

    d = damping
    track_sad = min_sad > 0.0

    def step_fn(current: DataFrame, step: int):
        # messages: score/outdeg to each out-neighbor
        contribs = (
            current.filter(F.col("outdeg").isNotNull())
            .hint("shuffle_hash")
            .join(e, F.col("id") == e.src, "inner")
            .select(F.col("dst").alias("id"), (F.col("score") / F.col("outdeg")).alias("msg"))
            .groupBy("id")
            .agg(F.sum("msg").alias("msg_sum"))
        )
        # shuffle_hash on the aggregated side: the state checkpoint carries
        # hashpartitioning(id, n_part) and contribs' agg output is already
        # hash(id)-partitioned, so the join-back is CO-PARTITIONED with no
        # exchange — the unhinted plan instead rebuilt a broadcast of
        # contribs every step (guide §2.4/§3.1)
        new_ranks = (
            current.withColumnRenamed("score", "old_score")
            .join(contribs.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d) * F.coalesce(F.col("msg_sum"), F.lit(0.0))
                    + F.lit(d * residual["prev"])
                ).alias("score"),
                "old_score",
                "outdeg",
            )
        )
        # ONE action per step: SAD convergence AND the next step's dead-end
        # residual both ride the checkpoint job as observed metrics; the
        # projection INSIDE the checkpoint keeps old_score out of the
        # stored state and returns a BARE checkpoint so run_fixpoint can
        # release the superseded step eagerly
        new_ranks, metrics = checkpoint_with_metrics(
            new_ranks,
            project=["id", "score", "outdeg"],
            sad=F.coalesce(F.sum(F.abs(F.col("score") - F.col("old_score"))), F.lit(0.0)),
            res=res_metric,
        )
        residual["prev"] = float(metrics["res"])
        sad = float(metrics["sad"]) if track_sad else float("inf")
        return new_ranks, {"sad": sad}

    result = run_fixpoint(
        ranks,
        step_fn,
        should_continue=lambda m, step: m["sad"] >= min_sad,
        max_steps=max_steps,
        checkpoint_every=10**9,  # step_fn checkpoints internally
    )
    release_local_checkpoint(e)
    release_local_checkpoint(out_deg)
    result.state = result.state.select("id", "score")
    return result
