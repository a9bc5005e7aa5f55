"""Greedy graph coloring, Luby/Jones-Plassmann style (SURVEY §2.11 G3).

Parity with reference color/color.go:70-200:
  - undirected: every edge is mirrored (AddEdge adds the reverse too);
  - each vertex draws a random token once; per round, an uncolored vertex
    whose (token, id) is strictly greatest among its uncolored neighbors
    picks the minimum color not used by any colored neighbor (token tie
    broken by larger id — color.go:173-177);
  - isolated uncolored vertices take color 1;
  - pre-colored vertices keep their color and constrain neighbors;
  - stop when every vertex is colored (activeInStep == 0).

Tokens are a deterministic hash of (id, seed) so runs are reproducible
(the reference seeds rand for its tests the same way).

Per-iteration shape: state⋈edges (edges cached, partitioned by src) then a
groupBy dst collecting neighbor (token,color) — one shuffle; winners are
decided by comparing against the aggregated neighbor max, entirely
JVM-side.
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


def color_graph(
    vertices: DataFrame,
    edges: DataFrame,
    seed: int = 42,
    max_steps: int = 500,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    color_col: str | None = None,
    strategy: str = "auto",
) -> IterationResult:
    """Returns state (id, color) with colors >= 1; pre-colored vertices
    (``color_col`` with values > 0) keep their colors."""
    spark = vertices.sparkSession
    pre = (
        F.coalesce(F.col(color_col), F.lit(0)).cast("int")
        if color_col and color_col in vertices.columns
        else F.lit(0)
    )
    # one materialization covers the vertex count AND the initial state
    state = (
        vertices.select(F.col(id_col).alias("id"), pre.alias("color"))
        .dropDuplicates(["id"])
        # md5 hex string as the random token: uniform, reproducible, and
        # portable to any engine (lexicographic comparison = numeric
        # comparison on a uniform hash)
        .withColumn("token", F.md5(F.concat_ws(":", F.lit(seed), F.col("id"))))
        .localCheckpoint(eager=True)
    )
    n = state.count()
    # mirror edges for undirectedness; drop self-loops; materialize once
    fwd = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    e0 = (
        fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    n_edges = e0.count()
    if strategy == "auto":
        strategy = "local" if n + n_edges <= LOCAL_SOLVE_MAX_ROWS else "distributed"
    if strategy == "local":
        return _coloring_local(spark, state, e0, max_steps)
    # partitions sized by the dominant per-step volume (mirrored edges)
    with loop_tuned_session(spark, max(n, n_edges)) as n_part:
        return _coloring_loop(spark, state, e0, max_steps, n_part)


def _coloring_local(spark, state, e0, max_steps) -> IterationResult:
    """Single-task greedy token coloring — the identical per-round winner
    rule as _coloring_loop ((token, id) strictly greatest among uncolored
    neighbors takes the least free color), one Spark job for the whole
    loop.  ``state`` already carries (id, color, token) so the tokens are
    bit-identical to the distributed path's."""
    id_type = dict(state.dtypes)["id"]
    payload = state.select(
        F.col("id").alias("a"),
        F.lit(None).cast(id_type).alias("b"),
        F.col("color").alias("pre"),
        F.col("token"),
    ).unionByName(
        e0.select(
            F.col("src").cast(id_type).alias("a"),
            F.col("dst").cast(id_type).alias("b"),
            F.lit(None).cast("int").alias("pre"),
            F.lit(None).cast("string").alias("token"),
        )
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
        df = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
            {"a": [], "b": [], "pre": [], "token": []}
        )
        is_edge = df["b"].notna()
        verts = df.loc[~is_edge]
        vids = verts["a"].to_numpy()
        nv = len(vids)
        if nv == 0:
            _gc.enable()  # early exit: re-arm cyclic gc for the worker
            return
        colors = verts["pre"].to_numpy().astype("int64")
        tokens = verts["token"].to_numpy()
        idx = pd.Series(np.arange(nv), index=vids)
        # nullable columns coerce integral ids to float64 in pandas
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

        uncolored_hist: list[int] = []
        steps = 0
        converged = False
        for _ in range(max_steps):
            unc = colors == 0
            nbr = pd.DataFrame({"d": dst, "ncolor": colors[src], "ns": src})
            used_by = {
                d: set(g[g > 0]) for d, g in nbr.groupby("d")["ncolor"]
            }
            # strongest uncolored neighbor per vertex as a (token, id) pair
            unc_nbr = nbr[unc[nbr["ns"].to_numpy()]]
            max_unc = {
                d: max((tokens[s], vids[s]) for s in g)
                for d, g in unc_nbr.groupby("d")["ns"]
            }
            new_colors = colors.copy()
            for vi in np.nonzero(unc)[0]:
                mu = max_unc.get(vi)
                if mu is None or (tokens[vi], vids[vi]) > mu:
                    used = used_by.get(vi, set())
                    c = 1
                    while c in used:
                        c += 1
                    new_colors[vi] = c
            colors = new_colors
            steps += 1
            remaining = int((colors == 0).sum())
            uncolored_hist.append(remaining)
            if remaining == 0:
                converged = True
                break
        # gc epilogue: drop the big build frames, then pay the ONE cyclic
        # sweep of the task here instead of N threshold sweeps mid-build
        del df, parts
        _gc.enable(); _gc.collect()
        yield pd.DataFrame(
            {
                "id": vids,
                "color": colors.astype("int32"),
                "steps": np.int32(steps),
                "converged": converged,
                "hist": [uncolored_hist] + [None] * (nv - 1),
            }
        )

    out = payload.coalesce(1).mapInPandas(
        solve, schema=f"id {id_type}, color int, steps int, converged boolean, hist array<long>"
    ).localCheckpoint(eager=True)
    meta = out.select("steps", "converged", "hist").first()
    if meta is None:  # empty vertex set -> solver yielded no rows
        return IterationResult(state=out.drop("steps", "converged", "hist"), steps=0, converged=True, history=[])
    history = [{"uncolored": int(u)} for u in (meta["hist"] or [])]
    return IterationResult(
        state=out.select("id", "color"),
        steps=int(meta["steps"]),
        converged=bool(meta["converged"]),
        history=history,
    )


def _coloring_loop(spark, state, e0, max_steps, n_part) -> IterationResult:
    e = e0.repartition(n_part, "src").localCheckpoint(eager=True)

    def step_fn(current: DataFrame, step: int):
        # neighbor view: for each dst, the colors used and the strongest
        # uncolored (token, id) among its neighbors
        nbr = (
            current.join(e, current.id == e.src, "inner")
            .select(
                F.col("dst").alias("id"),
                F.col("color").alias("n_color"),
                F.when(F.col("color") == 0, F.struct(F.col("token"), F.col("src").alias("nid"))).alias(
                    "n_unc"
                ),
            )
            .groupBy("id")
            .agg(
                F.collect_set(F.when(F.col("n_color") > 0, F.col("n_color"))).alias("used"),
                F.max("n_unc").alias("max_unc"),
            )
        )
        joined = current.join(nbr, "id", "left")
        wins = F.col("color") == 0
        wins &= (
            F.col("max_unc").isNull()
            | (F.struct(F.col("token"), F.col("id").alias("nid")) > F.col("max_unc"))
        )
        used = F.coalesce(F.col("used"), F.array().cast("array<int>"))
        # minimum positive color not in 'used': among 1..|used|+1 at least
        # one is free
        next_color = F.array_min(F.array_except(F.sequence(F.lit(1), F.size(used) + 1), used))
        updated = joined.select(
            "id",
            F.when(wins, next_color).otherwise(F.col("color")).alias("color"),
            "token",
        )
        # remaining-uncolored count observed inside the checkpoint job
        updated, metrics = checkpoint_with_metrics(
            updated, uncolored=F.coalesce(F.sum((F.col("color") == 0).cast("long")), F.lit(0))
        )
        return updated, {"uncolored": int(metrics["uncolored"])}

    result = run_fixpoint(
        state,
        step_fn,
        should_continue=lambda m, step: m["uncolored"] > 0,
        max_steps=max_steps,
        checkpoint_every=10**9,
    )
    release_local_checkpoint(e)
    result.state = result.state.select("id", "color")
    return result
