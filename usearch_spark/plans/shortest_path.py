"""Single-source shortest path (SURVEY §2.11 G2) — parallel Bellman-Ford
with vote-to-halt, as an iterative DataFrame loop.

Parity with reference shortestpath/path.go:87-197:
  - init: src cost 0, everything else +inf (represented as NULL);
  - each step: every vertex whose cost improved relays cost+edge_weight to
    its out-neighbors; a vertex keeps min(incoming, current);
  - ``prev_in_path`` records the predecessor that produced the minimum
    (ties broken deterministically by smallest predecessor id — the
    reference takes whichever message arrived first, which is unspecified);
  - stop when no vertex improved (activeInStep == 0, path.go:103-110);
  - non-negative integer weights.

Per-iteration shape: one join frontier⋈edges on src (edges cached,
pre-partitioned by src), one min-agg by dst, one join back — the frontier
shrinks as the wave passes, and AQE re-plans the join when it becomes
broadcast-small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from usearch_spark.plans.iterative import (
    IterationResult,
    checkpoint_with_metrics,
    loop_tuned_session,
    run_fixpoint,
)


def shortest_paths(
    vertices: DataFrame,
    edges: DataFrame,
    src_id: str,
    max_steps: int = 200,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
) -> IterationResult:
    """Returns state (id, cost, prev_in_path); cost NULL = unreachable."""
    spark = vertices.sparkSession
    # one materialization of the vertex set (count + init reuse it)
    v = vertices.select(F.col(id_col).alias("id")).dropDuplicates(["id"]).localCheckpoint(eager=True)
    n = v.count()
    e0 = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(weight_col).cast("long").alias("weight"),
        )
        .localCheckpoint(eager=True)
    )
    # partitions sized by the dominant per-step volume (edges, usually)
    with loop_tuned_session(spark, max(n, e0.count())) as n_part:
        return _sssp_loop(spark, v, e0, src_id, max_steps, n_part)


def _sssp_loop(spark, v, e0, src_id, max_steps, n_part) -> IterationResult:
    e = e0.repartition(n_part, "src").cache()

    state = (
        v.select(
            "id",
            F.when(F.col("id") == src_id, F.lit(0).cast("long")).alias("cost"),
            F.lit(None).cast("string").alias("prev_in_path"),
            # 'improved' marks the frontier that must relay this step
            F.when(F.col("id") == src_id, F.lit(True)).otherwise(F.lit(False)).alias("improved"),
        )
        .localCheckpoint(eager=True)
    )

    def step_fn(current: DataFrame, step: int):
        frontier = current.filter(F.col("improved"))
        msgs = (
            frontier.join(e, frontier.id == e.src, "inner")
            .select(
                F.col("dst").alias("id"),
                (F.col("cost") + F.col("weight")).alias("new_cost"),
                F.col("src").alias("via"),
            )
            .groupBy("id")
            .agg(F.min(F.struct("new_cost", "via")).alias("best"))
            .select("id", F.col("best.new_cost").alias("new_cost"), F.col("best.via").alias("via"))
        )
        updated = (
            current.drop("improved")
            .join(msgs, "id", "left")
            .select(
                "id",
                F.when(
                    F.col("new_cost").isNotNull() & (F.col("cost").isNull() | (F.col("new_cost") < F.col("cost"))),
                    F.col("new_cost"),
                ).otherwise(F.col("cost")).alias("cost"),
                F.when(
                    F.col("new_cost").isNotNull() & (F.col("cost").isNull() | (F.col("new_cost") < F.col("cost"))),
                    F.col("via"),
                ).otherwise(F.col("prev_in_path")).alias("prev_in_path"),
                (
                    F.col("new_cost").isNotNull() & (F.col("cost").isNull() | (F.col("new_cost") < F.col("cost")))
                ).alias("improved"),
            )
        )
        # activeInStep observed inside the checkpoint job (one action/step)
        updated, metrics = checkpoint_with_metrics(
            updated, active=F.coalesce(F.sum(F.col("improved").cast("long")), F.lit(0))
        )
        return updated, {"active": int(metrics["active"])}

    result = run_fixpoint(
        state,
        step_fn,
        should_continue=lambda m, step: m["active"] > 0,
        max_steps=max_steps,
        checkpoint_every=10**9,
    )
    e.unpersist()
    result.state = result.state.select("id", "cost", "prev_in_path")
    return result


def build_path(state: DataFrame, src_id: str, dest_id: str) -> tuple[list[str], int | None]:
    """Walk prev pointers back from dest (reference path.go:117-141).

    Driver-side walk over the collected (id, prev) map — path length is
    bounded by the graph diameter.  For huge graphs use repeated self-joins
    instead; search-engine path queries are point lookups, so collect is the
    pragmatic default (the prev map is |V| rows of two short strings).
    """
    rows = {r["id"]: (r["cost"], r["prev_in_path"]) for r in state.collect()}
    if dest_id not in rows or rows[dest_id][0] is None:
        return [], None
    path = [dest_id]
    cur = dest_id
    while cur != src_id:
        cur = rows[cur][1]
        path.append(cur)
        if len(path) > len(rows) + 1:
            raise ValueError("cycle in prev_in_path chain")
    path.reverse()
    return path, rows[dest_id][0]
