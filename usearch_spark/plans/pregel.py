"""Pregel-style vertex-program API on the fixpoint harness — the engine's
version of the reference's pluggable ComputeFunc (bsp/interfaces.go:52-53,
SURVEY §2.14 U2).

A vertex program is three declarative pieces:
  - ``send_msgs(state, edges) -> (dst_id, msg)`` rows,
  - ``agg_msg`` an aggregate expression combining messages per vertex,
  - ``apply(state_cols, msg_col) -> new value column``
and the loop stops when no vertex changed (vote-to-halt) or max_steps.

Connected components below doubles as the worked example and as proof the
same harness runs algorithms beyond the three ported from the reference.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from usearch_spark.plans.iterative import (
    IterationResult,
    checkpoint_with_metrics,
    loop_tuned_session,
    run_fixpoint,
)


def pregel(
    vertices: DataFrame,
    edges: DataFrame,
    initial_value: Column,
    send_msg: Callable[[DataFrame, DataFrame], DataFrame],
    agg_msg: Column,
    apply_msg: Callable[[Column, Column], Column],
    max_steps: int = 100,
    id_col: str = "id",
) -> IterationResult:
    """Generic vertex-centric loop.

    ``send_msg(state, edges)`` returns a DataFrame with columns (id, msg)
    addressed to destination vertices; ``agg_msg`` combines the ``msg``
    column per vertex (e.g. F.min("msg")); ``apply_msg(old, agg)`` yields
    the new value.  A vertex with no incoming messages keeps its value.
    Convergence = no value changed in a step.
    """
    spark = vertices.sparkSession
    # one materialization of the vertex set (count + init would otherwise
    # recompute a possibly-expensive derived input plan)
    v = vertices.select(F.col(id_col).alias("id")).dropDuplicates(["id"]).localCheckpoint(eager=True)
    n = v.count()
    e = edges.localCheckpoint(eager=True)

    # partitions sized by the dominant per-step volume (edges, usually)
    with loop_tuned_session(spark, max(n, e.count())):
        state = v.withColumn("value", initial_value).localCheckpoint(eager=True)

        def step_fn(current: DataFrame, step: int):
            msgs = send_msg(current, e).groupBy("id").agg(agg_msg.alias("_agg"))
            new_state = (
                current.withColumnRenamed("value", "_old")
                .join(msgs, "id", "left")
                .select(
                    "id",
                    F.when(F.col("_agg").isNotNull(), apply_msg(F.col("_old"), F.col("_agg")))
                    .otherwise(F.col("_old"))
                    .alias("value"),
                    "_old",
                )
            )
            # vote-to-halt count observed inside the checkpoint job
            new_state, metrics = checkpoint_with_metrics(
                new_state,
                changed=F.coalesce(
                    F.sum((~F.col("value").eqNullSafe(F.col("_old"))).cast("long")), F.lit(0)
                ),
            )
            return new_state.select("id", "value"), {"changed": int(metrics["changed"])}

        return run_fixpoint(
            state,
            step_fn,
            should_continue=lambda m, step: m["changed"] > 0,
            max_steps=max_steps,
            checkpoint_every=10**9,
        )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_steps: int = 100,
) -> IterationResult:
    """Label propagation: every vertex converges to the minimum vertex id
    in its (undirected) component.  state = (id, value=component)."""
    fwd = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    und = fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).dropDuplicates(
        ["src", "dst"]
    )

    def send(state: DataFrame, e: DataFrame) -> DataFrame:
        return state.join(e, state.id == e.src, "inner").select(
            F.col("dst").alias("id"), F.col("value").alias("msg")
        )

    return pregel(
        vertices,
        und,
        initial_value=F.col("id"),
        send_msg=send,
        agg_msg=F.min("msg"),
        apply_msg=lambda old, agg: F.least(old, agg),
        max_steps=max_steps,
        id_col=id_col,
    )
