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


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    min_sad: float = 0.001,
    max_steps: int = 100,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> IterationResult:
    """Returns IterationResult whose state is (id, score).

    ``vertices``: one row per vertex id.  ``edges``: (src, dst) rows; edges
    whose src equals dst are dropped; duplicate edges count once (the
    reference stores at most one edge per (src,dst) pair).
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

    e0 = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    # loop partitions sized by the DOMINANT per-step volume: the ranks⋈edges
    # join moves |E| rows, usually >> |V| (a vertex-count sizing left a 500k-
    # edge graph on 2 partitions — 2 tasks on a 32-core box)
    with loop_tuned_session(spark, max(n, e0.count())) as n_part:
        return _pagerank_loop(spark, v, n, e0, damping, min_sad, max_steps, n_part)


def _pagerank_loop(spark, v, n, e0, damping, min_sad, max_steps, n_part) -> IterationResult:
    e = e0.repartition(n_part, "src").cache()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).withColumnRenamed("src", "id").cache()

    res_metric = (
        F.coalesce(F.sum(F.when(F.col("outdeg").isNull(), F.col("score"))), F.lit(0.0)) / n
    )

    # step 1: uniform 1/N (reference compute.go:44-48); carry out-degree on
    # the state so per-step dead-end mass needs no extra join.  The dead-end
    # residual of THIS state — read by the NEXT step, the reference's
    # double-buffered residual_0/1 accumulator — is observed during the same
    # materialization and carried forward as a driver-side scalar, so a step
    # needs no residual subquery/broadcast of its own.
    ranks, init_metrics = checkpoint_with_metrics(
        v.withColumn("score", F.lit(1.0 / n)).join(out_deg, "id", "left").repartition(n_part, "id"),
        res=res_metric,
    )
    residual = {"prev": float(init_metrics["res"])}

    d = damping
    track_sad = min_sad > 0.0

    def step_fn(current: DataFrame, step: int):
        # messages: score/outdeg to each out-neighbor
        contribs = (
            current.filter(F.col("outdeg").isNotNull())
            .join(e, F.col("id") == e.src, "inner")
            .select(F.col("dst").alias("id"), (F.col("score") / F.col("outdeg")).alias("msg"))
            .groupBy("id")
            .agg(F.sum("msg").alias("msg_sum"))
        )
        new_ranks = (
            current.withColumnRenamed("score", "old_score")
            .join(contribs, "id", "left")
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
        # residual both ride the checkpoint job as observed metrics
        new_ranks, metrics = checkpoint_with_metrics(
            new_ranks,
            sad=F.coalesce(F.sum(F.abs(F.col("score") - F.col("old_score"))), F.lit(0.0)),
            res=res_metric,
        )
        residual["prev"] = float(metrics["res"])
        sad = float(metrics["sad"]) if track_sad else float("inf")
        return new_ranks.select("id", "score", "outdeg"), {"sad": sad}

    result = run_fixpoint(
        ranks,
        step_fn,
        should_continue=lambda m, step: m["sad"] >= min_sad,
        max_steps=max_steps,
        checkpoint_every=10**9,  # step_fn checkpoints internally
    )
    e.unpersist()
    out_deg.unpersist()
    result.state = result.state.select("id", "score")
    return result
