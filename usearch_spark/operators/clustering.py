"""Embedding clustering for corpus curation: fixed-iteration Lloyd k-means.

The training-data use is topic discovery / SemDeDup-style cluster sharding
of an embedding table.  The fixed-iteration form (deterministic init from
the first k vec_ids, a constant number of Lloyd steps, 6dp-quantized
centroids) exists so the whole algorithm sits under the DuckDB hash gate as
unrolled SQL — the same trick the PageRank family uses for its recurrence.

Scale shape per iteration: the assignment is a BROADCAST join against k
centroid rows (constant-size build side) followed by an arg-min over k
rows per vector (map-side, no shuffle beyond the k-fanout), and the update
is one posexplode + partial-agg shuffle keyed by (cluster, dim).  Nothing
grows with corpus size except the scan.

The IVF ANN index (operators/similarity.py) trains its quantizer with a
numpy k-means over a SAMPLE; this one is the full-corpus distributed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2(a, b):
    """Squared L2 between two array columns, summed in array order (a
    deterministic fold, so both engines reproduce the identical double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def kmeans_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2; ties break
    to the lowest cluster id).  ``centroids``: (cid int, carr array<double>)
    — broadcast.  Returns (vec_id, cid, dist)."""
    # constant join key -> BroadcastHashJoin with a k-row build side (a
    # conditionless cross join would plan BroadcastNestedLoop)
    j = (
        emb.withColumn("_one", F.lit(1))
        .join(F.broadcast(centroids.withColumn("_one", F.lit(1))), "_one")
        .drop("_one")
    )
    scored = j.select(
        "vec_id",
        "cid",
        _dist2(F.col("varr"), F.col("carr")).alias("dist"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min_by(F.struct("dist", "cid"), F.struct("dist", "cid")).alias("best"))
        .select("vec_id", F.col("best.cid").alias("cid"), F.col("best.dist").alias("dist"))
    )


def kmeans_fixed(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-iteration Lloyd k-means over an embedding table.

    Deterministic contract (what the SQL oracle replays):
      - init: centroids = the vectors with the k smallest ids;
      - each iteration: nearest-centroid assignment (squared L2, ties to
        the lower cid), then per-dimension mean ROUNDED to 6dp (the
        quantization makes the centroid bit-identical regardless of
        aggregation order);
      - clusters that lose all members simply vanish (no re-seeding).

    Returns the final assignment (vec_id, cid, dist).
    """
    vecs = _as_vecs(emb, id_col, vec_col)
    return kmeans_assign(vecs, kmeans_centroids(emb, k, iters, id_col, vec_col))


def _as_vecs(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("varr"),
    )


def kmeans_centroids(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The FINAL centroid frame (cid int, carr array<double>) of the
    :func:`kmeans_fixed` chain — same deterministic contract (smallest-k
    init, round-6 means, ties to lower cid).  Exposed separately so a
    persisted coarse quantizer (the IVF index) can reuse the exact
    oracle-replayable training instead of an engine-private trainer.

    Cluster ids are DENSIFIED at init — cid = rank of the seed among the
    k smallest vec_ids (row_number − 1), NOT the vec_id itself — so any
    id domain works (ids starting at 1, string ids, sparse ids); on a
    0-based contiguous id column the two definitions coincide, which is
    what the SQL oracles replay.  The k-row window is a single-partition
    sort of k rows, not a corpus-wide window."""
    from pyspark.sql import Window

    vecs = _as_vecs(emb, id_col, vec_col)
    centroids = (
        vecs.orderBy("vec_id")
        .limit(k)
        .withColumn(
            "cid",
            (F.row_number().over(Window.orderBy("vec_id")) - 1).cast("int"),
        )
        .select("cid", F.col("varr").alias("carr"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters - 1):
        assigned = kmeans_assign(vecs, centroids)
        centroids = (
            assigned.join(vecs, "vec_id")
            .select("cid", F.posexplode("varr").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(F.round(F.avg("x"), 6).alias("x"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "x"))), lambda s: s["x"]
                ).alias("carr")
            )
            .localCheckpoint(eager=True)  # tiny (k rows); truncates the per-iter lineage
        )
    return centroids


def kmeans_summary(assigned: DataFrame) -> DataFrame:
    """Per-cluster size + inertia summary of a kmeans_fixed assignment:
    (cid, n_vecs, avg_dist2) — the convergence/skew dashboard row."""
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("dist"), 4).alias("avg_dist2"),
    )
