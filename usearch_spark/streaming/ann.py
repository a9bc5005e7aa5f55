"""Streaming ANN-index maintenance: an IVF index kept alive under the
idempotent snapshot pointer.

A live ingest pipeline cannot rebuild its vector index per batch; the
standard maintenance contract (FAISS IVF conventions) is: train the
coarse quantizer once, ASSIGN each new batch to the existing centroids
(one broadcast join — no retraining cost on the hot path), append the
assignments to the inverted lists, and RETRAIN/compact periodically when
drift accumulates.  This module wires that contract into Structured
Streaming `foreachBatch` with the same crash-safety machinery as the
sketch streams (streaming/sketches.py):

  * every epoch appends ONE fragment directory (``epochs/v<version>/``
    — keyed by the monotonic, lineage-independent version counter, so a
    replayed un-committed epoch rewrites its own fragment identically
    and an adopted lineage restarting epoch ids can never overwrite a
    fragment an adopted manifest still lists);
  * the committed state is a VERSIONED manifest
    (``v<n>/_meta.json``: centroids + fragment list + epochs since the
    last retrain) published by the atomic ``_CURRENT`` pointer swap;
  * the commit is idempotent and LINEAGE-AWARE (`_guard_epoch`): a
    replayed epoch of the same checkpoint no-ops, a different checkpoint
    against the same target raises (or adopts with
    ``on_mismatch="adopt"``) instead of silently dropping batches;
  * every ``retrain_every`` merged epochs the maintainer retrains the
    quantizer on ALL accumulated vectors and writes one compacted
    fragment — after which the state equals the one-shot
    ``build_ivf_index`` over the same vectors (same deterministic
    k-means, same assignment), the merge-equals-batch contract the
    sketch streams hash-check.

Scale shape: the assign path touches only the batch (broadcast k-row
centroid table, map-side argmin) and writes only the batch's fragment;
reads union the fragment list (no rewrite-the-corpus-per-batch).  The
retrain pass is the only corpus-sized job, amortized by
``retrain_every`` — exactly the compaction cadence a log-structured
index runs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from usearch_spark.streaming.sketches import (
    _commit_current,
    _guard_epoch,
    _lineage_id,
    _read_current,
)


def _assign(batch: DataFrame, cent: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, embedding, cluster) for one batch against a centroid frame —
    the same prep + argmin chain build_ivf_index uses."""
    from usearch_spark.operators.clustering import kmeans_assign

    vecs = batch.select(
        F.col(id_col),
        F.col(vec_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("varr"),
    )
    return (
        kmeans_assign(vecs.select(F.col(id_col).alias("vec_id"), "varr"), cent)
        .select(F.col("vec_id").alias(id_col), F.col("cid").alias("cluster"))
        .join(vecs.select(id_col, vec_col), id_col)
        .select(id_col, vec_col, "cluster")
    )


def _train(emb: DataFrame, n_clusters: int, max_iter: int, id_col: str, vec_col: str):
    """(centroid DataFrame, positional centroid list) — deterministic
    k-means with the dense-cid check build_ivf_index enforces."""
    from usearch_spark.operators.clustering import kmeans_centroids

    cent = kmeans_centroids(emb, k=n_clusters, iters=max_iter, id_col=id_col, vec_col=vec_col)
    crows = sorted(cent.collect(), key=lambda r: r["cid"])
    if [r["cid"] for r in crows] != list(range(n_clusters)):
        raise ValueError(
            f"IVF stream quantizer lost a cluster: cids={[r['cid'] for r in crows]}"
            " (is the training batch smaller than n_clusters?)"
        )
    return cent, [[float(x) for x in r["carr"]] for r in crows]


def _read_meta(target_path: str, version: int) -> dict:
    with open(os.path.join(target_path, f"v{version}", "_meta.json")) as fh:
        return json.load(fh)


def _write_meta(target_path: str, version: int, meta: dict) -> None:
    vdir = os.path.join(target_path, f"v{version}")
    os.makedirs(vdir, exist_ok=True)
    tmp = os.path.join(vdir, "_meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(vdir, "_meta.json"))


def ivf_stream_maintain(
    stream_emb: DataFrame,
    target_path: str,
    checkpoint_path: str,
    n_clusters: int = 8,
    max_iter: int = 2,
    retrain_every: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_mismatch: str = "error",
) -> StreamingQuery:
    """Start the IVF maintenance stream over a streaming DataFrame of
    (id_col, vec_col).  Epoch 0 trains the quantizer on its batch
    (choose the source so the first batch holds >= n_clusters vectors);
    later epochs assign-and-append; every ``retrain_every`` merged
    epochs (None = never) the quantizer retrains on all accumulated
    vectors and the fragments compact to one.  Crash/replay semantics:
    see the module docstring — identical pointer/lineage machinery as
    cms_stream_merge."""

    ptr = os.path.join(target_path, "_CURRENT")
    lineage = _lineage_id(checkpoint_path)

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        adm = _guard_epoch(ptr, lineage, epoch_id, target_path, on_mismatch)
        if adm is None:
            return  # replayed epoch: already merged and committed
        committed, version = adm
        # Fragments are keyed by the monotonic VERSION counter, not the
        # epoch id: versions are unique across checkpoint lineages, so an
        # adopted lineage restarting its epoch ids at 0 can never
        # overwrite a fragment the adopted manifest still lists.  The
        # crash window stays idempotent: a replayed un-committed epoch
        # gets the same version (pointer unchanged) and rewrites its own
        # fragment byte-identically.
        frag_name = f"v{version}"
        frag = os.path.join(target_path, "epochs", frag_name)
        if committed < 0:
            cent, centers = _train(batch_df, n_clusters, max_iter, id_col, vec_col)
            _assign(batch_df, cent, id_col, vec_col).repartition(
                F.col("cluster")
            ).write.partitionBy("cluster").mode("overwrite").parquet(frag)
            meta = {
                "centroids": centers,
                "fragments": [frag_name],
                "epochs_since_retrain": 0,
            }
        else:
            meta = _read_meta(target_path, committed)
            since = meta["epochs_since_retrain"] + 1
            if retrain_every is not None and since >= retrain_every:
                # compaction pass: retrain on everything, reassign, one fragment
                from functools import reduce

                old = reduce(
                    lambda a, b: a.unionByName(b),
                    [
                        spark.read.parquet(os.path.join(target_path, "epochs", f))
                        for f in meta["fragments"]
                    ],
                )
                allv = (
                    old.select(id_col, vec_col)
                    .unionByName(batch_df.select(id_col, vec_col))
                    .localCheckpoint(eager=True)  # don't re-read dirs we replace
                )
                cent, centers = _train(allv, n_clusters, max_iter, id_col, vec_col)
                frag = os.path.join(target_path, "epochs", f"retrain{version}")
                _assign(allv, cent, id_col, vec_col).repartition(
                    F.col("cluster")
                ).write.partitionBy("cluster").mode("overwrite").parquet(frag)
                meta = {
                    "centroids": centers,
                    "fragments": [f"retrain{version}"],
                    "epochs_since_retrain": 0,
                }
            else:
                cent = spark.createDataFrame(
                    list(enumerate(meta["centroids"])), "cid int, carr array<double>"
                )
                _assign(batch_df, F.broadcast(cent), id_col, vec_col).repartition(
                    F.col("cluster")
                ).write.partitionBy("cluster").mode("overwrite").parquet(frag)
                meta = {
                    "centroids": meta["centroids"],
                    "fragments": meta["fragments"] + [frag_name],
                    "epochs_since_retrain": since,
                }
        _write_meta(target_path, version, meta)
        _commit_current(ptr, version, lineage, int(epoch_id))

    return (
        stream_emb.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def read_ivf_stream(spark, target_path: str) -> tuple[list[list[float]], DataFrame]:
    """(centroids, postings) of the committed version — postings is the
    union of the manifest's fragment directories."""
    from functools import reduce

    version, _, _ = _read_current(os.path.join(target_path, "_CURRENT"))
    meta = _read_meta(target_path, version)
    # one read per fragment root (each carries its own cluster= partition
    # discovery; a multi-root read would see conflicting structures)
    parts = [
        spark.read.parquet(os.path.join(target_path, "epochs", f))
        for f in meta["fragments"]
    ]
    return meta["centroids"], reduce(lambda a, b: a.unionByName(b), parts)


def ivf_stream_topk(
    spark,
    target_path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list | None = None,
) -> DataFrame:
    """Probe the stream-maintained index: nearest ``n_probe`` centroids by
    the quantizer metric (driver-side over the tiny centroid list), then
    exact cosine top-k over only those clusters' posting rows — the
    ivf_index_topk contract against the fragment layout."""
    import numpy as np

    from usearch_spark.operators.similarity import cosine

    centers, postings = read_ivf_stream(spark, target_path)
    q = np.asarray(query_vec, dtype="float64")
    order = np.argsort(((np.array(centers) - q) ** 2).sum(axis=1))
    probe = [int(c) for c in order[:n_probe]]
    df = postings.filter(F.col("cluster").isin(probe))
    if exclude_ids:
        df = df.filter(~F.col(id_col).isin(exclude_ids))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(F.col(id_col), cosine(F.col(vec_col), qcol).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
