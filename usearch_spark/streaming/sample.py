"""Streaming weighted reservoir sampling: a bounded sample maintained
continuously under the idempotent snapshot pointer.

The batch operator (operators/corpus.weighted_sample — Efraimidis &
Spirakis 2006 exponential clocks) is MERGEABLE by construction: the
k smallest draws of a union are the k smallest of each part's k
smallest, so a live ingest pipeline keeps a weight-proportional sample
of everything it has ever seen by folding each micro-batch's local
top-k into the committed reservoir — O(k) state, no reprocessing, the
streaming form of "hold out a weighted eval sample while ingesting".

Crash safety is the shared pointer machinery (streaming/sketches.py):
versioned reservoir snapshots under ``_CURRENT`` with the
lineage-aware epoch guard — replays no-op, foreign checkpoints raise.
Draws are deterministic (md5-uniform + the floor-fixed-point transform),
so even a replayed merge would be value-identical; the guard spares the
rewrite.  The drained reservoir equals the one-shot batch sample over
all rows ever delivered — the merge-equals-batch contract the sketch
streams hash-check.
"""

from __future__ import annotations

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


def weighted_sample_stream(
    stream_df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    target_path: str,
    checkpoint_path: str,
    on_mismatch: str = "error",
) -> StreamingQuery:
    """Maintain the k-row weighted reservoir over a streaming DataFrame:
    each micro-batch computes its LOCAL weighted top-k
    (operators/corpus.weighted_sample — one map-side expression +
    TakeOrdered(k), no shuffle of the batch) and the committed reservoir
    folds in as min-k of the union.  Rows with weight <= 0 are excluded,
    matching the batch operator."""
    from usearch_spark.operators.corpus import weighted_sample

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
        local = weighted_sample(batch_df, key_col, weight_col, k)
        if committed >= 0:
            prev = spark.read.parquet(os.path.join(target_path, f"v{committed}"))
            local = prev.unionByName(local)
        merged = local.orderBy(F.col("draw").asc(), F.col(key_col).asc()).limit(k)
        merged.write.mode("overwrite").parquet(os.path.join(target_path, f"v{version}"))
        _commit_current(ptr, version, lineage, int(epoch_id))

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def read_reservoir(spark, target_path: str) -> DataFrame:
    """The committed reservoir (follow the ``_CURRENT`` pointer)."""
    version, _, _ = _read_current(os.path.join(target_path, "_CURRENT"))
    return spark.read.parquet(os.path.join(target_path, f"v{version}"))
