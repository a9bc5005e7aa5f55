"""Streaming sketch maintenance: continuous count-min merge.

Sketches earn their keep in streams: a per-micro-batch partial sketch is
tiny (<= depth x width cells) and MERGES into a running sketch by cell
addition — the mergeability that makes sub-linear summaries work in a
map-reduce/streaming setting (operators/sketch.py builds the batch
forms; this module keeps one alive under foreachBatch).

The merged sketch after draining N batches equals the one-shot sketch
over all N batches' rows (cell-wise sums commute), so the gated query
shares the batch query's oracle verbatim — the merge loop is
hash-checked, not just row-counted.  Exactly-once is the streaming
checkpoint (a restarted query skips committed source files) PLUS an
idempotent epoch commit: the ``_CURRENT`` pointer records the last
merged epoch, and a replayed epoch (crash after the pointer swap but
before the checkpoint commit — foreachBatch alone is only
at-least-once) is detected by ``committed_version >= epoch_id`` and
skipped, so the batch is never double-counted and the replay never
reads the very version directory it is about to overwrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def cms_stream_merge(
    stream_df: DataFrame,
    key_col: str,
    target_path: str,
    checkpoint_path: str,
    depth: int = 4,
    prefix_len: int = 2,
) -> StreamingQuery:
    """Start the continuous count-min maintenance stream: each micro-batch
    builds its partial sketch (operators/sketch.count_min_sketch) and
    merges into the parquet sketch under ``target_path`` by
    (seed, bucket) cell addition.

    Crash safety uses the snapshot-pointer pattern
    (sources/graph_store.VersionedGraphStore): each epoch writes a NEW
    version directory (``v<epoch>``), then atomically re-points the
    ``_CURRENT`` file at it (os.replace).  A crash mid-write leaves the
    previous version intact and the un-committed batch replays — the
    merge never reads a half-written sketch and never loses prior
    batches.  The commit is IDEMPOTENT under replay: foreachBatch is
    at-least-once (a crash after the pointer swap but before the
    checkpoint commit re-delivers the same epoch_id), so the merge
    first parses ``_CURRENT`` and no-ops when the committed version is
    already >= this epoch — without the guard a replay would (a) merge
    the batch into a sketch that already contains it, double-counting
    every cell, and (b) lazily read ``v<epoch>`` while overwriting that
    same path, which Spark rejects.  Epoch ids are monotonic per
    checkpoint, so ">= epoch_id" is exactly "already merged".  The
    sketch is bounded (<= depth x 16^prefix_len rows), so rewriting a
    full version per batch is trivially small regardless of stream
    volume."""
    from usearch_spark.operators.sketch import count_min_sketch

    ptr = os.path.join(target_path, "_CURRENT")

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        committed = -1
        if os.path.exists(ptr):
            with open(ptr) as fh:
                committed = int(fh.read().strip().lstrip("v"))
            if committed >= int(epoch_id):
                return  # replayed epoch: already merged and committed
        sk = count_min_sketch(batch_df, key_col, depth=depth, prefix_len=prefix_len)
        if committed >= 0:
            cur = spark.read.parquet(os.path.join(target_path, f"v{committed}"))
            sk = (
                cur.unionByName(sk)
                .groupBy("seed", "bucket")
                .agg(F.sum("cnt").alias("cnt"))
            )
        version = f"v{epoch_id}"
        sk.write.mode("overwrite").parquet(os.path.join(target_path, version))
        tmp = ptr + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(version)
        os.replace(tmp, ptr)  # atomic pointer swap commits the epoch

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def read_cms(spark, target_path: str) -> DataFrame:
    """The current committed sketch (follow the ``_CURRENT`` pointer)."""
    with open(os.path.join(target_path, "_CURRENT")) as fh:
        return spark.read.parquet(os.path.join(target_path, fh.read().strip()))


def log_hist_stream_merge(
    stream_df: DataFrame,
    value_col: str,
    group_cols: list[str],
    target_path: str,
    checkpoint_path: str,
    cents: int = 100,
) -> StreamingQuery:
    """Continuous quantile-sketch maintenance: each micro-batch builds its
    partial log-histogram (operators/sketch.log_hist_sketch) and merges
    into the running parquet sketch by BIN ADDITION — the same
    mergeability/commutativity contract as :func:`cms_stream_merge`, so
    the drained stream sketch equals the one-shot batch sketch
    cell-for-cell and shares its oracle.

    Crash safety is the identical snapshot-pointer pattern with the
    idempotent epoch guard: versions advance monotonically under
    ``_CURRENT``, and a replayed epoch (foreachBatch is at-least-once)
    no-ops when the committed version is already >= its epoch_id —
    never double-counting a bin, never reading the directory it is
    overwriting."""
    from usearch_spark.operators.sketch import log_hist_sketch

    ptr = os.path.join(target_path, "_CURRENT")

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        committed = -1
        if os.path.exists(ptr):
            with open(ptr) as fh:
                committed = int(fh.read().strip().lstrip("v"))
            if committed >= int(epoch_id):
                return  # replayed epoch: already merged and committed
        sk = log_hist_sketch(batch_df, value_col, group_cols, cents=cents)
        if committed >= 0:
            cur = spark.read.parquet(os.path.join(target_path, f"v{committed}"))
            sk = (
                cur.unionByName(sk)
                .groupBy(*group_cols, "blen", "sub3")
                .agg(F.sum("cnt").alias("cnt"))
            )
        version = f"v{epoch_id}"
        sk.write.mode("overwrite").parquet(os.path.join(target_path, version))
        tmp = ptr + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(version)
        os.replace(tmp, ptr)  # atomic pointer swap commits the epoch

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
