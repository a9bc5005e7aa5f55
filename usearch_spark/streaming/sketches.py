"""Streaming sketch maintenance: continuous count-min merge.

Sketches earn their keep in streams: a per-micro-batch partial sketch is
tiny (<= depth x width cells) and MERGES into a running sketch by cell
addition — the mergeability that makes sub-linear summaries work in a
map-reduce/streaming setting (operators/sketch.py builds the batch
forms; this module keeps one alive under foreachBatch).

The merged sketch after draining N batches equals the one-shot sketch
over all N batches' rows (cell-wise sums commute), so the gated query
shares the batch query's oracle verbatim — the merge loop is
hash-checked, not just row-counted.  Exactly-once rides the streaming
checkpoint: a restarted query skips committed source files, so a
deliberate second run adds nothing (same discipline as
streaming/dedup.py).
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
    batches.  The sketch is bounded (<= depth x 16^prefix_len rows), so
    rewriting a full version per batch is trivially small regardless of
    stream volume."""
    from usearch_spark.operators.sketch import count_min_sketch

    ptr = os.path.join(target_path, "_CURRENT")

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        sk = count_min_sketch(batch_df, key_col, depth=depth, prefix_len=prefix_len)
        if os.path.exists(ptr):
            with open(ptr) as fh:
                cur = spark.read.parquet(os.path.join(target_path, fh.read().strip()))
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
