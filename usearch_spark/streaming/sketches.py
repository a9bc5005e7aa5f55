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
idempotent epoch commit: the ``_CURRENT`` pointer records the merged
version, the CHECKPOINT LINEAGE it belongs to, and the last merged
epoch.  A replayed epoch (crash after the pointer swap but before the
checkpoint commit — foreachBatch alone is only at-least-once) carries
the SAME lineage and an epoch id <= the committed one, so it is
skipped: the batch is never double-counted and the replay never reads
the very version directory it is about to overwrite.  Epoch ids are
only monotonic WITHIN one checkpoint lineage — a different checkpoint
(fresh lineage) restarts them at 0, so an epoch-only guard would
silently discard every new batch: the lineage check turns that data
loss into an explicit error (``on_mismatch="error"``) or an explicit
adoption (``on_mismatch="adopt"``: keep the committed sketch, reset
the epoch counter, keep version numbers monotonic).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _lineage_id(checkpoint_path: str) -> str:
    """Stable id for one checkpoint lineage: epoch ids are comparable only
    between runs that share a checkpoint directory, so the lineage IS the
    (absolute) checkpoint path, hashed to keep the pointer file tidy."""
    return hashlib.sha256(os.path.abspath(checkpoint_path).encode()).hexdigest()[:16]


def _read_current(ptr: str) -> tuple[int, str | None, int]:
    """Parse ``_CURRENT`` -> (version, lineage, last_epoch).

    Returns (-1, None, -1) when no commit exists.  The legacy single-line
    format ("v<epoch>") predates the lineage field; it is read as
    lineage-unknown with version == last_epoch (its version naming WAS
    the epoch id)."""
    if not os.path.exists(ptr):
        return -1, None, -1
    with open(ptr) as fh:
        lines = [ln.strip() for ln in fh.read().splitlines() if ln.strip()]
    version = int(lines[0].lstrip("v"))
    if len(lines) < 3:
        return version, None, version
    return version, lines[1], int(lines[2])


def _commit_current(ptr: str, version: int, lineage: str, last_epoch: int) -> None:
    """Atomically re-point ``_CURRENT`` (write temp + os.replace)."""
    tmp = ptr + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(f"v{version}\n{lineage}\n{last_epoch}\n")
    os.replace(tmp, ptr)


def _guard_epoch(
    ptr: str, lineage: str, epoch_id: int, target_path: str, on_mismatch: str
) -> tuple[int, int] | None:
    """Shared commit-pointer admission check for a delivered epoch.

    Returns None when the epoch must be SKIPPED (true replay: same
    lineage, epoch already merged), else (committed_version,
    next_version).  A DIFFERENT lineage against an existing target is
    never silently dropped: it raises (default) or adopts the committed
    state under the new lineage (versions stay monotonic because the
    version counter is independent of the epoch id)."""
    committed, cur_lin, last_epoch = _read_current(ptr)
    if committed >= 0 and cur_lin != lineage:
        # A lineage-UNKNOWN pointer (legacy single-line format) is a
        # mismatch too: epoch ids are only comparable within a known
        # lineage, so falling through to the epoch-only guard would
        # silently drop every epoch <= last_epoch of a brand-new
        # checkpoint — the exact data-loss mode this guard closes.
        # "adopt" upgrades the pointer to the lineage format on the
        # next successful commit.
        if on_mismatch != "adopt":
            whose = (
                f"belongs to checkpoint lineage {cur_lin}"
                if cur_lin is not None
                else "has a legacy lineage-unknown pointer"
            )
            raise ValueError(
                f"streaming lineage mismatch at {target_path}: committed state "
                f"{whose}, this query is "
                f"{lineage}.  Resume with the ORIGINAL checkpoint directory, "
                f"point the new query at a fresh target_path, or pass "
                f'on_mismatch="adopt" to continue merging on top of the '
                f"committed sketch."
            )
    elif committed >= 0 and int(epoch_id) <= last_epoch:
        return None  # replayed epoch: already merged and committed
    return committed, committed + 1


def cms_stream_merge(
    stream_df: DataFrame,
    key_col: str,
    target_path: str,
    checkpoint_path: str,
    depth: int = 4,
    prefix_len: int = 2,
    on_mismatch: str = "error",
) -> StreamingQuery:
    """Start the continuous count-min maintenance stream: each micro-batch
    builds its partial sketch (operators/sketch.count_min_sketch) and
    merges into the parquet sketch under ``target_path`` by
    (seed, bucket) cell addition.

    Crash safety uses the snapshot-pointer pattern
    (sources/graph_store.VersionedGraphStore): each epoch writes a NEW
    version directory (``v<n>``, n monotonic and independent of the
    epoch id), then atomically re-points the ``_CURRENT`` file at it
    (os.replace).  A crash mid-write leaves the previous version intact
    and the un-committed batch replays — the merge never reads a
    half-written sketch and never loses prior batches.  The commit is
    IDEMPOTENT under replay: foreachBatch is at-least-once (a crash
    after the pointer swap but before the checkpoint commit re-delivers
    the same epoch_id), so the merge first parses ``_CURRENT`` and
    no-ops when this epoch of THIS CHECKPOINT LINEAGE is already merged
    — without the guard a replay would (a) merge the batch into a
    sketch that already contains it, double-counting every cell, and
    (b) lazily read the version it is about to overwrite, which Spark
    rejects.  Epoch ids are monotonic only WITHIN a lineage; a
    different checkpoint against the same target raises (or adopts the
    committed sketch with ``on_mismatch="adopt"``) instead of silently
    dropping its batches — see :func:`_guard_epoch`.  The sketch is
    bounded (<= depth x 16^prefix_len rows), so rewriting a full
    version per batch is trivially small regardless of stream volume."""
    from usearch_spark.operators.sketch import count_min_sketch

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
        sk = count_min_sketch(batch_df, key_col, depth=depth, prefix_len=prefix_len)
        if committed >= 0:
            cur = spark.read.parquet(os.path.join(target_path, f"v{committed}"))
            sk = (
                cur.unionByName(sk)
                .groupBy("seed", "bucket")
                .agg(F.sum("cnt").alias("cnt"))
            )
        sk.write.mode("overwrite").parquet(os.path.join(target_path, f"v{version}"))
        _commit_current(ptr, version, lineage, int(epoch_id))

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def read_cms(spark, target_path: str) -> DataFrame:
    """The current committed sketch (follow the ``_CURRENT`` pointer)."""
    version, _, _ = _read_current(os.path.join(target_path, "_CURRENT"))
    return spark.read.parquet(os.path.join(target_path, f"v{version}"))


def log_hist_stream_merge(
    stream_df: DataFrame,
    value_col: str,
    group_cols: list[str],
    target_path: str,
    checkpoint_path: str,
    cents: int = 100,
    on_mismatch: str = "error",
) -> StreamingQuery:
    """Continuous quantile-sketch maintenance: each micro-batch builds its
    partial log-histogram (operators/sketch.log_hist_sketch) and merges
    into the running parquet sketch by BIN ADDITION — the same
    mergeability/commutativity contract as :func:`cms_stream_merge`, so
    the drained stream sketch equals the one-shot batch sketch
    cell-for-cell and shares its oracle.

    Crash safety is the identical snapshot-pointer pattern with the
    idempotent LINEAGE-AWARE epoch guard (:func:`_guard_epoch`): a
    replayed epoch of the same checkpoint no-ops — never
    double-counting a bin, never reading the directory it is
    overwriting — while a different checkpoint against the same target
    raises (or adopts with ``on_mismatch="adopt"``) instead of silently
    dropping batches."""
    from usearch_spark.operators.sketch import log_hist_sketch

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
        sk = log_hist_sketch(batch_df, value_col, group_cols, cents=cents)
        if committed >= 0:
            cur = spark.read.parquet(os.path.join(target_path, f"v{committed}"))
            sk = (
                cur.unionByName(sk)
                .groupBy(*group_cols, "blen", "sub3")
                .agg(F.sum("cnt").alias("cnt"))
            )
        sk.write.mode("overwrite").parquet(os.path.join(target_path, f"v{version}"))
        _commit_current(ptr, version, lineage, int(epoch_id))

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def mg_stream_merge(
    stream_df: DataFrame,
    key_col: str,
    k: int,
    target_path: str,
    checkpoint_path: str,
    on_mismatch: str = "error",
) -> StreamingQuery:
    """Continuous Misra-Gries heavy-hitter maintenance: each micro-batch
    builds its MG summary (operators/sketch.mg_summary — one count
    shuffle + a k+1-row TakeOrdered) and folds into the committed
    summary via mg_merge, under the same lineage-aware snapshot pointer
    as the CMS/quantile streams.  State is <= k rows forever; the folded
    summary carries the combined-stream guarantee
    est >= count - N_total/(k+1), so the corpus-wide frequent items
    survive any batch arrival order the merge is applied in."""
    from usearch_spark.operators.sketch import mg_merge, mg_summary

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
        sk = mg_summary(batch_df, key_col, k)
        if committed >= 0:
            cur = spark.read.parquet(os.path.join(target_path, f"v{committed}"))
            sk = mg_merge(cur, sk, k)
        sk.write.mode("overwrite").parquet(os.path.join(target_path, f"v{version}"))
        _commit_current(ptr, version, lineage, int(epoch_id))

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def hll_stream_merge(
    stream_df: DataFrame,
    key_col: str,
    group_cols: list[str],
    target_path: str,
    checkpoint_path: str,
    on_mismatch: str = "error",
) -> StreamingQuery:
    """Continuous HyperLogLog maintenance: each micro-batch builds its
    register sketch (operators/sketch.hll_sketch) and merges into the
    running parquet sketch by MAX PER REGISTER — the HLL union, which
    commutes with the one-shot build exactly like the CMS/quantile/MG
    folds, so the drained sketch shares a batch oracle.  Same
    lineage-aware snapshot-pointer commit as :func:`cms_stream_merge`;
    state is <= 16 register rows per group forever."""
    from usearch_spark.operators.sketch import hll_merge, hll_sketch

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
        sk = hll_sketch(batch_df, key_col, group_cols)
        if committed >= 0:
            cur = spark.read.parquet(os.path.join(target_path, f"v{committed}"))
            sk = hll_merge(cur.unionByName(sk), group_cols)
        sk.write.mode("overwrite").parquet(os.path.join(target_path, f"v{version}"))
        _commit_current(ptr, version, lineage, int(epoch_id))

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def bloom_stream_merge(
    stream_df: DataFrame,
    key_col: str,
    target_path: str,
    checkpoint_path: str,
    hashes: int = 3,
    prefix_len: int = 3,
    on_mismatch: str = "error",
) -> StreamingQuery:
    """Continuous Bloom-filter maintenance: each micro-batch's set bits
    (operators/sketch.bloom_build) UNION into the committed bit set —
    the Bloom merge, bounded by the bit space (hashes · 16^prefix_len
    rows) forever and commuting with the one-shot build, so the drained
    filter shares a batch oracle.  Same lineage-aware snapshot-pointer
    commit as :func:`cms_stream_merge`.  This is the ingest-time form of
    join pruning: the filter stays queryable (broadcastable) while the
    member stream keeps flowing."""
    from usearch_spark.operators.sketch import bloom_build

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
        bits = bloom_build(batch_df, key_col, hashes=hashes, prefix_len=prefix_len)
        if committed >= 0:
            cur = spark.read.parquet(os.path.join(target_path, f"v{committed}"))
            bits = cur.unionByName(bits).dropDuplicates(["bit"])
        bits.write.mode("overwrite").parquet(os.path.join(target_path, f"v{version}"))
        _commit_current(ptr, version, lineage, int(epoch_id))

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def kmv_stream_merge(
    stream_df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int,
    target_path: str,
    checkpoint_path: str,
    on_mismatch: str = "error",
) -> StreamingQuery:
    """Continuous KMV (bottom-k) distinct-sketch maintenance: each
    micro-batch computes its per-group k smallest distinct hashes
    (operators/sketch.kmv_sketch — O(k·groups) rows) and folds into the
    committed sketch as min-k of the union (kmv_merge).  The k smallest
    of a union are among the parts' k smallest, so the drained stream
    sketch equals the one-shot batch sketch row-for-row and shares its
    oracle — the same merge-equals-batch contract as every stream in
    this family.  Crash safety: the shared lineage-aware idempotent
    snapshot pointer (:func:`_guard_epoch`)."""
    from usearch_spark.operators.sketch import kmv_merge, kmv_sketch

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
        sk = kmv_sketch(batch_df, key_col, group_cols, k=k)
        if committed >= 0:
            cur = spark.read.parquet(os.path.join(target_path, f"v{committed}"))
            sk = kmv_merge(cur.unionByName(sk), group_cols, k=k)
        sk.write.mode("overwrite").parquet(os.path.join(target_path, f"v{version}"))
        _commit_current(ptr, version, lineage, int(epoch_id))

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def rollup_stream_merge(
    stream_df: DataFrame,
    group_cols: list[str],
    target_path: str,
    checkpoint_path: str,
    on_mismatch: str = "error",
) -> StreamingQuery:
    """Continuous ADDITIVE ROLLUP maintenance: each micro-batch counts
    its rows per ``group_cols`` cell and merges into the committed
    rollup by cell addition — the streaming materialized-view form of a
    groupBy-count (events_rollup_incremental's batch contract made
    continuous).  The drained rollup equals the one-shot groupBy over
    all delivered rows (integer addition commutes), so any consumer of
    the batch rollup — a quantile read, a Holt forecast fold — runs on
    the streamed state unchanged and shares the batch oracle.  State is
    bounded by the cell count (|groups|), not the stream volume.  Crash
    safety: the shared lineage-aware idempotent snapshot pointer
    (:func:`_guard_epoch`)."""
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
        sk = batch_df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
        if committed >= 0:
            cur = spark.read.parquet(os.path.join(target_path, f"v{committed}"))
            sk = (
                cur.unionByName(sk)
                .groupBy(*group_cols)
                .agg(F.sum("n").alias("n"))
            )
        sk.write.mode("overwrite").parquet(os.path.join(target_path, f"v{version}"))
        _commit_current(ptr, version, lineage, int(epoch_id))

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
