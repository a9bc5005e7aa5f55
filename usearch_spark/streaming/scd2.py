"""Streaming SCD2 (type-2 slowly-changing dimension) maintenance with
bucket-level copy-on-write — the CDC-ingest half of the warehouse
pattern whose batch build is ``q_scd2_history``.

Each micro-batch of change events (key, attr, effective-time, tiebreak)
merges into a MATERIALIZED dimension: the current open version of a
changed key closes at the new effective time and a new open row
appends.  The state is hash-bucketed by key, and an epoch rewrites ONLY
the buckets its batch touches — untouched buckets carry forward BY
REFERENCE in the versioned manifest, so merge cost is
O(touched-buckets), not O(dimension).  That is exactly the
copy-on-write MERGE shape of a lakehouse table format (Delta/Iceberg
carry the same bucket/file-level rewrite), emulated on plain parquet
because this image has no lake jars (see sources/graph_store.py's
DeltaGraphStore gate).

Out-of-order and multi-change batches are handled exactly: every
stored row keeps its raw effective-time and tiebreak, and a touched
bucket's rows are REBUILT from the full per-key change set (one
per-key window over the touched buckets only), so the merged dimension
always equals the one-shot batch build over every change delivered so
far — regardless of arrival order.  The gated query hash-checks that
equality against the batch oracle.

Crash safety: the shared lineage-aware idempotent snapshot pointer
(streaming/sketches._guard_epoch); fragments are version-keyed (the
adopted-lineage collision rule), and a crash-window replay recomputes
from the COMMITTED manifest and rewrites its own version dirs
byte-identically.
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

_STATE_COLS = ["key", "attr", "eff_us", "tb", "bucket"]


def _bucket(key, n_buckets: int):
    return F.pmod(
        F.conv(F.substring(F.md5(key.cast("string")), 1, 7), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def _rebuild(changes: DataFrame) -> DataFrame:
    """Materialize SCD2 rows from a (key, attr, eff_us, tb, bucket)
    change set: per-key lead() over (eff_us, tb) — the identical window
    the one-shot batch build runs, applied only to the touched keys."""
    from pyspark.sql import Window as W

    w = W.partitionBy("key").orderBy("eff_us", "tb")
    nxt = F.lead("eff_us").over(w)
    return changes.select(
        *_STATE_COLS,
        F.coalesce(nxt, F.lit(None).cast("long")).alias("next_us"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


def _read_meta(target_path: str, version: int) -> dict:
    with open(os.path.join(target_path, f"v{version}", "_meta.json")) as fh:
        return json.load(fh)


def scd2_stream_merge(
    stream_changes: DataFrame,
    key_col: str,
    attr_col: str,
    eff_us_col: str,
    tiebreak_col: str,
    target_path: str,
    checkpoint_path: str,
    n_buckets: int = 8,
    on_mismatch: str = "error",
) -> StreamingQuery:
    """Start the CDC merge stream over change events.  ``eff_us_col``
    must be the effective time as epoch MICROSECONDS (a long — the
    repo's TZ-safe timestamp idiom); ``tiebreak_col`` makes the per-key
    ordering total."""

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
        batch = batch_df.select(
            F.col(key_col).alias("key"),
            F.col(attr_col).alias("attr"),
            F.col(eff_us_col).cast("long").alias("eff_us"),
            F.col(tiebreak_col).alias("tb"),
        ).withColumn("bucket", _bucket(F.col("key"), n_buckets))
        touched = sorted(
            r["bucket"] for r in batch.select("bucket").distinct().collect()
        )
        manifest = _read_meta(target_path, committed) if committed >= 0 else {}
        changes = batch
        for b in touched:
            if str(b) not in manifest:
                continue
            # a bucket=N leaf dir read directly drops the partition
            # column — re-attach it as the literal we pruned by
            p = spark.read.parquet(os.path.join(target_path, manifest[str(b)]))
            changes = changes.unionByName(
                p.select("key", "attr", "eff_us", "tb").withColumn(
                    "bucket", F.lit(b)
                )
            )
        rebuilt = _rebuild(changes)
        frag = f"v{version}"
        rebuilt.repartition(F.col("bucket")).write.partitionBy("bucket").mode(
            "overwrite"
        ).parquet(os.path.join(target_path, frag))
        new_manifest = dict(manifest)
        for b in touched:
            new_manifest[str(b)] = f"{frag}/bucket={b}"
        vdir = os.path.join(target_path, frag)
        tmp = os.path.join(vdir, "_meta.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(new_manifest, fh)
        os.replace(tmp, os.path.join(vdir, "_meta.json"))
        _commit_current(ptr, version, lineage, int(epoch_id))

    return (
        stream_changes.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def read_scd2(spark, target_path: str) -> DataFrame:
    """The committed dimension: one partition-pruned read per bucket in
    the manifest (bounded by n_buckets), plain scan — readers never pay
    the window."""
    from functools import reduce

    version, _, _ = _read_current(os.path.join(target_path, "_CURRENT"))
    manifest = _read_meta(target_path, version)
    parts = [
        spark.read.parquet(os.path.join(target_path, rel))
        for rel in manifest.values()
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)
