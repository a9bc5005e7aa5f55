"""Streaming dedup-against-corpus: the ingest-time form of MinHash/LSH
near-duplicate detection.

The batch form (operators/dedup.minhash_probe_pairs over the persisted
index) answers "is this new batch a dup of the corpus?" one batch at a
time; a live ingest pipeline runs the same probe CONTINUOUSLY.  This
module wires it as Structured Streaming `foreachBatch`:

  * each micro-batch hashes ONLY its own documents (minhash_index on the
    batch — per-doc signatures are independent, so no corpus re-hash);
  * the micro-batch probes the STATIC persisted index (bucket joins +
    exact verify, corpus-side bucket caps);
  * verdicts land in an EPOCH-KEYED parquet partition
    (``sink/epoch_id=<n>/``), overwritten whole per epoch.

Restart-resume rides the streaming checkpoint exactly like the crawl
frontier (ST4 semantics, streaming/crawl.py): a restarted query skips
already-committed source files, so re-running against the same
checkpoint appends NOTHING.  foreachBatch itself is only
AT-LEAST-ONCE — a crash after the sink write but before the checkpoint
commit re-delivers the same epoch — so sink-side idempotence comes from
the epoch-keyed overwrite: the replayed epoch rewrites its own
partition with byte-identical verdicts (per-doc probes are
deterministic) instead of appending a duplicate copy, and a partial
directory from a mid-write crash is replaced wholesale.  The driver
gate hashes the sink after a deliberate second run, pinning the
end-to-end exactly-once EFFECT, not just the math.

The epoch-keyed overwrite is only safe WITHIN one checkpoint lineage:
a fresh checkpoint restarts epoch ids at 0, so pointing a new query at
an existing sink would overwrite unrelated prior ``epoch_id=N``
partitions with new data — silent destruction.  The sink therefore
records its checkpoint lineage in a ``_LINEAGE`` marker and a
mismatched query fails fast instead of clobbering.

Reference parity: the reference's dedup surface is upsert-by-key on
ingest (linkgraph/store/memory/memory.go:42-87 — every ingested link
dedupes against the stored corpus); this is the content-similarity
analog of that ingest-time check at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def dedup_stream_against_index(
    stream_docs: DataFrame,
    corpus_sh: DataFrame,
    corpus_banded: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> StreamingQuery:
    """Start the foreachBatch probe stream: ``stream_docs`` (a streaming
    DataFrame of (id_col, text_col)) is hashed per micro-batch and probed
    against the static (corpus_sh, corpus_banded) index; near-dup
    verdicts (batch_id, corpus_id, jaccard round-4) land under
    ``sink_path/epoch_id=<n>/`` — one overwritten partition per epoch,
    so a crash-replayed epoch is idempotent (see module docstring).
    Readers take ``spark.read.parquet(sink_path)`` and get an extra
    ``epoch_id`` partition column; select it away if unwanted.  The
    caller owns the query lifecycle (processAllAvailable/stop) and the
    checkpoint directory.  A sink already populated by a DIFFERENT
    checkpoint lineage raises instead of overwriting its partitions
    (``_LINEAGE`` marker — see module docstring)."""
    from usearch_spark.operators.dedup import minhash_index, minhash_probe_pairs
    from usearch_spark.streaming.sketches import _lineage_id

    import os

    lineage = _lineage_id(checkpoint_path)

    def probe_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        marker = os.path.join(sink_path, "_LINEAGE")
        if os.path.exists(marker):
            with open(marker) as fh:
                existing = fh.read().strip()
            if existing != lineage:
                raise ValueError(
                    f"streaming lineage mismatch at {sink_path}: sink was "
                    f"written by checkpoint lineage {existing}, this query is "
                    f"{lineage}; its restarted epoch ids would overwrite "
                    f"unrelated epoch_id=N partitions.  Resume with the "
                    f"original checkpoint or use a fresh sink_path."
                )
        else:
            os.makedirs(sink_path, exist_ok=True)
            tmp = marker + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(lineage)
            os.replace(tmp, marker)
        sh, banded = minhash_index(batch_df, id_col, text_col, shingle_n=shingle_n)
        sh = sh.localCheckpoint(eager=True)
        pairs = minhash_probe_pairs(
            sh, banded, corpus_sh, corpus_banded,
            threshold=threshold, max_bucket=max_bucket,
        )
        (
            pairs.select(
                F.col("a").alias("batch_id"),
                F.col("b").alias("corpus_id"),
                F.round(F.col("jaccard"), 4).alias("jaccard"),
            )
            # epoch-keyed overwrite, NOT append: replay rewrites the same
            # partition with identical rows instead of double-appending.
            .write.mode("overwrite")
            .parquet(os.path.join(sink_path, f"epoch_id={int(epoch_id)}"))
        )

    return (
        stream_docs.writeStream.foreachBatch(probe_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
