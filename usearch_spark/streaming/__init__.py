"""Structured Streaming maintainers and replay harnesses.

``replay_tuned_session`` is the streaming analogue of
``plans.iterative.loop_tuned_session``: stateful operators allocate ONE
state-store instance per shuffle partition per operator, re-committed
every micro-batch, so a deterministic few-file replay under the vanilla
200-partition default spends more wall clock instantiating, committing
and maintaining near-empty HDFS-backed state stores (200 x batches tiny
files + tasks) than aggregating.  The partition count is locked into the
query's checkpoint at ``start()``, so the conf must wrap stream start;
it is restored on exit and never leaks into batch queries.

At real cluster scale a long-lived stream sizes its state partitions to
the key volume (hundreds+); the tuned value here applies only to the
bounded replay harnesses the correctness gate runs.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def replay_tuned_session(spark, n_partitions: int = 8):
    """Set shuffle partitions (= state-store count) for a bounded replay,
    restoring the session value on exit."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_partitions))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
