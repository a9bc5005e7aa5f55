"""Structured Streaming operators (SURVEY §2.13 ST1-ST4 + the stream-table
side of the driver's events table).

The reference has no event-time semantics — its 'streaming' is two timers
(crawl every 2min, pagerank hourly).  ``periodic_crawl_stream`` reproduces
that shape with a processing-time trigger; the windowed/watermarked
aggregation is the Spark-native generalization the events table exists to
exercise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts+sums per event_type.
    Works on both batch and streaming DataFrames (same plan either way)."""
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.groupBy(w.alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


def continuous_hourly_rollup(
    events_stream: DataFrame,
    target_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    value_col: str = "value",
    late_path: str | None = None,
    late_horizon_hours: int | None = None,
) -> StreamingQuery:
    """Continuous aggregate (hypertable-rollup style): a foreachBatch loop
    that incrementally MERGEs each micro-batch's partial hourly sums into a
    persistent rollup table keyed by (hour, event_type).

    Per batch: aggregate the batch DOWN first (map-side partial + one tiny
    shuffle over the batch's hours), then merge against the stored rollup
    on the grouping key — the read-join-overwrite MERGE emulation; on a
    Delta/Iceberg cluster the merge collapses to one MERGE INTO.  State
    never lives in the streaming engine, so the rollup survives restarts
    and can be queried mid-stream like any table.

    Exactly-once caveat of the parquet emulation: foreachBatch can REPLAY
    a batch after a crash-restart; the merge is additive, so a replayed
    batch would double-count.  The batch id is stored alongside and
    batches already applied are skipped — the standard idempotent-sink
    recipe.

    Late-data dead-letter: with ``late_path`` + ``late_horizon_hours``,
    rows whose hour is more than the horizon behind the rollup's newest
    stored hour are QUARANTINED (appended to ``late_path`` with the batch
    id) instead of merged — the manual-merge analog of a watermark drop,
    except nothing is silently lost: the quarantine table is replayable
    into a backfill once someone decides what the late rows mean.
    """
    merge_batch = hourly_merge_fn(
        events_stream.sparkSession,
        target_path,
        ts_col=ts_col,
        value_col=value_col,
        late_path=late_path,
        late_horizon_hours=late_horizon_hours,
    )
    return (
        events_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def hourly_merge_fn(
    spark: SparkSession,
    target_path: str,
    ts_col: str = "ts",
    value_col: str = "value",
    late_path: str | None = None,
    late_horizon_hours: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch merge behind :func:`continuous_hourly_rollup`,
    exposed as a factory so the idempotence/quarantine semantics are
    directly testable (call it twice with the same batch id)."""
    from pyspark.errors import AnalysisException

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # read the stored rollup ONCE and check the replayed-batch guard
        # FIRST: a crash-replayed batch must not re-append quarantine rows
        # either.  Only missing-path (AnalysisException) means "no rollup
        # yet" — genuine IO/corruption errors propagate and fail the batch
        # rather than silently disabling quarantine/merge.
        try:
            existing = spark.read.parquet(target_path)
        except AnalysisException:
            existing = None
        if existing is not None:
            if existing.filter(F.col("_batch_id") == batch_id).limit(1).count() > 0:
                return  # replayed batch: already applied (idempotence)
        if late_path is not None and late_horizon_hours is not None and existing is not None:
            max_hour = existing.agg(F.max("hour").alias("m")).first()["m"]
            if max_hour is not None:
                cutoff = F.lit(max_hour) - F.expr(f"INTERVAL {late_horizon_hours} HOURS")
                is_late = F.date_trunc("hour", F.col(ts_col)) < cutoff
                late_rows = batch_df.filter(is_late).withColumn("_batch_id", F.lit(batch_id))
                if not late_rows.isEmpty():
                    late_rows.write.mode("append").parquet(late_path)
                batch_df = batch_df.filter(~is_late)
        part = (
            batch_df.groupBy(
                F.date_trunc("hour", F.col(ts_col)).alias("hour"), "event_type"
            ).agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_value"),
            )
        )
        if existing is not None:
            merged = (
                existing.drop("_batch_id")
                .unionByName(part)
                .groupBy("hour", "event_type")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_value").cast("decimal(18,2)").alias("sum_value"),
                )
            )
        else:
            merged = part
        out = merged.withColumn("_batch_id", F.lit(batch_id)).localCheckpoint(eager=True)
        out.write.mode("overwrite").parquet(target_path)

    return merge_batch


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream interval join: rows pair when they share ``on`` and the
    right event lands within [left_ts + lower, left_ts + upper].

    Both sides carry a watermark and the join condition bounds event time in
    BOTH directions — the requirements Spark needs to know when buffered
    state can be evicted (otherwise a stream-stream join's state grows
    forever).  Works identically on batch frames (the condition is just a
    range predicate there).
    """
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (rts >= lts + F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    return l.alias("l").join(r.alias("r"), cond, "inner")


def stream_events_from_parquet(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based streaming source over a parquet directory (the batch
    table replayed as a stream for tests/demos)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def run_to_memory_sink(agg: DataFrame, name: str, output_mode: str = "update") -> StreamingQuery:
    """Drive a streaming aggregation into an in-memory table and process
    everything available (synchronous smoke path)."""
    q = agg.writeStream.outputMode(output_mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    return q


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    micros_col: str | None = None,
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    sessions that close on a ``gap_minutes`` inactivity gap.

    Two close paths:
      - in-data gap: a batch containing a post-gap event emits the finished
        session immediately;
      - event-time timeout: when the watermark passes last_event + gap, the
        open session is flushed even if the user never returns (the state
        does not leak — this is what the reference's timer loops lack and
        Structured Streaming's GroupState provides).

    State per user is three longs (start/last ns, count); output is one row
    per CLOSED session (append semantics).  This is the engine's streaming
    extension surface: any per-key stateful program with the same
    (key, batches, state) signature plugs in identically (SURVEY §2.14 U1).

    ``micros_col``: timezone-proof mode for deterministic replay gates —
    session times are read from this epoch-MICROS long column (``ts_col``
    still drives the watermark/timeout clock) and emitted as
    session_start_us/session_end_us longs, so no timestamp crosses the
    Arrow boundary in either direction.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    use_us = micros_col is not None
    if use_us:
        out_schema = (
            f"{user_col} long, session_start_us long, session_end_us long, n_events long"
        )
        start_name, end_name = "session_start_us", "session_end_us"
    else:
        out_schema = (
            f"{user_col} long, session_start timestamp, session_end timestamp, n_events long"
        )
        start_name, end_name = "session_start", "session_end"
    state_schema = "start long, last long, n long"
    # internal unit: micros in micros mode, ns in timestamp mode
    gap_units = gap_minutes * 60 * (1_000_000 if use_us else 1_000_000_000)
    to_ms = 1_000 if use_us else 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd

        def emit(start, last, n):
            if use_us:
                return (user_id, int(start), int(last), n)
            return (user_id, pd.to_datetime(start), pd.to_datetime(last), n)

        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [emit(start, last, n)], columns=[user_col, start_name, end_name, "n_events"]
            )
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed: list[tuple] = []
        if use_us:
            ts_all = sorted(int(t) for pdf in pdfs for t in pdf[micros_col] if pd.notna(t))
        else:
            ts_all = sorted(int(t.value) for pdf in pdfs for t in pdf[ts_col] if t is not None)
        for t in ts_all:
            if last is not None and t - last > gap_units:
                closed.append(emit(start, last, n))
                start, n = t, 0
            if start is None:
                start = t
            n += 1
            last = t
        if last is not None:
            state.update((start, last, n))
            state.setTimeoutTimestamp(last // to_ms + gap_minutes * 60 * 1000)
        yield pd.DataFrame(closed, columns=[user_col, start_name, end_name, "n_events"])

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def deduplicate_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once ingestion dedup: drop re-delivered rows by key, keeping
    state only within the watermark horizon.

    At-least-once sources (file replays, kafka re-reads, retried crawl
    fetches) re-emit rows; unbounded ``dropDuplicates`` state would grow
    forever at 100 TB/day.  The watermark bounds the state to the late-data
    horizon: a duplicate arriving later than the watermark is already
    outside the exactly-once window by definition.  Uses Spark's
    ``dropDuplicatesWithinWatermark`` when available (4.x), else
    watermarked ``dropDuplicates`` (state keyed the same way).

    Works on batch DataFrames too (plain dropDuplicates) so the same
    pipeline code runs in both modes.
    """
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    src = events.withWatermark(ts_col, watermark)
    if hasattr(src, "dropDuplicatesWithinWatermark"):
        return src.dropDuplicatesWithinWatermark(keys)
    return src.dropDuplicates(keys)


def enrich_stream(events: DataFrame, dim: DataFrame, on: str, how: str = "left") -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (small, slowly-changing) dimension table, re-read per batch so dim
    updates are picked up without restarting the query.  The static side
    is marked broadcast — no shuffle of the stream, no streaming state."""
    return events.join(F.broadcast(dim), on, how)


def periodic_crawl_stream(
    spark: SparkSession,
    tick_fn: Callable[[int], None],
    interval: str = "2 minutes",
) -> StreamingQuery:
    """ST1: the reference's timer loop as a processing-time-triggered
    stream — each tick of the rate source fires one crawl pass via
    foreachBatch (the batch itself is the crawl job; the stream only
    provides the clock and restart semantics)."""
    ticks = spark.readStream.format("rate").option("rowsPerSecond", 1).load()

    def on_batch(df: DataFrame, epoch: int) -> None:
        if df.isEmpty():
            return
        tick_fn(epoch)

    return (
        ticks.writeStream.trigger(processingTime=interval)
        .foreachBatch(on_batch)
        .start()
    )
