"""Structured Streaming tests: watermarked windowed aggregation over the
events table replayed as a file stream; batch/stream plan parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from usearch_spark.streaming.events import (
    run_to_memory_sink,
    stream_events_from_parquet,
    windowed_event_counts,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    """Re-materialize sf0.001 events as micros-timestamp parquet split into
    several files (so the file stream has multiple triggers)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = raw.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    df.repartition(4).write.parquet(path)
    return path


def test_windowed_counts_stream_matches_batch(spark, events_path):
    batch = spark.read.schema(EVENT_SCHEMA).parquet(events_path)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in windowed_event_counts(batch, window="6 hours").collect()
    }

    stream = stream_events_from_parquet(spark, events_path, EVENT_SCHEMA)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, window="6 hours")
    # complete mode: the memory sink holds exactly the final window states
    # (update mode would append every per-trigger revision)
    q = run_to_memory_sink(agg, "win_counts", output_mode="complete")
    try:
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
    finally:
        q.stop()
    assert got == expected
    assert len(got) > 10


def test_sliding_window(spark, events_path):
    batch = spark.read.schema(EVENT_SCHEMA).parquet(events_path)
    slid = windowed_event_counts(batch, window="2 hours", slide="1 hour")
    tumb = windowed_event_counts(batch, window="1 hour")
    # every event lands in exactly 2 sliding windows vs 1 tumbling window
    assert slid.agg(F.sum("n_events")).first()[0] == 2 * tumb.agg(F.sum("n_events")).first()[0]
