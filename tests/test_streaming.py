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

pytestmark = pytest.mark.slow  # streaming replays: multi-micro-batch runs dominate the suite clock

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
    # the driver's events.parquet has shipped as both TIMESTAMP(NANOS)
    # (read as long under nanosAsLong) and plain micros — adapt like
    # __spark_entry__._events does
    if dict(raw.dtypes)["ts"] == "bigint":
        df = raw.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    else:
        df = raw.withColumn("ts", F.col("ts").cast("timestamp"))
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


def test_stateful_sessionize_gap_close(spark, tmp_path):
    """A post-gap event inside the data closes the previous session and
    emits it in the same trigger; the still-open session stays in state."""
    import datetime as dt

    from usearch_spark.streaming.events import sessionize_stateful

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: two events, 2h gap, two more events -> one closed session
        (1, t0),
        (1, t0 + dt.timedelta(minutes=5)),
        (1, t0 + dt.timedelta(hours=2)),
        (1, t0 + dt.timedelta(hours=2, minutes=1)),
        # user 2: single burst, never closes in-data
        (2, t0 + dt.timedelta(minutes=1)),
        (2, t0 + dt.timedelta(minutes=2)),
    ]
    schema = "user_id long, ts timestamp"
    path = str(tmp_path / "sess_events")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)

    stream = spark.readStream.schema(schema).parquet(path)
    out = sessionize_stateful(stream, gap_minutes=30)
    q = out.writeStream.outputMode("append").format("memory").queryName("sessions").start()
    try:
        q.processAllAvailable()
        got = [
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.sql("SELECT * FROM sessions ORDER BY user_id, session_start").collect()
        ]
    finally:
        q.stop()
    # user 1's first session closes on the in-data gap; user 2's burst is
    # flushed by event-time timeout (watermark = 2h01 - 10min passes their
    # last event + 30min gap).  User 1's second session is still open.
    assert got == [
        (1, t0, t0 + dt.timedelta(minutes=5), 2),
        (2, t0 + dt.timedelta(minutes=1), t0 + dt.timedelta(minutes=2), 2),
    ]


def test_stateful_sessionize_timeout_flush(spark, tmp_path):
    """A later file advances the watermark past last+gap for an idle user,
    firing the event-time timeout and flushing their open session."""
    import datetime as dt
    import time

    from usearch_spark.streaming.events import sessionize_stateful

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "user_id long, ts timestamp"
    path = str(tmp_path / "sess_timeout")
    # file 1: user 7's burst
    spark.createDataFrame(
        [(7, t0), (7, t0 + dt.timedelta(minutes=3))], schema
    ).coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)  # distinct mod times => two triggers in order
    # file 2: another user far in the future drags the watermark forward
    spark.createDataFrame(
        [(8, t0 + dt.timedelta(days=1))], schema
    ).coalesce(1).write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    out = sessionize_stateful(stream, gap_minutes=30, watermark="1 minute")
    q = out.writeStream.outputMode("append").format("memory").queryName("sess_t").start()
    try:
        q.processAllAvailable()
        got = [
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.sql("SELECT * FROM sess_t").collect()
        ]
    finally:
        q.stop()
    # user 7's session closed by timeout, not by any in-data gap
    assert got == [(7, t0, t0 + dt.timedelta(minutes=3), 2)]


def test_sliding_window(spark, events_path):
    batch = spark.read.schema(EVENT_SCHEMA).parquet(events_path)
    slid = windowed_event_counts(batch, window="2 hours", slide="1 hour")
    tumb = windowed_event_counts(batch, window="1 hour")
    # every event lands in exactly 2 sliding windows vs 1 tumbling window
    assert slid.agg(F.sum("n_events")).first()[0] == 2 * tumb.agg(F.sum("n_events")).first()[0]


def test_deduplicate_stream_drops_redelivered_rows(spark, tmp_path):
    """A row re-delivered in a later micro-batch (same event_id, inside the
    watermark horizon) must be emitted exactly once."""
    from usearch_spark.streaming.events import deduplicate_stream

    path = str(tmp_path / "dup_events")
    rows = [
        (1, "2024-01-01 00:00:00", 10, "click", 1.0, "{}"),
        (2, "2024-01-01 00:00:30", 11, "view", 2.0, "{}"),
    ]
    redelivered = [
        (1, "2024-01-01 00:00:00", 10, "click", 1.0, "{}"),  # dup of batch 1
        (3, "2024-01-01 00:01:00", 12, "click", 3.0, "{}"),
    ]

    def write_file(batch, name):
        df = spark.createDataFrame(
            batch, "event_id long, ts string, user_id long, event_type string, value double, props string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.coalesce(1).write.parquet(f"{path}/{name}", mode="overwrite")
        return df

    write_file(rows, "f0")
    write_file(redelivered, "f1")

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/*")
    )
    deduped = deduplicate_stream(stream, keys=["event_id"], watermark="10 minutes")
    q = run_to_memory_sink(deduped, "dedup_stream", output_mode="append")
    try:
        got = spark.sql("SELECT event_id FROM dedup_stream").collect()
    finally:
        q.stop()
    ids = sorted(r["event_id"] for r in got)
    assert ids == [1, 2, 3]  # event 1 exactly once


def test_deduplicate_stream_batch_mode(spark):
    from usearch_spark.streaming.events import deduplicate_stream

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "event_id long, event_type string"
    )
    assert deduplicate_stream(df, keys=["event_id"]).count() == 2


def test_enrich_stream_static_join_broadcasts(spark, events_path):
    from usearch_spark.streaming.events import enrich_stream

    dim = spark.createDataFrame(
        [("click", "interaction"), ("view", "interaction"), ("error", "fault")],
        "event_type string, category string",
    )
    stream = stream_events_from_parquet(spark, events_path, EVENT_SCHEMA)
    enriched = enrich_stream(stream, dim, on="event_type")
    q = run_to_memory_sink(enriched, "enriched_events", output_mode="append")
    try:
        got = spark.sql(
            "SELECT count(*) AS n, count(category) AS with_cat FROM enriched_events"
        ).first()
        batch = spark.read.schema(EVENT_SCHEMA).parquet(events_path)
        n_expected = batch.count()
        n_cat = batch.filter(F.col("event_type").isin("click", "view", "error")).count()
    finally:
        q.stop()
    assert got["n"] == n_expected
    assert got["with_cat"] == n_cat


def test_interval_join_streams_matches_batch(spark, tmp_path):
    """Stream-stream interval join: clicks followed by a purchase from the
    same user within 10 minutes.  The streaming result must equal the batch
    join over the same data."""
    import datetime as dt

    from usearch_spark.streaming.events import interval_join_streams

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    clicks = [
        (1, t0),                                 # -> purchase at +5m pairs
        (2, t0 + dt.timedelta(minutes=1)),       # -> purchase at +20m: outside
        (3, t0 + dt.timedelta(minutes=2)),       # no purchase
    ]
    purchases = [
        (1, t0 + dt.timedelta(minutes=5)),
        (2, t0 + dt.timedelta(minutes=21)),
        # late watermark-driver row so buffered state flushes deterministically
        (9, t0 + dt.timedelta(hours=2)),
    ]
    cp, pp = str(tmp_path / "clicks"), str(tmp_path / "purch")
    schema = "user_id long, ts timestamp"
    spark.createDataFrame(clicks, schema).coalesce(1).write.parquet(cp)
    spark.createDataFrame(purchases, schema).coalesce(1).write.parquet(pp)

    batch = interval_join_streams(
        spark.read.parquet(cp).withColumnRenamed("ts", "click_ts"),
        spark.read.parquet(pp).withColumnRenamed("ts", "purchase_ts"),
        on="user_id", left_ts="click_ts", right_ts="purchase_ts",
    ).select("l.user_id", "click_ts", "purchase_ts")
    expected = sorted(tuple(r) for r in batch.collect())
    assert [r[0] for r in expected] == [1]  # only user 1 pairs

    ls = spark.readStream.schema(schema).parquet(cp).withColumnRenamed("ts", "click_ts")
    rs = spark.readStream.schema(schema).parquet(pp).withColumnRenamed("ts", "purchase_ts")
    joined = interval_join_streams(
        ls, rs, on="user_id", left_ts="click_ts", right_ts="purchase_ts"
    ).select("l.user_id", "click_ts", "purchase_ts")
    assert joined.isStreaming
    q = joined.writeStream.outputMode("append").format("memory").queryName("ij").start()
    try:
        q.processAllAvailable()
        got = sorted(tuple(r) for r in spark.sql("SELECT * FROM ij").collect())
    finally:
        q.stop()
    assert got == expected


def test_continuous_hourly_rollup_matches_batch(spark, events_path, tmp_path):
    """foreachBatch incremental rollup across multiple micro-batches must
    equal the one-shot batch aggregation; a replayed final batch must not
    double-count (idempotent merge)."""
    from usearch_spark.streaming.events import continuous_hourly_rollup

    target = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(events_path)
    )
    q = continuous_hourly_rollup(stream, target, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch = spark.read.schema(EVENT_SCHEMA).parquet(events_path)
    expected = {
        (r["hour"], r["event_type"]): (r["n_events"], float(r["sum_value"]))
        for r in batch.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
        .collect()
    }
    got_rows = spark.read.parquet(target).collect()
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], float(r["sum_value"]))
        for r in got_rows
    }
    assert got == expected and len(got) > 10

    # restart with the SAME checkpoint and no new files: no batch fires,
    # the rollup table is byte-identical (restart safety)
    q2 = continuous_hourly_rollup(
        spark.readStream.schema(EVENT_SCHEMA).option("maxFilesPerTrigger", 1).parquet(events_path),
        target,
        ckpt,
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    again = {
        (r["hour"], r["event_type"]): (r["n_events"], float(r["sum_value"]))
        for r in spark.read.parquet(target).collect()
    }
    assert again == expected


def test_watermark_drops_late_cohort(spark):
    """q_events_watermark_late's 3-batch replay must actually DROP the late
    cohort: emitted totals are strictly below the no-watermark aggregation
    for the same windows, and equal the closed-form on-time-only counts.
    (Three batches because Spark filters late events with the PREVIOUS
    batch's watermark — SPARK-24634; a 2-batch replay drops nothing.)"""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = E.q_events_watermark_late(spark, sf)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in out.collect()
    }
    assert got, "no finalized windows emitted"

    ev = E._events(spark, sf)
    wm = ev.agg(F.timestamp_add("MINUTE", F.lit(-30), F.max("ts")).alias("w"))
    flagged = ev.join(F.broadcast(wm)).withColumn(
        "emittable",
        F.timestamp_add("HOUR", F.lit(1), F.date_trunc("hour", F.col("ts"))) <= F.col("w"),
    )
    full = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in flagged.filter("emittable")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    ontime = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in flagged.filter(
            "emittable AND NOT (substring(md5(cast(event_id as string)), 1, 1) = '0')"
        )
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert got == ontime
    n_dropped = sum(full.values()) - sum(got.values())
    assert n_dropped > 0, "late cohort empty at this sf — test is vacuous"


def test_watermark_drop_metric_matches_cohort(spark):
    """Spark's OWN state-operator accounting must agree with the closed
    form.  Subtlety this test pins: numRowsDroppedByWatermark counts rows
    arriving at the STATE operator — i.e. after map-side partial
    aggregation — so with the late batch in one input split the count is
    the number of distinct (window, event_type) groups in the late
    cohort, not the raw late-row count."""
    import os
    import uuid

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    # ensure the replay artifact exists (builds on first call)
    E.q_events_watermark_late(spark, sf).count()
    base = os.path.join(E._ARTIFACT_DIR, f"wm_replay_{E._sf_token(sf)}")

    stream = (
        spark.readStream.schema("ts_us long, event_type string, value double")
        .option("pathGlobFilter", "batch*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(base)
    )
    agg = (
        stream.withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"wm_metric_{uuid.uuid4().hex[:6]}"
    q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        dropped = sum(
            so.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for so in p.get("stateOperators", [])
        )
    finally:
        q.stop()

    late = spark.read.parquet(os.path.join(base, "batch2.parquet"))
    expected_groups = (
        late.select(F.date_trunc("hour", F.timestamp_micros("ts_us")).alias("h"), "event_type")
        .distinct()
        .count()
    )
    assert expected_groups > 0 and dropped == expected_groups


def test_rollup_quarantines_late_rows(spark, tmp_path):
    """Dead-letter path: a second micro-batch carrying rows older than the
    horizon behind the rollup's newest hour must land in the quarantine
    table (with the batch id) and stay OUT of the merged rollup."""
    import datetime

    from usearch_spark.streaming.events import continuous_hourly_rollup

    src_dir = str(tmp_path / "src")
    target = str(tmp_path / "rollup")
    late = str(tmp_path / "late")
    ckpt = str(tmp_path / "ckpt")
    schema = "ts timestamp, event_type string, value double"

    def write_file(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src_dir)

    t0 = datetime.datetime(2024, 1, 10, 12, 30)
    old = datetime.datetime(2024, 1, 9, 8, 15)  # 28h behind -> late at horizon 24
    write_file([(t0, "a", 1.0), (t0, "b", 2.0)], "b0")

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
    q = continuous_hourly_rollup(
        stream, target, ckpt, late_path=late, late_horizon_hours=24
    )
    try:
        q.processAllAvailable()
        write_file([(old, "a", 5.0), (t0, "a", 3.0)], "b1")
        q.processAllAvailable()
    finally:
        q.stop()

    rollup = {
        (r["hour"], r["event_type"]): (r["n_events"], float(r["sum_value"]))
        for r in spark.read.parquet(target).collect()
    }
    hour0 = datetime.datetime(2024, 1, 10, 12)
    assert rollup[(hour0, "a")] == (2, 4.0)  # batch0 row + on-time batch1 row
    assert rollup[(hour0, "b")] == (1, 2.0)
    assert not any(h.day == 9 for h, _ in rollup)  # late hour never merged

    lrows = spark.read.parquet(late).collect()
    assert len(lrows) == 1 and lrows[0]["ts"] == old and lrows[0]["value"] == 5.0
    assert lrows[0]["_batch_id"] is not None


def test_rollup_replayed_batch_skips_quarantine_append(spark, tmp_path):
    """A crash-replayed batch (same batch id) must not re-append its late
    rows to the quarantine table — the idempotence guard runs FIRST."""
    import datetime

    from usearch_spark.streaming.events import hourly_merge_fn

    target = str(tmp_path / "rollup")
    late = str(tmp_path / "late")
    schema = "ts timestamp, event_type string, value double"
    t0 = datetime.datetime(2024, 1, 10, 12, 30)
    old = datetime.datetime(2024, 1, 9, 8, 15)

    merge = hourly_merge_fn(spark, target, late_path=late, late_horizon_hours=24)
    merge(spark.createDataFrame([(t0, "a", 1.0)], schema), 0)
    b1 = spark.createDataFrame([(old, "a", 5.0), (t0, "a", 3.0)], schema)
    merge(b1, 1)
    assert spark.read.parquet(late).count() == 1
    rollup_before = sorted(map(tuple, spark.read.parquet(target).collect()))

    merge(b1, 1)  # replay: no new quarantine rows, rollup unchanged
    assert spark.read.parquet(late).count() == 1
    assert sorted(map(tuple, spark.read.parquet(target).collect())) == rollup_before


def test_rollup_merge_propagates_read_errors(spark, tmp_path):
    """Only missing-path disables the guard/merge read; a corrupt target
    must raise, not silently skip quarantine."""
    import datetime

    import pytest

    from usearch_spark.streaming.events import hourly_merge_fn

    target = tmp_path / "rollup"
    target.mkdir()
    (target / "part-00000.parquet").write_bytes(b"not parquet at all")
    merge = hourly_merge_fn(spark, str(target), late_path=str(tmp_path / "late"), late_horizon_hours=24)
    t0 = datetime.datetime(2024, 1, 10, 12, 30)
    with pytest.raises(Exception, match="(?i)parquet|corrupt|footer"):
        merge(spark.createDataFrame([(t0, "a", 1.0)], "ts timestamp, event_type string, value double"), 0)


def test_dedup_stream_matches_batch_and_resumes(spark, tmp_path):
    """Streaming dedup-against-corpus: the drained sink equals the
    one-shot batch probe, and a restarted query on the same checkpoint
    appends NOTHING (exactly-once over committed source files)."""
    from usearch_spark.operators.dedup import minhash_index, minhash_probe_pairs
    from usearch_spark.streaming.dedup import dedup_stream_against_index

    rows = [
        (i, f"alpha beta gamma delta epsilon zeta token{i % 3} eta theta iota kappa")
        for i in range(8)
    ] + [(100 + i, f"alpha beta gamma delta epsilon zeta token{i} eta theta iota kappa")
         for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = docs.filter(F.col("doc_id") < 100)
    batch = docs.filter(F.col("doc_id") >= 100)
    c_sh, c_banded = minhash_index(corpus, shingle_n=2)
    c_sh = c_sh.localCheckpoint(eager=True)
    c_banded = c_banded.localCheckpoint(eager=True)

    src = str(tmp_path / "src")
    batch.filter(F.col("doc_id") < 102).coalesce(1).write.parquet(src + "/b0")
    batch.filter(F.col("doc_id") >= 102).coalesce(1).write.parquet(src + "/b1")
    import glob
    import shutil

    srcdir = str(tmp_path / "stream_src")
    import os
    os.makedirs(srcdir)
    for i, d in enumerate((src + "/b0", src + "/b1")):
        part = glob.glob(d + "/part-*.parquet")[0]
        shutil.copy(part, f"{srcdir}/batch{i}.parquet")

    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(srcdir)
    )
    q = dedup_stream_against_index(
        stream, c_sh, c_banded, sink, ckpt, threshold=0.5, shingle_n=2
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = sorted(
        map(tuple, spark.read.parquet(sink).select("batch_id", "corpus_id", "jaccard").collect())
    )
    assert len(first) > 0

    # restart against the same checkpoint: nothing new to process
    q2 = dedup_stream_against_index(
        stream, c_sh, c_banded, sink, ckpt, threshold=0.5, shingle_n=2
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert (
        sorted(
            map(
                tuple,
                spark.read.parquet(sink).select("batch_id", "corpus_id", "jaccard").collect(),
            )
        )
        == first
    )

    # equivalence with the one-shot batch probe
    b_sh, b_banded = minhash_index(batch, shingle_n=2)
    b_sh = b_sh.localCheckpoint(eager=True)
    ref = sorted(
        (r["a"], r["b"], round(r["jaccard"], 4))
        for r in minhash_probe_pairs(
            b_sh, b_banded, c_sh, c_banded, threshold=0.5
        ).collect()
    )
    assert sorted((a, b, round(j, 4)) for a, b, j in first) == ref


def test_cms_stream_merge_equals_batch_and_resumes(spark, tmp_path):
    """Continuous CMS maintenance: the merged sketch after draining two
    micro-batches equals the one-shot batch sketch cell-for-cell, and a
    restart against the same checkpoint changes nothing."""
    from usearch_spark.operators.sketch import count_min_sketch
    from usearch_spark.streaming.sketches import cms_stream_merge, read_cms

    df = spark.range(500).select(
        F.col("id").alias("event_id"), F.pmod(F.col("id"), F.lit(37)).alias("user_id")
    )
    src = str(tmp_path / "src")
    import glob
    import os
    import shutil

    os.makedirs(src)
    for i in (0, 1):
        tmp = str(tmp_path / f"t{i}")
        df.filter(F.pmod(F.col("event_id"), F.lit(2)) == i).coalesce(1).write.parquet(tmp)
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], f"{src}/batch{i}.parquet")

    target, ckpt = str(tmp_path / "sketch"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    for _ in range(2):  # second run = restart; checkpoint must skip both files
        q = cms_stream_merge(stream, "user_id", target, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    merged = sorted(map(tuple, read_cms(spark, target).collect()))
    batch = sorted(map(tuple, count_min_sketch(df, "user_id").collect()))
    assert merged == batch and len(merged) > 0
    # pointer committed the LAST epoch's version
    import os as _os

    assert _os.path.exists(_os.path.join(target, "_CURRENT"))


def _drop_last_commit(ckpt: str) -> None:
    """Simulate the foreachBatch crash window: the epoch RAN (pointer
    swapped, sink written) but the checkpoint commit was never recorded,
    so a restart re-delivers the SAME epoch id with the same data —
    exactly what deleting the newest ``commits/<n>`` file reproduces."""
    import os

    commits = os.path.join(ckpt, "commits")
    last = max(
        (f for f in os.listdir(commits) if f.isdigit()), key=int
    )
    os.remove(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")  # hadoop checksum sidecar
    if os.path.exists(crc):
        os.remove(crc)


def test_cms_stream_replay_is_idempotent(spark, tmp_path):
    """Crash-window replay (foreachBatch is at-least-once): deleting the
    newest checkpoint commit makes the restart re-deliver the last epoch
    under the SAME lineage and epoch id — the true at-least-once window.
    The lineage-aware guard must no-op it: no cell is double-counted."""
    import glob
    import os
    import shutil

    from usearch_spark.operators.sketch import count_min_sketch
    from usearch_spark.streaming.sketches import cms_stream_merge, read_cms

    df = spark.range(300).select(
        F.col("id").alias("event_id"), F.pmod(F.col("id"), F.lit(23)).alias("user_id")
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in (0, 1):
        tmp = str(tmp_path / f"t{i}")
        df.filter(F.pmod(F.col("event_id"), F.lit(2)) == i).coalesce(1).write.parquet(tmp)
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], f"{src}/batch{i}.parquet")

    target, ckpt = str(tmp_path / "sketch"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    for run in range(2):
        # run 0: normal drain (epochs 0,1 merged, pointer committed).
        # run 1: crash-window replay — commits/1 deleted, the restart
        # re-delivers epoch 1 against a pointer that already merged it.
        q = cms_stream_merge(stream, "user_id", target, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        if run == 0:
            first = sorted(map(tuple, read_cms(spark, target).collect()))
            _drop_last_commit(ckpt)
    batch = sorted(map(tuple, count_min_sketch(df, "user_id").collect()))
    assert first == batch
    replayed = sorted(map(tuple, read_cms(spark, target).collect()))
    assert replayed == first  # replay merged nothing: no double-count


def test_cms_stream_lineage_mismatch_raises_or_adopts(spark, tmp_path):
    """A FRESH checkpoint against an existing target restarts epoch ids
    at 0; an epoch-only guard would silently drop every new batch (data
    loss).  The lineage guard turns that into an explicit error, and
    on_mismatch='adopt' explicitly continues merging on top of the
    committed sketch (cells double here because the source is re-read)."""
    import glob
    import os
    import shutil

    from usearch_spark.streaming.sketches import cms_stream_merge, read_cms

    df = spark.range(200).select(
        F.col("id").alias("event_id"), F.pmod(F.col("id"), F.lit(11)).alias("user_id")
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    tmp = str(tmp_path / "t0")
    df.coalesce(1).write.parquet(tmp)
    shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], f"{src}/batch0.parquet")

    target = str(tmp_path / "sketch")
    stream = spark.readStream.schema("event_id long, user_id long").parquet(src)
    q = cms_stream_merge(stream, "user_id", target, str(tmp_path / "ckpt_a"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = {(r["seed"], r["bucket"]): r["cnt"] for r in read_cms(spark, target).collect()}

    # default: a new lineage against the committed target FAILS FAST
    q = cms_stream_merge(stream, "user_id", target, str(tmp_path / "ckpt_b"))
    try:
        with pytest.raises(Exception, match="lineage mismatch"):
            q.processAllAvailable()
    finally:
        q.stop()
    assert {(r["seed"], r["bucket"]): r["cnt"] for r in read_cms(spark, target).collect()} == first

    # explicit adoption: the new lineage's batches MERGE (not dropped)
    q = cms_stream_merge(
        stream, "user_id", target, str(tmp_path / "ckpt_c"), on_mismatch="adopt"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    adopted = {(r["seed"], r["bucket"]): r["cnt"] for r in read_cms(spark, target).collect()}
    assert adopted == {k: 2 * v for k, v in first.items()}


def test_dedup_stream_replay_is_idempotent(spark, tmp_path):
    """Crash-window replay of the dedup probe stream: deleting the newest
    checkpoint commit re-delivers the last epoch (same lineage, same id)
    against the same sink; the epoch-keyed overwrite rewrites that
    partition with identical verdicts instead of appending a duplicate
    copy — and a genuinely DIFFERENT checkpoint raises on the lineage
    marker instead of clobbering unrelated partitions."""
    import glob
    import os
    import shutil

    from usearch_spark.operators.dedup import minhash_index
    from usearch_spark.streaming.dedup import dedup_stream_against_index

    rows = [
        (i, f"alpha beta gamma delta epsilon zeta token{i % 3} eta theta iota kappa")
        for i in range(8)
    ] + [(100 + i, f"alpha beta gamma delta epsilon zeta token{i} eta theta iota kappa")
         for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    c_sh, c_banded = minhash_index(docs.filter(F.col("doc_id") < 100), shingle_n=2)
    c_sh = c_sh.localCheckpoint(eager=True)
    c_banded = c_banded.localCheckpoint(eager=True)

    srcdir = str(tmp_path / "stream_src")
    os.makedirs(srcdir)
    batch = docs.filter(F.col("doc_id") >= 100)
    for i, flt in enumerate((F.col("doc_id") < 102, F.col("doc_id") >= 102)):
        tmp = str(tmp_path / f"b{i}")
        batch.filter(flt).coalesce(1).write.parquet(tmp)
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], f"{srcdir}/batch{i}.parquet")

    sink = str(tmp_path / "sink")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(srcdir)
    )
    out = None
    ckpt = str(tmp_path / "ckpt_a")
    for run in range(2):  # run 1 = crash-window replay of the last epoch
        q = dedup_stream_against_index(
            stream, c_sh, c_banded, sink, ckpt, threshold=0.5, shingle_n=2,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            map(
                tuple,
                spark.read.parquet(sink)
                .select("batch_id", "corpus_id", "jaccard")
                .collect(),
            )
        )
        if out is None:
            out = got
            assert len(out) > 0
            _drop_last_commit(ckpt)
    assert got == out  # replay rewrote, never duplicated

    # a DIFFERENT checkpoint against the populated sink fails fast: its
    # restarted epoch ids would overwrite unrelated epoch_id=N partitions
    q = dedup_stream_against_index(
        stream, c_sh, c_banded, sink, str(tmp_path / "ckpt_b"),
        threshold=0.5, shingle_n=2,
    )
    try:
        with pytest.raises(Exception, match="lineage mismatch"):
            q.processAllAvailable()
    finally:
        q.stop()
    still = sorted(
        map(
            tuple,
            spark.read.parquet(sink)
            .select("batch_id", "corpus_id", "jaccard")
            .collect(),
        )
    )
    assert still == out  # nothing clobbered


def test_quantile_stream_merge_equals_batch_and_replays(spark, tmp_path):
    """Continuous quantile-sketch maintenance: the drained sketch equals
    the one-shot batch histogram cell-for-cell, and a crash-window replay
    (newest checkpoint commit deleted, same lineage + epoch id) merges
    nothing twice."""
    import glob
    import os
    import shutil

    from usearch_spark.operators.sketch import log_hist_sketch
    from usearch_spark.streaming.sketches import log_hist_stream_merge, read_cms

    df = spark.range(400).select(
        F.col("id").alias("event_id"),
        (F.pmod(F.col("id") * 37, F.lit(997)) + 1).alias("user_id"),
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in (0, 1):
        tmp = str(tmp_path / f"t{i}")
        df.filter(F.pmod(F.col("event_id"), F.lit(2)) == i).coalesce(1).write.parquet(tmp)
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], f"{src}/batch{i}.parquet")

    target = str(tmp_path / "sketch")
    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("g", F.pmod(F.col("user_id"), F.lit(2)))
    )
    ckpt = str(tmp_path / "ck_a")
    for run in range(2):
        q = log_hist_stream_merge(stream, "user_id", ["g"], target, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        if run == 0:
            first = sorted(map(tuple, read_cms(spark, target).collect()))
            _drop_last_commit(ckpt)
    batch = sorted(
        map(
            tuple,
            log_hist_sketch(
                df.withColumn("g", F.pmod(F.col("user_id"), F.lit(2))),
                "user_id",
                ["g"],
            ).collect(),
        )
    )
    assert first == batch and len(first) > 0
    assert sorted(map(tuple, read_cms(spark, target).collect())) == first


def test_hll_stream_merge_equals_batch_and_replays(spark, tmp_path):
    """Continuous HLL maintenance: the drained register sketch equals the
    one-shot batch sketch register-for-register, and a crash-window
    replay (newest checkpoint commit deleted) merges nothing twice."""
    import glob
    import os
    import shutil

    from usearch_spark.operators.sketch import hll_sketch
    from usearch_spark.streaming.sketches import hll_stream_merge, read_cms

    df = spark.range(600).select(
        F.col("id").alias("event_id"), F.pmod(F.col("id") * 7, F.lit(211)).alias("user_id")
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in (0, 1):
        tmp = str(tmp_path / f"t{i}")
        df.filter(F.pmod(F.col("event_id"), F.lit(2)) == i).coalesce(1).write.parquet(tmp)
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], f"{src}/batch{i}.parquet")

    target, ckpt = str(tmp_path / "sketch"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("g", F.pmod(F.col("user_id"), F.lit(2)))
    )
    for run in range(2):
        q = hll_stream_merge(stream, "user_id", ["g"], target, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        if run == 0:
            first = sorted(map(tuple, read_cms(spark, target).collect()))
            _drop_last_commit(ckpt)
    batch = sorted(
        map(
            tuple,
            hll_sketch(
                df.withColumn("g", F.pmod(F.col("user_id"), F.lit(2))), "user_id", ["g"]
            ).collect(),
        )
    )
    assert first == batch and len(first) > 0
    assert sorted(map(tuple, read_cms(spark, target).collect())) == first


def test_bloom_stream_merge_equals_batch_and_replays(spark, tmp_path):
    """Continuous Bloom maintenance: the drained bit set equals the
    one-shot batch filter bit-for-bit, and a crash-window replay merges
    nothing twice."""
    import glob
    import os
    import shutil

    from usearch_spark.operators.sketch import bloom_build
    from usearch_spark.streaming.sketches import bloom_stream_merge, read_cms

    df = spark.range(500).select((F.col("id") * 3 + 1).alias("key"))
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in (0, 1):
        tmp = str(tmp_path / f"t{i}")
        df.filter(F.pmod(F.col("key"), F.lit(2)) == i).coalesce(1).write.parquet(tmp)
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], f"{src}/batch{i}.parquet")

    target, ckpt = str(tmp_path / "bloom"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("key long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    for run in range(2):
        q = bloom_stream_merge(stream, "key", target, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        if run == 0:
            first = sorted(r["bit"] for r in read_cms(spark, target).collect())
            _drop_last_commit(ckpt)
    batch = sorted(r["bit"] for r in bloom_build(df, "key").collect())
    assert first == batch and len(first) > 0
    assert sorted(r["bit"] for r in read_cms(spark, target).collect()) == first


def test_kmv_stream_merge_equals_batch_and_replays(spark, tmp_path):
    """Continuous KMV maintenance: the drained bottom-k sketch equals the
    one-shot batch sketch row-for-row (min-k folding commutes), and a
    crash-window replay merges nothing twice."""
    import glob
    import os
    import shutil

    from usearch_spark.operators.sketch import kmv_sketch
    from usearch_spark.streaming.sketches import kmv_stream_merge, read_cms

    df = spark.range(600).select(
        F.col("id").alias("event_id"), F.pmod(F.col("id") * 7, F.lit(211)).alias("user_id")
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in (0, 1):
        tmp = str(tmp_path / f"t{i}")
        df.filter(F.pmod(F.col("event_id"), F.lit(2)) == i).coalesce(1).write.parquet(tmp)
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], f"{src}/batch{i}.parquet")

    target, ckpt = str(tmp_path / "sketch"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("g", F.pmod(F.col("user_id"), F.lit(2)))
    )
    for run in range(2):
        q = kmv_stream_merge(stream, "user_id", ["g"], 16, target, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        if run == 0:
            first = sorted(map(tuple, read_cms(spark, target).collect()))
            _drop_last_commit(ckpt)
    batch = sorted(
        map(
            tuple,
            kmv_sketch(
                df.withColumn("g", F.pmod(F.col("user_id"), F.lit(2))),
                "user_id",
                ["g"],
                k=16,
            ).collect(),
        )
    )
    assert first == batch and len(first) == 32  # 2 groups x k
    assert sorted(map(tuple, read_cms(spark, target).collect())) == first


def test_rollup_stream_merge_equals_batch_and_replays(spark, tmp_path):
    """Continuous additive rollup: the drained cell counts equal the
    one-shot groupBy over all delivered rows, and a crash-window replay
    adds nothing twice."""
    import glob
    import os
    import shutil

    from usearch_spark.streaming.sketches import read_cms, rollup_stream_merge

    df = spark.range(400).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("t"),
        (F.col("id") % 5).alias("d"),
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in (0, 1):
        tmp = str(tmp_path / f"t{i}")
        df.filter(F.pmod(F.col("event_id"), F.lit(2)) == i).drop(
            "event_id"
        ).coalesce(1).write.parquet(tmp)
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], f"{src}/batch{i}.parquet")

    target, ckpt = str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("t string, d long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    for run in range(2):
        q = rollup_stream_merge(stream, ["t", "d"], target, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        if run == 0:
            first = sorted(map(tuple, read_cms(spark, target).collect()))
            _drop_last_commit(ckpt)
    batch = sorted(
        map(tuple, df.groupBy("t", "d").agg(F.count(F.lit(1)).alias("n")).collect())
    )
    assert first == batch and len(first) == 15
    assert sorted(map(tuple, read_cms(spark, target).collect())) == first


def test_scd2_stream_merge_equals_batch_and_rewrites_only_touched(spark, tmp_path):
    """Streaming SCD2 with bucket copy-on-write: the drained dimension
    equals the one-shot batch build over all delivered changes (even
    with out-of-order per-key arrivals), a crash-window replay changes
    nothing, and an epoch that touches a subset of key buckets carries
    the rest forward BY REFERENCE (manifest points into the older
    version)."""
    import glob
    import json
    import os
    import shutil

    from pyspark.sql import Window as W

    from usearch_spark.streaming.scd2 import read_scd2, scd2_stream_merge

    # keys 0..9; key changes at times (key*10 + j); batch 1 carries the
    # EARLIER times of keys 0..4 (out-of-order arrival for those keys)
    rows = [(k, f"p{j}", (k * 10 + j) * 1_000_000, k * 100 + j)
            for k in range(10) for j in range(4)]
    df = spark.createDataFrame(rows, "key long, attr string, eff_us long, tb long")
    src = str(tmp_path / "src")
    os.makedirs(src)
    b0 = df.filter((F.col("key") >= 5) | (F.col("tb") % 100 >= 2))
    b1 = df.subtract(b0)
    for i, b in enumerate((b0, b1)):
        tmp = str(tmp_path / f"t{i}")
        b.coalesce(1).write.parquet(tmp)
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], f"{src}/batch{i}.parquet")

    target, ckpt = str(tmp_path / "dim"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("key long, attr string, eff_us long, tb long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    for run in range(2):
        q = scd2_stream_merge(stream, "key", "attr", "eff_us", "tb", target, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        if run == 0:
            first = sorted(
                map(tuple, read_scd2(spark, target)
                    .select("key", "attr", "eff_us", "next_us", "is_current")
                    .collect())
            )
            _drop_last_commit(ckpt)

    # one-shot batch build over ALL changes
    w = W.partitionBy("key").orderBy("eff_us", "tb")
    nxt = F.lead("eff_us").over(w)
    want = sorted(
        map(tuple, df.select(
            "key", "attr", "eff_us", nxt.alias("next_us"),
            F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
        ).collect())
    )
    assert first == want and len(first) == 40
    got2 = sorted(
        map(tuple, read_scd2(spark, target)
            .select("key", "attr", "eff_us", "next_us", "is_current").collect())
    )
    assert got2 == first  # crash-window replay merged nothing

    # copy-on-write: epoch 1 touched only keys 0..4's buckets — the
    # final manifest must still reference at least one v0 bucket dir
    from usearch_spark.streaming.scd2 import _read_current, _read_meta

    version, _, _ = _read_current(os.path.join(target, "_CURRENT"))
    manifest = _read_meta(target, version)
    assert any(rel.startswith("v0/") for rel in manifest.values())
    assert any(rel.startswith(f"v{version}/") for rel in manifest.values())


def test_legacy_pointer_is_lineage_mismatch(tmp_path):
    """A legacy single-line ``_CURRENT`` carries no lineage, so epoch ids
    are not comparable to it: the guard must treat it as a mismatch
    (raise, or upgrade via adopt) instead of falling through to the
    epoch-only comparison and silently dropping every epoch <= the
    legacy version — the exact data-loss mode the lineage field closed."""
    import os

    import pytest

    from usearch_spark.streaming.sketches import _guard_epoch, _read_current

    target = str(tmp_path / "sketch")
    os.makedirs(target)
    ptr = os.path.join(target, "_CURRENT")
    with open(ptr, "w") as fh:
        fh.write("v3\n")  # legacy format: version WAS the epoch id

    with pytest.raises(ValueError, match="lineage-unknown"):
        _guard_epoch(ptr, "newlineage", 0, target, "error")

    # adopt: the epoch is ADMITTED (not dropped by 0 <= 3) and versions
    # stay monotonic past the legacy counter
    adm = _guard_epoch(ptr, "newlineage", 0, target, "adopt")
    assert adm == (3, 4)
    assert _read_current(ptr) == (3, None, 3)


def test_replay_tuned_session_restores_conf_on_error(spark):
    """The tuned-replay context must restore the session's shuffle
    partitions even when the replay body raises."""
    from usearch_spark.streaming import replay_tuned_session

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with replay_tuned_session(spark, n_partitions=3):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
