"""Misra-Gries heavy hitters (operators/sketch.mg_summary / mg_merge +
streaming/sketches.mg_stream_merge): the classic guarantee, merge
semantics, and crash-replay idempotency."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from usearch_spark.operators.sketch import mg_merge, mg_summary
from usearch_spark.streaming.sketches import mg_stream_merge, read_cms
from tests.test_streaming import _drop_last_commit


def _skewed(spark, n=5000):
    """Zipf-ish: key 0 gets ~half the rows, a long tail gets the rest."""
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.pmod(F.col("id") * 17, F.lit(400)) + 1)
        .alias("key")
    )


def test_mg_guarantee_and_bounded_size(spark):
    k = 10
    df = _skewed(spark)
    n = df.count()
    true = {r["key"]: r["cnt"] for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    est = {r["key"]: r["est"] for r in mg_summary(df, "key", k).collect()}
    assert len(est) <= k
    for key, e in est.items():
        assert true[key] - n / (k + 1) <= e <= true[key]  # under-estimate only
    # every key above the N/(k+1) frequency threshold survives
    for key, c in true.items():
        if c > n / (k + 1):
            assert key in est


def test_mg_merge_carries_combined_guarantee(spark):
    k = 10
    df = _skewed(spark)
    n = df.count()
    a = mg_summary(df.filter(F.col("key") % 2 == 0), "key", k)
    b = mg_summary(df.filter(F.col("key") % 2 == 1), "key", k)
    merged = {r["key"]: r["est"] for r in mg_merge(a, b, k).collect()}
    true = {r["key"]: r["cnt"] for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert len(merged) <= k
    for key, e in merged.items():
        assert e <= true[key]
    assert 0 in merged  # the dominant key always survives
    assert merged[0] >= true[0] - 2 * n / (k + 1)


def test_mg_stream_replay_idempotent(spark, tmp_path):
    df = _skewed(spark, 2000)
    src = str(tmp_path / "src")
    os.makedirs(src)
    for b in (0, 1):
        tmp = str(tmp_path / f"t{b}")
        df.filter(F.pmod(F.col("key"), F.lit(2)) == b).coalesce(1).write.parquet(tmp)
        dst = f"{src}/batch{b}.parquet"
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], dst)
        os.utime(dst, (1000000 + b * 100,) * 2)
    target, ckpt = str(tmp_path / "mg"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("key long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    for run in range(2):
        q = mg_stream_merge(stream, "key", 10, target, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(map(tuple, read_cms(spark, target).collect()))
        if run == 0:
            first = got
            _drop_last_commit(ckpt)  # crash window: last epoch re-delivered
    assert got == first
    want = sorted(
        map(
            tuple,
            mg_merge(
                mg_summary(df.filter(F.col("key") % 2 == 0), "key", 10),
                mg_summary(df.filter(F.col("key") % 2 == 1), "key", 10),
                10,
            ).collect(),
        )
    )
    assert first == want  # drained fold == batch merge
