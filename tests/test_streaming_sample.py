"""Streaming weighted reservoir (streaming/sample.py): merge-equals-batch,
crash-window replay, and the lineage guard."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from usearch_spark.operators.corpus import weighted_sample
from usearch_spark.streaming.sample import read_reservoir, weighted_sample_stream
from tests.test_streaming import _drop_last_commit

pytestmark = pytest.mark.slow  # streaming replays: multi-micro-batch runs dominate the suite clock



def _write_batches(spark, tmp_path, n=400):
    df = spark.range(1, n + 1).select(
        F.col("id").alias("key"), (F.pmod(F.col("id") * 13, F.lit(37)) + 1).alias("w")
    )
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for b in (0, 1):
        tmp = str(tmp_path / f"t{b}")
        df.filter(F.pmod(F.col("key"), F.lit(2)) == b).coalesce(1).write.parquet(tmp)
        dst = f"{src}/batch{b}.parquet"
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], dst)
        os.utime(dst, (1000000 + b * 100,) * 2)
    return df, src


def _stream(spark, src):
    return (
        spark.readStream.schema("key long, w long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def _drain(spark, src, target, ckpt):
    q = weighted_sample_stream(_stream(spark, src), "key", "w", 25, target, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_reservoir_merge_equals_batch_and_replays(spark, tmp_path):
    df, src = _write_batches(spark, tmp_path)
    target, ckpt = str(tmp_path / "res"), str(tmp_path / "ckpt")
    _drain(spark, src, target, ckpt)
    got = sorted(map(tuple, read_reservoir(spark, target).collect()))
    want = sorted(map(tuple, weighted_sample(df, "key", "w", 25).collect()))
    assert got == want and len(got) == 25  # min-k of min-ks == one-shot

    _drop_last_commit(ckpt)  # crash window: last epoch re-delivered
    _drain(spark, src, target, ckpt)
    assert sorted(map(tuple, read_reservoir(spark, target).collect())) == got


def test_reservoir_lineage_mismatch_raises(spark, tmp_path):
    _, src = _write_batches(spark, tmp_path)
    target = str(tmp_path / "res")
    _drain(spark, src, target, str(tmp_path / "ck_a"))
    first = sorted(map(tuple, read_reservoir(spark, target).collect()))
    q = weighted_sample_stream(
        _stream(spark, src), "key", "w", 25, target, str(tmp_path / "ck_b")
    )
    try:
        with pytest.raises(Exception, match="lineage mismatch"):
            q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(map(tuple, read_reservoir(spark, target).collect())) == first
