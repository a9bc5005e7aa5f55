"""Z-order layout operators (operators/layout.py): Morton-interleave
goldens and the locality guarantee the report exists to prove."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usearch_spark.operators.layout import zorder_key, zorder_locality_report


def test_zorder_key_golden(spark):
    """morton2(a=5, b=3): a bits land at even positions (1,0,1 -> 1+0+16),
    b bits at odd (1,1,0 -> 2+8) => 27; plus axis checks."""
    df = spark.createDataFrame([(5, 3), (0, 0), (7, 0), (0, 7)], "a long, b long")
    got = sorted(
        tuple(r)
        for r in df.select("a", "b", zorder_key("a", "b", bits=4).alias("z")).collect()
    )
    assert got == [(0, 0, 0), (0, 7, 42), (5, 3, 27), (7, 0, 21)]


def test_zorder_key_rejects_bad_bits():
    with pytest.raises(ValueError):
        zorder_key("a", "b", bits=0)


def test_locality_report_rectangles_are_narrow(spark):
    """With bucket_bits=8 the top 4 bits of EACH normalized dimension pin
    the bucket, so every bucket's per-dimension span is <= 1/16 of that
    dimension's full range (+1 quantization slack) — the property that
    makes min/max file skipping fire for both columns at once."""
    df = spark.range(10_000).select(
        (F.col("id") % 97).alias("x"), ((F.col("id") * 31) % 89).alias("y")
    )
    rep = zorder_locality_report(df, "x", "y", bits=16, bucket_bits=8).collect()
    assert sum(r["n_rows"] for r in rep) == 10_000
    assert len(rep) > 100  # the keyspace actually spreads
    for r in rep:
        assert r["a_max"] - r["a_min"] <= 96 / 16 + 1
        assert r["b_max"] - r["b_min"] <= 88 / 16 + 1
