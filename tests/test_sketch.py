"""Count-min / Bloom sketch invariants (operators/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from usearch_spark.operators.sketch import (
    bloom_build,
    bloom_maybe_contains,
    cms_estimate,
    count_min_sketch,
)


def _freqs(spark):
    # skewed key frequencies: key k appears (50 - k) times for k in 0..49
    rows = [(k,) for k in range(50) for _ in range(50 - k)]
    return spark.createDataFrame(rows, "k int")


def test_cms_never_underestimates_and_is_tight_here(spark):
    df = _freqs(spark)
    sk = count_min_sketch(df, "k", depth=4, prefix_len=2)
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(sk, df, "k", depth=4, prefix_len=2).collect()
    }
    truth = {k: 50 - k for k in range(50)}
    assert set(est) == set(truth)
    for k, t in truth.items():
        assert est[k] >= t, f"CMS underestimated key {k}"
    # 50 keys in 256 buckets x 4 seeds: collisions possible but the min
    # over seeds should be exact for the large majority
    exact = sum(1 for k in truth if est[k] == truth[k])
    assert exact >= 40


def test_cms_is_mergeable(spark):
    """Sketch(A ∪ B) == Sketch(A) + Sketch(B) cell-wise — the property
    that makes the sketch distributable."""
    df = _freqs(spark)
    a = df.filter(F.col("k") % 2 == 0)
    b = df.filter(F.col("k") % 2 == 1)
    merged = (
        count_min_sketch(a, "k")
        .unionByName(count_min_sketch(b, "k"))
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = count_min_sketch(df, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_sketch_size_bounded(spark):
    sk = count_min_sketch(_freqs(spark), "k", depth=4, prefix_len=2)
    assert sk.count() <= 4 * 256


def test_bloom_no_false_negatives(spark):
    members = spark.createDataFrame([(i,) for i in range(0, 200, 2)], "k int")
    probes = spark.createDataFrame([(i,) for i in range(200)], "k int")
    bloom = bloom_build(members, "k", hashes=3, prefix_len=3)
    flags = {r["k"]: r["maybe"] for r in bloom_maybe_contains(bloom, probes, "k").collect()}
    for i in range(0, 200, 2):
        assert flags[i] == 1, f"false negative for member {i}"
    # 100 members x 3 hashes in 4096 bits: false-positive rate ~0.04%,
    # so the non-member half should be nearly all 0
    fps = sum(flags[i] for i in range(1, 200, 2))
    assert fps <= 5
