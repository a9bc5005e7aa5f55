"""Fixed-iteration Lloyd k-means (operators/clustering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from usearch_spark.operators.clustering import kmeans_assign, kmeans_fixed, kmeans_summary
from usearch_spark.plans.lint import errors, lint_plan


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_two_blobs(spark):
    # ids 0/1 seed the two centroids; the rest sit clearly in one blob each
    rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0])]
    rows += [(i, [0.0 + (i % 3) * 0.1, 0.1]) for i in range(2, 20)]
    rows += [(i, [10.0 - (i % 3) * 0.1, 9.9]) for i in range(20, 40)]
    out = kmeans_fixed(_emb(spark, rows), k=2, iters=2)
    got = {r["vec_id"]: r["cid"] for r in out.collect()}
    assert all(got[i] == 0 for i in range(2, 20)) and got[0] == 0
    assert all(got[i] == 1 for i in range(20, 40)) and got[1] == 1
    assert errors(lint_plan(out)) == []


def test_kmeans_assign_tie_breaks_to_lower_cid(spark):
    emb = _emb(spark, [(7, [5.0])]).select("vec_id", F.col("embedding").alias("varr"))
    cents = spark.createDataFrame(
        [(2, [4.0]), (1, [6.0]), (3, [8.0])], "cid int, carr array<double>"
    )
    got = kmeans_assign(emb, cents).collect()
    # dist 1.0 to cid 1 and cid 2 — the lower cid wins
    assert got[0]["cid"] == 1 and got[0]["dist"] == 1.0


def test_kmeans_empty_cluster_vanishes(spark):
    # centroid seed 1 is an outlier nobody (not even itself, after the
    # first update pulls it away? no — it keeps itself) ... make cluster 1
    # lose all members by re-assignment: seeds 0,1 nearly coincide, so all
    # mass lands on cid 0 by the tie-break after one update
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0])] + [(i, [0.01, 0.0]) for i in range(2, 12)]
    out = kmeans_summary(kmeans_fixed(_emb(spark, rows), k=2, iters=2))
    rows_out = {r["cid"]: r["n_vecs"] for r in out.collect()}
    assert rows_out == {0: 12}


def test_kmeans_cids_dense_for_any_id_domain(spark):
    """Cluster ids are densified ranks of the init seeds, not raw vec_ids:
    1-based and sparse id domains still yield cids 0..k-1."""
    rows = [(1, [0.0, 0.0]), (500, [10.0, 10.0])]
    rows += [(1000 + i, [0.1, 0.0]) for i in range(8)]
    rows += [(2000 + i, [9.9, 10.0]) for i in range(8)]
    out = kmeans_fixed(_emb(spark, rows), k=2, iters=2)
    got = {r["vec_id"]: r["cid"] for r in out.collect()}
    assert set(got.values()) == {0, 1}
    assert got[1] == 0 and got[500] == 1  # rank order of the seeds
    assert all(got[1000 + i] == 0 for i in range(8))
    assert all(got[2000 + i] == 1 for i in range(8))
