"""Pregel wrapper tests: connected components as the vertex program, and
SSSP re-expressed through pregel to prove the harness is generic."""

from __future__ import annotations

from pyspark.sql import functions as F

from usearch_spark.plans.pregel import connected_components, pregel
import pytest


def test_connected_components(spark):
    v = spark.createDataFrame([(x,) for x in "abcdefg"], "id string")
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f")], "src string, dst string"
    )
    res = connected_components(v, e)
    assert res.converged
    comp = {r["id"]: r["value"] for r in res.state.collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["d"] == comp["e"] == "d"
    assert comp["f"] == "f" and comp["g"] == "g"


def test_sssp_via_pregel_matches_dedicated(spark):
    """The same 9-vertex golden graph through the generic pregel API."""
    from tests.test_graph_algos import COST_MATRIX, EXPECTED

    verts = [(str(i),) for i in range(9)]
    edges = [
        (str(i), str(j), c) for i, row in enumerate(COST_MATRIX) for j, c in enumerate(row) if c
    ]
    v = spark.createDataFrame(verts, "id string")
    e = spark.createDataFrame(edges, "src string, dst string, weight long")

    def send(state, ed):
        return (
            state.filter(F.col("value").isNotNull())
            .join(ed, state.id == ed.src, "inner")
            .select(F.col("dst").alias("id"), (F.col("value") + F.col("weight")).alias("msg"))
        )

    res = pregel(
        v,
        e,
        initial_value=F.when(F.col("id") == "0", F.lit(0).cast("long")),
        send_msg=send,
        agg_msg=F.min("msg"),
        apply_msg=lambda old, agg: F.least(F.coalesce(old, agg), agg),
        max_steps=50,
    )
    costs = {r["id"]: r["value"] for r in res.state.collect()}
    for dest, (_, exp_cost) in EXPECTED.items():
        assert costs[dest] == exp_cost, dest


def test_label_propagation_finds_cliques(spark):
    """Two cliques joined by one bridge edge: LPA labels each clique with
    its min vertex id after a few rounds."""
    from usearch_spark.plans.pregel import label_propagation

    clique1 = [("a", "b"), ("a", "c"), ("b", "c")]
    clique2 = [("x", "y"), ("x", "z"), ("y", "z")]
    bridge = [("c", "x")]
    e = spark.createDataFrame(clique1 + clique2 + bridge, "src string, dst string")
    v = spark.createDataFrame([(s,) for s in "abcxyz"], "id string")
    res = label_propagation(v, e, rounds=4)
    got = {r["id"]: r["value"] for r in res.state.collect()}
    # both cliques collapse to one label each; the bridge doesn't merge them
    assert len({got["a"], got["b"]}) == 1 or len({got["y"], got["z"]}) == 1
    assert {got["y"], got["z"]} != {got["a"], got["b"]}


def test_label_propagation_deterministic(spark):
    """Same input -> identical labeling on repeated runs (min-label ties)."""
    from usearch_spark.plans.pregel import label_propagation

    e = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("3", "4"), ("4", "1")], "src string, dst string"
    )
    v = spark.createDataFrame([(str(i),) for i in range(1, 5)], "id string")
    runs = [
        tuple(sorted((r["id"], r["value"]) for r in label_propagation(v, e, rounds=3).state.collect()))
        for _ in range(2)
    ]
    assert runs[0] == runs[1]


def test_components_empty_graph(spark):
    """Zero vertices (e.g. dedup-cluster resolution when no near-dup pairs
    exist at a given scale) must return an empty result, not crash."""
    from usearch_spark.plans.pregel import connected_components

    v = spark.createDataFrame([], "id string")
    e = spark.createDataFrame([], "src string, dst string")
    res = connected_components(v, e)
    assert res.state.count() == 0
    assert res.converged


def test_star_components_match_label_prop_random(spark):
    from pyspark.sql import functions as F

    from usearch_spark.plans.pregel import connected_components, connected_components_star

    n = 300
    e = spark.range(n).select(
        F.concat(F.lit("v"), F.col("id")).alias("src"),
        F.concat(F.lit("v"), F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n))).alias("dst"),
    ).filter(F.pmod(F.xxhash64("id", F.lit(9)), F.lit(10)) < 4)  # sparse: several components
    v = spark.range(n).select(F.concat(F.lit("v"), F.col("id")).alias("id"))
    ref = {r["id"]: r["value"] for r in connected_components(v, e).state.collect()}
    got = {r["id"]: r["component"] for r in connected_components_star(v, e).collect()}
    assert got == ref


@pytest.mark.slow
def test_star_components_path_graph_and_isolated(spark):
    """A 120-node path (the diameter worst case star-contraction exists
    for) plus an isolated vertex: one component rooted at the min id,
    isolated maps to itself."""
    from usearch_spark.plans.pregel import connected_components_star

    ids = [f"n{i:03d}" for i in range(120)]
    e = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(119)], "src string, dst string"
    )
    v = spark.createDataFrame([(x,) for x in ids + ["zz_alone"]], "id string")
    got = {r["id"]: r["component"] for r in connected_components_star(v, e, max_rounds=12).collect()}
    assert all(got[x] == "n000" for x in ids)
    assert got["zz_alone"] == "zz_alone"
