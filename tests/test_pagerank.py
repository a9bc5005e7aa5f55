"""PageRank golden tests — the exact graphs and expected scores from the
reference suite (pagerank/calculator_test.go:35-139): engine-independent
numeric truths, per-vertex tolerance ±0.01, scores sum to 1 ±0.001.

Plus the convergence/scale gate (calculator_test.go:197-251): a 100k-vertex
random graph (seed 42, <=7 out-links each) must converge without lineage
blowup — run here at 20k vertices for test-time sanity; bench.py exercises
the full 100k.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F
from usearch_spark.plans.pagerank import pagerank

CASES = [
    # (vertices, edges, expected)
    (
        ["A", "B", "C"],
        [("A", "B"), ("B", "C"), ("C", "A")],
        {"A": 1 / 3, "B": 1 / 3, "C": 1 / 3},
    ),
    (
        ["A", "B", "C"],
        [("A", "B"), ("B", "C"), ("C", "A"), ("C", "B")],
        {"A": 0.2145, "B": 0.3937, "C": 0.3879},
    ),
    (
        ["A", "B", "C"],
        [("A", "B"), ("B", "A"), ("B", "C"), ("C", "B")],
        {"A": 0.2569, "B": 0.4860, "C": 0.2569},
    ),
    (
        # dead-end: C's score redistributed via residual
        ["A", "B", "C"],
        [("A", "B"), ("B", "C")],
        {"A": 0.1842, "B": 0.3411, "C": 0.4745},
    ),
]


@pytest.mark.parametrize("vertices,edges,expected", CASES)
def test_pagerank_goldens(spark, vertices, edges, expected):
    v = spark.createDataFrame([(x,) for x in vertices], "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    res = pagerank(v, e)
    assert res.converged
    scores = {r["id"]: r["score"] for r in res.state.collect()}
    assert abs(sum(scores.values()) - 1.0) <= 0.001
    for k, exp in expected.items():
        assert scores[k] == pytest.approx(exp, abs=0.01), (k, scores)


def test_pagerank_self_edges_dropped(spark):
    v = spark.createDataFrame([("A",), ("B",), ("C",)], "id string")
    e = spark.createDataFrame(
        [("A", "A"), ("A", "B"), ("B", "C"), ("C", "A")], "src string, dst string"
    )
    res = pagerank(v, e)
    scores = {r["id"]: r["score"] for r in res.state.collect()}
    # with the self-edge dropped this is the uniform cycle
    for k in "ABC":
        assert scores[k] == pytest.approx(1 / 3, abs=0.01)


def test_pagerank_empty_graph(spark):
    v = spark.createDataFrame([], "id string")
    e = spark.createDataFrame([], "src string, dst string")
    res = pagerank(v, e)
    assert res.state.count() == 0


def test_pagerank_converges_at_scale_sample(spark):
    """Scaled-down replica of the reference's 100k-vertex convergence test
    (seed 42, up to 7 out-links/vertex)."""
    n = 20_000
    rng = random.Random(42)
    verts = [(str(i),) for i in range(n)]
    edges = []
    for i in range(n):
        for _ in range(rng.randint(1, 7)):
            edges.append((str(i), str(rng.randrange(n))))
    v = spark.createDataFrame(verts, "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    res = pagerank(v, e, max_steps=60)
    assert res.converged, f"no convergence in {res.steps} steps (SAD history {[h['sad'] for h in res.history]})"
    total = res.state.groupBy().sum("score").first()[0]
    assert total == pytest.approx(1.0, abs=0.01)


@pytest.mark.parametrize("vertices,edges,expected", CASES[:2])
def test_pagerank_distributed_strategy_goldens(spark, vertices, edges, expected):
    """The distributed superstep loop (the 100-TB path) must agree with the
    goldens even when the auto-switch would have picked the local solve."""
    v = spark.createDataFrame([(x,) for x in vertices], "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    res = pagerank(v, e, strategy="distributed")
    assert res.converged
    scores = {r["id"]: r["score"] for r in res.state.collect()}
    for k, exp in expected.items():
        assert scores[k] == pytest.approx(exp, abs=0.01), (k, scores)


def test_pagerank_local_matches_distributed(spark):
    """Both strategies run the identical recurrence: same steps, same SAD
    trajectory, per-vertex scores equal to float tolerance."""
    rng = random.Random(7)
    n = 300
    verts = [(str(i),) for i in range(n)]
    edges = [(str(i), str(rng.randrange(n))) for i in range(n) for _ in range(rng.randint(0, 4))]
    v = spark.createDataFrame(verts, "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    res_l = pagerank(v, e, strategy="local")
    res_d = pagerank(v, e, strategy="distributed")
    assert res_l.steps == res_d.steps
    assert res_l.converged == res_d.converged
    sl = {r["id"]: r["score"] for r in res_l.state.collect()}
    sd = {r["id"]: r["score"] for r in res_d.state.collect()}
    assert set(sl) == set(sd)
    for k in sl:
        assert sl[k] == pytest.approx(sd[k], rel=1e-9, abs=1e-12)


def test_ppr_mass_concentrates_near_sources(spark):
    """PPR from one source: total mass == 1, the source outranks everything
    it points at, and vertices unreachable from the source get score 0
    beyond their teleport share (which is 0 for non-sources)."""
    from usearch_spark.plans.pagerank import personalized_pagerank

    # a -> b -> c, plus an isolated island x -> y
    v = spark.createDataFrame([(s,) for s in "abcxy"], "id string")
    e = spark.createDataFrame([("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string")
    res = personalized_pagerank(v, e, ["a"], min_sad=0.0, max_steps=30)
    s = {r["id"]: r["score"] for r in res.state.collect()}
    assert sum(s.values()) == pytest.approx(1.0, abs=1e-9)
    assert s["a"] > s["b"] > s["c"] > 0
    assert s["x"] == pytest.approx(0.0, abs=1e-12)
    assert s["y"] == pytest.approx(0.0, abs=1e-12)


def test_ppr_uniform_sources_recover_global_pagerank(spark):
    """Teleporting to ALL vertices uniformly must reproduce plain PageRank
    (same fixpoint, up to float tolerance)."""
    import random as _random

    from usearch_spark.plans.pagerank import personalized_pagerank

    rng = _random.Random(11)
    n = 60
    v = spark.createDataFrame([(str(i),) for i in range(n)], "id string")
    e = spark.createDataFrame(
        [(str(i), str(rng.randrange(n))) for i in range(n) for _ in range(2)],
        "src string, dst string",
    )
    plain = {r["id"]: r["score"] for r in pagerank(v, e, min_sad=0.0, max_steps=25).state.collect()}
    ppr = {
        r["id"]: r["score"]
        for r in personalized_pagerank(
            v, e, [str(i) for i in range(n)], min_sad=0.0, max_steps=25
        ).state.collect()
    }
    for k in plain:
        assert ppr[k] == pytest.approx(plain[k], rel=1e-9, abs=1e-12)


@pytest.mark.slow
def test_ppr_local_matches_distributed(spark):
    import random as _random

    from usearch_spark.plans.pagerank import personalized_pagerank

    rng = _random.Random(13)
    n = 200
    v = spark.createDataFrame([(str(i),) for i in range(n)], "id string")
    e = spark.createDataFrame(
        [(str(i), str(rng.randrange(n))) for i in range(n) for _ in range(rng.randint(0, 3))],
        "src string, dst string",
    )
    srcs = ["0", "1", "2"]
    res_l = personalized_pagerank(v, e, srcs, strategy="local")
    res_d = personalized_pagerank(v, e, srcs, strategy="distributed")
    assert res_l.steps == res_d.steps
    sl = {r["id"]: r["score"] for r in res_l.state.collect()}
    sd = {r["id"]: r["score"] for r in res_d.state.collect()}
    for k in sl:
        assert sl[k] == pytest.approx(sd[k], rel=1e-9, abs=1e-12)


def test_weighted_pagerank_favors_heavy_edges(spark):
    """b receives a weight-9 edge, c a weight-1 edge from the same source:
    b must outrank c; uniform weights must reduce to plain pagerank."""
    from usearch_spark.plans.pagerank import weighted_pagerank

    v = spark.createDataFrame([(s,) for s in "abc"], "id string")
    e = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, weight double",
    )
    s = {r["id"]: r["score"] for r in weighted_pagerank(v, e, min_sad=0.0, max_steps=20).state.collect()}
    assert s["b"] > s["c"]
    assert sum(s.values()) == pytest.approx(1.0, abs=1e-9)

    uni = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, weight double",
    )
    plain_e = uni.select("src", "dst")
    sw = {r["id"]: r["score"] for r in weighted_pagerank(v, uni, min_sad=0.0, max_steps=15).state.collect()}
    sp = {r["id"]: r["score"] for r in pagerank(v, plain_e, min_sad=0.0, max_steps=15).state.collect()}
    for k in sw:
        assert sw[k] == pytest.approx(sp[k], rel=1e-9, abs=1e-12)


def test_weighted_pagerank_local_matches_distributed(spark):
    import random as _random

    from usearch_spark.plans.pagerank import weighted_pagerank

    rng = _random.Random(17)
    n = 150
    v = spark.createDataFrame([(str(i),) for i in range(n)], "id string")
    e = spark.createDataFrame(
        [
            (str(i), str(rng.randrange(n)), float(rng.randint(1, 5)))
            for i in range(n)
            for _ in range(rng.randint(0, 3))
        ],
        "src string, dst string, weight double",
    )
    rl = weighted_pagerank(v, e, strategy="local")
    rd = weighted_pagerank(v, e, strategy="distributed")
    assert rl.steps == rd.steps
    sl = {r["id"]: r["score"] for r in rl.state.collect()}
    sd = {r["id"]: r["score"] for r in rd.state.collect()}
    for k in sl:
        assert sl[k] == pytest.approx(sd[k], rel=1e-9, abs=1e-12)


def _rand_graph(spark, n=400, seed=7):
    v = spark.range(n).select(F.col("id").cast("string"))
    deg = F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(5)) + F.lit(1)
    e = (
        spark.range(n)
        .select(F.col("id"), F.explode(F.sequence(F.lit(1), deg)).alias("k"))
        .select(
            F.col("id").cast("string").alias("src"),
            F.pmod(F.xxhash64(F.col("id"), F.col("k"), F.lit(seed)), F.lit(n))
            .cast("string")
            .alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return v, e


@pytest.mark.parametrize("strategy", ["local", "distributed"])
def test_pagerank_warm_start_converges_fast_same_fixpoint(spark, strategy):
    """The incremental hourly-pass shape: seeding from the previous pass's
    converged ranks must (a) converge in a small fraction of the cold
    step count and (b) land on the same fixpoint."""
    v, e = _rand_graph(spark)
    cold = pagerank(v, e, strategy=strategy, edges_deduped=True)
    assert cold.converged and cold.steps >= 4

    warm = pagerank(
        v, e, strategy=strategy, edges_deduped=True, init_scores=cold.state
    )
    assert warm.converged and warm.steps <= 2

    c = {r["id"]: r["score"] for r in cold.state.collect()}
    w = {r["id"]: r["score"] for r in warm.state.collect()}
    assert max(abs(c[k] - w[k]) for k in c) < 1e-3
    assert abs(sum(w.values()) - 1.0) < 1e-6


def test_pagerank_warm_start_graph_churn(spark):
    """Warm start on a CHANGED graph: new vertices join at 1/N, the vector
    renormalizes, and the result matches a cold run on the new graph."""
    v, e = _rand_graph(spark, n=300)
    prev = pagerank(v, e, strategy="local", edges_deduped=True)

    spark2 = v.sparkSession
    v2 = spark2.range(330).select(F.col("id").cast("string"))
    extra = spark2.range(300, 330).select(
        F.col("id").cast("string").alias("src"), F.lit("0").alias("dst")
    )
    e2 = e.unionByName(extra)
    warm = pagerank(v2, e2, strategy="local", edges_deduped=True, init_scores=prev.state)
    cold = pagerank(v2, e2, strategy="local", edges_deduped=True)
    cw = {r["id"]: r["score"] for r in cold.state.collect()}
    ww = {r["id"]: r["score"] for r in warm.state.collect()}
    assert set(cw) == set(ww)
    assert max(abs(cw[k] - ww[k]) for k in cw) < 2e-3
    assert abs(sum(ww.values()) - 1.0) < 1e-6


@pytest.mark.slow
def test_ppr_push_converges_to_power_iteration_fixpoint(spark):
    """Forward push (eps=0) and the dense power iteration solve the SAME
    stationary equation: with enough rounds both approximate the PPR
    fixpoint, so their scores agree to the push's residual bound."""
    from usearch_spark.plans.pagerank import personalized_pagerank, ppr_forward_push

    v, e = _rand_graph(spark, n=60)
    dense = personalized_pagerank(
        v, e, ["1"], min_sad=0.0, max_steps=80, edges_deduped=True, strategy="local"
    )
    ds = {r["id"]: r["score"] for r in dense.state.collect()}
    push = ppr_forward_push(e, ["1"], rounds=80, edges_deduped=True)
    ps = {r["id"]: r["score"] for r in push.collect()}
    resid = {r["id"]: r["residual"] for r in push.collect()}
    assert sum(resid.values()) < 1e-5  # 0.85^80
    for k, s in ps.items():
        assert abs(s - ds[k]) < 1e-4, (k, s, ds[k])
    # untouched vertices carry (numerically) zero mass in the dense solve
    for k, s in ds.items():
        if k not in ps:
            assert s < 1e-4


def test_ppr_push_support_bounded_by_k_ball(spark):
    """The sparse state never leaves the seed's k-hop out-ball: on a
    directed path 0->1->...->9, k push rounds touch exactly vertices
    0..k (the frontier bound the docstring promises)."""
    from usearch_spark.plans.pagerank import ppr_forward_push

    e = spark.createDataFrame(
        [(str(i), str(i + 1)) for i in range(9)], "src string, dst string"
    )
    out = ppr_forward_push(e, ["0"], rounds=3, edges_deduped=True)
    assert {r["id"] for r in out.collect()} == {"0", "1", "2", "3"}


def test_ppr_push_eps_threshold_prunes_frontier(spark):
    """With eps large enough, sub-threshold residuals are never pushed:
    mass conservation still holds (p + r sums to 1) but the support
    stays smaller than the push-all run."""
    from usearch_spark.plans.pagerank import ppr_forward_push

    e = spark.createDataFrame(
        [(str(i), str(i + 1)) for i in range(9)], "src string, dst string"
    )
    # r at hop k is 0.85^k (od = 1 everywhere): eps = 0.5 stops the push
    # after hop 4 (0.85^5 = 0.44 < 0.5), stranding the tail as residual
    rows = ppr_forward_push(e, ["0"], rounds=9, eps=0.5, edges_deduped=True).collect()
    all_rows = ppr_forward_push(e, ["0"], rounds=9, edges_deduped=True).collect()
    assert len(rows) < len(all_rows)
    assert abs(sum(r["score"] + r["residual"] for r in rows) - 1.0) < 1e-6
    assert abs(sum(r["score"] + r["residual"] for r in all_rows) - 1.0) < 1e-6


def test_ppr_push_local_matches_distributed(spark):
    """The r15 local-solve switch: the single-task numpy push and the
    per-superstep DataFrame loop produce the SAME (id, score, residual)
    rows after the shared 8dp closing round — support set exactly equal,
    values to the summation-order tolerance the oracle already absorbs."""
    from usearch_spark.plans.pagerank import ppr_forward_push

    v, e = _rand_graph(spark, n=50)
    # a couple of dead ends exercise the seed dead-mass credit
    loc = ppr_forward_push(e, ["1"], rounds=10, edges_deduped=True, strategy="local")
    dist = ppr_forward_push(
        e, ["1"], rounds=10, edges_deduped=True, strategy="distributed"
    )
    lr = {r["id"]: (r["score"], r["residual"]) for r in loc.collect()}
    dr = {r["id"]: (r["score"], r["residual"]) for r in dist.collect()}
    assert set(lr) == set(dr)
    for k in lr:
        assert abs(lr[k][0] - dr[k][0]) < 1e-7, (k, lr[k], dr[k])
        assert abs(lr[k][1] - dr[k][1]) < 1e-7, (k, lr[k], dr[k])


def test_ppr_push_local_eps_pruning_parity(spark):
    """eps > 0 pruning decisions match between the strategies on the
    directed path (exact powers of 0.85 — no boundary ambiguity)."""
    from usearch_spark.plans.pagerank import ppr_forward_push

    e = spark.createDataFrame(
        [(str(i), str(i + 1)) for i in range(9)], "src string, dst string"
    )
    loc = ppr_forward_push(e, ["0"], rounds=9, eps=0.5, strategy="local").collect()
    dist = ppr_forward_push(e, ["0"], rounds=9, eps=0.5, strategy="distributed").collect()
    assert {r["id"] for r in loc} == {r["id"] for r in dist}
    lm = {r["id"]: (r["score"], r["residual"]) for r in loc}
    dm = {r["id"]: (r["score"], r["residual"]) for r in dist}
    assert lm == dm
