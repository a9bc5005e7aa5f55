"""SSSP + coloring golden tests from the reference suites
(shortestpath/path_test.go:20-109, color/color_test.go:34-95)."""

from __future__ import annotations

import pytest

from usearch_spark.plans.coloring import color_graph
from usearch_spark.plans.shortest_path import build_path, shortest_paths

# the reference's 9-vertex undirected cost matrix (path_test.go:29-39)
COST_MATRIX = [
    [0, 4, 0, 0, 0, 0, 0, 8, 0],
    [4, 0, 8, 0, 0, 0, 0, 11, 0],
    [0, 8, 0, 7, 0, 4, 0, 0, 2],
    [0, 0, 7, 0, 9, 14, 0, 0, 0],
    [0, 0, 0, 9, 0, 10, 0, 0, 0],
    [0, 0, 4, 0, 10, 0, 2, 0, 0],
    [0, 0, 0, 14, 0, 2, 0, 1, 6],
    [8, 11, 0, 0, 0, 0, 1, 0, 7],
    [0, 0, 2, 0, 0, 0, 6, 7, 0],
]

EXPECTED = {
    "0": (["0"], 0),
    "1": (["0", "1"], 4),
    "2": (["0", "1", "2"], 12),
    "3": (["0", "1", "2", "3"], 19),
    "4": (["0", "7", "6", "5", "4"], 21),
    "5": (["0", "7", "6", "5"], 11),
    "6": (["0", "7", "6"], 9),
    "7": (["0", "7"], 8),
    "8": (["0", "1", "2", "8"], 14),
}


def test_sssp_reference_golden(spark):
    verts = [(str(i),) for i in range(9)]
    edges = [
        (str(i), str(j), c)
        for i, row in enumerate(COST_MATRIX)
        for j, c in enumerate(row)
        if c
    ]
    v = spark.createDataFrame(verts, "id string")
    e = spark.createDataFrame(edges, "src string, dst string, weight int")
    res = shortest_paths(v, e, "0")
    assert res.converged
    costs = {r["id"]: r["cost"] for r in res.state.collect()}
    for dest, (exp_path, exp_cost) in EXPECTED.items():
        assert costs[dest] == exp_cost, dest
        path, cost = build_path(res.state, "0", dest)
        assert cost == exp_cost
        # path costs are unique in this fixture except where the reference
        # asserts exact paths — tie-free graph, so paths must match exactly
        assert path == exp_path, (dest, path)


@pytest.mark.parametrize("strategy", ["collect", "lookups"])
def test_build_path_strategies(spark, strategy):
    """Golden paths must be identical through the driver-collect walk and
    the distributed point-lookup backwalk (the huge-graph path)."""
    verts = [(str(i),) for i in range(9)]
    edges = [
        (str(i), str(j), c)
        for i, row in enumerate(COST_MATRIX)
        for j, c in enumerate(row)
        if c
    ]
    v = spark.createDataFrame(verts, "id string")
    e = spark.createDataFrame(edges, "src string, dst string, weight int")
    res = shortest_paths(v, e, "0")
    for dest, (exp_path, exp_cost) in EXPECTED.items():
        assert build_path(res.state, "0", dest, strategy=strategy) == (exp_path, exp_cost)
    # unreachable dest answers ([], None) through both walks
    v2 = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    e2 = spark.createDataFrame([("a", "b", 1)], "src string, dst string, weight int")
    res2 = shortest_paths(v2, e2, "a")
    assert build_path(res2.state, "a", "c", strategy=strategy) == ([], None)


def test_sssp_unreachable(spark):
    v = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    e = spark.createDataFrame([("a", "b", 1)], "src string, dst string, weight int")
    res = shortest_paths(v, e, "a")
    costs = {r["id"]: r["cost"] for r in res.state.collect()}
    assert costs == {"a": 0, "b": 1, "c": None}
    assert build_path(res.state, "a", "c") == ([], None)


def _assert_proper_coloring(state_rows, edges, max_colors):
    colors = {r["id"]: r["color"] for r in state_rows}
    assert all(c >= 1 for c in colors.values())
    for s, d in edges:
        assert colors[s] != colors[d], (s, d)
    assert max(colors.values()) <= max_colors


def test_coloring_star_graph(spark):
    """K1,4 star: center conflicts with all leaves -> 2 colors suffice
    (color_test.go first fixture shape)."""
    edges = [("c", f"l{i}") for i in range(4)]
    v = spark.createDataFrame([("c",)] + [(f"l{i}",) for i in range(4)], "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    res = color_graph(v, e, seed=42)
    assert res.converged
    _assert_proper_coloring(res.state.collect(), edges, max_colors=2)


def test_coloring_cycle_and_isolated(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    v = spark.createDataFrame([(x,) for x in "abcd"] + [("iso",)], "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    res = color_graph(v, e, seed=7)
    rows = res.state.collect()
    _assert_proper_coloring(rows, edges, max_colors=3)  # even cycle: <= maxdeg+1
    assert {r["color"] for r in rows if r["id"] == "iso"} == {1}


def test_coloring_precolored(spark):
    """Pre-colored vertices keep their colors (color_test.go pre-colored
    case); neighbors must avoid them."""
    edges = [("a", "b"), ("b", "c")]
    v = spark.createDataFrame([("a", 2), ("b", 0), ("c", 0)], "id string, c int")
    e = spark.createDataFrame(edges, "src string, dst string")
    res = color_graph(v, e, seed=1, color_col="c")
    colors = {r["id"]: r["color"] for r in res.state.collect()}
    assert colors["a"] == 2
    assert colors["b"] != 2 and colors["b"] != colors["c"]


def test_coloring_random_graph_bounded(spark):
    import random

    rng = random.Random(42)
    n = 60
    edges = list({(str(a), str(b)) for _ in range(150) for a, b in [sorted(rng.sample(range(n), 2))]})
    v = spark.createDataFrame([(str(i),) for i in range(n)], "id string")
    e = spark.createDataFrame(edges, "src string, dst string")
    res = color_graph(v, e, seed=42)
    assert res.converged
    deg: dict[str, int] = {}
    for s, d in edges:
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    _assert_proper_coloring(res.state.collect(), edges, max_colors=max(deg.values()) + 1)


@pytest.mark.slow
def test_sssp_local_matches_distributed(spark):
    from usearch_spark.plans.shortest_path import shortest_paths

    v = spark.createDataFrame([(f"v{i}",) for i in range(12)], "id string")
    edges = [(f"v{i}", f"v{(i * 3 + 1) % 12}", (i % 4) + 1) for i in range(12)] + [
        ("v0", "v5", 1),
        ("v5", "v9", 2),
    ]
    e = spark.createDataFrame(edges, "src string, dst string, weight int")
    loc = shortest_paths(v, e, "v0", strategy="local")
    dist = shortest_paths(v, e, "v0", strategy="distributed")
    assert loc.steps == dist.steps and loc.converged == dist.converged
    rl = {r["id"]: (r["cost"], r["prev_in_path"]) for r in loc.state.collect()}
    rd = {r["id"]: (r["cost"], r["prev_in_path"]) for r in dist.state.collect()}
    assert rl == rd


@pytest.mark.slow
def test_coloring_local_matches_distributed(spark):
    from usearch_spark.plans.coloring import color_graph

    v = spark.createDataFrame([(f"v{i}",) for i in range(10)], "id string")
    e = spark.createDataFrame(
        [(f"v{i}", f"v{(i + 1) % 10}") for i in range(10)] + [("v0", "v5")],
        "src string, dst string",
    )
    loc = color_graph(v, e, seed=7, strategy="local")
    dist = color_graph(v, e, seed=7, strategy="distributed")
    assert loc.steps == dist.steps and loc.converged and dist.converged
    cl = {r["id"]: r["color"] for r in loc.state.collect()}
    cd = {r["id"]: r["color"] for r in dist.state.collect()}
    assert cl == cd


@pytest.mark.slow
def test_components_local_matches_distributed(spark):
    from usearch_spark.plans.pregel import connected_components

    v = spark.createDataFrame([(f"v{i}",) for i in range(9)], "id string")
    e = spark.createDataFrame(
        [("v0", "v1"), ("v1", "v2"), ("v3", "v4"), ("v5", "v6"), ("v6", "v7")],
        "src string, dst string",
    )
    loc = connected_components(v, e, strategy="local")
    dist = connected_components(v, e, strategy="distributed")
    assert loc.converged and dist.converged
    cl = {r["id"]: r["value"] for r in loc.state.collect()}
    cd = {r["id"]: r["value"] for r in dist.state.collect()}
    assert cl == cd
    assert cl["v8"] == "v8"  # isolated vertex is its own component


@pytest.mark.slow
def test_local_solvers_accept_numeric_ids(spark):
    """All four local solvers must work with non-string vertex ids (the
    output id column keeps the input type, and label/tie comparisons stay
    NUMERIC — a silent string coercion would order 10 before 9)."""
    from usearch_spark.plans.coloring import color_graph
    from usearch_spark.plans.pagerank import pagerank
    from usearch_spark.plans.pregel import connected_components
    from usearch_spark.plans.shortest_path import shortest_paths

    v = spark.createDataFrame([(i,) for i in range(12)], "id long")
    e = spark.createDataFrame(
        [(i, (i + 1) % 12, 1) for i in range(12)] + [(2, 10, 1)], "src long, dst long, weight int"
    )
    pr = pagerank(v, e, strategy="local")
    assert dict(pr.state.dtypes)["id"] == "bigint"
    assert abs(sum(r["score"] for r in pr.state.collect()) - 1.0) < 0.01

    # numeric min-label: component label must be the numeric min (0), and
    # id 10 must not beat id 9 lexicographically
    cc = connected_components(v, e, strategy="local")
    labels = {r["id"]: r["value"] for r in cc.state.collect()}
    assert set(labels.values()) == {0}

    sp = shortest_paths(v, e, 0, strategy="local")
    costs = {r["id"]: r["cost"] for r in sp.state.collect()}
    assert costs[0] == 0 and costs[3] == 3 and costs[10] == 3  # via the 2->10 shortcut

    col = color_graph(v, e, seed=3, strategy="local")
    colors = {r["id"]: r["color"] for r in col.state.collect()}
    assert all(c >= 1 for c in colors.values())
    for a, b, _ in [(i, (i + 1) % 12, 1) for i in range(12)] + [(2, 10, 1)]:
        assert colors[a] != colors[b]


def test_pagerank_unknown_endpoint_edges_parity(spark):
    """Edges pointing at ids absent from the vertex set: the local solve
    must mirror the distributed loop exactly (out-degree counts them,
    delivery drops them)."""
    from usearch_spark.plans.pagerank import pagerank

    v = spark.createDataFrame([("A",), ("B",), ("C",)], "id string")
    e = spark.createDataFrame(
        [("A", "B"), ("A", "X"), ("B", "C"), ("Y", "C")], "src string, dst string"
    )
    loc = pagerank(v, e, strategy="local", min_sad=0.0, max_steps=8)
    dist = pagerank(v, e, strategy="distributed", min_sad=0.0, max_steps=8)
    sl = {r["id"]: r["score"] for r in loc.state.collect()}
    sd = {r["id"]: r["score"] for r in dist.state.collect()}
    for k in sl:
        assert sl[k] == pytest.approx(sd[k], rel=1e-9, abs=1e-12), (k, sl, sd)


@pytest.mark.slow
def test_boruvka_mst_handcheck_and_kruskal_replay(spark):
    """Anchors: (1) textbook 5-vertex MST hand-check including a
    tie resolved by the (w, a, b) order; (2) a two-component graph
    yields a spanning FOREST; (3) a 40-vertex hash-weighted graph
    matches a pure-Python Kruskal under the same total order."""
    import hashlib

    from usearch_spark.plans.mst import boruvka_mst

    # (1) hand-check: vertices 1..5
    e1 = [
        (1, 2, 10), (2, 3, 10),  # tie: both picked (tree needs both)
        (1, 3, 40), (3, 4, 5), (4, 5, 30), (3, 5, 25),
    ]
    df1 = spark.createDataFrame(e1, "a int, b int, w long")
    got1 = {(r["a"], r["b"], r["weight"]) for r in boruvka_mst(df1).collect()}
    assert got1 == {(1, 2, 10), (2, 3, 10), (3, 4, 5), (3, 5, 25)}

    # (2) forest: two disjoint triangles
    e2 = [(1, 2, 1), (2, 3, 2), (1, 3, 3), (10, 11, 1), (11, 12, 2), (10, 12, 3)]
    df2 = spark.createDataFrame(e2, "a int, b int, w long")
    got2 = {(r["a"], r["b"], r["weight"]) for r in boruvka_mst(df2).collect()}
    assert got2 == {(1, 2, 1), (2, 3, 2), (10, 11, 1), (11, 12, 2)}

    # (3) random-ish connected graph vs python kruskal
    n = 40
    edges = []
    for i in range(n - 1):  # a path guarantees connectivity
        edges.append((i, i + 1, int(hashlib.md5(f"p{i}".encode()).hexdigest()[:4], 16)))
    for i in range(0, n, 3):
        j = (i * 7 + 11) % n
        if i != j:
            edges.append((min(i, j), max(i, j),
                          int(hashlib.md5(f"x{i}".encode()).hexdigest()[:4], 16)))
    df3 = spark.createDataFrame(edges, "a int, b int, w long")
    got3 = {(r["a"], r["b"], r["weight"]) for r in boruvka_mst(df3).collect()}

    # python kruskal, same canonicalization (parallel edges -> min w)
    canon = {}
    for a, b, w in edges:
        k = (min(a, b), max(a, b))
        canon[k] = min(canon.get(k, w), w)
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    want = set()
    for (a, b), w in sorted(canon.items(), key=lambda t: (t[1], t[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            want.add((a, b, w))
    assert got3 == want and len(got3) == n - 1


def test_eccentricity_two_sweep_on_weighted_path(spark):
    """On a weighted path graph the 2-sweep heuristic is EXACT: sweep 1
    from an interior start finds an endpoint, sweep 2 reports the true
    diameter (sum of edge weights); argmax ties break to the lowest
    id."""
    from pyspark.sql import functions as F

    from usearch_spark.plans.shortest_path import shortest_paths

    # path a - b - c - d with weights 2, 3, 4: diameter = 9 (a..d)
    und = [("a", "b", 2), ("b", "c", 3), ("c", "d", 4)]
    rows = und + [(b, a, w) for a, b, w in und]
    e = spark.createDataFrame(rows, "src string, dst string, weight long")
    v = spark.createDataFrame([(x,) for x in "abcd"], "id string")

    r1 = shortest_paths(v, e, "b", max_steps=6)
    far1 = (
        r1.state.filter(F.col("cost").isNotNull())
        .orderBy(F.col("cost").desc(), "id")
        .first()
    )
    assert far1["id"] == "d" and far1["cost"] == 7  # b->d = 3+4
    r2 = shortest_paths(v, e, far1["id"], max_steps=6)
    far2 = (
        r2.state.filter(F.col("cost").isNotNull())
        .orderBy(F.col("cost").desc(), "id")
        .first()
    )
    assert far2["id"] == "a" and far2["cost"] == 9  # the true diameter


def test_kcenters_greedy_covers_components_then_maximizes_spread(spark):
    """Greedy farthest-point on two disjoint weighted paths: center 1 is
    the seed, center 2 must come from the UNREACHED component
    (NULL = +inf outranks any finite distance), center 3 is the
    farthest vertex from both; the final covering radius is exact."""
    from pyspark.sql import functions as F

    from usearch_spark.plans.shortest_path import shortest_paths

    # component 1: a-b-c (weights 1, 1); component 2: x-y (weight 5)
    und = [("a", "b", 1), ("b", "c", 1), ("x", "y", 5)]
    rows = und + [(b, a, w) for a, b, w in und]
    e = spark.createDataFrame(rows, "src string, dst string, weight long")
    v = spark.createDataFrame([(s,) for s in "abcxy"], "id string")

    centers = ["a"]
    mind = shortest_paths(v, e, "a", max_steps=5).state.select(
        "id", F.col("cost").alias("mind")
    )
    for _ in range(2):
        nxt = mind.orderBy(
            F.col("mind").isNull().desc(), F.col("mind").desc(), "id"
        ).first()["id"]
        centers.append(nxt)
        r = shortest_paths(v, e, nxt, max_steps=5).state.select(
            "id", F.col("cost").alias("c2")
        )
        mind = mind.join(r, "id").select(
            "id", F.least("mind", "c2").alias("mind")
        )
    # center 2 = lowest-id unreachable vertex (x), center 3 = farthest
    # remaining (y at distance 5 from x vs c at distance 2 from a)
    assert centers == ["a", "x", "y"]
    got = {r["id"]: r["mind"] for r in mind.collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "x": 0, "y": 0}
    assert max(got.values()) == 2  # covering radius


def test_scc_chain_of_cycles_and_singletons(spark):
    """A condensation chain cycle{1,2,3} -> cycle{4,5} -> 6, plus an
    isolated vertex: each SCC labels to its min vertex; the peel needs
    multiple rounds (downstream SCCs see a smaller foreign F label in
    round 1) and still terminates with the canonical labeling."""
    from pyspark.sql import functions as F

    from usearch_spark.plans.scc import strongly_connected_components

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (5, 6)]
    v = spark.createDataFrame([(i,) for i in range(1, 8)], "id int")
    e = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["id"]: r["component"]
        for r in strongly_connected_components(v, e).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 7}


def test_scc_directionality_matters(spark):
    """The same edge set undirected would be one component; directed it
    splits: a -> b -> c with no back path is three singleton SCCs, and
    adding the closing arc c -> a fuses them."""
    from usearch_spark.plans.scc import strongly_connected_components

    v = spark.createDataFrame([(i,) for i in (10, 20, 30)], "id int")
    path = spark.createDataFrame([(10, 20), (20, 30)], "src int, dst int")
    got = {
        r["id"]: r["component"]
        for r in strongly_connected_components(v, path).collect()
    }
    assert got == {10: 10, 20: 20, 30: 30}
    cyc = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 10)], "src int, dst int"
    )
    got2 = {
        r["id"]: r["component"]
        for r in strongly_connected_components(v, cyc).collect()
    }
    assert got2 == {10: 10, 20: 10, 30: 10}


@pytest.mark.slow
def test_scc_two_mutual_blocks_sharing_a_bridge(spark):
    """Two 2-cycles joined by one-way bridges in both orders resolve to
    two SCCs regardless of which holds the global min."""
    from usearch_spark.plans.scc import strongly_connected_components

    # {5,6} mutual, {1,2} mutual, bridge 1->5 (min block upstream)
    v = spark.createDataFrame([(i,) for i in (1, 2, 5, 6)], "id int")
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (5, 6), (6, 5), (1, 5)], "src int, dst int"
    )
    got = {
        r["id"]: r["component"]
        for r in strongly_connected_components(v, e).collect()
    }
    assert got == {1: 1, 2: 1, 5: 5, 6: 5}
    # reverse the bridge: min block downstream -> same labeling
    e2 = spark.createDataFrame(
        [(1, 2), (2, 1), (5, 6), (6, 5), (5, 1)], "src int, dst int"
    )
    got2 = {
        r["id"]: r["component"]
        for r in strongly_connected_components(v, e2).collect()
    }
    assert got2 == {1: 1, 2: 1, 5: 5, 6: 5}
