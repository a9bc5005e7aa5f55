"""HITS hubs & authorities tests (usearch_spark/plans/hits.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usearch_spark.plans.hits import hits


def test_hits_bipartite_separates_hubs_and_authorities(spark):
    # bipartite u{1,2} -> p{1,2,3}: sources are pure hubs (authority 0),
    # targets pure authorities (hub 0)
    e = spark.createDataFrame(
        [("u1", "p1"), ("u1", "p2"), ("u2", "p2"), ("u2", "p3")],
        "src string, dst string",
    )
    v = spark.createDataFrame([(s,) for s in ["u1", "u2", "p1", "p2", "p3"]], "id string")
    res = hits(v, e, rounds=5)
    got = {r["id"]: (r["hub"], r["authority"]) for r in res.state.collect()}
    for u in ("u1", "u2"):
        assert got[u][0] > 0 and got[u][1] == pytest.approx(0.0, abs=1e-12)
    for p in ("p1", "p2", "p3"):
        assert got[p][0] == pytest.approx(0.0, abs=1e-12) and got[p][1] > 0
    # p2 has two in-links -> highest authority
    assert got["p2"][1] > got["p1"][1] and got["p2"][1] > got["p3"][1]
    # L1 normalization: each vector sums to 1
    assert sum(h for h, _ in got.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(a for _, a in got.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_local_matches_distributed(spark):
    import random

    rng = random.Random(5)
    n = 120
    v = spark.createDataFrame([(str(i),) for i in range(n)], "id string")
    e = spark.createDataFrame(
        [(str(i), str(rng.randrange(n))) for i in range(n) for _ in range(rng.randint(1, 3))],
        "src string, dst string",
    )
    sl = {r["id"]: (r["hub"], r["authority"])
          for r in hits(v, e, rounds=4, strategy="local").state.collect()}
    sd = {r["id"]: (r["hub"], r["authority"])
          for r in hits(v, e, rounds=4, strategy="distributed").state.collect()}
    assert set(sl) == set(sd)
    for k in sl:
        assert sl[k][0] == pytest.approx(sd[k][0], rel=1e-9, abs=1e-12)
        assert sl[k][1] == pytest.approx(sd[k][1], rel=1e-9, abs=1e-12)
