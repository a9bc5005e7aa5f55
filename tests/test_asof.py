"""As-of join operator tests, verified against pandas merge_asof."""

from __future__ import annotations

import pandas as pd

from usearch_spark.operators.asof import asof_join


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [("u1", 10, "l1"), ("u1", 20, "l2"), ("u2", 15, "l3"), ("u3", 5, "l4")],
        "user string, t long, lbl string",
    )
    right = spark.createDataFrame(
        [("u1", 8, 1.0), ("u1", 15, 2.0), ("u1", 20, 3.0), ("u2", 30, 4.0)],
        "user string, rt long, v double",
    )
    out = {
        (r["user"], r["t"]): (r["v_asof"], r["rt_asof"])
        for r in asof_join(left, right, on="user", left_ts="t", right_ts="rt").collect()
    }
    assert out[("u1", 10)] == (1.0, 8)
    assert out[("u1", 20)] == (3.0, 20)  # exact tie takes the right row
    assert out[("u2", 15)] == (None, None)  # right exists but only later
    assert out[("u3", 5)] == (None, None)  # no right rows at all


def test_asof_matched_row_is_atomic(spark):
    """A NULL field in the matched right row stays NULL — value columns
    must never be stitched from different right rows."""
    left = spark.createDataFrame([("u", 20)], "k string, t long")
    right = spark.createDataFrame(
        [("u", 8, 1.0, "x8"), ("u", 15, None, "x15")], "k string, rt long, v double, tag string"
    )
    row = asof_join(left, right, on="k", left_ts="t", right_ts="rt").first()
    assert row["rt_asof"] == 15
    assert row["v_asof"] is None  # NOT 1.0 carried from ts=8
    assert row["tag_asof"] == "x15"


def test_asof_null_keys_never_match(spark):
    left = spark.createDataFrame([(None, 20), ("u", 20)], "k string, t long")
    right = spark.createDataFrame([(None, 10, 1.0), ("u", 10, 2.0)], "k string, rt long, v double")
    out = {r["k"]: r["v_asof"] for r in asof_join(left, right, on="k", left_ts="t", right_ts="rt").collect()}
    assert out[None] is None
    assert out["u"] == 2.0


def test_asof_rejects_column_collision(spark):
    import pytest as _pytest

    left = spark.createDataFrame([("u", 20, 9.0)], "k string, t long, v double")
    right = spark.createDataFrame([("u", 10, 1.0)], "k string, rt long, v double")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_ts="t", right_ts="rt")


def test_asof_join_matches_pandas(spark):
    import random

    rng = random.Random(7)
    lrows = [(f"k{rng.randrange(5)}", rng.randrange(1000)) for _ in range(300)]
    # unique (k, rt) on the right: as-of with duplicate right timestamps is
    # ambiguous in every engine
    rdict = {(f"k{rng.randrange(5)}", rng.randrange(1000)): rng.random() for _ in range(200)}
    rrows = [(k, rt, v) for (k, rt), v in rdict.items()]
    left = spark.createDataFrame(lrows, "k string, t long")
    right = spark.createDataFrame(rrows, "k string, rt long, v double")

    got = {
        (r["k"], r["t"]): r["v_asof"]
        for r in asof_join(left, right, on="k", left_ts="t", right_ts="rt").collect()
    }

    lp = pd.DataFrame(lrows, columns=["k", "t"]).sort_values("t").reset_index(drop=True)
    rp = pd.DataFrame(rrows, columns=["k", "rt", "v"]).sort_values("rt").reset_index(drop=True)
    merged = pd.merge_asof(lp, rp, left_on="t", right_on="rt", by="k", direction="backward")
    for row in merged.itertuples(index=False):
        expect = None if pd.isna(row.v) else row.v
        actual = got[(row.k, row.t)]
        if expect is None or actual is None:
            assert actual == expect, (row.k, row.t, actual, expect)
        else:
            assert abs(actual - expect) < 1e-12, (row.k, row.t, actual, expect)


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [("u1", 10, "l1"), ("u1", 20, "l2"), ("u2", 40, "l3")], "user string, t long, lbl string"
    )
    right = spark.createDataFrame(
        [("u1", 8, 1.0), ("u1", 15, 2.0), ("u1", 20, 3.0), ("u2", 30, 4.0)],
        "user string, rt long, v double",
    )
    out = {
        (r["user"], r["t"]): (r["v_asof"], r["rt_asof"])
        for r in asof_join(
            left, right, on="user", left_ts="t", right_ts="rt", direction="forward"
        ).collect()
    }
    assert out[("u1", 10)] == (2.0, 15)  # nearest at-or-after
    assert out[("u1", 20)] == (3.0, 20)  # exact tie takes the right row
    assert out[("u2", 40)] == (None, None)  # right exists but only earlier


def test_asof_tolerance(spark):
    left = spark.createDataFrame([("u", 100), ("u", 200)], "k string, t long")
    right = spark.createDataFrame([("u", 95, 1.0), ("u", 120, 2.0)], "k string, rt long, v double")
    out = {
        r["t"]: r["v_asof"]
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="rt", tolerance=10
        ).collect()
    }
    assert out[100] == 1.0  # distance 5 <= 10
    assert out[200] is None  # nearest backward match is 80 away -> voided


def test_asof_forward_matches_pandas(spark):
    import random

    rng = random.Random(11)
    lrows = [(f"k{rng.randrange(4)}", rng.randrange(500)) for _ in range(200)]
    rdict = {(f"k{rng.randrange(4)}", rng.randrange(500)): rng.random() for _ in range(150)}
    rrows = [(k, rt, v) for (k, rt), v in rdict.items()]
    left = spark.createDataFrame(lrows, "k string, t long")
    right = spark.createDataFrame(rrows, "k string, rt long, v double")
    got = {
        (r["k"], r["t"]): r["v_asof"]
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="rt", direction="forward"
        ).collect()
    }
    lp = pd.DataFrame(lrows, columns=["k", "t"]).sort_values("t").reset_index(drop=True)
    rp = pd.DataFrame(rrows, columns=["k", "rt", "v"]).sort_values("rt").reset_index(drop=True)
    merged = pd.merge_asof(lp, rp, left_on="t", right_on="rt", by="k", direction="forward")
    for row in merged.itertuples(index=False):
        expect = None if pd.isna(row.v) else row.v
        actual = got[(row.k, row.t)]
        if expect is None or actual is None:
            assert actual == expect, (row.k, row.t, actual, expect)
        else:
            assert abs(actual - expect) < 1e-12, (row.k, row.t, actual, expect)


def test_range_join_containment(spark):
    from usearch_spark.operators.asof import range_join

    left = spark.createDataFrame([(1, 5), (2, 15), (3, 25), (4, 95)], "id long, ts long")
    ivals = spark.createDataFrame(
        [("a", 0, 20), ("b", 10, 30), ("c", 200, 210)], "name string, lo long, hi long"
    )
    out = range_join(left, ivals, "ts", "lo", "hi", bin_width=10)
    got = sorted((r["id"], r["name"]) for r in out.collect())
    # ts=5 in a; ts=15 in a and b; ts=25 in b; ts=95 in none
    assert got == [(1, "a"), (2, "a"), (2, "b"), (3, "b")]


def test_range_join_no_duplicate_matches_across_bins(spark):
    from usearch_spark.operators.asof import range_join

    # interval spans many bins; each contained row still matches exactly once
    left = spark.createDataFrame([(i, i * 10) for i in range(10)], "id long, ts long")
    ivals = spark.createDataFrame([("wide", 0, 100)], "name string, lo long, hi long")
    out = range_join(left, ivals, "ts", "lo", "hi", bin_width=7)
    assert out.count() == 10
    assert out.dropDuplicates(["id", "name"]).count() == 10


def test_range_join_is_equi_join_not_cross_product(spark):
    from usearch_spark.operators.asof import range_join

    left = spark.createDataFrame([(1, 5)], "id long, ts long")
    ivals = spark.createDataFrame([("a", 0, 20)], "name string, lo long, hi long")
    plan = range_join(left, ivals, "ts", "lo", "hi", 10)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
