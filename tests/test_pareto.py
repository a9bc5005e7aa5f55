"""Pareto frontier operator (operators/pareto.py) vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from usearch_spark.operators.pareto import pareto_frontier


def _brute(rows):
    out = []
    for a in rows:
        dominated = any(
            d[0] <= a[0] and d[1] <= a[1] and (d[0] < a[0] or d[1] < a[1]) for d in rows
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def test_pareto_matches_brute_force_with_ties(spark):
    rows = [
        (1.0, 9), (2.0, 7), (2.0, 7), (2.0, 8),  # duplicate frontier point + dominated same-x
        (3.0, 7),  # same y as cheaper point -> dominated
        (4.0, 5), (5.0, 5),  # second dominated (same y, higher x)
        (6.0, 1), (9.0, 1), (9.0, 0),
    ]
    df = spark.createDataFrame(rows, "x double, y int")
    got = sorted(map(tuple, pareto_frontier(df, "x", "y", num_partitions=3).collect()))
    assert got == _brute(rows)
    assert (1.0, 9) in got and got.count((2.0, 7)) == 2
    assert (3.0, 7) not in got and (5.0, 5) not in got


def test_pareto_random_graph_matches_brute(spark):
    df = spark.range(500).select(
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).cast("double") / 10).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100)).cast("int").alias("y"),
    )
    rows = [tuple(r) for r in df.collect()]
    got = sorted(map(tuple, pareto_frontier(df, "x", "y", num_partitions=8).collect()))
    assert got == _brute(rows)


def test_pareto_excludes_null_coordinates(spark):
    df = spark.createDataFrame([(1.0, 1), (None, 0), (2.0, None)], "x double, y int")
    got = [tuple(r) for r in pareto_frontier(df, "x", "y").collect()]
    assert got == [(1.0, 1)]


def test_pareto_kd_matches_brute_force(spark):
    from usearch_spark.operators.pareto import pareto_frontier_kd

    rows = []
    for i in range(1, 400):
        rows.append((
            1 + float((i * 31) % 97), 1 + float((i * 17) % 89), 1 + float((i * 7) % 83),
        ))
    rows += [(0.5, 0.5, 0.5), (0.5, 0.5, 0.5)]  # duplicate frontier point
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = sorted(map(tuple, pareto_frontier_kd(df, ["x", "y", "z"], num_partitions=5).collect()))

    def dominated(a, all_rows):
        return any(
            all(d[k] <= a[k] for k in range(3)) and any(d[k] < a[k] for k in range(3))
            for d in all_rows
        )

    expect = sorted(r for r in rows if not dominated(r, rows))
    assert got == expect
    assert got.count((0.5, 0.5, 0.5)) == 2


def test_kd_frontier_exact_beyond_double_precision(spark):
    """Regression for the float64-collapse bug: int64 coordinates beyond
    2^53 that would alias as doubles must still be compared exactly —
    the point dominated by 1 unit is dropped, its non-dominated twin
    kept; result equals the O(n^2) brute force."""
    from usearch_spark.operators.pareto import pareto_frontier_kd

    base = 2**60
    rows = [
        (1, base, base),
        (2, base + 1, base),          # dominated by 1 (worse x, equal y)
        (3, base, base + 1),          # dominated by 1
        (4, base - 1, base + 7),      # incomparable with 1
        (5, base + 7, base - 1),      # incomparable with 1
        (6, base + 1, base + 1),      # dominated
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = sorted(r["id"] for r in pareto_frontier_kd(df, ["x", "y"]).collect())

    def dominated(a, b):  # b dominates a
        return all(bv <= av for av, bv in zip(a, b)) and any(bv < av for av, bv in zip(a, b))

    brute = sorted(
        i for i, *p in rows
        if not any(dominated(p, q) for j, *q in rows if j != i)
    )
    assert got == brute == [1, 4, 5]
