"""Distributed minimum spanning forest: Borůvka rounds with star-
contraction merging.

The MapReduce-era MST recipe (Kiveris et al. 2014 use the same
star-contraction primitive this module reuses from pregel.py;
Borůvka 1926 is the round structure): every round, each component
selects its minimum-weight outgoing edge under a TOTAL order
(w, a, b) — the classic trick that makes the MST unique and every
algorithm (Borůvka here, Prim in the SQL oracle) agree on the same
edge set — the selected edges join the forest, and the touched
components merge.  Components at least halve per round, so O(log V)
rounds regardless of diameter.

Distributed shape per round: two label joins keyed on the edge
endpoints, one partial-aggregated min-struct per component, and a
star-contraction components call over the SELECTION graph only
(one node per surviving component, halving every round) — never a
global structure, no driver-side union-find.  At 100 TB the edge
relabel joins dominate and shuffle on endpoint ids; everything else
is component-dimension-sized.

Determinism: weights are exact integers and the per-component argmin
is a lexicographic struct-min over (w, a, b) — a unique total order,
so the forest is THE unique MST of that order and a sequential Prim
replay produces the identical edge set.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boruvka_mst(
    edges: DataFrame,
    src_col: str = "a",
    dst_col: str = "b",
    w_col: str = "w",
    max_rounds: int = 20,
    round_stats: list | None = None,
) -> DataFrame:
    """Minimum spanning forest of the undirected weighted graph.

    ``edges``: one row per undirected edge; endpoints are canonicalized
    (least/greatest) and parallel edges collapse to their minimum
    weight, so the input may be raw.  Returns (a, b, weight) — the
    unique MSF under the (w, a, b) total order.

    ``round_stats``: pass a list to collect per-round
    ``{"round", "active_components", "selected_edges"}`` dicts — the
    scale smoke asserts the O(log V) round bound and per-round
    component halving from these.  Costs one extra count job per round;
    leave None in production.
    """
    from usearch_spark.plans.pregel import connected_components_star

    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
            F.col(w_col).alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .dropDuplicates(["id"])
    )
    comp = verts.select("id", F.col("id").alias("comp")).localCheckpoint(eager=True)
    frames: list[DataFrame] = []
    for _ in range(max_rounds):
        ce = (
            e.join(
                comp.select(F.col("id").alias("a"), F.col("comp").alias("ca")), "a"
            )
            .join(
                comp.select(F.col("id").alias("b"), F.col("comp").alias("cb")), "b"
            )
            .filter(F.col("ca") != F.col("cb"))
            .localCheckpoint(eager=True)
        )
        if ce.isEmpty():
            break
        # per-component minimum outgoing edge under the (w, a, b) total
        # order — struct-min is lexicographic, so the argmin carries its
        # own tie-break; dedupe (both endpoints may pick the same edge)
        cand = ce.select(F.col("ca").alias("c"), F.struct("w", "a", "b", "ca", "cb").alias("e")).unionAll(
            ce.select(F.col("cb").alias("c"), F.struct("w", "a", "b", "ca", "cb").alias("e"))
        )
        sel = (
            cand.groupBy("c")
            .agg(F.min("e").alias("e"))
            .select("e.w", "e.a", "e.b", "e.ca", "e.cb")
            .dropDuplicates(["a", "b"])
            .localCheckpoint(eager=True)
        )
        frames.append(sel.select("a", "b", F.col("w").alias("weight")))
        if round_stats is not None:
            round_stats.append(
                {
                    "round": len(frames),
                    "active_components": comp.select("comp").distinct().count(),
                    "selected_edges": sel.count(),
                }
            )
        # merge the touched components: components of the SELECTION graph
        # (one node per component — halving each round), labels to minima
        merged = connected_components_star(
            comp.select(F.col("comp").alias("id")).dropDuplicates(["id"]),
            sel.select(F.col("ca").alias("src"), F.col("cb").alias("dst")),
        )
        comp = (
            comp.join(
                merged.select(F.col("id").alias("comp"), F.col("component").alias("nc")),
                "comp",
            )
            .select("id", F.col("nc").alias("comp"))
            .localCheckpoint(eager=True)
        )
    if not frames:
        return e.select("a", "b", F.col("w").alias("weight")).limit(0)
    return reduce(lambda x, y: x.unionByName(y), frames)
