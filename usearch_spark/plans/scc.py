"""Distributed strongly connected components: forward/backward
min-label peeling (the FB algorithm family — Fleischer, Hendrickson &
Pinar 2000; distributed min-label form as in Slota, Rajamanickam &
Madduri 2014).

Each peel round propagates TWO min-labels to fixpoint over the
still-active subgraph — forward (``F(v)`` = the smallest vertex that
can reach v) and backward (``B(v)`` = the smallest vertex v can
reach) — fused into ONE message join per step over the doubled edge
set (forward edges carry F, reversed edges carry B), so a step is one
join + one partial-aggregated min, not two of each.  Vertices with
``F(v) == B(v) == r`` are exactly the SCC of ``r`` (r reaches v and v
reaches r, and no mutual partner of v can be smaller than a vertex
that reaches v), so they are emitted with scc_id = r and removed; the
rest go around again.  Every round extracts at least the SCC of the
globally minimal active vertex — and, in practice, every SCC that is
a local minimum of the condensation — so rounds are bounded by the
condensation's chain depth, not |V|.

Distributed shape: a propagation step is one edge join + one
partial-aggregated min per vertex (the connected-components
primitive, directed); the peel bookkeeping is two semi-joins.  No
driver-side graph state — only per-round counts for the fixpoint /
empty tests.

Determinism: labels are vertex ids and every operation is an integer
min — the result is the canonical min-vertex SCC labeling, which a
transitive-closure oracle reproduces exactly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fb_labels_fixpoint(
    vertices: DataFrame, edges: DataFrame, max_steps: int
) -> DataFrame:
    """Propagate forward and backward min vertex-id labels to fixpoint
    in one fused pass: the doubled edge set tags each edge with the
    label it carries (original direction moves F, reversed moves B).
    Returns (id, flab, blab)."""
    e2 = edges.select("src", "dst", F.lit(True).alias("_fwd")).unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            F.lit(False).alias("_fwd"),
        )
    ).localCheckpoint(eager=True)
    lab = vertices.select(
        "id", F.col("id").alias("flab"), F.col("id").alias("blab")
    ).localCheckpoint(eager=True)
    for _ in range(max_steps):
        msgs = lab.join(e2, lab["id"] == e2["src"]).select(
            F.col("dst").alias("id"),
            F.when(F.col("_fwd"), F.col("flab")).alias("flab"),
            F.when(~F.col("_fwd"), F.col("blab")).alias("blab"),
        )
        new = (
            lab.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("flab").alias("flab"), F.min("blab").alias("blab"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(
                lab.select(
                    "id",
                    F.col("flab").alias("_of"),
                    F.col("blab").alias("_ob"),
                ),
                "id",
            )
            .filter((F.col("flab") < F.col("_of")) | (F.col("blab") < F.col("_ob")))
            .count()
        )
        lab = new
        if changed == 0:
            break
    return lab


def strongly_connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_peels: int = 25,
    max_steps: int = 50,
) -> DataFrame:
    """SCC labeling of the directed graph.

    ``vertices``: (id); ``edges``: (src, dst).  Returns (id, component)
    with component = the smallest vertex id in the SCC — the canonical
    labeling a closure oracle replays.
    """
    act_v = vertices.select("id").dropDuplicates(["id"]).localCheckpoint(eager=True)
    act_e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    frames: list[DataFrame] = []
    for _ in range(max_peels):
        # TRIM (the FB-Trim step): a vertex with no in-edge or no
        # out-edge in the ACTIVE subgraph cannot sit on a cycle there —
        # it is its own SCC.  Iterating to fixpoint strips the one-way
        # periphery (often most of the graph) before paying for any
        # label propagation; each removal can expose new trimmables.
        while not act_v.isEmpty():
            srcs = act_e.select(F.col("src").alias("id")).dropDuplicates(["id"])
            dsts = act_e.select(F.col("dst").alias("id")).dropDuplicates(["id"])
            core = (
                act_v.join(srcs, "id", "left_semi")
                .join(dsts, "id", "left_semi")
                .localCheckpoint(eager=True)
            )
            trivial = act_v.join(core, "id", "left_anti").localCheckpoint(
                eager=True
            )
            if trivial.isEmpty():
                break
            frames.append(trivial.select("id", F.col("id").alias("component")))
            act_v = core
            act_e = (
                act_e.join(act_v.withColumnRenamed("id", "src"), "src")
                .join(act_v.withColumnRenamed("id", "dst"), "dst")
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
        if act_v.isEmpty():
            break
        j = _fb_labels_fixpoint(act_v, act_e, max_steps)
        done = j.filter(F.col("flab") == F.col("blab")).select(
            "id", F.col("flab").alias("component")
        )
        frames.append(done.localCheckpoint(eager=True))
        act_v = (
            j.filter(F.col("flab") != F.col("blab"))
            .select("id")
            .localCheckpoint(eager=True)
        )
        act_e = (
            act_e.join(act_v.withColumnRenamed("id", "src"), "src")
            .join(act_v.withColumnRenamed("id", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    if not frames:
        return vertices.select("id", F.col("id").alias("component")).limit(0)
    return reduce(lambda x, y: x.unionByName(y), frames)
