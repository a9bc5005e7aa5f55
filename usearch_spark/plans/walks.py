"""Deterministic random walks over the edge set — the corpus generator
for graph-embedding training (DeepWalk, Perozzi et al. KDD 2014;
node2vec's p=q=1 case): each start vertex emits a fixed-length walk
whose every step is a pseudo-random neighbor choice.

Randomness is a HASH CHAIN, not an RNG: at step t the walk at vertex v
(started from s) picks neighbor index md5(s:t:v) mod deg(v) over the
dst-ordered adjacency ranking.  Every choice is exact integer
arithmetic on engine-portable md5 prefixes, so retries/speculation
cannot fork a walk and a SQL oracle replays every trajectory
bit-for-bit — the same reproducibility contract as the repo's
weighted sampling and LSH planes.

Scale shape: the adjacency ranking (row_number per src over dst — a
PER-GROUP window, computed once and reusable across walk runs) and the
degree table are corpus-sized one-offs; each step is then ONE join of
the walk state against the ranked adjacency, co-partitioned on the
current vertex — |starts| rows in flight regardless of graph size,
``steps`` joins total.  Dead ends drop out via the inner join (walks
simply end), matching the oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _choice(start, t: int, cur, deg):
    """Neighbor index at step t: 60-bit md5 integer of "start:t:cur",
    mod degree — the portable hash (Spark conv == DuckDB 0x-cast)."""
    h = F.md5(F.concat_ws(":", start, F.lit(str(t)), cur))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % deg


def random_walks(
    edges: DataFrame, starts: DataFrame, steps: int = 4, id_col: str = "id"
) -> DataFrame:
    """Walk ``steps`` steps from every row of ``starts`` over the directed
    ``edges`` (src, dst).  Returns (start, step, node) with step 0 = the
    start itself; a walk that reaches a vertex with no out-edges ends
    there (no row for later steps)."""
    from pyspark.sql import Window

    # materialize the ranked adjacency + degrees ONCE: every step joins
    # against them, and without the checkpoint Spark would lazily re-run
    # the per-src ranking window for each of the ``steps`` joins
    nbr = edges.select(
        F.col("src").alias("n_src"),
        F.col("dst").alias("n_dst"),
        (
            F.row_number().over(
                Window.partitionBy("src").orderBy("dst")
            )
            - 1
        ).alias("idx"),
    ).localCheckpoint(eager=True)
    deg = edges.groupBy(F.col("src").alias("d_src")).agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint(eager=True)
    state = starts.select(
        F.col(id_col).alias("start"), F.col(id_col).alias("cur")
    )
    frames = [
        state.select("start", F.lit(0).alias("step"), F.col("cur").alias("node"))
    ]
    for t in range(1, steps + 1):
        state = (
            state.join(deg, state["cur"] == deg["d_src"])
            .withColumn(
                "_pick", _choice(F.col("start"), t, F.col("cur"), F.col("deg"))
            )
            .join(
                nbr,
                (F.col("cur") == nbr["n_src"]) & (F.col("_pick") == nbr["idx"]),
            )
            .select("start", F.col("n_dst").alias("cur"))
        )
        frames.append(
            state.select(
                "start", F.lit(t).alias("step"), F.col("cur").alias("node")
            )
        )
    return reduce(lambda a, b: a.unionByName(b), frames)
