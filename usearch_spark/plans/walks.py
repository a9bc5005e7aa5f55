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


# Below this many (deduped) starts, "auto" walks rank PER-STEP visited
# neighborhoods instead of the whole adjacency: the in-flight vertex set
# is <= |starts| at every step, so collecting it to the driver is a
# bounded collect (the centroid-list precedent) and the isin filter it
# feeds PUSHES DOWN to the edge scan — per-step cost proportional to the
# visited out-degree, never |E|.  Corpus-scale walk generation (millions
# of starts) keeps the one-ranked-adjacency shape.
PRUNED_MAX_STARTS = 1024


def _resolve_strategy(starts: DataFrame, id_col: str, strategy: str) -> str:
    """Resolve "auto" to "pruned"/"ranked" by start-row count.

    The size probe is a bounded limit+count (one eager job — "auto" and a
    forced "pruned" are no longer lazy until the first checkpoint); it
    counts the ROWS of ``starts`` as passed by the caller, so
    ``random_walks`` probes raw rows while ``node2vec_walks`` (which
    dedups before resolving) probes deduped rows — an over-count can only
    pick the scale-safe "ranked" path early, never the reverse.

    A FORCED "pruned" above PRUNED_MAX_STARTS raises: each step collects
    the distinct in-flight vertex set to the driver and feeds it to an
    ``isin`` literal, so an unbounded start set would blow driver memory /
    expression-tree size (the r15-verdict guard ask).
    """
    if strategy == "pruned":
        n = starts.select(id_col).limit(PRUNED_MAX_STARTS + 1).count()
        if n > PRUNED_MAX_STARTS:
            raise ValueError(
                f"strategy='pruned' needs <= {PRUNED_MAX_STARTS} start rows "
                f"(got > {PRUNED_MAX_STARTS}): the per-step visited-set "
                "collect/isin does not scale — use strategy='ranked' or 'auto'"
            )
        return strategy
    if strategy != "auto":
        return strategy
    n = starts.select(id_col).limit(PRUNED_MAX_STARTS + 1).count()
    return "pruned" if n <= PRUNED_MAX_STARTS else "ranked"


def _visited(state: DataFrame, col: str) -> list:
    """Driver-side distinct vertex list for the isin pushdown filter —
    bounded by |starts| (each walk occupies exactly one vertex)."""
    return [r[0] for r in state.select(col).distinct().collect()]


def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    steps: int = 4,
    id_col: str = "id",
    strategy: str = "auto",
) -> DataFrame:
    """Walk ``steps`` steps from every row of ``starts`` over the directed
    ``edges`` (src, dst).  Returns (start, step, node) with step 0 = the
    start itself; a walk that reaches a vertex with no out-edges ends
    there (no row for later steps).

    ``strategy``: "ranked" materializes the globally ranked adjacency once
    (the corpus-generation shape); "pruned" ranks only the visited
    neighborhoods each step (the few-seed shape — per-src row_number over a
    src-complete filtered set is bit-identical to the global ranking);
    "auto" picks by start count.
    """
    from pyspark.sql import Window

    if _resolve_strategy(starts, id_col, strategy) == "pruned":
        state = starts.select(F.col(id_col).alias("start"), F.col(id_col).alias("cur"))
        frames = [
            state.select("start", F.lit(0).alias("step"), F.col("cur").alias("node"))
        ]
        for t in range(1, steps + 1):
            curs = _visited(state, "cur")
            if not curs:
                break  # every walk hit a dead end: later frames are empty anyway
            w = Window.partitionBy("n_src")
            adj = (
                edges.filter(F.col("src").isin(curs))
                .select(F.col("src").alias("n_src"), F.col("dst").alias("n_dst"))
                .select(
                    "n_src",
                    "n_dst",
                    (F.row_number().over(w.orderBy("n_dst")) - 1).alias("idx"),
                    F.count(F.lit(1)).over(w).alias("deg"),
                )
            )
            state = (
                state.join(adj, state["cur"] == adj["n_src"])
                .filter(
                    F.col("idx")
                    == _choice(F.col("start"), t, F.col("cur"), F.col("deg"))
                )
                .select("start", F.col("n_dst").alias("cur"))
                .localCheckpoint(eager=True)
            )
            frames.append(
                state.select(
                    "start", F.lit(t).alias("step"), F.col("cur").alias("node")
                )
            )
        return reduce(lambda a, b: a.unionByName(b), frames)

    # materialize the ranked adjacency ONCE: every step joins against it,
    # and without the checkpoint Spark would lazily re-run the per-src
    # ranking window for each of the ``steps`` joins; degrees then derive
    # from the CHECKPOINT (count per src == max rank + 1), so the caller's
    # edge plan — often a scan + distinct itself — executes exactly once
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
    deg = nbr.groupBy(F.col("n_src").alias("d_src")).agg(
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
            # materialize each step: the returned union references every
            # step's state, and without the checkpoint step t's subtree
            # re-runs joins 1..t (O(steps^2) adjacency scans in one plan);
            # the state is |starts| rows, so the checkpoint is free
            .localCheckpoint(eager=True)
        )
        frames.append(
            state.select(
                "start", F.lit(t).alias("step"), F.col("cur").alias("node")
            )
        )
    return reduce(lambda a, b: a.unionByName(b), frames)


def node2vec_walks(
    edges: DataFrame,
    starts: DataFrame,
    steps: int = 4,
    w_return: int = 1,
    w_common: int = 4,
    w_far: int = 2,
    id_col: str = "id",
    edges_deduped: bool = False,
    strategy: str = "auto",
) -> DataFrame:
    """Second-order BIASED walks (node2vec, Grover & Leskovec KDD 2016):
    after a uniform first step, the walk at ``cur`` having arrived from
    ``prev`` weighs each neighbor x by

        w_return  if x == prev          (the 1/p "return" bias)
        w_common  if edge(prev, x)      (distance 1 from prev — BFS-ish)
        w_far     otherwise             (distance 2 — the 1/q DFS bias)

    with the weights as EXACT INTEGERS (w_return/w_common/w_far play
    1/p : 1 : 1/q, scaled to a common denominator) so the sampling
    decision is ``md5(start:t:cur) mod total_weight`` landing in a
    cumulative-weight interval — all integer arithmetic on the portable
    60-bit hash, replayable by a SQL oracle like :func:`random_walks`.

    Per step: state joins the adjacency on the current vertex, a LEFT
    join against the edge set on (prev, x) marks common neighbors, and
    a per-start cumulative-sum window (bounded by deg(cur) rows per
    walk) picks the interval containing the hash draw.  Two
    co-partitioned shuffles per step, |starts| walk rows in flight —
    graph-size-independent, no collect.
    """
    from pyspark.sql import Window

    # multigraph input would break the interval sampler: duplicate
    # (src,dst) rows get tied cumulative-sum intervals, the draw matches
    # both, and the walk forks — dedupe edges (and starts, whose
    # duplicates would mix candidate sets in the per-start window).
    # ``edges_deduped=True`` skips the edge dedup shuffle when the caller
    # proves uniqueness (e.g. a symmetrized distinct bipartite edge set
    # whose two directions use disjoint id alphabets).
    starts = starts.select(id_col).dropDuplicates([id_col])
    if _resolve_strategy(starts, id_col, strategy) == "pruned":
        # few-seed shape: rank/weigh only the visited neighborhoods each
        # step (dedup of the filtered set == filter of the deduped set —
        # both key on (src, dst) and the filter keys on src alone), so
        # per-step cost follows the frontier out-degree, never |E|
        def _adj(vals: list, a: str, b: str) -> DataFrame:
            out = edges.filter(F.col("src").isin(vals)).select(
                F.col("src").alias(a), F.col("dst").alias(b)
            )
            return out if edges_deduped else out.dropDuplicates([a, b])

        return _node2vec_pruned(
            _adj, starts, steps, w_return, w_common, w_far, id_col
        )
    nbr = edges.select(F.col("src").alias("n_src"), F.col("dst").alias("n_dst"))
    if not edges_deduped:
        nbr = nbr.dropDuplicates(["n_src", "n_dst"])
    # ONE materialization: the ranked adjacency is the only corpus-sized
    # artifact — degrees and the common-neighbor side (e2) both derive
    # from the checkpoint, so the caller's edge plan and the ranking
    # window run exactly once
    ranked = nbr.select(
        "n_src",
        "n_dst",
        (
            F.row_number().over(Window.partitionBy("n_src").orderBy("n_dst"))
            - 1
        ).alias("idx"),
    ).localCheckpoint(eager=True)
    nbr = ranked.select("n_src", "n_dst")
    deg = ranked.groupBy(F.col("n_src").alias("d_src")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    state = starts.select(
        F.col(id_col).alias("start"), F.col(id_col).alias("cur")
    )
    frames = [
        state.select("start", F.lit(0).alias("step"), F.col("cur").alias("node"))
    ]
    # step 1: uniform (no previous vertex yet — the paper's convention)
    state = (
        state.join(deg, state["cur"] == deg["d_src"])
        .withColumn("_pick", _choice(F.col("start"), 1, F.col("cur"), F.col("deg")))
        .join(
            ranked,
            (F.col("cur") == F.col("n_src")) & (F.col("_pick") == F.col("idx")),
        )
        .select("start", F.col("cur").alias("prev"), F.col("n_dst").alias("cur"))
        # per-step materialization: see random_walks — the union of frames
        # otherwise re-runs the whole chain per step (O(steps^2) scans)
        .localCheckpoint(eager=True)
    )
    frames.append(
        state.select("start", F.lit(1).alias("step"), F.col("cur").alias("node"))
    )
    e2 = nbr.select(F.col("n_src").alias("c_src"), F.col("n_dst").alias("c_dst"))
    for t in range(2, steps + 1):
        cand = (
            state.join(nbr, state["cur"] == nbr["n_src"])
            .join(
                e2,
                (F.col("prev") == F.col("c_src"))
                & (F.col("n_dst") == F.col("c_dst")),
                "left",
            )
            .withColumn(
                "w",
                F.when(F.col("n_dst") == F.col("prev"), F.lit(w_return))
                .when(F.col("c_dst").isNotNull(), F.lit(w_common))
                .otherwise(F.lit(w_far)),
            )
        )
        wcum = Window.partitionBy("start").orderBy("n_dst")
        # full-frame ordered spec, not a bare partitionBy: the plan lint
        # can't tell an unordered-partitioned Window (2 printed lists)
        # from a global one; the ordered full frame sums identically
        wall = wcum.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        picked = (
            cand.withColumn("cum", F.sum("w").over(wcum))
            .withColumn("tot", F.sum("w").over(wall))
            .withColumn(
                "r",
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":", F.col("start"), F.lit(str(t)), F.col("cur")
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("tot"),
            )
            .filter(
                (F.col("r") >= F.col("cum") - F.col("w")) & (F.col("r") < F.col("cum"))
            )
        )
        state = picked.select(
            "start", F.col("cur").alias("prev"), F.col("n_dst").alias("cur")
        ).localCheckpoint(eager=True)
        frames.append(
            state.select("start", F.lit(t).alias("step"), F.col("cur").alias("node"))
        )
    return reduce(lambda a, b: a.unionByName(b), frames)


def _node2vec_pruned(
    adj_of, starts: DataFrame, steps: int, w_return: int, w_common: int,
    w_far: int, id_col: str,
) -> DataFrame:
    """node2vec_walks' per-step-pruned body: ``adj_of(vertices, a, b)``
    returns the (deduped) out-adjacency of just those vertices.  The
    per-start weight/cumsum windows and the md5 interval pick are the
    ranked path's expressions verbatim, so the two strategies are
    bit-identical (pinned by the parity test)."""
    from pyspark.sql import Window

    state = starts.select(F.col(id_col).alias("start"), F.col(id_col).alias("cur"))
    frames = [
        state.select("start", F.lit(0).alias("step"), F.col("cur").alias("node"))
    ]
    # step 1: uniform over cur's neighbors (no previous vertex yet)
    curs = _visited(state, "cur")
    if curs:
        w = Window.partitionBy("n_src")
        ranked = adj_of(curs, "n_src", "n_dst").select(
            "n_src",
            "n_dst",
            (F.row_number().over(w.orderBy("n_dst")) - 1).alias("idx"),
            F.count(F.lit(1)).over(w).alias("deg"),
        )
        state = (
            state.join(ranked, state["cur"] == ranked["n_src"])
            .filter(
                F.col("idx") == _choice(F.col("start"), 1, F.col("cur"), F.col("deg"))
            )
            .select("start", F.col("cur").alias("prev"), F.col("n_dst").alias("cur"))
            .localCheckpoint(eager=True)
        )
        frames.append(
            state.select("start", F.lit(1).alias("step"), F.col("cur").alias("node"))
        )
        for t in range(2, steps + 1):
            curs = _visited(state, "cur")
            if not curs:
                break
            nbr_t = adj_of(curs, "n_src", "n_dst")
            e2_t = adj_of(_visited(state, "prev"), "c_src", "c_dst")
            cand = (
                state.join(nbr_t, state["cur"] == nbr_t["n_src"])
                .join(
                    e2_t,
                    (F.col("prev") == F.col("c_src"))
                    & (F.col("n_dst") == F.col("c_dst")),
                    "left",
                )
                .withColumn(
                    "w",
                    F.when(F.col("n_dst") == F.col("prev"), F.lit(w_return))
                    .when(F.col("c_dst").isNotNull(), F.lit(w_common))
                    .otherwise(F.lit(w_far)),
                )
            )
            wcum = Window.partitionBy("start").orderBy("n_dst")
            wall = wcum.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
            picked = (
                cand.withColumn("cum", F.sum("w").over(wcum))
                .withColumn("tot", F.sum("w").over(wall))
                .withColumn(
                    "r",
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":", F.col("start"), F.lit(str(t)), F.col("cur")
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.col("tot"),
                )
                .filter(
                    (F.col("r") >= F.col("cum") - F.col("w"))
                    & (F.col("r") < F.col("cum"))
                )
            )
            state = picked.select(
                "start", F.col("cur").alias("prev"), F.col("n_dst").alias("cur")
            ).localCheckpoint(eager=True)
            frames.append(
                state.select(
                    "start", F.lit(t).alias("step"), F.col("cur").alias("node")
                )
            )
    return reduce(lambda a, b: a.unionByName(b), frames)
