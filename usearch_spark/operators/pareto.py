"""Pareto frontier (skyline) operator — 2-D minimization.

The skyline query ("parts that no other part beats on BOTH price and
size") is the classic can't-express-as-one-aggregation operator: the naive
form is a quadratic NOT EXISTS self-join.  The distributed shape used here
is the standard two-phase divide-and-conquer:

  phase 1: repartitionByRange on the x axis, each partition computes its
           LOCAL frontier in one pass over its sorted rows (mapInPandas,
           O(n log n) per partition);
  phase 2: the union of local frontiers — already tiny, bounded by
           K x |global frontier| in the worst case — runs the identical
           pass in a single task.

Correctness does not depend on the range boundaries: a globally
non-dominated row is non-dominated in its own partition, so phase 1 never
drops a frontier row; phase 2 then applies the exact global rule.  At
100 TB the quadratic join never happens — the big data is touched once,
sorted within partitions.

Domination semantics (ties): a dominates b iff a.x <= b.x AND a.y <= b.y
AND they differ in at least one coordinate.  Exact duplicates of a
frontier point all survive (neither dominates the other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _frontier_pass(x: str, y: str):
    """One sorted sweep: per x group keep rows at the group's min y, and
    keep the group only while its min y strictly improves on every
    strictly-smaller-x group's min y."""

    def fn(pdfs):
        import pandas as pd

        parts = list(pdfs)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        pdf = pdf.sort_values([x, y], kind="mergesort")
        keep_chunks = []
        best = None  # strict prefix min of y over smaller x values
        for _, grp in pdf.groupby(x, sort=True):
            gmin = grp[y].iloc[0]
            if best is None or gmin < best:
                keep_chunks.append(grp[grp[y] == gmin])
                best = gmin if best is None else min(best, gmin)
        if keep_chunks:
            yield pd.concat(keep_chunks, ignore_index=True)

    return fn

def pareto_frontier(
    df: DataFrame,
    x: str,
    y: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rows not dominated on (``x``, ``y``) under 2-D minimization.
    Null coordinates are excluded (domination is undefined for them).
    Schema is preserved."""
    clean = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull())
    k = num_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    schema = clean.schema
    local = clean.repartitionByRange(k, F.col(x), F.col(y)).mapInPandas(
        _frontier_pass(x, y), schema=schema
    )
    # phase 2: exact rule over the (small) union of local frontiers
    return local.coalesce(1).mapInPandas(_frontier_pass(x, y), schema=schema)


def pareto_frontier_kd(
    df: DataFrame,
    cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """k-dimensional skyline (minimization on every column of ``cols``):
    same two-phase shape as :func:`pareto_frontier` — per-partition local
    frontier, then the exact rule on the (small) union — but the local
    pass is a vectorized dominance check instead of a sorted sweep (a
    single sweep only works in 2-D).  Per-partition cost is
    O(n_part · |local frontier|) with numpy row-vs-matrix comparisons;
    phase 2 re-runs the identical check on the union.

    Dominance: a ≼ b iff a ≤ b on every column and a < b on at least one;
    exact duplicates of a frontier point all survive.  Rows with any null
    coordinate are excluded.

    Comparisons run on each column's ORIGINAL dtype (no float64
    collapse): int64/decimal coordinates beyond 2^53 keep their exact
    ordering, so high-precision keys can't be wrongly judged dominated.
    """
    cond = None
    for c in cols:
        cnd = F.col(c).isNotNull()
        cond = cnd if cond is None else (cond & cnd)
    clean = df.filter(cond)
    k = num_partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    schema = clean.schema

    def fr(pdfs):
        import numpy as np
        import pandas as pd

        parts = list(pdfs)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        # per-column arrays in their native dtypes — exact comparisons
        arrs = [pdf[c].to_numpy() for c in cols]
        # sort lexicographically: a dominator always precedes its victims,
        # so one forward pass against the kept set is complete
        order = np.lexsort(tuple(arrs[j] for j in reversed(range(len(cols)))))
        arrs = [a[order] for a in arrs]
        n_rows = len(pdf)
        kept_rows: list[int] = []
        for r in range(n_rows):
            if kept_rows:
                le = np.ones(len(kept_rows), dtype=bool)
                lt = np.zeros(len(kept_rows), dtype=bool)
                for a in arrs:
                    ka = a[kept_rows]
                    le &= ka <= a[r]
                    lt |= ka < a[r]
                if (le & lt).any():
                    continue
            kept_rows.append(r)
        yield pdf.iloc[order[kept_rows]]

    local = clean.repartitionByRange(k, *[F.col(c) for c in cols]).mapInPandas(
        fr, schema=schema
    )
    return local.coalesce(1).mapInPandas(fr, schema=schema)
