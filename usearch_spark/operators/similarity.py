"""Similarity search over embedding columns (array<float>).

  - ``cosine_topk``: brute-force exact top-k — the baseline.  The dot
    product runs JVM-side (zip_with + aggregate, whole-stage codegen);
    top-k is TakeOrderedAndProject, so nothing but k rows reaches the
    driver.  At 100 TB this is one scan, embarrassingly parallel.
  - ``lsh_bucketed_topk``: random-hyperplane LSH (signs of md5-derived
    pseudo-random projections) — candidates share a signature prefix, so
    the query probes |buckets| << |rows|.  The scale path when the corpus
    no longer fits a full scan per query.
  - ``embedding_near_pairs``: all-pairs cosine > threshold via LSH-bucketed
    self-join (embedding near-duplicate detection for dedup).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (computed in double)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id=None,
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to ``query_vec``."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = embeddings.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine"))
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def mips_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id=None,
) -> DataFrame:
    """Exact brute-force MAXIMUM INNER PRODUCT top-k: ranks by the raw
    dot product, NOT the normalized cosine — the retrieval metric of
    recommender/two-tower models, where a vector's norm carries learned
    popularity and must not be divided away.  Map-side expression +
    TakeOrderedAndProject, same scale shape as cosine_topk.

    For sub-linear MIPS at scale, the norm-augmentation reduction
    (Bachrach et al. RecSys 2014) maps each corpus vector x to
    [x, sqrt(M^2 − |x|^2)] (M = max norm) and the query to [q, 0]:
    cosine order on the augmented vectors equals inner-product order on
    the originals, so every ANN index in this module (LSH / IVF /
    IVF-PQ) serves MIPS unchanged — pinned by pytest
    (test_similarity.test_mips_reduction_preserves_order)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qd = F.transform(q, lambda x: x.cast("double"))
    out = embeddings.select(
        F.col(id_col),
        _dot(F.transform(F.col(vec_col), lambda x: x.cast("double")), qd).alias("dot"),
    )
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.col("dot").desc(), F.col(id_col)).limit(k)


def _plane_components(plane: int, dim: int) -> list[int]:
    """Deterministic pseudo-random hyperplane as INTEGERS: component
    (plane, d) = top 16 bits of md5("{plane}_{d}"), centered to
    [-32768, 32768) — reproducible anywhere, no RNG state.  Integer
    components (with the integer vector quantization below) make the
    sign decision EXACT int64 arithmetic: no float summation order can
    flip a boundary bit, so a SQL oracle replays signatures
    bit-for-bit."""
    return [
        (int(hashlib.md5(f"{plane}_{d}".encode()).hexdigest()[:8], 16) >> 16) - 32768
        for d in range(dim)
    ]


def plane_matrix(n_planes: int, dim: int):
    import numpy as np

    return np.array(
        [_plane_components(p, dim) for p in range(n_planes)], dtype="int64"
    )  # (planes, dim)


def _quantize_vec(mat):
    """floor(v * 1e8 + 0.5) as int64 — the vector quantization of the
    sign test.  The float ops (widen to float64, one multiply, one add,
    floor) are identical IEEE steps in numpy and SQL, so both produce
    the same integers; overflow headroom: |c| < 2^15, |q| <= ~1e10 for
    |v| <= 100, times 4096 dims stays under 2^62."""
    import numpy as np

    return np.floor(np.asarray(mat, dtype="float64") * 1e8 + 0.5).astype("int64")


def lsh_signature_py(vec: list[float], n_planes: int) -> str:
    """Driver-side signature of one vector (for the query point)."""
    planes = plane_matrix(n_planes, len(vec))
    return "".join(
        "1" if s >= 0 else "0" for s in planes @ _quantize_vec(vec)
    )


def with_lsh_signature(
    df: DataFrame, n_planes: int, dim: int, vec_col: str = "embedding", out_col: str = "sig"
) -> DataFrame:
    """Adds the sign-bit signature column via a vectorized pandas UDF —
    dense matmul is numpy's home turf; a batch of vectors crosses the Arrow
    boundary once and multiplies as one (batch × dim) @ (dim × planes) op.
    (A per-row Spark expression tree for the same math is O(planes*dim)
    codegen nodes — measured an order of magnitude slower at small scale
    and worse at large.)"""
    from usearch_spark.session import ship_package

    ship_package(df.sparkSession)
    planes = plane_matrix(n_planes, dim)  # captured by value in the closure

    @F.pandas_udf("string")
    def sig(v):
        import numpy as np

        # see session.udf_worker_prelude: malloc heap reuse + keep
        # cyclic-gc sweeps from re-tracing the module graph during
        # the per-batch allocation burst
        from usearch_spark.session import udf_worker_prelude

        udf_worker_prelude()
        mat = np.array([np.asarray(x, dtype="float64") for x in v])  # (batch, dim)
        if len(mat) == 0:
            import pandas as pd

            return pd.Series([], dtype="object")
        q = np.floor(mat * 1e8 + 0.5).astype("int64")  # _quantize_vec, batched
        signs = (q @ planes.T) >= 0  # (batch, planes) — exact int64
        import pandas as pd

        return pd.Series(["".join("1" if b else "0" for b in row) for row in signs])

    return df.withColumn(out_col, sig(F.col(vec_col)))


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only rows whose LSH signature is within
    ``max_probe_hamming`` sign-flips of the query's (multi-probe LSH)."""
    dim = len(query_vec)
    qsig = lsh_signature_py(query_vec, n_planes)

    tagged = with_lsh_signature(embeddings, n_planes, dim, vec_col)
    ham = F.aggregate(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        F.lit(0),
        lambda acc, i: acc + (F.substring(F.col("sig"), i + 1, 1) != F.substring(F.lit(qsig), i + 1, 1)).cast("int"),
    )
    probed = tagged.filter(ham <= max_probe_hamming)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        probed.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: a deterministic fixed-iteration
    k-means coarse quantizer (operators/clustering.kmeans_centroids)
    partitions the corpus into ``n_clusters`` inverted lists; a query
    scores only the ``n_probe`` lists whose centroids are nearest to it.

    The scale shape: training samples the corpus once; assignment is one
    vectorized pass; a probed query touches ~n_probe/n_clusters of the data.
    A persistent deployment writes the assigned table partitioned by
    ``cluster`` so probing becomes partition pruning on the scan.  With
    ``n_probe == n_clusters`` the result equals brute force exactly (the
    lists partition the corpus) — the property the tests pin down.
    """
    import numpy as np

    from usearch_spark.operators.clustering import kmeans_assign, kmeans_centroids

    # a coarse quantizer needs balanced cells, not converged centroids —
    # cap the iterations (recall comes from n_probe, not centroid polish).
    # The deterministic kmeans (smallest-k init, round-6 means) replaces an
    # engine-private trainer so the whole chain is SQL-oracle-replayable.
    cent = kmeans_centroids(
        embeddings, k=n_clusters, iters=max_iter, id_col=id_col, vec_col=vec_col
    )
    crows = sorted(cent.collect(), key=lambda r: r["cid"])
    centers = np.array([r["carr"] for r in crows])

    q = np.asarray(query_vec, dtype="float64")
    # nearest centroids by euclidean distance, matching the quantizer's metric
    order = np.argsort(((centers - q) ** 2).sum(axis=1))
    probe = [int(crows[int(c)]["cid"]) for c in order[:n_probe]]

    vecs = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("varr"),
    )
    assigned = kmeans_assign(
        vecs.select(F.col(id_col).alias("vec_id"), "varr"), cent
    ).select(F.col("vec_id").alias(id_col), F.col("cid").alias("_cluster"))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        vecs.join(assigned, id_col)
        .filter(F.col("_cluster").isin(probe))
        .select(F.col(id_col), cosine(F.col(vec_col), qcol).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def exact_cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    n_blocks: int | None = None,
    target_block_rows: int = 50_000,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold, block-partitioned — NO vector
    ever reaches the driver.

    Rows hash into B blocks; every unordered block pair (bi <= bj) becomes
    one cogroup task that cross-multiplies its two blocks with numpy (Arrow
    in, (|bi| x |bj|) matmul, thresholded pairs out).  Each row is shuffled
    to B tasks, a task holds at most two blocks, so O(n*B) data movement
    replaces the O(n^2) pair shuffle and memory per task stays bounded as
    the corpus grows: at 100 TB, B rises as n/target_block_rows and the
    work spreads over B*(B+1)/2 tasks.  (A zip_with expression per pair
    allocates arrays per comparison; measured 40x slower.)  For corpora
    where even blocked exact is too big, ``embedding_near_pairs`` (LSH)
    is the approximate scale path.

    Below ``target_block_rows`` the corpus is ONE block, and the blocked
    cogroup degenerates to a single task anyway — that case skips the
    broadcast-join/cogroup machinery and ships the rows once through a
    plain single-task mapInPandas with the IDENTICAL diagonal-block
    math (same matmul, same round, same strict-upper-triangle cut).
    """
    import numpy as np
    import pandas as pd

    from usearch_spark.session import ship_package, udf_worker_prelude

    spark = embeddings.sparkSession
    ship_package(spark)
    frozen = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    ).localCheckpoint(eager=True)
    if n_blocks is None:
        n_blocks = max(1, -(-frozen.count() // target_block_rows))

    id_type_early = dict(embeddings.dtypes)[id_col]
    if n_blocks == 1:

        def all_pairs(batches):
            udf_worker_prelude()
            parts = [b for b in batches]
            if not parts:
                return
            la = pd.concat(parts, ignore_index=True)
            amat = np.array([np.asarray(v, dtype="float64") for v in la["_vec"]])
            aids = la["_id"].to_numpy()
            sims = (amat @ amat.T) / np.outer(
                np.linalg.norm(amat, axis=1), np.linalg.norm(amat, axis=1)
            )
            sims = np.round(sims, round_to)
            ii, jj = np.nonzero((sims >= threshold) & (aids[:, None] < aids[None, :]))
            yield pd.DataFrame({"a": aids[ii], "b": aids[jj], "cosine": sims[ii, jj]})

        return frozen.coalesce(1).mapInPandas(
            all_pairs, f"a {id_type_early}, b {id_type_early}, cosine double"
        )

    tagged = frozen.withColumn(
        "_blk", F.pmod(F.xxhash64(F.col("_id").cast("string")), F.lit(n_blocks)).cast("int")
    )
    # row with block x serves as the LEFT side of pairs (x, j>=x) and the
    # RIGHT side of pairs (i<=x, x); cogroup key = the (bi, bj) pair.
    # Distinct column names per side keep Spark's ambiguous-self-join
    # detection out of the cogroup.
    jl = F.broadcast(spark.range(n_blocks).select(F.col("id").cast("int").alias("_jl")))
    jr = F.broadcast(spark.range(n_blocks).select(F.col("id").cast("int").alias("_jr")))
    # the right side re-aliases every column: the cogroup's two children
    # would otherwise carry identical attribute ids (both derive from
    # ``tagged``) and trip AMBIGUOUS_SELF_JOIN at analysis
    tr = tagged.select(
        F.col("_id").alias("_rid"), F.col("_vec").alias("_rvec"), F.col("_blk").alias("_rblk")
    )
    left = tagged.join(jl, F.col("_jl") >= F.col("_blk")).groupBy(
        F.col("_blk").alias("_bi"), F.col("_jl").alias("_bj")
    )
    right = tr.join(jr, F.col("_jr") <= F.col("_rblk")).groupBy(
        F.col("_jr").alias("_bi"), F.col("_rblk").alias("_bj")
    )

    def block_pair(key, la: "pd.DataFrame", rb: "pd.DataFrame"):
        udf_worker_prelude()
        bi, bj = int(key[0]), int(key[1])
        if la.empty or rb.empty:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        amat = np.array([np.asarray(v, dtype="float64") for v in la["_vec"]])
        aids = la["_id"].to_numpy()
        if bi == bj:
            bmat, bids = amat, aids
        else:
            bmat = np.array([np.asarray(v, dtype="float64") for v in rb["_rvec"]])
            bids = rb["_rid"].to_numpy()
        sims = (amat @ bmat.T) / np.outer(
            np.linalg.norm(amat, axis=1), np.linalg.norm(bmat, axis=1)
        )
        sims = np.round(sims, round_to)
        if bi == bj:
            # diagonal block: strict upper triangle by id, each pair once
            ii, jj = np.nonzero((sims >= threshold) & (aids[:, None] < bids[None, :]))
            a_out, b_out = aids[ii], bids[jj]
        else:
            # cross block: every qualifying (x, y) occurs exactly once here,
            # in arbitrary id order — orient as (smaller id, larger id)
            ii, jj = np.nonzero(sims >= threshold)
            a_out = np.minimum(aids[ii], bids[jj])
            b_out = np.maximum(aids[ii], bids[jj])
        return pd.DataFrame({"a": a_out, "b": b_out, "cosine": sims[ii, jj]})

    id_type = dict(embeddings.dtypes)[id_col]
    return left.cogroup(right).applyInPandas(
        block_pair, f"a {id_type}, b {id_type}, cosine double"
    )


def build_lsh_index(
    embeddings: DataFrame,
    path: str,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> None:
    """Persist the LSH index: (id, embedding) parquet PARTITIONED BY the
    sign-bit signature.  Signatures are computed once at build time — a
    query then probes by reading only the partitions within its Hamming
    budget (partition pruning on the scan), instead of re-signing the whole
    corpus per query."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    tagged = with_lsh_signature(embeddings, n_planes, dim, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("sig")
    )
    # cluster rows by signature before the partitioned write: otherwise
    # every input partition writes a file into every touched sig dir
    # (parts x 2^n_planes small files); after this it's ~one file per dir
    tagged.repartition(F.col("sig")).write.partitionBy("sig").mode("overwrite").parquet(path)


def lsh_index_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_probe_hamming: int = 1,
    exclude_ids: list | None = None,
) -> DataFrame:
    """Query a persisted LSH index: enumerate the signatures within
    ``max_probe_hamming`` flips of the query's and score only those
    partitions — the filter is on the partition column, so the scan prunes
    to the probed directories and the touched bytes are |probed buckets| /
    2^n_planes of the corpus regardless of corpus size.
    ``exclude_ids`` drops known ids (typically the query's own) BEFORE the
    top-k cut — the usual self-match exclusion."""
    from itertools import combinations

    qsig = lsh_signature_py(query_vec, n_planes)
    probe = []
    for h in range(max_probe_hamming + 1):
        for flips in combinations(range(n_planes), h):
            s = list(qsig)
            for f in flips:
                s[f] = "1" if s[f] == "0" else "0"
            probe.append("".join(s))
    df = spark.read.parquet(path).filter(F.col("sig").isin(probe))
    if exclude_ids:
        df = df.filter(~F.col(id_col).isin(exclude_ids))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_clusters: int = 16,
    max_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF index: train the coarse quantizer ONCE with the
    deterministic fixed-iteration k-means (smallest-k init, round-6
    means — the oracle-replayable trainer, not an engine-private one),
    write the assignment parquet PARTITIONED BY cluster plus the
    centroids as a ``_centroids.json`` sidecar (the underscore keeps it
    out of partition discovery).  Probing then = read centroids (tiny),
    pick n_probe cells, scan only those partitions.

    Cluster ids are DENSE RANKS of the init seeds (row_number − 1 over
    the k smallest vec_ids — kmeans_centroids densifies them), so any id
    domain works (1-based, sparse, string) and the sidecar's positional
    list is indexed by cid directly; the ValueError below fires only for
    a cluster that genuinely lost every member mid-training, which would
    leave a hole in 0..k-1 and break the positional indexing."""
    import json
    import os

    from usearch_spark.operators.clustering import kmeans_assign, kmeans_centroids

    cent = kmeans_centroids(
        embeddings, k=n_clusters, iters=max_iter, id_col=id_col, vec_col=vec_col
    )
    crows = sorted(cent.collect(), key=lambda r: r["cid"])
    if [r["cid"] for r in crows] != list(range(n_clusters)):
        raise ValueError(
            f"IVF quantizer lost a cluster: cids={[r['cid'] for r in crows]}"
        )
    vecs = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("varr"),
    )
    assigned = (
        kmeans_assign(vecs.select(F.col(id_col).alias("vec_id"), "varr"), cent)
        .select(F.col("vec_id").alias(id_col), F.col("cid").alias("cluster"))
        .join(embeddings.select(F.col(id_col), F.col(vec_col)), id_col)
        .select(F.col(id_col), F.col(vec_col), F.col("cluster"))
    )
    # one writer task per cluster dir (see build_lsh_index)
    assigned.repartition(F.col("cluster")).write.partitionBy("cluster").mode("overwrite").parquet(path)
    centers = [[float(x) for x in r["carr"]] for r in crows]
    with open(os.path.join(path, "_centroids.json"), "w") as fh:
        json.dump(centers, fh)


def ivf_index_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list | None = None,
) -> DataFrame:
    """Query a persisted IVF index: nearest ``n_probe`` centroids by the
    quantizer's euclidean metric, then score only those cluster partitions
    (partition pruning on the scan).  ``exclude_ids`` drops known ids
    (typically the query's own) BEFORE the top-k cut."""
    import json
    import os

    import numpy as np

    with open(os.path.join(path, "_centroids.json")) as fh:
        centers = np.array(json.load(fh))
    q = np.asarray(query_vec, dtype="float64")
    order = np.argsort(((centers - q) ** 2).sum(axis=1))
    probe = [int(c) for c in order[:n_probe]]
    df = spark.read.parquet(path).filter(F.col("cluster").isin(probe))
    if exclude_ids:
        df = df.filter(~F.col(id_col).isin(exclude_ids))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(F.col(id_col), cosine(F.col(vec_col), qcol).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def embedding_near_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """All-pairs cosine >= threshold, LSH-bucketed: only pairs sharing the
    full signature are scored (high-threshold near-dup regime)."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    tagged = with_lsh_signature(embeddings, n_planes, dim, vec_col).select(
        F.col(id_col), F.col(vec_col), F.col("sig")
    )
    a = tagged.select(F.col("sig"), F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = tagged.select(F.col("sig"), F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, "sig")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def dim_scales(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension max-abs scales for symmetric int8 quantization:
    (dim, scale).  One posexplode + max agg — a single scan, partial-
    aggregated; the result is |dims| rows (tiny, broadcastable)."""
    return (
        embeddings.select(F.posexplode(vec_col).alias("dim", "val"))
        .groupBy("dim")
        .agg(F.max(F.abs(F.col("val").cast("double"))).alias("scale"))
    )


def quantize_int8(
    embeddings: DataFrame,
    scales: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization: q = round(val·127/scale) per dimension
    — the 4x storage cut (float32 -> int8) an ANN index takes before
    sharding at scale.  Output: (id, dim, q, err) with err the absolute
    reconstruction error |val - q·scale/127|.

    The scales side is tiny and broadcast; everything else is a scan-speed
    projection (no Python).
    """
    exploded = embeddings.select(
        F.col(id_col), F.posexplode(vec_col).alias("dim", "val")
    ).withColumn("val", F.col("val").cast("double"))
    q = F.round(F.col("val") * 127.0 / F.col("scale")).cast("int")
    return (
        exploded.join(F.broadcast(scales), "dim")
        .withColumn("q", F.when(F.col("scale") > 0, q).otherwise(F.lit(0)))
        .withColumn(
            "err",
            F.abs(F.col("val") - F.col("q") * F.col("scale") / F.lit(127.0)),
        )
        .select(id_col, "dim", "q", "err")
    )


def ivf_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental IVF index maintenance: assign NEW vectors to the
    EXISTING centroids (no quantizer retrain) and append them to the
    cluster-partitioned parquet — the steady-state ingest path of a vector
    index at scale (retraining is a periodic offline job; appends are
    cheap and partition-local).

    Assignment is the same broadcast argmin as the quantizer would apply
    (euclidean to the persisted ``_centroids.json``), expressed as column
    ops so no model object or Python loop is needed.  Recall caveat: the
    centroids drift as the distribution shifts; full-probe queries remain
    exact regardless (and that's what the parity test pins).
    """
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as fh:
        centers = json.load(fh)
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "cluster int, carr array<double>",
    )
    vecs = new_vectors.select(
        F.col(id_col), F.col(vec_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v")
    )
    j = (
        vecs.withColumn("_one", F.lit(1))
        .join(F.broadcast(cdf.withColumn("_one", F.lit(1))), "_one")
        .drop("_one")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("_v"), F.col("carr"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = (
        j.select(id_col, vec_col, "cluster", d2.alias("_d2"))
        .groupBy(id_col)
        .agg(
            F.min_by(F.struct("_d2", "cluster"), F.struct("_d2", "cluster")).alias("_best"),
            F.first(vec_col).alias(vec_col),
        )
        .select(id_col, vec_col, F.col("_best.cluster").alias("cluster"))
    )
    assigned.repartition(F.col("cluster")).write.partitionBy("cluster").mode("append").parquet(path)


def embedding_covariance(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Population covariance matrix of the embedding dimensions:
    (i, j, cov) with 0-based dims — the one-pass precursor of PCA /
    whitening over a vector corpus.

    Scale shape: ONE corpus pass emits per-row d² products (a JVM
    nested-transform explode, no self-join of the exploded table), the
    d² partial sums partial-aggregate map-side, and centering happens
    algebraically afterwards (cov = (Sij − Si·Sj/N)/N) on the d²-row
    result with two broadcast joins of the d-row mean sums.

    Hash-gate determinism: per-row products are decimal-quantized
    (round 8 → DECIMAL) before summation, so the sums are exact and
    order-independent — any engine reproduces them bit-for-bit (the
    same trick as the unigram-LM mean).  Element values are cast to
    double BEFORE multiplying so both engines do 64-bit math.

    Centering + quantization are EXACT-INTEGER end to end: the numerator
    N·Sij − Si·Sj is an exact multiple of 1e-16 (the inputs are round-8
    decimals), so it is carried as INTEGER UNITS of 1e-16 (scale-0
    decimals, values far below 1e38 — no precision-loss adjustment, no
    fractional digit to lose), and round-6 of num/N² is computed by
    integer long division with a half-away-from-zero bump:
    ``q = sgn·(|num_u| div D + [2·(|num_u| mod D) ≥ D])`` where
    ``D = N²·1e10`` converts 1e-16 units to 1e-6 steps of the quotient.
    Only THEN does the (small, ≤2^53) integer q cast to double and divide
    by 1e6 — one exact conversion + one IEEE divide, bit-identical on any
    engine.  The r5–r7 driver gates showed the earlier tails —
    round(double expr, 6) in r5, and DECIMAL(38,16)→double cast +
    round(double, 6) in r6/r7 — are both boundary-unstable across
    engines (Spark's correctly-rounded BigDecimal.doubleValue() vs
    DuckDB's two-step int128 path can differ by 1 ulp for unscaled
    values > 2^53, and round-half on a double is then ulp-sensitive);
    with the rounding DECISION made in integers neither boundary exists.
    Width bounds: sums |Si|, Sij ≤ 1e10 and N ≤ 1e9 keep every
    intermediate ≤ DECIMAL(37,0) — sized for billions of vectors.
    """
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    # two-parameter transform lambdas receive the element INDEX second —
    # exactly what the pair enumeration needs here.  Only the UPPER
    # triangle (j >= i) is exploded — half the rows — and mirrored after
    # aggregation; each cell's decimal sum is unchanged.
    pairs = F.flatten(
        F.transform(
            x,
            lambda xi, i: F.transform(
                F.slice(F.col(vec_col), i + 1, F.size(F.col(vec_col)) - i),
                lambda xj, j: F.struct(
                    i.alias("i"),
                    (i + j).alias("j"),
                    F.round(xi * xj.cast("double"), 8).cast("decimal(26,8)").alias("p"),
                ),
            ),
        )
    )
    upper = (
        emb.select(F.explode(pairs).alias("t"))
        .groupBy(F.col("t.i").alias("i"), F.col("t.j").alias("j"))
        .agg(F.sum("t.p").alias("sij"))
    )
    p = upper.unionByName(
        upper.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "sij"
        )
    )
    s = (
        emb.select(F.posexplode(x).alias("i", "xi"))
        .groupBy("i")
        .agg(F.sum(F.round(F.col("xi"), 8).cast("decimal(26,8)")).alias("si"))
    )
    n = int(emb.count())
    # integer units of 1e-16: shift the round-8 decimals up by 1e8 (the
    # (18,8)*(9,0)→(27,8) product is lossless; the →(18,0) cast is of an
    # integral value, so exact).  With Sij_u = Sij·1e8 and Si_u = Si·1e8,
    # num·1e16 = (N·1e8)·Sij_u − Sa_u·Sb_u; N·1e8 folds into one int64
    # literal so both products are (18,0)×(18,0)→(37,0) and the
    # difference (38,0) — every step inside DECIMAL(38) at scale 0.
    shift8 = F.lit(100000000).cast("decimal(9,0)")
    sij_u = (F.col("sij").cast("decimal(18,8)") * shift8).cast("decimal(18,0)")
    sa = s.select(
        "i", (F.col("si").cast("decimal(18,8)") * shift8).cast("decimal(18,0)").alias("sa_u")
    )
    sb = s.select(
        F.col("i").alias("j"),
        (F.col("si").cast("decimal(18,8)") * shift8).cast("decimal(18,0)").alias("sb_u"),
    )
    d_units = n * n * 10**10  # 1e-16 units per 1e-6 step of num/N²
    num_u = (
        F.lit(n * 10**8).cast("decimal(18,0)") * sij_u - F.col("sa_u") * F.col("sb_u")
    )
    return (
        p.join(F.broadcast(sa), "i")
        .join(F.broadcast(sb), "j")
        .select("i", "j", num_u.alias("num_u"))
        .select(
            "i",
            "j",
            F.abs(F.col("num_u")).alias("a_u"),
            F.when(F.col("num_u") < 0, F.lit(-1)).otherwise(F.lit(1)).alias("sgn"),
        )
        .select(
            "i",
            "j",
            "sgn",
            F.expr(f"a_u DIV CAST('{d_units}' AS DECIMAL(32,0))").alias("qa"),
            F.expr(f"a_u % CAST('{d_units}' AS DECIMAL(32,0))").alias("ra"),
        )
        .select(
            "i",
            "j",
            (
                (
                    F.col("sgn")
                    * (
                        F.col("qa")
                        + F.expr(
                            f"CASE WHEN ra * 2 >= CAST('{d_units}' AS DECIMAL(33,0))"
                            " THEN 1 ELSE 0 END"
                        )
                    )
                ).cast("double")
                / F.lit(1000000.0)
            ).alias("cov"),
        )
    )


def principal_component(
    emb: DataFrame,
    vec_col: str = "embedding",
    iters: int = 8,
    cov: DataFrame | None = None,
) -> DataFrame:
    """Top principal component by fixed-iteration power method over the
    (rounded) covariance matrix: v0 = uniform, v_{t+1} = C·v_t / ‖C·v_t‖₂.
    Returns (i, loading) for each dimension, round(6).

    The corpus-sized work is :func:`embedding_covariance` (one pass); the
    iteration itself runs on the d²-row matrix with d-row vectors — tiny
    broadcast joins regardless of corpus size, kept as DataFrames so the
    whole computation stays declarative (and a SQL oracle can unroll the
    same matrix-vector recurrence).  Deterministic: fixed start vector,
    fixed iteration count, sums of round-6 covariance entries.
    """
    c = (cov if cov is not None else embedding_covariance(emb, vec_col)).localCheckpoint(
        eager=True
    )
    return _power_iterate(c, iters)


def _power_iterate(c: DataFrame, iters: int) -> DataFrame:
    """Fixed-iteration power method over a (i, j, cov) matrix frame:
    v0 uniform unit, v_{t+1} = C·v_t / ‖C·v_t‖₂; returns (i, loading)
    rounded at 6.

    One job per iteration: the L2 normalizer rides the checkpoint of the
    un-normalized mat-vec as an OBSERVED metric (the same
    sqrt(sum(w*w)) aggregate the old broadcast-join branch computed, so
    the scalar is the identical double), and the division by it happens
    lazily over the checkpoint as a literal — bit-identical results with
    half the per-iteration stages and no broadcast build.  Superseded
    iteration checkpoints release eagerly (guide §5)."""
    import math

    from usearch_spark.plans.iterative import (
        checkpoint_with_metrics,
        release_local_checkpoint,
    )

    d = c.agg(F.max("i")).first()[0] + 1
    v = c.select("i").dropDuplicates(["i"]).withColumn(
        "w", F.lit(1.0 / math.sqrt(d))
    )
    prev: DataFrame | None = None
    for _ in range(iters):
        w, m = checkpoint_with_metrics(
            c.join(F.broadcast(v.select(F.col("i").alias("j"), "w")), "j")
            .groupBy("i")
            .agg(F.sum(F.col("cov") * F.col("w")).alias("w")),
            nrm=F.sqrt(F.sum(F.col("w") * F.col("w"))),
        )
        release_local_checkpoint(prev)
        prev = w
        v = w.select("i", (F.col("w") / F.lit(float(m["nrm"]))).alias("w"))
    return v.select("i", F.round("w", 6).alias("loading"))


def principal_component2(
    emb: DataFrame,
    vec_col: str = "embedding",
    iters: int = 8,
    cov: DataFrame | None = None,
) -> DataFrame:
    """SECOND principal component by Hotelling deflation: with the round-6
    first component v, deflate C₂ = round(C − λ·vvᵀ, 6) where
    λ = round(vᵀCv, 6) (the Rayleigh quotient), and power-iterate the
    deflated matrix.  Everything stays on the d²-row frame with d-row
    broadcast joins; the rounded v/λ/C₂ intermediates are exactly what a
    SQL oracle reproduces, so the whole deflation chain is
    hash-checkable.  Returns (i, loading)."""
    c = (cov if cov is not None else embedding_covariance(emb, vec_col)).localCheckpoint(
        eager=True
    )
    v1 = _power_iterate(c, iters)
    va = F.broadcast(v1.select(F.col("i").alias("_vi"), F.col("loading").alias("li")))
    vb = F.broadcast(v1.select(F.col("i").alias("_vj"), F.col("loading").alias("lj")))
    lam = (
        c.join(va, c.i == F.col("_vi"))
        .join(vb, c.j == F.col("_vj"))
        .agg(F.round(F.sum(F.col("li") * F.col("cov") * F.col("lj")), 6).alias("lam"))
    )
    c2 = (
        c.join(va, c.i == F.col("_vi"))
        .join(vb, c.j == F.col("_vj"))
        .join(F.broadcast(lam))
        .select(
            "i",
            "j",
            F.round(
                F.col("cov") - F.col("lam") * F.col("li") * F.col("lj"), 6
            ).alias("cov"),
        )
        .localCheckpoint(eager=True)
    )
    return _power_iterate(c2, iters)


# --- IVF-PQ: product quantization over the IVF coarse layout ------------


def _pq_subs(
    emb: DataFrame, m: int, dsub: int, id_col: str, vec_col: str
) -> DataFrame:
    """(vec_id, sub, varr): the corpus split into m contiguous subvectors
    of dsub dims each — one JVM transform + posexplode, no shuffle."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                f" s -> transform(slice({vec_col}, s * {dsub} + 1, {dsub}),"
                " x -> CAST(x AS DOUBLE)))"
            )
        ).alias("sub", "varr"),
    )


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k_sub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Per-subspace PQ codebooks (sub, cid, carr) — Jégou et al. 2011
    product quantization, trained with the SAME deterministic
    fixed-iteration Lloyd contract as the coarse quantizer
    (operators/clustering.kmeans_centroids): init from the k_sub
    smallest vec_ids (cids are densified ranks), argmin assignment with
    ties to the lower cid, per-dimension means ROUNDED to 6dp.  All m
    subspaces train in ONE set of DataFrame passes (the subspace id is
    just another grouping key), so training cost is the same corpus
    scans as a single k-means, not m of them.

    Scale shape per iteration: assignment joins the (vec, sub) frame
    against a BROADCAST m·k_sub-row codebook on the subspace key and
    arg-mins k_sub candidate rows map-side; the update is one
    posexplode + partial-agg shuffle keyed by (sub, cid, dim).  The
    codebook frame is m·k_sub rows regardless of corpus size.

    Empty-cluster handling: a (sub, cid) cell that attracts no vectors
    in a round KEEPS its previous centroid (the FAISS convention) — the
    codebook stays dense, so the positional sidecar indexing and the
    fixed-point encoder never see a hole; on degenerate/tiny corpora
    the stale entry simply goes unreferenced by any code."""
    from pyspark.sql import Window

    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    dsub = dim // m
    subs = _pq_subs(emb, m, dsub, id_col, vec_col)
    seed_ids = emb.select(F.col(id_col).alias("vec_id")).orderBy("vec_id").limit(k_sub)
    n_seeds = seed_ids.count()  # bounded by k_sub: a LIMIT-k scan, not a full count
    if n_seeds < k_sub:
        raise ValueError(
            f"corpus smaller than k_sub: {n_seeds} vectors cannot seed "
            f"{k_sub} PQ cells per subspace — pass k_sub <= corpus size "
            f"(build_ivfpq_index clamps automatically)"
        )
    cb = (
        subs.join(F.broadcast(seed_ids), "vec_id")
        .withColumn(
            "cid",
            (
                F.row_number().over(Window.partitionBy("sub").orderBy("vec_id")) - 1
            ).cast("int"),
        )
        .select("sub", "cid", F.col("varr").alias("carr"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters - 1):
        assigned = (
            subs.join(F.broadcast(cb), "sub")
            .select(
                "vec_id",
                "sub",
                "cid",
                _dist2_arr(F.col("varr"), F.col("carr")).alias("dist"),
            )
            .groupBy("vec_id", "sub")
            .agg(F.min_by(F.struct("dist", "cid"), F.struct("dist", "cid")).alias("b"))
            .select("vec_id", "sub", F.col("b.cid").alias("cid"))
        )
        upd = (
            assigned.join(subs, ["vec_id", "sub"])
            .select("sub", "cid", F.posexplode("varr").alias("j", "x"))
            .groupBy("sub", "cid", "j")
            .agg(F.round(F.avg("x"), 6).alias("x"))
            .groupBy("sub", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "x"))), lambda s: s["x"]
                ).alias("ncarr")
            )
        )
        cb = (
            cb.join(upd, ["sub", "cid"], "left")
            .select(
                "sub",
                "cid",
                F.coalesce(F.col("ncarr"), F.col("carr")).alias("carr"),
            )
            .localCheckpoint(eager=True)  # m*k_sub rows; truncates lineage
        )
    return cb


def _dist2_arr(a: Column, b: Column) -> Column:
    """Squared L2 between two array columns — ordered fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def _fx6(col: Column) -> Column:
    """floor(x*1e6 + 0.5): the fixed-point 1e-6 quantizer (BIGINT) — the
    same IEEE step sequence on any engine, so downstream INTEGER
    arithmetic is engine-exact (the LSH sign-test recipe)."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5))


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(vec_id, codes array<int>): each vector's per-subspace nearest
    codebook entry.  The argmin runs in EXACT 1e-6 fixed-point integers
    (floor(x·1e6 + 0.5) on both the subvector and the round-6 codebook
    entry), so the discrete code decision has no cross-engine float
    boundary — distances are exact int64 sums (<= dsub·(4e6)² per
    subspace), ties break to the lower cid."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    dsub = dim // m
    subs = _pq_subs(emb, m, dsub, id_col, vec_col)
    qsubs = subs.select(
        "vec_id", "sub", F.transform("varr", _fx6).alias("xq")
    )
    qcb = codebooks.select("sub", "cid", F.transform("carr", _fx6).alias("cq"))
    return (
        qsubs.join(F.broadcast(qcb), "sub")
        .select(
            "vec_id",
            "sub",
            "cid",
            F.aggregate(
                F.zip_with(F.col("xq"), F.col("cq"), lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, d: acc + d,
            ).alias("di"),
        )
        .groupBy("vec_id", "sub")
        .agg(F.min_by(F.struct("di", "cid"), F.struct("di", "cid")).alias("b"))
        .select("vec_id", "sub", F.col("b.cid").alias("code"))
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
    )


def build_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_clusters: int = 8,
    m: int = 8,
    k_sub: int = 16,
    max_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF-PQ index: coarse quantizer (the deterministic
    kmeans_centroids trainer, cluster-partitioned assignment — exactly
    build_ivf_index's layout) PLUS per-subspace PQ codes per vector, so
    a probe reads only the probed cluster partitions and scores
    CODES (m bytes of information per vector) instead of raw vectors —
    the memory/IO shape that makes billion-vector ANN feasible.  The
    full vectors are kept alongside the codes in the same partitioned
    parquet (reranking fodder); sidecars ``_centroids.json`` (coarse,
    positional by cid) and ``_pq.json`` ({m, k_sub, dim, codebooks
    positional by [sub][cid][j]}) carry the tiny model.

    Citing the reference surface: this is the scale path beyond the flat
    IVF probe — same inverted-list pruning, plus asymmetric-distance
    scoring over quantized codes (Jégou, Douze, Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011)."""
    import json
    import os

    from usearch_spark.operators.clustering import kmeans_assign, kmeans_centroids

    dim = len(embeddings.select(vec_col).first()[0])
    # degenerate-corpus clamp: PQ seeding can only fill |corpus| cells per
    # subspace, so k_sub > |corpus| would abort in pq_train with a
    # misleading "lost an entry"; a LIMIT-k count bounds the check cost.
    n_avail = embeddings.select(id_col).limit(k_sub).count()
    if n_avail == 0:
        raise ValueError("cannot build an IVF-PQ index over an empty corpus")
    k_sub = min(k_sub, n_avail)
    cent = kmeans_centroids(
        embeddings, k=n_clusters, iters=max_iter, id_col=id_col, vec_col=vec_col
    )
    crows = sorted(cent.collect(), key=lambda r: r["cid"])
    if [r["cid"] for r in crows] != list(range(n_clusters)):
        raise ValueError(
            f"IVF-PQ coarse quantizer lost a cluster: cids={[r['cid'] for r in crows]}"
        )
    cb = pq_train(
        embeddings, m=m, k_sub=k_sub, iters=max_iter,
        id_col=id_col, vec_col=vec_col, dim=dim,
    ).localCheckpoint(eager=True)
    cbrows = sorted(cb.collect(), key=lambda r: (r["sub"], r["cid"]))
    if len(cbrows) != m * k_sub:
        raise ValueError(
            f"PQ codebook lost an entry: {len(cbrows)} != {m}*{k_sub}"
        )
    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("varr"),
    )
    assigned = kmeans_assign(vecs.select("vec_id", "varr"), cent).select(
        "vec_id", F.col("cid").alias("cluster")
    )
    codes = pq_encode(
        embeddings, cb, m=m, id_col=id_col, vec_col=vec_col, dim=dim
    )
    out = (
        vecs.select("vec_id", F.col(vec_col))
        .join(assigned, "vec_id")
        .join(codes, "vec_id")
    )
    out.repartition(F.col("cluster")).write.partitionBy("cluster").mode(
        "overwrite"
    ).parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as fh:
        json.dump([[float(x) for x in r["carr"]] for r in crows], fh)
    with open(os.path.join(path, "_pq.json"), "w") as fh:
        json.dump(
            {
                "m": m,
                "k_sub": k_sub,
                "dim": dim,
                "codebooks": [
                    [float(x) for x in r["carr"]] for r in cbrows
                ],  # positional: index = sub * k_sub + cid
            },
            fh,
        )


def _fx6_py(x: float) -> int:
    import math

    return int(math.floor(x * 1000000.0 + 0.5))


def ivfpq_index_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    exclude_ids: list | None = None,
    rerank: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVF-PQ index by asymmetric distance computation
    (ADC): pick the ``n_probe`` nearest coarse cells, build the m×k_sub
    distance TABLE between the query's subvectors and every codebook
    entry once on the driver, then score each candidate as a SUM OF m
    TABLE LOOKUPS over its codes — no per-candidate vector arithmetic,
    and the scan reads only the probed cluster partitions (partition
    pruning) and only (vec_id, cluster, codes) columns.

    Fully deterministic: the probe choice and the table are exact 1e-6
    fixed-point INTEGER math (floor(x·1e6+0.5) — python ints on the
    driver, the identical quantizer the encoder used), per-candidate
    scores are exact int64 sums of table entries, ties break by vec_id,
    and the reported ``d2`` is the single exact int→double cast divided
    by 1e12.

    ``rerank``: two-stage retrieval (SIFT-style refine): take the top
    ``rerank`` candidates by ADC, then re-score ONLY those with the
    exact cosine against the stored full vectors and return the top k —
    quantization error cancels on the shortlist while the scan still
    reads only the probed partitions; returns (id, cosine) instead of
    (id, d2)."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as fh:
        centers = json.load(fh)
    with open(os.path.join(path, "_pq.json")) as fh:
        pq = json.load(fh)
    m, k_sub, dim = pq["m"], pq["k_sub"], pq["dim"]
    dsub = dim // m
    qq = [_fx6_py(float(x)) for x in query_vec]
    # integer coarse probe: nearest n_probe cells in fixed-point L2
    cd = sorted(
        (sum((qq[j] - _fx6_py(c[j])) ** 2 for j in range(dim)), ci)
        for ci, c in enumerate(centers)
    )
    probe = [ci for _, ci in cd[:n_probe]]
    # m x k_sub ADC table, exact ints
    table = [
        [
            sum(
                (qq[s * dsub + j] - _fx6_py(pq["codebooks"][s * k_sub + c][j])) ** 2
                for j in range(dsub)
            )
            for c in range(k_sub)
        ]
        for s in range(m)
    ]
    cols = [F.col(id_col), F.col("codes")] + (
        [F.col(vec_col)] if rerank is not None else []
    )
    df = spark.read.parquet(path).filter(F.col("cluster").isin(probe)).select(*cols)
    if exclude_ids:
        df = df.filter(~F.col(id_col).isin(exclude_ids))
    t_lit = F.array(
        *[F.array(*[F.lit(int(v)).cast("long") for v in row]) for row in table]
    )
    appx = F.aggregate(
        F.zip_with(
            F.col("codes"),
            t_lit,
            lambda c, t: F.element_at(t, (c + F.lit(1)).cast("int")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    if rerank is None:
        return (
            df.select(F.col(id_col), appx.alias("appx"))
            .orderBy("appx", id_col)
            .limit(k)
            .select(
                F.col(id_col),
                (F.col("appx").cast("double") / F.lit(1e12)).alias("d2"),
            )
        )
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    shortlist = (
        df.select(F.col(id_col), F.col(vec_col), appx.alias("appx"))
        .orderBy("appx", id_col)
        .limit(int(rerank))
    )
    return (
        shortlist.select(
            F.col(id_col), cosine(F.col(vec_col), qcol).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def mmr_topk(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
    pool: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**8,
) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE diversified top-k (Carbonell &
    Goldstein 1998) — the redundancy-aware retrieval a training-data
    pipeline uses where plain top-k returns ten near-duplicates: greedy
    over a relevance-ranked candidate pool, each round picking

        argmax_i  λ·rel(q, i) − (1−λ)·max_{s∈S} sim(i, s)

    with λ = 1/2, so the ×2-scaled objective is  rel_i − max_sim_i —
    a PURE INTEGER decision, because every similarity here is the exact
    int64 dot product of ELEMENT-WISE 1e8-QUANTIZED vectors (the proven
    LSH sign-test recipe: floor(x·1e8 + 0.5) per stored element is the
    same IEEE chain on both engines, and Σ xq·yq is exact int64 for
    d·(max|x|·1e8)² < 2⁶³ — d = 64 at |x| ≤ 3 documented).  MIPS
    similarity, like sim_mips_topk; max over the empty set is 0, so
    round 1 is argmax relevance.

    Distributed shape: ONE corpus scan scores the broadcast-literal
    query and TakeOrderedAndProject keeps the pool (the only
    corpus-sized work); the greedy runs k rounds over the ≤pool-row
    checkpointed frame with ONE one-row argmax transfer per round (the
    graph_kcenters contract) — each picked vector re-enters as literals,
    never a driver-side pairwise matrix.  No UDFs, no windows.

    Determinism: every score, comparison and tie-break ((score2 desc,
    id)) is exact-integer — bit-exact with no float anywhere.

    Output: (mmr_rank, vec_id, rel_q, max_sim_q, score2) — quantized
    int64 scores (÷1e16 for the float view, caller-side).
    """
    import math

    xq = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(1e8) + F.lit(0.5)).cast("long"),
    )
    base = emb.select(F.col(id_col).alias("vec_id"), xq.alias("xq"))
    qrow = base.filter(F.col("vec_id") == query_id).first()
    if qrow is None:
        raise ValueError(f"query id {query_id} not found")
    qq = [int(v) for v in qrow["xq"]]

    def dot_lit(vec_ints):
        lits = F.array(*[F.lit(int(v)) for v in vec_ints])
        return F.aggregate(
            F.zip_with(F.col("xq"), lits, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    pool_df = (
        base.filter(F.col("vec_id") != query_id)
        .withColumn("rel", dot_lit(qq))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(pool)
        .localCheckpoint(eager=True)
    )
    picks: list[tuple] = []
    sel_vecs: list[list[int]] = []
    rem = pool_df
    for r in range(1, k + 1):
        if sel_vecs:
            sims = [dot_lit(v) for v in sel_vecs]
            ms = sims[0] if len(sims) == 1 else F.greatest(*sims)
        else:
            ms = F.lit(0).cast("long")
        cand = rem.withColumn("_ms", ms).withColumn(
            "_s2", F.col("rel") - F.col("_ms")
        )
        row = cand.orderBy(F.col("_s2").desc(), "vec_id").first()
        if row is None:
            break
        picks.append((r, row["vec_id"], row["rel"], row["_ms"], row["_s2"]))
        sel_vecs.append([int(v) for v in row["xq"]])
        rem = rem.filter(F.col("vec_id") != row["vec_id"])
    out_cols = ["mmr_rank", "vec_id", "rel_q", "max_sim_q", "score2"]
    if not picks:
        # Empty candidate pool (corpus holds only the query vector):
        # F.array() with zero struct children would type as array<null>
        # and the s.* field access below could not resolve — return an
        # explicitly-typed empty frame instead.
        schema = ", ".join(f"{c} long" for c in out_cols)
        return emb.sparkSession.createDataFrame([], schema)
    arr = F.array(
        *[
            F.struct(
                F.lit(r).cast("long").alias("mmr_rank"),
                F.lit(vid).cast("long").alias("vec_id"),
                F.lit(rel).cast("long").alias("rel_q"),
                F.lit(ms).cast("long").alias("max_sim_q"),
                F.lit(s2).cast("long").alias("score2"),
            )
            for (r, vid, rel, ms, s2) in picks
        ]
    )
    carrier = pool_df.agg(F.count(F.lit(1)).alias("_n"))
    return carrier.select(F.explode(arr).alias("s")).select(*[f"s.{c}" for c in out_cols])


def knn_graph(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-NEAREST-NEIGHBOR GRAPH construction over an embedding column —
    the input artifact of graph-based dedup/clustering/diversity passes
    (connect each vector to its k most similar peers, then run the
    engine's CC/Louvain/coreness on the result).

    Candidate generation is LSH-BUCKETED, never all-pairs: vectors
    sharing an ``n_planes``-bit hyperplane signature form a bucket, and
    only within-bucket pairs are scored — Σ bucket² work, controlled by
    ``n_planes`` (the documented 100-TB lever: more planes = smaller
    buckets = higher recall loss, the standard LSH trade; multi-probe
    as in lsh_index_topk recovers boundary neighbors when needed).
    Edges are ranked by the MIPS dot product (mips_topk's metric).

    Determinism — NO float anywhere: signatures are exact int64 sign
    tests (the proven floor(x·1e8 + 0.5) quantization against the
    md5-derived integer plane matrix), edge scores are exact int64 dots
    of the quantized vectors (d·(max|x|·1e8)² < 2⁶³ budget, documented
    at mmr_topk), and ranks break ties on neighbor id.

    Distributed shape: one Arrow-batched signature pass, one
    signature-keyed self-join, one partitioned rank window per source
    vertex.  No global windows, no collects.

    Output: (id, nbr_id, knn_rank, dot2) — dot2 the exact quantized
    dot; vectors alone in their bucket emit no rows (no candidates).
    """
    from pyspark.sql import Window

    first = emb.select(vec_col).first()
    if first is None:
        # Empty embeddings frame: no dim to derive and no edges to emit —
        # return an explicitly-typed empty result (mmr_topk's empty-pool
        # contract) instead of raising TypeError on first()[0].  The id
        # columns take the INPUT id type (not a hardcoded long) so the
        # empty and non-empty schemas agree for union/join callers with
        # non-long vector ids.
        id_type = emb.schema[id_col].dataType
        return emb.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(id_col, id_type),
                    T.StructField("nbr_id", id_type),
                    T.StructField("knn_rank", T.LongType()),
                    T.StructField("dot2", T.LongType()),
                ]
            ),
        )
    dim = len(first[0])
    xq = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(1e8) + F.lit(0.5)).cast("long"),
    )
    base = with_lsh_signature(emb, n_planes, dim, vec_col=vec_col).select(
        F.col(id_col).alias("_id"), "sig", xq.alias("xq")
    )
    a = base.select(F.col("_id").alias(id_col), "sig", F.col("xq").alias("xa"))
    b = base.select(F.col("_id").alias("nbr_id"), "sig", F.col("xq").alias("xb"))
    dot2 = F.aggregate(
        F.zip_with(F.col("xa"), F.col("xb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(b, "sig")
        .filter(F.col(id_col) != F.col("nbr_id"))
        .select(id_col, "nbr_id", dot2.alias("dot2"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("dot2").desc(), "nbr_id")
    return (
        pairs.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select(id_col, "nbr_id", F.col("knn_rank").cast("long").alias("knn_rank"), "dot2")
    )
