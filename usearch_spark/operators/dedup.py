"""Deduplication operators for large-scale training-data pipelines.

All hashing is md5-based so results are portable across engines (the DuckDB
oracles reproduce them bit-for-bit) and deterministic across runs — no
JVM-specific hash seeds in the data path.

Operators:
  - exact duplicates: content fingerprint (md5 of sorted distinct tokens)
    group-by — one shuffle keyed by the fingerprint;
  - n-gram Jaccard pairs: shingle explode + equi-join on shingle; common
    shingles are capped by document frequency (``max_shingle_df``) so a
    stop-shingle can't produce a quadratic blowup at scale;
  - MinHash signatures + banded LSH candidates + verified Jaccard — the
    standard scale path: |bands| small joins instead of an all-pairs join;
  - SimHash (64-bit, md5-derived bit planes) + banded Hamming candidates;
  - embedding near-duplicates: cosine > threshold via the similarity module.

Scale notes: every pair-producing operator keys its join on a bounded-df
token (shingle, band signature, simhash chunk).  The only all-pairs
operation is within a bucket, and bucket width is controlled by the
signature parameters — the 100 TB failure mode (one giant bucket) is
handled by dropping buckets larger than ``max_bucket`` with a logged count,
exactly what a production near-dup pipeline does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from usearch_spark.functions.text import tokenize


def content_fingerprint(text: Column | str, toks: Column | None = None) -> Column:
    """Order/duplicate-insensitive content fingerprint: md5 of the sorted
    distinct token set (bag-of-words identity).  Pass an already-
    materialized token-array column as ``toks`` to avoid re-tokenizing in
    wide projections (CollapseProject inlines the tokenize regex into
    every consumer otherwise)."""
    if toks is None:
        toks = tokenize(text)
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


def exact_duplicate_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of documents sharing a content fingerprint (size > 1)."""
    from usearch_spark.session import spread_small_scan

    return (
        spread_small_scan(docs)
        .select(F.col(id_col), content_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
        .filter(F.col("group_size") > 1)
    )


def shingles_of_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of an ALREADY-MATERIALIZED token-array
    column.  ``toks`` must be a plain column reference: expressions passed
    into transform-lambdas are re-evaluated per element (a tokenize() regex
    here turns O(tokens) into O(tokens^2) regex passes — measured 15s vs
    0.5s on 5k docs)."""
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]))
    # sequence(0, negative) counts DOWN in Spark — guard short docs explicitly
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(F.array_distinct(grams))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of raw text (convenience form; prefer
    materializing tokens first for hot paths — see shingles_of_tokens)."""
    return shingles_of_tokens(tokenize(text), n)


def _doc_shingles(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    from usearch_spark.session import spread_small_scan

    tok_df = spread_small_scan(docs).select(F.col(id_col).alias("id"), tokenize(text_col).alias("_toks"))
    return tok_df.select("id", F.explode(shingles_of_tokens(F.col("_toks"), n)).alias("shingle"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity >= threshold.

    join-on-shingle -> per-pair intersection count -> |A|+|B|-inter union.
    ``max_shingle_df`` drops stop-shingles (appearing in more docs than the
    cap) before the self-join — they contribute little discrimination and
    all of the quadratic cost.
    """
    # the shingle table feeds the df cap, the size aggregate and both join
    # sides — materialized once (the minhash_near_duplicates pattern) so
    # the corpus explode doesn't re-run under every consumer; the filtered
    # table is materialized too (3 consumers) so the stop-shingle semi-join
    # runs once
    sh = _doc_shingles(docs, id_col, text_col, n).localCheckpoint(eager=True)
    if max_shingle_df is not None:
        rare = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= max_shingle_df)
        sh = sh.join(rare.select("shingle"), "shingle", "left_semi").localCheckpoint(eager=True)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("a"), "shingle")
    b = sh.select(F.col("id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "sz_b"), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _minhash_wide_from_shingles(sh: DataFrame, num_hashes: int) -> DataFrame:
    """(id, s0..s{k-1}): k min-hashes computed as k aggregate columns over
    the shingle rows — one shuffle of |shingles| rows, NO k-fold row
    explosion (the naive (id, seed, shingle) explode multiplies shuffle
    volume by k; at 100 TB that k× matters more than anything else here)."""
    return sh.groupBy("id").agg(
        *[
            F.min(F.md5(F.concat_ws(":", F.lit(s), F.col("shingle")))).alias(f"s{s}")
            for s in range(num_hashes)
        ]
    )


def _minhash_wide(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    shingle_n: int,
) -> DataFrame:
    return _minhash_wide_from_shingles(_doc_shingles(docs, id_col, text_col, shingle_n), num_hashes)


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 1,
) -> DataFrame:
    """(id, seed, sig): sig = min over shingles of md5(seed || ':' || shingle).

    md5-hex min is an order statistic on a uniform hash — the classic
    MinHash estimator, portable to any engine with md5.
    """
    wide = _minhash_wide(docs, id_col, text_col, num_hashes, shingle_n)
    pairs = F.array(*[F.struct(F.lit(s).alias("seed"), F.col(f"s{s}").alias("sig")) for s in range(num_hashes)])
    return wide.select("id", F.explode(pairs).alias("p")).select("id", "p.seed", "p.sig")


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Banded LSH: docs sharing one full band of minhash rows are candidates.

    Buckets larger than ``max_bucket`` are dropped (degenerate stop-content
    buckets; they would re-create the all-pairs join LSH exists to avoid).
    """
    banded = (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .filter(F.col("band") < bands)
        .groupBy("id", "band")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list(F.concat_ws("|", F.col("seed"), F.col("sig"))))).alias("band_sig"))
    )
    sized = banded.groupBy("band", "band_sig").agg(F.count(F.lit(1)).alias("bucket_n"))
    ok = banded.join(
        sized.filter(F.col("bucket_n") <= max_bucket).select("band", "band_sig"), ["band", "band_sig"], "left_semi"
    )
    x = ok.select("band", "band_sig", F.col("id").alias("a"))
    y = ok.select("band", "band_sig", F.col("id").alias("b"))
    return (
        x.join(y, ["band", "band_sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )


def minhash_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    shingle_n: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """The persistable LSH index: (shingles(id, shingle), banded(id, band,
    band_sig)).  Build once, write both tables out (the 100-TB shape: the
    tokenize+explode+k-hash aggregation pass happens at INDEX time, and
    every later dedup query is just bucket joins + the exact verify).
    Callers that keep it in-session should localCheckpoint ``shingles``
    first — ``banded`` derives from it, so the corpus is scanned once."""
    sh = _doc_shingles(docs, id_col, text_col, shingle_n)
    return sh, _banded_from_shingles(sh, num_hashes, bands, rows_per_band)


def _banded_from_shingles(sh: DataFrame, num_hashes: int, bands: int, rows_per_band: int) -> DataFrame:
    wide = _minhash_wide_from_shingles(sh, num_hashes)
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    F.array_sort(
                        F.array(
                            *[
                                F.concat_ws("|", F.lit(s), F.col(f"s{s}"))
                                for s in range(b * rows_per_band, min((b + 1) * rows_per_band, num_hashes))
                            ]
                        )
                    ),
                ).alias("band_sig"),
            )
            for b in range(bands)
        ]
    )
    return wide.select("id", F.explode(band_arr).alias("p")).select("id", "p.band", "p.band_sig")


def minhash_pairs_from_index(
    sh: DataFrame,
    banded: DataFrame,
    threshold: float = 0.7,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs from a (shingles, banded) index: bucket-capped
    candidate join + exact Jaccard verification.  Identical output to
    :func:`minhash_dedup_pairs`; inputs may come straight from parquet."""
    sized = banded.groupBy("band", "band_sig").agg(F.count(F.lit(1)).alias("bucket_n"))
    banded = banded.join(
        sized.filter(F.col("bucket_n") <= max_bucket).select("band", "band_sig"),
        ["band", "band_sig"],
        "left_semi",
    )
    x = banded.select("band", "band_sig", F.col("id").alias("a"))
    y = banded.select("band", "band_sig", F.col("id").alias("b"))
    cands = (
        x.join(y, ["band", "band_sig"]).filter(F.col("a") < F.col("b")).select("a", "b").dropDuplicates(["a", "b"])
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a_sh = sh.select(F.col("id").alias("a"), "shingle")
    b_sh = sh.select(F.col("id").alias("b"), "shingle")
    inter = (
        cands.join(a_sh, "a")
        .join(b_sh, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "sz_b"), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    rows_per_band: int = 4,
    shingle_n: int = 1,
    threshold: float = 0.7,
    max_bucket: int = 1000,
) -> DataFrame:
    """MinHash LSH candidates verified with exact Jaccard on the shingle
    sets — the complete near-dup pipeline in one call (index built
    in-session; the shingle table is materialized once because it feeds
    BOTH the signature aggregation and the verification join)."""
    sh = _doc_shingles(docs, id_col, text_col, shingle_n).localCheckpoint(eager=True)
    banded = _banded_from_shingles(sh, num_hashes, bands, rows_per_band)
    return minhash_pairs_from_index(sh, banded, threshold, max_bucket)


# ---------------------------------------------------------------------------
# SimHash


def simhash_fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over tf-weighted tokens -> (id, simhash as 16 hex
    chars).  Bit planes come from md5(token), so fingerprints are portable
    across engines; each bit of the plane votes +tf/-tf and the sign of the
    per-bit sum forms the fingerprint."""
    tf = (
        docs.select(F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.substring(F.md5(F.col("term")), 1, 16))
    )
    # one row per (doc, term, hex_nibble): 16 nibbles * 4 bits
    nib = tf.withColumn("pos", F.explode(F.sequence(F.lit(0), F.lit(15)))).withColumn(
        "nibble", F.conv(F.substring(F.col("h"), F.col("pos") + 1, 1), 16, 10).cast("int")
    )
    bits = nib.withColumn("bit_in_nib", F.explode(F.sequence(F.lit(0), F.lit(3)))).select(
        "id",
        (F.col("pos") * 4 + F.col("bit_in_nib")).alias("bit"),
        (
            F.when(F.expr("shiftright(nibble, 3 - bit_in_nib) & 1") == 1, F.col("tf"))
            .otherwise(-F.col("tf"))
        ).alias("vote"),
    )
    bitsums = bits.groupBy("id", "bit").agg(F.sum("vote").alias("v"))
    # reassemble: nibble value from 4 sign bits, then hex char
    return (
        bitsums.withColumn("set", (F.col("v") > 0).cast("int"))
        .withColumn("pos", (F.col("bit") / 4).cast("int"))
        .withColumn("weight", F.expr("shiftleft(set, 3 - cast(bit % 4 as int))"))
        .groupBy("id", "pos")
        .agg(F.sum("weight").alias("nibble"))
        .withColumn("hex", F.lower(F.conv(F.col("nibble").cast("string"), 10, 16)))
        .groupBy("id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "hex"))), lambda s: s.getField("hex")
                ),
            ).alias("simhash")
        )
    )


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance, banded candidates.

    Candidates share at least one of ``n_chunks`` equal chunks of the
    64-bit fingerprint; by pigeonhole that guarantees COMPLETE recall for
    max_hamming <= n_chunks - 1 (a pair differing in >= n_chunks bits can
    spread one flip into every chunk).  More chunks buy a larger complete
    radius at the cost of wider buckets — the standard LSH recall trade.
    The exact distance is then computed on the surviving pairs.
    ``n_chunks`` must divide the 16 hex characters evenly (2, 4, 8, 16)."""
    if 16 % n_chunks != 0:
        raise ValueError(f"n_chunks must divide 16 evenly, got {n_chunks}")
    width = 16 // n_chunks  # hex chars per chunk
    fps = simhash_fingerprints(docs, id_col, text_col)
    chunked = fps.withColumn("chunk", F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1)))).withColumn(
        "chunk_val", F.substring(F.col("simhash"), F.col("chunk") * width + 1, width)
    )
    a = chunked.select("chunk", "chunk_val", F.col("id").alias("a"), F.col("simhash").alias("sh_a"))
    b = chunked.select("chunk", "chunk_val", F.col("id").alias("b"), F.col("simhash").alias("sh_b"))
    cands = (
        a.join(b, ["chunk", "chunk_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b")
        .dropDuplicates(["a", "b"])
    )
    # hamming distance: popcount of xor, nibble by nibble
    nib_ham = F.aggregate(
        F.sequence(F.lit(0), F.lit(15)),
        F.lit(0),
        lambda acc, i: acc
        + F.bit_count(
            F.conv(F.substring(F.col("sh_a"), i + 1, 1), 16, 10).cast("long").bitwiseXOR(
                F.conv(F.substring(F.col("sh_b"), i + 1, 1), 16, 10).cast("long")
            )
        ),
    )
    return cands.withColumn("hamming", nib_ham).filter(F.col("hamming") <= max_hamming).select(
        "a", "b", "hamming"
    )


def minhash_probe_pairs(
    batch_sh: DataFrame,
    batch_banded: DataFrame,
    corpus_sh: DataFrame,
    corpus_banded: DataFrame,
    threshold: float = 0.7,
    max_bucket: int = 1000,
) -> DataFrame:
    """Incremental dedup: near-dup pairs between a NEW batch of documents
    and an already-indexed corpus — the steady-state shape of dedup at
    100 TB, where the corpus index is a persisted artifact
    (:func:`minhash_index` written to parquet) and each ingest batch only
    pays for its own hashing plus bucket probes, never a corpus re-hash.

    Candidates: batch band signatures joined against the corpus's banded
    index, with the bucket cap applied to CORPUS-side bucket sizes (a
    boilerplate bucket in the corpus would otherwise match every
    boilerplate batch doc — the same stop-content policy as
    :func:`lsh_candidate_pairs`).  Verification: exact Jaccard between the
    batch and corpus shingle sets.

    Output: (a = batch id, b = corpus id, jaccard).
    """
    sized = corpus_banded.groupBy("band", "band_sig").agg(F.count(F.lit(1)).alias("bucket_n"))
    ok = corpus_banded.join(
        sized.filter(F.col("bucket_n") <= max_bucket).select("band", "band_sig"),
        ["band", "band_sig"],
        "left_semi",
    )
    cands = (
        batch_banded.select("band", "band_sig", F.col("id").alias("a"))
        .join(ok.select("band", "band_sig", F.col("id").alias("b")), ["band", "band_sig"])
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    sz_a = batch_sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz_a"))
    sz_b = corpus_sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz_b"))
    a_sh = batch_sh.select(F.col("id").alias("a"), "shingle")
    b_sh = corpus_sh.select(F.col("id").alias("b"), "shingle")
    inter = (
        cands.join(a_sh, "a")
        .join(b_sh, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sz_a.withColumnRenamed("id", "a"), "a")
        .join(sz_b.withColumnRenamed("id", "b"), "b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def ngram_jaccard_pairs_prefix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard >= threshold via PREFIX FILTERING
    (the PPJoin/AllPairs family, Bayardo et al. 2007): identical output to
    :func:`ngram_jaccard_pairs` with the df cap disabled, but candidate
    generation joins only each document's PREFIX — its |d| − ⌊t·|d|⌋
    globally-rarest shingles — instead of every shingle.

    Why it's still exact: two sets with J >= t overlap in more than
    |d| − ⌈t·|d|⌉ positions of ANY common total order of their elements,
    so sorting all shingles by one global order (rarity, then shingle —
    rarity-first is what shrinks the join) guarantees qualifying pairs
    share a prefix token.  The prefix here is computed with ⌊·⌋ rather
    than ⌈·⌉ — one token longer than the tight bound — so float rounding
    of t·|d| can only widen the candidate set, never lose a pair; the
    exact Jaccard verify then removes false candidates.

    At 100 TB this is THE exact-similarity-join shape: the quadratic
    blowup lives only in the rarest shingles' tiny postings, without the
    recall loss of a df cap or the approximation of MinHash.
    """
    # One corpus-sized artifact, materialized once: the shingle table feeds
    # the df ranking, the prefix join (both sides), the size aggregate and
    # the exact verify (both sides) — 10 physical corpus re-scans when left
    # lazy, one when checkpointed (the minhash_near_duplicates pattern).
    sh = _doc_shingles(docs, id_col, text_col, n).localCheckpoint(eager=True)
    cands = _prefix_candidates(sh, threshold).select("a", "b")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    return _verify_jaccard(sh, sizes, cands, threshold)


def _prefix_candidates(sh: DataFrame, threshold: float) -> DataFrame:
    """Candidate pairs (a, b, sz_a, sz_b, pos_a, pos_b) from the prefix
    join: one row per FIRST shared prefix token of each pair (minimum
    position in the shared global rarity order), with each side's prefix
    position (0-based) and full set size — the inputs the PPJoin
    positional filter needs.  ``dropDuplicates``-free: the first shared
    occurrence is selected by a min-struct aggregate, which also dedupes.
    """
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    dfc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        sh.join(dfc, "shingle")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "shingle"))).alias("toks"))
        .join(sizes, "id")
    )
    # prefix length L = sz - floor(t*sz) + 1 (conservative ceil->floor, see
    # ngram_jaccard_pairs_prefix docstring), capped at sz
    prefix_len = F.least(
        F.col("sz"),
        F.col("sz") - F.floor(F.lit(threshold) * F.col("sz")).cast("int") + F.lit(1),
    )
    prefix = ordered.select(
        "id",
        "sz",
        F.posexplode(
            F.slice(F.transform(F.col("toks"), lambda t: t["shingle"]), F.lit(1), prefix_len)
        ).alias("pos", "shingle"),
    )
    pa = prefix.select(
        F.col("id").alias("a"), F.col("sz").alias("sz_a"), F.col("pos").alias("pos_a"), "shingle"
    )
    pb = prefix.select(
        F.col("id").alias("b"), F.col("sz").alias("sz_b"), F.col("pos").alias("pos_b"), "shingle"
    )
    return (
        pa.join(pb, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.first("sz_a").alias("sz_a"),
            F.first("sz_b").alias("sz_b"),
            # both docs sort their shingles by the SAME global (df, shingle)
            # order, so shared tokens appear in the same relative order on
            # both sides: min pos_a and min pos_b name the same token
            F.min("pos_a").alias("pos_a"),
            F.min("pos_b").alias("pos_b"),
        )
    )


def _verify_jaccard(
    sh: DataFrame, sizes: DataFrame, cands: DataFrame, threshold: float
) -> DataFrame:
    """Exact verify: intersection size over the FULL shingle sets of the
    candidate (a, b) pairs only, then the Jaccard threshold."""
    sa = sh.select(F.col("id").alias("a"), "shingle")
    sb = sh.select(F.col("id").alias("b"), "shingle")
    inter = (
        cands.join(sa, "a")
        .join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "sz_b"), "b")
        .withColumn(
            "jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def substring_containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    max_gram_df: int | None = None,
) -> DataFrame:
    """EXACT full-text substring containment: (inner_id, outer_id) pairs
    where inner's ENTIRE text occurs verbatim inside outer's — the dedup
    gap between chunk-level (exact hash) and shingle-level (Jaccard)
    dedup: a doc wholly embedded in a longer one shares no fingerprint
    with it and can sit below any Jaccard threshold, yet is pure
    redundancy for a training corpus.

    A suffix automaton answers this in one machine's RAM; the
    DISTRIBUTED shape used here is rare-gram candidate pruning: if
    contains(B, A) then every char ``k``-gram of A — including its
    globally RAREST — is also a k-gram of B, so candidates join each
    doc's single rarest gram against the gram postings (the containment
    analog of the Jaccard prefix filter), and an exact contains() verify
    runs on candidates only.  The quadratic blowup lives only in the
    rarest grams' postings, never in |docs|².

    Docs shorter than ``k`` have no k-gram; they are few and tiny by
    construction, so they broadcast and verify directly against every
    doc (a map-side contains(), no shuffle).  Self-pairs and duplicate
    candidates are removed; equal texts yield both directions.  An
    EMPTY text is (vacuously) contained in every other doc — Spark's
    instr(x, '') = 1 and DuckDB's contains(x, '') agree, so the edge is
    engine-consistent.

    SKEW ESCAPE HATCH (``max_gram_df``, OPT-IN, default None = exact):
    on templated/boilerplate corpora the rarest gram's df approaches
    |docs| and the candidate join degenerates toward all-pairs — the
    exact blowup ``max_bucket`` guards in the LSH path.  When a cap is
    SET, a doc whose RAREST gram has df > ``max_gram_df`` consists
    entirely of hub grams (the rarest is minimal over the doc), i.e. it
    is pure template text; such docs are dropped from inner-side
    candidate generation (bounded recall loss on boilerplate only — the
    same declarative cap-and-drop contract as ``lsh_candidate_pairs``;
    count the dropped docs by comparing ``docs`` against the inner ids
    if you need the audit number).  The candidate row bound becomes
    Σ_docs min(df(rarest), max_gram_df) <= |docs|·max_gram_df — linear
    in the corpus, never quadratic.  With the cap active the result is
    no longer exhaustive, so the EXACT headline above holds only for
    the default ``max_gram_df=None``.
    """
    from pyspark.sql import Window

    from usearch_spark.session import spread_small_scan

    d = spread_small_scan(docs).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )
    long_docs = d.filter(F.length("text") >= k)
    # per-doc gram dedup happens MAP-SIDE (array_distinct over the doc's
    # own bounded gram array) instead of a corpus-wide (id, gram)
    # dropDuplicates shuffle; the per-gram document frequency rides a
    # gram-partitioned window on the SAME pass, and the result — the one
    # corpus-sized artifact, used by the rarest-gram aggregate AND the
    # candidate join below — is materialized ONCE (the un-checkpointed
    # plan re-ran the whole explode+dedup pipeline for each of its three
    # uses: df counts, rarest join, candidate postings side)
    grams = (
        long_docs.select(
            "id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, length(text) - {k} + 1),"
                        f" i -> substring(text, i, {k}))"
                    )
                )
            ).alias("gram"),
        )
        .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("gram")))
        .localCheckpoint(eager=True)
    )
    rarest = grams.groupBy("id").agg(F.min(F.struct("df", "gram")).alias("_r"))
    if max_gram_df is not None:
        rarest = rarest.filter(F.col("_r.df") <= max_gram_df)
    rarest = rarest.select("id", F.col("_r.gram").alias("gram"))
    cands = (
        rarest.select(F.col("id").alias("inner_id"), "gram")
        .join(grams.select(F.col("id").alias("outer_id"), "gram"), "gram")
        .filter(F.col("inner_id") != F.col("outer_id"))
        .select("inner_id", "outer_id")
    )
    ta = d.select(F.col("id").alias("inner_id"), F.col("text").alias("_ta"))
    tb = d.select(F.col("id").alias("outer_id"), F.col("text").alias("_tb"))
    verified = (
        cands.join(ta, "inner_id")
        .join(tb, "outer_id")
        .filter(F.expr("instr(_tb, _ta) > 0"))
        .select("inner_id", "outer_id")
    )
    shorts = d.filter(F.length("text") < k)
    short_pairs = (
        tb.crossJoin(
            F.broadcast(
                shorts.select(F.col("id").alias("inner_id"), F.col("text").alias("_ta"))
            )
        )
        .filter((F.col("inner_id") != F.col("outer_id")) & F.expr("instr(_tb, _ta) > 0"))
        .select("inner_id", "outer_id")
    )
    return verified.unionByName(short_pairs)


def ppjoin_candidates(sh: DataFrame, threshold: float) -> DataFrame:
    """Prefix candidates tightened by PPJoin's LENGTH and POSITIONAL
    filters (Xiao et al. 2008) — both provably lossless for J >= t:

    * length filter: J(a,b) >= t forces t·max(|a|,|b|) <= min(|a|,|b|)
      (since |a∩b| <= min and |a∪b| >= max);
    * positional filter: if the first shared token of the global rarity
      order sits at 0-based positions (i, j), no earlier token is shared,
      so |a∩b| <= 1 + min(|a|−i−1, |b|−j−1); J >= t needs
      |a∩b| >= t/(1+t)·(|a|+|b|) (from |a∩b| >= t·|a∪b| and
      |a∪b| = |a|+|b|−|a∩b|).

    Both comparisons subtract a 1e-9 slack from the float right-hand side
    so double rounding can only WIDEN the candidate set — the exact verify
    removes anything extra; exactness never depends on float behavior.
    Returns (a, b) pairs, a strict subset of the prefix-only candidates.
    """
    c = _prefix_candidates(sh, threshold)
    eps = 1e-9
    mn, mx = F.least("sz_a", "sz_b"), F.greatest("sz_a", "sz_b")
    length_ok = mn.cast("double") >= F.lit(threshold) * mx.cast("double") - F.lit(eps)
    ubound = F.lit(1) + F.least(
        F.col("sz_a") - 1 - F.col("pos_a"), F.col("sz_b") - 1 - F.col("pos_b")
    )
    alpha = (
        F.lit(threshold / (1.0 + threshold))
        * (F.col("sz_a") + F.col("sz_b")).cast("double")
        - F.lit(eps)
    )
    pos_ok = ubound.cast("double") >= alpha
    return c.filter(length_ok & pos_ok).select("a", "b")


def ngram_jaccard_pairs_ppjoin(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard >= threshold via PPJoin (prefix +
    length + positional filters, Xiao et al. 2008): identical output to
    :func:`ngram_jaccard_pairs_prefix` — same prefix join, but candidates
    that provably cannot reach the threshold are pruned BEFORE the exact
    verify (see :func:`ppjoin_candidates`), typically cutting verify work
    another 2-5x.  The 100-TB shape is unchanged: the quadratic blowup
    lives only in rare-shingle postings, and the extra filters are
    per-candidate-row expressions, no new shuffle."""
    # Same shared-shingle-table materialization as the prefix variant.
    sh = _doc_shingles(docs, id_col, text_col, n).localCheckpoint(eager=True)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    return _verify_jaccard(sh, sizes, ppjoin_candidates(sh, threshold), threshold)


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 8,
) -> DataFrame:
    """EXACT duplicated-substring SPANS: per document, each maximal
    contiguous union of duplicated ``min_len``-token windows — every
    token in a reported span is covered by at least one window that
    occurs twice or more in the corpus (counting within-document
    repeats), and consecutive duplicated windows whose starts are
    <= ``min_len`` apart merge into one span.  (A span may therefore
    contain interior ``min_len``-windows that occur only once — the
    guarantee is coverage by duplicated windows, not duplication of
    every sub-window.)  This is the span-level removal semantics of
    Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better" (ExactSubstr): training pipelines REMOVE the
    duplicated span and keep the rest of the document, where doc-level
    dedup would either keep the redundancy or drop unique text.

    Distributed shape (the suffix-array of the paper is single-machine):
    one tokenize+sliding-window explode emits (doc, pos, window-hash)
    rows — n_tokens rows per doc, linear; ONE shuffle counts global
    window multiplicity (partial-agg safe: hub windows aggregate to a
    single count row, never materializing their occurrence pairs); the
    duplicated positions join back co-partitioned by hash and collapse
    into maximal spans with an islands pass over a PER-DOCUMENT
    partitioned window (two overlapping windows [p, p+L-1], [q, q+L-1]
    merge iff q − p <= L).  Window identity is the md5 of the joined
    tokens so shuffle rows stay fixed-width regardless of L.

    Output: (id_col, span_start, span_end, span_tokens) — 0-based
    inclusive TOKEN offsets, ordered within each doc.  Every decision is
    exact integer arithmetic over deterministic hashes, so a SQL oracle
    replays the spans bit-for-bit."""
    from pyspark.sql import Window

    from usearch_spark.session import spread_small_scan

    toks = spread_small_scan(docs).select(
        F.col(id_col).alias("id"), tokenize(text_col).alias("_toks")
    )
    wins = toks.filter(F.size("_toks") >= min_len).select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(_toks) - {min_len} + 1),"
                f" i -> md5(array_join(slice(_toks, i, {min_len}), ' ')))"
            )
        ).alias("pos", "h"),
    )
    dup_h = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("h")
    )
    dup_pos = wins.join(dup_h, "h").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    islands = dup_pos.withColumn(
        "_new",
        F.when(F.col("pos") - F.lag("pos").over(w) > min_len, 1).otherwise(0),
    ).withColumn("_isl", F.sum("_new").over(w))
    return (
        islands.groupBy("id", "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(min_len - 1)).alias("span_end"),
        )
        .select(
            F.col("id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def edit_distance_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    q: int = 3,
    max_dist: int = 8,
) -> DataFrame:
    """EXACT all-pairs EDIT-DISTANCE join: every unordered pair with
    ``levenshtein(text_a, text_b) <= max_dist``, found without the
    quadratic verify — the PREFIX FILTER of Ed-Join (Xiao, Wang & Lin,
    PVLDB 2008, building on Gravano et al. 2001's q-gram bound).  A
    single edit destroys at most ``q`` of a string's overlapping
    q-grams, so a pair within distance ``d`` shares at least
    ``LB = max(n1, n2) - q + 1 - q*d`` gram OCCURRENCES (multiset
    semantics — occurrences are made set-like by tagging each gram with
    its within-string repeat index).  By the AllPairs/PPJoin prefix
    lemma, two multisets overlapping in >= LB elements must then share
    an element among each side's first ``q*d + 1`` elements of ANY
    common total order — so candidate generation joins ONLY each
    string's ``q*d + 1`` globally-RAREST gram-occurrences
    ((df, elem)-ordered), and only candidates pay the O(n*d) banded-DP
    verify.  Rarity-first ordering is what bounds the join: hub grams
    (templated/small-vocabulary corpora) sort to the back and never
    enter a posting list unless a string has nothing rarer.

    Exactness: the prefix filter is a proven NECESSARY condition, so
    output is identical to the naive all-pairs join (the oracle runs
    the naive form).  Strings short enough that LB <= 0 for a
    same-length partner — ``n <= q*(d+1) - 1`` — carry no filtering
    guarantee among THEMSELVES, so the (by contract tiny, e.g. <= 26
    chars at the defaults) short bucket is verified densely via a
    broadcast loop; short-vs-long pairs keep LB > 0 and stay on the
    filtered path.  The length filter ``|n1 - n2| <= d`` (edit distance
    is at least the length gap) prunes candidates at the join.

    Distributed shape at 100 TB: the element-df count and the per-string
    rarity ranking are one shuffle each (the ranking window partitions
    by string id — bounded by grams-per-string); the candidate join
    touches only prefix postings, whose lists stay short precisely
    because they hold the rare tail of the df distribution.  Verify
    touches candidates only.

    Two physical choices (r15, measured 10-20s -> ~4s at sf0.1):

    - ``prefix`` is MATERIALIZED once (localCheckpoint): it feeds BOTH
      sides of the candidate self-join, and Catalyst re-derives the
      whole explode -> occ-window -> df-agg -> rank-window pipeline per
      side otherwise (two full copies in the physical plan).  The
      checkpoint is q*d+1 rows per string — proportional to the string
      COUNT, never the gram volume — so it is cheap at any scale.
    - the candidate set is repartitioned on (a, b) with an EXPLICIT
      partition count before dedup + verify: the banded-DP verify is
      CPU-dense but tiny in bytes (~20 B/pair), and AQE's byte-based
      coalescing would funnel millions of levenshtein calls onto 1-3
      tasks; a user-specified repartition count is exempt from AQE
      coalescing, and the dedup aggregation reuses the same exchange.

    Output: (id_col + ``_a``, id_col + ``_b``, dist), a < b.
    """
    from pyspark.sql import Window

    spark = docs.sparkSession
    s = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("s")
    ).withColumn("n", F.length("s"))
    short_max = q * (max_dist + 1) - 1
    prefix_len = q * max_dist + 1

    elems = (
        s.filter(F.col("n") >= q)
        .select(
            "id",
            "n",
            F.posexplode(
                F.expr(f"transform(sequence(1, n - {q} + 1), i -> substring(s, i, {q}))")
            ).alias("pos", "gram"),
        )
        .withColumn(
            "occ",
            F.row_number().over(Window.partitionBy("id", "gram").orderBy("pos")),
        )
        .withColumn("elem", F.concat_ws("#", "gram", "occ"))
    )
    dfc = elems.groupBy("elem").agg(F.count(F.lit(1)).alias("df"))
    prefix = (
        elems.join(dfc, "elem")
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("id").orderBy("df", "elem"))
        )
        .filter(F.col("rk") <= prefix_len)
        .select("id", "n", "elem")
        # materialize once: both candidate-join sides read this frame
        .localCheckpoint(eager=True)
    )
    pa = prefix.select(F.col("id").alias("a"), F.col("n").alias("n_a"), "elem")
    pb = prefix.select(F.col("id").alias("b"), F.col("n").alias("n_b"), "elem")
    cand = (
        pa.join(pb, "elem")
        .filter(
            (F.col("a") < F.col("b"))
            & (F.abs(F.col("n_a") - F.col("n_b")) <= max_dist)
        )
        .select("a", "b")
    )
    shorts = s.filter(F.col("n") <= short_max)
    dense = (
        shorts.select(F.col("id").alias("a"), F.col("n").alias("n_a"))
        .crossJoin(
            F.broadcast(shorts.select(F.col("id").alias("b"), F.col("n").alias("n_b")))
        )
        .filter(
            (F.col("a") < F.col("b"))
            & (F.abs(F.col("n_a") - F.col("n_b")) <= max_dist)
        )
        .select("a", "b")
    )
    # explicit count: AQE must not byte-coalesce the CPU-dense verify
    n_part = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    cands = (
        cand.unionByName(dense)
        .repartition(n_part, "a", "b")
        .dropDuplicates(["a", "b"])
    )
    ta = s.select(F.col("id").alias("a"), F.col("s").alias("s_a"))
    tb = s.select(F.col("id").alias("b"), F.col("s").alias("s_b"))
    return (
        cands.join(ta, "a")
        .join(tb, "b")
        # threshold form = the BANDED O(n*d) DP (returns -1 past the
        # threshold) — the verify is the hot loop, and the band cuts it
        # ~n/(2d+1)-fold vs the full matrix
        .withColumn("dist", F.expr(f"levenshtein(s_a, s_b, {max_dist})"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select(
            F.col("a").alias(f"{id_col}_a"),
            F.col("b").alias(f"{id_col}_b"),
            "dist",
        )
    )


def cdc_dedup_stats(
    docs: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
    w: int = 8,
    base: int = 131,
    prime: int = 1_000_003,
    divisor: int = 16,
) -> DataFrame:
    """CONTENT-DEFINED CHUNKING dedup audit (the rsync / LBFS rolling-
    hash recipe, Muthitacharoen et al. 2001) — the storage-level
    near-dup measure for opaque payloads: fixed-offset chunking breaks
    under a 1-byte shift, but cutting wherever a w-byte rolling hash
    ≡ 0 (mod divisor) re-synchronizes after any local edit, so shared
    runs between blobs dedupe at CHUNK granularity even when whole-blob
    hashes differ (the multimodal companion to dedup_exact /
    dedup_substring; payloads here are ASCII byte streams, so code
    points ARE bytes).

    Per group: chunk count, distinct-chunk count (by md5 of chunk
    bytes), total vs distinct chunk bytes, and the storage ratio
    distinct/total — the "what would a CDC store pay" number.

    Determinism: the window hash Σ c_{i−j}·B^j is EXACT int64 BEFORE
    one mod (w ≤ 8, B ≤ 131, bytes ≤ 255 keeps the sum < 2⁶³ — no
    incremental mod, so no engine-order concern), boundaries and chunk
    substrings are integer decisions, md5 of identical bytes matches
    across engines, counts are exact, and the ratio is ONE divide.

    Distributed shape: O(n·w) in-row transforms per doc (no UDF — the
    char stream never leaves the JVM), one explode to chunk rows, one
    (group, md5) collapse, one final groupBy.  No windows, no collects.

    Output: group_cols + (n_docs, n_chunks, n_distinct, total_chars,
    distinct_chars, dedup_ratio).  A group whose every document has
    empty text still appears (n_docs kept, chunk counters 0, NULL
    dedup_ratio) — the audit must not silently drop groups.
    """
    n = F.length(F.col(text_col))
    chars = F.transform(F.split(F.col(text_col), ""), F.ascii)
    d = docs.withColumn("_n", n).withColumn("_c", chars)

    def el(i):
        return F.element_at(F.col("_c"), i.cast("int"))

    def win_hash(i):
        s = el(i).cast("long")
        for j in range(1, w):
            s = s + el(i - j).cast("long") * F.lit(base**j).cast("long")
        return s % F.lit(prime).cast("long")

    positions = F.when(
        F.col("_n") >= w, F.sequence(F.lit(w), F.col("_n"))
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.filter(
        positions, lambda i: (win_hash(i) % divisor == 0) & (i < F.col("_n"))
    )
    bounds = F.concat(
        F.array(F.lit(0)), cuts.cast("array<int>"), F.array(F.col("_n"))
    )
    d = d.withColumn("_b", bounds)
    m = F.size("_b")
    # substring(text, start+1, len) per consecutive bound pair
    chunks = F.transform(
        F.sequence(F.lit(1), m - 1),
        lambda k: F.expr(text_col).substr(
            F.element_at(F.col("_b"), k.cast("int")) + 1,
            F.element_at(F.col("_b"), (k + 1).cast("int"))
            - F.element_at(F.col("_b"), k.cast("int")),
        ),
    )
    rows = (
        d.select(*group_cols, F.explode(chunks).alias("chunk"))
        .filter(F.length("chunk") > 0)
        .select(
            *group_cols,
            F.md5(F.encode(F.col("chunk"), "utf-8")).alias("h"),
            F.length("chunk").alias("clen"),
        )
    )
    per_hash = rows.groupBy(*group_cols, "h").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("clen").alias("clen")
    )
    g = per_hash.groupBy(*group_cols).agg(
        F.sum("cnt").alias("n_chunks"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("cnt") * F.col("clen")).alias("total_chars"),
        F.sum("clen").alias("distinct_chars"),
    )
    nd = docs.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_docs"))
    return nd.join(g, group_cols, "left").select(
        *group_cols,
        "n_docs",
        F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        F.coalesce("total_chars", F.lit(0)).alias("total_chars"),
        F.coalesce("distinct_chars", F.lit(0)).alias("distinct_chars"),
        F.when(
            F.col("total_chars") > 0,
            F.col("distinct_chars").cast("double")
            / F.col("total_chars").cast("double"),
        ).alias("dedup_ratio"),
    )
