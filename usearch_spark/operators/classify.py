"""Distributed text classification: multinomial Naive Bayes train + score.

The workhorse of LLM-corpus curation is a cheap linear text classifier —
fastText/CCNet-style domain and quality filters score every document and
gate what enters the training mix.  This module implements the classic
multinomial Naive Bayes form (Laplace smoothing, log-space scoring) as
pure DataFrame aggregations: TRAINING is one (label, token) count shuffle
plus tiny per-class totals, SCORING is one bounded fan-out join — both
linear in the corpus, no driver-side math, no UDFs.

Reference parity: the reference engine carries no classifier (its corpus
is one crawl); this operator belongs to the training-data extension
surface and follows the published method only (McCallum & Nigam 1998's
multinomial event model).

Determinism contract (hash-gate rules): log-probabilities are quantized
to INTEGER MICRO-NATS at birth — lp_u = floor(ln(ratio)·1e6 + 0.5) —
where ln/multiply/add are correctly-rounded IEEE primitives on identical
inputs and floor is exact, so both engines produce the identical int64.
Everything downstream (tf·lp_u products, per-(doc,class) sums, the
argmax, tie-breaks to the smaller label) is exact integer arithmetic; a
SQL oracle replays the whole classifier bit-for-bit.  The only doubles
in the output are one cast + one divide at the end.

Scale shape at 100 TB: the per-class token table is |classes|·|vocab|
rows (a dimension, not a fact); scoring joins the test corpus's (doc,
token, tf) rows against it co-partitioned by token and fans each row out
|classes| times via a broadcast class list — candidate rows =
corpus_tokens · |classes|, linear, and the per-(doc,class) partial
aggregation combines map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from usearch_spark.functions.text import tokenize

_MICRO = 1_000_000.0


def _lp_u(ratio_col) -> F.Column:
    """ln(ratio) quantized to integer micro-nats: floor(x·1e6 + 0.5).
    Every step is a correctly-rounded IEEE primitive on identical inputs,
    floor is exact — any engine reproduces the same int64."""
    return F.floor(F.log(ratio_col) * F.lit(_MICRO) + F.lit(0.5)).cast("long")


def nb_train(
    docs: DataFrame,
    label_col: str = "source",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Train: -> (token_lp, class_stats).

    token_lp: (label, tok, lp_u) — Laplace-smoothed class-conditional
    log-prob ln((c_tc + 1)/(c_c + V)) in micro-nats, V = training
    vocabulary size.  class_stats: (label, prior_u, floor_u) — the class
    prior ln(n_docs_c/n_docs) and the unseen-token floor
    ln(1/(c_c + V)), micro-nats both."""
    toks = docs.select(
        F.col(label_col).alias("label"), F.explode(tokenize(text_col)).alias("tok")
    )
    # The (label, tok) count table IS the model dimension (|classes|·|vocab|
    # rows) and every other training statistic is an exact projection of it:
    # class token totals are sum(c) per label and the vocabulary size is its
    # distinct-tok count.  Materializing it once means the corpus
    # tokenize+explode runs a single time instead of under every consumer
    # (token_lp, cc, vocab — 5 physical re-scans of the training corpus
    # before this).
    ctc = (
        toks.groupBy("label", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    cc = ctc.groupBy("label").agg(F.sum("c").alias("n"))
    vocab = ctc.select("tok").distinct().agg(F.count(F.lit(1)).alias("v"))
    token_lp = (
        ctc.join(F.broadcast(cc), "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            "tok",
            _lp_u((F.col("c") + 1).cast("double") / (F.col("n") + F.col("v"))).alias(
                "lp_u"
            ),
        )
    )
    # |classes|-row doc counts, materialized so the corpus total derives
    # from them instead of a second full corpus scan (a null label groups
    # like any other value, so sum(nd) is exactly count(*)).
    nd = (
        docs.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("nd"))
        .localCheckpoint(eager=True)
    )
    total = nd.agg(F.sum("nd").alias("nt"))
    class_stats = (
        cc.join(nd, "label")
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            _lp_u(F.col("nd").cast("double") / F.col("nt")).alias("prior_u"),
            _lp_u(F.lit(1.0) / (F.col("n") + F.col("v"))).alias("floor_u"),
        )
    )
    return token_lp, class_stats


def nb_classify(
    docs: DataFrame,
    token_lp: DataFrame,
    class_stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against every class and take the argmax
    (ties to the lexicographically smaller label): (id_col, label_pred,
    score) with score = max log-posterior in nats (one cast + one divide
    from the exact integer sum).  Unseen (label, tok) pairs pay the
    class's smoothed floor.  A document whose text tokenizes to ZERO
    tokens still gets a row (the "score every document" contract): its
    log-posterior has no token term, so it scores the prior-only argmax
    — delivered by a left join from the doc spine onto the token scores
    plus a 1-row broadcast of the best prior."""
    tf = (
        docs.select(F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    fanned = tf.crossJoin(F.broadcast(class_stats)).join(
        token_lp, ["label", "tok"], "left"
    )
    scores = (
        fanned.select(
            "id",
            "label",
            "prior_u",
            (F.col("tf") * F.coalesce(F.col("lp_u"), F.col("floor_u"))).alias("part_u"),
        )
        .groupBy("id", "label", "prior_u")
        .agg(F.sum("part_u").alias("tok_u"))
        .select("id", "label", (F.col("prior_u") + F.col("tok_u")).alias("score_u"))
    )
    best = scores.groupBy("id").agg(
        F.min(F.struct((-F.col("score_u")).alias("neg"), F.col("label").alias("l"))).alias("b")
    )
    spine = docs.select(F.col(id_col).alias("id")).dropDuplicates(["id"])
    prior_best = class_stats.agg(
        F.min(
            F.struct((-F.col("prior_u")).alias("neg"), F.col("label").alias("l"))
        ).alias("pb")
    )
    return (
        spine.join(best, "id", "left")
        .crossJoin(F.broadcast(prior_best))
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("b.l"), F.col("pb.l")).alias("label_pred"),
            (
                (-F.coalesce(F.col("b.neg"), F.col("pb.neg"))).cast("double")
                / F.lit(_MICRO)
            ).alias("score"),
        )
    )
