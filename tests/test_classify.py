"""Multinomial Naive Bayes (operators/classify.py): recovery of separable
classes, the smoothed-floor path for unseen tokens, the exact-integer
scoring contract (pure-Python replay), and deterministic tie-breaks."""

from __future__ import annotations

from pyspark.sql import functions as F

from usearch_spark.operators.classify import nb_classify, nb_train


def _corpus(spark):
    """Two clearly separable classes + shared filler vocabulary."""
    rows = []
    for i in range(20):
        rows.append((i, "sports", "goal match team score win play the and of"))
        rows.append((100 + i, "finance", "market stock price trade fund yield the and of"))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_nb_recovers_separable_classes(spark):
    docs = _corpus(spark)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    token_lp, class_stats = nb_train(train)
    got = {r["doc_id"]: r["label_pred"] for r in nb_classify(test, token_lp, class_stats).collect()}
    want = {r["doc_id"]: r["source"] for r in test.collect()}
    assert got == want and len(got) == 20


def test_nb_unseen_tokens_hit_floor_and_scores_replay(spark):
    """A test doc of entirely unseen tokens scores prior + n·floor per
    class — replayed in pure Python from the same micro-nat arithmetic,
    pinning the all-integer contract the oracle depends on."""
    import math

    docs = _corpus(spark)
    token_lp, class_stats = nb_train(docs)
    test = spark.createDataFrame(
        [(999, "zzz yyy xxx www")], "doc_id long, text string"
    )
    out = nb_classify(test, token_lp, class_stats).collect()[0]

    # python replay: counts from the training corpus
    n_per_class = 9 * 20  # 9 tokens x 20 docs per class
    vocab = 9 + 9 - 3  # two 9-token vocabularies sharing 'the and of'
    floor_u = math.floor(math.log(1.0 / (n_per_class + vocab)) * 1e6 + 0.5)
    prior_u = math.floor(math.log(20 / 40) * 1e6 + 0.5)
    want_u = prior_u + 4 * floor_u
    assert out["score"] == want_u / 1e6
    # tie across both classes -> lexicographically smaller label wins
    assert out["label_pred"] == "finance"


def test_nb_score_is_micro_nat_exact(spark):
    """Every emitted score is an exact multiple of 1e-6 nats (the single
    cast+divide contract — no float accumulation anywhere)."""
    docs = _corpus(spark)
    token_lp, class_stats = nb_train(docs)
    out = nb_classify(docs, token_lp, class_stats).collect()
    assert len(out) == 40
    for r in out:
        assert abs(r["score"] * 1e6 - round(r["score"] * 1e6)) < 1e-6


def test_nb_scores_token_less_documents_with_prior(spark):
    """The 'score every document' contract: a doc whose text tokenizes to
    nothing still gets a row — the prior-only argmax (ties to the
    smaller label), not a silent drop."""
    import math

    docs = _corpus(spark).union(
        spark.createDataFrame(
            [(300, "finance", "market fund"), (301, "finance", "")],
            "doc_id long, source string, text string",
        )
    )
    token_lp, class_stats = nb_train(_corpus(spark))
    out = {r["doc_id"]: r for r in nb_classify(docs, token_lp, class_stats).collect()}
    assert set(out) == {r["doc_id"] for r in docs.collect()}  # nothing dropped
    empty = out[301]
    # equal priors (20/40 each) -> tie -> lexicographically smaller label
    assert empty["label_pred"] == "finance"
    assert empty["score"] == math.floor(math.log(0.5) * 1e6 + 0.5) / 1e6
