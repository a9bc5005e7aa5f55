"""Corpus-curation operators: decontamination, duplicate-cluster
resolution, boilerplate coverage, PII scrubbing, filter funnel, and
label centroids (usearch_spark/operators/corpus.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usearch_spark.operators.corpus import (
    boilerplate_coverage,
    decontaminate,
    filter_funnel,
    label_centroids,
    resolve_duplicate_clusters,
    scrub_pii,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# decontamination


def test_decontaminate_flags_exact_copy(spark):
    eval_df = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),  # identical -> contamination 1.0
            (2, "zeta eta theta iota kappa"),  # disjoint -> 0.0
            (3, "alpha beta gamma nine ten eleven"),  # 1 of 4 grams shared
        ],
    )
    out = {r["doc_id"]: r for r in decontaminate(train, eval_df, n=3, threshold=0.5).collect()}
    assert out[1]["contamination"] == 1.0 and out[1]["contaminated"]
    assert out[2]["n_hits"] == 0 and not out[2]["contaminated"]
    # doc 3: grams {a b g, b g nine, g nine ten, nine ten eleven}, 1 shared
    assert out[3]["n_grams"] == 4 and out[3]["n_hits"] == 1
    assert out[3]["contamination"] == 0.25 and not out[3]["contaminated"]


def test_decontaminate_short_docs_drop_out(spark):
    eval_df = _docs(spark, [(100, "alpha beta gamma")])
    train = _docs(spark, [(1, "two words")])  # < n tokens -> no grams -> absent
    assert decontaminate(train, eval_df, n=3).count() == 0


def test_decontaminate_eval_side_is_broadcast(spark):
    eval_df = _docs(spark, [(100, "alpha beta gamma")])
    train = _docs(spark, [(1, "alpha beta gamma delta")])
    plan = decontaminate(train, eval_df, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# duplicate-cluster resolution


def test_resolve_clusters_chains_transitively(spark):
    # 1~2, 2~3 chain into one cluster even though (1,3) was never a pair
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "a long, b long")
    out = {r["doc_id"]: r for r in resolve_duplicate_clusters(pairs).collect()}
    assert {out[i]["cluster_id"] for i in (1, 2, 3)} == {1}
    assert out[1]["cluster_size"] == 3 and out[5]["cluster_size"] == 2
    assert out[1]["keep"] and not out[2]["keep"] and not out[3]["keep"]
    assert out[5]["keep"] and not out[6]["keep"]


def test_resolve_clusters_only_paired_docs_appear(spark):
    pairs = spark.createDataFrame([(7, 9)], "a long, b long")
    rows = resolve_duplicate_clusters(pairs).collect()
    assert {r["doc_id"] for r in rows} == {7, 9}


# ---------------------------------------------------------------------------
# boilerplate


def test_boilerplate_coverage_ratio(spark):
    # gram "nav bar" appears in 3 docs (df=3 >= min_df); the rest are unique
    docs = _docs(
        spark,
        [
            (1, "nav bar alpha beta"),
            (2, "nav bar gamma delta"),
            (3, "nav bar epsilon zeta"),
        ],
    )
    out = {r["doc_id"]: r for r in boilerplate_coverage(docs, n=2, min_df=3).collect()}
    # each doc: 3 distinct 2-grams, exactly 1 of which ("nav bar") is hot
    for i in (1, 2, 3):
        assert out[i]["n_grams"] == 3 and out[i]["n_boiler"] == 1
        assert out[i]["boiler_ratio"] == pytest.approx(0.3333)


def test_boilerplate_none_below_min_df(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "d e f")])
    out = boilerplate_coverage(docs, n=2, min_df=2).collect()
    assert all(r["n_boiler"] == 0 for r in out)


# ---------------------------------------------------------------------------
# PII scrub


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("contact bob.smith+x@corp.example.org now", "contact <EMAIL> now"),
        ("host 192.168.0.1 port", "host <IP> port"),
        ("call 555-867-5309 today", "call <PHONE> today"),
        ("card 4111 2222 3333 4444 ok", "card <PHONE> ok"),
        ("serial 123456789", "serial <PHONE>"),  # 8+ digit run is phone-shaped
        ("serial 12345", "serial <NUM>"),
        ("year 2024 is fine", "year <NUM> is fine"),
        ("no pii here 42", "no pii here 42"),
    ],
)
def test_scrub_pii_patterns(spark, raw, expected):
    row = spark.range(1).select(scrub_pii(F.lit(raw)).alias("s")).first()
    assert row["s"] == expected


def test_scrub_pii_order_email_before_numbers(spark):
    # the email must be masked whole, not half-eaten by the number rule
    row = spark.range(1).select(scrub_pii(F.lit("a12345@b.co and 12345")).alias("s")).first()
    assert row["s"] == "<EMAIL> and <NUM>"


# ---------------------------------------------------------------------------
# funnel


def test_filter_funnel_cumulative_counts(spark):
    df = spark.range(100).toDF("n")
    out = filter_funnel(
        df,
        [
            ("lt_50", F.col("n") < 50),
            ("even", F.col("n") % 2 == 0),
            ("gt_10", F.col("n") > 10),
        ],
    ).collect()
    by = {r["stage"]: r for r in out}
    assert (by["lt_50"]["rows_in"], by["lt_50"]["rows_out"]) == (100, 50)
    assert (by["even"]["rows_in"], by["even"]["rows_out"]) == (50, 25)
    assert (by["gt_10"]["rows_in"], by["gt_10"]["rows_out"]) == (25, 19)
    assert [r["stage_idx"] for r in sorted(out, key=lambda r: r["stage_idx"])] == [0, 1, 2]
    assert all(r["dropped"] == r["rows_in"] - r["rows_out"] for r in out)


def test_filter_funnel_single_scan(spark):
    # all counters come from ONE aggregation: exactly one scan of the input
    df = spark.range(10).toDF("n")
    out = filter_funnel(df, [("a", F.col("n") > 1), ("b", F.col("n") > 5)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_filter_funnel_requires_stages(spark):
    with pytest.raises(ValueError):
        filter_funnel(spark.range(1), [])


# ---------------------------------------------------------------------------
# centroids


def test_label_centroids_exact_means(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [3.0, 6.0], 0), (3, [10.0, 20.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {(r["label"], r["pos"]): r for r in label_centroids(emb).collect()}
    assert out[(0, 0)]["centroid"] == 2.0 and out[(0, 1)]["centroid"] == 4.0
    assert out[(1, 0)]["centroid"] == 10.0 and out[(1, 1)]["centroid"] == 20.0
    assert out[(0, 0)]["n_vecs"] == 2 and out[(1, 0)]["n_vecs"] == 1


def test_weighted_sample_matches_reference_impl(spark):
    """The engine's draws equal a hand-computed Efraimidis-Spirakis pass
    (same md5-prefix uniforms), and the sample is deterministic."""
    import hashlib
    import math

    from usearch_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame([(i, (i % 7) + 1) for i in range(200)], "k long, w int")
    got = [tuple(r) for r in weighted_sample(df, "k", "w", k=20).collect()]

    def draw(key, w):
        h = hashlib.md5(str(key).encode()).hexdigest()
        u = (int(h[:8], 16) + 0.5) / 2**32
        return round(-math.log(u) / w, 9)

    expect = sorted(((k, w, draw(k, w)) for k, w in [(i, (i % 7) + 1) for i in range(200)]),
                    key=lambda t: (t[2], t[0]))[:20]
    assert got == expect
    again = [tuple(r) for r in weighted_sample(df, "k", "w", k=20).collect()]
    assert again == got


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from usearch_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame([(1, 5), (2, 0), (3, -4), (4, 3)], "k long, w int")
    got = {r["k"] for r in weighted_sample(df, "k", "w", k=10).collect()}
    assert got == {1, 4}


def test_ngram_novelty_first_occurrence_owns_gram(spark):
    """Doc 0 owns all its trigrams (novelty 1); an exact copy at doc 1
    scores 0; a half-overlapping doc 2 scores its new-gram share."""
    from usearch_spark.operators.corpus import ngram_novelty

    t0 = "the quick brown fox jumps"
    rows = [(0, t0), (1, t0), (2, "brown fox jumps over lazy dogs")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
    assert got[0]["novelty"] == 1.0 and got[0]["n_grams"] == 3
    assert got[1]["novelty"] == 0.0 and got[1]["n_grams"] == 3
    # doc 2 grams: 'brown fox jumps' (seen), + 3 new
    assert got[2]["n_grams"] == 4 and got[2]["n_novel"] == 3
    assert got[2]["novelty"] == 0.75


def test_coverage_select_greedy_maxcover(spark):
    """Greedy picks the doc with the most grams first, then the doc
    adding the most UNCOVERED grams (not the second-biggest doc), with
    exact gains and cumulative totals."""
    from usearch_spark.operators.corpus import coverage_select

    rows = [
        (0, "a b c d e f"),          # 4 trigrams: abc bcd cde def
        (1, "a b c d e"),            # 3 trigrams, all covered by doc 0
        (2, "x y z w"),              # 2 fresh trigrams: xyz yzw
        (3, "a b c x y z"),          # abc bcx cxy xyz -> 2 fresh after 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["pick_rank"], r["doc_id"], r["gain"], r["covered_total"])
        for r in coverage_select(df, k=3).orderBy("pick_rank").collect()
    ]
    # round 1: doc 0 (4 grams). round 2: doc 3 adds bcx cxy xyz (3 fresh,
    # abc covered) beating doc 2's 2. round 3: doc 2 adds only yzw (xyz
    # now covered) -> gain 1.
    assert got == [(1, 0, 4, 4), (2, 3, 3, 7), (3, 2, 1, 8)]
