"""Search operator tests, modeled on the reference index conformance suite
(textindexer/index/indextest/suite.go): match vs phrase semantics, offset
pagination incl. past-end, score-driven ordering, pagerank blend."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usearch_spark.operators.search import (
    SearchIndex,
    build_positional_postings,
    build_postings,
    doc_frequencies,
    paginate,
    phrase_filter,
    phrase_match_positional,
    score_match,
)

DOCS = [
    # (link_id, url, title, content, pagerank)
    ("d1", "http://a/1", "Spark engine", "the spark engine executes queries fast", 0.0),
    ("d2", "http://a/2", "Cooking", "slow cooked stew with spark of flavor spark spark", 0.0),
    ("d3", "http://a/3", "Graphs", "pagerank ranks pages by link structure", 0.5),
    ("d4", "http://a/4", "Engines", "query engines and spark engine internals", 0.0),
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(
        [(d[0], d[1], d[2], d[3], d[4], None) for d in DOCS],
        "link_id string, url string, title string, content string, pagerank double, indexed_at timestamp",
    )
    return df


@pytest.fixture(scope="module")
def index(docs):
    return SearchIndex(docs)


def test_postings_tf(docs):
    p = build_postings(docs)
    row = p.filter((F.col("link_id") == "d2") & (F.col("term") == "spark")).first()
    assert row["tf"] == 3


def test_match_scores_tf_weighted(index):
    total, page = index.search("spark")
    assert total == 3  # d1, d2, d4 contain 'spark'
    rows = page.collect()
    ids = [r["link_id"] for r in rows]
    # d2 has tf=3 -> highest; d1 has title+content (tf=2); d4 tf=1
    assert ids[0] == "d2"
    assert set(ids) == {"d1", "d2", "d4"}


def test_phrase_match(docs):
    hits = phrase_filter(docs, "spark engine")
    assert {r["link_id"] for r in hits.collect()} == {"d1", "d4"}
    # phrase must be contiguous: 'engine spark' matches nothing
    assert phrase_filter(docs, "engine spark").count() == 0


def test_phrase_positional_agrees_with_substring_scan(docs):
    """The index-backed phrase path must return exactly the docs the
    normalized-substring scan returns, for any phrase."""
    positional = build_positional_postings(docs)
    for phrase in ["spark engine", "engine spark", "the spark engine", "spark", "no such phrase"]:
        via_scan = {r["link_id"] for r in phrase_filter(docs, phrase).collect()}
        via_index = {r["link_id"] for r in phrase_match_positional(positional, phrase).collect()}
        assert via_index == via_scan, phrase


def test_phrase_positional_rarest_first_same_result(docs):
    """Join reordering by ascending document frequency must not change the
    match set; a phrase term missing from the corpus short-circuits."""
    positional = build_positional_postings(docs)
    dfreq = positional.groupBy("term").agg(F.countDistinct("link_id").alias("df"))
    for phrase in ["spark engine", "the spark engine", "engine spark"]:
        plain = {r["link_id"] for r in phrase_match_positional(positional, phrase).collect()}
        ordered = {
            r["link_id"] for r in phrase_match_positional(positional, phrase, dfreq=dfreq).collect()
        }
        assert ordered == plain, phrase
    assert phrase_match_positional(positional, "spark nonexistentterm", dfreq=dfreq).count() == 0


def test_phrase_via_quoted_expression(index):
    total, page = index.search('"spark engine"')
    assert total == 2


def test_query_punctuation_matches_index_analyzer(index):
    """Query text runs through the same analyzer as the index: punctuation
    must not glue onto terms and kill the match."""
    total_clean, _ = index.search("spark")
    total_punct, _ = index.search("spark,")
    assert total_punct == total_clean == 3
    total_phrase, _ = index.search('"spark engine."')
    assert total_phrase == 2


def test_result_page_ordered_and_single_pagerank_column(index):
    _, page = index.search("spark")
    assert page.columns.count("pagerank") == 1
    rows = page.collect()
    scores = [r["final_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_pagination_past_end(index):
    total, page = index.search("spark", offset=10, size=10)
    assert total == 3
    assert page.count() == 0


def test_pagination_pages_disjoint(index):
    _, p1 = index.search("spark", offset=0, size=2)
    _, p2 = index.search("spark", offset=2, size=2)
    ids1 = {r["link_id"] for r in p1.collect()}
    ids2 = {r["link_id"] for r in p2.collect()}
    assert len(ids1) == 2 and len(ids2) == 1
    assert not ids1 & ids2


def test_pagerank_blend_reorders(spark):
    """Score-driven re-ordering: raising a doc's pagerank must promote it
    (indextest/suite.go:314-372)."""
    docs = spark.createDataFrame(
        [
            ("a", "u1", "x", "common term here", 0.0, None),
            ("b", "u2", "x", "common common term", 0.0, None),
        ],
        "link_id string, url string, title string, content string, pagerank double, indexed_at timestamp",
    )
    idx = SearchIndex(docs)
    _, page = idx.search("common")
    assert [r["link_id"] for r in page.collect()][0] == "b"

    boosted = docs.withColumn("pagerank", F.when(F.col("link_id") == "a", 10.0).otherwise(0.0))
    idx2 = SearchIndex(boosted)
    _, page2 = idx2.search("common")
    assert [r["link_id"] for r in page2.collect()][0] == "a"


@pytest.mark.slow
def test_update_score_ordering_suite_both_blends(spark):
    """Mirror of indextest/suite.go TestUpdateScore (:314-372): 50 docs with
    identical content, PageRank = 50-i orders results as inserted; reversing
    the scores reverses the order.  Must hold in BOTH blend modes — additive
    (es.go:204-209) because text scores tie, and pagerank_first
    (memory.go:112) by construction."""
    from usearch_spark.operators.search import BLEND_ADDITIVE, BLEND_PAGERANK_FIRST

    n = 50
    ids = [f"doc{i:03d}" for i in range(n)]
    rows = [
        (ids[i], f"u{i}", f"doc with ID {ids[i]}", "This should be the body text of the document", float(n - i), None)
        for i in range(n)
    ]
    schema = "link_id string, url string, title string, content string, pagerank double, indexed_at timestamp"
    docs = spark.createDataFrame(rows, schema)
    for blend in (BLEND_ADDITIVE, BLEND_PAGERANK_FIRST):
        idx = SearchIndex(docs, blend=blend)
        _, page = idx.search("body", size=n)
        assert [r["link_id"] for r in page.collect()] == ids, blend

    reversed_docs = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], float(i), r[5]) for i, r in enumerate(rows)], schema
    )
    for blend in (BLEND_ADDITIVE, BLEND_PAGERANK_FIRST):
        idx = SearchIndex(reversed_docs, blend=blend)
        _, page = idx.search("body", size=n)
        assert [r["link_id"] for r in page.collect()] == list(reversed(ids)), blend


def test_blend_modes_disagree_when_relevance_beats_pagerank(spark):
    """The two semantics are genuinely different: a slightly-lower-pagerank
    doc with much higher relevance wins under additive but loses under the
    bleve sort."""
    from usearch_spark.operators.search import BLEND_ADDITIVE, BLEND_PAGERANK_FIRST

    docs = spark.createDataFrame(
        [
            ("rel", "u1", "x", "common common common common common", 1.0, None),
            ("pr", "u2", "x", "common filler", 1.5, None),
        ],
        "link_id string, url string, title string, content string, pagerank double, indexed_at timestamp",
    )
    _, add_page = SearchIndex(docs, blend=BLEND_ADDITIVE).search("common")
    _, pr_page = SearchIndex(docs, blend=BLEND_PAGERANK_FIRST).search("common")
    assert [r["link_id"] for r in add_page.collect()][0] == "rel"
    assert [r["link_id"] for r in pr_page.collect()][0] == "pr"


def test_bm25_matches_reference_formula(docs):
    """score_bm25 reproduces a hand-computed Okapi BM25 (k1=1.2, b=0.75)
    for a single-term query over the tiny corpus."""
    import math

    from usearch_spark.operators.search import doc_lengths, score_bm25

    postings = build_postings(docs)
    dfreq = doc_frequencies(postings)
    doclen = doc_lengths(postings)
    n = docs.count()
    got = {
        r["link_id"]: r["score"]
        for r in score_bm25(postings, dfreq, doclen, n, ["spark"], round_to=6).collect()
    }
    # analyzed lengths per doc and corpus stats, by hand from DOCS
    dls = {"d1": 8, "d2": 10, "d3": 7, "d4": 7}
    avgdl = sum(dls.values()) / 4
    tfs = {"d1": 2, "d2": 3, "d4": 1}
    df = 3
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    for doc, tf in tfs.items():
        denom = tf + 1.2 * (0.25 + 0.75 * dls[doc] / avgdl)
        assert got[doc] == pytest.approx(idf * tf * 2.2 / denom, abs=1e-6)
    assert "d3" not in got  # no query term -> no row


def test_bm25_length_normalization_orders_below_tf(spark):
    """Two docs with equal tf: the shorter one scores higher (the property
    plain tf-idf lacks)."""
    from usearch_spark.operators.search import doc_lengths, score_bm25

    docs = spark.createDataFrame(
        [
            ("short", "needle one two", None),
            ("long", "needle one two three four five six seven eight", None),
        ],
        "link_id string, title string, content string",
    )
    postings = build_postings(docs)
    dfreq = doc_frequencies(postings)
    doclen = doc_lengths(postings)
    got = {
        r["link_id"]: r["score"]
        for r in score_bm25(postings, dfreq, doclen, docs.count(), ["needle"]).collect()
    }
    assert got["short"] > got["long"]


def test_tfidf_keywords_per_doc_topk(docs):
    from usearch_spark.operators.search import tfidf_keywords

    postings = build_postings(docs)
    dfreq = doc_frequencies(postings)
    kw = tfidf_keywords(postings, dfreq, docs.count(), top_k=2).collect()
    by_doc = {}
    for r in kw:
        by_doc.setdefault(r["link_id"], []).append((r["rank"], r["term"], r["score"]))
    # every doc contributes at most top_k rows, ranks are 1..k in order
    for doc, rows in by_doc.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        # scores are non-increasing with rank
        scores = [r[2] for r in rows]
        assert scores == sorted(scores, reverse=True)
    # d2's dominant term is its tf=3 'spark' unless a rarer term outweighs:
    # 'spark' appears in 3/4 docs (low idf) while d2-only terms are rare ->
    # rank-1 must be a d2-exclusive term, not 'spark'
    d2_terms = dict((rk, t) for rk, t, _ in sorted(by_doc["d2"]))
    assert d2_terms[1] != "spark"


def test_tfidf_cosine_pairs_ranks_topic_duplicates(spark):
    """All-pairs tf-idf cosine: docs sharing rare vocabulary rank above
    docs sharing only stop-terms; the df cap removes stop-term-only
    pairs entirely; output is deterministic."""
    from pyspark.sql import functions as F

    from usearch_spark.operators.search import build_postings, tfidf_cosine_pairs

    # "the and of" appear in EVERY doc -> df = 5 > cap, dropped before the
    # self-join; docs 3/4 share ONLY those, so they never pair at all
    rows = [
        (1, "the and of quantum entanglement superposition qubit decoherence"),
        (2, "the and of qubit decoherence quantum superposition experiments"),  # ~ 1
        (3, "the and of alpha"),
        (4, "the and of beta"),
        (5, "the and of gardening tomato seedling compost mulch"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = build_postings(docs, id_col="doc_id", text_cols=("text",))
    got = tfidf_cosine_pairs(postings, 5, id_col="doc_id", max_df=2, k=5).collect()
    pairs = [(r["a"], r["b"]) for r in got]
    assert pairs and pairs[0] == (1, 2)
    assert (3, 4) not in pairs
    assert all(r["cosine"] <= 1.000001 for r in got)
    again = [(r["a"], r["b"]) for r in tfidf_cosine_pairs(postings, 5, id_col="doc_id", max_df=2, k=5).collect()]
    assert again == pairs


def test_prf_expansion_widens_recall(spark):
    """Expansion picks the term co-occurring with the originals in the
    top page (integer rank), and the re-scored query then retrieves a
    doc that pass one missed entirely."""
    from pyspark.sql import functions as F

    from usearch_spark.operators import search as S

    docs = spark.createDataFrame(
        [
            (1, "spark join shuffle tuning"),
            (2, "spark join shuffle skew"),
            (3, "spark join broadcast"),
            (4, "shuffle partitions deep dive"),   # no original terms
            (5, "gardening tips for spring"),
        ],
        "doc_id long, content string",
    )
    postings = S.build_postings(docs, id_col="doc_id", text_cols=("content",))
    dfreq = S.doc_frequencies(postings, id_col="doc_id")
    doclen = S.doc_lengths(postings, id_col="doc_id")
    terms = ["spark", "join"]
    s1 = S.score_bm25(postings, dfreq, doclen, 5, terms, id_col="doc_id", round_to=4)
    p1 = S.paginate(s1, [F.col("score").desc(), F.col("doc_id")], 0, 3)
    assert 4 not in {r["doc_id"] for r in p1.collect()}
    exp = S.prf_expansion_terms(postings, p1, terms, k=2, id_col="doc_id")
    picked = [r["term"] for r in exp.collect()]
    assert picked[0] == "shuffle"  # 2 of the top docs contain it
    s2 = S.score_bm25(
        postings, dfreq, doclen, 5, terms + picked, id_col="doc_id", round_to=4
    )
    p2 = S.paginate(s2, [F.col("score").desc(), F.col("doc_id")], 0, 4)
    assert 4 in {r["doc_id"] for r in p2.collect()}
