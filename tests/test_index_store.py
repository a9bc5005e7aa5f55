"""Index-store conformance tests, modeled on the reference suite
(textindexer/index/indextest/suite.go):
  - re-index must preserve PageRank (:76-135)
  - UpdateScore on unknown doc creates a placeholder (:376-395)
"""

from __future__ import annotations

import datetime as dt

from usearch_spark.sources.index_store import find_doc, index_docs, update_scores

T0 = dt.datetime(2024, 1, 1)


def docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "link_id string, url string, title string, content string, pagerank double, indexed_at timestamp"
    )


def test_index_then_update_score_then_reindex_preserves_pagerank(spark):
    d1 = docs_df(spark, [("L1", "http://x/1", "t1", "c1", None, T0)])
    idx = index_docs(None, d1)
    ranked = update_scores(idx, spark.createDataFrame([("L1", 0.7)], "link_id string, score double"))
    assert ranked.first()["pagerank"] == 0.7

    # re-index with new content must NOT clobber the score
    d2 = docs_df(spark, [("L1", "http://x/1", "t1b", "c1b", None, T0)])
    reindexed = index_docs(ranked, d2)
    row = reindexed.first()
    assert row["title"] == "t1b" and row["content"] == "c1b"
    assert row["pagerank"] == 0.7


def test_update_score_unknown_doc_creates_placeholder(spark):
    idx = index_docs(None, docs_df(spark, [("L1", "u", "t", "c", None, T0)]))
    ranked = update_scores(idx, spark.createDataFrame([("L2", 0.3)], "link_id string, score double"))
    assert ranked.count() == 2
    ph = find_doc(ranked, "L2")
    assert ph["pagerank"] == 0.3 and ph["url"] is None and ph["title"] is None


def test_index_docs_upsert_new_and_existing(spark):
    a = index_docs(None, docs_df(spark, [("L1", "u1", "t1", "c1", None, T0)]))
    b = index_docs(a, docs_df(spark, [("L1", "u1", "t1x", "c1x", None, T0), ("L2", "u2", "t2", "c2", None, T0)]))
    rows = {r["link_id"]: r for r in b.collect()}
    assert set(rows) == {"L1", "L2"}
    assert rows["L1"]["title"] == "t1x"


def test_index_docs_dedupes_batch(spark):
    d = docs_df(spark, [("L1", "u", "a", "c", None, T0), ("L1", "u", "b", "c", None, T0)])
    assert index_docs(None, d).count() == 1
