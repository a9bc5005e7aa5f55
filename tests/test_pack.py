"""Sequence packing + deterministic sampling tests (operators/pack.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from usearch_spark.operators.pack import assign_sequences, pack_stats, stratified_sample


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, (i * 37) % 90 + 10) for i in range(200)]  # tokens 10..99
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_assign_sequences_matches_global_window(spark, docs):
    """The two-phase distributed prefix sum must equal the plain global
    window cumsum, for any partition count."""
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    expected = {
        r["doc_id"]: r["seq"]
        for r in docs.withColumn(
            "seq", (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 256).cast("long")
        ).collect()
    }
    for n_parts in (1, 3, 7):
        got = {
            r["doc_id"]: r["seq_id"]
            for r in assign_sequences(docs, budget=256, n_parts=n_parts).collect()
        }
        assert got == expected, n_parts


def test_pack_invariants(spark, docs):
    """Sequences are contiguous doc-id ranges; every sequence except
    possibly the last starts because the previous one crossed the budget."""
    budget = 256
    stats = pack_stats(assign_sequences(docs, budget=budget)).collect()
    by_seq = sorted((r["seq_id"], r["first_doc"], r["last_doc"], r["seq_tokens"]) for r in stats)
    for (s1, _, last1, _), (s2, first2, _, _) in zip(by_seq, by_seq[1:]):
        assert s2 >= s1 + 1
        assert first2 == last1 + 1  # contiguous ranges in pack order
    # a doc never starts inside a sequence that is already over budget:
    # tokens before the last doc of each sequence stay under the budget
    # boundary of the NEXT sequence
    total = sum(r["seq_tokens"] for r in stats)
    assert total == docs.agg(F.sum("n_tokens")).first()[0]


def test_stratified_sample_deterministic_and_rated(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    s1 = stratified_sample(df, {"en": 0.5, "de": 0.1}, stratum_col="lang")
    s2 = stratified_sample(df, {"en": 0.5, "de": 0.1}, stratum_col="lang")
    ids1 = {r["doc_id"] for r in s1.collect()}
    ids2 = {r["doc_id"] for r in s2.collect()}
    assert ids1 == ids2  # deterministic
    n_en = sum(1 for i in ids1 if i % 2 == 0)
    n_de = len(ids1) - n_en
    assert abs(n_en / 1000 - 0.5) < 0.08
    assert abs(n_de / 1000 - 0.1) < 0.05
    # excluded stratum drops entirely
    s3 = stratified_sample(df, {"en": 1.0}, stratum_col="lang")
    assert {r["lang"] for r in s3.collect()} == {"en"}


def test_chunk_documents_overlap_and_coverage(spark):
    from usearch_spark.operators.pack import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text), (2, "short doc"), (3, "")],
                                 "doc_id long, text string")
    rows = chunk_documents(docs, chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["n_tokens"]))
    # doc 1: starts 0,3,6,9 -> sizes 4,4,4,1
    assert sorted(by_doc[1]) == [(0, 4), (1, 4), (2, 4), (3, 1)]
    # doc 2: one partial chunk; doc 3 (empty) yields nothing
    assert by_doc[2] == [(0, 2)]
    assert 3 not in by_doc


def test_chunk_documents_md5_identifies_equal_chunks(spark):
    from usearch_spark.operators.pack import chunk_documents

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma")], "doc_id long, text string"
    )
    rows = chunk_documents(docs, chunk_tokens=8, stride=8).collect()
    md5s = {r["chunk_md5"] for r in rows}
    assert len(rows) == 2 and len(md5s) == 1  # identical chunks share the id
