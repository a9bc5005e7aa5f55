"""Dedup operator tests: exact groups, Jaccard pairs, MinHash/LSH recall,
SimHash Hamming neighbors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from usearch_spark.operators.dedup import (
    exact_duplicate_groups,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "quick brown fox jumps over the lazy dog the"),  # same bag of words
    (4, "the quick brown fox jumps over a sleepy dog"),  # near dup
    (5, "completely different content about spark engines and queries"),
    (6, "spark engines and queries completely different content about"),  # bag-dup of 5
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_exact_duplicate_groups(docs):
    groups = exact_duplicate_groups(docs).collect()
    sets = sorted((g["min_id"], g["max_id"], g["group_size"]) for g in groups)
    # {1,2,3} share a bag fingerprint; {5,6} too
    assert sets == [(1, 3, 3), (5, 6, 2)]


def test_ngram_jaccard_pairs(docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, n=1, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] == 1.0
    assert (1, 4) in pairs  # high overlap
    assert (1, 5) not in pairs


def test_minhash_estimates_jaccard(docs):
    sigs = minhash_signatures(docs, num_hashes=32)
    s = {(r["id"], r["seed"]): r["sig"] for r in sigs.collect()}
    agree = sum(1 for i in range(32) if s[(1, i)] == s[(4, i)])
    # true unigram jaccard(1,4) = 7/9 ≈ 0.78; 32 hashes should land nearby
    assert 0.5 <= agree / 32 <= 1.0
    # identical docs agree on every hash
    assert all(s[(1, i)] == s[(2, i)] for i in range(32))


def test_lsh_candidates_find_exact_dups(docs):
    sigs = minhash_signatures(docs, num_hashes=16)
    cands = {(r["a"], r["b"]) for r in lsh_candidate_pairs(sigs).collect()}
    assert (1, 2) in cands and (1, 3) in cands and (2, 3) in cands
    assert (5, 6) in cands
    assert (1, 5) not in cands


def test_minhash_dedup_pipeline(docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in minhash_dedup_pairs(docs, threshold=0.7).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 5) not in pairs


def test_simhash_properties(docs):
    fps = {r["id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert all(len(v) == 16 for v in fps.values())
    assert fps[1] == fps[2] == fps[3]  # same bag of words -> same simhash
    assert fps[1] != fps[5]


def test_simhash_near_pairs(docs):
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_pairs(docs, max_hamming=8).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 5) not in pairs


def test_simhash_wider_bands_complete_recall(spark):
    """With n_chunks=8 the banded candidates are COMPLETE for Hamming <= 7:
    every true pair found by brute force must survive the banding."""
    rows = [(i, f"token{i} shared words appear in every document here") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fps = {r["id"]: int(r["simhash"], 16) for r in simhash_fingerprints(df).collect()}
    truth = {
        (a, b)
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 7
    }
    got = {
        (r["a"], r["b"])
        for r in simhash_near_pairs(df, max_hamming=7, n_chunks=8).collect()
    }
    assert got == truth
    assert len(truth) > 0  # the corpus must actually contain near pairs


def test_simhash_chunks_must_divide(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError, match="divide"):
        simhash_near_pairs(df, n_chunks=3)


def test_minhash_probe_batch_vs_corpus(spark):
    """Incremental probe: batch near-dups of corpus docs are found without
    any batch-batch or corpus-corpus pairs; corpus-side bucket cap drops a
    boilerplate bucket whole."""
    from usearch_spark.operators.dedup import minhash_index, minhash_probe_pairs

    corpus_rows = [(i, f"corpus doc {i} alpha bravo charlie delta echo foxtrot{i}") for i in range(20)]
    # 30-33: corpus boilerplate hub (identical text)
    corpus_rows += [(30 + i, "terms of service all rights reserved contact") for i in range(4)]
    batch_rows = [
        (100, "corpus doc 3 alpha bravo charlie delta echo foxtrot3"),   # dup of 3
        (101, "terms of service all rights reserved contact"),            # hits the hub
        (102, "completely novel content nothing shared here at all"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    c_sh, c_banded = minhash_index(corpus)
    b_sh, b_banded = minhash_index(batch)
    c_sh = c_sh.localCheckpoint(eager=True)
    b_sh = b_sh.localCheckpoint(eager=True)

    pairs = {
        (r["a"], r["b"])
        for r in minhash_probe_pairs(b_sh, b_banded, c_sh, c_banded, threshold=0.9).collect()
    }
    assert (100, 3) in pairs
    # hub pairs present when the cap allows them (4-doc bucket < cap)...
    assert {(101, b) for b in (30, 31, 32, 33)} <= pairs
    assert all(a >= 100 for a, _ in pairs) and all(b < 100 for _, b in pairs)

    # ...and dropped whole when the corpus-side cap excludes the bucket
    capped = {
        (r["a"], r["b"])
        for r in minhash_probe_pairs(b_sh, b_banded, c_sh, c_banded, threshold=0.9, max_bucket=3).collect()
    }
    assert (100, 3) in capped and not any(b >= 30 for _, b in capped)


def test_prefix_jaccard_equals_allpairs(spark):
    """Prefix filtering is exact: identical pair set + scores to the
    all-pairs join on the same corpus slice."""
    from pyspark.sql import functions as F

    from usearch_spark.operators.dedup import ngram_jaccard_pairs, ngram_jaccard_pairs_prefix
    from usearch_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    ref = sorted(
        (r["a"], r["b"], round(r["jaccard"], 6))
        for r in ngram_jaccard_pairs(docs, n=2, threshold=0.5, max_shingle_df=None).collect()
    )
    got = sorted(
        (r["a"], r["b"], round(r["jaccard"], 6))
        for r in ngram_jaccard_pairs_prefix(docs, n=2, threshold=0.5).collect()
    )
    assert got == ref and len(ref) > 0


def test_ppjoin_equals_allpairs_and_prunes(spark):
    """PPJoin's length + positional filters are lossless (identical pair
    set + scores to the all-pairs join) AND candidate count is <= the
    prefix-only candidate count on the same corpus slice."""
    from pyspark.sql import functions as F

    from usearch_spark.operators.dedup import (
        _doc_shingles,
        _prefix_candidates,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_ppjoin,
        ppjoin_candidates,
    )
    from usearch_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    ref = sorted(
        (r["a"], r["b"], round(r["jaccard"], 6))
        for r in ngram_jaccard_pairs(docs, n=2, threshold=0.5, max_shingle_df=None).collect()
    )
    got = sorted(
        (r["a"], r["b"], round(r["jaccard"], 6))
        for r in ngram_jaccard_pairs_ppjoin(docs, n=2, threshold=0.5).collect()
    )
    assert got == ref and len(ref) > 0

    sh = _doc_shingles(docs, "doc_id", "text", 2)
    n_prefix = _prefix_candidates(sh, 0.5).count()
    n_pp = ppjoin_candidates(sh, 0.5).count()
    assert n_pp <= n_prefix
    # the filters must actually bite on this corpus, not just not-lose
    assert n_pp < n_prefix


def test_substring_containment_exact(spark):
    """Rare-gram containment equals brute-force contains(): known
    containments found (including a short doc below the gram size and a
    chain A ⊂ B ⊂ C), non-containments absent, both directions for
    equal texts."""
    from usearch_spark.operators.dedup import substring_containment_pairs

    body = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, body),
        (2, f"PREFIX {body} SUFFIX"),                      # 1 ⊂ 2
        (3, f"AA PREFIX {body} SUFFIX ZZ"),                # 2 ⊂ 3 (and 1 ⊂ 3)
        (4, "completely unrelated text about graph partitioning algorithms"),
        (5, "lazy dog"),                                   # short (< 16 chars), ⊂ 1,2,3
        (6, body),                                         # equal text: 1<->6 both ways
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["inner_id"], r["outer_id"])
        for r in substring_containment_pairs(docs).collect()
    }
    expect = {
        (a, b)
        for a, ta in rows
        for b, tb in rows
        if a != b and ta in tb
    }
    assert got == expect
    assert (1, 2) in got and (2, 3) in got and (5, 1) in got
    assert (1, 6) in got and (6, 1) in got
    assert not any(x == 4 or y == 4 for x, y in got)


def test_substring_containment_hub_gram_cap(spark):
    """Templated-corpus skew guard: docs made ENTIRELY of template text
    (rarest-gram df > max_gram_df) are dropped from inner-side candidate
    generation instead of degenerating toward an all-pairs join, while
    docs with any distinctive gram still pair exactly."""
    from usearch_spark.operators.dedup import substring_containment_pairs

    template = "this boilerplate header repeats verbatim in every single document"
    rows = [(i, template) for i in range(30)] + [
        (100, "a genuinely distinctive passage about hyperball counters"),
        (101, "PRE a genuinely distinctive passage about hyperball counters POST"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # uncapped: 30 identical template docs -> 30*29 mutual pairs + the
    # distinctive containment
    got_all = {
        (r["inner_id"], r["outer_id"])
        for r in substring_containment_pairs(docs, max_gram_df=10**9).collect()
    }
    assert (100, 101) in got_all
    assert sum(1 for a, b in got_all if a < 100 and b < 100) == 30 * 29

    # capped at 10: every template gram has df=30 > 10, so template docs
    # produce NO inner-side candidates (bounded recall loss on pure
    # boilerplate); the distinctive doc (rarest df=2) still pairs.
    got_cap = {
        (r["inner_id"], r["outer_id"])
        for r in substring_containment_pairs(docs, max_gram_df=10).collect()
    }
    assert (100, 101) in got_cap
    assert not any(a < 100 for a, b in got_cap)
    # the CANDIDATE bound is what matters at scale: with the cap the
    # inner side is 2 docs x df<=cap, not 32 docs x df~30


def test_prefix_jaccard_prunes_candidates(spark):
    """The point of the prefix: near-disjoint docs sharing only a COMMON
    (high-df) shingle never become candidates, but high-overlap pairs
    survive."""
    from usearch_spark.operators.dedup import ngram_jaccard_pairs_prefix

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma epsilon"),   # high overlap with 1
        (3, "alpha zz1 zz2 zz3"),          # shares only ubiquitous 'alpha...' grams
        (4, "alpha yy1 yy2 yy3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["a"], r["b"]) for r in ngram_jaccard_pairs_prefix(df, n=2, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert (3, 4) not in pairs


def test_duplicate_spans_exact_substr(spark):
    """Lee et al. ExactSubstr span semantics: a 10-token phrase shared by
    two docs yields one maximal 10-token span in EACH (at min_len=8,
    positions 0..2 of the phrase window all duplicate and merge); a doc
    repeating its own 8-token phrase twice self-duplicates; unique docs
    emit nothing; nearby windows merge into ONE maximal span."""
    from usearch_spark.operators.dedup import duplicate_spans

    phrase = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        # shared phrase at token offset 2 (A) and 0 (B)
        (1, "intro words " + phrase + " tail one two"),
        (2, phrase + " different ending here"),
        # self-repetition: the same 8 tokens twice within one doc
        (3, "x1 x2 x3 x4 x5 x6 x7 x8 filler x1 x2 x3 x4 x5 x6 x7 x8"),
        # unique doc: no duplicated window anywhere
        (4, "unique u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(docs, min_len=8).collect()
    }
    # doc 1: phrase tokens 2..11; windows at pos 2,3,4 merge to one span
    assert got[1] == (2, 11, 10)
    # doc 2: phrase tokens 0..9
    assert got[2] == (0, 9, 10)
    # doc 3: both copies self-duplicate; the only dup windows sit at pos 0
    # and pos 9, and 9 - 0 = 9 > 8 means the intervals [0,7] and [9,16]
    # don't touch -> two separate maximal spans
    spans3 = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicate_spans(docs, min_len=8).filter(F.col("doc_id") == 3).collect()
    )
    assert spans3 == [(0, 7), (9, 16)]
    assert 4 not in got


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_edit_distance_pairs_matches_naive(spark):
    """Ed-Join prefix-filter join == naive all-pairs truth, on a corpus
    of seeded mutations (substitutions/inserts/deletes at distances that
    straddle the threshold) plus SHORT strings that must flow through
    the dense bucket (LB <= 0 path), plus an identical pair."""
    from usearch_spark.operators.dedup import edit_distance_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, base),
        (2, base.replace("quick", "quack")),            # dist 2 (subst)
        (3, base[:-8]),                                 # dist 8 (deletes)
        (4, base.replace("brown fox", "green wolf")),   # several substs
        (5, "completely unrelated text that shares almost nothing at all"),
        (6, base),                                      # exact duplicate of 1
        # shorts (<= q*(d+1)-1 = 14 chars at q=3, d=4): dense-bucket path
        (7, "short str one"),
        (8, "short str two"),
        (9, "zz"),
    ]
    q, d = 3, 4
    truth = sorted(
        (a, b, _lev(sa, sb))
        for i, (a, sa) in enumerate(rows)
        for (b, sb) in rows[i + 1 :]
        if _lev(sa, sb) <= d
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id_a"], r["doc_id_b"], r["dist"])
        for r in edit_distance_pairs(docs, q=q, max_dist=d).collect()
    )
    assert got == truth
    assert (1, 6, 0) in got and (7, 8, 3) in got  # filtered path + dense path


def _cdc_replay(text, w=8, base=131, prime=1_000_003, divisor=16):
    """Python replay of the cdc_dedup_stats chunker."""
    n = len(text)
    cs = [ord(ch) for ch in text]
    cuts = []
    for i in range(w, n + 1):
        h = sum(cs[i - 1 - j] * base**j for j in range(w)) % prime
        if h % divisor == 0 and i < n:
            cuts.append(i)
    bounds = [0] + cuts + [n]
    return [
        text[bounds[k]: bounds[k + 1]]
        for k in range(len(bounds) - 1)
        if bounds[k + 1] > bounds[k]
    ]


def test_cdc_dedup_matches_replay_and_resyncs_after_shift(spark):
    """Chunk stats equal the Python replay; an exact duplicate halves
    distinct bytes; a 1-char prefix shift still shares the resynced
    chunk tail (the property fixed-offset chunking lacks)."""
    import random

    from usearch_spark.operators.dedup import cdc_dedup_stats

    rng = random.Random(7)
    body = "".join(rng.choice("abcdefghij klmnopqrstuvwxyz.") for _ in range(400))
    docs = [
        ("dup", 1, body),
        ("dup", 2, body),
        ("shift", 1, body),
        ("shift", 2, "X" + body),
        ("solo", 1, body[:120]),
    ]
    df = spark.createDataFrame(docs, "source string, doc_id long, text string")
    got = {
        r["source"]: r
        for r in cdc_dedup_stats(df, ["source"]).collect()
    }
    # replay each group
    from collections import Counter

    for src_name, texts in [
        ("dup", [body, body]),
        ("shift", [body, "X" + body]),
        ("solo", [body[:120]]),
    ]:
        chunks = Counter()
        for t in texts:
            chunks.update(_cdc_replay(t))
        r = got[src_name]
        assert r["n_chunks"] == sum(chunks.values()), src_name
        assert r["n_distinct"] == len(chunks), src_name
        assert r["total_chars"] == sum(len(c) * k for c, k in chunks.items())
        assert r["distinct_chars"] == sum(len(c) for c in chunks)
        assert r["dedup_ratio"] == r["distinct_chars"] / r["total_chars"]
    # exact dup: every chunk shared -> ratio 0.5
    assert got["dup"]["dedup_ratio"] == 0.5
    # shifted copy: rolling hash resyncs, so well under 1.0 (shared tail)
    assert got["shift"]["dedup_ratio"] < 0.75


def test_cdc_dedup_keeps_all_empty_group(spark):
    """A group whose every document has empty text still appears in the
    audit: n_docs kept, chunk counters coalesced to 0, NULL dedup_ratio."""
    from usearch_spark.operators.dedup import cdc_dedup_stats

    df = spark.createDataFrame(
        [("a", "hello world, a real payload"), ("b", ""), ("b", "")],
        "source string, text string",
    )
    rows = {r["source"]: r for r in cdc_dedup_stats(df, ["source"]).collect()}
    assert set(rows) == {"a", "b"}
    b = rows["b"]
    assert (b["n_docs"], b["n_chunks"], b["n_distinct"]) == (2, 0, 0)
    assert (b["total_chars"], b["distinct_chars"]) == (0, 0)
    assert b["dedup_ratio"] is None
    assert rows["a"]["n_chunks"] > 0
