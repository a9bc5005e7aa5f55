"""Text-analysis operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from usearch_spark.operators.text_analysis import (
    analyze,
    bpe_ish_token_count,
    detect_language,
    quality_score,
    winnow_fingerprints,
    winnow_pairs,
    word_token_count,
)


def _py_winnow(text: str, k: int = 3, w: int = 4) -> list[str]:
    """Pure-Python winnowing reference (Schleimer et al. fig. 5, value
    set only — position/tie bookkeeping doesn't change the hash set)."""
    import hashlib
    import re

    toks = re.findall(r"[a-z0-9]+", text.lower())
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hashes = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    if not hashes:
        return []
    if len(hashes) < w:
        return [min(hashes)]
    return sorted({min(hashes[j : j + w]) for j in range(len(hashes) - w + 1)})


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! It's 42.",)], "text string")
    row = df.select(
        word_token_count("text").alias("w"), bpe_ish_token_count("text").alias("b")
    ).first()
    assert row["w"] == 5  # hello world it s 42
    # hello , world ! it ' s 42 .
    assert row["b"] == 9


def test_language_detection(spark):
    rows = [
        ("the cat is in the house and it is happy",),
        ("der hund ist nicht in der küche und das ist gut",),
        ("el perro es un animal que vive en la casa",),
        ("le chat est dans la maison et il est content",),
        ("这是一个中文句子",),
        ("xyzzy plugh",),
    ]
    df = spark.createDataFrame(rows, "text string")
    langs = [r["l"] for r in df.select(detect_language("text").alias("l")).collect()]
    assert langs == ["en", "de", "es", "fr", "zh", "unknown"]


def test_quality_score_ranges(spark):
    rows = [
        ("a clean readable document with plenty of ordinary words " * 5,),
        ("!!! ### $$$ %%% ^^^ &&& *** ((()))",),
    ]
    df = spark.createDataFrame(rows, "text string")
    scores = [r["q"] for r in df.select(quality_score("text").alias("q")).collect()]
    assert 0 <= scores[1] < scores[0] <= 1


def test_winnow_matches_python_reference(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the quiet river bank"),
        (2, "short doc"),            # fewer tokens than k -> no grams
        (3, "one two three"),        # exactly k tokens -> 1 gram < w -> global min
        (4, "one two three four five"),  # 3 grams < w -> global min
        (5, ""),                     # empty
        (6, "a b c d e f g h i j k l m n o p q r s t"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in winnow_fingerprints(df).collect()}
    for doc_id, text in rows:
        want = _py_winnow(text)
        assert list(got[doc_id]["fingerprints"]) == want, doc_id
        assert got[doc_id]["n_fingerprints"] == len(want)


def test_winnow_guarantee_shared_run(spark):
    # two docs sharing a token run of length >= k + w - 1 (= 6) must share
    # at least one fingerprint — the winnowing correctness guarantee
    common = "alpha bravo charlie delta echo foxtrot"
    df = spark.createDataFrame(
        [(1, f"unrelated prefix words here {common}"),
         (2, f"{common} and a completely different suffix tail"),
         (3, "nothing in common with the others at all whatsoever")],
        "doc_id int, text string",
    )
    pairs = winnow_pairs(df, min_shared=1).collect()
    assert {(p["a"], p["b"]) for p in pairs} == {(1, 2)}
    p = pairs[0]
    assert p["n_shared"] >= 1 and 0 < p["overlap"] <= 1


def test_winnow_pairs_df_cap(spark):
    # a fingerprint present in every doc is dropped by max_fp_df
    common = "alpha bravo charlie delta echo foxtrot"
    df = spark.createDataFrame(
        [(i, f"{common} unique{i} filler{i} words{i}") for i in range(1, 5)],
        "doc_id int, text string",
    )
    uncapped = winnow_pairs(df, min_shared=1).count()
    capped = winnow_pairs(df, min_shared=1, max_fp_df=1).count()
    assert uncapped == 6 and capped == 0


def test_analyze_projection(spark):
    df = spark.createDataFrame([(1, "the quick brown fox"), (2, "the quick brown fox")], "doc_id int, text string")
    out = analyze(df).collect()
    assert len(out) == 2
    r = out[0]
    assert r["n_tokens"] == 4 and r["n_chars"] == 19
    assert out[0]["fingerprint"] == out[1]["fingerprint"]
    assert set(out[0].asDict()) == {
        "doc_id", "n_chars", "n_tokens", "n_bpe_tokens", "punct_ratio",
        "stopword_ratio", "quality", "lang_pred", "fingerprint",
    }


def test_bpe_merges_greedy_overlap(spark):
    """Hand-checkable BPE: 'aaa' x3 + 'bb' — round 1 learns (a,a) with
    freq 6 (two overlapping pairs per word, both counted), the merge is
    greedy left-to-right so 'aaa' becomes [aa, a] (NOT [a, aa] and not a
    double merge), and round 2 therefore learns (aa, a)."""
    from usearch_spark.operators.text_analysis import bpe_merges

    docs = spark.createDataFrame(
        [(1, "aaa aaa aaa bb")], "doc_id long, text string"
    )
    got = [(r["round"], r["pair"], r["freq"]) for r in bpe_merges(docs, rounds=2).collect()]
    assert got == [(1, "a a", 6), (2, "aa a", 3)]


def test_bpe_encode_counts_shrink_with_merges(spark):
    """Each merge can only shrink segmentations; zero merges = per-char
    counts."""
    from pyspark.sql import functions as F

    from usearch_spark.operators.text_analysis import bpe_encode_counts, tokenize

    docs = spark.createDataFrame(
        [(1, "aaab aaab banana"), (2, "aaab"), (3, "xy")], "doc_id long, text string"
    )
    zero = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_encode_counts(docs, rounds=0).collect()}
    chars = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.explode(tokenize(F.col("text"))).alias("w")
        ).groupBy("doc_id").agg(F.sum(F.length("w")).alias("n")).collect()
    }
    assert zero == chars
    merged = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_encode_counts(docs, rounds=3).collect()}
    assert all(merged[d] <= zero[d] for d in zero)
    assert merged[2] < zero[2]  # 'aaab' (freq 3) definitely got merged


def test_bigram_logprob_ranks_fluency(spark):
    """Interpolated bigram LM: a document made of the corpus's dominant
    bigram pattern outscores one with the same unigrams shuffled into
    unseen bigrams; < 2-token docs score 0; deterministic."""
    from pyspark.sql import functions as F

    from usearch_spark.operators.text_analysis import bigram_logprob

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),
        (3, "the cat sat on the mat"),
        (4, "mat the on sat cat the"),  # same unigrams, unseen bigrams
        (5, "word"),                    # single token -> no bigram
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"]) for r in bigram_logprob(docs).collect()}
    assert got[5] == (0, 0.0)
    assert got[1][0] == 5 and got[1] == got[2] == got[3]
    assert got[1][1] > got[4][1]
    again = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"]) for r in bigram_logprob(docs).collect()}
    assert again == got


def test_zipf_fit_recovers_power_law(spark):
    """A synthetic corpus with freq(rank) = 1000/rank must fit slope ~ -1
    with intercept ~ ln(1000); ranking is (freq desc, term) deterministic."""
    import math

    from usearch_spark.operators.text_analysis import zipf_fit

    words = []
    for i in range(1, 51):
        words += [f"w{i:03d}"] * round(1000 / i)
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = zipf_fit(docs, top_n=50, show_top=5).collect()
    assert len(rows) == 5
    assert rows[0]["slope"] == rows[4]["slope"]
    assert abs(rows[0]["slope"] + 1.0) < 0.02, rows[0]["slope"]
    assert abs(rows[0]["intercept"] - math.log(1000)) < 0.05
    top = {r["rank"]: (r["term"], r["freq"]) for r in rows}
    assert top[1] == ("w001", 1000) and top[2] == ("w002", 500)


def test_trigram_logprob_backoff_ladder(spark):
    """Trigram JM backoff: repeated fluent text outscores shuffled text;
    a doc with < 3 tokens scores 0 with n_trigrams 0; trigram positions
    count size-2 per doc."""
    from usearch_spark.operators.text_analysis import trigram_logprob

    fluent = "the quick brown fox jumps over the lazy dog"
    rows = [(i, fluent) for i in range(4)] + [
        (10, "dog the over quick lazy jumps fox brown the"),
        (11, "too short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in trigram_logprob(docs).collect()}
    assert got[11]["n_trigrams"] == 0 and got[11]["avg_logprob"] == 0.0
    assert got[0]["n_trigrams"] == 7
    # four verbatim copies saturate the trigram table; the shuffle falls
    # back to bigram/unigram mass and must score strictly lower
    assert got[0]["avg_logprob"] > got[10]["avg_logprob"]


def test_corpus_js_drift_closed_forms(spark):
    """JS divergence anchors: disjoint vocabularies give exactly 1.0
    bit; identical corpora give exactly 0.0; a mixed case matches a
    pure-Python replay of the identical IEEE chain after the same 9 dp
    quantization; the drift ranking key is count-based, so the top
    token is the most-lopsided one."""
    import math

    from usearch_spark.operators.text_analysis import corpus_js_drift

    mk = lambda texts: spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # disjoint: every token one-sided -> q*log2(2) sums to 0.5 + 0.5
    out = corpus_js_drift(mk(["aa aa bb"]), mk(["cc cc dd"]), top_n=10).collect()
    assert out and all(r["js_total"] == 1.0 for r in out)
    # identical: p == q for every token -> log2(1.0) == 0.0 exactly
    out = corpus_js_drift(mk(["aa bb cc"]), mk(["cc bb aa"]), top_n=10).collect()
    assert out and all(r["js_total"] == 0.0 for r in out)
    assert all(r["js_contrib"] == 0.0 for r in out)
    # mixed: replay the chain in Python (floats are IEEE doubles)
    a_counts = {"x": 3, "y": 1}        # tot_a = 4
    b_counts = {"x": 1, "y": 2, "z": 1}  # tot_b = 4
    exp_total = 0.0
    exp = {}
    for tok in sorted(set(a_counts) | set(b_counts)):
        p = float(a_counts.get(tok, 0)) / 4.0
        q = float(b_counts.get(tok, 0)) / 4.0
        tp = 0.0 if not a_counts.get(tok) else p * math.log2((2.0 * p) / (p + q))
        tq = 0.0 if not b_counts.get(tok) else q * math.log2((2.0 * q) / (p + q))
        c = round(0.5 * (tp + tq), 9)
        exp[tok] = c
        exp_total += c
    got = corpus_js_drift(
        mk(["x x x y"]), mk(["x y y z"]), top_n=10
    ).collect()
    for r in got:
        assert r["js_contrib"] == exp[r["token"]]
        assert abs(r["js_total"] - exp_total) < 1e-15
    # ranking: |cnt_a*tot_b - cnt_b*tot_a| = x:8, y:4, z:4 -> x first,
    # then y/z tie broken by token
    assert [r["token"] for r in got] == ["x", "y", "z"]


def test_rake_keyphrases_textbook_example(spark):
    """RAKE hand-check on a tiny corpus: word scores deg/freq and the
    phrase ranking match the by-hand computation; stopword runs split
    phrases; duplicate phrases aggregate with occurrence counts."""
    from usearch_spark.operators.text_analysis import rake_keyphrases

    docs = spark.createDataFrame(
        [
            (1, "deep learning of deep networks"),
            (2, "the deep learning"),
            (3, "networks for deep learning"),
        ],
        "doc_id long, text string",
    )
    out = rake_keyphrases(docs, ["of", "the", "for"], k=10).collect()
    got = {r["phrase"]: (r["n_words"], r["n_occurrences"], r["score"]) for r in out}
    # phrases: "deep learning" x3, "deep networks" x1, "networks" x1
    assert got["deep learning"][1] == 3
    assert got["deep networks"][1] == 1
    assert got["networks"][1] == 1
    # freq: deep=4, learning=3, networks=2; deg: deep = 2+2+2+2=8,
    # learning = 2+2+2=6, networks = 2+1=3
    s_deep, s_learn, s_net = 8 / 4, 6 / 3, 3 / 2
    assert got["deep learning"][2] == s_deep + s_learn == 4.0
    assert got["deep networks"][2] == s_deep + s_net == 3.5
    assert got["networks"][2] == s_net == 1.5
    # ranking: score desc, phrase asc
    assert [r["phrase"] for r in out] == ["deep learning", "deep networks", "networks"]


def test_lexical_diversity_exact(spark):
    """TTR / hapax / repeat-rate replay on a known token multiset:
    'a a a b c' -> 3 types, 2 hapax, repeat = (3*2)/(5*4)."""
    from usearch_spark.operators.text_analysis import lexical_diversity

    df = spark.createDataFrame([("s", "a a a b c")], "g string, text string")
    r = lexical_diversity(df, ["g"]).collect()[0]
    assert (r["n_tokens"], r["n_types"], r["n_hapax"]) == (5, 3, 2)
    assert r["ttr"] == 0.6
    assert r["hapax_share"] == 2 / 3
    assert r["repeat_rate"] == 6 / 20


def test_term_burstiness_vmr_replay(spark):
    """VMR replay: a term clumped into one doc scores (N*Q - S^2)/(N*S)
    high; an evenly spread term scores near zero; ranking is (vmr desc,
    term)."""
    from usearch_spark.operators.text_analysis import term_burstiness

    rows = [
        (0, "burst burst burst burst even"),
        (1, "even filler"),
        (2, "even filler"),
        (3, "even filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["term"]: r for r in term_burstiness(df, top_k=10).collect()}
    n = 4
    # burst: S=4, Q=16 -> (4*16-16)/(4*4) = 3.0
    assert got["burst"]["vmr"] == 3.0 and got["burst"]["df"] == 1
    # even: S=4, Q=4 (one per doc) -> (16-16)/16 = 0
    assert got["even"]["vmr"] == 0.0 and got["even"]["df"] == 4
    order = [r for r, _ in sorted(((k, v["vmr"]) for k, v in got.items()),
                                  key=lambda kv: (-kv[1], kv[0]))]
    assert order[0] == "burst"
