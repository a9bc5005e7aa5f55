"""Language-ID operator (operators/langid.py): Cavnar-Trenkle rank-order
classification — accuracy goldens per language, the unknown fallback, the
exact-integer distance contract, and profile determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from usearch_spark.operators.langid import (
    LANG_SEEDS,
    PROFILE_K,
    doc_gram_ranks,
    lang_profiles,
    langid,
)

SAMPLES = [
    (1, "en", "The children walk to school along the river in the morning."),
    (2, "en", "People say that this is the most beautiful time of the year."),
    (3, "de", "Die Kinder gehen am Fluss entlang zur Schule im Morgenlicht."),
    (4, "de", "Die Leute sagen dass dies die schoenste Zeit des Jahres ist."),
    (5, "es", "Los ninos caminan a la escuela por el rio por la manana."),
    (6, "es", "La gente dice que esta es la epoca mas hermosa del ano."),
    (7, "fr", "Les enfants marchent vers l ecole le long de la riviere le matin."),
    (8, "fr", "Les gens disent que c est la plus belle periode de l annee."),
]


def test_langid_classifies_each_language(spark):
    df = spark.createDataFrame(
        [(i, t) for i, _, t in SAMPLES], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["lang_pred"] for r in langid(df).collect()}
    assert got == {i: lang for i, lang, _ in SAMPLES}


def test_langid_unknown_and_spine(spark):
    """Docs with no [a-z] content classify 'unknown' with distance 0, and
    every input row survives the spine left-join."""
    df = spark.createDataFrame(
        [(1, "12345 --- !!!"), (2, ""), (3, "the morning light on the farm")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: (r["lang_pred"], r["oop_distance"]) for r in langid(df).collect()}
    assert rows[1] == ("unknown", 0)
    assert rows[2] == ("unknown", 0)
    assert rows[3][0] == "en" and rows[3][1] > 0


def test_langid_distance_is_exact_integer(spark):
    """The out-of-place distance replays in pure Python from the same
    profiles — counts, ranks, |Δrank|, penalty — pinning the all-integer
    contract the oracle depends on."""
    from collections import Counter

    from usearch_spark.operators.langid import PENALTY, _grams_py, _normalize_py

    text = "the farmer watches the fields from the wooden gate"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = langid(df).collect()[0]

    counts = Counter(_grams_py(_normalize_py(text)))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:PROFILE_K]
    doc_rank = {g: i + 1 for i, (g, _) in enumerate(ranked)}
    prof = {}
    for lang, gram, rk in lang_profiles():
        prof.setdefault(lang, {})[gram] = rk
    dists = {
        lang: sum(
            abs(rk - p[g]) if g in p else PENALTY for g, rk in doc_rank.items()
        )
        for lang, p in prof.items()
    }
    want = min(sorted(dists.items()), key=lambda kv: (kv[1], kv[0]))
    assert (got["lang_pred"], got["oop_distance"]) == want
    assert want[0] == "en"


def test_lang_profiles_deterministic_and_bounded():
    p1, p2 = lang_profiles(), lang_profiles()
    assert p1 == p2
    langs = {lang for lang, _, _ in p1}
    assert langs == set(LANG_SEEDS)
    for lang in langs:
        ranks = [rk for lg, _, rk in p1 if lg == lang]
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= PROFILE_K


def test_doc_gram_ranks_bounded(spark):
    """The per-doc profile is capped at top_k rows — the candidate bound
    (docs x top_k x |langs|) that keeps the classifier linear at scale."""
    from itertools import islice, product

    words = (
        "".join(w) for w in product("abcdefghijklmnopqrstuvwxyz", repeat=3)
    )
    df = spark.createDataFrame(
        [(1, " ".join(islice(words, 500)))], "doc_id long, text string"
    )
    ranks = doc_gram_ranks(df, top_k=50)
    assert ranks.count() == 50
    assert ranks.agg(F.max("rk")).collect()[0][0] == 50
