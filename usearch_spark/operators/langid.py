"""Language identification: Cavnar & Trenkle rank-order n-gram profiles.

The standard corpus-mixing stage of an LLM data pipeline ("sample The
Pile at these per-language proportions") needs a language id per
document first.  This module implements the classic N-Gram-Based Text
Categorization method (Cavnar & Trenkle 1994): each language is
summarized by its TOP-K character n-grams ranked by frequency, a
document is summarized the same way, and the document is assigned the
language whose profile minimizes the OUT-OF-PLACE distance
Σ |rank_doc(g) − rank_lang(g)| (missing grams pay a fixed penalty).

Reference parity: the reference engine carries no language-id stage
(its corpus is single-language crawl text, see mycok/uSearch
service/index logic); this operator is part of the training-data
extension surface, built from the published method only.

Determinism contract (the hash-gate rules): every decision is EXACT
INTEGER arithmetic — counts, ranks (row_number with (cnt DESC, gram)
total order), absolute rank differences, penalties, and the final
(distance, lang) argmin.  No float appears anywhere, so any engine
replays the classification bit-for-bit.  The language profiles are
derived in pure Python from the in-repo seed fixture at import time, so
the Spark plan and a SQL oracle can inject the identical (lang, gram,
rank) table as literals.

Scale shape at 100 TB: profile derivation is driver-side over a
KILOBYTE fixture (free); per document the plan is one n-gram explode +
one (doc, gram) count + one bounded top-K rank (partitioned window over
<= a few hundred rows per doc, never the corpus), then a BROADCAST join
against the |langs|·K-row profile table and one partial-agg groupBy
(doc, lang) — no corpus-sized shuffle beyond the per-doc aggregations,
and the candidate row bound is docs·K·|langs|, linear in the corpus.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Seed fixture: a few sentences of ordinary prose per language, ASCII-
# folded (accents stripped) so lower()+[^a-z ] normalization is
# engine-portable.  Written for this repo; any public text sample with
# the same character statistics works identically.
LANG_SEEDS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "chases the fox through the green fields while the farmer watches "
        "from the old wooden gate because the morning light makes it easy "
        "to see everything that happens on the farm and the children walk "
        "to school along the river where the water runs slowly under the "
        "stone bridge and people say that this is the most beautiful time "
        "of the year when the leaves turn red and gold in the autumn wind"
    ),
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund und dann "
        "jagt der hund den fuchs durch die gruenen felder waehrend der "
        "bauer vom alten holztor aus zuschaut weil das morgenlicht es "
        "leicht macht alles zu sehen was auf dem hof geschieht und die "
        "kinder gehen am fluss entlang zur schule wo das wasser langsam "
        "unter der steinbruecke fliesst und die leute sagen dass dies die "
        "schoenste zeit des jahres ist wenn sich die blaetter im herbstwind "
        "rot und golden faerben"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y luego el "
        "perro persigue al zorro por los campos verdes mientras el granjero "
        "observa desde la vieja puerta de madera porque la luz de la manana "
        "hace que sea facil ver todo lo que pasa en la granja y los ninos "
        "caminan a la escuela por el rio donde el agua corre despacio bajo "
        "el puente de piedra y la gente dice que esta es la epoca mas "
        "hermosa del ano cuando las hojas se vuelven rojas y doradas con el "
        "viento de otono"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et puis "
        "le chien poursuit le renard a travers les champs verts pendant que "
        "le fermier regarde depuis la vieille porte en bois parce que la "
        "lumiere du matin permet de voir facilement tout ce qui se passe a "
        "la ferme et les enfants marchent vers l ecole le long de la "
        "riviere ou l eau coule lentement sous le pont de pierre et les "
        "gens disent que c est la plus belle periode de l annee quand les "
        "feuilles deviennent rouges et dorees dans le vent d automne"
    ),
}

NGRAM_SIZES = (2, 3)
PROFILE_K = 300
PENALTY = 400  # out-of-place cost for a doc gram absent from the profile


def _normalize_py(text: str) -> str:
    """lower + strip to [a-z ] + collapse spaces — the pure-Python twin
    of the in-plan normalization (seeds are ASCII, so they agree)."""
    s = re.sub(r"[^a-z ]", " ", text.lower())
    return re.sub(r" +", " ", s).strip()


def _grams_py(s: str) -> list[str]:
    out: list[str] = []
    for n in NGRAM_SIZES:
        out.extend(s[i : i + n] for i in range(len(s) - n + 1))
    return out


def lang_profiles(top_k: int = PROFILE_K) -> list[tuple[str, str, int]]:
    """(lang, gram, rank) rows, rank 1..top_k by (count DESC, gram) —
    derived deterministically from the seed fixture in pure Python, so
    Spark plans and SQL oracles can embed the identical literals."""
    rows: list[tuple[str, str, int]] = []
    for lang in sorted(LANG_SEEDS):
        counts = Counter(_grams_py(_normalize_py(LANG_SEEDS[lang])))
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        rows.extend((lang, g, i + 1) for i, (g, _) in enumerate(ranked))
    return rows


def _norm_sql(col: str) -> str:
    return f"trim(regexp_replace(regexp_replace(lower({col}), '[^a-z ]', ' '), ' +', ' '))"


def doc_gram_ranks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = PROFILE_K,
) -> DataFrame:
    """Per-document ranked n-gram profile (id, gram, rk), rk 1..top_k by
    (count DESC, gram).  The rank window is partitioned per document
    over its <= a-few-hundred distinct grams — bounded by text length,
    never by corpus size."""
    from usearch_spark.session import spread_small_scan

    norm = spread_small_scan(docs).select(
        F.col(id_col).alias("id"), F.expr(_norm_sql(text_col)).alias("s")
    )
    gram_arrays = [
        F.expr(
            f"CASE WHEN length(s) >= {n} THEN"
            f" transform(sequence(1, length(s) - {n} + 1), i -> substring(s, i, {n}))"
            " ELSE CAST(array() AS ARRAY<STRING>) END"
        )
        for n in NGRAM_SIZES
    ]
    grams = norm.select("id", F.explode(F.concat(*gram_arrays)).alias("gram"))
    counts = grams.groupBy("id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("id").orderBy(F.col("cnt").desc(), F.col("gram"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("id", "gram", "rk")
    )


def langid(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = PROFILE_K,
    penalty: int = PENALTY,
) -> DataFrame:
    """Classify every document: (id_col, lang_pred, oop_distance).

    Out-of-place distance per (doc, lang) = Σ over the doc's ranked
    grams of |rk_doc − rk_lang|, with ``penalty`` for grams outside the
    language profile; the argmin breaks ties to the lexicographically
    smaller language code (min of (distance, lang) structs).  Documents
    whose normalized text is empty classify as 'unknown' with distance
    0 (the spine left-join keeps every input row)."""
    spark = docs.sparkSession
    prof = spark.createDataFrame(
        lang_profiles(top_k), "lang string, gram string, lrk int"
    )
    langs = prof.select("lang").distinct()
    dg = doc_gram_ranks(docs, id_col, text_col, top_k)
    # small-side cross: |langs| rows fan each doc gram out once per
    # language, then the broadcast profile join scores membership
    scored = (
        dg.crossJoin(F.broadcast(langs))
        .join(F.broadcast(prof), ["lang", "gram"], "left")
        .select(
            "id",
            "lang",
            F.coalesce(
                F.abs(F.col("rk") - F.col("lrk")), F.lit(penalty)
            ).alias("oop"),
        )
    )
    dist = scored.groupBy("id", "lang").agg(F.sum("oop").alias("dist"))
    best = dist.groupBy("id").agg(
        F.min(F.struct(F.col("dist"), F.col("lang"))).alias("b")
    )
    spine = docs.select(F.col(id_col).alias("id"))
    return spine.join(best, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("b.lang"), F.lit("unknown")).alias("lang_pred"),
        F.coalesce(F.col("b.dist"), F.lit(0)).cast("long").alias("oop_distance"),
    )
