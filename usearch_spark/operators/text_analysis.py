"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Everything here is built-in column expressions (whole-stage codegen) — at
100 TB these run at scan speed with no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from usearch_spark.functions.text import tokenize
from usearch_spark.operators.dedup import content_fingerprint  # re-exported fingerprint

# small high-frequency stopword lists per language (n-gram-heuristic
# language ID; ordered dict -> deterministic tie-breaks)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    # ascii-only words: the analyzer emits [a-z0-9]+ runs, so an
    # umlaut-bearing stopword ('für') could never match a token
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"],
    "es": ["el", "la", "los", "las", "de", "que", "es", "en", "un", "una"],
    "fr": ["le", "la", "les", "des", "et", "est", "un", "une", "dans", "que"],
}


def word_token_count(text: Column | str) -> Column:
    """Whitespace-ish token count (size of the analyzer's token array)."""
    return F.size(tokenize(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-flavored count: word tokens + punctuation marks each count once
    (a cheap, deterministic proxy for subword token counts)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"), F.lit(0)))


def quality_metrics(text: Column | str) -> dict[str, Column]:
    """Deterministic quality signals: length, punctuation ratio, stopword
    ratio, mean word length, digit ratio."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokenize(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    en_sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": F.size(F.regexp_extract_all(c, F.lit("[^a-zA-Z0-9\\s]"), F.lit(0))) / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": F.size(F.array_intersect(toks, en_sw)) / F.greatest(n_tokens, F.lit(1)),
        "mean_word_len": F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / F.greatest(n_tokens, F.lit(1)),
        "digit_ratio": F.size(F.regexp_extract_all(c, F.lit("[0-9]"), F.lit(0))) / F.greatest(n_chars, F.lit(1)),
    }


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality score: rewards mid-length docs with low
    punctuation/digit noise — a heuristic filter for training corpora."""
    m = quality_metrics(text)
    length_term = F.least(m["n_tokens"] / F.lit(100.0), F.lit(1.0))
    noise_term = F.greatest(F.lit(0.0), F.lit(1.0) - 4 * m["punct_ratio"] - 2 * m["digit_ratio"])
    return F.round(F.lit(0.5) * length_term + F.lit(0.5) * noise_term, 4)


def language_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts (distinct hits, tf-insensitive)."""
    toks = tokenize(text)
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }


def detect_language(text: Column | str) -> Column:
    """Argmax of stopword hits; CJK character presence short-circuits to
    'zh'; no hits at all -> 'unknown'.  Ties break by language code order
    (deterministic)."""
    c = F.col(text) if isinstance(text, str) else text
    scores = language_scores(c)
    has_cjk = c.rlike("[\\u4e00-\\u9fff]")
    best = F.greatest(*scores.values())
    pick = F.lit("unknown")
    for lang in sorted(STOPWORDS, reverse=True):
        pick = F.when(scores[lang] == best, F.lit(lang)).otherwise(pick)
    return F.when(has_cjk, F.lit("zh")).when(best > 0, pick).otherwise(F.lit("unknown"))


def analyze(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection: token counts, quality, language,
    fingerprint."""
    m = quality_metrics(text_col)
    return docs.select(
        F.col(id_col),
        m["n_chars"].alias("n_chars"),
        m["n_tokens"].alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        F.round(m["punct_ratio"], 4).alias("punct_ratio"),
        F.round(m["stopword_ratio"], 4).alias("stopword_ratio"),
        quality_score(text_col).alias("quality"),
        detect_language(text_col).alias("lang_pred"),
        content_fingerprint(text_col).alias("fingerprint"),
    )
