"""Text-analysis operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from usearch_spark.operators.text_analysis import (
    analyze,
    bpe_ish_token_count,
    detect_language,
    quality_score,
    word_token_count,
)


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
