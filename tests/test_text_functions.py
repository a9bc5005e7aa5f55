"""Text function goldens, mirroring the reference's extractor tests
(crawler/text_extractor_test.go behavior: tag strip, whitespace collapse,
entity unescape; title extraction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from usearch_spark.functions.text import extract_title, html_to_text, normalize_text, tokenize


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_tokenize(spark):
    df = spark.createDataFrame([("Hello, World! 42 foo-bar",)], "s string")
    assert df.select(tokenize("s").alias("t")).first()["t"] == ["hello", "world", "42", "foo", "bar"]


def test_tokenize_empty_and_null(spark):
    df = spark.createDataFrame([("...",), (None,)], "s string")
    out = [r["t"] for r in df.select(tokenize("s").alias("t")).collect()]
    assert out[0] == []
    assert out[1] is None


def test_normalize_text(spark):
    df = spark.createDataFrame([("  A  lazy\tDOG!!  jumped ",)], "s string")
    assert df.select(normalize_text("s").alias("t")).first()["t"] == "a lazy dog jumped"


def test_extract_title(spark):
    html = "<html><head><TITLE class=x> My Page </TITLE></head><body>x</body></html>"
    df = spark.createDataFrame([(html,)], "s string")
    assert df.select(extract_title("s").alias("t")).first()["t"] == "My Page"


def test_html_to_text(spark):
    html = (
        "<html><head><script>var x=1;</script><style>.a{}</style></head>"
        "<body><h1>Head</h1><p>A &amp; B &lt;ok&gt;   and\n more</p></body></html>"
    )
    df = spark.createDataFrame([(html,)], "s string")
    assert df.select(html_to_text("s").alias("t")).first()["t"] == "Head A & B <ok> and more"
