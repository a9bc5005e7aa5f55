"""Skew hardening: the 100x-skew story the scale brief asks about, as
executable proof instead of prose.

Two adversarial synthetics:
  - a stop-content hub for MinHash LSH (every hub doc shares every band
    signature, so an uncapped bucket join would materialize O(hub^2)
    candidate pairs — the classic dedup scale-killer on boilerplate);
  - a 50%-in-degree vertex for PageRank (one reduce key receiving half of
    all messages — the hot-key shuffle the reference's relayer never sees
    because it runs single-node; Spark's answer is map-side partial
    aggregation, which bounds the hot key's shuffle input by #map tasks,
    not #messages).

Assertions pin BOTH the outputs (planted near-dups found, hub excluded,
ranks correct) and the mechanisms (bucket-cap drop accounting, partial_sum
before the Exchange in the physical plan, linter-clean plans).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from usearch_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_index,
    minhash_signatures,
)
from usearch_spark.plans.lint import errors, lint_plan
from usearch_spark.plans.pagerank import pagerank


def _skewed_corpus(spark, n_hub: int = 400, n_planted: int = 6):
    """n_hub docs with IDENTICAL boilerplate text (one LSH bucket of size
    n_hub in every band) + n_planted/2 planted near-dup pairs of distinct
    content + a few singletons."""
    hub = [(i, "terms of service apply all rights reserved contact us") for i in range(n_hub)]
    planted = []
    for k in range(n_planted // 2):
        base = f"unique document {k} alpha bravo charlie delta echo foxtrot golf hotel"
        planted.append((10_000 + 2 * k, base))
        planted.append((10_001 + 2 * k, base + " extra"))
    singles = [(20_000 + j, f"singleton {j} " + " ".join(f"w{j}x{i}" for i in range(12))) for j in range(5)]
    return spark.createDataFrame(hub + planted + singles, "doc_id long, text string")


def test_minhash_lsh_hub_bucket_dropped_and_planted_found(spark):
    docs = _skewed_corpus(spark)
    cap = 100
    pairs = minhash_dedup_pairs(docs, max_bucket=cap, threshold=0.7)
    got = {(r["a"], r["b"]) for r in pairs.collect()}

    # the planted near-dups survive ...
    for k in range(3):
        assert (10_000 + 2 * k, 10_001 + 2 * k) in got
    # ... and NOT ONE hub pair was emitted: the 400-doc bucket (79800
    # potential pairs per band) was dropped whole by the cap
    assert all(not (a < 400 and b < 400) for a, b in got), "hub pairs leaked past max_bucket"
    assert len(got) < 50

    # linter: no cartesian, no row-UDF, no global window in the plan
    assert errors(lint_plan(pairs)) == []


def test_minhash_lsh_drop_accounting(spark):
    """The cap must be observable, not silent: recompute bucket sizes from
    the index and verify the hub bucket exceeds the cap in EVERY band (so
    the drop was total, not partial) while planted-pair buckets fit."""
    docs = _skewed_corpus(spark)
    _, banded = minhash_index(docs)
    sized = banded.groupBy("band", "band_sig").agg(F.count(F.lit(1)).alias("n"))
    over = sized.filter(F.col("n") > 100)
    # one oversized bucket per band, each holding exactly the 400 hub docs
    rows = over.collect()
    assert len(rows) == 4 and all(r["n"] == 400 for r in rows)

    # and with the cap raised above the hub, the pairs DO come back — the
    # drop is the cap's doing, not an accident of the pipeline
    uncapped = lsh_candidate_pairs(minhash_signatures(docs), max_bucket=500)
    n_hub_pairs = uncapped.filter((F.col("a") < 400) & (F.col("b") < 400)).count()
    assert n_hub_pairs == 400 * 399 // 2


def _hub_graph(spark, n: int = 3000):
    """Every vertex links the hub (vertex 0) and its ring successor: the
    hub receives n of the 2n messages every superstep."""
    v = spark.range(n).select(F.col("id").cast("string"))
    ring = spark.range(n).select(
        F.col("id").cast("string").alias("src"),
        ((F.col("id") + 1) % n).cast("string").alias("dst"),
    )
    to_hub = spark.range(1, n).select(
        F.col("id").cast("string").alias("src"), F.lit("0").alias("dst")
    )
    return v, ring.union(to_hub)


def test_pagerank_hub_key_partial_aggregation(spark):
    v, e = _hub_graph(spark)
    # force the distributed superstep loop — the local numpy path would not
    # exercise the shuffle this test is about
    res = pagerank(v, e, strategy="distributed", max_steps=5, edges_deduped=True)
    ranks = res.state.withColumnRenamed("score", "rank")

    # the hot reduce key must be fed by map-side partial sums.  The loop's
    # per-step plan is lineage-truncated out of the final state, so rebuild
    # the exact superstep contribution shape (ranks ⋈ edges → groupBy dst →
    # sum) and assert the physical plan runs partial_sum before the
    # Exchange: the hub key's shuffle input is one row per map task, not
    # one per message.
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    cur = ranks.join(out_deg, ranks["id"] == out_deg["src"]).drop("src")
    contribs = (
        cur.join(e, cur["id"] == e["src"])
        .select(F.col("dst").alias("id"), (F.col("rank") / F.col("outdeg")).alias("msg"))
        .groupBy("id")
        .agg(F.sum("msg").alias("msg_sum"))
    )
    plan = contribs._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan, plan[:2000]
    assert errors(lint_plan(contribs)) == []

    rows = {r["id"]: r["rank"] for r in ranks.collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-6
    hub = rows["0"]
    assert hub == max(rows.values()) and hub > 0.2
    assert errors(lint_plan(ranks)) == []
