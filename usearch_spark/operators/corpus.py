"""Corpus-curation operators for large-scale training-data pipelines:
eval-set decontamination, duplicate-cluster resolution, boilerplate
n-gram detection, PII scrubbing, and quality-filter funnels.

These extend the reference's crawl-time filtering surface (per-stage drop
semantics, crawler/link_fetcher.go:57-92; SURVEY §2.2 F1-F6) to the
corpus-preparation operations a 100 TB training pipeline needs.  Everything
is built-in column expressions plus ordinary joins/aggregations — no Python
in the hot path, and the only shuffles are keyed aggregations:

  - decontamination: the eval-set gram table is tiny relative to the corpus
    (benchmark suites vs a crawl), so the membership probe is a broadcast
    semi-join against a one-pass shingle scan;
  - boilerplate: one shuffle to compute gram document-frequencies, then a
    co-partitioned join back onto the same gram table;
  - cluster resolution: connected components over the near-dup pair graph
    (pairs are the output of the banded/bucketed dedup operators, so the
    graph is sparse by construction);
  - scrubbing: a codegen regexp_replace chain — scan-speed;
  - funnel: cumulative-predicate counters in a single aggregation pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from usearch_spark.functions.text import tokenize
from usearch_spark.operators.dedup import shingles_of_tokens
from usearch_spark.plans.pregel import connected_components

# ---------------------------------------------------------------------------
# decontamination


def _gram_table(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram): distinct word n-grams per document, one tokenize pass,
    spread across cores first (the scan may be a single unsplittable file
    locally; on a cluster with real splits the spread is a no-op)."""
    from usearch_spark.session import spread_small_scan

    toks = spread_small_scan(docs).select(F.col(id_col).alias("id"), tokenize(text_col).alias("_toks"))
    return toks.select("id", F.explode(shingles_of_tokens(F.col("_toks"), n)).alias("gram"))


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-training-document n-gram overlap against an evaluation set —
    the standard benchmark-decontamination check for training corpora.

    contamination(d) = |grams(d) ∩ grams(eval)| / |grams(d)| over distinct
    word n-grams; documents at or above ``threshold`` are flagged.

    Scale shape: the eval gram set (benchmarks, thousands of docs) is
    orders of magnitude smaller than the corpus, so it is deduplicated and
    broadcast; the corpus side is one tokenize+explode scan followed by a
    per-document aggregation — no corpus-sized shuffle beyond the final
    groupBy(id).

    Output: (id_col, n_grams, n_hits, contamination, contaminated).
    """
    eval_grams = _gram_table(eval_df, id_col, text_col, n).select("gram").dropDuplicates(["gram"])
    grams = _gram_table(train, id_col, text_col, n)
    hits = grams.join(F.broadcast(eval_grams.withColumn("_hit", F.lit(1))), "gram", "left")
    out = hits.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hits"),
    )
    # exact-integer rational round (counts are ints): q = (hits·1e4) DIV
    # grams + twice-remainder half-up bump, one cast + one divide — the
    # 4dp boundary cannot flip cross-engine
    contamination = (
        F.expr(
            "(n_hits * 10000) DIV greatest(n_grams, 1)"
            " + CASE WHEN 2 * ((n_hits * 10000) % greatest(n_grams, 1))"
            " >= greatest(n_grams, 1) THEN 1 ELSE 0 END"
        ).cast("double")
        / F.lit(10000.0)
    )
    return out.select(
        F.col("id").alias(id_col),
        "n_grams",
        "n_hits",
        contamination.alias("contamination"),
        (contamination >= threshold).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# duplicate-cluster resolution


def resolve_duplicate_clusters(pairs: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Resolve near-duplicate PAIRS into clusters and elect one canonical
    document per cluster — the final step of every dedup pipeline (pairs
    alone don't say which copies to drop when duplicates chain a~b~c).

    Connected components (min-id label propagation on the engine's pregel
    harness) over the undirected pair graph; the canonical id is the
    component minimum, so election is deterministic.

    Output: (doc_id, cluster_id, cluster_size, keep) — one row per document
    that appears in at least one pair; ``keep`` marks the canonical copy.
    Downstream: left-anti join the (keep = false) ids against the corpus.
    """
    # materialize the pair set ONCE: the component solver's size probe, the
    # vertex derivation, and the label propagation each trigger an action,
    # and the pair lineage upstream (jaccard/cosine candidate generation)
    # is the expensive part — without this it re-executes per action
    # (measured 18s -> 2s on the embedding-pair input)
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")).localCheckpoint(eager=True)
    v = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates(["id"])
    )
    comp = connected_components(v, e).state.select(
        F.col("id").alias("doc_id"), F.col("value").alias("cluster_id")
    )
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# boilerplate detection


def boilerplate_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    min_df: int = 100,
) -> DataFrame:
    """Corpus-frequent n-gram ("boilerplate") coverage per document.

    A gram appearing in >= ``min_df`` documents is boilerplate (headers,
    footers, navigation chrome, license blurbs).  Coverage is the fraction
    of a document's distinct grams that are boilerplate — a high-coverage
    document is template chrome, not content.

    One shuffle computes gram document-frequencies; the flag joins back
    onto the same gram table co-partitioned by gram (no second tokenize
    pass — the gram table is checkpointed once and feeds both sides).

    Output: (id_col, n_grams, n_boiler, boiler_ratio).
    """
    grams = _gram_table(docs, id_col, text_col, n).localCheckpoint(eager=True)
    dfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    flagged = grams.join(dfreq, "gram").withColumn("_boiler", (F.col("df") >= min_df).cast("int"))
    out = flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("_boiler").alias("n_boiler"),
    )
    return out.select(
        F.col("id").alias(id_col),
        "n_grams",
        "n_boiler",
        # exact-integer rational round, same recipe as decontaminate
        (
            F.expr(
                "(n_boiler * 10000) DIV greatest(n_grams, 1)"
                " + CASE WHEN 2 * ((n_boiler * 10000) % greatest(n_grams, 1))"
                " >= greatest(n_grams, 1) THEN 1 ELSE 0 END"
            ).cast("double")
            / F.lit(10000.0)
        ).alias("boiler_ratio"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing

# (pattern, replacement) applied in order; patterns are kept to the regex
# subset where Java (Spark) and RE2 (DuckDB/ripgrep) agree so the same
# chain is portable to the oracle.  Email before IP before bare digit runs:
# an address like 10.1.2.3 must not be half-eaten by the number rule first.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d[\d\- ]{6,}\d\b", "<PHONE>"),
    (r"\d{4,}", "<NUM>"),
]


def scrub_pii(col: Column | str, patterns: Sequence[tuple[str, str]] = PII_PATTERNS) -> Column:
    """Mask PII-shaped substrings (emails, IPv4 literals, phone-like digit
    runs, long numbers) with typed placeholder tags.

    A chain of JVM regexp_replace calls — whole-stage codegen, scan-speed
    at 100 TB; replacements apply in list order so broader patterns can't
    shadow narrower ones.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in patterns:
        c = F.regexp_replace(c, pat, rep)
    return c


# ---------------------------------------------------------------------------
# quality-filter funnel


def filter_funnel(df: DataFrame, stages: Sequence[tuple[str, Column]]) -> DataFrame:
    """Per-stage drop accounting for a conjunctive filter chain — the
    reference's per-stage drop semantics (pipeline/interfaces.go:33-40,
    SURVEY F5) lifted to corpus curation observability.

    Stage i's input is every row that survived stages 0..i-1, so the
    counters are cumulative-AND sums; all of them are computed in ONE
    aggregation pass over the data (no per-stage re-scan), then unpivoted
    to a row per stage on the driver-sized result.

    Output: (stage_idx, stage, rows_in, rows_out, dropped).
    """
    if not stages:
        raise ValueError("at least one stage required")
    cum: list[Column] = []
    acc: Column | None = None
    for _, cond in stages:
        acc = cond if acc is None else (acc & cond)
        cum.append(acc)
    counters = df.agg(
        F.count(F.lit(1)).alias("c_in"),
        *[F.sum(c.cast("long")).alias(f"c{i}") for i, c in enumerate(cum)],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(name).alias("stage"),
                (F.col("c_in") if i == 0 else F.col(f"c{i - 1}")).alias("rows_in"),
                F.col(f"c{i}").alias("rows_out"),
            )
            for i, (name, _) in enumerate(stages)
        ]
    )
    return (
        counters.select(F.explode(rows).alias("s"))
        .select("s.stage_idx", "s.stage", "s.rows_in", "s.rows_out")
        .withColumn("dropped", F.col("rows_in") - F.col("rows_out"))
    )


# ---------------------------------------------------------------------------
# embedding centroids


def label_centroids(
    emb: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 6,
) -> DataFrame:
    """Per-label mean vector (the aggregation under IVF coarse quantizers,
    class prototypes, and cluster summaries), computed JVM-side.

    posexplode to (label, pos, component) rows, then one partial-agg
    groupBy(label, pos).  Components are summed as exact DECIMALs (via an
    explicit float -> double widening, which is exact binary, then a
    double -> decimal rounding that every engine performs identically):
    decimal addition is order-independent, so Spark and any oracle agree
    bit-for-bit regardless of partitioning — the same determinism rule the
    money sums use.

    Output: (label_col, pos, centroid, n_vecs) — long form; pivot or
    collect_list(sort pos) for the array form.
    """
    parts = emb.select(F.col(label_col).alias("label"), F.posexplode(F.col(vec_col)).alias("pos", "x"))
    out = parts.groupBy("label", "pos").agg(
        F.sum(F.col("x").cast("double").cast("decimal(28,9)")).alias("_sum"),
        F.count(F.lit(1)).alias("n_vecs"),
    )
    if not 0 <= round_to <= 9:
        raise ValueError("round_to must be within the sum's 9-digit scale")
    # exact-integer rational round: the scale-9 decimal sum shifts
    # losslessly to 1e-9 units, q = sgn·(|sum_u| DIV (n·10^(9-k)) + bump),
    # one cast + one divide — never a rounded double quotient
    d = f"(CAST(n_vecs AS DECIMAL(20,0)) * {10 ** (9 - round_to)})"
    # the tight (28,9) re-cast keeps the *1e9 shift inside precision 38
    # with scale 9 intact (no precision-loss adjustment can fire)
    su = "CAST(CAST(abs(_sum) AS DECIMAL(28,9)) * 1000000000 AS DECIMAL(38,0))"
    q = F.expr(
        "(CASE WHEN _sum < 0 THEN -1 ELSE 1 END)"
        f" * ({su} DIV {d}"
        f"    + CASE WHEN 2 * ({su} % {d}) >= {d} THEN 1 ELSE 0 END)"
    )
    return out.select(
        "label",
        "pos",
        (q.cast("double") / F.lit(float(10**round_to))).alias("centroid"),
        "n_vecs",
    )


def mixture_weights(
    docs: DataFrame,
    weight: Column,
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pretraining-mixture planning: given per-source target weights and a
    total token budget, compute each source's target share, the sampling
    rate that hits it, and the expected token yield (capped at the
    source's actual supply) — the arithmetic behind 'sample The Pile at
    these proportions'.

    One partial-agg scan (per-source doc/token counts), then broadcast
    1-row totals; floor() for the integer yields so both engines agree on
    ties.  Output: (source, n_docs, n_tokens, target_share, sample_rate,
    expected_tokens).
    """
    from usearch_spark.operators.text_analysis import word_token_count

    per = (
        docs.select(F.col(source_col).alias("source"), weight.alias("w"), word_token_count(text_col).alias("nt"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.max("w").alias("w"),
        )
        # |sources| rows: materializing the per-source aggregate keeps the
        # totals row below from physically re-running the whole upstream
        # plan (for lang-mix that upstream is the full langid pipeline —
        # the un-checkpointed plan carried it TWICE)
        .localCheckpoint(eager=True)
    )
    tot = per.agg(F.sum("w").alias("tw"))
    share = F.col("w") / F.col("tw")
    target_tokens = share * F.lit(float(token_budget))
    rate = F.least(F.lit(1.0), target_tokens / F.col("n_tokens"))
    return (
        per.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(share, 6).alias("target_share"),
            F.round(rate, 6).alias("sample_rate"),
            F.floor(rate * F.col("n_tokens")).cast("long").alias("expected_tokens"),
        )
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    draw_col: str = "draw",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006, the exponential-clocks form): each row gets an
    exponential draw  -ln(u)/w  with u a hash-uniform of its key, and the
    k SMALLEST draws are the sample — inclusion probability proportional
    to weight, one pass, fully parallel, and the winner set is mergeable
    (min-k of min-ks), which is what makes it work as a distributed /
    streaming reservoir.

    Determinism: u is built from the first 8 md5 hex chars of the key as
    (int + 0.5) / 2^32 — exactly representable arithmetic, so ANY engine
    reproduces the identical u (the +0.5 also keeps u > 0, so ln never
    sees 0).  The draw is fixed-pointed to 1e-9 via floor(x·1e9 + 0.5)
    before ranking — ln/divide/multiply are correctly-rounded IEEE ops
    on identical inputs and floor is exact, so every engine produces the
    bit-identical draw (a double round(x, 9) could disagree at ties).
    Ties break on the key.

    Cost shape at 100 TB: map-side expression + TakeOrdered(k) — no
    shuffle of the data, no rand() (retries/speculation keep the sample).
    """
    hh = F.md5(F.col(key_col).cast("string"))
    uint = F.conv(F.substring(hh, 1, 8), 16, 10).cast("double")
    u = (uint + F.lit(0.5)) / F.lit(4294967296.0)
    draw = (
        F.floor(
            -F.log(u) / F.col(weight_col).cast("double") * F.lit(1000000000.0)
            + F.lit(0.5)
        ).cast("double")
        / F.lit(1000000000.0)
    )
    # weight <= 0 has no sampling meaning and would yield -inf/NaN draws
    # that silently hijack the top-k — excluded, like null coordinates in
    # the pareto operator
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn(draw_col, draw)
        .orderBy(F.col(draw_col).asc(), F.col(key_col).asc())
        .limit(k)
    )


def ngram_novelty(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document N-GRAM NOVELTY against the corpus prefix: the share
    of a document's distinct word n-grams whose FIRST corpus occurrence
    (minimum ``id_col`` over all documents containing the gram) is the
    document itself — the incremental-information measure a dedup-aware
    ingest uses to rank "how much of this document have we already
    seen?", the ordered complement of decontaminate's set overlap (and a
    streaming-friendly stat: first-occurrence is a plain min).

    Determinism: gram ownership is an integer min, counts are exact
    integers, novelty is ONE divide + round.

    Distributed shape: one tokenize/explode pass to the (id, gram)
    table, one gram-keyed min aggregate (the decontaminate gram-table
    join shape), one id-keyed count rollup.  No windows, no UDFs.

    Output: (id, n_grams, n_novel, novelty) — documents with no n-grams
    (fewer than ``n`` tokens) are omitted, as in decontaminate.
    """
    grams = _gram_table(docs, id_col, text_col, n)
    first = grams.groupBy("gram").agg(F.min("id").alias("_first"))
    per = (
        grams.join(first, "gram")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("id") == F.col("_first"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per.select(
        F.col("id").alias(id_col),
        "n_grams",
        "n_novel",
        (
            F.col("n_novel").cast("double") / F.col("n_grams").cast("double")
        ).alias("novelty"),
    )


def coverage_select(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """SUBMODULAR GREEDY data selection (maximum n-gram coverage — the
    facility-location/MAXCOVER greedy of Nemhauser et al. 1978, the
    standard "pick the k most informative documents" primitive of
    training-data curation): round r picks the document adding the most
    NOT-YET-COVERED distinct word n-grams (ties to the smaller id),
    giving the classic (1 − 1/e) coverage guarantee.

    Distributed shape: the gram table is built once (one tokenize/
    explode pass); each of the k rounds is one anti-join against the
    covered-gram set + one partial-agg count + a ONE-ROW argmax
    transfer (the graph_kcenters / mmr_topk greedy contract) — never a
    driver-side gram set.  The covered set is re-checkpointed per round
    (bounded by k·max-doc-grams rows).

    Determinism: gains and coverage totals are exact integer counts;
    the argmax order (gain desc, id) is total.

    Output: (pick_rank, id, gain, covered_total) — covered_total the
    cumulative distinct-gram count after the pick.
    """
    grams = _gram_table(docs, id_col, text_col, n).localCheckpoint(eager=True)
    covered = None
    picks: list[tuple] = []
    total = 0
    for r in range(1, k + 1):
        cand = grams if covered is None else grams.join(covered, "gram", "left_anti")
        row = (
            cand.groupBy("id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.col("gain").desc(), "id")
            .first()
        )
        if row is None or row["gain"] == 0:
            break
        total += row["gain"]
        picks.append((r, row["id"], row["gain"], total))
        newly = grams.filter(F.col("id") == row["id"]).select("gram")
        covered = (
            newly if covered is None else covered.unionByName(newly)
        ).localCheckpoint(eager=True)
    spark = docs.sparkSession
    return spark.createDataFrame(
        picks, "pick_rank long, doc_id long, gain long, covered_total long"
    ).withColumnRenamed("doc_id", id_col)
