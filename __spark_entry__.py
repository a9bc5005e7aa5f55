"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (full-text MATCH search with
rank-blend) on sf0.001.  ``queries()`` exposes one callable per implemented
operator from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL
for the correctness gate.

Determinism rules used throughout (so Spark and DuckDB value-hashes match):
  - money/metric sums go through DECIMAL (exact, order-independent), then a
    final CAST TO DOUBLE — identical bits in both engines;
  - float expressions with few summands (tf-idf, cosine) are rounded;
  - timestamps are emitted as formatted strings, never raw;
  - every ORDER BY ... LIMIT has a full deterministic tie-break.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from usearch_spark.operators import search as S
from usearch_spark.plans.pagerank import pagerank

# ---------------------------------------------------------------------------
# helpers


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _dec(col, scale: int = 2):
    """Exact decimal for order-independent summation."""
    return F.col(col).cast(f"decimal(18,{scale})") if isinstance(col, str) else col.cast(f"decimal(18,{scale})")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table: its parquet timestamps are NANOS, which Spark's vectorized
    reader rejects — read them as long (legacy conf) and derive a micros
    timestamp column ``ts`` plus the raw ``ts_ns``."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _t(spark, sf_dir, "events")
    return ev.withColumn("ts_ns", F.col("ts").cast("long")).withColumn(
        "ts", F.timestamp_micros((F.col("ts").cast("long") / F.lit(1000)).cast("long"))
    )


SEARCH_TERMS = ["spark", "join"]
PHRASE = "batch batch"


# ---------------------------------------------------------------------------
# queries (spark side)


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (SURVEY §2.5 aggregation surface).

    Decimal-exact sums; avg derived from the exact sum so both engines agree
    bit-for-bit.
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    out = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("_sq"),
            F.sum(_dec("l_extendedprice")).alias("_sbp"),
            F.sum(disc_price).alias("_sdp"),
            F.sum(charge).alias("_sc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sbp").cast("double").alias("sum_base_price"),
            F.col("_sdp").cast("double").alias("sum_disc_price"),
            F.col("_sc").cast("double").alias("sum_charge"),
            (F.col("_sq").cast("double") / F.col("count_order")).alias("avg_qty"),
            "count_order",
        )
    )
    return out


def q_link_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2: range-partition scan — id in [lo,hi) AND ts < cutoff.

    At scale this is partition pruning on an id-bucketed table; here the
    filter pushes down to the parquet scan.
    """
    ev = _events(spark, sf_dir)
    return ev.filter(
        (F.col("event_id") >= 100) & (F.col("event_id") < 500) & (F.col("ts") < "2024-01-15 00:00:00")
    ).select("event_id", "user_id", "event_type", "value")


def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S4: point lookup by key."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    )


def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: upsert-dedupe by natural key keeping GREATEST(timestamp)
    (reference ON CONFLICT ... GREATEST, linkgraph/store/cdb/cdb.go:16-22)
    expressed as a pure groupBy — the batch form of the upsert."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order_date"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_spend"),
    )


def q_anti_join_stale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/J6: left-anti join (stale-edge removal shape, graph_updater.go:60-82)
    — customers with no large order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def q_top_k_paged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4/O2: ORDER BY ... OFFSET/LIMIT pagination (page 2, size 10) —
    TakeOrderedAndProject, no global window."""
    o = _t(spark, sf_dir, "orders")
    return S.paginate(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        offset=10,
        size=10,
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-J5: multi-way join + agg; dims broadcast (nation/region are tiny,
    customer broadcastable at bench SF)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q_search_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: MATCH query — tokenize -> postings -> tf-idf score -> top 10.
    (reference es.go:184-213; engine impl usearch_spark/operators/search.py)"""
    docs = _t(spark, sf_dir, "documents")
    postings = S.build_postings(docs, id_col="doc_id", text_cols=("text",))
    dfreq = S.doc_frequencies(postings, id_col="doc_id")
    n = docs.count()
    scored = S.score_match(postings, dfreq, n, SEARCH_TERMS, id_col="doc_id", round_to=4)
    return S.paginate(scored, [F.col("score").desc(), F.col("doc_id")], offset=0, size=10)


def q_search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: PHRASE query — normalized-substring containment."""
    docs = _t(spark, sf_dir, "documents")
    hits = S.phrase_filter(docs, PHRASE, text_cols=("text",))
    return hits.select("doc_id", "n_chars").orderBy("doc_id")


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1-ST4 analog: tumbling-window aggregation over the event stream
    (batch form; streaming wrapper in usearch_spark/streaming)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00:00").alias("hour_bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: PageRank (reference pagerank/compute.go parity — dead-end
    residual + SAD convergence) over the supplier→part graph derived from
    lineitem.  Parts have no out-edges, so the dead-end residual path is
    exercised.  Iterative — no SQL oracle; driver records rows-only."""
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
        )
        .dropDuplicates(["src", "dst"])
    )
    vertices = edges.select(F.col("src").alias("id")).unionByName(
        edges.select(F.col("dst").alias("id"))
    ).dropDuplicates(["id"])
    res = pagerank(vertices, edges, max_steps=50)
    return S.paginate(
        res.state.select("id", F.round(F.col("score"), 6).alias("score")),
        [F.col("score").desc(), F.col("id")],
        offset=0,
        size=20,
    )


# ---------------------------------------------------------------------------
# contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full-text MATCH search with rank-blend on sf0.001."""
    return q_search_match(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": q_pricing_summary,
        "link_range_scan": q_link_range_scan,
        "point_lookup": q_point_lookup,
        "upsert_latest": q_upsert_latest,
        "anti_join_stale": q_anti_join_stale,
        "top_k_paged": q_top_k_paged,
        "revenue_by_nation": q_revenue_by_nation,
        "search_match": q_search_match,
        "search_phrase": q_search_phrase,
        "events_hourly": q_events_hourly,
        "graph_pagerank": q_graph_pagerank,
    }


def oracle_sql() -> dict[str, str]:
    terms_values = ", ".join(f"('{t}')" for t in sorted(set(SEARCH_TERMS)))
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "link_range_scan": """
            SELECT event_id, user_id, event_type, value
            FROM events
            WHERE event_id >= 100 AND event_id < 500 AND ts < TIMESTAMP '2024-01-15 00:00:00'
        """,
        "point_lookup": """
            SELECT c_custkey, c_name, c_nationkey, c_mktsegment
            FROM customer WHERE c_custkey = 42
        """,
        "upsert_latest": """
            SELECT o_custkey AS custkey,
                   strftime(max(o_orderdate), '%Y-%m-%d') AS last_order_date,
                   count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
            FROM orders GROUP BY o_custkey
        """,
        "anti_join_stale": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (
                SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000
            )
        """,
        "top_k_paged": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 10 OFFSET 10
        """,
        "revenue_by_nation": """
            SELECT r_name AS region, n_name AS nation,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "search_match": f"""
            WITH toks AS (
                SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
                FROM documents
            ),
            tf AS (
                SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term
            ),
            dfreq AS (
                SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
            ),
            n AS (SELECT count(*) AS n FROM documents),
            q(term) AS (VALUES {terms_values})
            SELECT tf.doc_id,
                   round(sum(tf.tf * ln(1 + (n.n - dfreq.df + 0.5) / (dfreq.df + 0.5))), 4) AS score
            FROM tf JOIN q USING (term) JOIN dfreq USING (term) CROSS JOIN n
            GROUP BY tf.doc_id
            ORDER BY score DESC, tf.doc_id
            LIMIT 10
        """,
        "search_phrase": f"""
            SELECT doc_id, n_chars FROM (
                SELECT doc_id, n_chars,
                       ' ' || trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) || ' ' AS nt
                FROM documents
            )
            WHERE position(' {PHRASE} ' IN nt) > 0
            ORDER BY doc_id
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_bucket,
                   event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
    }
