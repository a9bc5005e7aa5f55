"""The crawl pass (SURVEY §3.2) as one batch DataFrame job, plus the
periodic-service wrapper (ST1-ST4).

Reference pipeline (crawler/crawler.go:46-74): linkFetcher -> linkExtractor
-> textExtractor -> broadcast{graphUpdater, textIndexer}.  The reference
moves one payload at a time through goroutines+channels; here each stage is
a column transformation over the whole batch and Spark pipelines them in
one pass (whole-stage codegen replaces the channel plumbing).

Stages:
  1. due-link selection: retrieved_at < now - reindex_threshold (ST2)
  2. fetch: mapInPandas with an injectable ``fetch_fn`` (U5 extension
     point, crawler/interfaces.go:15-23) — row-wise IO belongs in an
     Arrow-batched Python stage; per-partition parallelism supplies the
     reference's worker-pool concurrency (P4)
  3. filters: non-HTML URL (F1), 2xx + html content-type (F3)
  4. link extraction (X1): JVM regexes + urljoin pandas UDF + explode +
     per-page dedupe + nofollow split
  5. text extraction (X2/X3): title + tag-stripped content
  6. graph update (P8): src retrieved_at=now; upsert ALL discovered links
     (nofollow links get no edges); upsert edges; drop stale edges of
     re-crawled srcs
  7. index update (P9): pagerank-preserving document merge

The whole pass produces new (links, edges, documents) DataFrames — three
MERGE writes at the end; nothing collects to the driver.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from usearch_spark.functions.text import extract_title, html_to_text
from usearch_spark.functions.urls import (
    extract_anchor_tags,
    extract_base_href,
    href_of_tag,
    is_nofollow_tag,
    is_non_html_url,
    keep_url_udf,
    resolve_url_udf,
)
from usearch_spark.session import ship_package
from usearch_spark.sources.graph_store import remove_stale_edges, upsert_edges, upsert_links, url_id
from usearch_spark.sources.index_store import index_docs

# fetch_fn: url -> (status_code, content_type, body)
FetchFn = Callable[[str], tuple[int, str, str]]

FETCH_RESULT_SCHEMA = "id string, url string, status_code int, content_type string, raw_content string"


def stub_fetch(url: str) -> tuple[int, str, str]:
    """Default fetcher: this environment has no network access.  Inject a
    real one (requests.get) in deployments, or a fake in tests."""
    raise NotImplementedError(
        "no URL fetcher configured — pass fetch_fn=... (network IO is stubbed in this environment)"
    )


def static_fetcher(pages: dict[str, tuple[int, str, str]], default: tuple[int, str, str] = (404, "text/plain", "")) -> FetchFn:
    """FetchFn serving a fixed url->(status, content_type, body) map — the
    injectable test getter (reference crawler/mocks URLGetter)."""

    def fetch(url: str) -> tuple[int, str, str]:
        return pages.get(url, default)

    return fetch


def fetch_stage(
    due_links: DataFrame,
    fetch_fn: FetchFn,
    per_host_delay_s: float = 0.0,
    n_partitions: int | None = None,
) -> DataFrame:
    """mapInPandas fetch: one Python worker per partition, Arrow-batched.
    Partition count controls fetch concurrency (the reference's
    NumOfFetchWorkers).

    Politeness: with ``per_host_delay_s`` > 0, links are hash-partitioned
    by URL host so ALL of a host's fetches run in one task, and that task
    spaces them at least the delay apart.  Co-locating a host is what makes
    the rate limit global — without it, 1000 executors each politely
    hitting the same host is still a 1000x hammer."""

    ship_package(due_links.sparkSession)
    src = due_links.select("id", "url")
    if per_host_delay_s > 0:
        host = F.parse_url(F.col("url"), F.lit("HOST"))
        src = (
            src.repartition(n_partitions, host) if n_partitions else src.repartition(host)
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time
        from urllib.parse import urlparse

        last_hit: dict[str, float] = {}
        for pdf in batches:
            out = {"id": [], "url": [], "status_code": [], "content_type": [], "raw_content": []}
            for row in pdf.itertuples(index=False):
                if per_host_delay_s > 0:
                    h = urlparse(row.url).netloc
                    wait = last_hit.get(h, -1e9) + per_host_delay_s - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                    last_hit[h] = time.monotonic()
                try:
                    status, ctype, body = fetch_fn(row.url)
                except NotImplementedError:
                    # misconfiguration (no fetcher injected) must fail the
                    # job loudly, not degrade into an all-404 crawl
                    raise
                except Exception:
                    # per-URL failures (timeouts, DNS, TLS) drop the row,
                    # mirroring the reference's error-drop stage semantics
                    status, ctype, body = 0, "", ""
                out["id"].append(row.id)
                out["url"].append(row.url)
                out["status_code"].append(status)
                out["content_type"].append(ctype)
                out["raw_content"].append(body)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, FETCH_RESULT_SCHEMA)


def extract_stage(fetched: DataFrame, detector=None) -> DataFrame:
    """F1/F3 filters + X1 link extraction + X2/X3 text extraction.

    Output: one row per successfully-fetched HTML page with
    links / nofollow_links arrays and title / text_content columns.

    ``detector``: private-network detector for the keep-filter (F2);
    defaults to the no-DNS pipeline detector — inject
    PrivateNetworkDetector(resolver=dns_resolver) for reference-parity
    SSRF guarding (crawler/link_fetcher.go:66-73).
    """
    ship_package(fetched.sparkSession)
    pages = fetched.filter(
        ~is_non_html_url(F.col("url"))
        & (F.col("status_code") >= 200)
        & (F.col("status_code") <= 299)
        & F.lower(F.coalesce(F.col("content_type"), F.lit(""))).contains("html")
    )

    tagged = (
        pages.withColumn("base_href", extract_base_href(F.col("raw_content")))
        .withColumn("tag", F.explode_outer(extract_anchor_tags(F.col("raw_content"))))
        .withColumn("resolved", resolve_url_udf(F.col("url"), F.col("base_href"), href_of_tag(F.col("tag"))))
        .withColumn(
            "kept",
            F.when(
                F.col("resolved").isNotNull()
                & ~is_non_html_url(F.col("resolved"))
                & keep_url_udf(F.col("url"), F.col("resolved"), detector),
                F.col("resolved"),
            ),
        )
        .withColumn("nofollow", is_nofollow_tag(F.col("tag")))
    )

    links_agg = tagged.groupBy("id", "url", "raw_content").agg(
        F.array_distinct(F.filter(F.collect_list(F.when(~F.col("nofollow"), F.col("kept"))), lambda x: x.isNotNull())).alias("links"),
        F.array_distinct(F.filter(F.collect_list(F.when(F.col("nofollow"), F.col("kept"))), lambda x: x.isNotNull())).alias("nofollow_links"),
    )
    # per-page first-seen dedupe: a URL in both follow and nofollow sets
    # counts once; follow wins (the reference keeps first occurrence —
    # order inside one page is not semantically meaningful downstream)
    deduped = links_agg.withColumn("nofollow_links", F.array_except("nofollow_links", "links"))

    return (
        deduped.withColumn("title", extract_title(F.col("raw_content")))
        .withColumn("text_content", html_to_text(F.col("raw_content")))
        .drop("raw_content")
    )


@dataclass
class CrawlResult:
    links: DataFrame
    edges: DataFrame
    documents: DataFrame
    n_crawled: int


def crawl_pass(
    links: DataFrame | None,
    edges: DataFrame | None,
    documents: DataFrame | None,
    seed_or_due: DataFrame,
    fetch_fn: FetchFn = stub_fetch,
    now: dt.datetime | None = None,
    detector=None,
) -> CrawlResult:
    """One full crawl pass over ``seed_or_due`` links (id, url).

    Newly discovered links join the links table (frontier expansion, ST4) —
    the NEXT pass picks them up because their retrieved_at is null.
    """
    now = now or dt.datetime.utcnow()
    now_lit = F.lit(now)

    fetched = fetch_stage(seed_or_due, fetch_fn)
    payload = extract_stage(fetched, detector).localCheckpoint(eager=True)  # fetch once, fan out thrice (P5 broadcast stage)
    n_crawled = payload.count()

    # --- graph updater (P8, crawler/graph_updater.go:27-86)
    # one upsert covers both discovered links (null retrieved_at) and the
    # crawled srcs (retrieved_at=now): max(retrieved_at) ignores nulls, so a
    # single groupBy over the links table replaces two full-table shuffles
    discovered = payload.select(
        F.explode(F.concat(F.col("links"), F.col("nofollow_links"))).alias("url")
    ).withColumn("retrieved_at", F.lit(None).cast("timestamp"))
    crawled_src = payload.select("url").withColumn("retrieved_at", now_lit)
    new_links = upsert_links(links, discovered.unionByName(crawled_src))

    # edges only for follow links (nofollow links are upserted but get no
    # edges — graph_updater.go:46-58)
    new_edge_rows = payload.select(
        url_id(F.col("url")).alias("src"), F.explode(F.col("links")).alias("dst_url")
    ).select("src", url_id(F.col("dst_url")).alias("dst"))
    new_edges = upsert_edges(edges, new_edge_rows, new_links, updated_at=now_lit)
    # drop edges of re-crawled pages not re-asserted this pass
    new_edges = remove_stale_edges(new_edges, payload.select(url_id(F.col("url")).alias("id")), now_lit)

    # --- text indexer (P9, crawler/text_indexer.go:24-46)
    new_docs = payload.select(
        url_id(F.col("url")).alias("link_id"),
        "url",
        "title",
        F.col("text_content").alias("content"),
    ).withColumn("indexed_at", now_lit)
    new_documents = index_docs(documents, new_docs)

    return CrawlResult(new_links, new_edges, new_documents, n_crawled)


def due_links(links: DataFrame, now: dt.datetime, reindex_threshold: dt.timedelta) -> DataFrame:
    """ST2: links re-crawled only when retrieved_at < now - threshold (or
    never retrieved)."""
    cutoff = now - reindex_threshold
    return links.filter(F.col("retrieved_at").isNull() | (F.col("retrieved_at") < F.lit(cutoff))).select(
        "id", "url"
    )
