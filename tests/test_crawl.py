"""Crawl-pass integration test — replica of the reference end-to-end test
(crawler/crawler_integration_test.go:24-128) with the same HTML fixture,
static fetch injection instead of live HTTP servers."""

from __future__ import annotations

import pytest

import datetime as dt

from pyspark.sql import functions as F

from usearch_spark.sources.graph_store import upsert_links, url_id
from usearch_spark.streaming.crawl import crawl_pass, due_links, static_fetcher

SERVER_RES = """
<html>
<head>
\t<title>A title</title>
\t<base href="http://google.com/"/>
</head>
<body>
  <a href="./relative">I am a link relative to base</a>
  <a href="/absolute/path">I am an absolute link</a>
  <a href="//images/cart.png">I am using the same URL scheme as this page</a>

  <!-- Link should be added to the index but without creating an edge to it -->
  <a href="ignore-me" rel="nofollow"/>
  <!-- The following links should be ignored -->
  <a href="file:///etc/passwd"></a>
  <a href="http://169.254.169.254/api/credentials">Link-local address</a>
</body>
</html>
"""

SRV1 = "http://server-one.test/"
SRV2 = "http://server-two.test/"


fake_fetch = static_fetcher(
    {
        SRV1: (200, "text/html; charset=utf-8", SERVER_RES),
        SRV2: (200, "text/html; charset=utf-8", SERVER_RES),
    }
)


def test_crawler_pipeline_integration(spark):
    now = dt.datetime(2024, 5, 1)
    seeds = upsert_links(None, spark.createDataFrame([(SRV1,), (SRV2,)], "url string"))

    res = crawl_pass(seeds, None, None, seeds.select("id", "url"), fetch_fn=fake_fetch, now=now)
    assert res.n_crawled == 2

    expected_urls = sorted(
        [
            SRV1,
            SRV2,
            "http://google.com/absolute/path",
            "http://google.com/relative",
            "http://google.com/ignore-me",
        ]
    )
    obtained = sorted(r["url"] for r in res.links.collect())
    assert obtained == expected_urls

    # edges: each server page -> relative + absolute (2 each); nofollow link
    # gets NO edge; excluded links (file://, private IP, .png) get nothing
    edges = res.edges.collect()
    dst_ids = {r["dst"] for r in edges}
    src_ids = {r["src"] for r in edges}
    ignore_id = res.links.filter(F.col("url") == "http://google.com/ignore-me").first()["id"]
    assert ignore_id not in dst_ids
    assert len(edges) == 4
    assert src_ids == {r["id"] for r in seeds.collect()}

    # documents: both server pages indexed with the golden title/content
    docs = {r["url"]: r for r in res.documents.collect()}
    exp_content = (
        "I am a link relative to base I am an absolute link I am using the "
        "same URL scheme as this page Link-local address"
    )
    for u in (SRV1, SRV2):
        assert docs[u]["title"] == "A title"
        assert docs[u]["content"] == exp_content
        assert docs[u]["indexed_at"] == now

    # crawled srcs got retrieved_at=now; discovered links have none yet
    lmap = {r["url"]: r["retrieved_at"] for r in res.links.collect()}
    assert lmap[SRV1] == now and lmap[SRV2] == now
    assert lmap["http://google.com/relative"] is None


def test_strict_ssrf_drops_unresolvable_host(spark):
    """Reference SSRF semantics (link_fetcher.go:66-73): with the strict
    detector — DNS-style resolver, resolution failure == private — a link
    to an unresolvable foreign host is DROPPED, a resolvable public one is
    kept, and a host resolving to a private address is dropped."""
    from usearch_spark.functions.privnet import PrivateNetworkDetector, static_resolver

    html = """
    <html><body>
      <a href="http://resolvable.example/page">public</a>
      <a href="http://no-such-host.example/page">unresolvable</a>
      <a href="http://intranet.corp/page">private-ip</a>
    </body></html>
    """
    seed = "http://seed.test/"
    fetch = static_fetcher({seed: (200, "text/html", html)})
    detector = PrivateNetworkDetector(
        resolver=static_resolver(
            {"resolvable.example": "93.184.216.34", "seed.test": "93.184.216.35"}
        ),
        on_unresolved="private",
    )
    seeds = upsert_links(None, spark.createDataFrame([(seed,)], "url string"))
    res = crawl_pass(
        seeds,
        None,
        None,
        seeds.select("id", "url"),
        fetch_fn=fetch,
        now=dt.datetime(2024, 5, 1),
        detector=detector,
    )
    urls = sorted(r["url"] for r in res.links.collect())
    assert urls == ["http://resolvable.example/page", seed]


def test_missing_fetcher_fails_loudly(spark):
    """stub_fetch (no fetcher configured) must raise, not degrade into an
    all-failed crawl."""
    import pytest as _pytest

    from usearch_spark.streaming.crawl import crawl_pass

    seeds = upsert_links(None, spark.createDataFrame([(SRV1,)], "url string"))
    with _pytest.raises(Exception, match="(?i)no URL fetcher|NotImplemented"):
        crawl_pass(seeds, None, None, seeds.select("id", "url"), now=dt.datetime(2024, 5, 1))


def test_per_url_fetch_errors_drop_row(spark):
    """A fetcher raising on one URL drops that row and keeps the pass."""
    from usearch_spark.streaming.crawl import crawl_pass

    def flaky(url: str):
        if url == SRV2:
            raise TimeoutError("connect timeout")
        return 200, "text/html", '<html><body>ok</body></html>'

    seeds = upsert_links(None, spark.createDataFrame([(SRV1,), (SRV2,)], "url string"))
    res = crawl_pass(seeds, None, None, seeds.select("id", "url"), fetch_fn=flaky, now=dt.datetime(2024, 5, 1))
    assert res.n_crawled == 1
    docs = {r["url"] for r in res.documents.collect()}
    assert docs == {SRV1}


def test_frontier_expansion_second_pass(spark):
    """ST4: links discovered in pass 1 are due in pass 2 (never retrieved)."""
    now1 = dt.datetime(2024, 5, 1)
    now2 = dt.datetime(2024, 5, 2)
    seeds = upsert_links(None, spark.createDataFrame([(SRV1,)], "url string"))
    r1 = crawl_pass(seeds, None, None, seeds.select("id", "url"), fetch_fn=fake_fetch, now=now1)

    due2 = due_links(r1.links, now2, dt.timedelta(minutes=2))
    due_urls = {r["url"] for r in due2.collect()}
    # SRV1 crawled a day ago (stale again) + all newly discovered links
    assert "http://google.com/relative" in due_urls
    assert SRV1 in due_urls

    r2 = crawl_pass(r1.links, r1.edges, r1.documents, due2, fetch_fn=fake_fetch, now=now2)
    # google links 404 -> dropped by status filter; SRV1 re-crawled
    assert r2.n_crawled == 1
    lmap = {r["url"]: r["retrieved_at"] for r in r2.links.collect()}
    assert lmap[SRV1] == now2


def test_stale_edges_removed_on_recrawl(spark):
    """P8/J6: a re-crawl that no longer asserts an edge removes it."""
    now1 = dt.datetime(2024, 5, 1)
    now2 = dt.datetime(2024, 5, 2)
    page_v1 = '<html><body><a href="http://a.test/x">x</a><a href="http://a.test/y">y</a></body></html>'
    page_v2 = '<html><body><a href="http://a.test/x">x</a></body></html>'

    seeds = upsert_links(None, spark.createDataFrame([("http://a.test/",)], "url string"))
    r1 = crawl_pass(
        seeds, None, None, seeds.select("id", "url"),
        fetch_fn=static_fetcher({"http://a.test/": (200, "text/html", page_v1)}), now=now1,
    )
    assert r1.edges.count() == 2

    r2 = crawl_pass(
        r1.links, r1.edges, r1.documents, seeds.select("id", "url"),
        fetch_fn=static_fetcher({"http://a.test/": (200, "text/html", page_v2)}), now=now2,
    )
    edges = r2.edges.collect()
    assert len(edges) == 1
    y_id = r2.links.filter(F.col("url") == "http://a.test/y").first()["id"]
    assert all(e["dst"] != y_id for e in edges)


def test_fetch_politeness_rate_limit(spark):
    """With per_host_delay_s, a host's fetches are co-partitioned and spaced;
    the result set is unchanged."""
    import time

    from usearch_spark.streaming.crawl import fetch_stage

    pages = {f"http://slow-host.test/p{i}": (200, "text/html", "<html/>") for i in range(4)}
    pages["http://other.test/"] = (200, "text/html", "<html/>")
    links = spark.createDataFrame(
        [(u.replace("http://", ""), u) for u in pages], "id string, url string"
    )
    fetcher = static_fetcher(pages)

    plain = {r["url"]: r["status_code"] for r in fetch_stage(links, fetcher).collect()}
    t0 = time.time()
    polite = {
        r["url"]: r["status_code"]
        for r in fetch_stage(links, fetcher, per_host_delay_s=0.2, n_partitions=4).collect()
    }
    elapsed = time.time() - t0
    assert polite == plain
    assert len(polite) == 5
    # 4 same-host fetches => at least 3 enforced gaps
    assert elapsed >= 0.6


@pytest.mark.slow
def test_frontier_crawl_stream(spark, tmp_path):
    """ST1+ST4 end-to-end: the processing-time stream drives crawl passes
    and newly discovered links are crawled by LATER passes (frontier
    expansion through the clock stream, reference crawler service shape)."""
    import time

    from usearch_spark.engine import USearchEngine
    from usearch_spark.streaming.events import periodic_crawl_stream

    a, b, c = "http://x.test/a", "http://x.test/b", "http://x.test/c"

    def page(links):
        anchors = "".join(f'<a href="{u}">l</a>' for u in links)
        return (200, "text/html", f"<html><head><title>t</title></head><body>{anchors}</body></html>")

    fetcher = static_fetcher({a: page([b]), b: page([c]), c: page([])})
    eng = USearchEngine(spark, str(tmp_path / "store"))
    eng.seed([a])

    passes: list[int] = []

    # all store reads happen INSIDE the serialized foreachBatch (a polling
    # thread would race the stream's read-join-overwrite store rewrites);
    # the tick raises a sentinel to terminate the stream once done
    def tick(epoch: int) -> None:
        passes.append(eng.run_crawl_pass(fetch_fn=fetcher))
        docs = eng.documents()
        if docs is not None and docs.count() >= 3:
            raise RuntimeError("__frontier_done__")

    q = periodic_crawl_stream(spark, tick, interval="1 second")
    try:
        finished = q.awaitTermination(120)
        assert not finished or q.exception() is not None
    except Exception:
        pass
    finally:
        exc = q.exception()
        q.stop()
    assert exc is not None and "__frontier_done__" in str(exc)

    docs = eng.documents()
    assert {r["url"] for r in docs.collect()} == {a, b, c}
    # the chain REQUIRES multiple passes: b only becomes due after a's pass
    assert len([p for p in passes if p > 0]) >= 2
