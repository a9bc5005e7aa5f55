"""Graph-store conformance tests, modeled on the reference suite
(linkgraph/graph/graphtest/suite.go: link.go, edge.go):
  - URL-dedupe upsert keeping GREATEST(retrieved_at), stable ids
  - edge identity (src,dst), updated_at refresh, FK validation
  - time-filtered range iteration; partitioned iteration totality
  - stale-edge removal
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from usearch_spark.sources.graph_store import (
    ParquetGraphStore,
    edges_range,
    find_link,
    links_range,
    remove_stale_edges,
    upsert_edges,
    upsert_links,
    url_id,
)

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)


def links_df(spark, rows):
    return spark.createDataFrame(rows, "url string, retrieved_at timestamp")


def test_upsert_link_dedupes_by_url_keeps_greatest(spark):
    a = links_df(spark, [("http://x/1", T1), ("http://x/2", T0)])
    b = links_df(spark, [("http://x/1", T0), ("http://x/2", T2)])
    merged = upsert_links(upsert_links(None, a), b)
    got = {r["url"]: r["retrieved_at"] for r in merged.collect()}
    assert got == {"http://x/1": T1, "http://x/2": T2}


def test_upsert_link_id_stable_across_upserts(spark):
    a = upsert_links(None, links_df(spark, [("http://x/1", T0)]))
    b = upsert_links(a, links_df(spark, [("http://x/1", T1)]))
    id_a = a.first()["id"]
    id_b = b.first()["id"]
    assert id_a == id_b
    assert len(id_a) == 36 and id_a.count("-") == 4  # uuid-shaped


def test_null_retrieved_at_loses_to_timestamp(spark):
    a = links_df(spark, [("http://x/1", None)])
    b = links_df(spark, [("http://x/1", T1)])
    merged = upsert_links(upsert_links(None, a), b)
    assert merged.first()["retrieved_at"] == T1
    # and the reverse order too
    merged2 = upsert_links(upsert_links(None, b), a)
    assert merged2.first()["retrieved_at"] == T1


def test_find_link_and_range_scan(spark):
    links = upsert_links(None, links_df(spark, [(f"http://x/{i}", T0 if i % 2 else T2) for i in range(10)]))
    some = links.first()
    assert find_link(links, some["id"])["url"] == some["url"]
    assert find_link(links, "no-such-id") is None
    # time-filtered scan: only links retrieved before T1 (odd i)
    due = links_range(links, None, None, retrieved_before=T1)
    assert due.count() == 5


def test_partitioned_range_scan_total_and_disjoint(spark):
    """Partitioned iteration must cover every link exactly once
    (graphtest link.go:210-248) — split the id space at arbitrary hex
    boundaries, incl. uneven partitions."""
    links = upsert_links(None, links_df(spark, [(f"http://x/{i}", T0) for i in range(50)]))
    bounds = [None, "4", "a", "c", None]  # 4 uneven partitions over hex ids
    seen = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        seen += [r["id"] for r in links_range(links, lo, hi).collect()]
    assert sorted(seen) == sorted(r["id"] for r in links.collect())
    assert len(seen) == 50


def edges_df(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


@pytest.fixture()
def five_links(spark):
    return upsert_links(None, links_df(spark, [(f"http://x/{i}", T0) for i in range(5)]))


def test_upsert_edge_identity_and_fk(spark, five_links):
    ids = [r["id"] for r in five_links.orderBy("url").collect()]
    e = edges_df(spark, [(ids[0], ids[1]), (ids[0], ids[1]), (ids[1], ids[2]), (ids[0], "unknown")])
    merged = upsert_edges(None, e, five_links, updated_at=F.lit(T1))
    rows = merged.collect()
    # duplicate (src,dst) collapsed; unknown-endpoint edge dropped (FK)
    assert len(rows) == 2
    assert all(r["updated_at"] == T1 for r in rows)


def test_upsert_edge_refreshes_updated_at(spark, five_links):
    ids = [r["id"] for r in five_links.orderBy("url").collect()]
    e1 = upsert_edges(None, edges_df(spark, [(ids[0], ids[1])]), five_links, updated_at=F.lit(T0))
    e2 = upsert_edges(e1, edges_df(spark, [(ids[0], ids[1])]), five_links, updated_at=F.lit(T2))
    rows = e2.collect()
    assert len(rows) == 1 and rows[0]["updated_at"] == T2
    # edge id stable across refresh
    assert rows[0]["id"] == e1.first()["id"]


def test_remove_stale_edges(spark, five_links):
    ids = [r["id"] for r in five_links.orderBy("url").collect()]
    e1 = upsert_edges(None, edges_df(spark, [(ids[0], ids[1]), (ids[0], ids[2])]), five_links, updated_at=F.lit(T0))
    # re-crawl of ids[0] re-asserts only edge ->ids[1]
    e2 = upsert_edges(e1, edges_df(spark, [(ids[0], ids[1])]), five_links, updated_at=F.lit(T2))
    src = spark.createDataFrame([(ids[0],)], "id string")
    cleaned = remove_stale_edges(e2, src, F.lit(T1))
    rows = cleaned.collect()
    assert len(rows) == 1
    assert rows[0]["dst"] == ids[1]


def test_edges_range_time_filter(spark, five_links):
    ids = [r["id"] for r in five_links.orderBy("url").collect()]
    e = upsert_edges(None, edges_df(spark, [(ids[0], ids[1])]), five_links, updated_at=F.lit(T0))
    assert edges_range(e, None, None, updated_before=T1).count() == 1
    assert edges_range(e, None, None, updated_before=T0).count() == 0


def test_parquet_store_roundtrip(spark, tmp_path):
    store = ParquetGraphStore(spark, str(tmp_path))
    store.upsert_links(links_df(spark, [("http://x/1", T0), ("http://x/2", T1)]))
    store.upsert_links(links_df(spark, [("http://x/1", T2)]))
    links = store.links()
    got = {r["url"]: r["retrieved_at"] for r in links.collect()}
    assert got == {"http://x/1": T2, "http://x/2": T1}
    ids = {r["url"]: r["id"] for r in links.collect()}
    store.upsert_edges(edges_df(spark, [(ids["http://x/1"], ids["http://x/2"])]), updated_at=F.lit(T1))
    assert store.edges().count() == 1
    store.remove_stale_edges(spark.createDataFrame([(ids["http://x/1"],)], "id string"), F.lit(T2))
    assert store.edges().count() == 0


def test_delta_store_importerror_without_delta(spark, tmp_path):
    """Without delta-spark the Delta store must fail loudly at construction
    (never silently fall back); with it installed the same suite semantics
    apply via MERGE INTO."""
    import pytest as _pytest

    from usearch_spark.sources.graph_store import DeltaGraphStore

    try:
        import delta  # noqa: F401

        has_delta = True
    except ImportError:
        has_delta = False
    if has_delta:
        _pytest.skip("delta installed; exercised by the lifecycle suite on delta clusters")
    with _pytest.raises(ImportError, match="delta-spark"):
        DeltaGraphStore(spark, str(tmp_path / "delta_store"))


class TestVersionedStore:
    def _store(self, spark, tmp_path):
        from usearch_spark.sources.graph_store import VersionedGraphStore

        return VersionedGraphStore(spark, str(tmp_path / "vstore"))

    def test_upserts_create_versions_and_time_travel(self, spark, tmp_path):
        import datetime

        s = self._store(spark, tmp_path)
        t1 = datetime.datetime(2024, 1, 1)
        t2 = datetime.datetime(2024, 2, 1)
        s.upsert_links(spark.createDataFrame([("http://a/", t1)], "url string, retrieved_at timestamp"))
        s.upsert_links(
            spark.createDataFrame(
                [("http://a/", t2), ("http://b/", t1)], "url string, retrieved_at timestamp"
            )
        )
        assert s.current_version(s.links_path) == 2
        v1 = {r["url"]: r["retrieved_at"] for r in s.links(version=1).collect()}
        v2 = {r["url"]: r["retrieved_at"] for r in s.links().collect()}
        assert v1 == {"http://a/": t1}
        assert v2 == {"http://a/": t2, "http://b/": t1}

    def test_orphan_version_invisible_until_published(self, spark, tmp_path):
        """Crash simulation: a data directory written WITHOUT the pointer
        swap must not be visible to readers, and vacuum removes it."""
        import os

        s = self._store(spark, tmp_path)
        s.upsert_links(spark.createDataFrame([("http://a/",)], "url string"))
        # fake a crashed write: v=2 exists, pointer still says 1
        orphan = os.path.join(s.links_path, "v=2")
        s.links().write.mode("overwrite").parquet(orphan)
        assert s.current_version(s.links_path) == 1
        assert {r["url"] for r in s.links().collect()} == {"http://a/"}
        removed = s.vacuum(keep_last=2)
        assert 2 in removed and not os.path.exists(orphan)

    def test_vacuum_keeps_published_and_last_k(self, spark, tmp_path):
        import os

        s = self._store(spark, tmp_path)
        for i in range(4):
            s.upsert_links(spark.createDataFrame([(f"http://{i}/",)], "url string"))
        assert s.versions(s.links_path) == [1, 2, 3, 4]
        removed = s.vacuum(keep_last=2)
        assert sorted(removed) == [1, 2]
        assert s.versions(s.links_path) == [3, 4]
        assert s.current_version(s.links_path) == 4
        assert s.links(version=3).count() == 3
        # edge lifecycle works on the versioned store too
        s.upsert_edges(
            spark.createDataFrame([("http://0/", "http://1/")], "src_url string, dst_url string")
            .selectExpr(
                "sha2(src_url, 256) as src", "sha2(dst_url, 256) as dst"
            ).limit(0)  # empty edge batch: exercises the empty-write path
        )
        assert os.path.exists(s._pointer(s.edges_path))
