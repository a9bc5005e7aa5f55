"""Link-graph store: the reference's graph interface (SURVEY.md §2.1 S1-S7)
re-expressed as batch DataFrame ops.

Reference semantics (linkgraph/graph/graph.go, store/memory/memory.go,
store/cdb/cdb.go):
  - Link upsert dedupes by URL and keeps GREATEST(retrieved_at)
    (cdb.go:16-22 ``ON CONFLICT (url) DO UPDATE``); the stored id is stable
    across re-upserts of the same URL.
  - Edge identity is (src, dst); upsert refreshes updated_at
    (cdb.go:30-36); both endpoints must exist in links (FK, ErrUnknownEdgeLinks).
  - Range scans filter ``from <= id < to`` plus a time predicate
    (graph.go:22-37).
  - RemoveStaleEdges deletes edges from a given src set older than a
    threshold (graph.go:30-32) — post-recrawl GC.

Design for scale:
  - IDs are deterministic (UUID-shaped sha2 of the URL), so id assignment is
    a pure column expression — no driver round-trips, no id-allocation
    bottleneck, and upsert becomes groupBy/dropDuplicates (one shuffle on
    the natural key).
  - The persistent form is read-join-overwrite on parquet (MERGE emulation);
    on a Delta/Iceberg-enabled cluster the same functions feed MERGE INTO.
  - FK validation is a left-semi join; at scale the links side is the big
    one, so we join edges→links on the hashed key both sides shuffle on.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def url_id(url: Column | str) -> Column:
    """Deterministic UUID-shaped id from a URL (UUIDv5-style: stable,
    collision-resistant, computed JVM-side with sha2)."""
    c = F.col(url) if isinstance(url, str) else url
    h = F.sha2(c, 256)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def edge_id(src: Column, dst: Column) -> Column:
    return url_id(F.concat_ws("\x1f", src, dst))


# ---------------------------------------------------------------------------
# batch upsert transforms (pure DataFrame -> DataFrame)


def upsert_links(existing: DataFrame | None, new_links: DataFrame) -> DataFrame:
    """S5: union + dedupe by url keeping max(retrieved_at).

    ``new_links`` needs a ``url`` column; ``retrieved_at`` optional (null =
    never retrieved, loses to any non-null timestamp).
    """
    cols = ["id", "url", "retrieved_at"]
    if "retrieved_at" not in new_links.columns:
        new_links = new_links.withColumn("retrieved_at", F.lit(None).cast("timestamp"))
    prepared = new_links.select(url_id("url").alias("id"), "url", "retrieved_at")
    unioned = prepared if existing is None else existing.select(*cols).unionByName(prepared)
    return (
        unioned.groupBy("url")
        .agg(F.max("retrieved_at").alias("retrieved_at"))
        .select(url_id("url").alias("id"), "url", "retrieved_at")
    )


def upsert_edges(
    existing: DataFrame | None,
    new_edges: DataFrame,
    links: DataFrame,
    updated_at: Column | None = None,
) -> DataFrame:
    """S6: dedupe by (src, dst); refresh updated_at for re-upserted edges;
    FK-validate both endpoints against links (rows with unknown endpoints
    are dropped — the batch analog of ErrUnknownEdgeLinks)."""
    ts = updated_at if updated_at is not None else F.current_timestamp()
    prepared = new_edges.select("src", "dst").dropDuplicates(["src", "dst"]).withColumn("updated_at", ts)
    link_ids = links.select(F.col("id").alias("_lid"))
    validated = (
        prepared.join(link_ids, prepared.src == link_ids._lid, "left_semi")
        .join(link_ids, prepared.dst == link_ids._lid, "left_semi")
    )
    if existing is None:
        merged = validated
    else:
        # new rows win (refreshed updated_at); keep old rows not re-upserted
        merged = validated.unionByName(
            existing.select("src", "dst", "updated_at").join(
                validated.select("src", "dst"), ["src", "dst"], "left_anti"
            )
        )
    return merged.select(edge_id(F.col("src"), F.col("dst")).alias("id"), "src", "dst", "updated_at")


def remove_stale_edges(edges: DataFrame, src_ids: DataFrame, updated_before) -> DataFrame:
    """S7: drop edges whose src is in ``src_ids`` (col ``id``) AND
    updated_at < threshold.  Anti-join form — at scale this is one shuffle
    on src, and with both tables bucketed by src it's shuffle-free."""
    stale_src = src_ids.select(F.col("id").alias("_sid"))
    is_old = F.col("updated_at") < updated_before
    old = edges.filter(is_old).join(stale_src, F.col("src") == F.col("_sid"), "left_semi")
    return edges.join(old.select("id"), "id", "left_anti")


# ---------------------------------------------------------------------------
# range scans / lookups (S1-S3)


def links_range(links: DataFrame, from_id: str | None, to_id: str | None, retrieved_before=None) -> DataFrame:
    out = links
    if from_id is not None:
        out = out.filter(F.col("id") >= from_id)
    if to_id is not None:
        out = out.filter(F.col("id") < to_id)
    if retrieved_before is not None:
        out = out.filter(F.col("retrieved_at").isNull() | (F.col("retrieved_at") < retrieved_before))
    return out


def edges_range(edges: DataFrame, from_id: str | None, to_id: str | None, updated_before=None) -> DataFrame:
    out = edges
    if from_id is not None:
        out = out.filter(F.col("src") >= from_id)
    if to_id is not None:
        out = out.filter(F.col("src") < to_id)
    if updated_before is not None:
        out = out.filter(F.col("updated_at") < updated_before)
    return out


def find_link(links: DataFrame, link_id: str):
    """S3: point lookup; returns Row or None (reference returns NotFound)."""
    return links.filter(F.col("id") == link_id).first()


# ---------------------------------------------------------------------------
# persistent store (parquet MERGE emulation)


class ParquetGraphStore:
    """Read-join-overwrite persistence for links/edges.

    Writes partition by a hash-bucket of the key column so re-merges and
    range scans prune partitions.  On a lakehouse table format this class
    collapses to MERGE INTO statements.
    """

    N_BUCKETS = 16  # at 100 TB this would be ~4096; driven by target file size

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.links_path = os.path.join(root, "links")
        self.edges_path = os.path.join(root, "edges")

    def _read(self, path: str) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        try:
            df = self.spark.read.parquet(path)
        except AnalysisException:
            # missing path = store not created yet; real IO/corruption
            # errors must propagate rather than silently reset the store
            return None
        return df.drop("_bucket") if "_bucket" in df.columns else df

    def _write(self, df: DataFrame, path: str, bucket_col: str) -> None:
        # localCheckpoint materializes the merge result BEFORE we overwrite
        # the files it was derived from (read-join-overwrite safety). On a
        # real deployment this is a versioned-directory swap or MERGE INTO.
        materialized = df.withColumn(
            "_bucket", F.abs(F.hash(F.col(bucket_col))) % self.N_BUCKETS
        ).localCheckpoint(eager=True)
        if materialized.isEmpty():
            # a partitioned empty write leaves no schema-bearing file behind
            materialized.drop("_bucket").write.mode("overwrite").parquet(path)
        else:
            materialized.write.mode("overwrite").partitionBy("_bucket").parquet(path)

    def links(self) -> DataFrame | None:
        return self._read(self.links_path)

    def edges(self) -> DataFrame | None:
        return self._read(self.edges_path)

    def replace_links(self, links: DataFrame) -> None:
        """Replace the full links table with an externally-merged result
        (the crawl pass computes its own merge)."""
        self._write(links, self.links_path, "id")

    def replace_edges(self, edges: DataFrame) -> None:
        self._write(edges, self.edges_path, "src")

    def upsert_links(self, new_links: DataFrame) -> None:
        merged = upsert_links(self.links(), new_links)
        self._write(merged, self.links_path, "id")

    def upsert_edges(self, new_edges: DataFrame, updated_at=None) -> None:
        links = self.links()
        if links is None:
            raise ValueError("upsert_edges before any links exist")
        merged = upsert_edges(self.edges(), new_edges, links, updated_at)
        self._write(merged, self.edges_path, "src")

    def remove_stale_edges(self, src_ids: DataFrame, updated_before) -> None:
        edges = self.edges()
        if edges is not None:
            self._write(remove_stale_edges(edges, src_ids, updated_before), self.edges_path, "src")


class VersionedGraphStore(ParquetGraphStore):
    """Crash-safe, time-travelable persistence on plain parquet: every
    write lands in a FRESH version directory (``<table>/v=N/``) and is
    published by atomically swapping a tiny ``_VERSION`` pointer file —
    the poor-lakehouse form of a Delta/Iceberg snapshot commit.

    Why this matters at scale: ParquetGraphStore's read-join-overwrite has
    a failure window (a crash mid-overwrite loses the table).  Here a
    failed write leaves only an unreferenced ``v=N+1`` directory — readers
    keep resolving the old pointer, and the orphan is collected by the
    next :meth:`vacuum`.  Old versions stay readable (``links(version=3)``)
    until vacuumed, which is also what makes concurrent readers safe: they
    hold a version, not files being rewritten underneath them.

    The pointer swap is ``os.rename`` (atomic on POSIX filesystems); on an
    object store the equivalent is a conditional put of the pointer key.
    """

    def _table_dir(self, path: str) -> str:
        return path

    def _pointer(self, path: str) -> str:
        return os.path.join(path, "_VERSION")

    def current_version(self, path: str) -> int | None:
        try:
            with open(self._pointer(path)) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def versions(self, path: str) -> list[int]:
        if not os.path.isdir(path):
            return []
        out = []
        for name in os.listdir(path):
            if name.startswith("v="):
                try:
                    out.append(int(name[2:]))
                except ValueError:
                    continue
        return sorted(out)

    def _read(self, path: str, version: int | None = None) -> DataFrame | None:
        v = self.current_version(path) if version is None else version
        if v is None:
            return None
        df = self.spark.read.parquet(os.path.join(path, f"v={v}"))
        return df.drop("_bucket") if "_bucket" in df.columns else df

    def _write(self, df: DataFrame, path: str, bucket_col: str) -> None:
        cur = self.current_version(path)
        nxt = 1 if cur is None else cur + 1
        vdir = os.path.join(path, f"v={nxt}")
        materialized = df.withColumn(
            "_bucket", F.abs(F.hash(F.col(bucket_col))) % self.N_BUCKETS
        ).localCheckpoint(eager=True)
        if materialized.isEmpty():
            materialized.drop("_bucket").write.mode("overwrite").parquet(vdir)
        else:
            materialized.write.mode("overwrite").partitionBy("_bucket").parquet(vdir)
        # publish: write-temp + rename is the atomic commit point
        tmp = self._pointer(path) + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(nxt))
        os.rename(tmp, self._pointer(path))

    def links(self, version: int | None = None) -> DataFrame | None:
        return self._read(self.links_path, version)

    def edges(self, version: int | None = None) -> DataFrame | None:
        return self._read(self.edges_path, version)

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop version directories older than the newest ``keep_last``
        (never the published one); returns the versions removed.  Orphan
        directories from failed writes (newer than the pointer) are also
        removed — they were never published."""
        import shutil

        removed = []
        for path in (self.links_path, self.edges_path):
            cur = self.current_version(path)
            if cur is None:
                continue
            keep = set(v for v in self.versions(path) if v <= cur)
            keep = set(sorted(keep)[-keep_last:])
            for v in self.versions(path):
                if v not in keep and v != cur:
                    shutil.rmtree(os.path.join(path, f"v={v}"), ignore_errors=True)
                    removed.append(v)
        return removed


class DeltaGraphStore(ParquetGraphStore):
    """EXPERIMENTAL: the same store interface on Delta Lake — upserts become
    real MERGE INTO statements (transactional, no read-join-overwrite window)
    and stale-edge GC a conditional MERGE DELETE — the lakehouse form the
    reference's ``ON CONFLICT DO UPDATE`` maps to (cdb.go:16-36).

    Scope: delta-spark is NOT installable in this image, so the MERGE code
    path has never executed here — only its construction-time ImportError is
    covered by tests (tests/test_graph_store.py).  The class is kept because
    the interface mapping is the documented production path; on a
    Delta-enabled cluster (spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension)
    it is intended as a drop-in replacement for ParquetGraphStore, but treat
    it as unverified until its lifecycle test runs against real delta-spark.
    """

    def __init__(self, spark: SparkSession, root: str):
        try:
            from delta.tables import DeltaTable  # noqa: F401
        except ImportError as exc:  # pragma: no cover - absent in this image
            raise ImportError(
                "DeltaGraphStore requires delta-spark (pip install delta-spark and a "
                "Delta-enabled SparkSession); use ParquetGraphStore otherwise"
            ) from exc
        super().__init__(spark, root)

    def _table(self, path: str):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(self.spark, path) if DeltaTable.isDeltaTable(self.spark, path) else None

    def _read(self, path: str) -> DataFrame | None:
        t = self._table(path)
        return t.toDF() if t is not None else None

    def _write(self, df: DataFrame, path: str, bucket_col: str) -> None:
        # full-replace goes through the Delta log (a raw parquet overwrite —
        # the inherited behavior — would orphan the transaction log and
        # corrupt the table); Delta handles file layout, so no hash buckets
        df.localCheckpoint(eager=True).write.format("delta").mode("overwrite").save(path)

    def upsert_links(self, new_links: DataFrame) -> None:
        # batch-local dedupe first (a MERGE source must be unique on the
        # merge key), then ON url: keep GREATEST(retrieved_at), stable id
        batch = upsert_links(None, new_links)
        t = self._table(self.links_path)
        if t is None:
            batch.write.format("delta").save(self.links_path)
            return
        (
            t.alias("t")
            .merge(batch.alias("s"), "t.url = s.url")
            .whenMatchedUpdate(set={"retrieved_at": "greatest(t.retrieved_at, s.retrieved_at)"})
            .whenNotMatchedInsertAll()
            .execute()
        )

    def upsert_edges(self, new_edges: DataFrame, updated_at=None) -> None:
        links = self.links()
        if links is None:
            raise ValueError("upsert_edges before any links exist")
        batch = upsert_edges(None, new_edges, links, updated_at)
        t = self._table(self.edges_path)
        if t is None:
            batch.write.format("delta").save(self.edges_path)
            return
        (
            t.alias("t")
            .merge(batch.alias("s"), "t.src = s.src AND t.dst = s.dst")
            .whenMatchedUpdate(set={"updated_at": "greatest(t.updated_at, s.updated_at)"})
            .whenNotMatchedInsertAll()
            .execute()
        )

    def remove_stale_edges(self, src_ids: DataFrame, updated_before) -> None:
        t = self._table(self.edges_path)
        if t is None:
            return
        (
            t.alias("t")
            # a duplicated source id would abort the MERGE (multiple source
            # rows matching one target); the cutoff goes in as a typed
            # Column, not an interpolated string repr
            .merge(src_ids.dropDuplicates(["id"]).alias("s"), "t.src = s.id")
            .whenMatchedDelete(condition=F.col("t.updated_at") < F.lit(updated_before))
            .execute()
        )
