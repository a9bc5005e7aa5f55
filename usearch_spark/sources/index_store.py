"""Document index store (SURVEY.md §2.1 S4, S8, S9).

Reference semantics (textindexer/index + stores):
  - ``index_docs`` upserts title/content/url/indexed_at but must NOT clobber
    PageRank (es.go:346-356 deliberately omits PageRank from the update;
    memory store preserves it at store/memory/memory.go:71-74).
  - ``update_scores`` sets PageRank for a link_id and creates a placeholder
    document when the id is unknown (indexer.go:19-22,
    indextest/suite.go:376-395).

Both are single-shuffle outer-join merges keyed by link_id; with the
documents table bucketed by link_id the joins are shuffle-free at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_COLS = ["link_id", "url", "title", "content", "pagerank", "indexed_at"]


def _conform(docs: DataFrame) -> DataFrame:
    out = docs
    if "pagerank" not in out.columns:
        out = out.withColumn("pagerank", F.lit(None).cast("double"))
    if "indexed_at" not in out.columns:
        out = out.withColumn("indexed_at", F.current_timestamp())
    return out.select(*DOC_COLS)


def index_docs(existing: DataFrame | None, new_docs: DataFrame) -> DataFrame:
    """S8: doc_as_upsert merge preserving existing pagerank."""
    new_docs = _conform(new_docs).dropDuplicates(["link_id"])
    if existing is None:
        return new_docs
    e = existing.select(*[F.col(c).alias(f"_e_{c}") for c in DOC_COLS])
    joined = new_docs.join(e, new_docs.link_id == e._e_link_id, "full_outer")
    return joined.select(
        F.coalesce(F.col("link_id"), F.col("_e_link_id")).alias("link_id"),
        F.coalesce(F.col("url"), F.col("_e_url")).alias("url"),
        F.coalesce(F.col("title"), F.col("_e_title")).alias("title"),
        F.coalesce(F.col("content"), F.col("_e_content")).alias("content"),
        # pagerank: the existing value always wins; a brand-new doc starts null
        F.coalesce(F.col("_e_pagerank"), F.lit(None).cast("double")).alias("pagerank"),
        F.coalesce(F.col("indexed_at"), F.col("_e_indexed_at")).alias("indexed_at"),
    )


def update_scores(existing: DataFrame | None, ranks: DataFrame) -> DataFrame:
    """S9: merge (link_id, score) into documents; unknown ids become
    placeholder docs (everything null except link_id + pagerank)."""
    r = ranks.select(F.col("link_id").alias("_r_link_id"), F.col("score").alias("_r_score"))
    if existing is None:
        return r.select(
            F.col("_r_link_id").alias("link_id"),
            F.lit(None).cast("string").alias("url"),
            F.lit(None).cast("string").alias("title"),
            F.lit(None).cast("string").alias("content"),
            F.col("_r_score").alias("pagerank"),
            F.lit(None).cast("timestamp").alias("indexed_at"),
        )
    joined = existing.join(r, existing.link_id == r._r_link_id, "full_outer")
    return joined.select(
        F.coalesce(F.col("link_id"), F.col("_r_link_id")).alias("link_id"),
        "url",
        "title",
        "content",
        F.coalesce(F.col("_r_score"), F.col("pagerank")).alias("pagerank"),
        "indexed_at",
    )


def find_doc(docs: DataFrame, link_id: str):
    """S4: point lookup; Row or None."""
    return docs.filter(F.col("link_id") == link_id).first()
