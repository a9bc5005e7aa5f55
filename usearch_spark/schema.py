"""Canonical schemas for the engine's core entities.

Mirrors the reference data model (see SURVEY.md §1):
  - Link   (graph vertex):   reference linkgraph/graph/graph.go:71-75
  - Edge   (graph edge):     reference linkgraph/graph/graph.go:79-84
  - Document (indexed page): reference textindexer/index/doc.go:10-28
  - Crawl payload:           reference crawler/payload.go:25-34

IDs are strings (UUID canonical form).  Deterministic IDs — UUIDv5-style
sha1/sha2 of the URL — replace the reference's random-UUID-on-upsert so that
batch upserts become pure groupBy/dropDuplicates ops with no driver round
trips (critical at 100 TB: id assignment must not serialize through a
single store).
"""

from __future__ import annotations

from pyspark.sql import types as T

LINK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("retrieved_at", T.TimestampType(), True),
    ]
)

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("link_id", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("pagerank", T.DoubleType(), True),
        T.StructField("indexed_at", T.TimestampType(), True),
    ]
)

# Crawl-time record: one row per fetched page. Array columns replace the
# reference's pooled mutable payload (crawler/payload.go:18-54).
PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("link_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("retrieved_at", T.TimestampType(), True),
        T.StructField("raw_content", T.StringType(), True),
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("nofollow_links", T.ArrayType(T.StringType()), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("text_content", T.StringType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
