"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, batch iteration, partition sizing — is
real and tested; the actual media decoding is stubbed (the image/audio
libraries are not in this container).  ``decode_fn`` is injectable: pass a
Pillow/torchaudio-backed decoder in a real deployment, or keep the
deterministic fake for plumbing tests.

Design notes for 100 TB of media:
  - binary payloads ride in their own column so Parquet keeps them out of
    unrelated scans (column pruning: metadata-only queries never touch
    bytes);
  - decode runs in ``mapInPandas`` (Arrow batches of binary), so a batch of
    rows crosses the JVM<->Python boundary once, not per-row;
  - ``target_rows_per_batch`` bounds decoded-batch memory via
    spark.sql.execution.arrow.maxRecordsPerBatch rather than per-UDF state.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from usearch_spark.session import ship_package

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, sha256 string, feature array<float>"
)


def real_decode_stub(payload: bytes, kind: str) -> list[float]:
    """Placeholder for a real decoder (Pillow / ffmpeg / torchaudio).

    Deliberately NotImplemented: media codecs are not in this container.
    """
    raise NotImplementedError("media decoding requires image/audio libraries not present in this container")


def fake_decode(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """Deterministic fake 'feature extractor': sha256-derived pseudo
    features.  Keeps the full pipeline testable end-to-end."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], list[float]] = fake_decode,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""
    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                sizes.append(len(raw))
                shas.append(hashlib.sha256(raw).hexdigest())
                try:
                    feats.append([float(x) for x in decode_fn(raw, kind)])
                except NotImplementedError:
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "sha256": shas,
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id string, kind string, payload binary, width int, height int"
)


def fake_resize(payload: bytes, kind: str, width: int, height: int) -> bytes:
    """Deterministic fake resizer: derives exactly width*height bytes from
    the payload via iterated sha256 — real byte volume, real batch shapes,
    no codec."""
    out = bytearray()
    block = hashlib.sha256(payload or b"").digest()
    while len(out) < width * height:
        out.extend(block)
        block = hashlib.sha256(block).digest()
    return bytes(out[: width * height])


def real_resize_stub(payload: bytes, kind: str, width: int, height: int) -> bytes:
    """Placeholder for a Pillow/ffmpeg-scale resize (libs absent here)."""
    raise NotImplementedError("image/video resizing requires media libraries not present in this container")


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, str, int, int], bytes] = fake_resize,
) -> DataFrame:
    """mapInPandas resize over binary payloads: Arrow-batched, payload
    column pruned in, resized payload + new dimensions out.  Inject a real
    decoder-backed ``resize_fn`` in deployments."""
    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    resized.append(resize_fn(raw, kind, width, height))
                except NotImplementedError:
                    resized.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, RESIZED_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must never read the payload column
    (column pruning keeps the binary bytes out of the scan)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.coalesce(F.col("meta.duration_ms"), F.lit(0))).alias("total_duration_ms"),
        F.max(F.coalesce(F.col("meta.width"), F.lit(0))).alias("max_width"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) — the
    explode is pure metadata; actual frame decode happens in
    ``extract_features`` against byte ranges in a real deployment."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
