"""Multimodal plumbing tests: schema, batch shape, pruned stats, frame
plan.  Decode itself is a deterministic fake (media libs absent)."""

from __future__ import annotations

import hashlib

import pytest

from usearch_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    fake_decode,
    frame_sample_plan,
    media_stats,
    real_decode_stub,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", b"\x89PNG fake bytes", ("image/png", 64, 64, None)),
        ("m2", "audio", b"RIFF fake wav", ("audio/wav", None, None, 2500)),
        ("m3", "video", b"\x00\x00ftyp fake mp4", ("video/mp4", 1920, 1080, 3000)),
        ("m4", "image", None, ("image/png", 8, 8, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_shape_and_determinism(media):
    out = extract_features(media).collect()
    rows = {r["media_id"]: r for r in out}
    assert len(rows) == 4
    m1 = rows["m1"]
    assert m1["n_bytes"] == len(b"\x89PNG fake bytes")
    assert m1["sha256"] == hashlib.sha256(b"\x89PNG fake bytes").hexdigest()
    assert m1["feature"] == [pytest.approx(x) for x in fake_decode(b"\x89PNG fake bytes", "image")]
    # null payload handled as empty bytes
    assert rows["m4"]["n_bytes"] == 0


def test_real_decode_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        real_decode_stub(b"x", "image")
    # injecting the stub must not fail the job: feature comes back null
    out = {r["media_id"]: r for r in extract_features(media, decode_fn=real_decode_stub).collect()}
    assert out["m1"]["feature"] is None
    assert out["m1"]["sha256"] == hashlib.sha256(b"\x89PNG fake bytes").hexdigest()


def test_media_stats_prunes_payload(media, tmp_path):
    stats = {r["kind"]: r for r in media_stats(media).collect()}
    assert stats["image"]["n"] == 2
    assert stats["video"]["total_duration_ms"] == 3000
    # against a parquet source, the scan must not read the payload column
    path = str(tmp_path / "media")
    media.write.parquet(path)
    from_parquet = media.sparkSession.read.parquet(path)
    physical = media_stats(from_parquet)._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in physical.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("payload" not in ln for ln in read_schema)


def test_frame_sample_plan(media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_resize_media_shapes_and_determinism(spark):
    from usearch_spark.operators.multimodal import fake_resize, resize_media

    rows = [("m1", "image", b"abc"), ("m2", "image", b"xyz"), ("m3", "image", None)]
    media = spark.createDataFrame(rows, "media_id string, kind string, payload binary")
    out = {r["media_id"]: r for r in resize_media(media, width=16, height=8).collect()}
    assert all(r["width"] == 16 and r["height"] == 8 for r in out.values())
    assert len(out["m1"]["payload"]) == 16 * 8
    # deterministic: same bytes in -> same resized bytes out
    assert bytes(out["m1"]["payload"]) == fake_resize(b"abc", "image", 16, 8)
    assert bytes(out["m3"]["payload"]) == fake_resize(b"", "image", 16, 8)


def test_resize_media_real_stub_yields_null(spark):
    from usearch_spark.operators.multimodal import real_resize_stub, resize_media

    media = spark.createDataFrame([("m1", "image", b"abc")], "media_id string, kind string, payload binary")
    row = resize_media(media, 4, 4, resize_fn=real_resize_stub).first()
    assert row["payload"] is None  # decode stubbed -> null payload, plumbing intact
