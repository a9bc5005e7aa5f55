"""Streaming IVF maintenance (streaming/ann.py): incremental
assign-and-append, crash-window replay idempotency, lineage guard, and
the retrain-equals-batch-build compaction contract."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from usearch_spark.streaming.ann import (
    ivf_stream_maintain,
    ivf_stream_topk,
    read_ivf_stream,
)
from tests.test_streaming import _drop_last_commit

pytestmark = pytest.mark.slow  # streaming replays: multi-micro-batch runs dominate the suite clock



def _vec(i: int) -> list[float]:
    return [float((i * 7 + j * 3) % 11) / 11.0 + (1.0 if j % 4 == i % 4 else 0.0) for j in range(8)]


def _write_batches(spark, tmp_path, n=40, parts=((0,), (1,))):
    """Source dir with one file per parity group, mtimes pinned so epoch 0
    is the even half (the training batch)."""
    rows = [(i, _vec(i)) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for b, mods in enumerate(parts):
        tmp = str(tmp_path / f"t{b}")
        df.filter(F.pmod(F.col("vec_id"), F.lit(len(parts))).isin(list(mods))).coalesce(
            1
        ).write.parquet(tmp)
        dst = f"{src}/batch{b}.parquet"
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], dst)
        os.utime(dst, (1000000 + b * 100,) * 2)
    return df, src


def _stream(spark, src):
    return (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def _drain(stream, target, ckpt, **kw):
    q = ivf_stream_maintain(stream, target, ckpt, n_clusters=4, **kw)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _postings(spark, target):
    _, df = read_ivf_stream(spark, target)
    return sorted((r["vec_id"], r["cluster"]) for r in df.collect())


def test_incremental_assign_matches_batch_assign(spark, tmp_path):
    """Epoch 0 trains on the even half; epoch 1's odd vectors must land in
    exactly the clusters a direct assignment against those centroids
    produces — the incremental path is the same math as the batch path."""
    from usearch_spark.streaming.ann import _assign

    df, src = _write_batches(spark, tmp_path)
    target, ckpt = str(tmp_path / "idx"), str(tmp_path / "ckpt")
    _drain(_stream(spark, src), target, ckpt)

    centers, postings = read_ivf_stream(spark, target)
    assert postings.count() == df.count()  # every vector indexed once
    cent = spark.createDataFrame(
        list(enumerate(centers)), "cid int, carr array<double>"
    )
    want = sorted(
        (r["vec_id"], r["cluster"])
        for r in _assign(df, cent, "vec_id", "embedding").collect()
    )
    assert _postings(spark, target) == want
    # two fragments on disk: the trained epoch + the appended epoch
    meta_frags = sorted(os.listdir(os.path.join(target, "epochs")))
    assert meta_frags == ["v0", "v1"]


def test_replay_is_idempotent_and_restart_adds_nothing(spark, tmp_path):
    df, src = _write_batches(spark, tmp_path)
    target, ckpt = str(tmp_path / "idx"), str(tmp_path / "ckpt")
    _drain(_stream(spark, src), target, ckpt)
    first = _postings(spark, target)
    centers1, _ = read_ivf_stream(spark, target)

    # plain restart: checkpoint skips both committed files
    _drain(_stream(spark, src), target, ckpt)
    assert _postings(spark, target) == first

    # crash-window replay: newest commit dropped, epoch 1 re-delivered
    # under the same lineage/epoch id -> the pointer guard no-ops it
    _drop_last_commit(ckpt)
    _drain(_stream(spark, src), target, ckpt)
    centers2, _ = read_ivf_stream(spark, target)
    assert _postings(spark, target) == first and centers2 == centers1


def test_lineage_mismatch_raises(spark, tmp_path):
    _, src = _write_batches(spark, tmp_path)
    target = str(tmp_path / "idx")
    _drain(_stream(spark, src), target, str(tmp_path / "ckpt_a"))
    first = _postings(spark, target)
    q = ivf_stream_maintain(
        _stream(spark, src), target, str(tmp_path / "ckpt_b"), n_clusters=4
    )
    try:
        with pytest.raises(Exception, match="lineage mismatch"):
            q.processAllAvailable()
    finally:
        q.stop()
    assert _postings(spark, target) == first  # nothing clobbered


def test_retrain_compacts_to_batch_build(spark, tmp_path):
    """With retrain_every=1 the second epoch retrains on ALL vectors: the
    compacted state must equal the one-shot build_ivf_index over the same
    set — same centroids, same assignment (merge-of-epochs ==
    index-of-whole), and the probe equals the batch index's probe."""
    import json

    from usearch_spark.operators.similarity import build_ivf_index, ivf_index_topk

    df, src = _write_batches(spark, tmp_path)
    target, ckpt = str(tmp_path / "idx"), str(tmp_path / "ckpt")
    _drain(_stream(spark, src), target, ckpt, retrain_every=1)

    frags = sorted(os.listdir(os.path.join(target, "epochs")))
    assert any(f.startswith("retrain") for f in frags)  # compaction ran

    bpath = str(tmp_path / "batch_idx")
    build_ivf_index(df, bpath, n_clusters=4)
    with open(os.path.join(bpath, "_centroids.json")) as fh:
        want_centers = json.load(fh)
    centers, _ = read_ivf_stream(spark, target)
    assert centers == want_centers
    want_post = sorted(
        (r["vec_id"], r["cluster"]) for r in spark.read.parquet(bpath).collect()
    )
    assert _postings(spark, target) == want_post

    qv = _vec(0)
    got = [
        tuple(r)
        for r in ivf_stream_topk(spark, target, qv, k=5, n_probe=4, exclude_ids=[0]).collect()
    ]
    want = [
        tuple(r)
        for r in ivf_index_topk(spark, bpath, qv, k=5, n_probe=4, exclude_ids=[0]).collect()
    ]
    assert got == want and len(got) == 5


def test_adopt_never_overwrites_adopted_fragments(spark, tmp_path):
    """The advisor's data-corruption scenario: a FRESH checkpoint adopting
    a committed index restarts its epoch ids at 0 — with epoch-keyed
    fragments its first epoch would overwrite epochs/e0, a directory the
    adopted manifest still lists.  Version-keyed fragments make the
    collision impossible: the adopted lineage's epochs land in NEW
    version dirs and the original fragment bytes stay untouched."""
    df, src = _write_batches(spark, tmp_path)
    target = str(tmp_path / "idx")
    _drain(_stream(spark, src), target, str(tmp_path / "ckpt_a"))
    v0 = sorted(
        (r["vec_id"], r["cluster"])
        for r in spark.read.parquet(os.path.join(target, "epochs", "v0")).collect()
    )
    _drain(_stream(spark, src), target, str(tmp_path / "ckpt_b"), on_mismatch="adopt")
    from usearch_spark.streaming.ann import _read_current, _read_meta

    version, _, _ = _read_current(os.path.join(target, "_CURRENT"))
    meta = _read_meta(target, version)
    # 4 fragments: the two original epochs + the adopted lineage's two
    assert meta["fragments"] == ["v0", "v1", "v2", "v3"]
    got = sorted(
        (r["vec_id"], r["cluster"])
        for r in spark.read.parquet(os.path.join(target, "epochs", "v0")).collect()
    )
    assert got == v0  # the adopted fragment was not clobbered
    # every vector now indexed twice (append semantics under adopt)
    assert len(_postings(spark, target)) == 2 * df.count()
