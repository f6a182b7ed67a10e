"""Multimodal plumbing: schemas, determinism, batch shapes (decode is a
documented stub — the Spark-side contract is what's under test)."""

from __future__ import annotations

import pytest

from ragflow_spark.ops import multimodal

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synthesize_media(spark, SF_DIR).cache()


def test_media_schema_and_determinism(spark, media):
    rows = media.collect()
    assert len(rows) > 0
    kinds = {r["kind"] for r in rows}
    assert kinds <= {"image", "audio", "video"}
    again = {
        r["media_id"]: bytes(r["payload"])
        for r in multimodal.synthesize_media(spark, SF_DIR).collect()
    }
    for r in rows:
        assert bytes(r["payload"]) == again[r["media_id"]]
    for r in rows:
        if r["kind"] == "audio":
            assert r["sample_rate"] == 16000 and r["width"] == 0
        if r["kind"] == "image":
            assert r["n_frames"] == 1 and r["width"] >= 32


def test_image_features_and_resize(spark, media):
    feats = multimodal.image_features(media).collect()
    n_images = media.where("kind = 'image'").count()
    assert len(feats) == n_images
    for f in feats:
        assert 0 <= f["mean_r6"] <= 255
        assert f["var_r6"] >= 0
        assert f["n_px"] > 0
    small = multimodal.resize_images(media, target=16).collect()
    assert len(small) == n_images
    for r in small:
        assert r["width"] == 16 and r["height"] == 16
        assert len(bytes(r["payload"])) == 16 * 16


def test_frame_sampling(spark, media):
    frames = multimodal.sample_frames(media, every=8).toPandas()
    vids = media.where("kind = 'video'").toPandas()
    assert len(frames) == sum(
        len(range(0, n, 8)) for n in vids["n_frames"]
    )
    # frame indices stride by 8 and stay < n_frames
    merged = frames.merge(vids[["media_id", "n_frames"]], on="media_id")
    assert (merged["frame_idx"] % 8 == 0).all()
    assert (merged["frame_idx"] < merged["n_frames"]).all()
