"""Multimodal plumbing: schema, batch shape, deterministic fake kernel, and
the stubbed real-kernel contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexgap_spark.operators import multimodal as MM
from nexgap_spark.session import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    return MM.media_from_documents(load_table(spark, SF_SMOKE, "documents"))


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert media.count() > 0


def test_extract_features_fake_kernel(media):
    feats = MM.extract_features(media, kernel=MM.fake_decode_kernel)
    rows = feats.collect()
    assert all(len(r.features) == MM.FEATURE_DIM for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r.features)
    # digest ties features to payload deterministically
    again = {r.media_id: r.features for r in MM.extract_features(media, kernel=MM.fake_decode_kernel).collect()}
    assert all(again[r.media_id] == r.features for r in rows)


def test_real_kernel_is_stubbed(media):
    with pytest.raises(Exception, match="NotImplementedError|decode requires"):
        MM.extract_features(media.limit(1)).collect()


def test_frame_sampling_shape(media):
    frames = MM.sample_frames(media)
    rows = frames.collect()
    assert rows, "video rows should produce frames"
    per_media = (
        frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    )
    assert all(1 <= r.n <= 4 for r in per_media)
    assert all(isinstance(r.frame_payload, (bytes, bytearray)) for r in rows)
    # only video rows produce frames
    kinds = {r.media_id for r in media.filter(F.col("kind") != "video").collect()}
    assert kinds.isdisjoint({r.media_id for r in rows})


def test_resize_media_fake_kernel(media):
    out = MM.resize_media(
        media, width=8, height=4, kernel=MM.fake_resize_kernel
    ).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(out) == n_images
    for r in out:
        assert r.width == 8 and r.height == 4
        assert len(r.payload) == 32


def test_real_resize_kernel_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.real_resize_kernel(b"xx", 4, 4)
