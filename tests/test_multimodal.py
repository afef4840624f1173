"""Multimodal plumbing tests: schema, batch shape, stubbed decode, plans."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from shapely_spark.multimodal.media import (
    decode_image_stub,
    frame_sample_plan,
    image_features,
    resize_plan,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, 90).cache()


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert media.count() == 90
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_stub_decoder_deterministic(media):
    row = media.where(F.col("kind") == "image").first()
    a = decode_image_stub(bytes(row.payload))
    b = decode_image_stub(bytes(row.payload))
    assert a.shape == (row.meta.height, row.meta.width, 3)
    assert np.array_equal(a, b)


def test_stub_decoder_rejects_real_bytes():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG\r\n\x1a\n....")


def test_image_features(media):
    feats = image_features(media, out_dim=16).collect()
    assert len(feats) == media.where(F.col("kind") == "image").count()
    for r in feats:
        assert len(r.feature) == 16
        assert abs(sum(r.feature) - 1.0) < 1e-9
        assert r.width > 0 and r.height > 0


def test_resize_plan_aspect(media):
    out = resize_plan(media, max_side=224).collect()
    for r in out:
        assert max(r.target_width, r.target_height) <= 224
        # aspect preserved within rounding
        orig = r.meta.width / r.meta.height
        new = r.target_width / r.target_height
        assert abs(orig - new) / orig < 0.05


def test_frame_sample_plan(media):
    out = frame_sample_plan(media, every_ms=1000)
    n_videos = media.where(F.col("kind") == "video").count()
    assert out.select("url").distinct().count() == n_videos
    g = out.groupBy("url").agg(F.count("*").alias("n"), F.max("frame_ms").alias("mx")).first()
    assert g.n >= 1 and g.mx % 1000 == 0


def test_audio_features_deterministic(spark):
    from shapely_spark.multimodal.media import audio_features, synth_media

    m = synth_media(spark, 60)
    f1 = {r.url: tuple(round(x, 9) for x in r.feature)
          for r in audio_features(m).collect()}
    f2 = {r.url: tuple(round(x, 9) for x in r.feature)
          for r in audio_features(m).collect()}
    assert f1 == f2 and len(f1) == 20  # every third row is audio
    for v in f1.values():
        assert abs(sum(v) - 1.0) < 1e-6  # normalized band energies (rounded at 9dp)
