"""Multimodal plumbing tests: schema, determinism, actor-pool feature
extraction, stubbed production decoder."""

import numpy as np
import pytest

from sophia_rs_ray.stages.multimodal import (
    FakeImageDecoder, ImageFeatureExtractor, PilImageDecoder,
    media_features, synthetic_media_dataset,
)


def test_fake_decoder_deterministic():
    d = FakeImageDecoder()
    a = d.decode(b"payload-123", 16, 8)
    b = d.decode(b"payload-123", 16, 8)
    assert a.shape == (8, 16, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)
    assert not np.array_equal(a, d.decode(b"payload-124", 16, 8))


def test_pil_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        PilImageDecoder()


def test_media_features_pipeline(ray_session):
    ds = synthetic_media_dataset(40, override_num_blocks=4)
    out = media_features(ds, concurrency=2, batch_size=8)
    rows = out.take_all()
    assert len(rows) == 40
    assert {len(r["feature"]) for r in rows} == {4}
    # thumbs have the advertised fixed shape
    for r in rows[:5]:
        h, w, c = r["thumb_shape"]
        assert len(r["thumb"]) == h * w * c
    # deterministic across runs
    rows2 = media_features(synthetic_media_dataset(40, override_num_blocks=2),
                           concurrency=2, batch_size=16).take_all()
    m1 = {r["media_id"]: list(r["feature"]) for r in rows}
    m2 = {r["media_id"]: list(r["feature"]) for r in rows2}
    assert m1 == m2


def test_resize_shapes():
    ex = ImageFeatureExtractor(target=(4, 6))
    arr = FakeImageDecoder().decode(b"x", 32, 24)
    small = ex._resize(arr)
    assert small.shape == (4, 6, 3)
