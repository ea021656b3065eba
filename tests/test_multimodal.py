"""Multimodal plumbing tests: binary columns through Arrow batches, actor
signatures, stub behavior."""

import numpy as np
import pyarrow as pa
import pytest

from language_identification_ray.stages.multimodal import (
    MediaDecoder,
    MediaFeatures,
    encode_fake_image,
    frame_sample,
    media_pipeline,
)


def test_encode_decode_roundtrip():
    payload = encode_fake_image(120, 80, seed=7)
    w, h, ok = MediaDecoder().decode_one(payload)
    assert (w, h, ok) == (120, 80, True)
    assert MediaDecoder().decode_one(b"garbage") == (0, 0, False)
    assert MediaDecoder().decode_one(None) == (0, 0, False)


def test_features_deterministic_and_normalized():
    payload = encode_fake_image(64, 64, seed=1)
    f = MediaFeatures()
    a, b = f.features_one(payload), f.features_one(payload)
    assert a == b
    assert np.linalg.norm(a) == pytest.approx(1.0)
    assert f.features_one(None) == [0.0] * 32
    assert f.features_one(encode_fake_image(64, 64, seed=2)) != a


def test_batch_binary_schema():
    t = pa.table({"payload": pa.array([encode_fake_image(32, 32, 0), None], pa.binary())})
    out = MediaFeatures()(MediaDecoder()(t))
    assert out["width"].to_pylist() == [32, 0]
    assert out["decode_ok"].to_pylist() == [True, False]
    assert out["features"].type == pa.list_(pa.float32())


def test_pillow_decoder_gated():
    with pytest.raises(NotImplementedError):
        MediaDecoder(decoder="pillow")


def test_frame_sample_stub():
    with pytest.raises(NotImplementedError):
        frame_sample(pa.table({"payload": [b""]}))


def test_media_pipeline_e2e(ray_session, sf_dir):
    df = media_pipeline(sf_dir).to_pandas()
    assert len(df) == 500
    assert df["decode_ok"].all()
    assert (df["width"] >= 64).all()
    assert df["features"].map(len).eq(32).all()
