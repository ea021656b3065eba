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


def test_media_resize(ray_session, sf_dir):
    import ray.data as rd

    from language_identification_ray.stages.multimodal import (
        MediaDecoder,
        MediaResize,
        synthesize_media,
    )

    ds = synthesize_media(sf_dir)
    # autoscaling (1,2) pools: two FIXED 2-actor pools would pin all 4 CPUs
    # of the test session and starve the read tasks (observed deadlock)
    ds = ds.map_batches(MediaResize, batch_format="pyarrow", batch_size=64,
                        concurrency=(1, 2), fn_constructor_kwargs={"max_side": 32})
    out = ds.map_batches(MediaDecoder, batch_format="pyarrow", batch_size=64,
                         concurrency=(1, 2)).to_pandas()
    assert (out["width"] <= 32).all() and (out["height"] <= 32).all()
    assert out["decode_ok"].all()


def test_media_resize_noop_below_cap():
    from language_identification_ray.stages.multimodal import MediaResize, encode_fake_image

    small = encode_fake_image(16, 16, 1)
    r = MediaResize(max_side=64)
    assert r.resize_one(small) == small
    assert r.resize_one(None) is None


def test_media_resize_pillow_gated():
    import pytest as _pytest

    from language_identification_ray.stages.multimodal import MediaResize

    with _pytest.raises(NotImplementedError):
        MediaResize(decoder="pillow")
