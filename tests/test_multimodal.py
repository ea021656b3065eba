"""Multimodal plumbing tests: binary columns through Arrow batches, actor
signatures, stub behavior."""

import numpy as np
import pyarrow as pa
import pytest

from language_identification_ray.stages.multimodal import (
    MediaDecoder,
    MediaFeatures,
    encode_fake_image,
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


def test_frame_sample_replaced_by_sampler():
    # the old frame_sample stub is gone; FrameSampler is the real stage
    from language_identification_ray.stages import multimodal

    assert not hasattr(multimodal, "frame_sample")
    assert hasattr(multimodal, "FrameSampler")


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


def test_frame_sampler_counts_and_determinism():
    import math

    import pyarrow as pa

    from language_identification_ray.stages.multimodal import (
        FRAME_BYTES,
        FrameSampler,
        MediaDecoder,
        encode_fake_video,
    )

    n_frames, w, h = 23, 48, 36
    vid = encode_fake_video(n_frames, w, h, seed=7)
    batch = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([vid], pa.binary()),
        }
    )
    fs = FrameSampler(every_n=10)
    out = fs(batch)
    assert out.num_rows == math.ceil(n_frames / 10)
    assert out["frame_idx"].to_pylist() == [0, 10, 20]
    # sampled frames are standalone decodable images with the video's dims
    dec = MediaDecoder()
    for p in out["payload"].to_pylist():
        assert dec.decode_one(p) == (w, h, True)
        assert len(p) == 8 + 8 + FRAME_BYTES
    # determinism: same video -> byte-identical frames
    assert fs(batch)["payload"].to_pylist() == out["payload"].to_pylist()
    # non-video payloads contribute zero rows, never crash
    junk = pa.table(
        {
            "media_id": pa.array([2, 3], pa.int64()),
            "payload": pa.array([b"not a video", None], pa.binary()),
        }
    )
    assert fs(junk).num_rows == 0


def test_video_frame_pipeline(ray_session, sf_dir):
    import math

    from language_identification_ray.stages.multimodal import video_frame_pipeline

    df = video_frame_pipeline(sf_dir).to_pandas()
    assert len(df) > 0
    assert df["decode_ok"].all()
    assert set(df.columns) == {"media_id", "frame_idx", "width", "height", "decode_ok", "features"}
    # every 5th doc has a video of 8 + id % 24 frames, sampled every 10th
    expect = sum(
        math.ceil((8 + d % 24) / 10) for d in df["media_id"].unique()
    )
    assert len(df) == expect
    assert all(len(f) == 32 for f in df["features"])


def test_frame_sampler_ffmpeg_gated():
    import pytest as _pytest

    from language_identification_ray.stages.multimodal import FrameSampler

    with _pytest.raises(NotImplementedError):
        FrameSampler(decoder="ffmpeg")


def test_audio_features_sine_analytic():
    import numpy as np

    from language_identification_ray.stages.multimodal import AudioFeatures, encode_pcm

    sr, f, amp_frac, dur = 16000, 440.0, 0.5, 2.0
    t = np.arange(int(sr * dur)) / sr
    samples = (np.sin(2 * np.pi * f * t) * amp_frac * 32767).astype("<i2")
    payload = encode_pcm(sr, samples)
    d, rms, zcr, peak, ok = AudioFeatures().features_one(payload)
    assert ok and abs(d - dur) < 1e-9
    # pure sine: rms = A/sqrt(2); zero crossings = 2f per second
    assert abs(rms - amp_frac / np.sqrt(2)) < 0.01
    assert abs(zcr - f) / f < 0.01  # zcr_hz = crossings * sr / 2 / n = f for a sine
    assert 0.49 * 32767 < peak <= int(amp_frac * 32767) + 1


def test_audio_features_junk_and_empty():
    from language_identification_ray.stages.multimodal import AudioFeatures

    af = AudioFeatures()
    assert af.features_one(None)[-1] is False or af.features_one(None)[-1] == False  # noqa: E712
    assert af.features_one(b"garbage")[4] == False  # noqa: E712
    assert af.features_one(b"FAKEAUD1")[4] == False  # noqa: E712


def test_audio_pipeline(ray_session, sf_dir):
    from language_identification_ray.stages.multimodal import audio_pipeline

    df = audio_pipeline(sf_dir).to_pandas()
    assert len(df) > 0
    assert df["audio_ok"].all()
    assert (df["duration_sec"] > 0.2).all() and (df["duration_sec"] <= 1.01).all()
    # gaussian noise at sigma=8192/32768: rms ~ 0.25
    assert ((df["rms"] - 0.25).abs() < 0.02).all()


def test_media_resize_rejects_unknown_decoder():
    from language_identification_ray.stages.multimodal import MediaResize

    with pytest.raises(ValueError, match="unknown decoder"):
        MediaResize(decoder="not-a-decoder")


def test_audio_features_single_sample_no_nan():
    import warnings

    from language_identification_ray.stages.multimodal import AudioFeatures, encode_pcm

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails the test
        dur, rms, zcr, peak, ok = AudioFeatures().features_one(
            encode_pcm(16000, np.array([100], dtype="<i2"))
        )
    assert ok and zcr == 0.0 and not np.isnan(zcr)
