"""Real-codec lane for the multimodal stages (VERDICT r3 #6): these tests
run ONLY where the optional wheels from requirements-extras.txt exist
(Pillow / PyAV) and exercise the import-gated branches the deterministic
fakes stand in for everywhere else.  In the default sandbox every test here
skips; the fake-codec contract tests in test_multimodal.py are untouched.
"""

import io

import pytest

import ray.data as rd

pa = pytest.importorskip("pyarrow")


def _png_bytes(w: int, h: int, color=(200, 30, 30)) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


def test_pillow_decoder_reads_real_png_dims(ray_session):
    pytest.importorskip("PIL")
    from language_identification_ray.stages.multimodal import MediaDecoder

    rows = [
        {"media_id": 0, "payload": _png_bytes(120, 48)},
        {"media_id": 1, "payload": _png_bytes(16, 300)},
        {"media_id": 2, "payload": b"not an image"},
        {"media_id": 3, "payload": None},
    ]
    out = (
        rd.from_items(rows)
        .map_batches(
            MediaDecoder,
            fn_constructor_kwargs={"decoder": "pillow"},
            batch_format="pyarrow",
            batch_size=2,
            concurrency=1,
        )
        .to_pandas()
        .set_index("media_id")
    )
    assert (int(out.loc[0, "width"]), int(out.loc[0, "height"])) == (120, 48)
    assert (int(out.loc[1, "width"]), int(out.loc[1, "height"])) == (16, 300)
    assert not out.loc[2, "decode_ok"] and not out.loc[3, "decode_ok"]


def test_pillow_resize_thumbnails_and_redecodes(ray_session):
    pytest.importorskip("PIL")
    from language_identification_ray.stages.multimodal import (
        MediaDecoder,
        MediaResize,
    )

    rows = [
        {"media_id": 0, "payload": _png_bytes(256, 64)},
        {"media_id": 1, "payload": _png_bytes(32, 20)},  # already small: untouched
    ]
    ds = rd.from_items(rows).map_batches(
        MediaResize,
        fn_constructor_kwargs={"decoder": "pillow", "max_side": 64},
        batch_format="pyarrow",
        batch_size=2,
        concurrency=1,
    )
    out = (
        ds.map_batches(
            MediaDecoder,
            fn_constructor_kwargs={"decoder": "pillow"},
            batch_format="pyarrow",
            batch_size=2,
            concurrency=1,
        )
        .to_pandas()
        .set_index("media_id")
    )
    # aspect preserved, long side capped
    assert int(out.loc[0, "width"]) == 64 and int(out.loc[0, "height"]) == 16
    assert (int(out.loc[1, "width"]), int(out.loc[1, "height"])) == (32, 20)
    assert out["decode_ok"].all()


def _mp4_bytes(n_frames: int, w: int, h: int) -> bytes:
    import av
    import numpy as np

    buf = io.BytesIO()
    with av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=10)
        stream.width, stream.height = w, h
        stream.pix_fmt = "yuv420p"
        for i in range(n_frames):
            img = np.full((h, w, 3), (i * 9) % 256, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    return buf.getvalue()


def test_av_frame_sampler_samples_real_video(ray_session):
    pytest.importorskip("av")
    pytest.importorskip("PIL")
    from language_identification_ray.stages.multimodal import (
        FrameSampler,
        MediaDecoder,
    )

    rows = [{"media_id": 7, "payload": _mp4_bytes(25, 64, 48)}]
    frames = rd.from_items(rows).map_batches(
        FrameSampler,
        fn_constructor_kwargs={"decoder": "ffmpeg", "every_n": 10},
        batch_format="pyarrow",
        batch_size=1,
        concurrency=1,
    )
    df = frames.to_pandas()
    assert sorted(df["frame_idx"]) == [0, 10, 20]
    assert (df["kind"] == "frame").all()
    # the sampled frames are real PNGs: the pillow decoder round-trips them
    dec = frames.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"decoder": "pillow"},
        batch_format="pyarrow",
        batch_size=4,
        concurrency=1,
    ).to_pandas()
    assert dec["decode_ok"].all()
    assert (dec["width"] == 64).all() and (dec["height"] == 48).all()
