"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payload columns with typed metadata —
exactly how a 100 TB multimodal table should flow through Ray Data: blocks
stay Arrow (no pandas object-dtype round trip), batch sizes are small because
rows are wide, and the decode/feature stages are actor pools.

The actual codecs (Pillow/ffmpeg/torchaudio) are NOT in this container, so
the decode kernel is pluggable:

  * ``decoder="fake"`` (default) — a deterministic stand-in that parses the
    payload header we synthesize (``synthesize_media``) and emits real
    metadata + a stable feature vector.  Everything around it — schema,
    actor signature, batching, output layout — is production-shaped.
  * ``decoder="pillow"`` — gated behind an import-try; raises a clear
    NotImplementedError in this environment.

This mirrors how the engine treats every heavyweight model: state in actor
``__init__``, vectorized work per batch.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data as rd

from language_identification_ray.stages.langid import set_or_append

MAGIC = b"FAKEIMG1"
FEATURE_DIM = 32


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic synthetic 'image': header + seeded pixel bytes."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=min(width * height, 4096), dtype=np.uint8).tobytes()
    return MAGIC + struct.pack("<II", width, height) + pixels


class MediaDecoder:
    """``ds.map_batches(MediaDecoder, batch_format="pyarrow", batch_size=64,
    concurrency=N)`` — adds width/height/ok columns from the payload.

    batch_size stays SMALL for media (wide rows: batch bytes ≈ rows ×
    payload size must fit the worker heap)."""

    def __init__(self, payload_column: str = "payload", decoder: str = "fake"):
        self.payload_column = payload_column
        self._pil = None
        if decoder == "pillow":
            try:
                from PIL import Image  # once per actor, not per batch
            except ImportError as e:
                raise NotImplementedError(
                    "Pillow is not available in this environment; use decoder='fake' "
                    "(deterministic stand-in) or install requirements-extras.txt "
                    "in the deployment image"
                ) from e
            self._pil = Image
        elif decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder

    def decode_one(self, payload: Optional[bytes]) -> tuple[int, int, bool]:
        if self.decoder == "pillow":
            # real codec lane (exercised by tests/test_multimodal_real_codecs.py
            # wherever Pillow exists): actual PNG/JPEG/... bytes
            if not payload:
                return 0, 0, False
            import io

            try:
                with self._pil.open(io.BytesIO(payload)) as im:
                    return int(im.width), int(im.height), True
            except Exception:
                return 0, 0, False
        if not payload or not payload.startswith(MAGIC):
            return 0, 0, False
        w, h = struct.unpack("<II", payload[8:16])
        return int(w), int(h), True

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, oks = [], [], []
        for p in batch[self.payload_column].to_pylist():
            w, h, ok = self.decode_one(p)
            widths.append(w)
            heights.append(h)
            oks.append(ok)
        batch = set_or_append(batch, "width", pa.array(widths, pa.int32()))
        batch = set_or_append(batch, "height", pa.array(heights, pa.int32()))
        return set_or_append(batch, "decode_ok", pa.array(oks, pa.bool_()))


class MediaFeatures:
    """Payload → fixed-dim feature vector (list<float> column).

    The 'model' here is a deterministic byte-hash projection (clearly a
    stand-in — a real deployment loads a vision/audio encoder in __init__);
    the Ray-side contract (actor pool, list<float> output, small batches) is
    the real thing and is what the ANN/dedup stages consume."""

    def __init__(self, payload_column: str = "payload", dim: int = FEATURE_DIM):
        self.payload_column = payload_column
        self.dim = dim

    def features_one(self, payload: Optional[bytes]) -> list:
        if not payload:
            return [0.0] * self.dim
        digest = hashlib.sha256(payload).digest()
        seed = int.from_bytes(digest[:8], "big")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(self.dim)
        return (v / np.linalg.norm(v)).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.features_one(p) for p in batch[self.payload_column].to_pylist()]
        return set_or_append(batch, "features", pa.array(feats, pa.list_(pa.float32())))


class MediaResize:
    """Payload → resized payload (actor-pool stage).

    For the ``fake`` codec this is REAL: the header dims are rewritten and
    the pixel bytes are stride-subsampled deterministically, so downstream
    stages (decode, features) consume the smaller payload exactly as they
    would a Pillow ``thumbnail()`` output.  ``decoder="pillow"`` is gated
    behind an import-try like :class:`MediaDecoder`."""

    def __init__(self, max_side: int = 64, payload_column: str = "payload", decoder: str = "fake"):
        self._pil = None
        if decoder == "pillow":
            try:
                from PIL import Image
            except ImportError as e:
                raise NotImplementedError(
                    "Pillow is not available in this environment; use decoder='fake' "
                    "or install requirements-extras.txt in the deployment image"
                ) from e
            self._pil = Image
        elif decoder != "fake":  # same contract as MediaDecoder/FrameSampler
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.max_side = max_side
        self.payload_column = payload_column

    def resize_one(self, payload: Optional[bytes]) -> Optional[bytes]:
        if self.decoder == "pillow":
            # real codec lane: Image.thumbnail + PNG re-encode
            if not payload:
                return payload
            import io

            try:
                with self._pil.open(io.BytesIO(payload)) as im:
                    if max(im.width, im.height) <= self.max_side:
                        return payload
                    im.thumbnail((self.max_side, self.max_side))
                    buf = io.BytesIO()
                    im.save(buf, format="PNG")
                    return buf.getvalue()
            except Exception:
                return payload
        if not payload or not payload.startswith(MAGIC):
            return payload
        w, h = struct.unpack("<II", payload[len(MAGIC) : len(MAGIC) + 8])
        scale = max(w, h) / self.max_side
        if scale <= 1.0:
            return payload
        nw, nh = max(1, int(w / scale)), max(1, int(h / scale))
        pixels = payload[len(MAGIC) + 8 :]
        step = max(1, len(pixels) // max(1, (len(pixels) * nw * nh) // (w * h)))
        return MAGIC + struct.pack("<II", nw, nh) + pixels[::step]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self.resize_one(p) for p in batch[self.payload_column].to_pylist()]
        return set_or_append(batch, self.payload_column, pa.array(out, pa.binary()))


VIDEO_MAGIC = b"FAKEVID1"
FRAME_BYTES = 256


def encode_fake_video(n_frames: int, width: int, height: int, seed: int) -> bytes:
    """Deterministic synthetic 'video': header + n_frames fixed-size frame
    records (seeded bytes).  Fixed-size records make frame extraction pure
    offset math — the stand-in for a real container/codec."""
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=n_frames * FRAME_BYTES, dtype=np.uint8).tobytes()
    return VIDEO_MAGIC + struct.pack("<III", n_frames, width, height) + frames


class FrameSampler:
    """Video payload → sampled frame rows (the flat_map actor-pool stage).

    Every ``every_n``-th frame is re-encoded as a standalone FAKEIMG1 image
    payload, so downstream :class:`MediaDecoder` / :class:`MediaFeatures`
    consume sampled frames exactly as they consume still images — the same
    composition a real pipeline gets from ffmpeg-frame → JPEG bytes.  Rows
    fan OUT (one input row → ceil(n_frames/every_n) output rows), so batch
    sizes stay small and the payload column is replaced, never duplicated.
    A real codec (ffmpeg/PyAV) would slot into ``_frames_of`` behind the
    same import-try gate as the Pillow decoder; the fake codec keeps every
    other part of the stage — schema, fan-out, actor signature — real."""

    def __init__(self, every_n: int = 10, payload_column: str = "payload", decoder: str = "fake"):
        self._av = None
        if decoder == "ffmpeg":
            try:
                import av
            except ImportError as e:
                raise NotImplementedError(
                    "no video codec in this environment; use decoder='fake' or "
                    "install requirements-extras.txt in the deployment image"
                ) from e
            self._av = av
        elif decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder
        self.every_n = every_n
        self.payload_column = payload_column

    def _frames_of(self, payload: Optional[bytes]) -> list:
        """[(frame_idx, image_payload)] for the sampled frames."""
        if self.decoder == "ffmpeg":
            # real codec lane: demux with PyAV, every_n-th frame → PNG bytes
            if not payload:
                return []
            import io

            out = []
            try:
                with self._av.open(io.BytesIO(payload)) as container:
                    for i, frame in enumerate(container.decode(video=0)):
                        if i % self.every_n:
                            continue
                        buf = io.BytesIO()
                        frame.to_image().save(buf, format="PNG")
                        out.append((i, buf.getvalue()))
            except Exception:
                return []
            return out
        if not payload or not payload.startswith(VIDEO_MAGIC):
            return []
        hdr = len(VIDEO_MAGIC)
        n, w, h = struct.unpack("<III", payload[hdr : hdr + 12])
        body = payload[hdr + 12 :]
        out = []
        for i in range(0, n, self.every_n):
            px = body[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
            out.append((i, MAGIC + struct.pack("<II", w, h) + px))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, idxs, payloads = [], [], [], []
        mid = batch["media_id"].to_pylist()
        for row, p in enumerate(batch[self.payload_column].to_pylist()):
            for fi, fp in self._frames_of(p):
                ids.append(mid[row])
                kinds.append("frame")
                idxs.append(fi)
                payloads.append(fp)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


def synthesize_media(sf_dir: str) -> "rd.Dataset":
    """Deterministic media table derived from documents.parquet:
    (media_id, kind, payload, src_doc)."""

    def make(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        payloads = [
            encode_fake_image(64 + int(d) % 128, 64 + (int(d) * 7) % 128, int(d)) for d in ids
        ]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(["image"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "src_doc": pa.array(ids, pa.int64()),
            }
        )

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
        make, batch_format="pyarrow"
    )


def media_pipeline(sf_dir: str) -> "rd.Dataset":
    """decode → features over the synthetic media table (rows-only check)."""
    ds = synthesize_media(sf_dir)
    ds = ds.map_batches(MediaDecoder, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))
    ds = ds.map_batches(MediaFeatures, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))
    return ds.map_batches(
        lambda t: t.select(["media_id", "width", "height", "decode_ok", "features"]),
        batch_format="pyarrow",
    )


def media_metadata(sf_dir: str) -> "rd.Dataset":
    """Binary-plumbing oracle query: synthesize encodes (width, height) into
    a REAL binary payload header, the payload crosses the object store as an
    opaque ``binary`` column, and the actor-pool decoder parses the values
    back out.  Because the synthesized dimensions are pure arithmetic on
    doc_id, a SQL oracle can state what the decoder must recover — an exact
    end-to-end check of the encode → binary column → actor decode path
    (the part of the multimodal stack that is NOT stubbed)."""
    ds = synthesize_media(sf_dir)
    ds = ds.map_batches(MediaDecoder, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))
    return ds.map_batches(
        lambda t: t.select(["media_id", "width", "height", "decode_ok"]),
        batch_format="pyarrow",
    )


def audio_metadata(sf_dir: str) -> "rd.Dataset":
    """Same binary round-trip oracle for audio: duration must equal the
    synthesized (4000 + doc_id % 12001) / 16000 s, recovered by parsing the
    PCM header + counting real samples — SQL-stateable arithmetic."""
    ds = synthesize_audio(sf_dir)
    ds = ds.map_batches(AudioFeatures, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))
    return ds.map_batches(
        lambda t: t.select(["media_id", "duration_sec", "audio_ok"]),
        batch_format="pyarrow",
    )


def synthesize_videos(sf_dir: str) -> "rd.Dataset":
    """Deterministic video table derived from documents.parquet: one fake
    video per 5th doc, 8-31 frames each."""

    def make(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        ids = ids[ids % 5 == 0]
        payloads = [
            encode_fake_video(8 + int(d) % 24, 32 + int(d) % 64, 32 + (int(d) * 3) % 64, int(d))
            for d in ids
        ]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(["video"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
        make, batch_format="pyarrow"
    )


def video_frame_pipeline(sf_dir: str, every_n: int = 10) -> "rd.Dataset":
    """Video → frame-sample (flat_map fan-out) → decode → features.

    The full multimodal composition: sampled frames are standalone image
    payloads, so the SAME decode/feature actor stages that serve stills
    serve frames — at 100 TB this is the shape that keeps one encoder pool
    serving every modality.  Rows-only driver check (fake codec); frame
    counts and determinism are pinned in tests/test_multimodal.py."""
    ds = synthesize_videos(sf_dir)
    ds = ds.map_batches(FrameSampler(every_n=every_n), batch_format="pyarrow", batch_size=32)
    ds = ds.map_batches(MediaDecoder, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))
    ds = ds.map_batches(MediaFeatures, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))
    return ds.map_batches(
        lambda t: t.select(["media_id", "frame_idx", "width", "height", "decode_ok", "features"]),
        batch_format="pyarrow",
    )


def video_metadata(sf_dir: str, every_n: int = 10) -> "rd.Dataset":
    """Binary round-trip oracle for the video path: the flat_map frame
    sampler must emit exactly the arithmetic frame indices
    (0, every_n, ... < n_frames) and each sampled frame's standalone image
    payload must decode back to the synthesized dimensions."""
    ds = synthesize_videos(sf_dir)
    ds = ds.map_batches(FrameSampler(every_n=every_n), batch_format="pyarrow", batch_size=32)
    ds = ds.map_batches(MediaDecoder, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))
    return ds.map_batches(
        lambda t: t.select(["media_id", "frame_idx", "width", "height", "decode_ok"]),
        batch_format="pyarrow",
    )


AUDIO_MAGIC = b"FAKEAUD1"


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    """Deterministic synthetic 'audio': header + int16 little-endian PCM.
    Unlike the image/video payloads this is a REAL audio encoding (raw PCM)
    — the feature stage below does genuine DSP on it, no codec needed."""
    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal(n_samples) * 8192).astype("<i2").tobytes()
    return AUDIO_MAGIC + struct.pack("<II", sample_rate, n_samples) + pcm


def encode_pcm(sample_rate: int, samples: np.ndarray) -> bytes:
    """Wrap an int16 sample array in the audio payload header."""
    s = np.asarray(samples, dtype="<i2")
    return AUDIO_MAGIC + struct.pack("<II", sample_rate, len(s)) + s.tobytes()


class AudioFeatures:
    """Audio payload → (duration_sec, rms, zero_crossing_rate, peak).

    Real vectorized DSP over raw int16 PCM — header parse is the only
    'decode', so nothing here is stubbed.  Per-batch work is one
    ``np.frombuffer`` + three reductions per row; compressed formats
    (mp3/ogg) would decode to exactly this PCM behind an import-try gate
    (torchaudio/soundfile), leaving the feature math untouched."""

    def __init__(self, payload_column: str = "payload"):
        self.payload_column = payload_column

    def features_one(self, payload: Optional[bytes]) -> tuple:
        hdr = len(AUDIO_MAGIC)
        if not payload or not payload.startswith(AUDIO_MAGIC) or len(payload) < hdr + 8:
            return 0.0, 0.0, 0.0, 0, False
        sr, n = struct.unpack("<II", payload[hdr : hdr + 8])
        pcm = np.frombuffer(payload, dtype="<i2", offset=hdr + 8, count=min(n, (len(payload) - hdr - 8) // 2))
        if sr == 0 or len(pcm) == 0:
            return 0.0, 0.0, 0.0, 0, False
        x = pcm.astype(np.float64) / 32768.0
        rms = float(np.sqrt(np.mean(x * x)))
        # a 1-sample clip has no sign transitions: zcr 0.0, not a NaN from
        # np.mean over the empty pairwise slice (plus a warning per row)
        zcr = (
            float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) * sr / 2.0
            if len(x) > 1
            else 0.0
        )
        return len(pcm) / sr, rms, zcr, int(np.abs(pcm).max()), True

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self.features_one(p) for p in batch[self.payload_column].to_pylist()]
        dur, rms, zcr, peak, ok = zip(*rows) if rows else ((), (), (), (), ())
        batch = set_or_append(batch, "duration_sec", pa.array(dur, pa.float64()))
        batch = set_or_append(batch, "rms", pa.array(rms, pa.float64()))
        batch = set_or_append(batch, "zcr_hz", pa.array(zcr, pa.float64()))
        batch = set_or_append(batch, "peak", pa.array(peak, pa.int32()))
        return set_or_append(batch, "audio_ok", pa.array(ok, pa.bool_()))


def synthesize_audio(sf_dir: str) -> "rd.Dataset":
    """Deterministic audio table derived from documents.parquet: one clip
    per 3rd doc, 0.25-1 s at 16 kHz."""

    def make(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        ids = ids[ids % 3 == 0]
        payloads = [encode_fake_audio(16000, 4000 + int(d) % 12001, int(d)) for d in ids]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(["audio"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
        make, batch_format="pyarrow"
    )


def audio_pipeline(sf_dir: str) -> "rd.Dataset":
    """Audio feature extraction over the synthetic clip table (rows-only
    driver check; the DSP itself is pinned analytically in pytest — a pure
    sine's rms is A/√2 and its zero-crossing rate is 2f crossings/sec)."""
    ds = synthesize_audio(sf_dir)
    ds = ds.map_batches(AudioFeatures, batch_format="pyarrow", batch_size=64, concurrency=(1, 4))
    return ds.map_batches(
        lambda t: t.select(["media_id", "duration_sec", "rms", "zcr_hz", "peak", "audio_ok"]),
        batch_format="pyarrow",
    )
