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
        if decoder == "pillow":
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "Pillow is not available in this environment; use decoder='fake' "
                    "(deterministic stand-in) or install a codec in the deployment image"
                ) from e
        elif decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder

    def decode_one(self, payload: Optional[bytes]) -> tuple[int, int, bool]:
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
        if decoder == "pillow":
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "Pillow is not available in this environment; use decoder='fake'"
                ) from e
        self.max_side = max_side
        self.payload_column = payload_column

    def resize_one(self, payload: Optional[bytes]) -> Optional[bytes]:
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


def frame_sample(batch: pa.Table, every_n: int = 10) -> pa.Table:
    """Video frame-sampling STUB: the container has no video codec.  The
    production shape is an actor-pool flat_map payload → frame rows; raising
    keeps the contract explicit rather than silently wrong."""
    raise NotImplementedError(
        "video frame sampling requires a codec not present in this environment; "
        "implement decode→frames in MediaDecoder.decode_one and flat_map frames"
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
