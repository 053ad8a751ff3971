"""Multimodal column plumbing: opaque binary payloads + actor-pool stages.

Design (driver brief): image/audio/video travel as opaque ``binary``
columns with typed metadata; decode / feature-extract / resize /
frame-sample are actor-pool ``map_batches`` stages.  The image/audio
codecs are NOT in this container, so the decode kernel is stubbed — the
Ray-side plumbing (schema, batch sizing, actor signature, output layout)
is real and tested, and a production deploy swaps ``_decode_stub`` for a
Pillow/ffmpeg call without touching anything else.

Memory note: binary payloads make WIDE rows — callers should size
``batch_size`` small (32-128) and/or raise ``target_max_block_size`` so a
batch × pool concurrency fits worker heaps (SURVEY "memory-aware").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),          # image | audio | video
        ("mime", pa.string()),
        ("payload", pa.large_binary()),
        ("width", pa.int32()),           # -1 when unknown / n.a.
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_batch(batch: dict) -> pa.Table:
    """Deterministic fake media table from a ``ray.data.range`` batch —
    payload bytes are md5-seeded noise (stable at any parallelism)."""
    ids = np.asarray(batch["id"], dtype=np.int64)
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in ids.tolist():
        kind = ("image", "audio", "video")[i % 3]
        seed = hashlib.md5(f"media|{i}".encode()).digest()
        payload = (seed * ((256 + i % 512) // 16 + 1))[: 256 + (i % 512)]
        rows["media_id"].append(f"m{i:08d}")
        rows["kind"].append(kind)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["payload"].append(payload)
        rows["width"].append(64 + (i % 8) * 16 if kind != "audio" else -1)
        rows["height"].append(64 + (i % 4) * 16 if kind != "audio" else -1)
        rows["duration_ms"].append(-1 if kind == "image" else 1000 + (i % 60) * 500)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class MediaFeatureExtractor:
    """Actor-pool stage: binary payload → fixed-width feature vector.

    ``__init__`` is where a real deployment loads the codec/model ONCE per
    actor; ``_decode_stub`` stands in for the decode (deterministic: byte
    histogram), keeping the distributed contract testable without
    image/audio libraries.
    """

    N_FEATURES = 16

    def __init__(self, feature_dim: int = N_FEATURES):
        self.dim = feature_dim
        # real version: self.model = load_model(...); self.codec = ...

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        """Deterministic stand-in for decode+featurize: normalized byte
        histogram folded to ``dim`` buckets.  Raises like a real decoder
        on empty payloads."""
        if not payload:
            raise ValueError("empty media payload")
        counts = np.bincount(
            np.frombuffer(payload, dtype=np.uint8) % self.dim, minlength=self.dim
        )
        return (counts / counts.sum()).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode_stub(p) for p in batch.column("payload").to_pylist()]
        out = batch.drop_columns(["payload"])  # features replace the heavy bytes
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


def media_features(n_media: int = 256, *, batch_size: int = 64, concurrency=2):
    """Synthetic media table → feature table (the full plumbing path)."""
    import ray.data as rd

    media = rd.range(n_media).map_batches(synth_media_batch, batch_format="pyarrow")
    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,     # small: payload rows are wide
        concurrency=concurrency,
        num_cpus=1,
    )
