"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extraction runs as an actor-pool ``map_batches`` stage.  The
image/audio codec libraries are not available in this container, so the
decode kernel itself is STUBBED: ``ImageDecodeStage`` raises
``NotImplementedError`` unless a ``feature_fn`` is injected (tests and
pipelines use :func:`fake_image_features`, a deterministic stand-in).
The Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),
    ]
)


def fake_image_features(payload: bytes) -> np.ndarray:
    """Deterministic 8-dim stand-in for a real image-feature extractor."""
    digest = hashlib.sha1(payload).digest()
    return np.frombuffer(digest[:8], dtype=np.uint8).astype(np.float32) / 255.0


class ImageDecodeStage:
    """Actor-pool stage: decode media payloads → feature vectors.

    Real decoding requires an image codec library that is not shipped in
    this environment; construct with ``feature_fn=fake_image_features``
    for the deterministic test path.  Batch sizes should stay small for
    large binary payloads (one decoded image can be 100× its encoded
    size) — callers pass ``batch_size<=32``.
    """

    def __init__(self, feature_fn: Optional[Callable[[bytes], np.ndarray]] = None):
        self.feature_fn = feature_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.feature_fn is None:
            raise NotImplementedError(
                "image decode requires a codec library not present in this "
                "container; inject feature_fn (e.g. fake_image_features)"
            )
        payloads = batch.column("payload").to_pylist()
        feats = [self.feature_fn(p or b"").tolist() for p in payloads]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def frame_sample_stage(batch: pa.Table, every_nth: int = 10) -> pa.Table:
    """Video frame-sampling plumbing: emits (media_id, frame_index) rows
    for every Nth frame.  Frame decoding is stubbed — frame count is
    derived deterministically from payload length (a real implementation
    would probe the container format)."""
    media_ids = batch.column("media_id").to_pylist()
    payloads = batch.column("payload").to_pylist()
    out_ids, out_frames = [], []
    for mid, payload in zip(media_ids, payloads):
        n_frames = max(1, len(payload or b"") // 16)
        for f in range(0, n_frames, every_nth):
            out_ids.append(mid)
            out_frames.append(f)
    return pa.table(
        {
            "media_id": pa.array(out_ids, pa.int64()),
            "frame_index": pa.array(out_frames, pa.int64()),
        }
    )
