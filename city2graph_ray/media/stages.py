"""Multimodal (image/audio/video) actor-pool stages.

Media lives as opaque ``binary`` payloads / ``media_ref`` URIs with
typed metadata; decode / feature-extract / resize / frame-sample are
stateful ``map_batches`` actor stages.  The actual codecs (PIL/ffmpeg)
are NOT in this container, so the decode kernel is stubbed: a clearly
marked deterministic fake keyed on the payload hash.  The Ray-side
plumbing — schema, batch sizing for wide binary rows, actor signature,
output layout — is real and tested (tests/test_dataops.py::test_media_stages).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: md5 of the payload
    expanded to a float feature vector in [0, 1)."""
    h = hashlib.md5(payload).digest()
    reps = (dim * 4 + len(h) - 1) // len(h)
    raw = (h * reps)[: dim * 4]
    ints = np.frombuffer(raw, dtype=np.uint32).astype(np.float64)
    return ints / 2.0 ** 32


class ImageFeatures:
    """Actor stage: binary image column → fixed-dim feature vector.

    Real decoder would be loaded in __init__ (once per actor); here it
    raises unless the deterministic stub is requested."""

    def __init__(self, use_stub: bool = True, dim: int = FEATURE_DIM):
        if not use_stub:
            raise NotImplementedError(
                "image codecs are not available in this environment; "
                "construct with use_stub=True for the deterministic fake")
        self.dim = dim

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [_fake_decode(p if isinstance(p, bytes) else str(p).encode(),
                              self.dim)
                 for p in batch["payload"]]
        out = batch.drop(columns=["payload"]).copy()
        out["feature"] = [f.tolist() for f in feats]
        out["feat_dim"] = np.int32(self.dim)
        return out


class FrameSampler:
    """Actor stage: 'video' payload → every k-th frame record
    (flat-map shape: one row becomes n frame rows).  Frame extraction
    stubbed as fixed-size byte windows of the payload."""

    def __init__(self, every_k: int = 2, frame_bytes: int = 32):
        self.k = every_k
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, frame_idx, frames = [], [], []
        for mid, p in zip(batch["media_id"], batch["payload"]):
            raw = p if isinstance(p, bytes) else str(p).encode()
            n = max(len(raw) // self.frame_bytes, 1)
            for f in range(0, n, self.k):
                ids.append(mid)
                frame_idx.append(f)
                frames.append(raw[f * self.frame_bytes:(f + 1) * self.frame_bytes])
        return pd.DataFrame({"media_id": ids,
                             "frame_idx": np.asarray(frame_idx, np.int32),
                             "frame": frames})


def media_features(media: ray.data.Dataset, batch_size: int = 64,
                   concurrency: int | tuple = (1, 4)) -> ray.data.Dataset:
    """Wire an ImageFeatures pool: SMALL batch_size — wide binary rows
    must not blow a worker heap (ray_guide: large payloads → small
    batches)."""
    return media.map_batches(ImageFeatures, batch_size=batch_size,
                             concurrency=concurrency, batch_format="pandas")
