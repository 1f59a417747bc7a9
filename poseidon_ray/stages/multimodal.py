"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (no PIL/ffmpeg in this
container): ``fake=True`` (default) runs a deterministic stand-in decode so
the Ray-side plumbing — schema, batch sizing, actor lifecycle, output
layout — is real and tested; ``fake=False`` raises NotImplementedError at
the exact point a real decoder (PIL.Image.open / soundfile.read) would be
called.

Batch sizes here are intentionally SMALL: a 4 MB payload x 256-row batch x
8 actors is 8 GB of heap — the memory-aware sizing rule from the top-level
design notes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),     # image | audio | video
    ("payload", pa.large_binary()),
    ("meta", pa.string()),           # JSON sidecar (source, declared dims...)
])


def _fake_dims(payload: bytes) -> tuple[int, int]:
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


class DecodeMedia:
    """binary payload -> decoded tensor metadata (+ fake pixel stats)."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real decode needs PIL/soundfile (not in this container); "
                "run with fake=True for the deterministic stand-in")
        widths, heights, means = [], [], []
        for payload in t["payload"].to_pylist():
            w, h = _fake_dims(payload)
            widths.append(w)
            heights.append(h)
            arr = np.frombuffer(payload, dtype=np.uint8)
            means.append(float(arr.mean()) if len(arr) else 0.0)
        return pa.table({
            "media_id": t["media_id"],
            "media_type": t["media_type"],
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "mean_value": pa.array(means, type=pa.float64()),
            "payload": t["payload"],
        })


class ResizeMedia:
    """decoded -> resized dims (stub: clamps to target box, keeps ratio)."""

    def __init__(self, target: int = 224):
        self.target = target

    def __call__(self, t: pa.Table) -> pa.Table:
        w = t["width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = t["height"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.target / np.maximum(w, h))
        return (t.drop_columns(["width", "height"])
                 .append_column("width", pa.array((w * scale).astype(np.int32)))
                 .append_column("height", pa.array((h * scale).astype(np.int32))))


class ExtractFeatures:
    """payload -> fixed-dim feature vector (stub: byte histogram, a
    deterministic stand-in for a model forward pass; a real model would be
    loaded HERE in __init__, once per actor)."""

    def __init__(self, dim: int = 32, fake: bool = True):
        self.dim = dim
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("real feature extraction needs a model")
        feats = []
        for payload in t["payload"].to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=self.dim, range=(0, 256))
            total = hist.sum() or 1
            feats.append((hist / total).astype(np.float32))
        return pa.table({
            "media_id": t["media_id"],
            "embedding": pa.array([f.tolist() for f in feats],
                                  type=pa.list_(pa.float32())),
        })


def media_pipeline(ds, *, target: int = 224, feature_dim: int = 32,
                   concurrency=(1, 4), batch_size: int = 32):
    """decode -> resize -> features, all actor pools, small batches."""
    decoded = ds.map_batches(DecodeMedia, fn_constructor_kwargs={"fake": True},
                             batch_format="pyarrow", batch_size=batch_size,
                             concurrency=concurrency)
    resized = decoded.map_batches(ResizeMedia,
                                  fn_constructor_kwargs={"target": target},
                                  batch_format="pyarrow", batch_size=batch_size,
                                  concurrency=concurrency)
    return resized.map_batches(ExtractFeatures,
                               fn_constructor_kwargs={"dim": feature_dim},
                               batch_format="pyarrow", batch_size=batch_size,
                               concurrency=concurrency)


def synthesize_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake payloads for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    types = [["image", "audio", "video"][i % 3] for i in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), type=pa.int64()),
        "media_type": pa.array(types, type=pa.string()),
        "payload": pa.array(payloads, type=pa.large_binary()),
        "meta": pa.array(["{}"] * n, type=pa.string()),
    })
