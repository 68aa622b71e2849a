"""Multimodal columns: opaque binary payloads + typed metadata.

SURVEY training-data ops: image/audio/video ride the pipeline as
``large_binary`` columns with typed metadata; decode / feature-extract
/ resize / frame-sample are actor-pool ``map_batches`` stages.  The
decode libraries (PIL/ffmpeg/librosa) are NOT in this container, so the
codec boundary is isolated behind ``Decoder`` implementations:

- ``FakeImageDecoder`` — deterministic stand-in used by tests and the
  synthetic corpus: payload bytes seed a PRNG that fills the pixel
  array, so every downstream stage (resize, feature extraction,
  embedding) exercises REAL plumbing — schemas, batch sizing, actor
  lifecycles, zero-copy tensor columns — with reproducible values;
- ``PilImageDecoder`` — the production implementation, gated behind an
  import-try and raising ``NotImplementedError`` here.

Batch-size note (SURVEY "memory-aware"): payloads are multi-MB, so
these stages run with SMALL ``batch_size`` (default 32) and
``large_binary`` columns; the decoded tensor column is fixed-shape
float32 so Ray can pack it as one numpy block.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa


def synth_media_batch(b: pa.Table, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic synthetic media table: (media_id, kind, payload,
    width, height).  Payload is a pure function of the id row — the
    multimodal analogue of sources/pages."""
    ids = b["id"].to_pylist()
    payloads = []
    widths = []
    heights = []
    for i in ids:
        rng = np.random.default_rng(1000 + int(i))
        payloads.append(rng.bytes(payload_bytes))
        widths.append(int(16 + (i % 4) * 8))
        heights.append(int(16 + (i % 3) * 8))
    return pa.table({
        "media_id": pa.array([int(i) for i in ids], pa.int64()),
        "kind": pa.array(["image"] * len(ids), pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "width": pa.array(widths, pa.int32()),
        "height": pa.array(heights, pa.int32()),
    })


class FakeImageDecoder:
    """payload bytes → (h, w, 3) uint8 array, deterministically."""

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        import zlib

        seed = zlib.crc32(payload)
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


class PilImageDecoder:  # pragma: no cover — libs absent in this container
    """Production decoder (PIL).  STUB: the image libraries are not in
    this container; the class exists so the actor signature and the
    swap-in point are real."""

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401
            self._pil = Image
        except ImportError as e:
            raise NotImplementedError(
                "PIL not available in this environment; use "
                "FakeImageDecoder for plumbing tests") from e

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        import io

        img = self._pil.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)


class ImageFeatureExtractor:
    """Actor-pool stage: decode (once per row) → resize to a fixed
    target → cheap feature vector (channel means + gradient energy).
    Decoder is constructed ONCE per actor in __init__ (model-load
    stand-in); __call__ is per batch."""

    def __init__(self, decoder=None, target: Tuple[int, int] = (8, 8)):
        self.decoder = decoder or FakeImageDecoder()
        self.target = target

    def _resize(self, arr: np.ndarray) -> np.ndarray:
        """Nearest-neighbor resize without image libs (deterministic)."""
        th, tw = self.target
        h, w, _ = arr.shape
        ys = (np.arange(th) * h // th).clip(0, h - 1)
        xs = (np.arange(tw) * w // tw).clip(0, w - 1)
        return arr[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        feats: List[List[float]] = []
        thumbs: List[bytes] = []
        for payload, w, h in zip(payloads, widths, heights):
            arr = self.decoder.decode(payload, w, h)
            small = self._resize(arr).astype(np.float32)
            grad = np.abs(np.diff(small, axis=0)).mean() + \
                np.abs(np.diff(small, axis=1)).mean()
            feats.append([float(small[..., c].mean()) for c in range(3)]
                         + [float(grad)])
            thumbs.append(small.astype(np.uint8).tobytes())
        th, tw = self.target
        return pa.table({
            "media_id": pa.array([int(i) for i in ids], pa.int64()),
            "feature": pa.array(feats, pa.list_(pa.float32(), 4)),
            "thumb": pa.array(thumbs, pa.large_binary()),
            "thumb_shape": pa.array([[th, tw, 3]] * len(ids),
                                    pa.list_(pa.int32(), 3)),
        })


def media_features(media_ds, *, concurrency=2, batch_size: int = 32,
                   target: Tuple[int, int] = (8, 8)):
    """media table → per-item features via the actor pool (small
    batches: payloads are the wide column)."""
    return media_ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"target": target},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


def synthetic_media_dataset(n: int, *, payload_bytes: int = 4096,
                            override_num_blocks: Optional[int] = None):
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: synth_media_batch(b, payload_bytes),
        batch_format="pyarrow")
