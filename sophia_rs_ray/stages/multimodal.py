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


# ---------------------------------------------------------------------------
# video: frame sampling (flat_map-shaped actor stage)
# ---------------------------------------------------------------------------

def synth_video_batch(b: pa.Table, *, frame_bytes: int = 512,
                      max_frames: int = 48) -> pa.Table:
    """Deterministic synthetic video table: (video_id, payload,
    n_frames, fps, width, height); the payload is the concatenation of
    per-frame chunks so the fake decoder can slice frames out."""
    ids = b["id"].to_pylist()
    payloads, n_frames, fps = [], [], []
    for i in ids:
        rng = np.random.default_rng(7000 + int(i))
        nf = int(8 + (i % 5) * (max_frames - 8) // 4)
        payloads.append(rng.bytes(frame_bytes * nf))
        n_frames.append(nf)
        fps.append(float(8 + (i % 3) * 8))
    return pa.table({
        "video_id": pa.array([int(i) for i in ids], pa.int64()),
        "payload": pa.array(payloads, pa.large_binary()),
        "n_frames": pa.array(n_frames, pa.int32()),
        "fps": pa.array(fps, pa.float32()),
        "width": pa.array([16] * len(ids), pa.int32()),
        "height": pa.array([16] * len(ids), pa.int32()),
    })


class FakeVideoDecoder:
    """payload → one (h, w, 3) uint8 frame by index, deterministically:
    the frame's payload slice seeds a PRNG (ffmpeg stand-in; the codec
    boundary is this class)."""

    def __init__(self, frame_bytes: int = 512):
        self.frame_bytes = frame_bytes

    def frame(self, payload: bytes, idx: int, width: int,
              height: int) -> np.ndarray:
        import zlib

        chunk = payload[idx * self.frame_bytes:(idx + 1) * self.frame_bytes]
        rng = np.random.default_rng(zlib.crc32(chunk) + idx)
        return rng.integers(0, 256, size=(height, width, 3),
                            dtype=np.uint8)


class FrameSampler:
    """Actor-pool stage with flat output: ONE input video row → one
    OUTPUT row per sampled frame (uniform time stride ``every_sec``),
    each decoded and thumbnailed.  Decoder built once per actor;
    payloads are the wide column, so run with small ``batch_size``."""

    def __init__(self, decoder=None, every_sec: float = 1.0,
                 target: Tuple[int, int] = (8, 8)):
        self.decoder = decoder or FakeVideoDecoder()
        self.every_sec = every_sec
        self.target = target

    def _thumb(self, arr: np.ndarray) -> bytes:
        th, tw = self.target
        h, w, _ = arr.shape
        ys = (np.arange(th) * h // th).clip(0, h - 1)
        xs = (np.arange(tw) * w // tw).clip(0, w - 1)
        return arr[np.ix_(ys, xs)].tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid_out: List[int] = []
        idx_out: List[int] = []
        t_out: List[float] = []
        thumbs: List[bytes] = []
        for vid, payload, nf, fps, w, h in zip(
                batch["video_id"].to_pylist(),
                batch["payload"].to_pylist(),
                batch["n_frames"].to_pylist(),
                batch["fps"].to_pylist(),
                batch["width"].to_pylist(),
                batch["height"].to_pylist()):
            stride = max(1, int(round(float(fps) * self.every_sec)))
            for idx in range(0, int(nf), stride):
                arr = self.decoder.frame(payload, idx, int(w), int(h))
                vid_out.append(int(vid))
                idx_out.append(idx)
                t_out.append(idx / float(fps))
                thumbs.append(self._thumb(arr))
        th, tw = self.target
        return pa.table({
            "video_id": pa.array(vid_out, pa.int64()),
            "frame_idx": pa.array(idx_out, pa.int32()),
            "t_sec": pa.array(t_out, pa.float64()),
            "thumb": pa.array(thumbs, pa.large_binary()),
            "thumb_shape": pa.array([[th, tw, 3]] * len(vid_out),
                                    pa.list_(pa.int32(), 3)),
        })


def sample_frames(video_ds, *, every_sec: float = 1.0, concurrency=2,
                  batch_size: int = 8, target: Tuple[int, int] = (8, 8)):
    """video table → one row per sampled frame (actor pool; tiny
    batches — each row carries a multi-frame payload)."""
    return video_ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_sec": every_sec, "target": target},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


def synthetic_video_dataset(n: int, *,
                            override_num_blocks: Optional[int] = None):
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(synth_video_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# audio: decode + windowed features
# ---------------------------------------------------------------------------

def synth_audio_batch(b: pa.Table, *, seconds: float = 1.0,
                      sample_rate: int = 8000) -> pa.Table:
    ids = b["id"].to_pylist()
    n = int(seconds * sample_rate)
    payloads = []
    for i in ids:
        rng = np.random.default_rng(9000 + int(i))
        payloads.append(rng.bytes(2 * n))      # int16 PCM stand-in
    return pa.table({
        "audio_id": pa.array([int(i) for i in ids], pa.int64()),
        "payload": pa.array(payloads, pa.large_binary()),
        "sample_rate": pa.array([sample_rate] * len(ids), pa.int32()),
        "n_samples": pa.array([n] * len(ids), pa.int32()),
    })


class FakeAudioDecoder:
    """payload → float32 PCM in [-1, 1] (librosa/ffmpeg stand-in: the
    payload IS little-endian int16 PCM here)."""

    def decode(self, payload: bytes, n_samples: int) -> np.ndarray:
        pcm = np.frombuffer(payload, dtype="<i2", count=n_samples)
        return pcm.astype(np.float32) / 32768.0


class AudioFeatureExtractor:
    """Actor-pool stage: decode once per row → REAL vectorized numpy
    features per window (RMS energy + zero-crossing rate) — the cheap
    stand-ins for mel-spectrogram frames."""

    def __init__(self, decoder=None, window: int = 1024):
        self.decoder = decoder or FakeAudioDecoder()
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: List[int] = []
        win_out: List[int] = []
        rms_out: List[float] = []
        zcr_out: List[float] = []
        for aid, payload, n in zip(batch["audio_id"].to_pylist(),
                                   batch["payload"].to_pylist(),
                                   batch["n_samples"].to_pylist()):
            pcm = self.decoder.decode(payload, int(n))
            nw = len(pcm) // self.window
            if nw == 0:
                continue
            frames = pcm[:nw * self.window].reshape(nw, self.window)
            rms = np.sqrt((frames ** 2).mean(axis=1))
            zcr = (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
            ids_out.extend([int(aid)] * nw)
            win_out.extend(range(nw))
            rms_out.extend(rms.tolist())
            zcr_out.extend(zcr.tolist())
        return pa.table({
            "audio_id": pa.array(ids_out, pa.int64()),
            "window": pa.array(win_out, pa.int32()),
            "rms": pa.array(rms_out, pa.float64()),
            "zcr": pa.array(zcr_out, pa.float64()),
        })


def audio_features(audio_ds, *, concurrency=2, batch_size: int = 32,
                   window: int = 1024):
    return audio_ds.map_batches(
        AudioFeatureExtractor,
        fn_constructor_kwargs={"window": window},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


def synthetic_audio_dataset(n: int, *,
                            override_num_blocks: Optional[int] = None):
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(synth_audio_batch, batch_format="pyarrow")
