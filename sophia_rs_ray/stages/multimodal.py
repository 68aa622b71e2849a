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


def media_features(media_ds, *, concurrency=None, batch_size: int = 32,
                   target: Tuple[int, int] = (8, 8), decoder=None):
    """media table → per-item features via the actor pool (small
    batches: payloads are the wide column).  ``decoder`` picks the
    codec (default FakeImageDecoder; pass PngImageDecoder() for real
    PNG payloads)."""
    from ..util import actor_pool

    return media_ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"target": target, "decoder": decoder},
        batch_format="pyarrow",
        concurrency=concurrency or actor_pool(),
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

    def _thumb(self, arr: np.ndarray) -> np.ndarray:
        th, tw = self.target
        h, w, _ = arr.shape
        ys = (np.arange(th) * h // th).clip(0, h - 1)
        xs = (np.arange(tw) * w // tw).clip(0, w - 1)
        return arr[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid_out: List[int] = []
        idx_out: List[int] = []
        t_out: List[float] = []
        thumbs: List[bytes] = []
        feats: List[List[float]] = []
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
                small = self._thumb(arr)
                vid_out.append(int(vid))
                idx_out.append(idx)
                t_out.append(idx / float(fps))
                thumbs.append(small.tobytes())
                sf = small.astype(np.float32)
                feats.append([float(sf[..., c].mean()) for c in range(3)])
        th, tw = self.target
        return pa.table({
            "video_id": pa.array(vid_out, pa.int64()),
            "frame_idx": pa.array(idx_out, pa.int32()),
            "t_sec": pa.array(t_out, pa.float64()),
            "feature": pa.array(feats, pa.list_(pa.float32(), 3)),
            "thumb": pa.array(thumbs, pa.large_binary()),
            "thumb_shape": pa.array([[th, tw, 3]] * len(vid_out),
                                    pa.list_(pa.int32(), 3)),
        })


def sample_frames(video_ds, *, every_sec: float = 1.0, concurrency=None,
                  batch_size: int = 8, target: Tuple[int, int] = (8, 8),
                  decoder=None):
    """video table → one row per sampled frame (actor pool; tiny
    batches — each row carries a multi-frame payload)."""
    from ..util import actor_pool

    return video_ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_sec": every_sec, "target": target,
                               "decoder": decoder},
        batch_format="pyarrow",
        concurrency=concurrency or actor_pool(),
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


def audio_features(audio_ds, *, concurrency=None, batch_size: int = 32,
                   window: int = 1024, decoder=None):
    from ..util import actor_pool

    return audio_ds.map_batches(
        AudioFeatureExtractor,
        fn_constructor_kwargs={"window": window, "decoder": decoder},
        batch_format="pyarrow",
        concurrency=concurrency or actor_pool(),
        batch_size=batch_size)


def synthetic_audio_dataset(n: int, *,
                            override_num_blocks: Optional[int] = None):
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(synth_audio_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# REAL codecs (round-4): pure-numpy/stdlib PNG and WAV.  No image/audio
# libraries exist in this container, but PNG is zlib (stdlib) + five
# scanline filters and WAV is a RIFF chunk walk — both implementable
# exactly.  These replace the deterministic fakes on the oracled
# registry paths: the payload column now holds REAL encoded bytes and
# the decode stage performs a REAL inflate/unfilter (PNG) or chunk
# parse (WAV), so a broken decoder diverges from the closed-form
# DuckDB oracle instead of being asserted only rows-only.
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb_ and pa_ <= pc_:
        return a
    if pb_ <= pc_:
        return b
    return c


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (8-bit RGB, no interlace).

    Scanline filters cycle 0..4 per row (None/Sub/Up/Average/Paeth) so
    the decoder's un-filtering logic is genuinely exercised, not just
    the filter-0 path.  Filtering references RAW neighbor bytes, so it
    vectorizes fully."""
    import struct
    import zlib

    h, w, ch = arr.shape
    assert ch == 3 and arr.dtype == np.uint8
    bpp = 3
    raw = arr.reshape(h, w * 3).astype(np.int32)
    body = bytearray()
    zeros = np.zeros(w * 3, np.int32)
    for y in range(h):
        row = raw[y]
        prev = raw[y - 1] if y > 0 else zeros
        ft = y % 5
        a = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - a
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - (a + prev) // 2
        else:
            c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = a + prev - c
            pa_, pb_, pc_ = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa_ <= pb_) & (pa_ <= pc_), a,
                            np.where(pb_ <= pc_, prev, c))
            filt = row - pred
        body.append(ft)
        body += (filt % 256).astype(np.uint8).tobytes()

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(bytes(body))) +
            chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8.  Supports 8-bit RGB non-interlaced
    (what ``encode_png`` writes), all five scanline filters, and
    multiple IDAT chunks."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype})")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    bpp = 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    out = np.empty((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ft = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) % 256
        elif ft == 1:
            # Sub: per-channel cumulative sum (vectorized)
            cur = np.empty(stride, np.int32)
            for ci in range(bpp):
                cur[ci::bpp] = np.cumsum(line[ci::bpp]) % 256
        elif ft == 3:
            cur = np.empty(stride, np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (line[i] + (a + prev[i]) // 2) % 256
        elif ft == 4:
            cur = np.empty(stride, np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                cur[i] = (line[i] + _paeth(int(a), int(prev[i]),
                                           int(c))) % 256
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8).reshape(h, w, 3)


class PngImageDecoder:
    """Real image decoder: payload is an actual PNG (stdlib zlib).
    Same interface as FakeImageDecoder/PilImageDecoder — width/height
    args are ignored (the header is authoritative)."""

    def decode(self, payload: bytes, width: int = 0,
               height: int = 0) -> np.ndarray:
        return decode_png(payload)


class PngVideoDecoder:
    """Real video codec stand-in with real per-frame decode: the
    payload is a sequence of ``<u32 little-endian length><PNG bytes>``
    frames; ``frame(payload, idx, ...)`` walks the prefixes and
    PNG-decodes the idx-th frame."""

    def frame(self, payload: bytes, idx: int, width: int = 0,
              height: int = 0) -> np.ndarray:
        import struct

        pos = 0
        for _ in range(idx):
            (ln,) = struct.unpack_from("<I", payload, pos)
            pos += 4 + ln
        (ln,) = struct.unpack_from("<I", payload, pos)
        return decode_png(payload[pos + 4:pos + 4 + ln])


def encode_wav(pcm: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono PCM → RIFF/WAVE bytes (PCM format chunk + data)."""
    import struct

    data = pcm.astype("<i2").tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE" +
            b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                  sample_rate * 2, 2, 16) +
            b"data" + struct.pack("<I", len(data)) + data)


class WavAudioDecoder:
    """Real audio decoder: walks the RIFF chunk list, validates the
    PCM fmt chunk, returns float32 in [-1, 1)."""

    def decode(self, payload: bytes, n_samples: int = 0) -> np.ndarray:
        import struct

        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        pos = 12
        data = None
        while pos + 8 <= len(payload):
            tag = payload[pos:pos + 4]
            (ln,) = struct.unpack_from("<I", payload, pos + 4)
            if tag == b"fmt ":
                fmt_code, n_ch, _, _, _, bits = struct.unpack_from(
                    "<HHIIHH", payload, pos + 8)
                if fmt_code != 1 or n_ch != 1 or bits != 16:
                    raise ValueError("unsupported WAV format")
            elif tag == b"data":
                data = payload[pos + 8:pos + 8 + ln]
            pos += 8 + ln + (ln & 1)
        if data is None:
            raise ValueError("WAV without data chunk")
        pcm = np.frombuffer(data, dtype="<i2")
        return pcm.astype(np.float32) / 32768.0


# --- closed-form synthetic content over real codecs -----------------------
# Pixel/sample values are simple arithmetic in the id so the DuckDB
# oracle can state the expected features in closed form; the Ray side
# must round-trip them through the REAL encoder + decoder to match.

def synth_png_media_batch(b: pa.Table) -> pa.Table:
    """doc_id batch → real-PNG media table.  pixel[y, x, c] =
    (id*7 + c*29) % 100 + y + 2x  (h ∈ {16,24,32}, w ∈ {16,24,32,40},
    max value 208 < 256 — no wrap, so means/gradients have closed
    forms)."""
    ids = [int(i) for i in b["doc_id"].to_pylist()]
    payloads, widths, heights = [], [], []
    for i in ids:
        h = 16 + (i % 3) * 8
        w = 16 + (i % 4) * 8
        y = np.arange(h, dtype=np.int32)[:, None, None]
        x = np.arange(w, dtype=np.int32)[None, :, None]
        a = np.array([(i * 7 + c * 29) % 100 for c in range(3)],
                     np.int32)[None, None, :]
        arr = (a + y + 2 * x).astype(np.uint8)
        payloads.append(encode_png(arr))
        widths.append(w)
        heights.append(h)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(["image"] * len(ids), pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "width": pa.array(widths, pa.int32()),
        "height": pa.array(heights, pa.int32()),
    })


def synth_png_video_batch(b: pa.Table) -> pa.Table:
    """doc_id batch → real length-prefixed-PNG video table.  Frame
    pixel[y, x, c] = (vid*7 + idx*13 + c*29) % 100 + y + 2x on 16×16
    frames; nf = 8 + (vid%5)*10, fps = 8 + (vid%3)*8."""
    import struct

    ids = [int(i) for i in b["doc_id"].to_pylist()]
    payloads, n_frames, fps_out = [], [], []
    y = np.arange(16, dtype=np.int32)[:, None, None]
    x = np.arange(16, dtype=np.int32)[None, :, None]
    for i in ids:
        nf = 8 + (i % 5) * 10
        chunks = []
        for idx in range(nf):
            a = np.array([(i * 7 + idx * 13 + c * 29) % 100
                          for c in range(3)], np.int32)[None, None, :]
            png = encode_png((a + y + 2 * x).astype(np.uint8))
            chunks.append(struct.pack("<I", len(png)) + png)
        payloads.append(b"".join(chunks))
        n_frames.append(nf)
        fps_out.append(float(8 + (i % 3) * 8))
    return pa.table({
        "video_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.large_binary()),
        "n_frames": pa.array(n_frames, pa.int32()),
        "fps": pa.array(fps_out, pa.float32()),
        "width": pa.array([16] * len(ids), pa.int32()),
        "height": pa.array([16] * len(ids), pa.int32()),
    })


def synth_wav_audio_batch(b: pa.Table, *, sample_rate: int = 8000,
                          n_samples: int = 8000) -> pa.Table:
    """doc_id batch → real-WAV audio table.  Square wave: period
    p = 64 + (id%7)*32, amplitude amp = 8192 + (id%5)*4096 —
    RMS = amp/32768 exactly and per-window zero crossings count
    multiples of p, both closed-form for the oracle."""
    ids = [int(i) for i in b["doc_id"].to_pylist()]
    t = np.arange(n_samples, dtype=np.int64)
    payloads = []
    for i in ids:
        p = 64 + (i % 7) * 32
        amp = 8192 + (i % 5) * 4096
        pcm = np.where((t // p) % 2 == 0, amp, -amp).astype(np.int16)
        payloads.append(encode_wav(pcm, sample_rate))
    return pa.table({
        "audio_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.large_binary()),
        "sample_rate": pa.array([sample_rate] * len(ids), pa.int32()),
        "n_samples": pa.array([n_samples] * len(ids), pa.int32()),
    })
