"""Vectorized MD5 (numpy, single 64-byte block) for keep-mask kernels.

``stratified_sample`` / ``source_mixture`` (pipelines/queries.py) derive
their deterministic keep decisions from ``int(md5(key)[:8], 16)`` so the
DuckDB oracle is bit-exact.  hashlib forces a Python loop per row; this
module computes the same first-4-digest-bytes value for a whole Arrow
column at once with numpy uint32 arithmetic (RFC 1321 rounds, all rows
in lock-step).  Messages up to 55 bytes fit one padded block — every
doc_id / source key here qualifies; longer rows fall back to hashlib
(correctness never depends on the fast path).

Differential pin vs hashlib: tests/test_md5np.py.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# per-round left-rotate amounts and sine-derived constants (RFC 1321)
_S = np.array([7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
              + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4)
_K = np.floor(np.abs(np.sin(np.arange(1, 65, dtype=np.float64)))
              * 2.0 ** 32).astype(np.uint64).astype(np.uint32)
_A0, _B0, _C0, _D0 = (np.uint32(0x67452301), np.uint32(0xEFCDAB89),
                      np.uint32(0x98BADCFE), np.uint32(0x10325476))
_MAX_ONE_BLOCK = 55  # longest message whose padding fits one block


def _rounds(m: np.ndarray) -> np.ndarray:
    """MD5 compression over (N, 16) uint32 LE word rows → the first
    digest word per row (the value of ``hexdigest()[:8]`` big-endian)."""
    n = m.shape[0]
    a = np.full(n, _A0, np.uint32)
    b = np.full(n, _B0, np.uint32)
    c = np.full(n, _C0, np.uint32)
    d = np.full(n, _D0, np.uint32)
    for i in range(64):
        if i < 16:
            f = (b & c) | (~b & d)
            g = i
        elif i < 32:
            f = (d & b) | (~d & c)
            g = (5 * i + 1) % 16
        elif i < 48:
            f = b ^ c ^ d
            g = (3 * i + 5) % 16
        else:
            f = c ^ (b | ~d)
            g = (7 * i) % 16
        x = (a + f + _K[i] + m[:, g]).astype(np.uint32, copy=False)
        s = int(_S[i])
        rot = ((x << np.uint32(s)) | (x >> np.uint32(32 - s))) \
            .astype(np.uint32, copy=False)
        a, d, c, b = d, c, b, (b + rot).astype(np.uint32, copy=False)
    # hexdigest()[:8] reads the first digest word's LE bytes big-endian
    return (a + _A0).astype(np.uint32, copy=False).byteswap()


def md5_prefix_u32_from_buffer(data: np.ndarray, starts: np.ndarray,
                               lens: np.ndarray) -> np.ndarray:
    """``int(md5(msg).hexdigest()[:8], 16)`` for each message
    ``data[starts[i]:starts[i]+lens[i]]`` — one vectorized pass for all
    single-block rows, hashlib for the rare >55-byte stragglers."""
    n = len(lens)
    out = np.zeros(n, np.uint32)
    if n == 0:
        return out
    lens = lens.astype(np.int64, copy=False)
    starts = starts.astype(np.int64, copy=False)
    fast = lens <= _MAX_ONE_BLOCK
    idx = np.nonzero(fast)[0]
    if len(idx):
        fl = lens[idx]
        buf = np.zeros((len(idx), 64), np.uint8)
        row = np.repeat(np.arange(len(idx)), fl)
        col = np.arange(int(fl.sum())) - np.repeat(
            np.concatenate(([0], np.cumsum(fl)[:-1])), fl)
        src = np.concatenate(([0], np.cumsum(fl)[:-1]))
        abspos = np.repeat(starts[idx] - src, fl) + np.arange(int(fl.sum()))
        buf[row, col] = data[abspos]
        buf[np.arange(len(idx)), fl] = 0x80
        buf[:, 56:64] = (fl.astype(np.uint64) * 8)[:, None] \
            .astype("<u8").view(np.uint8).reshape(len(idx), 8)
        out[idx] = _rounds(np.ascontiguousarray(buf).view("<u4")
                           .reshape(len(idx), 16))
    for i in np.nonzero(~fast)[0]:
        msg = data[starts[i]:starts[i] + lens[i]].tobytes()
        out[i] = int(hashlib.md5(msg).hexdigest()[:8], 16)
    return out


def md5_prefix_u32_arrow(arr) -> np.ndarray:
    """Vectorized ``int(md5(str(x)).hexdigest()[:8], 16)`` over a
    pyarrow column (cast to utf8 first — matches DuckDB's
    ``md5(CAST(x AS VARCHAR))``).  Nulls hash as the empty string."""
    a = pc.cast(arr, pa.large_string()) if not pa.types.is_large_string(
        getattr(arr, "type", pa.null())) else arr
    a = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    a = pc.fill_null(a, "")
    if len(a) == 0:
        return np.zeros(0, np.uint32)
    offs = np.frombuffer(a.buffers()[1], np.int64)[
        a.offset:a.offset + len(a) + 1]
    data = np.frombuffer(a.buffers()[2], np.uint8) if a.buffers()[2] \
        else np.zeros(0, np.uint8)
    return md5_prefix_u32_from_buffer(data, offs[:-1], offs[1:] - offs[:-1])


def md5_prefix_u32_bytes(msgs: Sequence[bytes]) -> np.ndarray:
    """Convenience wrapper over a Python list of byte strings."""
    if not msgs:
        return np.zeros(0, np.uint32)
    lens = np.array([len(m) for m in msgs], np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    data = np.frombuffer(b"".join(msgs), np.uint8)
    return md5_prefix_u32_from_buffer(data, starts, lens)
