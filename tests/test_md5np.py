"""Vectorized numpy MD5 kernel: bit-parity vs hashlib (the oracle's
md5) and differential pin of the old per-row keep-masks vs the new
vectorized ones on a skewed corpus (VERDICT r4 item 6)."""

import hashlib
import random

import numpy as np
import pyarrow as pa
import pytest

from sophia_rs_ray.functions.md5np import (md5_prefix_u32_arrow,
                                           md5_prefix_u32_bytes)


def _ref(msg: bytes) -> int:
    return int(hashlib.md5(msg).hexdigest()[:8], 16)


def test_known_vectors():
    msgs = [b"", b"abc", b"message digest", b"12345", b"x" * 55,
            b"y" * 56, b"z" * 200, "café-é中".encode()]
    assert md5_prefix_u32_bytes(msgs).tolist() == [_ref(m) for m in msgs]


def test_fuzz_vs_hashlib():
    rng = random.Random(17)
    msgs = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 130)))
            for _ in range(5000)]
    assert md5_prefix_u32_bytes(msgs).tolist() == [_ref(m) for m in msgs]


def test_arrow_int_and_string_columns():
    ids = pa.chunked_array([pa.array([0, 1, 42, 2 ** 40], pa.int64()),
                            pa.array([-7, 999999], pa.int64())])
    got = md5_prefix_u32_arrow(ids).tolist()
    assert got == [_ref(str(x).encode()) for x in ids.to_pylist()]
    s = pa.array(["web", "news", None, "books", ""])
    got = md5_prefix_u32_arrow(s).tolist()
    assert got == [_ref((x or "").encode()) for x in s.to_pylist()]


@pytest.fixture()
def skew_batch():
    """Skewed corpus: one hub source holding 90 % of rows, long and
    unicode source names, doc_ids spanning small/huge/negative."""
    rng = random.Random(3)
    sources = (["hub"] * 900
               + [f"tail-{i}-é{'x' * (i % 70)}" for i in range(100)])
    rng.shuffle(sources)
    ids = [rng.randrange(-10 ** 12, 10 ** 15) for _ in sources]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "source": pa.array(sources, pa.string()),
                     "n_chars": pa.array([1] * len(ids), pa.int64())})


def test_stratified_mask_pin(skew_batch):
    """New vectorized keep-mask == the r4 per-row hashlib mask."""
    rate = md5_prefix_u32_arrow(skew_batch["source"]) % np.uint32(81) \
        + np.uint32(10)
    h = md5_prefix_u32_arrow(skew_batch["doc_id"]) % np.uint32(100)
    new_mask = (h < rate).tolist()
    old_mask = []
    for d, s in zip(skew_batch["doc_id"].to_pylist(),
                    skew_batch["source"].to_pylist()):
        r = _ref(s.encode()) % 81 + 10
        old_mask.append(_ref(str(d).encode()) % 100 < r)
    assert new_mask == old_mask


def test_mixture_mask_pin(skew_batch):
    """New vectorized mixture keep-mask == the r4 per-row form for an
    arbitrary threshold table (incl. a source missing from it)."""
    import pyarrow.compute as pc

    th = {s: (i * 137) % 1000000
          for i, s in enumerate(sorted(set(
              skew_batch["source"].to_pylist()))[:-1])}  # drop one source
    h = md5_prefix_u32_arrow(skew_batch["doc_id"]).astype(np.int64) % 1000000
    srcs = list(th)
    idx = pc.fill_null(pc.index_in(skew_batch["source"], pa.array(srcs)),
                       len(srcs))
    lut = np.array([th[s] for s in srcs] + [0], np.int64)
    new_mask = (h < lut[idx.to_numpy(zero_copy_only=False)
                        .astype(np.int64)]).tolist()
    old_mask = [(_ref(str(d).encode()) % 1000000) < th.get(s, 0)
                for d, s in zip(skew_batch["doc_id"].to_pylist(),
                                skew_batch["source"].to_pylist())]
    assert new_mask == old_mask
