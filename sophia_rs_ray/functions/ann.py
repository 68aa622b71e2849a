"""Embedding similarity ops: cosine near-dup pairs + IVF-bucketed ANN.

SURVEY training-data ops: brute-force cosine is the correctness
baseline (broadcast matrix, per-batch numpy matmul); the IVF variant is
the scale path — k seeded-projection centroids assign each vector to a
bucket, probes search only the nearest buckets.  At 10^12-document
scale the broadcast matrix becomes per-bucket Parquet partitions and
the bucket assignment the shuffle key; bucket ids here are already a
pure function of the vector (deterministic, no trained state).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


class CosinePairs:
    """Actor-pool stage: batch of vectors × broadcast matrix → pairs
    (id_a < id_b) with cosine ≥ threshold.  Matrix is ray.put once,
    materialized per actor in __init__."""

    def __init__(self, matrix_ref, ids_ref, threshold: float):
        import ray

        mat = ray.get(matrix_ref) if not isinstance(matrix_ref, np.ndarray) \
            else matrix_ref
        self.ids = ray.get(ids_ref) if not isinstance(ids_ref, (list, np.ndarray)) \
            else ids_ref
        self.ids = np.asarray(self.ids)
        self.mat = _normalize(np.asarray(mat, dtype=np.float64))
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist())
        vecs = _normalize(np.array(batch["embedding"].to_pylist(),
                                   dtype=np.float64))
        sims = vecs @ self.mat.T                      # (b × N)
        out_a: List[int] = []
        out_b: List[int] = []
        out_s: List[float] = []
        rows, cols = np.nonzero(sims >= self.threshold)
        for r, c in zip(rows, cols):
            a, b = int(ids[r]), int(self.ids[c])
            if a < b:  # dedup unordered pairs + drop self
                out_a.append(a)
                out_b.append(b)
                out_s.append(round(float(sims[r, c]), 4))
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})


def cosine_near_dup(emb_ds, *, threshold: float = 0.4, concurrency=2,
                    batch_size: int = 256):
    """All pairs with cosine ≥ threshold (embedding near-duplicate
    detection).  Broadcast the full normalized matrix once (ray.put);
    each batch does one vectorized matmul against it."""
    import ray

    rows = emb_ds.take_all()
    ids = [r["vec_id"] for r in rows]
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat_ref = ray.put(mat)
    ids_ref = ray.put(ids)
    return emb_ds.map_batches(
        CosinePairs,
        fn_constructor_kwargs={"matrix_ref": mat_ref, "ids_ref": ids_ref,
                               "threshold": threshold},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


# ---------------------------------------------------------------------------
# IVF-bucketed ANN (scale path)
# ---------------------------------------------------------------------------

def projection_centroids(dim: int, k: int, seed: int = 7) -> np.ndarray:
    """Deterministic pseudo-centroids: k seeded gaussian directions.
    (A trained k-means would need a fit pass; seeded projections keep
    the bucket id a pure function of the vector — resume-safe.)"""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((k, dim))
    return _normalize(c)


def bucket_of(vecs: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    return np.argmax(_normalize(vecs) @ centroids.T, axis=1)


def ivf_topk(emb_ds, query: List[float], *, k: int = 10,
             n_buckets: int = 16, n_probe: int = 4,
             exclude_id: Optional[int] = None, seed: int = 7):
    """ANN top-k: search only the ``n_probe`` buckets nearest to the
    query.  Returns (vec_id, sim) sorted desc — approximate: recall
    measured against brute force in tests."""
    q = np.asarray(query, dtype=np.float64)
    cents = projection_centroids(len(q), n_buckets, seed)
    probe = set(np.argsort(-(_normalize(q[None, :]) @ cents.T)[0])[:n_probe]
                .tolist())
    qn = q / (np.linalg.norm(q) or 1.0)

    def score(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist())
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        buckets = bucket_of(vecs, cents)
        mask = np.isin(buckets, list(probe))
        if exclude_id is not None:
            mask &= ids != exclude_id
        ids, vecs = ids[mask], vecs[mask]
        sims = _normalize(vecs) @ qn if len(vecs) else np.array([])
        # per-batch top-k prune before the global sort (combiner)
        if len(sims) > k:
            top = np.argpartition(-sims, k)[:k]
            ids, sims = ids[top], sims[top]
        return pa.table({"vec_id": pa.array(ids.tolist(), pa.int64()),
                         "sim": pa.array([round(float(s), 4) for s in sims],
                                         pa.float64())})

    return (emb_ds.map_batches(score, batch_format="pyarrow")
            .sort(["sim", "vec_id"], descending=[True, False]).limit(k))
