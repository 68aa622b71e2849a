"""ANN / embedding near-dup tests: IVF recall vs brute force, pair
symmetry, bucket determinism."""

import numpy as np
import pytest

from sophia_rs_ray.functions.ann import (
    bucket_of, cosine_near_dup, ivf_topk, projection_centroids,
)
from sophia_rs_ray.functions.knn import brute_force_topk


@pytest.fixture(scope="module")
def emb_ds(ray_session, sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def test_ivf_recall_vs_brute_force(emb_ds):
    rows = emb_ds.take_all()
    q = next(r["embedding"] for r in rows if r["vec_id"] == 0)
    exact = {r["vec_id"]
             for r in brute_force_topk(emb_ds, q, k=10, exclude_id=0).take_all()}
    approx = {r["vec_id"]
              for r in ivf_topk(emb_ds, q, k=10, n_buckets=16, n_probe=8,
                                exclude_id=0).take_all()}
    assert len(approx) == 10
    # probing half the buckets should recover most of the true top-10
    assert len(exact & approx) >= 6


def test_ivf_full_probe_equals_exact(emb_ds):
    rows = emb_ds.take_all()
    q = next(r["embedding"] for r in rows if r["vec_id"] == 0)
    exact = [r["vec_id"]
             for r in brute_force_topk(emb_ds, q, k=5, exclude_id=0).take_all()]
    full = [r["vec_id"]
            for r in ivf_topk(emb_ds, q, k=5, n_buckets=8, n_probe=8,
                              exclude_id=0).take_all()]
    assert full == exact


def test_bucket_assignment_deterministic():
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 64))
    c1 = projection_centroids(64, 16)
    c2 = projection_centroids(64, 16)
    assert np.array_equal(c1, c2)
    assert np.array_equal(bucket_of(vecs, c1), bucket_of(vecs, c2))


def test_cosine_near_dup_pairs(emb_ds):
    pairs = cosine_near_dup(emb_ds, threshold=0.35).take_all()
    assert len(pairs) > 0
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        assert r["sim"] >= 0.35
    # no duplicate unordered pairs
    keys = [(r["id_a"], r["id_b"]) for r in pairs]
    assert len(keys) == len(set(keys))
