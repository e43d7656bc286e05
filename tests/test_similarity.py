"""Similarity search tests: brute-force top-k vs numpy oracle; IVF recall."""

from __future__ import annotations

import numpy as np

from llm_food_ray.stages.similarity import (
    IvfAssign,
    brute_topk,
    ivf_topk,
    train_centroids,
)


def _vectors(n=200, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((4, dim)) * 3
    rows = []
    for i in range(n):
        c = centers[i % 4]
        rows.append({"vec_id": i, "embedding": (c + rng.standard_normal(dim) * 0.3).tolist()})
    return rows


def _numpy_topk(rows, q, k):
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    qn = np.asarray(q) / np.linalg.norm(q)
    scores = unit @ qn
    order = sorted(range(len(rows)), key=lambda i: (-scores[i], rows[i]["vec_id"]))
    return [rows[i]["vec_id"] for i in order[:k]], scores


def test_brute_topk_matches_numpy(ray_session):
    from helpers import dataset_from_items

    rows = _vectors()
    q = rows[0]["embedding"]
    expect_ids, _ = _numpy_topk(rows, q, 10)
    got = brute_topk(dataset_from_items(rows), q, 10).to_pandas()
    assert list(got["vec_id"]) == expect_ids
    assert got["score"].iloc[0] >= got["score"].iloc[-1]


def test_brute_topk_small_corpus(ray_session):
    from helpers import dataset_from_items

    rows = _vectors(n=5)
    got = brute_topk(dataset_from_items(rows), rows[0]["embedding"], 10).to_pandas()
    assert len(got) == 5   # k > corpus → whole corpus


def test_ivf_recall(ray_session):
    from helpers import dataset_from_items

    rows = _vectors(n=400)
    sample = np.asarray([r["embedding"] for r in rows[:200]])
    cent = train_centroids(sample, 8)
    assert cent.shape == (8, 16)
    q = rows[0]["embedding"]
    expect_ids, _ = _numpy_topk(rows, q, 10)
    ds = dataset_from_items(rows).map_batches(IvfAssign(cent), batch_format="pyarrow")
    got = ivf_topk(ds, cent, q, 10, nprobe=3, assigned=True).to_pandas()
    recall = len(set(got["vec_id"]) & set(expect_ids)) / 10
    assert recall >= 0.8     # clustered data + nprobe=3 of 8


def test_centroids_deterministic():
    sample = np.random.RandomState(0).standard_normal((100, 8))
    a = train_centroids(sample, 4)
    b = train_centroids(sample, 4)
    assert np.array_equal(a, b)
