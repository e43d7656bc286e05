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


def test_ivf_partitioned_index_roundtrip(ray_session, tmp_path):
    """Persisted IVF index: cluster-partitioned parquet + centroid
    sidecar; querying reads only the probed partitions and recalls the
    brute-force top-k when probing all clusters."""
    import os

    import numpy as np
    import ray.data as rd

    from llm_food_ray.stages.similarity import (
        brute_topk, ivf_query_index, ivf_write_index, train_centroids)

    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((400, 16))
    items = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(400)]
    import pyarrow as pa
    ds = rd.from_arrow(pa.Table.from_pylist(items))
    cent = train_centroids(vecs[:128], 8)
    out = str(tmp_path / "ivf")
    ivf_write_index(ds, cent, out)
    # layout: one dir per non-empty cluster + sidecar
    dirs = [d for d in os.listdir(out) if d.startswith("ivf_cluster=")]
    assert len(dirs) >= 2
    assert os.path.exists(os.path.join(out, "centroids.parquet"))

    q = vecs[7]
    exact = brute_topk(ds, q, 5).to_pandas()
    # probing every cluster must reproduce brute force exactly
    full = ivf_query_index(out, q, 5, nprobe=8).to_pandas()
    assert list(full["vec_id"]) == list(exact["vec_id"])
    # low-probe query returns k rows and includes the query's own vector
    approx = ivf_query_index(out, q, 5, nprobe=2).to_pandas()
    assert len(approx) == 5
    assert 7 in set(approx["vec_id"])


def test_seed_assign(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.similarity import SeedAssign, strided_seed_vectors

    rng = np.random.RandomState(3)
    vecs = rng.randn(120, 16).astype(np.float32)
    vecs[5] = 0.0  # zero vector: sim 0 everywhere, smallest seed wins
    items = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(120)]
    ds = rd.from_arrow(pa.Table.from_pylist(items))

    seed_ids, seeds = strided_seed_vectors(ds, modulus=30, k=4)
    assert list(seed_ids) == [0, 30, 60, 90]
    out = (ds.map_batches(SeedAssign(seed_ids, seeds), batch_format="pyarrow")
             .to_pandas().set_index("vec_id").sort_index())
    assert len(out) == 120
    # each seed maps to itself with sim 1
    for s in seed_ids:
        assert out.loc[s, "cluster_id"] == s
        assert out.loc[s, "sim"] == 1.0
    # zero vector ties across all seeds -> smallest seed id wins
    assert out.loc[5, "cluster_id"] == 0 and out.loc[5, "sim"] == 0.0
    # agreement with a numpy brute-force argmax
    m = vecs.astype(np.float64)
    sn = np.linalg.norm(m[[0, 30, 60, 90]], axis=1)
    vn = np.linalg.norm(m, axis=1); vn[vn == 0] = 1.0
    sims = (m @ m[[0, 30, 60, 90]].T) / (vn[:, None] * sn[None, :])
    expect = np.array([0, 30, 60, 90])[sims.argmax(1)]
    assert (out["cluster_id"].to_numpy() == expect).all()


def test_kmeans_fit_matches_local_lloyd(ray_session):
    """The distributed per-block partial-sum plan reproduces a local
    single-process Lloyd run with the same seeds and rounding."""
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.similarity import (_kmeans_assign,
                                                _round_rows, kmeans_fit)

    rng = np.random.RandomState(7)
    vecs = rng.rand(90, 6)
    items = [{"vec_id": i, "embedding": list(map(float, v))}
             for i, v in enumerate(vecs)]
    ds = rd.from_arrow(pa.Table.from_pylist(items)).repartition(5)

    out = (kmeans_fit(ds, k=3, iters=2, modulus=40)
           .to_pandas().sort_values("vec_id"))
    assert len(out) == 90

    # local reference: same seeds (vec_id % 40 == 0 -> 0, 40, 80)
    m = vecs.astype(np.float64)
    cent = _round_rows(m[[0, 40, 80]], 9)
    for _ in range(2):
        a = _kmeans_assign(m, cent, 9)
        new = cent.copy()
        for c in range(3):
            if (a == c).any():
                s = _round_rows(m[a == c].sum(0)[None, :], 9)
                new[c] = _round_rows(s / (a == c).sum(), 9)[0]
        cent = new
    expect = _kmeans_assign(m, cent, 9)
    assert (out["cluster"].to_numpy() == expect).all()
    assert len(set(expect)) > 1   # the test corpus actually clusters


def test_embedding_moments_and_pca(ray_session):
    """Distributed moments equal the local ones (same round pins);
    PCA projections are variance-ordered, centered, and reproduce the
    local eigen-projection."""
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.similarity import (embedding_moments,
                                                pca_project)

    rng = np.random.RandomState(11)
    base = rng.rand(200, 2) @ np.array([[3.0, 0.5, 0.1, 0.0],
                                        [0.0, 1.0, 0.2, 0.05]])
    vecs = base + 0.01 * rng.rand(200, 4)
    items = [{"vec_id": i, "embedding": list(map(float, v))}
             for i, v in enumerate(vecs)]
    ds = rd.from_arrow(pa.Table.from_pylist(items)).repartition(7)

    n, mean, cov = embedding_moments(ds)
    assert n == 200
    m = vecs.astype(np.float64)
    s1 = np.array([round(float(x), 9) for x in m.sum(0)])
    s2 = np.array([round(float(x), 9) for x in (m.T @ m).ravel()])
    s2 = s2.reshape(4, 4)
    exp_cov = np.array([[round(float(x), 6) for x in row]
                        for row in (s2 - np.outer(s1, s1) / n) / n])
    assert np.array_equal(cov, exp_cov)
    assert np.allclose(cov, cov.T)

    out = (pca_project(ds, k=2).to_pandas().sort_values("vec_id"))
    proj = np.array(out["pc"].tolist())
    assert proj.shape == (200, 2)
    # component variances come out in descending order and centered
    assert proj[:, 0].var() >= proj[:, 1].var()
    assert abs(proj.mean(0)).max() < 1e-3
    # captures nearly all variance of this rank-2-ish corpus
    assert proj.var(0).sum() > 0.95 * np.trace(cov)


def test_embedding_quantize_extremes_and_constant_dim(ray_session):
    """Global per-dim extrema map to code 0 / levels-1; a constant
    dimension codes to 0 everywhere; all codes in range; row order and
    vector length preserved."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.similarity import embedding_quantize

    rng = np.random.default_rng(7)
    n, d = 200, 5
    mat = rng.normal(size=(n, d)).astype(np.float32)
    mat[:, 3] = 2.5                      # constant dim
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in mat],
                              pa.list_(pa.float32())),
    })
    out = (embedding_quantize(rd.from_arrow(t).repartition(4),
                              "embedding", "vec_id", levels=256)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    codes = np.stack(out["codes"].to_numpy())
    assert codes.shape == (n, d) and codes.dtype == np.uint8
    assert (codes[:, 3] == 0).all()
    f64 = mat.astype(np.float64)
    for j in (0, 1, 2, 4):
        assert codes[np.argmin(f64[:, j]), j] == 0
        assert codes[np.argmax(f64[:, j]), j] == 255


def test_quantized_topk_recall_and_ties(ray_session):
    """Asymmetric SQ ANN: at 8-bit the top-10 should largely agree with
    exact brute force on smooth data; exact duplicate vectors quantize
    identically and tie-break by ascending key."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.similarity import brute_topk, quantized_topk

    rng = np.random.default_rng(11)
    n, d = 300, 16
    mat = rng.normal(size=(n, d)).astype(np.float32)
    mat[7] = mat[3]          # duplicate pair: 3 and 7 must tie
    q = mat[3].astype(np.float64)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in mat],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t).repartition(4)
    qt = (quantized_topk(ds, q, 10).to_pandas()
          .reset_index(drop=True))
    ex = brute_topk(ds, q, 10).to_pandas()
    # duplicates rank 1-2 in key order with equal scores
    assert qt["vec_id"].tolist()[:2] == [3, 7]
    assert qt["score"][0] == qt["score"][1]
    assert (qt["score"].diff().dropna() <= 0).all()
    overlap = len(set(qt["vec_id"]) & set(ex["vec_id"]))
    assert overlap >= 8, overlap


# ------------------------------------------------------------- SemDedup ----


def _semdedup_ds(vecs, ids=None):
    import ray.data as rd

    ids = ids if ids is not None else list(range(len(vecs)))
    return rd.from_items([
        {"vec_id": i, "embedding": [float(x) for x in v]}
        for i, v in zip(ids, vecs)])


def test_semdedup_drops_exact_duplicates_keeps_lowest_key(ray_session):
    import numpy as np

    from llm_food_ray.stages.similarity import semdedup

    rng = np.random.RandomState(3)
    base = rng.randn(40, 8)
    vecs = list(base) + [base[4], base[11], base[4]]  # dup ids 40,41,42
    out = semdedup(_semdedup_ds(vecs), k=4, iters=2, modulus=5, tau=0.95)
    kept = sorted(r["vec_id"] for r in out.take_all())
    assert 4 in kept and 11 in kept
    assert 40 not in kept and 41 not in kept and 42 not in kept
    assert len(kept) == 40  # random gaussians never clear tau=0.95


def test_semdedup_matches_brute_force_dominance(ray_session):
    import numpy as np

    from llm_food_ray.stages.similarity import (
        _kmeans_assign, _unit, kmeans_centroids, semdedup)

    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 6)
    vecs[17] = vecs[3] + 0.01 * rng.randn(6)   # near-dup pair
    vecs[44] = vecs[20] + 0.005 * rng.randn(6)
    ds = _semdedup_ds(vecs)
    tau = 0.9
    got = sorted(r["vec_id"] for r in
                 semdedup(ds, k=4, iters=2, modulus=7, tau=tau).take_all())

    cent = kmeans_centroids(ds, k=4, iters=2, modulus=7)
    a = _kmeans_assign(np.asarray(vecs, np.float64), cent, 9)
    u = _unit(np.asarray(vecs, np.float64))
    sims = np.round(u @ u.T, 4)
    want = [v for v in range(60)
            if not any(a[x] == a[v] and sims[x, v] >= tau
                       for x in range(v))]
    assert got == want
    assert 17 not in got or a[17] != a[3]  # same cluster -> dropped


def test_semdedup_cross_cluster_pairs_survive(ray_session):
    """Two identical vectors forced into different clusters must BOTH
    survive — SemDedup only prunes within a cluster."""
    import numpy as np

    from llm_food_ray.stages.similarity import (
        _kmeans_assign, kmeans_centroids, semdedup)

    # two tight, well-separated blobs; seeds (modulus=2 -> ids 0,2) land
    # one per blob, so the blobs are the clusters
    blob_a = [[10.0, 0.0], [10.1, 0.05], [9.9, -0.05]]
    blob_b = [[-10.0, 0.0], [-10.1, 0.05], [-9.9, -0.05]]
    vecs = [blob_a[0], blob_a[1], blob_b[0], blob_b[1], blob_a[2], blob_b[2]]
    ds = _semdedup_ds(vecs)
    cent = kmeans_centroids(ds, k=2, iters=2, modulus=2)
    a = _kmeans_assign(np.asarray(vecs, np.float64), cent, 9)
    assert a[0] != a[2]  # blobs really are distinct clusters
    kept = sorted(r["vec_id"] for r in
                  semdedup(ds, k=2, iters=2, modulus=2, tau=0.99).take_all())
    # within each blob all vectors are ~parallel (cos>0.99): one
    # survivor per blob, the lowest key
    assert kept == [0, 2]


def test_random_project_preserves_distances_roughly(ray_session):
    """JL guarantee sanity: relative pairwise-distance distortion stays
    bounded for a 64->16 projection, and the map is deterministic."""
    import numpy as np

    import ray.data as rd

    from llm_food_ray.stages.similarity import random_project

    rng = np.random.RandomState(5)
    vecs = rng.randn(80, 64)
    ds = rd.from_items([{"vec_id": i, "embedding": [float(x) for x in v]}
                        for i, v in enumerate(vecs)])
    out = {r["vec_id"]: np.array(r["proj"])
           for r in random_project(ds, out_dim=16).take_all()}
    assert all(len(v) == 16 for v in out.values())
    proj = np.vstack([out[i] for i in range(80)])
    d_orig = np.linalg.norm(vecs[:1] - vecs[1:], axis=1)
    d_proj = np.linalg.norm(proj[:1] - proj[1:], axis=1)
    ratio = d_proj / d_orig
    assert 0.4 < ratio.min() and ratio.max() < 2.0
    assert abs(float(np.median(ratio)) - 1.0) < 0.25
    # deterministic across runs
    out2 = {r["vec_id"]: np.array(r["proj"])
            for r in random_project(ds, out_dim=16).take_all()}
    assert all(np.array_equal(out[i], out2[i]) for i in out)


def test_random_project_matches_manual_sign_matrix(ray_session):
    import numpy as np

    import ray.data as rd

    from llm_food_ray.functions.hashing import md5_hex
    from llm_food_ray.stages.similarity import random_project

    vecs = np.arange(12, dtype=np.float64).reshape(3, 4)
    ds = rd.from_items([{"vec_id": i, "embedding": [float(x) for x in v]}
                        for i, v in enumerate(vecs)])
    out = {r["vec_id"]: r["proj"]
           for r in random_project(ds, out_dim=4).take_all()}
    signs = np.array([[1.0 if int(md5_hex(f"jl:{i}:{j}")[:2], 16) % 2 == 0
                       else -1.0 for j in range(4)] for i in range(4)])
    want = np.round(vecs @ signs / 2.0, 6)
    for i in range(3):
        assert out[i] == list(want[i])


def test_embedding_outliers_flags_planted_outlier(ray_session):
    """Two tight, well-separated blobs; one point pushed off its blob:
    its z dominates and it is flagged, the blob cores are not."""
    import numpy as np

    from llm_food_ray.stages.similarity import embedding_outliers

    rng = np.random.RandomState(21)
    vecs = np.vstack([rng.randn(60, 6) * 0.3 + 20.0,
                      rng.randn(60, 6) * 0.3 - 20.0])
    vecs[42] = vecs[42] + 5.0  # off its blob, nowhere near the other
    out = embedding_outliers(_semdedup_ds(vecs), k=2, iters=2, modulus=60,
                             z_threshold=2.0).take_all()
    flagged = {r["vec_id"] for r in out}
    assert 42 in flagged
    assert all(r["z"] >= 2.0 for r in out)
    assert len(flagged) < 12


def test_embedding_outliers_matches_local_replica(ray_session):
    import numpy as np

    from llm_food_ray.stages.similarity import (
        _kmeans_assign, embedding_outliers, kmeans_centroids)

    rng = np.random.RandomState(22)
    vecs = rng.randn(150, 5)
    ds = _semdedup_ds(vecs)
    got = sorted((r["vec_id"], r["cluster"], r["z"]) for r in
                 embedding_outliers(ds, k=4, iters=2, modulus=7,
                                    z_threshold=1.0).take_all())

    cent = kmeans_centroids(ds, k=4, iters=2, modulus=7)
    m = np.asarray(vecs, np.float64)
    d2 = np.round(((m * m).sum(1)[:, None] - 2.0 * (m @ cent.T)
                   + (cent * cent).sum(1)[None, :]), 9)
    a = d2.argmin(1)
    d = d2[np.arange(len(a)), a]
    want = []
    for c in range(len(cent)):
        mask = a == c
        if not mask.any():
            continue
        dc = d[mask]
        mu = round(float(dc.sum() / len(dc)), 6)
        ex2 = round(float((dc * dc).sum() / len(dc)), 6)
        sig = np.sqrt(max(ex2 - mu * mu, 0.0))
        if sig <= 0:
            continue
        for i in np.flatnonzero(mask):
            z = round(float((d[i] - mu) / sig), 6)
            if z >= 1.0:
                want.append((i, c, z))
    assert got == sorted(want) and len(got) > 5


def test_diverse_sample_covers_every_cluster(ray_session):
    import numpy as np

    from llm_food_ray.stages.similarity import (
        _kmeans_assign, kmeans_centroids, diverse_sample)

    rng = np.random.RandomState(31)
    # two well-separated blobs
    vecs = np.vstack([rng.randn(60, 4) + 20.0, rng.randn(60, 4) - 20.0])
    ds = _semdedup_ds(vecs)
    out = diverse_sample(ds, n_per_cluster=5, k=2, iters=2, modulus=2)
    rows = out.take_all()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r["vec_id"])
    assert len(rows) == 10 and len(by_cluster) == 2
    assert all(len(v) == 5 for v in by_cluster.values())
    # deterministic: the md5-smallest keys per cluster
    from llm_food_ray.functions.hashing import md5_hex

    cent = kmeans_centroids(ds, k=2, iters=2, modulus=2)
    a = _kmeans_assign(np.asarray(vecs, np.float64), cent, 9)
    for c, members in by_cluster.items():
        want = sorted((i for i in range(120) if a[i] == c),
                      key=lambda i: (md5_hex(str(i)), i))[:5]
        assert sorted(members) == sorted(want)


def test_hard_negatives_same_cluster_argmin(ray_session):
    import numpy as np

    from llm_food_ray.stages.similarity import (
        _kmeans_assign, _unit, hard_negatives, kmeans_centroids)

    rng = np.random.RandomState(17)
    vecs = rng.randn(80, 6)
    ds = _semdedup_ds(vecs)
    got = {r["vec_id"]: (r["neg_key"], r["cos"]) for r in
           hard_negatives(ds, k=4, iters=2, modulus=7).take_all()}

    cent = kmeans_centroids(ds, k=4, iters=2, modulus=7)
    m = np.asarray(vecs, np.float64)
    a = _kmeans_assign(m, cent, 9)
    u = _unit(m)
    sims = np.round(u @ u.T, 4)
    for v in range(80):
        members = [x for x in range(80) if a[x] == a[v] and x != v]
        if not members:
            assert v not in got
            continue
        best = min(members, key=lambda x: (sims[v, x], x))
        assert got[v] == (best, sims[v, best]), v


def test_bitext_mine_hand_graph(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.similarity import bitext_mine

    # a0 <-> b1 aligned (identical direction), a2's best is b1 but b1
    # prefers a0 -> not mutual; b3 points away from everyone
    vecs = {
        0: [1.0, 0.0, 0.0],   # side A
        2: [0.8, 0.6, 0.0],   # side A
        1: [1.0, 0.0, 0.0],   # side B: equals a0
        3: [0.0, 0.0, 1.0],   # side B: orthogonal
    }
    rows = [{"vec_id": k, "embedding": np.asarray(v, np.float32)}
            for k, v in vecs.items()]
    ds = dataset_from_items(rows)
    import pyarrow.compute as pc

    a = ds.map_batches(lambda b: b.filter(
        pc.equal(pc.bit_wise_and(b.column("vec_id"), 1), 0)),
        batch_format="pyarrow")
    b = ds.map_batches(lambda t: t.filter(
        pc.equal(pc.bit_wise_and(t.column("vec_id"), 1), 1)),
        batch_format="pyarrow")
    out = bitext_mine(a, b, k=2, min_margin=0.0).to_pandas()
    got = {(int(r.a), int(r.b)): (r.cos, r.margin)
           for r in out.itertuples()}
    # mutual top-1 pairs: (0,1) cos 1.0; (2,1) is NOT mutual (b1's
    # best is a0 by smallest-id tiebreak at equal cosine? no — cos(b1,
    # a0)=1.0 > cos(b1, a2)=0.8, so b1 -> a0); b3's best is a0 or a2
    # but no a picks b3 first
    assert set(got) == {(0, 1)}
    cos, margin = got[(0, 1)]
    assert cos == 1.0
    # top-2 sums: a0: cos(b1)=1.0 + cos(b3)=0.0 -> 10000;
    # b1: cos(a0)=1.0 + cos(a2)=0.8 -> 18000;
    # margin = 2*2*10000*10000 / 28000 = 14285.71... -> 1.4286
    assert margin == 1.4286


def test_bitext_mine_batch_size_invariant(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.similarity import bitext_mine

    rng = np.random.RandomState(11)
    rows = [{"vec_id": i,
             "embedding": rng.randn(8).astype(np.float32)}
            for i in range(60)]
    import pyarrow.compute as pc

    def mk(par, ds):
        return ds.map_batches(lambda b, p=par: b.filter(
            pc.equal(pc.bit_wise_and(b.column("vec_id"), 1), p)),
            batch_format="pyarrow")

    ds1 = dataset_from_items(rows)
    ds2 = dataset_from_items(rows).repartition(13)
    r1 = (bitext_mine(mk(0, ds1), mk(1, ds1), k=3, min_margin=0.9)
          .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    r2 = (bitext_mine(mk(0, ds2), mk(1, ds2), k=3, min_margin=0.9)
          .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    assert len(r1) > 0
    assert r1.equals(r2)


def test_silhouette_summary_matches_naive(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.similarity import (kmeans_centroids,
                                                silhouette_summary,
                                                vectors_to_matrix)

    rows = _vectors(n=240, dim=8, seed=12)
    ds = dataset_from_items(rows)
    out = (silhouette_summary(ds, k=4, iters=2, modulus=7)
           .to_pandas().set_index("cluster").sort_index())

    cent = kmeans_centroids(dataset_from_items(rows), k=4, iters=2,
                            modulus=7)
    mat = np.asarray([r["embedding"] for r in rows], np.float64)
    d2 = ((mat * mat).sum(1)[:, None] - 2.0 * (mat @ cent.T)
          + (cent * cent).sum(1)[None, :])
    d2r = np.round(d2, 9)
    assign = d2r.argmin(1)
    a2 = d2r[np.arange(len(mat)), assign].copy()
    d2r[np.arange(len(mat)), assign] = np.inf
    b2 = d2r.min(1)
    maxab = np.maximum(a2, b2)
    s = np.where(maxab > 0, (b2 - a2) / maxab, 0.0)
    sm = np.floor(s * 1_000_000 + 0.5).astype(np.int64)
    for c in out.index:
        sel = assign == c
        assert out.loc[c, "n"] == int(sel.sum())
        assert out.loc[c, "s_sum"] == int(sm[sel].sum())
        assert out.loc[c, "mean_sil"] == sm[sel].sum() / (sel.sum() * 1e6)
    assert out["n"].sum() == len(rows)


def test_silhouette_tight_clusters_near_one(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.similarity import silhouette_summary

    # two far-apart tight blobs -> mean silhouette close to 1
    rng = np.random.RandomState(0)
    rows = []
    for i in range(100):
        c = np.zeros(4) if i % 2 == 0 else np.full(4, 100.0)
        rows.append({"vec_id": i,
                     "embedding": (c + rng.standard_normal(4) * .01)
                     .tolist()})
    out = (silhouette_summary(dataset_from_items(rows), k=2, iters=2,
                              modulus=2).to_pandas())
    assert (out["mean_sil"] > 0.99).all()
    with np.testing.assert_raises(ValueError):
        silhouette_summary(dataset_from_items(rows), k=1)


def test_knn_graph_matches_numpy(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.similarity import knn_graph

    rows = _vectors(n=60)
    ds = rd.from_arrow(pa.Table.from_pylist(
        [{"vec_id": r["vec_id"], "embedding": r["embedding"]}
         for r in rows])).repartition(4)
    got = knn_graph(ds, k=5).to_pandas()
    # every source has exactly k edges, none to itself
    assert (got.groupby("src").size() == 5).all()
    assert set(got["src"]) == {r["vec_id"] for r in rows}
    assert (got["src"] != got["dst"]).all()
    # spot-check sources against the full numpy rank
    mat = np.asarray([r["embedding"] for r in rows], np.float64)
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    scores = unit @ unit.T
    for src in (0, 7, 59):
        order = sorted((i for i in range(len(rows)) if i != src),
                       key=lambda i: (-scores[src, i], i))[:5]
        sub = got[got["src"] == src].sort_values(
            ["score", "dst"], ascending=[False, True])
        assert sub["dst"].tolist() == order


def test_knn_graph_small_corpus_fewer_than_k(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.similarity import knn_graph

    rows = _vectors(n=3)
    got = knn_graph(dataset_from_items(
        [{"vec_id": r["vec_id"], "embedding": r["embedding"]}
         for r in rows]), k=5).to_pandas()
    # only 2 non-self neighbours exist per source
    assert (got.groupby("src").size() == 2).all()
