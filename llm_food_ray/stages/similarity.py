"""Similarity search over an embedding column (``list<float>``).

- Brute-force cosine top-k: the baseline — each ``map_batches`` task
  computes scores against a broadcast query matrix (numpy matmul), emits
  its per-batch top-k, and a tiny global sort+limit finishes. The query
  vectors are shipped once via the task closure/``ray.put``, never
  per-batch.
- IVF variant (the scale path): deterministic k-means centroids trained
  on a driver-side sample, broadcast; an assign stage adds a cluster id;
  a query probes the ``nprobe`` nearest centroids and brute-forces only
  those partitions. At cluster scale the assignment column doubles as
  the partition key for the vector Parquet layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def vectors_to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix without a Python-object
    hop: flatten the Arrow list buffer (zero-copy) and reshape.  Requires
    uniform vector length (validated)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = np.asarray(col.flatten(), dtype=np.float64)
    if n and flat.size % n:
        raise ValueError("ragged embedding column")
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


class BruteForceTopK:
    """Per-batch cosine top-k against a fixed query vector."""

    def __init__(self, query_vec, k: int, key_column: str = "vec_id",
                 vec_column: str = "embedding"):
        q = np.asarray(query_vec, dtype=np.float64)
        self.q = q / (np.linalg.norm(q) or 1.0)
        self.k = k
        self.key_column = key_column
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch.column(self.key_column).to_pylist())
        mat = vectors_to_matrix(batch.column(self.vec_column))
        scores = _unit(mat) @ self.q
        if len(keys) > self.k:
            idx = np.argpartition(-scores, self.k)[: self.k]
        else:
            idx = np.arange(len(keys))
        return pa.Table.from_arrays(
            [pa.array(keys[idx].tolist()), pa.array(scores[idx], pa.float64())],
            names=[self.key_column, "score"],
        )


def brute_topk(ds, query_vec, k: int, *, key_column: str = "vec_id",
               vec_column: str = "embedding"):
    """→ Dataset of exactly k rows (key, score), highest cosine first.

    Per-batch top-k prunes before the global sort, so the sort input is
    ~k × num_blocks rows, not the corpus."""
    candidates = ds.map_batches(
        BruteForceTopK(query_vec, k, key_column, vec_column),
        batch_format="pyarrow",
    )
    return candidates.sort(["score", key_column], descending=[True, False]).limit(k)


class SeedAssign:
    """Nearest-seed cosine assignment against a FIXED seed matrix — the
    oracle-checkable cousin of :class:`IvfAssign` (which uses trained
    k-means centroids and euclidean distance): seeds are existing corpus
    vectors picked by a deterministic key rule, so ANSI SQL can rebuild
    the exact same assignment with ``list_cosine_similarity``.

    Scale shape: the seed matrix is k-sized, shipped once in the task
    closure (Ray serializes it with the callable; at cluster scale wrap
    in ``ray.put`` + actor pool); each batch is one (n×d)·(d×k) matmul.
    Cosine is computed DuckDB-style (dot / (|a|·|b|), float64) so the
    two sides round identically; ties break toward the smallest seed id
    (numpy argmax first-hit over seed-id-sorted columns == SQL
    ``ORDER BY sim DESC, seed_id``).  Zero vectors get sim 0 against
    every seed (guarded norms), keeping the argmax deterministic.
    """

    def __init__(self, seed_ids, seed_vecs, key_column: str = "vec_id",
                 vec_column: str = "embedding", digits: int = 4):
        order = np.argsort(np.asarray(seed_ids, dtype=np.int64))
        self.seed_ids = np.asarray(seed_ids, dtype=np.int64)[order]
        seeds = np.asarray(seed_vecs, dtype=np.float64)[order]
        self.seeds = seeds
        norms = np.linalg.norm(seeds, axis=1)
        norms[norms == 0] = 1.0
        self.seed_norms = norms
        self.key_column = key_column
        self.vec_column = vec_column
        self.digits = digits

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = vectors_to_matrix(batch.column(self.vec_column))
        vnorms = np.linalg.norm(mat, axis=1)
        vnorms[vnorms == 0] = 1.0
        sims = (mat @ self.seeds.T) / (vnorms[:, None] * self.seed_norms[None, :])
        best = sims.argmax(1)
        rows = np.arange(len(best))
        return pa.table({
            self.key_column: batch.column(self.key_column),
            "cluster_id": pa.array(self.seed_ids[best], pa.int64()),
            "sim": pa.array(np.round(sims[rows, best], self.digits),
                            pa.float64()),
        })


def strided_seed_vectors(ds, *, modulus: int, k: int,
                         key_column: str = "vec_id",
                         vec_column: str = "embedding"):
    """Deterministic seed pick: the ``k`` smallest keys with
    ``key % modulus == 0``.  The filter streams (no full materialize);
    only the ~corpus/modulus matching rows reach the driver, and the
    final sort+head is k-sized.  Returns (seed_ids, seed_matrix)."""
    matches = ds.map_batches(
        lambda b: b.filter(
            pa.array(np.asarray(b.column(key_column)) % modulus == 0)),
        batch_format="pyarrow",
    ).to_pandas()
    matches = matches.sort_values(key_column).head(k)
    return (matches[key_column].to_numpy(),
            np.asarray(matches[vec_column].tolist(), dtype=np.float64))


# ----------------------------------------------------------------- IVF ----


def train_centroids(sample: np.ndarray, n_clusters: int, *, iters: int = 10,
                    seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample (numpy only)."""
    rng = np.random.RandomState(seed)
    sample = np.asarray(sample, dtype=np.float64)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cent = sample[np.sort(idx)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(0)
    return cent


class IvfAssign:
    """Adds the nearest-centroid id (the IVF partition key)."""

    def __init__(self, centroids: np.ndarray, vec_column: str = "embedding"):
        self.centroids = np.asarray(centroids, dtype=np.float64)
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = vectors_to_matrix(batch.column(self.vec_column))
        # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c drops ||x||²
        d = -2.0 * (mat @ self.centroids.T) + (self.centroids ** 2).sum(-1)[None, :]
        return batch.append_column("ivf_cluster", pa.array(d.argmin(1), pa.int32()))


def ivf_write_index(ds, centroids: np.ndarray, out_dir: str, *,
                    vec_column: str = "embedding") -> None:
    """Persist the IVF index as cluster-partitioned Parquet: one
    ``ivf_cluster=<c>/`` directory per partition plus a centroids sidecar.
    Queries then read ONLY the probed partitions — pruning at the I/O
    layer, which is what makes IVF the scale path (a brute-force scan
    reads the whole corpus per query; this reads nprobe/n_clusters of
    it)."""
    import os

    import pyarrow.parquet as pq

    assigned = ds.map_batches(IvfAssign(centroids, vec_column),
                              batch_format="pyarrow")
    assigned.write_parquet(out_dir, partition_cols=["ivf_cluster"])
    cent = np.asarray(centroids, dtype=np.float64)
    pq.write_table(
        pa.table({"cluster": np.arange(len(cent)),
                  "centroid": list(cent)}),
        os.path.join(out_dir, "centroids.parquet"),
    )


def ivf_query_index(out_dir: str, query_vec, k: int, *, nprobe: int = 4,
                    key_column: str = "vec_id", vec_column: str = "embedding"):
    """Query a persisted IVF index: load the centroid sidecar, pick the
    ``nprobe`` nearest NON-EMPTY partitions (k-means can leave clusters
    with no members — empty directories don't count against nprobe), and
    read only those directories."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    cent_tbl = pq.read_table(os.path.join(out_dir, "centroids.parquet"))
    order = np.argsort(cent_tbl.column("cluster").to_numpy())
    cent = np.asarray(cent_tbl.column("centroid").to_pylist(),
                      dtype=np.float64)[order]
    q = np.asarray(query_vec, dtype=np.float64)
    cd = ((cent - q[None, :]) ** 2).sum(-1)
    paths: list[str] = []
    probed = 0
    for c in np.argsort(cd):
        d = os.path.join(out_dir, f"ivf_cluster={int(c)}")
        files = ([os.path.join(d, f) for f in sorted(os.listdir(d))
                  if f.endswith(".parquet")] if os.path.isdir(d) else [])
        if files:
            paths.extend(files)
            probed += 1
            if probed >= nprobe:
                break
    if not paths:   # index with zero data files → empty result, not a crash
        return rd.from_arrow(pa.table({key_column: pa.array([], pa.int64()),
                                       "score": pa.array([], pa.float64())}))
    ds = rd.read_parquet(paths, columns=[key_column, vec_column])
    return brute_topk(ds, query_vec, k, key_column=key_column,
                      vec_column=vec_column)


def ivf_topk(ds, centroids: np.ndarray, query_vec, k: int, *, nprobe: int = 4,
             key_column: str = "vec_id", vec_column: str = "embedding",
             assigned: bool = False):
    """Approximate top-k: probe the `nprobe` nearest IVF partitions only.

    `assigned=True` when `ds` already carries ``ivf_cluster`` (the usual
    case — assignment is done once at ingest and persisted)."""
    import pyarrow.compute as pc

    q = np.asarray(query_vec, dtype=np.float64)
    cd = ((centroids - q[None, :]) ** 2).sum(-1)
    probe = set(int(c) for c in np.argsort(cd)[:nprobe])
    if not assigned:
        ds = ds.map_batches(IvfAssign(centroids, vec_column), batch_format="pyarrow")
    probed = ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("ivf_cluster"),
                                    value_set=pa.array(sorted(probe), pa.int32()))),
        batch_format="pyarrow",
    )
    return brute_topk(probed, query_vec, k, key_column=key_column,
                      vec_column=vec_column)


# ------------------------------------------------------- distributed k-means


def _kmeans_assign(mat: np.ndarray, cent: np.ndarray,
                   digits: int) -> np.ndarray:
    """Nearest-centroid by squared euclidean distance, rounded to
    ``digits`` before the argmin so both engines snap near-ties (from
    differing summation order) to the same grid; first-hit argmin ==
    SQL ``ORDER BY dist, cid`` (smallest cluster id wins)."""
    d2 = ((mat * mat).sum(1)[:, None]
          - 2.0 * (mat @ cent.T)
          + (cent * cent).sum(1)[None, :])
    return np.round(d2, digits).argmin(1)


def _round_rows(a: np.ndarray, digits: int) -> np.ndarray:
    """Per-element Python round (matches SQL round; np.round can differ
    by 1 ulp) — only ever applied to k×d centroid-sized arrays."""
    return np.array([[round(float(x), digits) for x in row] for row in a],
                    np.float64)


def kmeans_fit(ds, *, k: int = 8, iters: int = 2, modulus: int = 61,
               key_column: str = "vec_id", vec_column: str = "embedding",
               digits: int = 9):
    """Distributed Lloyd k-means over the FULL dataset (not a driver
    sample like :func:`train_centroids`): deterministic strided seeds,
    then per iteration ONE streaming pass whose blocks emit (cluster,
    count, sum-vector) partials — k×(d+1) floats per block, never a row
    per vector — folded on the driver into the next k×d centroid
    matrix; empty clusters keep their previous centroid.  Returns the
    final (key, cluster) assignment as a streaming map.

    Bit-exactness across engines (the pagerank recipe,
    ``stages/graph.py:22``): centroid sums and means are rounded to
    ``digits`` each iteration with PYTHON round (k×d elements), and
    distances are rounded before the argmin, so an unrolled-CTE SQL
    twin reproduces the assignment exactly.

    Scale shape: no shuffle at any step — the per-iteration exchange is
    blocks × k partial rows; the k×d centroid matrix broadcasts via
    ``ray.put`` per round.  At 100 TB the cost is iters+1 full corpus
    scans; cache/materialize ``ds`` upstream if re-reading is dearer
    than object-store residency."""
    import ray as _ray

    cent = kmeans_centroids(ds, k=k, iters=iters, modulus=modulus,
                            key_column=key_column, vec_column=vec_column,
                            digits=digits)
    ref = _ray.put(cent)

    def assign_final(b: pa.Table) -> pa.Table:
        c = _ray.get(ref)
        mat = vectors_to_matrix(b.column(vec_column))
        a = (_kmeans_assign(mat, c, digits) if len(mat)
             else np.empty(0, np.int64))
        return pa.table({key_column: b.column(key_column),
                         "cluster": pa.array(a.astype(np.int64))})

    return ds.map_batches(assign_final, batch_format="pyarrow")


def kmeans_centroids(ds, *, k: int = 8, iters: int = 2, modulus: int = 61,
                     key_column: str = "vec_id",
                     vec_column: str = "embedding", digits: int = 9):
    """The centroid-fitting loop of :func:`kmeans_fit` (same rounding
    pins, same plan — one blocks×k partial pass per iteration), returned
    as the final k×d float64 matrix for downstream stages that need the
    model rather than the assignment (``semdedup``)."""
    import ray as _ray

    seed_ids, seeds = strided_seed_vectors(
        ds, modulus=modulus, k=k,
        key_column=key_column, vec_column=vec_column)
    kk = len(seed_ids)
    if kk == 0:
        raise ValueError("no seed vectors matched the modulus rule")
    cent = _round_rows(np.asarray(seeds, np.float64), digits)

    def make_partial(cent_ref, nk: int, vc: str, dg: int):
        def partial(b: pa.Table) -> pa.Table:
            c = _ray.get(cent_ref)
            mat = vectors_to_matrix(b.column(vc))
            if not len(mat):
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.list_(pa.float64()))})
            a = _kmeans_assign(mat, c, dg)
            sums = np.vstack([mat[a == cid].sum(0) if (a == cid).any()
                              else np.zeros(mat.shape[1])
                              for cid in range(nk)])
            return pa.table({
                "cluster": pa.array(np.arange(nk, dtype=np.int64)),
                "n": pa.array(np.bincount(a, minlength=nk)
                              .astype(np.int64)),
                "s": pa.array(list(sums), pa.list_(pa.float64())),
            })
        return partial

    for _ in range(iters):
        ref = _ray.put(cent)
        S = np.zeros_like(cent)
        N = np.zeros(kk, np.int64)
        for b in (ds.map_batches(make_partial(ref, kk, vec_column, digits),
                                 batch_format="pyarrow")
                    .iter_batches(batch_size=None, batch_format="pyarrow")):
            if not b.num_rows:
                continue
            cid = b.column("cluster").to_numpy(zero_copy_only=False)
            N[cid] += b.column("n").to_numpy(zero_copy_only=False)
            S[cid] += vectors_to_matrix(b.column("s"))
        new = cent.copy()
        nz = N > 0
        if nz.any():
            new[nz] = _round_rows(
                _round_rows(S[nz], digits) / N[nz, None], digits)
        cent = new

    return cent


# ------------------------------------------- distributed second moments ----


def embedding_moments(ds, *, vec_column: str = "embedding",
                      digits: int = 9, cov_digits: int = 6):
    """Distributed mean + covariance of an embedding column — the
    PCA / whitening building block: ONE streaming pass whose blocks
    emit (n, Σx (d,), ΣxxT (d,d)) partials (d²+d+1 floats per block,
    never a row per vector), folded on the driver.  Sums are pinned
    with per-element Python round at ``digits`` (cross-engine exact:
    SQL reconstructs the same rounded sums), then
    cov = round((S2 − s1·s1ᵀ/n)/n, cov_digits) elementwise.

    Returns (n, mean (d,), cov (d,d)) numpy.  The eigendecomposition
    that turns cov into a projection is a driver-side numpy step on the
    d×d matrix (d is model-sized, not corpus-sized) — see
    ``pca_project``."""

    def partial(b: pa.Table) -> pa.Table:
        mat = vectors_to_matrix(b.column(vec_column))
        if not len(mat):
            return pa.table({"n": pa.array([], pa.int64()),
                             "s1": pa.array([], pa.list_(pa.float64())),
                             "s2": pa.array([], pa.list_(pa.float64()))})
        return pa.table({
            "n": pa.array([len(mat)], pa.int64()),
            "s1": pa.array([list(mat.sum(0))], pa.list_(pa.float64())),
            "s2": pa.array([list((mat.T @ mat).ravel())],
                           pa.list_(pa.float64())),
        })

    n = 0
    s1 = None
    s2 = None
    for b in (ds.map_batches(partial, batch_format="pyarrow")
                .iter_batches(batch_size=None, batch_format="pyarrow")):
        if not b.num_rows:
            continue
        n += int(b.column("n").to_numpy(zero_copy_only=False).sum())
        bs1 = vectors_to_matrix(b.column("s1")).sum(0)
        bs2 = vectors_to_matrix(b.column("s2")).sum(0)
        s1 = bs1 if s1 is None else s1 + bs1
        s2 = bs2 if s2 is None else s2 + bs2
    if not n:
        raise ValueError("empty embedding dataset")
    d = len(s1)
    s1 = np.array([round(float(x), digits) for x in s1], np.float64)
    s2 = np.array([round(float(x), digits) for x in s2],
                  np.float64).reshape(d, d)
    mean = np.array([round(float(x), digits) for x in s1 / n], np.float64)
    cov_raw = (s2 - np.outer(s1, s1) / n) / n
    cov = np.array([[round(float(x), cov_digits) for x in row]
                    for row in cov_raw], np.float64)
    return n, mean, cov


def pca_project(ds, *, k: int = 2, vec_column: str = "embedding",
                key_column: str = "vec_id", digits: int = 6):
    """Project every embedding onto the top-k covariance eigenvectors
    (driver-side ``np.linalg.eigh`` on the d×d matrix from
    :func:`embedding_moments`), sign-normalized so the largest-|.|
    component of each eigenvector is positive (eigenvectors are
    sign-ambiguous — pytest-pinned by variance ordering and
    reconstruction properties, not a SQL oracle).  Streaming matmul
    per batch; the k×d projection rides the task closure."""
    import ray as _ray

    _, mean, cov = embedding_moments(ds, vec_column=vec_column)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T        # (k, d)
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    ref = _ray.put((mean, comps))

    def project(b: pa.Table) -> pa.Table:
        m, c = _ray.get(ref)
        mat = vectors_to_matrix(b.column(vec_column))
        proj = ((mat - m[None, :]) @ c.T if len(mat)
                else np.zeros((0, c.shape[0])))
        return pa.table({
            key_column: b.column(key_column),
            "pc": pa.array([[round(float(x), digits) for x in row]
                            for row in proj], pa.list_(pa.float64())),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def _dim_minmax(ds, vec_column: str):
    """Global per-dimension (min, max) float64 arrays: one (dim, mn, mx)
    row per (batch, dim) — a dims × blocks exchange, corpus-independent
    — merged by a tiny ``groupby(dim)`` Min/Max (min/max never rounds,
    so the extrema are exact on every engine)."""
    from ray.data.aggregate import Max, Min

    def mm_partial(b: pa.Table) -> pa.Table:
        mat = vectors_to_matrix(b.column(vec_column))
        if not mat.size:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({
            "dim": pa.array(np.arange(mat.shape[1], dtype=np.int64)),
            "mn": pa.array(mat.min(axis=0)),
            "mx": pa.array(mat.max(axis=0)),
        })

    mm = (ds.map_batches(mm_partial, batch_format="pyarrow")
            .groupby("dim")
            .aggregate(Min("mn", alias_name="mn"),
                       Max("mx", alias_name="mx"))
            .to_pandas().sort_values("dim"))
    return (mm["mn"].to_numpy(np.float64), mm["mx"].to_numpy(np.float64))


def _quantize_codes(mat: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                    levels: int) -> np.ndarray:
    """Float matrix → float code grid (round-9 before floor — the
    engine's established float-parity recipe — clamped to
    [0, levels-1]; constant dimensions code to 0)."""
    rng = hi - lo
    safe = np.where(rng > 0, rng, 1.0)
    q = np.floor(np.round((mat - lo) / safe * float(levels), 9))
    return np.where(rng > 0, np.clip(q, 0, levels - 1), 0.0)


def embedding_quantize(ds, vec_column: str = "embedding",
                       key_column: str = "vec_id", *, levels: int = 256):
    """Scalar per-dimension quantization of an embedding column: map
    each float to ``floor((v - mn_d) / (mx_d - mn_d) * levels)`` clamped
    to [0, levels-1] (constant dimensions code to 0), where mn/mx are
    the GLOBAL per-dimension extrema — the 4×-8× memory shrink that
    makes billion-vector ANN shards fit in worker heaps, with the codes
    riding as ``list<uint8>``.

    Scale shape: pass 1 emits one (dim, mn, mx) row per (batch, dim) —
    a dims × blocks exchange, independent of corpus size — merged by
    one tiny ``groupby(dim)`` Min/Max; the d-row result broadcasts via
    ``ray.put`` and pass 2 is a single streaming vectorized map (the
    arithmetic rounds to 9 decimals before the floor so the SQL oracle
    lands on the same integer across float ulps).  No reference
    analogue (brief-scope similarity-search component).
    """
    import ray as _ray

    mn, mx = _dim_minmax(ds, vec_column)
    ref = _ray.put((mn, mx))

    def quantize(b: pa.Table) -> pa.Table:
        lo, hi = _ray.get(ref)
        mat = vectors_to_matrix(b.column(vec_column))
        n = mat.shape[0]
        q = _quantize_codes(mat, lo, hi, levels)
        flat = pa.array(q.astype(np.uint8).ravel(), pa.uint8())
        offsets = pa.array(
            np.arange(0, (n + 1) * mat.shape[1] if n else 1,
                      max(mat.shape[1], 1), dtype=np.int32)[:n + 1])
        codes = pa.ListArray.from_arrays(offsets, flat)
        return pa.table({key_column: b.column(key_column), "codes": codes})

    return ds.map_batches(quantize, batch_format="pyarrow")


def quantized_topk(ds, query_vec, k: int, *, key_column: str = "vec_id",
                   vec_column: str = "embedding", levels: int = 256):
    """Asymmetric quantized ANN: brute-force cosine top-k where corpus
    vectors are scored through their int8 scalar-quantized
    reconstruction ``mn + (code + 0.5)·(mx − mn)/levels`` while the
    query stays full-precision — the standard asymmetric-distance
    trade (SQ analogue of PQ/ADC): the shard in memory is the 4–8×
    smaller code matrix, the query loses nothing.  Exact ties between
    identically-coded vectors break toward the smallest key, so the
    result is deterministic and fully SQL-replicable (unlike a float
    re-rank it needs no tolerance).

    Scale shape: one dims × blocks min/max exchange
    (:func:`_dim_minmax`), broadcast scale, then exactly
    :func:`brute_topk`'s plan — per-batch quantize→reconstruct→matmul
    with a local top-k prune, one k × blocks-row global sort."""
    import ray as _ray

    mn, mx = _dim_minmax(ds, vec_column)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0
    ref = _ray.put((mn, mx))

    def score(b: pa.Table) -> pa.Table:
        lo, hi = _ray.get(ref)
        keys = np.asarray(b.column(key_column).to_pylist())
        mat = vectors_to_matrix(b.column(vec_column))
        codes = _quantize_codes(mat, lo, hi, levels)
        recon = lo + (codes + 0.5) * (hi - lo) / float(levels)
        norms = np.linalg.norm(recon, axis=1)
        norms[norms == 0] = 1.0
        scores = (recon @ q) / (norms * qn)
        if len(keys) > k:
            idx = np.argpartition(-scores, k)[:k]
        else:
            idx = np.arange(len(keys))
        return pa.Table.from_arrays(
            [pa.array(keys[idx].tolist()),
             pa.array(scores[idx], pa.float64())],
            names=[key_column, "score"])

    return (ds.map_batches(score, batch_format="pyarrow")
              .sort(["score", key_column], descending=[True, False])
              .limit(k))


# ------------------------------------------------------------- SemDedup ----


def semdedup(ds, *, k: int = 8, iters: int = 2, modulus: int = 61,
             tau: float = 0.85, key_column: str = "vec_id",
             vec_column: str = "embedding", digits: int = 9,
             sim_digits: int = 4):
    """SemDedup (Abbas et al. 2023): semantic deduplication by k-means
    clustering + within-cluster cosine pruning.  A vector is dropped iff
    SOME lower-key vector in the same cluster has cosine similarity
    ≥ ``tau`` (the deterministic dominance variant of the paper's
    keep-one-per-near-set rule — no sequential dependence, so it is
    order-free and SQL-expressible).  Returns the kept (key, cluster)
    rows.

    Determinism / SQL parity: centroids come from
    :func:`kmeans_centroids` (round-``digits`` pins, bit-exact vs the
    unrolled-CTE twin); similarities are rounded to ``sim_digits``
    before the threshold compare on both engines, so near-``tau`` ulp
    noise can't flip a verdict.

    Scale shape: the centroid fit is iters blocks×k partial passes (no
    shuffle); the assignment+vector exchange is ONE hash partition by
    cluster (`groupby(cluster)`), and the within-cluster pairwise
    matmul is O(|cluster|²·d) per group — the SemDedup operating regime
    picks k ≈ N/5k so a cluster (≈5k × d floats) fits one worker; with
    k bounded this is the repo's coarse-bucket pattern, not a
    group-per-key."""
    import ray as _ray

    cent = kmeans_centroids(ds, k=k, iters=iters, modulus=modulus,
                            key_column=key_column, vec_column=vec_column,
                            digits=digits)
    ref = _ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        c = _ray.get(ref)
        mat = vectors_to_matrix(b.column(vec_column))
        a = (_kmeans_assign(mat, c, digits) if len(mat)
             else np.empty(0, np.int64))
        return pa.table({key_column: b.column(key_column),
                         "cluster": pa.array(a.astype(np.int64)),
                         vec_column: b.column(vec_column)})

    def dedup_group(g: pa.Table) -> pa.Table:
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        mat = _unit(vectors_to_matrix(g.column(vec_column)))[order]
        sims = np.round(mat @ mat.T, sim_digits)
        # v is a duplicate iff any EARLIER u (key order) clears tau
        dup = np.triu(sims >= tau, k=1).any(axis=0)
        kept = np.flatnonzero(~dup)
        return pa.table({
            key_column: pa.array(keys[kept]),
            "cluster": g.column("cluster").take(
                pa.array(order[kept], pa.int64())),
        })

    return (ds.map_batches(assign, batch_format="pyarrow")
              .groupby("cluster")
              .map_groups(dedup_group, batch_format="pyarrow"))


# ---------------------------------------------- random projection (JL) ----


def _jl_sign_matrix(d: int, k: int, seed_tag: str):
    """Deterministic ±1 sign matrix: entry (i, j) = +1 iff the first
    md5 byte of ``"{seed_tag}:{i}:{j}"`` is even — reproducible in ANSI
    SQL, no RNG state.  Built once per (d, k, tag) per process."""
    import numpy as np

    from ..functions.hashing import md5_hex

    key = (d, k, seed_tag)
    cached = _jl_sign_matrix._cache.get(key)
    if cached is None:
        signs = np.fromiter(
            (1.0 if int(md5_hex(f"{seed_tag}:{i}:{j}")[:2], 16) % 2 == 0
             else -1.0
             for i in range(d) for j in range(k)),
            np.float64, d * k).reshape(d, k)
        _jl_sign_matrix._cache[key] = cached = signs
    return cached


_jl_sign_matrix._cache = {}


def random_project(ds, *, out_dim: int = 16, key_column: str = "vec_id",
                   vec_column: str = "embedding", seed_tag: str = "jl",
                   digits: int = 6):
    """Johnson–Lindenstrauss random projection to ``out_dim`` dims:
    y = round(xᵀR / √k, digits) with R the deterministic ±1 sign matrix
    of :func:`_jl_sign_matrix` — the cheap distance-preserving
    dimensionality reduction in front of ANN / clustering where PCA's
    covariance pass is too dear (and, unlike PCA, value-checkable: no
    eigenvector sign/rotation ambiguity, the projection is a fixed
    linear map both engines can rebuild exactly).

    Scale shape: a pure streaming map — one (n×d)·(d×k) matmul per
    batch, the sign matrix rebuilt once per worker process from the
    hash rule (nothing broadcast, nothing shuffled).  Use out_dim with
    an exact integer square root (16, 64) if you need the twin engines'
    √k bit-identical; any k is still fine at round-``digits``."""
    import numpy as np

    scale = float(np.sqrt(out_dim))

    def project(batch: pa.Table) -> pa.Table:
        mat = vectors_to_matrix(batch.column(vec_column))
        if not len(mat):
            return pa.table({
                key_column: batch.column(key_column),
                "proj": pa.array([], pa.list_(pa.float64()))})
        signs = _jl_sign_matrix(mat.shape[1], out_dim, seed_tag)
        proj = np.round((mat @ signs) / scale, digits)
        return pa.table({
            key_column: batch.column(key_column),
            "proj": pa.FixedSizeListArray.from_arrays(
                pa.array(proj.ravel(), pa.float64()), out_dim).cast(
                    pa.list_(pa.float64())),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def embedding_outliers(ds, *, k: int = 8, iters: int = 2,
                       modulus: int = 61, z_threshold: float = 2.0,
                       key_column: str = "vec_id",
                       vec_column: str = "embedding", digits: int = 9,
                       z_digits: int = 6):
    """Embedding outlier detection: vectors whose rounded squared
    distance to their k-means centroid is ≥ ``z_threshold`` standard
    deviations above the cluster mean — the curation step that flags
    mis-embedded / off-manifold documents before training.

    Parity-pinned sequence (identical on both engines):
        d   = round(‖x − c‖², digits)          (the kmeans metric)
        mu  = round(Σd / n, z_digits)           per cluster
        ex2 = round(Σd² / n, z_digits)
        sig = sqrt(ex2 − mu·mu)                (identical doubles in →
        z   = round((d − mu) / sig, z_digits)   identical doubles out)

    Returns (key, cluster, z) for flagged vectors, z descending per the
    caller's sort if needed.  Zero-variance clusters flag nothing.

    Scale shape: centroid fit is iters blocks×k passes; then ONE
    streaming pass emits k×3-float moment partials (no shuffle), the
    driver folds k rows, and ONE more streaming pass scores and
    filters.  Nothing vector-shaped leaves the workers."""
    import ray as _ray

    cent = kmeans_centroids(ds, k=k, iters=iters, modulus=modulus,
                            key_column=key_column, vec_column=vec_column,
                            digits=digits)
    kk = len(cent)
    cref = _ray.put(cent)

    def _dists(b: pa.Table):
        c = _ray.get(cref)
        mat = vectors_to_matrix(b.column(vec_column))
        if not len(mat):
            return None, None
        d2 = ((mat * mat).sum(1)[:, None] - 2.0 * (mat @ c.T)
              + (c * c).sum(1)[None, :])
        d2r = np.round(d2, digits)
        a = d2r.argmin(1)
        return a, d2r[np.arange(len(a)), a]

    def moment_partial(b: pa.Table) -> pa.Table:
        a, d = _dists(b)
        if a is None:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s1": pa.array([], pa.float64()),
                             "s2": pa.array([], pa.float64())})
        n = np.bincount(a, minlength=kk)
        s1 = np.bincount(a, weights=d, minlength=kk)
        s2 = np.bincount(a, weights=d * d, minlength=kk)
        return pa.table({"cluster": pa.array(np.arange(kk, dtype=np.int64)),
                         "n": pa.array(n.astype(np.int64)),
                         "s1": pa.array(s1, pa.float64()),
                         "s2": pa.array(s2, pa.float64())})

    N = np.zeros(kk, np.int64)
    S1 = np.zeros(kk, np.float64)
    S2 = np.zeros(kk, np.float64)
    for b in (ds.map_batches(moment_partial, batch_format="pyarrow")
                .iter_batches(batch_size=None, batch_format="pyarrow")):
        if not b.num_rows:
            continue
        cid = b.column("cluster").to_numpy(zero_copy_only=False)
        N[cid] += b.column("n").to_numpy(zero_copy_only=False)
        S1[cid] += b.column("s1").to_numpy(zero_copy_only=False)
        S2[cid] += b.column("s2").to_numpy(zero_copy_only=False)
    mu = np.zeros(kk)
    sig = np.zeros(kk)
    nz = N > 0
    mu[nz] = np.fromiter((round(v, z_digits)
                          for v in (S1[nz] / N[nz]).tolist()),
                         np.float64, int(nz.sum()))
    ex2 = np.zeros(kk)
    ex2[nz] = np.fromiter((round(v, z_digits)
                           for v in (S2[nz] / N[nz]).tolist()),
                          np.float64, int(nz.sum()))
    var = np.maximum(ex2 - mu * mu, 0.0)
    sig = np.sqrt(var)
    mref = _ray.put((mu, sig))

    def score(b: pa.Table) -> pa.Table:
        a, d = _dists(b)
        empty = pa.table({key_column: b.column(key_column).slice(0, 0),
                          "cluster": pa.array([], pa.int64()),
                          "z": pa.array([], pa.float64())})
        if a is None:
            return empty
        m, s = _ray.get(mref)
        ok = s[a] > 0
        z = np.zeros(len(a))
        z[ok] = (d[ok] - m[a[ok]]) / s[a[ok]]
        z = np.fromiter((round(v, z_digits) for v in z.tolist()),
                        np.float64, len(z))
        keep = ok & (z >= z_threshold)
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table({key_column: b.column(key_column).take(idx),
                         "cluster": pa.array(a[keep].astype(np.int64)),
                         "z": pa.array(z[keep], pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def diverse_sample(ds, *, n_per_cluster: int = 10, k: int = 8,
                   iters: int = 2, modulus: int = 61,
                   key_column: str = "vec_id",
                   vec_column: str = "embedding"):
    """Coverage-stratified sample: assign every vector to its bit-exact
    k-means cluster, then keep the ``n_per_cluster`` smallest-md5 keys
    PER CLUSTER — a deterministic, RNG-free "diverse subset" that
    samples every region of embedding space instead of letting the head
    cluster dominate (the k-means twin of ``temperature_sample``'s
    per-group flattening).  Returns (key, cluster).

    Scale shape: kmeans fit (blocks×k passes) + one assign map + the
    ``cap_per_group`` machinery — per-batch local per-cluster top-n
    prune (≤ k·n candidate rows per batch), one tiny resolve, broadcast
    ``pc.is_in`` keep filter on a second streaming pass."""
    from .textstats import cap_per_group

    from ..functions.hashing import md5_hex

    assigned = kmeans_fit(ds, k=k, iters=iters, modulus=modulus,
                          key_column=key_column, vec_column=vec_column)

    def with_rank(b: pa.Table) -> pa.Table:
        keys = b.column(key_column).to_pylist()
        return b.append_column(
            "rank", pa.array([md5_hex(str(x)) for x in keys], pa.string()))

    capped = cap_per_group(
        assigned.map_batches(with_rank, batch_format="pyarrow"),
        "cluster", "rank", n=n_per_cluster, tiebreak_column=key_column)
    return capped.select_columns([key_column, "cluster"])


def hard_negatives(ds, *, k: int = 8, iters: int = 2, modulus: int = 61,
                   key_column: str = "vec_id",
                   vec_column: str = "embedding", digits: int = 9,
                   sim_digits: int = 4):
    """Contrastive hard-negative mining: for every vector, the
    SAME-CLUSTER vector with the LOWEST round-4 cosine (ties → smallest
    key) — topically related (same k-means cell) yet maximally
    dissimilar, the classic in-batch hard negative for embedding-model
    training.  Returns (key, neg_key, cos); singleton clusters emit
    nothing.

    Scale shape: identical to :func:`semdedup` — bit-exact centroid
    fit, ONE hash partition by cluster, per-group unit matmul + argmin
    (k ≈ N/5k bounds the group)."""
    import ray as _ray

    cent = kmeans_centroids(ds, k=k, iters=iters, modulus=modulus,
                            key_column=key_column, vec_column=vec_column,
                            digits=digits)
    ref = _ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        c = _ray.get(ref)
        mat = vectors_to_matrix(b.column(vec_column))
        a = (_kmeans_assign(mat, c, digits) if len(mat)
             else np.empty(0, np.int64))
        return pa.table({key_column: b.column(key_column),
                         "cluster": pa.array(a.astype(np.int64)),
                         vec_column: b.column(vec_column)})

    def mine_group(g: pa.Table) -> pa.Table:
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        empty = pa.table({key_column: pa.array([], pa.int64()),
                          "neg_key": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        if len(keys) < 2:
            return empty
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        mat = _unit(vectors_to_matrix(g.column(vec_column)))[order]
        sims = np.round(mat @ mat.T, sim_digits)
        np.fill_diagonal(sims, np.inf)  # never pick self
        # argmin with smallest-key tiebreak: keys are sorted, argmin
        # returns the first (= smallest-key) minimum
        neg = sims.argmin(1)
        cos = sims[np.arange(len(keys)), neg]
        return pa.table({key_column: pa.array(keys),
                         "neg_key": pa.array(keys[neg]),
                         "cos": pa.array(cos, pa.float64())})

    return (ds.map_batches(assign, batch_format="pyarrow")
              .groupby("cluster")
              .map_groups(mine_group, batch_format="pyarrow"))

def _gather_side(ds, key_column: str, vec_column: str):
    """Materialize ONE side of a bitext join as (sorted ids, unit
    matrix) on the driver — the broadcast index side, bounded by that
    side's corpus size (the brute-force baseline bound; the IVF
    machinery above is the documented swap when a side outgrows one
    machine)."""
    ids_parts, mats = [], []
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            ids_parts.append(b.column(key_column).to_numpy(
                zero_copy_only=False).astype(np.int64))
            mats.append(vectors_to_matrix(b.column(vec_column)))
    if not ids_parts:
        return np.empty(0, np.int64), np.empty((0, 0))
    ids = np.concatenate(ids_parts)
    mat = _unit(np.concatenate(mats))
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order]


class _MarginScan:
    """Per-batch scan of one bitext side against the other side's
    broadcast unit matrix: emits per row the rank-1 neighbor (grid
    cosine desc, id asc) and the EXACT top-k grid-cosine sum.  Cosines
    live on an integer 1e-4 grid (floor(c·1e4 + .5)) from the first
    step, so every downstream sum/ratio is integer-derived and
    bit-identical across engines and summation orders."""

    def __init__(self, ref, k: int, key_column: str, vec_column: str):
        import ray as _ray

        self.ids_o, self.mat_o = _ray.get(ref)
        self.k = k
        self.key_column = key_column
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        empty = pa.table({"me": pa.array([], pa.int64()),
                          "nn": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64()),
                          "ksum": pa.array([], pa.int64())})
        if not len(keys) or not len(self.ids_o):
            return empty
        mat = _unit(vectors_to_matrix(batch.column(self.vec_column)))
        sims = mat @ self.mat_o.T
        grid = np.floor(sims * 10000.0 + 0.5).astype(np.int64)
        # other-side ids are sorted ascending: argmax takes the first
        # (= smallest-id) maximum; stable argsort keeps id order in ties
        nn_idx = grid.argmax(1)
        kk = min(self.k, grid.shape[1])
        order = np.argsort(-grid, axis=1, kind="stable")[:, :kk]
        ksum = np.take_along_axis(grid, order, axis=1).sum(1)
        return pa.table({
            "me": pa.array(keys),
            "nn": pa.array(self.ids_o[nn_idx]),
            "c": pa.array(grid[np.arange(len(keys)), nn_idx]),
            "ksum": pa.array(ksum, pa.int64()),
        })


def bitext_mine(ds_a, ds_b, *, k: int = 4, min_margin: float = 1.0,
                key_column: str = "vec_id", vec_column: str = "embedding"):
    """Margin-based parallel-text mining (Artetxe & Schwenk '19): pairs
    (a, b) that are MUTUAL rank-1 cosine neighbors across two embedding
    corpora, scored by the ratio margin

        margin = 2k·cos(a,b) / (Σ top-k cos of a + Σ top-k cos of b)

    and kept when margin ≥ ``min_margin`` — the standard mined-bitext
    filter: a pair must not just be closest, it must stand OUT from
    each side's neighborhood density.  Returns (a, b, cos, margin).

    Exactness: cosines snap to an integer 1e-4 grid up front, so both
    top-k sums are exact int64, the margin is one float division of
    identical integers (then the same floor(x·1e4 + .5)/1e4 snap), and
    the result is bit-identical across engines, batch sizes and
    summation orders — the repo's integer-moments rule applied to
    similarity search.

    Scale shape: each side is broadcast ONCE via ``ray.put`` while the
    other side streams through ``map_batches`` actors (two passes
    total, the brute-force ANN posture); the mutual check is one
    (a, b)-keyed hash join of two rank-1 tables.  When a side outgrows
    the object store, the documented swap is the cluster-partitioned
    IVF index in this module for candidate generation."""
    import ray as _ray

    from .joins import _join_partitions, _nonempty_blocks, safe_join
    from .pools import scoring_pool

    import ray.data as rd

    pool = scoring_pool(None)
    ref_b = _ray.put(_gather_side(ds_b, key_column, vec_column))
    ref_a = _ray.put(_gather_side(ds_a, key_column, vec_column))

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64()),
                      "margin": pa.array([], pa.float64())})

    scan_a = (ds_a.map_batches(
        _MarginScan, fn_constructor_kwargs=dict(
            ref=ref_b, k=k, key_column=key_column, vec_column=vec_column),
        batch_format="pyarrow", concurrency=pool).materialize())
    scan_a = _nonempty_blocks(scan_a)
    scan_b = (ds_b.map_batches(
        _MarginScan, fn_constructor_kwargs=dict(
            ref=ref_a, k=k, key_column=key_column, vec_column=vec_column),
        batch_format="pyarrow", concurrency=pool).materialize())
    scan_b = _nonempty_blocks(scan_b)
    if scan_a is None or scan_b is None:
        return rd.from_arrow(empty)

    def flip(b: pa.Table) -> pa.Table:
        return pa.table({"me2": b.column("nn"), "nn2": b.column("me"),
                         "ksum_b": b.column("ksum")})

    mutual = safe_join(
        scan_a, scan_b.map_batches(flip, batch_format="pyarrow"),
        "inner", 16, on=("me", "nn"), right_on=("me2", "nn2"))
    if mutual is None:
        return rd.from_arrow(empty)

    def score(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        sa = b.column("ksum").to_numpy(zero_copy_only=False)
        sb = b.column("ksum_b").to_numpy(zero_copy_only=False)
        denom = (sa + sb).astype(np.float64)
        # margin defined only where the neighborhood mass is positive
        # (always true for real embedding data's top-k cosines)
        ok = denom > 0
        margin = np.where(ok, np.floor(np.divide(
            2.0 * k * c * 10000.0, denom, out=np.zeros_like(denom),
            where=ok) + 0.5) / 10000.0, 0.0)
        t = pa.table({"a": b.column("me"), "b": b.column("nn"),
                      "cos": pa.array(c / 10000.0, pa.float64()),
                      "margin": pa.array(margin, pa.float64())})
        return t.filter(pa.array(ok & (margin >= min_margin)))

    return mutual.map_batches(score, batch_format="pyarrow")


def silhouette_summary(ds, *, k: int = 8, iters: int = 2,
                       modulus: int = 61, key_column: str = "vec_id",
                       vec_column: str = "embedding", digits: int = 9,
                       s_scale: int = 1_000_000):
    """Per-cluster simplified-silhouette summary of a k-means fit —
    the clustering-quality audit run before trusting cluster-based
    curation (semdedup buckets, diverse_sample strata): for every
    vector, a = round-``digits`` squared distance to its OWN centroid,
    b = the minimum over OTHER centroids, s = (b−a)/max(a,b) ∈ [0, 1)
    (a is the argmin, so s ≥ 0 by construction; a=b → 0).

    Exactness (the kmeans recipe extended one step): a and b are the
    SAME round-9 doubles the assignment argmin snaps to, s is one IEEE
    division of two identical doubles, and each s snaps to a
    1/``s_scale`` grid (``floor(s·scale + 0.5)`` int64) so the
    per-cluster SUM is an order-independent integer — the
    summation-order rule applied to a float quality score.  The mean
    is one final division.

    Scale shape: centroids broadcast via ``ray.put``; one streaming
    pass emits per-batch (cluster, n, s_sum) partials → a k-row
    ``groupby.sum``.  No shuffle, no per-vector output.
    → (cluster, n, s_sum, mean_sil)."""
    import ray as _ray

    from ray.data.aggregate import Sum

    if k < 2:
        raise ValueError("silhouette needs k >= 2")
    cent = kmeans_centroids(ds, k=k, iters=iters, modulus=modulus,
                            key_column=key_column, vec_column=vec_column,
                            digits=digits)
    ref = _ray.put(cent)

    def partial(b: pa.Table) -> pa.Table:
        c = _ray.get(ref)
        mat = vectors_to_matrix(b.column(vec_column))
        if not len(mat):
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s_sum": pa.array([], pa.int64())})
        d2 = ((mat * mat).sum(1)[:, None]
              - 2.0 * (mat @ c.T)
              + (c * c).sum(1)[None, :])
        d2r = np.round(d2, digits)
        assign = d2r.argmin(1)
        rows = np.arange(len(mat))
        a2 = d2r[rows, assign].copy()
        d2r[rows, assign] = np.inf
        b2 = d2r.min(1)
        maxab = np.maximum(a2, b2)
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where(maxab > 0, (b2 - a2) / maxab, 0.0)
        s_micro = np.floor(s * s_scale + 0.5).astype(np.int64)
        t = pa.table({"cluster": pa.array(assign.astype(np.int64)),
                      "n": pa.array(np.ones(len(mat), np.int64)),
                      "s_sum": pa.array(s_micro)})
        g = t.group_by(["cluster"]).aggregate([("n", "sum"),
                                               ("s_sum", "sum")])
        return g.rename_columns(["cluster", "n", "s_sum"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("cluster")
                .aggregate(Sum("n", alias_name="n"),
                           Sum("s_sum", alias_name="s_sum")))

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        ss = b.column("s_sum").to_numpy(zero_copy_only=False)
        return pa.table({
            "cluster": b.column("cluster"), "n": b.column("n"),
            "s_sum": b.column("s_sum"),
            "mean_sil": pa.array(ss / (n * s_scale), pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")


class _KnnScan:
    """Per-batch exact cosine top-k of every row against the broadcast
    index side (self-pair excluded by key equality).  One ``ray.put``
    of the (sorted ids, unit matrix) pair; each actor reads it once in
    ``__init__`` — never re-shipped per batch."""

    def __init__(self, index_ref, k: int, key_column: str,
                 vec_column: str):
        import ray as _ray

        self.ids, self.mat = _ray.get(index_ref)
        self.k = k
        self.key_column = key_column
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        keys = batch.column(self.key_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if not len(keys) or not len(self.ids):
            return empty
        mat = _unit(vectors_to_matrix(batch.column(self.vec_column)))
        scores = mat @ self.mat.T                       # (b, n)
        # self-exclusion: index ids are sorted, so each row's own column
        # (if present) is found by one searchsorted
        pos = np.searchsorted(self.ids, keys)
        ok = pos < len(self.ids)
        ok[ok] = self.ids[pos[ok]] == keys[ok]
        scores[np.nonzero(ok)[0], pos[ok]] = -np.inf
        # stable argsort on -score keeps the original (ascending-dst)
        # column order for ties → the (score DESC, dst ASC) SQL rank;
        # at index sizes past one machine the documented swap is the
        # IVF cluster-partitioned plan (ann_ivf_partitioned), not a
        # wider sort here
        k = min(self.k, scores.shape[1])
        order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        rows = np.repeat(np.arange(len(keys)), k)
        cols = order.ravel()
        sc = scores[rows, cols]
        keep = np.isfinite(sc)
        return pa.table({
            "src": pa.array(np.repeat(keys, k)[keep]),
            "dst": pa.array(self.ids[cols[keep]]),
            "score": pa.array(sc[keep], pa.float64())})


def knn_graph(ds, *, k: int = 5, key_column: str = "vec_id",
              vec_column: str = "embedding"):
    """Exact cosine k-nearest-neighbour graph over an embedding column
    → (src, dst, score) edges, ``k`` per source (fewer only when the
    corpus has < k+1 vectors): the adjacency consumed by graph-based
    curation (kNN dedup sweeps, label propagation over embeddings,
    connectivity audits).

    Rank rule (engine-reproducible): per source, neighbours by
    (cosine DESC, dst ASC) — the stable-argsort note in `_KnnScan`.
    Scale shape: the index side is gathered once (`_gather_side`,
    bounded by the corpus — the brute-force-baseline bound, same as
    `bitext_mine`'s per-side bound) and broadcast via ``ray.put``;
    the corpus then streams through one map_batches.  No shuffle at
    all; output is corpus×k edges.  Past the broadcast budget the
    documented swap is the IVF-partitioned plan (cluster-keyed
    parquet + per-cluster scans, `ivf_write_index`)."""
    import ray as _ray

    ids, mat = _gather_side(ds, key_column, vec_column)
    ref = _ray.put((ids, mat))
    return ds.map_batches(
        _KnnScan(ref, k, key_column, vec_column),
        batch_format="pyarrow")
