"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference's only dedup is exact input dedup before submission
(F6, llm_food/cli.py:206-218: ``sorted(list(set(abs_paths)))``); at
training-data scale dedup is a first-class pipeline stage, so the family
is implemented here as Ray Data shuffle patterns:

- exact:   hash column per batch → ``groupby(hash).map_groups(first)``
           (one shuffle keyed on content hash; keep = min key per group)
- minhash: shingle→signature per batch → explode to (band_key, ...) rows
           → ``groupby(band_key)`` buckets → in-bucket candidate pairs
           verified right in the group (no second join) → union-find on
           the driver over the (small) confirmed-pair set
- simhash: 64-bit signature, banded into 4×16-bit chunks (exact for
           hamming distance ≤ 3 by pigeonhole) → same pair machinery
- embedding: random-hyperplane signature (SRP-LSH) → banded buckets →
           exact cosine verify in-bucket

Partitioning assumptions (documented per north_rule): bucket groups are
small (LSH property); the *confirmed duplicate pair* set fits on the
driver for union-find — at web scale replace the driver union-find with
iterative min-label propagation (groupby rounds), same confirmed-pairs
input. Carried payload per band row is the signature (estimate verify,
default, 8 B/perm) or the shingle set (exact verify — small-scale/test).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import (
    MinHasher,
    hamming64,
    jaccard,
    md5_hex,
    shingle_hashes,
    simhash64,
)

# ------------------------------------------------------------- exact ----


def add_content_hash(ds, text_column: str = "text", out_column: str = "content_md5"):
    def _hash(batch: pa.Table) -> pa.Table:
        vals = [md5_hex(t or "") for t in batch.column(text_column).to_pylist()]
        return batch.append_column(out_column, pa.array(vals, pa.string()))

    return ds.map_batches(_hash, batch_format="pyarrow")


def dedup_exact(ds, key_column: str = "doc_id", text_column: str = "text"):
    """Keep the min-key row per distinct content hash.

    One all-to-all shuffle keyed on the content hash (hash-partition +
    per-group first — F6's scale form)."""
    hashed = add_content_hash(ds, text_column)

    def first_row(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(key_column).head(1)

    return hashed.groupby("content_md5").map_groups(first_row, batch_format="pandas")


# ----------------------------------------------------------- minhash ----


class MinHashSignatures:
    """Per-batch minhash signatures (+ optional shingle sets)."""

    def __init__(self, key_column: str, text_column: str, num_perm: int = 128,
                 k_shingle: int = 3, keep_shingles: bool = False, seed: int = 42):
        self.key_column = key_column
        self.text_column = text_column
        self.k = k_shingle
        self.keep_shingles = keep_shingles
        self.hasher = MinHasher(num_perm, seed)   # built once per actor/worker

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_column).to_pylist()
        texts = [t or "" for t in batch.column(self.text_column).to_pylist()]
        shingles = [shingle_hashes(t, self.k) for t in texts]
        sigs = [self.hasher.signature(s) for s in shingles]
        arrays = [
            pa.array(keys),
            pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
        ]
        names = [self.key_column, "minhash_sig"]
        if self.keep_shingles:
            arrays.append(pa.array([s.tolist() for s in shingles], pa.list_(pa.uint64())))
            names.append("shingles")
        return pa.Table.from_arrays(arrays, names=names)


def _band_explode(key_column: str, hasher: MinHasher, num_bands: int,
                  carry: list[str]):
    def _explode(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column).to_pylist()
        sigs = batch.column("minhash_sig").to_pylist()
        carried = {c: batch.column(c).to_pylist() for c in carry}
        out_band, out_key = [], []
        out_carry: dict[str, list] = {c: [] for c in carry}
        for i, (k, sig) in enumerate(zip(keys, sigs)):
            for bk in hasher.band_keys(np.array(sig, dtype=np.uint64), num_bands):
                out_band.append(bk)
                out_key.append(k)
                for c in carry:
                    out_carry[c].append(carried[c][i])
        arrays = [pa.array(out_band, pa.string()), pa.array(out_key)]
        names = ["band_key", key_column]
        for c in carry:
            arrays.append(pa.array(out_carry[c]))
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    return _explode


def minhash_candidate_pairs(ds, key_column: str = "doc_id",
                            text_column: str = "text", *,
                            num_perm: int = 128, num_bands: int = 16,
                            k_shingle: int = 3, threshold: float = 0.8,
                            verify: str = "estimate", seed: int = 42):
    """→ Dataset of confirmed near-dup pairs (a, b, sim), a < b.

    verify="estimate": sim = fraction of agreeing minhash components
    (unbiased Jaccard estimator; only signatures shuffled — scale path).
    verify="exact": sim = exact shingle-set Jaccard (shingle sets ride
    through the band shuffle — small-scale / oracle-check path).
    """
    if verify not in ("estimate", "exact"):
        raise ValueError(f"verify={verify!r}")
    hasher = MinHasher(num_perm, seed)
    sig_ds = ds.map_batches(
        MinHashSignatures(key_column, text_column, num_perm, k_shingle,
                          keep_shingles=(verify == "exact"), seed=seed),
        batch_format="pyarrow",
    )
    carry = ["minhash_sig"] + (["shingles"] if verify == "exact" else [])
    banded = sig_ds.map_batches(
        _band_explode(key_column, hasher, num_bands, carry),
        batch_format="pyarrow",
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.drop_duplicates(subset=[key_column]).sort_values(key_column)
        keys = rows[key_column].tolist()
        sigs = [np.asarray(s, dtype=np.uint64) for s in rows["minhash_sig"]]
        shing = (
            [np.asarray(s, dtype=np.uint64) for s in rows["shingles"]]
            if "shingles" in rows.columns else None
        )
        a_out, b_out, sim_out = [], [], []
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                if shing is not None:
                    sim = jaccard(shing[i], shing[j])
                else:
                    sim = float((sigs[i] == sigs[j]).mean())
                if sim >= threshold:
                    a_out.append(keys[i]); b_out.append(keys[j]); sim_out.append(sim)
        return pd.DataFrame({"a": a_out, "b": b_out, "sim": sim_out})

    pairs = banded.groupby("band_key").map_groups(bucket_pairs, batch_format="pandas")
    # a pair can surface from several bands → dedup on (a, b)
    return pairs.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ----------------------------------------------------------- simhash ----


def simhash_candidate_pairs(ds, key_column: str = "doc_id",
                            text_column: str = "text", *,
                            max_hamming: int = 3):
    """SimHash near-dup pairs: 64-bit signatures, 4×16-bit band index
    (pigeonhole-exact for hamming ≤ 3), verify by true hamming distance."""

    def sign(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column).to_pylist()
        texts = [t or "" for t in batch.column(text_column).to_pylist()]
        sigs = [simhash64(t) for t in texts]
        return pa.Table.from_arrays(
            [pa.array(keys), pa.array(sigs, pa.uint64())],
            names=[key_column, "simhash"],
        )

    def explode(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column).to_pylist()
        sigs = batch.column("simhash").to_pylist()
        out_band, out_key, out_sig = [], [], []
        for k, s in zip(keys, sigs):
            for chunk in range(4):
                val = (s >> (16 * chunk)) & 0xFFFF
                out_band.append(f"{chunk}:{val}")
                out_key.append(k)
                out_sig.append(s)
        return pa.Table.from_arrays(
            [pa.array(out_band, pa.string()), pa.array(out_key),
             pa.array(out_sig, pa.uint64())],
            names=["band_key", key_column, "simhash"],
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.drop_duplicates(subset=[key_column]).sort_values(key_column)
        keys = rows[key_column].tolist()
        sigs = rows["simhash"].tolist()
        a_out, b_out, d_out = [], [], []
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                d = hamming64(int(sigs[i]), int(sigs[j]))
                if d <= max_hamming:
                    a_out.append(keys[i]); b_out.append(keys[j]); d_out.append(d)
        return pd.DataFrame({"a": a_out, "b": b_out, "hamming": d_out})

    pairs = (
        ds.map_batches(sign, batch_format="pyarrow")
        .map_batches(explode, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ------------------------------------------------- embedding near-dup ----


def embedding_candidate_pairs(ds, key_column: str = "vec_id",
                              vec_column: str = "embedding", *,
                              threshold: float = 0.9, num_bits: int = 64,
                              num_bands: int = 8, seed: int = 42):
    """Embedding-cosine near-dup via signed-random-projection LSH:
    64-bit hyperplane signature per vector → 8×8-bit band buckets →
    exact cosine verify in-bucket (embeddings ride along: 64 floats)."""

    class Sign:
        def __init__(self):
            self.planes = None   # lazily sized to the vector dim

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column(key_column).to_pylist()
            vecs = np.asarray(batch.column(vec_column).to_pylist(), dtype=np.float64)
            if self.planes is None:
                rng = np.random.RandomState(seed)
                self.planes = rng.standard_normal((vecs.shape[1], num_bits))
            proj = vecs @ self.planes > 0
            sigs = np.zeros(len(keys), dtype=np.uint64)
            for b in range(num_bits):
                sigs |= proj[:, b].astype(np.uint64) << np.uint64(b)
            out_band, out_key, out_vec = [], [], []
            bits_per_band = num_bits // num_bands
            mask = (1 << bits_per_band) - 1
            for i, k in enumerate(keys):
                s = int(sigs[i])
                for band in range(num_bands):
                    val = (s >> (bits_per_band * band)) & mask
                    out_band.append(f"{band}:{val}")
                    out_key.append(k)
                    out_vec.append(vecs[i].tolist())
            return pa.Table.from_arrays(
                [pa.array(out_band, pa.string()), pa.array(out_key),
                 pa.array(out_vec, pa.list_(pa.float64()))],
                names=["band_key", key_column, vec_column],
            )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.drop_duplicates(subset=[key_column]).sort_values(key_column)
        keys = rows[key_column].tolist()
        if len(keys) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        mat = np.asarray(rows[vec_column].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        a_out, b_out, c_out = [], [], []
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                if sims[i, j] >= threshold:
                    a_out.append(keys[i]); b_out.append(keys[j])
                    c_out.append(float(sims[i, j]))
        return pd.DataFrame({"a": a_out, "b": b_out, "cosine": c_out})

    pairs = (
        ds.map_batches(Sign(), batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ------------------------------------------------------- union-find ----


def clusters_from_pairs(pairs: list[tuple]) -> dict:
    """Driver-side union-find over the confirmed pair set → {key: root}.

    Assumption (documented): confirmed duplicate pairs are a small
    fraction of the corpus. At 10^12-doc scale swap in iterative
    min-label propagation over a pairs Dataset; the interface (pairs in,
    key→root out) is unchanged."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min root wins → deterministic cluster ids
            lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
            parent[hi] = lo
    return {k: find(k) for k in parent}


def drop_set_from_pairs(pairs: list[tuple]) -> set:
    """Keys to drop: every cluster member except the (min) root."""
    roots = clusters_from_pairs(pairs)
    return {k for k, r in roots.items() if k != r}
