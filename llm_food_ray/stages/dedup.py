"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference's only dedup is exact input dedup before submission
(F6, llm_food/cli.py:206-218: ``sorted(list(set(abs_paths)))``); at
training-data scale dedup is a first-class pipeline stage, so the family
is implemented here as Ray Data shuffle patterns:

- exact:   hash column per batch → partials (hash, min key) → driver
           merge + broadcast keep-filter (``reduce="driver"``) or a
           bucketed groupby + partitioned LEFT SEMI keep-join
           (``reduce="shuffle"``, the scale path)
- minhash: shingle→signature per batch → explode to (band_hash, key)
           rows (16 B — payloads never ride the band explode) →
           coarse-bucket shuffle → in-bucket candidate pairs → bucketed
           semi-join verification (signatures hash-joined onto both pair
           sides, scored in-partition) → min-label-propagation
           connected components (``clusters_min_label``) → LEFT ANTI
           drop-set join (``dedup_near_keep``)
- simhash: 64-bit signature, banded into 4×16-bit chunks (exact for
           hamming distance ≤ 3 by pigeonhole) → same pair machinery
- embedding: random-hyperplane signature (SRP-LSH) → banded buckets →
           exact cosine verify in-bucket

Partitioning assumptions (documented per north_rule): band bucket groups
are small (LSH property).  The distributed verify/cluster path holds
nothing pair- or signature-shaped on the driver; the driver-side twins
(``verify_exec="driver"``, ``clusters_from_pairs``) exist for
small-scale/debug runs and as pytest equality oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import (
    MinHasher,
    _mix64 as _mix_u64,
    hamming64,
    jaccard,
    md5_hex,
    shingle_hashes,
    simhash64,
)

_FNV_PRIME_64 = np.uint64(1099511628211)

# ------------------------------------------------------------- exact ----


def add_content_hash(ds, text_column: str = "text", out_column: str = "content_md5"):
    def _hash(batch: pa.Table) -> pa.Table:
        vals = [md5_hex(t or "") for t in batch.column(text_column).to_pylist()]
        return batch.append_column(out_column, pa.array(vals, pa.string()))

    return ds.map_batches(_hash, batch_format="pyarrow")


def dedup_exact(ds, key_column: str = "doc_id", text_column: str = "text", *,
                num_buckets: int = 64, reduce: str = "driver"):
    """Keep the min-key row per distinct content hash (F6's scale form).

    Phase 1 computes the kept-key set while moving ONLY ``(content_md5,
    min key)`` partials (32 B/row, never the text):

    - ``reduce="driver"`` (default): each batch pre-reduces hash->min-key
      with a vectorized Arrow group_by, partials stream to the driver and
      merge there.  No shuffle at all -- and no NEW scale assumption: the
      kept-key set already has to fit the driver/object store for the
      phase-2 broadcast, and the merged partials are the same order of
      size.
    - ``reduce="shuffle"`` (the scale path): ONE groupby shuffle into
      ``num_buckets`` coarse hash buckets, vectorized
      ``groupby(hash).min(key)`` per bucket, then a partitioned LEFT SEMI
      join of the corpus against the kept-key set (hash-partition both
      sides on key, filter per partition).  Nothing lands on the driver
      and nothing is broadcast — correct even when the distinct-hash set
      outgrows one machine.  (Coarse buckets, not groupby(hash):
      ``map_groups`` over millions of singleton hash groups pays pandas
      per group and crawls.)

    ``reduce="driver"`` phase 2 broadcasts the kept keys once via the
    object store and filters the original dataset in a second streaming
    pass -- no payload shuffle, but the kept-key set must fit one
    machine.  Both paths are byte-equal (pytest-pinned); pick "driver"
    when kept-keys fit comfortably (it avoids re-shuffling payload
    bytes), "shuffle" beyond that."""
    import ray as _ray

    def hash_partial(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_column).to_pylist()]
        hashes = pa.array([md5_hex(t) for t in texts], pa.string())
        t = pa.Table.from_arrays([hashes, batch.column(key_column)],
                                 names=["content_md5", key_column])
        g = t.group_by(["content_md5"]).aggregate([(key_column, "min")])
        return g.rename_columns(["content_md5", key_column])

    if reduce == "driver":
        # merge in Arrow end to end: a pandas concat+groupby here builds
        # multi-hundred-MB object blocks, which this class of host handles
        # pathologically slowly; the C++ group_by does not
        parts = list(ds.map_batches(hash_partial, batch_format="pyarrow")
                       .iter_batches(batch_size=65_536, batch_format="pyarrow"))
        merged = pa.concat_tables(parts)
        final = merged.group_by(["content_md5"]).aggregate(
            [(key_column, "min")])
        kept_keys = final.column(f"{key_column}_min").to_numpy(
            zero_copy_only=False)
    elif reduce == "shuffle":
        def add_bucket(batch: pa.Table) -> pa.Table:
            buckets = [int(h[:8], 16) % num_buckets
                       for h in batch.column("content_md5").to_pylist()]
            return batch.append_column("__bucket", pa.array(buckets, pa.int32()))

        def min_key_per_hash(group: pd.DataFrame) -> pd.DataFrame:
            kept = group.groupby("content_md5", sort=False)[key_column].min()
            return pd.DataFrame({key_column: kept.to_numpy()})

        kept_ds = (ds.map_batches(hash_partial, batch_format="pyarrow")
                     .map_batches(add_bucket, batch_format="pyarrow")
                     .groupby("__bucket")
                     .map_groups(min_key_per_hash, batch_format="pandas")
                     .materialize())   # keep-set ready before the join plan
        kept_ds = _nonempty_blocks(kept_ds)
        if kept_ds is None:   # empty input → nothing to keep
            return ds
        # partitioned keep-join: both sides hash-partitioned on the key,
        # matching rows kept per partition — never a driver merge or a
        # broadcast key set
        return ds.join(kept_ds, "left_semi", _join_partitions(num_buckets // 4),
                       on=(key_column,), right_on=(key_column,))
    else:
        raise ValueError(f"reduce={reduce!r}")
    keys_ref = _ray.put(pa.array(np.sort(kept_keys)))

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column(key_column),
                                     value_set=_ray.get(keys_ref)))

    return ds.map_batches(keep, batch_format="pyarrow")


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


def _coarse_bucket_pairs(banded, bucket_pairs_fn, sim_col: str = None, *,
                         num_coarse: int = 256, key_column: str = None):
    """Run `bucket_pairs_fn` per band bucket WITHOUT paying Ray map_groups
    overhead per bucket.

    Most band buckets are singletons (unique docs) — grouping the Dataset
    directly on band_key makes one pandas group per bucket and crawls.
    Instead: ONE shuffle into `num_coarse` buckets of band keys, then per
    coarse group (i) drop singleton band keys with a vectorized
    duplicated() mask, (ii) iterate only the real (multi-member) buckets
    via pandas groupby.  `band_key` may be a string or a uint64 hash."""
    import zlib

    def add_cb(batch: pa.Table) -> pa.Table:
        col = batch.column("band_key")
        if pa.types.is_unsigned_integer(col.type) or pa.types.is_integer(col.type):
            vals = np.asarray(col.combine_chunks(), dtype=np.uint64)
            cb = (vals % np.uint64(num_coarse)).astype(np.int32)
            return batch.append_column("__cb", pa.array(cb))
        keys = col.to_pylist()
        cb = [zlib.crc32(k.encode()) % num_coarse for k in keys]
        return batch.append_column("__cb", pa.array(cb, pa.int32()))

    cols = ["a", "b"] + ([sim_col] if sim_col else [])
    empty = pd.DataFrame({c: [] for c in cols})

    def per_coarse(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.duplicated("band_key", keep=False)]
        if not len(df):
            return empty
        outs = [bucket_pairs_fn(g) for _bk, g in df.groupby("band_key", sort=False)]
        outs = [o for o in outs if len(o)]
        return pd.concat(outs, ignore_index=True) if outs else empty

    return (banded.map_batches(add_cb, batch_format="pyarrow")
                  .groupby("__cb")
                  .map_groups(per_coarse, batch_format="pandas"))


def _dedup_pairs(pairs, sim_col: str):
    """Collapse the same (a, b) pair surfacing from multiple bands: a
    native vectorized aggregate (sim is identical across bands), NOT a
    per-pair map_groups — millions of singleton groups would pay Python
    overhead per pair."""
    from ray.data.aggregate import Max

    return pairs.groupby(["a", "b"]).aggregate(Max(sim_col, alias_name=sim_col))


def _nonempty_blocks(mat_ds):
    """Rebuild a MATERIALIZED Dataset from only its non-empty blocks.

    Ray's hash-shuffle operators (join/aggregate) emit zero-row blocks
    with an EMPTY schema for empty partitions; map transforms skip empty
    blocks, so the schema-less blocks survive and break key resolution in
    any downstream join partition that receives only them.  Only block
    METADATA touches the driver here — the data refs stay in the object
    store (zero-copy)."""
    import ray.data as rd

    refs = []
    for bundle in mat_ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    return rd.from_arrow_refs(refs) if refs else None


def _join_partitions(requested: int | None) -> int:
    """Hash-join partition count.  ``None`` → one partition per cluster
    CPU (every partition is an aggregator actor; fewer under-parallelizes
    the per-partition join finalize, more thrashes the scheduler — e.g. a
    16-way join on a 4-CPU test session sits mostly idle).  An explicit
    ``requested`` is still capped by the CPU count for the same reason;
    on a real multi-node cluster pass the node×core product."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or (requested or 4)
    except Exception:
        cpus = requested or 4
    if requested is None:
        return max(2, cpus)
    return max(2, min(requested, cpus))


def _list_col_to_binary(col: pa.ChunkedArray | pa.Array,
                        itemsize: int = 8) -> pa.Array:
    """list<uint64> column → binary column (each value = the raw words),
    built from the list buffers without a Python-object hop.
    ``itemsize=4`` narrows to uint32 first — minhash components are
    32-bit by construction (``MinHasher`` masks with 2^32-1), so packing
    them as uint32 halves every downstream exchange losslessly."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.uint64)
    if itemsize == 4:
        flat = flat.astype(np.uint32)
    offs32 = (col.offsets.to_numpy().astype(np.int64) * itemsize).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), len(col),
        [None, pa.py_buffer(offs32.tobytes()), pa.py_buffer(flat.tobytes())],
    )


def _key_buckets(values, num_coarse: int) -> np.ndarray:
    """Coarse int32 bucket ids for a key array (Arrow array, numpy array
    or pandas Series; integer or string keys)."""
    import zlib

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        if pa.types.is_integer(values.type):
            v = values.to_numpy(zero_copy_only=False).astype(np.uint64)
            return (_mix_u64(v) % np.uint64(num_coarse)).astype(np.int32)
        values = values.to_pylist()
    elif isinstance(values, pd.Series):
        if pd.api.types.is_integer_dtype(values):
            v = values.to_numpy().astype(np.uint64)
            return (_mix_u64(v) % np.uint64(num_coarse)).astype(np.int32)
        values = values.tolist()
    return np.fromiter(
        (zlib.crc32(str(x).encode()) % num_coarse for x in values),
        dtype=np.int32, count=len(values))


def _verify_pairs_distributed(pairs_ds, sig_ds, key_column: str, *,
                              num_perm: int, threshold: float, verify: str,
                              num_partitions: int | None = None):
    """Bucketed semi-join verification — the scale path (no driver pair
    materialization, no driver signature matrix):

    - Pass 1 (bucket = hash(a) % C): raw candidate pairs and signature
      rows shuffle into the same int32 coarse bucket; in-bucket, pairs
      are made DISTINCT (band duplicates share ``a``, hence a bucket —
      never a sort-aggregate keyed on the pair strings, which crawls)
      and a vectorized merge attaches sig_a.
    - Pass 2 (bucket = hash(b) % C): half-joined pairs meet the
      signature rows again; an in-bucket merge attaches sig_b and the
      similarity is scored immediately, emitting only confirmed
      (a, b, sim) rows.

    Two int32-keyed coarse shuffles total; each signature ships as ONE
    binary value per pair side (uint32-packed for minhash), never
    through the band explode and never to the driver.  Equivalent
    hash-joins (``Dataset.join``) measured ~2× slower here — the
    aggregator-actor exchange re-copies payload bytes more times than
    the sort-shuffle does.  Returns a Dataset (a, b, sim)."""
    exact = verify == "exact"
    payload_col = "shingles" if exact else "minhash_sig"
    dt = np.uint64 if exact else np.uint32
    itemsize = 8 if exact else 4
    num_coarse = num_partitions or 64

    def sig_rows(b: pa.Table) -> pa.Table:
        keys = b.column(key_column)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        n = b.num_rows
        # b carries the key again rather than nulls: a null int column
        # becomes float64 in the per-bucket pandas frame, which silently
        # breaks both the bucket hash and the pandas merges on "b"
        return pa.Table.from_arrays(
            [pa.array(_key_buckets(keys, num_coarse)),
             pa.array(np.ones(n, dtype=np.int8)),
             keys, keys,
             _list_col_to_binary(b.column(payload_col), itemsize)],
            names=["__pb", "kind", "a", "b", "sig"],
        )

    def pair_rows(b: pa.Table) -> pa.Table:
        a = b.column("a")
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        n = b.num_rows
        return pa.Table.from_arrays(
            [pa.array(_key_buckets(a, num_coarse)),
             pa.array(np.zeros(n, dtype=np.int8)),
             a, b.column("b"), pa.nulls(n, pa.binary())],
            names=["__pb", "kind", "a", "b", "sig"],
        )

    sig_tag = sig_ds.map_batches(sig_rows, batch_format="pyarrow")
    pr = pairs_ds.map_batches(pair_rows, batch_format="pyarrow")
    cols = ["__pb", "kind", "a", "b", "sig"]

    def _key_type(df: pd.DataFrame) -> pa.DataType:
        return (pa.int64() if pd.api.types.is_integer_dtype(df["a"])
                else pa.string())

    # fns return ARROW tables with a pinned schema (the groupby sort
    # cannot shuffle a union of pandas and Arrow blocks, and empty pandas
    # frames would type the binary column as null)
    def pass1(df: pd.DataFrame) -> pa.Table:
        p = df[df["kind"] == 0]
        s = df[df["kind"] == 1]
        kt = _key_type(df)
        if not len(p) or not len(s):
            return pa.table({"__pb": pa.array([], pa.int32()),
                             "kind": pa.array([], pa.int8()),
                             "a": pa.array([], kt), "b": pa.array([], kt),
                             "sig": pa.array([], pa.binary())})
        p = p.drop_duplicates(subset=["a", "b"])
        m = p[["a", "b"]].merge(s[["a", "sig"]], on="a", how="inner")
        return pa.Table.from_arrays(
            [pa.array(_key_buckets(m["b"], num_coarse)),
             pa.array(np.zeros(len(m), dtype=np.int8)),
             pa.array(m["a"], kt), pa.array(m["b"], kt),
             pa.array(m["sig"].tolist(), pa.binary())],
            names=cols)

    half = (sig_tag.union(pr).groupby("__pb")
                   .map_groups(pass1, batch_format="pandas"))

    def pass2(df: pd.DataFrame) -> pa.Table:
        p = df[df["kind"] == 0]
        s = df[df["kind"] == 1]
        kt = _key_type(df)
        if not len(p) or not len(s):
            return pa.table({"a": pa.array([], kt), "b": pa.array([], kt),
                             "sim": pa.array([], pa.float64())})
        m = p[["a", "b", "sig"]].merge(
            s[["a", "sig"]].rename(columns={"a": "b", "sig": "sig_b"}),
            on="b", how="inner")
        n = len(m)
        sims = np.empty(n, dtype=np.float64)
        if exact:
            for i, (xa, xb) in enumerate(zip(m["sig"], m["sig_b"])):
                sims[i] = jaccard(np.frombuffer(xa, dtype=dt),
                                  np.frombuffer(xb, dtype=dt))
        else:
            A = np.frombuffer(b"".join(m["sig"]), dtype=dt).reshape(n, num_perm)
            B = np.frombuffer(b"".join(m["sig_b"]), dtype=dt).reshape(n, num_perm)
            sims = (A == B).mean(axis=1)
        mk = sims >= threshold
        return pa.table({"a": pa.array(m["a"].to_numpy()[mk], kt),
                         "b": pa.array(m["b"].to_numpy()[mk], kt),
                         "sim": pa.array(sims[mk], pa.float64())})

    return (sig_tag.union(half).groupby("__pb")
                   .map_groups(pass2, batch_format="pandas"))


def minhash_candidate_pairs(ds, key_column: str = "doc_id",
                            text_column: str = "text", *,
                            num_perm: int = 128, num_bands: int = 16,
                            k_shingle: int = 3, threshold: float = 0.8,
                            verify: str = "estimate", seed: int = 42,
                            pair_mode: str = "all",
                            verify_exec: str = "distributed",
                            num_partitions: int | None = None):
    """→ Dataset of confirmed near-dup pairs (a, b, sim), a < b.

    Two-phase plan (the banded shuffle carries ONLY (band_hash, key) —
    8+8 bytes/row — never the 1 KB signature; shipping signatures through
    the band explode is what makes the naive plan crawl):

      1. signatures per batch (vectorized crc/splitmix shingles) →
         numeric band hashes → coarse-bucket shuffle → candidate pairs
         (pair_mode="star": (bucket-min, member) only — linear in cluster
         size, enough for connected-component connectivity; "all": every
         in-bucket pair, for exact pair listings).
      2. verify: score each candidate pair against the signatures (or
         shingle sets, verify="exact") and keep sim ≥ threshold.

    verify="estimate": sim = fraction of agreeing minhash components
    (unbiased Jaccard estimator). verify="exact": sim = exact shingle-set
    Jaccard.

    ``verify_exec`` picks the phase-2 plan:
    - "distributed" (default, the scale path): bucketed semi-join —
      distinct pairs shuffled to ``num_partitions`` hash partitions,
      signatures hash-joined onto both sides, scored in-partition.
      Nothing pair- or signature-shaped ever lands on the driver; works
      even when candidates are most of the corpus (duplicate-heavy input).
    - "driver" (small-scale/debug): candidate payloads broadcast-filtered
      and scored in one vectorized pass on the driver.  Assumes the
      candidate pair set fits driver memory.
    Both produce identical output (pytest-pinned).
    """
    if verify not in ("estimate", "exact"):
        raise ValueError(f"verify={verify!r}")
    if pair_mode not in ("all", "star"):
        raise ValueError(f"pair_mode={pair_mode!r}")
    if verify_exec not in ("distributed", "driver"):
        raise ValueError(f"verify_exec={verify_exec!r}")
    import ray.data as rd

    sig_stage = MinHashSignatures(key_column, text_column, num_perm, k_shingle,
                                  keep_shingles=(verify == "exact"), seed=seed)
    # materialized: read twice (banding + candidate fetch) without
    # recomputing shingles; blocks spill to disk if they outgrow memory
    sig_ds = ds.map_batches(sig_stage, batch_format="pyarrow").materialize()

    rows_per_band = num_perm // num_bands

    def explode_keys(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig_col = batch.column("minhash_sig")
        flat = np.asarray(sig_col.combine_chunks().flatten(), dtype=np.uint64)
        sigs = flat.reshape(n, num_perm)
        keys = batch.column(key_column)
        out_hash = np.empty(n * num_bands, dtype=np.uint64)
        for b in range(num_bands):
            chunk = sigs[:, b * rows_per_band:(b + 1) * rows_per_band]
            acc = np.full(n, np.uint64(b + 1), dtype=np.uint64)
            for j in range(rows_per_band):
                acc = acc * _FNV_PRIME_64 + chunk[:, j]
            out_hash[b::num_bands] = _mix_u64(acc)
        idx = np.repeat(np.arange(n), num_bands)
        return pa.Table.from_arrays(
            [pa.array(out_hash), keys.take(pa.array(idx))],
            names=["band_key", key_column],
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        keys = np.sort(group[key_column].unique())
        if len(keys) < 2:
            return pd.DataFrame({"a": [], "b": []})
        if pair_mode == "star":
            return pd.DataFrame({"a": np.repeat(keys[0], len(keys) - 1),
                                 "b": keys[1:]})
        iu, ju = np.triu_indices(len(keys), k=1)
        return pd.DataFrame({"a": keys[iu], "b": keys[ju]})

    banded = sig_ds.map_batches(explode_keys, batch_format="pyarrow")
    pairs_ds = _coarse_bucket_pairs(banded, bucket_pairs, key_column=key_column)
    if verify_exec == "distributed":
        # candidate pairs are tiny (16 B/row) — materializing lets the
        # empty-guard count run without recomputing candidate generation
        pairs_ds = pairs_ds.materialize()
        if pairs_ds.count() == 0:
            return rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                           "b": pa.array([], pa.int64()),
                                           "sim": pa.array([], pa.float64())}))
        return _verify_pairs_distributed(
            pairs_ds, sig_ds, key_column, num_perm=num_perm,
            threshold=threshold, verify=verify, num_partitions=num_partitions)
    # distinct in Arrow (group_by with no aggregates), pandas only at the
    # final (deduped) size — big pandas object blocks crawl on this host
    raw = pa.concat_tables(
        list(pairs_ds.iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default")
    pairs = (raw.group_by(["a", "b"]).aggregate([]).to_pandas()
             if raw.num_rows else pd.DataFrame({"a": [], "b": []}))
    if not len(pairs):
        return rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                       "b": pa.array([], pa.int64()),
                                       "sim": pa.array([], pa.float64())}))

    # ---- phase 2: fetch candidate payloads, verify vectorized ----------
    import pyarrow.compute as pc

    cand_key_set = set(pairs["a"]) | set(pairs["b"])
    cols = [key_column, "shingles" if verify == "exact" else "minhash_sig"]
    n_corpus = sig_ds.count()
    if len(cand_key_set) >= n_corpus // 2:
        # candidates are most of the corpus (duplicate-heavy input):
        # filtering would ship a giant key set per task for no reduction
        cand_ds = sig_ds.select_columns(cols)
    else:
        # broadcast the key set ONCE via the object store; a closure
        # capture would re-serialize it with every task
        import ray as _ray

        keys_ref = _ray.put(pa.array(sorted(cand_key_set)))

        def filt(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b.column(key_column),
                                     value_set=_ray.get(keys_ref)))

        cand_ds = sig_ds.map_batches(filt, batch_format="pyarrow").select_columns(cols)
    if verify == "exact":
        cand = cand_ds.to_pandas()
        payload = dict(zip(cand[key_column], cand[cols[1]]))
        cache = {k: np.asarray(v, dtype=np.uint64) for k, v in payload.items()}
        sims = np.empty(len(pairs), dtype=np.float64)
        for i, (a, b) in enumerate(zip(pairs["a"], pairs["b"])):
            sims[i] = jaccard(cache[a], cache[b])
    else:
        # stream Arrow batches → one (n_cand, num_perm) uint64 matrix with
        # zero Python-object hops (to_pandas on a big list column crawls),
        # then score every pair with one boolean matrix reduction
        key_parts, mat_parts = [], []
        for b in cand_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            key_parts.append(b.column(key_column).to_numpy(zero_copy_only=False))
            flat = np.asarray(b.column(cols[1]).combine_chunks().flatten(),
                              dtype=np.uint64)
            mat_parts.append(flat.reshape(b.num_rows, num_perm))
        keys_arr = np.concatenate(key_parts)
        sig_mat = np.vstack(mat_parts)
        index = pd.Index(keys_arr)
        ai = index.get_indexer(pairs["a"])
        bi = index.get_indexer(pairs["b"])
        # chunked compare: one giant fancy-index gather allocates
        # 2×(n_pairs × num_perm × 8B) at once and crawls on first-touch;
        # a 32k-pair working set stays cache-resident (~35x faster)
        sims = np.empty(len(pairs), dtype=np.float64)
        step = 32_768
        for s in range(0, len(pairs), step):
            e = min(s + step, len(pairs))
            sims[s:e] = (sig_mat[ai[s:e]] == sig_mat[bi[s:e]]).mean(axis=1)
    pairs = pairs.assign(sim=sims)
    pairs = pairs[pairs["sim"] >= threshold].reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(pairs, preserve_index=False))


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

    banded = (ds.map_batches(sign, batch_format="pyarrow")
                .map_batches(explode, batch_format="pyarrow"))
    pairs = _coarse_bucket_pairs(banded, bucket_pairs, "hamming")
    return _dedup_pairs(pairs, "hamming")


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
            from ..stages.similarity import vectors_to_matrix

            keys = batch.column(key_column)
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            vecs = vectors_to_matrix(batch.column(vec_column))
            n, dim = vecs.shape
            if self.planes is None:
                rng = np.random.RandomState(seed)
                self.planes = rng.standard_normal((dim, num_bits))
            proj = vecs @ self.planes > 0
            sigs = np.zeros(n, dtype=np.uint64)
            for b in range(num_bits):
                sigs |= proj[:, b].astype(np.uint64) << np.uint64(b)
            bits_per_band = num_bits // num_bands
            mask = np.uint64((1 << bits_per_band) - 1)
            # vectorized explode: n × num_bands band rows, vectors carried
            # via a zero-copy ListArray over the repeated matrix
            band_ids = np.arange(num_bands)
            vals = (sigs[:, None] >> (np.uint64(bits_per_band) * band_ids[None, :]
                                      ).astype(np.uint64)) & mask
            band_strs = np.char.add(
                np.char.add(band_ids.astype(str), ":"),
                vals.astype(np.int64).astype(str),
            ).ravel()
            idx = np.repeat(np.arange(n), num_bands)
            rep = vecs[idx]
            offsets = pa.array(np.arange(len(idx) + 1, dtype=np.int32) * dim)
            vec_arr = pa.ListArray.from_arrays(
                offsets, pa.array(rep.ravel(), pa.float64()))
            return pa.Table.from_arrays(
                [pa.array(band_strs.tolist(), pa.string()),
                 keys.take(pa.array(idx)), vec_arr],
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

    banded = ds.map_batches(Sign(), batch_format="pyarrow")
    pairs = _coarse_bucket_pairs(banded, bucket_pairs, "cosine")
    return _dedup_pairs(pairs, "cosine")


# ------------------------------------- clustering (connected components) ----


def _labels_checksum(labels) -> int:
    """Distributed order-free checksum of a (node, label) Dataset.  Labels
    only move downward during propagation, so an unchanged checksum ⟺
    converged (up to a ~2^-40 collision chance per round)."""
    import zlib

    from ray.data.aggregate import Sum

    def h(b: pa.Table) -> pa.Table:
        col = b.column("label")
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            v = np.fromiter((zlib.crc32(str(x).encode()) for x in col.to_pylist()),
                            dtype=np.uint64, count=len(col))
        hv = (_mix_u64(v) >> np.uint64(24)).astype(np.int64)   # 40-bit terms
        return pa.table({"h": pa.array(hv)})

    res = labels.map_batches(h, batch_format="pyarrow").aggregate(Sum("h"))
    return res["sum(h)"] or 0


def clusters_min_label(pairs_ds, *, num_partitions: int | None = None,
                       max_rounds: int = 50):
    """Distributed connected components over a confirmed-pairs Dataset via
    iterative min-label propagation — the scale replacement for the
    driver union-find (``clusters_from_pairs``): nothing graph-shaped ever
    lands on the driver.

    → Dataset (node, label) covering every key that appears in a pair;
    ``label`` = the minimum key reachable from ``node`` (identical to the
    union-find's min-root by induction on merges).

    Each round is one hash-join (edge ⋈ labels on the neighbor key) plus
    one groupby-min — both over the 2×|pairs| edge list, fully streamed.
    Rounds needed = component diameter: ≤2 for duplicate clusters (band
    buckets make them near-cliques), O(log n) worst-case chains.  A
    distributed checksum (labels are monotone non-increasing) detects the
    fixpoint without materializing labels on the driver."""
    from ray.data.aggregate import Min

    num_partitions = _join_partitions(num_partitions)

    # edge columns named (src, nbr) so the round join has ZERO column-name
    # overlap with labels (node, label) — a shared "node" name on both
    # sides confuses the hash-join key resolution
    def sym(b: pa.Table) -> pa.Table:
        t1 = pa.Table.from_arrays([b.column("a"), b.column("b")],
                                  names=["src", "nbr"])
        t2 = pa.Table.from_arrays([b.column("b"), b.column("a")],
                                  names=["src", "nbr"])
        return pa.concat_tables([t1, t2])

    edges = (pairs_ds.select_columns(["a", "b"])
                     .map_batches(sym, batch_format="pyarrow").materialize())
    labels = edges.groupby("src").aggregate(Min("nbr", alias_name="label"))

    def clamp(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lab = pc.min_element_wise(b.column("src"), b.column("label"))
        return pa.Table.from_arrays([b.column("src"), lab],
                                    names=["node", "label"])

    labels = _nonempty_blocks(
        labels.map_batches(clamp, batch_format="pyarrow").materialize())
    if labels is None:   # no pairs → no labels
        import ray.data as rd

        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "label": pa.array([], pa.int64())}))
    prev = _labels_checksum(labels)
    for _ in range(max_rounds):
        nbr_lab = edges.join(labels, "inner", num_partitions,
                             on=("nbr",), right_on=("node",))
        contrib = nbr_lab.map_batches(
            lambda b: pa.Table.from_arrays([b.column("src"), b.column("label")],
                                           names=["node", "label"]),
            batch_format="pyarrow")
        cand = contrib.union(labels.select_columns(["node", "label"]))
        labels = _nonempty_blocks(
            cand.groupby("node")
                .aggregate(Min("label", alias_name="label"))
                .materialize())
        cur = _labels_checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels


def drop_nodes_min_label(labels):
    """(node, label) → Dataset of the keys to DROP: every cluster member
    except the (min) root.  Small by construction (only duplicates)."""
    def f(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.invert(pc.equal(b.column("node"), b.column("label")))
        return b.filter(mask).select(["node"])

    return labels.map_batches(f, batch_format="pyarrow")


def dedup_near_keep(ds, key_column: str, pairs_ds, *,
                    num_partitions: int | None = None):
    """Near-dup kept-set, fully distributed: cluster the confirmed pairs
    with min-label propagation, then LEFT ANTI join the corpus against the
    drop set (one hash shuffle keyed on ``key_column``) — no driver
    union-find, no broadcast drop list."""
    labels = clusters_min_label(pairs_ds, num_partitions=num_partitions)
    drop = _nonempty_blocks(drop_nodes_min_label(labels).materialize())
    if drop is None:   # no duplicates found → corpus unchanged
        return ds
    return ds.join(drop, "left_anti", _join_partitions(num_partitions),
                   on=(key_column,), right_on=("node",))


# ------------------------------------------------------- union-find ----


def clusters_from_pairs(pairs: list[tuple]) -> dict:
    """Driver-side union-find over the confirmed pair set → {key: root}.

    Small-scale/debug twin of ``clusters_min_label`` (same min-root
    semantics, pytest-pinned equal); prefer the distributed form whenever
    the pair set is worth distributing."""
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
            # min root wins → deterministic cluster ids.  Native comparison
            # (keys are homogeneous per pipeline): str() ordering would make
            # 1000000 < 9 lexicographically and drop the original instead of
            # its injected duplicate.
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    return {k: find(k) for k in parent}


def drop_set_from_pairs(pairs: list[tuple]) -> set:
    """Keys to drop: every cluster member except the (min) root."""
    roots = clusters_from_pairs(pairs)
    return {k for k, r in roots.items() if k != r}
