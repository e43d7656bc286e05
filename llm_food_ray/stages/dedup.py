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
- minhash: shingle→signature per batch → 128-bit key fingerprints →
           explode to (band_hash, fp) rows (24 B — neither payloads nor
           raw keys ride the band explode) → coarse-bucket shuffle →
           in-bucket candidate pairs (numpy over packed fp views) →
           verification: broadcast signature index scored in parallel
           ``map_batches`` while the index fits a node (default), or a
           bucketed fp-space semi-join when it does not → min-label
           propagation connected components (``clusters_min_label``) →
           LEFT ANTI drop-set join (``dedup_near_keep``)
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

from .joins import _join_partitions, _nonempty_blocks, safe_join  # noqa: F401
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

# telemetry: rounds the last clusters_min_label call took to converge
LAST_PROPAGATION_ROUNDS = 0

# ------------------------------------------------------------- exact ----


def add_content_hash(ds, text_column: str = "text", out_column: str = "content_md5"):
    def _hash(batch: pa.Table) -> pa.Table:
        vals = [md5_hex(t or "") for t in batch.column(text_column).to_pylist()]
        return batch.append_column(out_column, pa.array(vals, pa.string()))

    return ds.map_batches(_hash, batch_format="pyarrow")


def dedup_against(ds, seen_ds, *, text_column: str = "text",
                  seen_text_column: str | None = None,
                  exec: str = "auto", num_buckets: int = 64,
                  local_budget_rows: int = 50_000_000,
                  local_budget_bytes: int = 2_000_000_000,
                  num_partitions: int | None = None):
    """Incremental exact dedup: drop every row of ``ds`` whose text
    content already appears in ``seen_ds`` (the previously curated
    corpus) — the delta-crawl step: curate today's shards against
    yesterday's output without re-deduping the whole corpus.  Matching
    is by content md5; duplicates WITHIN ``ds`` are not collapsed
    (compose with :func:`dedup_exact` for that).  No reference analogue
    (llm_food converts files one request at a time); brief-scope.

    Plans (byte-equal, pytest-pinned):

    - ``exec="broadcast"``: per-batch distinct seen-hash partials
      (32 B/row, never the text) gather once and broadcast; ``ds``
      filters with one vectorized ``pc.is_in`` streaming pass.  Right
      while the seen-hash set fits one machine.
    - ``exec="anti"``: coarse-bucket distinct of the seen hashes, then
      a hash-partitioned LEFT ANTI join of ``ds`` (md5 attached) against
      them — nothing on the driver, the 100-TB path.
    - ``exec="auto"`` (default): the dedup_exact gate — materialize the
      seen partials once, broadcast while their row count and byte size
      fit the local budgets, else anti-join.
    - ``exec="bloom"``: the low-dup-rate 100-TB plan — a Bloom filter
      (10 bits/key, k=7, ~1% fp) over the seen hashes broadcasts once;
      bloom-NEGATIVE rows (definitely new — the bulk of a delta crawl)
      stream straight to the output and never enter the join, and only
      bloom-positive candidates (true dups + ~1% false positives) pay
      the partitioned LEFT ANTI join, shrinking the exchange from
      |ds| to ≈ (dup_rate + 1%) × |ds|.  Output is byte-equal to the
      other plans (the exact join clears every false positive);
      pytest-pinned."""
    import pyarrow.compute as pc

    import ray as _ray

    if exec not in ("auto", "broadcast", "anti", "bloom"):
        raise ValueError(f"exec={exec!r}")
    seen_col = seen_text_column or text_column
    out_cols = ds.schema().names

    def seen_partial(batch: pa.Table) -> pa.Table:
        hs = {md5_hex(t or "")
              for t in batch.column(seen_col).to_pylist()}
        return pa.table({"content_md5": pa.array(sorted(hs), pa.string())})

    partials = seen_ds.map_batches(seen_partial, batch_format="pyarrow")
    if exec == "auto":
        partials = partials.materialize()
        exec = ("broadcast"
                if partials.count() <= local_budget_rows
                and (partials.size_bytes() or 0) <= local_budget_bytes
                else "anti")

    def add_md5(batch: pa.Table) -> pa.Table:
        hs = [md5_hex(t or "")
              for t in batch.column(text_column).to_pylist()]
        return batch.append_column("__md5", pa.array(hs, pa.string()))

    if exec == "broadcast":
        parts = list(partials.iter_batches(batch_size=65_536,
                                           batch_format="pyarrow"))
        if not parts:
            return ds
        seen_arr = pc.unique(
            pa.concat_tables(parts).column("content_md5").combine_chunks())
        seen_ref = _ray.put(seen_arr)

        def filt(batch: pa.Table) -> pa.Table:
            hs = pa.array([md5_hex(t or "")
                           for t in batch.column(text_column).to_pylist()],
                          pa.string())
            mask = pc.invert(pc.is_in(hs, value_set=_ray.get(seen_ref)))
            return batch.filter(mask)

        return ds.map_batches(filt, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = [int(h[:8], 16) % num_buckets
                   for h in batch.column("content_md5").to_pylist()]
        return batch.append_column("__bucket", pa.array(buckets, pa.int32()))

    def distinct_hashes(group: pa.Table) -> pa.Table:
        col = group.column("content_md5")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({"content_md5": pc.unique(col)})

    join_input = ds
    bloom_pass = None
    if exec == "bloom":
        partials = partials.materialize()
        n_keys = partials.count()
        if n_keys == 0:
            return ds
        m = max(64, int(n_keys) * _BLOOM_BITS_PER_KEY)
        bits = np.zeros((m + 7) // 8, np.uint8)
        # driver-streamed build: O(m/8) driver memory, one pass over the
        # (distinct, 32 B/row) seen-hash partials — never the corpus
        for b in partials.iter_batches(batch_size=65_536,
                                       batch_format="pyarrow"):
            _bloom_set(bits,
                       _md5_u64(b.column("content_md5").to_pylist()), m,
                       _BLOOM_K)
        bits_ref = _ray.put(bits)

        def definitely_new(batch: pa.Table) -> pa.Table:
            u = _md5_u64([md5_hex(t or "")
                          for t in batch.column(text_column).to_pylist()])
            hit = _bloom_might_contain(_ray.get(bits_ref), u, m, _BLOOM_K)
            return batch.filter(pa.array(~hit))

        def bloom_candidates(batch: pa.Table) -> pa.Table:
            hs = [md5_hex(t or "")
                  for t in batch.column(text_column).to_pylist()]
            hit = _bloom_might_contain(_ray.get(bits_ref), _md5_u64(hs),
                                       m, _BLOOM_K)
            return (batch.append_column("__md5", pa.array(hs, pa.string()))
                         .filter(pa.array(hit)))

        bloom_pass = ds.map_batches(definitely_new, batch_format="pyarrow")
        join_input = ds.map_batches(bloom_candidates, batch_format="pyarrow")

    seen_keys = _nonempty_blocks(
        partials.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(distinct_hashes, batch_format="pyarrow")
                .materialize())
    if seen_keys is None:
        return ds
    if exec == "bloom":
        joined = safe_join(join_input, seen_keys, "left_anti",
                           num_partitions,
                           on=("__md5",), right_on=("content_md5",))
    else:
        joined = safe_join(
            join_input.map_batches(add_md5, batch_format="pyarrow"),
            seen_keys, "left_anti", num_partitions,
            on=("__md5",), right_on=("content_md5",))
    if joined is None:
        # left side was all-empty: ds itself (plain path) or the bloom
        # candidate leg (then the bloom-negative pass IS the answer)
        return bloom_pass if bloom_pass is not None else ds.limit(0)
    joined = joined.select_columns(out_cols)
    if bloom_pass is None:
        return joined
    # the anti-join survivors are bounded by the bloom candidates (true
    # dups never survive; ~1% false positives do) — materialize the tiny
    # leg so a fully-filtered (schema-less) join output can't poison the
    # union with the streaming bloom-negative pass
    joined = _nonempty_blocks(joined.materialize())
    return bloom_pass if joined is None else bloom_pass.union(joined)


def crawl_diff(old_ds, new_ds, key_column: str, hash_column: str, *,
               num_partitions: int | None = None):
    """Snapshot-to-snapshot crawl diff: which urls were added, removed,
    or changed between two crawls — the planning step of every re-crawl
    / delta-curation run (process only the churn, not the whole crawl).
    Returns (key_column, change) with change ∈ {'added', 'removed',
    'changed'}; urls whose content hash is identical in both snapshots
    (the bulk of any re-crawl) are dropped inside the join-output map
    and never leave the workers.  No reference analogue (llm_food
    converts one upload at a time); brief-scope.

    Scale shape: ONE hash-partitioned FULL OUTER join of the two
    (key, content-hash) projections — payloads never ride (hash the
    content upstream); join partition count is CPU-capped
    (``_join_partitions``); output is bounded by the churn mass, not
    the crawl size."""
    import pyarrow.compute as pc

    def prep(key_out: str, hash_out: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({key_out: b.column(key_column),
                             hash_out: b.column(hash_column)})

        return f

    key_type = None
    try:
        key_type = old_ds.schema().base_schema.field(key_column).type
    except Exception:
        pass
    from .joins import _normalize

    old_p = _normalize(old_ds.map_batches(prep("__k_old", "__h_old"),
                                          batch_format="pyarrow"))
    new_p = _normalize(new_ds.map_batches(prep("__k_new", "__h_new"),
                                          batch_format="pyarrow"))
    # full-outer empty-side identities (an all-empty shuffle side has no
    # recoverable schema, so safe_join cannot synthesize them):
    # empty old → every new url is 'added'; empty new → all 'removed'
    if old_p is None and new_p is None:
        joined = None
    elif old_p is None:
        joined = new_p.map_batches(
            lambda b: pa.table({"__k_old": b.column("__k_new"),
                                "__h_old": pa.nulls(b.num_rows,
                                                    pa.string()),
                                "__h_new": b.column("__h_new")}),
            batch_format="pyarrow")
    elif new_p is None:
        joined = old_p.map_batches(
            lambda b: b.append_column("__h_new",
                                      pa.nulls(b.num_rows, pa.string())),
            batch_format="pyarrow")
    else:
        joined = safe_join(old_p, new_p, "full_outer", num_partitions,
                           on=("__k_old",), right_on=("__k_new",))

    def classify(b: pa.Table) -> pa.Table:
        # the join coalesces the key into the LEFT column and drops the
        # right one — side presence is read off the HASH columns (the
        # content hash is non-null by contract)
        ho, hn = b.column("__h_old"), b.column("__h_new")
        added = pc.is_null(ho).to_numpy(zero_copy_only=False)
        removed = pc.is_null(hn).to_numpy(zero_copy_only=False)
        # equal() is null where either side is null → fill False; those
        # rows are added/removed, never unchanged
        same = pc.fill_null(pc.equal(ho, hn),
                            False).to_numpy(zero_copy_only=False)
        keep = added | removed | ~same
        lab = np.where(added, "added", np.where(removed, "removed",
                                                "changed"))
        t = pa.table({
            key_column: b.column("__k_old"),
            "change": pa.array(lab, pa.string()),
        })
        return t.filter(pa.array(keep))

    if joined is None:
        import ray.data as rd

        kt = key_type if key_type is not None else pa.string()
        return rd.from_arrow(pa.table({key_column: pa.array([], kt),
                                       "change": pa.array([], pa.string())}))
    out = joined.map_batches(classify, batch_format="pyarrow")
    if key_type is not None:
        empty = pa.table({key_column: pa.array([], key_type),
                          "change": pa.array([], pa.string())})
        import ray.data as rd

        out = out.union(rd.from_arrow(empty))
    return out


def dedup_exact(ds, key_column: str = "doc_id", text_column: str = "text", *,
                num_buckets: int = 64, reduce: str = "auto",
                local_budget_rows: int = 50_000_000,
                local_budget_bytes: int = 2_000_000_000):
    """Keep the min-key row per distinct content hash (F6's scale form).

    Phase 1 computes the kept-key set while moving ONLY ``(content_md5,
    min key)`` partials (32 B/row, never the text):

    - ``reduce="driver"``: each batch pre-reduces hash->min-key
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
    - ``reduce="auto"`` (default, r3 — the same size gate as the
      near-dup family's ``verify_exec``/``cluster_exec``): materialize
      the 32 B/row partials once, pick "driver" while their row count
      and byte size fit ``local_budget_rows``/``local_budget_bytes``,
      else "shuffle".  The partials are an upper bound on the
      distinct-hash set, so the gate can only err toward the safe
      (distributed) side.

    ``reduce="driver"`` phase 2 broadcasts the kept keys once via the
    object store and filters the original dataset in a second streaming
    pass -- no payload shuffle, but the kept-key set must fit one
    machine.  Both paths are byte-equal (pytest-pinned); "auto" picks
    "driver" when kept-keys fit comfortably (it avoids re-shuffling
    payload bytes), "shuffle" beyond that."""
    import ray as _ray

    def hash_partial(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_column).to_pylist()]
        hashes = pa.array([md5_hex(t) for t in texts], pa.string())
        t = pa.Table.from_arrays([hashes, batch.column(key_column)],
                                 names=["content_md5", key_column])
        g = t.group_by(["content_md5"]).aggregate([(key_column, "min")])
        return g.rename_columns(["content_md5", key_column])

    if reduce not in ("auto", "driver", "shuffle"):
        raise ValueError(f"reduce={reduce!r}")
    partials = ds.map_batches(hash_partial, batch_format="pyarrow")
    if reduce == "auto":
        partials = partials.materialize()
        reduce = ("driver"
                  if partials.count() <= local_budget_rows
                  and (partials.size_bytes() or 0) <= local_budget_bytes
                  else "shuffle")
    if reduce == "driver":
        # merge in Arrow end to end: a pandas concat+groupby here builds
        # multi-hundred-MB object blocks, which this class of host handles
        # pathologically slowly; the C++ group_by does not
        parts = list(partials.iter_batches(batch_size=65_536,
                                           batch_format="pyarrow"))
        merged = pa.concat_tables(parts)
        final = merged.group_by(["content_md5"]).aggregate(
            [(key_column, "min")])
        kept_keys = final.column(f"{key_column}_min").to_numpy(
            zero_copy_only=False)
    else:
        def add_bucket(batch: pa.Table) -> pa.Table:
            buckets = [int(h[:8], 16) % num_buckets
                       for h in batch.column("content_md5").to_pylist()]
            return batch.append_column("__bucket", pa.array(buckets, pa.int32()))

        def min_key_per_hash(group: pa.Table) -> pa.Table:
            g = group.group_by(["content_md5"]).aggregate(
                [(key_column, "min")])
            return pa.table({
                key_column: g.column(f"{key_column}_min")})

        kept_ds = (partials
                   .map_batches(add_bucket, batch_format="pyarrow")
                   .groupby("__bucket")
                   .map_groups(min_key_per_hash, batch_format="pyarrow")
                   .materialize())   # keep-set ready before the join plan
        kept_ds = _nonempty_blocks(kept_ds)
        if kept_ds is None:   # empty input → nothing to keep
            return ds
        # partitioned keep-join: both sides hash-partitioned on the key,
        # matching rows kept per partition — never a driver merge or a
        # broadcast key set
        return safe_join(ds, kept_ds, "left_semi", num_buckets // 4,
                         on=(key_column,), right_on=(key_column,))
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
        # 128-bit key fingerprints ride along from the start: every wide
        # step downstream (banding, verification, clustering) exchanges
        # these 16 bytes instead of the raw key
        fh, fl = _fingerprint128(batch.column(self.key_column))
        arrays += [pa.array(fh, pa.uint64()), pa.array(fl, pa.uint64())]
        names += ["__fh", "__fl"]
        return pa.Table.from_arrays(arrays, names=names)


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


# ---------------------------------------------- 128-bit fingerprints ----
# The minhash near-dup pipeline runs its wide exchanges in a NUMERIC key
# space: every document key is mapped once to a 128-bit fingerprint
# carried as two uint64 columns.  Shuffles then ship 16 B per pair side
# instead of URL-sized strings, and every in-block join is a numpy
# searchsorted over packed big-endian 16-byte views (memcmp order ==
# numeric (hi, lo) order) instead of a pandas object merge — no Python
# string object is ever materialized on the exchange path.  Integer keys
# map injectively ((mix(v), v)) with ZERO collision risk and are restored
# by direct inversion; string keys get two independent seeded vectorized
# 64-bit hashes (polars/xxhash; pandas/siphash fallback) — collision odds
# even at 10^12 docs ≈ (10^12)² / 2^129 ≈ 1.5e-15 — and are restored by a
# bucketed (fp → key) join at the very end.  Fingerprints never persist:
# computed, shuffled and resolved within one pipeline run, so hash
# stability across library versions is not required.

_FP_SEED_HI = 0x517CC1B7
_FP_SEED_LO = 0x27220A95


def _fingerprint128(values) -> tuple[np.ndarray, np.ndarray]:
    """Key array (Arrow/numpy/pandas; integer or string) → (hi, lo)
    uint64 fingerprint pair, fully vectorized."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pd.Series):
        values = pa.array(values)
    if isinstance(values, np.ndarray):
        values = pa.array(values)
    if pa.types.is_integer(values.type):
        v = values.to_numpy(zero_copy_only=False).astype(np.uint64)
        return _mix_u64(v), v
    try:
        import polars as pl

        s = pl.from_arrow(values)
        return (s.hash(seed=_FP_SEED_HI).to_numpy().astype(np.uint64),
                s.hash(seed=_FP_SEED_LO).to_numpy().astype(np.uint64))
    except ImportError:
        from pandas.util import hash_array

        obj = np.asarray(values.to_pylist(), dtype=object)
        return (hash_array(obj, hash_key="llmfood-fp128-hi"),
                hash_array(obj, hash_key="llmfood-fp128-lo"))


def _fp_pack(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """(hi, lo) uint64 arrays → 'S16' big-endian packed fingerprints;
    memcmp order == numeric (hi, lo) order, so numpy sort / unique /
    searchsorted give a consistent total order."""
    b = np.empty((len(hi), 2), dtype=">u8")
    b[:, 0] = hi
    b[:, 1] = lo
    return b.reshape(-1).view("S16")


def _fp_unpack(fp: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    v = np.ascontiguousarray(fp).view(">u8").reshape(-1, 2)
    return v[:, 0].astype(np.uint64), v[:, 1].astype(np.uint64)


def _pair_pack(ah, al, bh, bl) -> np.ndarray:
    """Four uint64 arrays → 'S32' packed (a, b) fingerprint pairs."""
    b = np.empty((len(ah), 4), dtype=">u8")
    b[:, 0] = ah
    b[:, 1] = al
    b[:, 2] = bh
    b[:, 3] = bl
    return b.reshape(-1).view("S32")


def _pair_unpack(p: np.ndarray):
    v = np.ascontiguousarray(p).view(">u8").reshape(-1, 4)
    return (v[:, 0].astype(np.uint64), v[:, 1].astype(np.uint64),
            v[:, 2].astype(np.uint64), v[:, 3].astype(np.uint64))


def _u64_col(b: pa.Table, name: str) -> np.ndarray:
    col = b.column(name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)


def _binary_offsets(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow binary column → (offsets int64[n+1], flat uint8[...]) views
    over the Arrow buffers (no per-value Python objects).  Null values
    read as empty — callers only gather non-null rows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    raw = np.frombuffer(col.buffers()[1], dtype=np.int32)
    off = raw[col.offset:col.offset + len(col) + 1].astype(np.int64)
    data = (np.frombuffer(col.buffers()[2], dtype=np.uint8)
            if col.buffers()[2] is not None else np.empty(0, np.uint8))
    return off, data


def _ragged_gather(off: np.ndarray, flat: np.ndarray, idx: np.ndarray):
    """Vectorized gather of variable-length rows from a ragged array:
    → (new_off int64[len(idx)+1], new_flat) — same element dtype as
    ``flat`` (uint8 for binary payloads, uint64 for shingle sets)."""
    starts = off[idx]
    lens = off[idx + 1] - starts
    new_off = np.zeros(len(idx) + 1, dtype=np.int64)
    np.cumsum(lens, out=new_off[1:])
    total = int(new_off[-1])
    pos = (np.repeat(starts - new_off[:-1], lens)
           + np.arange(total, dtype=np.int64))
    return new_off, flat[pos]


def _binary_from_ragged(new_off: np.ndarray, flat_u8: np.ndarray) -> pa.Array:
    # int32 offsets wrap silently past 2 GiB — fail loudly instead of
    # scoring garbage signatures (a semijoin bucket CAN reach this at
    # ~4M × 512 B sigs; the fix is more/smaller buckets, not int64 here,
    # because mixed binary/large_binary block schemas don't concat).
    if len(new_off) and int(new_off[-1]) >= 2**31:
        raise ValueError(
            f"ragged binary payload {int(new_off[-1])} B exceeds the 2 GiB "
            "int32-offset limit for one block; increase num_partitions / "
            "num_coarse so each bucket's signature payload stays under 2 GiB")
    return pa.Array.from_buffers(
        pa.binary(), len(new_off) - 1,
        [None, pa.py_buffer(new_off.astype(np.int32).tobytes()),
         pa.py_buffer(flat_u8.tobytes())])


def _ordered_pair_columns(ka: pa.Array, kb: pa.Array):
    """Normalize restored key pairs to (min, max) in ORIGINAL key order —
    fingerprint order and key order differ, but the emitted contract is
    a < b by key (matches the SQL oracles and the pre-fp behavior)."""
    import pyarrow.compute as pc

    swap = pc.greater(ka, kb)
    return pc.if_else(swap, kb, ka), pc.if_else(swap, ka, kb)


def _empty_pairs_table(key_type, sim_col: str = "sim") -> pa.Table:
    return pa.table({"a": pa.array([], key_type), "b": pa.array([], key_type),
                     sim_col: pa.array([], pa.float64())})


# --------------------------------------- fp-space candidate generation ----


def _coarse_pairs_fp(banded, pair_mode: str, num_coarse: int = 256):
    """Band rows (band_key u64, __fh, __fl) → candidate pair Dataset
    (ah, al, bh, bl): one coarse exchange, then per-group numpy.
    ONE int32-keyed coarse shuffle of 24 B rows, then per coarse group a
    pure-numpy sweep — sort by band_key, walk multi-member runs, emit
    star ((min-fp, member), linear in bucket size — enough for
    connected-component connectivity) or all (every in-bucket pair)
    candidates over the deduped member fingerprints, distinct within the
    group (full distinct happens at verification)."""

    def add_cb(batch: pa.Table) -> pa.Table:
        vals = _u64_col(batch, "band_key")
        cb = (vals % np.uint64(num_coarse)).astype(np.int32)
        return batch.append_column("__cb", pa.array(cb))

    empty = pa.table({c: pa.array([], pa.uint64())
                      for c in ("ah", "al", "bh", "bl")})

    def per_coarse(t: pa.Table) -> pa.Table:
        bk = _u64_col(t, "band_key")
        fp = _fp_pack(_u64_col(t, "__fh"), _u64_col(t, "__fl"))
        if pair_mode == "star":
            packed = _star_pairs_vec(bk, fp)
            if packed is None:
                return empty
            ah, al, bh, bl = _pair_unpack(np.unique(packed))
            return pa.table({"ah": pa.array(ah), "al": pa.array(al),
                             "bh": pa.array(bh), "bl": pa.array(bl)})
        order = np.argsort(bk, kind="stable")
        bk = bk[order]
        fp = fp[order]
        bounds = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1], True])
        outs = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            members = np.unique(fp[s:e])
            m = len(members)
            if m < 2:
                continue
            iu, ju = np.triu_indices(m, k=1)
            a = members[iu]
            b = members[ju]
            q = np.empty((len(a), 4), dtype=">u8")
            q[:, :2] = a.view(">u8").reshape(-1, 2)
            q[:, 2:] = b.view(">u8").reshape(-1, 2)
            outs.append(q.reshape(-1).view("S32"))
        if not outs:
            return empty
        ah, al, bh, bl = _pair_unpack(np.unique(np.concatenate(outs)))
        return pa.table({"ah": pa.array(ah), "al": pa.array(al),
                         "bh": pa.array(bh), "bl": pa.array(bl)})

    return (banded.map_batches(add_cb, batch_format="pyarrow")
                  .groupby("__cb")
                  .map_groups(per_coarse, batch_format="pyarrow"))


# ------------------------------------------------- signature index ----


class _SigIndex:
    """Fingerprint-sorted signature index: vectorized pair lookup,
    scoring, and key restore.  Broadcast via ``ray.put`` (scoring tasks
    read the numpy buffers zero-copy from the object store) or used
    locally by the driver verify path."""

    def __init__(self, fp16, keys: pa.Array, threshold: float,
                 est_mat=None, sh_off=None, sh_flat=None):
        self.fp16 = fp16
        self.keys = keys
        self.threshold = threshold
        self.est_mat = est_mat
        self.sh_off = sh_off
        self.sh_flat = sh_flat

    def lookup(self, ah, al, bh, bl):
        ia = np.searchsorted(self.fp16, _fp_pack(ah, al))
        ib = np.searchsorted(self.fp16, _fp_pack(bh, bl))
        return ia, ib

    def sims(self, ia, ib) -> np.ndarray:
        if self.est_mat is not None:
            return (self.est_mat[ia] == self.est_mat[ib]).mean(axis=1)
        out = np.empty(len(ia), dtype=np.float64)
        off, flat = self.sh_off, self.sh_flat
        for i in range(len(ia)):
            x, y = ia[i], ib[i]
            out[i] = jaccard(flat[off[x]:off[x + 1]], flat[off[y]:off[y + 1]])
        return out


def _build_sig_index(sig_ds, key_column: str, verify: str, num_perm: int,
                     threshold: float) -> _SigIndex:
    """ONE streaming pass over the materialized signature Dataset →
    fp-sorted index (≈ num_perm×4 + 16 B + key bytes per doc for
    verify="estimate").  Size-gated by the caller (``verify_exec="auto"``
    falls back to the semi-join path when the index would not fit)."""
    exact = verify == "exact"
    his, los, keys, mats, offs, flats = [], [], [], [], [], []
    for b in sig_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        his.append(_u64_col(b, "__fh"))
        los.append(_u64_col(b, "__fl"))
        k = b.column(key_column)
        keys.append(k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k)
        col = b.column("shingles" if exact else "minhash_sig")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(col.flatten(), dtype=np.uint64)
        if exact:
            off = col.offsets.to_numpy().astype(np.int64)
            offs.append(off - off[0])
            flats.append(flat)
        else:
            mats.append(flat.astype(np.uint32).reshape(-1, num_perm))
    fp = _fp_pack(np.concatenate(his), np.concatenate(los))
    order = np.argsort(fp, kind="stable")
    keys_arr = pa.concat_arrays(keys).take(pa.array(order))
    if exact:
        lens = np.concatenate([o[1:] - o[:-1] for o in offs])
        off_all = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=off_all[1:])
        new_off, new_flat = _ragged_gather(off_all, np.concatenate(flats), order)
        return _SigIndex(fp[order], keys_arr, threshold,
                         sh_off=new_off, sh_flat=new_flat)
    return _SigIndex(fp[order], keys_arr, threshold,
                     est_mat=np.vstack(mats)[order])


def _take_arr(col, idx: np.ndarray) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.take(pa.array(idx))


def _finalize_scored_fp(scored_fp, index_ref, key_type, num_coarse: int = 256):
    """Scored fp-space pairs (ah, al, bh, bl, sim — possibly with band
    duplicates) → distinct (a, b, sim) in key space: ONE numeric
    bucketed exchange (same pair ⇒ same a ⇒ same bucket), per-group
    numpy unique over packed 32-byte views, keys attached from the
    broadcast index (zero-copy object-store read), normalized a < b by
    key.  The string keys only materialize on the (small) post-threshold
    survivors — never on the candidate exchange."""
    import ray as _ray

    Cu = np.uint64(num_coarse)

    def add_pb(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__pb", pa.array((_u64_col(b, "ah") % Cu).astype(np.int32)))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_pairs_table(key_type)
        idx = _ray.get(index_ref)
        packed, first = np.unique(
            _pair_pack(_u64_col(t, "ah"), _u64_col(t, "al"),
                       _u64_col(t, "bh"), _u64_col(t, "bl")),
            return_index=True)
        ah, al, bh, bl = _pair_unpack(packed)
        ia, ib = idx.lookup(ah, al, bh, bl)
        sims = (t.column("sim").combine_chunks()
                if isinstance(t.column("sim"), pa.ChunkedArray)
                else t.column("sim")).take(pa.array(first))
        a, bb = _ordered_pair_columns(idx.keys.take(pa.array(ia)),
                                      idx.keys.take(pa.array(ib)))
        return pa.table({"a": a, "b": bb, "sim": sims})

    return (scored_fp.map_batches(add_pb, batch_format="pyarrow")
                     .groupby("__pb")
                     .map_groups(finalize, batch_format="pyarrow"))


def _verify_pairs_broadcast(pairs_fp, index_ref, key_type, threshold: float):
    """Score candidate pairs against the broadcast signature index inside
    ``map_batches`` — pairs never land on the driver; the index ships
    once through the object store and every task reads it zero-copy.
    Scoring duplicate candidates (the same pair surfacing from several
    bands) is accepted as cheap vectorized waste; the DISTINCT runs
    after the threshold filter in fingerprint space, when survivors are
    small and still 32 B/row."""
    import ray as _ray

    empty = pa.table({c: pa.array([], pa.uint64())
                      for c in ("ah", "al", "bh", "bl")}
                     ).append_column("sim", pa.array([], pa.float64()))

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        idx = _ray.get(index_ref)
        ah, al = _u64_col(b, "ah"), _u64_col(b, "al")
        bh, bl = _u64_col(b, "bh"), _u64_col(b, "bl")
        ia, ib = idx.lookup(ah, al, bh, bl)
        sims = idx.sims(ia, ib)
        m = sims >= idx.threshold
        return pa.table({"ah": pa.array(ah[m]), "al": pa.array(al[m]),
                         "bh": pa.array(bh[m]), "bl": pa.array(bl[m]),
                         "sim": pa.array(sims[m])})

    scored = pairs_fp.map_batches(score, batch_format="pyarrow")
    return _finalize_scored_fp(scored, index_ref, key_type)


# ------------------------------------- identical-signature collapse ----


def _sig_class_fp(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, num_perm) uint32 signature matrix → 128-bit signature-class
    fingerprint per row (two independent splitmix folds).  Rows with
    identical signatures — exact duplicates and estimator-sim-1.0 pairs
    by construction — share a class."""
    acc1 = np.full(len(mat), np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64)
    acc2 = np.full(len(mat), np.uint64(0xC2B2AE3D27D4EB4F), dtype=np.uint64)
    for j in range(mat.shape[1]):
        col = mat[:, j].astype(np.uint64)
        acc1 = _mix_u64(acc1 * _FNV_PRIME_64 + col)
        acc2 = _mix_u64(acc2 ^ (col + np.uint64(j + 1)) * _FNV_PRIME_64)
    return acc1, acc2


def _class_stars_local(fp16_sorted, keys_sorted: pa.Array, est_mat: np.ndarray):
    """Local (index-side) identical-signature collapse: → (star_table,
    rep_idx).  ``star_table`` holds one (rep=min-fp member, member,
    sim=1.0) edge per non-representative row, already in key space;
    ``rep_idx`` indexes one representative per class into the index
    arrays.  O(index) local work — only run where the index itself fits
    (the broadcast/driver gate)."""
    sch, scl = _sig_class_fp(est_mat)
    cls = _fp_pack(sch, scl)
    order = np.argsort(cls, kind="stable")   # within ties: fp order = index order
    cls_sorted = cls[order]
    starts = np.flatnonzero(np.r_[True, cls_sorted[1:] != cls_sorted[:-1]])
    sizes = np.diff(np.r_[starts, len(cls_sorted)])
    # representative = min-fp member = first index-order member of the run
    rep_idx = order[starts]
    member_mask = np.ones(len(cls_sorted), dtype=bool)
    member_mask[starts] = False
    members = order[member_mask]              # all non-representative rows
    rep_for_member = np.repeat(rep_idx, sizes - 1)
    if len(members):
        a, bb = _ordered_pair_columns(keys_sorted.take(pa.array(rep_for_member)),
                                      keys_sorted.take(pa.array(members)))
        stars = pa.table({"a": a, "b": bb,
                          "sim": pa.array(np.ones(len(members)))})
    else:
        stars = None
    return stars, np.sort(rep_idx)


def _band_hashes(mat: np.ndarray, num_bands: int) -> np.ndarray:
    """(n, num_perm) uint32 → (n, num_bands) uint64 band hashes (same
    FNV/splitmix fold the distributed band explode uses)."""
    n, num_perm = mat.shape
    rows_per_band = num_perm // num_bands
    out = np.empty((n, num_bands), dtype=np.uint64)
    for b in range(num_bands):
        chunk = mat[:, b * rows_per_band:(b + 1) * rows_per_band]
        acc = np.full(n, np.uint64(b + 1), dtype=np.uint64)
        for j in range(rows_per_band):
            acc = acc * _FNV_PRIME_64 + chunk[:, j].astype(np.uint64)
        out[:, b] = _mix_u64(acc)
    return out


def _star_pairs_vec(bk: np.ndarray, fp: np.ndarray) -> np.ndarray | None:
    """(bucket_key, member_fp) rows → packed 'S32' star pairs
    (bucket-min-fp member → every other member), fully vectorized:
    lexsort by (bucket, fp), find run starts, repeat each run's first
    (= min) fp over the rest of the run.  Assumes each (bucket, member)
    combination appears at most once; self-pairs from stray duplicates
    are masked out."""
    order = np.lexsort((fp, bk))
    bks = bk[order]
    fps = fp[order]
    starts = np.flatnonzero(np.r_[True, bks[1:] != bks[:-1]])
    sizes = np.diff(np.r_[starts, len(bks)])
    multi = sizes >= 2
    if not multi.any():
        return None
    is_start = np.zeros(len(bks), dtype=bool)
    is_start[starts] = True
    a = np.repeat(fps[starts[multi]], sizes[multi] - 1)
    b = fps[~is_start]
    keep = a != b
    a = a[keep]
    b = b[keep]
    if not len(a):
        return None
    q = np.empty((len(a), 4), dtype=">u8")
    q[:, :2] = a.view(">u8").reshape(-1, 2)
    q[:, 2:] = b.view(">u8").reshape(-1, 2)
    return q.reshape(-1).view("S32")


def _rep_star_candidates_local(index: "_SigIndex", rep_idx: np.ndarray,
                               num_bands: int):
    """Band the class representatives locally (they are the post-collapse
    working set) and emit distinct per-band-bucket star candidates as
    (ia, ib) POSITIONS into the index arrays, or None.

    Works entirely in positions — the min-position member of a bucket IS
    its min-fp member (the index is fp-sorted), pairs pack into single
    uint64s, and every sort/unique runs on native integers (byte-string
    dtypes sort ~5× slower)."""
    mat = index.est_mat[rep_idx]
    bands = _band_hashes(mat, num_bands)
    n = len(rep_idx)
    N = np.uint64(n)
    outs = []
    for b in range(num_bands):
        bk = bands[:, b]
        order = np.argsort(bk, kind="stable")   # within a run: ascending pos = ascending fp
        bks = bk[order]
        starts = np.flatnonzero(np.r_[True, bks[1:] != bks[:-1]])
        sizes = np.diff(np.r_[starts, len(bks)])
        multi = sizes >= 2
        if not multi.any():
            continue
        is_start = np.zeros(len(bks), dtype=bool)
        is_start[starts] = True
        a_pos = np.repeat(order[starts[multi]].astype(np.uint64), sizes[multi] - 1)
        b_pos = order[~is_start].astype(np.uint64)
        outs.append(a_pos * N + b_pos)
    if not outs:
        return None
    packed = np.unique(np.concatenate(outs))
    pa_pos = (packed // N).astype(np.int64)
    pb_pos = (packed % N).astype(np.int64)
    return rep_idx[pa_pos], rep_idx[pb_pos]


def _score_pos_pairs(index_ref, ia: np.ndarray, ib: np.ndarray,
                     key_type):
    """Score pre-distinct (position, position) candidate pairs against
    the broadcast index in PARALLEL map_batches tasks (the vectorized
    gather+compare is memory-bandwidth-bound — one core scoring a
    million 512 B signatures crawls), emitting (a, b, sim) directly."""
    import ray as _ray
    import ray.data as rd

    tbl = pa.table({"ia": pa.array(ia), "ib": pa.array(ib)})
    k = max(1, min(64, len(ia) // 16384))
    step = -(-len(ia) // k)
    slices = [tbl.slice(i * step, step) for i in range(k)]

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty_pairs_table(key_type)
        idx = _ray.get(index_ref)
        ia = b.column("ia").to_numpy()
        ib = b.column("ib").to_numpy()
        sims = idx.sims(ia, ib)
        m = sims >= idx.threshold
        a, bb = _ordered_pair_columns(idx.keys.take(pa.array(ia[m])),
                                      idx.keys.take(pa.array(ib[m])))
        return pa.table({"a": a, "b": bb, "sim": pa.array(sims[m])})

    return rd.from_arrow(slices).map_batches(score, batch_format="pyarrow")


def _rep_star_pairs_local(index: "_SigIndex", rep_idx: np.ndarray,
                          num_bands: int, threshold: float):
    """Driver-local twin of the parallel rep scoring: candidates +
    vectorized local scoring, → confirmed (a, b, sim) table or None."""
    cand = _rep_star_candidates_local(index, rep_idx, num_bands)
    if cand is None:
        return None
    ia, ib = cand
    sims = index.sims(ia, ib)
    m = sims >= threshold
    if not m.any():
        return None
    a, bb = _ordered_pair_columns(index.keys.take(pa.array(ia[m])),
                                  index.keys.take(pa.array(ib[m])))
    return pa.table({"a": a, "b": bb, "sim": pa.array(sims[m])})


# ------------------------------------------ fp-space semi-join verify ----


def _verify_pairs_semijoin(pairs_fp, sig_source, key_column: str, key_type, *,
                           num_perm: int, threshold: float, verify: str,
                           num_partitions: int | None = None,
                           plan: str = "join"):
    """Distributed pair verification in fingerprint space — dispatches
    between two byte-equal plans (differential-pytest-pinned):

    - ``plan="join"`` (default, r3): global pair distinct (32 B rows),
      then two native hash joins attach (sig, key) for each pair side —
      signatures cross the wire once per join input plus once per
      distinct pair, with no sort of the signature payload.  Measured
      3× faster than the sort plan on the dense 500k bench corpus
      (130 s → 44 s at 32 cpus, 1.19 M distinct pairs; see BASELINE.md).
    - ``plan="sort"``: the r2 mixed-kind co-group
      (``_verify_pairs_semijoin_sort``) — kept as the differential twin
      and for engines where ``Dataset.join`` is unavailable."""
    if plan == "sort":
        return _verify_pairs_semijoin_sort(
            pairs_fp, sig_source, key_column, key_type, num_perm=num_perm,
            threshold=threshold, verify=verify,
            num_partitions=num_partitions)
    exact = verify == "exact"
    payload_col = "shingles" if exact else "minhash_sig"
    itemsize = 8 if exact else 4
    C = num_partitions or 128
    Cu = np.uint64(C)

    def pair_rows(b: pa.Table) -> pa.Table:
        ah = _u64_col(b, "ah")
        return pa.table({
            "__pb": pa.array((ah % Cu).astype(np.int32)),
            "ah": pa.array(ah.view(np.int64)),
            "al": pa.array(_u64_col(b, "al").view(np.int64)),
            "bh": pa.array(_u64_col(b, "bh").view(np.int64)),
            "bl": pa.array(_u64_col(b, "bl").view(np.int64)),
        })

    def distinct_pairs(t: pa.Table) -> pa.Table:
        # same pair ⇒ same ah ⇒ same bucket, so per-bucket unique is a
        # GLOBAL distinct; the exchange is 32 B/row, no sig payload
        packed = np.unique(_pair_pack(
            _u64_col(t, "ah"), _u64_col(t, "al"),
            _u64_col(t, "bh"), _u64_col(t, "bl")))
        ah, al, bh, bl = _pair_unpack(packed)
        return pa.table({"ah": pa.array(ah.view(np.int64)),
                         "al": pa.array(al.view(np.int64)),
                         "bh": pa.array(bh.view(np.int64)),
                         "bl": pa.array(bl.view(np.int64))})

    pairs_d = (pairs_fp.map_batches(pair_rows, batch_format="pyarrow")
                       .groupby("__pb")
                       .map_groups(distinct_pairs, batch_format="pyarrow"))

    def sig_rows_for(side: str):
        def f(b: pa.Table) -> pa.Table:
            k = b.column(key_column)
            if isinstance(k, pa.ChunkedArray):
                k = k.combine_chunks()
            return pa.table({
                f"__{side}h": pa.array(_u64_col(b, "__fh").view(np.int64)),
                f"__{side}l": pa.array(_u64_col(b, "__fl").view(np.int64)),
                f"sig_{side}": _list_col_to_binary(b.column(payload_col),
                                                   itemsize),
                f"key_{side}": k,
            })
        return f

    sigs_a = sig_source.map_batches(sig_rows_for("a"), batch_format="pyarrow")
    sigs_b = sig_source.map_batches(sig_rows_for("b"), batch_format="pyarrow")
    # joins get CPU-capped partition counts — every hash-join partition
    # is an aggregator actor, and e.g. 128 of them deadlock a 4-CPU
    # session (the 32 B distinct exchange above keeps the full C fan-out)
    JP = _join_partitions(num_partitions)
    # safe_join strips the zero-row SCHEMA-LESS blocks Ray's shuffle
    # emits for empty partitions on both sides of each join; the j1
    # materialization inside it is bounded by the distinct candidate-
    # pair mass — the same assumption the caller's
    # pairs_fp.materialize() already makes.
    j1 = safe_join(pairs_d, sigs_a, "inner", JP, on=("ah", "al"),
                   right_on=("__ah", "__al"))
    if j1 is None:
        import ray.data as rd

        return rd.from_arrow(_empty_pairs_table(key_type))
    j2 = safe_join(j1, sigs_b, "inner", JP, on=("bh", "bl"),
                   right_on=("__bh", "__bl"))
    if j2 is None:
        import ray.data as rd

        return rd.from_arrow(_empty_pairs_table(key_type))

    def score(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return _empty_pairs_table(key_type)
        aoff, aflat = _binary_offsets(b.column("sig_a"))
        boff, bflat = _binary_offsets(b.column("sig_b"))
        if exact:
            a64 = aflat.view(np.uint64)
            b64 = bflat.view(np.uint64)
            ao = aoff // 8
            bo = boff // 8
            sims = np.empty(n, dtype=np.float64)
            for i in range(n):
                sims[i] = jaccard(a64[ao[i]:ao[i + 1]], b64[bo[i]:bo[i + 1]])
        else:
            A = aflat.view(np.uint32).reshape(n, num_perm)
            B = bflat.view(np.uint32).reshape(n, num_perm)
            sims = (A == B).mean(axis=1)
        mask = sims >= threshold
        idx = pa.array(np.flatnonzero(mask))
        ka = b.column("key_a").take(idx)
        kb = b.column("key_b").take(idx)
        a, bb = _ordered_pair_columns(ka, kb)
        return pa.table({"a": a, "b": bb, "sim": pa.array(sims[mask])})

    return j2.map_batches(score, batch_format="pyarrow")


def _verify_pairs_semijoin_sort(pairs_fp, sig_source, key_column: str,
                                key_type, *, num_perm: int, threshold: float,
                                verify: str,
                                num_partitions: int | None = None):
    """Bucketed semi-join verification, entirely in fingerprint space —
    the scale path when the signature index outgrows one machine's
    memory (no driver pair materialization, no driver signature matrix,
    no broadcast index):

    - Pass 1 (bucket = fp_hi(a) % C): candidate pairs (32 B rows) and
      signature rows shuffle into the same int32 coarse bucket;
      in-bucket, pairs are made DISTINCT (same pair ⇒ same a ⇒ same
      bucket) via one numpy unique over packed 32-byte views, and
      (sig_a, key_a) attach via searchsorted + a vectorized ragged
      gather — keys ride WITH the signature rows, so no separate
      restore exchange is ever needed.
    - Pass 2 (bucket = fp_hi(b) % C): half-joined pairs meet the
      signature rows again; (sig_b, key_b) attach the same way,
      similarity is scored, and confirmed rows emit directly in key
      space, normalized a < b by key.

    Every in-block step is numpy over Arrow buffers — no pandas object
    merge, no per-row Python on the exchange path.  ``sig_source`` must
    provide (key_column, __fh, __fl, payload) rows."""
    exact = verify == "exact"
    payload_col = "shingles" if exact else "minhash_sig"
    itemsize = 8 if exact else 4
    # 128 coarse partitions measured best at 500k docs / 32 cpus (64: -7%,
    # 256: -18%); on a real cluster pass nodes x cores
    C = num_partitions or 128
    Cu = np.uint64(C)

    def sig_rows(b: pa.Table) -> pa.Table:
        hi = _u64_col(b, "__fh")
        lo = _u64_col(b, "__fl")
        n = b.num_rows
        k = b.column(key_column)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        return pa.table({
            "__pb": pa.array((hi % Cu).astype(np.int32)),
            "kind": pa.array(np.ones(n, dtype=np.int8)),
            "ah": pa.array(hi), "al": pa.array(lo),
            "bh": pa.array(hi), "bl": pa.array(lo),
            "sig": _list_col_to_binary(b.column(payload_col), itemsize),
            "key": k,
            "ka": pa.nulls(n, key_type),
        })

    def pair_rows(b: pa.Table) -> pa.Table:
        ah = _u64_col(b, "ah")
        n = b.num_rows
        return pa.table({
            "__pb": pa.array((ah % Cu).astype(np.int32)),
            "kind": pa.array(np.zeros(n, dtype=np.int8)),
            "ah": pa.array(ah), "al": pa.array(_u64_col(b, "al")),
            "bh": pa.array(_u64_col(b, "bh")), "bl": pa.array(_u64_col(b, "bl")),
            "sig": pa.nulls(n, pa.binary()),
            "key": pa.nulls(n, key_type),
            "ka": pa.nulls(n, key_type),
        })

    mid_schema = pa.schema([
        ("__pb", pa.int32()), ("kind", pa.int8()),
        ("ah", pa.uint64()), ("al", pa.uint64()),
        ("bh", pa.uint64()), ("bl", pa.uint64()),
        ("sig", pa.binary()), ("key", key_type), ("ka", key_type),
    ])
    empty_mid = mid_schema.empty_table()

    def _split(t: pa.Table):
        kindc = t.column("kind")
        kind = np.asarray(kindc.combine_chunks()
                          if isinstance(kindc, pa.ChunkedArray) else kindc)
        pm = np.flatnonzero(kind == 0)
        sm = np.flatnonzero(kind == 1)
        if not len(pm) or not len(sm):
            return None
        ah, al = _u64_col(t, "ah"), _u64_col(t, "al")
        bh, bl = _u64_col(t, "bh"), _u64_col(t, "bl")
        sfp = _fp_pack(ah[sm], al[sm])
        sord = np.argsort(sfp, kind="stable")
        return pm, ah, al, bh, bl, sfp[sord], sm[sord]

    def pass1(t: pa.Table) -> pa.Table:
        parts = _split(t)
        if parts is None:
            return empty_mid
        pm, ah, al, bh, bl, sfp_sorted, src = parts
        pairs = np.unique(_pair_pack(ah[pm], al[pm], bh[pm], bl[pm]))
        ah2, al2, bh2, bl2 = _pair_unpack(pairs)
        ia = src[np.searchsorted(sfp_sorted, _fp_pack(ah2, al2))]
        pb_b = (bh2 % Cu).astype(np.int32)
        n = len(ah2)
        # ship each sig_a ONCE per (a, target-bucket) group, not once per
        # pair: on clustered corpora an a pairs with many b's landing in
        # few buckets, and the 0.5 KB signature dominates the pass-2
        # exchange — kind=2 carrier rows cut it by the per-(a,bucket)
        # fan-out factor while pair rows stay 32 B
        grp = _pair_pack(ah2, al2, np.zeros(n, dtype=np.uint64),
                         pb_b.astype(np.uint64))
        _, first = np.unique(grp, return_index=True)
        off, flat = _binary_offsets(t.column("sig"))
        goff, gflat = _ragged_gather(off, flat, ia[first])
        m = len(first)
        carriers = pa.table({
            "__pb": pa.array(pb_b[first]),
            "kind": pa.array(np.full(m, 2, dtype=np.int8)),
            "ah": pa.array(ah2[first]), "al": pa.array(al2[first]),
            "bh": pa.array(ah2[first]), "bl": pa.array(al2[first]),
            "sig": _binary_from_ragged(goff, gflat),
            "key": _take_arr(t.column("key"), ia[first]),
            "ka": pa.nulls(m, key_type),
        })
        pair_rows = pa.table({
            "__pb": pa.array(pb_b),
            "kind": pa.array(np.zeros(n, dtype=np.int8)),
            "ah": pa.array(ah2), "al": pa.array(al2),
            "bh": pa.array(bh2), "bl": pa.array(bl2),
            "sig": pa.nulls(n, pa.binary()),
            "key": pa.nulls(n, key_type),
            "ka": pa.nulls(n, key_type),
        })
        return pa.concat_tables([carriers, pair_rows])

    def pass2(t: pa.Table) -> pa.Table:
        kindc = t.column("kind")
        kind = np.asarray(kindc.combine_chunks()
                          if isinstance(kindc, pa.ChunkedArray) else kindc)
        pm = np.flatnonzero(kind == 0)
        sm = np.flatnonzero(kind == 1)
        am = np.flatnonzero(kind == 2)
        if not len(pm) or not len(sm) or not len(am):
            return _empty_pairs_table(key_type)
        ah, al = _u64_col(t, "ah"), _u64_col(t, "al")
        bh, bl = _u64_col(t, "bh"), _u64_col(t, "bl")
        # b side: full signature rows keyed by their own fp
        sfp = _fp_pack(ah[sm], al[sm])
        sord = np.argsort(sfp, kind="stable")
        ib = sm[sord][np.searchsorted(sfp[sord], _fp_pack(bh[pm], bl[pm]))]
        # a side: one carrier row per (a, this bucket)
        afp = _fp_pack(ah[am], al[am])
        aord = np.argsort(afp, kind="stable")
        iac = am[aord][np.searchsorted(afp[aord], _fp_pack(ah[pm], al[pm]))]
        off, flat = _binary_offsets(t.column("sig"))
        aoff, aflat = _ragged_gather(off, flat, iac)       # sig_a bytes
        boff, bflat = _ragged_gather(off, flat, ib)        # sig_b bytes
        n = len(pm)
        if exact:
            a64 = aflat.view(np.uint64)
            b64 = bflat.view(np.uint64)
            ao = aoff // 8
            bo = boff // 8
            sims = np.empty(n, dtype=np.float64)
            for i in range(n):
                sims[i] = jaccard(a64[ao[i]:ao[i + 1]], b64[bo[i]:bo[i + 1]])
        else:
            A = aflat.view(np.uint32).reshape(n, num_perm)
            B = bflat.view(np.uint32).reshape(n, num_perm)
            sims = (A == B).mean(axis=1)
        mask = sims >= threshold
        ka = _take_arr(t.column("key"), iac[mask])
        kb = _take_arr(t.column("key"), ib[mask])
        a, bb = _ordered_pair_columns(ka, kb)
        return pa.table({"a": a, "b": bb, "sim": pa.array(sims[mask])})

    sig_tag = sig_source.map_batches(sig_rows, batch_format="pyarrow")
    pr = pairs_fp.map_batches(pair_rows, batch_format="pyarrow")
    half = (sig_tag.union(pr).groupby("__pb")
                   .map_groups(pass1, batch_format="pyarrow"))
    return (sig_tag.union(half).groupby("__pb")
                   .map_groups(pass2, batch_format="pyarrow"))


def _collapse_classes_semijoin(sig_ds, key_column: str, key_type,
                               num_perm: int, num_coarse: int = 128,
                               broadcast_budget_bytes: int = 2_000_000_000):
    """Distributed identical-signature collapse for the semi-join path:
    ONE bucketed exchange keyed on the signature-class fingerprint —
    and (r3) the exchange carries only (class fp, key fp, key) rows,
    never the signature payload.  Per class the group step emits (i)
    final-form star edges (rep=min-fp member → member, sim 1.0) and
    (ii) the representative's key FINGERPRINT.  Representative
    signature ROWS are then selected from the already-materialized
    ``sig_ds`` blocks with zero additional exchange: the rep-fp set
    (16 B per rep) broadcasts via ``ray.put`` and a streaming
    searchsorted membership filter keeps rep rows in place — gated on
    ``broadcast_budget_bytes``, beyond which a LEFT SEMI fp join (the
    100-TB path, all hash-partitioned) takes over.  The downstream LSH
    then runs over representatives only, which is what makes
    duplicate-heavy corpora cheap at scale."""
    import ray as _ray

    Cu = np.uint64(num_coarse)

    def tag_rows(b: pa.Table) -> pa.Table:
        sig_col = b.column("minhash_sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        flat = np.asarray(sig_col.flatten(), dtype=np.uint64)
        mat = flat.astype(np.uint32).reshape(b.num_rows, num_perm)
        sch, scl = _sig_class_fp(mat)
        k = b.column(key_column)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        return pa.table({
            "__pb": pa.array((sch % Cu).astype(np.int32)),
            "ch": pa.array(sch), "cl": pa.array(scl),
            "__fh": pa.array(_u64_col(b, "__fh")),
            "__fl": pa.array(_u64_col(b, "__fl")),
            "key": k,
        })

    def per_class(t: pa.Table) -> pa.Table:
        cls = _fp_pack(_u64_col(t, "ch"), _u64_col(t, "cl"))
        fp = _fp_pack(_u64_col(t, "__fh"), _u64_col(t, "__fl"))
        # sort by (class, fp): lexsort on the packed views
        order = np.lexsort((fp, cls))
        cls_s = cls[order]
        starts = np.flatnonzero(np.r_[True, cls_s[1:] != cls_s[:-1]])
        sizes = np.diff(np.r_[starts, len(cls_s)])
        rep_pos = order[starts]
        member_mask = np.ones(len(cls_s), dtype=bool)
        member_mask[starts] = False
        members = order[member_mask]
        rep_for_member = np.repeat(rep_pos, sizes - 1)
        keys = t.column("key")
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        n_star = len(members)
        if n_star:
            star_a, star_b = _ordered_pair_columns(
                _take_arr(keys, rep_for_member), _take_arr(keys, members))
        else:
            star_a = star_b = pa.array([], key_type)
        fh, fl = _fp_unpack(fp[rep_pos])
        n_rep = len(rep_pos)
        tag = np.r_[np.zeros(n_star, dtype=np.int8),
                    np.ones(n_rep, dtype=np.int8)]
        fill_u = np.zeros(n_star, dtype=np.uint64)
        return pa.table({
            "tag": pa.array(tag),
            "a": pa.concat_arrays(
                [star_a.combine_chunks() if isinstance(star_a, pa.ChunkedArray)
                 else star_a, pa.nulls(n_rep, key_type)]),
            "b": pa.concat_arrays(
                [star_b.combine_chunks() if isinstance(star_b, pa.ChunkedArray)
                 else star_b, pa.nulls(n_rep, key_type)]),
            "__fh": pa.array(np.r_[fill_u, fh]),
            "__fl": pa.array(np.r_[fill_u, fl]),
        })

    tagged = (sig_ds.map_batches(tag_rows, batch_format="pyarrow")
                    .groupby("__pb")
                    .map_groups(per_class, batch_format="pyarrow")
                    .materialize())
    import pyarrow.compute as pc

    def stars_only(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("tag"), 0))
        return pa.table({"a": f.column("a"), "b": f.column("b"),
                         "sim": pa.array(np.ones(f.num_rows))})

    def rep_fps_only(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("tag"), 1))
        return pa.table({
            "__jh": pa.array(_u64_col(f, "__fh").view(np.int64)),
            "__jl": pa.array(_u64_col(f, "__fl").view(np.int64))})

    stars = tagged.map_batches(stars_only, batch_format="pyarrow")
    rep_fps = tagged.map_batches(rep_fps_only,
                                 batch_format="pyarrow").materialize()
    n_reps = rep_fps.count()

    if n_reps * 16 <= broadcast_budget_bytes:
        packed_parts = [
            _fp_pack(_u64_col(b, "__jh"), _u64_col(b, "__jl"))
            for b in rep_fps.iter_batches(batch_size=None,
                                          batch_format="pyarrow")
            if b.num_rows]
        packed = (np.sort(np.concatenate(packed_parts)) if packed_parts
                  else np.empty(0, dtype="S16"))
        fp_ref = _ray.put(packed)

        def keep_reps(b: pa.Table) -> pa.Table:
            fps = _ray.get(fp_ref)
            if not len(fps):
                return b.slice(0, 0)
            mine = _fp_pack(_u64_col(b, "__fh"), _u64_col(b, "__fl"))
            pos = np.searchsorted(fps, mine)
            pos = np.minimum(pos, len(fps) - 1)
            mask = fps[pos] == mine
            return b.filter(pa.array(mask))

        # materialized: three consumers (banding + both verify sig sides)
        # would otherwise re-run the filter — and re-copy the signature
        # payload — once each; the filter itself is exchange-free
        reps = sig_ds.map_batches(keep_reps,
                                  batch_format="pyarrow").materialize()
        return stars, reps

    def add_jcols(b: pa.Table) -> pa.Table:
        # acero joins reject list<> non-key columns — ride the signature
        # as packed binary and rebuild the list after the semi join
        sig_col = b.column("minhash_sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        t = b.drop_columns(["minhash_sig"])
        t = t.append_column("__sigbin", _list_col_to_binary(sig_col, 4))
        t = t.append_column(
            "__jh", pa.array(_u64_col(b, "__fh").view(np.int64)))
        return t.append_column(
            "__jl", pa.array(_u64_col(b, "__fl").view(np.int64)))

    def rebuild_sig(b: pa.Table) -> pa.Table:
        off, flat = _binary_offsets(b.column("__sigbin"))
        vals = flat.view(np.uint32).astype(np.uint64)
        sig = pa.ListArray.from_arrays(
            pa.array((off // 4).astype(np.int32)), pa.array(vals))
        return (b.drop_columns(["__sigbin", "__jh", "__jl"])
                 .append_column("minhash_sig", sig))

    reps = safe_join(sig_ds.map_batches(add_jcols, batch_format="pyarrow"),
                     rep_fps, "left_semi", num_coarse,
                     on=("__jh", "__jl"), right_on=("__jh", "__jl"))
    if reps is not None:
        reps = _nonempty_blocks(
            reps.map_batches(rebuild_sig,
                             batch_format="pyarrow").materialize())
    if reps is None:
        import ray.data as rd

        reps = rd.from_arrow(pa.schema(
            [(key_column, key_type),
             ("minhash_sig", pa.list_(pa.uint64())),
             ("__fh", pa.uint64()), ("__fl", pa.uint64())]).empty_table())
    return stars, reps


def minhash_candidate_pairs(ds, key_column: str = "doc_id",
                            text_column: str = "text", *,
                            num_perm: int = 128, num_bands: int = 16,
                            k_shingle: int = 3, threshold: float = 0.8,
                            verify: str = "estimate", seed: int = 42,
                            pair_mode: str = "all",
                            verify_exec: str = "auto",
                            num_partitions: int | None = None,
                            broadcast_budget_bytes: int = 2 << 30,
                            signed_ds=None):
    """→ Dataset of confirmed near-dup pairs (a, b, sim), a < b by key.

    ``signed_ds``: a PRE-SIGNED signature Dataset (the
    :func:`minhash_sign` / :func:`read_minhash_index` schema — key,
    ``minhash_sig``, optional ``shingles``, ``__fh``/``__fl``) skips
    the shingle+sign pass entirely — the incremental-crawl seam where
    the archive's signatures come from a persisted index instead of
    re-reading archive text.  ``verify="exact"`` then requires the
    ``shingles`` column in the index.  ``ds`` is ignored when given.

    Two-phase plan, entirely in 128-bit fingerprint space (the banded
    shuffle carries ONLY (band_hash, fp) — 24 B/row — never the 1 KB
    signature or URL-sized keys; original keys ride only with signature
    rows and on the final, post-threshold output):

      1. signatures per batch (vectorized crc/splitmix shingles) →
         numeric band hashes → coarse-bucket shuffle → candidate pairs.
         pair_mode="star" additionally collapses identical-signature
         classes first (estimator sim is exactly 1.0 inside a class):
         each class contributes (min-fp member → member) edges directly
         and ONE representative to the LSH — on duplicate-heavy corpora
         (the norm for web-scale dedup) this shrinks the banded working
         set by the duplication factor.  Star output is a deterministic
         spanning edge set sufficient for connected components, not an
         exhaustive pair listing.  pair_mode="all" emits every in-bucket
         pair (exact listings; inherently quadratic in cluster size —
         small-scale use).
      2. verify: score each candidate pair against the signatures (or
         shingle sets, verify="exact") and keep sim ≥ threshold.

    verify="estimate": sim = fraction of agreeing minhash components
    (unbiased Jaccard estimator).  verify="exact": sim = exact
    shingle-set Jaccard.

    ``verify_exec`` picks the phase-2 plan:
    - "broadcast": the signature index (≈ num_perm×4 + 16 B/doc + keys)
      ships ONCE via ``ray.put``; scoring tasks stream candidate pairs
      through ``map_batches`` reading the index zero-copy from the
      object store; the distinct runs post-threshold in fp space.  The
      classic broadcast-small-side join — right while the index fits a
      node's memory.
    - "semijoin": fp-space bucketed semi-join — the 100-TB path when
      the index outgrows memory; see ``_verify_pairs_semijoin``.
      ("distributed" is accepted as a legacy alias.)
    - "driver": candidate pairs AND the index collected on the driver,
      one vectorized scoring pass — small-scale/debug twin.
    - "auto" (default): "broadcast" while the estimated index size fits
      ``broadcast_budget_bytes`` (default 2 GiB), else "semijoin".
    All paths produce identical output (pytest-pinned, both pair modes,
    integer and string keys).
    """
    if verify not in ("estimate", "exact"):
        raise ValueError(f"verify={verify!r}")
    if pair_mode not in ("all", "star"):
        raise ValueError(f"pair_mode={pair_mode!r}")
    if verify_exec == "distributed":
        verify_exec = "semijoin"
    if verify_exec not in ("auto", "broadcast", "semijoin", "driver"):
        raise ValueError(f"verify_exec={verify_exec!r}")
    import ray as _ray
    import ray.data as rd

    if signed_ds is not None:
        sig_ds = signed_ds.materialize()
        if (verify == "exact" and sig_ds.count() > 0
                and "shingles" not in
                sig_ds.schema().base_schema.names):
            raise ValueError(
                'verify="exact" over a pre-signed dataset needs the '
                "'shingles' column (write the index with "
                "keep_shingles=True)")
    else:
        sig_stage = MinHashSignatures(
            key_column, text_column, num_perm, k_shingle,
            keep_shingles=(verify == "exact"), seed=seed)
        # materialized: read twice (banding + verification) without
        # recomputing shingles; blocks spill if they outgrow memory
        sig_ds = (ds.map_batches(sig_stage, batch_format="pyarrow")
                  .materialize())
    if sig_ds.count() == 0:
        return rd.from_arrow(_empty_pairs_table(pa.int64()))
    key_type = sig_ds.schema().base_schema.field(key_column).type
    collapse = pair_mode == "star" and verify == "estimate"

    if verify_exec == "auto":
        n_docs = sig_ds.count()
        per_doc = (num_perm * 4 + 64) if verify == "estimate" else 4096
        verify_exec = ("broadcast" if n_docs * per_doc <= broadcast_budget_bytes
                       else "semijoin")

    rows_per_band = num_perm // num_bands

    def explode_fp(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig_col = batch.column("minhash_sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        flat = np.asarray(sig_col.flatten(), dtype=np.uint64)
        mat = flat.astype(np.uint32).reshape(n, num_perm)
        out_hash = _band_hashes(mat, num_bands).reshape(-1)
        idx = np.repeat(np.arange(n), num_bands)
        return pa.table({
            "band_key": pa.array(out_hash),
            "__fh": pa.array(_u64_col(batch, "__fh")[idx]),
            "__fl": pa.array(_u64_col(batch, "__fl")[idx]),
        })

    if verify_exec == "semijoin":
        if collapse:
            stars, reps = _collapse_classes_semijoin(
                sig_ds, key_column, key_type, num_perm,
                num_coarse=num_partitions or 128)
            del sig_ds   # reps carry everything the verify needs
            banded = reps.map_batches(explode_fp, batch_format="pyarrow")
            pairs_fp = _coarse_pairs_fp(banded, pair_mode).materialize()
            if pairs_fp.count() == 0:
                return stars
            confirmed = _verify_pairs_semijoin(
                pairs_fp, reps, key_column, key_type, num_perm=num_perm,
                threshold=threshold, verify=verify,
                num_partitions=num_partitions)
            return stars.union(confirmed)
        banded = sig_ds.map_batches(explode_fp, batch_format="pyarrow")
        pairs_fp = _coarse_pairs_fp(banded, pair_mode).materialize()
        if pairs_fp.count() == 0:
            return rd.from_arrow(_empty_pairs_table(key_type))
        return _verify_pairs_semijoin(
            pairs_fp, sig_ds, key_column, key_type, num_perm=num_perm,
            threshold=threshold, verify=verify, num_partitions=num_partitions)

    # ---- broadcast / driver: signature index built once ----------------
    index = _build_sig_index(sig_ds, key_column, verify, num_perm, threshold)

    if collapse:
        # local collapse on the index (the broadcast gate already bounds
        # the index to one machine): class stars emit directly; the LSH
        # bands only the representatives — candidate generation needs no
        # Ray exchange for a working set this shape, and scoring fans
        # out over the broadcast index (driver mode scores locally)
        stars, rep_idx = _class_stars_local(index.fp16, index.keys,
                                            index.est_mat)
        if verify_exec == "broadcast":
            cand = _rep_star_candidates_local(index, rep_idx, num_bands)
            parts = []
            if stars is not None:
                parts.append(rd.from_arrow(stars))
            if cand is not None:
                parts.append(_score_pos_pairs(_ray.put(index), cand[0],
                                              cand[1], key_type))
            if not parts:
                return rd.from_arrow(_empty_pairs_table(key_type))
            return parts[0] if len(parts) == 1 else parts[0].union(parts[1])
        confirmed = _rep_star_pairs_local(index, rep_idx, num_bands, threshold)
        parts = [t for t in (stars, confirmed) if t is not None]
        if not parts:
            return rd.from_arrow(_empty_pairs_table(key_type))
        return rd.from_arrow(pa.concat_tables(parts))

    banded = sig_ds.map_batches(explode_fp, batch_format="pyarrow")
    pairs_fp = _coarse_pairs_fp(banded, pair_mode).materialize()
    if pairs_fp.count() == 0:
        return rd.from_arrow(_empty_pairs_table(key_type))

    if verify_exec == "broadcast":
        return _verify_pairs_broadcast(pairs_fp, _ray.put(index), key_type,
                                       threshold)

    # ---- verify_exec == "driver": everything local, one vectorized pass
    quads = [[], [], [], []]
    for b in pairs_fp.iter_batches(batch_size=None, batch_format="pyarrow"):
        for i, c in enumerate(("ah", "al", "bh", "bl")):
            quads[i].append(_u64_col(b, c))
    packed = np.unique(_pair_pack(*(np.concatenate(q) for q in quads)))
    ah, al, bh, bl = _pair_unpack(packed)
    ia, ib = index.lookup(ah, al, bh, bl)
    sims = index.sims(ia, ib)
    mask = sims >= threshold
    if not mask.any():
        return rd.from_arrow(_empty_pairs_table(key_type))
    a, bb = _ordered_pair_columns(index.keys.take(pa.array(ia[mask])),
                                  index.keys.take(pa.array(ib[mask])))
    return rd.from_arrow(pa.table({"a": a, "b": bb,
                                   "sim": pa.array(sims[mask])}))


# ----------------------------------------------------------- simhash ----

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POP8[np.ascontiguousarray(x).view(np.uint8)].reshape(
        len(x), 8).sum(axis=1).astype(np.int64)


class _KeyIndex:
    """fp-sorted (fingerprint → key [+ payload]) lookup, broadcast via
    ``ray.put`` for scoring/restore inside map_batches tasks."""

    def __init__(self, fp16, keys: pa.Array, payload=None):
        self.fp16 = fp16
        self.keys = keys
        self.payload = payload

    def lookup(self, ah, al, bh, bl):
        ia = np.searchsorted(self.fp16, _fp_pack(ah, al))
        ib = np.searchsorted(self.fp16, _fp_pack(bh, bl))
        return ia, ib


def _build_key_index(src_ds, payload_col: str | None = None,
                     payload_dtype=None) -> _KeyIndex:
    """ONE streaming pass over a materialized (key, __fh, __fl[,
    payload]) Dataset → fp-sorted :class:`_KeyIndex`.  Size-gated by the
    caller: simhash payloads are 8 B/doc, embedding payloads dim×4 B/doc
    (float32 unit vectors), so the index stays broadcastable far beyond
    the corpus sizes where the minhash index already fell back."""
    his, los, keys, pays = [], [], [], []
    for b in src_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        his.append(_u64_col(b, "__fh"))
        los.append(_u64_col(b, "__fl"))
        keys.append(_col(b, b.schema.names[0]))
        if payload_col is not None:
            col = b.column(payload_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_list(col.type):
                flat = np.asarray(col.flatten(), dtype=payload_dtype)
                pays.append(flat.reshape(b.num_rows, -1))
            else:
                pays.append(col.to_numpy(zero_copy_only=False)
                            .astype(payload_dtype))
    fp = _fp_pack(np.concatenate(his), np.concatenate(los))
    order = np.argsort(fp, kind="stable")
    keys_arr = pa.concat_arrays(keys).take(pa.array(order))
    payload = None
    if payload_col is not None:
        payload = (np.concatenate(pays) if pays[0].ndim == 1
                   else np.vstack(pays))[order]
    return _KeyIndex(fp[order], keys_arr, payload)


def hash64_band_pairs(ds, key_column: str, hash_column: str, *,
                      max_hamming: int, num_bands: int = 4):
    """Hamming-ball near-dup pairs over ANY precomputed 64-bit
    signature column — the banded plan shared by SimHash text near-dup
    and perceptual media hashes (dHash/pHash): ``num_bands`` equal-width
    band buckets (pigeonhole-EXACT for hamming ≤ num_bands − 1: a pair
    within the threshold must agree on at least one band), verify by
    true popcount distance.  → (a, b, hamming), a < b by key.

    Same fp-space plan as minhash: the band explode ships (band_key,
    fp) 24 B rows — never keys or signatures; in-bucket pairs emit in
    fingerprint space with a vectorized table-popcount hamming check;
    the distinct + key restore run through ``_finalize_scored_fp``
    against a broadcast (fp → key) index (8 B/doc payload — far smaller
    than the corpus sizes where broadcast breaks down)."""
    import ray as _ray

    if 64 % num_bands:
        raise ValueError(f"num_bands must divide 64, got {num_bands}")
    if max_hamming >= num_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs num_bands > max_hamming "
            f"for pigeonhole-exact recall (got {num_bands})")
    width = 64 // num_bands

    def sign(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        fh, fl = _fingerprint128(keys)
        return pa.table({key_column: keys,
                         "simhash": batch.column(hash_column)
                         .cast(pa.uint64()),
                         "__fh": pa.array(fh), "__fl": pa.array(fl)})

    signed = ds.map_batches(sign, batch_format="pyarrow").materialize()
    if signed.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64())}))
    key_type = signed.schema().base_schema.field(key_column).type

    def explode(batch: pa.Table) -> pa.Table:
        sigs = _u64_col(batch, "simhash")
        n = len(sigs)
        chunks = np.arange(num_bands, dtype=np.uint64)
        mask = np.uint64((1 << width) - 1)
        vals = (sigs[:, None] >> (np.uint64(width) * chunks[None, :])) & mask
        band = ((chunks[None, :] + np.uint64(1)) << np.uint64(width) | vals).ravel()
        idx = np.repeat(np.arange(n), num_bands)
        return pa.table({
            "band_key": pa.array(_mix_u64(band)),
            "__fh": pa.array(_u64_col(batch, "__fh")[idx]),
            "__fl": pa.array(_u64_col(batch, "__fl")[idx]),
            "simhash": pa.array(sigs[idx]),
        })

    empty = pa.table({"ah": pa.array([], pa.uint64()),
                      "al": pa.array([], pa.uint64()),
                      "bh": pa.array([], pa.uint64()),
                      "bl": pa.array([], pa.uint64()),
                      "sim": pa.array([], pa.float64())})

    num_coarse = 256

    def add_cb(batch: pa.Table) -> pa.Table:
        vals = _u64_col(batch, "band_key")
        return batch.append_column(
            "__cb", pa.array((vals % np.uint64(num_coarse)).astype(np.int32)))

    def per_coarse(t: pa.Table) -> pa.Table:
        bk = _u64_col(t, "band_key")
        fp = _fp_pack(_u64_col(t, "__fh"), _u64_col(t, "__fl"))
        sig = _u64_col(t, "simhash")
        order = np.lexsort((fp, bk))
        bks = bk[order]
        bounds = np.flatnonzero(np.r_[True, bks[1:] != bks[:-1], True])
        outs = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            sel = order[s:e]
            m = e - s
            iu, ju = np.triu_indices(m, k=1)
            d = _popcount64(sig[sel][iu] ^ sig[sel][ju])
            ok = d <= max_hamming
            if not ok.any():
                continue
            a = fp[sel][iu[ok]]
            b = fp[sel][ju[ok]]
            q = np.empty((len(a), 4), dtype=">u8")
            q[:, :2] = a.view(">u8").reshape(-1, 2)
            q[:, 2:] = b.view(">u8").reshape(-1, 2)
            outs.append((q.reshape(-1).view("S32"), d[ok]))
        if not outs:
            return empty
        packed = np.concatenate([o[0] for o in outs])
        dists = np.concatenate([o[1] for o in outs])
        ah, al, bh, bl = _pair_unpack(packed)
        return pa.table({"ah": pa.array(ah), "al": pa.array(al),
                         "bh": pa.array(bh), "bl": pa.array(bl),
                         "sim": pa.array(dists.astype(np.float64))})

    scored = (signed.map_batches(explode, batch_format="pyarrow")
                    .map_batches(add_cb, batch_format="pyarrow")
                    .groupby("__cb")
                    .map_groups(per_coarse, batch_format="pyarrow")
                    .materialize())
    if scored.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "a": pa.array([], key_type), "b": pa.array([], key_type),
            "hamming": pa.array([], pa.int64())}))
    index = _build_key_index(signed.select_columns(
        [key_column, "__fh", "__fl"]))
    out = _finalize_scored_fp(scored, _ray.put(index), key_type)

    def fmt(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"a": b.column("a"), "b": b.column("b"),
                         "hamming": pc.cast(b.column("sim"), pa.int64())})

    return out.map_batches(fmt, batch_format="pyarrow")


def simhash_candidate_pairs(ds, key_column: str = "doc_id",
                            text_column: str = "text", *,
                            max_hamming: int = 3):
    """SimHash near-dup pairs: 64-bit signatures, 4×16-bit band index
    (pigeonhole-exact for hamming ≤ 3), verify by true hamming
    distance.  A thin signature pass over :func:`hash64_band_pairs` —
    the shared banded-Hamming plan (see there for the scale shape)."""

    def sign(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_column).to_pylist()]
        sigs = np.fromiter((simhash64(t) for t in texts),
                           dtype=np.uint64, count=len(texts))
        return pa.table({key_column: batch.column(key_column),
                         "simhash": pa.array(sigs)})

    signed = ds.map_batches(sign, batch_format="pyarrow")
    return hash64_band_pairs(signed, key_column, "simhash",
                             max_hamming=max_hamming, num_bands=4)


# ------------------------------------------------- embedding near-dup ----


def embedding_candidate_pairs(ds, key_column: str = "vec_id",
                              vec_column: str = "embedding", *,
                              threshold: float = 0.9, num_bits: int = 64,
                              num_bands: int = 8, seed: int = 42):
    """Embedding-cosine near-dup via signed-random-projection LSH:
    64-bit hyperplane signature per vector → 8×8-bit band buckets →
    exact cosine verify against a broadcast float32 unit-vector matrix.

    fp-space plan: the band explode ships (band_key, fp) 24 B rows —
    vectors NEVER ride the band shuffle (the pre-fp version repeated
    each vector once per band); candidates emit as fingerprint pairs,
    cosine is verified inside parallel ``map_batches`` tasks against the
    ``ray.put`` unit matrix (dim×4 B/doc), and ``_finalize_scored_fp``
    handles distinct + key restore."""
    import ray as _ray

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
            norms = np.linalg.norm(vecs, axis=1)
            norms[norms == 0] = 1.0
            unit = (vecs / norms[:, None]).astype(np.float32)
            off = pa.array(np.arange(n + 1, dtype=np.int32) * dim)
            unit_col = pa.ListArray.from_arrays(
                off, pa.array(unit.ravel(), pa.float32()))
            fh, fl = _fingerprint128(keys)
            return pa.table({key_column: keys, "srp": pa.array(sigs),
                             "unit": unit_col,
                             "__fh": pa.array(fh), "__fl": pa.array(fl)})

    signed = ds.map_batches(Sign(), batch_format="pyarrow").materialize()
    if signed.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())}))
    key_type = signed.schema().base_schema.field(key_column).type

    bits_per_band = num_bits // num_bands
    mask = np.uint64((1 << bits_per_band) - 1)

    def explode(batch: pa.Table) -> pa.Table:
        sigs = _u64_col(batch, "srp")
        n = len(sigs)
        bands = np.arange(num_bands, dtype=np.uint64)
        vals = (sigs[:, None] >> (np.uint64(bits_per_band) * bands[None, :])) & mask
        band = ((bands[None, :] + np.uint64(1)) << np.uint64(bits_per_band)
                | vals).ravel()
        idx = np.repeat(np.arange(n), num_bands)
        return pa.table({
            "band_key": pa.array(_mix_u64(band)),
            "__fh": pa.array(_u64_col(batch, "__fh")[idx]),
            "__fl": pa.array(_u64_col(batch, "__fl")[idx]),
        })

    banded = signed.map_batches(explode, batch_format="pyarrow")
    pairs_fp = _coarse_pairs_fp(banded, "all")

    index_ref = _ray.put(_build_key_index(
        signed.select_columns([key_column, "__fh", "__fl", "unit"]),
        payload_col="unit", payload_dtype=np.float32))

    empty = pa.table({"ah": pa.array([], pa.uint64()),
                      "al": pa.array([], pa.uint64()),
                      "bh": pa.array([], pa.uint64()),
                      "bl": pa.array([], pa.uint64()),
                      "sim": pa.array([], pa.float64())})

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        idx = _ray.get(index_ref)
        ah, al = _u64_col(b, "ah"), _u64_col(b, "al")
        bh, bl = _u64_col(b, "bh"), _u64_col(b, "bl")
        ia, ib = idx.lookup(ah, al, bh, bl)
        sims = np.einsum("ij,ij->i", idx.payload[ia], idx.payload[ib],
                         dtype=np.float64)
        m = sims >= threshold
        return pa.table({"ah": pa.array(ah[m]), "al": pa.array(al[m]),
                         "bh": pa.array(bh[m]), "bl": pa.array(bl[m]),
                         "sim": pa.array(sims[m])})

    scored = pairs_fp.map_batches(score, batch_format="pyarrow").materialize()
    if scored.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "a": pa.array([], key_type), "b": pa.array([], key_type),
            "cosine": pa.array([], pa.float64())}))
    out = _finalize_scored_fp(scored, index_ref, key_type)

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column("a"), "b": b.column("b"),
                         "cosine": b.column("sim")})

    return out.map_batches(fmt, batch_format="pyarrow")


# ------------------------------------- clustering (connected components) ----


def _col(t: pa.Table, name: str):
    c = t.column(name)
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _labels_checksum(state) -> int:
    """Order-free checksum of the fp-space label state, read off the
    per-bucket kind-3 rows the fused propagate pass already emitted —
    one tiny filter pass over the materialized state (≤ num_partitions
    rows reach the driver), NO per-round aggregate exchange.  Labels
    only move downward during propagation, so an unchanged checksum ⟺
    converged (up to a ~2^-40 collision chance per round)."""
    def pick(b: pa.Table) -> pa.Table:
        m = np.asarray(_col(b, "kind")) == 3
        return pa.table({"h": pa.array(_u64_col(b, "xh")[m])})

    total = 0
    for t in (state.map_batches(pick, batch_format="pyarrow")
                   .iter_batches(batch_size=None, batch_format="pyarrow")):
        if t.num_rows:
            total += int(t.column("h").to_numpy().sum(dtype=np.uint64))
    return total


def _contract_block(b: pa.Table) -> pa.Table:
    """Vectorized union-find over ONE table of pairs: rewrite them into
    (node → local min-root) star edges.  Components are preserved
    exactly — within-table merges are encoded by the root edges, and a
    node spanning tables carries one edge per local root, chaining the
    components back together — while within-table chains collapse to
    depth 1.  Output row count ≤ distinct nodes ≤ 2× pairs."""
    import pyarrow.compute as pc

    at = b.schema.field("a").type
    if b.num_rows == 0:
        return pa.table({"a": pa.array([], at), "b": pa.array([], at)})
    # encode both endpoint columns against one shared dictionary, then
    # rank-remap the codes so code order == key order (min code ≡ min
    # key); everything after is pure int32/int64 numpy
    both = pa.concat_arrays([b.column("a").combine_chunks(),
                             b.column("b").combine_chunks()])
    enc = pc.dictionary_encode(both)
    order = pc.array_sort_indices(enc.dictionary).to_numpy()
    rank = np.empty(len(order), np.int64)
    rank[order] = np.arange(len(order), dtype=np.int64)
    codes = rank[enc.indices.to_numpy(zero_copy_only=False)]
    keys_sorted = enc.dictionary.take(pa.array(order))
    ia, ib = codes[: b.num_rows], codes[b.num_rows:]
    # vectorized min-label with pointer jumping: O(log diameter)
    # numpy passes over the table's edges, no per-row Python
    lab = np.arange(len(order), dtype=np.int64)
    while True:
        prev = lab
        m = np.minimum(lab[ia], lab[ib])
        lab = lab.copy()
        np.minimum.at(lab, ia, m)
        np.minimum.at(lab, ib, m)
        lab = np.minimum(lab, lab[lab])
        if np.array_equal(lab, prev):
            break
    nonroot = np.flatnonzero(lab != np.arange(len(lab)))
    return pa.table({"a": keys_sorted.take(pa.array(nonroot)),
                     "b": keys_sorted.take(pa.array(lab[nonroot]))})


def _contract_pairs_locally(pairs_ds):
    """Block-local pre-contraction: one cheap streaming pass (no
    exchange) applying :func:`_contract_block` per block, so the
    distributed propagation's round count drops from the raw pair-graph
    diameter to the block-hop diameter."""
    return pairs_ds.select_columns(["a", "b"]).map_batches(
        _contract_block, batch_size=None, batch_format="pyarrow")


def _contract_pairs_bucketed(pairs_ds, *, num_partitions: int | None = None):
    """Bucketed pre-contraction: ONE coarse hash exchange keyed on the
    a-endpoint fingerprint co-locates every pair sharing a hub node
    before the same vectorized contraction.  LSH candidate stars share
    their ``a`` (the bucket-min member), so whole stars collapse in one
    pass no matter how the verify stage scattered them across blocks —
    the remaining cross-hub diameter is what the propagation pays for.
    Costs one exchange (the same price as one propagation round); wins
    whenever it saves ≥ 2 rounds.  Measured on the 500k-page LSH star
    corpus it does NOT (9 rounds vs 8 — hub-bucket contraction lengthens
    the min-fingerprint's travel path), so ``clusters_min_label``
    defaults to the exchange-free block-local contraction; this variant
    stays available for graphs whose components are genuinely
    key-localized (e.g. host-partitioned link graphs)."""
    C = _join_partitions(num_partitions)
    Cu = np.uint64(C)

    def add_bucket(b: pa.Table) -> pa.Table:
        fh, _ = _fingerprint128(b.column("a"))
        return pa.table({
            "__cb": pa.array((fh % Cu).astype(np.int32)),
            "a": b.column("a"), "b": b.column("b"),
        })

    def contract_group(t: pa.Table) -> pa.Table:
        return _contract_block(t.select(["a", "b"]))

    return (pairs_ds.select_columns(["a", "b"])
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__cb")
            .map_groups(contract_group, batch_format="pyarrow"))


def clusters_min_label(pairs_ds, *, num_partitions: int | None = None,
                       max_rounds: int = 50,
                       contract: bool | str = True):
    """Distributed connected components over a confirmed-pairs Dataset via
    iterative min-label propagation — the scale twin of the driver
    union-find (``clusters_from_pairs``): nothing graph-shaped ever lands
    on the driver.

    → Dataset (node, label) covering every key that appears in a pair;
    ``label`` = the minimum key in ``node``'s component (identical to the
    union-find's min-root by induction on merges).  Pairs must satisfy
    ``a != b`` — every candidate generator in this module emits a < b —
    a self-pair would survive the uncontracted plan as a self-labeled
    singleton but be elided by the contraction.

    The propagation runs entirely in 128-bit fingerprint space over ONE
    7-column row shape (__pb bucket, kind, node fp, payload fp, key):
    edge rows put their SOURCE fp in the payload slot, label rows their
    current label, contributions the label being delivered.  Each round
    is ONE int32-keyed coarse exchange (Ray's ``map_groups`` compiles to
    a sort all-to-all, so exchange count is the round cost): both the
    reduce (fold delivered contributions into each node's label by min)
    and the lookup (rewrite every edge into a contribution carrying the
    NEIGHBOR's label) key on the same ``fp % C`` bucket, so they fuse
    into a single per-bucket pass — reduce first, then emit
    contributions against the FRESH labels (r4; previously two
    exchanges per round).  Every in-block step is a numpy
    sort/searchsorted over packed fp views (no hash-join aggregator
    actors, no string exchanges).  Rounds needed = component diameter:
    small for duplicate clusters (band buckets make them star-shaped),
    O(log n) worst-case chains.  A distributed checksum over the label
    rows (labels are monotone non-increasing) detects the fixpoint
    without materializing labels on the driver.  A final exchange keyed
    on the converged fp-label regroups each component and rewrites its
    label to the min ORIGINAL key (fingerprint order ≠ key order)."""
    import ray.data as rd

    C = _join_partitions(num_partitions)
    Cu = np.uint64(C)
    try:
        key_type = pairs_ds.schema().base_schema.field("a").type
    except Exception:
        key_type = pa.int64()

    # row shape: (__pb, kind, nh, nl, xh, xl, key)
    #   kind 0 = edge          (nh = neighbor fp for lookup, x = src fp)
    #   kind 1 = label row     (nh = node fp, x = current label fp)
    #   kind 2 = contribution  (nh = src fp, x = delivered label fp)
    def edge_rows(b: pa.Table) -> pa.Table:
        afh, afl = _fingerprint128(b.column("a"))
        bfh, bfl = _fingerprint128(b.column("b"))
        nh = np.concatenate([bfh, afh])
        nl = np.concatenate([bfl, afl])
        xh = np.concatenate([afh, bfh])
        xl = np.concatenate([afl, bfl])
        n = len(nh)
        return pa.table({
            "__pb": pa.array((nh % Cu).astype(np.int32)),
            "kind": pa.array(np.zeros(n, dtype=np.int8)),
            "nh": pa.array(nh), "nl": pa.array(nl),
            "xh": pa.array(xh), "xl": pa.array(xl),
            "key": pa.nulls(n, key_type),
        })

    def seed_rows(b: pa.Table) -> pa.Table:
        """One label row per pair endpoint (label = own fp, key riding);
        duplicates collapse in the first reduce."""
        afh, afl = _fingerprint128(b.column("a"))
        bfh, bfl = _fingerprint128(b.column("b"))
        nh = np.concatenate([afh, bfh])
        nl = np.concatenate([afl, bfl])
        n = len(nh)
        return pa.table({
            "__pb": pa.array((nh % Cu).astype(np.int32)),
            "kind": pa.array(np.ones(n, dtype=np.int8)),
            "nh": pa.array(nh), "nl": pa.array(nl),
            "xh": pa.array(nh), "xl": pa.array(nl),
            "key": pa.concat_arrays([_col(b, "a"), _col(b, "b")]),
        })

    def propagate(t: pa.Table) -> pa.Table:
        """Per bucket, fused reduce+lookup+checksum: (i) min label per
        node over its label + contribution rows (the node's key rides on
        the always-present label row), (ii) rewrite each edge into a
        contribution (src node, neighbor's FRESH label) for the next
        round's bucket, (iii) emit ONE kind-3 row carrying this bucket's
        label checksum, so convergence detection is a tiny filter+take
        over the materialized state instead of a per-round aggregate
        exchange."""
        kind = np.asarray(_col(t, "kind"))
        keep = np.flatnonzero((kind == 1) | (kind == 2))
        if not len(keep):
            # bucket holding only last round's kind-3 checksum rows
            return t.slice(0, 0)
        nfp = _fp_pack(_u64_col(t, "nh"), _u64_col(t, "nl"))
        lfp = _fp_pack(_u64_col(t, "xh"), _u64_col(t, "xl"))
        nk = nfp[keep]
        lk = lfp[keep]
        order = np.lexsort((lk, nk))
        nk_s = nk[order]
        starts = np.flatnonzero(np.r_[True, nk_s[1:] != nk_s[:-1]])
        uniq_nodes = nk_s[starts]               # sorted unique node fps
        new_lab = lk[order[starts]]             # min label per node
        nh, nl = _fp_unpack(uniq_nodes)
        xh, xl = _fp_unpack(new_lab)
        keyed = np.flatnonzero(kind == 1)
        kfp = nfp[keyed]
        korder = np.argsort(kfp, kind="stable")
        key_src = keyed[korder[np.searchsorted(kfp[korder], uniq_nodes)]]
        n = len(starts)
        labels_out = pa.table({
            "__pb": pa.array((nh % Cu).astype(np.int32)),
            "kind": pa.array(np.ones(n, dtype=np.int8)),
            "nh": pa.array(nh), "nl": pa.array(nl),
            "xh": pa.array(xh), "xl": pa.array(xl),
            "key": _take_arr(t.column("key"), key_src),
        })
        pieces = [labels_out]
        if n:
            # per-bucket label checksum (same 40-bit terms the old
            # aggregate computed) rides the state as ONE kind-3 row
            v = xh ^ (xl * _FNV_PRIME_64)
            ck = np.uint64((_mix_u64(v) >> np.uint64(24))
                           .astype(np.int64).sum())
            zero = np.zeros(1, np.uint64)
            pieces.append(pa.table({
                "__pb": pa.array((zero % Cu).astype(np.int32)),
                "kind": pa.array(np.full(1, 3, dtype=np.int8)),
                "nh": pa.array(zero), "nl": pa.array(zero),
                "xh": pa.array(np.array([ck], np.uint64)),
                "xl": pa.array(zero),
                "key": pa.nulls(1, t.schema.field("key").type),
            }))
        em = np.flatnonzero(kind == 0)
        if not len(em) or not n:
            return pa.concat_tables(pieces)
        # every edge's neighbor is seeded, so the lookup always hits
        pos = np.searchsorted(uniq_nodes, nfp[em])
        ch, cl = _fp_unpack(new_lab[pos])
        sh = _u64_col(t, "xh")[em]
        sl = _u64_col(t, "xl")[em]
        ne = len(em)
        contrib = pa.table({
            "__pb": pa.array((sh % Cu).astype(np.int32)),
            "kind": pa.array(np.full(ne, 2, dtype=np.int8)),
            "nh": pa.array(sh), "nl": pa.array(sl),
            "xh": pa.array(ch), "xl": pa.array(cl),
            "key": pa.nulls(ne, t.schema.field("key").type),
        })
        return pa.concat_tables(pieces + [contrib])

    if contract == "bucketed":
        pairs_ds = _contract_pairs_bucketed(
            pairs_ds, num_partitions=num_partitions).materialize()
    elif contract:
        pairs_ds = _contract_pairs_locally(pairs_ds).materialize()
    edges = pairs_ds.map_batches(edge_rows, batch_format="pyarrow").materialize()
    state = _nonempty_blocks(
        pairs_ds.map_batches(seed_rows, batch_format="pyarrow")
                .materialize())
    if state is None:   # no pairs → no labels
        return rd.from_arrow(pa.table({"node": pa.array([], key_type),
                                       "label": pa.array([], key_type)}))
    # Round 1 folds NO contributions (the fused pass only emits them for
    # round 2), so its checksum equals the seed checksum whenever seeds
    # have no multiplicity (e.g. an isolated pair) — comparing against
    # the seed state would false-converge with nothing merged.  The
    # break is therefore armed only from round 2 on: a round-2 checksum
    # equal to round 1 means the first contribution fold changed no
    # label, which with distinct-fp endpoints implies convergence.
    global LAST_PROPAGATION_ROUNDS
    LAST_PROPAGATION_ROUNDS = 0
    prev = None
    for rnd in range(max_rounds):
        nxt = _nonempty_blocks(
            state.union(edges).groupby("__pb")
                 .map_groups(propagate, batch_format="pyarrow")
                 .materialize())
        cur = _labels_checksum(nxt)
        state = nxt
        LAST_PROPAGATION_ROUNDS += 1
        if rnd > 0 and cur == prev:
            break
        prev = cur

    # ---- regroup by converged fp-label; rewrite to min ORIGINAL key ----
    def by_label(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b.column("kind"), 1))   # drop contributions
        xh = _u64_col(b, "xh")
        return pa.table({
            "__pb": pa.array((xh % Cu).astype(np.int32)),
            "xh": b.column("xh"), "xl": b.column("xl"),
            "key": b.column("key"),
        })

    def min_key_per_label(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lfp = _fp_pack(_u64_col(t, "xh"), _u64_col(t, "xl"))
        order = np.argsort(lfp, kind="stable")
        lfp_s = lfp[order]
        new_run = np.r_[True, lfp_s[1:] != lfp_s[:-1]]
        run_id = np.cumsum(new_run) - 1
        keys = _take_arr(t.column("key"), order)
        grouped = (pa.table({"g": pa.array(run_id), "key": keys})
                   .group_by("g").aggregate([("key", "min")]))
        gsort = pc.sort_indices(grouped.column("g"))
        min_keys = grouped.column("key_min").take(gsort)
        if isinstance(min_keys, pa.ChunkedArray):
            min_keys = min_keys.combine_chunks()
        labels = min_keys.take(pa.array(run_id))
        return pa.table({"node": keys, "label": labels})

    return (state.map_batches(by_label, batch_format="pyarrow")
                 .groupby("__pb")
                 .map_groups(min_key_per_label, batch_format="pyarrow"))


def drop_nodes_min_label(labels):
    """(node, label) → Dataset of the keys to DROP: every cluster member
    except the (min) root.  Small by construction (only duplicates)."""
    def f(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.invert(pc.equal(b.column("node"), b.column("label")))
        return b.filter(mask).select(["node"])

    return labels.map_batches(f, batch_format="pyarrow")


def dedup_near_keep(ds, key_column: str, pairs_ds, *,
                    num_partitions: int | None = None,
                    cluster_exec: str = "auto",
                    local_budget_pairs: int = 50_000_000,
                    local_budget_bytes: int = 2_000_000_000):
    """Near-dup kept-set: cluster the confirmed pairs, then drop every
    cluster member except its min-key root.

    ``cluster_exec`` mirrors the verify-plan gating:
    - "local": one vectorized min-label pass over the collected pair
      columns (Arrow dictionary-encode → numpy label propagation, never
      Python tuples), drop set broadcast once via ``ray.put`` and
      applied as a vectorized ``is_in`` filter — no shuffle at all.
      The right plan while the pair set fits one machine (pairs are
      confirmed DUPLICATES, so their count is bounded by the corpus
      duplication mass, not the corpus).
    - "distributed": min-label-propagation connected components
      (``clusters_min_label``) + LEFT ANTI drop-join — nothing pair- or
      cluster-shaped on the driver; the 100-TB path.
    - "auto" (default): "local" while the confirmed pair count fits
      ``local_budget_pairs`` AND the pair payload fits
      ``local_budget_bytes`` (the byte gate is what matters for string
      keys — 50M URL pairs is tens of GB), else "distributed"."""
    if cluster_exec not in ("auto", "local", "distributed"):
        raise ValueError(f"cluster_exec={cluster_exec!r}")
    if cluster_exec == "auto":
        pairs_ds = pairs_ds.materialize()
        cluster_exec = ("local"
                        if pairs_ds.count() <= local_budget_pairs
                        and (pairs_ds.size_bytes() or 0) <= local_budget_bytes
                        else "distributed")
    if cluster_exec == "local":
        import pyarrow.compute as pc

        import ray as _ray

        batches = list(pairs_ds.select_columns(["a", "b"]).iter_batches(
            batch_size=None, batch_format="pyarrow"))
        drop = _drop_array_from_pair_batches(batches)
        if drop is None:
            return ds
        drop_ref = _ray.put(drop)

        def keep(b: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(b.column(key_column),
                                      value_set=_ray.get(drop_ref)))
            return b.filter(mask)

        return ds.map_batches(keep, batch_format="pyarrow")

    labels = clusters_min_label(pairs_ds, num_partitions=num_partitions)
    drop = _nonempty_blocks(drop_nodes_min_label(labels).materialize())
    if drop is None:   # no duplicates found → corpus unchanged
        return ds
    return safe_join(ds, drop, "left_anti", num_partitions,
                     on=(key_column,), right_on=("node",))


def dedup_near_keep_best(ds, key_column: str, pairs_ds, order_column: str,
                         *, descending: bool = True,
                         num_partitions: int | None = None,
                         keep_exec: str = "auto",
                         local_budget_pairs: int = 50_000_000,
                         local_budget_bytes: int = 2_000_000_000):
    """Near-dup kept-set with a QUALITY policy: per confirmed-pair
    cluster keep the row with the best ``order_column`` (max when
    ``descending=True`` — e.g. longest text, highest quality score —
    min otherwise), ties broken toward the smallest key; rows in no
    pair are kept untouched.  The policy twin of
    :func:`dedup_near_keep` (which keeps the min-KEY root regardless of
    content) — what production curation actually wants: of N crawl
    copies of a page, keep the cleanest one, not the
    lexicographically-first url.

    Plans (byte-equal, pytest-pinned), gated like ``dedup_near_keep``:

    - "local": cluster labels collected (bounded by duplication mass,
      not the corpus), one streaming pass gathers the contenders'
      (key, order) pairs, a vectorized pandas sort resolves the
      winner per cluster, and the loser set broadcasts back as one
      ``pc.is_in`` drop-filter.
    - "distributed": inner-join the corpus' (key, order) projection to
      the cluster labels, per-cluster best via ONE Max aggregate +
      tie-resolve join + Min-key aggregate, losers = labels LEFT ANTI
      winners, corpus LEFT ANTI losers — nothing cluster-shaped on the
      driver; the 100-TB path."""
    import pyarrow.compute as pc

    import ray as _ray

    if keep_exec not in ("auto", "local", "distributed"):
        raise ValueError(f"keep_exec={keep_exec!r}")
    if keep_exec == "auto":
        pairs_ds = pairs_ds.materialize()
        keep_exec = ("local"
                     if pairs_ds.count() <= local_budget_pairs
                     and (pairs_ds.size_bytes() or 0) <= local_budget_bytes
                     else "distributed")

    labels = clusters_min_label(pairs_ds, num_partitions=num_partitions)

    if keep_exec == "local":
        import pandas as pd

        lb = list(labels.iter_batches(batch_size=None,
                                      batch_format="pyarrow"))
        lb = [t for t in lb if t.num_rows]
        if not lb:
            return ds
        lt = pa.concat_tables(lb, promote_options="default")
        lmap = pd.Series(lt.column("label").to_pandas().to_numpy(),
                         index=lt.column("node").to_pandas().to_numpy())
        node_set = _ray.put(lt.column("node").combine_chunks())

        def contender_cols(b: pa.Table) -> pa.Table:
            t = pa.table({key_column: b.column(key_column),
                          order_column: b.column(order_column)})
            return t.filter(pc.is_in(b.column(key_column),
                                     value_set=_ray.get(node_set)))

        cb = list(ds.map_batches(contender_cols, batch_format="pyarrow")
                    .iter_batches(batch_size=None, batch_format="pyarrow"))
        cb = [t for t in cb if t.num_rows]
        if not cb:
            return ds
        cdf = pa.concat_tables(cb, promote_options="default").to_pandas()
        cdf["__cluster"] = lmap.reindex(cdf[key_column]).to_numpy()
        cdf = cdf.sort_values(
            ["__cluster", order_column, key_column],
            ascending=[True, not descending, True], kind="mergesort")
        losers = cdf.loc[cdf["__cluster"].duplicated(), key_column]
        loser_arr = _ray.put(pa.array(losers.to_numpy(),
                                      lt.schema.field("node").type))

        def drop(b: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(b.column(key_column),
                                      value_set=_ray.get(loser_arr)))
            return b.filter(mask)

        return ds.map_batches(drop, batch_format="pyarrow")

    from ray.data.aggregate import Max, Min

    parts = _join_partitions(num_partitions)
    labels = _nonempty_blocks(labels.materialize())
    if labels is None:
        return ds

    contenders = safe_join(ds.select_columns([key_column, order_column]),
                           labels, "inner", parts,
                           on=(key_column,), right_on=("node",))
    if contenders is not None:
        contenders = _nonempty_blocks(contenders.materialize())
    if contenders is None:
        return ds

    def with_v(b: pa.Table) -> pa.Table:
        v = b.column(order_column)
        if not descending:
            v = pc.negate(v)
        return pa.table({key_column: b.column(key_column),
                         "label": b.column("label"), "__v": v})

    contenders = _nonempty_blocks(
        contenders.map_batches(with_v, batch_format="pyarrow")
                  .materialize())
    best = contenders.groupby("label").aggregate(
        Max("__v", alias_name="__best"))
    tied = safe_join(contenders, best, "inner", parts,
                     on=("label", "__v"), right_on=("label", "__best"))
    if tied is not None:
        tied = _nonempty_blocks(tied.materialize())
    if tied is None:   # unreachable in practice: every label has a max
        return ds
    winners = tied.groupby("label").aggregate(
        Min(key_column, alias_name="__wkey"))
    losers = safe_join(labels, winners, "left_anti", parts,
                       on=("node",), right_on=("__wkey",))
    if losers is not None:
        losers = _nonempty_blocks(losers.materialize())
    if losers is None:
        return ds
    return safe_join(ds, losers, "left_anti", parts,
                     on=(key_column,), right_on=("node",))


def dedup_near_against(new_ds, seen_ds, key_column: str, text_column: str,
                       *, seen_text_column: str | None = None,
                       threshold: float = 0.9, num_perm: int = 128,
                       num_bands: int = 32, verify: str = "exact",
                       num_partitions: int | None = None):
    """Incremental NEAR dedup: drop every row of ``new_ds`` whose
    near-dup component (in the combined new ∪ seen pair graph) contains
    a ``seen_ds`` document — the delta-crawl twin of :func:`dedup_against`
    for near-duplicates instead of exact content matches.  Component
    semantics (what LSH-cluster dedup gives in production): a new doc
    connected to a seen doc through a chain of near-dups is dropped too.
    Keys must be globally unique across both sets (e.g. crawl-qualified
    urls).

    Scale shape: ONE LSH pass over the union of the two (key, text)
    projections (star pairs, fp-space banding), min-label components,
    then three bounded joins — labels LEFT SEMI seen keys → contaminated
    label set, labels LEFT SEMI that set → drop nodes, new LEFT ANTI
    drop nodes.  Everything after the banding is bounded by duplication
    mass, never corpus size; nothing lands on the driver."""
    seen_tc = seen_text_column or text_column

    def proj(tc: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({key_column: b.column(key_column),
                             text_column: b.column(tc)})

        return f

    combined = (new_ds.map_batches(proj(text_column),
                                   batch_format="pyarrow")
                .union(seen_ds.map_batches(proj(seen_tc),
                                           batch_format="pyarrow")))
    pairs = minhash_candidate_pairs(
        combined, key_column, text_column, threshold=threshold,
        verify=verify, num_perm=num_perm, num_bands=num_bands,
        pair_mode="star", num_partitions=num_partitions,
    )
    return _drop_component_contaminated(
        new_ds, pairs, seen_ds.select_columns([key_column]),
        key_column, num_partitions)


def _drop_component_contaminated(new_ds, pairs, seen_keys, key_column,
                                 num_partitions):
    """Shared tail of the incremental near-dup plans: min-label
    components over the confirmed pairs, then three duplication-mass-
    bounded joins — labels LEFT SEMI seen keys → contaminated label
    set, labels LEFT SEMI that set → drop nodes, new LEFT ANTI drop
    nodes."""
    labels = _nonempty_blocks(
        clusters_min_label(pairs, num_partitions=num_partitions)
        .materialize())
    if labels is None:   # no near-dups anywhere → new corpus unchanged
        return new_ds
    parts = _join_partitions(num_partitions)
    bad_labels = safe_join(labels, seen_keys,
                           "left_semi", parts,
                           on=("node",), right_on=(key_column,))
    if bad_labels is not None:
        bad_labels = _nonempty_blocks(
            bad_labels.map_batches(lambda b: b.select(["label"]),
                                   batch_format="pyarrow").materialize())
    if bad_labels is None:   # no component touches the seen corpus
        return new_ds
    drop = safe_join(labels, bad_labels, "left_semi", parts,
                     on=("label",), right_on=("label",))
    if drop is not None:
        drop = _nonempty_blocks(
            drop.map_batches(lambda b: b.select(["node"]),
                             batch_format="pyarrow").materialize())
    if drop is None:
        return new_ds
    return safe_join(new_ds, drop, "left_anti", parts,
                       on=(key_column,), right_on=("node",))


def near_dup_cluster_labels(ds, key_column: str, pairs_ds, *,
                            num_partitions: int | None = None,
                            label_exec: str = "auto",
                            local_budget_pairs: int = 50_000_000,
                            local_budget_bytes: int = 2_000_000_000):
    """Cluster LABELS for every row of ``ds``: (key_column, cluster)
    where cluster = the min key of the row's connected component in the
    confirmed-pair graph; rows in no pair label themselves.  Feeds
    stratified sampling / one-per-cluster selection / duplication
    analytics — the kept-set's (``dedup_near_keep``) sibling, with the
    same plan gating:

    - "local": min-label propagation on the collected pair columns
      (Arrow/numpy, no Python tuples), label map broadcast once via
      ``ray.put``, applied as a streaming fill — right while the label
      table (bounded by duplication mass, not the corpus) fits one
      machine.
    - "distributed": ``clusters_min_label`` + LEFT OUTER label join +
      vectorized coalesce — nothing pair- or label-shaped on the
      driver.
    - "auto" (default): byte-gated like ``dedup_near_keep``."""
    import pyarrow.compute as pc

    import ray as _ray

    if label_exec not in ("auto", "local", "distributed"):
        raise ValueError(f"label_exec={label_exec!r}")
    if label_exec == "auto":
        pairs_ds = pairs_ds.materialize()
        label_exec = ("local"
                      if pairs_ds.count() <= local_budget_pairs
                      and (pairs_ds.size_bytes() or 0) <= local_budget_bytes
                      else "distributed")
    if label_exec == "local":
        lmap = {}
        labels = clusters_min_label(pairs_ds,
                                    num_partitions=num_partitions)
        for b in labels.iter_batches(batch_size=None,
                                     batch_format="pyarrow"):
            lmap.update(zip(b.column("node").to_pylist(),
                            b.column("label").to_pylist()))
        ref = _ray.put(lmap)

        def fill(b: pa.Table) -> pa.Table:
            import pandas as pd

            lm = _ray.get(ref)
            ids = pd.Series(b.column(key_column).to_pylist())
            lab = ids.map(lm).fillna(ids)   # vectorized; singletons = self
            # pandas map float-boxes ints with NaN holes — pin the type
            return pa.table({
                key_column: b.column(key_column),
                "cluster": pa.array(lab.tolist(),
                                    b.schema.field(key_column).type),
            })

        return ds.map_batches(fill, batch_format="pyarrow")

    labels = clusters_min_label(pairs_ds, num_partitions=num_partitions)
    labels = _nonempty_blocks(labels.materialize())
    if labels is None:

        def self_label(b: pa.Table) -> pa.Table:
            return pa.table({key_column: b.column(key_column),
                             "cluster": b.column(key_column)})

        return ds.map_batches(self_label, batch_format="pyarrow")

    def coalesce(b: pa.Table) -> pa.Table:
        lab = (b.column("label") if "label" in b.column_names
               else pa.nulls(b.num_rows, b.schema.field(key_column).type))
        return pa.table({
            key_column: b.column(key_column),
            "cluster": pc.coalesce(lab, b.column(key_column)),
        })

    return (safe_join(ds.select_columns([key_column]), labels,
                      "left_outer", num_partitions,
                      on=(key_column,), right_on=("node",))
            .map_batches(coalesce, batch_format="pyarrow"))


def leakage_safe_split(ds, key_column: str, pairs_ds, *,
                       test_pct: int = 10, valid_pct: int = 10,
                       label_exec: str = "auto"):
    """Train/valid/test split that never separates near-duplicates:
    every document inherits its connected-component cluster label
    (:func:`near_dup_cluster_labels` — min key of the component,
    singletons label themselves), then the whole COMPONENT maps to one
    split via the md5 bucket of its cluster id — the exact rule
    ``textstats.hash_split`` applies per row, lifted to components.
    Splitting per row leaks: a near-copy of a training document landing
    in test silently inflates eval (the decontamination failure mode);
    hashing the cluster id instead moves the entire component together.

    Returns (key, cluster, split) for every input row.  Deterministic,
    RNG-free, engine-reproducible (md5 on the stringified cluster id).

    Scale shape: inherits the label plan's byte-gated local/distributed
    machinery; the split tag itself is a pure streaming map."""
    labels = near_dup_cluster_labels(ds, key_column, pairs_ds,
                                     label_exec=label_exec)
    from ..functions.hashing import md5_hex

    def tag(batch: pa.Table) -> pa.Table:
        clusters = batch.column("cluster").to_pylist()
        names = []
        for c in clusters:
            b = int(md5_hex(str(c))[:8], 16) % 100
            names.append("test" if b < test_pct
                         else "valid" if b < test_pct + valid_pct
                         else "train")
        return batch.append_column("split", pa.array(names, pa.string()))

    return labels.map_batches(tag, batch_format="pyarrow")


# ------------------------------------------------------- union-find ----


def _drop_array_from_pair_batches(batches: list[pa.Table]):
    """Columnar local clustering: pair batches (a, b) → sorted pa.Array
    of keys to DROP (every cluster member except its min-key root), or
    ``None`` when there is nothing to drop.

    Keys stay in Arrow/numpy end to end — dictionary-encode both pair
    columns to int codes, relabel codes into key-sort-rank space so
    "min label" == "min key", then vectorized min-label propagation with
    pointer jumping (converges in O(log diameter) sweeps; duplicate
    clusters are shallow).  Same min-root semantics as
    ``clusters_from_pairs`` (pytest-pinned), without materializing one
    Python tuple per pair."""
    import pyarrow.compute as pc

    tables = [t for t in batches if len(t)]
    if not tables:
        return None
    tbl = pa.concat_tables(tables, promote_options="default").combine_chunks()
    n_pairs = len(tbl)
    both = pa.concat_arrays(
        [c for col in (tbl.column("a"), tbl.column("b"))
         for c in (col.chunks if isinstance(col, pa.ChunkedArray) else [col])])
    enc = both.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = enc.dictionary
    n_keys = len(dictionary)
    # rank[code] = position of that key in ascending key order, so the
    # minimum LABEL is always the minimum KEY of the component.
    sort_idx = pc.sort_indices(dictionary).to_numpy(zero_copy_only=False)
    rank = np.empty(n_keys, dtype=np.int64)
    rank[sort_idx] = np.arange(n_keys, dtype=np.int64)
    ra = rank[codes[:n_pairs]]
    rb = rank[codes[n_pairs:]]
    lab = np.arange(n_keys, dtype=np.int64)
    while True:
        nxt = lab.copy()
        np.minimum.at(nxt, ra, lab[rb])
        np.minimum.at(nxt, rb, lab[ra])
        nxt = np.minimum(nxt, nxt[nxt])       # pointer jumping
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    drop_ranks = np.nonzero(lab != np.arange(n_keys, dtype=np.int64))[0]
    if not len(drop_ranks):
        return None
    # drop_ranks ascending in rank space == ascending key order
    sorted_keys = dictionary.take(pa.array(sort_idx))
    return sorted_keys.take(pa.array(drop_ranks))


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


# --------------------------------------- global paragraph dedup (C4) ----


def dedup_paragraph_global(ds, key_column: str = "doc_id",
                           text_column: str = "text", *,
                           max_occurrences: int = 2):
    """C4-style boilerplate removal: drop every paragraph whose EXACT
    text occurs more than ``max_occurrences`` times across the corpus,
    then rebuild each document from its surviving paragraphs (original
    order, double-newline joined).

    Scale shape: pass 1 emits per-batch PARTIAL (md5(paragraph), n)
    counts — the aggregation exchange is vocabulary-sized, one 48 B row
    per distinct paragraph per batch, never the text; the hot set
    (n > max_occurrences) is boilerplate and therefore SMALL, so it
    broadcasts once via ``ray.put`` and pass 2 streams the corpus again,
    filtering in-memory.  No text ever shuffles."""
    from ray.data.aggregate import Sum

    import ray as _ray

    from ..functions.hashing import md5_hex
    from ..functions.repetition import split_paragraphs

    def partial_counts(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch.column(text_column).to_pylist():
            for p in split_paragraphs(t or ""):
                h = md5_hex(p)
                counts[h] = counts.get(h, 0) + 1
        return pa.table({"phash": pa.array(list(counts.keys()), pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    freq = (ds.map_batches(partial_counts, batch_format="pyarrow")
              .groupby("phash")
              .aggregate(Sum("n", alias_name="n")))

    def hot_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.greater(b.column("n"), max_occurrences)
                        ).select(["phash"])

    hot_batches = list(freq.map_batches(hot_only, batch_format="pyarrow")
                           .iter_batches(batch_size=None,
                                         batch_format="pyarrow"))
    hot = (set(pa.concat_tables(hot_batches, promote_options="default")
               .column("phash").to_pylist()) if hot_batches else set())
    hot_ref = _ray.put(hot)

    def rebuild(batch: pa.Table) -> pa.Table:
        hot = _ray.get(hot_ref)
        keys = batch.column(key_column)
        out = []
        for t in batch.column(text_column).to_pylist():
            paras = [p for p in split_paragraphs(t or "")
                     if md5_hex(p) not in hot]
            out.append("\n\n".join(paras))
        return pa.table({key_column: keys,
                         "clean": pa.array(out, pa.string())})

    return ds.map_batches(rebuild, batch_format="pyarrow")


def strip_host_boilerplate(ds, host_column: str = "host",
                           key_column: str = "doc_id",
                           text_column: str = "text", *,
                           min_docs: int = 4,
                           exec: str = "auto",
                           num_buckets: int = 64,
                           local_budget_rows: int = 20_000_000,
                           local_budget_bytes: int = 1_000_000_000,
                           num_partitions: int | None = None,
                           out_column: str = "clean"):
    """Cross-document per-host template removal: drop every line whose
    EXACT text occurs in at least ``min_docs`` DISTINCT documents of
    the SAME host — nav bars, cookie banners, footers and other
    site-template chrome that per-document heuristics can't see
    (trafilatura/CCNet's "frequent line" boilerplate rule applied
    corpus-wide).  The in-repo per-document analogue is the DOM
    link-density strip in ``functions/html_md.py``; this operator is
    its statistical cross-document complement, the step a crawl
    pipeline runs AFTER extraction.  Returns one row per input row:
    (``key_column``, ``out_column``) with surviving lines re-joined by
    ``\\n`` in original order (documents whose every line is template
    become the empty string).

    Plans (byte-equal, pytest-pinned):

    - ``exec="broadcast"``: pass 1 counts docs-per-(host, line-md5)
      with a per-batch combiner (the exchange ships 48 B rows, never
      line text); the hot set (count >= ``min_docs``) is by definition
      template mass — small relative to the corpus — so it broadcasts
      once via ``ray.put`` as packed ``host\\0md5`` strings and pass 2
      re-streams the corpus filtering lines in memory.
    - ``exec="anti"``: the 100-TB path when the hot set outgrows one
      node — explode documents to (key, idx, host, line-md5, line)
      rows plus a per-document sentinel (idx=-1, md5=""), LEFT ANTI
      join against the hot (host, md5) table, then rebuild documents
      inside hash(key)-coarse buckets with vectorized sort →
      run-length → ``binary_join`` (the sentinel guarantees every
      document survives; its leading "" is sliced back off, so a
      fully-templated document still emits "").
    - ``exec="auto"`` (default): the dedup_exact gate — materialize
      the hot set once, broadcast while its row count and byte size
      fit the local budgets, else anti-join."""
    import pyarrow.compute as pc

    import ray as _ray

    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_hex, stable_hash64

    if exec not in ("auto", "broadcast", "anti"):
        raise ValueError(f"exec={exec!r}")

    def _flat_lines(col):
        """Vectorized ``(t or "").split("\\n")`` over the column:
        (flat line StringArray, int64 doc index per line, per-doc line
        counts)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern(pc.fill_null(col.cast(pa.string()), ""),
                                 "\n")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lens = (pc.list_value_length(lists)
                .to_numpy(zero_copy_only=False).astype(np.int64))
        flat = lists.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        return flat, doc_of, lens

    def _line_md5s(dictionary: pa.Array) -> pa.Array:
        # the only Python loop left: md5 once per DISTINCT batch line
        # (boilerplate repeats heavily — that is this operator's point)
        return pa.array([md5_hex(s) for s in dictionary.to_pylist()],
                        pa.string())

    def line_doc_partial(batch: pa.Table) -> pa.Table:
        # vectorized (host, line-hash) doc-frequency combiner: line
        # dictionary encode + two packed-int64 np.unique passes (first
        # dedups lines WITHIN a doc, second counts docs per host+line)
        lines, doc_of, _lens = _flat_lines(batch.column(text_column))
        empty = pa.table({host_column: pa.array([], pa.string()),
                          "__lh": pa.array([], pa.string()),
                          "pn": pa.array([], pa.int64())})
        if len(lines) == 0:
            return empty
        hcol = batch.column(host_column)
        if isinstance(hcol, pa.ChunkedArray):
            hcol = hcol.combine_chunks()
        henc = hcol.cast(pa.string()).dictionary_encode()
        hdict, hidx = henc.dictionary, henc.indices
        if hidx.null_count:
            hidx = pc.fill_null(hidx, len(hdict))
            hdict = pa.concat_arrays([hdict, pa.nulls(1, hdict.type)])
        hi = hidx.to_numpy(zero_copy_only=False).astype(np.int64)
        lenc = lines.dictionary_encode()
        lidx = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        L = len(lenc.dictionary)
        per_doc = np.unique(doc_of * L + lidx)
        uk, cnt = np.unique(hi[per_doc // L] * L + per_doc % L,
                            return_counts=True)
        lh_dict = _line_md5s(lenc.dictionary)
        return pa.table({
            host_column: pc.take(hdict, pa.array(uk // L)).cast(pa.string()),
            "__lh": pc.take(lh_dict, pa.array(uk % L)),
            "pn": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    def hot_only(b: pa.Table) -> pa.Table:
        return (b.filter(pc.greater_equal(b.column("__n"), min_docs))
                 .select([host_column, "__lh"]))

    hot = (ds.map_batches(line_doc_partial, batch_format="pyarrow")
             .groupby([host_column, "__lh"])
             .aggregate(Sum("pn", alias_name="__n"))
             .map_batches(hot_only, batch_format="pyarrow"))

    if exec == "auto":
        hot = hot.materialize()
        exec = ("broadcast"
                if hot.count() <= local_budget_rows
                and (hot.size_bytes() or 0) <= local_budget_bytes
                else "anti")

    if exec == "broadcast":
        parts: list[pa.Array] = []
        for b in hot.iter_batches(batch_size=65_536,
                                  batch_format="pyarrow"):
            j = pc.binary_join_element_wise(
                b.column(host_column), b.column("__lh"), "\x00")
            parts.append(j.combine_chunks()
                         if isinstance(j, pa.ChunkedArray) else j)
        hot_arr = (pc.unique(pa.concat_arrays(parts)) if parts
                   else pa.array([], pa.string()))
        hot_ref = _ray.put(hot_arr)

        def rebuild(batch: pa.Table) -> pa.Table:
            # vectorized: md5 once per distinct line, one is_in probe
            # against the broadcast hot array, list-offset rebuild
            hot_keys = _ray.get(hot_ref)
            lines, doc_of, lens = _flat_lines(batch.column(text_column))
            lenc = lines.dictionary_encode()
            lh = pc.take(_line_md5s(lenc.dictionary), lenc.indices)
            hcol = batch.column(host_column)
            if isinstance(hcol, pa.ChunkedArray):
                hcol = hcol.combine_chunks()
            host_of = pc.take(hcol.cast(pa.string()), pa.array(doc_of))
            key = pc.binary_join_element_wise(host_of, lh, "\x00")
            keep = pc.invert(pc.is_in(key, value_set=hot_keys)).to_numpy(
                zero_copy_only=False)
            ck = np.r_[0, np.cumsum(keep.astype(np.int64))]
            ends = np.cumsum(lens)
            kept_per_doc = ck[ends] - ck[ends - lens]
            offsets = pa.array(np.r_[0, np.cumsum(kept_per_doc)]
                               .astype(np.int32), pa.int32())
            kept = lines.filter(pa.array(keep))
            joined = pc.binary_join(
                pa.ListArray.from_arrays(offsets, kept), "\n")
            return pa.table({key_column: batch.column(key_column),
                             out_column: joined.cast(pa.string())})

        return ds.map_batches(rebuild, batch_format="pyarrow")

    hot_keys = _nonempty_blocks(hot.materialize())

    def explode(batch: pa.Table) -> pa.Table:
        # vectorized doc→line explode: one sentinel row per doc
        # (__idx=-1, __lh="" — never a 32-hex md5) followed by the line
        # rows; md5 runs once per DISTINCT batch line
        lines, doc_of, lens = _flat_lines(batch.column(text_column))
        n_docs = batch.num_rows
        lenc = lines.dictionary_encode()
        lh = pc.take(_line_md5s(lenc.dictionary), lenc.indices)
        if isinstance(lh, pa.ChunkedArray):
            lh = lh.combine_chunks()
        starts = np.r_[0, np.cumsum(lens)[:-1]]
        idx = np.arange(len(doc_of), dtype=np.int64) - starts[doc_of]
        take_docs = pa.array(np.r_[np.arange(n_docs, dtype=np.int64),
                                   doc_of])
        kcol = batch.column(key_column)
        hcol = batch.column(host_column)
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        if isinstance(hcol, pa.ChunkedArray):
            hcol = hcol.combine_chunks()
        blanks = pa.array([""] * n_docs, pa.string())
        return pa.table({
            key_column: pc.take(kcol, take_docs),
            host_column: pc.take(hcol.cast(pa.string()), take_docs),
            "__idx": pa.array(np.r_[np.full(n_docs, -1, np.int64), idx],
                              pa.int64()),
            "__lh": pa.concat_arrays([blanks, lh]),
            "__line": pa.concat_arrays([blanks, lines]),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    if hot_keys is not None:
        exploded = safe_join(
            exploded, hot_keys, "left_anti", num_partitions,
            on=(host_column, "__lh"), right_on=(host_column, "__lh"))
    survivors = (_nonempty_blocks(exploded.materialize())
                 if exploded is not None else None)
    if survivors is None:  # pathological: every doc fully templated
        def empty_out(batch: pa.Table) -> pa.Table:
            return pa.table({
                key_column: batch.column(key_column),
                out_column: pa.array([""] * batch.num_rows, pa.string())})

        return ds.map_batches(empty_out, batch_format="pyarrow")

    def bucket(batch: pa.Table) -> pa.Table:
        pb = pa.array([stable_hash64(str(k)) % num_buckets
                       for k in batch.column(key_column).to_pylist()],
                      pa.int32())
        return (batch.select([key_column, "__idx", "__line"])
                     .append_column("__pb", pb))

    def bucket_agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                key_column: pa.array([], t.schema.field(key_column).type),
                out_column: pa.array([], pa.string())})
        order = pc.sort_indices(t, sort_keys=[(key_column, "ascending"),
                                              ("__idx", "ascending")])
        t = t.take(order)
        k = t.column(key_column).combine_chunks()
        v = t.column("__line").combine_chunks()
        ne = pc.fill_null(pc.not_equal(k.slice(1), k.slice(0, len(k) - 1)),
                          True)
        starts = np.flatnonzero(np.r_[True,
                                      ne.to_numpy(zero_copy_only=False)])
        offsets = pa.array(np.r_[starts, len(k)].astype(np.int32), pa.int32())
        # the sentinel ("" at __idx=-1) heads every document's run, so
        # the join is "\n" + text — slice exactly one codeunit back off
        joined = pc.utf8_slice_codeunits(
            pc.binary_join(pa.ListArray.from_arrays(offsets, v), "\n"), 1)
        return pa.table({key_column: k.take(pa.array(starts)),
                         out_column: joined})

    return (survivors.map_batches(bucket, batch_format="pyarrow")
                     .groupby("__pb")
                     .map_groups(bucket_agg, batch_format="pyarrow"))


# ------------------------------------------------------------- bloom ----
# Blocked? No — one flat Bloom bitmap per job: at the default 10 bits/key
# a 10^9-key archive is a 1.25 GB bitmap (one ray.put, zero-copy reads in
# every filter task); at 10^11+ keys raise bits-per-key pressure by
# sharding the ARCHIVE (run dedup_against per key-range partition), not
# by growing one bitmap past object-store comfort.

_BLOOM_BITS_PER_KEY = 10
_BLOOM_K = 7


def _bloom_positions(u: np.ndarray, m: int, k: int) -> np.ndarray:
    """uint64 key hashes → (k·n,) bit positions via double hashing
    (h1 + i·h2 mod m, h2 odd); wraparound mod 2^64 is harmless (still a
    deterministic mix applied identically on build and probe)."""
    h1 = u % np.uint64(m)
    h2 = ((u >> np.uint64(33)) << np.uint64(1)) + np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m)).reshape(-1)


def _bloom_set(bits: np.ndarray, u: np.ndarray, m: int, k: int) -> None:
    pos = _bloom_positions(u, m, k)
    np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                     np.left_shift(np.uint8(1),
                                   (pos & np.uint64(7)).astype(np.uint8)))


def _bloom_might_contain(bits: np.ndarray, u: np.ndarray, m: int,
                         k: int) -> np.ndarray:
    """Per-key bool: True = possibly in the set (all k bits set),
    False = DEFINITELY absent."""
    if len(u) == 0:
        return np.zeros(0, bool)
    pos = _bloom_positions(u, m, k)
    probed = bits[(pos >> np.uint64(3)).astype(np.int64)] & np.left_shift(
        np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
    return (probed != 0).reshape(k, -1).all(axis=0)


def _md5_u64(hexes: list) -> np.ndarray:
    return np.array([int(h[:16], 16) for h in hexes], np.uint64)


def collapse_repeated_lines(ds, text_column: str = "text", *,
                            id_column: str = "doc_id"):
    """Intra-document `uniq`: drop every line that EQUALS the line
    directly above it (consecutive-duplicate collapse — the cheap
    in-place half of line dedup, vs the corpus-global
    :func:`dedup_lines_global` family).  Returns (id, cleaned,
    n_removed).

    Scale shape: pure streaming map, zero shuffle, zero Python
    per-line work — split/compare/rejoin are Arrow kernels over the
    flattened line buffer (`split_pattern` → one shifted `not_equal`
    over the values array → list rebuild + `binary_join`)."""
    import numpy as np
    import pyarrow.compute as pc

    def collapse(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column(text_column).cast(pa.string()), "")
        lists = pc.split_pattern(col, "\n")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        vals = lists.flatten()
        n = len(vals)
        offs = np.concatenate([np.zeros(1, np.int64),
                               np.cumsum(lens.astype(np.int64))])
        keep = np.ones(n, bool)
        if n > 1:
            same = pc.equal(vals.slice(1), vals.slice(0, n - 1)).to_numpy(
                zero_copy_only=False)
            keep[1:] = ~same
        keep[offs[:-1][lens > 0]] = True  # first line of each doc stays
        line_of = np.repeat(np.arange(len(lens), dtype=np.int64),
                            lens.astype(np.int64))
        new_lens = (np.bincount(line_of[keep], minlength=len(lens))
                    if n else np.zeros(len(lens), np.int64))
        kept_vals = vals.filter(pa.array(keep))
        new_offs = np.concatenate([np.zeros(1, np.int64),
                                   np.cumsum(new_lens)])
        out_lists = pa.LargeListArray.from_arrays(
            pa.array(new_offs, pa.int64()), kept_vals)
        cleaned = pc.binary_join(out_lists.cast(pa.list_(pa.string())),
                                 "\n")
        removed = (lens.astype(np.int64) - new_lens)
        return pa.table({id_column: batch.column(id_column),
                         "cleaned": cleaned,
                         "n_removed": pa.array(removed, pa.int64())})

    return ds.map_batches(collapse, batch_format="pyarrow")


def dedup_canonical(ds, key_column: str = "doc_id",
                    text_column: str = "text", **dedup_kwargs):
    """Exact dedup on the CANONICAL text form
    (``normalize.canonicalize_for_dedup``: lowercase, digit runs → 0,
    whitespace folded) — catches the near-dups plain
    :func:`dedup_exact` misses when copies differ only in case,
    numbering or reflow, at exactly the same cost: one streaming
    canonicalize map in front of the same (md5, min-key) machinery."""
    def canon(batch: pa.Table) -> pa.Table:
        from ..functions.normalize import canonicalize_for_dedup

        return batch.append_column(
            "__canon", canonicalize_for_dedup(batch.column(text_column)))

    out = dedup_exact(ds.map_batches(canon, batch_format="pyarrow"),
                      key_column, "__canon", **dedup_kwargs)
    return out.drop_columns(["__canon"])

def dup_rate_by_group(ds, group_column: str, text_column: str, *,
                      digits: int = 6):
    """Per-group duplication-mass report: ``(group, n_docs, n_dups,
    dup_rate)`` where a row counts as a dup when its exact content
    hash occurs ≥ 2 times ANYWHERE in the corpus — the crawl-quality
    table that ranks hosts/sources by how much of their output is
    copies (mirror detection, boilerplate farms, scraped-content
    sites).

    Scale shape: one streaming hash pass emits (content-fp, group)
    rows; the fp-keyed count ``groupby`` prunes to fps with count ≥ 2
    — the HOT set, bounded by duplication mass like
    ``dedup_paragraph_global``'s — which broadcasts once for a
    vectorized ``pc.is_in`` second pass; the rollup exchange is
    groups-sized.  Counts exact; the rate is the half-away snap of one
    division of identical ints."""
    import numpy as np
    import pyarrow.compute as pc

    import ray as _ray
    import ray.data as rd

    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64

    mask = (1 << 63) - 1

    def fp_rows(b: pa.Table) -> pa.Table:
        texts = b.column(text_column).to_pylist()
        fps = pa.array([stable_hash64(t or "") & mask for t in texts],
                       pa.int64())
        return pa.table({"fp": fps, group_column: b.column(group_column)})

    tagged = ds.map_batches(fp_rows, batch_format="pyarrow").materialize()

    def fp_partial(b: pa.Table) -> pa.Table:
        g = b.select(["fp"]).group_by(["fp"]).aggregate([("fp", "count")])
        return g.rename_columns(["fp", "pn"])

    hot_rows = (tagged.map_batches(fp_partial, batch_format="pyarrow")
                      .groupby("fp").aggregate(Sum("pn", alias_name="n"))
                      .map_batches(
                          lambda b: b.filter(
                              pc.greater_equal(b.column("n"), 2))
                                    .select(["fp"]),
                          batch_format="pyarrow"))
    hot = np.sort(np.concatenate(
        [b.column("fp").to_numpy(zero_copy_only=False)
         for b in hot_rows.iter_batches(batch_size=None,
                                        batch_format="pyarrow")]
        or [np.empty(0, np.int64)]))
    ref = _ray.put(pa.array(hot, pa.int64()))

    def rollup(b: pa.Table) -> pa.Table:
        hs = _ray.get(ref)
        is_dup = pc.is_in(b.column("fp"), value_set=hs)
        t = pa.table({
            group_column: b.column(group_column),
            "pn": pa.array(np.ones(b.num_rows, np.int64)),
            "pd": pc.cast(is_dup, pa.int64())})
        g = t.group_by([group_column]).aggregate(
            [("pn", "sum"), ("pd", "sum")])
        return g.rename_columns([group_column, "pn", "pd"])

    merged = (tagged.map_batches(rollup, batch_format="pyarrow")
                    .groupby(group_column)
                    .aggregate(Sum("pn", alias_name="n_docs"),
                               Sum("pd", alias_name="n_dups")))

    scale = 10 ** digits

    def finish(b: pa.Table) -> pa.Table:
        nd = b.column("n_docs").to_numpy(zero_copy_only=False)
        du = b.column("n_dups").to_numpy(zero_copy_only=False)
        rate = np.floor(du.astype(np.float64) * scale / nd + 0.5) / scale
        return pa.table({group_column: b.column(group_column),
                         "n_docs": pa.array(nd, pa.int64()),
                         "n_dups": pa.array(du, pa.int64()),
                         "dup_rate": pa.array(rate, pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def minhash_sign(ds, key_column: str, text_column: str, *,
                 num_perm: int = 128, k_shingle: int = 3,
                 seed: int = 42, keep_shingles: bool = True):
    """Public signature pass: (key, ``minhash_sig``[, ``shingles``],
    ``__fh``/``__fl``) rows — the unit the persisted signature index
    stores and ``minhash_candidate_pairs(signed_ds=…)`` consumes."""
    stage = MinHashSignatures(key_column, text_column, num_perm,
                              k_shingle, keep_shingles=keep_shingles,
                              seed=seed)
    return ds.map_batches(stage, batch_format="pyarrow")


# underscore prefix: parquet dataset discovery ignores it
_MINHASH_META = "_minhash_index.json"


def write_minhash_index(ds, index_dir: str, key_column: str,
                        text_column: str, *, num_perm: int = 128,
                        k_shingle: int = 3, seed: int = 42,
                        keep_shingles: bool = True,
                        num_buckets: int = 64):
    """Persist the corpus's MinHash signatures (and, by default, its
    shingle-fp sets, so ``verify="exact"`` stays available) as a
    hive-bucketed Parquet index + a config manifest — the archive side
    of the incremental-crawl near-dup loop: sign the archive ONCE,
    then every delta crawl signs only itself
    (:func:`dedup_near_against_index`), instead of re-shingling the
    full archive per run (`dedup_near_against` re-reads both sides).

    Layout: ``index_dir/bucket=<hash(fp)%num_buckets>/*.parquet`` +
    ``minhash_index.json`` (num_perm / k_shingle / seed / shingles —
    appends and reads validate against it; the manifest lands
    tmp-then-rename AFTER the data, the resumable-writer ordering).
    ``__fh``/``__fl`` are derived from keys, so they are NOT stored —
    :func:`read_minhash_index` re-attaches them."""
    import json
    import os

    meta = {"num_perm": num_perm, "k_shingle": k_shingle, "seed": seed,
            "keep_shingles": keep_shingles, "num_buckets": num_buckets,
            "key_column": key_column}
    signed = minhash_sign(ds, key_column, text_column,
                          num_perm=num_perm, k_shingle=k_shingle,
                          seed=seed, keep_shingles=keep_shingles)

    def bucketize(b: pa.Table) -> pa.Table:
        bucket = (_u64_col(b, "__fh") % np.uint64(num_buckets)).astype(
            np.int64)
        return (b.drop_columns(["__fh", "__fl"])
                .append_column("bucket", pa.array(bucket)))

    (signed.map_batches(bucketize, batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["bucket"]))
    tmp = os.path.join(index_dir, _MINHASH_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, _MINHASH_META))
    return meta


def read_minhash_index(index_dir: str):
    """→ (signature Dataset with ``__fh``/``__fl`` re-attached, meta
    dict).  Validates the manifest exists (a dir without one is an
    unfinished write)."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(index_dir, _MINHASH_META)) as f:
        meta = json.load(f)
    key_column = meta["key_column"]
    ds = rd.read_parquet(index_dir)

    def attach(b: pa.Table) -> pa.Table:
        cols = [c for c in b.column_names if c != "bucket"]
        b = b.select(cols)
        fh, fl = _fingerprint128(b.column(key_column))
        return (b.append_column("__fh", pa.array(fh, pa.uint64()))
                .append_column("__fl", pa.array(fl, pa.uint64())))

    return ds.map_batches(attach, batch_format="pyarrow"), meta


def append_minhash_index(ds, index_dir: str, text_column: str):
    """LSM-style delta append: sign ONLY ``ds`` under the manifest's
    config and add its rows as new files in the same bucket layout —
    existing files never rewritten, cost O(delta).  Exactly-once is
    the caller's job (the merge_term_index contract); delta keys must
    be new."""
    import json
    import os

    with open(os.path.join(index_dir, _MINHASH_META)) as f:
        meta = json.load(f)
    signed = minhash_sign(ds, meta["key_column"], text_column,
                          num_perm=meta["num_perm"],
                          k_shingle=meta["k_shingle"],
                          seed=meta["seed"],
                          keep_shingles=meta["keep_shingles"])
    num_buckets = meta["num_buckets"]

    def bucketize(b: pa.Table) -> pa.Table:
        bucket = (_u64_col(b, "__fh") % np.uint64(num_buckets)).astype(
            np.int64)
        return (b.drop_columns(["__fh", "__fl"])
                .append_column("bucket", pa.array(bucket)))

    (signed.map_batches(bucketize, batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["bucket"]))
    return meta


def dedup_near_against_index(new_ds, index_dir: str, key_column: str,
                             text_column: str, *,
                             threshold: float = 0.9,
                             num_bands: int = 32,
                             verify: str = "exact",
                             num_partitions: int | None = None):
    """:func:`dedup_near_against` with the archive side read from a
    persisted signature index: the delta crawl signs ONLY itself; the
    archive's shingling cost was paid once at
    :func:`write_minhash_index` time and amortizes over every
    subsequent crawl.  Output is byte-identical to re-running
    ``dedup_near_against`` on the archive texts (pytest-pinned).

    Scale shape: identical to ``dedup_near_against`` past the signing
    seam — star-mode fp-space banding over the UNION of delta
    signatures and index rows, min-label components, three
    duplication-mass-bounded joins."""
    signed_idx, meta = read_minhash_index(index_dir)
    if meta["key_column"] != key_column:
        raise ValueError(
            f"index keyed by {meta['key_column']!r}, got {key_column!r}")
    keep_shingles = meta["keep_shingles"] or verify != "exact"
    if not keep_shingles:
        raise ValueError(
            'verify="exact" needs an index written with '
            "keep_shingles=True")
    new_signed = minhash_sign(new_ds, key_column, text_column,
                              num_perm=meta["num_perm"],
                              k_shingle=meta["k_shingle"],
                              seed=meta["seed"],
                              keep_shingles=(verify == "exact"))
    if verify != "exact" and meta["keep_shingles"]:
        # estimate mode never reads shingles — drop them so the union
        # schemas line up (and the banding exchange stays thin)
        cols = [key_column, "minhash_sig", "__fh", "__fl"]
        signed_idx = signed_idx.map_batches(
            lambda b: b.select(cols), batch_format="pyarrow")
    pairs = minhash_candidate_pairs(
        None, key_column, text_column, threshold=threshold,
        verify=verify, num_perm=meta["num_perm"], num_bands=num_bands,
        pair_mode="star", num_partitions=num_partitions,
        signed_ds=new_signed.union(signed_idx),
    )
    seen_keys = signed_idx.map_batches(
        lambda b: b.select([key_column]), batch_format="pyarrow")
    return _drop_component_contaminated(new_ds, pairs, seen_keys,
                                        key_column, num_partitions)


# -------------------------------- exact set-similarity join (AllPairs) ----


class _ShingleSetStage:
    """Per-batch distinct k-shingle fp sets + 128-bit key fingerprints —
    the signature pass of :func:`jaccard_pairs_exact` (MinHashSignatures
    minus the minhash matrix it does not need)."""

    def __init__(self, key_column: str, text_column: str, k_shingle: int):
        self.key_column = key_column
        self.text_column = text_column
        self.k = k_shingle

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(self.text_column).to_pylist()]
        sh = [shingle_hashes(t, self.k) for t in texts]
        fh, fl = _fingerprint128(batch.column(self.key_column))
        keys = batch.column(self.key_column)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return pa.Table.from_arrays(
            [keys,
             pa.array([s.tolist() for s in sh], pa.list_(pa.uint64())),
             pa.array(fh, pa.uint64()), pa.array(fl, pa.uint64())],
            names=[self.key_column, "shingles", "__fh", "__fl"])


def jaccard_pairs_exact(ds, key_column: str = "doc_id",
                        text_column: str = "text", *,
                        threshold: float = 0.8, k_shingle: int = 3,
                        order: str = "auto", verify_exec: str = "auto",
                        broadcast_budget_bytes: int = 2 << 30,
                        num_partitions: int | None = None):
    """Exact all-pairs Jaccard self-join via prefix filtering (the
    AllPairs / PPJoin family, Bayardo-Ma-Srikant 2007) → Dataset of
    (a, b, sim), a < b by key — the deterministic-COMPLETE complement of
    :func:`minhash_candidate_pairs`: every pair with shingle-set Jaccard
    ≥ ``threshold`` is emitted, with no LSH recall argument needed
    (reference parity: llm_food has no similarity join at all; this pairs
    with the brute-force SQL oracle exactly, not probabilistically).

    Plan — fingerprint space end to end, reusing the minhash machinery:

    1. shingle pass → (key, distinct shingle fps, __fh/__fl), materialized
       (read twice: prefix emission + verification).
    2. a GLOBAL total order over tokens.  ``order="df"`` computes global
       document frequencies (per-batch distinct partials → ONE tok-keyed
       aggregate) and orders each doc's tokens rarest-first — the classic
       choice that keeps prefix buckets tiny; it broadcasts the (tok, df)
       table via ``ray.put`` under ``broadcast_budget_bytes``, else falls
       back to ``order="hash"``: the token fp itself is the order — no df
       pass, nothing broadcast, fully streaming (the 100-TB path; prefix
       buckets are then ~token-df sized, still correct).
    3. per doc emit only the first ``n - floor(t*n) + 1`` tokens of that
       order (one LONGER than the canonical ``n - ceil(t*n) + 1``, so
       float rounding can only widen the candidate superset); token fp =
       band key → the SAME one-coarse-exchange in-bucket pair sweep the
       minhash plan uses (:func:`_coarse_pairs_fp`).
    4. exact shingle-set verification, auto-gated broadcast index vs
       distributed fp-space semijoin (:func:`_verify_pairs_semijoin`).

    Completeness: under any shared total order, two sets with J ≥ t must
    intersect within both prefixes (prefix-filter theorem), so step 3's
    candidates ⊇ the answer and step 4's exact filter makes the output
    EQUAL the brute-force join.  Skew: ``order="df"`` puts only RARE
    tokens in prefixes; under ``order="hash"`` a frequent low-fp token
    fans out ~df candidates for its bucket — the price of the
    single-pass plan, pruned before the wire by the coarse per-group
    distinct."""
    import ray as _ray
    import ray.data as rd

    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    sig_ds = ds.map_batches(
        _ShingleSetStage(key_column, text_column, k_shingle),
        batch_format="pyarrow").materialize()
    n_docs = sig_ds.count()
    if n_docs == 0:
        return rd.from_arrow(_empty_pairs_table(pa.int64()))
    key_type = sig_ds.schema().base_schema.field(key_column).type

    if order not in ("auto", "df", "hash"):
        raise ValueError(f"unknown order {order!r}")
    df_ref = None
    if order in ("auto", "df"):
        from ray.data.aggregate import Sum

        def tok_rows(b: pa.Table) -> pa.Table:
            col = b.column("shingles")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = np.asarray(col.flatten(), dtype=np.uint64)
            tok, cnt = np.unique(flat, return_counts=True)
            # per-doc sets are distinct, so in-batch counts ARE df partials
            return pa.table({"tok": pa.array(tok.view(np.int64)),
                             "n": pa.array(cnt.astype(np.int64))})

        df_ds = (sig_ds.map_batches(tok_rows, batch_format="pyarrow")
                 .groupby("tok").aggregate(Sum("n", alias_name="df"))
                 .materialize())
        n_tok = df_ds.count()
        if n_tok * 16 <= broadcast_budget_bytes:
            toks, dfs = [], []
            for b in df_ds.iter_batches(batch_size=None,
                                        batch_format="pyarrow"):
                toks.append(_u64_col(b, "tok"))
                dfs.append(np.asarray(b.column("df"), dtype=np.int64))
            tok_arr = np.concatenate(toks)
            df_arr = np.concatenate(dfs)
            o = np.argsort(tok_arr)
            df_ref = _ray.put((tok_arr[o], df_arr[o]))
            order = "df"
        elif order == "df":
            raise ValueError(
                f"order='df' needs the {n_tok}-token df table under the "
                f"{broadcast_budget_bytes}-byte broadcast budget; use "
                "order='hash' (single-pass, nothing broadcast)")
        else:
            order = "hash"
    del ds

    def prefix_rows(b: pa.Table) -> pa.Table:
        col = b.column("shingles")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(col.flatten(), dtype=np.uint64)
        off = col.offsets.to_numpy().astype(np.int64)
        off = off - off[0]
        lens = off[1:] - off[:-1]
        if len(flat) == 0:
            return pa.table({"band_key": pa.array([], pa.uint64()),
                             "__fh": pa.array([], pa.uint64()),
                             "__fl": pa.array([], pa.uint64())})
        p = lens - np.floor(t * lens).astype(np.int64) + 1
        np.minimum(p, lens, out=p)          # empty docs -> 0 rows
        doc = np.repeat(np.arange(len(lens)), lens)
        if df_ref is not None:
            tok_sorted, df_sorted = _ray.get(df_ref)
            dfo = df_sorted[np.searchsorted(tok_sorted, flat)]
            ordr = np.lexsort((flat, dfo, doc))
            flat = flat[ordr]               # doc runs stay contiguous
        # hash order: shingle_hashes output is already sorted per doc
        rank = np.arange(len(flat)) - np.repeat(off[:-1], lens)
        keep = rank < np.repeat(p, lens)
        sel_doc = doc[keep]
        return pa.table({
            "band_key": pa.array(flat[keep]),
            "__fh": pa.array(_u64_col(b, "__fh")[sel_doc]),
            "__fl": pa.array(_u64_col(b, "__fl")[sel_doc]),
        })

    banded = sig_ds.map_batches(prefix_rows, batch_format="pyarrow")
    pairs_fp = _coarse_pairs_fp(
        banded, "all", num_coarse=num_partitions or 256).materialize()
    if pairs_fp.count() == 0:
        return rd.from_arrow(_empty_pairs_table(key_type))

    if verify_exec == "auto":
        verify_exec = ("broadcast"
                       if n_docs * 4096 <= broadcast_budget_bytes
                       else "semijoin")
    if verify_exec == "broadcast":
        index = _build_sig_index(sig_ds, key_column, "exact", 0, t)
        return _verify_pairs_broadcast(pairs_fp, _ray.put(index),
                                       key_type, t)
    return _verify_pairs_semijoin(
        pairs_fp, sig_ds, key_column, key_type, num_perm=128,
        threshold=t, verify="exact", num_partitions=num_partitions)


def canonical_dedup(ds, url_column: str = "url",
                    canonical_column: str = "canonical", *,
                    num_partitions: int | None = None):
    """Site-declared duplicate-group dedup over ``rel=canonical``
    targets (the cheapest near-dup signal on the web: the site itself
    names the duplicate groups; pair with
    :func:`..functions.html_md.extract_link_rels`).  Group key =
    ``coalesce(canonical, url)``; each group keeps its SELF-canonical
    member (``url == key``); groups whose declared canonical is absent
    from the corpus (dangling — offsite targets, 404'd masters) keep
    their min-url member instead, so no content group vanishes.

    Scale shape: self rows pass in a pure streaming filter (the
    overwhelmingly common case — most pages are their own canonical —
    moves NOTHING); only non-self rows (duplication mass) enter the
    one (key → min(url)) exchange; the dangling decision is a
    group-count-sized anti-join against self keys; dangling
    representatives rejoin full rows through one LEFT SEMI.  All joins
    via the empty-block-safe wrapper."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    from .joins import safe_join

    def keyed(b: pa.Table) -> pa.Table:
        can = b.column(canonical_column)
        if pa.types.is_null(can.type):
            # an all-null block infers type null, which coalesce and
            # Acero joins both reject — retype it to match the urls
            can = can.cast(b.column(url_column).type)
            b = b.set_column(b.column_names.index(canonical_column),
                             canonical_column, can)
        key = pc.coalesce(can, b.column(url_column))
        return b.append_column("__k", key)

    kds = ds.map_batches(keyed, batch_format="pyarrow").materialize()

    def part(want_self: bool):
        def f(b: pa.Table) -> pa.Table:
            eq = pc.equal(b.column("__k"), b.column(url_column))
            return b.filter(eq if want_self else pc.invert(eq))
        return f

    selfs = kds.map_batches(part(True), batch_format="pyarrow")
    nonself = kds.map_batches(part(False), batch_format="pyarrow")

    def strip(b: pa.Table) -> pa.Table:
        return b.drop_columns(["__k"])

    reps = (nonself.groupby("__k")
            .aggregate(Min(url_column, alias_name="__minu")))
    dang = safe_join(reps,
                     selfs.map_batches(lambda b: b.select(["__k"]),
                                       batch_format="pyarrow"),
                     "left_anti", num_partitions, on=("__k",))
    kept_selfs = selfs.map_batches(strip, batch_format="pyarrow")
    if dang is None:
        return kept_selfs
    dang_rows = safe_join(
        kds,
        dang.map_batches(lambda b: b.select(["__minu"]),
                         batch_format="pyarrow"),
        "left_semi", num_partitions,
        on=(url_column,), right_on=("__minu",))
    if dang_rows is None:
        return kept_selfs
    return kept_selfs.union(
        dang_rows.map_batches(strip, batch_format="pyarrow"))
