"""Persisted inverted index: bucket-partitioned postings on Parquet.

The retrieval-side counterpart of the IVF layout in
``stages/similarity.py``: build once as hive-partitioned Parquet keyed
by ``bucket = hash(term) % num_buckets``, then serve term lookups by
reading ONLY the bucket directories the queried terms hash into —
I/O-level pruning, the property that matters when the index itself is
TB-sized.  Posting rows are ``(term, doc_id, tf)`` — vocabulary×docs
bounded, which is what an inverted index is.

Build is shuffle-free: each batch computes its per-doc term frequencies
with one Arrow ``group_by`` (C-speed, no Python token loops) and the
partitioned write routes rows into bucket directories per block — no
global exchange, because postings for one term may span files within its
bucket directory and the reader re-aggregates nothing (tf is exact per
(doc, term) within a batch, and a document lives in exactly one batch).

No reference analogue (llm-food has no retrieval); brief-scope
training-data operator complementing ``stages/search.py``'s BM25.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import stable_hash64


def _postings_map(id_column: str, text_column: str, num_buckets: int):
    """Per-batch (term, id, tf, bucket) combiner shared by the base
    build and the incremental merge: one Arrow ``group_by`` per batch,
    bucket via the cached-hash loop over the batch's DISTINCT terms."""
    import numpy as np
    import pyarrow.compute as pc

    def postings(batch: pa.Table) -> pa.Table:
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.utf8_split_whitespace(pc.fill_null(col, ""))
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists)
        ids = batch.column(id_column)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        rep = ids.take(pa.array(
            np.repeat(np.arange(len(lens), dtype=np.int64), lens)))
        t = pa.table({"term": flat, id_column: rep})
        t = t.filter(pc.not_equal(t.column("term"), ""))
        g = (t.group_by(["term", id_column])
             .aggregate([(id_column, "count")])
             .rename_columns(["term", id_column, "tf"]))
        enc = g.column("term").combine_chunks().dictionary_encode()
        bd = np.fromiter((stable_hash64(w) % num_buckets
                          for w in enc.dictionary.to_pylist()),
                         np.int64, len(enc.dictionary))
        bucket = bd[enc.indices.to_numpy(zero_copy_only=False)]
        return g.append_column("bucket", pa.array(bucket, pa.int64()))

    return postings


def build_term_index(ds, out_dir: str, *, id_column: str = "doc_id",
                     text_column: str = "text", num_buckets: int = 64):
    """Write the inverted index for ``ds`` under
    ``out_dir/bucket=<b>/``; returns the posting-row count.

    Scale shape: one streaming pass; per-batch Arrow group_by emits
    (term, id, tf) rows; the hive write fans each block's rows into its
    bucket subdirectories.  ``num_buckets`` bounds lookup I/O (a term
    lookup reads 1/num_buckets of the index) — size it so one bucket
    directory stays well under a node's read bandwidth budget."""
    out = ds.map_batches(_postings_map(id_column, text_column, num_buckets),
                         batch_format="pyarrow")
    out.write_parquet(out_dir, partition_cols=["bucket"])
    return out


def build_positional_index(ds, out_dir: str, *, id_column: str = "doc_id",
                           text_column: str = "text",
                           num_buckets: int = 64):
    """Positional variant: one EXPLODED posting row per token occurrence
    — ``(term, id, pos)`` with 0-based token position — hive-partitioned
    by hash(term)%buckets like :func:`build_term_index`.  Rows are
    token-occurrence bounded (the standard positional-index cost, ~1
    int per token); build stays a single shuffle-free streaming pass."""
    import numpy as np
    import pyarrow.compute as pc

    def postings(batch: pa.Table) -> pa.Table:
        col = batch.column(text_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.utf8_split_whitespace(pc.fill_null(col, ""))
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists)
        ids = batch.column(id_column)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        rep = ids.take(pa.array(
            np.repeat(np.arange(len(lens), dtype=np.int64), lens)))
        total = int(lens.sum())
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        pos = np.arange(total, dtype=np.int64) - starts
        t = pa.table({"term": flat, id_column: rep,
                      "pos": pa.array(pos, pa.int64())})
        t = t.filter(pc.not_equal(t.column("term"), ""))
        # NOTE: positions number the RAW whitespace split including the
        # boundary empties Arrow emits for leading/multiple whitespace —
        # filtered rows leave gaps.  The synthetic corpora are single-
        # space separated so positions == token ordinals there; phrase
        # adjacency is evaluated in the same coordinate system on both
        # engines as long as the oracle splits identically.
        enc = t.column("term").combine_chunks().dictionary_encode()
        bd = np.fromiter((stable_hash64(w) % num_buckets
                          for w in enc.dictionary.to_pylist()),
                         np.int64, len(enc.dictionary))
        bucket = bd[enc.indices.to_numpy(zero_copy_only=False)]
        return t.append_column("bucket", pa.array(bucket, pa.int64()))

    out = ds.map_batches(postings, batch_format="pyarrow")
    out.write_parquet(out_dir, partition_cols=["bucket"])
    return out


def phrase_lookup(index_dir: str, phrase: list[str], *,
                  id_column: str = "doc_id", num_buckets: int = 64,
                  name: str = "n_occurrences"):
    """Documents containing the exact token phrase, with occurrence
    counts, from a :func:`build_positional_index` directory.

    Plan: term i's postings are read from ONLY its bucket directory and
    projected to ``(id, pos - i)`` — a phrase occurrence is a row
    present in EVERY term's shifted projection, so the verify is a
    chain of native hash joins on the two integer key columns (no list
    payloads near a join — Ray's acero rejects them), each join output
    bounded by the rarest term's postings.  A final count per id
    aggregates occurrences."""
    import pyarrow.compute as pc

    import ray.data as rd

    from .joins import _join_partitions, _nonempty_blocks, safe_join

    assert len(phrase) >= 1
    legs = []
    for i, term in enumerate(phrase):
        ds = term_lookup(index_dir, [term], id_column=id_column,
                         num_buckets=num_buckets, _positional=True)

        def shift(batch: pa.Table, off=i, first=(i == 0)) -> pa.Table:
            p0 = pc.subtract(batch.column("pos"), off)
            t = pa.table({id_column: batch.column(id_column), "p0": p0})
            return t
        legs.append(ds.map_batches(shift, batch_format="pyarrow"))

    acc = legs[0]
    for leg in legs[1:]:
        acc = safe_join(acc, leg, "inner", 8,
                        on=(id_column, "p0"), right_on=(id_column, "p0"))
        if acc is None:
            break
    from ray.data.aggregate import Count

    if acc is None:   # some term never co-occurs at the right offset
        id_type = legs[0].schema().base_schema.field(id_column).type
        return rd.from_arrow(pa.table({
            id_column: pa.array([], id_type),
            name: pa.array([], pa.int64())}))
    return (acc.groupby(id_column)
               .aggregate(Count(alias_name=name)))


def term_lookup(index_dir: str, terms, *, id_column: str = "doc_id",
                num_buckets: int = 64, _positional: bool = False):
    """Postings for ``terms`` from a :func:`build_term_index` directory,
    reading ONLY the bucket partitions the terms hash into.  Returns a
    Dataset of (term, id, tf)."""
    import pyarrow.compute as pc

    import ray.data as rd

    import os

    terms = sorted(set(terms))
    buckets = sorted({stable_hash64(t) % num_buckets for t in terms})
    # a bucket no indexed term hashed into has no directory (a term
    # absent from the corpus) — skip it; list concrete files because a
    # LIST of paths is treated as files by read_parquet
    paths = []
    for b in buckets:
        p = f"{index_dir}/bucket={b}"
        if os.path.isdir(p):
            paths.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                         if f.endswith(".parquet"))
    tset = pa.array(terms, pa.string())
    cols = ["term", id_column, "pos" if _positional else "tf"]
    if not paths:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "term": pa.array([], pa.string()),
            id_column: pa.array([], pa.int64()),
            cols[2]: pa.array([], pa.int64())}))

    def filt(batch: pa.Table) -> pa.Table:
        keep = batch.filter(
            pc.is_in(batch.column("term"), value_set=tset))
        return keep.select(cols)

    return rd.read_parquet(paths).map_batches(filt, batch_format="pyarrow")


def merge_term_index(delta_ds, index_dir: str, *,
                     id_column: str = "doc_id", text_column: str = "text",
                     num_buckets: int = 64):
    """Incremental index update, LSM-style: the delta corpus's postings
    are APPENDED into the existing ``index_dir`` hive layout as new
    files — existing files are never rewritten, buckets no delta term
    hashes into are never touched, and :func:`term_lookup` needs no
    change because a term's postings were always allowed to span files
    within its bucket.  ``num_buckets`` must match the base build (the
    same hash routes the same terms).

    Exactly-once is the caller's job, as with any Parquet append (the
    extract pipeline's manifest machinery is the repo's exemplar);
    re-running a completed merge would double the delta's postings.
    Assumes delta doc ids are new (a crawl delta) — re-ingesting an
    existing id leaves both generations' postings visible until the
    caller drops the old one.

    Scale shape: identical to the base build — one shuffle-free
    streaming pass over the delta only; cost is O(delta), not O(index).
    """
    out = delta_ds.map_batches(
        _postings_map(id_column, text_column, num_buckets),
        batch_format="pyarrow")
    out.write_parquet(index_dir, partition_cols=["bucket"])
    return out


def compact_index(index_dir: str, *, num_buckets: int = 64):
    """Offline per-bucket file compaction after a run of merges: each
    ``bucket=<b>/`` directory collapses to ONE file holding the
    concatenation of its postings (no tf math — postings are exact per
    file by construction), written tmp-then-rename.  Buckets are
    independent, so they compact as parallel Ray tasks.

    Like every Parquet compaction job, this is maintenance, not a
    transaction: a crash between the rename and the input deletes
    leaves the bucket double-counted until compact re-runs on fresh
    inputs — run it from the same scheduler slot that owns merges.
    Returns the number of buckets rewritten."""
    import os

    import ray as _ray

    @_ray.remote
    def compact_bucket(path: str) -> int:
        import os

        import pyarrow.parquet as pq

        files = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
        if len(files) <= 1:
            return 0
        t = pa.concat_tables([pq.read_table(os.path.join(path, f))
                              for f in files])
        tmp = os.path.join(path, "compacted.parquet.tmp")
        pq.write_table(t, tmp)
        final = os.path.join(path, "compacted.parquet")
        os.replace(tmp, final)
        for f in files:
            if f != "compacted.parquet":
                os.remove(os.path.join(path, f))
        return 1

    dirs = [os.path.join(index_dir, d) for d in sorted(os.listdir(index_dir))
            if d.startswith("bucket=")]
    return sum(_ray.get([compact_bucket.remote(d) for d in dirs]))
