"""Duplicate-window span detection + strip (ExactSubstr-style dedup).

Word-level analogue of the suffix-array substring dedup in Lee et al.,
"Deduplicating Training Data Makes Language Models Better" (ACL 2022):
a ``window``-word window is DUPLICATED when its exact text occurs at
least ``min_count`` times anywhere in the corpus (within-document
repeats count).  Every word covered by at least one duplicated window
lies in a duplicated span; spans are maximal merged runs (overlapping
OR adjacent windows merge).  ``duplicate_spans`` reports the spans per
document; ``duplicate_span_strip`` rebuilds each document's text with
all covered words removed.

Reference anchor: llm-food has no corpus-level operator (its only dedup
is the CLI input de-list at ``cli.py:206-218``); this family is
brief-scope ("Deduplication ... a core part of what makes this engine
useful at 100 TB").

Scale shape
-----------
Phase 1 (model): one streaming pass emits per-batch PARTIAL window
counts in 64-bit fingerprint space (``functions/hashing.py:window_fps``
— crc32/token + vectorized polynomial combine, no window string ever
leaves a worker), one ``groupby(fp).sum`` merges them, a filter keeps
fingerprints with count >= min_count.  The exchange ships 16 B/distinct
window, pre-shrunk by the per-batch combiner — the same fp-space
posture as the LM / TF-IDF corpus models (``stages/lm.py``).

Phase 2 (apply), auto-gated like ``dedup_exact``'s reduce= gate:

- ``exec="broadcast"`` (dup-fp set under ``broadcast_budget_rows``):
  the sorted fp array rides ``ray.put`` once; a second streaming pass
  recomputes each document's positional fps locally and marks windows
  via ``np.searchsorted`` — zero further exchange, spans merge
  vectorized per batch.
- ``exec="distributed"`` (the 100-TB path): the window pass emits
  (id, start, fp) rows, a partitioned LEFT SEMI join against the dup-fp
  table keeps duplicated occurrences, and span merge runs inside
  hash(id)-coarse buckets (``num_buckets`` Python group calls TOTAL,
  vectorized run-length island merge inside — never one group per key).

Both plans are row-equal (pytest-pinned).  Collision posture: 64-bit
window fps; see ``window_fps``'s docstring for the 128-bit dial.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import _FNV_PRIME, _mix64, stable_hash64
from .joins import _join_partitions, _nonempty_blocks, safe_join

_SPAN_FIELDS = ["span_no", "start_word", "end_word", "n_words"]

_HASHER = None


def _hasher():
    """Per-worker-process token-fingerprint cache (lm.py's _TokenHasher:
    Arrow split + dictionary-encode per batch, md5 once per DISTINCT
    token through the cache).  Module-level singleton: Ray task workers
    are single-threaded processes, so one shared cache per process is
    race-free and survives across batches."""
    global _HASHER
    if _HASHER is None:
        from .lm import _TokenHasher

        _HASHER = _TokenHasher()
    return _HASHER


def _batch_windows(batch: pa.Table, text_column: str, w: int):
    """Whole-batch positional window fingerprints, fully vectorized:
    ONE Arrow whitespace split + dictionary-encode for the batch, md5
    per distinct token, one polynomial combine over the flat token
    stream, then windows crossing document boundaries are masked out by
    offset arithmetic.  Equals ``functions.hashing.window_fps`` per doc
    (differential pytest).

    Returns (fps u64, row_index i64, local_start i64, per-doc token
    counts i64, flat dictionary indices i64, dictionary StringArray) —
    window rows are ordered by (row, start) by construction."""
    h = _hasher()
    idx, dictionary, lens, hu = h.flat_token_enc(batch, text_column)
    th = hu[idx] if len(idx) else np.empty(0, np.uint64)
    n = th.size
    empty = (np.empty(0, np.uint64), np.empty(0, np.int64),
             np.empty(0, np.int64))
    if n < w:
        return (*empty, lens, idx, dictionary)
    m = n - w + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(w):
        acc = acc * _FNV_PRIME + th[j:j + m]
    fps = _mix64(acc)
    doc_off = np.r_[0, np.cumsum(lens)]          # doc start offsets
    pos = np.arange(m, dtype=np.int64)
    row = np.searchsorted(doc_off, pos, side="right") - 1
    valid = pos + w <= doc_off[row + 1]          # window inside one doc
    row = row[valid]
    pos = pos[valid]
    return (fps[valid], row, pos - doc_off[row], lens, idx, dictionary)


def _id_field(ds, id_column: str) -> pa.Field:
    sch = ds.schema()   # ray.data.Schema — names/types, not a pa.Schema
    return pa.field(id_column, dict(zip(sch.names, sch.types))[id_column])


def _empty_spans_table(id_field: pa.Field) -> pa.Table:
    cols: dict[str, pa.Array] = {id_field.name: pa.array([], id_field.type)}
    for f in _SPAN_FIELDS:
        cols[f] = pa.array([], pa.int64())
    return pa.table(cols)


def _merge_islands(ids: np.ndarray, starts: np.ndarray, window: int):
    """Vectorized gaps-and-islands merge over (id, start) rows SORTED by
    (id, start).  Fixed window width makes per-doc window ends monotonic
    in start, so the previous row's end IS the running max — one
    comparison per row, no scan.  Returns (row_idx_of_span_head,
    span_start, span_end, span_no) with 0-based word positions."""
    n = len(starts)
    ends = starts + window - 1
    brk = np.empty(n, dtype=bool)
    brk[0] = True
    brk[1:] = (ids[1:] != ids[:-1]) | (starts[1:] > ends[:-1] + 1)
    gidx = np.flatnonzero(brk)
    span_start = starts[gidx]
    last = np.concatenate([gidx[1:] - 1, np.array([n - 1])])
    span_end = ends[last]
    span_ids = ids[gidx]
    g = len(gidx)
    docbrk = np.empty(g, dtype=bool)
    docbrk[0] = True
    docbrk[1:] = span_ids[1:] != span_ids[:-1]
    ordinal = np.arange(g, dtype=np.int64)
    doc_first = np.maximum.accumulate(np.where(docbrk, ordinal, 0))
    span_no = ordinal - doc_first + 1
    return gidx, span_start, span_end, span_no


def _dup_fp_model(ds, *, text_column: str, window: int, min_count: int):
    """Streaming corpus model: Dataset of one int64 ``fp`` column, the
    fingerprints of windows occurring >= min_count times."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        allfp = _batch_windows(batch, text_column, window)[0]
        if allfp.size == 0:
            return pa.table({"fp": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(allfp, return_counts=True)
        # int64 VIEW: Ray's groupby object-boxes uint64 (Ray 2.49)
        return pa.table({"fp": pa.array(u.view(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("fp").aggregate(Sum("cnt", alias_name="n")))

    def keep_dups(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.greater_equal(batch.column("n"), pa.scalar(min_count))
        return batch.filter(mask).select(["fp"])

    return merged.map_batches(keep_dups, batch_format="pyarrow")


def _gather_sorted_fps(model) -> np.ndarray:
    parts = [b.column("fp").to_numpy()
             for b in model.iter_batches(batch_format="pyarrow")
             if b.num_rows]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate(parts))


class _SpanEmitter:
    """Second streaming pass (broadcast plan): recompute window fps per
    document, mark membership against the SORTED broadcast dup array
    (searchsorted — no Python set), merge islands, emit span rows.
    The fp array rides the actor constructor via an ObjectRef so each
    actor resolves it once (restart-safe), not once per batch."""

    def __init__(self, fps_ref, id_column: str, text_column: str,
                 window: int, emit):
        if type(fps_ref).__name__ == "ObjectRef":
            import ray

            fps_ref = ray.get(fps_ref)
        self._fps = np.asarray(fps_ref)
        self._id = id_column
        self._text = text_column
        self._w = window
        self._emit = emit   # "spans" | "strip"

    def _hits(self, batch: pa.Table):
        """(hit row index, hit local start, lens, idx, dictionary) for
        the batch: all windows fingerprinted in one vectorized pass,
        membership via ONE searchsorted against the broadcast array."""
        fps, row, start, lens, idx, dictionary = _batch_windows(
            batch, self._text, self._w)
        f64 = fps.view(np.int64)
        if f64.size == 0 or self._fps.size == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z, lens, idx, dictionary
        pos = np.searchsorted(self._fps, f64)
        pos[pos == self._fps.size] = 0
        hit = self._fps[pos] == f64
        return row[hit], start[hit], lens, idx, dictionary

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._emit == "spans":
            return self._spans(batch)
        return self._strip(batch)

    def _spans(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self._id)
        rows, starts, _, _, _ = self._hits(batch)
        if rows.size == 0:
            return _empty_spans_table(pa.field(self._id, ids.type))
        gidx, s, e, no = _merge_islands(rows, starts, self._w)
        return pa.table({
            self._id: ids.take(pa.array(rows[gidx])),
            "span_no": pa.array(no),
            "start_word": pa.array(s + 1),
            "end_word": pa.array(e + 1),
            "n_words": pa.array(e - s + 1),
        })

    def _strip(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self._id)
        rows, starts, lens, idx, dictionary = self._hits(batch)
        clean, removed = _rebuild_clean(lens, idx, dictionary, rows,
                                        starts, starts + self._w)
        return pa.table({
            self._id: ids,
            "text": clean,
            "n_removed": pa.array(removed),
        })


def _rebuild_clean(lens: np.ndarray, idx: np.ndarray, dictionary,
                   rowids: np.ndarray, starts0: np.ndarray,
                   ends0: np.ndarray):
    """Arrow-side text rebuild shared by both strip plans: covered-word
    mask from interval diffs over the FLAT token stream, one filter for
    the surviving tokens, ListArray re-slice + ``pc.binary_join`` —
    no per-document Python.  Intervals are 0-based [start, end) in each
    row's local word positions; overlaps are fine (diff-cumsum).
    Returns (clean string Array, n_removed int64 per row)."""
    import pyarrow.compute as pc

    doc_off = np.r_[0, np.cumsum(lens)]
    n = int(doc_off[-1])
    diff = np.zeros(n + 1, dtype=np.int64)
    if rowids.size:
        np.add.at(diff, doc_off[rowids] + starts0, 1)
        np.add.at(diff, doc_off[rowids] + np.minimum(ends0, lens[rowids]),
                  -1)
    keep = np.cumsum(diff[:-1]) <= 0
    ckeep = np.r_[0, np.cumsum(keep)]
    new_off = ckeep[doc_off]
    kept_tokens = dictionary.take(pa.array(idx[keep]))
    lists = pa.ListArray.from_arrays(
        pa.array(new_off, pa.int32()), kept_tokens)
    clean = pc.binary_join(lists, " ")
    n_removed = lens - np.diff(new_off)
    return clean, n_removed


def _window_rows(ds, *, id_column: str, text_column: str, window: int):
    """(id, start, fp) occurrence rows — the distributed plan's join
    left side.  start is 0-based here; +1 happens at span emit."""

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column)
        fps, rows, starts, _, _, _ = _batch_windows(batch, text_column,
                                                    window)
        if fps.size == 0:
            return pa.table({
                id_column: pa.array([], ids.type),
                "start": pa.array([], pa.int64()),
                "fp": pa.array([], pa.int64()),
            })
        return pa.table({
            id_column: ids.take(pa.array(rows)),
            "start": pa.array(starts),
            "fp": pa.array(fps.view(np.int64)),
        })

    return ds.map_batches(emit, batch_format="pyarrow")


def _bucket_column(ids_col, num_buckets: int) -> pa.Array:
    """hash(id) % num_buckets, vectorized for integer ids (splitmix64),
    per-row stable_hash64 only for string keys."""
    if pa.types.is_integer(ids_col.type):
        x = ids_col.to_numpy(zero_copy_only=False).astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return pa.array((x % np.uint64(num_buckets)).astype(np.int32))
    return pa.array(
        [stable_hash64(str(v)) % num_buckets for v in ids_col.to_pylist()],
        pa.int32())


def _spans_distributed(ds, model, *, id_column: str, text_column: str,
                       window: int, num_buckets: int,
                       num_partitions: int | None):
    import ray.data as rd

    id_field = _id_field(ds, id_column)
    model_mat = _nonempty_blocks(model.materialize())
    if model_mat is None:
        return rd.from_arrow(_empty_spans_table(id_field))
    wins = _window_rows(ds, id_column=id_column, text_column=text_column,
                        window=window)
    hits = safe_join(wins, model_mat, "left_semi", num_partitions,
                     on=("fp",), right_on=("fp",))
    if hits is not None:
        hits = _nonempty_blocks(hits.materialize())
    if hits is None:
        return rd.from_arrow(_empty_spans_table(id_field))

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column("__pb",
                               _bucket_column(b.column(id_column),
                                              num_buckets))

    def bucket_spans(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_spans_table(id_field)
        import pyarrow.compute as pc

        order = pc.sort_indices(
            t, sort_keys=[(id_column, "ascending"), ("start", "ascending")])
        t = t.take(order)
        idc = t.column(id_column)
        if isinstance(idc, pa.ChunkedArray):
            idc = idc.combine_chunks()
        starts = t.column("start").to_numpy(zero_copy_only=False)
        if pa.types.is_integer(id_field.type):
            ids_np = idc.to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            # group by dictionary code, stable because already sorted
            enc = idc.dictionary_encode()
            ids_np = enc.indices.to_numpy(zero_copy_only=False).astype(
                np.int64)
        gidx, s, e, no = _merge_islands(ids_np, starts.astype(np.int64),
                                        window)
        return pa.table({
            id_column: idc.take(pa.array(gidx)),
            "span_no": pa.array(no),
            "start_word": pa.array(s + 1),
            "end_word": pa.array(e + 1),
            "n_words": pa.array(e - s + 1),
        })

    return (hits.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("__pb")
                .map_groups(bucket_spans, batch_format="pyarrow"))


def duplicate_spans(ds, *, id_column: str = "doc_id",
                    text_column: str = "text", window: int = 8,
                    min_count: int = 2, exec: str = "auto",
                    broadcast_budget_rows: int = 2_000_000,
                    num_buckets: int = 64,
                    num_partitions: int | None = None):
    """Spans of words covered by corpus-duplicated windows, per doc:
    (id, span_no, start_word, end_word, n_words), word positions
    1-based inclusive.  See module docstring for the two plans."""
    model = _dup_fp_model(ds, text_column=text_column, window=window,
                          min_count=min_count).materialize()
    return _apply_spans(ds, model, id_column=id_column,
                        text_column=text_column, window=window, exec=exec,
                        broadcast_budget_rows=broadcast_budget_rows,
                        num_buckets=num_buckets,
                        num_partitions=num_partitions)


def duplicate_spans_against(new_ds, seen_ds, *,
                            id_column: str = "doc_id",
                            text_column: str = "text", window: int = 8,
                            exec: str = "auto",
                            broadcast_budget_rows: int = 2_000_000,
                            num_buckets: int = 64,
                            num_partitions: int | None = None):
    """Incremental ExactSubstr: spans in NEW documents covered by any
    window that occurs ANYWHERE in the archived corpus (min_count=1 on
    the archive side — one prior occurrence makes a window 'seen').
    The crawl-refresh shape: the archive model is built once and only
    the new snapshot is scanned for the apply; same auto-gated plans as
    :func:`duplicate_spans`."""
    model = _dup_fp_model(seen_ds, text_column=text_column, window=window,
                          min_count=1).materialize()
    return _apply_spans(new_ds, model, id_column=id_column,
                        text_column=text_column, window=window, exec=exec,
                        broadcast_budget_rows=broadcast_budget_rows,
                        num_buckets=num_buckets,
                        num_partitions=num_partitions)


def _apply_spans(ds, model, *, id_column: str, text_column: str,
                 window: int, exec: str, broadcast_budget_rows: int,
                 num_buckets: int, num_partitions: int | None):
    import ray

    if exec not in ("auto", "broadcast", "distributed"):
        raise ValueError(f"exec={exec!r}")
    if exec == "auto":
        exec = ("broadcast" if model.count() <= broadcast_budget_rows
                else "distributed")
    if exec == "distributed":
        return _spans_distributed(
            ds, model, id_column=id_column, text_column=text_column,
            window=window, num_buckets=num_buckets,
            num_partitions=num_partitions)
    fps_ref = ray.put(_gather_sorted_fps(model))
    return ds.map_batches(
        _SpanEmitter, batch_format="pyarrow",
        fn_constructor_args=(fps_ref, id_column, text_column, window,
                             "spans"),
        concurrency=_emitter_pool())


def duplicate_span_strip(ds, *, id_column: str = "doc_id",
                         text_column: str = "text", window: int = 8,
                         min_count: int = 2, exec: str = "auto",
                         broadcast_budget_rows: int = 2_000_000,
                         num_buckets: int = 64,
                         num_partitions: int | None = None):
    """Rebuild each document's text with every duplicated-span word
    removed: (id, text, n_removed).  Whitespace is normalized to single
    spaces by the rebuild (' '.join of surviving words) — the SQL
    oracle's ordered string_agg does the same.

    Distributed plan: merged spans (disjoint by construction) are packed
    per doc into one binary column inside the coarse buckets, then a
    partitioned LEFT OUTER join brings them onto the documents — the one
    pass where payload text rides an exchange, inherent to any rebuild
    whose dup set exceeds driver memory."""
    import ray

    if exec not in ("auto", "broadcast", "distributed"):
        raise ValueError(f"exec={exec!r}")
    model = _dup_fp_model(ds, text_column=text_column, window=window,
                          min_count=min_count).materialize()
    if exec == "auto":
        exec = ("broadcast" if model.count() <= broadcast_budget_rows
                else "distributed")
    if exec == "broadcast":
        fps_ref = ray.put(_gather_sorted_fps(model))
        return ds.map_batches(
            _SpanEmitter, batch_format="pyarrow",
            fn_constructor_args=(fps_ref, id_column, text_column, window,
                                 "strip"),
            concurrency=_emitter_pool())

    spans = _spans_distributed(ds, model, id_column=id_column,
                               text_column=text_column, window=window,
                               num_buckets=num_buckets,
                               num_partitions=num_partitions)

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column("__pb",
                               _bucket_column(b.column(id_column),
                                              num_buckets))

    id_field = _id_field(ds, id_column)

    def pack_per_doc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_column: pa.array([], id_field.type),
                             "__spans": pa.array([], pa.binary())})
        import pyarrow.compute as pc

        order = pc.sort_indices(
            t, sort_keys=[(id_column, "ascending"),
                          ("start_word", "ascending")])
        t = t.take(order)
        idc = t.column(id_column)
        if isinstance(idc, pa.ChunkedArray):
            idc = idc.combine_chunks()
        s = t.column("start_word").to_numpy(zero_copy_only=False)
        e = t.column("end_word").to_numpy(zero_copy_only=False)
        flat = np.empty(2 * len(s), dtype=np.int64)
        flat[0::2] = s
        flat[1::2] = e
        # run-length per id over the sorted rows
        if pa.types.is_integer(id_field.type):
            ids_np = idc.to_numpy(zero_copy_only=False)
            newdoc = np.concatenate([[True], ids_np[1:] != ids_np[:-1]])
        else:
            enc = idc.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            newdoc = np.concatenate([[True], codes[1:] != codes[:-1]])
        heads = np.flatnonzero(newdoc)
        counts = np.diff(np.concatenate([heads, [len(s)]]))
        total = int(counts.sum()) * 16
        if total > 2**31 - 1:   # Arrow binary offsets are int32
            raise ValueError(
                "span pack exceeds 2 GiB in one bucket; raise num_buckets")
        byte_off = np.concatenate(
            [[0], np.cumsum(counts * 16)]).astype(np.int32)
        packed = pa.Array.from_buffers(
            pa.binary(), len(heads),
            [None, pa.py_buffer(byte_off.tobytes()),
             pa.py_buffer(flat.tobytes())])
        return pa.table({id_column: idc.take(pa.array(heads)),
                         "__spans": packed})

    packed = (spans.map_batches(add_bucket, batch_format="pyarrow")
                   .groupby("__pb")
                   .map_groups(pack_per_doc, batch_format="pyarrow")
                   .materialize())
    packed = _nonempty_blocks(packed)

    def rebuild(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        sp = (batch.column("__spans").to_pylist()
              if "__spans" in batch.column_names else [None] * nrows)
        # unpack the per-doc span blobs (tiny Python loop over ROWS WITH
        # SPANS only); the token-level work below is all Arrow/numpy
        rid: list[np.ndarray] = []
        st: list[np.ndarray] = []
        en: list[np.ndarray] = []
        for row, blob in enumerate(sp):
            if blob:
                se = np.frombuffer(blob, dtype=np.int64)
                k = se.size // 2
                rid.append(np.full(k, row, dtype=np.int64))
                st.append(se[0::2] - 1)    # back to 0-based start
                en.append(se[1::2])        # inclusive 1-based == excl 0-based
        _, _, _, lens, idx, dictionary = _batch_windows(
            batch, text_column, 10**9)   # w > any doc: tokenize only
        if rid:
            rows = np.concatenate(rid)
            clean, removed = _rebuild_clean(lens, idx, dictionary, rows,
                                            np.concatenate(st),
                                            np.concatenate(en))
        else:
            clean, removed = _rebuild_clean(
                lens, idx, dictionary, np.empty(0, np.int64),
                np.empty(0, np.int64), np.empty(0, np.int64))
        return pa.table({
            id_column: batch.column(id_column),
            "text": clean,
            "n_removed": pa.array(removed),
        })

    if packed is None:
        return ds.map_batches(rebuild, batch_format="pyarrow")
    joined = safe_join(ds, packed, "left_outer", num_partitions,
                       on=(id_column,), right_on=(id_column,),
                       right_empty_fill={"__spans": pa.binary()})
    return joined.map_batches(rebuild, batch_format="pyarrow")


def _emitter_pool() -> tuple[int, int]:
    from .pools import scoring_pool

    return scoring_pool()


def window_coverage_against(new_ds, seen_ds, *, id_column: str = "doc_id",
                            text_column: str = "text", window: int = 8,
                            num_partitions: int | None = None):
    """Per-document reference-corpus window coverage: for every NEW
    document, how many of its ``window``-token positional windows occur
    ANYWHERE in the reference corpus → (id, n_windows, n_seen,
    coverage_frac round-6).  The graded cross-corpus twin of
    :func:`duplicate_spans_against` (spans) and
    ``textstats.contamination_scores`` (broadcast eval sets): here the
    reference is corpus-sized, so membership is resolved by a
    fingerprint-keyed JOIN instead of a broadcast set.

    Scale shape: both sides reuse :func:`_batch_windows`' vectorized
    window fingerprints; the reference collapses to DISTINCT fps
    (per-batch ``np.unique`` then one fp-keyed groupby — 8 B rows,
    never a window string); the new side ships one row per DISTINCT
    (doc, fp) carrying its positional multiplicity plus one kind-0
    totals row per doc, ONE fp-keyed hash join against the reference
    (bounded by distinct-window mass, not corpus rows), a doc-keyed sum
    of matched multiplicities, and a left join back onto the totals.
    Collision posture: same 64-bit window fps as the span family."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    def seen_partial(batch: pa.Table) -> pa.Table:
        fps, *_rest = _batch_windows(batch, text_column, window)
        h = np.unique(fps)
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    seen = (seen_ds.map_batches(seen_partial, batch_format="pyarrow")
                   .groupby("h").aggregate(Count(alias_name="__c")))

    id_field = _id_field(new_ds, id_column)

    def new_partial(batch: pa.Table) -> pa.Table:
        fps, row, _start, lens, _idx, _dict = _batch_windows(
            batch, text_column, window)
        ids = batch.column(id_column)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if fps.size:
            order = np.lexsort((fps, row))
            r_s, f_s = row[order], fps[order]
            first = np.r_[True, (r_s[1:] != r_s[:-1])
                          | (f_s[1:] != f_s[:-1])]
            heads = np.flatnonzero(first)
            cnt = np.diff(np.r_[heads, r_s.size])
            rr, ff = r_s[heads], f_s[heads]
        else:
            rr = np.empty(0, np.int64)
            ff = np.empty(0, np.uint64)
            cnt = np.empty(0, np.int64)
        totals = np.maximum(lens - window + 1, 0)
        doc_rows = np.arange(len(lens), dtype=np.int64)
        kind = np.r_[np.zeros(len(lens), np.int8), np.ones(len(rr), np.int8)]
        take = pa.array(np.r_[doc_rows, rr])
        return pa.table({
            "kind": pa.array(kind, pa.int8()),
            id_column: ids.take(take),
            "h": pa.array(np.r_[np.zeros(len(lens), np.int64),
                                ff.view(np.int64)], pa.int64()),
            "n": pa.array(np.r_[totals, cnt.astype(np.int64)], pa.int64()),
        })

    parts = _nonempty_blocks(
        new_ds.map_batches(new_partial, batch_format="pyarrow")
              .materialize())
    if parts is None:
        import ray.data as _rd

        return _rd.from_arrow(pa.table({
            id_column: pa.array([], id_field.type),
            "n_windows": pa.array([], pa.int64()),
            "n_seen": pa.array([], pa.int64()),
            "coverage_frac": pa.array([], pa.float64())}))

    def keep_kind(k):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b.column("kind"), k))
        return f

    totals = (parts.map_batches(keep_kind(0), batch_format="pyarrow")
                   .select_columns([id_column, "n"]))
    win_rows = parts.map_batches(keep_kind(1), batch_format="pyarrow")
    hit_rows = safe_join(win_rows, seen, "inner", num_partitions,
                         on=("h",), right_on=("h",))
    hits = (_nonempty_blocks(
        hit_rows.groupby(id_column)
                .aggregate(Sum("n", alias_name="n_seen"))
                .materialize()) if hit_rows is not None else None)

    def finish(b: pa.Table) -> pa.Table:
        tot = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        seen_n = (pc.fill_null(b.column("n_seen"), 0)
                  .to_numpy(zero_copy_only=False).astype(np.int64)
                  if "n_seen" in b.column_names
                  else np.zeros(len(tot), np.int64))
        frac = np.fromiter(
            (round(int(s) / int(t), 6) if t else 0.0
             for s, t in zip(seen_n, tot)), np.float64, len(tot))
        return pa.table({
            id_column: b.column(id_column),
            "n_windows": pa.array(tot, pa.int64()),
            "n_seen": pa.array(seen_n, pa.int64()),
            "coverage_frac": pa.array(frac, pa.float64()),
        })

    if hits is None:
        return totals.map_batches(finish, batch_format="pyarrow")
    joined = safe_join(totals, hits, "left_outer", num_partitions,
                       on=(id_column,), right_on=(id_column,),
                       right_empty_fill={"n_seen": pa.int64()})
    return joined.map_batches(finish, batch_format="pyarrow")


def plagiarism_pairs(ds, key_column: str = "doc_id",
                     text_column: str = "text", *, k: int = 5,
                     window: int = 4, min_shared: int = 2,
                     max_df: int = 20, num_buckets: int = 64):
    """MOSS-style plagiarism detection (Schleimer et al. '03): document
    PAIRS ranked by how many winnowing fingerprints they share —
    ``(a, b, shared)`` with a < b and shared ≥ ``min_shared``.
    Fingerprints whose document frequency exceeds ``max_df`` are
    dropped first: ubiquitous k-grams (boilerplate, common phrases)
    carry no plagiarism signal, and the df cap is also the scale guard
    — per-fingerprint pair fan-out is quadratic in df, so the cap
    bounds every group's emission at max_df².

    Scale shape: one streaming pass emits (fp, key) rows (winnowing
    keeps ~2/(window+1) of the k-gram mass); a fp-keyed ``groupby``
    computes df and prunes; surviving rows coarse-bucket by fp%%64 into
    bounded ``map_groups`` tasks whose in-bucket pair emission is a
    sorted run-length numpy pass (no per-fp Python group calls); one
    final (a, b) ``groupby.sum`` + threshold.  Oracle parity note: the
    SQL twin replicates winnowing with a ROWS-window min, which
    requires documents of ≥ k tokens (shorter docs fingerprint their
    single joined shingle on the Python side only)."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..functions.hashing import winnow_rows

    def fp_rows(batch: pa.Table) -> pa.Table:
        # vectorized winnowing (functions/hashing.winnow_rows): Arrow
        # split + shingle join + sliding-window minima; md5 only per
        # distinct batch shingle
        di, fp = winnow_rows(batch.column(text_column),
                             k=k, window=window)
        kcol = batch.column(key_column)
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        return pa.table({key_column: kcol.take(pa.array(di)),
                         "fp": pa.array(fp.astype(np.int64), pa.int64())})

    rows = ds.map_batches(fp_rows, batch_format="pyarrow").materialize()

    df = (rows.groupby("fp").count()
              .map_batches(lambda b: b.filter(
                  pc.less_equal(b.column("count()"), max_df)).select(["fp"]),
                  batch_format="pyarrow"))
    from .joins import _join_partitions, _nonempty_blocks, safe_join

    df = _nonempty_blocks(df.materialize())  # None when fully pruned
    if df is None or df.count() == 0:
        import ray.data as rd

        key_type = rows.schema().base_schema.field(key_column).type
        return rd.from_arrow(pa.table({
            "a": pa.array([], key_type), "b": pa.array([], key_type),
            "shared": pa.array([], pa.int64())}))
    kept = safe_join(rows, df, "inner", 16, on=("fp",))

    def bucket(b: pa.Table) -> pa.Table:
        f = b.column("fp").to_numpy(zero_copy_only=False)
        return b.append_column("__b", pa.array(f % num_buckets, pa.int64()))

    def emit_pairs(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("fp", "ascending"),
                                              (key_column, "ascending")])
        g = g.take(order)
        f = g.column("fp").to_numpy(zero_copy_only=False)
        keys = g.column(key_column).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.concatenate([[True], f[1:] != f[:-1]]))
        ends = np.concatenate([starts[1:], [len(f)]])
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, 1)
            out_a.append(keys[s:e][ia])
            out_b.append(keys[s:e][ib])
        if not out_a:
            return pa.table({"a": pa.array([], g.schema.field(
                key_column).type), "b": pa.array([], g.schema.field(
                    key_column).type), "n": pa.array([], pa.int64())})
        a = np.concatenate(out_a)
        b_ = np.concatenate(out_b)
        return pa.table({"a": pa.array(a), "b": pa.array(b_),
                         "n": pa.array(np.ones(len(a), np.int64))})

    pairs = (kept.map_batches(bucket, batch_format="pyarrow")
                 .groupby("__b")
                 .map_groups(emit_pairs, batch_format="pyarrow")
                 .groupby(["a", "b"])
                 .aggregate(Sum("n", alias_name="shared")))
    return pairs.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("shared"),
                                            min_shared)),
        batch_format="pyarrow")


def containment_pairs(ds, key_column: str = "doc_id",
                      text_column: str = "text", *, k: int = 5,
                      window: int = 4, tau: float = 0.5,
                      max_df: int = 20, num_buckets: int = 64,
                      digits: int = 6):
    """DIRECTIONAL containment detection: pairs (a, b, shared,
    containment) where containment = shared fingerprints / |a's
    fingerprints| ≥ ``tau`` — "document a is (mostly) quoted inside
    b", the asymmetric sibling of :func:`plagiarism_pairs`' symmetric
    shared count (a short doc fully pasted into a long one scores
    containment 1.0 while its Jaccard stays low).  Both directions are
    emitted when both clear tau.  Fractions round half-away (the
    count-ratio grid-tie rule).

    Scale shape: the plagiarism pair plan (winnowing fps, df ≤ max_df
    prune, fp%%buckets run-length pair emission, (a,b) sum) plus one
    per-doc fingerprint-count pass whose (key, n_fp) table joins the
    pair list on each side — pair-list-sized joins, corpus never
    reshuffles."""
    import numpy as np
    import pyarrow.compute as pc

    import ray.data as rd

    from ray.data.aggregate import Sum

    from ..functions.hashing import winnow_rows
    from .joins import _join_partitions, _nonempty_blocks, safe_join

    pairs = plagiarism_pairs(ds, key_column, text_column, k=k,
                             window=window, min_shared=1, max_df=max_df,
                             num_buckets=num_buckets).materialize()
    key_type = ds.schema().base_schema.field(key_column).type
    empty = pa.table({"a": pa.array([], key_type),
                      "b": pa.array([], key_type),
                      "shared": pa.array([], pa.int64()),
                      "containment": pa.array([], pa.float64())})
    pairs = _nonempty_blocks(pairs)
    if pairs is None or pairs.count() == 0:
        return rd.from_arrow(empty)

    def fp_counts(batch: pa.Table) -> pa.Table:
        di, _fp = winnow_rows(batch.column(text_column),
                              k=k, window=window)
        ns = np.bincount(di, minlength=batch.num_rows)
        return pa.table({key_column: batch.column(key_column),
                         "n_fp": pa.array(ns.astype(np.int64),
                                          pa.int64())})

    counts = ds.map_batches(fp_counts, batch_format="pyarrow") \
               .materialize()

    # both directions: (a contained-in b) and (b contained-in a)
    def mirror(b: pa.Table) -> pa.Table:
        return pa.concat_tables([
            b.select(["a", "b", "shared"]),
            pa.table({"a": b.column("b"), "b": b.column("a"),
                      "shared": b.column("shared")})])

    both = pairs.map_batches(mirror, batch_format="pyarrow")
    joined = safe_join(both, counts, "inner", 16,
                       on=("a",), right_on=(key_column,))
    if joined is None:
        return rd.from_arrow(empty)

    scale = 10.0 ** digits

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        sh = b.column("shared").to_numpy(zero_copy_only=False).astype(
            np.float64)
        nf = b.column("n_fp").to_numpy(zero_copy_only=False).astype(
            np.float64)
        cont = np.floor(sh / np.maximum(nf, 1.0) * scale + 0.5) / scale
        t = pa.table({"a": b.column("a"), "b": b.column("b"),
                      "shared": b.column("shared"),
                      "containment": pa.array(cont, pa.float64())})
        return t.filter(pa.array(cont >= tau))

    return joined.map_batches(score, batch_format="pyarrow")


def pagination_chains(ds, key_column: str = "doc_id",
                      text_column: str = "text", *, k: int = 8,
                      max_df: int = 20):
    """Continuation detection: pairs (a, b) where the LAST ``k`` words
    of a equal the FIRST ``k`` words of b — the split-article /
    pagination signal that feeds page reassembly (the F2 re-aggregation
    family's discovery step).  Boundary grams with document frequency
    above ``max_df`` on either side are dropped first (boilerplate
    headers/footers repeat everywhere and would chain unrelated pages;
    the cap is also the per-gram quadratic-fanout guard).  Docs shorter
    than ``k`` words emit nothing; a's tail never matches a's own head.

    Scale shape: one streaming pass emits ≤ 2 rows per doc (tail fp,
    head fp — md5 of the joined boundary gram, strings never ship);
    df-capped per side; ONE fp-keyed hash join tail ⋈ head bounded by
    the surviving boundary mass."""
    import numpy as np
    import pyarrow.compute as pc

    import ray.data as rd

    from ..functions.hashing import stable_hash64
    from .joins import _join_partitions, _nonempty_blocks, safe_join

    def boundaries(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column).to_pylist()
        hk, hf, tk, tf = [], [], [], []
        for key, t in zip(keys, batch.column(text_column).to_pylist()):
            ws = (t or "").split()
            if len(ws) < k:
                continue
            hf.append(stable_hash64(" ".join(ws[:k])))
            hk.append(key)
            tf.append(stable_hash64(" ".join(ws[-k:])))
            tk.append(key)
        return pa.table({
            "key": pa.array(hk + tk),
            "fp": pa.array(np.array(hf + tf, np.uint64).view(np.int64)),
            "side": pa.array(["h"] * len(hk) + ["t"] * len(tk),
                             pa.string())})

    rows = ds.map_batches(boundaries, batch_format="pyarrow") \
             .materialize()
    key_type = rows.schema().base_schema.field("key").type
    empty = pa.table({"a": pa.array([], key_type),
                      "b": pa.array([], key_type)})

    def split(side: str):
        def f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("side"), side))
            return pa.table({"key": t.column("key"), "fp": t.column("fp")})
        return f

    heads = rows.map_batches(split("h"), batch_format="pyarrow") \
                .materialize()
    tails = rows.map_batches(split("t"), batch_format="pyarrow") \
                .materialize()

    # df cap per side
    def capped(side_ds):
        keep = (side_ds.groupby("fp").count()
                       .map_batches(lambda b: b.filter(
                           pc.less_equal(b.column("count()"), max_df))
                           .select(["fp"]),
                           batch_format="pyarrow")).materialize()
        keep = _nonempty_blocks(keep)
        if keep is None or keep.count() == 0:
            return None
        j = safe_join(side_ds, keep, "inner", 16, on=("fp",))
        return j.materialize() if j is not None else None

    hc, tc = capped(heads), capped(tails)
    if hc is None or tc is None:
        return rd.from_arrow(empty)
    hc, tc = _nonempty_blocks(hc), _nonempty_blocks(tc)
    if hc is None or tc is None:
        return rd.from_arrow(empty)

    # distinct column names per side: Ray keeps duplicate field names
    # otherwise, breaking downstream column lookup
    tc = tc.map_batches(lambda b: pa.table({"a": b.column("key"),
                                            "fp": b.column("fp")}),
                        batch_format="pyarrow")
    hc = hc.map_batches(lambda b: pa.table({"b": b.column("key"),
                                            "fp": b.column("fp")}),
                        batch_format="pyarrow")

    def fmt(b: pa.Table) -> pa.Table:
        t = b.filter(pc.invert(pc.equal(b.column("a"), b.column("b"))))
        return pa.table({"a": t.column("a"), "b": t.column("b")})

    joined = safe_join(tc, hc, "inner", 16, on=("fp",))
    if joined is None:
        return rd.from_arrow(empty)
    return joined.map_batches(fmt, batch_format="pyarrow")


def ngram_novelty(ds, key_column: str = "doc_id",
                  text_column: str = "text", *, k: int = 2,
                  scale: int = 1_000_000):
    """Per-document n-gram NOVELTY: of the document's distinct
    k-grams, the fraction whose corpus-wide first owner (minimum key)
    is this document — the redundancy-ordering signal for curriculum
    construction and mirror-chain pruning (a late near-copy scores ~0,
    the corpus's first occurrence of its content scores ~1).  Docs
    with fewer than ``k`` tokens emit nothing (the SQL full-window
    rule).

    Plan (all fp-space, fixed-width): one streaming pass emits each
    doc's DISTINCT gram fingerprints (`functions/hashing.gram_rows`,
    57-bit md5 prefix — Arrow split + k-shifted join, md5 once per
    distinct batch gram); ``groupby(fp).min(key)`` builds the owner
    table (vocabulary-sized); ONE fp-keyed hash join tags each doc-gram
    with its owner; a per-batch (key, n, novel) combiner then a
    key-sized ``groupby.sum`` finishes.  Novelty snaps to the 1/scale
    grid via floor(x·scale + 0.5) — the non-negative-ratio round()
    parity rule.  → (key, n_grams, n_novel, novelty)."""
    import numpy as np
    import pyarrow.compute as pc

    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from ..functions.hashing import gram_rows
    from .joins import safe_join

    def fp_rows(batch: pa.Table) -> pa.Table:
        di, fp = gram_rows(batch.column(text_column), k=k)
        kcol = batch.column(key_column)
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        return pa.table({key_column: kcol.take(pa.array(di)),
                         "fp": pa.array(fp, pa.int64())})

    rows = ds.map_batches(fp_rows, batch_format="pyarrow").materialize()
    owners = rows.groupby("fp").aggregate(Min(key_column,
                                              alias_name="own"))
    empty = pa.table({key_column: pa.array([], pa.int64()),
                      "n_grams": pa.array([], pa.int64()),
                      "n_novel": pa.array([], pa.int64()),
                      "novelty": pa.array([], pa.float64())})
    joined = safe_join(rows, owners, "inner", on=("fp",))
    if joined is None:
        return rd.from_arrow(empty)

    def partial(b: pa.Table) -> pa.Table:
        keys = b.column(key_column)
        own = b.column("own")
        novel = pc.cast(pc.equal(keys, own), pa.int64())
        t = pa.table({key_column: keys, "pn": pa.array(
            np.ones(b.num_rows, np.int64)), "pnov": novel})
        g = t.group_by([key_column]).aggregate([("pn", "sum"),
                                                ("pnov", "sum")])
        return g.rename_columns([key_column, "pn", "pnov"])

    merged = (joined.map_batches(partial, batch_format="pyarrow")
                    .groupby(key_column)
                    .aggregate(Sum("pn", alias_name="n_grams"),
                               Sum("pnov", alias_name="n_novel")))

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_grams").to_numpy(zero_copy_only=False)
        nov = b.column("n_novel").to_numpy(zero_copy_only=False)
        r = np.floor(nov / n * scale + 0.5) / scale
        return pa.table({key_column: b.column(key_column),
                         "n_grams": b.column("n_grams"),
                         "n_novel": b.column("n_novel"),
                         "novelty": pa.array(r, pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")
