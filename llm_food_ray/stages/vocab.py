"""Vocabulary-induction primitives: corpus-wide symbol-pair statistics.

The first step of every BPE / WordPiece tokenizer-training run is "count
every adjacent symbol pair over the corpus, take the most frequent" —
at 100 TB that count is the whole job (each merge step afterwards only
rewrites the pair table).  ``top_char_pairs`` implements that step as a
pre-aggregated wide count in codepoint space: each batch bincounts its
adjacent codepoint pairs into packed-int64 keys via numpy (no Python
per-character loop, no pair strings on the exchange), one ``groupby.sum``
merges the vocabulary-sized partials, and a deterministic
(count desc, pair asc) top-k finishes.  Pair strings are only
materialized for the final k rows.

No reference analogue (llm-food has no tokenizer training); brief-scope
training-data operator.
"""

from __future__ import annotations

import pyarrow as pa

# codepoints never part of a pair: whitespace acts as a word/document
# boundary, NUL is the internal document separator
_SEPARATORS = " \t\r\n\f\v\x00"
_CP_BASE = 0x110000  # one past the max Unicode codepoint → injective pack


def top_char_pairs(ds, text_column: str = "text", *, k: int = 20,
                   separators: str = _SEPARATORS):
    """Corpus-wide top-k adjacent character pairs (the BPE merge-step
    count).  A pair is counted whenever two codepoints are adjacent
    within a document and NEITHER is a separator, so pairs never span
    words or documents.

    Returns a dataset of ``(pair, n)`` — exactly ``k`` rows (fewer only
    on a tiny corpus), ordered by (n desc, pair asc); the pair order is
    codepoint order, which matches SQL engines' binary UTF-8 collation.

    Scale shape: the per-batch combiner is pure numpy over a utf-32
    view of the batch's concatenated text (one encode + one
    ``np.unique`` per batch — no per-row or per-char Python), the
    exchange ships (packed-int64 pair, count) partials bounded by the
    observed pair vocabulary (≤ alphabet², in practice tiny vs corpus
    bytes), a post-sum per-block local top-k prunes the sort input, and
    the global sort touches ≤ blocks×k rows."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    sep_cp = np.array(sorted(ord(c) for c in separators), np.uint32)

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_column).to_pylist()
        joined = "\x00".join(t or "" for t in texts)
        cp = np.frombuffer(joined.encode("utf-32-le"), np.uint32)
        if cp.size < 2:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        a, b = cp[:-1], cp[1:]
        ok = ~np.isin(a, sep_cp) & ~np.isin(b, sep_cp)
        key = a[ok].astype(np.int64) * _CP_BASE + b[ok].astype(np.int64)
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"pk": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    def local_topk(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch, sort_keys=[("n", "descending"),
                                                  ("pk", "ascending")])
        return batch.take(order[:k])

    def decode(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_pylist()
        pairs = [chr(v // _CP_BASE) + chr(v % _CP_BASE) for v in pk]
        return pa.table({"pair": pa.array(pairs, pa.string()),
                         "n": batch.column("n")})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("pk")
                .aggregate(Sum("n", alias_name="n")))
    return (merged.map_batches(local_topk, batch_format="pyarrow")
                  .sort(["n", "pk"], descending=[True, False])
                  .limit(k)
                  .map_batches(decode, batch_format="pyarrow"))


# --------------------------------------------------------------------------
# Iterative BPE training (the full tokenizer-induction loop)
# --------------------------------------------------------------------------

# whitespace that ends a word for BPE pre-tokenization.  Explicit class
# (not \s) so the Ray side and the RE2-based SQL twin agree exactly.
WORD_SPLIT_PATTERN = "[ \\t\\n\\r\\f\\v]+"


# words the driver-local plan will hold at once (rows; ~tens of MB of
# symbol ids) — beyond this the merge rounds stay fully distributed
BPE_DRIVER_BUDGET_ROWS = 2_000_000


def _bpe_pair_count(vals, offs, lens, n, pack):
    """Adjacent-pair counts over flattened symbol arrays: packed-int64
    keys, word-frequency weights, sort+reduceat exact int64 sums.
    Returns (keys, counts) — empty arrays when no pair exists."""
    import numpy as np

    if vals.size < 2:
        return (np.empty(0, np.int64),) * 2
    is_start = np.zeros(vals.size + 1, bool)
    is_start[offs[:-1]] = True
    valid = ~is_start[1:vals.size]
    key = (vals[:-1] * pack + vals[1:])[valid]
    if key.size == 0:
        return (np.empty(0, np.int64),) * 2
    w = np.repeat(n, lens)[:-1][valid]
    order = np.argsort(key, kind="stable")
    ks, ws = key[order], w[order]
    starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
    return ks[starts], np.add.reduceat(ws, starts)


def _bpe_rewrite(vals, offs, lens, p, q, nid):
    """One merge applied left-to-right non-overlapping (run-parity rule:
    within each run of consecutive match positions keep alternate
    starts, so ``aaaa`` under merge (a,a) becomes ``(aa)(aa)``).
    Returns (vals, offs, lens) — the inputs unchanged when no match."""
    import numpy as np

    if vals.size < 2:
        return vals, offs, lens
    is_start = np.zeros(vals.size + 1, bool)
    is_start[offs[:-1]] = True
    match = (vals[:-1] == p) & (vals[1:] == q) & ~is_start[1:vals.size]
    m = np.flatnonzero(match)
    if m.size == 0:
        return vals, offs, lens
    new_run = np.ones(m.size, bool)
    new_run[1:] = np.diff(m) > 1
    run_starts = m[new_run]
    keep = m[(m - run_starts[np.cumsum(new_run) - 1]) % 2 == 0]
    vals2 = vals.copy()
    vals2[keep] = nid
    mask = np.ones(vals.size, bool)
    mask[keep + 1] = False
    word_of = np.searchsorted(offs, keep, side="right") - 1
    new_lens = lens - np.bincount(word_of, minlength=lens.size)
    new_offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(new_lens)])
    return vals2[mask], new_offs, new_lens


def _bpe_fit(ds, text_column: str, num_merges: int, min_word_len: int,
             exec: str, driver_budget_rows: int):
    """Shared fit loop for :func:`bpe_train` (merge table) and
    :func:`bpe_token_counts` (apply): trains ``num_merges`` BPE merges
    over the corpus (Sennrich-style — whitespace pre-tokenization into
    a word-frequency table, then per step count every adjacent symbol
    pair weighted by word frequency and merge the most frequent pair
    left-to-right in every word) and returns
    ``(merges, word_list, tok_lens)``: the ordered merge tuples
    ``(rank, left, right, merged, count)`` plus the final per-word
    symbol counts.  Deterministic end to end: pair-count ties break on
    the (left, right) symbol strings in codepoint order (== SQL's
    binary UTF-8 collation).

    Scale shape: the corpus is read ONCE (per-batch word bincount →
    one word-vocabulary-sized ``groupby.sum``, the only corpus-wide
    exchange; vocabulary growth is Heaps-law sublinear).  The merge
    loop then runs over the word table only, auto-gated like
    ``dedup_exact``'s reduce plans (both plans share the same numpy
    kernels, so they are byte-equal by construction):

    - ``driver`` (vocab ≤ ``driver_budget_rows``): one gather of the
      word table as flat int64 arrays, then an in-process loop —
      per-step cost is one vectorized pass over the vocab arrays, no
      per-round job overhead.
    - ``distributed`` (beyond the gate): per step one streaming pass
      over the materialized word table emits (packed-pair, count)
      partials via sort+reduceat in packed-int64 space (no symbol
      strings, no Python per-char loops), a pair-vocabulary-sized
      ``groupby.sum`` merges them, a per-block max prune bounds the
      driver gather by blocks×ties, and the left-to-right rewrite is
      one vectorized numpy pass.  Nothing corpus-sized moves after the
      first exchange; per-step cost is O(word-vocab), so thousand-merge
      runs are linear in merges, not corpus.

    No reference analogue (llm-food has no tokenizer training;
    ``top_char_pairs`` is this loop's step-0 count); brief-scope
    training-data operator.
    """
    import re

    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from ray.data.aggregate import Sum

    if exec not in ("auto", "driver", "distributed"):
        raise ValueError(f"exec must be auto|driver|distributed: {exec!r}")

    split_re = re.compile(WORD_SPLIT_PATTERN)

    def word_partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_column).to_pylist()
        words = [w for w in split_re.split(" ".join(t or "" for t in texts))
                 if len(w) >= min_word_len]
        if not words:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uniq, cnt = np.unique(np.asarray(words, dtype=object),
                              return_counts=True)
        return pa.table({"word": pa.array(uniq.tolist(), pa.string()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    def _syms_col(vals, offs):
        return pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()),
                                             pa.array(vals, pa.int64()))

    def to_syms(batch: pa.Table) -> pa.Table:
        words = batch.column("word").to_pylist()
        joined = "".join(words)
        cp = np.frombuffer(joined.encode("utf-32-le"),
                           np.uint32).astype(np.int64)
        lens = np.fromiter((len(w) for w in words), np.int64, len(words))
        offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
        return pa.table({"word": batch.column("word"),
                         "n": batch.column("n"),
                         "syms": _syms_col(cp, offs)})

    def _flat(batch: pa.Table):
        col = batch.column("syms")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).to_numpy().astype(np.int64)
        vals = col.flatten().to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
        return vals, offs, lens

    pack = _CP_BASE + num_merges + 1  # injective (left, right) packing

    vocab = (ds.map_batches(word_partial, batch_format="pyarrow")
               .groupby("word")
               .aggregate(Sum("n", alias_name="n"))
               .map_batches(to_syms, batch_format="pyarrow")
               .materialize())

    # id↔string must stay injective: distinct merges can produce the
    # SAME string (ab+c and a+bc are both 'abc'), and the reference /
    # SQL semantics identify symbols by string — so a merged string that
    # already has an id reuses it instead of allocating a new one.
    id2str: dict[int, str] = {}
    str2id: dict[str, int] = {}

    def sym_str(i: int) -> str:
        return id2str[i] if i >= _CP_BASE else chr(i)

    def alloc_id(s: str, step: int) -> int:
        if s in str2id:
            return str2id[s]
        nid = _CP_BASE + step
        id2str[nid] = s
        str2id[s] = nid
        return nid

    def pick_best(keys, cnts):
        """Global argmax by (count desc, left string, right string);
        returns the winning ids alongside their strings."""
        best_cnt = cnts.max()
        tied = keys[cnts == best_cnt]
        _, _, p, q = min(
            (sym_str(int(k) // pack), sym_str(int(k) % pack),
             int(k) // pack, int(k) % pack) for k in tied)
        return p, q, int(best_cnt)

    merges: list[tuple] = []

    if exec == "driver" or (exec == "auto" and
                            vocab.count() <= driver_budget_rows):
        # ---- driver-local merge loop over the gathered word table ----
        parts = [_flat(b) + (b.column("n").to_numpy().astype(np.int64),
                             b.column("word").to_pylist())
                 for b in vocab.iter_batches(batch_format="pyarrow")
                 if b.num_rows]
        if parts:
            vals = np.concatenate([p[0] for p in parts])
            lens = np.concatenate([p[2] for p in parts])
            n = np.concatenate([p[3] for p in parts])
            words = [w for p in parts for w in p[4]]
        else:
            vals = lens = n = np.empty(0, np.int64)
            words = []
        offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
        for step in range(num_merges):
            keys, cnts = _bpe_pair_count(vals, offs, lens, n, pack)
            if keys.size == 0:
                break
            p, q, best_cnt = pick_best(keys, cnts)
            l_s, r_s = sym_str(p), sym_str(q)
            new_id = alloc_id(l_s + r_s, step)
            merges.append((step + 1, l_s, r_s, l_s + r_s, best_cnt))
            vals, offs, lens = _bpe_rewrite(vals, offs, lens, p, q, new_id)
    else:
        # ---- fully distributed merge rounds --------------------------
        def pair_partial(batch: pa.Table) -> pa.Table:
            empty = pa.table({"pk": pa.array([], pa.int64()),
                              "cnt": pa.array([], pa.int64())})
            if batch.num_rows == 0:
                return empty
            vals, offs, lens = _flat(batch)
            n = batch.column("n").to_numpy().astype(np.int64, copy=False)
            keys, cnts = _bpe_pair_count(vals, offs, lens, n, pack)
            if keys.size == 0:
                return empty
            return pa.table({"pk": pa.array(keys, pa.int64()),
                             "cnt": pa.array(cnts, pa.int64())})

        def local_max(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            return batch.filter(pc.equal(batch.column("cnt"),
                                         pc.max(batch.column("cnt"))))

        for step in range(num_merges):
            cand = (vocab.map_batches(pair_partial, batch_format="pyarrow")
                         .groupby("pk")
                         .aggregate(Sum("cnt", alias_name="cnt"))
                         .map_batches(local_max, batch_format="pyarrow")
                         .take_all())
            if not cand:
                break
            keys = np.array([r["pk"] for r in cand], np.int64)
            cnts = np.array([r["cnt"] for r in cand], np.int64)
            p, q, best_cnt = pick_best(keys, cnts)
            l_s, r_s = sym_str(p), sym_str(q)
            new_id = alloc_id(l_s + r_s, step)
            merges.append((step + 1, l_s, r_s, l_s + r_s, best_cnt))

            def rewrite(batch: pa.Table, p=p, q=q,
                        nid=new_id) -> pa.Table:
                if batch.num_rows == 0:
                    return batch
                vals, offs, lens = _flat(batch)
                vals2, offs2, _ = _bpe_rewrite(vals, offs, lens, p, q, nid)
                if vals2 is vals:
                    return batch
                return pa.table({"word": batch.column("word"),
                                 "n": batch.column("n"),
                                 "syms": _syms_col(vals2, offs2)})

            vocab = vocab.map_batches(rewrite,
                                      batch_format="pyarrow").materialize()
        # gather the final per-word symbol counts (word string + one
        # int per vocabulary word — the same scale as the fp LM models)
        words, lens_l = [], []
        for b in vocab.iter_batches(batch_format="pyarrow"):
            if not b.num_rows:
                continue
            words.extend(b.column("word").to_pylist())
            lens_l.append(pc.list_value_length(
                b.column("syms").combine_chunks()
                if isinstance(b.column("syms"), pa.ChunkedArray)
                else b.column("syms")).to_numpy(zero_copy_only=False))
        lens = (np.concatenate(lens_l).astype(np.int64)
                if lens_l else np.empty(0, np.int64))

    return merges, words, lens


def bpe_train(ds, text_column: str = "text", *, num_merges: int = 8,
              min_word_len: int = 2, exec: str = "auto",
              driver_budget_rows: int = BPE_DRIVER_BUDGET_ROWS):
    """The learned merge table of :func:`_bpe_fit` as a tiny Dataset —
    see the fit loop's docstring for semantics and scale shape."""
    import ray.data as rd

    merges, _, _ = _bpe_fit(ds, text_column, num_merges, min_word_len,
                            exec, driver_budget_rows)
    return rd.from_arrow(pa.table({
        "merge_rank": pa.array([m[0] for m in merges], pa.int64()),
        "left_sym": pa.array([m[1] for m in merges], pa.string()),
        "right_sym": pa.array([m[2] for m in merges], pa.string()),
        "merged": pa.array([m[3] for m in merges], pa.string()),
        "n": pa.array([m[4] for m in merges], pa.int64()),
    }))


def bpe_token_counts(ds, text_column: str = "text", *,
                     num_merges: int = 8, min_word_len: int = 2,
                     id_column: str = "doc_id", exec: str = "auto",
                     driver_budget_rows: int = BPE_DRIVER_BUDGET_ROWS):
    """Apply the merges :func:`bpe_train` learns back to the SAME
    corpus: per document, the token count under the trained vocabulary
    (words below ``min_word_len`` tokenize to one token each; every
    longer word's count is its post-merge symbol count) — the
    compression-ratio measurement that closes the tokenizer loop.

    Scale shape: fit as in :func:`_bpe_fit`; the word→token-count model
    then broadcasts in fingerprint space — (md5-u64 fp, count) sorted
    arrays via ``ray.put``, word strings never ship (the ``lm.py`` fp
    model recipe; ~16 B per vocabulary word) — and the corpus streams
    through one searchsorted encode pass with per-batch distinct-word
    hashing."""
    import re

    import numpy as np

    import ray as _ray

    from ..functions.hashing import stable_hash64

    merges, words, lens = _bpe_fit(ds, text_column, num_merges,
                                   min_word_len, exec, driver_budget_rows)
    fps = np.fromiter((stable_hash64(w) for w in words), np.uint64,
                      len(words))
    order = np.argsort(fps)
    model = (fps[order], lens[order])
    ref = _ray.put(model)

    def encode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sv, sl = _ray.get(ref)
        col = pc.fill_null(batch.column(text_column).cast(pa.string()),
                           "")
        lists = pc.split_pattern_regex(col, WORD_SPLIT_PATTERN)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lens0 = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = lists.flatten()
        keep = pc.not_equal(flat, "")
        words = flat.filter(keep)
        doc_of = np.repeat(np.arange(len(lens0), dtype=np.int64),
                           lens0)[keep.to_numpy(zero_copy_only=False)]
        out = np.zeros(batch.num_rows, np.int64)
        if len(words):
            # hash + model lookup over the batch's DISTINCT words only
            enc2 = words.dictionary_encode()
            dwords = enc2.dictionary.to_pylist()
            per_dict = np.fromiter(
                (1 if len(w) < min_word_len else 0 for w in dwords),
                np.int64, len(dwords))
            long_i = np.flatnonzero(per_dict == 0)
            if long_i.size:
                fps_q = np.fromiter(
                    (stable_hash64(dwords[i]) for i in long_i),
                    np.uint64, long_i.size)
                pos = np.searchsorted(sv, fps_q)
                hit = pos < len(sv)
                cnts = np.ones(long_i.size, np.int64)
                cnts[hit] = sl[pos[hit]]
                per_dict[long_i] = cnts
            tok = per_dict[enc2.indices.to_numpy(zero_copy_only=False)]
            out = np.bincount(doc_of, weights=tok,
                              minlength=batch.num_rows).astype(np.int64)
        return pa.table({id_column: batch.column(id_column),
                         "n_tokens": pa.array(out, pa.int64())})

    return ds.map_batches(encode, batch_format="pyarrow")
