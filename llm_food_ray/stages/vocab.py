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
