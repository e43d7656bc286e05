"""Training-sequence packing: concatenate the corpus token stream in key
order and cut it into fixed-length sequences (the GPT-style
"concat-and-chunk" batching step; documents cross sequence boundaries).

The hard part at scale is the global token offset of every document —
a PREFIX SUM over the corpus.  Shape:

1. token counts per doc (pruned 2-column map), sorted by key — the only
   exchange in the operator, and it carries (int64 key, int64 count)
   rows, never text;
2. the sorted counts are materialized so the block layout is FIXED, then
   one blocks-sized pass collects per-block (min key, token total)
   summaries to the driver, which prefix-sums them into per-block start
   offsets (num_blocks rows — trivially driver-safe at any corpus size);
3. a second map over the SAME materialized blocks adds the broadcast
   block offset to a local exclusive cumsum → every doc's global
   [start, end) token span with no all-to-all beyond the one sort;
4. spans explode into their overlapping sequence ids (vectorized
   repeat), a per-batch Arrow combiner pre-reduces (seq_id → docs,
   tokens, min/max key) and a tiny groupby merges partials.

Partitioning assumption (documented contract): steps 2 and 3 iterate the
same materialized blocks (``batch_size=None`` == one block per task), so
block membership is identical between the summary pass and the offset
pass.  Tokenization is whitespace split, matching the SQL oracle's
``string_split_regex('\\s+')`` with empties dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _token_counts(batch: pa.Table, key_column: str, text_column: str) -> pa.Table:
    keys = batch.column(key_column)
    ns = [len((t or "").split()) for t in batch.column(text_column).to_pylist()]
    return pa.table({key_column: keys, "n": pa.array(ns, pa.int64())})


def pack_sequences(ds, seq_len: int, *, key_column: str = "doc_id",
                   text_column: str = "text"):
    """→ Dataset of (seq_id, n_docs, n_tokens, first_doc, last_doc), one
    row per packed training sequence of ``seq_len`` tokens (the final
    sequence may be short).  Zero-token documents occupy no tokens and
    are not counted in any sequence."""
    from ray.data.aggregate import Max, Min, Sum

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    counts = ds.map_batches(
        lambda b: _token_counts(b, key_column, text_column),
        batch_format="pyarrow",
    ).sort(key_column).materialize()

    def summary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"min_key": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64())})
        keys = batch.column(key_column).to_numpy()
        ns = batch.column("n").to_numpy()
        return pa.table({"min_key": pa.array([int(keys.min())], pa.int64()),
                         "total": pa.array([int(ns.sum())], pa.int64())})

    summaries = counts.map_batches(summary, batch_format="pyarrow").to_pandas()
    if len(summaries) == 0 or summaries["total"].sum() == 0:
        import ray.data as rd

        empty = pa.table({
            "seq_id": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "first_doc": pa.array([], pa.int64()),
            "last_doc": pa.array([], pa.int64()),
        })
        return rd.from_arrow(empty)
    summaries = summaries.sort_values("min_key")
    offsets = summaries["total"].cumsum().shift(fill_value=0)
    offset_by_min_key = dict(zip(summaries["min_key"].astype(int),
                                 offsets.astype(int)))

    L = int(seq_len)

    def explode_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"seq_id": pa.array([], pa.int64()),
                          "pc": pa.array([], pa.int64()),
                          "pt": pa.array([], pa.int64()),
                          "pmin": pa.array([], pa.int64()),
                          "pmax": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        keys = batch.column(key_column).to_numpy()
        ns = batch.column("n").to_numpy()
        base = offset_by_min_key[int(keys.min())]
        start = base + np.concatenate(([0], ns.cumsum()[:-1]))
        end = start + ns
        nz = ns > 0
        if not nz.any():
            return empty
        keys, start, end = keys[nz], start[nz], end[nz]
        first_seq = start // L
        last_seq = (end - 1) // L
        reps = (last_seq - first_seq + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(keys)), reps)
        within = np.arange(reps.sum()) - np.repeat(
            np.concatenate(([0], reps.cumsum()[:-1])), reps)
        seq = first_seq[idx] + within
        toks = (np.minimum(end[idx], (seq + 1) * L)
                - np.maximum(start[idx], seq * L))
        t = pa.table({"seq_id": pa.array(seq, type=pa.int64()),
                      "key": pa.array(keys[idx], type=pa.int64()),
                      "toks": pa.array(toks, type=pa.int64())})
        g = t.group_by(["seq_id"]).aggregate(
            [("key", "count"), ("toks", "sum"),
             ("key", "min"), ("key", "max")])
        return g.rename_columns(["seq_id", "pc", "pt", "pmin", "pmax"])

    agg = (counts.map_batches(explode_partial, batch_format="pyarrow")
                 .groupby("seq_id")
                 .aggregate(Sum("pc", alias_name="pc"),
                            Sum("pt", alias_name="pt"),
                            Min("pmin", alias_name="pmin"),
                            Max("pmax", alias_name="pmax")))

    def fmt(batch: pa.Table) -> pa.Table:
        return pa.table({
            "seq_id": batch.column("seq_id").cast(pa.int64()),
            "n_docs": batch.column("pc").cast(pa.int64()),
            "n_tokens": batch.column("pt").cast(pa.int64()),
            "first_doc": batch.column("pmin").cast(pa.int64()),
            "last_doc": batch.column("pmax").cast(pa.int64()),
        })

    return agg.map_batches(fmt, batch_format="pyarrow")
