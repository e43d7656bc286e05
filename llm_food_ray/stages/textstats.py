"""Text-analysis stage: language ID, quality scoring, token counting,
document fingerprinting — per-batch vectorized columns over a text table.

These are the training-data-pipeline operators beyond the reference's own
inventory (prompt requirement): each is deterministic and cheap enough to
run as stateless ``map_batches`` tasks; the stopword tables / regexes are
module-level constants compiled at import (once per worker process).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import md5_hex, simhash64, winnow_fingerprint
from ..functions.textstats import (
    detect_lang,
    bpe_ish_token_count,
    quality_features,
    quality_score,
    token_count,
)


class TextStatsStage:
    """Adds lang_id / quality / token-count / fingerprint columns.

    `features` selects the computed columns (all by default) so queries
    only pay for what they project.
    """

    ALL = ("lang_id", "quality", "tokens", "fingerprint")

    def __init__(self, text_column: str = "text", features=ALL):
        self.text_column = text_column
        self.features = tuple(features)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(self.text_column).to_pylist()]
        cols: dict[str, pa.Array] = {}
        if "lang_id" in self.features:
            cols["lang_id"] = pa.array([detect_lang(t) for t in texts], pa.string())
        if "tokens" in self.features:
            cols["n_tokens"] = pa.array([token_count(t) for t in texts], pa.int64())
            cols["n_tokens_bpe"] = pa.array(
                [bpe_ish_token_count(t) for t in texts], pa.int64()
            )
        if "quality" in self.features:
            feats = [quality_features(t) for t in texts]
            cols["n_words"] = pa.array([f["n_words"] for f in feats], pa.int64())
            cols["mean_word_len"] = pa.array(
                [round(f["mean_word_len"], 6) for f in feats], pa.float64()
            )
            cols["stopword_ratio"] = pa.array(
                [round(f["stopword_ratio"], 6) for f in feats], pa.float64()
            )
            cols["quality"] = pa.array([quality_score(t) for t in texts], pa.float64())
        if "fingerprint" in self.features:
            cols["content_md5"] = pa.array([md5_hex(t) for t in texts], pa.string())
            cols["simhash"] = pa.array(
                [simhash64(t) for t in texts], pa.uint64()
            )
            from ..functions.hashing import winnow_min_per_doc

            cols["fingerprint_min"] = pa.array(
                winnow_min_per_doc(pa.array(texts, pa.string())),
                pa.uint64())
        out = batch
        for name, arr in cols.items():
            out = out.append_column(name, arr)
        return out


def text_stats_dataset(ds, text_column: str = "text", features=TextStatsStage.ALL):
    return ds.map_batches(
        TextStatsStage(text_column, features), batch_format="pyarrow"
    )


class RepetitionStage:
    """Adds Gopher-style repetition / layout quality columns (duplicate
    line & paragraph fractions, top-token fraction, bullet / ellipsis
    line fractions — see ``functions.repetition``), plus a boolean
    ``keep`` verdict against the default thresholds.  Stateless
    ``map_batches`` stage; fractions round to 6 decimals to match the
    SQL oracles bit-for-bit."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.repetition import (
            passes_repetition_filter,
            repetition_features,
        )

        texts = [t or "" for t in batch.column(self.text_column).to_pylist()]
        feats = [repetition_features(t) for t in texts]
        out = batch
        for name, typ in (("n_lines", pa.int64()), ("n_words", pa.int64())):
            out = out.append_column(
                name, pa.array([f[name] for f in feats], typ))
        for name in ("dup_line_frac", "dup_para_frac", "top_word_frac",
                     "bullet_line_frac", "ellipsis_line_frac"):
            out = out.append_column(
                name, pa.array([round(f[name], 6) for f in feats], pa.float64()))
        out = out.append_column(
            "keep", pa.array([passes_repetition_filter(f) for f in feats],
                             pa.bool_()))
        return out


def flat_split_words(col):
    """Vectorized :func:`functions.repetition.split_words` over a whole
    string column: Arrow RE2 split on the same ``[ \\t\\r\\n\\f]+``
    class, empties dropped — the per-occurrence work runs in C, never a
    Python loop over rows.  Returns ``(flat word StringArray, int64 doc
    index per word, n_docs)``; token stream per doc is byte-identical
    to ``split_words(t or "")``."""
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern_regex(
        pc.fill_null(col.cast(pa.string()), ""), "[ \t\r\n\f]+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    lens = (pc.list_value_length(lists)
            .to_numpy(zero_copy_only=False).astype(np.int64))
    flat = lists.flatten()
    keep = pc.not_equal(flat, "")
    words = flat.filter(keep)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64),
                       lens)[keep.to_numpy(zero_copy_only=False)]
    return words, doc_of, len(lens)


def _batch_gram_counts(batch: pa.Table, text_column: str, n: int):
    """Vectorized per-batch n-gram combiner shared by the exact and
    sketch top-gram plans: RE2 split + dictionary encode + an n-column
    Arrow group_by count.  Gram strings materialize once per DISTINCT
    batch gram.  Returns ``(gram StringArray, int64 count ndarray,
    total window count)``."""
    import numpy as np
    import pyarrow.compute as pc

    words, word_of, _ = flat_split_words(batch.column(text_column))
    nw = len(words)
    if nw < n:
        return pa.array([], pa.string()), np.empty(0, np.int64), 0
    enc = words.dictionary_encode()
    inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # window starts whose n tokens sit in ONE document
    starts = np.flatnonzero(word_of[:nw - n + 1] == word_of[n - 1:])
    if len(starts) == 0:
        return pa.array([], pa.string()), np.empty(0, np.int64), 0
    t = pa.table({f"c{j}": pa.array(inv[starts + j]) for j in range(n)})
    g = t.group_by([f"c{j}" for j in range(n)]).aggregate(
        [("c0", "count")])
    gram = pc.binary_join_element_wise(
        *[pc.take(enc.dictionary, g.column(f"c{j}")) for j in range(n)],
        " ")
    if isinstance(gram, pa.ChunkedArray):
        gram = gram.combine_chunks()
    counts = (g.column("c0_count").to_numpy(zero_copy_only=False)
              .astype(np.int64))
    return gram.cast(pa.string()), counts, len(starts)


def top_ngrams(ds, text_column: str = "text", *, n: int = 2, k: int = 20):
    """Corpus-wide top-k n-grams: the canonical pre-aggregated wide
    count.  Each batch emits PARTIAL (gram, n) counts (a local hash
    aggregation — the exchange ships vocabulary-sized partials, never
    one row per token occurrence), one ``groupby.sum`` merges them, a
    per-block local top-k prunes the sort input (safe AFTER the global
    sum), and a tiny (count desc, gram asc) sort yields a deterministic
    top-k even across ties.  The per-batch combiner is fully
    vectorized (Arrow RE2 split + dictionary encode + an n-column
    group_by count); gram strings materialize only once per DISTINCT
    batch gram via ``binary_join_element_wise``."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        gram, counts, _total = _batch_gram_counts(batch, text_column, n)
        return pa.table({"gram": gram,
                         "n": pa.array(counts, pa.int64())})

    def local_topk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(batch, sort_keys=[("n", "descending"),
                                                  ("gram", "ascending")])
        return batch.take(order[:k])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("gram")
                .aggregate(Sum("n", alias_name="n")))
    return (merged.map_batches(local_topk, batch_format="pyarrow")
                  .sort(["n", "gram"], descending=[True, False])
                  .limit(k))


def top_ngrams_sketch(ds, text_column: str = "text", *, n: int = 2,
                      k: int = 20, capacity: int = 4096):
    """Exact corpus-wide top-k n-grams WITHOUT a full-vocabulary
    shuffle: the heavy-hitters plan for the 100-TB regime where the
    distinct-gram vocabulary (trillions of shingles) dwarfs the result.

    Plan (Misra–Gries/SpaceSaving summaries + exact verification):

    1. Each batch counts locally, keeps only its ``capacity`` most
       frequent grams, and emits one stats row carrying (batch token
       total, max-dropped-count bound err_b).  The merge exchange is
       ≤ capacity × blocks rows — independent of vocabulary size.
    2. Any gram with true global count > T = Σ_b err_b must survive in
       at least one batch summary (if it survived nowhere, each batch
       counted it ≤ err_b).  Merged survivor counts are LOWER bounds L;
       candidates with L + T < L_k (the k-th largest lower bound) are
       provably outside the top-k and pruned before the driver gather.
    3. A second streaming pass exact-counts ONLY the surviving
       candidates (broadcast set, per-batch combiner, candidate-sized
       groupby).  If the k-th exact count > T the top-k is PROVABLY
       complete and exact (any non-candidate is ≤ T, strictly beaten),
       and ties resolve deterministically because every gram tied with
       the k-th is itself a candidate.
    4. Otherwise (flat distribution / capacity too small) fall back to
       the exact full-vocabulary :func:`top_ngrams` — the output is
       byte-identical either way, so the operator keeps a value-level
       SQL oracle while the sketch path never ships the long tail.
    """
    import numpy as np
    import pyarrow.compute as pc

    import ray as _ray

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        gram, counts, total = _batch_gram_counts(batch, text_column, n)
        if len(counts) > capacity:
            # keep the capacity most frequent (ties by ascending gram —
            # deterministic, unlike Counter.most_common's insertion
            # order; any valid kept-set keeps the err bound correct)
            order = pc.sort_indices(
                pa.table({"g": gram, "n": pa.array(counts)}),
                sort_keys=[("n", "descending"), ("g", "ascending")])
            keep = order[:capacity]
            gram = pc.take(gram, keep)
            counts = counts[keep.to_numpy(zero_copy_only=False)]
            err = int(counts.min())  # every dropped count ≤ smallest kept
        else:
            err = 0
        return pa.table({
            "gram": pa.concat_arrays([gram, pa.nulls(1, pa.string())]),
            "n": pa.array(list(counts) + [total], pa.int64()),
            "__err": pa.array([0] * len(counts) + [err], pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()

    T = 0
    for b in partials.iter_batches(batch_size=65_536,
                                   batch_format="pyarrow"):
        stats = b.filter(pc.is_null(b.column("gram")))
        T += int(pc.sum(stats.column("__err")).as_py() or 0)

    def survivors_only(b: pa.Table) -> pa.Table:
        return (b.filter(pc.is_valid(b.column("gram")))
                 .select(["gram", "n"]))

    merged = (partials.map_batches(survivors_only, batch_format="pyarrow")
                      .groupby("gram")
                      .aggregate(Sum("n", alias_name="n")))

    def local_topk(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch, sort_keys=[("n", "descending"),
                                                  ("gram", "ascending")])
        return batch.take(order[:k])

    top_lb = (merged.map_batches(local_topk, batch_format="pyarrow")
                    .sort(["n", "gram"], descending=[True, False])
                    .limit(k).take_all())
    if not top_lb:
        return merged.limit(0)
    L_k = top_lb[min(k, len(top_lb)) - 1]["n"]

    cand_parts = list(
        merged.filter(expr=f"n >= {L_k - T}")
              .iter_batches(batch_size=65_536, batch_format="pyarrow"))
    cand = (pc.unique(pa.concat_tables(cand_parts,
                                       promote_options="default")
                        .column("gram").combine_chunks())
            if cand_parts else pa.array([], pa.string()))
    cand_ref = _ray.put(cand)

    def exact_partial(batch: pa.Table) -> pa.Table:
        want = _ray.get(cand_ref)
        gram, counts, _total = _batch_gram_counts(batch, text_column, n)
        keep = pc.is_in(gram, value_set=want)
        return pa.table({"gram": gram.filter(keep),
                         "n": pa.array(counts[keep.to_numpy(
                             zero_copy_only=False)], pa.int64())})

    exact = (ds.map_batches(exact_partial, batch_format="pyarrow")
               .groupby("gram")
               .aggregate(Sum("n", alias_name="n"))
               .map_batches(local_topk, batch_format="pyarrow")
               .sort(["n", "gram"], descending=[True, False])
               .limit(k)
               .materialize())
    rows = exact.take_all()
    kth_exact = rows[-1]["n"] if len(rows) >= k else 0
    if kth_exact > T or T == 0:
        return exact
    # guarantee failed (flat distribution vs capacity): exact fallback
    return top_ngrams(ds, text_column, n=n, k=k)


def normalize_dataset(ds, text_column: str = "text",
                      out_column: str = "norm_text"):
    """Text normalization map (NFC → control-strip → whitespace-collapse,
    ``functions.normalize``): stateless, no exchange — the hygiene pass
    that runs before tokenization / hashing so dedup keys and token
    counts are stable across crawls."""
    from ..functions.normalize import normalize_text

    def norm(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_column).to_pylist()]
        out = [normalize_text(t) for t in texts]
        b = batch.append_column(out_column, pa.array(out, pa.string()))
        return b.append_column(
            "changed", pa.array([o != t for o, t in zip(out, texts)],
                                pa.bool_()))

    return ds.map_batches(norm, batch_format="pyarrow")


def grouped_rollup(ds, key_column: str, value_column: str, *,
                   names=("n_docs", "total", "vmax", "mean"),
                   mean_digits: int = 6):
    """Per-key (count, sum, max, mean) rollup with a per-batch Arrow
    combiner: each batch pre-aggregates key → partials so the global
    exchange ships one row per (key, batch) — at 100 TB the shuffle
    volume is keys×blocks, independent of corpus row count.  The mean is
    derived from the exact integer sum after the merge (never averaged
    across partials), so it is order-independent bit-for-bit."""
    from ray.data.aggregate import Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key_column, value_column])
        g = t.group_by([key_column]).aggregate(
            [(value_column, "count"), (value_column, "sum"),
             (value_column, "max")])
        return g.rename_columns([key_column, "pn", "psum", "pmax"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(key_column)
             .aggregate(Sum("pn", alias_name="pn"),
                        Sum("psum", alias_name="psum"),
                        Max("pmax", alias_name="pmax")))

    n_name, total_name, max_name, mean_name = names

    def fmt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.column("pn").cast(pa.int64())
        total = batch.column("psum").cast(pa.int64())
        mean = pc.round(pc.divide(total.cast(pa.float64()),
                                  n.cast(pa.float64())),
                        ndigits=mean_digits)
        return pa.table({key_column: batch.column(key_column),
                         n_name: n, total_name: total,
                         max_name: batch.column("pmax").cast(pa.int64()),
                         mean_name: mean})

    return agg.map_batches(fmt, batch_format="pyarrow")


def grouped_median(ds, key_column: str, value_column: str, *,
                   digits: int = 6, method: str = "auto",
                   exact_budget_rows: int = 2_000_000, bins: int = 4096):
    """Per-group median behind one partial/merge shape, plan-gated on
    the value domain (r3: the VERDICT continuous-domain fallback):

    - ``method="exact"``: value-histogram partials — each batch
      pre-aggregates (key, value) → count, one ``groupby.sum`` merges,
      and the exact median reads off the merged counts (mean of the two
      middle values for even group sizes — DuckDB ``median()``
      semantics).  The exchange ships histogram rows (keys × distinct
      values per block), never data rows; right for BOUNDED domains
      (lengths, scores, token counts).
    - ``method="hist"``: fixed-width binned sketch for continuous /
      unbounded domains — pass A computes per-key (lo, hi, n) bounds
      from tiny rollup partials, pass B histograms each batch into
      ``bins`` per-key buckets against the broadcast bounds, and the
      median interpolates within the crossing bucket (max error =
      (hi−lo)/bins per group).  Both exchanges are keys- or
      keys×bins-sized regardless of corpus cardinality.
    - ``method="auto"`` (default): run the exact merge, gate on its
      MERGED row count (distributed count, nothing on the driver);
      within ``exact_budget_rows`` → exact read-off, else fall back to
      the binned plan (one wasted histogram exchange — at known-
      continuous scale call ``method="hist"`` directly)."""
    from ray.data.aggregate import Sum

    import ray.data as rd

    if method not in ("auto", "exact", "hist"):
        raise ValueError(f"method={method!r}")
    if method == "hist":
        return _grouped_median_hist(ds, key_column, value_column,
                                    digits=digits, bins=bins)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key_column, value_column])
        g = t.group_by([key_column, value_column]).aggregate(
            [(value_column, "count")])
        return g.rename_columns([key_column, value_column, "n"])

    merged_ds = (ds.map_batches(partial, batch_format="pyarrow")
                   .groupby([key_column, value_column])
                   .aggregate(Sum("n", alias_name="n")))
    if method == "auto":
        merged_ds = merged_ds.materialize()
        if merged_ds.count() > exact_budget_rows:
            return _grouped_median_hist(ds, key_column, value_column,
                                        digits=digits, bins=bins)
    import numpy as np

    merged = merged_ds.to_pandas()
    merged = merged.sort_values([key_column, value_column])
    k = merged[key_column].to_numpy()
    if not len(k):
        return rd.from_arrow(pa.table({
            key_column: pa.array([]),
            "median": pa.array([], pa.float64()),
        }))
    vals = merged[value_column].to_numpy().astype(np.float64)
    starts, gc, base, totals = _group_rank_frames(k, merged["n"].to_numpy())
    # vectorized rank read-off: within-group rank r lives at the GLOBAL
    # cumsum position searchsorted(gc, base + r) — the target always
    # lands inside its own group because base < target <= group end
    odd = (totals % 2).astype(bool)
    t_hi = base + totals // 2 + 1
    t_lo = np.where(odd, t_hi, base + totals // 2)
    lo_v = vals[np.searchsorted(gc, t_lo)]
    hi_v = vals[np.searchsorted(gc, t_hi)]
    mids = np.where(odd, lo_v, (lo_v + hi_v) / 2.0)
    return rd.from_arrow(pa.table({
        key_column: pa.array(k[starts]),
        "median": pa.array([round(float(m), digits) for m in mids],
                           pa.float64()),
    }))


def _group_rank_frames(sorted_keys, counts):
    """Per-group rank frames over a (key, value, n) histogram ALREADY
    sorted by key: group start indices, the global count cumsum, the
    cumulative count before each group, and per-group totals — the
    inputs to the vectorized searchsorted rank read-off shared by
    :func:`grouped_median` and :func:`grouped_quantiles`."""
    import numpy as np

    k = sorted_keys
    cnt = counts.astype(np.int64)
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    ends = np.r_[starts[1:], len(k)]
    gc = np.cumsum(cnt)
    base = np.r_[0, gc[starts[1:] - 1]]
    totals = gc[ends - 1] - base
    return starts, gc, base, totals


def grouped_quantiles(ds, key_column: str, value_column: str, *,
                      qs=(0.25, 0.5, 0.75), digits: int = 6):
    """Exact per-group discrete quantiles behind the same
    value-histogram partial/merge shape as :func:`grouped_median`:
    quantile q = the element at rank max(1, ceil(q·n)) of the sorted
    group (DuckDB ``quantile_disc`` semantics — pinned empirically and
    by the SQL oracle).  Output is long-form (key, q, quantile).

    Scale shape: the exchange ships histogram rows (keys × distinct
    values per block), never data rows — right for bounded telemetry
    domains; for continuous domains start from
    ``grouped_median(method="hist")``'s binning and read off the same
    ranks with interpolation."""
    from ray.data.aggregate import Sum

    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key_column, value_column])
        g = t.group_by([key_column, value_column]).aggregate(
            [(value_column, "count")])
        return g.rename_columns([key_column, value_column, "n"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby([key_column, value_column])
                .aggregate(Sum("n", alias_name="n"))).to_pandas()
    merged = merged.sort_values([key_column, value_column])
    k = merged[key_column].to_numpy()
    if not len(k):
        return rd.from_arrow(pa.table({
            key_column: pa.array([]),
            "q": pa.array([], pa.float64()),
            "quantile": pa.array([], pa.float64()),
        }))
    import numpy as np

    vals = merged[value_column].to_numpy().astype(np.float64)
    starts, gc, base, totals = _group_rank_frames(k, merged["n"].to_numpy())
    qarr = np.asarray(list(qs), np.float64)
    # rank_q = max(1, ceil(q·n)) per (group, q); read all ranks off the
    # global cumsum in one searchsorted (key-major, q-minor output order)
    ranks = np.maximum(
        1, np.ceil(qarr[None, :] * totals[:, None]).astype(np.int64))
    idx = np.searchsorted(gc, base[:, None] + ranks)
    out_v = vals[idx].ravel()
    return rd.from_arrow(pa.table({
        key_column: pa.array(np.repeat(k[starts], len(qarr))),
        "q": pa.array(np.tile(qarr, len(starts)), pa.float64()),
        "quantile": pa.array([round(float(v), digits) for v in out_v],
                             pa.float64()),
    }))


def grouped_count_distinct(ds, key_column: str, value_column: str, *,
                           name: str = "n_distinct"):
    """Exact ``COUNT(DISTINCT value)`` per key, fully distributed: each
    batch emits its distinct (key, value) pairs (an Arrow group_by — no
    values repeated within a block leave it), ONE (key, value)-keyed
    exchange collapses cross-block duplicates, and a tiny key-keyed
    Count finishes.  Exchange volume = keys × distinct values per
    block, never data rows; nothing lands on the driver (the
    cardinality telemetry every corpus report needs — vocabulary sizes,
    hosts per TLD, lengths per language)."""
    from ray.data.aggregate import Count

    def partial(batch: pa.Table) -> pa.Table:
        return (batch.select([key_column, value_column])
                .group_by([key_column, value_column]).aggregate([]))

    def project_key(b: pa.Table) -> pa.Table:
        return b.select([key_column])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([key_column, value_column])
            .aggregate(Count(alias_name="__c"))
            .map_batches(project_key, batch_format="pyarrow")
            .groupby(key_column)
            .aggregate(Count(alias_name=name)))


def grouped_percent_rank(ds, key_column: str, value_column: str, *,
                         rank_column: str = "pct_rank", digits: int = 9,
                         max_table_rows: int = 5_000_000):
    """SQL ``percent_rank() OVER (PARTITION BY key ORDER BY value)`` as
    a streaming map — the per-group rank normalization step ("where does
    this doc sit within its language's length/quality distribution")
    that SQL engines express as a window function and a naive port would
    run as a per-group sort of the whole corpus.

    Plan: ONE value-histogram exchange (keys × distinct values per
    block — the grouped_quantiles partial; right for telemetry domains
    like lengths and rounded scores, the same boundedness assumption
    grouped_median documents), the merged (key, value) → (min-rank, n)
    table broadcasts once via ``ray.put``, and every corpus row gets
    ``(rank_min − 1) / (n − 1)`` through one vectorized hash-index
    lookup (pandas MultiIndex ``get_indexer`` — C hash path, no per-row
    Python).  Ties share the min rank (SQL RANK semantics);
    single-row groups get 0.0 (SQL convention).

    The broadcast table is keys × distinct values; ``max_table_rows``
    turns a continuous-domain misuse (every row a distinct float) into
    a loud contract error instead of a driver OOM — quantize/bin the
    value first (cf. ``grouped_median(method="hist")``) and rank the
    bins."""
    from ray.data.aggregate import Sum

    import ray as _ray

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key_column, value_column])
        g = t.group_by([key_column, value_column]).aggregate(
            [(value_column, "count")])
        return g.rename_columns([key_column, value_column, "n"])

    merged_ds = (ds.map_batches(partial, batch_format="pyarrow")
                 .groupby([key_column, value_column])
                 .aggregate(Sum("n", alias_name="n"))).materialize()
    n_rows = merged_ds.count()   # distributed — nothing gathered yet
    if n_rows > max_table_rows:
        raise ValueError(
            f"grouped_percent_rank: {n_rows} distinct (key, value) rows "
            f"exceed max_table_rows={max_table_rows}; quantize the value "
            "column first (see grouped_median method='hist')")
    merged = merged_ds.to_pandas()
    merged = merged.sort_values([key_column, value_column])
    import numpy as np
    import pandas as pd

    k = merged[key_column].to_numpy()
    if len(k):
        counts = merged["n"].to_numpy(dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        # min rank of each (key, value) = 1 + count of smaller values in
        # the group: global cumsum minus the group's running base
        cum = np.cumsum(counts)
        before = np.r_[0, cum[:-1]]
        group_base = np.repeat(before[starts],
                               np.diff(np.r_[starts, len(k)]))
        rank_min = before - group_base + 1
        group_n = np.repeat(np.add.reduceat(counts, starts),
                            np.diff(np.r_[starts, len(k)]))
        denom = np.maximum(group_n - 1, 1)
        pct = np.round((rank_min - 1) / denom, digits)
        pct[group_n == 1] = 0.0
        midx = pd.MultiIndex.from_arrays(
            [merged[key_column], merged[value_column]])
        table_ref = _ray.put((midx, pct))
    else:
        table_ref = _ray.put((None, None))

    def assign(b: pa.Table) -> pa.Table:
        midx_b, pct_b = _ray.get(table_ref)
        if midx_b is None:
            return b.append_column(rank_column,
                                   pa.nulls(b.num_rows, pa.float64()))
        keys = b.column(key_column).to_numpy(zero_copy_only=False)
        vals = b.column(value_column).to_numpy(zero_copy_only=False)
        pos = midx_b.get_indexer(
            pd.MultiIndex.from_arrays([keys, vals]))
        if (pos < 0).any():
            raise ValueError("(key, value) absent from rank table — "
                             "non-deterministic upstream?")
        return b.append_column(rank_column,
                               pa.array(pct_b[pos], pa.float64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def tier_by_global_quantiles(ds, value_column: str, *,
                             qs=(0.25, 0.5, 0.75), digits: int = 6,
                             tier_column: str = "tier"):
    """Assign every row a 1-based tier by GLOBAL quantile thresholds of
    ``value_column`` — the quality-tier bucketing step of a curation
    pipeline ("keep the top tier, route the middle to re-filtering").
    Threshold k = the quantile_disc value at ``qs[k]`` (rank =
    max(1, ceil(q·n)), same semantics as :func:`grouped_quantiles`);
    tier = 1 + number of thresholds strictly below the value, so
    value ≤ t₁ → tier 1, t₁ < value ≤ t₂ → tier 2, …, value > t_last →
    tier len(qs)+1 (SQL CASE/quantile_disc parity).

    Scale shape: ONE value-histogram exchange (distinct values per
    block, never rows) resolves all thresholds; the ≤len(qs) thresholds
    broadcast in the closure; tiering is a pure streaming searchsorted
    map.  No corpus shuffle."""
    import numpy as np

    const = "__all"

    def with_const(b: pa.Table) -> pa.Table:
        return pa.table({const: pa.array(np.zeros(b.num_rows, np.int8)),
                         value_column: b.column(value_column)})

    qt = grouped_quantiles(ds.map_batches(with_const,
                                          batch_format="pyarrow"),
                           const, value_column, qs=qs, digits=digits)
    thr = np.sort(np.array([r["quantile"] for r in qt.take_all()],
                           np.float64))

    def assign(b: pa.Table) -> pa.Table:
        v = b.column(value_column).to_numpy(zero_copy_only=False).astype(
            np.float64)
        tier = np.searchsorted(thr, v, side="left").astype(np.int64) + 1
        return b.append_column(tier_column, pa.array(tier, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def tier_by_group_quantiles(ds, key_column: str, value_column: str, *,
                            qs=(0.25, 0.5, 0.75), digits: int = 6,
                            tier_column: str = "tier"):
    """Per-group tier bucketing: like :func:`tier_by_global_quantiles`
    but thresholds are the quantile_disc values WITHIN each
    ``key_column`` group — the CCNet head/middle/tail routing step
    (Wenzek et al. 2020): per-language perplexity tertiles with
    ``qs=(1/3, 2/3)``, each document labeled by which third of its OWN
    language's distribution it falls in.  Tier semantics match the
    global variant (1 + number of group thresholds strictly below the
    value; ties collapse toward the low tier).

    Scale shape: one value-histogram exchange (:func:`grouped_quantiles`
    — keys × distinct values per block, never rows) resolves the
    groups × len(qs) threshold matrix; it broadcasts once via
    ``ray.put``; assignment is a streaming hash-indexer + comparison
    map.  No corpus shuffle."""
    import numpy as np
    import pandas as pd

    import ray as _ray

    pdf = (grouped_quantiles(ds, key_column, value_column,
                             qs=qs, digits=digits)
           .to_pandas().sort_values([key_column, "q"]))
    keys = pdf[key_column].to_numpy()
    if not len(keys):
        return ds.map_batches(
            lambda b: b.append_column(
                tier_column, pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow")
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    gkeys = pd.Index(keys[starts])
    thrmat = np.sort(
        pdf["quantile"].to_numpy(np.float64).reshape(len(gkeys), len(qs)),
        axis=1)
    thr_ref = _ray.put((gkeys, thrmat))

    def assign(b: pa.Table) -> pa.Table:
        gk, tm = _ray.get(thr_ref)
        kv = b.column(key_column).to_numpy(zero_copy_only=False)
        v = (b.column(value_column).to_numpy(zero_copy_only=False)
             .astype(np.float64))
        gidx = gk.get_indexer(kv)   # hash-based, vectorized in C
        if (gidx < 0).any():
            raise ValueError("group key absent from threshold table")
        tier = (v[:, None] > tm[gidx]).sum(axis=1).astype(np.int64) + 1
        return b.append_column(tier_column, pa.array(tier, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def _grouped_median_hist(ds, key_column: str, value_column: str, *,
                         digits: int, bins: int):
    """Binned per-group median sketch (see :func:`grouped_median`
    ``method="hist"``): per-key bounds from rollup partials, one
    broadcast, per-batch ``np.bincount`` histograms, within-bucket
    linear interpolation at read-off.  Max error (hi−lo)/bins."""
    import numpy as np

    import ray as _ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    def bounds_partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key_column, value_column])
        g = t.group_by([key_column]).aggregate(
            [(value_column, "min"), (value_column, "max"),
             (value_column, "count")])
        return g.rename_columns([key_column, "pmin", "pmax", "pn"])

    bounds = (ds.map_batches(bounds_partial, batch_format="pyarrow")
                .groupby(key_column)
                .aggregate(Min("pmin", alias_name="lo"),
                           Max("pmax", alias_name="hi"),
                           Sum("pn", alias_name="n"))).to_pandas()
    if not len(bounds):
        return rd.from_arrow(pa.table({key_column: pa.array([]),
                                       "median": pa.array([], pa.float64())}))
    bmap = {r[key_column]: (float(r["lo"]), float(r["hi"]))
            for _, r in bounds.iterrows()}
    bref = _ray.put(bmap)

    def hist_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        bm = _ray.get(bref)
        keys = batch.column(key_column).to_pylist()
        v = batch.column(value_column).to_numpy(zero_copy_only=False).astype(
            np.float64)
        ks = pd.Series(keys)
        lo = ks.map(lambda k: bm[k][0]).to_numpy()
        hi = ks.map(lambda k: bm[k][1]).to_numpy()
        span = np.where(hi > lo, hi - lo, 1.0)
        binned = np.clip(((v - lo) / span * bins).astype(np.int64),
                         0, bins - 1)
        t = pa.table({key_column: batch.column(key_column),
                      "bin": pa.array(binned, pa.int32())})
        g = t.group_by([key_column, "bin"]).aggregate([("bin", "count")])
        return g.rename_columns([key_column, "bin", "pn"])

    merged = (ds.map_batches(hist_partial, batch_format="pyarrow")
                .groupby([key_column, "bin"])
                .aggregate(Sum("pn", alias_name="pn"))).to_pandas()
    merged = merged.sort_values([key_column, "bin"])
    out_keys, out_med = [], []
    for key, grp in merged.groupby(key_column, sort=True):
        lo, hi = bmap[key]
        if hi <= lo:
            out_keys.append(key)
            out_med.append(round(lo, digits))
            continue
        width = (hi - lo) / bins
        b = grp["bin"].to_numpy()
        cnt = grp["pn"].to_numpy().astype(np.int64)
        cum = np.cumsum(cnt)
        total = int(cum[-1])

        def value_at(rank: float) -> float:
            i = int(np.searchsorted(cum, rank))
            before = int(cum[i - 1]) if i else 0
            frac = (rank - before) / cnt[i]
            return lo + width * (float(b[i]) + frac)

        if total % 2:
            mid = value_at((total + 1) / 2)
        else:
            mid = (value_at(total / 2) + value_at(total / 2 + 1)) / 2.0
        out_keys.append(key)
        out_med.append(round(min(max(mid, lo), hi), digits))
    return rd.from_arrow(pa.table({
        key_column: pa.array(out_keys),
        "median": pa.array(out_med, pa.float64()),
    }))


def hash_split(ds, key_column: str = "doc_id", *, test_pct: int = 10):
    """Deterministic held-out split: md5 of the stringified key maps each
    row to a stable [0, 100) bucket; rows under ``test_pct`` become
    'test'.  Pure map — no shuffle, no RNG state, reproducible across
    runs and engines (the SQL oracle computes the same md5 bucket)."""
    from ..functions.hashing import md5_hex

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column).to_pylist()
        buckets = [int(md5_hex(str(k))[:8], 16) % 100 for k in keys]
        return batch.append_column(
            "split", pa.array(["test" if b < test_pct else "train"
                               for b in buckets], pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def cap_per_group(ds, group_column: str, order_column: str, *,
                  n: int | dict = 100, tiebreak_column: str | None = None):
    """Per-group cap: keep the ``n`` smallest ``order_column`` rows per
    group (e.g. at most N documents per language/host — the standard
    anti-domination cap before training).  ``n`` may be a mapping
    {group: limit} for per-group quotas; groups absent from the mapping
    get limit 0 (dropped) — the quota-resampling form.

    The keep-set is keyed on the row's FULL sort key, so the cap is
    exact even when order values tie at the boundary: pass
    ``tiebreak_column`` (a unique row key, e.g. the doc id) whenever
    ``order_column`` can repeat — the sort and the keep key become
    (group, order, tiebreak) and exactly ``n`` rows survive per group
    (matching a ``row_number() OVER (ORDER BY order, tiebreak)`` SQL
    twin).  Without a tiebreak, a tie straddling the cap boundary is
    DETECTED at resolve time and raises (silently keeping every tied
    row would violate the n-rows contract).

    Scale shape: each batch pre-prunes to its local per-group top-n (an
    Arrow sort + vectorized run-length per-group head — batches never
    ship more than groups×n candidate rows), the tiny candidate union
    resolves the exact per-group keep-set once, and the keep-set
    broadcasts back as a packed-key ``pc.is_in`` filter (no per-row
    Python anywhere on the corpus path) over a second streaming pass.
    No corpus shuffle; the only exchange is candidates bounded by
    blocks×groups×n."""
    import pyarrow.compute as pc

    import ray as _ray

    if isinstance(n, dict):
        quotas = dict(n)
        limit_of = quotas.get
    else:
        limit_of = (lambda _g, _default=0, _n=n: _n)

    key_cols = [group_column, order_column] + (
        [tiebreak_column] if tiebreak_column else [])
    sort_keys = [(c, "ascending") for c in key_cols]
    check_ties = tiebreak_column is None

    def local_candidates(batch: pa.Table) -> pa.Table:
        t = batch.select(key_cols)
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        # a tie straddling the LOCAL prune boundary would be invisible
        # to the global resolve yet pass the keep-filter — the helper
        # detects it here, where the row still exists
        idx = _sorted_group_head_indices(
            t, group_column, order_column, limit_of, check_ties)
        return t.take(pa.array(idx))

    cand_batches = list(
        ds.map_batches(local_candidates, batch_format="pyarrow")
          .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not cand_batches:
        return ds
    cand = pa.concat_tables(cand_batches, promote_options="default")
    cand = cand.take(pc.sort_indices(cand, sort_keys=sort_keys))
    idx = _sorted_group_head_indices(
        cand, group_column, order_column, limit_of, check_ties)
    keep_packed = _pack_key_columns(cand.take(pa.array(idx)), key_cols)
    keep_ref = _ray.put(keep_packed)

    def filt(batch: pa.Table) -> pa.Table:
        kset = _ray.get(keep_ref)
        mask = pc.is_in(_pack_key_columns(batch, key_cols), value_set=kset)
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


def _pack_key_columns(t: pa.Table, key_cols: list) -> pa.Array:
    """Injective vectorized pack of a composite key into ONE string
    column: each part is emitted as ``nullflag:length:value`` and the
    parts joined, so no separator collision ("a:b"+"c" vs "a"+"b:c")
    and no null ambiguity (None ≠ "None") can alias two distinct keys.
    Applied identically to both sides of a broadcast semijoin, the
    packed column turns a per-row Python tuple-membership loop into a
    single ``pc.is_in`` kernel."""
    import pyarrow.compute as pc

    parts = []
    for c in key_cols:
        col = t.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        nullflag = pc.cast(pc.cast(pc.is_null(col), pa.int8()), pa.string())
        s = pc.fill_null(pc.cast(col, pa.string()), "")
        length = pc.cast(pc.utf8_length(s), pa.string())
        parts.extend([nullflag, length, s])
    if len(parts) == 3 and t.num_rows == 0:
        return pa.array([], pa.string())
    return pc.binary_join_element_wise(*parts, ":")


def _sorted_group_head_indices(t: pa.Table, group_column: str,
                               order_column: str, limit_of,
                               check_ties: bool):
    """Row indices of the per-group head of an ALREADY-SORTED table:
    for each run of equal ``group_column`` values keep the first
    ``limit_of(group)`` rows.  Fully vectorized — run boundaries via a
    shifted not-equal, range expansion via repeat/cumsum — with one
    Python call per RUN (for the limit lookup), never per row.  With
    ``check_ties`` set, raises if an ``order_column`` tie straddles a
    cut boundary (the cap would silently violate its n-rows contract)."""
    import numpy as np
    import pyarrow.compute as pc

    n_rows = t.num_rows
    if n_rows == 0:
        return np.empty(0, np.int64)
    g = t.column(group_column)
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    if n_rows == 1:
        starts = np.array([0], np.int64)
    else:
        a, b = g.slice(1), g.slice(0, n_rows - 1)
        ne = pc.fill_null(pc.not_equal(a, b), True)
        both_null = pc.and_(pc.is_null(a), pc.is_null(b))
        boundary = pc.and_(ne, pc.invert(both_null))
        starts = np.flatnonzero(
            np.r_[True, boundary.to_numpy(zero_copy_only=False)])
    ends = np.r_[starts[1:], n_rows]
    run_groups = g.take(pa.array(starts)).to_pylist()
    lims = np.fromiter((max(int(limit_of(rg, 0) or 0), 0)
                        for rg in run_groups), np.int64, len(run_groups))
    cuts = np.minimum(starts + lims, ends)
    if check_ties:
        mid = (starts < cuts) & (cuts < ends)
        if mid.any():
            o = t.column(order_column)
            if isinstance(o, pa.ChunkedArray):
                o = o.combine_chunks()
            c = cuts[mid]
            eq = pc.fill_null(
                pc.equal(o.take(pa.array(c)), o.take(pa.array(c - 1))),
                False).to_numpy(zero_copy_only=False)
            if eq.any():
                bad = int(np.flatnonzero(mid)[np.flatnonzero(eq)[0]])
                raise ValueError(
                    f"cap_per_group: order ties at the cap boundary in "
                    f"group {run_groups[bad]!r} "
                    f"(order={o[int(cuts[bad])].as_py()!r}); pass a unique "
                    "tiebreak_column to make the n-rows-per-group cap exact")
    lens = cuts - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    offsets = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    return np.repeat(starts, lens) + offsets


def sample_per_group(ds, group_column: str, key_column: str, *, n: int = 100):
    """Deterministic uniform per-group sample: keep the ``n`` rows with
    the smallest md5(key) per group ("bottom-k by hash" — an unbiased
    uniform sample that needs no RNG state and is reproducible across
    engines).  Same scale shape as :func:`cap_per_group` (local prune →
    bounded candidates → broadcast keep-set), just ordered by the key's
    hash instead of the key."""
    from ..functions.hashing import md5_hex

    def add_rank(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column).to_pylist()
        return batch.append_column(
            "__rank", pa.array([md5_hex(str(k)) for k in keys], pa.string()))

    ranked = ds.map_batches(add_rank, batch_format="pyarrow")
    capped = cap_per_group(ranked, group_column, "__rank", n=n,
                           tiebreak_column=key_column)
    return capped.drop_columns(["__rank"])


def quota_sample(ds, group_column: str, key_column: str, *,
                 quotas: dict[str, int]):
    """Resample a corpus to a target group mix (domain/language mixing —
    the step that turns a crawl's natural skew into a training
    distribution): per group ``g`` keep the ``quotas[g]`` rows with the
    smallest md5(key); a group smaller than its quota is kept whole
    (no upsampling), and groups absent from ``quotas`` are dropped.

    Deterministic and RNG-free (bottom-k by hash = uniform without
    replacement), so the same quotas reproduce the same corpus across
    runs and engines — and the SQL twin is a window ``row_number() <=
    CASE group ...``.  Scale shape inherited from :func:`cap_per_group`:
    local per-batch prune → bounded candidate union → broadcast
    keep-set; the keep-set is ≤ sum(quotas) rows, which for training
    mixes is the (small) target corpus itself."""
    from ..functions.hashing import md5_hex

    def add_rank(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column).to_pylist()
        return batch.append_column(
            "__rank", pa.array([md5_hex(str(k)) for k in keys], pa.string()))

    ranked = ds.map_batches(add_rank, batch_format="pyarrow")
    capped = cap_per_group(ranked, group_column, "__rank", n=quotas,
                           tiebreak_column=key_column)
    return capped.drop_columns(["__rank"])


def temperature_sample(ds, group_column: str, key_column: str, *,
                       budget: int, alpha: float = 0.5,
                       round_digits: int = 9):
    """Temperature-scaled mixture sampling (the standard multilingual /
    multi-domain rebalancing rule, e.g. mBERT/XLM-R's ``p_g ∝ n_g^α``):
    the per-group keep budgets are derived FROM the corpus's own group
    counts — ``quota_g = floor(budget · n_g^α / Σ_h n_h^α)`` — so a
    single ``alpha`` dial flattens (α<1) or sharpens (α>1) the natural
    skew instead of hand-writing a quota table.  Rows within each group
    are then kept bottom-k-by-md5 exactly as :func:`quota_sample`.

    Determinism across engines: for the default ``α=0.5`` the weight is
    computed with ``sqrt`` (IEEE-754 correctly rounded in both numpy/
    libm and SQL engines, unlike general ``pow``), and the ratio is
    rounded to ``round_digits`` decimals before the floor so last-ulp
    summation-order noise in the (groups-sized) denominator cannot flip
    a quota.

    Scale shape: ONE groups×blocks partial-count exchange for the group
    histogram, a groups-bounded driver gather to derive the quota
    table (training mixes have at most thousands of groups), then the
    :func:`cap_per_group` broadcast keep-set machinery — the corpus
    itself is never shuffled."""
    import math

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.select([group_column])
             .group_by([group_column])
             .aggregate([(group_column, "count")]))
        return g.rename_columns([group_column, "pn"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(group_column)
                .aggregate(Sum("pn", alias_name="n")))
    rows = sorted((r[group_column], int(r["n"])) for r in merged.take_all())
    if not rows:
        return ds.limit(0)
    if alpha == 0.5:
        weights = [math.sqrt(n) for _, n in rows]
    else:
        weights = [float(n) ** alpha for _, n in rows]
    den = 0.0
    for w in weights:  # left-to-right in sorted-group order (pinned)
        den += w
    quotas = {g: int(math.floor(round(budget * w / den, round_digits)))
              for (g, _), w in zip(rows, weights)}
    return quota_sample(ds, group_column, key_column, quotas=quotas)


def grouped_mode(ds, key_column: str, value_column: str, *,
                 name: str = "mode_value", count_name: str = "n",
                 num_buckets: int = 64):
    """Exact per-key MODE (most frequent value, ties broken by the
    smallest value — fully deterministic): the categorical analogue of
    :func:`grouped_median`, e.g. the dominant source/content-type/TLD
    per language in a corpus report.

    Scale shape: each batch pre-aggregates (key, value) → partial count
    (the exchange ships distinct pairs, never rows), one
    ``groupby.sum`` merges them, and the per-key argmax runs inside
    hash(key)-coarse buckets (``num_buckets`` Python group calls TOTAL,
    independent of key cardinality — the repo's no-group-per-key rule).
    Inside a bucket: one Arrow sort by (key asc, n desc, value asc) and
    a vectorized run-length pass — the first row of each key run IS the
    mode."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64

    def pair_partial(batch: pa.Table) -> pa.Table:
        g = (batch.select([key_column, value_column])
             .group_by([key_column, value_column])
             .aggregate([(value_column, "count")]))
        return g.rename_columns([key_column, value_column, "pn"])

    merged = (ds.map_batches(pair_partial, batch_format="pyarrow")
                .groupby([key_column, value_column])
                .aggregate(Sum("pn", alias_name="__n")))

    def bucket(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column).to_pylist()
        pb = pa.array([stable_hash64(str(k)) % num_buckets for k in keys],
                      pa.int32())
        return batch.append_column("__pb", pb)

    def bucket_argmax(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return pa.table({key_column: pa.array([], pa.string()),
                             name: pa.array([], pa.string()),
                             count_name: pa.array([], pa.int64())})
        order = pc.sort_indices(
            t, sort_keys=[(key_column, "ascending"),
                          ("__n", "descending"),
                          (value_column, "ascending")])
        t = t.take(order)
        k = t.column(key_column)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        if t.num_rows == 1:
            starts = np.array([0], np.int64)
        else:
            ne = pc.fill_null(
                pc.not_equal(k.slice(1), k.slice(0, len(k) - 1)), True)
            starts = np.flatnonzero(
                np.r_[True, ne.to_numpy(zero_copy_only=False)])
        head = pa.array(starts)
        return pa.table({
            key_column: k.take(head),
            name: t.column(value_column).take(head),
            count_name: pc.cast(t.column("__n").take(head), pa.int64()),
        })

    return (merged.map_batches(bucket, batch_format="pyarrow")
                  .groupby("__pb")
                  .map_groups(bucket_argmax, batch_format="pyarrow"))


def corpus_sample(ds, key_column: str, *, n: int = 1000):
    """Global deterministic uniform sample: keep the ``n`` rows with the
    smallest md5(key) across the WHOLE corpus (the RNG-free analogue of
    ``ds.random_sample`` — reproducible across runs, engines, and
    cluster sizes, which per-block RNG sampling is not).

    Scale shape: each batch prunes locally to its bottom-n hashes, so
    the global resolve sees ≤ blocks×n candidate rows and the final
    keep-set is exactly ``n`` — both independent of corpus size; the
    keep-set broadcasts back as a second streaming filter pass."""
    from ..functions.hashing import md5_hex

    def add_rank(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column).to_pylist()
        rank = [md5_hex(str(k)) for k in keys]
        grp = pa.array([0] * len(keys), pa.int32())
        b = batch.append_column("__rank", pa.array(rank, pa.string()))
        return b.append_column("__all", grp)

    ranked = ds.map_batches(add_rank, batch_format="pyarrow")
    capped = cap_per_group(ranked, "__all", "__rank", n=n,
                           tiebreak_column=key_column)
    return capped.drop_columns(["__rank", "__all"])


def _gumbel_scores(keys, weights, digits: int) -> list:
    """Hash-Gumbel sampling scores: w − ln(−ln(u)) with u derived from
    md5(key) — shared by the global and per-group weighted samplers."""
    import math

    from ..functions.hashing import md5_hex

    out = []
    for kk, ww in zip(keys, weights):
        u = (int(md5_hex(str(kk))[:8], 16) + 0.5) / 4294967296.0
        out.append(round(float(ww) - math.log(-math.log(u)), digits))
    return out


def weighted_sample_per_group(ds, group_column: str, key_column: str,
                              weight_column: str, *, n: int,
                              digits: int = 6):
    """Per-group deterministic weighted sampling without replacement:
    the ``n`` highest hash-Gumbel scores (w − ln(−ln(u))) per group —
    per-language/domain importance sampling, RNG-free.  Composition:
    one scoring map, then the tiebreak-exact :func:`cap_per_group`
    keep-set machinery on the NEGATED score (cap keeps the smallest
    order values; ties break by the unique key, matching a
    ``row_number() OVER (PARTITION BY g ORDER BY s DESC, key)`` SQL
    twin)."""
    def score(batch: pa.Table) -> pa.Table:
        s = _gumbel_scores(batch.column(key_column).to_pylist(),
                           batch.column(weight_column).to_pylist(), digits)
        b = batch.append_column("sample_score", pa.array(s, pa.float64()))
        return b.append_column("__neg",
                               pa.array([-v for v in s], pa.float64()))

    scored = ds.map_batches(score, batch_format="pyarrow")
    kept = cap_per_group(scored, group_column, "__neg", n=n,
                         tiebreak_column=key_column)
    return kept.drop_columns(["__neg"])


def weighted_sample(ds, key_column: str, weight_column: str, *,
                    k: int, digits: int = 6):
    """Deterministic weighted sampling WITHOUT replacement: the
    Efraimidis–Spirakis / Gumbel-top-k scheme with the randomness
    replaced by a hash — score = w + Gumbel(u) = w − ln(−ln(u)) with
    u = (md5(key)[:8] + 0.5) / 2³², take the global top-``k`` by
    (score desc, key asc).  This is how importance weights (DSIR,
    quality scores, perplexity) become an actual resampled corpus,
    reproducible across runs, engines, and cluster sizes — per-key
    hash-Gumbel keys are RNG-free, so the SQL twin computes the exact
    same scores.

    Scale shape: one streaming map adds the score, each block prunes to
    its local top-k, and a tiny (score desc, key asc) global sort of
    ≤ k×blocks rows finishes — the ``brute_topk`` prune-before-sort
    shape; no corpus sort, no RNG state."""
    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = _gumbel_scores(batch.column(key_column).to_pylist(),
                           batch.column(weight_column).to_pylist(), digits)
        t = batch.append_column("sample_score",
                                pa.array(s, pa.float64()))
        order = pc.sort_indices(
            t, sort_keys=[("sample_score", "descending"),
                          (key_column, "ascending")])
        return t.take(order[:k])

    return (ds.map_batches(score, batch_format="pyarrow")
              .sort(["sample_score", key_column],
                    descending=[True, False])
              .limit(k))


def token_budget_sample(ds, group_column: str, key_column: str, *,
                        budgets: dict, text_column: str = "text",
                        bucket_hex: int = 4):
    """Per-group TOKEN-budget sampling: fill each group's quota in
    deterministic md5(key) order, keeping every document whose
    preceding cumulative token count is still below ``budgets[group]``
    (the greedy fill — the crossing document is kept; groups absent
    from ``budgets`` are dropped).  Training mixes are specified in
    tokens, not documents — this is the operator that turns "30 B
    tokens of code, 5 B of forums" into a concrete corpus, RNG-free
    and reproducible across engines and cluster sizes.

    Scale shape (exact, no corpus sort): the bucket id is the rank's
    first ``bucket_hex`` hex chars — a PREFIX, so bucket order ==
    md5-rank order (a modulo would destroy the correspondence) — and
    md5 uniformity spreads docs evenly over the 16^``bucket_hex``
    buckets.  Phase 1 histograms per-(group, bucket) token sums — a
    ≤ groups×16^bucket_hex exchange — and the driver prefix-sums the
    tiny bucket table to find each group's BOUNDARY bucket.  Phase 2
    collects only the boundary buckets' (rank, key, tokens) rows
    (~16^-bucket_hex of the corpus) and resolves the exact crossing
    document locally.  The keep rule broadcasts as {group: (boundary
    bucket, boundary keep-set)} and one streaming filter pass
    finishes.  The SQL twin is a window cumulative sum."""
    import pyarrow.compute as pc

    import ray as _ray

    from ..functions.hashing import md5_hex

    def annotate(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column).to_pylist()
        ranks = [md5_hex(str(k)) for k in keys]
        bkt = [int(r[:bucket_hex], 16) for r in ranks]
        toks = [len((t or "").split())
                for t in batch.column(text_column).to_pylist()]
        b = batch.append_column("__rank", pa.array(ranks, pa.string()))
        b = b.append_column("__bkt", pa.array(bkt, pa.int32()))
        return b.append_column("__tok", pa.array(toks, pa.int64()))

    annotated = ds.map_batches(annotate, batch_format="pyarrow")

    def hist_partial(b: pa.Table) -> pa.Table:
        t = b.select([group_column, "__bkt", "__tok"])
        g = t.group_by([group_column, "__bkt"]).aggregate([("__tok", "sum")])
        return g.rename_columns([group_column, "__bkt", "ptok"])

    hist_batches = list(
        annotated.map_batches(hist_partial, batch_format="pyarrow")
                 .iter_batches(batch_size=None, batch_format="pyarrow"))
    if not hist_batches:
        return ds.filter(lambda _r: False)
    hist = (pa.concat_tables(hist_batches, promote_options="default")
              .group_by([group_column, "__bkt"]).aggregate([("ptok", "sum")])
              .rename_columns([group_column, "__bkt", "tok"]))
    order = pc.sort_indices(hist, sort_keys=[(group_column, "ascending"),
                                             ("__bkt", "ascending")])
    hist = hist.take(order)
    gcol = hist.column(group_column).to_pylist()
    bcol = hist.column("__bkt").to_pylist()
    tcol = hist.column("tok").to_pylist()
    # per group: full buckets (every doc's token prefix < budget, so all
    # kept) + at most ONE boundary bucket where the budget crosses
    full_until: dict = {}     # group -> first bucket id NOT fully kept
    boundary: dict = {}       # group -> (bucket id, tokens_before_bucket)
    i = 0
    while i < len(gcol):
        g = gcol[i]
        budget = budgets.get(g, 0)
        cum = 0
        fu = 0
        j = i
        while j < len(gcol) and gcol[j] == g:
            if cum + tcol[j] <= budget:
                cum += tcol[j]          # bucket fully kept
                fu = bcol[j] + 1
                j += 1
                continue
            if cum < budget:            # budget crosses INSIDE this bucket
                boundary[g] = (bcol[j], cum)
                fu = bcol[j]
            break
        full_until[g] = fu
        while j < len(gcol) and gcol[j] == g:
            j += 1
        i = j

    bref = _ray.put((full_until, {g: b for g, (b, _c) in boundary.items()}))

    def boundary_rows(b: pa.Table) -> pa.Table:
        fu, bb = _ray.get(bref)
        g = b.column(group_column).to_pylist()
        k = b.column("__bkt").to_pylist()
        mask = pa.array([bb.get(gg, -1) == kk for gg, kk in zip(g, k)],
                        pa.bool_())
        return (b.filter(mask)
                 .select([group_column, "__rank", key_column, "__tok"]))

    bnd_batches = list(
        annotated.map_batches(boundary_rows, batch_format="pyarrow")
                 .iter_batches(batch_size=None, batch_format="pyarrow"))
    keep_keys: dict = {}
    if bnd_batches:
        bnd = pa.concat_tables(bnd_batches, promote_options="default")
        bnd = bnd.take(pc.sort_indices(
            bnd, sort_keys=[(group_column, "ascending"),
                            ("__rank", "ascending"),
                            (key_column, "ascending")]))
        bg = bnd.column(group_column).to_pylist()
        bk = bnd.column(key_column).to_pylist()
        bt = bnd.column("__tok").to_pylist()
        cum_g: dict = {}
        for g, k, t in zip(bg, bk, bt):
            before = cum_g.get(g, boundary.get(g, (None, 0))[1])
            if before < budgets.get(g, 0):
                keep_keys.setdefault(g, set()).add(k)
            cum_g[g] = before + t

    kref = _ray.put((full_until, {g: b for g, (b, _c) in boundary.items()},
                     keep_keys))

    def final_filter(b: pa.Table) -> pa.Table:
        fu, bb, kk = _ray.get(kref)
        g = b.column(group_column).to_pylist()
        bkt = b.column("__bkt").to_pylist()
        keys = b.column(key_column).to_pylist()
        mask = []
        for gg, bk_, key in zip(g, bkt, keys):
            bnd_b = bb.get(gg)
            if bnd_b is not None and bk_ == bnd_b:
                mask.append(key in kk.get(gg, ()))
            else:
                mask.append(bk_ < fu.get(gg, 0))
        return (b.filter(pa.array(mask, pa.bool_()))
                 .drop_columns(["__rank", "__bkt", "__tok"]))

    return annotated.map_batches(final_filter, batch_format="pyarrow")


def grouped_string_agg(ds, key_column: str, value_column: str, *,
                       sep: str = "|", num_buckets: int = 64,
                       count_column: str = "n", agg_column: str = "values"):
    """Scale-safe per-key string aggregation: one row per distinct key
    with (total occurrence count, distinct values sorted + joined by
    ``sep``) — the "GROUP BY key, string_agg(DISTINCT value)" primitive
    (anchor-text aggregation per link target, per-host URL rollups).

    Scale shape (no per-key Python group calls — the r3 VERDICT rule
    "never one group per key" applied to string aggregation): each
    batch pre-aggregates (key, value) → partial count so the exchange
    ships DISTINCT pairs, one ``groupby.sum`` merges them, and the
    final per-key rollup runs inside hash(key)-coarse buckets
    (``num_buckets`` groups TOTAL, independent of key cardinality).
    Inside a bucket every step is a vectorized kernel: Arrow sort →
    run-length boundaries → ``np.add.reduceat`` for the counts →
    ``ListArray.from_arrays`` + ``pc.binary_join`` for the joined
    strings.  Values within a key are already distinct after the merge,
    so the list slice per key IS the sorted distinct set."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key_column, value_column])
        g = t.group_by([key_column, value_column]).aggregate(
            [(value_column, "count")])
        return g.rename_columns([key_column, value_column, "pn"])

    merged = (ds.map_batches(pair_partial, batch_format="pyarrow")
                .groupby([key_column, value_column])
                .aggregate(Sum("pn", alias_name="__n")))

    def bucket(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_column).to_pylist()
        pb = pa.array([stable_hash64(str(k)) % num_buckets for k in keys],
                      pa.int32())
        return batch.append_column("__pb", pb)

    def bucket_agg(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return pa.table({
                key_column: pa.array([], pa.string()),
                count_column: pa.array([], pa.int64()),
                agg_column: pa.array([], pa.string()),
            })
        order = pc.sort_indices(
            t, sort_keys=[(key_column, "ascending"),
                          (value_column, "ascending")])
        t = t.take(order)
        k = t.column(key_column)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        v = t.column(value_column)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        n = t.column("__n").to_numpy(zero_copy_only=False).astype(np.int64)
        ne = pc.fill_null(pc.not_equal(k.slice(1), k.slice(0, len(k) - 1)),
                          True)
        new_run = np.r_[True, ne.to_numpy(zero_copy_only=False)]
        starts = np.flatnonzero(new_run)
        counts = np.add.reduceat(n, starts)
        offsets = pa.array(np.r_[starts, len(k)].astype(np.int32),
                           pa.int32())
        joined = pc.binary_join(pa.ListArray.from_arrays(offsets, v), sep)
        return pa.table({
            key_column: k.take(pa.array(starts)),
            count_column: pa.array(counts, pa.int64()),
            agg_column: joined,
        })

    return (merged.map_batches(bucket, batch_format="pyarrow")
                  .groupby("__pb")
                  .map_groups(bucket_agg, batch_format="pyarrow"))


def char_entropy(ds, text_column: str = "text", *,
                 id_column: str = "doc_id", digits: int = 6):
    """Per-document character-distribution Shannon entropy (nats) — the
    classic cheap detector for OCR garbage, base64 blobs and
    key-mashing (too HIGH) vs repeated-character padding (too LOW) that
    complements the word-level repetition signals.

    Fully vectorized, zero exchanges: each batch views its concatenated
    text as utf-32 codepoints, counts (doc, codepoint) pairs with ONE
    ``np.unique`` over packed int64 keys, and folds
    ``−Σ p·ln p`` per doc via ``np.add.reduceat`` at the doc boundaries
    of the sorted key space.  Rounded to ``digits`` so cross-engine
    summation-order ulps cancel (the SQL twin sums in arbitrary
    order)."""
    import numpy as np

    def ent(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_column).to_pylist()]
        lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
        out = np.zeros(len(texts), np.float64)
        if lens.sum():
            cp = np.frombuffer("".join(texts).encode("utf-32-le"),
                               np.uint32).astype(np.int64)
            doc = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
            key = doc * 0x110000 + cp
            uniq, cnt = np.unique(key, return_counts=True)
            udoc = uniq // 0x110000
            p = cnt / lens[udoc]
            terms = p * np.log(p)
            starts = np.flatnonzero(np.r_[True, udoc[1:] != udoc[:-1]])
            sums = -np.add.reduceat(terms, starts)
            out[udoc[starts]] = np.round(sums, digits)
        # -0.0 → 0.0 (single-repeated-char docs: p=1, ln 1 = 0)
        out[out == 0.0] = 0.0
        return pa.table({
            id_column: batch.column(id_column),
            "entropy": pa.array(out, pa.float64()),
            "n_chars_text": pa.array(lens, pa.int64()),
        })

    return ds.map_batches(ent, batch_format="pyarrow")


def decontaminate(ds, text_column: str = "text", *, contaminated,
                  n: int = 13):
    """Benchmark decontamination: drop every document whose text contains
    ANY n-gram from the ``contaminated`` set (the standard pre-training
    hygiene pass against eval-set leakage).

    Scale shape: the contaminated set is eval-benchmark-sized (small by
    construction), so it broadcasts ONCE via ``ray.put`` as a frozenset
    and the corpus streams through a single ``map_batches`` membership
    filter — no shuffle, no join."""
    import ray as _ray

    from ..functions.repetition import split_words

    ref = _ray.put(frozenset(contaminated))

    def keep(batch: pa.Table) -> pa.Table:
        bad = _ray.get(ref)
        mask = []
        for t in batch.column(text_column).to_pylist():
            ws = split_words(t or "")
            hit = any(" ".join(ws[i:i + n]) in bad
                      for i in range(len(ws) - n + 1))
            mask.append(not hit)
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def contamination_scores(ds, text_column: str = "text", *, contaminated,
                         n: int = 13):
    """Scored benchmark-contamination: instead of :func:`decontaminate`'s
    boolean drop, annotate every document with how MUCH of it overlaps
    the eval set — ``n_grams`` (positional n-gram count), ``n_hits``
    (positions whose n-gram is in the contaminated set), and
    ``contamination_frac = n_hits / n_grams`` (round-6; 0.0 for
    too-short documents).  The graded signal is what threshold-tuning
    and leakage reports need; the hard filter is the frac > 0 cut.

    Scale shape: identical to :func:`decontaminate` — the eval-sized
    set broadcasts once via ``ray.put``, the corpus streams through one
    ``map_batches``, no shuffle.  Reference has no analogue
    (decontamination is brief-scope); the boolean twin cites
    llm-food's hygiene gap."""
    import ray as _ray

    from ..functions.repetition import split_words

    ref = _ray.put(frozenset(contaminated))

    def score(batch: pa.Table) -> pa.Table:
        bad = _ray.get(ref)
        n_grams, n_hits, frac = [], [], []
        for t in batch.column(text_column).to_pylist():
            ws = split_words(t or "")
            total = max(len(ws) - n + 1, 0)
            hits = sum(1 for i in range(total)
                       if " ".join(ws[i:i + n]) in bad)
            n_grams.append(total)
            n_hits.append(hits)
            frac.append(round(hits / total, 6) if total else 0.0)
        return (batch.append_column("n_grams", pa.array(n_grams, pa.int64()))
                     .append_column("n_hits", pa.array(n_hits, pa.int64()))
                     .append_column("contamination_frac",
                                    pa.array(frac, pa.float64())))

    return ds.map_batches(score, batch_format="pyarrow")


def top_k_per_group(ds, group_column: str, order_column: str,
                    tiebreak_column: str, *, k: int = 10,
                    num_buckets: int = 64):
    """Per-group top-k with an explicit 1-based rank — the
    ``row_number() OVER (PARTITION BY g ORDER BY v DESC, id ASC) <= k``
    window analogue, descending (largest values win).

    → Dataset (group, tiebreak, order, rank) — the winners ARE the
    output; nothing else ships.

    Scale shape (fully distributed, unlike :func:`cap_per_group`'s
    broadcast keep-set — top-k needs no second corpus pass because the
    result rows are exactly the resolved candidates): each block
    locally prunes to its own per-group top-k (one Arrow sort + the
    shared run-length head helper — a block never emits more than
    groups-in-block × k rows), the pruned candidates take ONE coarse
    hash(group)-bucketed exchange, and each bucket resolves its groups'
    exact top-k and ranks with the same vectorized sweep.  No driver
    materialization, no per-group Python groups, group cardinality
    unbounded."""
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.dedup import _fingerprint128

    key_cols = [group_column, order_column, tiebreak_column]
    sort_keys = [(group_column, "ascending"), (order_column, "descending"),
                 (tiebreak_column, "ascending")]
    limit_of = (lambda _g, _default=0, _k=k: _k)

    def local_candidates(batch: pa.Table) -> pa.Table:
        t = batch.select(key_cols)
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        idx = _sorted_group_head_indices(
            t, group_column, order_column, limit_of, False)
        return t.take(pa.array(idx))

    def add_bucket(batch: pa.Table) -> pa.Table:
        hi, _lo = _fingerprint128(batch.column(group_column))
        buck = (hi % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("__gb", pa.array(buck))

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.select(key_cols)
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        idx = _sorted_group_head_indices(
            t, group_column, order_column, limit_of, False)
        out = t.take(pa.array(idx))
        # 1-based rank within group over the kept (already sorted) rows
        n = out.num_rows
        g = out.column(group_column)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        if n == 0:
            rank = np.empty(0, np.int64)
        elif n == 1:
            rank = np.ones(1, np.int64)
        else:
            a, b = g.slice(1), g.slice(0, n - 1)
            ne = pc.fill_null(pc.not_equal(a, b), True)
            both_null = pc.and_(pc.is_null(a), pc.is_null(b))
            boundary = pc.and_(ne, pc.invert(both_null))
            starts_mask = np.r_[True,
                                boundary.to_numpy(zero_copy_only=False)]
            starts = np.flatnonzero(starts_mask)
            seg = np.maximum.accumulate(
                np.where(starts_mask, np.arange(n, dtype=np.int64), 0))
            rank = np.arange(n, dtype=np.int64) - seg + 1
        return out.append_column("rank", pa.array(rank))

    return (ds.map_batches(local_candidates, batch_format="pyarrow")
              .map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__gb")
              .map_groups(per_bucket, batch_format="pyarrow"))


def top_pmi_pairs(ds, text_column: str = "text", *, window: int = 2,
                  k: int = 20, min_count: int = 5, digits: int = 6):
    """Corpus-wide top-k PMI word pairs (the collocation detector):
    a co-occurrence EVENT is an unordered token pair at distance
    1..``window`` within a document (canonical order a ≤ b), and

        pmi(a,b) = round(ln((c_ab·N·N) / (P·c_a·c_b)), digits)

    with N = total tokens, P = total events — the left-to-right float
    expression both engines evaluate identically (round-``digits``
    absorbs the ≤1-ulp libm ln drift).  Only pairs with
    c_ab ≥ ``min_count`` are scored (the standard PMI noise gate — and
    the tail prune that keeps the joins pair-vocab-bounded).

    Scale shape: one streaming pass emits per-batch PARTIAL pair /
    unigram counts plus a one-row (tokens, events) total — vocabulary-
    sized exchanges, never a row per occurrence; the min_count filter
    prunes the merged pair table BEFORE two vocab-keyed hash joins
    attach c_a and c_b; scoring is vectorized; a per-block local top-k
    bounds the final sort input by blocks×k."""
    import math

    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..functions.repetition import split_words
    from .joins import _join_partitions, safe_join

    def partial(batch: pa.Table) -> pa.Table:
        # fully vectorized combiner: Arrow RE2 split + dictionary
        # encode (C speed, no Python per-token work); the batch vocab
        # sorts once so canonical unordered pairs are min/max on
        # STRING-ordered indices packed into one int64
        col = pc.fill_null(batch.column(text_column).cast(pa.string()),
                           "")
        lists = pc.split_pattern_regex(col, "[ \t\r\n\f]+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lens0 = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = lists.flatten()
        keep = pc.not_equal(flat, "")
        words_arr = flat.filter(keep)
        n_tok = len(words_arr)
        if n_tok == 0:
            return pa.table({
                "a": pa.array([None], pa.string()),
                "b": pa.array([None], pa.string()),
                "n": pa.array([0], pa.int64()),
                "tok": pa.array([0], pa.int64()),
                "ev": pa.array([0], pa.int64())})
        doc_of0 = np.repeat(np.arange(len(lens0), dtype=np.int64), lens0)
        word_of = doc_of0[keep.to_numpy(zero_copy_only=False)]
        enc = words_arr.dictionary_encode()
        dict_vals = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        order = np.argsort(dict_vals, kind="stable")
        rank = np.empty(len(order), np.int64)
        rank[order] = np.arange(len(order))
        vocab = dict_vals[order]
        inv = rank[enc.indices.to_numpy(zero_copy_only=False)]
        V = len(vocab)
        keys = []
        n_ev = 0
        for d in range(1, window + 1):
            if n_tok <= d:
                break
            a, b = inv[:-d], inv[d:]
            valid = word_of[:-d] == word_of[d:]
            n_ev += int(valid.sum())
            lo = np.minimum(a, b)[valid].astype(np.int64)
            hi = np.maximum(a, b)[valid].astype(np.int64)
            keys.append(lo * V + hi)
        if keys:
            pk, pcnt = np.unique(np.concatenate(keys),
                                 return_counts=True)
        else:
            pk = pcnt = np.empty(0, np.int64)
        uk, ucnt = np.unique(inv, return_counts=True)
        return pa.table({
            "a": pa.array(list(vocab[pk // V])
                          + [None] * (len(uk) + 1), pa.string()),
            "b": pa.array(list(vocab[pk % V]) + list(vocab[uk])
                          + [None], pa.string()),
            "n": pa.array(np.concatenate(
                [pcnt, ucnt, [0]]).astype(np.int64), pa.int64()),
            "tok": pa.array([0] * (len(pk) + len(uk)) + [n_tok],
                            pa.int64()),
            "ev": pa.array([0] * (len(pk) + len(uk)) + [n_ev],
                           pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()

    # distributed scalars: one row per batch
    totals = (parts.map_batches(
        lambda b: b.filter(pc.and_(pc.is_null(b.column("a")),
                                   pc.is_null(b.column("b"))))
                   .select(["tok", "ev"]),
        batch_format="pyarrow"))
    n_tok = 0
    n_ev = 0
    for b in totals.iter_batches(batch_size=None, batch_format="pyarrow"):
        n_tok += int(pc.sum(b.column("tok")).as_py() or 0)
        n_ev += int(pc.sum(b.column("ev")).as_py() or 0)
    if n_ev == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64())}))

    def keep_pairs(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_(pc.is_valid(b.column("a")),
                                pc.is_valid(b.column("b")))).select(
                                    ["a", "b", "n"])

    def keep_unis(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(pc.is_null(b.column("a")),
                             pc.is_valid(b.column("b"))))
        return pa.table({"term": t.column("b"), "cu": t.column("n")})

    merged_pairs = (parts.map_batches(keep_pairs, batch_format="pyarrow")
                         .groupby(["a", "b"])
                         .aggregate(Sum("n", alias_name="n")))
    unis = (parts.map_batches(keep_unis, batch_format="pyarrow")
                 .groupby("term")
                 .aggregate(Sum("cu", alias_name="cu"))).materialize()

    gated = merged_pairs.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n"), min_count)),
        batch_format="pyarrow").materialize()

    # attach c_a / c_b: broadcast lookup while the unigram table fits
    # (two pc.index_in gathers in ONE streaming map — no join-aggregator
    # startup), two hash joins beyond the gate
    if unis.count() <= 5_000_000:
        import ray as _ray

        ut = pa.concat_tables([b for b in unis.iter_batches(
            batch_size=None, batch_format="pyarrow") if b.num_rows])
        uref = _ray.put((ut.column("term").combine_chunks(),
                         ut.column("cu").to_numpy(zero_copy_only=False)
                           .astype(np.int64)))

        def attach(b: pa.Table) -> pa.Table:
            terms, cu = _ray.get(uref)
            ia = pc.index_in(b.column("a"), value_set=terms).to_numpy(
                zero_copy_only=False).astype(np.int64)
            ib = pc.index_in(b.column("b"), value_set=terms).to_numpy(
                zero_copy_only=False).astype(np.int64)
            return (b.append_column("cu_a", pa.array(cu[ia], pa.int64()))
                     .append_column("cu_b", pa.array(cu[ib], pa.int64())))

        joined = gated.map_batches(attach, batch_format="pyarrow")
    else:
        j1 = safe_join(gated, unis, "inner", 16,
                       on=("a",), right_on=("term",))
        joined = (safe_join(j1.rename_columns({"cu": "cu_a"}), unis,
                            "inner", 16, on=("b",), right_on=("term",))
                  .rename_columns({"cu": "cu_b"})
                  if j1 is not None else None)

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "pmi": pa.array([], pa.float64())})
        c = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        ca = b.column("cu_a").to_numpy(zero_copy_only=False).astype(
            np.float64)
        cb = b.column("cu_b").to_numpy(zero_copy_only=False).astype(
            np.float64)
        raw = (c * n_tok * n_tok) / (n_ev * ca * cb)
        pmi = np.fromiter((round(math.log(v), digits)
                           for v in raw.tolist()), np.float64, len(raw))
        return pa.table({"a": b.column("a"), "b": b.column("b"),
                         "n": b.column("n"),
                         "pmi": pa.array(pmi, pa.float64())})

    def local_topk(b: pa.Table) -> pa.Table:
        order = pc.sort_indices(b, sort_keys=[
            ("pmi", "descending"), ("a", "ascending"), ("b", "ascending")])
        return b.take(order[:k])

    if joined is None:
        import ray.data as _rd

        return _rd.from_arrow(pa.table({
            "a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64())}))
    return (joined.map_batches(score, batch_format="pyarrow")
                  .map_batches(local_topk, batch_format="pyarrow")
                  .sort(["pmi", "a", "b"], descending=[True, False, False])
                  .limit(k))


def keyword_tag(ds, topics: dict, *, id_column: str = "doc_id",
                text_column: str = "text", keep_zero: bool = False):
    """Dictionary-based topic tagging: for every document and every
    topic, the total count of NON-OVERLAPPING occurrences of the
    topic's keywords (case-sensitive substring match — the convention
    Arrow's ``count_substring`` and SQL's replace-length trick share).
    Returns long-form (id, topic, hits); zero-hit rows are dropped
    unless ``keep_zero`` (sparse output — docs × matched topics, not
    docs × topics).

    Scale shape: pure streaming map, zero shuffle.  The topic
    dictionary rides the task closure (broadcast once per worker —
    wrap in an actor pool via ``map_batches(Cls)`` if the dictionary
    grows to model size); per batch the work is
    Σ_topics |keywords| Arrow C kernels over the whole column, no
    per-row Python."""
    import pyarrow.compute as pc

    items = sorted((str(t), sorted(kws)) for t, kws in topics.items())

    def tag(batch: pa.Table) -> pa.Table:
        import numpy as np

        # cast first: an all-null block arrives as type null, which
        # fill_null can't target to string
        col = pc.fill_null(batch.column(text_column).cast(pa.string()), "")
        ids = batch.column(id_column)
        out_ids, out_topics, out_hits = [], [], []
        for topic, kws in items:
            hits = np.zeros(batch.num_rows, np.int64)
            for kw in kws:
                hits += pc.count_substring(col, kw).to_numpy(
                    zero_copy_only=False).astype(np.int64)
            if keep_zero:
                keep = np.arange(batch.num_rows)
            else:
                keep = np.flatnonzero(hits > 0)
            out_ids.append(ids.take(pa.array(keep, pa.int64())))
            out_topics.append(pa.array([topic] * len(keep), pa.string()))
            out_hits.append(pa.array(hits[keep], pa.int64()))
        if not out_ids:
            return pa.table({id_column: ids.slice(0, 0),
                             "topic": pa.array([], pa.string()),
                             "hits": pa.array([], pa.int64())})
        return pa.table({
            id_column: pa.concat_arrays([c.combine_chunks()
                                         if isinstance(c, pa.ChunkedArray)
                                         else c for c in out_ids]),
            "topic": pa.concat_arrays(out_topics),
            "hits": pa.concat_arrays(out_hits),
        })

    return ds.map_batches(tag, batch_format="pyarrow")


def profile_table(ds, columns: list, *, digits: int = 6):
    """Column profiler: one row per column with ``(column, n, nulls,
    n_distinct, min_s, max_s)`` — the data-quality report a pipeline
    runs before trusting a new drop of shards.  min/max are computed in
    the column's own type (no string-order artifacts) and stringified
    only for the uniform output schema; ``n_distinct`` excludes nulls
    (the SQL COUNT(DISTINCT) convention).

    Scale shape: counts/nulls/min/max ride ONE ``Dataset.aggregate``
    pass (per-block partials, a scalar per column on the driver);
    distinct counts are the one genuinely wide step — per-batch
    DISTINCT (column, value) rows, one value-vocabulary-sized
    ``groupby``, then a columns-sized count.  For columns whose value
    vocabulary is corpus-sized (unique keys), that exchange is the
    honest price of exactness — swap in ``sketch.hll_count_distinct``
    when an estimate suffices."""
    import numpy as np
    import pyarrow.compute as pc

    import ray.data as rd

    from ray.data.aggregate import Count, Max, Min, Sum

    def with_null_flags(b: pa.Table) -> pa.Table:
        for c in columns:
            b = b.append_column(
                f"__null_{c}",
                pc.cast(pc.is_null(b.column(c)), pa.int64()))
        return b

    aggs = [Count()]
    for c in columns:
        aggs += [Min(c), Max(c), Sum(f"__null_{c}", alias_name=f"nulls_{c}")]
    stats = (ds.map_batches(with_null_flags, batch_format="pyarrow")
               .aggregate(*aggs))

    def distinct_partial(b: pa.Table) -> pa.Table:
        cols_out, vals_out = [], []
        for c in columns:
            col = b.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            u = pc.unique(col.cast(pa.string()))
            u = u.filter(pc.is_valid(u))
            cols_out.append(pa.array([c] * len(u), pa.string()))
            vals_out.append(u)
        return pa.table({"column": pa.concat_arrays(cols_out),
                         "val": pa.concat_arrays(vals_out)})

    nd = {r["column"]: r["count()"] for r in
          (ds.map_batches(distinct_partial, batch_format="pyarrow")
             .groupby(["column", "val"]).count()
             .groupby("column").count()
             .take_all())}

    def fmt(v) -> str:
        if v is None:
            return ""
        if isinstance(v, float):
            return str(round(v, digits))
        return str(v)

    rows = {
        "column": pa.array(columns, pa.string()),
        "n": pa.array([stats["count()"]] * len(columns), pa.int64()),
        "nulls": pa.array([stats[f"nulls_{c}"] or 0 for c in columns],
                          pa.int64()),
        "n_distinct": pa.array([nd.get(c, 0) for c in columns], pa.int64()),
        "min_s": pa.array([fmt(stats[f"min({c})"]) for c in columns],
                          pa.string()),
        "max_s": pa.array([fmt(stats[f"max({c})"]) for c in columns],
                          pa.string()),
    }
    return rd.from_arrow(pa.table(rows))


def grouped_corr(ds, group_column: str, x_column: str, y_column: str, *,
                 digits: int = 6):
    """Per-group Pearson correlation of two INTEGER columns via exact
    integer moments:

        r = round((n·Σxy − Σx·Σy) /
                  sqrt((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²)), digits)

    Every moment is an exact int64 sum, so both engines derive the
    SAME integers and the float part is one identical
    division/sqrt/round — no summation-order ulps anywhere (the reason
    this isn't a thin wrapper over an engine ``corr()``, whose
    streaming update orders differ).  Degenerate groups (zero variance
    in either column) return NULL like SQL's corr.

    Scale shape: per-batch (group, n, Σx, Σy, Σx², Σy², Σxy) partials —
    groups-sized exchange, one ``groupby.sum``, vectorized final map.
    Caller owns overflow headroom: |x|,|y| ≤ ~3e4 is safe at 1e9 rows
    per group."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_column)
        x = batch.column(x_column).to_numpy(zero_copy_only=False).astype(
            np.int64)
        y = batch.column(y_column).to_numpy(zero_copy_only=False).astype(
            np.int64)
        t = pa.table({group_column: g,
                      "n": pa.array(np.ones(len(x), np.int64)),
                      "sx": pa.array(x), "sy": pa.array(y),
                      "sxx": pa.array(x * x), "syy": pa.array(y * y),
                      "sxy": pa.array(x * y)})
        return (t.group_by([group_column])
                 .aggregate([("n", "sum"), ("sx", "sum"), ("sy", "sum"),
                             ("sxx", "sum"), ("syy", "sum"),
                             ("sxy", "sum")])
                 .rename_columns([group_column, "n", "sx", "sy",
                                  "sxx", "syy", "sxy"]))

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(group_column)
                .aggregate(Sum("n", alias_name="n"),
                           Sum("sx", alias_name="sx"),
                           Sum("sy", alias_name="sy"),
                           Sum("sxx", alias_name="sxx"),
                           Sum("syy", alias_name="syy"),
                           Sum("sxy", alias_name="sxy")))

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({group_column: b.column(group_column),
                             "n": pa.array([], pa.int64()),
                             "corr": pa.array([], pa.float64())})
        n = b.column("n").to_numpy(zero_copy_only=False)
        sx = b.column("sx").to_numpy(zero_copy_only=False)
        sy = b.column("sy").to_numpy(zero_copy_only=False)
        sxx = b.column("sxx").to_numpy(zero_copy_only=False)
        syy = b.column("syy").to_numpy(zero_copy_only=False)
        sxy = b.column("sxy").to_numpy(zero_copy_only=False)
        num = (n * sxy - sx * sy).astype(np.float64)
        vx = (n * sxx - sx * sx).astype(np.float64)
        vy = (n * syy - sy * sy).astype(np.float64)
        ok = (vx > 0) & (vy > 0)
        r = np.full(len(n), np.nan)
        r[ok] = num[ok] / np.sqrt(vx[ok] * vy[ok])
        vals = [round(float(v), digits) if m else None
                for v, m in zip(r, ok)]
        return pa.table({group_column: b.column(group_column),
                         "n": b.column("n"),
                         "corr": pa.array(vals, pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def grouped_linear_fit(ds, group_column: str, x_column: str,
                       y_column: str, *, digits: int = 6):
    """Per-group ordinary-least-squares line y = intercept + slope·x
    over two INTEGER columns via exact integer moments:

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n

    — the distributed closed-form regression a curation pipeline uses
    to calibrate one quality signal against another (and the
    ``grouped_corr`` sibling: same moment partials, different finish).
    Both engines derive identical int64 moments, so the float tail is
    the same two divisions on the same integers — bit-stable across
    batch sizes, engines and cluster sizes.  Groups with zero x
    variance return NULL for both coefficients, like SQL's
    ``regr_slope``.

    Scale shape: per-batch (group, n, Σx, Σy, Σx², Σxy) Arrow partials
    — a groups-sized exchange, one ``groupby.sum``, vectorized finish.
    Caller owns overflow headroom: |x|,|y| ≤ ~3e4 is safe at 1e9 rows
    per group."""
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_column)
        x = batch.column(x_column).to_numpy(zero_copy_only=False).astype(
            np.int64)
        y = batch.column(y_column).to_numpy(zero_copy_only=False).astype(
            np.int64)
        t = pa.table({group_column: g,
                      "n": pa.array(np.ones(len(x), np.int64)),
                      "sx": pa.array(x), "sy": pa.array(y),
                      "sxx": pa.array(x * x), "sxy": pa.array(x * y)})
        return (t.group_by([group_column])
                 .aggregate([("n", "sum"), ("sx", "sum"), ("sy", "sum"),
                             ("sxx", "sum"), ("sxy", "sum")])
                 .rename_columns([group_column, "n", "sx", "sy",
                                  "sxx", "sxy"]))

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(group_column)
                .aggregate(Sum("n", alias_name="n"),
                           Sum("sx", alias_name="sx"),
                           Sum("sy", alias_name="sy"),
                           Sum("sxx", alias_name="sxx"),
                           Sum("sxy", alias_name="sxy")))

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False)
        sx = b.column("sx").to_numpy(zero_copy_only=False)
        sy = b.column("sy").to_numpy(zero_copy_only=False)
        sxx = b.column("sxx").to_numpy(zero_copy_only=False)
        sxy = b.column("sxy").to_numpy(zero_copy_only=False)
        num = (n * sxy - sx * sy).astype(np.float64)
        vx = (n * sxx - sx * sx).astype(np.float64)
        ok = vx > 0
        slope = np.divide(num, vx, out=np.full(len(n), np.nan), where=ok)
        inter = np.divide(sy - slope * sx, n,
                          out=np.full(len(n), np.nan), where=ok)
        sl = [round(float(v), digits) if m else None
              for v, m in zip(slope, ok)]
        ic = [round(float(v), digits) if m else None
              for v, m in zip(inter, ok)]
        return pa.table({group_column: b.column(group_column),
                         "n": b.column("n"),
                         "slope": pa.array(sl, pa.float64()),
                         "intercept": pa.array(ic, pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def cdf_against(new_ds, ref_ds, value_column: str, *,
                id_column: str = "doc_id", digits: int = 6,
                max_distinct: int = 50_000_000):
    """Cross-corpus calibration: every NEW row's value scored as its
    CDF position within the REFERENCE corpus's distribution —
    ``cdf = round(|{ref < v}| / n_ref, digits)`` — the two-corpus
    percentile scoring used to rate a fresh crawl against a trusted
    archive without mixing the corpora (the `percent_rank` family's
    `_against` sibling).  Counts are exact ints, so the single
    division/round is bit-identical across engines.

    Scale shape: the reference collapses to a (value, count) histogram
    — one value-vocabulary-sized ``groupby`` (``max_distinct`` guards
    the driver gather; bin continuous domains upstream like
    ``grouped_median``'s hist fallback) — whose sorted values +
    cumulative counts broadcast once via ``ray.put``; the new corpus
    streams through one vectorized ``searchsorted`` map."""
    import numpy as np

    import ray as _ray

    from ray.data.aggregate import Count

    hist = ref_ds.groupby(value_column).count().materialize()
    n_distinct = hist.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"cdf_against: {n_distinct} distinct reference values exceed "
            f"max_distinct={max_distinct}; bin the domain upstream")
    parts = [b for b in hist.iter_batches(batch_size=None,
                                          batch_format="pyarrow")
             if b.num_rows]
    if parts:
        t = pa.concat_tables(parts)
        import pyarrow.compute as pc

        t = t.take(pc.sort_indices(t, sort_keys=[(value_column,
                                                  "ascending")]))
        vals = t.column(value_column).to_numpy(zero_copy_only=False)
        cnts = t.column("count()").to_numpy(zero_copy_only=False).astype(
            np.int64)
    else:
        vals = np.empty(0, np.int64)
        cnts = np.empty(0, np.int64)
    # cum[i] = count of reference values STRICTLY BELOW sv[i];
    # cum[len(sv)] = n_ref, so cum[searchsorted(sv, v, 'left')] is
    # exactly |{ref < v}| for any v
    cum = np.concatenate([np.zeros(1, np.int64), np.cumsum(cnts)])
    n_ref = int(cum[-1])
    ref = _ray.put((vals, cum))

    def score(b: pa.Table) -> pa.Table:
        v = b.column(value_column).to_numpy(zero_copy_only=False)
        sv, scum = _ray.get(ref)
        if n_ref == 0:
            cdf = np.zeros(len(v), np.float64)
        else:
            lt = scum[np.searchsorted(sv, v, side="left")]
            cdf = np.fromiter((round(x / n_ref, digits)
                               for x in lt.tolist()), np.float64, len(lt))
        return pa.table({id_column: b.column(id_column),
                         value_column: b.column(value_column),
                         "cdf": pa.array(cdf, pa.float64())})

    return new_ds.map_batches(score, batch_format="pyarrow")


def script_stats(ds, text_column: str = "text", *,
                 id_column: str = "doc_id", digits: int = 6):
    """Per-document script composition over explicit codepoint ranges
    (``functions.textstats.SCRIPT_RANGES`` — deliberately NOT
    \\p{Script} classes, whose tables drift across regex-engine
    versions): latin/digit/cyrillic/han/arabic fractions of total
    codepoints — the multilingual triage signal in front of lang-id
    and per-script routing.  Pure streaming map: one utf-32 encode per
    batch + vectorized range masks + bincounts."""
    import numpy as np

    from ..functions.textstats import SCRIPT_RANGES, script_fractions

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_column).to_pylist()
        lens, fracs = script_fractions(texts, digits=digits)
        cols = {id_column: batch.column(id_column),
                "len_cp": pa.array(lens, pa.int64())}
        for name in SCRIPT_RANGES:
            cols[f"{name}_frac"] = pa.array(fracs[name], pa.float64())
        return pa.table(cols)

    return ds.map_batches(stats, batch_format="pyarrow")


def global_rank(ds, order_column: str, *, tiebreak_column: str,
                rank_column: str = "rank"):
    """Deterministic GLOBAL row enumeration: every row gets its 0-based
    rank under ``ORDER BY (order_column, tiebreak_column)`` — the
    distributed ``row_number()`` primitive behind epoch shuffles
    (order by a hash), curriculum ordering (order by a score) and
    stable exports.  ``tiebreak_column`` must be unique so the rank is
    total.

    Scale shape: one distributed sort on the pair, then the
    ``pack_sequences`` offset recipe — per-block (first-key, count)
    summaries, a driver prefix sum over blocks (one row per BLOCK, not
    per row), and a second streaming pass assigning
    ``offset + arange``.  Nothing row-shaped lands on the driver."""
    import numpy as np

    sorted_ds = ds.sort([order_column, tiebreak_column]).materialize()

    def summary(batch: pa.Table) -> pa.Table:
        # first row after the sort == the block's minimum; keep NATIVE
        # types so the driver-side ordering equals the sort's ordering
        if batch.num_rows == 0:
            return pa.table({"o": batch.column(order_column).slice(0, 0),
                             "t": batch.column(tiebreak_column)
                                       .slice(0, 0),
                             "total": pa.array([], pa.int64())})
        return pa.table({
            "o": batch.column(order_column).slice(0, 1),
            "t": batch.column(tiebreak_column).slice(0, 1),
            "total": pa.array([batch.num_rows], pa.int64())})

    sm = sorted_ds.map_batches(summary, batch_format="pyarrow").to_pandas()
    if len(sm) == 0:
        return sorted_ds
    sm = sm.sort_values(["o", "t"]).reset_index(drop=True)
    offs = sm["total"].cumsum().shift(fill_value=0)
    offset_by_first = {(o, t): int(v) for o, t, v in
                       zip(sm["o"].tolist(), sm["t"].tolist(),
                           offs.tolist())}

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(rank_column,
                                       pa.array([], pa.int64()))
        key = (batch.column(order_column)[0].as_py(),
               batch.column(tiebreak_column)[0].as_py())
        base = offset_by_first[key]
        return batch.append_column(
            rank_column,
            pa.array(base + np.arange(batch.num_rows, dtype=np.int64)))

    return sorted_ds.map_batches(assign, batch_format="pyarrow")


def decile_histogram(ds, value_column: str, *, n_buckets: int = 10):
    """Global quantile-bucket histogram: exact ``quantile_disc``
    thresholds at j/n_buckets (the :func:`grouped_quantiles` machinery
    run as one group), then every row buckets by the strict-less
    threshold count and the corpus collapses to
    ``(bucket, n, sum_v)`` — the calibration-curve / distribution
    report on any numeric column.  With heavy value ties several
    thresholds can coincide, leaving some buckets legitimately empty —
    the strict-less rule is what both engines agree on.

    Scale shape: thresholds ride the value-histogram partial exchange
    (distinct values, not rows); the assignment pass broadcasts the
    n_buckets−1 thresholds in the task closure; output is
    n_buckets-bounded."""
    import numpy as np

    from ray.data.aggregate import Count, Sum

    qs = [j / n_buckets for j in range(1, n_buckets)]

    def with_g(b: pa.Table) -> pa.Table:
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int64)),
            value_column: b.column(value_column)})

    th_rows = grouped_quantiles(ds.map_batches(with_g,
                                               batch_format="pyarrow"),
                                "__g", value_column, qs=qs).take_all()
    th = np.sort(np.array([r["quantile"] for r in th_rows], np.float64))

    def assign(b: pa.Table) -> pa.Table:
        v = b.column(value_column).to_numpy(zero_copy_only=False)
        bucket = np.searchsorted(th, v, side="left")
        return pa.table({"bucket": pa.array(bucket.astype(np.int64)),
                         value_column: b.column(value_column)})

    return (ds.map_batches(assign, batch_format="pyarrow")
              .groupby("bucket")
              .aggregate(Count(alias_name="n"),
                         Sum(value_column, alias_name="sum_v")))


def oov_rate(ds, text_column: str = "text", *, min_count: int = 2,
             id_column: str = "doc_id", digits: int = 6):
    """Per-document out-of-vocabulary rate: the fraction of a doc's
    tokens whose CORPUS frequency is below ``min_count`` — rare-token
    density, the cheap gibberish/noise signal (typo floods, base64
    blobs and mojibake are all OOV-dense).  Rounding is half-AWAY
    (count ratios tie exactly at the grid).

    Scale shape: pass 1 is the BPE word count (per-batch bincount →
    ONE word-vocab ``groupby.sum``); the FREQUENT-word set then
    broadcasts in fingerprint space (sorted md5-u64 array, ~8 B/word,
    strings never ship); pass 2 is a streaming encode with per-batch
    dictionary-distinct hashing — the ``bpe_token_counts`` recipe."""
    import re

    import numpy as np
    import pyarrow.compute as pc

    import ray as _ray

    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64

    split_re = re.compile("[ \\t\\n\\r\\f\\v]+")

    def word_partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_column).to_pylist()
        words = [w for w in split_re.split(" ".join(t or "" for t in texts))
                 if w]
        if not words:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uniq, cnt = np.unique(np.asarray(words, dtype=object),
                              return_counts=True)
        return pa.table({"word": pa.array(uniq.tolist(), pa.string()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    vocab = (ds.map_batches(word_partial, batch_format="pyarrow")
               .groupby("word").aggregate(Sum("n", alias_name="n")))

    freq_fps: list = []
    for b in vocab.iter_batches(batch_size=None, batch_format="pyarrow"):
        if not b.num_rows:
            continue
        keep = pc.greater_equal(b.column("n"), min_count)
        for w in b.column("word").filter(keep).to_pylist():
            freq_fps.append(stable_hash64(w))
    fps = np.sort(np.array(freq_fps, np.uint64))
    ref = _ray.put(fps)
    scale = 10.0 ** digits

    def score(batch: pa.Table) -> pa.Table:
        sv = _ray.get(ref)
        col = pc.fill_null(batch.column(text_column).cast(pa.string()),
                           "")
        lists = pc.split_pattern_regex(col, "[ \\t\\n\\r\\f\\v]+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lens0 = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = lists.flatten()
        keep = pc.not_equal(flat, "")
        words = flat.filter(keep)
        doc_of = np.repeat(np.arange(len(lens0), dtype=np.int64),
                           lens0)[keep.to_numpy(zero_copy_only=False)]
        total = np.bincount(doc_of, minlength=batch.num_rows)
        rate = np.zeros(batch.num_rows, np.float64)
        if len(words):
            enc = words.dictionary_encode()
            dwords = enc.dictionary.to_pylist()
            dfps = np.fromiter((stable_hash64(w) for w in dwords),
                               np.uint64, len(dwords))
            pos = np.searchsorted(sv, dfps)
            in_vocab = (pos < len(sv))
            in_vocab[in_vocab] &= sv[pos[in_vocab]] == dfps[in_vocab]
            oov_per_dict = (~in_vocab).astype(np.int64)
            oov = np.bincount(
                doc_of, weights=oov_per_dict[
                    enc.indices.to_numpy(zero_copy_only=False)],
                minlength=batch.num_rows)
            nz = total > 0
            rate[nz] = np.floor(oov[nz] / total[nz] * scale + 0.5) / scale
        return pa.table({id_column: batch.column(id_column),
                         "n_tokens": pa.array(total.astype(np.int64)),
                         "oov_frac": pa.array(rate, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")

def crawl_budget(ds, key_column: str, *, budget: int,
                 out_key: str = "key", max_distinct: int = 50_000_000):
    """Water-filling budget allocation: given per-key row counts
    ``c_k`` and a global ``budget`` B, find the largest integer level L
    with ``Σ min(c_k, L) ≤ B`` and give every key the quota
    ``min(c_k, L)`` — the proportional-fair per-host page budget a
    crawler (or a per-domain training-data cap) allocates: small hosts
    keep everything, big hosts are throttled to one common waterline.
    → (key, n_docs, quota).  Integer-exact end to end.

    Scale shape: one keys-sized ``groupby.count``; the waterline
    depends only on the MULTISET of counts, so it is solved on a
    counts-of-counts histogram (``max_distinct`` guards the driver
    gather — distinct count VALUES, not keys, the ``grouped_median``
    bound) with a vectorized binary search; quotas are one streaming
    map over the per-key counts with the scalar L in the closure."""
    import numpy as np

    from ray.data.aggregate import Count, Sum

    counts = (ds.groupby(key_column)
                .aggregate(Count(alias_name="n_docs"))).materialize()

    def hist_partial(b: pa.Table) -> pa.Table:
        g = (b.select(["n_docs"]).group_by(["n_docs"])
              .aggregate([("n_docs", "count")]))
        return g.rename_columns(["v", "pm"])

    hist = (counts.map_batches(hist_partial, batch_format="pyarrow")
                  .groupby("v").aggregate(Sum("pm", alias_name="m")))
    rows = hist.take_all()
    if not rows:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            out_key: pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "quota": pa.array([], pa.int64())}))
    if len(rows) > max_distinct:
        raise ValueError(
            f"{len(rows)} distinct count values exceed max_distinct="
            f"{max_distinct}; bin counts upstream")
    v = np.array([r["v"] for r in rows], np.int64)
    m = np.array([r["m"] for r in rows], np.int64)
    order = np.argsort(v)
    v, m = v[order], m[order]
    mv_prefix = np.r_[0, np.cumsum(m * v)]   # Σ m_j v_j for v_j <= x
    m_prefix = np.r_[0, np.cumsum(m)]
    total_keys = int(m_prefix[-1])

    def used(level: int) -> int:
        i = int(np.searchsorted(v, level, side="right"))
        return int(mv_prefix[i] + (total_keys - m_prefix[i]) * level)

    lo, hi = 0, int(v[-1])
    while lo < hi:  # largest L with used(L) <= budget; used is monotone
        mid = (lo + hi + 1) // 2
        if used(mid) <= budget:
            lo = mid
        else:
            hi = mid - 1
    level = lo

    def quotas(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = b.column("n_docs")
        return pa.table({out_key: b.column(key_column),
                         "n_docs": n,
                         "quota": pc.min_element_wise(
                             pc.cast(n, pa.int64()),
                             pa.scalar(level, pa.int64()))})

    return counts.map_batches(quotas, batch_format="pyarrow")

def drift_psi(new_ds, ref_ds, value_column: str, *,
              n_buckets: int = 10, digits: int = 6):
    """Population Stability Index report between a REFERENCE corpus and
    a NEW corpus: the reference's exact ``quantile_disc`` bucket edges
    bin both sides, and every bucket reports

        psi_term = (p_new − p_ref) · ln(p_new / p_ref)

    (non-negative by construction; NULL when either side is empty in
    the bucket) — the per-bucket drift decomposition a data-quality
    monitor alarms on (Σ terms > 0.2 = "retrain"), emitted PER BUCKET
    so the output is deterministic with no cross-bucket float
    summation.  → (bucket, n_ref, n_new, psi_term).

    Scale shape: thresholds ride the reference's value-histogram
    exchange (distinct values, not rows); both corpora stream through
    one broadcast-thresholds bucket map + a buckets-sized count; the
    finish handles ≤ ``n_buckets`` rows.  Counts are exact ints; each
    psi_term is the same float expression of the same integers on both
    engines, snapped half-away to ``digits``."""
    import numpy as np

    from ray.data.aggregate import Count

    qs = [j / n_buckets for j in range(1, n_buckets)]

    def with_g(b: pa.Table) -> pa.Table:
        return pa.table({
            "__g": pa.array(np.zeros(b.num_rows, np.int64)),
            value_column: b.column(value_column)})

    th_rows = grouped_quantiles(
        ref_ds.map_batches(with_g, batch_format="pyarrow"),
        "__g", value_column, qs=qs).take_all()
    th = np.sort(np.array([r["quantile"] for r in th_rows],
                          np.float64))

    def bucketed(ds):
        def assign(b: pa.Table) -> pa.Table:
            v = b.column(value_column).to_numpy(zero_copy_only=False)
            bucket = np.searchsorted(th, v, side="left")
            return pa.table({"bucket": pa.array(bucket.astype(np.int64))})

        return (ds.map_batches(assign, batch_format="pyarrow")
                  .groupby("bucket")
                  .aggregate(Count(alias_name="n"))).take_all()

    cr = {r["bucket"]: r["n"] for r in bucketed(ref_ds)}
    cn = {r["bucket"]: r["n"] for r in bucketed(new_ds)}
    t_ref = sum(cr.values())
    t_new = sum(cn.values())
    scale = 10 ** digits
    buckets = sorted(set(cr) | set(cn))
    terms = []
    for bk in buckets:
        nr, nn = cr.get(bk, 0), cn.get(bk, 0)
        if nr > 0 and nn > 0:
            p, q = nn / t_new, nr / t_ref
            terms.append(
                np.floor((p - q) * np.log(p / q) * scale + 0.5) / scale)
        else:
            terms.append(None)

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "bucket": pa.array(buckets, pa.int64()),
        "n_ref": pa.array([cr.get(b, 0) for b in buckets], pa.int64()),
        "n_new": pa.array([cn.get(b, 0) for b in buckets], pa.int64()),
        "psi_term": pa.array(terms, pa.float64()),
    }))

def _term_bucket_counts(ds, text_column: str, n_buckets: int) -> dict:
    """Shared bucket-count scan for the categorical-drift family
    (:func:`term_psi`, :func:`term_js`): vectorized tokenize
    (:func:`flat_split_words`) → ``stable_hash64(word) % n_buckets``
    once per DISTINCT batch word (dictionary encode + bincount, never
    per token) → ≤ n_buckets-row partials → one buckets-sized
    ``groupby.sum``.  Term strings never ride an exchange."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64

    def partial(b: pa.Table) -> pa.Table:
        words, _doc_of, _ = flat_split_words(b.column(text_column))
        if len(words) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        enc = words.dictionary_encode()
        inv = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(inv, minlength=len(enc.dictionary))
        bk = np.fromiter((stable_hash64(w) % n_buckets
                          for w in enc.dictionary.to_pylist()),
                         np.int64, count=len(enc.dictionary))
        acc = np.zeros(n_buckets, np.int64)
        np.add.at(acc, bk, cnt.astype(np.int64))
        nz = np.flatnonzero(acc)
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "n": pa.array(acc[nz])})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bucket")
              .aggregate(Sum("n", alias_name="n"))).take_all()
    return {r["bucket"]: r["n"] for r in rows}


def term_js(new_ds, ref_ds, text_column: str = "text", *,
            n_buckets: int = 64, digits: int = 6):
    """Jensen–Shannon vocabulary divergence between a REFERENCE corpus
    and a NEW corpus over md5 term buckets — the bounded, symmetric
    sibling of :func:`term_psi` (JS ∈ [0, 1] bit even when a bucket is
    empty on one side, where PSI's ln-ratio blows up to NULL):

        m       = (p_new + p_ref) / 2                     per bucket
        js_term = ½·p_new·log2(p_new/m) + ½·p_ref·log2(p_ref/m)

    with the standard zero conventions (one-sided bucket → ½·p of the
    populated side; 0·log0 = 0).  Emitted PER BUCKET (the decomposition
    rule — no cross-bucket float sum; Σ js_term = the JS divergence in
    bits).  Token counts are exact ints; each term is the same float
    expression of the same integers on both engines (libm log2 is
    bit-identical for identical double inputs), snapped via
    ``floor(x·10^digits + 0.5)`` — js_term ≥ 0, so the floor snap is
    also half-away.  → (bucket, n_ref, n_new, js_term).

    Scale shape: two :func:`_term_bucket_counts` scans — vectorized
    per-batch distinct-word bucket partials, buckets-sized exchanges,
    a ≤ n_buckets-row driver finish."""
    import math

    cr = _term_bucket_counts(ref_ds, text_column, n_buckets)
    cn = _term_bucket_counts(new_ds, text_column, n_buckets)
    t_ref = sum(cr.values())
    t_new = sum(cn.values())
    scale = 10 ** digits
    buckets = sorted(set(cr) | set(cn))
    terms = []
    for bk in buckets:
        nr, nn = cr.get(bk, 0), cn.get(bk, 0)
        if nn > 0 and nr > 0:
            p, q = nn / t_new, nr / t_ref
            m = (p + q) / 2.0
            v = 0.5 * (p * math.log2(p / m)) + 0.5 * (q * math.log2(q / m))
        elif nn > 0:
            v = 0.5 * (nn / t_new)
        else:
            v = 0.5 * (nr / t_ref)
        terms.append(math.floor(v * scale + 0.5) / scale)

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "bucket": pa.array(buckets, pa.int64()),
        "n_ref": pa.array([cr.get(b, 0) for b in buckets], pa.int64()),
        "n_new": pa.array([cn.get(b, 0) for b in buckets], pa.int64()),
        "js_term": pa.array(terms, pa.float64()),
    }))


def term_psi(new_ds, ref_ds, text_column: str = "text", *,
             n_buckets: int = 64, digits: int = 6):
    """Vocabulary-drift PSI between a REFERENCE corpus and a NEW corpus
    over md5 TERM buckets — the categorical sibling of
    :func:`drift_psi` ("did the language change between crawl
    snapshots", robust to unbounded vocabularies because terms fold
    into ``n_buckets`` hash buckets before anything is exchanged):

        psi_term = (p_new − p_ref) · ln(p_new / p_ref)   per bucket

    emitted PER BUCKET (the decomposition rule — no cross-bucket float
    sum); token counts are exact ints, each term is the same float
    expression of the same integers on both engines, snapped half-away
    to ``digits``; buckets empty on either side → NULL.

    Bucket function: ``stable_hash64(word) % n_buckets`` (md5 prefix —
    the one hash both engines share).  The shared
    :func:`_term_bucket_counts` scan hashes once per DISTINCT word PER
    BATCH (dictionary encode + bincount, fully vectorized tokenize),
    and only buckets-sized (≤ n_buckets-row) partials leave the
    workers — the term strings never ride an exchange.  → (bucket,
    n_ref, n_new, psi_term)."""
    import numpy as np

    cr = _term_bucket_counts(ref_ds, text_column, n_buckets)
    cn = _term_bucket_counts(new_ds, text_column, n_buckets)
    t_ref = sum(cr.values())
    t_new = sum(cn.values())
    scale = 10 ** digits
    buckets = sorted(set(cr) | set(cn))
    terms = []
    for bk in buckets:
        nr, nn = cr.get(bk, 0), cn.get(bk, 0)
        if nr > 0 and nn > 0:
            p, q = nn / t_new, nr / t_ref
            terms.append(
                np.floor((p - q) * np.log(p / q) * scale + 0.5) / scale)
        else:
            terms.append(None)

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "bucket": pa.array(buckets, pa.int64()),
        "n_ref": pa.array([cr.get(b, 0) for b in buckets], pa.int64()),
        "n_new": pa.array([cn.get(b, 0) for b in buckets], pa.int64()),
        "psi_term": pa.array(terms, pa.float64()),
    }))


def grouped_mad(ds, key_column: str, value_column: str, *,
                digits: int = 6):
    """Per-group robust center + scale: ``(key, median, mad)`` with
    median = quantile_disc(0.5) of the group and MAD =
    quantile_disc(0.5) of |value − median| — the outlier-resistant
    (center, spread) pair a telemetry/quality monitor prefers over
    mean/std, exact in two passes.

    Scale shape: phase 1 is :func:`grouped_quantiles`' value-histogram
    exchange; the groups-sized median table joins back onto the corpus
    (ONE hash join — no broadcast assumption on group count); the
    deviation column runs the same histogram machinery; the final
    assembly joins two groups-sized tables.  Integer-valued inputs
    stay exact throughout (deviations are exact floats of ints)."""
    import pyarrow.compute as pc

    from .joins import _join_partitions, _nonempty_blocks, safe_join

    import ray.data as rd

    empty = pa.table({key_column: pa.array([], pa.string()),
                      "median": pa.array([], pa.float64()),
                      "mad": pa.array([], pa.float64())})
    med = grouped_quantiles(ds, key_column, value_column, qs=[0.5],
                            digits=digits)
    med = med.map_batches(
        lambda b: pa.table({"__mk": b.column(key_column),
                            "median": b.column("quantile")}),
        batch_format="pyarrow").materialize()
    med = _nonempty_blocks(med)
    if med is None:
        return rd.from_arrow(empty)

    nparts = 16
    joined = safe_join(ds.select_columns([key_column, value_column]),
                       med, "inner", nparts,
                       on=(key_column,), right_on=("__mk",))
    if joined is None:
        return rd.from_arrow(empty)

    def dev(b: pa.Table) -> pa.Table:
        v = pc.cast(b.column(value_column), pa.float64())
        return pa.table({
            key_column: b.column(key_column),
            "__dev": pc.abs(pc.subtract(v, b.column("median")))})

    mad = grouped_quantiles(
        joined.map_batches(dev, batch_format="pyarrow"),
        key_column, "__dev", qs=[0.5], digits=digits)
    mad = mad.map_batches(
        lambda b: pa.table({"__gk": b.column(key_column),
                            "mad": b.column("quantile")}),
        batch_format="pyarrow").materialize()
    mad = _nonempty_blocks(mad)
    if mad is None:
        return rd.from_arrow(empty)

    out = safe_join(med, mad, "inner", nparts,
                    on=("__mk",), right_on=("__gk",))
    if out is None:
        return rd.from_arrow(empty)
    return out.map_batches(
        lambda b: pa.table({key_column: b.column("__mk"),
                            "median": b.column("median"),
                            "mad": b.column("mad")}),
        batch_format="pyarrow")

def vocab_growth(ds, text_column: str = "text",
                 id_column: str = "doc_id", *,
                 divisors=(4, 2, 1)):
    """Heaps-law vocabulary growth curve: ``(checkpoint, vocab_size,
    n_tokens)`` at doc-id prefixes ``max_id // d`` for each divisor —
    how fast the distinct-word vocabulary grows as the corpus grows,
    the sub-linearity check (V ≈ K·Nᵝ, β < 1) that distinguishes
    natural text from id-soup / generated noise at corpus scale.

    Scale shape: one tokenize pass emits per-batch (word-fp,
    min-doc-id) partials — the word itself never rides the exchange
    (the LM/TF-IDF fingerprint posture; 64-bit md5 collisions are
    negligible at any real vocabulary) — one fp-keyed ``groupby.min``
    finds each word's first occurrence, and both curve coordinates
    fold to checkpoints-sized tables via per-batch conditional-sum
    partials.  Integer-exact."""
    import numpy as np

    from ray.data.aggregate import Min, Sum

    from ..functions.hashing import stable_hash64
    from ..functions.repetition import split_words

    import ray.data as rd

    max_id = ds.map_batches(
        lambda b: pa.table({"m": pa.array(
            [int(b.column(id_column).to_numpy(
                zero_copy_only=False).max())] if b.num_rows else [],
            pa.int64())}),
        batch_format="pyarrow").max("m")
    checkpoints = sorted({int(max_id) // d for d in divisors})
    mask = (1 << 63) - 1

    def tok_partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_column).to_pylist()
        texts = b.column(text_column).to_pylist()
        fps, docs = [], []
        for d, t in zip(ids, texts):
            for w in split_words(t or ""):
                fps.append(stable_hash64(w) & mask)
                docs.append(d)
        t2 = pa.table({"fp": pa.array(fps, pa.int64()),
                       "d": pa.array(docs, pa.int64())})
        g = t2.group_by(["fp"]).aggregate([("d", "min")])
        return g.rename_columns(["fp", "pd"])

    first = (ds.map_batches(tok_partial, batch_format="pyarrow")
               .groupby("fp").aggregate(Min("pd", alias_name="fd")))

    cks = np.array(checkpoints, np.int64)

    def vocab_partial(b: pa.Table) -> pa.Table:
        fd = b.column("fd").to_numpy(zero_copy_only=False)
        counts = (fd[:, None] <= cks[None, :]).sum(0).astype(np.int64)
        return pa.table({"checkpoint": pa.array(cks),
                         "pv": pa.array(counts)})

    vocab = (first.map_batches(vocab_partial, batch_format="pyarrow")
                  .groupby("checkpoint")
                  .aggregate(Sum("pv", alias_name="vocab_size")))

    def token_partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_column).to_numpy(zero_copy_only=False)
        texts = b.column(text_column).to_pylist()
        nt = np.fromiter((len(split_words(t or "")) for t in texts),
                         np.int64, len(texts))
        counts = np.array([nt[ids <= c].sum() for c in cks], np.int64)
        return pa.table({"checkpoint": pa.array(cks),
                         "pt": pa.array(counts)})

    toks = (ds.map_batches(token_partial, batch_format="pyarrow")
              .groupby("checkpoint")
              .aggregate(Sum("pt", alias_name="n_tokens")))

    from .joins import _join_partitions, _nonempty_blocks, safe_join

    vocab = _nonempty_blocks(vocab.materialize())
    toks = _nonempty_blocks(toks.materialize())
    if vocab is None or toks is None:
        return rd.from_arrow(pa.table({
            "checkpoint": pa.array([], pa.int64()),
            "vocab_size": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64())}))
    return (safe_join(vocab, toks.map_batches(
        lambda b: b.rename_columns(["c2", "n_tokens"]),
        batch_format="pyarrow"), "inner", 4,
        on=("checkpoint",), right_on=("c2",))
        .map_batches(lambda b: b.select(["checkpoint", "vocab_size",
                                         "n_tokens"]),
                     batch_format="pyarrow"))

def zipf_slope(ds, group_column: str, text_column: str = "text", *,
               k: int = 100, log_digits: int = 5, digits: int = 6):
    """Per-group Zipf exponent: the OLS slope (and intercept) of
    ``ln(count)`` on ``ln(rank)`` over the group's top-``k`` terms —
    the corpus-health fingerprint a curation pipeline tracks per
    language/source (natural text ≈ −1; template farms and boilerplate
    mirrors flatten it, OCR noise steepens it).

    Determinism contract: both logs are snapped to a fixed-point
    ``10^-log_digits`` grid FIRST (``floor(ln(v)·10^log_digits + 0.5)``
    as int64 — ``ln`` is libm on both engines, bit-identical for exact
    integer inputs), and the regression runs on exact integer moments
    of the snapped grid values, so the only float ops are the closed-
    form divisions at the end — no summation-order ulps.  The 1e-5 log
    quantization IS the operator's defined semantics; its effect on the
    slope is ~1e-5, far inside the round-to-``digits`` output grid.

    Scale shape: vectorized per-batch (group, term) count partials →
    ONE vocab×groups ``groupby.sum`` → :func:`top_k_per_group` (block-
    local prune + one coarse bucket exchange) → groups×k moment rows →
    a groups-sized closed-form finish.  int64 headroom: with
    ``log_digits=5`` and ``k ≤ 1000``, |snapped log| ≤ ~4.4e6 even at
    2^63 term counts, so n·Σxy ≤ ~2e18 — safe at any corpus size.
    → (group, n_terms, slope, intercept)."""
    import math

    import numpy as np
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        words, doc_of, _ = flat_split_words(batch.column(text_column))
        if len(words) == 0:
            return pa.table({group_column: pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = batch.column(group_column)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        t = pa.table({group_column: g.take(pa.array(doc_of)),
                      "term": words})
        out = (t.group_by([group_column, "term"])
                .aggregate([("term", "count")]))
        return out.rename_columns([group_column, "term", "n"])

    merged = (ds.map_batches(count_partial, batch_format="pyarrow")
                .groupby([group_column, "term"])
                .aggregate(Sum("n", alias_name="n")))
    top = top_k_per_group(merged, group_column, "n", "term", k=k)

    lscale = 10 ** log_digits

    def moment_partial(b: pa.Table) -> pa.Table:
        ranks = b.column("rank").to_pylist()
        cnts = b.column("n").to_pylist()
        x = np.array([math.floor(math.log(r) * lscale + 0.5)
                      for r in ranks], np.int64)
        y = np.array([math.floor(math.log(c) * lscale + 0.5)
                      for c in cnts], np.int64)
        t = pa.table({group_column: b.column(group_column),
                      "np": pa.array(np.ones(len(x), np.int64)),
                      "sx": pa.array(x), "sy": pa.array(y),
                      "sxx": pa.array(x * x), "sxy": pa.array(x * y)})
        g = t.group_by([group_column]).aggregate(
            [("np", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("sxy", "sum")])
        return g.rename_columns([group_column, "np", "sx", "sy",
                                 "sxx", "sxy"])

    moments = (top.map_batches(moment_partial, batch_format="pyarrow")
                  .groupby(group_column)
                  .aggregate(Sum("np", alias_name="np"),
                             Sum("sx", alias_name="sx"),
                             Sum("sy", alias_name="sy"),
                             Sum("sxx", alias_name="sxx"),
                             Sum("sxy", alias_name="sxy")))

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("np").to_numpy(zero_copy_only=False)
        sx = b.column("sx").to_numpy(zero_copy_only=False)
        sy = b.column("sy").to_numpy(zero_copy_only=False)
        sxx = b.column("sxx").to_numpy(zero_copy_only=False)
        sxy = b.column("sxy").to_numpy(zero_copy_only=False)
        num = (n * sxy - sx * sy).astype(np.float64)
        vx = (n * sxx - sx * sx).astype(np.float64)
        ok = vx > 0
        slope = np.divide(num, vx, out=np.full(len(n), np.nan),
                          where=ok)
        inter = np.divide(sy - slope * sx, n,
                          out=np.full(len(n), np.nan), where=ok)
        sl = [round(float(v), digits) if m else None
              for v, m in zip(slope, ok)]
        ic = [round(float(v / lscale), digits) if m else None
              for v, m in zip(inter, ok)]
        return pa.table({group_column: b.column(group_column),
                         "n_terms": b.column("np"),
                         "slope": pa.array(sl, pa.float64()),
                         "intercept": pa.array(ic, pa.float64())})

    return moments.map_batches(finish, batch_format="pyarrow")


def source_diversity(ds, group_column: str, cat_column: str, *,
                     digits: int = 6):
    """Per-group categorical diversity: ``(group, n_docs, n_cats,
    simpson)`` — Simpson's diversity index 1 − Σ n_c(n_c−1) / t(t−1)
    of the category mix inside each group (0 = a single-source mirror
    host, → 1 = evenly mixed provenance).  Simpson rather than
    Shannon BY DESIGN: both numerator and denominator are exact int64
    sums, so the one float division obeys the repo's integer-moments
    rule — a Shannon entropy would be a summation-order-unsafe float
    Σ p·ln p at the rounding grid.  Single-row groups (t < 2) return
    NULL.

    Scale shape: per-batch (group, cat) Arrow count partials → ONE
    pair-keyed ``groupby.sum`` → hash(group)-coarse buckets where the
    index is a sorted run-length reduceat pass."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([group_column, cat_column])
        g = t.group_by([group_column, cat_column]).aggregate(
            [(cat_column, "count")])
        return g.rename_columns([group_column, cat_column, "pn"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby([group_column, cat_column])
                .aggregate(Sum("pn", alias_name="n")))

    def bucket(b: pa.Table) -> pa.Table:
        hs = [stable_hash64(str(v)) % 64
              for v in b.column(group_column).to_pylist()]
        return b.append_column("__pb", pa.array(hs, pa.int64()))

    scale = 10 ** digits

    def finish(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[(group_column, "ascending"),
                          (cat_column, "ascending")])
        g = g.take(order)
        k = g.column(group_column)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        n = g.column("n").to_numpy(zero_copy_only=False).astype(
            np.int64)
        ne = pc.fill_null(pc.not_equal(k.slice(1),
                                       k.slice(0, len(k) - 1)), True)
        starts = np.flatnonzero(
            np.r_[True, ne.to_numpy(zero_copy_only=False)])
        runlen = np.diff(np.r_[starts, len(n)])
        tot = np.add.reduceat(n, starts)
        num = np.add.reduceat(n * (n - 1), starts)
        denom = (tot * (tot - 1)).astype(np.float64)
        ok = denom > 0
        idx_v = np.floor(np.divide(
            (tot * (tot - 1) - num).astype(np.float64) * scale, denom,
            out=np.zeros(len(tot)), where=ok) + 0.5) / scale
        vals = [float(v) if m else None for v, m in zip(idx_v, ok)]
        return pa.table({
            group_column: k.take(pa.array(starts)),
            "n_docs": pa.array(tot, pa.int64()),
            "n_cats": pa.array(runlen.astype(np.int64)),
            "simpson": pa.array(vals, pa.float64())})

    return (merged.map_batches(bucket, batch_format="pyarrow")
                  .groupby("__pb")
                  .map_groups(finish, batch_format="pyarrow"))

def readability(ds, text_column: str = "text",
                id_column: str = "doc_id", *, digits: int = 4):
    """Per-document Flesch reading-ease (vowel-group syllable proxy):

        flesch = 206.835 − 1.015·(words/sentences)
                         − 84.6·(vowel_groups/words)

    with sentences = max(1, runs of [.!?]) and vowel groups = runs of
    [aeiouy] in the lowercased text — the classic graded-corpus /
    児童-content routing signal, cheap enough to run on every crawl
    page.  → (doc_id, n_words, n_sentences, n_syllables, flesch);
    word-less docs get NULL.

    Fully vectorized, zero exchanges: three Arrow RE2 count kernels +
    one per-row float expression of integer ratios (identical doubles
    on both engines, snapped half-up to ``digits``)."""
    import numpy as np
    import pyarrow.compute as pc

    scale = 10 ** digits

    def score(b: pa.Table) -> pa.Table:
        txt = pc.cast(b.column(text_column), pa.string())
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")
        w = pc.count_substring_regex(txt, r"\S+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        s = pc.count_substring_regex(txt, r"[.!?]+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        y = pc.count_substring_regex(
            pc.utf8_lower(txt), r"[aeiouy]+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        s = np.maximum(s, 1)
        ok = w > 0
        f = np.where(ok, np.floor(
            (206.835 - 1.015 * np.divide(w, s)
             - 84.6 * np.divide(y, np.maximum(w, 1))) * scale + 0.5)
            / scale, 0.0)
        vals = [float(v) if m else None for v, m in zip(f, ok)]
        return pa.table({
            id_column: b.column(id_column),
            "n_words": pa.array(w),
            "n_sentences": pa.array(s),
            "n_syllables": pa.array(y),
            "flesch": pa.array(vals, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")

def skyline2d(ds, x_column: str, y_column: str, *,
              keep_columns=None):
    """2-D Pareto frontier (maximize both): rows not strictly
    dominated by any other row (dominated = other is ≥ in both
    dimensions and > in at least one; equal points are mutually
    non-dominating and all kept) — the multi-criteria "best docs"
    selector (longest AND highest-quality, cheapest AND freshest)
    that no single score column can express.

    Scale shape: the skyline of a union IS the skyline of the per-part
    skylines, so one vectorized per-block prune (lexsort by (x desc,
    y desc) + running-max-of-y scan) shrinks the corpus to the union
    of local frontiers, and one single-group resolve of that
    frontier-mass-bounded survivor set finishes exactly.  No float
    arithmetic — only comparisons — so exact for any orderable
    numeric columns."""
    import numpy as np
    import pyarrow.compute as pc

    cols = list(keep_columns or [])
    for c in (x_column, y_column):
        if c not in cols:
            cols.append(c)

    def local_skyline(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.select(cols)
        x = b.column(x_column).to_numpy(zero_copy_only=False)
        y = b.column(y_column).to_numpy(zero_copy_only=False)
        # x desc, then y desc: a row is on the frontier iff its y
        # strictly exceeds the best y of every STRICTLY greater x —
        # with equal x grouped, compare against the running max of
        # PREVIOUS x-groups
        order = np.lexsort((-y, -x))
        xs, ys = x[order], y[order]
        new_x = np.r_[True, xs[1:] != xs[:-1]]
        gid = np.cumsum(new_x) - 1
        head_y = ys[np.flatnonzero(new_x)]  # per-group max y (y desc)
        # M_before[g] = best y among STRICTLY greater x; a group
        # survives iff its head beats it, and within a surviving
        # group exactly the head-y ties survive (same-x higher-y
        # dominates, equal points are mutually non-dominating)
        m_before = np.r_[-np.inf, np.maximum.accumulate(head_y)[:-1]]
        keep_group = head_y > m_before
        keep = keep_group[gid] & (ys == head_y[gid])
        sel = order[keep]
        return b.select(cols).take(pa.array(np.sort(sel)))

    pruned = ds.map_batches(local_skyline, batch_format="pyarrow")

    def add_g(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__g", pa.array(np.zeros(b.num_rows, np.int64)))

    def resolve(g: pa.Table) -> pa.Table:
        return local_skyline(g)

    return (pruned.map_batches(add_g, batch_format="pyarrow")
                  .groupby("__g")
                  .map_groups(resolve, batch_format="pyarrow"))

def grouped_weighted_median(ds, key_column: str, value_column: str,
                            weight_column: str, *, digits: int = 6):
    """Per-group WEIGHTED discrete median: the smallest value v with
    2·Σ(weights of rows ≤ v) ≥ Σ(all weights) — e.g. the
    token-weighted median document length ("the typical TRAINING TOKEN
    lives in a doc of length …", which corpus-mean stats misstate
    badly when long docs dominate token mass).  Integer weights keep
    the rank rule a pure int comparison — no float anywhere.

    Scale shape: per-batch (key, value) → Σweight partials (the
    grouped_median histogram posture, weights instead of counts), one
    pair-keyed ``groupby.sum``, and a keys×values-bounded driver
    read-off via one global cumsum + searchsorted."""
    import numpy as np

    from ray.data.aggregate import Sum

    import ray.data as rd

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([key_column, value_column, weight_column])
        g = t.group_by([key_column, value_column]).aggregate(
            [(weight_column, "sum")])
        return g.rename_columns([key_column, value_column, "pw"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby([key_column, value_column])
                .aggregate(Sum("pw", alias_name="w"))).to_pandas()
    merged = merged.sort_values([key_column, value_column])
    if not len(merged):
        return rd.from_arrow(pa.table({
            key_column: pa.array([]),
            "wmedian": pa.array([], pa.float64())}))
    k = merged[key_column].to_numpy()
    vals = merged[value_column].to_numpy().astype(np.float64)
    w = merged["w"].to_numpy().astype(np.int64)
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    runlen = np.diff(np.r_[starts, len(k)])
    gc = np.cumsum(w)
    base = np.r_[0, gc[starts[1:] - 1]]
    totals = np.add.reduceat(w, starts)
    # smallest v with 2·cum ≥ total: searchsorted on the per-group
    # cumulative weights for ceil(total/2)
    need = (totals + 1) // 2
    idx = np.searchsorted(gc, base + need)
    return rd.from_arrow(pa.table({
        key_column: pa.array(k[starts]),
        "wmedian": pa.array(
            [round(float(v), digits) for v in vals[idx]],
            pa.float64())}))


def winsorized_mean(ds, key_column: str, value_column: str, *,
                    lo_q: float = 0.05, hi_q: float = 0.95,
                    digits: int = 6):
    """Per-group winsorized mean: values clip to the group's exact
    quantile_disc(lo_q)/(hi_q) thresholds before averaging — the
    outlier-insensitive mean a telemetry rollup wants when a handful
    of 100 MB pages would otherwise dominate a host's average.
    → (key, lo, hi, wmean).

    Exactness: thresholds are actual data values (quantile_disc), so
    clipped integer values sum to an exact int64 and the mean is one
    division of identical ints, rounded half-away.

    Scale shape: one grouped_quantiles histogram pass for thresholds →
    groups-sized join back onto the corpus (no broadcast assumption) →
    clipped integer Σ partials → groups-sized finish."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from .joins import _join_partitions, _nonempty_blocks, safe_join

    import ray.data as rd

    empty = pa.table({key_column: pa.array([], pa.string()),
                      "lo": pa.array([], pa.float64()),
                      "hi": pa.array([], pa.float64()),
                      "wmean": pa.array([], pa.float64())})
    th = grouped_quantiles(ds, key_column, value_column,
                           qs=[lo_q, hi_q], digits=digits)

    def pivot(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        out = df.pivot_table(index=key_column, columns="q",
                             values="quantile").reset_index()
        out.columns = [key_column, "lo", "hi"]
        return pa.Table.from_pandas(out, preserve_index=False)

    th2 = _nonempty_blocks(th.map_batches(
        pivot, batch_format="pyarrow").materialize())
    if th2 is None:
        return rd.from_arrow(empty)
    th2 = th2.map_batches(
        lambda b: pa.table({"__tk": b.column(key_column),
                            "lo": b.column("lo"),
                            "hi": b.column("hi")}),
        batch_format="pyarrow").materialize()
    th2 = _nonempty_blocks(th2) or th2

    joined = safe_join(ds.select_columns([key_column, value_column]),
                       th2, "inner", 16,
                       on=(key_column,), right_on=("__tk",))
    if joined is None:
        return rd.from_arrow(empty)

    def clip_partial(b: pa.Table) -> pa.Table:
        v = b.column(value_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lo = b.column("lo").to_numpy(zero_copy_only=False)
        hi = b.column("hi").to_numpy(zero_copy_only=False)
        c = np.clip(v, lo.astype(np.int64), hi.astype(np.int64))
        t = pa.table({key_column: b.column(key_column),
                      "n": pa.array(np.ones(len(c), np.int64)),
                      "s": pa.array(c),
                      "lo": b.column("lo"), "hi": b.column("hi")})
        g = t.group_by([key_column]).aggregate(
            [("n", "sum"), ("s", "sum"), ("lo", "min"), ("hi", "min")])
        return g.rename_columns([key_column, "n", "s", "lo", "hi"])

    from ray.data.aggregate import Min

    merged = (joined.map_batches(clip_partial, batch_format="pyarrow")
                    .groupby(key_column)
                    .aggregate(Sum("n", alias_name="n"),
                               Sum("s", alias_name="s"),
                               Min("lo", alias_name="lo"),
                               Min("hi", alias_name="hi")))

    scale = 10 ** digits

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False)
        s = b.column("s").to_numpy(zero_copy_only=False)
        m = np.floor(s.astype(np.float64) * scale / n + 0.5) / scale
        return pa.table({key_column: b.column(key_column),
                         "lo": b.column("lo"), "hi": b.column("hi"),
                         "wmean": pa.array(m, pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")

def mannwhitney_u(ds, group_column: str, side_column: str,
                  value_column: str, *, side_a, side_b):
    """Per-group exact Mann–Whitney U statistic between two labeled
    samples: U = #{(a, b) : v_a > v_b} + ½·#{v_a = v_b} — the
    nonparametric "did the distribution shift" test a data-quality
    monitor runs between crawl snapshots or corpus halves, computed
    WITHOUT pair enumeration.  → (group, n_a, n_b, u).  Counts are
    exact ints and ties contribute exact binary halves, so u is
    bit-identical across engines and batchings.

    Scale shape: per-batch (group, value, side) count partials → one
    (group, value)-keyed ``groupby`` merge → hash(group)-coarse
    buckets where U folds in one sorted cumsum/reduceat pass over the
    value histogram — the grouped_median exchange bound (keys ×
    distinct values), never n_a × n_b pairs."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64

    def partial(b: pa.Table) -> pa.Table:
        side = b.column(side_column)
        ina = pc.cast(pc.equal(side, side_a), pa.int64())
        inb = pc.cast(pc.equal(side, side_b), pa.int64())
        t = pa.table({group_column: b.column(group_column),
                      value_column: b.column(value_column),
                      "ca": ina, "cb": inb})
        g = t.group_by([group_column, value_column]).aggregate(
            [("ca", "sum"), ("cb", "sum")])
        return g.rename_columns([group_column, value_column,
                                 "ca", "cb"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby([group_column, value_column])
                .aggregate(Sum("ca", alias_name="ca"),
                           Sum("cb", alias_name="cb")))

    def bucket(b: pa.Table) -> pa.Table:
        hs = [stable_hash64(str(v)) % 64
              for v in b.column(group_column).to_pylist()]
        return b.append_column("__pb", pa.array(hs, pa.int64()))

    def fold(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[(group_column, "ascending"),
                          (value_column, "ascending")])
        g = g.take(order)
        k = g.column(group_column)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        ca = g.column("ca").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cb = g.column("cb").to_numpy(zero_copy_only=False).astype(
            np.int64)
        ne = pc.fill_null(pc.not_equal(k.slice(1),
                                       k.slice(0, len(k) - 1)), True)
        starts = np.flatnonzero(
            np.r_[True, ne.to_numpy(zero_copy_only=False)])
        runlen = np.diff(np.r_[starts, len(ca)])
        # per group: cumulative b-count strictly below each value —
        # global cumsum minus the row itself minus the group's offset
        gcb = np.cumsum(cb)
        base = np.repeat(np.r_[0, gcb[starts[1:] - 1]], runlen)
        below = (gcb - cb) - base
        u2 = np.add.reduceat(ca * 2 * below + ca * cb, starts)
        na = np.add.reduceat(ca, starts)
        nb = np.add.reduceat(cb, starts)
        return pa.table({
            group_column: k.take(pa.array(starts)),
            "n_a": pa.array(na), "n_b": pa.array(nb),
            "u": pa.array(u2.astype(np.float64) / 2.0, pa.float64())})

    return (merged.map_batches(bucket, batch_format="pyarrow")
                  .groupby("__pb")
                  .map_groups(fold, batch_format="pyarrow"))


def grouped_auc(ds, group_column: str, y_column: str, score_column: str):
    """Per-group exact ROC-AUC of a score against a 0/1 label — the
    classifier-evaluation primitive (no reference analogue; llm-food
    evaluates nothing — brief-scope training-data operator):

        AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻)
            = U / (n_pos · n_neg)

    i.e. the Mann–Whitney U of the positive sample against the
    negative one, normalized — so this is a thin finisher over
    :func:`mannwhitney_u` (sides = label 1 / label 0, values = the
    score column) and inherits its exactness contract: U is an exact
    binary half-integer folded from the (group, score) value
    histogram, and the one float division of two exactly-representable
    numbers is IEEE-identical across engines.  Groups with an empty
    class get a NULL auc (AUC is undefined there).

    Scale shape: identical to ``mannwhitney_u`` — per-batch count
    partials → one (group, score)-keyed merge → coarse-bucket cumsum
    fold; the exchange is keys × distinct scores, never n⁺ × n⁻
    pairs.  → (group, n_pos, n_neg, auc)."""
    import numpy as np

    mw = mannwhitney_u(ds, group_column, y_column, score_column,
                       side_a=1, side_b=0)

    def finish(b: pa.Table) -> pa.Table:
        na = b.column("n_a").to_numpy(zero_copy_only=False).astype(
            np.int64)
        nb = b.column("n_b").to_numpy(zero_copy_only=False).astype(
            np.int64)
        u = b.column("u").to_numpy(zero_copy_only=False)
        prod = (na * nb).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            auc = np.where(prod > 0, u / prod, np.nan)
        return pa.table({
            group_column: b.column(group_column),
            "n_pos": pa.array(na), "n_neg": pa.array(nb),
            "auc": pa.array(auc, pa.float64(),
                            mask=~(prod > 0))})

    return mw.map_batches(finish, batch_format="pyarrow")


def threshold_metrics(ds, group_column: str, y_column: str,
                      score_column: str):
    """Per-group precision/recall/F1 at EVERY realized score threshold
    (predict positive ⇔ score ≥ t) — the full PR sweep a pipeline runs
    to pick a filter cutoff for a cheap quality signal (no reference
    analogue; llm-food evaluates nothing — brief-scope operator).

    Exactness: tp/fp/fn are suffix sums of the (group, score) count
    histogram — exact int64 — and each metric is ONE division of two
    exactly-representable ints (IEEE-identical across engines).
    tp+fp ≥ 1 always (the threshold row itself counts), so precision
    never divides by zero; recall/f1 are NULL when the group has no
    positives.

    Scale shape: identical to :func:`mannwhitney_u` — per-batch count
    partials → one (group, score)-keyed merge → hash(group)-coarse
    buckets folded with sorted cumsums.  Output is keys × distinct
    scores (a report, same bound as the histogram exchange).
    → (group, threshold, tp, fp, fn, precision, recall, f1)."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64

    def partial(b: pa.Table) -> pa.Table:
        y = pc.cast(pc.equal(b.column(y_column), 1), pa.int64())
        t = pa.table({group_column: b.column(group_column),
                      score_column: b.column(score_column),
                      "ca": y, "cb": pc.subtract(1, y)})
        g = t.group_by([group_column, score_column]).aggregate(
            [("ca", "sum"), ("cb", "sum")])
        return g.rename_columns([group_column, score_column, "ca", "cb"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby([group_column, score_column])
                .aggregate(Sum("ca", alias_name="ca"),
                           Sum("cb", alias_name="cb")))

    def bucket(b: pa.Table) -> pa.Table:
        hs = [stable_hash64(str(v)) % 64
              for v in b.column(group_column).to_pylist()]
        return b.append_column("__pb", pa.array(hs, pa.int64()))

    def fold(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[(group_column, "ascending"),
                          (score_column, "ascending")])
        g = g.take(order)
        k = g.column(group_column)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        ca = g.column("ca").to_numpy(zero_copy_only=False).astype(np.int64)
        cb = g.column("cb").to_numpy(zero_copy_only=False).astype(np.int64)
        ne = pc.fill_null(pc.not_equal(k.slice(1),
                                       k.slice(0, len(k) - 1)), True)
        starts = np.flatnonzero(
            np.r_[True, ne.to_numpy(zero_copy_only=False)])
        runlen = np.diff(np.r_[starts, len(ca)])
        cpos, cneg = np.cumsum(ca), np.cumsum(cb)
        base_p = np.repeat(np.r_[0, cpos[starts[1:] - 1]], runlen)
        base_n = np.repeat(np.r_[0, cneg[starts[1:] - 1]], runlen)
        npos = np.repeat(np.add.reduceat(ca, starts), runlen)
        nneg = np.repeat(np.add.reduceat(cb, starts), runlen)
        tp = npos - (cpos - ca - base_p)
        fp = nneg - (cneg - cb - base_n)
        fn = npos - tp
        prec = tp.astype(np.float64) / (tp + fp).astype(np.float64)
        has_pos = npos > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            rec = np.where(has_pos, tp / npos.astype(np.float64), np.nan)
            f1 = np.where(has_pos,
                          (2 * tp).astype(np.float64)
                          / (tp + fp + npos).astype(np.float64), np.nan)
        return pa.table({
            group_column: k,
            "threshold": g.column(score_column),
            "tp": pa.array(tp), "fp": pa.array(fp), "fn": pa.array(fn),
            "precision": pa.array(prec, pa.float64()),
            "recall": pa.array(rec, pa.float64(), mask=~has_pos),
            "f1": pa.array(f1, pa.float64(), mask=~has_pos)})

    return (merged.map_batches(bucket, batch_format="pyarrow")
                  .groupby("__pb")
                  .map_groups(fold, batch_format="pyarrow"))


def calibration_bins(ds, group_column: str, y_column: str,
                     score_column: str, *, n_bins: int = 10,
                     score_scale: int = 1000):
    """Per-(group, bin) calibration decomposition of an integer score
    in ``[0, score_scale]`` against a 0/1 label: bin count, positive
    count, exact score mass, observed positive rate, and mean predicted
    rate — the inputs to a reliability diagram / ECE.  The drift_psi
    rule applied to calibration: emit the EXACT per-bin decomposition
    (n, n_pos, sum_score all int64; the two rates are single divisions
    of exact ints), never the cross-bin float ECE sum.

    Bin id = min(score·n_bins // score_scale, n_bins−1) — pure integer
    arithmetic, replicable in SQL verbatim.  Scale shape: one streaming
    per-batch partial → one (group, bin)-keyed merge; output is
    groups × n_bins. → (group, bin, n, n_pos, sum_score, frac_pos,
    mean_score)."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        s = b.column(score_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        bins = np.minimum(s * n_bins // score_scale, n_bins - 1)
        y = pc.cast(pc.equal(b.column(y_column), 1), pa.int64())
        t = pa.table({group_column: b.column(group_column),
                      "bin": pa.array(bins),
                      "n": pa.array(np.ones(len(b), np.int64)),
                      "n_pos": y, "sum_score": pa.array(s)})
        g = t.group_by([group_column, "bin"]).aggregate(
            [("n", "sum"), ("n_pos", "sum"), ("sum_score", "sum")])
        return g.rename_columns(
            [group_column, "bin", "n", "n_pos", "sum_score"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby([group_column, "bin"])
                .aggregate(Sum("n", alias_name="n"),
                           Sum("n_pos", alias_name="n_pos"),
                           Sum("sum_score", alias_name="sum_score")))

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        npos = b.column("n_pos").to_numpy(zero_copy_only=False)
        ssum = b.column("sum_score").to_numpy(zero_copy_only=False)
        return pa.table({
            group_column: b.column(group_column),
            "bin": b.column("bin"), "n": b.column("n"),
            "n_pos": b.column("n_pos"),
            "sum_score": b.column("sum_score"),
            "frac_pos": pa.array(npos / n, pa.float64()),
            "mean_score": pa.array(ssum / (n * score_scale),
                                   pa.float64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def label_agreement(ds, group_column: str, a_column: str, b_column: str):
    """Per-group Cohen's kappa between two label columns — "do two
    cheap filter signals agree beyond chance" (the audit run before
    swapping one quality heuristic for another; no reference analogue
    — brief-scope operator).  Multi-class:

        κ = (n·Σ n_kk − Σ row_k·col_k) / (n² − Σ row_k·col_k)

    where every moment (diagonal mass, row/col margins, their cross
    products) is an exact int64 from the (group, a, b) confusion
    histogram, so κ is ONE division of two exact ints — IEEE-identical
    across engines.  All-diagonal groups with a single label (pe = n²)
    have undefined κ → NULL.

    Scale shape: per-batch confusion partials → one (group, a, b)-keyed
    merge (groups × labels² rows, histogram-bounded) → hash(group)-
    coarse buckets folded with vectorized pandas margin merges (whole-
    bucket ops, never per group). → (group, n, agree, pe_num, kappa)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({group_column: b.column(group_column),
                      "__a": b.column(a_column),
                      "__b": b.column(b_column),
                      "c": pa.array(np.ones(len(b), np.int64))})
        g = t.group_by([group_column, "__a", "__b"]).aggregate(
            [("c", "sum")])
        return g.rename_columns([group_column, "__a", "__b", "c"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby([group_column, "__a", "__b"])
                .aggregate(Sum("c", alias_name="c")))

    def bucket(b: pa.Table) -> pa.Table:
        hs = [stable_hash64(str(v)) % 64
              for v in b.column(group_column).to_pylist()]
        return b.append_column("__pb", pa.array(hs, pa.int64()))

    def fold(g: pa.Table) -> pa.Table:
        df = g.select([group_column, "__a", "__b", "c"]).to_pandas()
        ra = (df.groupby([group_column, "__a"], sort=False)["c"].sum()
                .reset_index().rename(columns={"__a": "__k",
                                               "c": "row_c"}))
        cb = (df.groupby([group_column, "__b"], sort=False)["c"].sum()
                .reset_index().rename(columns={"__b": "__k",
                                               "c": "col_c"}))
        cross = ra.merge(cb, on=[group_column, "__k"], how="inner")
        cross["pe"] = cross["row_c"].astype(np.int64) * cross["col_c"]
        pe = cross.groupby(group_column, sort=True)["pe"].sum()
        n = df.groupby(group_column, sort=True)["c"].sum()
        diag = df[df["__a"] == df["__b"]]
        agree = (diag.groupby(group_column, sort=True)["c"].sum()
                 .reindex(n.index, fill_value=0))
        pe = pe.reindex(n.index, fill_value=0)
        nn = n.to_numpy(np.int64)
        pev = pe.to_numpy(np.int64)
        ag = agree.to_numpy(np.int64)
        denom = nn * nn - pev
        with np.errstate(divide="ignore", invalid="ignore"):
            kappa = np.where(denom != 0,
                             (nn * ag - pev) / denom.astype(np.float64),
                             np.nan)
        return pa.table({
            group_column: pa.array(n.index),
            "n": pa.array(nn), "agree": pa.array(ag),
            "pe_num": pa.array(pev),
            "kappa": pa.array(kappa, pa.float64(), mask=denom == 0)})

    return (merged.map_batches(bucket, batch_format="pyarrow")
                  .groupby("__pb")
                  .map_groups(fold, batch_format="pyarrow"))


def spearman_rho(ds, x_column: str, y_column: str, *,
                 digits: int = 6, max_cells: int = 50_000_000):
    """Exact global Spearman ρ rank correlation between two INTEGER
    columns — Pearson over midranks, with every moment an exact int64
    folded from the same 2-D value histogram as :func:`kendall_tau`
    (never per-row ranks, never the n² pair space):

        rx2(v) = 2·cum_below(v) + cnt(v) + 1   (doubled midrank)
        ρ = (Sxy4 − n(n+1)²) /
            (√(Sxx4 − n(n+1)²) · √(Syy4 − n(n+1)²))

    using Σ c·rx2 = n(n+1) exactly.  Doubled midranks keep ties
    integer; the one division and the two sqrts (IEEE sqrt is
    correctly rounded) act on exactly-representable ints, and the
    result snaps to ``digits`` like kendall's.  Int64 headroom:
    Sxy4 ≤ 4n³ needs n ≲ 1.3e6 — the same driver-gather regime the
    ``max_cells`` guard already implies; bin upstream past that.

    Scale shape: identical to kendall — per-batch (x, y) count
    partials → cells-keyed ``groupby.sum`` → marginal-cumsum driver
    fold.  → one row (n, rho); constant columns → NULL rho."""
    import numpy as np

    from ray.data.aggregate import Sum

    import ray.data as rd

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"x": b.column(x_column), "y": b.column(y_column)})
        g = t.group_by(["x", "y"]).aggregate([("y", "count")])
        return g.rename_columns(["x", "y", "pn"])

    cells = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["x", "y"])
               .aggregate(Sum("pn", alias_name="n"))).to_pandas()
    if len(cells) > max_cells:
        raise ValueError(f"{len(cells)} cells exceed max_cells")
    if not len(cells):
        return rd.from_arrow(pa.table({
            "n": pa.array([], pa.int64()),
            "rho": pa.array([], pa.float64())}))
    c = cells["n"].to_numpy().astype(np.int64)
    xs, xi = np.unique(cells["x"].to_numpy(), return_inverse=True)
    ys, yi = np.unique(cells["y"].to_numpy(), return_inverse=True)
    row_tot = np.zeros(len(xs), np.int64)
    np.add.at(row_tot, xi, c)
    col_tot = np.zeros(len(ys), np.int64)
    np.add.at(col_tot, yi, c)
    rx2 = 2 * (np.cumsum(row_tot) - row_tot) + row_tot + 1
    ry2 = 2 * (np.cumsum(col_tot) - col_tot) + col_tot + 1
    n = int(c.sum())
    sxy4 = int((c * rx2[xi] * ry2[yi]).sum())
    sxx4 = int((row_tot * rx2 * rx2).sum())
    syy4 = int((col_tot * ry2 * ry2).sum())
    mean4 = n * (n + 1) * (n + 1)
    num = sxy4 - mean4
    vx, vy = sxx4 - mean4, syy4 - mean4
    if vx > 0 and vy > 0:
        rho = round(float(num) / (np.sqrt(float(vx))
                                  * np.sqrt(float(vy))), digits)
    else:
        rho = None
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "rho": pa.array([rho], pa.float64())}))


def grouped_gini(ds, group_column: str, value_column: str):
    """Per-group exact Gini coefficient of a non-negative INTEGER
    value — the concentration audit a curation pipeline runs on token
    mass per source/host ("do a few documents carry all the tokens"):

        G = Σ_v x_v·c_v·(2·below_v + c_v − n) / (n · W),  W = Σ x·c

    where ``below`` is the item count strictly below v, so the
    numerator is the tie-correct closed form of Σ (2i − n − 1)x_i
    over the sorted items — an exact int64 from the (group, value)
    histogram; the denominator is one IEEE product of two
    exactly-converted ints and the division is single.  Zero-mass
    groups (W = 0) → NULL.

    Scale shape: the :func:`mannwhitney_u` plan — per-batch count
    partials → one (group, value)-keyed merge → hash(group)-coarse
    buckets folded with sorted cumsums.  → (group, n, gini)."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({group_column: b.column(group_column),
                      value_column: b.column(value_column)})
        g = t.group_by([group_column, value_column]).aggregate(
            [(value_column, "count")])
        return g.rename_columns([group_column, value_column, "c"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby([group_column, value_column])
                .aggregate(Sum("c", alias_name="c")))

    def bucket(b: pa.Table) -> pa.Table:
        hs = [stable_hash64(str(v)) % 64
              for v in b.column(group_column).to_pylist()]
        return b.append_column("__pb", pa.array(hs, pa.int64()))

    def fold(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[(group_column, "ascending"),
                          (value_column, "ascending")])
        g = g.take(order)
        k = g.column(group_column)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        x = g.column(value_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        c = g.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        ne = pc.fill_null(pc.not_equal(k.slice(1),
                                       k.slice(0, len(k) - 1)), True)
        starts = np.flatnonzero(
            np.r_[True, ne.to_numpy(zero_copy_only=False)])
        runlen = np.diff(np.r_[starts, len(c)])
        cum = np.cumsum(c)
        base = np.repeat(np.r_[0, cum[starts[1:] - 1]], runlen)
        below = cum - c - base
        n = np.repeat(np.add.reduceat(c, starts), runlen)
        bnum = np.add.reduceat(x * c * (2 * below + c - n), starts)
        ng = np.add.reduceat(c, starts)
        w = np.add.reduceat(x * c, starts)
        denom = ng.astype(np.float64) * w.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            gini = np.where(w > 0, bnum / denom, np.nan)
        return pa.table({
            group_column: k.take(pa.array(starts)),
            "n": pa.array(ng),
            "gini": pa.array(gini, pa.float64(), mask=~(w > 0))})

    return (merged.map_batches(bucket, batch_format="pyarrow")
                  .groupby("__pb")
                  .map_groups(fold, batch_format="pyarrow"))


def ks_test(ds, group_column: str, side_column: str, value_column: str,
            *, side_a, side_b, digits: int = 6):
    """Per-group exact two-sample Kolmogorov–Smirnov statistic —
    D = max_v |F_a(v) − F_b(v)| over the pooled support — the
    distribution-shift test that sees SHAPE changes MWU's rank sum
    misses (and vice versa; the repo ships both).

    Exactness: both empirical CDFs fold from the same (group, value)
    count histogram; each CDF value is one division of exact ints, the
    pointwise |diff| and max are order-independent, and D snaps
    half-away to ``digits``.  Empty sides → NULL.

    Scale shape: the :func:`mannwhitney_u` plan verbatim — per-batch
    count partials → one (group, value)-keyed merge → hash(group)-
    coarse buckets folded with sorted cumsums.  → (group, n_a, n_b,
    d_stat)."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64

    def partial(b: pa.Table) -> pa.Table:
        side = b.column(side_column)
        ina = pc.cast(pc.equal(side, side_a), pa.int64())
        inb = pc.cast(pc.equal(side, side_b), pa.int64())
        t = pa.table({group_column: b.column(group_column),
                      value_column: b.column(value_column),
                      "ca": ina, "cb": inb})
        g = t.group_by([group_column, value_column]).aggregate(
            [("ca", "sum"), ("cb", "sum")])
        return g.rename_columns([group_column, value_column,
                                 "ca", "cb"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby([group_column, value_column])
                .aggregate(Sum("ca", alias_name="ca"),
                           Sum("cb", alias_name="cb")))

    def bucket(b: pa.Table) -> pa.Table:
        hs = [stable_hash64(str(v)) % 64
              for v in b.column(group_column).to_pylist()]
        return b.append_column("__pb", pa.array(hs, pa.int64()))

    scale = 10 ** digits

    def fold(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[(group_column, "ascending"),
                          (value_column, "ascending")])
        g = g.take(order)
        k = g.column(group_column)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        ca = g.column("ca").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cb = g.column("cb").to_numpy(zero_copy_only=False).astype(
            np.int64)
        ne = pc.fill_null(pc.not_equal(k.slice(1),
                                       k.slice(0, len(k) - 1)), True)
        starts = np.flatnonzero(
            np.r_[True, ne.to_numpy(zero_copy_only=False)])
        runlen = np.diff(np.r_[starts, len(ca)])
        cuma, cumb = np.cumsum(ca), np.cumsum(cb)
        base_a = np.repeat(np.r_[0, cuma[starts[1:] - 1]], runlen)
        base_b = np.repeat(np.r_[0, cumb[starts[1:] - 1]], runlen)
        na = np.add.reduceat(ca, starts)
        nb = np.add.reduceat(cb, starts)
        na_r = np.repeat(na, runlen)
        nb_r = np.repeat(nb, runlen)
        with np.errstate(divide="ignore", invalid="ignore"):
            fa = (cuma - base_a) / na_r
            fb = (cumb - base_b) / nb_r
            diff = np.abs(fa - fb)
        diff = np.where((na_r > 0) & (nb_r > 0), diff, np.nan)
        d = np.maximum.reduceat(np.nan_to_num(diff), starts)
        d = np.floor(d * scale + 0.5) / scale
        ok = (na > 0) & (nb > 0)
        return pa.table({
            group_column: k.take(pa.array(starts)),
            "n_a": pa.array(na), "n_b": pa.array(nb),
            "d_stat": pa.array(np.where(ok, d, np.nan), pa.float64(),
                               mask=~ok)})

    return (merged.map_batches(bucket, batch_format="pyarrow")
                  .groupby("__pb")
                  .map_groups(fold, batch_format="pyarrow"))


def length_outliers(ds, group_column: str, value_column: str, *,
                    k_mad: int = 5):
    """Robust per-group outlier REPORT: rows whose value deviates from
    the group median by more than ``k_mad``·MAD — the "drop weird
    docs" audit (corrupt extractions, concatenation bugs, binary blobs
    parked in a text column), composed from :func:`grouped_mad`.

    Exactness: median and MAD are exact ``quantile_disc`` values of an
    integer domain, so the keep rule ``|v − med| > k·mad`` is a pure
    integer comparison — no float ever decides membership.

    Scale shape: grouped_mad's two histogram passes → a groups-sized
    (median, mad) table broadcast into one streaming filter pass.
    → the outlier rows + (median, mad) provenance."""
    import numpy as np

    import ray as _ray

    md = grouped_mad(ds, group_column, value_column)
    rows = md.take_all()
    keys = np.array(sorted(str(r[group_column]) for r in rows))
    by = {str(r[group_column]): (int(r["median"]), int(r["mad"]))
          for r in rows}
    med = np.array([by[k][0] for k in keys], np.int64)
    mad = np.array([by[k][1] for k in keys], np.int64)
    ref = _ray.put((keys, med, mad))

    def flag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ks, me, ma = _ray.get(ref)
        if not len(ks):
            t = b.append_column(
                "median", pa.array(np.zeros(len(b), np.int64)))
            t = t.append_column(
                "mad", pa.array(np.zeros(len(b), np.int64)))
            return t.slice(0, 0)
        # dictionary-encode the group column: the per-key Python str()
        # runs once per DISTINCT group per batch, rows gather via codes
        denc = pc.dictionary_encode(
            pc.cast(b.column(group_column), pa.string()))
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        dvals = np.asarray(denc.dictionary.to_pylist(), dtype=str)
        codes = denc.indices.to_numpy(zero_copy_only=False)
        didx = np.clip(np.searchsorted(ks, dvals), 0, len(ks) - 1)
        v = b.column(value_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        med_r = me[didx][codes]
        mad_r = ma[didx][codes]
        keep = np.abs(v - med_r) > k_mad * mad_r
        t = b.append_column("median", pa.array(med_r)) \
             .append_column("mad", pa.array(mad_r))
        return t.filter(pa.array(keep))

    return ds.map_batches(flag, batch_format="pyarrow")


def c4_line_filter(ds, text_column: str = "text", *,
                   min_words: int = 4):
    """C4-style per-LINE cleaning (Raffel et al. '20): keep lines that
    end in terminal punctuation (``.!?"``), have ≥ ``min_words`` words,
    and contain neither ``javascript`` (case-insensitive) nor ``{`` —
    then rejoin survivors.  The per-doc report (n_lines, n_kept,
    clean) keeps the decomposition auditable.

    Scale shape: pure streaming map — lines explode via Arrow
    ``split_pattern``/``list_flatten``/``list_parent_indices`` with
    all four rules as vectorized RE2/substring kernels over the FLAT
    line array; reassembly is one whole-batch pandas groupby-join over
    kept lines (batch-bounded, never per doc).  Zero exchanges."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    def clean(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b.column(text_column), "")
        lines = pc.split_pattern(t, pattern="\n")
        flat = pc.list_flatten(lines)
        parent = pc.list_parent_indices(lines).to_numpy(
            zero_copy_only=False)
        ends = pc.match_substring_regex(flat, r"[.!?\"]$")
        enough = pc.greater_equal(
            pc.count_substring_regex(flat, r"[^\s]+"), min_words)
        no_js = pc.invert(pc.match_substring(flat, "javascript",
                                             ignore_case=True))
        no_brace = pc.invert(pc.match_substring(flat, "{"))
        keep = pc.and_(pc.and_(ends, enough),
                       pc.and_(no_js, no_brace)).to_numpy(
            zero_copy_only=False)
        n_docs = len(b)
        n_lines = np.zeros(n_docs, np.int64)
        np.add.at(n_lines, parent, 1)
        n_kept = np.zeros(n_docs, np.int64)
        np.add.at(n_kept, parent[keep], 1)
        kept_df = pd.DataFrame({
            "p": parent[keep],
            "l": flat.to_pandas()[keep].to_numpy()})
        joined = kept_df.groupby("p", sort=True)["l"].agg("\n".join)
        clean_col = np.full(n_docs, "", object)
        clean_col[joined.index.to_numpy()] = joined.to_numpy()
        out = {c: b.column(c) for c in b.column_names
               if c != text_column}
        out.update({"n_lines": pa.array(n_lines),
                    "n_kept": pa.array(n_kept),
                    "clean": pa.array(clean_col, pa.string())})
        return pa.table(out)

    return ds.map_batches(clean, batch_format="pyarrow")


def gopher_flags(ds, text_column: str = "text", *,
                 min_words: int = 50, max_words: int = 100_000):
    """Gopher-style quality-rule DECOMPOSITION per document (Rae et
    al. '21 repetition-free subset of the rules, integer-exact): one
    flag column per rule plus the composed ``pass`` — emitted per
    rule, not just the verdict, so a curation run can audit WHICH rule
    drops what (the drift_psi decomposition posture applied to
    filtering).  Every rule is a pure integer comparison — ratio
    thresholds are cross-multiplied (mean word length in [3, 10] ⇔
    ``3·n_words ≤ sum_chars ≤ 10·n_words``) so no float ever appears:

    - ``f_wordcount``: min_words ≤ n_words ≤ max_words
    - ``f_meanlen``:   3·n_words ≤ sum_word_chars ≤ 10·n_words
    - ``f_symbol``:    10·(#'#' + #'...') ≤ n_words
    - ``f_bullet``:    2·bullet_lines ≤ n_lines
    - ``f_ellipsis``:  10·ellipsis_end_lines ≤ 3·n_lines
    - ``f_alpha``:     10·alpha_words ≥ 8·n_words

    All counts are Arrow RE2 kernels (shared regex semantics with the
    DuckDB twin); zero exchanges — a pure streaming map.
    → (…, n_words, n_lines, f_*, pass)."""
    import numpy as np
    import pyarrow.compute as pc

    def flags(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b.column(text_column), "")
        n_words = pc.count_substring_regex(t, r"[^\s]+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        stripped = pc.replace_substring_regex(t, r"\s+", "")
        sum_chars = pc.utf8_length(stripped).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_hash = pc.count_substring(t, "#").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_ell = pc.count_substring(t, "...").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_lines = pc.count_substring(t, "\n").to_numpy(
            zero_copy_only=False).astype(np.int64) + 1
        bullets = (pc.count_substring_regex(t, r"\n[-*•]").to_numpy(
            zero_copy_only=False).astype(np.int64)
            + pc.cast(pc.match_substring_regex(t, r"^[-*•]"),
                      pa.int64()).to_numpy(zero_copy_only=False))
        ell_end = (pc.count_substring(t, "...\n").to_numpy(
            zero_copy_only=False).astype(np.int64)
            + pc.cast(pc.ends_with(t, "..."), pa.int64()).to_numpy(
                zero_copy_only=False))
        alpha_w = pc.count_substring_regex(
            t, r"(?:^|[\s])[^\s]*[A-Za-z]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        f_wc = (n_words >= min_words) & (n_words <= max_words)
        f_ml = (3 * n_words <= sum_chars) & (sum_chars <= 10 * n_words)
        f_sy = 10 * (n_hash + n_ell) <= n_words
        f_bu = 2 * bullets <= n_lines
        f_el = 10 * ell_end <= 3 * n_lines
        f_al = 10 * alpha_w >= 8 * n_words
        keep_cols = {c: b.column(c) for c in b.column_names
                     if c != text_column}
        keep_cols.update({
            "n_words": pa.array(n_words), "n_lines": pa.array(n_lines),
            "f_wordcount": pa.array(f_wc), "f_meanlen": pa.array(f_ml),
            "f_symbol": pa.array(f_sy), "f_bullet": pa.array(f_bu),
            "f_ellipsis": pa.array(f_el), "f_alpha": pa.array(f_al),
            "pass": pa.array(f_wc & f_ml & f_sy & f_bu & f_el & f_al)})
        return pa.table(keep_cols)

    return ds.map_batches(flags, batch_format="pyarrow")


def fertility_by_group(ds, group_column: str, text_column: str = "text"):
    """Per-group tokenizer fertility — tokens per whitespace word
    (``\\w+|[^\\w\\s]`` BPE-ish proxy): the "how much does tokenizing
    this language cost" audit that sizes token budgets per corpus
    slice.  Both counts are Arrow RE2 kernels summed as exact int64
    per-batch partials → one groups-sized merge; fertility is one
    division (NULL for wordless groups).  Zero value histograms —
    the cheapest rollup shape.  → (group, n_docs, n_words, n_tokens,
    fertility)."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b.column(text_column), "")
        words = pc.count_substring_regex(t, r"[^\s]+")
        toks = pc.count_substring_regex(t, r"\w+|[^\w\s]")
        tt = pa.table({group_column: b.column(group_column),
                       "n_docs": pa.array(np.ones(len(b), np.int64)),
                       "n_words": pc.cast(words, pa.int64()),
                       "n_tokens": pc.cast(toks, pa.int64())})
        g = tt.group_by([group_column]).aggregate(
            [("n_docs", "sum"), ("n_words", "sum"),
             ("n_tokens", "sum")])
        return g.rename_columns([group_column, "n_docs", "n_words",
                                 "n_tokens"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(group_column)
                .aggregate(Sum("n_docs", alias_name="n_docs"),
                           Sum("n_words", alias_name="n_words"),
                           Sum("n_tokens", alias_name="n_tokens")))

    def finish(b: pa.Table) -> pa.Table:
        w = b.column("n_words").to_numpy(zero_copy_only=False).astype(
            np.float64)
        tk = b.column("n_tokens").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            f = np.where(w > 0, tk / w, np.nan)
        return pa.table({
            group_column: b.column(group_column),
            "n_docs": b.column("n_docs"),
            "n_words": b.column("n_words"),
            "n_tokens": b.column("n_tokens"),
            "fertility": pa.array(f, pa.float64(), mask=~(w > 0))})

    return merged.map_batches(finish, batch_format="pyarrow")


def two_prop_test(ds, group_column: str, side_column: str,
                  success_column: str, *, side_a, side_b,
                  digits: int = 6):
    """Per-group two-proportion z-test between two labeled samples —
    "did the pass-rate of a filter change between crawl snapshots":

        z = (k_a/n_a − k_b/n_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)),
        p̂ = (k_a + k_b)/(n_a + n_b)

    The four moments are exact int64 streaming sums (one per-batch
    partial → one groups-sized merge, zero value histograms — the
    cheapest member of the shift-test family; mannwhitney_u is the
    distribution-sensitive sibling).  z is one float expression of the
    four ints (IEEE sqrt is correctly rounded), snapped to ``digits``
    via ``floor(z·10^digits + 0.5)`` — round-half-UP, which differs
    from half-away for negative z at exact half-grid values; the SQL
    twin uses the IDENTICAL floor expression (NOT round()), which is
    what guarantees bit parity.  NULL when a side is empty or
    p̂ ∈ {0, 1} (zero variance).  → (group, n_a, k_a, n_b, k_b, z)."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        side = b.column(side_column)
        ina = pc.cast(pc.equal(side, side_a), pa.int64())
        inb = pc.cast(pc.equal(side, side_b), pa.int64())
        y = pc.cast(pc.equal(b.column(success_column), 1), pa.int64())
        t = pa.table({group_column: b.column(group_column),
                      "n_a": ina, "k_a": pc.multiply(ina, y),
                      "n_b": inb, "k_b": pc.multiply(inb, y)})
        g = t.group_by([group_column]).aggregate(
            [("n_a", "sum"), ("k_a", "sum"),
             ("n_b", "sum"), ("k_b", "sum")])
        return g.rename_columns([group_column, "n_a", "k_a",
                                 "n_b", "k_b"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(group_column)
                .aggregate(Sum("n_a", alias_name="n_a"),
                           Sum("k_a", alias_name="k_a"),
                           Sum("n_b", alias_name="n_b"),
                           Sum("k_b", alias_name="k_b")))

    scale = 10 ** digits

    def finish(b: pa.Table) -> pa.Table:
        na = b.column("n_a").to_numpy(zero_copy_only=False).astype(
            np.float64)
        ka = b.column("k_a").to_numpy(zero_copy_only=False).astype(
            np.float64)
        nb = b.column("n_b").to_numpy(zero_copy_only=False).astype(
            np.float64)
        kb = b.column("k_b").to_numpy(zero_copy_only=False).astype(
            np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            phat = (ka + kb) / (na + nb)
            var = phat * (1.0 - phat) * (1.0 / na + 1.0 / nb)
            z = (ka / na - kb / nb) / np.sqrt(var)
            z = np.floor(z * scale + 0.5) / scale
        ok = (na > 0) & (nb > 0) & (var > 0)
        return pa.table({
            group_column: b.column(group_column),
            "n_a": b.column("n_a"), "k_a": b.column("k_a"),
            "n_b": b.column("n_b"), "k_b": b.column("k_b"),
            "z": pa.array(np.where(ok, z, np.nan), pa.float64(),
                          mask=~ok)})

    return merged.map_batches(finish, batch_format="pyarrow")


def welch_t_test(ds, group_column: str, side_column: str,
                 value_column: str, *, side_a, side_b,
                 digits: int = 6):
    """Per-group Welch two-sample t-test between two labeled samples on
    an INTEGER value column — "did mean document length move between
    crawl snapshots, without assuming equal variances":

        t  = (Σa/n_a − Σb/n_b) / sqrt(v_a/n_a + v_b/n_b)
        v  = (n·Σv² − (Σv)²) / (n·(n−1))           per side
        df = (v_a/n_a + v_b/n_b)² /
             ((v_a/n_a)²/(n_a−1) + (v_b/n_b)²/(n_b−1))

    (Welch–Satterthwaite df).  The six moments (n, Σv, Σv² per side)
    are exact int64 streaming sums — one per-batch partial → one
    groups-sized merge, the mean-sensitive member of the shift-test
    family (``two_prop_test`` = rates, ``mannwhitney_u`` = ranks,
    ``ks_test`` = whole shape).  t and df are the same float expression
    tree of the same integers on both engines (each intermediate is one
    IEEE op on exactly-representable int64s), snapped to ``digits`` via
    ``floor(x·10^digits + 0.5)`` — round-half-UP like ``two_prop_test``,
    and the SQL twin MUST use the identical floor expression (never
    ``round()``).  NULL when either side has n < 2 or the pooled
    standard error is 0.  → (group, n_a, n_b, t, df).

    Scale shape: groups-sized exchange only; caller owns overflow
    headroom (|v| ≤ ~3e4 is safe at 1e9 rows per group)."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        side = b.column(side_column)
        ina = pc.cast(pc.equal(side, side_a), pa.int64())
        inb = pc.cast(pc.equal(side, side_b), pa.int64())
        v = pc.cast(pc.fill_null(b.column(value_column), 0), pa.int64())
        vv = pc.multiply(v, v)
        t = pa.table({group_column: b.column(group_column),
                      "n_a": ina, "s_a": pc.multiply(ina, v),
                      "ss_a": pc.multiply(ina, vv),
                      "n_b": inb, "s_b": pc.multiply(inb, v),
                      "ss_b": pc.multiply(inb, vv)})
        g = t.group_by([group_column]).aggregate(
            [("n_a", "sum"), ("s_a", "sum"), ("ss_a", "sum"),
             ("n_b", "sum"), ("s_b", "sum"), ("ss_b", "sum")])
        return g.rename_columns([group_column, "n_a", "s_a", "ss_a",
                                 "n_b", "s_b", "ss_b"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(group_column)
                .aggregate(Sum("n_a", alias_name="n_a"),
                           Sum("s_a", alias_name="s_a"),
                           Sum("ss_a", alias_name="ss_a"),
                           Sum("n_b", alias_name="n_b"),
                           Sum("s_b", alias_name="s_b"),
                           Sum("ss_b", alias_name="ss_b")))

    scale = 10 ** digits

    def finish(b: pa.Table) -> pa.Table:
        cols = {c: b.column(c).to_numpy(zero_copy_only=False).astype(
            np.float64) for c in ("n_a", "s_a", "ss_a",
                                  "n_b", "s_b", "ss_b")}
        na, sa, ssa = cols["n_a"], cols["s_a"], cols["ss_a"]
        nb, sb, ssb = cols["n_b"], cols["s_b"], cols["ss_b"]
        with np.errstate(divide="ignore", invalid="ignore"):
            va = (na * ssa - sa * sa) / (na * (na - 1.0))
            vb = (nb * ssb - sb * sb) / (nb * (nb - 1.0))
            sea = va / na
            seb = vb / nb
            se2 = sea + seb
            t = (sa / na - sb / nb) / np.sqrt(se2)
            df = (se2 * se2) / (sea * sea / (na - 1.0)
                                + seb * seb / (nb - 1.0))
            t = np.floor(t * scale + 0.5) / scale
            df = np.floor(df * scale + 0.5) / scale
        ok = (na > 1) & (nb > 1) & (se2 > 0)
        return pa.table({
            group_column: b.column(group_column),
            "n_a": b.column("n_a"), "n_b": b.column("n_b"),
            "t": pa.array(np.where(ok, t, np.nan), pa.float64(),
                          mask=~ok),
            "df": pa.array(np.where(ok, df, np.nan), pa.float64(),
                           mask=~ok)})

    return merged.map_batches(finish, batch_format="pyarrow")


def vocab_overlap(ds, group_column: str, text_column: str = "text", *,
                  max_groups: int = 62):
    """Pairwise vocabulary Jaccard between groups (sources/hosts) —
    "which sources are redundant": |V_a ∩ V_b| / |V_a ∪ V_b| over
    DISTINCT word fingerprints, for every unordered group pair.

    Scale shape (the whole point): word strings never ride an
    exchange and no pair space ever materializes —

    1. per-batch distinct (fp, group) pairs (md5-prefix fp, once per
       distinct word per batch),
    2. one fp-keyed ``groupby.sum`` of per-group BITMASKS (input rows
       are distinct, so the int sum IS the bitwise OR),
    3. per-batch 62-wide bit matrix ``B`` → ``Bᵀ·B`` partial (a
       groups² int64 tile per batch) folded on the driver.

    Exactness: intersection/union counts are exact int64 (md5-prefix
    fps are shared with the SQL twin, so any 1-in-2⁶⁴ collision is
    IDENTICAL on both engines); Jaccard is one division.  Groups are
    gathered first and must number ≤ ``max_groups`` (bitmask width) —
    the documented bound; past it, shard the group set.
    → (group_a, group_b, n_a, n_b, n_common, jaccard) for a < b."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64
    from ..functions.repetition import split_words

    groups = sorted(
        r[group_column]
        for r in ds.groupby(group_column).count().take_all())
    if len(groups) > max_groups:
        raise ValueError(
            f"{len(groups)} groups exceed the {max_groups} bitmask "
            "bound; shard the group set")
    gidx = {g: i for i, g in enumerate(groups)}
    k = len(groups)

    def partial(b: pa.Table) -> pa.Table:
        fps, gis = [], []
        for g, t in zip(b.column(group_column).to_pylist(),
                        b.column(text_column).to_pylist()):
            ws = set(split_words(t or ""))
            if not ws:
                continue
            gi = gidx[g]
            # 57-bit fp (md5 prefix >> 7): packs with the 6-bit group
            # index into one int64 key for the in-batch distinct; the
            # SQL twin shifts identically, so any collision is shared
            fps.extend(stable_hash64(w) >> 7 for w in ws)
            gis.extend([gi] * len(ws))
        if not fps:
            return pa.table({"fp": pa.array([], pa.int64()),
                             "gi": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64())})
        fp_a = np.array(fps, np.int64)
        gi_a = np.array(gis, np.int64)
        key = fp_a * np.int64(64) + gi_a
        uk = np.unique(key)
        return pa.table({"fp": pa.array(uk // 64),
                         "gi": pa.array(uk % 64),
                         "one": pa.array(np.ones(len(uk), np.int64))})

    # global distinct (fp, gi): groupby.count collapses cross-batch
    # duplicates, THEN masks sum to an exact bitwise OR
    distinct = (ds.map_batches(partial, batch_format="pyarrow")
                  .groupby(["fp", "gi"])
                  .aggregate(Sum("one", alias_name="c")))

    def to_mask(b: pa.Table) -> pa.Table:
        gi = b.column("gi").to_numpy(zero_copy_only=False).astype(
            np.int64)
        return pa.table({"fp": b.column("fp"),
                         "mask": pa.array(np.int64(1) << gi)})

    masks = (distinct.map_batches(to_mask, batch_format="pyarrow")
                     .groupby("fp")
                     .aggregate(Sum("mask", alias_name="mask")))

    def tile(b: pa.Table) -> pa.Table:
        m = b.column("mask").to_numpy(zero_copy_only=False).astype(
            np.int64)
        bits = ((m[:, None] >> np.arange(k)[None, :]) & 1).astype(
            np.int64)
        inter = bits.T @ bits
        return pa.table({"tile": pa.array([inter.ravel().tolist()],
                                          pa.list_(pa.int64()))})

    tiles = (masks.map_batches(tile, batch_format="pyarrow")
                  .take_all())
    total = np.zeros((k, k), np.int64)
    for r in tiles:
        total += np.array(r["tile"], np.int64).reshape(k, k)
    sizes = np.diag(total)
    ga, gb, na, nb, nc, jc = [], [], [], [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            inter = int(total[i, j])
            union = int(sizes[i] + sizes[j] - inter)
            ga.append(groups[i])
            gb.append(groups[j])
            na.append(int(sizes[i]))
            nb.append(int(sizes[j]))
            nc.append(inter)
            jc.append(inter / union if union > 0 else None)

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "group_a": pa.array(ga), "group_b": pa.array(gb),
        "n_a": pa.array(na, pa.int64()), "n_b": pa.array(nb, pa.int64()),
        "n_common": pa.array(nc, pa.int64()),
        "jaccard": pa.array(jc, pa.float64())}))


def grouped_mi(ds, group_column: str, a_column: str, b_column: str, *,
               digits: int = 6):
    """Per-group mutual-information DECOMPOSITION between two
    categorical columns — "how informative is this cheap signal about
    that label", the feature-selection primitive (no reference
    analogue — brief-scope operator).  Every (group, a, b) cell
    reports its additive MI term

        mi_term = (c_ab/n) · ln((c_ab·n) / (c_a·c_b))

    computed from exact int64 histogram counts with ONE identical
    float expression per cell, snapped half-away to ``digits`` — the
    drift_psi decomposition rule applied to MI (no cross-cell float
    sum; Σ mi_term ≥ 0 is the caller's one-liner).

    Scale shape: per-batch confusion partials → one (group, a, b)-keyed
    merge (groups × labels², histogram-bounded) → hash(group)-coarse
    buckets where margins attach via whole-bucket pandas transforms
    (never per group).  → (group, a, b, n_ab, mi_term)."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({group_column: b.column(group_column),
                      "__a": b.column(a_column),
                      "__b": b.column(b_column),
                      "c": pa.array(np.ones(len(b), np.int64))})
        g = t.group_by([group_column, "__a", "__b"]).aggregate(
            [("c", "sum")])
        return g.rename_columns([group_column, "__a", "__b", "c"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby([group_column, "__a", "__b"])
                .aggregate(Sum("c", alias_name="c")))

    def bucket(b: pa.Table) -> pa.Table:
        hs = [stable_hash64(str(v)) % 64
              for v in b.column(group_column).to_pylist()]
        return b.append_column("__pb", pa.array(hs, pa.int64()))

    scale = 10 ** digits

    def fold(g: pa.Table) -> pa.Table:
        df = g.select([group_column, "__a", "__b", "c"]).to_pandas()
        c = df["c"].to_numpy(np.int64)
        ca = (df.groupby([group_column, "__a"], sort=False)["c"]
                .transform("sum").to_numpy(np.int64))
        cb = (df.groupby([group_column, "__b"], sort=False)["c"]
                .transform("sum").to_numpy(np.int64))
        n = (df.groupby(group_column, sort=False)["c"]
               .transform("sum").to_numpy(np.int64))
        mi = (c / n) * np.log((c.astype(np.float64) * n)
                              / (ca.astype(np.float64) * cb))
        mi = np.floor(mi * scale + 0.5) / scale
        return pa.table({
            group_column: pa.Array.from_pandas(df[group_column]),
            a_column: pa.Array.from_pandas(df["__a"]),
            b_column: pa.Array.from_pandas(df["__b"]),
            "n_ab": pa.array(c),
            "mi_term": pa.array(mi, pa.float64())})

    return (merged.map_batches(bucket, batch_format="pyarrow")
                  .groupby("__pb")
                  .map_groups(fold, batch_format="pyarrow"))


def kendall_tau(ds, x_column: str, y_column: str, *,
                digits: int = 6, max_cells: int = 50_000_000):
    """Exact global Kendall τ-b rank correlation between two INTEGER
    columns — concordant/discordant/tie masses folded from the 2-D
    value histogram (never the n² pair space):

        τ_b = (C − D) / sqrt((T − Tx)(T − Ty)),  T = n(n−1)/2

    with C/D/Tx/Ty exact int64 counts, so the one float
    division/sqrt/round is bit-identical across engines (the
    grouped_corr rule for rank statistics; Pearson sees linearity,
    τ sees monotonicity — the robust pairing).

    Scale shape: per-batch (x, y) Arrow count partials → one
    cells-keyed ``groupby.sum`` → a dense 2-D cumsum fold on the
    driver.  ``max_cells`` guards BOTH driver allocations: the sparse
    cell gather AND the |distinct x| × |distinct y| DENSE matrix the
    fold builds (a long sparse diagonal — 1M × 1M from 1M cells —
    would pass a cells-only guard yet allocate terabytes; bin
    continuous domains upstream).  → one row
    (n, concordant, discordant, tau)."""
    import numpy as np

    from ray.data.aggregate import Sum

    import ray.data as rd

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"x": b.column(x_column), "y": b.column(y_column)})
        g = t.group_by(["x", "y"]).aggregate([("y", "count")])
        return g.rename_columns(["x", "y", "pn"])

    cells = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["x", "y"])
               .aggregate(Sum("pn", alias_name="n"))).to_pandas()
    if len(cells) > max_cells:
        raise ValueError(f"{len(cells)} cells exceed max_cells")
    if not len(cells):
        return rd.from_arrow(pa.table({
            "n": pa.array([], pa.int64()),
            "concordant": pa.array([], pa.int64()),
            "discordant": pa.array([], pa.int64()),
            "tau": pa.array([], pa.float64())}))
    xs = np.unique(cells["x"].to_numpy())
    ys = np.unique(cells["y"].to_numpy())
    if len(xs) * len(ys) > max_cells:
        raise ValueError(
            f"dense fold needs a {len(xs)}x{len(ys)} matrix "
            f"(> max_cells={max_cells}); bin x/y upstream "
            "(e.g. textstats.binned before kendall_tau)")
    xi = np.searchsorted(xs, cells["x"].to_numpy())
    yi = np.searchsorted(ys, cells["y"].to_numpy())
    m = np.zeros((len(xs), len(ys)), np.int64)
    m[xi, yi] = cells["n"].to_numpy()
    # strictly-less-in-both mass via exclusive 2-D prefix sums
    cum = m.cumsum(0).cumsum(1)
    pad = np.zeros((len(xs) + 1, len(ys) + 1), np.int64)
    pad[1:, 1:] = cum
    less_both = pad[:-1, :-1][xi, yi]          # x' < x AND y' < y
    n_cell = m[xi, yi]
    # discordant mass per cell: x' > x AND y' < y =
    #   (all x', y' < y) − (x' ≤ x, y' < y)
    lt_y_le_x = pad[1:, :-1][xi, yi]
    lt_y_all = pad[-1, :-1][yi]
    gt_x_lt_y = lt_y_all - lt_y_le_x
    conc2 = n_cell * less_both
    disc2 = n_cell * gt_x_lt_y
    C = int(conc2.sum())
    D = int(disc2.sum())
    n = int(m.sum())
    T = n * (n - 1) // 2
    row_tot = m.sum(1)
    col_tot = m.sum(0)
    Tx = int((row_tot * (row_tot - 1) // 2).sum())
    Ty = int((col_tot * (col_tot - 1) // 2).sum())
    denom = float(T - Tx) * float(T - Ty)
    if denom > 0:
        tau = round((C - D) / np.sqrt(denom), digits)
    else:
        tau = None
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "concordant": pa.array([C], pa.int64()),
        "discordant": pa.array([D], pa.int64()),
        "tau": pa.array([tau], pa.float64())}))


def stratified_sample(ds, group_column: str, key_column: str, *,
                      n_total: int):
    """Exact-N stratified proportional sample: largest-remainder
    (Hamilton) apportionment of ``n_total`` rows across groups in
    proportion to group size, then each group's ``quota`` smallest
    ``key_column`` rows.  The operator that downsizes a corpus to a
    fixed row budget while PRESERVING the group mix — cap_per_group
    holds the mix only when every group is above the cap; temperature
    sampling reshapes the mix; this one freezes it.

    Exactness: quotas use INTEGER arithmetic only — floor via
    ``(n_total·cnt) // total`` and the remainder ``n_total·cnt −
    floor·total`` (an integer), leftovers to the largest remainders
    with ties broken by group key ascending — so the allocation is
    bit-identical to a SQL twin using ``//`` and ``row_number()``.
    ``key_column`` must be unique (it is the within-group pick order).

    Scale shape: one per-batch count partial → a groups-sized driver
    table decides quotas; the pick itself is `cap_per_group`'s
    candidates-prune + broadcast keep-set (no corpus shuffle).
    Precondition: ``n_total`` ≤ total rows (quotas never exceed a
    group's size when that holds, since floor(N·cnt/total) ≤ cnt)."""
    if n_total < 0:
        raise ValueError("n_total must be >= 0")

    def count_partial(b: pa.Table) -> pa.Table:
        g = (b.select([group_column])
              .group_by([group_column]).aggregate([([], "count_all")]))
        return g.rename_columns([group_column, "pn"])

    parts = list(ds.map_batches(count_partial, batch_format="pyarrow")
                   .iter_batches(batch_size=None, batch_format="pyarrow"))
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return ds.filter(lambda _r: False)
    counts = (pa.concat_tables(parts, promote_options="default")
                .group_by([group_column]).aggregate([("pn", "sum")]))
    groups = counts.column(group_column).to_pylist()
    sizes = counts.column("pn_sum").to_pylist()
    total = sum(sizes)
    if n_total > total:
        raise ValueError(
            f"n_total={n_total} exceeds corpus size {total}")
    floors = {g: (n_total * c) // total for g, c in zip(groups, sizes)}
    rems = {g: n_total * c - floors[g] * total
            for g, c in zip(groups, sizes)}
    leftover = n_total - sum(floors.values())
    for g in sorted(groups, key=lambda g: (-rems[g], g))[:leftover]:
        floors[g] += 1
    quotas = {g: q for g, q in floors.items() if q > 0}
    return cap_per_group(ds, group_column, key_column, n=quotas)


CODE_KEYWORD_PATTERN = (
    r"\b(?:def|return|import|class|function|var|const|void|static"
    r"|elif|lambda|public|private|struct|typedef)\b")


def code_stats(ds, text_column: str = "text"):
    """Per-document code-vs-prose signals — the StarCoder/StackV2-style
    routing report that decides whether a page feeds the code corpus
    or the prose corpus (and whether markdown extraction mangled a
    code block into "text").  One flag plus its decomposition, the
    gopher_flags posture:

    - ``n_lines``:       '\\n' count + 1 (the gopher_flags convention)
    - ``punct_lines``:   lines ending (mod trailing spaces/tabs) in
                         one of ``; { }`` — statement/block enders
    - ``indent_lines``:  lines starting with a tab or 4 spaces
    - ``sym_chars``:     chars in ``{}()[];=<>``
    - ``kw_hits``:       whole-word programming keywords
                         (:data:`CODE_KEYWORD_PATTERN`)
    - ``is_code``:       10·(punct+indent) ≥ 3·n_lines  OR
                         (kw_hits ≥ 3 AND 25·sym_chars ≥ n_chars > 0)

    Every threshold is cross-multiplied to a pure integer comparison
    (no floats, the gopher_flags rule); every count is an Arrow RE2
    kernel sharing its pattern string with the DuckDB twin.  Zero
    exchanges — a pure streaming map."""
    import numpy as np
    import pyarrow.compute as pc

    def flags(b: pa.Table) -> pa.Table:
        t = pc.fill_null(b.column(text_column), "")

        def cnt(pattern: str) -> np.ndarray:
            return (pc.count_substring_regex(t, pattern)
                    .to_numpy(zero_copy_only=False).astype(np.int64))

        n_lines = (pc.count_substring(t, "\n")
                   .to_numpy(zero_copy_only=False).astype(np.int64) + 1)
        punct = cnt(r"(?m)[;{}][ \t]*$")
        indent = cnt(r"(?m)^(?:\t|    )")
        sym = cnt(r"[{}()\[\];=<>]")
        kw = cnt(CODE_KEYWORD_PATTERN)
        n_chars = (pc.utf8_length(t)
                   .to_numpy(zero_copy_only=False).astype(np.int64))
        is_code = ((10 * (punct + indent) >= 3 * n_lines)
                   | ((kw >= 3) & (25 * sym >= n_chars) & (n_chars > 0)))
        keep = {c: b.column(c) for c in b.column_names
                if c != text_column}
        keep.update({
            "n_lines": pa.array(n_lines),
            "punct_lines": pa.array(punct),
            "indent_lines": pa.array(indent),
            "sym_chars": pa.array(sym),
            "kw_hits": pa.array(kw),
            "n_chars": pa.array(n_chars),
            "is_code": pa.array(is_code)})
        return pa.table(keep)

    return ds.map_batches(flags, batch_format="pyarrow")


def dup_ngram_stats(ds, key_column: str = "doc_id",
                    text_column: str = "text", *, n: int = 3,
                    digits: int = 6):
    """Within-document duplicate n-gram fractions — the remaining
    Gopher §A1.1 repetition signal :func:`functions.repetition.
    repetition_features` doesn't cover: how much of a document is the
    SAME n-word phrase repeated (spun content, template spam, decoding
    loops).  Per document:

    - ``n_grams``:       total n-token window occurrences
    - ``n_dup``:         occurrences of grams appearing ≥ 2× in the doc
    - ``dup_frac``:      n_dup / n_grams (round-``digits`` snap)
    - ``dup_char_frac``: same, char-weighted — each occurrence weighted
      by its gram's character length (tokens joined by single spaces),
      the "fraction of characters in duplicate n-grams" reading

    Docs with fewer than n tokens emit zeros with NULL fractions.

    Scale shape: a PURE STREAMING map — duplication is within-doc, so
    nothing ever rides an exchange.  Tokens come from
    :func:`flat_split_words` (one RE2 split per batch); gram identity
    is the dictionary-encoded token-id tuple resolved with ONE
    ``np.lexsort`` + run-length pass per batch — no Python loop over
    rows, no gram strings materialized at all."""
    import numpy as np
    import pyarrow.compute as pc

    scale = 10 ** digits

    def report(b: pa.Table) -> pa.Table:
        words, doc_of, ndocs = flat_split_words(b.column(text_column))
        lens = (pc.utf8_length(words)
                .to_numpy(zero_copy_only=False).astype(np.int64))
        enc = words.dictionary_encode()
        inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nw = len(inv)
        n_grams = np.zeros(ndocs, np.int64)
        n_dup = np.zeros(ndocs, np.int64)
        ch_tot = np.zeros(ndocs, np.int64)
        ch_dup = np.zeros(ndocs, np.int64)
        starts = (np.flatnonzero(doc_of[:nw - n + 1] == doc_of[n - 1:])
                  if nw >= n else np.empty(0, np.int64))
        if len(starts):
            d = doc_of[starts]
            cols = [inv[starts + j] for j in range(n)]
            w = lens[starts] + (n - 1)
            for j in range(1, n):
                w = w + lens[starts + j]
            # lexsort: LAST key is primary → (c_{n-1}, …, c_0, doc)
            order = np.lexsort(tuple(reversed(cols)) + (d,))
            d_s = d[order]
            new = np.ones(len(order), bool)
            new[1:] = d_s[1:] != d_s[:-1]
            for c in cols:
                c_s = c[order]
                new[1:] |= c_s[1:] != c_s[:-1]
            gid = np.cumsum(new) - 1
            sizes = np.bincount(gid)
            occ_dup = sizes[gid] >= 2
            w_s = w[order]
            n_grams[:] = np.bincount(d, minlength=ndocs)
            n_dup[:] = np.bincount(d_s[occ_dup], minlength=ndocs)
            ch_tot[:] = np.bincount(d, weights=w,
                                    minlength=ndocs).astype(np.int64)
            ch_dup[:] = np.bincount(d_s[occ_dup], weights=w_s[occ_dup],
                                    minlength=ndocs).astype(np.int64)
        has = n_grams > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = np.floor(n_dup / n_grams * scale + 0.5) / scale
            cfrac = np.floor(ch_dup / ch_tot * scale + 0.5) / scale
        return pa.table({
            key_column: b.column(key_column),
            "n_grams": pa.array(n_grams),
            "n_dup": pa.array(n_dup),
            "dup_frac": pa.array(frac, pa.float64(), mask=~has),
            "dup_char_frac": pa.array(cfrac, pa.float64(), mask=~has)})

    return ds.map_batches(report, batch_format="pyarrow")


def shard_assign(ds, key_column: str, weight_column: str, *,
                 shard_budget: int, shard_column: str = "shard"):
    """Weight-balanced output shard assignment: rows are laid out in
    deterministic ``(md5(key), key)`` order and cut into shards of
    ~``shard_budget`` total weight — ``shard = cum_weight_before //
    shard_budget``.  THE output-sharding primitive for corpus export:
    every shard carries ≈ the same token mass (uniform training-file
    sizes, no giant-host hot shard), the layout is RNG-free and
    cluster-size-independent, and a re-run reproduces it byte-for-byte
    (the resumable-writer contract).  A single row heavier than the
    budget owns its shard and the cut advances past it.

    Scale shape: the :func:`global_rank` recipe with a weighted prefix
    sum — one distributed sort on the hash pair, per-block
    (first-key, weight-sum) summaries, a driver prefix fold over
    BLOCKS (one row per block, never per row), then a second streaming
    pass assigns ``base + exclusive-cumsum // budget``.  Weights must
    be non-negative int64 (token counts, byte sizes)."""
    import numpy as np

    from ..functions.hashing import md5_hex

    if shard_budget <= 0:
        raise ValueError(f"shard_budget must be positive, got "
                         f"{shard_budget}")

    def with_hash(b: pa.Table) -> pa.Table:
        h = [md5_hex(str(k)) for k in b.column(key_column).to_pylist()]
        return b.append_column("__h", pa.array(h, pa.string()))

    sorted_ds = (ds.map_batches(with_hash, batch_format="pyarrow")
                   .sort(["__h", key_column]).materialize())

    def summary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"o": batch.column("__h").slice(0, 0),
                             "t": batch.column(key_column).slice(0, 0),
                             "wsum": pa.array([], pa.int64())})
        w = (batch.column(weight_column)
             .to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({
            "o": batch.column("__h").slice(0, 1),
            "t": batch.column(key_column).slice(0, 1),
            "wsum": pa.array([int(w.sum())], pa.int64())})

    sm = (sorted_ds.map_batches(summary, batch_format="pyarrow")
          .to_pandas())
    if len(sm) == 0:
        return sorted_ds.drop_columns(["__h"])
    sm = sm.sort_values(["o", "t"]).reset_index(drop=True)
    offs = sm["wsum"].cumsum().shift(fill_value=0)
    base_by_first = {(o, t): int(v) for o, t, v in
                     zip(sm["o"].tolist(), sm["t"].tolist(),
                         offs.tolist())}

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return (batch.append_column(shard_column,
                                        pa.array([], pa.int64()))
                    .drop_columns(["__h"]))
        key = (batch.column("__h")[0].as_py(),
               batch.column(key_column)[0].as_py())
        base = base_by_first[key]
        w = (batch.column(weight_column)
             .to_numpy(zero_copy_only=False).astype(np.int64))
        cum_before = base + np.cumsum(w) - w
        return (batch.append_column(
            shard_column, pa.array(cum_before // shard_budget))
            .drop_columns(["__h"]))

    return sorted_ds.map_batches(assign, batch_format="pyarrow")


def grouped_zscore(ds, group_column: str, value_column: str, *,
                   z_column: str = "z", digits: int = 6):
    """Per-row standardized score within its group — ``z = (v − μ_g) /
    σ_g`` with POPULATION σ: the per-language/per-host score normalizer
    that makes quality thresholds comparable across corpus slices
    (a raw "quality 0.7" means different things in different
    languages; its within-group z does not).

    Determinism: μ, σ derive from exact int64 moments (n, Σv, Σv²) so
    the pinned float sequence ``mean = S/n; var = Q/n − mean·mean;
    z = (v − mean)/sqrt(var)`` is bit-identical across engines; z snaps
    to the 1e-``digits`` grid via ``floor(z·scale + 0.5)`` — the
    signed half-UP snap both engines share (the two_prop_test
    convention; the SQL twin uses the same floor expression, NOT
    round()).  Groups with n < 2 or zero variance → NULL.

    Scale shape: ONE groups-sized moment exchange (per-batch Arrow
    combiner partials), moments broadcast via ``ray.put``, then a pure
    streaming assign pass — rows never ride any exchange."""
    import numpy as np
    import pyarrow.compute as pc
    import ray as _ray

    from ray.data.aggregate import Sum

    scale = 10 ** digits

    def partial(b: pa.Table) -> pa.Table:
        v = pc.cast(b.column(value_column), pa.int64())
        t = pa.table({group_column: b.column(group_column),
                      "pn": pa.array(np.ones(len(b), np.int64)),
                      "ps": v, "pq": pc.multiply(v, v)})
        g = t.group_by([group_column]).aggregate(
            [("pn", "sum"), ("ps", "sum"), ("pq", "sum")])
        return g.rename_columns([group_column, "pn", "ps", "pq"])

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(group_column)
                .aggregate(Sum("pn", alias_name="n"),
                           Sum("ps", alias_name="s"),
                           Sum("pq", alias_name="q"))).to_pandas()
    import pandas as pd

    n = merged["n"].to_numpy(np.int64)
    s = merged["s"].to_numpy(np.int64)
    q = merged["q"].to_numpy(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = s / n
        var = q / n - mean * mean
    ok = (n >= 2) & (var > 0)
    sd = np.sqrt(np.where(ok, var, 1.0))
    idx = pd.Index(merged[group_column])
    table_ref = _ray.put((idx, mean, sd, ok))

    def assign(b: pa.Table) -> pa.Table:
        idx_b, mean_b, sd_b, ok_b = _ray.get(table_ref)
        keys = b.column(group_column).to_numpy(zero_copy_only=False)
        pos = idx_b.get_indexer(pd.Index(keys))
        if (pos < 0).any():
            raise ValueError("group absent from moment table — "
                             "non-deterministic upstream?")
        v = (b.column(value_column)
             .to_numpy(zero_copy_only=False).astype(np.float64))
        z = np.floor((v - mean_b[pos]) / sd_b[pos] * scale + 0.5) / scale
        return b.append_column(
            z_column, pa.array(z, pa.float64(), mask=~ok_b[pos]))

    return ds.map_batches(assign, batch_format="pyarrow")


def para_lang_spans(ds, key_column: str = "doc_id",
                    text_column: str = "text"):
    """Per-PARAGRAPH language spans — the CCNet-style mixed-document
    splitter input: one row per non-blank paragraph with its 1-based
    ordinal and stopword-coverage language (:func:`functions.textstats.
    detect_lang`), so a bilingual page can route each slice to its own
    language corpus instead of being dropped as "mixed".

    Scale shape: pure streaming explode — paragraph splitting and
    language profiles are per-row local, nothing rides any exchange;
    output fan-out is bounded by the corpus paragraph count.  The
    langid loop is per PARAGRAPH (a profile lookup over its tokens),
    the same cost class as the per-doc ``lang_id`` scorer."""
    from ..functions.repetition import split_paragraphs
    from ..functions.textstats import detect_lang

    def explode(b: pa.Table) -> pa.Table:
        keys_out, ords, langs = [], [], []
        for k, t in zip(b.column(key_column).to_pylist(),
                        b.column(text_column).to_pylist()):
            for i, p in enumerate(split_paragraphs(t or "")):
                keys_out.append(k)
                ords.append(i + 1)
                langs.append(detect_lang(p))
        return pa.table({
            key_column: pa.array(keys_out,
                                 b.schema.field(key_column).type),
            "para_ord": pa.array(ords, pa.int64()),
            "lang_id": pa.array(langs, pa.string())})

    return ds.map_batches(explode, batch_format="pyarrow")


def bh_fdr(ds, p_column: str, key_column: str, *, alpha: float = 0.05):
    """Benjamini-Hochberg step-up FDR adjustment over a family of
    p-values — the multiple-testing tail of the shift-test family
    (:func:`welch_t_test` / :func:`two_prop_test` / :func:`ks_test`
    emit one statistic per group; when the family has hundreds of
    hosts, raw per-test significance is inflated and BH is the
    standard correction):

        p_adj(i) = min(1, min_{j >= i} p_(j) * n / j),
        significant = p_adj <= alpha

    with ranks 1..n under ``ORDER BY (p, key)`` (``key_column`` must be
    unique so the order — and thus the adjusted values on ties — is
    total on both engines).  → (key, p, rank, p_adj, significant).

    Bit parity: raw(i) = ``p * n / rank`` is two IEEE ops on
    exactly-representable operands and the suffix-min folds the same
    set of doubles on both engines, so NO snap is needed; the SQL twin
    is ``least(1.0, min(p * n / rnk) OVER (ORDER BY rnk DESC ROWS
    UNBOUNDED PRECEDING))``.

    Scale shape: the family table is groups-sized (one row per
    hypothesis), but the plan stays distributed anyway: ONE sort
    (inside :func:`global_rank`, which also does the per-block
    offset/driver-prefix-sum recipe), then per-block suffix-min
    summaries — a driver fold over one row per BLOCK — and a second
    streaming pass folding each block's interior suffix-min with the
    min of all later blocks.  Nothing row-shaped lands on the driver."""
    import numpy as np

    proj = ds.select_columns([key_column, p_column])
    ranked = global_rank(proj, p_column, tiebreak_column=key_column,
                         rank_column="__r0").materialize()
    n = ranked.count()
    if n == 0:
        import ray.data as rd
        sch = proj.schema().base_schema
        empty = pa.table({
            key_column: pa.array([], sch.field(key_column).type),
            p_column: pa.array([], sch.field(p_column).type),
            "rank": pa.array([], pa.int64()),
            "p_adj": pa.array([], pa.float64()),
            "significant": pa.array([], pa.bool_())})
        return rd.from_arrow(empty)
    nf = float(n)

    def raw_of(batch: pa.Table) -> np.ndarray:
        p = np.asarray(batch.column(p_column), dtype=np.float64)
        rnk = np.asarray(batch.column("__r0"), dtype=np.int64) + 1
        return p * nf / rnk

    def summary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"r0": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64())})
        return pa.table({
            "r0": batch.column("__r0").slice(0, 1),
            "mn": pa.array([float(raw_of(batch).min())])})

    sm = (ranked.map_batches(summary, batch_format="pyarrow")
          .to_pandas().sort_values("r0").reset_index(drop=True))
    # min of raw over all blocks AFTER each block (suffix, exclusive)
    later_min = np.concatenate([
        np.minimum.accumulate(sm["mn"].to_numpy()[::-1])[::-1][1:],
        [np.inf]])
    later_by_first = {int(r): float(m)
                      for r, m in zip(sm["r0"].tolist(), later_min)}

    def adjust(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                key_column: batch.column(key_column),
                p_column: batch.column(p_column),
                "rank": pa.array([], pa.int64()),
                "p_adj": pa.array([], pa.float64()),
                "significant": pa.array([], pa.bool_())})
        raw = raw_of(batch)
        tail = later_by_first[int(batch.column("__r0")[0].as_py())]
        adj = np.minimum.accumulate(np.minimum(raw, tail)[::-1])[::-1]
        np.minimum(adj, 1.0, out=adj)
        return pa.table({
            key_column: batch.column(key_column),
            p_column: batch.column(p_column),
            "rank": pa.array(
                np.asarray(batch.column("__r0"), np.int64) + 1),
            "p_adj": pa.array(adj),
            "significant": pa.array(adj <= alpha)})

    return ranked.map_batches(adjust, batch_format="pyarrow")
