"""BM25 keyword search over a text corpus — the lexical complement to
the embedding ANN queries in ``stages/similarity.py``.

Two streaming passes, no shuffle:

1. **Corpus statistics**: each batch emits ONE partial row
   (doc count, total doc length, per-query-term document frequency);
   the merge is blocks-sized and happens on the driver (at 100 TB this
   is num_blocks rows of ~5 ints — negligible; the same partials could
   feed a Ray ``Sum`` aggregate unchanged).
2. **Scoring**: idf per term + avgdl broadcast in the scorer's
   constructor (k-term-sized); each batch scores vectorized and emits
   its local top-k, and a tiny global sort+limit (~k×blocks rows)
   finishes — the same prune-before-sort shape as ``brute_topk``.

Determinism contract with the SQL oracle: tokenization is whitespace
split (== ``string_split_regex('\\s+')`` with empties dropped), scores
are computed in float64 with the SAME expression shape and constant
casts on both sides, per-term contributions accumulate in query-term
order, and ties break by ascending doc key.

BM25 (Robertson/Lucene form): idf = ln(1 + (N - df + ½)/(df + ½)),
score = Σ_t idf_t · tf_t(k1+1) / (tf_t + k1(1 − b + b·dl/avgdl)),
k1 = 1.2, b = 0.75.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

K1 = 1.2
B = 0.75


def _tokens(text: str) -> list[str]:
    return (text or "").split()


class Bm25CorpusStats:
    """Per-batch partial (n docs, Σdl, df per term) — one output row."""

    def __init__(self, terms: tuple[str, ...], text_column: str = "text"):
        self.terms = tuple(terms)
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = 0
        sum_dl = 0
        df = [0] * len(self.terms)
        for t in batch.column(self.text_column).to_pylist():
            ws = _tokens(t)
            n += 1
            sum_dl += len(ws)
            seen = set(ws)
            for i, term in enumerate(self.terms):
                if term in seen:
                    df[i] += 1
        cols = {"pn": pa.array([n], pa.int64()),
                "pdl": pa.array([sum_dl], pa.int64())}
        for i in range(len(self.terms)):
            cols[f"pdf{i}"] = pa.array([df[i]], pa.int64())
        return pa.table(cols)


class Bm25Scorer:
    """Vectorized per-batch BM25 scores + local top-k prune."""

    def __init__(self, terms: tuple[str, ...], idf: list[float],
                 avgdl: float, k: int, text_column: str = "text",
                 key_column: str = "doc_id"):
        self.terms = tuple(terms)
        self.idf = list(idf)
        self.avgdl = float(avgdl)
        self.k = k
        self.text_column = text_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        n = len(texts)
        tf = np.zeros((n, len(self.terms)), dtype=np.float64)
        dl = np.zeros(n, dtype=np.float64)
        for r, t in enumerate(texts):
            ws = _tokens(t)
            dl[r] = len(ws)
            for i, term in enumerate(self.terms):
                tf[r, i] = ws.count(term)
        # constants written as literals (2.2, 0.25, 0.75, 1.2) so both
        # sides round the SAME decimal to the nearest double
        denom_norm = 1.2 * (0.25 + 0.75 * dl / self.avgdl)
        score = np.zeros(n, dtype=np.float64)
        for i in range(len(self.terms)):  # fixed term order == SQL + chain
            score = score + self.idf[i] * (
                (tf[:, i] * 2.2) / (tf[:, i] + denom_norm))
        if n > self.k:
            idx = np.argpartition(-score, self.k)[: self.k]
        else:
            idx = np.arange(n)
        keys = batch.column(self.key_column).take(pa.array(idx))
        return pa.table({self.key_column: keys,
                         "score": pa.array(score[idx], pa.float64())})


def bm25_topk(ds, terms, k: int = 20, *, text_column: str = "text",
              key_column: str = "doc_id"):
    """Top-k documents by BM25 against a bag-of-terms query.

    ``ds`` is consumed twice (stats, then scoring) — at scale pass the
    pruned 2-column read so each pass streams from storage."""
    terms = tuple(terms)
    parts = ds.map_batches(Bm25CorpusStats(terms, text_column),
                           batch_format="pyarrow").to_pandas()
    n_docs = int(parts["pn"].sum()) if "pn" in parts.columns else 0
    if n_docs == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({key_column: pa.array([], pa.int64()),
                                       "score": pa.array([], pa.float64())}))
    avgdl = float(parts["pdl"].sum()) / n_docs
    idf = []
    for i in range(len(terms)):
        df = int(parts[f"pdf{i}"].sum())
        idf.append(math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
    candidates = ds.map_batches(
        Bm25Scorer(terms, idf, avgdl, k, text_column, key_column),
        batch_format="pyarrow")
    return candidates.sort(["score", key_column],
                           descending=[True, False]).limit(k)


def train_df_counts(ds, text_column: str = "text"):
    """→ (n_docs, {term: document frequency}) via per-batch partial
    counts (one row per distinct term per batch plus one doc-count row —
    the exchange is vocabulary-sized, never a row per token) merged by
    one ``groupby.sum``.  At 100 TB the broadcast df table needs top-K
    pruning exactly like the bigram LM (``stages/lm.py``); the idf floor
    absorbs the dropped tail."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df: Counter = Counter()
        n = 0
        for t in batch.column(text_column).to_pylist():
            n += 1
            df.update(set(_tokens(t)))
        kinds = ["n"] + ["t"] * len(df)
        terms = [""] + list(df.keys())
        ns = [n] + [df[w] for w in terms[1:]]
        return pa.table({"kind": pa.array(kinds, pa.string()),
                         "term": pa.array(terms, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(["kind", "term"])
                .aggregate(Sum("n", alias_name="n"))).to_pandas()
    n_docs = 0
    df: dict[str, int] = {}
    for kind, term, n in merged.itertuples(index=False):
        if kind == "n":
            n_docs = int(n)
        else:
            df[term] = int(n)
    return n_docs, df


class TfidfTopTerms:
    """Per-batch top-k TF-IDF terms per document against a broadcast df
    table: score = tf · ln((N+1)/(df+1)), ties by ascending term."""

    def __init__(self, n_docs: int, df: dict, *, k: int = 3,
                 key_column: str = "doc_id", text_column: str = "text",
                 digits: int = 6):
        self.k = k
        self.key_column = key_column
        self.text_column = text_column
        self.digits = digits
        nd = float(n_docs) + 1.0
        # idf precomputed once per actor: scoring is a dict lookup
        self.idf = {w: math.log(nd / (c + 1.0)) for w, c in df.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import heapq
        from collections import Counter

        keys_out, terms_out, scores_out, ranks_out = [], [], [], []
        keys = batch.column(self.key_column).to_pylist()
        for key, t in zip(keys, batch.column(self.text_column).to_pylist()):
            tf = Counter(_tokens(t))
            items = [(w, c * self.idf[w]) for w, c in tf.items()]
            top = heapq.nsmallest(self.k, items,
                                  key=lambda it: (-it[1], it[0]))
            for r, (w, s) in enumerate(top, start=1):
                keys_out.append(key)
                terms_out.append(w)
                scores_out.append(round(s, self.digits))
                ranks_out.append(r)
        key_type = batch.schema.field(self.key_column).type
        return pa.table({self.key_column: pa.array(keys_out, key_type),
                         "term": pa.array(terms_out, pa.string()),
                         "score": pa.array(scores_out, pa.float64()),
                         "rank": pa.array(ranks_out, pa.int64())})


def tfidf_top_terms(ds, *, key_column: str = "doc_id",
                    text_column: str = "text", k: int = 3):
    """Per-document top-k TF-IDF terms (the classic keyword-extraction /
    document-tagging signal): train global document frequencies, then
    one streaming scoring pass.  ``ds`` is consumed twice — pass the
    pruned 2-column read so each pass streams from storage."""
    n_docs, df = train_df_counts(ds, text_column)
    return ds.map_batches(
        TfidfTopTerms(n_docs, df, k=k, key_column=key_column,
                      text_column=text_column),
        batch_format="pyarrow",
    )
