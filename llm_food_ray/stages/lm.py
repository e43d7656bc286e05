"""Corpus n-gram language-model scoring — the perplexity-style quality
signal (CCNet / Wenzek et al. 2020 filter docs by LM perplexity; here the
LM is a bigram model with add-one smoothing trained on the corpus itself,
so the whole operator stays deterministic and SQL-reconstructible).

Shape:

1. **Train**: per-batch PARTIAL unigram+bigram counts (a local hash
   aggregation — the exchange ships vocabulary-sized partials, never a
   row per token), one ``groupby.sum`` merges them, and the merged table
   broadcasts to the scorers.  At web scale the broadcast LM must be
   PRUNED (top-K n-grams; the smoothing floor absorbs the dropped tail —
   the standard CCNet practice) or partition-joined in fingerprint space
   like ``stages/dedup`` verification; the synthetic corpus vocabulary
   is small enough to broadcast whole.
2. **Score**: one streaming ``map_batches`` computes each document's
   mean negative log-likelihood  −(1/B)·Σ ln((c(w₁w₂)+1)/(c(w₁)+V))
   over its B bigrams (V = unigram vocabulary size); docs with <2
   tokens score 0 with ``n_bigrams`` 0.

Tokenization is whitespace split (== the SQL oracle); the score rounds
to 6 decimals so cross-engine log/summation-order ulps cancel.
"""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa


def _tokens(text: str) -> list[str]:
    return (text or "").split()


def train_bigram_counts(ds, text_column: str = "text"):
    """→ (unigram Counter, bigram Counter) merged across the corpus via
    pre-aggregated partials + one vocabulary-sized groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        uni: Counter = Counter()
        big: Counter = Counter()
        for t in batch.column(text_column).to_pylist():
            ws = _tokens(t)
            uni.update(ws)
            big.update(" ".join(p) for p in zip(ws, ws[1:]))
        kinds, grams, ns = [], [], []
        for g, n in uni.items():
            kinds.append("u"); grams.append(g); ns.append(n)
        for g, n in big.items():
            kinds.append("b"); grams.append(g); ns.append(n)
        return pa.table({"kind": pa.array(kinds, pa.string()),
                         "gram": pa.array(grams, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(["kind", "gram"])
                .aggregate(Sum("n", alias_name="n"))).to_pandas()
    uni: Counter = Counter()
    big: Counter = Counter()
    for kind, gram, n in merged.itertuples(index=False):
        (uni if kind == "u" else big)[gram] = int(n)
    return uni, big


class BigramNllScorer:
    """Per-batch mean bigram NLL against broadcast corpus counts."""

    def __init__(self, uni: dict, big: dict, key_column: str = "doc_id",
                 text_column: str = "text", digits: int = 6):
        self.uni = dict(uni)
        self.big = dict(big)
        self.v = float(len(self.uni))
        self.key_column = key_column
        self.text_column = text_column
        self.digits = digits

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_big, nll = [], []
        for t in batch.column(self.text_column).to_pylist():
            ws = _tokens(t)
            if len(ws) < 2:
                n_big.append(0)
                nll.append(0.0)
                continue
            s = 0.0
            b = 0
            for w1, w2 in zip(ws, ws[1:]):
                cb = self.big.get(w1 + " " + w2, 0)
                cu = self.uni.get(w1, 0)
                s += -math.log((cb + 1.0) / (cu + self.v))
                b += 1
            n_big.append(b)
            nll.append(round(s / b, self.digits))
        return pa.table({self.key_column: batch.column(self.key_column),
                         "n_bigrams": pa.array(n_big, pa.int64()),
                         "nll": pa.array(nll, pa.float64())})


def lm_score(ds, *, key_column: str = "doc_id", text_column: str = "text"):
    """Train the corpus bigram LM, then score every document's mean
    negative log-likelihood in one streaming pass."""
    uni, big = train_bigram_counts(ds, text_column)
    return ds.map_batches(
        BigramNllScorer(uni, big, key_column, text_column),
        batch_format="pyarrow",
    )
