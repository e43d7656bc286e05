"""DSIR-style hashed n-gram importance weighting (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): score
every document by how target-like its hashed n-gram distribution is,
log w(d) = Σ_g [ln p_target(bucket(g)) − ln p_source(bucket(g))] over
the document's unigrams+bigrams — the standard signal for resampling a
raw crawl toward a target domain (here: a deterministic in-corpus target
slice, e.g. one language, so the whole operator is SQL-reconstructible).

Shape (the reference has no analogue; llm-food's only quality gate is
extraction status, llm_food/app.py):

1. **Count**: per-batch PARTIAL bucket counts for source (all rows) and
   target (mask rows) — each batch emits ≤ ``num_buckets`` rows of
   (bucket, src_n, tgt_n), so the exchange is buckets×blocks no matter
   the corpus size; one ``groupby.sum`` merges them into the two
   B-bucket count vectors (B defaults to 4096 → the "model" is ~64 KB;
   DSIR's own B is 10^4).
2. **Score**: the count vectors broadcast once (closure-captured — two
   numpy arrays), and one streaming ``map_batches`` computes each
   document's log-weight with add-one smoothing over B buckets,
   term = ln((c_tgt+1)/(T+B)) − ln((c_src+1)/(S+B)), matching the SQL
   twin ulp-for-ulp (two lns, subtracted, summed, rounded to 6).

Buckets are md5-based (``int(md5(gram)[:8], 16) % B``) so DuckDB
reconstructs them exactly; gram→bucket is memoized per actor (corpus
vocabulary re-hashes once per worker, not once per occurrence).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pyarrow as pa


def _grams(text: str) -> list[str]:
    ws = (text or "").split()
    return ws + [a + " " + b for a, b in zip(ws, ws[1:])]


def _bucket(gram: str, num_buckets: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % num_buckets


def train_bucket_counts(ds, text_column: str, target_column: str,
                        target_value, num_buckets: int):
    """→ (src_counts, tgt_counts) int64 arrays of length ``num_buckets``,
    merged across the corpus via pre-aggregated partials."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        src: Counter = Counter()
        tgt: Counter = Counter()
        cache: dict[str, int] = {}
        tvals = batch.column(target_column).to_pylist()
        for t, tv in zip(batch.column(text_column).to_pylist(), tvals):
            for g in _grams(t):
                b = cache.get(g)
                if b is None:
                    b = cache[g] = _bucket(g, num_buckets)
                src[b] += 1
                if tv == target_value:
                    tgt[b] += 1
        buckets = sorted(src)
        return pa.table({
            "bucket": pa.array(buckets, pa.int64()),
            "src_n": pa.array([src[b] for b in buckets], pa.int64()),
            "tgt_n": pa.array([tgt[b] for b in buckets], pa.int64()),
        })

    merged = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("bucket")
                .aggregate(Sum("src_n", alias_name="src_n"),
                           Sum("tgt_n", alias_name="tgt_n"))).to_pandas()
    src = np.zeros(num_buckets, dtype=np.int64)
    tgt = np.zeros(num_buckets, dtype=np.int64)
    src[merged["bucket"].to_numpy()] = merged["src_n"].to_numpy()
    tgt[merged["bucket"].to_numpy()] = merged["tgt_n"].to_numpy()
    return src, tgt


class DsirScorer:
    """Per-batch log importance weights against broadcast bucket counts."""

    def __init__(self, src: np.ndarray, tgt: np.ndarray,
                 key_column: str = "doc_id", text_column: str = "text",
                 digits: int = 6):
        self.key_column = key_column
        self.text_column = text_column
        self.digits = digits
        self.num_buckets = len(src)
        b = float(self.num_buckets)
        s_tot = float(src.sum()) + b
        t_tot = float(tgt.sum()) + b
        # per-bucket term precomputed once per actor: the scorer does a
        # single table lookup per gram
        self.term = np.array(
            [math.log((int(tgt[i]) + 1.0) / t_tot)
             - math.log((int(src[i]) + 1.0) / s_tot)
             for i in range(self.num_buckets)], dtype=np.float64)
        self.cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_grams, log_w = [], []
        cache = self.cache
        for t in batch.column(self.text_column).to_pylist():
            gs = _grams(t)
            s = 0.0
            for g in gs:
                b = cache.get(g)
                if b is None:
                    b = cache[g] = _bucket(g, self.num_buckets)
                s += self.term[b]
            n_grams.append(len(gs))
            log_w.append(round(s, self.digits) if gs else 0.0)
        return pa.table({self.key_column: batch.column(self.key_column),
                         "n_grams": pa.array(n_grams, pa.int64()),
                         "log_w": pa.array(log_w, pa.float64())})


def dsir_weights(ds, *, key_column: str = "doc_id", text_column: str = "text",
                 target_column: str = "lang", target_value="en",
                 num_buckets: int = 4096):
    """Train source/target hashed-n-gram bucket counts, then score every
    document's log importance weight in one streaming pass."""
    src, tgt = train_bucket_counts(ds, text_column, target_column,
                                   target_value, num_buckets)
    return ds.map_batches(
        DsirScorer(src, tgt, key_column, text_column),
        batch_format="pyarrow",
    )
