"""Distributed multinomial Naive Bayes — train a text classifier on the
corpus and score every document, both as streaming Ray Data passes.

The supervised sibling of the ``stages/lm.py`` bigram LM: the canonical
cheap corpus classifier (fastText-without-embeddings, the CCNet/Gopher
quality-vs-label triage shape) trained and applied without the data ever
leaving the workers.

Shape (mirrors the LM's r3 design):

1. **Train**: per-batch PARTIAL (label, token-fingerprint, count) rows
   via one Arrow ``group_by`` over the batch's flat fingerprint stream
   (tokens hashed once per distinct token per actor — the
   ``_TokenHasher`` cache), plus one (label, doc-count) row per label;
   one ``groupby.sum`` merges the partials.  The gather is
   classes×vocab bounded (the model, not the corpus); per-class token
   totals fall out of the gathered counts, the shared vocabulary size V
   from one ``np.unique`` over the gathered fingerprints.
2. **Score**: an actor-pool ``map_batches`` hashes each batch's tokens
   once, then for each class fetches token counts with ONE
   ``np.searchsorted`` against the broadcast sorted arrays;
   ``score_c(d) = ln(docs_c/N) + Σ_w ln(cnt_c(w)+1) − n_d·ln(T_c+V)``
   (add-one smoothing over the shared vocab), per-doc sums via
   ``np.add.reduceat``, rounded to ``digits`` BEFORE the argmax so
   cross-engine summation-order ulps can't flip the prediction; ties
   break to the lexicographically smallest label.

Same 64-bit-fingerprint collision argument as ``stages/lm.py``; any
collision is deterministic and the oracle gate would catch it.  No
reference analogue (llm-food has no model training); brief-scope
training-data operator.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .lm import _TokenHasher, _lookup_counts


class _ClassCountPartials(_TokenHasher):
    """Per-batch partials: kind 0 = (label, token fp, n) occurrence
    counts (Arrow group_by — C-speed, vocabulary-sized output), kind 1 =
    (label, 0, n_docs).  Fingerprints ride as int64 views (Ray's
    groupby object-boxes uint64)."""

    def __init__(self, text_column: str, label_column: str):
        super().__init__()
        self.text_column = text_column
        self.label_column = label_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx, _, lens, hu = self.flat_token_enc(batch, self.text_column)
        fps = (hu[idx] if len(idx) else np.empty(0, np.uint64))
        labels = batch.column(self.label_column)
        if isinstance(labels, pa.ChunkedArray):
            labels = labels.combine_chunks()
        tok_labels = labels.take(
            pa.array(np.repeat(np.arange(len(lens), dtype=np.int64), lens)))
        tok = pa.table({"label": tok_labels,
                        "h": pa.array(fps.view(np.int64), pa.int64())})
        g = tok.group_by(["label", "h"]).aggregate([("h", "count")])
        g = g.rename_columns(["label", "h", "n"])
        d = (batch.select([self.label_column])
             .group_by([self.label_column])
             .aggregate([(self.label_column, "count")])
             .rename_columns(["label", "n"]))
        return pa.table({
            "kind": pa.array([0] * g.num_rows + [1] * d.num_rows, pa.int8()),
            "label": pa.concat_arrays(
                [g.column("label").combine_chunks().cast(pa.string()),
                 d.column("label").combine_chunks().cast(pa.string())]),
            "h": pa.concat_arrays(
                [g.column("h").combine_chunks(),
                 pa.array([0] * d.num_rows, pa.int64())]),
            "n": pa.concat_arrays(
                [g.column("n").combine_chunks().cast(pa.int64()),
                 d.column("n").combine_chunks().cast(pa.int64())]),
        })


def train_nb_model(ds, text_column: str = "text",
                   label_column: str = "lang", *,
                   min_count: int = 1) -> dict:
    """→ packed model: per-label sorted fingerprint/count arrays plus
    (docs_c, T_c) scalars, shared vocab size V, total doc count.  The
    only driver materialization is the merged (label, fp) count table —
    classes×vocab bounded, the model itself.

    ``min_count`` (the LM's Zipf posture, `stages/lm.py`): (label, fp)
    rows below the threshold are pruned BEFORE the driver gather, so
    the broadcast model size is Zipf-bounded at web scale; V and the
    per-class token totals T_c are computed exactly PRE-prune (V from a
    model-sized groupby(h) distinct pass, T_c from per-block scalar
    sums), so the smoothing denominators — and every score of a
    surviving token — are bit-identical to the unpruned model.
    ``min_count=1`` (default) prunes nothing.  ``model["stats"]``
    records rows before/after (the exchange-vs-broadcast mass)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    merged = (ds.map_batches(
                  _ClassCountPartials(text_column, label_column),
                  batch_format="pyarrow")
                .groupby(["kind", "label", "h"])
                .aggregate(Sum("n", alias_name="n")))
    if min_count > 1:
        merged = merged.materialize()

        def block_scalars(b: pa.Table) -> pa.Table:
            tb = b.filter(pc.equal(b.column("kind"), 0))
            g = tb.group_by(["label"]).aggregate([("n", "sum")])
            return g.rename_columns(["label", "t"])

        # exact pre-prune per-class totals from model-sized block scalars
        pre_t: dict = {}
        for b in merged.map_batches(block_scalars, batch_format="pyarrow") \
                       .iter_batches(batch_size=None, batch_format="pyarrow"):
            for lab, tt in zip(b.column("label").to_pylist(),
                               b.column("t").to_pylist()):
                pre_t[lab] = pre_t.get(lab, 0) + int(tt)
        # exact pre-prune V: distinct token fp across labels — one
        # model-sized groupby, counted from per-block scalars
        def tok_h(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b.column("kind"), 0)).select(["h"])

        def block_rows(b: pa.Table) -> pa.Table:
            return pa.table({"nv": pa.array([b.num_rows], pa.int64())})

        from ray.data.aggregate import Count

        v_exact = sum(
            bb.column("nv")[0].as_py()
            for bb in merged.map_batches(tok_h, batch_format="pyarrow")
                            .groupby("h").aggregate(Count(alias_name="c"))
                            .map_batches(block_rows, batch_format="pyarrow")
                            .iter_batches(batch_size=None,
                                          batch_format="pyarrow"))

        def prune(b: pa.Table) -> pa.Table:
            keep = pc.or_(pc.not_equal(b.column("kind"), 0),
                          pc.greater_equal(b.column("n"), min_count))
            return b.filter(keep)

        rows_merged = merged.count()
        gathered = merged.map_batches(prune, batch_format="pyarrow")
    else:
        pre_t = None
        v_exact = None
        rows_merged = None
        gathered = merged

    tables = [b for b in gathered.iter_batches(batch_size=None,
                                               batch_format="pyarrow")
              if len(b)]
    if not tables:
        return {"labels": [], "classes": {}, "v": 0.0, "n_docs": 0}
    t = pa.concat_tables(tables, promote_options="default")
    kind = t.column("kind").to_numpy(zero_copy_only=False)
    label = np.asarray(t.column("label").to_pylist(), dtype=object)
    h = (t.column("h").to_numpy(zero_copy_only=False)
         .astype(np.int64).view(np.uint64))
    n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)

    tok = kind == 0
    v = len(np.unique(h[tok])) if v_exact is None else v_exact
    classes: dict = {}
    for lab in np.unique(label):
        sel = tok & (label == lab)
        hk, nk = h[sel], n[sel]
        order = np.argsort(hk)
        dsel = (~tok) & (label == lab)
        classes[str(lab)] = {
            "h": hk[order],
            "n": nk[order],
            "t": (int(nk.sum()) if pre_t is None
                  else int(pre_t.get(lab, 0))),
            "docs": int(n[dsel].sum()),
        }
    n_docs = sum(c["docs"] for c in classes.values())
    model = {"labels": sorted(classes), "classes": classes,
             "v": float(v), "n_docs": int(n_docs)}
    if rows_merged is not None:
        model["stats"] = {"min_count": int(min_count),
                          "rows_merged": int(rows_merged),
                          "rows_model": int(len(h))}
    return model


class NBScorer(_TokenHasher):
    """Per-batch argmax scoring against the broadcast NB model (see
    module docstring for the score formula and determinism pinning)."""

    def __init__(self, model, key_column: str = "doc_id",
                 text_column: str = "text", digits: int = 6):
        super().__init__()
        self._model_src = model
        self._model = None
        self.key_column = key_column
        self.text_column = text_column
        self.digits = digits

    def _get_model(self) -> dict:
        if self._model is None:
            src = self._model_src
            if type(src).__name__ == "ObjectRef":
                import ray as _ray

                src = _ray.get(src)
            self._model = src
        return self._model

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self._get_model()
        labels = m["labels"]
        th_all, lens = self.flat_token_fps(batch, self.text_column)
        n_rows = len(lens)
        if not labels:
            return pa.table({
                self.key_column: batch.column(self.key_column),
                "pred": pa.array([None] * n_rows, pa.string()),
                "score": pa.array([0.0] * n_rows, pa.float64()),
            })
        starts = np.r_[0, np.cumsum(lens)[:-1]]
        pos = lens > 0  # reduceat mishandles zero-length segments
        scores = np.empty((n_rows, len(labels)), np.float64)
        for j, lab in enumerate(labels):
            c = m["classes"][lab]
            prior = math.log(c["docs"] / m["n_docs"])
            denom = math.log(c["t"] + m["v"])
            sums = np.zeros(n_rows)
            if len(th_all) and pos.any():
                terms = np.log(
                    _lookup_counts(c["h"], c["n"], th_all) + 1.0)
                sums[pos] = np.add.reduceat(terms, starts[pos])
            scores[:, j] = prior + sums - lens * denom
        scores = np.round(scores, self.digits)
        best = np.argmax(scores, axis=1)  # first max → smallest label
        return pa.table({
            self.key_column: batch.column(self.key_column),
            "pred": pa.array([labels[b] for b in best], pa.string()),
            "score": pa.array(scores[np.arange(n_rows), best], pa.float64()),
        })


def nb_classify(ds, *, key_column: str = "doc_id",
                text_column: str = "text", label_column: str = "lang",
                min_count: int = 1, concurrency=None):
    """Train the NB model on ``ds`` and predict a label for every row in
    one streaming actor-pool pass (model rides the actor-constructor
    spec — broadcast once, restart-safe)."""
    from .pools import scoring_pool

    model = train_nb_model(ds, text_column, label_column,
                           min_count=min_count)
    return ds.map_batches(
        NBScorer,
        fn_constructor_kwargs={"model": model,
                               "key_column": key_column,
                               "text_column": text_column},
        concurrency=scoring_pool(concurrency),
        batch_format="pyarrow",
    )


def nb_classify_against(ds, train_ds, *, key_column: str = "doc_id",
                        text_column: str = "text",
                        label_column: str = "lang",
                        min_count: int = 1, concurrency=None):
    """Train on a LABELED reference corpus, predict over ``ds`` (the
    production shape: a small curated labeled set classifies the crawl)."""
    from .pools import scoring_pool

    model = train_nb_model(train_ds, text_column, label_column,
                           min_count=min_count)
    return ds.map_batches(
        NBScorer,
        fn_constructor_kwargs={"model": model,
                               "key_column": key_column,
                               "text_column": text_column},
        concurrency=scoring_pool(concurrency),
        batch_format="pyarrow",
    )


def grouped_logreg_fit(ds, group_column: str, x_columns: list,
                       y_column: str, *, iters: int = 6, lr: float = 0.5):
    """Per-group binary linear classifier trained by full-batch gradient
    descent in EXACT fixed-point arithmetic — the distributed "fit a
    cheap quality classifier on corpus statistics" primitive (the
    trainable sibling of ``nb_classify``; no reference analogue,
    llm-food trains nothing — brief-scope training-data operator).

    Exactness contract (the repo's integer-moments rule applied to an
    ITERATIVE optimizer):

    - features ``x_columns`` and the 0/1 label are caller-supplied
      int64 columns; weights live as int64 micro-units (1e-6);
    - the squashing function is the RATIONAL sigmoid
      ``s = 0.5 + 0.5·z/(1+|z|)`` — monotone, saturating, and computed
      with add/abs/divide only, so it is bit-identical across engines
      (libm ``exp`` is the one transcendental whose last-ulp behavior
      differs between DuckDB and numpy; ``ln`` parity in stages/lm.py
      is measured-safe, but an optimizer COMPOUNDS ulps across
      iterations, so the link function avoids libm entirely);
    - per-row residuals snap to a 1e-6 grid
      (``floor(r·1e6 + 0.5)``), per-group gradients are int64 sums of
      residual×feature — order-independent — and the weight update
      ``w ← w − floor(lr·G/n + 0.5)`` is the same IEEE float64
      expression on both engines.  Every iteration therefore produces
      identical int64 weights in Ray and in the unrolled-CTE SQL twin.

    Scale shape: the feature projection (group + label + k ints/row) is
    materialized ONCE; each of the ``iters`` epochs is one streaming
    ``map_batches`` partial (per-batch Arrow ``group_by`` → groups×(k+2)
    rows) plus one groups-sized ``groupby.sum`` — the model (groups×k
    int64) rides the driver and is re-broadcast per epoch, never the
    data.  A final epoch-shaped pass scores training accuracy
    (``z ≥ 0`` ⇔ ``s ≥ 0.5`` exactly, integer compare).  Caller owns
    overflow headroom: |G| = |Σ r_int·x| ≤ rows·1e6·max|x| must stay
    below 2^53 for the float64 update (≤ ~9e6 rows/group at |x| ≤ 1e3;
    shrink the residual grid or pre-scale features past that).

    Returns one row per group:
    ``(group, n, correct, w0_micro..wk_micro)`` — bias weight first.
    """
    import ray.data as rd

    from ray.data.aggregate import Sum

    k = len(x_columns) + 1  # bias + features
    wcols = [f"w{j}_micro" for j in range(k)]
    feats = ds.materialize()

    def _group_rows(b: pa.Table):
        """Dictionary-encode the group column: per-key Python cost once
        per DISTINCT group per batch, row alignment via codes."""
        import pyarrow.compute as pc

        denc = pc.dictionary_encode(
            pc.cast(b.column(group_column), pa.string()))
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        dvals = np.asarray(denc.dictionary.to_pylist(), dtype=str)
        codes = denc.indices.to_numpy(zero_copy_only=False)
        return dvals, codes

    def _lookup_weights(dvals, codes, weights_keys, weights_mat, n):
        if not len(weights_keys):
            return np.zeros((n, k), np.int64)
        didx = np.clip(np.searchsorted(weights_keys, dvals),
                       0, len(weights_keys) - 1)
        Wd = weights_mat[didx]
        miss = weights_keys[didx] != dvals
        if miss.any():
            Wd = Wd.copy()
            Wd[miss] = 0
        return Wd[codes]

    def grad_partial_fn(weights_keys, weights_mat):
        def partial(b: pa.Table) -> pa.Table:
            g = b.column(group_column)
            dvals, codes = _group_rows(b)
            X = np.column_stack(
                [np.ones(len(b), np.int64)]
                + [b.column(c).to_numpy(zero_copy_only=False)
                   .astype(np.int64) for c in x_columns])
            y = b.column(y_column).to_numpy(
                zero_copy_only=False).astype(np.int64)
            W = _lookup_weights(dvals, codes, weights_keys,
                                weights_mat, len(b))
            z_int = (X * W).sum(1)
            z = z_int.astype(np.float64) * 1e-6
            s = 0.5 + 0.5 * z / (1.0 + np.abs(z))
            r_int = np.floor((s - y) * 1e6 + 0.5).astype(np.int64)
            cols = {group_column: g,
                    "n": pa.array(np.ones(len(b), np.int64))}
            for j in range(k):
                cols[f"g{j}"] = pa.array(r_int * X[:, j])
            t = pa.table(cols)
            agg = t.group_by([group_column]).aggregate(
                [("n", "sum")] + [(f"g{j}", "sum") for j in range(k)])
            return agg.rename_columns(
                [group_column, "n"] + [f"g{j}" for j in range(k)])
        return partial

    weights: dict = {}
    for _ in range(iters):
        keys = np.array(sorted(weights), dtype=str)
        mat = (np.array([weights[kk] for kk in keys], np.int64)
               if len(keys) else np.zeros((0, k), np.int64))
        merged = (feats.map_batches(grad_partial_fn(keys, mat),
                                    batch_format="pyarrow")
                  .groupby(group_column)
                  .aggregate(Sum("n", alias_name="n"),
                             *[Sum(f"g{j}", alias_name=f"g{j}")
                               for j in range(k)]))
        for row in merged.take_all():
            key = str(row[group_column])
            w = weights.get(key)
            if w is None:
                w = np.zeros(k, np.int64)
            n = np.float64(row["n"])
            delta = np.array(
                [np.floor(lr * np.float64(row[f"g{j}"]) / n + 0.5)
                 for j in range(k)], np.int64)
            weights[key] = w - delta
    keys = np.array(sorted(weights), dtype=str)
    mat = (np.array([weights[kk] for kk in keys], np.int64)
           if len(keys) else np.zeros((0, k), np.int64))

    def acc_partial(b: pa.Table) -> pa.Table:
        g = b.column(group_column)
        dvals, codes = _group_rows(b)
        X = np.column_stack(
            [np.ones(len(b), np.int64)]
            + [b.column(c).to_numpy(zero_copy_only=False)
               .astype(np.int64) for c in x_columns])
        y = b.column(y_column).to_numpy(
            zero_copy_only=False).astype(np.int64)
        W = _lookup_weights(dvals, codes, keys, mat, len(b))
        z_int = (X * W).sum(1)
        correct = ((z_int >= 0) == (y == 1)).astype(np.int64)
        t = pa.table({group_column: g,
                      "n": pa.array(np.ones(len(b), np.int64)),
                      "correct": pa.array(correct)})
        agg = t.group_by([group_column]).aggregate(
            [("n", "sum"), ("correct", "sum")])
        return agg.rename_columns([group_column, "n", "correct"])

    acc = (feats.map_batches(acc_partial, batch_format="pyarrow")
           .groupby(group_column)
           .aggregate(Sum("n", alias_name="n"),
                      Sum("correct", alias_name="correct")))

    def attach_weights(b: pa.Table) -> pa.Table:
        gv = np.asarray(b.column(group_column).to_pylist(), dtype=object)
        idx = np.clip(np.searchsorted(keys, gv.astype(str)),
                      0, max(len(keys) - 1, 0))
        W = mat[idx] if len(keys) else np.zeros((len(b), k), np.int64)
        out = {group_column: b.column(group_column),
               "n": b.column("n"), "correct": b.column("correct")}
        for j in range(k):
            out[wcols[j]] = pa.array(W[:, j])
        return pa.table(out)

    return acc.map_batches(attach_weights, batch_format="pyarrow")
