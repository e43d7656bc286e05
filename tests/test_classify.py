"""Naive Bayes classifier tests: formula parity with a naive in-process
implementation, empty-doc / tie handling, and the train-on-reference
variant."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from llm_food_ray.stages.classify import (nb_classify, nb_classify_against,
                                          train_nb_model)


def _from_pandas(df):
    import ray.data as rd

    return rd.from_pandas(df)


def _naive_nb(docs: pd.DataFrame) -> dict:
    cnt: dict = {}
    tot: Counter = Counter()
    dc: Counter = Counter()
    vocab: set = set()
    for r in docs.itertuples():
        ws = (r.text or "").split()
        vocab.update(ws)
        cnt.setdefault(r.lang, Counter()).update(ws)
        tot[r.lang] += len(ws)
        dc[r.lang] += 1
    return {"cnt": cnt, "tot": tot, "dc": dc, "v": len(vocab),
            "n": len(docs), "labels": sorted(cnt)}

def _naive_predict(m: dict, text: str) -> tuple[str, float]:
    ws = (text or "").split()
    best = None
    for lab in m["labels"]:
        s = (math.log(m["dc"][lab] / m["n"])
             + sum(math.log(m["cnt"][lab][w] + 1.0) for w in ws)
             - len(ws) * math.log(m["tot"][lab] + m["v"]))
        s = round(s, 6)
        if best is None or s > best[1]:
            best = (lab, s)
    return best


def test_nb_matches_naive_implementation(ray_session):
    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"]).head(120)
    out = (nb_classify(_from_pandas(docs)).to_pandas()
           .set_index("doc_id"))
    m = _naive_nb(docs)
    for r in docs.itertuples():
        pred, score = _naive_predict(m, r.text)
        g = out.loc[r.doc_id]
        assert g["pred"] == pred
        assert abs(g["score"] - score) < 1e-9


def test_nb_empty_doc_gets_prior_argmax(ray_session):
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["aa bb aa", "cc dd", "", "aa cc"],
        "lang": ["x", "y", "x", "x"],
    })
    out = nb_classify(_from_pandas(df)).to_pandas().set_index("doc_id")
    # doc 2 is empty: score_c = ln prior; x has 3 docs vs y's 1
    assert out.loc[2, "pred"] == "x"
    assert abs(out.loc[2, "score"] - round(math.log(3 / 4), 6)) < 1e-9


def test_nb_tie_breaks_to_smallest_label(ray_session):
    # perfectly symmetric classes → every score ties → min label wins
    df = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["tok", "tok"],
        "lang": ["b", "a"],
    })
    out = nb_classify(_from_pandas(df)).to_pandas()
    assert set(out["pred"]) == {"a"}


def test_nb_against_reference_corpus(ray_session):
    train = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["hund katze maus hund", "dog cat mouse dog"],
        "lang": ["de", "en"],
    })
    target = pd.DataFrame({
        "doc_id": [10, 11],
        "text": ["hund maus", "cat dog dog"],
        "lang": ["?", "?"],
    })
    out = (nb_classify_against(_from_pandas(target), _from_pandas(train))
           .to_pandas().set_index("doc_id"))
    assert out.loc[10, "pred"] == "de"
    assert out.loc[11, "pred"] == "en"


def test_nb_model_shape_and_totals(ray_session):
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b a", "b c", ""],
        "lang": ["x", "y", "y"],
    })
    m = train_nb_model(_from_pandas(df))
    assert m["labels"] == ["x", "y"]
    assert m["v"] == 3.0  # a, b, c
    assert m["n_docs"] == 3
    assert m["classes"]["x"]["t"] == 3
    assert m["classes"]["y"]["t"] == 2
    assert m["classes"]["y"]["docs"] == 2  # empty doc still counts


def test_nb_min_count_prune_preserves_denominators(ray_session):
    import numpy as np

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    ds_fn = lambda: _from_pandas(docs)  # noqa: E731
    m1 = train_nb_model(ds_fn())
    m2 = train_nb_model(ds_fn(), min_count=3)
    # V and per-class totals/docs are PRE-prune exact — identical
    assert m1["v"] == m2["v"]
    for lab in m1["labels"]:
        assert m1["classes"][lab]["t"] == m2["classes"][lab]["t"]
        assert m1["classes"][lab]["docs"] == m2["classes"][lab]["docs"]
    # surviving rows keep their exact counts, all >= min_count
    for lab in m1["labels"]:
        c1, c2 = m1["classes"][lab], m2["classes"][lab]
        pos = np.searchsorted(c1["h"], c2["h"])
        assert (c1["h"][pos] == c2["h"]).all()
        assert (c1["n"][pos] == c2["n"]).all()
        assert (c2["n"] >= 3).all()
    assert m2["stats"]["rows_model"] <= m2["stats"]["rows_merged"]


def _naive_logreg(df: pd.DataFrame, xcols: list, iters: int = 6,
                  lr: float = 0.5) -> dict:
    """Single-process replica of grouped_logreg_fit's exact
    fixed-point optimizer (rational sigmoid, 1e-6 residual grid)."""
    import numpy as np

    k = len(xcols) + 1
    out = {}
    for g, part in df.groupby("g"):
        X = np.column_stack([np.ones(len(part), np.int64)]
                            + [part[c].to_numpy(np.int64) for c in xcols])
        y = part["y"].to_numpy(np.int64)
        w = np.zeros(k, np.int64)
        for _ in range(iters):
            z = (X * w).sum(1).astype(np.float64) * 1e-6
            s = 0.5 + 0.5 * z / (1.0 + np.abs(z))
            r = np.floor((s - y) * 1e6 + 0.5).astype(np.int64)
            grad = (r[:, None] * X).sum(0)
            n = np.float64(len(part))
            w = w - np.array([np.floor(lr * np.float64(gj) / n + 0.5)
                              for gj in grad], np.int64)
        z_int = (X * w).sum(1)
        correct = int((((z_int >= 0)) == (y == 1)).sum())
        out[g] = {"w": w, "n": len(part), "correct": correct}
    return out


def _logreg_frame(seed: int = 5, n: int = 120) -> pd.DataFrame:
    import numpy as np

    rng = np.random.RandomState(seed)
    x1 = rng.randint(0, 100, n)
    x2 = rng.randint(0, 50, n)
    # separable-with-noise label on x1
    y = ((x1 > 50) ^ (rng.rand(n) < 0.1)).astype(int)
    g = np.where(rng.rand(n) < 0.5, "a", "b")
    return pd.DataFrame({"g": g, "y": y, "x1": x1, "x2": x2})


def test_grouped_logreg_matches_naive(ray_session):
    from llm_food_ray.stages.classify import grouped_logreg_fit

    df = _logreg_frame()
    out = (grouped_logreg_fit(_from_pandas(df), "g", ["x1", "x2"], "y")
           .to_pandas().set_index("g"))
    want = _naive_logreg(df, ["x1", "x2"])
    for g in ("a", "b"):
        assert out.loc[g, "n"] == want[g]["n"]
        assert out.loc[g, "correct"] == want[g]["correct"]
        for j in range(3):
            assert out.loc[g, f"w{j}_micro"] == want[g]["w"][j]


def test_grouped_logreg_batching_invariant(ray_session):
    from llm_food_ray.stages.classify import grouped_logreg_fit

    df = _logreg_frame(seed=9)
    cols = ["n", "correct", "w0_micro", "w1_micro", "w2_micro"]
    outs = []
    for nblocks in (1, 7):
        ds = _from_pandas(df).repartition(nblocks)
        outs.append(grouped_logreg_fit(ds, "g", ["x1", "x2"], "y")
                    .to_pandas().set_index("g").sort_index()[cols])
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_grouped_logreg_learns_separable(ray_session):
    import numpy as np

    from llm_food_ray.stages.classify import grouped_logreg_fit

    rng = np.random.RandomState(2)
    x1 = rng.randint(0, 100, 200)
    df = pd.DataFrame({"g": ["only"] * 200, "y": (x1 > 50).astype(int),
                       "x1": x1})
    out = (grouped_logreg_fit(_from_pandas(df), "g", ["x1"], "y",
                              iters=8)
           .to_pandas().set_index("g"))
    # must beat the majority-class baseline on a separable signal
    base = max((x1 > 50).sum(), (x1 <= 50).sum())
    assert out.loc["only", "correct"] > base
    assert out.loc["only", "w1_micro"] > 0  # positive slope on x1
