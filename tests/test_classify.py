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
