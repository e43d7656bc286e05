"""Bigram LM scoring: count training parity and NLL formula checks."""

from __future__ import annotations

import math

import pyarrow as pa


def test_train_bigram_counts(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.lm import train_bigram_counts

    texts = ["a b a b c", "b c", "", "a"]
    ds = rd.from_arrow(pa.table({"doc_id": range(4), "text": texts})) \
           .repartition(3)
    uni, big = train_bigram_counts(ds)
    assert uni == {"a": 3, "b": 3, "c": 2}
    assert big == {"a b": 2, "b a": 1, "b c": 2}


def test_lm_score_formula(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.lm import lm_score

    texts = {1: "a b a", 2: "c", 3: ""}
    ds = rd.from_arrow(pa.table({"doc_id": list(texts),
                                 "text": list(texts.values())}))
    out = lm_score(ds).to_pandas().set_index("doc_id")
    # corpus: uni a:2 b:1 c:1 (V=3); big: "a b":1 "b a":1
    v = 3.0
    t1 = -math.log((1 + 1.0) / (2 + v))  # a->b
    t2 = -math.log((1 + 1.0) / (1 + v))  # b->a
    assert out.loc[1, "n_bigrams"] == 2
    assert out.loc[1, "nll"] == round((t1 + t2) / 2, 6)
    # <2 tokens -> 0
    for k in (2, 3):
        assert out.loc[k, "n_bigrams"] == 0 and out.loc[k, "nll"] == 0.0


def test_lm_score_unseen_bigram_floor(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.lm import BigramNllScorer

    # scoring with counts from elsewhere: unseen bigram hits the +1 floor
    sc = BigramNllScorer({"x": 5, "y": 2}, {"x y": 2})
    out = sc(pa.table({"doc_id": [1], "text": ["x q"]})).to_pylist()[0]
    assert out["n_bigrams"] == 1
    assert out["nll"] == round(-math.log((0 + 1.0) / (5 + 2.0)), 6)
