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


def _dup_corpus():
    # every gram occurs >= 2 times -> min_count=2 is provably exact
    texts = ["a b c a b", "a b c a b", "c a b", "c a b", "x y", "x y"]
    return [{"doc_id": i, "text": t} for i, t in enumerate(texts)]


def test_lm_score_pruned_equals_unpruned(ray_session):
    """min_count below the corpus minimum gram count prunes nothing —
    the exact regime the 100-TB knob relies on (VERDICT r2 #1)."""
    from helpers import dataset_from_items

    from llm_food_ray.stages.lm import lm_score

    ds = dataset_from_items(_dup_corpus())
    a = (lm_score(ds).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (lm_score(ds, min_count=2).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
    # an actually-lossy threshold changes scores only via dropped grams
    c = (lm_score(ds, min_count=3).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert (c["n_bigrams"] == a["n_bigrams"]).all()


def test_lm_hashed_model_matches_string_twin(ray_session):
    """Fingerprint-space training == string-Counter training (the debug
    twin), scored through the same vectorized scorer."""
    from helpers import dataset_from_items

    from llm_food_ray.stages.lm import (
        BigramNllScorer, lm_score, train_bigram_counts)

    rows = _dup_corpus() + [{"doc_id": 99, "text": "a b q z b c"}]
    ds = dataset_from_items(rows)
    uni, big = train_bigram_counts(ds)
    got = lm_score(ds).to_pandas().set_index("doc_id")["nll"]
    import pyarrow as pa

    sc = BigramNllScorer(uni, big)
    want = sc(pa.table({"doc_id": [r["doc_id"] for r in rows],
                        "text": [r["text"] for r in rows]})
              ).to_pandas().set_index("doc_id")["nll"]
    assert got.sort_index().equals(want.sort_index())


def test_tfidf_pruned_equals_unpruned(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.search import tfidf_top_terms

    ds = dataset_from_items(_dup_corpus())
    cols = ["doc_id", "rank"]
    a = (tfidf_top_terms(ds, k=2).to_pandas()
         .sort_values(cols).reset_index(drop=True))
    b = (tfidf_top_terms(ds, k=2, min_count=2).to_pandas()
         .sort_values(cols).reset_index(drop=True))
    assert a.equals(b)


def test_tfidf_hashed_model_matches_string_twin(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.search import (
        TfidfTopTerms, tfidf_top_terms, train_df_counts)

    import pyarrow as pa

    rows = _dup_corpus() + [{"doc_id": 99, "text": "q a a b zz"}]
    ds = dataset_from_items(rows)
    n_docs, df = train_df_counts(ds)
    got = (tfidf_top_terms(ds, k=3).to_pandas()
           .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    sc = TfidfTopTerms(n_docs, df, k=3)
    want = (sc(pa.table({"doc_id": [r["doc_id"] for r in rows],
                         "text": [r["text"] for r in rows]})).to_pandas()
            .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    assert got.equals(want)


def test_lm_score_against_cross_domain(ray_session):
    """Reference-trained scoring: in-domain text scores the trained
    counts, out-of-domain grams hit the add-one floor (cu=0, cb=0)."""
    import math

    import ray.data as rd

    import pyarrow as pa

    from llm_food_ray.stages.lm import lm_score_against

    ref = rd.from_arrow(pa.table({"text": ["a b a b", "a b"]}))
    # ref model: uni a:3 b:3 (V=2); big "a b":3, "b a":1
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2],
                                 "text": ["a b", "x y"]}))
    out = (lm_score_against(ds, ref).to_pandas()
           .set_index("doc_id"))
    v = 2.0
    assert out.loc[1, "nll"] == round(-math.log((3 + 1.0) / (3 + v)), 6)
    # fully out-of-domain: cb=0, cu=0 -> -ln(1/V)
    assert out.loc[2, "nll"] == round(-math.log(1.0 / (0 + v)), 6)
    assert (out["n_bigrams"] == 1).all()


def test_scoring_pool_derives_from_cluster(ray_session):
    """Pool max tracks the cluster CPU count; overrides pass through."""
    import ray

    from llm_food_ray.stages.pools import scoring_pool

    lo, hi = scoring_pool()
    assert lo == 1
    assert hi == int(ray.cluster_resources()["CPU"])
    assert scoring_pool(3) == (1, 3)
    assert scoring_pool((2, 5)) == (2, 5)


def test_model_stats_record_prune_posture(ray_session):
    """model["stats"] reports merged rows vs broadcast rows: pruning at
    min_count=2 shrinks the model but never the merged exchange mass."""
    import ray.data as rd

    from llm_food_ray.stages.lm import train_bigram_model
    from llm_food_ray.stages.search import train_df_model

    ds = rd.from_items([{"text": "a a b"}, {"text": "a c"}])
    full = train_bigram_model(ds, "text")
    pruned = train_bigram_model(ds, "text", min_count=2)
    # grams: unigrams a(3) b(1) c(1); bigrams "a a"(1) "a b"(1) "a c"(1)
    assert full["stats"] == {"min_count": 1, "rows_merged": 6,
                             "rows_model": 6}
    assert pruned["stats"] == {"min_count": 2, "rows_merged": 6,
                               "rows_model": 1}
    assert pruned["v"] == full["v"] == 3.0   # V counted before the prune

    dfull = train_df_model(ds, "text")
    dpruned = train_df_model(ds, "text", min_count=2)
    # term dfs: a(2) b(1) c(1)
    assert dfull["stats"]["rows_merged"] == 3
    assert dfull["stats"]["rows_model"] == 3
    assert dpruned["stats"]["rows_model"] == 1
    assert dpruned["n_docs"] == 2


def test_lm_score_single_tokenize_byte_equal(ray_session):
    """reuse_tokens=True (one TokenizeFps pass feeding train AND score)
    is bit-identical to the streaming two-pass plan."""
    import ray.data as rd

    from llm_food_ray.stages.lm import lm_score

    ds = rd.from_items([
        {"doc_id": 1, "text": "a b a b c"},
        {"doc_id": 2, "text": "a b"},
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": "c c c c a"},
    ])
    one = {r["doc_id"]: (r["n_bigrams"], r["nll"])
           for r in lm_score(ds, reuse_tokens=True).take_all()}
    two = {r["doc_id"]: (r["n_bigrams"], r["nll"])
           for r in lm_score(ds, reuse_tokens=False).take_all()}
    assert one == two
    assert one[3] == (0, 0.0)
