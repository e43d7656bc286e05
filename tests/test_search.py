"""BM25 keyword search: formula parity vs a pure-Python brute force,
ranking/tie-break determinism, and edge cases."""

from __future__ import annotations

import math

import pyarrow as pa


def _bm25_brute(texts: dict[int, str], terms: tuple[str, ...]) -> dict[int, float]:
    docs = {k: (t or "").split() for k, t in texts.items()}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    scores = {}
    for k, ws in docs.items():
        s = 0.0
        for term in terms:
            df = sum(1 for w in docs.values() if term in w)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            tf = ws.count(term)
            s += idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl)))
        scores[k] = s
    return scores


def test_bm25_matches_brute_force(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.search import bm25_topk

    texts = {
        1: "data model data training corpus",
        2: "model model model",
        3: "corpus of plain text with data inside",
        4: "nothing relevant here at all",
        5: "",
        6: "data data data data model",
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": list(texts.keys()),
        "text": list(texts.values()),
    }))
    got = bm25_topk(ds, ("data", "model"), 3).to_pandas()
    brute = _bm25_brute(texts, ("data", "model"))
    expect = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(got["doc_id"]) == [k for k, _ in expect]
    for (k, s), g in zip(expect, got["score"]):
        assert abs(s - g) < 1e-12, (k, s, g)


def test_bm25_empty_and_missing_terms(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.search import bm25_topk

    # term absent everywhere: idf is still finite, scores all 0
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2], "text": ["a b", "c d"]}))
    got = bm25_topk(ds, ("zzz",), 5).to_pandas()
    assert len(got) == 2 and (got["score"] == 0.0).all()
    # tie at score 0 -> doc_id ascending
    assert list(got["doc_id"]) == [1, 2]

    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "text": pa.array([], pa.string())}))
    out = bm25_topk(empty, ("x",), 5).to_pandas()
    assert len(out) == 0

def test_tfidf_top_terms_brute(ray_session):
    import math
    from collections import Counter

    from helpers import dataset_from_items

    from llm_food_ray.stages.search import tfidf_top_terms

    rows = [
        {"doc_id": 1, "text": "apple banana apple cherry"},
        {"doc_id": 2, "text": "banana banana date"},
        {"doc_id": 3, "text": "apple date date date"},
        {"doc_id": 4, "text": ""},
    ]
    got = (tfidf_top_terms(dataset_from_items(rows), k=2)
           .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True))
    # brute force
    df = Counter()
    for r in rows:
        df.update(set(r["text"].split()))
    nd = len(rows) + 1.0
    want = []
    for r in rows:
        tf = Counter(r["text"].split())
        items = sorted(((w, c * math.log(nd / (df[w] + 1.0)))
                        for w, c in tf.items()), key=lambda it: (-it[1], it[0]))
        for rank, (w, s) in enumerate(items[:2], start=1):
            want.append((r["doc_id"], w, round(s, 6), rank))
    assert list(map(tuple, got[["doc_id", "term", "score", "rank"]]
                    .itertuples(index=False))) == want


def test_bm25_single_scan_matches_two_pass(ray_session):
    """single_scan=True (r3) materializes the projected input once;
    results identical to the default two-pass plan."""
    from helpers import dataset_from_items

    from llm_food_ray.stages.search import bm25_topk

    rows = [{"doc_id": i, "text": f"alpha beta w{i % 7} gamma" * (1 + i % 3)}
            for i in range(50)]
    a = (bm25_topk(dataset_from_items(rows), ("alpha", "w3"), k=5)
         .to_pandas().reset_index(drop=True))
    b = (bm25_topk(dataset_from_items(rows), ("alpha", "w3"), k=5,
                   single_scan=True).to_pandas().reset_index(drop=True))
    assert a.equals(b)


def test_hybrid_search_rrf(ray_session):
    """RRF fusion sanity on the real sf0.001 tables: 20 rows, ranks are
    a permutation-consistent pairing, the fused score is exactly
    1/(60+r_b) + 1/(60+r_c), and ordering follows (rrf desc, doc_id)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    df = entry_mod.q_hybrid_search("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 20
    assert list(df.columns) == ["doc_id", "rank_bm25", "rank_cos", "rrf"]
    assert df["rank_bm25"].between(1, 50).all()
    assert df["rank_cos"].between(1, 50).all()
    assert not df["doc_id"].duplicated().any()
    want = (1.0 / (60 + df["rank_bm25"]) + 1.0 / (60 + df["rank_cos"])).round(6)
    assert (df["rrf"] == want).all()
    # sorted by fused score with doc_id tiebreak
    key = list(zip(-df["rrf"], df["doc_id"]))
    assert key == sorted(key)


def test_distinctive_terms_ctfidf(ray_session):
    """Hand-checkable c-TF-IDF: a term unique to one group scores
    n*ln(g); a term present in every group scores exactly 0 and falls
    below unique terms; ties break by ascending term."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.search import distinctive_terms

    rows = [
        {"lang": "en", "text": "shared apple apple"},
        {"lang": "en", "text": "shared apple"},
        {"lang": "fr", "text": "shared pomme"},
        {"lang": "de", "text": "shared apfel apfel apfel"},
    ]
    out = (distinctive_terms(
               rd.from_arrow(pa.Table.from_pylist(rows)).repartition(2),
               "lang", "text", k=2)
           .to_pandas().sort_values(["lang", "rank"])
           .reset_index(drop=True))
    ln3 = math.log(3.0)
    # en: apple n=3 unique → 3*ln3; fr: pomme 1*ln3; de: apfel 3*ln3;
    # 'shared' df=3 → score 0, still ranks 2nd (only other term)
    got = {(r.lang, r.term): (r.score, r["rank"])
           for _, r in out.iterrows()}
    assert got[("en", "apple")] == (round(3 * ln3, 6), 1)
    assert got[("fr", "pomme")] == (round(1 * ln3, 6), 1)
    assert got[("de", "apfel")] == (round(3 * ln3, 6), 1)
    for g in ("en", "fr", "de"):
        assert got[(g, "shared")] == (0.0, 2)
    assert len(out) == 6


def test_chi2_terms_hand_checked(ray_session):
    """Hand-computed 2x2 chi-square on a 6-token corpus: A='x x y',
    B='y y z' gives chi2(A,x)=3.0, chi2(B,z)=1.2, chi2(*,y)=2/3; and
    with a single group tg=N makes every denominator 0 → all scores 0."""
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.search import chi2_terms

    rows = [{"g": "A", "text": "x x y"}, {"g": "B", "text": "y y z"}]
    out = (chi2_terms(rd.from_arrow(pa.Table.from_pylist(rows))
                      .repartition(2), "g", "text", k=5)
           .to_pandas())
    got = {(r.g, r.term): (r.score, r["rank"]) for _, r in out.iterrows()}
    assert got[("A", "x")] == (3.0, 1)
    assert got[("A", "y")] == (0.666667, 2)
    assert got[("B", "z")] == (1.2, 1)
    assert got[("B", "y")] == (0.666667, 2)
    assert len(out) == 4

    solo = (chi2_terms(rd.from_arrow(pa.Table.from_pylist(
                [{"g": "A", "text": "x x y"}])), "g", "text", k=5)
            .to_pandas())
    assert (solo["score"] == 0.0).all() and len(solo) == 2


def test_llr_terms_hand_checked(ray_session):
    """Dunning G2 on the same 6-token corpus, checked against the
    textbook per-cell formula computed independently in the test:
    G2(A,x) = 2*(2ln2 + 3ln1.5 - ln2) ≈ 3.819085; all four (group,
    term) cells match; unique terms outrank the shared one."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.search import llr_terms

    rows = [{"g": "A", "text": "x x y"}, {"g": "B", "text": "y y z"}]
    out = (llr_terms(rd.from_arrow(pa.Table.from_pylist(rows))
                     .repartition(2), "g", "text", k=5)
           .to_pandas())
    got = {(r.g, r.term): (r.score, r["rank"]) for _, r in out.iterrows()}

    def g2(a, tw, tg, n=6):
        cells = [(a, tw, tg), (tw - a, tw, n - tg),
                 (tg - a, n - tw, tg), (n - tw - tg + a, n - tw, n - tg)]
        return round(2.0 * sum(o * math.log(o * n / (rt * ct))
                               for o, rt, ct in cells if o > 0), 6)

    assert got[("A", "x")] == (g2(2, 2, 3), 1)
    assert got[("A", "y")] == (g2(1, 3, 3), 2)
    assert got[("B", "z")] == (g2(1, 1, 3), 1)
    assert got[("B", "y")] == (g2(2, 3, 3), 2)
    assert got[("A", "x")][0] > got[("A", "y")][0]
    assert len(out) == 4


def test_bm25_multi_matches_single_query(ray_session):
    """Each query's multi-retrieval top-k equals the standalone
    bm25_topk run (same stats, same chain order), with per-query
    1..k ranks."""
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.search import bm25_multi_topk, bm25_topk

    rows = [{"doc_id": i,
             "text": " ".join(
                 (["vector"] * (i % 3)) + (["data"] * (i % 4))
                 + ["filler"] * (i % 5) + ["query"])}
            for i in range(60)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    multi = (bm25_multi_topk(ds, {"qa": ("vector", "query"),
                                  "qb": ("data",)}, 5)
             .to_pandas().sort_values(["query_id", "rank"])
             .reset_index(drop=True))
    for qid, terms in (("qa", ("vector", "query")), ("qb", ("data",))):
        solo = bm25_topk(ds, terms, 5).to_pandas()
        part = multi[multi.query_id == qid].reset_index(drop=True)
        assert part["doc_id"].tolist() == solo["doc_id"].tolist(), qid
        assert part["score"].tolist() == solo["score"].tolist(), qid
        assert part["rank"].tolist() == [1, 2, 3, 4, 5]
