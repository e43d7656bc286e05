"""Duplicate-window span family (stages/dupspans.py): brute-force
differential on adversarial cases, broadcast ≡ distributed plan
equality (including randomized corpora), and window_fps contracts."""

from __future__ import annotations

import numpy as np
import pytest

from llm_food_ray.functions.hashing import window_fps
from llm_food_ray.stages.dupspans import (
    _merge_islands,
    duplicate_span_strip,
    duplicate_spans,
)

W = 8


def _brute_spans(docs, w=W, mc=2):
    from collections import Counter

    cnt = Counter()
    for _, t in docs:
        ws = t.split()
        for i in range(len(ws) - w + 1):
            cnt[" ".join(ws[i:i + w])] += 1
    dup = {k for k, v in cnt.items() if v >= mc}
    rows = []
    for d, t in docs:
        ws = t.split()
        hits = [i for i in range(len(ws) - w + 1)
                if " ".join(ws[i:i + w]) in dup]
        spans: list[tuple[int, int]] = []
        for i in hits:
            if spans and i <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], i + w - 1))
            else:
                spans.append((i, i + w - 1))
        for no, (s, e) in enumerate(spans, 1):
            rows.append((d, no, s + 1, e + 1, e - s + 1))
    return sorted(rows)


def _brute_strip(docs, w=W, mc=2):
    sp = _brute_spans(docs, w, mc)
    out = []
    for d, t in docs:
        ws = t.split()
        cov: set[int] = set()
        for dd, _no, s, e, _n in sp:
            if dd == d:
                cov.update(range(s - 1, e))
        out.append((d, " ".join(x for i, x in enumerate(ws)
                                if i not in cov), len(cov)))
    return sorted(out)


def _ds(docs):
    import ray.data as rd

    return rd.from_items([{"doc_id": i, "text": t} for i, t in docs])


ADVERSARIAL = [
    (0, "a b c d e f g h i j k l"),                 # head overlap w/ 1
    (1, "x a b c d e f g h i y z"),
    (2, "one two three four five six seven"),        # 7 words: no window
    (3, "p q r s t u v w " * 3),                     # within-doc repeat
    (4, "totally unique words nine ten eleven twelve thirteen fifteen"),
    (5, ""),                                         # empty text
    (6, "a b c d e f g h"),                          # exactly one window
    (7, "a b c d e f g h"),                          # its exact twin
]


@pytest.mark.parametrize("exec_mode", ["broadcast", "distributed"])
def test_spans_match_brute_force(ray_session, exec_mode):
    got = sorted(tuple(r.values()) for r in
                 duplicate_spans(_ds(ADVERSARIAL), exec=exec_mode).take_all())
    assert got == _brute_spans(ADVERSARIAL)


@pytest.mark.parametrize("exec_mode", ["broadcast", "distributed"])
def test_strip_match_brute_force(ray_session, exec_mode):
    got = sorted(tuple(r.values()) for r in
                 duplicate_span_strip(_ds(ADVERSARIAL),
                                      exec=exec_mode).take_all())
    assert got == _brute_strip(ADVERSARIAL)


def test_plans_equal_on_random_corpus(ray_session):
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for d in range(60):
        n = int(rng.randint(0, 40))
        docs.append((d, " ".join(vocab[j] for j in rng.randint(0, 30, n))))
    ds = _ds(docs)
    b = sorted(tuple(r.values()) for r in
               duplicate_spans(ds, exec="broadcast").take_all())
    dist = sorted(tuple(r.values()) for r in
                  duplicate_spans(ds, exec="distributed").take_all())
    assert b == dist == _brute_spans(docs)
    bs = sorted(tuple(r.values()) for r in
                duplicate_span_strip(ds, exec="broadcast").take_all())
    dss = sorted(tuple(r.values()) for r in
                 duplicate_span_strip(ds, exec="distributed").take_all())
    assert bs == dss == _brute_strip(docs)


def test_spans_against_archive(ray_session):
    """Incremental: windows seen ANYWHERE in the archive (even once)
    mark spans in new docs; archive-internal dups alone don't."""
    from llm_food_ray.stages.dupspans import duplicate_spans_against

    archive = [(100, "a b c d e f g h i"),
               (101, "z y x w v u t s r q")]
    new = [(0, "a b c d e f g h unseen tail here"),   # head seen
           (1, "completely fresh words one two three four five six")]
    exp = [(0, 1, 1, 8, 8)]
    for mode in ("broadcast", "distributed", "auto"):
        got = sorted(tuple(r.values()) for r in duplicate_spans_against(
            _ds(new), _ds(archive), exec=mode).take_all())
        assert got == exp, (mode, got)


def test_no_duplicates_yields_empty_and_identity(ray_session):
    docs = [(0, " ".join(f"a{i}" for i in range(20))),
            (1, " ".join(f"b{i}" for i in range(20)))]
    assert duplicate_spans(_ds(docs), exec="broadcast").count() == 0
    assert duplicate_spans(_ds(docs), exec="distributed").count() == 0
    for mode in ("broadcast", "distributed"):
        rows = sorted(tuple(r.values()) for r in
                      duplicate_span_strip(_ds(docs), exec=mode).take_all())
        assert rows == [(d, t, 0) for d, t in docs]


def test_min_count_dial(ray_session):
    docs = [(0, "a b c d e f g h"), (1, "a b c d e f g h"),
            (2, "a b c d e f g h")]
    # min_count=4 > 3 occurrences -> nothing duplicated
    assert duplicate_spans(_ds(docs), min_count=4).count() == 0
    got = duplicate_spans(_ds(docs), min_count=3).take_all()
    assert sorted(tuple(r.values()) for r in got) == [
        (0, 1, 1, 8, 8), (1, 1, 1, 8, 8), (2, 1, 1, 8, 8)]


def test_bad_exec_raises(ray_session):
    with pytest.raises(ValueError):
        duplicate_spans(_ds([(0, "a")]), exec="nope")


def test_batch_windows_equals_reference():
    import pyarrow as pa

    from llm_food_ray.stages.dupspans import _batch_windows

    texts = [t for _, t in ADVERSARIAL] + ["lone", None, "a b  c\td"]
    batch = pa.table({"text": pa.array(texts, pa.string())})
    fps, rows, starts, lens, _, _ = _batch_windows(batch, "text", 4)
    # reassemble per-doc and compare against the per-doc reference fn
    for d, t in enumerate(texts):
        ref = window_fps(t or "", 4)
        mine = fps[rows == d]
        assert mine.tolist() == ref.tolist(), d
        assert starts[rows == d].tolist() == list(range(ref.size))
        assert lens[d] == len((t or "").split())


def test_window_fps_contract():
    assert window_fps("", 8).size == 0
    assert window_fps("a b c", 8).size == 0          # shorter than window
    f = window_fps("a b c d e f g h i", 8)
    assert f.shape == (2,) and f.dtype == np.uint64
    # positional: same window text -> same fp at both positions
    g = window_fps("a b c d e f g h a b c d e f g h", 8)
    assert g[0] == g[8]
    # different windows -> different fps (collision would be 2^-64)
    assert len(set(g[:2].tolist())) == 2


def test_merge_islands_adjacent_and_new_doc():
    ids = np.array([1, 1, 1, 2], dtype=np.int64)
    starts = np.array([0, 8, 10, 0], dtype=np.int64)   # w=8: 0-7, 8-15, 10-17
    gidx, s, e, no = _merge_islands(ids, starts, 8)
    # 0-7 and 8-15 are ADJACENT -> merged; 10-17 overlaps -> merged too;
    # doc 2 restarts its own span and numbering
    assert s.tolist() == [0, 0] and e.tolist() == [17, 7]
    assert no.tolist() == [1, 1]
    # a true gap (word 8 uncovered) stays two spans
    gidx, s, e, no = _merge_islands(
        np.array([1, 1], dtype=np.int64),
        np.array([0, 9], dtype=np.int64), 8)
    assert s.tolist() == [0, 9] and e.tolist() == [7, 16]
    assert no.tolist() == [1, 2]


def test_window_coverage_against_hand_case(ray_session):
    """Positional counting (repeated seen windows count every
    occurrence), unseen docs 0.0, short docs 0 windows, full-copy 1.0."""
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.dupspans import window_coverage_against

    seen = rd.from_arrow(pa.Table.from_pylist([
        {"doc_id": 100, "text": "a b c d e"},      # windows: "a b c","b c d","c d e"
    ]))
    new = rd.from_arrow(pa.Table.from_pylist([
        {"doc_id": 0, "text": "a b c d e"},        # exact copy → 3/3
        {"doc_id": 1, "text": "a b c x b c d"},    # "a b c","b c d" hit → 2/5
        {"doc_id": 2, "text": "z z z z"},          # 0/2
        {"doc_id": 3, "text": "a b"},              # too short → 0 windows
        {"doc_id": 4, "text": "a b c a b c d"},    # windows: abc,bca,cab,abc,bcd → 3/5
    ])).repartition(2)
    out = (window_coverage_against(new, seen, window=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_windows"].tolist() == [3, 5, 2, 0, 5]
    assert out["n_seen"].tolist() == [3, 2, 0, 0, 3]
    assert out["coverage_frac"].tolist() == [1.0, 0.4, 0.0, 0.0, 0.6]


def test_plagiarism_pairs_exact_copies_dominate(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.dupspans import plagiarism_pairs

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    docs = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},                      # exact copy
        {"doc_id": 3, "text": base + " phi chi psi omega extra words "
                                     "here to shift things"},
        {"doc_id": 4, "text": "completely different words nothing in "
                              "common with the others at all ok then"},
    ]
    out = {(r["a"], r["b"]): r["shared"] for r in
           plagiarism_pairs(rd.from_items(docs), min_shared=1,
                            max_df=10).take_all()}
    assert (1, 2) in out                      # exact copy pair
    assert (1, 4) not in out and (2, 4) not in out and (3, 4) not in out
    # the exact pair shares at least as much as the partial pair
    if (1, 3) in out:
        assert out[(1, 2)] >= out[(1, 3)]


def test_plagiarism_pairs_df_cap_kills_boilerplate(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.dupspans import plagiarism_pairs

    boiler = "one two three four five six seven eight"
    docs = [{"doc_id": i, "text": boiler} for i in range(10)]
    # df cap below corpus size -> the ubiquitous fingerprints drop, no
    # pairs survive
    n = plagiarism_pairs(rd.from_items(docs), min_shared=1,
                         max_df=5).count()
    assert n == 0
    # with the cap lifted every pair appears
    n2 = plagiarism_pairs(rd.from_items(docs), min_shared=1,
                          max_df=100).count()
    assert n2 == 45


def test_containment_pairs_directional(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.dupspans import containment_pairs

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    docs = [
        {"doc_id": 1, "text": base},
        # excerpt: first 10 words -> contained in 1, not vice versa
        {"doc_id": 2, "text": " ".join(base.split()[:10])},
        {"doc_id": 3, "text": "unrelated words entirely different "
                              "things nothing shared here at all ok"},
    ]
    out = {(r["a"], r["b"]): r["containment"] for r in
           containment_pairs(rd.from_items(docs), tau=0.5,
                             max_df=10).take_all()}
    assert (2, 1) in out and out[(2, 1)] >= 0.5  # excerpt ⊂ parent
    assert (1, 2) not in out                      # parent ⊄ excerpt
    assert not any(3 in pair for pair in out)


def test_pagination_chains_links_split_parts(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.dupspans import pagination_chains

    part1 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 END a b c d e f g h"
    part2 = "a b c d e f g h MID x1 x2 x3 p q r s t u v w"
    part3 = "p q r s t u v w FIN z1 z2 z3 z4 z5 z6 z7 z8 z9"
    ds = rd.from_items([
        {"doc_id": 1, "text": part1}, {"doc_id": 2, "text": part2},
        {"doc_id": 3, "text": part3},
        {"doc_id": 4, "text": "unrelated words that match nothing else "
                              "in this tiny corpus at all ok then"},
        {"doc_id": 5, "text": "short"},  # < k words: ignored
    ])
    out = sorted((r["a"], r["b"]) for r in
                 pagination_chains(ds, k=8).take_all())
    assert out == [(1, 2), (2, 3)]


def test_pagination_chains_df_cap_kills_boilerplate_boundaries(
        ray_session):
    import ray.data as rd

    from llm_food_ray.stages.dupspans import pagination_chains

    footer = "shared footer words one two three four five"
    docs = [{"doc_id": i,
             "text": f"body{i} filler{i} " + footer} for i in range(10)]
    docs += [{"doc_id": 100 + i, "text": footer + f" opening{i} rest{i}"}
             for i in range(10)]
    # every tail == every head via the boilerplate footer; cap kills it
    n = pagination_chains(rd.from_items(docs), k=8, max_df=5).count()
    assert n == 0


def test_gram_rows_matches_naive():
    import numpy as np
    import pyarrow as pa

    from llm_food_ray.functions.hashing import gram_rows, stable_hash64

    texts = ["a b c a b", "x", "", "p q", None, "a  b"]
    di, fp = gram_rows(pa.array(texts, pa.string()), k=2)
    got = set(zip(di.tolist(), fp.tolist()))
    want = set()
    for i, t in enumerate(texts):
        ws = (t or "").split()
        for j in range(len(ws) - 1):
            want.add((i, stable_hash64(ws[j] + " " + ws[j + 1]) >> 7))
    assert got == want
    # distinctness: doc 0 repeats "a b" twice but emits it once
    assert sorted(di.tolist()).count(0) == 3


def test_ngram_novelty_ownership(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.dupspans import ngram_novelty

    items = [
        {"doc_id": 0, "text": "a b c"},       # owns 'a b', 'b c'
        {"doc_id": 1, "text": "a b c"},       # exact dup → novelty 0
        {"doc_id": 2, "text": "x y z"},       # all novel → 1
        {"doc_id": 3, "text": "b c x y"},     # owns 'c x'; 'b c','x y' taken
        {"doc_id": 4, "text": "solo"},        # < 2 tokens → absent
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(items)).repartition(3)
    got = (ngram_novelty(ds, "doc_id", "text", k=2)
           .to_pandas().set_index("doc_id").sort_index())
    assert got.index.tolist() == [0, 1, 2, 3]
    assert got.loc[0, "novelty"] == 1.0
    assert got.loc[1, "novelty"] == 0.0
    assert got.loc[2, "novelty"] == 1.0
    assert got.loc[3, "n_grams"] == 3 and got.loc[3, "n_novel"] == 1
    assert abs(got.loc[3, "novelty"] - 0.333333) < 1e-9
