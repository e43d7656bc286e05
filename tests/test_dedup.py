"""Dedup stage tests: exact, minhash+LSH (vs brute-force Jaccard oracle),
simhash, embedding near-dup, union-find clustering."""

from __future__ import annotations

import numpy as np
import pytest

from llm_food_ray.functions.hashing import (
    MinHasher,
    hamming64,
    jaccard,
    shingle_hashes,
    simhash64,
)
from llm_food_ray.stages.dedup import (
    clusters_from_pairs,
    dedup_exact,
    drop_set_from_pairs,
    embedding_candidate_pairs,
    minhash_candidate_pairs,
    simhash_candidate_pairs,
)


def _docs():
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest where tall trees grow").split()
    docs = []
    for i in range(20):
        words = [f"doc{i}w{j}" for j in range(30)]
        docs.append({"doc_id": i, "text": " ".join(words)})
    # near-dup family: 20/21/22 share almost all shingles
    docs.append({"doc_id": 20, "text": " ".join(base)})
    near = list(base)
    near[5] = "leaps"
    docs.append({"doc_id": 21, "text": " ".join(near)})
    docs.append({"doc_id": 22, "text": " ".join(base)})       # exact dup of 20
    # exact dup of 5
    docs.append({"doc_id": 23, "text": docs[5]["text"]})
    return docs


def test_minhash_estimator_accuracy():
    h = MinHasher(256)
    a = shingle_hashes("a b c d e f g h i j k l m n o p", 3)
    b = shingle_hashes("a b c d e f g h i j k l m n o X", 3)
    true_j = jaccard(a, b)
    est = float((h.signature(a) == h.signature(b)).mean())
    assert abs(est - true_j) < 0.15
    assert jaccard(a, a) == 1.0


def test_simhash_properties():
    s1 = simhash64("the quick brown fox jumps over the lazy dog")
    s2 = simhash64("the quick brown fox jumps over the lazy cat")
    s3 = simhash64("completely different words entirely unrelated content")
    assert hamming64(s1, s1) == 0
    assert hamming64(s1, s2) < hamming64(s1, s3)


def test_union_find_clusters():
    pairs = [(1, 2), (2, 3), (10, 11)]
    roots = clusters_from_pairs(pairs)
    assert roots[1] == roots[2] == roots[3] == 1
    assert roots[10] == roots[11] == 10
    assert drop_set_from_pairs(pairs) == {2, 3, 11}


def test_dedup_exact_ray(ray_session):
    from helpers import dataset_from_items

    ds = dataset_from_items(_docs())
    kept = dedup_exact(ds, "doc_id", "text").to_pandas()
    kept_ids = set(kept["doc_id"])
    # 22 dups 20, 23 dups 5 → dropped; 21 is near-dup (kept by exact)
    assert 20 in kept_ids and 22 not in kept_ids
    assert 5 in kept_ids and 23 not in kept_ids
    assert 21 in kept_ids
    assert len(kept_ids) == 22


@pytest.mark.parametrize("verify", ["exact", "estimate"])
def test_minhash_pairs_vs_bruteforce(ray_session, verify):
    from helpers import dataset_from_items

    docs = _docs()
    threshold = 0.7
    ds = dataset_from_items(docs)
    pairs = minhash_candidate_pairs(
        ds, "doc_id", "text", threshold=threshold, verify=verify,
        num_perm=128, num_bands=32,   # 32 bands of 4 rows → recalls j>=0.7 reliably
    ).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    # brute-force oracle on exact jaccard
    sh = {d["doc_id"]: shingle_hashes(d["text"], 3) for d in docs}
    expect = set()
    ids = sorted(sh)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if jaccard(sh[ids[i]], sh[ids[j]]) >= threshold:
                expect.add((ids[i], ids[j]))
    assert expect, "fixture must contain true near-dups"
    if verify == "exact":
        assert got == expect
    else:
        # estimator: full recall of exact dups, no wildly-false positives
        assert expect <= got | expect
        assert (20, 22) in got
        for a, b in got:
            assert jaccard(sh[a], sh[b]) >= 0.4


def test_simhash_pairs_ray(ray_session):
    from helpers import dataset_from_items

    docs = _docs()
    pairs = simhash_candidate_pairs(
        dataset_from_items(docs), "doc_id", "text", max_hamming=3
    ).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    assert (20, 22) in got          # identical text → hamming 0
    assert (5, 23) in got
    # unrelated random docs must not pair up
    for a, b in got:
        assert {a, b} <= {20, 21, 22} or {a, b} == {5, 23}


def test_embedding_pairs_ray(ray_session):
    from helpers import dataset_from_items

    rng = np.random.RandomState(7)
    rows = []
    for i in range(30):
        v = rng.standard_normal(16)
        rows.append({"vec_id": i, "embedding": v.tolist()})
    # 30/31 near-identical to 0
    base = np.asarray(rows[0]["embedding"])
    rows.append({"vec_id": 30, "embedding": (base + 0.01).tolist()})
    rows.append({"vec_id": 31, "embedding": base.tolist()})
    pairs = embedding_candidate_pairs(
        dataset_from_items(rows), "vec_id", "embedding", threshold=0.99
    ).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 30) in got and (0, 31) in got and (30, 31) in got
    for a, b in got:
        assert {a, b} <= {0, 30, 31}


@pytest.mark.parametrize("verify", ["exact", "estimate"])
def test_minhash_verify_paths_identical(ray_session, verify):
    """All phase-2 plans (broadcast index, bucketed semi-join, driver)
    must produce byte-identical pairs — on integer AND string keys (the
    fp→key restore takes a different path for each)."""
    from helpers import dataset_from_items

    docs = _docs()
    str_docs = [{"doc_id": f"http://host/{d['doc_id']}.html",
                 "text": d["text"]} for d in docs]

    def run(items, mode):
        p = minhash_candidate_pairs(
            dataset_from_items(items), "doc_id", "text", threshold=0.7,
            verify=verify, num_perm=128, num_bands=32, verify_exec=mode,
        ).to_pandas()
        return (p.sort_values(["a", "b"]).reset_index(drop=True)
                 .round({"sim": 12}))

    for items in (docs, str_docs):
        drv = run(items, "driver")
        assert len(drv), "fixture must confirm near-dup pairs"
        assert run(items, "broadcast").equals(drv)
        assert run(items, "semijoin").equals(drv)


def test_minhash_star_collapse_paths_identical(ray_session):
    """pair_mode='star' + verify='estimate' activates identical-signature
    collapse; broadcast (local collapse) and semijoin (distributed class
    exchange) must emit the same spanning edge set, and its connected
    components must equal the all-mode components."""
    from helpers import dataset_from_items

    docs = _docs()
    # extra exact-dup family to make a 3-member class (rep + 2 members)
    docs.append({"doc_id": 24, "text": docs[20]["text"]})

    def run(mode):
        p = minhash_candidate_pairs(
            dataset_from_items(docs), "doc_id", "text", threshold=0.7,
            verify="estimate", num_perm=128, num_bands=32,
            pair_mode="star", verify_exec=mode,
        ).to_pandas()
        return (p.sort_values(["a", "b"]).reset_index(drop=True)
                 .round({"sim": 12}))

    bc = run("broadcast")
    assert len(bc)
    assert run("semijoin").equals(bc)
    # connectivity must match the all-mode pair graph
    full = minhash_candidate_pairs(
        dataset_from_items(docs), "doc_id", "text", threshold=0.7,
        verify="estimate", num_perm=128, num_bands=32, pair_mode="all",
        verify_exec="broadcast").to_pandas()

    def components(pairs):
        roots = clusters_from_pairs(list(zip(pairs["a"], pairs["b"])))
        comp = {}
        for n, r in roots.items():
            comp.setdefault(r, set()).add(n)
        return {frozenset(v) for v in comp.values()}

    assert components(bc) == components(full)


def test_min_label_clusters_match_union_find(ray_session):
    """Distributed min-label propagation == driver union-find, including
    a chain component (diameter > 2, exercises multiple rounds)."""
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.dedup import (
        clusters_min_label, dedup_near_keep, drop_nodes_min_label)

    # chain 7-5-3-9-2 (min 2 at the far end), pair (10,11), singleton-free
    pairs = [(7, 5), (5, 3), (3, 9), (9, 2), (10, 11)]
    pairs_ds = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64()),
    }))
    labels = clusters_min_label(pairs_ds, num_partitions=4).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    roots = clusters_from_pairs(pairs)
    assert got == roots
    assert all(got[n] == 2 for n in (7, 5, 3, 9, 2))
    drop = set(drop_nodes_min_label(
        clusters_min_label(pairs_ds, num_partitions=4)).to_pandas()["node"])
    assert drop == drop_set_from_pairs(pairs) == {7, 5, 3, 9, 11}

    # end-to-end kept-set: anti-join drops exactly the non-roots
    corpus = rd.from_arrow(pa.table({"doc_id": pa.array(range(15), pa.int64())}))
    kept = dedup_near_keep(corpus, "doc_id", pairs_ds, num_partitions=4)
    assert set(kept.to_pandas()["doc_id"]) == set(range(15)) - drop


def test_dedup_exact_shuffle_mode_matches_driver(ray_session):
    """reduce='shuffle' (bucket groupby path) must keep the same rows as
    the default driver merge."""
    from llm_food_ray.stages.dedup import dedup_exact
    from tests.helpers import dataset_from_items

    rows = [{"doc_id": i, "text": f"content {i % 7}"} for i in range(50)]
    a = sorted(dedup_exact(dataset_from_items(rows), "doc_id", "text",
                           reduce="driver").to_pandas()["doc_id"])
    b = sorted(dedup_exact(dataset_from_items(rows), "doc_id", "text",
                           reduce="shuffle").to_pandas()["doc_id"])
    assert a == b == list(range(7))


def test_dedup_paragraph_global(ray_session):
    """Boilerplate paragraphs (> max_occurrences docs) drop; unique and
    low-frequency paragraphs survive in original order."""
    from helpers import dataset_from_items

    from llm_food_ray.stages.dedup import dedup_paragraph_global

    boiler = "All rights reserved."
    rows = [{"doc_id": i, "text": f"unique {i}\n\n{boiler}\n\ntail {i % 2}"}
            for i in range(6)]
    rows.append({"doc_id": 6, "text": boiler})           # becomes empty
    out = (dedup_paragraph_global(dataset_from_items(rows), max_occurrences=2)
           .to_pandas().set_index("doc_id")["clean"])
    # boiler occurs 7x (>2) -> dropped; "tail 0"/"tail 1" occur 3x -> dropped
    assert out[0] == "unique 0"
    assert out[5] == "unique 5"
    assert out[6] == ""

    # with a higher threshold the tails survive
    out2 = (dedup_paragraph_global(dataset_from_items(rows), max_occurrences=3)
            .to_pandas().set_index("doc_id")["clean"])
    assert out2[0] == "unique 0\n\ntail 0"


def test_near_dup_empty_inputs(ray_session):
    """Empty corpora flow through every near-dup family without error."""
    import pyarrow as pa
    import ray.data as rd

    empty_docs = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                         "text": pa.array([], pa.string())}))
    assert minhash_candidate_pairs(empty_docs, "doc_id", "text").count() == 0
    assert simhash_candidate_pairs(empty_docs, "doc_id", "text").count() == 0
    empty_vecs = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64()))}))
    assert embedding_candidate_pairs(empty_vecs, "vec_id",
                                     "embedding").count() == 0


@pytest.mark.parametrize("seed", [3, 11])
def test_minhash_paths_random_corpus(ray_session, seed):
    """Randomized differential check: on corpora with mixed exact dups,
    near-dups and unique docs, all verify plans agree pairwise AND both
    kept-set plans agree — for both pair modes."""
    import random

    from helpers import dataset_from_items

    from llm_food_ray.stages.dedup import dedup_near_keep

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(300)]
    docs = []
    base_texts = []
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randint(10, 40))]
        base_texts.append(" ".join(words))
        docs.append({"doc_id": i, "text": base_texts[-1]})
    nid = 100
    for i in range(0, 40, 5):            # exact dups
        docs.append({"doc_id": nid, "text": base_texts[i]})
        nid += 1
    for i in range(1, 40, 7):            # near dups (one word changed)
        w = base_texts[i].split()
        w[rng.randrange(len(w))] = "zzz"
        docs.append({"doc_id": nid, "text": " ".join(w)})
        nid += 1

    for pair_mode in ("all", "star"):
        outs = {}
        for mode in ("broadcast", "semijoin", "driver"):
            p = minhash_candidate_pairs(
                dataset_from_items(docs), "doc_id", "text", threshold=0.6,
                verify="estimate", num_perm=128, num_bands=32,
                pair_mode=pair_mode, verify_exec=mode,
            ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
            outs[mode] = p.round({"sim": 12})
        assert outs["broadcast"].equals(outs["driver"]), pair_mode
        assert outs["semijoin"].equals(outs["driver"]), pair_mode
        assert len(outs["driver"]) >= 8, "fixture must produce pairs"

    # kept-set: local union-find vs distributed min-label propagation
    pairs = minhash_candidate_pairs(
        dataset_from_items(docs), "doc_id", "text", threshold=0.6,
        verify="estimate", num_perm=128, num_bands=32, pair_mode="star",
    ).materialize()
    corpus = dataset_from_items(docs).select_columns(["doc_id"])
    kept_local = sorted(dedup_near_keep(
        corpus, "doc_id", pairs, cluster_exec="local").to_pandas()["doc_id"])
    kept_dist = sorted(dedup_near_keep(
        corpus, "doc_id", pairs, cluster_exec="distributed")
        .to_pandas()["doc_id"])
    assert kept_local == kept_dist
    assert len(kept_local) < len(docs)


def test_drop_array_columnar_matches_tuple_union_find():
    """The Arrow/numpy local clustering (r3: no Python tuples) must agree
    with the tuple union-find on chains, stars, and string keys."""
    import random

    import pyarrow as pa

    from llm_food_ray.stages.dedup import (
        _drop_array_from_pair_batches, drop_set_from_pairs)

    rng = random.Random(7)
    cases = [
        [(1, 2), (2, 3), (10, 11)],                       # chain + pair
        [(5, 1), (5, 9), (5, 3)],                         # star, root not min
        [("u9", "u2"), ("u2", "u0"), ("u7", "u7x")],      # string keys
        [],                                               # nothing
    ]
    # randomized: 200 edges over 80 nodes
    nodes = list(range(80))
    cases.append([(rng.choice(nodes), rng.choice(nodes)) for _ in range(200)])
    for pairs in cases:
        pairs = [(a, b) for a, b in pairs if a != b]
        want = drop_set_from_pairs(pairs)
        if pairs:
            t = pa.table({"a": [a for a, _ in pairs],
                          "b": [b for _, b in pairs]})
            batches = [t.slice(0, len(t) // 2), t.slice(len(t) // 2)]
        else:
            batches = []
        got = _drop_array_from_pair_batches(batches)
        got_set = set(got.to_pylist()) if got is not None else set()
        assert got_set == want, pairs
        if got is not None:
            assert got.to_pylist() == sorted(got.to_pylist())


def test_dedup_exact_auto_gate_both_sides(ray_session):
    """reduce='auto' (r3) picks driver under the budget and shuffle over
    it; both give the byte-equal kept set."""
    from helpers import dataset_from_items

    from llm_food_ray.stages.dedup import dedup_exact

    rows = [{"doc_id": i, "text": f"t{i % 13}"} for i in range(120)]
    want = sorted(dedup_exact(dataset_from_items(rows), "doc_id", "text",
                              reduce="driver").to_pandas()["doc_id"])
    auto_small = sorted(dedup_exact(
        dataset_from_items(rows), "doc_id", "text",
        reduce="auto").to_pandas()["doc_id"])          # fits → driver path
    auto_forced = sorted(dedup_exact(
        dataset_from_items(rows), "doc_id", "text", reduce="auto",
        local_budget_rows=5).to_pandas()["doc_id"])    # over → shuffle path
    assert auto_small == want == auto_forced
    assert want == sorted(set(i for i in range(13)))


def test_collapse_rep_select_broadcast_equals_semijoin(ray_session):
    """r3 collapse: representative-signature selection must give the
    same (stars, reps) through the broadcast fp-filter and the
    LEFT SEMI fp-join fallback (budget forced to 0)."""
    from helpers import dataset_from_items

    import pyarrow as pa

    from llm_food_ray.stages.dedup import (
        MinHashSignatures, _collapse_classes_semijoin)

    docs = _docs()
    docs.append({"doc_id": 24, "text": docs[20]["text"]})
    docs.append({"doc_id": 25, "text": docs[20]["text"]})
    sig = MinHashSignatures("doc_id", "text", 128, 3)
    sig_ds = (dataset_from_items(docs)
              .map_batches(sig, batch_format="pyarrow").materialize())

    def norm(stars, reps):
        s = stars.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        r = (reps.to_pandas().sort_values("doc_id").reset_index(drop=True)
             .drop(columns=["minhash_sig"]))
        return s, r

    s1, r1 = norm(*_collapse_classes_semijoin(sig_ds, "doc_id", pa.int64(),
                                              128))
    s2, r2 = norm(*_collapse_classes_semijoin(sig_ds, "doc_id", pa.int64(),
                                              128, broadcast_budget_bytes=0))
    assert s1.equals(s2) and r1.equals(r2)
    assert len(s1) >= 2                       # the 3-member exact class


def test_cluster_labels_plans_match(ray_session):
    """near_dup_cluster_labels: local broadcast fill == distributed
    LEFT OUTER label join, singletons label themselves."""
    from helpers import dataset_from_items

    from llm_food_ray.stages.dedup import near_dup_cluster_labels

    docs = _docs()
    docs.append({"doc_id": 24, "text": docs[20]["text"]})
    pairs = minhash_candidate_pairs(
        dataset_from_items(docs), "doc_id", "text", threshold=0.7,
        verify="estimate", num_perm=128, num_bands=32).materialize()
    corpus = dataset_from_items(docs).select_columns(["doc_id"])
    a = (near_dup_cluster_labels(corpus, "doc_id", pairs,
                                 label_exec="local")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (near_dup_cluster_labels(corpus, "doc_id", pairs,
                                 label_exec="distributed")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
    assert (a["cluster"] <= a["doc_id"]).all()      # min-key roots
    assert (a["cluster"] < a["doc_id"]).any()       # some clustering
    assert len(a) == len(docs)                      # every doc labeled


def test_dedup_against_plans_byte_equal_and_drop(ray_session):
    """Incremental dedup drops exactly the rows whose text the seen
    corpus already contains; broadcast and anti-join plans byte-equal."""
    import ray.data as rd

    from llm_food_ray.stages.dedup import dedup_against

    new = rd.from_items([
        {"doc_id": 1, "text": "alpha beta"},
        {"doc_id": 2, "text": "gamma delta"},
        {"doc_id": 3, "text": "epsilon"},
        {"doc_id": 4, "text": "alpha beta"},   # dup of a seen text
    ])
    seen = rd.from_items([{"text": "alpha beta"}, {"text": "zeta"}])

    def run(exec):
        return (dedup_against(new, seen, text_column="text", exec=exec)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    a = run("broadcast")
    b = run("anti")
    c = run("auto")
    d = run("bloom")
    assert list(a["doc_id"]) == [2, 3]
    assert a.equals(b) and a.equals(c) and a.equals(d)


def test_dedup_against_bloom_randomized(ray_session):
    """Randomized differential: the bloom plan equals the broadcast plan
    on a corpus big enough that Bloom false positives are near-certain
    to occur (and must be cleared by the exact join)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from llm_food_ray.stages.dedup import (
        _bloom_might_contain, _bloom_set, dedup_against)

    rng = np.random.default_rng(5)
    seen_texts = [f"seen document {i}" for i in range(4000)]
    dup_idx = rng.integers(0, 4000, 300)
    new_df = pd.DataFrame({
        "doc_id": np.arange(6000, dtype=np.int64),
        "text": [f"new document {i}" for i in range(5700)]
                + [seen_texts[j] for j in dup_idx],
    })
    new = rd.from_pandas(new_df)
    seen = rd.from_pandas(pd.DataFrame({"text": seen_texts}))

    a = (dedup_against(new, seen, text_column="text", exec="broadcast")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (dedup_against(new, seen, text_column="text", exec="bloom")
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(a) == 5700
    assert a.equals(b)

    # unit sanity on the primitive: inserted keys always hit, and the
    # false-positive rate on fresh keys is near the designed ~1%
    m = 4000 * 10
    bits = np.zeros((m + 7) // 8, np.uint8)
    keys = rng.integers(0, 2**63, 4000).astype(np.uint64)
    _bloom_set(bits, keys, m, 7)
    assert _bloom_might_contain(bits, keys, m, 7).all()
    fresh = rng.integers(0, 2**63, 20000).astype(np.uint64)
    fp = _bloom_might_contain(bits, fresh, m, 7).mean()
    assert fp < 0.05


def test_dedup_against_empty_seen_is_identity(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.dedup import dedup_against

    new = rd.from_items([{"doc_id": 1, "text": "x"}])
    seen = rd.from_items([{"text": "x"}]).filter(lambda r: False)
    out = dedup_against(new, seen, text_column="text").to_pandas()
    assert list(out["doc_id"]) == [1]


def test_clusters_min_label_contract_plans_equal(ray_session):
    """Pre-contraction preserves components and labels exactly (same
    min-original-key labels as the uncontracted propagation), while
    cutting the round count on a chain graph."""
    import ray.data as rd

    import llm_food_ray.stages.dedup as dd

    # a 12-node chain (worst-case diameter) + a star + a singleton pair
    pairs = ([{"a": i, "b": i + 1} for i in range(11)]
             + [{"a": 100, "b": x} for x in (101, 102, 103)]
             + [{"a": 200, "b": 201}])
    ds = rd.from_items(pairs).repartition(3)

    def run(contract):
        out = (dd.clusters_min_label(ds, contract=contract)
               .to_pandas().sort_values("node").reset_index(drop=True))
        return out, dd.LAST_PROPAGATION_ROUNDS

    a, rounds_on = run(True)
    b, rounds_off = run(False)
    c, rounds_bucketed = run("bucketed")
    assert a.equals(b)
    assert a.equals(c)
    assert (a[a["node"] <= 11]["label"] == 0).all()
    assert (a[(a["node"] >= 100) & (a["node"] <= 103)]["label"] == 100).all()
    assert rounds_on <= rounds_off
    assert rounds_bucketed <= rounds_off


def test_crawl_diff_classifies_churn(ray_session):
    """added / removed / changed are labeled; unchanged urls never
    appear in the output."""
    import ray.data as rd

    from llm_food_ray.stages.dedup import crawl_diff

    old = rd.from_items([
        {"url": "a", "h": "h1"},   # unchanged
        {"url": "b", "h": "h2"},   # changed
        {"url": "c", "h": "h3"},   # removed
    ])
    new = rd.from_items([
        {"url": "a", "h": "h1"},
        {"url": "b", "h": "h2x"},
        {"url": "d", "h": "h4"},   # added
    ])
    out = (crawl_diff(old, new, "url", "h").to_pandas()
           .sort_values("url").reset_index(drop=True))
    assert list(out["url"]) == ["b", "c", "d"]
    assert list(out["change"]) == ["changed", "removed", "added"]


def test_crawl_diff_identical_snapshots_empty(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.dedup import crawl_diff

    snap = rd.from_items([{"url": "a", "h": "h1"}, {"url": "b", "h": "h2"}])
    out = crawl_diff(snap, snap, "url", "h")
    assert out.count() == 0
    assert set(out.schema().names) == {"url", "change"}


def test_dedup_near_keep_best_policy_and_plans_equal(ray_session):
    """Keeps the max-order member per cluster (tie -> min key), keeps
    singletons untouched, and the local and distributed plans agree
    byte-for-byte."""
    import ray.data as rd

    from llm_food_ray.stages.dedup import dedup_near_keep_best

    # cluster {1,2,3}: 3 has the best score -> keep 3
    # cluster {10,11}: tied scores -> keep min key 10
    # 99: singleton, kept
    docs = rd.from_items([
        {"doc_id": 1, "score": 5},
        {"doc_id": 2, "score": 7},
        {"doc_id": 3, "score": 9},
        {"doc_id": 10, "score": 4},
        {"doc_id": 11, "score": 4},
        {"doc_id": 99, "score": 1},
    ])
    pairs = rd.from_items([
        {"a": 1, "b": 2}, {"a": 2, "b": 3}, {"a": 10, "b": 11},
    ])

    def run(exec_):
        return (dedup_near_keep_best(docs, "doc_id", pairs, "score",
                                     keep_exec=exec_)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    local = run("local")
    dist = run("distributed")
    assert local.equals(dist)
    assert list(local["doc_id"]) == [3, 10, 99]


def test_dedup_near_keep_best_ascending(ray_session):
    """descending=False keeps the MIN-order member per cluster."""
    import ray.data as rd

    from llm_food_ray.stages.dedup import dedup_near_keep_best

    docs = rd.from_items([
        {"doc_id": 1, "score": 5.0},
        {"doc_id": 2, "score": 3.0},
    ])
    pairs = rd.from_items([{"a": 1, "b": 2}])
    out = dedup_near_keep_best(docs, "doc_id", pairs, "score",
                               descending=False,
                               keep_exec="distributed").to_pandas()
    assert list(out["doc_id"]) == [2]


def test_clusters_min_label_isolated_pair(ray_session):
    """Regression: a component whose seeds have NO multiplicity (one
    isolated pair) must still merge — the fused propagation folds no
    contributions in round 1, so the convergence break must not arm
    before round 2."""
    import ray.data as rd

    from llm_food_ray.stages.dedup import clusters_min_label

    for contract in (False, True):
        out = (clusters_min_label(rd.from_items([{"a": 1, "b": 2}]),
                                  contract=contract)
               .to_pandas().sort_values("node").reset_index(drop=True))
        assert list(out["node"]) == [1, 2]
        assert list(out["label"]) == [1, 1]


def test_dedup_near_against_component_semantics(ray_session):
    """New docs whose near-dup COMPONENT touches the seen corpus are
    dropped (even without a direct pair to a seen doc); unrelated new
    docs survive."""
    import ray.data as rd

    from llm_food_ray.stages.dedup import dedup_near_against

    base = " ".join(f"w{i}" for i in range(50))
    new = rd.from_items([
        {"doc_id": 1, "text": base},                 # near-dups seen 100
        {"doc_id": 2, "text": base + " extra"},      # near-dups 1 -> chain
        {"doc_id": 3, "text": " ".join(f"z{i}" for i in range(50))},
    ])
    seen = rd.from_items([{"doc_id": 100, "text": base + " archived"}])
    out = (dedup_near_against(new, seen, "doc_id", "text", threshold=0.9)
           .to_pandas().sort_values("doc_id"))
    assert list(out["doc_id"]) == [3]


def test_dedup_near_against_no_overlap_is_identity(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.dedup import dedup_near_against

    new = rd.from_items([
        {"doc_id": 1, "text": " ".join(f"a{i}" for i in range(30))}])
    seen = rd.from_items([
        {"doc_id": 9, "text": " ".join(f"b{i}" for i in range(30))}])
    out = dedup_near_against(new, seen, "doc_id", "text").to_pandas()
    assert list(out["doc_id"]) == [1]


def test_clusters_min_label_random_graphs_match_union_find(ray_session):
    """Seeded random graphs (including isolated pairs, chains, stars,
    singletons-by-absence) — the distributed propagation must equal the
    driver union-find's min-root labels on every component, for both
    contraction plans."""
    import numpy as np
    import ray.data as rd

    from llm_food_ray.stages.dedup import (clusters_from_pairs,
                                           clusters_min_label)

    rng = np.random.RandomState(1234)
    for trial in range(3):
        n_nodes = 120
        n_edges = [15, 60, 200][trial]   # sparse -> isolated pairs; dense
        a = rng.randint(0, n_nodes, n_edges)
        b = rng.randint(0, n_nodes, n_edges)
        mask = a != b
        pairs = [{"a": int(x), "b": int(y)}
                 for x, y in zip(a[mask], b[mask])]
        expect = clusters_from_pairs([(p["a"], p["b"]) for p in pairs])
        ds = rd.from_items(pairs).repartition(5)
        for contract in (True, False, "bucketed"):
            got = dict(zip(*[
                clusters_min_label(ds, contract=contract)
                .to_pandas()[c] for c in ("node", "label")]))
            assert got == expect, f"trial={trial} contract={contract}"


def test_dedup_near_keep_best_string_keys(ray_session):
    """String (url-like) keys through both plans: the fp->key restore,
    tie packing, and anti-join all take different code paths than ints."""
    import ray.data as rd

    from llm_food_ray.stages.dedup import dedup_near_keep_best

    docs = rd.from_items([
        {"url": "http://a/1", "q": 2.0},
        {"url": "http://a/2", "q": 8.0},
        {"url": "http://b/1", "q": 5.0},
    ])
    pairs = rd.from_items([{"a": "http://a/1", "b": "http://a/2"}])
    for exec_ in ("local", "distributed"):
        out = (dedup_near_keep_best(docs, "url", pairs, "q",
                                    keep_exec=exec_)
               .to_pandas().sort_values("url"))
        assert list(out["url"]) == ["http://a/2", "http://b/1"], exec_


def test_dedup_near_keep_best_plans_equal_randomized(ray_session):
    """Seeded random cluster structures with tied scores: local and
    distributed keep-best plans must agree row-for-row."""
    import numpy as np
    import ray.data as rd

    from llm_food_ray.stages.dedup import dedup_near_keep_best

    rng = np.random.RandomState(77)
    docs, pairs = [], []
    nid = 0
    for c in range(12):
        size = int(rng.randint(1, 6))
        members = list(range(nid, nid + size))
        nid += size
        for m in members:
            docs.append({"doc_id": m,
                         "score": int(rng.randint(0, 4))})  # many ties
        root = members[0]
        for m in members[1:]:
            pairs.append({"a": root, "b": m})
    docs_ds = rd.from_items(docs).repartition(4)
    pairs_ds = rd.from_items(pairs).repartition(3)

    def run(exec_):
        return (dedup_near_keep_best(docs_ds, "doc_id", pairs_ds, "score",
                                     keep_exec=exec_)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    local, dist = run("local"), run("distributed")
    assert local.equals(dist)
    assert len(local) == 12   # exactly one survivor per cluster


def test_strip_host_boilerplate_plans_byte_equal(ray_session):
    """Per-host frequent-line strip: the shared nav/footer chrome is
    removed, unique content survives verbatim, a fully-templated page
    becomes "", and broadcast / anti / auto plans are byte-equal —
    including a host below min_docs whose chrome must be KEPT."""
    from llm_food_ray.stages.dedup import strip_host_boilerplate

    from helpers import dataset_from_items

    rows = []
    for d in range(12):                      # big host: chrome strips
        h = "big.example.com"
        rows.append({"doc_id": d, "host": h,
                     "text": f"nav {h}\ncontent {d} alpha\n"
                             f"content {d} beta\n(c) {h}"})
    for d in range(12, 15):                  # small host (3 < min_docs)
        h = "small.example.net"
        rows.append({"doc_id": d, "host": h,
                     "text": f"nav {h}\ncontent {d}\n(c) {h}"})
    rows.append({"doc_id": 20, "host": "big.example.com",
                 "text": "nav big.example.com\n(c) big.example.com"})
    rows.append({"doc_id": 21, "host": "big.example.com", "text": ""})
    ds = dataset_from_items(rows)

    def run(exec):
        return (strip_host_boilerplate(ds, "host", "doc_id", "text",
                                       min_docs=4, exec=exec)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    a, b, c = run("broadcast"), run("anti"), run("auto")
    assert a.equals(b) and a.equals(c)
    assert len(a) == len(rows)
    by = dict(zip(a["doc_id"], a["clean"]))
    assert by[0] == "content 0 alpha\ncontent 0 beta"  # chrome stripped
    assert by[20] == ""                                # fully templated
    assert by[21] == ""                                # empty input
    assert by[12] == ("nav small.example.net\ncontent 12\n"
                      "(c) small.example.net")         # under threshold


def test_leakage_safe_split_components_stay_together(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.dedup import leakage_safe_split

    docs = rd.from_items([{"doc_id": i} for i in range(200)])
    # components: {0..4}, {10,11}, {42,43,44}; everything else singleton
    pairs = rd.from_items([
        {"a": 0, "b": 1}, {"a": 1, "b": 2}, {"a": 2, "b": 3},
        {"a": 3, "b": 4}, {"a": 10, "b": 11}, {"a": 42, "b": 43},
        {"a": 43, "b": 44},
    ])
    out = {r["doc_id"]: (r["cluster"], r["split"])
           for r in leakage_safe_split(docs, "doc_id", pairs).take_all()}
    assert len(out) == 200
    for comp in ([0, 1, 2, 3, 4], [10, 11], [42, 43, 44]):
        labels = {out[d][0] for d in comp}
        splits = {out[d][1] for d in comp}
        assert labels == {comp[0]} and len(splits) == 1
    # split of a component == hash_split's rule on the cluster id
    from llm_food_ray.functions.hashing import md5_hex

    for d, (c, s) in out.items():
        b = int(md5_hex(str(c))[:8], 16) % 100
        want = "test" if b < 10 else "valid" if b < 20 else "train"
        assert s == want
    assert {s for _, s in out.values()} == {"train", "valid", "test"}


def test_collapse_repeated_lines_uniq_semantics(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.dedup import collapse_repeated_lines

    ds = rd.from_items([
        {"doc_id": 1, "text": "a\na\nb\na\na\na\nc"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "x"},
        {"doc_id": 4, "text": "\n\n\nq\n\n"},
        {"doc_id": 5, "text": None},
    ])
    got = {r["doc_id"]: (r["cleaned"], r["n_removed"])
           for r in collapse_repeated_lines(ds).take_all()}
    assert got[1] == ("a\nb\na\nc", 3)
    assert got[2] == ("", 0)
    assert got[3] == ("x", 0)
    assert got[4] == ("\nq\n", 3)  # empty lines collapse like any line
    assert got[5] == ("", 0)


def test_collapse_repeated_lines_matches_python_uniq(ray_session):
    import itertools
    import random

    import ray.data as rd

    from llm_food_ray.stages.dedup import collapse_repeated_lines

    rng = random.Random(13)
    docs = []
    for i in range(60):
        lines = [rng.choice(["x", "y", "zz", ""])
                 for _ in range(rng.randint(0, 12))]
        docs.append({"doc_id": i, "text": "\n".join(lines)})
    got = {r["doc_id"]: (r["cleaned"], r["n_removed"])
           for r in collapse_repeated_lines(
               rd.from_items(docs)).take_all()}
    for d in docs:
        lines = d["text"].split("\n")
        kept = [k for k, _ in itertools.groupby(lines)]
        assert got[d["doc_id"]] == ("\n".join(kept),
                                    len(lines) - len(kept)), d


def test_dedup_canonical_catches_disguised_copies(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.dedup import dedup_canonical

    docs = [
        {"doc_id": 1, "text": "Hello World 123 end"},
        {"doc_id": 2, "text": "  hello   WORLD 9 END  "},  # canonical dup
        {"doc_id": 3, "text": "hello world 123 end!"},     # differs (!)
        {"doc_id": 4, "text": "totally different"},
    ]
    kept = sorted(r["doc_id"] for r in
                  dedup_canonical(rd.from_items(docs)).take_all())
    assert kept == [1, 3, 4]


def test_dup_rate_by_group(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.dedup import dup_rate_by_group

    rows = [
        {"g": "a", "text": "x"}, {"g": "a", "text": "y"},
        {"g": "b", "text": "x"},          # cross-group dup of a's "x"
        {"g": "b", "text": "z"}, {"g": "b", "text": "z"},  # in-group
        {"g": "c", "text": "unique"},
    ]
    out = (dup_rate_by_group(dataset_from_items(rows), "g", "text")
           .to_pandas().set_index("g"))
    assert out.loc["a", "n_docs"] == 2 and out.loc["a", "n_dups"] == 1
    assert out.loc["a", "dup_rate"] == 0.5
    assert out.loc["b", "n_docs"] == 3 and out.loc["b", "n_dups"] == 3
    assert out.loc["b", "dup_rate"] == 1.0
    assert out.loc["c", "n_dups"] == 0 and out.loc["c", "dup_rate"] == 0.0


def test_minhash_index_roundtrip_matches_live_signing(ray_session, tmp_path):
    """write_minhash_index → read_minhash_index returns the same rows
    minhash_sign produces live (signatures, shingle sets, re-derived
    key fingerprints)."""
    import ray.data as rd

    from llm_food_ray.stages.dedup import (minhash_sign,
                                           read_minhash_index,
                                           write_minhash_index)

    docs = [{"doc_id": i, "text": " ".join(f"w{i}_{j}" for j in range(40))}
            for i in range(20)]
    ds = rd.from_items(docs)
    idx = str(tmp_path / "idx")
    meta = write_minhash_index(ds, idx, "doc_id", "text", num_perm=32,
                               num_buckets=4)
    assert meta["num_perm"] == 32

    got, meta2 = read_minhash_index(idx)
    assert meta2 == meta
    live = (minhash_sign(ds, "doc_id", "text", num_perm=32)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    got = got.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns.sort_values()) == list(
        live.columns.sort_values())
    for col in ["doc_id", "__fh", "__fl"]:
        assert list(got[col]) == list(live[col])
    for col in ["minhash_sig", "shingles"]:
        assert [list(v) for v in got[col]] == [list(v) for v in live[col]]


def test_minhash_index_append_and_near_against_plan_equality(
        ray_session, tmp_path):
    """dedup_near_against_index over a written-then-appended index is
    byte-identical to dedup_near_against over the live archive texts."""
    import ray.data as rd

    from llm_food_ray.stages.dedup import (append_minhash_index,
                                           dedup_near_against,
                                           dedup_near_against_index,
                                           write_minhash_index)

    base = " ".join(f"w{i}" for i in range(60))
    other = " ".join(f"z{i}" for i in range(60))
    seen1 = [{"doc_id": 100, "text": base + " archived"}]
    seen2 = [{"doc_id": 101, "text": other + " archived"}]
    new = rd.from_items([
        {"doc_id": 1, "text": base},            # component touches 100
        {"doc_id": 2, "text": base + " tail"},  # chained to 1
        {"doc_id": 3, "text": other},           # touches appended 101
        {"doc_id": 4, "text": " ".join(f"q{i}" for i in range(60))},
    ])
    idx = str(tmp_path / "idx")
    write_minhash_index(rd.from_items(seen1), idx, "doc_id", "text",
                        num_buckets=4)
    append_minhash_index(rd.from_items(seen2), idx, "text")

    for verify in ("exact", "estimate"):
        via_idx = sorted(
            r["doc_id"] for r in dedup_near_against_index(
                new, idx, "doc_id", "text", threshold=0.8,
                verify=verify).take_all())
        live = sorted(
            r["doc_id"] for r in dedup_near_against(
                new, rd.from_items(seen1 + seen2), "doc_id", "text",
                threshold=0.8, verify=verify).take_all())
        assert via_idx == live == [4], verify


def test_minhash_index_config_validation(ray_session, tmp_path):
    import pytest
    import ray.data as rd

    from llm_food_ray.stages.dedup import (dedup_near_against_index,
                                           read_minhash_index,
                                           write_minhash_index)

    ds = rd.from_items([{"doc_id": 1, "text": "a b c d e"}])
    idx = str(tmp_path / "idx")
    with pytest.raises(FileNotFoundError):
        read_minhash_index(idx)
    write_minhash_index(ds, idx, "doc_id", "text", keep_shingles=False,
                        num_buckets=2)
    with pytest.raises(ValueError, match="keyed by"):
        dedup_near_against_index(ds, idx, "url", "text")
    with pytest.raises(ValueError, match="keep_shingles"):
        dedup_near_against_index(ds, idx, "doc_id", "text",
                                 verify="exact")


def test_jaccard_pairs_exact_matches_brute_force(ray_session):
    """Prefix-filter exact join == brute-force all-pairs Jaccard, for
    every (order, verify_exec) plan and several thresholds."""
    import numpy as np
    import ray.data as rd

    from llm_food_ray.functions.hashing import jaccard, shingle_hashes
    from llm_food_ray.stages.dedup import jaccard_pairs_exact

    rng = np.random.default_rng(7)
    docs = [{"doc_id": i,
             "text": " ".join(f"w{rng.integers(0, 200)}" for _ in range(30))}
            for i in range(60)]
    for i in range(0, 60, 10):       # planted near-dups
        docs.append({"doc_id": 1000 + i, "text": docs[i]["text"] + " tail"})
    docs.append({"doc_id": 9999, "text": ""})      # empty doc
    ds = rd.from_items(docs)

    sh = {d["doc_id"]: shingle_hashes(d["text"], 3) for d in docs}
    ks = sorted(sh)
    for th in (0.5, 0.8, 1.0):
        truth = {(a, b, round(jaccard(sh[a], sh[b]), 6))
                 for i, a in enumerate(ks) for b in ks[i + 1:]
                 if jaccard(sh[a], sh[b]) >= th}
        for kw in (dict(order="df"), dict(order="hash"),
                   dict(order="df", verify_exec="semijoin",
                        num_partitions=16),
                   dict(order="hash", verify_exec="broadcast")):
            got = {(r["a"], r["b"], round(r["sim"], 6)) for r in
                   jaccard_pairs_exact(ds, threshold=th, **kw).take_all()}
            assert got == truth, (th, kw)


def test_jaccard_pairs_exact_agrees_with_lsh_exact_verify(ray_session):
    import numpy as np
    import ray.data as rd

    from llm_food_ray.stages.dedup import (jaccard_pairs_exact,
                                           minhash_candidate_pairs)

    rng = np.random.default_rng(3)
    docs = [{"doc_id": i,
             "text": " ".join(f"t{rng.integers(0, 80)}" for _ in range(25))}
            for i in range(40)]
    docs += [{"doc_id": 100 + i, "text": docs[i]["text"] + " x"}
             for i in range(8)]
    ds = rd.from_items(docs)
    exact = {(r["a"], r["b"], round(r["sim"], 9)) for r in
             jaccard_pairs_exact(ds, threshold=0.8).take_all()}
    lsh = {(r["a"], r["b"], round(r["sim"], 9)) for r in
           minhash_candidate_pairs(ds, "doc_id", "text", threshold=0.8,
                                   verify="exact", num_perm=128,
                                   num_bands=64).take_all()}
    assert exact == lsh and exact


def test_jaccard_pairs_exact_validation(ray_session):
    import pytest
    import ray.data as rd

    from llm_food_ray.stages.dedup import jaccard_pairs_exact

    ds = rd.from_items([{"doc_id": 1, "text": "a b c d"}])
    with pytest.raises(ValueError, match="threshold"):
        jaccard_pairs_exact(ds, threshold=0.0)
    with pytest.raises(ValueError, match="order"):
        jaccard_pairs_exact(ds, order="bogus")
    with pytest.raises(ValueError, match="broadcast budget"):
        jaccard_pairs_exact(ds, order="df", broadcast_budget_bytes=1)


def test_canonical_dedup_keep_rules(ray_session):
    """Self-canonical member wins its group; dangling-canonical groups
    keep their min-url member; no-canonical rows are their own group."""
    import ray.data as rd

    from llm_food_ray.stages.dedup import canonical_dedup

    rows = [
        # group A: master + two variants pointing at it
        {"url": "https://a/x", "canonical": None},
        {"url": "https://a/x?utm=1", "canonical": "https://a/x"},
        {"url": "https://a/x/amp", "canonical": "https://a/x"},
        # group B: explicit self-canonical
        {"url": "https://b/y", "canonical": "https://b/y"},
        # group C: dangling shared canonical -> min url survives
        {"url": "https://c/2", "canonical": "https://gone/master"},
        {"url": "https://c/1", "canonical": "https://gone/master"},
        # lone page, no canonical
        {"url": "https://d/z", "canonical": None},
    ]
    kept = sorted(r["url"] for r in
                  canonical_dedup(rd.from_items(rows)).take_all())
    assert kept == ["https://a/x", "https://b/y", "https://c/1",
                    "https://d/z"]


def test_canonical_dedup_all_self_is_identity(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.dedup import canonical_dedup

    rows = [{"url": f"u{i}", "canonical": None} for i in range(10)]
    out = canonical_dedup(rd.from_items(rows))
    assert sorted(r["url"] for r in out.take_all()) == sorted(
        r["url"] for r in rows)
