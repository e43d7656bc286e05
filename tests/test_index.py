"""Inverted-index tests: build/lookup round-trip, bucket pruning, and
absent-term handling."""

from __future__ import annotations

import os

import pandas as pd

from llm_food_ray.functions.hashing import stable_hash64
from llm_food_ray.stages.index import build_term_index, term_lookup


def _from_pandas(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_index_roundtrip_and_tf(ray_session, tmp_path):
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["cat dog cat", "dog dog", "bird  cat\tdog"],
    })
    d = str(tmp_path / "ix")
    build_term_index(_from_pandas(df), d)
    out = (term_lookup(d, ["cat", "dog"]).to_pandas()
           .sort_values(["term", "doc_id"]).reset_index(drop=True))
    want = pd.DataFrame({
        "term": ["cat", "cat", "dog", "dog", "dog"],
        "doc_id": [1, 3, 1, 2, 3],
        "tf": [2, 1, 1, 2, 1],
    })
    assert out.astype({"tf": "int64"}).equals(want)


def test_lookup_reads_only_matching_buckets(ray_session, tmp_path):
    df = pd.DataFrame({"doc_id": range(50),
                       "text": [f"w{i} shared" for i in range(50)]})
    d = str(tmp_path / "ix")
    build_term_index(_from_pandas(df), d, num_buckets=16)
    out = term_lookup(d, ["shared"], num_buckets=16).to_pandas()
    assert len(out) == 50
    # the lookup path only touches the one bucket 'shared' hashes into
    b = stable_hash64("shared") % 16
    assert os.path.isdir(os.path.join(d, f"bucket={b}"))


def test_lookup_absent_term_is_empty(ray_session, tmp_path):
    df = pd.DataFrame({"doc_id": [1], "text": ["alpha beta"]})
    d = str(tmp_path / "ix")
    build_term_index(_from_pandas(df), d)
    out = term_lookup(d, ["nosuchterm"]).to_pandas()
    assert len(out) == 0
    # Ray drops the schema of fully-filtered (all-empty-block) datasets,
    # so columns are only guaranteed when the bucket dir didn't exist at
    # all (the typed-empty return path)
    assert (len(out.columns) == 0
            or list(out.columns) == ["term", "doc_id", "tf"])

    out2 = term_lookup(d, ["zz-no-bucket"], num_buckets=1024).to_pandas()
    assert len(out2) == 0


def test_positional_phrase_lookup(ray_session, tmp_path):
    import ray.data as rd

    from llm_food_ray.stages.index import (build_positional_index,
                                           phrase_lookup)

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["the cat sat on the cat mat",
                 "a cat mat is not the cat",
                 "cat mat cat mat",
                 "dog house",
                 "cat  mat"],  # double space: still adjacent after split
    })
    d = str(tmp_path / "pix")
    build_positional_index(rd.from_pandas(df), d)
    out = (phrase_lookup(d, ["cat", "mat"]).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == [1, 2, 3, 5]
    assert list(out["n_occurrences"]) == [1, 1, 2, 1]


def test_phrase_lookup_repeated_token_overlaps(ray_session, tmp_path):
    import ray.data as rd

    from llm_food_ray.stages.index import (build_positional_index,
                                           phrase_lookup)

    df = pd.DataFrame({"doc_id": [1], "text": ["go go go go stop"]})
    d = str(tmp_path / "pix")
    build_positional_index(rd.from_pandas(df), d)
    out = phrase_lookup(d, ["go", "go"]).to_pandas()
    assert list(out["n_occurrences"]) == [3]  # overlapping occurrences
    out3 = phrase_lookup(d, ["go", "go", "stop"]).to_pandas()
    assert list(out3["n_occurrences"]) == [1]


def test_merge_then_compact_equals_full_rebuild(ray_session, tmp_path):
    import os

    import ray.data as rd

    from llm_food_ray.stages.index import (build_term_index, compact_index,
                                           merge_term_index, term_lookup)

    base = rd.from_items([
        {"doc_id": 1, "text": "alpha beta gamma alpha"},
        {"doc_id": 2, "text": "beta delta"},
    ])
    delta = rd.from_items([
        {"doc_id": 3, "text": "alpha epsilon"},
        {"doc_id": 4, "text": "delta delta zeta"},
    ])
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    build_term_index(base, inc, num_buckets=8)
    merge_term_index(delta, inc, num_buckets=8)
    n_compacted = compact_index(inc, num_buckets=8)
    build_term_index(base.union(delta), full, num_buckets=8)

    terms = ["alpha", "beta", "delta", "zeta", "missing"]
    got = sorted((r["term"], r["doc_id"], r["tf"])
                 for r in term_lookup(inc, terms, num_buckets=8).take_all())
    want = sorted((r["term"], r["doc_id"], r["tf"])
                  for r in term_lookup(full, terms, num_buckets=8).take_all())
    assert got == want and len(got) >= 6
    # compaction left exactly one file in every multi-file bucket
    for d in os.listdir(inc):
        files = [f for f in os.listdir(os.path.join(inc, d))
                 if f.endswith(".parquet")]
        assert len(files) >= 1
        if "compacted.parquet" in files:
            assert files == ["compacted.parquet"]
    assert n_compacted >= 1


def test_merge_never_touches_unrelated_buckets(ray_session, tmp_path):
    import os

    import ray.data as rd

    from llm_food_ray.stages.index import build_term_index, merge_term_index

    base = rd.from_items([{"doc_id": 1, "text": "alpha beta gamma delta "
                                                 "epsilon zeta eta theta"}])
    idx = str(tmp_path / "idx")
    build_term_index(base, idx, num_buckets=32)
    before = {}
    for d in os.listdir(idx):
        p = os.path.join(idx, d)
        before[d] = sorted(os.listdir(p))
    merge_term_index(rd.from_items([{"doc_id": 2, "text": "alpha"}]),
                     idx, num_buckets=32)
    from llm_food_ray.functions.hashing import stable_hash64

    touched = f"bucket={stable_hash64('alpha') % 32}"
    for d, files in before.items():
        now = sorted(os.listdir(os.path.join(idx, d)))
        if d == touched:
            assert len(now) > len(files)  # new delta file appended
            assert set(files) <= set(now)  # old files untouched
        else:
            assert now == files
