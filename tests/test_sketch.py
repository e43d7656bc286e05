"""HyperLogLog sketch tests: accuracy band, merge semantics, and
determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd

from llm_food_ray.stages.sketch import (_estimate, _registers_for,
                                        hll_count_distinct, hll_overlap)


def _from_pandas(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_hll_accuracy_10k(ray_session):
    vals = [f"v{i}" for i in range(10000)]
    df = pd.DataFrame({"k": ["a"] * 10000, "v": vals})
    out = hll_count_distinct(_from_pandas(df), "k", "v").to_pandas()
    est = float(out["approx_distinct"][0])
    # standard error at p=12 is ~1.6%; 5% is a safe deterministic bound
    assert abs(est - 10000) / 10000 < 0.05


def test_hll_merge_equals_whole():
    vals = [f"v{i}" for i in range(5000)]
    r1 = _registers_for(vals[:2500], 12)
    r2 = _registers_for(vals[2500:], 12)
    rw = _registers_for(vals, 12)
    assert (np.maximum(r1, r2) == rw).all()
    assert _estimate(np.maximum(r1, r2), 12) == _estimate(rw, 12)


def test_hll_duplicates_dont_inflate(ray_session):
    df = pd.DataFrame({"k": ["a"] * 1000,
                       "v": [f"v{i % 10}" for i in range(1000)]})
    out = hll_count_distinct(_from_pandas(df), "k", "v").to_pandas()
    est = float(out["approx_distinct"][0])
    assert abs(est - 10) < 1.0  # linear-counting regime is near-exact


def test_hll_per_group_close_to_exact(ray_session):
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["lang", "n_chars"])
    out = (hll_count_distinct(_from_pandas(docs), "lang", "n_chars")
           .to_pandas().set_index("lang"))
    exact = docs.groupby("lang")["n_chars"].nunique()
    for lang, n in exact.items():
        est = float(out.loc[lang, "approx_distinct"])
        assert abs(est - n) / n < 0.08


def test_hll_deterministic(ray_session):
    df = pd.DataFrame({"k": ["a"] * 500,
                       "v": [f"x{i}" for i in range(500)]})
    a = hll_count_distinct(_from_pandas(df), "k", "v").to_pandas()
    b = hll_count_distinct(_from_pandas(df), "k", "v").to_pandas()
    assert float(a["approx_distinct"][0]) == float(b["approx_distinct"][0])


def test_hll_overlap_inclusion_exclusion(ray_session):
    import ray.data as rd

    a = pd.DataFrame({"v": [f"u{i}" for i in range(2000)]})
    b = pd.DataFrame({"v": [f"u{i}" for i in range(1000, 3000)]})
    out = (hll_overlap(rd.from_pandas(a), rd.from_pandas(b), "v")
           .to_pandas().iloc[0])
    # true: |A|=2000 |B|=2000 |A∪B|=3000 |A∩B|=1000
    assert abs(out["n_a"] - 2000) / 2000 < 0.05
    assert abs(out["n_b"] - 2000) / 2000 < 0.05
    assert abs(out["n_union"] - 3000) / 3000 < 0.05
    # overlap inherits three estimates' noise — wider band
    assert abs(out["n_overlap"] - 1000) / 1000 < 0.2
    assert round(out["n_a"] + out["n_b"] - out["n_union"], 6) == out["n_overlap"]


def test_hll_overlap_disjoint_and_identical(ray_session):
    import ray.data as rd

    a = pd.DataFrame({"v": [f"x{i}" for i in range(500)]})
    b = pd.DataFrame({"v": [f"y{i}" for i in range(500)]})
    out = (hll_overlap(rd.from_pandas(a), rd.from_pandas(b), "v")
           .to_pandas().iloc[0])
    assert abs(out["n_overlap"]) / 500 < 0.1  # ≈ disjoint
    same = (hll_overlap(rd.from_pandas(a), rd.from_pandas(a), "v")
            .to_pandas().iloc[0])
    assert same["n_union"] == same["n_a"] == same["n_b"]
    assert same["n_overlap"] == round(same["n_a"], 6)
