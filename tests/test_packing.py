"""Sequence packing: brute-force parity, block-count invariance, edges."""

from __future__ import annotations

import pyarrow as pa
import pytest


def _brute_pack(texts: dict[int, str], L: int):
    """Single-threaded reference: concat token stream in key order."""
    pos = 0
    per_seq: dict[int, dict] = {}
    for k in sorted(texts):
        n = len((texts[k] or "").split())
        if n == 0:
            continue
        start, end = pos, pos + n
        pos = end
        for s in range(start // L, (end - 1) // L + 1):
            d = per_seq.setdefault(s, {"n_docs": 0, "n_tokens": 0,
                                       "first_doc": k, "last_doc": k})
            d["n_docs"] += 1
            d["n_tokens"] += min(end, (s + 1) * L) - max(start, s * L)
            d["first_doc"] = min(d["first_doc"], k)
            d["last_doc"] = max(d["last_doc"], k)
    return per_seq


def _run(ray_session, texts, L, blocks=4):
    import ray.data as rd

    from llm_food_ray.stages.packing import pack_sequences

    ds = rd.from_arrow(pa.table({
        "doc_id": list(texts.keys()),
        "text": list(texts.values()),
    })).repartition(blocks)
    df = pack_sequences(ds, L).to_pandas()
    if len(df) == 0:
        return df
    return df.sort_values("seq_id").reset_index(drop=True)


def test_pack_matches_brute_force(ray_session):
    texts = {i: " ".join(f"w{j}" for j in range((i * 7) % 23))
             for i in range(60)}
    texts[13] = ""          # zero-token doc occupies nothing
    got = _run(ray_session, texts, 16)
    brute = _brute_pack(texts, 16)
    assert list(got["seq_id"]) == sorted(brute)
    for _, row in got.iterrows():
        b = brute[row["seq_id"]]
        for col in ("n_docs", "n_tokens", "first_doc", "last_doc"):
            assert row[col] == b[col], (row["seq_id"], col)
    # all sequences full except possibly the last
    assert (got["n_tokens"].iloc[:-1] == 16).all()
    total = sum(len(t.split()) for t in texts.values())
    assert got["n_tokens"].sum() == total


def test_pack_block_count_invariance(ray_session):
    texts = {i: " ".join("tok" for _ in range(i % 11)) for i in range(40)}
    a = _run(ray_session, texts, 8, blocks=1)
    b = _run(ray_session, texts, 8, blocks=7)
    assert a.equals(b)


def test_pack_boundary_and_edges(ray_session):
    # doc ends exactly on a boundary; next doc starts the next sequence
    texts = {1: " ".join("a" for _ in range(10)),
             2: " ".join("b" for _ in range(5))}
    got = _run(ray_session, texts, 10)
    assert list(got["seq_id"]) == [0, 1]
    assert list(got["n_docs"]) == [1, 1]
    assert list(got["n_tokens"]) == [10, 5]

    empty = _run(ray_session, {1: "", 2: ""}, 10)
    assert len(empty) == 0

    import ray.data as rd

    from llm_food_ray.stages.packing import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(rd.from_arrow(pa.table({"doc_id": [1], "text": ["x"]})), 0)
