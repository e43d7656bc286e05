"""DSIR hashed n-gram importance weighting vs a brute-force local twin."""

import hashlib
import math
from collections import Counter

from helpers import dataset_from_items

from llm_food_ray.stages.dsir import dsir_weights

ROWS = [
    {"doc_id": 1, "lang": "en", "text": "the cat sat on the mat"},
    {"doc_id": 2, "lang": "en", "text": "the dog sat on the log"},
    {"doc_id": 3, "lang": "de", "text": "der hund sitzt auf dem baum"},
    {"doc_id": 4, "lang": "de", "text": "the cat sat"},
    {"doc_id": 5, "lang": "en", "text": ""},
]
B = 64


def _grams(t):
    ws = t.split()
    return ws + [a + " " + b for a, b in zip(ws, ws[1:])]


def _bkt(g):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def brute():
    src, tgt = Counter(), Counter()
    for r in ROWS:
        for g in _grams(r["text"]):
            src[_bkt(g)] += 1
            if r["lang"] == "en":
                tgt[_bkt(g)] += 1
    s_tot = sum(src.values()) + B
    t_tot = sum(tgt.values()) + B
    out = {}
    for r in ROWS:
        gs = _grams(r["text"])
        s = sum(math.log((tgt[_bkt(g)] + 1.0) / t_tot)
                - math.log((src[_bkt(g)] + 1.0) / s_tot) for g in gs)
        out[r["doc_id"]] = (len(gs), round(s, 6) if gs else 0.0)
    return out

def test_dsir_weights_matches_brute_force(ray_session):
    got = dsir_weights(dataset_from_items(ROWS), num_buckets=B).to_pandas()
    want = brute()
    assert len(got) == len(ROWS)
    for _, row in got.iterrows():
        n, w = want[row["doc_id"]]
        assert row["n_grams"] == n
        assert abs(row["log_w"] - w) < 1e-9


def test_dsir_target_slice_scores_higher(ray_session):
    got = (dsir_weights(dataset_from_items(ROWS), num_buckets=B)
           .to_pandas().set_index("doc_id"))
    # English docs share target-heavy buckets; the pure-German doc should
    # carry the lowest per-gram weight
    per_gram = {d: got.loc[d, "log_w"] / max(got.loc[d, "n_grams"], 1)
                for d in (1, 2, 3)}
    assert per_gram[3] < per_gram[1] and per_gram[3] < per_gram[2]
