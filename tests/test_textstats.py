"""Text-analysis tests: language ID, quality, token counts, fingerprints,
and the Ray stage plumbing."""

from __future__ import annotations

from llm_food_ray.functions.textstats import (
    bpe_ish_token_count,
    detect_lang,
    quality_features,
    quality_score,
    token_count,
)
from llm_food_ray.functions.hashing import winnow_fingerprint
from llm_food_ray.stages.textstats import TextStatsStage, text_stats_dataset


def test_detect_lang_basics():
    assert detect_lang("the quick fox is on the hill and it was a good day") == "en"
    assert detect_lang("der Hund ist in dem Haus und das ist nicht gut") == "de"
    assert detect_lang("el perro es de la casa y no es como el gato") == "es"
    assert detect_lang("") == "und"
    assert detect_lang("zzz qqq xxx") == "und"


def test_token_counts():
    assert token_count("a b  c") == 3
    assert token_count("") == 0
    assert bpe_ish_token_count("hello, world!") == 4   # hello , world !


def test_quality_features_and_score_deterministic():
    t = "the cat sat on the mat and it was a fine day for all of them"
    f = quality_features(t)
    assert f["n_words"] == len(t.split()) == 16
    assert 0 < f["stopword_ratio"] <= 1
    assert quality_score(t) == quality_score(t)
    assert 0 <= quality_score(t) <= 1
    assert quality_score("") == 0.0
    assert quality_score("zz " * 200) < quality_score(t) + 0.45


def test_winnow_fingerprint_properties():
    t = "one two three four five six seven eight nine ten eleven twelve"
    fp = winnow_fingerprint(t)
    assert fp == sorted(set(fp))
    assert winnow_fingerprint(t) == fp          # deterministic
    assert winnow_fingerprint("") == []
    # a small edit changes few fingerprint entries but not all
    t2 = t.replace("five", "FIVE")
    fp2 = winnow_fingerprint(t2)
    assert set(fp) & set(fp2)


def test_stage_adds_columns(ray_session):
    from helpers import dataset_from_items

    ds = dataset_from_items([
        {"doc_id": 1, "text": "the cat sat on the mat with a hat"},
        {"doc_id": 2, "text": ""},
    ])
    out = text_stats_dataset(ds).to_pandas()
    for col in ("lang_id", "n_tokens", "n_tokens_bpe", "n_words",
                "mean_word_len", "stopword_ratio", "quality",
                "content_md5", "simhash", "fingerprint_min"):
        assert col in out.columns, col
    assert out.loc[out["doc_id"] == 1, "lang_id"].iloc[0] == "en"
    assert out.loc[out["doc_id"] == 2, "n_tokens"].iloc[0] == 0


def test_stage_feature_selection(ray_session):
    from helpers import dataset_from_items

    ds = dataset_from_items([{"doc_id": 1, "text": "a b c"}])
    out = ds.map_batches(
        TextStatsStage(features=("tokens",)), batch_format="pyarrow"
    ).to_pandas()
    assert "n_tokens" in out.columns and "lang_id" not in out.columns
