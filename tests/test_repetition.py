"""Repetition / layout quality signals (Gopher-style filters)."""

from __future__ import annotations

from llm_food_ray.functions.repetition import (
    passes_repetition_filter,
    repetition_features,
    split_lines,
    split_paragraphs,
    split_words,
)


def test_splitters_edge_cases():
    assert split_lines("") == []
    assert split_lines("a\n\n  \nb") == ["a", "b"]
    assert split_paragraphs("p1\n\np2\n\n\n\np3") == ["p1", "p2", "p3"]
    assert split_words("  a\tb\r\nc  ") == ["a", "b", "c"]
    # \v is NOT a separator (parity with the RE2 oracle class)
    assert split_words("a\x0bb") == ["a\x0bb"]


def test_repetition_features_values():
    f = repetition_features("x\nx\ny\nz")
    assert f["n_lines"] == 4
    assert abs(f["dup_line_frac"] - 0.25) < 1e-12
    f = repetition_features("p\n\np\n\nq")
    assert abs(f["dup_para_frac"] - (1 - 2 / 3)) < 1e-12
    f = repetition_features("a a a b c")
    assert abs(f["top_word_frac"] - 0.6) < 1e-12
    f = repetition_features("- one\n* two\ntext\n  • three")
    assert abs(f["bullet_line_frac"] - 0.75) < 1e-12
    f = repetition_features("done\nmore...\nand…  ")
    assert abs(f["ellipsis_line_frac"] - (2 / 3)) < 1e-12


def test_repetition_empty_text():
    f = repetition_features("")
    assert f["n_lines"] == f["n_words"] == 0
    assert all(f[k] == 0.0 for k in (
        "dup_line_frac", "dup_para_frac", "top_word_frac",
        "bullet_line_frac", "ellipsis_line_frac"))
    assert passes_repetition_filter(f)


def test_filter_thresholds():
    good = repetition_features("a normal line\nanother row\nno repeats here")
    assert passes_repetition_filter(good)
    spam = repetition_features("buy\n" * 50)
    assert not passes_repetition_filter(spam)
    listy = repetition_features("\n".join(f"- item {i}" for i in range(20)))
    assert not passes_repetition_filter(listy) or listy["bullet_line_frac"] <= 0.9


def test_repetition_stage_ray(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import RepetitionStage

    rows = [{"doc_id": 1, "text": "x\nx\ny"},
            {"doc_id": 2, "text": None},
            {"doc_id": 3, "text": "a a a a a b"}]
    out = (dataset_from_items(rows)
           .map_batches(RepetitionStage(), batch_format="pyarrow")
           .to_pandas().set_index("doc_id"))
    assert abs(out.loc[1, "dup_line_frac"] - round(1 - 2 / 3, 6)) < 1e-9
    assert out.loc[2, "n_lines"] == 0 and bool(out.loc[2, "keep"])
    assert not bool(out.loc[3, "keep"])   # top_word_frac 5/6 > 0.2


def test_dedup_lines_exact_first_occurrence_order():
    from llm_food_ray.functions.repetition import dedup_lines_exact

    assert dedup_lines_exact("a\nb\na\nc\nb\na") == "a\nb\nc"
    assert dedup_lines_exact("") == ""
    assert dedup_lines_exact("\n\n") == ""        # blank lines dedup too
    assert dedup_lines_exact("x\n\ny\n\nx") == "x\n\ny"
