"""Chunker tests (C1-C4 contracts, reference llm_food/app.py:406-446,
models.py:8-36)."""

from __future__ import annotations

import pytest

from llm_food_ray.config import ChunkConfig
from llm_food_ray.functions.chunk import (
    chunk_recursive,
    chunk_sentences,
    chunk_text,
    chunk_tokens,
    split_sentences,
)


def words(n: int) -> str:
    return " ".join(f"w{i}" for i in range(n))


def test_token_chunker_exact_windows():
    text = words(10)
    # size 8 overlap 4 → [0:8], [4:10] (last window reaches the end)
    chunks = chunk_tokens(text, 8, 4)
    assert chunks == [" ".join(f"w{i}" for i in range(8)),
                      " ".join(f"w{i}" for i in range(4, 10))]


def test_token_chunker_short_text_single_chunk():
    assert chunk_tokens(words(5), 8, 2) == [words(5)]
    assert chunk_tokens("", 8, 2) == []


def test_token_chunker_no_overlap():
    chunks = chunk_tokens(words(9), 3, 0)
    assert chunks == [
        "w0 w1 w2", "w3 w4 w5", "w6 w7 w8",
    ]


def test_token_chunker_coverage_and_overlap_invariants():
    size, overlap, n = 16, 5, 100
    chunks = chunk_tokens(words(n), size, overlap)
    step = size - overlap
    for i, c in enumerate(chunks):
        toks = c.split()
        assert toks[0] == f"w{i * step}"           # window starts at i*step
        assert len(toks) <= size
    assert chunks[-1].split()[-1] == f"w{n - 1}"   # reaches the end
    # consecutive chunks share exactly `overlap` tokens (except maybe last)
    for a, b in zip(chunks[:-2], chunks[1:-1]):
        assert a.split()[-overlap:] == b.split()[:overlap]


def test_sentence_split_rules():
    assert split_sentences("One two. Three four! Five? Six") == [
        "One two.", "Three four!", "Five?", "Six",
    ]
    assert split_sentences("") == []


def test_sentence_chunker_packs_whole_sentences():
    text = "a b c. d e f. g h i. j k l."
    chunks = chunk_sentences(text, 6, 0)
    assert chunks == ["a b c. d e f.", "g h i. j k l."]


def test_sentence_chunker_overlap():
    text = "a b c. d e f. g h i."
    chunks = chunk_sentences(text, 6, 3)
    # chunk1 = sents 1-2; overlap pulls sentence 2 into chunk2
    assert chunks == ["a b c. d e f.", "d e f. g h i."]


def test_sentence_chunker_giant_sentence_own_chunk():
    text = words(50) + ". short one."
    chunks = chunk_sentences(text, 10, 0)
    assert chunks[0].split()[-1] == "w49."
    assert chunks[1] == "short one."


def test_recursive_chunker_splits_then_merges():
    text = "para one has words.\n\npara two has words.\n\npara three has words."
    chunks = chunk_recursive(text, 8)
    assert chunks == ["para one has words. para two has words.",
                      "para three has words."]
    # every chunk within budget
    assert all(len(c.split()) <= 8 for c in chunks)


def test_recursive_chunker_huge_paragraph_token_fallback():
    chunks = chunk_recursive(words(30), 10)
    assert len(chunks) == 3
    assert " ".join(chunks).split() == words(30).split()


def test_param_validation_mirrors_reference():
    # models.py:27-36 → 422; here ValueError at build time
    with pytest.raises(ValueError):
        ChunkConfig(strategy="token", chunk_size=0)
    with pytest.raises(ValueError):
        ChunkConfig(strategy="token", chunk_size=8, chunk_overlap=8)
    with pytest.raises(ValueError):
        ChunkConfig(strategy="token", chunk_size=8, chunk_overlap=-1)
    with pytest.raises(ValueError):
        ChunkConfig(strategy="bogus")
    # defaults token/512/128 (models.py:8-11)
    cfg = ChunkConfig()
    assert (cfg.strategy, cfg.chunk_size, cfg.chunk_overlap) == ("token", 512, 128)


def test_chunk_text_dispatch():
    cfg = ChunkConfig(strategy="token", chunk_size=4, chunk_overlap=0)
    assert chunk_text(words(8), cfg) == ["w0 w1 w2 w3", "w4 w5 w6 w7"]
    cfg = ChunkConfig(strategy="recursive", chunk_size=4, chunk_overlap=0)
    assert chunk_text(words(8), cfg) == ["w0 w1 w2 w3", "w4 w5 w6 w7"]


def test_chunk_tokens_spans_invariants():
    """Spans index the RAW text; chunk text equals the normalized
    substring; chunk sequence matches chunk_tokens exactly."""
    from llm_food_ray.functions.chunk import chunk_tokens, chunk_tokens_spans

    texts = ["",
             "one",
             "  leading and   irregular\n\nwhitespace here ok then more "
             "words to cross a window boundary " + "tok " * 40,
             "\t tabs\tand\nnewlines " + " ".join(f"w{i}" for i in range(75))]
    for t in texts:
        spans = chunk_tokens_spans(t, 32, 8)
        assert [c for c, _, _ in spans] == chunk_tokens(t, 32, 8)
        for c, s, e in spans:
            assert 0 <= s < e <= len(t)
            assert " ".join(t[s:e].split()) == c
