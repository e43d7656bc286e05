"""PDF build/parse roundtrip + classifier tests (M3/M4/M6 contracts,
reference llm_food/pdf_utils.py:16-75, app.py:262-276)."""

from __future__ import annotations

import pytest

from llm_food_ray.config import ClassifierConfig
from llm_food_ray.functions.pdf_build import PageSpec, build_pdf, simple_pdf
from llm_food_ray.functions.pdf_classify import is_text_based, sample_page_indices
from llm_food_ray.functions.pdf_md import (
    PdfError,
    parse_pdf,
    pdf_pages_markdown,
    pdf_pages_word_counts,
)


def test_roundtrip_single_page():
    pdf = build_pdf([PageSpec([("h1", "Title X"), ("body", "one two three"),
                               ("body", "four five six")])])
    assert pdf_pages_markdown(pdf) == ["# Title X\n\none two three four five six"]


def test_multipage_order_preserved():
    pages = [PageSpec([("body", f"page {i} content")]) for i in range(5)]
    texts = pdf_pages_markdown(build_pdf(pages))
    assert texts == [f"page {i} content" for i in range(5)]


def test_heading_levels_by_font_size():
    pdf = build_pdf([PageSpec([("h1", "Big"), ("h2", "Mid"),
                               ("body", "text line"), ("body", "more text")])])
    md = pdf_pages_markdown(pdf)[0]
    assert md == "# Big\n\n## Mid\n\ntext line more text"


def test_plain_mode_no_markup():
    pdf = build_pdf([PageSpec([("h1", "Big"), ("body", "text line")])])
    assert pdf_pages_markdown(pdf, structured=False) == ["Big\ntext line"]


def test_layout_backend_preserves_line_breaks():
    """M5 third backend (pymupdf4llm flavour): identical heading
    detection, but body lines are NOT reflowed into one paragraph."""
    from llm_food_ray.functions.pdf_md import pdf_extract

    pdf = build_pdf([PageSpec([("h1", "Big"), ("body", "text line"),
                               ("body", "more text")])])
    reflow, _ = pdf_extract(pdf, "structured")
    layout, _ = pdf_extract(pdf, "structured_layout")
    assert reflow == ["# Big\n\ntext line more text"]
    assert layout == ["# Big\n\ntext line\nmore text"]


def test_backend_registry_aliases():
    """Reference PDF_BACKEND names (app.py:78-91) resolve to canonical
    modes; invalid values raise at build time (app.py:90-91)."""
    from llm_food_ray.config import ExtractConfig

    assert ExtractConfig(pdf_backend="pdf_oxide").resolved_pdf_backend == "structured"
    assert (ExtractConfig(pdf_backend="pymupdf4llm").resolved_pdf_backend
            == "structured_layout")
    assert ExtractConfig(pdf_backend="pypdf2").resolved_pdf_backend == "plain"
    assert ExtractConfig(pdf_backend="gemini").resolved_pdf_backend == "structured"
    assert ExtractConfig(pdf_backend="auto").resolved_pdf_backend == "auto"
    with pytest.raises(ValueError):
        ExtractConfig(pdf_backend="docling")


def test_uncompressed_stream():
    pdf = build_pdf([PageSpec([("body", "no flate here")])], compress=False)
    assert pdf_pages_markdown(pdf) == ["no flate here"]


def test_escaped_characters_roundtrip():
    text = r"parens (like this) and \backslash"
    pdf = build_pdf([PageSpec([("body", text)])])
    assert pdf_pages_markdown(pdf, structured=False) == [text]


def test_broken_inputs_raise_pdferror():
    with pytest.raises(PdfError):
        parse_pdf(b"not a pdf at all")
    with pytest.raises(PdfError):
        parse_pdf(b"%PDF-1.4\n<< truncated garbage")


def test_truncated_pdf_recovers_parsed_prefix():
    words = ("alpha beta gamma delta " * 100).split()
    pdf = simple_pdf("Doc", words, words_per_line=8, lines_per_page=10)
    full = pdf_pages_markdown(pdf)
    cut = pdf_pages_markdown(pdf[: len(pdf) * 2 // 3])
    assert len(cut) >= 1
    assert cut[0] == full[0]


def test_word_counts_per_page():
    pages = [PageSpec([("body", "one two three")]), PageSpec([("body", "a b")])]
    assert pdf_pages_word_counts(build_pdf(pages)) == [3, 2]


# ---- classifier (M6): identical thresholds 2/20/75/0.7 ----------------


def test_sample_indices_sqrt_clamped():
    cfg = ClassifierConfig()
    assert sample_page_indices(1, cfg) == [0]
    assert sample_page_indices(4, cfg) == [0, 2]          # sqrt(4)=2
    assert sample_page_indices(9, cfg) == [0, 3, 6]       # sqrt(9)=3
    # clamp max 20: 1000 pages → 20 samples
    assert len(sample_page_indices(1000, cfg)) == 20
    # clamp min 2
    assert len(sample_page_indices(3, cfg)) == 2


def test_text_based_thresholds():
    cfg = ClassifierConfig()
    # all pages rich → text-based
    assert is_text_based([100] * 9, cfg)
    # all sparse → scanned
    assert not is_text_based([10] * 9, cfg)
    # boundary: exactly 70% of sampled pages at >= 75 words
    # 9 pages → samples at [0,3,6]; 2/3 = 0.667 < 0.7 → not text-based
    counts = [80, 0, 0, 80, 0, 0, 10, 0, 0]
    assert not is_text_based(counts, cfg)
    # 3/3 → text-based; word_threshold boundary 75 inclusive
    assert is_text_based([75, 0, 0, 75, 0, 0, 75, 0, 0], cfg)
    assert not is_text_based([74, 0, 0, 74, 0, 0, 74, 0, 0], cfg)


def test_classifier_empty_doc():
    assert not is_text_based([], ClassifierConfig())
