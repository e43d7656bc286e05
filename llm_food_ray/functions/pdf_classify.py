"""PDF text/scanned classifier (M6) — identical thresholds to the reference.

Reference semantics (llm_food/pdf_utils.py:16-68, llm_food/config.py:56-69):
sample ``clamp(ceil(sqrt(total_pages)), min=2, max=20)`` evenly-spaced pages
at indices ``int(i * total / sample)``, count words per sampled page, and
call the PDF text-based iff at least ``text_ratio`` (default 0.7) of the
sampled pages have at least ``word_threshold`` (default 75) words.

Here the classifier routes structured-markdown vs plaintext-fallback
extraction (the Gemini OCR leg is replaced by local extraction).
"""

from __future__ import annotations

import math

from ..config import ClassifierConfig


def sample_page_indices(total_pages: int, cfg: ClassifierConfig) -> list[int]:
    if total_pages <= 0:
        return []
    sample = max(cfg.sample_min, min(cfg.sample_max, math.ceil(math.sqrt(total_pages))))
    sample = min(sample, total_pages)
    # evenly-spaced deterministic indices, pdf_utils.py:33-38
    return sorted({int(i * total_pages / sample) for i in range(sample)})


def is_text_based(word_counts: list[int], cfg: ClassifierConfig | None = None) -> bool:
    """`word_counts` is per-page word counts for the WHOLE document; the
    function samples internally (mirrors is_text_based_pdf taking the doc)."""
    cfg = cfg or ClassifierConfig()
    total = len(word_counts)
    idxs = sample_page_indices(total, cfg)
    if not idxs:
        return False
    hits = sum(1 for i in idxs if word_counts[i] >= cfg.word_threshold)
    return hits / len(idxs) >= cfg.text_ratio
