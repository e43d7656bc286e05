"""Gopher-style repetition / layout quality signals.

Training-data pipelines drop documents dominated by repeated lines,
repeated paragraphs, a single over-represented token, or list/ellipsis
boilerplate (Rae et al. 2021 "Scaling Language Models" §A1.1 quality
heuristics; reference has no analogue — llm_food converts documents but
never filters them).

Parity contract: every definition here is mirrored 1:1 by a DuckDB SQL
oracle, so the semantics deliberately use EXPLICIT ASCII whitespace
classes — Python's ``str.split()``/``\\s`` match unicode whitespace while
RE2 (DuckDB) ``\\s`` is ASCII-only, and a silent mismatch would surface
as value-hash failures only on exotic corpora.
"""

from __future__ import annotations

import re

# ASCII whitespace, minus \v (RE2 has no \v escape; it never appears in
# the corpora and excluding it keeps the Python and SQL classes equal)
_WS = " \t\r\n\f"
_WORD_SPLIT = re.compile("[ \t\r\n\f]+")

BULLET_PREFIXES = ("-", "*", "•")
ELLIPSIS_SUFFIXES = ("...", "…")


def split_lines(text: str) -> list[str]:
    """Non-blank lines (blank = empty after ASCII-whitespace trim)."""
    return [l for l in text.split("\n") if l.strip(_WS)]


def split_paragraphs(text: str) -> list[str]:
    """Non-blank double-newline-separated paragraphs."""
    return [p for p in text.split("\n\n") if p.strip(_WS)]


def split_words(text: str) -> list[str]:
    """ASCII-whitespace-separated tokens, empties dropped."""
    return [w for w in _WORD_SPLIT.split(text) if w]


def repetition_features(text: str) -> dict:
    """→ dict of repetition / layout fractions, all in [0, 1]:

    - dup_line_frac:     1 − distinct/total over non-blank lines
    - dup_para_frac:     1 − distinct/total over non-blank paragraphs
    - top_word_frac:     occurrences of the most frequent token / tokens
    - bullet_line_frac:  non-blank lines starting with -, * or •
                         (after ASCII-whitespace lstrip)
    - ellipsis_line_frac: non-blank lines ending with ... or …
                         (after ASCII-whitespace rstrip)
    """
    lines = split_lines(text)
    paras = split_paragraphs(text)
    words = split_words(text)
    n_lines = len(lines)
    n_words = len(words)
    if n_lines:
        dup_line = 1.0 - len(set(lines)) / n_lines
        bullet = sum(l.lstrip(_WS).startswith(BULLET_PREFIXES)
                     for l in lines) / n_lines
        ellipsis = sum(l.rstrip(_WS).endswith(ELLIPSIS_SUFFIXES)
                       for l in lines) / n_lines
    else:
        dup_line = bullet = ellipsis = 0.0
    dup_para = (1.0 - len(set(paras)) / len(paras)) if paras else 0.0
    if n_words:
        counts: dict[str, int] = {}
        for w in words:
            counts[w] = counts.get(w, 0) + 1
        top_word = max(counts.values()) / n_words
    else:
        top_word = 0.0
    return {
        "n_lines": n_lines,
        "n_words": n_words,
        "dup_line_frac": dup_line,
        "dup_para_frac": dup_para,
        "top_word_frac": top_word,
        "bullet_line_frac": bullet,
        "ellipsis_line_frac": ellipsis,
    }


# default keep-thresholds for the composed quality filter (Gopher-like)
FILTER_MAX_DUP_LINE = 0.30
FILTER_MAX_DUP_PARA = 0.30
FILTER_MAX_TOP_WORD = 0.20
FILTER_MAX_BULLET = 0.90
FILTER_MAX_ELLIPSIS = 0.30


def passes_repetition_filter(feats: dict) -> bool:
    return (feats["dup_line_frac"] <= FILTER_MAX_DUP_LINE
            and feats["dup_para_frac"] <= FILTER_MAX_DUP_PARA
            and feats["top_word_frac"] <= FILTER_MAX_TOP_WORD
            and feats["bullet_line_frac"] <= FILTER_MAX_BULLET
            and feats["ellipsis_line_frac"] <= FILTER_MAX_ELLIPSIS)


def dedup_lines_exact(text: str) -> str:
    """Within-document exact line dedup (the MassiveText/CCNet
    preprocessing step): keep the FIRST occurrence of every distinct
    line (raw split on '\n', blanks included), preserving order.  Pure
    per-document transform — streams embarrassingly parallel."""
    seen: set[str] = set()
    out = []
    for line in text.split("\n"):
        if line not in seen:
            seen.add(line)
            out.append(line)
    return "\n".join(out)
