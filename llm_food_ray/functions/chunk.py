"""Text chunkers (C1-C4) — from-scratch replacements for chonkie's
TokenChunker / SentenceChunker / RecursiveChunker (llm_food/app.py:406-430,
llm_food/models.py:8-11) on a deterministic whitespace tokenizer.

Parameter invariants mirror models.py:27-36 (0 < size, 0 <= overlap < size)
and are enforced at config build time (``llm_food_ray.config.ChunkConfig``).

Tokenizer: ``text.split()`` (any-whitespace). Chunk text is the space-join
of its tokens (the whitespace tokenizer's decode), which makes the token
chunker exactly expressible in SQL (list_slice + array_to_string) for the
driver's DuckDB oracle.
"""

from __future__ import annotations

import re

from ..config import ChunkConfig

_SENT_END = re.compile(r"(?<=[.!?])\s+")
_PARA_SPLIT = re.compile(r"\n\s*\n")


def tokenize(text: str) -> list[str]:
    return text.split()


def chunk_tokens(text: str, size: int, overlap: int) -> list[str]:
    """Sliding window: starts at 0, size-overlap, 2*(size-overlap), ...;
    the window that reaches the end of the token list is the last chunk
    (no degenerate fully-contained trailing chunk)."""
    toks = tokenize(text)
    n = len(toks)
    if n == 0:
        return []
    step = size - overlap
    out = []
    start = 0
    while True:
        end = min(start + size, n)
        out.append(" ".join(toks[start:end]))
        if end >= n:
            break
        start += step
    return out


_TOKEN_RE = re.compile(r"\S+")


def chunk_tokens_spans(text: str, size: int,
                       overlap: int) -> list[tuple[str, int, int]]:
    """Token chunker with provenance: → [(chunk_text, span_start,
    span_end)] where the span is CHARACTER offsets into the RAW source
    text (0-based, end-exclusive) covering the chunk's first through
    last token — the SURVEY §1.2 ``spans`` contract, so chunk
    provenance survives downstream dedup/filtering.

    The chunk text is the whitespace-normalized join (same as
    :func:`chunk_tokens` — pytest-pinned equal), so the invariant is
    ``" ".join(text[s:e].split()) == chunk_text``, which the SQL twin
    checks by substring equality after computing the same offsets via
    token/gap window sums."""
    toks = list(_TOKEN_RE.finditer(text))
    n = len(toks)
    if n == 0:
        return []
    step = size - overlap
    out = []
    start = 0
    while True:
        end = min(start + size, n)
        out.append((" ".join(m.group(0) for m in toks[start:end]),
                    toks[start].start(), toks[end - 1].end()))
        if end >= n:
            break
        start += step
    return out


def split_sentences(text: str) -> list[str]:
    """Deterministic rule-based splitter: break after . ! ? followed by
    whitespace. No abbreviation table (fixed, documented behavior)."""
    parts = [p.strip() for p in _SENT_END.split(text)]
    return [p for p in parts if p]


def chunk_sentences(text: str, size: int, overlap: int) -> list[str]:
    """Greedy packing of whole sentences up to `size` tokens per chunk;
    each next chunk re-includes trailing sentences of the previous chunk
    totalling at least `overlap` tokens (capped at all-but-one sentence).
    A single sentence longer than `size` becomes its own chunk."""
    sents = split_sentences(text)
    if not sents:
        return []
    lens = [len(tokenize(s)) for s in sents]
    chunks: list[str] = []
    i = 0
    n = len(sents)
    while i < n:
        j = i
        total = 0
        while j < n and (j == i or total + lens[j] <= size):
            total += lens[j]
            j += 1
        chunks.append(" ".join(tokenize(" ".join(sents[i:j]))))
        if j >= n:
            break
        # back up for overlap
        if overlap > 0:
            k = j
            otot = 0
            while k > i + 1 and otot < overlap:
                k -= 1
                otot += lens[k]
            i = k
        else:
            i = j
    return chunks


def chunk_recursive(text: str, size: int) -> list[str]:
    """Hierarchical split (paragraph → line → sentence → token window),
    then greedy merge of adjacent pieces up to `size` tokens. No overlap
    (mirrors RecursiveChunker taking no overlap, app.py:419-420)."""
    pieces = _recursive_split(text, size, 0)
    # greedy merge
    out: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for p in pieces:
        plen = len(tokenize(p))
        if cur and cur_len + plen > size:
            out.append(" ".join(tokenize(" ".join(cur))))
            cur, cur_len = [], 0
        cur.append(p)
        cur_len += plen
    if cur:
        out.append(" ".join(tokenize(" ".join(cur))))
    return [c for c in out if c]


_LEVELS = (_PARA_SPLIT, re.compile(r"\n"), _SENT_END)


def _recursive_split(text: str, size: int, level: int) -> list[str]:
    if len(tokenize(text)) <= size:
        t = text.strip()
        return [t] if t else []
    if level < len(_LEVELS):
        parts = [p for p in _LEVELS[level].split(text) if p.strip()]
        if len(parts) <= 1:
            return _recursive_split(text, size, level + 1)
        out: list[str] = []
        for p in parts:
            out.extend(_recursive_split(p, size, level + 1))
        return out
    # token-window base case
    return chunk_tokens(text, size, 0)


def chunk_text(text: str, cfg: ChunkConfig) -> list[str]:
    if cfg.strategy == "token":
        return chunk_tokens(text, cfg.chunk_size, cfg.chunk_overlap)
    if cfg.strategy == "sentence":
        return chunk_sentences(text, cfg.chunk_size, cfg.chunk_overlap)
    return chunk_recursive(text, cfg.chunk_size)
