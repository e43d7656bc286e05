"""Text analysis primitives for large-scale training-data pipelines:
language ID (stopword/n-gram heuristic), quality scoring, token counting,
all deterministic and vectorizable per batch.
"""

from __future__ import annotations

import re

# Tiny per-language stopword profiles (public common-word lists); scoring
# is a coverage ratio — deterministic, dependency-free n-gram heuristic.
_LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the of and to a in is that it for on with as are was be this have from or by".split()),
    "de": frozenset("der die das und ist nicht ein eine zu den von mit auf für im sich des dem".split()),
    "es": frozenset("el la los las de que y en un una es no por con para del se su al como".split()),
    "fr": frozenset("le la les de des et un une est que pour dans qui au du sur ne pas ce".split()),
    "tr": frozenset("bir ve bu da de için ile olarak çok daha en gibi sonra kadar ama ben".split()),
}

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)
_BPE_ISH_RE = re.compile(r"\w+|[^\w\s]")
_PUNCT_RE = re.compile(r"[^\w\s]")

_EN_STOP = _LANG_PROFILES["en"]


def detect_lang(text: str) -> str:
    """Best stopword-coverage language, 'und' (undetermined) if nothing
    matches or text is empty. Ties break by fixed profile order."""
    toks = [t.lower() for t in _TOKEN_RE.findall(text)]
    if not toks:
        return "und"
    best_lang, best = "und", 0.0
    for lang, stops in _LANG_PROFILES.items():
        hits = sum(1 for t in toks if t in stops)
        score = hits / len(toks)
        if score > best:
            best_lang, best = lang, score
    return best_lang if best > 0.02 else "und"


def token_count(text: str) -> int:
    """Whitespace token count (matches SQL len(string_split(text,' '))
    on single-space-normalized text)."""
    return len(text.split())


def bpe_ish_token_count(text: str) -> int:
    """Word + punctuation token count (a BPE-ish upper bound proxy)."""
    return len(_BPE_ISH_RE.findall(text))


def quality_features(text: str) -> dict:
    """Deterministic quality signals: length, mean word length,
    punctuation ratio, stopword ratio, uppercase ratio, digit ratio."""
    n_chars = len(text)
    words = text.split()
    n_words = len(words)
    alpha = sum(1 for c in text if c.isalpha())
    upper = sum(1 for c in text if c.isupper())
    digits = sum(1 for c in text if c.isdigit())
    punct = len(_PUNCT_RE.findall(text))
    stop_hits = sum(1 for w in words if w.lower() in _EN_STOP)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": (sum(len(w) for w in words) / n_words) if n_words else 0.0,
        "punct_ratio": punct / n_chars if n_chars else 0.0,
        "stopword_ratio": stop_hits / n_words if n_words else 0.0,
        "upper_ratio": upper / alpha if alpha else 0.0,
        "digit_ratio": digits / n_chars if n_chars else 0.0,
    }


def quality_score(text: str) -> float:
    """Single [0,1] quality score from the features (fixed weights):
    rewards mid-length docs, real words, some stopwords, low punctuation
    noise. Deterministic; documented formula, not a model."""
    f = quality_features(text)
    if f["n_words"] == 0:
        return 0.0
    length_term = min(1.0, f["n_words"] / 100.0)
    stop_term = min(1.0, f["stopword_ratio"] / 0.3)
    punct_pen = max(0.0, 1.0 - 4.0 * f["punct_ratio"])
    wordlen = f["mean_word_len"]
    wordlen_term = 1.0 if 3.0 <= wordlen <= 10.0 else 0.5 if wordlen > 0 else 0.0
    return round(0.4 * length_term + 0.3 * stop_term + 0.2 * punct_pen + 0.1 * wordlen_term, 6)


# explicit codepoint ranges — NOT \p{Script} classes, whose tables vary
# by regex-engine version; both engines count exactly these intervals
SCRIPT_RANGES = {
    "latin": ((0x41, 0x5A), (0x61, 0x7A)),
    "digit": ((0x30, 0x39),),
    "cyrillic": ((0x400, 0x4FF),),
    "han": ((0x4E00, 0x9FFF),),
    "arabic": ((0x600, 0x6FF),),
}


def script_fractions(texts: list, digits: int = 6):
    """Per-document script composition: for every document the fraction
    of its codepoints falling in each ``SCRIPT_RANGES`` class (denom =
    total codepoints; empty docs → 0.0 everywhere).  One utf-32 encode
    of the batch + vectorized range masks + one bincount per class —
    no Python per-character work.  Returns (n_chars, {script: frac
    array}) with round-``digits`` fractions."""
    import numpy as np

    joined = "\x00".join(t or "" for t in texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), np.uint32)
    lens = np.fromiter((len(t or "") for t in texts), np.int64,
                       len(texts))
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens + 1)
    if len(doc_of):
        doc_of = doc_of[:len(cp)]
    out = {}
    denom = np.maximum(lens, 1).astype(np.float64)
    for name, ranges in SCRIPT_RANGES.items():
        mask = np.zeros(len(cp), bool)
        for lo, hi in ranges:
            mask |= (cp >= lo) & (cp <= hi)
        counts = np.bincount(doc_of[mask], minlength=len(texts))
        frac = counts / denom
        frac[lens == 0] = 0.0
        # HALF-AWAY rounding (DuckDB's std::round), NOT Python round:
        # count/len fractions like 105/128 = 0.8203125 tie exactly at
        # the grid, where banker's rounding goes the other way
        scale = 10.0 ** digits
        out[name] = np.floor(frac * scale + 0.5) / scale
    return lens, out
