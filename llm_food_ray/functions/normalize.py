"""Deterministic text normalization — the hygiene map that runs before
tokenization / dedup in a training-data pipeline.

The reference decodes with ``errors="ignore"`` and otherwise passes text
through verbatim (llm_food/app.py:227,256,476); at corpus scale the same
step grows three more rules, each chosen to be reproducible bit-for-bit
in ANSI SQL (DuckDB ``nfc_normalize`` + RE2 ``regexp_replace``):

1. Unicode NFC normalization (combining sequences composed).
2. C0/C1 control characters stripped (whitespace controls excluded —
   they are handled by rule 3).
3. Whitespace runs (space, tab, CR, LF, FF, VT) collapsed to a single
   space; leading/trailing whitespace trimmed.

Rule order matters and is part of the contract: NFC first (so controls
introduced by decomposition would still be caught), then control strip,
then whitespace collapse + trim.
"""

from __future__ import annotations

import re
import unicodedata

# \x09-\x0d are whitespace (rule 3); everything else below 0x20 plus DEL
# is stripped.  Kept in sync with the SQL oracle's character class.
_CTRL_RE = re.compile(r"[\x00-\x08\x0e-\x1f\x7f]")
_WS_RE = re.compile(r"[ \t\r\n\f\v]+")


def normalize_text(text: str) -> str:
    """NFC → control-strip → whitespace-collapse → trim."""
    t = unicodedata.normalize("NFC", text)
    t = _CTRL_RE.sub("", t)
    t = _WS_RE.sub(" ", t)
    return t.strip()


def canonicalize_for_dedup(col):
    """SlimPajama-style canonical form for robust exact dedup:
    lowercase, every digit run → ``0``, whitespace runs → one space,
    edges trimmed — so case flips, renumbering and reflowing don't hide
    a duplicate from the content hash.  Pure Arrow/RE2 kernels (Arrow's
    regex engine IS RE2, so ``\\d`` and the class semantics match the
    SQL twin exactly; both engines apply full-Unicode lower).

    Takes and returns an Arrow string array; zero Python per row."""
    import pyarrow as pa
    import pyarrow.compute as pc

    col = pc.utf8_lower(pc.fill_null(col.cast(pa.string()), ""))
    col = pc.replace_substring_regex(col, r"\d+", "0")
    col = pc.replace_substring_regex(col, "[ \t\r\n\f\v]+", " ")
    return pc.utf8_trim_whitespace(col)
