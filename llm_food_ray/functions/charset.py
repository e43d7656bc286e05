"""Charset sniffing + normalization for raw crawl payloads.

Real Common-Crawl HTML is NOT all utf-8 (the long tail is windows-1252,
utf-16 exports, shift-jis, …).  The extract stage itself keeps the
reference's byte-parity contract (utf-8 ``errors="ignore"``,
llm_food/app.py:252-259), so charset handling is a PRE-normalization
operator: sniff each payload's encoding deterministically, re-encode to
utf-8, and feed the standard pipeline.

Sniff order (all deterministic, no statistical guesser — the rule set
is the w3c/WHATWG encoding-sniffing prefix, which an oracle can
reproduce):

1. BOM: utf-8-sig / utf-16 LE / utf-16 BE.
2. ``<meta charset=...>`` or ``<meta http-equiv=Content-Type ...>`` in
   the first 1024 bytes (ASCII-compatible scan, the HTML5 prescan).
3. Strict utf-8 decode succeeds → utf-8.
4. Fallback: windows-1252 (the web's de-facto latin default — decodes
   every byte string, so normalization is total).
"""

from __future__ import annotations

import codecs
import re

_META_RE = re.compile(
    rb"""<meta[^>]+?charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""",
    re.IGNORECASE)

_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "latin-1": "windows-1252",   # WHATWG: latin-1 label maps to 1252
    "latin1": "windows-1252",
    "iso-8859-1": "windows-1252",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def detect_charset(payload: bytes) -> str:
    """→ canonical charset name for a raw HTML/text payload."""
    if payload.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if payload.startswith(codecs.BOM_UTF16_LE):
        return "utf-16"          # python utf-16 consumes the BOM
    if payload.startswith(codecs.BOM_UTF16_BE):
        return "utf-16"
    m = _META_RE.search(payload[:1024])
    if m:
        label = m.group(1).decode("ascii", errors="ignore").lower()
        if label in _ALIASES:
            return _ALIASES[label]
    try:
        payload.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def to_utf8(payload: bytes) -> tuple[bytes, str]:
    """→ (utf-8 re-encoded payload, detected charset).  Total: every
    byte string decodes (1252 maps all 256 bytes; undecodable bytes in
    a DECLARED charset fall back with ``errors="replace"`` rather than
    crashing the shard)."""
    cs = detect_charset(payload)
    try:
        text = payload.decode(cs)
    except UnicodeDecodeError:
        text = payload.decode(cs, errors="replace")
    return text.encode("utf-8"), cs


def fix_mojibake(text: str, max_rounds: int = 3) -> tuple[str, int]:
    """Repair utf-8-read-as-latin-1 double encoding ("café" displayed
    as "cafÃ©") — the ftfy core case, restricted to a deterministic
    provable-round-trip rule an oracle can reproduce.  One round
    applies IFF:

    (i)   every char is < U+0100 — the string COULD have come from a
          single-byte latin-1 read of some byte stream;
    (ii)  some char is ≥ U+0080 — there is something to fix; and
    (iii) the latin-1 bytes decode as STRICT utf-8 — proof the bytes
          were utf-8 all along.

    Genuine latin-1-flavoured text ("café" → ..0x66 0xE9) fails (iii)
    (0xE9 is a dangling utf-8 lead byte), so it is left alone; pure
    ASCII is a fixed point by (ii).  Rounds repeat (bounded by
    ``max_rounds``) so double-mojibake un-nests.  → (fixed, n_rounds).

    Reference parity: llm_food decodes payloads utf-8
    errors="ignore" (app.py:252-259) and silently keeps mojibake;
    this operator is the recovery pass a crawl pipeline runs ahead
    of it.  Whole-string rule only — a mixed clean/mojibake document
    has chars ≥ U+0100 alongside the damage and is (conservatively)
    untouched."""
    rounds = 0
    for _ in range(max_rounds):
        if text.isascii():
            break
        try:
            raw = text.encode("latin-1")      # fails if any char > 0xFF
        except UnicodeEncodeError:
            break
        try:
            decoded = raw.decode("utf-8")     # strict
        except UnicodeDecodeError:
            break
        text = decoded
        rounds += 1
    return text, rounds
