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
