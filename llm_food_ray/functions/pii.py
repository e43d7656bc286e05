"""PII scrubbing — regex redaction of emails, phone numbers and IPv4
addresses, the standard hygiene pass before text lands in a training set.

No reference analogue (llm_food converts documents verbatim).  Pattern
parity: every pattern is RE2-compatible (no backrefs/lookarounds) and the
DuckDB oracle applies the SAME patterns with ``regexp_replace(..., 'g')``,
so redacted output is value-checked byte-for-byte.

Order matters and is part of the contract: emails first (an email's
domain must not be half-eaten by a later rule), then IPv4, then phones.
"""

from __future__ import annotations

import re

# RE2-compatible (applied in this order)
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = (r"\b(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
                r"(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b")
PHONE_PATTERN = (r"(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ]?"
                 r"[0-9]{3}[-. ]?[0-9]{4}\b")

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

_EMAIL_RE = re.compile(EMAIL_PATTERN)
_IPV4_RE = re.compile(IPV4_PATTERN)
_PHONE_RE = re.compile(PHONE_PATTERN)


def scrub_pii(text: str) -> str:
    """Redact emails → <EMAIL>, IPv4 → <IP>, phone numbers → <PHONE>."""
    text = _EMAIL_RE.sub(EMAIL_TOKEN, text)
    text = _IPV4_RE.sub(IP_TOKEN, text)
    text = _PHONE_RE.sub(PHONE_TOKEN, text)
    return text


def extract_entities(text: str) -> list:
    """Typed entity extraction with the scrub_pii order contract:
    emails matched first, then IPv4 on the email-redacted text, then
    phones on the IP-redacted text (so an email's digits can't double-
    match as a phone).  Returns ``(entity_type, entity, ord)`` with
    ``ord`` the 1-based within-type match index — exactly
    reconstructible in SQL via regexp_extract_all over the same
    progressively-redacted text."""
    out = []
    emails = _EMAIL_RE.findall(text)
    out.extend(("email", e, i + 1) for i, e in enumerate(emails))
    text = _EMAIL_RE.sub(EMAIL_TOKEN, text)
    ips = _IPV4_RE.findall(text)
    out.extend(("ip", e, i + 1) for i, e in enumerate(ips))
    text = _IPV4_RE.sub(IP_TOKEN, text)
    phones = _PHONE_RE.findall(text)
    out.extend(("phone", e, i + 1) for i, e in enumerate(phones))
    return out


def count_pii(text: str) -> dict:
    """Counts per category BEFORE redaction (same patterns/order —
    counted on the progressively redacted text exactly as scrub_pii
    would consume it)."""
    n_email = len(_EMAIL_RE.findall(text))
    text = _EMAIL_RE.sub(EMAIL_TOKEN, text)
    n_ip = len(_IPV4_RE.findall(text))
    text = _IPV4_RE.sub(IP_TOKEN, text)
    n_phone = len(_PHONE_RE.findall(text))
    return {"n_email": n_email, "n_ip": n_ip, "n_phone": n_phone}
