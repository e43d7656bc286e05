"""DOCX / RTF / PPTX extraction (M8/M9/M10) — stdlib only.

Mirrors the reference's per-format contracts:

- DOCX (llm_food/app.py:215-222): ``mammoth.convert_to_html`` →
  ``markdownify(html).strip()`` → ONE markdown string (single-element
  ``texts``).  Here: unzip ``word/document.xml``, walk ``w:p``
  paragraphs; Heading<N> styles → ``#`` headings, ``w:numPr`` list
  paragraphs → ``- `` items, bold/italic runs → ``**``/``*`` markup.
- RTF (llm_food/app.py:225-229): ``striprtf.rtf_to_text`` → plain text.
  Here: a control-word machine (groups, destinations skipped, ``\\par``
  newlines, ``\\'xx`` hex and ``\\uN`` unicode escapes).
- PPTX (llm_food/app.py:232-249): per slide, the text of shapes that
  have text joined ``"\\n"``; slides without text skipped; no text at
  all → ``[""]``.  Here: unzip ``ppt/slides/slideN.xml`` in slide-number
  order; one ``<a:p>`` per line, runs of ``<a:t>`` concatenated.

Everything deterministic; fixtures built by ``office_build.py`` co-evolve
with these parsers (same pattern as pdf_build/pdf_md).
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"


class OfficeError(ValueError):
    pass


# ---------------------------------------------------------------- docx ----


def docx_markdown(payload: bytes) -> str:
    """DOCX bytes → one markdown string (M8 contract)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        xml = zf.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError, OSError) as exc:
        raise OfficeError(f"bad docx: {exc}") from exc
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as exc:
        raise OfficeError(f"bad docx xml: {exc}") from exc
    blocks: list[str] = []
    for p in root.iter(f"{_W}p"):
        style = ""
        ppr = p.find(f"{_W}pPr")
        is_list = False
        if ppr is not None:
            st = ppr.find(f"{_W}pStyle")
            if st is not None:
                style = st.get(f"{_W}val", "") or ""
            is_list = ppr.find(f"{_W}numPr") is not None
        parts: list[str] = []
        for r in p.iter(f"{_W}r"):
            text = "".join(t.text or "" for t in r.iter(f"{_W}t"))
            if not text:
                continue
            rpr = r.find(f"{_W}rPr")
            if rpr is not None:
                if rpr.find(f"{_W}b") is not None:
                    text = f"**{text}**"
                elif rpr.find(f"{_W}i") is not None:
                    text = f"*{text}*"
            parts.append(text)
        text = "".join(parts).strip()
        if not text:
            continue
        m = re.fullmatch(r"[Hh]eading(\d)", style)
        if m:
            blocks.append("#" * min(int(m.group(1)), 6) + " " + text)
        elif is_list:
            blocks.append("- " + text)
        else:
            blocks.append(text)
    return "\n\n".join(blocks).strip()


# ----------------------------------------------------------------- rtf ----

_RTF_TOKEN = re.compile(
    rb"\\'([0-9a-fA-F]{2})"        # hex escape
    rb"|\\u(-?\d+)\s?"             # unicode escape (optional space delim)
    rb"|\\([a-zA-Z]+)(-?\d+)? ?"   # control word (optional numeric arg)
    rb"|\\([^a-zA-Z])"             # control symbol
    rb"|([{}])"                    # group delimiters
)

# Destinations whose content never reaches the text (striprtf's list).
_RTF_DESTINATIONS = frozenset((
    b"fonttbl", b"colortbl", b"stylesheet", b"info", b"header", b"footer",
    b"headerl", b"headerr", b"headerf", b"footerl", b"footerr", b"footerf",
    b"pict", b"object", b"field", b"xe", b"tc", b"generator", b"themedata",
    b"colorschememapping", b"datastore", b"latentstyles", b"listtable",
    b"listoverridetable", b"rsidtbl", b"filetbl", b"revtbl",
))
_RTF_NEWLINE_WORDS = frozenset((b"par", b"line", b"sect", b"page"))
_RTF_TAB_WORDS = frozenset((b"tab", b"cell"))


def rtf_to_text(payload: bytes) -> str:
    """RTF bytes → plain text (M9 contract, striprtf-style)."""
    data = payload
    if not data.lstrip()[:5].startswith(b"{\\rtf"):
        raise OfficeError("not an RTF document")
    out: list[str] = []
    pos = 0
    n = len(data)
    skip_depth = 0       # >0 → inside a skipped destination group
    depth = 0
    pending_skip = False  # \* seen: next destination group is skipped
    uc = 1               # \ucN: ANSI fallback chars after each \uN (striprtf honors this; default 1)
    uc_stack: list[int] = []
    skip_fb = 0          # fallback chars still to consume after a \uN
    while pos < n:
        m = _RTF_TOKEN.search(data, pos)
        if m is None:
            if not skip_depth:
                tail = data[pos:].decode("latin-1")
                out.append(tail[skip_fb:])
                skip_fb = 0
            break
        if m.start() > pos and not skip_depth:
            text = data[pos:m.start()].decode("latin-1")
            if skip_fb:
                drop = min(skip_fb, len(text))
                text = text[drop:]
                skip_fb -= drop
            out.append(text)
        pos = m.end()
        hex_esc, uni, word, arg, sym, brace = m.groups()
        if brace is not None:
            if brace == b"{":
                depth += 1
                uc_stack.append(uc)
                if pending_skip:
                    skip_depth = skip_depth or depth
                    pending_skip = False
            else:
                if skip_depth and depth == skip_depth:
                    skip_depth = 0
                depth -= 1
                if uc_stack:
                    uc = uc_stack.pop()
            skip_fb = 0
            continue
        if skip_depth:
            continue
        if hex_esc is not None:
            if skip_fb:          # \'xx counts as ONE fallback char
                skip_fb -= 1
            else:
                out.append(bytes([int(hex_esc, 16)]).decode("latin-1"))
        elif uni is not None:
            code = int(uni)
            out.append(chr(code + 65536 if code < 0 else code))
            skip_fb = uc         # consume the ANSI fallback that follows
        elif word is not None:
            skip_fb = 0          # a control word ends the fallback region
            if word == b"uc" and arg is not None:
                uc = max(0, int(arg))
            elif word in _RTF_DESTINATIONS:
                skip_depth = depth or 1
            elif word in _RTF_NEWLINE_WORDS:
                out.append("\n")
            elif word in _RTF_TAB_WORDS:
                out.append("\t")
            # other control words: formatting — dropped
        elif sym is not None:
            skip_fb = 0
            if sym in (b"\\", b"{", b"}"):
                out.append(sym.decode("latin-1"))
            elif sym == b"~":
                out.append(" ")
            elif sym == b"*":
                pending_skip = True
            elif sym in (b"\n", b"\r"):
                out.append("\n")
        # strip newlines that are purely source formatting
    text = "".join(out)
    text = re.sub(r"[\r]", "", text)
    return text.strip()


# ---------------------------------------------------------------- pptx ----

_SLIDE_RE = re.compile(r"ppt/slides/slide(\d+)\.xml$")


def pptx_slide_texts(payload: bytes) -> list[str]:
    """PPTX bytes → per-slide text list (M10 contract): one string per
    slide that has text (paragraphs joined by newline); ``[""]`` if no
    slide has any text (app.py:247-249)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except (zipfile.BadZipFile, OSError) as exc:
        raise OfficeError(f"bad pptx: {exc}") from exc
    slides: list[tuple[int, str]] = []
    for name in zf.namelist():
        m = _SLIDE_RE.match(name)
        if m:
            slides.append((int(m.group(1)), name))
    out: list[str] = []
    for _num, name in sorted(slides):
        try:
            root = ET.fromstring(zf.read(name))
        except (ET.ParseError, KeyError) as exc:
            raise OfficeError(f"bad slide xml: {exc}") from exc
        lines: list[str] = []
        for para in root.iter(f"{_A}p"):
            text = "".join(t.text or "" for t in para.iter(f"{_A}t"))
            if text.strip():
                lines.append(text)
        if lines:
            out.append("\n".join(lines))
    return out or [""]
