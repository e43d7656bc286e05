"""Deterministic DOCX / RTF / PPTX writers — fixture side of the office
extractors (same co-evolution pattern as ``pdf_build.py``: the sandbox has
no python-docx/pptx, so test inputs are hand-built zips with pinned
timestamps and no compression → byte-stable)."""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

_FIXED_DATE = (2024, 1, 1, 0, 0, 0)

_CONTENT_TYPES_DOCX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_W_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
_A_NS = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'


def _zip_bytes(entries: list[tuple[str, str]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, content in entries:
            info = zipfile.ZipInfo(name, date_time=_FIXED_DATE)
            zf.writestr(info, content)
    return buf.getvalue()


def build_docx(blocks: list[tuple[str, str]]) -> bytes:
    """blocks: (kind, text) with kind ∈ {h1..h6, p, li, b, i}."""
    paras = []
    for kind, text in blocks:
        t = escape(text)
        ppr = run_pr = ""
        if kind.startswith("h") and kind[1:].isdigit():
            ppr = f'<w:pPr><w:pStyle w:val="Heading{kind[1:]}"/></w:pPr>'
        elif kind == "li":
            ppr = ("<w:pPr><w:numPr><w:ilvl w:val=\"0\"/>"
                   "<w:numId w:val=\"1\"/></w:numPr></w:pPr>")
        elif kind == "b":
            run_pr = "<w:rPr><w:b/></w:rPr>"
        elif kind == "i":
            run_pr = "<w:rPr><w:i/></w:rPr>"
        paras.append(
            f"<w:p>{ppr}<w:r>{run_pr}<w:t xml:space=\"preserve\">{t}</w:t>"
            "</w:r></w:p>"
        )
    doc = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f"<w:document {_W_NS}><w:body>{''.join(paras)}</w:body></w:document>"
    )
    return _zip_bytes([
        ("[Content_Types].xml", _CONTENT_TYPES_DOCX),
        ("word/document.xml", doc),
    ])


def build_rtf(paragraphs: list[str]) -> bytes:
    r"""Minimal RTF: header with a skipped font table, \par-separated text."""
    def esc(s: str) -> str:
        out = []
        for ch in s:
            if ch in "\\{}":
                out.append("\\" + ch)
            elif ord(ch) > 127:
                # \uc1 is in force (writer default): emit one '?' ANSI
                # fallback char after each \uN, per the RTF spec
                out.append(f"\\u{ord(ch)} ?")
            else:
                out.append(ch)
        return "".join(out)

    body = "\\par ".join(esc(p) for p in paragraphs)
    return (
        "{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Helvetica;}}"
        "{\\*\\generator synthetic;}" + body + "}"
    ).encode("latin-1")


def build_pptx(slides: list[list[str]]) -> bytes:
    """slides: list of per-slide paragraph lists (empty list → no text)."""
    entries = [(
        "[Content_Types].xml",
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        "</Types>",
    )]
    for i, paras in enumerate(slides, start=1):
        body = "".join(
            f"<a:p><a:r><a:t>{escape(p)}</a:t></a:r></a:p>" for p in paras
        )
        xml = (
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f"<p:sld xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\" "
            f"{_A_NS}><p:cSld><p:spTree><p:sp><p:txBody>{body}</p:txBody>"
            "</p:sp></p:spTree></p:cSld></p:sld>"
        )
        entries.append((f"ppt/slides/slide{i}.xml", xml))
    return _zip_bytes(entries)
