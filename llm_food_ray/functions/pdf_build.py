"""Minimal deterministic PDF writer — fixture/synthesis side of the PDF leg.

The sandbox has no PDF libraries and no network, so test inputs are
hand-built PDFs (header, numbered objects, FlateDecode content streams with
standard text operators, xref table, trailer).  The parser in ``pdf_md.py``
and these fixtures co-evolve (SURVEY.md §7.4), keeping the supported subset
explicit: FlateDecode + BT/ET, Tf, Td/TD/Tm/T*, Tj/TJ.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

HEADING_SIZE = 24.0
SUBHEAD_SIZE = 18.0
BODY_SIZE = 12.0


@dataclass
class PageSpec:
    """One page: a list of (kind, text) where kind ∈ {h1, h2, body}."""

    lines: list = field(default_factory=list)   # list[tuple[str, str]]


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _content_stream(page: PageSpec) -> bytes:
    ops = ["BT"]
    y = 760.0
    size_of = {"h1": HEADING_SIZE, "h2": SUBHEAD_SIZE, "body": BODY_SIZE}
    first = True
    for kind, text in page.lines:
        size = size_of.get(kind, BODY_SIZE)
        ops.append(f"/F1 {size:g} Tf")
        if first:
            ops.append(f"72 {y:g} Td")
            first = False
        else:
            dy = -(size * 1.6)
            y += dy
            ops.append(f"0 {dy:g} Td")
        # latin-1-able text goes through a plain literal string; anything
        # else is encoded per char so the parser round-trips exactly
        ops.append(f"({_esc(text)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1", errors="replace")


def build_pdf(pages: list[PageSpec], compress: bool = True) -> bytes:
    """Assemble a complete single-xref PDF from page specs."""
    objects: dict[int, bytes] = {}
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, page in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objects[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {content_num} 0 R "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> >>"
        ).encode()
        data = _content_stream(page)
        if compress:
            comp = zlib.compress(data, 9)
            objects[content_num] = (
                f"<< /Length {len(comp)} /Filter /FlateDecode >>\nstream\n".encode()
                + comp
                + b"\nendstream"
            )
        else:
            objects[content_num] = (
                f"<< /Length {len(data)} >>\nstream\n".encode() + data + b"\nendstream"
            )
    objects[font_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_pos = len(out)
    max_num = max(objects)
    out += f"xref\n0 {max_num + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {max_num + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def simple_pdf(title: str, body_words: list[str], words_per_line: int = 12,
               lines_per_page: int = 40, heading_every: int = 0) -> bytes:
    """Deterministic multi-page PDF: an h1 title on page 1, body text flowed
    `words_per_line` per line, `lines_per_page` per page; optional h2 every
    `heading_every` lines."""
    lines: list[tuple[str, str]] = [("h1", title)]
    count = 0
    for i in range(0, len(body_words), words_per_line):
        if heading_every and count and count % heading_every == 0:
            lines.append(("h2", f"Section {count // heading_every}"))
        lines.append(("body", " ".join(body_words[i:i + words_per_line])))
        count += 1
    pages: list[PageSpec] = []
    for i in range(0, len(lines), lines_per_page):
        pages.append(PageSpec(lines[i:i + lines_per_page]))
    return build_pdf(pages or [PageSpec([("h1", title)])])
