"""PDF → per-page markdown (from scratch, stdlib only).

Replaces the reference's three PDF backends with one local deterministic
parser, mirroring their contracts:

- structured mode ≈ ``pdf_oxide.PdfDocument(path).to_markdown(i,
  detect_headings=True)`` per page (llm_food/pdf_utils.py:71-75): heading
  detection by font size, reading order by y-then-x.
- plain mode ≈ ``pypdf.PdfReader(...).pages[i].extract_text() or ""``
  (llm_food/app.py:271-276): raw text lines, no markup.
- the Gemini OCR leg (llm_food/app.py:294-330) is replaced by these
  deterministic extractors per the north rule.

Supported subset (explicit, co-evolved with ``pdf_build.py``): object scan
without trusting the xref table (robust to truncation), dictionaries /
arrays / literal+hex strings / refs, FlateDecode, content-stream text
operators BT ET Tf Td TD Tm T* Tj TJ ' ".
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class PdfError(ValueError):
    pass


_NUM_TOKEN_RE = re.compile(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)")
_REF_TAIL_RE = re.compile(rb"\s+(\d+)\s+R\b")


# ------------------------------------------------------------- lexer ----


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # '%' comment to EOL
            while pos < n and data[pos] not in (0x0A, 0x0D):
                pos += 1
        else:
            break
    return pos


def _parse_value(data: bytes, pos: int):
    """Parse one PDF object value at `pos` → (value, new_pos).

    Values: dict → python dict (keys str names), array → list, name →
    "/Name" str, number → int/float, string → bytes, bool/null, indirect
    ref → ("ref", num).
    """
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise PdfError("unexpected EOF")
    c = data[pos]
    if data.startswith(b"<<", pos):
        pos += 2
        d: dict = {}
        while True:
            pos = _skip_ws(data, pos)
            if data.startswith(b">>", pos):
                return d, pos + 2
            if data[pos] != 0x2F:
                raise PdfError(f"bad dict key at {pos}")
            key, pos = _parse_value(data, pos)
            val, pos = _parse_value(data, pos)
            d[key] = val
    if c == 0x5B:  # '['
        pos += 1
        arr = []
        while True:
            pos = _skip_ws(data, pos)
            if data[pos] == 0x5D:
                return arr, pos + 1
            v, pos = _parse_value(data, pos)
            arr.append(v)
    if c == 0x2F:  # '/'
        end = pos + 1
        while end < len(data) and data[end] not in _WS and data[end] not in _DELIM:
            end += 1
        return data[pos + 1:end].decode("latin-1"), end
    if c == 0x28:  # '(' literal string
        return _parse_literal_string(data, pos)
    if c == 0x3C:  # '<' hex string
        end = data.index(b">", pos)
        hexstr = re.sub(rb"\s", b"", data[pos + 1:end])
        if len(hexstr) % 2:
            hexstr += b"0"
        return bytes.fromhex(hexstr.decode("latin-1")), end + 1
    if data.startswith(b"true", pos):
        return True, pos + 4
    if data.startswith(b"false", pos):
        return False, pos + 5
    if data.startswith(b"null", pos):
        return None, pos + 4
    # number or indirect reference "N G R"
    m = _NUM_TOKEN_RE.match(data, pos)
    if not m:
        raise PdfError(f"cannot parse value at {pos}: {data[pos:pos+16]!r}")
    tok = m.group(0)
    end = m.end()
    if b"." not in tok:
        # lookahead for "G R"
        m2 = _REF_TAIL_RE.match(data, end, end + 16)
        if m2:
            return ("ref", int(tok)), m2.end()
        return int(tok), end
    return float(tok), end


def _parse_literal_string(data: bytes, pos: int):
    assert data[pos] == 0x28
    # fast path: no escapes and no nested parens (the overwhelmingly
    # common case) → one find + slice instead of a per-byte loop
    end = data.find(b")", pos + 1)
    if end > 0:
        seg = data[pos + 1:end]
        if b"\\" not in seg and b"(" not in seg:
            return seg, end + 1
    pos += 1
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = data[pos]
            mapping = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}
            if e in mapping:
                out.append(mapping[e])
                pos += 1
            elif e in (0x28, 0x29, 0x5C):
                out.append(e)
                pos += 1
            elif 0x30 <= e <= 0x37:  # octal up to 3 digits
                oct_digits = bytearray()
                while pos < n and len(oct_digits) < 3 and 0x30 <= data[pos] <= 0x37:
                    oct_digits.append(data[pos])
                    pos += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                pos += 1
                if e == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:
                out.append(e)
                pos += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    raise PdfError("unterminated string")


# ----------------------------------------------------------- document ----

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


@dataclass
class PdfDocument:
    objects: dict   # num -> (value, stream_bytes | None)

    def resolve(self, v):
        seen = 0
        while isinstance(v, tuple) and len(v) == 2 and v[0] == "ref":
            entry = self.objects.get(v[1])
            if entry is None:
                return None
            v = entry[0]
            seen += 1
            if seen > 32:
                raise PdfError("reference cycle")
        return v

    # page traversal -----------------------------------------------------
    def page_streams(self) -> list[bytes]:
        """Decoded content-stream bytes per page, document order."""
        root = None
        for num, (val, _stream) in sorted(self.objects.items()):
            if isinstance(val, dict) and val.get("Type") == "Catalog":
                root = val
                break
        if root is None:
            raise PdfError("no /Catalog")
        pages_val = self.resolve(root.get("Pages"))
        if not isinstance(pages_val, dict):
            raise PdfError("no /Pages")
        leaves: list[dict] = []
        self._walk_pages(pages_val, leaves, 0)
        out = []
        for page in leaves:
            contents = self.resolve(page.get("Contents"))
            parts: list[bytes] = []
            refs = contents if isinstance(contents, list) else [page.get("Contents")]
            for ref in refs:
                stream = self._stream_for(ref)
                if stream is not None:
                    parts.append(stream)
            out.append(b"\n".join(parts))
        return out

    def _walk_pages(self, node: dict, out: list, depth: int) -> None:
        if depth > 64:
            raise PdfError("pages tree too deep")
        ntype = node.get("Type")
        if ntype == "Page":
            out.append(node)
            return
        for kid in node.get("Kids", []) or []:
            kid_val = self.resolve(kid)
            if isinstance(kid_val, dict):
                self._walk_pages(kid_val, out, depth + 1)

    def _stream_for(self, ref):
        if isinstance(ref, tuple) and ref[0] == "ref":
            entry = self.objects.get(ref[1])
        else:
            return None
        if entry is None:
            return None
        val, stream = entry
        if stream is None:
            return None
        filt = val.get("Filter") if isinstance(val, dict) else None
        filters = filt if isinstance(filt, list) else ([filt] if filt else [])
        data = stream
        for f in filters:
            if f == "FlateDecode":
                data = zlib.decompress(data)
            else:
                raise PdfError(f"unsupported filter {f}")
        return data


def parse_pdf(data: bytes) -> PdfDocument:
    """Parse by scanning `N G obj` sites (the xref table is not trusted —
    robust to truncated / regenerated files)."""
    if not data.startswith(b"%PDF-"):
        raise PdfError("not a PDF (missing %PDF- header)")
    objects: dict = {}
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        pos = m.end()
        try:
            val, pos = _parse_value(data, pos)
        except PdfError:
            continue
        stream_bytes = None
        pos = _skip_ws(data, pos)
        if data.startswith(b"stream", pos):
            pos += len(b"stream")
            if data.startswith(b"\r\n", pos):
                pos += 2
            elif data.startswith(b"\n", pos):
                pos += 1
            length = val.get("Length") if isinstance(val, dict) else None
            if isinstance(length, tuple):  # indirect /Length — resolve later pass
                length = None
            if isinstance(length, int) and pos + length <= len(data):
                stream_bytes = data[pos:pos + length]
            else:
                end = data.find(b"endstream", pos)
                if end < 0:
                    continue
                stream_bytes = data[pos:end].rstrip(b"\r\n")
        objects[num] = (val, stream_bytes)
    if not objects:
        raise PdfError("no objects found")
    return PdfDocument(objects)


# ------------------------------------------------- content-stream text ----

_NUM_RE = re.compile(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)")


@dataclass
class TextRun:
    x: float
    y: float
    size: float
    text: str


def extract_runs(content: bytes) -> list[TextRun]:
    """Execute the text-positioning subset of the content stream."""
    runs: list[TextRun] = []
    pos = 0
    n = len(content)
    stack: list = []   # operand stack
    x = y = 0.0
    lx = ly = 0.0      # line start (Td/TD move relative to this)
    size = 0.0
    leading = 0.0
    while pos < n:
        pos = _skip_ws(content, pos)
        if pos >= n:
            break
        c = content[pos]
        if c == 0x28:
            s, pos = _parse_literal_string(content, pos)
            stack.append(s)
            continue
        if c == 0x3C and not content.startswith(b"<<", pos):
            end = content.index(b">", pos)
            hexstr = re.sub(rb"\s", b"", content[pos + 1:end])
            if len(hexstr) % 2:
                hexstr += b"0"
            stack.append(bytes.fromhex(hexstr.decode("latin-1")))
            pos = end + 1
            continue
        if c == 0x5B:
            arr, pos = _parse_value(content, pos)
            stack.append(arr)
            continue
        if c == 0x2F:
            v, pos = _parse_value(content, pos)
            stack.append(v)
            continue
        m = _NUM_RE.match(content, pos)
        if m and m.start() == pos:
            tok = m.group(0)
            stack.append(float(tok) if b"." in tok else int(tok))
            pos = m.end()
            continue
        # operator token
        end = pos
        while end < n and content[end] not in _WS and content[end] not in _DELIM:
            end += 1
        op = content[pos:end]
        pos = end if end > pos else pos + 1
        if op == b"Tf" and len(stack) >= 2:
            size = float(stack[-1])
        elif op == b"Td" and len(stack) >= 2:
            lx += float(stack[-2]); ly += float(stack[-1]); x, y = lx, ly
        elif op == b"TD" and len(stack) >= 2:
            leading = -float(stack[-1])
            lx += float(stack[-2]); ly += float(stack[-1]); x, y = lx, ly
        elif op == b"TL" and stack:
            leading = float(stack[-1])
        elif op == b"T*":
            ly -= leading; x, y = lx, ly
        elif op == b"Tm" and len(stack) >= 6:
            lx, ly = float(stack[-2]), float(stack[-1]); x, y = lx, ly
        elif op == b"BT":
            x = y = lx = ly = 0.0
        elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
            runs.append(TextRun(x, y, size, stack[-1].decode("latin-1")))
        elif op == b"'" and stack and isinstance(stack[-1], bytes):
            ly -= leading; x, y = lx, ly
            runs.append(TextRun(x, y, size, stack[-1].decode("latin-1")))
        elif op == b'"' and stack and isinstance(stack[-1], bytes):
            ly -= leading; x, y = lx, ly
            runs.append(TextRun(x, y, size, stack[-1].decode("latin-1")))
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            text = "".join(
                el.decode("latin-1") for el in stack[-1] if isinstance(el, bytes)
            )
            runs.append(TextRun(x, y, size, text))
        stack.clear()
    return runs


# -------------------------------------------------------------- pages ----


def _lines_from_runs(runs: list[TextRun]) -> list[tuple[float, str]]:
    """Group runs into lines by y (0.5pt tolerance), reading order:
    top-to-bottom (descending y), left-to-right within a line."""
    if not runs:
        return []
    runs_sorted = sorted(runs, key=lambda r: (-r.y, r.x))
    lines: list[tuple[float, float, list[TextRun]]] = []  # (y, size, runs)
    for r in runs_sorted:
        if lines and abs(lines[-1][0] - r.y) <= 0.5:
            lines[-1][2].append(r)
        else:
            lines.append((r.y, r.size, [r]))
    out = []
    for y, _size, rs in lines:
        text = " ".join(r.text for r in rs if r.text)
        out.append((max(r.size for r in rs), text))
    return out


def page_plain_text(content: bytes) -> str:
    """Plain-text mode (M4, app.py:271-276): lines joined by newline."""
    return _lines_to_plain(_lines_from_runs(extract_runs(content)))


def page_markdown(content: bytes) -> str:
    """Structured mode (M3, pdf_utils.py:71-75): heading detection by font
    size relative to the page's modal body size (>=1.7x → #, >=1.4x → ##,
    >=1.15x → ###; modal ties → smaller size, body text dominates);
    consecutive body lines merge into one paragraph joined by spaces;
    blocks joined by blank lines."""
    return _lines_to_markdown(_lines_from_runs(extract_runs(content)))


def pdf_pages_markdown(data: bytes, structured: bool = True) -> list[str]:
    """Whole document → list of per-page markdown (models.py:17 `texts`)."""
    doc = parse_pdf(data)
    fn = page_markdown if structured else page_plain_text
    return [fn(stream) for stream in doc.page_streams()]


def pdf_pages_word_counts(data: bytes) -> list[int]:
    """Word count per page — input to the text/scanned classifier (M6)."""
    doc = parse_pdf(data)
    return [len(page_plain_text(s).split()) for s in doc.page_streams()]


def _lines_to_plain(lines: list[tuple[float, str]]) -> str:
    return "\n".join(t for _s, t in lines if t.strip())


def _lines_to_markdown(lines: list[tuple[float, str]]) -> str:
    lines = [(s, t) for s, t in lines if t.strip()]
    if not lines:
        return ""
    freq: dict[float, int] = {}
    for s, _t in lines:
        freq[s] = freq.get(s, 0) + 1
    body = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    blocks: list[str] = []
    para: list[str] = []

    def flush() -> None:
        if para:
            blocks.append(" ".join(para))
            para.clear()

    for s, t in lines:
        ratio = s / body if body else 1.0
        if ratio >= 1.15:
            flush()
            level = 1 if ratio >= 1.7 else (2 if ratio >= 1.4 else 3)
            blocks.append("#" * level + " " + t.strip())
        else:
            para.append(t.strip())
    flush()
    return "\n\n".join(blocks)


def _lines_to_markdown_layout(lines: list[tuple[float, str]]) -> str:
    """Layout-preserving markdown (M5, the pymupdf4llm-flavoured third
    backend — ``to_markdown(page_chunks=True)`` keeps source line breaks
    where pdf_oxide reflows paragraphs): heading detection identical to
    ``_lines_to_markdown``, but body lines stay one-per-line inside a
    block (joined "\\n") instead of being reflowed into one paragraph."""
    lines = [(s, t) for s, t in lines if t.strip()]
    if not lines:
        return ""
    freq: dict[float, int] = {}
    for s, _t in lines:
        freq[s] = freq.get(s, 0) + 1
    body = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    blocks: list[str] = []
    para: list[str] = []

    def flush() -> None:
        if para:
            blocks.append("\n".join(para))
            para.clear()

    for s, t in lines:
        ratio = s / body if body else 1.0
        if ratio >= 1.15:
            flush()
            level = 1 if ratio >= 1.7 else (2 if ratio >= 1.4 else 3)
            blocks.append("#" * level + " " + t.strip())
        else:
            para.append(t.strip())
    flush()
    return "\n\n".join(blocks)


_SERIALIZERS = {
    "structured": _lines_to_markdown,
    "structured_layout": _lines_to_markdown_layout,
    "plain": _lines_to_plain,
}


def pdf_extract(data: bytes, backend: str = "auto",
                classifier=None) -> tuple[list[str], bool]:
    """One-parse extraction: (per-page markdown, structured_used).

    ``backend`` is a canonical mode: "structured" (reflowed markdown),
    "structured_layout" (line-preserving markdown, M5), "plain", or
    "auto" (classifier routes structured vs plain).  Reference backend
    names resolve to these in ``config.ExtractConfig``.

    Parses the document and runs the content streams ONCE; the
    text/scanned classifier (M6) consumes the same per-page lines that
    the serializer uses (the two-pass pdf_pages_word_counts +
    pdf_pages_markdown path parses every object twice)."""
    from .pdf_classify import is_text_based

    doc = parse_pdf(data)
    page_lines = [_lines_from_runs(extract_runs(s)) for s in doc.page_streams()]
    if backend == "auto":
        counts = [len(_lines_to_plain(lines).split()) for lines in page_lines]
        mode = "structured" if is_text_based(counts, classifier) else "plain"
    else:
        mode = backend
    fn = _SERIALIZERS[mode]
    return [fn(lines) for lines in page_lines], mode != "plain"
