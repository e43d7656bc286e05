"""HTML → markdown main-content extraction (from scratch, stdlib only).

Re-implements the *operator contract* of the reference's HTML leg
(``llm_food/app.py:252-259``: ``trafilatura.extract(html, output_format=
"markdown")``, ``None`` → ``""``, bytes decoded utf-8 ``errors="ignore"``)
without the library: an ``html.parser`` DOM, readability/trafilatura-style
candidate scoring (text density, link density, tag/class hints), then a
deterministic markdown serializer that also emits per-block character
spans into the final string.

Everything is deterministic: fixed heuristic tables, no wall-clock, no
randomness — required for byte-identity under parallelism.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape
from html.parser import HTMLParser
from typing import Optional

# ---------------------------------------------------------------- DOM ----

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# Subtrees never contributing content (always dropped).
DROP_TAGS = frozenset(
    "script style noscript template iframe svg form button select option "
    "object applet canvas audio video map head".split()
)
# Structural boilerplate: dropped during serialization of the selected
# candidate (they may *contain* the candidate, but never appear inside it
# as content).
BOILERPLATE_TAGS = frozenset("nav footer aside menu dialog".split())

BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 ul ol li pre blockquote table tr td th div "
    "article section main body header footer nav aside figure figcaption "
    "details summary dl dt dd".split()
)

NEGATIVE_RE = re.compile(
    r"nav|navbar|menu|footer|footnote|sidebar|side-bar|comment|promo|advert|"
    r"\bad\b|ad-|-ad\b|ads\b|banner|breadcrumb|share|social|sponsor|shopping|"
    r"widget|related|pager|pagination|popup|cookie|subscribe|masthead",
    re.I,
)
POSITIVE_RE = re.compile(
    r"article|\bbody\b|content|entry|hentry|\bmain\b|page|post|text|blog|story",
    re.I,
)

CANDIDATE_TAGS = frozenset("article main body div section td".split())


@dataclass
class Node:
    tag: str                      # "" for text nodes
    attrs: dict = field(default_factory=dict)
    children: list = field(default_factory=list)   # list[Node]
    text: str = ""                # only for text nodes (tag == "")

    @property
    def is_text(self) -> bool:
        return self.tag == ""


class _TreeBuilder(HTMLParser):
    """Lenient DOM builder: unmatched closes ignored, void tags auto-closed,
    DROP_TAGS subtrees skipped entirely at parse time."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]
        self._drop_depth = 0
        self._drop_tag_stack: list[str] = []

    def handle_starttag(self, tag, attrs):
        if self._drop_depth:
            if tag in DROP_TAGS or tag == self._drop_tag_stack[-1]:
                # nested droppable opens tracked so the matching close
                # doesn't prematurely end the drop region
                if tag == self._drop_tag_stack[-1]:
                    self._drop_tag_stack.append(tag)
            return
        if tag in DROP_TAGS:
            self._drop_depth = 1
            self._drop_tag_stack = [tag]
            return
        # attrs arrives as a pair list from html.parser and as a ready
        # dict from the fast lexer
        node = Node(tag, attrs if isinstance(attrs, dict) else dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if self._drop_depth or tag in DROP_TAGS:
            return
        self.stack[-1].children.append(
            Node(tag, attrs if isinstance(attrs, dict) else dict(attrs)))

    def handle_endtag(self, tag):
        if self._drop_depth:
            if tag == self._drop_tag_stack[-1]:
                self._drop_tag_stack.pop()
                if not self._drop_tag_stack:
                    self._drop_depth = 0
            return
        # pop to the matching open tag if present; ignore otherwise
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if self._drop_depth or not data:
            return
        self.stack[-1].children.append(Node("", text=data))

    def handle_comment(self, data):   # comments dropped
        return


# Raw-text elements: content is opaque text until the matching close tag
# (html.parser's CDATA content mode, html/parser.py set_cdata_mode).
_RAWTEXT_TAGS = frozenset(("script", "style"))
_RAWTEXT_CLOSE = {t: re.compile(rf"</\s*{t}", re.I) for t in _RAWTEXT_TAGS}

_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|\Z)"                                   # comment
    r"|<!\[CDATA\[.*?(?:\]\]>|\Z)"                         # CDATA section
    r"|<![^>]*(?:>|\Z)"                                    # doctype/declaration
    r"|<\?[^>]*(?:>|\Z)"                                   # processing instr
    r"|</\s*([a-zA-Z][-.\w:]*)[^>]*(?:>|\Z)"               # end tag
    r"|<([a-zA-Z][-.\w:]*)"                                # start tag name
    r"((?:\"[^\"]*\"|'[^']*'|[^\"'>])*)(?:>|\Z)",          # ...attrs
    re.S,
)

_ATTR_RE = re.compile(
    r"([^\s/=>]+)(?:\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?"
)

_AMP_RE = re.compile(r"&")


def _unescape(text: str) -> str:
    # html.unescape is regex-heavy; most text has no entities — skip it
    return unescape(text) if "&" in text else text


def _parse_attrs(raw: str) -> tuple[dict, bool]:
    """Attr string → ({name: value}, self_closing). Names lowercased,
    values entity-unescaped (mirrors html.parser)."""
    self_closing = raw.endswith("/")
    if self_closing:
        raw = raw[:-1]
    attrs: dict = {}
    if raw and not raw.isspace():
        for m in _ATTR_RE.finditer(raw):
            name = m.group(1).lower()
            if m.group(2) is None:
                val = None          # bare attr, html.parser yields None
            elif m.group(3) is not None:
                val = m.group(3)
            elif m.group(4) is not None:
                val = m.group(4)
            else:
                val = m.group(5) or ""
            attrs[name] = _unescape(val) if val else val   # last wins, like dict(attrs)
    return attrs, self_closing


def _fast_feed(builder: _TreeBuilder, text: str) -> None:
    """Single-pass lexer emitting the same handler calls html.parser would
    (for the subset that matters to the extractor: tags, text, comments,
    raw-text script/style, entity unescaping)."""
    pos = 0
    n = len(text)
    search = _TOKEN_RE.search
    while pos < n:
        m = search(text, pos)
        if m is None:
            builder.handle_data(_unescape(text[pos:]))
            break
        start = m.start()
        if start > pos:
            builder.handle_data(_unescape(text[pos:start]))
        pos = m.end()
        end_name, start_name = m.group(1), m.group(2)
        if start_name is not None:
            tag = start_name.lower()
            attrs, self_closing = _parse_attrs(m.group(3) or "")
            if self_closing:
                builder.handle_startendtag(tag, attrs)
            else:
                builder.handle_starttag(tag, attrs)
                if tag in _RAWTEXT_TAGS:
                    # opaque content until the matching close tag
                    m2 = _RAWTEXT_CLOSE[tag].search(text, pos)
                    if m2 is None:
                        builder.handle_endtag(tag)
                        break
                    gt = text.find(">", m2.start())
                    pos = n if gt < 0 else gt + 1
                    builder.handle_endtag(tag)
        elif end_name is not None:
            builder.handle_endtag(end_name.lower())
        # else: comment/doctype/PI/CDATA — dropped


def parse_html(html_text: str) -> Node:
    builder = _TreeBuilder()
    _fast_feed(builder, html_text)
    return builder.root


def parse_html_stdlib(html_text: str) -> Node:
    """Reference path: the stdlib html.parser tokenizer driving the same
    tree builder — kept as the differential-test oracle for the fast
    lexer (tests/test_html_md.py)."""
    builder = _TreeBuilder()
    builder.feed(html_text)
    builder.close()
    return builder.root


# ----------------------------------------------------------- scoring ----

_WS_RE = re.compile(r"\s+")


def _norm(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


def _class_id(node: Node) -> str:
    return f"{node.attrs.get('class', '') or ''} {node.attrs.get('id', '') or ''}"


def _is_negative(node: Node) -> bool:
    if node.is_text:
        return False
    if node.tag in BOILERPLATE_TAGS:
        return True
    ci = _class_id(node)
    return bool(ci.strip()) and bool(NEGATIVE_RE.search(ci)) and not POSITIVE_RE.search(ci)


def _text_and_link_len(node: Node, in_link: bool = False) -> tuple[int, int]:
    """(total normalized text chars, chars inside <a>) under `node`,
    skipping negative subtrees."""
    if node.is_text:
        n = len(_norm(node.text))
        return n, (n if in_link else 0)
    if _is_negative(node):
        return 0, 0
    total = link = 0
    child_in_link = in_link or node.tag == "a"
    for child in node.children:
        t, l = _text_and_link_len(child, child_in_link)
        total += t
        link += l
    return total, link


def _candidates(node: Node, out: list) -> None:
    if node.is_text:
        return
    if node.tag in CANDIDATE_TAGS and not _is_negative(node):
        out.append(node)
    for child in node.children:
        _candidates(child, out)


def _tl_bottom_up(node: Node, cache: dict) -> tuple[int, int]:
    """One post-order pass computing every node's (text, link) lengths —
    O(tree) total, vs re-walking each candidate's subtree top-down.
    link = text under any <a> descendant-or-self; negative subtrees are
    zeroed exactly as in _text_and_link_len."""
    if node.is_text:
        n = len(_norm(node.text))
        return n, 0
    if _is_negative(node):
        cache[id(node)] = (0, 0)
        return 0, 0
    total = link = 0
    for child in node.children:
        t, l = _tl_bottom_up(child, cache)
        total += t
        link += l
    if node.tag == "a":
        link = total
    cache[id(node)] = (total, link)
    return total, link


def score_candidate(node: Node, tl: tuple[int, int] | None = None) -> float:
    """Deterministic content score: text mass discounted by link density,
    boosted for semantic containers / positive class hints."""
    text_len, link_len = tl if tl is not None else _text_and_link_len(node)
    if text_len == 0:
        return 0.0
    link_density = link_len / text_len
    score = text_len * (1.0 - link_density)
    if node.tag in ("article", "main"):
        score *= 1.5
    ci = _class_id(node)
    if ci.strip() and POSITIVE_RE.search(ci):
        score *= 1.3
    if node.tag == "body":
        score *= 0.8   # prefer a tighter container over whole-body
    return score


def select_main(root: Node) -> Optional[Node]:
    cands: list[Node] = []
    _candidates(root, cands)
    cache: dict = {}
    _tl_bottom_up(root, cache)
    best, best_score = None, 0.0
    for c in cands:   # document order → deterministic tie-break (first wins)
        s = score_candidate(c, cache.get(id(c)))
        if s > best_score:
            best, best_score = c, s
    return best


# -------------------------------------------------------- serializer ----


def _inline_text(node: Node) -> str:
    """Serialize inline content of a block to markdown-ish text."""
    if node.is_text:
        return node.text
    if _is_negative(node) or node.tag in DROP_TAGS:
        return ""
    inner = "".join(_inline_text(c) for c in node.children)
    tag = node.tag
    if tag == "br":
        return " "
    if tag == "a":
        href = node.attrs.get("href") or ""
        label = _norm(inner)
        if not label:
            return ""
        if href and not href.startswith(("#", "javascript:")):
            return f"[{label}]({href})"
        return label
    if tag in ("strong", "b"):
        t = _norm(inner)
        return f"**{t}**" if t else ""
    if tag in ("em", "i"):
        t = _norm(inner)
        return f"*{t}*" if t else ""
    if tag == "code":
        t = _norm(inner)
        return f"`{t}`" if t else ""
    return inner


@dataclass
class Block:
    kind: str   # heading|paragraph|list|code|quote|table
    text: str


def _emit_blocks(node: Node, out: list[Block], list_depth: int = 0) -> None:
    if node.is_text:
        t = _norm(node.text)
        if t:
            out.append(Block("paragraph", t))
        return
    tag = node.tag
    if _is_negative(node) or tag in DROP_TAGS:
        return
    if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
        t = _norm(_inline_text(node))
        if t:
            out.append(Block("heading", "#" * int(tag[1]) + " " + t))
        return
    if tag == "p" or tag in ("figcaption", "summary", "dt", "dd"):
        t = _norm(_inline_text(node))
        if t:
            out.append(Block("paragraph", t))
        return
    if tag in ("ul", "ol"):
        items: list[str] = []
        ordered = tag == "ol"
        n = 0
        for child in node.children:
            if not child.is_text and child.tag == "li":
                t = _norm(_inline_text(child))
                if t:
                    n += 1
                    items.append(f"{n}. {t}" if ordered else f"- {t}")
        if items:
            out.append(Block("list", "\n".join(items)))
        return
    if tag == "pre":
        raw = "".join(_raw_text(c) for c in node.children)
        raw = raw.strip("\n")
        if raw.strip():
            out.append(Block("code", f"```\n{raw}\n```"))
        return
    if tag == "blockquote":
        t = _norm(_inline_text(node))
        if t:
            out.append(Block("quote", "> " + t))
        return
    if tag == "table":
        rows: list[str] = []
        _table_rows(node, rows)
        if rows:
            out.append(Block("table", "\n".join(rows)))
        return
    # container: recurse, grouping stray inline content into paragraphs
    inline_run: list[Node] = []

    def flush() -> None:
        if not inline_run:
            return
        t = _norm("".join(_inline_text(c) for c in inline_run))
        inline_run.clear()
        if t:
            out.append(Block("paragraph", t))

    for child in node.children:
        if not child.is_text and (child.tag in BLOCK_TAGS or child.tag in DROP_TAGS):
            flush()
            _emit_blocks(child, out, list_depth)
        else:
            inline_run.append(child)
    flush()


def _raw_text(node: Node) -> str:
    if node.is_text:
        return node.text
    return "".join(_raw_text(c) for c in node.children)


def _table_rows(node: Node, out: list[str]) -> None:
    for child in node.children:
        if child.is_text:
            continue
        if child.tag == "tr":
            cells = [
                _norm(_inline_text(c))
                for c in child.children
                if not c.is_text and c.tag in ("td", "th")
            ]
            if any(cells):
                out.append("| " + " | ".join(cells) + " |")
        else:
            _table_rows(child, out)


def extract_table_cells(html: str) -> list[tuple[int, int, int, str]]:
    """(table_idx, row_idx, col_idx, text) for every td/th cell, in
    document order — the STRUCTURED twin of the markdown table block
    (the reference flattens tables to pipe-rows via its converter,
    llm_food/app.py:252-259; a training-data pipeline also needs the
    cells as relational rows for table-QA / table-to-text corpora).

    Semantics match `_table_rows`' flattening: rows found anywhere
    inside a <table> (thead/tbody wrappers, nested tables) fold into
    that ENCLOSING table's row sequence; only rows with at least one
    non-empty cell advance row_idx; cell text is entity-unescaped and
    whitespace-normalized like every other inline run."""
    root = parse_html(html)
    tables: list[Node] = []

    def find(node: Node) -> None:
        if node.is_text:
            return
        if node.tag == "table":
            tables.append(node)
            return
        for c in node.children:
            find(c)

    find(root)
    out: list[tuple[int, int, int, str]] = []
    for t_idx, tnode in enumerate(tables):
        r = [0]

        def rows(node: Node) -> None:
            for child in node.children:
                if child.is_text:
                    continue
                if child.tag == "tr":
                    cells = [
                        _norm(_inline_text(c))
                        for c in child.children
                        if not c.is_text and c.tag in ("td", "th")
                    ]
                    if any(cells):
                        for c_idx, text in enumerate(cells):
                            out.append((t_idx, r[0], c_idx, text))
                        r[0] += 1
                else:
                    rows(child)

        rows(tnode)
    return out


# ------------------------------------------------------------- public ----


def extract_markdown(html_bytes: bytes) -> tuple[str, list[dict]]:
    """bytes → (markdown, spans).

    Contract mirrors the reference HTML leg (app.py:252-259): decode utf-8
    errors="ignore"; no extractable main content → ("", []).  Spans are
    ordered, non-overlapping ``{"start","end","kind"}`` char offsets of each
    emitted block in the returned markdown (north_rule addition).
    """
    text = html_bytes.decode("utf-8", errors="ignore")
    if not text.strip():
        return "", []
    root = parse_html(text)
    main = select_main(root)
    if main is None:
        return "", []
    blocks: list[Block] = []
    _emit_blocks(main, blocks)
    if not blocks:
        return "", []
    parts: list[str] = []
    spans: list[dict] = []
    pos = 0
    for i, b in enumerate(blocks):
        if i:
            pos += 2   # "\n\n" joiner
        spans.append({"start": pos, "end": pos + len(b.text), "kind": b.kind})
        parts.append(b.text)
        pos += len(b.text)
    return "\n\n".join(parts), spans


_A_TAG_RE = re.compile(
    r"<a\b[^>]*?href\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))[^>]*>(.*?)</a>",
    re.IGNORECASE | re.DOTALL)
_INNER_TAG_RE = re.compile(r"<[^>]+>")


def extract_links(html: str) -> list[tuple[str, str]]:
    """All anchor (href, text) pairs in document order — the outlink
    edge list for web-graph construction (host graphs, anchor-text
    corpora, PageRank-style signals).  Anchor text is tag-stripped and
    whitespace-normalized; href quoting may be double, single, or bare.
    Pure function; the Ray side runs it per batch (see ``outlinks``
    in ``__ray_entry__``)."""
    out = []
    for m in _A_TAG_RE.finditer(html):
        href = m.group(2) or m.group(3) or m.group(4) or ""
        text = " ".join(_INNER_TAG_RE.sub(" ", m.group(5)).split())
        out.append((href, text))
    return out


_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>",
                       re.IGNORECASE | re.DOTALL)
_H1_RE = re.compile(r"<h1[^>]*>(.*?)</h1>", re.IGNORECASE | re.DOTALL)


def extract_page_meta(html: str) -> dict:
    """Head/landmark metadata for corpus indexing: first <title>, first
    <h1> (both tag-stripped + whitespace-normalized) and the outlink
    count — the per-page header row a crawl index keeps alongside the
    extracted text.  Pure function; the Ray side runs it per batch."""
    def first(rx):
        m = rx.search(html)
        if not m:
            return ""
        return " ".join(_INNER_TAG_RE.sub(" ", m.group(1)).split())

    return {"title": first(_TITLE_RE), "h1": first(_H1_RE),
            "n_links": len(extract_links(html))}


def resolve_href(page_url: str, href: str) -> str:
    """Minimal absolute-URL resolution for crawl outlinks: absolute
    hrefs pass through, root-relative ('/x') join scheme://authority,
    other relative forms join the page's directory."""
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", href):
        return href
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)([^?#]*)", page_url)
    if not m:
        return href
    origin, path = m.group(1), m.group(2) or "/"
    if href.startswith("/"):
        return origin + href
    base = path.rsplit("/", 1)[0] + "/"
    return origin + base + href


# JSON-LD structured data lives in raw-text <script> blocks, which the
# DOM builder deliberately DROPS (DROP_TAGS) — so extraction is a
# dedicated raw scan over the markup, the same prescan style as
# functions/charset.py's meta sniff.
_JSONLD_RE = re.compile(
    r"<script\b[^>]*\btype\s*=\s*[\"']application/ld\+json[\"'][^>]*>"
    r"(.*?)</script\s*>",
    re.I | re.S)


def extract_jsonld(html: str) -> list[dict]:
    """All top-level JSON-LD objects on a page (schema.org structured
    data — the crawl-side metadata source for article/author/date
    sidecar tables).  A top-level JSON array contributes each dict
    element; an ``@graph`` wrapper is flattened one level (the wrapper
    itself also counts when it carries its own ``@type``).  Malformed
    JSON blocks are skipped — crawl reality, never an error.

    Reference parity: llm_food's HTML path (app.py:231-259) feeds
    markdown conversion only and discards script payloads; this is the
    structured-data sidecar a web-scale pipeline extracts alongside."""
    import json

    out: list[dict] = []
    for m in _JSONLD_RE.finditer(html):
        try:
            data = json.loads(m.group(1).strip())
        except (ValueError, RecursionError):
            continue
        items = data if isinstance(data, list) else [data]
        for it in items:
            if not isinstance(it, dict):
                continue
            graph = it.get("@graph")
            if isinstance(graph, list):
                out.extend(g for g in graph if isinstance(g, dict))
                rest = {k: v for k, v in it.items() if k != "@graph"}
                if rest.get("@type"):
                    out.append(rest)
            else:
                out.append(it)
    return out


def template_fingerprint(html: str) -> tuple[str, str]:
    """→ (md5 hex, skeleton string) of a page's STRUCTURAL skeleton:
    the pre-order tag sequence of the parsed DOM — content text,
    attributes and the dropped head/script subtrees excluded — so
    pages stamped from the same site template collide on the hash no
    matter what article text they carry.  The host×template histogram
    this keys is the standard scale signal for template/boilerplate
    clustering (hash-partition by the 16-byte digest, never the
    markup).  Deterministic: same parser, same drop rules, same walk
    on every engine."""
    import hashlib

    tags: list[str] = []

    def walk(n: Node) -> None:
        if n.tag and n.tag != "#root":
            tags.append(n.tag)
        for c in n.children:
            walk(c)

    walk(parse_html(html))
    skeleton = ",".join(tags)
    return hashlib.md5(skeleton.encode("utf-8")).hexdigest(), skeleton


# rel=canonical / robots-meta live in <head>, which the DOM builder
# drops — raw prescan like the JSON-LD and charset sniffs.
_LINK_CANON_RE = re.compile(
    r"<link\b[^>]*\brel\s*=\s*[\"']?canonical[\"']?[^>]*>", re.I)
_HREF_RE = re.compile(r"\bhref\s*=\s*[\"']?([^\s\"'>]+)", re.I)
_META_ROBOTS_RE = re.compile(
    r"<meta\b[^>]*\bname\s*=\s*[\"']?robots[\"']?[^>]*>", re.I)
_CONTENT_VAL_RE = re.compile(r"\bcontent\s*=\s*[\"']([^\"']*)[\"']", re.I)


def extract_link_rels(html: str) -> dict:
    """Crawl-policy signals from the document head: the FIRST
    ``<link rel="canonical">`` href (the canonical-URL dedup key — at
    web scale the cheapest near-dup signal there is: the site tells
    you the duplicate groups) and the union of ``<meta name=robots>``
    noindex/nofollow directives (``none`` implies both, per the
    robots-meta standard).  → {"canonical": str|None,
    "noindex": bool, "nofollow": bool}."""
    canonical = None
    m = _LINK_CANON_RE.search(html)
    if m:
        h = _HREF_RE.search(m.group(0))
        if h and h.group(1).lower() != "canonical":
            canonical = h.group(1)
    noindex = nofollow = False
    for m in _META_ROBOTS_RE.finditer(html):
        c = _CONTENT_VAL_RE.search(m.group(0))
        if c:
            vals = {v.strip().lower() for v in c.group(1).split(",")}
            noindex = noindex or bool(vals & {"noindex", "none"})
            nofollow = nofollow or bool(vals & {"nofollow", "none"})
    return {"canonical": canonical, "noindex": noindex,
            "nofollow": nofollow}
