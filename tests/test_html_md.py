"""HTML → markdown extractor unit tests (operator M2 contract,
reference llm_food/app.py:252-259)."""

from __future__ import annotations

from llm_food_ray.functions import html_md
from llm_food_ray.functions.html_md import extract_markdown


def _page(body: str) -> bytes:
    return f"<html><head><title>t</title></head><body>{body}</body></html>".encode()


def test_main_content_selected_over_boilerplate():
    html = _page(
        '<nav><a href="/a">home</a> <a href="/b">about</a></nav>'
        '<div class="sidebar"><a href="/x">spam</a><a href="/y">links</a></div>'
        "<article><h1>Title</h1><p>real content with enough words to win scoring</p></article>"
        "<footer>copyright</footer>"
    )
    md, spans = extract_markdown(html)
    assert md == "# Title\n\nreal content with enough words to win scoring"
    assert [s["kind"] for s in spans] == ["heading", "paragraph"]


def test_empty_and_no_content_yield_empty_string():
    # mirrors trafilatura None-extract → "" (app.py:257)
    assert extract_markdown(b"") == ("", [])
    assert extract_markdown(b"   \n ") == ("", [])
    md, spans = extract_markdown(
        b'<html><body><nav><a href="/a">only links here</a></nav></body></html>'
    )
    assert md == "" and spans == []


def test_decode_errors_ignore():
    # invalid utf-8 bytes are dropped, not fatal (app.py:256 errors="ignore")
    html = b"<div><p>caf\xff\xfe content words here for scoring</p></div>"
    md, _ = extract_markdown(html)
    assert "caf content words" in md


def test_malformed_unclosed_tags():
    md, _ = extract_markdown(b"<div><p>hello world unclosed <b>bold")
    assert md == "hello world unclosed **bold**"


def test_lists_links_code_quote():
    html = _page(
        "<article><p>intro paragraph with some words</p>"
        "<ul><li>one</li><li>two</li></ul>"
        "<ol><li>first</li><li>second</li></ol>"
        '<p>see <a href="https://x.example/p">the docs</a> and <code>fn()</code></p>'
        "<pre>line1\nline2</pre>"
        "<blockquote>quoted words</blockquote></article>"
    )
    md, spans = extract_markdown(html)
    assert "- one\n- two" in md
    assert "1. first\n2. second" in md
    assert "[the docs](https://x.example/p)" in md
    assert "`fn()`" in md
    assert "```\nline1\nline2\n```" in md
    assert "> quoted words" in md
    kinds = [s["kind"] for s in spans]
    assert kinds == ["paragraph", "list", "list", "paragraph", "code", "quote"]


def test_spans_index_into_markdown():
    html = _page(
        "<article><h1>Head</h1><p>para one words</p><p>para two words</p></article>"
    )
    md, spans = extract_markdown(html)
    # ordered, non-overlapping, exact offsets
    prev_end = -1
    for s in spans:
        assert s["start"] > prev_end
        assert s["end"] > s["start"]
        prev_end = s["end"]
    assert md[spans[0]["start"]:spans[0]["end"]] == "# Head"
    assert md[spans[1]["start"]:spans[1]["end"]] == "para one words"


def test_whitespace_normalization_deterministic():
    html = _page("<article><p>a   b\n\t c</p></article>")
    md1, _ = extract_markdown(html)
    md2, _ = extract_markdown(html)
    assert md1 == "a b c" and md1 == md2


def test_scripts_styles_comments_dropped():
    html = _page(
        "<script>var x = '<p>fake</p>';</script><style>p{color:red}</style>"
        "<!-- comment --><article><p>visible body words here</p></article>"
    )
    md, _ = extract_markdown(html)
    assert md == "visible body words here"


def test_headings_levels():
    html = _page("<article><h2>Two</h2><h3>Three</h3><p>body words here</p></article>")
    md, _ = extract_markdown(html)
    assert md.startswith("## Two\n\n### Three")


def test_table_serialization():
    html = _page(
        "<article><p>intro words for scoring mass</p>"
        "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table></article>"
    )
    md, spans = extract_markdown(html)
    assert "| a | b |\n| 1 | 2 |" in md
    assert spans[-1]["kind"] == "table"


# ------------------------------------------------- fast lexer vs stdlib ----

_DIFF_CASES = [
    "<html><body><article><h1>T</h1><p>hello &amp; goodbye</p></article></body></html>",
    "<div class=\"content\"><p>a<br>b</p><ul><li>x</li><li></li></ul></div>",
    "<p>unclosed <b>bold <i>italic</p><p>next",
    "<P CLASS=MAIN><A HREF='/x'>Link</A> text</P>",
    "<script>var a = '<p>not a tag</p>';</script><p>after</p>",
    "<SCRIPT>x</SCRIPT><style>.a{content:'</div>'}</style><p>t</p>",
    "<!-- comment <p>hidden</p> --><p>shown</p>",
    "<!DOCTYPE html><?php echo 1 ?><p>x</p>",
    "<p>a &lt; b &gt; c &#65; &nbsp; d</p>",
    "<div data-x='1' data-x=\"2\" disabled>text</div>",
    "<img src=a.png alt='pic'/><input disabled><br/>",
    "<p>text with < stray and <3 hearts</p>",
    "<table><tr><td>1</td><TD>2</TD></tr></table>",
    "<article><iframe><p>dropped</p></iframe><p>kept</p></article>",
    "<div><form><input><p>in form</p></form><p>out</p></div>",
    "truncated <b",
    "<p attr=>empty</p>",
    "<a href=\"x\" title='y &quot;z'>t</a>",
    "",
    "no tags at all",
    "<p>élève &eacute;</p>",
    "<pre>  raw\n  text  </pre>",
    "<blockquote>q</blockquote><h3>h</h3>",
]


def _md_via(parse_fn, text: str):
    root = parse_fn(text)
    main = html_md.select_main(root)
    if main is None:
        return "", []
    blocks = []
    html_md._emit_blocks(main, blocks)
    return [(b.kind, b.text) for b in blocks]


def test_fast_lexer_matches_stdlib_parser():
    """The regex lexer must produce the same extraction as html.parser on
    well-formed and malformed inputs (it replaced the stdlib tokenizer for
    ~2x parse speed; parse_html_stdlib is kept as the oracle)."""
    from llm_food_ray.sources.pages import synth_page_record

    cases = list(_DIFF_CASES)
    # synthesized corpus pages (the bench/driver input)
    for i in range(60):
        r = synth_page_record(i, f"body text {i} " * (i % 9 + 1), "en")
        if r["html"].startswith(b"<html"):
            cases.append(r["html"].decode())
    for c in cases:
        assert _md_via(html_md.parse_html, c) == \
            _md_via(html_md.parse_html_stdlib, c), c[:80]


def test_extract_links_and_resolve():
    from llm_food_ray.functions.html_md import extract_links, resolve_href

    html = ('<p>x</p><a href="/a">one <b>two</b></a>'
            "<A HREF='rel.html' class=q>z</A>"
            '<a href=bare>w</a><a name="no-href">skip</a>')
    assert extract_links(html) == [("/a", "one two"), ("rel.html", "z"),
                                   ("bare", "w")]
    assert resolve_href("https://h.com/d/p", "/a") == "https://h.com/a"
    assert resolve_href("https://h.com/d/p", "rel.html") == "https://h.com/d/rel.html"
    assert resolve_href("https://h.com/d/p", "http://o.io/q") == "http://o.io/q"
    assert extract_links("") == []


def test_extract_page_meta():
    from llm_food_ray.functions.html_md import extract_page_meta

    html = ('<html><head><title> My <b>Site</b>\n Page </title></head>'
            '<body><h1>Hello <i>World</i></h1><h1>second</h1>'
            '<a href="/x">one</a><a href="/y">two</a></body></html>')
    m = extract_page_meta(html)
    assert m == {"title": "My Site Page", "h1": "Hello World",
                 "n_links": 2}
    assert extract_page_meta("<p>no head</p>") == {
        "title": "", "h1": "", "n_links": 0}


def test_extract_table_cells_structured():
    from llm_food_ray.functions.html_md import extract_table_cells

    h = ('<table><thead><tr><th>H1</th><th>H2</th></tr></thead>'
         '<tbody><tr><td> a  b </td><td>c &amp; d</td></tr>'
         '<tr><td></td><td></td></tr>'  # all-empty row: skipped
         '</tbody></table>'
         '<p>between</p>'
         '<table><tr><td>z</td></tr></table>')
    cells = extract_table_cells(h)
    assert cells == [
        (0, 0, 0, "H1"), (0, 0, 1, "H2"),
        (0, 1, 0, "a b"), (0, 1, 1, "c & d"),
        (1, 0, 0, "z"),
    ]
    assert extract_table_cells("<p>none</p>") == []


class TestExtractJsonld:
    def test_variants_and_robustness(self):
        from llm_food_ray.functions.html_md import extract_jsonld

        h = """<html><head>
<script type="application/ld+json">{"@type": "Article", "name": "X"}</script>
<script type='application/ld+json' async>
[{"@type": "Person", "name": "P"}, 42, "str"]
</script>
<script TYPE="application/LD+JSON">{"@context": "c",
 "@graph": [{"@type": "A"}, {"@type": "B"}, null]}</script>
<script type="application/ld+json">{broken json</script>
<script type="text/javascript">var x = {"@type": "No"}</script>
</head><body>body</body></html>"""
        got = extract_jsonld(h)
        assert [g.get("@type") for g in got] == ["Article", "Person",
                                                 "A", "B"]

    def test_graph_wrapper_with_own_type_counts(self):
        from llm_food_ray.functions.html_md import extract_jsonld

        h = ('<script type="application/ld+json">'
             '{"@type": "WebPage", "name": "w",'
             ' "@graph": [{"@type": "Person", "name": "p"}]}'
             "</script>")
        got = extract_jsonld(h)
        assert [(g["@type"], g["name"]) for g in got] == [
            ("Person", "p"), ("WebPage", "w")]

    def test_no_blocks(self):
        from llm_food_ray.functions.html_md import extract_jsonld

        assert extract_jsonld("<html><body>hi</body></html>") == []
        assert extract_jsonld("") == []


class TestTemplateFingerprint:
    def test_content_invariance(self):
        from llm_food_ray.functions.html_md import template_fingerprint

        a = template_fingerprint(
            "<html><body><div class='x'><h1>A</h1><p>one</p></div>"
            "</body></html>")
        b = template_fingerprint(
            "<html><body><div id='y'><h1>Other title</h1>"
            "<p>completely different words</p></div></body></html>")
        assert a == b
        assert a[1] == "html,body,div,h1,p"

    def test_structure_sensitivity_and_drops(self):
        from llm_food_ray.functions.html_md import template_fingerprint

        base = template_fingerprint(
            "<html><body><p>x</p></body></html>")
        extra = template_fingerprint(
            "<html><body><p>x</p><p>y</p></body></html>")
        assert base != extra
        # script/head subtrees never contribute structure
        with_noise = template_fingerprint(
            "<html><head><title>t</title></head><body>"
            "<script>var a=1</script><p>x</p></body></html>")
        assert with_noise == base


class TestExtractLinkRels:
    def test_variants(self):
        from llm_food_ray.functions.html_md import extract_link_rels

        r = extract_link_rels(
            '<head><link href="https://e.com/a" rel=canonical>'
            '<meta name=robots content="index, follow"></head>')
        assert r == {"canonical": "https://e.com/a", "noindex": False,
                     "nofollow": False}
        r = extract_link_rels(
            "<head><link rel='canonical' href='/self'>"
            '<meta name="robots" content="noindex, nofollow"></head>')
        assert r == {"canonical": "/self", "noindex": True,
                     "nofollow": True}
        r = extract_link_rels("<head><meta NAME='ROBOTS' "
                              "content='NONE'></head>")
        assert r["noindex"] and r["nofollow"] and r["canonical"] is None

    def test_union_across_tags_and_absence(self):
        from llm_food_ray.functions.html_md import extract_link_rels

        r = extract_link_rels(
            '<meta name=robots content="noindex">'
            '<meta name=robots content="nofollow">')
        assert r["noindex"] and r["nofollow"]
        assert extract_link_rels("<p>no head</p>") == {
            "canonical": None, "noindex": False, "nofollow": False}
