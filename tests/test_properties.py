"""Property-based tests (hypothesis): the invariants SURVEY.md §5 pins —
extraction determinism, span integrity, chunker coverage, and a
differential fuzz of the fast HTML lexer against the stdlib tokenizer.

Example counts are bounded so the suite stays fast; deadline disabled
because first-call regex compilation can spike."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from llm_food_ray.config import ChunkConfig
from llm_food_ray.functions import html_md
from llm_food_ray.functions.chunk import chunk_text, tokenize
from llm_food_ray.functions.html_md import extract_markdown
from llm_food_ray.functions.pdf_build import simple_pdf
from llm_food_ray.functions.pdf_md import pdf_pages_markdown
from llm_food_ray.stages.extract import ExtractStage

# --------------------------------------------------------------- html ----

_tag_names = st.sampled_from(
    ["p", "div", "article", "span", "a", "b", "ul", "li", "h1", "h2",
     "nav", "footer", "script", "style", "table", "tr", "td", "pre",
     "blockquote", "img", "br", "main", "section", "form", "iframe"])
_text_chunk = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=40)


@st.composite
def _html_soup(draw):
    """Random tag soup: well-formed-ish fragments with deliberate nesting
    errors, entities, attributes, comments."""
    parts = []
    for _ in range(draw(st.integers(0, 12))):
        kind = draw(st.integers(0, 6))
        tag = draw(_tag_names)
        if kind == 0:
            parts.append(draw(_text_chunk))
        elif kind == 1:
            attrs = ""
            if draw(st.booleans()):
                attrs = f' class="{draw(_text_chunk)}"'.replace('"', "")
                attrs = f' class="{attrs[8:20]}"'
            parts.append(f"<{tag}{attrs}>")
        elif kind == 2:
            parts.append(f"</{tag}>")
        elif kind == 3:
            parts.append(f"<{tag}/>")
        elif kind == 4:
            parts.append(f"<!-- {draw(_text_chunk)} -->")
        elif kind == 5:
            parts.append("&amp; &lt; &#65; &unknown;")
        else:
            parts.append(f"<{tag} data-x='{draw(st.integers(0, 99))}'>")
    return "".join(parts)


def _blocks_via(parse_fn, text):
    root = parse_fn(text)
    main = html_md.select_main(root)
    if main is None:
        return None
    blocks = []
    html_md._emit_blocks(main, blocks)
    return [(b.kind, b.text) for b in blocks]


@settings(max_examples=150, deadline=None)
@given(_html_soup())
def test_fast_lexer_differential_fuzz(soup):
    """Fast lexer and stdlib html.parser must extract identical blocks on
    arbitrary tag soup."""
    assert _blocks_via(html_md.parse_html, soup) == \
        _blocks_via(html_md.parse_html_stdlib, soup)


@settings(max_examples=60, deadline=None)
@given(_html_soup())
def test_extraction_deterministic_and_spans_valid(soup):
    payload = f"<html><body><article>{soup}</article></body></html>".encode()
    md1, spans1 = extract_markdown(payload)
    md2, spans2 = extract_markdown(payload)
    assert md1 == md2 and spans1 == spans2   # determinism
    pos = -1
    for s in spans1:
        assert 0 <= s["start"] <= s["end"] <= len(md1)
        assert s["start"] > pos              # ordered, non-overlapping
        pos = s["end"] - 1
        assert md1[s["start"]:s["end"]]     # spans index real block text


# ------------------------------------------------------------- chunkers ----

_words = st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=8),
                  min_size=0, max_size=120)


@settings(max_examples=80, deadline=None)
@given(_words, st.integers(2, 40), st.integers(0, 20))
def test_token_chunker_coverage(words, size, overlap):
    if overlap >= size:
        overlap = size - 1
    text = " ".join(words)
    cfg = ChunkConfig(strategy="token", chunk_size=size, chunk_overlap=overlap)
    chunks = chunk_text(text, cfg)
    toks = tokenize(text)
    if not toks:
        assert chunks == []
        return
    step = size - overlap
    for i, c in enumerate(chunks):
        ct = tokenize(c)
        assert len(ct) <= size                       # window bound
        assert ct == toks[i * step:i * step + size]  # exact window content
    assert tokenize(chunks[-1])[-1] == toks[-1]      # reaches the end


@settings(max_examples=60, deadline=None)
@given(_words, st.integers(2, 40))
def test_sentence_and_recursive_chunkers_cover_all_tokens(words, size):
    text = ". ".join(" ".join(words[i:i + 5]) for i in range(0, len(words), 5))
    for strategy in ("sentence", "recursive"):
        cfg = ChunkConfig(strategy=strategy, chunk_size=size, chunk_overlap=0)
        chunks = chunk_text(text, cfg)
        # with no overlap, no token is lost or duplicated
        assert sorted(tokenize(" ".join(chunks))) == sorted(tokenize(text))


# ------------------------------------------------------------ pdf + e2e ----


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                min_size=1, max_size=80),
       st.integers(2, 8), st.integers(2, 6))
def test_pdf_roundtrip_fuzz(words, per_line, per_page):
    pdf = simple_pdf("Title", words, words_per_line=per_line,
                     lines_per_page=per_page)
    pages = pdf_pages_markdown(pdf, structured=False)
    got = " ".join(" ".join(p.split()) for p in pages).split()
    assert got == ["Title"] + words          # nothing lost, order kept


@settings(max_examples=30, deadline=None)
@given(st.binary(max_size=200))
def test_extract_row_never_raises(payload):
    """M12 row-level isolation: arbitrary bytes must produce a row, never
    an exception."""
    stage = ExtractStage()
    row = stage.extract_row("u", payload, "")
    assert row["status"] in ("ok", "failed")
    assert isinstance(row["markdown"], str)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10_000), st.integers(0, 255), st.integers(1, 64))
def test_pdf_mutation_fuzz_never_raises_through_stage(offset, value, cut):
    """Structured mutations of a valid PDF (byte flip + tail truncation)
    must flow through the extract stage as rows, never exceptions; a
    truncated-but-parsable prefix may still yield ok."""
    base = simple_pdf("Fuzz Doc", [f"w{i}" for i in range(120)],
                      words_per_line=8, lines_per_page=10)
    data = bytearray(base[: max(5, len(base) - cut)])
    if offset < len(data):
        data[offset] = value
    row = ExtractStage().extract_row("u", bytes(data), "")
    assert row["status"] in ("ok", "failed")
    assert isinstance(row["markdown"], str)
    assert isinstance(row["texts"], list)


# ----------------------------------------------- round-2 text operators ----

_plain_words = st.lists(
    st.text(alphabet=st.characters(min_codepoint=0x61, max_codepoint=0x7A),
            min_size=1, max_size=8),
    min_size=0, max_size=40)


@settings(max_examples=60, deadline=None)
@given(_plain_words)
def test_repetition_fracs_bounded(words):
    from llm_food_ray.functions.repetition import repetition_features

    text = "\n".join(" ".join(words[i:i + 4]) for i in range(0, len(words), 4))
    f = repetition_features(text)
    for k in ("dup_line_frac", "dup_para_frac", "top_word_frac",
              "bullet_line_frac", "ellipsis_line_frac"):
        assert 0.0 <= f[k] <= 1.0, (k, f[k])


@settings(max_examples=60, deadline=None)
@given(_plain_words)
def test_repetition_line_order_invariant(words):
    """dup_line_frac and dup_para_frac ignore line order."""
    from llm_food_ray.functions.repetition import repetition_features

    lines = [" ".join(words[i:i + 3]) for i in range(0, len(words), 3)]
    a = repetition_features("\n".join(lines))
    b = repetition_features("\n".join(reversed(lines)))
    assert a["dup_line_frac"] == b["dup_line_frac"]
    assert a["n_lines"] == b["n_lines"]


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=0x61, max_codepoint=0x7A),
               max_size=200))
def test_pii_identity_without_patterns(text):
    """Texts with no digits / @ pass through the scrubber unchanged."""
    from llm_food_ray.functions.pii import scrub_pii

    assert scrub_pii(text) == text


_url_host = st.text(alphabet=st.characters(min_codepoint=0x61,
                                           max_codepoint=0x7A),
                    min_size=1, max_size=10)
_url_path = st.text(alphabet=st.characters(min_codepoint=0x41,
                                           max_codepoint=0x5A),
                    max_size=10)


@settings(max_examples=80, deadline=None)
@given(st.sampled_from(["http", "https", "HTTP", "HtTpS"]), _url_host,
       st.sampled_from(["", ":80", ":443", ":8080"]), _url_path,
       st.sampled_from(["", "?a=1", "?utm_source=x", "?utm_x=1&b=2"]),
       st.sampled_from(["", "#frag"]))
def test_canonicalize_idempotent(scheme, host, port, path, query, frag):
    from llm_food_ray.functions.urltools import canonicalize_url

    url = f"{scheme}://{host}.com{port}/{path}{query}{frag}"
    once = canonicalize_url(url)
    assert canonicalize_url(once) == once
    assert "#" not in once and "utm_" not in once


@settings(max_examples=120, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=0x20,
                                      max_codepoint=0x7E) | st.sampled_from(
                                          "\n\t  "),
               max_size=400),
       st.integers(min_value=2, max_value=40),
       st.integers(min_value=0, max_value=10))
def test_chunk_spans_invariants_fuzz(text, size, overlap):
    """Spans always index the raw text, normalized substring equals the
    chunk, and the chunk sequence equals the span-free chunker."""
    from llm_food_ray.functions.chunk import chunk_tokens, chunk_tokens_spans

    overlap = min(overlap, size - 1)
    spans = chunk_tokens_spans(text, size, overlap)
    assert [c for c, _, _ in spans] == chunk_tokens(text, size, overlap)
    for c, s, e in spans:
        assert 0 <= s < e <= len(text)
        assert " ".join(text[s:e].split()) == c


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.sampled_from("abc"),
                          st.integers(min_value=1, max_value=9)),
                min_size=1, max_size=60),
       st.integers(min_value=0, max_value=80),
       st.integers(min_value=1, max_value=4))
def test_token_budget_sample_fuzz(ray_session, docs, budget_a, bucket_hex):
    """Bucketed two-phase plan == local greedy reference for any corpus
    shape, budget, and bucket granularity."""
    import hashlib

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import token_budget_sample

    rows = [{"doc_id": i, "g": g, "text": " ".join(["w"] * n)}
            for i, (g, n) in enumerate(docs)]
    budgets = {"a": budget_a, "b": 15}
    out = token_budget_sample(dataset_from_items(rows), "g", "doc_id",
                              budgets=budgets,
                              bucket_hex=bucket_hex).to_pandas()
    for g in ("a", "b", "c"):
        docs_g = sorted((r for r in rows if r["g"] == g),
                        key=lambda r: (hashlib.md5(
                            str(r["doc_id"]).encode()).hexdigest(),
                            r["doc_id"]))
        want, cum = [], 0
        for r in docs_g:
            t = len(r["text"].split())
            if cum < budgets.get(g, 0):
                want.append(r["doc_id"])
            cum += t
        got = (sorted(out[out["g"] == g]["doc_id"])
               if len(out) else [])
        assert got == sorted(want), (g, budgets, bucket_hex)


@given(st.text(alphabet="abcd", max_size=7),
       st.text(alphabet="abcd", max_size=7))
def test_lev_le1_matches_dp_capped(a, b):
    from llm_food_ray.stages.fuzzy import _lev_le1

    if abs(len(a) - len(b)) > 1:
        return
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    true_d = prev[-1]
    got = _lev_le1(a, b)
    assert got == (true_d if true_d <= 1 else 2)
