"""DOCX / RTF / PPTX extractors (M8/M9/M10) — roundtrips against the
deterministic builders, dispatch sniffing, and row-level error isolation."""

from __future__ import annotations

from llm_food_ray.functions.office import (
    OfficeError,
    docx_markdown,
    pptx_slide_texts,
    rtf_to_text,
)
from llm_food_ray.functions.office_build import build_docx, build_pptx, build_rtf
from llm_food_ray.schema import PAGE_JOINER
from llm_food_ray.stages.extract import ExtractStage, sniff_doc_type


def test_docx_blocks_roundtrip():
    d = build_docx([("h1", "Title"), ("p", "hello world"),
                    ("li", "item one"), ("li", "item two"),
                    ("b", "bold bit"), ("i", "ital"), ("h3", "Sub")])
    assert docx_markdown(d) == (
        "# Title\n\nhello world\n\n- item one\n\n- item two\n\n"
        "**bold bit**\n\n*ital*\n\n### Sub"
    )


def test_docx_empty_and_escapes():
    assert docx_markdown(build_docx([])) == ""
    assert docx_markdown(build_docx([("p", "a < b & c > d")])) == "a < b & c > d"


def test_rtf_paragraphs_escapes_unicode():
    r = build_rtf(["first para", "second {braces} & \\slash", "üñïçødé"])
    assert rtf_to_text(r) == "first para\nsecond {braces} & \\slash\nüñïçødé"


def test_rtf_uc_fallback_consumed():
    # default \uc1: one ANSI fallback char after \uN is consumed
    assert rtf_to_text(rb"{\rtf1 a\u246 ?b}") == "aöb"
    # \'xx escape counts as ONE fallback char
    assert rtf_to_text(rb"{\rtf1 a\u246 \'f6b}") == "aöb"
    # \uc2 consumes two; \uc0 consumes none; group end restores outer value
    assert rtf_to_text(rb"{\rtf1\uc2 a\u246 ??b}") == "aöb"
    assert rtf_to_text(rb"{\rtf1 a{\uc0\u246 }b\u248 ?c}") == "aöbøc"


def test_rtf_destinations_skipped():
    raw = (rb"{\rtf1{\fonttbl{\f0 Arial;}}{\*\generator x;}"
           rb"{\stylesheet{\s1 Normal;}}kept text\par more}")
    assert rtf_to_text(raw) == "kept text\nmore"


def test_pptx_slide_contract():
    p = build_pptx([["slide one line a", "line b"], [], ["slide three"]])
    assert pptx_slide_texts(p) == ["slide one line a\nline b", "slide three"]
    # no text at all → [""] (app.py:247-249)
    assert pptx_slide_texts(build_pptx([[], []])) == [""]


def test_sniff_office_types():
    assert sniff_doc_type(build_docx([("p", "x")]), "") == "docx"
    assert sniff_doc_type(build_pptx([["x"]]), "") == "pptx"
    assert sniff_doc_type(build_rtf(["x"]), "") == "rtf"
    assert sniff_doc_type(b"PK\x03\x04junkzip", "") == "unknown"


def test_extract_rows_office():
    stage = ExtractStage()
    d = stage.extract_row("u1", build_docx([("h1", "T"), ("p", "body")]), "")
    assert d["doc_type"] == "docx" and d["status"] == "ok"
    assert d["markdown"] == "# T\n\nbody"
    assert d["texts"] == ["# T\n\nbody"]
    assert d["spans"][0]["kind"] == "heading"

    r = stage.extract_row("u2", build_rtf(["plain", "text"]), "")
    assert r["doc_type"] == "rtf" and r["markdown"] == "plain\ntext"
    assert r["texts"] == ["plain\ntext"]

    p = stage.extract_row("u3", build_pptx([["s1"], ["s2"]]), "")
    assert p["doc_type"] == "pptx"
    assert p["texts"] == ["s1", "s2"]
    assert p["markdown"] == "s1" + PAGE_JOINER + "s2"


def test_broken_office_rows_fail_isolated():
    stage = ExtractStage()
    # zip magic but corrupt → failed row, never an exception
    row = stage.extract_row("u", b"PK\x03\x04word/garbage", "")
    assert row["status"] in ("ok", "failed")
    # sniffs as docx (zip magic + word/ marker) but the zip is garbage
    bad_docx = b"PK\x03\x04word/document.xml then garbage not a zip"
    row = stage.extract_row("u", bad_docx, "")
    assert row["doc_type"] == "docx"
    assert row["status"] == "failed"
    assert row["error"].startswith("Error processing u")
