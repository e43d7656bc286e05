"""Dispatch + extract stage: the heart of the engine (one map_batches).

Mirrors the reference's request path ``_read_and_validate_upload →
sha256 → _process_file_content`` (llm_food/app.py:382-403, 354-379, 456)
as a vectorized-per-batch Arrow transform:

- content-type sniffing from bytes replaces extension dispatch (M1,
  app.py:354-379): ``%PDF-`` magic → pdf, tag-bearing payload → html,
  empty payload + text column → text passthrough, else unknown.
- size guard (S1, config.py:31-44): oversize rows become
  ``status='failed'`` instead of HTTP 413.
- sha256 content hash (M11, app.py:456).
- row-level error isolation (M12, app.py:215-276, 915-935): an extractor
  exception marks that row failed; it never drops the row or kills the
  batch. Errors live in proper columns, not in-band sentinel strings.
- PDF auto mode runs the text/scanned classifier (M6) and routes
  structured-markdown vs plain-text extraction.

Used as ``ds.map_batches(ExtractStage(cfg), batch_format="pyarrow",
concurrency=N)`` — a callable class so per-worker setup (config, hasher
tables) happens once per actor, not per batch.
"""

from __future__ import annotations

import gc

import pyarrow as pa

from ..config import ExtractConfig
from ..functions import html_md, pdf_md
from ..functions.hashing import sha256_hex
from ..schema import EXTRACTED_SCHEMA, PAGE_JOINER

_HTML_MARKERS = (b"<html", b"<!doctype", b"<body", b"<div", b"<p", b"<article",
                 b"<head", b"<span", b"<a ", b"<h1", b"<table", b"<ul")

_GC_TUNED = False


def _tune_gc_once() -> None:
    """Per-worker-process GC tuning (runs in __call__, not __init__ —
    stateless map_batches pickles the instance built on the driver).  The
    extractors allocate acyclic trees reclaimed by refcount; raising the
    gen-0 threshold cuts collector passes over them (~6% per-core)."""
    global _GC_TUNED
    if not _GC_TUNED:
        gc.set_threshold(100_000, 50, 50)
        _GC_TUNED = True


def sniff_doc_type(payload: bytes, text: str) -> str:
    """Byte-sniffing dispatch replacing extension dispatch (M1,
    app.py:354-379 + config.py:47 extension list): pdf/html/docx/pptx/
    rtf/text, else unknown (→ the reference's "Unsupported file type")."""
    if payload.startswith(b"%PDF-"):
        return "pdf"
    if payload.startswith(b"PK\x03\x04"):
        head = payload[:4096]
        if b"word/" in head:
            return "docx"
        if b"ppt/" in head:
            return "pptx"
        return "unknown"
    if payload.lstrip()[:5] == b"{\\rtf":
        return "rtf"
    if payload:
        head = payload[:4096].lower()
        if any(m in head for m in _HTML_MARKERS):
            return "html"
        return "unknown"
    if text:
        return "text"
    return "empty"


def _spans_from_blocks(pages_blocks: list[list[str]]) -> tuple[str, list[str], list[dict]]:
    """Join per-page block lists into final markdown + spans.

    Pages joined with PAGE_JOINER ("\\n\\n---\\n\\n", app.py:938); blocks
    within a page joined "\\n\\n". Span kind derived from block shape."""
    texts = ["\n\n".join(blocks) for blocks in pages_blocks]
    markdown = PAGE_JOINER.join(texts)
    spans: list[dict] = []
    pos = 0
    for pi, blocks in enumerate(pages_blocks):
        if pi:
            pos += len(PAGE_JOINER)
        for bi, b in enumerate(blocks):
            if bi:
                pos += 2
            kind = (
                "heading" if b.startswith("#")
                else "list" if b.startswith(("- ", "1. "))
                else "code" if b.startswith("```")
                else "quote" if b.startswith("> ")
                else "table" if b.startswith("| ")
                else "paragraph"
            )
            spans.append({"start": pos, "end": pos + len(b), "kind": kind})
            pos += len(b)
    return markdown, texts, spans


def normalize_charset(pages_ds, payload_column: str = "html"):
    """Pre-normalization stage for mixed-encoding crawls: sniff each
    payload's charset (BOM → meta prescan → strict-utf-8 → 1252
    fallback, functions/charset.py) and re-encode to utf-8, appending
    the detected ``charset`` column.  The extract stage downstream then
    keeps its reference byte-parity utf-8 contract while the pipeline
    as a whole handles the real Common-Crawl encoding tail.

    Scale shape: a pure streaming map; codec work is C-level per row,
    no shuffle, no driver state."""
    from ..functions.charset import to_utf8

    def f(b: pa.Table) -> pa.Table:
        out, css = [], []
        for p in b.column(payload_column).to_pylist():
            if p:
                u, cs = to_utf8(p)
            else:
                u, cs = p, ""
            out.append(u)
            css.append(cs)
        i = b.column_names.index(payload_column)
        return (b.set_column(i, payload_column, pa.array(out, pa.binary()))
                 .append_column("charset", pa.array(css, pa.string())))

    return pages_ds.map_batches(f, batch_format="pyarrow")


def repair_mojibake(ds, text_column: str = "text",
                    rounds_column: str = "mojibake_rounds"):
    """Recovery stage for utf-8-read-as-latin-1 damage already baked
    into a crawl's TEXT (the sibling of :func:`normalize_charset`,
    which fixes raw PAYLOAD bytes before decoding): applies the
    deterministic provable-round-trip rule of
    :func:`..functions.charset.fix_mojibake` per row and appends how
    many nesting levels were undone.

    Scale shape: pure streaming map, codec work is C-level per row
    with an ``isascii()`` fast path (the overwhelmingly common case
    costs one C scan), no shuffle, no driver state."""
    from ..functions.charset import fix_mojibake

    def f(b: pa.Table) -> pa.Table:
        fixed, rounds = [], []
        for t in b.column(text_column).to_pylist():
            if t:
                u, r = fix_mojibake(t)
            else:
                u, r = t, 0
            fixed.append(u)
            rounds.append(r)
        i = b.column_names.index(text_column)
        return (b.set_column(i, text_column, pa.array(fixed, pa.string()))
                 .append_column(rounds_column,
                                pa.array(rounds, pa.int64())))

    return ds.map_batches(f, batch_format="pyarrow")


class ExtractStage:
    """Callable class for ``map_batches`` (actor pool when concurrency is
    set; also valid as stateless tasks). Arrow in / Arrow out.

    ``defer_over``: payloads larger than this many bytes are NOT extracted
    here — the row is emitted with ``status="deferred"`` carrying the raw
    payload in ``deferred_payload`` (EXTRACTED_DEFER_SCHEMA), for a
    dedicated whale pool to finish in a second, tiny pass.  This keeps the
    pipeline single-read: the alternative (two filter branches over the
    input) scans the whole corpus twice."""

    def __init__(self, cfg: ExtractConfig | None = None,
                 defer_over: int | None = None):
        self.cfg = cfg or ExtractConfig()
        self.defer_over = defer_over

    def extract_row(self, url: str, payload: bytes, text: str) -> dict:
        cfg = self.cfg
        doc_type = sniff_doc_type(payload, text)
        content_hash = sha256_hex(payload if payload else text.encode("utf-8"))
        base = {
            "url": url,
            "content_hash": content_hash,
            "doc_type": doc_type if doc_type not in ("empty",) else "unknown",
            "markdown": "",
            "texts": [],
            "spans": [],
            "status": "ok",
            "error": "",
        }
        if payload and len(payload) > cfg.max_payload_bytes:
            base["status"] = "failed"
            base["error"] = "File size exceeds limit"   # S1 → 413 analogue
            return base
        try:
            if doc_type == "html":
                md, spans = html_md.extract_markdown(payload)
                # single-element texts list mirrors the HTML leg, app.py:257
                base["markdown"] = md
                base["texts"] = [md]
                base["spans"] = spans
            elif doc_type == "pdf":
                # one-parse path: classify + extract share the parsed runs
                pages, _structured = pdf_md.pdf_extract(
                    payload, cfg.resolved_pdf_backend, cfg.classifier
                )
                blocks = [([b for b in p.split("\n\n") if b] if p else []) for p in pages]
                md, texts, spans = _spans_from_blocks(blocks)
                base["markdown"] = md
                base["texts"] = texts
                base["spans"] = spans
            elif doc_type == "docx":
                # M8 contract: single-element texts (app.py:218-222)
                from ..functions.office import docx_markdown

                md = docx_markdown(payload)
                blocks = [b for b in md.split("\n\n") if b]
                md2, texts, spans = _spans_from_blocks([blocks])
                base["markdown"] = md2
                base["texts"] = texts
                base["spans"] = spans
            elif doc_type == "rtf":
                # M9 contract: plain text, single element (app.py:225-229)
                from ..functions.office import rtf_to_text

                t = rtf_to_text(payload)
                base["markdown"] = t
                base["texts"] = [t]
                base["spans"] = (
                    [{"start": 0, "end": len(t), "kind": "paragraph"}] if t else []
                )
            elif doc_type == "pptx":
                # M10 contract: one element per slide with text, [""] if
                # none (app.py:232-249)
                from ..functions.office import pptx_slide_texts

                slides = pptx_slide_texts(payload)
                md, texts, spans = _spans_from_blocks(
                    [[s] if s else [] for s in slides])
                base["markdown"] = md
                base["texts"] = texts
                base["spans"] = spans
            elif doc_type == "text":
                base["markdown"] = text
                base["texts"] = [text]
                base["spans"] = (
                    [{"start": 0, "end": len(text), "kind": "paragraph"}] if text else []
                )
            elif doc_type == "empty":
                base["status"] = "failed"
                base["error"] = "Empty content"        # app.py:480-483 analogue
            else:
                base["status"] = "failed"
                base["error"] = "Unsupported file type"  # M1 else-branch, app.py:378
        except Exception as exc:  # M12: row-level isolation, never raise
            base["status"] = "failed"
            base["error"] = f"Error processing {url}: {exc}"
            base["markdown"] = ""
            base["texts"] = []
            base["spans"] = []
        return base

    def __call__(self, batch: pa.Table) -> pa.Table:
        _tune_gc_once()
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        texts_col = batch.column("text").to_pylist()
        if self.defer_over is None:
            rows = [
                self.extract_row(u, p or b"", t or "")
                for u, p, t in zip(urls, payloads, texts_col)
            ]
            return pa.Table.from_pylist(rows, schema=EXTRACTED_SCHEMA)
        from ..schema import EXTRACTED_DEFER_SCHEMA

        rows = []
        for u, p, t in zip(urls, payloads, texts_col):
            p = p or b""
            if len(p) > self.defer_over and len(p) <= self.cfg.max_payload_bytes:
                rows.append({
                    "url": u,
                    "content_hash": sha256_hex(p),
                    "doc_type": sniff_doc_type(p, t or ""),
                    "markdown": "", "texts": [], "spans": [],
                    "status": "deferred", "error": "",
                    "deferred_payload": p,
                })
            else:
                row = self.extract_row(u, p, t or "")
                row["deferred_payload"] = None
                rows.append(row)
        return pa.Table.from_pylist(rows, schema=EXTRACTED_DEFER_SCHEMA)
