"""Deterministic synthesis of the north `pages` table from the driver's
``documents`` table (TESTDATA.md).

The engine's authoritative input (BASELINE.json input_hint) is a table of
Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``; the sandbox
provides only generic tables, so pages are synthesized as a *pure
deterministic function of (doc_id, text, lang)* — the same rule is
reproducible in ANSI SQL, which is what makes the driver's DuckDB oracle
able to check extraction end-to-end.

Payload mix rules (precedence order, keyed on doc_id — keep in sync with
the oracle SQL in __ray_entry__.py):

    doc_id % 50 == 3   → broken PDF payload (truncated header)   → failed
    doc_id % 50 == 13  → unknown binary payload                  → failed
    doc_id % 10 == 7   → plaintext row (html empty, text set)    → text
    doc_id % 5  == 1   → single-page PDF "Document {id}" + body  → pdf
    otherwise          → templated HTML article + boilerplate    → html

HTML extraction result (by construction + extractor contract):
``"# Document {id}\\n\\n{text}"``; structured PDF extraction result is the
same string.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa

from ..functions.pdf_build import simple_pdf
from ..schema import PAGES_SCHEMA

_EPOCH = _dt.datetime(2024, 1, 1)

_HTML_TEMPLATE = (
    '<html><head><title>Doc {doc_id}</title></head><body>\n'
    '<nav><a href="/home">home</a> <a href="/about">about</a> '
    '<a href="/contact">contact</a></nav>\n'
    '<div class="sidebar"><a href="/l1">promo one</a> <a href="/l2">promo two</a> '
    '<a href="/l3">promo three</a></div>\n'
    '<article><h1>Document {doc_id}</h1><p>{text}</p></article>\n'
    '<footer>copyright example site {site}</footer>\n'
    '</body></html>'
)


def url_for(doc_id: int) -> str:
    return f"https://site{doc_id % 100}.example.com/doc/{doc_id}"


def synth_page_record(doc_id: int, text: str, lang: str) -> dict:
    url = url_for(doc_id)
    ts = _EPOCH + _dt.timedelta(seconds=int(doc_id))
    if doc_id % 50 == 3:
        payload, txt = b"%PDF-1.4\n<< truncated garbage", ""
    elif doc_id % 50 == 13:
        payload, txt = b"\x00\x01\x02BINARYBLOB" + bytes([doc_id % 256]) * 16, ""
    elif doc_id % 10 == 7:
        payload, txt = b"", text
    elif doc_id % 5 == 1:
        payload = simple_pdf(
            f"Document {doc_id}", text.split(),
            words_per_line=10, lines_per_page=100000,
        )
        txt = ""
    else:
        payload = _HTML_TEMPLATE.format(
            doc_id=doc_id, text=text, site=doc_id % 100
        ).encode("utf-8")
        txt = ""
    return {"url": url, "warc_ts": ts, "html": payload, "text": txt, "lang": lang}


class PagesFromDocuments:
    """map_batches callable: documents batch → pages batch (Arrow in/out)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [
            synth_page_record(d, t or "", l or "")
            for d, t, l in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("text").to_pylist(),
                batch.column("lang").to_pylist(),
            )
        ]
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def pages_dataset(sf_dir: str, *, parallelism: int = -1):
    """documents.parquet → synthesized pages Dataset (lazy, streaming)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ds.map_batches(PagesFromDocuments(), batch_format="pyarrow")
