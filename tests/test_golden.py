"""Byte-identity against the PINNED golden fixtures (tests/golden/).

Unlike the runtime oracle (which is the same code as the pipeline and
would silently agree after any behavior change), these parquet files are
committed: an unintended extractor-semantics change fails here.
Regenerate deliberately with `python tools/make_golden.py`.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from llm_food_ray.config import ExtractConfig
from llm_food_ray.pipelines.extract import extract_dataset
from llm_food_ray.sources.pages import pages_dataset

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
SF = "/root/testdata/sf0.001"


def _compare(got_df, golden_path):
    exp = pq.read_table(golden_path).to_pandas().set_index("url").sort_index()
    got = got_df.set_index("url").sort_index()
    assert list(got.index) == list(exp.index)
    for col in ("content_hash", "doc_type", "markdown", "status", "error"):
        mism = (got[col] != exp[col]).sum()
        assert mism == 0, f"{col}: {mism} rows differ from golden"
    for a, b in zip(got["texts"], exp["texts"]):
        assert list(a) == list(b)
    for a, b in zip(got["spans"], exp["spans"]):
        assert [dict(s) for s in a] == [dict(s) for s in b]


@pytest.mark.parametrize("backend,golden", [
    ("auto", "extracted_auto_sf0001.parquet"),
    ("structured", "extracted_structured_sf0001.parquet"),
])
def test_pipeline_matches_pinned_golden(ray_session, backend, golden):
    ds = extract_dataset(pages_dataset(SF),
                         ExtractConfig(pdf_backend=backend), whale_leg=False)
    _compare(ds.to_pandas(), os.path.join(GOLDEN, golden))


def test_office_rows_match_pinned_golden():
    """Office extractors vs pinned rows (single-threaded — these formats
    are deterministic functions of the text)."""
    from llm_food_ray.functions.office_build import (
        build_docx, build_pptx, build_rtf)
    from llm_food_ray.sources.pages import url_for
    from llm_food_ray.stages.extract import ExtractStage

    exp = pq.read_table(
        os.path.join(GOLDEN, "extracted_office_sf0001.parquet")).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    stage = ExtractStage(ExtractConfig(pdf_backend="structured"))
    rows = []
    for d, t in zip(docs["doc_id"], docs["text"]):
        if d % 10 != 0:
            continue
        t = t or ""
        for fmt, payload in (
            ("docx", build_docx([("h1", f"Document {d}"), ("p", t)])),
            ("rtf", build_rtf([t])),
            ("pptx", build_pptx(
                [[" ".join(t.split()[i:i + 20])]
                 for i in range(0, len(t.split()), 20)] or [[]])),
        ):
            rows.append(stage.extract_row(f"{url_for(d)}#{fmt}", payload, ""))
    assert len(rows) == len(exp)
    for row, (_, erow) in zip(rows, exp.iterrows()):
        assert row["url"] == erow["url"]
        assert row["markdown"] == erow["markdown"]
        assert row["content_hash"] == erow["content_hash"]
        assert row["status"] == erow["status"]
