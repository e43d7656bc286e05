"""Page-explode / re-aggregate leg (F1/F2) tests: output must match the
default in-row leg for the same PDFs, and whale skew is spread across
page-level tasks."""

from __future__ import annotations

import datetime

import pyarrow as pa

from llm_food_ray.config import ExtractConfig
from llm_food_ray.functions.pdf_build import simple_pdf
from llm_food_ray.schema import PAGES_SCHEMA
from llm_food_ray.stages.extract import ExtractStage
from llm_food_ray.stages.pages_explode import explode_extract_reaggregate


def _pdf_rows():
    rows = []
    for i, npages in [(0, 3), (1, 1), (2, 8)]:
        words = [f"d{i}w{j}" for j in range(npages * 60)]
        rows.append({
            "url": f"https://w.example/{i}",
            "warc_ts": datetime.datetime(2024, 1, 1),
            "html": simple_pdf(f"Whale {i}", words, words_per_line=10,
                               lines_per_page=7),
            "text": "", "lang": "en",
        })
    # a broken PDF exercises the failure path
    rows.append({
        "url": "https://w.example/broken",
        "warc_ts": datetime.datetime(2024, 1, 1),
        "html": b"%PDF-1.4\nbroken", "text": "", "lang": "en",
    })
    return rows


def test_exploded_leg_matches_default_leg(ray_session):
    from helpers import dataset_from_items

    rows = _pdf_rows()
    ds = dataset_from_items(rows)
    got = (
        explode_extract_reaggregate(ds, structured=True)
        .to_pandas().set_index("url")
    )
    # oracle: the default in-row leg
    stage = ExtractStage(ExtractConfig(pdf_backend="structured"))
    batch = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    expect = {r["url"]: r for r in stage(batch).to_pylist()}
    assert set(got.index) == set(expect)
    for url, e in expect.items():
        row = got.loc[url]
        assert row["status"] == e["status"], url
        if e["status"] == "ok":
            assert row["markdown"] == e["markdown"], url
            assert list(row["texts"]) == e["texts"], url


def test_explode_emits_one_row_per_page(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.pages_explode import ExplodePdfPages

    rows = [r for r in _pdf_rows() if r["url"].endswith("/2")]
    out = (
        dataset_from_items(rows)
        .map_batches(ExplodePdfPages(True), batch_format="pyarrow")
        .to_pandas()
    )
    # 1 title line + 480/10 body lines = 49 lines at 7/page → 7 pages
    assert len(out) == 7
    assert sorted(out["page_number"]) == list(range(1, 8))
