"""CLI tests (S8 / client-command analogues, llm_food/cli.py)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from llm_food_ray.schema import PAGES_SCHEMA
from llm_food_ray.sources.pages import synth_page_record


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    rows = [
        synth_page_record(d, t, l)
        for d, t, l in zip(docs.column("doc_id").to_pylist()[:100],
                           docs.column("text").to_pylist()[:100],
                           docs.column("lang").to_pylist()[:100])
    ]
    d = tmp_path_factory.mktemp("cli_pages")
    pq.write_table(pa.Table.from_pylist(rows[:50], schema=PAGES_SCHEMA),
                   str(d / "shard-0.parquet"))
    pq.write_table(pa.Table.from_pylist(rows[50:], schema=PAGES_SCHEMA),
                   str(d / "shard-1.parquet"))
    return str(d)


def test_cli_extract_status_save_chunk(ray_session, pages_dir, tmp_path, capsys):
    from llm_food_ray.cli import main

    out_dir = str(tmp_path / "out")
    assert main(["extract", pages_dir, out_dir, "--groups", "2"]) == 0
    totals = json.loads(capsys.readouterr().out.strip())
    assert totals["ok"] + totals["failed"] == 100

    assert main(["status", out_dir]) == 0
    status = json.loads(capsys.readouterr().out.strip())
    assert status["completed_partitions"] == 2
    assert status["totals"]["ok"] == totals["ok"]

    dest = str(tmp_path / "md")
    assert main(["save", out_dir, dest]) == 0
    saved = json.loads(capsys.readouterr().out.strip())
    assert saved["saved"] == totals["ok"]
    files = os.listdir(dest)
    assert len(files) == totals["ok"]
    assert all(f.endswith(".md") for f in files)
    body = open(os.path.join(dest, sorted(files)[0])).read()
    assert body   # non-empty markdown

    chunk_dest = str(tmp_path / "chunks")
    assert main(["chunk", out_dir, chunk_dest, "--size", "32",
                 "--overlap", "8"]) == 0
    import pyarrow.dataset as pads

    t = pads.dataset(chunk_dest, format="parquet").to_table()
    assert t.num_rows > 0
    assert "chunk_text" in t.column_names

    curate_dest = str(tmp_path / "curated")
    assert main(["curate", out_dir, curate_dest]) == 0
    cj = json.loads(capsys.readouterr().out.strip().split("\n")[-1])
    assert 0 < cj["curated"] <= totals["ok"]
    c = pads.dataset(curate_dest, format="parquet").to_table()
    assert set(c.column_names) == {"url", "clean", "split"}
    assert set(c.column("split").to_pylist()) <= {"train", "test"}


def test_cli_extract_empty_dir(tmp_path, capsys):
    from llm_food_ray.cli import main

    assert main(["extract", str(tmp_path), str(tmp_path / "o")]) == 2
