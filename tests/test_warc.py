"""WARC source (sources/warc.py): Common-Crawl-layout shard round trip."""
from __future__ import annotations

import datetime as dt
import gzip

import pyarrow as pa
import pytest


def test_record_roundtrip_plain_and_gz():
    from llm_food_ray.sources.warc import build_warc_record, parse_warc_bytes

    ts = dt.datetime(2024, 1, 2, 3, 4, 5)
    r1 = build_warc_record("https://a.example/x", ts, b"<html>hi</html>",
                           content_type="text/html; charset=utf-8",
                           lang="en")
    r2 = build_warc_record("https://a.example/y", ts, b"plain body",
                           content_type="text/plain; charset=utf-8")
    recs = parse_warc_bytes(r1 + r2)
    assert [r["url"] for r in recs] == ["https://a.example/x",
                                       "https://a.example/y"]
    assert recs[0]["payload"] == b"<html>hi</html>"
    assert recs[0]["lang"] == "en" and recs[1]["lang"] == ""
    assert recs[0]["warc_ts"] == ts
    assert recs[1]["content_type"].startswith("text/plain")
    # per-record gzip members, CC layout
    gz = gzip.compress(r1, mtime=0) + gzip.compress(r2, mtime=0)
    assert parse_warc_bytes(gz) == recs


def test_record_determinism():
    from llm_food_ray.sources.warc import build_warc_record

    ts = dt.datetime(2024, 1, 1)
    a = build_warc_record("u", ts, b"x", content_type="text/plain")
    b = build_warc_record("u", ts, b"x", content_type="text/plain")
    assert a == b


def test_parse_rejects_garbage():
    from llm_food_ray.sources.warc import parse_warc_bytes

    with pytest.raises(ValueError):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\nnope")


def test_corpus_roundtrip_matches_synth(ray_session, sf_dir, tmp_path):
    """writer → shards → pages_from_warc reproduces synth_page_record's
    payload/text routing byte-for-byte on every url."""
    import pyarrow.parquet as pq

    from llm_food_ray.sources.pages import synth_page_record
    from llm_food_ray.sources.warc import pages_from_warc, write_warc_corpus

    out = str(tmp_path / "warc")
    n = write_warc_corpus(sf_dir, out, num_shards=4)
    rows = {r["url"]: r for r in pages_from_warc(out).take_all()}
    assert len(rows) == n
    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    for d, t, l in zip(docs.column("doc_id").to_pylist(),
                       docs.column("text").to_pylist(),
                       docs.column("lang").to_pylist()):
        exp = synth_page_record(d, t or "", l or "")
        got = rows[exp["url"]]
        assert (got["html"] or b"") == (exp["html"] or b"")
        assert (got["text"] or "") == (exp["text"] or "")
        assert got["lang"] == exp["lang"]
        assert got["warc_ts"] == exp["warc_ts"]


def test_malformed_shard_isolates(ray_session, tmp_path):
    from llm_food_ray.sources.warc import pages_from_warc

    bad = tmp_path / "w"
    bad.mkdir()
    (bad / "shard-0000.warc").write_bytes(b"garbage not warc")
    rows = pages_from_warc(str(bad)).take_all()
    assert len(rows) == 1
    assert rows[0]["url"].startswith("warc://")
