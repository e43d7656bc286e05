"""End-to-end extraction pipeline tests over the synthesized pages table:
dispatch (M1), hashing (M11), error isolation (M12), byte-identity vs the
single-threaded oracle at two parallelism levels, and resume (§4.3)."""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from llm_food_ray.config import ExtractConfig
from llm_food_ray.functions.pdf_build import simple_pdf
from llm_food_ray.pipelines.extract import read_extracted, run_extract
from llm_food_ray.schema import PAGES_SCHEMA
from llm_food_ray.sources.pages import PagesFromDocuments, synth_page_record
from llm_food_ray.stages.extract import ExtractStage, sniff_doc_type


# ------------------------------------------------------------ dispatch ----


def test_sniff_doc_type():
    assert sniff_doc_type(b"%PDF-1.4\nxx", "") == "pdf"
    assert sniff_doc_type(b"<html><body>x</body></html>", "") == "html"
    assert sniff_doc_type(b"<!DOCTYPE html><p>hi", "") == "html"
    assert sniff_doc_type(b"\x00\x01binary", "") == "unknown"
    assert sniff_doc_type(b"", "plain text here") == "text"
    assert sniff_doc_type(b"", "") == "empty"


def _stage_rows(rows: list[dict], cfg: ExtractConfig | None = None) -> list[dict]:
    batch = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    return ExtractStage(cfg)(batch).to_pylist()


def _page_row(url: str, html: bytes = b"", text: str = "") -> dict:
    import datetime

    return {"url": url, "warc_ts": datetime.datetime(2024, 1, 1),
            "html": html, "text": text, "lang": "en"}


def test_stage_error_isolation_never_drops_rows():
    rows = [
        _page_row("u1", html=b"<div><p>good content words here</p></div>"),
        _page_row("u2", html=b"%PDF-1.4 broken"),
        _page_row("u3", html=b"\xde\xad\xbe\xef garbage"),
        _page_row("u4"),   # empty
        _page_row("u5", text="plain passthrough"),
    ]
    out = _stage_rows(rows)
    assert [r["url"] for r in out] == ["u1", "u2", "u3", "u4", "u5"]
    by = {r["url"]: r for r in out}
    assert by["u1"]["status"] == "ok" and by["u1"]["markdown"]
    assert by["u2"]["status"] == "failed" and by["u2"]["error"].startswith("Error processing")
    assert by["u3"]["status"] == "failed" and by["u3"]["error"] == "Unsupported file type"
    assert by["u4"]["status"] == "failed" and by["u4"]["error"] == "Empty content"
    assert by["u5"]["status"] == "ok" and by["u5"]["markdown"] == "plain passthrough"
    # failed rows carry empty results, errors never in-band (M12)
    assert by["u2"]["markdown"] == "" and by["u2"]["texts"] == []


def test_content_hash_sha256_of_payload():
    payload = b"<div><p>hash me properly words</p></div>"
    out = _stage_rows([_page_row("u", html=payload)])
    assert out[0]["content_hash"] == hashlib.sha256(payload).hexdigest()


def test_size_guard_marks_failed():
    cfg = ExtractConfig(max_payload_bytes=100)
    out = _stage_rows([_page_row("u", html=b"<p>" + b"x" * 200 + b"</p>")], cfg)
    assert out[0]["status"] == "failed"
    assert out[0]["error"] == "File size exceeds limit"


def test_pdf_auto_routes_by_classifier():
    rich_words = [f"word{i}" for i in range(400)]   # >75 words/page
    rich = simple_pdf("Rich Doc", rich_words, words_per_line=10, lines_per_page=50)
    sparse = simple_pdf("Sparse", ["few", "words"], words_per_line=10)
    out = _stage_rows([
        _page_row("rich", html=rich), _page_row("sparse", html=sparse),
    ])
    by = {r["url"]: r for r in out}
    assert by["rich"]["markdown"].startswith("# Rich Doc")      # structured
    assert by["sparse"]["markdown"].startswith("Sparse\n")      # plain mode
    assert by["sparse"]["status"] == "ok"


def test_multipage_pdf_texts_and_joiner():
    words = [f"w{i}" for i in range(1000)]
    pdf = simple_pdf("Multi", words, words_per_line=10, lines_per_page=20)
    out = _stage_rows([_page_row("m", html=pdf)])
    r = out[0]
    assert len(r["texts"]) > 1
    assert r["markdown"] == "\n\n---\n\n".join(r["texts"])   # app.py:938 joiner
    for s in r["spans"]:
        assert r["markdown"][s["start"]:s["end"]] != ""


# ---------------------------------------------------------------- e2e ----


@pytest.fixture(scope="module")
def pages_parquet(tmp_path_factory):
    """Synthesized pages table written as 4 shards."""
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    rows = [
        synth_page_record(d, t, l)
        for d, t, l in zip(
            docs.column("doc_id").to_pylist(),
            docs.column("text").to_pylist(),
            docs.column("lang").to_pylist(),
        )
    ]
    out = tmp_path_factory.mktemp("pages")
    n = len(rows)
    paths = []
    for shard in range(4):
        t = pa.Table.from_pylist(rows[shard * n // 4:(shard + 1) * n // 4],
                                 schema=PAGES_SCHEMA)
        p = str(out / f"shard-{shard}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths, rows


def _oracle(rows: list[dict], cfg: ExtractConfig) -> dict[str, dict]:
    """Single-threaded oracle: the same semantics run without Ray."""
    stage = ExtractStage(cfg)
    return {
        r["url"]: stage.extract_row(r["url"], r["html"] or b"", r["text"] or "")
        for r in rows
    }


def test_e2e_byte_identity_and_resume(ray_session, pages_parquet, tmp_path):
    paths, rows = pages_parquet
    cfg = ExtractConfig()
    out_dir = str(tmp_path / "out")
    totals = run_extract(paths, out_dir, cfg, num_groups=4)
    assert totals["skipped_groups"] == 0
    assert totals["ok"] + totals["failed"] == len(rows)

    got = read_extracted(out_dir).to_pandas().set_index("url")
    # no dropped rows: url-set identity
    assert set(got.index) == {r["url"] for r in rows}

    oracle = _oracle(rows, cfg)
    for url, expect in oracle.items():
        row = got.loc[url]
        assert row["markdown"] == expect["markdown"], url
        assert list(row["texts"]) == expect["texts"], url
        assert row["content_hash"] == expect["content_hash"], url
        assert row["status"] == expect["status"], url
        got_spans = [dict(s) for s in row["spans"]]
        assert got_spans == expect["spans"], url

    # ---- resume: delete one manifest → only that group recomputes ----
    victim = os.path.join(out_dir, "part=2", "manifest.json")
    os.remove(victim)
    before = {p: os.path.getmtime(os.path.join(out_dir, p, "manifest.json"))
              for p in ("part=0", "part=1", "part=3")}
    totals2 = run_extract(paths, out_dir, cfg, num_groups=4)
    assert totals2["skipped_groups"] == 3
    assert totals2["ok"] == totals["ok"] and totals2["failed"] == totals["failed"]
    after = {p: os.path.getmtime(os.path.join(out_dir, p, "manifest.json"))
             for p in ("part=0", "part=1", "part=3")}
    assert before == after   # untouched partitions not rewritten
    # recomputed partition byte-identical to oracle again
    got2 = read_extracted(out_dir).to_pandas().set_index("url")
    assert set(got2.index) == set(got.index)
    for url in got2.index:
        assert got2.loc[url, "markdown"] == oracle[url]["markdown"]


def test_resume_rejects_stale_config(ray_session, pages_parquet, tmp_path):
    """A manifest written under a DIFFERENT ExtractConfig must not be
    resume-skipped: rerunning into the same out_dir with a changed config
    re-extracts every group instead of mixing stale outputs."""
    paths, rows = pages_parquet
    out_dir = str(tmp_path / "out")
    run_extract(paths, out_dir, ExtractConfig(pdf_backend="plain"),
                num_groups=4)
    cfg2 = ExtractConfig(pdf_backend="structured")
    totals = run_extract(paths, out_dir, cfg2, num_groups=4)
    assert totals["skipped_groups"] == 0   # every group re-processed
    got = read_extracted(out_dir).to_pandas().set_index("url")
    oracle = _oracle(rows, cfg2)
    for url, expect in oracle.items():
        assert got.loc[url, "markdown"] == expect["markdown"], url
    # and a rerun with the SAME config skips everything
    totals2 = run_extract(paths, out_dir, cfg2, num_groups=4)
    assert totals2["skipped_groups"] == 4


def test_parallelism_invariance(ray_session, pages_parquet, tmp_path):
    """Same input at different group counts → identical per-url results."""
    paths, rows = pages_parquet
    cfg = ExtractConfig()
    out1 = str(tmp_path / "p1")
    run_extract(paths, out1, cfg, num_groups=1)
    a = read_extracted(out1).to_pandas().set_index("url").sort_index()
    oracle = _oracle(rows, cfg)
    for url, expect in oracle.items():
        assert a.loc[url, "markdown"] == expect["markdown"]


def test_pages_from_documents_stage(ray_session):
    import ray.data as rd

    from llm_food_ray.sources.pages import pages_dataset

    ds = pages_dataset("/root/testdata/sf0.001")
    assert ds.count() == 500
    schema = ds.schema()
    assert schema.names == ["url", "warc_ts", "html", "text", "lang"]


def test_whale_leg_routes_fat_rows(ray_session):
    """Skew defusal (SURVEY §7.4): a deliberately fat PDF row crosses
    big_doc_threshold, runs on the batch_size=1 whale leg, and the union
    output is identical (per url) to the single-leg pipeline."""
    import pandas as pd

    from llm_food_ray.pipelines.extract import extract_dataset
    from tests.helpers import dataset_from_items

    whale_pdf = simple_pdf("Whale", [f"w{i}" for i in range(20000)],
                           words_per_line=10, lines_per_page=50)
    rows = [synth_page_record(i, f"body words {i} " * 5, "en") for i in range(20)]
    rows.append({"url": "https://example.com/whale", "warc_ts": rows[0]["warc_ts"],
                 "html": whale_pdf, "text": "", "lang": "en"})
    cfg = ExtractConfig(big_doc_threshold=len(whale_pdf) - 1,
                        pdf_backend="structured")
    ds = dataset_from_items(rows)

    def run(whale_leg: bool) -> pd.DataFrame:
        out = extract_dataset(dataset_from_items(rows), cfg, whale_leg=whale_leg)
        return (out.select_columns(["url", "markdown", "status"])
                   .to_pandas().set_index("url").sort_index())

    a, b = run(True), run(False)
    assert len(a) == len(rows)
    pd.testing.assert_frame_equal(a, b)
    assert a.loc["https://example.com/whale", "status"] == "ok"
    assert a.loc["https://example.com/whale", "markdown"].startswith("# Whale")


def test_run_extract_defers_whales_single_read(ray_session, tmp_path):
    """run_extract's whale handling: fat payload rows are deferred into
    __leg=deferred by phase 1 (payload carried, not extracted), finished
    by the batch_size=1 pool in phase 2, and land in __leg=done with the
    deferred partition cleaned up — identical output to plain
    extraction."""
    whale_pdf = simple_pdf("Whale", [f"w{i}" for i in range(5000)],
                           words_per_line=10, lines_per_page=50)
    rows = [synth_page_record(i, f"body words {i} " * 5, "en") for i in range(30)]
    rows.append({"url": "https://example.com/whale", "warc_ts": rows[0]["warc_ts"],
                 "html": whale_pdf, "text": "", "lang": "en"})
    src = tmp_path / "pages"
    src.mkdir()
    tbl = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    pq.write_table(tbl, str(src / "shard-0.parquet"))

    cfg = ExtractConfig(big_doc_threshold=len(whale_pdf) - 1,
                        pdf_backend="structured")
    out = str(tmp_path / "out")
    totals = run_extract([str(src / "shard-0.parquet")], out, cfg, num_groups=1)
    assert totals["ok"] == len(rows) - 2   # 2 deterministic failures (i=3,13)
    # deferred partition cleaned up after the whale pass
    assert not os.path.isdir(os.path.join(out, "part=0", "__leg=deferred"))

    got = read_extracted(out).to_pandas().set_index("url")
    assert len(got) == len(rows)
    whale = got.loc["https://example.com/whale"]
    assert whale["status"] == "ok"
    assert whale["markdown"].startswith("# Whale")
    # byte-identity vs the single-threaded oracle for every row
    stage = ExtractStage(cfg)
    for r in rows:
        o = stage.extract_row(r["url"], r["html"], r["text"])
        assert got.loc[r["url"], "markdown"] == o["markdown"]
        assert got.loc[r["url"], "content_hash"] == o["content_hash"]


def test_extract_actor_pool_path_identical(ray_session):
    """extract_dataset(concurrency=N) runs the stage as an actor pool
    (class + fn_constructor_kwargs); results must match stateless tasks."""
    from llm_food_ray.pipelines.extract import extract_dataset
    from tests.helpers import dataset_from_items

    rows = [synth_page_record(i, f"pool text {i} " * 4, "en") for i in range(40)]
    a = (extract_dataset(dataset_from_items(rows), ExtractConfig(), whale_leg=False)
         .select_columns(["url", "markdown", "status"]).to_pandas()
         .set_index("url").sort_index())
    b = (extract_dataset(dataset_from_items(rows), ExtractConfig(),
                         whale_leg=False, concurrency=2)
         .select_columns(["url", "markdown", "status"]).to_pandas()
         .set_index("url").sort_index())
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_resume_after_whale_phase_crash(ray_session, tmp_path, monkeypatch):
    """A crash AFTER phase-1 wrote data but BEFORE the manifest (e.g. mid
    whale pass) leaves a manifest-less partition; the rerun must clean it
    and produce exactly the same output as an uninterrupted run."""
    import llm_food_ray.state.manifest as mf

    whale_pdf = simple_pdf("Whale", [f"w{i}" for i in range(3000)],
                           words_per_line=10, lines_per_page=50)
    rows = [synth_page_record(i, f"crash test {i} " * 4, "en") for i in range(20)]
    rows.append({"url": "https://example.com/whale", "warc_ts": rows[0]["warc_ts"],
                 "html": whale_pdf, "text": "", "lang": "en"})
    src = tmp_path / "pages"; src.mkdir()
    pq.write_table(pa.Table.from_pylist(rows, schema=PAGES_SCHEMA),
                   str(src / "s0.parquet"))
    cfg = ExtractConfig(big_doc_threshold=len(whale_pdf) - 1,
                        pdf_backend="structured")
    out = str(tmp_path / "out")

    calls = {"n": 0}
    real = mf.write_manifest

    def bomb(*a, **k):
        calls["n"] += 1
        raise RuntimeError("injected crash before manifest")

    monkeypatch.setattr(mf, "write_manifest", bomb)
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        run_extract([str(src / "s0.parquet")], out, cfg, num_groups=1)
    assert calls["n"] == 1
    # partition has data but no manifest → not "completed"
    assert mf.completed_partitions(out) == set()

    monkeypatch.setattr(mf, "write_manifest", real)
    totals = run_extract([str(src / "s0.parquet")], out, cfg, num_groups=1)
    assert totals["skipped_groups"] == 0        # it re-ran, not skipped
    got = read_extracted(out).to_pandas()
    assert len(got) == len(rows)                # no duplicate rows
    assert set(got["url"]) == {r["url"] for r in rows}
    whale = got.set_index("url").loc["https://example.com/whale"]
    assert whale["status"] == "ok" and whale["markdown"].startswith("# Whale")


def test_concurrent_groups_match_serial(ray_session, pages_parquet, tmp_path):
    """max_concurrent_groups overlaps independent group executions;
    results and manifests must be identical to the serial loop."""
    paths, rows = pages_parquet
    cfg = ExtractConfig()
    out_s = str(tmp_path / "serial")
    out_c = str(tmp_path / "conc")
    t_s = run_extract(paths, out_s, cfg, num_groups=4)
    t_c = run_extract(paths, out_c, cfg, num_groups=4, max_concurrent_groups=3)
    assert t_s == t_c
    a = read_extracted(out_s).to_pandas().set_index("url").sort_index()
    b = read_extracted(out_c).to_pandas().set_index("url").sort_index()
    assert list(a.index) == list(b.index)
    assert (a["markdown"] == b["markdown"]).all()
    assert (a["content_hash"] == b["content_hash"]).all()


def test_file_corpus_roundtrip_matches_pages_path(ray_session, tmp_path):
    """files → read_binary_files → extract must equal the synthesized
    pages path row-for-row (urls aside): same statuses, same markdown."""
    from llm_food_ray.config import ExtractConfig
    from llm_food_ray.sources.files import (pages_from_files,
                                            write_file_corpus)
    from llm_food_ray.sources.pages import pages_dataset
    from llm_food_ray.pipelines.extract import extract_dataset

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "corpus")
    n = write_file_corpus(sf, out)
    assert n == 500
    # idempotent second call (manifest hit)
    assert write_file_corpus(sf, out) == 500

    cfg = ExtractConfig(pdf_backend="auto")
    via_files = (extract_dataset(pages_from_files(out), cfg,
                                 whale_leg=False)
                 .select_columns(["url", "status", "markdown"])
                 .to_pandas())
    via_pages = (extract_dataset(pages_dataset(sf), cfg,
                                 whale_leg=False)
                 .select_columns(["url", "status", "markdown"])
                 .to_pandas())
    via_files["doc"] = via_files.url.str.extract(r"doc(\d+)").astype(int)
    via_pages["doc"] = via_pages.url.str.extract(r"/doc/(\d+)").astype(int)
    a = via_files.sort_values("doc").reset_index(drop=True)
    b = via_pages.sort_values("doc").reset_index(drop=True)
    assert a["status"].tolist() == b["status"].tolist()
    assert a["markdown"].tolist() == b["markdown"].tolist()


def test_whale_pool_tracks_cluster_cpus(ray_session, monkeypatch):
    """The whale-finish pool max derives from the cluster CPU count
    (half, floor 2) instead of the old hard (1, 4) cap that serialized
    concurrent whales on big nodes."""
    import ray

    from llm_food_ray.pipelines.extract import _whale_pool

    lo, hi = _whale_pool()
    assert lo == 1
    assert hi == max(2, int(ray.cluster_resources()["CPU"]) // 2)

    import llm_food_ray.stages.pools as pools

    monkeypatch.setattr(pools, "scoring_pool", lambda c=None: (1, 32))
    assert _whale_pool() == (1, 16)   # 32-CPU node -> 16 > the old 4


class TestCharsetNormalize:
    def test_detect_rules(self):
        import codecs

        from llm_food_ray.functions.charset import detect_charset

        assert detect_charset("hi".encode("utf-8")) == "utf-8"
        assert detect_charset(codecs.BOM_UTF8 + b"hi") == "utf-8-sig"
        assert detect_charset("hé".encode("utf-16")) == "utf-16"
        assert detect_charset(
            b'<meta charset="ISO-8859-1">caf\xe9') == "windows-1252"
        # undeclared non-utf8 bytes fall back to 1252 (total decode)
        assert detect_charset(b"caf\xe9") == "windows-1252"

    def test_to_utf8_roundtrip(self):
        from llm_food_ray.functions.charset import to_utf8

        s = "café münü"
        for enc, expect in (("utf-8", "utf-8"), ("utf-16", "utf-16"),
                            ("windows-1252", "windows-1252")):
            payload = s.encode(enc)
            if enc == "windows-1252":
                payload = b'<meta charset="latin-1">' + payload
                out, cs = to_utf8(payload)
                assert out.decode("utf-8").endswith(s)
            else:
                out, cs = to_utf8(payload)
                assert out.decode("utf-8") == s
            assert cs == expect

    def test_stage_appends_charset(self, ray_session):
        import ray.data as rd

        from llm_food_ray.stages.extract import normalize_charset

        pages = rd.from_items([
            {"url": "u1", "html": "café".encode("utf-16")},
            {"url": "u2", "html": b""},
        ])
        rows = {r["url"]: r
                for r in normalize_charset(pages).take_all()}
        assert rows["u1"]["charset"] == "utf-16"
        assert rows["u1"]["html"].decode("utf-8") == "café"
        assert rows["u2"]["charset"] == ""


class TestFixMojibake:
    def test_round_trip_and_guards(self):
        from llm_food_ray.functions.charset import fix_mojibake

        orig = "café – №42 \U0001f642 plain"
        m1 = orig.encode("utf-8").decode("latin-1")
        m2 = m1.encode("utf-8").decode("latin-1")
        assert fix_mojibake(m1) == (orig, 1)
        assert fix_mojibake(m2) == (orig, 2)          # un-nests
        assert fix_mojibake(orig) == (orig, 0)        # >U+00FF: untouched
        assert fix_mojibake("plain ascii") == ("plain ascii", 0)
        # genuine latin-1-flavoured text: 0xE9 is a dangling utf-8
        # lead byte, so condition (iii) rejects the repair
        assert fix_mojibake("caf\xe9") == ("caf\xe9", 0)
        assert fix_mojibake("") == ("", 0)

    def test_max_rounds_bounds_unnesting(self):
        from llm_food_ray.functions.charset import fix_mojibake

        s = "é"
        for _ in range(5):
            s = s.encode("utf-8").decode("latin-1")
        fixed, rounds = fix_mojibake(s, max_rounds=3)
        assert rounds == 3 and fixed != "é"
        assert fix_mojibake(fixed, max_rounds=3) == ("é", 2)

    def test_repair_stage(self, ray_session):
        import ray.data as rd

        from llm_food_ray.stages.extract import repair_mojibake

        orig = "naïve – done"
        rows = [
            {"url": "a", "text": orig.encode("utf-8").decode("latin-1")},
            {"url": "b", "text": "clean ascii"},
            {"url": "c", "text": None},
        ]
        got = {r["url"]: r for r in
               repair_mojibake(rd.from_items(rows)).take_all()}
        assert got["a"]["text"] == orig and got["a"]["mojibake_rounds"] == 1
        assert got["b"]["text"] == "clean ascii"
        assert got["b"]["mojibake_rounds"] == 0
        assert got["c"]["text"] is None and got["c"]["mojibake_rounds"] == 0
