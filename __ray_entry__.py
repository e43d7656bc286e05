"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 (+ the training-data extensions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible one.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

Correctness design note: the engine's north input (Common-Crawl-style
``pages``) is synthesized as a *pure deterministic function* of the
driver's ``documents`` table (``llm_food_ray/sources/pages.py``), chosen
so the extraction results are reconstructible in ANSI SQL — which is what
lets the driver's DuckDB oracle check the extraction pipeline end-to-end,
not just relational ops.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

from llm_food_ray.config import ChunkConfig, ExtractConfig
from llm_food_ray.pipelines.extract import extract_dataset
from llm_food_ray.sources.pages import pages_dataset
from llm_food_ray.stages.chunk import ChunkStage
from llm_food_ray.stages.dedup import (
    dedup_exact,
    embedding_candidate_pairs,
    jaccard_pairs_exact,
    minhash_candidate_pairs,
    simhash_candidate_pairs,
)
from llm_food_ray.stages.multimodal import MediaProbeStage
from llm_food_ray.stages.similarity import IvfAssign, brute_topk, ivf_topk, train_centroids
from llm_food_ray.stages.textstats import TextStatsStage

SF_DEFAULT = "/root/testdata/sf0.001"

# Reference citations: extraction semantics llm_food/app.py:354-460,
# chunking llm_food/app.py:406-446, dedup llm_food/cli.py:206-218.

_STRUCTURED = ExtractConfig(pdf_backend="structured")
_AUTO = ExtractConfig(pdf_backend="auto")


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _events(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet")


def _centroid_sample(emb, size: int = 256) -> np.ndarray:
    """Deterministic strided sample for IVF centroid training: vectors
    whose ``vec_id % (n // size) == 0``.  Unlike ``limit(size)`` (the first
    rows in storage order — biased if vectors cluster by write order) the
    stride covers the whole key range, stays seed-free deterministic, and
    reads only the sampled rows' columns."""
    n = emb.count()
    stride = max(1, n // size)
    sample = emb.map_batches(
        lambda b: b.filter(pa.array(b.column("vec_id").to_numpy() % stride == 0)),
        batch_format="pyarrow",
    ).limit(size)
    return np.asarray(sample.to_pandas()["embedding"].tolist())


def _query_vec(sf_dir: str) -> list[float]:
    """Fixed ANN query = embedding of vec_id 0 (tiny driver-side read)."""
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=(pads.field("vec_id") == 0)
    )
    return t.column("embedding")[0].as_py()


def _augmented_docs(sf_dir: str):
    """documents + injected exact duplicates: every doc_id % 7 == 0 row is
    copied with key doc_id + 1000000 (same rule in the oracle SQL)."""
    def dup(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column("doc_id").to_numpy()
        dups = batch.filter(pa.array(ids % 7 == 0))
        dups = dups.set_column(
            dups.schema.get_field_index("doc_id"), "doc_id",
            pc.add(dups.column("doc_id"), 1000000),
        )
        return pa.concat_tables([batch, dups])

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(dup, batch_format="pyarrow")


def _augmented_embeddings(sf_dir: str):
    """embeddings + exact duplicate vectors for vec_id % 9 == 0."""
    def dup(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column("vec_id").to_numpy()
        dups = batch.filter(pa.array(ids % 9 == 0))
        dups = dups.set_column(
            dups.schema.get_field_index("vec_id"), "vec_id",
            pc.add(dups.column("vec_id"), 1000000),
        )
        return pa.concat_tables([batch, dups])

    return _embeddings(sf_dir).map_batches(dup, batch_format="pyarrow")


# --------------------------------------------------------------- entry ----


def entry() -> Any:
    """Flagship: sf0.001 pages → dispatch+extract (whale leg on) →
    extracted Dataset (url, content_hash, doc_type, markdown, texts,
    spans, status, error)."""
    pages = pages_dataset(SF_DEFAULT)
    return extract_dataset(pages, _AUTO, whale_leg=True)


# ------------------------------------------------------------- queries ----


def q_extract_pages(sf_dir: str):
    """M1/M2/M3/M11/M12/S1/S4: full extraction, structured PDF mode."""
    ds = extract_dataset(pages_dataset(sf_dir), _STRUCTURED, whale_leg=False)
    return ds.select_columns(["url", "doc_type", "status", "error", "markdown"])


def q_extract_auto(sf_dir: str):
    """M6 classifier routing (auto backend): sparse PDFs fall back to
    plain-text mode, rich ones get structured markdown."""
    ds = extract_dataset(pages_dataset(sf_dir), _AUTO, whale_leg=False)
    return ds.select_columns(["url", "doc_type", "status", "markdown"])


def q_extract_files(sf_dir: str):
    """Directory-of-files ingestion → the SAME extraction pipeline as
    the crawl path (the reference's batch file-upload surface,
    llm_food/app.py, Ray-Data-first): deterministic file corpus on
    disk → `ray.data.read_binary_files` → content-type dispatch →
    markdown.  Keys are file://doc{id}, so the synthesis-parity oracle
    is extract_auto's with a file URL."""
    import os

    from llm_food_ray.sources.files import (pages_from_files,
                                            write_file_corpus)

    out_dir = ("/tmp/llm_food_ray_files_"
               + os.path.basename(os.path.normpath(sf_dir)))
    write_file_corpus(sf_dir, out_dir)
    ds = extract_dataset(pages_from_files(out_dir), _AUTO,
                         whale_leg=False)
    return ds.select_columns(["url", "doc_type", "status", "markdown"])


def q_sitemap_parse(sf_dir: str):
    """sitemap.xml discovery: one namespaced urlset per host listing
    that host's document urls with lastmod (the crawl timestamp) and a
    deterministic priority; `webfilter.parse_sitemaps` explodes them
    and the oracle re-derives every field from the documents table."""
    import datetime as _dt

    import ray.data as rd

    from llm_food_ray.stages.webfilter import parse_sitemaps

    def build(b: pa.Table) -> pa.Table:
        by_host: dict[str, list] = {}
        for d in b.column("doc_id").to_pylist():
            by_host.setdefault(f"site{d % 100}.example.com", []).append(d)
        hosts, bodies = [], []
        for h in sorted(by_host):
            entries = []
            for d in sorted(by_host[h]):
                ts = _dt.datetime(2024, 1, 1) + _dt.timedelta(seconds=d)
                entries.append(
                    "<url>"
                    f"<loc>https://{h}/doc/{d}</loc>"
                    f"<lastmod>{ts.strftime('%Y-%m-%dT%H:%M:%SZ')}"
                    "</lastmod>"
                    f"<priority>0.{(d % 9) + 1}</priority>"
                    "</url>")
            hosts.append(h)
            bodies.append(
                '<?xml version="1.0" encoding="UTF-8"?>'
                '<urlset xmlns='
                '"http://www.sitemaps.org/schemas/sitemap/0.9">'
                + "".join(entries) + "</urlset>")
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "sitemap_xml": pa.array(bodies, pa.string())})

    ds = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
          .repartition(4)
          .map_batches(build, batch_format="pyarrow", batch_size=None))
    return parse_sitemaps(ds)


def q_content_density(sf_dir: str):
    """Readability-style main-content selection REPORT: for every HTML
    page, the winning candidate container plus its text mass / link
    mass / link density — the inspectable form of the boilerplate-strip
    heuristic the extractor applies (functions/html_md.py
    score_candidate).  Synthesis parity: the template's <article> wins
    with zero link mass and text = h1 + paragraph text."""
    from llm_food_ray.functions.html_md import (_tl_bottom_up, parse_html,
                                                select_main)
    from llm_food_ray.sources.pages import pages_dataset

    def report(batch: pa.Table) -> pa.Table:
        urls_out, tags, tls, lls, dens = [], [], [], [], []
        for u, payload in zip(batch.column("url").to_pylist(),
                              batch.column("html").to_pylist()):
            if not payload or not payload.startswith(b"<"):
                continue
            try:
                root = parse_html(payload.decode("utf-8"))
            except Exception:
                continue
            main = select_main(root)
            if main is None:
                continue
            cache: dict = {}
            _tl_bottom_up(root, cache)
            tl, ll = cache.get(id(main), (0, 0))
            urls_out.append(u)
            tags.append(main.tag)
            tls.append(tl)
            lls.append(ll)
            dens.append(round(ll / tl, 6) if tl else 0.0)
        return pa.table({
            "url": pa.array(urls_out, pa.string()),
            "main_tag": pa.array(tags, pa.string()),
            "text_len": pa.array(tls, pa.int64()),
            "link_len": pa.array(lls, pa.int64()),
            "link_density": pa.array(dens, pa.float64())})

    return pages_dataset(sf_dir).map_batches(report,
                                             batch_format="pyarrow")


def q_page_meta(sf_dir: str):
    """Per-page header metadata (first title, first h1, outlink count)
    over the HTML rows — the crawl-index sidecar table; synthesis
    parity pins title/h1 to the template strings and n_links to the
    template's 6 anchors."""
    from llm_food_ray.functions.html_md import extract_page_meta
    from llm_food_ray.sources.pages import pages_dataset

    def meta(batch: pa.Table) -> pa.Table:
        urls_out, titles, h1s, nl = [], [], [], []
        for u, payload in zip(batch.column("url").to_pylist(),
                              batch.column("html").to_pylist()):
            if not payload or not payload.startswith(b"<"):
                continue
            try:
                html = payload.decode("utf-8")
            except UnicodeDecodeError:
                continue
            m = extract_page_meta(html)
            urls_out.append(u)
            titles.append(m["title"])
            h1s.append(m["h1"])
            nl.append(m["n_links"])
        return pa.table({
            "url": pa.array(urls_out, pa.string()),
            "title": pa.array(titles, pa.string()),
            "h1": pa.array(h1s, pa.string()),
            "n_links": pa.array(nl, pa.int64())})

    return pages_dataset(sf_dir).map_batches(meta, batch_format="pyarrow")


def q_jsonld_extract(sf_dir: str):
    """schema.org JSON-LD sidecar extraction: pages synthesized with
    attribute-casing/quoting variants of the ld+json script block
    (doc_id%3 rule: single Article / @graph pair / none, with a
    malformed-JSON subset at doc_id%9==5 that must contribute nothing);
    output = one (doc_id, ld_type, name) row per top-level object, so
    the oracle is a three-way UNION over the %3 rule."""
    import json

    import ray.data as rd

    from llm_food_ray.functions.html_md import extract_jsonld

    def build_and_extract(b: pa.Table) -> pa.Table:
        ids_out, types, names = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            k = d % 3
            if k == 0:
                block = ('<script type="application/ld+json">'
                         + json.dumps({"@context": "https://schema.org",
                                       "@type": "Article",
                                       "name": f"Doc {d}",
                                       "author": {"@type": "Person",
                                                  "name": f"A{d % 7}"}})
                         + "</script>")
            elif k == 1:
                block = ("<script type='application/ld+json' async>\n"
                         + json.dumps({"@context": "https://schema.org",
                                       "@graph": [
                                           {"@type": "NewsArticle",
                                            "name": f"News {d}"},
                                           {"@type": "Person",
                                            "name": f"P{d % 5}"}]},
                                      indent=1)
                         + "\n</script >")
            elif d % 9 == 5:
                block = '<script type="application/ld+json">{broken</script>'
            else:
                block = '<script type="text/javascript">var x = 1</script>'
            html = (f"<html><head><title>t</title>{block}</head>"
                    f"<body><p>{(t or '')[:80]}</p></body></html>")
            for obj in extract_jsonld(html):
                ids_out.append(d)
                types.append(obj.get("@type"))
                names.append(obj.get("name"))
        return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                         "ld_type": pa.array(types, pa.string()),
                         "name": pa.array(names, pa.string())})

    return (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
            .map_batches(build_and_extract, batch_format="pyarrow"))


def q_template_clusters(sf_dir: str):
    """DOM template fingerprinting: three body skeletons (doc_id%3)
    carry varying article text; the structural md5 must collapse each
    class to ONE fingerprint regardless of content, so the oracle is
    md5 over the literal expected tag sequence."""
    import ray.data as rd

    from llm_food_ray.functions.html_md import template_fingerprint

    def build_and_fp(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        out = []
        for d, t in zip(ids, b.column("text").to_pylist()):
            txt = (t or "").replace("<", " ")[:120]
            k = d % 3
            if k == 0:
                html = (f"<html><body><div><h1>Doc {d}</h1>"
                        f"<p>{txt}</p><p>tail</p></div></body></html>")
            elif k == 1:
                html = (f"<html><body><article><h2>H {d}</h2>"
                        f"<ul><li>{txt}</li><li>b</li></ul>"
                        f"</article></body></html>")
            else:
                html = (f"<html><body><table><tr><td>{txt}</td></tr>"
                        f"</table><p>t</p></body></html>")
            out.append(template_fingerprint(html)[0])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "template": pa.array(out, pa.string())})

    return (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
            .map_batches(build_and_fp, batch_format="pyarrow"))


def q_link_rels(sf_dir: str):
    """rel=canonical + robots-meta extraction under a doc_id%4
    synthesis rule (none / canonical-to-predecessor with href-first
    attribute order / self-canonical + noindex,nofollow / NONE
    shorthand), reconstructed by a CASE oracle."""
    import ray.data as rd

    from llm_food_ray.functions.html_md import extract_link_rels

    def build_and_extract(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        canon, noidx, nofol = [], [], []
        for d in ids:
            k = d % 4
            if k == 0:
                head = "<title>t</title>"
            elif k == 1:
                head = (f'<link href="https://ex.com/d{d - 1}" '
                        'rel=canonical>'
                        '<meta name=robots content="index, follow">')
            elif k == 2:
                head = (f"<link rel='canonical' "
                        f"href='https://ex.com/d{d}'>"
                        '<meta name="robots" '
                        'content="noindex, nofollow">')
            else:
                head = "<meta NAME=robots CONTENT='NONE'>"
            r = extract_link_rels(
                f"<html><head>{head}</head><body>x</body></html>")
            canon.append(r["canonical"])
            noidx.append(r["noindex"])
            nofol.append(r["nofollow"])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "canonical": pa.array(canon, pa.string()),
                         "noindex": pa.array(noidx, pa.bool_()),
                         "nofollow": pa.array(nofol, pa.bool_())})

    return (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])
            .map_batches(build_and_extract, batch_format="pyarrow"))


def q_canonical_dedup(sf_dir: str):
    """End-to-end canonical-group dedup: synthesized heads →
    extract_link_rels → canonical_dedup.  doc_id%4 rule: 0 = no
    canonical (self by coalesce), 1 = canonical→predecessor (group
    {d-1, d} keeps d-1), 2 = self-canonical, 3 = DANGLING canonical
    (shared offsite target per d%10 — group keeps its min-url member).
    The oracle replays the keep rule with set SQL."""
    import ray.data as rd

    from llm_food_ray.functions.html_md import extract_link_rels
    from llm_food_ray.stages.dedup import canonical_dedup

    def build_and_extract(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        urls, canon = [], []
        for d in ids:
            k = d % 4
            if k == 0:
                head = "<title>t</title>"
            elif k == 1:
                head = (f'<link href="https://ex.com/d{d - 1}" '
                        'rel=canonical>')
            elif k == 2:
                head = (f"<link rel='canonical' "
                        f"href='https://ex.com/d{d}'>")
            else:
                head = (f'<link rel="canonical" '
                        f'href="https://ex.com/missing{d % 10}">')
            r = extract_link_rels(
                f"<html><head>{head}</head><body>x</body></html>")
            urls.append(f"https://ex.com/d{d}")
            canon.append(r["canonical"])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "url": pa.array(urls, pa.string()),
                         "canonical": pa.array(canon, pa.string())})

    pages = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
             .map_batches(build_and_extract, batch_format="pyarrow"))
    return (canonical_dedup(pages)
            .select_columns(["doc_id", "url"]))


def q_robots_parse(sf_dir: str):
    """robots.txt BODY parsing: per-host robots text synthesized with
    agent groups, comments, unknown directives and the empty-Disallow
    idiom; `webfilter.parse_robots` extracts the agent='*' group rules,
    which the oracle re-derives as the same rule union the
    robots_policy twin uses."""
    import ray.data as rd

    from llm_food_ray.stages.webfilter import parse_robots

    def build(b: pa.Table) -> pa.Table:
        ks = sorted({d % 10 for d in b.column("doc_id").to_pylist()})
        hosts, bodies = [], []
        for k in ks:
            lines = [
                "# robots for site" + str(k),
                "User-agent: badbot",
                "Disallow: /",
                "",
                "User-agent: *",
                "Disallow: /static/   # assets",
                "Crawl-delay: 1",
            ]
            if k % 3 == 0:
                lines.append("disallow: /p/")
            if k % 2 == 0:
                lines.append("Allow: /p/1")
            lines.append("Disallow:")
            hosts.append(f"site{k}.example.com")
            bodies.append("\n".join(lines))
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "robots_txt": pa.array(bodies, pa.string())})

    ds = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
          .repartition(1)
          .map_batches(build, batch_format="pyarrow", batch_size=None))
    return parse_robots(ds)


def q_charset_normalize(sf_dir: str):
    """Mixed-encoding normalization: documents re-serialized as
    utf-8 / BOM-utf-16 / meta-declared windows-1252 / BOM-utf-8
    payloads (doc_id%4 rule), sniffed + re-encoded by
    `stages.extract.normalize_charset`; the output decodes back to the
    exact constructed markup, so the oracle rebuilds both the charset
    label and the markup with pure SQL string ops."""
    import codecs

    import ray.data as rd

    from llm_food_ray.stages.extract import normalize_charset

    def build(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        payloads = []
        for d, t in zip(ids, texts):
            kind = d % 4
            meta = ('<meta charset="iso-8859-1">' if kind == 2 else "")
            markup = (f"<html><head>{meta}</head>"
                      f"<body>caf\u00e9 m\u00fcn\u00fc {t or ''}</body></html>")
            if kind == 0:
                payloads.append(markup.encode("utf-8"))
            elif kind == 1:
                payloads.append(markup.encode("utf-16"))   # LE BOM
            elif kind == 2:
                payloads.append(markup.encode("windows-1252"))
            else:
                payloads.append(codecs.BOM_UTF8 + markup.encode("utf-8"))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "html": pa.array(payloads, pa.binary())})

    pages = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
             .map_batches(build, batch_format="pyarrow"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "charset": b.column("charset"),
            "markup": pa.array([p.decode("utf-8")
                                for p in b.column("html").to_pylist()],
                               pa.string())})

    return normalize_charset(pages).map_batches(finish,
                                                batch_format="pyarrow")


def q_fix_mojibake(sf_dir: str):
    """Mojibake recovery round-trip: every doc gets a multi-width
    non-ascii suffix (2/3/4-byte utf-8 chars), then doc_id%3 picks 0,
    1 or 2 rounds of utf-8-read-as-latin-1 damage; `repair_mojibake`
    must restore the EXACT suffixed text and report the nesting depth,
    so the oracle is pure SQL — the suffixed original plus the %3
    rule."""
    import ray.data as rd

    from llm_food_ray.stages.extract import repair_mojibake

    def damage(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out = []
        for d, t in zip(ids, texts):
            s = (t or "") + " café – №42 \U0001f642"
            for _ in range(d % 3):
                s = s.encode("utf-8").decode("latin-1")
            out.append(s)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(out, pa.string())})

    pages = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
             .map_batches(damage, batch_format="pyarrow"))
    return repair_mojibake(pages)


def q_warc_ingest(sf_dir: str):
    """WARC-shard ingestion → the SAME extraction pipeline as the
    crawl path: deterministic Common-Crawl-layout shards on disk
    (per-record gzip members, HTTP response envelopes) →
    `sources/warc.pages_from_warc` → content-type dispatch → markdown.
    Urls are the synthesis urls, so the synthesis-parity extract_auto
    oracle checks the whole round trip value-level."""
    import os

    from llm_food_ray.sources.warc import (pages_from_warc,
                                           write_warc_corpus)

    out_dir = ("/tmp/llm_food_ray_warc_"
               + os.path.basename(os.path.normpath(sf_dir)))
    write_warc_corpus(sf_dir, out_dir)
    ds = extract_dataset(pages_from_warc(out_dir), _AUTO,
                         whale_leg=False)
    return ds.select_columns(["url", "doc_type", "status", "markdown"])


def q_jsonl_ingest(sf_dir: str):
    """JSONL source leg: documents round-trip through
    `write_json` → `read_json` and a per-lang rollup proves every
    field survived — the vendor-drop ingestion format."""
    from ray.data.aggregate import Count, Sum

    from llm_food_ray.sources.files import jsonl_documents

    return (jsonl_documents(sf_dir)
            .groupby("lang")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_chars", alias_name="sum_chars"),
                       Sum("doc_id", alias_name="id_sum")))


def q_csv_ingest(sf_dir: str):
    """CSV source leg: the scalar columns round-trip through
    `write_csv` → `read_csv` with a per-source rollup check."""
    from ray.data.aggregate import Count, Sum

    from llm_food_ray.sources.files import csv_documents

    return (csv_documents(sf_dir)
            .groupby("source")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_chars", alias_name="sum_chars"),
                       Sum("doc_id", alias_name="id_sum")))


def q_extract_hash(sf_dir: str):
    """M11: sha256 content hash (html + text rows — PDF bytes are not
    reconstructible in SQL)."""
    import pyarrow.compute as pc

    ds = extract_dataset(pages_dataset(sf_dir), _STRUCTURED, whale_leg=False)
    return ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("doc_type"),
                                    value_set=pa.array(["html", "text"]))),
        batch_format="pyarrow",
    ).select_columns(["url", "content_hash"])


def q_extract_status_counts(sf_dir: str):
    """F3/F4 job counters as a groupby rollup."""
    from ray.data.aggregate import Count

    ds = extract_dataset(pages_dataset(sf_dir), _STRUCTURED, whale_leg=False)
    return ds.groupby(["status", "doc_type"]).aggregate(Count(alias_name="n"))


def q_chunk_token(sf_dir: str):
    """C1 token chunker (32/8) straight over documents.text."""
    cfg = ChunkConfig(strategy="token", chunk_size=32, chunk_overlap=8)
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = ds.map_batches(
        ChunkStage(cfg, text_column="text", key_column="doc_id"),
        batch_format="pyarrow",
    )
    return out.select_columns(["doc_id", "chunk_index", "chunk_text"])


def q_chunk_spans(sf_dir: str):
    """C1 token chunker (32/8) with char-span provenance into the raw
    source text (SURVEY §1.2 spans contract; VERDICT r2 stretch #8).
    The SQL twin recomputes the offsets via token/gap window sums."""
    import pyarrow as pa

    from llm_food_ray.functions.chunk import chunk_tokens_spans

    def chunks(batch: pa.Table) -> pa.Table:
        keys, idxs, texts, starts, ends = [], [], [], [], []
        kcol = batch.column("doc_id").to_pylist()
        for k, t in zip(kcol, batch.column("text").to_pylist()):
            for i, (c, s, e) in enumerate(chunk_tokens_spans(t or "", 32, 8)):
                keys.append(k); idxs.append(i); texts.append(c)
                starts.append(s); ends.append(e)
        return pa.table({
            "doc_id": pa.array(keys, batch.schema.field("doc_id").type),
            "chunk_index": pa.array(idxs, pa.int32()),
            "chunk_text": pa.array(texts, pa.string()),
            "span_start": pa.array(starts, pa.int64()),
            "span_end": pa.array(ends, pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunks, batch_format="pyarrow")


def q_outlinks(sf_dir: str):
    """Web-graph outlink extraction: anchor (href, text) pairs from
    every HTML page, resolved to absolute URLs — the edge list a
    host-graph / anchor-text pipeline starts from.  Pure streaming map
    over the pages; no exchange."""
    import pyarrow as pa

    from llm_food_ray.functions.html_md import extract_links, resolve_href
    from llm_food_ray.sources.pages import pages_dataset

    def links(batch: pa.Table) -> pa.Table:
        urls_out, nos, hrefs, anchors, resolved = [], [], [], [], []
        urls = batch.column("url").to_pylist()
        for u, payload in zip(urls, batch.column("html").to_pylist()):
            if not payload or not payload.startswith(b"<"):
                continue
            try:
                html = payload.decode("utf-8")
            except UnicodeDecodeError:
                continue
            for i, (href, text) in enumerate(extract_links(html), start=1):
                urls_out.append(u)
                nos.append(i)
                hrefs.append(href)
                anchors.append(text)
                resolved.append(resolve_href(u, href))
        return pa.table({
            "url": pa.array(urls_out, pa.string()),
            "link_no": pa.array(nos, pa.int32()),
            "href": pa.array(hrefs, pa.string()),
            "anchor": pa.array(anchors, pa.string()),
            "resolved": pa.array(resolved, pa.string()),
        })

    return pages_dataset(sf_dir).map_batches(links, batch_format="pyarrow")


def q_anchor_texts(sf_dir: str):
    """Anchor-text aggregation per link TARGET: (resolved URL,
    n_links, distinct anchors sorted+joined) — the classic retrieval /
    target-description signal built from the outlink edge list.  Scale
    shape (r4): :func:`grouped_string_agg` — per-batch distinct-pair
    combiner, one (target, anchor) groupby.sum, then a hash(target)-
    coarse bucket rollup with vectorized run-length emit; no per-key
    ``map_groups`` anywhere (one Python group call per BUCKET, never
    per target)."""
    import pyarrow as pa

    from llm_food_ray.stages.textstats import grouped_string_agg

    links = q_outlinks(sf_dir)

    def pairs(batch: pa.Table) -> pa.Table:
        return pa.table({"target": batch.column("resolved"),
                         "anchor": batch.column("anchor")})

    return grouped_string_agg(
        links.map_batches(pairs, batch_format="pyarrow"),
        "target", "anchor", sep="|",
        count_column="n_links", agg_column="anchors")


def q_host_graph(sf_dir: str):
    """Host-level link graph: outlink edges rolled up to (src_host,
    dst_host, n_links) — the adjacency a PageRank / domain-authority /
    spam-cluster pipeline consumes.  Composition: outlink extraction
    (streaming map) → per-batch Arrow combiner → one hosts²-sized
    groupby — the exchange carries host-pair partials, never edges."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from llm_food_ray.functions.urltools import url_host

    links = q_outlinks(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        src = [url_host(u) for u in batch.column("url").to_pylist()]
        dst = [url_host(r) for r in batch.column("resolved").to_pylist()]
        t = pa.table({"src_host": pa.array(src, pa.string()),
                      "dst_host": pa.array(dst, pa.string())})
        g = t.group_by(["src_host", "dst_host"]).aggregate(
            [("dst_host", "count")])
        return g.rename_columns(["src_host", "dst_host", "pn"])

    return (links.map_batches(partial, batch_format="pyarrow")
                 .groupby(["src_host", "dst_host"])
                 .aggregate(Sum("pn", alias_name="n_links")))


def q_extract_chunks(sf_dir: str):
    """C5 convert-then-chunk fusion (/be, app.py:518-542): extraction
    output feeds the token chunker."""
    cfg = ChunkConfig(strategy="token", chunk_size=32, chunk_overlap=8)
    import pyarrow.compute as pc

    ds = extract_dataset(pages_dataset(sf_dir), _STRUCTURED, whale_leg=False)
    ok = ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("status"), "ok")),
        batch_format="pyarrow",
    )
    out = ok.map_batches(
        ChunkStage(cfg, text_column="markdown", key_column="url"),
        batch_format="pyarrow",
    )
    return out.select_columns(["url", "chunk_index", "chunk_text"])


def q_dedup_exact(sf_dir: str):
    """F6 exact dedup at scale: hash-partition + per-group first over the
    duplicate-augmented corpus."""
    kept = dedup_exact(_augmented_docs(sf_dir), "doc_id", "text")
    return kept.select_columns(["doc_id"])


def q_near_dup_clusters(sf_dir: str):
    """Near-dup CLUSTER LABELS (not just the kept-set): every document
    gets a cluster id = the min key of its connected component in the
    exact-Jaccard ≥ 0.9 pair graph (singletons label themselves).
    Cluster ids feed stratified sampling / one-per-cluster selection /
    duplication analytics.  Pairs and components are fully distributed
    (min-label propagation); the label table is bounded by duplication
    mass, so it broadcasts once and the corpus streams through a fill
    map — the same scale shape as the kept-set filter."""
    from llm_food_ray.stages.dedup import near_dup_cluster_labels

    aug = _augmented_docs(sf_dir)
    pairs = minhash_candidate_pairs(
        aug, "doc_id", "text", threshold=0.9, verify="exact",
        num_perm=128, num_bands=32,
    )
    return near_dup_cluster_labels(aug.select_columns(["doc_id"]),
                                   "doc_id", pairs)


def q_leakage_split(sf_dir: str):
    """Leakage-safe train/valid/test split: the whole near-dup
    connected component (exact-Jaccard ≥ 0.9 graph over the augmented
    docs) hashes to ONE split via the md5 bucket of its cluster id —
    near-copies can never straddle train and eval.  Same pair/label
    plan as `near_dup_clusters`, plus one streaming tag map."""
    from llm_food_ray.stages.dedup import leakage_safe_split

    aug = _augmented_docs(sf_dir)
    pairs = minhash_candidate_pairs(
        aug, "doc_id", "text", threshold=0.9, verify="exact",
        num_perm=128, num_bands=32,
    )
    return leakage_safe_split(aug.select_columns(["doc_id"]), "doc_id",
                              pairs, test_pct=10, valid_pct=10)


def q_near_dup_keep_best(sf_dir: str):
    """Near-dup kept-set under a QUALITY policy: per exact-Jaccard ≥ 0.9
    cluster keep the LONGEST text (ties → min doc_id), singletons kept —
    what production curation actually wants from N crawl copies of a
    page (keep the cleanest copy, not the lexicographically-first key).
    The injected near-dup copies (doc_id%7==0, text + ' mirror copy')
    are LONGER than their originals, so the policy provably diverges
    from the min-key kept-set.  Scale shape: pairs fully distributed,
    winner per cluster via one Max aggregate + tie-resolve join over the
    duplication-mass-bounded contender set (`dedup_near_keep_best`)."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.dedup import dedup_near_keep_best

    def dup(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        dups = batch.filter(pa.array(ids % 7 == 0))
        dups = pa.table({
            "doc_id": pc.add(dups.column("doc_id"), 1000000),
            "text": pc.binary_join_element_wise(
                dups.column("text"), " mirror copy", ""),
        })
        return pa.concat_tables([batch.select(["doc_id", "text"]), dups])

    def with_len(b: pa.Table) -> pa.Table:
        return b.append_column(
            "textlen",
            pc.cast(pc.utf8_length(b.column("text")), pa.int64()))

    aug = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(dup, batch_format="pyarrow")
           .map_batches(with_len, batch_format="pyarrow"))
    pairs = minhash_candidate_pairs(
        aug, "doc_id", "text", threshold=0.9, verify="exact",
        num_perm=128, num_bands=32,
    )
    kept = dedup_near_keep_best(aug, "doc_id", pairs, "textlen")
    return kept.select_columns(["doc_id", "textlen"])


def q_dedup_near_against(sf_dir: str):
    """Incremental NEAR dedup against an archived corpus: today's crawl
    (documents) is scrubbed of every doc whose near-dup component
    (exact-Jaccard ≥ 0.9, 3-gram shingles) touches the archive — the
    delta-crawl near-dup step (`dedup_against` handles the exact-match
    twin).  The archive = every doc_id%5==0 document re-suffixed
    (' archived copy'), so ~1/5 of the new crawl near-dups the archive
    and is dropped.  Scale shape: ONE LSH pass over the union, min-label
    components, three duplication-mass-bounded joins; nothing on the
    driver (`dedup_near_against`)."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.dedup import dedup_near_against

    def archive(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        old = batch.filter(pa.array(ids % 5 == 0))
        return pa.table({
            "doc_id": pc.add(old.column("doc_id"), 3000000),
            "text": pc.binary_join_element_wise(
                old.column("text"), " archived copy", ""),
        })

    new = _docs(sf_dir, ["doc_id", "lang", "text"])
    seen = (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(archive, batch_format="pyarrow"))
    return (dedup_near_against(new, seen, "doc_id", "text",
                               threshold=0.9)
            .select_columns(["doc_id", "lang"]))


def q_crawl_diff(sf_dir: str):
    """Snapshot-to-snapshot crawl diff: which urls were added, removed,
    or changed between two crawls, by content md5 — the planning step of
    a delta re-crawl (process the churn, skip the bulk).  Snapshot B is
    a deterministic variant of the documents table: doc_id%11==0 pages
    vanish (removed), doc_id%7==0 pages get new content (changed),
    doc_id%13==0 pages reappear under new ids (added).  Scale shape: ONE
    hash-partitioned FULL OUTER join of (key, md5) projections — the
    payload never rides, unchanged rows never leave the join workers
    (`crawl_diff`)."""
    from llm_food_ray.functions.hashing import md5_hex
    from llm_food_ray.stages.dedup import crawl_diff

    def hash_old(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "h": pa.array([md5_hex(t) for t in
                           b.column("text").to_pylist()], pa.string()),
        })

    def make_new(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        texts = b.column("text").to_pylist()
        keep = ids % 11 != 0
        changed = [t + " v2" if i % 7 == 0 else t
                   for i, t in zip(ids, texts)]
        base = pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "h": pa.array([md5_hex(t) for t, k in zip(changed, keep) if k],
                          pa.string()),
        })
        added_mask = ids % 13 == 0
        added = pa.table({
            "doc_id": pa.array(ids[added_mask] + 2000000, pa.int64()),
            "h": pa.array([md5_hex(t) for t, a in zip(texts, added_mask)
                           if a], pa.string()),
        })
        return pa.concat_tables([base, added])

    docs = _docs(sf_dir, ["doc_id", "text"])
    old = docs.map_batches(hash_old, batch_format="pyarrow")
    new = docs.map_batches(make_new, batch_format="pyarrow")
    return crawl_diff(old, new, "doc_id", "h")


def q_supplier_components(sf_dir: str):
    """Connected components with a DRIVER-CHECKED oracle: per-nation
    supplier chains (consecutive suppkeys within a nation, built in a
    25-group coarse map) are the WORST case for min-label propagation —
    the component diameter equals the chain length, so every round of
    the distributed propagation is exercised, and the expected labels
    are independently derivable (min suppkey per nation) without a
    recursive CTE.  Singleton nations label themselves via the
    cluster-label fill."""
    import numpy as np

    import ray.data as rd

    from llm_food_ray.stages.dedup import near_dup_cluster_labels

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])

    def chain(t: pa.Table) -> pa.Table:
        keys = np.sort(t.column("s_suppkey").to_numpy())
        if len(keys) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(keys[:-1]),
                         "b": pa.array(keys[1:])})

    edges = sup.groupby("s_nationkey").map_groups(
        chain, batch_format="pyarrow")
    return near_dup_cluster_labels(sup.select_columns(["s_suppkey"]),
                                   "s_suppkey", edges)


def q_pagerank(sf_dir: str):
    """Weighted PageRank over the customer→supplier purchase graph
    (edges = orders ⋈ lineitem, weight = line count): 5 rounded power
    iterations, each ONE streaming pass over the materialized edge list
    with a broadcast rank vector — the iterative-algorithm demonstrator
    (see ``stages/graph.py`` for the scale contract).  The SQL twin
    unrolls the same 5 iterations as chained CTEs with identical
    per-iteration rounding, so the ranks match bit-for-bit."""
    import pyarrow as pa

    from ray.data.aggregate import Count

    from llm_food_ray.stages.graph import pagerank

    import ray.data as rd

    from llm_food_ray.stages.joins import safe_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    lineitem = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_suppkey"])
    joined = safe_join(orders, lineitem, "inner", 16,
                       on=("o_orderkey",), right_on=("l_orderkey",))

    def tag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.binary_join_element_wise(
            pa.array(["c"] * b.num_rows),
            pc.cast(b.column("o_custkey"), pa.string()), "")
        s = pc.binary_join_element_wise(
            pa.array(["s"] * b.num_rows),
            pc.cast(b.column("l_suppkey"), pa.string()), "")
        return pa.table({"src": c, "dst": s})

    edges = (joined.map_batches(tag, batch_format="pyarrow")
                   .groupby(["src", "dst"])
                   .aggregate(Count(alias_name="w")))
    return pagerank(edges, damping=0.85, iters=5)


def q_pagination_chains(sf_dir: str):
    """Continuation detection over planted split articles: every
    doc_id%23==0 document is split into two parts with an 8-word
    overlap (part A ends with part B's opening words) — the chains
    (A → B) surface via the tail-gram ⋈ head-gram fp join with df ≤ 20
    caps on both sides."""
    from llm_food_ray.stages.dupspans import pagination_chains

    def split_docs(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        texts = b.column("text").to_pylist()
        out_id = list(ids)
        out_tx = list(texts)
        for i in np.flatnonzero(ids % 23 == 0):
            ws = (texts[i] or "").split()
            n = len(ws)
            out_id.append(int(ids[i]) + 4000000)
            out_tx.append(" ".join(ws[:n // 2 + 8]))
            out_id.append(int(ids[i]) + 5000000)
            out_tx.append(" ".join(ws[n // 2:]))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "text": pa.array(out_tx, pa.string())})

    aug = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        split_docs, batch_format="pyarrow")
    return pagination_chains(aug, "doc_id", "text", k=8, max_df=20)


def q_content_lifespan(sf_dir: str):
    """Crawl-lineage analytics over three synthesised snapshots
    (t=1..3: %13 docs appear late, %11 docs vanish after t=1, %5 docs
    churn content each revision): per distinct content hash its
    first/last snapshot and snapshot count — one streaming snapshot
    synthesis + a (hash, t) distinct groupby + a hash-keyed
    Min/Max/Count rollup."""
    from ray.data.aggregate import Count, Max, Min

    from llm_food_ray.functions.hashing import md5_hex

    def snaps(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        texts = b.column("text").to_pylist()
        hs, ts = [], []
        for t in (1, 2, 3):
            present = (ids % 13 != 0) if t == 1 else (ids % 11 != 0)
            for i in np.flatnonzero(present):
                txt = texts[i] or ""
                if ids[i] % 5 == 0 and t >= 2:
                    txt += f" rev{t}"
                hs.append(md5_hex(txt))
                ts.append(t)
        return pa.table({"content_md5": pa.array(hs, pa.string()),
                         "t": pa.array(ts, pa.int64())})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(snaps, batch_format="pyarrow")
            .groupby(["content_md5", "t"]).count()
            .map_batches(lambda b: b.select(["content_md5", "t"]),
                         batch_format="pyarrow")
            .groupby("content_md5")
            .aggregate(Min("t", alias_name="first_seen"),
                       Max("t", alias_name="last_seen"),
                       Count(alias_name="n_snaps")))


def q_cocitation(sf_dir: str):
    """Co-citation customer pairs over the high-quantity purchase
    graph (l_quantity ≥ 48 keeps the degrees pair-friendly): customers
    sharing ≥ 2 distinct suppliers, busy suppliers (in-degree > 45)
    pruned first — the df-cap pair plan applied to a graph."""
    import pyarrow as pa

    from llm_food_ray.stages.graph import cocitation_pairs

    import ray.data as rd

    from llm_food_ray.stages.joins import safe_join

    import pyarrow.compute as pc

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_quantity"])
    lineitem = lineitem.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("l_quantity"), 48))
                   .select(["l_orderkey", "l_suppkey"]),
        batch_format="pyarrow")
    joined = safe_join(orders, lineitem, "inner", 16,
                       on=("o_orderkey",), right_on=("l_orderkey",))

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("o_custkey"),
                         "dst": b.column("l_suppkey")})

    edges = joined.map_batches(proj, batch_format="pyarrow")
    return cocitation_pairs(edges, max_in_degree=45, min_shared=2)


def q_pagerank_personalized(sf_dir: str):
    """Personalized PageRank from two customer seeds over the same
    purchase graph: all teleport mass lands on the seeds (seeds-sized
    set in the task closures), otherwise the exact auto-gated
    broadcast/join machinery — bit-exact vs the CASE-seeded unrolled
    twin."""
    import pyarrow as pa

    from ray.data.aggregate import Count

    from llm_food_ray.stages.graph import pagerank

    import ray.data as rd

    from llm_food_ray.stages.joins import safe_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    lineitem = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_suppkey"])
    joined = safe_join(orders, lineitem, "inner", 16,
                       on=("o_orderkey",), right_on=("l_orderkey",))

    def tag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.binary_join_element_wise(
            pa.array(["c"] * b.num_rows),
            pc.cast(b.column("o_custkey"), pa.string()), "")
        s = pc.binary_join_element_wise(
            pa.array(["s"] * b.num_rows),
            pc.cast(b.column("l_suppkey"), pa.string()), "")
        return pa.table({"src": c, "dst": s})

    edges = (joined.map_batches(tag, batch_format="pyarrow")
                   .groupby(["src", "dst"])
                   .aggregate(Count(alias_name="w")))
    return pagerank(edges, damping=0.85, iters=5,
                    personalize=["c1", "c19"])


def q_hits(sf_dir: str):
    """HITS hubs/authorities over the same customer→supplier purchase
    graph (a natural bipartite case: customers are pure hubs, suppliers
    pure authorities): 5 rounds, two streaming edge passes per round
    with a broadcast score vector, max-normalized (L∞) so every
    denominator is order-independent — bit-exact vs the unrolled-CTE
    SQL twin."""
    import pyarrow as pa

    from ray.data.aggregate import Count

    from llm_food_ray.stages.graph import hits

    import ray.data as rd

    from llm_food_ray.stages.joins import safe_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    lineitem = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_suppkey"])
    joined = safe_join(orders, lineitem, "inner", 16,
                       on=("o_orderkey",), right_on=("l_orderkey",))

    def tag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.binary_join_element_wise(
            pa.array(["c"] * b.num_rows),
            pc.cast(b.column("o_custkey"), pa.string()), "")
        s = pc.binary_join_element_wise(
            pa.array(["s"] * b.num_rows),
            pc.cast(b.column("l_suppkey"), pa.string()), "")
        return pa.table({"src": c, "dst": s})

    edges = (joined.map_batches(tag, batch_format="pyarrow")
                   .groupby(["src", "dst"])
                   .aggregate(Count(alias_name="w")))
    return hits(edges, iters=5)


def q_wmedian_len(sf_dir: str):
    """Per-language TOKEN-weighted median doc length — 'the typical
    training token lives in a doc of length …'; integer weights keep
    the rank rule a pure int comparison."""
    from llm_food_ray.functions.repetition import split_words
    from llm_food_ray.stages.textstats import grouped_weighted_median

    def with_tokens(b: pa.Table) -> pa.Table:
        toks = [len(split_words(t or ""))
                for t in b.column("text").to_pylist()]
        return pa.table({"lang": b.column("lang"),
                         "n_chars": b.column("n_chars"),
                         "wt": pa.array(toks, pa.int64())})

    return grouped_weighted_median(
        _docs(sf_dir, ["lang", "text", "n_chars"]).map_batches(
            with_tokens, batch_format="pyarrow"),
        "lang", "n_chars", "wt")


def q_winsor_len(sf_dir: str):
    """Per-language winsorized mean length (clip at the exact
    p5/p95 quantile_disc values, then an exact-integer mean) — the
    robust average a host/lang telemetry rollup wants."""
    from llm_food_ray.stages.textstats import winsorized_mean

    return winsorized_mean(_docs(sf_dir, ["lang", "n_chars"]),
                           "lang", "n_chars")


def q_skyline(sf_dir: str):
    """2-D Pareto frontier over parts (maximize size AND retail
    price): per-block vectorized sweep prune + one frontier-bounded
    resolve — the multi-criteria selector no single score expresses."""
    import ray.data as rd

    from llm_food_ray.stages.textstats import skyline2d

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_size",
                                    "p_retailprice"])
    return skyline2d(part, "p_size", "p_retailprice",
                     keep_columns=["p_partkey"])


def q_readability(sf_dir: str):
    """Per-doc Flesch reading ease (vowel-group syllable proxy): three
    Arrow RE2 count kernels + one per-row float expression — zero
    exchanges."""
    from llm_food_ray.stages.textstats import readability

    return readability(_docs(sf_dir, ["doc_id", "text"]))


def q_kendall(sf_dir: str):
    """Global exact Kendall τ-b between n_chars and token count —
    concordance folded from the 2-D value histogram, never the n²
    pair space; the monotone-association twin of grouped_corr."""
    from llm_food_ray.functions.repetition import split_words
    from llm_food_ray.stages.textstats import kendall_tau

    def xy(b: pa.Table) -> pa.Table:
        toks = [len(split_words(t or ""))
                for t in b.column("text").to_pylist()]
        return pa.table({"x": b.column("n_chars"),
                         "y": pa.array(toks, pa.int64())})

    return kendall_tau(
        _docs(sf_dir, ["text", "n_chars"]).map_batches(
            xy, batch_format="pyarrow"), "x", "y")


def q_rank_test(sf_dir: str):
    """Per-language exact Mann–Whitney U between the even- and odd-id
    document halves on n_chars — the nonparametric distribution-shift
    test, folded from the value histogram (never n_a×n_b pairs)."""
    from llm_food_ray.stages.textstats import mannwhitney_u

    def with_side(b: pa.Table) -> pa.Table:
        import numpy as np

        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        side = np.where(d % 2 == 0, "even", "odd")
        return pa.table({"lang": b.column("lang"),
                         "side": pa.array(side.tolist(), pa.string()),
                         "n_chars": b.column("n_chars")})

    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"]).map_batches(
        with_side, batch_format="pyarrow")
    return mannwhitney_u(ds, "lang", "side", "n_chars",
                         side_a="even", side_b="odd")


def q_welch_test(sf_dir: str):
    """Per-language Welch two-sample t between the even- and odd-id
    halves on n_chars — the mean-shift member of the shift-test family
    (rank_test = ranks, ks_test = shape, prop_test = rates), folded
    from six exact int64 moments per group."""
    from llm_food_ray.stages.textstats import welch_t_test

    def with_side(b: pa.Table) -> pa.Table:
        import numpy as np

        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        side = np.where(d % 2 == 0, "even", "odd")
        return pa.table({"lang": b.column("lang"),
                         "side": pa.array(side.tolist(), pa.string()),
                         "n_chars": b.column("n_chars")})

    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"]).map_batches(
        with_side, batch_format="pyarrow")
    return welch_t_test(ds, "lang", "side", "n_chars",
                        side_a="even", side_b="odd")


def q_fdr_correct(sf_dir: str):
    """Benjamini-Hochberg FDR over a (source, lang) family of
    deterministic pseudo-p-values (hash-uniform rationals of the
    per-group doc_id sum — the SQL twin computes the identical
    rationals) — the multiple-testing tail of the shift-test family.
    Bit parity needs no snap: p*n/rank is two IEEE ops and the
    suffix-min folds the same doubles on both engines."""
    from ray.data.aggregate import Sum

    from llm_food_ray.stages.textstats import bh_fdr

    fam = (_docs(sf_dir, ["doc_id", "lang", "source"])
           .groupby(["source", "lang"])
           .aggregate(Sum("doc_id", alias_name="s")))

    def to_p(b: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        s = b.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        p = ((s % 999983).astype(np.float64) + 1.0) / 999983.0
        key = pc.binary_join_element_wise(
            b.column("source"), b.column("lang"), "|")
        return pa.table({"key": key, "p": pa.array(p)})

    return bh_fdr(fam.map_batches(to_p, batch_format="pyarrow"),
                  "p", "key", alpha=0.2)


def q_chi2_terms(sf_dir: str):
    """Per-source chi-square keywords (top-10) — the margin-normalized
    sibling of distinctive_terms: exact int64 contingency margins, one
    shared float expression, ranking on the rounded score."""
    from llm_food_ray.stages.search import chi2_terms

    return chi2_terms(_docs(sf_dir, ["source", "text"]), "source",
                      "text", k=10)


def q_llr_terms(sf_dir: str):
    """Per-source Dunning G² keywords (top-10) — the calibrated-for-
    rare-counts sibling of chi2_terms: same exact int64 margins, one
    shared obs·ln(obs·N/(rt·ct)) expression tree per cell, ranking on
    the rounded doubled sum."""
    from llm_food_ray.stages.search import llr_terms

    return llr_terms(_docs(sf_dir, ["source", "text"]), "source",
                     "text", k=10)


def q_vocab_js(sf_dir: str):
    """Jensen–Shannon vocabulary divergence between the even- and
    odd-id document halves over 64 md5 term buckets — the bounded,
    symmetric sibling of `term_drift` (PSI), emitted per bucket."""
    from llm_food_ray.stages.textstats import term_js

    docs = _docs(sf_dir, ["doc_id", "text"])

    def half(parity):
        def f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            keep = pc.equal(pc.bit_wise_and(b.column("doc_id"), 1),
                            parity)
            return b.filter(keep).select(["text"])
        return f

    ref = docs.map_batches(half(0), batch_format="pyarrow")
    new = docs.map_batches(half(1), batch_format="pyarrow")
    return term_js(new, ref, "text", n_buckets=64)


def q_zipf_slope(sf_dir: str):
    """Per-language Zipf exponent over the top-100 terms — the
    rank-frequency fingerprint (ln-count on ln-rank OLS on a snapped
    1e-5 log grid, exact integer moments)."""
    from llm_food_ray.stages.textstats import zipf_slope

    return zipf_slope(_docs(sf_dir, ["lang", "text"]), "lang", "text",
                      k=100)


def q_knn_graph(sf_dir: str):
    """Exact cosine 5-NN graph over the embeddings table → (src, dst,
    score) edges, neighbours ranked (cosine DESC, dst ASC); scores
    snapped to 4 decimals for the cross-engine compare (same snap as
    ann_topk).  Broadcast-index scan — no shuffle; the IVF-partitioned
    plan is the documented swap past the broadcast budget."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.similarity import knn_graph

    edges = knn_graph(_embeddings(sf_dir), k=5)
    return edges.map_batches(
        lambda b: b.set_column(b.schema.get_field_index("score"), "score",
                               pc.round(b.column("score"), 4)),
        batch_format="pyarrow")


def q_stratified_sample(sf_dir: str):
    """Exact-100 stratified sample of documents by language: Hamilton
    largest-remainder quotas (integer-exact), each language's quota
    smallest doc_ids kept — the mix-preserving row-budget downsample."""
    from llm_food_ray.stages.textstats import stratified_sample

    return stratified_sample(_docs(sf_dir, ["doc_id", "lang"]),
                             "lang", "doc_id", n_total=100)


def q_domain_rollup(sf_dir: str):
    """Per-registrant-domain (eTLD+1) rollup of a synthesized host mix:
    hosts 'sub{id%7}.site{id%100}.{suffix[id%8]}' over single- AND
    multi-label public suffixes collapse to 'site{id%100}.{suffix}' —
    the SQL twin derives the registrant INDEPENDENTLY of the longest-
    known-suffix logic, so a wrong suffix split breaks the hash.
    → (domain, n_docs, sum_chars)."""
    import numpy as np

    from ray.data.aggregate import Sum

    from llm_food_ray.functions.urltools import registered_domain

    suffixes = ["com", "org", "co.uk", "com.au", "net", "io", "de",
                "co.jp"]

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        sufs = np.array(suffixes, object)[ids % 8]
        doms = [registered_domain("sub%d.site%d.%s" % (i % 7, i % 100, s))
                for i, s in zip(ids.tolist(), sufs.tolist())]
        t = pa.table({"domain": pa.array(doms, pa.string()),
                      "n_chars": b.column("n_chars")})
        g = t.group_by(["domain"]).aggregate([([], "count_all"),
                                              ("n_chars", "sum")])
        return g.rename_columns(["domain", "pn", "pchars"])

    return (_docs(sf_dir, ["doc_id", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("domain")
            .aggregate(Sum("pn", alias_name="n_docs"),
                       Sum("pchars", alias_name="sum_chars")))


def q_html_tables(sf_dir: str):
    """Structured HTML-table extraction: each document's first ≤6
    tokens are laid out as a 2-column <table> (thead/tbody-free, the
    common crawl shape), the REAL DOM parser reads the cells back, and
    the result explodes to (doc_id, row_idx, col_idx, cell) — the SQL
    twin rebuilds the cells from the raw text, so a parser bug in
    tr/td handling or entity/whitespace normalization breaks the hash."""
    from llm_food_ray.functions.html_md import extract_table_cells

    def explode(b: pa.Table) -> pa.Table:
        ids, rws, cls, cells = [], [], [], []
        for doc_id, text in zip(b.column("doc_id").to_pylist(),
                                b.column("text").to_pylist()):
            toks = (text or "").split()[:6]
            if not toks:
                continue
            body = "".join(
                "<tr>" + "".join(f"<td>{t}</td>" for t in toks[i:i + 2])
                + "</tr>" for i in range(0, len(toks), 2))
            html = f"<html><body><table>{body}</table></body></html>"
            for _t, r, c, cell in extract_table_cells(html):
                ids.append(doc_id)
                rws.append(r)
                cls.append(c)
                cells.append(cell)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "row_idx": pa.array(rws, pa.int64()),
                         "col_idx": pa.array(cls, pa.int64()),
                         "cell": pa.array(cells, pa.string())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow")


def q_ngram_novelty(sf_dir: str):
    """Per-document bigram novelty: the fraction of each doc's
    distinct bigrams first owned (minimum doc_id) by that doc — the
    redundancy-ordering signal; fp-space owner groupby + ONE hash
    join, never gram strings in the exchange."""
    from llm_food_ray.stages.dupspans import ngram_novelty

    return ngram_novelty(_docs(sf_dir, ["doc_id", "text"]),
                         "doc_id", "text", k=2)


def q_media_dedup(sf_dir: str):
    """Multimodal exact dedup over the REAL (non-stubbed) media
    profile: payload → integer (length, 16 nibble counts) profile —
    identical profiles ⇒ identical byte histograms — fed through the
    standard (hash, min-key) exact-dedup machinery.  The media
    pipeline's first dedup gate (bit-identical re-encodes, mirrored
    assets) with all plumbing on the binary payload column; cosine
    NEAR-dup over these profiles is deliberately NOT oracled — the
    feature-cosine distribution is dense at every threshold (measured
    max gap ~3e-7, below the float32 verify noise), exactly the
    regime where only an exact rule is engine-reproducible."""
    import numpy as np

    from llm_food_ray.stages.dedup import dedup_exact

    def to_profile(batch: pa.Table) -> pa.Table:
        profs = []
        for t in batch.column("text").to_pylist():
            payload = (t or "").encode("utf-8")
            arr = np.frombuffer(payload, np.uint8)
            counts = np.bincount(arr >> 4, minlength=16)
            profs.append(str(len(payload)) + ":"
                         + ":".join(str(int(c)) for c in counts))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "profile": pa.array(profs, pa.string())})

    prof = _augmented_docs(sf_dir).map_batches(
        to_profile, batch_format="pyarrow")
    kept = dedup_exact(prof, "doc_id", "profile")
    return kept.select_columns(["doc_id"])


def q_source_diversity(sf_dir: str):
    """Per-host Simpson diversity of the source mix (hosts = doc_id %
    23): flags single-feed mirror hosts (0) vs mixed-provenance hosts
    (→ 1) — exact integer Σ n(n−1) moments, one division."""
    from llm_food_ray.stages.textstats import source_diversity

    def hostify(b: pa.Table) -> pa.Table:
        import numpy as np

        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        hosts = [f"site{x}" for x in d % 23]
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "source": b.column("source")})

    ds = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        hostify, batch_format="pyarrow")
    return source_diversity(ds, "host", "source")


def q_host_dup_rates(sf_dir: str):
    """Per-host duplication-mass report over the duplicate-injected
    corpus (hosts = doc_id % 97, so injected copies land on a
    DIFFERENT host): content-fp hot-set broadcast + one groups-sized
    rollup — the mirror/scraper-site ranking table."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.dedup import dup_rate_by_group

    def hostify(b: pa.Table) -> pa.Table:
        import numpy as np

        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        hosts = [f"site{x}" for x in d % 97]
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "text": b.column("text")})

    aug = _augmented_docs(sf_dir).map_batches(
        hostify, batch_format="pyarrow")
    return dup_rate_by_group(aug, "host", "text")


def q_vocab_growth(sf_dir: str):
    """Heaps-law curve: vocabulary size and token count at the
    max_id/4, /2 and full doc-id prefixes — word first-occurrences in
    fingerprint space, both coordinates folded by conditional-sum
    partials."""
    from llm_food_ray.stages.textstats import vocab_growth

    return vocab_growth(_docs(sf_dir, ["doc_id", "text"]))


def q_mad_len(sf_dir: str):
    """Per-language robust length profile: exact quantile_disc median
    and MAD of n_chars in two histogram passes + one corpus join —
    the outlier-resistant twin of mean/std length stats."""
    from llm_food_ray.stages.textstats import grouped_mad

    return grouped_mad(_docs(sf_dir, ["lang", "n_chars"]),
                       "lang", "n_chars")


def q_session_durations(sf_dir: str):
    """Per-user engagement-time rollup over 30-minute sessionize
    islands: (n_sessions, total_active_us, longest_us) — the
    gaps-and-islands duration report, integer-microsecond exact."""
    import ray.data as rd

    from llm_food_ray.stages.sessions import session_durations

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    return session_durations(ev)


def q_drift_psi(sf_dir: str):
    """PSI drift report between the even-id (reference) and odd-id
    (new) document halves on n_chars: reference decile edges bin both
    sides, per-bucket (p_new − p_ref)·ln ratio terms — the retraining
    alarm a data-quality monitor sums."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.textstats import drift_psi

    docs = _docs(sf_dir, ["doc_id", "n_chars"])

    def side(par: int):
        return docs.map_batches(
            lambda b, p=par: b.filter(pc.equal(
                pc.bit_wise_and(b.column("doc_id"), 1), p)),
            batch_format="pyarrow")

    return drift_psi(side(1), side(0), "n_chars")


def q_active_users(sf_dir: str):
    """Per-day DAU / trailing-7-day WAU / stickiness over the event
    stream — exact distinct counts via the cover expansion (each
    activity cell covers its next 7 days, one extra distinct collapses
    the window), never a distinct-in-window scan."""
    import ray.data as rd

    from llm_food_ray.stages.sessions import active_users

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])
    return active_users(ev)


def q_burst_scores(sf_dir: str):
    """Per-event-type hourly burst z-scores over the event stream —
    every observed (type, hour) cell scored against its type's mean
    via exact integer moments; the spike/anomaly feed a crawl-health
    monitor thresholds."""
    import ray.data as rd

    from llm_food_ray.stages.sessions import burst_scores

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    return burst_scores(ev)


def q_robots_policy(sf_dir: str):
    """robots.txt-style longest-prefix policy over the synthesized URL
    corpus: every host disallows /static/, every 3rd host disallows
    /p/, every even host re-allows /p/1… — RFC 9309 precedence (the
    longest matching rule wins), resolved distributed."""
    import pyarrow.compute as pc

    import ray.data as rd

    from llm_food_ray.stages.webfilter import longest_prefix_policy

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hosts, paths = [], []
        for d in ids:
            hosts.append(f"site{d % 10}.example.com")
            kind = d % 4
            if kind == 0:
                p = f"/articles/{d}/comments"
            elif kind == 1:
                p = f"/p/{d * 7 % 1000}/view"
            elif kind == 2:
                p = f"/users/u{d % 50}/posts/{d}"
            else:
                p = f"/static/img_{d}.png"
            paths.append(p)
        host = pa.array(hosts, pa.string())
        path = pa.array(paths, pa.string())
        url = pc.binary_join_element_wise(host, path, "")
        return pa.table({"url": url, "host": host, "path": path})

    urls = _docs(sf_dir, ["doc_id"]).map_batches(
        synth, batch_format="pyarrow")
    rh, rp, ra = [], [], []
    for k in range(10):
        rh.append(f"site{k}.example.com")
        rp.append("/static/")
        ra.append(False)
        if k % 3 == 0:
            rh.append(f"site{k}.example.com")
            rp.append("/p/")
            ra.append(False)
        if k % 2 == 0:
            rh.append(f"site{k}.example.com")
            rp.append("/p/1")
            ra.append(True)
    rules = rd.from_arrow(pa.table({
        "host": pa.array(rh, pa.string()),
        "prefix": pa.array(rp, pa.string()),
        "allow": pa.array(ra, pa.bool_())}))
    return longest_prefix_policy(urls, rules)


def q_politeness_order(sf_dir: str):
    """Round-robin crawl-frontier order over the synthesized URL
    corpus: every host's k-th URL fetches before any host's (k+1)-th —
    within-host ranks from one coarse exchange, the global interleave
    from the distributed row_number primitive."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.webfilter import politeness_order

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hosts, paths = [], []
        for d in ids:
            hosts.append(f"site{d % 10}.example.com")
            kind = d % 4
            if kind == 0:
                p = f"/articles/{d}/comments"
            elif kind == 1:
                p = f"/p/{d * 7 % 1000}/view"
            elif kind == 2:
                p = f"/users/u{d % 50}/posts/{d}"
            else:
                p = f"/static/img_{d}.png"
            paths.append(p)
        host = pa.array(hosts, pa.string())
        url = pc.binary_join_element_wise(
            host, pa.array(paths, pa.string()), "")
        return pa.table({"url": url, "host": host})

    urls = _docs(sf_dir, ["doc_id"]).map_batches(
        synth, batch_format="pyarrow")
    return politeness_order(urls)


def q_crawl_plan(sf_dir: str):
    """Composed crawl-planning flagship chaining the session-4 web
    operators: robots longest-prefix policy gates the synthesized URL
    frontier → water-filling allocates a 250-page global budget over
    the surviving hosts → politeness ordering interleaves, and only
    URLs inside their host's quota stay — the deterministic fetch plan
    a polite, budgeted crawler executes.  Every stage is an
    already-oracled operator; the SQL twin chains the same CTEs."""
    import pyarrow.compute as pc

    import ray.data as rd

    from llm_food_ray.stages.joins import safe_join, \
        _nonempty_blocks
    from llm_food_ray.stages.textstats import crawl_budget
    from llm_food_ray.stages.webfilter import (longest_prefix_policy,
                                               politeness_order)

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hosts, paths = [], []
        for d in ids:
            hosts.append(f"site{d % 10}.example.com")
            kind = d % 4
            if kind == 0:
                p = f"/articles/{d}/comments"
            elif kind == 1:
                p = f"/p/{d * 7 % 1000}/view"
            elif kind == 2:
                p = f"/users/u{d % 50}/posts/{d}"
            else:
                p = f"/static/img_{d}.png"
            paths.append(p)
        host = pa.array(hosts, pa.string())
        path = pa.array(paths, pa.string())
        url = pc.binary_join_element_wise(host, path, "")
        return pa.table({"url": url, "host": host, "path": path})

    urls = _docs(sf_dir, ["doc_id"]).map_batches(
        synth, batch_format="pyarrow")
    rh, rp, ra = [], [], []
    for kk in range(10):
        rh.append(f"site{kk}.example.com")
        rp.append("/static/")
        ra.append(False)
        if kk % 3 == 0:
            rh.append(f"site{kk}.example.com")
            rp.append("/p/")
            ra.append(False)
        if kk % 2 == 0:
            rh.append(f"site{kk}.example.com")
            rp.append("/p/1")
            ra.append(True)
    rules = rd.from_arrow(pa.table({
        "host": pa.array(rh, pa.string()),
        "prefix": pa.array(rp, pa.string()),
        "allow": pa.array(ra, pa.bool_())}))

    policy = longest_prefix_policy(urls, rules)
    # DISTINCT allowed urls: allowed-ness is a per-url function, and
    # the frontier may carry the same url twice — the re-attach join
    # must stay 1:m, not m:m
    allowed = (policy.map_batches(
        lambda b: b.filter(pc.equal(b.column("allowed"), True))
                   .select(["url"]),
        batch_format="pyarrow")
        .groupby("url").count()
        .map_batches(lambda b: b.select(["url"]),
                     batch_format="pyarrow")).materialize()
    allowed = _nonempty_blocks(allowed)
    if allowed is None:
        return rd.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "host": pa.array([], pa.string()),
            "host_rank": pa.array([], pa.int64()),
            "position": pa.array([], pa.int64())}))
    # re-attach host (policy output drops it): one hash join back to
    # the frontier projection
    frontier = urls.map_batches(
        lambda b: b.select(["url", "host"]), batch_format="pyarrow")
    al = (safe_join(frontier, allowed.map_batches(
        lambda b: b.rename_columns(["a_url"]),
        batch_format="pyarrow"), "inner", 16,
        on=("url",), right_on=("a_url",))
        .map_batches(lambda b: b.select(["url", "host"]),
                     batch_format="pyarrow")).materialize()
    al = _nonempty_blocks(al) or al

    ordered = politeness_order(al).materialize()
    ordered = _nonempty_blocks(ordered) or ordered
    quotas = crawl_budget(al, "host", budget=250,
                          out_key="host").materialize()
    quotas = _nonempty_blocks(quotas) or quotas

    planned = safe_join(
        ordered,
        quotas.map_batches(
            lambda b: pa.table({"q_host": b.column("host"),
                                "quota": b.column("quota")}),
            batch_format="pyarrow"),
        "inner", 16,
        on=("host",), right_on=("q_host",))

    def inside(b: pa.Table) -> pa.Table:
        keep = pc.less(b.column("host_rank"), b.column("quota"))
        return (b.filter(keep)
                 .select(["url", "host", "host_rank", "position"]))

    return planned.map_batches(inside, batch_format="pyarrow")


def q_crawl_budget(sf_dir: str):
    """Water-filling crawl budget over a skew-synthesized host
    distribution (host k owns the doc_ids in [k², (k+1)²) — linear
    count growth, the classic few-big-many-small crawl shape): global
    budget 300 pages, every host keeps min(count, waterline).  The
    waterline solves on a counts-of-counts histogram, never a per-key
    gather."""
    import numpy as np

    from llm_food_ray.stages.textstats import crawl_budget

    def hostify(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        k = np.floor(np.sqrt((d % 10000).astype(np.float64))).astype(
            np.int64)
        hosts = [f"site{x}" for x in k]
        return pa.table({"host": pa.array(hosts, pa.string())})

    ds = _docs(sf_dir, ["doc_id"]).map_batches(
        hostify, batch_format="pyarrow")
    return crawl_budget(ds, "host", budget=300, out_key="host")


def q_url_templates(sf_dir: str):
    """URL path-template mining over deterministically synthesized
    crawl URLs: digit runs collapse to '{N}' (one vectorized Arrow RE2
    pass — the site-structure discovery step a crawler uses to spot
    calendar traps and infinite facets), then (template, host) distinct
    partials → one groupby.sum → a templates-sized rollup with per-
    template distinct-host counts."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hosts, paths = [], []
        for d in ids:
            hosts.append(f"site{d % 10}.example.com")
            kind = d % 4
            if kind == 0:
                p = f"/articles/{d}/comments"
            elif kind == 1:
                p = f"/p/{d * 7 % 1000}/view"
            elif kind == 2:
                p = f"/users/u{d % 50}/posts/{d}"
            else:
                p = f"/static/img_{d}.png"
            paths.append(p)
        host = pa.array(hosts, pa.string())
        full = pc.binary_join_element_wise(
            host, pa.array(paths, pa.string()), "")
        tmpl = pc.replace_substring_regex(full, r"[0-9]+", "{N}")
        t = pa.table({"template": tmpl, "host": host})
        g = t.group_by(["template", "host"]).aggregate(
            [("host", "count")])
        return g.rename_columns(["template", "host", "pn"])

    merged = (_docs(sf_dir, ["doc_id"])
              .map_batches(synth, batch_format="pyarrow")
              .groupby(["template", "host"])
              .aggregate(Sum("pn", alias_name="n")))
    return (merged.map_batches(
        lambda b: b.select(["template", "n"]), batch_format="pyarrow")
        .groupby("template")
        .aggregate(Count(alias_name="n_hosts"),
                   Sum("n", alias_name="n_urls")))


def q_cohort_retention(sf_dir: str):
    """Weekly cohort-retention triangle over the event stream: users
    bucketed by first-event epoch week, counted once per active week —
    two users-keyed exchanges plus one hash join, final exchange
    cohorts×offsets-sized."""
    import ray.data as rd

    from llm_food_ray.stages.sessions import cohort_retention

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])
    return cohort_retention(ev)


def q_event_transitions(sf_dir: str):
    """Markov event-type transition table over per-user streams:
    (src, dst, n, p) with row-normalized probabilities — one
    hash(user) exchange, vectorized shifted-compare pair emission,
    types²-sized merge."""
    import ray.data as rd

    from llm_food_ray.stages.sessions import event_transitions

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    return event_transitions(ev)


def q_funnel(sf_dir: str):
    """view → click → purchase conversion funnel with strict-later
    first-occurrence semantics: (step_index, step, n_users) — per-user
    co-location via one coarse exchange, each stage a vectorized
    sentinel-min reduceat pass."""
    import ray.data as rd

    from llm_food_ray.stages.sessions import funnel_counts

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    return funnel_counts(ev, ["view", "click", "purchase"])


def q_bitext_mine(sf_dir: str):
    """Margin-based bitext mining between the even- and odd-id halves
    of the embedding corpus (two 'languages'): mutual rank-1 cosine
    neighbors with ratio margin ≥ 1.05 — the Artetxe-Schwenk mined-
    parallel-corpus filter on the integer cosine grid."""
    import pyarrow.compute as pc

    import ray.data as rd

    from llm_food_ray.stages.similarity import bitext_mine

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])

    def side(parity: int):
        return emb.map_batches(
            lambda b, p=parity: b.filter(pc.equal(
                pc.bit_wise_and(b.column("vec_id"), 1), p)),
            batch_format="pyarrow")

    return bitext_mine(side(0), side(1), k=4, min_margin=1.05)


def q_editdist_pairs(sf_dir: str):
    """Exact fuzzy self-join: customer-name pairs within Levenshtein
    distance 1 (typo-level entity resolution — the canonical
    short-string record-linkage primitive).  Deletion-neighborhood
    signatures turn the edit-distance predicate into an equi-join;
    an exact verify pass makes the result identical to the quadratic
    levenshtein() oracle."""
    import ray.data as rd

    from llm_food_ray.stages.fuzzy import editdist_pairs

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    return editdist_pairs(cust, "c_custkey", "c_name")


def q_reciprocity(sf_dir: str):
    """Per-node link reciprocity over a deterministic directed graph
    in doc-id space (u = id%37 → v = (11·id+3)%37): one self-join of
    the distinct edge list against its reversal — the mutual-link
    density spam signal."""
    import numpy as np

    from llm_food_ray.stages.graph import reciprocity

    def synth(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        u = d % 37
        v = (d * 11 + 3) % 37
        keep = u != v
        return pa.table({"src": pa.array(u[keep], pa.int64()),
                         "dst": pa.array(v[keep], pa.int64())})

    edges = _docs(sf_dir, ["doc_id"]).map_batches(
        synth, batch_format="pyarrow")
    return reciprocity(edges)


def _purchase_graph(sf_dir: str):
    """Shared (edges, seeds) construction for the BFS-family queries:
    the bidirectional customer↔supplier purchase graph (quantity ≥ 40,
    suppliers ride negated ids) with every 100th customer as seed."""
    import pyarrow as pa

    import pyarrow.compute as pc

    import ray.data as rd

    from llm_food_ray.stages.joins import safe_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_quantity"])
    li = li.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("l_quantity"), 40))
                   .select(["l_orderkey", "l_suppkey"]),
        batch_format="pyarrow")
    joined = safe_join(orders, li, "inner", 16,
                       on=("o_orderkey",), right_on=("l_orderkey",))

    def both_dirs(b: pa.Table) -> pa.Table:
        c = pc.cast(b.column("o_custkey"), pa.int64())
        s = pc.negate(pc.cast(b.column("l_suppkey"), pa.int64()))
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        return pa.table({"src": pa.concat_arrays([c, s]),
                         "dst": pa.concat_arrays([s, c])})

    edges = joined.map_batches(both_dirs, batch_format="pyarrow")

    def seed(b: pa.Table) -> pa.Table:
        import numpy as np

        k = b.column("c_custkey").to_numpy(zero_copy_only=False)
        keep = b.filter(pa.array(k % 100 == 1))
        return pa.table({"node": keep.column("c_custkey")})

    seeds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey"]).map_batches(
        seed, batch_format="pyarrow")
    return edges, seeds


def q_bfs_depth(sf_dir: str):
    """Multi-source BFS depth over the bidirectional purchase graph
    (every 100th customer is a trusted seed; suppliers ride negated
    ids): 3 hop rounds of join → +1 → groupby.min — the crawl-depth /
    blast-radius primitive, distance sibling of connected
    components."""
    from llm_food_ray.stages.graph import bfs_depth

    edges, seeds = _purchase_graph(sf_dir)
    return bfs_depth(edges, seeds, rounds=3)


def q_harmonic(sf_dir: str):
    """Rounds-bounded seeded harmonic centrality over the same
    purchase graph: Σ 1/d(seed, v) with integer 360360//d
    contributions — the disconnection-safe centrality a link-graph
    ranking sanity-checks PageRank against; per-seed BFS state as a
    Dataset, one join + (node, seed) groupby.min per round."""
    from llm_food_ray.stages.graph import harmonic_centrality

    edges, seeds = _purchase_graph(sf_dir)
    return harmonic_centrality(edges, seeds, rounds=3)


def q_fertility(sf_dir: str):
    """Per-language tokenizer fertility (BPE-ish tokens per whitespace
    word) — the token-budget sizing audit; exact int RE2 count sums,
    one division."""
    from llm_food_ray.stages.textstats import fertility_by_group

    return fertility_by_group(_docs(sf_dir, ["lang", "text"]), "lang")


def q_ks_test(sf_dir: str):
    """Per-language exact two-sample Kolmogorov–Smirnov D between the
    even/odd doc halves on n_chars — the shape-sensitive sibling of
    rank_test, folded from the same value histogram."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.textstats import ks_test

    def proj(b: pa.Table) -> pa.Table:
        par = pc.bit_wise_and(b.column("doc_id"), 1)
        side = pc.if_else(pc.equal(par, 0),
                          pa.array(["even"] * len(b)),
                          pa.array(["odd"] * len(b)))
        return pa.table({"lang": b.column("lang"), "side": side,
                         "n_chars": b.column("n_chars")})

    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"]).map_batches(
        proj, batch_format="pyarrow")
    return ks_test(ds, "lang", "side", "n_chars",
                   side_a="even", side_b="odd")


def q_length_outliers(sf_dir: str):
    """Per-language robust length outliers (|n_chars − median| >
    2·MAD) — the "drop weird docs" audit; exact integer keep rule,
    groups-sized (median, mad) broadcast into one streaming filter."""
    from llm_food_ray.stages.textstats import length_outliers

    return length_outliers(_docs(sf_dir, ["doc_id", "lang", "n_chars"]),
                           "lang", "n_chars", k_mad=2)


def q_c4_lines(sf_dir: str):
    """C4-style line cleaning over a deterministic line view of the
    corpus (' the ' → '.\\n', the same replace on both engines): keep
    punct-terminated ≥4-word lines without javascript/braces, rejoin;
    per-doc (n_lines, n_kept, clean) report."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.textstats import c4_line_filter

    def to_lines(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text": pc.replace_substring(
                pc.fill_null(b.column("text"), ""), " the ", ".\n"),
        })

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        to_lines, batch_format="pyarrow")
    return c4_line_filter(ds)


def q_gopher_flags(sf_dir: str):
    """Gopher-style quality-rule decomposition per doc — one integer-
    exact flag per rule plus the composed pass verdict (audit WHICH
    rule drops what, not just the verdict); pure streaming map."""
    from llm_food_ray.stages.textstats import gopher_flags

    return gopher_flags(_docs(sf_dir, ["doc_id", "text"]),
                        min_words=30)


def q_code_stats(sf_dir: str):
    """Per-doc code-vs-prose routing signals (StarCoder/StackV2-style
    corpus split): statement-ender lines, indented lines, symbol
    chars, keyword hits + a pure-integer is_code verdict; every count
    an Arrow RE2 kernel sharing its pattern with the twin."""
    from llm_food_ray.stages.textstats import code_stats

    return code_stats(_docs(sf_dir, ["doc_id", "text"]))


def q_dup_ngram_stats(sf_dir: str):
    """Within-doc duplicate trigram fractions (occurrence + char
    weighted) — the remaining Gopher §A1.1 repetition signal; pure
    streaming lexsort/run-length pass, nothing on any exchange."""
    from llm_food_ray.stages.textstats import dup_ngram_stats

    return dup_ngram_stats(_docs(sf_dir, ["doc_id", "text"]), n=3)


def q_shard_assign(sf_dir: str):
    """Token-balanced output shard layout: docs in (md5, id) order cut
    into ~2000-word shards via the distributed weighted prefix sum —
    the corpus-export sharding primitive (uniform training-file sizes,
    RNG-free, cluster-size-independent)."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.textstats import shard_assign

    def with_words(b: pa.Table) -> pa.Table:
        w = pc.cast(pc.count_substring_regex(
            pc.fill_null(b.column("text"), ""), r"[^\s]+"), pa.int64())
        return pa.table({"doc_id": b.column("doc_id"), "n_words": w})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        with_words, batch_format="pyarrow")
    return shard_assign(ds, "doc_id", "n_words", shard_budget=2000)


def q_grouped_zscore(sf_dir: str):
    """Per-doc length z-score WITHIN its language — the cross-slice
    score normalizer; exact int64 moments, one groups-sized exchange,
    broadcast assign, signed floor-snap parity."""
    from llm_food_ray.stages.textstats import grouped_zscore

    return grouped_zscore(_docs(sf_dir, ["doc_id", "lang", "n_chars"]),
                          "lang", "n_chars")


def q_media_phash(sf_dir: str):
    """Perceptual-hash media near-dup pairs: every doc_id % 9 == 0
    asset gets a LENGTH-PRESERVING head retouch (first ≤10 chars →
    'x') planted as id + 1000000; dHash over the codec-seam fake
    grayscale grid, 8×8-bit banded Hamming ≤ 7 — pigeonhole-exact, so
    the twin is the plain brute-force bit_count rule."""
    from llm_food_ray.stages.multimodal import media_phash_pairs

    def aug(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column("doc_id").to_numpy()
        sel = batch.filter(pa.array(ids % 9 == 0))
        texts = [("x" * min(10, len(t or "")))
                 + (t or "")[min(10, len(t or "")):]
                 for t in sel.column("text").to_pylist()]
        var = pa.table({"doc_id": pc.add(sel.column("doc_id"), 1000000),
                        "text": pa.array(texts, pa.string())})
        return pa.concat_tables([batch.select(["doc_id", "text"]), var])

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        aug, batch_format="pyarrow")
    return media_phash_pairs(ds, "doc_id", "text", max_hamming=7)


def q_props_flatten(sf_dir: str):
    """Typed JSON property-bag flattening over the events stream —
    props '{"k": 87}' → an int64 k column; vectorized RE2 extraction
    under the flat-object contract, zero exchanges."""
    from llm_food_ray.stages.sessions import flatten_json_props

    return flatten_json_props(
        _events(sf_dir).select_columns(["event_id", "props"]),
        "props", fields={"k": "int64"})


_DE_PARA = ("der die das und ist nicht ein eine zu den von mit "
            "auf für im sich des dem")


def q_para_lang(sf_dir: str):
    """Per-paragraph language spans (CCNet mixed-document splitter
    input): one row per non-blank paragraph with ordinal + stopword-
    coverage language; every doc_id % 4 == 0 page gets a planted
    German second paragraph so the explode and per-slice routing are
    actually exercised; pure streaming explode."""
    from llm_food_ray.stages.textstats import para_lang_spans

    def aug(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = [(t or "") + ("\n\n" + _DE_PARA if i % 4 == 0 else "")
                 for i, t in zip(ids, b.column("text").to_pylist())]
        return pa.table({"doc_id": b.column("doc_id"),
                         "text": pa.array(texts, pa.string())})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        aug, batch_format="pyarrow")
    return para_lang_spans(ds)


def q_cluster_sizes(sf_dir: str):
    """Near-dup cluster-size histogram — the dedup AUDIT report ("how
    much mass sits in how-big duplicate clusters"): cluster labels →
    per-cluster count → counts-of-counts.  Both rollups are label- and
    size-bounded exchanges; the output is tiny by construction."""
    from ray.data.aggregate import Count, Sum

    labels = q_near_dup_clusters(sf_dir)
    per_cluster = labels.groupby("cluster").aggregate(
        Count(alias_name="size"))

    def one(b: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table({"size": b.column("size"),
                         "pn": pa.array(np.ones(b.num_rows, np.int64))})

    return (per_cluster.map_batches(one, batch_format="pyarrow")
            .groupby("size")
            .aggregate(Sum("pn", alias_name="n_clusters")))


def q_dedup_near_indexed(sf_dir: str):
    """Incremental NEAR dedup against a PERSISTED signature index:
    the archive (doc_id%5==0, re-suffixed, +3000000) is signed ONCE
    into a hive-bucketed Parquet index; the delta crawl then signs
    only itself and unions with the stored signatures — the archive's
    shingling cost amortizes over every crawl.  Byte-identical to
    dedup_near_against (shared oracle + plan-equality pytest)."""
    import tempfile

    import pyarrow.compute as pc

    from llm_food_ray.stages.dedup import (dedup_near_against_index,
                                           write_minhash_index)

    def archive(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        old = batch.filter(pa.array(ids % 5 == 0))
        return pa.table({
            "doc_id": pc.add(old.column("doc_id"), 3000000),
            "text": pc.binary_join_element_wise(
                old.column("text"), " archived copy", ""),
        })

    seen = (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(archive, batch_format="pyarrow"))
    idx_dir = tempfile.mkdtemp(prefix="mh_index_")
    write_minhash_index(seen, idx_dir, "doc_id", "text",
                        num_perm=128, keep_shingles=True)
    new = _docs(sf_dir, ["doc_id", "lang", "text"])
    return (dedup_near_against_index(new, idx_dir, "doc_id", "text",
                                     threshold=0.9, num_bands=32)
            .select_columns(["doc_id", "lang"]))


def q_prop_test(sf_dir: str):
    """Per-language two-proportion z between the even/odd doc halves
    on the space-rate≥160 pass signal — "did the filter pass-rate
    shift between snapshots": four exact streaming int sums, one float
    expression, 1e-6 snap."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.textstats import two_prop_test

    def proj(b: pa.Table) -> pa.Table:
        f = _logreg_feats(b)
        par = pc.bit_wise_and(b.column("doc_id"), 1)
        side = pc.if_else(pc.equal(par, 0),
                          pa.array(["even"] * len(b)),
                          pa.array(["odd"] * len(b)))
        y = pc.cast(pc.greater_equal(f.column("x3"), 160), pa.int64())
        return pa.table({"lang": b.column("lang"), "side": side,
                         "y": y})

    ds = _docs(sf_dir, ["doc_id", "text", "lang", "source",
                        "n_chars"]).map_batches(
        proj, batch_format="pyarrow")
    return two_prop_test(ds, "lang", "side", "y",
                         side_a="even", side_b="odd")


def q_entity_spans(sf_dir: str):
    """Typed entity extraction exploded to one row per match (the
    flat-map sibling of pii_scrub, same deterministic PII footer and
    the same progressive-redaction order contract): (doc_id,
    entity_type, entity, ord)."""
    from llm_food_ray.functions.pii import extract_entities

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, types, ents, ords = [], [], [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            full = (f"{t or ''}\nContact: user{d}@mail.example.com, "
                    f"call +1-555-{d % 1000:03d}-{d % 10000:04d} or "
                    f"visit 10.{d % 256}.0.{d % 250} now")
            for et, ev, o in extract_entities(full):
                ids_out.append(d)
                types.append(et)
                ents.append(ev)
                ords.append(o)
        return pa.table({
            "doc_id": pa.array(ids_out, pa.int64()),
            "entity_type": pa.array(types, pa.string()),
            "entity": pa.array(ents, pa.string()),
            "ord": pa.array(ords, pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow")


def q_vocab_overlap(sf_dir: str):
    """Pairwise vocabulary Jaccard between the 20 sources — "which
    sources are redundant": distinct 57-bit word fps → fp-keyed
    bitmask OR → per-batch 20² Bᵀ·B intersection tiles; no pair space,
    no term strings on any exchange."""
    from llm_food_ray.stages.textstats import vocab_overlap

    return vocab_overlap(_docs(sf_dir, ["source", "text"]), "source")


def q_signal_mi(sf_dir: str):
    """Per-source mutual-information decomposition between the
    language label and the binarized space-rate signal — the
    feature-selection audit (is the cheap signal informative about
    the label): per-(source, lang, signal) exact counts + one
    identical float MI term, decomposition emitted."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.textstats import grouped_mi

    def labels(b: pa.Table) -> pa.Table:
        f = _logreg_feats(b)
        hi = pa.array(["hi"] * len(f)), pa.array(["lo"] * len(f))
        sig = pc.if_else(pc.greater_equal(f.column("x3"), 160), *hi)
        return pa.table({"source": f.column("source"),
                         "lang": b.column("lang"), "signal": sig})

    ds = _docs(sf_dir, ["text", "lang", "source", "n_chars"]).map_batches(
        labels, batch_format="pyarrow")
    return grouped_mi(ds, "source", "lang", "signal")


def q_term_drift(sf_dir: str):
    """Vocabulary-drift PSI between the even- and odd-doc_id corpus
    halves over 64 md5 term buckets — the categorical drift monitor
    between crawl snapshots: per-batch distinct-word bucket partials
    (term strings never leave the workers), per-bucket exact counts +
    one identical float expression."""
    from llm_food_ray.stages.textstats import term_psi

    docs = _docs(sf_dir, ["doc_id", "text"])

    def half(parity):
        def f(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            keep = pc.equal(pc.bit_wise_and(b.column("doc_id"), 1),
                            parity)
            return b.filter(keep).select(["text"])
        return f

    ref = docs.map_batches(half(0), batch_format="pyarrow")
    new = docs.map_batches(half(1), batch_format="pyarrow")
    return term_psi(new, ref, "text", n_buckets=64)


def q_spearman(sf_dir: str):
    """Exact global Spearman ρ between n_chars and whitespace token
    count — Pearson over doubled midranks, every moment an exact int64
    from the kendall 2-D histogram plan; the third leg of the
    correlation family (Pearson=linear, τ=monotone-pairs, ρ=monotone-
    ranks)."""
    from llm_food_ray.functions.repetition import split_words
    from llm_food_ray.stages.textstats import spearman_rho

    def xy(b: pa.Table) -> pa.Table:
        toks = [len(split_words(t or ""))
                for t in b.column("text").to_pylist()]
        return pa.table({"x": b.column("n_chars"),
                         "y": pa.array(toks, pa.int64())})

    ds = _docs(sf_dir, ["text", "n_chars"]).map_batches(
        xy, batch_format="pyarrow")
    return spearman_rho(ds, "x", "y")


def q_gini_lang(sf_dir: str):
    """Per-language exact Gini of document character mass — the
    concentration audit ("do a few documents carry all the text"):
    tie-correct closed form over the (lang, n_chars) histogram, exact
    int64 numerator, one division."""
    from llm_food_ray.stages.textstats import grouped_gini

    return grouped_gini(_docs(sf_dir, ["lang", "n_chars"]),
                        "lang", "n_chars")


def q_silhouette(sf_dir: str):
    """Per-cluster simplified-silhouette summary of the k=8 k-means
    fit over the embeddings table — the clustering-quality audit:
    round-9 assigned/runner-up squared distances, one IEEE division,
    1e-6-grid integer sums (summation-order-safe), k-row output."""
    from llm_food_ray.stages.similarity import silhouette_summary

    return silhouette_summary(_embeddings(sf_dir), k=8, iters=2,
                              modulus=61)


def q_name_entities(sf_dir: str):
    """Fuzzy entity resolution: customer names within Levenshtein
    distance 1 become edges (the exact deletion-signature join), and
    every customer gets its connected-component entity id (min key;
    singletons label themselves) — the record-linkage composition of
    `editdist_pairs` and the near-dup label machinery."""
    import ray.data as rd

    from llm_food_ray.stages.dedup import near_dup_cluster_labels
    from llm_food_ray.stages.fuzzy import editdist_pairs

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    pairs = editdist_pairs(cust, "c_custkey", "c_name").map_batches(
        lambda b: b.select(["a", "b"]), batch_format="pyarrow")
    return near_dup_cluster_labels(
        cust.select_columns(["c_custkey"]), "c_custkey", pairs)


def q_kcore(sf_dir: str):
    """5-core of the bipartite high-quantity purchase graph (customers
    positive ids, suppliers negated — one id space): 3 peel rounds
    (fixpoint by round 2 at every sf, pinned by the identically
    unrolled SQL twin), surviving nodes with their in-core degree.  The
    dense-nucleus extractor a link-spam / loyal-buyer analysis runs
    before propagation."""
    import pyarrow as pa

    import pyarrow.compute as pc

    import ray.data as rd

    from llm_food_ray.stages.joins import safe_join
    from llm_food_ray.stages.graph import kcore

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_quantity"])
    li = li.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("l_quantity"), 40))
                   .select(["l_orderkey", "l_suppkey"]),
        batch_format="pyarrow")
    joined = safe_join(orders, li, "inner", 16,
                       on=("o_orderkey",), right_on=("l_orderkey",))

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(b.column("o_custkey"), pa.int64()),
            "dst": pc.negate(pc.cast(b.column("l_suppkey"), pa.int64())),
        })

    edges = joined.map_batches(proj, batch_format="pyarrow")
    return kcore(edges, k=5, rounds=3)


def q_triangle_counts(sf_dir: str):
    """Per-supplier triangle counts over the high-quantity co-purchase
    graph (suppliers adjacent when two l_quantity ≥ 45 lineitems share
    an order — the supplier projection of the order bipartite graph).
    Triangle density is the link-farm / tight-cluster signal; the plan
    is the degree-oriented node-iterator (each triangle counted at its
    (degree, id)-minimum vertex, wedge fan-out O(√m) per node),
    integer-exact end to end."""
    import pyarrow as pa

    import pyarrow.compute as pc

    import ray.data as rd

    from llm_food_ray.stages.joins import safe_join
    from llm_food_ray.stages.graph import triangle_counts

    def hot(b: pa.Table) -> pa.Table:
        return (b.filter(pc.greater_equal(b.column("l_quantity"), 45))
                 .select(["l_orderkey", "l_suppkey"]))

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_quantity"],
    ).map_batches(hot, batch_format="pyarrow")
    right = li.map_batches(
        lambda b: b.rename_columns(["r_orderkey", "r_suppkey"]),
        batch_format="pyarrow")
    pairs = safe_join(li, right, "inner", 16,
                    on=("l_orderkey",), right_on=("r_orderkey",))

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("l_suppkey"),
                         "dst": b.column("r_suppkey")})

    edges = pairs.map_batches(proj, batch_format="pyarrow")
    return triangle_counts(edges)


def q_label_propagation(sf_dir: str):
    """Seeded majority label propagation: every 10th supplier is
    clamped to its nation label, 3 synchronous rounds spread labels
    over the high-quantity co-purchase graph — the semi-supervised
    spam/topic spreader, majority-vote sibling of
    connected_components."""
    import pyarrow as pa

    import pyarrow.compute as pc

    import ray.data as rd

    from llm_food_ray.stages.joins import safe_join
    from llm_food_ray.stages.graph import label_propagation

    def hot(b: pa.Table) -> pa.Table:
        return (b.filter(pc.greater_equal(b.column("l_quantity"), 45))
                 .select(["l_orderkey", "l_suppkey"]))

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_quantity"],
    ).map_batches(hot, batch_format="pyarrow")
    right = li.map_batches(
        lambda b: b.rename_columns(["r_orderkey", "r_suppkey"]),
        batch_format="pyarrow")
    pairs = safe_join(li, right, "inner", 16,
                    on=("l_orderkey",), right_on=("r_orderkey",))
    edges = pairs.map_batches(
        lambda b: pa.table({"src": b.column("l_suppkey"),
                            "dst": b.column("r_suppkey")}),
        batch_format="pyarrow")

    def seed(b: pa.Table) -> pa.Table:
        import numpy as np

        k = b.column("s_suppkey").to_numpy(zero_copy_only=False)
        keep = b.filter(pa.array(k % 10 == 0))
        lab = pa.array(
            ["n" + str(x)
             for x in keep.column("s_nationkey").to_pylist()],
            pa.string())
        return pa.table({"node": keep.column("s_suppkey"),
                         "label": lab})

    seeds = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
    ).map_batches(seed, batch_format="pyarrow")
    return label_propagation(edges, seeds, rounds=3)


def q_clustering_coef(sf_dir: str):
    """Local clustering coefficient per supplier over the same
    high-quantity co-purchase graph: 2T/(d(d−1)) from the shared
    degree-oriented triangle plan + one LEFT OUTER join — link-farm
    nuclei score near 1, organic hubs near 0."""
    import pyarrow as pa

    import pyarrow.compute as pc

    import ray.data as rd

    from llm_food_ray.stages.joins import safe_join
    from llm_food_ray.stages.graph import clustering_coefficients

    def hot(b: pa.Table) -> pa.Table:
        return (b.filter(pc.greater_equal(b.column("l_quantity"), 45))
                 .select(["l_orderkey", "l_suppkey"]))

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_quantity"],
    ).map_batches(hot, batch_format="pyarrow")
    right = li.map_batches(
        lambda b: b.rename_columns(["r_orderkey", "r_suppkey"]),
        batch_format="pyarrow")
    pairs = safe_join(li, right, "inner", 16,
                    on=("l_orderkey",), right_on=("r_orderkey",))

    def proj(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("l_suppkey"),
                         "dst": b.column("r_suppkey")})

    edges = pairs.map_batches(proj, batch_format="pyarrow")
    return clustering_coefficients(edges)


def q_dedup_minhash(sf_dir: str):
    """MinHash+LSH near-dup kept-set, fully distributed end to end:
    bucketed semi-join verification (exact-Jaccard, threshold 0.9) →
    min-label-propagation connected components → LEFT ANTI drop-join.
    Nothing pair-, signature- or cluster-shaped lands on the driver.

    Oracle: recursive-CTE closure over the exact-Jaccard ≥ 0.9 pair graph
    (LSH recall at 32 bands × 4 rows is 1−(1−j⁴)³² ≥ 1−2e-15 — candidate
    misses are numerically impossible, so kept-set == SQL closure)."""
    from llm_food_ray.stages.dedup import dedup_near_keep

    aug = _augmented_docs(sf_dir)
    pairs = minhash_candidate_pairs(
        aug, "doc_id", "text", threshold=0.9, verify="exact",
        num_perm=128, num_bands=32,
    )
    return dedup_near_keep(aug.select_columns(["doc_id"]), "doc_id", pairs,
                           cluster_exec="distributed")


def q_ngram_jaccard_pairs(sf_dir: str):
    """n-gram Jaccard near-dup pairs (LSH candidates → exact verify)."""
    # 64 bands × 2 rows: recall at j=0.8 is 1-(1-0.8^2)^64 ≈ 1-3e-29 —
    # candidate misses are numerically impossible, exact verify prunes
    pairs = minhash_candidate_pairs(
        _augmented_docs(sf_dir), "doc_id", "text", threshold=0.8,
        verify="exact", num_perm=128, num_bands=64,
    )

    def fmt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_arrays(
            [batch.column("a"), batch.column("b"),
             pc.round(batch.column("sim"), 4)],
            names=["a", "b", "jaccard"],
        )

    return pairs.map_batches(fmt, batch_format="pyarrow")


def q_jaccard_join(sf_dir: str):
    """EXACT all-pairs Jaccard self-join (prefix-filter / AllPairs plan,
    no LSH): deterministic-complete twin of ngram_jaccard_pairs — the
    same brute-force SQL oracle, matched by construction rather than by
    a banding recall argument."""
    pairs = jaccard_pairs_exact(_augmented_docs(sf_dir), "doc_id", "text",
                                threshold=0.8, order="df")

    def fmt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_arrays(
            [batch.column("a"), batch.column("b"),
             pc.round(batch.column("sim"), 4)],
            names=["a", "b", "jaccard"],
        )

    return pairs.map_batches(fmt, batch_format="pyarrow")


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs (4×16-bit bands, hamming ≤ 3)."""
    return simhash_candidate_pairs(_augmented_docs(sf_dir), "doc_id", "text",
                                   max_hamming=3)


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup via SRP-LSH (threshold 0.99) over the
    duplicate-augmented embeddings."""
    pairs = embedding_candidate_pairs(
        _augmented_embeddings(sf_dir), "vec_id", "embedding", threshold=0.99
    )

    def fmt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_arrays(
            [batch.column("a"), batch.column("b"),
             pc.round(batch.column("cosine"), 4)],
            names=["a", "b", "cosine"],
        )

    return pairs.map_batches(fmt, batch_format="pyarrow")


def q_dedup_embedding(sf_dir: str):
    """Embedding near-dup KEPT-SET: SRP-LSH pairs (cosine ≥ 0.99) →
    min-label-propagation clustering → LEFT ANTI drop-join — the same
    fully-distributed tail as dedup_minhash, over the embeddings table.
    Oracle: recursive closure over the exact-cosine ≥ 0.99 pair graph."""
    from llm_food_ray.stages.dedup import dedup_near_keep

    aug = _augmented_embeddings(sf_dir)
    pairs = embedding_candidate_pairs(aug, "vec_id", "embedding",
                                      threshold=0.99)
    return dedup_near_keep(aug.select_columns(["vec_id"]), "vec_id", pairs)


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 vs the vec_id-0 query vector."""
    import pyarrow.compute as pc

    q = _query_vec(sf_dir)
    top = brute_topk(_embeddings(sf_dir), q, 10)
    return top.map_batches(
        lambda b: b.set_column(b.schema.get_field_index("score"), "score",
                               pc.round(b.column("score"), 4)),
        batch_format="pyarrow",
    )


def q_ann_ivf(sf_dir: str):
    """IVF approximate top-10 (8 centroids, nprobe 4) — rows-only check;
    recall vs brute force is pytest-verified."""
    q = _query_vec(sf_dir)
    emb = _embeddings(sf_dir)
    cent = train_centroids(_centroid_sample(emb), 8)
    assigned = emb.map_batches(IvfAssign(cent), batch_format="pyarrow")
    return ivf_topk(assigned, cent, q, 10, nprobe=4, assigned=True)


def q_ann_ivf_full(sf_dir: str):
    """IVF with nprobe = n_clusters: probes every partition, so the result
    is provably identical to brute force — this pins the IVF machinery
    (assign → probe → in-partition top-k) to ann_topk's SQL oracle, while
    ann_ivf/ann_ivf_partitioned keep their approximate recall pytest."""
    import pyarrow.compute as pc

    q = _query_vec(sf_dir)
    emb = _embeddings(sf_dir)
    cent = train_centroids(_centroid_sample(emb), 8)
    assigned = emb.map_batches(IvfAssign(cent), batch_format="pyarrow")
    top = ivf_topk(assigned, cent, q, 10, nprobe=8, assigned=True)
    return top.map_batches(
        lambda b: b.set_column(b.schema.get_field_index("score"), "score",
                               pc.round(b.column("score"), 4)),
        batch_format="pyarrow",
    )


def q_ngram_lm_score(sf_dir: str):
    """Corpus bigram-LM quality scoring (CCNet-style perplexity proxy):
    train add-one-smoothed bigram counts on the corpus (partial counts →
    vocabulary-sized groupby → broadcast), then score every doc's mean
    bigram negative log-likelihood in one streaming pass."""
    from llm_food_ray.stages.lm import lm_score

    return lm_score(_docs(sf_dir, ["doc_id", "text"]))


def q_lm_cross_score(sf_dir: str):
    """CCNet-style cross-domain perplexity: train the bigram LM on the
    ENGLISH reference slice only, score EVERY document against it —
    out-of-domain (non-en) text hits the smoothing floor and scores
    high NLL.  The reference model broadcasts once; the corpus
    streams."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.lm import lm_score_against

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])
    ref = docs.map_batches(
        lambda b: b.filter(pc.equal(b.column("lang"), "en"))
                   .select(["text"]),
        batch_format="pyarrow")
    return lm_score_against(docs, ref)


def q_tfidf_terms(sf_dir: str):
    """Top-3 TF-IDF terms per document: global df partials → broadcast
    idf table → streaming per-doc top-k."""
    from llm_food_ray.stages.search import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir, ["doc_id", "text"]), k=3)


def q_dsir_weights(sf_dir: str):
    """DSIR-style hashed n-gram importance weights toward the lang='en'
    slice of the corpus (4096 md5 buckets, add-one smoothing): partial
    bucket counts → broadcast term table → streaming score."""
    from llm_food_ray.stages.dsir import dsir_weights

    return dsir_weights(_docs(sf_dir, ["doc_id", "text", "lang"]),
                        target_column="lang", target_value="en",
                        num_buckets=4096).select_columns(
                            ["doc_id", "n_grams", "log_w"])


def q_pack_sequences(sf_dir: str):
    """GPT-style training-sequence packing: the corpus token stream in
    doc_id order cut into 256-token sequences (docs cross boundaries).
    Exercises the distributed prefix-sum (block-summary offsets — the
    only exchange is the (key, count) sort); the oracle rebuilds spans
    with a SQL window cumsum + seq-range unnest."""
    from llm_food_ray.stages.packing import pack_sequences

    return pack_sequences(_docs(sf_dir, ["doc_id", "text"]), 256)


def q_bm25_search(sf_dir: str):
    """BM25 lexical top-20 for the bag-of-terms query (vector, query,
    hash): two streaming passes (blocks-sized stats partials → broadcast
    idf/avgdl → per-batch vectorized scores + local top-k → tiny global
    sort).  The SQL oracle recomputes the identical Robertson/Lucene
    formula with matching float64 expression shape."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.search import bm25_topk

    top = bm25_topk(_docs(sf_dir, ["doc_id", "text"]),
                    ("vector", "query", "hash"), 20)
    return top.map_batches(
        lambda b: b.set_column(b.schema.get_field_index("score"), "score",
                               pc.round(b.column("score"), 4)),
        batch_format="pyarrow",
    )


def q_hybrid_search(sf_dir: str):
    """Hybrid retrieval: BM25 top-50 lexical candidates fused with an
    embedding cosine rerank via Reciprocal Rank Fusion (RRF, constant
    60 — Cormack et al. SIGIR'09).  Rank fusion sidesteps score-scale
    mismatch AND float-parity pitfalls: the fused score is a pure
    function of integer ranks, each deterministic under the raw-score
    + id tiebreak that the bm25/ann oracles already pin.

    Scale shape: corpus-sized work is bm25_topk's two streaming passes
    plus ONE is_in-filtered scan of the embeddings table (the filter +
    cosine are vectorized per batch; the query vector ships once in the
    task closure).  Everything after is k-bounded (<= 50 rows), so the
    fusion itself is legitimate driver work.  Reference: llm-food has
    no retrieval surface at all (SURVEY §2.5 'Top-k ... absent');
    brief-scope similarity-search component."""
    import numpy as np
    import ray.data as rd

    from llm_food_ray.stages.search import bm25_topk
    from llm_food_ray.stages.similarity import vectors_to_matrix

    K_CAND, K_OUT, RRF = 50, 20, 60
    cands = bm25_topk(_docs(sf_dir, ["doc_id", "text"]),
                      ("vector", "query", "hash"), K_CAND).take_all()
    ids = np.array([r["doc_id"] for r in cands], dtype=np.int64)
    bscore = np.array([r["score"] for r in cands], dtype=np.float64)
    order_b = np.lexsort((ids, -bscore))
    r_b = np.empty(len(ids), dtype=np.int64)
    r_b[order_b] = np.arange(1, len(ids) + 1)

    q = np.asarray(_query_vec(sf_dir), dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0
    id_set = pa.array(np.sort(ids))

    def cos(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = batch.filter(pc.is_in(batch.column("vec_id"),
                                  value_set=id_set))
        if m.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cs": pa.array([], pa.float64())})
        mat = vectors_to_matrix(m.column("embedding"))
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        # DuckDB-style dot/(|a|·|b|) so both sides order identically
        cs = (mat @ q) / (norms * qn)
        return pa.table({"vec_id": m.column("vec_id"),
                         "cs": pa.array(cs, pa.float64())})

    reranked = pa.concat_tables(
        b for b in _embeddings(sf_dir)
        .map_batches(cos, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"))
    cid = reranked.column("vec_id").to_numpy()
    cs = reranked.column("cs").to_numpy()
    order_c = np.lexsort((cid, -cs))
    rank_of = {int(cid[i]): r + 1 for r, i in enumerate(order_c)}
    r_c = np.array([rank_of[int(d)] for d in ids], dtype=np.int64)

    rrf = 1.0 / (RRF + r_b) + 1.0 / (RRF + r_c)
    top = np.lexsort((ids, -rrf))[:K_OUT]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids[top]),
        "rank_bm25": pa.array(r_b[top]),
        "rank_cos": pa.array(r_c[top]),
        "rrf": pa.array(np.round(rrf[top], 6), pa.float64()),
    }))


def q_cluster_assign(sf_dir: str):
    """Corpus clustering by nearest-seed cosine: 8 deterministic seed
    vectors (smallest vec_ids with vec_id % 61 == 0), every vector
    assigned to its best seed — one broadcast matmul per batch, no
    shuffle.  Unlike the k-means IVF queries (recall-pytested), the
    seed rule makes the full assignment SQL-reconstructible."""
    from llm_food_ray.stages.similarity import SeedAssign, strided_seed_vectors

    emb = _embeddings(sf_dir)
    seed_ids, seeds = strided_seed_vectors(emb, modulus=61, k=8)
    return emb.map_batches(SeedAssign(seed_ids, seeds),
                           batch_format="pyarrow")


def q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd k-means over the full embeddings table (k=8,
    2 iterations, deterministic strided seeds): per iteration one
    streaming pass emitting k×(d+1)-float block partials, driver-folded
    centroids, no shuffle.  Bit-exact vs the unrolled-CTE SQL twin via
    per-iteration round-9 pins (the pagerank recipe)."""
    from llm_food_ray.stages.similarity import kmeans_fit

    return kmeans_fit(_embeddings(sf_dir), k=8, iters=2, modulus=61)


def q_hard_negatives(sf_dir: str):
    """Contrastive hard negatives: per vector the same-k-means-cluster
    vector with the LOWEST round-4 cosine (ties → smallest key) — the
    semdedup plan with an argmin instead of a threshold."""
    from llm_food_ray.stages.similarity import hard_negatives

    return hard_negatives(_embeddings(sf_dir), k=8, iters=2, modulus=61)


def q_diverse_sample(sf_dir: str):
    """Coverage-stratified sample: 10 smallest-md5 keys per bit-exact
    k-means cluster — kmeans assign + the cap_per_group candidate/
    broadcast-filter machinery, RNG-free."""
    from llm_food_ray.stages.similarity import diverse_sample

    return diverse_sample(_embeddings(sf_dir), n_per_cluster=10, k=8,
                          iters=2, modulus=61)


def q_embedding_outliers(sf_dir: str):
    """Off-manifold vector flags: round-9 squared distance to the
    bit-exact k-means centroid, per-cluster moment fold (k×3 floats on
    the driver), round-6 z-score ≥ 1.5 — two streaming passes, nothing
    vector-shaped leaves the workers."""
    from llm_food_ray.stages.similarity import embedding_outliers

    return embedding_outliers(_embeddings(sf_dir), k=8, iters=2,
                              modulus=61, z_threshold=1.5)


def q_random_project(sf_dir: str):
    """JL random projection 64→16 dims: one streaming matmul per batch
    against the deterministic md5-sign matrix (rebuilt per worker from
    the hash rule, nothing broadcast) — the value-checkable twin of the
    eigen-ambiguous `pca_project` (which stays pytest-pinned)."""
    from llm_food_ray.stages.similarity import random_project

    return random_project(_embeddings(sf_dir), out_dim=16)


def q_semdedup(sf_dir: str):
    """SemDedup over the duplicate-augmented embeddings: bit-exact
    distributed k-means (k=8, 2 iters) assigns clusters, then each
    cluster drops every vector dominated by a lower-key neighbour with
    round-4 cosine ≥ 0.4 — exact duplicates and natural semantic
    near-pairs both go.  One hash partition by cluster; per-group
    matmul bounded by the k ≈ N/5k operating regime."""
    from llm_food_ray.stages.similarity import semdedup

    return semdedup(_augmented_embeddings(sf_dir), k=8, iters=2,
                    modulus=61, tau=0.4)


def q_embedding_cov(sf_dir: str):
    """Distributed covariance of the embedding corpus (the PCA /
    whitening building block): one streaming pass of d²+d+1-float block
    partials, driver fold with round-9 sum pins, long-form (i, j, cov)
    output.  SQL twin rebuilds the identical rounded sums via a double
    LATERAL unnest."""
    import numpy as np

    import ray.data as rd

    from llm_food_ray.stages.similarity import embedding_moments

    _, _, cov = embedding_moments(_embeddings(sf_dir))
    d = cov.shape[0]
    return rd.from_arrow(pa.table({
        "i": pa.array(np.repeat(np.arange(d, dtype=np.int64), d)),
        "j": pa.array(np.tile(np.arange(d, dtype=np.int64), d)),
        "cov": pa.array(cov.ravel(), pa.float64()),
    }))


def q_pca_project(sf_dir: str):
    """Top-2 PCA projection of every embedding (driver-side eigh on the
    distributed covariance, streaming projection matmul).  Eigenvectors
    are sign/rotation-ambiguous across linear-algebra backends, so this
    is pytest-pinned (variance ordering + reconstruction), not
    SQL-oracled; the covariance input IS oracled (`embedding_cov`)."""
    from llm_food_ray.stages.similarity import pca_project

    return pca_project(_embeddings(sf_dir), k=2)


def q_extract_spans(sf_dir: str):
    """north_rule spans column: per-document block offsets into
    ``markdown``, exploded to one row per span (url, span_index, start,
    end, kind) — SQL-reconstructible for the structured backend."""
    ds = extract_dataset(pages_dataset(sf_dir), _STRUCTURED, whale_leg=False)

    def explode(batch: pa.Table) -> pa.Table:
        urls, idxs, starts, ends, kinds = [], [], [], [], []
        for url, spans in zip(batch.column("url").to_pylist(),
                              batch.column("spans").to_pylist()):
            for i, s in enumerate(spans or []):
                urls.append(url)
                idxs.append(i)
                starts.append(s["start"])
                ends.append(s["end"])
                kinds.append(s["kind"])
        return pa.Table.from_arrays(
            [pa.array(urls, pa.string()), pa.array(idxs, pa.int64()),
             pa.array(starts, pa.int64()), pa.array(ends, pa.int64()),
             pa.array(kinds, pa.string())],
            names=["url", "span_index", "start", "end", "kind"],
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def _pdf_pages_input(sf_dir: str):
    """Deterministic multi-page PDF corpus: every document becomes a PDF
    (title line + body flowed 10 words/line, 5 lines/page → page 1 holds
    40 body words, later pages 50)."""
    from llm_food_ray.functions.pdf_build import simple_pdf
    from llm_food_ray.sources.pages import url_for

    def build(batch: pa.Table) -> pa.Table:
        urls, payloads = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            urls.append(url_for(d))
            payloads.append(simple_pdf(f"Document {d}", (t or "").split(),
                                       words_per_line=10, lines_per_page=5))
        return pa.Table.from_arrays(
            [pa.array(urls, pa.string()), pa.array(payloads, pa.binary())],
            names=["url", "html"],
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(build, batch_format="pyarrow")


def q_pdf_pages_explode(sf_dir: str):
    """F1 page-explode leg (app.py:1044-1114 shape): one row per PDF page
    with per-page markdown, 1-based page_number."""
    from llm_food_ray.stages.pages_explode import ExplodePdfPages

    ds = _pdf_pages_input(sf_dir).map_batches(
        ExplodePdfPages(structured=True), batch_format="pyarrow", batch_size=64
    )
    return ds.select_columns(["url", "page_number", "page_markdown"])


def q_pdf_reaggregate(sf_dir: str):
    """F2 re-aggregation (app.py:1243-1277): exploded pages →
    groupby(url) → ORDER BY page_number → join with the page joiner —
    the url-keyed shuffle leg for whale PDFs."""
    from llm_food_ray.stages.pages_explode import explode_extract_reaggregate

    ds = explode_extract_reaggregate(_pdf_pages_input(sf_dir), structured=True)
    return ds.select_columns(["url", "markdown"])


def _office_pages(sf_dir: str, fmt: str):
    """documents → pages whose payload is a deterministic DOCX/RTF/PPTX
    built from the text (M8/M9/M10 parity inputs)."""
    from llm_food_ray.functions.office_build import (
        build_docx, build_pptx, build_rtf)
    from llm_food_ray.sources.pages import url_for

    def build(batch: pa.Table) -> pa.Table:
        urls, payloads = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            urls.append(url_for(d))
            t = t or ""
            if fmt == "docx":
                payloads.append(build_docx([("h1", f"Document {d}"), ("p", t)]))
            elif fmt == "rtf":
                payloads.append(build_rtf([t]))
            else:   # pptx: 20 words per slide, one paragraph each
                toks = t.split()
                slides = [[" ".join(toks[i:i + 20])]
                          for i in range(0, len(toks), 20)] or [[]]
                payloads.append(build_pptx(slides))
        return pa.Table.from_arrays(
            [pa.array(urls, pa.string()), pa.array(payloads, pa.binary()),
             pa.nulls(len(urls), pa.string())],
            names=["url", "html", "text"],
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(build, batch_format="pyarrow")


def _extract_office(sf_dir: str, fmt: str):
    from llm_food_ray.stages.extract import ExtractStage

    ds = _office_pages(sf_dir, fmt).map_batches(
        ExtractStage(_STRUCTURED), batch_format="pyarrow")
    return ds.select_columns(["url", "doc_type", "status", "markdown"])


def q_extract_docx(sf_dir: str):
    """M8 DOCX → markdown (mammoth+markdownify contract, app.py:215-222)."""
    return _extract_office(sf_dir, "docx")


def q_extract_rtf(sf_dir: str):
    """M9 RTF → plain text (striprtf contract, app.py:225-229)."""
    return _extract_office(sf_dir, "rtf")


def q_extract_pptx(sf_dir: str):
    """M10 PPTX → per-slide texts joined with the page joiner
    (app.py:232-249 + 938)."""
    return _extract_office(sf_dir, "pptx")


def _punct_docs(sf_dir: str):
    """documents.text with a period appended to every 8th token (and the
    last) — gives the sentence splitter real boundaries while staying a
    pure SQL-reconstructible function of the text."""
    def punct(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column("text").to_pylist():
            toks = (t or "").split()
            n = len(toks)
            out.append(" ".join(
                tok + "." if ((i + 1) % 8 == 0 or i + 1 == n) else tok
                for i, tok in enumerate(toks)
            ))
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(out, pa.string())],
            names=["doc_id", "text"],
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(punct, batch_format="pyarrow")


def q_chunk_sentence(sf_dir: str):
    """C2 sentence chunker (greedy whole-sentence packing, 32/8) over
    punctuated text — with 8-token sentences the packing stride is
    exactly 3 sentences, which the SQL oracle reproduces."""
    cfg = ChunkConfig(strategy="sentence", chunk_size=32, chunk_overlap=8)
    out = _punct_docs(sf_dir).map_batches(
        ChunkStage(cfg, text_column="text", key_column="doc_id"),
        batch_format="pyarrow",
    )
    return out.select_columns(["doc_id", "chunk_index", "chunk_text"])


def q_chunk_recursive(sf_dir: str):
    """C3 recursive chunker (paragraph → line → sentence → token window,
    greedy merge, no overlap, size 32) over punctuated text."""
    cfg = ChunkConfig(strategy="recursive", chunk_size=32, chunk_overlap=0)
    out = _punct_docs(sf_dir).map_batches(
        ChunkStage(cfg, text_column="text", key_column="doc_id"),
        batch_format="pyarrow",
    )
    return out.select_columns(["doc_id", "chunk_index", "chunk_text"])


def q_multimodal_resize(sf_dir: str):
    """Multimodal resize stage through the codec seam (FakeCodec:
    sha256[:16] + packed target dims), payload = text bytes; output
    hex-encoded so the DuckDB oracle can rebuild it."""
    from llm_food_ray.stages.multimodal import MediaResizeStage

    def to_payload(batch: pa.Table) -> pa.Table:
        payloads = [(t or "").encode("utf-8") for t in batch.column("text").to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(payloads, pa.binary())],
            names=["doc_id", "payload"],
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(to_payload, batch_format="pyarrow")
    resized = ds.map_batches(MediaResizeStage(width=224, height=168),
                             batch_format="pyarrow", batch_size=32)

    def to_hex(batch: pa.Table) -> pa.Table:
        hexes = [r.hex() for r in batch.column("resized").to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(hexes, pa.string())],
            names=["doc_id", "resized_hex"],
        )

    return resized.map_batches(to_hex, batch_format="pyarrow")


def q_frame_sample(sf_dir: str):
    """Frame-sampling flat-map (evenly-spaced indices, the reference's
    PDF page-sampling rule pdf_utils.py:33-38): one row per sampled
    frame; FakeCodec derives n_frames from payload size."""
    from llm_food_ray.stages.multimodal import FrameSampleStage

    def to_payload(batch: pa.Table) -> pa.Table:
        payloads = [(t or "").encode("utf-8") for t in batch.column("text").to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(payloads, pa.binary())],
            names=["doc_id", "payload"],
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(to_payload, batch_format="pyarrow")
    return ds.map_batches(
        FrameSampleStage(n_samples=4, key_column="doc_id"),
        batch_format="pyarrow", batch_size=32,
    )


def q_ann_ivf_partitioned(sf_dir: str):
    """IVF index persisted as cluster-partitioned Parquet; the query
    reads ONLY the nprobe probed partitions (I/O-level pruning — the
    scale path). Rows-only check (approximate); recall is
    pytest-verified."""
    import os
    import shutil
    import tempfile

    from llm_food_ray.stages.similarity import ivf_query_index, ivf_write_index

    q = _query_vec(sf_dir)
    emb = _embeddings(sf_dir)
    cent = train_centroids(_centroid_sample(emb), 8)
    out = os.path.join(tempfile.gettempdir(),
                       f"ivf_index_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    ivf_write_index(emb, cent, out)
    return ivf_query_index(out, q, 10, nprobe=4)


def q_lang_counts(sf_dir: str):
    """Tiny groupby rollup on a dimension column."""
    from ray.data.aggregate import Count

    return _docs(sf_dir, ["lang"]).groupby("lang").aggregate(Count(alias_name="n"))


def q_distinct_lengths(sf_dir: str):
    """Exact per-language COUNT(DISTINCT n_chars) — cardinality
    telemetry (vocabulary sizes, hosts per TLD, distinct lengths per
    language) via per-batch distinct partials, one (key, value)-keyed
    exchange, and a tiny key-keyed count; nothing on the driver
    (`grouped_count_distinct`)."""
    from llm_food_ray.stages.textstats import grouped_count_distinct

    return grouped_count_distinct(_docs(sf_dir, ["lang", "n_chars"]),
                                  "lang", "n_chars")


def q_token_stats(sf_dir: str):
    """Token counting per document."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        TextStatsStage(features=("tokens",)), batch_format="pyarrow"
    )

    def with_chars(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "n_chars", pc.utf8_length(batch.column("text")).cast(pa.int64())
        )

    return ds.map_batches(with_chars, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens", "n_chars"]
    )


def q_quality_stats(sf_dir: str):
    """Quality scoring per document (documented deterministic formula)."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        TextStatsStage(features=("quality",)), batch_format="pyarrow"
    )
    return ds.select_columns(
        ["doc_id", "n_words", "mean_word_len", "stopword_ratio", "quality"]
    )


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition / layout fractions per document (duplicate
    lines & paragraphs, top-token share, bullet / ellipsis lines) —
    Rae et al. 2021 §A1.1 heuristics, no reference analogue (llm_food
    converts documents, never filters them)."""
    from llm_food_ray.stages.textstats import RepetitionStage

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        RepetitionStage(), batch_format="pyarrow"
    )
    return ds.select_columns(
        ["doc_id", "n_lines", "n_words", "dup_line_frac", "dup_para_frac",
         "top_word_frac", "bullet_line_frac", "ellipsis_line_frac"]
    )


def q_quality_filter(sf_dir: str):
    """Composed repetition-quality FILTER: keep documents under all the
    default thresholds (``functions.repetition``) — the droppy half of a
    training-data pipeline, oracle-checked against the same WHERE
    clause."""
    from llm_food_ray.stages.textstats import RepetitionStage

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        RepetitionStage(), batch_format="pyarrow"
    )

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("keep"))

    return (ds.map_batches(keep, batch_format="pyarrow")
              .select_columns(["doc_id", "dup_line_frac", "top_word_frac"]))


def q_quality_tiers(sf_dir: str):
    """Quality-tier bucketing: score every document (the documented
    deterministic formula), resolve the global quartile thresholds with
    ONE value-histogram exchange (quantile_disc semantics), broadcast
    the 3 thresholds, and assign tier 1–4 in a streaming searchsorted
    map — the "extract the top-quality tier" routing step of a curation
    pipeline.  No reference analogue (llm_food never scores documents);
    brief-scope."""
    from llm_food_ray.stages.textstats import (TextStatsStage,
                                               tier_by_global_quantiles)

    ds = (_docs(sf_dir, ["doc_id", "text"])
          .map_batches(TextStatsStage(features=("quality",)),
                       batch_format="pyarrow")
          .select_columns(["doc_id", "quality"]))
    return tier_by_global_quantiles(ds, "quality")


def q_dedup_lines(sf_dir: str):
    """Within-document exact line dedup over deterministically dirtied
    text: each document is re-lined into 8-word rows with its first two
    lines re-appended at the end (so the rule actually fires), then
    deduped keeping first occurrences — the MassiveText/CCNet line-level
    repetition scrub.  The SQL oracle builds the SAME dirty lines and
    dedups them independently with a windowed first-occurrence rank."""
    from llm_food_ray.functions.repetition import dedup_lines_exact

    def synth_and_dedup(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column("text").to_pylist()]
        out = []
        for t in texts:
            ws = t.split()
            ls = [" ".join(ws[i * 8:(i + 1) * 8])
                  for i in range((len(ws) + 7) // 8)]
            if ls:
                ls = ls + [ls[0], ls[1] if len(ls) >= 2 else ls[0]]
            out.append(dedup_lines_exact("\n".join(ls)))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(out, pa.string())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        synth_and_dedup, batch_format="pyarrow")


def q_strip_boilerplate(sf_dir: str):
    """Cross-document per-host template strip (trafilatura/CCNet
    frequent-line rule corpus-wide): hosts synthesized from doc_id (23
    sites × 3 TLDs, the host_stats scheme), each document re-lined into
    8-word rows and wrapped in a host-specific nav header + copyright
    footer — the shared chrome the operator must detect (>= 4 distinct
    docs per host carry it) and strip, leaving the content lines.  The
    SQL oracle rebuilds the SAME dirty pages and applies the same
    count-distinct-docs-per-(host, line) rule independently."""
    from llm_food_ray.stages.dedup import strip_host_boilerplate

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        tld = {0: "com", 1: "org", 2: "net"}
        hosts = [f"site{d % 23}.example.{tld[d % 3]}" for d in ids]
        texts = []
        for h, t in zip(hosts, batch.column("text").to_pylist()):
            ws = (t or "").split()
            ls = [" ".join(ws[i * 8:(i + 1) * 8])
                  for i in range((len(ws) + 7) // 8)]
            texts.append("\n".join(
                [f"welcome to {h} home about contact"] + ls +
                [f"copyright {h} all rights reserved"]))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "host": pa.array(hosts, pa.string()),
                         "text": pa.array(texts, pa.string())})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        synth, batch_format="pyarrow")
    return strip_host_boilerplate(ds, "host", "doc_id", "text", min_docs=4)


def q_tier_extract(sf_dir: str):
    """Top-tier extraction — the round's headline routing step: score,
    tier by global quartiles, and KEEP only the top tier (quality above
    the q75 threshold), streaming end to end (one histogram exchange
    for the thresholds, then a pure filter map)."""
    import pyarrow.compute as pc

    ds = q_quality_tiers(sf_dir)
    return (ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("tier"), 4)),
        batch_format="pyarrow")
        .select_columns(["doc_id", "quality"]))


def q_dedup_incremental(sf_dir: str):
    """Incremental exact dedup: treat documents with doc_id % 3 == 0 as
    the ALREADY-CURATED corpus and drop any document whose text content
    it already contains — the delta-crawl curation step (new shards vs
    yesterday's output, no whole-corpus re-dedup).  Auto-gated broadcast
    seen-hash filter vs partitioned LEFT ANTI join
    (``stages/dedup.py:dedup_against``)."""
    import numpy as np

    from llm_food_ray.stages.dedup import dedup_against

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def seen_only(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 3 == 0))

    seen = docs.map_batches(seen_only, batch_format="pyarrow")
    return dedup_against(docs, seen,
                         text_column="text").select_columns(
        ["doc_id", "lang"])


def q_dedup_incremental_bloom(sf_dir: str):
    """Same incremental exact dedup as ``dedup_incremental`` but on the
    ``exec='bloom'`` plan: broadcast Bloom filter (10 bits/key) routes
    definitely-new rows straight to the output; only bloom-positive
    candidates (true dups + ~1% fp) pay the partitioned LEFT ANTI join.
    Identical oracle — the exact join clears every false positive."""
    import numpy as np

    from llm_food_ray.stages.dedup import dedup_against

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def seen_only(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 3 == 0))

    seen = docs.map_batches(seen_only, batch_format="pyarrow")
    return dedup_against(docs, seen, text_column="text",
                         exec="bloom").select_columns(["doc_id", "lang"])


def q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail routing (Wenzek et al. 2020): score every
    document's perplexity against the English-reference bigram LM
    (:func:`q_lm_cross_score`'s model), then bucket each document into
    the head (1), middle (2) or tail (3) third of its OWN language's
    nll distribution — per-group tertile thresholds resolved with one
    value-histogram exchange, broadcast once, assigned in a streaming
    map.  The canonical "keep the head tier per language" curation
    step; no reference analogue (llm_food never scores), brief-scope."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.lm import lm_score_against
    from llm_food_ray.stages.textstats import tier_by_group_quantiles

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])
    ref = docs.map_batches(
        lambda b: b.filter(pc.equal(b.column("lang"), "en"))
                   .select(["text"]),
        batch_format="pyarrow")
    scored = lm_score_against(docs, ref, passthrough_columns=("lang",))
    return (tier_by_group_quantiles(scored, "lang", "nll",
                                    qs=(1.0 / 3, 2.0 / 3),
                                    tier_column="bucket")
            .select_columns(["doc_id", "lang", "nll", "bucket"]))


def q_top_bigrams(sf_dir: str):
    """Corpus-wide top-20 bigrams: per-batch partial counts → one
    vocabulary-sized groupby-sum → local top-k prune → tiny
    deterministic (count desc, gram asc) sort."""
    from llm_food_ray.stages.textstats import top_ngrams

    return top_ngrams(_docs(sf_dir, ["text"]), "text", n=2, k=20)


def q_top_bigrams_sketch(sf_dir: str):
    """Heavy-hitters top-20 bigrams via Misra–Gries batch summaries +
    exact candidate verification — byte-identical to q_top_bigrams but
    the merge exchange is capacity×blocks rows instead of the full
    vocabulary (the 100-TB plan; provable-exactness gate falls back to
    the full groupby when the distribution is too flat).  Small
    capacity here so the summaries actually drop mass at test scale."""
    from llm_food_ray.stages.textstats import top_ngrams_sketch

    return top_ngrams_sketch(_docs(sf_dir, ["text"]), "text",
                             n=2, k=20, capacity=512)


def q_url_canonicalize(sf_dir: str):
    """URL canonicalization (lowercase scheme/host, default-port strip,
    fragment drop, tracking-param removal, trailing-slash trim) over
    deterministically synthesized messy crawl URLs — the hygiene step
    before URL-keyed dedup.  The SQL oracle builds the SAME messy URLs
    and canonicalizes them independently with regexp/list functions."""
    from llm_food_ray.functions.urltools import canonicalize_url

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        urls = []
        for d in ids:
            scheme = "HTTP" if d % 2 == 0 else "https"
            port = ":80" if d % 4 == 0 else (":443" if d % 4 == 1 else "")
            slash = "/" if d % 3 == 0 else ""
            if d % 5 == 0:
                q = f"?utm_source=feed&ref={d % 9}&utm_campaign=x"
            elif d % 5 == 1:
                q = "?gclid=abc"
            else:
                q = ""
            frag = "#Section-2" if d % 6 == 0 else ""
            urls.append(f"{scheme}://WWW.Site{d % 7}.Example.COM{port}"
                        f"/Docs/{d}{slash}{q}{frag}")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "url": pa.array(urls, pa.string()),
            "canonical": pa.array([canonicalize_url(u) for u in urls],
                                  pa.string()),
        })

    return _docs(sf_dir, ["doc_id"]).map_batches(synth, batch_format="pyarrow")


def q_normalize_text(sf_dir: str):
    """Deterministic text normalization (NFC → control-strip →
    whitespace-collapse → trim) over deterministically dirtied text —
    combining accents, control bytes, CRLF runs and ragged spacing are
    injected by doc_id residue so every rule actually fires; the SQL
    oracle builds the SAME dirty strings and normalizes them
    independently with nfc_normalize + RE2 regexp_replace."""
    from llm_food_ray.stages.textstats import normalize_dataset

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = [t or "" for t in batch.column("text").to_pylist()]
        messy = []
        for d, t in zip(ids, texts):
            m = d % 4
            if m == 0:
                messy.append("Cafe\u0301  " + t)
            elif m == 1:
                messy.append("\t" + t + "\x01\x02")
            elif m == 2:
                messy.append(t + "\r\n trailing  ")
            else:
                messy.append(t)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(messy, pa.string())})

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        synth, batch_format="pyarrow")
    return (normalize_dataset(ds, "text")
            .select_columns(["doc_id", "norm_text", "changed"]))


def q_host_stats(sf_dir: str):
    """Per-host (domain) corpus rollup — the aggregation every crawl
    pipeline runs before per-domain caps/weights.  Hosts synthesized
    deterministically from doc_id (23 sites × 3 TLDs); the rollup uses
    the per-batch Arrow combiner so the exchange is hosts×blocks rows."""
    from llm_food_ray.stages.textstats import grouped_rollup

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        tld = {0: "com", 1: "org", 2: "net"}
        hosts = [f"site{d % 23}.example.{tld[d % 3]}" for d in ids]
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "n_chars": batch.column("n_chars")})

    ds = _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        synth, batch_format="pyarrow")
    return grouped_rollup(ds, "host", "n_chars",
                          names=("n_docs", "total_chars", "max_chars",
                                 "mean_chars"))


def q_host_tier_filter(sf_dir: str):
    """FineWeb/RefinedWeb-style DOMAIN-level quality gate: score each
    HOST by its mean document size, tier the hosts by global quartiles
    of those means, keep only documents from top-tier hosts — the
    domain-filtering step that drops content-farm domains wholesale
    before any per-document scoring spend.  Scale shape: ONE
    hosts×blocks combiner exchange for the per-host means (integer
    partials, mean = one exact-int division — bit-stable across
    engines), a quantile pass over the tiny host table for the
    thresholds, then an inner hash join of the corpus against the
    hosts-bounded top-tier table (the corpus side ships only
    (doc_id, host))."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.joins import safe_join
    from llm_food_ray.stages.textstats import (grouped_rollup,
                                               tier_by_global_quantiles)

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        tld = {0: "com", 1: "org", 2: "net"}
        hosts = [f"site{d % 23}.example.{tld[d % 3]}" for d in ids]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "host": pa.array(hosts, pa.string()),
                         "n_chars": batch.column("n_chars")})

    ds = _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        synth, batch_format="pyarrow")
    hm = grouped_rollup(ds, "host", "n_chars",
                        names=("n_docs", "total_chars", "max_chars",
                               "mean_chars"))
    ht = tier_by_global_quantiles(
        hm.select_columns(["host", "mean_chars"]), "mean_chars")
    top = ht.map_batches(
        lambda b: b.filter(pc.equal(b.column("tier"), 4))
                   .select(["host"]),
        batch_format="pyarrow")
    return safe_join(ds.select_columns(["doc_id", "host"]), top,
                     "inner", 8, on=("host",), right_on=("host",))


def q_dedup_paragraph(sf_dir: str):
    """C4-style global paragraph dedup: paragraphs occurring in more
    than 2 documents (corpus boilerplate) are dropped, documents rebuilt
    from the survivors — partial-counted, tiny aggregation, broadcast
    hot-set filter; no text shuffles.  A boilerplate footer (identical in
    every doc) plus a per-residue disclaimer (≈ sf·100 docs each) are
    injected so the drop path is actually exercised; both sides build
    the same augmented corpus."""
    from llm_food_ray.stages.dedup import dedup_paragraph_global

    def aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = [t or "" for t in batch.column("text").to_pylist()]
        full = [
            f"{t}\n\nCopyright Example Corp. All rights reserved."
            f"\n\nDisclaimer variant {d % 5}."
            for d, t in zip(ids, texts)
        ]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(full, pa.string())})

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        aug, batch_format="pyarrow")
    return dedup_paragraph_global(docs, "doc_id", "text", max_occurrences=2)


def q_hash_split(sf_dir: str):
    """Deterministic md5-bucket train/test split (10% test) — stable
    across runs and engines, no RNG."""
    from llm_food_ray.stages.textstats import hash_split

    return (hash_split(_docs(sf_dir, ["doc_id", "lang"]), "doc_id",
                       test_pct=10)
            .select_columns(["doc_id", "lang", "split"]))


def q_cap_per_lang(sf_dir: str):
    """Anti-domination cap: keep at most 50 documents (smallest doc_id)
    per language — local per-batch top-n prune, tiny candidate merge,
    broadcast keep-set filter; no corpus shuffle."""
    from llm_food_ray.stages.textstats import cap_per_group

    return (cap_per_group(_docs(sf_dir, ["doc_id", "lang"]),
                          "lang", "doc_id", n=50)
            .select_columns(["doc_id", "lang"]))


def q_canonical_best(sf_dir: str):
    """URL-level dedup keeping the BEST copy: three crawl variants of
    each page (scheme case / default port / fragment / tracking params)
    canonicalize to one URL; keep the highest-quality document per
    canonical URL (tiebreak doc_id) via the tie-exact per-group cap —
    canonicalize → score → cap_per_group(n=1), no corpus shuffle.  The
    "pick the canonical copy" step of crawl curation; no reference
    analogue, brief-scope."""
    from llm_food_ray.stages.textstats import TextStatsStage, cap_per_group

    from llm_food_ray.functions.urltools import canonicalize_url

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        urls = []
        for d in ids:
            base, v = d // 3, d % 3
            if v == 0:
                urls.append(f"https://www.page{base}.example.com"
                            f"/item/{base}")
            elif v == 1:   # path stays case-sensitive — host only
                urls.append(f"HTTPS://WWW.PAGE{base}.EXAMPLE.COM:443"
                            f"/item/{base}#frag")
            else:
                urls.append(f"https://www.page{base}.example.com"
                            f"/item/{base}?utm_source=x&gclid=1")
        return batch.append_column(
            "canonical",
            pa.array([canonicalize_url(u) for u in urls], pa.string()))

    def neg_q(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "neg_quality", pc.negate(batch.column("quality")))

    ds = (_docs(sf_dir, ["doc_id", "text"])
          .map_batches(TextStatsStage(features=("quality",)),
                       batch_format="pyarrow")
          .map_batches(synth, batch_format="pyarrow")
          .map_batches(neg_q, batch_format="pyarrow"))
    return (cap_per_group(ds, "canonical", "neg_quality", n=1,
                          tiebreak_column="doc_id")
            .select_columns(["doc_id", "canonical", "quality"]))


def q_sessionize(sf_dir: str):
    """Sessionization of the events stream (30-min gap rule): one
    user-bucketed exchange, vectorized per-bucket sweep; session_idx is
    0-based per user in (ts, event_id) order."""
    import ray.data as rd

    from llm_food_ray.stages.sessions import sessionize

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    return sessionize(ev, "user_id", "ts", "event_id", gap_seconds=1800)


def q_running_totals(sf_dir: str):
    """Per-user cumulative window over the events stream: 1-based
    row_number and integer-exact running cents sum in (ts, event_id)
    order — the SUM ... OVER (PARTITION BY ... ROWS UNBOUNDED PRECEDING)
    analogue; one user-bucketed exchange, vectorized segmented cumsum."""
    import ray.data as rd

    from llm_food_ray.stages.sessions import running_totals

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    return running_totals(ev, "user_id", "ts", "event_id", "value")


def q_rolling_stats(sf_dir: str):
    """Per-user trailing 5-row window over the events stream: integer-
    exact rolling cents sum + realized window size in (ts, event_id)
    order — the ROWS BETWEEN 4 PRECEDING AND CURRENT ROW analogue the
    cumulative running_totals can't express; one user-bucketed
    exchange, two reads of one vectorized cumsum."""
    import ray.data as rd

    from llm_food_ray.stages.sessions import rolling_sums

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    return rolling_sums(ev, "user_id", "ts", "event_id", "value",
                        window_rows=5)


def q_rolling_time(sf_dir: str):
    """Per-user trailing 1-hour RANGE window over the events stream:
    integer-exact rolling cents sum + realized frame size, with SQL
    RANGE peer semantics (equal-ts events share the frame) — upper
    edge from (user, ts) tie-runs, lower edge from one union-merge
    lexsort; completes the cumulative/ROWS/RANGE frame family."""
    import ray.data as rd

    from llm_food_ray.stages.sessions import rolling_time_sums

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    return rolling_time_sums(ev, "user_id", "ts", "event_id", "value",
                             window_seconds=3600)


def q_range_join(sf_dir: str):
    """Equi-key + interval range join (self, orders): per order, the
    count and cents-sum of the same customer's OTHER orders dated within
    ±90 days — dense-rank composite + two global searchsorted sweeps per
    bucket, no per-key groups, no pair materialization."""
    import ray.data as rd

    from llm_food_ray.stages.sessions import range_join_nearby

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    return range_join_nearby(orders, "o_custkey", "o_orderdate",
                             "o_orderkey", "o_totalprice", window_days=90)


def q_top_k_per_lang(sf_dir: str):
    """Per-group top-k window analogue: the 5 longest documents per
    language with their 1-based rank (n_chars DESC, doc_id tiebreak) —
    per-block local prune, one bounded candidate exchange, per-bucket
    vectorized resolve; the winners are the output, no second pass."""
    from llm_food_ray.stages.textstats import top_k_per_group

    return top_k_per_group(_docs(sf_dir, ["doc_id", "lang", "n_chars"]),
                           "lang", "n_chars", "doc_id", k=5)


def q_asof_last_purchase(sf_dir: str):
    """As-of (fill-forward) self-join: each event annotated with the
    same user's most recent 'purchase' timestamp at-or-before it —
    NULL until the first purchase."""
    import ray.data as rd

    from llm_food_ray.stages.sessions import asof_last_match

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    return asof_last_match(ev, "user_id", "ts", "event_id",
                           "event_type", "purchase",
                           out_column="last_purchase_ts")


def q_sample_per_lang(sf_dir: str):
    """Deterministic uniform sample of 30 docs per language (bottom-k by
    md5(key) — reproducible, RNG-free)."""
    from llm_food_ray.stages.textstats import sample_per_group

    return (sample_per_group(_docs(sf_dir, ["doc_id", "lang"]),
                             "lang", "doc_id", n=30)
            .select_columns(["doc_id", "lang"]))


def q_resample_mix(sf_dir: str):
    """Quota resampling to a target language mix (domain mixing): en
    capped at 100, zh/es at 40, de at 80 (larger than the sf0.01 group —
    kept whole), fr absent from the quotas (dropped).  Deterministic
    bottom-k-by-md5 within each group."""
    from llm_food_ray.stages.textstats import quota_sample

    return (quota_sample(_docs(sf_dir, ["doc_id", "lang"]),
                         "lang", "doc_id",
                         quotas={"en": 100, "zh": 40, "es": 40, "de": 80})
            .select_columns(["doc_id", "lang"]))


def q_temperature_mix(sf_dir: str):
    """Temperature-scaled multilingual rebalancing (p_g ∝ n_g^0.5, the
    mBERT/XLM-R mixing rule): per-language budgets derived from the
    corpus's own language histogram, rows kept bottom-k-by-md5 within
    each language.  One groups-sized histogram exchange + the broadcast
    keep-set machinery — no corpus shuffle."""
    from llm_food_ray.stages.textstats import temperature_sample

    return (temperature_sample(_docs(sf_dir, ["doc_id", "lang"]),
                               "lang", "doc_id", budget=300, alpha=0.5)
            .select_columns(["doc_id", "lang"]))


def q_mode_source(sf_dir: str):
    """Exact per-language MODE of the source column (dominant crawl
    source per language, smallest-value tiebreak): distinct-pair
    partials → one (lang, source) exchange → hash-bucketed vectorized
    argmax (64 Python group calls total, key-cardinality independent)."""
    from llm_food_ray.stages.textstats import grouped_mode

    return grouped_mode(_docs(sf_dir, ["lang", "source"]),
                        "lang", "source", name="mode_source")


def q_bpe_pairs(sf_dir: str):
    """BPE merge-step pair count: corpus-wide top-20 adjacent character
    pairs (whitespace never pairs), counted in packed-int64 codepoint
    space with numpy per-batch bincounts — pair strings exist only for
    the final 20 rows."""
    from llm_food_ray.stages.vocab import top_char_pairs

    return top_char_pairs(_docs(sf_dir, ["text"]), "text", k=20)


_TAG_TOPICS = {
    "storage": ["table", "row", "column", "parquet"],
    "exec": ["scan", "sort", "merge", "hash"],
    "perf": ["fast", "slow", "big", "small"],
}


def q_plagiarism_pairs(sf_dir: str):
    """MOSS-style shared-winnowing-fingerprint pairs over the augmented
    docs (mirror copies share every fingerprint): df ≤ 20 prune (the
    quadratic-fanout guard), fp%64 coarse buckets, run-length pair
    emission, (a,b) sum ≥ 3."""
    from llm_food_ray.stages.dupspans import plagiarism_pairs

    return plagiarism_pairs(_augmented_docs(sf_dir), "doc_id", "text",
                            k=5, window=4, min_shared=3, max_df=20)


def q_dedup_canonical(sf_dir: str):
    """Canonical-form exact dedup: doc_id%13==0 rows get a DISGUISED
    copy (uppercased, spaces doubled) that plain content hashing would
    miss; the canonicalize map (lowercase, digit runs → 0, whitespace
    folded) makes the md5 machinery catch it.  Survivors = the
    original min keys + the never-copied rows."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.dedup import dedup_canonical

    def disguise(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        dups = b.filter(pa.array(ids % 13 == 0))
        text = pc.replace_substring(pc.utf8_upper(dups.column("text")),
                                    " ", "  ")
        dups = (dups.set_column(dups.schema.get_field_index("text"),
                                "text", text)
                    .set_column(dups.schema.get_field_index("doc_id"),
                                "doc_id",
                                pc.add(dups.column("doc_id"), 2000000)))
        return pa.concat_tables([b, dups])

    aug = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        disguise, batch_format="pyarrow")
    return dedup_canonical(aug, "doc_id", "text").select_columns(
        ["doc_id"])


def q_containment_pairs(sf_dir: str):
    """Directional containment: augmented docs (exact mirrors for %7)
    plus a PLANTED head-25-words excerpt for every doc_id%19==0 row —
    the excerpt is contained in its parent (containment → 1.0) while
    the parent is not contained in the excerpt.  Winnowing-fp pair
    machinery + per-doc fp-count join, both directions, tau 0.5."""
    from llm_food_ray.stages.dupspans import containment_pairs

    def head25(b: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array(ids % 19 == 0))
        heads = [" ".join((t or "").split()[:25])
                 for t in sub.column("text").to_pylist()]
        sub = (sub.set_column(sub.schema.get_field_index("text"), "text",
                              pa.array(heads, pa.string()))
                  .set_column(sub.schema.get_field_index("doc_id"),
                              "doc_id",
                              pc.add(sub.column("doc_id"), 3000000)))
        return pa.concat_tables([b, sub])

    aug = _augmented_docs(sf_dir).map_batches(head25,
                                              batch_format="pyarrow")
    return containment_pairs(aug, "doc_id", "text", k=5, window=4,
                             tau=0.5, max_df=20)


def q_cdf_against(sf_dir: str):
    """Two-corpus percentile calibration: each doc_id%3!=0 document's
    n_chars scored as its strict CDF position within the doc_id%3==0
    archive — archive collapses to a broadcast (value, cum-count)
    histogram, new corpus streams through one searchsorted map."""
    import numpy as np

    from llm_food_ray.stages.textstats import cdf_against

    docs = _docs(sf_dir, ["doc_id", "n_chars"])

    def part(keep_ref: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array((ids % 3 == 0) == keep_ref))
        return f

    return cdf_against(docs.map_batches(part(False), batch_format="pyarrow"),
                       docs.map_batches(part(True), batch_format="pyarrow"),
                       "n_chars")


def q_collapse_lines(sf_dir: str):
    """Intra-doc consecutive-duplicate line collapse (uniq semantics)
    over a deterministic line-structured view (every space → newline,
    so the word soup's repeated adjacent words become repeated lines):
    split/compare/rejoin are Arrow kernels, zero shuffle."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.dedup import collapse_repeated_lines

    def to_lines(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text": pc.replace_substring(
                pc.fill_null(b.column("text"), ""), " ", "\n"),
        })

    return collapse_repeated_lines(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            to_lines, batch_format="pyarrow"))


def q_grouped_corr(sf_dir: str):
    """Per-language Pearson corr(n_chars, token count) via exact
    integer moments — both engines derive identical int64 sums, so the
    one float division/sqrt/round is bit-identical (engine corr()
    streaming updates would not be)."""
    from llm_food_ray.functions.repetition import split_words
    from llm_food_ray.stages.textstats import grouped_corr

    def with_tokens(b: pa.Table) -> pa.Table:
        toks = [len(split_words(t or ""))
                for t in b.column("text").to_pylist()]
        return pa.table({"lang": b.column("lang"),
                         "x": b.column("n_chars"),
                         "y": pa.array(toks, pa.int64())})

    return grouped_corr(
        _docs(sf_dir, ["lang", "text", "n_chars"]).map_batches(
            with_tokens, batch_format="pyarrow"),
        "lang", "x", "y")


def q_linear_fit(sf_dir: str):
    """Per-language OLS fit of token count on n_chars (chars-per-token
    calibration line — the cheap signal-vs-signal regression a quality
    pipeline uses to flag languages whose docs tokenize anomalously).
    Same exact-integer-moment machinery as grouped_corr, closed-form
    finish."""
    from llm_food_ray.functions.repetition import split_words
    from llm_food_ray.stages.textstats import grouped_linear_fit

    def with_tokens(b: pa.Table) -> pa.Table:
        toks = [len(split_words(t or ""))
                for t in b.column("text").to_pylist()]
        return pa.table({"lang": b.column("lang"),
                         "x": b.column("n_chars"),
                         "y": pa.array(toks, pa.int64())})

    return grouped_linear_fit(
        _docs(sf_dir, ["lang", "text", "n_chars"]).map_batches(
            with_tokens, batch_format="pyarrow"),
        "lang", "x", "y")


def q_profile_table(sf_dir: str):
    """Column profiler over documents: counts/nulls/typed min-max in
    ONE aggregate pass; exact per-column distinct via the value-vocab
    groupby (the honest wide step — `hll_distinct` is the sketch
    alternative)."""
    from llm_food_ray.stages.textstats import profile_table

    return profile_table(_docs(sf_dir), ["doc_id", "text", "lang",
                                         "source", "n_chars"])


def q_curate_full(sf_dir: str):
    """Composed curation flagship v2 chaining the r4-cont operators:
    disguise-augmented corpus → canonical-form exact dedup → script
    gate (latin_frac ≥ 0.5) → deterministic epoch ranking
    (`global_rank` over md5) → keep every even rank (a reproducible
    half-subsample).  Every stage is an already-oracled operator; the
    SQL twin chains their oracles."""
    import pyarrow.compute as pc

    from llm_food_ray.functions.hashing import md5_hex
    from llm_food_ray.functions.textstats import script_fractions
    from llm_food_ray.stages.dedup import dedup_canonical
    from llm_food_ray.stages.textstats import global_rank

    def disguise(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        dups = b.filter(pa.array(ids % 13 == 0))
        text = pc.replace_substring(pc.utf8_upper(dups.column("text")),
                                    " ", "  ")
        dups = (dups.set_column(dups.schema.get_field_index("text"),
                                "text", text)
                    .set_column(dups.schema.get_field_index("doc_id"),
                                "doc_id",
                                pc.add(dups.column("doc_id"), 2000000)))
        return pa.concat_tables([b, dups])

    aug = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        disguise, batch_format="pyarrow")
    kept = dedup_canonical(aug, "doc_id", "text")

    def gate_and_hash(b: pa.Table) -> pa.Table:
        import numpy as np

        texts = b.column("text").to_pylist()
        _, fr = script_fractions(texts)
        b = b.filter(pa.array(fr["latin"] >= 0.5))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "h": pa.array([md5_hex(str(x))
                           for x in b.column("doc_id").to_pylist()],
                          pa.string())})

    ranked = global_rank(kept.map_batches(gate_and_hash,
                                          batch_format="pyarrow"),
                         "h", tiebreak_column="doc_id")
    return (ranked.map_batches(
        lambda b: b.filter(pa.array(
            (b.column("rank").to_numpy(zero_copy_only=False) % 2) == 0)),
        batch_format="pyarrow")
        .select_columns(["doc_id", "rank"]))


def q_epoch_order(sf_dir: str):
    """Deterministic epoch shuffle: global 0-based training order =
    row_number over (md5(doc_id), doc_id) — one distributed sort + the
    block-summary prefix-sum enumeration (`global_rank`), RNG-free and
    cluster-size-independent."""
    from llm_food_ray.functions.hashing import md5_hex
    from llm_food_ray.stages.textstats import global_rank

    def with_hash(b: pa.Table) -> pa.Table:
        return b.append_column(
            "h", pa.array([md5_hex(str(x))
                           for x in b.column("doc_id").to_pylist()],
                          pa.string()))

    out = global_rank(
        _docs(sf_dir, ["doc_id"]).map_batches(with_hash,
                                              batch_format="pyarrow"),
        "h", tiebreak_column="doc_id")
    return out.select_columns(["doc_id", "rank"])


def q_script_stats(sf_dir: str):
    """Per-doc script composition (latin/digit/cyrillic/han/arabic
    codepoint-range fractions): one utf-32 encode + vectorized range
    bincounts per batch, zero shuffle."""
    from llm_food_ray.stages.textstats import script_stats

    return script_stats(_docs(sf_dir, ["doc_id", "text"]))


def q_keyword_tag(sf_dir: str):
    """Dictionary topic tagging: per (doc, topic) non-overlapping
    keyword-occurrence totals, sparse long-form output — one streaming
    pass of Arrow count_substring kernels, dictionary in the task
    closure, zero shuffle."""
    from llm_food_ray.stages.textstats import keyword_tag

    return keyword_tag(_docs(sf_dir, ["doc_id", "text"]), _TAG_TOPICS)


def q_bpe_encode(sf_dir: str):
    """Apply the 8 trained BPE merges back to the corpus: per-doc token
    counts under the learned vocabulary — the fit loop plus ONE
    fp-space (md5-u64 word → count) broadcast and a streaming
    searchsorted encode pass."""
    from llm_food_ray.stages.vocab import bpe_token_counts

    return bpe_token_counts(_docs(sf_dir, ["doc_id", "text"]), "text",
                            num_merges=8)


def q_top_pmi(sf_dir: str):
    """Top-20 PMI collocations (window ≤ 2, min_count 5): vocabulary-
    sized pair/unigram partials in one streaming pass, min_count prune
    BEFORE the two vocab-keyed joins, identical left-to-right float
    expression on both engines so round-6 ln values match exactly."""
    from llm_food_ray.stages.textstats import top_pmi_pairs

    return top_pmi_pairs(_docs(sf_dir, ["text"]), "text",
                         window=2, k=20, min_count=5)


def q_bpe_train(sf_dir: str):
    """Iterative BPE tokenizer training (8 merges): ONE corpus scan
    builds the word-frequency table, then each merge step runs entirely
    over the materialized word vocabulary — packed-int64 pair partials,
    pair-vocab groupby, blocks×ties driver argmax, vectorized
    left-to-right rewrite (run-parity rule for self-overlapping pairs).
    Deterministic: ties break on (count desc, left, right) in codepoint
    order == SQL binary UTF-8 collation."""
    from llm_food_ray.stages.vocab import bpe_train

    return bpe_train(_docs(sf_dir, ["text"]), "text", num_merges=8)


def q_url_blocklist(sf_dir: str):
    """UT1-style domain blocklist gate: drop every document whose
    (synthesised, deterministic) host has ANY dot-suffix in the
    blocklist — subdomains of a blocked domain and every host under a
    blocked TLD-level entry go too.  Broadcast blocklist + one streaming
    vectorized suffix-match pass; no shuffle."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.webfilter import filter_blocked_hosts

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        tld = {0: "com", 1: "org", 2: "net"}
        sub = {0: "cdn.img.", 1: "www.", 2: "", 3: "", 4: ""}
        hosts = [f"{sub[int(d) % 5]}site{int(d) % 23}.example."
                 f"{tld[int(d) % 3]}" for d in ids]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "host": pa.array(hosts, pa.string())})

    ds = _docs(sf_dir, ["doc_id"]).map_batches(synth, batch_format="pyarrow")
    return filter_blocked_hosts(
        ds, "host",
        blocked={"site5.example.com", "site11.example.org", "example.net"})


def q_term_lookup(sf_dir: str):
    """Persisted inverted index: one shuffle-free streaming build pass
    writes (term, doc_id, tf) postings hive-partitioned by
    hash(term)%64, then the lookup reads ONLY the bucket directories
    the three query terms hash into (I/O-level pruning — the IVF
    layout story applied to text retrieval)."""
    import os
    import shutil

    from llm_food_ray.stages.index import build_term_index, term_lookup

    tag = os.path.basename(os.path.normpath(sf_dir))
    d = f"/tmp/term_index_{tag}"
    shutil.rmtree(d, ignore_errors=True)
    build_term_index(_docs(sf_dir, ["doc_id", "text"]), d)
    return term_lookup(d, ["the", "der", "data"])


def q_index_merge(sf_dir: str):
    """Incremental inverted-index lifecycle: base build over doc_id%3!=0,
    LSM-style merge of the doc_id%3==0 delta (append-only — untouched
    buckets never rewritten, cost O(delta)), per-bucket compaction to
    one file, then a pruned 3-term lookup.  The lookup over the merged
    index must equal the postings of a from-scratch build over the FULL
    corpus — which is exactly what the SQL twin computes."""
    import os
    import shutil

    import pyarrow.compute as pc

    from llm_food_ray.stages.index import (build_term_index, compact_index,
                                           merge_term_index, term_lookup)

    tag = os.path.basename(os.path.normpath(sf_dir))
    d = f"/tmp/term_index_merge_{tag}"
    shutil.rmtree(d, ignore_errors=True)
    docs = _docs(sf_dir, ["doc_id", "text"])

    def part(keep_delta: bool):
        def f(b: pa.Table) -> pa.Table:
            import numpy as np

            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 3 == 0) == keep_delta
            return b.filter(pa.array(m))
        return f

    build_term_index(docs.map_batches(part(False), batch_format="pyarrow"),
                     d)
    merge_term_index(docs.map_batches(part(True), batch_format="pyarrow"),
                     d)
    compact_index(d)
    return term_lookup(d, ["the", "der", "data"])


def q_hll_distinct(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT n_chars) per language —
    the mergeable-sketch replacement for the exchange-heavy exact count
    (`distinct_lengths` is the exact twin): fixed 4 KiB registers per
    (group, block), elementwise-max merge, deterministic md5-prefix
    hashing — so the ESTIMATE itself is value-checked against a full
    SQL replica, not just a tolerance test."""
    from llm_food_ray.stages.sketch import hll_count_distinct

    return hll_count_distinct(_docs(sf_dir, ["lang", "n_chars"]),
                              "lang", "n_chars")


def q_snapshot_overlap(sf_dir: str):
    """Crawl-churn telemetry from two 4 KiB sketches: HLL register
    arrays for two synthesised url snapshots (B drops every 10th url
    and adds new ones), union = elementwise max (sketch mergeability),
    overlap by inclusion–exclusion — no join, no exchange beyond
    blocks-bounded register rows.  The exact-join twin is
    `crawl_diff`."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.sketch import hll_overlap

    def urls_a(batch: pa.Table) -> pa.Table:
        v = pc.binary_join_element_wise(
            "u", pc.cast(batch.column("doc_id"), pa.string()), "")
        return pa.table({"v": v})

    def urls_b(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        keep = batch.filter(pa.array(ids % 10 != 0))
        new = batch.filter(pa.array(ids % 7 == 0))
        va = pc.binary_join_element_wise(
            "u", pc.cast(keep.column("doc_id"), pa.string()), "")
        vb = pc.binary_join_element_wise(
            "new", pc.cast(new.column("doc_id"), pa.string()), "")
        if isinstance(va, pa.ChunkedArray):
            va = va.combine_chunks()
        if isinstance(vb, pa.ChunkedArray):
            vb = vb.combine_chunks()
        return pa.table({"v": pa.concat_arrays([va, vb])})

    docs = _docs(sf_dir, ["doc_id"])
    a = docs.map_batches(urls_a, batch_format="pyarrow")
    b = docs.map_batches(urls_b, batch_format="pyarrow")
    return hll_overlap(a, b, "v")


def q_phrase_search(sf_dir: str):
    """Exact token-phrase retrieval from a positional inverted index:
    build (term, doc, pos) postings hive-partitioned by hash(term),
    then find documents containing the phrase "batch batch stream" (the
    repeated term exercises the self-join) as a chain of native hash
    joins on (doc, pos−i) — no list payloads near a join, output
    bounded by the rarest term's postings."""
    import os
    import shutil

    from llm_food_ray.stages.index import (build_positional_index,
                                           phrase_lookup)

    tag = os.path.basename(os.path.normpath(sf_dir))
    d = f"/tmp/pos_index_{tag}"
    shutil.rmtree(d, ignore_errors=True)
    build_positional_index(_docs(sf_dir, ["doc_id", "text"]), d)
    return phrase_lookup(d, ["batch", "batch", "stream"])


def q_char_entropy(sf_dir: str):
    """Per-document character-entropy quality signal (nats): one
    streaming vectorized pass (packed (doc, codepoint) np.unique +
    reduceat), no exchange."""
    from llm_food_ray.stages.textstats import char_entropy

    return char_entropy(_docs(sf_dir, ["doc_id", "text"]))


def q_nb_lang_classify(sf_dir: str):
    """Distributed multinomial Naive Bayes: train per-language token
    models over the corpus (fingerprint-space partial counts, one
    (label, fp) exchange, classes×vocab-bounded gather) and predict a
    language for every document in one broadcast-model actor-pool pass.
    Scores round to 6 decimals BEFORE the argmax; ties break to the
    smallest label — bit-reproducible across engines."""
    from llm_food_ray.stages.classify import nb_classify

    return nb_classify(_docs(sf_dir, ["doc_id", "text", "lang"]),
                       label_column="lang")


def q_oov_rate(sf_dir: str):
    """Per-doc OOV (rare-token) rate with a planted unique token on
    every doc_id%17==0 row (the word-soup vocabulary is otherwise all
    high-frequency): corpus word count → fp-space frequent-set
    broadcast → streaming dictionary-lookup scoring."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.textstats import oov_rate

    def plant(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        suffix = pa.array(np.where(ids % 17 == 0,
                                   [f" xq{i}tok" for i in ids],
                                   ""), pa.string())
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text": pc.binary_join_element_wise(
                pc.fill_null(b.column("text"), ""), suffix, ""),
        })

    return oov_rate(_docs(sf_dir, ["doc_id", "text"]).map_batches(
        plant, batch_format="pyarrow"), min_count=2)


def q_len_deciles(sf_dir: str):
    """Global decile histogram of document lengths: exact
    quantile_disc thresholds (value-histogram exchange) + broadcast
    strict-less bucketing + a 10-row rollup."""
    from llm_food_ray.stages.textstats import decile_histogram

    return decile_histogram(_docs(sf_dir, ["n_chars"]), "n_chars")


def q_lang_confusion(sf_dir: str):
    """Classifier-eval confusion matrix at corpus scale: the NB
    language predictions joined back to the true labels on doc_id
    (ONE doc-keyed hash join of two thin projections) and collapsed to
    (lang, pred, n) — languages²-bounded output."""
    from ray.data.aggregate import Count

    from llm_food_ray.stages.classify import nb_classify
    from llm_food_ray.stages.joins import safe_join

    pred = nb_classify(_docs(sf_dir, ["doc_id", "text", "lang"]),
                       label_column="lang").select_columns(
                           ["doc_id", "pred"])
    actual = _docs(sf_dir, ["doc_id", "lang"])
    return (safe_join(actual, pred, "inner", 16, on=("doc_id",))
                  .groupby(["lang", "pred"])
                  .aggregate(Count(alias_name="n")))


def q_median_len(sf_dir: str):
    """Exact per-language median document length via value-histogram
    partials (no corpus sort)."""
    from llm_food_ray.stages.textstats import grouped_median

    return grouped_median(_docs(sf_dir, ["lang", "n_chars"]),
                          "lang", "n_chars")


def q_quantiles_len(sf_dir: str):
    """Exact per-language length quartiles (discrete-quantile rank
    rule, DuckDB quantile_disc parity) over the same histogram
    partials as the median."""
    from llm_food_ray.stages.textstats import grouped_quantiles

    return grouped_quantiles(_docs(sf_dir, ["lang", "n_chars"]),
                             "lang", "n_chars", qs=(0.25, 0.5, 0.75))


def q_percent_rank_len(sf_dir: str):
    """Per-language length percent_rank for every document — the
    window-function analogue (rank normalization within a group) that a
    naive port would run as a per-group corpus sort.  ONE value-histogram
    exchange resolves the (lang, n_chars) → (min-rank, n) table, which
    broadcasts once; the corpus streams through a vectorized hash-index
    lookup (`grouped_percent_rank`)."""
    from llm_food_ray.stages.textstats import grouped_percent_rank

    return grouped_percent_rank(
        _docs(sf_dir, ["doc_id", "lang", "n_chars"]), "lang", "n_chars")


def q_token_budget_mix(sf_dir: str):
    """Token-budget training mix: fill each language's TOKEN quota in
    md5(doc_id) order (en 5k, de 2k, es 10k ≈ whole group, zh 1.5k; fr
    absent → dropped) — the mix-by-tokens operator; exact two-phase
    bucketed plan, SQL twin is a window cumulative sum."""
    from llm_food_ray.stages.textstats import token_budget_sample

    return (token_budget_sample(
        _docs(sf_dir, ["doc_id", "lang", "text"]), "lang", "doc_id",
        budgets={"en": 5000, "de": 2000, "es": 10000, "zh": 1500})
        .select_columns(["doc_id", "lang"]))


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sample (hash-Gumbel top-k): 150 docs
    drawn ∝ exp(weight) without replacement, weight = ln(1+n_chars) —
    the step that turns importance weights into a resampled corpus,
    RNG-free and bit-reproducible (the SQL twin computes identical
    scores)."""
    import math

    import pyarrow as pa

    from llm_food_ray.stages.textstats import weighted_sample

    def add_w(b: pa.Table) -> pa.Table:
        w = [math.log(1 + int(c))
             for c in b.column("n_chars").to_pylist()]
        return b.append_column("w", pa.array(w, pa.float64()))

    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"]).map_batches(
        add_w, batch_format="pyarrow")
    return (weighted_sample(ds, "doc_id", "w", k=150)
            .select_columns(["doc_id", "lang", "sample_score"]))


def q_weighted_sample_per_lang(sf_dir: str):
    """Per-language deterministic weighted sample (hash-Gumbel top-30
    per lang, weight = ln(1+n_chars)) — per-domain importance sampling;
    composition of the Gumbel scorer and the tiebreak-exact per-group
    cap."""
    import math

    import pyarrow as pa

    from llm_food_ray.stages.textstats import weighted_sample_per_group

    def add_w(b: pa.Table) -> pa.Table:
        w = [math.log(1 + int(c))
             for c in b.column("n_chars").to_pylist()]
        return b.append_column("w", pa.array(w, pa.float64()))

    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"]).map_batches(
        add_w, batch_format="pyarrow")
    return (weighted_sample_per_group(ds, "lang", "doc_id", "w", n=30)
            .select_columns(["doc_id", "lang", "sample_score"]))


def q_corpus_sample(sf_dir: str):
    """Global deterministic 100-doc sample (bottom-k by md5 across the
    whole corpus — RNG-free, cluster-size-independent)."""
    from llm_food_ray.stages.textstats import corpus_sample

    return (corpus_sample(_docs(sf_dir, ["doc_id", "lang"]),
                          "doc_id", n=100)
            .select_columns(["doc_id", "lang"]))


def q_curate(sf_dir: str):
    """Composed training-data curation flagship — the full droppy half of
    the engine in ONE streaming pipeline over documents:

      repetition quality filter → PII scrub (with the injected footer)
      → exact dedup on the scrubbed text (min doc_id wins) →
      deterministic md5 train/test split

    Every stage is individually oracle-green; this query value-checks
    their COMPOSITION (ordering/interaction bugs between stages would
    surface here even when each passes alone)."""
    from llm_food_ray.functions.pii import scrub_pii
    from llm_food_ray.functions.repetition import (
        passes_repetition_filter,
        repetition_features,
    )
    from llm_food_ray.stages.dedup import dedup_exact
    from llm_food_ray.stages.textstats import hash_split

    def filt(batch: pa.Table) -> pa.Table:
        keep = [passes_repetition_filter(repetition_features(t or ""))
                for t in batch.column("text").to_pylist()]
        return batch.filter(pa.array(keep, pa.bool_()))

    def scrub(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = [t or "" for t in batch.column("text").to_pylist()]
        clean = [scrub_pii(
            f"{t}\nContact: user{d}@mail.example.com, call "
            f"+1-555-{d % 1000:03d}-{d % 10000:04d} or visit "
            f"10.{d % 256}.0.{d % 250} now") for d, t in zip(ids, texts)]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "clean": pa.array(clean, pa.string())})

    ds = _augmented_docs(sf_dir).map_batches(filt, batch_format="pyarrow")
    deduped = dedup_exact(ds, "doc_id", "text")
    cleaned = deduped.map_batches(scrub, batch_format="pyarrow")
    return (hash_split(cleaned, "doc_id", test_pct=10)
            .select_columns(["doc_id", "clean", "split"]))


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: the 'eval set' is the first 13-gram of
    every doc_id % 50 == 0 document (deterministic, benchmark-sized);
    any document containing one of those 13-grams is dropped.  The
    contaminated set broadcasts once; the corpus streams through a
    membership filter — no shuffle."""
    import pyarrow.parquet as pq

    from llm_food_ray.functions.repetition import split_words
    from llm_food_ray.stages.textstats import decontaminate

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    bad = set()
    for d, txt in zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()):
        if d % 50 == 0:
            ws = split_words(txt or "")
            if len(ws) >= 13:
                bad.add(" ".join(ws[:13]))
    return (decontaminate(_docs(sf_dir, ["doc_id", "text"]), "text",
                          contaminated=bad, n=13)
            .select_columns(["doc_id"]))


def q_contamination_frac(sf_dir: str):
    """Scored decontamination: every document annotated with its
    positional 13-gram count, eval-set hit count, and round-6 overlap
    fraction (the graded leakage signal; q_decontaminate's boolean drop
    is the frac > 0 special case).  Same eval-set construction as
    q_decontaminate; same broadcast-once / single-streaming-pass shape,
    no shuffle."""
    import pyarrow.parquet as pq

    from llm_food_ray.functions.repetition import split_words
    from llm_food_ray.stages.textstats import contamination_scores

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    bad = set()
    for d, txt in zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()):
        if d % 50 == 0:
            ws = split_words(txt or "")
            if len(ws) >= 13:
                bad.add(" ".join(ws[:13]))
    return (contamination_scores(_docs(sf_dir, ["doc_id", "text"]), "text",
                                 contaminated=bad, n=13)
            .select_columns(["doc_id", "n_grams", "n_hits",
                             "contamination_frac"]))


def q_distinctive_terms(sf_dir: str):
    """Per-language distinctive terms (c-TF-IDF): token counts per
    (lang, term) in one vocabulary-sized pre-aggregated exchange, df
    per term over the merged counts, one vocab-sized hash join, then
    the coarse-bucketed top-k winner resolve — top 10 per lang, score
    = n * ln(n_langs / df) rounded to 6."""
    from llm_food_ray.stages.search import distinctive_terms

    return distinctive_terms(_docs(sf_dir, ["lang", "text"]), "lang",
                             "text", k=10)


def q_embedding_quantize(sf_dir: str):
    """Scalar int8 embedding quantization: global per-dimension min/max
    (dims × blocks exchange) → broadcast scale → one streaming
    vectorized code map; flattened to (vec_id, dim, code) so the SQL
    twin value-checks every code."""
    import numpy as np
    import pyarrow.compute as pc

    from llm_food_ray.stages.similarity import embedding_quantize

    out = embedding_quantize(_embeddings(sf_dir), "embedding", "vec_id",
                             levels=256)

    def flatten(b: pa.Table) -> pa.Table:
        col = b.column("codes")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = np.asarray(col.value_lengths(), dtype=np.int64)
        ids = np.repeat(
            b.column("vec_id").to_numpy(zero_copy_only=False), lens)
        dims = (np.arange(int(lens.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(lens) - lens, lens))
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "dim": pa.array(dims, pa.int64()),
            "code": pc.cast(col.flatten(), pa.int64()),
        })

    return out.map_batches(flatten, batch_format="pyarrow")


def q_ann_topk_quantized(sf_dir: str):
    """Asymmetric quantized ANN: cosine top-10 vs the vec_id-0 raw query
    where every corpus vector is scored through its int8 scalar-quantized
    reconstruction — one dims×blocks min/max exchange, broadcast scale,
    then brute_topk's prune+sort plan."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.similarity import quantized_topk

    q = _query_vec(sf_dir)
    top = quantized_topk(_embeddings(sf_dir), q, 10)
    return top.map_batches(
        lambda b: b.set_column(b.schema.get_field_index("score"), "score",
                               pc.round(b.column("score"), 4)),
        batch_format="pyarrow",
    )


_BM25_MULTI_QUERIES = {"qa": ("vector", "query", "hash"),
                       "qb": ("data", "stream"),
                       "qc": ("hash", "table", "data")}


def q_bm25_multi(sf_dir: str):
    """Batch lexical retrieval: top-10 per query for 3 bag-of-terms
    queries over ONE shared stats pass + ONE shared scoring scan
    (union-vocabulary tf computed once per batch, per-query local
    top-k, coarse-bucketed per-query winner resolve)."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.search import bm25_multi_topk

    top = bm25_multi_topk(_docs(sf_dir, ["doc_id", "text"]),
                          _BM25_MULTI_QUERIES, 10)
    return top.map_batches(
        lambda b: b.set_column(b.schema.get_field_index("score"), "score",
                               pc.round(b.column("score"), 4)),
        batch_format="pyarrow",
    )


def _bm25_multi_sql(queries: dict, k: int) -> str:
    """SQL twin builder for q_bm25_multi: union-vocabulary tf/df CTEs,
    one left-to-right `+`-chained score expression per query in the
    query's own term order (the Bm25Scorer float-parity rule), window
    rank per query."""
    union = sorted({t for ts in queries.values() for t in ts})
    col = {t: i for i, t in enumerate(union)}
    tf_cols = ",\n         ".join(
        f"len(list_filter(ws, w -> w = '{t}')) AS tf_{i}"
        for i, t in enumerate(union))
    df_cols = ",\n         ".join(
        f"sum((tf_{i} > 0)::INT)::DOUBLE AS df_{i}"
        for i in range(len(union)))
    term_expr = (
        "ln(1.0::DOUBLE + (n - df_{i} + 0.5::DOUBLE) / (df_{i} + 0.5::DOUBLE))"
        " * ((tf_{i} * 2.2::DOUBLE) / (tf_{i} + 1.2::DOUBLE *"
        " (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl)))")
    per_q = []
    for qid, terms in sorted(queries.items()):
        expr = "\n      + ".join(term_expr.format(i=col[t]) for t in terms)
        per_q.append(f"  SELECT '{qid}' AS query_id, doc_id,\n"
                     f"        {expr} AS score\n  FROM tf, stats")
    scored = "\n  UNION ALL\n".join(per_q)
    return rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), tf AS (
  SELECT doc_id, len(ws) AS dl,
         {tf_cols}
  FROM toks
), stats AS (
  SELECT count(*)::DOUBLE AS n,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         {df_cols}
  FROM tf
), scored AS (
{scored}
), rk AS (
  SELECT query_id, score, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT query_id, round(score, 4) AS score, doc_id,
       CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= {k}
"""


def q_pii_scrub(sf_dir: str):
    """PII redaction (emails → <EMAIL>, IPv4 → <IP>, phones → <PHONE>)
    over documents with a deterministic PII footer injected — both sides
    build the same footer; the oracle re-applies the same RE2 patterns
    with regexp_replace(..., 'g'), value-checked byte-for-byte."""
    from llm_food_ray.functions.pii import count_pii, scrub_pii

    def scrub(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = [t or "" for t in batch.column("text").to_pylist()]
        full = [
            f"{t}\nContact: user{d}@mail.example.com, call "
            f"+1-555-{d % 1000:03d}-{d % 10000:04d} or visit "
            f"10.{d % 256}.0.{d % 250} now"
            for d, t in zip(ids, texts)
        ]
        counts = [count_pii(t) for t in full]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "clean": pa.array([scrub_pii(t) for t in full], pa.string()),
            "n_email": pa.array([c["n_email"] for c in counts], pa.int64()),
            "n_ip": pa.array([c["n_ip"] for c in counts], pa.int64()),
            "n_phone": pa.array([c["n_phone"] for c in counts], pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow")


def q_lang_id(sf_dir: str):
    """Heuristic language ID (stopword-profile n-gram) — rows-only."""
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        TextStatsStage(features=("lang_id",)), batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "lang_id"])


def q_doc_fingerprint(sf_dir: str):
    """Winnowing fingerprint minimum per doc, as fixed-width hex (the
    global min of 5-gram hashes — SQL-reconstructible)."""
    from llm_food_ray.functions.hashing import winnow_min_per_doc

    def fp(batch: pa.Table) -> pa.Table:
        mins = winnow_min_per_doc(batch.column("text"), 5, 4)
        return pa.Table.from_arrays(
            [batch.column("doc_id"),
             pa.array([format(int(m), "08x") for m in mins], pa.string())],
            names=["doc_id", "fp8"],
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fp, batch_format="pyarrow")


def q_dup_spans(sf_dir: str):
    """Duplicate-window spans (word-level ExactSubstr, Lee et al. ACL'22):
    maximal merged spans of words covered by an 8-word window whose exact
    text occurs >= 2 times anywhere in the corpus (within-doc repeats
    count).  Plan: streaming per-batch window-count partials in 64-bit
    fp space -> one groupby(fp).sum -> auto-gated broadcast-searchsorted
    / partitioned-semijoin apply (stages/dupspans.py).  Reference: llm-food
    has no corpus-level operator (its only dedup is the CLI input de-list,
    cli.py:206-218); brief-scope training-data op."""
    from llm_food_ray.stages.dupspans import duplicate_spans

    return duplicate_spans(_docs(sf_dir, ["doc_id", "text"]))


def q_dup_span_strip(sf_dir: str):
    """Companion cleaner: rebuild each document with every duplicated-span
    word removed -> (doc_id, text, n_removed); whitespace normalized to
    single spaces by the rebuild (oracle's ordered string_agg matches)."""
    from llm_food_ray.stages.dupspans import duplicate_span_strip

    return duplicate_span_strip(_docs(sf_dir, ["doc_id", "text"]))


def q_dup_spans_against(sf_dir: str):
    """Incremental ExactSubstr vs an archive: documents with
    doc_id % 3 == 0 are the ALREADY-ARCHIVED corpus (same convention as
    dedup_incremental); output = duplicated spans in the remaining NEW
    documents covered by any 8-word window seen anywhere in the archive
    (min_count=1 on the archive side).  The crawl-refresh shape: model
    from the archive once, apply scans only the new snapshot."""
    from llm_food_ray.stages.dupspans import duplicate_spans_against

    docs = _docs(sf_dir, ["doc_id", "text"])

    def part(keep_seen: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % 3 == 0) if keep_seen else (ids % 3 != 0)
            return b.filter(pa.array(mask))
        return f

    seen = docs.map_batches(part(True), batch_format="pyarrow")
    new = docs.map_batches(part(False), batch_format="pyarrow")
    return duplicate_spans_against(new, seen)


def q_ngram_coverage(sf_dir: str):
    """Cross-corpus window coverage: same archive split as
    dup_spans_against (doc_id % 3 == 0 = archived), every NEW document
    scored with the fraction of its positional 8-word windows seen
    anywhere in the archive — fp-keyed JOIN membership (the
    corpus-sized-reference shape), not a broadcast set."""
    from llm_food_ray.stages.dupspans import window_coverage_against

    docs = _docs(sf_dir, ["doc_id", "text"])

    def part(keep_seen: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % 3 == 0) if keep_seen else (ids % 3 != 0)
            return b.filter(pa.array(mask))
        return f

    seen = docs.map_batches(part(True), batch_format="pyarrow")
    new = docs.map_batches(part(False), batch_format="pyarrow")
    return window_coverage_against(new, seen)


def q_events_window(sf_dir: str):
    """Tumbling 1-hour windowed aggregate over the events stream table.

    Combiner pattern: each batch pre-aggregates (user_id, window) →
    (partial count, partial sum) with a vectorized Arrow group_by BEFORE
    the global shuffle, so the all-to-all exchange carries one row per
    (user, window, batch) instead of one per event."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        win = pc.divide(batch.column("ts").cast(pa.int64()), 3600 * 1_000_000)
        t = pa.Table.from_arrays(
            [batch.column("user_id"), win, batch.column("value")],
            names=["user_id", "window", "value"],
        )
        g = t.group_by(["user_id", "window"]).aggregate(
            [("value", "count"), ("value", "sum")])
        return g.rename_columns(["user_id", "window", "pn", "psum"])

    ds = _events(sf_dir).map_batches(partial, batch_format="pyarrow")
    agg = ds.groupby(["user_id", "window"]).aggregate(
        Sum("pn", alias_name="n"), Sum("psum", alias_name="sum_value")
    )

    def fmt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = batch.schema.get_field_index("sum_value")
        out = batch.set_column(i, "sum_value",
                               pc.round(batch.column("sum_value"), 4))
        j = out.schema.get_field_index("n")
        return out.set_column(j, "n", out.column("n").cast(pa.int64()))

    return agg.map_batches(fmt, batch_format="pyarrow")


def q_events_window_sliding(sf_dir: str):
    """Sliding 1-hour window, 15-minute hop, over the events stream:
    each event belongs to 4 overlapping windows — the per-batch combiner
    EXPLODES into (user, window_start) partials first (vectorized repeat,
    one group_by per batch), so the global exchange still carries
    pre-reduced partials, now x4, never one row per (event, window)."""
    from ray.data.aggregate import Sum

    HOP = 15 * 60 * 1_000_000
    WIN = 4  # hops per window

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        users = batch.column("user_id").to_numpy()
        vals = batch.column("value").to_numpy()
        hop_idx = ts // HOP
        # windows covering hop h start at hops h-3 .. h
        offs = np.arange(WIN)
        starts = (hop_idx[:, None] - offs[None, :]).ravel()
        idx = np.repeat(np.arange(len(ts)), WIN)
        t = pa.table({
            "user_id": pa.array(users[idx]),
            "win_start": pa.array(starts * HOP),
            "value": pa.array(vals[idx]),
        })
        g = t.group_by(["user_id", "win_start"]).aggregate(
            [("value", "count"), ("value", "sum")])
        return g.rename_columns(["user_id", "win_start", "pn", "psum"])

    ds = _events(sf_dir).map_batches(partial, batch_format="pyarrow")
    agg = ds.groupby(["user_id", "win_start"]).aggregate(
        Sum("pn", alias_name="n"), Sum("psum", alias_name="sum_value"))

    def fmt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = batch.schema.get_field_index("sum_value")
        out = batch.set_column(i, "sum_value",
                               pc.round(batch.column("sum_value"), 4))
        j = out.schema.get_field_index("n")
        return out.set_column(j, "n", out.column("n").cast(pa.int64()))

    return agg.map_batches(fmt, batch_format="pyarrow")


def q_multimodal_probe(sf_dir: str):
    """Multimodal metadata probe: documents.text bytes as an opaque
    payload through the actor-pool probe stage (deterministic FakeCodec)."""
    def to_payload(batch: pa.Table) -> pa.Table:
        payloads = [(t or "").encode("utf-8") for t in batch.column("text").to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(payloads, pa.binary())],
            names=["doc_id", "payload"],
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(to_payload, batch_format="pyarrow")
    probed = ds.map_batches(MediaProbeStage(), batch_format="pyarrow")
    return probed.select_columns(
        ["doc_id", "media_type", "n_bytes", "width", "height",
         "duration_ms", "n_frames"]
    )


def q_multimodal_features(sf_dir: str):
    """Feature-extract stage through the codec seam: 16-bin high-nibble
    histogram + byte entropy per payload.  The histogram list column is
    exploded to one row per (doc_id, bin) so DuckDB can rebuild it with
    generate_series + per-char byte grouping (the corpus is ASCII, so
    char position == byte position)."""
    from llm_food_ray.stages.multimodal import MediaFeatureStage

    def to_payload(batch: pa.Table) -> pa.Table:
        payloads = [(t or "").encode("utf-8") for t in batch.column("text").to_pylist()]
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(payloads, pa.binary())],
            names=["doc_id", "payload"],
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(to_payload, batch_format="pyarrow")
    out = ds.map_batches(MediaFeatureStage(), batch_format="pyarrow", batch_size=64)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column("doc_id").to_numpy()
        feats = batch.column("features")
        if isinstance(feats, pa.ChunkedArray):
            feats = feats.combine_chunks()
        flat = np.asarray(feats.flatten(), dtype=np.float64).reshape(n, 16)
        ent = batch.column("byte_entropy").to_numpy()
        return pa.Table.from_arrays(
            [pa.array(np.repeat(ids, 16)),
             pa.array(np.tile(np.arange(16, dtype=np.int64), n)),
             pa.array(flat.ravel(), pa.float64()),
             pa.array(np.repeat(ent, 16), pa.float64())],
            names=["doc_id", "bin", "frac", "byte_entropy"],
        )

    return out.map_batches(explode, batch_format="pyarrow")


def _logreg_feats(b: pa.Table) -> pa.Table:
    """Shared integer feature projection for the classifier-family
    queries: y = (lang = 'en'), x1 = capped length bucket, x2/x3 =
    digit / space rate per mille — all exact int64, SQL-replicable
    (`LEAST(n_chars // 40, 100)`, regexp_replace length diffs)."""
    import pyarrow.compute as pc

    n = b.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
    den = np.maximum(n, 1)
    digits = pc.count_substring_regex(b.column("text"), "[0-9]").to_numpy(
        zero_copy_only=False).astype(np.int64)
    spaces = pc.count_substring(b.column("text"), " ").to_numpy(
        zero_copy_only=False).astype(np.int64)
    y = pc.cast(pc.equal(b.column("lang"), "en"), pa.int64())
    return pa.table({
        "source": b.column("source"),
        "y": y,
        "x1": pa.array(np.minimum(n // 40, 100)),
        "x2": pa.array((1000 * digits) // den),
        "x3": pa.array((1000 * spaces) // den),
    })


def q_quality_logreg(sf_dir: str):
    """Per-source binary quality classifier (predict lang='en' from
    char-stat features) trained by 6 epochs of exact fixed-point
    full-batch gradient descent with a rational sigmoid — the
    distributed trainable-classifier primitive; weights are int64
    micro-units so the iterative optimizer is bit-identical to the
    unrolled-CTE SQL twin."""
    from llm_food_ray.stages.classify import grouped_logreg_fit

    ds = _docs(sf_dir, ["text", "lang", "source", "n_chars"]).map_batches(
        _logreg_feats, batch_format="pyarrow")
    return grouped_logreg_fit(ds, "source", ["x1", "x2", "x3"], "y",
                              iters=6, lr=0.5)


def q_feature_auc(sf_dir: str):
    """Per-source exact ROC-AUC of the space-rate quality signal
    against the lang='en' label — the classifier-eval primitive
    (U/(n₁·n₀) over the value histogram, never n₁×n₀ pairs): the
    audit a pipeline runs before trusting a cheap filter signal."""
    from llm_food_ray.stages.textstats import grouped_auc

    def score(b: pa.Table) -> pa.Table:
        f = _logreg_feats(b)
        return pa.table({"source": f.column("source"),
                         "y": f.column("y"),
                         "score": f.column("x3")})

    ds = _docs(sf_dir, ["text", "lang", "source", "n_chars"]).map_batches(
        score, batch_format="pyarrow")
    return grouped_auc(ds, "source", "y", "score")


def q_pr_curve(sf_dir: str):
    """Per-source precision/recall/F1 sweep of the space-rate quality
    signal at every realized threshold — how a pipeline picks the
    cutoff for a cheap filter: exact suffix sums of the score
    histogram, one division per metric."""
    from llm_food_ray.stages.textstats import threshold_metrics

    def score(b: pa.Table) -> pa.Table:
        f = _logreg_feats(b)
        return pa.table({"source": f.column("source"),
                         "y": f.column("y"),
                         "score": f.column("x3")})

    ds = _docs(sf_dir, ["text", "lang", "source", "n_chars"]).map_batches(
        score, batch_format="pyarrow")
    return threshold_metrics(ds, "source", "y", "score")


def q_calibration(sf_dir: str):
    """Per-(source, decile-bin) calibration decomposition of the
    space-rate signal (per-mille scale) against the lang='en' label —
    exact per-bin int moments plus the two single-division rates; the
    reliability-diagram input, never a cross-bin float ECE sum."""
    from llm_food_ray.stages.textstats import calibration_bins

    def score(b: pa.Table) -> pa.Table:
        f = _logreg_feats(b)
        return pa.table({"source": f.column("source"),
                         "y": f.column("y"),
                         "score": f.column("x3")})

    ds = _docs(sf_dir, ["text", "lang", "source", "n_chars"]).map_batches(
        score, batch_format="pyarrow")
    return calibration_bins(ds, "source", "y", "score",
                            n_bins=10, score_scale=1000)


def q_label_agreement(sf_dir: str):
    """Per-source Cohen's kappa between two binarized cheap quality
    signals (space-rate ≥ 160‰ vs length-bucket ≥ 25) — do two filter
    heuristics agree beyond chance; exact confusion moments, one
    division."""
    import pyarrow.compute as pc

    from llm_food_ray.stages.textstats import label_agreement

    def labels(b: pa.Table) -> pa.Table:
        f = _logreg_feats(b)
        hi = pa.array(["hi"] * len(f)), pa.array(["lo"] * len(f))
        a = pc.if_else(pc.greater_equal(f.column("x3"), 160), *hi)
        bb = pc.if_else(pc.greater_equal(f.column("x1"), 25), *hi)
        return pa.table({"source": f.column("source"), "a": a, "b": bb})

    ds = _docs(sf_dir, ["text", "lang", "source", "n_chars"]).map_batches(
        labels, batch_format="pyarrow")
    return label_agreement(ds, "source", "a", "b")


def queries() -> dict[str, Callable[[str], Any]]:
    # Window policy (round 5): the driver checks the FIRST 50 entries.
    # Slot 1 goes to distinctive_terms (the round-4 driver FAIL, fixed
    # via stages/joins.safe_join — the green row is the regression
    # proof); slots 2-6 are this round's brand-new operators (highest
    # risk, so they get driver rows in their birth round); the rest are
    # drawn from the 76 queries that have never had a driver
    # CORRECTNESS row (classifier-eval, graph, sketch, index, ANN
    # families).  Never-checked entries that do not fit this window
    # head the round-6 rotation; every displaced entry is r1-r4
    # driver-green and stays in the end-of-round local sweep
    # (tools/check_oracle.py).
    return {
        "distinctive_terms": q_distinctive_terms,
        "jaccard_join": q_jaccard_join,
        "fdr_correct": q_fdr_correct,
        "fix_mojibake": q_fix_mojibake,
        "dedup_near_indexed": q_dedup_near_indexed,
        "jsonld_extract": q_jsonld_extract,
        "template_clusters": q_template_clusters,
        "link_rels": q_link_rels,
        "canonical_dedup": q_canonical_dedup,
        "warc_ingest": q_warc_ingest,
        "charset_normalize": q_charset_normalize,
        "robots_parse": q_robots_parse,
        "page_meta": q_page_meta,
        "content_density": q_content_density,
        "sitemap_parse": q_sitemap_parse,
        "bm25_multi": q_bm25_multi,
        "keyword_tag": q_keyword_tag,
        "dedup_canonical": q_dedup_canonical,
        "quality_logreg": q_quality_logreg,
        "feature_auc": q_feature_auc,
        "pr_curve": q_pr_curve,
        "calibration": q_calibration,
        "label_agreement": q_label_agreement,
        "harmonic": q_harmonic,
        "silhouette": q_silhouette,
        "spearman": q_spearman,
        "gini_lang": q_gini_lang,
        "term_drift": q_term_drift,
        "signal_mi": q_signal_mi,
        "vocab_overlap": q_vocab_overlap,
        "prop_test": q_prop_test,
        "entity_spans": q_entity_spans,
        "gopher_flags": q_gopher_flags,
        "c4_lines": q_c4_lines,
        "ks_test": q_ks_test,
        "length_outliers": q_length_outliers,
        "fertility": q_fertility,
        "percent_rank_len": q_percent_rank_len,
        "nb_lang_classify": q_nb_lang_classify,
        "oov_rate": q_oov_rate,
        "len_deciles": q_len_deciles,
        "lang_confusion": q_lang_confusion,
        "term_lookup": q_term_lookup,
        "index_merge": q_index_merge,
        "hll_distinct": q_hll_distinct,
        "leakage_split": q_leakage_split,
        "pagerank_personalized": q_pagerank_personalized,
        "cocitation": q_cocitation,
        "pagination_chains": q_pagination_chains,
        "content_lifespan": q_content_lifespan,
        "hits": q_hits,
        "profile_table": q_profile_table,
        "plagiarism_pairs": q_plagiarism_pairs,
        "containment_pairs": q_containment_pairs,
        "cdf_against": q_cdf_against,
        "collapse_lines": q_collapse_lines,
        "host_tier_filter": q_host_tier_filter,
        "ccnet_buckets": q_ccnet_buckets,
        "kmeans_clusters": q_kmeans_clusters,
        "embedding_outliers": q_embedding_outliers,
        "hard_negatives": q_hard_negatives,
        "diverse_sample": q_diverse_sample,
        "random_project": q_random_project,
        "embedding_cov": q_embedding_cov,
        "hybrid_search": q_hybrid_search,
        "running_totals": q_running_totals,
        "rolling_stats": q_rolling_stats,
        "rolling_time": q_rolling_time,
        "range_join": q_range_join,
        "top_k_per_lang": q_top_k_per_lang,
        "pca_project": q_pca_project,
        "supplier_components": q_supplier_components,
        "snapshot_overlap": q_snapshot_overlap,
        "dup_spans_against": q_dup_spans_against,
        "dedup_incremental": q_dedup_incremental,
        "dedup_incremental_bloom": q_dedup_incremental_bloom,
        "quality_tiers": q_quality_tiers,
        "tier_extract": q_tier_extract,
        "canonical_best": q_canonical_best,
        "dedup_lines": q_dedup_lines,
        "url_blocklist": q_url_blocklist,
        "top_bigrams_sketch": q_top_bigrams_sketch,
        "dup_spans": q_dup_spans,
        "dedup_near_against": q_dedup_near_against,
        "crawl_diff": q_crawl_diff,
        "near_dup_keep_best": q_near_dup_keep_best,
        "phrase_search": q_phrase_search,
        "char_entropy": q_char_entropy,
        "distinct_lengths": q_distinct_lengths,
        "mode_source": q_mode_source,
        "temperature_mix": q_temperature_mix,
        "strip_boilerplate": q_strip_boilerplate,
        "dup_span_strip": q_dup_span_strip,
        "triangle_counts": q_triangle_counts,
        "clustering_coef": q_clustering_coef,
        "label_propagation": q_label_propagation,
        "kcore": q_kcore,
        "editdist_pairs": q_editdist_pairs,
        "name_entities": q_name_entities,
        "bfs_depth": q_bfs_depth,
        "reciprocity": q_reciprocity,
        "bitext_mine": q_bitext_mine,
        "linear_fit": q_linear_fit,
        "event_transitions": q_event_transitions,
        "funnel": q_funnel,
        "cohort_retention": q_cohort_retention,
        "url_templates": q_url_templates,
        "crawl_budget": q_crawl_budget,
        "burst_scores": q_burst_scores,
        "active_users": q_active_users,
        "drift_psi": q_drift_psi,
        "session_durations": q_session_durations,
        "mad_len": q_mad_len,
        "vocab_growth": q_vocab_growth,
        "host_dup_rates": q_host_dup_rates,
        "source_diversity": q_source_diversity,
        "readability": q_readability,
        "skyline": q_skyline,
        "wmedian_len": q_wmedian_len,
        "winsor_len": q_winsor_len,
        "media_dedup": q_media_dedup,
        "rank_test": q_rank_test,
        "welch_test": q_welch_test,
        "chi2_terms": q_chi2_terms,
        "llr_terms": q_llr_terms,
        "vocab_js": q_vocab_js,
        "zipf_slope": q_zipf_slope,
        "knn_graph": q_knn_graph,
        "ngram_novelty": q_ngram_novelty,
        "stratified_sample": q_stratified_sample,
        "domain_rollup": q_domain_rollup,
        "html_tables": q_html_tables,
        "code_stats": q_code_stats,
        "dup_ngram_stats": q_dup_ngram_stats,
        "shard_assign": q_shard_assign,
        "grouped_zscore": q_grouped_zscore,
        "media_phash": q_media_phash,
        "props_flatten": q_props_flatten,
        "para_lang": q_para_lang,
        "cluster_sizes": q_cluster_sizes,
        "kendall": q_kendall,
        "extract_files": q_extract_files,
        "jsonl_ingest": q_jsonl_ingest,
        "csv_ingest": q_csv_ingest,
        "robots_policy": q_robots_policy,
        "politeness_order": q_politeness_order,
        "crawl_plan": q_crawl_plan,
        "bpe_train": q_bpe_train,
        "bpe_encode": q_bpe_encode,
        "bpe_pairs": q_bpe_pairs,
        "semdedup": q_semdedup,
        "top_pmi": q_top_pmi,
        "curate_full": q_curate_full,
        "epoch_order": q_epoch_order,
        "script_stats": q_script_stats,
        "grouped_corr": q_grouped_corr,
        "contamination_frac": q_contamination_frac,
        "embedding_quantize": q_embedding_quantize,
        "ann_topk_quantized": q_ann_topk_quantized,
        "ngram_coverage": q_ngram_coverage,
        "cap_per_lang": q_cap_per_lang,
        "resample_mix": q_resample_mix,
        "weighted_sample_per_lang": q_weighted_sample_per_lang,
        "quantiles_len": q_quantiles_len,
        "pagerank": q_pagerank,
        "anchor_texts": q_anchor_texts,
        "sessionize": q_sessionize,
        "sample_per_lang": q_sample_per_lang,
        "curate": q_curate,
        "quality_stats": q_quality_stats,
        "repetition_stats": q_repetition_stats,
        "quality_filter": q_quality_filter,
        "token_stats": q_token_stats,
        "extract_pages": q_extract_pages,
        "dedup_exact": q_dedup_exact,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "multimodal_probe": q_multimodal_probe,
        "events_window": q_events_window,
        "dedup_minhash": q_dedup_minhash,
        "ngram_lm_score": q_ngram_lm_score,
        "tfidf_terms": q_tfidf_terms,
        "top_bigrams": q_top_bigrams,
        "extract_hash": q_extract_hash,
        "extract_chunks": q_extract_chunks,
        "extract_spans": q_extract_spans,
        "events_window_sliding": q_events_window_sliding,
        "asof_last_purchase": q_asof_last_purchase,
        "url_canonicalize": q_url_canonicalize,
        "normalize_text": q_normalize_text,
        "pii_scrub": q_pii_scrub,
        "hash_split": q_hash_split,
        "decontaminate": q_decontaminate,
        "extract_docx": q_extract_docx,
        "extract_rtf": q_extract_rtf,
        "extract_pptx": q_extract_pptx,
        "chunk_token": q_chunk_token,
        "chunk_sentence": q_chunk_sentence,
        "chunk_recursive": q_chunk_recursive,
        "extract_auto": q_extract_auto,
        "extract_status_counts": q_extract_status_counts,
        "pdf_pages_explode": q_pdf_pages_explode,
        "pdf_reaggregate": q_pdf_reaggregate,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_features": q_multimodal_features,
        "frame_sample": q_frame_sample,
        "dedup_embedding": q_dedup_embedding,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "dedup_simhash": q_dedup_simhash,
        "embedding_neardup": q_embedding_neardup,
        "ann_topk": q_ann_topk,
        "cluster_assign": q_cluster_assign,
        "bm25_search": q_bm25_search,
        "pack_sequences": q_pack_sequences,
        "dsir_weights": q_dsir_weights,
        "ann_ivf": q_ann_ivf,
        "ann_ivf_full": q_ann_ivf_full,
        "ann_ivf_partitioned": q_ann_ivf_partitioned,
        "lang_counts": q_lang_counts,
        "host_stats": q_host_stats,
        "dedup_paragraph": q_dedup_paragraph,
        "chunk_spans": q_chunk_spans,
        "outlinks": q_outlinks,
        "host_graph": q_host_graph,
        "lm_cross_score": q_lm_cross_score,
        "token_budget_mix": q_token_budget_mix,
        "near_dup_clusters": q_near_dup_clusters,
        "corpus_sample": q_corpus_sample,
        "weighted_sample": q_weighted_sample,
        "median_len": q_median_len
    }


# ---------------------------------------------------------- oracle SQL ----


def _hll_est_sql(src: str) -> str:
    """Scalar HLL-estimate subquery over ``src`` (a CTE exposing a `v`
    string column) — the same md5-prefix/bin()-rho/alpha/linear-count
    replica as the `hll_distinct` oracle, shared by the overlap query's
    three sketches."""
    return f"""(
  SELECT round(CASE WHEN e_raw <= 2.5 * 4096 AND zeros > 0
                    THEN 4096 * ln(4096.0 / zeros) ELSE e_raw END, 6)
  FROM (
    SELECT (0.7213 / (1.0 + 1.079 / 4096)) * 4096 * 4096
             / (s_present + (4096 - n_present) * 1.0) AS e_raw,
           4096 - n_present AS zeros
    FROM (
      SELECT sum(pow(2.0, -rho)) AS s_present,
             count(*)::BIGINT AS n_present
      FROM (
        SELECT bucket,
               max(CASE WHEN rem = 0 THEN 53
                        ELSE 53 - length(bin(rem)) END) AS rho
        FROM (
          SELECT CAST(h >> 52 AS BIGINT) AS bucket,
                 CAST(h & ((1::UBIGINT << 52) - 1) AS BIGINT) AS rem
          FROM (SELECT DISTINCT ('0x' || substr(md5(v), 1, 16))::UBIGINT
                  AS h FROM {src})
        ) GROUP BY bucket
      )
    )
  )
)"""


def _bpe_train_sql(num_merges: int = 8, min_word_len: int = 2) -> str:
    """Unrolled-CTE twin of ``vocab.py:bpe_train``: per merge step —
    adjacent-pair count over the word table (weighted by word
    frequency), (cnt desc, l, r) argmax, then the left-to-right
    non-overlapping rewrite via the run-parity window trick (matches in
    a run of consecutive positions keep odd row_numbers).  Every CTE is
    MATERIALIZED — the steps chain, and DuckDB's default inlining would
    re-evaluate each step exponentially often."""
    parts = [f"""WITH w0 AS MATERIALIZED (
  SELECT word, COUNT(*)::BIGINT AS n FROM (
    SELECT UNNEST(regexp_split_to_array(text, '[ \\t\\n\\r\\f\\v]+')) AS word
    FROM documents)
  WHERE LENGTH(word) >= {min_word_len}
  GROUP BY word
),
s0 AS MATERIALIZED (
  SELECT word, n, LIST(SUBSTRING(word, i, 1) ORDER BY i) AS s
  FROM (SELECT word, n, UNNEST(GENERATE_SERIES(1, LENGTH(word))) AS i FROM w0)
  GROUP BY word, n
)"""]
    for k in range(1, num_merges + 1):
        prev = f"s{k - 1}"
        parts.append(f""",
p{k} AS MATERIALIZED (
  SELECT s[i] AS l, s[i+1] AS r, SUM(n)::BIGINT AS cnt
  FROM (SELECT n, s, UNNEST(GENERATE_SERIES(1, LEN(s) - 1)) AS i FROM {prev})
  GROUP BY 1, 2
),
b{k} AS MATERIALIZED (SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1),
pos{k} AS MATERIALIZED (
  SELECT q.word, q.n, q.i, q.s[q.i] AS sym,
         (q.i < LEN(q.s) AND q.s[q.i] = b.l AND q.s[q.i+1] = b.r) AS m
  FROM (SELECT word, n, s, UNNEST(GENERATE_SERIES(1, LEN(s))) AS i
        FROM {prev}) q, b{k} b
),
mm{k} AS MATERIALIZED (
  SELECT word, i, i - ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS rk
  FROM pos{k} WHERE m
),
keep{k} AS MATERIALIZED (
  SELECT word, i FROM (
    SELECT word, i, ROW_NUMBER() OVER (PARTITION BY word, rk ORDER BY i) AS j
    FROM mm{k})
  WHERE j % 2 = 1
),
s{k} AS MATERIALIZED (
  SELECT p.word, p.n,
         LIST(CASE WHEN k1.i IS NOT NULL THEN b.l || b.r ELSE p.sym END
              ORDER BY p.i) AS s
  FROM pos{k} p
  CROSS JOIN b{k} b
  LEFT JOIN keep{k} k1 ON k1.word = p.word AND k1.i = p.i
  LEFT JOIN keep{k} k2 ON k2.word = p.word AND k2.i = p.i - 1
  WHERE k2.i IS NULL
  GROUP BY p.word, p.n
)""")
    sel = "\nUNION ALL ".join(
        f"SELECT {k} AS merge_rank, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, cnt AS n FROM b{k}"
        for k in range(1, num_merges + 1))
    parts.append(f"\nSELECT * FROM (\n{sel}\n) ORDER BY merge_rank")
    return "".join(parts)


def _bpe_encode_sql(num_merges: int = 8, min_word_len: int = 2) -> str:
    """Twin of ``vocab.py:bpe_token_counts``: reuse the train twin's
    final word-symbol state s{K} and join every document word against
    its post-merge symbol count (short words count 1)."""
    train = _bpe_train_sql(num_merges=num_merges,
                           min_word_len=min_word_len)
    head, _ = train.rsplit("\nSELECT * FROM (", 1)
    return (head + f""",
wl AS MATERIALIZED (
  SELECT word, LEN(s)::BIGINT AS nt FROM s{num_merges}
),
dw AS MATERIALIZED (
  SELECT doc_id, word FROM (
    SELECT doc_id,
           UNNEST(regexp_split_to_array(text, '[ \\t\\n\\r\\f\\v]+'))
             AS word
    FROM documents)
  WHERE word <> ''
)
SELECT d.doc_id,
       SUM(CASE WHEN LENGTH(d.word) < {min_word_len} THEN 1
                ELSE w.nt END)::BIGINT AS n_tokens
FROM dw d LEFT JOIN wl w ON w.word = d.word
GROUP BY d.doc_id""")


def _kmeans_sql(iters: int = 2, k: int = 8, modulus: int = 61,
                source: str = "embeddings") -> str:
    """Unrolled-CTE twin of ``similarity.py:kmeans_fit`` (the pagerank
    recipe): per iteration — round-9 distances, (dist, cid) argmin,
    per-dimension round-9 sums and means, empty clusters COALESCE to
    the previous centroid — then one final assignment.  ``source`` is
    any table/CTE with (vec_id, embedding) — ``_semdedup_sql`` feeds
    the duplicate-augmented set through the same twin."""
    ctes = [f"""e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM {source}
)""", f"""s AS (
  SELECT vec_id, v FROM e WHERE vec_id % {modulus} = 0
  ORDER BY vec_id LIMIT {k}
)""", """c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         list_transform(v, x -> round(x, 9)) AS c
  FROM s
)"""]
    for t in range(1, iters + 2):
        prev = f"c{t - 1}"
        ctes.append(f"""d{t} AS (
  SELECT e.vec_id, c.cid,
         round(list_aggregate(list_transform(range(1, len(e.v) + 1),
               i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])), 'sum'), 9) AS d
  FROM e CROSS JOIN {prev} c
)""")
        ctes.append(f"""a{t} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM d{t})
  WHERE rn = 1
)""")
        if t == iters + 1:
            break
        ctes.append(f"""m{t} AS (
  SELECT a.cid, g.i, round(sum(e.v[g.i]), 9) AS s, count(*) AS n
  FROM a{t} a JOIN e ON a.vec_id = e.vec_id,
       LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS i) g
  GROUP BY a.cid, g.i
)""")
        ctes.append(f"""c{t} AS (
  SELECT {prev}.cid, COALESCE(mm.c, {prev}.c) AS c
  FROM {prev} LEFT JOIN (
    SELECT cid, list(round(s / n, 9) ORDER BY i) AS c
    FROM m{t} GROUP BY cid) mm
  ON {prev}.cid = mm.cid
)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT vec_id, cid AS cluster FROM a{iters + 1}")


def _kmeans_assign_d_sql(iters: int = 2, k: int = 8, modulus: int = 61,
                         source: str = "embeddings") -> str:
    """Like :func:`_kmeans_sql` but emits (vec_id, cluster, d) — the
    assigned round-9 squared distance — for the outlier twin."""
    km = _kmeans_sql(iters=iters, k=k, modulus=modulus, source=source)
    head, _ = km.rsplit("\nSELECT", 1)
    t = iters + 1
    return (head + f"""
SELECT a.vec_id, a.cid AS cluster, d.d
FROM a{t} a JOIN d{t} d ON d.vec_id = a.vec_id AND d.cid = a.cid""")


def _semdedup_sql(iters: int = 2, k: int = 8, modulus: int = 61,
                  tau: float = 0.4) -> str:
    """Twin of ``similarity.py:semdedup`` over the duplicate-augmented
    embeddings: the unrolled k-means CTE assigns clusters, then a
    within-cluster NOT EXISTS drops every vector dominated by a
    lower-key neighbour with round-4 cosine ≥ tau."""
    km = _kmeans_sql(iters=iters, k=k, modulus=modulus, source="aug")
    return f"""WITH aug AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 9 = 0
),
assign AS MATERIALIZED (
  SELECT * FROM ({km}) t
),
ev AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM aug
)
SELECT a.vec_id, a.cluster FROM assign a
WHERE NOT EXISTS (
  SELECT 1 FROM assign b
  JOIN ev u ON u.vec_id = b.vec_id
  JOIN ev w ON w.vec_id = a.vec_id
  WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
    AND round(list_cosine_similarity(u.v, w.v), 4) >= {tau})
"""


def _bfs_sql(rounds: int = 3) -> str:
    """Unrolled twin of :func:`llm_food_ray.stages.graph.bfs_depth` on
    the (bidirectional) bipartite purchase graph from every 100th
    customer: per round, reached nodes fold min(depth, nbr depth + 1)."""
    parts = ["""WITH e0 AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey::BIGINT AS u, (-l.l_suppkey)::BIGINT AS v
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_quantity >= 40
), e AS MATERIALIZED (
  SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0
), d0 AS MATERIALIZED (
  SELECT c_custkey::BIGINT AS node, 0::BIGINT AS depth
  FROM customer WHERE c_custkey % 100 = 1
)"""]
    for r in range(rounds):
        parts.append(f""", d{r + 1} AS MATERIALIZED (
  SELECT node, min(depth)::BIGINT AS depth FROM (
    SELECT node, depth FROM d{r}
    UNION ALL
    SELECT e.v AS node, d.depth + 1 AS depth
    FROM d{r} d JOIN e ON e.u = d.node
  ) GROUP BY node
)""")
    parts.append(f"\nSELECT node, depth FROM d{rounds}")
    return "".join(parts)


def _labelprop_sql(rounds: int = 3) -> str:
    """Unrolled twin of :func:`llm_food_ray.stages.graph
    .label_propagation` on the supplier co-purchase graph: per round
    one label-attach join, a (node, label) count, a (n DESC, label)
    window argmax, and a seed-clamped union."""
    parts = ["""WITH li AS MATERIALIZED (
  SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 45
), e AS MATERIALIZED (
  SELECT DISTINCT a.l_suppkey::BIGINT AS u, b.l_suppkey::BIGINT AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
), seeds AS MATERIALIZED (
  SELECT s_suppkey::BIGINT AS node, 'n' || s_nationkey AS label
  FROM supplier WHERE s_suppkey % 10 = 0
), l0 AS MATERIALIZED (SELECT node, label FROM seeds)"""]
    for r in range(rounds):
        parts.append(f""", c{r} AS MATERIALIZED (
  SELECT e.v AS node, l.label, count(*)::BIGINT AS n
  FROM e JOIN l{r} l ON l.node = e.u GROUP BY 1, 2
), a{r} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY n DESC, label) AS rn
    FROM c{r}) WHERE rn = 1
), l{r + 1} AS MATERIALIZED (
  SELECT node, label FROM seeds
  UNION ALL
  SELECT a.node, a.label FROM a{r} a
  WHERE a.node NOT IN (SELECT node FROM seeds)
)""")
    parts.append(f"\nSELECT node, label FROM l{rounds}")
    return "".join(parts)


def _kcore_sql(k: int = 5, rounds: int = 3) -> str:
    """Unrolled peeling twin of :func:`llm_food_ray.stages.graph.kcore`
    on the bipartite purchase graph — one (degree-filter, edge-
    semijoin) CTE pair per round, all MATERIALIZED (DuckDB CTE
    inlining is exponential on chains)."""
    parts = ["""WITH e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(o.o_custkey, -l.l_suppkey)::BIGINT AS a,
                  GREATEST(o.o_custkey, -l.l_suppkey)::BIGINT AS b
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_quantity >= 40
)"""]
    for r in range(rounds):
        parts.append(f""", n{r + 1} AS MATERIALIZED (
  SELECT node
  FROM (SELECT a AS node FROM e{r} UNION ALL SELECT b FROM e{r})
  GROUP BY node HAVING count(*) >= {k}
), e{r + 1} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{r} e
  JOIN n{r + 1} x ON e.a = x.node
  JOIN n{r + 1} y ON e.b = y.node
)""")
    parts.append(f"""
SELECT node, count(*)::BIGINT AS deg
FROM (SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
GROUP BY node""")
    return "".join(parts)


def _hits_sql(iters: int = 5) -> str:
    """Unrolled HITS twin (``stages/graph.py:hits``): the same edge CTE
    as pagerank's, then per round two join+sum half-steps with round-12
    pins and an order-independent MAX denominator."""
    ctes = ["""edges AS MATERIALIZED (
  SELECT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst,
         count(*)::DOUBLE AS w
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)""", """nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
)""", """nn AS (SELECT count(*)::DOUBLE AS n FROM nodes)""",
            "h0 AS MATERIALIZED (SELECT node, round(1.0 / nn.n, 12) AS s "
            "FROM nodes, nn)"]
    for t in range(1, iters + 1):
        for raw, prev, in_c, out_c in (
                (f"ar{t}", f"h{t - 1}", "src", "dst"),
                (f"hr{t}", f"a{t}", "dst", "src")):
            out = "a" + str(t) if raw.startswith("ar") else "h" + str(t)
            ctes.append(f"""{raw} AS MATERIALIZED (
  SELECT nd.node, round(COALESCE(x.c, 0.0), 12) AS s
  FROM nodes nd LEFT JOIN (
    SELECT e.{out_c} AS node, sum(p.s * e.w) AS c
    FROM edges e JOIN {prev} p ON e.{in_c} = p.node
    GROUP BY e.{out_c}) x
  ON nd.node = x.node
)""")
            ctes.append(f"""{out} AS MATERIALIZED (
  SELECT node, CASE WHEN d = 0 THEN s ELSE round(s / d, 12) END AS s
  FROM {raw}, (SELECT max(s) AS d FROM {raw})
)""")
    return ("WITH " + ",\n".join(ctes)
            + f"""
SELECT n.node, h.s AS hub, a.s AS authority
FROM nodes n
JOIN h{iters} h ON h.node = n.node
JOIN a{iters} a ON a.node = n.node""")


def _outliers_sql(iters: int = 2, k: int = 8, modulus: int = 61,
                  z: float = 2.0) -> str:
    """Twin of ``similarity.py:embedding_outliers``: the exact
    mu/ex2/sig/z rounding sequence over the assigned round-9 squared
    distances."""
    ad = _kmeans_assign_d_sql(iters=iters, k=k, modulus=modulus)
    return f"""WITH ad AS MATERIALIZED (
  SELECT * FROM ({ad}) t
),
mom AS MATERIALIZED (
  SELECT cluster, count(*)::BIGINT AS n,
         round(sum(d) / count(*), 6) AS mu,
         round(sum(d * d) / count(*), 6) AS ex2
  FROM ad GROUP BY cluster
),
sg AS MATERIALIZED (
  SELECT cluster, mu,
         sqrt(greatest(ex2 - mu * mu, 0.0)) AS sig
  FROM mom
)
SELECT a.vec_id, a.cluster, round((a.d - s.mu) / s.sig, 6) AS z
FROM ad a JOIN sg s ON s.cluster = a.cluster
WHERE s.sig > 0 AND round((a.d - s.mu) / s.sig, 6) >= {z}
"""


def _in_list(vals) -> str:
    return ", ".join("'" + str(v) + "'" for v in vals)


def _pagerank_sql(iters: int = 5, damping: float = 0.85,
                  personalize: list | None = None) -> str:
    """Unrolled PageRank twin: the same ``iters`` rounded power
    iterations as ``stages/graph.py:pagerank``, one chained CTE per
    iteration (recursive CTEs restrict aggregation; unrolling is plain
    SQL).  Per-iteration round(…, 12) absorbs summation-order ulps on
    both sides, so the ranks match bit-for-bit."""
    ctes = ["""edges AS (
  SELECT 'c' || o.o_custkey AS src, 's' || l.l_suppkey AS dst,
         count(*)::DOUBLE AS w
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)""", """outw AS (
  SELECT src AS node, sum(w) AS ow FROM edges GROUP BY src
)""", """nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
)""", """nn AS (SELECT count(*)::DOUBLE AS n FROM nodes)""",
            (f"pr0 AS (SELECT node, CASE WHEN node IN ({_in_list(personalize)}) "
             f"THEN round(1.0 / {len(personalize)}, 12) ELSE 0.0 END AS pr "
             "FROM nodes)" if personalize else
             "pr0 AS (SELECT node, round(1.0 / nn.n, 12) AS pr "
             "FROM nodes, nn)")]
    if personalize:
        base_expr = (f"CASE WHEN nd.node IN ({_in_list(personalize)}) "
                     f"THEN (1.0 - {damping}) / {len(personalize)} "
                     "ELSE 0.0 END")
    else:
        base_expr = f"(1.0 - {damping}) / nn.n"
    for i in range(1, iters + 1):
        ctes.append(f"""pr{i} AS (
  SELECT nd.node,
         round({base_expr} + {damping} * COALESCE(s.c, 0.0),
               12) AS pr
  FROM nodes nd CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node, sum(p.pr / w.ow * e.w) AS c
    FROM edges e
    JOIN pr{i - 1} p ON p.node = e.src
    JOIN outw w ON w.node = e.src
    GROUP BY e.dst
  ) s ON s.node = nd.node
)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, pr FROM pr{iters}")

_URL = "'https://site' || (doc_id % 100) || '.example.com/doc/' || doc_id"

_HTML_SQL = (
    "'<html><head><title>Doc ' || doc_id || '</title></head><body>' || chr(10) || "
    "'<nav><a href=\"/home\">home</a> <a href=\"/about\">about</a> "
    "<a href=\"/contact\">contact</a></nav>' || chr(10) || "
    "'<div class=\"sidebar\"><a href=\"/l1\">promo one</a> <a href=\"/l2\">promo two</a> "
    "<a href=\"/l3\">promo three</a></div>' || chr(10) || "
    "'<article><h1>Document ' || doc_id || '</h1><p>' || text || '</p></article>' || chr(10) || "
    "'<footer>copyright example site ' || (doc_id % 100) || '</footer>' || chr(10) || "
    "'</body></html>'"
)

_DOC_TYPE_SQL = (
    "CASE WHEN doc_id % 50 = 3 THEN 'pdf' "
    "WHEN doc_id % 50 = 13 THEN 'unknown' "
    "WHEN doc_id % 10 = 7 THEN 'text' "
    "WHEN doc_id % 5 = 1 THEN 'pdf' ELSE 'html' END"
)

_STATUS_SQL = "CASE WHEN doc_id % 50 IN (3, 13) THEN 'failed' ELSE 'ok' END"

_MARKDOWN_SQL = (
    "CASE WHEN doc_id % 50 IN (3, 13) THEN '' "
    "WHEN doc_id % 10 = 7 THEN text "
    "ELSE '# Document ' || doc_id || chr(10) || chr(10) || text END"
)

_STOPLIST = ("'the','of','and','to','a','in','is','that','it','for','on',"
             "'with','as','are','was','be','this','have','from','or','by'")

_CHUNK_CTE = """
WITH toks_t AS (
  SELECT {key} AS k, string_split_regex({text_expr}, '\\s+') AS toks FROM {src}
), n_t AS (
  SELECT k, toks, len(toks) AS n FROM toks_t
), c_t AS (
  SELECT k, toks, n,
         CASE WHEN n <= {size} THEN 1
              ELSE 1 + CAST(ceil((n - {size}) / {step}.0) AS INT) END AS m
  FROM n_t
)
SELECT k AS {key_out},
       CAST(i AS INTEGER) AS chunk_index,
       array_to_string(toks[(i * {step} + 1):LEAST(i * {step} + {size}, n)], ' ')
         AS chunk_text
FROM c_t, LATERAL (SELECT unnest(generate_series(0, m - 1)) AS i) g
"""


# shared CTE for the repetition oracles: DuckDB list-function twin of
# functions/repetition.py (trim class = ASCII whitespace minus \v);
# parametrized on the source relation so composed oracles (curate) can
# run it over augmented inputs
def _repetition_cte(src: str) -> str:
    return r"""
base AS (
  SELECT doc_id,
    list_filter(string_split(text, chr(10)),
                l -> trim(l, ' ' || chr(9) || chr(13) || chr(10) || chr(12)) <> '') AS lines,
    list_filter(string_split(text, chr(10) || chr(10)),
                p -> trim(p, ' ' || chr(9) || chr(13) || chr(10) || chr(12)) <> '') AS paras,
    list_filter(regexp_split_to_array(text, '[ \t\r\n\f]+'), w -> w <> '') AS words
  FROM __SRC__
), rep AS (
  SELECT doc_id,
    len(lines) AS n_lines,
    len(words) AS n_words,
    round(CASE WHEN len(lines) = 0 THEN 0.0
          ELSE 1.0 - len(list_distinct(lines)) * 1.0 / len(lines) END, 6) AS dup_line_frac,
    round(CASE WHEN len(paras) = 0 THEN 0.0
          ELSE 1.0 - len(list_distinct(paras)) * 1.0 / len(paras) END, 6) AS dup_para_frac,
    round(CASE WHEN len(words) = 0 THEN 0.0
          ELSE list_max(list_transform(list_distinct(words),
                        w -> len(list_filter(words, x -> x = w)))) * 1.0 / len(words) END, 6) AS top_word_frac,
    round(CASE WHEN len(lines) = 0 THEN 0.0
          ELSE len(list_filter(lines,
               l -> ltrim(l, ' ' || chr(9) || chr(13) || chr(10) || chr(12)) LIKE '-%'
                 OR ltrim(l, ' ' || chr(9) || chr(13) || chr(10) || chr(12)) LIKE '*%'
                 OR ltrim(l, ' ' || chr(9) || chr(13) || chr(10) || chr(12)) LIKE '•%')) * 1.0 / len(lines) END, 6) AS bullet_line_frac,
    round(CASE WHEN len(lines) = 0 THEN 0.0
          ELSE len(list_filter(lines,
               l -> rtrim(l, ' ' || chr(9) || chr(13) || chr(10) || chr(12)) LIKE '%...'
                 OR rtrim(l, ' ' || chr(9) || chr(13) || chr(10) || chr(12)) LIKE '%…')) * 1.0 / len(lines) END, 6) AS ellipsis_line_frac
  FROM base
)
""".replace("__SRC__", src)


_REPETITION_BASE = "WITH " + _repetition_cte("documents")

# BM25 scored-set CTE chain, shared by bm25_search (direct top-k) and
# hybrid_search (candidate generation for the RRF rerank).  The float64
# expression shape mirrors stages/search.py exactly — factored, not
# rewritten, so the long-green bm25_search oracle text is unchanged.
_BM25_SCORED = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), tf AS (
  SELECT doc_id, len(ws) AS dl,
         len(list_filter(ws, w -> w = 'vector')) AS tf0,
         len(list_filter(ws, w -> w = 'query'))  AS tf1,
         len(list_filter(ws, w -> w = 'hash'))   AS tf2
  FROM toks
), stats AS (
  SELECT count(*)::DOUBLE AS n,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         sum((tf0 > 0)::INT)::DOUBLE AS df0,
         sum((tf1 > 0)::INT)::DOUBLE AS df1,
         sum((tf2 > 0)::INT)::DOUBLE AS df2
  FROM tf
), scored AS (
  SELECT doc_id,
      ln(1.0::DOUBLE + (n - df0 + 0.5::DOUBLE) / (df0 + 0.5::DOUBLE))
        * ((tf0 * 2.2::DOUBLE)
           / (tf0 + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl)))
    + ln(1.0::DOUBLE + (n - df1 + 0.5::DOUBLE) / (df1 + 0.5::DOUBLE))
        * ((tf1 * 2.2::DOUBLE)
           / (tf1 + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl)))
    + ln(1.0::DOUBLE + (n - df2 + 0.5::DOUBLE) / (df2 + 0.5::DOUBLE))
        * ((tf2 * 2.2::DOUBLE)
           / (tf2 + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl)))
    AS score
  FROM tf, stats
)
"""

# Shared CTE chain for the duplicate-window span family (dup_spans /
# dup_span_strip): whitespace tokens (empties filtered == Python
# str.split), 8-word windows, windows with >= 2 total occurrences,
# covered intervals, gaps-and-islands group ids.
_DUPSPAN_TOKS = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
), n_t AS (
  SELECT doc_id, toks, len(toks) AS n FROM t
), wins AS (
  SELECT doc_id, i + 1 AS start_w,
         array_to_string(toks[(i + 1):(i + 8)], ' ') AS win
  FROM n_t, LATERAL (SELECT unnest(generate_series(0, n - 8)) AS i) g
)"""

_DUPSPAN_ISLANDS = """, brk AS (
  SELECT doc_id, start_w, end_w,
         CASE WHEN lag(end_w) OVER w IS NULL
                   OR start_w > lag(end_w) OVER w + 1
              THEN 1 ELSE 0 END AS is_brk
  FROM marked
  WINDOW w AS (PARTITION BY doc_id ORDER BY start_w)
), grp AS (
  SELECT doc_id, start_w, end_w,
         sum(is_brk) OVER (PARTITION BY doc_id ORDER BY start_w
                           ROWS UNBOUNDED PRECEDING) AS g
  FROM brk
)
"""

_DUPSPAN_BASE = _DUPSPAN_TOKS + """, dup AS (
  SELECT win FROM wins GROUP BY win HAVING count(*) >= 2
), marked AS (
  SELECT w.doc_id, w.start_w, w.start_w + 7 AS end_w
  FROM wins w JOIN dup USING (win)
)""" + _DUPSPAN_ISLANDS

_DUPSPAN_AGAINST_BASE = _DUPSPAN_TOKS + """, seen AS (
  SELECT DISTINCT win FROM wins WHERE doc_id % 3 = 0
), marked AS (
  SELECT w.doc_id, w.start_w, w.start_w + 7 AS end_w
  FROM wins w JOIN seen USING (win)
  WHERE w.doc_id % 3 <> 0
)""" + _DUPSPAN_ISLANDS


_JACCARD_PAIRS_SQL = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
), toks_t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM aug
), n_t AS (
  SELECT doc_id, toks, len(toks) AS n FROM toks_t
), grams AS (
  SELECT doc_id, array_to_string(toks[(i + 1):(i + 3)], ' ') AS gram
  FROM n_t, LATERAL (SELECT unnest(generate_series(0, n - 3)) AS i) g
), sh AS (
  SELECT doc_id, list_distinct(list(gram)) AS s FROM grams GROUP BY doc_id
)
SELECT a.doc_id AS a, b.doc_id AS b,
       round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(a.s || b.s)), 4) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / len(list_distinct(a.s || b.s)) >= 0.8
"""

_NEAR_AGAINST_SQL = """
WITH RECURSIVE comb AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 3000000, text || ' archived copy' FROM documents
  WHERE doc_id % 5 = 0
), toks_t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM comb
), n_t AS (
  SELECT doc_id, toks, len(toks) AS n FROM toks_t
), grams AS (
  SELECT doc_id, array_to_string(toks[(i + 1):(i + 3)], ' ') AS gram
  FROM n_t, LATERAL (SELECT unnest(generate_series(0, n - 3)) AS i) g
), sh AS (
  SELECT doc_id, list_distinct(list(gram)) AS s FROM grams GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(a.s || b.s)) >= 0.9
), edges AS (
  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
), reach(src, node) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
), mins AS (
  SELECT src, min(node) AS mn FROM reach GROUP BY src
), lab AS (
  SELECT c.doc_id,
         CAST(COALESCE(LEAST(m.src, m.mn), c.doc_id) AS BIGINT) AS cluster
  FROM comb c LEFT JOIN mins m ON c.doc_id = m.src
), bad AS (
  SELECT DISTINCT cluster FROM lab WHERE doc_id >= 3000000
)
SELECT d.doc_id, d.lang
FROM documents d JOIN lab l ON d.doc_id = l.doc_id
WHERE l.cluster NOT IN (SELECT cluster FROM bad)
"""

_NEAR_DUP_CLUSTERS_SQL = """
WITH RECURSIVE aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
), toks_t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM aug
), n_t AS (
  SELECT doc_id, toks, len(toks) AS n FROM toks_t
), grams AS (
  SELECT doc_id, array_to_string(toks[(i + 1):(i + 3)], ' ') AS gram
  FROM n_t, LATERAL (SELECT unnest(generate_series(0, n - 3)) AS i) g
), sh AS (
  SELECT doc_id, list_distinct(list(gram)) AS s FROM grams GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(a.s || b.s)) >= 0.9
), edges AS (
  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
), reach(src, node) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
), mins AS (
  SELECT src, min(node) AS mn FROM reach GROUP BY src
)
SELECT a.doc_id,
       CAST(COALESCE(LEAST(m.src, m.mn), a.doc_id) AS BIGINT) AS cluster
FROM aug a LEFT JOIN mins m ON a.doc_id = m.src
"""


_NB_LANG_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), t AS (
  SELECT doc_id, unnest(ws) AS w FROM toks
), cnt AS (
  SELECT d.lang, t.w, count(*)::BIGINT AS c
  FROM t JOIN documents d USING (doc_id) GROUP BY d.lang, t.w
), tot AS (
  SELECT lang, sum(c)::BIGINT AS tt FROM cnt GROUP BY lang
), dcs AS (
  SELECT lang, count(*)::BIGINT AS nd FROM documents GROUP BY lang
), nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
vv AS (SELECT count(DISTINCT w)::DOUBLE AS v FROM t),
cls AS (SELECT DISTINCT lang FROM documents),
term AS (
  SELECT t.doc_id, c.lang, ln(COALESCE(cnt.c, 0) + 1.0) AS lt
  FROM t CROSS JOIN cls c
  LEFT JOIN cnt ON c.lang = cnt.lang AND t.w = cnt.w
), persum AS (
  SELECT doc_id, lang, sum(lt) AS s, count(*)::BIGINT AS ntok
  FROM term GROUP BY doc_id, lang
), alldc AS (
  SELECT d.doc_id, c.lang FROM documents d CROSS JOIN cls c
), score AS (
  SELECT a.doc_id, a.lang,
    round(ln(dcs.nd / nn.n) + COALESCE(p.s, 0)
          - COALESCE(p.ntok, 0) * ln(tot.tt + vv.v), 6) AS sc
  FROM alldc a JOIN dcs USING (lang) JOIN tot USING (lang)
  CROSS JOIN nn CROSS JOIN vv
  LEFT JOIN persum p ON a.doc_id = p.doc_id AND a.lang = p.lang
)
SELECT doc_id, lang AS pred, sc AS score FROM score
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, lang ASC) = 1
"""


def oracle_sql() -> dict[str, str]:
    ext_base = f"""
SELECT {_URL} AS url,
       {_DOC_TYPE_SQL} AS doc_type,
       {_STATUS_SQL} AS status,
       CASE WHEN doc_id % 50 = 3
              THEN 'Error processing ' || {_URL} || ': no objects found'
            WHEN doc_id % 50 = 13 THEN 'Unsupported file type'
            ELSE '' END AS error,
       {_MARKDOWN_SQL} AS markdown
FROM documents
"""
    # auto mode: single-page PDF word count = 2 (title) + n body words;
    # structured iff >= 75 words (classifier word_threshold, ratio 1/1)
    auto_md = """
CASE WHEN doc_id % 50 IN (3, 13) THEN ''
     WHEN doc_id % 10 = 7 THEN text
     WHEN doc_id % 5 = 1 THEN
       CASE WHEN len(string_split_regex(text, '\\s+')) + 2 >= 75
            THEN '# Document ' || doc_id || chr(10) || chr(10) || text
            ELSE 'Document ' || doc_id || chr(10) ||
                 (SELECT string_agg(
                          array_to_string(t.toks[(i * 10 + 1):LEAST(i * 10 + 10, t.n)], ' '),
                          chr(10) ORDER BY i)
                  FROM (SELECT string_split_regex(d2.text, '\\s+') AS toks,
                               len(string_split_regex(d2.text, '\\s+')) AS n) t,
                       LATERAL (SELECT unnest(generate_series(0,
                                 CAST(ceil(t.n / 10.0) AS INT) - 1)) AS i) g)
       END
     ELSE '# Document ' || doc_id || chr(10) || chr(10) || text END
"""
    quality = f"""
WITH f AS (
  SELECT doc_id,
         string_split_regex(text, '\\s+') AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[a-zA-Z0-9_\\s]', '', 'g')) AS n_punct
  FROM documents
), g AS (
  SELECT doc_id, toks, n_chars, n_punct,
         len(toks) AS n_words,
         CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE)
           AS sum_len,
         len(list_filter(toks, x -> lower(x) IN ({_STOPLIST}))) AS stop_hits
  FROM f
)
SELECT doc_id,
       n_words,
       round(sum_len / n_words, 6) AS mean_word_len,
       round(CAST(stop_hits AS DOUBLE) / n_words, 6) AS stopword_ratio,
       round(0.4 * LEAST(1.0, n_words / 100.0)
           + 0.3 * LEAST(1.0, (CAST(stop_hits AS DOUBLE) / n_words) / 0.3)
           + 0.2 * GREATEST(0.0, 1.0 - 4.0 * (CAST(n_punct AS DOUBLE) / n_chars))
           + 0.1 * (CASE WHEN sum_len / n_words BETWEEN 3.0 AND 10.0 THEN 1.0
                         WHEN sum_len / n_words > 0 THEN 0.5 ELSE 0.0 END), 6)
         AS quality
FROM g
"""
    # shared integer feature projection for the classifier family
    # (mirrors _logreg_feats bit-for-bit: exact int64 features)
    logreg_feats = """
  SELECT source,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END::BIGINT AS y,
         LEAST(n_chars // 40, 100)::BIGINT AS x1,
         ((1000 * (length(text)
                   - length(regexp_replace(text, '[0-9]', '', 'g'))))
            // GREATEST(n_chars, 1))::BIGINT AS x2,
         ((1000 * (length(text) - length(replace(text, ' ', ''))))
            // GREATEST(n_chars, 1))::BIGINT AS x3
  FROM documents
"""
    # unrolled 6-epoch fixed-point gradient descent: the rational
    # sigmoid (add/abs/divide only) and the 1e-6 residual grid make
    # every epoch's int64 weights bit-identical to the Ray optimizer
    logreg_parts = [f"WITH f AS MATERIALIZED ({logreg_feats}),\n"
                    "w0 AS (SELECT DISTINCT source, 0::BIGINT AS b0,"
                    " 0::BIGINT AS b1, 0::BIGINT AS b2, 0::BIGINT AS b3"
                    " FROM f)"]
    for it in range(1, 7):
        logreg_parts.append(f""",
g{it} AS (
  SELECT source, count(*)::BIGINT AS n,
         sum(r)::BIGINT AS d0, sum(r * x1)::BIGINT AS d1,
         sum(r * x2)::BIGINT AS d2, sum(r * x3)::BIGINT AS d3
  FROM (SELECT source, x1, x2, x3,
               CAST(floor(((0.5 + 0.5 * z / (1 + abs(z))) - y) * 1e6
                          + 0.5) AS BIGINT) AS r
        FROM (SELECT f.*,
                     (w.b0 + w.b1 * f.x1 + w.b2 * f.x2
                      + w.b3 * f.x3) * 1e-6 AS z
              FROM f JOIN w{it - 1} w USING (source)))
  GROUP BY source
),
w{it} AS (
  SELECT w.source,
         w.b0 - CAST(floor(0.5 * g.d0 / g.n + 0.5) AS BIGINT) AS b0,
         w.b1 - CAST(floor(0.5 * g.d1 / g.n + 0.5) AS BIGINT) AS b1,
         w.b2 - CAST(floor(0.5 * g.d2 / g.n + 0.5) AS BIGINT) AS b2,
         w.b3 - CAST(floor(0.5 * g.d3 / g.n + 0.5) AS BIGINT) AS b3
  FROM w{it - 1} w JOIN g{it} g USING (source)
)""")
    logreg_parts.append("""
SELECT f.source, count(*)::BIGINT AS n,
       sum(CASE WHEN ((w.b0 + w.b1 * f.x1 + w.b2 * f.x2
                       + w.b3 * f.x3) >= 0) = (f.y = 1)
                THEN 1 ELSE 0 END)::BIGINT AS correct,
       w.b0 AS w0_micro, w.b1 AS w1_micro,
       w.b2 AS w2_micro, w.b3 AS w3_micro
FROM f JOIN w6 w USING (source)
GROUP BY f.source, w.b0, w.b1, w.b2, w.b3
""")
    logreg_sql = "".join(logreg_parts)
    # pair-free per-source AUC of the x3 score vs the y label —
    # rank_test's windowed-cumsum U, normalized by n_pos * n_neg
    feature_auc_sql = f"""
WITH f AS MATERIALIZED ({logreg_feats}),
c AS MATERIALIZED (
  SELECT source, x3 AS score,
         sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM f GROUP BY source, x3
), w AS (
  SELECT source, ca, cb,
         (sum(cb) OVER (PARTITION BY source ORDER BY score)
          - cb)::BIGINT AS below
  FROM c
), agg AS (
  SELECT source, sum(ca)::BIGINT AS n_pos, sum(cb)::BIGINT AS n_neg,
         sum(ca * 2 * below + ca * cb)::BIGINT AS u2
  FROM w GROUP BY source
)
SELECT source, n_pos, n_neg,
       CASE WHEN n_pos * n_neg > 0
            THEN (u2 / 2.0) / (n_pos * n_neg) ELSE NULL END AS auc
FROM agg
"""
    # threshold sweep: suffix sums via DESC windows over the distinct
    # (source, score) histogram — tp+fp ≥ 1 at a realized threshold
    pr_curve_sql = f"""
WITH f AS MATERIALIZED ({logreg_feats}),
c AS (
  SELECT source, x3 AS threshold,
         sum(y)::BIGINT AS ca, sum(1 - y)::BIGINT AS cb
  FROM f GROUP BY source, x3
), w AS (
  SELECT source, threshold, ca, cb,
         sum(ca) OVER (PARTITION BY source
                       ORDER BY threshold DESC)::BIGINT AS tp,
         sum(cb) OVER (PARTITION BY source
                       ORDER BY threshold DESC)::BIGINT AS fp,
         sum(ca) OVER (PARTITION BY source)::BIGINT AS npos
  FROM c
)
SELECT source, threshold, tp, fp, (npos - tp)::BIGINT AS fn,
       tp::DOUBLE / (tp + fp) AS "precision",
       CASE WHEN npos > 0 THEN tp::DOUBLE / npos END AS recall,
       CASE WHEN npos > 0
            THEN (2 * tp)::DOUBLE / (tp + fp + npos) END AS f1
FROM w
"""
    # per-(source, decile) calibration decomposition: exact int
    # moments, two single divisions (frac_pos, mean predicted rate)
    calibration_sql = f"""
WITH f AS MATERIALIZED ({logreg_feats})
SELECT source, LEAST(x3 * 10 // 1000, 9)::BIGINT AS bin,
       count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
       sum(x3)::BIGINT AS sum_score,
       sum(y)::DOUBLE / count(*) AS frac_pos,
       sum(x3)::DOUBLE / (count(*) * 1000) AS mean_score
FROM f GROUP BY source, bin
"""
    # Cohen's kappa between the two binarized signals: diagonal mass,
    # margin cross products, one division — all from the confusion
    # histogram
    label_agreement_sql = f"""
WITH f AS MATERIALIZED ({logreg_feats}),
l AS (
  SELECT source,
         CASE WHEN x3 >= 160 THEN 'hi' ELSE 'lo' END AS a,
         CASE WHEN x1 >= 25 THEN 'hi' ELSE 'lo' END AS b
  FROM f
), conf AS (
  SELECT source, a, b, count(*)::BIGINT AS c FROM l GROUP BY source, a, b
), ra AS (
  SELECT source, a AS k, sum(c)::BIGINT AS row_c FROM conf
  GROUP BY source, a
), cm AS (
  SELECT source, b AS k, sum(c)::BIGINT AS col_c FROM conf
  GROUP BY source, b
), pe AS (
  SELECT ra.source, sum(row_c * col_c)::BIGINT AS pe_num
  FROM ra JOIN cm ON ra.source = cm.source AND ra.k = cm.k
  GROUP BY ra.source
), agg AS (
  SELECT source, sum(c)::BIGINT AS n,
         sum(CASE WHEN a = b THEN c ELSE 0 END)::BIGINT AS agree
  FROM conf GROUP BY source
)
SELECT agg.source, n, agree,
       COALESCE(pe.pe_num, 0)::BIGINT AS pe_num,
       CASE WHEN n * n - COALESCE(pe.pe_num, 0) <> 0
            THEN (n * agree - COALESCE(pe.pe_num, 0))::DOUBLE
                 / (n * n - COALESCE(pe.pe_num, 0))
       END AS kappa
FROM agg LEFT JOIN pe ON agg.source = pe.source
"""
    # seeded harmonic centrality: the _bfs_sql state extended with a
    # seed column; integer 360360//d contributions
    harmonic_parts = ["""WITH e0 AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey::BIGINT AS u, (-l.l_suppkey)::BIGINT AS v
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_quantity >= 40
), e AS MATERIALIZED (
  SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0
), d0 AS MATERIALIZED (
  SELECT c_custkey::BIGINT AS node, c_custkey::BIGINT AS seed,
         0::BIGINT AS depth
  FROM customer WHERE c_custkey % 100 = 1
)"""]
    for r in range(3):
        harmonic_parts.append(f""", d{r + 1} AS MATERIALIZED (
  SELECT node, seed, min(depth)::BIGINT AS depth FROM (
    SELECT node, seed, depth FROM d{r}
    UNION ALL
    SELECT e.v AS node, d.seed, d.depth + 1 AS depth
    FROM d{r} d JOIN e ON e.u = d.node
  ) GROUP BY node, seed
)""")
    harmonic_parts.append("""
SELECT node, count(*)::BIGINT AS n_reached,
       sum(360360 // depth)::BIGINT AS h_num,
       sum(360360 // depth)::DOUBLE / 360360 AS harmonic
FROM d3 WHERE depth >= 1 GROUP BY node""")
    harmonic_sql = "".join(harmonic_parts)
    # per-cluster silhouette: own vs runner-up round-9 distance from
    # the final kmeans round, snapped to the 1e-6 grid before summing
    _sil_km = _kmeans_sql(iters=2, k=8, modulus=61)
    _sil_head, _ = _sil_km.rsplit("\nSELECT", 1)
    silhouette_sql = _sil_head + """,
sil AS (
  SELECT a.vec_id, a.cid AS cluster,
         max(CASE WHEN d.cid = a.cid THEN d.d END) AS a2,
         min(CASE WHEN d.cid <> a.cid THEN d.d END) AS b2
  FROM a3 a JOIN d3 d ON d.vec_id = a.vec_id
  GROUP BY a.vec_id, a.cid
), sm AS (
  SELECT cluster,
         CAST(floor((CASE WHEN greatest(a2, b2) > 0
                          THEN (b2 - a2) / greatest(a2, b2)
                          ELSE 0 END) * 1000000 + 0.5) AS BIGINT)
           AS s_micro
  FROM sil
)
SELECT cluster, count(*)::BIGINT AS n, sum(s_micro)::BIGINT AS s_sum,
       sum(s_micro)::DOUBLE / (count(*) * 1000000) AS mean_sil
FROM sm GROUP BY cluster"""
    return {
        "quality_logreg": logreg_sql,
        "feature_auc": feature_auc_sql,
        "pr_curve": pr_curve_sql,
        "calibration": calibration_sql,
        "label_agreement": label_agreement_sql,
        "harmonic": harmonic_sql,
        "silhouette": silhouette_sql,
        # Spearman via doubled midranks from the marginal histograms:
        # 2·cum − cnt + 1, exact int64 moments, sqrt/division at the end
        "spearman": r"""
WITH t AS MATERIALIZED (
  SELECT n_chars::BIGINT AS x,
         len(list_filter(string_split_regex(text, '\s+'),
                         w -> w <> ''))::BIGINT AS y
  FROM documents
), mx AS (
  SELECT x, count(*)::BIGINT AS cnt FROM t GROUP BY x
), rxm AS (
  SELECT x, (2 * sum(cnt) OVER (ORDER BY x) - cnt + 1)::BIGINT AS rx2,
         cnt
  FROM mx
), my AS (
  SELECT y, count(*)::BIGINT AS cnt FROM t GROUP BY y
), rym AS (
  SELECT y, (2 * sum(cnt) OVER (ORDER BY y) - cnt + 1)::BIGINT AS ry2,
         cnt
  FROM my
), agg AS (
  SELECT count(*)::BIGINT AS n, sum(rx2 * ry2)::BIGINT AS sxy4
  FROM t JOIN rxm USING (x) JOIN rym USING (y)
), vx AS (SELECT sum(cnt * rx2 * rx2)::BIGINT AS sxx4 FROM rxm),
vy AS (SELECT sum(cnt * ry2 * ry2)::BIGINT AS syy4 FROM rym)
SELECT n,
       CASE WHEN sxx4 - n * (n + 1) * (n + 1) > 0
             AND syy4 - n * (n + 1) * (n + 1) > 0
            THEN round((sxy4 - n * (n + 1) * (n + 1))::DOUBLE
                       / (sqrt((sxx4 - n * (n + 1) * (n + 1))::DOUBLE)
                          * sqrt((syy4 - n * (n + 1) * (n + 1))::DOUBLE)),
                       6)
       END AS rho
FROM agg CROSS JOIN vx CROSS JOIN vy
""",
        # fertility: same RE2 counts, exact int sums, one division
        "fertility": r"""
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(len(regexp_extract_all(text, '[^\s]+')))::BIGINT AS n_words,
       sum(len(regexp_extract_all(text, '\w+|[^\w\s]')))::BIGINT
         AS n_tokens,
       CASE WHEN sum(len(regexp_extract_all(text, '[^\s]+'))) > 0
            THEN sum(len(regexp_extract_all(text, '\w+|[^\w\s]')))::DOUBLE
                 / sum(len(regexp_extract_all(text, '[^\s]+')))
       END AS fertility
FROM documents GROUP BY lang
""",
        # KS D from windowed CDFs over the shared value histogram
        "ks_test": """
WITH s AS MATERIALIZED (
  SELECT lang, CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END
           AS side, n_chars
  FROM documents
), c AS MATERIALIZED (
  SELECT lang, n_chars,
         sum(CASE WHEN side = 'even' THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN side = 'odd' THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM s GROUP BY lang, n_chars
), w AS (
  SELECT lang,
         sum(ca) OVER (PARTITION BY lang ORDER BY n_chars)::BIGINT
           AS cuma,
         sum(cb) OVER (PARTITION BY lang ORDER BY n_chars)::BIGINT
           AS cumb,
         sum(ca) OVER (PARTITION BY lang)::BIGINT AS na,
         sum(cb) OVER (PARTITION BY lang)::BIGINT AS nb
  FROM c
)
SELECT lang, max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
       CASE WHEN max(na) > 0 AND max(nb) > 0
            THEN floor(max(abs(cuma::DOUBLE / na - cumb::DOUBLE / nb))
                       * 1000000 + 0.5) / 1000000.0
       END AS d_stat
FROM w GROUP BY lang
""",
        # robust outliers: exact quantile_disc median/MAD, integer rule
        "length_outliers": """
WITH med AS MATERIALIZED (
  SELECT lang, quantile_disc(n_chars, 0.5)::BIGINT AS median
  FROM documents GROUP BY lang
), dev AS MATERIALIZED (
  SELECT d.lang, abs(d.n_chars - m.median)::BIGINT AS dv
  FROM documents d JOIN med m USING (lang)
), madt AS (
  SELECT lang, quantile_disc(dv, 0.5)::BIGINT AS mad
  FROM dev GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars, m.median, t.mad
FROM documents d JOIN med m USING (lang) JOIN madt t USING (lang)
WHERE abs(d.n_chars - m.median) > 2 * t.mad
""",
        # C4 line rules over the shared deterministic line view
        "c4_lines": r"""
WITH lv AS MATERIALIZED (
  SELECT doc_id, replace(text, ' the ', '.' || chr(10)) AS t
  FROM documents
), ls AS MATERIALIZED (
  SELECT doc_id, string_split(t, chr(10)) AS lines FROM lv
), k AS (
  SELECT doc_id, lines,
         list_filter(lines, l ->
           regexp_matches(l, '[.!?"]$')
           AND len(regexp_extract_all(l, '[^\s]+')) >= 4
           AND NOT contains(lower(l), 'javascript')
           AND NOT contains(l, '{')) AS kept
  FROM ls
)
SELECT doc_id, len(lines)::BIGINT AS n_lines, len(kept)::BIGINT AS n_kept,
       COALESCE(array_to_string(kept, chr(10)), '') AS clean
FROM k
""",
        # Gopher rules, cross-multiplied to pure integer comparisons;
        # counts via the same RE2 semantics (non-overlapping matches)
        "gopher_flags": r"""
WITH m AS MATERIALIZED (
  SELECT doc_id,
    len(regexp_extract_all(text, '[^\s]+'))::BIGINT AS n_words,
    length(regexp_replace(text, '\s+', '', 'g'))::BIGINT AS sum_chars,
    (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
    ((length(text) - length(replace(text, '...', ''))) // 3)::BIGINT
      AS n_ell,
    (length(text) - length(replace(text, chr(10), '')) + 1)::BIGINT
      AS n_lines,
    (len(regexp_extract_all(text, chr(10) || '[-*•]'))
     + CASE WHEN regexp_matches(text, '^[-*•]') THEN 1 ELSE 0
       END)::BIGINT AS bullets,
    ((length(text) - length(replace(text, '...' || chr(10), ''))) // 4
     + CASE WHEN ends_with(text, '...') THEN 1 ELSE 0 END)::BIGINT
      AS ell_end,
    len(regexp_extract_all(text,
        '(?:^|[\s])[^\s]*[A-Za-z]'))::BIGINT AS alpha_w
  FROM documents
)
SELECT doc_id, n_words, n_lines,
  (n_words >= 30 AND n_words <= 100000) AS f_wordcount,
  (3 * n_words <= sum_chars AND sum_chars <= 10 * n_words) AS f_meanlen,
  (10 * (n_hash + n_ell) <= n_words) AS f_symbol,
  (2 * bullets <= n_lines) AS f_bullet,
  (10 * ell_end <= 3 * n_lines) AS f_ellipsis,
  (10 * alpha_w >= 8 * n_words) AS f_alpha,
  ((n_words >= 30 AND n_words <= 100000)
   AND (3 * n_words <= sum_chars AND sum_chars <= 10 * n_words)
   AND (10 * (n_hash + n_ell) <= n_words)
   AND (2 * bullets <= n_lines)
   AND (10 * ell_end <= 3 * n_lines)
   AND (10 * alpha_w >= 8 * n_words)) AS "pass"
FROM m
""",
        # two-proportion z from four exact int sums; the variance
        # expression mirrors textstats.two_prop_test term for term
        "prop_test": """
WITH l AS MATERIALIZED (
  SELECT lang,
         CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS side,
         CASE WHEN ((1000 * (length(text)
                             - length(replace(text, ' ', ''))))
                    // GREATEST(n_chars, 1)) >= 160
              THEN 1 ELSE 0 END AS y
  FROM documents
), agg AS (
  SELECT lang,
         sum(CASE WHEN side = 'even' THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN side = 'even' THEN y ELSE 0 END)::BIGINT AS k_a,
         sum(CASE WHEN side = 'odd' THEN 1 ELSE 0 END)::BIGINT AS n_b,
         sum(CASE WHEN side = 'odd' THEN y ELSE 0 END)::BIGINT AS k_b
  FROM l GROUP BY lang
)
SELECT lang, n_a, k_a, n_b, k_b,
       CASE WHEN n_a > 0 AND n_b > 0
             AND ((k_a + k_b)::DOUBLE / (n_a + n_b))
                 * (1 - (k_a + k_b)::DOUBLE / (n_a + n_b))
                 * (1.0 / n_a + 1.0 / n_b) > 0
            THEN floor((k_a::DOUBLE / n_a - k_b::DOUBLE / n_b)
                       / sqrt(((k_a + k_b)::DOUBLE / (n_a + n_b))
                              * (1 - (k_a + k_b)::DOUBLE / (n_a + n_b))
                              * (1.0 / n_a + 1.0 / n_b))
                       * 1000000 + 0.5) / 1000000.0
       END AS z
FROM agg
""",
        # typed entity explode over the same progressively-redacted
        # footer text; unnest of equal-length lists zips in DuckDB
        "entity_spans": r"""
WITH aug AS MATERIALIZED (
  SELECT doc_id,
    text || chr(10) || 'Contact: user' || doc_id
    || '@mail.example.com, call +1-555-'
    || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'
    || lpad((doc_id % 10000)::VARCHAR, 4, '0')
    || ' or visit 10.' || (doc_id % 256) || '.0.' || (doc_id % 250)
    || ' now' AS fulltxt
  FROM documents
), s1 AS MATERIALIZED (
  SELECT doc_id, fulltxt,
    regexp_replace(fulltxt,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
      'g') AS t1
  FROM aug
), s2 AS MATERIALIZED (
  SELECT doc_id, fulltxt, t1,
    regexp_replace(t1,
      '\b(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b',
      '<IP>', 'g') AS t2
  FROM s1
)
SELECT doc_id, 'email' AS entity_type,
       unnest(regexp_extract_all(fulltxt,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS entity,
       unnest(generate_series(1, len(regexp_extract_all(fulltxt,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))))::BIGINT
         AS ord
FROM s1
UNION ALL
SELECT doc_id, 'ip',
       unnest(regexp_extract_all(t1,
         '\b(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b')),
       unnest(generate_series(1, len(regexp_extract_all(t1,
         '\b(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b'))))::BIGINT
FROM s2
UNION ALL
SELECT doc_id, 'phone',
       unnest(regexp_extract_all(t2,
         '(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b')),
       unnest(generate_series(1, len(regexp_extract_all(t2,
         '(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b'))))::BIGINT
FROM s2
""",
        # pairwise vocabulary Jaccard: the same 57-bit md5-prefix fps,
        # distinct (source, fp) self-join — pair counts are exact and
        # any fp collision is shared with the Ray side by construction
        "vocab_overlap": r"""
WITH toks AS MATERIALIZED (
  SELECT source,
         unnest(list_filter(string_split_regex(text, '\s+'),
                            w -> w <> '')) AS w
  FROM documents
), d AS MATERIALIZED (
  SELECT DISTINCT source,
         (('0x' || substr(md5(w), 1, 16))::UBIGINT >> 7)::BIGINT AS fp
  FROM toks
), sz AS (
  SELECT source, count(*)::BIGINT AS n FROM d GROUP BY source
), inter AS (
  SELECT a.source AS ga, b.source AS gb, count(*)::BIGINT AS n_common
  FROM d a JOIN d b ON a.fp = b.fp AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT sa.source AS group_a, sb.source AS group_b,
       sa.n AS n_a, sb.n AS n_b,
       COALESCE(i.n_common, 0)::BIGINT AS n_common,
       CASE WHEN sa.n + sb.n - COALESCE(i.n_common, 0) > 0
            THEN COALESCE(i.n_common, 0)::DOUBLE
                 / (sa.n + sb.n - COALESCE(i.n_common, 0))
       END AS jaccard
FROM sz sa JOIN sz sb ON sa.source < sb.source
LEFT JOIN inter i ON i.ga = sa.source AND i.gb = sb.source
""",
        # per-cell MI terms: margins via windows over the confusion
        # histogram, one identical float expression, 1e-6 snap
        "signal_mi": """
WITH l AS MATERIALIZED (
  SELECT source, lang AS a,
         CASE WHEN ((1000 * (length(text) - length(replace(text, ' ', ''))))
                    // GREATEST(n_chars, 1)) >= 160
              THEN 'hi' ELSE 'lo' END AS b
  FROM documents
), conf AS (
  SELECT source, a, b, count(*)::BIGINT AS c FROM l GROUP BY source, a, b
), w AS (
  SELECT source, a, b, c,
         sum(c) OVER (PARTITION BY source, a)::BIGINT AS ca,
         sum(c) OVER (PARTITION BY source, b)::BIGINT AS cb,
         sum(c) OVER (PARTITION BY source)::BIGINT AS n
  FROM conf
)
SELECT source, a AS lang, b AS signal, c AS n_ab,
       floor((c::DOUBLE / n)
             * ln((c::DOUBLE * n) / (ca::DOUBLE * cb))
             * 1000000 + 0.5) / 1000000.0 AS mi_term
FROM w
""",
        # categorical PSI over md5 term buckets: first 16 md5 hex chars
        # as UBIGINT == stable_hash64; same float expression per bucket
        "term_drift": r"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\s+'),
                            w -> w <> '')) AS w
  FROM documents
), bk AS MATERIALIZED (
  SELECT doc_id,
         (('0x' || substr(md5(w), 1, 16))::UBIGINT % 64)::BIGINT
           AS bucket
  FROM toks
), cr AS MATERIALIZED (
  SELECT bucket, count(*)::BIGINT AS nr FROM bk
  WHERE doc_id % 2 = 0 GROUP BY bucket
), cn AS MATERIALIZED (
  SELECT bucket, count(*)::BIGINT AS nn FROM bk
  WHERE doc_id % 2 = 1 GROUP BY bucket
), tot AS (
  SELECT (SELECT sum(nr) FROM cr)::BIGINT AS tr,
         (SELECT sum(nn) FROM cn)::BIGINT AS tn
)
SELECT COALESCE(cr.bucket, cn.bucket) AS bucket,
       COALESCE(cr.nr, 0)::BIGINT AS n_ref,
       COALESCE(cn.nn, 0)::BIGINT AS n_new,
       CASE WHEN COALESCE(cr.nr, 0) > 0 AND COALESCE(cn.nn, 0) > 0
            THEN floor((cn.nn::DOUBLE / tot.tn - cr.nr::DOUBLE / tot.tr)
                       * ln((cn.nn::DOUBLE / tot.tn)
                            / (cr.nr::DOUBLE / tot.tr))
                       * 1000000 + 0.5) / 1000000.0
            ELSE NULL END AS psi_term
FROM cr FULL OUTER JOIN cn ON cn.bucket = cr.bucket
CROSS JOIN tot
""",
        # tie-correct Gini closed form over the (lang, n_chars)
        # histogram: x·c·(2·below + c − n), one division of exact ints
        "gini_lang": """
WITH c AS MATERIALIZED (
  SELECT lang, n_chars::BIGINT AS v, count(*)::BIGINT AS c
  FROM documents GROUP BY lang, n_chars
), w AS (
  SELECT lang, v, c,
         (sum(c) OVER (PARTITION BY lang ORDER BY v) - c)::BIGINT
           AS below,
         sum(c) OVER (PARTITION BY lang)::BIGINT AS n,
         sum(v * c) OVER (PARTITION BY lang)::BIGINT AS wt
  FROM c
)
SELECT lang, max(n)::BIGINT AS n,
       CASE WHEN max(wt) > 0
            THEN sum(v * c * (2 * below + c - n))::DOUBLE
                 / (max(n)::DOUBLE * max(wt)::DOUBLE)
       END AS gini
FROM w GROUP BY lang
""",
        "extract_pages": ext_base,
        "extract_auto": (
            f"SELECT {_URL} AS url, {_DOC_TYPE_SQL} AS doc_type, "
            f"{_STATUS_SQL} AS status, ({auto_md}) AS markdown FROM documents AS d2"
        ),
        # format round-trip twins: the rollup over the parquet truth
        "jsonl_ingest": """
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars,
       sum(doc_id)::BIGINT AS id_sum
FROM documents GROUP BY lang
""",
        "csv_ingest": """
SELECT source, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars,
       sum(doc_id)::BIGINT AS id_sum
FROM documents GROUP BY source
""",
        # sitemap twin: every field re-derived from documents
        "sitemap_parse": f"""
SELECT 'site' || (doc_id % 100) || '.example.com' AS host,
       'url' AS kind,
       {_URL} AS loc,
       strftime(TIMESTAMP '2024-01-01' + to_seconds(doc_id),
                '%Y-%m-%dT%H:%M:%SZ') AS lastmod,
       (0.1 * ((doc_id % 9) + 1))::DOUBLE AS priority
FROM documents
""",
        # density twin: the template article wins; its text mass is
        # len('Document '||id) + the whitespace-normalized body text
        "content_density": f"""
SELECT {_URL} AS url,
       'article' AS main_tag,
       (length('Document ' || doc_id)
        + length(trim(regexp_replace(text, '\\s+', ' ', 'g'))))::BIGINT
           AS text_len,
       0::BIGINT AS link_len,
       0.0::DOUBLE AS link_density
FROM documents
WHERE doc_id % 50 NOT IN (3, 13)
  AND doc_id % 10 != 7 AND doc_id % 5 != 1
""",
        # page-meta twin: template strings + the template's 6 anchors
        "page_meta": f"""
SELECT {_URL} AS url,
       'Doc ' || doc_id AS title,
       'Document ' || doc_id AS h1,
       6::BIGINT AS n_links
FROM documents
WHERE doc_id % 50 NOT IN (3, 13)
  AND doc_id % 10 != 7 AND doc_id % 5 != 1
""",
        # robots-parse twin: the same rule union robots_policy derives
        "robots_parse": """
SELECT 'site' || k || '.example.com' AS host,
       '/static/' AS prefix, FALSE AS allow
FROM range(0, 10) t(k)
UNION ALL
SELECT 'site' || k || '.example.com', '/p/', FALSE
FROM range(0, 10) t(k) WHERE k % 3 = 0
UNION ALL
SELECT 'site' || k || '.example.com', '/p/1', TRUE
FROM range(0, 10) t(k) WHERE k % 2 = 0
""",
        # charset-sniff twin: label from the doc_id rule, markup
        # rebuilt with the same string concat
        # structural md5 collapses each %3 template class to one
        # fingerprint regardless of the article text it carries
        "template_clusters": """
SELECT doc_id,
       md5(CASE doc_id % 3
           WHEN 0 THEN 'html,body,div,h1,p,p'
           WHEN 1 THEN 'html,body,article,h2,ul,li,li'
           ELSE 'html,body,table,tr,td,p' END) AS template
FROM documents
""",
        # keep rule replay: self-canonical rows pass; dangling groups
        # (declared canonical absent from the corpus) keep min(url)
        "canonical_dedup": """
WITH pages AS (
  SELECT doc_id, 'https://ex.com/d' || doc_id AS url,
         CASE doc_id % 4
           WHEN 1 THEN 'https://ex.com/d' || (doc_id - 1)
           WHEN 2 THEN 'https://ex.com/d' || doc_id
           WHEN 3 THEN 'https://ex.com/missing' || (doc_id % 10)
         END AS canonical
  FROM documents
), keyed AS (
  SELECT doc_id, url, COALESCE(canonical, url) AS k FROM pages
), selfs AS (
  SELECT doc_id, url, k FROM keyed WHERE url = k
), dang AS (
  SELECT min(url) AS url FROM keyed
  WHERE url <> k AND k NOT IN (SELECT k FROM selfs)
  GROUP BY k
)
SELECT doc_id, url FROM selfs
UNION ALL
SELECT p.doc_id, p.url FROM pages p JOIN dang d ON p.url = d.url
""",
        "link_rels": """
SELECT doc_id,
       CASE doc_id % 4 WHEN 1 THEN 'https://ex.com/d' || (doc_id - 1)
            WHEN 2 THEN 'https://ex.com/d' || doc_id END AS canonical,
       doc_id % 4 IN (2, 3) AS noindex,
       doc_id % 4 IN (2, 3) AS nofollow
FROM documents
""",
        # one row per top-level JSON-LD object under the %3 synthesis
        # rule; the malformed subset (%9==5) contributes nothing
        "jsonld_extract": """
SELECT doc_id, 'Article' AS ld_type, 'Doc ' || doc_id AS name
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id, 'NewsArticle' AS ld_type, 'News ' || doc_id AS name
FROM documents WHERE doc_id % 3 = 1
UNION ALL
SELECT doc_id, 'Person' AS ld_type, 'P' || (doc_id % 5) AS name
FROM documents WHERE doc_id % 3 = 1
""",
        # repair restores the suffixed original exactly; rounds = the
        # %3 damage-nesting rule the Ray side applied
        "fix_mojibake": """
SELECT doc_id,
       text || ' café – №42 🙂' AS text,
       CAST(doc_id % 3 AS BIGINT) AS mojibake_rounds
FROM documents
""",
        "charset_normalize": """
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16'
            WHEN 2 THEN 'windows-1252' ELSE 'utf-8-sig' END AS charset,
       '<html><head>'
       || CASE WHEN doc_id % 4 = 2
               THEN '<meta charset="iso-8859-1">' ELSE '' END
       || '</head><body>caf\u00e9 m\u00fcn\u00fc ' || text
       || '</body></html>' AS markup
FROM documents
""",
        # the WARC-ingestion twin: identical payload rules, crawl urls
        "warc_ingest": (
            f"SELECT {_URL} AS url, {_DOC_TYPE_SQL} AS doc_type, "
            f"{_STATUS_SQL} AS status, ({auto_md}) AS markdown "
            f"FROM documents AS d2"
        ),
        # the file-ingestion twin: identical payload rules, file:// keys
        "extract_files": (
            f"SELECT 'file://doc' || doc_id AS url, "
            f"{_DOC_TYPE_SQL} AS doc_type, "
            f"{_STATUS_SQL} AS status, ({auto_md}) AS markdown "
            f"FROM documents AS d2"
        ),
        "extract_hash": f"""
SELECT {_URL} AS url,
       CASE WHEN doc_id % 10 = 7 THEN sha256(text)
            ELSE sha256({_HTML_SQL}) END AS content_hash
FROM documents
WHERE doc_id % 50 NOT IN (3, 13) AND doc_id % 5 != 1
""",
        "extract_status_counts": f"""
SELECT {_STATUS_SQL} AS status, {_DOC_TYPE_SQL} AS doc_type,
       count(*) AS n
FROM documents GROUP BY 1, 2
""",
        # outlink twin: the synthesized HTML template carries exactly
        # these six anchors per html-typed page (nav + sidebar; the
        # footer has none) — same synthesis-parity pattern as the
        # extract oracles; resolution joins the page origin
        "outlinks": f"""
WITH links(link_no, href, anchor) AS (VALUES
  (1, '/home', 'home'), (2, '/about', 'about'), (3, '/contact', 'contact'),
  (4, '/l1', 'promo one'), (5, '/l2', 'promo two'),
  (6, '/l3', 'promo three'))
SELECT {_URL} AS url,
       CAST(l.link_no AS INTEGER) AS link_no,
       l.href, l.anchor,
       'https://site' || (doc_id % 100) || '.example.com' || l.href
         AS resolved
FROM documents, links l
WHERE {_DOC_TYPE_SQL} = 'html'
""",
        # anchor-text twin: each of the six template targets receives
        # one distinct anchor from every html page of its host class
        "anchor_texts": f"""
WITH h AS (
  SELECT 'https://site' || (doc_id % 100) || '.example.com' AS origin,
         count(*) AS n
  FROM documents WHERE {_DOC_TYPE_SQL} = 'html' GROUP BY 1
), links(href, anchor) AS (VALUES
  ('/home', 'home'), ('/about', 'about'), ('/contact', 'contact'),
  ('/l1', 'promo one'), ('/l2', 'promo two'), ('/l3', 'promo three'))
SELECT h.origin || l.href AS target,
       CAST(h.n AS BIGINT) AS n_links,
       l.anchor AS anchors
FROM h, links l
""",
        # host-graph twin: all six template links are site-internal, so
        # each html page contributes 6 self-edges to its own host
        "host_graph": f"""
WITH h AS (
  SELECT 'site' || (doc_id % 100) || '.example.com' AS host
  FROM documents WHERE {_DOC_TYPE_SQL} = 'html'
)
SELECT host AS src_host, host AS dst_host,
       (count(*) * 6)::BIGINT AS n_links
FROM h GROUP BY host
""",
        # char-span provenance twin: token offsets reconstructed via
        # window sums over (token, preceding-gap) lengths; ' '||text
        # guarantees gap i sits BEFORE token i (the -1 removes it), and
        # substring equality " ".join(text[s:e].split()) == chunk_text
        # holds by construction (pytest-pinned)
        "chunk_spans": r"""
WITH base AS (
  SELECT doc_id, text,
         regexp_extract_all(text, '\S+') AS toks,
         regexp_extract_all(' ' || text, '\s+') AS gaps
  FROM documents
  WHERE len(regexp_extract_all(text, '\S+')) > 0
), tok AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS ti
  FROM base
), gap AS (
  SELECT doc_id, unnest(gaps) AS gap, generate_subscripts(gaps, 1) AS gi
  FROM base
), pos AS (
  SELECT t.doc_id, t.ti,
         CAST(sum(len(t.tok)) OVER w - len(t.tok)
              + sum(len(g.gap)) OVER w - 1 AS BIGINT) AS s,
         CAST(sum(len(t.tok)) OVER w
              + sum(len(g.gap)) OVER w - 1 AS BIGINT) AS e
  FROM tok t JOIN gap g ON g.doc_id = t.doc_id AND g.gi = t.ti
  WINDOW w AS (PARTITION BY t.doc_id ORDER BY t.ti)
), c_t AS (
  SELECT doc_id, toks, len(toks) AS n,
         CASE WHEN len(toks) <= 32 THEN 1
              ELSE 1 + CAST(ceil((len(toks) - 32) / 24.0) AS INT) END AS m
  FROM base
)
SELECT c.doc_id,
       CAST(i AS INTEGER) AS chunk_index,
       array_to_string(c.toks[(i * 24 + 1):LEAST(i * 24 + 32, c.n)], ' ')
         AS chunk_text,
       ps.s AS span_start,
       pe.e AS span_end
FROM c_t c,
     LATERAL (SELECT unnest(generate_series(0, c.m - 1)) AS i) g
     JOIN pos ps ON ps.doc_id = c.doc_id AND ps.ti = i * 24 + 1
     JOIN pos pe ON pe.doc_id = c.doc_id AND pe.ti = LEAST(i * 24 + 32, c.n)
""",
        "chunk_token": _CHUNK_CTE.format(
            key="doc_id", key_out="doc_id", text_expr="text",
            src="documents", size=32, step=24,
        ),
        "extract_chunks": _CHUNK_CTE.format(
            key=_URL, key_out="url",
            text_expr=_MARKDOWN_SQL,
            src="documents WHERE doc_id % 50 NOT IN (3, 13)",
            size=32, step=24,
        ),
        "extract_docx": f"""
SELECT {_URL} AS url, 'docx' AS doc_type, 'ok' AS status,
       '# Document ' || doc_id || chr(10) || chr(10) || text AS markdown
FROM documents
""",
        "extract_rtf": f"""
SELECT {_URL} AS url, 'rtf' AS doc_type, 'ok' AS status,
       text AS markdown
FROM documents
""",
        "extract_pptx": f"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents
), n_t AS (
  SELECT doc_id, toks, len(toks) AS n,
         GREATEST(1, CAST(ceil(len(toks) / 20.0) AS INT)) AS ns
  FROM t
), slides AS (
  SELECT doc_id, s,
         array_to_string(toks[(s * 20 + 1):LEAST(s * 20 + 20, n)], ' ') AS slide
  FROM n_t, LATERAL (SELECT unnest(generate_series(0, ns - 1)) AS s) g
)
SELECT {_URL} AS url, 'pptx' AS doc_type, 'ok' AS status,
       string_agg(slide, chr(10) || chr(10) || '---' || chr(10) || chr(10)
                  ORDER BY s) AS markdown
FROM slides JOIN documents USING (doc_id)
GROUP BY doc_id
""",
        "chunk_sentence": """
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents
), p AS (
  SELECT doc_id,
         list_transform(toks, (x, i) ->
           CASE WHEN i % 8 = 0 OR i = len(toks) THEN x || '.' ELSE x END)
           AS ptoks
  FROM t
), n_t AS (
  SELECT doc_id, ptoks, len(ptoks) AS n,
         CAST(ceil(len(ptoks) / 8.0) AS INT) AS ns
  FROM p
), c_t AS (
  SELECT doc_id, ptoks, n,
         CASE WHEN ns <= 4 THEN 1
              ELSE 1 + CAST(ceil((ns - 4) / 3.0) AS INT) END AS m
  FROM n_t
)
SELECT doc_id, CAST(i AS INTEGER) AS chunk_index,
       array_to_string(ptoks[(i * 24 + 1):LEAST(i * 24 + 32, n)], ' ')
         AS chunk_text
FROM c_t, LATERAL (SELECT unnest(generate_series(0, m - 1)) AS i) g
""",
        "chunk_recursive": """
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents
), p AS (
  SELECT doc_id,
         list_transform(toks, (x, i) ->
           CASE WHEN i % 8 = 0 OR i = len(toks) THEN x || '.' ELSE x END)
           AS ptoks
  FROM t
), n_t AS (
  SELECT doc_id, ptoks, len(ptoks) AS n,
         CAST(ceil(len(ptoks) / 8.0) AS INT) AS ns
  FROM p
), c_t AS (
  SELECT doc_id, ptoks, n,
         CAST(ceil(ns / 4.0) AS INT) AS m
  FROM n_t
)
SELECT doc_id, CAST(i AS INTEGER) AS chunk_index,
       array_to_string(ptoks[(i * 32 + 1):LEAST(i * 32 + 32, n)], ' ')
         AS chunk_text
FROM c_t, LATERAL (SELECT unnest(generate_series(0, m - 1)) AS i) g
""",
        "extract_spans": f"""
WITH ok AS (
  SELECT doc_id, text,
         length('# Document ' || doc_id) AS hlen,
         length(text) AS tlen,
         {_DOC_TYPE_SQL} AS doc_type
  FROM documents
  WHERE doc_id % 50 NOT IN (3, 13)
)
SELECT {_URL} AS url, CAST(0 AS BIGINT) AS span_index,
       CAST(0 AS BIGINT) AS start,
       CAST(CASE WHEN doc_type = 'text' THEN tlen ELSE hlen END AS BIGINT)
         AS "end",
       CASE WHEN doc_type = 'text' THEN 'paragraph' ELSE 'heading' END AS kind
FROM ok
UNION ALL
SELECT {_URL} AS url, CAST(1 AS BIGINT) AS span_index,
       CAST(hlen + 2 AS BIGINT) AS start,
       CAST(hlen + 2 + tlen AS BIGINT) AS "end",
       'paragraph' AS kind
FROM ok WHERE doc_type != 'text'
""",
        "pdf_pages_explode": f"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents
), n_t AS (
  SELECT doc_id, toks, len(toks) AS n FROM t
), pp AS (
  SELECT doc_id, toks, n,
         CASE WHEN n <= 40 THEN 1
              ELSE 1 + CAST(ceil((n - 40) / 50.0) AS INT) END AS np
  FROM n_t
)
SELECT {_URL} AS url, CAST(p AS BIGINT) AS page_number,
       CASE WHEN p = 1
            THEN '# Document ' || doc_id || chr(10) || chr(10) ||
                 array_to_string(toks[1:LEAST(40, n)], ' ')
            ELSE array_to_string(
                   toks[(40 + (p - 2) * 50 + 1):LEAST(40 + (p - 1) * 50, n)], ' ')
       END AS page_markdown
FROM pp, LATERAL (SELECT unnest(generate_series(1, np)) AS p) g
""",
        "pdf_reaggregate": f"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents
), n_t AS (
  SELECT doc_id, toks, len(toks) AS n FROM t
), pp AS (
  SELECT doc_id, toks, n,
         CASE WHEN n <= 40 THEN 1
              ELSE 1 + CAST(ceil((n - 40) / 50.0) AS INT) END AS np
  FROM n_t
), pages AS (
  SELECT doc_id, p,
         CASE WHEN p = 1
              THEN '# Document ' || doc_id || chr(10) || chr(10) ||
                   array_to_string(toks[1:LEAST(40, n)], ' ')
              ELSE array_to_string(
                     toks[(40 + (p - 2) * 50 + 1):LEAST(40 + (p - 1) * 50, n)], ' ')
         END AS page_markdown
  FROM pp, LATERAL (SELECT unnest(generate_series(1, np)) AS p) g
)
SELECT {_URL} AS url,
       string_agg(page_markdown,
                  chr(10) || chr(10) || '---' || chr(10) || chr(10)
                  ORDER BY p) AS markdown
FROM pages JOIN documents USING (doc_id)
GROUP BY doc_id
""",
        "multimodal_resize": """
SELECT doc_id,
       substr(sha256(text), 1, 32)
         || printf('%08x', 224) || printf('%08x', 168) AS resized_hex
FROM documents
""",
        "frame_sample": """
WITH b AS (
  SELECT doc_id, octet_length(CAST(text AS BLOB)) % 32 AS nf FROM documents
), s AS (
  SELECT doc_id, nf, LEAST(4, nf) AS n FROM b WHERE nf > 0
)
SELECT DISTINCT doc_id, CAST((i * nf) // n AS BIGINT) AS frame_index
FROM s, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) g
""",
        "dedup_exact": """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
)
SELECT min(doc_id) AS doc_id FROM aug GROUP BY md5(text)
""",
        "pagerank": _pagerank_sql(iters=5, damping=0.85),
        "pagerank_personalized": _pagerank_sql(iters=5, damping=0.85, personalize=['c1', 'c19']),
        "pagination_chains": """
WITH parts AS MATERIALIZED (
  SELECT doc_id, string_split_regex(text, '\\s+') AS ws,
         len(string_split_regex(text, '\\s+')) AS n
  FROM documents WHERE doc_id % 23 = 0
), aug AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 4000000,
         array_to_string(ws[1:(n // 2 + 8)], ' ') FROM parts
  UNION ALL
  SELECT doc_id + 5000000,
         array_to_string(ws[(n // 2 + 1):n], ' ') FROM parts
), tok AS MATERIALIZED (
  SELECT doc_id, string_split_regex(text, '\\s+') AS ws,
         len(string_split_regex(text, '\\s+')) AS n
  FROM aug
), b AS MATERIALIZED (
  SELECT doc_id, ws, n FROM tok WHERE n >= 8
), hd AS MATERIALIZED (
  SELECT doc_id, md5(array_to_string(ws[1:8], ' ')) AS fp FROM b
), tl AS MATERIALIZED (
  SELECT doc_id, md5(array_to_string(ws[(n - 7):n], ' ')) AS fp FROM b
), hk AS MATERIALIZED (
  SELECT fp FROM hd GROUP BY fp HAVING count(*) <= 20
), tk AS MATERIALIZED (
  SELECT fp FROM tl GROUP BY fp HAVING count(*) <= 20
)
SELECT t.doc_id AS a, h.doc_id AS b
FROM tl t
JOIN tk ON tk.fp = t.fp
JOIN hd h ON h.fp = t.fp
JOIN hk ON hk.fp = h.fp
WHERE t.doc_id <> h.doc_id
""",
        "content_lifespan": """
WITH snaps AS MATERIALIZED (
  SELECT md5(text || CASE WHEN doc_id % 5 = 0 AND t >= 2
                          THEN ' rev' || t ELSE '' END) AS content_md5,
         t
  FROM documents, (SELECT unnest([1, 2, 3]) AS t)
  WHERE (t = 1 AND doc_id % 13 <> 0) OR (t >= 2 AND doc_id % 11 <> 0)
), d AS (SELECT DISTINCT content_md5, t FROM snaps)
SELECT content_md5, min(t)::BIGINT AS first_seen,
       max(t)::BIGINT AS last_seen, count(*)::BIGINT AS n_snaps
FROM d GROUP BY content_md5
""",
        "cocitation": """
WITH e AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_quantity >= 48
), ok AS MATERIALIZED (
  SELECT dst FROM e GROUP BY dst HAVING count(*) <= 45
), ek AS MATERIALIZED (
  SELECT e.src, e.dst FROM e JOIN ok USING (dst)
)
SELECT a.src AS a, b.src AS b, count(*)::BIGINT AS shared
FROM ek a JOIN ek b ON a.dst = b.dst AND a.src < b.src
GROUP BY 1, 2 HAVING count(*) >= 2
""",
        "hits": _hits_sql(iters=5),
        "kcore": _kcore_sql(k=5, rounds=3),
        "label_propagation": _labelprop_sql(rounds=3),
        "bfs_depth": _bfs_sql(rounds=3),
        # weighted rank rule: smallest value with 2·cumweight ≥ total
        "wmedian_len": r"""
WITH t AS MATERIALIZED (
  SELECT lang, n_chars,
         len(list_filter(string_split_regex(text, '\s+'),
                         w -> w <> ''))::BIGINT AS wt
  FROM documents
), c AS MATERIALIZED (
  SELECT lang, n_chars, sum(wt)::BIGINT AS w
  FROM t GROUP BY lang, n_chars
), cum AS (
  SELECT lang, n_chars, w,
         sum(w) OVER (PARTITION BY lang ORDER BY n_chars) AS cw,
         sum(w) OVER (PARTITION BY lang) AS tot
  FROM c
)
SELECT lang, round(min(n_chars)::DOUBLE, 6) AS wmedian
FROM cum WHERE 2 * cw >= tot GROUP BY lang
""",
        # clip at exact quantile_disc p5/p95 values, exact int mean
        "winsor_len": """
WITH th AS MATERIALIZED (
  SELECT lang, quantile_disc(n_chars, 0.05) AS lo,
         quantile_disc(n_chars, 0.95) AS hi
  FROM documents GROUP BY lang
)
SELECT d.lang, round(max(th.lo)::DOUBLE, 6) AS lo,
       round(max(th.hi)::DOUBLE, 6) AS hi,
       floor(sum(least(greatest(d.n_chars, th.lo), th.hi))
             * 1000000.0 / count(*) + 0.5) / 1000000.0 AS wmean
FROM documents d JOIN th ON th.lang = d.lang
GROUP BY d.lang
""",
        # textbook dominance twin (comparisons only — no float math)
        "skyline": """
SELECT p_partkey, p_size, p_retailprice
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_size >= p.p_size
    AND q.p_retailprice >= p.p_retailprice
    AND (q.p_size > p.p_size OR q.p_retailprice > p.p_retailprice))
""",
        # same three RE2 counts, same per-row float expression
        "readability": r"""
WITH c AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+'))::BIGINT AS w,
         greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
           AS s,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
           AS y
  FROM documents
)
SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
       CASE WHEN w > 0
            THEN floor((206.835 - 1.015 * (w::DOUBLE / s)
                        - 84.6 * (y::DOUBLE / w)) * 10000 + 0.5)
                 / 10000.0
            ELSE NULL END AS flesch
FROM c
""",
        # brute-force pair twin; tau from the same exact int masses
        "kendall": r"""
WITH t AS MATERIALIZED (
  SELECT doc_id, n_chars::BIGINT AS x,
         len(list_filter(string_split_regex(text, '\s+'),
                         w -> w <> ''))::BIGINT AS y
  FROM documents
), p AS (
  SELECT sum(CASE WHEN (a.x < b.x AND a.y < b.y)
                    OR (a.x > b.x AND a.y > b.y)
                  THEN 1 ELSE 0 END)::BIGINT AS c,
         sum(CASE WHEN (a.x < b.x AND a.y > b.y)
                    OR (a.x > b.x AND a.y < b.y)
                  THEN 1 ELSE 0 END)::BIGINT AS d,
         count(*)::BIGINT AS np,
         sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END)::BIGINT AS tx,
         sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END)::BIGINT AS ty
  FROM t a JOIN t b ON a.doc_id < b.doc_id
), nn AS (SELECT count(*)::BIGINT AS n FROM t)
SELECT nn.n, p.c AS concordant, p.d AS discordant,
       CASE WHEN (np - tx) > 0 AND (np - ty) > 0
            THEN round((p.c - p.d)
                       / sqrt((np - tx)::DOUBLE * (np - ty)::DOUBLE),
                       6)
            ELSE NULL END AS tau
FROM p CROSS JOIN nn
""",
        # pair-free U: per value, a-count × strictly-below b-mass plus
        # half the tie product — doubled to stay integer, halved once
        "rank_test": """
WITH s AS MATERIALIZED (
  SELECT lang, CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END
           AS side, n_chars
  FROM documents
), c AS MATERIALIZED (
  SELECT lang, n_chars,
         sum(CASE WHEN side = 'even' THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN side = 'odd' THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM s GROUP BY lang, n_chars
), w AS (
  SELECT lang, n_chars, ca, cb,
         (sum(cb) OVER (PARTITION BY lang ORDER BY n_chars)
          - cb)::BIGINT AS below
  FROM c
)
SELECT lang, sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b,
       (sum(ca * 2 * below + ca * cb) / 2.0) AS u
FROM w GROUP BY lang
""",
        # six exact int64 moments per lang; t/df are the IDENTICAL
        # float expression tree as the engine finish (every cast and
        # op mirrored), snapped with the same floor(x*1e6+0.5) —
        # round-half-UP for negative t by design, never round()
        # BH step-up: rank by (p, key), raw = p*n/rank, suffix-min from
        # the largest rank, clamp 1 — identical IEEE expression tree as
        # the Ray plan, so equality is bitwise with no snapping
        "fdr_correct": """
WITH fam AS (
  SELECT source || '|' || lang AS key,
         (CAST(sum(doc_id) % 999983 AS DOUBLE) + 1) / 999983.0 AS p
  FROM documents GROUP BY source, lang
), r AS (
  SELECT key, p,
         row_number() OVER (ORDER BY p, key) AS rnk,
         count(*) OVER () AS n
  FROM fam
), a AS (
  SELECT key, p, rnk,
         least(1.0, min(p * n / rnk) OVER
               (ORDER BY rnk DESC ROWS UNBOUNDED PRECEDING)) AS p_adj
  FROM r
)
SELECT key, p, rnk AS rank, p_adj, p_adj <= 0.2 AS significant FROM a
""",
        "welch_test": """
WITH base AS (
  SELECT lang,
         CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END::BIGINT AS ia,
         CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END::BIGINT AS ib,
         n_chars::BIGINT AS v
  FROM documents
), m AS (
  SELECT lang,
         sum(ia)::BIGINT AS na, sum(ia * v)::BIGINT AS sa,
         sum(ia * v * v)::BIGINT AS ssa,
         sum(ib)::BIGINT AS nb, sum(ib * v)::BIGINT AS sb,
         sum(ib * v * v)::BIGINT AS ssb
  FROM base GROUP BY lang
), f AS (
  SELECT lang, na, nb,
         (na::DOUBLE * ssa::DOUBLE - sa::DOUBLE * sa::DOUBLE)
           / (na::DOUBLE * (na::DOUBLE - 1.0)) AS va,
         (nb::DOUBLE * ssb::DOUBLE - sb::DOUBLE * sb::DOUBLE)
           / (nb::DOUBLE * (nb::DOUBLE - 1.0)) AS vb,
         sa::DOUBLE / na::DOUBLE AS ma,
         sb::DOUBLE / nb::DOUBLE AS mb
  FROM m
), g AS (
  SELECT lang, na, nb, ma, mb,
         va / na::DOUBLE AS sea, vb / nb::DOUBLE AS seb
  FROM f
)
SELECT lang, na AS n_a, nb AS n_b,
  CASE WHEN na > 1 AND nb > 1 AND (sea + seb) > 0
       THEN floor((ma - mb) / sqrt(sea + seb) * 1000000.0 + 0.5)
            / 1000000.0
       ELSE NULL END AS t,
  CASE WHEN na > 1 AND nb > 1 AND (sea + seb) > 0
       THEN floor(((sea + seb) * (sea + seb))
                  / (sea * sea / (na::DOUBLE - 1.0)
                     + seb * seb / (nb::DOUBLE - 1.0))
                  * 1000000.0 + 0.5) / 1000000.0
       ELSE NULL END AS df
FROM g
""",
        # exact int64 contingency margins; chi2 = the IDENTICAL float
        # expression tree as the engine score map (every cast and op
        # mirrored), ranking on the ROUNDED score like the engine
        "chi2_terms": r"""
WITH words AS (
  SELECT source, unnest(list_filter(
           regexp_split_to_array(text, '[ \t\r\n\f]+'),
           w -> w <> '')) AS term
  FROM documents
), cnt AS (
  SELECT source, term, count(*)::BIGINT AS n
  FROM words GROUP BY source, term
), twt AS (
  SELECT term, sum(n)::BIGINT AS tw FROM cnt GROUP BY term
), tgt AS (
  SELECT source, sum(n)::BIGINT AS tg FROM cnt GROUP BY source
), tot AS (
  SELECT sum(n)::BIGINT AS nn FROM cnt
), cells AS (
  SELECT c.source, c.term, c.n AS a, twt.tw AS tw, tgt.tg AS tg,
         tot.nn AS nn,
         (twt.tw - c.n)::BIGINT AS b,
         (tgt.tg - c.n)::BIGINT AS cc,
         (tot.nn - twt.tw - tgt.tg + c.n)::BIGINT AS d
  FROM cnt c JOIN twt USING (term) JOIN tgt USING (source)
  CROSS JOIN tot
), sc AS (
  SELECT source, term,
    CASE WHEN (tw::DOUBLE * (nn - tw)::DOUBLE
               * tg::DOUBLE * (nn - tg)::DOUBLE) > 0
         THEN round((nn::DOUBLE
                     * (a::DOUBLE * d::DOUBLE - b::DOUBLE * cc::DOUBLE)
                     * (a::DOUBLE * d::DOUBLE - b::DOUBLE * cc::DOUBLE))
                    / (tw::DOUBLE * (nn - tw)::DOUBLE
                       * tg::DOUBLE * (nn - tg)::DOUBLE), 6)
         ELSE 0.0 END AS score
  FROM cells
)
SELECT source, score, term, CAST(rank AS BIGINT) AS rank FROM (
  SELECT source, score, term,
         row_number() OVER (PARTITION BY source
                            ORDER BY score DESC, term ASC) AS rank
  FROM sc)
WHERE rank <= 10
""",
        # same margins as chi2_terms; each G2 cell is the IDENTICAL
        # obs*ln((obs*N)/(rt*ct)) float tree as the engine, summed
        # left-to-right, doubled, rounded to 6; ranking on the
        # rounded score
        "llr_terms": r"""
WITH words AS (
  SELECT source, unnest(list_filter(
           regexp_split_to_array(text, '[ \t\r\n\f]+'),
           w -> w <> '')) AS term
  FROM documents
), cnt AS (
  SELECT source, term, count(*)::BIGINT AS n
  FROM words GROUP BY source, term
), twt AS (
  SELECT term, sum(n)::BIGINT AS tw FROM cnt GROUP BY term
), tgt AS (
  SELECT source, sum(n)::BIGINT AS tg FROM cnt GROUP BY source
), tot AS (
  SELECT sum(n)::BIGINT AS nn FROM cnt
), cells AS (
  SELECT c.source, c.term, c.n AS a, twt.tw AS tw, tgt.tg AS tg,
         tot.nn AS nn,
         (twt.tw - c.n)::BIGINT AS b,
         (tgt.tg - c.n)::BIGINT AS cc,
         (tot.nn - twt.tw - tgt.tg + c.n)::BIGINT AS d
  FROM cnt c JOIN twt USING (term) JOIN tgt USING (source)
  CROSS JOIN tot
), sc AS (
  SELECT source, term,
    round(2.0 * (
      (CASE WHEN a > 0 THEN a::DOUBLE
              * ln((a::DOUBLE * nn::DOUBLE)
                   / (tw::DOUBLE * tg::DOUBLE)) ELSE 0.0 END)
      + (CASE WHEN b > 0 THEN b::DOUBLE
                * ln((b::DOUBLE * nn::DOUBLE)
                     / (tw::DOUBLE * (nn - tg)::DOUBLE)) ELSE 0.0 END)
      + (CASE WHEN cc > 0 THEN cc::DOUBLE
                * ln((cc::DOUBLE * nn::DOUBLE)
                     / ((nn - tw)::DOUBLE * tg::DOUBLE)) ELSE 0.0 END)
      + (CASE WHEN d > 0 THEN d::DOUBLE
                * ln((d::DOUBLE * nn::DOUBLE)
                     / ((nn - tw)::DOUBLE * (nn - tg)::DOUBLE))
         ELSE 0.0 END)), 6) AS score
  FROM cells
)
SELECT source, score, term, CAST(rank AS BIGINT) AS rank FROM (
  SELECT source, score, term,
         row_number() OVER (PARTITION BY source
                            ORDER BY score DESC, term ASC) AS rank
  FROM sc)
WHERE rank <= 10
""",
        # same md5 bucketing as term_drift; JS term = the IDENTICAL
        # float expression tree as the engine (libm log2 bit-identical
        # on identical double inputs), one-sided buckets get the exact
        # 0.5·p closed form, floor-snapped (js_term >= 0)
        "vocab_js": r"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\s+'),
                            w -> w <> '')) AS w
  FROM documents
), bk AS MATERIALIZED (
  SELECT doc_id,
         (('0x' || substr(md5(w), 1, 16))::UBIGINT % 64)::BIGINT
           AS bucket
  FROM toks
), cr AS MATERIALIZED (
  SELECT bucket, count(*)::BIGINT AS nr FROM bk
  WHERE doc_id % 2 = 0 GROUP BY bucket
), cn AS MATERIALIZED (
  SELECT bucket, count(*)::BIGINT AS nn FROM bk
  WHERE doc_id % 2 = 1 GROUP BY bucket
), tot AS (
  SELECT (SELECT sum(nr) FROM cr)::BIGINT AS tr,
         (SELECT sum(nn) FROM cn)::BIGINT AS tn
), j AS (
  SELECT COALESCE(cr.bucket, cn.bucket) AS bucket,
         COALESCE(cr.nr, 0)::BIGINT AS nr,
         COALESCE(cn.nn, 0)::BIGINT AS nn,
         tot.tr AS tr, tot.tn AS tn
  FROM cr FULL OUTER JOIN cn ON cn.bucket = cr.bucket
  CROSS JOIN tot
), probs AS (
  SELECT bucket, nr, nn,
         nn::DOUBLE / tn AS p, nr::DOUBLE / tr AS q
  FROM j
)
SELECT bucket, nr AS n_ref, nn AS n_new,
  CASE WHEN nn > 0 AND nr > 0
       THEN floor((0.5 * (p * log2(p / ((p + q) / 2.0)))
                   + 0.5 * (q * log2(q / ((p + q) / 2.0))))
                  * 1000000.0 + 0.5) / 1000000.0
       WHEN nn > 0 THEN floor(0.5 * p * 1000000.0 + 0.5) / 1000000.0
       ELSE floor(0.5 * q * 1000000.0 + 0.5) / 1000000.0
  END AS js_term
FROM probs
""",
        # both logs snapped to the 1e-5 grid as int64 FIRST (libm ln is
        # bit-identical on exact integer inputs across engines), then
        # exact integer moments -> one closed-form float finish
        # same 57-bit md5-prefix fp space as the engine's gram_rows;
        # novelty = owner(min doc_id) == doc, floor-snap round parity
        "ngram_novelty": r"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'),
                     w -> w <> '') AS ws
  FROM documents
), big AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         (('0x' || substr(md5(g), 1, 16))::UBIGINT >> 7)::BIGINT AS fp
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i + 1])) AS g
    FROM toks WHERE len(ws) >= 2)
), own AS (
  SELECT fp, min(doc_id) AS own FROM big GROUP BY fp
)
SELECT b.doc_id,
       count(*)::BIGINT AS n_grams,
       sum(CASE WHEN o.own = b.doc_id THEN 1 ELSE 0 END)::BIGINT
         AS n_novel,
       round(sum(CASE WHEN o.own = b.doc_id THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS novelty
FROM big b JOIN own o ON o.fp = b.fp
GROUP BY b.doc_id
""",
        # every count an RE2 kernel with the IDENTICAL pattern string;
        # the verdict is pure integer comparisons (gopher_flags rule)
        "code_stats": r"""
WITH m AS MATERIALIZED (
  SELECT doc_id,
    (length(text) - length(replace(text, chr(10), '')) + 1)::BIGINT
      AS n_lines,
    len(regexp_extract_all(text, '(?m)[;{}][ \t]*$'))::BIGINT
      AS punct_lines,
    len(regexp_extract_all(text, '(?m)^(?:\t|    )'))::BIGINT
      AS indent_lines,
    len(regexp_extract_all(text, '[{}()\[\];=<>]'))::BIGINT
      AS sym_chars,
    len(regexp_extract_all(text,
        '\b(?:def|return|import|class|function|var|const|void|static'
        || '|elif|lambda|public|private|struct|typedef)\b'))::BIGINT
      AS kw_hits,
    length(text)::BIGINT AS n_chars
  FROM documents
)
SELECT doc_id, n_lines, punct_lines, indent_lines, sym_chars, kw_hits,
       n_chars,
       (10 * (punct_lines + indent_lines) >= 3 * n_lines
        OR (kw_hits >= 3 AND 25 * sym_chars >= n_chars
            AND n_chars > 0)) AS is_code
FROM m
""",
        # gram char length = sum(token lens) + n-1 = length of the
        # ' '-joined gram string; round-6 snap parity on both ratios
        "dup_ngram_stats": r"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'),
                     w -> w <> '') AS ws
  FROM documents
), grams AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) - 1),
                i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS g
  FROM toks WHERE len(ws) >= 3
), counted AS (
  SELECT doc_id, g, count(*)::BIGINT AS c, length(g)::BIGINT AS gl
  FROM grams GROUP BY doc_id, g
), agg AS (
  SELECT doc_id,
         sum(c)::BIGINT AS n_grams,
         sum(CASE WHEN c >= 2 THEN c ELSE 0 END)::BIGINT AS n_dup,
         sum(c * gl)::BIGINT AS ch_tot,
         sum(CASE WHEN c >= 2 THEN c * gl ELSE 0 END)::BIGINT AS ch_dup
  FROM counted GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_grams, 0)::BIGINT AS n_grams,
       coalesce(a.n_dup, 0)::BIGINT AS n_dup,
       CASE WHEN a.n_grams > 0
            THEN round(a.n_dup::DOUBLE / a.n_grams, 6) END AS dup_frac,
       CASE WHEN a.n_grams > 0
            THEN round(a.ch_dup::DOUBLE / a.ch_tot, 6) END
         AS dup_char_frac
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
""",
        # shard = exclusive weighted cumsum over (md5, id) // budget —
        # the same window shape as the global_rank/epoch_order twin
        "shard_assign": r"""
WITH w AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[^\s]+'))::BIGINT AS n_words
  FROM documents
)
SELECT doc_id, n_words,
       (coalesce(sum(n_words) OVER (
            ORDER BY md5(doc_id::VARCHAR), doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        // 2000)::BIGINT AS shard
FROM w
""",
        # the lang_id twin applied to exploded non-blank paragraphs;
        # 1-based ordinal within the FILTERED paragraph list; planted
        # German second paragraph on doc_id % 4 = 0
        "para_lang": r"""
WITH aug AS MATERIALIZED (
  SELECT doc_id,
         text || CASE WHEN doc_id % 4 = 0
                      THEN chr(10) || chr(10)
                           || 'der die das und ist nicht ein eine zu '
                           || 'den von mit auf für im sich des dem'
                      ELSE '' END AS text
  FROM documents
), t AS MATERIALIZED (
  SELECT doc_id,
    list_filter(string_split(text, chr(10) || chr(10)),
                x -> trim(x, ' ' || chr(9) || chr(13) || chr(10)
                          || chr(12)) <> '') AS paras
  FROM aug
), p AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(paras, 1) AS para_ord,
         unnest(paras) AS para
  FROM t
), tok AS (
  SELECT doc_id, para_ord,
         list_transform(regexp_extract_all(para, '\w+'),
                        x -> lower(x)) AS toks
  FROM p
), s AS (
  SELECT doc_id, para_ord, len(toks) AS n,
    len(list_filter(toks, x -> x IN ('the','of','and','to','a','in','is',
      'that','it','for','on','with','as','are','was','be','this','have',
      'from','or','by'))) AS h_en,
    len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht',
      'ein','eine','zu','den','von','mit','auf','für','im','sich','des',
      'dem'))) AS h_de,
    len(list_filter(toks, x -> x IN ('el','la','los','las','de','que','y',
      'en','un','una','es','no','por','con','para','del','se','su','al',
      'como'))) AS h_es,
    len(list_filter(toks, x -> x IN ('le','la','les','de','des','et','un',
      'une','est','que','pour','dans','qui','au','du','sur','ne','pas',
      'ce'))) AS h_fr,
    len(list_filter(toks, x -> x IN ('bir','ve','bu','da','de','için',
      'ile','olarak','çok','daha','en','gibi','sonra','kadar','ama',
      'ben'))) AS h_tr
  FROM tok
)
SELECT doc_id, para_ord,
  CASE WHEN n = 0 THEN 'und'
       WHEN GREATEST(h_en, h_de, h_es, h_fr, h_tr) * 1.0 / n <= 0.02
         THEN 'und'
       WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr
            AND h_en >= h_tr THEN 'en'
       WHEN h_de >= h_es AND h_de >= h_fr AND h_de >= h_tr THEN 'de'
       WHEN h_es >= h_fr AND h_es >= h_tr THEN 'es'
       WHEN h_fr >= h_tr THEN 'fr'
       ELSE 'tr' END AS lang_id
FROM s
""",
        # engine regex extraction == json parser under the flat-object
        # contract; twin uses the real JSON reader
        "props_flatten": """
SELECT event_id,
       json_extract_string(props, '$.k')::BIGINT AS k
FROM events
""",
        # dHash rebuilt in SQL: 8 char segments → md5 hex-digit pixel
        # rows → horizontal-gradient bits (char compare == numeric
        # compare for hex digits); 8×8 banding is pigeonhole-exact at
        # hamming ≤ 7 so the twin is plain brute-force bit_count
        "media_phash": """
WITH aug AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         repeat('x', least(10, length(text)))
         || substr(text, least(10, length(text)) + 1)
  FROM documents WHERE doc_id % 9 = 0
), segs AS MATERIALIZED (
  SELECT doc_id, r.r,
         md5(substr(text, (r.r * length(text)) // 8 + 1,
                    ((r.r + 1) * length(text)) // 8
                    - (r.r * length(text)) // 8)) AS hx
  FROM aug, (SELECT unnest(range(8)) AS r) r
), h AS MATERIALIZED (
  SELECT doc_id,
         coalesce(sum(CASE WHEN substr(hx, c.c + 1, 1)
                              < substr(hx, c.c + 2, 1)
                      THEN (1::UBIGINT << (r * 8 + c.c))
                      ELSE 0::UBIGINT END), 0)::UBIGINT AS s
  FROM segs, (SELECT unnest(range(8)) AS c) c
  GROUP BY doc_id
)
SELECT a.doc_id AS a, b.doc_id AS b,
       bit_count(xor(a.s, b.s))::BIGINT AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= 7
""",
        # pinned float sequence mean=S/n; var=Q/n−mean²; z=(v−mean)/√var
        # with the SIGNED half-up floor snap (two_prop_test convention)
        "grouped_zscore": """
WITH m AS (
  SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS s,
         sum(n_chars * n_chars)::BIGINT AS q
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars,
       CASE WHEN m.n >= 2
             AND q::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n) > 0
            THEN floor((d.n_chars - s::DOUBLE / n)
                       / sqrt(q::DOUBLE / n
                              - (s::DOUBLE / n) * (s::DOUBLE / n))
                       * 1000000 + 0.5) / 1000000
       END AS z
FROM documents d JOIN m USING (lang)
""",
        # engine ranks (cosine DESC, dst ASC) via stable argsort on the
        # ascending-id broadcast index — identical to the window below
        "knn_graph": """
WITH s AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         list_cosine_similarity(a.embedding::DOUBLE[],
                                b.embedding::DOUBLE[]) AS sc
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
)
SELECT src, dst, round(sc, 4) AS score FROM (
  SELECT src, dst, sc,
         row_number() OVER (PARTITION BY src
                            ORDER BY sc DESC, dst ASC) AS rn
  FROM s)
WHERE rn <= 5
""",
        # Hamilton apportionment in INTEGER arithmetic: floor via //,
        # remainder = N*cnt - floor*total, leftovers to largest
        # remainders (ties by group key ASC) — then quota smallest ids
        "stratified_sample": """
WITH c AS (
  SELECT lang, count(*)::BIGINT AS cnt FROM documents GROUP BY lang
), tot AS (
  SELECT sum(cnt)::BIGINT AS t FROM c
), fl AS (
  SELECT lang, cnt,
         (100 * cnt) // t AS fl,
         100 * cnt - ((100 * cnt) // t) * t AS rem
  FROM c CROSS JOIN tot
), alloc AS (
  SELECT lang,
         fl + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang ASC)
                        <= 100 - (SELECT sum(fl) FROM fl)
                   THEN 1 ELSE 0 END AS quota
  FROM fl
), r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents
)
SELECT r.doc_id, r.lang
FROM r JOIN alloc ON r.lang = alloc.lang
WHERE r.rn <= alloc.quota
""",
        # the registrant is derived WITHOUT the suffix-split logic:
        # by construction every synthesized host is
        # sub{k}.site{n}.{suffix}, so eTLD+1 == 'site{n}.' || suffix
        # for single- AND multi-label suffixes alike
        "domain_rollup": """
SELECT 'site' || (doc_id % 100)::VARCHAR || '.' ||
       (['com','org','co.uk','com.au','net','io','de','co.jp'])
         [(doc_id % 8) + 1] AS domain,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars
FROM documents
GROUP BY 1
""",
        # rebuilds the table cells straight from the text tokens the
        # engine laid out as <td>s — row-major 2-wide fill of the
        # first ≤6 tokens
        "html_tables": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'),
                     w -> w <> '') AS ws
  FROM documents
), idx AS (
  SELECT doc_id, ws,
         range(1, least(len(ws), 6) + 1) AS ii
  FROM toks WHERE len(ws) > 0
)
SELECT doc_id,
       unnest(list_transform(ii, i -> ((i - 1) // 2)::BIGINT))
         AS row_idx,
       unnest(list_transform(ii, i -> ((i - 1) % 2)::BIGINT))
         AS col_idx,
       unnest(list_transform(ii, i -> ws[i])) AS cell
FROM idx
""",
        "zipf_slope": r"""
WITH w AS MATERIALIZED (
  SELECT lang,
         unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS term
  FROM documents
), c AS MATERIALIZED (
  SELECT lang, term, count(*)::BIGINT AS n FROM w GROUP BY lang, term
), r AS (
  SELECT lang, n,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n DESC, term ASC) AS rnk
  FROM c QUALIFY rnk <= 100
), p AS (
  SELECT lang,
         floor(ln(rnk::DOUBLE) * 100000.0 + 0.5)::BIGINT AS x,
         floor(ln(n::DOUBLE) * 100000.0 + 0.5)::BIGINT AS y
  FROM r
), m AS (
  SELECT lang, count(*)::BIGINT AS np, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
         sum(x * y)::BIGINT AS sxy
  FROM p GROUP BY lang
)
SELECT lang, np AS n_terms,
  CASE WHEN (np * sxx - sx * sx) > 0
       THEN round((np * sxy - sx * sy)::DOUBLE
                  / (np * sxx - sx * sx)::DOUBLE, 6)
       ELSE NULL END AS slope,
  CASE WHEN (np * sxx - sx * sx) > 0
       THEN round((sy - ((np * sxy - sx * sy)::DOUBLE
                         / (np * sxx - sx * sx)::DOUBLE) * sx)
                  / np / 100000.0, 6)
       ELSE NULL END AS intercept
FROM m
""",
        # integer (length, nibble-count) profile string; ASCII corpus
        # so char position == byte position, utf-8 length == length
        "media_dedup": """
WITH aug AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
), n_t AS MATERIALIZED (
  SELECT doc_id, length(text) AS n FROM aug
), chars AS MATERIALIZED (
  SELECT a.doc_id, ascii(substr(a.text, i, 1)) AS c
  FROM aug a,
       LATERAL (SELECT unnest(generate_series(1, length(a.text)))
                AS i) g
  WHERE length(a.text) > 0
), nib AS MATERIALIZED (
  SELECT doc_id, c // 16 AS bin, count(*)::BIGINT AS k
  FROM chars GROUP BY doc_id, c // 16
), bins AS (
  SELECT n_t.doc_id, b AS bin
  FROM n_t, LATERAL (SELECT unnest(generate_series(0, 15)) AS b) g
), prof AS MATERIALIZED (
  SELECT bins.doc_id,
         max(n_t.n) || ':'
         || array_to_string(list(COALESCE(nib.k, 0)
                                 ORDER BY bins.bin), ':') AS profile
  FROM bins
  LEFT JOIN nib ON nib.doc_id = bins.doc_id AND nib.bin = bins.bin
  JOIN n_t ON n_t.doc_id = bins.doc_id
  GROUP BY bins.doc_id
)
SELECT min(doc_id) AS doc_id FROM prof GROUP BY profile
""",
        # exact integer Simpson moments; single-row groups NULL
        "source_diversity": """
WITH h AS MATERIALIZED (
  SELECT 'site' || (doc_id % 23) AS host, source FROM documents
), c AS MATERIALIZED (
  SELECT host, source, count(*)::BIGINT AS n
  FROM h GROUP BY host, source
)
SELECT host, sum(n)::BIGINT AS n_docs, count(*)::BIGINT AS n_cats,
       CASE WHEN sum(n) >= 2
            THEN floor((sum(n) * (sum(n) - 1) - sum(n * (n - 1)))
                       * 1000000.0
                       / (sum(n) * (sum(n) - 1)) + 0.5) / 1000000.0
            ELSE NULL END AS simpson
FROM c GROUP BY host
""",
        # md5 multiplicity >= 2 marks dups; host from the POST-dup id
        "host_dup_rates": """
WITH aug AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
), h AS MATERIALIZED (
  SELECT 'site' || (doc_id % 97) AS host, md5(text) AS m FROM aug
), c AS MATERIALIZED (
  SELECT m FROM h GROUP BY m HAVING count(*) >= 2
), f AS MATERIALIZED (
  SELECT h.host, CASE WHEN c.m IS NULL THEN 0 ELSE 1 END AS d
  FROM h LEFT JOIN c ON c.m = h.m
)
SELECT host, count(*)::BIGINT AS n_docs, sum(d)::BIGINT AS n_dups,
       floor(sum(d) * 1000000.0 / count(*) + 0.5) / 1000000.0
         AS dup_rate
FROM f GROUP BY host
""",
        # word first-occurrence min + conditional sums per checkpoint
        "vocab_growth": r"""
WITH mx AS (SELECT max(doc_id)::BIGINT AS m FROM documents),
ck AS MATERIALIZED (
  SELECT DISTINCT c FROM (
    SELECT (SELECT m // 4 FROM mx) AS c
    UNION ALL SELECT (SELECT m // 2 FROM mx)
    UNION ALL SELECT (SELECT m FROM mx))
), toks AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\s+'),
                            w -> w <> '')) AS w
  FROM documents
), fo AS MATERIALIZED (
  SELECT w, min(doc_id)::BIGINT AS fd FROM toks GROUP BY w
), tc AS MATERIALIZED (
  SELECT doc_id, count(*)::BIGINT AS nt FROM toks GROUP BY doc_id
), vs AS (
  SELECT ck.c, sum(CASE WHEN fo.fd <= ck.c THEN 1 ELSE 0 END)::BIGINT
           AS vocab_size
  FROM ck CROSS JOIN fo GROUP BY ck.c
), ts AS (
  SELECT ck.c, sum(CASE WHEN tc.doc_id <= ck.c THEN tc.nt
                        ELSE 0 END)::BIGINT AS n_tokens
  FROM ck CROSS JOIN tc GROUP BY ck.c
)
SELECT vs.c AS checkpoint, vs.vocab_size, ts.n_tokens
FROM vs JOIN ts ON ts.c = vs.c
""",
        # two quantile_disc passes: group median, then the median of
        # absolute deviations from it
        "mad_len": """
WITH m AS MATERIALIZED (
  SELECT lang, quantile_disc(n_chars, 0.5) AS med
  FROM documents GROUP BY lang
), d AS MATERIALIZED (
  SELECT doc.lang, m.med,
         abs(doc.n_chars - m.med)::DOUBLE AS dev
  FROM documents doc JOIN m ON m.lang = doc.lang
)
SELECT lang, round(max(med)::DOUBLE, 6) AS median,
       round(quantile_disc(dev, 0.5), 6) AS mad
FROM d GROUP BY lang
""",
        # gaps-and-islands twin over the sessionize window SQL
        "session_durations": """
WITH s AS MATERIALIZED (
  SELECT user_id, ts,
    (sum(CASE WHEN prev_ts IS NULL
              OR epoch_us(ts - prev_ts) > 1800 * 1000000
              THEN 1 ELSE 0 END)
       OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)::BIGINT
      AS session_idx
  FROM (
    SELECT event_id, user_id, ts,
           lag(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev_ts
    FROM events
  )
), d AS MATERIALIZED (
  SELECT user_id, session_idx,
         epoch_us(max(ts) - min(ts))::BIGINT AS dur
  FROM s GROUP BY 1, 2
)
SELECT user_id, count(*)::BIGINT AS n_sessions,
       sum(dur)::BIGINT AS total_active_us,
       max(dur)::BIGINT AS longest_us
FROM d GROUP BY user_id
""",
        # reference-decile edges (quantile_disc + strict-less, the
        # len_deciles rule) bin both halves; per-bucket term only
        "drift_psi": """
WITH ref AS MATERIALIZED (
  SELECT n_chars FROM documents WHERE doc_id % 2 = 0
), nw AS MATERIALIZED (
  SELECT n_chars FROM documents WHERE doc_id % 2 = 1
), th AS MATERIALIZED (
  SELECT quantile_disc(n_chars,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS ts
  FROM ref
), cr AS MATERIALIZED (
  SELECT len(list_filter(th.ts, t -> t < r.n_chars))::BIGINT AS bucket,
         count(*)::BIGINT AS nr
  FROM ref r CROSS JOIN th GROUP BY 1
), cn AS MATERIALIZED (
  SELECT len(list_filter(th.ts, t -> t < n.n_chars))::BIGINT AS bucket,
         count(*)::BIGINT AS nn
  FROM nw n CROSS JOIN th GROUP BY 1
), tot AS (
  SELECT (SELECT sum(nr) FROM cr)::BIGINT AS tr,
         (SELECT sum(nn) FROM cn)::BIGINT AS tn
)
SELECT COALESCE(cr.bucket, cn.bucket) AS bucket,
       COALESCE(cr.nr, 0)::BIGINT AS n_ref,
       COALESCE(cn.nn, 0)::BIGINT AS n_new,
       CASE WHEN COALESCE(cr.nr, 0) > 0 AND COALESCE(cn.nn, 0) > 0
            THEN floor((cn.nn::DOUBLE / tot.tn - cr.nr::DOUBLE / tot.tr)
                       * ln((cn.nn::DOUBLE / tot.tn)
                            / (cr.nr::DOUBLE / tot.tr))
                       * 1000000 + 0.5) / 1000000.0
            ELSE NULL END AS psi_term
FROM cr FULL OUTER JOIN cn ON cn.bucket = cr.bucket
CROSS JOIN tot
""",
        # same cover expansion in SQL: activity × 7 offsets, distinct,
        # count; observed days only via the dau join
        "active_users": """
WITH a AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
), dau AS (
  SELECT day, count(*)::BIGINT AS dau FROM a GROUP BY day
), cov AS MATERIALIZED (
  SELECT DISTINCT a.user_id, a.day + i.i AS day
  FROM a CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS i) i
), wau AS (
  SELECT day, count(*)::BIGINT AS wau FROM cov GROUP BY day
)
SELECT d.day, d.dau, w.wau,
       floor(d.dau * 1000000.0 / w.wau + 0.5) / 1000000.0
         AS stickiness
FROM dau d JOIN wau w ON w.day = d.day
""",
        # z from the same three integer moments; population variance,
        # observed cells only, NULL for degenerate types
        "burst_scores": """
WITH c AS MATERIALIZED (
  SELECT event_type AS type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
), m AS (
  SELECT type, count(*)::BIGINT AS k, sum(n)::BIGINT AS s1,
         sum(n * n)::BIGINT AS s2
  FROM c GROUP BY type
)
SELECT c.type, c.bucket, c.n,
       CASE WHEN (m.k * m.s2 - m.s1 * m.s1) > 0
            THEN round((c.n * m.k - m.s1)::DOUBLE
                       / sqrt((m.k * m.s2 - m.s1 * m.s1)::DOUBLE), 6)
            ELSE NULL END AS z
FROM c JOIN m ON m.type = c.type
""",
        # composed twin: robots precedence → politeness two-level rank
        # → waterline quota, all chained MATERIALIZED
        "crawl_plan": """
WITH u AS MATERIALIZED (
  SELECT 'site' || (doc_id % 10) || '.example.com' AS host,
         CASE doc_id % 4
           WHEN 0 THEN '/articles/' || doc_id || '/comments'
           WHEN 1 THEN '/p/' || (doc_id * 7 % 1000) || '/view'
           WHEN 2 THEN '/users/u' || (doc_id % 50) || '/posts/'
                       || doc_id
           ELSE '/static/img_' || doc_id || '.png'
         END AS path
  FROM documents
), uu AS MATERIALIZED (
  SELECT host || path AS url, host, path FROM u
), r AS MATERIALIZED (
  SELECT 'site' || k || '.example.com' AS host,
         '/static/' AS prefix, FALSE AS allow
  FROM range(0, 10) t(k)
  UNION ALL
  SELECT 'site' || k || '.example.com', '/p/', FALSE
  FROM range(0, 10) t(k) WHERE k % 3 = 0
  UNION ALL
  SELECT 'site' || k || '.example.com', '/p/1', TRUE
  FROM range(0, 10) t(k) WHERE k % 2 = 0
), m AS MATERIALIZED (
  SELECT uu.url, r.prefix, r.allow, length(r.prefix) AS plen
  FROM uu JOIN r ON r.host = uu.host
                AND starts_with(uu.path, r.prefix)
), w AS MATERIALIZED (
  SELECT url, allow FROM (
    SELECT url, allow,
           row_number() OVER (PARTITION BY url
                              ORDER BY plen DESC, allow DESC, prefix) AS rn
    FROM m) WHERE rn = 1
), al AS MATERIALIZED (
  SELECT uu.url, uu.host FROM uu
  LEFT JOIN w ON w.url = uu.url
  WHERE COALESCE(w.allow, TRUE)
), rr AS MATERIALIZED (
  SELECT url, host,
         (row_number() OVER (PARTITION BY host ORDER BY url)
          - 1)::BIGINT AS host_rank
  FROM al
), pos AS MATERIALIZED (
  SELECT url, host, host_rank,
         (row_number() OVER (ORDER BY host_rank, host, url)
          - 1)::BIGINT AS position
  FROM rr
), h AS MATERIALIZED (
  SELECT host, count(*)::BIGINT AS cnt FROM al GROUP BY host
), lv AS MATERIALIZED (
  SELECT gs.l, sum(least(h.cnt, gs.l))::BIGINT AS used
  FROM generate_series(0, 250) gs(l) CROSS JOIN h GROUP BY gs.l
), pick AS (
  SELECT max(l)::BIGINT AS lvl FROM lv WHERE used <= 250
)
SELECT p.url, p.host, p.host_rank, p.position
FROM pos p JOIN h ON h.host = p.host CROSS JOIN pick
WHERE p.host_rank < least(h.cnt, pick.lvl)
""",
        # two-level row_number twin: within-host rank, then the global
        # (rank, host, url) interleave
        "politeness_order": """
WITH u AS MATERIALIZED (
  SELECT 'site' || (doc_id % 10) || '.example.com' AS host,
         'site' || (doc_id % 10) || '.example.com' ||
         CASE doc_id % 4
           WHEN 0 THEN '/articles/' || doc_id || '/comments'
           WHEN 1 THEN '/p/' || (doc_id * 7 % 1000) || '/view'
           WHEN 2 THEN '/users/u' || (doc_id % 50) || '/posts/'
                       || doc_id
           ELSE '/static/img_' || doc_id || '.png'
         END AS url
  FROM documents
), r AS MATERIALIZED (
  SELECT url, host,
         (row_number() OVER (PARTITION BY host ORDER BY url)
          - 1)::BIGINT AS host_rank
  FROM u
)
SELECT url, host, host_rank,
       (row_number() OVER (ORDER BY host_rank, host, url)
        - 1)::BIGINT AS position
FROM r
""",
        # RFC 9309 precedence twin: longest matching prefix wins,
        # Allow wins equal-length ties (least restrictive, RFC 9309
        # 2.2.2), prefix breaks same-verdict ties, default allow
        "robots_policy": """
WITH u AS MATERIALIZED (
  SELECT 'site' || (doc_id % 10) || '.example.com' AS host,
         CASE doc_id % 4
           WHEN 0 THEN '/articles/' || doc_id || '/comments'
           WHEN 1 THEN '/p/' || (doc_id * 7 % 1000) || '/view'
           WHEN 2 THEN '/users/u' || (doc_id % 50) || '/posts/'
                       || doc_id
           ELSE '/static/img_' || doc_id || '.png'
         END AS path
  FROM documents
), uu AS MATERIALIZED (
  SELECT host || path AS url, host, path FROM u
), r AS MATERIALIZED (
  SELECT 'site' || k || '.example.com' AS host,
         '/static/' AS prefix, FALSE AS allow
  FROM range(0, 10) t(k)
  UNION ALL
  SELECT 'site' || k || '.example.com', '/p/', FALSE
  FROM range(0, 10) t(k) WHERE k % 3 = 0
  UNION ALL
  SELECT 'site' || k || '.example.com', '/p/1', TRUE
  FROM range(0, 10) t(k) WHERE k % 2 = 0
), m AS MATERIALIZED (
  SELECT uu.url, r.prefix, r.allow, length(r.prefix) AS plen
  FROM uu JOIN r ON r.host = uu.host
                AND starts_with(uu.path, r.prefix)
), w AS MATERIALIZED (
  SELECT url, allow, prefix FROM (
    SELECT url, allow, prefix,
           row_number() OVER (PARTITION BY url
                              ORDER BY plen DESC, allow DESC, prefix) AS rn
    FROM m) WHERE rn = 1
)
SELECT uu.url, COALESCE(w.allow, TRUE) AS allowed,
       COALESCE(w.prefix, '') AS rule
FROM uu LEFT JOIN w ON w.url = uu.url
""",
        # waterline twin: the largest level with Σ min(cnt, L) ≤ B,
        # found by exhaustive candidate levels over the count histogram
        # (CROSS JOIN, not a correlated subquery — DuckDB binding)
        "crawl_budget": """
WITH h AS MATERIALIZED (
  SELECT 'site' || CAST(floor(sqrt(doc_id % 10000)) AS BIGINT) AS host,
         count(*)::BIGINT AS cnt
  FROM documents GROUP BY 1
), lv AS MATERIALIZED (
  -- levels beyond the budget can never satisfy used <= B while any
  -- key still reaches them, and quota = least(cnt, L) saturates, so
  -- the constant range [0, B] is exhaustive
  SELECT gs.l, sum(least(h.cnt, gs.l))::BIGINT AS used
  FROM generate_series(0, 300) gs(l)
  CROSS JOIN h GROUP BY gs.l
), pick AS (
  SELECT max(l)::BIGINT AS lvl FROM lv WHERE used <= 300
)
SELECT h.host, h.cnt AS n_docs, least(h.cnt, p.lvl)::BIGINT AS quota
FROM h CROSS JOIN pick p
""",
        # synthesis-parity twin: same URL construction, same digit-run
        # regexp_replace, distinct hosts counted per template
        "url_templates": """
WITH u AS (
  SELECT 'site' || (doc_id % 10) || '.example.com' AS host,
         CASE doc_id % 4
           WHEN 0 THEN '/articles/' || doc_id || '/comments'
           WHEN 1 THEN '/p/' || (doc_id * 7 % 1000) || '/view'
           WHEN 2 THEN '/users/u' || (doc_id % 50) || '/posts/'
                       || doc_id
           ELSE '/static/img_' || doc_id || '.png'
         END AS path
  FROM documents
), t AS (
  SELECT regexp_replace(host || path, '[0-9]+', '{N}', 'g')
           AS template, host
  FROM u
), d AS MATERIALIZED (
  SELECT template, host, count(*)::BIGINT AS n
  FROM t GROUP BY template, host
)
SELECT template, count(*)::BIGINT AS n_hosts, sum(n)::BIGINT AS n_urls
FROM d GROUP BY template
""",
        # absolute epoch-week buckets; min-per-user cohort + distinct
        # (user, week) activity joined back — all integer counts
        "cohort_retention": """
WITH f AS MATERIALIZED (
  SELECT user_id,
         CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cw
  FROM events GROUP BY user_id
), a AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS w
  FROM events
)
SELECT f.cw AS cohort_week, (a.w - f.cw)::BIGINT AS week_offset,
       count(*)::BIGINT AS n_users
FROM a JOIN f ON f.user_id = a.user_id
GROUP BY 1, 2
""",
        # lead() twin of the shifted-compare pair emission; p is the
        # half-away 1e-6 snap of one division of identical integers
        "event_transitions": """
WITH ordered AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
), c AS MATERIALIZED (
  SELECT src, dst, count(*)::BIGINT AS n
  FROM ordered WHERE dst IS NOT NULL GROUP BY src, dst
), tot AS (
  SELECT src, sum(n)::BIGINT AS t FROM c GROUP BY src
)
SELECT c.src, c.dst, c.n,
       floor(c.n * 1000000.0 / tot.t + 0.5) / 1000000.0 AS p
FROM c JOIN tot ON tot.src = c.src
""",
        # progressive min-ts twin: each stage binds to the earliest
        # event strictly later than the previous stage's bind
        "funnel": """
WITH t1 AS MATERIALIZED (
  SELECT user_id, min(ts) AS ts1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), t2 AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS ts2
  FROM events e JOIN t1 ON t1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY e.user_id
), t3 AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS ts3
  FROM events e JOIN t2 ON t2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY e.user_id
)
SELECT 0::BIGINT AS step_index, 'view' AS step,
       (SELECT count(*) FROM t1)::BIGINT AS n_users
UNION ALL SELECT 1, 'click', (SELECT count(*) FROM t2)
UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM t3)
""",
        # reversal LEFT JOIN flags mutual edges; half-away 1e-6 ratio
        "reciprocity": """
WITH e AS MATERIALIZED (
  SELECT DISTINCT (doc_id % 37)::BIGINT AS u,
                  ((doc_id * 11 + 3) % 37)::BIGINT AS v
  FROM documents
  WHERE (doc_id % 37) <> ((doc_id * 11 + 3) % 37)
), f AS MATERIALIZED (
  SELECT e.u, e.v,
         CASE WHEN r.u IS NULL THEN 0 ELSE 1 END AS m
  FROM e LEFT JOIN e r ON r.u = e.v AND r.v = e.u
)
SELECT u AS node, count(*)::BIGINT AS n_out,
       sum(m)::BIGINT AS n_recip,
       floor(sum(m) * 1000000.0 / count(*) + 0.5) / 1000000.0
         AS reciprocity
FROM f GROUP BY u
""",
        # lev-pair edges + recursive closure, singletons self-label
        "name_entities": """
WITH RECURSIVE p AS MATERIALIZED (
  SELECT a.c_custkey AS a, b.c_custkey AS b
  FROM customer a JOIN customer b
    ON a.c_custkey < b.c_custkey
   AND abs(length(a.c_name) - length(b.c_name)) <= 1
   AND levenshtein(a.c_name, b.c_name) <= 1
), edges AS MATERIALIZED (
  SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p
), reach(src, node) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
), mins AS (
  SELECT src, min(node) AS mn FROM reach GROUP BY src
)
SELECT c.c_custkey,
       CAST(COALESCE(LEAST(m.src, m.mn), c.c_custkey) AS BIGINT)
         AS cluster
FROM customer c LEFT JOIN mins m ON c.c_custkey = m.src
""",
        # brute-force twin of the two broadcast margin scans: identical
        # integer 1e-4 cosine grid, exact int top-k sums, one float
        # division of the same integers on both engines
        "bitext_mine": """
WITH sa AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id % 2 = 0
), sb AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v
  FROM embeddings WHERE vec_id % 2 = 1
), sims AS MATERIALIZED (
  SELECT sa.vec_id AS ai, sb.vec_id AS bi,
         CAST(floor(list_cosine_similarity(sa.v, sb.v) * 10000 + 0.5)
              AS BIGINT) AS c
  FROM sa CROSS JOIN sb
), ra AS MATERIALIZED (
  SELECT ai, bi, c,
         row_number() OVER (PARTITION BY ai ORDER BY c DESC, bi) AS r
  FROM sims
), rb AS MATERIALIZED (
  SELECT ai, bi, c,
         row_number() OVER (PARTITION BY bi ORDER BY c DESC, ai) AS r
  FROM sims
), ka AS (SELECT ai, sum(c)::BIGINT AS sa_sum FROM ra WHERE r <= 4
          GROUP BY ai),
kb AS (SELECT bi, sum(c)::BIGINT AS sb_sum FROM rb WHERE r <= 4
       GROUP BY bi),
ta AS (SELECT ai, bi, c FROM ra WHERE r = 1),
tb AS (SELECT ai, bi FROM rb WHERE r = 1),
mutual AS (SELECT t.ai, t.bi, t.c
           FROM ta t JOIN tb u ON u.ai = t.ai AND u.bi = t.bi)
SELECT * FROM (
  SELECT m.ai AS a, m.bi AS b, m.c / 10000.0 AS cos,
         floor(2.0 * 4 * m.c * 10000 / (ka.sa_sum + kb.sb_sum) + 0.5)
           / 10000.0 AS margin
  FROM mutual m JOIN ka ON ka.ai = m.ai JOIN kb ON kb.bi = m.bi
  WHERE ka.sa_sum + kb.sb_sum > 0
) WHERE margin >= 1.05
""",
        # quadratic twin of the deletion-signature filter-verify join;
        # the length pre-filter only prunes (a 1-edit pair differs by
        # at most 1 char of length)
        "editdist_pairs": """
SELECT a.c_custkey::BIGINT AS a, b.c_custkey::BIGINT AS b,
       levenshtein(a.c_name, b.c_name)::BIGINT AS dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND abs(length(a.c_name) - length(b.c_name)) <= 1
 AND levenshtein(a.c_name, b.c_name) <= 1
""",
        # degree-oriented node-iterator twin: with a < b canonical
        # edges, triangle x < y < z is exactly one (x,y)+(y,z)+(x,z)
        # row in the ordered self-join; unpivot credits all 3 corners
        "triangle_counts": """
WITH li AS MATERIALIZED (
  SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 45
), e AS MATERIALIZED (
  SELECT DISTINCT LEAST(a.l_suppkey, b.l_suppkey)::BIGINT AS a,
                  GREATEST(a.l_suppkey, b.l_suppkey)::BIGINT AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
), tri AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT node, count(*)::BIGINT AS n_triangles
FROM corners GROUP BY node
""",
        # same triangle plan + canonical degrees, LEFT JOIN so
        # triangle-free nodes score 0; deg-1 nodes NULL
        "clustering_coef": """
WITH li AS MATERIALIZED (
  SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity >= 45
), e AS MATERIALIZED (
  SELECT DISTINCT LEAST(a.l_suppkey, b.l_suppkey)::BIGINT AS a,
                  GREATEST(a.l_suppkey, b.l_suppkey)::BIGINT AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
), tri AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), tc AS MATERIALIZED (
  SELECT node, count(*)::BIGINT AS t
  FROM (SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
  GROUP BY node
), d AS MATERIALIZED (
  SELECT node, count(*)::BIGINT AS deg
  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
  GROUP BY node
)
SELECT d.node, d.deg, COALESCE(tc.t, 0)::BIGINT AS n_triangles,
       CASE WHEN d.deg >= 2
            THEN floor(2.0 * COALESCE(tc.t, 0) * 1000000
                       / (d.deg * (d.deg - 1)) + 0.5) / 1000000.0
            ELSE NULL END AS coef
FROM d LEFT JOIN tc ON tc.node = d.node
""",
        # cluster-label twin: same closure, but every doc is labeled by
        # its component's min key (singletons label themselves)
        "near_dup_clusters": _NEAR_DUP_CLUSTERS_SQL,
        # counts-of-counts over the same closure: the dedup audit
        "cluster_sizes": f"""
SELECT size, count(*)::BIGINT AS n_clusters
FROM (SELECT cluster, count(*)::BIGINT AS size
      FROM ({_NEAR_DUP_CLUSTERS_SQL}) t GROUP BY cluster)
GROUP BY size
""",
        # whole component -> one split: hash_split's md5 bucket rule
        # applied to the CLUSTER id, so near-copies never straddle
        # train and eval
        "leakage_split": f"""
SELECT doc_id, cluster,
  CASE WHEN ('0x' || substring(md5(cluster::VARCHAR), 1, 8))::UBIGINT
            % 100 < 10 THEN 'test'
       WHEN ('0x' || substring(md5(cluster::VARCHAR), 1, 8))::UBIGINT
            % 100 < 20 THEN 'valid'
       ELSE 'train' END AS split
FROM ({_NEAR_DUP_CLUSTERS_SQL}) t
""",
        # keep-best policy: same pair closure, but per cluster the row
        # with the max text length wins (ties -> min doc_id); the mirror
        # copies are longer, so the winner provably differs from min-key.
        "near_dup_keep_best": """
WITH RECURSIVE aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' mirror copy' FROM documents
  WHERE doc_id % 7 = 0
), toks_t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM aug
), n_t AS (
  SELECT doc_id, toks, len(toks) AS n FROM toks_t
), grams AS (
  SELECT doc_id, array_to_string(toks[(i + 1):(i + 3)], ' ') AS gram
  FROM n_t, LATERAL (SELECT unnest(generate_series(0, n - 3)) AS i) g
), sh AS (
  SELECT doc_id, list_distinct(list(gram)) AS s FROM grams GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(a.s || b.s)) >= 0.9
), edges AS (
  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
), reach(src, node) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
), mins AS (
  SELECT src, min(node) AS mn FROM reach GROUP BY src
), lab AS (
  SELECT a.doc_id,
         CAST(COALESCE(LEAST(m.src, m.mn), a.doc_id) AS BIGINT) AS cluster,
         CAST(length(a.text) AS BIGINT) AS textlen
  FROM aug a LEFT JOIN mins m ON a.doc_id = m.src
)
SELECT doc_id, textlen FROM (
  SELECT doc_id, textlen,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY textlen DESC, doc_id ASC) AS rn
  FROM lab)
WHERE rn = 1
""",
        # incremental near-dedup: closure over the new ∪ archive pair
        # graph; new docs sharing a component with an archive doc drop.
        "dedup_near_against": _NEAR_AGAINST_SQL,
        # identical semantics through the persisted signature index
        "dedup_near_indexed": _NEAR_AGAINST_SQL,
        # crawl diff: snapshot B derived deterministically from the
        # documents table; unchanged urls excluded by the hash predicate.
        "crawl_diff": """
WITH a AS (
  SELECT doc_id, md5(text) AS h FROM documents
), b AS (
  SELECT doc_id,
         md5(text || CASE WHEN doc_id % 7 = 0 THEN ' v2' ELSE '' END) AS h
  FROM documents WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + 2000000, md5(text) FROM documents WHERE doc_id % 13 = 0
)
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.h <> b.h
""",
        # dedup_minhash kept-set: connected-component closure over the
        # exact-Jaccard>=0.9 pair graph, min key per component kept —
        # expressible via a recursive CTE (clusters are tiny at sf0.01).
        "dedup_minhash": """
WITH RECURSIVE aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
), toks_t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM aug
), n_t AS (
  SELECT doc_id, toks, len(toks) AS n FROM toks_t
), grams AS (
  SELECT doc_id, array_to_string(toks[(i + 1):(i + 3)], ' ') AS gram
  FROM n_t, LATERAL (SELECT unnest(generate_series(0, n - 3)) AS i) g
), sh AS (
  SELECT doc_id, list_distinct(list(gram)) AS s FROM grams GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(a.s || b.s)) >= 0.9
), edges AS (
  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
), reach(src, node) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
), mins AS (
  SELECT src, min(node) AS mn FROM reach GROUP BY src
)
SELECT doc_id FROM aug
WHERE doc_id NOT IN (SELECT src FROM mins WHERE mn < src)
""",
        # simhash reconstructed in SQL (stable_hash64 == first 8 md5
        # bytes by design); brute-force bit_count(xor) pairs — the 4x16
        # banded LSH is pigeonhole-EXACT for hamming <= 3, so the pair
        # sets are provably equal, not approximately so
        "dedup_simhash": r"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
), toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ts
  FROM aug
), f AS (
  SELECT doc_id, tok, count(*) AS w
  FROM (SELECT doc_id, unnest(ts) AS tok FROM toks) GROUP BY doc_id, tok
), h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hv, w FROM f
), bits AS (
  SELECT doc_id, b.i AS bit,
    sum(CASE WHEN (hv >> b.i) & 1 = 1 THEN w ELSE -w END) AS acc
  FROM h, (SELECT unnest(range(64)) AS i) b
  GROUP BY doc_id, b.i
), sh AS (
  SELECT doc_id,
    coalesce(sum(CASE WHEN acc > 0 THEN (1::UBIGINT << bit)
                 ELSE 0::UBIGINT END), 0)::UBIGINT AS s
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS a, b.doc_id AS b,
       bit_count(xor(a.s, b.s))::BIGINT AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= 3
""",
        # shared by the LSH plan (ngram_jaccard_pairs) and the exact
        # prefix-filter plan (jaccard_join) — same output contract
        "ngram_jaccard_pairs": _JACCARD_PAIRS_SQL,
        "jaccard_join": _JACCARD_PAIRS_SQL,
        "embedding_neardup": """
SELECT vec_id AS a, vec_id + 1000000 AS b, 1.0 AS cosine
FROM embeddings WHERE vec_id % 9 = 0
""",
        "dedup_embedding": """
WITH RECURSIVE aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 9 = 0
), pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM aug a JOIN aug b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                               b.embedding::DOUBLE[]) >= 0.99
), edges AS (
  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
), reach(src, node) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
), mins AS (
  SELECT src, min(node) AS mn FROM reach GROUP BY src
)
SELECT vec_id FROM aug
WHERE vec_id NOT IN (SELECT src FROM mins WHERE mn < src)
""",
        "ann_topk": """
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4)
         AS score
FROM embeddings
ORDER BY list_cosine_similarity(embedding::DOUBLE[],
         (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) DESC,
         vec_id
LIMIT 10
""",
        "ngram_lm_score": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), uni AS (
  SELECT w, count(*)::BIGINT AS cu
  FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w
), vocab AS (
  SELECT count(*)::DOUBLE AS v FROM uni
), doc_big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
         unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
  FROM toks WHERE len(ws) >= 2
), bigc AS (
  SELECT w1, w2, count(*)::BIGINT AS cb FROM doc_big GROUP BY w1, w2
), terms AS (
  SELECT d.doc_id, -ln((c.cb + 1.0::DOUBLE) / (u.cu + v.v)) AS t
  FROM doc_big d
  JOIN bigc c ON d.w1 = c.w1 AND d.w2 = c.w2
  JOIN uni u ON d.w1 = u.w
  CROSS JOIN vocab v
), agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
         round(sum(t) / count(*), 6) AS nll
  FROM terms GROUP BY doc_id
)
SELECT t.doc_id, COALESCE(a.n_bigrams, 0)::BIGINT AS n_bigrams,
       COALESCE(a.nll, 0.0) AS nll
FROM toks t LEFT JOIN agg a ON t.doc_id = a.doc_id
""",
        # cross-domain twin: counts and vocabulary come from the ENGLISH
        # slice only; grams unseen there LEFT-JOIN to 0 (the smoothing
        # floor), matching the scorer's missing-fingerprint lookups
        "lm_cross_score": r"""
WITH toks_ref AS (
  SELECT list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents WHERE lang = 'en'
), uni AS (
  SELECT w, count(*)::BIGINT AS cu
  FROM (SELECT unnest(ws) AS w FROM toks_ref) GROUP BY w
), vocab AS (
  SELECT count(*)::DOUBLE AS v FROM uni
), ref_big AS (
  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
         unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
  FROM toks_ref WHERE len(ws) >= 2
), bigc AS (
  SELECT w1, w2, count(*)::BIGINT AS cb FROM ref_big GROUP BY w1, w2
), toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), doc_big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
         unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
  FROM toks WHERE len(ws) >= 2
), terms AS (
  SELECT d.doc_id,
         -ln((COALESCE(c.cb, 0) + 1.0::DOUBLE)
             / (COALESCE(u.cu, 0) + v.v)) AS t
  FROM doc_big d
  LEFT JOIN bigc c ON d.w1 = c.w1 AND d.w2 = c.w2
  LEFT JOIN uni u ON d.w1 = u.w
  CROSS JOIN vocab v
), agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
         round(sum(t) / count(*), 6) AS nll
  FROM terms GROUP BY doc_id
)
SELECT t.doc_id, COALESCE(a.n_bigrams, 0)::BIGINT AS n_bigrams,
       COALESCE(a.nll, 0.0) AS nll
FROM toks t LEFT JOIN agg a ON t.doc_id = a.doc_id
""",
        "kmeans_clusters": _kmeans_sql(iters=2, k=8, modulus=61),
        "semdedup": _semdedup_sql(iters=2, k=8, modulus=61, tau=0.4),
        "embedding_outliers": _outliers_sql(iters=2, k=8, modulus=61, z=1.5),
        # same-cluster argmin cosine, ties -> smallest neighbour key
        "hard_negatives": f"""
WITH assign AS MATERIALIZED (
  SELECT * FROM ({_kmeans_sql(iters=2, k=8, modulus=61)}) t
),
ev AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT a.vec_id, b.vec_id AS neg_key,
       round(list_cosine_similarity(ua.v, ub.v), 4) AS cos
FROM assign a
JOIN assign b ON b.cluster = a.cluster AND b.vec_id <> a.vec_id
JOIN ev ua ON ua.vec_id = a.vec_id
JOIN ev ub ON ub.vec_id = b.vec_id
QUALIFY row_number() OVER (
  PARTITION BY a.vec_id
  ORDER BY round(list_cosine_similarity(ua.v, ub.v), 4), b.vec_id) = 1
""",
        "diverse_sample": f"""
SELECT vec_id, cluster FROM ({_kmeans_sql(iters=2, k=8, modulus=61)}) t
QUALIFY row_number() OVER (PARTITION BY cluster
                           ORDER BY md5(vec_id::VARCHAR), vec_id) <= 10
""",
        # JL projection: the same md5-parity sign matrix, one sum per
        # (vector, output dim), round-6 after the exact sqrt(16)
        "random_project": """
WITH e AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sign AS MATERIALIZED (
  SELECT i, j,
         CASE WHEN ('0x' || substr(md5('jl:' || (i - 1) || ':' || (j - 1)),
                    1, 2))::UBIGINT % 2 = 0
              THEN 1.0 ELSE -1.0 END AS s
  FROM (SELECT unnest(generate_series(1, 64)) AS i),
       (SELECT unnest(generate_series(1, 16)) AS j)
),
p AS (
  SELECT e.vec_id, g.j, round(sum(e.v[g.i] * g.s) / sqrt(16.0), 6) AS y
  FROM e, LATERAL (
    SELECT i, j, s FROM sign) g
  WHERE TRUE
  GROUP BY e.vec_id, g.j
)
SELECT vec_id, list(y ORDER BY j) AS proj FROM p GROUP BY vec_id
""",
        # same round-9 sum pins as embedding_moments; 0-based dims
        "embedding_cov": """
WITH e AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), nn AS (
  SELECT count(*)::DOUBLE AS n FROM e
), s2 AS (
  SELECT gi.i AS i, gj.j AS j, round(sum(e.v[gi.i] * e.v[gj.j]), 9) AS s2
  FROM e,
       LATERAL (SELECT unnest(range(1, len(e.v) + 1)) AS i) gi,
       LATERAL (SELECT unnest(range(1, len(e.v) + 1)) AS j) gj
  GROUP BY gi.i, gj.j
), s1 AS (
  SELECT gi.i AS i, round(sum(e.v[gi.i]), 9) AS s1
  FROM e, LATERAL (SELECT unnest(range(1, len(e.v) + 1)) AS i) gi
  GROUP BY gi.i
)
SELECT s2.i - 1 AS i, s2.j - 1 AS j,
       round((s2.s2 - a.s1 * b.s1 / nn.n) / nn.n, 6) AS cov
FROM s2 JOIN s1 a ON s2.i = a.i JOIN s1 b ON s2.j = b.i CROSS JOIN nn
""",
        # same 8-word re-lining + first-two-lines re-append; dedup =
        # windowed first-occurrence rank, reassembled in ord order
        "dedup_lines": r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
  FROM documents
), l AS (
  SELECT doc_id,
         list_transform(range(0, CAST(ceil(len(ws) / 8.0) AS INT)),
                        i -> array_to_string(ws[i*8+1 : i*8+8], ' ')) AS ls
  FROM w
), m AS (
  SELECT doc_id,
         CASE WHEN len(ls) = 0 THEN ls
              ELSE ls || [ls[1],
                          CASE WHEN len(ls) >= 2 THEN ls[2] ELSE ls[1] END]
         END AS mls
  FROM l
), e AS (
  SELECT doc_id,
         unnest(range(1, len(mls) + 1)) AS ord,
         unnest(mls) AS line
  FROM m
), r AS (
  SELECT doc_id, ord, line,
         row_number() OVER (PARTITION BY doc_id, line ORDER BY ord) AS rn
  FROM e
), dd AS (
  SELECT doc_id, array_to_string(list(line ORDER BY ord), chr(10)) AS text
  FROM r WHERE rn = 1 GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(dd.text, '') AS text
FROM documents d LEFT JOIN dd ON d.doc_id = dd.doc_id
""",
        "strip_boilerplate": r"""
WITH base AS (
  SELECT doc_id,
         'site' || CAST(doc_id % 23 AS VARCHAR) || '.example.' ||
           CASE doc_id % 3 WHEN 0 THEN 'com'
                           WHEN 1 THEN 'org'
                           ELSE 'net' END AS host,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
  FROM documents
), l AS (
  SELECT doc_id, host,
         ['welcome to ' || host || ' home about contact'] ||
         list_transform(range(0, CAST(ceil(len(ws) / 8.0) AS INT)),
                        i -> array_to_string(ws[i*8+1 : i*8+8], ' ')) ||
         ['copyright ' || host || ' all rights reserved'] AS ls
  FROM base
), e AS (
  SELECT doc_id, host,
         unnest(range(1, len(ls) + 1)) AS ord,
         unnest(ls) AS line
  FROM l
), freq AS (
  SELECT host, line FROM e GROUP BY host, line
  HAVING COUNT(DISTINCT doc_id) >= 4
), kept AS (
  SELECT e.doc_id, e.ord, e.line
  FROM e LEFT JOIN freq f ON e.host = f.host AND e.line = f.line
  WHERE f.line IS NULL
), agg AS (
  SELECT doc_id, array_to_string(list(line ORDER BY ord), chr(10)) AS clean
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(a.clean, '') AS clean
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
""",
        "tier_extract": f"""
WITH q AS ({quality}), thr AS (
  SELECT quantile_disc(quality, 0.75) AS t3 FROM q)
SELECT q.doc_id, q.quality
FROM q, thr t
WHERE q.quality > t.t3
""",
        # same synth variants; ORDER BY quality DESC, doc_id == the Ray
        # side's (neg_quality, doc_id) ascending cap key
        "canonical_best": f"""
WITH q AS ({quality}), u AS (
  SELECT doc_id,
         'https://www.page' || (doc_id // 3) || '.example.com/item/'
           || (doc_id // 3) AS canonical
  FROM documents)
SELECT u.doc_id, u.canonical, q.quality
FROM u JOIN q ON u.doc_id = q.doc_id
QUALIFY row_number() OVER (PARTITION BY u.canonical
                           ORDER BY q.quality DESC, u.doc_id) = 1
""",
        # per-lang tertile thresholds over the SAME round-6 nll; bucket
        # = 1 + #thresholds strictly below (ties collapse low, matching
        # searchsorted side="left")
        "ccnet_buckets": r"""
WITH toks_ref AS (
  SELECT list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents WHERE lang = 'en'
), uni AS (
  SELECT w, count(*)::BIGINT AS cu
  FROM (SELECT unnest(ws) AS w FROM toks_ref) GROUP BY w
), vocab AS (
  SELECT count(*)::DOUBLE AS v FROM uni
), ref_big AS (
  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
         unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
  FROM toks_ref WHERE len(ws) >= 2
), bigc AS (
  SELECT w1, w2, count(*)::BIGINT AS cb FROM ref_big GROUP BY w1, w2
), toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), doc_big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
         unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
  FROM toks WHERE len(ws) >= 2
), terms AS (
  SELECT d.doc_id,
         -ln((COALESCE(c.cb, 0) + 1.0::DOUBLE)
             / (COALESCE(u.cu, 0) + v.v)) AS t
  FROM doc_big d
  LEFT JOIN bigc c ON d.w1 = c.w1 AND d.w2 = c.w2
  LEFT JOIN uni u ON d.w1 = u.w
  CROSS JOIN vocab v
), agg AS (
  SELECT doc_id, round(sum(t) / count(*), 6) AS nll
  FROM terms GROUP BY doc_id
), scored AS (
  SELECT t.doc_id, t.lang, COALESCE(a.nll, 0.0) AS nll
  FROM toks t LEFT JOIN agg a ON t.doc_id = a.doc_id
), thr AS (
  SELECT lang, quantile_disc(nll, 1.0/3) AS t1,
               quantile_disc(nll, 2.0/3) AS t2
  FROM scored GROUP BY lang
)
SELECT s.doc_id, s.lang, s.nll,
       CASE WHEN s.nll <= h.t1 THEN 1
            WHEN s.nll <= h.t2 THEN 2
            ELSE 3 END AS bucket
FROM scored s JOIN thr h ON s.lang = h.lang
""",
        "tfidf_terms": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), n AS (
  SELECT count(*)::DOUBLE + 1.0 AS nd FROM documents
), t AS (
  SELECT doc_id, unnest(ws) AS w FROM toks
), tf AS (
  SELECT doc_id, w, count(*)::BIGINT AS tf FROM t GROUP BY doc_id, w
), df AS (
  SELECT w, count(DISTINCT doc_id)::BIGINT AS df FROM t GROUP BY w
), scored AS (
  SELECT tf.doc_id, tf.w AS term,
         tf.tf * ln(n.nd / (df.df + 1.0::DOUBLE)) AS s
  FROM tf JOIN df USING (w) CROSS JOIN n
)
SELECT doc_id, term, round(s, 6) AS score,
       row_number() OVER (PARTITION BY doc_id
                          ORDER BY s DESC, term) AS rank
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY s DESC, term) <= 3
""",
        "dsir_weights": r"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), grams AS (
  SELECT doc_id, lang, unnest(ws) AS g FROM toks
  UNION ALL
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i + 1])) AS g
  FROM toks WHERE len(ws) >= 2
), bkts AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(g), 1, 8)) AS UBIGINT) % 4096 AS bkt
  FROM grams
), src AS (
  SELECT bkt, count(*)::BIGINT AS n FROM bkts GROUP BY bkt
), tgt AS (
  SELECT bkt, count(*)::BIGINT AS n FROM bkts WHERE lang = 'en' GROUP BY bkt
), tot AS (
  SELECT (SELECT count(*) FROM bkts)::DOUBLE + 4096 AS s,
         (SELECT count(*) FROM bkts WHERE lang = 'en')::DOUBLE + 4096 AS t
), terms AS (
  SELECT b.doc_id,
         ln((COALESCE(tg.n, 0) + 1.0::DOUBLE) / tot.t)
         - ln((COALESCE(sr.n, 0) + 1.0::DOUBLE) / tot.s) AS term
  FROM bkts b
  LEFT JOIN tgt tg USING (bkt)
  LEFT JOIN src sr USING (bkt)
  CROSS JOIN tot
), agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_grams,
         round(sum(term), 6) AS log_w
  FROM terms GROUP BY doc_id
)
SELECT t.doc_id, COALESCE(a.n_grams, 0)::BIGINT AS n_grams,
       COALESCE(a.log_w, 0.0) AS log_w
FROM toks t LEFT JOIN agg a ON t.doc_id = a.doc_id
""",
        "pack_sequences": r"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\s+'),
                         w -> w <> '')) AS n
  FROM documents
), c AS (
  SELECT doc_id, n,
         CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS BIGINT)
           AS start_tok
  FROM t
), spans AS (
  SELECT doc_id, start_tok, start_tok + n AS end_tok
  FROM c WHERE n > 0
), seqs AS (
  SELECT doc_id, start_tok, end_tok,
         start_tok // 256 AS first_seq,
         (end_tok - 1) // 256 AS last_seq
  FROM spans
), exploded AS (
  SELECT doc_id, start_tok, end_tok,
         unnest(range(first_seq, last_seq + 1)) AS seq_id
  FROM seqs
)
SELECT seq_id,
       count(*)::BIGINT AS n_docs,
       CAST(sum(LEAST(end_tok, (seq_id + 1) * 256)
                - GREATEST(start_tok, seq_id * 256)) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM exploded
GROUP BY seq_id
""",
        "bm25_multi": _bm25_multi_sql(_BM25_MULTI_QUERIES, 10),
        "bm25_search": _BM25_SCORED + """
SELECT doc_id, round(score, 4) AS score
FROM scored
ORDER BY score DESC, doc_id
LIMIT 20
""",
        # RRF hybrid: ranks over the raw-score orderings the bm25/ann
        # oracles already pin; fused score is a pure function of the
        # integer ranks (no cross-engine float mixing)
        "hybrid_search": _BM25_SCORED + """
, cand AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS r_b
  FROM scored
  ORDER BY score DESC, doc_id
  LIMIT 50
), cos AS (
  SELECT c.doc_id, c.r_b,
         list_cosine_similarity(e.embedding::DOUBLE[],
           (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0))
           AS cs
  FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id
), ranked AS (
  SELECT doc_id, r_b,
         row_number() OVER (ORDER BY cs DESC, doc_id) AS r_c
  FROM cos
)
SELECT doc_id, r_b AS rank_bm25, r_c AS rank_cos,
       round(1.0 / (60 + r_b) + 1.0 / (60 + r_c), 6) AS rrf
FROM ranked
ORDER BY (1.0 / (60 + r_b) + 1.0 / (60 + r_c)) DESC, doc_id
LIMIT 20
""",
        "cluster_assign": """
WITH seeds AS (
  SELECT vec_id AS seed_id, embedding FROM embeddings
  WHERE vec_id % 61 = 0 ORDER BY vec_id LIMIT 8
), scored AS (
  SELECT e.vec_id, s.seed_id,
         list_cosine_similarity(e.embedding::DOUBLE[],
                                s.embedding::DOUBLE[]) AS sim
  FROM embeddings e CROSS JOIN seeds s
), best AS (
  SELECT vec_id, seed_id, sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, seed_id) AS rn
  FROM scored
)
SELECT vec_id, seed_id AS cluster_id, round(sim, 4) AS sim
FROM best WHERE rn = 1
""",
        # full-probe IVF == brute force by construction → same oracle
        "ann_ivf_full": """
SELECT vec_id,
       round(list_cosine_similarity(embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4)
         AS score
FROM embeddings
ORDER BY list_cosine_similarity(embedding::DOUBLE[],
         (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) DESC,
         vec_id
LIMIT 10
""",
        "lang_counts": "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
        "token_stats": """
SELECT doc_id,
       len(string_split_regex(text, '\\s+')) AS n_tokens,
       length(text) AS n_chars
FROM documents
""",
        "quality_stats": quality,
        # tier = 1 + #thresholds strictly below the score; thresholds are
        # quantile_disc quartiles of the SAME rounded score expression
        "quality_tiers": f"""
WITH q AS ({quality}), thr AS (
  SELECT quantile_disc(quality, 0.25) AS t1,
         quantile_disc(quality, 0.5)  AS t2,
         quantile_disc(quality, 0.75) AS t3
  FROM q)
SELECT q.doc_id, q.quality,
       CASE WHEN q.quality <= t.t1 THEN 1
            WHEN q.quality <= t.t2 THEN 2
            WHEN q.quality <= t.t3 THEN 3
            ELSE 4 END AS tier
FROM q, thr t
""",
        # domain-level gate: per-host mean size (exact-int division,
        # same formulation as host_stats), quartile tiers over the host
        # means, corpus filtered to top-tier hosts
        "host_tier_filter": """
WITH d AS (
  SELECT doc_id,
         'site' || (doc_id % 23) || '.example.' ||
         CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
              ELSE 'net' END AS host,
         n_chars
  FROM documents
), hm AS (
  SELECT host,
         round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS m
  FROM d GROUP BY host
), thr AS (
  SELECT quantile_disc(m, 0.25) AS t1,
         quantile_disc(m, 0.5)  AS t2,
         quantile_disc(m, 0.75) AS t3
  FROM hm
), top AS (
  SELECT host FROM hm, thr WHERE m > t3
)
SELECT d.doc_id, d.host FROM d JOIN top USING (host)
""",
        # md5 content equality == text equality (collision-free oracle)
        "dedup_incremental": """
SELECT d.doc_id, d.lang
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM documents o
                  WHERE o.doc_id % 3 = 0 AND o.text = d.text)
""",
        "dedup_incremental_bloom": """
SELECT d.doc_id, d.lang
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM documents o
                  WHERE o.doc_id % 3 = 0 AND o.text = d.text)
""",
        # ExactSubstr-style duplicate-window spans: 8-word windows with
        # >= 2 corpus occurrences, merged gaps-and-islands per doc (the
        # previous window's end IS the running max because width is
        # fixed). Tokenization parity: list_filter of a \s+ split ==
        # Python str.split().
        "dup_spans": _DUPSPAN_BASE + """
SELECT doc_id,
       row_number() OVER (PARTITION BY doc_id ORDER BY min(start_w))
         AS span_no,
       min(start_w) AS start_word,
       max(end_w) AS end_word,
       max(end_w) - min(start_w) + 1 AS n_words
FROM grp GROUP BY doc_id, g
""",
        # incremental variant: same islands chain over windows of NEW
        # docs (doc_id % 3 <> 0) seen anywhere in the archive third
        "dup_spans_against": _DUPSPAN_AGAINST_BASE + """
SELECT doc_id,
       row_number() OVER (PARTITION BY doc_id ORDER BY min(start_w))
         AS span_no,
       min(start_w) AS start_word,
       max(end_w) AS end_word,
       max(end_w) - min(start_w) + 1 AS n_words
FROM grp GROUP BY doc_id, g
""",
        # graded coverage twin of dup_spans_against: positional window
        # hit count / total windows per NEW doc (string-window equality
        # in SQL ↔ 64-bit window fps in the engine, the span-family
        # convention); short/empty docs → 0 windows → 0.0
        "ngram_coverage": _DUPSPAN_TOKS + """, seen AS (
  SELECT DISTINCT win FROM wins WHERE doc_id % 3 = 0
), hits AS (
  SELECT w.doc_id, count(*)::BIGINT AS n_seen
  FROM wins w JOIN seen USING (win)
  WHERE w.doc_id % 3 <> 0 GROUP BY w.doc_id
), tot AS (
  SELECT doc_id, greatest(n - 8 + 1, 0) AS n_windows
  FROM n_t WHERE doc_id % 3 <> 0
)
SELECT t.doc_id, CAST(t.n_windows AS BIGINT) AS n_windows,
       COALESCE(h.n_seen, 0)::BIGINT AS n_seen,
       CASE WHEN t.n_windows > 0
            THEN round(COALESCE(h.n_seen, 0)::DOUBLE / t.n_windows, 6)
            ELSE 0.0 END AS coverage_frac
FROM tot t LEFT JOIN hits h USING (doc_id)
""",
        "dup_span_strip": _DUPSPAN_BASE + """
, cov AS (
  SELECT DISTINCT m.doc_id, j.j AS pos
  FROM marked m,
       LATERAL (SELECT unnest(generate_series(m.start_w, m.end_w)) AS j) j
), wpos AS (
  SELECT doc_id, i + 1 AS pos, toks[i + 1] AS wrd
  FROM n_t, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) g
)
SELECT d.doc_id,
       coalesce(string_agg(CASE WHEN c.pos IS NULL THEN w.wrd END,
                           ' ' ORDER BY w.pos), '') AS text,
       count(c.pos)::BIGINT AS n_removed
FROM documents d
LEFT JOIN wpos w ON w.doc_id = d.doc_id
LEFT JOIN cov c ON c.doc_id = w.doc_id AND c.pos = w.pos
GROUP BY d.doc_id
""",
        # Gopher-style repetition fractions: list-function reconstruction
        # of functions/repetition.py (ASCII whitespace classes on both
        # sides by construction — RE2 \s is ASCII-only)
        "repetition_stats": _REPETITION_BASE + """
SELECT doc_id, n_lines, n_words, dup_line_frac, dup_para_frac,
       top_word_frac, bullet_line_frac, ellipsis_line_frac
FROM rep
""",
        "quality_filter": _REPETITION_BASE + """
SELECT doc_id, dup_line_frac, top_word_frac
FROM rep
WHERE dup_line_frac <= 0.30 AND dup_para_frac <= 0.30
  AND top_word_frac <= 0.20 AND bullet_line_frac <= 0.90
  AND ellipsis_line_frac <= 0.30
""",
        "asof_last_purchase": """
SELECT event_id, user_id, ts,
  max(CASE WHEN event_type = 'purchase' THEN ts END)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS last_purchase_ts
FROM events
""",
        "events_window_sliding": """
WITH e AS (
  SELECT user_id,
         (epoch_us(ts) // 900000000 - k.k) * 900000000 AS win_start,
         value
  FROM events, (SELECT unnest(range(4)) AS k) k
)
SELECT user_id, win_start, count(*)::BIGINT AS n,
       round(sum(value), 4) AS sum_value
FROM e GROUP BY user_id, win_start
""",
        "sessionize": """
SELECT event_id, user_id, ts,
  (sum(CASE WHEN prev_ts IS NULL
            OR epoch_us(ts - prev_ts) > 1800 * 1000000
            THEN 1 ELSE 0 END)
     OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)::BIGINT
    AS session_idx
FROM (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
""",
        "top_k_per_lang": """
SELECT lang, doc_id, n_chars, rank FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents)
WHERE rank <= 5
""",
        "running_totals": """
SELECT event_id, user_id, ts,
  row_number() OVER w AS row_idx,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
    AS run_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
""",
        "rolling_stats": """
SELECT event_id, user_id, ts,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
    AS roll_cents,
  CAST(count(*) OVER w AS BIGINT) AS n_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
        "rolling_time": """
SELECT event_id, user_id, ts,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
    AS roll_cents,
  CAST(count(*) OVER w AS BIGINT) AS n_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
        "range_join": """
SELECT o1.o_orderkey,
       count(o2.o_orderkey)::BIGINT AS n_nearby,
       CAST(coalesce(sum(CAST(round(o2.o_totalprice * 100) AS BIGINT)), 0)
            AS BIGINT) AS nearby_cents
FROM orders o1 LEFT JOIN orders o2
  ON o1.o_custkey = o2.o_custkey AND o2.o_orderkey <> o1.o_orderkey
 AND o2.o_orderdate BETWEEN o1.o_orderdate - INTERVAL 90 DAY
                        AND o1.o_orderdate + INTERVAL 90 DAY
GROUP BY o1.o_orderkey
""",
        "hash_split": """
SELECT doc_id, lang,
  CASE WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100 < 10
       THEN 'test' ELSE 'train' END AS split
FROM documents
""",
        "cap_per_lang": """
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY doc_id) <= 50
""",
        "sample_per_lang": """
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY md5(doc_id::VARCHAR)) <= 30
""",
        "resample_mix": """
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY md5(doc_id::VARCHAR))
        <= CASE lang WHEN 'en' THEN 100 WHEN 'zh' THEN 40
                     WHEN 'es' THEN 40 WHEN 'de' THEN 80 ELSE 0 END
""",
        "corpus_sample": """
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (ORDER BY md5(doc_id::VARCHAR)) <= 100
""",
        # temperature mixing: quotas derived in-SQL from the language
        # histogram with the SAME sqrt/round-9/floor rule as
        # textstats.temperature_sample (sqrt is IEEE-correctly-rounded
        # on both engines; round-9 absorbs denominator summation-order
        # ulp noise before the floor)
        "temperature_mix": """
WITH g AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
den AS (SELECT sum(sqrt(n::DOUBLE)) AS d FROM g),
q AS (SELECT lang,
        CAST(floor(round(300 * sqrt(n::DOUBLE) / d, 9)) AS BIGINT) AS quota
      FROM g, den)
SELECT doc_id, lang FROM documents JOIN q USING (lang)
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY md5(doc_id::VARCHAR)) <= quota
""",
        "mode_source": """
WITH c AS (SELECT lang, source, count(*) AS n
           FROM documents GROUP BY lang, source)
SELECT lang, source AS mode_source, n FROM c
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY n DESC, source ASC) = 1
""",
        # full HLL replica: same md5-prefix hash, integer rho via
        # bin()-length, same alpha/linear-counting estimator, round-6
        "hll_distinct": """
WITH v AS (
  SELECT DISTINCT lang, n_chars::VARCHAR AS s FROM documents
), h AS (
  SELECT lang, ('0x' || substr(md5(s), 1, 16))::UBIGINT AS h FROM v
), b AS (
  SELECT lang, CAST(h >> 52 AS BIGINT) AS bucket,
         CAST(h & ((1::UBIGINT << 52) - 1) AS BIGINT) AS rem
  FROM h
), r AS (
  SELECT lang, bucket,
         max(CASE WHEN rem = 0 THEN 53 ELSE 53 - length(bin(rem)) END) AS rho
  FROM b GROUP BY lang, bucket
), agg AS (
  SELECT lang,
         sum(pow(2.0, -rho)) AS s_present,
         count(*)::BIGINT AS n_present
  FROM r GROUP BY lang
), est AS (
  SELECT lang,
         (0.7213 / (1.0 + 1.079 / 4096)) * 4096 * 4096
           / (s_present + (4096 - n_present) * 1.0) AS e_raw,
         4096 - n_present AS zeros
  FROM agg
)
SELECT lang,
       round(CASE WHEN e_raw <= 2.5 * 4096 AND zeros > 0
                  THEN 4096 * ln(4096.0 / zeros) ELSE e_raw END, 6)
         AS approx_distinct
FROM est
""",
        "snapshot_overlap": f"""
WITH a AS (SELECT 'u' || doc_id AS v FROM documents),
b AS (SELECT 'u' || doc_id AS v FROM documents WHERE doc_id % 10 <> 0
      UNION ALL
      SELECT 'new' || doc_id AS v FROM documents WHERE doc_id % 7 = 0),
u AS (SELECT v FROM a UNION ALL SELECT v FROM b),
e AS (SELECT {_hll_est_sql('a')} AS ea,
             {_hll_est_sql('b')} AS eb,
             {_hll_est_sql('u')} AS eu)
SELECT ea AS n_a, eb AS n_b, eu AS n_union,
       round(ea + eb - eu, 6) AS n_overlap
FROM e
""",
        "char_entropy": """
WITH c AS (
  SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
                        i -> substring(text, CAST(i AS INTEGER), 1))) AS ch
  FROM documents
), cnt AS (
  SELECT doc_id, ch, count(*)::DOUBLE AS c FROM c GROUP BY doc_id, ch
), n AS (
  SELECT doc_id, sum(c) AS n FROM cnt GROUP BY doc_id
), h AS (
  SELECT cnt.doc_id, round(-sum((c / n.n) * ln(c / n.n)), 6) AS entropy
  FROM cnt JOIN n USING (doc_id) GROUP BY cnt.doc_id
)
SELECT d.doc_id, COALESCE(h.entropy, 0.0) AS entropy,
       CAST(length(d.text) AS BIGINT) AS n_chars_text
FROM documents d LEFT JOIN h USING (doc_id)
""",
        # positions are RAW whitespace-split ordinals (boundary empties
        # keep their index then drop) — the same coordinate system the
        # positional index stores
        "phrase_search": r"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '[ \t\r\n\f]+') AS ws
  FROM documents
), p AS (
  SELECT doc_id, unnest(ws) AS w,
         generate_subscripts(ws, 1) - 1 AS pos
  FROM t
), tok AS (
  SELECT doc_id, w, pos FROM p WHERE w <> ''
), hits AS (
  SELECT a.doc_id
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
  WHERE a.w = 'batch' AND b.w = 'batch' AND c.w = 'stream'
)
SELECT doc_id, count(*)::BIGINT AS n_occurrences
FROM hits GROUP BY doc_id
""",
        "term_lookup": r"""
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\s+'),
                            w -> w <> '')) AS term
  FROM documents
)
SELECT term, doc_id, count(*)::BIGINT AS tf FROM t
WHERE term IN ('the', 'der', 'data') GROUP BY term, doc_id
""",
        # merged+compacted incremental index == from-scratch postings
        # over the FULL corpus
        "index_merge": r"""
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\s+'),
                            w -> w <> '')) AS term
  FROM documents
)
SELECT term, doc_id, count(*)::BIGINT AS tf FROM t
WHERE term IN ('the', 'der', 'data') GROUP BY term, doc_id
""",
        # multinomial NB: identical add-one-smoothed score formula,
        # round-6 before the argmax, min-label tiebreak
        "nb_lang_classify": _NB_LANG_SQL,
        "oov_rate": """
WITH aug AS MATERIALIZED (
  SELECT doc_id,
         text || CASE WHEN doc_id % 17 = 0
                      THEN ' xq' || doc_id || 'tok' ELSE '' END AS text
  FROM documents
), dw AS MATERIALIZED (
  SELECT doc_id, word FROM (
    SELECT doc_id,
           UNNEST(regexp_split_to_array(text, '[ \t\n\r\f\v]+')) AS word
    FROM aug)
  WHERE word <> ''
), wc AS MATERIALIZED (
  SELECT word FROM dw GROUP BY word HAVING count(*) >= 2
)
SELECT d.doc_id, count(dw.word)::BIGINT AS n_tokens,
       CASE WHEN count(dw.word) = 0 THEN 0.0
            ELSE round(sum(CASE WHEN wc.word IS NULL THEN 1
                           ELSE 0 END)::DOUBLE / count(dw.word), 6)
       END AS oov_frac
FROM aug d
LEFT JOIN dw ON dw.doc_id = d.doc_id
LEFT JOIN wc ON wc.word = dw.word
GROUP BY d.doc_id
""",
        "len_deciles": """
WITH th AS MATERIALIZED (
  SELECT quantile_disc(n_chars,
           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS ts
  FROM documents
), b AS (
  SELECT d.n_chars,
         len(list_filter(th.ts, t -> t < d.n_chars))::BIGINT AS bucket
  FROM documents d CROSS JOIN th
)
SELECT bucket, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS sum_v
FROM b GROUP BY bucket
""",
        "lang_confusion": f"""
SELECT d.lang, p.pred, count(*)::BIGINT AS n
FROM documents d JOIN ({_NB_LANG_SQL}) p USING (doc_id)
GROUP BY 1, 2
""",
        # adjacent char pairs, whitespace never pairs; binary UTF-8
        # collation on the 2-char pair == codepoint order == the packed
        # int64 order the Ray plan sorts by
        "bpe_pairs": r"""
WITH p AS (
  SELECT unnest(list_transform(range(1, length(text)),
                i -> substring(text, CAST(i AS INTEGER), 2))) AS pair
  FROM documents
)
SELECT pair, CAST(count(*) AS BIGINT) AS n FROM p
WHERE NOT regexp_matches(pair, '[ \t\r\n\f\v]|\x00')
GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT 20
""",
        "bpe_train": _bpe_train_sql(num_merges=8, min_word_len=2),
        "bpe_encode": _bpe_encode_sql(num_merges=8, min_word_len=2),
        # replace-length substring counting shares count_substring's
        # non-overlapping convention
        # winnowing via a ROWS-window min; df<=20 prune; doc pairs by
        # shared-fp count
        "plagiarism_pairs": """
WITH aug AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
), t AS MATERIALIZED (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM aug
), n_t AS (
  SELECT doc_id, toks, len(toks) AS n FROM t
), h AS MATERIALIZED (
  SELECT doc_id, i,
         ('0x' || substr(md5(array_to_string(toks[(i + 1):(i + 5)], ' ')),
                         9, 8))::BIGINT AS hv
  FROM n_t, LATERAL (SELECT unnest(generate_series(0, n - 5)) AS i) g
), wm AS MATERIALIZED (
  SELECT doc_id, i, nh,
         min(hv) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
  FROM (SELECT doc_id, i, hv,
               count(*) OVER (PARTITION BY doc_id) AS nh FROM h)
), fps AS MATERIALIZED (
  SELECT DISTINCT doc_id, m AS fp FROM wm
  WHERE (nh > 4 AND i <= nh - 4) OR (nh <= 4 AND i = 0)
), df AS MATERIALIZED (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 20
), fk AS MATERIALIZED (
  SELECT f.doc_id, f.fp FROM fps f JOIN df USING (fp)
)
SELECT a.doc_id AS a, b.doc_id AS b, count(*)::BIGINT AS shared
FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 3
""",
        "containment_pairs": """
WITH aug0 AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
), aug AS MATERIALIZED (
  SELECT doc_id, text FROM aug0
  UNION ALL
  SELECT doc_id + 3000000,
         array_to_string((string_split_regex(text, '\\s+'))[1:25], ' ')
  FROM aug0 WHERE doc_id % 19 = 0
), t AS MATERIALIZED (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM aug
), n_t AS (
  SELECT doc_id, toks, len(toks) AS n FROM t
), h AS MATERIALIZED (
  SELECT doc_id, i,
         ('0x' || substr(md5(array_to_string(toks[(i + 1):(i + 5)], ' ')),
                         9, 8))::BIGINT AS hv
  FROM n_t, LATERAL (SELECT unnest(generate_series(0, n - 5)) AS i) g
), wm AS MATERIALIZED (
  SELECT doc_id, i, nh,
         min(hv) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
  FROM (SELECT doc_id, i, hv,
               count(*) OVER (PARTITION BY doc_id) AS nh FROM h)
), fps AS MATERIALIZED (
  SELECT DISTINCT doc_id, m AS fp FROM wm
  WHERE (nh > 4 AND i <= nh - 4) OR (nh <= 4 AND i = 0)
), df AS MATERIALIZED (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 20
), fk AS MATERIALIZED (
  SELECT f.doc_id, f.fp FROM fps f JOIN df USING (fp)
), pr AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*)::BIGINT AS shared
  FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), cnts AS MATERIALIZED (
  SELECT doc_id, count(*)::BIGINT AS n_fp FROM fps GROUP BY doc_id
), mir AS (
  SELECT a, b, shared FROM pr
  UNION ALL SELECT b AS a, a AS b, shared FROM pr
)
SELECT bo.a, bo.b, bo.shared,
       round(bo.shared::DOUBLE / greatest(c.n_fp, 1), 6) AS containment
FROM mir bo JOIN cnts c ON c.doc_id = bo.a
WHERE round(bo.shared::DOUBLE / greatest(c.n_fp, 1), 6) >= 0.5
""",
        "dedup_canonical": """
WITH aug AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, replace(upper(text), ' ', '  ')
  FROM documents WHERE doc_id % 13 = 0
), canon AS MATERIALIZED (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '\\d+', '0', 'g'),
                             '[ \t\r\n\f\v]+', ' ', 'g')) AS c
  FROM aug
)
SELECT doc_id FROM canon
QUALIFY row_number() OVER (PARTITION BY md5(c) ORDER BY doc_id) = 1
""",
        "cdf_against": """
WITH ref AS MATERIALIZED (
  SELECT n_chars FROM documents WHERE doc_id % 3 = 0
), nn AS (SELECT count(*)::BIGINT AS n FROM ref),
new_side AS (
  SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 <> 0
)
SELECT d.doc_id, d.n_chars,
       round((SELECT count(*) FROM ref r WHERE r.n_chars < d.n_chars)
             ::DOUBLE / nn.n, 6) AS cdf
FROM new_side d, nn
""",
        "collapse_lines": r"""
WITH d AS (
  SELECT doc_id, replace(text, ' ', chr(10)) AS t FROM documents
), ls AS (
  SELECT doc_id, string_split(t, chr(10)) AS l FROM d
), pos AS (
  SELECT doc_id, i, l[i] AS line,
         (i = 1 OR l[i] <> l[i - 1]) AS keep
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM ls)
)
SELECT doc_id,
       COALESCE(array_to_string(list(line ORDER BY i) FILTER (WHERE keep),
                                chr(10)), '') AS cleaned,
       (count(*) - count(*) FILTER (WHERE keep))::BIGINT AS n_removed
FROM pos GROUP BY doc_id
""",
        "grouped_corr": r"""
WITH t AS (
  SELECT lang, n_chars::BIGINT AS x,
         len(list_filter(string_split_regex(text, '[ 	
]+'),
                         w -> w <> ''))::BIGINT AS y
  FROM documents
), m AS (
  SELECT lang, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
         sum(y * y)::BIGINT AS syy, sum(x * y)::BIGINT AS sxy
  FROM t GROUP BY lang
)
SELECT lang, n,
  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
       THEN round((n * sxy - sx * sy)::DOUBLE
                  / sqrt(((n * sxx - sx * sx)::DOUBLE)
                         * ((n * syy - sy * sy)::DOUBLE)), 6)
       ELSE NULL END AS corr
FROM m
""",
        # same integer moments, closed-form OLS finish; intercept uses
        # the unrounded slope on both sides (identical doubles from
        # identical ints), each coefficient rounded once at the end
        "linear_fit": r"""
WITH t AS (
  SELECT lang, n_chars::BIGINT AS x,
         len(list_filter(string_split_regex(text, '[ \t\n]+'),
                         w -> w <> ''))::BIGINT AS y
  FROM documents
), m AS (
  SELECT lang, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy, sum(x * x)::BIGINT AS sxx,
         sum(x * y)::BIGINT AS sxy
  FROM t GROUP BY lang
)
SELECT lang, n,
  CASE WHEN (n * sxx - sx * sx) > 0
       THEN round((n * sxy - sx * sy)::DOUBLE
                  / (n * sxx - sx * sx)::DOUBLE, 6)
       ELSE NULL END AS slope,
  CASE WHEN (n * sxx - sx * sx) > 0
       THEN round((sy - ((n * sxy - sx * sy)::DOUBLE
                         / (n * sxx - sx * sx)::DOUBLE) * sx) / n, 6)
       ELSE NULL END AS intercept
FROM m
""",
        "profile_table": """
SELECT 'doc_id' AS column, count(*)::BIGINT AS n, (count(*) - count(doc_id))::BIGINT AS nulls, count(DISTINCT doc_id)::BIGINT AS n_distinct, CAST(min(doc_id) AS VARCHAR) AS min_s, CAST(max(doc_id) AS VARCHAR) AS max_s FROM documents
UNION ALL SELECT 'text' AS column, count(*)::BIGINT AS n, (count(*) - count(text))::BIGINT AS nulls, count(DISTINCT text)::BIGINT AS n_distinct, CAST(min(text) AS VARCHAR) AS min_s, CAST(max(text) AS VARCHAR) AS max_s FROM documents
UNION ALL SELECT 'lang' AS column, count(*)::BIGINT AS n, (count(*) - count(lang))::BIGINT AS nulls, count(DISTINCT lang)::BIGINT AS n_distinct, CAST(min(lang) AS VARCHAR) AS min_s, CAST(max(lang) AS VARCHAR) AS max_s FROM documents
UNION ALL SELECT 'source' AS column, count(*)::BIGINT AS n, (count(*) - count(source))::BIGINT AS nulls, count(DISTINCT source)::BIGINT AS n_distinct, CAST(min(source) AS VARCHAR) AS min_s, CAST(max(source) AS VARCHAR) AS max_s FROM documents
UNION ALL SELECT 'n_chars' AS column, count(*)::BIGINT AS n, (count(*) - count(n_chars))::BIGINT AS nulls, count(DISTINCT n_chars)::BIGINT AS n_distinct, CAST(min(n_chars) AS VARCHAR) AS min_s, CAST(max(n_chars) AS VARCHAR) AS max_s FROM documents
""",
        "curate_full": """
WITH aug AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, replace(upper(text), ' ', '  ')
  FROM documents WHERE doc_id % 13 = 0
), canon AS MATERIALIZED (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text), '\\d+', '0', 'g'),
                             '[ \t\r\n\f\v]+', ' ', 'g')) AS c
  FROM aug
), kept AS MATERIALIZED (
  SELECT doc_id, text FROM canon
  QUALIFY row_number() OVER (PARTITION BY md5(c) ORDER BY doc_id) = 1
), gated AS MATERIALIZED (
  SELECT doc_id FROM kept
  WHERE length(text) > 0
    AND round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
              / length(text), 6) >= 0.5
), ranked AS MATERIALIZED (
  SELECT doc_id,
         row_number() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id) - 1
           AS rank
  FROM gated
)
SELECT doc_id, rank FROM ranked WHERE rank % 2 = 0
""",
        "epoch_order": """
SELECT doc_id,
       row_number() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id) - 1
         AS rank
FROM documents
""",
        "script_stats": """
SELECT doc_id, length(text)::BIGINT AS len_cp,
       CASE WHEN length(text) = 0 THEN 0.0 ELSE round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text), 6) END AS latin_frac,
       CASE WHEN length(text) = 0 THEN 0.0 ELSE round(length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / length(text), 6) END AS digit_frac,
       CASE WHEN length(text) = 0 THEN 0.0 ELSE round(length(regexp_replace(text, '[^' || chr(1024) || '-' || chr(1279) || ']', '', 'g'))::DOUBLE / length(text), 6) END AS cyrillic_frac,
       CASE WHEN length(text) = 0 THEN 0.0 ELSE round(length(regexp_replace(text, '[^' || chr(19968) || '-' || chr(40959) || ']', '', 'g'))::DOUBLE / length(text), 6) END AS han_frac,
       CASE WHEN length(text) = 0 THEN 0.0 ELSE round(length(regexp_replace(text, '[^' || chr(1536) || '-' || chr(1791) || ']', '', 'g'))::DOUBLE / length(text), 6) END AS arabic_frac
FROM documents
""",
        "keyword_tag": """
WITH topics AS (
  SELECT * FROM (VALUES
    ('storage', ['table', 'row', 'column', 'parquet']),
    ('exec',    ['scan', 'sort', 'merge', 'hash']),
    ('perf',    ['fast', 'slow', 'big', 'small'])
  ) t(topic, kws)
), hits AS (
  SELECT d.doc_id, t.topic,
         (SELECT sum((length(d.text) - length(replace(d.text, kw, '')))
                     / length(kw))
          FROM unnest(t.kws) AS u(kw))::BIGINT AS hits
  FROM documents d CROSS JOIN topics t
)
SELECT doc_id, topic, hits FROM hits WHERE hits > 0
""",
        "top_pmi": r"""
WITH words AS MATERIALIZED (
  SELECT list_filter(regexp_split_to_array(text, '[ \t\r\n\f]+'),
                     w -> w <> '') AS ws
  FROM documents
), ev AS MATERIALIZED (
  SELECT CASE WHEN ws[i] <= ws[i + d] THEN ws[i] ELSE ws[i + d] END AS a,
         CASE WHEN ws[i] <= ws[i + d] THEN ws[i + d] ELSE ws[i] END AS b
  FROM (SELECT ws, unnest(generate_series(1, 2)) AS d FROM words) wd,
       LATERAL (SELECT unnest(generate_series(1, len(ws) - d)) AS i) g
), tot AS MATERIALIZED (
  SELECT (SELECT sum(len(ws)) FROM words)::DOUBLE AS n_tok,
         (SELECT count(*) FROM ev)::DOUBLE AS n_ev
), uni AS MATERIALIZED (
  SELECT w AS term, count(*)::BIGINT AS cu
  FROM (SELECT unnest(ws) AS w FROM words) GROUP BY w
), pr AS MATERIALIZED (
  SELECT a, b, count(*)::BIGINT AS n FROM ev GROUP BY a, b
  HAVING count(*) >= 5
)
SELECT p.a, p.b, p.n,
       round(ln((p.n::DOUBLE * t.n_tok * t.n_tok)
                / (t.n_ev * ua.cu * ub.cu)), 6) AS pmi
FROM pr p
JOIN uni ua ON ua.term = p.a
JOIN uni ub ON ub.term = p.b
CROSS JOIN tot t
ORDER BY pmi DESC, a, b
LIMIT 20
""",
        "url_blocklist": """
WITH h AS (
  SELECT doc_id,
    (CASE doc_id % 5 WHEN 0 THEN 'cdn.img.' WHEN 1 THEN 'www.' ELSE '' END)
    || 'site' || (doc_id % 23) || '.example.'
    || (CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END)
      AS host
  FROM documents
), parts AS (
  SELECT doc_id, host, string_split(host, '.') AS p FROM h
), suf AS (
  SELECT doc_id, unnest(list_transform(range(1, len(p) + 1),
           i -> array_to_string(p[CAST(i AS INTEGER):], '.'))) AS suffix
  FROM parts
), bad AS (
  SELECT DISTINCT doc_id FROM suf
  WHERE suffix IN ('site5.example.com', 'site11.example.org', 'example.net')
)
SELECT doc_id, host FROM h
WHERE doc_id NOT IN (SELECT doc_id FROM bad)
""",
        # hash-Gumbel weighted sample: identical score expression on
        # both sides (round-then-rank), ties by ascending doc_id
        "weighted_sample": r"""
SELECT doc_id, lang, sample_score FROM (
  SELECT doc_id, lang,
         round(ln(1 + n_chars)
               - ln(-ln((CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))
                              AS UBIGINT) + 0.5) / 4294967296.0)),
               6) AS sample_score
  FROM documents)
ORDER BY sample_score DESC, doc_id
LIMIT 150
""",
        "weighted_sample_per_lang": r"""
SELECT doc_id, lang, sample_score FROM (
  SELECT doc_id, lang,
         round(ln(1 + n_chars)
               - ln(-ln((CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))
                              AS UBIGINT) + 0.5) / 4294967296.0)),
               6) AS sample_score
  FROM documents)
QUALIFY row_number() OVER (PARTITION BY lang
                           ORDER BY sample_score DESC, doc_id) <= 30
""",
        # greedy token fill: keep while the PRECEDING cumulative token
        # count is under the group budget (crossing doc kept)
        "token_budget_mix": r"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         len(list_filter(string_split_regex(text, '\s+'), w -> w <> ''))
           AS tok,
         sum(len(list_filter(string_split_regex(text, '\s+'),
                             w -> w <> '')))
           OVER (PARTITION BY lang
                 ORDER BY md5(doc_id::VARCHAR), doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents)
WHERE cum - tok < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000
                            WHEN 'es' THEN 10000 WHEN 'zh' THEN 1500
                            ELSE 0 END
""",
        "quantiles_len": """
SELECT lang, 0.25 AS q,
       round(quantile_disc(n_chars, 0.25)::DOUBLE, 6) AS quantile
FROM documents GROUP BY lang
UNION ALL
SELECT lang, 0.5 AS q,
       round(quantile_disc(n_chars, 0.5)::DOUBLE, 6) AS quantile
FROM documents GROUP BY lang
UNION ALL
SELECT lang, 0.75 AS q,
       round(quantile_disc(n_chars, 0.75)::DOUBLE, 6) AS quantile
FROM documents GROUP BY lang
""",
        "distinct_lengths": """
SELECT lang, CAST(count(DISTINCT n_chars) AS BIGINT) AS n_distinct
FROM documents GROUP BY lang
""",
        # chain components == per-nation min suppkey, no closure needed
        "supplier_components": """
SELECT s_suppkey,
       CAST(min(s_suppkey) OVER (PARTITION BY s_nationkey) AS BIGINT)
         AS cluster
FROM supplier
""",
        "percent_rank_len": """
SELECT doc_id, lang, n_chars,
       round(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars),
             9) AS pct_rank
FROM documents
""",
        "median_len": """
SELECT lang, round(median(n_chars)::DOUBLE, 6) AS median
FROM documents GROUP BY lang
""",
        "dedup_paragraph": r"""
WITH aug AS (
  SELECT doc_id,
    text || chr(10) || chr(10)
    || 'Copyright Example Corp. All rights reserved.'
    || chr(10) || chr(10) || 'Disclaimer variant ' || (doc_id % 5) || '.' AS text
  FROM documents
), t AS (
  SELECT doc_id,
    list_filter(string_split(text, chr(10) || chr(10)),
                x -> trim(x, ' ' || chr(9) || chr(13) || chr(10) || chr(12)) <> '') AS paras
  FROM aug
), p AS (
  SELECT doc_id, unnest(paras) AS para, generate_subscripts(paras, 1) AS idx
  FROM t
), freq AS (
  SELECT para, count(*) AS n FROM p GROUP BY para
), kept AS (
  SELECT p.doc_id, p.idx, p.para FROM p JOIN freq USING (para)
  WHERE freq.n <= 2
), agg AS (
  SELECT doc_id,
         string_agg(para, chr(10) || chr(10) ORDER BY idx) AS clean
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(agg.clean, '') AS clean
FROM documents d LEFT JOIN agg USING (doc_id)
""",
        "decontaminate": r"""
WITH words AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '[ \t\r\n\f]+'),
                w -> w <> '') AS ws
  FROM documents
), bad AS (
  SELECT DISTINCT array_to_string(ws[1:13], ' ') AS gram
  FROM words WHERE doc_id % 50 = 0 AND len(ws) >= 13
), grams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 11),
                        i -> array_to_string(ws[i:i + 12], ' '))) AS gram
  FROM words WHERE len(ws) >= 13
), hit AS (
  SELECT DISTINCT g.doc_id FROM grams g JOIN bad USING (gram)
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM hit)
""",
        # scored twin of decontaminate: positional 13-gram hit fraction
        # per document (bad grams are DISTINCT on both sides, so each
        # position joins at most once)
        "contamination_frac": r"""
WITH words AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '[ \t\r\n\f]+'),
                w -> w <> '') AS ws
  FROM documents
), bad AS (
  SELECT DISTINCT array_to_string(ws[1:13], ' ') AS gram
  FROM words WHERE doc_id % 50 = 0 AND len(ws) >= 13
), grams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 11),
                        i -> array_to_string(ws[i:i + 12], ' '))) AS gram
  FROM words WHERE len(ws) >= 13
), hits AS (
  SELECT g.doc_id, count(*)::BIGINT AS n_hits
  FROM grams g JOIN bad USING (gram) GROUP BY g.doc_id
)
SELECT w.doc_id,
       CAST(greatest(len(w.ws) - 12, 0) AS BIGINT) AS n_grams,
       COALESCE(h.n_hits, 0)::BIGINT AS n_hits,
       CASE WHEN len(w.ws) >= 13
            THEN round(COALESCE(h.n_hits, 0)::DOUBLE / (len(w.ws) - 12), 6)
            ELSE 0.0 END AS contamination_frac
FROM words w LEFT JOIN hits h USING (doc_id)
""",
        # scalar quantization: global per-dim min/max over DOUBLE-cast
        # floats (exact — min/max never rounds), code = round-9 before
        # floor (the established float-parity recipe), clamp [0, 255]
        "embedding_quantize": """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), f AS (
  SELECT vec_id, gi.i AS i, e.v[gi.i] AS val
  FROM e, LATERAL (SELECT unnest(range(1, len(e.v) + 1)) AS i) gi
), mm AS (
  SELECT i, min(val) AS mn, max(val) AS mx FROM f GROUP BY i
)
SELECT f.vec_id, CAST(f.i - 1 AS BIGINT) AS dim,
       CAST(CASE WHEN mm.mx > mm.mn
            THEN least(greatest(floor(round(
                   (f.val - mm.mn) / (mm.mx - mm.mn) * 256.0, 9)),
                 0), 255)
            ELSE 0 END AS BIGINT) AS code
FROM f JOIN mm USING (i)
""",
        # asymmetric quantized ANN: same code CTE as embedding_quantize,
        # reconstruction mn + (code + 0.5)(mx − mn)/256, full-precision
        # query; order by the RAW cosine (round-4 only displayed), ties
        # (identically-coded vectors) break by vec_id
        "ann_topk_quantized": """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), f AS (
  SELECT vec_id, gi.i AS i, e.v[gi.i] AS val
  FROM e, LATERAL (SELECT unnest(range(1, len(e.v) + 1)) AS i) gi
), mm AS (
  SELECT i, min(val) AS mn, max(val) AS mx FROM f GROUP BY i
), r AS (
  SELECT f.vec_id, f.i,
         mm.mn + (CASE WHEN mm.mx > mm.mn
                  THEN least(greatest(floor(round(
                        (f.val - mm.mn) / (mm.mx - mm.mn) * 256.0, 9)),
                       0), 255)
                  ELSE 0 END + 0.5) * (mm.mx - mm.mn) / 256.0 AS rv
  FROM f JOIN mm USING (i)
), rl AS (
  SELECT vec_id, list(rv ORDER BY i) AS rvec FROM r GROUP BY vec_id
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
)
SELECT vec_id,
       round(list_cosine_similarity(rvec, (SELECT qv FROM q)), 4) AS score
FROM rl
ORDER BY list_cosine_similarity(rvec, (SELECT qv FROM q)) DESC, vec_id
LIMIT 10
""",
        # c-TF-IDF per language: token counts per (lang, term), df =
        # distinct langs containing the term, score = n * ln(g / df)
        "distinctive_terms": r"""
WITH words AS (
  SELECT lang, unnest(list_filter(
           regexp_split_to_array(text, '[ \t\r\n\f]+'),
           w -> w <> '')) AS term
  FROM documents
), cnt AS (
  SELECT lang, term, count(*)::BIGINT AS n FROM words GROUP BY lang, term
), df AS (
  SELECT term, count(*)::BIGINT AS df FROM cnt GROUP BY term
), ng AS (
  SELECT count(DISTINCT lang) AS g FROM cnt
), sc AS (
  SELECT lang, round(n * ln(g::DOUBLE / df), 6) AS score, term
  FROM cnt JOIN df USING (term) CROSS JOIN ng
)
SELECT lang, score, term, CAST(rank AS BIGINT) AS rank FROM (
  SELECT lang, score, term,
         row_number() OVER (PARTITION BY lang
                            ORDER BY score DESC, term ASC) AS rank
  FROM sc)
WHERE rank <= 10
""",
        # composed curation flagship: repetition filter over AUGMENTED
        # docs → exact dedup (min doc_id per text) → PII scrub → split
        "curate": """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
), """ + _repetition_cte("aug") + r""",
passed AS (
  SELECT a.doc_id, a.text FROM aug a JOIN rep USING (doc_id)
  WHERE rep.dup_line_frac <= 0.30 AND rep.dup_para_frac <= 0.30
    AND rep.top_word_frac <= 0.20 AND rep.bullet_line_frac <= 0.90
    AND rep.ellipsis_line_frac <= 0.30
), dedup AS (
  SELECT min(doc_id) AS doc_id, text FROM passed GROUP BY text
), withfooter AS (
  SELECT doc_id,
    text || chr(10) || 'Contact: user' || doc_id
    || '@mail.example.com, call +1-555-'
    || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'
    || lpad((doc_id % 10000)::VARCHAR, 4, '0')
    || ' or visit 10.' || (doc_id % 256) || '.0.' || (doc_id % 250)
    || ' now' AS fulltxt
  FROM dedup
), s1 AS (
  SELECT doc_id, regexp_replace(fulltxt,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM withfooter
), s2 AS (
  SELECT doc_id, regexp_replace(t1,
    '\b(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b',
    '<IP>', 'g') AS t2
  FROM s1
)
SELECT doc_id,
  regexp_replace(t2,
    '(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b',
    '<PHONE>', 'g') AS clean,
  CASE WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100 < 10
       THEN 'test' ELSE 'train' END AS split
FROM s2
""",
        "pii_scrub": r"""
WITH aug AS (
  SELECT doc_id,
    text || chr(10) || 'Contact: user' || doc_id
    || '@mail.example.com, call +1-555-'
    || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'
    || lpad((doc_id % 10000)::VARCHAR, 4, '0')
    || ' or visit 10.' || (doc_id % 256) || '.0.' || (doc_id % 250)
    || ' now' AS fulltxt
  FROM documents
), s1 AS (
  SELECT doc_id, fulltxt,
    regexp_replace(fulltxt,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM aug
), s2 AS (
  SELECT doc_id, fulltxt, t1,
    regexp_replace(t1,
      '\b(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b',
      '<IP>', 'g') AS t2
  FROM s1
)
SELECT doc_id,
  regexp_replace(t2,
    '(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b',
    '<PHONE>', 'g') AS clean,
  len(regexp_extract_all(fulltxt,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
  len(regexp_extract_all(t1,
      '\b(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b'))::BIGINT AS n_ip,
  len(regexp_extract_all(t2,
      '(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b'))::BIGINT AS n_phone
FROM s2
""",
        "normalize_text": r"""
WITH messy AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'Cafe' || chr(769) || '  ' || text
           WHEN 1 THEN chr(9) || text || chr(1) || chr(2)
           WHEN 2 THEN text || chr(13) || chr(10) || ' trailing  '
           ELSE text END AS raw
  FROM documents
), norm AS (
  SELECT doc_id, raw,
         trim(regexp_replace(regexp_replace(nfc_normalize(raw),
              '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'),
              '[ \t\r\n\f\v]+', ' ', 'g')) AS norm_text
  FROM messy
)
SELECT doc_id, norm_text, raw <> norm_text AS changed FROM norm
""",
        "host_stats": """
SELECT 'site' || (doc_id % 23) || '.example.' ||
       CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
            ELSE 'net' END AS host,
       count(*)::BIGINT AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       max(n_chars)::BIGINT AS max_chars,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS mean_chars
FROM documents
GROUP BY 1
""",
        "url_canonicalize": r"""
WITH u AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
    || '://WWW.Site' || (doc_id % 7) || '.Example.COM'
    || (CASE WHEN doc_id % 4 = 0 THEN ':80'
             WHEN doc_id % 4 = 1 THEN ':443' ELSE '' END)
    || '/Docs/' || doc_id
    || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0
             THEN '?utm_source=feed&ref=' || (doc_id % 9) || '&utm_campaign=x'
             WHEN doc_id % 5 = 1 THEN '?gclid=abc' ELSE '' END)
    || (CASE WHEN doc_id % 6 = 0 THEN '#Section-2' ELSE '' END) AS url
  FROM documents
), parts AS (
  SELECT doc_id, url,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
    coalesce(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '') AS path,
    coalesce(regexp_extract(url, '\?([^#]*)', 1), '') AS q
  FROM u
), canon AS (
  SELECT doc_id, url, scheme,
    CASE WHEN scheme = 'http' AND hostport LIKE '%:80'
         THEN left(hostport, len(hostport) - 3)
         WHEN scheme = 'https' AND hostport LIKE '%:443'
         THEN left(hostport, len(hostport) - 4)
         ELSE hostport END AS host,
    CASE WHEN path = '' THEN '/'
         WHEN len(path) > 1 AND path LIKE '%/'
         THEN left(path, len(path) - 1)
         ELSE path END AS cpath,
    coalesce(array_to_string(list_filter(string_split(q, '&'),
      p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|gclid|fbclid)(=.*)?$')),
      '&'), '') AS cq
  FROM parts
)
SELECT doc_id, url,
  scheme || '://' || host || cpath
  || CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS canonical
FROM canon
""",
        "top_bigrams": r"""
WITH words AS (
  SELECT list_filter(regexp_split_to_array(text, '[ \t\r\n\f]+'),
                     w -> w <> '') AS ws
  FROM documents
), grams AS (
  SELECT unnest(list_transform(range(1, len(ws)),
                i -> ws[i] || ' ' || ws[i + 1])) AS gram
  FROM words WHERE len(ws) >= 2
)
SELECT gram, count(*) AS n
FROM grams GROUP BY gram
ORDER BY n DESC, gram ASC
LIMIT 20
""",
        "top_bigrams_sketch": r"""
WITH words AS (
  SELECT list_filter(regexp_split_to_array(text, '[ \t\r\n\f]+'),
                     w -> w <> '') AS ws
  FROM documents
), grams AS (
  SELECT unnest(list_transform(range(1, len(ws)),
                i -> ws[i] || ' ' || ws[i + 1])) AS gram
  FROM words WHERE len(ws) >= 2
)
SELECT gram, count(*) AS n
FROM grams GROUP BY gram
ORDER BY n DESC, gram ASC
LIMIT 20
""",
        "doc_fingerprint": """
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents
), n_t AS (
  SELECT doc_id, toks, len(toks) AS n FROM t
)
SELECT doc_id,
       min(substr(md5(array_to_string(toks[(i + 1):(i + 5)], ' ')), 9, 8)) AS fp8
FROM n_t, LATERAL (SELECT unnest(generate_series(0, n - 5)) AS i) g
GROUP BY doc_id
""",
        "lang_id": """
WITH t AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '\\w+'), x -> lower(x)) AS toks
  FROM documents
), s AS (
  SELECT doc_id, len(toks) AS n,
    len(list_filter(toks, x -> x IN ('the','of','and','to','a','in','is',
      'that','it','for','on','with','as','are','was','be','this','have',
      'from','or','by'))) AS h_en,
    len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht',
      'ein','eine','zu','den','von','mit','auf','für','im','sich','des',
      'dem'))) AS h_de,
    len(list_filter(toks, x -> x IN ('el','la','los','las','de','que','y',
      'en','un','una','es','no','por','con','para','del','se','su','al',
      'como'))) AS h_es,
    len(list_filter(toks, x -> x IN ('le','la','les','de','des','et','un',
      'une','est','que','pour','dans','qui','au','du','sur','ne','pas',
      'ce'))) AS h_fr,
    len(list_filter(toks, x -> x IN ('bir','ve','bu','da','de','için',
      'ile','olarak','çok','daha','en','gibi','sonra','kadar','ama',
      'ben'))) AS h_tr
  FROM t
)
SELECT doc_id,
  CASE WHEN n = 0 THEN 'und'
       WHEN GREATEST(h_en, h_de, h_es, h_fr, h_tr) * 1.0 / n <= 0.02 THEN 'und'
       WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr AND h_en >= h_tr THEN 'en'
       WHEN h_de >= h_es AND h_de >= h_fr AND h_de >= h_tr THEN 'de'
       WHEN h_es >= h_fr AND h_es >= h_tr THEN 'es'
       WHEN h_fr >= h_tr THEN 'fr'
       ELSE 'tr' END AS lang_id
FROM s
""",
        "events_window": """
SELECT user_id,
       epoch_us(ts) // 3600000000 AS window,
       count(*) AS n,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
""",
        # nibble histogram + byte entropy: per-char byte stats over the
        # ASCII corpus (char position == byte position)
        "multimodal_features": """
WITH n_t AS (
  SELECT doc_id, length(text) AS n FROM documents
), chars AS (
  SELECT doc_id, ascii(substr(text, i, 1)) AS c
  FROM documents, LATERAL (SELECT unnest(generate_series(1, length(text))) AS i) g
  WHERE length(text) > 0
), bytec AS (
  SELECT doc_id, c, count(*) AS k FROM chars GROUP BY doc_id, c
), ent AS (
  SELECT doc_id,
         round_even(-sum((k * 1.0 / n) * log2(k * 1.0 / n)), 6)
           AS byte_entropy
  FROM bytec JOIN n_t USING (doc_id) GROUP BY doc_id
), nib AS (
  SELECT doc_id, c // 16 AS bin, sum(k) AS k
  FROM bytec GROUP BY doc_id, c // 16
), bins AS (
  SELECT doc_id, b AS bin
  FROM n_t, LATERAL (SELECT unnest(generate_series(0, 15)) AS b) g
)
SELECT bins.doc_id, CAST(bins.bin AS BIGINT) AS bin,
       round_even(COALESCE(nib.k, 0) * 1.0 / n_t.n, 6) AS frac,
       ent.byte_entropy
FROM bins
LEFT JOIN nib ON nib.doc_id = bins.doc_id AND nib.bin = bins.bin
JOIN n_t ON n_t.doc_id = bins.doc_id
JOIN ent ON ent.doc_id = bins.doc_id
""",
        "multimodal_probe": """
SELECT doc_id,
       'application/octet-stream' AS media_type,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       320 + octet_length(CAST(text AS BLOB)) % 320 AS width,
       240 + octet_length(CAST(text AS BLOB)) % 240 AS height,
       (octet_length(CAST(text AS BLOB)) % 1000) * 40 AS duration_ms,
       octet_length(CAST(text AS BLOB)) % 32 AS n_frames
FROM documents
""",
        # dedup_simhash, ann_ivf: non-SQL-expressible (bitwise simhash /
        # approximate index) → rows-only checks; pytest covers their
        # semantics against brute-force oracles.
    }
