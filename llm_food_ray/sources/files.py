"""Directory-of-files ingestion — the reference's batch file-upload
surface (llm_food/app.py accepts uploaded PDF/DOCX/HTML payloads)
re-expressed Ray-Data-first: a directory of raw files becomes the
engine's standard ``pages`` dataset via ``ray.data.read_binary_files``
(streaming, path-carrying, no driver-side file loop), and everything
downstream — content-type dispatch, extraction, chunking, dedup — is
the SAME pipeline the crawl path uses.

``write_file_corpus`` materializes the deterministic synthetic page
payloads (sources/pages.py rules) as one file per document, so the
round-trip  files → read_binary_files → extract  is checkable against
the existing synthesis-parity SQL oracles with ``file://doc{id}`` keys.
The writer is idempotent per (sf_dir row count): an existing complete
corpus directory is reused, partial ones are rebuilt.

Scale shape: ``read_binary_files`` streams file blocks straight into
Arrow binary columns (object-store backed, spillable); filename → url
mapping and the txt/payload split are one vectorized-enough map over
small per-file metadata, never a driver loop over file contents.
"""

from __future__ import annotations

import os

import pyarrow as pa

from .pages import synth_page_record, _EPOCH


def write_file_corpus(sf_dir: str, out_dir: str) -> int:
    """One file per document: ``doc{id}.html`` / ``.pdf`` / ``.txt`` /
    ``.bin`` per the deterministic payload-mix rules.  Returns the
    number of files; skips the write when a complete corpus already
    exists (checked via the ``_MANIFEST`` count)."""
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text", "lang"])
    ids = t.column("doc_id").to_pylist()
    manifest = os.path.join(out_dir, "_MANIFEST")
    if os.path.exists(manifest):
        with open(manifest) as f:
            if f.read().strip() == str(len(ids)):
                return len(ids)
    os.makedirs(out_dir, exist_ok=True)
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    for d, text, lang in zip(ids, texts, langs):
        rec = synth_page_record(d, text or "", lang or "")
        if rec["text"]:
            name, payload = f"doc{d}.txt", rec["text"].encode("utf-8")
        else:
            p = rec["html"]
            if p.startswith(b"%PDF") and d % 50 != 3:
                ext = "pdf"
            elif d % 50 in (3, 13):
                ext = "bin"
            else:
                ext = "html"
            name, payload = f"doc{d}.{ext}", p
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(payload)
    with open(manifest, "w") as f:
        f.write(str(len(ids)))
    return len(ids)


def pages_from_files(dir_path: str):
    """→ the standard pages Dataset (url, warc_ts, html, text, lang)
    from a directory of raw files: ``file://<basename-sans-ext>`` keys,
    ``.txt`` payloads routed to the ``text`` column (plaintext rows),
    everything else to ``html`` for the content-type dispatcher."""
    import ray.data as rd

    ds = rd.read_binary_files(dir_path, include_paths=True)

    def to_pages(b: pa.Table) -> pa.Table:
        paths = b.column("path").to_pylist()
        payloads = b.column("bytes").to_pylist()
        urls, htmls, texts = [], [], []
        for p, payload in zip(paths, payloads):
            base = os.path.basename(p)
            if base == "_MANIFEST":
                continue
            stem, ext = os.path.splitext(base)
            urls.append("file://" + stem)
            if ext == ".txt":
                htmls.append(b"")
                texts.append(payload.decode("utf-8"))
            else:
                htmls.append(payload)
                texts.append("")
        n = len(urls)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([_EPOCH] * n, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([""] * n, pa.string()),
        })

    return ds.map_batches(to_pages, batch_format="pyarrow")

def _roundtrip_dir(sf_dir: str, fmt: str) -> str:
    import re

    stem = re.sub(r"[^A-Za-z0-9_.-]", "_", sf_dir.strip("/"))
    return f"/tmp/llm_food_ray_{fmt}_{stem}"


def jsonl_documents(sf_dir: str):
    """documents → JSONL on disk (once, idempotent) → streamed back via
    ``ray.data.read_json`` — the JSONL ingestion path every LLM-data
    vendor drop arrives through, exercised end to end against the
    parquet truth."""
    import os

    import ray.data as rd

    out = _roundtrip_dir(sf_dir, "jsonl")
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        rd.read_parquet(f"{sf_dir}/documents.parquet").write_json(out)
        with open(done, "w") as f:
            f.write("ok")
    return rd.read_json(
        [os.path.join(out, p) for p in sorted(os.listdir(out))
         if p.endswith(".json")])


def csv_documents(sf_dir: str):
    """documents (scalar columns) → CSV on disk (once) → streamed back
    via ``ray.data.read_csv`` — the CSV source leg.  Free-text columns
    stay out of the CSV on purpose (typed scalar interchange is what
    CSV drops carry; documents ride JSONL/parquet)."""
    import os

    import ray.data as rd

    out = _roundtrip_dir(sf_dir, "csv")
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        (rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source", "n_chars"])
           .write_csv(out))
        with open(done, "w") as f:
            f.write("ok")
    return rd.read_csv(
        [os.path.join(out, p) for p in sorted(os.listdir(out))
         if p.endswith(".csv")])
