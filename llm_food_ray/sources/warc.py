"""WARC ingestion — the Common-Crawl-native source format (ISO 28500),
re-expressed Ray-Data-first: a directory of ``.warc`` / ``.warc.gz``
shards becomes the engine's standard ``pages`` dataset via
``ray.data.read_binary_files`` + a per-shard record parser, and
everything downstream (content-type dispatch, extraction, chunking,
dedup) is the SAME pipeline the parquet crawl path uses.

Layout matches Common Crawl's: each record is a ``WARC/1.0`` response
wrapping an ``HTTP/1.1 200`` response whose Content-Type routes the
payload (text/plain → the ``text`` column, everything else → ``html``
for the dispatcher); ``.warc.gz`` shards are per-record gzip MEMBERS
(the CC convention — stdlib ``gzip.decompress`` handles concatenated
members).  The language rides the real ``WARC-Identified-Content-
Language`` header.

``write_warc_corpus`` materializes the deterministic synthetic page
payloads (sources/pages.py rules) as WARC shards, so the round-trip
warc → parse → extract is checkable against the existing
synthesis-parity SQL oracles on the same urls.

Scale shape: one shard = one ``read_binary_files`` row = one parse
task; records never leave the worker un-columnized (the parser slices
payloads by Content-Length — O(1) per record, no byte-scan backtrack),
and a malformed record poisons only its own shard row, isolated into
(status='failed') rows rather than a job crash.  At 100 TB the shard
list IS the partition plan: CC segments are ~1 GB gz, thousands per
crawl — ``read_binary_files`` streams them block-per-file with
backpressure.

Reference parity: llm_food has no WARC surface (it accepts uploads,
app.py); this is brief-scope ("Parquet shards of Common-Crawl-style
pages" — WARC is where those shards come from upstream).
"""

from __future__ import annotations

import datetime as _dt
import gzip
import os

import pyarrow as pa

from ..functions.hashing import md5_hex
from .pages import _EPOCH, synth_page_record

_CRLF = "\r\n"


def build_warc_record(url: str, ts: _dt.datetime, payload: bytes, *,
                      content_type: str, lang: str = "") -> bytes:
    """One WARC/1.0 response record wrapping an HTTP/1.1 200 response.
    Deterministic: the record id derives from md5(url), the date from
    ``ts`` — byte-stable across runs and engines."""
    http = (f"HTTP/1.1 200 OK{_CRLF}"
            f"Content-Type: {content_type}{_CRLF}"
            f"Content-Length: {len(payload)}{_CRLF}{_CRLF}"
            ).encode("ascii") + payload
    rid = md5_hex(url)
    headers = [
        "WARC/1.0",
        "WARC-Type: response",
        f"WARC-Target-URI: {url}",
        f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}",
        f"WARC-Record-ID: <urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}"
        f"-{rid[16:20]}-{rid[20:32]}>",
        "Content-Type: application/http; msgtype=response",
        f"Content-Length: {len(http)}",
    ]
    if lang:
        headers.append(f"WARC-Identified-Content-Language: {lang}")
    head = (_CRLF.join(headers) + _CRLF + _CRLF).encode("ascii")
    return head + http + (_CRLF + _CRLF).encode("ascii")


def parse_warc_bytes(data: bytes) -> list[dict]:
    """WARC shard bytes → list of {url, warc_ts, payload, content_type,
    lang} dicts.  Gzip members are decompressed first when the shard is
    compressed.  Content-Length-driven: O(1) slice per record."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if data[pos:pos + 8] != b"WARC/1.0":
            raise ValueError(f"not a WARC record at offset {pos}")
        hdr_end = data.index(b"\r\n\r\n", pos)
        headers = {}
        for line in data[pos:hdr_end].decode("ascii").split(_CRLF)[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers["content-length"])
        block = data[hdr_end + 4: hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if headers.get("warc-type") != "response":
            continue
        # strip the HTTP response envelope
        body_at = block.index(b"\r\n\r\n")
        ctype = ""
        for line in block[:body_at].decode("ascii",
                                           errors="replace").split(_CRLF):
            if line.lower().startswith("content-type:"):
                ctype = line.partition(":")[2].strip()
        out.append({
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": _dt.datetime.strptime(
                headers["warc-date"], "%Y-%m-%dT%H:%M:%SZ"),
            "payload": block[body_at + 4:],
            "content_type": ctype,
            "lang": headers.get("warc-identified-content-language", ""),
        })
    return out


def write_warc_corpus(sf_dir: str, out_dir: str, *, num_shards: int = 8,
                      compress: bool = True) -> int:
    """documents → ``num_shards`` WARC shards under ``out_dir`` using
    the deterministic synthetic payload rules; idempotent per row count
    (``_MANIFEST``).  Returns the record count."""
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
    ext = "warc.gz" if compress else "warc"
    shards: list[list[bytes]] = [[] for _ in range(num_shards)]
    for d, text, lang in zip(ids, t.column("text").to_pylist(),
                             t.column("lang").to_pylist()):
        rec = synth_page_record(d, text or "", lang or "")
        if rec["text"]:
            payload = rec["text"].encode("utf-8")
            ctype = "text/plain; charset=utf-8"
        else:
            payload = rec["html"]
            if payload.startswith(b"%PDF"):
                ctype = "application/pdf"
            elif payload[:1] == b"\x00":
                ctype = "application/octet-stream"
            else:
                ctype = "text/html; charset=utf-8"
        raw = build_warc_record(rec["url"], rec["warc_ts"], payload,
                                content_type=ctype, lang=rec["lang"])
        shards[d % num_shards].append(
            gzip.compress(raw, mtime=0) if compress else raw)
    for s, recs in enumerate(shards):
        path = os.path.join(out_dir, f"shard-{s:04d}.{ext}")
        with open(path + ".tmp", "wb") as f:
            f.write(b"".join(recs))
        os.rename(path + ".tmp", path)
    with open(manifest, "w") as f:
        f.write(str(len(ids)))
    return len(ids)


def pages_from_warc(dir_path: str):
    """→ the standard pages Dataset (url, warc_ts, html, text, lang)
    from a directory of WARC shards.  One shard = one parse task; a
    shard whose bytes fail to parse yields ONE (url='warc://<shard>',
    text='') row the extract stage will mark failed — row-level error
    isolation at shard granularity, never a job crash."""
    import ray.data as rd

    paths = [os.path.join(dir_path, p) for p in sorted(os.listdir(dir_path))
             if p.endswith((".warc", ".warc.gz"))]
    ds = rd.read_binary_files(paths, include_paths=True)

    def to_pages(b: pa.Table) -> pa.Table:
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for path, data in zip(b.column("path").to_pylist(),
                              b.column("bytes").to_pylist()):
            try:
                recs = parse_warc_bytes(data)
            except Exception:
                urls.append("warc://" + os.path.basename(path))
                tss.append(_EPOCH)
                htmls.append(b"\x00WARCPARSEERROR")
                texts.append("")
                langs.append("")
                continue
            for r in recs:
                urls.append(r["url"])
                tss.append(r["warc_ts"])
                if r["content_type"].startswith("text/plain"):
                    htmls.append(b"")
                    texts.append(r["payload"].decode("utf-8"))
                else:
                    htmls.append(r["payload"])
                    texts.append("")
                langs.append(r["lang"])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        })

    return ds.map_batches(to_pages, batch_format="pyarrow")
