"""Optional page-explode / re-aggregate leg for extreme-tail PDFs (F1/F2).

The default extract stage keeps a PDF's pages inside one row (the `texts`
list column) because the reference immediately re-aggregates them
(llm_food/app.py:1243-1277 joins pages ORDER BY page_number with
"\\n\\n---\\n\\n").  For the extreme tail — a 2,000-page whale that would
monopolize one task for minutes — this module mirrors the reference's
Gemini-batch shape (explode pages at app.py:1044-1114, re-aggregate at
1243-1277) as Ray operators:

    explode_pdf_pages:  (url, html) → one row per page (url, page_number,
                        page_markdown)  — a flat-map; per-page parallelism
    reaggregate_pages:  groupby(url) → sort by page_number → join with the
                        page joiner → (url, markdown, texts)

The groupby is a shuffle keyed on url — only worth paying for whales, so
callers route by payload size (cfg.big_doc_threshold) and union with the
default leg.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions import pdf_md
from ..schema import PAGE_JOINER


class ExplodePdfPages:
    """Flat-map: one output row per PDF page (page_number is 1-based,
    mirroring file_tasks.page_number, llm_food/app.py:1091)."""

    def __init__(self, structured: bool = True):
        self.structured = structured

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, pagenos, mds, statuses, errors = [], [], [], [], []
        for url, payload in zip(batch.column("url").to_pylist(),
                                batch.column("html").to_pylist()):
            try:
                pages = pdf_md.pdf_pages_markdown(payload or b"",
                                                  structured=self.structured)
                for i, md in enumerate(pages):
                    urls.append(url)
                    pagenos.append(i + 1)
                    mds.append(md)
                    statuses.append("ok")
                    errors.append("")
            except Exception as exc:   # row-level isolation (M12)
                urls.append(url)
                pagenos.append(0)
                mds.append("")
                statuses.append("failed")
                errors.append(f"Error processing {url}: {exc}")
        return pa.Table.from_arrays(
            [pa.array(urls, pa.string()), pa.array(pagenos, pa.int64()),
             pa.array(mds, pa.string()), pa.array(statuses, pa.string()),
             pa.array(errors, pa.string())],
            names=["url", "page_number", "page_markdown", "status", "error"],
        )


def _join_pages_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Re-aggregate EVERY url inside one coarse bucket with vectorized
    pandas groupbys — one pandas frame per ~256th of the keyspace, not one
    per url (map_groups over millions of singleton url groups pays pandas
    overhead per document and crawls; same rationale as
    the dedup family's coarse-bucket exchanges)."""
    df = df.sort_values(["url", "page_number"],
                        kind="mergesort")   # ORDER BY page_number, app.py:1250
    urls = pd.Index(df["url"].unique())
    ok = df[df["status"] == "ok"]
    texts = (ok.groupby("url", sort=False)["page_markdown"].agg(list)
               .reindex(urls))
    texts = texts.apply(lambda v: v if isinstance(v, list) else [])
    failed = df[df["status"] == "failed"]
    err = (failed.groupby("url", sort=False)["error"].first()
                 .reindex(urls).fillna(""))
    has_fail = failed["url"].unique()
    status = pd.Series("ok", index=urls)
    status[status.index.isin(has_fail)] = "failed"
    return pd.DataFrame({
        "url": urls,
        "markdown": texts.map(PAGE_JOINER.join).to_numpy(),
        "texts": texts.to_numpy(),
        "status": status.to_numpy(),
        "error": err.to_numpy(),
    })


def explode_extract_reaggregate(pdf_pages_ds, structured: bool = True, *,
                                num_coarse: int = 256):
    """pages Dataset (pdf rows only) → exploded per-page extraction →
    url-keyed re-aggregation. Output matches the default leg's
    (url, markdown, texts, status, error) for the same input.

    ONE shuffle into ``num_coarse`` buckets of url hashes (all pages of a
    url land in the same bucket), then a vectorized within-bucket join —
    never a pandas group per url."""
    import zlib

    exploded = pdf_pages_ds.map_batches(
        ExplodePdfPages(structured), batch_format="pyarrow", batch_size=4
    )

    def add_cb(batch: pa.Table) -> pa.Table:
        cb = [zlib.crc32(u.encode()) % num_coarse
              for u in batch.column("url").to_pylist()]
        return batch.append_column("__cb", pa.array(cb, pa.int32()))

    return (exploded.map_batches(add_cb, batch_format="pyarrow")
                    .groupby("__cb")
                    .map_groups(_join_pages_bucket, batch_format="pandas"))
