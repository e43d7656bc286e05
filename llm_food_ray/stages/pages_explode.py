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


def _join_pages_bucket(t: pa.Table) -> pa.Table:
    """Re-aggregate EVERY url inside one coarse bucket with vectorized
    ARROW kernels — sort → url run-length boundaries →
    ``ListArray.from_arrays`` + ``pc.binary_join`` (the
    ``grouped_string_agg`` bucket machinery; this was the repo's last
    pandas ``map_groups`` path).  One call per ~256th of the keyspace,
    never one group per url."""
    import numpy as np
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return pa.table({
            "url": pa.array([], pa.string()),
            "markdown": pa.array([], pa.string()),
            "texts": pa.array([], pa.list_(pa.string())),
            "status": pa.array([], pa.string()),
            "error": pa.array([], pa.string())})
    order = pc.sort_indices(
        t, sort_keys=[("url", "ascending"),
                      ("page_number", "ascending")])  # app.py:1250 ORDER BY
    t = t.take(order)
    u = t.column("url").combine_chunks()
    md = t.column("page_markdown").combine_chunks()
    ne = pc.fill_null(pc.not_equal(u.slice(1), u.slice(0, len(u) - 1)),
                      True)
    new_run = np.r_[True, ne.to_numpy(zero_copy_only=False)]
    starts = np.flatnonzero(new_run)
    ends = np.r_[starts[1:], len(u)]
    okm = pc.equal(t.column("status"), "ok").to_numpy(
        zero_copy_only=False)
    cum_ok = np.r_[0, np.cumsum(okm.astype(np.int64))]
    ok_counts = cum_ok[ends] - cum_ok[starts]
    offsets = pa.array(np.r_[0, np.cumsum(ok_counts)].astype(np.int32),
                       pa.int32())
    texts = pa.ListArray.from_arrays(offsets, md.filter(pa.array(okm)))
    markdown = pc.binary_join(texts, PAGE_JOINER)
    failm = ~okm
    run_of = np.repeat(np.arange(len(starts)), ends - starts)
    fail_idx = np.flatnonzero(failm)
    status = np.full(len(starts), "ok", object)
    error = np.full(len(starts), "", object)
    if len(fail_idx):
        fail_runs, first_pos = np.unique(run_of[fail_idx],
                                         return_index=True)
        status[fail_runs] = "failed"
        errs = pc.fill_null(t.column("error"), "").take(
            pa.array(fail_idx[first_pos])).to_pylist()
        error[fail_runs] = errs
    return pa.table({
        "url": u.take(pa.array(starts)),
        "markdown": markdown.cast(pa.string()),
        "texts": texts,
        "status": pa.array(status.tolist(), pa.string()),
        "error": pa.array(error.tolist(), pa.string()),
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
                    .map_groups(_join_pages_bucket, batch_format="pyarrow"))
