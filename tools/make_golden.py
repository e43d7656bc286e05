"""Regenerate the pinned golden extraction fixtures (tests/golden/).

The goldens freeze the extractor BEHAVIOR: tests compare the pipeline's
output byte-for-byte against these files, so an unintended change to any
extractor breaks the suite even though the runtime oracle (the same code)
would silently agree with itself.  Regenerate ONLY on a deliberate
semantics change:

    python tools/make_golden.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_food_ray.config import ExtractConfig                      # noqa: E402
from llm_food_ray.functions.office_build import (                  # noqa: E402
    build_docx, build_pptx, build_rtf)
from llm_food_ray.schema import EXTRACTED_SCHEMA                   # noqa: E402
from llm_food_ray.sources.pages import synth_page_record, url_for  # noqa: E402
from llm_food_ray.stages.extract import ExtractStage               # noqa: E402

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")


def main() -> None:
    docs = pq.read_table(SF_DOCS, columns=["doc_id", "text", "lang"])
    stage_auto = ExtractStage(ExtractConfig(pdf_backend="auto"))
    stage_struct = ExtractStage(ExtractConfig(pdf_backend="structured"))

    rows_auto, rows_struct = [], []
    office_rows = []
    for d, t, l in zip(docs.column("doc_id").to_pylist(),
                       docs.column("text").to_pylist(),
                       docs.column("lang").to_pylist()):
        r = synth_page_record(d, t or "", l or "")
        rows_auto.append(stage_auto.extract_row(r["url"], r["html"], r["text"]))
        rows_struct.append(stage_struct.extract_row(r["url"], r["html"], r["text"]))
        if d % 10 == 0:   # office formats on a deterministic subset
            text = t or ""
            for fmt, payload in (
                ("docx", build_docx([("h1", f"Document {d}"), ("p", text)])),
                ("rtf", build_rtf([text])),
                ("pptx", build_pptx(
                    [[" ".join(text.split()[i:i + 20])]
                     for i in range(0, len(text.split()), 20)] or [[]])),
            ):
                row = stage_struct.extract_row(f"{url_for(d)}#{fmt}", payload, "")
                office_rows.append(row)

    os.makedirs(OUT, exist_ok=True)
    for name, rows in (("extracted_auto_sf0001", rows_auto),
                       ("extracted_structured_sf0001", rows_struct),
                       ("extracted_office_sf0001", office_rows)):
        table = pa.Table.from_pylist(rows, schema=EXTRACTED_SCHEMA)
        pq.write_table(table, os.path.join(OUT, f"{name}.parquet"),
                       compression="zstd")
        print(f"wrote {name}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
