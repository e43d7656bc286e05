"""Fixed Arrow schemas for the engine (declared once, validated on read).

The reference declares its shapes with Pydantic response models
(``llm_food/models.py:14-36``) and SQL DDL for job state
(``llm_food/app.py:160-206``).  Here everything is one logical columnar
table; job state becomes per-partition manifests (see ``state/manifest.py``).
"""

from __future__ import annotations

import pyarrow as pa

# Input: Common-Crawl-style pages table (authoritative shape from
# BASELINE.json input_hint).
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),           # primary key (replaces `filename`)
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),          # raw payload bytes (HTML / PDF / empty)
        ("text", pa.string()),          # pre-extracted plaintext ("" unless text row)
        ("lang", pa.string()),
    ]
)

SPAN_TYPE = pa.struct(
    [("start", pa.int64()), ("end", pa.int64()), ("kind", pa.string())]
)

# Output: replaces ConversionResponse (models.py:14-17) + the per-doc .md blob.
EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("content_hash", pa.string()),   # sha256 hexdigest of payload, app.py:456
        ("doc_type", pa.string()),       # html|pdf|text|unknown (sniffed)
        ("markdown", pa.string()),       # pages joined "\n\n---\n\n", app.py:938
        ("texts", pa.list_(pa.string())),  # per-page markdown, models.py:17
        ("spans", pa.list_(SPAN_TYPE)),  # char offsets of blocks in `markdown`
        ("status", pa.string()),         # ok|failed (file_tasks.status, app.py:197)
        ("error", pa.string()),          # file_tasks.error_message, app.py:202
    ]
)

# Phase-1 schema of the deferred-whale pipeline (pipelines/extract.py):
# EXTRACTED_SCHEMA plus the raw payload carried only on rows whose
# extraction is deferred to the whale pool (status="deferred").
EXTRACTED_DEFER_SCHEMA = EXTRACTED_SCHEMA.append(
    pa.field("deferred_payload", pa.binary())
)

CHUNKS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("strategy", pa.string()),
        ("chunk_size", pa.int32()),
        ("chunk_overlap", pa.int32()),
        ("chunk_index", pa.int32()),
        ("chunk_text", pa.string()),
    ]
)

PAGE_JOINER = "\n\n---\n\n"   # stored .md separator, app.py:938 / 1256
CHUNK_JOINER = "\n"           # /be joins pages before chunking, app.py:530
CLI_JOINER = "\n\n"           # CLI result saver, cli.py:114


def validate_schema(table_schema: pa.Schema, expected: pa.Schema, name: str) -> None:
    """Raise ValueError if `table_schema` is missing/mistyping expected columns."""
    for field in expected:
        idx = table_schema.get_field_index(field.name)
        if idx < 0:
            raise ValueError(f"{name}: missing column {field.name!r}")
        actual = table_schema.field(idx).type
        if actual != field.type:
            raise ValueError(
                f"{name}: column {field.name!r} has type {actual}, expected {field.type}"
            )
