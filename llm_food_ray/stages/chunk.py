"""Chunking stage (C1-C5): extracted docs → chunk rows.

Mirrors the reference's ``/chunk`` and ``/be`` endpoints
(llm_food/app.py:406-430, 518-542): pages are joined with "\\n" before
chunking (CHUNK_JOINER, app.py:530), then split by the configured
strategy.  One input row fans out to N chunk rows — a vectorized
flat-map inside ``map_batches`` (Arrow in / Arrow out).

The chunker is a callable class so tokenizer/strategy setup happens once
per actor when run as a pool (``map_batches(ChunkStage, concurrency=N,
fn_constructor_kwargs=...)``).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import ChunkConfig
from ..functions.chunk import chunk_text
from ..schema import CHUNKS_SCHEMA, CHUNK_JOINER


class ChunkStage:
    def __init__(self, cfg: ChunkConfig | None = None, *,
                 text_column: str = "markdown", key_column: str = "url"):
        self.cfg = cfg or ChunkConfig()
        self.text_column = text_column
        self.key_column = key_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        keys = batch.column(self.key_column).to_pylist()
        if "texts" in batch.column_names and self.text_column == "texts":
            docs = [CHUNK_JOINER.join(t or []) for t in batch.column("texts").to_pylist()]
        else:
            docs = [t or "" for t in batch.column(self.text_column).to_pylist()]
        out_keys: list[str] = []
        out_idx: list[int] = []
        out_text: list[str] = []
        for key, doc in zip(keys, docs):
            for i, c in enumerate(chunk_text(doc, cfg)):
                out_keys.append(key)
                out_idx.append(i)
                out_text.append(c)
        n = len(out_keys)
        key_type = batch.schema.field(self.key_column).type
        return pa.Table.from_arrays(
            [
                pa.array(out_keys, key_type),
                pa.array([cfg.strategy] * n, pa.string()),
                pa.array([cfg.chunk_size] * n, pa.int32()),
                pa.array([cfg.chunk_overlap] * n, pa.int32()),
                pa.array(out_idx, pa.int32()),
                pa.array(out_text, pa.string()),
            ],
            names=[self.key_column] + list(CHUNKS_SCHEMA.names[1:]),
        )


def chunk_dataset(ds, cfg: ChunkConfig | None = None, *,
                  text_column: str = "markdown", key_column: str = "url"):
    """extracted/docs Dataset → chunks Dataset (lazy flat-map)."""
    return ds.map_batches(
        ChunkStage(cfg, text_column=text_column, key_column=key_column),
        batch_format="pyarrow",
    )
