"""Test helpers."""
from __future__ import annotations


def dataset_from_items(items: list[dict]):
    """Single-block Dataset (rd.from_items makes ~200 tiny blocks — slow)."""
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(items))
