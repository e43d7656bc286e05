"""Generic resumable partitioned Parquet writer — the extract pipeline's
checkpoint/resume pattern (`pipelines/extract.py`, SURVEY.md §4.3)
promoted to a utility ANY Dataset pipeline can use: one output directory
per key-hash group, an atomic lineage manifest per completed group
(`state/manifest.py`), and on restart only manifest-less groups rerun.

The factory receives ``(gid, num_groups)`` and must build the PRUNED
pipeline for that group — prune at the READ (a path subset, a hive
partition, a row filter on the group key) rather than computing the full
dataset and filtering, or resume saves nothing.  ``group_of`` gives the
canonical key→group assignment (the same 128-bit fingerprint space the
dedup family exchanges on) so producers and resumers always agree.

No reference analogue: llm_food tracks lineage as mutable DuckDB rows
updated by concurrent request handlers (`llm_food/app.py:160-206`); a
batch engine wants immutable per-partition sidecars written after the
data is durable.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from ..state import manifest as mf


def group_of(column, num_groups: int):
    """Vectorized key→group assignment (numpy int64 array) — the high
    64 bits of the portable 128-bit fingerprint mod ``num_groups``."""
    import numpy as np

    from ..stages.dedup import _fingerprint128

    fh, _ = _fingerprint128(column)
    return (fh % np.uint64(num_groups)).astype(np.int64)


def _parquet_files(d: str) -> list[str]:
    try:
        return sorted(os.path.join(d, n) for n in os.listdir(d)
                      if n.endswith(".parquet"))
    except OSError:
        return []


def write_resumable(ds_factory: Callable, out_dir: str, *,
                    num_groups: int = 16, config_fingerprint: str = "",
                    input_paths: list[str] | None = None) -> dict:
    """Run ``ds_factory(gid, num_groups)`` per group, writing each
    group's Dataset to ``out_dir/part={gid}/`` with an atomic manifest;
    groups whose manifest exists AND matches ``config_fingerprint`` are
    skipped wholesale.  A stale-fingerprint or manifest-less partial
    partition is removed and rebuilt.  Returns
    ``{"rows": total, "skipped_groups": k}``."""
    import ray.data as rd   # noqa: F401  (workers import lazily)

    totals = {"rows": 0, "skipped_groups": 0}
    for gid in range(num_groups):
        m = mf.load_manifest(out_dir, gid)
        if m is not None and m.get("config_fingerprint") == config_fingerprint:
            totals["rows"] += int(m["counters"].get("rows", 0))
            totals["skipped_groups"] += 1
            continue
        mf.clean_partial(out_dir, gid)
        pdir = mf.partition_dir(out_dir, gid)
        # a stale-fingerprint partition HAS a manifest → clean_partial
        # keeps it; remove explicitly so the rebuild starts empty
        if os.path.isdir(pdir):
            import shutil

            shutil.rmtree(pdir)
        t0 = time.perf_counter()
        ds = ds_factory(gid, num_groups)
        ds.write_parquet(pdir)
        files = _parquet_files(pdir)
        import ray.data as _rd

        n = int(_rd.read_parquet(files).count()) if files else 0
        mf.write_manifest(
            out_dir, gid, input_paths=list(input_paths or []),
            counters={"rows": n}, config_fingerprint=config_fingerprint,
            wall_time_s=time.perf_counter() - t0)
        totals["rows"] += n
    return totals


def read_resumable(out_dir: str, *, columns: list[str] | None = None):
    """All COMPLETED partitions back as one Dataset (partial partitions
    from a crashed run are invisible until their manifest lands)."""
    import ray.data as rd

    paths: list[str] = []
    for gid in sorted(mf.completed_partitions(out_dir)):
        paths.extend(_parquet_files(mf.partition_dir(out_dir, gid)))
    if not paths:   # nothing completed yet (fresh or crashed-early run)
        return rd.from_items([])
    return rd.read_parquet(paths, columns=columns)
