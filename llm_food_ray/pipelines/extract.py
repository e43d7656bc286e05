"""End-to-end extraction pipeline: read → dispatch+extract → partitioned
Parquet + lineage manifests, resumable.

Replaces the whole of the reference's async batch path (llm_food/app.py:
588-763 + background workers 886-1319): uploads → Parquet shards,
BackgroundTasks → Ray Data streaming executor, DuckDB job rows →
per-partition manifests, polling endpoints → reading manifests.

Scale design (SURVEY.md §4.3):
- Input shards are grouped into ``num_groups`` resume units; each group is
  one Dataset execution writing ``out/part={g}/`` atomically, manifest
  last.  A killed run re-processes only groups without manifests.  At
  100 TB, groups are hundreds of shards each; the streaming executor
  pipelines read → extract → write inside a group with backpressure.
- Skew defusal: rows whose payload exceeds ``big_doc_threshold`` are NOT
  extracted inline — phase 1 forwards their payload untouched and a
  dedicated ``WhaleFinish`` actor pool finishes them, so a 2,000-page PDF
  cannot stall a 256-row batch.  Single-read in both the lazy
  (``extract_dataset``) and resumable (``run_extract``, via the
  ``__leg=deferred`` hive partition) paths; output order is never
  semantic, the key is ``url``.
"""

from __future__ import annotations

import hashlib
import os
import time
from dataclasses import asdict

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..config import ExtractConfig
from ..stages.extract import ExtractStage
from ..state import manifest as mf


def config_fingerprint(cfg: ExtractConfig) -> str:
    return hashlib.md5(repr(sorted(asdict(cfg).items())).encode()).hexdigest()[:12]


class WhaleFinish:
    """Second stage of the single-read whale plan: rows already extracted
    in phase 1 pass through as a zero-copy Arrow filter; rows phase 1
    deferred (payload > big_doc_threshold, carried in ``deferred_payload``)
    are extracted here one at a time.

    Runs as an actor pool so the executor cannot fuse it back into the
    phase-1 task (fusion would put the whale inline with its 256-row batch
    again — the exact stall the leg exists to prevent). A whale only ever
    delays the already-finished rows sharing its block, never their CPU."""

    def __init__(self, cfg: ExtractConfig):
        self.stage = ExtractStage(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..schema import EXTRACTED_SCHEMA

        mask = pc.equal(batch.column("status"), "deferred")
        n_def = pc.sum(mask).as_py() or 0
        done = batch.filter(pc.invert(mask)).drop_columns(["deferred_payload"])
        if not n_def:
            return done
        deferred = batch.filter(mask)
        rows = [
            self.stage.extract_row(u, p or b"", "")
            for u, p in zip(deferred.column("url").to_pylist(),
                            deferred.column("deferred_payload").to_pylist())
        ]
        finished = pa.Table.from_pylist(rows, schema=EXTRACTED_SCHEMA)
        return pa.concat_tables([done, finished], promote_options="default")


def extract_dataset(pages_ds, cfg: ExtractConfig | None = None, *,
                    whale_leg: bool = True, concurrency=None):
    """pages Dataset → extracted Dataset (lazy).

    `concurrency=None` → stateless tasks sized by the executor (right for
    the common case); pass an int/tuple to pin an actor pool.

    ``whale_leg=True`` is SINGLE-READ (same defer mechanism as
    ``run_extract``): phase 1 extracts every row at or under
    ``big_doc_threshold`` and forwards bigger payloads untouched in
    ``deferred_payload``; the ``WhaleFinish`` actor pool finishes those —
    one scan of the input, no two-branch re-read.  Output order is not
    semantic (the key is ``url``)."""
    cfg = cfg or ExtractConfig()
    stage_kwargs: dict = {}
    if concurrency is not None:
        # actor pool → pass the CLASS so per-actor init runs once
        stage_kwargs.update(
            fn_constructor_kwargs={"cfg": cfg}, concurrency=concurrency
        )
        stage_fn: object = ExtractStage
    else:
        stage_fn = ExtractStage(cfg)   # stateless tasks (init is cheap)
    if not whale_leg:
        return pages_ds.map_batches(stage_fn, batch_format="pyarrow", **stage_kwargs)
    if concurrency is not None:
        stage_kwargs["fn_constructor_kwargs"] = {
            "cfg": cfg, "defer_over": cfg.big_doc_threshold}
    else:
        stage_fn = ExtractStage(cfg, defer_over=cfg.big_doc_threshold)
    phase1 = pages_ds.map_batches(stage_fn, batch_format="pyarrow",
                                  **stage_kwargs)
    return phase1.map_batches(
        WhaleFinish, fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow", concurrency=_whale_pool(), num_cpus=1,
    )


def _whale_pool() -> tuple[int, int]:
    """Whale-finish actor bounds: CPU-derived like the scoring pools
    (a hard (1, 4) silently serialized N simultaneous whales on a
    32-CPU node — the r4 skew dial finding), but each whale is a
    multi-hundred-MB document, so cap at half the cluster CPUs to
    leave heap headroom for the streaming pages."""
    from ..stages.pools import scoring_pool

    _, mx = scoring_pool()
    return (1, max(2, mx // 2))


def _group_paths(paths: list[str], num_groups: int) -> list[list[str]]:
    groups: list[list[str]] = [[] for _ in range(num_groups)]
    for i, p in enumerate(sorted(paths)):
        groups[i % num_groups].append(p)
    return [g for g in groups if g]


_DONE_DIR = "__leg=done"
_DEFER_DIR = "__leg=deferred"


def run_extract(input_paths: list[str], out_dir: str,
                cfg: ExtractConfig | None = None, *,
                num_groups: int | None = None,
                max_concurrent_groups: int = 1,
                pages_from=None) -> dict:
    """Resumable driver loop: one Dataset execution per shard group.

    `pages_from(paths) -> Dataset` lets callers synthesize pages from other
    tables (tests/bench); default reads the paths as a pages Parquet table.
    Returns overall counters {"ok": n, "failed": m, "skipped_groups": k}.

    Whale handling is SINGLE-READ: phase 1 extracts every row whose payload
    is under ``big_doc_threshold`` and routes bigger rows (payload carried
    in ``deferred_payload``) into a ``__leg=deferred`` partition via the
    hive write; phase 2 reads ONLY that tiny partition and finishes it on a
    ``batch_size=1`` actor pool, appending its files to ``__leg=done``.
    Same defer mechanism as the lazy ``extract_dataset(whale_leg=True)``,
    with the hive write as the phase boundary so resume works.
    """
    import pyarrow as _pa
    import ray.data as rd

    import shutil

    cfg = cfg or ExtractConfig()
    fp = config_fingerprint(cfg)
    num_groups = num_groups or min(cfg.num_partitions, len(input_paths)) or 1
    groups = _group_paths(input_paths, num_groups)
    totals = {"ok": 0, "failed": 0, "skipped_groups": 0}

    def run_group(gid: int, paths: list[str]) -> dict:
        # Any group reaching here is stale or incomplete: drop whatever is
        # on disk (incl. outputs under a valid manifest written with a
        # DIFFERENT config — skipping on manifest presence alone would
        # silently mix outputs extracted under the old config).
        shutil.rmtree(mf.partition_dir(out_dir, gid), ignore_errors=True)
        t0 = time.perf_counter()
        ds = pages_from(paths) if pages_from else rd.read_parquet(paths)
        part_dir = mf.partition_dir(out_dir, gid)
        # phase 1: extract small rows, defer whales — one pass over input.
        # __leg is a routing column consumed by the hive write (dropped
        # from file contents); status stays a real column in the files.
        phase1 = ds.map_batches(
            ExtractStage(cfg, defer_over=cfg.big_doc_threshold),
            batch_format="pyarrow",
        ).map_batches(
            lambda b: b.append_column(
                "__leg",
                pc.if_else(pc.equal(b.column("status"), "deferred"),
                           _pa.scalar("deferred"), _pa.scalar("done")),
            ),
            batch_format="pyarrow",
        )
        # NOTE: min_rows_per_file would coalesce the write into one task
        # and operator fusion then serializes the whole extract stage
        # behind it — file size is governed by block size instead
        phase1.write_parquet(part_dir, partition_cols=["__leg"])
        # phase 2: whale pool over the deferred partition only (tiny)
        defer_dir = os.path.join(part_dir, _DEFER_DIR)
        if os.path.isdir(defer_dir) and any(
                f.endswith(".parquet") for f in os.listdir(defer_dir)):
            whales = rd.read_parquet(defer_dir,
                                     columns=["url", "deferred_payload"])
            whales = whales.map_batches(
                lambda b: _pa.Table.from_arrays(
                    [b.column("url"), b.column("deferred_payload"),
                     _pa.nulls(b.num_rows, _pa.string())],
                    names=["url", "html", "text"],
                ),
                batch_format="pyarrow",
            ).map_batches(
                ExtractStage, fn_constructor_kwargs={"cfg": cfg},
                batch_format="pyarrow", batch_size=1,
                concurrency=_whale_pool(), num_cpus=1,
            ).map_batches(
                lambda b: b.append_column(
                    "deferred_payload", _pa.nulls(b.num_rows, _pa.binary())),
                batch_format="pyarrow",
            )
            whales.write_parquet(os.path.join(part_dir, _DONE_DIR))
            import shutil as _shutil

            _shutil.rmtree(defer_dir)   # payload copies not kept in output
        counters = _count_status(part_dir)
        mf.write_manifest(
            out_dir, gid, input_paths=paths, counters=counters,
            config_fingerprint=fp, wall_time_s=time.perf_counter() - t0,
        )
        return counters

    pending: list[tuple[int, list[str]]] = []
    for gid, paths in enumerate(groups):
        m = mf.load_manifest(out_dir, gid)
        # resume-skip only when the manifest matches THIS run: same config
        # fingerprint and same input shard set — otherwise re-process
        if (m is not None and m.get("config_fingerprint") == fp
                and m.get("input_paths") == sorted(paths)):
            totals["skipped_groups"] += 1
            for k in ("ok", "failed"):
                totals[k] += m["counters"].get(k, 0)
        else:
            pending.append((gid, paths))

    if max_concurrent_groups <= 1 or len(pending) <= 1:
        for gid, paths in pending:
            counters = run_group(gid, paths)
            for k in ("ok", "failed"):
                totals[k] += counters.get(k, 0)
    else:
        # overlap independent groups: each thread drives its own Dataset
        # execution, hiding per-group pipeline-launch gaps.  Manifests are
        # per-group, so resume semantics are unchanged.
        from concurrent.futures import ThreadPoolExecutor

        # Ray's read path lazily imports fsspec's HTTP filesystem and only
        # handles the single-threaded ModuleNotFoundError (no aiohttp in
        # this env); under concurrent first-imports the failure surfaces
        # as a bare ImportError instead and kills a group.  Seed a sentinel
        # module so the import resolves deterministically; the isinstance
        # check in ray then just returns False (we never read http URLs).
        try:
            from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        except ImportError:
            import sys as _sys
            import types as _types

            _mod = _types.ModuleType("fsspec.implementations.http")

            class _SentinelHTTPFileSystem:   # never instantiated
                pass

            _mod.HTTPFileSystem = _SentinelHTTPFileSystem
            _sys.modules["fsspec.implementations.http"] = _mod

        with ThreadPoolExecutor(max_workers=max_concurrent_groups) as ex:
            for counters in ex.map(lambda gp: run_group(*gp), pending):
                for k in ("ok", "failed"):
                    totals[k] += counters.get(k, 0)
    return totals


def _done_files(part_dir: str) -> list[str]:
    d = os.path.join(part_dir, _DONE_DIR)
    if not os.path.isdir(d):
        return []
    return [os.path.join(d, f) for f in sorted(os.listdir(d))
            if f.endswith(".parquet")]


def _count_status(part_dir: str) -> dict:
    """Cheap columnar scan of just the status column of one partition."""
    dataset = pads.dataset(_done_files(part_dir), format="parquet")
    table = dataset.to_table(columns=["status"])
    counts = pc.value_counts(table.column("status"))
    out = {"ok": 0, "failed": 0, "rows": table.num_rows}
    for entry in counts.to_pylist():
        out[entry["values"]] = entry["counts"]
    return out


def read_extracted(out_dir: str, *, columns: list[str] | None = None):
    """Read all completed partitions back as one Dataset (EXTRACTED_SCHEMA
    columns; the internal deferred_payload carrier column is dropped)."""
    import ray.data as rd

    from ..schema import EXTRACTED_SCHEMA

    paths = []
    for gid in sorted(mf.completed_partitions(out_dir)):
        paths.extend(_done_files(mf.partition_dir(out_dir, gid)))
    return rd.read_parquet(paths, columns=columns or EXTRACTED_SCHEMA.names)
