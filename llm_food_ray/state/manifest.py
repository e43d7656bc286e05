"""Per-partition lineage manifests — the Ray-idiomatic replacement for the
reference's mutable DuckDB job tables (``batch_jobs`` / ``file_tasks``,
llm_food/app.py:160-206).

The reference tracks lineage as mutable rows updated from concurrent
background tasks; here each completed output partition gets one immutable
JSON sidecar written atomically (temp + rename) AFTER its Parquet data is
durable (SURVEY.md §4.3).  On restart, partitions with a valid manifest are
skipped — that is checkpoint/resume for a batch pipeline.
"""

from __future__ import annotations

import json
import os
import shutil
import time

MANIFEST_NAME = "manifest.json"
ENGINE_VERSION = "0.1.0"


def partition_dir(out_dir: str, gid: int) -> str:
    return os.path.join(out_dir, f"part={gid}")


def manifest_path(out_dir: str, gid: int) -> str:
    return os.path.join(partition_dir(out_dir, gid), MANIFEST_NAME)


def load_manifest(out_dir: str, gid: int) -> dict | None:
    path = manifest_path(out_dir, gid)
    try:
        with open(path) as f:
            m = json.load(f)
        return m if m.get("complete") else None
    except (OSError, json.JSONDecodeError):
        return None


def completed_partitions(out_dir: str) -> set[int]:
    done: set[int] = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("part="):
            try:
                gid = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if load_manifest(out_dir, gid) is not None:
                done.add(gid)
    return done


def clean_partial(out_dir: str, gid: int) -> None:
    """Remove a partition dir that has data but no valid manifest (a write
    interrupted mid-flight)."""
    d = partition_dir(out_dir, gid)
    if os.path.isdir(d) and load_manifest(out_dir, gid) is None:
        shutil.rmtree(d)


def write_manifest(out_dir: str, gid: int, *, input_paths: list[str],
                   counters: dict, config_fingerprint: str,
                   wall_time_s: float) -> None:
    """Atomic manifest write (temp file + rename, SURVEY.md §7.4 item 5)."""
    record = {
        "complete": True,
        "partition": gid,
        "input_paths": sorted(input_paths),
        "counters": counters,              # e.g. {"ok": n, "failed": m}
        "engine_version": ENGINE_VERSION,
        "config_fingerprint": config_fingerprint,
        "wall_time_s": round(wall_time_s, 3),
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    path = manifest_path(out_dir, gid)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)
