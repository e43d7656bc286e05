"""CLI — the batch-engine equivalent of the reference's client commands
(llm_food/cli.py: convert / batch / status / results).

    python -m llm_food_ray.cli extract  IN_DIR OUT_DIR [--groups N] [--backend auto]
    python -m llm_food_ray.cli status   OUT_DIR
    python -m llm_food_ray.cli save     OUT_DIR DEST_DIR
    python -m llm_food_ray.cli chunk    OUT_DIR DEST_DIR [--strategy token]
                                        [--size 512] [--overlap 128]

`extract` runs the resumable pipeline over a directory of pages Parquet
shards (replaces POST /batch); `status` reads the partition manifests
(replaces GET /status/{task_id}); `save` writes one ``{slug}.md`` per
document, pages joined like the CLI saver (llm_food/cli.py:113-126,
337-350); `chunk` runs the chunker over extracted output.

This module owns its Ray session (unlike __ray_entry__, which must not).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")


def cmd_extract(args) -> int:
    from .config import ExtractConfig
    from .pipelines.extract import run_extract

    paths = sorted(
        os.path.join(args.in_dir, f) for f in os.listdir(args.in_dir)
        if f.endswith(".parquet")
    )
    if not paths:
        print(f"no .parquet shards in {args.in_dir}", file=sys.stderr)
        return 2
    _init_ray()
    cfg = ExtractConfig(pdf_backend=args.backend)
    totals = run_extract(paths, args.out_dir, cfg, num_groups=args.groups,
                         max_concurrent_groups=args.concurrent_groups)
    print(json.dumps(totals))
    return 0


def cmd_status(args) -> int:
    """Manifest roll-up — the GET /status analogue (llm_food/app.py:545-585)."""
    from .state import manifest as mf

    done = sorted(mf.completed_partitions(args.out_dir))
    parts = []
    totals = {"ok": 0, "failed": 0, "rows": 0}
    for gid in done:
        m = mf.load_manifest(args.out_dir, gid)
        parts.append({"partition": gid, **m["counters"],
                      "wall_time_s": m["wall_time_s"]})
        for k in totals:
            totals[k] += m["counters"].get(k, 0)
    print(json.dumps({"completed_partitions": len(done),
                      "totals": totals, "partitions": parts}))
    return 0


_SLUG_RE = re.compile(r"[^A-Za-z0-9._-]+")


def _slug(url: str) -> str:
    """Output naming: basename(url) or the full url (llm_food/app.py:493,
    956-957), sanitized for the filesystem."""
    base = url.rstrip("/").rsplit("/", 1)[-1] or url
    return _SLUG_RE.sub("_", base)[:120] or "doc"


def cmd_save(args) -> int:
    import hashlib

    from .pipelines.extract import read_extracted
    from .schema import CLI_JOINER

    _init_ray()
    os.makedirs(args.dest_dir, exist_ok=True)
    n = 0
    seen: set[str] = set()
    ds = read_extracted(args.out_dir)
    for batch in ds.iter_batches(batch_size=1024, batch_format="pyarrow"):
        for url, texts, status in zip(batch.column("url").to_pylist(),
                                      batch.column("texts").to_pylist(),
                                      batch.column("status").to_pylist()):
            if status != "ok":
                continue
            # CLI saver joins pages with "\n\n" (llm_food/cli.py:114)
            body = CLI_JOINER.join(texts or [])
            name = f"{_slug(url)}.md"
            if name in seen:
                # distinct urls sharing a basename (e.g. */index.html) must
                # not overwrite each other: disambiguate with a url hash
                h = hashlib.sha256(url.encode("utf-8")).hexdigest()[:8]
                name = f"{_slug(url)}-{h}.md"
            seen.add(name)
            path = os.path.join(args.dest_dir, name)
            with open(path, "w") as f:
                f.write(body)
            n += 1
    print(json.dumps({"saved": n, "dest": args.dest_dir}))
    return 0


def cmd_chunk(args) -> int:
    from .config import ChunkConfig
    from .pipelines.extract import read_extracted
    from .stages.chunk import chunk_dataset

    _init_ray()
    cfg = ChunkConfig(strategy=args.strategy, chunk_size=args.size,
                      chunk_overlap=args.overlap)
    ds = read_extracted(args.out_dir)
    chunks = chunk_dataset(ds, cfg, text_column="texts")
    chunks.write_parquet(args.dest_dir, min_rows_per_file=200_000)
    print(json.dumps({"dest": args.dest_dir}))
    return 0



def cmd_curate(args) -> int:
    """Composed curation over extracted output: repetition quality filter
    → PII scrub → exact dedup on the scrubbed text → md5 train/test
    split → partitioned parquet (url, clean, split)."""
    import pyarrow as pa

    from .functions.pii import scrub_pii
    from .functions.repetition import (
        passes_repetition_filter,
        repetition_features,
    )
    from .pipelines.extract import read_extracted
    from .stages.dedup import dedup_exact
    from .stages.textstats import hash_split

    _init_ray()

    def filter_scrub(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("status"), "ok"))
        texts = [t or "" for t in batch.column("markdown").to_pylist()]
        keep, clean = [], []
        for t in texts:
            keep.append(passes_repetition_filter(repetition_features(t)))
            clean.append(scrub_pii(t))
        t2 = pa.table({"url": batch.column("url"),
                       "clean": pa.array(clean, pa.string())})
        return t2.filter(pa.array(keep, pa.bool_()))

    ds = (read_extracted(args.out_dir)
          .map_batches(filter_scrub, batch_format="pyarrow"))
    ds = hash_split(dedup_exact(ds, "url", "clean"), "url",
                    test_pct=args.test_pct).materialize()
    n = ds.count()
    ds.write_parquet(args.dest_dir, min_rows_per_file=200_000)
    print(json.dumps({"dest": args.dest_dir, "curated": n}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llm_food_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract")
    pe.add_argument("in_dir")
    pe.add_argument("out_dir")
    pe.add_argument("--groups", type=int, default=None)
    pe.add_argument("--concurrent-groups", type=int, default=1,
                    help="overlap this many group executions (resume "
                         "granularity is unchanged)")
    pe.add_argument("--backend", default="auto",
                    choices=["auto", "structured", "structured_layout",
                             "plain", "pdf_oxide", "pymupdf4llm", "pypdf2",
                             "gemini"])
    pe.set_defaults(fn=cmd_extract)

    ps = sub.add_parser("status")
    ps.add_argument("out_dir")
    ps.set_defaults(fn=cmd_status)

    pv = sub.add_parser("save")
    pv.add_argument("out_dir")
    pv.add_argument("dest_dir")
    pv.set_defaults(fn=cmd_save)

    pc = sub.add_parser("chunk")
    pc.add_argument("out_dir")
    pc.add_argument("dest_dir")
    pc.add_argument("--strategy", default="token",
                    choices=["token", "sentence", "recursive"])
    pc.add_argument("--size", type=int, default=512)
    pc.add_argument("--overlap", type=int, default=128)
    pc.set_defaults(fn=cmd_chunk)

    pu = sub.add_parser("curate")
    pu.add_argument("out_dir")
    pu.add_argument("dest_dir")
    pu.add_argument("--test-pct", type=int, default=10)
    pu.set_defaults(fn=cmd_curate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
