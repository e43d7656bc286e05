"""Generic resumable writer: crash/resume, fingerprint invalidation,
group assignment stability."""

from __future__ import annotations

import os

import pytest


def _factory(sf_docs):
    import pyarrow as pa

    import ray.data as rd

    from llm_food_ray.pipelines.resumable import group_of

    def make(gid, num_groups):
        def pick(b: pa.Table) -> pa.Table:
            g = group_of(b.column("doc_id"), num_groups)
            return b.filter(pa.array(g == gid))

        return rd.from_items(sf_docs).map_batches(
            pick, batch_format="pyarrow")

    return make


DOCS = [{"doc_id": i, "text": f"doc {i}"} for i in range(200)]


def test_write_resumable_roundtrip(ray_session, tmp_path):
    from llm_food_ray.pipelines.resumable import (read_resumable,
                                                  write_resumable)

    out = str(tmp_path / "out")
    res = write_resumable(_factory(DOCS), out, num_groups=4,
                          config_fingerprint="cfg1")
    assert res == {"rows": 200, "skipped_groups": 0}
    back = read_resumable(out).to_pandas()
    assert sorted(back["doc_id"]) == list(range(200))


def test_write_resumable_crash_resume(ray_session, tmp_path, monkeypatch):
    """Kill the run after the first group's manifest; the rerun skips it
    and still produces every row exactly once."""
    from llm_food_ray.pipelines import resumable
    from llm_food_ray.state import manifest as mf

    out = str(tmp_path / "out")
    real_write = mf.write_manifest
    calls = {"n": 0}

    def dying_write(*a, **kw):
        real_write(*a, **kw)
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash")

    monkeypatch.setattr(resumable.mf, "write_manifest", dying_write)
    with pytest.raises(RuntimeError):
        resumable.write_resumable(_factory(DOCS), out, num_groups=4,
                                  config_fingerprint="cfg1")
    monkeypatch.setattr(resumable.mf, "write_manifest", real_write)
    res = resumable.write_resumable(_factory(DOCS), out, num_groups=4,
                                    config_fingerprint="cfg1")
    assert res["skipped_groups"] == 2
    assert res["rows"] == 200
    back = resumable.read_resumable(out).to_pandas()
    assert sorted(back["doc_id"]) == list(range(200))


def test_write_resumable_fingerprint_invalidation(ray_session, tmp_path):
    """A changed config fingerprint rebuilds every partition instead of
    silently serving stale output."""
    from llm_food_ray.pipelines.resumable import write_resumable

    out = str(tmp_path / "out")
    write_resumable(_factory(DOCS), out, num_groups=3,
                    config_fingerprint="v1")
    res = write_resumable(_factory(DOCS), out, num_groups=3,
                          config_fingerprint="v2")
    assert res == {"rows": 200, "skipped_groups": 0}


def test_partial_partition_invisible_until_manifest(ray_session, tmp_path):
    """Data files without a manifest (interrupted mid-write) are not
    readable and get rebuilt."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from llm_food_ray.pipelines.resumable import (read_resumable,
                                                  write_resumable)

    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "part=0"))
    pq.write_table(pa.table({"doc_id": [999], "text": ["junk"]}),
                   os.path.join(out, "part=0", "junk.parquet"))
    assert read_resumable(out).count() == 0
    res = write_resumable(_factory(DOCS), out, num_groups=2,
                          config_fingerprint="v1")
    assert res["rows"] == 200
    back = read_resumable(out).to_pandas()
    assert 999 not in set(back["doc_id"])
