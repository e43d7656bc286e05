"""safe_join (stages/joins.py): the empty-schema-block join hazard.

Ray's hash-shuffle operators emit zero-row blocks with an EMPTY schema
for empty partitions; a downstream pyarrow join crashes key resolution
(`ArrowInvalid: No match or multiple matches for key field reference`)
in any join partition that receives only them — a LAYOUT-DEPENDENT
flake (the round-4 driver hit it on `distinctive_terms`).  These tests
force that layout deliberately: a tiny corpus aggregated into many more
hash partitions than rows guarantees empty shuffle partitions on the
join inputs, then drives them through safe_join and through every
join-bearing operator family.
"""
from __future__ import annotations

import pyarrow as pa
import pytest


def _shuffled(rows: dict, nparts: int = 16):
    """A Dataset that has been through a hash aggregate with far more
    partitions than rows — the shape whose empty partitions triggered
    the round-4 flake."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.from_arrow(pa.table(rows))
    first = next(iter(rows))
    other = [c for c in rows if c != first]
    agg = ds.groupby(first, num_partitions=nparts).aggregate(
        *[Sum(c, alias_name=c) for c in other])
    return agg


def _poisoned(rows: dict):
    """A Dataset whose block list contains a zero-column zero-row table
    alongside real blocks — the poisoned layout Ray's shuffle leaves
    behind for empty partitions."""
    import ray
    import ray.data as rd

    return rd.from_arrow_refs([ray.put(pa.table(rows)),
                               ray.put(pa.table({}))])


class TestSafeJoin:
    def test_hazard_is_real_without_safe_join(self, ray_session):
        # the deterministic core of the hazard class: an all-empty side
        # always breaks pyarrow's key resolution in Ray's join finalize
        # (even when its one block DOES carry a schema).  If this stops
        # failing, Ray fixed the hazard and safe_join can be simplified.
        import ray.data as rd

        left = rd.from_arrow(pa.table({"k": ["a"], "v": [1]}))
        right = rd.from_arrow(pa.table({"k": pa.array([], pa.string()),
                                        "w": pa.array([], pa.int64())}))
        with pytest.raises(Exception, match="No match|FieldRef|empty"):
            left.join(right, "inner", 2, on=("k",)).materialize()

    def test_poisoned_block_layout_joins_clean(self, ray_session):
        from llm_food_ray.stages.joins import safe_join

        left = _poisoned({"k": ["a", "b", "c"], "v": [1, 2, 3]})
        right = _poisoned({"k": ["b", "c"], "w": [20, 30]})
        out = safe_join(left, right, "inner", 8, on=("k",))
        got = sorted((r["k"], r["v"], r["w"]) for r in out.take_all())
        assert got == [("b", 2, 20), ("c", 3, 30)]

    def test_inner_with_shuffled_sides(self, ray_session):
        from llm_food_ray.stages.joins import safe_join

        left = _shuffled({"k": ["a", "b", "c"], "v": [1, 2, 3]})
        right = _shuffled({"k": ["b", "c", "d"], "w": [20, 30, 40]})
        out = safe_join(left, right, "inner", 32, on=("k",))
        got = sorted((r["k"], r["v"], r["w"]) for r in out.take_all())
        assert got == [("b", 2, 20), ("c", 3, 30)]

    def test_inner_with_all_empty_right_returns_none(self, ray_session):
        import ray.data as rd

        from llm_food_ray.stages.joins import safe_join

        left = rd.from_arrow(pa.table({"k": ["a"], "v": [1]}))
        right = _shuffled({"k": pa.array([], pa.string()),
                           "w": pa.array([], pa.int64())})
        assert safe_join(left, right, "inner", 8, on=("k",)) is None

    def test_left_anti_with_all_empty_right_is_left(self, ray_session):
        import ray.data as rd

        from llm_food_ray.stages.joins import safe_join

        left = rd.from_arrow(pa.table({"k": ["a", "b"], "v": [1, 2]}))
        right = _shuffled({"k": pa.array([], pa.string()),
                           "w": pa.array([], pa.int64())})
        out = safe_join(left, right, "left_anti", 8, on=("k",))
        assert sorted(r["k"] for r in out.take_all()) == ["a", "b"]

    def test_left_outer_empty_right_null_pads(self, ray_session):
        import ray.data as rd

        from llm_food_ray.stages.joins import safe_join

        left = rd.from_arrow(pa.table({"k": ["a"], "v": [1]}))
        right = _shuffled({"k": pa.array([], pa.string()),
                           "w": pa.array([], pa.int64())})
        out = safe_join(left, right, "left_outer", 8, on=("k",),
                        right_empty_fill={"w": pa.int64()})
        rows = out.take_all()
        assert rows[0]["v"] == 1 and rows[0]["w"] is None

    def test_left_outer_empty_right_without_fill_raises(self, ray_session):
        import ray.data as rd

        from llm_food_ray.stages.joins import safe_join

        left = rd.from_arrow(pa.table({"k": ["a"], "v": [1]}))
        right = _shuffled({"k": pa.array([], pa.string()),
                           "w": pa.array([], pa.int64())})
        with pytest.raises(ValueError, match="right_empty_fill"):
            safe_join(left, right, "left_outer", 8, on=("k",))

    def test_no_bare_dataset_join_outside_joins_module(self):
        """Structural guard: every Dataset join must route through
        safe_join — a bare `.join(X, "<join type>"` anywhere else
        reintroduces the flake."""
        import re
        from pathlib import Path

        root = Path(__file__).resolve().parent.parent
        offenders = []
        paths = list((root / "llm_food_ray").rglob("*.py"))
        paths += [root / "__ray_entry__.py", root / "bench.py"]
        pat = re.compile(
            r'\.join\(\s*[^)"\']*,\s*"(inner|left_outer|left_semi|'
            r'left_anti|right_outer|full_outer)"', re.S)
        for path in paths:
            if path.name == "joins.py":
                continue
            src = path.read_text()
            for m in pat.finditer(src):
                line = src[:m.start()].count("\n") + 1
                offenders.append(f"{path.name}:{line}")
        assert not offenders, f"bare Dataset.join at {offenders}"


class TestOperatorFamiliesUnderEmptyPartitions:
    """Tiny inputs + the operators' own shuffle plans: every family that
    joins must survive layouts where most hash partitions are empty."""

    def test_distinctive_terms_tiny(self, ray_session):
        # the round-4 driver failure: 2 groups / 3 docs through a
        # 16-way join layout
        import ray.data as rd

        from llm_food_ray.stages.search import distinctive_terms

        ds = rd.from_arrow(pa.table({
            "g": ["a", "a", "b"],
            "text": ["apples and pears", "apples again", "rust belts"]}))
        out = distinctive_terms(ds, "g", "text", k=2,
                                num_partitions=16).take_all()
        assert {r["g"] for r in out} == {"a", "b"}
        terms_a = {r["term"] for r in out if r["g"] == "a"}
        assert "apples" in terms_a

    def test_dedup_exact_and_against_tiny(self, ray_session):
        import ray.data as rd

        from llm_food_ray.stages.dedup import dedup_against, dedup_exact

        ds = rd.from_arrow(pa.table({
            "doc_id": [1, 2, 3], "text": ["x", "x", "y"]}))
        out = dedup_exact(ds, "doc_id", "text", reduce="shuffle")
        assert sorted(r["doc_id"] for r in out.take_all()) == [1, 3]
        seen = rd.from_arrow(pa.table({"doc_id": [9], "text": ["y"]}))
        kept = dedup_against(ds, seen, text_column="text", exec="anti",
                             num_partitions=16)
        assert sorted(r["doc_id"] for r in kept.take_all()) == [1, 2]

    def test_graph_family_tiny(self, ray_session):
        import ray.data as rd

        from llm_food_ray.stages.graph import (bfs_depth, pagerank,
                                               reciprocity)

        edges = rd.from_arrow(pa.table({
            "src": [1, 2], "dst": [2, 1], "w": [1.0, 1.0]}))
        pr = pagerank(edges, iters=2, exec="join",
                      num_partitions=16).take_all()
        assert len(pr) == 2
        rc = reciprocity(edges, src="src", dst="dst").take_all()
        assert all(r["reciprocity"] == 1.0 for r in rc)
        seeds = rd.from_arrow(pa.table({"node": [1]}))
        bf = bfs_depth(edges, seeds, src="src", dst="dst",
                       rounds=4).take_all()
        assert {(r["node"], r["depth"]) for r in bf} == {(1, 0), (2, 1)}

    def test_reciprocity_no_reciprocal_edges(self, ray_session):
        # forces the all-empty inner-join result inside reciprocity
        import ray.data as rd

        from llm_food_ray.stages.graph import reciprocity

        edges = rd.from_arrow(pa.table({"src": [1, 2], "dst": [2, 3]}))
        # drop the 2->1 back edge: node 1 and 2 have n_recip 0
        edges = rd.from_arrow(pa.table({"src": [1], "dst": [2]}))
        out = reciprocity(edges, src="src", dst="dst").take_all()
        assert out and all(r["n_recip"] == 0 for r in out)

    def test_sessions_cohort_tiny(self, ray_session):
        import ray.data as rd

        from llm_food_ray.stages.sessions import cohort_retention

        ds = rd.from_arrow(pa.table({
            "user_id": ["u1", "u1", "u2"],
            "ts": [0, 700_000, 100]}))
        out = cohort_retention(ds, "user_id", "ts").take_all()
        assert out  # (cohort_week, week_offset) rows survive the joins

    def test_crawl_diff_empty_sides(self, ray_session):
        import ray.data as rd

        from llm_food_ray.stages.dedup import crawl_diff

        old = rd.from_arrow(pa.table({"url": ["a"], "h": ["1"]}))
        new = rd.from_arrow(pa.table({"url": pa.array([], pa.string()),
                                      "h": pa.array([], pa.string())}))
        out = crawl_diff(old, new, "url", "h").take_all()
        assert [(r["url"], r["change"]) for r in out] == [("a", "removed")]
        out2 = crawl_diff(new, old, "url", "h").take_all()
        assert [(r["url"], r["change"]) for r in out2] == [("a", "added")]
        out3 = crawl_diff(new, new, "url", "h").take_all()
        assert out3 == []
