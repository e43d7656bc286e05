"""PageRank semantics: hand-checked iterations, damping, danglers."""


def test_pagerank_two_node_cycle(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import pagerank

    # a <-> b: symmetric, stationary at 0.5 each from the uniform start
    edges = [{"src": "a", "dst": "b", "w": 1},
             {"src": "b", "dst": "a", "w": 1}]
    out = (pagerank(dataset_from_items(edges), iters=3)
           .to_pandas().set_index("node")["pr"])
    assert out["a"] == out["b"] == 0.5


def test_pagerank_weighted_and_dangling(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import pagerank

    # a splits 3:1 between b and c; b,c dangle (mass dropped)
    edges = [{"src": "a", "dst": "b", "w": 3},
             {"src": "a", "dst": "c", "w": 1}]
    out = (pagerank(dataset_from_items(edges), iters=1, damping=0.85)
           .to_pandas().set_index("node")["pr"])
    n = 3
    base = (1 - 0.85) / n
    pr0 = round(1 / n, 12)
    assert out["a"] == round(base, 12)                      # no in-edges
    assert out["b"] == round(base + 0.85 * (pr0 / 4 * 3), 12)
    assert out["c"] == round(base + 0.85 * (pr0 / 4 * 1), 12)
    # rank vector sums to < 1 after the dangling drop (documented)
    assert out.sum() < 1.0


def test_pagerank_unweighted_default(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import pagerank

    edges = [{"src": "a", "dst": "b"}, {"src": "a", "dst": "c"}]
    out = (pagerank(dataset_from_items(edges), weight=None, iters=1)
           .to_pandas().set_index("node")["pr"])
    assert out["b"] == out["c"] > out["a"]


def test_pagerank_join_plan_matches_broadcast(ray_session):
    """exec='join' (distributed rank state) must be bit-identical to
    exec='broadcast' — same rounding, different physical plan."""
    import random

    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import pagerank

    rng = random.Random(5)
    nodes = [f"n{i}" for i in range(40)]
    edges = [{"src": rng.choice(nodes), "dst": rng.choice(nodes),
              "w": rng.randint(1, 5)} for _ in range(150)]
    a = (pagerank(dataset_from_items(edges), iters=4, exec="broadcast")
         .to_pandas().sort_values("node").reset_index(drop=True))
    b = (pagerank(dataset_from_items(edges), iters=4, exec="join")
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert a.equals(b)


def test_connected_components_wrapper(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import connected_components

    edges = [{"src": 5, "dst": 2}, {"src": 2, "dst": 9},
             {"src": 30, "dst": 31}]
    out = (connected_components(dataset_from_items(edges))
           .to_pandas().set_index("node")["component"].to_dict())
    assert out == {2: 2, 5: 2, 9: 2, 30: 30, 31: 30}


def test_hits_bipartite_directions(ray_session):
    """On a bipartite src→dst graph, sources are pure hubs and
    destinations pure authorities."""
    import ray.data as rd

    from llm_food_ray.stages.graph import hits

    edges = rd.from_items([
        {"src": "u1", "dst": "v1", "w": 1.0},
        {"src": "u1", "dst": "v2", "w": 1.0},
        {"src": "u2", "dst": "v1", "w": 1.0},
        {"src": "u3", "dst": "v3", "w": 1.0},
    ])
    out = {r["node"]: (r["hub"], r["authority"])
           for r in hits(edges, iters=3).take_all()}
    assert len(out) == 6
    for u in ("u1", "u2", "u3"):
        assert out[u][0] > 0 and out[u][1] == 0.0
    for v in ("v1", "v2", "v3"):
        assert out[v][0] == 0.0 and out[v][1] > 0
    # u1 links to both popular targets -> the max hub (score 1 after
    # max-normalization); v1 has two hubs pointing in -> max authority
    assert out["u1"][0] == 1.0
    assert out["v1"][1] == 1.0
    assert out["u1"][0] > out["u2"][0]
    assert out["v1"][1] > out["v3"][1]


def test_hits_weighted_edges_shift_scores(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.graph import hits

    def scores(w13):
        edges = rd.from_items([
            {"src": "a", "dst": "x", "w": 1.0},
            {"src": "b", "dst": "y", "w": 1.0},
            {"src": "a", "dst": "y", "w": w13},
        ])
        return {r["node"]: (r["hub"], r["authority"])
                for r in hits(edges, iters=4).take_all()}

    light, heavy = scores(0.1), scores(10.0)
    # pushing weight onto a->y raises y's authority relative to x
    assert heavy["y"][1] >= light["y"][1]
    assert heavy["x"][1] < light["x"][1] or heavy["y"][1] > light["y"][1]


def test_hits_empty_graph(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.graph import hits

    import pyarrow as pa

    empty = rd.from_arrow(pa.table({
        "src": pa.array([], pa.string()),
        "dst": pa.array([], pa.string()),
        "w": pa.array([], pa.float64())}))
    assert hits(empty, iters=2).count() == 0


def test_personalized_pagerank_concentrates_on_seed_neighborhood(
        ray_session):
    import ray.data as rd

    from llm_food_ray.stages.graph import pagerank

    edges = rd.from_items([
        {"src": "a", "dst": "x", "w": 1.0},
        {"src": "b", "dst": "y", "w": 1.0},
        {"src": "x", "dst": "z", "w": 1.0},
        {"src": "y", "dst": "z", "w": 1.0},
    ])
    out = {r["node"]: r["pr"] for r in
           pagerank(edges, iters=4, personalize=["a"]).take_all()}
    # mass flows from the seed: a > x > (z) ; b and y see no teleport
    assert out["a"] > out["b"]
    assert out["x"] > out["y"]
    assert out["b"] == 0.0  # unreachable from the seed, no teleport


def test_personalized_pagerank_plans_byte_equal(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.graph import pagerank

    edges = rd.from_items([
        {"src": f"n{i}", "dst": f"n{(i * 3 + 1) % 17}", "w": 1.0 + i % 4}
        for i in range(40)
    ])
    a = sorted((r["node"], r["pr"]) for r in
               pagerank(edges, iters=3, exec="broadcast",
                        personalize=["n1", "n5"]).take_all())
    b = sorted((r["node"], r["pr"]) for r in
               pagerank(edges, iters=3, exec="join",
                        personalize=["n1", "n5"]).take_all())
    assert a == b and len(a) > 10


def test_cocitation_pairs_shared_targets(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.graph import cocitation_pairs

    edges = rd.from_items([
        {"src": "a", "dst": "x"}, {"src": "a", "dst": "y"},
        {"src": "b", "dst": "x"}, {"src": "b", "dst": "y"},
        {"src": "c", "dst": "y"}, {"src": "c", "dst": "z"},
        {"src": "a", "dst": "x"},  # duplicate edge: counted once
        # a mega-hub everyone links to carries no signal
        {"src": "a", "dst": "hub"}, {"src": "b", "dst": "hub"},
        {"src": "c", "dst": "hub"}, {"src": "d", "dst": "hub"},
    ])
    out = {(r["a"], r["b"]): r["shared"] for r in
           cocitation_pairs(edges, max_in_degree=3,
                            min_shared=1).take_all()}
    assert out[("a", "b")] == 2          # x and y shared, hub pruned
    assert out[("a", "c")] == 1          # y only
    assert out[("b", "c")] == 1
    assert ("a", "d") not in out          # only the pruned hub shared


def test_triangle_counts_known_graph(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, 3 per node) plus a pendant 4-5 and
    # a duplicate + reversed + self-loop edge that canonicalization
    # must absorb
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (2, 1), (3, 3), (1, 2)]
    ds = dataset_from_items([{"src": a, "dst": b} for a, b in edges])
    out = (triangle_counts(ds).to_pandas()
           .set_index("node")["n_triangles"].to_dict())
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_matches_bruteforce_random(ray_session):
    import itertools

    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import triangle_counts

    rng = np.random.RandomState(7)
    n = 30
    pairs = [(a, b) for a in range(n) for b in range(a + 1, n)
             if rng.rand() < 0.25]
    adj = {v: set() for v in range(n)}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    expect = {}
    for x, y, z in itertools.combinations(range(n), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for v in (x, y, z):
                expect[v] = expect.get(v, 0) + 1
    ds = dataset_from_items([{"src": a, "dst": b} for a, b in pairs])
    out = (triangle_counts(ds, num_buckets=8).to_pandas()
           .set_index("node")["n_triangles"].to_dict())
    assert out == expect


def test_kcore_cascade_peels_tail_keeps_cycle(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import kcore

    # 4-cycle 1-2-3-4 with a pendant path 5-6 hanging off node 1:
    # k=2 peels 6 in round 1, then 5 in round 2; the cycle survives
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 5), (5, 6)]
    ds = dataset_from_items([{"src": a, "dst": b} for a, b in edges])
    out = (kcore(ds, k=2, rounds=3).to_pandas()
           .set_index("node")["deg"].to_dict())
    assert out == {1: 2, 2: 2, 3: 2, 4: 2}


def test_kcore_rounds_bounded_semantics(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import kcore

    # same graph, rounds=1: only node 6 is gone; 5 survives one round
    # with its remaining degree 1 — exactly-rounds peeling, not fixpoint
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 5), (5, 6)]
    ds = dataset_from_items([{"src": a, "dst": b} for a, b in edges])
    out = (kcore(ds, k=2, rounds=1).to_pandas()
           .set_index("node")["deg"].to_dict())
    assert out == {1: 3, 2: 2, 3: 2, 4: 2, 5: 1}


def test_kcore_fully_peeled_returns_empty(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import kcore

    # a path peels to nothing under k=2 in enough rounds
    edges = [(1, 2), (2, 3), (3, 4)]
    ds = dataset_from_items([{"src": a, "dst": b} for a, b in edges])
    # (columns not asserted: Ray drops the schema of all-empty
    # datasets — the repo-wide "pick non-empty thresholds" gotcha)
    df = kcore(ds, k=2, rounds=3).to_pandas()
    assert len(df) == 0


def test_clustering_coefficients_known_graph(ray_session):
    import pandas as pd

    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import clustering_coefficients

    # triangle 1-2-3 plus pendant 3-4: nodes 1,2 have coef 1.0 (deg 2,
    # 1 triangle); node 3 deg 3, 1 triangle -> 2/(3*2) = 0.333333;
    # node 4 deg 1 -> NULL, 0 triangles
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    ds = dataset_from_items([{"src": a, "dst": b} for a, b in edges])
    out = (clustering_coefficients(ds).to_pandas().set_index("node")
           .sort_index())
    assert out.loc[1, "coef"] == 1.0
    assert out.loc[2, "coef"] == 1.0
    assert out.loc[3, "coef"] == 0.333333
    assert int(out.loc[3, "deg"]) == 3
    assert pd.isna(out.loc[4, "coef"])
    assert int(out.loc[4, "n_triangles"]) == 0


def test_clustering_coefficients_triangle_free(ray_session):
    import pandas as pd

    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import clustering_coefficients

    # star graph: no triangles anywhere; hub deg 3 coef 0.0, leaves NULL
    edges = [(0, 1), (0, 2), (0, 3)]
    ds = dataset_from_items([{"src": a, "dst": b} for a, b in edges])
    out = clustering_coefficients(ds).to_pandas().set_index("node")
    assert out.loc[0, "coef"] == 0.0
    assert all(pd.isna(out.loc[i, "coef"]) for i in (1, 2, 3))


def test_label_propagation_majority_ties_and_clamping(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import label_propagation

    edges = [(1, 2), (1, 3), (3, 5), (3, 4), (4, 5), (1, 5), (9, 10)]
    seeds = [{"node": 1, "label": "a"}, {"node": 5, "label": "b"}]
    ds_e = dataset_from_items([{"src": a, "dst": b} for a, b in edges])
    ds_s = dataset_from_items(seeds)

    # round 1: 2<-a (only nbr 1); 3 ties a/b -> a; 4<-b (only nbr 5);
    # seeds stay clamped despite opposite-label neighbors
    r1 = (label_propagation(ds_e, ds_s, rounds=1, num_buckets=4)
          .to_pandas().set_index("node")["label"].to_dict())
    assert r1 == {1: "a", 5: "b", 2: "a", 3: "a", 4: "b"}

    # round 2 (synchronous): 3 now sees a(1) vs b(4,5) -> b;
    # 4 sees a(3) vs b(5) -> tie -> a; the 9-10 island stays unlabeled
    r2 = (label_propagation(ds_e, ds_s, rounds=2, num_buckets=4)
          .to_pandas().set_index("node")["label"].to_dict())
    assert r2 == {1: "a", 5: "b", 2: "a", 3: "b", 4: "a"}


def test_kcore_plans_byte_equal(ray_session):
    import random

    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import kcore

    rng = random.Random(3)
    edges = [{"src": rng.randint(0, 40), "dst": rng.randint(0, 40)}
             for _ in range(160)]
    ds = dataset_from_items(edges)
    a = (kcore(ds, k=4, rounds=3, exec="broadcast").to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (kcore(ds, k=4, rounds=3, exec="join").to_pandas()
         .sort_values("node").reset_index(drop=True))
    assert len(a) > 0
    assert a.equals(b)


def test_bfs_depth_levels_and_min_over_seeds(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import bfs_depth

    # path 1->2->3->4->5 plus a shortcut seed at 4
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    ds_e = dataset_from_items([{"src": a, "dst": b} for a, b in edges])
    ds_s = dataset_from_items([{"node": 1}, {"node": 4}])
    out = (bfs_depth(ds_e, ds_s, rounds=3).to_pandas()
           .set_index("node")["depth"].to_dict())
    # 5 is depth 1 via seed 4, not 4 via seed 1; 4 is a seed (0)
    assert out == {1: 0, 2: 1, 3: 2, 4: 0, 5: 1}


def test_bfs_depth_rounds_bounded(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import bfs_depth

    edges = [(1, 2), (2, 3), (3, 4)]
    ds_e = dataset_from_items([{"src": a, "dst": b} for a, b in edges])
    ds_s = dataset_from_items([{"node": 1}])
    out = (bfs_depth(ds_e, ds_s, rounds=2).to_pandas()
           .set_index("node")["depth"].to_dict())
    # node 4 is 3 hops away: unreached at rounds=2
    assert out == {1: 0, 2: 1, 3: 2}


def test_reciprocity_mixed_graph(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import reciprocity

    # 1<->2 mutual; 1->3 one-way; 3->2 one-way; duplicate edge absorbed
    edges = [(1, 2), (2, 1), (1, 3), (3, 2), (1, 2)]
    ds = dataset_from_items([{"src": a, "dst": b} for a, b in edges])
    out = (reciprocity(ds).to_pandas().set_index("node"))
    assert out.loc[1, "n_out"] == 2 and out.loc[1, "n_recip"] == 1
    assert out.loc[1, "reciprocity"] == 0.5
    assert out.loc[2, "n_out"] == 1 and out.loc[2, "n_recip"] == 1
    assert out.loc[2, "reciprocity"] == 1.0
    assert out.loc[3, "n_out"] == 1 and out.loc[3, "n_recip"] == 0
    assert out.loc[3, "reciprocity"] == 0.0


def test_harmonic_centrality_path_graph(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import harmonic_centrality

    # path 1->2->3->4, seeds {1, 3}: scale 360360
    edges = [(1, 2), (2, 3), (3, 4)]
    ds_e = dataset_from_items([{"src": a, "dst": b} for a, b in edges])
    ds_s = dataset_from_items([{"node": 1}, {"node": 3}])
    out = (harmonic_centrality(ds_e, ds_s, rounds=3).to_pandas()
           .set_index("node"))
    s = 360360
    # node 2: d(1,2)=1 only (3 can't reach 2) -> 1/1
    assert out.loc[2, "h_num"] == s
    assert out.loc[2, "n_reached"] == 1
    assert out.loc[2, "harmonic"] == 1.0
    # node 3: d(1,3)=2; self excluded -> 1/2
    assert out.loc[3, "h_num"] == s // 2
    # node 4: d(1,4)=3, d(3,4)=1 -> 1/3 + 1
    assert out.loc[4, "h_num"] == s // 3 + s
    assert out.loc[4, "n_reached"] == 2
    # node 1: no inbound edges, no contribution -> absent
    assert 1 not in out.index


def test_harmonic_centrality_rounds_bound_and_min_path(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import harmonic_centrality

    # two paths from seed 1 to node 4: length 2 (via 5) and 3 (via 2,3)
    edges = [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4)]
    ds_e = dataset_from_items([{"src": a, "dst": b} for a, b in edges])
    ds_s = dataset_from_items([{"node": 1}])
    out = (harmonic_centrality(ds_e, ds_s, rounds=2).to_pandas()
           .set_index("node"))
    # min distance wins: d(1,4)=2
    assert out.loc[4, "h_num"] == 360360 // 2
    # rounds=1: node 4 unreached
    out1 = (harmonic_centrality(ds_e, ds_s, rounds=1).to_pandas()
            .set_index("node"))
    assert 4 not in out1.index
    assert set(out1.index) == {2, 5}


def test_harmonic_centrality_plans_identical(ray_session):
    import numpy as np
    import pandas as pd

    from helpers import dataset_from_items

    from llm_food_ray.stages.graph import harmonic_centrality

    rng = np.random.RandomState(13)
    edges = [{"src": int(a), "dst": int(b)}
             for a, b in rng.randint(0, 40, (300, 2)) if a != b]
    seeds = [{"node": int(n)} for n in rng.choice(40, 6, replace=False)]
    outs = []
    for plan in ("broadcast", "join"):
        out = (harmonic_centrality(dataset_from_items(edges),
                                   dataset_from_items(seeds),
                                   rounds=3, exec=plan)
               .to_pandas().sort_values("node").reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    with np.testing.assert_raises(ValueError):
        harmonic_centrality(dataset_from_items(edges),
                            dataset_from_items(seeds), exec="bogus")


def test_hits_join_plan_byte_equal(ray_session):
    """The state-as-Dataset plan (exec="join", the 10^8+-node path) is
    byte-identical to the broadcast plan on a mixed weighted graph,
    including int node ids (canonicalized to string) and a node with no
    in-edges."""
    import ray.data as rd

    from llm_food_ray.stages.graph import hits

    edges = rd.from_items([
        {"src": 1, "dst": 2, "w": 2.0},
        {"src": 1, "dst": 3, "w": 1.0},
        {"src": 2, "dst": 3, "w": 1.5},
        {"src": 3, "dst": 2, "w": 0.5},
        {"src": 4, "dst": 2, "w": 1.0},   # node 4: hub only, no in-edges
    ])
    b = {r["node"]: (r["hub"], r["authority"])
         for r in hits(edges, iters=4, exec="broadcast").take_all()}
    j = {r["node"]: (r["hub"], r["authority"])
         for r in hits(edges, iters=4, exec="join",
                       num_partitions=16).take_all()}
    assert b == j
    assert len(b) == 4 and b["4"][1] == 0.0


def test_hits_join_plan_unweighted(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.graph import hits

    edges = rd.from_items([
        {"src": "a", "dst": "b"},
        {"src": "b", "dst": "a"},
        {"src": "a", "dst": "c"},
    ])
    b = {r["node"]: (r["hub"], r["authority"])
         for r in hits(edges, weight=None, iters=3,
                       exec="broadcast").take_all()}
    j = {r["node"]: (r["hub"], r["authority"])
         for r in hits(edges, weight=None, iters=3,
                       exec="join").take_all()}
    assert b == j
