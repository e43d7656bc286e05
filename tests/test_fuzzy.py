"""editdist_pairs: exact distance-1 fuzzy join vs brute-force DP."""


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_editdist_pairs_matches_bruteforce(ray_session):
    import itertools

    from helpers import dataset_from_items

    from llm_food_ray.stages.fuzzy import editdist_pairs

    # substitutions, an insertion, a deletion, an exact duplicate, and
    # far-apart strings that must NOT pair
    vals = ["kitten", "sitten", "kitte", "kittens", "mitten",
            "banana", "banana", "bananna", "zzz", "quartz"]
    rows = [{"k": i, "v": v} for i, v in enumerate(vals)]
    expect = {(a, b, _lev(vals[a], vals[b]))
              for a, b in itertools.combinations(range(len(vals)), 2)
              if _lev(vals[a], vals[b]) <= 1}
    out = editdist_pairs(dataset_from_items(rows), "k", "v",
                         num_buckets=8).to_pandas()
    got = {(int(r.a), int(r.b), int(r.dist)) for r in out.itertuples()}
    assert got == expect
    assert (5, 6, 0) in got  # the exact-duplicate pair at distance 0


def test_editdist_pairs_drops_overlong_and_null(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.fuzzy import editdist_pairs

    rows = [{"k": 1, "v": "short"}, {"k": 2, "v": "shirt"},
            {"k": 3, "v": "x" * 300}, {"k": 4, "v": None}]
    out = editdist_pairs(dataset_from_items(rows), "k", "v",
                         max_len=64, num_buckets=4).to_pandas()
    got = {(int(r.a), int(r.b), int(r.dist)) for r in out.itertuples()}
    assert got == {(1, 2, 1)}


def test_lev_le1_cap_semantics():
    from llm_food_ray.stages.fuzzy import _lev_le1

    cases = [("abc", "abc", 0), ("abc", "abd", 1), ("abc", "ab", 1),
             ("ab", "abc", 1), ("abc", "xbd", 2), ("abcd", "abdc", 2),
             ("", "", 0), ("", "a", 1)]
    for a, b, want in cases:
        assert _lev_le1(a, b) == want, (a, b)
