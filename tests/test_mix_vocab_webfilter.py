"""Tests for the round-4 additions: temperature mixing, grouped mode,
BPE pair counting, and the domain-suffix blocklist filter."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pytest

from llm_food_ray.stages.textstats import grouped_mode, temperature_sample
from llm_food_ray.stages.vocab import top_char_pairs
from llm_food_ray.stages.webfilter import filter_blocked_hosts


def _from_pandas(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_temperature_sample_budgets_match_closed_form(ray_session):
    df = pd.DataFrame({"g": ["en"] * 100 + ["zh"] * 25 + ["de"] * 4,
                       "id": range(129)})
    out = temperature_sample(_from_pandas(df), "g", "id",
                             budget=30).to_pandas()
    got = out.groupby("g").size().to_dict()
    den = math.sqrt(100) + math.sqrt(25) + math.sqrt(4)
    want = {g: int(math.floor(round(30 * math.sqrt(n) / den, 9)))
            for g, n in [("en", 100), ("zh", 25), ("de", 4)]}
    assert got == want
    # flattening: the big group's share shrinks vs its natural share
    assert got["en"] / 30 < 100 / 129
    assert got["de"] / 30 > 4 / 129


def test_temperature_sample_alpha_one_is_proportional(ray_session):
    df = pd.DataFrame({"g": ["a"] * 80 + ["b"] * 20, "id": range(100)})
    out = temperature_sample(_from_pandas(df), "g", "id",
                             budget=50, alpha=1.0).to_pandas()
    got = out.groupby("g").size().to_dict()
    assert got == {"a": 40, "b": 10}


def test_temperature_sample_is_deterministic_subset(ray_session):
    df = pd.DataFrame({"g": ["a"] * 40 + ["b"] * 10, "id": range(50)})
    a = temperature_sample(_from_pandas(df), "g", "id", budget=20)
    b = temperature_sample(_from_pandas(df), "g", "id", budget=20)
    assert sorted(a.to_pandas()["id"]) == sorted(b.to_pandas()["id"])


def test_grouped_mode_ties_break_to_smallest_value(ray_session):
    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "b", "b", "c"],
        "v": ["y", "y", "x", "w", "z", "z", "w", "q"],
    })
    out = (grouped_mode(_from_pandas(df), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(out["k"]) == ["a", "b", "c"]
    assert list(out["mode_value"]) == ["y", "w", "q"]  # b: w/z tie → w
    assert list(out["n"]) == [2, 2, 1]


def test_grouped_mode_matches_pandas_on_random_data(ray_session):
    import numpy as np

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "k": rng.choice(list("abcdefgh"), 500),
        "v": rng.randint(0, 6, 500),
    })
    out = (grouped_mode(_from_pandas(df), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.groupby(["k", "v"]).size().rename("n").reset_index()
            .sort_values(["k", "n", "v"], ascending=[True, False, True])
            .groupby("k").head(1).sort_values("k").reset_index(drop=True))
    assert list(out["mode_value"]) == list(want["v"])
    assert list(out["n"]) == list(want["n"])


def test_top_char_pairs_matches_naive_count(ray_session):
    texts = ["hello world", "hello there world", "汉字汉字 mixed up",
             "tab\tsplit and\nnewline", ""]
    df = pd.DataFrame({"text": texts})
    out = top_char_pairs(_from_pandas(df), k=50).to_pandas()
    naive: Counter = Counter()
    seps = set(" \t\r\n\f\v\x00")
    for t in texts:
        for a, b in zip(t, t[1:]):
            if a not in seps and b not in seps:
                naive[a + b] += 1
    got = dict(zip(out["pair"], out["n"]))
    assert got == dict(naive)
    # deterministic (n desc, pair asc) order
    keys = list(zip(-out["n"], out["pair"]))
    assert keys == sorted(keys)


def test_top_char_pairs_never_pairs_across_documents(ray_session):
    df = pd.DataFrame({"text": ["ab", "ba"]})
    out = top_char_pairs(_from_pandas(df), k=10).to_pandas()
    assert sorted(out["pair"]) == ["ab", "ba"]  # no "b|a" doc-crossing pair


def test_blocklist_suffix_semantics(ray_session):
    hosts = ["a.b.example.com", "example.com", "notexample.com",
             "x.example.net", "good.org", "com"]
    df = pd.DataFrame({"h": hosts})
    kept = filter_blocked_hosts(
        _from_pandas(df), "h",
        blocked={"example.com", "example.net"}).to_pandas()
    assert sorted(kept["h"]) == ["com", "good.org", "notexample.com"]
    only = filter_blocked_hosts(
        _from_pandas(df), "h", blocked={"example.com"},
        keep_blocked=True).to_pandas()
    assert sorted(only["h"]) == ["a.b.example.com", "example.com"]


def test_blocklist_tld_level_entry_blocks_subtree(ray_session):
    df = pd.DataFrame({"h": ["deep.sub.x.net", "x.net", "net", "x.org"]})
    kept = filter_blocked_hosts(_from_pandas(df), "h",
                                blocked={"net"}).to_pandas()
    assert sorted(kept["h"]) == ["x.org"]


def test_blocklist_handles_nulls(ray_session):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({"h": pa.array(["bad.com", None, "ok.org"], pa.string())})
    kept = filter_blocked_hosts(rd.from_arrow(t), "h",
                                blocked={"bad.com"}).to_pandas()
    assert list(kept["h"].fillna("<null>")) == ["<null>", "ok.org"]


@pytest.mark.parametrize("alpha", [0.5, 1.0])
def test_temperature_budget_never_exceeded(ray_session, alpha):
    df = pd.DataFrame({"g": ["a"] * 30 + ["b"] * 3, "id": range(33)})
    out = temperature_sample(_from_pandas(df), "g", "id",
                             budget=10, alpha=alpha).to_pandas()
    assert len(out) <= 10


def test_temperature_quota_derivation_matches_duckdb_randomized():
    """Cross-engine pin for the sqrt/round-9/floor quota rule: the
    derivation must agree with DuckDB bit-for-bit across random group
    histograms (the round-9 step is what absorbs denominator
    summation-order ulps — this is the empirical evidence)."""
    import random

    import duckdb

    rng = random.Random(42)
    for _ in range(40):
        k = rng.randint(1, 12)
        sizes = {f"g{i:02d}": rng.randint(1, 10 ** rng.randint(0, 6))
                 for i in range(k)}
        budget = rng.randint(1, 10 ** 5)
        rows = sorted(sizes.items())
        weights = [math.sqrt(n) for _, n in rows]
        den = 0.0
        for w in weights:
            den += w
        py = {g: int(math.floor(round(budget * w / den, 9)))
              for (g, _), w in zip(rows, weights)}
        con = duckdb.connect()
        con.execute("CREATE TABLE g(lang VARCHAR, n BIGINT)")
        con.executemany("INSERT INTO g VALUES (?, ?)", list(sizes.items()))
        db = dict(con.sql(
            f"""WITH den AS (SELECT sum(sqrt(n::DOUBLE)) AS d FROM g)
            SELECT lang,
                   CAST(floor(round({budget} * sqrt(n::DOUBLE) / d, 9))
                        AS BIGINT)
            FROM g, den""").fetchall())
        assert py == db


# --------------------------------------------------------------------------
# bpe_train
# --------------------------------------------------------------------------

def _ref_bpe(texts, num_merges=8, min_word_len=2):
    """Pure-Python Sennrich-style reference: Counter word frequencies,
    naive overlapping pair counts, left-to-right non-overlapping merge."""
    import re
    from collections import Counter

    split_re = re.compile("[ \t\n\r\f\v]+")
    wc = Counter(w for t in texts for w in split_re.split(t or "")
                 if len(w) >= min_word_len)
    words = {w: list(w) for w in wc}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += wc[w]
        if not pairs:
            break
        best_cnt = max(pairs.values())
        l, r = min(p for p, c in pairs.items() if c == best_cnt)
        merges.append((rank, l, r, l + r, best_cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _bpe_rows(ds):
    return [(r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"],
             r["n"]) for r in ds.take_all()]


def test_bpe_train_matches_reference(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.vocab import bpe_train

    texts = ["the cat sat on the mat", "the hat of the cat",
             "low lower lowest newest newer new", ""]
    ds = rd.from_items([{"text": t} for t in texts])
    for nm in (1, 4, 10):
        assert _bpe_rows(bpe_train(ds, num_merges=nm)) == \
            _ref_bpe(texts, num_merges=nm)


def test_bpe_train_self_overlapping_chains(ray_session):
    """'aaaa' must merge left-to-right non-overlapping: (aa)(aa), then
    (aa,aa) — the run-parity rule, where a single string-replace or
    naive mask would drift."""
    import ray.data as rd

    from llm_food_ray.stages.vocab import bpe_train

    texts = ["aa aaa aaaa aaaaa aaaaaa", "ababab ababa bb"]
    ds = rd.from_items([{"text": t} for t in texts])
    for nm in (1, 2, 3, 6):
        assert _bpe_rows(bpe_train(ds, num_merges=nm)) == \
            _ref_bpe(texts, num_merges=nm)


def test_bpe_train_stops_when_no_pairs_left(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.vocab import bpe_train

    ds = rd.from_items([{"text": "ab ab cd"}])
    rows = _bpe_rows(bpe_train(ds, num_merges=50))
    assert [r[3] for r in rows] == ["ab", "cd"]


def test_bpe_train_unicode_words(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.vocab import bpe_train

    texts = ["héllo héllo wörld", "héllo wörld wörld ééé"]
    ds = rd.from_items([{"text": t} for t in texts])
    assert _bpe_rows(bpe_train(ds, num_merges=5)) == \
        _ref_bpe(texts, num_merges=5)


def test_bpe_train_plans_are_byte_equal(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.vocab import bpe_train

    texts = ["the cat sat on the mat", "aaaa aaaa baaa",
             "low lower lowest"]
    ds = rd.from_items([{"text": t} for t in texts])
    a = _bpe_rows(bpe_train(ds, num_merges=6, exec="driver"))
    b = _bpe_rows(bpe_train(ds, num_merges=6, exec="distributed"))
    assert a == b == _ref_bpe(texts, num_merges=6)


def test_bpe_train_duplicate_merged_strings_unify(ray_session):
    """Two merge paths can build the same STRING ('ab'+'c' vs 'a'+'bc');
    the reference identifies symbols by string, so the id-space plan
    must reuse the existing id — counts after the collision diverge
    otherwise."""
    import itertools
    import random

    import ray.data as rd

    from llm_food_ray.stages.vocab import bpe_train

    rng = random.Random(7)
    for trial in range(8):
        words = ["".join(rng.choice("ab") for _ in range(rng.randint(2, 6)))
                 for _ in range(rng.randint(4, 30))]
        texts = [" ".join(words[i::3]) for i in range(3)]
        for nm in (3, 6, 10):
            got = _bpe_rows(bpe_train(
                rd.from_items([{"text": t} for t in texts]), num_merges=nm))
            assert got == _ref_bpe(texts, num_merges=nm), (trial, nm, texts)


def test_top_pmi_pairs_matches_brute_force(ray_session):
    import math
    from collections import Counter

    import ray.data as rd

    from llm_food_ray.functions.repetition import split_words
    from llm_food_ray.stages.textstats import top_pmi_pairs

    texts = ["new york new york city", "san francisco and new york",
             "the city of san francisco", "york new city san",
             "new york san francisco new york"] * 3
    window, min_count = 2, 3
    pairs, unis = Counter(), Counter()
    n_tok = n_ev = 0
    for t in texts:
        ws = split_words(t)
        n_tok += len(ws)
        unis.update(ws)
        for d in range(1, window + 1):
            for x, y in zip(ws, ws[d:]):
                pairs[(x, y) if x <= y else (y, x)] += 1
            n_ev += max(len(ws) - d, 0)
    want = sorted(
        ((a, b, n, round(math.log((float(n) * n_tok * n_tok)
                                  / (n_ev * unis[a] * unis[b])), 6))
         for (a, b), n in pairs.items() if n >= min_count),
        key=lambda r: (-r[3], r[0], r[1]))[:10]
    got = [(r["a"], r["b"], r["n"], r["pmi"]) for r in
           top_pmi_pairs(rd.from_items([{"text": t} for t in texts]),
                         window=window, k=10, min_count=min_count)
           .take_all()]
    assert got == want
    # the classic collocations are retrieved
    found = {g[:2] for g in got}
    assert ("new", "york") in found and ("francisco", "san") in found


def test_keyword_tag_counts_and_sparsity(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.textstats import keyword_tag

    ds = rd.from_items([
        {"doc_id": 1, "text": "fast fast table scan"},
        {"doc_id": 2, "text": "nothing relevant here"},
        {"doc_id": 3, "text": None},
        {"doc_id": 4, "text": "aaa"},  # 'aa' counts once, non-overlapping
    ])
    topics = {"perf": ["fast"], "db": ["table", "scan"], "weird": ["aa"]}
    got = sorted((r["doc_id"], r["topic"], r["hits"])
                 for r in keyword_tag(ds, topics).take_all())
    assert got == [(1, "db", 2), (1, "perf", 2), (4, "weird", 1)]
    # keep_zero emits the dense docs x topics grid
    dense = keyword_tag(ds, topics, keep_zero=True).count()
    assert dense == 4 * 3


def test_keyword_tag_substring_not_word_match(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.textstats import keyword_tag

    ds = rd.from_items([{"doc_id": 1, "text": "scanner rescan"}])
    got = keyword_tag(ds, {"t": ["scan"]}).take_all()
    assert got[0]["hits"] == 2  # substring semantics, documented


def test_profile_table_stats(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.textstats import profile_table

    t = pa.table({
        "k": pa.array([1, 2, 2, None, 5], pa.int64()),
        "s": pa.array(["b", None, "a", "a", "c"], pa.string()),
    })
    out = {r["column"]: r for r in
           profile_table(rd.from_arrow(t), ["k", "s"]).take_all()}
    assert out["k"]["n"] == 5 and out["k"]["nulls"] == 1
    assert out["k"]["n_distinct"] == 3  # nulls excluded
    assert out["k"]["min_s"] == "1" and out["k"]["max_s"] == "5"
    assert out["s"]["nulls"] == 1 and out["s"]["n_distinct"] == 3
    assert out["s"]["min_s"] == "a" and out["s"]["max_s"] == "c"


def test_grouped_corr_matches_numpy(ray_session):
    import numpy as np

    import ray.data as rd

    from llm_food_ray.stages.textstats import grouped_corr

    rng = np.random.RandomState(9)
    rows = []
    for g in "abc":
        x = rng.randint(0, 1000, 200)
        y = (x * 0.5 + rng.randint(0, 300, 200)).astype(int)
        rows += [{"g": g, "x": int(a), "y": int(b)} for a, b in zip(x, y)]
    rows.append({"g": "const", "x": 7, "y": 1})
    rows.append({"g": "const", "x": 7, "y": 2})  # zero x-variance
    out = {r["g"]: r for r in
           grouped_corr(rd.from_items(rows), "g", "x", "y").take_all()}
    for g in "abc":
        xs = np.array([r["x"] for r in rows if r["g"] == g], float)
        ys = np.array([r["y"] for r in rows if r["g"] == g], float)
        want = round(float(np.corrcoef(xs, ys)[0, 1]), 4)
        assert round(out[g]["corr"], 4) == want
        assert out[g]["n"] == 200
    assert out["const"]["corr"] is None or np.isnan(out["const"]["corr"])


def test_cdf_against_strict_cdf_semantics(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.textstats import cdf_against

    ref = rd.from_items([{"doc_id": i, "v": x}
                         for i, x in enumerate([10, 10, 20, 30])])
    new = rd.from_items([{"doc_id": 100 + i, "v": x}
                         for i, x in enumerate([5, 10, 15, 20, 30, 99])])
    out = {r["doc_id"]: r["cdf"]
           for r in cdf_against(new, ref, "v").take_all()}
    # strict |{ref < v}| / 4
    assert out[100] == 0.0      # 5: nothing below
    assert out[101] == 0.0      # 10: strictly-below excludes ties
    assert out[102] == 0.5      # 15: two 10s below
    assert out[103] == 0.5      # 20
    assert out[104] == 0.75     # 30
    assert out[105] == 1.0      # 99: all below


def test_cdf_against_empty_reference(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.textstats import cdf_against

    ref = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                  "v": pa.array([], pa.int64())}))
    new = rd.from_items([{"doc_id": 1, "v": 7}])
    out = cdf_against(new, ref, "v").take_all()
    assert out[0]["cdf"] == 0.0


def test_bpe_token_counts_matches_reference_encode(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.vocab import bpe_token_counts

    texts = ["the cat sat on the mat", "the hat of the cat a",
             "aaaa aaaa baaa", ""]
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(texts)])

    # reference: run _ref_bpe, then re-tokenize each doc's words with
    # the final symbol state
    merges = _ref_bpe(texts, num_merges=3)
    import re

    def ref_count(t):
        total = 0
        for w in re.split("[ \t\n\r\f\v]+", t):
            if not w:
                continue
            if len(w) < 2:
                total += 1
                continue
            syms = list(w)
            for _, l, r, _, _ in merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i+1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            total += len(syms)
        return total

    for exec in ("driver", "distributed"):
        got = {r["doc_id"]: r["n_tokens"] for r in
               bpe_token_counts(ds, num_merges=3, exec=exec).take_all()}
        assert got == {i: ref_count(t) for i, t in enumerate(texts)}


def test_script_stats_fractions(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.textstats import script_stats

    ds = rd.from_items([
        {"doc_id": 1, "text": "abc 12"},
        {"doc_id": 2, "text": "Привет"},
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": "汉字 ok"},
        {"doc_id": 5, "text": None},
    ])
    out = {r["doc_id"]: r for r in script_stats(ds).take_all()}
    assert out[1]["latin_frac"] == 0.5 and out[1]["digit_frac"] == 0.333333
    assert out[2]["cyrillic_frac"] == 1.0 and out[2]["latin_frac"] == 0.0
    assert out[3]["len_cp"] == 0 and out[3]["latin_frac"] == 0.0
    assert out[4]["han_frac"] == 0.4 and out[4]["latin_frac"] == 0.4
    assert out[5]["len_cp"] == 0


def test_script_fractions_half_away_rounding():
    """105/128 codepoints tie exactly at the round-6 grid; the helper
    must round half AWAY (DuckDB's convention), not banker's."""
    from llm_food_ray.functions.textstats import script_fractions

    text = "a" * 105 + " " * 23  # 105 latin of 128 -> 0.8203125
    _, fr = script_fractions([text])
    assert fr["latin"][0] == 0.820313


def test_global_rank_is_total_order(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.textstats import global_rank

    rows = [{"k": i, "score": (i * 37) % 11} for i in range(200)]
    out = global_rank(rd.from_items(rows).repartition(9), "score",
                      tiebreak_column="k").take_all()
    want = sorted(rows, key=lambda r: (r["score"], r["k"]))
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert [r["rank"] for r in by_rank] == list(range(200))
    assert [r["k"] for r in by_rank] == [r["k"] for r in want]


def test_decile_histogram_buckets(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.textstats import decile_histogram

    rows = [{"v": i} for i in range(1, 101)]  # 1..100, clean deciles
    out = {r["bucket"]: (r["n"], r["sum_v"]) for r in
           decile_histogram(rd.from_items(rows), "v").take_all()}
    assert len(out) == 10
    assert all(n == 10 for n, _ in out.values())
    assert out[0] == (10, sum(range(1, 11)))
    assert out[9] == (10, sum(range(91, 101)))
    # heavy ties: constant column -> thresholds coincide -> one bucket
    const = decile_histogram(rd.from_items([{"v": 7}] * 50), "v")
    got = const.take_all()
    assert len(got) == 1 and got[0]["n"] == 50


def test_oov_rate_counts_rare_tokens(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.textstats import oov_rate

    docs = [
        {"doc_id": 1, "text": "aa bb aa bb zz"},   # zz unique -> 1/5 oov
        {"doc_id": 2, "text": "aa bb aa bb"},
        {"doc_id": 3, "text": "qq ww ee"},          # all unique -> 1.0
        {"doc_id": 4, "text": ""},
    ]
    out = {r["doc_id"]: (r["n_tokens"], r["oov_frac"]) for r in
           oov_rate(rd.from_items(docs), min_count=2).take_all()}
    assert out[1] == (5, 0.2)
    assert out[2] == (4, 0.0)
    assert out[3] == (3, 1.0)
    assert out[4] == (0, 0.0)


def test_longest_prefix_policy_precedence(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.webfilter import longest_prefix_policy

    urls = [
        {"url": "h1/p/10/x", "host": "h1", "path": "/p/10/x"},
        {"url": "h1/p/20/x", "host": "h1", "path": "/p/20/x"},
        {"url": "h1/q", "host": "h1", "path": "/q"},
        {"url": "h2/p/10/x", "host": "h2", "path": "/p/10/x"},
    ]
    rules = [
        {"host": "h1", "prefix": "/p/", "allow": False},
        {"host": "h1", "prefix": "/p/1", "allow": True},
        # h2 has no rules at all
    ]
    out = (longest_prefix_policy(dataset_from_items(urls),
                                 dataset_from_items(rules))
           .to_pandas().set_index("url"))
    # /p/1 (len 4, allow) beats /p/ (len 3, deny) on h1
    assert bool(out.loc["h1/p/10/x", "allowed"]) is True
    assert out.loc["h1/p/10/x", "rule"] == "/p/1"
    assert bool(out.loc["h1/p/20/x", "allowed"]) is False
    assert out.loc["h1/p/20/x", "rule"] == "/p/"
    # no matching rule -> default allow, empty rule
    assert bool(out.loc["h1/q", "allowed"]) is True
    assert out.loc["h1/q", "rule"] == ""
    # rules are host-scoped: h1's rules never leak to h2
    assert bool(out.loc["h2/p/10/x", "allowed"]) is True


def test_longest_prefix_policy_no_rules(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.webfilter import longest_prefix_policy

    import pyarrow as pa

    import ray.data as rd

    urls = dataset_from_items(
        [{"url": "h/x", "host": "h", "path": "/x"}])
    rules = rd.from_arrow(pa.table({
        "host": pa.array([], pa.string()),
        "prefix": pa.array([], pa.string()),
        "allow": pa.array([], pa.bool_())}))
    out = longest_prefix_policy(urls, rules,
                                default_allow=False).to_pandas()
    assert out["allowed"].tolist() == [False]
    assert out["rule"].tolist() == [""]


def test_politeness_order_round_robin(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.webfilter import politeness_order

    # skewed frontier: host a has 3 urls, b has 2, c has 1
    urls = [{"url": u, "host": h} for h, us in
            (("a", ["a/1", "a/2", "a/3"]),
             ("b", ["b/1", "b/2"]),
             ("c", ["c/1"]))
            for u in us]
    out = (politeness_order(dataset_from_items(urls), num_buckets=4)
           .to_pandas().sort_values("position"))
    # round-robin: all rank-0 urls (host order a,b,c), then rank-1
    # (a,b), then rank-2 (a)
    assert out["url"].tolist() == ["a/1", "b/1", "c/1",
                                   "a/2", "b/2", "a/3"]
    assert out["position"].tolist() == [0, 1, 2, 3, 4, 5]
    assert out["host_rank"].tolist() == [0, 0, 0, 1, 1, 2]


def test_parse_robots_groups_and_agent_precedence(ray_session):
    """Exact agent group beats *, multi-agent group headers share
    rules, unknown directives/comments/empty Disallow are ignored."""
    import ray.data as rd

    from llm_food_ray.stages.webfilter import parse_robots

    body = "\n".join([
        "User-agent: alpha",
        "User-agent: beta",
        "Disallow: /private/",
        "",
        "User-agent: *",
        "Disallow: /all/   # comment",
        "Allow: /all/ok",
        "Sitemap: https://x.example/sitemap.xml",
        "Disallow:",
    ])
    ds = rd.from_items([{"host": "h", "robots_txt": body}])
    star = sorted((r["prefix"], r["allow"])
                  for r in parse_robots(ds).take_all())
    assert star == [("/all/", False), ("/all/ok", True)]
    beta = sorted((r["prefix"], r["allow"])
                  for r in parse_robots(ds, agent="BETA").take_all())
    assert beta == [("/private/", False)]
    gamma = sorted((r["prefix"], r["allow"])
                   for r in parse_robots(ds, agent="gamma").take_all())
    assert gamma == star   # no exact group -> falls back to *


def test_parse_sitemaps_leaf_index_and_malformed(ray_session):
    import ray.data as rd

    from llm_food_ray.stages.webfilter import parse_sitemaps

    leaf = ('<?xml version="1.0"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            '<url><loc>https://h/x</loc><lastmod>2024-01-01</lastmod>'
            '<priority>0.5</priority></url>'
            '<url><loc>https://h/y</loc></url>'
            '<url><priority>0.9</priority></url>'   # no loc -> dropped
            '</urlset>')
    idx = ('<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
           'sitemap/0.9"><sitemap><loc>https://h/s1.xml</loc></sitemap>'
           '</sitemapindex>')
    ds = rd.from_items([
        {"host": "h", "sitemap_xml": leaf},
        {"host": "i", "sitemap_xml": idx},
        {"host": "j", "sitemap_xml": "<not xml"},
    ])
    rows = sorted((r["host"], r["kind"], r["loc"], r["lastmod"],
                   r["priority"]) for r in parse_sitemaps(ds).take_all())
    assert rows == [
        ("h", "url", "https://h/x", "2024-01-01", 0.5),
        ("h", "url", "https://h/y", "", None),
        ("i", "sitemap", "https://h/s1.xml", "", None),
    ]
