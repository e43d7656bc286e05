"""Text-analysis tests: language ID, quality, token counts, fingerprints,
and the Ray stage plumbing."""

from __future__ import annotations

from llm_food_ray.functions.textstats import (
    bpe_ish_token_count,
    detect_lang,
    quality_features,
    quality_score,
    token_count,
)
from llm_food_ray.functions.hashing import winnow_fingerprint
from llm_food_ray.stages.textstats import TextStatsStage, text_stats_dataset


def test_detect_lang_basics():
    assert detect_lang("the quick fox is on the hill and it was a good day") == "en"
    assert detect_lang("der Hund ist in dem Haus und das ist nicht gut") == "de"
    assert detect_lang("el perro es de la casa y no es como el gato") == "es"
    assert detect_lang("") == "und"
    assert detect_lang("zzz qqq xxx") == "und"


def test_token_counts():
    assert token_count("a b  c") == 3
    assert token_count("") == 0
    assert bpe_ish_token_count("hello, world!") == 4   # hello , world !


def test_quality_features_and_score_deterministic():
    t = "the cat sat on the mat and it was a fine day for all of them"
    f = quality_features(t)
    assert f["n_words"] == len(t.split()) == 16
    assert 0 < f["stopword_ratio"] <= 1
    assert quality_score(t) == quality_score(t)
    assert 0 <= quality_score(t) <= 1
    assert quality_score("") == 0.0
    assert quality_score("zz " * 200) < quality_score(t) + 0.45


def test_winnow_fingerprint_properties():
    t = "one two three four five six seven eight nine ten eleven twelve"
    fp = winnow_fingerprint(t)
    assert fp == sorted(set(fp))
    assert winnow_fingerprint(t) == fp          # deterministic
    assert winnow_fingerprint("") == []
    # a small edit changes few fingerprint entries but not all
    t2 = t.replace("five", "FIVE")
    fp2 = winnow_fingerprint(t2)
    assert set(fp) & set(fp2)


def test_stage_adds_columns(ray_session):
    from helpers import dataset_from_items

    ds = dataset_from_items([
        {"doc_id": 1, "text": "the cat sat on the mat with a hat"},
        {"doc_id": 2, "text": ""},
    ])
    out = text_stats_dataset(ds).to_pandas()
    for col in ("lang_id", "n_tokens", "n_tokens_bpe", "n_words",
                "mean_word_len", "stopword_ratio", "quality",
                "content_md5", "simhash", "fingerprint_min"):
        assert col in out.columns, col
    assert out.loc[out["doc_id"] == 1, "lang_id"].iloc[0] == "en"
    assert out.loc[out["doc_id"] == 2, "n_tokens"].iloc[0] == 0


def test_stage_feature_selection(ray_session):
    from helpers import dataset_from_items

    ds = dataset_from_items([{"doc_id": 1, "text": "a b c"}])
    out = ds.map_batches(
        TextStatsStage(features=("tokens",)), batch_format="pyarrow"
    ).to_pandas()
    assert "n_tokens" in out.columns and "lang_id" not in out.columns


def test_normalize_text_rules():
    from llm_food_ray.functions.normalize import normalize_text

    # NFC composition
    assert normalize_text("Café") == "Café"
    # control strip (whitespace controls collapse instead)
    assert normalize_text("a\x01b\x02c") == "abc"
    # whitespace collapse + trim
    assert normalize_text("  a\t\tb\r\nc  ") == "a b c"
    # idempotent
    for s in ["Café  x", "\tall\x01 kinds \r\n", "plain text"]:
        once = normalize_text(s)
        assert normalize_text(once) == once
    assert normalize_text("") == ""
    assert normalize_text("\x00\x1f\x7f") == ""


def test_normalize_dataset_stage(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import normalize_dataset

    ds = dataset_from_items([
        {"doc_id": 1, "text": "a  b"},
        {"doc_id": 2, "text": "clean"},
        {"doc_id": 3, "text": None},
    ])
    out = normalize_dataset(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "norm_text"] == "a b" and bool(out.loc[1, "changed"])
    assert out.loc[2, "norm_text"] == "clean" and not bool(out.loc[2, "changed"])
    assert out.loc[3, "norm_text"] == ""


def test_grouped_rollup(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import grouped_rollup

    items = [{"g": f"k{i % 3}", "v": i} for i in range(30)]
    ds = dataset_from_items(items)
    out = grouped_rollup(ds, "g", "v").to_pandas().set_index("g")
    import numpy as np

    for r in range(3):
        vals = np.array([i for i in range(30) if i % 3 == r])
        row = out.loc[f"k{r}"]
        assert row["n_docs"] == len(vals)
        assert row["total"] == vals.sum()
        assert row["vmax"] == vals.max()
        assert row["mean"] == round(vals.sum() / len(vals), 6)


def test_grouped_string_agg(ray_session):
    """Per-key distinct string rollup: counts total occurrences but
    joins the sorted DISTINCT value set; no per-key map_groups (the
    bucket count, not key cardinality, bounds the Python group calls)."""
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import grouped_string_agg

    items = []
    for i in range(120):                      # duplicates across batches
        items.append({"k": f"t{i % 7}", "v": f"a{i % 4}"})
    ds = dataset_from_items(items)
    out = grouped_string_agg(ds, "k", "v", sep="|", num_buckets=4,
                             count_column="n", agg_column="vals")
    df = out.to_pandas().set_index("k")
    assert len(df) == 7
    for t in range(7):
        rows = [(f"t{i % 7}", f"a{i % 4}") for i in range(120)
                if i % 7 == t]
        expect_vals = "|".join(sorted({v for _, v in rows}))
        assert df.loc[f"t{t}", "n"] == len(rows)
        assert df.loc[f"t{t}", "vals"] == expect_vals


def test_grouped_string_agg_single_bucket_empty_safe(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import grouped_string_agg

    ds = dataset_from_items([{"k": "x", "v": "only"}])
    df = grouped_string_agg(ds, "k", "v", num_buckets=16).to_pandas()
    assert len(df) == 1
    assert df.iloc[0]["values"] == "only" and df.iloc[0]["n"] == 1


def test_tier_by_global_quantiles_quartile_semantics(ray_session):
    """quantile_disc thresholds (rank = max(1, ceil(q*n))) and the
    <=-threshold CASE bucketing, duplicates landing in the low tier."""
    import ray.data as rd

    from llm_food_ray.stages.textstats import tier_by_global_quantiles

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    ds = rd.from_items([{"doc_id": i, "v": v} for i, v in enumerate(vals)])
    out = (tier_by_global_quantiles(ds, "v").to_pandas()
           .sort_values("doc_id"))
    # n=8: q25 rank 2 -> 2.0, q50 rank 4 -> 4.0, q75 rank 6 -> 6.0
    assert list(out["tier"]) == [1, 1, 2, 2, 3, 3, 4, 4]

    dup = rd.from_items([{"doc_id": i, "v": 5.0} for i in range(4)])
    out2 = tier_by_global_quantiles(dup, "v").to_pandas()
    assert set(out2["tier"]) == {1}   # all values == every threshold


def test_tier_by_group_quantiles_per_group_tertiles(ray_session):
    """Each group gets its OWN tertile thresholds; duplicates collapse
    to the low tier; a single-value group lands entirely in tier 1."""
    import ray.data as rd

    from llm_food_ray.stages.textstats import tier_by_group_quantiles

    rows = ([{"doc_id": i, "g": "a", "v": float(i + 1)} for i in range(9)]
            + [{"doc_id": 100 + i, "g": "b", "v": float(10 * (i + 1))}
               for i in range(3)]
            + [{"doc_id": 200 + i, "g": "c", "v": 7.0} for i in range(4)])
    ds = rd.from_items(rows)
    out = (tier_by_group_quantiles(ds, "g", "v", qs=(1.0 / 3, 2.0 / 3))
           .to_pandas().sort_values("doc_id"))
    # group a, n=9: t1 = rank ceil(3) = 3.0, t2 = rank 6 -> 6.0
    assert list(out[out["g"] == "a"]["tier"]) == [1, 1, 1, 2, 2, 2, 3, 3, 3]
    # group b, n=3: thresholds 10.0 and 20.0 -> one value per tier
    assert list(out[out["g"] == "b"]["tier"]) == [1, 2, 3]
    # group c: every value equals both thresholds -> all tier 1
    assert list(out[out["g"] == "c"]["tier"]) == [1, 1, 1, 1]


def test_grouped_percent_rank_matches_sql_semantics(ray_session):
    """percent_rank = (min-rank - 1) / (n - 1), ties share the min rank,
    single-row groups are 0.0 — pinned against DuckDB's window function
    on the same frame."""
    import duckdb
    import ray.data as rd

    from llm_food_ray.stages.textstats import grouped_percent_rank

    rows = ([{"doc_id": i, "g": "a", "v": [5, 1, 3, 3, 9][i]}
             for i in range(5)]
            + [{"doc_id": 10, "g": "b", "v": 42}])
    out = (grouped_percent_rank(rd.from_items(rows), "g", "v")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    import pandas as pd

    ref = duckdb.sql("""
        SELECT doc_id, g, v,
               round(percent_rank() OVER (PARTITION BY g ORDER BY v), 9)
                 AS pct_rank
        FROM (SELECT unnest([0,1,2,3,4]) AS doc_id,
                     'a' AS g, unnest([5,1,3,3,9]) AS v
              UNION ALL SELECT 10, 'b', 42)
        ORDER BY doc_id
    """).df()
    assert list(out["pct_rank"]) == list(ref["pct_rank"])
    assert out.loc[out["doc_id"] == 10, "pct_rank"].iloc[0] == 0.0


def test_grouped_percent_rank_table_budget_guard(ray_session):
    """Continuous-domain misuse fails loudly instead of gathering an
    unbounded rank table on the driver."""
    import pytest
    import ray.data as rd

    from llm_food_ray.stages.textstats import grouped_percent_rank

    ds = rd.from_items([{"g": "a", "v": float(i)} for i in range(20)])
    with pytest.raises(ValueError, match="max_table_rows"):
        grouped_percent_rank(ds, "g", "v", max_table_rows=5).to_pandas()


def test_grouped_count_distinct(ray_session):
    import duckdb
    import ray.data as rd

    from llm_food_ray.stages.textstats import grouped_count_distinct

    rows = ([{"g": "a", "v": x} for x in [1, 1, 2, 2, 2, 3]]
            + [{"g": "b", "v": 9}, {"g": "b", "v": 9}])
    out = (grouped_count_distinct(rd.from_items(rows).repartition(3),
                                  "g", "v")
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert list(out["g"]) == ["a", "b"]
    assert list(out["n_distinct"]) == [3, 1]


def test_char_entropy_matches_naive(ray_session):
    import math
    from collections import Counter

    import pandas as pd
    import ray.data as rd

    from llm_food_ray.stages.textstats import char_entropy

    texts = ["aabb", "aaaa", "", "abcd", "汉字汉 mixed"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (char_entropy(rd.from_pandas(df)).to_pandas()
           .set_index("doc_id"))
    for i, t in enumerate(texts):
        if t:
            c = Counter(t)
            want = round(-sum((v / len(t)) * math.log(v / len(t))
                              for _, v in sorted(c.items())), 6)
        else:
            want = 0.0
        assert abs(out.loc[i, "entropy"] - want) < 1e-9, (i, t)
        assert out.loc[i, "n_chars_text"] == len(t)
    # uniform 4-char doc: exactly ln 4; constant doc: exactly 0
    assert abs(out.loc[3, "entropy"] - round(math.log(4), 6)) < 1e-9
    assert out.loc[1, "entropy"] == 0.0


def test_top_k_per_group_brute_force(ray_session):
    """Randomized differential vs a pandas window rank, with duplicated
    order values (tiebreak decides) and groups smaller than k."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from llm_food_ray.stages.textstats import top_k_per_group

    rng = np.random.default_rng(3)
    n = 2500
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(list("abcdefghij"), n),
        # small value domain → heavy ties at every rank boundary
        "n_chars": rng.integers(0, 40, n).astype(np.int64),
    })
    # one tiny group (smaller than k)
    df.loc[df.index[:2], "lang"] = "zz"
    df = df[~((df.lang == "j") & (df.index > 30))]

    out = (top_k_per_group(rd.from_pandas(df), "lang", "n_chars", "doc_id",
                           k=7)
           .to_pandas().sort_values(["lang", "rank"]).reset_index(drop=True))

    ref = df.sort_values(["lang", "n_chars", "doc_id"],
                         ascending=[True, False, True]).copy()
    ref["rank"] = ref.groupby("lang").cumcount() + 1
    ref = (ref[ref["rank"] <= 7]
           .sort_values(["lang", "rank"]).reset_index(drop=True))
    assert len(out) == len(ref)
    for c in ["lang", "doc_id", "n_chars", "rank"]:
        assert (out[c].to_numpy() == ref[c].to_numpy()).all(), c


def test_top_ngrams_sketch_matches_exact(ray_session):
    """Randomized differential: the Misra–Gries heavy-hitters plan is
    byte-identical to the full-vocabulary exact top_ngrams, both when
    the sketch path holds (capacity drops real mass but the guarantee
    proves the result) and when the flat-distribution fallback fires
    (capacity far too small)."""
    import random

    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.textstats import top_ngrams, top_ngrams_sketch

    random.seed(11)
    vocab = [f"w{i}" for i in range(300)]
    wts = [1.0 / (i + 1) for i in range(300)]       # Zipf: real heavy mass
    rows = [{"doc_id": d,
             "text": " ".join(random.choices(vocab, weights=wts, k=80))}
            for d in range(400)]
    rows.append({"doc_id": 400, "text": ""})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(8)

    exact = top_ngrams(ds, "text", n=2, k=15).to_pandas()
    sketch = top_ngrams_sketch(ds, "text", n=2, k=15,
                               capacity=64).to_pandas()
    fallback = top_ngrams_sketch(ds, "text", n=2, k=15,
                                 capacity=4).to_pandas()
    assert exact.equals(sketch)
    assert exact.equals(fallback)
    assert len(exact) == 15 and (exact["n"].diff().dropna() <= 0).all()


def test_contamination_scores_counts_and_frac(ray_session):
    """Hand-computable grid: hit counts are POSITIONAL (duplicate grams
    in one doc count every occurrence), short docs score 0.0."""
    import ray.data as rd
    import pyarrow as pa

    from llm_food_ray.stages.textstats import contamination_scores

    rows = [
        {"doc_id": 0, "text": "a b c d"},    # grams: "a b","b c","c d"
        {"doc_id": 1, "text": "a b a b"},    # "a b","b a","a b" → 2 hits
        {"doc_id": 2, "text": "x"},          # too short → 0 grams
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": "z z b c z"},  # "b c" hit once of 4
    ]
    out = (contamination_scores(
               rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3),
               "text", contaminated={"a b", "b c"}, n=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_grams"].tolist() == [3, 3, 0, 0, 4]
    assert out["n_hits"].tolist() == [2, 2, 0, 0, 1]
    assert out["contamination_frac"].tolist() == [
        round(2 / 3, 6), round(2 / 3, 6), 0.0, 0.0, 0.25]


def test_grouped_linear_fit_known_lines(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import grouped_linear_fit

    rows = (
        # group a: exact line y = 2x + 1
        [{"g": "a", "x": x, "y": 2 * x + 1} for x in (1, 2, 3, 4)]
        # group b: symmetric residuals around y = 3 (slope 0)
        + [{"g": "b", "x": 1, "y": 2}, {"g": "b", "x": 2, "y": 4},
           {"g": "b", "x": 3, "y": 3}]
        # group c: zero x variance -> NULL coefficients
        + [{"g": "c", "x": 5, "y": 1}, {"g": "c", "x": 5, "y": 9}]
    )
    out = (grouped_linear_fit(dataset_from_items(rows), "g", "x", "y")
           .to_pandas().set_index("g"))
    assert out.loc["a", "slope"] == 2.0
    assert out.loc["a", "intercept"] == 1.0
    assert out.loc["b", "slope"] == 0.5
    assert out.loc["b", "intercept"] == 2.0
    import pandas as pd

    assert pd.isna(out.loc["c", "slope"])
    assert pd.isna(out.loc["c", "intercept"])
    assert int(out.loc["c", "n"]) == 2


def test_crawl_budget_waterline(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import crawl_budget

    # counts: a=1, b=3, c=6, d=10; budget 12 -> used(4)=1+3+4+4=12 OK,
    # used(5)=1+3+5+5=14 > 12, so L=4: quotas 1,3,4,4
    rows = ([{"h": "a"}] * 1 + [{"h": "b"}] * 3
            + [{"h": "c"}] * 6 + [{"h": "d"}] * 10)
    out = (crawl_budget(dataset_from_items(rows), "h", budget=12,
                        out_key="h")
           .to_pandas().set_index("h"))
    assert out["quota"].to_dict() == {"a": 1, "b": 3, "c": 4, "d": 4}
    assert out["n_docs"].to_dict() == {"a": 1, "b": 3, "c": 6, "d": 10}


def test_crawl_budget_unconstrained_and_zero(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import crawl_budget

    rows = [{"h": "a"}] * 2 + [{"h": "b"}] * 5
    ds = dataset_from_items(rows)
    full = crawl_budget(ds, "h", budget=100, out_key="h").to_pandas()
    assert full.set_index("h")["quota"].to_dict() == {"a": 2, "b": 5}
    none = crawl_budget(ds, "h", budget=0, out_key="h").to_pandas()
    assert none["quota"].tolist() == [0, 0]


def test_drift_psi_shift_detected(ray_session):
    import math

    import pandas as pd

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import drift_psi

    # reference uniform over 1..100; new corpus shifted high (51..150):
    # low buckets lose mass (NULL where new is empty), high gain
    ref = [{"v": i} for i in range(1, 101)]
    new = [{"v": i} for i in range(51, 151)]
    out = (drift_psi(dataset_from_items(new), dataset_from_items(ref),
                     "v", n_buckets=5)
           .to_pandas().set_index("bucket").sort_index())
    # ref edges at quantiles .2/.4/.6/.8 of 1..100 -> 20,40,60,80
    # bucket 0 (v<... strict-less <20... v in 1..20): ref 20, new 0
    assert out.loc[0, "n_ref"] == 20 and out.loc[0, "n_new"] == 0
    assert pd.isna(out.loc[0, "psi_term"])
    # bucket 4 (v > 80): ref 20, new: 81..150 -> 70
    assert out.loc[4, "n_ref"] == 20 and out.loc[4, "n_new"] == 70
    p, q = 70 / 100, 20 / 100
    want = math.floor((p - q) * math.log(p / q) * 1e6 + 0.5) / 1e6
    assert out.loc[4, "psi_term"] == want
    # identical corpora -> every term 0.0
    same = (drift_psi(dataset_from_items(ref), dataset_from_items(ref),
                      "v", n_buckets=5).to_pandas())
    assert (same["psi_term"] == 0.0).all()


def test_grouped_mad_hand_values(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import grouped_mad

    # group a: values 1..7 -> median 4 (rank ceil(.5*7)=4), devs
    # {3,2,1,0,1,2,3} sorted {0,1,1,2,2,3,3} -> mad = 2
    # group b: even n=4 quantile_disc takes rank 2: values 10,20,30,40
    # -> median 20, devs {10,0,10,20} sorted {0,10,10,20} -> mad 10
    rows = ([{"g": "a", "v": i} for i in range(1, 8)]
            + [{"g": "b", "v": v} for v in (10, 20, 30, 40)])
    out = (grouped_mad(dataset_from_items(rows), "g", "v")
           .to_pandas().set_index("g"))
    assert out.loc["a", "median"] == 4.0 and out.loc["a", "mad"] == 2.0
    assert out.loc["b", "median"] == 20.0 and out.loc["b", "mad"] == 10.0


def test_vocab_growth_prefixes(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import vocab_growth

    rows = [
        {"doc_id": 0, "text": "a b a"},
        {"doc_id": 1, "text": "b c"},
        {"doc_id": 2, "text": "c d d"},
        {"doc_id": 4, "text": "e"},
    ]
    out = (vocab_growth(dataset_from_items(rows), divisors=(4, 2, 1))
           .to_pandas().set_index("checkpoint").sort_index())
    # max_id 4 -> checkpoints 1, 2, 4
    assert out.loc[1, "vocab_size"] == 3    # a b c
    assert out.loc[1, "n_tokens"] == 5
    assert out.loc[2, "vocab_size"] == 4    # + d
    assert out.loc[2, "n_tokens"] == 8
    assert out.loc[4, "vocab_size"] == 5    # + e
    assert out.loc[4, "n_tokens"] == 9


def test_source_diversity_simpson(ray_session):
    import pandas as pd

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import source_diversity

    rows = (
        # host a: 2+2 over two sources -> 1 - (2+2)/(4*3) = 1 - 4/12
        [{"h": "a", "s": "x"}] * 2 + [{"h": "a", "s": "y"}] * 2
        # host b: single source -> simpson 0
        + [{"h": "b", "s": "x"}] * 3
        # host c: one row -> NULL
        + [{"h": "c", "s": "z"}]
    )
    out = (source_diversity(dataset_from_items(rows), "h", "s")
           .to_pandas().set_index("h"))
    assert out.loc["a", "simpson"] == 0.666667
    assert out.loc["a", "n_cats"] == 2
    assert out.loc["b", "simpson"] == 0.0
    assert pd.isna(out.loc["c", "simpson"])


def test_readability_hand_text(ray_session):
    import math

    import pandas as pd

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import readability

    rows = [{"doc_id": 1, "text": "The cat sat. The dog ran!"},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "no terminator here"}]
    out = (readability(dataset_from_items(rows)).to_pandas()
           .set_index("doc_id"))
    # doc 1: 6 words, 2 sentences, vowel groups: e,a,a,e,o,a -> 6
    assert out.loc[1, "n_words"] == 6
    assert out.loc[1, "n_sentences"] == 2
    assert out.loc[1, "n_syllables"] == 6
    want = math.floor((206.835 - 1.015 * 3 - 84.6 * 1.0) * 1e4
                      + 0.5) / 1e4
    assert out.loc[1, "flesch"] == want
    assert pd.isna(out.loc[2, "flesch"])
    assert out.loc[3, "n_sentences"] == 1  # clamped to 1


def test_skyline2d_matches_bruteforce(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import skyline2d

    rng = np.random.RandomState(5)
    pts = [(int(rng.randint(0, 20)), int(rng.randint(0, 20)))
           for _ in range(200)]
    rows = [{"k": i, "x": x, "y": y} for i, (x, y) in enumerate(pts)]

    def dominated(p):
        return any(q[0] >= p[0] and q[1] >= p[1]
                   and (q[0] > p[0] or q[1] > p[1]) for q in pts)

    expect = {i for i, p in enumerate(pts) if not dominated(p)}
    out = skyline2d(dataset_from_items(rows), "x", "y",
                    keep_columns=["k"]).to_pandas()
    assert set(out["k"]) == expect


def test_skyline2d_ties_all_kept(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import skyline2d

    # two identical frontier points are mutually non-dominating
    rows = [{"k": 1, "x": 5, "y": 5}, {"k": 2, "x": 5, "y": 5},
            {"k": 3, "x": 5, "y": 4}, {"k": 4, "x": 6, "y": 1}]
    out = skyline2d(dataset_from_items(rows), "x", "y",
                    keep_columns=["k"]).to_pandas()
    assert set(out["k"]) == {1, 2, 4}


def test_grouped_weighted_median_rank_rule(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import grouped_weighted_median

    # group a: values 1(w3), 10(w1): total 4, need cum>=2 -> median 1
    # group b: values 1(w1), 10(w3): need cum>=2 -> median 10
    # group c: equal mass ties -> smallest value with 2cum>=tot -> 1
    rows = [{"g": "a", "v": 1, "w": 3}, {"g": "a", "v": 10, "w": 1},
            {"g": "b", "v": 1, "w": 1}, {"g": "b", "v": 10, "w": 3},
            {"g": "c", "v": 1, "w": 2}, {"g": "c", "v": 10, "w": 2}]
    out = (grouped_weighted_median(dataset_from_items(rows),
                                   "g", "v", "w")
           .to_pandas().set_index("g")["wmedian"].to_dict())
    assert out == {"a": 1.0, "b": 10.0, "c": 1.0}


def test_winsorized_mean_clips_outlier(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import winsorized_mean

    # 19 values of 10 plus one outlier 100000: p95 threshold (rank
    # ceil(.95*20)=19) is 10, so the outlier clips to 10 -> mean 10
    rows = ([{"g": "a", "v": 10}] * 19
            + [{"g": "a", "v": 100000}])
    out = (winsorized_mean(dataset_from_items(rows), "g", "v")
           .to_pandas().set_index("g"))
    assert out.loc["a", "wmean"] == 10.0
    assert out.loc["a", "hi"] == 10.0


def test_mannwhitney_u_matches_scipy_formula(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import mannwhitney_u

    rng = np.random.RandomState(3)
    a = rng.randint(0, 15, 40)
    b = rng.randint(3, 18, 35)
    rows = ([{"g": "x", "s": "A", "v": int(v)} for v in a]
            + [{"g": "x", "s": "B", "v": int(v)} for v in b])
    # brute-force pair count
    gt = sum(1.0 for va in a for vb in b if va > vb)
    ties = sum(1.0 for va in a for vb in b if va == vb)
    want = gt + ties / 2
    out = (mannwhitney_u(dataset_from_items(rows), "g", "s", "v",
                         side_a="A", side_b="B")
           .to_pandas().set_index("g"))
    assert out.loc["x", "u"] == want
    assert out.loc["x", "n_a"] == 40 and out.loc["x", "n_b"] == 35


def test_mannwhitney_u_extremes(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import mannwhitney_u

    # all of A above all of B: u = n_a * n_b; identical samples:
    # u = n²/2
    rows = ([{"g": "hi", "s": "A", "v": 100 + i} for i in range(3)]
            + [{"g": "hi", "s": "B", "v": i} for i in range(4)]
            + [{"g": "eq", "s": "A", "v": 7} for _ in range(5)]
            + [{"g": "eq", "s": "B", "v": 7} for _ in range(5)])
    out = (mannwhitney_u(dataset_from_items(rows), "g", "s", "v",
                         side_a="A", side_b="B")
           .to_pandas().set_index("g"))
    assert out.loc["hi", "u"] == 12.0
    assert out.loc["eq", "u"] == 12.5


def test_kendall_tau_matches_bruteforce(ray_session):
    import math

    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import kendall_tau

    rng = np.random.RandomState(9)
    xs = rng.randint(0, 8, 60)
    ys = (xs + rng.randint(-3, 4, 60)).clip(0, 10)
    rows = [{"x": int(a), "y": int(b)} for a, b in zip(xs, ys)]
    C = D = tx = ty = 0
    n = len(xs)
    for i in range(n):
        for j in range(i + 1, n):
            dx = xs[i] - xs[j]
            dy = ys[i] - ys[j]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
    T = n * (n - 1) // 2
    want = round((C - D) / math.sqrt((T - tx) * (T - ty)), 6)
    out = kendall_tau(dataset_from_items(rows), "x", "y").to_pandas()
    assert int(out.loc[0, "concordant"]) == C
    assert int(out.loc[0, "discordant"]) == D
    assert out.loc[0, "tau"] == want


def test_kendall_tau_perfect_and_degenerate(ray_session):
    import pandas as pd

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import kendall_tau

    mono = [{"x": i, "y": i * 2} for i in range(10)]
    out = kendall_tau(dataset_from_items(mono), "x", "y").to_pandas()
    assert out.loc[0, "tau"] == 1.0
    const = [{"x": 1, "y": i} for i in range(5)]
    out2 = kendall_tau(dataset_from_items(const), "x", "y").to_pandas()
    assert pd.isna(out2.loc[0, "tau"])


def test_grouped_auc_matches_pair_count(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import grouped_auc

    rng = np.random.RandomState(11)
    pos = rng.randint(5, 20, 30)
    neg = rng.randint(0, 15, 25)
    rows = ([{"g": "x", "y": 1, "s": int(v)} for v in pos]
            + [{"g": "x", "y": 0, "s": int(v)} for v in neg])
    u = (sum(1.0 for a in pos for b in neg if a > b)
         + sum(0.5 for a in pos for b in neg if a == b))
    want = u / (len(pos) * len(neg))
    out = (grouped_auc(dataset_from_items(rows), "g", "y", "s")
           .to_pandas().set_index("g"))
    assert out.loc["x", "auc"] == want
    assert out.loc["x", "n_pos"] == 30 and out.loc["x", "n_neg"] == 25


def test_grouped_auc_extremes_and_degenerate(ray_session):
    import pandas as pd

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import grouped_auc

    rows = (
        # perfect separation -> 1.0; inverted -> 0.0; all ties -> 0.5
        [{"g": "sep", "y": 1, "s": 10 + i} for i in range(3)]
        + [{"g": "sep", "y": 0, "s": i} for i in range(4)]
        + [{"g": "inv", "y": 0, "s": 10 + i} for i in range(3)]
        + [{"g": "inv", "y": 1, "s": i} for i in range(4)]
        + [{"g": "tie", "y": 1, "s": 7} for _ in range(2)]
        + [{"g": "tie", "y": 0, "s": 7} for _ in range(3)]
        # single-class group: AUC undefined -> null
        + [{"g": "one", "y": 1, "s": i} for i in range(5)])
    out = (grouped_auc(dataset_from_items(rows), "g", "y", "s")
           .to_pandas().set_index("g"))
    assert out.loc["sep", "auc"] == 1.0
    assert out.loc["inv", "auc"] == 0.0
    assert out.loc["tie", "auc"] == 0.5
    assert pd.isna(out.loc["one", "auc"])
    assert out.loc["one", "n_neg"] == 0


def test_threshold_metrics_matches_bruteforce(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import threshold_metrics

    rng = np.random.RandomState(3)
    scores = rng.randint(0, 12, 40)
    ys = (rng.rand(40) < 0.4).astype(int)
    rows = [{"g": "x", "y": int(y), "s": int(s)}
            for y, s in zip(ys, scores)]
    out = (threshold_metrics(dataset_from_items(rows), "g", "y", "s")
           .to_pandas().set_index("threshold").sort_index())
    assert set(out.index) == set(int(s) for s in scores)
    for t in out.index:
        tp = int(((scores >= t) & (ys == 1)).sum())
        fp = int(((scores >= t) & (ys == 0)).sum())
        fn = int(ys.sum()) - tp
        assert out.loc[t, "tp"] == tp
        assert out.loc[t, "fp"] == fp
        assert out.loc[t, "fn"] == fn
        assert out.loc[t, "precision"] == tp / (tp + fp)
        assert out.loc[t, "recall"] == tp / ys.sum()
        assert out.loc[t, "f1"] == 2 * tp / (tp + fp + ys.sum())


def test_threshold_metrics_no_positive_group(ray_session):
    import pandas as pd

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import threshold_metrics

    rows = [{"g": "z", "y": 0, "s": v} for v in (1, 2, 2, 5)]
    out = (threshold_metrics(dataset_from_items(rows), "g", "y", "s")
           .to_pandas().set_index("threshold"))
    assert len(out) == 3  # distinct scores
    assert (out["tp"] == 0).all()
    assert (out["precision"] == 0.0).all()  # tp+fp >= 1 always
    assert out["recall"].isna().all() and out["f1"].isna().all()
    assert out.loc[2, "fp"] == 3  # scores >= 2


def test_calibration_bins_exact(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import calibration_bins

    rows = [  # scale 1000, 10 bins -> bin = min(s//100, 9)
        {"g": "a", "y": 1, "s": 50},   # bin 0
        {"g": "a", "y": 0, "s": 99},   # bin 0
        {"g": "a", "y": 1, "s": 950},  # bin 9
        {"g": "a", "y": 1, "s": 1000},  # clamps to bin 9
    ]
    out = (calibration_bins(dataset_from_items(rows), "g", "y", "s")
           .to_pandas().set_index("bin").sort_index())
    assert list(out.index) == [0, 9]
    assert out.loc[0, "n"] == 2 and out.loc[0, "n_pos"] == 1
    assert out.loc[0, "sum_score"] == 149
    assert out.loc[0, "frac_pos"] == 0.5
    assert out.loc[0, "mean_score"] == 149 / 2000
    assert out.loc[9, "n"] == 2 and out.loc[9, "frac_pos"] == 1.0


def test_label_agreement_kappa(ray_session):
    import pandas as pd

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import label_agreement

    rows = (
        # perfect agreement over 2 labels -> kappa = 1
        [{"g": "perf", "a": l, "b": l} for l in "xxyy"]
        # classic 2x2 example: n=10, agree=7, margins a:(6,4) b:(7,3)
        + [{"g": "mix", "a": "p", "b": "p"} for _ in range(5)]
        + [{"g": "mix", "a": "p", "b": "q"}]
        + [{"g": "mix", "a": "q", "b": "p"} for _ in range(2)]
        + [{"g": "mix", "a": "q", "b": "q"} for _ in range(2)]
        # single shared label everywhere: pe = n^2 -> undefined
        + [{"g": "one", "a": "z", "b": "z"} for _ in range(3)])
    out = (label_agreement(dataset_from_items(rows), "g", "a", "b")
           .to_pandas().set_index("g"))
    assert out.loc["perf", "kappa"] == 1.0
    n, agree = 10, 7
    pe = 6 * 7 + 4 * 3  # row x col margin products
    assert out.loc["mix", "n"] == n
    assert out.loc["mix", "agree"] == agree
    assert out.loc["mix", "pe_num"] == pe
    assert out.loc["mix", "kappa"] == (n * agree - pe) / (n * n - pe)
    assert pd.isna(out.loc["one", "kappa"])


def test_label_agreement_batching_invariant(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from llm_food_ray.stages.textstats import label_agreement

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "g": rng.choice(["u", "v", "w"], 300),
        "a": rng.choice(list("lmn"), 300),
        "b": rng.choice(list("lmn"), 300)})
    outs = []
    for nblocks in (1, 9):
        ds = rd.from_pandas(df).repartition(nblocks)
        outs.append(label_agreement(ds, "g", "a", "b")
                    .to_pandas().set_index("g").sort_index())
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_spearman_matches_bruteforce(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import spearman_rho

    rng = np.random.RandomState(21)
    x = rng.randint(0, 15, 200)
    y = x + rng.randint(-3, 4, 200)  # monotone-ish with ties
    rows = [{"x": int(a), "y": int(b)} for a, b in zip(x, y)]
    out = spearman_rho(dataset_from_items(rows), "x", "y").to_pandas()

    def midranks(v):
        order = np.argsort(v, kind="stable")
        r = np.empty(len(v), np.float64)
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            r[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return r
    rx, ry = midranks(x), midranks(y)
    want = (((rx - rx.mean()) * (ry - ry.mean())).sum()
            / np.sqrt(((rx - rx.mean()) ** 2).sum()
                      * ((ry - ry.mean()) ** 2).sum()))
    assert out.loc[0, "n"] == 200
    assert abs(out.loc[0, "rho"] - want) < 1e-6


def test_spearman_perfect_and_degenerate(ray_session):
    import pandas as pd

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import spearman_rho

    mono = [{"x": i, "y": i * i} for i in range(10)]
    out = spearman_rho(dataset_from_items(mono), "x", "y").to_pandas()
    assert out.loc[0, "rho"] == 1.0
    anti = [{"x": i, "y": -i} for i in range(10)]
    out2 = spearman_rho(dataset_from_items(anti), "x", "y").to_pandas()
    assert out2.loc[0, "rho"] == -1.0
    const = [{"x": 3, "y": i} for i in range(5)]
    out3 = spearman_rho(dataset_from_items(const), "x", "y").to_pandas()
    assert pd.isna(out3.loc[0, "rho"])


def test_grouped_gini_matches_bruteforce(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import grouped_gini

    rng = np.random.RandomState(4)
    vals = {"even": rng.randint(50, 60, 40),
            "skew": np.r_[np.ones(39, np.int64), [10_000]]}
    rows = [{"g": g, "v": int(v)} for g, arr in vals.items() for v in arr]
    out = (grouped_gini(dataset_from_items(rows), "g", "v")
           .to_pandas().set_index("g"))

    def brute(a):
        a = np.sort(np.asarray(a, np.float64))
        n = len(a)
        i = np.arange(1, n + 1)
        return ((2 * i - n - 1) * a).sum() / (n * a.sum())
    for g, arr in vals.items():
        assert out.loc[g, "n"] == len(arr)
        assert abs(out.loc[g, "gini"] - brute(arr)) < 1e-12
    assert out.loc["skew", "gini"] > 0.9 > out.loc["even", "gini"]


def test_grouped_gini_edge_cases(ray_session):
    import pandas as pd

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import grouped_gini

    rows = ([{"g": "one", "v": 7}]            # single item -> 0
            + [{"g": "same", "v": 5}] * 6     # all equal -> 0
            + [{"g": "zero", "v": 0}] * 3)    # zero mass -> NULL
    out = (grouped_gini(dataset_from_items(rows), "g", "v")
           .to_pandas().set_index("g"))
    assert out.loc["one", "gini"] == 0.0
    assert out.loc["same", "gini"] == 0.0
    assert pd.isna(out.loc["zero", "gini"])


def test_term_psi_identical_halves_zero(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import term_psi

    rows = [{"text": "alpha beta gamma delta"} for _ in range(10)]
    ds = dataset_from_items(rows)
    out = term_psi(ds, ds, "text", n_buckets=8).to_pandas()
    # identical distributions: every populated bucket has psi 0
    assert (out["psi_term"] == 0.0).all()
    assert (out["n_ref"] == out["n_new"]).all()
    assert out["n_ref"].sum() == 40


def test_term_psi_matches_naive(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.functions.hashing import stable_hash64

    from llm_food_ray.stages.textstats import term_psi

    ref_rows = [{"text": "aa bb cc"}, {"text": "aa dd"}]
    new_rows = [{"text": "aa aa ee"}, {"text": "bb"}]
    out = (term_psi(dataset_from_items(new_rows),
                    dataset_from_items(ref_rows), "text", n_buckets=4)
           .to_pandas().set_index("bucket"))

    def counts(rows):
        acc = {}
        for r in rows:
            for w in r["text"].split():
                b = stable_hash64(w) % 4
                acc[b] = acc.get(b, 0) + 1
        return acc
    cr, cn = counts(ref_rows), counts(new_rows)
    tr, tn = sum(cr.values()), sum(cn.values())
    assert set(out.index) == set(cr) | set(cn)
    for b in out.index:
        assert out.loc[b, "n_ref"] == cr.get(b, 0)
        assert out.loc[b, "n_new"] == cn.get(b, 0)
        if cr.get(b, 0) and cn.get(b, 0):
            p, q = cn[b] / tn, cr[b] / tr
            want = np.floor((p - q) * np.log(p / q) * 1e6 + 0.5) / 1e6
            assert out.loc[b, "psi_term"] == want
        else:
            assert np.isnan(out.loc[b, "psi_term"])


def test_grouped_mi_matches_naive_and_sums_nonneg(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import grouped_mi

    rng = np.random.RandomState(6)
    rows = []
    for _ in range(300):
        a = rng.choice(["en", "de", "fr"])
        # b correlates with a in group "dep", independent in "ind"
        rows.append({"g": "dep", "a": a,
                     "b": "hi" if a == "en" else "lo"})
        rows.append({"g": "ind", "a": a,
                     "b": rng.choice(["hi", "lo"])})
    out = (grouped_mi(dataset_from_items(rows), "g", "a", "b")
           .to_pandas())

    from collections import Counter
    for g in ("dep", "ind"):
        sub = [(r["a"], r["b"]) for r in rows if r["g"] == g]
        n = len(sub)
        cab = Counter(sub)
        ca = Counter(x for x, _ in sub)
        cb = Counter(y for _, y in sub)
        want_total = 0.0
        dfg = out[out["g"] == g].set_index(["a", "b"])
        assert len(dfg) == len(cab)
        for (x, y), c in cab.items():
            want = np.floor((c / n) * np.log((c * n) / (ca[x] * cb[y]))
                            * 1e6 + 0.5) / 1e6
            assert dfg.loc[(x, y), "mi_term"] == want
            assert dfg.loc[(x, y), "n_ab"] == c
            want_total += want
        if g == "dep":
            assert want_total > 0.5  # strongly dependent
        else:
            assert abs(want_total) < 0.05  # near-independent


def test_grouped_mi_perfect_dependence(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import grouped_mi

    # two equiprobable labels, b == a: MI = ln 2
    rows = ([{"g": "x", "a": "p", "b": "p"}] * 8
            + [{"g": "x", "a": "q", "b": "q"}] * 8)
    out = (grouped_mi(dataset_from_items(rows), "g", "a", "b")
           .to_pandas())
    total = out["mi_term"].sum()
    assert abs(total - np.log(2)) < 2e-6


def test_vocab_overlap_matches_sets(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import vocab_overlap

    rows = [
        {"g": "a", "text": "cat dog fish"},
        {"g": "a", "text": "dog bird"},
        {"g": "b", "text": "dog fish worm"},
        {"g": "c", "text": "xyzzy plugh"},
        {"g": "c", "text": ""},
    ]
    out = (vocab_overlap(dataset_from_items(rows), "g")
           .to_pandas().set_index(["group_a", "group_b"]))
    vocab = {}
    for r in rows:
        vocab.setdefault(r["g"], set()).update(r["text"].split())
    assert len(out) == 3  # 3 choose 2
    for (a, b), row in out.iterrows():
        inter = len(vocab[a] & vocab[b])
        union = len(vocab[a] | vocab[b])
        assert row["n_a"] == len(vocab[a])
        assert row["n_b"] == len(vocab[b])
        assert row["n_common"] == inter
        assert row["jaccard"] == inter / union
    assert out.loc[("a", "c"), "n_common"] == 0
    assert out.loc[("a", "b"), "n_common"] == 2  # dog, fish


def test_vocab_overlap_batching_invariant_and_bound(ray_session):
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from llm_food_ray.stages.textstats import vocab_overlap

    rng = np.random.RandomState(8)
    words = [f"w{i}" for i in range(60)]
    df = pd.DataFrame({
        "g": rng.choice(["p", "q", "r", "s"], 200),
        "text": [" ".join(rng.choice(words, 5)) for _ in range(200)]})
    outs = []
    for nblocks in (1, 11):
        ds = rd.from_pandas(df).repartition(nblocks)
        outs.append(vocab_overlap(ds, "g").to_pandas()
                    .sort_values(["group_a", "group_b"])
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    with np.testing.assert_raises(ValueError):
        many = pd.DataFrame({"g": [f"g{i}" for i in range(70)],
                             "text": ["x"] * 70})
        vocab_overlap(rd.from_pandas(many), "g")


def test_two_prop_test_matches_formula(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import two_prop_test

    rows = ([{"g": "x", "s": "a", "y": 1}] * 30
            + [{"g": "x", "s": "a", "y": 0}] * 70
            + [{"g": "x", "s": "b", "y": 1}] * 45
            + [{"g": "x", "s": "b", "y": 0}] * 55
            # one-sided group -> NULL z
            + [{"g": "solo", "s": "a", "y": 1}] * 5
            # zero-variance group (all successes) -> NULL z
            + [{"g": "flat", "s": "a", "y": 1}] * 4
            + [{"g": "flat", "s": "b", "y": 1}] * 6)
    out = (two_prop_test(dataset_from_items(rows), "g", "s", "y",
                         side_a="a", side_b="b")
           .to_pandas().set_index("g"))
    na, ka, nb, kb = 100, 30, 100, 45
    phat = (ka + kb) / (na + nb)
    z = ((ka / na - kb / nb)
         / np.sqrt(phat * (1 - phat) * (1 / na + 1 / nb)))
    want = np.floor(z * 1e6 + 0.5) / 1e6
    assert out.loc["x", "z"] == want
    assert out.loc["x", "n_a"] == na and out.loc["x", "k_b"] == kb
    assert np.isnan(out.loc["solo", "z"])
    assert np.isnan(out.loc["flat", "z"])


def test_welch_t_test_matches_scipy_formula(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import welch_t_test

    a = [10, 12, 14, 9, 11, 13, 15, 10]
    b = [20, 25, 22, 30, 18]
    rows = ([{"g": "x", "s": "a", "v": v} for v in a]
            + [{"g": "x", "s": "b", "v": v} for v in b]
            # n_b = 1 -> NULL (variance undefined)
            + [{"g": "solo", "s": "a", "v": 5},
               {"g": "solo", "s": "a", "v": 7},
               {"g": "solo", "s": "b", "v": 6}]
            # zero variance on BOTH sides -> se2 = 0 -> NULL
            + [{"g": "flat", "s": "a", "v": 3}] * 4
            + [{"g": "flat", "s": "b", "v": 3}] * 4)
    out = (welch_t_test(dataset_from_items(rows), "g", "s", "v",
                        side_a="a", side_b="b")
           .to_pandas().set_index("g"))
    na, nb = len(a), len(b)
    va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
    sea, seb = va / na, vb / nb
    t = (np.mean(a) - np.mean(b)) / np.sqrt(sea + seb)
    df = (sea + seb) ** 2 / (sea ** 2 / (na - 1) + seb ** 2 / (nb - 1))
    assert out.loc["x", "t"] == np.floor(t * 1e6 + 0.5) / 1e6
    assert abs(out.loc["x", "df"] - df) < 1e-5
    assert out.loc["x", "n_a"] == na and out.loc["x", "n_b"] == nb
    assert np.isnan(out.loc["solo", "t"])
    assert np.isnan(out.loc["flat", "t"])


def test_term_js_identical_corpora_zero_and_bounded(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import term_js

    rows = [{"text": "alpha beta gamma delta"},
            {"text": "alpha alpha beta"}]
    same = (term_js(dataset_from_items(rows), dataset_from_items(rows))
            .to_pandas())
    # identical distributions -> every bucket term is exactly 0
    assert (same["js_term"] == 0).all()

    # hand-recomputed expectation from the same bucket hash
    import math

    from llm_food_ray.functions.hashing import stable_hash64

    a_words = ["aaa", "bbb", "ccc", "ddd"]
    b_words = ["eee", "fff", "ggg", "hhh"]
    a = [{"text": " ".join(a_words)}]
    b = [{"text": " ".join(b_words)}]
    out = (term_js(dataset_from_items(a), dataset_from_items(b))
           .to_pandas().set_index("bucket"))
    cn: dict = {}
    cr: dict = {}
    for w in a_words:
        cn[stable_hash64(w) % 64] = cn.get(stable_hash64(w) % 64, 0) + 1
    for w in b_words:
        cr[stable_hash64(w) % 64] = cr.get(stable_hash64(w) % 64, 0) + 1
    for bk in sorted(set(cn) | set(cr)):
        nn, nr = cn.get(bk, 0), cr.get(bk, 0)
        if nn > 0 and nr > 0:
            p, q = nn / 4, nr / 4
            m = (p + q) / 2.0
            v = (0.5 * (p * math.log2(p / m))
                 + 0.5 * (q * math.log2(q / m)))
        elif nn > 0:
            v = 0.5 * (nn / 4)
        else:
            v = 0.5 * (nr / 4)
        want = math.floor(v * 1e6 + 0.5) / 1e6
        assert out.loc[bk, "js_term"] == want
    assert (out["js_term"] >= 0).all()
    assert out["js_term"].sum() <= 1.0 + 1e-9


def test_zipf_slope_matches_snapped_log_regression(ray_session):
    import math

    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import zipf_slope

    # counts 8/4/2/1 for terms a/b/c/d -> ranks 1..4
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    rows = [{"g": "x", "text": text},
            # single-term group -> zero x variance -> NULL slope
            {"g": "solo", "text": "only only only"}]
    out = (zipf_slope(dataset_from_items(rows), "g", "text", k=100)
           .to_pandas().set_index("g"))
    snap = lambda v: math.floor(math.log(v) * 1e5 + 0.5)
    x = np.array([snap(r) for r in (1, 2, 3, 4)], np.int64)
    y = np.array([snap(c) for c in (8, 4, 2, 1)], np.int64)
    n = 4
    slope = (n * (x * y).sum() - x.sum() * y.sum()) / float(
        n * (x * x).sum() - x.sum() ** 2)
    inter = (y.sum() - slope * x.sum()) / n / 1e5
    assert out.loc["x", "n_terms"] == 4
    assert out.loc["x", "slope"] == round(slope, 6)
    assert out.loc["x", "intercept"] == round(inter, 6)
    assert out.loc["solo", "n_terms"] == 1
    assert np.isnan(out.loc["solo", "slope"])


def test_gopher_flags_rules(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import gopher_flags

    good = " ".join(["word"] * 60)
    rows = [
        {"doc_id": 1, "text": good},                       # passes all
        {"doc_id": 2, "text": "short text"},               # f_wordcount
        {"doc_id": 3, "text": " ".join(["a"] * 60)},       # f_meanlen low
        {"doc_id": 4, "text": " ".join(["#"] * 60)},       # symbol+alpha
        {"doc_id": 5, "text": "\n".join(["- b c d"] * 60)},  # f_bullet
        {"doc_id": 6, "text": "\n".join(["end..."] * 60)},   # f_ellipsis
        {"doc_id": 7, "text": " ".join(["123"] * 60)},     # f_alpha
    ]
    out = (gopher_flags(dataset_from_items(rows), min_words=50)
           .to_pandas().set_index("doc_id"))
    assert bool(out.loc[1, "pass"])
    assert not out.loc[2, "f_wordcount"] and not out.loc[2, "pass"]
    assert not out.loc[3, "f_meanlen"]
    assert not out.loc[4, "f_symbol"] and not out.loc[4, "f_alpha"]
    assert not out.loc[5, "f_bullet"]
    assert out.loc[5, "f_wordcount"]  # 240 words, rule isolation
    assert not out.loc[6, "f_ellipsis"]
    assert not out.loc[7, "f_alpha"] and out.loc[7, "f_meanlen"]
    assert out.loc[1, "n_words"] == 60


def test_c4_line_filter_rules(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import c4_line_filter

    text = "\n".join([
        "this line is long enough.",     # kept
        "short line.",                   # < 4 words
        "no terminal punctuation here",  # no punct end
        "enable JavaScript to view this.",  # javascript (any case)
        "some code { return 1; } here.",    # brace
        'he said "stop right there!"',      # ends with quote -> kept
    ])
    out = (c4_line_filter(dataset_from_items(
        [{"doc_id": 1, "text": text},
         {"doc_id": 2, "text": "nothing survives here"}]))
        .to_pandas().set_index("doc_id"))
    assert out.loc[1, "n_lines"] == 6
    assert out.loc[1, "n_kept"] == 2
    assert out.loc[1, "clean"] == ('this line is long enough.\n'
                                   'he said "stop right there!"')
    assert out.loc[2, "n_kept"] == 0 and out.loc[2, "clean"] == ""


def test_ks_test_matches_bruteforce(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import ks_test

    rng = np.random.RandomState(17)
    a = rng.randint(0, 30, 80)
    b = rng.randint(5, 40, 60)
    rows = ([{"g": "x", "s": "p", "v": int(v)} for v in a]
            + [{"g": "x", "s": "q", "v": int(v)} for v in b])
    out = (ks_test(dataset_from_items(rows), "g", "s", "v",
                   side_a="p", side_b="q").to_pandas().set_index("g"))
    support = np.unique(np.r_[a, b])
    d = max(abs((a <= v).mean() - (b <= v).mean()) for v in support)
    want = np.floor(d * 1e6 + 0.5) / 1e6
    assert out.loc["x", "d_stat"] == want
    assert out.loc["x", "n_a"] == 80 and out.loc["x", "n_b"] == 60


def test_ks_test_identical_and_disjoint(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import ks_test

    rows = ([{"g": "same", "s": "p", "v": v} for v in (1, 2, 3)] * 2
            + [{"g": "same", "s": "q", "v": v} for v in (1, 2, 3)] * 2
            + [{"g": "disj", "s": "p", "v": v} for v in (1, 2)]
            + [{"g": "disj", "s": "q", "v": v} for v in (10, 20)]
            + [{"g": "one", "s": "p", "v": 5}])
    out = (ks_test(dataset_from_items(rows), "g", "s", "v",
                   side_a="p", side_b="q").to_pandas().set_index("g"))
    assert out.loc["same", "d_stat"] == 0.0
    assert out.loc["disj", "d_stat"] == 1.0
    assert np.isnan(out.loc["one", "d_stat"])


def test_length_outliers_integer_rule(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import length_outliers

    # group a: median 10, MAD 1 -> threshold |v-10| > 2
    rows = ([{"g": "a", "v": v} for v in (8, 9, 10, 11, 12)]
            + [{"g": "a", "v": 100}]     # outlier
            + [{"g": "b", "v": 5}] * 5)  # mad 0 -> any deviation flags
    out = (length_outliers(dataset_from_items(rows), "g", "v", k_mad=2)
           .to_pandas())
    assert set(out[out["g"] == "a"]["v"]) == {100}
    assert len(out[out["g"] == "b"]) == 0
    row = out[out["v"] == 100].iloc[0]
    assert row["median"] == 10 and row["mad"] == 1


def test_auc_equals_threshold_sweep_trapezoid(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import grouped_auc, threshold_metrics

    rng = np.random.RandomState(23)
    rows = [{"g": "x", "y": int(rng.rand() < 0.5), "s": int(v)}
            for v in rng.randint(0, 25, 150)]
    auc = (grouped_auc(dataset_from_items(rows), "g", "y", "s")
           .to_pandas().iloc[0])
    sweep = (threshold_metrics(dataset_from_items(rows), "g", "y", "s")
             .to_pandas().sort_values("threshold", ascending=False))
    # ROC from the sweep: (fp, tp) ascending from (0,0); the trapezoid
    # area over it IS the Mann-Whitney AUC (ties -> the diagonal
    # segment's area equals the half-credit term exactly)
    tp = np.r_[0, sweep["tp"].to_numpy()]
    fp = np.r_[0, sweep["fp"].to_numpy()]
    area2 = ((fp[1:] - fp[:-1]) * (tp[1:] + tp[:-1])).sum()
    want = area2 / (2.0 * auc["n_pos"] * auc["n_neg"])
    assert abs(auc["auc"] - want) < 1e-12


def test_fertility_by_group_counts(ray_session):
    import numpy as np

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import fertility_by_group

    rows = [
        {"g": "en", "text": "don't stop-me now"},  # 3 words, 7 tokens
        {"g": "en", "text": "plain words here"},   # 3 words, 3 tokens
        {"g": "empty", "text": ""},
    ]
    out = (fertility_by_group(dataset_from_items(rows), "g")
           .to_pandas().set_index("g"))
    # don't -> don ' t ; stop-me -> stop - me ; now -> now
    assert out.loc["en", "n_words"] == 6
    assert out.loc["en", "n_tokens"] == 10
    assert out.loc["en", "fertility"] == 10 / 6
    assert out.loc["en", "n_docs"] == 2
    assert np.isnan(out.loc["empty", "fertility"])


def test_winnow_rows_matches_scalar():
    """Vectorized winnow_rows == winnow_fingerprint per doc, across
    parameter combos, short/empty docs and repeated shingles."""
    import numpy as np
    import pyarrow as pa

    from llm_food_ray.functions.hashing import (winnow_fingerprint,
                                                winnow_min_per_doc,
                                                winnow_rows)

    texts = ["", "   ", "one", "one two", "a b c d e f g h",
             "x " * 30, "the quick brown fox jumps over the lazy dog",
             "dup dup dup dup dup dup dup"]
    for k, w in ((5, 4), (3, 2), (2, 5)):
        di, fp = winnow_rows(pa.array(texts), k=k, window=w)
        got: dict = {}
        for d, f in zip(di.tolist(), fp.tolist()):
            got.setdefault(d, []).append(f)
        for i, t in enumerate(texts):
            assert sorted(got.get(i, [])) == winnow_fingerprint(
                t, k=k, window=w), (k, w, i, t)
    mins = winnow_min_per_doc(pa.array(texts))
    exp = [min(winnow_fingerprint(t), default=0) for t in texts]
    assert mins.tolist() == exp


def test_stratified_sample_exact_quotas(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.textstats import stratified_sample

    # 60/30/10 mix → quotas 6/3/1 at n_total=10 (exact proportions)
    items = [{"doc_id": i,
              "grp": "a" if i < 60 else ("b" if i < 90 else "c")}
             for i in range(100)]
    ds = rd.from_arrow(pa.Table.from_pylist(items)).repartition(5)
    got = stratified_sample(ds, "grp", "doc_id", n_total=10).to_pandas()
    assert len(got) == 10
    mix = got.groupby("grp").size().to_dict()
    assert mix == {"a": 6, "b": 3, "c": 1}
    # smallest ids win within each group
    assert sorted(got[got["grp"] == "a"]["doc_id"]) == list(range(6))


def test_stratified_sample_largest_remainder(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.textstats import stratified_sample

    # sizes 5/3/3 with n=4: floors 1/1/1, remainders 9/1/1 of 11 —
    # leftover goes to the largest remainder (group a)
    items = ([{"doc_id": i, "grp": "a"} for i in range(5)]
             + [{"doc_id": 10 + i, "grp": "b"} for i in range(3)]
             + [{"doc_id": 20 + i, "grp": "c"} for i in range(3)])
    ds = rd.from_arrow(pa.Table.from_pylist(items))
    got = stratified_sample(ds, "grp", "doc_id", n_total=4).to_pandas()
    mix = got.groupby("grp").size().to_dict()
    assert mix == {"a": 2, "b": 1, "c": 1}


def test_stratified_sample_overbudget_raises(ray_session):
    import pytest
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import stratified_sample

    ds = dataset_from_items([{"doc_id": i, "grp": "a"} for i in range(3)])
    with pytest.raises(ValueError):
        stratified_sample(ds, "grp", "doc_id", n_total=5)


def test_code_stats_signals(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import code_stats

    code = ("def f(x):\n"
            "    return x + 1;\n"
            "\tclass A {\n"
            "}\n"
            "import os")
    prose = ("The quick brown fox jumps over the lazy dog. "
             "It was a bright cold day in April.")
    rows = [
        {"doc_id": 1, "text": code},
        {"doc_id": 2, "text": prose},
        {"doc_id": 3, "text": ""},
    ]
    out = (code_stats(dataset_from_items(rows))
           .to_pandas().set_index("doc_id"))
    # code doc: lines 2-4 end in ;/{/}, lines 2-3 indented
    assert out.loc[1, "n_lines"] == 5
    assert out.loc[1, "punct_lines"] == 3
    assert out.loc[1, "indent_lines"] == 2
    assert out.loc[1, "kw_hits"] == 4  # def, return, class, import
    assert bool(out.loc[1, "is_code"])
    assert out.loc[2, "punct_lines"] == 0
    assert out.loc[2, "indent_lines"] == 0
    assert not bool(out.loc[2, "is_code"])
    # empty doc: one line, no signals, not code
    assert out.loc[3, "n_lines"] == 1 and not bool(out.loc[3, "is_code"])


def test_dup_ngram_stats_hand_counts(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import dup_ngram_stats

    rows = [
        # "a b a b a b": bigrams = ab ba ab ba ab → 'a b'×3, 'b a'×2,
        # all 5 occurrences duplicated
        {"doc_id": 1, "text": "a b a b a b"},
        # all-distinct bigrams
        {"doc_id": 2, "text": "w x y z"},
        # too short for a bigram
        {"doc_id": 3, "text": "solo"},
    ]
    out = (dup_ngram_stats(dataset_from_items(rows), n=2)
           .to_pandas().set_index("doc_id"))
    assert out.loc[1, "n_grams"] == 5 and out.loc[1, "n_dup"] == 5
    assert out.loc[1, "dup_frac"] == 1.0
    assert out.loc[1, "dup_char_frac"] == 1.0
    assert out.loc[2, "n_grams"] == 3 and out.loc[2, "n_dup"] == 0
    assert out.loc[2, "dup_frac"] == 0.0
    assert out.loc[3, "n_grams"] == 0
    import pandas as pd
    assert pd.isna(out.loc[3, "dup_frac"])


def test_dup_ngram_stats_char_weighting(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import dup_ngram_stats

    # trigrams: "aa bb cc" ×2 (len 8), "cc aa bb", "bb cc aa",
    # "cc dd ee", "dd ee ff" distinct
    text = "aa bb cc aa bb cc dd ee ff"
    out = (dup_ngram_stats(dataset_from_items(
        [{"doc_id": 1, "text": text}]), n=3)
           .to_pandas().set_index("doc_id"))
    # 7 windows; only 'aa bb cc' (positions 0 and 3) duplicates
    assert out.loc[1, "n_grams"] == 7 and out.loc[1, "n_dup"] == 2
    assert abs(out.loc[1, "dup_frac"] - round(2 / 7, 6)) < 1e-12
    # every trigram here is 8 chars → char frac == occurrence frac
    assert out.loc[1, "dup_char_frac"] == out.loc[1, "dup_frac"]


def test_shard_assign_balance_and_determinism(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.functions.hashing import md5_hex
    from llm_food_ray.stages.textstats import shard_assign

    rows = [{"doc_id": i, "w": 10} for i in range(40)]
    out = (shard_assign(dataset_from_items(rows), "doc_id", "w",
                        shard_budget=100)
           .to_pandas())
    # exact reference: cut the md5-ordered exclusive cumsum
    order = sorted(range(40), key=lambda i: (md5_hex(str(i)), i))
    cum, expect = 0, {}
    for i in order:
        expect[i] = cum // 100
        cum += 10
    got = dict(zip(out["doc_id"], out["shard"]))
    assert got == expect
    # 400 total weight / 100 budget → exactly 4 shards of 10 rows
    assert sorted(out["shard"].value_counts().tolist()) == [10, 10, 10, 10]


def test_shard_assign_whale_row_owns_shard(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.functions.hashing import md5_hex
    from llm_food_ray.stages.textstats import shard_assign

    rows = [{"doc_id": 1, "w": 350}, {"doc_id": 2, "w": 1},
            {"doc_id": 3, "w": 1}]
    out = (shard_assign(dataset_from_items(rows), "doc_id", "w",
                        shard_budget=100).to_pandas())
    order = sorted([1, 2, 3], key=lambda i: (md5_hex(str(i)), i))
    cum, expect = 0, {}
    for i in order:
        expect[i] = cum // 100
        cum += {1: 350, 2: 1, 3: 1}[i]
    assert dict(zip(out["doc_id"], out["shard"])) == expect


def test_grouped_zscore_values_and_degenerates(ray_session):
    import math

    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import grouped_zscore

    rows = [
        {"doc_id": 1, "grp": "a", "v": 1},
        {"doc_id": 2, "grp": "a", "v": 2},
        {"doc_id": 3, "grp": "a", "v": 3},
        {"doc_id": 4, "grp": "b", "v": 7},   # singleton → NULL
        {"doc_id": 5, "grp": "c", "v": 5},   # zero variance → NULL
        {"doc_id": 6, "grp": "c", "v": 5},
    ]
    out = (grouped_zscore(dataset_from_items(rows), "grp", "v")
           .to_pandas().set_index("doc_id"))
    # group a: mean 2, population sd sqrt(2/3)
    sd = math.sqrt(2 / 3)
    for d, v in [(1, 1), (2, 2), (3, 3)]:
        expect = math.floor((v - 2) / sd * 1e6 + 0.5) / 1e6
        assert out.loc[d, "z"] == expect
    import pandas as pd
    assert pd.isna(out.loc[4, "z"])
    assert pd.isna(out.loc[5, "z"]) and pd.isna(out.loc[6, "z"])


def test_para_lang_spans_mixed_doc(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import para_lang_spans

    en = ("the cat sat on the mat and it was happy with the sun "
          "for a while")
    de = ("der hund und die katze sind nicht im haus von dem mann "
          "mit der zeitung")
    rows = [
        {"doc_id": 1, "text": en + "\n\n" + de},
        {"doc_id": 2, "text": "\n\n" + en + "\n\n\n\n"},  # blanks drop
        {"doc_id": 3, "text": "zzz qqq xxx"},             # und
        {"doc_id": 4, "text": ""},                        # no rows
    ]
    out = (para_lang_spans(dataset_from_items(rows))
           .to_pandas())
    d1 = out[out.doc_id == 1].sort_values("para_ord")
    assert list(d1["para_ord"]) == [1, 2]
    assert list(d1["lang_id"]) == ["en", "de"]
    d2 = out[out.doc_id == 2]
    assert list(d2["para_ord"]) == [1] and list(d2["lang_id"]) == ["en"]
    assert list(out[out.doc_id == 3]["lang_id"]) == ["und"]
    assert len(out[out.doc_id == 4]) == 0


def test_bh_fdr_matches_reference(ray_session):
    """Distributed BH == the textbook step-up on the driver, across
    many blocks (exercises the cross-block suffix-min fold)."""
    import numpy as np
    import ray.data as rd

    from llm_food_ray.stages.textstats import bh_fdr

    rng = np.random.default_rng(11)
    n = 500
    ps = np.round(rng.uniform(0.0, 1.0, n) ** 3, 6)   # skew small
    ps[:5] = 0.00001                                   # clear rejections
    keys = [f"k{i:04d}" for i in range(n)]
    ds = rd.from_items([{"key": k, "p": float(p)}
                        for k, p in zip(keys, ps)]).repartition(17)
    out = (bh_fdr(ds, "p", "key", alpha=0.1).to_pandas()
           .sort_values("rank").reset_index(drop=True))

    order = sorted(range(n), key=lambda i: (ps[i], keys[i]))
    raw = np.array([ps[i] * n / (r + 1) for r, i in enumerate(order)])
    adj = np.minimum(np.minimum.accumulate(raw[::-1])[::-1], 1.0)
    assert list(out["key"]) == [keys[i] for i in order]
    assert list(out["rank"]) == list(range(1, n + 1))
    np.testing.assert_array_equal(out["p_adj"].to_numpy(), adj)
    np.testing.assert_array_equal(out["significant"].to_numpy(),
                                  adj <= 0.1)
    # monotone non-decreasing in rank, clamped at 1
    assert (np.diff(out["p_adj"].to_numpy()) >= 0).all()
    assert out["p_adj"].max() <= 1.0


def test_bh_fdr_empty_and_single(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from llm_food_ray.stages.textstats import bh_fdr

    empty = rd.from_arrow(pa.table({"key": pa.array([], pa.string()),
                                    "p": pa.array([], pa.float64())}))
    out = bh_fdr(empty, "p", "key")
    assert out.count() == 0
    assert set(out.schema().base_schema.names) == {
        "key", "p", "rank", "p_adj", "significant"}

    one = rd.from_items([{"key": "a", "p": 0.04}])
    row = bh_fdr(one, "p", "key", alpha=0.05).take_all()[0]
    assert row["rank"] == 1 and row["p_adj"] == 0.04 and row["significant"]
