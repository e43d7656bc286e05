"""URL canonicalization rules."""

from llm_food_ray.functions.urltools import canonicalize_url, url_host


def test_case_and_ports():
    assert (canonicalize_url("HTTP://WWW.Ex.COM:80/Path/X")
            == "http://www.ex.com/Path/X")
    assert (canonicalize_url("https://Ex.com:443/a")
            == "https://ex.com/a")
    # mismatched default port stays
    assert (canonicalize_url("http://ex.com:443/a")
            == "http://ex.com:443/a")
    assert (canonicalize_url("https://ex.com:8443/a")
            == "https://ex.com:8443/a")


def test_fragment_query_slash():
    assert canonicalize_url("https://e.com/a/#frag") == "https://e.com/a"
    assert (canonicalize_url("https://e.com/a?utm_source=x&id=1&gclid=z#f")
            == "https://e.com/a?id=1")
    assert canonicalize_url("https://e.com/a?utm_campaign=x") == "https://e.com/a"
    assert canonicalize_url("https://e.com") == "https://e.com/"
    assert canonicalize_url("https://e.com/") == "https://e.com/"
    # non-tracking param order preserved
    assert (canonicalize_url("https://e.com/p?b=2&utm_x=1&a=1")
            == "https://e.com/p?b=2&a=1")


def test_non_urls_pass_through():
    assert canonicalize_url("not a url") == "not a url"
    assert canonicalize_url("") == ""
    assert url_host("not a url") == ""
    assert url_host("https://A.B.C:8080/x") == "a.b.c"


def test_top_ngrams_ray(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.textstats import top_ngrams

    rows = [{"doc_id": 1, "text": "a b a b a b"},
            {"doc_id": 2, "text": "a b c"},
            {"doc_id": 3, "text": None}]
    out = top_ngrams(dataset_from_items(rows), "text", n=2, k=2).to_pandas()
    assert list(out["gram"]) == ["a b", "b a"]
    assert list(out["n"]) == [4, 2]
