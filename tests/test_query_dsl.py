"""Query-DSL tree evaluation tests (parse -> evaluate vs hand oracles)."""

import numpy as np
import pytest

from raydex.analysis.tokenizer import get_analyzer
from raydex.index.segment import SegmentReader, build_segment
from raydex.search.bm25 import GlobalStats, brute_force_top_k
from raydex.search.query import (
    SegmentEvaluator,
    collect_stat_terms,
    expand_fuzzy,
    expand_prefix,
    expand_wildcard,
    parse_query,
)

DOCS = [
    ("u00", "apple banana cherry"),
    ("u01", "apple apple dog"),
    ("u02", "banana dog elephant"),
    ("u03", "cherry elephant fig"),
    ("u04", "applesauce apricot"),
    ("u05", "dog dog dog"),
]


@pytest.fixture(scope="module")
def seg(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dsl") / "seg")
    build_segment(d, [u for u, _ in DOCS], [t for _, t in DOCS], analyzer="standard")
    return SegmentReader(d)


def _ev(seg, terms=()):
    df = {}
    for t in terms:
        ti = seg.lookup(t)
        df[t] = int(seg.df[ti]) if ti >= 0 else 0
    stats = GlobalStats(seg.ndocs, seg.sum_dl, df)
    return SegmentEvaluator(seg, stats, get_analyzer("standard"))


def _match_urls(seg, ev, q, k=10):
    ids, _ = ev.top_k(parse_query(q), k)
    return sorted(seg.url_of(d) for d in ids)


def test_term_and_match(seg):
    ev = _ev(seg, ["apple", "dog"])
    assert _match_urls(seg, ev, {"term": {"text": "apple"}}) == ["u00", "u01"]
    # match == brute force path
    ids, sc = ev.top_k(parse_query({"match": {"text": "apple dog"}}), 10)
    b_ids, b_sc = brute_force_top_k(
        seg, ["apple", "dog"], 10,
        GlobalStats(seg.ndocs, seg.sum_dl, {"apple": 2, "dog": 3}),
    )
    assert ids.tolist() == b_ids.tolist()
    np.testing.assert_array_equal(sc, b_sc)


def test_bool_semantics(seg):
    ev = _ev(seg, ["apple", "dog", "banana"])
    # must + must_not
    q = {"bool": {"must": [{"term": {"text": "dog"}}],
                  "must_not": [{"term": {"text": "apple"}}]}}
    assert _match_urls(seg, ev, q) == ["u02", "u05"]
    # filter does not change scores but constrains
    q = {"bool": {"must": [{"term": {"text": "dog"}}],
                  "filter": [{"term": {"text": "banana"}}]}}
    assert _match_urls(seg, ev, q) == ["u02"]
    # pure should requires >= 1 match
    q = {"bool": {"should": [{"term": {"text": "apple"}}, {"term": {"text": "banana"}}]}}
    assert _match_urls(seg, ev, q) == ["u00", "u01", "u02"]
    # minimum_should_match=2
    q = {"bool": {"should": [{"term": {"text": "apple"}}, {"term": {"text": "banana"}},
                             {"term": {"text": "cherry"}}],
                  "minimum_should_match": 2}}
    assert _match_urls(seg, ev, q) == ["u00"]


def test_expansions(seg):
    assert [seg.terms[i] for i in expand_prefix(seg, "app")] == ["apple", "applesauce"]
    assert [seg.terms[i] for i in expand_wildcard(seg, "ap*e")] == ["apple", "applesauce"]
    assert [seg.terms[i] for i in expand_wildcard(seg, "?og")] == ["dog"]
    assert [seg.terms[i] for i in expand_fuzzy(seg, "aple", 1)] == ["apple"]
    ev = _ev(seg)
    assert _match_urls(seg, ev, {"prefix": {"text": "app"}}) == ["u00", "u01", "u04"]
    assert _match_urls(seg, ev, {"fuzzy": {"text": "bananna"}}) == ["u00", "u02"]
    assert _match_urls(seg, ev, {"regexp": {"text": "(dog|fig)"}}) == ["u01", "u02", "u03", "u05"]


def test_constant_score_and_dismax(seg):
    ev = _ev(seg, ["apple", "dog"])
    ids, sc = ev.top_k(parse_query(
        {"constant_score": {"filter": {"term": {"text": "apple"}}, "boost": 2.5}}), 10)
    assert set(sc.tolist()) == {2.5}
    q = {"dis_max": {"queries": [{"term": {"text": "apple"}}, {"term": {"text": "dog"}}],
                     "tie_breaker": 0.0}}
    ids, sc = ev.top_k(parse_query(q), 10)
    assert len(ids) == 4  # union of matches


def test_range_ids_exists_matchall(seg):
    ev = _ev(seg)
    assert _match_urls(seg, ev, {"range": {"dl": {"gte": 3}}}) == ["u00", "u01", "u02", "u03", "u05"]
    assert _match_urls(seg, ev, {"ids": {"values": ["u01", "u05"]}}) == ["u01", "u05"]
    assert len(_match_urls(seg, ev, {"match_all": {}})) == 6
    assert ev.count(parse_query({"exists": {"field": "url"}})) == 6


def test_count_and_explain(seg):
    ev = _ev(seg, ["dog"])
    assert ev.count(parse_query({"term": {"text": "dog"}})) == 3
    ex = ev.explain(parse_query({"match": {"text": "dog"}}), 5)
    assert ex["url"] == "u05" and ex["score"] > 0
    assert ex["terms"][0]["term"] == "dog"


def test_collect_stat_terms():
    an = get_analyzer("standard")
    q = parse_query({"bool": {"must": [{"match": {"text": "Apple DOG"}}],
                              "should": [{"term": {"text": "fig"}}]}})
    assert collect_stat_terms(q, an) == {"apple", "dog", "fig"}


def test_searcher_integration(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from raydex.corpus import make_pages_table
    from raydex.index.build import build_index
    from raydex.search.scatter import LocalSearcher

    t = make_pages_table(300, seed=17)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=3, source="text", max_docs_per_segment=200)
    s = LocalSearcher(idx)
    hits = s.search_query({"match": {"text": "search engine"}}, k=10)
    plain = s.search("search engine", k=10, method="brute")
    assert [(h["url"], h["score"]) for h in hits] == [(h["url"], h["score"]) for h in plain]
    n = s.count({"term": {"text": "search"}})
    assert n > 0
    nb = s.count({"bool": {"must": [{"term": {"text": "search"}}],
                           "must_not": [{"term": {"text": "engine"}}]}})
    assert 0 <= nb <= n
    # track_total_hits: opt-in hits+total envelope; exact with True,
    # capped with relation "gte" when the count exceeds an int cap
    q = {"term": {"text": "search"}}
    env = s.search_query(q, k=3, track_total_hits=True)
    assert env["total"] == {"value": s.count(q), "relation": "eq"}
    assert len(env["hits"]) <= 3
    capped = s.search_query(q, k=3, track_total_hits=1)
    assert capped["total"] == {"value": 1, "relation": "gte"}
    big = s.search_query(q, k=3, track_total_hits=10_000)
    assert big["total"] == {"value": s.count(q), "relation": "eq"}
    # default stays the plain hits list (backward contract)
    assert isinstance(s.search_query(q, k=3), list)


# ------------------------- round-2 DSL surface (multi_match family etc.)


@pytest.fixture(scope="module")
def pseg(tmp_path_factory):
    """Positions-enabled segment for phrase-prefix tests."""
    d = str(tmp_path_factory.mktemp("dslp") / "seg")
    build_segment(d, [u for u, _ in DOCS], [t for _, t in DOCS],
                  analyzer="standard", store_positions=True)
    return SegmentReader(d)


def test_term_and_match_on_url_field(seg):
    ev = _ev(seg)
    assert _match_urls(seg, ev, {"term": {"url": "u00"}}) == ["u00"]
    assert _match_urls(seg, ev, {"match": {"url": "u05"}}) == ["u05"]


def test_multi_match_best_and_most_fields(seg):
    ev = _ev(seg, ["apple"])
    q = {"multi_match": {"query": "apple u02", "fields": ["text", "url"]}}
    assert _match_urls(seg, ev, q) == ["u00", "u01", "u02"]
    # most_fields sums instead of taking the max
    qb = {"multi_match": {"query": "apple", "fields": ["text", "url"],
                          "type": "most_fields"}}
    ids, sc = ev.top_k(parse_query(qb), 10)
    ids2, sc2 = ev.top_k(parse_query({"match": {"text": "apple"}}), 10)
    assert sorted(ids.tolist()) == sorted(ids2.tolist())


def test_combined_fields(seg):
    import numpy as np

    from raydex.search.bm25 import B, K1, idf

    # the coordinator collects global df for combined_fields terms
    # (collect_stat_terms) — the evaluator scores with those stats, like
    # Match; terms it can't find in the text df fall back to the
    # segment-local df of the other fields
    ev = _ev(seg, ["apple", "dog", "u02", "u05"])
    # membership: union across fields; operator=and intersects
    q = {"combined_fields": {"query": "apple u02", "fields": ["text", "url"]}}
    assert _match_urls(seg, ev, q) == ["u00", "u01", "u02"]
    qand = {"combined_fields": {"query": "apple dog",
                                "fields": ["text", "url"],
                                "operator": "and"}}
    assert _match_urls(seg, ev, qand) == ["u01"]
    # BM25F arithmetic by hand for the single term 'dog' over text+url:
    # tf pools across fields, norm = dl_text + dl_url, idf from union df
    ids, sc = ev.top_k(parse_query(
        {"combined_fields": {"query": "dog", "fields": ["text", "url"]}}), 10)
    dl_url = np.ones(seg.ndocs)  # every url is one keywordish token
    norm = seg.dl.astype(float) + dl_url
    denom = K1 * (1 - B + B * norm / norm.mean())
    tfc = np.zeros(seg.ndocs)
    ti = seg.lookup("dog")
    pids, ptfs = seg.postings(ti)
    tfc[pids] += ptfs
    expect = idf(seg.ndocs, 3) * (K1 + 1) * tfc / (tfc + denom)
    order = np.argsort(-expect[expect > 0])
    np.testing.assert_allclose(sorted(sc, reverse=True),
                               sorted(expect[expect > 0], reverse=True))
    # field weight ^2 doubles the url tf contribution -> changes ranking
    qw = {"combined_fields": {"query": "u05 dog",
                              "fields": ["text", "url^2"]}}
    idsw, scw = ev.top_k(parse_query(qw), 10)
    assert seg.url_of(int(idsw[0])) == "u05"


def test_match_bool_prefix(seg):
    ev = _ev(seg, ["banana"])
    q = {"match_bool_prefix": {"text": "banana appl"}}
    assert _match_urls(seg, ev, q) == ["u00", "u01", "u02", "u04"]


def test_match_phrase_prefix(pseg):
    ev = _ev(pseg, ["apple"])
    q = {"match_phrase_prefix": {"text": "apple ban"}}
    assert _match_urls(pseg, ev, q) == ["u00"]
    # single-term prefix phrase == prefix membership
    q = {"match_phrase_prefix": {"text": "appl"}}
    assert _match_urls(pseg, ev, q) == ["u00", "u01", "u04"]


def test_terms_set(seg):
    ev = _ev(seg, ["apple", "dog", "banana"])
    q = {"terms_set": {"text": {"terms": ["apple", "dog", "banana"],
                                "minimum_should_match": 2}}}
    assert _match_urls(seg, ev, q) == ["u00", "u01", "u02"]
    q3 = {"terms_set": {"text": {"terms": ["apple", "dog", "banana"],
                                 "minimum_should_match": 3}}}
    assert _match_urls(seg, ev, q3) == []


def test_distance_feature_and_script_and_none(seg):
    ev = _ev(seg)
    ids, sc = ev.top_k(parse_query(
        {"distance_feature": {"field": "dl", "origin": 2, "pivot": 1}}), 10)
    # u04 has dl=2 -> distance 0 -> top score 1.0
    assert seg.url_of(int(ids[0])) == "u04" and sc[0] == pytest.approx(1.0)
    q = {"script": {"script": {"source": "dl_mod", "params": {"mod": 2, "rem": 0}}}}
    assert _match_urls(seg, ev, q) == ["u04"]
    q = {"script": {"script": {"source": "url_contains", "params": {"substr": "u0"}}}}
    assert len(_match_urls(seg, ev, q)) == len(DOCS)
    ids, _ = ev.top_k(parse_query({"match_none": {}}), 10)
    assert ids.size == 0


def test_wrapper_query(seg):
    import base64
    import json

    ev = _ev(seg, ["apple"])
    b64 = base64.b64encode(json.dumps({"term": {"text": "apple"}}).encode()).decode()
    assert _match_urls(seg, ev, {"wrapper": {"query": b64}}) == ["u00", "u01"]


def test_query_string_grammar(seg):
    ev = _ev(seg, ["apple", "dog", "fig", "banana"])
    qs = lambda s, **kw: {"query_string": {"query": s, **kw}}
    assert _match_urls(seg, ev, qs("(apple AND dog) OR fig")) == ["u01", "u03"]
    assert _match_urls(seg, ev, qs("url:u05")) == ["u05"]
    assert _match_urls(seg, ev, qs("dog -apple")) == ["u02", "u05"]
    assert _match_urls(seg, ev, qs("appl*")) == ["u00", "u01", "u04"]
    assert _match_urls(seg, ev, qs("aple~1")) == ["u00", "u01"]
    assert _match_urls(seg, ev, qs("apple banana", default_operator="and")) == ["u00"]


def test_query_string_phrase(pseg):
    ev = _ev(pseg, ["banana", "dog"])
    q = {"query_string": {"query": '"banana dog"'}}
    assert _match_urls(pseg, ev, q) == ["u02"]
    q = {"query_string": {"query": '"dog banana"'}}
    assert _match_urls(pseg, ev, q) == []


def test_span_queries(pseg):
    ev = _ev(pseg)
    # docs: u00 "apple banana cherry", u01 "apple apple dog",
    #       u02 "banana dog elephant", u03 "cherry elephant fig"
    q = {"span_near": {"clauses": [{"span_term": {"text": "apple"}},
                                   {"span_term": {"text": "cherry"}}],
                       "slop": 1, "in_order": True}}
    assert _match_urls(pseg, ev, q) == ["u00"]  # gap of 1 (banana)
    q0 = {"span_near": {"clauses": [{"span_term": {"text": "apple"}},
                                    {"span_term": {"text": "cherry"}}],
                        "slop": 0, "in_order": True}}
    assert _match_urls(pseg, ev, q0) == []  # adjacent required
    # unordered within window
    qu = {"span_near": {"clauses": [{"span_term": {"text": "cherry"}},
                                    {"span_term": {"text": "banana"}}],
                        "slop": 1, "in_order": False}}
    assert _match_urls(pseg, ev, qu) == ["u00"]
    # span_or
    qo = {"span_or": {"clauses": [{"span_term": {"text": "fig"}},
                                  {"span_term": {"text": "elephant"}}]}}
    assert _match_urls(pseg, ev, qo) == ["u02", "u03"]
    # span_first: 'dog' ending within the first 2 positions — u02
    # ("banana dog …", dog@1) and u05 ("dog dog dog", dog@0,1); u01's
    # dog@2 ends at 3 and is excluded
    qf = {"span_first": {"match": {"span_term": {"text": "dog"}}, "end": 2}}
    assert _match_urls(pseg, ev, qf) == ["u02", "u05"]
    # span_not: banana not followed-adjacent by dog -> keeps u00's banana
    qn = {"span_not": {"include": {"span_term": {"text": "banana"}},
                       "exclude": {"span_near": {"clauses": [
                           {"span_term": {"text": "banana"}},
                           {"span_term": {"text": "dog"}}], "slop": 0,
                           "in_order": True}}}}
    assert "u00" in _match_urls(pseg, ev, qn)


def test_intervals_query(pseg):
    ev = _ev(pseg)
    q = {"intervals": {"text": {"match": {"query": "apple cherry",
                                          "max_gaps": 1, "ordered": True}}}}
    assert _match_urls(pseg, ev, q) == ["u00"]
    q = {"intervals": {"text": {"any_of": {"intervals": [
        {"match": {"query": "fig"}}, {"match": {"query": "apricot"}}]}}}}
    assert _match_urls(pseg, ev, q) == ["u03", "u04"]
    q = {"intervals": {"text": {"all_of": {"intervals": [
        {"match": {"query": "banana"}}, {"match": {"query": "dog"}}],
        "max_gaps": 0, "ordered": True}}}}
    assert _match_urls(pseg, ev, q) == ["u02"]


def test_runtime_field_registry(seg):
    """Runtime fields: query-time computed keyword fields over stored
    columns (es/script/*FieldScript analogue)."""
    from raydex.search.fields import register_runtime_field

    # a 'parity' field computed from the stored doc length
    register_runtime_field(
        "parity", lambda r: ["even" if d % 2 == 0 else "odd" for d in r.dl]
    )
    ev = _ev(seg)
    # u04 'applesauce apricot' has dl=2 (even); the rest dl=3 (odd)
    assert _match_urls(seg, ev, {"term": {"parity": "even"}}) == ["u04"]
    assert len(_match_urls(seg, ev, {"term": {"parity": "odd"}})) == 5
    with pytest.raises(ValueError, match="runtime field"):
        ev.eval(parse_query({"term": {"nope": "x"}}))


def test_point_get_and_mget(tmp_path, ray_session):
    import pyarrow.parquet as pq

    from raydex.corpus import make_pages_table
    from raydex.index.build import build_index
    from raydex.search.get import get_doc, mget

    t = make_pages_table(200, seed=29)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=4, source="text", max_docs_per_segment=50)
    urls = t["url"].to_pylist()
    hit = get_doc(idx, urls[17])
    assert hit is not None and hit["url"] == urls[17] and hit["dl"] > 0
    assert get_doc(idx, "https://nope.example/x") is None
    got = mget(idx, [urls[0], "https://nope.example/x", urls[123]])
    assert got[0]["url"] == urls[0] and got[1] is None and got[2]["url"] == urls[123]


def test_expansions_on_url_field(seg):
    ev = _ev(seg)
    assert _match_urls(seg, ev, {"prefix": {"url": "u0"}}) == sorted(
        u for u, _ in DOCS
    )
    assert _match_urls(seg, ev, {"wildcard": {"url": "u0?"}}) == sorted(
        u for u, _ in DOCS
    )
    assert _match_urls(seg, ev, {"regexp": {"url": "u0[12]"}}) == ["u01", "u02"]
    assert _match_urls(seg, ev, {"fuzzy": {"url": {"value": "u00", "fuzziness": 1}}}) == sorted(
        u for u, _ in DOCS
    )


def test_span_within_containing(pseg):
    ev = _ev(pseg)
    big = {"span_near": {"clauses": [{"span_term": {"text": "apple"}},
                                     {"span_term": {"text": "cherry"}}],
                         "slop": 1, "in_order": True}}
    # u00 "apple banana cherry": big span [0,3) encloses banana@[1,2)
    qw = {"span_within": {"little": {"span_term": {"text": "banana"}},
                          "big": big}}
    assert _match_urls(pseg, ev, qw) == ["u00"]
    qc = {"span_containing": {"little": {"span_term": {"text": "banana"}},
                              "big": big}}
    assert _match_urls(pseg, ev, qc) == ["u00"]
    # banana in u02 has no enclosing big span
    qn = {"span_within": {"little": {"span_term": {"text": "dog"}},
                          "big": big}}
    assert _match_urls(pseg, ev, qn) == []


def test_span_multi_and_field_masking(pseg):
    ev = _ev(pseg)
    qm = {"span_multi": {"match": {"prefix": {"text": "app"}}}}
    assert _match_urls(pseg, ev, qm) == ["u00", "u01", "u04"]
    # span_multi composes inside span_near: app* directly before 'dog'
    qnear = {"span_near": {"clauses": [
        {"span_multi": {"match": {"prefix": {"text": "app"}}}},
        {"span_term": {"text": "dog"}}], "slop": 0, "in_order": True}}
    assert _match_urls(pseg, ev, qnear) == ["u01"]
    qf = {"field_masking_span": {"query": {"span_term": {"text": "dog"}},
                                 "field": "other"}}
    assert _match_urls(pseg, ev, qf) == ["u01", "u02", "u05"]


def test_script_score_query(seg):
    ev = _ev(seg, ["apple"])
    base_ids, base_sc = ev.top_k(parse_query({"match": {"text": "apple"}}), 10)
    q = {"script_score": {"query": {"match": {"text": "apple"}},
                          "script": {"source": "times_param",
                                     "params": {"f": 2.0}}}}
    ids, sc = ev.top_k(parse_query(q), 10)
    assert ids.tolist() == base_ids.tolist()
    np.testing.assert_allclose(sc, 2.0 * base_sc)
    # min_score drops docs scoring below the bar
    lo = {"script_score": {"query": {"match": {"text": "apple"}},
                           "script": {"source": "times_param",
                                      "params": {"f": 1.0}},
                           "min_score": float(base_sc[0])}}
    ids2, _ = ev.top_k(parse_query(lo), 10)
    assert ids2.tolist() == [int(base_ids[0])]
    # negative scores are rejected (ScriptScoreQuery.java contract)
    with pytest.raises(ValueError):
        ev.top_k(parse_query(
            {"script_score": {"query": {"match": {"text": "apple"}},
                              "script": {"source": "times_param",
                                         "params": {"f": -1.0}}}}), 10)


def test_pinned_query(seg):
    ev = _ev(seg, ["dog"])
    q = {"pinned": {"ids": ["u03", "u05"],
                    "organic": {"match": {"text": "dog"}}}}
    ids, sc = ev.top_k(parse_query(q), 10)
    urls = [seg.url_of(d) for d in ids]
    # pinned first in list order (u03 never matches organically), then
    # the organic dog hits by BM25
    assert urls[:2] == ["u03", "u05"]
    assert set(urls[2:]) == {"u01", "u02"}
    assert sc[0] > sc[1] > sc[2]


def test_match_fuzziness_and_zero_terms(ray_session, tmp_path):
    """`match` extras: fuzziness (per-token fuzzy clauses, AUTO ladder)
    and zero_terms_query=all (stopword-only input matches everything)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydex.index.build import build_index
    from raydex.search.scatter import LocalSearcher

    words = ["search engine", "search party", "created equal", "simple doc"]
    t = pa.table(
        {
            "url": pa.array([f"a.example/{i}" for i in range(40)]),
            "warc_ts": pa.array(list(range(40)), pa.int64()).cast(
                pa.timestamp("us")
            ),
            "text": pa.array([f"{words[i % 4]} number {i}" for i in range(40)],
                             pa.large_string()),
        }
    )
    p = str(tmp_path / "fz.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "fz_idx")
    build_index(p, idx, num_partitions=1, analyzer="standard_en")
    s = LocalSearcher(idx)
    base = s.count({"match": {"text": "search"}})
    assert base == 20
    # a misspelling within edit distance 2 matches via fuzziness
    assert s.count({"match": {"text": {"query": "saerch",
                                       "fuzziness": 2}}}) == base
    assert s.count({"match": {"text": {"query": "saerch",
                                       "fuzziness": 0}}}) == 0
    # AUTO ladder: 6-letter token gets 2 edits -> matches
    assert s.count({"match": {"text": {"query": "saerch",
                                       "fuzziness": "AUTO"}}}) == base
    # short token (<= 2 chars) gets 0 edits under AUTO
    assert s.count({"match": {"text": {"query": "xq",
                                       "fuzziness": "AUTO"}}}) == 0
    # operator=and applies across fuzzy clauses
    assert s.count({"match": {"text": {"query": "saerch engne",
                                       "fuzziness": 2,
                                       "operator": "and"}}}) == 10
    # zero_terms_query: all-stopword input ('the' is stopped) matches ALL
    assert s.count({"match": {"text": {"query": "the",
                                       "zero_terms_query": "all"}}}) == 40
    assert s.count({"match": {"text": {"query": "the"}}}) == 0
    # non-empty input: the wrapper is transparent
    assert s.count({"match": {"text": {"query": "search",
                                       "zero_terms_query": "all"}}}) == base


def test_minimum_should_match_grammar():
    """The msm grammar (Queries#calculateMinShouldMatch): ints, negative
    ints, percentages (floor), negative percentages, and conditional
    combinations."""
    from raydex.search.query import resolve_msm

    assert resolve_msm(0, 5) == 0 and resolve_msm(None, 5) == 0
    assert resolve_msm(3, 5) == 3
    assert resolve_msm(-1, 5) == 4          # total - |n|
    assert resolve_msm("75%", 4) == 3       # floor(4 * .75)
    assert resolve_msm("75%", 5) == 3       # floor(3.75)
    assert resolve_msm("-25%", 4) == 3      # total - floor(4 * .25)
    assert resolve_msm("-25%", 9) == 7      # 9 - floor(2.25)
    # conditional: total <= V -> ALL required; else the spec applies
    assert resolve_msm("3<90%", 3) == 3
    assert resolve_msm("3<90%", 10) == 9
    # multiple conditions: largest applicable V wins
    assert resolve_msm("2<2 5<3", 4) == 2
    assert resolve_msm("2<2 5<3", 9) == 3
    assert resolve_msm("2<2 5<3", 2) == 2   # all (total <= 2)
    # clamped to [0, total]
    assert resolve_msm(9, 4) == 4
    assert resolve_msm(-9, 4) == 0


def test_msm_grammar_in_match_and_bool(seg):
    ev = _ev(seg, ["apple", "banana", "cherry"])
    # DOCS corpus: u00 has apple banana cherry; msm 2-of-3
    q_pct = {"match": {"text": {"query": "apple banana cherry",
                                "minimum_should_match": "67%"}}}
    q_int = {"match": {"text": {"query": "apple banana cherry",
                                "minimum_should_match": 2}}}
    ids_p, _ = ev.top_k(parse_query(q_pct), 10)
    ids_i, _ = ev.top_k(parse_query(q_int), 10)
    assert ids_p.tolist() == ids_i.tolist()
    # bool.should with "-1" == n_should - 1
    qb = {"bool": {"should": [{"term": {"text": "apple"}},
                              {"term": {"text": "banana"}},
                              {"term": {"text": "cherry"}}],
                   "minimum_should_match": "-1"}}
    qb2 = {"bool": {"should": [{"term": {"text": "apple"}},
                               {"term": {"text": "banana"}},
                               {"term": {"text": "cherry"}}],
                    "minimum_should_match": 2}}
    ids_a, _ = ev.top_k(parse_query(qb), 10)
    ids_b, _ = ev.top_k(parse_query(qb2), 10)
    assert ids_a.tolist() == ids_b.tolist()


def test_named_query_field_kind_collision_no_echo():
    """A field literally named like a query kind ({"term": {"prefix":
    {...}}}) must yield exactly ONE named clause — the field-wrapper
    echo used to re-parse as a bogus Prefix query on field 'value'."""
    from raydex.search.query import collect_named_queries

    named = collect_named_queries(
        {"term": {"prefix": {"value": "x", "_name": "n"}}})
    assert named == [("n", {"term": {"prefix": {"value": "x"}}})]


def test_range_and_terms_set_accept_sibling_name():
    """`_name` riding alongside the field key parses for range and
    terms_set exactly like it does for term/match."""
    from raydex.search.query import collect_named_queries, parse_query

    rq = {"range": {"dl": {"gte": 1}, "_name": "r"}}
    parse_query(rq)
    assert collect_named_queries(rq) == [("r", {"range": {"dl": {"gte": 1}}})]
    ts = {"terms_set": {"text": {"terms": ["a", "b"],
                                 "minimum_should_match": 1}, "_name": "t"}}
    parse_query(ts)
    got = collect_named_queries(ts)
    assert len(got) == 1 and got[0][0] == "t"


def test_exists_field_semantics(ray_session, tmp_path):
    """Round-5: exists matches only docs CARRYING a value — nullable
    doc-values columns, keyword sub-fields — while url/dl/text and
    unknown (derived) fields keep the all-docs behavior."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydex.index.build import build_index
    from raydex.index.segment import FieldSpec
    from raydex.search.scatter import LocalSearcher

    t = pa.table({
        "url": pa.array([f"e/{i}" for i in range(8)]),
        "warc_ts": pa.array(list(range(8)), pa.int64()).cast(
            pa.timestamp("us")),
        "text": pa.array([f"doc {i}" for i in range(8)],
                         pa.large_string()),
        "score_opt": pa.array([float(i) if i % 2 == 0 else None
                               for i in range(8)], pa.float64()),
        "tag": pa.array([f"t{i}" if i < 5 else None for i in range(8)]),
    })
    p = str(tmp_path / "p.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, analyzer="standard",
                fields=[FieldSpec("score_opt", source="score_opt",
                                  analyzer="double"),
                        FieldSpec("tag", source="tag",
                                  analyzer="keyword")])
    s = LocalSearcher(idx)
    assert s.count({"exists": {"field": "url"}}) == 8
    assert s.count({"exists": {"field": "score_opt"}}) == 4  # nulls out
    assert s.count({"exists": {"field": "tag"}}) == 5
    # unknown field: lenient all-docs fallback (derived fields)
    assert s.count({"exists": {"field": "never_mapped"}}) == 8


def test_distance_feature_named_field(tmp_path, ray_session):
    """distance_feature must score over the NAMED field's doc-values
    (a regression: the evaluator previously hardcoded dl regardless of
    `field`)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydex.index.build import build_index
    from raydex.index.segment import FieldSpec
    from raydex.search.scatter import LocalSearcher

    n = 20
    t = pa.table({
        "url": pa.array([f"d{i}.x/{i}" for i in range(n)]),
        "warc_ts": pa.array(list(range(n)), pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array([f"tok{i} filler words here" for i in range(n)],
                         pa.large_string()),
        "rank": pa.array([(i * 7) % 100 for i in range(n)], pa.int64()),
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, source="text",
                fields=[FieldSpec("rank", "rank", "long")])
    s = LocalSearcher(idx)
    hits = s.search_query(
        {"distance_feature": {"field": "rank", "origin": 50.0,
                              "pivot": 10.0}}, k=n)
    import numpy as np

    ranks = {f"d{i}.x/{i}": (i * 7) % 100 for i in range(n)}
    for h in hits:
        want = np.float32(10.0 / (10.0 + abs(ranks[h["url"]] - 50.0)))
        assert abs(h["score"] - float(want)) < 1e-6, h
    # best hit is the doc whose rank is closest to the origin
    best_rank = ranks[hits[0]["url"]]
    assert abs(best_rank - 50) == min(abs(v - 50) for v in ranks.values())
    # unknown field raises instead of silently scoring dl
    import pytest as _pytest

    with _pytest.raises(ValueError):
        s.search_query({"distance_feature": {"field": "nope",
                                             "origin": 0, "pivot": 1}}, k=3)


def test_script_query_reads_doc_values(tmp_path, ray_session):
    """Script query/score callables see every stored doc-values column
    (the painless doc['field'] surface), not just url/dl."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydex.index.build import build_index
    from raydex.index.segment import FieldSpec
    from raydex.search.query import register_script_query
    from raydex.search.scatter import LocalSearcher

    n = 12
    t = pa.table({
        "url": pa.array([f"s{i}.x/{i}" for i in range(n)]),
        "warc_ts": pa.array(list(range(n)), pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array([f"word{i} common" for i in range(n)],
                         pa.large_string()),
        "grade": pa.array([i % 4 for i in range(n)], pa.int64()),
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, source="text",
                fields=[FieldSpec("grade", "grade", "long")])
    register_script_query(
        "grade_at_least", lambda cols, params: cols["grade"] >= params["min"])
    s = LocalSearcher(idx)
    hits = s.search_query(
        {"script": {"script": {"source": "grade_at_least",
                               "params": {"min": 2}}}}, k=n)
    got = sorted(int(h["url"][1:].split(".")[0]) for h in hits)
    assert got == [i for i in range(n) if i % 4 >= 2]
