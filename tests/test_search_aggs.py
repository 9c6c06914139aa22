"""Search-request aggregations phase (AggregationPhase /
InternalAggregations#reduce): per-segment collect over query matches,
coordinator reduce, reference-shaped response — local + scatter parity
and a pure-pandas oracle."""

import collections

import numpy as np
import pyarrow.parquet as pq
import pytest

from raydex.analysis.tokenizer import get_analyzer
from raydex.corpus import make_pages_table
from raydex.index.build import build_index
from raydex.index.segment import FieldSpec
from raydex.search.scatter import LocalSearcher, RaySearcher

N = 300


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    t = make_pages_table(N, seed=7, dup_frac=0.0, with_html=False)
    p = str(tmp_path_factory.mktemp("aggs_pages") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("aggs_idx") / "index")
    build_index(
        p, idx, num_partitions=2, analyzer="standard", source="text",
        max_docs_per_segment=80, dedup=False,
        fields=[FieldSpec("lang", source="lang", analyzer="keyword"),
                FieldSpec("ts", source="warc_ts", analyzer="date")],
    )
    rows = t.to_pylist()
    an = get_analyzer("standard")
    for r in rows:
        r["dl"] = len(an(r["text"]))
    return idx, rows


def _matches(rows, token):
    an = get_analyzer("standard")
    return [r for r in rows if token in an(r["text"])]


def test_terms_stats_filter_global_vs_oracle(built):
    idx, rows = built
    # a token guaranteed frequent: the most common analyzed token
    counts = collections.Counter(
        t for r in rows for t in set(get_analyzer("standard")(r["text"])))
    token = counts.most_common(1)[0][0]
    matched = _matches(rows, token)
    assert 10 < len(matched) < len(rows)

    s = LocalSearcher(idx)
    out = s.search_aggs(
        {"term": {"text": token}},
        {
            "by_lang": {"terms": {"field": "lang", "size": 100},
                        "aggs": {"adl": {"avg": {"field": "dl"}},
                                 "mx": {"max": {"field": "dl"}}}},
            "dl_stats": {"stats": {"field": "dl"}},
            "langs": {"cardinality": {"field": "lang"}},
            "short": {"filter": {"range": {"dl": {"lte": 100}}},
                      "aggs": {"n": {"value_count": {"field": "dl"}}}},
            "everything": {"global": {},
                           "aggs": {"n": {"value_count": {"field": "dl"}}}},
            "by_day": {"date_histogram": {"field": "ts",
                                          "calendar_interval": "day"}},
        },
    )
    a = out["aggregations"]

    # terms over the keyword index-time field + metric sub-aggs
    want = collections.Counter(r["lang"] for r in matched)
    got = {b["key"]: b["doc_count"] for b in a["by_lang"]["buckets"]}
    assert got == dict(want)
    for b in a["by_lang"]["buckets"]:
        dls = [r["dl"] for r in matched if r["lang"] == b["key"]]
        assert b["adl"]["value"] == pytest.approx(np.mean(dls))
        assert b["mx"]["value"] == max(dls)
    # bucket order: count desc then key asc
    dcs = [b["doc_count"] for b in a["by_lang"]["buckets"]]
    assert dcs == sorted(dcs, reverse=True)

    # stats over dl
    dls = [r["dl"] for r in matched]
    assert a["dl_stats"]["count"] == len(dls)
    assert a["dl_stats"]["sum"] == sum(dls)
    assert a["dl_stats"]["min"] == min(dls)
    assert a["dl_stats"]["max"] == max(dls)
    assert a["dl_stats"]["avg"] == pytest.approx(np.mean(dls))

    # exact cardinality over the keyword field
    assert a["langs"]["value"] == len({r["lang"] for r in matched})

    # filter agg scopes within the query's matches
    short = [r for r in matched if r["dl"] <= 100]
    assert a["short"]["doc_count"] == len(short)
    assert a["short"]["n"]["value"] == len(short)

    # global ignores the query
    assert a["everything"]["doc_count"] == len(rows)
    assert a["everything"]["n"]["value"] == len(rows)

    # date_histogram day buckets
    day_us = 86_400_000_000
    want_days = collections.Counter(
        (int(r["warc_ts"].timestamp() * 1e6) // day_us) * day_us
        for r in matched)
    got_days = {b["key"] * 1000: b["doc_count"]
                for b in a["by_day"]["buckets"]}
    assert got_days == dict(want_days)
    keys = [b["key"] for b in a["by_day"]["buckets"]]
    assert keys == sorted(keys)
    assert all("key_as_string" in b for b in a["by_day"]["buckets"])


def test_scatter_parity_and_hits(built):
    idx, rows = built
    spec = {
        "by_lang": {"terms": {"field": "lang", "size": 5},
                    "aggs": {"adl": {"avg": {"field": "dl"}}}},
        "h": {"histogram": {"field": "dl", "interval": 50}},
        "rng": {"range": {"field": "dl",
                          "ranges": [{"to": 100},
                                     {"from": 100, "to": 160, "key": "mid"},
                                     {"from": 160}]}},
        "card": {"cardinality": {"field": "lang"}},
    }
    q = {"match_all": {}}
    s = LocalSearcher(idx)
    local = s.search_aggs(q, spec, k=3)
    assert len(local["hits"]) == 3
    assert sum(b["doc_count"] for b in local["aggregations"]["h"]["buckets"]) \
        == len(rows)
    assert [b["key"] for b in local["aggregations"]["rng"]["buckets"]][1] \
        == "mid"
    rs = RaySearcher(idx, num_actors=2)
    try:
        remote = rs.search_aggs(q, spec, k=3)
        assert remote["aggregations"] == local["aggregations"]
        assert [(h["url"], h["score"]) for h in remote["hits"]] == \
               [(h["url"], h["score"]) for h in local["hits"]]
    finally:
        rs.shutdown()


def test_aggs_spec_errors(built):
    idx, _ = built
    s = LocalSearcher(idx)
    with pytest.raises(ValueError, match="exactly one kind"):
        s.search_aggs({"match_all": {}},
                      {"x": {"terms": {"field": "lang"},
                             "stats": {"field": "dl"}}})
    # bucket-under-bucket is supported now; `global` stays top-level
    # only (the reference rejects it as a sub-aggregation too)
    with pytest.raises(ValueError, match="unsupported sub-aggregation"):
        s.search_aggs({"match_all": {}},
                      {"x": {"terms": {"field": "lang"},
                             "aggs": {"y": {"global": {}}}}})
    with pytest.raises(ValueError, match="doc-values"):
        s.search_aggs({"match_all": {}},
                      {"x": {"stats": {"field": "nope"}}})


def test_top_hits_missing_order_mdc(built):
    idx, rows = built
    s = LocalSearcher(idx)
    q = {"match": {"text": rows[0]["text"].split()[0]}}
    out = s.search_aggs(q, {
        "best": {"top_hits": {"size": 3}},
        "by_lang": {"terms": {"field": "lang", "size": 100,
                              "order": {"adl": "desc"}},
                    "aggs": {"adl": {"avg": {"field": "dl"}},
                             "top": {"top_hits": {"size": 1}}}},
        "by_key": {"terms": {"field": "lang", "size": 100,
                             "order": {"_key": "asc"}}},
        "none_missing": {"missing": {"field": "lang"}},
    })
    a = out["aggregations"]

    # standalone top_hits == the search_query top-3 (rank-identical;
    # scores approx — evaluator float64 vs top-k float32 rounding)
    hits = s.search_query(q, k=3)
    assert [h["url"] for h in a["best"]["hits"]] == \
           [h["url"] for h in hits]
    for g, w in zip(a["best"]["hits"], hits):
        assert g["score"] == pytest.approx(w["score"], rel=1e-5)

    # per-bucket top hit: the highest-scoring hit whose lang == bucket
    all_hits = s.search_query(q, k=10_000)
    for b in a["by_lang"]["buckets"]:
        langs = {r["url"]: r["lang"] for r in rows}
        want = next(h for h in all_hits if langs[h["url"]] == b["key"])
        got = b["top"]["hits"][0]
        assert got["url"] == want["url"]
        assert got["score"] == pytest.approx(want["score"], rel=1e-5)

    # order by metric sub-agg desc
    adls = [b["adl"]["value"] for b in a["by_lang"]["buckets"]]
    assert adls == sorted(adls, reverse=True)
    # order by key asc
    keys = [b["key"] for b in a["by_key"]["buckets"]]
    assert keys == sorted(keys)
    # every doc has a lang value
    assert a["none_missing"]["doc_count"] == 0

    # min_doc_count prunes rare buckets
    full = s.search_aggs(q, {"t": {"terms": {"field": "lang",
                                             "size": 100}}})
    dcs = [b["doc_count"] for b in
           full["aggregations"]["t"]["buckets"]]
    thr = sorted(dcs)[len(dcs) // 2]
    pruned = s.search_aggs(q, {"t": {"terms": {
        "field": "lang", "size": 100, "min_doc_count": thr + 1}}})
    assert all(b["doc_count"] > thr
               for b in pruned["aggregations"]["t"]["buckets"])


def test_histogram_zero_fill(built):
    idx, rows = built
    s = LocalSearcher(idx)
    out = s.search_aggs({"match_all": {}}, {
        "h": {"histogram": {"field": "dl", "interval": 10,
                            "min_doc_count": 0,
                            "extended_bounds": {"min": 0, "max": 300}}},
    })
    b = out["aggregations"]["h"]["buckets"]
    keys = [x["key"] for x in b]
    assert keys == [float(k) for k in range(0, 301, 10)]
    assert sum(x["doc_count"] for x in b) == len(rows)
    assert any(x["doc_count"] == 0 for x in b)


def test_significant_text_vs_bruteforce(built):
    idx, rows = built
    an = get_analyzer("standard")
    counts = collections.Counter(
        t for r in rows for t in set(an(r["text"])))
    token = counts.most_common(20)[10][0]
    matched = _matches(rows, token)
    s = LocalSearcher(idx)
    out = s.search_aggs(
        {"term": {"text": token}},
        {"sig": {"significant_text": {"field": "text", "size": 10,
                                      "min_doc_count": 3,
                                      "shard_size": 10_000_000}},
         "sig_lang": {"significant_terms": {"field": "lang", "size": 5,
                                            "min_doc_count": 1,
                                            "shard_size": 100}}},
    )
    a = out["aggregations"]

    # brute-force oracle: JLH over exact fg/bg doc frequencies
    fg_total, bg_total = len(matched), len(rows)
    fg = collections.Counter(
        t for r in matched for t in set(an(r["text"])))
    want = []
    for t, f in fg.items():
        if f < 3:
            continue
        b = counts[t]
        fgp, bgp = f / fg_total, b / bg_total
        if fgp > bgp:
            want.append(((fgp - bgp) * (fgp / bgp), t, f, b))
    want.sort(key=lambda c: (-c[0], c[1]))
    got = a["sig"]["buckets"]
    assert [(b["key"], b["doc_count"], b["bg_count"]) for b in got] == \
           [(t, f, b) for _, t, f, b in want[:10]]
    for g, (sc, *_rest) in zip(got, want):
        assert g["score"] == pytest.approx(sc)
    # the query term itself is maximally significant (fgp == 1)
    assert got[0]["key"] == token
    assert a["sig"]["doc_count"] == fg_total

    # keyword-field significant_terms: counts match the lang split
    lang_fg = collections.Counter(r["lang"] for r in matched)
    lang_bg = collections.Counter(r["lang"] for r in rows)
    for b in a["sig_lang"]["buckets"]:
        assert b["doc_count"] == lang_fg[b["key"]]
        assert b["bg_count"] == lang_bg[b["key"]]

    # scatter parity
    rs = RaySearcher(idx, num_actors=2)
    try:
        remote = rs.search_aggs(
            {"term": {"text": token}},
            {"sig": {"significant_text": {"field": "text", "size": 10,
                                          "min_doc_count": 3,
                                          "shard_size": 10_000_000}}},
        )
        assert remote["aggregations"]["sig"] == a["sig"]
    finally:
        rs.shutdown()


def test_percentiles_and_extended_stats(built):
    idx, rows = built
    s = LocalSearcher(idx)
    out = s.search_aggs({"match_all": {}}, {
        "pct": {"percentiles": {"field": "dl",
                                "percents": [50, 95]}},
        "xs": {"extended_stats": {"field": "dl"}},
        "by_lang": {"terms": {"field": "lang", "size": 2},
                    "aggs": {"p": {"percentiles": {"field": "dl",
                                                   "percents": [50]}},
                             "x": {"extended_stats": {"field": "dl"}}}},
    })
    a = out["aggregations"]
    dls = np.array([r["dl"] for r in rows], dtype=float)

    # t-digest medians land near the exact quantiles
    assert a["pct"]["values"]["50.0"] == pytest.approx(
        np.quantile(dls, 0.5), rel=0.05)
    assert a["pct"]["values"]["95.0"] == pytest.approx(
        np.quantile(dls, 0.95), rel=0.05)

    # extended_stats exact moments
    assert a["xs"]["count"] == len(dls)
    assert a["xs"]["sum_of_squares"] == pytest.approx((dls ** 2).sum())
    assert a["xs"]["variance"] == pytest.approx(dls.var())
    assert a["xs"]["std_deviation"] == pytest.approx(dls.std())

    # per-bucket variants agree with the bucket's own value set
    for b in a["by_lang"]["buckets"]:
        bd = np.array([r["dl"] for r in rows if r["lang"] == b["key"]],
                      dtype=float)
        assert b["x"]["variance"] == pytest.approx(bd.var())
        assert b["p"]["values"]["50.0"] == pytest.approx(
            np.quantile(bd, 0.5), rel=0.10)

    # scatter parity for the digest merge law
    rs = RaySearcher(idx, num_actors=2)
    try:
        remote = rs.search_aggs({"match_all": {}}, {
            "xs": {"extended_stats": {"field": "dl"}}})
        assert remote["aggregations"]["xs"] == a["xs"]
    finally:
        rs.shutdown()


def test_terms_include_exclude_missing(built):
    """terms agg include/exclude (IncludeExclude.java: value list or
    anchored regex) and the `missing` bucket parameter."""
    idx, rows = built
    s = LocalSearcher(idx)
    full = s.search_aggs(
        {"match_all": {}},
        {"l": {"terms": {"field": "lang", "size": 100}}},
    )["aggregations"]["l"]["buckets"]
    langs = {b["key"]: b["doc_count"] for b in full}
    assert len(langs) >= 3
    some = sorted(langs)[:2]
    # include as exact list
    got = s.search_aggs(
        {"match_all": {}},
        {"l": {"terms": {"field": "lang", "size": 100, "include": some}}},
    )["aggregations"]["l"]["buckets"]
    assert {b["key"]: b["doc_count"] for b in got} == {
        k: langs[k] for k in some}
    # exclude as regex
    pat = some[0]
    got = s.search_aggs(
        {"match_all": {}},
        {"l": {"terms": {"field": "lang", "size": 100, "exclude": pat}}},
    )["aggregations"]["l"]["buckets"]
    assert {b["key"] for b in got} == set(langs) - {pat}
    # include as regex — scatter parity too
    spec = {"l": {"terms": {"field": "lang", "size": 100,
                            "include": "[a-z]*n"}}}
    a = s.search_aggs({"match_all": {}}, spec)["aggregations"]
    rs = RaySearcher(idx, num_actors=2)
    b = rs.search_aggs({"match_all": {}}, spec)["aggregations"]
    rs.shutdown()
    assert a == b
    import re
    assert {x["key"] for x in a["l"]["buckets"]} == {
        k for k in langs if re.fullmatch("[a-z]*n", k)}
    # missing: every doc has lang, so missing adds nothing...
    got = s.search_aggs(
        {"match_all": {}},
        {"l": {"terms": {"field": "lang", "size": 100,
                         "missing": "zz_none"}}},
    )["aggregations"]["l"]["buckets"]
    assert {b["key"]: b["doc_count"] for b in got} == langs


def test_significant_terms_sub_aggs(built):
    """Metric sub-aggregations under significant buckets (the reference
    supports full sub-agg trees under SignificantTerms buckets; metric
    subs here, same contract as terms buckets)."""
    idx, rows = built
    an = get_analyzer("standard")
    counts = collections.Counter(
        t for r in rows for t in set(an(r["text"])))
    token = counts.most_common(20)[10][0]
    matched = _matches(rows, token)
    s = LocalSearcher(idx)
    spec = {"sig_lang": {
        "significant_terms": {"field": "lang", "size": 5,
                              "min_doc_count": 1, "shard_size": 100},
        "aggs": {"adl": {"avg": {"field": "dl"}},
                 "mx": {"max": {"field": "dl"}}}}}
    a = s.search_aggs({"term": {"text": token}}, spec)["aggregations"]
    by_lang: dict = {}
    for r in matched:
        by_lang.setdefault(r["lang"], []).append(r["dl"])
    for b in a["sig_lang"]["buckets"]:
        vals = by_lang[b["key"]]
        assert b["doc_count"] == len(vals)
        assert b["adl"]["value"] == pytest.approx(sum(vals) / len(vals))
        assert b["mx"]["value"] == max(vals)
    # scatter parity (exercises the [fg, bg, sub] merge law)
    rs = RaySearcher(idx, num_actors=2)
    try:
        remote = rs.search_aggs({"term": {"text": token}}, spec)
        assert remote["aggregations"] == a
    finally:
        rs.shutdown()


def test_filters_rare_multi_terms(built):
    """filters (named buckets + other_bucket), rare_terms (exact
    cross-segment law: local-excess disqualifies), multi_terms
    (factorized tuple keys) — vs pandas recomputation + scatter parity."""
    idx, rows = built
    an = get_analyzer("standard")
    counts = collections.Counter(
        t for r in rows for t in set(an(r["text"])))
    token = counts.most_common(1)[0][0]
    matched = _matches(rows, token)
    s = LocalSearcher(idx)
    spec = {
        "f": {"filters": {
            "filters": {"short": {"range": {"dl": {"lt": 60}}},
                        "long": {"range": {"dl": {"gte": 120}}}},
            "other_bucket_key": "mid"},
            "aggs": {"adl": {"avg": {"field": "dl"}}}},
        "rare": {"rare_terms": {"field": "lang", "max_doc_count": 8}},
        "mt": {"multi_terms": {
            "terms": [{"field": "lang"}, {"field": "dl"}], "size": 500}},
    }
    a = s.search_aggs({"term": {"text": token}}, spec)["aggregations"]
    # filters oracle
    short = [r for r in matched if r["dl"] < 60]
    long_ = [r for r in matched if r["dl"] >= 120]
    mid = [r for r in matched if 60 <= r["dl"] < 120]
    for key, grp in (("short", short), ("long", long_), ("mid", mid)):
        b = a["f"]["buckets"][key]
        assert b["doc_count"] == len(grp)
        if grp:
            assert b["adl"]["value"] == pytest.approx(
                sum(r["dl"] for r in grp) / len(grp))
    # rare_terms oracle: langs with total matched count <= 8
    lang_fg = collections.Counter(r["lang"] for r in matched)
    want_rare = sorted(
        [(c, k) for k, c in lang_fg.items() if c <= 8])
    assert [(b["doc_count"], b["key"]) for b in a["rare"]["buckets"]] == \
        want_rare
    # multi_terms oracle: (lang, dl) tuple counts
    mt_fg = collections.Counter((r["lang"], r["dl"]) for r in matched)
    got_mt = {tuple(b["key"]): b["doc_count"] for b in a["mt"]["buckets"]}
    want_mt = {(l, str(d)): c for (l, d), c in mt_fg.items()}
    assert got_mt == want_mt
    # scatter parity (exercises filters/rare/mterms merge laws)
    rs = RaySearcher(idx, num_actors=2)
    try:
        assert rs.search_aggs({"term": {"text": token}},
                              spec)["aggregations"] == a
    finally:
        rs.shutdown()


def test_nested_bucket_sub_aggs_vs_oracle(built):
    """Bucket-under-bucket sub-aggregations (AggregatorFactories
    builder tree): terms→date_histogram→stats, date_histogram→terms,
    terms→filter, terms→range — each checked against a pandas oracle
    over the matched rows, plus scatter parity (nested reduce law)."""
    import pandas as pd

    idx, rows = built
    counts = collections.Counter(
        t for r in rows for t in set(get_analyzer("standard")(r["text"])))
    token = counts.most_common(1)[0][0]
    matched = _matches(rows, token)
    df = pd.DataFrame(matched)
    df["day"] = df["warc_ts"].astype("datetime64[us]").dt.floor("D")
    df["day_us"] = df["day"].astype("datetime64[us]").astype("int64")

    spec = {
        "by_lang": {
            "terms": {"field": "lang", "size": 100},
            "aggs": {
                "per_day": {
                    "date_histogram": {"field": "ts",
                                       "calendar_interval": "day"},
                    "aggs": {"dls": {"stats": {"field": "dl"}}},
                },
                "short": {"filter": {"range": {"dl": {"lt": 120}}},
                          "aggs": {"n": {"value_count": {"field": "dl"}}}},
                "rng": {"range": {"field": "dl",
                                  "ranges": [{"to": 100, "key": "lo"},
                                             {"from": 100, "key": "hi"}]}},
            },
        },
        "by_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"langs": {"terms": {"field": "lang", "size": 100},
                               "aggs": {"adl": {"avg": {"field": "dl"}}}}},
        },
    }
    q = {"term": {"text": token}}
    s = LocalSearcher(idx)
    a = s.search_aggs(q, spec)["aggregations"]

    # terms -> date_histogram -> stats
    for b in a["by_lang"]["buckets"]:
        sub = df[df["lang"] == b["key"]]
        assert b["doc_count"] == len(sub)
        want_days = sub.groupby("day")["dl"].agg(["count", "sum", "min",
                                                  "max"])
        got_days = {d["key_as_string"]: d for d in b["per_day"]["buckets"]}
        assert len(got_days) == len(want_days)
        for day, w in want_days.iterrows():
            g = got_days[str(day.to_datetime64().astype("datetime64[us]"))]
            assert g["doc_count"] == w["count"]
            assert g["dls"]["sum"] == pytest.approx(w["sum"])
            assert g["dls"]["min"] == w["min"]
            assert g["dls"]["max"] == w["max"]
        # terms -> filter (+ metric under it)
        nshort = int((sub["dl"] < 120).sum())
        assert b["short"]["doc_count"] == nshort
        assert b["short"]["n"]["value"] == nshort
        # terms -> range
        lo, hi = b["rng"]["buckets"]
        assert lo["key"] == "lo" and lo["doc_count"] == \
            int((sub["dl"] < 100).sum())
        assert hi["doc_count"] == int((sub["dl"] >= 100).sum())
    assert {b["key"] for b in a["by_lang"]["buckets"]} == set(df["lang"])

    # date_histogram -> terms -> avg
    for d in a["by_day"]["buckets"]:
        sub = df[df["day_us"] == np.int64(d["key"]) * 1000]
        assert d["doc_count"] == len(sub)
        want = sub.groupby("lang")["dl"].agg(["count", "mean"])
        got = {b["key"]: b for b in d["langs"]["buckets"]}
        assert len(got) == len(want)
        for lang, w in want.iterrows():
            assert got[lang]["doc_count"] == w["count"]
            assert got[lang]["adl"]["value"] == pytest.approx(w["mean"])

    # scatter parity: the nested reduce law across 2 actors
    rs = RaySearcher(idx, num_actors=2)
    try:
        remote = rs.search_aggs(q, spec)["aggregations"]
        assert remote == a
    finally:
        rs.shutdown()


def test_nested_three_levels_and_histogram_parent(built):
    """histogram parent with terms child; three-level
    terms→histogram→value_count; filters-under-terms named buckets."""
    import pandas as pd

    idx, rows = built
    df = pd.DataFrame(rows)
    spec = {
        "h": {"histogram": {"field": "dl", "interval": 100},
              "aggs": {"langs": {"terms": {"field": "lang", "size": 10}},
                       "f": {"filters": {
                           "filters": {"en": {"term": {"lang": "en"}}},
                           "other_bucket": True},
                           "aggs": {"mx": {"max": {"field": "dl"}}}}}},
        "deep": {"terms": {"field": "lang", "size": 10},
                 "aggs": {"hh": {"histogram": {"field": "dl",
                                               "interval": 100},
                                 "aggs": {"n": {"value_count":
                                                {"field": "dl"}}}}}},
    }
    s = LocalSearcher(idx)
    a = s.search_aggs({"match_all": {}}, spec)["aggregations"]
    df["hb"] = (df["dl"] // 100) * 100

    for hb in a["h"]["buckets"]:
        sub = df[df["hb"] == hb["key"]]
        assert hb["doc_count"] == len(sub)
        got = {b["key"]: b["doc_count"] for b in hb["langs"]["buckets"]}
        assert got == dict(sub["lang"].value_counts())
        en = sub[sub["lang"] == "en"]
        assert hb["f"]["buckets"]["en"]["doc_count"] == len(en)
        assert hb["f"]["buckets"]["_other_"]["doc_count"] == \
            len(sub) - len(en)
        if len(en):
            assert hb["f"]["buckets"]["en"]["mx"]["value"] == en["dl"].max()

    for tb in a["deep"]["buckets"]:
        sub = df[df["lang"] == tb["key"]]
        want = sub.groupby("hb").size()
        got = {b["key"]: b for b in tb["hh"]["buckets"]}
        assert len(got) == len(want)
        for k, c in want.items():
            assert got[float(k)]["doc_count"] == c
            assert got[float(k)]["n"]["value"] == c


def test_cardinality_hll_partial_regime(built):
    """Above ``precision_threshold`` the cardinality partial switches
    from the exact value set to a fixed-size HLL++ sketch
    (HyperLogLogPlusPlus linear-counting→HLL regime). Forced low
    threshold: estimate within the p=14 error bound of exact; partial
    bytes bounded; exact regime (default threshold) unchanged; scatter
    merge (set+hll / hll+hll) consistent with local."""
    idx, rows = built
    s = LocalSearcher(idx)
    q = {"match_all": {}}
    exact_urls = len({r["url"] for r in rows})

    # default threshold: url cardinality (300) < 3000 -> exact
    a = s.search_aggs(q, {"c": {"cardinality": {"field": "url"}}})
    assert a["aggregations"]["c"]["value"] == exact_urls

    # forced sketch regime
    spec = {"c": {"cardinality": {"field": "url",
                                  "precision_threshold": 10}}}
    est = s.search_aggs(q, spec)["aggregations"]["c"]["value"]
    # p=14 relative error ~1.04/sqrt(2^14) = 0.81%; 5 sigma margin
    assert abs(est - exact_urls) <= max(3, 0.05 * exact_urls)

    # the shipped partial really is a bounded sketch, not a value set
    from raydex.search.aggsphase import _metric_partial

    urls = np.array(sorted({r["url"] for r in rows}), dtype=object)
    part = _metric_partial("cardinality", urls,
                           {"precision_threshold": 10})
    assert part["k"] == "hll" and len(part["b"]) == (1 << 14) + 1

    # scatter parity: set+hll / hll+hll merges reduce identically
    rs = RaySearcher(idx, num_actors=2)
    try:
        remote = rs.search_aggs(q, spec)["aggregations"]["c"]["value"]
        assert remote == est
    finally:
        rs.shutdown()

    # nested under a bucket agg: per-lang url cardinality, forced HLL
    nested = s.search_aggs(q, {
        "by_lang": {"terms": {"field": "lang", "size": 100},
                    "aggs": {"cu": {"cardinality": {
                        "field": "url", "precision_threshold": 5}}}},
    })["aggregations"]
    for b in nested["by_lang"]["buckets"]:
        want = len({r["url"] for r in rows if r["lang"] == b["key"]})
        assert abs(b["cu"]["value"] - want) <= max(3, 0.05 * want)
