"""Tests: extra filters, rank_eval, highlight, termvectors, suggest,
rescore, simple_query_string, fieldcaps, reindex."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.analysis.extra_filters import (
    asciifolding_filter,
    char_group_tokenizer,
    edge_ngram_filter,
    length_filter,
    make_custom_analyzer,
    ngram_filter,
    path_hierarchy_tokenizer,
    pattern_replace_charfilter,
    pattern_tokenizer,
    reverse_filter,
    shingle_filter,
    truncate_filter,
    unique_filter,
)
from raydex.index.segment import SegmentReader, build_segment
from raydex.search.rank_eval import ndcg_at_k, precision_at_k, rank_eval, reciprocal_rank


def test_ngram_edge_shingle():
    assert ngram_filter(["ab"], 1, 2) == ["a", "b", "ab"]
    assert edge_ngram_filter(["abc"], 1, 2) == ["a", "ab"]
    assert shingle_filter(["a", "b", "c"], 2, 2) == ["a", "b", "c", "a b", "b c"]
    assert shingle_filter(["a", "b"], 2, 2, output_unigrams=False) == ["a b"]


def test_fold_misc_filters():
    assert asciifolding_filter(["café", "Ünïcode"]) == ["cafe", "Unicode"]
    assert length_filter(["a", "abc"], min_len=2) == ["abc"]
    assert truncate_filter(["abcdef"], 3) == ["abc"]
    assert reverse_filter(["abc"]) == ["cba"]
    assert unique_filter(["a", "b", "a"]) == ["a", "b"]


def test_custom_tokenizers():
    tok = char_group_tokenizer("-_")
    assert tok("a-b_c") == ["a", "b", "c"]
    pt = pattern_tokenizer(r",\s*")
    assert pt("a, b,c") == ["a", "b", "c"]
    ph = path_hierarchy_tokenizer()
    assert ph("/a/b/c") == ["/a", "/a/b", "/a/b/c"]
    cf = pattern_replace_charfilter(r"\d+", "#")
    an = make_custom_analyzer("test_custom", pattern_tokenizer(r"\s+"), [asciifolding_filter], [cf])
    assert an("café 123 x") == ["cafe", "#", "x"]


def test_synonym_and_keyword_marker():
    from raydex.analysis.extra_filters import make_stemming_filter, synonym_filter

    syn = synonym_filter({"quick": ["fast", "rapid"]})
    assert syn(["quick", "dog"]) == ["quick", "fast", "rapid", "dog"]
    contract = synonym_filter({"quick": ["fast"]}, expand=False)
    assert contract(["quick"]) == ["fast"]
    stem = make_stemming_filter(protected={"running"})
    assert stem(["running", "jumping"]) == ["running", "jump"]


def test_rank_eval_metrics():
    ranked = ["a", "b", "c", "d"]
    rel = {"b", "d", "z"}
    assert precision_at_k(ranked, rel, 2) == 0.5
    assert reciprocal_rank(ranked, rel, 10) == 0.5
    gains = {"a": 3, "b": 1}
    assert 0 < ndcg_at_k(ranked, gains, 4) <= 1.0
    assert ndcg_at_k(["a", "b"], gains, 2) == 1.0  # ideal order
    res = rank_eval({1: ranked}, {1: {"b": 1, "d": 1}}, k=4)
    assert res["metrics"]["recall_at_k"] == 1.0


@pytest.fixture(scope="module")
def feat_seg(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("feat") / "seg")
    docs = [
        ("u0", "the search engine indexes web pages quickly"),
        ("u1", "search quality relies on ranking and scoring"),
        ("u2", "databases store rows and columns"),
    ]
    build_segment(d, [u for u, _ in docs], [t for _, t in docs], analyzer="standard_en")
    return SegmentReader(d), docs


def test_highlight(feat_seg):
    from raydex.search.highlight import highlight

    _, docs = feat_seg
    frags = highlight(docs[0][1], {"search", "engine"}, "standard_en")
    assert frags and "<em>search</em>" in frags[0] and "<em>engine</em>" in frags[0]
    assert highlight("no hits here", {"zzz"}) == []


def test_termvectors(feat_seg):
    from raydex.search.termvectors import mtermvectors, term_vector

    tv = term_vector("the dog and the dog", "standard_en")
    assert tv["dog"]["term_freq"] == 2
    assert tv["dog"]["positions"] == [1, 4]  # stop gaps preserved
    assert "the" not in tv
    assert len(mtermvectors(["a b", "c"])) == 2


def test_suggest(feat_seg):
    from raydex.search.suggest import phrase_suggest, term_suggest

    r, _ = feat_seg
    out = term_suggest(r, "serch")
    assert out["serch"][0]["text"] == "search"
    out = term_suggest(r, "search")
    assert out["search"] == []  # exact term -> no suggestions (missing)
    ph = phrase_suggest(r, "serch qualiti")
    assert ph[0]["text"] == "search quality"


def test_term_suggest_modes(tmp_path):
    """TermSuggestionBuilder.SuggestMode: missing (default) skips
    dictionary hits; always suggests for them too; popular keeps only
    higher-df candidates."""
    from raydex.search.suggest import term_suggest

    d = str(tmp_path / "seg")
    # df: apple=2, apples=3, appley=1
    docs = [("u0", "apple apples appley"), ("u1", "apples"),
            ("u2", "apple apples")]
    build_segment(d, [u for u, _ in docs], [t for _, t in docs],
                  analyzer="standard_en")
    r = SegmentReader(d)
    assert term_suggest(r, "apple")["apple"] == []      # missing mode
    got = term_suggest(r, "apple", suggest_mode="always")["apple"]
    assert [o["text"] for o in got] == ["apples", "appley"]
    got = term_suggest(r, "apple", suggest_mode="popular")["apple"]
    assert [o["text"] for o in got] == ["apples"]       # df 3 > 2
    # popular still corrects a missing token, df-gated at 0
    got = term_suggest(r, "aplle", suggest_mode="popular")["aplle"]
    assert got[0]["text"] == "apple"


def test_simple_query_string():
    from raydex.search.query_string import parse_simple_query_string

    q = parse_simple_query_string('+apple -banana "exact phrase" cat|dog plain')
    b = q["bool"]
    assert b["must"][0] == {"match": {"text": "apple"}}
    assert b["must_not"][0] == {"match": {"text": "banana"}}
    kinds = [list(c)[0] for c in b["should"]]
    assert "match_phrase" in kinds and "bool" in kinds and "match" in kinds
    assert parse_simple_query_string("") == {"match_all": {}}
    q = parse_simple_query_string("a b", default_operator="and")
    assert len(q["bool"]["must"]) == 2


def test_rescore(tmp_path, ray_session):
    from raydex.corpus import make_pages_table
    from raydex.index.build import build_index
    from raydex.search.rescore import rescore_hits
    from raydex.search.scatter import LocalSearcher

    t = make_pages_table(200, seed=23)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, source="text")
    s = LocalSearcher(idx)
    hits = s.search("search engine", k=10)
    if hits:
        res = rescore_hits(hits, s, {"match": {"text": "data"}}, window_size=5)
        assert len(res) == len(hits)
        scores = [h["score"] for h in res[: min(5, len(res))]]
        assert scores == sorted(scores, reverse=True)


def test_fieldcaps(sf_dir):
    from raydex.index.fieldcaps import field_caps_for_parquet

    caps = field_caps_for_parquet(
        {"documents": f"{sf_dir}/documents.parquet", "events": f"{sf_dir}/events.parquet"}
    )
    assert "text" in caps and caps["n_chars"]["aggregatable"]
    assert set(caps["event_id"]["indices"]) == {"events"}


def test_reindex(tmp_path, ray_session, sf_dir):
    import pyarrow.compute as pc
    import ray.data as rd

    from raydex.ops.reindex import reindex

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    dest = str(tmp_path / "out")
    out = reindex(
        ds,
        dest_dir=dest,
        predicate=lambda t: pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False),
        transform=lambda t: t.append_column(
            "n2", pc.multiply(t["n_chars"], 2)
        ),
    )
    back = rd.read_parquet(dest).to_pandas()
    assert (back["lang"] == "en").all()
    assert (back["n2"] == back["n_chars"] * 2).all()
    # sliced run processes a strict subset
    sl = reindex(ds, id_col="doc_id", slices=4, slice_id=0).count()
    assert 0 < sl < ds.count()


@pytest.fixture(scope="module")
def feat_pseg(tmp_path_factory):
    """Positions-enabled segment for the LM phrase suggester."""
    d = str(tmp_path_factory.mktemp("featp") / "seg")
    docs = [
        ("u0", "the search engine indexes web pages quickly"),
        ("u1", "search engine quality relies on ranking and scoring"),
        ("u2", "databases store rows and columns"),
        ("u3", "the search engine ranks pages"),
    ]
    build_segment(d, [u for u, _ in docs], [t for _, t in docs],
                  analyzer="standard_en", store_positions=True)
    return SegmentReader(d), docs


def test_completion_suggest(feat_seg):
    from raydex.search.suggest import completion_suggest

    r, _ = feat_seg
    out = completion_suggest(r, "s")
    assert out and out[0]["text"] in ("search", "scoring", "store")
    assert out[0]["weight"] >= out[-1]["weight"]  # weight-ranked
    assert completion_suggest(r, "zzz") == []
    texts = [o["text"] for o in completion_suggest(r, "se")]
    assert texts == ["search"]


def test_phrase_suggest_lm(feat_pseg):
    from raydex.search.suggest import phrase_suggest_lm

    r, _ = feat_pseg
    out = phrase_suggest_lm(r, "serch engin")
    assert out[0]["text"] == "search engine"
    # bigram LM prefers the corpus collocation over a rarer pairing
    out = phrase_suggest_lm(r, "search engin")
    assert out[0]["text"] == "search engine"
    # already-correct input survives as the top suggestion
    out = phrase_suggest_lm(r, "search engine")
    assert out[0]["text"] == "search engine"


def test_phrase_suggest_collate(feat_pseg):
    """collate: corrections must actually co-occur in >=1 doc
    (conjunction of the suggestion's terms), the reference's collate
    query prune."""
    from raydex.search.suggest import phrase_suggest_lm

    r, _ = feat_pseg
    # 'databases engine' never co-occur: collate prunes pairings the
    # LM alone would emit
    plain = phrase_suggest_lm(r, "databasez engin", size=5)
    collated = phrase_suggest_lm(r, "databasez engin", size=5,
                                 collate=True)
    assert all(" " in o["text"] for o in plain)
    for o in collated:
        a, b = o["text"].split(" ", 1)
        import numpy as np

        da, _ = r.postings(r.lookup(a))
        db, _ = r.postings(r.lookup(b))
        assert np.intersect1d(da, db).size > 0
    texts = [o["text"] for o in collated]
    assert "databases engine" not in texts
    # a genuinely co-occurring correction survives collate
    out = phrase_suggest_lm(r, "serch engin", collate=True)
    assert out[0]["text"] == "search engine"


def test_unified_highlight(feat_seg):
    from raydex.search.highlight import unified_highlight

    _, docs = feat_seg
    text = docs[0][1] + ". " + docs[1][1] + "."
    frags = unified_highlight(text, {"search", "engine"}, analyzer="standard_en",
                              number_of_fragments=2)
    assert frags and "<em>search</em>" in frags[0]
    # passage with BOTH terms scores above the one with a single term
    assert "<em>engine</em>" in frags[0]
    # phrase hits tag the whole phrase as one unit
    frags = unified_highlight(
        text, set(), phrases=[["search", "engine"]], analyzer="standard_en"
    )
    assert any("<em>search engine" in f for f in frags)
    # idf-shaped weighting flips passage order
    frags = unified_highlight(text, {"quality", "web"}, analyzer="standard_en",
                              term_weights={"quality": 5.0, "web": 1.0},
                              number_of_fragments=1)
    assert "<em>quality</em>" in frags[0]
    assert unified_highlight("nothing here", {"zzz"}) == []


def test_percolate(ray_session):
    import ray.data as rd

    from raydex.search.percolate import percolate

    docs = [
        {"doc_id": 0, "text": "ray data streaming pipelines"},
        {"doc_id": 1, "text": "cats and dogs"},
        {"doc_id": 2, "text": "streaming video platform"},
        {"doc_id": 3, "text": "data lake storage"},
    ]
    queries = {
        "q_stream": {"match": {"text": "streaming"}},
        "q_data_no_lake": {"bool": {"must": [{"term": {"text": "data"}}],
                                    "must_not": [{"term": {"text": "lake"}}]}},
        "q_phrase": {"match_phrase": {"text": "data streaming"}},
        "q_all": {"match_all": {}},
    }
    out = percolate(rd.from_items(docs), "text", "doc_id", queries).to_pandas()
    got = {(r.doc_id, r.query_id) for r in out.itertuples()}
    assert ("q_stream" in {q for d, q in got if d == 0})
    assert (2, "q_stream") in got and (1, "q_stream") not in got
    assert (0, "q_data_no_lake") in got and (3, "q_data_no_lake") not in got
    assert (0, "q_phrase") in got and (2, "q_phrase") not in got
    assert {d for d, q in got if q == "q_all"} == {0, 1, 2, 3}


def test_cjk_and_phonetic_filters():
    from raydex.analysis.extra_filters import (
        cjk_bigram_filter,
        cjk_width_filter,
        phonetic_filter,
        soundex,
    )

    # Lucene CJKBigramFilter semantics on standard-tokenizer output
    assert cjk_bigram_filter(["日", "本", "語", "text"]) == ["日本", "本語", "text"]
    assert cjk_bigram_filter(["日", "本"], output_unigrams=True) == ["日", "本", "日本"]
    assert cjk_bigram_filter(["語"]) == ["語"]  # lone CJK char passes through
    assert cjk_width_filter(["ｔｅｓｔ", "ｶﾀｶﾅ"]) == ["test", "カタカナ"]
    # published American-Soundex goldens (h/w merge + vowel break rules)
    for w, code in [
        ("Robert", "R163"), ("Rupert", "R163"), ("Ashcraft", "A261"),
        ("Ashcroft", "A261"), ("Tymczak", "T522"), ("Honeyman", "H555"),
        ("Pfister", "P236"), ("Jackson", "J250"),
    ]:
        assert soundex(w) == code, (w, soundex(w))
    assert phonetic_filter(["smith", "smyth"],
                       encoder="soundex") == ["S530", "S530"]
    assert phonetic_filter(["smith"], encoder="soundex",
                       replace=False) == ["smith", "S530"]


def test_from_size_window(tmp_path, ray_session):
    from raydex.corpus import pages_path
    from raydex.index.build import build_index
    from raydex.search.scatter import MAX_RESULT_WINDOW, LocalSearcher

    idx = str(tmp_path / "idx_window")
    build_index(pages_path(300, seed=42), idx, num_partitions=2)
    s = LocalSearcher(idx)
    top10 = s.search("web search engine", k=10)
    page2 = s.search("web search engine", k=5, from_=5)
    assert [r["url"] for r in page2] == [r["url"] for r in top10[5:10]]
    d = s.search_query({"match": {"text": "web search"}}, k=4, from_=2)
    d_all = s.search_query({"match": {"text": "web search"}}, k=6)
    assert [r["url"] for r in d] == [r["url"] for r in d_all[2:6]]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        s.search("web", k=10, from_=MAX_RESULT_WINDOW)
    with _pytest.raises(ValueError):
        s.search("web", k=10, from_=-1)


def test_replicated_searcher_and_ars(tmp_path, ray_session):
    """Replica read scaling: every replica holds the full index, so
    round-robin and adaptive-replica-selection dispatch must return
    identical results; ARS keeps an EWMA per replica."""
    from raydex.corpus import pages_path
    from raydex.index.build import build_index
    from raydex.search.scatter import LocalSearcher, ReplicatedSearcher

    idx = str(tmp_path / "idx_repl")
    build_index(pages_path(300, seed=42), idx, num_partitions=2)
    rs = ReplicatedSearcher(idx, num_replicas=2, cpus_per_replica=1)
    rs.wait_ready()
    queries = [("web search engine", 5), ("data batch", 3),
               ("the and of", 5), ("page content", 4)]
    rr = rs.search_batch(queries)
    ars = rs.search_batch_adaptive(queries)
    assert [[(h["url"], round(h["score"], 5)) for h in q] for q in rr] == \
           [[(h["url"], round(h["score"], 5)) for h in q] for q in ars]
    # and both match the single-process searcher
    ls = LocalSearcher(idx)
    solo = [ls.search(q, k=k) for q, k in queries]
    assert [[h["url"] for h in q] for q in rr] == \
           [[h["url"] for h in q] for q in solo]
    # EWMA state recorded for every replica that served work
    assert len(rs._ars_ewma) == 2 and all(e > 0 for e in rs._ars_ewma)


def test_validate_query():
    from raydex.search.query import validate_query

    ok = validate_query({"bool": {"must": [{"match": {"text": "apple"}}]}})
    assert ok["valid"] and "explanation" in ok
    bad = validate_query({"no_such_query": {"text": "x"}})
    assert not bad["valid"] and "error" in bad
    # malformed body (range with no field dict)
    bad2 = validate_query({"range": {"dl": "oops"}})
    assert not bad2["valid"]


def test_profile_search(tmp_path, ray_session):
    """`"profile": true` analogue: one row per evaluated segment with
    wall time + matched counts; hits identical to the unprofiled search;
    local and scatter searchers agree."""
    import pyarrow.parquet as pq

    from raydex.corpus import make_pages_table
    from raydex.index.build import build_index
    from raydex.search.scatter import LocalSearcher, RaySearcher

    t = make_pages_table(300, seed=41)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=3, analyzer="standard_en",
                source="text", max_docs_per_segment=60)
    s = LocalSearcher(idx)
    q = {"match": {"text": "web search engine"}}
    plain = s.search_query(q, k=5)
    out = s.profile_search(q, k=5)
    assert [(h["url"], h["score"]) for h in out["hits"]] == \
           [(h["url"], h["score"]) for h in plain]
    prof = out["profile"]
    assert prof["took_nanos"] > 0
    assert len(prof["segments"]) == len(s.seg_dirs)
    for row in prof["segments"]:
        assert row["type"] == "match"
        assert row["time_in_nanos"] >= 0
        assert 0 <= row["matched"] <= row["docs"]
    rs = RaySearcher(idx, num_actors=2)
    try:
        dout = rs.profile_search(q, k=5)
        assert [(h["url"], h["score"]) for h in dout["hits"]] == \
               [(h["url"], h["score"]) for h in plain]
        assert len(dout["profile"]["segments"]) == len(s.seg_dirs)
    finally:
        rs.shutdown()


def test_multi_index_search(tmp_path, ray_session):
    """/idx1,idx2/_search: union hits with IDF computed over the union —
    identical scores to one index built over all docs."""
    from raydex.corpus import make_pages_table
    from raydex.index.build import build_index
    from raydex.search.scatter import LocalSearcher, resolve_index_dirs

    t = make_pages_table(300, seed=77)
    # _id (url) dedup is per-index — drop cross-split duplicates up front
    # so the union index and the single index see identical corpora.
    seen, keep = set(), []
    for i, u in enumerate(t.column("url").to_pylist()):
        if u not in seen:
            seen.add(u)
            keep.append(i)
    t = t.take(keep)
    half = t.num_rows // 2
    a, b = t.slice(0, half), t.slice(half)
    pa_, pb_ = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(a, pa_)
    pq.write_table(b, pb_)
    pall = str(tmp_path / "all.parquet")
    pq.write_table(t, pall)
    ia, ib, iall = (str(tmp_path / n) for n in ("idx_a", "idx_b", "idx_all"))
    build_index(pa_, ia, num_partitions=2, source="text")
    build_index(pb_, ib, num_partitions=2, source="text")
    build_index(pall, iall, num_partitions=2, source="text")

    multi = LocalSearcher(f"{ia},{ib}")
    single = LocalSearcher(iall)
    assert multi.ndocs == single.ndocs and multi.sum_dl == single.sum_dl

    for q in ("search engine", "data", "the quick"):
        hm = multi.search(q, k=10)
        hs = single.search(q, k=10)
        assert [round(h["score"], 5) for h in hm] == [
            round(h["score"], 5) for h in hs
        ]
        assert {h["url"] for h in hm} == {h["url"] for h in hs}

    # glob expression resolution
    dirs = resolve_index_dirs(str(tmp_path / "idx_*"))
    assert dirs == sorted([ia, ib, iall])
    with pytest.raises(ValueError):
        resolve_index_dirs(str(tmp_path / "nomatch-*"))

    # analyzer mismatch rejected
    import json, os

    man = json.load(open(os.path.join(ib, "index_manifest.json")))
    man["analyzer"] = "whitespace"
    json.dump(man, open(os.path.join(ib, "index_manifest.json"), "w"))
    with pytest.raises(ValueError):
        LocalSearcher(f"{ia},{ib}")


def test_script_score_and_pinned_via_searcher(tmp_path, ray_session):
    """ADVICE r2 (high): collect_stat_terms must recurse into
    ScriptScore.inner and Pinned.organic, or the coordinator collects no
    global df and the Match leaf (which requires gdf > 0) matches
    nothing through LocalSearcher/RaySearcher."""
    from raydex.corpus import make_pages_table
    from raydex.index.build import build_index
    from raydex.search.scatter import LocalSearcher

    t = make_pages_table(200, seed=31)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, source="text")
    s = LocalSearcher(idx)

    plain = s.search_query({"match": {"text": "search engine"}}, k=10)
    assert plain, "corpus should match 'search engine'"

    ss = s.search_query(
        {"script_score": {"query": {"match": {"text": "search engine"}},
                          "script": {"source": "times_param",
                                     "params": {"f": 2.0}}}},
        k=10,
    )
    assert {h["url"] for h in ss} == {h["url"] for h in plain}
    for a, b in zip(sorted(ss, key=lambda h: h["url"]),
                    sorted(plain, key=lambda h: h["url"])):
        assert abs(a["score"] - 2.0 * b["score"]) < 1e-6

    pin_url = plain[-1]["url"]
    pinned = s.search_query(
        {"pinned": {"ids": [pin_url],
                    "organic": {"match": {"text": "search engine"}}}},
        k=10,
    )
    assert pinned[0]["url"] == pin_url
    # organic hits survive below the pinned one
    assert len(pinned) == len(plain)
    assert {h["url"] for h in pinned} == {h["url"] for h in plain}


def test_ip_range_malformed_rows(ray_session):
    """ADVICE r2 (low): malformed / null IPs must route to no bucket,
    not shift later rows through the flat reshape."""
    import ray.data as rd

    from raydex.ops.aggs import ip_range_agg

    ds = rd.from_items(
        [{"ip": "10.0.0.1"}, {"ip": "not-an-ip"}, {"ip": None},
         {"ip": "10.0.0.2"}, {"ip": "1.2.3"}, {"ip": "300.1.2.3"},
         {"ip": "192.168.0.7"}]
    )
    out = ip_range_agg(
        ds, "ip",
        [("ten", "10.0.0.0", "10.0.1.0"), ("all", None, None)],
    ).to_pandas().set_index("bucket")["doc_count"]
    assert int(out["ten"]) == 2
    assert int(out["all"]) == 3  # only well-formed rows count


def test_replicated_searcher_shutdown_raises(tmp_path, ray_session):
    """ADVICE r2 (low): search after shutdown() raises a descriptive
    error instead of an opaque RayActorError."""
    from raydex.corpus import make_pages_table
    from raydex.index.build import build_index
    from raydex.search.scatter import ReplicatedSearcher

    t = make_pages_table(80, seed=7)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=1, source="text")
    s = ReplicatedSearcher(idx, num_replicas=2)
    s.wait_ready()
    assert s.search_batch([("search", 5)])
    s.shutdown()
    with pytest.raises(RuntimeError, match="shut down"):
        s.search_batch([("search", 5)])
    with pytest.raises(RuntimeError, match="shut down"):
        s.search_batch_adaptive([("search", 5)])


def test_named_queries_matched_queries(tmp_path, ray_session):
    """`_name` on clauses -> per-hit matched_queries (the reference's
    AbstractQueryBuilder#queryName), local + scatter parity."""
    import pyarrow.parquet as pq

    from raydex.corpus import make_pages_table
    from raydex.index.build import build_index
    from raydex.search.scatter import LocalSearcher, RaySearcher

    t = make_pages_table(200, seed=13)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, analyzer="standard_en",
                source="text", max_docs_per_segment=60)
    s = LocalSearcher(idx)
    q = {"bool": {
        "should": [
            {"match": {"text": {"query": "web search", "_name": "ws"}}},
            {"term": {"text": {"value": "data", "_name": "d"}}},
        ],
    }}
    hits = s.search_query(q, k=20)
    assert hits and all("matched_queries" in h for h in hits)
    # every hit's names are consistent with standalone counts
    ws = {h["url"] for h in s.search_query(
        {"match": {"text": "web search"}}, k=1000)}
    d = {h["url"] for h in s.search_query(
        {"term": {"text": "data"}}, k=1000)}
    for h in hits:
        assert ("ws" in h["matched_queries"]) == (h["url"] in ws)
        assert ("d" in h["matched_queries"]) == (h["url"] in d)
    rs = RaySearcher(idx, num_actors=2)
    try:
        rh = rs.search_query(q, k=20)
        assert [(h["url"], h["matched_queries"]) for h in rh] == \
               [(h["url"], h["matched_queries"]) for h in hits]
    finally:
        rs.shutdown()


def test_min_score(tmp_path, ray_session):
    """`min_score` drops hits below the absolute threshold — identical
    to post-filtering an un-thresholded search (per-segment filter ==
    the reference's global one), local + scatter."""
    import pyarrow.parquet as pq

    from raydex.corpus import make_pages_table
    from raydex.index.build import build_index
    from raydex.search.scatter import LocalSearcher, RaySearcher

    t = make_pages_table(200, seed=31)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, analyzer="standard_en",
                source="text", max_docs_per_segment=60)
    s = LocalSearcher(idx)
    q = {"match": {"text": "web search engine"}}
    base = s.search_query(q, k=1000)
    # pick a threshold strictly BETWEEN two distinct emitted scores
    # (emitted scores are float32-cast; an exact-boundary threshold
    # would probe the float64-vs-emitted rounding, not min_score)
    uniq = sorted({h["score"] for h in base}, reverse=True)
    thr = (uniq[len(uniq) // 2] + uniq[len(uniq) // 2 - 1]) / 2.0
    got = s.search_query(q, k=1000, min_score=thr)
    want = [(h["url"], h["score"]) for h in base if h["score"] >= thr]
    assert [(h["url"], h["score"]) for h in got] == want
    rs = RaySearcher(idx, num_actors=2)
    try:
        rgot = rs.search_query(q, k=1000, min_score=thr)
        assert [(h["url"], h["score"]) for h in rgot] == want
    finally:
        rs.shutdown()


def test_fetch_source_and_script_fields(ray_session, tmp_path):
    """FetchSourcePhase/ScriptFieldsPhase: per-hit _source
    include/exclude projection (wildcards, includes before excludes),
    script_fields via the registry, keyword sub-field surfacing, and
    Local/Ray parity."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydex.index.build import build_index
    from raydex.index.segment import FieldSpec
    from raydex.search.fetchphase import (
        filter_source,
        normalize_source_spec,
        register_field_script,
    )
    from raydex.search.scatter import LocalSearcher, RaySearcher

    n = 40
    t = pa.table({
        "url": pa.array([f"u{i}.example" for i in range(n)]),
        "warc_ts": pa.array(np.arange(n, dtype="int64"),
                            pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array([f"doc body token{i % 3} data" for i in range(n)],
                         pa.large_string()),
        "stars": pa.array((np.arange(n) % 5).astype("int64")),
        "lang": pa.array(["en" if i % 2 else "fr" for i in range(n)]),
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, analyzer="standard",
                source="text",
                fields=[FieldSpec("stars", source="stars",
                                  analyzer="long"),
                        FieldSpec("lang", source="lang",
                                  analyzer="keyword")])
    s = LocalSearcher(idx)
    q = {"match": {"text": "data"}}

    # source=True -> full source incl. the keyword sub-field
    hits = s.search_query(q, k=5, source=True)
    for h in hits:
        i = int(h["url"].split(".")[0][1:])
        assert h["_source"]["stars"] == i % 5
        assert h["_source"]["lang"] == ("en" if i % 2 else "fr")
        assert h["_source"]["url"] == h["url"]

    # includes + excludes with wildcards; includes before excludes
    hits = s.search_query(q, k=3, source={"includes": ["st*", "lang"],
                                          "excludes": ["stars"]})
    assert all(set(h["_source"]) == {"lang"} for h in hits)
    # bare-list shorthand
    hits = s.search_query(q, k=3, source=["url"])
    assert all(set(h["_source"]) == {"url"} for h in hits)
    # source=False -> no _source key
    hits = s.search_query(q, k=3, source=False)
    assert all("_source" not in h for h in hits)

    # script_fields without source
    register_field_script(
        "stars_plus", lambda doc, p: doc["stars"] + p.get("add", 0))
    hits = s.search_query(
        q, k=4,
        script_fields={"sp": {"script": {"source": "stars_plus",
                                         "params": {"add": 10}}}})
    for h in hits:
        i = int(h["url"].split(".")[0][1:])
        assert h["fields"]["sp"] == i % 5 + 10
        assert "_source" not in h

    # Ray parity (scripts resolve per process, so the parity leg uses
    # a module-registered built-in the actors also have)
    sf_spec = {"sp": {"script": {"source": "doc_value_times",
                                 "params": {"field": "stars",
                                            "factor": 3}}}}
    local = s.search_query(q, k=5, source=["stars", "lang"],
                           script_fields=sf_spec)
    rs = RaySearcher(idx, num_actors=2)
    try:
        remote = rs.search_query(q, k=5, source=["stars", "lang"],
                                 script_fields=sf_spec)
        assert remote == local
    finally:
        rs.shutdown()

    # unit: spec normalization + projection semantics
    assert normalize_source_spec(False) is None
    assert normalize_source_spec(True) == ([], [])
    assert normalize_source_spec("a*") == (["a*"], [])
    assert normalize_source_spec({"include": "x"}) == (["x"], [])
    doc = {"ab": 1, "ac": 2, "b": 3}
    assert filter_source(doc, ["a*"], ["ac"]) == {"ab": 1}
    assert filter_source(doc, [], ["b"]) == {"ab": 1, "ac": 2}


def test_common_filter_roundout():
    """elision / apostrophe / decimal_digit / limit / keep /
    stemmer_override / fingerprint analyzer (CommonAnalysisPlugin
    inventory round-out)."""
    from raydex.analysis.extra_filters import (
        ITALIAN_ELISION_ARTICLES,
        apostrophe_filter,
        decimal_digit_filter,
        elision_filter,
        keep_filter,
        limit_filter,
        stemmer_override_filter,
    )
    from raydex.analysis.tokenizer import get_analyzer

    assert elision_filter(["l'avion", "qu'il", "xyz'abc"]) == [
        "avion", "il", "xyz'abc"]
    assert elision_filter(["dell'arte"], ITALIAN_ELISION_ARTICLES) == ["arte"]
    assert apostrophe_filter(["türkiye'den", "plain"]) == ["türkiye", "plain"]
    assert decimal_digit_filter(["٤٥٦", "١x٢"]) == ["456", "1x2"]
    assert limit_filter(["a", "b", "c"], 2) == ["a", "b"]
    assert keep_filter(["Cat", "dog"], ["cat"]) == ["Cat"]
    assert stemmer_override_filter({"running": "run"})(["running", "x"]) == [
        "run", "x"]
    assert get_analyzer("fingerprint")("The QUICK brown Fox the fox") == [
        "brown fox quick the"]
    # elision is wired into the french/italian language analyzers
    assert get_analyzer("french")("L'avion des travailleurs") == [
        "avion", "travailleur"]
    # arte keeps its final e (outside RV) — the elision is the point
    assert get_analyzer("italian")("dell'arte nazionale") == [
        "arte", "nazional"]
