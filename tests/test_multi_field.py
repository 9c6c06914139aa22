"""Index-time multi-field mappings: per-field postings + global stats.

The reference indexes every mapped field into its own Lucene field with
its own analyzer (``server/.../index/mapper/MapperService.java``,
``TextFieldMapper.java:81-99``, ``KeywordFieldMapper.java``); here each
FieldSpec builds a complete per-field sub-index under
``<seg>/field=<name>/`` and the coordinator collects per-(field, term)
GLOBAL df + per-field global avgdl, so multi_match / combined_fields /
term-on-field rank identically across segment layouts.
"""

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.analysis.smallfloat import byte4_to_int, int_to_byte4
from raydex.analysis.tokenizer import keywordish_analyze, standard_analyze
from raydex.index.build import build_index, segment_dirs
from raydex.index.segment import FieldSpec, SegmentReader
from raydex.search.scatter import LocalSearcher

K1, B = 1.2, 0.75


def _corpus():
    rows = []
    for i in range(60):
        words = ["alpha"] * (i % 3 + 1) + ["beta"] * (i % 2) + [f"tok{i % 7}"]
        rows.append(
            {
                "url": f"site-{i % 5}.example/page/{i}",
                "warc_ts": i,
                "text": " ".join(words),
                "lang": ["en", "de", "fr"][i % 3],
            }
        )
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows]).cast(
                pa.timestamp("us")
            ),
            "text": pa.array([r["text"] for r in rows], pa.large_string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )


FIELDS = [
    FieldSpec("url", source="url", analyzer="keywordish"),
    FieldSpec("lang", source="lang", analyzer="keyword"),
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    t = _corpus()
    p = str(tmp_path_factory.mktemp("mf_pages") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("mf_idx") / "index")
    m = build_index(
        p, idx, num_partitions=3, analyzer="standard", source="text",
        max_docs_per_segment=10, fields=FIELDS,
    )
    return idx, m, t


def _bm25_oracle(values, analyze, query_tokens, ndocs):
    """Per-doc BM25 over one field with exact global stats (float64,
    quantized dl) — the same formula the engine must produce."""
    toks = [analyze(v) for v in values]
    dl = np.array([len(x) for x in toks], dtype=np.int64)
    dl_q = byte4_to_int(int_to_byte4(dl)).astype(np.float64)
    avgdl = dl.sum() / ndocs
    scores = np.zeros(ndocs)
    for t in query_tokens:
        tf = np.array([x.count(t) for x in toks], dtype=np.float64)
        df = int((tf > 0).sum())
        if df == 0:
            continue
        idf = math.log(1.0 + (ndocs - df + 0.5) / (df + 0.5))
        denom = K1 * (1.0 - B + B * dl_q / avgdl)
        m = tf > 0
        scores[m] += idf * (K1 + 1.0) * tf[m] / (tf[m] + denom[m])
    return scores


def test_field_layout_and_manifest(built):
    idx, m, t = built
    assert set(m["fields"]) == {"url", "lang"}
    # global per-field sum_dl matches a direct recount
    url_sum = sum(len(keywordish_analyze(u)) for u in t["url"].to_pylist())
    assert m["fields"]["url"]["sum_dl"] == url_sum
    assert m["fields"]["lang"]["sum_dl"] == len(t)  # keyword: 1 token/doc
    for sd in segment_dirs(idx, m):
        r = SegmentReader(sd)
        fr = r.field("url")
        assert fr is not None and fr.ndocs == r.ndocs
        assert r.field("lang").ndocs == r.ndocs
        assert r.field("nope") is None
        # per-field doc ordinals align with the primary field
        for d in range(r.ndocs):
            assert keywordish_analyze(r.url_of(d))[0] in set(
                str(fr.terms[i]) for i in range(fr.nterms)
            )


def test_term_on_indexed_field_uses_global_stats(built):
    idx, m, t = built
    s = LocalSearcher(idx)
    urls = t["url"].to_pylist()
    ndocs = m["doc_count"]
    oracle = _bm25_oracle(urls, keywordish_analyze, ["page"], ndocs)
    hits = s.search_query({"term": {"url": "page"}}, k=ndocs)
    got = {h["url"]: h["score"] for h in hits}
    # every doc matches 'page'; scores must equal the GLOBAL-stats oracle
    assert len(got) == ndocs
    by_url = dict(zip(urls, oracle))
    for u, sc in got.items():
        assert sc == pytest.approx(np.float32(by_url[u]), abs=0)


def test_multi_match_over_indexed_fields(built):
    idx, m, t = built
    s = LocalSearcher(idx)
    urls, texts = t["url"].to_pylist(), t["text"].to_pylist()
    ndocs = m["doc_count"]
    q = "alpha page"
    text_sc = _bm25_oracle(texts, standard_analyze, standard_analyze(q), ndocs)
    url_sc = _bm25_oracle(urls, keywordish_analyze, keywordish_analyze(q), ndocs)
    best = np.maximum(text_sc, url_sc)
    hits = s.search_query(
        {"multi_match": {"query": q, "fields": ["text", "url"]}}, k=ndocs
    )
    got = {h["url"]: h["score"] for h in hits}
    by_url = dict(zip(urls, best))
    assert len(got) == ndocs
    for u, sc in got.items():
        assert sc == pytest.approx(np.float32(by_url[u]), abs=0)


def test_match_on_keyword_field_and_counts(built):
    idx, m, t = built
    s = LocalSearcher(idx)
    langs = t["lang"].to_pylist()
    n_en = sum(1 for x in langs if x == "en")
    assert s.count({"term": {"lang": "en"}}) == n_en
    # keyword analyzer: the whole query string is ONE term
    assert s.count({"match": {"lang": "en"}}) == n_en
    assert s.count({"match": {"lang": "zz"}}) == 0
    # prefix expansion over the indexed field's term dict
    assert s.count({"prefix": {"url": "site"}}) == len(langs)


def test_indexed_matches_derived_membership(built, ray_session, tmp_path_factory):
    """The index-time url field must accept exactly the docs the derived
    (query-time) url field accepted — membership parity, better stats."""
    idx, m, t = built
    p = str(tmp_path_factory.mktemp("mf_pages2") / "pages.parquet")
    pq.write_table(t, p)
    idx2 = str(tmp_path_factory.mktemp("mf_idx2") / "index")
    build_index(p, idx2, num_partitions=3, analyzer="standard",
                source="text", max_docs_per_segment=10)
    s_idx, s_drv = LocalSearcher(idx), LocalSearcher(idx2)
    for q in (
        {"multi_match": {"query": "alpha page", "fields": ["text", "url"]}},
        {"combined_fields": {"query": "alpha page", "fields": ["text", "url"]}},
        {"term": {"url": "example"}},
    ):
        assert s_idx.count(q) == s_drv.count(q)


def test_ray_searcher_parity(built, ray_session):
    from raydex.search.scatter import RaySearcher

    idx, m, t = built
    rs = RaySearcher(idx, num_actors=2)
    try:
        q = {"multi_match": {"query": "alpha page", "fields": ["text", "url"]}}
        local = LocalSearcher(idx).search_query(q, k=15)
        dist = rs.search_query(q, k=15)
        assert [(h["url"], h["score"]) for h in local] == [
            (h["url"], h["score"]) for h in dist
        ]
    finally:
        rs.shutdown()


def test_resume_param_guard_includes_fields(built, tmp_path_factory):
    idx, m, t = built
    p = str(tmp_path_factory.mktemp("mf_pages3") / "pages.parquet")
    pq.write_table(t, p)
    with pytest.raises(ValueError, match="different build parameters"):
        build_index(p, idx, num_partitions=3, analyzer="standard",
                    source="text", max_docs_per_segment=10, resume=True)


def test_field_alias_and_copy_to(ray_session, tmp_path_factory):
    """FieldAliasMapper: queries on the alias are BITWISE-identical to
    the target (global stats included). copy_to-style list source:
    one field indexed from the concatenation of several columns."""
    t = _corpus()
    p = str(tmp_path_factory.mktemp("mf_alias") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("mf_alias_idx") / "index")
    fields = [
        FieldSpec("lang", source="lang", analyzer="keyword"),
        FieldSpec("language", source="lang", analyzer="alias"),
        FieldSpec("content", source="text", analyzer="alias"),
        FieldSpec("combined", source=["lang", "url"], analyzer="keywordish"),
    ]
    m = build_index(p, idx, num_partitions=3, analyzer="standard",
                    source="text", max_docs_per_segment=10, fields=fields)
    s = LocalSearcher(idx)
    # alias -> keyword target: identical hits + scores
    a = s.search_query({"term": {"language": "en"}}, k=100)
    b = s.search_query({"term": {"lang": "en"}}, k=100)
    assert [(h["url"], h["score"]) for h in a] == \
           [(h["url"], h["score"]) for h in b]
    assert len(a) == sum(1 for v in t["lang"].to_pylist() if v == "en")
    # alias -> the PRIMARY text field: match parity, bitwise
    a = s.search_query({"match": {"content": "alpha beta"}}, k=100)
    b = s.search_query({"match": {"text": "alpha beta"}}, k=100)
    assert [(h["url"], h["score"]) for h in a] == \
           [(h["url"], h["score"]) for h in b]
    # copy_to: terms from BOTH source columns hit the combined field
    n_en = s.count({"term": {"combined": "en"}})
    assert n_en == sum(1 for v in t["lang"].to_pylist() if v == "en")
    assert s.count({"term": {"combined": "example"}}) == len(t)
    # field caps report the alias kind
    from raydex.index.fieldcaps import field_caps_for_index

    caps = field_caps_for_index(idx)
    assert caps["language"]["types"] == ["alias"]
    # alias to an unknown field fails fast at build
    with pytest.raises(ValueError, match="unknown field"):
        build_index(p, str(tmp_path_factory.mktemp("x") / "i"),
                    num_partitions=2, analyzer="standard", source="text",
                    fields=[FieldSpec("bad", source="nope",
                                      analyzer="alias")])
    # alias of an alias (and self-alias) rejected at build — resolving
    # one at query time would recurse forever
    with pytest.raises(ValueError, match="another alias"):
        build_index(p, str(tmp_path_factory.mktemp("x2") / "i"),
                    num_partitions=2, analyzer="standard", source="text",
                    fields=[FieldSpec("lang", source="lang",
                                      analyzer="keyword"),
                            FieldSpec("a1", source="lang", analyzer="alias"),
                            FieldSpec("a2", source="a1", analyzer="alias")])
    with pytest.raises(ValueError, match="another alias"):
        build_index(p, str(tmp_path_factory.mktemp("x3") / "i"),
                    num_partitions=2, analyzer="standard", source="text",
                    fields=[FieldSpec("self", source="self",
                                      analyzer="alias")])


def test_numeric_docvalues_fields(ray_session, tmp_path_factory):
    """long/double/date field types (NumberFieldMapper/DateFieldMapper):
    stored doc-values columns with range queries, per-segment min/max in
    the manifest (range can-match), and field sort over the column."""
    import numpy as np

    rows = []
    for i in range(90):
        rows.append(
            {"url": f"s{i:03d}.example/p", "warc_ts": i,
             "text": f"doc number tok{i % 9}", "views": i * 10,
             "rating": i / 10.0}
        )
    t = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows]).cast(
                pa.timestamp("us")),
            "text": pa.array([r["text"] for r in rows], pa.large_string()),
            "views": pa.array([r["views"] for r in rows], pa.int32()),
            "rating": pa.array([r["rating"] for r in rows], pa.float64()),
        }
    )
    p = str(tmp_path_factory.mktemp("mf_num") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("mf_num_idx") / "index")
    m = build_index(
        p, idx, num_partitions=2, analyzer="standard", source="text",
        max_docs_per_segment=20,
        fields=[FieldSpec("views", source="views", analyzer="long"),
                FieldSpec("rating", source="rating", analyzer="double")],
    )
    s = LocalSearcher(idx)
    # range over the long column
    n = s.count({"range": {"views": {"gte": 500, "lt": 700}}})
    assert n == sum(1 for r in rows if 500 <= r["views"] < 700)
    # range over the double column
    n = s.count({"range": {"rating": {"gt": 7.95}}})
    assert n == sum(1 for r in rows if r["rating"] > 7.95)
    # manifests carry per-segment bounds; a narrow range can-match-skips
    for sd in segment_dirs(idx, m):
        r = SegmentReader(sd)
        vals = r.doc_values["views"]
        assert r.manifest["min_views"] == int(vals.min())
        assert r.manifest["max_views"] == int(vals.max())
    g = s.group
    g.query_count({"range": {"views": {"gte": 890}}}, s.ndocs, s.sum_dl,
                  {}, "standard")
    assert g.can_match_skipped() > 0
    # field sort over the numeric column (desc, top 5)
    hits = s.search_sorted({"match_all": {}}, sort_field="views",
                           order="desc", k=5)
    assert [h["sort_value"] for h in hits] == [890, 880, 870, 860, 850]
    # merge keeps columns, bounds, and answers
    import shutil

    from raydex.index.merge_rewrite import merge_segments_rewrite

    idx2 = str(tmp_path_factory.mktemp("mf_num_m") / "merged")
    shutil.copytree(idx, idx2)
    import json as _json

    man = _json.load(open(os.path.join(idx2, "index_manifest.json")))
    parts = sorted({r["part"] for r in man["segments"]})
    new_rows = []
    for pnum in parts:
        pdir = os.path.join(idx2, f"part={pnum:05d}")
        sids = [r["seg_id"] for r in man["segments"] if r["part"] == pnum]
        if len(sids) == 1:
            new_rows += [r for r in man["segments"] if r["part"] == pnum]
            continue
        mm = merge_segments_rewrite(pdir, sids, f"seg-{pnum:05d}-m")
        assert "min_views" in mm and "max_views" in mm
        for sid in sids:
            shutil.rmtree(os.path.join(pdir, sid))
        row = dict(next(r for r in man["segments"] if r["part"] == pnum))
        row.update(seg_id=f"seg-{pnum:05d}-m", doc_count=mm["doc_count"],
                   sum_dl=mm["sum_dl"], term_count=mm["term_count"],
                   max_df=mm["max_df"], content_hash=mm["content_hash"])
        new_rows.append(row)
    man["segments"] = new_rows
    with open(os.path.join(idx2, "index_manifest.json"), "w") as f:
        _json.dump(man, f)
    s2 = LocalSearcher(idx2)
    assert s2.count({"range": {"views": {"gte": 500, "lt": 700}}}) == \
        s.count({"range": {"views": {"gte": 500, "lt": 700}}})


def test_scaled_float_and_token_count(ray_session, tmp_path_factory):
    """mapper-extras ScaledFloatFieldMapper (round(v*factor) int64
    storage, range on unscaled doubles) and TokenCountFieldMapper
    (analyzed token count as a long doc-values field)."""
    rows = [(f"u{i:02d}", i, "tok " * (i % 7 + 1), i * 0.125)
            for i in range(40)]
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows]).cast(pa.timestamp("us")),
            "text": pa.array([r[2].strip() for r in rows], pa.large_string()),
            "price": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    p = str(tmp_path_factory.mktemp("mf_sf") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("mf_sf_idx") / "index")
    build_index(
        p, idx, num_partitions=2, analyzer="standard", source="text",
        fields=[FieldSpec("price", source="price", analyzer="scaled_float",
                          scaling_factor=100.0),
                FieldSpec("ntok", source="text", analyzer="token_count")],
    )
    s = LocalSearcher(idx)
    # 0.125 scales to round(12.5)=12 -> stored 0.12 etc.; range on the
    # decoded doubles matches a python mirror of the lossy encoding
    want = sum(1 for r in rows if round(r[3] * 100) / 100 >= 2.0)
    assert s.count({"range": {"price": {"gte": 2.0}}}) == want
    # upper-bounded range with can-match ON: manifest bounds are in
    # DECODED units, so segments must NOT be wrongly skipped
    want_lte = sum(1 for r in rows if round(r[3] * 100) / 100 <= 1.0)
    assert s.count({"range": {"price": {"lte": 1.0}}}) == want_lte
    # sort over the scaled column reports DECODED values
    top = s.search_sorted({"match_all": {}}, sort_field="price",
                          order="desc", k=2)
    assert [h["sort_value"] for h in top] == [
        round(39 * 0.125 * 100) / 100, round(38 * 0.125 * 100) / 100]
    # token_count == the analyzed length of each doc's text
    want = sum(1 for r in rows if len(r[2].split()) >= 5)
    assert s.count({"range": {"ntok": {"gte": 5}}}) == want
    hits = s.search_sorted({"match_all": {}}, sort_field="ntok",
                           order="desc", k=3)
    assert all(h["sort_value"] == 7 for h in hits)


def test_match_only_text(ray_session, tmp_path_factory):
    """MatchOnlyTextFieldMapper: same matching as a text field, but
    scoring treats freq as 1 with norms off — per-term idf, identical
    for a doc with one occurrence and a doc with many."""
    import math

    rows = [
        ("u0", "apple apple apple apple"),
        ("u1", "apple"),
        ("u2", "pear plum cherry apple grape lemon melon fig date kiwi"),
        ("u3", "pear plum"),
    ]
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array(range(len(rows))).cast(pa.timestamp("us")),
            "text": pa.array([r[1] for r in rows], pa.large_string()),
            "body": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    p = str(tmp_path_factory.mktemp("mf_mot") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("mf_mot_idx") / "index")
    build_index(
        p, idx, num_partitions=1, analyzer="standard", source="text",
        fields=[FieldSpec("body", source="body", analyzer="match_only_text")],
    )
    s = LocalSearcher(idx)
    hits = s.search_query({"match": {"body": "apple"}}, k=10)
    assert sorted(h["url"] for h in hits) == ["u0", "u1", "u2"]
    # freq- and length-insensitive: all three score EXACTLY idf
    idf = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
    for h in hits:
        assert h["score"] == pytest.approx(float(np.float32(idf)), rel=1e-6)
    assert len({h["score"] for h in hits}) == 1
    # membership parity with the primary text field
    for q in ("apple", "pear plum", "melon"):
        assert s.count({"match": {"body": q}}) == s.count({"match": {"text": q}})


def test_annotated_text_field(ray_session, tmp_path_factory):
    """mapper-annotated-text: [text](value) injects annotation values at
    the SAME position as the span's first token (index-time synonym);
    plain tokens keep their ordinal positions."""
    from raydex.analysis.annotated import annotated_analyze_with_positions

    toks, pos = annotated_analyze_with_positions(
        "[Paris](Q90) is the capital of [France](Q142&Country)"
    )
    assert list(zip(toks, pos)) == [
        ("paris", 0), ("Q90", 0), ("is", 1), ("the", 2), ("capital", 3),
        ("of", 4), ("france", 5), ("Q142", 5), ("Country", 5),
    ]
    # empty / punctuation-only spans still index their annotations
    toks, pos = annotated_analyze_with_positions("[,](Q7) next")
    assert list(zip(toks, pos)) == [("Q7", 0), ("next", 1)]

    rows = [
        ("u0", "[Paris](Q90) is the capital of [France](Q142)"),
        ("u1", "[Berlin](Q64) is the capital of [Germany](Q183)"),
        ("u2", "plain text about a capital"),
    ]
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array(range(len(rows))).cast(pa.timestamp("us")),
            "text": pa.array(["capital city page"] * 3, pa.large_string()),
            "body": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    p = str(tmp_path_factory.mktemp("mf_ann") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("mf_ann_idx") / "index")
    m = build_index(
        p, idx, num_partitions=1, analyzer="standard", source="text",
        fields=[FieldSpec("body", source="body", analyzer="annotated_text",
                          store_positions=True)],
    )
    s = LocalSearcher(idx)
    # annotation-value search
    hits = s.search_query({"term": {"body": "Q90"}}, k=10)
    assert [h["url"] for h in hits] == ["u0"]
    # plain-token search across markup
    assert s.count({"match": {"body": "capital"}}) == 3
    assert s.count({"match": {"body": "paris"}}) == 1
    # index-side positions: the annotation shares the span's position
    sd = segment_dirs(idx, m)[0]
    fr = SegmentReader(sd).field("body")
    def pos_of(term, url):
        ti = fr.lookup(term)
        ids, _, flat, offs = fr.postings_with_positions(ti)
        d = [i for i, doc in enumerate(ids) if fr.url_of(doc) == url][0]
        return list(flat[offs[d]:offs[d + 1]])
    assert pos_of("Q90", "u0") == pos_of("paris", "u0")


def test_murmur3_and_size_fields(ray_session, tmp_path_factory):
    """mapper-murmur3 (value hash as long doc-values) and mapper-size
    (_size = source byte length) plugin analogues."""
    from raydex.partition import murmur3_hash_str

    rows = [("u0", "héllo wörld"), ("u1", "plain"), ("u2", "plain")]
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array(range(3)).cast(pa.timestamp("us")),
            "text": pa.array([r[1] for r in rows], pa.large_string()),
            "body": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    p = str(tmp_path_factory.mktemp("mf_m3") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("mf_m3_idx") / "index")
    m = build_index(
        p, idx, num_partitions=1, analyzer="standard", source="text",
        fields=[FieldSpec("bhash", source="body", analyzer="murmur3"),
                FieldSpec("bsize", source="body", analyzer="size")],
    )
    r = SegmentReader(segment_dirs(idx, m)[0])
    by_url = {r.url_of(d): d for d in range(r.ndocs)}
    assert r.doc_values["bhash"][by_url["u1"]] == murmur3_hash_str("plain")
    assert r.doc_values["bhash"][by_url["u1"]] == \
        r.doc_values["bhash"][by_url["u2"]]
    assert r.doc_values["bsize"][by_url["u0"]] == \
        len("héllo wörld".encode("utf-8"))
    s = LocalSearcher(idx)
    assert s.count({"range": {"bsize": {"gte": 6}}}) == 1


def test_docvalue_fields_in_hits(ray_session, tmp_path_factory):
    """docvalue_fields fetch sub-phase: hits carry stored doc-values
    columns (scaled_float decoded), local + scatter parity."""
    rows = [(f"u{i:02d}", i, "tok " * (i % 4 + 1), i * 0.5) for i in range(30)]
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows]).cast(pa.timestamp("us")),
            "text": pa.array([r[2].strip() for r in rows], pa.large_string()),
            "price": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    p = str(tmp_path_factory.mktemp("mf_dvf") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("mf_dvf_idx") / "index")
    build_index(
        p, idx, num_partitions=2, analyzer="standard", source="text",
        fields=[FieldSpec("price", source="price", analyzer="scaled_float",
                          scaling_factor=100.0)],
    )
    s = LocalSearcher(idx)
    hits = s.search_query({"match_all": {}}, k=5,
                          docvalue_fields=["price", "dl"])
    assert hits
    for h in hits:
        i = int(h["url"][1:])
        assert h["fields"]["price"] == pytest.approx(i * 0.5)
        assert h["fields"]["dl"] == i % 4 + 1
    from raydex.search.scatter import RaySearcher

    rs = RaySearcher(idx, num_actors=2)
    try:
        rh = rs.search_query({"match_all": {}}, k=5,
                             docvalue_fields=["price", "dl"])
        assert [(h["url"], h["fields"]) for h in rh] == \
               [(h["url"], h["fields"]) for h in hits]
    finally:
        rs.shutdown()
