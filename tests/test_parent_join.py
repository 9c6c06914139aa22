"""Parent/child `join` field: routing, structures, and the three join
queries (has_child / has_parent / parent_id), local + distributed.

Reference semantics: ``modules/parent-join/src/main/java/org/
elasticsearch/join/mapper/ParentJoinFieldMapper.java`` (relation
doc-values + per-relation parent-id field; children routed by parent),
``query/HasChildQueryBuilder.java`` (score modes, min/max children),
``query/HasParentQueryBuilder.java`` (score flag),
``query/ParentIdQueryBuilder.java``.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index, segment_dirs
from raydex.index.joinfield import join_routing_keys, parse_join_column
from raydex.index.segment import FieldSpec, SegmentReader
from raydex.partition import route_partitions
from raydex.search.scatter import LocalSearcher

N_Q = 30


def _rows():
    """30 questions; question i has i % 4 answers. Answer j of question
    i carries 'good' when (i + j) % 3 == 0, else 'bad'."""
    rows = []
    for i in range(N_Q):
        rows.append(
            (f"q{i}", f"question topic{i % 5}",
             json.dumps({"name": "question"}))
        )
        for j in range(i % 4):
            quality = "good" if (i + j) % 3 == 0 else "bad"
            rows.append(
                (f"a{i}-{j}", f"answer {quality} detail{j}",
                 json.dumps({"name": "answer", "parent": f"q{i}"}))
            )
    return rows


def _corpus():
    rows = _rows()
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array(list(range(len(rows)))).cast(pa.timestamp("us")),
            "text": pa.array([r[1] for r in rows], pa.large_string()),
            "join_field": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def _children():
    """{question_url: [(answer_url, quality)]}"""
    out = {f"q{i}": [] for i in range(N_Q)}
    for i in range(N_Q):
        for j in range(i % 4):
            out[f"q{i}"].append(
                (f"a{i}-{j}", "good" if (i + j) % 3 == 0 else "bad")
            )
    return out


JOIN = FieldSpec(
    "join_field", source="join_field", analyzer="join",
    relations={"question": ["answer"]},
)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    t = _corpus()
    p = str(tmp_path_factory.mktemp("pj_pages") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("pj_idx") / "index")
    m = build_index(
        p, idx, num_partitions=3, analyzer="standard", source="text",
        max_docs_per_segment=7, fields=[JOIN],
    )
    return idx, m


def test_parse_join_column_shapes():
    arr = pa.array(
        [json.dumps({"name": "question"}),
         json.dumps({"name": "answer", "parent": "q1"}),
         "question", None],
        pa.string(),
    )
    names, parents = parse_join_column(arr)
    assert names == ["question", "answer", "question", None]
    assert parents == [None, "q1", None, None]
    keys = join_routing_keys(arr, ["q0", "a1-0", "q2", "x"])
    assert keys == ["q0", "q1", "q2", "x"]


def test_children_colocated_with_parent(built):
    idx, m = built
    # every child doc lives in the partition its PARENT routes to
    want_part = {u: p for u, p in zip(
        [f"q{i}" for i in range(N_Q)],
        route_partitions([f"q{i}" for i in range(N_Q)], 3),
    )}
    seen_children = 0
    for sd in segment_dirs(idx, m):
        part = int(sd.split("part=")[1].split(os.sep)[0])
        r = SegmentReader(sd)
        names, pids, relations = r.join_field_data()
        assert relations == {"question": ["answer"]}
        for d in range(r.ndocs):
            if names[d] == "answer":
                assert part == want_part[pids[d]]
                seen_children += 1
            else:
                assert pids[d] == r.url_of(d)  # parents carry their own id
    assert seen_children == sum(i % 4 for i in range(N_Q))


def test_parent_id_query(built):
    idx, _ = built
    s = LocalSearcher(idx)
    kids = _children()["q13"]
    assert len(kids) == 13 % 4
    assert s.count({"parent_id": {"type": "answer", "id": "q13"}}) == len(kids)
    hits = s.search_query({"parent_id": {"type": "answer", "id": "q13"}}, k=10)
    assert sorted(h["url"] for h in hits) == sorted(u for u, _ in kids)
    assert all(h["score"] == 1.0 for h in hits)


def test_has_child_counts_and_min_children(built):
    idx, _ = built
    s = LocalSearcher(idx)
    ch = _children()
    good = {q: sum(1 for _, qual in kids if qual == "good")
            for q, kids in ch.items()}
    q1 = {"has_child": {"type": "answer",
                        "query": {"term": {"text": "good"}}}}
    assert s.count(q1) == sum(1 for v in good.values() if v >= 1)
    q2 = {"has_child": {"type": "answer", "min_children": 2,
                        "query": {"term": {"text": "good"}}}}
    assert s.count(q2) == sum(1 for v in good.values() if v >= 2)
    q3 = {"has_child": {"type": "answer", "max_children": 1,
                        "query": {"term": {"text": "good"}}}}
    assert s.count(q3) == sum(1 for v in good.values() if v == 1)


def test_has_child_score_modes(built):
    idx, _ = built
    s = LocalSearcher(idx)
    ch = _children()
    good = {q: sum(1 for _, qual in kids if qual == "good")
            for q, kids in ch.items()}
    # constant-score children make score_mode exact: sum == child count
    inner = {"constant_score": {"filter": {"term": {"text": "good"}}}}
    hits = s.search_query(
        {"has_child": {"type": "answer", "score_mode": "sum",
                       "query": inner}}, k=50)
    got = {h["url"]: h["score"] for h in hits}
    want = {q: float(v) for q, v in good.items() if v >= 1}
    assert got == want
    # none -> constant 1.0
    hits = s.search_query(
        {"has_child": {"type": "answer", "query": inner}}, k=50)
    assert {h["score"] for h in hits} == {1.0}
    # avg of constant scores == 1.0; max/min likewise
    for mode in ("avg", "max", "min"):
        hits = s.search_query(
            {"has_child": {"type": "answer", "score_mode": mode,
                           "query": inner}}, k=50)
        assert {h["score"] for h in hits} == {1.0}


def test_has_parent_query(built):
    idx, _ = built
    s = LocalSearcher(idx)
    ch = _children()
    topic2 = {f"q{i}" for i in range(N_Q) if i % 5 == 2}
    want_children = sorted(
        u for q in topic2 for u, _ in ch[q]
    )
    q = {"has_parent": {"parent_type": "question",
                        "query": {"term": {"text": "topic2"}}}}
    assert s.count(q) == len(want_children)
    hits = s.search_query(q, k=100)
    assert sorted(h["url"] for h in hits) == want_children
    assert all(h["score"] == 1.0 for h in hits)
    # score=True propagates the parent score (constant 3.0 here)
    q = {"has_parent": {"parent_type": "question", "score": True,
                        "query": {"constant_score": {
                            "filter": {"term": {"text": "topic2"}},
                            "boost": 3.0}}}}
    hits = s.search_query(q, k=100)
    assert sorted(h["url"] for h in hits) == want_children
    assert all(h["score"] == 3.0 for h in hits)


def test_inner_hits(built):
    idx, _ = built
    s = LocalSearcher(idx)
    ch = _children()
    # has_child inner_hits: each parent hit carries its top matching
    # children (constant-score inner -> (score desc, url) order == url)
    q = {"has_child": {"type": "answer", "score_mode": "sum",
                       "inner_hits": {"size": 2, "name": "answers"},
                       "query": {"constant_score": {
                           "filter": {"term": {"text": "good"}}}}}}
    hits = s.search_query(q, k=50)
    assert hits
    for h in hits:
        want = sorted(u for u, qual in ch[h["url"]] if qual == "good")[:2]
        got = [x["url"] for x in h["inner_hits"]["answers"]]
        assert got == want
        assert all(x["score"] == 1.0 for x in h["inner_hits"]["answers"])
    # has_parent inner_hits: each child hit carries its parent (with the
    # parent's inner-query score)
    q = {"has_parent": {"parent_type": "question",
                        "inner_hits": {},
                        "query": {"constant_score": {
                            "filter": {"term": {"text": "topic2"}},
                            "boost": 2.5}}}}
    hits = s.search_query(q, k=100)
    assert hits
    for h in hits:
        parent = h["url"].split("-")[0].replace("a", "q")
        ihs = h["inner_hits"]["question"]
        assert ihs == [{"url": parent, "score": 2.5}]


def test_inner_hits_distributed_parity(built):
    idx, _ = built
    from raydex.search.scatter import RaySearcher

    s = LocalSearcher(idx)
    rs = RaySearcher(idx, num_actors=4)
    try:
        q = {"has_child": {"type": "answer", "score_mode": "sum",
                           "inner_hits": {"size": 3},
                           "query": {"term": {"text": "good"}}}}
        lh = s.search_query(q, k=50)
        rh = rs.search_query(q, k=50)
        assert [(h["url"], h.get("inner_hits")) for h in lh] == \
               [(h["url"], h.get("inner_hits")) for h in rh]
        q = {"has_parent": {"parent_type": "question", "inner_hits": {},
                            "query": {"term": {"text": "topic2"}}}}
        lh = s.search_query(q, k=100)
        rh = rs.search_query(q, k=100)
        assert [(h["url"], h.get("inner_hits")) for h in lh] == \
               [(h["url"], h.get("inner_hits")) for h in rh]
    finally:
        rs.shutdown()


def test_join_composes_in_bool(built):
    idx, _ = built
    s = LocalSearcher(idx)
    ch = _children()
    good_ge1 = {q for q, kids in ch.items()
                if any(qual == "good" for _, qual in kids)}
    topic0 = {f"q{i}" for i in range(N_Q) if i % 5 == 0}
    q = {"bool": {
        "must": [{"has_child": {"type": "answer",
                                "query": {"term": {"text": "good"}}}}],
        "filter": [{"term": {"text": "topic0"}}],
    }}
    assert s.count(q) == len(good_ge1 & topic0)


def test_distributed_parity(built):
    idx, _ = built
    from raydex.search.scatter import RaySearcher

    s = LocalSearcher(idx)
    rs = RaySearcher(idx, num_actors=4)
    try:
        queries = [
            {"has_child": {"type": "answer", "score_mode": "sum",
                           "query": {"constant_score": {
                               "filter": {"term": {"text": "good"}}}}}},
            {"has_parent": {"parent_type": "question",
                            "query": {"term": {"text": "topic2"}}}},
            {"parent_id": {"type": "answer", "id": "q13"}},
        ]
        for q in queries:
            lh = s.search_query(q, k=100)
            rh = rs.search_query(q, k=100)
            assert [(h["url"], h["score"]) for h in lh] == \
                   [(h["url"], h["score"]) for h in rh]
            assert s.count(q) == rs.count(q)
    finally:
        rs.shutdown()


def test_join_survives_merge(built, tmp_path):
    idx, m = built
    import shutil

    from raydex.index.merge_rewrite import merge_segments_rewrite

    idx2 = str(tmp_path / "merged")
    shutil.copytree(idx, idx2)
    # merge each partition's segments into one, rewrite the manifest
    man = json.load(open(os.path.join(idx2, "index_manifest.json")))
    parts = sorted({r["part"] for r in man["segments"]})
    new_rows = []
    for p in parts:
        pdir = os.path.join(idx2, f"part={p:05d}")
        sids = [r["seg_id"] for r in man["segments"] if r["part"] == p]
        if len(sids) == 1:
            new_rows += [r for r in man["segments"] if r["part"] == p]
            continue
        mm = merge_segments_rewrite(pdir, sids, f"seg-{p:05d}-m")
        for sid in sids:
            shutil.rmtree(os.path.join(pdir, sid))
        row = dict(next(r for r in man["segments"] if r["part"] == p))
        row.update(seg_id=f"seg-{p:05d}-m", doc_count=mm["doc_count"],
                   sum_dl=mm["sum_dl"], term_count=mm["term_count"],
                   max_df=mm["max_df"], content_hash=mm["content_hash"])
        new_rows.append(row)
    man["segments"] = new_rows
    with open(os.path.join(idx2, "index_manifest.json"), "w") as f:
        json.dump(man, f)

    s1, s2 = LocalSearcher(idx), LocalSearcher(idx2)
    for q in (
        {"has_child": {"type": "answer", "score_mode": "sum",
                       "query": {"constant_score": {
                           "filter": {"term": {"text": "good"}}}}}},
        {"has_parent": {"parent_type": "question",
                        "query": {"term": {"text": "topic2"}}}},
        {"parent_id": {"type": "answer", "id": "q13"}},
    ):
        h1 = sorted((h["url"], h["score"]) for h in s1.search_query(q, k=100))
        h2 = sorted((h["url"], h["score"]) for h in s2.search_query(q, k=100))
        assert h1 == h2


def test_relation_term_and_join_aggs(built):
    """term on the join FIELD matches relation names; children/parent
    single-bucket aggs (ChildrenAggregationBuilder /
    ParentAggregationBuilder) count context switches exactly."""
    idx, _ = built
    s = LocalSearcher(idx)
    ch = _children()
    n_answers = sum(len(k) for k in ch.values())
    assert s.count({"term": {"join_field": "question"}}) == N_Q
    assert s.count({"term": {"join_field": "answer"}}) == n_answers
    # children agg: answers whose parent question mentions topic2
    topic2 = {q for i, q in enumerate(ch) if i % 5 == 2}
    want = sum(len(ch[q]) for q in ch if q in {f"q{i}" for i in range(N_Q) if i % 5 == 2})
    got = s.children_agg({"term": {"text": "topic2"}}, "answer")
    assert got == {"doc_count": want}
    # parent agg: distinct questions with >= 1 'good' answer
    good_parents = sum(
        1 for kids in ch.values() if any(q == "good" for _, q in kids)
    )
    got = s.parent_agg({"term": {"text": "good"}}, "answer")
    assert got == {"doc_count": good_parents}
    # distributed parity
    from raydex.search.scatter import RaySearcher

    rs = RaySearcher(idx, num_actors=3)
    try:
        assert rs.children_agg({"term": {"text": "topic2"}}, "answer") == \
            {"doc_count": want}
        assert rs.parent_agg({"term": {"text": "good"}}, "answer") == \
            {"doc_count": good_parents}
    finally:
        rs.shutdown()


def test_join_survives_split_and_shrink(built, tmp_path):
    """_split re-routes by the STORED parent key (ShardSplittingQuery
    honoring the routing value): children land in the same child
    partition as their parent, so join queries stay exact; _shrink
    groups whole partitions, trivially preserving co-location."""
    from raydex.index.reshape import shrink_index, split_index
    from raydex.partition import route_partitions

    idx, _ = built
    queries = [
        {"has_child": {"type": "answer", "score_mode": "sum",
                       "query": {"constant_score": {
                           "filter": {"term": {"text": "good"}}}}}},
        {"has_parent": {"parent_type": "question",
                        "query": {"term": {"text": "topic2"}}}},
        {"parent_id": {"type": "answer", "id": "q13"}},
    ]
    s0 = LocalSearcher(idx)
    want = [sorted((h["url"], h["score"]) for h in s0.search_query(q, k=200))
            for q in queries]

    dst = str(tmp_path / "split6")
    split_index(idx, dst, 6)
    s6 = LocalSearcher(dst)
    for q, w in zip(queries, want):
        got = sorted((h["url"], h["score"]) for h in s6.search_query(q, k=200))
        assert got == w
    # co-location invariant in every live child partition
    m = json.load(open(os.path.join(dst, "index_manifest.json")))
    import numpy as np

    for r in m["segments"]:
        sd = os.path.join(dst, f"part={r['part']:05d}", r["seg_id"])
        sr = SegmentReader(sd)
        live = sr.live if sr.live is not None else np.ones(sr.ndocs, bool)
        names, pids, _ = sr.join_field_data()
        for d in range(sr.ndocs):
            if live[d]:
                assert route_partitions([pids[d]], 6)[0] == r["part"]

    dst2 = str(tmp_path / "shrink1")
    shrink_index(idx, dst2, 1)
    s1 = LocalSearcher(dst2)
    for q, w in zip(queries, want):
        got = sorted((h["url"], h["score"]) for h in s1.search_query(q, k=200))
        assert got == w


def test_nested_join_rejected():
    from raydex.search.query import collect_join_nodes, parse_query

    q = parse_query({"has_child": {"type": "answer", "query": {
        "has_parent": {"parent_type": "question",
                       "query": {"match_all": {}}}}}})
    with pytest.raises(ValueError, match="nested"):
        collect_join_nodes(q)


def test_multilevel_relations_rejected():
    from raydex.index.joinfield import validate_relations

    with pytest.raises(ValueError, match="multi-level"):
        validate_relations({"a": ["b"], "b": ["c"]})
    with pytest.raises(ValueError, match="own parent"):
        validate_relations({"a": ["a"]})


def test_two_join_fields_rejected(tmp_path, ray_session):
    t = _corpus()
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    with pytest.raises(ValueError, match="one join field"):
        build_index(
            p, str(tmp_path / "idx"), num_partitions=2,
            analyzer="standard", source="text",
            fields=[JOIN, FieldSpec("j2", source="join_field",
                                    analyzer="join",
                                    relations={"a": ["b"]})],
        )


def test_join_on_sorted_path(built):
    """Field-sorted search with a join query: parents with >=1 good
    answer, sorted by url — local and scatter agree."""
    idx, _ = built
    s = LocalSearcher(idx)
    ch = _children()
    good = sorted(q for q, kids in ch.items()
                  if any(x == "good" for _, x in kids))
    q = {"has_child": {"type": "answer",
                       "query": {"term": {"text": "good"}}}}
    hits = s.search_sorted(q, sort_field="url", order="asc", k=5)
    assert [h["url"] for h in hits] == good[:5]
    from raydex.search.scatter import RaySearcher

    rs = RaySearcher(idx, num_actors=3)
    try:
        rh = rs.search_sorted(q, sort_field="url", order="asc", k=5)
        assert [h["url"] for h in rh] == good[:5]
    finally:
        rs.shutdown()


def test_join_respects_deletes(built, tmp_path):
    """Soft-deleting a child removes it from phase-1 (has_child counts
    drop; inner_hits shrink); deleting a parent removes it from phase-2
    (its children stop matching has_parent); expunge-deletes preserves
    the post-delete answers."""
    import shutil

    from raydex.index.compact import expunge_deletes
    from raydex.index.deletes import delete_by_query

    idx0, _ = built
    idx = str(tmp_path / "jd")
    shutil.copytree(idx0, idx)
    ch = _children()

    # q14 has 2 answers (a14-0 bad, a14-1 good). Delete its good answer.
    assert ("a14-1", "good") in ch["q14"]
    delete_by_query(idx, {"ids": {"values": ["a14-1"]}})
    s = LocalSearcher(idx)
    good_parents = {q for q, kids in ch.items()
                    if any(x == "good" for u, x in kids if u != "a14-1")}
    q = {"has_child": {"type": "answer", "query": {"term": {"text": "good"}}}}
    assert s.count(q) == len(good_parents)
    assert "q14" not in {h["url"] for h in s.search_query(q, k=100)}
    # parent_id still matches the surviving sibling only
    hits = s.search_query({"parent_id": {"type": "answer", "id": "q14"}}, k=10)
    assert sorted(h["url"] for h in hits) == ["a14-0"]

    # delete a parent: its children stop matching has_parent
    topic2 = sorted(f"q{i}" for i in range(N_Q) if i % 5 == 2)
    victim = next(q for q in topic2 if ch[q])
    delete_by_query(idx, {"ids": {"values": [victim]}})
    s = LocalSearcher(idx)
    qp = {"has_parent": {"parent_type": "question",
                         "query": {"term": {"text": "topic2"}}}}
    want = sorted(u for q2 in topic2 if q2 != victim for u, _ in ch[q2])
    assert sorted(h["url"] for h in s.search_query(qp, k=200)) == want

    # expunge rewrites segments without the deleted docs: same answers
    expunge_deletes(idx)
    s = LocalSearcher(idx)
    assert s.count(q) == len(good_parents)
    assert sorted(h["url"] for h in s.search_query(qp, k=200)) == want


def test_named_query_on_join_clause_is_skipped(built):
    """`_name` on (or inside) a has_child clause must not break the
    search and must not be re-evaluated as a standalone mask (join
    matches depend on the phase-1 parent maps): the name is skipped
    and the hits are identical to the un-named query."""
    idx, _ = built
    s = LocalSearcher(idx)
    plain = {"has_child": {"type": "answer",
                           "query": {"term": {"text": "good"}}}}
    named = {"has_child": {"type": "answer",
                           "query": {"term": {"text": "good"}},
                           "_name": "hc"}}
    inner_named = {"has_child": {
        "type": "answer",
        "query": {"term": {"text": {"value": "good", "_name": "t"}}},
    }}
    base = [(h["url"], h["score"]) for h in s.search_query(plain, k=50)]
    assert base
    for q in (named, inner_named):
        hits = s.search_query(q, k=50)
        assert [(h["url"], h["score"]) for h in hits] == base
        for h in hits:
            assert "hc" not in h.get("matched_queries", [])
            assert "t" not in h.get("matched_queries", [])
