"""`flattened` field type (x-pack mapper-flattened,
FlattenedFieldMapper.java): a single field indexing an arbitrary JSON
object's leaves as keywords — root queries match any leaf value, dotted
key paths address one leaf, terms aggs group by a key's values."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.analysis.tokenizer import flattened_leaves_analyze
from raydex.index.build import build_index
from raydex.index.segment import FieldSpec
from raydex.search.scatter import LocalSearcher

DOCS = [
    ("d/0", "zero alpha", {"status": "ok", "labels": {"env": "prod",
                                                      "team": "core"},
                           "ports": [80, 443]}),
    ("d/1", "one beta", {"status": "error", "labels": {"env": "prod"},
                         "retries": 3}),
    ("d/2", "two gamma", {"status": "ok", "labels": {"env": "dev",
                                                     "team": "infra"}}),
    ("d/3", "three delta", {"status": "ok"}),
    ("d/4", "four epsilon", None),
]


def test_leaf_extraction():
    toks = flattened_leaves_analyze(json.dumps(DOCS[0][2]))
    assert "ok" in toks and "status\x1fok" in toks
    assert "labels.env\x1fprod" in toks and "labels.team\x1fcore" in toks
    assert "80" in toks and "ports\x1f80" in toks  # list leaves share the path
    # bools keep keyword JSON form; depth limit enforced
    assert flattened_leaves_analyze('{"a": true}') == ["true", "a\x1ftrue"]
    deep = {"k": "v"}
    for _ in range(25):
        deep = {"n": deep}
    with pytest.raises(ValueError, match="depth_limit"):
        flattened_leaves_analyze(json.dumps(deep))


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    t = pa.table({
        "url": pa.array([d[0] for d in DOCS]),
        "warc_ts": pa.array(list(range(len(DOCS)))).cast(pa.timestamp("us")),
        "text": pa.array([d[1] for d in DOCS], pa.large_string()),
        "meta": pa.array([json.dumps(d[2]) if d[2] is not None else None
                          for d in DOCS]),
    })
    p = str(tmp_path_factory.mktemp("fl") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("fl_idx") / "index")
    build_index(p, idx, num_partitions=2, analyzer="standard",
                fields=[FieldSpec("meta", source="meta",
                                  analyzer="flattened")])
    return idx


def test_keyed_term_query(built):
    s = LocalSearcher(built)
    assert s.count({"term": {"meta.status": "ok"}}) == 3
    assert s.count({"term": {"meta.status": "error"}}) == 1
    assert s.count({"term": {"meta.labels.env": "prod"}}) == 2
    assert s.count({"term": {"meta.labels.team": "infra"}}) == 1
    assert s.count({"term": {"meta.ports": "443"}}) == 1
    assert s.count({"term": {"meta.status": "absent"}}) == 0


def test_root_term_matches_any_leaf(built):
    s = LocalSearcher(built)
    # root query: value anywhere in the object
    assert s.count({"term": {"meta": "prod"}}) == 2
    assert s.count({"term": {"meta": "ok"}}) == 3
    assert s.count({"term": {"meta": "core"}}) == 1


def test_terms_prefix_exists(built):
    s = LocalSearcher(built)
    assert s.count({"terms": {"meta.labels.env": ["prod", "dev"]}}) == 3
    assert s.count({"prefix": {"meta.labels.env": "pr"}}) == 2
    assert s.count({"exists": {"field": "meta.labels.team"}}) == 2
    assert s.count({"exists": {"field": "meta.retries"}}) == 1
    # root exists: any leaf at all (d/4 has none)
    assert s.count({"exists": {"field": "meta"}}) == 4


def test_bool_compose_and_match(built):
    s = LocalSearcher(built)
    assert s.count({"bool": {
        "filter": [{"term": {"meta.status": "ok"}},
                   {"term": {"meta.labels.env": "prod"}}]}}) == 1
    # match on a flattened key = keyword term semantics
    assert s.count({"match": {"meta.labels.env": "prod"}}) == 2


def test_terms_agg_on_dotted_key(built):
    s = LocalSearcher(built)
    aggs = s.search_aggs(
        {"match_all": {}},
        {"envs": {"terms": {"field": "meta.labels.env"}},
         "st": {"terms": {"field": "meta.status"}}})["aggregations"]
    env_buckets = {b["key"]: b["doc_count"]
                   for b in aggs["envs"]["buckets"]}
    assert env_buckets == {"prod": 2, "dev": 1}
    st_buckets = {b["key"]: b["doc_count"] for b in aggs["st"]["buckets"]}
    assert st_buckets == {"ok": 3, "error": 1}


def test_flattened_survives_merge(ray_session, tmp_path):
    """The flattened sub-index rides the generic field-merge path:
    after a full per-partition merge, keyed/root term counts and the
    dotted-key terms agg are unchanged."""
    from raydex.index.build import load_index_manifest
    from raydex.index.merge import merge_partition_segments

    rows = [(f"d/{i}", f"doc number {i}",
             json.dumps({"env": "prod" if i % 2 else "dev",
                         "tier": f"t{i % 3}"})) for i in range(60)]
    t = pa.table({
        "url": pa.array([r[0] for r in rows]),
        "warc_ts": pa.array(list(range(60)), pa.int64()).cast(
            pa.timestamp("us")),
        "text": pa.array([r[1] for r in rows], pa.large_string()),
        "meta": pa.array([r[2] for r in rows]),
    })
    p = str(tmp_path / "p.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, analyzer="standard",
                max_docs_per_segment=10,
                fields=[FieldSpec("meta", source="meta",
                                  analyzer="flattened")])
    s = LocalSearcher(idx)
    before = (s.count({"term": {"meta.env": "prod"}}),
              s.count({"term": {"meta.tier": "t1"}}),
              s.count({"term": {"meta": "prod"}}))
    assert len(s.seg_dirs) > 2
    m = load_index_manifest(idx)
    plan: dict = {}
    for r in m["segments"]:
        plan.setdefault(r["part"], []).append(r["seg_id"])
    merge_partition_segments(idx, plan, num_buckets=2)
    s2 = LocalSearcher(idx)
    assert len(s2.seg_dirs) == 2
    after = (s2.count({"term": {"meta.env": "prod"}}),
             s2.count({"term": {"meta.tier": "t1"}}),
             s2.count({"term": {"meta": "prod"}}))
    assert before == after == (30, 20, 30)
    a = s2.search_aggs({"match_all": {}},
                       {"e": {"terms": {"field": "meta.env"}}})
    assert {b["key"]: b["doc_count"]
            for b in a["aggregations"]["e"]["buckets"]} == \
        {"prod": 30, "dev": 30}


def test_docwriter_on_flattened_index(ray_session, tmp_path):
    """Single-doc writes re-index flattened leaves through the same
    micro-segment path (the leaf analyzer runs in _flush_segments)."""
    from raydex.index.docwrite import DocWriter

    t = pa.table({
        "url": pa.array([f"d/{i}" for i in range(10)]),
        "warc_ts": pa.array(list(range(10)), pa.int64()).cast(
            pa.timestamp("us")),
        "text": pa.array([f"doc {i}" for i in range(10)],
                         pa.large_string()),
        "meta": pa.array([json.dumps({"env": "dev"})] * 10),
    })
    p = str(tmp_path / "p.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, analyzer="standard",
                fields=[FieldSpec("meta", source="meta",
                                  analyzer="flattened")])
    w = DocWriter(idx)
    w.index_doc({"url": "w/new", "text": "written doc",
                 "meta": json.dumps({"env": "prod", "tier": "hot"})})
    w.refresh()
    s = LocalSearcher(idx)
    assert s.count({"term": {"meta.env": "prod"}}) == 1
    assert s.count({"term": {"meta.tier": "hot"}}) == 1
    assert s.count({"term": {"meta.env": "dev"}}) == 10
