"""Merging positional segments preserves phrase-query results exactly."""

import pyarrow.parquet as pq
import pytest

from raydex.corpus import make_pages_table, make_queries_table
from raydex.index.build import build_index, load_index_manifest, segment_dirs
from raydex.index.merge import merge_partition_segments
from raydex.index.segment import SegmentReader
from raydex.search.scatter import LocalSearcher


@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    t = make_pages_table(400, seed=47, dup_frac=0.03)
    p = str(tmp_path_factory.mktemp("pp") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("pidx") / "index")
    build_index(p, idx, num_partitions=2, max_docs_per_segment=60,
                source="text", store_positions=True)
    return idx


def test_merge_preserves_phrase_results(pos_index):
    idx = pos_index
    s = LocalSearcher(idx)
    queries = [
        {"match_phrase": {"text": "search engine"}},
        {"match_phrase": {"text": "data stream"}},
        {"match": {"text": "web index"}},
        {"bool": {"must": [{"term": {"text": "data"}}],
                  "must_not": [{"prefix": {"text": "term1"}}]}},
    ]
    before = [
        [(h["url"], h["score"]) for h in s.search_query(q, k=15)] for q in queries
    ]
    counts_before = [s.count(q) for q in queries]

    m0 = load_index_manifest(idx)
    plan = {p: [r["seg_id"] for r in m0["segments"] if r["part"] == p]
            for p in {r["part"] for r in m0["segments"]}}
    merge_partition_segments(idx, plan, num_buckets=4)

    m1 = load_index_manifest(idx)
    assert len(m1["segments"]) == len(plan)
    r = SegmentReader(segment_dirs(idx, m1)[0])
    assert r.has_positions

    s2 = LocalSearcher(idx)
    after = [
        [(h["url"], h["score"]) for h in s2.search_query(q, k=15)] for q in queries
    ]
    counts_after = [s2.count(q) for q in queries]
    assert before == after
    assert counts_before == counts_after


def test_new_dsl_nodes_survive_merge(tmp_path, ray_session):
    """multi_match / span / phrase-prefix / runtime fields evaluate
    identically on the pre-merge and merged (bucketed) layouts."""
    import pyarrow.parquet as pq

    from raydex.corpus import make_pages_table
    from raydex.index.build import build_index, load_index_manifest
    from raydex.index.merge import merge_partition_segments
    from raydex.search.scatter import LocalSearcher

    t = make_pages_table(600, seed=31)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, source="text",
                max_docs_per_segment=100, store_positions=True)
    queries = [
        {"multi_match": {"query": "web search", "fields": ["text", "url"]}},
        {"span_near": {"clauses": [{"span_term": {"text": "search"}},
                                   {"span_term": {"text": "engine"}}],
                       "slop": 2, "in_order": True}},
        {"query_string": {"query": "(search AND engine) OR database"}},
        {"terms_set": {"text": {"terms": ["search", "engine", "data"],
                                "minimum_should_match": 2}}},
    ]
    # match_phrase_prefix scores its expansions with SEGMENT-LOCAL df
    # (the multi-term rewrite convention), so scores are layout-dependent
    # by design — compare ranking + count only for it
    qpp = {"match_phrase_prefix": {"text": "search eng"}}
    s = LocalSearcher(idx)
    before = [(s.count(q), [(h["url"], round(h["score"], 6))
                            for h in s.search_query(q, k=5)]) for q in queries]
    before_pp = (s.count(qpp), [h["url"] for h in s.search_query(qpp, k=5)])
    m = load_index_manifest(idx)
    plan = {}
    for r in m["segments"]:
        plan.setdefault(r["part"], []).append(r["seg_id"])
    merge_partition_segments(idx, plan)
    s2 = LocalSearcher(idx)
    after = [(s2.count(q), [(h["url"], round(h["score"], 6))
                            for h in s2.search_query(q, k=5)]) for q in queries]
    after_pp = (s2.count(qpp), [h["url"] for h in s2.search_query(qpp, k=5)])
    assert before == after
    assert before_pp == after_pp
    assert any(n > 0 for n, _ in before) and before_pp[0] > 0  # non-vacuous
