"""Merge-as-shuffle tests: merged index == pre-merge index, exactly."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from raydex.corpus import make_pages_table, make_queries_table
from raydex.index.build import build_index, load_index_manifest, segment_dirs
from raydex.index.merge import (
    choose_merges,
    merge_index,
    merge_partition_segments,
)
from raydex.index.segment import SegmentReader
from raydex.search.scatter import LocalSearcher


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    t = make_pages_table(500, seed=42, dup_frac=0.04)
    p = str(tmp_path_factory.mktemp("pgs") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("mi") / "index")
    # tiny segments -> many per partition -> real merge work
    m = build_index(p, idx, num_partitions=2, max_docs_per_segment=40, source="text")
    return idx, m


def _search_all(idx, queries):
    s = LocalSearcher(idx)
    return [
        [(r["url"], r["score"]) for r in s.search(q, k=k)] for q, k in queries
    ]


def test_merge_preserves_results(small_index):
    idx, m0 = small_index
    queries = [(q, k) for q, k in zip(
        make_queries_table(20)["query_text"].to_pylist(),
        make_queries_table(20)["k"].to_pylist(),
    )]
    before = _search_all(idx, queries)
    nsegs_before = len(m0["segments"])
    assert nsegs_before > 2 * m0["num_partitions"]  # multiple segments/part

    plan = {p: [r["seg_id"] for r in m0["segments"] if r["part"] == p]
            for p in {r["part"] for r in m0["segments"]}}
    merged = merge_partition_segments(idx, plan, num_buckets=8)
    m1 = load_index_manifest(idx)
    assert len(m1["segments"]) == len(plan)  # one merged segment per part
    assert m1["doc_count"] == m0["doc_count"]
    assert sum(r["term_count"] for r in m1["segments"]) > 0

    after = _search_all(idx, queries)
    assert before == after  # EXACT: urls and float32 scores identical


def test_merged_reader_postings_union(small_index, tmp_path):
    idx, _ = small_index
    m = load_index_manifest(idx)
    sd = segment_dirs(idx, m)[0]
    r = SegmentReader(sd)
    assert r.manifest.get("layout") == "bucketed"
    # postings of a merged term must be strictly increasing docids, df consistent
    for t in ["search", "data", "term10"]:
        ti = r.lookup(t)
        if ti < 0:
            continue
        ids, tfs = r.postings(ti)
        assert ids.size == r.df[ti]
        assert np.all(np.diff(ids) > 0)
        assert ids.max() < r.ndocs
        assert tfs.sum() == r.cf[ti]


def test_choose_merges_policy(ray_session, tmp_path):
    t = make_pages_table(300, seed=9)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=1, max_docs_per_segment=20, source="text")
    plan = choose_merges(idx)
    assert 0 in plan and len(plan[0]) >= 2  # >10 segments -> merge chosen
    merge_index(idx)
    m = load_index_manifest(idx)
    # merged segment appears, inputs gone
    assert any(r["seg_id"].startswith("mseg-") for r in m["segments"])


def test_crash_before_manifest_commit_leaves_index_openable(
    tmp_path, ray_session, monkeypatch
):
    """A crash after bucket writes but BEFORE the index-manifest commit
    must leave the OLD index fully openable (old segments are deleted
    only after the new commit point is durable)."""
    import os as _os

    import pyarrow.parquet as pq

    from raydex.corpus import make_pages_table
    from raydex.index import merge as merge_mod
    from raydex.index.build import build_index, load_index_manifest
    from raydex.search.scatter import LocalSearcher

    t = make_pages_table(400, seed=23)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, source="text", max_docs_per_segment=100)
    before = LocalSearcher(idx).search("web search", k=5)
    m = load_index_manifest(idx)
    plan = {}
    for r in m["segments"]:
        plan.setdefault(r["part"], []).append(r["seg_id"])
    old_dirs = [
        _os.path.join(idx, f"part={part:05d}", sid)
        for part, sids in plan.items() for sid in sids
    ]

    real_replace = _os.replace

    def exploding_replace(src, dst):
        if dst.endswith("index_manifest.json"):
            raise RuntimeError("simulated crash at commit point")
        return real_replace(src, dst)

    monkeypatch.setattr(merge_mod.os, "replace", exploding_replace)
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_mod.merge_partition_segments(idx, plan)
    monkeypatch.undo()

    # old segment dirs survive and the old manifest still opens cleanly
    assert all(_os.path.isdir(d) for d in old_dirs)
    after = LocalSearcher(idx).search("web search", k=5)
    assert [(h["url"], h["score"]) for h in before] == [
        (h["url"], h["score"]) for h in after
    ]


def test_merge_bucket_count_invariance(ray_session, tmp_path):
    """num_buckets is shuffle granularity only: merging the same
    segment set with 4 vs 32 buckets must yield byte-equal search
    results (urls + float32 scores) — the serve_prepare path sizes
    buckets to the cpu count, which must never change scores."""
    t = make_pages_table(300, seed=7, dup_frac=0.0)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    results = []
    for nb in (4, 32):
        idx = str(tmp_path / f"idx_nb{nb}")
        build_index(p, idx, num_partitions=2, max_docs_per_segment=40,
                    source="text")
        m = load_index_manifest(idx)
        plan = {pt: [r["seg_id"] for r in m["segments"] if r["part"] == pt]
                for pt in {r["part"] for r in m["segments"]}}
        merge_partition_segments(idx, plan, num_buckets=nb)
        queries = [(q, k) for q, k in zip(
            make_queries_table(10)["query_text"].to_pylist(),
            make_queries_table(10)["k"].to_pylist())]
        results.append(_search_all(idx, queries))
    assert results[0] == results[1]
