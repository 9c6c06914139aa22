"""Compacting expunge-deletes rewrite (Lucene forceMergeDeletes
analogue): after compaction a segment is byte-identical to one built
fresh from only the surviving docs — stats (df, sum_dl, N) recover and
scores match the clean index exactly."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index, load_index_manifest, segment_dirs
from raydex.index.compact import expunge_deletes
from raydex.index.deletes import delete_by_query
from raydex.index.segment import FieldSpec, SegmentReader
from raydex.search.get import get_doc
from raydex.search.scatter import LocalSearcher

N = 90


def _pages(only_live=False):
    rows = [
        (f"s{i % 7}.example/p/{i}", i,
         f"doc {'red' if i % 3 == 0 else 'blue'} token number {i}",
         [float(i % 5) + 0.25, float(i % 11) - 3.0])
        for i in range(N)
    ]
    if only_live:
        rows = [r for r in rows if "red" not in r[2]]
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "text": pa.array([r[2] for r in rows], pa.large_string()),
            "embedding": pa.array([r[3] for r in rows],
                                  pa.list_(pa.float32())),
        }
    )


def _build(tmp_path, name, table):
    p = str(tmp_path / f"{name}.parquet")
    pq.write_table(table, p)
    idx = str(tmp_path / name)
    build_index(
        p, idx, num_partitions=3, analyzer="standard_en",
        max_docs_per_segment=1000, store_positions=True,
        fields=[
            FieldSpec("emb", source="embedding", analyzer="dense_vector",
                      dims=2, similarity="l2_norm"),
            FieldSpec("url", source="url", analyzer="keywordish"),
        ],
    )
    return idx


def test_expunge_matches_fresh_build(ray_session, tmp_path):
    idx = _build(tmp_path, "dirty", _pages())
    clean = _build(tmp_path, "clean", _pages(only_live=True))

    delete_by_query(idx, {"term": {"text": "red"}}, use_ray=False)
    out = expunge_deletes(idx, use_ray=False)
    assert out["compacted"] == 3
    m_dirty = load_index_manifest(idx)
    m_clean = load_index_manifest(clean)
    assert m_dirty["doc_count"] == m_clean["doc_count"]
    assert m_dirty["sum_dl"] == m_clean["sum_dl"]
    # byte-level: per-partition content hashes match the fresh build
    hd = {r["part"]: r["content_hash"] for r in m_dirty["segments"]}
    hc = {r["part"]: r["content_hash"] for r in m_clean["segments"]}
    assert hd == hc
    # no bitmaps remain
    assert not any(
        os.path.exists(os.path.join(sd, "livedocs.npy"))
        for sd in segment_dirs(idx, m_dirty)
    )
    # scores now EXCLUDE the deleted docs from stats: identical to clean
    a = LocalSearcher(idx).search_query({"match": {"text": "blue number"}},
                                        k=20)
    b = LocalSearcher(clean).search_query({"match": {"text": "blue number"}},
                                          k=20)
    assert [(h["url"], h["score"]) for h in a] == [
        (h["url"], h["score"]) for h in b
    ]
    # phrase path (positions survived compaction)
    pa_ = LocalSearcher(idx).search_query(
        {"match_phrase": {"text": "token number"}}, k=5
    )
    pb = LocalSearcher(clean).search_query(
        {"match_phrase": {"text": "token number"}}, k=5
    )
    assert [(h["url"], h["score"]) for h in pa_] == [
        (h["url"], h["score"]) for h in pb
    ]
    # dense_vector survived with renumbered rows: knn parity with clean
    q = [1.25, -3.0]
    ka = LocalSearcher(idx).knn_search("emb", q, k=8, num_candidates=30)
    kb = LocalSearcher(clean).knn_search("emb", q, k=8, num_candidates=30)
    assert [(h["url"], h["score"]) for h in ka] == [
        (h["url"], h["score"]) for h in kb
    ]
    # mapped keyword field survived: term query over it
    u = "s1.example/p/1"
    assert LocalSearcher(idx).count({"term": {"url": "p"}}) == \
        LocalSearcher(clean).count({"term": {"url": "p"}})
    assert get_doc(idx, u)["url"] == u


def test_expunge_noop_and_full_delete(ray_session, tmp_path):
    idx = _build(tmp_path, "noop", _pages())
    out = expunge_deletes(idx, use_ray=False)
    assert out == {"compacted": 0,
                   "doc_count": load_index_manifest(idx)["doc_count"]}
    # delete EVERYTHING in one partition's reach: all docs
    delete_by_query(idx, {"match_all": {}}, use_ray=False)
    out = expunge_deletes(idx, use_ray=False)
    assert out["doc_count"] == 0
    m = load_index_manifest(idx)
    assert m["segments"] == []
    assert LocalSearcher(idx).count({"match_all": {}}) == 0


def test_merge_reclaims_deletes(ray_session, tmp_path):
    """Merging segments that carry liveDocs must compact first (Lucene
    merge semantics) — the merged index equals delete -> expunge ->
    merge, and deleted docs stay gone."""
    from raydex.corpus import make_pages_table
    from raydex.index.merge import merge_partition_segments

    t = make_pages_table(300, seed=11, dup_frac=0.0)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "mrg")
    build_index(p, idx, num_partitions=2, max_docs_per_segment=40,
                source="text")
    m0 = load_index_manifest(idx)
    assert len(m0["segments"]) > 2  # several segments per partition

    n_all = LocalSearcher(idx).count({"match_all": {}})
    delete_by_query(idx, {"term": {"text": "web"}}, use_ray=False)
    n_del = n_all - LocalSearcher(idx).count({"match_all": {}})
    assert n_del > 0

    plan = {pp: [r["seg_id"] for r in m0["segments"] if r["part"] == pp]
            for pp in {r["part"] for r in m0["segments"]}}
    merge_partition_segments(idx, plan, num_buckets=4)
    m1 = load_index_manifest(idx)
    assert len(m1["segments"]) == 2
    assert m1["doc_count"] == n_all - n_del  # deletes reclaimed
    s = LocalSearcher(idx)
    assert s.count({"match_all": {}}) == n_all - n_del
    assert s.count({"term": {"text": "web"}}) == 0
    assert not any(
        os.path.exists(os.path.join(sd, "livedocs.npy"))
        for sd in segment_dirs(idx, m1)
    )


def test_snapshot_restores_lifecycle_artifacts(ray_session, tmp_path):
    """Snapshot/restore carries the round-3 sidecars (dense vectors,
    liveDocs bitmaps, url_index) — the restored index answers knn and
    respects deletes identically."""
    from raydex.index.snapshot import create_snapshot, restore_snapshot

    idx = _build(tmp_path, "snap_src", _pages())
    delete_by_query(idx, {"term": {"text": "red"}}, use_ray=False)
    s0 = LocalSearcher(idx)
    before_count = s0.count({"match_all": {}})
    q = [1.25, -3.0]
    before_knn = [(h["url"], h["score"])
                  for h in s0.knn_search("emb", q, k=6, num_candidates=30)]

    repo = str(tmp_path / "repo")
    create_snapshot(idx, repo, "snap1")
    dest = str(tmp_path / "restored")
    restore_snapshot(repo, "snap1", dest)
    s1 = LocalSearcher(dest)
    assert s1.count({"match_all": {}}) == before_count
    assert s1.count({"term": {"text": "red"}}) == 0  # deletes survived
    after_knn = [(h["url"], h["score"])
                 for h in s1.knn_search("emb", q, k=6, num_candidates=30)]
    assert after_knn == before_knn
