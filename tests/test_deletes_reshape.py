"""Soft deletes (liveDocs) + delete_by_query, and the reshape family
(clone / shrink / split) built on hardlinks + routing-filter deletes —
the reference's TransportResizeAction / ShardSplittingQuery model."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index, load_index_manifest, segment_dirs
from raydex.index.deletes import delete_by_query, delete_ids, index_delete_stats
from raydex.index.reshape import clone_index, shrink_index, split_index
from raydex.search.get import get_doc, mget
from raydex.search.scatter import LocalSearcher

N = 80


def _pages():
    return pa.table(
        {
            "url": pa.array([f"s{i % 7}.example/p/{i}" for i in range(N)]),
            "warc_ts": pa.array(list(range(N)), pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array(
                [f"doc {'red' if i % 2 else 'blue'} item number {i}"
                 for i in range(N)],
                pa.large_string(),
            ),
        }
    )


@pytest.fixture()
def built(ray_session, tmp_path):
    p = str(tmp_path / "pages.parquet")
    pq.write_table(_pages(), p)
    idx = str(tmp_path / "index")
    build_index(p, idx, num_partitions=4, analyzer="standard_en",
                max_docs_per_segment=15)
    return idx


def test_delete_by_query_masks_everywhere(built):
    idx = built
    s0 = LocalSearcher(idx)
    n_red = s0.count({"term": {"text": "red"}})
    n_all = s0.count({"match_all": {}})
    assert n_red == N // 2 and n_all == N
    blue_hit = s0.search_query({"term": {"text": "blue"}}, k=1)[0]

    res = delete_by_query(idx, {"term": {"text": "red"}}, use_ray=False)
    assert res["deleted"] == n_red
    s = LocalSearcher(idx)  # fresh readers see the bitmaps
    assert s.count({"term": {"text": "red"}}) == 0
    assert s.count({"match_all": {}}) == n_all - n_red
    # deleted doc: GET -> None; live doc still resolves
    red_url = "s1.example/p/1"
    assert get_doc(idx, red_url) is None
    assert get_doc(idx, "s0.example/p/0") is not None
    got = mget(idx, [red_url, "s0.example/p/0"])
    assert got[0] is None and got[1] is not None
    # stats still include deleted docs: a surviving doc's score is
    # UNCHANGED (df/norms untouched until merge — reference behavior)
    hit2 = s.search_query({"term": {"text": "blue"}}, k=1)[0]
    assert hit2["score"] == blue_hit["score"]
    # idempotent: re-delete finds nothing new
    res2 = delete_by_query(idx, {"term": {"text": "red"}}, use_ray=False)
    assert res2["deleted"] == 0
    st = index_delete_stats(idx)
    assert st["docs_deleted"] == n_red and st["docs_count"] == n_all - n_red


def test_delete_ids_and_match_path(built):
    idx = built
    victims = ["s0.example/p/0", "s1.example/p/8"]
    out = delete_by_query(idx, {"ids": {"values": victims}}, use_ray=False)
    assert out["deleted"] == 2
    s = LocalSearcher(idx)
    # plain-text match path (brute-with-live route) excludes them
    hits = s.search("number", k=N)
    assert {h["url"] for h in hits}.isdisjoint(set(victims))
    assert len(hits) == N - 2


def test_clone_is_identical(built):
    idx = built
    dst = idx + "_clone"
    m = clone_index(idx, dst)
    assert m["doc_count"] == N
    a = LocalSearcher(idx).search_query({"match": {"text": "item number"}}, k=20)
    b = LocalSearcher(dst).search_query({"match": {"text": "item number"}}, k=20)
    assert [(h["url"], h["score"]) for h in a] == [
        (h["url"], h["score"]) for h in b
    ]


def test_shrink_preserves_results(built):
    idx = built
    dst = idx + "_shrunk"
    m = shrink_index(idx, dst, 2)
    assert m["num_partitions"] == 2 and m["doc_count"] == N
    with pytest.raises(ValueError, match="divide"):
        shrink_index(idx, idx + "_bad", 3)
    a = LocalSearcher(idx)
    b = LocalSearcher(dst)
    q = {"match": {"text": "red item"}}
    assert a.count(q) == b.count(q)
    ha = {(h["url"], h["score"]) for h in a.search_query(q, k=N)}
    hb = {(h["url"], h["score"]) for h in b.search_query(q, k=N)}
    assert ha == hb  # same stats, same segments -> identical scores
    # point gets route correctly at the NEW partition count
    assert get_doc(dst, "s3.example/p/3")["url"] == "s3.example/p/3"


def test_split_routes_and_masks(built):
    idx = built
    dst = idx + "_split"
    m = split_index(idx, dst, 8)
    assert m["num_partitions"] == 8
    with pytest.raises(ValueError, match="multiple"):
        split_index(idx, idx + "_bad", 6)
    s = LocalSearcher(dst)
    # every doc is live in EXACTLY one child: match_all count is exact
    assert s.count({"match_all": {}}) == N
    assert s.count({"term": {"text": "red"}}) == N // 2
    # full retrieval has no duplicate urls
    hits = s.search("number", k=2 * N)
    urls = [h["url"] for h in hits]
    assert len(urls) == N and len(set(urls)) == N
    # point gets at the new count find the single live copy
    for u in ["s0.example/p/0", "s6.example/p/76", "s2.example/p/37"]:
        assert get_doc(dst, u)["url"] == u
    # each child segment has a liveDocs sidecar (the routing filter)
    assert all(
        os.path.exists(os.path.join(sd, "livedocs.npy"))
        for sd in segment_dirs(dst, m)
    )
    # source untouched
    assert LocalSearcher(idx).count({"match_all": {}}) == N
    assert not any(
        os.path.exists(os.path.join(sd, "livedocs.npy"))
        for sd in segment_dirs(idx, load_index_manifest(idx))
    )


def test_split_then_delete_compose(built):
    idx = built
    dst = idx + "_split2"
    split_index(idx, dst, 8)
    delete_by_query(dst, {"term": {"text": "blue"}}, use_ray=False)
    s = LocalSearcher(dst)
    assert s.count({"match_all": {}}) == N // 2
    assert s.count({"term": {"text": "blue"}}) == 0
    assert s.count({"term": {"text": "red"}}) == N // 2
