"""Can-match segment pre-filtering: range-vs-min/max skip before scoring
(the reference's CanMatchPreFilterSearchPhase.java:50,138 analogue)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index
from raydex.search.scatter import LocalSearcher


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    rows = []
    for i in range(120):
        rows.append(
            {
                "url": f"{chr(ord('a') + i % 24)}{i:04d}.example",
                "warc_ts": i,
                # doc length grows with i so dl ranges differ per segment
                "text": " ".join(["alpha"] * (3 + i % 40) + [f"tok{i % 9}"]),
            }
        )
    t = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows]).cast(pa.timestamp("us")),
            "text": pa.array([r["text"] for r in rows], pa.large_string()),
        }
    )
    p = str(tmp_path_factory.mktemp("cm_pages") / "pages.parquet")
    pq.write_table(t, p)
    d = str(tmp_path_factory.mktemp("cm_idx") / "index")
    build_index(p, d, num_partitions=2, analyzer="standard", source="text",
                max_docs_per_segment=15)
    return d


def _results_no_skip(s, qdict, k=200):
    df, fdf = s._query_stats(qdict)
    from raydex.search.scatter import merge_top_k

    per_seg = s.group.query_top_k(
        qdict, k, s.ndocs, s.sum_dl, df, s.manifest["analyzer"],
        fdf=fdf, field_sum_dl=s.field_sum_dl, can_match=False,
    )
    return merge_top_k(per_seg, k)


def test_url_range_skips_segments(idx):
    s = LocalSearcher(idx)
    q = {
        "bool": {
            "must": [{"match": {"text": "alpha"}}],
            "filter": [{"range": {"url": {"gte": "a", "lt": "c"}}}],
        }
    }
    got = s.search_query(q, k=200)
    assert s.group.can_match_skipped() > 0  # narrow range: segments pruned
    want = _results_no_skip(s, q)
    assert [(h["url"], h["score"]) for h in got] == [
        (h["url"], h["score"]) for h in want
    ]
    assert all(h["url"] < "c" for h in got) and len(got) > 0


def test_dl_range_skips_segments(idx):
    s = LocalSearcher(idx)
    # urls sort by letter; dl correlates with i%40 so most segments have
    # wide dl spans — use an out-of-range probe to skip everything
    q = {"range": {"dl": {"gte": 10_000}}}
    assert s.count(q) == 0
    assert s.group.can_match_skipped() == len(s.group.readers)


def test_no_ranges_no_skip(idx):
    s = LocalSearcher(idx)
    got = s.search_query({"match": {"text": "alpha"}}, k=50)
    assert s.group.can_match_skipped() == 0
    assert len(got) == 50


def test_count_with_skip_matches_full(idx):
    s = LocalSearcher(idx)
    q = {
        "bool": {
            "must": [{"match": {"text": "alpha"}}],
            "filter": [{"range": {"url": {"gte": "m"}}}],
        }
    }
    n = s.count(q)
    assert s.group.can_match_skipped() > 0
    df, fdf = s._query_stats(q)
    full = s.group.query_count(
        q, s.ndocs, s.sum_dl, df, s.manifest["analyzer"],
        fdf=fdf, field_sum_dl=s.field_sum_dl, can_match=False,
    )
    assert n == full > 0


def test_routing_targets_one_partition(idx):
    """?routing= search targeting (OperationRouting.searchShards): the
    routed search equals the full search restricted to the routed
    partition's docs, scores identical (global stats stay index-wide)."""
    from raydex.partition import route_partitions
    from raydex.search.scatter import RaySearcher

    s = LocalSearcher(idx)
    full = s.search_query({"match": {"text": "alpha"}}, k=200)
    assert s.num_partitions == 2
    total_routed = 0
    for routing in ("a0000.example", "b0001.example"):
        part = int(route_partitions([routing], s.num_partitions)[0])
        routed = s.search_query({"match": {"text": "alpha"}}, k=200,
                                routing=routing)
        assert s.group.last_routing_skipped > 0
        want = [h for h in full
                if int(route_partitions([h["url"]], 2)[0]) == part]
        assert [(h["url"], h["score"]) for h in routed] == \
            [(h["url"], h["score"]) for h in want]
        total_routed += len(routed)
        # plain-text path agrees
        routed2 = s.search("alpha", k=200, routing=routing)
        assert [(h["url"], h["score"]) for h in routed2] == \
            [(h["url"], h["score"]) for h in want]
    assert total_routed == len(full)
    # scatter path: same routed answer through the actor pool
    rs = RaySearcher(idx, num_actors=3)
    got = rs.search_query({"match": {"text": "alpha"}}, k=200,
                          routing="a0000.example")
    part = int(route_partitions(["a0000.example"], 2)[0])
    want = [h for h in full if int(route_partitions([h["url"]], 2)[0]) == part]
    assert [(h["url"], h["score"]) for h in got] == \
        [(h["url"], h["score"]) for h in want]
    rs.shutdown()
