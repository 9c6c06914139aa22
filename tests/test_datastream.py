"""Data streams: generation-numbered backing indexes, write-to-newest,
search-across-all (DataStream.java + x-pack data-streams actions)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index
from raydex.index.datastream import DataStreamRegistry


def _pages(tmp, tag, n, base):
    t = pa.table({
        "url": pa.array([f"{tag}{i}.example" for i in range(n)]),
        "warc_ts": pa.array(
            np.arange(base, base + n, dtype="int64"), pa.int64()
        ).cast(pa.timestamp("us")),
        "text": pa.array([f"{tag} event body {i}" for i in range(n)],
                         pa.large_string()),
    })
    p = str(tmp / f"{tag}.parquet")
    pq.write_table(t, p)
    return p


def test_datastream_lifecycle(ray_session, tmp_path):
    reg = DataStreamRegistry(str(tmp_path / "root"))
    st = reg.create("logs")
    assert st["indices"] == [".ds-logs-000001"]
    assert reg.backing_name("logs", 7) == ".ds-logs-000007"
    with pytest.raises(ValueError, match="already exists"):
        reg.create("logs")

    # gen 1: build into the write dir
    build_index(_pages(tmp_path, "alpha", 40, 0), reg.write_dir("logs"),
                num_partitions=1, analyzer="standard", source="text")
    assert reg.searcher("logs").count({"match": {"text": "alpha"}}) == 40

    # rollover: writes move, searches still span everything built
    r = reg.rollover("logs")
    assert r["new_index"] == ".ds-logs-000002"
    assert reg.write_dir("logs").endswith("000002")
    # the unbuilt new generation is skipped by search resolution
    assert len(reg.search_dirs("logs")) == 1
    build_index(_pages(tmp_path, "beta", 25, 1000), reg.write_dir("logs"),
                num_partitions=1, analyzer="standard", source="text")
    s = reg.searcher("logs")
    assert s.count({"match": {"text": "alpha"}}) == 40
    assert s.count({"match": {"text": "beta"}}) == 25
    assert s.count({"match": {"text": "event"}}) == 65

    # union-IDF: scores comparable across generations (shared stats)
    hits = s.search_query({"match": {"text": "event"}}, k=65)
    assert len(hits) == 65

    reg.delete("logs")
    with pytest.raises(ValueError, match="unknown data stream"):
        reg.get("logs")


def test_async_search(ray_session, tmp_path):
    from raydex.search.async_search import AsyncSearchService
    from raydex.search.scatter import LocalSearcher

    idx = str(tmp_path / "as_idx")
    build_index(_pages(tmp_path, "gamma", 30, 0), idx,
                num_partitions=1, analyzer="standard", source="text")
    svc = AsyncSearchService()
    q = {"match": {"text": "gamma"}}
    # long wait -> completes inline
    r = svc.submit(idx, q, k=5, wait_for_completion_s=30)
    assert not r["is_running"]
    want = LocalSearcher(idx).search_query(q, k=5)
    assert r["response"]["hits"] == want
    # zero wait -> poll until done
    r2 = svc.submit(idx, q, k=5)
    sid = r2["id"]
    import time as _t
    deadline = _t.time() + 30
    while r2["is_running"] and _t.time() < deadline:
        r2 = svc.get(sid, wait_s=1)
    assert not r2["is_running"] and r2["response"]["hits"] == want
    # delete drops the id
    assert svc.delete(sid) is True
    with pytest.raises(ValueError, match="unknown async search"):
        svc.get(sid)
