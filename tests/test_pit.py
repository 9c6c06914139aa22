"""Point-in-time readers: an opaque id pins a consistent segment view
across later deletes/merges (TransportOpenPointInTimeAction shape),
with keep_alive leases, renewal, close, and reaper GC."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index
from raydex.index.deletes import delete_by_query
from raydex.search.pit import close_pit, expire_pits, open_pit, pit_dir
from raydex.search.scatter import LocalSearcher

N = 60


@pytest.fixture()
def built(ray_session, tmp_path):
    t = pa.table({
        "url": pa.array([f"p/{i}" for i in range(N)]),
        "warc_ts": pa.array(list(range(N)),
                            pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array(
            [f"doc {'red' if i % 2 else 'blue'} item {i}"
             for i in range(N)], pa.large_string()),
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "index")
    build_index(p, idx, num_partitions=2, analyzer="standard_en",
                max_docs_per_segment=20)
    return idx


def test_pit_survives_deletes(built):
    pid = open_pit(built)
    before_hits = LocalSearcher(built).search("red item", k=5)
    n_red = LocalSearcher(built).count({"term": {"text": "red"}})
    assert n_red == N // 2

    delete_by_query(built, {"term": {"text": "red"}}, use_ray=False)
    assert LocalSearcher(built).count({"term": {"text": "red"}}) == 0

    # the pinned view still sees every pre-delete doc, scores identical
    pv = pit_dir(pid)
    assert LocalSearcher(pv).count({"term": {"text": "red"}}) == n_red
    assert LocalSearcher(pv).search("red item", k=5) == before_hits


def test_pit_close_and_renew(built):
    pid = open_pit(built, keep_alive_s=1000)
    d = pit_dir(pid, keep_alive_s=2000)  # renew
    assert os.path.isdir(d)
    assert close_pit(pid) is True
    assert close_pit(pid) is False  # already gone
    with pytest.raises(ValueError, match="closed or expired"):
        pit_dir(pid)


def test_pit_reaper(built):
    keep = open_pit(built, keep_alive_s=10_000)
    lapse = open_pit(built, keep_alive_s=0.0)
    time.sleep(0.01)
    removed = expire_pits(built)
    assert len(removed) == 1
    assert os.path.isdir(pit_dir(keep))
    with pytest.raises(ValueError):
        pit_dir(lapse)
    close_pit(keep)
