"""ILM phase execution (x-pack ilm IndexLifecycleService /
LifecyclePolicy): hot rollover, warm forcemerge+shrink, delete — each
action idempotent, driven by index age."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.aliases import AliasRegistry
from raydex.index.build import build_index
from raydex.index.deletes import delete_by_query
from raydex.index.ilm import step
from raydex.search.scatter import LocalSearcher


def _build(tmp_path, name, n=30):
    t = pa.table({
        "url": pa.array([f"{name}{i}.example" for i in range(n)]),
        "warc_ts": pa.array(np.arange(n, dtype="int64"),
                            pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array([f"{name} body token{i % 3}" for i in range(n)],
                         pa.large_string()),
    })
    p = str(tmp_path / f"{name}.parquet")
    pq.write_table(t, p)
    d = str(tmp_path / f"{name}-000001")
    build_index(p, d, num_partitions=2, analyzer="standard", source="text")
    return d


def test_ilm_phases(ray_session, tmp_path):
    idx = _build(tmp_path, "logs", n=30)
    reg = AliasRegistry(str(tmp_path / "reg"))
    reg.update_aliases([{"add": {"alias": "logs", "index": idx,
                                 "is_write_index": True}}])
    # deletes so forcemerge has something to reclaim
    delete_by_query(idx, {"term": {"text": "token0"}}, use_ray=False)

    policy = {"phases": {
        "hot": {"min_age_s": 0,
                "actions": {"rollover": {"max_docs": 10}}},
        "warm": {"min_age_s": 100,
                 "actions": {"forcemerge": {},
                             "shrink": {"number_of_shards": 1}}},
        "delete": {"min_age_s": 10_000, "actions": {"delete": {}}},
    }}

    # young index: hot only -> rollover fires (doc_count >= 10)
    log = step(reg, "logs", policy, now_age_s=lambda d: 1)
    assert [e["action"] for e in log] == ["hot.rollover"]
    rows = {r["index"]: r for r in reg.get("logs")}
    assert rows[idx]["is_write_index"] is False
    new_name = [i for i in rows if i != idx][0]
    assert rows[new_name]["is_write_index"] is True
    # idempotent: second tick at the same age does nothing
    assert step(reg, "logs", policy, now_age_s=lambda d: 1) == []

    # warm age: forcemerge (reclaims deletes) + shrink to 1 partition
    live_before = LocalSearcher(idx).count({"match_all": {}})
    log = step(reg, "logs", policy,
               now_age_s=lambda d: 0 if d != idx else 200)
    acts = [e["action"] for e in log]
    assert acts == ["warm.forcemerge", "warm.shrink"]
    shrunk = log[-1]["shrunk_to"]
    assert os.path.exists(shrunk)
    assert idx not in {r["index"] for r in reg.get("logs")}
    s = LocalSearcher(shrunk)
    assert s.count({"match_all": {}}) == live_before
    assert s.count({"term": {"text": "token0"}}) == 0  # deletes gone
    # idempotent at warm age
    assert step(reg, "logs", policy,
                now_age_s=lambda d: 0 if d != shrunk else 200) == []

    # delete age: removed from alias and disk
    log = step(reg, "logs", policy,
               now_age_s=lambda d: 0 if d != shrunk else 99_999)
    assert [e["action"] for e in log] == ["delete.delete"]
    assert not os.path.exists(shrunk)
    assert shrunk not in {r["index"] for r in reg.get("logs")}


def test_ilm_unmet_rollover_blocks_later_phases(ray_session, tmp_path):
    """An incomplete hot phase (rollover conditions unmet on the write
    index) must BLOCK warm/delete even past their min_age — the
    reference's WaitForRolloverReadyStep holds the index in hot; falling
    through would forcemerge/shrink/rmtree an un-rolled write index
    (data loss)."""
    idx = _build(tmp_path, "small", n=5)  # below max_docs=1000
    reg = AliasRegistry(str(tmp_path / "reg2"))
    reg.update_aliases([{"add": {"alias": "small", "index": idx,
                                 "is_write_index": True}}])
    policy = {"phases": {
        "hot": {"min_age_s": 0,
                "actions": {"rollover": {"max_docs": 1000}}},
        "warm": {"min_age_s": 10,
                 "actions": {"shrink": {"number_of_shards": 1}}},
        "delete": {"min_age_s": 20, "actions": {"delete": {}}},
    }}
    # way past every min_age, but rollover can't fire (5 < 1000 docs):
    # nothing may run, the index must survive, phase must stay hot
    log = step(reg, "small", policy, now_age_s=lambda d: 99_999)
    assert log == []
    assert os.path.exists(idx)
    assert idx in {r["index"] for r in reg.get("small")}
    # once rollover CAN fire, the pipeline resumes normally
    policy["phases"]["hot"]["actions"]["rollover"]["max_docs"] = 3
    log = step(reg, "small", policy, now_age_s=lambda d: 99_999)
    acts = [e["action"] for e in log]
    assert acts[0] == "hot.rollover"
    assert "delete.delete" in acts  # later phases now free to run


def test_slm_retention(ray_session, tmp_path):
    """SLM tick: counter naming, max_count retention with GC'd blobs."""
    from raydex.index.snapshot import delete_snapshot, list_snapshots, slm_run

    idx = _build(tmp_path, "snapsrc", n=10)
    repo = str(tmp_path / "repo")
    pol = {"name": "nightly", "repository": repo,
           "config": {"index_dir": idx},
           "retention": {"max_count": 2}}
    r1 = slm_run(pol)
    assert r1["snapshot"] == "nightly-000001" and r1["deleted"] == []
    r2 = slm_run(pol)
    assert r2["snapshot"] == "nightly-000002" and r2["deleted"] == []
    r3 = slm_run(pol)
    assert r3["snapshot"] == "nightly-000003"
    assert r3["deleted"] == ["nightly-000001"]
    assert list_snapshots(repo) == ["nightly-000002", "nightly-000003"]
    # restore of a survivor still round-trips (blob GC kept shared blobs)
    from raydex.index.snapshot import restore_snapshot
    dest = str(tmp_path / "restored")
    restore_snapshot(repo, "nightly-000003", dest)
    from raydex.search.scatter import LocalSearcher
    assert LocalSearcher(dest).count({"match_all": {}}) == 10
    with pytest.raises(ValueError, match="unknown snapshot"):
        delete_snapshot(repo, "nightly-000001")


def test_searchable_snapshot_mount(ray_session, tmp_path):
    from raydex.index.snapshot import (create_snapshot,
                                       mount_searchable_snapshot)

    idx = _build(tmp_path, "mountsrc", n=12)
    repo = str(tmp_path / "repo2")
    create_snapshot(idx, repo, "snap1")
    cache = str(tmp_path / "cache")
    s = mount_searchable_snapshot(repo, "snap1", cache)
    assert s.count({"match_all": {}}) == 12
    # repeat mount reuses the cache (same dir, no second restore)
    s2 = mount_searchable_snapshot(repo, "snap1", cache)
    assert s2.count({"match_all": {}}) == 12
    assert os.path.isdir(os.path.join(cache, "mount-snap1"))


def test_object_store_repository_uri(ray_session, tmp_path):
    """Round-5: URI-addressed repositories (the repository-s3/gcs/azure
    plugin tier via fsspec). The full snapshot lifecycle — incremental
    create, list, digest-verified restore, gc-on-delete, searchable
    mount — runs against an object store (memory://) instead of a
    local directory."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydex.index.build import build_index
    from raydex.index.snapshot import (create_snapshot, delete_snapshot,
                                       list_snapshots,
                                       mount_searchable_snapshot,
                                       restore_snapshot)
    from raydex.search.scatter import LocalSearcher

    t = pa.table({
        "url": pa.array([f"s/{i}" for i in range(30)]),
        "warc_ts": pa.array(np.arange(30, dtype="int64")).cast(
            pa.timestamp("us")),
        "text": pa.array([f"snapshot object store doc {i}"
                          for i in range(30)], pa.large_string()),
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, analyzer="standard")

    repo = "memory://snaprepo_r5"
    m1 = create_snapshot(idx, repo, "s1")
    assert m1["stored_blobs"] > 0 and m1["reused_blobs"] == 0
    # incremental: unchanged index stores ZERO new blobs
    m2 = create_snapshot(idx, repo, "s2")
    assert m2["stored_blobs"] == 0 and m2["reused_blobs"] > 0
    assert list_snapshots(repo) == ["s1", "s2"]

    dest = str(tmp_path / "restored")
    restore_snapshot(repo, "s1", dest)
    s = LocalSearcher(dest)
    assert s.count({"match_all": {}}) == 30
    assert s.count({"term": {"text": "snapshot"}}) == 30

    # gc: deleting one snapshot removes nothing (s2 references all),
    # deleting both clears the blobs
    assert delete_snapshot(repo, "s1")["blobs_removed"] == 0
    out = delete_snapshot(repo, "s2")
    assert out["blobs_removed"] > 0
    assert list_snapshots(repo) == []

    # searchable mount straight off the object store
    m3 = create_snapshot(idx, repo, "s3")
    ms = mount_searchable_snapshot(repo, "s3",
                                   str(tmp_path / "mounts"))
    assert ms.count({"term": {"text": "object"}}) == 30
