

def test_build_from_ndjson(tmp_path, ray_session):
    """NDJSON ingest (the _bulk wire format) produces an index identical
    to the parquet path on the same docs."""
    import json as _json

    import pyarrow.parquet as _pq

    from raydex.corpus import pages_path
    from raydex.index.build import build_index
    from raydex.search.scatter import LocalSearcher

    src = pages_path(200, seed=42)
    tbl = _pq.read_table(src, columns=["url", "warc_ts", "text"])
    nd = tmp_path / "docs.ndjson"
    with open(nd, "w") as f:
        for row in tbl.to_pylist():
            f.write(_json.dumps(row, default=str) + "\n")

    idx_a = str(tmp_path / "idx_ndjson")
    idx_b = str(tmp_path / "idx_parquet")
    ma = build_index(str(nd), idx_a, num_partitions=2)
    mb = build_index(src, idx_b, num_partitions=2)
    assert ma["doc_count"] == mb["doc_count"]
    ra = LocalSearcher(idx_a).search("web search engine", k=5)
    rb = LocalSearcher(idx_b).search("web search engine", k=5)
    assert [(r["url"], round(r["score"], 5)) for r in ra] == [
        (r["url"], round(r["score"], 5)) for r in rb
    ]


def test_snapshot_restore_incremental(tmp_path, ray_session):
    """Snapshot -> restore is byte-identical; a second snapshot of the
    unchanged index stores zero new blobs (the reference's incremental
    blob-store model, BlobStoreRepository.java)."""
    import pytest

    from raydex.corpus import pages_path
    from raydex.index.build import build_index
    from raydex.index.snapshot import (
        create_snapshot,
        list_snapshots,
        restore_snapshot,
    )
    from raydex.search.scatter import LocalSearcher

    idx = str(tmp_path / "idx_snap")
    build_index(pages_path(200, seed=7), idx, num_partitions=2)
    repo = str(tmp_path / "repo")
    m1 = create_snapshot(idx, repo, "s1")
    assert m1["stored_blobs"] > 0 and m1["reused_blobs"] == 0
    m2 = create_snapshot(idx, repo, "s2")
    assert m2["stored_blobs"] == 0 and m2["reused_blobs"] == m1["stored_blobs"]
    assert list_snapshots(repo) == ["s1", "s2"]
    with pytest.raises(ValueError):
        create_snapshot(idx, repo, "s1")  # duplicate name

    dest = str(tmp_path / "restored")
    restore_snapshot(repo, "s1", dest)
    # restored index serves identical results
    a = LocalSearcher(idx).search("web search", k=5)
    b = LocalSearcher(dest).search("web search", k=5)
    assert [(h["url"], h["score"]) for h in a] == \
           [(h["url"], h["score"]) for h in b]
    # every restored file is byte-identical
    import filecmp
    cmp = filecmp.dircmp(idx, dest)
    def assert_same(c):
        assert not c.diff_files and not c.left_only and not c.right_only
        for sub in c.subdirs.values():
            assert_same(sub)
    assert_same(cmp)
