

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
