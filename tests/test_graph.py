"""Graph explore (x-pack graph TransportGraphExploreAction): hop-wise
significant-term vertices + co-occurrence connections, vs brute
recomputation."""

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index
from raydex.index.segment import FieldSpec
from raydex.search.graph import graph_explore
from raydex.search.scatter import LocalSearcher


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    rows = []
    # two clusters of tags with a bridge tag
    for i in range(60):
        rows.append((f"ray data engine doc {i}", "ray data cluster"))
    for i in range(40):
        rows.append((f"lucene index doc {i}", "lucene index cluster"))
    for i in range(80):
        rows.append((f"plain filler doc {i}", "misc filler"))
    t = pa.table({
        "url": pa.array([f"u{i}.example" for i in range(len(rows))]),
        "warc_ts": pa.array(np.arange(len(rows), dtype="int64"),
                            pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array([r[0] for r in rows], pa.large_string()),
        "tags": pa.array([r[1] for r in rows]),
    })
    p = str(tmp_path_factory.mktemp("g_pages") / "pages.parquet")
    pq.write_table(t, p)
    d = str(tmp_path_factory.mktemp("g_idx") / "index")
    build_index(p, d, num_partitions=2, analyzer="standard", source="text",
                fields=[FieldSpec("tags", source="tags",
                                  analyzer="whitespace")])
    return d, rows


def test_graph_explore(idx):
    d, rows = idx
    s = LocalSearcher(d)
    out = graph_explore(s, {"match": {"text": "ray"}}, "tags",
                        size=5, hops=2)
    terms = {v["term"] for v in out["vertices"]}
    # hop 0 finds the ray-cluster tags (significant among ray docs)
    assert {"ray", "data"} <= terms
    # the shared "cluster" tag bridges to the lucene cluster at hop 1
    assert "lucene" in terms and {v["term"]: v["depth"] for v in out["vertices"]}["lucene"] == 1
    # connections carry exact co-occurrence doc counts
    cooc = collections.Counter()
    for _, tags in rows:
        ts = tags.split()
        for a in ts:
            for b in ts:
                if a != b:
                    cooc[(a, b)] += 1
    for c in out["connections"]:
        assert c["doc_count"] == cooc[(c["source"], c["target"])]
    # depth recorded per hop; weights sorted descending
    ws = [v["weight"] for v in out["vertices"]]
    assert ws == sorted(ws, reverse=True)
    # hop-1 vertices exist (expansion happened from hop-0 terms)
    assert any(v["depth"] == 1 for v in out["vertices"])
