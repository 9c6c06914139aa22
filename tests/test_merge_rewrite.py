"""Rewrite merge for multi-field segments (the per-field SegmentMerger
path): merged index answers every query kind — BM25, mapped-field term,
multi_match with global field stats, rank_feature, knn, point GET —
IDENTICALLY to the pre-merge index, and composes with deletes."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index, load_index_manifest, segment_dirs
from raydex.index.deletes import delete_by_query
from raydex.index.merge import merge_partition_segments
from raydex.search.get import get_doc
from raydex.search.scatter import LocalSearcher

N = 160
DIMS = 6


def _pages():
    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(N, DIMS)).astype(np.float32)
    return pa.table(
        {
            "url": pa.array([f"s{i % 5}.example/p/{i}" for i in range(N)]),
            "warc_ts": pa.array(list(range(N)), pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array(
                [f"doc {'red' if i % 3 == 0 else 'blue'} item number {i}"
                 for i in range(N)],
                pa.large_string(),
            ),
            "lang": pa.array([("en", "de", "fr")[i % 3] for i in range(N)]),
            "quality": pa.array([float(i % 9) + 0.5 for i in range(N)]),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        }
    ), vecs


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from raydex.index.segment import FieldSpec

    t, vecs = _pages()
    p = str(tmp_path_factory.mktemp("mr_pages") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("mr_idx") / "index")
    m = build_index(
        p, idx, num_partitions=2, analyzer="standard_en", source="text",
        max_docs_per_segment=20, store_positions=True,
        fields=[
            FieldSpec("lang", source="lang", analyzer="keyword"),
            FieldSpec("quality", source="quality", analyzer="rank_feature"),
            FieldSpec("emb", source="embedding", analyzer="dense_vector",
                      dims=DIMS, similarity="cosine"),
        ],
    )
    return idx, m, t, vecs


def _snapshot_queries(idx, vecs):
    s = LocalSearcher(idx)
    out = {}
    out["match"] = [(h["url"], h["score"]) for h in
                    s.search_query({"match": {"text": "red number"}}, k=25)]
    out["phrase"] = [(h["url"], h["score"]) for h in
                     s.search_query({"match_phrase": {"text": "item number"}},
                                    k=10)]
    out["lang_term"] = s.count({"term": {"lang": "de"}})
    out["multi_match"] = [(h["url"], round(h["score"], 6)) for h in
                          s.search_query(
                              {"multi_match": {"query": "blue en",
                                               "fields": ["text", "lang"],
                                               "type": "most_fields"}}, k=15)]
    out["rank_feature"] = [(h["url"], h["score"]) for h in
                           s.search_query(
                               {"bool": {"filter": [{"term": {"text": "red"}}],
                                         "should": [{"rank_feature": {
                                             "field": "quality",
                                             "saturation": {"pivot": 4.0}}}]}},
                               k=500)]
    out["knn"] = [(h["url"], h["score"]) for h in
                  s.knn_search("emb", vecs[1].astype(np.float64), k=12,
                               num_candidates=40)]
    return out


def test_rewrite_merge_preserves_everything(built):
    idx, m0, t, vecs = built
    assert len(m0["segments"]) > 2
    before = _snapshot_queries(idx, vecs)

    plan = {p: [r["seg_id"] for r in m0["segments"] if r["part"] == p]
            for p in {r["part"] for r in m0["segments"]}}
    merge_partition_segments(idx, plan, num_buckets=4)
    m1 = load_index_manifest(idx)
    assert len(m1["segments"]) == 2  # one merged segment per partition
    assert m1["doc_count"] == N
    assert m1["fields"]["lang"]["sum_dl"] == m0["fields"]["lang"]["sum_dl"]

    after = _snapshot_queries(idx, vecs)
    assert before == after  # every query kind byte-identical

    # point GET works via the url_index sidecar (merged doc order is
    # concatenation, not url order)
    for u in ["s0.example/p/0", "s4.example/p/159", "s2.example/p/87"]:
        assert get_doc(idx, u)["url"] == u
    for sd in segment_dirs(idx, m1):
        assert os.path.exists(os.path.join(sd, "url_index.parquet"))


def test_rewrite_merge_reclaims_deletes(ray_session, tmp_path):
    from raydex.index.segment import FieldSpec

    t, vecs = _pages()
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(
        p, idx, num_partitions=2, analyzer="standard_en",
        max_docs_per_segment=20,
        fields=[FieldSpec("lang", source="lang", analyzer="keyword")],
    )
    m0 = load_index_manifest(idx)
    delete_by_query(idx, {"term": {"lang": "de"}}, use_ray=False)
    n_live = LocalSearcher(idx).count({"match_all": {}})
    assert n_live < N

    plan = {pp: [r["seg_id"] for r in m0["segments"] if r["part"] == pp]
            for pp in {r["part"] for r in m0["segments"]}}
    merge_partition_segments(idx, plan, num_buckets=4)
    m1 = load_index_manifest(idx)
    assert m1["doc_count"] == n_live  # deletes reclaimed through rewrite
    s = LocalSearcher(idx)
    assert s.count({"term": {"lang": "de"}}) == 0
    assert s.count({"match_all": {}}) == n_live
    assert not any(
        os.path.exists(os.path.join(sd, "livedocs.npy"))
        for sd in segment_dirs(idx, m1)
    )


def test_index_sorted_merge_multisorter(ray_session, tmp_path):
    """Merging index-sorted segments merge-sorts docs by the sort key
    (MultiSorter): the merged segment is STILL sorted, early termination
    still fires, gets still resolve, and search results are identical."""
    rng = np.random.default_rng(23)
    ts = rng.permutation(N) * 1000
    t = pa.table(
        {
            "url": pa.array([f"s{i % 5}.example/p/{i}" for i in range(N)]),
            "warc_ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array(
                [f"doc {'hot' if i % 4 == 0 else 'cold'} item {i}"
                 for i in range(N)],
                pa.large_string(),
            ),
        }
    )
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "sorted_idx")
    build_index(p, idx, num_partitions=2, analyzer="standard_en",
                max_docs_per_segment=15, index_sort=("warc_ts", "desc"),
                store_positions=True)
    m0 = load_index_manifest(idx)
    assert len(m0["segments"]) > 4
    s0 = LocalSearcher(idx)
    before_sorted = [(h["url"], h["sort_value"]) for h in
                     s0.search_sorted({"term": {"text": "cold"}},
                                      sort_field="warc_ts", order="desc",
                                      k=15)]
    before_match = [(h["url"], h["score"]) for h in
                    s0.search_query({"match": {"text": "hot item"}}, k=20)]
    before_phrase = s0.count({"match_phrase": {"text": "hot item"}})

    plan = {pp: [r["seg_id"] for r in m0["segments"] if r["part"] == pp]
            for pp in {r["part"] for r in m0["segments"]}}
    merge_partition_segments(idx, plan, num_buckets=4)
    m1 = load_index_manifest(idx)
    assert len(m1["segments"]) == 2 and m1["doc_count"] == N

    from raydex.index.segment import SegmentReader

    for sd in segment_dirs(idx, m1):
        r = SegmentReader(sd)
        v = r.doc_values["warc_ts"]
        assert (np.diff(v) <= 0).all()  # still desc-sorted after merge
        assert r.manifest["index_sort"] == ["warc_ts", "desc"]
    s1 = LocalSearcher(idx)
    after_sorted = [(h["url"], h["sort_value"]) for h in
                    s1.search_sorted({"term": {"text": "cold"}},
                                     sort_field="warc_ts", order="desc",
                                     k=15)]
    assert after_sorted == before_sorted
    assert getattr(s1.group, "last_sort_early_terminated", 0) > 0
    after_match = [(h["url"], h["score"]) for h in
                   s1.search_query({"match": {"text": "hot item"}}, k=20)]
    assert after_match == before_match
    assert s1.count({"match_phrase": {"text": "hot item"}}) == before_phrase
    for u in ["s0.example/p/0", "s4.example/p/159"]:
        assert get_doc(idx, u)["url"] == u


def test_merge_columnar_field_kinds(ray_session, tmp_path):
    """geo_point / geo_shape / range fields are purely columnar: merge
    must NOT route them through the text-layout union (they have no
    postings sub-index) — data concats with docs.parquet and manifest
    can-match bounds combine as bounds-of-bounds. Regression for the
    kind-dispatch falling into the text-like else branch."""
    from raydex.index.segment import FieldSpec

    n = 80
    rng = np.random.default_rng(7)
    lat = rng.uniform(40.0, 60.0, n).round(4)
    lon = rng.uniform(-10.0, 20.0, n).round(4)
    lo = rng.integers(0, 50, n)
    hi = lo + rng.integers(1, 30, n)
    t = pa.table({
        "url": pa.array([f"c{i:03d}.example" for i in range(n)]),
        "warc_ts": pa.array(np.arange(n, dtype="int64"),
                            pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array([f"spot {i} body" for i in range(n)],
                         pa.large_string()),
        "loc": pa.array([{"lat": float(a), "lon": float(b)}
                         for a, b in zip(lat, lon)],
                        pa.struct([("lat", pa.float64()),
                                   ("lon", pa.float64())])),
        "span": pa.array([{"gte": int(a), "lte": int(b)}
                          for a, b in zip(lo, hi)],
                         pa.struct([("gte", pa.int64()),
                                    ("lte", pa.int64())])),
        "shp": pa.array(
            [{"type": "Point", "coordinates": [float(b), float(a)]}
             for a, b in zip(lat, lon)],
            pa.struct([("type", pa.string()),
                       ("coordinates", pa.list_(pa.float64()))])),
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, analyzer="standard",
                source="text", max_docs_per_segment=15,
                fields=[FieldSpec("loc", source="loc",
                                  analyzer="geo_point"),
                        FieldSpec("span", source="span",
                                  analyzer="long_range"),
                        FieldSpec("shp", source="shp",
                                  analyzer="geo_shape")])
    m0 = load_index_manifest(idx)
    assert len(m0["segments"]) > 4

    geo_q = {"geo_distance": {"distance": "700km",
                              "loc": {"lat": 50.0, "lon": 5.0}}}
    rng_q = {"range": {"span": {"gte": 20, "lte": 40,
                                "relation": "intersects"}}}
    shp_q = {"geo_shape": {"shp": {"relation": "within", "shape": {
        "type": "envelope", "coordinates": [[-10.0, 60.0], [5.0, 45.0]]}}}}
    s0 = LocalSearcher(idx)
    before = {k: sorted(h["url"] for h in s0.search_query(q, k=n))
              for k, q in (("geo", geo_q), ("rng", rng_q), ("shp", shp_q))}
    assert all(0 < len(v) < n for v in before.values())

    plan = {pp: [r["seg_id"] for r in m0["segments"] if r["part"] == pp]
            for pp in {r["part"] for r in m0["segments"]}}
    merge_partition_segments(idx, plan, num_buckets=4)
    m1 = load_index_manifest(idx)
    assert len(m1["segments"]) == 2 and m1["doc_count"] == n
    for f, an in (("loc", "geo_point"), ("span", "long_range"),
                  ("shp", "geo_shape")):
        assert m1["fields"][f]["analyzer"] == an

    from raydex.index.segment import SegmentReader

    for sd in segment_dirs(idx, m1):
        r = SegmentReader(sd)
        # merged bounds == bounds over the merged column (can-match law)
        assert r.manifest["min_loc__lat"] == pytest.approx(
            float(np.min(r.doc_values["loc__lat"])))
        assert r.manifest["max_loc__lon"] == pytest.approx(
            float(np.max(r.doc_values["loc__lon"])))
        assert r.manifest["min_span"] == int(np.min(
            r.doc_values["span__gte"]))
        assert r.manifest["max_span"] == int(np.max(
            r.doc_values["span__lte"]))

    s1 = LocalSearcher(idx)
    after = {k: sorted(h["url"] for h in s1.search_query(q, k=n))
             for k, q in (("geo", geo_q), ("rng", rng_q), ("shp", shp_q))}
    assert after == before
