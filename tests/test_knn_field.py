"""dense_vector field type + knn search (``DenseVectorFieldMapper.java``
similarities, the `_search` top-level ``knn`` section).

Vectors are fixed-dims float32 doc-values (`field=<name>/vectors.parquet`);
knn scatters per-segment brute-force top-num_candidates and merges to the
global k with the TopDocs tie-break. Score transforms follow the
reference's published formulas (cosine -> (1+cos)/2 etc). Filtered knn
pre-filters candidates (k survivors guaranteed when the filter matches
>= k docs); hybrid (query + knn) sums boosted scores over the hit union.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index, segment_dirs
from raydex.index.segment import FieldSpec, SegmentReader
from raydex.search.knn import vector_scores
from raydex.search.scatter import LocalSearcher, RaySearcher

DIMS = 8
N = 120


def _corpus():
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(N, DIMS)).astype(np.float32)
    emb = [None if i % 15 == 14 else vecs[i].tolist() for i in range(N)]
    return pa.table(
        {
            "url": pa.array([f"s{i % 5}.example/p/{i}" for i in range(N)]),
            "warc_ts": pa.array(list(range(N)), pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array(
                [f"doc {'odd' if i % 2 else 'even'} number {i}" for i in range(N)],
                pa.large_string(),
            ),
            "embedding": pa.array(emb, pa.list_(pa.float32())),
        }
    ), vecs


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    t, vecs = _corpus()
    p = str(tmp_path_factory.mktemp("knn_pages") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("knn_idx") / "index")
    m = build_index(
        p, idx, num_partitions=3, analyzer="standard_en", source="text",
        max_docs_per_segment=25,
        fields=[FieldSpec("emb", source="embedding", analyzer="dense_vector",
                          dims=DIMS, similarity="cosine")],
    )
    return idx, m, t, vecs


def _brute_expected(t, vecs, q, k, urls_subset=None):
    """(url, score) of the exact global top-k by cosine transform."""
    urls = t["url"].to_pylist()
    emb = t["embedding"].to_pylist()
    rows = []
    for u, e in zip(urls, emb):
        if e is None or (urls_subset is not None and u not in urls_subset):
            continue
        v = np.asarray(e, dtype=np.float32)
        cos = float(v @ q / (np.linalg.norm(v.astype(np.float64)) * np.linalg.norm(q)))
        rows.append((u, (1.0 + cos) / 2.0))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def test_manifest_and_reader(built):
    idx, m, t, vecs = built
    fm = m["fields"]["emb"]
    assert fm["analyzer"] == "dense_vector"
    assert fm["dims"] == DIMS and fm["similarity"] == "cosine"
    n_valid = sum(1 for v in t["embedding"].to_pylist() if v is not None)
    total = 0
    for sd in segment_dirs(idx, m):
        r = SegmentReader(sd)
        mat, valid, sim = r.dense_vectors("emb")
        assert mat.shape[1] == DIMS and sim == "cosine"
        assert np.isfinite(mat[valid]).all()
        total += valid.size
        assert r.field("emb") is None  # dedicated structure
    assert total == n_valid


def test_knn_matches_bruteforce(built):
    idx, _, t, vecs = built
    s = LocalSearcher(idx)
    q = vecs[0].astype(np.float64)
    hits = s.knn_search("emb", q, k=15, num_candidates=50)
    want = _brute_expected(t, vecs, q, 15)
    assert [h["url"] for h in hits] == [u for u, _ in want]
    np.testing.assert_allclose(
        [h["score"] for h in hits], [sc for _, sc in want], rtol=1e-12
    )
    # rank 0 is the exact query vector's own doc (cosine = 1 -> score 1)
    assert hits[0]["url"] == t["url"][0].as_py()
    assert hits[0]["score"] == pytest.approx(1.0)


def test_knn_filtered(built):
    idx, _, t, vecs = built
    s = LocalSearcher(idx)
    q = vecs[3].astype(np.float64)
    flt = {"match": {"text": "odd"}}
    hits = s.knn_search("emb", q, k=10, num_candidates=60, filter=flt)
    odd_urls = {
        u for u, txt in zip(t["url"].to_pylist(), t["text"].to_pylist())
        if "odd" in txt
    }
    assert hits and all(h["url"] in odd_urls for h in hits)
    want = _brute_expected(t, vecs, q, 10, urls_subset=odd_urls)
    assert [h["url"] for h in hits] == [u for u, _ in want]


def test_knn_distributed_parity(built):
    idx, _, t, vecs = built
    q = vecs[9].astype(np.float64)
    local = LocalSearcher(idx).knn_search("emb", q, k=12, num_candidates=40)
    rs = RaySearcher(idx, num_actors=3)
    try:
        dist = rs.knn_search("emb", q, k=12, num_candidates=40)
    finally:
        rs.shutdown()
    assert [(h["url"], h["score"]) for h in dist] == [
        (h["url"], h["score"]) for h in local
    ]


def test_hybrid_search_sums_scores(built):
    idx, _, t, vecs = built
    s = LocalSearcher(idx)
    q = vecs[4].astype(np.float64)
    qdict = {"match": {"text": "number"}}
    k = 10
    qhits = {(h["ordinal"], h["docid"]): h["score"]
             for h in s.search_query(qdict, k=k)}
    khits = {(h["ordinal"], h["docid"]): h["score"]
             for h in s.knn_search("emb", q, k=k, num_candidates=50)}
    hyb = s.hybrid_search(qdict, {"field": "emb", "query_vector": q, "k": k,
                                  "num_candidates": 50, "boost": 2.0}, k=k)
    for h in hyb:
        key = (h["ordinal"], h["docid"])
        want = qhits.get(key, 0.0) + 2.0 * khits.get(key, 0.0)
        assert h["score"] == pytest.approx(want, rel=1e-12)
    # sorted by combined score desc
    scores = [h["score"] for h in hyb]
    assert scores == sorted(scores, reverse=True)


def test_dims_and_zero_vector_validation(ray_session, tmp_path):
    t = pa.table(
        {
            "url": pa.array(["a.example/1", "a.example/2"]),
            "warc_ts": pa.array([0, 1], pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array(["x", "y"], pa.large_string()),
            "embedding": pa.array([[1.0, 2.0], [1.0, 2.0, 3.0]],
                                  pa.list_(pa.float32())),
        }
    )
    p = str(tmp_path / "bad_dims.parquet")
    pq.write_table(t, p)
    with pytest.raises(Exception, match="dims"):
        build_index(
            p, str(tmp_path / "i1"), num_partitions=1, analyzer="standard",
            fields=[FieldSpec("emb", "embedding", "dense_vector", dims=2)],
        )
    t2 = t.set_column(
        t.schema.get_field_index("embedding"), "embedding",
        pa.array([[1.0, 2.0], [0.0, 0.0]], pa.list_(pa.float32())),
    )
    p2 = str(tmp_path / "zero_vec.parquet")
    pq.write_table(t2, p2)
    with pytest.raises(Exception, match="zero-magnitude"):
        build_index(
            p2, str(tmp_path / "i2"), num_partitions=1, analyzer="standard",
            fields=[FieldSpec("emb", "embedding", "dense_vector", dims=2,
                              similarity="cosine")],
        )


def test_similarity_transforms():
    mat = np.array([[1, 0], [0, 1], [-1, 0], [0.5, 0.5]], dtype=np.float32)
    q = np.array([1.0, 0.0])
    cos = vector_scores(mat, q, "cosine")
    np.testing.assert_allclose(cos, [(1 + c) / 2 for c in
                                     [1, 0, -1, np.sqrt(0.5)]], rtol=1e-6)
    dot = vector_scores(mat, q, "dot_product")
    np.testing.assert_allclose(dot, [(1 + d) / 2 for d in [1, 0, -1, 0.5]])
    l2 = vector_scores(mat, q, "l2_norm")
    np.testing.assert_allclose(l2, [1 / (1 + d) for d in [0, 2, 4, 0.5]])
    mip = vector_scores(mat, q, "max_inner_product")
    np.testing.assert_allclose(mip, [2, 1, 0.5, 1.5])


def test_knn_as_dsl_query(built):
    """`knn` QUERY kind (KnnVectorQueryBuilder): composable inside bool;
    leaf scores equal the knn-section scores for the same candidates."""
    idx, _, t, vecs = built
    s = LocalSearcher(idx)
    q = vecs[2].astype(np.float64)
    hits = s.search_query(
        {"knn": {"field": "emb", "query_vector": q.tolist(),
                 "num_candidates": 50}}, k=10)
    top = s.knn_search("emb", q, k=10, num_candidates=50)
    # DSL leaves emit float32 like every other scorer; the knn SECTION
    # keeps float64 — parity modulo the float32 cast
    assert [(h["url"], float(np.float32(h["score"]))) for h in hits] == [
        (h["url"], float(np.float32(h["score"]))) for h in top
    ]
    # inside bool with a filter: every hit satisfies the filter and
    # scores keep the knn similarity (filter context adds nothing)
    fhits = s.search_query(
        {"bool": {"must": [{"knn": {"field": "emb",
                                    "query_vector": q.tolist(),
                                    "num_candidates": 120}}],
                  "filter": [{"match": {"text": "odd"}}]}}, k=8)
    odd = {u for u, txt in zip(t["url"].to_pylist(), t["text"].to_pylist())
           if "odd" in txt}
    assert fhits and all(h["url"] in odd for h in fhits)
    # boost scales the leaf
    bhits = s.search_query(
        {"knn": {"field": "emb", "query_vector": q.tolist(),
                 "num_candidates": 50, "boost": 3.0}}, k=5)
    assert bhits[0]["score"] == pytest.approx(3.0 * top[0]["score"])


def test_knn_replicated_read_scaling(built):
    """ReplicatedSearcher knn: single-RPC global top-k per replica and
    the batched round-robin path, identical to the local result."""
    from raydex.search.scatter import ReplicatedSearcher

    idx, _, t, vecs = built
    q1, q2 = vecs[5].astype(np.float64), vecs[11].astype(np.float64)
    local = LocalSearcher(idx)
    rs = ReplicatedSearcher(idx, num_replicas=2)
    try:
        rs.wait_ready()
        one = rs.knn_search("emb", q1, k=7, num_candidates=30)
        want = local.knn_search("emb", q1, k=7, num_candidates=30)
        assert [(h["url"], h["score"]) for h in one] == [
            (h["url"], h["score"]) for h in want
        ]
        batch = rs.knn_search_batch([("emb", q1), ("emb", q2)], k=5,
                                    num_candidates=30)
        for got, qv in zip(batch, (q1, q2)):
            want = local.knn_search("emb", qv, k=5, num_candidates=30)
            assert [(h["url"], h["score"]) for h in got] == [
                (h["url"], h["score"]) for h in want
            ]
        with pytest.raises(ValueError, match="filtered knn"):
            rs.knn_search("emb", q1, filter={"match_all": {}})
    finally:
        rs.shutdown()


def test_field_caps_reports_mapped_kinds(built):
    from raydex.index.fieldcaps import field_caps_for_index

    idx, m, t, vecs = built
    caps = field_caps_for_index(idx)
    assert caps["emb"]["types"] == ["dense_vector"]
    assert caps["emb"]["dims"] == DIMS
    assert caps["emb"]["similarity"] == "cosine"
    assert caps["text"]["types"] == ["text"]


def test_ivf_index_options(ray_session, tmp_path):
    """dense_vector index_options: ivf_nlist builds a per-segment IVF
    structure; nprobe >= nlist (or None) stays EXACT, small nprobe
    finds an exact-duplicate query at rank 0 (same-cluster guarantee)
    and returns a subset of the exact candidates."""
    rng = np.random.default_rng(17)
    n = 200
    vecs = rng.normal(size=(n, DIMS)).astype(np.float32)
    vecs[57] = vecs[3]  # planted exact duplicate
    t = pa.table(
        {
            "url": pa.array([f"v.example/{i}" for i in range(n)]),
            "warc_ts": pa.array(list(range(n)), pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array([f"d {i}" for i in range(n)], pa.large_string()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    p = str(tmp_path / "ivf.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "ivf_idx")
    build_index(
        p, idx, num_partitions=2, analyzer="standard", max_docs_per_segment=60,
        fields=[FieldSpec("emb", "embedding", "dense_vector", dims=DIMS,
                          similarity="cosine", ivf_nlist=8)],
    )
    s = LocalSearcher(idx)
    q = vecs[3].astype(np.float64)
    exact = s.knn_search("emb", q, k=20, num_candidates=60)
    full_probe = s.knn_search("emb", q, k=20, num_candidates=60, nprobe=8)
    assert [(h["url"], h["score"]) for h in full_probe] == [
        (h["url"], h["score"]) for h in exact
    ]
    pruned = s.knn_search("emb", q, k=10, num_candidates=60, nprobe=2)
    # exact duplicates share a cluster with the query's nearest centroid
    assert {pruned[0]["url"], pruned[1]["url"]} == {"v.example/3",
                                                    "v.example/57"}
    assert pruned[0]["score"] == pytest.approx(1.0)
    # pruned hits are a subset of the exact candidate set
    assert {h["url"] for h in pruned} <= {h["url"] for h in exact} | {
        h["url"] for h in s.knn_search("emb", q, k=60, num_candidates=200)
    }
    # non-cosine + ivf is rejected at build
    with pytest.raises(Exception, match="cosine"):
        build_index(
            p, str(tmp_path / "bad"), num_partitions=1, analyzer="standard",
            fields=[FieldSpec("emb", "embedding", "dense_vector", dims=DIMS,
                              similarity="l2_norm", ivf_nlist=4)],
        )
