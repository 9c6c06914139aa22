"""rank_feature field type + query (mapper-extras
``RankFeatureFieldMapper.java`` / ``RankFeatureQueryBuilder.java:48-190``).

The field is a strictly-non-negative per-doc float stored as doc-values
(`field=<name>/feature.parquet`); the query matches docs that HAVE the
feature and scores boost * fn(v) for fn in saturation | log | sigmoid |
linear. Default saturation pivot = geometric mean of positive feature
values (the reference's index-statistics default).
"""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index, segment_dirs
from raydex.index.segment import FieldSpec, SegmentReader
from raydex.search.scatter import LocalSearcher


def _corpus():
    n = 50
    qual = [None if i % 10 == 9 else float(i % 7) * 1.5 + 0.5 for i in range(n)]
    return pa.table(
        {
            "url": pa.array([f"s{i % 4}.example/p/{i}" for i in range(n)]),
            "warc_ts": pa.array(list(range(n)), pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array([f"doc number {i} alpha" for i in range(n)], pa.large_string()),
            "quality": pa.array(qual, pa.float64()),
        }
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    t = _corpus()
    p = str(tmp_path_factory.mktemp("rf_pages") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("rf_idx") / "index")
    m = build_index(
        p, idx, num_partitions=2, analyzer="standard", source="text",
        max_docs_per_segment=10,
        fields=[FieldSpec("quality", source="quality", analyzer="rank_feature")],
    )
    return idx, m, t


def _expected(t, fn):
    """url -> expected float32 score for docs that have the feature."""
    urls, qual = t["url"].to_pylist(), t["quality"].to_pylist()
    out = {}
    for u, v in zip(urls, qual):
        if v is None:
            continue
        v32 = float(np.float32(v))  # stored as float32 doc-values
        out[u] = float(np.float32(fn(v32)))
    return out


def test_manifest_and_reader(built):
    idx, m, t = built
    fm = m["fields"]["quality"]
    assert fm["analyzer"] == "rank_feature"
    n_valid = sum(1 for v in t["quality"].to_pylist() if v is not None)
    assert fm["value_count"] == n_valid
    total = 0
    for sd in segment_dirs(idx, m):
        r = SegmentReader(sd)
        vals = r.rank_feature_values("quality")
        assert vals.size == r.ndocs
        total += int((~np.isnan(vals)).sum())
        assert r.field("quality") is None  # not a text sub-index
    assert total == n_valid


@pytest.mark.parametrize(
    "dsl,fn",
    [
        ({"saturation": {"pivot": 3.0}}, lambda v: v / (v + 3.0)),
        ({"log": {"scaling_factor": 2.5}}, lambda v: math.log(2.5 + v)),
        (
            {"sigmoid": {"pivot": 3.0, "exponent": 2.0}},
            lambda v: v**2 / (v**2 + 3.0**2),
        ),
        ({"linear": {}}, lambda v: v),
    ],
)
def test_scoring_functions(built, dsl, fn):
    idx, m, t = built
    s = LocalSearcher(idx)
    hits = s.search_query({"rank_feature": {"field": "quality", **dsl}}, k=100)
    exp = _expected(t, fn)
    got = {h["url"]: h["score"] for h in hits}
    assert set(got) == set(exp)  # matches exactly the docs WITH the feature
    for u in got:
        assert got[u] == pytest.approx(exp[u], rel=1e-6)


def test_boost_and_bool_composition(built):
    idx, m, t = built
    s = LocalSearcher(idx)
    base = {"rank_feature": {"field": "quality", "saturation": {"pivot": 3.0}}}
    boosted = {"rank_feature": {"field": "quality", "boost": 2.0,
                                "saturation": {"pivot": 3.0}}}
    h1 = {h["url"]: h["score"] for h in s.search_query(base, k=100)}
    h2 = {h["url"]: h["score"] for h in s.search_query(boosted, k=100)}
    for u in h1:
        assert h2[u] == pytest.approx(2.0 * h1[u], rel=1e-6)
    # the canonical usage: BM25 must + rank_feature should
    combined = {"bool": {"must": [{"match": {"text": "alpha"}}],
                         "should": [base]}}
    match_only = {"bool": {"must": [{"match": {"text": "alpha"}}]}}
    hc = {h["url"]: h["score"] for h in s.search_query(combined, k=100)}
    hm = {h["url"]: h["score"] for h in s.search_query(match_only, k=100)}
    assert set(hc) == set(hm)  # should-clause never changes matching
    has_feature = {u for u, v in zip(t["url"].to_pylist(),
                                     t["quality"].to_pylist()) if v is not None}
    for u in hc:
        if u in has_feature:
            assert hc[u] > hm[u]
        else:
            assert hc[u] == pytest.approx(hm[u])


def test_default_pivot_is_geometric_mean(built):
    idx, m, t = built
    # single-segment slice: default pivot must equal the segment's
    # geometric mean of positive values
    sd = segment_dirs(idx, m)[0]
    r = SegmentReader(sd)
    vals = r.rank_feature_values("quality")
    pos = vals[~np.isnan(vals) & (vals > 0)]
    pivot = float(np.exp(np.log(pos).mean()))
    from raydex.search.bm25 import GlobalStats
    from raydex.search.query import SegmentEvaluator, parse_query

    ev = SegmentEvaluator(
        r, GlobalStats(ndocs=r.ndocs, sum_dl=r.sum_dl, df={}), lambda s: [s]
    )
    sc_def, m_def = ev.eval(parse_query({"rank_feature": {"field": "quality"}}))
    sc_exp, m_exp = ev.eval(parse_query(
        {"rank_feature": {"field": "quality", "saturation": {"pivot": pivot}}}
    ))
    assert (m_def == m_exp).all()
    np.testing.assert_allclose(sc_def[m_def], sc_exp[m_exp], rtol=1e-12)


def test_negative_values_rejected(ray_session, tmp_path_factory):
    t = pa.table(
        {
            "url": pa.array(["a.example/1", "b.example/2"]),
            "warc_ts": pa.array([1, 2], pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array(["one", "two"], pa.large_string()),
            "quality": pa.array([1.0, -2.0], pa.float64()),
        }
    )
    p = str(tmp_path_factory.mktemp("rf_neg") / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("rf_neg_idx") / "index")
    with pytest.raises(Exception, match="non-negative"):
        build_index(
            p, idx, num_partitions=1, analyzer="standard", source="text",
            fields=[FieldSpec("quality", source="quality",
                              analyzer="rank_feature")],
        )


def test_parse_validation(built):
    from raydex.search.query import validate_query

    assert validate_query({"rank_feature": {"field": "q"}})["valid"]
    assert not validate_query({"rank_feature": {"field": "q", "log": {}}})["valid"]
    assert not validate_query(
        {"rank_feature": {"field": "q", "sigmoid": {"pivot": 1.0}}}
    )["valid"]


def test_rank_features_plural(ray_session, tmp_path_factory):
    """rank_features (RankFeaturesFieldMapper.java): sparse per-doc
    feature map; rank_feature queries target `<field>.<feature>`."""
    import pyarrow.parquet as pq2

    t = pa.table(
        {
            "url": pa.array([f"d{i}.example/{i}" for i in range(6)]),
            "warc_ts": pa.array(list(range(6)), pa.int64()).cast(pa.timestamp("us")),
            "text": pa.array([f"doc {i}" for i in range(6)], pa.large_string()),
            "feats": pa.array(
                [
                    {"pagerank": 2.0, "spam": 0.5},
                    {"pagerank": 8.0},
                    {"spam": 4.0},
                    None,
                    {"pagerank": 1.0, "spam": 1.0},
                    {},
                ],
                pa.map_(pa.string(), pa.float64()),
            ),
        }
    )
    p = str(tmp_path_factory.mktemp("rfs_pages") / "pages.parquet")
    pq2.write_table(t, p)
    idx = str(tmp_path_factory.mktemp("rfs_idx") / "index")
    m = build_index(
        p, idx, num_partitions=2, analyzer="standard", source="text",
        fields=[FieldSpec("feats", source="feats", analyzer="rank_features")],
    )
    assert m["fields"]["feats"]["analyzer"] == "rank_features"
    s = LocalSearcher(idx)
    hits = s.search_query(
        {"rank_feature": {"field": "feats.pagerank",
                          "saturation": {"pivot": 2.0}}}, k=10)
    got = {h["url"]: h["score"] for h in hits}
    exp = {"d0.example/0": 2.0 / 4.0, "d1.example/1": 8.0 / 10.0,
           "d4.example/4": 1.0 / 3.0}
    assert set(got) == set(exp)
    for u in got:
        assert got[u] == pytest.approx(exp[u], rel=1e-6)
    # the other feature resolves independently
    assert s.count({"rank_feature": {"field": "feats.spam"}}) == 3
    # unknown feature of a known plural field -> no matches, no error
    assert s.count({"rank_feature": {"field": "feats.nope"}}) == 0
