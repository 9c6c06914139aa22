"""Pre-aggregated / constant field mappers (x-pack
mapper-constant-keyword, mapper-aggregate-metric, analytics histogram
field): storage round-trip + query semantics + agg recombination."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index
from raydex.index.segment import FieldSpec
from raydex.search.scatter import LocalSearcher

N = 24


def _table():
    ids = np.arange(N)
    am = [json.dumps({"min": float(i % 5), "max": float(i % 5 + i % 3),
                      "sum": float((i % 5) * 2 + i % 3),
                      "value_count": int(i % 3 + 1)}) for i in ids]
    hst = [json.dumps({"values": [float(i % 4), float(i % 4 + 2)],
                       "counts": [int(1 + i % 2), 2]}) for i in ids]
    return pa.table({
        "url": pa.array([f"d/{i}" for i in ids]),
        "warc_ts": pa.array(ids.astype("int64")).cast(pa.timestamp("us")),
        "text": pa.array([f"doc {'even' if i % 2 == 0 else 'odd'} body"
                          for i in ids], pa.large_string()),
        "dc": pa.array(["logs-prod"] * N),
        "am": pa.array(am),
        "hst": pa.array(hst),
    })


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pre") / "pages.parquet")
    pq.write_table(_table(), p)
    idx = str(tmp_path_factory.mktemp("pre_idx") / "index")
    build_index(p, idx, num_partitions=2, analyzer="standard",
                fields=[
                    FieldSpec("dc", source="dc",
                              analyzer="constant_keyword"),
                    FieldSpec("am", source="am",
                              analyzer="aggregate_metric_double",
                              default_metric="max"),
                    FieldSpec("hst", source="hst", analyzer="histogram"),
                ])
    return idx


def test_constant_keyword_all_or_none(built):
    s = LocalSearcher(built)
    assert s.count({"term": {"dc": "logs-prod"}}) == N
    assert s.count({"term": {"dc": "logs-dev"}}) == 0
    # terms agg rides the generic doc-values path: one bucket
    a = s.search_aggs({"match_all": {}},
                      {"t": {"terms": {"field": "dc"}}})["aggregations"]
    assert [(b["key"], b["doc_count"]) for b in a["t"]["buckets"]] == \
        [("logs-prod", N)]


def test_constant_keyword_conflict_rejected(ray_session, tmp_path):
    t = _table().set_column(
        3, "dc", pa.array(["a"] * (N - 1) + ["b"]))
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    with pytest.raises(Exception, match="conflicting"):
        build_index(p, str(tmp_path / "idx"), num_partitions=1,
                    analyzer="standard",
                    fields=[FieldSpec("dc", source="dc",
                                      analyzer="constant_keyword")])


def test_aggregate_metric_double_queries_and_aggs(built):
    s = LocalSearcher(built)
    ids = np.arange(N)
    mx = ids % 5 + ids % 3
    # term/range on the default_metric (max) sub-column
    assert s.count({"term": {"am": str(4.0)}}) == int((mx == 4).sum())
    assert s.count({"range": {"am": {"gte": 4}}}) == int((mx >= 4).sum())
    a = s.search_aggs(
        {"match": {"text": "even"}},
        {"s": {"sum": {"field": "am"}}, "mn": {"min": {"field": "am"}},
         "mxa": {"max": {"field": "am"}}, "vc": {"value_count": {"field": "am"}},
         "av": {"avg": {"field": "am"}}})["aggregations"]
    sel = ids % 2 == 0
    t_sum = float(((ids % 5) * 2 + ids % 3)[sel].sum())
    t_vc = int((ids % 3 + 1)[sel].sum())
    assert a["s"]["value"] == t_sum
    assert a["mn"]["value"] == float((ids % 5)[sel].min())
    assert a["mxa"]["value"] == float(mx[sel].max())
    assert a["vc"]["value"] == t_vc
    assert abs(a["av"]["value"] - t_sum / t_vc) < 1e-12


def test_histogram_field_aggs(built):
    s = LocalSearcher(built)
    ids = np.arange(N)
    v1, v2 = (ids % 4).astype(float), (ids % 4 + 2).astype(float)
    c1, c2 = (1 + ids % 2).astype(float), np.full(N, 2.0)
    a = s.search_aggs(
        {"match_all": {}},
        {"s": {"sum": {"field": "hst"}},
         "vc": {"value_count": {"field": "hst"}},
         "mn": {"min": {"field": "hst"}},
         "mx": {"max": {"field": "hst"}},
         "p": {"percentiles": {"field": "hst"}}})["aggregations"]
    assert a["s"]["value"] == float((v1 * c1 + v2 * c2).sum())
    assert a["vc"]["value"] == int((c1 + c2).sum())
    assert a["mn"]["value"] == 0.0
    assert a["mx"]["value"] == 5.0
    # percentile median within the weighted value span
    med = a["p"]["values"]["50.0"] if "values" in a["p"] else None
    if med is not None:
        assert 0.0 <= med <= 5.0


def test_field_specs_roundtrip():
    spec = FieldSpec("am", source="am",
                     analyzer="aggregate_metric_double",
                     default_metric="sum")
    again = FieldSpec.from_json(spec.to_json())
    assert again.default_metric == "sum"


def test_preagg_fields_survive_merge(ray_session, tmp_path):
    """constant_keyword / aggregate_metric_double / histogram columns
    (incl. the list-valued histogram sub-columns) ride the docs.parquet
    merge path intact: term/range counts and recombined metric aggs are
    unchanged after a full per-partition merge."""
    from raydex.index.build import load_index_manifest
    from raydex.index.merge import merge_partition_segments

    ids = np.arange(40)
    t = pa.table({
        "url": pa.array([f"d/{i}" for i in ids]),
        "warc_ts": pa.array(ids.astype("int64")).cast(pa.timestamp("us")),
        "text": pa.array([f"doc {i} body" for i in ids],
                         pa.large_string()),
        "am": pa.array([json.dumps(
            {"min": float(i % 5), "max": float(i % 5 + 1),
             "sum": float(i % 5) * 2 + 1, "value_count": 2})
            for i in ids]),
        "hst": pa.array([json.dumps({"values": [float(i % 3)],
                                     "counts": [2]}) for i in ids]),
        "dc": pa.array(["corpus-x"] * 40),
    })
    p = str(tmp_path / "p.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=2, analyzer="standard",
                max_docs_per_segment=8,
                fields=[
                    FieldSpec("am", source="am",
                              analyzer="aggregate_metric_double",
                              default_metric="max"),
                    FieldSpec("hst", source="hst", analyzer="histogram"),
                    FieldSpec("dc", source="dc",
                              analyzer="constant_keyword"),
                ])

    def probe(s):
        a = s.search_aggs(
            {"match_all": {}},
            {"s": {"sum": {"field": "am"}},
             "h": {"sum": {"field": "hst"}},
             "v": {"value_count": {"field": "hst"}}})["aggregations"]
        return (s.count({"term": {"dc": "corpus-x"}}),
                s.count({"range": {"am": {"gte": 4}}}),
                a["s"]["value"], a["h"]["value"], a["v"]["value"])

    s = LocalSearcher(idx)
    before = probe(s)
    assert len(s.seg_dirs) > 2
    m = load_index_manifest(idx)
    plan: dict = {}
    for r in m["segments"]:
        plan.setdefault(r["part"], []).append(r["seg_id"])
    merge_partition_segments(idx, plan, num_buckets=2)
    s2 = LocalSearcher(idx)
    assert len(s2.seg_dirs) == 2
    assert probe(s2) == before == (40, 16, 200.0, 78.0, 80)
