"""boolean / ip / range field types (BooleanFieldMapper,
IpFieldMapper, RangeFieldMapper): doc-values storage, term queries
(bool literal, exact IP, CIDR, range-contains-point), range queries
(IP bounds, interval relations), can-match stats, and a pandas oracle."""

import ipaddress

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index
from raydex.index.segment import FieldSpec
from raydex.search.scatter import LocalSearcher, RaySearcher

N = 120


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    rng = np.random.default_rng(11)
    ips = [f"10.{i % 4}.{(i * 7) % 256}.{(i * 13) % 256}"
           for i in range(N)]
    lo = rng.integers(0, 500, N)
    hi = lo + rng.integers(1, 50, N)
    t = pa.table({
        "url": pa.array([f"u{i:03d}.example" for i in range(N)]),
        "warc_ts": pa.array(np.arange(N, dtype="int64"),
                            pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array([f"doc {i} data body" for i in range(N)],
                         pa.large_string()),
        "active": pa.array([i % 3 == 0 for i in range(N)]),
        "addr": pa.array(ips),
        "span": pa.array([{"gte": int(a), "lte": int(b)}
                          for a, b in zip(lo, hi)],
                         pa.struct([("gte", pa.int64()),
                                    ("lte", pa.int64())])),
    })
    p = str(tmp_path_factory.mktemp("ft_pages") / "pages.parquet")
    pq.write_table(t, p)
    d = str(tmp_path_factory.mktemp("ft_idx") / "index")
    build_index(p, d, num_partitions=2, analyzer="standard",
                source="text",
                fields=[FieldSpec("active", source="active",
                                  analyzer="boolean"),
                        FieldSpec("addr", source="addr", analyzer="ip"),
                        FieldSpec("span", source="span",
                                  analyzer="long_range")])
    rows = [{"url": f"u{i:03d}.example", "active": i % 3 == 0,
             "addr": ips[i], "lo": int(lo[i]), "hi": int(hi[i])}
            for i in range(N)]
    return d, rows


def _urls(hits):
    return sorted(h["url"] for h in hits)


def test_boolean_term(idx):
    d, rows = idx
    s = LocalSearcher(d)
    want_true = sorted(r["url"] for r in rows if r["active"])
    for lit in (True, "true"):
        assert _urls(s.search_query({"term": {"active": lit}},
                                    k=N)) == want_true
    assert s.count({"term": {"active": False}}) == N - len(want_true)


def test_ip_term_cidr_and_range(idx):
    d, rows = idx
    s = LocalSearcher(d)
    # exact
    assert _urls(s.search_query({"term": {"addr": rows[5]["addr"]}},
                                k=N)) == [
        r["url"] for r in rows if r["addr"] == rows[5]["addr"]]
    # CIDR /16 over the second octet
    want = sorted(r["url"] for r in rows
                  if ipaddress.ip_address(r["addr"]) in
                  ipaddress.ip_network("10.1.0.0/16"))
    assert want  # the fixture plants octet-1 values 0..3
    assert _urls(s.search_query({"term": {"addr": "10.1.0.0/16"}},
                                k=N)) == want
    # numeric range over dotted-quad bounds
    lo, hi = "10.0.0.0", "10.1.255.255"
    want = sorted(r["url"] for r in rows
                  if int(ipaddress.ip_address(lo)) <=
                  int(ipaddress.ip_address(r["addr"])) <=
                  int(ipaddress.ip_address(hi)))
    got = s.search_query({"range": {"addr": {"gte": lo, "lte": hi}}},
                         k=N)
    assert _urls(got) == want


def test_range_field_relations(idx):
    d, rows = idx
    s = LocalSearcher(d)
    # term = point containment
    point = 250
    want = sorted(r["url"] for r in rows if r["lo"] <= point <= r["hi"])
    assert _urls(s.search_query({"term": {"span": str(point)}},
                                k=N)) == want
    qlo, qhi = 100, 300
    rel_oracle = {
        "intersects": lambda r: r["lo"] <= qhi and r["hi"] >= qlo,
        "within": lambda r: r["lo"] >= qlo and r["hi"] <= qhi,
        "contains": lambda r: r["lo"] <= qlo and r["hi"] >= qhi,
    }
    for rel, pred in rel_oracle.items():
        want = sorted(r["url"] for r in rows if pred(r))
        got = s.search_query(
            {"range": {"span": {"gte": qlo, "lte": qhi,
                                "relation": rel}}}, k=N)
        assert _urls(got) == want, rel


def test_bool_compose_and_ray_parity(idx):
    d, rows = idx
    s = LocalSearcher(d)
    q = {"bool": {"filter": [
        {"term": {"active": True}},
        {"term": {"addr": "10.0.0.0/15"}},
        {"range": {"span": {"gte": 0, "lte": 600}}},
    ]}}
    want = sorted(
        r["url"] for r in rows
        if r["active"]
        and ipaddress.ip_address(r["addr"]) in
        ipaddress.ip_network("10.0.0.0/15"))
    local = s.search_query(q, k=N)
    assert _urls(local) == want
    rs = RaySearcher(d, num_actors=2)
    try:
        assert rs.search_query(q, k=N) == local
    finally:
        rs.shutdown()


def test_manifest_bounds_for_can_match(idx):
    """ip/boolean/range fields record per-segment min/max so range
    can-match has an axis to skip on; incomparable bounds never skip."""
    import json
    import os

    from raydex.search.query import RangeQ, segment_can_match

    d, rows = idx
    s = LocalSearcher(d)
    r = s.group.readers[0]
    man = r.manifest
    assert "min_addr" in man and "max_addr" in man
    assert "min_span" in man and "max_span" in man
    assert man["min_span"] <= man["max_span"]
    # dotted-quad literal vs int stats: incomparable -> never skip
    assert segment_can_match(man, [RangeQ(fld="addr", gte="10.0.0.0")])
    # numeric bound beyond the segment max: skip
    assert not segment_can_match(
        man, [RangeQ(fld="span", gte=man["max_span"] + 1)])


def test_numeric_variants_and_version(ray_session, tmp_path):
    """float/half_float quantization, byte/short/integer range
    rejection, unsigned_long, binary blobs in _source, and the
    version field's semver ordering (1.10.0 > 1.9.0)."""
    from raydex.index.segment import version_sort_key

    n = 20
    vers = [f"1.{i}.0" for i in range(n)]  # 1.0.0 .. 1.19.0
    t = pa.table({
        "url": pa.array([f"v{i:02d}.example" for i in range(n)]),
        "warc_ts": pa.array(np.arange(n, dtype="int64"),
                            pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array([f"pkg {i} release" for i in range(n)],
                         pa.large_string()),
        "score_f": pa.array(np.linspace(0, 1, n) + 1e-9),
        "score_h": pa.array(np.linspace(0, 1000, n) + 0.123),
        "big": pa.array((2**63 + np.arange(n).astype(np.uint64))
                        .astype(np.uint64), pa.uint64()),
        "blob": pa.array([bytes([i, i + 1]) for i in range(n)],
                         pa.binary()),
        "ver": pa.array(vers),
        "tiny": pa.array(np.arange(n, dtype="int64") - 10),
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, num_partitions=1, analyzer="standard",
                source="text",
                fields=[FieldSpec("score_f", source="score_f",
                                  analyzer="float"),
                        FieldSpec("score_h", source="score_h",
                                  analyzer="half_float"),
                        FieldSpec("big", source="big",
                                  analyzer="unsigned_long"),
                        FieldSpec("blob", source="blob",
                                  analyzer="binary"),
                        FieldSpec("ver", source="ver",
                                  analyzer="version"),
                        FieldSpec("tiny", source="tiny",
                                  analyzer="byte")])
    s = LocalSearcher(idx)
    r = s.group.readers[0]
    # float32 / float16 quantization applied at index time
    assert np.allclose(r.doc_values["score_f"],
                       (np.linspace(0, 1, n) + 1e-9).astype(np.float32))
    assert np.allclose(r.doc_values["score_h"],
                       (np.linspace(0, 1000, n) + 0.123)
                       .astype(np.float16).astype(np.float64))
    # unsigned_long holds values beyond int64
    assert int(r.doc_values["big"].max()) == 2**63 + n - 1
    # binary surfaces through the fetch phase
    h = s.search_query({"match": {"text": "release"}}, k=1,
                       source=["blob"])[0]
    assert isinstance(h["_source"]["blob"], bytes)
    # version: semver range (1.9.0 < 1.10.0) + exact term
    got = s.search_query(
        {"range": {"ver": {"gte": "1.9.0", "lte": "1.10.0"}}}, k=n)
    assert sorted(h["url"] for h in got) == ["v09.example",
                                             "v10.example"]
    assert [h["url"] for h in s.search_query(
        {"term": {"ver": "1.15.0"}}, k=5)] == ["v15.example"]
    assert version_sort_key("2.0.0-alpha") < version_sort_key("2.0.0.1")
    # byte bounds: out-of-range value rejects at build
    bad = pa.table({
        "url": pa.array(["x.example"]),
        "warc_ts": pa.array([0], pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array(["body"], pa.large_string()),
        "tiny": pa.array([300], pa.int64()),
    })
    pb = str(tmp_path / "bad.parquet")
    pq.write_table(bad, pb)
    with pytest.raises(Exception, match="out of range"):
        build_index(pb, str(tmp_path / "bad_idx"), num_partitions=1,
                    analyzer="standard", source="text",
                    fields=[FieldSpec("tiny", source="tiny",
                                      analyzer="byte")])
