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
