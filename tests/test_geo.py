"""Geo tier: geo_point field type, geo_bounding_box / geo_distance
queries, geo_bounds / geo_centroid / geotile_grid / geohash_grid /
geo_distance aggregations — python-oracle checked, with canonical
test vectors for the hash/tile/haversine math and scatter parity."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydex.index.build import build_index
from raydex.index.segment import FieldSpec
from raydex.ops.geo import (
    geohash_encode,
    geotile_xy,
    haversine_m,
    parse_distance_m,
)
from raydex.search.scatter import LocalSearcher, RaySearcher

N = 200


def test_geo_math_canonical_vectors():
    # geohash: the canonical Niemeyer example
    assert geohash_encode([57.64911], [10.40744], 11) == ["u4pruydqqvj"]
    # OSM slippy tile for Chicago at z7
    x, y = geotile_xy([41.85], [-87.65], 7)
    assert (int(x[0]), int(y[0])) == (32, 47)
    # haversine Paris-London ~343.6 km; one equatorial degree ~111.195km
    assert float(haversine_m(48.8566, 2.3522,
                             51.5074, -0.1278)) == pytest.approx(
        343_556, rel=1e-3)
    assert float(haversine_m(0, 0, 0, 1)) == pytest.approx(111_195,
                                                           rel=1e-3)
    assert parse_distance_m("2.5km") == 2500.0
    assert parse_distance_m(300) == 300.0


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    rng = np.random.default_rng(3)
    lat = rng.uniform(40.0, 60.0, N).round(4)
    lon = rng.uniform(-10.0, 20.0, N).round(4)
    t = pa.table({
        "url": pa.array([f"g{i:03d}.example" for i in range(N)]),
        "warc_ts": pa.array(np.arange(N, dtype="int64"),
                            pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array([f"place {i} body" for i in range(N)],
                         pa.large_string()),
        "loc": pa.array([{"lat": float(a), "lon": float(b)}
                         for a, b in zip(lat, lon)],
                        pa.struct([("lat", pa.float64()),
                                   ("lon", pa.float64())])),
    })
    p = str(tmp_path_factory.mktemp("geo_pages") / "pages.parquet")
    pq.write_table(t, p)
    d = str(tmp_path_factory.mktemp("geo_idx") / "index")
    build_index(p, d, num_partitions=2, analyzer="standard",
                source="text",
                fields=[FieldSpec("loc", source="loc",
                                  analyzer="geo_point")])
    return d, lat, lon


def test_geo_bounding_box_query(idx):
    d, lat, lon = idx
    s = LocalSearcher(d)
    q = {"geo_bounding_box": {"loc": {
        "top_left": {"lat": 55.0, "lon": -5.0},
        "bottom_right": {"lat": 45.0, "lon": 10.0}}}}
    want = sorted(f"g{i:03d}.example" for i in range(N)
                  if 45.0 <= lat[i] <= 55.0 and -5.0 <= lon[i] <= 10.0)
    got = sorted(h["url"] for h in s.search_query(q, k=N))
    assert got == want and want
    # string lat,lon corner form
    q2 = {"geo_bounding_box": {"loc": {"top_left": "55.0,-5.0",
                                       "bottom_right": "45.0,10.0"}}}
    assert s.count(q2) == len(want)


def test_geo_distance_query(idx):
    d, lat, lon = idx
    s = LocalSearcher(d)
    origin = {"lat": 50.0, "lon": 5.0}
    q = {"geo_distance": {"distance": "500km", "loc": origin}}
    dist = haversine_m(50.0, 5.0, lat, lon)
    want = sorted(f"g{i:03d}.example" for i in range(N)
                  if dist[i] <= 500_000)
    got = sorted(h["url"] for h in s.search_query(q, k=N))
    assert got == want and want


def test_geo_aggs_vs_oracle(idx):
    d, lat, lon = idx
    s = LocalSearcher(d)
    a = s.search_aggs({"match_all": {}}, {
        "bounds": {"geo_bounds": {"field": "loc"}},
        "centroid": {"geo_centroid": {"field": "loc"}},
        "tiles": {"geotile_grid": {"field": "loc", "precision": 4}},
        "hashes": {"geohash_grid": {"field": "loc", "precision": 2}},
        "rings": {"geo_distance": {
            "field": "loc", "origin": {"lat": 50.0, "lon": 5.0},
            "unit": "km",
            "ranges": [{"to": 300}, {"from": 300, "to": 800},
                       {"from": 800}]},
            "aggs": {"n": {"value_count": {"field": "dl"}}}},
    })["aggregations"]

    b = a["bounds"]["bounds"]
    assert b["top_left"]["lat"] == lat.max()
    assert b["top_left"]["lon"] == lon.min()
    assert b["bottom_right"]["lat"] == lat.min()
    assert b["bottom_right"]["lon"] == lon.max()
    c = a["centroid"]
    assert c["count"] == N
    assert c["location"]["lat"] == pytest.approx(lat.mean())
    assert c["location"]["lon"] == pytest.approx(lon.mean())

    from collections import Counter

    x, y = geotile_xy(lat, lon, 4)
    want_tiles = Counter(f"4/{int(a_)}/{int(b_)}"
                         for a_, b_ in zip(x, y))
    got_tiles = {t["key"]: t["doc_count"] for t in a["tiles"]["buckets"]}
    assert got_tiles == dict(want_tiles)

    want_hash = Counter(geohash_encode(lat, lon, 2))
    got_hash = {t["key"]: t["doc_count"] for t in a["hashes"]["buckets"]}
    assert got_hash == dict(want_hash)

    dist_km = haversine_m(50.0, 5.0, lat, lon) / 1000.0
    ring_want = [int((dist_km < 300).sum()),
                 int(((dist_km >= 300) & (dist_km < 800)).sum()),
                 int((dist_km >= 800).sum())]
    rings = a["rings"]["buckets"]
    assert [r["doc_count"] for r in rings] == ring_want
    assert [r["n"]["value"] for r in rings] == ring_want  # sub-agg
    assert rings[1]["from"] == 300.0 and rings[1]["to"] == 800.0


def test_geo_scatter_parity_and_compose(idx):
    d, lat, lon = idx
    s = LocalSearcher(d)
    q = {"bool": {"filter": [
        {"geo_distance": {"distance": "900km",
                          "loc": {"lat": 50.0, "lon": 5.0}}},
        {"geo_bounding_box": {"loc": {
            "top_left": {"lat": 60.0, "lon": -10.0},
            "bottom_right": {"lat": 48.0, "lon": 20.0}}}},
    ]}}
    spec = {"tiles": {"geotile_grid": {"field": "loc", "precision": 3}},
            "bounds": {"geo_bounds": {"field": "loc"}}}
    local_hits = s.search_query(q, k=N)
    local_aggs = s.search_aggs(q, spec)["aggregations"]
    rs = RaySearcher(d, num_actors=2)
    try:
        assert rs.search_query(q, k=N) == local_hits
        assert rs.search_aggs(q, spec)["aggregations"] == local_aggs
    finally:
        rs.shutdown()


def test_geo_distance_sort(idx):
    """GeoDistanceSortBuilder: hits ordered by haversine distance from
    the origin, sort_value in the requested unit, search_after cursor
    pages without overlap, Local/Ray parity."""
    d, lat, lon = idx
    s = LocalSearcher(d)
    spec = {"_geo_distance": {"loc": {"lat": 50.0, "lon": 5.0},
                              "unit": "km"}}
    hits = s.search_sorted({"match_all": {}}, sort_field=spec,
                           order="asc", k=10)
    dist_km = haversine_m(50.0, 5.0, lat, lon) / 1000.0
    want = np.sort(dist_km)[:10]
    got = np.array([h["sort_value"] for h in hits])
    assert np.allclose(got, want)
    ids = [int(h["url"][1:4]) for h in hits]
    assert [round(dist_km[i], 6) for i in ids] == [
        round(v, 6) for v in got]
    # page 2 via the cursor: next 10, no overlap
    last = hits[-1]
    page2 = s.search_sorted(
        {"match_all": {}}, sort_field=spec, order="asc", k=10,
        search_after=(last["sort_value"], last["ordinal"],
                      last["docid"]))
    assert np.allclose([h["sort_value"] for h in page2],
                       np.sort(dist_km)[10:20])
    assert not set(h["url"] for h in hits) & set(
        h["url"] for h in page2)
    # desc order + Ray parity
    far = s.search_sorted({"match_all": {}}, sort_field=spec,
                          order="desc", k=5)
    assert np.allclose([h["sort_value"] for h in far],
                       np.sort(dist_km)[::-1][:5])
    rs = RaySearcher(d, num_actors=2)
    try:
        assert rs.search_sorted({"match_all": {}}, sort_field=spec,
                                order="asc", k=10) == hits
    finally:
        rs.shutdown()


# ---------------------------------------------------------------- shapes


@pytest.fixture(scope="module")
def shape_idx(ray_session, tmp_path_factory):
    """geo_shape field: 60 envelope docs on a deterministic grid plus a
    triangle, a holed polygon, a linestring and a point doc — exercises
    the generic relate kernels, not just rectangles."""
    import json

    docs = []
    for i in range(60):
        minlon = float((i * 7) % 50)
        minlat = float((i * 11) % 40)
        docs.append({"type": "envelope",
                     "coordinates": [[minlon, minlat + 4.0],
                                     [minlon + 6.0, minlat]]})
    docs.append({"type": "Polygon",
                 "coordinates": [[[0, 0], [30, 0], [0, 30], [0, 0]]]})
    docs.append({"type": "Polygon",
                 "coordinates": [[[10, 10], [40, 10], [40, 40], [10, 40],
                                  [10, 10]],
                                 [[20, 20], [30, 20], [30, 30], [20, 30],
                                  [20, 20]]]})
    docs.append({"type": "LineString",
                 "coordinates": [[-20, -20], [60, 55]]})
    docs.append({"type": "Point", "coordinates": [12.5, 12.5]})
    n = len(docs)
    t = pa.table({
        "url": pa.array([f"s{i:03d}" for i in range(n)]),
        "warc_ts": pa.array(np.arange(n, dtype="int64"),
                            pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array([f"shape {i}" for i in range(n)],
                         pa.large_string()),
        "shp": pa.array([json.dumps(s) for s in docs]),
    })
    p = str(tmp_path_factory.mktemp("shape_pages") / "pages.parquet")
    pq.write_table(t, p)
    d = str(tmp_path_factory.mktemp("shape_idx") / "index")
    build_index(p, d, num_partitions=2, analyzer="standard",
                source="text",
                fields=[FieldSpec("shp", source="shp",
                                  analyzer="geo_shape")])
    return d, docs


def test_geo_shape_relations_vs_scalar_oracle(shape_idx):
    from raydex.ops.geo import shape_relation

    d, docs = shape_idx
    s = LocalSearcher(d)
    queries = [
        {"type": "envelope", "coordinates": [[5.0, 25.0], [35.0, 5.0]]},
        {"type": "Polygon",
         "coordinates": [[[0, 0], [25, 0], [25, 25], [0, 25], [0, 0]]]},
        {"type": "Point", "coordinates": [12.5, 12.5]},
        {"type": "LineString", "coordinates": [[0, 45], [55, 0]]},
    ]
    for qs in queries:
        for rel in ("intersects", "disjoint", "within", "contains"):
            if rel in ("within", "contains") and \
                    qs["type"] in ("Point", "LineString"):
                if rel == "within":
                    continue  # needs polygonal target
            q = {"geo_shape": {"shp": {"shape": qs, "relation": rel}}}
            want = sorted(
                f"s{i:03d}" for i, ds in enumerate(docs)
                if shape_relation(ds, qs, rel))
            got = sorted(h["url"] for h in s.search_query(q, k=100))
            assert got == want, (qs["type"], rel)
    # default relation is intersects
    q = {"geo_shape": {"shp": {"shape": queries[0]}}}
    assert s.count(q) == s.count(
        {"geo_shape": {"shp": {"shape": queries[0],
                               "relation": "intersects"}}})
    # composable in bool
    both = s.count({"bool": {"must": [
        {"geo_shape": {"shp": {"shape": queries[0]}}},
        {"match": {"text": "shape"}}]}})
    assert both == s.count({"geo_shape": {"shp": {"shape": queries[0]}}})


def test_geo_shape_scatter_parity(shape_idx):
    d, docs = shape_idx
    s = LocalSearcher(d)
    qs = {"type": "envelope", "coordinates": [[5.0, 25.0], [35.0, 5.0]]}
    q = {"geo_shape": {"shp": {"shape": qs, "relation": "within"}}}
    rs = RaySearcher(d, num_actors=2)
    try:
        assert sorted(h["url"] for h in rs.search_query(q, k=100)) == \
            sorted(h["url"] for h in s.search_query(q, k=100))
    finally:
        rs.shutdown()


def test_geo_polygon_query(idx):
    from raydex.ops.geo import points_in_polygon_mask

    d, lat, lon = idx
    s = LocalSearcher(d)
    poly = [{"lat": 40.0, "lon": -10.0}, {"lat": 60.0, "lon": 5.0},
            {"lat": 40.0, "lon": 20.0}]
    q = {"geo_polygon": {"loc": {"points": poly}}}
    want_mask = points_in_polygon_mask(lat, lon, poly)
    want = sorted(f"g{i:03d}.example" for i in range(N) if want_mask[i])
    got = sorted(h["url"] for h in s.search_query(q, k=N))
    assert got == want and 0 < len(want) < N
    # [lon, lat] array form parses identically
    q2 = {"geo_polygon": {"loc": {"points": [
        [-10.0, 40.0], [5.0, 60.0], [20.0, 40.0]]}}}
    assert s.count(q2) == len(want)


def test_geohash_decode_roundtrip_random():
    """decode(encode(p)) bounds always contain p; the cell center
    re-encodes to the same hash (pure-python, seeded grid of points)."""
    import numpy as np

    from raydex.ops.geo import geohash_decode_bounds, geohash_encode

    rng = np.random.default_rng(11)
    lat = rng.uniform(-85, 85, 50)
    lon = rng.uniform(-180, 180, 50)
    for prec in (1, 3, 5):
        hs = geohash_encode(lat, lon, precision=prec)
        for la, lo, h in zip(lat, lon, hs):
            a, b, c, d = geohash_decode_bounds(h)
            assert a <= la < b or la == b
            assert c <= lo < d or lo == d
            assert geohash_encode([(a + b) / 2], [(c + d) / 2],
                                  precision=prec)[0] == h


def test_geohash_closed_form_equals_bisection():
    """The z8 driver oracle's closed-form floor((x-lo)/range * 2^bits)
    + bit-weave must equal the engine's >=-midpoint bisection for
    arbitrary points (validates the SQL-mirror assumption beyond the
    derived 0.01-degree grid)."""
    import numpy as np

    from raydex.ops.geo import geohash_encode

    _GH32 = "0123456789bcdefghjkmnpqrstuvwxyz"

    def closed_form(lat, lon, precision):
        nbits = precision * 5
        lon_bits = (nbits + 1) // 2
        lat_bits = nbits // 2
        loni = min(int((lon + 180.0) / 360.0 * (1 << lon_bits)),
                   (1 << lon_bits) - 1)
        lati = min(int((lat + 90.0) / 180.0 * (1 << lat_bits)),
                   (1 << lat_bits) - 1)
        v = 0
        for j in range(lon_bits):
            v += ((loni >> (lon_bits - 1 - j)) & 1) << (nbits - 1 - 2 * j)
        for j in range(lat_bits):
            v += ((lati >> (lat_bits - 1 - j)) & 1) << (nbits - 2 - 2 * j)
        return "".join(_GH32[(v >> (5 * (precision - 1 - c))) & 31]
                       for c in range(precision))

    rng = np.random.default_rng(23)
    lat = rng.uniform(-90, 90, 200)
    lon = rng.uniform(-180, 180, 200)
    for prec in (1, 2, 4):
        got = geohash_encode(lat, lon, precision=prec)
        for la, lo, h in zip(lat, lon, got):
            assert closed_form(la, lo, prec) == h, (la, lo, prec)
