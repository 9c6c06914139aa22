"""Geo primitives: haversine distance, geohash, geotile (slippy map).

Reference: ``server/src/main/java/org/elasticsearch/common/geo/`` and
``index/mapper/GeoPointFieldMapper.java`` (lat/lon doc-values),
``search/aggregations/bucket/geogrid/`` (geohash_grid / geotile_grid).
All math re-derived from the public formulas: haversine great-circle
distance on the mean-radius sphere (the reference's ``SloppyMath
.haversinMeters`` uses the same mean earth radius), the Niemeyer
geohash base-32 bit interleave, and the OSM slippy-tile x/y/zoom
transform used by ``geotile_grid``. Everything vectorized over numpy
lat/lon arrays."""

from __future__ import annotations

import numpy as np

# mean earth radius in meters (GeoUtils.EARTH_MEAN_RADIUS)
EARTH_MEAN_RADIUS_M = 6371008.7714150598

_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters; inputs degrees (scalars or
    numpy arrays, broadcast)."""
    p1 = np.radians(np.asarray(lat1, dtype=np.float64))
    p2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dp = p2 - p1
    dl = np.radians(np.asarray(lon2, dtype=np.float64)
                    - np.asarray(lon1, dtype=np.float64))
    a = (np.sin(dp / 2.0) ** 2
         + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2)
    return 2.0 * EARTH_MEAN_RADIUS_M * np.arcsin(np.sqrt(
        np.clip(a, 0.0, 1.0)))


def parse_distance_m(d) -> float:
    """'10km' / '500m' / '3mi' / '1nmi' / numeric meters → meters (the
    reference's DistanceUnit grammar, common subset)."""
    if isinstance(d, (int, float)):
        return float(d)
    s = str(d).strip().lower()
    for suf, mul in (("nmi", 1852.0), ("km", 1000.0), ("mi", 1609.344),
                     ("ft", 0.3048), ("yd", 0.9144), ("cm", 0.01),
                     ("mm", 0.001), ("m", 1.0)):
        if s.endswith(suf):
            return float(s[: -len(suf)]) * mul
    return float(s)


def geotile_xy(lat, lon, zoom: int):
    """OSM slippy-tile (x, y) at ``zoom`` — the geotile_grid bucket key
    math (``GeoTileUtils.longEncode``). Latitude clamped to the
    web-mercator bounds like the reference."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.05112878,
                  85.05112878)
    lon = np.asarray(lon, dtype=np.float64)
    n = 1 << int(zoom)
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    rad = np.radians(lat)
    y = np.floor(
        (1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi)
        / 2.0 * n
    ).astype(np.int64)
    return np.clip(x, 0, n - 1), np.clip(y, 0, n - 1)


def geotile_keys(lat, lon, zoom: int) -> list[str]:
    x, y = geotile_xy(lat, lon, zoom)
    z = int(zoom)
    return [f"{z}/{int(a)}/{int(b)}" for a, b in zip(x, y)]


def geohash_encode(lat, lon, precision: int = 5) -> list[str]:
    """Vectorized Niemeyer geohash: interleaved lon/lat bisection bits,
    base-32 chunks."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    nbits = precision * 5
    # bit i (0-based, from the most significant): even -> lon, odd -> lat
    lat_lo = np.full(lat.shape, -90.0)
    lat_hi = np.full(lat.shape, 90.0)
    lon_lo = np.full(lon.shape, -180.0)
    lon_hi = np.full(lon.shape, 180.0)
    bits = np.zeros((len(lat), nbits), dtype=np.uint8)
    for i in range(nbits):
        if i % 2 == 0:
            mid = (lon_lo + lon_hi) / 2.0
            hi_side = lon >= mid
            bits[:, i] = hi_side
            lon_lo = np.where(hi_side, mid, lon_lo)
            lon_hi = np.where(hi_side, lon_hi, mid)
        else:
            mid = (lat_lo + lat_hi) / 2.0
            hi_side = lat >= mid
            bits[:, i] = hi_side
            lat_lo = np.where(hi_side, mid, lat_lo)
            lat_hi = np.where(hi_side, lat_hi, mid)
    # pack 5 bits per base-32 character, then assemble each row's hash
    # in ONE numpy byte-gather (no per-row string join)
    chunks = bits.reshape(len(lat), precision, 5)
    weights = np.array([16, 8, 4, 2, 1], dtype=np.int64)
    codes = (chunks * weights).sum(axis=2)
    lut = np.frombuffer(_GEOHASH32.encode(), dtype=np.uint8)
    flat = lut[codes].tobytes()
    step = precision
    return [flat[i:i + step].decode() for i in range(0, len(flat), step)]


def geohash_decode_bounds(gh: str):
    """(lat_lo, lat_hi, lon_lo, lon_hi) of a geohash cell — the inverse
    bit de-interleave of ``geohash_encode``."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True  # bit 0 is a lon bit
    for ch in gh:
        code = _GEOHASH32.index(ch)
        for shift in (16, 8, 4, 2, 1):
            hi_side = bool(code & shift)
            if even:
                mid = (lon_lo + lon_hi) / 2.0
                if hi_side:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2.0
                if hi_side:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lat_lo, lat_hi, lon_lo, lon_hi


def geohash_neighbors(gh: str) -> list[str]:
    """The 8 surrounding cells of a geohash (plus nothing for cells
    clipped at the poles; longitude wraps). Computed by re-encoding the
    center point displaced by one cell size in each direction — no
    lookup tables."""
    lat_lo, lat_hi, lon_lo, lon_hi = geohash_decode_bounds(gh)
    clat = (lat_lo + lat_hi) / 2.0
    clon = (lon_lo + lon_hi) / 2.0
    dlat = lat_hi - lat_lo
    dlon = lon_hi - lon_lo
    out = []
    for dy in (-1, 0, 1):
        la = clat + dy * dlat
        if la <= -90.0 or la >= 90.0:
            continue
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            lo = clon + dx * dlon
            if lo >= 180.0:
                lo -= 360.0
            elif lo < -180.0:
                lo += 360.0
            out.append(geohash_encode([la], [lo], precision=len(gh))[0])
    return sorted(set(out) - {gh})


def points_in_polygon_mask(lat, lon, points) -> np.ndarray:
    """Vectorized even-odd (PNPOLY) point-in-polygon over doc lat/lon
    arrays; ``points`` = [{"lat":..,"lon":..}] or [[lon, lat], ...]
    ring (closed or open). Used by the ``geo_polygon`` query
    (``GeoPolygonQueryBuilder``). Boundary points follow the PNPOLY
    half-open rule (exact interior/exterior; edges are measure-zero
    for float data)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    ring = []
    for p in points:
        if isinstance(p, dict):
            ring.append((float(p["lon"]), float(p["lat"])))
        else:
            ring.append((float(p[0]), float(p[1])))
    if len(ring) > 1 and ring[0] == ring[-1]:
        ring = ring[:-1]
    inside = np.zeros(len(lat), dtype=bool)
    j = len(ring) - 1
    for i in range(len(ring)):
        xi, yi = ring[i]
        xj, yj = ring[j]
        cond = (yi > lat) != (yj > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            xcross = (xj - xi) * (lat - yi) / (yj - yi) + xi
        inside ^= cond & (lon < xcross)
        j = i
    return inside


# --- exact shape geometry (geo_shape field + query relations) --------
# Shapes are GeoJSON-style dicts (Point/MultiPoint/LineString/
# MultiLineString/Polygon/MultiPolygon/GeometryCollection plus the
# reference's `envelope` [[minLon, maxLat], [maxLon, minLat]]).
# Coordinates are [lon, lat]. Relations use CLOSED-set semantics
# (touching boundaries intersect), the reference's Lucene
# Relation.INTERSECTS model. Dateline-crossing shapes are not split
# (documented deviation: LatLonShape tessellates across the dateline).


def _close_ring(r):
    r = [(float(x), float(y)) for x, y in r]
    if r and r[0] != r[-1]:
        r.append(r[0])
    return r


def decompose_shape(shape: dict):
    """→ (component_points, segments, polygons): one representative
    point per connected component, every boundary segment, and each
    polygon as a list of rings (outer first, then holes)."""
    pts, segs, polys = [], [], []

    def add_line(coords):
        cs = [(float(x), float(y)) for x, y in coords]
        pts.append(cs[0])
        segs.extend(zip(cs[:-1], cs[1:]))

    def add_poly(rings):
        rr = [_close_ring(r) for r in rings]
        for r in rr:
            segs.extend(zip(r[:-1], r[1:]))
        pts.append(rr[0][0])
        polys.append([r[:-1] for r in rr])

    def walk(s):
        t = str(s.get("type", "")).lower()
        c = s.get("coordinates")
        if t == "point":
            pts.append((float(c[0]), float(c[1])))
        elif t == "multipoint":
            pts.extend((float(x), float(y)) for x, y in c)
        elif t == "linestring":
            add_line(c)
        elif t == "multilinestring":
            for line in c:
                add_line(line)
        elif t == "polygon":
            add_poly(c)
        elif t == "multipolygon":
            for rings in c:
                add_poly(rings)
        elif t == "envelope":
            (minlon, maxlat), (maxlon, minlat) = c
            add_poly([[(minlon, minlat), (maxlon, minlat),
                       (maxlon, maxlat), (minlon, maxlat)]])
        elif t == "geometrycollection":
            for g in s.get("geometries", []):
                walk(g)
        else:
            raise ValueError(f"unsupported shape type {s.get('type')!r}")

    walk(shape)
    return pts, segs, polys


def shape_bbox(shape: dict):
    """(minlon, minlat, maxlon, maxlat) over every vertex."""
    pts, segs, polys = decompose_shape(shape)
    xs = [p[0] for p in pts] + [q[0] for s in segs for q in s]
    ys = [p[1] for p in pts] + [q[1] for s in segs for q in s]
    return min(xs), min(ys), max(xs), max(ys)


def _orient(a, b, c) -> float:
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _on_segment(p, a, b) -> bool:
    """p collinear-with and between a..b (closed)."""
    if _orient(a, b, p) != 0.0:
        return False
    return (min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= p[1] <= max(a[1], b[1]))


def _segments_intersect(a, b, c, d) -> bool:
    """Closed segment intersection incl. touching + collinear overlap:
    a proper straddle both ways, else any endpoint-on-segment touch."""
    o1, o2 = _orient(a, b, c), _orient(a, b, d)
    o3, o4 = _orient(c, d, a), _orient(c, d, b)
    if ((o1 > 0 and o2 < 0) or (o1 < 0 and o2 > 0)) and \
            ((o3 > 0 and o4 < 0) or (o3 < 0 and o4 > 0)):
        return True
    return (_on_segment(c, a, b) or _on_segment(d, a, b)
            or _on_segment(a, c, d) or _on_segment(b, c, d))


def _point_in_rings(p, rings) -> bool:
    """Closed even-odd containment: boundary counts as inside."""
    for r in rings:
        n = len(r)
        for i in range(n):
            if _on_segment(p, r[i], r[(i + 1) % n]):
                return True
    inside = False
    x, y = p
    for r in rings:
        n = len(r)
        j = n - 1
        for i in range(n):
            xi, yi = r[i]
            xj, yj = r[j]
            if (yi > y) != (yj > y) and \
                    x < (xj - xi) * (y - yi) / (yj - yi) + xi:
                inside = not inside
            j = i
    return inside


def _point_in_shape(p, parts) -> bool:
    pts, segs, polys = parts
    if any(p == q for q in pts):
        return True
    if any(_on_segment(p, a, b) for a, b in segs):
        return True
    return any(_point_in_rings(p, rings) for rings in polys)


def shapes_intersect(a: dict, b: dict) -> bool:
    """Closed-set A ∩ B ≠ ∅ (LatLonShape INTERSECTS analogue): any
    boundary segments cross/touch, or a connected component of one
    lies inside the other (one representative point per component
    suffices when no segments cross — Jordan)."""
    pa_, pb_ = decompose_shape(a), decompose_shape(b)
    for s1 in pa_[1]:
        for s2 in pb_[1]:
            if _segments_intersect(s1[0], s1[1], s2[0], s2[1]):
                return True
    if any(_point_in_shape(p, pb_) for p in pa_[0]):
        return True
    return any(_point_in_shape(p, pa_) for p in pb_[0])


def shape_within(a: dict, b: dict) -> bool:
    """A ⊆ B for a polygonal/envelope B (closed sets): every A vertex
    and every A segment midpoint contained in B, and no proper edge
    crossing (degenerate tangencies through B vertices are the
    documented epsilon caveat)."""
    pa_, pb_ = decompose_shape(a), decompose_shape(b)
    if not pb_[2]:
        # degenerate target (point/line B): A ⊆ B only if A has no
        # area and every A vertex/midpoint lies ON B (closed sets)
        if pa_[2]:
            return False
        verts = list(pa_[0])
        for s in pa_[1]:
            verts.extend([s[0], s[1],
                          ((s[0][0] + s[1][0]) / 2.0,
                           (s[0][1] + s[1][1]) / 2.0)])
        return all(
            any(p == q for q in pb_[0])
            or any(_on_segment(p, sa, sb) for sa, sb in pb_[1])
            for p in verts)
    verts = list(pa_[0])
    for s in pa_[1]:
        verts.extend([s[0], s[1],
                      ((s[0][0] + s[1][0]) / 2.0,
                       (s[0][1] + s[1][1]) / 2.0)])
    if not all(_point_in_shape(p, pb_) for p in verts):
        return False
    for s1 in pa_[1]:
        for s2 in pb_[1]:
            o1 = _orient(s1[0], s1[1], s2[0])
            o2 = _orient(s1[0], s1[1], s2[1])
            o3 = _orient(s2[0], s2[1], s1[0])
            o4 = _orient(s2[0], s2[1], s1[1])
            if o1 * o2 < 0 and o3 * o4 < 0:  # proper crossing
                return False
    return True


def shape_relation(doc_shape: dict, query_shape: dict,
                   relation: str) -> bool:
    """The four ``geo_shape`` query relations
    (``GeoShapeQueryBuilder``: intersects/disjoint/within/contains)."""
    r = relation.lower()
    if r == "intersects":
        return shapes_intersect(doc_shape, query_shape)
    if r == "disjoint":
        return not shapes_intersect(doc_shape, query_shape)
    if r == "within":
        return shape_within(doc_shape, query_shape)
    if r == "contains":
        return shape_within(query_shape, doc_shape)
    raise ValueError(f"unsupported geo_shape relation {relation!r}")


def bbox_mask(lat, lon, top: float, left: float, bottom: float,
              right: float) -> np.ndarray:
    """geo_bounding_box membership; a left > right box crosses the
    dateline (the reference's crossing semantics)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    m = (lat <= top) & (lat >= bottom)
    if left <= right:
        m &= (lon >= left) & (lon <= right)
    else:  # dateline crossing
        m &= (lon >= left) | (lon <= right)
    return m
