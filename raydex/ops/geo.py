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
    # pack 5 bits per base-32 character
    chunks = bits.reshape(len(lat), precision, 5)
    weights = np.array([16, 8, 4, 2, 1], dtype=np.int64)
    codes = (chunks * weights).sum(axis=2)
    return ["".join(_GEOHASH32[c] for c in row) for row in codes]


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
