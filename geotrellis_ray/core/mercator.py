"""LatLng (EPSG:4326) <-> WebMercator (EPSG:3857), closed form, vectorized.

The only CRS pair the corpus needs (SURVEY.md §1.1 "CRS / proj4": full proj4
is out of scope; reference counterpart `ref:proj4/.../CRS.scala` +
`ref:vector/.../reproject/Reproject.scala`, L:unverified — /root/reference
empty at survey time).
"""

from __future__ import annotations

import numpy as np

R = 6378137.0
WORLD = 20037508.342789244  # pi * R — WebMercator half-world extent
MAX_LAT = 85.05112878


def latlng_to_webmercator(lat, lon):
    """Vectorized forward projection. Inputs clamped to the mercator-safe
    latitude band so poles never produce inf."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    lon = np.asarray(lon, dtype=np.float64)
    x = R * np.radians(lon)
    y = R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_latlng(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R)) - np.pi / 2.0)
    return lat, lon


def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters (vectorized, broadcasts)."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(v, dtype=np.float64)) for v in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * R * np.arcsin(np.sqrt(a))
