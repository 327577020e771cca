"""Proj4 parameter-string front-end: parse a ``+proj=...`` string into the
engine's projection kernels plus an optional ``+towgs84`` datum shift.

Covers the reference's proj-string CRS surface
(ref:proj4/src/main/scala/geotrellis/proj4/CRS.scala ``fromString``,
L:unverified — /root/reference empty) for the projection families this
engine implements: longlat, merc (spherical / web form), utm, tmerc, lcc,
aea, stere (polar), laea, sinu. Everything here is public knowledge — the
PROJ.4 parameter conventions (+proj, +ellps, +a, +b, +rf, +datum,
+towgs84, +lat_0, +lon_0, +lat_1, +lat_2, +lat_ts, +k/+k_0, +x_0, +y_0,
+zone, +south) as documented in the public PROJ manual, and the Snyder
formulas already in core/utm.py and core/conic.py.

A parsed CRS converts to/from WGS84 geographic coordinates:
``to_latlng(x, y)`` runs projection-inverse then the +towgs84 Helmert
(local datum -> WGS84); ``from_latlng(lat, lon)`` the reverse chain. With
no +towgs84 the local datum is treated as WGS84-compatible (the proj4
convention when the tag is absent).
"""

from __future__ import annotations

import math
from functools import lru_cache

from .utm import ELLIPSOIDS, TransverseMercator, helmert

# +datum shorthands: ellipsoid + implied towgs84 (public PROJ datum table)
_DATUMS = {
    "wgs84": ("wgs84", None),
    "nad83": ("grs80", None),  # identity towgs84 in PROJ
    "osgb36": ("airy1830", (446.448, -125.157, 542.06,
                            0.15, 0.247, 0.842, -20.489)),
}

# +ellps shorthands -> ELLIPSOIDS key
_ELLPS = {
    "wgs84": "wgs84",
    "grs80": "grs80",
    "airy": "airy1830",
    "intl": "intl1924",
}


def _parse_params(s: str) -> dict:
    out = {}
    for tok in s.split():
        if not tok.startswith("+"):
            raise ValueError(f"proj4 token must start with '+': {tok!r}")
        key, eq, val = tok[1:].partition("=")
        out[key.lower()] = val.lower() if eq else True
    return out


def _resolve_ellipsoid(p: dict) -> tuple[float, float, tuple | None]:
    """-> (a, rf, implied_towgs84). rf = math.inf for a sphere."""
    implied = None
    if "datum" in p:
        name, implied = _DATUMS.get(p["datum"], (None, None))
        if name is None:
            raise ValueError(f"unknown +datum={p['datum']!r}; have {sorted(_DATUMS)}")
        a, rf = ELLIPSOIDS[name]
        return a, rf, implied
    if "ellps" in p:
        name = _ELLPS.get(p["ellps"])
        if name is None:
            raise ValueError(f"unknown +ellps={p['ellps']!r}; have {sorted(_ELLPS)}")
        a, rf = ELLIPSOIDS[name]
        return a, rf, None
    if "a" in p:
        a = float(p["a"])
        if "rf" in p:
            return a, float(p["rf"]), None
        b = float(p.get("b", p["a"]))
        if b == a:
            return a, math.inf, None
        return a, a / (a - b), None
    # proj4's own default ellipsoid is WGS84
    a, rf = ELLIPSOIDS["wgs84"]
    return a, rf, None


def _f(p: dict, key: str, default: float = 0.0) -> float:
    return float(p.get(key, default))


class _LongLat:
    def forward(self, lat, lon):
        return lon, lat

    def inverse(self, x, y):
        return y, x


class Proj4CRS:
    """A parsed proj4 CRS: projection kernel + optional datum shift.

    ``to_latlng(x, y) -> (lat, lon)`` in WGS84;
    ``from_latlng(lat, lon) -> (x, y)`` in the projected CRS."""

    def __init__(self, proj, a: float, rf: float, towgs84: tuple | None):
        self.proj = proj
        self.a, self.rf = a, rf
        self.towgs84 = towgs84

    def to_latlng(self, x, y):
        lat, lon = self.proj.inverse(x, y)
        if self.towgs84 is not None:
            aw, rfw = ELLIPSOIDS["wgs84"]
            lat, lon = helmert(lat, lon, self.towgs84, self.a, self.rf, aw, rfw)
        return lat, lon

    def from_latlng(self, lat, lon):
        if self.towgs84 is not None:
            aw, rfw = ELLIPSOIDS["wgs84"]
            lat, lon = helmert(lat, lon, self.towgs84, aw, rfw, self.a, self.rf,
                               inverse=True)
        return self.proj.forward(lat, lon)


@lru_cache(maxsize=256)
def parse_proj4(s: str) -> Proj4CRS:
    p = _parse_params(s)
    if "proj" not in p or p["proj"] is True:
        raise ValueError(f"proj4 string needs +proj=<name>: {s!r}")
    kind = p["proj"]
    a, rf, implied_tw = _resolve_ellipsoid(p)

    towgs84 = implied_tw
    if "towgs84" in p and p["towgs84"] is not True:
        vals = [float(v) for v in str(p["towgs84"]).split(",")]
        if len(vals) == 3:
            vals += [0.0, 0.0, 0.0, 0.0]
        if len(vals) != 7:
            raise ValueError(f"+towgs84 needs 3 or 7 values: {s!r}")
        towgs84 = tuple(vals)
    if towgs84 is not None:
        # proj order (tx,ty,tz,rx,ry,rz,s_ppm) -> helmert() order
        # (tx,ty,tz,s_ppm,rx,ry,rz); identity shifts drop out entirely
        tx, ty, tz, rx, ry, rz, sp = towgs84
        towgs84 = None if not any(towgs84) else (tx, ty, tz, sp, rx, ry, rz)

    if kind in ("longlat", "latlong", "latlon", "lonlat"):
        return Proj4CRS(_LongLat(), a, rf, towgs84)

    if kind == "merc":
        if not math.isinf(rf):
            # ellipsoidal Mercator (EPSG 9804/9805 — e.g. EPSG:3395's
            # "+proj=merc +ellps=WGS84" string)
            from .conic import MercatorEllipsoidal

            proj = MercatorEllipsoidal(a, rf, _f(p, "lat_ts"), _f(p, "lon_0"),
                                       _f(p, "x_0"), _f(p, "y_0"))
            return Proj4CRS(proj, a, rf, towgs84)

        # the spherical / web form (EPSG:3857's proj string: +a == +b)
        if _f(p, "lat_ts") != 0.0:
            raise ValueError("+proj=merc +lat_ts!=0 on a sphere not supported")
        class _SphMerc:
            def __init__(self, R, lon0, fe, fn):
                self.R, self.lon0, self.fe, self.fn = R, lon0, fe, fn

            def forward(self, lat, lon):
                import numpy as np

                x = self.fe + self.R * np.radians(
                    np.asarray(lon, dtype=np.float64) - self.lon0)
                latr = np.radians(np.asarray(lat, dtype=np.float64))
                y = self.fn + self.R * np.log(np.tan(np.pi / 4 + latr / 2))
                return x, y

            def inverse(self, x, y):
                import numpy as np

                lon = self.lon0 + np.degrees(
                    (np.asarray(x, dtype=np.float64) - self.fe) / self.R)
                lat = np.degrees(2 * np.arctan(np.exp(
                    (np.asarray(y, dtype=np.float64) - self.fn) / self.R)) - np.pi / 2)
                return lat, lon

        proj = _SphMerc(a, _f(p, "lon_0"), _f(p, "x_0"), _f(p, "y_0"))
        return Proj4CRS(proj, a, rf, towgs84)

    if kind == "utm":
        if "zone" not in p:
            raise ValueError("+proj=utm needs +zone")
        zone = int(p["zone"])
        south = "south" in p
        proj = TransverseMercator(a, rf, 0.0, zone * 6 - 183, 0.9996,
                                  500_000.0, 10_000_000.0 if south else 0.0)
        return Proj4CRS(proj, a, rf, towgs84)

    if kind == "tmerc":
        k0 = _f(p, "k", _f(p, "k_0", 1.0))
        proj = TransverseMercator(a, rf, _f(p, "lat_0"), _f(p, "lon_0"), k0,
                                  _f(p, "x_0"), _f(p, "y_0"))
        return Proj4CRS(proj, a, rf, towgs84)

    if kind in ("lcc", "aea"):
        from .conic import AlbersEqualArea, LambertConformalConic

        cls = LambertConformalConic if kind == "lcc" else AlbersEqualArea
        lat1 = _f(p, "lat_1")
        lat2 = _f(p, "lat_2", lat1)
        proj = cls(a, rf, _f(p, "lat_0"), _f(p, "lon_0"), lat1, lat2,
                   _f(p, "x_0"), _f(p, "y_0"))
        return Proj4CRS(proj, a, rf, towgs84)

    if kind == "stere":
        from .conic import PolarStereographic

        lat0 = _f(p, "lat_0")
        if abs(lat0) != 90.0:
            raise ValueError("+proj=stere: only the polar aspect "
                             "(+lat_0=+-90) is implemented")
        lat_ts = _f(p, "lat_ts", lat0)
        proj = PolarStereographic(a, rf, lat_ts, _f(p, "lon_0"),
                                  _f(p, "x_0"), _f(p, "y_0"))
        return Proj4CRS(proj, a, rf, towgs84)

    if kind == "laea":
        from .conic import LambertAzimuthalEqualArea

        proj = LambertAzimuthalEqualArea(a, rf, _f(p, "lat_0"), _f(p, "lon_0"),
                                         _f(p, "x_0"), _f(p, "y_0"))
        return Proj4CRS(proj, a, rf, towgs84)

    if kind == "sinu":
        from .conic import Sinusoidal

        if not math.isinf(rf):
            # the implemented kernel is the spherical (MODIS-grid) form;
            # PROJ's ellipsoidal sinusoidal differs by ~km at mid-latitudes
            raise ValueError("+proj=sinu: only the spherical (+a=+b) form "
                             "is supported (the MODIS grid)")
        proj = Sinusoidal(a, _f(p, "lon_0"), _f(p, "x_0"), _f(p, "y_0"))
        return Proj4CRS(proj, a, rf, towgs84)

    raise ValueError(
        f"unsupported +proj={kind!r}; implemented: longlat merc utm tmerc "
        f"lcc aea stere laea sinu")
