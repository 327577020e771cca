"""Conic and polar map projections: Lambert Conformal Conic (2SP), Albers
Equal-Area Conic, and Polar Stereographic (variant B) on any supported
ellipsoid — the remaining national/continental grids of the reference's
proj4 surface (ref:proj4/src/main/scala/geotrellis/proj4/, L:unverified —
/root/reference empty at survey time; VERDICT r02 "what's missing" #4).

From-spec implementations of the published ellipsoidal formulas
(J. P. Snyder, *Map Projections — A Working Manual*, USGS PP 1395, 1987,
pp. 98–110 and 160–163; EPSG Guidance Note 7-2 for the polar variant-B
conventions). Fully vectorized numpy; forward/inverse each a handful of
transcendental kernels per batch.

Named CRSs registered in stages/reproject.py:
- ``epsg:2154``  RGF93 / Lambert-93 (LCC 2SP on GRS80)
- ``epsg:5070``  NAD83 / CONUS Albers (GRS80; NAD83≈WGS84 here, no shift)
- ``epsg:3031``  WGS84 / Antarctic Polar Stereographic (variant B)
- ``epsg:3413``  WGS84 / NSIDC Sea Ice Polar Stereographic North
- ``epsg:3035``  ETRS89-extended / LAEA Europe (Lambert Azimuthal EA)
- ``sinusoidal`` the MODIS sinusoidal grid (authalic sphere)
plus generic ``lcc:...`` / ``aea:...`` / ``stere:...`` parameter names.
"""

from __future__ import annotations

import numpy as np

from .utm import ELLIPSOIDS

_HALF_PI = np.pi / 2.0


def _wrap_lon(deg):
    return (np.asarray(deg) + 180.0) % 360.0 - 180.0


def _e_from(rf: float) -> float:
    f = 1.0 / rf
    return float(np.sqrt(f * (2.0 - f)))


def _m(phi, e):
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - e * e * s * s)


def _t(phi, e):
    # Snyder 15-9: conformal-latitude auxiliary
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)


def _phi_from_t(t, e, iters: int = 12):
    # Snyder 7-9: fixed-point inversion of _t (converges quadratically-ish;
    # 12 rounds reaches float64 everywhere off the poles)
    phi = _HALF_PI - 2.0 * np.arctan(t)
    for _ in range(iters):
        s = e * np.sin(phi)
        phi = _HALF_PI - 2.0 * np.arctan(t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0))
    return phi


def _q(phi, e):
    # Snyder 3-12: authalic-latitude auxiliary
    s = np.sin(phi)
    es = e * s
    return (1.0 - e * e) * (s / (1.0 - es * es) - (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es)))


class LambertConformalConic:
    """Snyder pp. 104–110, ellipsoidal 2SP form."""

    def __init__(self, a: float, rf: float, lat0: float, lon0: float,
                 sp1: float, sp2: float, fe: float, fn: float):
        self.a, self.rf = a, rf
        self.lon0 = np.radians(lon0)
        self.fe, self.fn = fe, fn
        e = _e_from(rf)
        self.e = e
        p0, p1, p2 = np.radians([lat0, sp1, sp2])
        m1, m2 = _m(p1, e), _m(p2, e)
        t0, t1, t2 = _t(p0, e), _t(p1, e), _t(p2, e)
        self.n = float((np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))) \
            if sp1 != sp2 else float(np.sin(p1))
        self.F = float(m1 / (self.n * t1 ** self.n))
        self.rho0 = float(a * self.F * t0 ** self.n)

    def forward(self, lat, lon):
        lat = np.radians(np.asarray(lat, dtype=np.float64))
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        rho = self.a * self.F * _t(lat, self.e) ** self.n
        th = self.n * (lon - self.lon0)
        return self.fe + rho * np.sin(th), self.fn + self.rho0 - rho * np.cos(th)

    def inverse(self, x, y):
        dx = np.asarray(x, dtype=np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, dtype=np.float64) - self.fn)
        sign = np.sign(self.n)
        rho = sign * np.hypot(dx, dy)
        th = np.arctan2(sign * dx, sign * dy)
        t = (rho / (self.a * self.F)) ** (1.0 / self.n)
        lat = _phi_from_t(t, self.e)
        return np.degrees(lat), _wrap_lon(np.degrees(th / self.n + self.lon0))


class AlbersEqualArea:
    """Snyder pp. 98–103, ellipsoidal 2SP form."""

    def __init__(self, a: float, rf: float, lat0: float, lon0: float,
                 sp1: float, sp2: float, fe: float, fn: float):
        self.a, self.rf = a, rf
        self.lon0 = np.radians(lon0)
        self.fe, self.fn = fe, fn
        e = _e_from(rf)
        self.e = e
        p0, p1, p2 = np.radians([lat0, sp1, sp2])
        m1, m2 = _m(p1, e), _m(p2, e)
        q0, q1, q2 = _q(p0, e), _q(p1, e), _q(p2, e)
        self.n = float((m1 * m1 - m2 * m2) / (q2 - q1)) if sp1 != sp2 else float(np.sin(p1))
        self.C = float(m1 * m1 + self.n * q1)
        self.rho0 = float(a * np.sqrt(self.C - self.n * q0) / self.n)

    def forward(self, lat, lon):
        lat = np.radians(np.asarray(lat, dtype=np.float64))
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        rho = self.a * np.sqrt(self.C - self.n * _q(lat, self.e)) / self.n
        th = self.n * (lon - self.lon0)
        return self.fe + rho * np.sin(th), self.fn + self.rho0 - rho * np.cos(th)

    def inverse(self, x, y, iters: int = 15):
        dx = np.asarray(x, dtype=np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, dtype=np.float64) - self.fn)
        sign = np.sign(self.n)
        rho = sign * np.hypot(dx, dy)
        th = np.arctan2(sign * dx, sign * dy)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        e = self.e
        # Snyder 3-16 iteration for the latitude from its authalic auxiliary
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        for _ in range(iters):
            s = np.sin(phi)
            es = e * s
            one = 1.0 - es * es
            phi = phi + (one * one / (2.0 * np.cos(phi))) * (
                q / (1.0 - e * e) - s / one + np.log((1.0 - es) / (1.0 + es)) / (2.0 * e))
        return np.degrees(phi), _wrap_lon(np.degrees(th / self.n + self.lon0))


class PolarStereographic:
    """EPSG 9829 "Polar Stereographic (variant B)": a standard parallel
    (latF, where scale is true) defines the implied k0; north or south
    aspect by the sign of latF. EPSG Guidance Note 7-2 formulas."""

    def __init__(self, a: float, rf: float, lat_ts: float, lon0: float,
                 fe: float, fn: float):
        self.a, self.rf = a, rf
        self.south = lat_ts < 0
        self.lon0 = np.radians(lon0)
        self.fe, self.fn = fe, fn
        e = _e_from(rf)
        self.e = e
        pf = np.radians(abs(lat_ts))
        self.mf = float(_m(pf, e))
        self.tf = float(_t(pf, e))

    def _t_signed(self, lat):
        # north aspect uses _t(lat); south aspect mirrors the hemisphere
        return _t(-lat if self.south else lat, self.e)

    def forward(self, lat, lon):
        lat = np.radians(np.asarray(lat, dtype=np.float64))
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        rho = self.a * self.mf * self._t_signed(lat) / self.tf
        dlon = lon - self.lon0
        x = self.fe + rho * np.sin(dlon)
        y = self.fn + (rho * np.cos(dlon) if self.south else -rho * np.cos(dlon))
        return x, y

    def inverse(self, x, y):
        dx = np.asarray(x, dtype=np.float64) - self.fe
        dy = np.asarray(y, dtype=np.float64) - self.fn
        rho = np.hypot(dx, dy)
        t = rho * self.tf / (self.a * self.mf)
        phi = _phi_from_t(t, self.e)
        if self.south:
            lat = -np.degrees(phi)
            lon = np.degrees(self.lon0 + np.arctan2(dx, dy))
        else:
            lat = np.degrees(phi)
            lon = np.degrees(self.lon0 + np.arctan2(dx, -dy))
        return lat, _wrap_lon(lon)


# --- named CRSs and parameterized parsing ------------------------------------

def lambert93() -> LambertConformalConic:
    """EPSG:2154 RGF93 / Lambert-93 (RGF93 ≈ WGS84 at this precision)."""
    a, rf = ELLIPSOIDS["grs80"]
    return LambertConformalConic(a, rf, 46.5, 3.0, 44.0, 49.0, 700_000.0, 6_600_000.0)


def conus_albers() -> AlbersEqualArea:
    """EPSG:5070 NAD83 / CONUS Albers (NAD83 ≈ WGS84 at this precision)."""
    a, rf = ELLIPSOIDS["grs80"]
    return AlbersEqualArea(a, rf, 23.0, -96.0, 29.5, 45.5, 0.0, 0.0)


def antarctic_ps() -> PolarStereographic:
    """EPSG:3031 WGS84 / Antarctic Polar Stereographic."""
    a, rf = ELLIPSOIDS["wgs84"]
    return PolarStereographic(a, rf, -71.0, 0.0, 0.0, 0.0)


def nsidc_north_ps() -> PolarStereographic:
    """EPSG:3413 WGS84 / NSIDC Sea Ice Polar Stereographic North."""
    a, rf = ELLIPSOIDS["wgs84"]
    return PolarStereographic(a, rf, 70.0, -45.0, 0.0, 0.0)


NAMED = {
    "epsg:2154": lambert93,
    "epsg:5070": conus_albers,
    "epsg:3031": antarctic_ps,
    "epsg:3413": nsidc_north_ps,
}


def parse_conic_crs(name: str):
    """Generic parameter names (angles in degrees, default ellipsoid wgs84):
    - ``lcc:<lat0>,<lon0>,<sp1>,<sp2>,<fe>,<fn>[,<ellps>]``
    - ``aea:<lat0>,<lon0>,<sp1>,<sp2>,<fe>,<fn>[,<ellps>]``
    - ``stere:<lat_ts>,<lon0>,<fe>,<fn>[,<ellps>]``"""
    kind, _, rest = name.partition(":")
    parts = [p.strip() for p in rest.split(",")]
    n_num = {"lcc": 6, "aea": 6, "stere": 4}.get(kind)
    if n_num is None:
        raise ValueError(f"not a conic/polar crs name: {name!r}")
    if len(parts) not in (n_num, n_num + 1):
        raise ValueError(f"{kind} crs needs {n_num} or {n_num + 1} fields: {name!r}")
    ellps = parts[n_num].lower() if len(parts) == n_num + 1 else "wgs84"
    if ellps not in ELLIPSOIDS:
        raise ValueError(f"unknown ellipsoid {ellps!r} (have {sorted(ELLIPSOIDS)})")
    a, rf = ELLIPSOIDS[ellps]
    nums = [float(p) for p in parts[:n_num]]
    if kind == "lcc":
        return LambertConformalConic(a, rf, *nums)
    if kind == "aea":
        return AlbersEqualArea(a, rf, *nums)
    return PolarStereographic(a, rf, *nums)


class MercatorEllipsoidal:
    """EPSG 9804/9805 Mercator (1SP / 2SP-via-lat_ts) on the ellipsoid —
    the EPSG:3395 World Mercator projection (Snyder pp. 41–44):
    x = FE + a k0 (lon - lon0), y = FN - a k0 ln t(lat) with the same
    conformal auxiliary t as the polar stereographic; k0 is implied by the
    standard parallel (scale true at lat_ts)."""

    def __init__(self, a: float, rf: float, lat_ts: float, lon0: float,
                 fe: float, fn: float):
        self.a, self.rf = a, rf
        self.lon0 = np.radians(lon0)
        self.fe, self.fn = fe, fn
        e = _e_from(rf)
        self.e = e
        self.k0 = float(_m(np.radians(lat_ts), e))

    def forward(self, lat, lon):
        lat = np.radians(np.asarray(lat, dtype=np.float64))
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        x = self.fe + self.a * self.k0 * (lon - self.lon0)
        y = self.fn - self.a * self.k0 * np.log(_t(lat, self.e))
        return x, y

    def inverse(self, x, y):
        t = np.exp(-(np.asarray(y, dtype=np.float64) - self.fn) / (self.a * self.k0))
        lat = _phi_from_t(t, self.e)
        lon = self.lon0 + (np.asarray(x, dtype=np.float64) - self.fe) / (self.a * self.k0)
        return np.degrees(lat), _wrap_lon(np.degrees(lon))


def world_mercator() -> MercatorEllipsoidal:
    """EPSG:3395 WGS84 / World Mercator."""
    a, rf = ELLIPSOIDS["wgs84"]
    return MercatorEllipsoidal(a, rf, 0.0, 0.0, 0.0, 0.0)


class LambertAzimuthalEqualArea:
    """Snyder pp. 187–190, ellipsoidal oblique LAEA (the EPSG:3035 European
    grid projection). Works on the authalic sphere via beta = asin(q/qp)."""

    def __init__(self, a: float, rf: float, lat0: float, lon0: float,
                 fe: float, fn: float):
        self.a, self.rf = a, rf
        self.lon0 = np.radians(lon0)
        self.fe, self.fn = fe, fn
        e = _e_from(rf)
        self.e = e
        self.qp = float(_q(_HALF_PI, e))
        p0 = np.radians(lat0)
        q1 = float(_q(p0, e))
        self.beta1 = float(np.arcsin(q1 / self.qp))
        self.Rq = a * np.sqrt(self.qp / 2.0)
        m1 = float(_m(p0, e))
        self.D = a * m1 / (self.Rq * np.cos(self.beta1))

    def forward(self, lat, lon):
        lat = np.radians(np.asarray(lat, dtype=np.float64))
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        beta = np.arcsin(np.clip(_q(lat, self.e) / self.qp, -1.0, 1.0))
        dl = lon - self.lon0
        sb1, cb1 = np.sin(self.beta1), np.cos(self.beta1)
        denom = 1.0 + sb1 * np.sin(beta) + cb1 * np.cos(beta) * np.cos(dl)
        B = self.Rq * np.sqrt(2.0 / denom)
        x = self.fe + B * self.D * np.cos(beta) * np.sin(dl)
        y = self.fn + (B / self.D) * (cb1 * np.sin(beta) - sb1 * np.cos(beta) * np.cos(dl))
        return x, y

    def inverse(self, x, y, iters: int = 15):
        dx = (np.asarray(x, dtype=np.float64) - self.fe) / self.D
        dy = (np.asarray(y, dtype=np.float64) - self.fn) * self.D
        rho = np.hypot(dx, dy)
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * self.Rq), -1.0, 1.0))
        sb1, cb1 = np.sin(self.beta1), np.cos(self.beta1)
        with np.errstate(invalid="ignore", divide="ignore"):
            sin_beta = np.where(
                rho > 0,
                np.cos(ce) * sb1 + dy * np.sin(ce) * cb1 / np.where(rho > 0, rho, 1.0),
                sb1)
            lon = self.lon0 + np.arctan2(
                dx * np.sin(ce),
                np.where(rho > 0, rho * cb1 * np.cos(ce) - dy * sb1 * np.sin(ce), 1.0))
        q = np.clip(sin_beta, -1.0, 1.0) * self.qp
        e = self.e
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        for _ in range(iters):  # same authalic-latitude iteration as Albers
            s = np.sin(phi)
            es = e * s
            one = 1.0 - es * es
            phi = phi + (one * one / (2.0 * np.cos(phi))) * (
                q / (1.0 - e * e) - s / one + np.log((1.0 - es) / (1.0 + es)) / (2.0 * e))
        return np.degrees(phi), _wrap_lon(np.degrees(lon))


class Sinusoidal:
    """Spherical sinusoidal on the authalic radius — the MODIS grid
    projection (equal-area, pseudocylindrical): x = R*dlon*cos(lat),
    y = R*lat."""

    R_MODIS = 6371007.181  # authalic sphere radius used by the MODIS grid

    def __init__(self, radius: float = R_MODIS, lon0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0):
        self.R = radius
        self.lon0 = np.radians(lon0)
        self.fe, self.fn = fe, fn

    def forward(self, lat, lon):
        lat = np.radians(np.asarray(lat, dtype=np.float64))
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        return (self.fe + self.R * (lon - self.lon0) * np.cos(lat),
                self.fn + self.R * lat)

    def inverse(self, x, y):
        lat = (np.asarray(y, dtype=np.float64) - self.fn) / self.R
        with np.errstate(invalid="ignore", divide="ignore"):
            lon = self.lon0 + (np.asarray(x, dtype=np.float64) - self.fe) / (self.R * np.cos(lat))
        return np.degrees(lat), _wrap_lon(np.degrees(lon))


def laea_europe() -> LambertAzimuthalEqualArea:
    """EPSG:3035 ETRS89-extended / LAEA Europe (ETRS89 ≈ WGS84 here)."""
    a, rf = ELLIPSOIDS["grs80"]
    return LambertAzimuthalEqualArea(a, rf, 52.0, 10.0, 4_321_000.0, 3_210_000.0)


def modis_sinusoidal() -> Sinusoidal:
    """The MODIS sinusoidal grid (SR-ORG:6974 family)."""
    return Sinusoidal()


NAMED["epsg:3035"] = laea_europe
NAMED["sinusoidal"] = modis_sinusoidal
NAMED["epsg:3395"] = world_mercator
