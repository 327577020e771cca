"""Proj4-string front-end tests: each supported +proj family is checked for
round-trip closure and for agreement with the engine's named/parameterized
CRSs (which are themselves pinned by EPSG worked examples in test_utm.py /
test_cluster.py)."""

from __future__ import annotations

import numpy as np
import pytest

from geotrellis_ray.core.proj4 import parse_proj4
from geotrellis_ray.stages.reproject import _from_latlng, _to_latlng

LATS = np.array([0.0, 12.3, 47.9, -33.7, 61.2])
LONS = np.array([0.0, 14.8, 8.1, 151.2, -149.9])


def _roundtrip(crs: str, lats=LATS, lons=LONS, atol=1e-6):
    p = parse_proj4(crs)
    x, y = p.from_latlng(lats, lons)
    lat2, lon2 = p.to_latlng(x, y)
    np.testing.assert_allclose(lat2, lats, atol=atol)
    np.testing.assert_allclose(lon2, lons, atol=atol)
    return x, y


def test_longlat_identity():
    p = parse_proj4("+proj=longlat +datum=WGS84 +no_defs")
    x, y = p.from_latlng(LATS, LONS)
    np.testing.assert_allclose(x, LONS)
    np.testing.assert_allclose(y, LATS)


def test_merc_matches_webmercator():
    """EPSG:3857's own proj string must reproduce the builtin webmercator."""
    crs = "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +units=m +no_defs"
    x, y = _roundtrip(crs, LATS[:4], LONS[:4])
    ex, ey = _from_latlng("webmercator", LATS[:4], LONS[:4])
    np.testing.assert_allclose(x, ex, atol=1e-6)
    np.testing.assert_allclose(y, ey, atol=1e-6)


def test_utm_matches_builtin():
    crs = "+proj=utm +zone=33 +datum=WGS84 +units=m +no_defs"
    lats = np.array([41.0, 52.5, 68.4])
    lons = np.array([12.5, 13.4, 17.9])
    x, y = _roundtrip(crs, lats, lons)
    ex, ey = _from_latlng("utm:33n", lats, lons)
    np.testing.assert_allclose(x, ex, atol=1e-6)
    np.testing.assert_allclose(y, ey, atol=1e-6)
    # southern hemisphere false northing
    crs_s = "+proj=utm +zone=56 +south +ellps=WGS84"
    xs, ys = _roundtrip(crs_s, np.array([-33.9]), np.array([151.2]))
    exs, eys = _from_latlng("utm:56s", np.array([-33.9]), np.array([151.2]))
    np.testing.assert_allclose(xs, exs, atol=1e-6)
    np.testing.assert_allclose(ys, eys, atol=1e-6)


def test_tmerc_osgb_with_towgs84_matches_builtin():
    """The published EPSG:27700 proj string (Airy TM + OSGB36 towgs84) must
    land within the Helmert linearization error of the builtin epsg:27700
    chain (which uses the inverse-direction OS parameter set)."""
    crs = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
           "+y_0=-100000 +ellps=airy "
           "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489 +units=m")
    lats = np.array([50.5, 52.65757, 57.1])
    lons = np.array([-3.7, 1.7179216, -2.2])
    x, y = _roundtrip(crs, lats, lons, atol=1e-7)
    ex, ey = _from_latlng("epsg:27700", lats, lons)
    # two opposite-direction published Helmert sets agree to ~mm
    np.testing.assert_allclose(x, ex, atol=5e-3)
    np.testing.assert_allclose(y, ey, atol=5e-3)


def test_lcc_lambert93_matches_builtin():
    crs = ("+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46.5 +lon_0=3 +x_0=700000 "
           "+y_0=6600000 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m")
    lats = np.array([43.3, 46.5, 50.8])
    lons = np.array([-1.5, 3.0, 7.8])
    x, y = _roundtrip(crs, lats, lons)
    ex, ey = _from_latlng("epsg:2154", lats, lons)
    np.testing.assert_allclose(x, ex, atol=1e-6)
    np.testing.assert_allclose(y, ey, atol=1e-6)


def test_aea_conus_matches_builtin():
    crs = ("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +x_0=0 "
           "+y_0=0 +datum=NAD83 +units=m")
    lats = np.array([25.0, 37.1, 48.9])
    lons = np.array([-120.5, -96.0, -70.2])
    x, y = _roundtrip(crs, lats, lons)
    ex, ey = _from_latlng("epsg:5070", lats, lons)
    np.testing.assert_allclose(x, ex, atol=1e-6)
    np.testing.assert_allclose(y, ey, atol=1e-6)


def test_stere_antarctic_matches_builtin():
    crs = ("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 "
           "+datum=WGS84 +units=m")
    lats = np.array([-90.0, -75.0, -71.0])
    lons = np.array([0.0, 123.4, -45.0])
    p = parse_proj4(crs)
    x, y = p.from_latlng(lats, lons)
    ex, ey = _from_latlng("epsg:3031", lats, lons)
    np.testing.assert_allclose(x, ex, atol=1e-6)
    np.testing.assert_allclose(y, ey, atol=1e-6)
    lat2, lon2 = p.to_latlng(x[1:], y[1:])  # pole lon is undefined
    np.testing.assert_allclose(lat2, lats[1:], atol=1e-7)
    np.testing.assert_allclose(lon2, lons[1:], atol=1e-7)


def test_laea_europe_matches_builtin():
    crs = ("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
           "+ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m")
    lats = np.array([36.9, 52.0, 64.1])
    lons = np.array([-8.8, 10.0, 25.5])
    x, y = _roundtrip(crs, lats, lons)
    ex, ey = _from_latlng("epsg:3035", lats, lons)
    np.testing.assert_allclose(x, ex, atol=1e-6)
    np.testing.assert_allclose(y, ey, atol=1e-6)


def test_sinu_modis_matches_builtin():
    crs = "+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +a=6371007.181 +b=6371007.181 +units=m"
    lats = np.array([0.0, 40.0, -20.0])
    lons = np.array([0.0, -105.0, 30.0])
    x, y = _roundtrip(crs, lats, lons)
    ex, ey = _from_latlng("sinusoidal", lats, lons)
    np.testing.assert_allclose(x, ex, atol=1e-6)
    np.testing.assert_allclose(y, ey, atol=1e-6)


def test_reproject_dispatch_accepts_proj_strings():
    """stages/reproject._to_latlng/_from_latlng route '+...' strings."""
    x, y = _from_latlng("+proj=utm +zone=31 +ellps=WGS84", np.array([48.85]),
                        np.array([2.35]))
    ex, ey = _from_latlng("utm:31n", np.array([48.85]), np.array([2.35]))
    np.testing.assert_allclose(x, ex, atol=1e-6)
    lat, lon = _to_latlng("+proj=utm +zone=31 +ellps=WGS84", x, y)
    np.testing.assert_allclose(lat, [48.85], atol=1e-9)
    np.testing.assert_allclose(lon, [2.35], atol=1e-9)


def test_parse_errors():
    with pytest.raises(ValueError, match="unsupported"):
        parse_proj4("+proj=omerc +lat_0=4")
    with pytest.raises(ValueError, match="zone"):
        parse_proj4("+proj=utm +ellps=WGS84")
    with pytest.raises(ValueError, match="spherical"):
        parse_proj4("+proj=sinu +ellps=WGS84")
    with pytest.raises(ValueError, match="polar"):
        parse_proj4("+proj=stere +lat_0=45 +lon_0=0 +ellps=WGS84")
    with pytest.raises(ValueError, match="ellps"):
        parse_proj4("+proj=tmerc +ellps=bessel")


def test_towgs84_three_param_form():
    """3-term +towgs84 expands to a translation-only Helmert."""
    base = "+proj=utm +zone=32 +ellps=intl"
    shifted = base + " +towgs84=-87,-98,-121"
    lat, lon = np.array([54.0]), np.array([9.0])
    x0, y0 = parse_proj4(base).from_latlng(lat, lon)
    x1, y1 = parse_proj4(shifted).from_latlng(lat, lon)
    # ED50 sits ~100-200 m from WGS84 in northern Europe
    d = float(np.hypot(x1 - x0, y1 - y0)[0])
    assert 100.0 < d < 300.0
    lat2, lon2 = parse_proj4(shifted).to_latlng(x1, y1)
    np.testing.assert_allclose(lat2, lat, atol=1e-7)
    np.testing.assert_allclose(lon2, lon, atol=1e-7)


def test_merc_ellipsoidal_properties():
    """Ellipsoidal Mercator (EPSG:3395 via '+proj=merc +ellps=WGS84'):
    (1) conformal — numeric meridian/parallel scale factors agree to 1e-6
    at several latitudes; (2) scale is true (h == 1) at +lat_ts;
    (3) 1e-9-degree round-trips; (4) the e->0 limit reproduces the
    spherical web form exactly."""
    p = parse_proj4("+proj=merc +ellps=WGS84")
    a, rf = 6378137.0, 298.257223563
    e2 = (1 / rf) * (2 - 1 / rf)
    d = 1e-6
    for lat in (0.0, 22.5, 45.0, 66.6, -51.0):
        lon = 13.0
        x0, y0 = p.from_latlng(np.array([lat]), np.array([lon]))
        xm, ym = p.from_latlng(np.array([lat + d]), np.array([lon]))
        xp, yp = p.from_latlng(np.array([lat]), np.array([lon + d]))
        s = np.sin(np.radians(lat))
        # meridian arc per degree M(phi)*pi/180; parallel arc nu*cos(phi)*pi/180
        M = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        nu = a / np.sqrt(1 - e2 * s * s)
        h_mer = float(np.hypot(xm - x0, ym - y0)[0]) / (M * np.radians(d))
        h_par = float(np.hypot(xp - x0, yp - y0)[0]) / (
            nu * np.cos(np.radians(lat)) * np.radians(d))
        np.testing.assert_allclose(h_mer, h_par, rtol=1e-5)  # conformal
    # scale true at lat_ts=40
    p40 = parse_proj4("+proj=merc +lat_ts=40 +ellps=WGS84")
    lat = 40.0
    x0, y0 = p40.from_latlng(np.array([lat]), np.array([0.0]))
    xp, yp = p40.from_latlng(np.array([lat]), np.array([d]))
    s = np.sin(np.radians(lat))
    nu = a / np.sqrt(1 - e2 * s * s)
    h = float(np.hypot(xp - x0, yp - y0)[0]) / (nu * np.cos(np.radians(lat)) * np.radians(d))
    np.testing.assert_allclose(h, 1.0, rtol=1e-6)
    # round-trips
    _roundtrip("+proj=merc +ellps=WGS84", atol=1e-9)
    # e -> 0 limit == spherical web form on the same radius
    sph = parse_proj4("+proj=merc +a=6378137 +b=6378137")
    ell0 = parse_proj4("+proj=merc +a=6378137 +rf=1e300")
    lats = np.array([0.0, 30.0, -60.0])
    lons = np.array([10.0, -120.0, 45.0])
    xs, ys = sph.from_latlng(lats, lons)
    xe, ye = ell0.from_latlng(lats, lons)
    np.testing.assert_allclose(xe, xs, rtol=1e-12)
    np.testing.assert_allclose(ye, ys, rtol=1e-9)


def test_epsg3395_named_matches_proj_string():
    lats = np.array([0.0, 45.0, -33.7])
    lons = np.array([0.0, 13.4, 151.2])
    x1, y1 = _from_latlng("epsg:3395", lats, lons)
    x2, y2 = parse_proj4("+proj=merc +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84").from_latlng(lats, lons)
    np.testing.assert_allclose(x1, x2)
    np.testing.assert_allclose(y1, y2)
    # ellipsoidal y is strictly below spherical y off the equator
    xs, ys = _from_latlng("webmercator", lats[1:], lons[1:])
    assert abs(y1[1]) < abs(ys[0]) and abs(y1[2]) < abs(ys[1])
