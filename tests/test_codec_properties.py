"""Property-based round-trips (hypothesis) for the geometry codecs: WKB <->
GeoJSON <-> WKT and the MVT geometry command stream over random inputs —
catches edge shapes the example tests never construct."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from geotrellis_ray.core import wkb
from geotrellis_ray.core.geojson import geojson_to_geom, geom_to_geojson, wkt_decode, wkt_encode
from geotrellis_ray.core.mvt import GEOM_LINESTRING, decode_geometry, encode_geometry

finite = st.floats(allow_nan=False, allow_infinity=False)  # full float64 domain


def coords(min_pts, max_pts):
    return st.lists(st.tuples(finite, finite), min_size=min_pts, max_size=max_pts)


@st.composite
def geometries(draw):
    kind = draw(st.sampled_from(["Point", "LineString", "Polygon", "MultiPoint",
                                 "MultiLineString", "MultiPolygon"]))
    if kind == "Point":
        x, y = draw(st.tuples(finite, finite))
        return {"type": "Point", "coords": np.array([x, y])}
    if kind == "LineString":
        return {"type": "LineString", "coords": np.array(draw(coords(2, 8)))}
    if kind == "Polygon":
        rings = [np.array(draw(coords(3, 8))) for _ in range(draw(st.integers(1, 3)))]
        return {"type": "Polygon", "rings": rings}
    if kind == "MultiPoint":
        pts = draw(coords(1, 5))
        return {"type": "MultiPoint",
                "parts": [{"type": "Point", "coords": np.array(p)} for p in pts]}
    if kind == "MultiLineString":
        n = draw(st.integers(1, 3))
        return {"type": "MultiLineString",
                "parts": [{"type": "LineString", "coords": np.array(draw(coords(2, 6)))}
                          for _ in range(n)]}
    n = draw(st.integers(1, 3))
    return {"type": "MultiPolygon",
            "parts": [{"type": "Polygon", "rings": [np.array(draw(coords(3, 6)))]}
                      for _ in range(n)]}


@settings(max_examples=120, deadline=None)
@given(geometries())
def test_wkb_geojson_wkb_identity(geom):
    buf = wkb.encode(geom)
    assert wkb.encode(geojson_to_geom(geom_to_geojson(wkb.decode(buf)))) == buf


@settings(max_examples=120, deadline=None)
@given(geometries())
def test_wkb_wkt_wkb_identity(geom):
    buf = wkb.encode(geom)
    assert wkb.encode(wkt_decode(wkt_encode(wkb.decode(buf)))) == buf


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 4095), st.integers(0, 4095)), min_size=2, max_size=20))
def test_mvt_linestring_command_stream_identity(pts):
    arr = np.array(pts, dtype=np.int64)
    # consecutive duplicate points are legal MVT (zero deltas)
    ints = encode_geometry(GEOM_LINESTRING, [arr])
    back = decode_geometry(GEOM_LINESTRING, ints)
    assert len(back) == 1
    np.testing.assert_array_equal(back[0], arr)


@settings(max_examples=40, deadline=None)
@given(
    rows=st.integers(1, 40), cols=st.integers(1, 40),
    compression=st.sampled_from(["none", "deflate"]),
    tiled=st.booleans(),
    dtype=st.sampled_from(["uint8", "int16", "int32", "float32", "float64"]),
    seed=st.integers(0, 2**16),
    nodata_frac=st.floats(0.0, 0.4),
    bigtiff=st.booleans(),
)
def test_geotiff_roundtrip_property(rows, cols, compression, tiled, dtype, seed, nodata_frac,
                                    bigtiff):
    from geotrellis_ray.core.geotiff import decode_geotiff, encode_geotiff
    from geotrellis_ray.core.layout import Extent

    rng = np.random.default_rng(seed)
    a = np.floor(rng.uniform(0, 200, (rows, cols)))
    a[rng.random((rows, cols)) < nodata_frac] = np.nan
    kind = np.dtype(dtype).kind
    nodata = 255 if dtype == "uint8" else (-9999 if kind == "i" else None)
    pred = 2 if kind in ("i", "u") else 1
    ext = Extent(-5.0, 1.0, -5.0 + cols * 0.25, 1.0 + rows * 0.5)
    buf = encode_geotiff(ext, a, dtype=dtype, nodata=nodata, predictor=pred,
                         compression=compression, tile_size=16 if tiled else None,
                         bigtiff=bigtiff)
    ext2, back, meta = decode_geotiff(buf)
    assert ext2 == ext
    exp = a.astype(dtype).astype(np.float64) if kind == "f" else a.astype(np.float64)
    if kind == "f" and nodata is None:
        pass  # NaN survives as NaN in float payloads
    np.testing.assert_allclose(back, exp, equal_nan=True)


@settings(max_examples=200, deadline=None)
@given(st.integers(-(1 << 28), (1 << 28) - 1), st.integers(-(1 << 28), (1 << 28) - 1),
       st.integers(0, 15))
def test_hex_pack_unpack_identity(q, r, res):
    from geotrellis_ray.core.cellid import hex_pack, hex_unpack

    cid = hex_pack(np.array([q]), np.array([r]), res)
    q2, r2, res2 = hex_unpack(cid)
    assert (int(q2[0]), int(r2[0]), int(res2[0])) == (q, r, res)


@settings(max_examples=100, deadline=None)
@given(st.integers(0, (1 << 21) - 1), st.integers(0, (1 << 21) - 1),
       st.integers(0, (1 << 21) - 1))
def test_zorder3_roundtrip(c, r, t):
    from geotrellis_ray.core.sfc import zorder3, zorder3_decode

    z = zorder3(np.array([c], dtype=np.int64), np.array([r], dtype=np.int64),
                np.array([t], dtype=np.int64))
    c2, r2, t2 = zorder3_decode(z)
    assert (int(c2[0]), int(r2[0]), int(t2[0])) == (c, r, t)
