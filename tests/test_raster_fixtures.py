"""Oracle tests: raster ops + fixture generators (no Ray)."""

import numpy as np
import pytest

from geotrellis_ray import fixtures
from geotrellis_ray.core import raster, wkb
from geotrellis_ray.core.geocode import url_hash64
from geotrellis_ray.core.layout import Extent
from geotrellis_ray.core.text import extract_text
from tests import oracle

rng = np.random.default_rng(7)


def test_pages_deterministic_and_byte_identical():
    t1 = fixtures.gen_pages_table(50)
    t2 = fixtures.gen_pages_table(30, start=20)
    # shard-independence: rows 20..49 identical
    assert t1.slice(20, 30).equals(t2)
    for row in t1.to_pylist()[:10]:
        assert row["text"] == extract_text(row["html"])
        assert row["lang"] == fixtures.LANGS[url_hash64(row["url"]) % 8]
    # geotag present exactly on i % 5 == 0
    htmls = t1["html"].to_pylist()
    for i, h in enumerate(htmls):
        assert (b"geo.position" in h) == (i % 5 == 0)


def test_polygons_fixture_shape():
    polys = fixtures.gen_polygons()
    assert len(polys) == 171
    tbl = fixtures.gen_polygons_table()
    assert tbl.num_rows == 171
    # decode a wkb and confirm bbox matches
    row = tbl.to_pylist()[130]
    g = wkb.decode(row["wkb"])
    ring = g["rings"][0]
    assert row["xmin"] == pytest.approx(ring[:, 0].min())
    # world grid covers everything: every lon/lat inside exactly one rect (half-open)
    grid = [p for p in polys if p["polygon_id"] < 128]
    from geotrellis_ray.core.geom import point_in_polygon

    px = rng.uniform(-179, 179, 200)
    py = rng.uniform(-89, 89, 200)
    hits = np.zeros(200, dtype=int)
    for p in grid:
        hits += point_in_polygon(px, py, p["ring"]).astype(int)
    assert (hits == 1).all()


def test_tile_codec_roundtrip():
    a = rng.normal(size=(16, 16)).astype(np.float32)
    cells, cols, rows, ct = raster.encode_tile(a)
    b = raster.decode_tile(cells, cols, rows, ct)
    np.testing.assert_array_equal(a, b)


def test_local_ops_nodata():
    a = np.array([[1.0, np.nan], [3.0, 4.0]])
    b = np.array([[10.0, 1.0], [np.nan, 2.0]])
    s = raster.local_binary(a, b, raster.LOCAL_BINARY_OPS["add"])
    assert s[0, 0] == 11.0 and np.isnan(s[0, 1]) and np.isnan(s[1, 0]) and s[1, 1] == 6.0
    m = raster.local_unary(a, raster.LOCAL_UNARY_OPS["sqrt"])
    assert m[0, 0] == 1.0 and np.isnan(m[0, 1])
    assert raster.local_defined(a).tolist() == [[1, 0], [1, 1]]
    mn = raster.local_binary(a, 2.0, raster.LOCAL_BINARY_OPS["min"])
    assert mn[1, 1] == 2.0 and np.isnan(mn[0, 1])


def test_merge_crop_split():
    a = np.full((4, 4), np.nan)
    a[0, 0] = 1.0
    b = np.full((4, 4), 2.0)
    m = raster.merge(a, b)
    assert m[0, 0] == 1.0 and m[3, 3] == 2.0
    c = raster.crop(m, 1, 1, 2, 2)
    assert c.shape == (2, 2)
    parts = raster.split(np.arange(16).reshape(4, 4), 2, 2)
    assert len(parts) == 4
    tc, tr, arr = parts[3]
    assert (tc, tr) == (1, 1)
    np.testing.assert_array_equal(arr, [[10, 11], [14, 15]])


def test_downsample_average():
    a = np.array([[1.0, 3.0], [5.0, np.nan]])
    d = raster.downsample_average_2x(a)
    assert d[0, 0] == pytest.approx(3.0)  # mean of 1,3,5
    nn = raster.resample_nearest(np.arange(16).reshape(4, 4).astype(float), 2, 2)
    np.testing.assert_array_equal(nn, [[5, 7], [13, 15]])


def test_rasterize_polygon_oracle():
    ext = Extent(0, 0, 16, 16)
    ring = np.array([(2.2, 2.2), (13.7, 3.1), (12.5, 12.5), (4.0, 10.0)], dtype=float)
    g = {"type": "Polygon", "rings": [ring]}
    got = raster.rasterize_mask(g, ext, 16, 16)
    want = oracle.rasterize_scalar(g, (0, 0, 16, 16), 16, 16)
    np.testing.assert_array_equal(got, want)


def test_rasterize_zindex_priority():
    ext = Extent(0, 0, 4, 4)
    g1 = {"type": "Polygon", "rings": [np.array([(0, 0), (4, 0), (4, 4), (0, 4)], dtype=float)]}
    g2 = {"type": "Polygon", "rings": [np.array([(0, 0), (2, 0), (2, 4), (0, 4)], dtype=float)]}
    out = raster.rasterize_value([(g1, 0, 1.0), (g2, 1, 2.0)], ext, 4, 4)
    assert out[0, 0] == 2.0 and out[0, 3] == 1.0
    # tie on z -> larger value wins, regardless of paint order
    out2 = raster.rasterize_value([(g2, 0, 5.0), (g1, 0, 1.0)], ext, 4, 4)
    out3 = raster.rasterize_value([(g1, 0, 1.0), (g2, 0, 5.0)], ext, 4, 4)
    np.testing.assert_array_equal(out2, out3)
    assert out2[0, 0] == 5.0


def test_rasterize_point_line():
    ext = Extent(0, 0, 4, 4)
    p = {"type": "Point", "coords": np.array([1.5, 2.5])}
    m = raster.rasterize_mask(p, ext, 4, 4)
    assert m[1, 1] and m.sum() == 1  # row 1 from top (y=2.5), col 1
    ln = {"type": "LineString", "coords": np.array([(0.5, 0.5), (3.5, 0.5)], dtype=float)}
    m = raster.rasterize_mask(ln, ext, 4, 4)
    assert m[3, :].all() and m.sum() == 4


def test_mask_geom():
    ext = Extent(0, 0, 4, 4)
    g = {"type": "Polygon", "rings": [np.array([(0, 0), (2, 0), (2, 4), (0, 4)], dtype=float)]}
    a = np.ones((4, 4))
    masked = raster.mask_geom(a, ext, g)
    assert np.isnan(masked[:, 2:]).all() and (masked[:, :2] == 1).all()
    inv = raster.mask_geom(a, ext, g, invert=True)
    assert np.isnan(inv[:, :2]).all() and (inv[:, 2:] == 1).all()
