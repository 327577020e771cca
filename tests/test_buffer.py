"""Geometry buffer oracles (core/buffer.py, stages/overlay.py:buffer_features).

Two-sided Monte-Carlo membership oracle: the n-gon disc is inscribed in the
true disc, so the computed dilation is a SUBSET of the true buffer and a
SUPERSET of the cos(pi/m)-shrunk buffer. Every sampled point with
dist(p, G) < r*cos(pi/m) must be inside the result; every point with
dist(p, G) > r must be outside. Erosion is the mirror statement. Plus exact
closed forms on axis-aligned rects (tangencies land on disc vertices)."""
import numpy as np
import pytest

from geotrellis_ray.core import polyclip
from geotrellis_ray.core.buffer import buffer_geom, disc_ngon, ngon_area, union_many
from geotrellis_ray.core.geom import point_in_polygon_geom

QS = 8
M = 4 * QS
COS_M = np.cos(np.pi / M)


def _seg_dist(px, py, a, b):
    """Vectorized point-to-segment distance."""
    ab = b - a
    ap = np.column_stack([px - a[0], py - a[1]])
    t = np.clip((ap @ ab) / max(float(ab @ ab), 1e-300), 0.0, 1.0)
    cx, cy = a[0] + t * ab[0], a[1] + t * ab[1]
    return np.hypot(px - cx, py - cy)


def _geom_segments(geom):
    segs = []
    if geom["type"] == "Polygon":
        ringsets = [geom["rings"]]
    elif geom["type"] == "MultiPolygon":
        ringsets = [p["rings"] for p in geom["parts"]]
    elif geom["type"] == "LineString":
        c = np.asarray(geom["coords"], float)
        return [(c[i], c[i + 1]) for i in range(len(c) - 1)]
    else:
        raise ValueError(geom["type"])
    for rings in ringsets:
        for ring in rings:
            ring = np.asarray(ring, float)
            if np.array_equal(ring[0], ring[-1]):
                ring = ring[:-1]
            n = len(ring)
            segs.extend((ring[i], ring[(i + 1) % n]) for i in range(n))
    return segs


def _dist_to_boundary(px, py, geom):
    d = np.full(len(px), np.inf)
    for a, b in _geom_segments(geom):
        d = np.minimum(d, _seg_dist(px, py, a, b))
    return d


def _mc_check_dilation(geom, r, res, rng, n=4000):
    """Points closer than r*cos(pi/m) must be in res; farther than r out."""
    xmin, ymin, xmax, ymax = _bbox(geom)
    px = rng.uniform(xmin - 2 * r, xmax + 2 * r, n)
    py = rng.uniform(ymin - 2 * r, ymax + 2 * r, n)
    d = _dist_to_boundary(px, py, geom)
    if geom["type"] in ("Polygon", "MultiPolygon"):
        inside_src = point_in_polygon_geom(px, py, geom)
        d = np.where(inside_src, 0.0, d)
    got = point_in_polygon_geom(px, py, res)
    must_in = d < r * COS_M * 0.999
    must_out = d > r * 1.001
    assert np.all(got[must_in]), "dilation dropped a covered point"
    assert not np.any(got[must_out]), "dilation covered a too-far point"


def _bbox(geom):
    segs = _geom_segments(geom)
    pts = np.array([p for s in segs for p in s])
    return pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()


def _area(geom):
    return polyclip.rings_signed_area(polyclip.geom_polygons(geom))


def test_rect_dilation_closed_form():
    rect = {"type": "Polygon", "rings": [np.array([[0, 0], [4, 0], [4, 3], [0, 3]], float)]}
    res = buffer_geom(rect, 0.5, quad_segs=QS)
    assert res["type"] == "Polygon"
    assert _area(res) == pytest.approx(12 + 2 * 7 * 0.5 + ngon_area(0.5, QS), abs=1e-9)


def test_rect_erosion_closed_form_and_vanish():
    rect = {"type": "Polygon", "rings": [np.array([[0, 0], [4, 0], [4, 3], [0, 3]], float)]}
    res = buffer_geom(rect, -0.5, quad_segs=QS)
    assert _area(res) == pytest.approx(3 * 2, abs=1e-9)
    assert buffer_geom(rect, -1.6, quad_segs=QS) is None


def test_concave_dilation_montecarlo():
    rng = np.random.default_rng(7)
    L = {"type": "Polygon",
         "rings": [np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4]], float)]}
    res = buffer_geom(L, 0.35, quad_segs=QS)
    _mc_check_dilation(L, 0.35, res, rng)


def test_polygon_with_hole_erosion():
    holed = {"type": "Polygon",
             "rings": [np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float),
                       np.array([[4, 4], [6, 4], [6, 6], [4, 6]], float)]}
    res = buffer_geom(holed, -0.5, quad_segs=QS)
    # 9x9 outer minus rounded-rect grown hole (3x3 with rounded corners)
    expect = 81 - (4 + 2 * 4 * 0.5 + ngon_area(0.5, QS))
    assert _area(res) == pytest.approx(expect, abs=1e-9)
    rng = np.random.default_rng(11)
    px = rng.uniform(-1, 11, 4000)
    py = rng.uniform(-1, 11, 4000)
    d = _dist_to_boundary(px, py, holed)
    inside_src = point_in_polygon_geom(px, py, holed)
    got = point_in_polygon_geom(px, py, res)
    must_in = inside_src & (d > 0.5 * 1.001)
    must_out = ~inside_src | (d < 0.5 * COS_M * 0.999)
    assert np.all(got[must_in])
    assert not np.any(got[must_out])


def test_linestring_buffer_montecarlo():
    rng = np.random.default_rng(3)
    line = {"type": "LineString", "coords": np.array([[0, 0], [3, 0], [3, 3], [5, 5]], float)}
    res = buffer_geom(line, 0.4, quad_segs=QS)
    _mc_check_dilation(line, 0.4, res, rng)


def test_point_buffer_is_disc():
    pt = {"type": "Point", "coords": np.array([1.0, 2.0])}
    res = buffer_geom(pt, 1.5, quad_segs=QS)
    assert res["type"] == "Polygon"
    assert _area(res) == pytest.approx(ngon_area(1.5, QS), abs=1e-12)
    np.testing.assert_allclose(res["rings"][0], disc_ngon(1.0, 2.0, 1.5, QS))


def test_multipoint_fuse_and_multipolygon_parts():
    mp = {"type": "MultiPoint",
          "parts": [{"type": "Point", "coords": np.array([0.0, 0.0])},
                    {"type": "Point", "coords": np.array([1.0, 0.0])},
                    {"type": "Point", "coords": np.array([10.0, 0.0])}]}
    res = buffer_geom(mp, 0.8, quad_segs=QS)
    # first two discs overlap -> fuse; third stays separate
    assert res["type"] == "MultiPolygon" and len(res["parts"]) == 2
    areas = sorted(_area(p) for p in res["parts"])
    assert areas[0] == pytest.approx(ngon_area(0.8, QS), abs=1e-12)
    assert areas[1] < 2 * ngon_area(0.8, QS)  # fused pair lost the lens overlap


def test_multipolygon_dilation_fuses_close_parts():
    two = {"type": "MultiPolygon",
           "parts": [{"type": "Polygon", "rings": [np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)]},
                     {"type": "Polygon", "rings": [np.array([[2.5, 0], [4.5, 0], [4.5, 2], [0 + 2.5, 2]], float)]}]}
    res = buffer_geom(two, 0.4, quad_segs=QS)
    assert res["type"] == "Polygon"  # 0.5 gap < 2*0.4 -> fused into one
    rng = np.random.default_rng(5)
    _mc_check_dilation(two, 0.4, res, rng)


def test_union_many_disjoint_and_overlapping():
    sq = lambda x: [np.array([[x, 0], [x + 1, 0], [x + 1, 1], [x, 1]], float)]
    res = union_many([sq(0), sq(0.5), sq(3)])
    areas = sorted(polyclip.rings_signed_area([rs]) for rs in res)
    assert len(res) == 2
    assert areas == pytest.approx([1.0, 1.5])


def test_buffer_stage_distributed(ray_session):
    import pyarrow as pa
    import ray.data

    from geotrellis_ray.core.wkb import decode as wkb_decode
    from geotrellis_ray.core.wkb import encode_polygon
    from geotrellis_ray.stages.overlay import buffer_features

    rows = []
    for i in range(40):
        w, h = 2.0 + i % 3, 1.0 + i % 2
        x0, y0 = (i % 8) * 10.0, (i // 8) * 10.0
        ring = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]
        rows.append({"polygon_id": i, "dist": 0.5 if i % 2 == 0 else -0.75,
                     "wkb": encode_polygon([ring])})
    tab = pa.Table.from_pylist(rows, schema=pa.schema(
        [("polygon_id", pa.int64()), ("dist", pa.float64()), ("wkb", pa.binary())]))
    out = buffer_features(ray.data.from_arrow(tab), dist_col="dist", quad_segs=QS).take_all()
    assert len(out) == 40
    for r in out:
        i = r["polygon_id"]
        w, h, d = 2.0 + i % 3, 1.0 + i % 2, 0.5 if i % 2 == 0 else -0.75
        if d > 0:
            expect = w * h + 2 * (w + h) * d + ngon_area(d, QS)
        else:
            expect = max(w + 2 * d, 0.0) * max(h + 2 * d, 0.0)
        assert r["buf_area"] == pytest.approx(expect, abs=1e-9)
        if expect == 0.0:
            assert r["wkb"] is None
        else:
            assert _area(wkb_decode(r["wkb"])) == pytest.approx(expect, abs=1e-9)
