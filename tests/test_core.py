"""Oracle tests for the pure core modules (no Ray)."""

import numpy as np
import pytest

from geotrellis_ray.core import cellid, geom, layout, mercator, sfc, text, wkb
from geotrellis_ray.core.geocode import (
    geocode_batch,
    geotag_coords,
    hash_coords,
    url_hash64,
    url_hash64_batch,
)
from geotrellis_ray.core.histogram import FastMapHistogram, StreamingHistogram
from geotrellis_ray.core.strtree import STRtree
from tests import oracle

rng = np.random.default_rng(42)


# ---------------------------------------------------------------- text

HTML = (
    b"<html><head><title>Page 7</title>"
    b'<meta name="geo.position" content="40.123456;-74.654321">'
    b"<script>var x = '<p>no</p>';</script><style>p { color: red }</style>"
    b"</head><body><h1>Page 7</h1><p>Hello &amp;lt; world &lt;b&gt; &quot;q&#39; \t\n multi   space</p></body></html>"
)


def test_extract_text_spec():
    t = text.extract_text(HTML)
    assert t == "Page 7 Page 7 Hello &lt; world <b> \"q' multi space"


def test_extract_text_arrow_matches_python():
    import pyarrow as pa

    htmls = [HTML, b"<p>a</p>", b"", b"plain no tags", b"<a href=x>y</a>\xff\xfe trailing"]
    col = pa.array(htmls, type=pa.binary())
    got = text.extract_text_arrow(col).to_pylist()
    want = [text.extract_text(h) for h in htmls]
    assert got == want


# ---------------------------------------------------------------- geocode

def test_url_hash_deterministic():
    urls = [f"https://site{i}.example/p/{i}" for i in range(100)]
    h = url_hash64_batch(urls)
    assert int(h[3]) == url_hash64(urls[3])
    lat, lon = hash_coords(h)
    assert ((lat >= -85.06) & (lat <= 85.06)).all()
    assert ((lon >= -180.0) & (lon <= 180.0)).all()
    # skew model: ~80% of rows land in a cluster box
    from geotrellis_ray.core.geocode import CLUSTERS

    in_cluster = np.zeros(len(urls), dtype=bool)
    for clat, clon in CLUSTERS:
        in_cluster |= (np.abs(lat - clat) <= 1.0) & (np.abs(lon - clon) <= 1.0)
    assert 0.6 < in_cluster.mean() <= 1.0


def test_geotag_override():
    url = "https://x.example/1"
    h = url_hash64(url)
    glat, glon = geotag_coords(h)
    html = f'<meta name="geo.position" content="{glat:.6f};{glon:.6f}">'.encode()
    lat, lon, hh = geocode_batch([url], [html])
    assert lat[0] == pytest.approx(glat, abs=1e-9)
    assert lon[0] == pytest.approx(glon, abs=1e-9)
    lat2, lon2, _ = geocode_batch([url], [b"<p>no tag</p>"])
    base = hash_coords(np.array([h], dtype=np.uint64))
    assert lat2[0] == base[0][0] and lon2[0] == base[1][0]


# ---------------------------------------------------------------- mercator

def test_mercator_roundtrip():
    lat = rng.uniform(-85, 85, 1000)
    lon = rng.uniform(-180, 180, 1000)
    x, y = mercator.latlng_to_webmercator(lat, lon)
    la2, lo2 = mercator.webmercator_to_latlng(x, y)
    np.testing.assert_allclose(la2, lat, atol=1e-9)
    np.testing.assert_allclose(lo2, lon, atol=1e-9)
    assert abs(mercator.latlng_to_webmercator(0.0, 180.0)[0] - mercator.WORLD) < 1e-6


def test_haversine_known():
    # NYC -> London ~ 5570 km
    d = mercator.haversine_m(40.7128, -74.0060, 51.5074, -0.1278)
    assert 5.5e6 < d < 5.6e6


# ---------------------------------------------------------------- layout

def test_xy_to_key_oracle():
    scheme = layout.ZoomedLayoutScheme("webmercator", 256)
    lo = scheme.layout_for_zoom(4)
    xs = rng.uniform(-mercator.WORLD, mercator.WORLD, 500)
    ys = rng.uniform(-mercator.WORLD, mercator.WORLD, 500)
    cols, rows = lo.xy_to_key(xs, ys)
    ext = lo.extent.to_tuple()
    for i in range(500):
        c, r = oracle.tile_key_scalar(xs[i], ys[i], ext, 16, 16)
        assert (cols[i], rows[i]) == (c, r)
    # world edges clamp
    c, r = lo.xy_to_key(mercator.WORLD, -mercator.WORLD)
    assert (int(c), int(r)) == (15, 15)


def test_key_extent_roundtrip():
    lo = layout.ZoomedLayoutScheme("webmercator").layout_for_zoom(3)
    e = lo.key_to_extent(2, 5)
    cx, cy = (e.xmin + e.xmax) / 2, (e.ymin + e.ymax) / 2
    c, r = lo.xy_to_key(cx, cy)
    assert (int(c), int(r)) == (2, 5)
    b = lo.extent_to_bounds(e)
    assert b == (2, 5, 2, 5)  # boundary-touch neighbours excluded


def test_floating_layout_covers_data():
    fl = layout.FloatingLayoutScheme(4)
    lo = fl.layout_for(layout.Extent(0, 0, 10, 6), 1.0, 1.0)
    assert lo.tile_layout.layout_cols == 3 and lo.tile_layout.layout_rows == 2
    assert lo.extent.xmin == 0 and lo.extent.ymax == 6


# ---------------------------------------------------------------- sfc

def test_zorder_oracle_roundtrip():
    cols = rng.integers(0, 2**20, 300)
    rows = rng.integers(0, 2**20, 300)
    z = sfc.zorder(cols, rows)
    for i in range(300):
        assert int(z[i]) == oracle.zorder_scalar(int(cols[i]), int(rows[i]))
    c2, r2 = sfc.zorder_decode(z)
    np.testing.assert_array_equal(c2, cols)
    np.testing.assert_array_equal(r2, rows)


@pytest.mark.parametrize("order", [1, 2, 4, 8])
def test_hilbert_oracle_roundtrip(order):
    n = 1 << order
    if n <= 16:
        cols, rows = np.meshgrid(np.arange(n), np.arange(n))
        cols, rows = cols.ravel(), rows.ravel()
    else:
        cols = rng.integers(0, n, 500)
        rows = rng.integers(0, n, 500)
    d = sfc.hilbert(cols, rows, order)
    for i in range(len(cols)):
        assert int(d[i]) == oracle.hilbert_scalar(int(cols[i]), int(rows[i]), order)
    c2, r2 = sfc.hilbert_decode(d, order)
    np.testing.assert_array_equal(c2, cols)
    np.testing.assert_array_equal(r2, rows)
    if n <= 16:  # bijection over the full grid
        assert len(np.unique(d)) == n * n


def test_hilbert_adjacency():
    # consecutive hilbert indices are adjacent cells (property test)
    order = 6
    n = 1 << order
    d = np.arange(n * n, dtype=np.uint64)
    x, y = sfc.hilbert_decode(d, order)
    step = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (step == 1).all()


def test_zorder_ranges_exact():
    zoom = 5
    for (c0, r0, c1, r1) in [(3, 4, 11, 9), (0, 0, 31, 31), (7, 7, 7, 7), (0, 30, 31, 31)]:
        ranges = sfc.zorder_ranges(c0, r0, c1, r1, zoom)
        cells = set()
        for lo, hi in ranges:
            cells.update(range(lo, hi + 1))
        cols, rows = np.meshgrid(np.arange(c0, c1 + 1), np.arange(r0, r1 + 1))
        want = set(int(v) for v in sfc.zorder(cols.ravel(), rows.ravel()))
        assert cells == want
        assert all(ranges[i][1] < ranges[i + 1][0] for i in range(len(ranges) - 1))


def test_hilbert_ranges_exact_small():
    zoom = 4
    ranges = sfc.hilbert_ranges(2, 3, 9, 12, zoom)
    cells = set()
    for lo, hi in ranges:
        cells.update(range(lo, hi + 1))
    cols, rows = np.meshgrid(np.arange(2, 10), np.arange(3, 13))
    want = set(int(v) for v in sfc.hilbert(cols.ravel(), rows.ravel(), zoom))
    assert cells == want


# ---------------------------------------------------------------- cellid

def test_s2like_levels_nest():
    lat = rng.uniform(-89, 89, 400)
    lon = rng.uniform(-180, 180, 400)
    c12 = cellid.cell_s2like(lat, lon, 12)
    c8 = cellid.cell_s2like(lat, lon, 8)
    np.testing.assert_array_equal(cellid.s2like_parent(c12, 8), c8)
    assert (cellid.s2like_level(c12) == 12).all()
    # same point -> same cell; nearby points at low level -> same cell
    c_a = cellid.cell_s2like([40.0], [30.0], 8)
    c_b = cellid.cell_s2like([40.0001], [30.0001], 8)
    assert c_a[0] == c_b[0]


def test_s2like_distinct_faces():
    pts = [(0, 0), (0, 180), (0, 90), (0, -90), (89.9, 0), (-89.9, 0)]
    cells = cellid.cell_s2like([p[0] for p in pts], [p[1] for p in pts], 4)
    faces = (np.asarray(cells) >> np.uint64(61)).astype(int)
    assert len(set(faces.tolist())) == 6


def test_hex_roundtrip_and_rings():
    lat = rng.uniform(-80, 80, 500)
    lon = rng.uniform(-179, 179, 500)
    for res in (2, 5):
        cid = cellid.cell_hexlike(lat, lon, res)
        q, r, res2 = cellid.hex_unpack(cid)
        assert (res2 == res).all()
        clat, clon = cellid.hex_center(q, r, res)
        # every point is within one circumradius of its hex center
        size = cellid.hex_size(res)
        d = np.sqrt((clat - lat) ** 2 + (clon - lon) ** 2)
        assert (d <= size * 1.0001).all()
    assert len(cellid.hex_ring(0, 0, 1)) == 6
    assert len(cellid.hex_ring(2, -1, 3)) == 18
    assert len(cellid.hex_disk(0, 0, 2)) == 19
    # center must map back to its own cell
    q0, r0 = 5, -3
    clat, clon = cellid.hex_center(np.array([q0]), np.array([r0]), 4)
    cid = cellid.cell_hexlike(clat, clon, 4)
    q1, r1, _ = cellid.hex_unpack(cid)
    assert (int(q1[0]), int(r1[0])) == (q0, r0)


# ---------------------------------------------------------------- wkb + geom

def test_wkb_roundtrip():
    ring = np.array([(0, 0), (4, 0), (4, 3), (0, 3)], dtype=float)
    poly = {"type": "Polygon", "rings": [ring]}
    dec = wkb.decode(wkb.encode(poly))
    assert dec["type"] == "Polygon"
    np.testing.assert_allclose(dec["rings"][0][:-1], ring)
    pt = wkb.decode(wkb.encode_point(1.5, -2.5))
    np.testing.assert_allclose(pt["coords"], [1.5, -2.5])
    ls = {"type": "LineString", "coords": np.array([(0, 0), (1, 1), (2, 0)], dtype=float)}
    np.testing.assert_allclose(wkb.decode(wkb.encode(ls))["coords"], ls["coords"])
    mp = {"type": "MultiPolygon", "parts": [poly, poly]}
    dec = wkb.decode(wkb.encode(mp))
    assert dec["type"] == "MultiPolygon" and len(dec["parts"]) == 2


def test_pip_oracle():
    # convex + concave polygon vs scalar oracle
    concave = np.array([(0, 0), (6, 0), (6, 6), (3, 3), (0, 6)], dtype=float)
    px = rng.uniform(-1, 7, 2000)
    py = rng.uniform(-1, 7, 2000)
    got = geom.point_in_polygon(px, py, concave)
    for i in range(0, 2000, 7):
        assert got[i] == oracle.pip_scalar(px[i], py[i], concave)


def test_pip_holes():
    shell = np.array([(0, 0), (10, 0), (10, 10), (0, 10)], dtype=float)
    hole = np.array([(4, 4), (6, 4), (6, 6), (4, 6)], dtype=float)
    g = {"type": "Polygon", "rings": [shell, hole]}
    inside = geom.point_in_polygon_geom(np.array([5.0, 2.0, 11.0]), np.array([5.0, 2.0, 5.0]), g)
    assert inside.tolist() == [False, True, False]


def test_clip_polygon_rect():
    ring = np.array([(0, 0), (10, 0), (10, 10), (0, 10)], dtype=float)
    clipped = geom.clip_polygon_rect(ring, 5, 5, 15, 15)
    assert clipped is not None
    assert geom.polygon_area(clipped) == pytest.approx(25.0)
    assert geom.clip_polygon_rect(ring, 11, 11, 20, 20) is None
    # clip fully-containing rect returns original area
    clipped = geom.clip_polygon_rect(ring, -5, -5, 15, 15)
    assert geom.polygon_area(clipped) == pytest.approx(100.0)


def test_clip_linestring():
    coords = np.array([(-5, 5), (5, 5), (5, -5)], dtype=float)
    parts = geom.clip_linestring_rect(coords, 0, 0, 10, 10)
    assert len(parts) == 1
    np.testing.assert_allclose(parts[0], [(0, 5), (5, 5), (5, 0)])
    # fully outside
    assert geom.clip_linestring_rect(np.array([(20, 20), (30, 30)], dtype=float), 0, 0, 10, 10) == []


def test_area_centroid_hull():
    ring = np.array([(0, 0), (4, 0), (4, 2), (0, 2)], dtype=float)
    assert geom.polygon_area(ring) == pytest.approx(8.0)
    assert geom.polygon_centroid(ring) == pytest.approx((2.0, 1.0))
    pts = rng.uniform(0, 1, (100, 2))
    hull = geom.convex_hull(pts)
    inside = geom.point_in_polygon(pts[:, 0], pts[:, 1], hull)
    on_hull = np.array([any(np.allclose(p, h) for h in hull) for p in pts])
    assert (inside | on_hull).all()


# ---------------------------------------------------------------- strtree

def test_strtree_query_oracle():
    boxes = np.column_stack(
        [rng.uniform(0, 90, 300), rng.uniform(0, 90, 300), np.zeros(300), np.zeros(300)]
    )
    boxes[:, 2] = boxes[:, 0] + rng.uniform(0.1, 10, 300)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(0.1, 10, 300)
    tree = STRtree(boxes, node_capacity=8)
    for _ in range(20):
        q = (rng.uniform(0, 80), rng.uniform(0, 80))
        qbox = (q[0], q[1], q[0] + 15, q[1] + 15)
        got = set(tree.query(*qbox).tolist())
        want = set(
            int(i)
            for i in range(300)
            if not (boxes[i, 0] > qbox[2] or boxes[i, 2] < qbox[0] or boxes[i, 1] > qbox[3] or boxes[i, 3] < qbox[1])
        )
        assert got == want


def test_strtree_point_probe_oracle():
    boxes = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30], [8, 0, 9, 1]], dtype=float)
    tree = STRtree(boxes, node_capacity=2)
    xs = np.array([1.0, 7.0, 25.0, 8.5, 50.0])
    ys = np.array([1.0, 7.0, 25.0, 0.5, 50.0])
    pi, bi = tree.query_points(xs, ys)
    pairs = set(zip(pi.tolist(), bi.tolist()))
    assert pairs == {(0, 0), (1, 0), (1, 1), (2, 2), (3, 0), (3, 3)}


def test_strtree_empty_and_single():
    t = STRtree(np.empty((0, 4)))
    assert len(t.query(0, 0, 1, 1)) == 0
    t1 = STRtree(np.array([[0.0, 0.0, 1.0, 1.0]]))
    assert t1.query(0.5, 0.5, 2, 2).tolist() == [0]
    assert t1.query(2, 2, 3, 3).tolist() == []


# ---------------------------------------------------------------- histograms

def test_streaming_histogram_stats():
    vals = rng.normal(100, 15, 20000)
    h = StreamingHistogram(80)
    # update in chunks then merge two halves (partial+final pattern)
    h1 = StreamingHistogram(80).update(vals[:10000])
    h2 = StreamingHistogram(80).update(vals[10000:])
    h = StreamingHistogram.from_dict(h1.to_dict()).merge(h2)
    assert h.total() == pytest.approx(20000)
    assert h.mean() == pytest.approx(vals.mean(), rel=0.01)
    assert h.min() <= vals.min() + 1e-9 and h.max() >= vals.max() - 1e-9
    breaks = h.quantile_breaks(4)
    true_breaks = np.quantile(vals, [0.25, 0.5, 0.75])
    np.testing.assert_allclose(breaks, true_breaks, rtol=0.05)


def test_fastmap_histogram():
    vals = rng.integers(0, 10, 5000)
    h1 = FastMapHistogram().update(vals[:2500])
    h2 = FastMapHistogram().update(vals[2500:])
    h = FastMapHistogram.from_dict(h1.to_dict()).merge(h2)
    assert h.total() == 5000
    for v in range(10):
        assert h.item_count(v) == int((vals == v).sum())
    assert h.mode() == int(np.bincount(vals).argmax())


def test_fastmap_exact_quantile_breaks():
    """Exact classBreaks rule: break i = smallest v with cum(v)*n >= total*i.
    Brute per-element oracle over skewed integer data, merge-invariant."""
    vals = rng.geometric(0.02, 4000) + rng.integers(0, 3, 4000)
    h = FastMapHistogram().update(vals[:1000]).merge(FastMapHistogram().update(vals[1000:]))
    for n in (2, 4, 8, 10):
        got = h.quantile_breaks(n)
        assert len(got) == n - 1
        sv = np.sort(vals)
        total = len(sv)
        for i, b in enumerate(got, start=1):
            # brute: smallest distinct value whose cum count * n >= total * i
            uniq = np.unique(sv)
            cum = np.searchsorted(sv, uniq, side="right")
            exp = uniq[np.nonzero(cum * n >= total * i)[0][0]]
            assert b == exp, (n, i)
    assert FastMapHistogram().quantile_breaks(4) == []
    single = FastMapHistogram().update(np.array([7, 7, 7]))
    assert single.quantile_breaks(4) == [7, 7, 7]
