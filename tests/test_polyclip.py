"""General polygon boolean ops (core/polyclip.py) vs independent oracles.

Oracles:
- exact fixtures (closed-form areas, ring/hole structure);
- an exact arrangement-grid oracle for RECTILINEAR inputs: slice the plane at
  every vertex x/y of both polygons, classify each grid cell's midpoint by
  even-odd PIP vs A and B, and sum cell areas where the boolean condition
  holds. Exact because rectilinear boundaries only run along grid lines.
- Monte-Carlo point-classification agreement for arbitrary (non-rectilinear)
  inputs, away from an eps boundary band.
Random dyadic coordinates deliberately force shared edges / vertex-on-edge
degeneracies at high rates.
"""

import numpy as np
import pytest

from geotrellis_ray.core.polyclip import boolean_op, polygon_op, rings_signed_area

R = lambda pts: np.array(pts, dtype=np.float64)


def sq(x0, y0, x1, y1):
    return R([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])


def _pip_even_odd(px, py, rings):
    inside = False
    for r in rings:
        x, y = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        cond = (y <= py) != (y2 <= py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x + (py - y) * (x2 - x) / np.where(y2 - y == 0, 1, y2 - y)
        inside ^= bool(np.count_nonzero(cond & (xi > px)) & 1)
    return inside


def grid_oracle_area(a_rings, b_rings, op):
    xs = np.unique(np.concatenate([r[:, 0] for r in a_rings + b_rings]))
    ys = np.unique(np.concatenate([r[:, 1] for r in a_rings + b_rings]))
    total = 0.0
    for i in range(len(xs) - 1):
        for j in range(len(ys) - 1):
            mx, my = (xs[i] + xs[i + 1]) / 2, (ys[j] + ys[j + 1]) / 2
            ina = _pip_even_odd(mx, my, a_rings)
            inb = _pip_even_odd(mx, my, b_rings)
            hit = {"intersection": ina and inb,
                   "union": ina or inb,
                   "difference": ina and not inb}[op]
            if hit:
                total += (xs[i + 1] - xs[i]) * (ys[j + 1] - ys[j])
    return total


def test_fixture_areas_and_structure():
    a, b = [sq(0, 0, 4, 4)], [sq(2, 2, 6, 6)]
    assert rings_signed_area(polygon_op(a, b, "intersection")) == pytest.approx(4.0)
    assert rings_signed_area(polygon_op(a, b, "union")) == pytest.approx(28.0)
    assert rings_signed_area(polygon_op(a, b, "difference")) == pytest.approx(12.0)
    # identical polygons: full boundary degeneracy
    assert rings_signed_area(polygon_op(a, a, "intersection")) == pytest.approx(16.0)
    assert rings_signed_area(polygon_op(a, a, "union")) == pytest.approx(16.0)
    assert polygon_op(a, a, "difference") == []
    # donut: difference produces a hole
    d = polygon_op([sq(0, 0, 6, 6)], [sq(2, 2, 4, 4)], "difference")
    assert rings_signed_area(d) == pytest.approx(32.0)
    assert len(d) == 1 and len(d[0]) == 2  # one shell + one hole
    # shared-edge adjacency: union merges, intersection is empty (touch only)
    u = polygon_op([sq(0, 0, 2, 2)], [sq(2, 0, 4, 2)], "union")
    assert rings_signed_area(u) == pytest.approx(8.0) and len(u) == 1
    assert polygon_op([sq(0, 0, 2, 2)], [sq(2, 0, 4, 2)], "intersection") == []
    # corner touch: union keeps two rings
    u = polygon_op([sq(0, 0, 2, 2)], [sq(2, 2, 4, 4)], "union")
    assert rings_signed_area(u) == pytest.approx(8.0) and len(u) == 2
    # B slices A in two
    d = polygon_op([sq(0, 0, 6, 2)], [sq(2, -1, 4, 3)], "difference")
    assert rings_signed_area(d) == pytest.approx(8.0) and len(d) == 2
    # non-convex L x rect
    L = R([(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)])
    assert rings_signed_area(polygon_op([L], [sq(1, 1, 3, 3)], "intersection")) == pytest.approx(3.0)
    # subject hole interacts with clip
    r = polygon_op([sq(0, 0, 6, 6), sq(2, 2, 4, 4)], [sq(1, 1, 5, 5)], "intersection")
    assert rings_signed_area(r) == pytest.approx(12.0)
    assert len(r) == 1 and len(r[0]) == 2


def _random_rectilinear(rng):
    """A random simple rectilinear polygon: staircase between two x-monotone
    chains on a dyadic grid (always simple, frequently degenerate vs peers)."""
    n = int(rng.integers(2, 5))
    xs = np.sort(rng.choice(np.arange(0, 17), size=n + 1, replace=False)).astype(float) / 2
    top = rng.integers(5, 9, size=n).astype(float) / 2
    bot = rng.integers(0, 4, size=n).astype(float) / 2
    pts = []
    for i in range(n):  # bottom chain left->right
        pts.append((xs[i], bot[i]))
        pts.append((xs[i + 1], bot[i]))
    for i in range(n - 1, -1, -1):  # top chain right->left
        pts.append((xs[i + 1], top[i]))
        pts.append((xs[i], top[i]))
    out = [pts[0]]
    for p in pts[1:]:
        if p != out[-1]:
            out.append(p)
    if out[0] == out[-1]:
        out.pop()
    return R(out)


@pytest.mark.parametrize("op", ["intersection", "union", "difference"])
def test_random_rectilinear_vs_grid_oracle(op):
    rng = np.random.default_rng(1234)
    for trial in range(40):
        a = [_random_rectilinear(rng)]
        b = [_random_rectilinear(rng)]
        got = rings_signed_area(polygon_op(a, b, op))
        want = grid_oracle_area(a, b, op)
        assert got == pytest.approx(want, abs=1e-6), (trial, op, a, b)


def test_random_convex_intersection_vs_sutherland_hodgman():
    from geotrellis_ray.core.geom import clip_polygon_convex, polygon_area

    rng = np.random.default_rng(7)
    for trial in range(30):
        # random convex polygons via hull of random points
        from geotrellis_ray.core.geom import convex_hull

        pa_ = convex_hull(rng.uniform(0, 10, size=(12, 2)))
        pb_ = convex_hull(rng.uniform(3, 13, size=(12, 2)))
        got = rings_signed_area(polygon_op([pa_], [pb_], "intersection"))
        clipped = clip_polygon_convex(pa_, pb_)
        want = polygon_area(clipped) if clipped is not None else 0.0
        assert got == pytest.approx(want, abs=1e-7), trial


def test_monte_carlo_point_agreement_triangles():
    rng = np.random.default_rng(99)
    for trial in range(10):
        a = [rng.uniform(0, 10, size=(3, 2))]
        b = [rng.uniform(0, 10, size=(3, 2))]
        for op in ("intersection", "union", "difference"):
            res = polygon_op(a, b, op)
            rings = [r for poly in res for r in poly]
            pts = rng.uniform(0, 10, size=(400, 2))
            for px, py in pts:
                ina = _pip_even_odd(px, py, a)
                inb = _pip_even_odd(px, py, b)
                want = {"intersection": ina and inb, "union": ina or inb,
                        "difference": ina and not inb}[op]
                got = _pip_even_odd(px, py, rings) if rings else False
                # skip the eps band around any boundary
                near = _near_boundary(px, py, a + b, 1e-6)
                if not near:
                    assert got == want, (trial, op, px, py)


def _near_boundary(px, py, ring_lists, eps):
    for r in ring_lists:
        x, y = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        dx, dy = x2 - x, y2 - y
        ln2 = np.where(dx * dx + dy * dy == 0, 1, dx * dx + dy * dy)
        t = np.clip(((px - x) * dx + (py - y) * dy) / ln2, 0, 1)
        d2 = (px - (x + t * dx)) ** 2 + (py - (y + t * dy)) ** 2
        if np.min(d2) < eps:
            return True
    return False


def test_boolean_op_dict_bridge_multipolygon():
    # union of two disjoint squares -> MultiPolygon; then subtract one part
    ga = {"type": "Polygon", "rings": [sq(0, 0, 2, 2)]}
    gb = {"type": "Polygon", "rings": [sq(5, 5, 7, 7)]}
    u = boolean_op(ga, gb, "union")
    assert u["type"] == "MultiPolygon" and len(u["parts"]) == 2
    d = boolean_op(u, gb, "difference")
    assert d["type"] == "Polygon"
    assert rings_signed_area([[np.asarray(r) for r in d["rings"]]]) == pytest.approx(4.0)
    i = boolean_op(u, ga, "intersection")
    assert i["type"] == "Polygon"
    assert boolean_op(ga, gb, "intersection") is None
