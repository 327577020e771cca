"""Convex overlay tests: exact rect-rect intersections, convex-clip vs
Monte-Carlo area oracle, and the distributed broadcast stage."""

from __future__ import annotations

import numpy as np
import pytest

from geotrellis_ray.core import wkb
from geotrellis_ray.core.geom import (
    buffer_point,
    clip_polygon_convex,
    point_in_polygon,
    polygon_area,
)


def _rect(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], dtype=np.float64)


def test_clip_convex_rect_rect_exact():
    out = clip_polygon_convex(_rect(0, 0, 10, 10), _rect(5, 5, 20, 20))
    assert out is not None
    assert abs(polygon_area(out) - 25.0) < 1e-12
    # disjoint
    assert clip_polygon_convex(_rect(0, 0, 1, 1), _rect(5, 5, 6, 6)) is None
    # containment both ways
    assert abs(polygon_area(clip_polygon_convex(_rect(2, 2, 4, 4), _rect(0, 0, 10, 10))) - 4.0) < 1e-12
    assert abs(polygon_area(clip_polygon_convex(_rect(0, 0, 10, 10), _rect(2, 2, 4, 4))) - 4.0) < 1e-12


def test_clip_convex_clip_winding_invariance():
    cw_clip = _rect(5, 5, 20, 20)[::-1]
    out = clip_polygon_convex(_rect(0, 0, 10, 10), cw_clip)
    assert abs(polygon_area(out) - 25.0) < 1e-12


def test_clip_convex_vs_monte_carlo():
    """Concave subject x convex (circle) clip: area matches a dense
    point-sample estimate."""
    subject = np.array([(0, 0), (10, 0), (10, 10), (5, 5), (0, 10)], dtype=np.float64)  # concave
    clip = buffer_point(5.0, 4.0, 4.0, n_segments=64)
    out = clip_polygon_convex(subject, clip)
    assert out is not None
    got_area = polygon_area(out)
    rng = np.random.default_rng(3)
    n = 400_000
    px = rng.uniform(-1, 11, n)
    py = rng.uniform(-1, 11, n)
    inside = point_in_polygon(px, py, subject) & point_in_polygon(px, py, clip)
    mc_area = inside.mean() * 12.0 * 12.0
    assert abs(got_area - mc_area) < 0.15, (got_area, mc_area)


def test_overlay_intersection_distributed(ray_session):
    import pyarrow as pa
    import ray.data

    from geotrellis_ray.stages.overlay import overlay_intersection

    lefts = [(_rect(0, 0, 10, 10), 1), (_rect(20, 20, 30, 30), 2), (_rect(8, 8, 12, 12), 3)]
    left_tab = pa.table({
        "polygon_id": pa.array([i for _r, i in lefts], pa.int64()),
        "wkb": pa.array([wkb.encode({"type": "Polygon", "rings": [r]}) for r, _i in lefts], pa.binary()),
    })
    rights = [(_rect(5, 5, 9, 9), 100), (_rect(25, 25, 40, 40), 101)]
    right_tab = pa.table({
        "polygon_id": pa.array([i for _r, i in rights], pa.int64()),
        "wkb": pa.array([wkb.encode({"type": "Polygon", "rings": [r]}) for r, _i in rights], pa.binary()),
    })
    out = overlay_intersection(ray.data.from_arrow(left_tab).repartition(2), right_tab).to_pandas()
    out = out.sort_values(["polygon_id", "right_id"]).reset_index(drop=True)
    got = {(int(r.polygon_id), int(r.right_id)): r.area for r in out.itertuples()}
    assert got == pytest.approx({(1, 100): 16.0, (2, 101): 25.0, (3, 100): 1.0})
    # clipped geometry round-trips through wkb
    g = wkb.decode(out["clipped_wkb"][0])
    assert g["type"] == "Polygon" and abs(polygon_area(g["rings"][0]) - 16.0) < 1e-12


def test_overlay_general_distributed(ray_session):
    """Distributed general overlay: non-convex L-shapes x rects, all three
    ops, against closed-form areas."""
    import pyarrow as pa
    import ray.data

    from geotrellis_ray.stages.overlay import overlay_general

    L = np.array([(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)], dtype=np.float64)
    left = pa.Table.from_pylist(
        [{"polygon_id": 1, "wkb": wkb.encode({"type": "Polygon", "rings": [L]})}],
        schema=pa.schema([("polygon_id", pa.int64()), ("wkb", pa.binary())]))
    right = pa.Table.from_pylist(
        [{"polygon_id": 100, "wkb": wkb.encode({"type": "Polygon", "rings": [_rect(1, 1, 3, 3)]})}],
        schema=pa.schema([("polygon_id", pa.int64()), ("wkb", pa.binary())]))

    inter = overlay_general(ray.data.from_arrow(left), right, op="intersection").to_pandas()
    assert len(inter) == 1 and inter["area"][0] == pytest.approx(3.0)
    uni = overlay_general(ray.data.from_arrow(left), right, op="union").to_pandas()
    assert uni["area"][0] == pytest.approx(12.0 + 4.0 - 3.0)
    diff = overlay_general(ray.data.from_arrow(left), right, op="difference").to_pandas()
    assert diff["area"][0] == pytest.approx(12.0 - 3.0)
    # result geometry round-trips through wkb and is non-convex
    g = wkb.decode(inter["clipped_wkb"][0])
    assert g["type"] in ("Polygon", "MultiPolygon")
