"""Viewshed tests: the distributed BSP XDraw vs an INDEPENDENT single-
machine implementation of the same published recurrence in ring order, plus
exact-geometry checks on axis rays (where XDraw is exact)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")
import ray.data  # noqa: E402

from geotrellis_ray.core.raster import encode_tile  # noqa: E402
from geotrellis_ray.core.sfc import zorder  # noqa: E402
from geotrellis_ray.stages.viewshed import viewshed, visibility_tile  # noqa: E402

T = 8


def _layer_from(big):
    ny, nx = big.shape[0] // T, big.shape[1] // T
    rows = []
    for c in range(nx):
        for r in range(ny):
            cells, cc, rr, ct = encode_tile(big[r * T:(r + 1) * T, c * T:(c + 1) * T])
            rows.append({"key_col": c, "key_row": r, "sfc": int(zorder(c, r)),
                         "cells": cells, "cols": cc, "rows": rr, "cell_type": ct})
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _xdraw_reference(dem, vr, vc, v_height, nodata="transparent"):
    """Independent single-machine XDraw: ring order, same recurrence.
    NoData: same constant substitution as the distributed impl."""
    rows, cols = dem.shape

    def H_read(H, r, c):
        if 0 <= r < rows and 0 <= c < cols:
            return H[r, c]
        return -np.inf

    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    _dr = (rr - vr).astype(float); _dc = (cc - vc).astype(float)
    dist = np.sqrt(_dr * _dr + _dc * _dc)  # correctly-rounded, matches the spec
    with np.errstate(divide="ignore", invalid="ignore"):
        ang = (dem - v_height) / dist
    ang[dist == 0] = -np.inf
    void = np.isnan(ang)
    ang = np.where(void, -np.inf if nodata == "transparent" else np.inf, ang)
    H = np.full(dem.shape, -np.inf)
    cheb = np.maximum(np.abs(rr - vr), np.abs(cc - vc))
    order = np.argsort(cheb.ravel(), kind="stable")
    for flat in order:
        r, c = divmod(int(flat), cols)
        dr, dc = r - vr, c - vc
        if dr == 0 and dc == 0:
            continue
        if abs(dr) >= abs(dc):
            s = 1 if dr > 0 else -1
            x = vc + dc * (abs(dr) - 1) / abs(dr)
            k0 = int(np.floor(x))
            w = x - k0
            if w == 0:
                h_up = H_read(H, r - s, k0)
            else:
                h_up = (1 - w) * H_read(H, r - s, k0) + w * H_read(H, r - s, k0 + 1)
        else:
            s = 1 if dc > 0 else -1
            y = vr + dr * (abs(dc) - 1) / abs(dc)
            k0 = int(np.floor(y))
            w = y - k0
            if w == 0:
                h_up = H_read(H, k0, c - s)
            else:
                h_up = (1 - w) * H_read(H, k0, c - s) + w * H_read(H, k0 + 1, c - s)
        if np.isnan(h_up):
            h_up = -np.inf
        H[r, c] = max(ang[r, c], h_up)
    vis = H <= ang + 1e-9
    vis[np.isnan(dem)] = False
    vis[vr, vc] = True
    return H, vis


def _run(big, vr, vc, observer_height=0.0, max_rounds=16, nodata="transparent"):
    out, (r, c, vh) = viewshed(_layer_from(big), (vr, vc),
                               observer_height=observer_height,
                               max_rounds=max_rounds, nodata=nodata)
    H = np.full(big.shape, np.nan)
    V = np.zeros(big.shape, dtype=bool)
    for row in out.take_all():
        kc, kr = row["key_col"], row["key_row"]
        h = np.frombuffer(row["horizon"], dtype="<f8").reshape(T, T)
        H[kr * T:(kr + 1) * T, kc * T:(kc + 1) * T] = h
        V[kr * T:(kr + 1) * T, kc * T:(kc + 1) * T] = visibility_tile(row, r, c, vh, T, T)
    return H, V


def test_viewshed_matches_reference(ray_session):
    rng = np.random.default_rng(6)
    big = rng.uniform(0.0, 30.0, (3 * T, 3 * T))
    vr, vc = 11, 13
    H, V = _run(big, vr, vc, observer_height=2.0)
    He, Ve = _xdraw_reference(big, vr, vc, big[vr, vc] + 2.0)
    np.testing.assert_allclose(H, He, atol=1e-9)
    np.testing.assert_array_equal(V, Ve)


def test_viewshed_flat_terrain_all_visible(ray_session):
    big = np.zeros((2 * T, 2 * T))
    _H, V = _run(big, 5, 5, observer_height=1.0)
    assert V.all()


def test_viewshed_wall_shadow_on_axis(ray_session):
    """Exact geometry on the axis ray: a wall east of the viewpoint hides
    the lower cells behind it but not cells tall enough to clear the
    sight line."""
    big = np.zeros((2 * T, 2 * T))
    vr, vc = 8, 2
    big[vr, 6] = 10.0  # wall at distance 4, height 10
    # cell behind the wall at distance 8: sight line height = 10/4*8 = 20
    big[vr, 10] = 19.0   # below the line -> hidden
    big[vr, 12] = 26.0   # line at distance 10 = 25 -> visible
    _H, V = _run(big, vr, vc, observer_height=0.0)
    assert V[vr, 6]          # the wall itself is visible
    assert not V[vr, 7]      # flat ground behind the wall
    assert not V[vr, 10]     # 19 < 20
    assert V[vr, 12]         # 26 > 25


@pytest.mark.parametrize("mode", ["transparent", "opaque"])
def test_viewshed_nodata_voids_match_reference(ray_session, mode):
    """Random DEM with NaN void blobs: distributed result equals the
    independent ring-order oracle under the same NoData convention."""
    rng = np.random.default_rng(17)
    big = rng.uniform(0.0, 30.0, (3 * T, 3 * T))
    # plant voids: two rectangular blobs + scattered single cells
    big[4:7, 10:14] = np.nan
    big[15:18, 3:6] = np.nan
    big.ravel()[rng.choice(big.size, 25, replace=False)] = np.nan
    vr, vc = 11, 13
    big[vr, vc] = 12.0  # viewpoint must have data
    H, V = _run(big, vr, vc, observer_height=2.0, nodata=mode)
    He, Ve = _xdraw_reference(big, vr, vc, big[vr, vc] + 2.0, nodata=mode)
    np.testing.assert_allclose(H, He, atol=1e-9)
    np.testing.assert_array_equal(V, Ve)
    assert not V[np.isnan(big)].any()  # voids are never visible


def test_viewshed_nodata_axis_semantics(ray_session):
    """Exact axis-ray geometry through a void: transparent sees through it,
    opaque hides everything behind it."""
    big = np.zeros((2 * T, 2 * T))
    vr, vc = 8, 2
    big[vr, 6] = np.nan       # void on the sight line at distance 4
    big[vr, 10] = 5.0         # a hill behind the void (angle 5/8)
    big[vr, 12] = 7.0         # clears the hill's sight line (7/10 > 5/8)

    _H, V = _run(big, vr, vc, nodata="transparent")
    assert V[vr, 10] and V[vr, 12]     # ray passes through the void
    assert not V[vr, 6]                # the void itself is not visible

    _H, V = _run(big, vr, vc, nodata="opaque")
    assert not V[vr, 10] and not V[vr, 12]  # void blocks everything behind
    assert V[vr, 5]                          # in front of the void: visible


def test_viewshed_nodata_viewpoint_rejected(ray_session):
    big = np.zeros((2 * T, 2 * T))
    big[5, 5] = np.nan
    with pytest.raises(ValueError, match="NoData"):
        viewshed(_layer_from(big), (5, 5))


def test_angle_distance_is_correctly_rounded_sqrt():
    """The q_viewshed_grid SQL oracle replays angles via DuckDB's
    sqrt(dr^2+dc^2). _angles must therefore use correctly-rounded sqrt of
    the exact integer square sum — np.hypot is only faithfully rounded
    (measured 10/4096 last-ulp deviations on a 64x64 grid) and would break
    the float-for-float horizon parity."""
    import duckdb

    from geotrellis_ray.stages.viewshed import _angles

    dem = np.zeros((64, 64))
    ang = _angles(dem, np.arange(64), np.arange(64), 0, 0, 7.0)
    want = duckdb.sql(
        "SELECT list((0.0 - 7.0) / sqrt(CAST(dr*dr + dc*dc AS DOUBLE))"
        "            ORDER BY dr * 64 + dc) "
        "FROM (SELECT i // 64 AS dr, i % 64 AS dc FROM range(1, 4096) t(i))"
    ).fetchone()[0]
    got = ang.ravel()[1:]
    assert np.array_equal(got, np.array(want))
