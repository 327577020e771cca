"""Distributed viewshed — XDraw horizon propagation over a DEM tile layer
(ref:spark/src/main/scala/geotrellis/spark/viewshed/IterativeViewshed.scala,
L:unverified — /root/reference empty at survey time; the last §2 gap).

Algorithm: the published XDraw approximation (Franklin & Ray 1994). For each
cell, the horizon (max elevation angle seen along the ray back to the
viewpoint) is the linear interpolation of the two upstream cells' horizons
one step closer along the dominant axis; the cell is visible iff its own
angle clears that interpolated horizon. The recurrence is MONOTONE (horizons
only grow), so the BSP collar-exchange loop (stages/costdistance.bsp_round)
converges: each round propagates horizon fronts at least one tile outward.
XDraw is approximate by construction (interpolated horizons); the pytest
oracle is an independent single-machine implementation of the same published
recurrence in strict distance order, which validates the distributed
plumbing exactly, plus exact-geometry checks on axis rays where XDraw is
exact.

NoData (NaN) DEM cells are supported (round 3) under two conventions,
selected by ``nodata``:
- "transparent" (default): a void contributes no terrain — rays pass through
  (its angle is -inf for horizon purposes); the void cell itself is never
  visible.
- "opaque": a void blocks all sight lines through it (+inf horizon); cells
  behind it are hidden; the void cell itself is never visible.
Both substitutions are constants, so the monotone-up recurrence is
unaffected. The viewpoint cell must have data. Viewpoint height is the DEM
value at the viewpoint plus ``observer_height``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.raster import decode_tile
from .costdistance import bsp_round


def _angles(dem: np.ndarray, r_abs: np.ndarray, c_abs: np.ndarray,
            vr: int, vc: int, v_height: float) -> np.ndarray:
    dr = (r_abs[:, None] - vr).astype(np.float64)
    dc = (c_abs[None, :] - vc).astype(np.float64)
    # sqrt(dr^2+dc^2), NOT np.hypot: hypot is only faithfully rounded (glibc,
    # ~1 ulp) while sqrt of the exactly-representable integer dr^2+dc^2 is
    # correctly rounded — measured 10/4096 last-ulp hypot deviations on a
    # 64x64 grid — which is what lets a SQL oracle replay the angle plane
    # bit-for-bit (q_viewshed_grid). Overflow is not a concern at tile scale.
    dist = np.sqrt(dr * dr + dc * dc)
    with np.errstate(divide="ignore", invalid="ignore"):
        ang = (dem - v_height) / dist
    ang[dist == 0] = -np.inf  # the viewpoint itself
    return ang


def xdraw_relax(hbuf: np.ndarray, dembuf: np.ndarray, kc: int, kr: int, m: int,
                vr: int, vc: int, v_height: float, tile_rows: int, tile_cols: int,
                nodata: str = "transparent") -> np.ndarray:
    """One tile's XDraw sweep to local fixpoint over the collar-buffered
    horizon plane. Upstream cells are at most one row/col closer, so a
    margin-1 collar suffices."""
    rows, cols = hbuf.shape
    r_abs = kr * tile_rows + (np.arange(rows) - m)
    c_abs = kc * tile_cols + (np.arange(cols) - m)
    ang = _angles(dembuf, r_abs, c_abs, vr, vc, v_height)
    # NoData substitution: transparent voids contribute no terrain (-inf),
    # opaque voids block everything behind them (+inf). Constant either way,
    # so monotonicity holds.
    void = np.isnan(ang)
    if void.any():
        ang = np.where(void, -np.inf if nodata == "transparent" else np.inf, ang)
    drm = r_abs[:, None] - vr  # (rows, 1)
    dcm = c_abs[None, :] - vc  # (1, cols)
    adr = np.broadcast_to(np.abs(drm), (rows, cols)).astype(np.float64)
    adc = np.broadcast_to(np.abs(dcm), (rows, cols)).astype(np.float64)
    sr = np.sign(np.broadcast_to(drm, (rows, cols))).astype(np.int64)
    sc = np.sign(np.broadcast_to(dcm, (rows, cols))).astype(np.int64)
    ii, jj = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")

    row_major = adr >= adc
    with np.errstate(divide="ignore", invalid="ignore"):
        # crossing position one step back along the dominant axis
        x_cross = vc + np.broadcast_to(dcm, (rows, cols)) * (adr - 1) / adr     # when row-major
        y_cross = vr + np.broadcast_to(drm, (rows, cols)) * (adc - 1) / adc     # when col-major
    h = hbuf.copy()
    with np.errstate(invalid="ignore"):
        k0f = np.floor(x_cross)
        k0yf = np.floor(y_cross)
    k0 = np.nan_to_num(k0f, nan=0.0, posinf=0.0, neginf=0.0).astype(np.int64)
    k0y = np.nan_to_num(k0yf, nan=0.0, posinf=0.0, neginf=0.0).astype(np.int64)
    # only cells whose upstream pair lies FULLY inside the buffer may update:
    # a clipped upstream read could overshoot the horizon, and the recurrence
    # is monotone-up (an overshoot would never heal). Excluded cells keep
    # their exchanged value — the outermost collar ring, by construction.
    w = np.nan_to_num(x_cross - k0, nan=0.0)
    wy = np.nan_to_num(y_cross - k0y, nan=0.0)
    up_i_raw = ii - sr
    j0_raw = k0 - (kc * tile_cols - m)
    # w == 0 reads only the k0 endpoint, so k0+1 may fall outside the buffer
    valid_row = (
        row_major & ~np.isnan(x_cross)
        & (up_i_raw >= 0) & (up_i_raw < rows)
        & (j0_raw >= 0) & ((w == 0) & (j0_raw < cols) | (j0_raw + 1 < cols))
    )
    up_j_raw = jj - sc
    i0_raw = k0y - (kr * tile_rows - m)
    valid_col = (
        ~row_major & ~np.isnan(y_cross)
        & (up_j_raw >= 0) & (up_j_raw < cols)
        & (i0_raw >= 0) & ((wy == 0) & (i0_raw < rows) | (i0_raw + 1 < rows))
    )
    up_i = np.clip(up_i_raw, 0, rows - 1)
    j0 = np.clip(j0_raw, 0, cols - 1)
    j1 = np.clip(j0_raw + 1, 0, cols - 1)
    up_j = np.clip(up_j_raw, 0, cols - 1)
    i0 = np.clip(i0_raw, 0, rows - 1)
    i1 = np.clip(i0_raw + 1, 0, rows - 1)
    at_vp = (adr == 0) & (adc == 0)
    for _ in range(rows + cols):
        prev = h
        # w==0 must read ONLY the k0 endpoint: 0 * (-inf) is NaN, which would
        # otherwise swallow the finite endpoint
        with np.errstate(invalid="ignore"):
            h_up_row = np.where(w == 0, h[up_i, j0],
                                (1 - w) * h[up_i, j0] + w * h[up_i, j1])
            h_up_col = np.where(wy == 0, h[i0, up_j],
                                (1 - wy) * h[i0, up_j] + wy * h[i1, up_j])
        h_up = np.where(valid_row, h_up_row, np.where(valid_col, h_up_col, np.nan))
        # keep +-inf intact (opaque voids carry +inf horizons); only NaN
        # (interpolation between +inf and -inf, or no valid upstream) drops
        new = np.maximum(ang, np.nan_to_num(h_up, nan=-np.inf,
                                            posinf=np.inf, neginf=-np.inf))
        new = np.where(at_vp, -np.inf, new)
        upd = valid_row | valid_col | at_vp
        # monotone: never decrease (collar info may still be partial)
        h = np.where(upd, np.maximum(h, new), h)
        if np.array_equal(h, prev):
            break
    return h


def viewshed(dem_ds, viewpoint: tuple[int, int], observer_height: float = 0.0,
             tile_rows: int | None = None, tile_cols: int | None = None,
             max_rounds: int = 64, nodata: str = "transparent"):
    """DEM layer + viewpoint (absolute cell_row, cell_col) -> layer with a
    ``horizon`` plane and a per-cell visibility derivable as
    ``angle >= horizon`` (see ``visibility_tile``). BSP rounds until no
    tile's horizon core changes. ``nodata``: "transparent" | "opaque" (see
    module docstring)."""
    if nodata not in ("transparent", "opaque"):
        raise ValueError(f"unknown nodata convention {nodata!r}")
    vr, vc = int(viewpoint[0]), int(viewpoint[1])

    first = dem_ds.take(1)[0]
    t_rows = tile_rows or int(first["rows"])
    t_cols = tile_cols or int(first["cols"])

    # viewpoint height: read the one tile containing it (driver-side point
    # lookup, same as ValueReader)
    vkc, vkr = vc // t_cols, vr // t_rows
    v_height = None
    for row in dem_ds.filter(expr=f"key_col == {vkc} and key_row == {vkr}").take(1):
        a = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
        v_height = float(a[vr % t_rows, vc % t_cols]) + observer_height
    if v_height is None:
        raise ValueError("viewpoint is outside the layer")
    if np.isnan(v_height):
        raise ValueError("viewpoint cell is NoData")

    def init(batch: pa.Table) -> pa.Table:
        hs = []
        for row in batch.to_pylist():
            shape = (int(row["rows"]), int(row["cols"]))
            hs.append(np.full(shape, -np.inf).astype("<f8").tobytes())
        return batch.append_column("horizon", pa.array(hs, pa.binary()))

    cur = dem_ds.map_batches(init, batch_format="pyarrow", zero_copy_batch=True)

    def relax(hbuf, dembuf, kc, kr, m):
        return xdraw_relax(hbuf, dembuf, kc, kr, m, vr, vc, v_height, t_rows,
                           t_cols, nodata=nodata)

    for _round in range(max_rounds):
        nxt = bsp_round(cur, relax, margin=1, plane_col="horizon",
                        collar_fill=-np.inf).materialize()
        n_changed = nxt.filter(expr="changed == True").count()
        cur = nxt.drop_columns(["changed"])
        if n_changed == 0:
            break
    return cur, (vr, vc, v_height)


def visibility_tile(row: dict, vr: int, vc: int, v_height: float,
                    tile_rows: int, tile_cols: int, tol: float = 1e-9) -> np.ndarray:
    """Result row -> boolean visibility plane (angle clears the horizon)."""
    dem = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
    h = np.frombuffer(row["horizon"], dtype="<f8").reshape(dem.shape)
    r_abs = row["key_row"] * tile_rows + np.arange(dem.shape[0])
    c_abs = row["key_col"] * tile_cols + np.arange(dem.shape[1])
    ang = _angles(dem, r_abs, c_abs, vr, vc, v_height)
    with np.errstate(invalid="ignore"):
        vis = h <= ang + tol
    vis[np.isnan(dem)] = False  # NoData cells are never visible
    vis[(r_abs[:, None] == vr) & (c_abs[None, :] == vc)] = True
    return vis
