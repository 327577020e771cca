"""Brute-force, deliberately naive oracles (scalar Python, O(n*m)) used to
verify the vectorized/distributed engine — the reference's own
"distributed == local oracle" test pattern (SURVEY.md §5)."""

from __future__ import annotations

import math

import numpy as np


def zorder_scalar(col: int, row: int) -> int:
    z = 0
    for b in range(32):
        z |= ((col >> b) & 1) << (2 * b)
        z |= ((row >> b) & 1) << (2 * b + 1)
    return z


def hilbert_scalar(x: int, y: int, order: int) -> int:
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def pip_scalar(px: float, py: float, ring) -> bool:
    """Textbook even-odd crossing test, scalar (independent of the vectorized
    engine implementation, same half-open edge rule)."""
    inside = False
    n = len(ring)
    pts = list(ring)
    if tuple(pts[0]) == tuple(pts[-1]):
        pts = pts[:-1]
        n -= 1
    j = n - 1
    for i in range(n):
        x1, y1 = pts[i]
        x2, y2 = pts[j]
        if (y1 > py) != (y2 > py):
            xi = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xi:
                inside = not inside
        j = i
    return inside


def tile_key_scalar(x: float, y: float, extent, ncols: int, nrows: int):
    tw = (extent[2] - extent[0]) / ncols
    th = (extent[3] - extent[1]) / nrows
    col = min(max(int(math.floor((x - extent[0]) / tw)), 0), ncols - 1)
    row = min(max(int(math.floor((extent[3] - y) / th)), 0), nrows - 1)
    return col, row


def knn_scalar(points: list[tuple[int, float, float]], qlat: float, qlon: float, k: int):
    """k nearest (by haversine then id tiebreak) -> list of ids."""
    from geotrellis_ray.core.mercator import haversine_m

    scored = sorted(
        ((float(haversine_m(lat, lon, qlat, qlon)), pid) for pid, lat, lon in points),
        key=lambda t: (t[0], t[1]),
    )
    return [pid for _, pid in scored[:k]]


def rasterize_scalar(geom: dict, extent, cols: int, rows: int) -> np.ndarray:
    """Cell-center rasterize oracle over the whole grid, scalar PIP."""
    from tests.oracle import pip_scalar as pip

    grid = np.zeros((rows, cols), dtype=bool)
    cw = (extent[2] - extent[0]) / cols
    ch = (extent[3] - extent[1]) / rows
    for r in range(rows):
        cy = extent[3] - (r + 0.5) * ch
        for c in range(cols):
            cx = extent[0] + (c + 0.5) * cw
            if geom["type"] == "Polygon":
                inside = pip(cx, cy, geom["rings"][0])
                for hole in geom["rings"][1:]:
                    inside = inside and not pip(cx, cy, hole)
            elif geom["type"] == "MultiPolygon":
                inside = any(
                    pip(cx, cy, p["rings"][0]) and not any(pip(cx, cy, h) for h in p["rings"][1:])
                    for p in geom["parts"]
                )
            else:
                raise ValueError(geom["type"])
            grid[r, c] = inside
    return grid
