"""Delaunay triangulation (Bowyer–Watson) + barycentric TIN interpolation —
the reference's triangulation/TIN family
(ref:vector/src/main/scala/geotrellis/vector/triangulation/,
ref:raster/src/main/scala/geotrellis/raster/triangulation/
DelaunayRasterizer.scala, L:unverified — /root/reference empty at survey
time). From-spec re-implementation of the published incremental algorithm
(Bowyer 1981 / Watson 1981), not a port.

Numpy-vectorized: each insertion tests ALL current triangles' circumcircles
at once (O(n·T) total — fine for the per-tile / broadcast-sample sizes this
engine builds TINs from; the distributed shape is "small sample side,
surface streamed per tile", stages/interpolation.py).

The Delaunay property is its own oracle: tests verify NO point lies strictly
inside any triangle's circumcircle, and that the triangulation tiles the
convex hull (area identity). TIN interpolation reproduces affine functions
exactly — the second oracle.
"""

from __future__ import annotations

import numpy as np


def delaunay(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """-> (m, 3) int64 vertex indices of the Delaunay triangles.

    Bowyer-Watson with a LARGE super-triangle (1e5 x span — its circumarcs
    deviate from straight hull chords by only span/1e5, which is what made
    a small super-triangle cut hull slivers) and a deterministic
    symbolic-scale jitter (1e-7 x span, splitmix-derived per index) that
    breaks collinear/cocircular ties (grids) decisively above the float64
    noise of the centered circumcircle computation. Output indices refer to
    the ORIGINAL coordinates; triangles degenerate in original coordinates
    (jitter-only area) are dropped. The Delaunay empty-circumcircle property
    holds on original coordinates to ~1e-5 relative (the jitter scale),
    which the property tests verify."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    cx, cy = xs.mean(), ys.mean()
    span = max(xs.max() - xs.min(), ys.max() - ys.min(), 1e-9)
    big = 1e5 * span
    idx = np.arange(n, dtype=np.uint64)
    z = (idx + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(31)
    jx = ((z & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2**32 - 0.5) * span * 1e-7
    jy = (((z >> np.uint64(32)).astype(np.float64)) / 2**32 - 0.5) * span * 1e-7
    px = np.r_[xs + jx, cx - big, cx + big, cx]
    py = np.r_[ys + jy, cy - big / 2, cy - big / 2, cy + big]

    def circum(tv):
        # centered at the triangle centroid: keeps the squared terms small
        # even for super-triangle members at 1e5*span
        ax, ay = px[tv[:, 0]], py[tv[:, 0]]
        bx, by = px[tv[:, 1]], py[tv[:, 1]]
        cxx, cyy = px[tv[:, 2]], py[tv[:, 2]]
        ox = (ax + bx + cxx) / 3.0
        oy = (ay + by + cyy) / 3.0
        ax, bx, cxx = ax - ox, bx - ox, cxx - ox
        ay, by, cyy = ay - oy, by - oy, cyy - oy
        d = 2.0 * (ax * (by - cyy) + bx * (cyy - ay) + cxx * (ay - by))
        d = np.where(np.abs(d) < 1e-300, 1e-300, d)
        a2 = ax * ax + ay * ay
        b2 = bx * bx + by * by
        c2 = cxx * cxx + cyy * cyy
        ux = (a2 * (by - cyy) + b2 * (cyy - ay) + c2 * (ay - by)) / d
        uy = (a2 * (cxx - bx) + b2 * (ax - cxx) + c2 * (bx - ax)) / d
        r2 = (ux - ax) ** 2 + (uy - ay) ** 2
        return ux + ox, uy + oy, r2

    tv = np.array([[n, n + 1, n + 2]], dtype=np.int64)
    ccx, ccy, cr2 = circum(tv)

    order = np.argsort(px[:n] + py[:n] * 1e-6, kind="stable")  # locality
    for p in order:
        dx = px[p] - ccx
        dy = py[p] - ccy
        bad = dx * dx + dy * dy <= cr2
        if not bad.any():  # numerically unreachable; deterministic fallback
            bad = np.zeros(len(tv), dtype=bool)
            bad[np.argmin(dx * dx + dy * dy - cr2)] = True
        # boundary of the star-shaped cavity = edges appearing exactly once
        cav = tv[bad]
        edges = np.concatenate([cav[:, [0, 1]], cav[:, [1, 2]], cav[:, [2, 0]]])
        ekey = np.sort(edges, axis=1)
        _, inv, cnt = np.unique(ekey, axis=0, return_inverse=True, return_counts=True)
        boundary = edges[cnt[inv] == 1]
        new = np.empty((len(boundary), 3), dtype=np.int64)
        new[:, 0] = boundary[:, 0]
        new[:, 1] = boundary[:, 1]
        new[:, 2] = p
        keep = ~bad
        tv = np.concatenate([tv[keep], new])
        nx_, ny_, nr_ = circum(new)
        ccx = np.concatenate([ccx[keep], nx_])
        ccy = np.concatenate([ccy[keep], ny_])
        cr2 = np.concatenate([cr2[keep], nr_])

    out = tv[(tv < n).all(axis=1)]
    # drop slivers degenerate in the ORIGINAL coordinates (jitter-only area)
    area2 = np.abs(
        (xs[out[:, 1]] - xs[out[:, 0]]) * (ys[out[:, 2]] - ys[out[:, 0]])
        - (ys[out[:, 1]] - ys[out[:, 0]]) * (xs[out[:, 2]] - xs[out[:, 0]]))
    out = out[area2 > 1e-12 * span * span]
    # canonical orientation (CCW) + canonical vertex order for determinism
    ax, ay = px[out[:, 0]], py[out[:, 0]]
    bx, by = px[out[:, 1]], py[out[:, 1]]
    cxx, cyy = px[out[:, 2]], py[out[:, 2]]
    cw = (bx - ax) * (cyy - ay) - (by - ay) * (cxx - ax) < 0
    out[cw] = out[cw][:, [0, 2, 1]]
    roll = np.argmin(out, axis=1)
    out = np.take_along_axis(out, (roll[:, None] + np.arange(3)) % 3, axis=1)
    return out[np.lexsort((out[:, 2], out[:, 1], out[:, 0]))]


def _circum(px, py, tv):
    """Vectorized circumcenters + squared radii for triangle rows."""
    ax, ay = px[tv[:, 0]], py[tv[:, 0]]
    bx, by = px[tv[:, 1]], py[tv[:, 1]]
    cx, cy = px[tv[:, 2]], py[tv[:, 2]]
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    d = np.where(np.abs(d) < 1e-300, 1e-300, d)
    a2 = ax * ax + ay * ay
    b2 = bx * bx + by * by
    c2 = cx * cx + cy * cy
    ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
    uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
    r2 = (ux - ax) ** 2 + (uy - ay) ** 2
    return ux, uy, r2


class TIN:
    """Triangulated irregular network: barycentric (linear) interpolation
    over the Delaunay triangles — reproduces affine fields exactly, NaN
    outside the convex hull. Query is vectorized via a uniform grid index
    over triangle bboxes (no per-point triangle scan)."""

    def __init__(self, xs, ys, vals):
        self.xs = np.asarray(xs, dtype=np.float64)
        self.ys = np.asarray(ys, dtype=np.float64)
        self.vals = np.asarray(vals, dtype=np.float64)
        self.tri = delaunay(self.xs, self.ys)
        t = self.tri
        self.ax, self.ay = self.xs[t[:, 0]], self.ys[t[:, 0]]
        bx, by = self.xs[t[:, 1]], self.ys[t[:, 1]]
        cx, cy = self.xs[t[:, 2]], self.ys[t[:, 2]]
        self.e1x, self.e1y = bx - self.ax, by - self.ay
        self.e2x, self.e2y = cx - self.ax, cy - self.ay
        self.det = self.e1x * self.e2y - self.e1y * self.e2x
        # uniform grid index over triangle bboxes
        m = max(len(t), 1)
        self.gn = max(1, int(np.sqrt(m)))
        self.x0, self.x1 = self.xs.min(), self.xs.max()
        self.y0, self.y1 = self.ys.min(), self.ys.max()
        self.gw = max((self.x1 - self.x0) / self.gn, 1e-12)
        self.gh = max((self.y1 - self.y0) / self.gn, 1e-12)
        cells: list[list[int]] = [[] for _ in range(self.gn * self.gn)]
        txmin = np.minimum.reduce([self.xs[t[:, k]] for k in range(3)])
        txmax = np.maximum.reduce([self.xs[t[:, k]] for k in range(3)])
        tymin = np.minimum.reduce([self.ys[t[:, k]] for k in range(3)])
        tymax = np.maximum.reduce([self.ys[t[:, k]] for k in range(3)])
        gx0 = np.clip(((txmin - self.x0) / self.gw).astype(int), 0, self.gn - 1)
        gx1 = np.clip(((txmax - self.x0) / self.gw).astype(int), 0, self.gn - 1)
        gy0 = np.clip(((tymin - self.y0) / self.gh).astype(int), 0, self.gn - 1)
        gy1 = np.clip(((tymax - self.y0) / self.gh).astype(int), 0, self.gn - 1)
        for i in range(len(t)):
            for gx in range(gx0[i], gx1[i] + 1):
                for gy in range(gy0[i], gy1[i] + 1):
                    cells[gx * self.gn + gy].append(i)
        self.cells = [np.array(c, dtype=np.int64) for c in cells]

    def interpolate(self, qx, qy) -> np.ndarray:
        qx = np.asarray(qx, dtype=np.float64).ravel()
        qy = np.asarray(qy, dtype=np.float64).ravel()
        out = np.full(len(qx), np.nan)
        gx = np.clip(((qx - self.x0) / self.gw).astype(int), 0, self.gn - 1)
        gy = np.clip(((qy - self.y0) / self.gh).astype(int), 0, self.gn - 1)
        cell = gx * self.gn + gy
        t = self.tri
        eps = 1e-12
        # group queries by grid cell: one vectorized barycentric test per
        # (cell, candidate-triangle set) — no per-point python beyond groups
        order = np.argsort(cell, kind="stable")
        bounds = np.searchsorted(cell[order], np.arange(self.gn * self.gn + 1))
        for c in np.unique(cell):
            cand = self.cells[c]
            if len(cand) == 0:
                continue
            qi = order[bounds[c]:bounds[c + 1]]
            px = qx[qi][:, None] - self.ax[cand][None, :]
            py = qy[qi][:, None] - self.ay[cand][None, :]
            det = self.det[cand][None, :]
            u = (px * self.e2y[cand][None, :] - py * self.e2x[cand][None, :]) / det
            v = (py * self.e1x[cand][None, :] - px * self.e1y[cand][None, :]) / det
            inside = (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps)
            hit_any = inside.any(axis=1)
            first = np.argmax(inside, axis=1)
            ti = cand[first]
            w1 = u[np.arange(len(qi)), first]
            w2 = v[np.arange(len(qi)), first]
            w0 = 1.0 - w1 - w2
            val = (w0 * self.vals[t[ti, 0]] + w1 * self.vals[t[ti, 1]]
                   + w2 * self.vals[t[ti, 2]])
            out[qi] = np.where(hit_any, val, np.nan)
        return out


def delaunay_neighbors(n: int, tri: np.ndarray) -> list:
    """Adjacency lists (sorted, unique) from the triangle rows. When the
    triangulation is empty (n < 3 or all-collinear input) every pair is
    adjacent — correct for the Voronoi construction below and only reached
    for degenerate tiny inputs."""
    if len(tri) == 0:
        return [[j for j in range(n) if j != i] for i in range(n)]
    e = np.concatenate([tri[:, [0, 1]], tri[:, [1, 2]], tri[:, [2, 0]]])
    e = np.unique(np.sort(e, axis=1), axis=0)
    nbrs: list[list[int]] = [[] for _ in range(n)]
    for a, b in e:
        nbrs[a].append(int(b))
        nbrs[b].append(int(a))
    return [sorted(set(v)) for v in nbrs]


def _clip_halfplane(poly: np.ndarray, nx: float, ny: float, c: float) -> np.ndarray:
    """Sutherland–Hodgman clip of convex CCW ``poly`` (m,2) against the
    half-plane {p : nx*px + ny*py <= c}. m stays tiny (a Voronoi cell has
    one edge per clipping neighbor), so the per-edge Python loop is noise
    next to the surrounding per-site work."""
    d = poly[:, 0] * nx + poly[:, 1] * ny - c
    inside = d <= 0.0
    if inside.all():
        return poly
    if not inside.any():
        return poly[:0]
    out = []
    m = len(poly)
    for a in range(m):
        b = (a + 1) % m
        if inside[a]:
            out.append(poly[a])
        if inside[a] != inside[b]:
            t = d[a] / (d[a] - d[b])
            out.append(poly[a] + t * (poly[b] - poly[a]))
    return np.asarray(out, dtype=np.float64)


def voronoi_cells(xs: np.ndarray, ys: np.ndarray, extent) -> list:
    """Voronoi diagram clipped to a rectangular extent — the reference's
    VoronoiDiagram (ref:vector/src/main/scala/geotrellis/vector/voronoi/
    VoronoiDiagram.scala, L:unverified — /root/reference empty at survey
    time). Returns one (m_i, 2) float64 CCW polygon per site (possibly
    empty when the site's cell misses the extent entirely).

    Construction: cell(i) = extent rect ∩ bisector half-planes against
    site i's DELAUNAY neighbors only — the Voronoi cell of a site is
    exactly the intersection of the bisector half-planes of its Delaunay
    neighbors (the diagram is the triangulation's dual), so each cell costs
    O(deg) clips instead of O(n). Sites are the small broadcast side of
    the distributed shape (same contract as the TIN / kriging sample
    frames); the streamed side is assigned to cells with the ordinary PIP
    machinery (stages/overlay.voronoi_diagram -> stages/pip_join)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    x0, y0, x1, y1 = (float(v) for v in extent)
    rect = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64)
    n = len(xs)
    if n == 0:
        return []
    if n == 1:
        return [rect]
    nbrs = delaunay_neighbors(n, delaunay(xs, ys))
    cells = []
    for i in range(n):
        poly = rect
        for j in nbrs[i]:
            nx_ = xs[j] - xs[i]
            ny_ = ys[j] - ys[i]
            c = ((xs[i] + xs[j]) * nx_ + (ys[i] + ys[j]) * ny_) * 0.5
            poly = _clip_halfplane(poly, nx_, ny_, c)
            if len(poly) == 0:
                break
        cells.append(poly)
    return cells
