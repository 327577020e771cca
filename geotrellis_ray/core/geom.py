"""Vectorized computational-geometry kernels (no shapely/JTS here — all from
scratch per the north_rule).

Re-expresses the JTS-delegated GeoTrellis geometry surface that the engine's
operators need (SURVEY.md §2.2 "Geometry predicates & scalar fns";
ref:vector/src/main/scala/geotrellis/vector/GeometryMethods (L:unverified,
/root/reference empty at survey time)):

- point-in-polygon (even-odd ray cast, vectorized over points)
- bbox predicates, geometry bbox
- Sutherland–Hodgman polygon clip against an axis-aligned rectangle
- Liang–Barsky segment clip (for LineString x cell)
- polygon area / centroid / line length (planar shoelace)
- convex hull (Andrew monotone chain) — used by fixture generation & tests

Inclusion rule (pinned by tests, shared with the relational SQL oracles):
ray-cast uses HALF-OPEN edges ``[ymin, ymax)`` with the crossing test
``(y1 > py) != (y2 > py)`` — a point exactly on a horizontal boundary shared
by two polygons lands in exactly one of them; bbox containment used in the
rectangle fast path is half-open ``xmin <= x < xmax, ymin <= y < ymax``.
"""

from __future__ import annotations

import numpy as np


def point_in_polygon(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray cast of many points against ONE ring (n,2). Vectorized
    over points, loop over edges (polygons have few edges; points are many)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    n = len(ring)
    x1s, y1s = ring[:, 0], ring[:, 1]
    x2s, y2s = np.roll(ring[:, 0], -1), np.roll(ring[:, 1], -1)
    for i in range(n - (1 if np.array_equal(ring[0], ring[-1]) else 0)):
        x1, y1, x2, y2 = x1s[i], y1s[i], x2s[i], y2s[i]
        if y1 == y2:
            continue
        cond = (y1 > py) != (y2 > py)
        if not cond.any():
            continue
        xi = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
        inside ^= cond & (px < xi)
    return inside


def point_in_polygon_geom(px, py, geom: dict) -> np.ndarray:
    """PIP against a decoded WKB dict (Polygon with holes / MultiPolygon)."""
    px = np.asarray(px, dtype=np.float64)
    if geom["type"] == "Polygon":
        inside = point_in_polygon(px, py, geom["rings"][0])
        for hole in geom["rings"][1:]:
            inside &= ~point_in_polygon(px, py, hole)
        return inside
    if geom["type"] == "MultiPolygon":
        inside = np.zeros(px.shape, dtype=bool)
        for part in geom["parts"]:
            inside |= point_in_polygon_geom(px, py, part)
        return inside
    raise ValueError(f"PIP needs a polygonal geometry, got {geom['type']}")


def geom_bbox(geom: dict) -> tuple[float, float, float, float]:
    if geom["type"] == "Point":
        x, y = geom["coords"][:2]
        return (x, y, x, y)
    if geom["type"] == "LineString":
        c = geom["coords"]
    elif geom["type"] == "Polygon":
        c = geom["rings"][0]
    else:
        boxes = np.array([geom_bbox(p) for p in geom["parts"]])
        return (boxes[:, 0].min(), boxes[:, 1].min(), boxes[:, 2].max(), boxes[:, 3].max())
    return (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())


def clip_polygon_rect(ring: np.ndarray, xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray | None:
    """Sutherland–Hodgman clip of one ring against an axis-aligned rect.
    Returns the clipped ring (closed not guaranteed) or None if empty."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]

    def clip_edge(poly, inside_fn, intersect_fn):
        if len(poly) == 0:
            return poly
        out = []
        prev = poly[-1]
        prev_in = inside_fn(prev)
        for cur in poly:
            cur_in = inside_fn(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect_fn(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect_fn(prev, cur))
            prev, prev_in = cur, cur_in
        return np.array(out) if out else np.empty((0, 2))

    def ix_x(bound):
        def f(p, q):
            t = (bound - p[0]) / (q[0] - p[0])
            return (bound, p[1] + t * (q[1] - p[1]))
        return f

    def ix_y(bound):
        def f(p, q):
            t = (bound - p[1]) / (q[1] - p[1])
            return (p[0] + t * (q[0] - p[0]), bound)
        return f

    pts = clip_edge(pts, lambda p: p[0] >= xmin, ix_x(xmin))
    pts = clip_edge(pts, lambda p: p[0] <= xmax, ix_x(xmax))
    pts = clip_edge(pts, lambda p: p[1] >= ymin, ix_y(ymin))
    pts = clip_edge(pts, lambda p: p[1] <= ymax, ix_y(ymax))
    if len(pts) < 3:
        return None
    return pts


def clip_polygon_convex(ring: np.ndarray, clip_ring: np.ndarray) -> np.ndarray | None:
    """Sutherland–Hodgman clip of any simple ring against a CONVEX clip
    polygon (generalizes clip_polygon_rect; exact when the clip side is
    convex). Returns the clipped ring (unclosed) or None if empty.
    (ref:vector/.../GeometryMethods intersection family, L:unverified —
    CONVEX-clip subset only; general overlay stays a non-goal, SURVEY §2.0.)"""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    clip = np.asarray(clip_ring, dtype=np.float64)
    if len(clip) and np.array_equal(clip[0], clip[-1]):
        clip = clip[:-1]
    # ensure CCW so "inside" = left of each directed edge
    x, y = clip[:, 0], clip[:, 1]
    if float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) < 0:
        clip = clip[::-1]
    for i in range(len(clip)):
        a = clip[i]
        b = clip[(i + 1) % len(clip)]
        ex, ey = b[0] - a[0], b[1] - a[1]
        if len(pts) == 0:
            return None
        out = []
        prev = pts[-1]
        prev_side = ex * (prev[1] - a[1]) - ey * (prev[0] - a[0])
        for cur in pts:
            cur_side = ex * (cur[1] - a[1]) - ey * (cur[0] - a[0])
            if cur_side >= 0:
                if prev_side < 0:
                    t = prev_side / (prev_side - cur_side)
                    out.append(prev + t * (cur - prev))
                out.append(cur)
            elif prev_side >= 0:
                t = prev_side / (prev_side - cur_side)
                out.append(prev + t * (cur - prev))
            prev, prev_side = cur, cur_side
        pts = np.array(out) if out else np.empty((0, 2))
    if len(pts) < 3:
        return None
    return pts


def buffer_point(x: float, y: float, radius: float, n_segments: int = 32) -> np.ndarray:
    """Circle approximation (regular n-gon ring, CCW, unclosed) — the point-
    buffer subset of the reference's buffer family."""
    ang = np.arange(n_segments) * (2.0 * np.pi / n_segments)
    return np.column_stack([x + radius * np.cos(ang), y + radius * np.sin(ang)])


def clip_segment_rect(x1, y1, x2, y2, xmin, ymin, xmax, ymax):
    """Liang–Barsky: clip segment to rect; returns (cx1,cy1,cx2,cy2) or None."""
    dx, dy = x2 - x1, y2 - y1
    t0, t1 = 0.0, 1.0
    for p, q in ((-dx, x1 - xmin), (dx, xmax - x1), (-dy, y1 - ymin), (dy, ymax - y1)):
        if p == 0:
            if q < 0:
                return None
            continue
        t = q / p
        if p < 0:
            if t > t1:
                return None
            t0 = max(t0, t)
        else:
            if t < t0:
                return None
            t1 = min(t1, t)
    return (x1 + t0 * dx, y1 + t0 * dy, x1 + t1 * dx, y1 + t1 * dy)


def clip_linestring_rect(coords: np.ndarray, xmin, ymin, xmax, ymax) -> list[np.ndarray]:
    """Clip a LineString to a rect -> list of clipped sub-linestrings."""
    coords = np.asarray(coords, dtype=np.float64)
    parts: list[list[tuple[float, float]]] = []
    cur: list[tuple[float, float]] = []
    for i in range(len(coords) - 1):
        seg = clip_segment_rect(*coords[i], *coords[i + 1], xmin, ymin, xmax, ymax)
        if seg is None:
            if len(cur) >= 2:
                parts.append(cur)
            cur = []
            continue
        a = (seg[0], seg[1])
        b = (seg[2], seg[3])
        if a == b:
            continue
        if cur and cur[-1] == a:
            cur.append(b)
        else:
            if len(cur) >= 2:
                parts.append(cur)
            cur = [a, b]
    if len(cur) >= 2:
        parts.append(cur)
    return [np.array(p) for p in parts]


def polygon_area(ring: np.ndarray) -> float:
    """Planar shoelace area (positive regardless of winding)."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    x, y = r[:, 0], r[:, 1]
    return abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))) / 2.0


def polygon_centroid(ring: np.ndarray) -> tuple[float, float]:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    x, y = r[:, 0], r[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a = cross.sum() / 2.0
    if a == 0:
        return float(x.mean()), float(y.mean())
    cx = float(((x + xn) * cross).sum() / (6.0 * a))
    cy = float(((y + yn) * cross).sum() / (6.0 * a))
    return cx, cy


def line_length(coords: np.ndarray) -> float:
    c = np.asarray(coords, dtype=np.float64)
    return float(np.sqrt(((c[1:] - c[:-1]) ** 2).sum(axis=1)).sum())


def convex_hull(points: np.ndarray, include_collinear: bool = False) -> np.ndarray:
    """Andrew monotone chain; returns hull ring CCW, not closed.
    ``include_collinear`` keeps points lying ON hull edges (needed when the
    hull must be exactly the set of non-interior points, e.g. as a
    mergeable partial in a distributed hull)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out: list[np.ndarray] = []
        for p in seq:
            while len(out) >= 2:
                c = np.cross(out[-1] - out[-2], p - out[-2])
                if c < 0 or (c <= 0 and not include_collinear):
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.array(lower[:-1] + upper[:-1])
    if include_collinear and len(ring):
        # collinear runs at the x-extremes can enter both chains; drop
        # repeats but keep ring order
        _vals, idx = np.unique(ring, axis=0, return_index=True)
        ring = ring[np.sort(idx)]
    return ring


def bbox_intersects(a, b) -> bool:
    return not (b[0] > a[2] or b[2] < a[0] or b[1] > a[3] or b[3] < a[1])


def simplify_dp(coords: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas-Peucker line simplification (geotrellis.vector.methods
    Simplify / JTS DouglasPeuckerSimplifier semantics, from scratch):
    keeps every vertex whose perpendicular distance from the current chord
    exceeds `tolerance`. Iterative stack (no recursion-depth limit);
    per-segment distance computation is vectorized numpy."""
    coords = np.asarray(coords, dtype=np.float64)
    n = len(coords)
    if n <= 2:
        return coords.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = coords[i + 1:j]
        a, b = coords[i], coords[j]
        ab = b - a
        L2 = ab @ ab
        if L2 == 0.0:
            d = np.linalg.norm(seg - a, axis=1)
        else:
            # perpendicular distance to the INFINITE line through a-b
            # (classic DP uses the line, not the clamped segment). The
            # |cross|/sqrt(L2) > tol form is kept EXACTLY as JTS evaluates
            # it (a sqrt-free cross^2 > tol^2*L2 variant diverges by 1 ulp
            # on float near-ties — caught by the hypothesis oracle). On
            # INTEGER coordinates the decisions are still bit-exact and
            # SQL-replayable (entry_queries.SQL_SIMPLIFY_DP): an exact tie
            # cross^2 == tol^2*L2 with integer tol forces L2 to be a
            # perfect square, where sqrt and the division are exact; any
            # non-tie has an integer-sized gap, orders of magnitude above
            # float rounding.
            rel = seg - a
            d = np.abs(ab[0] * rel[:, 1] - ab[1] * rel[:, 0]) / np.sqrt(L2)
        kmax = int(np.argmax(d))
        if d[kmax] > tolerance:
            mid = i + 1 + kmax
            keep[mid] = True
            stack.append((i, mid))
            stack.append((mid, j))
    return coords[keep]


def simplify_geom(geom: dict, tolerance: float) -> dict:
    """Simplify a decoded-WKB geometry dict. Rings keep >= 4 points (closed);
    degenerate results collapse to the ring's bbox triangle-free fallback:
    if a simplified ring would drop below 4 points the original ring is
    kept (JTS's ensureValid-ish conservative behavior, OUR spec)."""
    t = geom["type"]
    if t == "Point":
        return geom
    if t == "LineString":
        return {"type": "LineString",
                "coordinates": simplify_dp(np.asarray(geom["coordinates"]), tolerance)}
    if t == "Polygon":
        rings = []
        for ring in geom["coordinates"]:
            s = simplify_dp(np.asarray(ring), tolerance)
            rings.append(s if len(s) >= 4 else np.asarray(ring, dtype=np.float64))
        return {"type": "Polygon", "coordinates": rings}
    if t.startswith("Multi") or t == "GeometryCollection":
        key = "geometries" if t == "GeometryCollection" else "coordinates"
        sub_t = t[5:] if t.startswith("Multi") else None
        if t == "GeometryCollection":
            return {"type": t, "geometries": [simplify_geom(g, tolerance)
                                              for g in geom["geometries"]]}
        parts = [simplify_geom({"type": sub_t, "coordinates": c}, tolerance)["coordinates"]
                 for c in geom["coordinates"]]
        return {"type": t, "coordinates": parts}
    raise ValueError(f"unsupported geometry {t}")
