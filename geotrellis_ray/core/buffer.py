"""Geometry buffer (Minkowski sum/erosion with an n-gon disc).

GeoTrellis delegates ``geometry.buffer(d)`` to JTS's BufferOp
(ref:vector/src/main/scala/geotrellis/vector/MethodExtensions (JTS delegate),
L:unverified). This module rebuilds the same capability from first
principles on top of the exact boolean kernel in core/polyclip.py:

  buffer(P, r>0)  = P  UNION  (boundary(P) ⊕ disc(r))
                  = union(P, edge-rectangles, vertex-discs)
  buffer(P, r<0)  = P MINUS (boundary(P) ⊕ disc(|r|))
  buffer(line, r) = union(segment-rectangles, vertex-discs)
  buffer(pt, r)   = disc(r)

The disc is the JTS-style n-gon approximation with 4*quad_segs vertices ON
the circle (so the approximation is a subset of the true disc; a point at
distance < r*cos(pi/(4*quad_segs)) from the input is guaranteed covered).
The union of many overlapping pieces is computed incrementally with bbox
pruning — piece counts are O(#vertices), so this stays cheap per geometry
and embarrassingly parallel across a Dataset batch.
"""
from __future__ import annotations

import numpy as np

from . import polyclip

__all__ = ["buffer_geom", "disc_ngon", "ngon_area", "union_many"]


def disc_ngon(cx: float, cy: float, r: float, quad_segs: int = 8) -> np.ndarray:
    """Regular (4*quad_segs)-gon inscribed in the radius-r circle, CCW,
    first vertex at angle 0 (so axis-aligned tangencies land on vertices)."""
    m = 4 * quad_segs
    ang = np.arange(m) * (2.0 * np.pi / m)
    return np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])


def ngon_area(r: float, quad_segs: int = 8) -> float:
    """Area of the disc n-gon — the closed-form piece of rounded-rect areas."""
    m = 4 * quad_segs
    return 0.5 * m * r * r * np.sin(2.0 * np.pi / m)


def _edge_rect(p0: np.ndarray, p1: np.ndarray, r: float) -> np.ndarray | None:
    """Rectangle of half-width r around segment p0->p1 (CCW)."""
    d = p1 - p0
    L = float(np.hypot(d[0], d[1]))
    if L <= 0.0:
        return None
    nx, ny = -d[1] / L, d[0] / L
    off = np.array([nx * r, ny * r])
    return np.array([p0 + off, p0 - off, p1 - off, p1 + off])


def _bbox(rings: list[np.ndarray]) -> tuple[float, float, float, float]:
    xs = np.concatenate([r[:, 0] for r in rings])
    ys = np.concatenate([r[:, 1] for r in rings])
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def _bbox_hit(a, b) -> bool:
    return a[0] <= b[2] and b[0] <= a[2] and a[1] <= b[3] and b[1] <= a[3]


def union_many(pieces: list[list[np.ndarray]]) -> list[list[np.ndarray]]:
    """Union a list of polygons-with-holes ([shell, holes...] ring lists)
    into disjoint result polygons.

    Incremental with bbox pruning: keep an accumulator of disjoint polygons;
    each new piece absorbs every accumulator entry it actually touches (via
    polyclip.polygon_op union), then joins the accumulator. Piece counts here
    are O(vertices of one geometry), so quadratic worst case is fine."""
    acc: list[tuple[tuple, list[np.ndarray]]] = []  # (bbox, rings)
    for piece in pieces:
        cur = [np.asarray(r, dtype=np.float64) for r in piece]
        cbox = _bbox(cur)
        merged = True
        while merged:
            merged = False
            for i, (abox, arings) in enumerate(acc):
                if not _bbox_hit(cbox, abox):
                    continue
                res = polyclip.polygon_op(cur, arings, "union")
                if len(res) == 1:  # actually fused into one polygon
                    acc.pop(i)
                    cur = res[0]
                    cbox = _bbox(cur)
                    merged = True
                    break
                # disjoint (bbox hit but no overlap): leave both as-is
        acc.append((cbox, cur))
    return [rings for _, rings in acc]


def _boundary_pieces(rings: list[np.ndarray], r: float,
                     quad_segs: int) -> list[list[np.ndarray]]:
    """boundary ⊕ disc for one polygon's rings (shell + holes), as pieces."""
    pieces: list[list[np.ndarray]] = []
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
        if len(ring) and np.array_equal(ring[0], ring[-1]):
            ring = ring[:-1]
        n = len(ring)
        for i in range(n):
            rect = _edge_rect(ring[i], ring[(i + 1) % n], r)
            if rect is not None:
                pieces.append([rect])
            pieces.append([disc_ngon(ring[i, 0], ring[i, 1], r, quad_segs)])
    return pieces


def _buffer_polys(polys: list[list[np.ndarray]], dist: float,
                  quad_segs: int) -> list[list[np.ndarray]]:
    if dist > 0.0:
        pieces = list(polys)
        for rings in polys:
            pieces.extend(_boundary_pieces(rings, dist, quad_segs))
        return union_many(pieces)
    # erosion: subtract the boundary swept disc from each part
    out: list[list[np.ndarray]] = []
    for rings in polys:
        sweep = union_many(_boundary_pieces(rings, -dist, quad_segs))
        cur = [rings]
        for b in sweep:
            nxt: list[list[np.ndarray]] = []
            for c in cur:
                nxt.extend(polyclip.polygon_op(c, b, "difference"))
            cur = nxt
            if not cur:
                break
        out.extend(cur)
    return out


def _line_pieces(coords: np.ndarray, r: float,
                 quad_segs: int) -> list[list[np.ndarray]]:
    coords = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    pieces: list[list[np.ndarray]] = []
    for i in range(len(coords) - 1):
        rect = _edge_rect(coords[i], coords[i + 1], r)
        if rect is not None:
            pieces.append([rect])
    for p in coords:
        pieces.append([disc_ngon(p[0], p[1], r, quad_segs)])
    return pieces


def buffer_geom(geom: dict, dist: float, quad_segs: int = 8) -> dict | None:
    """Buffer a geometry dict (core/wkb.py shape) by ``dist``.

    Positive dist dilates; negative dist erodes (Polygon/MultiPolygon only).
    Returns a Polygon or MultiPolygon dict, or None when the result is empty
    (e.g. erosion past the inradius, or dist<=0 on points/lines)."""
    t = geom["type"]
    if t in ("Point", "MultiPoint"):
        if dist <= 0.0:
            return None
        pts = [geom["coords"]] if t == "Point" else [p["coords"] for p in geom["parts"]]
        res = union_many([[disc_ngon(p[0], p[1], dist, quad_segs)] for p in pts])
    elif t in ("LineString", "MultiLineString"):
        if dist <= 0.0:
            return None
        lines = [geom["coords"]] if t == "LineString" else [p["coords"] for p in geom["parts"]]
        pieces: list[list[np.ndarray]] = []
        for c in lines:
            pieces.extend(_line_pieces(c, dist, quad_segs))
        res = union_many(pieces)
    elif t in ("Polygon", "MultiPolygon"):
        if dist == 0.0:
            return geom
        res = _buffer_polys(polyclip.geom_polygons(geom), dist, quad_segs)
        if dist > 0.0 and len(res) > 1:
            res = union_many(res)  # parts of a Multi may have fused
    else:
        raise ValueError(f"buffer_geom: unsupported type {t!r}")
    if not res:
        return None
    if len(res) == 1:
        return {"type": "Polygon", "rings": res[0]}
    return {"type": "MultiPolygon",
            "parts": [{"type": "Polygon", "rings": r} for r in res]}
