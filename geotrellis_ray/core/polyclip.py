"""General polygon boolean operations (intersection / union / difference)
for arbitrary simple polygons with holes — the non-convex overlay core.

Algorithm: boundary-fragment classification after mutual edge splitting, the
published Margalit & Knott (1989) scheme ("An algorithm for computing the
union, intersection or difference of two polygons", Computers & Graphics
13(2)), which unlike textbook Greiner-Hormann handles the degenerate cases
(vertex-on-edge, collinear overlapping edges, shared vertices) without
perturbation:

1. normalize: shells CCW, holes CW;
2. split every edge of A at every intersection with B's edges (proper
   crossings AND collinear-overlap interval endpoints), and vice versa;
3. each resulting fragment is then entirely IN, OUT, or ON the other
   polygon — classify by its midpoint (even-odd with an eps boundary band);
4. select fragments per op:
   - intersection: A-frags IN B, B-frags IN A, ON-frags (A's copy) whose
     direction matches B's boundary;
   - union: A-frags OUT of B, B-frags OUT of A, ON-same (A's copy);
   - difference A-B: A-frags OUT of B, B-frags IN A reversed, ON-opposite
     (A's copy);
5. stitch fragments into rings (endpoint snapping + leftmost-turn rule at
   multi-valent nodes so touching regions stay separate rings);
6. assemble: CCW rings are shells, CW rings are holes of the smallest
   containing shell.

Replaces the convex-only Sutherland-Hodgman scope of stages/overlay.py.
Re-expresses ref:vector/src/main/scala/geotrellis/vector/GeometryMethods
(JTS overlay ops; L:unverified — /root/reference empty at survey time).
"""

from __future__ import annotations

import numpy as np

__all__ = ["polygon_op", "boolean_op", "rings_signed_area", "geom_polygons"]


def _ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def rings_signed_area(polygons: list[list[np.ndarray]]) -> float:
    """Total area of an assembled result: shells positive, holes negative."""
    return float(sum(_ring_signed_area(r) for poly in polygons for r in poly))


def _dedupe_ring(ring: np.ndarray, eps: float) -> np.ndarray:
    """Drop a duplicated closing vertex and consecutive duplicates."""
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(r) > 1 and np.all(np.abs(r[0] - r[-1]) <= eps):
        r = r[:-1]
    if len(r) > 1:
        keep = np.ones(len(r), dtype=bool)
        keep[1:] = np.any(np.abs(np.diff(r, axis=0)) > eps, axis=1)
        r = r[keep]
    return r


def _normalize(rings: list[np.ndarray], eps: float) -> list[np.ndarray]:
    """Shell (first ring) CCW, holes CW; drop degenerate rings."""
    out = []
    for i, ring in enumerate(rings):
        r = _dedupe_ring(ring, eps)
        if len(r) < 3:
            continue
        a = _ring_signed_area(r)
        if abs(a) < eps * eps:
            continue
        want_ccw = i == 0
        if (a > 0) != want_ccw:
            r = r[::-1].copy()
        out.append(r)
    return out


def _edges(ring_sets: list[list[np.ndarray]]) -> list[tuple[np.ndarray, np.ndarray]]:
    es = []
    for rings in ring_sets:
        for r in rings:
            for i in range(len(r)):
                es.append((r[i], r[(i + 1) % len(r)]))
    return es


def _cross(ax, ay, bx, by):
    return ax * by - ay * bx


def _split_params(edges_a, edges_b, eps: float) -> list[list[float]]:
    """For each edge of A, the sorted parameter values where B's edges cross
    or touch it (proper intersections + collinear-overlap endpoints)."""
    params: list[list[float]] = [[] for _ in edges_a]
    for i, (p1, p2) in enumerate(edges_a):
        d1x, d1y = p2[0] - p1[0], p2[1] - p1[1]
        len1 = max(abs(d1x), abs(d1y), eps)
        for q1, q2 in edges_b:
            d2x, d2y = q2[0] - q1[0], q2[1] - q1[1]
            denom = _cross(d1x, d1y, d2x, d2y)
            wx, wy = q1[0] - p1[0], q1[1] - p1[1]
            if abs(denom) > eps * max(len1, abs(d2x), abs(d2y), eps):
                t = _cross(wx, wy, d2x, d2y) / denom
                u = _cross(wx, wy, d1x, d1y) / denom
                te = eps / len1
                ue = eps / max(abs(d2x), abs(d2y), eps)
                if -te <= t <= 1 + te and -ue <= u <= 1 + ue:
                    params[i].append(min(1.0, max(0.0, t)))
            else:
                # parallel: collinear iff q1 lies on the line of edge a
                if abs(_cross(wx, wy, d1x, d1y)) <= eps * len1:
                    dd = d1x * d1x + d1y * d1y
                    t1 = (wx * d1x + wy * d1y) / dd
                    t2 = ((q2[0] - p1[0]) * d1x + (q2[1] - p1[1]) * d1y) / dd
                    lo, hi = min(t1, t2), max(t1, t2)
                    if hi > 0 and lo < 1:
                        params[i].append(min(1.0, max(0.0, lo)))
                        params[i].append(min(1.0, max(0.0, hi)))
    return params


def _fragments(edges, all_params, eps: float):
    """Split each edge at its params -> list of (start, end) fragments."""
    frags = []
    for (p1, p2), ps in zip(edges, all_params):
        length = max(abs(p2[0] - p1[0]), abs(p2[1] - p1[1]), eps)
        te = eps / length
        ts = sorted({0.0, 1.0, *[t for t in ps if te < t < 1 - te]})
        pts = [p1 + t * (p2 - p1) for t in ts]
        for a, b in zip(pts[:-1], pts[1:]):
            if max(abs(b[0] - a[0]), abs(b[1] - a[1])) > eps:
                frags.append((a, b))
    return frags


_IN, _OUT, _ON = 0, 1, 2


def _classify(px: float, py: float, rings: list[np.ndarray], eps: float):
    """(state, on_dir): state IN/OUT/ON vs the ring set (even-odd, shells and
    holes together); when ON, on_dir is the unit direction of the boundary
    edge the point lies on (for SAME/OPPOSITE tests)."""
    inside = False
    for r in rings:
        x, y = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        # distance to each segment for the ON band
        dx, dy = x2 - x, y2 - y
        ln2 = dx * dx + dy * dy
        t = np.clip(((px - x) * dx + (py - y) * dy) / np.where(ln2 == 0, 1, ln2), 0, 1)
        cx, cy = x + t * dx, y + t * dy
        d2 = (px - cx) ** 2 + (py - cy) ** 2
        j = int(np.argmin(d2))
        if d2[j] <= eps * eps:
            ln = np.sqrt(ln2[j]) or 1.0
            return _ON, (dx[j] / ln, dy[j] / ln)
        # even-odd ray cast (positive x direction)
        cond = (y <= py) != (y2 <= py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x + (py - y) * dx / np.where(dy == 0, 1, dy)
        inside ^= bool(np.count_nonzero(cond & (xi > px)) & 1)
    return (_IN if inside else _OUT), None


def _select(frags, other_rings, op: str, role: str, eps: float):
    """Apply the Margalit-Knott selection rules to one side's fragments."""
    sel = []
    for a, b in frags:
        mx, my = (a[0] + b[0]) * 0.5, (a[1] + b[1]) * 0.5
        state, on_dir = _classify(mx, my, other_rings, eps)
        if state == _ON:
            if role != "A":
                continue  # boundary fragments contribute once, via A's copy
            dx, dy = b[0] - a[0], b[1] - a[1]
            same = dx * on_dir[0] + dy * on_dir[1] > 0
            if op in ("intersection", "union") and same:
                sel.append((a, b))
            elif op == "difference" and not same:
                sel.append((a, b))
        elif role == "A":
            if (op == "intersection" and state == _IN) or \
               (op in ("union", "difference") and state == _OUT):
                sel.append((a, b))
        else:
            if (op in ("intersection",) and state == _IN) or \
               (op == "union" and state == _OUT):
                sel.append((a, b))
            elif op == "difference" and state == _IN:
                sel.append((b, a))  # reversed: becomes a hole boundary
    return sel


def _stitch(frags, eps: float) -> list[np.ndarray]:
    """Snap endpoints and walk fragments into closed rings; at multi-valent
    nodes take the leftmost turn (min CCW angle from the incoming direction)
    so regions touching at a point stay separate rings."""
    snap = max(eps * 4, 1e-12)

    def key(p):
        return (round(p[0] / snap), round(p[1] / snap))

    by_start: dict = {}
    for idx, (a, b) in enumerate(frags):
        by_start.setdefault(key(a), []).append(idx)
    used = [False] * len(frags)
    rings = []
    for start_idx in range(len(frags)):
        if used[start_idx]:
            continue
        chain = [start_idx]
        used[start_idx] = True
        start_key = key(frags[start_idx][0])
        cur = start_idx
        closed = False
        for _ in range(len(frags) + 1):
            end = frags[cur][1]
            ek = key(end)
            if ek == start_key:
                closed = True
                break
            cands = [i for i in by_start.get(ek, []) if not used[i]]
            if not cands:
                break
            if len(cands) == 1:
                nxt = cands[0]
            else:
                ax, ay = frags[cur][0], frags[cur][1]
                idx_, idy = ay[0] - ax[0], ay[1] - ax[1]
                in_ang = np.arctan2(idy, idx_)

                def turn(i):
                    fa, fb = frags[i]
                    ang = np.arctan2(fb[1] - fa[1], fb[0] - fa[0])
                    d = (ang - in_ang) % (2 * np.pi)
                    return d if d > 1e-12 else 2 * np.pi  # exclude pure U-turn ties

                nxt = min(cands, key=turn)
            used[nxt] = True
            chain.append(nxt)
            cur = nxt
        if closed:
            pts = np.array([frags[i][0] for i in chain], dtype=np.float64)
            pts = _dedupe_ring(pts, eps)
            if len(pts) >= 3 and abs(_ring_signed_area(pts)) > eps:
                rings.append(pts)
    return rings


def _assemble(rings: list[np.ndarray], eps: float) -> list[list[np.ndarray]]:
    """CCW rings are shells; each CW ring becomes a hole of the smallest
    shell containing it."""
    shells = [(r, _ring_signed_area(r)) for r in rings if _ring_signed_area(r) > 0]
    holes = [r for r in rings if _ring_signed_area(r) < 0]
    shells.sort(key=lambda t: t[1])  # smallest first
    polys: list[list[np.ndarray]] = [[s] for s, _ in shells]
    for h in holes:
        hx, hy = h[0]
        for i, (s, _a) in enumerate(shells):
            state, _ = _classify(hx, hy, [s], eps)
            if state != _OUT:
                polys[i].append(h)
                break
    return polys


def polygon_op(a_rings: list[np.ndarray], b_rings: list[np.ndarray], op: str,
               eps: float | None = None) -> list[list[np.ndarray]]:
    """Boolean op between two polygons-with-holes.

    a_rings/b_rings: [shell, hole, ...] as (n,2) float arrays (open rings,
    any orientation). op: "intersection" | "union" | "difference" (A - B).
    Returns a list of result polygons, each [shell_ccw, hole_cw, ...]; empty
    list when the result is empty.
    """
    if op not in ("intersection", "union", "difference"):
        raise ValueError(f"unknown op {op!r}")
    scale = 1.0
    for rs in (a_rings, b_rings):
        for r in rs:
            arr = np.asarray(r, dtype=np.float64)
            if arr.size:
                scale = max(scale, float(np.max(np.abs(arr))))
    if eps is None:
        eps = 1e-9 * scale
    A = _normalize([np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in a_rings], eps)
    B = _normalize([np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in b_rings], eps)
    if not A:
        return [] if op != "union" else ([B] if B else [])
    if not B:
        return [] if op == "intersection" else [A]
    ea, eb = _edges([A]), _edges([B])
    pa_params = _split_params(ea, eb, eps)
    pb_params = _split_params(eb, ea, eps)
    fa = _fragments(ea, pa_params, eps)
    fb = _fragments(eb, pb_params, eps)
    sel = _select(fa, B, op, "A", eps) + _select(fb, A, op, "B", eps)
    rings = _stitch(sel, eps)
    return _assemble(rings, eps)


# --- geometry-dict bridge ---------------------------------------------------

def geom_polygons(geom: dict) -> list[list[np.ndarray]]:
    """Geometry dict (core/wkb.py) -> list of [shell, holes...] ring lists."""
    if geom["type"] == "Polygon":
        return [[np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in geom["rings"]]]
    if geom["type"] == "MultiPolygon":
        return [[np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in p["rings"]]
                for p in geom["parts"]]
    raise ValueError(f"boolean_op supports Polygon/MultiPolygon, got {geom['type']}")


def boolean_op(geom_a: dict, geom_b: dict, op: str) -> dict | None:
    """Polygon/MultiPolygon dict x dict -> result dict (or None if empty).

    Multi* inputs are handled by pushing all rings of each side into one
    ring-set per polygon part and combining pairwise: for disjoint parts
    (the only Multi* this engine produces) part-vs-part results are disjoint,
    so concatenating them is exact.
    """
    pa_ = geom_polygons(geom_a)
    pb_ = geom_polygons(geom_b)
    results: list[list[np.ndarray]] = []
    if op == "difference":
        # subtract every B part from each A part sequentially
        for part in pa_:
            cur = [part]
            for bp in pb_:
                nxt: list[list[np.ndarray]] = []
                for c in cur:
                    nxt.extend(polygon_op(c, bp, "difference"))
                cur = nxt
                if not cur:
                    break
            results.extend(cur)
    elif op == "intersection":
        for part in pa_:
            for bp in pb_:
                results.extend(polygon_op(part, bp, "intersection"))
    else:  # union
        if not pa_ and not pb_:
            return None
        cur = pa_ + pb_
        out = [cur[0]]
        for p in cur[1:]:
            merged = False
            nxt = []
            for q in out:
                if not merged:
                    u = polygon_op(p, q, "union")
                    if len(u) == 1:  # overlapped/touched -> merged
                        p = u[0]
                        merged = True
                        continue
                nxt.append(q)
            nxt.append(p)
            out = nxt
        results = out
    results = [p for p in results if p]
    if not results:
        return None
    if len(results) == 1:
        return {"type": "Polygon", "rings": [np.asarray(r) for r in results[0]]}
    return {"type": "MultiPolygon",
            "parts": [{"type": "Polygon", "rings": [np.asarray(r) for r in p]}
                      for p in results]}
