"""Vector overlay as a broadcast map_batches stage — two paths:

- ``overlay_intersection``: fast convex-clip subset (LEFT any simple polygon
  or multi, RIGHT must be CONVEX — Sutherland–Hodgman, holes ignored);
- ``overlay_general`` (round 3): FULL boolean semantics — non-convex both
  sides, holes, intersection / union / difference — via the Margalit–Knott
  fragment-classification clipper in core/polyclip.py.

Re-expresses ref:vector/src/main/scala/geotrellis/vector/GeometryMethods
(JTS overlay ops; L:unverified — /root/reference empty at survey time).

Ray shape: the small convex side is broadcast once (ray.put / closure); each
batch runs a bbox prefilter then per-candidate exact clip — a flat map, no
shuffle. For large-large overlay, compose with ClipToGrid + the sfc
equi-join (pbsm_spatial_join pattern) and apply this stage per cell.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import wkb
from ..core.geom import bbox_intersects, clip_polygon_convex, geom_bbox, polygon_area


def _left_rings(geom: dict) -> list[np.ndarray]:
    """Shell rings of a Polygon/MultiPolygon. Holes are IGNORED entirely on
    this fast convex path (clipped shell areas only — a left polygon with
    holes overstates its area); use ``overlay_general`` when holes or a
    non-convex right side matter."""
    if geom["type"] == "Polygon":
        return [np.asarray(geom["rings"][0], dtype=np.float64)]
    if geom["type"] == "MultiPolygon":
        return [np.asarray(p["rings"][0], dtype=np.float64) for p in geom["parts"]]
    raise ValueError(f"overlay supports Polygon/MultiPolygon, got {geom['type']}")


def intersect_convex_batch(batch: pa.Table, right_rows: list[dict],
                           wkb_col: str = "wkb", id_col: str = "polygon_id",
                           right_id_col: str = "right_id") -> pa.Table:
    """One batch of left features x broadcast convex right polygons ->
    (left id, right id, clipped_wkb, area) for every non-empty intersection."""
    lids, rids, wkbs, areas = [], [], [], []
    for i, buf in enumerate(batch[wkb_col].to_pylist()):
        geom = wkb.decode(buf)
        lid = batch[id_col][i].as_py()
        lbox = geom_bbox(geom)
        for rr in right_rows:
            if not bbox_intersects(lbox, rr["bbox"]):
                continue
            pieces = []
            for shell in _left_rings(geom):
                clipped = clip_polygon_convex(shell, rr["ring"])
                # edge-contact clips survive Sutherland–Hodgman as collinear
                # degenerate rings — a touch is not an intersection
                if clipped is not None and polygon_area(clipped) > 0.0:
                    pieces.append(clipped)
            if not pieces:
                continue
            area = float(sum(polygon_area(p) for p in pieces))
            if len(pieces) == 1:
                out_geom = {"type": "Polygon", "rings": [pieces[0]]}
            else:
                out_geom = {"type": "MultiPolygon",
                            "parts": [{"type": "Polygon", "rings": [p]} for p in pieces]}
            lids.append(lid)
            rids.append(rr["id"])
            wkbs.append(wkb.encode(out_geom))
            areas.append(area)
    return pa.table({
        id_col: pa.array(lids),
        right_id_col: pa.array(rids, pa.int64()),
        "clipped_wkb": pa.array(wkbs, pa.binary()),
        "area": pa.array(areas, pa.float64()),
    })


def prepare_convex_rows(table: pa.Table, wkb_col: str = "wkb", id_col: str = "polygon_id") -> list[dict]:
    """Decode + bbox the broadcastable convex side once (driver or actor
    __init__)."""
    rows = []
    for i in range(table.num_rows):
        geom = wkb.decode(table[wkb_col][i].as_py())
        if geom["type"] != "Polygon":
            raise ValueError("convex right side must be simple polygons")
        rows.append({"id": int(table[id_col][i].as_py()),
                     "ring": np.asarray(geom["rings"][0], dtype=np.float64),
                     "bbox": geom_bbox(geom)})
    return rows


def overlay_intersection(left_ds, right_table: pa.Table, wkb_col: str = "wkb",
                         id_col: str = "polygon_id", right_id_col: str = "right_id"):
    """Distributed overlay: left feature Dataset x small convex right table
    (broadcast) -> intersection rows. No shuffle."""
    right_rows = prepare_convex_rows(right_table, wkb_col=wkb_col, id_col=id_col)

    return left_ds.map_batches(
        lambda b: intersect_convex_batch(b, right_rows, wkb_col=wkb_col,
                                         id_col=id_col, right_id_col=right_id_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


# --- general (non-convex, holes, union/difference) path ---------------------

def prepare_general_rows(table: pa.Table, wkb_col: str = "wkb",
                         id_col: str = "polygon_id") -> list[dict]:
    """Decode + bbox the broadcastable right side once (driver or actor
    __init__). Any simple Polygon/MultiPolygon, holes included."""
    from ..core.polyclip import geom_polygons

    rows = []
    for i in range(table.num_rows):
        geom = wkb.decode(table[wkb_col][i].as_py())
        rows.append({"id": int(table[id_col][i].as_py()),
                     "geom": geom,
                     "polys": geom_polygons(geom),
                     "bbox": geom_bbox(geom)})
    return rows


def overlay_general_batch(batch: pa.Table, right_rows: list[dict], op: str,
                          wkb_col: str = "wkb", id_col: str = "polygon_id",
                          right_id_col: str = "right_id") -> pa.Table:
    """One batch of left features x broadcast right polygons, FULL boolean
    semantics (core/polyclip.py): op in {intersection, union, difference}.
    Emits (left id, right id, result wkb or null, area) for every pair whose
    bboxes intersect AND whose result is non-empty (union always emits for
    bbox-hit pairs)."""
    from ..core import polyclip

    lids, rids, wkbs, areas = [], [], [], []
    for i, buf in enumerate(batch[wkb_col].to_pylist()):
        geom = wkb.decode(buf)
        lid = batch[id_col][i].as_py()
        lbox = geom_bbox(geom)
        for rr in right_rows:
            if not bbox_intersects(lbox, rr["bbox"]) and op != "union":
                continue
            res = polyclip.boolean_op(geom, rr["geom"], op)
            if res is None:
                continue
            area = polyclip.rings_signed_area(polyclip.geom_polygons(res))
            if area <= 0.0 and op != "union":
                continue
            lids.append(lid)
            rids.append(rr["id"])
            wkbs.append(wkb.encode(res))
            areas.append(float(area))
    return pa.table({
        id_col: pa.array(lids),
        right_id_col: pa.array(rids, pa.int64()),
        "clipped_wkb": pa.array(wkbs, pa.binary()),
        "area": pa.array(areas, pa.float64()),
    })


def overlay_general(left_ds, right_table: pa.Table, op: str = "intersection",
                    wkb_col: str = "wkb", id_col: str = "polygon_id",
                    right_id_col: str = "right_id"):
    """Distributed general overlay: left feature Dataset x small right table
    (broadcast) with full boolean semantics — non-convex, holes, union and
    difference included. Same no-shuffle broadcast shape as
    overlay_intersection; compose with ClipToGrid + the sfc equi-join for
    large-large overlay."""
    right_rows = prepare_general_rows(right_table, wkb_col=wkb_col, id_col=id_col)

    return left_ds.map_batches(
        lambda b: overlay_general_batch(b, right_rows, op, wkb_col=wkb_col,
                                        id_col=id_col, right_id_col=right_id_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


# --- buffer ------------------------------------------------------------------


def buffer_batch(batch: pa.Table, dist: float | None = None,
                 quad_segs: int = 8, wkb_col: str = "wkb",
                 dist_col: str | None = None) -> pa.Table:
    """Buffer every geometry in a batch (core/buffer.py Minkowski construction).

    ``dist`` applies one distance to all rows; ``dist_col`` takes a per-row
    distance column instead (negative = erode). Output keeps all non-wkb
    columns and replaces ``wkb_col`` with the buffered geometry (null when
    the result is empty, e.g. erosion past the inradius), adding ``buf_area``
    (signed shoelace area of the result, 0 for null)."""
    from ..core.buffer import buffer_geom
    from ..core.polyclip import geom_polygons, rings_signed_area

    dists = (batch[dist_col].to_numpy(zero_copy_only=False)
             if dist_col else None)
    wkbs, areas = [], []
    for i, buf in enumerate(batch[wkb_col].to_pylist()):
        d = float(dists[i]) if dists is not None else float(dist)
        res = buffer_geom(wkb.decode(buf), d, quad_segs=quad_segs)
        if res is None:
            wkbs.append(None)
            areas.append(0.0)
        else:
            wkbs.append(wkb.encode(res))
            areas.append(float(rings_signed_area(geom_polygons(res))))
    keep = {name: batch[name] for name in batch.column_names if name != wkb_col}
    keep[wkb_col] = pa.array(wkbs, pa.binary())
    keep["buf_area"] = pa.array(areas, pa.float64())
    return pa.table(keep)


def buffer_features(ds, dist: float | None = None, quad_segs: int = 8,
                    wkb_col: str = "wkb", dist_col: str | None = None):
    """Distributed geometry buffer: per-row independent, no shuffle. Points,
    lines and polygons dilate; polygons also erode (negative distance).
    ref:vector geometry.buffer (JTS BufferOp delegate), L:unverified."""
    return ds.map_batches(
        lambda b: buffer_batch(b, dist=dist, quad_segs=quad_segs,
                               wkb_col=wkb_col, dist_col=dist_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


# --- convex hull -------------------------------------------------------------


def convex_hull_stage(ds, x_col: str = "x", y_col: str = "y"):
    """Distributed convex hull of a point Dataset (GeoTrellis geometry
    convexHull, JTS delegate — ref:vector GeometryMethods, L:unverified).

    Exactness: hull(union of hulls) = hull(all points), so each block
    reduces to its own monotone-chain hull (vectorized numpy in, O(k) out)
    and the final merge re-runs the chain over the concatenated partial
    hulls. Partial hulls are tiny (expected O(n^(1/3)) vertices for random
    points, O(log n) for many distributions), so the single-block final is
    safe at any corpus size — the wide stage ships only hull vertices.
    Returns the boundary points as (x, y) rows, CCW order. Collinear points
    ON hull edges are KEPT (include_collinear): every global-boundary point
    is on its own block hull's boundary, so the two-level reduce computes
    exactly the set of non-interior points — well-defined regardless of how
    blocks split collinear runs."""
    from ..core.geom import convex_hull

    def block_hull(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({x_col: pa.array([], pa.float64()),
                             y_col: pa.array([], pa.float64())})
        pts = np.column_stack([b[x_col].to_numpy(zero_copy_only=False),
                               b[y_col].to_numpy(zero_copy_only=False)])
        h = convex_hull(pts, include_collinear=True)
        return pa.table({x_col: pa.array(h[:, 0], pa.float64()),
                         y_col: pa.array(h[:, 1], pa.float64())})

    partial = ds.map_batches(block_hull, batch_format="pyarrow",
                             zero_copy_batch=True)
    return partial.repartition(1).map_batches(
        block_hull, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)


# --- geometry measures --------------------------------------------------------


def geom_measures(ds, wkb_col: str = "wkb", id_col: str = "polygon_id"):
    """Per-feature area / perimeter / centroid (GeoTrellis geometry methods
    area/length/centroid, JTS delegates — ref:vector GeometryMethods,
    L:unverified): WKB decode per row, shoelace area (abs), closed-ring
    perimeter, area-weighted centroid (vertex mean for degenerate rings).
    Pure map stage, no shuffle; on integer-coordinate inputs every
    intermediate is exact in float64, so a SQL oracle reproduces the
    values bit-for-bit."""
    from ..core import wkb as wkb_codec
    from ..core.geom import line_length, polygon_area, polygon_centroid

    def fn(b: pa.Table) -> pa.Table:
        areas, perims, cxs, cys = [], [], [], []
        for buf in b[wkb_col].to_pylist():
            g = wkb_codec.decode(buf)
            ring = np.asarray(g["rings"][0], dtype=np.float64)
            areas.append(polygon_area(ring))
            closed = ring if np.array_equal(ring[0], ring[-1]) else np.vstack([ring, ring[:1]])
            perims.append(line_length(closed))
            cx, cy = polygon_centroid(ring)
            cxs.append(cx)
            cys.append(cy)
        return pa.table({id_col: b[id_col],
                         "area": pa.array(areas, pa.float64()),
                         "perimeter": pa.array(perims, pa.float64()),
                         "centroid_x": pa.array(cxs, pa.float64()),
                         "centroid_y": pa.array(cys, pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def voronoi_diagram(sites: pa.Table, extent, id_col: str = "site_id",
                    x_col: str = "x", y_col: str = "y") -> pa.Table:
    """Voronoi cells of a (small, broadcast-side) site table, clipped to a
    rectangular extent — the reference's VoronoiDiagram family
    (ref:vector/src/main/scala/geotrellis/vector/voronoi/VoronoiDiagram.scala,
    L:unverified). Built as the Delaunay dual (core/delaunay.voronoi_cells:
    extent rect ∩ neighbor-bisector half-planes, O(deg) clips per cell).

    Returns a polygon table directly consumable by PolygonIndex/PipJoiner
    (polygon_id, wkb, xmin..ymax) plus nverts/area, so assigning a STREAMED
    point dataset to cells is the ordinary broadcast PIP join — the same
    distributed shape as every other small-polygon-side spatial join here.
    Sites whose cell misses the extent entirely are omitted."""
    from ..core.delaunay import voronoi_cells

    xs = sites[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
    ys = sites[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
    ids = sites[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    cells = voronoi_cells(xs, ys, extent)
    out_id, out_wkb, bxs = [], [], []
    nverts, areas = [], []
    for sid, poly in zip(ids, cells):
        if len(poly) < 3:
            continue
        out_id.append(int(sid))
        out_wkb.append(wkb.encode_polygon([poly]))
        bxs.append((poly[:, 0].min(), poly[:, 1].min(),
                    poly[:, 0].max(), poly[:, 1].max()))
        nverts.append(len(poly))
        x, y = poly[:, 0], poly[:, 1]
        areas.append(0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))))
    bx = np.asarray(bxs, dtype=np.float64).reshape(-1, 4)
    return pa.table({
        "polygon_id": pa.array(out_id, pa.int64()),
        "wkb": pa.array(out_wkb, pa.binary()),
        "xmin": pa.array(bx[:, 0], pa.float64()),
        "ymin": pa.array(bx[:, 1], pa.float64()),
        "xmax": pa.array(bx[:, 2], pa.float64()),
        "ymax": pa.array(bx[:, 3], pa.float64()),
        "nverts": pa.array(nverts, pa.int64()),
        "area": pa.array(areas, pa.float64()),
    })
