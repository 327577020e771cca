"""Vectorize (stages/vectorize.py) — rasterize-back round-trip oracle: the
traced polygons, evaluated at every cell center, must reproduce the label
grid EXACTLY (partition equality, holes and saddles included)."""
import numpy as np
import pyarrow as pa
import pytest

from geotrellis_ray.core.geom import point_in_polygon_geom
from geotrellis_ray.core.layout import Extent, LayoutDefinition, TileLayout
from geotrellis_ray.core.sfc import zorder
from geotrellis_ray.core.wkb import decode as wkb_decode


def _layer_from_grid(grid, tile):
    import ray.data as rd

    R, C = grid.shape
    lc, lr = C // tile, R // tile
    rows = []
    for kr in range(lr):
        for kc in range(lc):
            t = grid[kr * tile:(kr + 1) * tile, kc * tile:(kc + 1) * tile].astype(np.float64)
            rows.append({"key_col": kc, "key_row": kr, "sfc": int(zorder(kc, kr)),
                         "cells": t.tobytes(), "cols": tile, "rows": tile,
                         "cell_type": "float64"})
    lay = LayoutDefinition(Extent(0, 0, C, R), TileLayout(lc, lr, tile, tile))
    return rd.from_arrow(pa.Table.from_pylist(rows)), lay


def _roundtrip(grid, tile):
    from geotrellis_ray.stages.regiongroup import region_group
    from geotrellis_ray.stages.vectorize import vectorize

    ds, lay = _layer_from_grid(grid, tile)
    labeled = region_group(ds, lay).materialize()
    out = vectorize(labeled, lay).take_all()

    R, C = grid.shape
    cx, cy = np.meshgrid(np.arange(C) + 0.5, R - (np.arange(R) + 0.5))
    recon = np.full((R, C), -1, dtype=np.int64)
    total_area = 0.0
    for r in out:
        geom = wkb_decode(r["wkb"])
        m = point_in_polygon_geom(cx.ravel(), cy.ravel(), geom).reshape(R, C)
        assert not (recon[m] != -1).any(), "polygons overlap"
        recon[m] = r["lab"]
        total_area += r["area"]

    lab_grid = np.zeros((R, C), dtype=np.int64)
    for row in labeled.take_all():
        t = np.frombuffer(row["cells"], dtype=np.int64).reshape(tile, tile)
        lab_grid[row["key_row"] * tile:(row["key_row"] + 1) * tile,
                 row["key_col"] * tile:(row["key_col"] + 1) * tile] = t
    np.testing.assert_array_equal(recon, lab_grid)
    # polygon areas (holes subtracted) must sum to the valid-cell count
    assert total_area == pytest.approx(int((lab_grid >= 0).sum()))
    return out, lab_grid


def test_vectorize_donut_and_cross_tile(ray_session):
    g = np.zeros((16, 16), dtype=np.float64)
    g[2:9, 2:9] = 1.0
    g[4:7, 4:7] = 0.0          # hole in the 1-region (filled with 0-region)
    g[12, 5:12] = 4.0          # region crossing the tile seam at col 8
    out, _ = _roundtrip(g, 8)
    donut = [r for r in out if r["area"] == 7 * 7 - 3 * 3]
    assert donut and donut[0]["n_holes"] == 1


def test_vectorize_saddle_single_region(ray_session):
    # one 4-connected region meeting ITSELF diagonally: the boundary visits
    # the saddle vertex twice; the leftmost-turn rule must keep the ring
    # closed without crossing between the diagonal cells
    g = np.full((8, 8), 9.0)
    for r, c in [(1, 1), (2, 1), (2, 2), (3, 2), (3, 3)]:
        g[r, c] = 1.0
    out, _ = _roundtrip(g, 4)
    staircase = [r for r in out if r["area"] == 5]
    assert len(staircase) == 1 and staircase[0]["n_holes"] == 0


def test_vectorize_checkerboard_separates(ray_session):
    # 4-connectivity: diagonal same-value cells are DIFFERENT regions
    g = np.indices((8, 8)).sum(axis=0) % 2 * 1.0
    out, _ = _roundtrip(g, 4)
    assert len(out) == 64
    assert all(r["area"] == 1.0 and r["n_holes"] == 0 for r in out)


def test_vectorize_nodata_excluded(ray_session):
    from geotrellis_ray.stages.vectorize import vectorize

    g = np.full((8, 8), np.nan)  # NoData -> label -1, never vectorized
    g[2:4, 2:4] = 5.0
    ds, lay = _layer_from_grid(g, 4)
    from geotrellis_ray.stages.regiongroup import region_group

    labeled = region_group(ds, lay)
    out = vectorize(labeled, lay).take_all()
    # NaN cells are NoData (label -1) -> only the 5-region exists
    assert len(out) == 1 and out[0]["area"] == 4.0


def test_vectorize_random_hash_grid(ray_session):
    x, y = np.meshgrid(np.arange(32), np.arange(32))
    g = ((x * 2654435761 + y * 40503) % 3).astype(np.float64)
    _roundtrip(g, 16)
