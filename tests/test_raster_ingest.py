"""Raster ingest tests: GRD codec roundtrip + the full read -> cut ->
tileToLayout flow against a single-machine mosaic oracle (SURVEY.md §3.1)."""

from __future__ import annotations

import numpy as np
import pytest

ray = pytest.importorskip("ray")
import ray.data  # noqa: E402

from geotrellis_ray.core.layout import Extent, LayoutDefinition, TileLayout  # noqa: E402
from geotrellis_ray.core.raster import decode_tile  # noqa: E402
from geotrellis_ray.sources.raster_ingest import (  # noqa: E402
    decode_grid,
    encode_grid,
    read_raster_files,
    tile_to_layout,
)


def test_grid_codec_roundtrip():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 9, (5, 7))
    a[0, 0] = np.nan
    ext, out = decode_grid(encode_grid(Extent(1.0, 2.0, 3.5, 4.0), a))
    assert ext.to_tuple() == (1.0, 2.0, 3.5, 4.0)
    np.testing.assert_allclose(out, a, equal_nan=True)


def test_ingest_tile_to_layout_matches_mosaic(ray_session, tmp_path):
    """Two ALIGNED rasters (each covering half the world grid, overlapping in
    the middle column) -> tileToLayout == mosaic oracle. Grid cells coincide
    with layout cells so nearest-neighbor sampling is exact."""
    layout = LayoutDefinition(Extent(0.0, 0.0, 4.0, 4.0), TileLayout(4, 4, 8, 8))
    # world raster at layout resolution: 32x32 cells over (0,0,4,4)
    rng = np.random.default_rng(2)
    world = rng.uniform(1, 9, (32, 32))
    d = tmp_path / "grids"
    d.mkdir()
    # left file covers x [0, 2.5), right covers [1.5, 4): overlap x [1.5, 2.5)
    left = world[:, :20]    # x 0..2.5  (20 cols)
    right = world[:, 12:]   # x 1.5..4  (20 cols)
    (d / "a_left.grd").write_bytes(encode_grid(Extent(0.0, 0.0, 2.5, 4.0), left))
    (d / "b_right.grd").write_bytes(encode_grid(Extent(1.5, 0.0, 4.0, 4.0), right))

    tiles = tile_to_layout(read_raster_files(str(d)), layout).take_all()
    got = {(t["key_col"], t["key_row"]): decode_tile(t["cells"], t["cols"], t["rows"], t["cell_type"])
           for t in tiles}
    assert set(got) == {(c, r) for c in range(4) for r in range(4)}
    for (c, r), tile in got.items():
        exp = world[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8]
        np.testing.assert_allclose(tile, exp)
