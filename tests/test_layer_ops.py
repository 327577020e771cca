"""Layer-operator tests: distributed result == single-machine numpy oracle
(the RasterizeRDDSpec pattern — SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")
import ray.data  # noqa: E402

from geotrellis_ray.core.raster import decode_tile, encode_tile  # noqa: E402
from geotrellis_ray.core.sfc import zorder  # noqa: E402
from geotrellis_ray.stages.layer_ops import (  # noqa: E402
    buffer_tiles,
    focal_mean,
    layer_local_binary,
    layer_local_scalar,
    layer_local_unary,
    merge_layers,
)

T = 8  # tile size


def tile_values(c: int, r: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(1000 * seed + 10 * c + r)
    a = rng.uniform(1.0, 9.0, size=(T, T))
    a[rng.random((T, T)) < 0.15] = np.nan  # NoData holes
    return a


def make_layer(keys, seed=0):
    rows = []
    for c, r in keys:
        cells, cols, trows, ct = encode_tile(tile_values(c, r, seed))
        rows.append({"key_col": c, "key_row": r, "sfc": int(zorder(c, r)),
                     "cells": cells, "cols": cols, "rows": trows, "cell_type": ct})
    t = pa.Table.from_pylist(rows)
    return ray.data.from_arrow(t)


def layer_to_dict(ds):
    out = {}
    for row in ds.take_all():
        out[(row["key_col"], row["key_row"])] = decode_tile(
            row["cells"], row["cols"], row["rows"], row["cell_type"]
        )
    return out


KEYS = [(c, r) for c in range(3) for r in range(3)]


def test_local_unary_sqrt(ray_session):
    got = layer_to_dict(layer_local_unary(make_layer(KEYS), "sqrt"))
    assert set(got) == set(KEYS)
    for k in KEYS:
        np.testing.assert_allclose(got[k], np.sqrt(tile_values(*k)), equal_nan=True)


def test_local_scalar_and_binary(ray_session):
    got = layer_to_dict(layer_local_scalar(make_layer(KEYS), "multiply", 3.0))
    for k in KEYS:
        np.testing.assert_allclose(got[k], tile_values(*k) * 3.0, equal_nan=True)

    a = make_layer(KEYS, seed=0)
    b = make_layer(KEYS[:5], seed=1)  # partial overlap -> inner join keeps 5
    got = layer_to_dict(layer_local_binary(a, b, "add", num_partitions=4))
    assert set(got) == set(KEYS[:5])
    for k in KEYS[:5]:
        np.testing.assert_allclose(got[k], tile_values(*k, 0) + tile_values(*k, 1), equal_nan=True)


def test_merge_layers_left_wins(ray_session):
    a = make_layer(KEYS[:4], seed=0)
    b = make_layer(KEYS[2:6], seed=1)
    got = layer_to_dict(merge_layers(a, b))
    assert set(got) == set(KEYS[:6])
    for k in KEYS[:2]:
        np.testing.assert_allclose(got[k], tile_values(*k, 0), equal_nan=True)
    for k in KEYS[4:6]:
        np.testing.assert_allclose(got[k], tile_values(*k, 1), equal_nan=True)
    for k in KEYS[2:4]:  # overlap: a wins where defined, b fills a's NoData
        av, bv = tile_values(*k, 0), tile_values(*k, 1)
        exp = np.where(np.isnan(av), bv, av)
        np.testing.assert_allclose(got[k], exp, equal_nan=True)


def _mosaic(keys, seed=0):
    """Single-machine oracle: stitch the 3x3 layer into one (3T, 3T) array."""
    big = np.full((3 * T, 3 * T), np.nan)
    for c, r in keys:
        big[r * T:(r + 1) * T, c * T:(c + 1) * T] = tile_values(c, r, seed)
    return big


def test_buffer_tiles_matches_mosaic_windows(ray_session):
    m = 2
    got = layer_to_dict(buffer_tiles(make_layer(KEYS), margin=m))
    assert set(got) == set(KEYS)
    big = np.pad(_mosaic(KEYS), m, constant_values=np.nan)
    for (c, r), tile in got.items():
        assert tile.shape == (T + 2 * m, T + 2 * m)
        exp = big[r * T:r * T + T + 2 * m, c * T:c * T + T + 2 * m]
        np.testing.assert_allclose(tile, exp, equal_nan=True)


def test_focal_mean_matches_bruteforce(ray_session):
    got = layer_to_dict(focal_mean(make_layer(KEYS), margin=1))
    big = _mosaic(KEYS)
    pad = np.pad(big, 1, constant_values=np.nan)
    exp_big = np.full_like(big, np.nan)
    for i in range(big.shape[0]):
        for j in range(big.shape[1]):
            if np.isnan(big[i, j]):
                continue
            w = pad[i:i + 3, j:j + 3]
            exp_big[i, j] = np.nanmean(w)
    for (c, r), tile in got.items():
        assert tile.shape == (T, T)
        exp = exp_big[r * T:(r + 1) * T, c * T:(c + 1) * T]
        np.testing.assert_allclose(tile, exp, equal_nan=True)


def test_layer_mask(ray_session):
    """Mask(geometry) over a layer == per-tile numpy oracle."""
    from geotrellis_ray.core.layout import Extent, LayoutDefinition, TileLayout
    from geotrellis_ray.core.raster import mask_geom
    from geotrellis_ray.stages.layer_ops import layer_mask

    layout = LayoutDefinition(Extent(0.0, 0.0, 3.0, 3.0), TileLayout(3, 3, T, T))
    geom = {"type": "Polygon", "rings": [np.array([(0.5, 0.5), (2.5, 0.5), (2.5, 2.5), (0.5, 2.5), (0.5, 0.5)])]}
    got = layer_to_dict(layer_mask(make_layer(KEYS), geom, layout))
    assert set(got) == set(KEYS)
    for (c, r), tile in got.items():
        exp = mask_geom(tile_values(c, r), layout.key_to_extent(c, r), geom)
        np.testing.assert_allclose(tile, exp, equal_nan=True)


@pytest.mark.parametrize("op,npfn", [("sum", np.nansum), ("min", np.nanmin),
                                     ("max", np.nanmax), ("median", np.nanmedian)])
def test_focal_ops_match_bruteforce(ray_session, op, npfn):
    from geotrellis_ray.stages.layer_ops import focal_op

    got = layer_to_dict(focal_op(make_layer(KEYS), op, margin=1))
    big = _mosaic(KEYS)
    pad = np.pad(big, 1, constant_values=np.nan)
    exp_big = np.full_like(big, np.nan)
    for i in range(big.shape[0]):
        for j in range(big.shape[1]):
            if np.isnan(big[i, j]):
                continue
            w = pad[i:i + 3, j:j + 3]
            exp_big[i, j] = npfn(w)
    for (c, r), tile in got.items():
        exp = exp_big[r * T:(r + 1) * T, c * T:(c + 1) * T]
        np.testing.assert_allclose(tile, exp, equal_nan=True)
