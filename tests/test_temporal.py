"""Temporal composites/trend (stages/temporal.py) vs per-pixel numpy brute
oracles, incl. NoData-in-any-bin propagation."""
import numpy as np
import pyarrow as pa
import pytest


def _st_layer(cubes, tile):
    """cubes: dict time_bin -> (R, C) grid; returns a SpaceTime layer ds."""
    import ray.data as rd

    from geotrellis_ray.core.sfc import zorder

    rows = []
    for t, grid in cubes.items():
        R, C = grid.shape
        for kr in range(R // tile):
            for kc in range(C // tile):
                g = grid[kr * tile:(kr + 1) * tile, kc * tile:(kc + 1) * tile]
                rows.append({"key_col": kc, "key_row": kr, "time_bin": t,
                             "sfc": int(zorder(kc, kr)),
                             "cells": g.astype(np.float64).tobytes(),
                             "cols": tile, "rows": tile, "cell_type": "float64"})
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _mosaic(rows, R, C, tile):
    out = np.full((R, C), np.nan)
    for r in rows:
        t = np.frombuffer(r["cells"], dtype=np.float64).reshape(tile, tile)
        out[r["key_row"] * tile:(r["key_row"] + 1) * tile,
            r["key_col"] * tile:(r["key_col"] + 1) * tile] = t
    return out


@pytest.mark.parametrize("op,npfn", [("median", np.median), ("mean", np.mean),
                                     ("min", np.min), ("max", np.max)])
def test_temporal_composite(ray_session, op, npfn):
    from geotrellis_ray.stages.temporal import temporal_composite

    rng = np.random.default_rng(21)
    cubes = {t: rng.integers(0, 50, (16, 16)).astype(np.float64) for t in range(5)}
    cubes[2][3, 3] = np.nan  # NoData in one bin -> NaN out
    got = _mosaic(temporal_composite(_st_layer(cubes, 8), op).take_all(), 16, 16, 8)
    stack = np.stack([cubes[t] for t in range(5)])
    exp = npfn(stack, axis=0)
    exp[np.isnan(stack).any(axis=0)] = np.nan
    np.testing.assert_array_equal(np.isnan(got), np.isnan(exp))
    m = ~np.isnan(exp)
    np.testing.assert_array_equal(got[m], exp[m])


def test_temporal_trend(ray_session):
    from geotrellis_ray.stages.temporal import temporal_trend

    rng = np.random.default_rng(22)
    base = rng.integers(0, 20, (16, 16)).astype(np.float64)
    slope = rng.integers(-3, 4, (16, 16)).astype(np.float64)
    noiseless = {t: base + slope * t for t in range(5)}
    got = _mosaic(temporal_trend(_st_layer(noiseless, 8)).take_all(), 16, 16, 8)
    np.testing.assert_allclose(got, slope, atol=1e-12)
    # irregular bins: t = 0, 1, 5
    cubes = {t: base + slope * t for t in (0, 1, 5)}
    got2 = _mosaic(temporal_trend(_st_layer(cubes, 8)).take_all(), 16, 16, 8)
    np.testing.assert_allclose(got2, slope, atol=1e-12)


def test_temporal_theil_sen(ray_session):
    from geotrellis_ray.stages.temporal import temporal_theil_sen

    rng = np.random.default_rng(25)
    base = rng.integers(0, 20, (16, 16)).astype(np.float64)
    slope = rng.integers(-3, 4, (16, 16)).astype(np.float64)
    cubes = {t: base + slope * t for t in range(5)}
    # plant one OUTLIER bin: Theil-Sen must still recover the exact slope
    cubes[2] = cubes[2] + 1000.0
    got = _mosaic(temporal_theil_sen(_st_layer(cubes, 8)).take_all(), 16, 16, 8)
    np.testing.assert_allclose(got, slope, atol=1e-9)
    # brute median-of-pairwise-slopes oracle on a random (non-linear) stack
    cubes2 = {t: rng.integers(0, 30, (8, 8)).astype(np.float64) for t in range(4)}
    got2 = _mosaic(temporal_theil_sen(_st_layer(cubes2, 8)).take_all(), 8, 8, 8)
    stack = np.stack([cubes2[t] for t in range(4)])
    slopes = [(stack[j] - stack[i]) / (j - i)
              for i in range(4) for j in range(i + 1, 4)]
    np.testing.assert_allclose(got2, np.median(np.stack(slopes), axis=0),
                               atol=1e-12)
