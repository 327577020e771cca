"""IterativeCostDistance vs a brute-force Dijkstra oracle on the stitched
mosaic — same crossing-cost convention, computed independently with heapq."""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")
import ray.data  # noqa: E402

from geotrellis_ray.core.raster import encode_tile  # noqa: E402
from geotrellis_ray.core.sfc import zorder  # noqa: E402
from geotrellis_ray.stages.costdistance import cost_distance, cost_tile, local_relax  # noqa: E402

T = 8
SQRT2 = float(np.sqrt(2.0))


def _friction(nx=3, ny=3, seed=5, nodata_frac=0.08):
    rng = np.random.default_rng(seed)
    big = rng.uniform(0.5, 4.0, (ny * T, nx * T))
    big[rng.random(big.shape) < nodata_frac] = np.nan
    return big


def _layer_from(big):
    ny, nx = big.shape[0] // T, big.shape[1] // T
    rows = []
    for c in range(nx):
        for r in range(ny):
            cells, cc, rr, ct = encode_tile(big[r * T:(r + 1) * T, c * T:(c + 1) * T])
            rows.append({"key_col": c, "key_row": r, "sfc": int(zorder(c, r)),
                         "cells": cells, "cols": cc, "rows": rr, "cell_type": ct})
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _dijkstra(big, sources):
    rows, cols = big.shape
    dist = np.full((rows, cols), np.inf)
    h = []
    for (r, c) in sources:
        dist[r, c] = 0.0
        heapq.heappush(h, (0.0, r, c))
    moves = [(-1, -1, SQRT2), (-1, 0, 1.0), (-1, 1, SQRT2), (0, -1, 1.0),
             (0, 1, 1.0), (1, -1, SQRT2), (1, 0, 1.0), (1, 1, SQRT2)]
    while h:
        d, r, c = heapq.heappop(h)
        if d > dist[r, c]:
            continue
        if np.isnan(big[r, c]):
            continue
        for dr, dc, mv in moves:
            nr, nc = r + dr, c + dc
            if not (0 <= nr < rows and 0 <= nc < cols):
                continue
            if np.isnan(big[nr, nc]):
                continue
            nd = d + 0.5 * (big[r, c] + big[nr, nc]) * mv
            if nd < dist[nr, nc] - 1e-15:
                dist[nr, nc] = nd
                heapq.heappush(h, (nd, nr, nc))
    dist[np.isnan(big)] = np.nan
    return dist


def test_local_relax_single_tile_matches_dijkstra():
    big = _friction(nx=1, ny=1, nodata_frac=0.1)
    cost0 = np.full(big.shape, np.inf)
    cost0[2, 3] = 0.0
    got = local_relax(cost0, big)
    exp = _dijkstra(big, [(2, 3)])
    np.testing.assert_allclose(got, exp, equal_nan=True, atol=1e-9)


def test_cost_distance_matches_dijkstra(ray_session):
    big = _friction()
    # two sources in different tiles; wavefronts must cross tile borders
    sources = [(3, 4), (20, 19)]
    # (key_col, key_row, cell_row, cell_col)
    src_cells = [(sc // T, sr // T, sr % T, sc % T) for (sr, sc) in sources]
    out = cost_distance(_layer_from(big), src_cells, max_rounds=16).take_all()
    got = np.full(big.shape, np.nan)
    for row in out:
        c, r = row["key_col"], row["key_row"]
        tile = cost_tile(row)
        got[r * T:(r + 1) * T, c * T:(c + 1) * T] = tile
    exp = _dijkstra(big, sources)
    # unreachable cells: engine inf == oracle inf
    np.testing.assert_allclose(got, exp, equal_nan=True, atol=1e-9)


def test_cost_distance_blocked_region(ray_session):
    """A NoData wall splits the grid: the far side stays inf (unreachable)."""
    big = np.ones((T, 2 * T))
    big[:, T - 1] = np.nan  # vertical wall
    out = cost_distance(_layer_from(big), [(0, 0, 4, 2)], max_rounds=8).take_all()
    got = np.full(big.shape, np.nan)
    for row in out:
        c, r = row["key_col"], row["key_row"]
        got[r * T:(r + 1) * T, c * T:(c + 1) * T] = cost_tile(row)
    assert np.isfinite(got[:, :T - 1]).all()
    assert np.isnan(got[:, T - 1]).all()
    assert np.isinf(got[:, T:]).all()
