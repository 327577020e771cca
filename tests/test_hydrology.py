"""Hydrology tests: D8 direction against a per-cell brute oracle on the
mosaic, and flow accumulation against an independent topological-order
accumulation (Kahn) — cross-tile flow paths exercised."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")
import ray.data  # noqa: E402

from geotrellis_ray.core.raster import decode_tile, encode_tile  # noqa: E402
from geotrellis_ray.core.sfc import zorder  # noqa: E402
from geotrellis_ray.stages.hydrology import (  # noqa: E402
    D8,
    acc_tile,
    flow_accumulation,
    flow_direction,
)

T = 8


def _layer_from(big):
    ny, nx = big.shape[0] // T, big.shape[1] // T
    rows = []
    for c in range(nx):
        for r in range(ny):
            cells, cc, rr, ct = encode_tile(big[r * T:(r + 1) * T, c * T:(c + 1) * T])
            rows.append({"key_col": c, "key_row": r, "sfc": int(zorder(c, r)),
                         "cells": cells, "cols": cc, "rows": rr, "cell_type": ct})
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _to_grid(ds, plane="cells"):
    out = None
    for row in ds.take_all():
        if plane == "cells":
            a = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
        else:
            a = acc_tile(row)
        if out is None:
            # infer mosaic size lazily
            out = {}
        out[(row["key_col"], row["key_row"])] = a
    nx = max(k[0] for k in out) + 1
    ny = max(k[1] for k in out) + 1
    big = np.full((ny * T, nx * T), np.nan)
    for (c, r), a in out.items():
        big[r * T:(r + 1) * T, c * T:(c + 1) * T] = a
    return big


def _brute_d8(big):
    rows, cols = big.shape
    out = np.full(big.shape, np.nan)
    for i in range(rows):
        for j in range(cols):
            z = big[i, j]
            if np.isnan(z):
                continue
            best, code = 0.0, 0
            for dr, dc, cd, dist in D8:
                ni, nj = i + dr, j + dc
                if not (0 <= ni < rows and 0 <= nj < cols):
                    continue
                nz = big[ni, nj]
                if np.isnan(nz):
                    continue
                drop = (z - nz) / dist
                if drop > best:
                    best, code = drop, cd
            out[i, j] = code
    return out


def _brute_accumulation(dirs):
    """Kahn topological accumulation over the D8 DAG."""
    rows, cols = dirs.shape
    code_to_off = {cd: (dr, dc) for dr, dc, cd, _ in D8}
    indeg = np.zeros(dirs.shape, dtype=np.int64)
    target = {}
    for i in range(rows):
        for j in range(cols):
            d = dirs[i, j]
            if np.isnan(d) or d == 0:
                continue
            dr, dc = code_to_off[int(d)]
            ni, nj = i + dr, j + dc
            if 0 <= ni < rows and 0 <= nj < cols and not np.isnan(dirs[ni, nj]):
                target[(i, j)] = (ni, nj)
                indeg[ni, nj] += 1
    acc = np.zeros(dirs.shape)
    from collections import deque

    qq = deque((i, j) for i in range(rows) for j in range(cols) if indeg[i, j] == 0)
    while qq:
        i, j = qq.popleft()
        t = target.get((i, j))
        if t is None:
            continue
        acc[t] += acc[i, j] + 1
        indeg[t] -= 1
        if indeg[t] == 0:
            qq.append(t)
    acc[np.isnan(dirs)] = np.nan
    return acc


def _dem(nx=3, ny=3, seed=9):
    rng = np.random.default_rng(seed)
    # a sloped plane + noise: long cross-tile flow paths
    y, x = np.mgrid[0:ny * T, 0:nx * T]
    return 100.0 - 0.8 * x - 0.5 * y + rng.uniform(0, 1.2, (ny * T, nx * T))


def test_flow_direction_matches_brute(ray_session):
    big = _dem()
    got = _to_grid(flow_direction(_layer_from(big)))
    exp = _brute_d8(big)
    np.testing.assert_array_equal(got, exp)


def test_flow_accumulation_matches_topological(ray_session):
    big = _dem(seed=12)
    dirs_ds = flow_direction(_layer_from(big)).materialize()
    dirs = _to_grid(dirs_ds)
    got = _to_grid(flow_accumulation(dirs_ds, max_rounds=32), plane="acc")
    exp = _brute_accumulation(dirs)
    np.testing.assert_allclose(got, exp, equal_nan=True)
    # the sloped plane must produce real drainage: some cell collects > 20
    assert np.nanmax(exp) > 20


def test_d8_argmax_first_tie_break_matches_oracle_rule():
    """The q_hydrology_grid SQL oracle picks min-D8-order among drops equal
    to the max; the engine's running strict-> scan must agree on exact
    float ties (equal integer height drops at equal distance class)."""
    from geotrellis_ray.stages.hydrology import d8_direction

    # center 5; E and S neighbors both 3 (drop 2/1): tie -> E (code 1)
    buf = np.full((3, 3), 9.0)
    buf[1, 1] = 5.0
    buf[1, 2] = 3.0
    buf[2, 1] = 3.0
    assert d8_direction(buf)[0, 0] == 1.0
    # SE and SW both 2 (drop 3/sqrt2): tie -> SE (code 2)
    buf = np.full((3, 3), 9.0)
    buf[1, 1] = 5.0
    buf[2, 2] = 2.0
    buf[2, 0] = 2.0
    assert d8_direction(buf)[0, 0] == 2.0
    # no lower neighbor -> 0
    buf = np.full((3, 3), 5.0)
    assert d8_direction(buf)[0, 0] == 0.0
