"""Spatial autocorrelation: Moran's I (global + local Anselin), Geary's C,
and the Getis–Ord Gi* hot-spot statistic.

GeoTrellis ships Moran's I as focal operations
(ref:raster/src/main/scala/geotrellis/raster/mapalgebra/focal/MoransICalculation.scala
— ScalarMoransICalculation / TileMoransICalculation, L:unverified —
/root/reference empty at survey time); Geary's C and Gi* round out the
standard ESDA trio on the same frame. Rebuilt layer-wide, Ray-Data-first,
with the standard queen-contiguity (8-neighbor, w_ij = 1) weights:

    global I:  I   = (n / W) * sum_i z_i * S_i / sum_i z_i^2
    local  I:  I_i = z_i * S_i / m2,     m2 = sum z^2 / n
    Geary C:   C   = ((n - 1) / (2 W)) * sum_i D_i / sum_i z_i^2,
               D_i = sum over valid neighbors j of (x_i - x_j)^2
    Gi*:       G_i = (S*_i - mu w*_i)
                     / (s sqrt((n w*_i - w*_i^2) / (n - 1))),
               S*_i = window sum INCLUDING self, w*_i = window cell count,
               s = sqrt(sum x^2 / n - mu^2)

where z_i = x_i - mean, S_i = sum of z over VALID neighbors of i, and
W = number of ordered valid neighbor pairs. NoData (NaN) cells are excluded
as centers and as neighbors; grid-edge cells simply have fewer neighbors.

Scale shape: pass 1 is a slim (n, sum, sumsq) per-block partial reduced by
Dataset.sum (tree aggregate, bytes per block); pass 2 is buffer_tiles'
bounded 9-way collar exchange — the only shuffle — followed by a pure
vectorized shift-stack per tile. Global partials reduce to four scalars per
block; nothing corpus-sized ever reaches the driver.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .layer_ops import _tile_table, batch_to_cube, buffer_tiles

__all__ = ["gearys_c_global", "getis_ord_gstar", "morans_i_global",
           "morans_i_local"]


def _layer_moments(ds) -> tuple[int, float, float]:
    """(n, sum, sumsq) over all valid cells — one slim tree aggregate."""
    def part(batch: pa.Table) -> pa.Table:
        n = s = s2 = 0.0
        cols_a = batch["cols"].to_numpy(zero_copy_only=False)
        rows_a = batch["rows"].to_numpy(zero_copy_only=False)
        for i in range(batch.num_rows):
            a = np.frombuffer(batch["cells"][i].as_py(), dtype=np.float64).reshape(
                int(rows_a[i]), int(cols_a[i]))
            v = a[~np.isnan(a)]
            n += len(v)
            s += float(v.sum())
            s2 += float((v * v).sum())
        return pa.table({"n": pa.array([n]), "s": pa.array([s]), "s2": pa.array([s2])})

    tot = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).sum(
        ["n", "s", "s2"])
    return int(tot["sum(n)"]), float(tot["sum(s)"]), float(tot["sum(s2)"])


def _centered_neighbor_sums(batch: pa.Table, mu: float):
    """From a BUFFERED tile batch: (z centers, neighbor z sums, neighbor
    counts), each (n, R, C). Shift accumulation runs in fixed (dr, dc)
    order so float results are deterministic across block splits."""
    cube = batch_to_cube(batch)  # (n, R+2, C+2)
    z = cube - mu                # NaN propagates
    R, C = cube.shape[1] - 2, cube.shape[2] - 2
    S = np.zeros((cube.shape[0], R, C))
    W = np.zeros((cube.shape[0], R, C))
    for dr in (0, 1, 2):
        for dc in (0, 1, 2):
            if dr == 1 and dc == 1:
                continue
            v = z[:, dr:dr + R, dc:dc + C]
            ok = ~np.isnan(v)
            S += np.where(ok, v, 0.0)
            W += ok
    zc = z[:, 1:-1, 1:-1]
    return zc, S, W


def morans_i_global(ds) -> dict:
    """Global Moran's I of a tile layer. Returns
    {"morans_i", "w_pairs", "n_cells"}; I is NaN for constant layers."""
    n, s, s2 = _layer_moments(ds)
    if n == 0:
        return {"morans_i": float("nan"), "w_pairs": 0, "n_cells": 0}
    mu = s / n
    den = s2 - n * mu * mu  # sum z^2

    def part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"num": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        zc, S, W = _centered_neighbor_sums(batch, mu)
        ok = ~np.isnan(zc)
        return pa.table({"num": pa.array([float((zc[ok] * S[ok]).sum())]),
                         "w": pa.array([float(W[ok].sum())])})

    tot = buffer_tiles(ds, margin=1).map_batches(
        part, batch_format="pyarrow", zero_copy_batch=True).sum(["num", "w"])
    w = float(tot["sum(w)"])
    i = (n / w) * float(tot["sum(num)"]) / den if (w > 0 and den > 0) else float("nan")
    return {"morans_i": i, "w_pairs": int(w), "n_cells": n}


def morans_i_local(ds):
    """Local (Anselin) Moran's I: per-cell I_i = z_i * S_i / m2 as a new
    tile layer (same keys/layout; NoData centers stay NoData)."""
    n, s, s2 = _layer_moments(ds)
    mu = s / n if n else 0.0
    m2 = (s2 - n * mu * mu) / n if n else float("nan")

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        zc, S, _W = _centered_neighbor_sums(batch, mu)
        with np.errstate(invalid="ignore"):
            out = zc * S / m2
        return _tile_table(batch, out)

    return buffer_tiles(ds, margin=1).map_batches(
        local, batch_format="pyarrow", zero_copy_batch=True)


def gearys_c_global(ds) -> dict:
    """Global Geary's C of a tile layer (queen weights, w_ij = 1):

        C = ((n - 1) / (2 W)) * sum_i D_i / sum_i z_i^2

    with D_i the sum of (x_i - x_j)^2 over VALID neighbors j. Same two-pass
    shape as morans_i_global: one slim moments aggregate, then the bounded
    collar exchange with two scalars per block; the squared-difference
    accumulation runs in the fixed (dr, dc) shift order so results are
    deterministic across block splits. Returns {"gearys_c", "w_pairs",
    "n_cells"}; C is NaN for constant or empty layers. C < 1 indicates
    positive spatial autocorrelation (the Moran's-I complement)."""
    n, s, s2 = _layer_moments(ds)
    if n == 0:
        return {"gearys_c": float("nan"), "w_pairs": 0, "n_cells": 0}
    mu = s / n
    den = s2 - n * mu * mu  # sum z^2

    def part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"num": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        cube = batch_to_cube(batch)  # (n, R+2, C+2)
        R, C = cube.shape[1] - 2, cube.shape[2] - 2
        x = cube[:, 1:-1, 1:-1]
        D = np.zeros((cube.shape[0], R, C))
        W = np.zeros((cube.shape[0], R, C))
        for dr in (0, 1, 2):
            for dc in (0, 1, 2):
                if dr == 1 and dc == 1:
                    continue
                v = cube[:, dr:dr + R, dc:dc + C]
                ok = ~np.isnan(v)
                d = x - v
                D += np.where(ok, d * d, 0.0)
                W += ok
        ok = ~np.isnan(x)
        return pa.table({"num": pa.array([float(D[ok].sum())]),
                         "w": pa.array([float(W[ok].sum())])})

    tot = buffer_tiles(ds, margin=1).map_batches(
        part, batch_format="pyarrow", zero_copy_batch=True).sum(["num", "w"])
    w = float(tot["sum(w)"])
    c = ((n - 1) / (2.0 * w)) * float(tot["sum(num)"]) / den \
        if (w > 0 and den > 0) else float("nan")
    return {"gearys_c": c, "w_pairs": int(w), "n_cells": n}


def getis_ord_gstar(ds):
    """Getis–Ord Gi* hot-spot statistic per cell, as a new tile layer
    (same keys/layout; NoData centers stay NoData):

        G_i = (S*_i - mu w*_i) / (s sqrt((n w*_i - w*_i^2) / (n - 1)))

    where the window INCLUDES the center (the * variant), S*_i / w*_i are
    the window value-sum / valid-cell-count, mu and s are the layer mean
    and population std. |G_i| is an approximate z-score: large positive =
    hot spot, large negative = cold spot. Same collar-exchange frame as
    morans_i_local; NaN neighbors are excluded from both sums."""
    n, s, s2 = _layer_moments(ds)
    mu = s / n if n else 0.0
    var = s2 / n - mu * mu if n else float("nan")
    sd = float(np.sqrt(var)) if var > 0 else float("nan")

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        cube = batch_to_cube(batch)  # (m, R+2, C+2)
        R, C = cube.shape[1] - 2, cube.shape[2] - 2
        S = np.zeros((cube.shape[0], R, C))
        W = np.zeros((cube.shape[0], R, C))
        for dr in (0, 1, 2):  # full 3x3 window, center included
            for dc in (0, 1, 2):
                v = cube[:, dr:dr + R, dc:dc + C]
                ok = ~np.isnan(v)
                S += np.where(ok, v, 0.0)
                W += ok
        center = cube[:, 1:-1, 1:-1]
        with np.errstate(invalid="ignore", divide="ignore"):
            denom = sd * np.sqrt((n * W - W * W) / (n - 1.0))
            out = np.where(np.isnan(center), np.nan, (S - mu * W) / denom)
        return _tile_table(batch, out)

    return buffer_tiles(ds, margin=1).map_batches(
        local, batch_format="pyarrow", zero_copy_batch=True)
