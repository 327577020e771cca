"""equalize_layer / sigmoidal_contrast (stages/enhance.py) vs numpy brute
oracles over the stitched mosaic."""
import numpy as np
import pyarrow as pa
import pytest


def _layer(grid, tile):
    import ray.data as rd

    from geotrellis_ray.core.sfc import zorder

    R, C = grid.shape
    rows = []
    for kr in range(R // tile):
        for kc in range(C // tile):
            t = grid[kr * tile:(kr + 1) * tile, kc * tile:(kc + 1) * tile]
            rows.append({"key_col": kc, "key_row": kr, "sfc": int(zorder(kc, kr)),
                         "cells": t.astype(np.float64).tobytes(), "cols": tile,
                         "rows": tile, "cell_type": "float64"})
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _mosaic(rows, R, C, tile):
    out = np.full((R, C), np.nan)
    for r in rows:
        t = np.frombuffer(r["cells"], dtype=np.float64).reshape(tile, tile)
        out[r["key_row"] * tile:(r["key_row"] + 1) * tile,
            r["key_col"] * tile:(r["key_col"] + 1) * tile] = t
    return out


def test_equalize_matches_brute(ray_session):
    from geotrellis_ray.stages.enhance import equalize_layer

    rng = np.random.default_rng(5)
    g = rng.integers(3, 90, (16, 16)).astype(np.float64)
    g[0, :3] = np.nan  # NoData passes through
    got = _mosaic(equalize_layer(_layer(g, 8)).take_all(), 16, 16, 8)

    v = g[~np.isnan(g)]
    vals, cnts = np.unique(v, return_counts=True)
    cum = np.cumsum(cnts)
    lo, hi, n, c0 = vals[0], vals[-1], cum[-1], cum[0]
    expect = g.copy()
    m = ~np.isnan(g)
    idx = np.searchsorted(vals, g[m], side="right") - 1
    expect[m] = lo + np.floor((cum[idx] - c0) * (hi - lo) / (n - c0))
    np.testing.assert_array_equal(np.isnan(got), np.isnan(expect))
    np.testing.assert_array_equal(got[m], expect[m])
    # equalization flattens: the remapped CDF is ~uniform (monotone check)
    assert got[m].min() == lo and got[m].max() == hi


def test_equalize_constant_layer_passthrough(ray_session):
    from geotrellis_ray.stages.enhance import equalize_layer

    g = np.full((8, 8), 7.0)
    got = _mosaic(equalize_layer(_layer(g, 8)).take_all(), 8, 8, 8)
    np.testing.assert_array_equal(got, g)


def _brute_match(g, t):
    """Per-cell inverse-CDF histogram matching with exact rational compare."""
    from fractions import Fraction

    sv, sc = np.unique(g[~np.isnan(g)], return_counts=True)
    scum = np.cumsum(sc)
    tv, tc = np.unique(t[~np.isnan(t)], return_counts=True)
    tcum = np.cumsum(tc)
    n_s, n_t = int(scum[-1]), int(tcum[-1])
    out = g.copy()
    it = np.nditer(g, flags=["multi_index"])
    for x in it:
        if np.isnan(x):
            continue
        p = Fraction(int(scum[np.searchsorted(sv, float(x), side="right") - 1]), n_s)
        for j in range(len(tv)):
            if Fraction(int(tcum[j]), n_t) >= p:
                out[it.multi_index] = tv[j]
                break
    return out


def test_match_histogram_brute(ray_session):
    from geotrellis_ray.stages.enhance import match_histogram

    rng = np.random.default_rng(11)
    g = rng.integers(0, 40, (16, 16)).astype(np.float64)
    g[0, :2] = np.nan
    t = (rng.integers(0, 9, (8, 8)) ** 2).astype(np.float64)  # skewed target
    got = _mosaic(match_histogram(_layer(g, 8), _layer(t, 8)).take_all(), 16, 16, 8)
    expect = _brute_match(g, t)
    m = ~np.isnan(g)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(expect))
    np.testing.assert_array_equal(got[m], expect[m])
    # every output value is drawn from the target's value set
    assert set(np.unique(got[m])) <= set(np.unique(t))


def test_match_histogram_self_identity(ray_session):
    from geotrellis_ray.stages.enhance import match_histogram

    rng = np.random.default_rng(3)
    g = rng.integers(5, 25, (8, 8)).astype(np.float64)
    got = _mosaic(match_histogram(_layer(g, 8), _layer(g, 8)).take_all(), 8, 8, 8)
    np.testing.assert_array_equal(got, g)


def test_sigmoidal_matches_brute(ray_session):
    from geotrellis_ray.stages.enhance import sigmoidal_contrast

    rng = np.random.default_rng(9)
    g = rng.uniform(-4.0, 11.0, (16, 16))
    g[3, 3] = np.nan
    alpha, beta = 0.4, 8.0
    got = _mosaic(sigmoidal_contrast(_layer(g, 8), alpha, beta).take_all(), 16, 16, 8)

    lo, hi = np.nanmin(g), np.nanmax(g)
    sig = lambda u: 1.0 / (1.0 + np.exp(beta * (alpha - u)))
    u = (g - lo) / (hi - lo)
    expect = lo + (hi - lo) * (sig(u) - sig(0.0)) / (sig(1.0) - sig(0.0))
    m = ~np.isnan(g)
    np.testing.assert_allclose(got[m], expect[m], rtol=0, atol=1e-12)
    assert np.isnan(got[3, 3])
    # endpoints map to themselves; midpoint contrast increases slope
    assert got[m].min() == pytest.approx(lo) and got[m].max() == pytest.approx(hi)


def test_normalize_layer(ray_session):
    from geotrellis_ray.stages.enhance import normalize_layer

    rng = np.random.default_rng(8)
    g = rng.integers(10, 200, (16, 16)).astype(np.float64)
    g[1, 1] = np.nan
    got = _mosaic(normalize_layer(_layer(g, 8), 0.0, 100.0).take_all(), 16, 16, 8)
    lo, hi = np.nanmin(g), np.nanmax(g)
    exp = 0.0 + (g - lo) * 100.0 / (hi - lo)
    m = ~np.isnan(g)
    np.testing.assert_array_equal(got[m], exp[m])
    assert np.isnan(got[1, 1])
    assert got[m].min() == 0.0 and got[m].max() == 100.0
    # constant layer -> new_min
    c = np.full((8, 8), 5.0)
    gotc = _mosaic(normalize_layer(_layer(c, 8), 2.0, 9.0).take_all(), 8, 8, 8)
    np.testing.assert_array_equal(gotc, np.full((8, 8), 2.0))
