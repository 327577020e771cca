"""Reproject / vector-tile / render / spacetime operator tests (single-machine
oracle pattern, SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

ray = pytest.importorskip("ray")
import ray.data  # noqa: E402

from geotrellis_ray.core import wkb  # noqa: E402
from geotrellis_ray.core.layout import Extent, LayoutDefinition, TileLayout  # noqa: E402
from geotrellis_ray.core.mercator import latlng_to_webmercator  # noqa: E402
from geotrellis_ray.core.raster import decode_tile, encode_tile  # noqa: E402
from geotrellis_ray.core.render import ColorMap, encode_png_rgba, stitch  # noqa: E402
from geotrellis_ray.core.sfc import zorder  # noqa: E402
from geotrellis_ray.stages.reproject import reproject_layer, reproject_points_batch  # noqa: E402
from geotrellis_ray.stages.spacetime import (  # noqa: E402
    assign_spacetime_key_batch,
    filter_between,
    to_spatial,
)
from geotrellis_ray.stages.vector_tile import decode_tile_features, vector_tiles  # noqa: E402


def test_reproject_points_roundtrip(ray_session):
    t = pa.table({"lon": pa.array([0.0, 10.0, -120.0]), "lat": pa.array([0.0, 45.0, -33.0])})
    ds = ray.data.from_arrow(t)
    out = ds.map_batches(
        lambda b: reproject_points_batch(b, "latlng", "webmercator"),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()
    ex, ey = latlng_to_webmercator(np.array([0.0, 45.0, -33.0]), np.array([0.0, 10.0, -120.0]))
    np.testing.assert_allclose(out["x"], ex)
    np.testing.assert_allclose(out["y"], ey)


def test_reproject_layer_latlng_identity_zoom_shift(ray_session):
    """Warp a latlng layer onto a latlng layout of twice the resolution:
    nearest-neighbor means each source cell maps to a 2x2 block."""
    src = LayoutDefinition(Extent(0.0, 0.0, 4.0, 4.0), TileLayout(2, 2, 4, 4))
    dst = LayoutDefinition(Extent(0.0, 0.0, 4.0, 4.0), TileLayout(4, 4, 4, 4))
    rng = np.random.default_rng(5)
    rows = []
    vals = {}
    for c in range(2):
        for r in range(2):
            a = rng.uniform(1, 9, (4, 4))
            vals[(c, r)] = a
            cells, cols, trows, ct = encode_tile(a)
            rows.append({"key_col": c, "key_row": r, "sfc": int(zorder(c, r)),
                         "cells": cells, "cols": cols, "rows": trows, "cell_type": ct})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = reproject_layer(ds, src, dst, "latlng", "latlng").take_all()
    got = {(t["key_col"], t["key_row"]): decode_tile(t["cells"], t["cols"], t["rows"], t["cell_type"]) for t in out}
    assert set(got) == {(c, r) for c in range(4) for r in range(4)}
    for (dc, dr), tile in got.items():
        src_tile = vals[(dc // 2, dr // 2)]
        qc = (dc % 2) * 2
        qr = (dr % 2) * 2
        exp = np.repeat(np.repeat(src_tile[qr:qr + 2, qc:qc + 2], 2, axis=0), 2, axis=1)
        np.testing.assert_allclose(tile, exp)


def test_vector_tiles_roundtrip(ray_session):
    layout = LayoutDefinition(Extent(0.0, 0.0, 8.0, 8.0), TileLayout(2, 2, 16, 16))
    polys = [
        (1, {"type": "Polygon", "rings": [np.array([(0.5, 0.5), (3.5, 0.5), (3.5, 3.5), (0.5, 3.5), (0.5, 0.5)])]}),
        (2, {"type": "Polygon", "rings": [np.array([(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0), (2.0, 2.0)])]}),
    ]
    t = pa.table({"polygon_id": pa.array([p[0] for p in polys], pa.int64()),
                  "wkb": pa.array([wkb.encode(p[1]) for p in polys], pa.binary())})
    out = vector_tiles(ray.data.from_arrow(t), layout).take_all()
    tiles = {(r["key_col"], r["key_row"]): r for r in out}
    # poly 1 spans only tile (0,1) [y<4 -> bottom row]; poly 2 spans all 4
    assert set(tiles) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    grid, feats = decode_tile_features(tiles[(0, 1)]["mvt"])
    assert grid == 4096 and [f[0] for f in feats] == [1, 2]
    # quantized coords of poly1 in tile (0,1) (extent x:0-4, y:0-4)
    fid, gt, pts = feats[0]
    assert gt == 3
    xs = pts[:, 0].astype(float) / grid * 4.0
    assert abs(xs.min() - 0.5) < 0.01 and abs(xs.max() - 3.5) < 0.01
    for k in [(1, 0), (1, 1)]:
        _, feats_k = decode_tile_features(tiles[k]["mvt"])
        assert [f[0] for f in feats_k] == [2]


def test_png_and_stitch(ray_session):
    cm = ColorMap([0.5, 1.5], [(255, 0, 0, 255), (0, 255, 0, 255)])
    rgba = cm.apply(np.array([[0.2, 1.0], [np.nan, 2.0]]))
    assert tuple(rgba[0, 0]) == (255, 0, 0, 255)
    assert tuple(rgba[0, 1]) == (0, 255, 0, 255)
    assert tuple(rgba[1, 0]) == (0, 0, 0, 0)
    assert tuple(rgba[1, 1]) == (0, 255, 0, 255)
    png = encode_png_rgba(rgba)
    assert png[:8] == b"\x89PNG\r\n\x1a\n" and b"IHDR" in png and b"IEND" in png

    rows = []
    for c in range(2):
        for r in range(2):
            a = np.full((4, 4), float(10 * c + r))
            cells, cols, trows, ct = encode_tile(a)
            rows.append({"key_col": c, "key_row": r, "cells": cells, "cols": cols,
                         "rows": trows, "cell_type": ct})
    big, origin = stitch(rows)
    assert origin == (0, 0) and big.shape == (8, 8)
    assert big[0, 0] == 0.0 and big[0, 4] == 10.0 and big[4, 0] == 1.0 and big[4, 4] == 11.0


def test_spacetime_key_and_filters(ray_session):
    n = 1000
    ts = pa.array((np.arange(n, dtype=np.int64) * 600_000_000), pa.timestamp("us"))  # 10-min steps
    t = pa.table({"warc_ts": ts,
                  "key_col": pa.array(np.arange(n, dtype=np.int32) % 7, pa.int32()),
                  "key_row": pa.array(np.arange(n, dtype=np.int32) % 5, pa.int32())})
    ds = ray.data.from_arrow(t)
    st = ds.map_batches(assign_spacetime_key_batch, batch_format="pyarrow", zero_copy_batch=True)
    df = st.to_pandas()
    assert "sfc3" in df and "time_bin" in df
    # oracle: time_bin = ts_us // 1h; z3 decodes back
    from geotrellis_ray.core.sfc import zorder3_decode
    c2, r2, t2 = zorder3_decode(df["sfc3"].to_numpy().astype(np.uint64))
    np.testing.assert_array_equal(c2.astype(np.int32), df["key_col"])
    np.testing.assert_array_equal(r2.astype(np.int32), df["key_row"])
    np.testing.assert_array_equal(t2.astype(np.int64), df["time_bin"])

    sub = filter_between(st, 10, 20).to_pandas()
    assert sub["time_bin"].min() == 10 and sub["time_bin"].max() == 20
    assert len(sub) == ((df["time_bin"] >= 10) & (df["time_bin"] <= 20)).sum()

    collapsed = to_spatial(st, agg_specs=[("key_col", "count", "n")]).to_pandas()
    assert set(collapsed.columns) == {"key_col", "key_row", "n"}
    assert collapsed["n"].sum() == n


@pytest.mark.parametrize("method", ["bilinear", "cubic", "cubic-spline", "lanczos"])
def test_reproject_layer_kernel_seam_oracle(ray_session, method):
    """Kernel reproject vs a single-array brute oracle: stitch the whole src
    layer into ONE global grid padded with a NaN collar (the distributed
    path's boundary-tile collar), sample every dst cell center with the SAME
    core.raster.sample_points kernel, and require agreement — this pins the
    buffer_tiles seam plumbing, the core-ownership mask, and the
    buffered-frame coordinate offsets (the only distributed-specific logic;
    any seam bug shows as a kernel-support-sized band of mismatches)."""
    from geotrellis_ray.core.raster import sample_points
    from geotrellis_ray.stages.reproject import _REPROJECT_KERNEL_MARGIN, reproject_layer

    src = LayoutDefinition(Extent(0.0, 0.0, 4.0, 4.0), TileLayout(3, 3, 8, 8))
    # dst grid offset + rescaled so cell centers never land on src cell edges
    dst = LayoutDefinition(Extent(-0.3, -0.2, 4.1, 4.2), TileLayout(2, 2, 10, 10))
    rng = np.random.default_rng(11)
    glob = rng.uniform(-5.0, 5.0, (24, 24))
    rows = []
    for c in range(3):
        for r in range(3):
            a = glob[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8]
            cells, cols, trows, ct = encode_tile(a)
            rows.append({"key_col": c, "key_row": r, "sfc": int(zorder(c, r)),
                         "cells": cells, "cols": cols, "rows": trows, "cell_type": ct})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = reproject_layer(ds, src, dst, "latlng", "latlng", method=method).take_all()
    got = {(t["key_col"], t["key_row"]):
           decode_tile(t["cells"], t["cols"], t["rows"], t["cell_type"]) for t in out}
    assert got, "kernel reproject produced no tiles"

    m = _REPROJECT_KERNEL_MARGIN[method]
    pad = np.full((24 + 2 * m, 24 + 2 * m), np.nan)
    pad[m:24 + m, m:24 + m] = glob
    cw = 4.0 / 24
    for (dc, dr), tile in got.items():
        d_ext = dst.key_to_extent(dc, dr)
        xs = d_ext.xmin + (np.arange(10) + 0.5) * (d_ext.xmax - d_ext.xmin) / 10
        ys = d_ext.ymax - (np.arange(10) + 0.5) * (d_ext.ymax - d_ext.ymin) / 10
        gx, gy = np.meshgrid(xs, ys)
        sx, sy = gx.ravel(), gy.ravel()
        ic = np.floor(sx / cw).astype(np.int64)
        ir = np.floor((4.0 - sy) / cw).astype(np.int64)
        ok = (ic >= 0) & (ic < 24) & (ir >= 0) & (ir < 24)
        exp = np.full(100, np.nan)
        exp[ok] = sample_points(pad, (4.0 - sy[ok]) / cw - 0.5 + m,
                                sx[ok] / cw - 0.5 + m, method)
        np.testing.assert_allclose(tile.ravel(), exp, rtol=1e-9, atol=1e-9,
                                   equal_nan=True)


def test_reproject_layer_int_nodata_sentinel(ray_session):
    """Nearest reproject of an int32 layer: INT_NODATA cells must come out
    as NaN in the (float64) warped tiles — never the raw -2^31 sentinel,
    and never allowed to win the non-NoData-wins overlap merge."""
    from geotrellis_ray.core.raster import INT_NODATA
    from geotrellis_ray.stages.reproject import reproject_layer

    src = LayoutDefinition(Extent(0.0, 0.0, 2.0, 2.0), TileLayout(2, 2, 8, 8))
    dst = LayoutDefinition(Extent(-0.1, -0.1, 2.1, 2.1), TileLayout(2, 2, 8, 8))
    rng = np.random.default_rng(5)
    rows = []
    for c in range(2):
        for r in range(2):
            a = rng.integers(1, 50, size=(8, 8)).astype(np.int32)
            a[rng.random((8, 8)) < 0.25] = INT_NODATA
            cells, cols, trows, ct = encode_tile(a)
            rows.append({"key_col": c, "key_row": r, "sfc": int(zorder(c, r)),
                         "cells": cells, "cols": cols, "rows": trows,
                         "cell_type": ct})
    out = reproject_layer(ray.data.from_arrow(pa.Table.from_pylist(rows)),
                          src, dst, "latlng", "latlng").take_all()
    assert out
    saw_nan = False
    for t in out:
        tile = decode_tile(t["cells"], t["cols"], t["rows"], t["cell_type"])
        fin = tile[~np.isnan(tile)]
        assert ((fin >= 1) & (fin < 50)).all(), "sentinel leaked through warp"
        saw_nan |= bool(np.isnan(tile).any())
    assert saw_nan  # 25% holes at these layouts must surface as NaN
