"""GeoTiff codec tests: encode/decode round-trips across dtypes,
compression, strip/tile layout and predictor; a hand-assembled independent
TIFF fixture (reader not validated against its own writer only); and the
distributed read_geotiffs -> tile_to_layout flow."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from geotrellis_ray.core.geotiff import decode_geotiff, encode_geotiff
from geotrellis_ray.core.layout import Extent


def _grid(rows=20, cols=17, seed=0, nodata_frac=0.1):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-50, 150, (rows, cols))
    a[rng.random((rows, cols)) < nodata_frac] = np.nan
    return a


EXT = Extent(10.0, 40.0, 11.7, 42.0)


@pytest.mark.parametrize("compression", ["none", "deflate"])
@pytest.mark.parametrize("tile_size", [None, 8])
def test_roundtrip_float64(compression, tile_size):
    a = _grid()
    buf = encode_geotiff(EXT, a, compression=compression, tile_size=tile_size)
    ext, back, meta = decode_geotiff(buf)
    assert ext == EXT and meta["epsg"] == 4326
    np.testing.assert_allclose(back, a, equal_nan=True)


@pytest.mark.parametrize("dtype,predictor", [("uint8", 1), ("int16", 2), ("uint16", 2),
                                             ("int32", 1), ("float32", 1)])
def test_roundtrip_dtypes(dtype, predictor):
    a = np.floor(_grid(seed=2, nodata_frac=0.15))
    if np.dtype(dtype).kind == "u":
        nanmask = np.isnan(a)
        a = np.abs(a) % 200
        a[nanmask] = np.nan
    nodata = -9999 if np.dtype(dtype).kind != "f" else None
    if dtype == "uint8":
        nodata = 255
    buf = encode_geotiff(EXT, a, dtype=dtype, nodata=nodata, predictor=predictor, tile_size=8)
    ext, back, meta = decode_geotiff(buf)
    assert ext == EXT
    exp = a.astype(np.float64)
    if np.dtype(dtype).kind == "f":
        exp = a.astype(dtype).astype(np.float64)  # float32 precision loss is expected
    np.testing.assert_allclose(back, exp, equal_nan=True)
    if nodata is not None:
        assert meta["nodata"] == nodata


def test_roundtrip_projected_epsg():
    a = _grid(seed=3, nodata_frac=0)
    buf = encode_geotiff(Extent(500000.0, 4000000.0, 501700.0, 4002000.0), a, epsg=32633)
    _ext, back, meta = decode_geotiff(buf)
    assert meta["epsg"] == 32633
    np.testing.assert_allclose(back, a)


def test_reader_on_hand_assembled_tiff():
    """An uncompressed stripped uint8 TIFF assembled BYTE BY BYTE here (not
    via the writer): 4x3 image, one strip, pixel scale 0.5/0.25, tiepoint
    anchored at raster (0,0) -> world (100, 50)."""
    rows, cols = 3, 4
    pix = bytes(range(12))  # 0..11 row-major
    entries = []

    def entry(tag, ftype, count, value_bytes):
        entries.append((tag, struct.pack("<HHI", tag, ftype, count) + value_bytes))

    # inline values (<=4 bytes) padded to 4
    def short(v):
        return struct.pack("<H", v) + b"\x00\x00"

    def long_(v):
        return struct.pack("<I", v)

    n_entries = 11
    header = 8
    ifd_size = 2 + 12 * n_entries + 4
    # out-of-line data region starts after IFD
    scale_off = header + ifd_size
    tie_off = scale_off + 3 * 8
    pix_off = tie_off + 6 * 8
    entry(256, 3, 1, short(cols))
    entry(257, 3, 1, short(rows))
    entry(258, 3, 1, short(8))
    entry(259, 3, 1, short(1))
    entry(262, 3, 1, short(1))
    entry(273, 4, 1, long_(pix_off))
    entry(277, 3, 1, short(1))
    entry(278, 3, 1, short(rows))
    entry(279, 4, 1, long_(len(pix)))
    entry(33550, 12, 3, long_(scale_off))
    entry(33922, 12, 6, long_(tie_off))
    entries.sort(key=lambda e: e[0])
    buf = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
    buf += struct.pack("<H", n_entries) + b"".join(e[1] for e in entries) + struct.pack("<I", 0)
    buf += struct.pack("<3d", 0.5, 0.25, 0.0)
    buf += struct.pack("<6d", 0.0, 0.0, 0.0, 100.0, 50.0, 0.0)
    buf += pix
    ext, arr, meta = decode_geotiff(buf)
    assert ext == Extent(100.0, 50.0 - 3 * 0.25, 100.0 + 4 * 0.5, 50.0)
    np.testing.assert_array_equal(arr, np.arange(12, dtype=np.float64).reshape(3, 4))
    assert meta["epsg"] is None and meta["nodata"] is None


def test_reader_rejects_unsupported():
    a = _grid(rows=4, cols=4, nodata_frac=0)
    buf = encode_geotiff(EXT, a)
    with pytest.raises(ValueError):
        decode_geotiff(b"XX" + buf[2:])
    # BigTIFF header with a wrong offset size (must be 8)
    bad_big = b"II" + struct.pack("<HHH", 43, 4, 0) + struct.pack("<Q", 16)
    with pytest.raises(ValueError, match="BigTIFF"):
        decode_geotiff(bad_big)


def test_read_geotiffs_tile_to_layout(ray_session, tmp_path):
    """Four overlapping GeoTiff quadrants -> read_geotiffs -> tile_to_layout
    == the mosaic oracle (same pattern as the GRD ingest test)."""
    import ray.data  # noqa: F401

    from geotrellis_ray.core.layout import LayoutDefinition, TileLayout
    from geotrellis_ray.core.raster import decode_tile
    from geotrellis_ray.sources.raster_ingest import read_geotiffs, tile_to_layout

    rng = np.random.default_rng(13)
    world = rng.uniform(1, 9, (64, 64))
    for i, (x0, y0) in enumerate([(0, 0), (3, 0), (0, 3), (3, 3)]):
        sub = world[y0 * 8:(y0 + 5) * 8, x0 * 8:(x0 + 5) * 8]
        ext = Extent(float(x0), 8.0 - float(y0 + 5), float(x0 + 5), 8.0 - float(y0))
        (tmp_path / f"q{i}.tif").write_bytes(
            encode_geotiff(ext, sub, compression="deflate", tile_size=16))
    layout = LayoutDefinition(Extent(0.0, 0.0, 8.0, 8.0), TileLayout(8, 8, 8, 8))
    tiles = tile_to_layout(read_geotiffs(str(tmp_path)), layout)
    got = {}
    for row in tiles.take_all():
        got[(row["key_col"], row["key_row"])] = decode_tile(
            row["cells"], row["cols"], row["rows"], row["cell_type"])
    assert len(got) == 64
    for (c, r), tile in got.items():
        exp = world[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8]
        np.testing.assert_allclose(tile, exp)


def test_write_geotiffs_sink_roundtrip(ray_session, tmp_path):
    """Layer -> per-tile GeoTiff sink -> read_geotiffs recovers every tile."""
    import pyarrow as pa
    import ray.data

    from geotrellis_ray.core.layout import LayoutDefinition, TileLayout
    from geotrellis_ray.core.raster import decode_tile, encode_tile
    from geotrellis_ray.core.sfc import zorder
    from geotrellis_ray.sources.raster_ingest import read_geotiffs, write_geotiffs

    layout = LayoutDefinition(Extent(0.0, 0.0, 4.0, 4.0), TileLayout(4, 4, 8, 8))
    rng = np.random.default_rng(5)
    rows = []
    vals = {}
    for c in range(4):
        for r in range(4):
            a = rng.uniform(0, 9, (8, 8))
            a[rng.random((8, 8)) < 0.1] = np.nan
            vals[(c, r)] = a
            cells, cc, rr, ct = encode_tile(a)
            rows.append({"key_col": c, "key_row": r, "sfc": int(zorder(c, r)),
                         "cells": cells, "cols": cc, "rows": rr, "cell_type": ct})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = str(tmp_path / "tifs")
    n = write_geotiffs(ds, out, layout)
    assert n == 16
    back = read_geotiffs(out).to_pandas()
    assert len(back) == 16
    for _i, row in back.iterrows():
        ext = Extent(row["xmin"], row["ymin"], row["xmax"], row["ymax"])
        kc, kr = layout.extent_to_bounds(ext)[:2]
        a = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
        np.testing.assert_allclose(a, vals[(kc, kr)], equal_nan=True)


def test_reader_big_endian_mm():
    """Hand-assembled BIG-endian (MM) TIFF: 3x2 uint16 image, one strip —
    the endian-swap path the writer never produces."""
    rows, cols = 2, 3
    vals = [100, 200, 300, 400, 500, 600]
    pix = b"".join(struct.pack(">H", v) for v in vals)
    entries = []

    def entry(tag, ftype, count, value_bytes):
        entries.append((tag, struct.pack(">HHI", tag, ftype, count) + value_bytes))

    def short(v):
        return struct.pack(">H", v) + b"\x00\x00"

    def long_(v):
        return struct.pack(">I", v)

    n_entries = 11
    ifd_size = 2 + 12 * n_entries + 4
    scale_off = 8 + ifd_size
    tie_off = scale_off + 3 * 8
    pix_off = tie_off + 6 * 8
    entry(256, 3, 1, short(cols))
    entry(257, 3, 1, short(rows))
    entry(258, 3, 1, short(16))
    entry(259, 3, 1, short(1))
    entry(262, 3, 1, short(1))
    entry(273, 4, 1, long_(pix_off))
    entry(277, 3, 1, short(1))
    entry(278, 3, 1, short(rows))
    entry(279, 4, 1, long_(len(pix)))
    entry(33550, 12, 3, long_(scale_off))
    entry(33922, 12, 6, long_(tie_off))
    entries.sort(key=lambda e: e[0])
    buf = b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8)
    buf += struct.pack(">H", n_entries) + b"".join(e[1] for e in entries) + struct.pack(">I", 0)
    buf += struct.pack(">3d", 1.0, 2.0, 0.0)
    buf += struct.pack(">6d", 0.0, 0.0, 0.0, -10.0, 20.0, 0.0)
    buf += pix
    ext, arr, meta = decode_geotiff(buf)
    assert ext == Extent(-10.0, 20.0 - 2 * 2.0, -10.0 + 3 * 1.0, 20.0)
    np.testing.assert_array_equal(arr, np.array(vals, dtype=np.float64).reshape(2, 3))


def test_deflate_strip_with_predictor_external_layout():
    """Deflate + predictor-2 strips assembled manually (not via the writer):
    validates the decode pipeline order (inflate -> un-predict)."""
    rows, cols = 4, 5
    data = np.arange(rows * cols, dtype="<i2").reshape(rows, cols) * 3
    pred = data.copy()
    pred[:, 1:] = data[:, 1:] - data[:, :-1]
    comp = zlib.compress(pred.tobytes())
    entries = []

    def entry(tag, ftype, count, value_bytes):
        entries.append((tag, struct.pack("<HHI", tag, ftype, count) + value_bytes))

    def short(v):
        return struct.pack("<H", v) + b"\x00\x00"

    def long_(v):
        return struct.pack("<I", v)

    n_entries = 14
    ifd_size = 2 + 12 * n_entries + 4
    scale_off = 8 + ifd_size
    tie_off = scale_off + 3 * 8
    pix_off = tie_off + 6 * 8
    entry(256, 3, 1, short(cols))
    entry(257, 3, 1, short(rows))
    entry(258, 3, 1, short(16))
    entry(259, 3, 1, short(8))       # deflate
    entry(262, 3, 1, short(1))
    entry(273, 4, 1, long_(pix_off))
    entry(277, 3, 1, short(1))
    entry(278, 3, 1, short(rows))
    entry(279, 4, 1, long_(len(comp)))
    entry(284, 3, 1, short(1))
    entry(317, 3, 1, short(2))       # horizontal predictor
    entry(339, 3, 1, short(2))       # signed int
    entry(33550, 12, 3, long_(scale_off))
    entry(33922, 12, 6, long_(tie_off))
    entries.sort(key=lambda e: e[0])
    buf = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
    buf += struct.pack("<H", n_entries) + b"".join(e[1] for e in entries) + struct.pack("<I", 0)
    buf += struct.pack("<3d", 0.5, 0.5, 0.0)
    buf += struct.pack("<6d", 0.0, 0.0, 0.0, 0.0, 2.0, 0.0)
    buf += comp
    _ext, arr, _meta = decode_geotiff(buf)
    np.testing.assert_array_equal(arr, data.astype(np.float64))


# --- round 3: LZW + multiband ------------------------------------------------

def test_lzw_codec_property():
    """LZW encode/decode round-trip: random, repetitive (table growth through
    9->10->11->12-bit widths), and reset-forcing streams."""
    from geotrellis_ray.core.geotiff import lzw_decode, lzw_encode

    rng = np.random.default_rng(5)
    cases = [
        b"",
        b"\x00",
        b"TOBEORNOTTOBEORTOBEORNOT",  # classic LZW exercise
        # incompressible and long enough that next_code passes 4096 and the
        # encoder emits a mid-stream Clear (the 12-bit reset path)
        bytes(rng.integers(0, 256, size=16384, dtype=np.uint8)),
        bytes(rng.integers(0, 4, size=100_000, dtype=np.uint8)),  # huge table -> reset
        b"ab" * 30_000,
        bytes(range(256)) * 64,
    ]
    for data in cases:
        assert lzw_decode(lzw_encode(data)) == data


@pytest.mark.parametrize("compression", ["none", "deflate", "lzw"])
@pytest.mark.parametrize("tile_size", [None, 16])
def test_roundtrip_multiband(compression, tile_size):
    rng = np.random.default_rng(11)
    arr = rng.uniform(-50, 50, size=(3, 21, 17))  # odd sizes: short edge segs
    ext = Extent(0, 0, 17, 21)
    buf = encode_geotiff(ext, arr, compression=compression, tile_size=tile_size)
    ext2, out, meta = decode_geotiff(buf)
    assert meta["bands"] == 3 and out.shape == (3, 21, 17)
    np.testing.assert_array_equal(out, arr)
    assert ext2.xmin == ext.xmin and ext2.ymax == ext.ymax


def test_roundtrip_multiband_int_predictor_nodata():
    arr = np.arange(2 * 8 * 8, dtype=np.float64).reshape(2, 8, 8)
    arr[0, 0, 0] = np.nan
    ext = Extent(0, 0, 8, 8)
    buf = encode_geotiff(ext, arr, compression="lzw", tile_size=None,
                         dtype="int32", nodata=-9999, predictor=2)
    _, out, meta = decode_geotiff(buf)
    assert meta["bands"] == 2 and meta["nodata"] == -9999
    assert np.isnan(out[0, 0, 0])
    np.testing.assert_array_equal(out[~np.isnan(out)], arr[~np.isnan(arr)])


def test_reader_planar_configuration_2():
    """Hand-assembled 2-band PLANAR (PlanarConfiguration=2) stripped TIFF:
    band planes stored as consecutive strip runs."""
    rows = cols = 4
    b0 = np.arange(16, dtype=np.uint8).reshape(4, 4)
    b1 = (np.arange(16, dtype=np.uint8) * 3).reshape(4, 4)

    def entry(tag, ftype, count, value_bytes):
        return struct.pack("<HHI", tag, ftype, count) + value_bytes

    # strips: 2 rows per strip -> 2 strips per band, 4 strips total (band-major)
    strips = [b0[:2].tobytes(), b0[2:].tobytes(), b1[:2].tobytes(), b1[2:].tobytes()]
    n_entries = 13
    ifd_off = 8
    ifd_size = 2 + 12 * n_entries + 4
    # out-of-line data: bits(2H=4B fits inline), offsets (4I), counts (4I),
    # pixel scale (3d), tiepoint (6d), sample format 2H fits inline
    data_off = ifd_off + ifd_size
    off_offsets = data_off
    off_counts = off_offsets + 16
    off_scale = off_counts + 16
    off_tp = off_scale + 24
    strip_base = off_tp + 48
    offs = []
    o = strip_base
    for s in strips:
        offs.append(o)
        o += len(s)
    entries = b"".join([
        entry(256, 3, 1, struct.pack("<HH", cols, 0)),
        entry(257, 3, 1, struct.pack("<HH", rows, 0)),
        entry(258, 3, 2, struct.pack("<HH", 8, 8)),
        entry(259, 3, 1, struct.pack("<HH", 1, 0)),
        entry(262, 3, 1, struct.pack("<HH", 1, 0)),
        entry(273, 4, 4, struct.pack("<I", off_offsets)),
        entry(277, 3, 1, struct.pack("<HH", 2, 0)),
        entry(278, 3, 1, struct.pack("<HH", 2, 0)),
        entry(279, 4, 4, struct.pack("<I", off_counts)),
        entry(284, 3, 1, struct.pack("<HH", 2, 0)),      # planar
        entry(339, 3, 2, struct.pack("<HH", 1, 1)),
        entry(33550, 12, 3, struct.pack("<I", off_scale)),
        entry(33922, 12, 6, struct.pack("<I", off_tp)),
    ])
    buf = (b"II" + struct.pack("<H", 42) + struct.pack("<I", ifd_off)
           + struct.pack("<H", n_entries) + entries + struct.pack("<I", 0)
           + struct.pack("<4I", *offs)
           + struct.pack("<4I", *[len(s) for s in strips])
           + struct.pack("<3d", 1.0, 1.0, 0.0)
           + struct.pack("<6d", 0.0, 0.0, 0.0, 10.0, 20.0, 0.0)
           + b"".join(strips))
    ext, out, meta = decode_geotiff(buf)
    assert meta["bands"] == 2
    np.testing.assert_array_equal(out[0], b0.astype(np.float64))
    np.testing.assert_array_equal(out[1], b1.astype(np.float64))
    assert (ext.xmin, ext.ymax) == (10.0, 20.0)


# --- BigTIFF (round 3): magic 43, 8-byte offsets, 20-byte IFD entries -------

@pytest.mark.parametrize("compression", ["none", "deflate", "lzw"])
def test_bigtiff_roundtrip(compression):
    a = _grid(rows=21, cols=13, nodata_frac=0.1)
    buf = encode_geotiff(EXT, a, compression=compression, tile_size=8,
                         bigtiff=True)
    assert struct.unpack_from("<H", buf, 2)[0] == 43
    assert struct.unpack_from("<HH", buf, 4) == (8, 0)
    ext, out, meta = decode_geotiff(buf)
    assert ext == EXT
    np.testing.assert_array_equal(out, a)
    # same payload forced classic decodes identically
    _, outc, _ = decode_geotiff(encode_geotiff(EXT, a, compression=compression,
                                               tile_size=8, bigtiff=False))
    np.testing.assert_array_equal(outc, out)


def test_bigtiff_roundtrip_multiband_predictor():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 4000, (3, 19, 23)).astype(np.uint16)
    buf = encode_geotiff(EXT, a, compression="lzw", predictor=2,
                         tile_size=16, bigtiff=True)
    _, out, meta = decode_geotiff(buf)
    assert meta["bands"] == 3
    np.testing.assert_array_equal(out.astype(np.uint16), a)


def test_bigtiff_auto_stays_classic_when_small():
    buf = encode_geotiff(EXT, _grid(rows=6, cols=6, nodata_frac=0))
    assert struct.unpack_from("<H", buf, 2)[0] == 42


def test_reader_on_hand_assembled_bigtiff():
    """A BigTIFF assembled BYTE BY BYTE (not via the writer): uncompressed
    stripped uint8 3x4 image, one strip, LONG8 (type 16) offsets/counts and
    8-byte inline values per the BigTIFF spec."""
    rows, cols = 3, 4
    pix = bytes(range(12))

    def entry(tag, ftype, count, value8):
        return struct.pack("<HHQ", tag, ftype, count) + value8

    def short8(v):
        return struct.pack("<H", v) + b"\x00" * 6

    def long8(v):
        return struct.pack("<Q", v)

    n_entries = 11
    header = 16
    ifd_size = 8 + 20 * n_entries + 8
    scale_off = header + ifd_size
    tie_off = scale_off + 3 * 8
    pix_off = tie_off + 6 * 8
    entries = b"".join([
        entry(256, 3, 1, short8(cols)),
        entry(257, 3, 1, short8(rows)),
        entry(258, 3, 1, short8(8)),
        entry(259, 3, 1, short8(1)),
        entry(262, 3, 1, short8(1)),
        entry(273, 16, 1, long8(pix_off)),     # StripOffsets as LONG8, inline
        entry(277, 3, 1, short8(1)),
        entry(278, 3, 1, short8(rows)),
        entry(279, 16, 1, long8(len(pix))),    # StripByteCounts as LONG8
        entry(33550, 12, 3, long8(scale_off)),
        entry(33922, 12, 6, long8(tie_off)),
    ])
    buf = (b"II" + struct.pack("<HHH", 43, 8, 0) + struct.pack("<Q", 16)
           + struct.pack("<Q", n_entries) + entries + struct.pack("<Q", 0)
           + struct.pack("<3d", 0.5, 0.25, 0.0)
           + struct.pack("<6d", 0.0, 0.0, 0.0, 100.0, 50.0, 0.0)
           + pix)
    ext, arr, meta = decode_geotiff(buf)
    assert ext == Extent(100.0, 50.0 - 3 * 0.25, 100.0 + 4 * 0.5, 50.0)
    np.testing.assert_array_equal(arr, np.arange(12, dtype=np.float64).reshape(3, 4))


def test_reader_on_hand_assembled_bigtiff_big_endian():
    """Big-endian (MM) BigTIFF, 2x2 uint16, one strip, inline pixel data
    pushed out-of-line to also exercise the 8-byte pointer path."""
    rows, cols = 2, 2
    pix = struct.pack(">4H", 10, 20, 30, 40)

    def entry(tag, ftype, count, value8):
        return struct.pack(">HHQ", tag, ftype, count) + value8

    def short8(v):
        return struct.pack(">H", v) + b"\x00" * 6

    def long8(v):
        return struct.pack(">Q", v)

    n_entries = 10
    header = 16
    ifd_size = 8 + 20 * n_entries + 8
    scale_off = header + ifd_size
    tie_off = scale_off + 3 * 8
    pix_off = tie_off + 6 * 8
    entries = b"".join([
        entry(256, 3, 1, short8(cols)),
        entry(257, 3, 1, short8(rows)),
        entry(258, 3, 1, short8(16)),
        entry(259, 3, 1, short8(1)),
        entry(273, 16, 1, long8(pix_off)),
        entry(277, 3, 1, short8(1)),
        entry(278, 3, 1, short8(rows)),
        entry(279, 16, 1, long8(len(pix))),
        entry(33550, 12, 3, long8(scale_off)),
        entry(33922, 12, 6, long8(tie_off)),
    ])
    buf = (b"MM" + struct.pack(">HHH", 43, 8, 0) + struct.pack(">Q", 16)
           + struct.pack(">Q", n_entries) + entries + struct.pack(">Q", 0)
           + struct.pack(">3d", 1.0, 1.0, 0.0)
           + struct.pack(">6d", 0.0, 0.0, 0.0, 0.0, 2.0, 0.0)
           + pix)
    ext, arr, meta = decode_geotiff(buf)
    np.testing.assert_array_equal(arr, [[10.0, 20.0], [30.0, 40.0]])
    assert ext == Extent(0.0, 0.0, 2.0, 2.0)


# --- ModelTransformation / rotated rasters (round 3) ------------------------

def _transform_tiff(pix: bytes, rows: int, cols: int, matrix16) -> bytes:
    """Minimal uncompressed stripped uint8 TIFF georeferenced by a full
    ModelTransformation (tag 34264), assembled byte by byte."""
    n_entries = 10
    header = 8
    ifd_size = 2 + 12 * n_entries + 4
    mat_off = header + ifd_size
    pix_off = mat_off + 16 * 8

    def entry(tag, ftype, count, value4):
        return struct.pack("<HHI", tag, ftype, count) + value4

    def short(v):
        return struct.pack("<H", v) + b"\x00\x00"

    entries = b"".join([
        entry(256, 3, 1, short(cols)),
        entry(257, 3, 1, short(rows)),
        entry(258, 3, 1, short(8)),
        entry(259, 3, 1, short(1)),
        entry(262, 3, 1, short(1)),
        entry(273, 4, 1, struct.pack("<I", pix_off)),
        entry(277, 3, 1, short(1)),
        entry(278, 3, 1, short(rows)),
        entry(279, 4, 1, struct.pack("<I", len(pix))),
        entry(34264, 12, 16, struct.pack("<I", mat_off)),
    ])
    return (b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
            + struct.pack("<H", n_entries) + entries + struct.pack("<I", 0)
            + struct.pack("<16d", *matrix16)
            + pix)


def test_model_transformation_axis_aligned():
    rows, cols = 3, 4
    pix = bytes(range(12))
    mat = [0.5, 0.0, 0.0, 100.0,
           0.0, -0.25, 0.0, 50.0,
           0.0, 0.0, 0.0, 0.0,
           0.0, 0.0, 0.0, 1.0]
    ext, arr, meta = decode_geotiff(_transform_tiff(pix, rows, cols, mat))
    assert not meta["rectified"]
    assert ext == Extent(100.0, 50.0 - 3 * 0.25, 100.0 + 4 * 0.5, 50.0)
    np.testing.assert_array_equal(arr, np.arange(12, dtype=np.float64).reshape(3, 4))


def test_model_transformation_rot90():
    """A 90-degree rotation maps the pixel grid exactly onto an axis-aligned
    grid: x = -j, y = i (unit pixels, origin chosen so the footprint starts
    at (0,0)). Every output cell is an exact source cell, no NaN."""
    rows, cols = 3, 5
    src = np.arange(15, dtype=np.uint8).reshape(rows, cols)
    # col i increases +y, row j increases -x; shift x by +rows so xmin = 0
    mat = [0.0, -1.0, 0.0, float(rows),
           1.0, 0.0, 0.0, 0.0,
           0.0, 0.0, 0.0, 0.0,
           0.0, 0.0, 0.0, 1.0]
    ext, arr, meta = decode_geotiff(_transform_tiff(src.tobytes(), rows, cols, mat))
    assert meta["rectified"]
    assert (ext.xmin, ext.ymin, ext.xmax, ext.ymax) == (0.0, 0.0, rows, cols)
    assert arr.shape == (cols, rows)
    assert not np.isnan(arr).any()
    # source pixel (i=col, j=row) lands at world x in [rows-1-j, rows-j],
    # y in [i, i+1] -> output row (top-down) cols-1-i, output col rows-1-j
    exp = np.full((cols, rows), np.nan)
    for j in range(rows):
        for i in range(cols):
            exp[cols - 1 - i, rows - 1 - j] = src[j, i]
    np.testing.assert_array_equal(arr, exp)


def test_model_transformation_arbitrary_angle_brute_oracle():
    """30-degree rotation: compare against an independent per-cell loop doing
    the same inverse-affine nearest-neighbor sampling."""
    import math
    rows, cols = 7, 9
    rng = np.random.default_rng(3)
    src = rng.integers(1, 250, (rows, cols)).astype(np.uint8)
    th = math.radians(30.0)
    a, b = math.cos(th), math.sin(th)
    # x = a*i + b*j + 10 ; y = b*i - a*j + 20  (rotated, row axis flipped)
    mat = [a, b, 0.0, 10.0,
           b, -a, 0.0, 20.0,
           0.0, 0.0, 0.0, 0.0,
           0.0, 0.0, 0.0, 1.0]
    ext, arr, meta = decode_geotiff(_transform_tiff(src.tobytes(), rows, cols, mat))
    assert meta["rectified"]
    # brute oracle
    corners_i = [0, cols, 0, cols]
    corners_j = [0, 0, rows, rows]
    wx = [a * i + b * j + 10.0 for i, j in zip(corners_i, corners_j)]
    wy = [b * i - a * j + 20.0 for i, j in zip(corners_i, corners_j)]
    xmin, xmax, ymin, ymax = min(wx), max(wx), min(wy), max(wy)
    det = a * (-a) - b * b  # = -1 for a rotation
    out_rows, out_cols = arr.shape
    sx = (xmax - xmin) / out_cols
    sy = (ymax - ymin) / out_rows
    exp = np.full((out_rows, out_cols), np.nan)
    for r in range(out_rows):
        for c in range(out_cols):
            x = xmin + (c + 0.5) * sx - 10.0
            y = ymax - (r + 0.5) * sy - 20.0
            si = ((-a) * x - b * y) / det
            sj = (a * y - b * x) / det
            ci, cj = int(np.floor(si)), int(np.floor(sj))
            if 0 <= ci < cols and 0 <= cj < rows:
                exp[r, c] = src[cj, ci]
    np.testing.assert_array_equal(arr, exp)
    assert np.isnan(arr).any()  # the rotated footprint leaves NaN corners
    assert (ext.xmin, ext.ymax) == (xmin, ymax)


def test_reader_planar_mixed_band_dtypes():
    """PlanarConfiguration=2 with BitsPerSample=[8,32] / SampleFormat=[1,3]:
    band 0 uint8, band 1 float32 — each band decodes with its own dtype
    (mixed widths are only representable planar; chunky mixed is refused)."""
    rows, cols = 2, 2
    b0 = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    b1 = np.array([[0.5, -1.5], [2.25, 8.0]], dtype="<f4")
    strips = [b0.tobytes(), b1.tobytes()]

    def entry(tag, ftype, count, value4):
        return struct.pack("<HHI", tag, ftype, count) + value4

    def short(v):
        return struct.pack("<H", v) + b"\x00\x00"

    n_entries = 12
    header = 8
    ifd_size = 2 + 12 * n_entries + 4
    off_offsets = header + ifd_size
    off_counts = off_offsets + 2 * 4
    off_scale = off_counts + 2 * 4
    off_tp = off_scale + 3 * 8
    data0 = off_tp + 6 * 8
    offs = [data0, data0 + len(strips[0])]
    entries = b"".join([
        entry(256, 3, 1, short(cols)),
        entry(257, 3, 1, short(rows)),
        entry(258, 3, 2, struct.pack("<HH", 8, 32)),
        entry(259, 3, 1, short(1)),
        entry(273, 4, 2, struct.pack("<I", off_offsets)),
        entry(277, 3, 1, short(2)),
        entry(278, 3, 1, short(rows)),
        entry(279, 4, 2, struct.pack("<I", off_counts)),
        entry(284, 3, 1, short(2)),
        entry(339, 3, 2, struct.pack("<HH", 1, 3)),
        entry(33550, 12, 3, struct.pack("<I", off_scale)),
        entry(33922, 12, 6, struct.pack("<I", off_tp)),
    ])
    buf = (b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
           + struct.pack("<H", n_entries) + entries + struct.pack("<I", 0)
           + struct.pack("<2I", *offs)
           + struct.pack("<2I", *[len(s) for s in strips])
           + struct.pack("<3d", 1.0, 1.0, 0.0)
           + struct.pack("<6d", 0.0, 0.0, 0.0, 5.0, 9.0, 0.0)
           + b"".join(strips))
    ext, out, meta = decode_geotiff(buf)
    assert meta["bands"] == 2 and meta["dtype"] == "mixed:uint8,float32"
    np.testing.assert_array_equal(out[0], b0.astype(np.float64))
    np.testing.assert_array_equal(out[1], b1.astype(np.float64))
    assert (ext.xmin, ext.ymax) == (5.0, 9.0)


def test_cog_multi_ifd_roundtrip():
    """encode_cog: headers-first multi-IFD chain; page 0 bit-exact, every
    overview exactly the NaN-aware 2x average of its parent, overview pages
    marked NewSubfileType=1, decode_geotiff (single-page) unchanged."""
    import numpy as np

    from geotrellis_ray.core.geotiff import (
        _downsample_2x_any,
        decode_geotiff,
        decode_geotiff_pages,
        encode_cog,
    )
    from geotrellis_ray.core.layout import Extent

    rng = np.random.default_rng(9)
    arr = rng.uniform(-50, 50, (120, 200))
    arr[10:14, 17:21] = np.nan
    ext = Extent(-10.0, 0.0, 42.0, 30.0)
    # deflate, not lzw: the from-spec LZW coder is pure Python and random
    # doubles are incompressible — fine for the small single-page codec
    # tests, pathological at COG-pyramid size
    buf = encode_cog(ext, arr, compression="deflate", tile_size=64, min_size=50)
    pages = decode_geotiff_pages(buf)
    assert [p[1].shape for p in pages] == [(120, 200), (60, 100), (30, 50)]
    assert pages[0][2].get("reduced_resolution") is None
    assert all(p[2]["reduced_resolution"] for p in pages[1:])
    assert all(p[0] == ext for p in pages)
    # page 0 == input, bit-exact incl. NaN mask
    e0, a0, m0 = decode_geotiff(buf)
    assert np.array_equal(a0, arr, equal_nan=True)
    # each overview is exactly the 2x average of its parent
    cur = arr
    for _e, a, _m in pages[1:]:
        cur = _downsample_2x_any(cur)
        assert np.array_equal(a, cur, equal_nan=True)


def test_cog_odd_dims_and_overview_cap():
    import numpy as np

    from geotrellis_ray.core.geotiff import decode_geotiff_pages, encode_cog
    from geotrellis_ray.core.layout import Extent

    arr = np.arange(21 * 17, dtype=np.float64).reshape(21, 17)
    buf = encode_cog(Extent(0.0, 0.0, 17.0, 21.0), arr, tile_size=16,
                     overviews=2, min_size=1)
    shapes = [p[1].shape for p in decode_geotiff_pages(buf)]
    assert shapes == [(21, 17), (11, 9), (6, 5)]  # ceil-halving, capped at 2


def test_cog_sink_roundtrip(ray_session, tmp_path):
    import glob

    import numpy as np
    import pyarrow as pa
    import ray.data

    from geotrellis_ray.core.geotiff import decode_geotiff_pages
    from geotrellis_ray.core.layout import Extent, LayoutDefinition, TileLayout
    from geotrellis_ray.core.raster import encode_tile
    from geotrellis_ray.core.sfc import zorder
    from geotrellis_ray.sources.raster_ingest import write_geotiffs

    layout = LayoutDefinition(Extent(0.0, 0.0, 64.0, 64.0), TileLayout(2, 2, 32, 32))
    rows = []
    for kr in range(2):
        for kc in range(2):
            a = np.full((32, 32), float(kc * 2 + kr), dtype=np.float64)
            cells, cols, trows, ct = encode_tile(a)
            rows.append({"key_col": kc, "key_row": kr, "sfc": int(zorder(kc, kr)),
                         "cells": cells, "cols": cols, "rows": trows,
                         "cell_type": ct})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    n = write_geotiffs(ds, str(tmp_path), layout, cog=True, cog_min_size=8)
    assert n == 4
    for f in glob.glob(str(tmp_path / "*.tif")):
        pages = decode_geotiff_pages(open(f, "rb").read())
        assert len(pages) == 3  # 32 -> 16 -> 8
        v = pages[0][1][0, 0]
        assert all(np.allclose(p[1], v) for p in pages)  # constant tiles stay constant
