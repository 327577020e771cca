"""ColorMap + PNG rendering (demo path) and Stitch.

Own minimal implementations (stdlib zlib + struct only):
- ColorMap: value breaks -> RGBA via np.digitize
  (ref:raster/src/main/scala/geotrellis/raster/render/ColorMap.scala,
  L:unverified — /root/reference empty at survey time).
- PNG: 8-bit RGBA, one IDAT, no filtering (filter byte 0 per scanline)
  (ref:raster/.../render/png/PngEncoder.scala).
- Stitch: assemble a SMALL layer into one array — test/demo only, collects
  to the driver (ref:spark/.../stitch/StitchRDDMethods.scala).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class ColorMap:
    """breaks[i] maps values <= breaks[i] to colors[i]; above-last -> last.
    NoData (NaN) -> nodata_color (default transparent)."""

    def __init__(self, breaks, colors, nodata_color=(0, 0, 0, 0)):
        assert len(breaks) == len(colors)
        self.breaks = np.asarray(breaks, dtype=np.float64)
        self.colors = np.asarray(colors, dtype=np.uint8)
        self.nodata = np.asarray(nodata_color, dtype=np.uint8)

    def apply(self, a: np.ndarray) -> np.ndarray:
        idx = np.digitize(a, self.breaks, right=True)
        idx = np.clip(idx, 0, len(self.breaks) - 1)
        rgba = self.colors[idx]
        rgba[np.isnan(a)] = self.nodata
        return rgba


def _chunk(tag: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", zlib.crc32(tag + data))


def encode_png_rgba(rgba: np.ndarray) -> bytes:
    """(rows, cols, 4) uint8 -> PNG bytes."""
    rows, cols, _ = rgba.shape
    raw = b"".join(b"\x00" + rgba[i].tobytes() for i in range(rows))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", cols, rows, 8, 6, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def render_tile_png(tile: np.ndarray, color_map: ColorMap) -> bytes:
    return encode_png_rgba(color_map.apply(tile))


def stitch(tile_rows: list[dict]) -> tuple[np.ndarray, tuple[int, int]]:
    """Mosaic a list of tile-layer rows (key_col,key_row,cells,cols,rows,
    cell_type) into ONE array. Returns (array, (min_col, min_row)).
    Driver-side; only for small layers (tests/demos)."""
    from .raster import decode_tile

    if not tile_rows:
        return np.empty((0, 0)), (0, 0)
    cs = [r["key_col"] for r in tile_rows]
    rs = [r["key_row"] for r in tile_rows]
    c0, r0 = min(cs), min(rs)
    tc = tile_rows[0]["cols"]
    tr = tile_rows[0]["rows"]
    out = np.full(((max(rs) - r0 + 1) * tr, (max(cs) - c0 + 1) * tc), np.nan)
    for row in tile_rows:
        a = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
        rr = (row["key_row"] - r0) * tr
        cc = (row["key_col"] - c0) * tc
        out[rr:rr + tr, cc:cc + tc] = a
    return out, (c0, r0)
