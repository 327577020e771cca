"""Tiles as numpy arrays + the raster operator set: local map algebra with
NoData, crop/merge/mask/split, nearest/average resample, and the cell-center
rasterizer.

Re-expresses (from scratch, vectorized — SURVEY.md §2.2/§2.5):
- Tile/ArrayTile/CellType   ref:raster/src/main/scala/geotrellis/raster/Tile.scala, CellType.scala (L:unverified)
- mapalgebra.local.*        ref:raster/.../mapalgebra/local/*.scala (L:unverified)
- crop/merge/split/mask     ref:raster/.../crop/, merge/, split/, mask/ (L:unverified)
- resample                  ref:raster/.../resample/*.scala (L:unverified)
- Rasterizer / PolygonRasterizer  ref:raster/.../rasterize/Rasterizer.scala, polygon/PolygonRasterizer.scala (L:unverified)
(/root/reference empty at survey time — SURVEY.md §0.)

Conventions (pinned by tests — OUR RasterizeSpec semantics):
- A tile is a 2-D numpy array shaped (rows, cols); row 0 = north.
- NoData: float tiles use NaN; int tiles use a sentinel (default int32 min),
  mirroring GeoTrellis's constant-NoData cell types.
- Rasterize inclusion rule: a cell is painted iff its CENTER is inside the
  geometry (even-odd PIP, half-open edge rule from core.geom) — for lines,
  iff the line passes within the cell (Bresenham-style DDA traversal).
- Overlap priority (RasterizeRDD z-index): higher zindex wins; tie -> larger
  value wins (documented OUR spec, FIXTURES.md §4).

Arrow encoding of a tile row (layer schema): cells serialized as a binary
column (``np.ndarray.tobytes()``, C order) + ``cols, rows, cell_type``
columns; ``np.frombuffer`` gives a zero-copy view on decode (the Arrow-native
stand-in for Avro TileCodecs — ref:store/.../avro/codecs/TileCodecs.scala).
"""

from __future__ import annotations

import numpy as np

from .geom import point_in_polygon_geom
from .layout import Extent

INT_NODATA = np.int32(np.iinfo(np.int32).min)

_CELL_DTYPES = {
    "int8": np.int8, "uint8": np.uint8, "int16": np.int16, "uint16": np.uint16,
    "int32": np.int32, "int64": np.int64, "float32": np.float32, "float64": np.float64,
}


def nodata_value(dtype) -> float | int:
    return np.nan if np.issubdtype(np.dtype(dtype), np.floating) else INT_NODATA


def is_nodata(a: np.ndarray) -> np.ndarray:
    if np.issubdtype(a.dtype, np.floating):
        return np.isnan(a)
    return a == INT_NODATA


# --- codec (cells <-> binary column) ---------------------------------------

def encode_tile(a: np.ndarray) -> tuple[bytes, int, int, str]:
    return a.tobytes(), a.shape[1], a.shape[0], str(a.dtype)


def decode_tile(cells: bytes, cols: int, rows: int, cell_type: str) -> np.ndarray:
    return np.frombuffer(cells, dtype=_CELL_DTYPES[cell_type]).reshape(rows, cols)


# --- local map algebra ------------------------------------------------------

def _nodata_mask(*tiles):
    m = is_nodata(tiles[0])
    for t in tiles[1:]:
        m = m | is_nodata(t)
    return m


def local_binary(a: np.ndarray, b, op) -> np.ndarray:
    """Binary cell-wise op with NoData propagation; b is a tile or scalar."""
    bs = b if np.isscalar(b) else b
    mask = is_nodata(a) if np.isscalar(b) else _nodata_mask(a, b)
    with np.errstate(all="ignore"):
        out = op(a.astype(np.float64), bs if np.isscalar(bs) else bs.astype(np.float64))
    out = np.where(mask, np.nan, out)
    return out


def local_unary(a: np.ndarray, op) -> np.ndarray:
    mask = is_nodata(a)
    with np.errstate(all="ignore"):
        out = op(a.astype(np.float64))
    return np.where(mask, np.nan, out)


LOCAL_BINARY_OPS = {
    "add": np.add, "subtract": np.subtract, "multiply": np.multiply,
    "divide": np.divide, "pow": np.power, "min": np.minimum, "max": np.maximum,
    "equal": np.equal, "unequal": np.not_equal, "greater": np.greater,
    "greater_or_equal": np.greater_equal, "less": np.less, "less_or_equal": np.less_equal,
    "and": lambda a, b: np.logical_and(a != 0, b != 0).astype(np.float64),
    "or": lambda a, b: np.logical_or(a != 0, b != 0).astype(np.float64),
    "xor": lambda a, b: np.logical_xor(a != 0, b != 0).astype(np.float64),
}

LOCAL_UNARY_OPS = {
    "sqrt": np.sqrt, "abs": np.abs, "ceil": np.ceil, "floor": np.floor,
    "round": np.round, "log": np.log, "log10": np.log10, "negate": np.negative,
    "not": lambda a: np.logical_not(a != 0).astype(np.float64),
}


def local_defined(a: np.ndarray) -> np.ndarray:
    return (~is_nodata(a)).astype(np.uint8)


def local_undefined(a: np.ndarray) -> np.ndarray:
    return is_nodata(a).astype(np.uint8)


def local_if(cond: np.ndarray, then_v, else_v) -> np.ndarray:
    return np.where(cond != 0, then_v, else_v)


# --- crop / merge / split / mask -------------------------------------------

def crop(a: np.ndarray, col0: int, row0: int, col1: int, row1: int) -> np.ndarray:
    """Inclusive cell-bounds crop."""
    return a[row0 : row1 + 1, col0 : col1 + 1]


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Left-wins-non-NoData merge (GeoTrellis Tile.merge semantics)."""
    return np.where(is_nodata(a), b, a)


def split(a: np.ndarray, tile_cols: int, tile_rows: int) -> list[tuple[int, int, np.ndarray]]:
    """Split into (tile_col, tile_row, subarray) chunks."""
    rows, cols = a.shape
    out = []
    for tr in range(0, rows, tile_rows):
        for tc in range(0, cols, tile_cols):
            out.append((tc // tile_cols, tr // tile_rows, a[tr : tr + tile_rows, tc : tc + tile_cols]))
    return out


def mask_geom(a: np.ndarray, extent: Extent, geom: dict, invert: bool = False) -> np.ndarray:
    """Mask (or InverseMask) a tile by a geometry: cells whose center falls
    outside (inside, if invert) become NoData."""
    rows, cols = a.shape
    inside = rasterize_mask(geom, extent, cols, rows)
    keep = ~inside if invert else inside
    nd = nodata_value(a.dtype) if np.issubdtype(a.dtype, np.floating) else INT_NODATA
    return np.where(keep, a, nd)


# --- resample ---------------------------------------------------------------

def resample_nearest(a: np.ndarray, out_cols: int, out_rows: int) -> np.ndarray:
    rows, cols = a.shape
    ri = np.minimum(((np.arange(out_rows) + 0.5) * rows / out_rows).astype(np.int64), rows - 1)
    ci = np.minimum(((np.arange(out_cols) + 0.5) * cols / out_cols).astype(np.int64), cols - 1)
    return a[np.ix_(ri, ci)]


def downsample_average_2x(a: np.ndarray) -> np.ndarray:
    """2x decimating average (NoData-aware) — the pyramid kernel."""
    rows, cols = a.shape
    f = a.astype(np.float64)
    nd = is_nodata(a)
    f = np.where(nd, 0.0, f)
    w = (~nd).astype(np.float64)
    s = f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2] + f[1::2, 1::2]
    n = w[0::2, 0::2] + w[0::2, 1::2] + w[1::2, 0::2] + w[1::2, 1::2]
    with np.errstate(invalid="ignore"):
        out = s / n
    return np.where(n == 0, np.nan, out)


# --- rasterize --------------------------------------------------------------

def cell_centers(extent: Extent, cols: int, rows: int) -> tuple[np.ndarray, np.ndarray]:
    cw = extent.width / cols
    ch = extent.height / rows
    cx = extent.xmin + (np.arange(cols) + 0.5) * cw
    cy = extent.ymax - (np.arange(rows) + 0.5) * ch
    gx, gy = np.meshgrid(cx, cy)
    return gx, gy


def rasterize_mask(geom: dict, extent: Extent, cols: int, rows: int) -> np.ndarray:
    """Boolean (rows, cols) grid: cell center inside geometry. Points/lines
    use grid traversal; polygons use vectorized PIP over centers."""
    t = geom["type"]
    if t in ("Polygon", "MultiPolygon"):
        gx, gy = cell_centers(extent, cols, rows)
        return point_in_polygon_geom(gx.ravel(), gy.ravel(), geom).reshape(rows, cols)
    out = np.zeros((rows, cols), dtype=bool)
    cw = extent.width / cols
    ch = extent.height / rows
    if t == "Point":
        x, y = geom["coords"][:2]
        c = int(np.floor((x - extent.xmin) / cw))
        r = int(np.floor((extent.ymax - y) / ch))
        if 0 <= c < cols and 0 <= r < rows:
            out[r, c] = True
        return out
    if t == "LineString":
        pts = geom["coords"]
        for i in range(len(pts) - 1):
            _dda_line(out, pts[i], pts[i + 1], extent, cw, ch)
        return out
    if t.startswith("Multi"):
        for part in geom["parts"]:
            out |= rasterize_mask(part, extent, cols, rows)
        return out
    raise ValueError(t)


def _dda_line(out: np.ndarray, p0, p1, extent: Extent, cw: float, ch: float) -> None:
    """Conservative grid traversal of a segment (marks every cell the segment
    passes through), sampled at sub-cell resolution."""
    rows, cols = out.shape
    x0, y0 = p0
    x1, y1 = p1
    n = max(int(np.hypot((x1 - x0) / cw, (y1 - y0) / ch) * 4), 1) + 1
    ts = np.linspace(0.0, 1.0, n)
    xs = x0 + ts * (x1 - x0)
    ys = y0 + ts * (y1 - y0)
    cs = np.floor((xs - extent.xmin) / cw).astype(np.int64)
    rs = np.floor((extent.ymax - ys) / ch).astype(np.int64)
    ok = (cs >= 0) & (cs < cols) & (rs >= 0) & (rs < rows)
    out[rs[ok], cs[ok]] = True


def rasterize_value(
    geoms: list[tuple[dict, int, float]], extent: Extent, cols: int, rows: int,
    return_zbuf: bool = False,
):
    """Burn (geom, zindex, value) triples into one float64 grid. Priority:
    higher zindex wins; tie -> larger value wins (OUR spec). Unpainted = NaN.
    ``return_zbuf=True`` also returns the per-cell winning zindex plane
    (-inf where unpainted) so salted partial paints can merge associatively
    by per-cell (z, value) lexicographic max."""
    out = np.full((rows, cols), np.nan)
    z = np.full((rows, cols), -np.inf)
    for geom, zindex, value in geoms:
        m = rasterize_mask(geom, extent, cols, rows)
        better = m & ((zindex > z) | ((zindex == z) & (value > np.where(np.isnan(out), -np.inf, out))))
        out = np.where(better, value, out)
        z = np.where(better, zindex, z)
    if return_zbuf:
        return out, z
    return out


def zmerge(a: np.ndarray, za: np.ndarray, b: np.ndarray, zb: np.ndarray):
    """Associative merge of two z-buffered paints: per cell, the higher
    zindex wins; tie -> larger value (same rule as rasterize_value, so
    paint(all) == zmerge(paint(shard1), paint(shard2)) for any split)."""
    av = np.where(np.isnan(a), -np.inf, a)
    bv = np.where(np.isnan(b), -np.inf, b)
    take_b = (zb > za) | ((zb == za) & (bv > av))
    return np.where(take_b, b, a), np.where(take_b, zb, za)
