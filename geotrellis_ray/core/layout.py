"""Tile layouts, layout schemes and the map<->key transform.

Re-expresses (Ray-Data-first, as plain frozen dataclasses captured into
map_batches closures — SURVEY.md §1.1) the GeoTrellis layer-model types:

- Extent                  ref:vector/src/main/scala/geotrellis/vector/Extent.scala (L:unverified)
- TileLayout              ref:raster/.../TileLayout.scala (L:unverified)
- LayoutDefinition        ref:layer/src/main/scala/geotrellis/layer/LayoutDefinition.scala (L:unverified)
- MapKeyTransform         ref:layer/src/main/scala/geotrellis/layer/MapKeyTransform.scala (L:unverified)
- ZoomedLayoutScheme      ref:layer/src/main/scala/geotrellis/layer/ZoomedLayoutScheme.scala (L:unverified)
- FloatingLayoutScheme    ref:layer/src/main/scala/geotrellis/layer/FloatingLayoutScheme.scala (L:unverified)
- KeyBounds / TileLayerMetadata  ref:layer/.../KeyBounds.scala, TileLayerMetadata.scala (L:unverified)

(/root/reference was empty at survey time — paths are the standard GeoTrellis
3.x module layout, see SURVEY.md §0.)

Conventions (pinned by tests):
- SpatialKey row 0 is the TOP (north) row, matching the GeoTrellis/TMS-XYZ
  convention: ``row = floor((ymax - y) / tileHeight)``.
- Points exactly on the east/south world edge clamp into the last key.
- All key math is vectorized numpy; this is THE hot path of tile assignment.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np

from .mercator import WORLD, latlng_to_webmercator


@dataclass(frozen=True)
class Extent:
    xmin: float
    ymin: float
    xmax: float
    ymax: float

    @property
    def width(self) -> float:
        return self.xmax - self.xmin

    @property
    def height(self) -> float:
        return self.ymax - self.ymin

    def intersects(self, other: "Extent") -> bool:
        return not (
            other.xmin > self.xmax
            or other.xmax < self.xmin
            or other.ymin > self.ymax
            or other.ymax < self.ymin
        )

    def to_tuple(self) -> tuple[float, float, float, float]:
        return (self.xmin, self.ymin, self.xmax, self.ymax)


WEBMERCATOR_WORLD = Extent(-WORLD, -WORLD, WORLD, WORLD)
LATLNG_WORLD = Extent(-180.0, -90.0, 180.0, 90.0)


@dataclass(frozen=True)
class TileLayout:
    layout_cols: int
    layout_rows: int
    tile_cols: int
    tile_rows: int


@dataclass(frozen=True)
class LayoutDefinition:
    """A world extent divided into layout_cols x layout_rows tiles of
    tile_cols x tile_rows cells. Cheap pure math — broadcast by closure
    capture, never an actor (SURVEY.md §2.3)."""

    extent: Extent
    tile_layout: TileLayout

    @property
    def tile_width(self) -> float:  # map units per tile
        return self.extent.width / self.tile_layout.layout_cols

    @property
    def tile_height(self) -> float:
        return self.extent.height / self.tile_layout.layout_rows

    @property
    def cell_width(self) -> float:  # map units per cell
        return self.tile_width / self.tile_layout.tile_cols

    @property
    def cell_height(self) -> float:
        return self.tile_height / self.tile_layout.tile_rows

    # ---- MapKeyTransform (vectorized) ----

    def xy_to_key(self, x, y) -> tuple[np.ndarray, np.ndarray]:
        """Map coords -> (key_col, key_row) int32 arrays, clamped to the grid.
        row 0 = north/top row."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        col = np.floor((x - self.extent.xmin) / self.tile_width)
        row = np.floor((self.extent.ymax - y) / self.tile_height)
        col = np.clip(col, 0, self.tile_layout.layout_cols - 1).astype(np.int32)
        row = np.clip(row, 0, self.tile_layout.layout_rows - 1).astype(np.int32)
        return col, row

    def key_to_extent(self, col, row) -> Extent:
        tw, th = self.tile_width, self.tile_height
        xmin = self.extent.xmin + col * tw
        ymax = self.extent.ymax - row * th
        return Extent(xmin, ymax - th, xmin + tw, ymax)

    def key_extents(self, cols, rows) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Vectorized key -> (xmin, ymin, xmax, ymax) arrays."""
        cols = np.asarray(cols, dtype=np.float64)
        rows = np.asarray(rows, dtype=np.float64)
        tw, th = self.tile_width, self.tile_height
        xmin = self.extent.xmin + cols * tw
        ymax = self.extent.ymax - rows * th
        return xmin, ymax - th, xmin + tw, ymax

    def extent_to_bounds(self, e: Extent) -> tuple[int, int, int, int]:
        """Extent -> inclusive key bounds (col_min, row_min, col_max, row_max).
        Touching-only-the-boundary neighbours are excluded on the max side by
        an epsilon nudge, matching GeoTrellis MapKeyTransform semantics."""
        eps = 1e-9
        c0, r0 = self.xy_to_key(e.xmin, e.ymax)  # NW corner
        c1, r1 = self.xy_to_key(
            max(e.xmax - eps * self.tile_width, e.xmin),
            min(e.ymin + eps * self.tile_height, e.ymax),
        )  # SE corner, nudged inward
        return int(c0), int(r0), int(c1), int(r1)


@dataclass(frozen=True)
class ZoomedLayoutScheme:
    """zoom z -> 2^z x 2^z grid of tile_size px tiles over the CRS world
    extent (power-of-2 pyramid). crs = 'webmercator' | 'latlng'."""

    crs: str = "webmercator"
    tile_size: int = 256

    def world_extent(self) -> Extent:
        return WEBMERCATOR_WORLD if self.crs == "webmercator" else LATLNG_WORLD

    def layout_for_zoom(self, zoom: int) -> LayoutDefinition:
        n = 1 << zoom
        return LayoutDefinition(self.world_extent(), TileLayout(n, n, self.tile_size, self.tile_size))


@dataclass(frozen=True)
class FloatingLayoutScheme:
    """Data-fit grid: tiles of tile_size cells at a given cell size, anchored
    at the data extent's NW corner."""

    tile_size: int = 256

    def layout_for(self, data_extent: Extent, cell_width: float, cell_height: float) -> LayoutDefinition:
        tw = cell_width * self.tile_size
        th = cell_height * self.tile_size
        cols = max(1, int(np.ceil(data_extent.width / tw)))
        rows = max(1, int(np.ceil(data_extent.height / th)))
        e = Extent(
            data_extent.xmin,
            data_extent.ymax - rows * th,
            data_extent.xmin + cols * tw,
            data_extent.ymax,
        )
        return LayoutDefinition(e, TileLayout(cols, rows, self.tile_size, self.tile_size))


def latlng_to_key(lat, lon, layout: LayoutDefinition, crs: str = "webmercator"):
    """lat/lon arrays -> (key_col, key_row) under the layout's CRS."""
    if crs == "webmercator":
        x, y = latlng_to_webmercator(lat, lon)
    else:
        x, y = np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    return layout.xy_to_key(x, y)


@dataclass(frozen=True)
class KeyBounds:
    col_min: int
    row_min: int
    col_max: int
    row_max: int

    def combine(self, other: "KeyBounds") -> "KeyBounds":
        return KeyBounds(
            min(self.col_min, other.col_min),
            min(self.row_min, other.row_min),
            max(self.col_max, other.col_max),
            max(self.row_max, other.row_max),
        )

    def intersect(self, other: "KeyBounds") -> "KeyBounds | None":
        kb = KeyBounds(
            max(self.col_min, other.col_min),
            max(self.row_min, other.row_min),
            min(self.col_max, other.col_max),
            min(self.row_max, other.row_max),
        )
        return kb if kb.col_min <= kb.col_max and kb.row_min <= kb.row_max else None


@dataclass(frozen=True)
class TileLayerMetadata:
    """Layer metadata sidecar (_metadata.json next to each written layer dir);
    recomputed with one ds.aggregate pass, never a driver collect."""

    cell_type: str
    layout: LayoutDefinition
    extent: Extent
    crs: str
    bounds: KeyBounds
    zoom: int | None = None
    extra: dict | None = None

    def to_json(self) -> str:
        tl = self.layout.tile_layout
        return json.dumps(
            {
                "cell_type": self.cell_type,
                "layout": {
                    "extent": self.layout.extent.to_tuple(),
                    "tile_layout": [tl.layout_cols, tl.layout_rows, tl.tile_cols, tl.tile_rows],
                },
                "extent": self.extent.to_tuple(),
                "crs": self.crs,
                "bounds": [self.bounds.col_min, self.bounds.row_min, self.bounds.col_max, self.bounds.row_max],
                "zoom": self.zoom,
                "extra": self.extra or {},
            },
            sort_keys=True,
        )

    @staticmethod
    def from_json(s: str) -> "TileLayerMetadata":
        d = json.loads(s)
        lo = d["layout"]
        layout = LayoutDefinition(Extent(*lo["extent"]), TileLayout(*lo["tile_layout"]))
        return TileLayerMetadata(
            cell_type=d["cell_type"],
            layout=layout,
            extent=Extent(*d["extent"]),
            crs=d["crs"],
            bounds=KeyBounds(*d["bounds"]),
            zoom=d.get("zoom"),
            extra=d.get("extra") or {},
        )
