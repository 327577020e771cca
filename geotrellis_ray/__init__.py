"""geotrellis_ray — a Ray-Data-native spatial-join + tiling engine.

Public API (a user of the reference engine maps onto these directly):

Core math (no Ray): layouts/SFC/cells/geometry under ``geotrellis_ray.core``.
Operators (Dataset -> Dataset): under ``geotrellis_ray.stages``.
Layer store: ``geotrellis_ray.sources.layer``.
Pipelines/CLI: ``geotrellis_ray.pipelines`` and ``python -m geotrellis_ray.run``.

Nothing in this package calls ray.init()/ray.shutdown() — the session is
owned by the caller (driver contract).
"""

from .core.layout import (  # noqa: F401
    Extent,
    FloatingLayoutScheme,
    KeyBounds,
    LayoutDefinition,
    TileLayout,
    TileLayerMetadata,
    ZoomedLayoutScheme,
)

__all__ = [
    "Extent",
    "FloatingLayoutScheme",
    "KeyBounds",
    "LayoutDefinition",
    "TileLayout",
    "TileLayerMetadata",
    "ZoomedLayoutScheme",
]

__version__ = "0.1.0"
