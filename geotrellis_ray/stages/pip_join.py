"""Point-in-polygon spatial join — THE central stateful actor-pool stage
(BASELINE.json north_star).

Broadcast-small-side design (SURVEY.md §2.4 VectorJoin): the polygon table is
``ray.put`` once on the driver; each actor builds a
:class:`~geotrellis_ray.state.polygon_index.PolygonIndex` (STRtree + decoded
rings) in ``__init__`` — ONCE per actor, never per batch — and probes each
Arrow batch vectorized. Use as::

    ref = ray.put(polygons_table)
    ds.map_batches(PipJoiner, fn_constructor_kwargs={"polygons": ref},
                   batch_format="pyarrow", batch_size=8192, concurrency=(2, 8))

Modes:
- ``mode="annotate"`` (default): per-page primary hit -> adds ``polygon_id``
  (-1 when no hit) + ``n_hits``; row count preserved (left-outer semantics).
- ``mode="inner"``: explode to one row per (page, polygon) hit pair.
- ``mode="semi"`` / ``"anti"``: keep only pages with >=1 / 0 hits.

Re-expresses ref:spark/src/main/scala/geotrellis/spark/join/VectorJoin.scala
(bbox prefilter then exact predicate; L:unverified — /root/reference empty at
survey time).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.broadcast import get
from ..state.polygon_index import PolygonIndex


class PipJoiner:
    def __init__(self, polygons, mode: str = "annotate", lat_col: str = "lat", lon_col: str = "lon"):
        table = get(polygons)
        self.index = PolygonIndex(table)
        self.mode = mode
        self.lat_col = lat_col
        self.lon_col = lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        xs = batch[self.lon_col].to_numpy(zero_copy_only=False)
        ys = batch[self.lat_col].to_numpy(zero_copy_only=False)
        if self.mode == "annotate":
            pid, nhits = self.index.best_hit(xs, ys)
            return batch.append_column("polygon_id", pa.array(pid, pa.int64())).append_column(
                "n_hits", pa.array(nhits, pa.int64())
            )
        pi, bi = self.index.probe(xs, ys)
        if self.mode == "inner":
            out = batch.take(pa.array(pi, pa.int64()))
            return out.append_column("polygon_id", pa.array(self.index.ids[bi], pa.int64()))
        hit = np.zeros(len(xs), dtype=bool)
        hit[pi] = True
        keep = hit if self.mode == "semi" else ~hit
        return batch.filter(pa.array(keep))
