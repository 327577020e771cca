"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in geotrellis_ray) calls ray.init()/ray.shutdown().

- entry(): flagship pipeline (extract -> geocode -> SpatialKey/SFC -> STRtree
  PIP join -> tile-assignment aggregate) on a deterministic pages corpus
  (FIXTURES.md §1) at smoke scale.
- queries(): one callable per implemented operator/pipeline (SURVEY.md §2).
- oracle_sql(): DuckDB-equivalent SQL for every SQL-expressible query, with
  matching column names and bit-identical value derivations (see
  geotrellis_ray/entry_queries.py docstring).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import ray
    import ray.data

    from geotrellis_ray.fixtures import gen_polygons_table, write_pages_parquet
    from geotrellis_ray.pipelines.flagship import flagship

    pages_dir = "/tmp/graft_pages_2000"
    write_pages_parquet(pages_dir, 2_000, shard_rows=1_000)
    ds = ray.data.read_parquet(pages_dir)
    joined, tiles = flagship(ds, ray.put(gen_polygons_table()), zoom=8, verify_text=True)
    return tiles


def queries() -> dict[str, Callable[[str], Any]]:
    from geotrellis_ray.entry_queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from geotrellis_ray.entry_queries import build_oracle_sql

    return build_oracle_sql()
