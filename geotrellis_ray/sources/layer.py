"""Layer store: SFC-sorted partitioned Parquet + JSON metadata sidecar, with
KeyBounds/bbox queries pushed down to SFC index ranges (predicate pushdown /
partition pruning — only matching row groups leave storage).

Re-expresses (Parquet-native, SURVEY.md §2.1):
- FileLayerWriter (sort by KeyIndex, chunked write)  ref:spark/.../store/file/FileLayerWriter.scala (L:unverified)
- AttributeStore (layer metadata JSON)               ref:store/.../AttributeStore.scala (L:unverified)
- FileLayerReader + LayerQuery Intersects/Between/At ref:spark/.../store/file/FileLayerReader.scala, ref:store/.../LayerQuery.scala (L:unverified)
- ValueReader (single-key random access)             ref:store/.../ValueReader.scala (L:unverified)
(/root/reference empty at survey time — SURVEY.md §0.)

Layout: ``{catalog}/{name}/{zoom}/`` (LayerId convention) containing
``sfc_bucket=N/`` partition dirs of SFC-sorted part files + ``_metadata.json``.
``sfc_bucket = sfc >> bucket_shift`` — ONE partitioning key reused for write
layout, range pruning and resume bookkeeping.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from ..core.layout import KeyBounds, TileLayerMetadata
from ..core.sfc import hilbert_ranges, zorder_ranges

DEFAULT_BUCKET_SHIFT = 8  # 4^zoom cells -> 4^zoom / 256 buckets


def add_sfc_bucket(batch: pa.Table, shift: int = DEFAULT_BUCKET_SHIFT) -> pa.Table:
    b = batch["sfc"].to_numpy(zero_copy_only=False).astype(np.uint64) >> np.uint64(shift)
    return batch.append_column("sfc_bucket", pa.array(b.astype(np.int64), pa.int64()))


def layer_path(catalog: str, name: str, zoom: int) -> str:
    return os.path.join(catalog, name, str(zoom))


def write_layer(
    ds,
    catalog: str,
    name: str,
    zoom: int,
    metadata: TileLayerMetadata | None = None,
    bucket_shift: int = DEFAULT_BUCKET_SHIFT,
    sort: bool = True,
    sfc_kind: str = "zorder",
):
    """Write a keyed Dataset as a layer: sorted by sfc, partitioned by
    sfc_bucket (resumable layout: one dir per bucket), metadata sidecar.
    Returns the layer path."""
    path = layer_path(catalog, name, zoom)
    os.makedirs(path, exist_ok=True)
    out = ds.map_batches(
        lambda b: add_sfc_bucket(b, bucket_shift), batch_format="pyarrow", zero_copy_batch=True
    )
    if sort:
        out = out.sort("sfc")
    out.write_parquet(path, partition_cols=["sfc_bucket"])
    if metadata is None:
        metadata = metadata_from_ds(ds, zoom)
    meta = json.loads(metadata.to_json())
    meta["extra"] = dict(meta.get("extra") or {}, bucket_shift=bucket_shift, sfc_kind=sfc_kind)
    with open(os.path.join(path, "_metadata.json"), "w") as f:
        json.dump(meta, f, sort_keys=True)
    return path


def metadata_from_ds(ds, zoom: int, crs: str = "webmercator", cell_type: str = "float64") -> TileLayerMetadata:
    """KeyBounds & metadata via ONE aggregate pass (never a driver collect —
    the reference's TileLayerMetadata.fromRDD collect boundary, SURVEY.md §3.1)."""
    from ray.data.aggregate import Max, Min

    from ..core.layout import ZoomedLayoutScheme

    stats = ds.aggregate(
        Min("key_col", alias_name="cmin"),
        Max("key_col", alias_name="cmax"),
        Min("key_row", alias_name="rmin"),
        Max("key_row", alias_name="rmax"),
    )
    scheme = ZoomedLayoutScheme(crs)
    lo = scheme.layout_for_zoom(zoom)
    kb = KeyBounds(int(stats["cmin"]), int(stats["rmin"]), int(stats["cmax"]), int(stats["rmax"]))
    return TileLayerMetadata(cell_type=cell_type, layout=lo, extent=lo.extent, crs=crs, bounds=kb, zoom=zoom)


def read_layer_metadata(catalog: str, name: str, zoom: int) -> TileLayerMetadata:
    with open(os.path.join(layer_path(catalog, name, zoom), "_metadata.json")) as f:
        return TileLayerMetadata.from_json(f.read())


def sfc_filter_expr(ranges: list[tuple[int, int]]):
    """pyarrow dataset expression OR-ing inclusive sfc ranges."""
    import pyarrow.dataset as pads

    expr = None
    f = pads.field("sfc")
    for lo, hi in ranges:
        e = (f >= lo) & (f <= hi)
        expr = e if expr is None else (expr | e)
    return expr


def read_layer(
    catalog: str,
    name: str,
    zoom: int,
    intersects: KeyBounds | None = None,
    time_between: tuple[int, int] | None = None,
    columns: list[str] | None = None,
    max_ranges: int = 64,
):
    """Read a layer; an ``intersects`` KeyBounds query is decomposed into SFC
    index ranges and pushed down as a parquet row-group filter (LayerQuery
    semantics); ``time_between`` filters the time_bin column (Between)."""
    import ray.data

    path = layer_path(catalog, name, zoom)
    expr = None
    if intersects is not None:
        # the sidecar records which SFC keyed this layer (KeyIndex registry
        # equivalent); decompose the bbox on the matching curve
        kind = "zorder"
        try:
            meta = read_layer_metadata(catalog, name, zoom)
            kind = (meta.extra or {}).get("sfc_kind", "zorder")
        except FileNotFoundError:
            pass
        if kind == "hilbert":
            ranges = hilbert_ranges(
                intersects.col_min, intersects.row_min, intersects.col_max,
                intersects.row_max, zoom,
            )
        else:
            ranges = zorder_ranges(
                intersects.col_min, intersects.row_min, intersects.col_max,
                intersects.row_max, zoom, max_ranges=max_ranges,
            )
        expr = sfc_filter_expr(ranges)
    if time_between is not None:
        import pyarrow.dataset as pads

        te = (pads.field("time_bin") >= time_between[0]) & (pads.field("time_bin") <= time_between[1])
        expr = te if expr is None else (expr & te)
    kwargs = {}
    if expr is not None:
        kwargs["filter"] = expr
    if columns is not None:
        kwargs["columns"] = columns
    ds = ray.data.read_parquet(path, file_extensions=["parquet"], **kwargs)
    if intersects is not None:
        # exact re-filter by key (ranges may be coarsened supersets)
        cmin, rmin, cmax, rmax = (
            intersects.col_min, intersects.row_min, intersects.col_max, intersects.row_max,
        )

        def exact(b: pa.Table) -> pa.Table:
            c = b["key_col"].to_numpy(zero_copy_only=False)
            r = b["key_row"].to_numpy(zero_copy_only=False)
            keep = (c >= cmin) & (c <= cmax) & (r >= rmin) & (r <= rmax)
            return b.filter(pa.array(keep))

        ds = ds.map_batches(exact, batch_format="pyarrow", zero_copy_batch=True)
    return ds


def value_read(catalog: str, name: str, zoom: int, key_col: int, key_row: int) -> pa.Table:
    """ValueReader: random access to one key's rows via parquet filter —
    a driver-side point lookup, not a dataflow op."""
    import pyarrow.dataset as pads

    from ..core.sfc import zorder

    sfc = int(zorder(key_col, key_row))
    d = pads.dataset(layer_path(catalog, name, zoom), format="parquet", partitioning="hive")
    return d.to_table(filter=pads.field("sfc") == sfc)


def update_layer(ds, catalog: str, name: str, zoom: int):
    """LayerWriter.update equivalent (ref:spark/.../store/file/
    FileLayerWriter.scala update path, L:unverified): merge new tiles into
    an existing layer IN PLACE, rewriting ONLY the sfc_bucket partitions
    that contain new keys — untouched buckets are never read or written
    (at 100 TB an update touching 0.1% of keys reads/writes 0.1% of the
    layer). Merge semantics: the NEW tile wins on its defined cells,
    existing cells fill its NoData (tile_merge left-wins = new-first).
    KeyBounds in the metadata sidecar expand to cover the update. Returns
    the list of rewritten bucket ids."""
    import shutil

    import ray.data

    from ..stages.layer_ops import merge_layers

    path = layer_path(catalog, name, zoom)
    meta_raw = json.load(open(os.path.join(path, "_metadata.json")))
    shift = int((meta_raw.get("extra") or {}).get("bucket_shift", DEFAULT_BUCKET_SHIFT))

    withb = ds.map_batches(lambda b: add_sfc_bucket(b, shift),
                           batch_format="pyarrow", zero_copy_batch=True)
    buckets = sorted(set(withb.select_columns(["sfc_bucket"]).unique("sfc_bucket")))

    existing_dirs = [os.path.join(path, f"sfc_bucket={b}") for b in buckets]
    existing_dirs = [d for d in existing_dirs if os.path.isdir(d)]
    cols = ["key_col", "key_row", "sfc", "cells", "cols", "rows", "cell_type"]
    if existing_dirs:
        old = ray.data.read_parquet(existing_dirs, file_extensions=["parquet"],
                                    columns=cols)
        merged = merge_layers(ds.select_columns(cols), old)
    else:
        merged = ds.select_columns(cols)

    tmp = path + ".update_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.map_batches(lambda b: add_sfc_bucket(b, shift),
                       batch_format="pyarrow", zero_copy_batch=True
                       ).sort("sfc").write_parquet(tmp, partition_cols=["sfc_bucket"])
    for b in buckets:
        src = os.path.join(tmp, f"sfc_bucket={b}")
        dst = os.path.join(path, f"sfc_bucket={b}")
        if os.path.isdir(src):
            shutil.rmtree(dst, ignore_errors=True)
            os.rename(src, dst)
    shutil.rmtree(tmp, ignore_errors=True)

    # expand KeyBounds to cover the update (one aggregate on the new side)
    from ray.data.aggregate import Max, Min

    st = ds.aggregate(Min("key_col", alias_name="cmin"), Max("key_col", alias_name="cmax"),
                      Min("key_row", alias_name="rmin"), Max("key_row", alias_name="rmax"))
    kb = meta_raw["bounds"]  # [col_min, row_min, col_max, row_max]
    meta_raw["bounds"] = [min(kb[0], int(st["cmin"])), min(kb[1], int(st["rmin"])),
                          max(kb[2], int(st["cmax"])), max(kb[3], int(st["rmax"]))]
    with open(os.path.join(path, "_metadata.json"), "w") as f:
        json.dump(meta_raw, f, sort_keys=True)
    return buckets


def list_layers(catalog: str) -> list[tuple[str, int]]:
    """AttributeStore.layerIds equivalent: every (name, zoom) with a
    metadata sidecar under the catalog."""
    out = []
    if not os.path.isdir(catalog):
        return out
    for name in sorted(os.listdir(catalog)):
        npath = os.path.join(catalog, name)
        if not os.path.isdir(npath):
            continue
        for z in sorted(os.listdir(npath)):
            if z.isdigit() and os.path.exists(
                    os.path.join(npath, z, "_metadata.json")):
                out.append((name, int(z)))
    return out


def delete_layer(catalog: str, name: str, zoom: int) -> bool:
    """AttributeStore.delete equivalent; returns True if the layer existed."""
    import shutil

    path = layer_path(catalog, name, zoom)
    if not os.path.isdir(path):
        return False
    shutil.rmtree(path)
    npath = os.path.join(catalog, name)
    if os.path.isdir(npath) and not os.listdir(npath):
        os.rmdir(npath)
    return True
