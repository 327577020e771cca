"""Layer-layer joins keyed on SpatialKey/sfc.

Re-expresses ref:spark/src/main/scala/geotrellis/spark/join/SpatialJoin.scala
(join / leftOuterJoin over SpacePartitioner, L:unverified — /root/reference
empty at survey time; SURVEY.md §2.4) as Ray's hash-partitioned
``Dataset.join`` on the sfc column, plus semi/anti via broadcast key sets,
and a partition-based (PBSM) large-large spatial join built from ClipToGrid
explode + equi-join on sfc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.sfc import zorder


def _normalize_blocks(ds, n: int):
    """Workaround for Ray 2.49: groupby().aggregate() can emit an EMPTY block
    with an EMPTY schema; Dataset.join then fails with ArrowInvalid ("no
    match for key field on right side"). A repartition rebuilds uniform
    blocks. Only needed when a join input has aggregate lineage."""
    return ds.repartition(n)


def spatial_join(left, right, how: str = "inner", num_partitions: int = 32,
                 on: tuple[str, ...] = ("sfc",), left_suffix: str = "", right_suffix: str = "_r",
                 normalize: bool = True):
    """Equi-join two keyed layers on sfc (or any key tuple). how: inner |
    left_outer. Result bounds = combined metadata (computed by the caller's
    aggregate pass when needed)."""
    if normalize:
        left = _normalize_blocks(left, num_partitions)
        right = _normalize_blocks(right, num_partitions)
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=on,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )


def semi_join_keys(ds, key_set, key_col: str = "sfc", anti: bool = False):
    """Semi/anti join against a SMALL key set: broadcast the set, filter
    inside map_batches — no shuffle (SURVEY.md §2.4)."""
    keys = np.fromiter((int(k) for k in key_set), dtype=np.uint64, count=len(key_set))

    def f(batch: pa.Table) -> pa.Table:
        v = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        hit = np.isin(v, keys)
        return batch.filter(pa.array(~hit if anti else hit))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def key_intersection(left, right, key_cols=("key_col", "key_row")):
    """Intersect the key sets of two layers (KeyBounds.intersect analogue on
    actual keys): distinct keys present in BOTH."""
    lk = left.select_columns(list(key_cols)).unique(list(key_cols))
    return spatial_join(lk, right.select_columns(list(key_cols)).unique(list(key_cols)),
                        how="inner", on=tuple(key_cols))


def broadcast_join(left_ds, right_table: pa.Table, left_key: str, right_key: str,
                   how: str = "inner", right_columns: list[str] | None = None):
    """Broadcast inner/left-outer equi-join against a SMALL right table: the
    right side is sorted once by key and shipped via ``ray.put``; each batch
    resolves matches with a vectorized double searchsorted (duplicate right
    keys expand). No shuffle, no join actors — the scale pattern for
    dimension-table joins (brief: "broadcast small sides with ray.put +
    lookup inside map_batches instead of a shuffle join"). Right keys must
    be integers."""
    import ray

    rk = right_table[right_key].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(rk, kind="stable")
    rk_sorted = rk[order]
    cols = right_columns if right_columns is not None else [
        c for c in right_table.column_names if c != right_key
    ]
    right_sorted = right_table.select(cols).take(pa.array(order, pa.int64()))
    ref = ray.put((rk_sorted, right_sorted))

    def join_batch(b: pa.Table, *, _ref=ref) -> pa.Table:
        keys_sorted, right = ray.get(_ref)
        lk = b[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.searchsorted(keys_sorted, lk, side="left")
        hi = np.searchsorted(keys_sorted, lk, side="right")
        counts = hi - lo
        if how == "inner":
            take_left = np.repeat(np.arange(len(b), dtype=np.int64), counts)
            offs = (np.concatenate([np.arange(c) for c in counts])
                    if counts.sum() else np.array([], np.int64))
            take_right = np.repeat(lo, counts) + offs
            out = b.take(pa.array(take_left, pa.int64()))
            rgt = right.take(pa.array(take_right, pa.int64()))
        elif how == "left_outer":
            eff = np.maximum(counts, 1)
            take_left = np.repeat(np.arange(len(b), dtype=np.int64), eff)
            offs = (np.concatenate([np.arange(c) for c in eff])
                    if eff.sum() else np.array([], np.int64))
            base = np.repeat(np.where(counts > 0, lo, -1), eff)
            take_right = np.where(base >= 0, base + offs, -1)
            out = b.take(pa.array(take_left, pa.int64()))
            valid = take_right >= 0
            gathered = right.take(pa.array(np.where(valid, take_right, 0), pa.int64()))
            # unmatched rows -> nulls via an Arrow take with null indices
            idx = pa.array(np.where(valid, np.arange(len(valid)), -1), pa.int64())
            idx = pa.compute.if_else(pa.compute.greater_equal(idx, 0), idx, pa.scalar(None, pa.int64()))
            rgt = gathered.take(idx)
        else:
            raise ValueError(f"unsupported how={how!r}")
        for c in rgt.column_names:
            out = out.append_column(c, rgt[c])
        return out

    return left_ds.map_batches(join_batch, batch_format="pyarrow", zero_copy_batch=True)


def range_join(points_ds, intervals_ds, value_col: str, lo_col: str, hi_col: str,
               bucket_width: float, num_partitions: int = 16,
               point_suffix: str = "", interval_suffix: str = "_r"):
    """Large-large interval join (the 1-D PBSM shape): match point rows to
    interval rows with ``lo <= value < hi``. Each point hashes to exactly ONE
    bucket (floor(value/width)); each interval EXPLODES to its covering
    buckets (flat map, no shuffle); an equi-join on the bucket co-locates
    candidates; a vectorized refine applies the exact predicate. No pair can
    duplicate: it only materializes in the point's own bucket.

    ``bucket_width`` trades explosion factor against join selectivity — pick
    it near the typical interval length (driver mandate "range join";
    no reference counterpart)."""

    def pbucket(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        return b.append_column("__bucket", pa.array(
            np.floor(v / bucket_width).astype(np.int64), pa.int64()))

    def ibucket(b: pa.Table) -> pa.Table:
        lo = b[lo_col].to_numpy(zero_copy_only=False)
        hi = b[hi_col].to_numpy(zero_copy_only=False)
        first = np.floor(lo / bucket_width).astype(np.int64)
        # hi is exclusive: the last candidate bucket is the one containing
        # the largest value strictly below hi
        last = np.floor(np.nextafter(hi, -np.inf) / bucket_width).astype(np.int64)
        counts = np.maximum(last - first + 1, 0)
        idx = np.repeat(np.arange(len(b), dtype=np.int64), counts)
        offs = np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.array([], np.int64)
        out = b.take(pa.array(idx, pa.int64()))
        return out.append_column("__bucket", pa.array(first[idx] + offs, pa.int64()))

    pts = points_ds.map_batches(pbucket, batch_format="pyarrow", zero_copy_batch=True)
    ivs = intervals_ds.map_batches(ibucket, batch_format="pyarrow", zero_copy_batch=True)
    joined = pts.join(ivs, join_type="inner", num_partitions=num_partitions,
                      on=("__bucket",), left_suffix=point_suffix, right_suffix=interval_suffix)

    def refine(b: pa.Table) -> pa.Table:
        v = b[value_col].to_numpy(zero_copy_only=False)
        lo = b[lo_col].to_numpy(zero_copy_only=False)
        hi = b[hi_col].to_numpy(zero_copy_only=False)
        keep = (v >= lo) & (v < hi)
        return b.filter(pa.array(keep)).drop_columns(["__bucket"])

    return joined.map_batches(refine, batch_format="pyarrow", zero_copy_batch=True)


def pbsm_spatial_join(points_ds, polygons_ds, layout, zoom: int, num_partitions: int = 32,
                      wkb_col: str = "wkb"):
    """Large-large spatial join (partition-based spatial-merge): explode the
    polygon side to covering sfc keys via ClipToGrid, equi-join on sfc, then
    exact PIP refine per joined batch. Use when the polygon side is too large
    to broadcast (SURVEY.md §2.4 VectorJoin large-large variant)."""
    from ..core import wkb as wkb_mod
    from ..core.geom import point_in_polygon_geom
    from .clip import clip_to_grid_batch

    exploded = polygons_ds.map_batches(
        # drop the original geometry after clipping: clipped_wkb carries all
        # the refine needs, and the original would be re-shipped per joined row
        lambda b: clip_to_grid_batch(b, layout, wkb_col=wkb_col).drop_columns([wkb_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).map_batches(
        lambda b: b.append_column(
            "sfc",
            pa.array(
                zorder(
                    b["key_col"].to_numpy(zero_copy_only=False),
                    b["key_row"].to_numpy(zero_copy_only=False),
                ),
                pa.uint64(),
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = spatial_join(points_ds, exploded, how="inner", num_partitions=num_partitions)

    def refine(batch: pa.Table) -> pa.Table:
        # post-join row count is the biggest dataflow in a large-large join:
        # group the batch by clipped polygon, decode each polygon ONCE, and
        # run the vectorized PIP over all of its candidate points (same shape
        # as PolygonIndex.probe) — never per-row Python
        import pandas as pd

        full = batch["full"].to_numpy(zero_copy_only=False).astype(bool)
        keep = full.copy()
        nf = np.nonzero(~full)[0]
        if len(nf):
            xs = batch["lon"].to_numpy(zero_copy_only=False)
            ys = batch["lat"].to_numpy(zero_copy_only=False)
            wkbs = batch["clipped_wkb"].to_pylist()
            # object-dtype Series keeps python bytes intact (a bare list would
            # coerce to numpy S-dtype, which silently strips trailing NULs and
            # corrupts WKB)
            codes, uniques = pd.factorize(pd.Series([wkbs[i] for i in nf], dtype=object))
            for u, buf in enumerate(uniques):
                g = wkb_mod.decode(buf)
                if g["type"] not in ("Polygon", "MultiPolygon"):
                    continue
                sel = nf[codes == u]
                keep[sel] = point_in_polygon_geom(xs[sel], ys[sel], g)
        return batch.filter(pa.array(keep))

    return joined.map_batches(refine, batch_format="pyarrow", zero_copy_batch=True)
