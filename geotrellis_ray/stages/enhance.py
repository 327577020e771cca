"""Layer enhancement: histogram equalization + sigmoidal contrast.

GeoTrellis ships both as tile/layer methods
(ref:raster/src/main/scala/geotrellis/raster/equalization/HistogramEqualization.scala,
ref:raster/src/main/scala/geotrellis/raster/sigmoidal/SigmoidalContrast.scala,
L:unverified — /root/reference empty at survey time). Both are rebuilt
layer-wide, Ray-Data-first:

- equalize_layer: ONE slim distributed aggregate (per-tile np.unique value
  counts -> partial_groupby) collects the global value CDF; the mapping is
  broadcast via ray.put and every tile remaps locally with np.searchsorted.
  Exact (FastMap-style) for integer-valued layers; a cardinality guard
  protects the driver collect.
- sigmoidal_contrast: layer min/max via one aggregate, then a pure per-cell
  vectorized transform — no shuffle at all.

Both preserve NoData (NaN) and the tile schema.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["equalize_layer", "sigmoidal_contrast", "match_histogram",
           "normalize_layer"]

_MAX_DISTINCT = 1 << 22  # driver-collect guard: int rasters are <= 2^16 anyway


def _tile_iter(batch: pa.Table):
    cols_a = batch["cols"].to_numpy(zero_copy_only=False)
    rows_a = batch["rows"].to_numpy(zero_copy_only=False)
    for i in range(batch.num_rows):
        yield i, np.frombuffer(batch["cells"][i].as_py(), dtype=np.float64).reshape(
            int(rows_a[i]), int(cols_a[i]))


def _replace_cells(batch: pa.Table, new_cells: list[bytes]) -> pa.Table:
    return batch.set_column(batch.column_names.index("cells"), "cells",
                            pa.array(new_cells, pa.binary()))


def equalize_layer(ds):
    """Histogram-equalize a whole tile layer (float64-cell tiles, NaN =
    NoData). The mapping is the integer-exact GeoTrellis form:

        T(v) = lo + floor( (cdf(v) - cdf(lo)) * (hi - lo) / (N - cdf(lo)) )

    with cdf(v) = #cells <= v over the ENTIRE layer, lo/hi the layer
    min/max. Constant layers pass through unchanged."""
    import ray

    from .agg import partial_groupby

    def counts(batch: pa.Table) -> pa.Table:
        vs, cs = [], []
        for _i, a in _tile_iter(batch):
            v, c = np.unique(a[~np.isnan(a)], return_counts=True)
            vs.append(v)
            cs.append(c.astype(np.int64))
        if not vs:
            return pa.table({"v": pa.array([], pa.float64()),
                             "c": pa.array([], pa.int64())})
        return pa.table({"v": pa.array(np.concatenate(vs), pa.float64()),
                         "c": pa.array(np.concatenate(cs), pa.int64())})

    hist = partial_groupby(
        ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True),
        ["v"], [("c", "sum", "c")],
    ).take_all()
    if len(hist) > _MAX_DISTINCT:
        raise ValueError(
            f"equalize_layer: {len(hist)} distinct values exceeds the exact-CDF "
            f"guard ({_MAX_DISTINCT}); quantize the layer (or use class_breaks "
            f"binning) first")
    if not hist:
        return ds
    vals = np.array([r["v"] for r in hist], dtype=np.float64)
    cnts = np.array([r["c"] for r in hist], dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    lo, hi, n = float(vals[0]), float(vals[-1]), int(cum[-1])
    c0 = int(cum[0])
    ref = ray.put((vals, cum))

    def remap(batch: pa.Table) -> pa.Table:
        if hi == lo or n == c0:
            return batch
        v_sorted, cdf = ray.get(ref)
        out = []
        for _i, a in _tile_iter(batch):
            m = ~np.isnan(a)
            r = a.copy()
            idx = np.searchsorted(v_sorted, a[m], side="right") - 1
            r[m] = lo + np.floor((cdf[idx] - c0) * (hi - lo) / (n - c0))
            out.append(r.tobytes())
        return _replace_cells(batch, out)

    return ds.map_batches(remap, batch_format="pyarrow", zero_copy_batch=True)


def _value_cdf(ds) -> tuple[np.ndarray, np.ndarray]:
    """ONE slim distributed aggregate -> (sorted distinct values, cumulative
    counts) for a whole tile layer. Same FastMap shape as equalize_layer."""
    from .agg import partial_groupby

    def counts(batch: pa.Table) -> pa.Table:
        vs, cs = [], []
        for _i, a in _tile_iter(batch):
            v, c = np.unique(a[~np.isnan(a)], return_counts=True)
            vs.append(v)
            cs.append(c.astype(np.int64))
        if not vs:
            return pa.table({"v": pa.array([], pa.float64()),
                             "c": pa.array([], pa.int64())})
        return pa.table({"v": pa.array(np.concatenate(vs), pa.float64()),
                         "c": pa.array(np.concatenate(cs), pa.int64())})

    hist = partial_groupby(
        ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True),
        ["v"], [("c", "sum", "c")],
    ).take_all()
    if len(hist) > _MAX_DISTINCT:
        raise ValueError(
            f"_value_cdf: {len(hist)} distinct values exceeds the exact-CDF "
            f"guard ({_MAX_DISTINCT}); quantize or bin the layer first")
    vals = np.array([r["v"] for r in hist], dtype=np.float64)
    cnts = np.array([r["c"] for r in hist], dtype=np.int64)
    order = np.argsort(vals)
    return vals[order], np.cumsum(cnts[order])


def match_histogram(ds, target):
    """Histogram matching / specification (GeoTrellis HistogramMatching,
    ref:raster/src/main/scala/geotrellis/raster/matching/HistogramMatching.scala,
    L:unverified — /root/reference empty): remap the layer so its value
    distribution follows the TARGET layer's. Integer-exact inverse-CDF rule:

        T(v) = min { t in target values :
                     cdf_tgt(t) / N_tgt  >=  cdf_src(v) / N_src }

    evaluated with CROSS-MULTIPLIED integer comparison
    (cdf_tgt(t) * N_src >= cdf_src(v) * N_src_tgt) so there is no float
    division anywhere — DuckDB reproduces it bit-exact. Always well-defined:
    cdf_src(v)/N_src <= 1 = cdf_tgt(max)/N_tgt.

    Scale shape: TWO slim value-count aggregates (each ships only distinct
    (value, count) rows, guarded by _MAX_DISTINCT), both mapping tables
    broadcast once via ray.put; every tile remaps locally with two
    searchsorted calls — no shuffle touches tile payloads. Cross products
    must fit uint64 (each side's cell count < ~4.2e9); above that the layer
    should be quantized first (guard raises)."""
    import ray

    src_vals, src_cum = _value_cdf(ds)
    tgt_vals, tgt_cum = _value_cdf(target)
    if not len(src_vals) or not len(tgt_vals):
        return ds
    n_src, n_tgt = int(src_cum[-1]), int(tgt_cum[-1])
    if n_src * n_tgt >= (1 << 64):
        raise ValueError("match_histogram: cdf cross products overflow uint64; "
                         "quantize the layers first")
    # precompute the full source-value -> target-value transfer table once:
    # for each distinct source value, the first target index whose scaled
    # cdf reaches the scaled source cdf.
    j = np.searchsorted(tgt_cum.astype(np.uint64) * np.uint64(n_src),
                        src_cum.astype(np.uint64) * np.uint64(n_tgt),
                        side="left")
    transfer = tgt_vals[np.minimum(j, len(tgt_vals) - 1)]
    ref = ray.put((src_vals, transfer))

    def remap(batch: pa.Table) -> pa.Table:
        v_sorted, tr = ray.get(ref)
        out = []
        for _i, a in _tile_iter(batch):
            m = ~np.isnan(a)
            r = a.copy()
            idx = np.searchsorted(v_sorted, a[m], side="right") - 1
            r[m] = tr[np.maximum(idx, 0)]
            out.append(r.tobytes())
        return _replace_cells(batch, out)

    return ds.map_batches(remap, batch_format="pyarrow", zero_copy_batch=True)


def sigmoidal_contrast(ds, alpha: float = 0.5, beta: float = 10.0):
    """Sigmoidal contrast stretch (GraphicsMagick/GeoTrellis form): with
    u = (v - lo)/(hi - lo) normalized over the LAYER min/max,

        T(v) = lo + (hi - lo) * (sig(u) - sig(0)) / (sig(1) - sig(0)),
        sig(u) = 1 / (1 + exp(beta * (alpha - u)))

    alpha = the midpoint (0..1), beta = the contrast strength. One min/max
    aggregate, then a shuffle-free per-cell map."""
    from .stats import layer_min_max_mean

    mm = layer_min_max_mean(_cells_ds(ds), "v")
    lo, hi = float(mm["min"]), float(mm["max"])

    def sig(u):
        return 1.0 / (1.0 + np.exp(beta * (alpha - u)))

    s0, s1 = sig(0.0), sig(1.0)

    def remap(batch: pa.Table) -> pa.Table:
        if hi == lo:
            return batch
        out = []
        for _i, a in _tile_iter(batch):
            u = (a - lo) / (hi - lo)
            r = lo + (hi - lo) * (sig(u) - s0) / (s1 - s0)
            out.append(np.where(np.isnan(a), np.nan, r).tobytes())
        return _replace_cells(batch, out)

    return ds.map_batches(remap, batch_format="pyarrow", zero_copy_batch=True)


def normalize_layer(ds, new_min: float, new_max: float):
    """Linear rescale of a whole layer to [new_min, new_max] (GeoTrellis
    Tile.normalize / rescale, ref:raster/.../NormalizeMethods.scala,
    L:unverified): T(v) = new_min + (v - lo) * (new_max - new_min) /
    (hi - lo) with lo/hi the LAYER min/max (one slim aggregate, then a
    shuffle-free per-cell map). The operand order is the spec, so a SQL
    oracle reproduces it bit-exact. Constant layers map to new_min."""
    from .stats import layer_min_max_mean

    mm = layer_min_max_mean(_cells_ds(ds), "v")
    lo, hi = float(mm["min"]), float(mm["max"])

    def remap(batch: pa.Table) -> pa.Table:
        out = []
        for _i, a in _tile_iter(batch):
            if hi == lo:
                r = np.where(np.isnan(a), np.nan, new_min)
            else:
                r = new_min + (a - lo) * (new_max - new_min) / (hi - lo)
            out.append(r.tobytes())
        return _replace_cells(batch, out)

    return ds.map_batches(remap, batch_format="pyarrow", zero_copy_batch=True)


def _cells_ds(ds):
    """Tile layer -> slim (v) cell stream for the min/max aggregate."""
    def explode(batch: pa.Table) -> pa.Table:
        parts = []
        for _i, a in _tile_iter(batch):
            v = a[~np.isnan(a)].ravel()
            if len(v):
                parts.append(v)
        vals = np.concatenate(parts) if parts else np.empty(0)
        return pa.table({"v": pa.array(vals, pa.float64())})

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
