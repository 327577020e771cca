"""RegionGroup: connected-component labeling of equal-valued cells across a
whole tile layer (ref:raster/src/main/scala/geotrellis/raster/regiongroup/
RegionGroup.scala — L:unverified, /root/reference empty at survey time; the
reference labels one tile, this stage labels the DISTRIBUTED layer).

Distributed shape (the classic two-level CCL):
1. per-tile labeling (map_batches, no shuffle): run-based two-pass union-find
   over rows — Python loops over RUNS, never cells; labels are globally
   unique by construction (tile-index << 18 | local-label).
2. tile edges (1 row of values+labels per shared border side) meet in a
   groupby((dir, edge_col, edge_row)) of size <= 2; equal adjacent values
   emit label-equivalence pairs. The edge stream is O(tiles x tile_edge),
   ~2 KB/tile — negligible next to the layer.
3. equivalences union-find on the driver (component = min global label —
   deterministic). At extreme scales swap in the distributed min-label
   propagation used by stages/dedup.cluster_pairs; the pair schema matches.
4. relabel (map_batches): np.searchsorted over the broadcast (ray.put)
   remap table — only labels that participate in a cross-tile merge appear
   in it; all others pass through.

Output tiles are int64 label cells, NoData = -1 (not part of any region).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core.raster import decode_tile, is_nodata

_LOCAL_BITS = 18  # max 2^18 runs/tile — a 256x256 tile has <= 32768 runs


def label_tile(a: np.ndarray) -> np.ndarray:
    """4-connectivity CCL of equal-valued cells; NoData cells -> -1.
    Run-based: one union-find over row runs, loops are over runs."""
    rows, cols = a.shape
    valid = ~is_nodata(a)
    parent: list[int] = []

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x: int, y: int) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    run_id = np.full((rows, cols), -1, dtype=np.int64)
    prev: list[tuple[int, int, float, int]] = []  # (c0, c1, value, run)
    for r in range(rows):
        row = a[r]
        v = valid[r]
        if not v.any():
            prev = []
            continue
        cont = np.zeros(cols, dtype=bool)
        cont[1:] = v[1:] & v[:-1] & (row[1:] == row[:-1])
        starts = np.nonzero(v & ~cont)[0]
        brks = np.nonzero(~cont)[0]
        eidx = np.searchsorted(brks, starts, side="right")
        ends = np.where(eidx < len(brks), brks[np.minimum(eidx, len(brks) - 1)], cols)
        cur: list[tuple[int, int, float, int]] = []
        pi = 0
        for c0, c1 in zip(starts, ends):
            c0, c1 = int(c0), int(c1)
            rid = len(parent)
            parent.append(rid)
            val = row[c0]
            # merge with overlapping same-value runs in the previous row
            while pi < len(prev) and prev[pi][1] <= c0:
                pi += 1
            pj = pi
            while pj < len(prev) and prev[pj][0] < c1:
                if prev[pj][2] == val:
                    union(rid, prev[pj][3])
                pj += 1
            run_id[r, c0:c1] = rid
            cur.append((c0, c1, val, rid))
        prev = cur
    labels = np.full((rows, cols), -1, dtype=np.int64)
    if parent:
        roots = np.fromiter((find(i) for i in range(len(parent))), dtype=np.int64,
                            count=len(parent))
        m = run_id >= 0
        labels[m] = roots[run_id[m]]
    return labels


def _tile_batch_label(batch: pa.Table, layout_cols: int) -> pa.Table:
    out_cells, edges = [], {k: [] for k in
                            ("dir", "ec", "er", "side", "vals", "labs")}
    kcs = batch["key_col"].to_numpy(zero_copy_only=False)
    krs = batch["key_row"].to_numpy(zero_copy_only=False)
    cols_a = batch["cols"].to_numpy(zero_copy_only=False)
    rows_a = batch["rows"].to_numpy(zero_copy_only=False)
    cts = batch["cell_type"].to_pylist()
    for i in range(batch.num_rows):
        a = decode_tile(batch["cells"][i].as_py(), int(cols_a[i]), int(rows_a[i]), cts[i])
        labs = label_tile(a)
        kc, kr = int(kcs[i]), int(krs[i])
        base = np.int64((kr * layout_cols + kc) << _LOCAL_BITS)
        g = np.where(labs >= 0, labs + base + 1, np.int64(-1))
        out_cells.append(g.tobytes())
        av = np.where(is_nodata(a), np.nan, a.astype(np.float64))
        # four border sides; the vertical border between (kc,kr) and
        # (kc+1,kr) is keyed ("v", kc, kr); horizontal below is ("h", kc, kr)
        for d, ec, er, side, vv, ll in (
            ("v", kc, kr, 0, av[:, -1], g[:, -1]),       # my right edge
            ("v", kc - 1, kr, 1, av[:, 0], g[:, 0]),     # neighbour's left
            ("h", kc, kr, 0, av[-1, :], g[-1, :]),       # my bottom edge
            ("h", kc, kr - 1, 1, av[0, :], g[0, :]),     # neighbour's top
        ):
            edges["dir"].append(d)
            edges["ec"].append(ec)
            edges["er"].append(er)
            edges["side"].append(side)
            edges["vals"].append(vv.tobytes())
            edges["labs"].append(ll.tobytes())
    tiles = batch.set_column(batch.column_names.index("cells"), "cells",
                             pa.array(out_cells, pa.binary()))
    tiles = tiles.set_column(batch.column_names.index("cell_type"), "cell_type",
                             pa.array(["int64"] * batch.num_rows, pa.string()))
    edge_t = pa.table({
        "dir": pa.array(edges["dir"], pa.string()),
        "ec": pa.array(edges["ec"], pa.int32()),
        "er": pa.array(edges["er"], pa.int32()),
        "side": pa.array(edges["side"], pa.int8()),
        "vals": pa.array(edges["vals"], pa.binary()),
        "labs": pa.array(edges["labs"], pa.binary()),
    })
    return tiles, edge_t


def _edge_equivalences(g: pd.DataFrame) -> pd.DataFrame:
    """One shared border: <=2 rows (side 0 = west/north tile, 1 = east/south).
    Emits (ga, gb) for adjacent equal-valued valid cells."""
    if len(g) < 2:
        return pd.DataFrame({"ga": [], "gb": []})
    g = g.sort_values("side")
    v0 = np.frombuffer(g["vals"].iloc[0], dtype=np.float64)
    v1 = np.frombuffer(g["vals"].iloc[1], dtype=np.float64)
    l0 = np.frombuffer(g["labs"].iloc[0], dtype=np.int64)
    l1 = np.frombuffer(g["labs"].iloc[1], dtype=np.int64)
    eq = (v0 == v1) & (l0 >= 0) & (l1 >= 0)  # nan != nan excludes NoData
    if not eq.any():
        return pd.DataFrame({"ga": [], "gb": []})
    pairs = pd.DataFrame({"ga": l0[eq], "gb": l1[eq]}).drop_duplicates()
    return pairs


def region_group(ds, layout):
    """Labels a tile layer's connected equal-valued regions. Returns a
    Dataset of int64-label tiles (same keys/schema; NoData -> -1), with
    labels consistent ACROSS tile borders."""
    import ray
    import ray.data as rd

    layout_cols = layout.tile_layout.layout_cols

    tiles_and_edges = ds.map_batches(
        lambda b: _split_pair(_tile_batch_label(b, layout_cols)),
        batch_format="pyarrow", zero_copy_batch=True)
    # route tiles and edge rows through one stream with a discriminator to
    # avoid executing the labeling twice
    mat = tiles_and_edges.materialize()
    tiles = mat.filter(expr="__edge == 0").drop_columns(
        ["__edge", "dir", "ec", "er", "side", "vals", "labs"])
    edges = mat.filter(expr="__edge == 1").select_columns(
        ["dir", "ec", "er", "side", "vals", "labs"])

    eqs = edges.groupby(["dir", "ec", "er"]).map_groups(
        _edge_equivalences, batch_format="pandas").take_all()
    # driver union-find over cross-tile equivalences only
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for row in eqs:
        ra, rb = find(int(row["ga"])), find(int(row["gb"]))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    remap_keys = np.array(sorted(parent), dtype=np.int64)
    remap_vals = np.array([find(int(k)) for k in remap_keys], dtype=np.int64)
    ref = ray.put((remap_keys, remap_vals))

    def relabel(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        if len(keys) == 0 or batch.num_rows == 0:
            return batch
        out = []
        for i in range(batch.num_rows):
            g = np.frombuffer(batch["cells"][i].as_py(), dtype=np.int64).copy()
            idx = np.searchsorted(keys, g)
            idx[idx >= len(keys)] = 0
            hit = keys[idx] == g
            g[hit] = vals[idx[hit]]
            out.append(g.tobytes())
        return batch.set_column(batch.column_names.index("cells"), "cells",
                                pa.array(out, pa.binary()))

    return tiles.map_batches(relabel, batch_format="pyarrow", zero_copy_batch=True)


def _split_pair(pair) -> pa.Table:
    """Concat (tiles, edges) into one discriminated stream (__edge 0/1)."""
    tiles, edges = pair
    t = tiles.append_column("__edge", pa.array([0] * tiles.num_rows, pa.int8()))
    for name in ("dir", "ec", "er", "side", "vals", "labs"):
        fld = edges.schema.field(name)
        t = t.append_column(name, pa.nulls(t.num_rows, fld.type))
    cols = {}
    for name in t.column_names:
        if name in ("dir", "ec", "er", "side", "vals", "labs"):
            cols[name] = edges[name]
        elif name == "__edge":
            cols[name] = pa.array([1] * edges.num_rows, pa.int8())
        else:
            cols[name] = pa.nulls(edges.num_rows, t.schema.field(name).type)
    e = pa.table(cols)
    return pa.concat_tables([t, e])


def region_sizes(labeled_ds):
    """(label, n_cells) for every region — partial_groupby over exploded
    label runs (map-side combine; only (label, count) partials shuffle)."""
    from .agg import partial_groupby

    def explode(b: pa.Table) -> pa.Table:
        labs, counts = [], []
        for i in range(b.num_rows):
            g = np.frombuffer(b["cells"][i].as_py(), dtype=np.int64)
            u, c = np.unique(g[g >= 0], return_counts=True)
            labs.append(u)
            counts.append(c)
        if not labs:
            return pa.table({"label": pa.array([], pa.int64()),
                             "n_cells": pa.array([], pa.int64())})
        return pa.table({"label": pa.array(np.concatenate(labs), pa.int64()),
                         "n_cells": pa.array(np.concatenate(counts), pa.int64())})

    per_tile = labeled_ds.map_batches(explode, batch_format="pyarrow",
                                      zero_copy_batch=True)
    return partial_groupby(per_tile, ["label"], [("n_cells", "sum", "n_cells")])


def region_stats(labeled_ds, layout, keep_label: bool = False):
    """(region_cell, n_cells) per region, where region_cell is the region's
    MINIMUM global cell index (row-major over the whole layout) — a
    label-free canonical region id, so results are comparable against any
    other labeling (e.g. a SQL transitive-closure oracle). Same
    partial_groupby shape as region_sizes. ``keep_label`` retains the
    internal label column (for joining back to other per-label outputs,
    e.g. vectorize)."""
    from .agg import partial_groupby

    tl = layout.tile_layout
    W = tl.layout_cols * tl.tile_cols

    def explode(b: pa.Table) -> pa.Table:
        labs, counts, mins = [], [], []
        kcs = b["key_col"].to_numpy(zero_copy_only=False)
        krs = b["key_row"].to_numpy(zero_copy_only=False)
        for i in range(b.num_rows):
            tc, tr = int(b["cols"][i].as_py()), int(b["rows"][i].as_py())
            g = np.frombuffer(b["cells"][i].as_py(), dtype=np.int64).reshape(tr, tc)
            gy = int(krs[i]) * tr + np.arange(tr)[:, None]
            gx = int(kcs[i]) * tc + np.arange(tc)[None, :]
            cid = (gy * W + gx).astype(np.int64)
            m = g >= 0
            if not m.any():
                continue
            import pandas as pd

            df = pd.DataFrame({"lab": g[m].ravel(), "cid": cid[m].ravel()})
            agg = df.groupby("lab")["cid"].agg(["count", "min"])
            labs.append(agg.index.to_numpy())
            counts.append(agg["count"].to_numpy().astype(np.int64))
            mins.append(agg["min"].to_numpy().astype(np.int64))
        if not labs:
            return pa.table({"label": pa.array([], pa.int64()),
                             "n_cells": pa.array([], pa.int64()),
                             "min_cell": pa.array([], pa.int64())})
        return pa.table({"label": pa.array(np.concatenate(labs), pa.int64()),
                         "n_cells": pa.array(np.concatenate(counts), pa.int64()),
                         "min_cell": pa.array(np.concatenate(mins), pa.int64())})

    per_tile = labeled_ds.map_batches(explode, batch_format="pyarrow",
                                      zero_copy_batch=True)
    merged = partial_groupby(per_tile, ["label"],
                             [("n_cells", "sum", "n_cells"),
                              ("min_cell", "min", "region_cell")])
    if keep_label:
        return merged
    return merged.drop_columns(["label"])
