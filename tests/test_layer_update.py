"""update_layer (sources/layer.py): in-place merge rewriting ONLY the
buckets containing new keys; untouched bucket files stay byte-identical."""
import os

import numpy as np
import pyarrow as pa


def _tile(v, hole=None):
    a = np.full((4, 4), float(v))
    if hole:
        a[hole] = np.nan
    return a


def _layer_rows(keys, val_fn):
    from geotrellis_ray.core.sfc import zorder

    rows = []
    for c, r in keys:
        a = val_fn(c, r)
        rows.append({"key_col": c, "key_row": r, "sfc": int(zorder(c, r)),
                     "cells": a.astype(np.float64).tobytes(), "cols": 4,
                     "rows": 4, "cell_type": "float64"})
    return rows


def test_update_layer_partial_rewrite(ray_session, tmp_path):
    import ray.data as rd

    from geotrellis_ray.sources.layer import (read_layer,
                                              read_layer_metadata,
                                              update_layer, write_layer)

    catalog = str(tmp_path)
    keys = [(c, r) for c in range(4) for r in range(4)]
    base = rd.from_arrow(pa.Table.from_pylist(
        _layer_rows(keys, lambda c, r: _tile(10 * c + r, hole=(1, 1)))))
    # shift=1 -> several buckets for a 4x4 grid
    write_layer(base, catalog, "lyr", 4, bucket_shift=1)
    path = os.path.join(catalog, "lyr", "4")

    def snapshot():
        out = {}
        for d in sorted(os.listdir(path)):
            if not d.startswith("sfc_bucket="):
                continue
            for f in sorted(os.listdir(os.path.join(path, d))):
                p = os.path.join(path, d, f)
                out[f"{d}/{f}"] = open(p, "rb").read()
        return out

    before = snapshot()

    # update: overwrite (0,0) (new value, with its own hole) + brand-new key (5,5)
    upd = rd.from_arrow(pa.Table.from_pylist(
        _layer_rows([(0, 0), (5, 5)], lambda c, r: _tile(99, hole=(2, 2)))))
    rewritten = update_layer(upd, catalog, "lyr", 4)
    after = snapshot()

    # only the buckets containing the new keys changed
    from geotrellis_ray.core.sfc import zorder

    expect_buckets = sorted({int(zorder(0, 0)) >> 1, int(zorder(5, 5)) >> 1})
    assert rewritten == expect_buckets
    changed_dirs = {k.split("/")[0] for k in set(before) ^ set(after)}
    changed_dirs |= {k.split("/")[0] for k in before
                     if k in after and before[k] != after[k]}
    assert changed_dirs <= {f"sfc_bucket={b}" for b in expect_buckets}
    untouched = [k for k in before if int(k.split("=")[1].split("/")[0]) not in expect_buckets]
    assert untouched and all(before[k] == after[k] for k in untouched)

    # read-back semantics: new tile wins on defined cells, old fills its hole
    got = {(r["key_col"], r["key_row"]):
           np.frombuffer(r["cells"], np.float64).reshape(4, 4)
           for r in read_layer(catalog, "lyr", 4).take_all()}
    assert len(got) == 17
    t00 = got[(0, 0)]
    assert t00[0, 0] == 99.0
    assert t00[2, 2] == 0.0        # new hole filled by the old tile (10*0+0)
    assert t00[1, 1] == 99.0       # old hole now covered by the new tile
    assert got[(5, 5)][0, 0] == 99.0 and np.isnan(got[(5, 5)][2, 2])
    assert got[(3, 3)][0, 0] == 33.0  # untouched tile intact

    # metadata bounds expanded to include (5,5)
    meta = read_layer_metadata(catalog, "lyr", 4)
    assert meta.bounds.col_max >= 5 and meta.bounds.row_max >= 5


def test_attribute_store_list_delete(ray_session, tmp_path):
    import ray.data as rd

    from geotrellis_ray.sources.layer import (delete_layer, list_layers,
                                              write_layer)

    catalog = str(tmp_path)
    ds = rd.from_arrow(pa.Table.from_pylist(
        _layer_rows([(0, 0)], lambda c, r: _tile(1))))
    write_layer(ds, catalog, "a", 3)
    write_layer(ds, catalog, "a", 2)
    write_layer(ds, catalog, "b", 5)
    assert list_layers(catalog) == [("a", 2), ("a", 3), ("b", 5)]
    assert delete_layer(catalog, "a", 3)
    assert not delete_layer(catalog, "a", 3)
    assert list_layers(catalog) == [("a", 2), ("b", 5)]
    assert delete_layer(catalog, "b", 5)
    assert list_layers(catalog) == [("a", 2)]
