"""Persisted bucket-partitioned ANN index — the reusable-index scale path.

``ann_lsh``/``ann_ivf`` (stages/ann.py) prefilter by scanning the FULL
embedding dataset per query-set: right for one-shot batch scoring, wrong for
a reusable index at 100 TB (every call reads everything once). This module
writes the embeddings ONCE partitioned by coarse list (IVF centroid id or
LSH bucket), with the quantizer in a JSON sidecar; queries then read only
the probed partition directories — the same partition-pruning idea as the
layer store's sfc_bucket layout (sources/layer.py).

Layout::

    {path}/ann_list=N/part-*.parquet     one dir per inverted list / bucket
    {path}/_ann_meta.json                kind, params, centroids | planes

Engine addition for the training-data pipeline (driver mandate; no
GeoTrellis counterpart — SURVEY.md §2.8).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from ..stages.ann import (
    _batch_matrix,
    _normalize,
    ann_brute_force,
    hyperplanes,
    kmeans_lite,
    lsh_bucket,
)


def build_ann_index(
    ds,
    path: str,
    kind: str = "ivf",
    n_centroids: int = 64,
    nbits: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    train_limit: int = 10_000,
    sample_fraction: float = 1.0,
) -> str:
    """Embeddings Dataset -> partitioned index at ``path``. The quantizer
    (centroids / hyperplanes) is trained on a bounded sample, broadcast into
    one assignment map_batches, and the write shuffles nothing: each block
    fans its rows into the hive-partitioned dirs it touches."""
    os.makedirs(path, exist_ok=True)
    if kind == "ivf":
        sampled = ds.random_sample(sample_fraction, seed=7) if 0 < sample_fraction < 1 else ds
        stabs = [
            _normalize(_batch_matrix(b, emb_col))
            for b in sampled.limit(train_limit).iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        cents = kmeans_lite(np.vstack(stabs), n_centroids)
        quant = {"centroids": cents.tolist()}

        def assign(batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, emb_col))
            lists = np.argmax(m @ cents.T, axis=1).astype(np.int64)
            return batch.append_column("ann_list", pa.array(lists, pa.int64()))

    elif kind == "lsh":
        # dimension from the first non-empty block's schema-carried list width
        first = next(b for b in ds.limit(1).iter_batches(batch_format="pyarrow") if b.num_rows)
        d = _batch_matrix(first, emb_col).shape[1]
        planes = hyperplanes(d, nbits)
        quant = {"planes": planes.tolist()}

        def assign(batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, emb_col))
            lists = lsh_bucket(m, planes).astype(np.int64)
            return batch.append_column("ann_list", pa.array(lists, pa.int64()))

    else:
        raise ValueError(f"unknown index kind: {kind}")

    ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        path, partition_cols=["ann_list"]
    )
    meta = {"kind": kind, "n_centroids": n_centroids, "nbits": nbits,
            "id_col": id_col, "emb_col": emb_col, **quant}
    with open(os.path.join(path, "_ann_meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def read_ann_meta(path: str) -> dict:
    with open(os.path.join(path, "_ann_meta.json")) as f:
        return json.load(f)


def probed_list_dirs(path: str, queries: np.ndarray, nprobe: int = 4) -> tuple[list[str], list[int]]:
    """The partition dirs a query matrix needs: IVF -> nprobe nearest lists
    per query; LSH -> query bucket + all 1-bit flips. Returns (existing dirs,
    probed list ids) — callers read ONLY these files."""
    meta = read_ann_meta(path)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    if meta["kind"] == "ivf":
        cents = np.asarray(meta["centroids"], dtype=np.float32)
        probe_lists = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
        probed = sorted(int(x) for x in np.unique(probe_lists))
    else:
        planes = np.asarray(meta["planes"], dtype=np.float64)
        buckets = lsh_bucket(q, planes)
        probe: set[int] = set()
        for b in buckets:
            probe.add(int(b))
            for bit in range(planes.shape[0]):
                probe.add(int(b) ^ (1 << bit))
        probed = sorted(probe)
    dirs = [os.path.join(path, f"ann_list={l}") for l in probed]
    return [d for d in dirs if os.path.isdir(d)], probed


def ann_query_index(path: str, queries: np.ndarray, k: int = 5, nprobe: int = 4):
    """Top-k over a persisted index: read ONLY the probed partition dirs,
    exact cosine re-rank inside them (ann_brute_force shape). At 100 TB this
    is the difference between reading everything per query-set and reading
    #probed/#lists of it."""
    import ray.data

    meta = read_ann_meta(path)
    dirs, _ = probed_list_dirs(path, queries, nprobe)
    if not dirs:
        return ray.data.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            meta["id_col"]: pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int64()),
        }))
    files = [
        os.path.join(d, f) for d in dirs for f in sorted(os.listdir(d)) if f.endswith(".parquet")
    ]
    pruned = ray.data.read_parquet(files, columns=[meta["id_col"], meta["emb_col"]])
    return ann_brute_force(pruned, queries, k, id_col=meta["id_col"], emb_col=meta["emb_col"])
