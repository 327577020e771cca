"""Similarity search over an embedding column (list<float>).

- ``ann_brute_force``: exact cosine top-k — the baseline. The query matrix is
  broadcast (ray.put / closure) once; each batch does ONE numpy matmul
  against it and keeps a per-batch partial top-k, so only k x blocks rows
  shuffle into the final per-query groupby top-k.
- ``ann_lsh``: the scale path — random-hyperplane LSH (deterministic
  sha-seeded planes): embeddings are bucketed by sign-bit hash; queries probe
  only their bucket (+ optional multi-probe neighbours); exact cosine re-rank
  inside buckets.
- ``embedding_near_dups``: embedding-cosine near-duplicate pairs via the same
  LSH buckets (cos >= threshold).

Engine additions for the training-data pipeline (driver mandate; no
GeoTrellis counterpart).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """list<float> column -> (n, d) float32 matrix (zero-copy flat values)."""
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def hyperplanes(d: int, nbits: int = 16) -> np.ndarray:
    """Deterministic random hyperplanes: (nbits, d) from sha256 counters."""
    out = np.empty((nbits, d), dtype=np.float64)
    for i in range(nbits):
        vals = []
        ctr = 0
        while len(vals) < d:
            dig = hashlib.sha256(f"plane-{i}-{ctr}".encode()).digest()
            vals.extend(int.from_bytes(dig[j : j + 4], "big") / 2**32 - 0.5 for j in range(0, 32, 4))
            ctr += 1
        out[i] = vals[:d]
    return out


def lsh_bucket(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, d) -> uint64 sign-bit bucket ids."""
    bits = (m @ planes.T) > 0
    weights = (np.uint64(1) << np.arange(planes.shape[0], dtype=np.uint64))
    return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)


def ann_brute_force(ds, queries: np.ndarray, k: int = 5, id_col: str = "vec_id",
                    emb_col: str = "embedding"):
    """Exact cosine top-k for a (nq, d) query matrix -> Dataset (query_id,
    rank, id, cosine)."""
    qn = _normalize(np.asarray(queries, dtype=np.float32))

    def partial(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, emb_col))
        sims = qn @ m.T  # (nq, n) one matmul per batch
        ids = batch[id_col]
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]  # (nq, kk)
        out_q = np.repeat(np.arange(len(qn), dtype=np.int64), kk)
        out_i = part.ravel()
        out_s = np.take_along_axis(sims, part, axis=1).ravel().astype(np.float64)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: ids.take(pa.array(out_i, pa.int64())),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


def add_lsh_bucket_batch(batch: pa.Table, planes: np.ndarray, emb_col: str = "embedding") -> pa.Table:
    m = _normalize(_batch_matrix(batch, emb_col))
    return batch.append_column("lsh_bucket", pa.array(lsh_bucket(m, planes), pa.uint64()))


def ann_lsh(ds, queries: np.ndarray, k: int = 5, nbits: int = 8, id_col: str = "vec_id",
            emb_col: str = "embedding"):
    """LSH-bucketed ANN: probe only the buckets the queries hash into.
    Approximate (recall < 1); partitioning assumption: each probed bucket
    holds >= k vectors — lower nbits (or add multi-probe) when short."""
    q = np.asarray(queries, dtype=np.float32)
    planes = hyperplanes(q.shape[1], nbits)
    qn = _normalize(q)
    qbuckets = lsh_bucket(qn, planes)
    # multi-probe: query bucket plus all 1-bit flips (rescues boundary cases)
    probe: set[int] = set()
    for b in qbuckets:
        probe.add(int(b))
        for bit in range(nbits):
            probe.add(int(b) ^ (1 << bit))
    probe_arr = np.fromiter(probe, dtype=np.uint64, count=len(probe))

    def prefilter(batch: pa.Table) -> pa.Table:
        withb = add_lsh_bucket_batch(batch, planes, emb_col)
        keep = np.isin(withb["lsh_bucket"].to_numpy(zero_copy_only=False), probe_arr)
        return withb.filter(pa.array(keep))

    pruned = ds.map_batches(prefilter, batch_format="pyarrow", zero_copy_batch=True)
    return ann_brute_force(pruned, queries, k, id_col=id_col, emb_col=emb_col)


def embedding_near_dups(ds, threshold: float = 0.95, nbits: int = 12, id_col: str = "vec_id",
                        emb_col: str = "embedding"):
    """Near-duplicate (cosine >= threshold) pairs via LSH buckets: bucket
    groupby, in-bucket chained-pair compare (sorted by id), exact cosine."""
    planes_holder: dict[int, np.ndarray] = {}

    def bucketize(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, emb_col)
        if not planes_holder:
            planes_holder[0] = hyperplanes(m.shape[1], nbits)
        withb = add_lsh_bucket_batch(batch, planes_holder[0], emb_col)
        return withb.select([id_col, emb_col, "lsh_bucket"])

    def bucket_pairs(g: pd.DataFrame, cap: int = 4096) -> pd.DataFrame:
        """ALL pairs within the bucket (one matmul) — a pair detector must not
        miss pairs separated by unrelated ids, unlike dedup's chained pairing
        which only needs connectivity. Buckets above ``cap`` rows fall back to
        sorted-adjacent chaining (quadratic guard for degenerate buckets)."""
        g = g.sort_values(id_col, kind="stable")
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        m = _normalize(np.stack([np.asarray(e, dtype=np.float32) for e in g[emb_col]]))
        ids = g[id_col].to_numpy()
        if len(g) <= cap:
            sim = m @ m.T
            ia, ib = np.nonzero(np.triu(sim >= threshold, k=1))
            return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib],
                                 "cosine": sim[ia, ib].astype(np.float64)})
        cos = (m[:-1] * m[1:]).sum(axis=1)
        keep = cos >= threshold
        return pd.DataFrame({"id_a": ids[:-1][keep], "id_b": ids[1:][keep],
                             "cosine": cos[keep].astype(np.float64)})

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lsh_bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


def kmeans_lite(sample: np.ndarray, n_centroids: int, iters: int = 8, seed: int = 7) -> np.ndarray:
    """Deterministic small k-means on a driver-side SAMPLE (normalized rows,
    cosine ~ dot). At 100 TB the sample is ds.random_sample output — training
    never touches the full corpus."""
    rng = np.random.default_rng(seed)
    m = _normalize(sample.astype(np.float32))
    idx = rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)
    cents = m[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                cents[c] = m[mask].mean(axis=0)
        cents = _normalize(cents)
    return cents


def ann_ivf(ds, queries: np.ndarray, k: int = 5, n_centroids: int = 16, nprobe: int = 4,
            sample_fraction: float = 1.0, id_col: str = "vec_id", emb_col: str = "embedding"):
    """IVF ANN — the coarse-quantizer scale path: centroids trained on a
    sample, every vector assigned to its nearest centroid (one matmul per
    batch against the broadcast centroid matrix), queries probe only the
    ``nprobe`` nearest inverted lists, exact cosine re-rank inside them.

    Partitioning assumption: ~uniform list sizes; skewed corpora need more
    centroids (or spilling hot lists), mirroring salt-and-split for tiles."""
    sampled = ds.random_sample(sample_fraction, seed=7) if 0 < sample_fraction < 1 else ds
    stabs = [
        _normalize(_batch_matrix(b, emb_col))
        for b in sampled.limit(10_000).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    cents = kmeans_lite(np.vstack(stabs), n_centroids)

    q = _normalize(np.asarray(queries, dtype=np.float32))
    probe_lists = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    probe_set = np.unique(probe_lists)

    def prefilter(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, emb_col))
        assign = np.argmax(m @ cents.T, axis=1)
        keep = np.isin(assign, probe_set)
        return batch.filter(pa.array(keep))

    pruned = ds.map_batches(prefilter, batch_format="pyarrow", zero_copy_batch=True)
    return ann_brute_force(pruned, queries, k, id_col=id_col, emb_col=emb_col)


# --- round 3: distributed k-means + SemDeDup-style semantic dedup -------------


def kmeans_distributed(ds, n_centroids: int = 16, iters: int = 5,
                       emb_col: str = "embedding", seed: int = 7):
    """Full-data Lloyd's iterations, the scale shape: centroids broadcast
    (closure, k x d floats), each batch does ONE matmul assignment and emits
    per-centroid partial sums EXPLODED to (cluster, dim, s) rows plus
    (cluster, n) counts — k*(d+1) slim rows per batch, tree-merged by
    partial_groupby; the driver sees only k*d merged floats per iteration,
    independent of corpus size. Initialization: kmeans_lite on a bounded
    driver sample (deterministic given seed).

    Returns the (k, d) float32 centroid matrix (unit-normalized rows, cosine
    geometry throughout, matching ann_ivf)."""
    from .agg import partial_groupby

    sample = [
        _normalize(_batch_matrix(b, emb_col))
        for b in ds.limit(10_000).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    cents = kmeans_lite(np.vstack(sample), n_centroids, seed=seed)

    for _ in range(iters):
        c = cents  # bind current value into the batch closure

        def partials(batch: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(batch, emb_col)).astype(np.float64)
            assign = np.argmax(m @ c.T.astype(np.float64), axis=1)
            k, d = c.shape
            sums = np.zeros((k, d))
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            cl = np.repeat(np.arange(k, dtype=np.int64), d)
            dim = np.tile(np.arange(d, dtype=np.int64), k)
            t = pa.table({
                "cluster": pa.array(np.r_[cl, np.arange(k)], pa.int64()),
                "dim": pa.array(np.r_[dim, np.full(k, -1)], pa.int64()),
                "s": pa.array(np.r_[sums.ravel(),
                                    counts.astype(np.float64)], pa.float64()),
            })
            return t

        merged = partial_groupby(
            ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True),
            ["cluster", "dim"], [("s", "sum", "s")],
        ).to_pandas()
        k, d = cents.shape
        sums = np.zeros((k, d))
        counts = np.zeros(k)
        for row in merged.itertuples():
            if row.dim < 0:
                counts[row.cluster] = row.s
            else:
                sums[row.cluster, row.dim] = row.s
        nz = counts > 0
        new = cents.astype(np.float64).copy()
        new[nz] = sums[nz] / counts[nz, None]
        cents = _normalize(new.astype(np.float32))
    return cents


def kmeans_assign(ds, cents: np.ndarray, id_col: str = "vec_id",
                  emb_col: str = "embedding"):
    """Adds `cluster` (nearest centroid by cosine) — one matmul per batch."""

    def assign(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, emb_col))
        a = np.argmax(m @ cents.T, axis=1).astype(np.int64)
        return batch.append_column("cluster", pa.array(a, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def semantic_dedup(ds, threshold: float = 0.97, n_centroids: int = 16,
                   iters: int = 3, id_col: str = "vec_id",
                   emb_col: str = "embedding", cap: int = 8192):
    """SemDeDup-style semantic deduplication (published recipe: k-means the
    embedding space, deduplicate WITHIN clusters only): distributed k-means
    -> groupby(cluster) -> in-cluster pairwise cosine; of any group of
    mutual near-duplicates the MIN id survives. Returns (id, cluster, keep).

    Pairwise work is per-cluster, never corpus-global; `cap` bounds the
    per-cluster matrix (oversized clusters are processed in sorted-id chunks
    against the running keeper set — deterministic, slightly conservative
    across chunk borders, documented)."""
    cents = kmeans_distributed(ds, n_centroids=n_centroids, iters=iters,
                               emb_col=emb_col)
    assigned = kmeans_assign(ds, cents, id_col=id_col, emb_col=emb_col)

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable").reset_index(drop=True)
        m = _normalize(np.stack(
            [np.asarray(v, dtype=np.float32) for v in g[emb_col]]))
        keep = np.ones(len(g), dtype=bool)
        keepers = np.empty((0, m.shape[1]), dtype=np.float32)
        for lo in range(0, len(g), cap):
            chunk = m[lo:lo + cap]
            sim_prev = (chunk @ keepers.T) if len(keepers) else None
            sim_self = chunk @ chunk.T
            for i in range(len(chunk)):
                dup = sim_prev is not None and (sim_prev[i] >= threshold).any()
                if not dup:
                    j = np.nonzero(keep[lo:lo + i] &
                                   (sim_self[i, :i] >= threshold))[0]
                    dup = len(j) > 0
                keep[lo + i] = not dup
            keepers = np.vstack([keepers, chunk[keep[lo:lo + cap]]])
        return pd.DataFrame({
            id_col: g[id_col], "cluster": g["cluster"],
            "keep": keep,
        })

    return assigned.groupby("cluster").map_groups(
        dedup_cluster, batch_format="pandas")
