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
                    emb_col: str = "embedding", metric: str = "cosine"):
    """Exact top-k for a (nq, d) query matrix -> Dataset (query_id, rank,
    id, cosine|dist|dot). metric: "cosine" (normalized dot, descending),
    "sqeuclid" (squared L2 via the ||q||^2 - 2 q.m + ||m||^2 expansion —
    still one matmul per batch, ascending; on integer-valued embeddings
    every distance is integer-exact in float64, which is what lets the
    q_ann_sqeuclid SQL oracle replay it bit-for-bit), or "dot" (maximum
    inner product search, descending — integer-exact the same way,
    q_ann_dot)."""
    if metric not in ("cosine", "sqeuclid", "dot"):
        raise ValueError(f"unknown metric {metric!r}")
    score_col = {"cosine": "cosine", "sqeuclid": "dist", "dot": "dot"}[metric]
    if metric == "cosine":
        qn = _normalize(np.asarray(queries, dtype=np.float32))
    else:
        qn = np.asarray(queries, dtype=np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        if metric == "cosine":
            m = _normalize(_batch_matrix(batch, emb_col))
            sims = -(qn @ m.T)  # negate: top-k below is "smallest first"
        elif metric == "dot":
            # maximum inner product (MIPS): float64 matmul — on
            # integer-valued embeddings every score is integer-exact
            # (products < 2^53 sum exactly in any order), the q_ann_dot
            # SQL oracle's lever
            m = _batch_matrix(batch, emb_col).astype(np.float64)
            sims = -(qn @ m.T)
        else:
            m = _batch_matrix(batch, emb_col).astype(np.float64)
            sims = (qn * qn).sum(1)[:, None] - 2.0 * (qn @ m.T) + (m * m).sum(1)[None, :]
        ids = batch[id_col]
        kk = min(k, sims.shape[1])
        part = np.argpartition(sims, kk - 1, axis=1)[:, :kk]  # (nq, kk)
        out_q = np.repeat(np.arange(len(qn), dtype=np.int64), kk)
        out_i = part.ravel()
        out_s = np.take_along_axis(sims, part, axis=1).ravel().astype(np.float64)
        if metric in ("cosine", "dot"):
            out_s = -out_s
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: ids.take(pa.array(out_i, pa.int64())),
                score_col: pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([score_col, id_col],
                          ascending=[metric == "sqeuclid", True], kind="stable").head(k)
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
                   emb_col: str = "embedding", cap: int = 8192,
                   split_above: int = 65536, split_bits_max: int = 12):
    """SemDeDup-style semantic deduplication (published recipe: k-means the
    embedding space, deduplicate WITHIN clusters only): distributed k-means
    -> groupby(cluster) -> in-cluster pairwise cosine; of any group of
    mutual near-duplicates the MIN id survives. Returns (id, cluster, keep).

    Pairwise work is per-cluster, never corpus-global; `cap` bounds the
    per-cluster matrix (oversized clusters are processed in sorted-id chunks
    against the running keeper set — deterministic, slightly conservative
    across chunk borders, documented).

    Skew guard (VERDICT r03 finding #3): the in-cluster pass is quadratic in
    cluster size, so a skewed k-means (one mega-cluster) degrades to
    near-all-pairs. Clusters above ``split_above`` members are subdivided by
    a secondary LSH sign-bit code (deterministic hyperplanes, enough bits to
    bring the EXPECTED subcluster under the threshold, capped at
    ``split_bits_max``) and deduped per (cluster, subcode) — candidate
    comparisons never leave a subcluster. Identical/near-identical vectors
    share all sign bits, so true duplicates stay co-bucketed; a near-dup pair
    straddling a hyperplane survives the filter (the documented recall cost
    of banding — SemDeDup is itself an approximation)."""
    from .agg import partial_groupby

    cents = kmeans_distributed(ds, n_centroids=n_centroids, iters=iters,
                               emb_col=emb_col)
    assigned = kmeans_assign(ds, cents, id_col=id_col, emb_col=emb_col)

    # slim per-cluster census (cluster ids only shuffle) -> which clusters
    # exceed the quadratic budget and how many sign bits each needs
    sizes = partial_groupby(
        assigned.map_batches(lambda b: b.select(["cluster"]),
                             batch_format="pyarrow", zero_copy_batch=True),
        ["cluster"], [("cluster", "count", "n")]).take_all()
    big_bits = {
        int(r["cluster"]): min(split_bits_max,
                               max(1, int(np.ceil(np.log2(r["n"] / split_above)))))
        for r in sizes if r["n"] > split_above
    }
    if big_bits:
        planes = hyperplanes(cents.shape[1], split_bits_max)
        weights = (1 << np.arange(split_bits_max, dtype=np.int64))

        def subsplit(batch: pa.Table) -> pa.Table:
            cl = batch["cluster"].to_numpy(zero_copy_only=False)
            sub = np.zeros(len(cl), dtype=np.int64)
            hot = np.isin(cl, np.fromiter(big_bits, dtype=np.int64, count=len(big_bits)))
            if hot.any():
                m = _normalize(_batch_matrix(batch, emb_col))[hot]
                bits = (m @ planes.T.astype(np.float32)) >= 0
                codes = bits @ weights  # full-width code
                nb = np.array([big_bits[int(c)] for c in cl[hot]], dtype=np.int64)
                sub[hot] = codes & ((np.int64(1) << nb) - 1)  # per-cluster width
            return batch.append_column("sub", pa.array(sub, pa.int64()))

        assigned = assigned.map_batches(subsplit, batch_format="pyarrow",
                                        zero_copy_batch=True)
    else:
        assigned = assigned.map_batches(
            lambda b: b.append_column("sub", pa.array(np.zeros(b.num_rows, np.int64), pa.int64())),
            batch_format="pyarrow", zero_copy_batch=True)

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

    return assigned.groupby(["cluster", "sub"]).map_groups(
        dedup_cluster, batch_format="pandas")


# --- Product Quantization (round 3) ------------------------------------------

def _lloyd_euclid(sample: np.ndarray, k: int, iters: int = 15, seed: int = 5) -> np.ndarray:
    """Plain Euclidean Lloyd on a driver-side sample (PQ codebooks are
    trained on a sample by construction — Jégou et al. 2011)."""
    rng = np.random.default_rng(seed)
    k = min(k, len(sample))
    cents = sample[np.sort(rng.choice(len(sample), size=k, replace=False))].astype(np.float64)
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                cents[c] = sample[mask].mean(axis=0)
    return cents.astype(np.float32)


def pq_train(sample: np.ndarray, m: int = 8, ksub: int = 256,
             iters: int = 15, seed: int = 5) -> np.ndarray:
    """(n, d) sample -> (m, ksub, d/m) PQ codebooks: independent Euclidean
    k-means per subspace (the classical product quantizer, Jégou/Douze/
    Schmid 2011 — public method, from-spec)."""
    sample = np.asarray(sample, dtype=np.float32)
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by {m} subspaces")
    dsub = d // m
    ksub = min(ksub, n)
    books = np.empty((m, ksub, dsub), dtype=np.float32)
    for j in range(m):
        books[j] = _lloyd_euclid(sample[:, j * dsub:(j + 1) * dsub], ksub,
                                 iters, seed + j)
    return books


def pq_encode_matrix(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) -> (n, m) uint8/uint16 codes: per-subspace nearest centroid via
    the ||x||^2 - 2x.c + ||c||^2 expansion (one matmul per subspace)."""
    m, ksub, dsub = books.shape
    n = mat.shape[0]
    codes = np.empty((n, m), dtype=np.uint16 if ksub > 256 else np.uint8)
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub].astype(np.float32)
        c = books[j]
        d = -2.0 * (sub @ c.T) + (c * c).sum(axis=1)[None, :]
        codes[:, j] = np.argmin(d, axis=1)
    return codes


def pq_decode(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    m, ksub, dsub = books.shape
    out = np.empty((codes.shape[0], m * dsub), dtype=np.float32)
    for j in range(m):
        out[:, j * dsub:(j + 1) * dsub] = books[j][codes[:, j].astype(np.int64)]
    return out


def pq_encode(ds, books: np.ndarray, id_col: str = "vec_id",
              emb_col: str = "embedding"):
    """-> Dataset (id_col, codes fixed_size_list<uint8>[m]): each vector
    compressed d*4 bytes -> m bytes (the 100-TB memory lever: a billion
    64-d float32 vectors = 256 GB raw, 8 GB PQ-coded)."""
    import ray

    ref = ray.put(books)

    def enc(batch: pa.Table) -> pa.Table:
        bks = ray.get(ref)
        codes = pq_encode_matrix(_batch_matrix(batch, emb_col), bks)
        flat = pa.array(codes.ravel(), pa.uint8())
        return pa.table({
            id_col: batch[id_col],
            "codes": pa.FixedSizeListArray.from_arrays(flat, codes.shape[1]),
        })

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)


def pq_search(codes_ds, queries: np.ndarray, books: np.ndarray, k: int = 5,
              id_col: str = "vec_id"):
    """ADC search over PQ codes: per query a (m, ksub) lookup table of
    subspace distances, per batch m vectorized gathers + partial top-k;
    only k rows per (query, block) shuffle. ADC(q, codes) is EXACTLY
    ||q - decode(codes)||^2 (the identity the tests assert).
    -> Dataset (query_id, rank, id_col, adc_dist)."""
    import ray

    q = np.asarray(queries, dtype=np.float32)
    m, ksub, dsub = books.shape
    lut = np.empty((len(q), m, ksub), dtype=np.float64)
    for j in range(m):
        qs = q[:, j * dsub:(j + 1) * dsub]
        diff = qs[:, None, :] - books[j][None, :, :]
        lut[:, j, :] = (diff.astype(np.float64) ** 2).sum(axis=2)
    lut_ref = ray.put(lut)

    def partial(batch: pa.Table) -> pa.Table:
        lt = ray.get(lut_ref)
        arr = batch["codes"].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0)
        codes = arr.values.to_numpy(zero_copy_only=False).reshape(len(arr), m)
        dist = np.zeros((lt.shape[0], codes.shape[0]))
        for j in range(m):
            dist += lt[:, j, :][:, codes[:, j].astype(np.int64)]
        kk = min(k, dist.shape[1])
        part = np.argpartition(dist, kk - 1, axis=1)[:, :kk]
        out_q = np.repeat(np.arange(lt.shape[0], dtype=np.int64), kk)
        out_i = part.ravel()
        out_d = np.take_along_axis(dist, part, axis=1).ravel()
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            id_col: batch[id_col].take(pa.array(out_i, pa.int64())),
            "adc_dist": pa.array(out_d, pa.float64()),
        })

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adc_dist", id_col], ascending=[True, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        codes_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
    )


def pq_search_rerank(ds, queries: np.ndarray, books: np.ndarray, k: int = 5,
                     k_cand: int = 100, id_col: str = "vec_id",
                     emb_col: str = "embedding"):
    """The standard PQ pipeline (coarse ADC scan -> exact re-rank): ADC over
    the compressed codes yields k_cand candidates per query; only those
    candidates' ORIGINAL vectors (nq x k_cand rows, bounded) are pulled and
    re-ranked exactly. -> pandas (query_id, rank, id_col, dist)."""
    q = np.asarray(queries, dtype=np.float64)
    codes = pq_encode(ds, books, id_col, emb_col)
    cand = pq_search(codes, q, books, k=k_cand, id_col=id_col).to_pandas()
    cand_ids = np.sort(np.unique(cand[id_col].to_numpy()))

    def pull(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(cand_ids, ids), 0, len(cand_ids) - 1)
        keep = cand_ids[pos] == ids
        return batch.filter(pa.array(keep))

    # candidate-sized driver pull by contract (nq * k_cand rows)
    sub = ds.map_batches(pull, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    emb = np.stack(sub[emb_col].to_numpy()).astype(np.float64)
    ids = sub[id_col].to_numpy()
    order_ids = {int(v): i for i, v in enumerate(ids)}
    rows = []
    for qi, grp in cand.groupby("query_id"):
        gi = np.array([order_ids[int(v)] for v in grp[id_col]], dtype=np.int64)
        d = ((q[int(qi)][None, :] - emb[gi]) ** 2).sum(axis=1)
        top = np.lexsort((ids[gi], d))[:k]
        for r, t in enumerate(top, 1):
            rows.append((int(qi), r, int(ids[gi[t]]), float(d[t])))
    return pd.DataFrame(rows, columns=["query_id", "rank", id_col, "dist"])


class HNSWIndex:
    """From-spec HNSW graph (Malkov & Yashunin 2016, arXiv:1603.09320) over
    a normalized vector set — pure numpy, deterministic: levels derive from
    mix32(vec_id) (no RNG state), insertion is in ascending id order, and
    every distance tie breaks by id. Plain M-nearest neighbor selection
    (the paper's simple variant; the diversity heuristic is an accuracy
    refinement, not a correctness requirement).

    Scale role: ONE graph per partition/actor — build in ``__init__``
    (once), search per batch; cross-partition results merge through the
    same grouped top-k as IVF/LSH. This in-process index is the per-actor
    unit, not a global structure."""

    def __init__(self, vectors: np.ndarray, ids: np.ndarray, M: int = 8,
                 ef_construction: int = 64):
        from .sample import mix32

        order = np.argsort(ids, kind="stable")
        self.vecs = _normalize(np.asarray(vectors, np.float32))[order]
        self.ids = np.asarray(ids, np.int64)[order]
        n = len(self.ids)
        self.M = M
        self.M0 = 2 * M
        self.ef_c = ef_construction
        mL = 1.0 / np.log(M)
        u = (mix32(self.ids).astype(np.float64) + 0.5) / 4294967296.0
        self.levels = np.minimum((-np.log(u) * mL).astype(np.int64), 24)
        self.max_level = int(self.levels.max(initial=0)) if n else 0
        # adjacency: one list-of-arrays per level
        self.nbrs: list[list[np.ndarray]] = [
            [np.empty(0, np.int64) for _ in range(n)]
            for _ in range(self.max_level + 1)
        ]
        self.entry = -1
        for i in range(n):
            self._insert(i)

    def _dist(self, q: np.ndarray, idx: np.ndarray) -> np.ndarray:
        return 1.0 - self.vecs[idx] @ q

    def _search_layer(self, q: np.ndarray, entry: int, ef: int, level: int):
        """-> (indices, dists) of the ef closest found from entry."""
        import heapq

        d0 = float(self._dist(q, np.array([entry]))[0])
        visited = {entry}
        cand = [(d0, entry)]            # min-heap of frontier
        best = [(-d0, entry)]           # max-heap of current ef best
        while cand:
            d, c = heapq.heappop(cand)
            if d > -best[0][0] and len(best) >= ef:
                break
            nb = self.nbrs[level][c]
            fresh = [int(x) for x in nb if int(x) not in visited]
            if not fresh:
                continue
            visited.update(fresh)
            nd = self._dist(q, np.asarray(fresh, np.int64))
            for dd, x in zip(nd, fresh):
                dd = float(dd)
                if len(best) < ef or dd < -best[0][0]:
                    heapq.heappush(cand, (dd, x))
                    heapq.heappush(best, (-dd, x))
                    if len(best) > ef:
                        heapq.heappop(best)
        idxs = np.asarray([b[1] for b in best], np.int64)
        ds_ = np.asarray([-b[0] for b in best], np.float64)
        o = np.lexsort((self.ids[idxs], ds_))
        return idxs[o], ds_[o]

    def _select(self, idxs: np.ndarray, dists: np.ndarray, m: int) -> np.ndarray:
        """The paper's SELECT-NEIGHBORS-HEURISTIC (Alg. 4): take a candidate
        only if it is closer to q than to every already-selected neighbor —
        keeps edges DIVERSE so clustered data stays one connected graph
        (plain m-nearest saturates hubs with same-cluster edges and
        fragments the graph: measured recall@10 0.69 -> ~1.0 on the
        planted-cluster fixture). Pruned candidates backfill (keepPruned)."""
        if len(idxs) <= 1:
            return idxs[:m]
        sel: list[int] = []
        pruned: list[int] = []
        for c, dq in zip(idxs, dists):
            if len(sel) >= m:
                break
            c = int(c)
            if sel:
                d_sel = self._dist(self.vecs[c], np.asarray(sel, np.int64))
                if float(d_sel.min()) < float(dq):
                    pruned.append(c)
                    continue
            sel.append(c)
        for c in pruned:
            if len(sel) >= m:
                break
            sel.append(c)
        return np.asarray(sel, np.int64)

    def _insert(self, i: int):
        if self.entry < 0:
            self.entry = i
            return
        q = self.vecs[i]
        lvl = int(self.levels[i])
        ep = self.entry
        for level in range(int(self.levels[self.entry]), lvl, -1):
            if level <= self.max_level:
                idxs, _ = self._search_layer(q, ep, 1, level)
                ep = int(idxs[0])
        for level in range(min(lvl, int(self.levels[self.entry])), -1, -1):
            idxs, dists = self._search_layer(q, ep, self.ef_c, level)
            m = self.M0 if level == 0 else self.M
            sel = self._select(idxs, dists, m)
            self.nbrs[level][i] = sel
            cap = self.M0 if level == 0 else self.M
            for x in sel:
                x = int(x)
                cur = np.append(self.nbrs[level][x], i)
                if len(cur) > cap:
                    d = self._dist(self.vecs[x], cur)
                    o = np.lexsort((self.ids[cur], d))
                    cur = self._select(cur[o], d[o], cap)  # diverse prune
                self.nbrs[level][x] = cur
            ep = int(idxs[0])
        if lvl > int(self.levels[self.entry]):
            self.entry = i

    def search(self, q: np.ndarray, k: int, ef_search: int = 32):
        """-> (ids, cosines) of ~k nearest by cosine, best first."""
        if self.entry < 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        q = np.asarray(q, np.float32)
        q = q / (np.linalg.norm(q) or 1.0)
        ep = self.entry
        for level in range(int(self.levels[self.entry]), 0, -1):
            idxs, _ = self._search_layer(q, ep, 1, level)
            ep = int(idxs[0])
        idxs, dists = self._search_layer(q, ep, max(ef_search, k), 0)
        idxs, dists = idxs[:k], dists[:k]
        return self.ids[idxs], 1.0 - dists


def ann_hnsw(ds, queries: np.ndarray, k: int = 5, M: int = 8,
             ef_construction: int = 64, ef_search: int = 32,
             id_col: str = "vec_id", emb_col: str = "embedding"):
    """HNSW ANN -> Dataset (query_id, rank, id, cosine): one graph built
    per BLOCK (batch_size=None — at cluster scale this is the per-actor
    partition graph), all queries searched against each graph, per-graph
    candidates merged by the same grouped top-k as the other ANN variants.
    Approximate: recall depends on M/ef (pytest pins >= 0.9 on planted
    clusters); deterministic for a fixed partitioning."""
    import pandas as pd

    q = np.asarray(queries, dtype=np.float32)

    def per_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        idx = HNSWIndex(_batch_matrix(batch, emb_col),
                        batch[id_col].to_numpy(zero_copy_only=False),
                        M=M, ef_construction=ef_construction)
        out_q, out_i, out_s = [], [], []
        for qi in range(len(q)):
            ids, cos = idx.search(q[qi], k, ef_search)
            out_q.append(np.full(len(ids), qi, np.int64))
            out_i.append(ids)
            out_s.append(cos)
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q) if out_q else [], pa.int64()),
            id_col: pa.array(np.concatenate(out_i) if out_i else [], pa.int64()),
            "cosine": pa.array(np.concatenate(out_s) if out_s else [], pa.float64()),
        })

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True],
                          kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (ds.map_batches(per_block, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
            .groupby("query_id")
            .map_groups(final_topk, batch_format="pandas"))
