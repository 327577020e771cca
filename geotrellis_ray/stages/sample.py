"""Deterministic stratified sampling — the corpus-rebalancing step of a
training-data pipeline (down-weight over-represented domains/sources to a
target mix; e.g. the Pile / Gopher / DCLM mixing recipes). No GeoTrellis
counterpart (SURVEY.md §2: LLM-data first-class addition).

Scale shape: a pure per-batch map — the per-group keep-rates are a SMALL
dict captured in the closure (domain/source cardinality is thousands at
100 TB, not corpus-sized), the keep decision is a vectorized integer hash
of the row id, and no shuffle happens at all. Deterministic: the same row
always makes the same decision, so reruns / resumed shards agree — unlike
``Dataset.random_sample``, which cannot be replayed or SQL-checked.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_M32 = np.uint64(0xFFFFFFFF)
_C1 = np.uint64(2654435761)   # Knuth multiplicative
_C2 = np.uint64(0x45D9F3B)    # xorshift-multiply finalizer round
_S16 = np.uint64(16)


def mix32(ids: np.ndarray) -> np.ndarray:
    """Vectorized 32-bit integer mix: multiply / xorshift / multiply /
    xorshift under uint64, masked to 32 bits each round. Every step is plain
    BIGINT arithmetic so a SQL oracle can reproduce it bit-for-bit
    (DuckDB: ``xor((id * 2654435761) % 4294967296, ... >> 16)`` etc.)."""
    h = (ids.astype(np.uint64) * _C1) & _M32
    h ^= h >> _S16
    h = (h * _C2) & _M32
    h ^= h >> _S16
    return h


def sql_mix32(expr: str) -> str:
    """The DuckDB expression computing mix32(expr) — kept next to the numpy
    implementation so the two cannot drift. All intermediates fit BIGINT
    (max 2^32 * 2^27 < 2^63)."""
    h1 = f"xor(({expr} * 2654435761) % 4294967296, (({expr} * 2654435761) % 4294967296) >> 16)"
    h2 = f"(({h1}) * {int(_C2)}) % 4294967296"
    return f"xor({h2}, ({h2}) >> 16)"


def stratified_sample(ds, group_col: str, rates: dict, id_col: str,
                      default_bp: int = 10_000):
    """Keep each row iff ``mix32(id) % 10000 < rates[group]`` — ``rates``
    maps group value -> keep-rate in basis points (0..10000). Groups absent
    from ``rates`` keep ``default_bp``. Adds a ``kept`` reason column is NOT
    needed: rows are filtered, the survivors keep their full schema."""
    keys = np.array(sorted(rates), dtype=object)
    vals = np.array([int(rates[k]) for k in keys], dtype=np.int64)

    def keep_batch(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return b
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = np.asarray(b[group_col].to_numpy(zero_copy_only=False), dtype=object)
        pos = np.searchsorted(keys, grp)
        pos_c = np.clip(pos, 0, len(keys) - 1)
        hit = keys[pos_c] == grp if len(keys) else np.zeros(n, dtype=bool)
        bp = np.where(hit, vals[pos_c] if len(keys) else 0, default_bp)
        keep = (mix32(ids) % np.uint64(10_000)).astype(np.int64) < bp
        return b.filter(pa.array(keep))

    return ds.map_batches(keep_batch, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample_topk(ds, id_col: str, weight_col: str, k: int):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): row i gets key ln(u_i) / w_i with u_i =
    (mix32(id)+0.5) / 2^32 — the k LARGEST keys are the sample, each row's
    inclusion probability proportional to its weight. Deterministic (same
    id -> same u), so reruns agree and a SQL oracle can reproduce the
    selection with the identical ln expression.

    Scale shape: per-batch vectorized keys + partial top-k (argpartition),
    then a single-block final merge of the tiny k-per-block partials —
    exactly the grouped-top-k pattern, selection-volume never exceeds
    k x #blocks."""

    def partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({id_col: pa.array([], b[id_col].type),
                             weight_col: pa.array([], b[weight_col].type),
                             "es_key": pa.array([], pa.float64())})
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u = (mix32(ids).astype(np.float64) + 0.5) / 4294967296.0
        key = np.log(u) / w
        if n > k:
            top = np.argpartition(key, n - k)[n - k:]
        else:
            top = np.arange(n)
        return pa.table({id_col: pa.array(ids[top], pa.int64()),
                         weight_col: pa.array(w[top], pa.float64()),
                         "es_key": pa.array(key[top], pa.float64())})

    def final(b: pa.Table) -> pa.Table:
        key = b["es_key"].to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -key))[:k]  # key DESC, id ASC tie-break
        return b.take(pa.array(np.sort(order)))

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return part.repartition(1).map_batches(final, batch_format="pyarrow",
                                           zero_copy_batch=True, batch_size=None)
