"""Partial (combiner) aggregation — the scale pattern for low-cardinality
groupbys (GeoTrellis's combineByKey with map-side combine; SURVEY.md §2.5).

``partial_groupby`` aggregates each Arrow batch locally with
``pa.Table.group_by`` (vectorized, zero shuffle), so the all-to-all exchange
moves only ~(#groups x #blocks) partial rows instead of the full input. At
10^12 rows with a handful of groups this is the difference between shuffling
terabytes and shuffling kilobytes.

Supported specs: ("col", "sum"), ("col", "min"), ("col", "max"),
("col", "count" -> output alias counts rows). Output column names are the
aliases given, matching the oracle SQL exactly.
"""

from __future__ import annotations

import pyarrow as pa


def _batch_partial(batch: pa.Table, keys: list[str], specs: list[tuple[str, str, str]]) -> pa.Table:
    """One batch -> per-key partial rows. specs = [(col, fn, alias)]."""
    if batch.num_rows == 0:
        def _promoted(col: str, fn: str) -> pa.DataType:
            # match Arrow group_by's aggregate output types so empty blocks
            # don't emit a mismatched schema (sum promotes: int->int64,
            # uint->uint64, float32->float64; min/max keep the input type)
            t = batch.schema.field(col).type
            if fn == "count":
                return pa.int64()
            if fn == "sum":
                if pa.types.is_unsigned_integer(t):
                    return pa.uint64()
                if pa.types.is_integer(t):
                    return pa.int64()
                if pa.types.is_floating(t):
                    return pa.float64()
            return t

        fields = [(k, batch.schema.field(k).type) for k in keys] + [
            (alias, _promoted(col, fn)) for col, fn, alias in specs
        ]
        return pa.table({n: pa.array([], t) for n, t in fields})
    aggs = [(keys[0], "count") if fn == "count" else (col, fn) for col, fn, _ in specs]
    cols = list(dict.fromkeys(keys + [c for c, _ in aggs]))
    res = batch.select(cols).group_by(keys).aggregate(aggs)
    # arrow names outputs "<col>_<fn>" in agg order, keys after; remap to aliases
    out_names = []
    spec_iter = iter(specs)
    for n in res.schema.names:
        out_names.append(n if n in keys else next(spec_iter)[2])
    return res.rename_columns(out_names)


def partial_groupby(ds, keys, specs, final: str = "shuffle"):
    """ds.groupby(keys) with map-side combine.

    specs: list of (col, fn, alias) with fn in {sum,min,max,count}.
    Count partials re-aggregate as sum; min/max/sum are self-mergeable.
    Returns a Dataset with columns keys + aliases.

    ``final`` picks the last merge:
    - "shuffle": Ray's sort-based groupby over the partial rows — unbounded
      group cardinality, but pays the all-to-all machinery (~5 s fixed floor
      on small inputs, measured).
    - "single": repartition(1) + one whole-block Arrow group_by — 2x+ faster
      end-to-end when the group count is BOUNDED (measured 7.5 s -> 3.4 s on
      the flagship). Contract: all final groups must fit one block (fine for
      tile/cell/polygon keys; WRONG for unbounded keys like dedup pair ids).
    - "sort": single-key UNBOUNDED-cardinality merge via sort_group_aggregate
      (ONE range sort + vectorized segment reduce + O(#blocks) edge stitch) —
      sidesteps the ~300x per-group overhead Ray's Aggregate pays when
      #groups ~ #rows (r5 rehearsal finding, see sort_group_aggregate).
      Requires len(keys)==1 and numeric agg columns; key may be any sortable
      type including strings (segment boundaries via numpy object compare).
    """
    from ray.data.aggregate import Max, Min, Sum

    keys = list(keys)
    specs = [tuple(s) for s in specs]
    if not keys:
        # global (keyless) aggregate: constant dummy key, dropped at the end
        ds = ds.map_batches(
            lambda b: b.append_column("__g", pa.array([0] * b.num_rows, pa.int8())),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        out = partial_groupby(ds, ["__g"], specs, final=final)
        return out.drop_columns(["__g"])
    partial = ds.map_batches(
        lambda b: _batch_partial(b, keys, specs),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # tree combine: coalesce many small partial blocks per task before the
    # shuffle (sort-aggregate cost scales with block count). count partials
    # re-merge as sum; min/max/sum are self-mergeable.
    merge_specs = [(alias, "sum" if fn in ("sum", "count") else fn, alias) for _c, fn, alias in specs]
    partial = partial.map_batches(
        lambda b: _batch_partial(b, keys, merge_specs),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1 << 18,
    )
    if final == "sort":
        if len(keys) != 1:
            raise ValueError("final='sort' requires a single key column")
        return sort_group_aggregate(partial, keys[0], merge_specs)
    if final == "single":
        # The bounded-cardinality contract is now ENFORCED, not just
        # documented: count the post-combine partial rows (cheap — the stream
        # is ~#groups x #tasks) and silently fall back to the shuffle path if
        # they would not comfortably fit one block (VERDICT r02 #6). The
        # materialize is fine here: partial rows are the small side by
        # construction.
        partial = partial.materialize()
        n_partial = partial.count()
        if 0 < n_partial <= _SINGLE_DRIVER_MAX_ROWS:
            # tiny partial sets: concat on the driver and merge in-process —
            # even repartition(1) pays the all-to-all operator (~0.25 s
            # measured vs ~0.1 s for the driver concat)
            import ray
            import ray.data as rd

            tab = pa.concat_tables(ray.get(partial.to_arrow_refs()))
            return rd.from_arrow(_batch_partial(tab, keys, merge_specs))
        if n_partial <= _SINGLE_FINAL_MAX_ROWS:
            # batch_size=None = the whole (single) block in one batch -> exact
            return partial.repartition(1).map_batches(
                lambda b: _batch_partial(b, keys, merge_specs),
                batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
            )
    merge = {"sum": Sum, "count": Sum, "min": Min, "max": Max}
    finals = [merge[fn](alias, alias_name=alias) for _col, fn, alias in specs]
    return partial.groupby(keys).aggregate(*finals)


# partial rows are ~tens of bytes; 4M rows is ~a few hundred MB in one block —
# the upper edge of comfortable. Above this the "single" merge falls back to
# the shuffle merge automatically.
_SINGLE_FINAL_MAX_ROWS = 4_000_000
# below this, the final merge runs on the DRIVER (concat of the materialized
# partial blocks) — a few MB at most, cheaper than even a repartition(1)
_SINGLE_DRIVER_MAX_ROWS = 65_536


def sort_group_aggregate(ds, key_col: str, specs, having_min_count: int | None = None):
    """Grouped aggregate at UNBOUNDED key cardinality (#groups ~ #rows) —
    the regime where BOTH partial_groupby paths collapse: the map-side
    combine reduces nothing (keys are near-unique) and Ray's sort-based
    Aggregate pays a ~300x per-group overhead (measured on this host,
    6.3M unique int64 keys: Dataset.sort 0.6 s vs groupby().aggregate()
    189.5 s — found by the r5 text-dedup rehearsal).

    Shape: ONE range sort on ``key_col`` -> per-block vectorized segment
    reduce (np.*.reduceat over run boundaries) -> the <=2 EDGE segments per
    block (whose key may continue in a neighboring block) are merged in a
    single tiny driver pass and unioned back. Driver traffic is O(#blocks),
    like the window/sessionize stitches.

    specs: [(col, fn, alias)] with fn in {count,sum,min,max}; agg columns
    must be numeric. ``having_min_count`` (requires a count spec) pushes
    ``count >= N`` into the blocks — interior singleton groups never leave
    the block, which is the 99% case for duplicate-gram detection."""
    import numpy as np

    specs = [tuple(s) for s in specs]
    count_aliases = [a for _c, f, a in specs if f == "count"]
    if having_min_count is not None and not count_aliases:
        raise ValueError("having_min_count requires a count spec")
    need_cols = list(dict.fromkeys(
        [key_col] + [c for c, f, _a in specs if f != "count"]))

    def block_fn(b: pa.Table) -> pa.Table:
        n = b.num_rows
        key_t = b.schema.field(key_col).type
        out_fields = [("__edge", pa.int8()), (key_col, key_t)]
        for c, f, a in specs:
            out_fields.append((a, pa.int64() if f == "count" else b.schema.field(c).type))
        if n == 0:
            return pa.table({name: pa.array([], t) for name, t in out_fields})
        keys = b[key_col].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        counts = np.diff(np.r_[starts, n])
        cols = {}
        for c, f, a in specs:
            if f == "count":
                cols[a] = counts.astype(np.int64)
                continue
            v = b[c].to_numpy(zero_copy_only=False)
            if f == "sum":
                cols[a] = np.add.reduceat(v, starts)
            elif f == "min":
                cols[a] = np.minimum.reduceat(v, starts)
            elif f == "max":
                cols[a] = np.maximum.reduceat(v, starts)
            else:
                raise ValueError(f)
        nseg = len(starts)
        edge = np.zeros(nseg, dtype=bool)
        edge[0] = True
        edge[-1] = True
        keep = ~edge
        if having_min_count is not None:
            ok = np.ones(nseg, dtype=bool)
            for a in count_aliases:
                ok &= cols[a] >= having_min_count
            keep &= ok
        sel = np.r_[np.flatnonzero(keep), np.flatnonzero(edge)]
        kind = np.r_[np.zeros(keep.sum(), np.int8), np.ones(int(edge.sum()), np.int8)]
        data = {"__edge": pa.array(kind, pa.int8()),
                key_col: pa.array(keys[starts[sel]]).cast(key_t)}
        for _c, f, a in specs:
            data[a] = pa.array(cols[a][sel])
        return pa.table(data)

    segs = (ds.map_batches(lambda b: b.select(need_cols), batch_format="pyarrow",
                           zero_copy_batch=True)
              .sort(key_col)
              .map_batches(block_fn, batch_format="pyarrow", zero_copy_batch=True)
              .materialize())
    if segs.count() == 0:
        # Ray's sort on an EMPTY dataset emits a single schema-less block;
        # anything joined against that later fails with ArrowInvalid ("no
        # match for key field"). Rebuild the declared empty output schema
        # from the input instead (also covers having_min_count filtering
        # every group). schema() on the un-sorted lineage only pulls the
        # first block.
        import ray.data as rd

        sch = ds.schema(fetch_if_missing=True)
        types = dict(zip(sch.names, sch.types))
        fields = [(key_col, types[key_col])] + [
            (a, pa.int64() if f == "count" else types[c]) for c, f, a in specs]
        return rd.from_arrow(
            pa.table({name: pa.array([], t) for name, t in fields}))
    import pyarrow.compute as pc

    interior = segs.map_batches(
        lambda b: b.filter(pc.equal(b["__edge"], 0)).drop_columns(["__edge"]),
        batch_format="pyarrow", zero_copy_batch=True)
    import ray

    edge_parts = ray.get(
        segs.filter(expr="__edge == 1").drop_columns(["__edge"]).to_arrow_refs())
    edge_all = pa.concat_tables([t for t in edge_parts if t.num_rows]) if any(
        t.num_rows for t in edge_parts) else None
    if edge_all is None or edge_all.num_rows == 0:
        return interior
    # merge edge segments per key (tiny: <=2 rows per block). After the range
    # sort a key's rows are contiguous, so edge rows with equal keys are the
    # same global group split across neighboring blocks.
    ek = edge_all[key_col].to_numpy(zero_copy_only=False)
    order = np.argsort(ek, kind="stable")
    eko = ek[order]
    starts = np.flatnonzero(np.r_[True, eko[1:] != eko[:-1]])
    merged = {key_col: pa.array(eko[starts]).cast(edge_all.schema.field(key_col).type)}
    for _c, f, a in specs:
        v = edge_all[a].to_numpy(zero_copy_only=False)[order]
        if f in ("count", "sum"):
            merged[a] = pa.array(np.add.reduceat(v, starts))
        elif f == "min":
            merged[a] = pa.array(np.minimum.reduceat(v, starts))
        else:
            merged[a] = pa.array(np.maximum.reduceat(v, starts))
    mt = pa.table(merged)
    if having_min_count is not None:
        m = None
        for a in count_aliases:
            c = pc.greater_equal(mt[a], having_min_count)
            m = c if m is None else pc.and_(m, c)
        mt = mt.filter(m)
    import ray.data as rd

    # edge-merged rows FIRST: Ray 2.49's hash join fails with ArrowInvalid
    # ("no match for key field on right side") when a join side's LEADING
    # block is empty (mid-stream empty blocks are fine — isolated r5), and
    # interior's first block IS empty whenever the first sorted block held
    # only edge segments (degenerate small inputs).
    if mt.num_rows:
        return rd.from_arrow(mt).union(interior)
    # mt empty => having_min_count filtered every edge group (every non-empty
    # block emits edge rows, so without having this is unreachable past the
    # segs.count()==0 branch). interior is then the having-filtered stream —
    # tiny for any threshold >= 2 — so repartition(1) is cheap and guarantees
    # the leading block is non-empty whenever any row survived, keeping the
    # result hash-join-safe without per-call-site contracts.
    return interior.repartition(1)


def grouped_top_k(ds, keys, order_col: str, k: int, descending: bool = True,
                  tie_col: str | None = None):
    """Per-group top-k (the ROW_NUMBER() <= k window shape) with a PARTIAL
    top-k combiner: each batch keeps at most k rows per key (vectorized
    pandas sort+head), so the shuffle moves <= k x groups x blocks rows,
    never the input; the final per-group head runs on the collapsed stream.
    Adds a ``rank`` column (1-based). Ties break on ``tie_col`` ascending."""
    import pandas as pd

    sort_cols = [order_col] + ([tie_col] if tie_col else [])
    ascending = [not descending] + ([True] if tie_col else [])

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return (df.sort_values(sort_cols, ascending=ascending, kind="stable")
                  .groupby(list(keys), sort=False).head(k))

    partial = ds.map_batches(partial_topk, batch_format="pandas")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=ascending, kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = pd.RangeIndex(1, len(g) + 1)
        return g

    return partial.groupby(list(keys)).map_groups(final_topk, batch_format="pandas")


def global_top_k(ds, order_col: str, k: int, descending: bool = True,
                 tie_col: str | None = None):
    """Global top-k (ORDER BY ... LIMIT k) with a PARTIAL top-k combiner —
    shuffle-free: each block keeps its own top-k (vectorized pandas
    sort+head), the <= k x #blocks partial rows coalesce into one block,
    and the final head runs there. Replaces the full range sort (an
    all-to-all exchange of the whole input) that LIMIT-k-via-sort pays;
    at 10^12 rows the exchange is corpus-sized while this ships k rows
    per block."""
    import pandas as pd

    sort_cols = [order_col] + ([tie_col] if tie_col else [])
    ascending = [not descending] + ([True] if tie_col else [])

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return df.sort_values(sort_cols, ascending=ascending,
                              kind="stable").head(k)

    # two map-only combine levels (per-block, then ~coalesced blocks), so
    # the driver-side final sees <= k rows per ~128k-row partial batch —
    # no repartition/sort operator anywhere (both pay the all-to-all
    # machinery floor even for k rows; measured ~2 s at bench scale)
    partial = ds.map_batches(partial_topk, batch_format="pandas")
    partial = partial.map_batches(partial_topk, batch_format="pandas",
                                  batch_size=131_072)
    import ray.data

    return ray.data.from_pandas(partial_topk(partial.to_pandas()))


def pack_token_shards(ds, budget: int, id_col: str = "doc_id",
                      tokens_col: str = "n_tokens"):
    """GPT-style sequence packing: concatenate docs in id order into one
    token stream and assign each doc the shard where it STARTS —
    shard_id = exclusive_prefix // budget, offset_in_shard =
    exclusive_prefix % budget (docs may straddle shard boundaries, the
    training-data packing convention). -> Dataset (id_col, tokens_col,
    shard_id, offset_in_shard).

    Scale shape: ONE range sort by id (a global order is inherent to
    packing), then a distributed prefix scan — pass 1 emits one
    (first_id, block_sum) row per block; the driver cumsums that
    O(#blocks) side channel; pass 2 re-maps the SAME materialized blocks
    (batch_size=None = exactly one block per task, stable across both
    passes) adding the broadcast block offset to a local cumsum. The
    driver never sees a row, only block sums."""
    import numpy as np
    import ray

    sorted_ds = ds.sort(id_col).materialize()

    def block_sum(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"first_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        t = b[tokens_col].to_numpy(zero_copy_only=False)
        return pa.table({"first_id": pa.array([int(b[id_col][0].as_py())], pa.int64()),
                         "s": pa.array([int(t.sum())], pa.int64())})

    side = sorted_ds.map_batches(block_sum, batch_format="pyarrow",
                                 zero_copy_batch=True,
                                 batch_size=None).to_pandas()
    if len(side) == 0:
        # fully-empty input: Ray's empty to_pandas() loses column names
        fids = np.empty(0, dtype=np.int64)
        block_offs = np.empty(0, dtype=np.int64)
    else:
        side = side.sort_values("first_id")
        fids = side["first_id"].to_numpy()
        block_offs = np.zeros(len(side), dtype=np.int64)
        np.cumsum(side["s"].to_numpy()[:-1], out=block_offs[1:])
    off_ref = ray.put((fids, block_offs))

    def assign(b: pa.Table) -> pa.Table:
        # appends shard_id/offset_in_shard, preserving every input column
        # (chains carry extra per-doc columns like n_dupes through packing)
        if b.num_rows == 0:
            return b.append_column(
                "shard_id", pa.array([], pa.int64())).append_column(
                "offset_in_shard", pa.array([], pa.int64()))
        fids, boffs = ray.get(off_ref)
        t = b[tokens_col].to_numpy(zero_copy_only=False).astype(np.int64)
        base = int(boffs[np.searchsorted(fids, int(b[id_col][0].as_py()))])
        ex = np.full(len(t), base, dtype=np.int64)
        ex[1:] += np.cumsum(t[:-1])
        return b.append_column(
            "shard_id", pa.array(ex // budget, pa.int64())).append_column(
            "offset_in_shard", pa.array(ex % budget, pa.int64()))

    return sorted_ds.map_batches(assign, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)


def pack_token_spans(ds, budget: int, id_col: str = "doc_id",
                     tokens_col: str = "n_tokens"):
    """Sequence packing WITH document splitting — the real pretraining
    convention (``pack_token_shards`` assigns each doc to the shard where it
    starts; this variant cuts docs at every shard boundary they straddle and
    emits one row per (doc, shard) overlap):
    (id_col, shard_id, tok_start, tok_end, offset_in_shard) with
    tok_start/tok_end the half-open token span WITHIN the doc and
    offset_in_shard where that span lands. Zero-token docs emit nothing.
    Every shard except the last is exactly ``budget`` tokens full.

    Same distributed shape as pack_token_shards: ONE range sort by id, an
    O(#blocks) block-sum side channel, then a vectorized per-block span
    explosion (np.repeat over span counts — no Python per-span loop)."""
    import numpy as np
    import ray

    sorted_ds = ds.sort(id_col).materialize()

    def block_sum(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"first_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        t = b[tokens_col].to_numpy(zero_copy_only=False)
        return pa.table({"first_id": pa.array([int(b[id_col][0].as_py())], pa.int64()),
                         "s": pa.array([int(t.sum())], pa.int64())})

    side = sorted_ds.map_batches(block_sum, batch_format="pyarrow",
                                 zero_copy_batch=True,
                                 batch_size=None).to_pandas()
    if len(side) == 0:
        fids = np.empty(0, dtype=np.int64)
        block_offs = np.empty(0, dtype=np.int64)
    else:
        side = side.sort_values("first_id")
        fids = side["first_id"].to_numpy()
        block_offs = np.zeros(len(side), dtype=np.int64)
        np.cumsum(side["s"].to_numpy()[:-1], out=block_offs[1:])
    off_ref = ray.put((fids, block_offs))

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "shard_id": pa.array([], pa.int64()),
                      "tok_start": pa.array([], pa.int64()),
                      "tok_end": pa.array([], pa.int64()),
                      "offset_in_shard": pa.array([], pa.int64())})

    def explode(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        fids_, boffs = ray.get(off_ref)
        n = b[tokens_col].to_numpy(zero_copy_only=False).astype(np.int64)
        base = int(boffs[np.searchsorted(fids_, int(b[id_col][0].as_py()))])
        start = np.full(len(n), base, dtype=np.int64)
        start[1:] += np.cumsum(n[:-1])
        end = start + n
        keep = n > 0
        ids = b[id_col].to_numpy(zero_copy_only=False)[keep]
        s0, e0, nn = start[keep], end[keep], n[keep]
        first_shard = s0 // budget
        last_shard = (e0 - 1) // budget
        counts = (last_shard - first_shard + 1)
        if counts.sum() == 0:
            return empty
        ridx = np.repeat(np.arange(len(ids)), counts)
        # span k within doc i covers shard first_shard[i] + k
        k = np.arange(len(ridx)) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
        shard = first_shard[ridx] + k
        lo = np.maximum(s0[ridx], shard * budget)          # global token lo
        hi = np.minimum(e0[ridx], (shard + 1) * budget)    # global token hi
        return pa.table({
            id_col: pa.array(np.repeat(ids, counts), pa.int64()),
            "shard_id": pa.array(shard, pa.int64()),
            "tok_start": pa.array(lo - s0[ridx], pa.int64()),
            "tok_end": pa.array(hi - s0[ridx], pa.int64()),
            "offset_in_shard": pa.array(lo - shard * budget, pa.int64()),
        })

    return sorted_ds.map_batches(explode, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)


def exact_quantiles(ds, col: str, quantiles: list[float]):
    """EXACT distributed quantiles (discrete: the smallest element whose
    cumulative fraction >= q, i.e. sorted index max(0, ceil(q*n)-1) —
    DuckDB's quantile_disc convention, verified empirically): ONE range sort
    of the single projected column, then the driver reads ONLY block
    row-counts (metadata) and fetches the handful of blocks holding the
    target indices. Never collects the column."""
    import numpy as np

    sorted_ds = ds.select_columns([col]).sort(col).materialize()
    # count() on a materialized Dataset is driver-side metadata — O(#blocks)
    total = sorted_ds.count()
    if total == 0:
        return {q: None for q in quantiles}
    want = {q: max(0, int(np.ceil(q * total)) - 1) for q in quantiles}
    # ONE public split_at_indices call carves out a 1-row Dataset per target
    # index (metadata-driven block slicing — only the blocks holding a target
    # row are touched); take(1) fetches each. No private Ray APIs (VERDICT
    # r02 #7 / ADVICE).
    idxs = sorted(set(want.values()))
    bounds: list[int] = []
    for i in idxs:
        bounds.extend((i, i + 1))
    splits = sorted_ds.split_at_indices(bounds)
    # splits alternate: [before, row_i0, gap, row_i1, gap, ...] — the 1-row
    # datasets are at positions 1, 3, 5, ...
    val_at = {}
    for j, i in enumerate(idxs):
        row = splits[2 * j + 1].take(1)[0]
        val_at[i] = float(row[col])
    return {q: val_at[want[q]] for q in quantiles}


def sort_grouped_top_k(ds, key_col: str, order_col: str, k: int,
                       descending: bool = True, tie_col: str | None = None):
    """Grouped top-k at UNBOUNDED key cardinality (#groups ~ #rows — the
    regime where grouped_top_k's map_groups pays Ray Aggregate's ~300x
    per-group overhead; see sort_group_aggregate). "Top k docs per
    canonical URL / content cluster" over a web corpus lives here.

    Shape: ONE range sort on (key, order[, tie]) — after it a group's
    global top-k are its FIRST k rows, and blocks are contiguous in global
    order, so every interior (fully-in-block) segment emits its first k
    rows directly; only the <= 2 EDGE segments per block ship their first
    k rows through the O(k * #blocks) driver side channel, where they are
    re-ranked per key and unioned back. Ship slim columns (key, order,
    id) and join payloads back by id — rows ride whole through this
    operator.

    Ties: ``tie_col`` (ascending, must make rows unique) pins the SQL
    ROW_NUMBER order; without it, ranks among equal order values are
    nondeterministic across block splits. Adds ``rank`` (1-based)."""
    import pandas as pd
    import ray
    import ray.data as rd

    if k < 1:
        raise ValueError("k must be >= 1")
    sort_cols = [key_col, order_col] + ([tie_col] if tie_col else [])
    sort_desc = [False, descending] + ([False] if tie_col else [])

    def block_fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            t = b.append_column("rank", pa.array([], pa.int64()))
            return t.append_column("__edge", pa.array([], pa.int8()))
        import numpy as np

        keys = b[key_col].to_numpy(zero_copy_only=False)
        n = len(keys)
        idx = np.arange(n, dtype=np.int64)
        seg_first = np.ones(n, dtype=bool)
        seg_first[1:] = keys[1:] != keys[:-1]
        seg_start = np.maximum.accumulate(np.where(seg_first, idx, 0))
        pos = idx - seg_start
        seg_id = np.cumsum(seg_first) - 1
        edge = (seg_id == 0) | (seg_id == seg_id[-1])
        keep = pos < k
        sel = np.flatnonzero(keep)
        t = b.take(pa.array(sel, pa.int64()))
        t = t.append_column("rank", pa.array(pos[sel] + 1, pa.int64()))
        return t.append_column("__edge", pa.array(edge[sel].astype(np.int8), pa.int8()))

    # batch_size=None: one batch per sorted BLOCK. A segment split across
    # batches is always marked edge (it is first/last in both), so smaller
    # batches stay correct — but they multiply the driver edge traffic.
    segs = (ds.sort(sort_cols, descending=sort_desc)
              .map_batches(block_fn, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)
              .materialize())
    interior = segs.filter(expr="__edge == 0").drop_columns(["__edge", "rank"])
    edge_parts = ray.get(
        segs.filter(expr="__edge == 1").drop_columns(["__edge", "rank"]).to_arrow_refs())
    edge_all = [t for t in edge_parts if t.num_rows]
    if not edge_all:
        # only possible when the input itself was empty (every non-empty
        # block's first segment is an edge and keeps >= 1 row). An empty
        # sort emits a schema-less block (same Ray 2.49 behavior
        # sort_group_aggregate works around) — rebuild the typed schema.
        sch = ds.schema(fetch_if_missing=True)
        cols = {name: pa.array([], t) for name, t in zip(sch.names, sch.types)}
        cols["rank"] = pa.array([], pa.int64())
        return rd.from_arrow(pa.table(cols))
    df = pa.concat_tables(edge_all).to_pandas()
    df = df.sort_values(sort_cols, ascending=[not d for d in sort_desc],
                        kind="mergesort").reset_index(drop=True)
    df["rank"] = df.groupby(key_col, sort=False).cumcount() + 1
    winners = pa.Table.from_pandas(df[df["rank"] <= k], preserve_index=False)

    def rerank(t: pa.Table) -> pa.Table:
        # interior segments are complete groups: their in-block position IS
        # the global rank (recomputed here so interior and edge rows share
        # one code path for the rank column's dtype/position)
        return block_fn(t).drop_columns(["__edge"])

    # batch_size=None is REQUIRED here: interior rows are whole groups
    # within their block, and a smaller batch size could split a group and
    # restart its rank
    interior_ranked = interior.map_batches(rerank, batch_format="pyarrow",
                                           zero_copy_batch=True, batch_size=None)
    # winners first: its block is non-empty, keeping the union hash-join-safe
    return rd.from_arrow(winners).union(interior_ranked)


def sort_group_count_distinct(ds, key_col: str, val_col: str):
    """EXACT grouped COUNT(DISTINCT val) at UNBOUNDED key cardinality —
    the exact sibling of the HLL sketch path (stages/stats.py) for when
    the answer must be right, not approximate (distinct users per URL,
    distinct domains per n-gram).

    Shape: ONE range sort on (key, val) makes duplicate values globally
    contiguous, so a block counts a segment's distinct values as its
    val-change boundaries (vectorized). Interior segments are complete
    groups and emit in place; the <=2 EDGE segments per block ship
    (key, n_distinct, n_rows, first_val, last_val) through the O(#blocks)
    driver side channel, where adjacent same-key segments merge with a
    -1 correction when the boundary value continues across the block cut
    (a duplicate run spanning blocks). -> Dataset (key_col, n_distinct,
    n_rows). val must be numeric/sortable."""
    import numpy as np
    import ray
    import ray.data as rd

    def block_fn(b: pa.Table) -> pa.Table:
        key_t = b.schema.field(key_col).type
        val_t = b.schema.field(val_col).type
        if b.num_rows == 0:
            return pa.table({
                "__edge": pa.array([], pa.int8()), key_col: pa.array([], key_t),
                "n_distinct": pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64()),
                "__fv": pa.array([], val_t), "__lv": pa.array([], val_t)})
        keys = b[key_col].to_numpy(zero_copy_only=False)
        vals = b[val_col].to_numpy(zero_copy_only=False)
        n = len(keys)
        idx = np.arange(n, dtype=np.int64)
        seg_first = np.ones(n, dtype=bool)
        seg_first[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(seg_first)
        ends = np.r_[starts[1:], n]
        new_val = np.ones(n, dtype=bool)
        new_val[1:] = seg_first[1:] | (vals[1:] != vals[:-1])
        cs = np.cumsum(new_val)
        nd = cs[ends - 1] - cs[starts] + 1
        nseg = len(starts)
        edge = np.zeros(nseg, dtype=bool)
        edge[0] = True
        edge[-1] = True
        sel = np.r_[np.flatnonzero(~edge), np.flatnonzero(edge)]
        kind = np.r_[np.zeros(int((~edge).sum()), np.int8),
                     np.ones(int(edge.sum()), np.int8)]
        return pa.table({
            "__edge": pa.array(kind, pa.int8()),
            key_col: pa.array(keys[starts[sel]]).cast(key_t),
            "n_distinct": pa.array(nd[sel], pa.int64()),
            "n_rows": pa.array((ends - starts)[sel], pa.int64()),
            "__fv": pa.array(vals[starts[sel]]).cast(val_t),
            "__lv": pa.array(vals[ends[sel] - 1]).cast(val_t)})

    segs = (ds.map_batches(lambda b: b.select([key_col, val_col]),
                           batch_format="pyarrow", zero_copy_batch=True)
              .sort([key_col, val_col])
              .map_batches(block_fn, batch_format="pyarrow", zero_copy_batch=True)
              .materialize())
    if segs.count() == 0:
        sch = ds.schema(fetch_if_missing=True)
        key_t = dict(zip(sch.names, sch.types))[key_col]
        return rd.from_arrow(pa.table({
            key_col: pa.array([], key_t), "n_distinct": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64())}))
    interior = segs.filter(expr="__edge == 0").drop_columns(["__edge", "__fv", "__lv"])
    edge_parts = ray.get(
        segs.filter(expr="__edge == 1").drop_columns(["__edge"]).to_arrow_refs())
    edge_all = pa.concat_tables([t for t in edge_parts if t.num_rows])
    # adjacency within a key follows the global (key, val) order, so a
    # stable sort on (key, first_val, last_val) reconstructs block order
    df = edge_all.to_pandas().sort_values(
        [key_col, "__fv", "__lv"], kind="mergesort").reset_index(drop=True)
    ks = df[key_col].to_numpy()
    fv = df["__fv"].to_numpy()
    lv = df["__lv"].to_numpy()
    nd = df["n_distinct"].to_numpy().astype(np.int64)
    nr = df["n_rows"].to_numpy().astype(np.int64)
    same = np.zeros(len(df), dtype=bool)
    if len(df) > 1:
        same[1:] = ks[1:] == ks[:-1]
    # boundary value continuing across the cut double-counts one distinct
    dup_boundary = same.copy()
    if len(df) > 1:
        dup_boundary[1:] &= fv[1:] == lv[:-1]
    grp_first = ~same
    gidx = np.cumsum(grp_first) - 1
    n_groups = int(gidx[-1]) + 1 if len(df) else 0
    out_nd = np.zeros(n_groups, np.int64)
    out_nr = np.zeros(n_groups, np.int64)
    np.add.at(out_nd, gidx, nd - dup_boundary.astype(np.int64))
    np.add.at(out_nr, gidx, nr)
    mt = pa.table({key_col: pa.array(ks[grp_first]).cast(edge_all.schema.field(key_col).type),
                   "n_distinct": pa.array(out_nd, pa.int64()),
                   "n_rows": pa.array(out_nr, pa.int64())})
    return rd.from_arrow(mt).union(interior)


def exact_grouped_quantile(ds, key_col: str, val_col: str, id_col: str,
                           q="0.5"):
    """EXACT per-group quantile at UNBOUNDED key cardinality —
    quantile_disc semantics: the element at ascending index ceil(n*q)-1
    of each group (index computed in exact rational arithmetic,
    Fraction(str(q)), which matches DuckDB bit-for-bit where float
    ceil(n*q) does not — probed: (100, 0.07)). The grouped sibling of
    exact_quantiles; median is q="0.5".

    Shape: TWO map passes over ONE materialized range sort on
    (key, val, id) — the pack_token_shards stable-blocks pattern
    (batch_size=None keeps block contents identical across passes).
    Pass 1 answers every interior (fully-in-block) group in place and
    ships an O(#blocks) side channel: per EDGE segment (key, count,
    in-block segment bounds) plus the block's first (key, val, id) row
    as its identity/order. The driver walks edge segments in block
    order, locates which block holds each spanning group's target index,
    and broadcasts {block_first_id: [(key, local_idx)]}; pass 2 re-maps
    the same blocks and gathers exactly those elements. The driver never
    sees a value row. ``id_col`` must be integer and globally unique
    (it makes the sort a total order, so block identity is unambiguous
    even inside a giant duplicate run).
    -> Dataset (key_col, q_val, n_rows)."""
    import math
    from fractions import Fraction

    import numpy as np
    import ray
    import ray.data as rd

    frac = Fraction(str(q))
    if not (0 < frac <= 1):
        raise ValueError("q must be in (0, 1]")
    p_, r_ = frac.numerator, frac.denominator

    sorted_ds = (ds.map_batches(lambda b: b.select([key_col, val_col, id_col]),
                                batch_format="pyarrow", zero_copy_batch=True)
                   .sort([key_col, val_col, id_col])
                   .materialize())

    def _segments(b: pa.Table):
        keys = b[key_col].to_numpy(zero_copy_only=False)
        n = len(keys)
        idx = np.arange(n, dtype=np.int64)
        seg_first = np.ones(n, dtype=bool)
        seg_first[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(seg_first)
        ends = np.r_[starts[1:], n]
        return keys, starts, ends

    def pass1(b: pa.Table) -> pa.Table:
        key_t = b.schema.field(key_col).type
        val_t = b.schema.field(val_col).type
        empty = pa.table({
            "kind": pa.array([], pa.int8()), key_col: pa.array([], key_t),
            "q_val": pa.array([], val_t), "n_rows": pa.array([], pa.int64()),
            "__blk": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        keys, starts, ends = _segments(b)
        vals = b[val_col].to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        cnt = ends - starts
        nseg = len(starts)
        edge = np.zeros(nseg, dtype=bool)
        edge[0] = True
        edge[-1] = True
        # interior groups: answer in place (exact rational target index)
        it = np.flatnonzero(~edge)
        tgt = (cnt[it] * p_ + r_ - 1) // r_ - 1
        interior = pa.table({
            "kind": pa.array(np.zeros(len(it), np.int8), pa.int8()),
            key_col: pa.array(keys[starts[it]]).cast(key_t),
            "q_val": pa.array(vals[starts[it] + tgt]).cast(val_t),
            "n_rows": pa.array(cnt[it], pa.int64()),
            "__blk": pa.array(np.zeros(len(it), np.int64), pa.int64())})
        # edge segments: side channel (q_val slot reuses the block's first
        # VALUE so the driver can order blocks by (key0, val0, id0))
        ee = np.flatnonzero(edge)
        side = pa.table({
            "kind": pa.array(np.ones(len(ee), np.int8), pa.int8()),
            key_col: pa.array(keys[starts[ee]]).cast(key_t),
            "q_val": pa.array(np.repeat(vals[0], len(ee))).cast(val_t),
            "n_rows": pa.array(cnt[ee], pa.int64()),
            "__blk": pa.array(np.full(len(ee), int(ids[0]), np.int64), pa.int64())})
        return pa.concat_tables([interior, side])

    mixed = sorted_ds.map_batches(pass1, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None).materialize()
    if mixed.count() == 0:
        sch = ds.schema(fetch_if_missing=True)
        types = dict(zip(sch.names, sch.types))
        return rd.from_arrow(pa.table({
            key_col: pa.array([], types[key_col]),
            "q_val": pa.array([], types[val_col]),
            "n_rows": pa.array([], pa.int64())}))
    interior = mixed.filter(expr="kind == 0").drop_columns(["kind", "__blk"])
    side = pa.concat_tables(
        [t for t in ray.get(mixed.filter(expr="kind == 1").to_arrow_refs())
         if t.num_rows]).to_pandas()
    # block order = global order of each block's first (key, val, id) row;
    # within a block its (<=2) edge segments arrive first-then-last already
    # (pass1 emits them in index order), so a stable sort on the block
    # identity alone preserves segment order
    side["__ord"] = np.arange(len(side))
    blk_first = side.groupby("__blk", sort=False).first()
    blk_order = blk_first.sort_values([key_col, "q_val", "__blk"]).index
    blk_rank = {b: i for i, b in enumerate(blk_order)}
    side["__brank"] = side["__blk"].map(blk_rank)
    side = side.sort_values(["__brank", "__ord"], kind="mergesort")
    assign: dict[int, list] = {}
    cur_key = None
    segs: list = []

    def _flush():
        if cur_key is None:
            return
        n_k = sum(c for c, _b in segs)
        t = (n_k * p_ + r_ - 1) // r_ - 1
        off = 0
        for c, bid in segs:
            if off <= t < off + c:
                assign.setdefault(int(bid), []).append((cur_key, int(t - off)))
                break
            off += c

    for _i, row in side.iterrows():
        k = row[key_col]
        if k != cur_key:
            _flush()
            cur_key, segs = k, []
        segs.append((int(row["n_rows"]), row["__blk"]))
    _flush()
    ref = ray.put(assign)

    def pass2(b: pa.Table) -> pa.Table:
        key_t = b.schema.field(key_col).type
        val_t = b.schema.field(val_col).type
        if b.num_rows == 0:
            return pa.table({key_col: pa.array([], key_t),
                             "q_val": pa.array([], val_t),
                             "n_rows": pa.array([], pa.int64())})
        ids = b[id_col].to_numpy(zero_copy_only=False)
        todo = ray.get(ref).get(int(ids[0]), [])
        if not todo:
            return pa.table({key_col: pa.array([], key_t),
                             "q_val": pa.array([], val_t),
                             "n_rows": pa.array([], pa.int64())})
        keys, starts, ends = _segments(b)
        vals = b[val_col].to_numpy(zero_copy_only=False)
        seg_keys = keys[starts]
        out_k, out_v = [], []
        for k, local in todo:
            j = int(np.searchsorted(seg_keys, k))
            out_k.append(k)
            out_v.append(vals[starts[j] + local])
        return pa.table({key_col: pa.array(out_k).cast(key_t),
                         "q_val": pa.array(out_v).cast(val_t),
                         "n_rows": pa.array([0] * len(out_k), pa.int64())})

    gathered = sorted_ds.map_batches(pass2, batch_format="pyarrow",
                                     zero_copy_batch=True, batch_size=None)
    # n_rows for spanning groups comes from the side channel, not pass 2
    nk = side.groupby(key_col, sort=False)["n_rows"].sum()

    def fix_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        counts = [int(nk[k]) for k in b[key_col].to_pylist()]
        return b.set_column(b.schema.get_field_index("n_rows"), "n_rows",
                            pa.array(counts, pa.int64()))

    gathered = gathered.map_batches(fix_counts, batch_format="pyarrow",
                                    zero_copy_batch=True)
    return gathered.union(interior)


def sort_group_mode(ds, key_col: str, val_col: str):
    """EXACT grouped MODE (most frequent value; ties to the SMALLEST
    value) at UNBOUNDED key cardinality — majority label per cluster /
    dominant language per domain. -> Dataset (key_col, mode_val,
    mode_cnt, n_rows).

    Shape: ONE range sort on (key, val) makes every (key, val) pair a
    single globally-contiguous run, split only at block cuts. Interior
    segments are whole groups and answer in place. Each EDGE segment
    ships O(1) summary rows — its first/last (possibly continuing)
    boundary runs plus its best fully-inner run — through the O(#blocks)
    driver side channel, where boundary runs chain across cuts (including
    through whole blocks that are a single run) and the per-key argmax
    picks (count DESC, value ASC). The driver never sees a data row."""
    import numpy as np
    import ray
    import ray.data as rd

    def _runs(keys, vals):
        n = len(keys)
        idx = np.arange(n, dtype=np.int64)
        seg_first = np.ones(n, dtype=bool)
        seg_first[1:] = keys[1:] != keys[:-1]
        run_first = seg_first.copy()
        run_first[1:] |= vals[1:] != vals[:-1]
        r_starts = np.flatnonzero(run_first)
        r_ends = np.r_[r_starts[1:], n]
        seg_id = np.cumsum(seg_first) - 1
        return seg_first, r_starts, r_ends, seg_id[r_starts]

    def _mode_per_group(run_seg, run_cnt, run_val, mask=None):
        """argmax (cnt desc, val asc) per run_seg group among masked runs.
        Returns (seg_ids, best_val, best_cnt)."""
        if mask is not None:
            run_seg, run_cnt, run_val = run_seg[mask], run_cnt[mask], run_val[mask]
        if len(run_seg) == 0:
            return run_seg, run_val, run_cnt
        order = np.lexsort((run_val, -run_cnt, run_seg))
        rs, rc, rv = run_seg[order], run_cnt[order], run_val[order]
        first = np.ones(len(rs), dtype=bool)
        first[1:] = rs[1:] != rs[:-1]
        sel = np.flatnonzero(first)
        return rs[sel], rv[sel], rc[sel]

    def pass1(b: pa.Table) -> pa.Table:
        key_t = b.schema.field(key_col).type
        val_t = b.schema.field(val_col).type
        cols = [("kind", pa.int8()), (key_col, key_t), ("mode_val", val_t),
                ("mode_cnt", pa.int64()), ("n_rows", pa.int64()),
                ("nruns", pa.int64()), ("fv", val_t), ("fc", pa.int64()),
                ("lv", val_t), ("lc", pa.int64()), ("bc", pa.int64())]
        if b.num_rows == 0:
            return pa.table({n: pa.array([], t) for n, t in cols})
        keys = b[key_col].to_numpy(zero_copy_only=False)
        vals = b[val_col].to_numpy(zero_copy_only=False)
        seg_first, r_starts, r_ends, run_seg = _runs(keys, vals)
        run_cnt = r_ends - r_starts
        run_val = vals[r_starts]
        seg_starts = np.flatnonzero(seg_first)
        seg_ends = np.r_[seg_starts[1:], len(keys)]
        nseg = len(seg_starts)
        # first/last run index per segment
        sr_first = np.ones(len(run_seg), dtype=bool)
        sr_first[1:] = run_seg[1:] != run_seg[:-1]
        seg_run0 = np.flatnonzero(sr_first)
        seg_runN = np.r_[seg_run0[1:], len(run_seg)] - 1
        edge_seg = np.zeros(nseg, dtype=bool)
        edge_seg[0] = True
        edge_seg[-1] = True
        # interior segments: whole groups, mode over ALL their runs
        it_mask = ~edge_seg[run_seg]
        gs, gv, gc = _mode_per_group(run_seg, run_cnt, run_val, it_mask)
        z = np.zeros(len(gs), np.int64)
        interior = pa.table({
            "kind": pa.array(np.zeros(len(gs), np.int8), pa.int8()),
            key_col: pa.array(keys[seg_starts[gs]]).cast(key_t),
            "mode_val": pa.array(gv).cast(val_t),
            "mode_cnt": pa.array(gc, pa.int64()),
            "n_rows": pa.array((seg_ends - seg_starts)[gs], pa.int64()),
            "nruns": pa.array(z, pa.int64()), "fv": pa.array(gv).cast(val_t),
            "fc": pa.array(z, pa.int64()), "lv": pa.array(gv).cast(val_t),
            "lc": pa.array(z, pa.int64()), "bc": pa.array(z, pa.int64())})
        # edge segments: boundary runs + best fully-inner run
        ee = np.flatnonzero(edge_seg)
        inner_mask = np.ones(len(run_seg), dtype=bool)
        inner_mask[seg_run0] = False
        inner_mask[seg_runN] = False
        inner_mask &= edge_seg[run_seg]
        bs, bv, bcnt = _mode_per_group(run_seg, run_cnt, run_val, inner_mask)
        bi_val = {int(s): v for s, v in zip(bs, bv)}
        bi_cnt = {int(s): int(c) for s, c in zip(bs, bcnt)}
        edge = pa.table({
            "kind": pa.array(np.ones(len(ee), np.int8), pa.int8()),
            key_col: pa.array(keys[seg_starts[ee]]).cast(key_t),
            # mode_val carries the best-inner VALUE for edge rows (fv as a
            # typed placeholder when there is no inner run; bc==0 marks it)
            "mode_val": pa.array([bi_val.get(int(s), vals[seg_starts[s]])
                                  for s in ee]).cast(val_t),
            "mode_cnt": pa.array([bi_cnt.get(int(s), 0) for s in ee], pa.int64()),
            "n_rows": pa.array((seg_ends - seg_starts)[ee], pa.int64()),
            "nruns": pa.array(seg_runN[ee] - seg_run0[ee] + 1, pa.int64()),
            "fv": pa.array(run_val[seg_run0[ee]]).cast(val_t),
            "fc": pa.array(run_cnt[seg_run0[ee]], pa.int64()),
            "lv": pa.array(run_val[seg_runN[ee]]).cast(val_t),
            "lc": pa.array(run_cnt[seg_runN[ee]], pa.int64()),
            "bc": pa.array([bi_cnt.get(int(s), 0) for s in ee], pa.int64())})
        return pa.concat_tables([interior, edge])

    segs = (ds.map_batches(lambda b: b.select([key_col, val_col]),
                           batch_format="pyarrow", zero_copy_batch=True)
              .sort([key_col, val_col])
              .map_batches(pass1, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=None)
              .materialize())
    if segs.count() == 0:
        sch = ds.schema(fetch_if_missing=True)
        types = dict(zip(sch.names, sch.types))
        return rd.from_arrow(pa.table({
            key_col: pa.array([], types[key_col]),
            "mode_val": pa.array([], types[val_col]),
            "mode_cnt": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64())}))
    out_cols = [key_col, "mode_val", "mode_cnt", "n_rows"]
    interior = segs.filter(expr="kind == 0").select_columns(out_cols)
    df = pa.concat_tables(
        [t for t in ray.get(segs.filter(expr="kind == 1").to_arrow_refs())
         if t.num_rows]).to_pandas()
    # block order: same-key segments have disjoint value ranges except the
    # shared boundary value, so (key, fv, lv) reconstructs adjacency
    # (identical single-run segments are interchangeable)
    df = df.sort_values([key_col, "fv", "lv"], kind="mergesort").reset_index(drop=True)
    out = {key_col: [], "mode_val": [], "mode_cnt": [], "n_rows": []}
    cur = None  # (key, chain_val, chain_cnt, candidates[(cnt, val)], n_rows)

    def _close(cur):
        cands = cur[3] + [(cur[2], cur[1])]
        cands.sort(key=lambda t: (-t[0], t[1]))
        out[key_col].append(cur[0])
        out["mode_val"].append(cands[0][1])
        out["mode_cnt"].append(int(cands[0][0]))
        out["n_rows"].append(int(cur[4]))

    for row in df.itertuples(index=False):
        r = row._asdict()
        k = r[key_col]
        if cur is None or k != cur[0]:
            if cur is not None:
                _close(cur)
            cur = [k, r["fv"], 0, [], 0]
        cur[4] += int(r["n_rows"])
        # chain continues iff the boundary value matches
        if r["fv"] == cur[1]:
            cur[2] += int(r["fc"])
        else:
            cur[3].append((cur[2], cur[1]))
            cur[1], cur[2] = r["fv"], int(r["fc"])
        if int(r["nruns"]) >= 2:
            # the first run ended inside this block: close the chain, keep
            # the best inner run as a candidate, reopen with the last run
            cur[3].append((cur[2], cur[1]))
            if int(r["bc"]) > 0:
                cur[3].append((int(r["bc"]), r["mode_val"]))
            cur[1], cur[2] = r["lv"], int(r["lc"])
    if cur is not None:
        _close(cur)
    sch = segs.schema(fetch_if_missing=True)
    types = dict(zip(sch.names, sch.types))
    mt = pa.table({
        key_col: pa.array(out[key_col]).cast(types[key_col]),
        "mode_val": pa.array(out["mode_val"]).cast(types["mode_val"]),
        "mode_cnt": pa.array(out["mode_cnt"], pa.int64()),
        "n_rows": pa.array(out["n_rows"], pa.int64())})
    return rd.from_arrow(mt).union(interior)
