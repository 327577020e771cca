"""Brute-force oracles for stages/agg.sort_group_aggregate — the
unbounded-cardinality grouped aggregate (ONE range sort + vectorized
segment reduce + O(#blocks) edge stitch). This is the r5 replacement for
Ray's sort-based Aggregate in the #groups ~ #rows regime (measured ~300x
per-group overhead there: 6.3M unique int64 keys, Dataset.sort 0.6 s vs
groupby().aggregate() 189.5 s on this host)."""

import numpy as np
import pyarrow as pa
import pytest

from geotrellis_ray.stages.agg import sort_group_aggregate


def _brute(keys, vals):
    exp = {}
    for k, v in zip(keys, vals):
        e = exp.get(k)
        if e is None:
            exp[k] = [1, int(v), int(v), int(v)]
        else:
            e[0] += 1
            e[1] += int(v)
            e[2] = min(e[2], int(v))
            e[3] = max(e[3], int(v))
    return exp


@pytest.mark.parametrize("nkeys,blocks", [(50, 16), (60_000, 16), (9_999, 3)])
def test_sort_group_aggregate_matches_bruteforce(ray_session, nkeys, blocks):
    import ray.data

    rng = np.random.default_rng(nkeys)
    n = 120_000
    keys = rng.integers(0, nkeys, n).astype(np.int64)
    vals = rng.integers(-500, 500, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})).repartition(blocks)
    out = sort_group_aggregate(ds, "k", [
        ("k", "count", "n"), ("v", "sum", "s"), ("v", "min", "mn"), ("v", "max", "mx")])
    got = {r["k"]: (r["n"], r["s"], r["mn"], r["mx"]) for r in out.take_all()}
    exp = _brute(keys, vals)
    assert len(got) == len(exp)
    for k, e in exp.items():
        assert got[k] == tuple(e), (k, got[k], e)


def test_sort_group_aggregate_having_pushdown(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 40_000, 100_000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(8)
    out = sort_group_aggregate(ds, "k", [("k", "count", "n")], having_min_count=4)
    got = {r["k"]: r["n"] for r in out.take_all()}
    from collections import Counter

    exp = {k: c for k, c in Counter(keys.tolist()).items() if c >= 4}
    assert got == exp


def test_sort_group_aggregate_single_key(ray_session):
    """Degenerate cases: one global group (every block is all-edge), and an
    empty dataset."""
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "k": np.zeros(10_000, np.int64),
        "v": np.arange(10_000, dtype=np.int64)})).repartition(8)
    rows = sort_group_aggregate(
        ds, "k", [("k", "count", "n"), ("v", "min", "mn"), ("v", "max", "mx")]).take_all()
    assert len(rows) == 1
    assert (rows[0]["n"], rows[0]["mn"], rows[0]["mx"]) == (10_000, 0, 9_999)
    empty = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    assert sort_group_aggregate(empty, "k", [("k", "count", "n")]).count() == 0


def test_exact_substring_spans_no_dups_short_circuit(ray_session):
    """A corpus with no duplicated grams returns an EMPTY typed result (the
    all-empty join side is a hard ArrowInvalid in Ray 2.49)."""
    import ray.data

    from geotrellis_ray.stages.dedup import exact_substring_spans

    rng = np.random.default_rng(11)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    docs = ray.data.from_items([
        {"doc_id": i, "text": "".join(rng.choice(letters, 200))}
        for i in range(50)
    ])
    out = exact_substring_spans(docs, key="hash")
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "span_start", "span_end"}


def test_sort_group_having_all_edge_groups_filtered_join_safe(ray_session):
    """When having_min_count filters EVERY edge group (mt empty), the
    survivors come back via the interior stream — which must stay safe as
    a hash-join side (Ray 2.49 raises "no match for key field" when a join
    side's LEADING block is empty; the fix repartitions the tiny
    having-filtered stream to 1 block). Single sorted block: first/last
    groups are the edges (count 1 -> filtered), the interior group
    survives."""
    import ray.data

    keys = np.array([0] + [5] * 10 + [9], np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(1)
    out = sort_group_aggregate(ds, "k", [("k", "count", "n")], having_min_count=3)
    assert {r["k"]: r["n"] for r in out.take_all()} == {5: 10}

    # downstream hash join (the exact_substring usage shape)
    right = ray.data.from_arrow(pa.table({"k": np.array([5, 7], np.int64),
                                          "tag": ["hit", "miss"]}))
    j = right.join(out, join_type="inner", on=("k",), num_partitions=2).take_all()
    assert len(j) == 1 and j[0]["tag"] == "hit" and j[0]["n"] == 10

    # everything filtered -> empty but typed
    ds2 = ray.data.from_arrow(pa.table({"k": np.arange(200, dtype=np.int64)})).repartition(4)
    empty = sort_group_aggregate(ds2, "k", [("k", "count", "n")], having_min_count=2)
    assert empty.count() == 0


@pytest.mark.parametrize("k,nkeys,blocks", [(1, 9000, 16), (3, 5000, 16), (5, 40, 3)])
def test_sort_grouped_top_k_matches_bruteforce(ray_session, k, nkeys, blocks):
    """Unbounded-cardinality grouped top-k vs the pandas QUALIFY oracle —
    string keys, heavy ties (order values from a small domain so tie_col
    does real work), many blocks so groups straddle block boundaries."""
    import pandas as pd
    import ray.data

    from geotrellis_ray.stages.agg import sort_grouped_top_k

    rng = np.random.default_rng(100 * k + nkeys)
    n = 60_000
    t = pa.table({
        "key": pa.array(np.char.add("g", rng.integers(0, nkeys, n).astype(str))),
        "val": pa.array(rng.integers(0, 50, n), pa.int64()),
        "row_id": pa.array(np.arange(n), pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(blocks)
    got = sort_grouped_top_k(ds, "key", "val", k, descending=True,
                             tie_col="row_id").to_pandas()
    df = t.to_pandas().sort_values(["key", "val", "row_id"],
                                   ascending=[True, False, True], kind="mergesort")
    df["rank"] = df.groupby("key", sort=False).cumcount() + 1
    exp = df[df["rank"] <= k]
    got = got.sort_values(["key", "rank"]).reset_index(drop=True)
    exp = exp.sort_values(["key", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["key", "val", "row_id", "rank"]],
                                  exp[["key", "val", "row_id", "rank"]])

    # empty input stays typed
    empty = ray.data.from_arrow(t.slice(0, 0))
    out = sort_grouped_top_k(empty, "key", "val", k, tie_col="row_id")
    assert out.count() == 0 and "rank" in out.schema().names


@pytest.mark.parametrize("nkeys,nvals,blocks", [(4000, 5, 16), (50, 3, 7), (1, 1, 8)])
def test_sort_group_count_distinct_matches_bruteforce(ray_session, nkeys, nvals, blocks):
    """Exact grouped COUNT(DISTINCT) vs pandas nunique — duplicate-heavy
    values (tiny val domain) so duplicate runs straddle block cuts, plus
    the degenerate single-key/single-value layer (every block one edge
    segment, every boundary a duplicate continuation)."""
    import pandas as pd
    import ray.data

    from geotrellis_ray.stages.agg import sort_group_count_distinct

    rng = np.random.default_rng(nkeys * 7 + nvals)
    n = 80_000
    t = pa.table({
        "k": pa.array(rng.integers(0, nkeys, n), pa.int64()),
        "v": pa.array(rng.integers(0, nvals, n), pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(blocks)
    got = sort_group_count_distinct(ds, "k", "v").to_pandas()
    df = t.to_pandas()
    exp = df.groupby("k").agg(n_distinct=("v", "nunique"),
                              n_rows=("v", "size")).reset_index()
    got = got.sort_values("k").reset_index(drop=True)
    exp = exp.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "n_distinct", "n_rows"]],
        exp[["k", "n_distinct", "n_rows"]].astype(
            {"n_distinct": "int64", "n_rows": "int64"}))


def test_sort_group_count_distinct_string_keys_empty(ray_session):
    import ray.data

    from geotrellis_ray.stages.agg import sort_group_count_distinct

    t = pa.table({"k": pa.array(["a", "a", "b", "a"]),
                  "v": pa.array([1, 1, 2, 3], pa.int64())})
    got = {r["k"]: (r["n_distinct"], r["n_rows"])
           for r in sort_group_count_distinct(
               ray.data.from_arrow(t).repartition(3), "k", "v").take_all()}
    assert got == {"a": (2, 3), "b": (1, 1)}
    empty = ray.data.from_arrow(t.slice(0, 0))
    out = sort_group_count_distinct(empty, "k", "v")
    assert out.count() == 0 and set(out.schema().names) == {"k", "n_distinct", "n_rows"}


@pytest.mark.parametrize("q,nkeys,nvals,blocks", [
    ("0.5", 3000, 7, 16), ("0.25", 200, 4, 9), ("0.9", 1, 1, 8), ("1", 50, 1000, 3)])
def test_exact_grouped_quantile_matches_bruteforce(ray_session, q, nkeys, nvals, blocks):
    """Exact grouped quantile_disc vs the brute sorted-index oracle
    (element at ceil(n*q)-1) — duplicate-heavy values, spanning groups,
    the single-key degenerate layer, and q=1 (max)."""
    from fractions import Fraction

    import pandas as pd
    import ray.data

    from geotrellis_ray.stages.agg import exact_grouped_quantile

    rng = np.random.default_rng(abs(hash((q, nkeys))) % 2**31)
    n = 60_000
    t = pa.table({
        "k": pa.array(rng.integers(0, nkeys, n), pa.int64()),
        "v": pa.array(rng.integers(-1000, 1000, n) % nvals, pa.int64()),
        "rid": pa.array(np.arange(n), pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(blocks)
    got = exact_grouped_quantile(ds, "k", "v", "rid", q=q).to_pandas()
    frac = Fraction(q)

    def brute(g):
        vs = np.sort(g.to_numpy())
        i = (len(vs) * frac.numerator + frac.denominator - 1) // frac.denominator - 1
        return int(vs[i])

    df = t.to_pandas()
    exp = df.groupby("k").agg(q_val=("v", brute), n_rows=("v", "size")).reset_index()
    got = got.sort_values("k").reset_index(drop=True)
    exp = exp.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "q_val", "n_rows"]],
        exp[["k", "q_val", "n_rows"]].astype({"q_val": "int64", "n_rows": "int64"}))


@pytest.mark.parametrize("nkeys,nvals,blocks", [(3000, 6, 16), (40, 3, 9), (1, 2, 8)])
def test_sort_group_mode_matches_bruteforce(ray_session, nkeys, nvals, blocks):
    """Exact grouped MODE (ties -> smallest value) vs the pandas
    value_counts oracle — tiny value domains so boundary runs chain
    across many blocks, plus the single-key degenerate layer."""
    import pandas as pd
    import ray.data

    from geotrellis_ray.stages.agg import sort_group_mode

    rng = np.random.default_rng(nkeys + nvals)
    n = 70_000
    t = pa.table({
        "k": pa.array(rng.integers(0, nkeys, n), pa.int64()),
        "v": pa.array(rng.integers(0, nvals, n), pa.int64()),
    })
    got = sort_group_mode(
        ray.data.from_arrow(t).repartition(blocks), "k", "v").to_pandas()

    def brute(g):
        c = g.value_counts()
        m = c.max()
        winners = sorted(c[c == m].index)
        return pd.Series({"mode_val": winners[0], "mode_cnt": int(m),
                          "n_rows": len(g)})

    exp = t.to_pandas().groupby("k")["v"].apply(brute).unstack().reset_index()
    got = got.sort_values("k").reset_index(drop=True)
    exp = exp.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "mode_val", "mode_cnt", "n_rows"]],
        exp[["k", "mode_val", "mode_cnt", "n_rows"]].astype("int64"))


def test_sort_group_mode_string_values(ray_session):
    import ray.data

    from geotrellis_ray.stages.agg import sort_group_mode

    t = pa.table({"k": pa.array(["a"] * 5 + ["b"] * 3),
                  "v": pa.array(["en", "fr", "en", "de", "fr", "de", "de", "en"])})
    got = {r["k"]: (r["mode_val"], r["mode_cnt"], r["n_rows"])
           for r in sort_group_mode(
               ray.data.from_arrow(t).repartition(4), "k", "v").take_all()}
    # a: en=2 fr=2 de=1 -> tie, smallest value "en"; b: de=2
    assert got == {"a": ("en", 2, 5), "b": ("de", 2, 3)}
