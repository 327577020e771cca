"""The queries()/oracle_sql() implementations behind __ray_entry__.py.

Every SQL-checkable query is defined TWICE — once as a Ray Data pipeline
(engine operators) and once as ANSI SQL for DuckDB — with IDENTICAL column
names and bit-identical value derivations:

- money sums use integer cents: sum(cast(round(x*100) as bigint)) — no
  float-accumulation-order divergence;
- derived lat/lon use only exactly-representable int arithmetic and
  power-of-two divisions, so numpy float64 and DuckDB double agree to the
  last bit (same IEEE op order);
- ties in top-k / kNN are broken by id, deterministically.

Spatial queries run on the equirectangular ("latlng") ZoomedLayoutScheme so
the SQL oracle is plain floor arithmetic; WebMercator paths are covered by
pytest oracles instead (log/tan in SQL would not be bit-stable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .core.layout import Extent, LayoutDefinition, TileLayout

# ---------------------------------------------------------------------------
# shared derivations (must match the SQL text below bit-for-bit)
# ---------------------------------------------------------------------------

LATLNG_Z4 = LayoutDefinition(Extent(-180.0, -90.0, 180.0, 90.0), TileLayout(16, 16, 256, 256))


def derive_coords_batch(batch: pa.Table, id_col: str) -> pa.Table:
    """Deterministic lat/lon from an integer id — the SQL-parity geocode:
    lat = -85 + ((id * 2654435761) % 2^32) / 2^32 * 170
    lon = -180 + ((id * 40503)      % 2^16) / 2^16 * 360
    (power-of-two divisions are exact; one rounding per * and +)."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    lat = -85.0 + ((ids * 2654435761) % 4294967296).astype(np.float64) / 4294967296.0 * 170.0
    lon = -180.0 + ((ids * 40503) % 65536).astype(np.float64) / 65536.0 * 360.0
    out = batch.append_column("lat", pa.array(lat, pa.float64()))
    return out.append_column("lon", pa.array(lon, pa.float64()))


SQL_COORDS = """
    SELECT *,
           -85.0  + CAST((event_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 * 170.0 AS lat,
           -180.0 + CAST((event_id * 40503) % 65536 AS DOUBLE) / 65536.0 * 360.0 AS lon
    FROM events
"""

SQL_CUST_COORDS = """
    SELECT *,
           -85.0  + CAST((c_custkey * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 * 170.0 AS lat,
           -180.0 + CAST((c_custkey * 40503) % 65536 AS DOUBLE) / 65536.0 * 360.0 AS lon
    FROM customer
"""


def _tile_keys_z4(batch: pa.Table) -> pa.Table:
    """Equirect zoom-4 keys: col = floor((lon+180)/22.5), row = floor((90-lat)/11.25)."""
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    c, r = LATLNG_Z4.xy_to_key(lon, lat)
    out = batch.append_column("key_col", pa.array(c.astype(np.int32), pa.int32()))
    return out.append_column("key_row", pa.array(r.astype(np.int32), pa.int32()))


SQL_KEYS_Z4 = """
    LEAST(GREATEST(CAST(floor((lon + 180.0) / 22.5) AS INT), 0), 15) AS key_col,
    LEAST(GREATEST(CAST(floor((90.0 - lat) / 11.25) AS INT), 0), 15) AS key_row
"""


def _cents(col: np.ndarray) -> np.ndarray:
    return np.round(col * 100.0).astype(np.int64)


def _pool_size(frac: int = 4, lo: int = 2) -> int:
    """Actor-pool size scaled to the cluster (flagship.py's measured sizing:
    a heavy actor stage takes ~1/4 of pipeline CPU; a fixed tiny pool
    starves it at 32 cpus while oversizing starves the task stages)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(lo, cpus // frac)


def _read(sf_dir: str, table: str, columns=None):
    """Column-pruned parquet read. Ray's default parallelism oversplits tiny
    tables (64 blocks for 80 KB -> pure scheduling overhead), while a pure
    byte-sized rule STARVES compute-heavy chains (a 2 MB events table became
    ONE block -> the whole derive+cell pipeline ran on one core). Below
    256 MiB we therefore size blocks by ROW count (footer metadata read, no
    data pages): one block per ~4k rows, capped at the cluster width. At real
    scale the default (many files, target_max_block_size) is correct and
    untouched. (r03 A/B: dropping to 1k-row blocks parallelized the serial
    2 s MinHasher but REGRESSED every dedup chain 18-48% — the ~5 s shuffle
    floor, the O(#blocks) boundary stitches and map_groups scheduling all
    scale with block count and dominate at this size; measured
    ngram 9.4->11.1 s, minhash 6.6->7.7 s, simhash 17.8->26.2 s.)"""
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data

    path = f"{sf_dir}/{table}.parquet"
    kw = {}
    sz = os.path.getsize(path)
    if sz < 256 * 1024 * 1024:
        rows = pq.ParquetFile(path).metadata.num_rows
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        kw["override_num_blocks"] = max(1, min(cpus, rows // 4096))
    return ray.data.read_parquet(path, columns=columns, **kw)


# ---------------------------------------------------------------------------
# relational queries (engine genericity: scan/filter/project/agg/join/sort)
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    from .stages.agg import partial_groupby

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "l_quantity": b["l_quantity"],
                "price_cents": pa.array(_cents(b["l_extendedprice"].to_numpy(zero_copy_only=False)), pa.int64()),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return partial_groupby(
        prepped,
        ["l_returnflag", "l_linestatus"],
        [("l_quantity", "sum", "sum_qty"), ("price_cents", "sum", "sum_price_cents"),
         ("l_quantity", "count", "count_order")],
    final="single")


SQL_Q1 = """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
"""


def q_filter_range(sf_dir: str):
    import pyarrow.compute as pc

    from .stages.agg import partial_groupby

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_shipdate"])
    lo = pa.scalar(pd.Timestamp("1995-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
    filt = ds.map_batches(
        lambda b: b.filter(pc.and_(pc.greater_equal(b["l_shipdate"], lo), pc.less(b["l_shipdate"], hi))),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return partial_groupby(
        filt, ["l_returnflag"],
        [("l_quantity", "count", "n"), ("l_quantity", "sum", "sum_qty")],
    final="single")


SQL_FILTER_RANGE = """
    SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY l_returnflag
"""


def q_join_customer_orders(sf_dir: str):
    from .stages.agg import partial_groupby

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "price_cents": pa.array(_cents(b["o_totalprice"].to_numpy(zero_copy_only=False)), pa.int64()),
            }
        )

    joined = orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True).join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )
    return partial_groupby(
        joined, ["c_mktsegment"],
        [("price_cents", "count", "n_orders"), ("price_cents", "sum", "sum_price_cents")],
    final="single")


SQL_JOIN_CO = """
    SELECT c_mktsegment, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
"""


def q_join_customer_orders_broadcast(sf_dir: str):
    """Same join as q_join_customer_orders but via the BROADCAST strategy
    (stages/join.py:broadcast_join — ray.put the 15k-row customer side,
    vectorized searchsorted per batch, no shuffle/join actors). Same SQL
    oracle; the bench contrasts the two strategies."""
    import pyarrow.parquet as pq

    from .stages.agg import partial_groupby
    from .stages.join import broadcast_join

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "price_cents": pa.array(_cents(b["o_totalprice"].to_numpy(zero_copy_only=False)), pa.int64()),
            }
        )

    joined = broadcast_join(
        orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        cust, "o_custkey", "c_custkey", how="inner",
    )
    return partial_groupby(
        joined, ["c_mktsegment"],
        [("price_cents", "count", "n_orders"), ("price_cents", "sum", "sum_price_cents")],
        final="single")


def q_join_nation_rollup(sf_dir: str):
    from .stages.agg import partial_groupby

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    cn = cust.join(nation, join_type="inner", num_partitions=4, on=("c_nationkey",), right_on=("n_nationkey",))
    j = orders.join(cn, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",))
    return partial_groupby(j, ["n_name"], [("n_name", "count", "n_orders")], final="single")


SQL_JOIN_NATION = """
    SELECT n_name, count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
"""


def q_topk_orders(sf_dir: str):
    """Global top-10 by price (stages/agg.py:global_top_k): partial top-k
    per block, one k-row-per-block coalesce, final head — shuffle-free,
    vs the all-to-all range sort LIMIT-k-via-sort pays."""
    from .stages.agg import global_top_k

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return global_top_k(ds, "o_totalprice", 10, descending=True,
                        tie_col="o_orderkey")


SQL_TOPK = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_grouped_topk(sf_dir: str):
    """Per-group top-k (ROW_NUMBER window shape) with the partial top-k
    combiner (stages/agg.py:grouped_top_k): top-3 lineitems per returnflag
    by price; deterministic tie-break on a unique line uid. SQL-checked
    against DuckDB's row_number window."""
    from .stages.agg import grouped_top_k

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        uid = (b["l_orderkey"].to_numpy(zero_copy_only=False) * 8
               + b["l_linenumber"].to_numpy(zero_copy_only=False))
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "uid": pa.array(uid.astype(np.int64), pa.int64()),
            "price_cents": pa.array(_cents(b["l_extendedprice"].to_numpy(zero_copy_only=False)), pa.int64()),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_top_k(prepped, ["l_returnflag"], "price_cents", 3, descending=True, tie_col="uid")
    return out.select_columns(["l_returnflag", "rank", "uid", "price_cents"])


SQL_GROUPED_TOPK = """
    WITH ranked AS (
        SELECT l_returnflag,
               l_orderkey * 8 + l_linenumber AS uid,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT) DESC,
                            l_orderkey * 8 + l_linenumber ASC
               ) AS rank
        FROM lineitem
    )
    SELECT l_returnflag, rank, uid, price_cents FROM ranked WHERE rank <= 3
"""


def q_exact_quantiles(sf_dir: str):
    """EXACT distributed quantiles via one single-column sort + metadata-only
    index location (stages/agg.py:exact_quantiles). SQL-checked against
    DuckDB's quantile_disc (same smallest-element-with-cdf>=q convention)."""
    from .stages.agg import exact_quantiles

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    qs = [0.01, 0.25, 0.5, 0.9, 0.99]
    got = exact_quantiles(ds, "l_extendedprice", qs)
    return pa.table({
        "q": pa.array(qs, pa.float64()),
        "value": pa.array([got[x] for x in qs], pa.float64()),
    })


SQL_EXACT_QUANTILES = """
    SELECT CAST(0.01 AS DOUBLE) AS q, quantile_disc(l_extendedprice, 0.01) AS value FROM lineitem
    UNION ALL SELECT CAST(0.25 AS DOUBLE), quantile_disc(l_extendedprice, 0.25) FROM lineitem
    UNION ALL SELECT CAST(0.5 AS DOUBLE),  quantile_disc(l_extendedprice, 0.5)  FROM lineitem
    UNION ALL SELECT CAST(0.9 AS DOUBLE),  quantile_disc(l_extendedprice, 0.9)  FROM lineitem
    UNION ALL SELECT CAST(0.99 AS DOUBLE), quantile_disc(l_extendedprice, 0.99) FROM lineitem
"""


def q_events_hourly(sf_dir: str):
    from .stages.agg import partial_groupby

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        tb = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 3_600_000_000
        return pa.table(
            {
                "event_type": b["event_type"],
                "time_bin": pa.array(tb, pa.int64()),
                "value_cents": pa.array(_cents(b["value"].to_numpy(zero_copy_only=False)), pa.int64()),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return partial_groupby(
        prepped, ["event_type", "time_bin"],
        [("value_cents", "count", "n"), ("value_cents", "sum", "sum_value_cents")],
    final="single")


SQL_EVENTS_HOURLY = """
    SELECT event_type, epoch_us(ts) // 3600000000 AS time_bin,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM events GROUP BY event_type, time_bin
"""


# ---------------------------------------------------------------------------
# documents: dedup + text analysis
# ---------------------------------------------------------------------------

def q_dedup_docs_exact(sf_dir: str):
    from .stages.dedup import dedup_exact

    out = dedup_exact(_read(sf_dir, "documents", ["doc_id", "text"]))
    return out.select_columns(["doc_id", "n_dupes"])


SQL_DEDUP_EXACT = """
    SELECT min(doc_id) AS doc_id, count(*) AS n_dupes FROM documents GROUP BY text
"""


def q_paragraph_dedup(sf_dir: str):
    """C4/RefinedWeb-style paragraph-level exact dedup
    (stages/dedup.py:paragraph_dedup): 12-word paragraphs, keep the globally
    first occurrence by (doc, position), reassemble each doc. SQL-checked —
    DuckDB reproduces the split/keep-first/reassemble exactly via list
    slicing + row_number."""
    from .stages.dedup import paragraph_dedup

    return paragraph_dedup(_read(sf_dir, "documents", ["doc_id", "text"]),
                           words_per_para=12)


SQL_PARAGRAPH_DEDUP = """
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    chunks AS (
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
               array_to_string(w[(CAST(i AS INT)*12+1):((CAST(i AS INT)+1)*12)], ' ') AS para
        FROM words,
             LATERAL (SELECT unnest(range(0, CAST(ceil(len(w)/12.0) AS BIGINT))) AS i) t
    ),
    keep AS (
        SELECT doc_id, chunk_idx, para,
               row_number() OVER (PARTITION BY para ORDER BY doc_id, chunk_idx) AS rn
        FROM chunks
    )
    SELECT doc_id, string_agg(para, ' ' ORDER BY chunk_idx) AS text_dedup
    FROM keep WHERE rn = 1 GROUP BY doc_id
"""


def q_pack_shards(sf_dir: str):
    """GPT-style sequence packing (stages/agg.py:pack_token_shards): docs
    in id order concatenate into one token stream; each doc gets the shard
    where it starts (budget 4096 tokens) plus its offset. Distributed
    prefix scan — block sums to the driver (O(#blocks)), offsets broadcast
    back. SQL-checked bit-exact: integer window sums are exact in both
    engines."""
    from .functions.text_analysis import token_count_batch
    from .stages.agg import pack_token_shards

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    toks = ds.map_batches(
        lambda b: token_count_batch(b, "text").drop_columns(["text"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return pack_token_shards(toks, budget=4096)


SQL_PACK_SHARDS = r"""
    WITH t AS (
        SELECT doc_id,
               CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS prefix
        FROM t
    )
    SELECT doc_id, n_tokens,
           prefix // 4096 AS shard_id,
           prefix % 4096 AS offset_in_shard
    FROM c
"""


def q_pii_scrub(sf_dir: str):
    """PII scrubbing (functions/text_analysis.scrub_pii_batch — the standard
    pre-training redaction pass): PII is PLANTED deterministically per doc
    (email + IPv4 + phone derived from doc_id, string-concatenated the same
    way in both engines), then redacted by sequential RE2 rules. SQL-checked
    bit-exact: pyarrow's replace_substring_regex and DuckDB's
    regexp_replace(…,'g') are both RE2, so the scrubbed text matches
    string-for-string — verified by sha256 prefix — and the per-rule counts
    are integers."""
    import hashlib

    import pyarrow.compute as pc

    from .functions.text_analysis import scrub_pii_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(b: pa.Table) -> pa.Table:
        sid = pc.cast(b["doc_id"], pa.string())
        ip2 = pc.cast(pc.subtract(b["doc_id"], pc.multiply(
            pc.divide(b["doc_id"], 200), 200)), pa.string())  # doc_id % 200
        ip3 = pc.cast(pc.subtract(pc.multiply(b["doc_id"], 3), pc.multiply(
            pc.divide(pc.multiply(b["doc_id"], 3), 250), 250)), pa.string())
        ph = pc.utf8_lpad(pc.cast(pc.subtract(b["doc_id"], pc.multiply(
            pc.divide(b["doc_id"], 10000), 10000)), pa.string()), 4, "0")
        planted = pc.binary_join_element_wise(
            b["text"], " contact user", sid, "@example.com from 10.",
            ip2, ".0.", ip3, " call 555-123-", ph, "")
        return pa.table({"doc_id": b["doc_id"], "text": planted})

    scrubbed = ds.map_batches(plant, batch_format="pyarrow",
                              zero_copy_batch=True).map_batches(
        scrub_pii_batch, batch_format="pyarrow", zero_copy_batch=True)

    def hashed(b: pa.Table) -> pa.Table:
        shas = [hashlib.sha256(t.encode()).hexdigest()[:16]
                for t in b["text"].to_pylist()]
        return pa.table({"doc_id": b["doc_id"],
                         "n_email": b["n_email"], "n_ipv4": b["n_ipv4"],
                         "n_phone": b["n_phone"],
                         "scrub_sha": pa.array(shas, pa.string())})

    return scrubbed.map_batches(hashed, batch_format="pyarrow",
                                zero_copy_batch=True)


SQL_PII_SCRUB = r"""
    WITH planted AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)
                    || '.0.' || CAST((doc_id * 3) % 250 AS VARCHAR)
                    || ' call 555-123-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents
    ),
    s1 AS (
        SELECT doc_id,
               CAST(length(regexp_extract_all(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
               regexp_replace(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g') AS t
        FROM planted
    ),
    s2 AS (
        SELECT doc_id, n_email,
               CAST(length(regexp_extract_all(t,
                   '\b(\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ipv4,
               regexp_replace(t, '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS t
        FROM s1
    ),
    s3 AS (
        SELECT doc_id, n_email, n_ipv4,
               CAST(length(regexp_extract_all(t,
                   '\+?\d{3}[- ]?\d{3,4}[- ]?\d{4}\b')) AS BIGINT) AS n_phone,
               regexp_replace(t, '\+?\d{3}[- ]?\d{3,4}[- ]?\d{4}\b',
                              '<PHONE>', 'g') AS t
        FROM s2
    )
    SELECT doc_id, n_email, n_ipv4, n_phone,
           substr(sha256(t), 1, 16) AS scrub_sha
    FROM s3
"""


def q_pack_spans(sf_dir: str):
    """Sequence packing WITH document splitting (stages/agg.py:
    pack_token_spans — the real pretraining convention: docs straddling a
    shard boundary are CUT, one row per (doc, shard) overlap with the
    half-open token span and its offset). Same one-sort + O(#blocks)
    side-channel shape as q_pack_shards; the explosion is a vectorized
    np.repeat. SQL-checked bit-exact — integer window sums + a LATERAL
    shard range."""
    from .functions.text_analysis import token_count_batch
    from .stages.agg import pack_token_spans

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    toks = ds.map_batches(
        lambda b: token_count_batch(b, "text").drop_columns(["text"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return pack_token_spans(toks, budget=4096)


SQL_PACK_SPANS = r"""
    WITH t AS (
        SELECT doc_id,
               CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS prefix
        FROM t WHERE n_tokens > 0
    ),
    x AS (
        SELECT c.doc_id, c.prefix,
               c.prefix // 4096 + u.k AS shard_id,
               greatest(c.prefix, (c.prefix // 4096 + u.k) * 4096) AS lo,
               least(c.prefix + c.n_tokens,
                     (c.prefix // 4096 + u.k + 1) * 4096) AS hi
        FROM c, LATERAL (
            SELECT unnest(range(0,
                (c.prefix + c.n_tokens - 1) // 4096 - c.prefix // 4096 + 1)) AS k
        ) u
    )
    SELECT doc_id,
           CAST(shard_id AS BIGINT) AS shard_id,
           CAST(lo - prefix AS BIGINT) AS tok_start,
           CAST(hi - prefix AS BIGINT) AS tok_end,
           CAST(lo - shard_id * 4096 AS BIGINT) AS offset_in_shard
    FROM x
"""


# The hashed-4-gram quality model's fragile contract (gram-hash prime powers
# + sha256 weight derivation) lives in ONE fragment shared by every oracle
# that replays it (ADVICE r4: keep fragile rounding/hash contracts in one
# place). Yields CTE ``agg(doc_id, score, n_grams)``.
_SQL_QUALITY_AGG_CTE = """
    pos AS (
        SELECT doc_id, text,
               unnest(range(1, greatest(length(text) - 2, 1))) AS i
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               (ascii(substr(text, CAST(i AS INT), 1))::HUGEINT
                + ascii(substr(text, CAST(i + 1 AS INT), 1))::HUGEINT
                  * 1099511628211
                + ascii(substr(text, CAST(i + 2 AS INT), 1))::HUGEINT
                  * 956575116354345
                + ascii(substr(text, CAST(i + 3 AS INT), 1))::HUGEINT
                  * 624165263380053675)
               % 18446744073709551616 AS h
        FROM pos
    ),
    w AS (
        SELECT doc_id,
               CAST(('0x' || substr(sha256('quality-v1|'
                     || CAST(h % 4096 AS VARCHAR)), 1, 16))::UBIGINT
                    % 2001 AS BIGINT) - 1000 AS wt
        FROM g
    ),
    agg AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score,
                   count(*) AS n_grams FROM w GROUP BY doc_id)
"""



def q_curation_chain(sf_dir: str):
    """End-to-end LLM corpus-curation chain (pipelines/curation.py):
    quality-score -> keep score>0 -> exact dedup (keep min id) -> token
    count -> pack into 4096-token shards — ONE all-to-all for the whole
    chain (the dedup shuffle ships (content_hash, doc_id<<20|n_tokens);
    the winner's token count rides the min aggregate, no join-back).
    SQL-checked bit-exact against the full chained replay: the shared
    quality CTE, GROUP BY text with min(doc_id), and the same exclusive
    prefix-sum packing rule."""
    from .pipelines.curation import curation_chain

    return curation_chain(_read(sf_dir, "documents", ["doc_id", "text"]),
                          budget=4096)


SQL_CURATION_CHAIN = ("    WITH " + _SQL_QUALITY_AGG_CTE.strip() + r""",
    kept AS (
        SELECT d.doc_id, d.text
        FROM documents d JOIN agg a ON d.doc_id = a.doc_id
        WHERE a.score > 0
    ),
    ded AS (
        SELECT min(doc_id) AS doc_id,
               CAST(count(*) AS BIGINT) AS n_dupes,
               CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        FROM kept GROUP BY text
    ),
    c AS (
        SELECT doc_id, n_tokens, n_dupes,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS prefix
        FROM ded
    )
    SELECT doc_id, n_tokens, n_dupes,
           prefix // 4096 AS shard_id,
           prefix % 4096 AS offset_in_shard
    FROM c
""")


def q_bm25_rank(sf_dir: str):
    """Distributed BM25 retrieval (stages/retrieval.bm25_rank, log-free
    rational-idf variant): rank the documents for the query
    ["spark", "merge", "window"], top 20. Text is reduced to slim
    (doc_id, tf_t, dl) rows in ONE pass (vectorized RE2 \\b counts);
    corpus stats tree-aggregate; ranking is the shuffle-free global_top_k.
    SQL-checked bit-exact: every score op is + - * / on doubles in a
    documented evaluation order (ln is banished to keep numpy and DuckDB
    bit-identical), and the emitted columns (rank, doc_id, dl, tf_total)
    are integers."""
    from .stages.retrieval import bm25_rank

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_rank(ds, ["spark", "merge", "window"], top_k=20)


SQL_BM25_RANK = r"""
    WITH slim AS (
        SELECT doc_id,
               CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS dl,
               CAST(length(regexp_extract_all(text, '\bspark\b')) AS BIGINT) AS tf0,
               CAST(length(regexp_extract_all(text, '\bmerge\b')) AS BIGINT) AS tf1,
               CAST(length(regexp_extract_all(text, '\bwindow\b')) AS BIGINT) AS tf2
        FROM documents
    ),
    st AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
               CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
               CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
               CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
        FROM slim
    ),
    scored AS (
        SELECT s.doc_id, s.dl, s.tf0 + s.tf1 + s.tf2 AS tf_total,
               ((st.n - st.df0 + 0.5) / (st.df0 + 0.5))
                 * (CAST(s.tf0 AS DOUBLE) * (1.2 + 1.0))
                 / (CAST(s.tf0 AS DOUBLE)
                    + 1.2 * (1.0 - 0.75 + 0.75 * CAST(s.dl AS DOUBLE) / st.avgdl))
             + ((st.n - st.df1 + 0.5) / (st.df1 + 0.5))
                 * (CAST(s.tf1 AS DOUBLE) * (1.2 + 1.0))
                 / (CAST(s.tf1 AS DOUBLE)
                    + 1.2 * (1.0 - 0.75 + 0.75 * CAST(s.dl AS DOUBLE) / st.avgdl))
             + ((st.n - st.df2 + 0.5) / (st.df2 + 0.5))
                 * (CAST(s.tf2 AS DOUBLE) * (1.2 + 1.0))
                 / (CAST(s.tf2 AS DOUBLE)
                    + 1.2 * (1.0 - 0.75 + 0.75 * CAST(s.dl AS DOUBLE) / st.avgdl))
               AS score
        FROM slim s, st
        WHERE s.tf0 + s.tf1 + s.tf2 > 0
    )
    SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
           doc_id, dl, tf_total
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 20
"""


def q_quality_scorer(sf_dir: str):
    """Hashed char-4-gram linear quality scorer
    (functions/text_analysis.py:HashedNgramScorer) — the batched
    model-inference pattern: weight LUT built once per actor, applied as a
    rolling polynomial hash + gather + per-doc range sum over the batch's
    flat byte buffer. Integer-exact end to end, so the SQL oracle replays
    the gram hash (HUGEINT mod-2^64 polynomial, same prime/powers as
    dedup._gram_hash64) and the sha256-derived weights bit-for-bit."""
    from .functions.text_analysis import HashedNgramScorer

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(HashedNgramScorer, concurrency=2,
                          batch_format="pyarrow", zero_copy_batch=True)


SQL_QUALITY_SCORER = "    WITH " + _SQL_QUALITY_AGG_CTE.strip() + """
    SELECT d.doc_id,
           coalesce(a.n_grams, 0) AS n_grams,
           coalesce(a.score, 0) AS score,
           CAST(coalesce(a.score, 0) > 0 AS BIGINT) AS keep
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


def q_line_freq_filter(sf_dir: str):
    """CCNet/RefinedWeb-style corpus-frequency line filter
    (stages/dedup.py:line_frequency_filter): drop EVERY copy of a line the
    corpus repeats >= 2 times (frequency-threshold boilerplate removal —
    the keep-NONE complement of paragraph_dedup's keep-first). The corpus
    has no newlines, so the fixture derives them deterministically
    (' the ' -> '\\n', same replace on both sides). SQL-checked bit-exact
    string-for-string: DuckDB replays split -> corpus count -> threshold ->
    in-order reassembly."""
    import pyarrow.compute as pc

    from .stages.dedup import line_frequency_filter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    lined = ds.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"],
                            "text": pc.replace_substring(b["text"], " the ", "\n")}),
        batch_format="pyarrow", zero_copy_batch=True)
    return line_frequency_filter(lined, min_count=2)


SQL_LINE_FREQ_FILTER = """
    WITH docs2 AS (SELECT doc_id, replace(text, ' the ', chr(10)) AS t
                   FROM documents),
    lines AS (SELECT doc_id, unnest(str_split(t, chr(10))) AS line,
                     generate_subscripts(str_split(t, chr(10)), 1) AS pos
              FROM docs2),
    cnt AS (SELECT line, count(*) AS c FROM lines GROUP BY line),
    kept AS (SELECT l.doc_id, l.pos, l.line
             FROM lines l JOIN cnt ON l.line = cnt.line WHERE cnt.c < 2),
    tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
    SELECT k.doc_id, t.n_lines, count(*) AS n_kept,
           string_agg(k.line, chr(10) ORDER BY k.pos) AS text_filtered
    FROM kept k JOIN tot t ON k.doc_id = t.doc_id
    GROUP BY k.doc_id, t.n_lines
"""


def q_duplicated_spans(sf_dir: str):
    """Chunk-based exact-substring duplication detector (stages/dedup.py:
    duplicated_spans — the windowed approximation of suffix-array training-
    data dedup): 40-char spans at stride 20 appearing in >= 2 places.
    SQL-checked against a DuckDB substr explode (texts are ASCII, so
    codepoint and char slicing agree)."""
    from .stages.dedup import duplicated_spans

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return duplicated_spans(ds, window=40, stride=20, min_count=2, key="text")


SQL_DUP_SPANS = """
    WITH spans AS (
        SELECT doc_id, substr(text, CAST(o AS INT) + 1, 40) AS span
        FROM documents,
             LATERAL (SELECT unnest(range(0, GREATEST(length(text) - 40 + 1, 0), 20)) AS o) t
    )
    SELECT span, count(*) AS n, min(doc_id) AS min_doc
    FROM spans GROUP BY span HAVING count(*) >= 2
"""


def q_exact_substring_spans(sf_dir: str):
    """Exact (stride-1) duplicated-substring coverage -> maximal per-doc
    spans (stages/dedup.exact_substring_spans — the suffix-array training-
    data-dedup semantics as gram-coverage + distributed interval merge).
    SQL-checked against a DuckDB gaps-and-islands window query."""
    from .stages.dedup import exact_substring_spans

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_substring_spans(ds, min_len=40, min_count=2, key="text")


SQL_EXACT_SPANS = """
    WITH grams AS (
        SELECT doc_id, CAST(o AS BIGINT) AS off,
               substr(text, CAST(o AS INT) + 1, 40) AS g
        FROM documents,
             LATERAL (SELECT unnest(range(0, GREATEST(length(text) - 40 + 1, 0))) AS o) t
    ),
    counts AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    cov AS (SELECT doc_id, off FROM grams JOIN counts USING (g)),
    m AS (
        SELECT doc_id, off,
               CASE WHEN off - lag(off) OVER (PARTITION BY doc_id ORDER BY off) <= 40
                    THEN 0 ELSE 1 END AS brk
        FROM cov
    ),
    grp AS (
        SELECT doc_id, off,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY off
                              ROWS UNBOUNDED PRECEDING) AS gid
        FROM m
    )
    SELECT doc_id, min(off) AS span_start, CAST(max(off) + 40 AS BIGINT) AS span_end
    FROM grp GROUP BY doc_id, gid
"""


def q_doc_token_counts(sf_dir: str):
    from .functions.text_analysis import token_count_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow", zero_copy_batch=True).select_columns(
        ["doc_id", "n_tokens"]
    )


SQL_TOKEN_COUNTS = r"""
    SELECT doc_id, length(regexp_extract_all(text, '\S+')) AS n_tokens FROM documents
"""


def q_tfidf_top_terms(sf_dir: str):
    """Per-doc top-3 tf-idf terms (functions/text_analysis.tfidf_top_terms):
    batch-local term counts -> partial_groupby DF -> hash join -> grouped
    top-k with term tie-break. SQL-checked (integer tf/df; idf via libm ln
    on integer inputs is bit-reproducible)."""
    from .functions.text_analysis import tfidf_top_terms

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = tfidf_top_terms(ds, k=3, num_partitions=max(2, min(16, _pool_size(frac=2))))
    return out.select_columns(["doc_id", "term", "tf", "df", "tfidf", "rank"])


SQL_TFIDF = r"""
    WITH terms AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]{2,}')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf, rank FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= 3
"""


def q_line_stats(sf_dir: str):
    """Gopher-style per-doc line-repetition signals (integer-exact):
    n_lines / n_distinct_lines / n_dup_lines. Batch-local explode +
    groupby-nunique; no shuffle. SQL-checked."""
    from .functions.text_analysis import line_stats_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(line_stats_batch, batch_format="pyarrow", zero_copy_batch=True)


SQL_LINE_STATS = r"""
    WITH lines AS (
        SELECT doc_id, unnest(str_split(text, chr(10))) AS line FROM documents
    )
    SELECT doc_id, count(*) AS n_lines,
           count(DISTINCT line) AS n_distinct_lines,
           count(*) - count(DISTINCT line) AS n_dup_lines
    FROM lines GROUP BY doc_id
"""


def q_gopher_repetition(sf_dir: str):
    """Gopher word-n-gram repetition filters
    (functions/text_analysis.ngram_repetition_batch): per doc, the char
    fraction claimed by the most frequent 2-/3-gram and by duplicated
    5-grams (overlap-union). Batch-local, shuffle-free. SQL-checked — all
    counts are integers and the fractions are the same int64/int64 double
    divisions DuckDB performs."""
    from .functions.text_analysis import ngram_repetition_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(ngram_repetition_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


SQL_GOPHER_REPETITION = r"""
    WITH toks0 AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok,
               generate_subscripts(regexp_split_to_array(lower(text), '[^a-z0-9]+'), 1) AS sub
        FROM documents
    ),
    toks AS (
        SELECT doc_id, tok, length(tok) AS clen, sub
        FROM toks0 WHERE tok <> ''
    ),
    tot AS (SELECT doc_id, CAST(sum(clen) AS BIGINT) AS total_chars
            FROM toks GROUP BY doc_id),
    w2 AS (
        SELECT doc_id,
               tok || chr(31) || lead(tok, 1) OVER w AS gram,
               clen + lead(clen, 1) OVER w AS gclen
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY sub)
    ),
    c2 AS (SELECT doc_id, gram, gclen, count(*) AS cnt FROM w2
           WHERE gram IS NOT NULL GROUP BY doc_id, gram, gclen),
    t2 AS (SELECT doc_id, CAST(cnt * gclen AS BIGINT) AS top2_chars FROM c2
           QUALIFY row_number() OVER (PARTITION BY doc_id
                                      ORDER BY cnt DESC, gram ASC) = 1),
    w3 AS (
        SELECT doc_id,
               tok || chr(31) || lead(tok, 1) OVER w || chr(31) || lead(tok, 2) OVER w AS gram,
               clen + lead(clen, 1) OVER w + lead(clen, 2) OVER w AS gclen
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY sub)
    ),
    c3 AS (SELECT doc_id, gram, gclen, count(*) AS cnt FROM w3
           WHERE gram IS NOT NULL GROUP BY doc_id, gram, gclen),
    t3 AS (SELECT doc_id, CAST(cnt * gclen AS BIGINT) AS top3_chars FROM c3
           QUALIFY row_number() OVER (PARTITION BY doc_id
                                      ORDER BY cnt DESC, gram ASC) = 1),
    w5 AS (
        SELECT doc_id, sub, clen,
               tok || chr(31) || lead(tok, 1) OVER w || chr(31) || lead(tok, 2) OVER w
                   || chr(31) || lead(tok, 3) OVER w || chr(31) || lead(tok, 4) OVER w AS gram
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY sub)
    ),
    c5 AS (SELECT doc_id, gram FROM w5 WHERE gram IS NOT NULL
           GROUP BY doc_id, gram HAVING count(*) > 1),
    f5 AS (
        SELECT w5.doc_id, w5.sub, w5.clen,
               CASE WHEN c5.gram IS NOT NULL THEN 1 ELSE 0 END AS flg
        FROM w5 LEFT JOIN c5 ON w5.doc_id = c5.doc_id AND w5.gram = c5.gram
    ),
    cov AS (
        SELECT doc_id, clen,
               max(flg) OVER (PARTITION BY doc_id ORDER BY sub
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS covered
        FROM f5
    ),
    d5 AS (SELECT doc_id, CAST(sum(clen * covered) AS BIGINT) AS dup5_chars
           FROM cov GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(tot.total_chars, 0) AS total_chars,
           coalesce(t2.top2_chars, 0) AS top2_chars,
           coalesce(t3.top3_chars, 0) AS top3_chars,
           coalesce(d5.dup5_chars, 0) AS dup5_chars,
           CASE WHEN coalesce(tot.total_chars, 0) = 0 THEN 0.0
                ELSE CAST(coalesce(t2.top2_chars, 0) AS DOUBLE) / tot.total_chars
           END AS top2_frac,
           CASE WHEN coalesce(tot.total_chars, 0) = 0 THEN 0.0
                ELSE CAST(coalesce(t3.top3_chars, 0) AS DOUBLE) / tot.total_chars
           END AS top3_frac,
           CASE WHEN coalesce(tot.total_chars, 0) = 0 THEN 0.0
                ELSE CAST(coalesce(d5.dup5_chars, 0) AS DOUBLE) / tot.total_chars
           END AS dup5_frac
    FROM documents d
    LEFT JOIN tot USING (doc_id) LEFT JOIN t2 USING (doc_id)
    LEFT JOIN t3 USING (doc_id) LEFT JOIN d5 USING (doc_id)
"""


def q_pii_redact(sf_dir: str):
    """PII redaction (functions/text_analysis.pii_redact_batch): emails ->
    IPv4 -> phone-like digit runs, sequentially, via RE2 kernels shared
    bit-for-bit with the DuckDB oracle. The synthetic corpus has no PII, so
    both sides first plant deterministic doc_id-derived PII (synth_pii_batch
    == the oracle's concat CTE), making the check known-positive."""
    from .functions.text_analysis import pii_redact_batch, synth_pii_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(synth_pii_batch, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(pii_redact_batch, batch_format="pyarrow", zero_copy_batch=True)


def _sql_pii() -> str:
    from .functions.text_analysis import PII_EMAIL, PII_IPV4, PII_PHONE

    return f"""
    WITH synth AS (
        SELECT doc_id, text ||
            CASE WHEN doc_id % 3 = 0 THEN ' mail user' || doc_id || '@ex-mail.org' ELSE '' END ||
            CASE WHEN doc_id % 5 = 0 THEN ' call +1 (555) 01' || doc_id || '-9876' ELSE '' END ||
            CASE WHEN doc_id % 7 = 0 THEN ' host 10.0.' || doc_id || '.255 up' ELSE '' END AS t
        FROM documents
    ),
    s1 AS (SELECT doc_id, length(regexp_extract_all(t, '{PII_EMAIL}')) AS n_emails,
                  regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g') AS t FROM synth),
    s2 AS (SELECT doc_id, n_emails, length(regexp_extract_all(t, '{PII_IPV4}')) AS n_ips,
                  regexp_replace(t, '{PII_IPV4}', '<IP>', 'g') AS t FROM s1),
    s3 AS (SELECT doc_id, n_emails, n_ips, length(regexp_extract_all(t, '{PII_PHONE}')) AS n_phones,
                  regexp_replace(t, '{PII_PHONE}', '<PHONE>', 'g') AS t FROM s2)
    SELECT doc_id, n_emails, n_ips, n_phones, t AS text_redacted FROM s3
"""


def q_domain_stats(sf_dir: str):
    """Per-domain rollup over deterministic doc_id-derived URLs
    (functions/text_analysis.synth_url_batch + domain_of_batch): host
    extracted with one RE2 capture shared with the oracle, then a
    partial_groupby (map-side combine; only (domain, partial) rows
    shuffle — the 100-TB shape for per-domain corpus stats)."""
    from .functions.text_analysis import domain_of_batch, synth_url_batch
    from .stages.agg import partial_groupby

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    ds = ds.map_batches(synth_url_batch, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(domain_of_batch, batch_format="pyarrow", zero_copy_batch=True)
    return partial_groupby(
        ds, ["domain"],
        [("doc_id", "count", "n_docs"), ("n_chars", "sum", "total_chars"),
         ("doc_id", "min", "min_doc")],
    )


def _sql_domain_stats() -> str:
    from .functions.text_analysis import URL_DOMAIN_RE

    return f"""
    WITH u AS (
        SELECT doc_id, n_chars,
               'https://w' || (doc_id % 7) || '.site' || (doc_id % 97) ||
               '.example/p/' || doc_id AS url
        FROM documents
    ),
    d AS (SELECT doc_id, n_chars,
                 regexp_extract(lower(url), '{URL_DOMAIN_RE}', 1) AS domain FROM u)
    SELECT domain, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_doc
    FROM d GROUP BY domain
"""


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling (stages/sample.py): per-source
    keep-rates (basis points derived from the source suffix so both sides
    compute them arithmetically), keep decided by a vectorized 32-bit
    integer mix of doc_id — pure map, zero shuffle, replay-stable. The
    corpus-mix rebalancing step of a training-data pipeline, SQL-checked
    bit-for-bit because the hash is plain BIGINT arithmetic."""
    from .stages.sample import stratified_sample

    rates = {f"src{k}": 500 + (k * 731) % 9000 for k in range(20)}
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return stratified_sample(ds, "source", rates, "doc_id")


def _sql_stratified_sample() -> str:
    from .stages.sample import sql_mix32

    return f"""
    SELECT doc_id, source FROM documents
    WHERE ({sql_mix32('doc_id')}) % 10000
          < 500 + (CAST(substr(source, 4) AS BIGINT) * 731) % 9000
"""


def q_sessionize_events(sf_dir: str):
    """Gaps-and-islands sessionization over the event stream
    (stages/window.sessionize): per-user sessions split at >6h gaps; ONE
    range sort + vectorized block pass + O(#blocks) driver stitch. The
    SQL-window `sum(new_flag) OVER (PARTITION BY user ORDER BY ts, id)`
    semantics, distributed."""
    from .stages.window import sessionize

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return sessionize(ds, "user_id", "ts", "event_id", gap_us=6 * 3600 * 1_000_000)


SQL_SESSIONIZE = """
    WITH o AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
    FROM o
"""


def q_window_rank(sf_dir: str):
    """Partitioned ranking window functions (stages/window.window_rank):
    ROW_NUMBER / RANK / DENSE_RANK and the inclusive running value sum per
    user over the event stream — ONE range sort + vectorized in-block ranks
    + the O(#blocks) driver boundary stitch (rn/rsum additive, drnk
    tie-aware additive, rnk with a leading-tie-run group override). Money is
    integer cents so the running sum is bit-exact vs SQL."""
    from .stages.window import window_rank

    def cents(b: pa.Table) -> pa.Table:
        # _cents carries the fragile rounding contract (np.round half-to-even
        # vs DuckDB half-away-from-zero — safe only because value*100 never
        # lands on an exact .5); keep it in ONE place (ADVICE r4)
        c = _cents(b["value"].to_numpy(zero_copy_only=False))
        return b.drop_columns(["value"]).append_column(
            "value_cents", pa.array(c, pa.int64()))

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return window_rank(ds, "user_id", "ts", "event_id", "value_cents")


SQL_WINDOW_RANK = """
    SELECT event_id, user_id,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           RANK()       OVER (PARTITION BY user_id ORDER BY ts) AS rnk,
           DENSE_RANK() OVER (PARTITION BY user_id ORDER BY ts) AS drnk,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rsum
    FROM events
"""


def q_window_ntile(sf_dir: str):
    """PERCENT_RANK + NTILE(7) per user over the event stream
    (stages/window.window_rank_stats): window_rank's distributed ranks plus
    ONE broadcast per-partition count; percent_rank is a single IEEE
    division of exact ints (bit-identical to SQL), ntile the standard
    first-(N%k)-buckets-get-ceil(N/k) rule. Bounded partition-cardinality
    contract (user ids), counts tree-aggregated then ray.put-broadcast."""
    from .stages.window import window_rank_stats

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return window_rank_stats(ds, "user_id", "ts", "event_id", ntile=7)


SQL_WINDOW_NTILE = """
    SELECT event_id, user_id,
           PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY ts) AS pctr,
           NTILE(7) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS bucket
    FROM events
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (stages/dedup.decontaminate): every 101st
    doc plays the held-out benchmark; corpus docs sharing any 50-char
    substring with that set are flagged with their overlap-gram count.
    Benchmark gram hashes broadcast once (ray.put), probe is a pure
    vectorized map — no shuffle. SQL-checked vs a DuckDB substr-explode
    join."""
    from .stages.dedup import decontaminate

    def bench_filter(b):
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 101 == 0))

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    bench = ds.map_batches(bench_filter, batch_format="pyarrow", zero_copy_batch=True)
    return decontaminate(ds, bench, gram_len=50)


SQL_DECONTAMINATE = """
    WITH bg AS (
        SELECT DISTINCT substr(b.text, CAST(i AS INT), 50) AS g
        FROM documents b, unnest(range(1, length(b.text) - 48)) AS t(i)
        WHERE b.doc_id % 101 = 0 AND length(b.text) >= 50
    ),
    tg AS (
        SELECT d.doc_id, substr(d.text, CAST(i AS INT), 50) AS g
        FROM documents d, unnest(range(1, length(d.text) - 48)) AS t(i)
        WHERE length(d.text) >= 50
    ),
    hits AS (
        SELECT tg.doc_id, count(*) AS n FROM tg JOIN bg USING (g) GROUP BY tg.doc_id
    )
    SELECT d.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_grams,
           coalesce(h.n, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""


def q_top_terms_sketch(sf_dir: str):
    """Corpus top-20 terms via the Misra-Gries heavy-hitters sketch
    (stages/stats.approx_top_k): bounded-size sketch per block, tree merge,
    then an exact re-count of only the candidate keys — exact whenever every
    true top key's frequency exceeds N/(capacity+1) (stopword frequencies
    beat that bound by orders of magnitude). Terms tokenized by the same
    rule as the TF-IDF oracle. SQL-checked."""
    from .stages.stats import approx_top_k

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    terms = ds.map_batches(_raw_terms_batch, batch_format="pyarrow", zero_copy_batch=True)
    top = approx_top_k(terms, "term", k=20, capacity=2048)
    return pd.DataFrame(top, columns=["term", "n"])


def _raw_terms_batch(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    toks = pc.split_pattern_regex(pc.utf8_lower(batch["text"]), "[^a-z]+")
    flat = pc.list_flatten(toks)
    flat = flat.filter(pc.greater_equal(pc.utf8_length(flat), 2))
    return pa.table({"term": flat})


SQL_TOP_TERMS = """
    WITH t AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]{2,}')) AS term
        FROM documents
    )
    SELECT term, count(*) AS n FROM t
    GROUP BY term ORDER BY n DESC, term LIMIT 20
"""


def q_doc_quality(sf_dir: str):
    from .functions.text_analysis import quality_score_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(quality_score_batch, batch_format="pyarrow", zero_copy_batch=True).select_columns(
        ["doc_id", "n_chars_m", "n_tokens", "n_punct", "n_digits", "n_upper", "n_stop", "quality_ok"]
    )


SQL_DOC_QUALITY = r"""
    SELECT doc_id,
           length(text) AS n_chars_m,
           length(regexp_extract_all(text, '\S+')) AS n_tokens,
           length(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
           length(regexp_extract_all(text, '[0-9]')) AS n_digits,
           length(regexp_extract_all(text, '[A-Z]')) AS n_upper,
           length(regexp_extract_all(text, '(?i)\b(?:the|and|of|to|in|a|is|that|for|it|on|as|with|was|at)\b')) AS n_stop,
           (length(text) >= 50 AND length(text) <= 20000
            AND length(regexp_extract_all(text, '[.,!?;:]')) * 10
                <= length(regexp_extract_all(text, '\S+')) * 3 + 10) AS quality_ok
    FROM documents
"""


def q_doc_bpe_tokens(sf_dir: str):
    from .functions.text_analysis import bpe_ish_token_count_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(bpe_ish_token_count_batch, batch_format="pyarrow", zero_copy_batch=True).select_columns(
        ["doc_id", "n_bpe_tokens"]
    )


def _sql_bpe() -> str:
    from .functions.text_analysis import BPE_ISH_PATTERN

    quoted = BPE_ISH_PATTERN.replace("'", "''")
    return (
        "SELECT doc_id, length(regexp_extract_all(text, '" + quoted + "')) AS n_bpe_tokens FROM documents"
    )


def q_lang_stats(sf_dir: str):
    from .stages.agg import partial_groupby

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    return partial_groupby(
        ds, ["lang"], [("n_chars", "count", "n_docs"), ("n_chars", "sum", "sum_chars")]
    , final="single")


SQL_LANG_STATS = """
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# spatial queries (SQL-parity derived coordinates, latlng zoom-4 layout)
# ---------------------------------------------------------------------------

def q_tile_assign_events(sf_dir: str):
    from .stages.agg import partial_groupby

    ds = _read(sf_dir, "events", ["event_id"])
    keyed = ds.map_batches(
        lambda b: _tile_keys_z4(derive_coords_batch(b, "event_id")),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # map-side combine then tiny groupby (the scale pattern)
    return partial_groupby(keyed, ["key_col", "key_row"], [("key_col", "count", "n_docs")], final="single")


SQL_TILE_ASSIGN = f"""
    WITH pts AS ({SQL_COORDS})
    SELECT {SQL_KEYS_Z4}, count(*) AS n_docs
    FROM pts GROUP BY key_col, key_row
"""


def q_pip_rect_grid(sf_dir: str):
    """PIP join events x 16x8 world rectangle grid via the REAL geometry path
    (STRtree + even-odd PIP — the half-open rect rule makes it SQL-checkable)."""
    import ray

    from .fixtures import gen_polygons_table
    from .stages.agg import partial_groupby
    from .stages.pip_join import PipJoiner

    polys = gen_polygons_table()
    grid = polys.filter(pa.compute.less(polys["polygon_id"], 128))
    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: derive_coords_batch(b, "event_id"), batch_format="pyarrow", zero_copy_batch=True
    )
    joined = ds.map_batches(
        PipJoiner,
        fn_constructor_kwargs={"polygons": ray.put(grid), "mode": "inner"},
        batch_format="pyarrow", zero_copy_batch=True, batch_size=4096, concurrency=_pool_size(),
    )
    return partial_groupby(
        joined, ["polygon_id"],
        [("event_id", "count", "n_docs"), ("event_id", "min", "min_event")],
    final="single")


SQL_PIP_RECT = f"""
    WITH pts AS ({SQL_COORDS}),
    rects AS (
        SELECT CAST(i AS BIGINT) AS polygon_id,
               -180.0 + CAST(i % 16 AS DOUBLE) * 22.5 AS xmin,
               -90.0  + CAST(i // 16 AS DOUBLE) * 22.5 AS ymin,
               -180.0 + CAST(i % 16 AS DOUBLE) * 22.5 + 22.5 AS xmax,
               -90.0  + CAST(i // 16 AS DOUBLE) * 22.5 + 22.5 AS ymax
        FROM range(0, 128) t(i)
    )
    SELECT polygon_id, count(*) AS n_docs, min(event_id) AS min_event
    FROM pts JOIN rects
      ON pts.lon >= rects.xmin AND pts.lon < rects.xmax
     AND pts.lat >= rects.ymin AND pts.lat < rects.ymax
    GROUP BY polygon_id
"""

KNN_QUERIES = [(0, 40.0, -74.0), (1, 51.0, 0.0), (2, -23.0, -46.0), (3, 35.0, 139.0)]


def q_knn_events(sf_dir: str):
    from .stages.knn import knn_multi

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: derive_coords_batch(b, "event_id"), batch_format="pyarrow", zero_copy_batch=True
    )
    queries = pd.DataFrame(
        {"query_id": [q[0] for q in KNN_QUERIES], "lat": [q[1] for q in KNN_QUERIES],
         "lon": [q[2] for q in KNN_QUERIES]}
    )
    out = knn_multi(ds, queries, k=5, id_col="event_id", metric="sqeuclid")
    return out.select_columns(["query_id", "rank", "event_id"])


SQL_KNN = f"""
    WITH pts AS ({SQL_COORDS}),
    queries(query_id, qlat, qlon) AS (VALUES {", ".join(f"({q}, {la}, {lo})" for q, la, lo in KNN_QUERIES)}),
    scored AS (
        SELECT query_id, event_id,
               (lat - qlat) * (lat - qlat) + (lon - qlon) * (lon - qlon) AS d2
        FROM pts CROSS JOIN queries
    ),
    ranked AS (
        SELECT query_id, event_id,
               row_number() OVER (PARTITION BY query_id ORDER BY d2 ASC, event_id ASC) AS rank
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, rank, event_id FROM ranked WHERE rank <= 5
"""


def q_knn_cell_pruned(sf_dir: str):
    """Scale-path kNN: hex-cell disk prefilter (k-ring expansion around each
    query's cell) then exact kNN over the pruned stream — must return
    EXACTLY the global kNN answer when the disk holds >= k true neighbours
    (hex_res=2 cells are ~11 deg, rings=2 -> the 5-NN are comfortably
    inside; rings=4 also covers the sparse sf0.001 tier). Shares
    q_knn_events' SQL oracle."""
    from .core.cellid import cell_hexlike
    from .stages.knn import knn_cell_pruned

    HEX_RES = 2

    def prep(b: pa.Table) -> pa.Table:
        b = derive_coords_batch(b, "event_id")
        c = cell_hexlike(b["lat"].to_numpy(zero_copy_only=False),
                         b["lon"].to_numpy(zero_copy_only=False), HEX_RES)
        return b.append_column("cell_hexlike", pa.array(c, pa.uint64()))

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    )
    queries_df = pd.DataFrame(
        {"query_id": [q[0] for q in KNN_QUERIES], "lat": [q[1] for q in KNN_QUERIES],
         "lon": [q[2] for q in KNN_QUERIES]}
    )
    out = knn_cell_pruned(ds, queries_df, k=5, hex_res=HEX_RES, rings=4,
                          id_col="event_id", metric="sqeuclid")
    return out.select_columns(["query_id", "rank", "event_id"])


def q_pyramid_counts(sf_dir: str):
    from .stages.pyramid import pyramid_up_counts
    from ray.data.aggregate import Sum

    tiles = q_tile_assign_events(sf_dir)
    # z4 -> z3 parent merge (power-of-2 pyramid: parent = key >> 1)
    withsfc = tiles.map_batches(
        lambda b: b.append_column(
            "sfc",
            pa.array(
                np.zeros(len(b), dtype=np.uint64), pa.uint64()
            ),
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    up = pyramid_up_counts(withsfc, count_cols=("n_docs",))
    return up.select_columns(["key_col", "key_row", "n_docs"])


SQL_PYRAMID = f"""
    WITH pts AS ({SQL_COORDS}),
    z4 AS (SELECT {SQL_KEYS_Z4}, count(*) AS n_docs FROM pts GROUP BY key_col, key_row)
    SELECT key_col // 2 AS key_col, key_row // 2 AS key_row, CAST(sum(n_docs) AS BIGINT) AS n_docs
    FROM z4 GROUP BY key_col // 2, key_row // 2
"""


def q_spatial_join_layers(sf_dir: str):
    from .stages.join import spatial_join

    ev = q_tile_assign_events(sf_dir).map_batches(
        lambda b: b.rename_columns(["key_col", "key_row", "n_events"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    from .stages.agg import partial_groupby

    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: _tile_keys_z4(derive_coords_batch(b, "c_custkey")),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    cust_tiles = partial_groupby(cust, ["key_col", "key_row"], [("key_col", "count", "n_customers")], final="single")
    # both sides are pre-aggregated to <= 256 tile rows: 2 join partitions
    # avoid paying 8 aggregator-actor spawns for a tiny keyed join
    return spatial_join(ev, cust_tiles, "inner", num_partitions=2, on=("key_col", "key_row"))


SQL_SPATIAL_JOIN = f"""
    WITH pts AS ({SQL_COORDS}),
    ev AS (SELECT {SQL_KEYS_Z4}, count(*) AS n_events FROM pts GROUP BY key_col, key_row),
    cpts AS ({SQL_CUST_COORDS}),
    cu AS (SELECT {SQL_KEYS_Z4}, count(*) AS n_customers FROM cpts GROUP BY key_col, key_row)
    SELECT ev.key_col AS key_col, ev.key_row AS key_row, n_events, n_customers
    FROM ev JOIN cu ON ev.key_col = cu.key_col AND ev.key_row = cu.key_row
"""


# ---------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible: spatial curves, sketches, ANN,
# pages corpus, stubs) — the driver records a weaker rows-only check;
# exactness is covered by the pytest oracles instead.
# ---------------------------------------------------------------------------

def _pages_dir(sf_dir: str) -> str:
    """Deterministic synthesized pages corpus sized to the sf tier, cached
    under /tmp (TESTDATA tables carry no pages table; FIXTURES.md §1)."""
    import os

    from .fixtures import write_pages_parquet

    n = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}.get(
        os.path.basename(os.path.normpath(sf_dir)), 2_000
    )
    path = f"/tmp/graft_pages_{n}"
    write_pages_parquet(path, n, shard_rows=50_000)
    return path


def q_flagship_pages(sf_dir: str):
    import ray

    from .fixtures import gen_polygons_table
    from .pipelines.flagship import flagship

    import ray.data

    ds = ray.data.read_parquet(_pages_dir(sf_dir))
    joined, tiles = flagship(ds, ray.put(gen_polygons_table()), zoom=8, verify_text=True)
    return tiles


def q_flagship_resumable(sf_dir: str):
    """North_rule lineage path: flagship over sharded pages with per-shard
    checkpoints; returns the lineage records (shard, rows_out, status) — a
    second invocation in the same round skips all shards (visible as
    status=done with identical rows)."""
    import shutil

    from .pipelines.flagship import flagship_resumable
    from .pipelines.resume import read_lineage

    pages = _pages_dir(sf_dir)
    out = f"/tmp/graft_flagship_resume_{os_basename(sf_dir)}"
    shutil.rmtree(out, ignore_errors=True)
    flagship_resumable(pages, out, shard_size=1)
    recs = read_lineage(out)
    return pa.table(
        {
            "shard": pa.array([r["shard"] for r in recs], pa.int64()),
            "rows_out": pa.array([r["rows_out"] for r in recs], pa.int64()),
            "status": pa.array([r["status"] for r in recs], pa.string()),
        }
    )


def os_basename(p: str) -> str:
    import os

    return os.path.basename(os.path.normpath(p))


def q_pages_extract_geocode(sf_dir: str):
    """Byte-identity surface: url + sha of re-extracted text + coords."""
    import hashlib

    import ray.data

    from .stages.enrich import enrich_batch

    ds = ray.data.read_parquet(_pages_dir(sf_dir))

    def f(b: pa.Table) -> pa.Table:
        e = enrich_batch(b, verify_text=True)
        sha = pa.array(
            [hashlib.sha256(t.encode()).hexdigest()[:16] for t in e["text"].to_pylist()], pa.string()
        )
        return pa.table({"url": e["url"], "text_sha": sha, "lat": e["lat"], "lon": e["lon"]})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_pages_extract_sql(sf_dir: str):
    """THE north-star invariant SQL-BIT-EXACT (round-4 late conversion):
    byte-identical extracted text per url, verified end-to-end by an
    external oracle. Runs the REAL pipeline (read_parquet over the
    2000-page corpus -> stages/enrich.enrich_batch with verify_text=True:
    RE2-vectorized extract_text + geocode with geotag precedence) and
    emits (url, sha256(text)[:16], lat, lon). The DuckDB oracle
    reconstructs every page from scratch — sha256(url) -> word list ->
    the extraction closed form 'Page i Page i <body>' -> sha256 — and
    replays the geocode float chain (hash coords, skew remap, and the
    %.6f geotag round trip via printf) bit-for-bit. Any byte drift in the
    extractor, the entity/whitespace rules, or the geocoder flips the
    sha/float and fails the hash compare. n is pinned at 2000 so the
    oracle is sf-independent (q_pages_extract_geocode covers the
    sf-scaled corpus, rows-only)."""
    import hashlib

    import ray.data

    from .fixtures import write_pages_parquet
    from .stages.enrich import enrich_batch

    # dedicated dir (not the shared _pages_dir cache): read_parquet scans
    # every file in the dir, so a cache shared with other shard layouts
    # could add stale shards
    write_pages_parquet("/tmp/graft_pages_sqloracle", 2_000, shard_rows=500)
    ds = ray.data.read_parquet("/tmp/graft_pages_sqloracle")

    def f(b: pa.Table) -> pa.Table:
        e = enrich_batch(b, verify_text=True)
        sha = pa.array(
            [hashlib.sha256(t.encode()).hexdigest()[:16] for t in e["text"].to_pylist()], pa.string()
        )
        return pa.table({"url": e["url"], "text_sha": sha, "lat": e["lat"], "lon": e["lon"]})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _sql_pages_extract(n: int = 2_000) -> str:
    from .fixtures import WORDLIST

    hexd = "strpos('0123456789abcdef', substr(s, {i}, 1)) - 1"

    def hexbyte(pos: str) -> str:
        return (f"(16 * ({hexd.format(i=f'2*({pos})+1')})"
                f" + ({hexd.format(i=f'2*({pos})+2')}))")

    h_fold = " + ".join(
        f"CAST({hexd.format(i=k + 1)} AS HUGEINT) * {16 ** (15 - k)}"
        for k in range(16))
    words_vals = ", ".join(f"({k}, '{w}')" for k, w in enumerate(WORDLIST))
    maxlat = "85.05112878"
    return f"""
    WITH pages AS MATERIALIZED (
        SELECT i, 'https://site' || (i % 997) || '.example/p/' || i AS url
        FROM range(0, {n}) t(i)
    ),
    hh AS MATERIALIZED (
        SELECT i, url, s, {h_fold} AS h
        FROM (SELECT i, url, sha256(url) AS s FROM pages)
    ),
    wl(widx, w) AS (VALUES {words_vals}),
    clusters(cid, clat, clon) AS (VALUES
        (0, 40.71, -74.01), (1, 51.51, -0.13), (2, 35.68, 139.69),
        (3, -23.55, -46.63), (4, 19.08, 72.88)),
    body AS MATERIALIZED (
        SELECT hh.i, string_agg(wl.w, ' ' ORDER BY j.j) AS body
        FROM hh
        JOIN range(0, 81) j(j) ON j.j < 20 + hh.h % 61
        JOIN wl ON wl.widx = ({hexbyte('j.j % 32')} + j.j) % 256
        GROUP BY hh.i
    ),
    txt AS MATERIALIZED (
        SELECT hh.i, hh.url, hh.h,
               'Page ' || hh.i || ' Page ' || hh.i || ' ' || b.body AS text
        FROM hh JOIN body b ON b.i = hh.i
    ),
    geo AS MATERIALIZED (
        SELECT t.i, t.url, t.text,
               CAST(t.h % 4294967296 AS DOUBLE) AS lo32,
               CAST(t.h // 4294967296 AS DOUBLE) AS hi32,
               t.h % 100 < 80 AS skew,
               CAST((t.h // 65536) % 65536 AS DOUBLE) / 65535.0 AS f_lat,
               CAST((t.h // 1099511627776) % 65536 AS DOUBLE) / 65535.0 AS f_lon,
               c.clat, c.clon
        FROM txt t JOIN clusters c ON c.cid = CAST(t.h % 5 AS BIGINT)
    )
    SELECT url, substr(sha256(text), 1, 16) AS text_sha,
           CASE WHEN i % 5 = 0
                THEN CAST(printf('%.6f', clat - 1.0 + f_lat * 2.0) AS DOUBLE)
                WHEN skew THEN clat - 1.0 + f_lat * 2.0
                ELSE -{maxlat} + lo32 / 4294967295.0 * 2.0 * {maxlat} END AS lat,
           CASE WHEN i % 5 = 0
                THEN CAST(printf('%.6f', clon - 1.0 + f_lon * 2.0) AS DOUBLE)
                WHEN skew THEN clon - 1.0 + f_lon * 2.0
                ELSE -180.0 + hi32 / 4294967295.0 * 360.0 END AS lon
    FROM geo
    """


SQL_CELL_COUNTS_HEX = f"""
    WITH pts AS ({SQL_COORDS}),
    f AS (SELECT sqrt(3.0)/3.0*(lon/5.625) - (1.0/3.0)*(lat/5.625) AS xf,
                 (2.0/3.0)*(lat/5.625) AS zf
          FROM pts),
    g AS (SELECT xf, zf, -xf-zf AS yf,
                 round(xf) AS rx0, round(-xf-zf) AS ry0, round(zf) AS rz0
          FROM f),
    h AS (SELECT
            CASE WHEN abs(rx0-xf) > abs(ry0-yf) AND abs(rx0-xf) > abs(rz0-zf)
                 THEN -ry0-rz0 ELSE rx0 END AS q,
            CASE WHEN NOT (abs(rx0-xf) > abs(ry0-yf) AND abs(rx0-xf) > abs(rz0-zf))
                  AND abs(rz0-zf) > abs(ry0-yf)
                 THEN -rx0-ry0 ELSE rz0 END AS r
          FROM g)
    SELECT (CAST(3 AS BIGINT) << 60)
           | ((CAST(q AS BIGINT) & 1073741823) << 30)
           | (CAST(r AS BIGINT) & 1073741823) AS cell,
           count(*) AS n
    FROM h
    GROUP BY 1
"""


def q_cell_counts_hex(sf_dir: str):
    """H3-like hex cell counts (core/cellid.py:cell_hexlike, res 3) with
    map-side combine. NOW SQL-checked bit-exact: the axial projection and
    cube rounding are pure IEEE float64 ops DuckDB reproduces; numpy's
    half-to-even vs DuckDB's half-away rounding cannot diverge because no
    derived coordinate lands within 1e-5 of a .5 boundary (verified over
    the full sf0.1 id space)."""
    from .core.cellid import cell_hexlike
    from .stages.agg import partial_groupby

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: derive_coords_batch(b, "event_id"), batch_format="pyarrow", zero_copy_batch=True
    )

    def addcell(b: pa.Table) -> pa.Table:
        c = cell_hexlike(b["lat"].to_numpy(zero_copy_only=False), b["lon"].to_numpy(zero_copy_only=False), 3)
        return pa.table({"cell": pa.array(c.astype(np.int64), pa.int64())})

    # map-side combine: ~2k distinct cells from 1M rows — shuffle partials,
    # never the full row stream
    cells = ds.map_batches(addcell, batch_format="pyarrow", zero_copy_batch=True)
    return partial_groupby(cells, ["cell"], [("cell", "count", "n")], final="single")


SQL_CELL_COUNTS_S2 = f"""
    WITH pts AS ({SQL_COORDS}),
    xyz AS (SELECT cos(radians(lat))*cos(radians(lon)) AS x,
                   cos(radians(lat))*sin(radians(lon)) AS y,
                   sin(radians(lat)) AS z
            FROM pts),
    fc AS (SELECT x, y, z,
             CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z)
                  THEN (CASE WHEN x >= 0 THEN 0 ELSE 1 END)
                  WHEN abs(y) >= abs(z)
                  THEN (CASE WHEN y >= 0 THEN 2 ELSE 3 END)
                  ELSE (CASE WHEN z >= 0 THEN 4 ELSE 5 END) END AS face
           FROM xyz),
    uv AS (SELECT face,
             GREATEST(LEAST(CASE WHEN face <= 1 THEN y/x
                                 WHEN face <= 3 THEN x/y ELSE x/z END, 1.0), -1.0) AS u,
             GREATEST(LEAST(CASE WHEN face <= 1 THEN z/x
                                 WHEN face <= 3 THEN z/y ELSE y/z END, 1.0), -1.0) AS v
           FROM fc),
    ij AS (SELECT face,
             LEAST(CAST(floor((u + 1.0) * 0.5 * 64.0) AS BIGINT), 63) AS i,
             LEAST(CAST(floor((v + 1.0) * 0.5 * 64.0) AS BIGINT), 63) AS j
           FROM uv),
    mz AS (SELECT face,
             (i & 1) * 1 + (j & 1) * 2
             + ((i >> 1) & 1) * 4 + ((j >> 1) & 1) * 8
             + ((i >> 2) & 1) * 16 + ((j >> 2) & 1) * 32
             + ((i >> 3) & 1) * 64 + ((j >> 3) & 1) * 128
             + ((i >> 4) & 1) * 256 + ((j >> 4) & 1) * 512
             + ((i >> 5) & 1) * 1024 + ((j >> 5) & 1) * 2048 AS m
           FROM ij),
    cid AS (SELECT CAST(face AS HUGEINT) * 2305843009213693952
                   + CAST(m AS HUGEINT) * 562949953421312
                   + 6 AS v
            FROM mz)
    SELECT CASE WHEN v >= 9223372036854775808
                THEN CAST(v - 18446744073709551616 AS BIGINT)
                ELSE CAST(v AS BIGINT) END AS cell,
           count(*) AS n
    FROM cid
    GROUP BY 1
"""


def _sql_cell_counts_geohash(precision: int = 5) -> str:
    """DuckDB oracle for geohash counts, generated to mirror
    core/cellid.py:geohash_encode bit-for-bit: quantize each axis, build
    the 5p-bit interleave as a sum of shifted bits (lon first), then look
    each 5-bit group up in the base32 alphabet."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    terms = []
    li, ai = lon_bits, lat_bits
    for b in range(total):
        shift = total - 1 - b
        if b % 2 == 0:
            li -= 1
            terms.append(f"(((lonq >> {li}) & 1) << {shift})")
        else:
            ai -= 1
            terms.append(f"(((latq >> {ai}) & 1) << {shift})")
    z = " | ".join(terms)
    chars = " || ".join(
        f"substring('0123456789bcdefghjkmnpqrstuvwxyz', "
        f"CAST(((z >> {5 * (precision - 1 - k)}) & 31) AS INTEGER) + 1, 1)"
        for k in range(precision))
    return f"""
    WITH pts AS ({SQL_COORDS}),
    q AS (
        SELECT LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * {1 << lon_bits}.0) AS BIGINT), 0), {(1 << lon_bits) - 1}) AS lonq,
               LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * {1 << lat_bits}.0) AS BIGINT), 0), {(1 << lat_bits) - 1}) AS latq
        FROM pts
    ),
    zz AS (SELECT {z} AS z FROM q)
    SELECT {chars} AS cell, count(*) AS n
    FROM zz
    GROUP BY 1
"""


def q_cell_counts_geohash(sf_dir: str):
    """Geohash cell counts at precision 5 (core/cellid.py:geohash_encode —
    verified against the public test vectors u4pruydqqvj / ezs42) with
    map-side combine. SQL-checked bit-exact: the oracle SQL is GENERATED
    from the same bit-interleave schedule, so the two cannot drift."""
    from .core.cellid import geohash_encode
    from .stages.agg import partial_groupby

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: derive_coords_batch(b, "event_id"), batch_format="pyarrow",
        zero_copy_batch=True)

    def addcell(b: pa.Table) -> pa.Table:
        gh = geohash_encode(b["lat"].to_numpy(zero_copy_only=False),
                            b["lon"].to_numpy(zero_copy_only=False), 5)
        return pa.table({"cell": pa.array(list(gh), pa.string())})

    cells = ds.map_batches(addcell, batch_format="pyarrow", zero_copy_batch=True)
    return partial_groupby(cells, ["cell"], [("cell", "count", "n")],
                           final="shuffle")


def q_cell_counts_s2(sf_dir: str):
    """S2-like cell counts at level 6 (core/cellid.py:cell_s2like) with the
    compact-key groupby trick. NOW SQL-checked bit-exact: DuckDB reproduces
    the cube-face projection (trig on this host is bit-identical to
    numpy's), the Morton interleave unrolled over 6 bit pairs, and the
    two's-complement int64 view via HUGEINT arithmetic."""
    from .core.cellid import cell_s2like
    from .stages.agg import partial_groupby

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: derive_coords_batch(b, "event_id"), batch_format="pyarrow", zero_copy_batch=True
    )

    LEVEL = 6
    SHIFT = np.uint64(61 - 2 * LEVEL)

    def addcell(b: pa.Table) -> pa.Table:
        c = cell_s2like(b["lat"].to_numpy(zero_copy_only=False), b["lon"].to_numpy(zero_copy_only=False), LEVEL)
        # group on the COMPACT id: s2-like ids are top-aligned (face+morton in
        # the high bits, zeros below the level tag), and Arrow's group_by hash
        # collapses on keys whose entropy is only in the high bits (measured
        # 3.7 s vs 0.004 s for 100k rows / 17k groups). The shift is
        # information-preserving at a fixed level.
        return pa.table({"cell_c": pa.array((c >> SHIFT).view(np.int64), pa.int64())})

    cells = ds.map_batches(addcell, batch_format="pyarrow", zero_copy_batch=True)
    counts = partial_groupby(cells, ["cell_c"], [("cell_c", "count", "n")], final="single")

    def expand(b: pa.Table) -> pa.Table:
        compact = b["cell_c"].to_numpy(zero_copy_only=False).astype(np.uint64)
        cell = (compact << SHIFT) | np.uint64(LEVEL)
        return pa.table({"cell": pa.array(cell.view(np.int64), pa.int64()), "n": b["n"]})

    return counts.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def q_minhash_dedup_docs(sf_dir: str):
    """MinHash-LSH near-dedup -> (doc_id, cluster_id). SQL-checked since
    round 4 (VERDICT r03 next-round #1): every stage is deterministic —
    sha256-based shingles, xor-multiply permutations (seeds =
    sha256('minhash-i')), 16x4 LSH banding with consecutive-id chain edges
    per bucket, est-Jaccard >= 0.7 filter, min-label components — so the
    DuckDB oracle recomputes the WHOLE pipeline from the raw text."""
    from .stages.dedup import minhash_dedup

    return minhash_dedup(_read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.7, rounds=3)


# shared SQL fragments: the minhash pipeline's shingle/permutation/banding
# chain is recomputed verbatim by BOTH the dedup-components oracle and the
# exact-jaccard-verify oracle (one source of truth, cannot drift)
_SQL_MUL = """CAST((
   (CAST(xor(g.g, p.seed) % 4294967296 AS HUGEINT) * 11400714819323198485) % 18446744073709551616
 + ((CAST(xor(g.g, p.seed) // 4294967296 AS HUGEINT) * 11400714819323198485) % 4294967296) * 4294967296
 ) % 18446744073709551616 AS UBIGINT)"""

_SQL_MINHASH_CAND = f"""toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ts
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(sha256(ts[r.i] || ' ' || ts[r.i+1] || ' ' || ts[r.i+2]), 1, 16))::UBIGINT AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(ts) - 1)) AS i) r
  WHERE len(ts) >= 3
  UNION
  SELECT doc_id, ('0x' || substr(sha256(array_to_string(ts, ' ')), 1, 16))::UBIGINT
  FROM toks WHERE len(ts) BETWEEN 1 AND 2
), perms AS (
  SELECT CAST(i AS INTEGER) AS p,
         ('0x' || substr(sha256('minhash-' || i), 1, 16))::UBIGINT AS seed
  FROM (SELECT unnest(range(0, 64)) AS i)
), sigs AS (
  SELECT d.doc_id, p.p, coalesce(min({_SQL_MUL}), 18446744073709551615::UBIGINT) AS hv
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN perms p
  LEFT JOIN grams g ON g.doc_id = d.doc_id
  GROUP BY d.doc_id, p.p
), bandsig AS (
  SELECT doc_id, p // 4 AS band, string_agg(hv::VARCHAR, ',' ORDER BY p) AS bs
  FROM sigs GROUP BY doc_id, p // 4
), chain AS (
  SELECT band, bs, doc_id,
         lag(doc_id) OVER (PARTITION BY band, bs ORDER BY doc_id) AS prev_id
  FROM bandsig
), cand AS (
  SELECT DISTINCT prev_id AS id_a, doc_id AS id_b FROM chain WHERE prev_id IS NOT NULL
)"""


def _sql_minhash_dedup() -> str:
    """DuckDB oracle for q_minhash_dedup_docs: recomputes shingles (sha256_64
    via hex substr), the (x ^ seed) * GOLDEN mod 2^64 permutation family
    (split 32-bit multiply — INT128 can't hold a full 64x64 product), LSH
    band signatures, the pipeline's consecutive-id chain edges per bucket
    (the sort-adjacency semantics of stages/dedup.py:_block_adjacent_pairs),
    signature-agreement est >= 0.7, and min-label connected components."""
    return f"""
WITH RECURSIVE {_SQL_MINHASH_CAND}, est AS (
  SELECT c.id_a, c.id_b, sum(CASE WHEN sa.hv = sb.hv THEN 1 ELSE 0 END) / 64.0 AS ej
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.id_a
  JOIN sigs sb ON sb.doc_id = c.id_b AND sb.p = sa.p
  GROUP BY c.id_a, c.id_b
), edges AS (
  SELECT id_a AS ia, id_b AS ib FROM est WHERE ej >= 0.7
  UNION ALL
  SELECT id_b, id_a FROM est WHERE ej >= 0.7
), reach(id, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.ib, r.lab FROM reach r JOIN edges e ON e.ia = r.id
)
SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id
"""


def _sql_ngram_jaccard() -> str:
    """DuckDB oracle for q_ngram_jaccard_pairs: the same MinHash chain
    candidates, then EXACT n-gram Jaccard over the distinct shingle sets
    (intersection / union counts; int/int division matches Python's float
    true division bit-exact), filtered at >= 0.5."""
    return f"""
WITH {_SQL_MINHASH_CAND}, gsz AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
), inter AS (
  SELECT c.id_a, c.id_b, count(*) AS ni
  FROM cand c JOIN grams ga ON ga.doc_id = c.id_a
              JOIN grams gb ON gb.doc_id = c.id_b AND gb.g = ga.g
  GROUP BY c.id_a, c.id_b
), jac AS (
  SELECT c.id_a, c.id_b,
         CASE WHEN coalesce(na.n, 0) + coalesce(nb.n, 0) = 0 THEN 1.0
              ELSE coalesce(i.ni, 0) / (coalesce(na.n, 0) + coalesce(nb.n, 0) - coalesce(i.ni, 0)) END AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  LEFT JOIN gsz na ON na.doc_id = c.id_a
  LEFT JOIN gsz nb ON nb.doc_id = c.id_b
)
SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5
"""


def _sql_simhash_pairs() -> str:
    """DuckDB oracle for q_simhash_pairs_docs: recomputes the Charikar
    SimHash (sha256_64 token hashes, per-bit +-1 votes, sign bits assembled
    via HUGEINT shifts), the 4x16-bit band blocking, ALL-pairs in-bucket
    verify with bit_count(xor) <= 3, grouped-MIN pair dedup — exactly the
    hamming_band_pairs semantics (exact at this scale: every bucket is far
    below the engine's 2048 all-pairs cap)."""
    return r"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS tok
  FROM documents
), th AS (
  SELECT doc_id, ('0x' || substr(sha256(tok), 1, 16))::UBIGINT AS h FROM toks
), votes AS (
  SELECT th.doc_id, b.b,
         sum(CASE WHEN (h >> CAST(b.b AS UBIGINT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN (SELECT CAST(unnest(range(0, 64)) AS INTEGER) AS b) b
  GROUP BY th.doc_id, b.b
), sigs AS (
  SELECT d.doc_id,
         CAST(coalesce((SELECT sum(CASE WHEN v.v > 0 THEN (1::HUGEINT << v.b) ELSE 0::HUGEINT END)
                        FROM votes v WHERE v.doc_id = d.doc_id), 0) AS UBIGINT) AS sig
  FROM (SELECT DISTINCT doc_id FROM documents) d
), bands AS (
  SELECT doc_id, sig, b.b AS band,
         (sig >> CAST(16 * b.b AS UBIGINT)) & 65535::UBIGINT AS bv
  FROM sigs CROSS JOIN (SELECT CAST(unnest(range(0, 4)) AS INTEGER) AS b) b
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         bit_count(xor(a.sig, c.sig)) AS hamming
  FROM bands a JOIN bands c ON a.band = c.band AND a.bv = c.bv AND a.doc_id < c.doc_id
)
SELECT id_a, id_b, CAST(min(hamming) AS BIGINT) AS hamming
FROM cand WHERE hamming <= 3 GROUP BY id_a, id_b
"""


def _sql_langid() -> str:
    """DuckDB oracle for q_langid_docs, GENERATED from LANG_PROFILES (the
    same constants the vectorized LangId compiles — cannot drift): token-
    membership counts per non-CJK language, per-char substring counts for
    zh/ja over the ORIGINAL text, argmax with the lexicographic-first
    tie-break."""
    from .functions.text_analysis import LANG_PROFILES

    prof_rows = ", ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(LANG_PROFILES) if lang not in ("zh", "ja")
        for w in LANG_PROFILES[lang]
    )
    cjk_exprs = " UNION ALL ".join(
        "SELECT d.doc_id, '{lang}' AS lang, {expr} AS score FROM documents d".format(
            lang=lang,
            expr=" + ".join(
                f"(length(d.text) - length(replace(d.text, '{c}', '')))"
                for c in LANG_PROFILES[lang]),
        )
        for lang in ("ja", "zh")
    )
    langs = ", ".join(f"('{lang}')" for lang in sorted(LANG_PROFILES))
    return rf"""
WITH prof(lang, w) AS (VALUES {prof_rows}),
toks AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS tok
  FROM documents
), word_scores AS (
  SELECT t.doc_id, p.lang, count(*) AS score
  FROM toks t JOIN prof p ON p.w = t.tok
  GROUP BY t.doc_id, p.lang
), cjk_scores AS (
  {cjk_exprs}
), langs(lang) AS (VALUES {langs}),
all_scores AS (
  SELECT d.doc_id, l.lang, coalesce(ws.score, cs.score, 0) AS score
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN langs l
  LEFT JOIN word_scores ws ON ws.doc_id = d.doc_id AND ws.lang = l.lang
  LEFT JOIN cjk_scores cs ON cs.doc_id = d.doc_id AND cs.lang = l.lang
), ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
  FROM all_scores
)
SELECT doc_id, lang AS lang_pred FROM ranked WHERE rn = 1
"""


def q_ngram_jaccard_pairs(sf_dir: str):
    """MinHash-LSH candidates -> EXACT n-gram Jaccard verify (distributed
    pair->text joins). The 'n-gram Jaccard dedup' scale shape."""
    from .stages.dedup import minhash_candidate_pairs, verify_pairs_exact_jaccard

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    # exact verify follows, so skip the est joins (with_est=False) and
    # threshold on the EXACT jaccard instead
    pairs = minhash_candidate_pairs(docs, with_est=False)
    out = verify_pairs_exact_jaccard(pairs, docs).filter(expr="jaccard >= 0.5")
    return out.select_columns(["id_a", "id_b", "jaccard"])


def q_simhash_pairs_docs(sf_dir: str):
    from .stages.dedup import simhash_near_dups

    return simhash_near_dups(_read(sf_dir, "documents", ["doc_id", "text"]), max_hamming=3)


def q_langid_docs(sf_dir: str):
    from .functions.text_analysis import LangId

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow", zero_copy_batch=True, concurrency=_pool_size()).select_columns(
        ["doc_id", "lang_pred"]
    )


def q_doc_fingerprints(sf_dir: str):
    """Rolling-hash document fingerprints SQL-BIT-EXACT (round-4 late
    conversion): the Rabin window hash (base 257 mod 2^61-1, window 32,
    keep h % 8 == 0, distinct per doc — functions/hashing.py) is a pure
    integer function of the utf-8 bytes, so DuckDB recomputes every window
    hash directly (per-position byte extraction x 32 precomputed powers,
    HUGEINT-exact). Output per doc: kept-fingerprint count + sum mod 2^63.
    Precondition (holds at every sf dir, pinned in tests): all docs are
    ASCII and >= 32 bytes, so the short-doc sha1 fallback never fires and
    ord(substr) == byte."""
    from .functions.text_analysis import Fingerprinter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(Fingerprinter, batch_format="pyarrow", zero_copy_batch=True, concurrency=_pool_size())

    def summarize(b: pa.Table) -> pa.Table:
        n_fp, summod = [], []
        for fps in b["fingerprint"].to_pylist():
            n_fp.append(len(fps))
            summod.append(int(sum(int(x) for x in fps) % (1 << 63)))
        return pa.table({"doc_id": b["doc_id"],
                         "n_fp": pa.array(n_fp, pa.int64()),
                         "fp_summod": pa.array(summod, pa.int64())})

    return out.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)


def _sql_doc_fingerprints(window: int = 32, keep_mod: int = 8) -> str:
    p = (1 << 61) - 1
    pow_vals = ", ".join(f"({j}, {pow(257, window - 1 - j, p)}::BIGINT)"
                         for j in range(window))
    return f"""
    WITH pw(j, v) AS (VALUES {pow_vals}),
    b AS MATERIALIZED (
        SELECT d.doc_id, p.i AS pos,
               ord(substr(d.text, CAST(p.i AS INT), 1)) AS byte
        FROM documents d,
             LATERAL (SELECT unnest(range(1, strlen(d.text) + 1)) AS i) p
    ),
    fp AS MATERIALIZED (
        SELECT b.doc_id, b.pos - pw.j AS start,
               CAST(sum(CAST(b.byte AS HUGEINT) * pw.v) % {p} AS BIGINT) AS h,
               count(*) AS nb
        FROM b JOIN pw ON TRUE
        GROUP BY b.doc_id, b.pos - pw.j
    ),
    kept AS (
        SELECT DISTINCT doc_id, h FROM fp
        WHERE nb = {window} AND h % {keep_mod} = 0
    )
    SELECT d.doc_id, coalesce(k.n, 0) AS n_fp, coalesce(k.s, 0) AS fp_summod
    FROM documents d
    LEFT JOIN (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(h AS HUGEINT)) % 9223372036854775808 AS BIGINT) AS s
        FROM kept GROUP BY doc_id
    ) k ON k.doc_id = d.doc_id
    """


def _embedding_queries(sf_dir: str, nq: int = 4) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = np.stack([np.asarray(e, dtype=np.float32) for e in t["embedding"].to_pylist()[:nq]])
    return m


def q_ann_sqeuclid(sf_dir: str):
    """Brute-force kNN SQL-BIT-EXACT through the real ANN path (per-batch
    matmul partial top-k + grouped final): a 2000x16 integer lattice of
    mix32 embeddings, 8 integer queries, metric sqeuclid — every distance
    is an exact integer in float64, and the output is (query_id, rank,
    dist) so the verdict is tie-robust (the top-5 DISTANCE multiset is
    deterministic even where equal-distance ids are not)."""
    import ray.data

    from .stages.ann import ann_brute_force
    from .stages.sample import mix32

    n, d, nq = 2000, 16, 8
    vi = np.arange(n * d, dtype=np.int64)
    emb = (mix32(vi + 400000) % 16).astype(np.float64).reshape(n, d)
    qi = np.arange(nq * d, dtype=np.int64)
    queries = (mix32(qi + 450000) % 16).astype(np.float64).reshape(nq, d)
    tab = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float64())),
    })
    out = ann_brute_force(ray.data.from_arrow(tab), queries, k=5, metric="sqeuclid")

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table({"query_id": b["query_id"].cast(pa.int64()),
                         "rank": b["rank"].cast(pa.int64()),
                         "dist": b["dist"].cast(pa.int64())})

    return out.map_batches(to_int, batch_format="pyarrow", zero_copy_batch=True)


def _sql_ann_sqeuclid() -> str:
    from .stages.sample import sql_mix32

    return f"""
    WITH v AS (
        SELECT CAST(i // 16 AS BIGINT) AS vec_id, i % 16 AS j,
               ({sql_mix32('(i + 400000)')}) % 16 AS x
        FROM range(0, 32000) t(i)
    ),
    q AS (
        SELECT CAST(i // 16 AS BIGINT) AS query_id, i % 16 AS j,
               ({sql_mix32('(i + 450000)')}) % 16 AS x
        FROM range(0, 128) t(i)
    ),
    d AS (
        SELECT q.query_id, v.vec_id,
               CAST(sum((q.x - v.x) * (q.x - v.x)) AS BIGINT) AS dist
        FROM q JOIN v ON v.j = q.j GROUP BY 1, 2
    ),
    r AS (
        SELECT query_id, dist,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dist, vec_id) AS rank
        FROM d
    )
    SELECT query_id, rank, dist FROM r WHERE rank <= 5
    """


def q_ann_dot(sf_dir: str):
    """Maximum-inner-product (MIPS) kNN SQL-BIT-EXACT through the real ANN
    path (round-4 late conversion; same mix32 lattice as q_ann_sqeuclid):
    metric 'dot' scores are float64 matmuls of integer-valued embeddings,
    so every inner product is integer-exact regardless of summation order.
    Output (query_id, rank, dot) — tie-robust (the top-5 score multiset is
    deterministic even where equal-score ids are not)."""
    import ray.data

    from .stages.ann import ann_brute_force
    from .stages.sample import mix32

    n, d, nq = 2000, 16, 8
    vi = np.arange(n * d, dtype=np.int64)
    emb = (mix32(vi + 400000) % 16).astype(np.float64).reshape(n, d)
    qi = np.arange(nq * d, dtype=np.int64)
    queries = (mix32(qi + 450000) % 16).astype(np.float64).reshape(nq, d)
    tab = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float64())),
    })
    out = ann_brute_force(ray.data.from_arrow(tab), queries, k=5, metric="dot")

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table({"query_id": b["query_id"].cast(pa.int64()),
                         "rank": b["rank"].cast(pa.int64()),
                         "dot": b["dot"].cast(pa.int64())})

    return out.map_batches(to_int, batch_format="pyarrow", zero_copy_batch=True)


def _sql_ann_dot() -> str:
    from .stages.sample import sql_mix32

    return f"""
    WITH v AS (
        SELECT CAST(i // 16 AS BIGINT) AS vec_id, i % 16 AS j,
               ({sql_mix32('(i + 400000)')}) % 16 AS x
        FROM range(0, 32000) t(i)
    ),
    q AS (
        SELECT CAST(i // 16 AS BIGINT) AS query_id, i % 16 AS j,
               ({sql_mix32('(i + 450000)')}) % 16 AS x
        FROM range(0, 128) t(i)
    ),
    d AS (
        SELECT q.query_id, v.vec_id, CAST(sum(q.x * v.x) AS BIGINT) AS dot
        FROM q JOIN v ON v.j = q.j GROUP BY 1, 2
    ),
    r AS (
        SELECT query_id, dot,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot DESC, vec_id) AS rank
        FROM d
    )
    SELECT query_id, rank, dot FROM r WHERE rank <= 5
    """


def q_ann_embeddings(sf_dir: str):
    from .stages.ann import ann_brute_force

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ann_brute_force(ds, _embedding_queries(sf_dir), k=5)
    return out.select_columns(["query_id", "rank", "vec_id"])


def q_ann_hnsw_embeddings(sf_dir: str):
    """HNSW graph ANN (stages/ann.HNSWIndex — from-spec Malkov & Yashunin
    2016 with the Alg.-4 diversity heuristic; one graph per block, merged
    by the shared grouped top-k). Rows-only like the other approximate ANN
    variants (float cosine + graph order); recall >= 0.9 vs brute force is
    pytest-pinned (test_retrieval). Vectors subsampled (vec_id % 7) to
    bound the per-block sequential build across scales."""
    from .stages.ann import ann_hnsw

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ds = ds.map_batches(_mod_filter("vec_id", 7), batch_format="pyarrow",
                        zero_copy_batch=True)
    out = ann_hnsw(ds, _embedding_queries(sf_dir), k=5)
    return out.select_columns(["query_id", "rank", "vec_id"])


def q_ann_lsh_embeddings(sf_dir: str):
    from .stages.ann import ann_lsh

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ann_lsh(ds, _embedding_queries(sf_dir), k=5, nbits=8)
    return out.select_columns(["query_id", "rank", "vec_id"])


def q_ann_ivf_embeddings(sf_dir: str):
    from .stages.ann import ann_ivf

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ann_ivf(ds, _embedding_queries(sf_dir), k=5, n_centroids=16, nprobe=6)
    return out.select_columns(["query_id", "rank", "vec_id"])


def q_ann_index_ivf(sf_dir: str):
    """Persisted IVF index path: build once (partitioned by inverted list,
    quantizer sidecar), then answer queries reading ONLY probed partitions
    (sources/ann_index.py). Rows-only check; recall/pruning are pytest-
    verified (test_stages)."""
    import os

    from .sources.ann_index import ann_query_index, build_ann_index

    path = f"/tmp/graft_ann_index_{os_basename(sf_dir)}"
    if not os.path.exists(os.path.join(path, "_ann_meta.json")):
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        build_ann_index(ds, path, kind="ivf", n_centroids=16)
    out = ann_query_index(path, _embedding_queries(sf_dir), k=5, nprobe=6)
    return out.select_columns(["query_id", "rank", "vec_id"])


def q_ann_pq_embeddings(sf_dir: str):
    """Product-quantization ANN (stages/ann.pq_train/pq_encode/pq_search
    _rerank — Jégou et al. 2011): codebooks trained on a driver-side sample,
    vectors compressed d*4 bytes -> m bytes, ADC scan over the codes, exact
    re-rank of only the bounded candidate set. Rows-only (approx candidates;
    the ADC==||q-decode||^2 identity and rerank-vs-brute overlap are
    pytest-verified)."""
    from .stages.ann import pq_search_rerank, pq_train

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    sample = np.stack(ds.limit(2048).to_pandas()["embedding"].to_numpy()).astype(np.float32)
    books = pq_train(sample, m=8, ksub=min(64, len(sample)))
    out = pq_search_rerank(ds, _embedding_queries(sf_dir), books, k=5, k_cand=100)
    return out[["query_id", "rank", "vec_id"]]


def q_embedding_near_dups(sf_dir: str):
    """The sf embeddings carry no true near-dups (max pairwise cosine ~0.51),
    so plant deterministic ones: perturbed copies (id+100000, +0.5% seeded
    noise) of the first 32 vectors union'd in — the LSH-bucketed detector must
    recover exactly those planted pairs."""
    import pyarrow.parquet as pq
    import ray.data

    from .stages.ann import embedding_near_dups

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    head = t.slice(0, 32)
    rng = np.random.default_rng(42)
    planted = []
    for row in head.to_pylist():
        v = np.asarray(row["embedding"], dtype=np.float32)
        planted.append({"vec_id": row["vec_id"] + 100_000,
                        "embedding": (v + rng.normal(0, 0.005 * np.abs(v).mean(), v.shape).astype(np.float32)).tolist()})
    ds = ray.data.from_arrow(t).union(ray.data.from_arrow(pa.Table.from_pylist(planted, schema=head.schema)))
    return embedding_near_dups(ds, threshold=0.95, nbits=8)


def q_rasterize_toy(sf_dir: str):
    """Rasterize the convex fixture polygons on the latlng zoom-4 layout;
    per-tile count of painted cells (grid itself pytest-verified)."""
    import pyarrow.compute as pc
    import ray.data

    from .core.raster import decode_tile
    from .fixtures import gen_polygons_table
    from .stages.rasterize_stage import rasterize_features

    polys = gen_polygons_table()
    convex = polys.filter(pc.greater_equal(polys["polygon_id"], 128))
    layout = LayoutDefinition(Extent(-180.0, -90.0, 180.0, 90.0), TileLayout(16, 16, 32, 32))
    tiles = rasterize_features(ray.data.from_arrow(convex), layout)

    def count_painted(b: pa.Table) -> pa.Table:
        ns = []
        for row in b.to_pylist():
            t = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
            ns.append(int(np.isfinite(t).sum()))
        return pa.table(
            {"key_col": b["key_col"], "key_row": b["key_row"], "n_painted": pa.array(ns, pa.int64())}
        )

    return tiles.map_batches(count_painted, batch_format="pyarrow", zero_copy_batch=True)


def q_rasterize_rects(sf_dir: str):
    """RasterizeRDD through the REAL salted paint path (stages/
    rasterize_stage.rasterize_features, salt_k=4: hot keys paint per-shard
    z-buffers merged by core.raster.zmerge) — made SQL-bit-exact by the
    cell-aligned dyadic rect fixture (fixtures.gen_rect_features): the
    cell-center rule reduces to integer interval membership, the paint
    priority (zindex desc, value desc — OUR spec) is a SQL window argmax,
    and per-tile sums of integer-valued doubles are order-independent
    exact. Emits (key_col, key_row, n_painted, sum_val) per tile."""
    import ray.data

    from .core.raster import decode_tile
    from .fixtures import gen_rect_features
    from .stages.rasterize_stage import rasterize_features

    rects = gen_rect_features()
    layout = LayoutDefinition(Extent(-180.0, -90.0, 180.0, 90.0), TileLayout(16, 8, 32, 32))
    tiles = rasterize_features(ray.data.from_arrow(rects), layout, salt_k=4)

    def summarize(b: pa.Table) -> pa.Table:
        ns, sv = [], []
        for row in b.to_pylist():
            t = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
            fin = np.isfinite(t)
            ns.append(int(fin.sum()))
            sv.append(int(t[fin].sum()))
        return pa.table({"key_col": b["key_col"].cast(pa.int64()),
                         "key_row": b["key_row"].cast(pa.int64()),
                         "n_painted": pa.array(ns, pa.int64()),
                         "sum_val": pa.array(sv, pa.int64())})

    return tiles.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)


def _sql_rect_fixture() -> str:
    """Shared CTE text reproducing fixtures.gen_rect_features in DuckDB."""
    from .stages.sample import sql_mix32

    return f"""
    raw AS (
        SELECT CAST(i AS BIGINT) AS fid,
               ({sql_mix32('i')}) % 480 + 1 AS a,
               ({sql_mix32('(i + 7001)')}) % 20 + 1 AS w,
               ({sql_mix32('(i + 7002)')}) % 224 + 1 AS b,
               ({sql_mix32('(i + 7003)')}) % 12 + 1 AS h,
               ({sql_mix32('(i + 7004)')}) % 4 AS z,
               CAST(({sql_mix32('(i + 7005)')}) % 1000 + 1 AS DOUBLE) AS v
        FROM range(0, 160) t(i)
    ),
    r2 AS (
        SELECT fid, z, v, w, h,
               a + CASE WHEN a % 32 = 0 THEN 1 ELSE 0 END AS gx0,
               b + CASE WHEN b % 32 = 0 THEN 1 ELSE 0 END AS gy0
        FROM raw
    ),
    rects AS (
        SELECT fid, z, v, gx0, gy0,
               gx0 + w + CASE WHEN (gx0 + w) % 32 = 0 THEN 1 ELSE 0 END AS gx1,
               gy0 + h + CASE WHEN (gy0 + h) % 32 = 0 THEN 1 ELSE 0 END AS gy1
        FROM r2
    )"""


def _sql_rasterize_rects() -> str:
    return f"""
    WITH {_sql_rect_fixture()},
    cx AS (SELECT fid, CAST(x AS BIGINT) AS gx
           FROM rects, range(0, 512) s(x) WHERE x >= gx0 AND x < gx1),
    cy AS (SELECT fid, CAST(y AS BIGINT) AS gy
           FROM rects, range(0, 256) s(y) WHERE y >= gy0 AND y < gy1),
    cells AS (
        SELECT r.fid, r.z, r.v, cx.gx, cy.gy
        FROM rects r JOIN cx ON cx.fid = r.fid JOIN cy ON cy.fid = r.fid
    ),
    win AS (
        SELECT gx, gy, v,
               row_number() OVER (PARTITION BY gx, gy ORDER BY z DESC, v DESC) AS rk
        FROM cells
    )
    SELECT gx // 32 AS key_col, gy // 32 AS key_row,
           count(*) AS n_painted, CAST(sum(v) AS BIGINT) AS sum_val
    FROM win WHERE rk = 1
    GROUP BY 1, 2
    """


def q_cliptogrid_rects(sf_dir: str):
    """ClipToGrid cover + full-tile detection on the dyadic rect fixture:
    per feature, the number of covering SpatialKeys and how many of them
    are FULLY covered (the clip degenerates to the cell rect — the
    reference's keep-whole-geometry predicate hook). Both have integer
    closed forms in SQL because rect edges never touch tile boundaries."""
    import ray.data

    from .fixtures import gen_rect_features
    from .stages.agg import partial_groupby
    from .stages.clip import clip_to_grid_batch

    rects = gen_rect_features()
    layout = LayoutDefinition(Extent(-180.0, -90.0, 180.0, 90.0), TileLayout(16, 8, 32, 32))
    ds = ray.data.from_arrow(rects.select(["polygon_id", "wkb"]))
    exploded = ds.map_batches(
        lambda b: clip_to_grid_batch(b, layout), batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        lambda b: b.append_column("full_i", b["full"].cast(pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return partial_groupby(
        exploded, ["polygon_id"],
        [("key_col", "count", "n_keys"), ("full_i", "sum", "n_full")],
        final="single")


def _sql_cliptogrid_rects() -> str:
    return f"""
    WITH {_sql_rect_fixture()}
    SELECT fid AS polygon_id,
           ((gx1 - 1) // 32 - gx0 // 32 + 1) * ((gy1 - 1) // 32 - gy0 // 32 + 1) AS n_keys,
           greatest(0, gx1 // 32 - (gx0 + 31) // 32)
             * greatest(0, gy1 // 32 - (gy0 + 31) // 32) AS n_full
    FROM rects
    """


def q_geojson_rects(sf_dir: str):
    """The GeoJSON SOURCE path SQL-BIT-EXACT (round-4 late conversion;
    q_geojson_cliptogrid over the general polygon fixture remains
    rows-only): the dyadic rect fixture is exported as GeoJSON
    FeatureCollection files (dyadic coordinates survive json repr/parse
    EXACTLY), read back distributed through the real read_geojson source,
    and clipped to the grid — so the oracle's integer rect-cover closed
    form (_sql_cliptogrid_rects shape) verifies the whole
    encode -> file -> parse -> WKB -> clip chain: any coordinate
    corruption anywhere in the codec would change a cover count."""
    import json
    import os

    import ray.data

    from .core import wkb as wkb_mod
    from .core.geojson import geom_to_geojson, read_geojson
    from .fixtures import gen_rect_features
    from .stages.agg import partial_groupby
    from .stages.clip import clip_to_grid_batch

    d = "/tmp/graft_geojson_rects"
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        tab = gen_rect_features()
        geoms = [wkb_mod.decode(b) for b in tab["wkb"].to_pylist()]
        pids = tab["polygon_id"].to_pylist()
        for k in range(4):
            feats = [
                {"type": "Feature", "geometry": geom_to_geojson(geoms[i]),
                 "properties": {"polygon_id": pids[i]}}
                for i in range(len(geoms)) if i % 4 == k
            ]
            with open(f"{d}/part-{k}.geojson", "w") as f:
                json.dump({"type": "FeatureCollection", "features": feats}, f)
    layout = LayoutDefinition(Extent(-180.0, -90.0, 180.0, 90.0), TileLayout(16, 8, 32, 32))
    ds = read_geojson(d)

    def with_pid(b: pa.Table) -> pa.Table:
        import json as _json

        pids = pa.array([_json.loads(p)["polygon_id"] for p in b["properties"].to_pylist()], pa.int64())
        return pa.table({"polygon_id": pids, "wkb": b["wkb"]})

    exploded = ds.map_batches(with_pid, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        lambda b: clip_to_grid_batch(b, layout), batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        lambda b: b.append_column("full_i", b["full"].cast(pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return partial_groupby(
        exploded, ["polygon_id"],
        [("key_col", "count", "n_keys"), ("full_i", "sum", "n_full")],
        final="single")


def q_geoparquet_tris(sf_dir: str):
    """The GeoParquet SOURCE/SINK path SQL-BIT-EXACT (core/geoparquet.py —
    GeoParquet 1.0.0: WKB columns + the 'geo' footer metadata, the engine's
    native vector interchange under the Parquet-only north rule): the
    doc-id triangle fixture is written via write_geoparquet (stats pre-pass
    computes geometry_types + bbox; every file footer carries the
    metadata), read back through read_geoparquet (footer validation), and
    measured — SQL_GEOM_MEASURES verifies the whole encode -> parquet ->
    decode -> shoelace chain bit-for-bit (WKB doubles ride Parquet
    untouched)."""
    import os

    from .core.geoparquet import read_geoparquet, write_geoparquet
    from .core.wkb import encode_polygon
    from .stages.overlay import geom_measures

    d = f"/tmp/graft_geoparquet_tris_{os.path.basename(os.path.normpath(sf_dir))}"
    if not os.path.isdir(d):
        ds = _read(sf_dir, "documents", ["doc_id"])

        def mk(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            wkbs = []
            for doc in ids:
                doc = int(doc)
                x0, y0 = doc % 50, doc % 31
                ring = [(x0, y0), (x0 + 3 + doc % 5, y0 + 1), (x0 + 1, y0 + 4 + doc % 7)]
                wkbs.append(encode_polygon([ring]))
            return pa.table({"polygon_id": b["doc_id"],
                             "wkb": pa.array(wkbs, pa.binary())})

        tris = ds.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)
        write_geoparquet(tris, d)
    return geom_measures(read_geoparquet(d))


def q_shapefile_rects(sf_dir: str):
    """The Shapefile SOURCE path SQL-BIT-EXACT (core/shapefile.py — from-spec
    ESRI .shp/.shx/.dbf codec, GeoTrellis ShapeFileReader equivalent): the
    dyadic rect fixture is exported as 4 shapefile shards (IEEE LE doubles
    round-trip dyadic coords exactly; polygon_id rides the .dbf as an 'N'
    field), read back distributed through the real read_shapefile source,
    and clipped to the grid — the same closed-form cover oracle as
    q_geojson_rects verifies the whole write -> file -> parse -> WKB ->
    clip chain."""
    import json
    import os

    from .core import wkb as wkb_mod
    from .core.shapefile import read_shapefile, write_shapefile
    from .fixtures import gen_rect_features
    from .stages.agg import partial_groupby
    from .stages.clip import clip_to_grid_batch

    d = "/tmp/graft_shapefile_rects"
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        tab = gen_rect_features()
        geoms = [wkb_mod.decode(b) for b in tab["wkb"].to_pylist()]
        pids = tab["polygon_id"].to_pylist()
        for k in range(4):
            idx = [i for i in range(len(geoms)) if i % 4 == k]
            write_shapefile(f"{d}/part-{k}", [geoms[i] for i in idx],
                            {"polygon_id": [pids[i] for i in idx]})
    layout = LayoutDefinition(Extent(-180.0, -90.0, 180.0, 90.0), TileLayout(16, 8, 32, 32))
    ds = read_shapefile(d)

    def with_pid(b: pa.Table) -> pa.Table:
        pids = pa.array([json.loads(p)["polygon_id"]
                         for p in b["properties"].to_pylist()], pa.int64())
        return pa.table({"polygon_id": pids, "wkb": b["wkb"]})

    exploded = ds.map_batches(with_pid, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        lambda b: clip_to_grid_batch(b, layout), batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        lambda b: b.append_column("full_i", b["full"].cast(pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return partial_groupby(
        exploded, ["polygon_id"],
        [("key_col", "count", "n_keys"), ("full_i", "sum", "n_full")],
        final="single")


def q_cliptogrid_toy(sf_dir: str):
    import ray.data

    from .stages.clip import clip_to_grid_batch

    polys = gen_polygons_table_cached()
    layout = LayoutDefinition(Extent(-180.0, -90.0, 180.0, 90.0), TileLayout(16, 16, 32, 32))
    ds = ray.data.from_arrow(polys.select(["polygon_id", "wkb"]))
    exploded = ds.map_batches(
        lambda b: clip_to_grid_batch(b, layout), batch_format="pyarrow", zero_copy_batch=True
    )
    from .stages.agg import partial_groupby

    return partial_groupby(exploded, ["polygon_id"],
                           [("polygon_id", "count", "n_keys")], final="single")


_POLY_CACHE: list = []


def gen_polygons_table_cached():
    if not _POLY_CACHE:
        from .fixtures import gen_polygons_table

        _POLY_CACHE.append(gen_polygons_table())
    return _POLY_CACHE[0]


def q_raster_ingest(sf_dir: str):
    """Canonical raster ingest flow (SURVEY §3.1): deterministic GRD grids ->
    read_binary_files -> CutTiles/tileToLayout -> per-tile defined-cell count."""
    import os

    from .core.layout import Extent as Ext2
    from .core.raster import decode_tile
    from .sources.raster_ingest import encode_grid, read_raster_files, tile_to_layout

    d = f"/tmp/graft_grids_{os_basename(sf_dir)}"
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(13)
        world = rng.uniform(1, 9, (64, 64))
        # four overlapping quadrant files over extent (0,0,8,8)
        for i, (x0, y0) in enumerate([(0, 0), (3, 0), (0, 3), (3, 3)]):
            sub = world[y0 * 8:(y0 + 5) * 8, x0 * 8:(x0 + 5) * 8]
            with open(f"{d}/g{i}.grd", "wb") as f:
                f.write(encode_grid(Ext2(float(x0), 8.0 - float(y0 + 5), float(x0 + 5), 8.0 - float(y0)), sub))
    layout = LayoutDefinition(Extent(0.0, 0.0, 8.0, 8.0), TileLayout(8, 8, 8, 8))
    tiles = tile_to_layout(read_raster_files(d), layout)

    def count_defined(b: pa.Table) -> pa.Table:
        ns = [int(np.isfinite(decode_tile(r["cells"], r["cols"], r["rows"], r["cell_type"])).sum())
              for r in b.to_pylist()]
        return pa.table({"key_col": b["key_col"], "key_row": b["key_row"],
                         "n_defined": pa.array(ns, pa.int64())})

    return tiles.map_batches(count_defined, batch_format="pyarrow", zero_copy_batch=True)


def q_audio_meta(sf_dir: str):
    """Header-only audio metadata over mixed WAV + synthesized MP3 frame
    streams (stages/multimodal.py:audio_meta_batch; core/media.py:mp3_meta —
    the round-4 MP3 metadata path). No decode: the walk touches only frame
    headers. SQL-BIT-EXACT (round-4 late conversion): the payload synth
    derives every header parameter from sha256(text) bytes, which DuckDB
    recomputes (sha256 + hex-digit extraction), so the frame walk's outputs
    have closed forms — n_frames = 1 + h1%4, the duration left-fold of
    fl(fl(1152/44100)*1000), the bitrate-table mean, and the WAV header
    constants (_sql_audio_meta). Frame-walk exactness on arbitrary streams
    stays pytest-verified (test_media.test_mp3_meta_frame_walk)."""
    import hashlib as _hashlib

    from .core.media import encode_wav
    from .stages.multimodal import audio_meta_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_media(b: pa.Table) -> pa.Table:
        payloads = []
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            h = _hashlib.sha256(t.encode()).digest()
            if d % 2 == 0:
                # hand-assembled CBR/VBR Layer-III frame stream (header spec)
                bi = 9 + (h[0] % 3)
                frames = []
                for i in range(1 + h[1] % 4):
                    b2 = ((bi if h[2] % 2 == 0 else 9 + (i % 5)) << 4) | (0 << 2)
                    flen = 144 * ([0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
                                   192, 224, 256, 320][(b2 >> 4)] * 1000) // 44100
                    frames.append(bytes([0xFF, 0xFB, b2, 0xC0]) + b"\x00" * (flen - 4))
                payloads.append(b"".join(frames))
            else:
                pcm = 0.3 * np.sin(2 * np.pi * (100 + h[0] * 4) * np.arange(1024) / 16_000.0)
                payloads.append(encode_wav(pcm))
        return pa.table({"doc_id": b["doc_id"], "media": pa.array(payloads, pa.binary())})

    media = ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)
    return media.map_batches(audio_meta_batch, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=256)


def q_video_meta(sf_dir: str):
    """Header-only MP4/ISO-BMFF video metadata (r5:
    stages/multimodal.video_meta_batch; core/media.py:mp4_meta walks
    ftyp/moov/trak/stsd — sample data never touched). SQL-BIT-EXACT via
    the q_audio_meta pattern: every box field is derived from sha256(text)
    bytes, which DuckDB recomputes; duration_ms is the same single
    int/int -> double division chain on both sides."""
    import hashlib as _hashlib

    from .core.media import encode_mp4_meta
    from .stages.multimodal import video_meta_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    _RATES = [8000, 16000, 22050, 24000, 32000, 44100, 48000]

    def to_media(bt: pa.Table) -> pa.Table:
        payloads = []
        for t in bt["text"].to_pylist():
            h = _hashlib.sha256(t.encode()).digest()
            ts = 300 * (1 + h[7] % 4)
            dur = 1000 + 256 * h[0] + h[1]
            tracks = []
            if h[2] % 4 != 0:
                tracks.append({"kind": "vide", "codec": ["avc1", "hev1"][h[8] % 2],
                               "width": 16 * (10 + h[3] % 111),
                               "height": 16 * (9 + h[4] % 60)})
            if h[5] % 3 != 0:
                tracks.append({"kind": "soun", "codec": ["mp4a", "alac"][h[9] % 2],
                               "sample_rate": _RATES[h[6] % 7], "channels": 2})
            payloads.append(encode_mp4_meta(ts, dur, tracks,
                                            brand=[b"isom", b"mp42"][h[10] % 2]))
        return pa.table({"doc_id": bt["doc_id"],
                         "media": pa.array(payloads, pa.binary())})

    media = ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)
    return media.map_batches(video_meta_batch, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=256)


def _sql_video_meta() -> str:
    hexd = "strpos('0123456789abcdef', substr(s, {i}, 1)) - 1"

    def hb(i: int) -> str:
        return (f"(16 * ({hexd.format(i=2 * i + 1)})"
                f" + ({hexd.format(i=2 * i + 2)}))")

    return f"""
    WITH h AS (SELECT doc_id, sha256(text) AS s FROM documents),
    p AS (
        SELECT doc_id, {hb(0)} AS h0, {hb(1)} AS h1, {hb(2)} AS h2,
               {hb(3)} AS h3, {hb(4)} AS h4, {hb(5)} AS h5, {hb(6)} AS h6,
               {hb(7)} AS h7, {hb(8)} AS h8, {hb(9)} AS h9, {hb(10)} AS h10
        FROM h
    )
    SELECT doc_id,
           'mp4' AS container,
           CASE WHEN h10 % 2 = 0 THEN 'isom' ELSE 'mp42' END AS major_brand,
           CAST(1000 + 256 * h0 + h1 AS DOUBLE) / (300 * (1 + h7 % 4)) * 1000.0
               AS duration_ms,
           CAST((CASE WHEN h2 % 4 <> 0 THEN 1 ELSE 0 END)
              + (CASE WHEN h5 % 3 <> 0 THEN 1 ELSE 0 END) AS INT) AS n_tracks,
           CASE WHEN h2 % 4 <> 0 THEN
                (CASE WHEN h8 % 2 = 0 THEN 'avc1' ELSE 'hev1' END) END AS video_codec,
           CASE WHEN h2 % 4 <> 0 THEN CAST(16 * (10 + h3 % 111) AS INT) END AS width,
           CASE WHEN h2 % 4 <> 0 THEN CAST(16 * (9 + h4 % 60) AS INT) END AS height,
           CASE WHEN h5 % 3 <> 0 THEN
                (CASE WHEN h9 % 2 = 0 THEN 'mp4a' ELSE 'alac' END) END AS audio_codec,
           CASE WHEN h5 % 3 <> 0 THEN
                CAST([8000, 16000, 22050, 24000, 32000, 44100, 48000][1 + h6 % 7]
                     AS INT) END AS audio_sample_rate
    FROM p
    """


def _sql_audio_meta() -> str:
    hexd = "strpos('0123456789abcdef', substr(s, {i}, 1)) - 1"

    def hb(i: int) -> str:
        return (f"(16 * ({hexd.format(i=2 * i + 1)})"
                f" + ({hexd.format(i=2 * i + 2)}))")

    d = "((1152.0 / 44100.0) * 1000.0)"  # one frame: fl(fl(1152/44100)*1000)
    return f"""
    WITH h AS (SELECT doc_id, sha256(text) AS s FROM documents),
    p AS (
        SELECT doc_id, {hb(0)} AS h0, {hb(1)} AS h1, {hb(2)} AS h2 FROM h
    ),
    mp3 AS (
        SELECT doc_id, 9 + h0 % 3 AS bi, 1 + h1 % 4 AS n, h2 % 2 = 0 AS cbr
        FROM p WHERE doc_id % 2 = 0
    ),
    tbl(i, kbps) AS (VALUES (9, 128), (10, 160), (11, 192), (12, 224), (13, 256)),
    mp3rows AS (
        SELECT m.doc_id, 'mp3' AS codec, 44100 AS sample_rate, 1 AS channels,
               CAST(m.n AS BIGINT) AS n_frames,
               -- the engine's per-frame += left-fold, unrolled (n <= 4)
               CASE m.n WHEN 1 THEN {d} WHEN 2 THEN {d} + {d}
                        WHEN 3 THEN ({d} + {d}) + {d}
                        ELSE (({d} + {d}) + {d}) + {d} END AS duration_ms,
               CAST((SELECT sum(t.kbps) FROM tbl t
                     WHERE (m.cbr AND t.i = m.bi)
                        OR (NOT m.cbr AND t.i >= 9 AND t.i < 9 + m.n)) AS DOUBLE)
                 / (CASE WHEN m.cbr THEN 1 ELSE m.n END) AS bitrate_kbps,
               (NOT m.cbr AND m.n >= 2) AS vbr
        FROM mp3 m
    ),
    wavrows AS (
        SELECT doc_id, 'wav' AS codec, 16000 AS sample_rate, 1 AS channels,
               CAST(1024 AS BIGINT) AS n_frames,
               (1024.0 / 16000.0) * 1000.0 AS duration_ms,
               CAST(16000 * 1 * 2 * 8 AS DOUBLE) / 1000.0 AS bitrate_kbps,
               FALSE AS vbr
        FROM p WHERE doc_id % 2 = 1
    )
    SELECT * FROM mp3rows UNION ALL SELECT * FROM wavrows
    """


def q_audio_features(sf_dir: str):
    """Audio multimodal pipeline over REAL payloads: deterministic PCM WAVs
    synthesized per doc (sha-seeded sine mixes, real codec), decoded by the
    actor-pool AudioFrameSampler through the real WAV path (core/media.py);
    output per-doc frame-RMS summary. Rows-only; codec byte-exactness is
    pytest-verified (test_media)."""
    import hashlib as _hashlib

    from .core.media import encode_wav
    from .stages.multimodal import AudioFrameSampler

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_media(b: pa.Table) -> pa.Table:
        payloads = []
        for t in b["text"].to_pylist():
            h = _hashlib.sha256(t.encode()).digest()
            f1 = 100 + h[0] * 4
            f2 = 100 + h[1] * 4
            amp = 0.2 + h[2] / 512.0
            ts = np.arange(2048) / 16_000.0
            pcm = amp * np.sin(2 * np.pi * f1 * ts) + (0.5 - amp / 2) * np.sin(2 * np.pi * f2 * ts)
            payloads.append(encode_wav(pcm))  # encode_wav scales [-1,1] floats
        return pa.table({"doc_id": b["doc_id"], "media": pa.array(payloads, pa.binary())})

    media = ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)
    decoded = media.map_batches(
        AudioFrameSampler, fn_constructor_kwargs={"frames": 8},
        batch_format="pyarrow", zero_copy_batch=True, batch_size=256, concurrency=_pool_size(),
    )

    def summarize(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rms = b["audio_rms"]
        flat = rms.combine_chunks() if isinstance(rms, pa.ChunkedArray) else rms
        mean_rms = [float(np.mean(x)) if len(x) else 0.0 for x in flat.to_pylist()]
        return pa.table({
            "doc_id": b["doc_id"],
            "n_frames": pc.list_value_length(rms).cast(pa.int64()),
            "mean_rms": pa.array(np.round(mean_rms, 6), pa.float64()),
        })

    return decoded.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)


def q_geotiff_sums(sf_dir: str):
    """GeoTiff ingest SQL-bit-exact: a 128x128 world of mix32 integer-valued
    doubles split into 4 quadrant GeoTiffs written through core/geotiff.py
    with four DIFFERENT codec configs (deflate/lzw x tiled/strip — all
    lossless, so one oracle covers them all), ingested by the REAL
    distributed path (read_geotiffs -> tile_to_layout at res 1.0, quadrant
    edges on tile boundaries so no merge ambiguity), reduced to per-tile
    (n_defined, sum, min, max). Sums of <=256 values <=997 are float64
    integer-exact, so DuckDB reproduces everything from range(16384)."""
    import os

    from .core.layout import Extent as Ext2
    from .core.raster import decode_tile
    from .sources.raster_ingest import read_geotiffs, tile_to_layout
    from .stages.sample import mix32

    from .core.geotiff import encode_geotiff

    d = f"/tmp/graft_gtiffs_sql_{os_basename(sf_dir)}"
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        idx = np.arange(128 * 128, dtype=np.int64)
        world = (mix32(idx) % 997 + 1).astype(np.float64).reshape(128, 128)
        cfgs = [("deflate", 16), ("lzw", 32), ("deflate", None), ("lzw", None)]
        for i, (qx, qy) in enumerate([(0, 0), (1, 0), (0, 1), (1, 1)]):
            sub = world[qy * 64:(qy + 1) * 64, qx * 64:(qx + 1) * 64]
            ext = Ext2(qx * 64.0, 128.0 - (qy + 1) * 64.0,
                       (qx + 1) * 64.0, 128.0 - qy * 64.0)
            comp, ts = cfgs[i]
            with open(f"{d}/q{i}.tif", "wb") as f:
                f.write(encode_geotiff(ext, sub, compression=comp, tile_size=ts))
    layout = LayoutDefinition(Extent(0.0, 0.0, 128.0, 128.0), TileLayout(8, 8, 16, 16))
    tiles = tile_to_layout(read_geotiffs(d), layout)

    def summarize(b: pa.Table) -> pa.Table:
        nd, sv, mn, mx = [], [], [], []
        for row in b.to_pylist():
            t = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
            fin = t[np.isfinite(t)]
            nd.append(int(fin.size))
            sv.append(int(fin.sum()))
            mn.append(int(fin.min()))
            mx.append(int(fin.max()))
        return pa.table({"key_col": b["key_col"].cast(pa.int64()),
                         "key_row": b["key_row"].cast(pa.int64()),
                         "n_defined": pa.array(nd, pa.int64()),
                         "sum_val": pa.array(sv, pa.int64()),
                         "min_val": pa.array(mn, pa.int64()),
                         "max_val": pa.array(mx, pa.int64())})

    return tiles.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)


def _sql_geotiff_sums() -> str:
    from .stages.sample import sql_mix32

    return f"""
    WITH cells AS (
        SELECT CAST(i // 128 AS BIGINT) AS r, CAST(i % 128 AS BIGINT) AS c,
               ({sql_mix32('i')}) % 997 + 1 AS v
        FROM range(0, 16384) t(i)
    )
    SELECT c // 16 AS key_col, r // 16 AS key_row,
           count(*) AS n_defined, CAST(sum(v) AS BIGINT) AS sum_val,
           CAST(min(v) AS BIGINT) AS min_val, CAST(max(v) AS BIGINT) AS max_val
    FROM cells GROUP BY 1, 2
    """


def q_cog_sums(sf_dir: str):
    """Cloud-Optimized GeoTiff SOURCE path SQL-BIT-EXACT (late-r5
    core/geotiff.encode_cog — multi-IFD headers-first layout with a
    2x-average overview chain, GeoTrellis COGLayerWriter parity): the same
    mix32 world as q_geotiff_sums is written as 4 COG quadrants (deflate +
    lzw, differing overview depths), ingested through the REAL
    read_geotiffs -> tileToLayout path (which reads the full-resolution
    page 0 of each chain), and summarized per tile — the
    _sql_geotiff_sums closed form verifies that the multi-IFD chain,
    overview pages and offset relocation leave the primary raster
    bit-exact. Overview-pyramid math is pytest-verified (test_geotiff)."""
    import os

    from .core.geotiff import encode_cog
    from .core.layout import Extent as Ext2
    from .core.raster import decode_tile
    from .sources.raster_ingest import read_geotiffs, tile_to_layout
    from .stages.sample import mix32

    d = f"/tmp/graft_cogs_sql_{os_basename(sf_dir)}"
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        idx = np.arange(128 * 128, dtype=np.int64)
        world = (mix32(idx) % 997 + 1).astype(np.float64).reshape(128, 128)
        cfgs = [("deflate", 16), ("deflate", 8), ("lzw", 16), ("deflate", 32)]
        for i, (qx, qy) in enumerate([(0, 0), (1, 0), (0, 1), (1, 1)]):
            sub = world[qy * 64:(qy + 1) * 64, qx * 64:(qx + 1) * 64]
            ext = Ext2(qx * 64.0, 128.0 - (qy + 1) * 64.0,
                       (qx + 1) * 64.0, 128.0 - qy * 64.0)
            comp, ms = cfgs[i]
            with open(f"{d}/q{i}.tif", "wb") as f:
                f.write(encode_cog(ext, sub, compression=comp, tile_size=16,
                                   min_size=ms))
    layout = LayoutDefinition(Extent(0.0, 0.0, 128.0, 128.0), TileLayout(8, 8, 16, 16))
    tiles = tile_to_layout(read_geotiffs(d), layout)

    def summarize(b: pa.Table) -> pa.Table:
        nd, sv, mn, mx = [], [], [], []
        for row in b.to_pylist():
            t = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
            fin = t[np.isfinite(t)]
            nd.append(int(fin.size))
            sv.append(int(fin.sum()))
            mn.append(int(fin.min()))
            mx.append(int(fin.max()))
        return pa.table({"key_col": b["key_col"].cast(pa.int64()),
                         "key_row": b["key_row"].cast(pa.int64()),
                         "n_defined": pa.array(nd, pa.int64()),
                         "sum_val": pa.array(sv, pa.int64()),
                         "min_val": pa.array(mn, pa.int64()),
                         "max_val": pa.array(mx, pa.int64())})

    return tiles.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)


def q_geotiff_ingest(sf_dir: str):
    """Real GeoTiff ingest end-to-end: deterministic Deflate-tiled GeoTiffs
    (core/geotiff.py writer) -> read_geotiffs -> tileToLayout -> per-tile
    defined-cell count. Rows-only; byte-level exactness and the write_geotiffs
    sink round-trip are pytest-verified (test_geotiff)."""
    import os

    from .core.geotiff import encode_geotiff
    from .core.layout import Extent as Ext2
    from .core.raster import decode_tile
    from .sources.raster_ingest import read_geotiffs, tile_to_layout

    d = f"/tmp/graft_gtiffs_{os_basename(sf_dir)}"
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(17)
        world = rng.uniform(1, 9, (64, 64))
        for i, (x0, y0) in enumerate([(0, 0), (3, 0), (0, 3), (3, 3)]):
            sub = world[y0 * 8:(y0 + 5) * 8, x0 * 8:(x0 + 5) * 8]
            ext = Ext2(float(x0), 8.0 - float(y0 + 5), float(x0 + 5), 8.0 - float(y0))
            with open(f"{d}/q{i}.tif", "wb") as f:
                f.write(encode_geotiff(ext, sub, compression="deflate", tile_size=16))
    layout = LayoutDefinition(Extent(0.0, 0.0, 8.0, 8.0), TileLayout(8, 8, 8, 8))
    tiles = tile_to_layout(read_geotiffs(d), layout)

    def count_defined(b: pa.Table) -> pa.Table:
        ns = [int(np.isfinite(decode_tile(r["cells"], r["cols"], r["rows"], r["cell_type"])).sum())
              for r in b.to_pylist()]
        return pa.table({"key_col": b["key_col"], "key_row": b["key_row"],
                         "n_defined": pa.array(ns, pa.int64())})

    return tiles.map_batches(count_defined, batch_format="pyarrow", zero_copy_batch=True)


def q_multimodal_stub(sf_dir: str):
    """Multimodal pipeline over REAL payloads: deterministic BMP images
    synthesized per doc (sha-seeded pixels, real codec), decoded by the
    actor-pool ImageDecoder through the real BMP path (core/media.py)."""
    import hashlib

    from .core.media import encode_bmp
    from .stages.multimodal import ImageDecoder, media_meta_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_media(b: pa.Table) -> pa.Table:
        payloads = []
        for t in b["text"].to_pylist():
            h = hashlib.sha256(t.encode()).digest()
            px = np.frombuffer((h * ((3 * 16 * 16) // 32 + 1))[: 3 * 16 * 16], dtype=np.uint8)
            payloads.append(encode_bmp(px.reshape(16, 16, 3)))
        return pa.table({"doc_id": b["doc_id"], "media": pa.array(payloads, pa.binary())})

    media = ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)
    media = media.map_batches(media_meta_batch, batch_format="pyarrow", zero_copy_batch=True)
    decoded = media.map_batches(
        ImageDecoder, fn_constructor_kwargs={"target_size": 8},
        batch_format="pyarrow", zero_copy_batch=True, batch_size=256, concurrency=_pool_size(),
    )
    return decoded.select_columns(["doc_id", "media_bytes", "img_h", "img_w"])


def q_histogram_breaks(sf_dir: str):
    """EXACT classBreaks over l_extendedprice cents via the merged FastMap
    histogram (stages/stats.py:class_breaks_exact): break i = smallest value
    whose cum_count*n >= total*i — a pure integer rule, so the DuckDB oracle
    is bit-exact (VERDICT r03 next-round #1: converted from the rows-only
    streaming-sketch path, which remains q_histogram_sketch_breaks)."""
    from .stages.stats import class_breaks_exact

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        lambda b: pa.table({"cents": pa.array(
            _cents(b["l_extendedprice"].to_numpy(zero_copy_only=False)), pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    breaks = class_breaks_exact(ds, "cents", 8)
    return pa.table({"brk": pa.array(np.arange(len(breaks), dtype=np.int64)),
                     "value_cents": pa.array(breaks, pa.int64())})


SQL_HISTOGRAM_BREAKS = """
    WITH h AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                      count(*) AS c
               FROM lineitem GROUP BY 1),
         cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h),
         t AS (SELECT sum(c) AS total FROM h)
    SELECT CAST(i.i - 1 AS BIGINT) AS brk,
           (SELECT min(v) FROM cum, t WHERE cum * 8 >= t.total * i.i) AS value_cents
    FROM (SELECT unnest(range(1, 8)) AS i) i ORDER BY brk
"""


def q_histogram_sketch_breaks(sf_dir: str):
    """classBreaks over l_extendedprice via the Ben-Haim--Tom-Tov streaming
    sketch (approx, merge-order dependent -> rows-only; numpy oracle in
    tests/test_ray_ops.py)."""
    from .stages.stats import class_breaks

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    breaks = class_breaks(ds, "l_extendedprice", 8)
    return pa.table({"brk": pa.array(np.arange(len(breaks), dtype=np.int64)), "value": pa.array(breaks, pa.float64())})


def q_polygonal_summary(sf_dir: str):
    """Zonal stats over polygon regions: PIP join then grouped sum — the
    PolygonalSummary shape (SURVEY.md §2.5) on the SQL-parity rect grid."""
    import ray

    from .stages.agg import partial_groupby
    from .stages.pip_join import PipJoiner

    polys = gen_polygons_table_cached()
    grid = polys.filter(pa.compute.less(polys["polygon_id"], 128))

    def prep(b: pa.Table) -> pa.Table:
        b = derive_coords_batch(b, "event_id")
        return b.append_column("value_cents", pa.array(_cents(b["value"].to_numpy(zero_copy_only=False)), pa.int64()))

    ds = _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = ds.map_batches(
        PipJoiner,
        fn_constructor_kwargs={"polygons": ray.put(grid), "mode": "inner"},
        batch_format="pyarrow", zero_copy_batch=True, batch_size=4096, concurrency=_pool_size(),
    )
    return partial_groupby(
        joined, ["polygon_id"],
        [("value_cents", "sum", "sum_value_cents"), ("value_cents", "count", "n_events"),
         ("value_cents", "min", "min_value_cents"), ("value_cents", "max", "max_value_cents")],
    final="single")


SQL_POLY_SUMMARY = f"""
    WITH pts AS (
        SELECT *,
               CAST(round(value * 100) AS BIGINT) AS value_cents
        FROM ({SQL_COORDS})
    ),
    rects AS (
        SELECT CAST(i AS BIGINT) AS polygon_id,
               -180.0 + CAST(i % 16 AS DOUBLE) * 22.5 AS xmin,
               -90.0  + CAST(i // 16 AS DOUBLE) * 22.5 AS ymin,
               -180.0 + CAST(i % 16 AS DOUBLE) * 22.5 + 22.5 AS xmax,
               -90.0  + CAST(i // 16 AS DOUBLE) * 22.5 + 22.5 AS ymax
        FROM range(0, 128) t(i)
    )
    SELECT polygon_id,
           CAST(sum(value_cents) AS BIGINT) AS sum_value_cents,
           count(*) AS n_events,
           min(value_cents) AS min_value_cents,
           max(value_cents) AS max_value_cents
    FROM pts JOIN rects
      ON pts.lon >= rects.xmin AND pts.lon < rects.xmax
     AND pts.lat >= rects.ymin AND pts.lat < rects.ymax
    GROUP BY polygon_id
"""


def q_polygonal_summary_fractional(sf_dir: str):
    """Polygonal summary with FRACTIONAL cell weights (FractionalRasterizer
    semantics — the round-4 VERDICT's last missing reference-named
    semantic): half-cell dyadic rect polygons over the mod-251 hash grid
    (Extent(0,0,48,48), cell = 1x1). Every coverage fraction is an exact
    multiple of 1/4, so SH-clip + shoelace on the Ray side and integer
    half-unit interval overlap on the DuckDB side agree bit-for-bit; the
    weighted mean is the same single IEEE division on both."""
    import ray

    from .fixtures import gen_halfcell_rects
    from .stages.stats import polygonal_summary_fractional

    layout = LayoutDefinition(Extent(0.0, 0.0, 48.0, 48.0), TileLayout(3, 3, 16, 16))
    tiles = _hash_grid_layer(3, 16, mod=251)
    return polygonal_summary_fractional(
        tiles, ray.put(gen_halfcell_rects()), layout, concurrency=2)


def _sql_halfcell_rects() -> str:
    """Shared CTE reproducing fixtures.gen_halfcell_rects (integer
    half-unit coordinates, y measured UP from world ymin=0)."""
    from .stages.sample import sql_mix32

    return f"""
    hrects AS (
        SELECT CAST(i AS BIGINT) AS polygon_id,
               ({sql_mix32('i')}) % 80 + 1 AS hx0,
               ({sql_mix32('(i + 9002)')}) % 80 + 1 AS hy0,
               ({sql_mix32('i')}) % 80 + 1
                 + ({sql_mix32('(i + 9001)')}) % 14 + 1 AS hx1,
               ({sql_mix32('(i + 9002)')}) % 80 + 1
                 + ({sql_mix32('(i + 9003)')}) % 14 + 1 AS hy1
        FROM range(0, 60) t(i)
    )"""


def _sql_poly_summary_frac() -> str:
    # grid cell (x, y): x,y are RASTER indices (y counts DOWN from the top);
    # the cell spans world half-units [2x, 2x+2] x [94-2y, 96-2y]. Fraction
    # = overlap_x * overlap_y / 4 — exact dyadic.
    return f"""
    WITH grid AS (
        SELECT x, y, CAST((x * 2654435761 + y * 40503) % 251 AS DOUBLE) AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    {_sql_halfcell_rects().lstrip()},
    cov AS (
        SELECT r.polygon_id, g.v,
               CAST(greatest(0, least(r.hx1, 2 * g.x + 2) - greatest(r.hx0, 2 * g.x)) AS DOUBLE)
             * CAST(greatest(0, least(r.hy1, 96 - 2 * g.y) - greatest(r.hy0, 94 - 2 * g.y)) AS DOUBLE)
             / 4.0 AS frac
        FROM hrects r JOIN grid g
          ON 2 * g.x < r.hx1 AND 2 * g.x + 2 > r.hx0
         AND 96 - 2 * g.y > r.hy0 AND 94 - 2 * g.y < r.hy1
    ),
    agg AS (
        SELECT polygon_id,
               count(*) AS n_cells,
               sum(frac) AS area,
               sum(frac * v) AS wsum,
               min(v) AS min_v,
               max(v) AS max_v
        FROM cov WHERE frac > 0
        GROUP BY polygon_id
    )
    SELECT polygon_id, n_cells, area, wsum, min_v, max_v,
           wsum / area AS wmean
    FROM agg
    """


def q_resample_minmax_grid(sf_dir: str):
    """Max/Min/Sum decimating resample kernels (completing the survey's
    resample row) through the REAL layer_resample stage: each 16x16 tile of
    the mod-251 hash grid box-aggregates to 4x4, so global target cell
    (gx//4, gy//4) takes the min/max/sum of its 4x4 source block —
    integer-exact, bit-identical in DuckDB. Rows: (kernel, cell_x, cell_y,
    density)."""
    from .stages.layer_ops import layer_resample

    outs = []
    for kern in ("min", "max", "sum"):
        r = layer_resample(_hash_grid_layer(3, 16, mod=251), 4, 4, kern)
        cells = _explode_tiles_to_cells(r, value_cast="float64", drop_zero=False)
        outs.append(cells.map_batches(
            lambda b, k=kern: b.append_column(
                "kernel", pa.array([k] * b.num_rows, pa.string())),
            batch_format="pyarrow", zero_copy_batch=True))
    return outs[0].union(outs[1]).union(outs[2])


SQL_RESAMPLE_MINMAX = """
    WITH grid AS (
        SELECT x, y, (x * 2654435761 + y * 40503) % 251 AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    agg AS (
        SELECT x // 4 AS cell_x, y // 4 AS cell_y,
               CAST(min(v) AS DOUBLE) AS mn,
               CAST(max(v) AS DOUBLE) AS mx,
               CAST(sum(v) AS DOUBLE) AS sm
        FROM grid GROUP BY 1, 2
    )
    SELECT cell_x, cell_y, mn AS density, 'min' AS kernel FROM agg
    UNION ALL
    SELECT cell_x, cell_y, mx AS density, 'max' AS kernel FROM agg
    UNION ALL
    SELECT cell_x, cell_y, sm AS density, 'sum' AS kernel FROM agg
"""


def q_reproject_bilinear_grid(sf_dir: str):
    """Kernel raster-layer reproject (r5: ``reproject_layer(method=
    "bilinear")``) through the REAL buffered-collar path: the mod-251 hash
    grid (Extent(0,0,48,48), 3x3 tiles of 16x16) warped onto a half-cell-
    shifted single-tile layout (identity CRS), so every dst cell center
    lands exactly on a src cell CORNER -> bilinear = the 4-neighbor
    average with all weights 0.25 (dyadic, exact in IEEE) -> bit-identical
    to DuckDB's (v00+v10+v01+v11)/4.0. Every dst cell whose support
    crosses a 16-cell tile boundary draws from buffer_tiles collars (both
    axes + the diagonal), so a seam bug shows as a band of mismatches."""
    from .stages.reproject import reproject_layer

    src = LayoutDefinition(Extent(0.0, 0.0, 48.0, 48.0), TileLayout(3, 3, 16, 16))
    dst = LayoutDefinition(Extent(0.5, 0.5, 47.5, 47.5), TileLayout(1, 1, 47, 47))
    out = reproject_layer(_hash_grid_layer(3, 16, mod=251), src, dst,
                          "latlng", "latlng", method="bilinear")
    return _explode_tiles_to_cells(out, value_cast="float64", drop_zero=False)


SQL_REPROJECT_BILINEAR = """
    WITH grid AS (
        SELECT x, y, (x * 2654435761 + y * 40503) % 251 AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    )
    SELECT g00.x AS cell_x, g00.y AS cell_y,
           CAST(g00.v + g10.v + g01.v + g11.v AS DOUBLE) / 4.0 AS density
    FROM grid g00
    JOIN grid g10 ON g10.x = g00.x + 1 AND g10.y = g00.y
    JOIN grid g01 ON g01.x = g00.x AND g01.y = g00.y + 1
    JOIN grid g11 ON g11.x = g00.x + 1 AND g11.y = g00.y + 1
"""


def q_spacetime_counts(sf_dir: str):
    """SpaceTimeKey layer: (key_col, key_row, daily time_bin) counts; the Ray
    path also carries the Z3 sfc3 key (dropped before output)."""
    from .stages.agg import partial_groupby
    from .stages.spacetime import assign_spacetime_key_batch

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", ["event_id", "ts"]).map_batches(
        lambda b: _tile_keys_z4(derive_coords_batch(b, "event_id")),
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(
        lambda b: assign_spacetime_key_batch(b, ts_col="ts", time_bin_us=DAY_US),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    out = partial_groupby(ds, ["key_col", "key_row", "time_bin"], [("key_col", "count", "n")], final="single")
    return out


SQL_SPACETIME = f"""
    WITH pts AS ({SQL_COORDS})
    SELECT {SQL_KEYS_Z4}, epoch_us(ts) // 86400000000 AS time_bin, count(*) AS n
    FROM pts GROUP BY key_col, key_row, time_bin
"""


def q_events_sliding_window(sf_dir: str):
    """Overlapping-window aggregate (span 2h, slide 1h — each event lands in
    2 windows): count + sum per (event_type, window_start). The windowed-
    aggregate custom operator (stages/window.py), SQL-checked against a
    DuckDB explode-join."""
    from .stages.window import sliding_window_agg

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "ts": b["ts"], "event_type": b["event_type"],
            "value_cents": pa.array(_cents(b["value"].to_numpy(zero_copy_only=False)), pa.int64()),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return sliding_window_agg(
        prepped, ["event_type"],
        [("value_cents", "count", "n"), ("value_cents", "sum", "sum_value_cents")],
        ts_col="ts", span_us=7_200_000_000, slide_us=3_600_000_000,
    )


SQL_SLIDING = """
    SELECT event_type,
           (epoch_us(ts) // 3600000000 - j) * 3600000000 AS window_start,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM events CROSS JOIN range(0, 2) t(j)
    GROUP BY event_type, window_start
"""


def q_events_asof_prev(sf_dir: str):
    """As-of self join (LAG): for every event, the previous same-type
    event's value_cents in (ts, event_id) order; -1 for partition firsts.
    Distributed via one range sort + vectorized block lag + O(blocks)
    boundary stitch (stages/window.py); SQL-checked against DuckDB's
    window LAG."""
    from .stages.window import as_of_prev

    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"], "ts": b["ts"], "event_type": b["event_type"],
            "value_cents": pa.array(_cents(b["value"].to_numpy(zero_copy_only=False)), pa.int64()),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return as_of_prev(prepped, "event_type", "ts", "event_id", "value_cents", sentinel=-1)


SQL_ASOF = """
    SELECT event_id, event_type,
           COALESCE(lag(CAST(round(value * 100) AS BIGINT))
                    OVER (PARTITION BY event_type ORDER BY ts, event_id), -1)
               AS prev_value_cents
    FROM events
"""


def q_events_asof_next(sf_dir: str):
    """As-of forward join (LEAD): for every event, the NEXT same-type
    event's value_cents in (ts, event_id) order; -1 for partition lasts.
    Same one-sort + O(#blocks) stitch as the LAG twin with the lag
    direction and boundary patch mirrored (stages/window.py:as_of_next);
    SQL-checked against DuckDB's window LEAD."""
    from .stages.window import as_of_next

    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"], "ts": b["ts"], "event_type": b["event_type"],
            "value_cents": pa.array(_cents(b["value"].to_numpy(zero_copy_only=False)), pa.int64()),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return as_of_next(prepped, "event_type", "ts", "event_id", "value_cents", sentinel=-1)


SQL_ASOF_NEXT = """
    SELECT event_id, event_type,
           COALESCE(lead(CAST(round(value * 100) AS BIGINT))
                    OVER (PARTITION BY event_type ORDER BY ts, event_id), -1)
               AS next_value_cents
    FROM events
"""


def q_moving_avg_events(sf_dir: str):
    """5-row moving sum / mean of value_cents per user (SUM ... OVER ROWS
    BETWEEN 4 PRECEDING AND CURRENT ROW) — stages/window.moving_window_sum:
    window_rank's exact running sums off ONE range sort, then the k-row
    window recovered as rsum[rn]-rsum[rn-k] via one slim (part, rn)
    self hash-join; mov_avg is a single IEEE division of exact ints
    (SQL-bit-identical). Money travels as integer cents."""
    from .stages.window import moving_window_sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b["event_id"], "user_id": b["user_id"], "ts": b["ts"],
            "value_cents": pa.array(_cents(b["value"].to_numpy(zero_copy_only=False)), pa.int64()),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    out = moving_window_sum(prepped, "user_id", "ts", "event_id", "value_cents", k=5)
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "mov_sum", "w_n", "mov_avg"]),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_MOVING_AVG = """
    SELECT event_id, user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS mov_sum,
           CAST(least(ROW_NUMBER() OVER
                (PARTITION BY user_id ORDER BY ts, event_id), 5) AS BIGINT) AS w_n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE)
               / least(ROW_NUMBER() OVER
                 (PARTITION BY user_id ORDER BY ts, event_id), 5) AS mov_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


def q_semi_anti_join(sf_dir: str):
    """Broadcast semi + anti join on tile keys (stages/join.py:
    semi_join_keys — no shuffle): events keyed at z4, kept if their zorder
    sfc is in a fixed 32-key set (semi) and counted per key; the anti side
    contributes a disjoint row marker. SQL-checked via IN / NOT IN."""
    from .core.sfc import zorder
    from .stages.agg import partial_groupby
    from .stages.join import semi_join_keys

    key_set = [int(zorder(c, r)) for c in range(4, 12) for r in range(4, 8)]

    def prep(b: pa.Table) -> pa.Table:
        b = _tile_keys_z4(derive_coords_batch(b, "event_id"))
        s = zorder(
            b["key_col"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["key_row"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return pa.table({"event_id": b["event_id"],
                         "sfc": pa.array(s.astype(np.uint64), pa.uint64())})

    pts = _read(sf_dir, "events", ["event_id"]).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    )
    semi = semi_join_keys(pts, key_set, key_col="sfc", anti=False).map_batches(
        lambda b: pa.table({"side": pa.array(["semi"] * b.num_rows, pa.string()),
                            "event_id": b["event_id"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    anti = semi_join_keys(pts, key_set, key_col="sfc", anti=True).map_batches(
        lambda b: pa.table({"side": pa.array(["anti"] * b.num_rows, pa.string()),
                            "event_id": b["event_id"]}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return partial_groupby(
        semi.union(anti), ["side"],
        [("event_id", "count", "n"), ("event_id", "min", "min_event")],
        final="single")


SQL_SEMI_ANTI = f"""
    WITH pts AS ({SQL_COORDS}),
    keyed AS (
        SELECT event_id, {SQL_KEYS_Z4}
        FROM pts
    ),
    tagged AS (
        -- the engine's explicit 32-zorder-key set == this key box
        SELECT event_id,
               CASE WHEN key_col BETWEEN 4 AND 11 AND key_row BETWEEN 4 AND 7
                    THEN 'semi' ELSE 'anti' END AS side
        FROM keyed
    )
    SELECT side, count(*) AS n, min(event_id) AS min_event FROM tagged GROUP BY side
"""


def q_overlay_rects(sf_dir: str):
    """Vector overlay (convex-clip intersection, stages/overlay.py): the 128
    world grid rects x the 112 half-cell-shifted rects; output (polygon_id,
    right_id, area). SQL-checked — box-intersection areas are exact closed
    forms on dyadic coordinates."""
    import pyarrow.compute as pc
    import ray.data

    from .core.wkb import encode_polygon
    from .stages.overlay import overlay_intersection

    polys = gen_polygons_table_cached()
    grid = polys.filter(pc.less(polys["polygon_id"], 128)).select(["polygon_id", "wkb"])
    rows = []
    for j in range(7):
        for i in range(16):
            xmin, ymin = -180.0 + i * 22.5, -90.0 + j * 22.5 + 5.625
            ring = [(xmin, ymin), (xmin + 22.5, ymin), (xmin + 22.5, ymin + 22.5), (xmin, ymin + 22.5)]
            rows.append({"polygon_id": j * 16 + i, "wkb": encode_polygon([ring])})
    right = pa.Table.from_pylist(rows, schema=pa.schema([("polygon_id", pa.int64()), ("wkb", pa.binary())]))
    out = overlay_intersection(ray.data.from_arrow(grid), right)
    return out.select_columns(["polygon_id", "right_id", "area"])


SQL_OVERLAY = """
    WITH lefts AS (
        SELECT CAST(i AS BIGINT) AS polygon_id,
               -180.0 + CAST(i % 16 AS DOUBLE) * 22.5 AS lx0,
               -90.0  + CAST(i // 16 AS DOUBLE) * 22.5 AS ly0
        FROM range(0, 128) t(i)
    ),
    rights AS (
        SELECT CAST(j AS BIGINT) AS right_id,
               -180.0 + CAST(j % 16 AS DOUBLE) * 22.5 AS rx0,
               -90.0  + CAST(j // 16 AS DOUBLE) * 22.5 + 5.625 AS ry0
        FROM range(0, 112) t(j)
    )
    SELECT polygon_id, right_id,
           (LEAST(lx0 + 22.5, rx0 + 22.5) - GREATEST(lx0, rx0))
         * (LEAST(ly0 + 22.5, ry0 + 22.5) - GREATEST(ly0, ry0)) AS area
    FROM lefts JOIN rights
      ON LEAST(lx0 + 22.5, rx0 + 22.5) > GREATEST(lx0, rx0)
     AND LEAST(ly0 + 22.5, ry0 + 22.5) > GREATEST(ly0, ry0)
"""


def q_overlay_general(sf_dir: str):
    """GENERAL vector overlay (non-convex boolean ops, core/polyclip.py via
    stages/overlay.py:overlay_general_batch): 64 L-shaped (concave) polygons
    x 56 half-cell-shifted rectangles; for every pair with a non-empty
    intersection emit intersection / union / difference areas — three real
    boolean_op code paths per pair. SQL-checked exactly: each L decomposes
    into 2 disjoint axis rects, all coords integer, so every area is an
    exact closed form in both engines."""
    import ray.data

    from .core import polyclip
    from .core.wkb import decode as wkb_decode
    from .core.wkb import encode_polygon

    lrows = []
    for i in range(64):
        x0, y0 = (i % 8) * 50.0, (i // 8) * 25.0
        ring = [(x0, y0), (x0 + 40, y0), (x0 + 40, y0 + 10), (x0 + 20, y0 + 10),
                (x0 + 20, y0 + 20), (x0, y0 + 20)]
        lrows.append({"polygon_id": i, "wkb": encode_polygon([ring])})
    left = pa.Table.from_pylist(lrows, schema=pa.schema(
        [("polygon_id", pa.int64()), ("wkb", pa.binary())]))

    right_rows = []
    for j in range(56):
        rx0, ry0 = (j % 8) * 50.0 + 25.0, (j // 8) * 25.0 + 12.0
        ring = [(rx0, ry0), (rx0 + 40, ry0), (rx0 + 40, ry0 + 20), (rx0, ry0 + 20)]
        right_rows.append({
            "id": j,
            "geom": {"type": "Polygon",
                     "rings": [np.array(ring, dtype=np.float64)]},
            "area": 800.0,
        })

    def ops_batch(b: pa.Table) -> pa.Table:
        lids, rids, inter_a, union_a, diff_a = [], [], [], [], []
        for k, buf in enumerate(b["wkb"].to_pylist()):
            geom = wkb_decode(buf)
            lid = b["polygon_id"][k].as_py()
            l_area = polyclip.rings_signed_area(polyclip.geom_polygons(geom))
            for rr in right_rows:
                inter = polyclip.boolean_op(geom, rr["geom"], "intersection")
                if inter is None:
                    continue
                ia = polyclip.rings_signed_area(polyclip.geom_polygons(inter))
                if ia <= 0.0:
                    continue
                uni = polyclip.boolean_op(geom, rr["geom"], "union")
                dif = polyclip.boolean_op(geom, rr["geom"], "difference")
                ua = polyclip.rings_signed_area(polyclip.geom_polygons(uni))
                da = (polyclip.rings_signed_area(polyclip.geom_polygons(dif))
                      if dif is not None else 0.0)
                lids.append(lid); rids.append(rr["id"])
                inter_a.append(ia); union_a.append(ua); diff_a.append(da)
        return pa.table({
            "polygon_id": pa.array(lids, pa.int64()),
            "right_id": pa.array(rids, pa.int64()),
            "inter_area": pa.array(inter_a, pa.float64()),
            "union_area": pa.array(union_a, pa.float64()),
            "diff_area": pa.array(diff_a, pa.float64()),
        })

    return ray.data.from_arrow(left).map_batches(
        ops_batch, batch_format="pyarrow", zero_copy_batch=True)


SQL_OVERLAY_GENERAL = """
    WITH lefts AS (
        SELECT CAST(i AS BIGINT) AS polygon_id,
               CAST(i % 8 AS DOUBLE) * 50.0 AS x0,
               CAST(i // 8 AS DOUBLE) * 25.0 AS y0
        FROM range(0, 64) t(i)
    ),
    rights AS (
        SELECT CAST(j AS BIGINT) AS right_id,
               CAST(j % 8 AS DOUBLE) * 50.0 + 25.0 AS rx0,
               CAST(j // 8 AS DOUBLE) * 25.0 + 12.0 AS ry0
        FROM range(0, 56) t(j)
    ),
    pairs AS (
        SELECT polygon_id, right_id,
               -- L = bottom rect [x0,y0,x0+40,y0+10] + top-left rect
               -- [x0,y0+10,x0+20,y0+20] (disjoint), R = [rx0,ry0,rx0+40,ry0+20]
               GREATEST(0, LEAST(x0 + 40, rx0 + 40) - GREATEST(x0, rx0))
             * GREATEST(0, LEAST(y0 + 10, ry0 + 20) - GREATEST(y0, ry0))
             + GREATEST(0, LEAST(x0 + 20, rx0 + 40) - GREATEST(x0, rx0))
             * GREATEST(0, LEAST(y0 + 20, ry0 + 20) - GREATEST(y0 + 10, ry0))
               AS inter_area
        FROM lefts CROSS JOIN rights
    )
    SELECT polygon_id, right_id, inter_area,
           600.0 + 800.0 - inter_area AS union_area,
           600.0 - inter_area AS diff_area
    FROM pairs WHERE inter_area > 0
"""


def q_buffer_geoms(sf_dir: str):
    """Geometry buffer (core/buffer.py Minkowski construction via
    stages/overlay.py:buffer_features): 96 deterministic axis-aligned rects,
    per-row distance — dilate (two radii, rounded-rect result) and erode
    (sharp shrunk rect, incl. vanish past the inradius). SQL-checked: the
    dilated area is the exact rounded-rect closed form w*h + 2*(w+h)*r +
    ngon_area(r) with the same 32-gon disc DuckDB can state as
    16*r^2*sin(pi/16); erosion is (w-2|r|)*(h-2|r|) clamped at 0. Both sides
    round to 6 decimals (float-ulp tolerance, values are irrational)."""
    import pyarrow.compute as pc
    import ray.data

    from .core.wkb import encode_polygon
    from .stages.overlay import buffer_features

    rows = []
    for i in range(96):
        w, h = 2.0 + (i % 8), 1.0 + (i % 5)
        x0, y0 = (i % 12) * 30.0 - 180.0, (i // 12) * 20.0 - 80.0
        r = (0.5, 0.25, -0.6)[i % 3]
        ring = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]
        rows.append({"polygon_id": i, "dist": r, "wkb": encode_polygon([ring])})
    tab = pa.Table.from_pylist(rows, schema=pa.schema(
        [("polygon_id", pa.int64()), ("dist", pa.float64()), ("wkb", pa.binary())]))
    out = buffer_features(ray.data.from_arrow(tab), dist_col="dist", quad_segs=8)
    return out.map_batches(
        lambda b: pa.table({"polygon_id": b["polygon_id"],
                            "buf_area": pc.round(b["buf_area"], 6)}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_BUFFER = """
    WITH t AS (
        SELECT CAST(i AS BIGINT) AS polygon_id,
               2.0 + CAST(i % 8 AS DOUBLE) AS w,
               1.0 + CAST(i % 5 AS DOUBLE) AS h,
               CASE i % 3 WHEN 0 THEN 0.5 WHEN 1 THEN 0.25 ELSE -0.6 END AS r
        FROM range(0, 96) t(i)
    )
    SELECT polygon_id,
           round(CASE
               WHEN r >= 0 THEN w*h + 2.0*(w+h)*r + 16.0*r*r*sin(pi()/16.0)
               WHEN w + 2.0*r > 0 AND h + 2.0*r > 0 THEN (w + 2.0*r) * (h + 2.0*r)
               ELSE 0.0 END, 6) AS buf_area
    FROM t
"""


def q_range_join(sf_dir: str):
    """Bucketed interval join (1-D PBSM, stages/join.py:range_join): event
    values x 64 overlapping deterministic intervals [i*12.5, i*12.5+20),
    counted per interval. SQL-checked against a DuckDB theta join."""
    import ray
    import ray.data

    from .stages.agg import partial_groupby
    from .stages.join import range_join

    ivs = pa.table({
        "interval_id": pa.array(np.arange(64, dtype=np.int64), pa.int64()),
        "lo": pa.array(np.arange(64) * 12.5, pa.float64()),
        "hi": pa.array(np.arange(64) * 12.5 + 20.0, pa.float64()),
    })
    pts = _read(sf_dir, "events", ["event_id", "value"])
    joined = range_join(pts, ray.data.from_arrow(ivs), "value", "lo", "hi",
                        bucket_width=12.5, num_partitions=max(2, min(16, _pool_size(frac=2))))
    return partial_groupby(
        joined, ["interval_id"],
        [("event_id", "count", "n"), ("event_id", "min", "min_event")],
        final="single")


SQL_RANGE_JOIN = """
    WITH ivs AS (
        SELECT CAST(i AS BIGINT) AS interval_id,
               CAST(i AS DOUBLE) * 12.5 AS lo,
               CAST(i AS DOUBLE) * 12.5 + 20.0 AS hi
        FROM range(0, 64) t(i)
    )
    SELECT interval_id, count(*) AS n, min(event_id) AS min_event
    FROM events JOIN ivs ON events.value >= ivs.lo AND events.value < ivs.hi
    GROUP BY interval_id
"""


def q_pbsm_join(sf_dir: str):
    """Large-large spatial join via PBSM (ClipToGrid explode -> sfc equi-join
    -> vectorized PIP refine; stages/join.py): events x 112 HALF-CELL-SHIFTED
    world rects. The +5.625-degree y-shift makes rect pieces NOT fully cover
    their cells, so the exact-refine path actually executes (full=False).
    SQL-checkable: shifted edges never coincide with a derivable lat
    (verified exhaustively over all sf tiers), and vertical edges follow the
    same half-open rule q_pip_rect_grid already hash-validated."""
    import ray
    import ray.data

    from .core.sfc import zorder
    from .core.wkb import encode_polygon
    from .stages.agg import partial_groupby
    from .stages.join import pbsm_spatial_join

    rows = []
    for j in range(7):
        for i in range(16):
            xmin, ymin = -180.0 + i * 22.5, -90.0 + j * 22.5 + 5.625
            ring = [(xmin, ymin), (xmin + 22.5, ymin), (xmin + 22.5, ymin + 22.5), (xmin, ymin + 22.5)]
            rows.append({"polygon_id": j * 16 + i, "wkb": encode_polygon([ring])})
    polys = ray.data.from_arrow(
        pa.Table.from_pylist(rows, schema=pa.schema([("polygon_id", pa.int64()), ("wkb", pa.binary())]))
    )

    def prep(b: pa.Table) -> pa.Table:
        b = _tile_keys_z4(derive_coords_batch(b, "event_id"))
        s = zorder(
            b["key_col"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["key_row"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return pa.table(
            {"event_id": b["event_id"], "lat": b["lat"], "lon": b["lon"],
             "sfc": pa.array(s.astype(np.uint64), pa.uint64())}
        )

    pts = _read(sf_dir, "events", ["event_id"]).map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    )
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    joined = pbsm_spatial_join(pts, polys, LATLNG_Z4, zoom=4,
                               num_partitions=max(2, min(16, cpus // 2)))
    return partial_groupby(
        joined, ["polygon_id"],
        [("event_id", "count", "n_docs"), ("event_id", "min", "min_event")],
    final="single")


SQL_PBSM = f"""
    WITH pts AS ({SQL_COORDS}),
    rects AS (
        SELECT CAST(i AS BIGINT) AS polygon_id,
               -180.0 + CAST(i % 16 AS DOUBLE) * 22.5 AS xmin,
               -90.0  + CAST(i // 16 AS DOUBLE) * 22.5 + 5.625 AS ymin,
               -180.0 + CAST(i % 16 AS DOUBLE) * 22.5 + 22.5 AS xmax,
               -90.0  + CAST(i // 16 AS DOUBLE) * 22.5 + 5.625 + 22.5 AS ymax
        FROM range(0, 112) t(i)
    )
    SELECT polygon_id, count(*) AS n_docs, min(event_id) AS min_event
    FROM pts JOIN rects
      ON pts.lon >= rects.xmin AND pts.lon < rects.xmax
     AND pts.lat >= rects.ymin AND pts.lat < rects.ymax
    GROUP BY polygon_id
"""


def _layer_roundtrip(sf_dir: str, kind: str):
    """Layer store end-to-end on the SQL-parity grid: write the z4 tile
    counts as an SFC-sorted bucketed layer, read back with a KeyBounds
    Intersects query (range decomposition + row-group pushdown + exact
    re-filter — sources/layer.py), return the surviving per-key counts."""
    import shutil

    from .core.layout import KeyBounds, TileLayerMetadata
    from .core.sfc import sfc_key
    from .sources.layer import read_layer, write_layer

    tiles = q_tile_assign_events(sf_dir)

    def addsfc(b: pa.Table) -> pa.Table:
        s = sfc_key(
            b["key_col"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["key_row"].to_numpy(zero_copy_only=False).astype(np.int64),
            4, kind,
        )
        return b.append_column("sfc", pa.array(s.astype(np.uint64), pa.uint64()))

    keyed = tiles.map_batches(addsfc, batch_format="pyarrow", zero_copy_batch=True)
    meta = TileLayerMetadata(
        cell_type="int64", layout=LATLNG_Z4, extent=LATLNG_Z4.extent,
        crs="latlng", bounds=KeyBounds(0, 0, 15, 15), zoom=4,
    )
    cat = f"/tmp/graft_layer_rt_{os_basename(sf_dir)}_{kind}"
    shutil.rmtree(cat, ignore_errors=True)
    write_layer(keyed, cat, "tiles", 4, metadata=meta, sfc_kind=kind)
    out = read_layer(cat, "tiles", 4, intersects=KeyBounds(4, 2, 11, 6))
    return out.select_columns(["key_col", "key_row", "n_docs"])


def q_layer_roundtrip_zorder(sf_dir: str):
    return _layer_roundtrip(sf_dir, "zorder")


def q_layer_roundtrip_hilbert(sf_dir: str):
    return _layer_roundtrip(sf_dir, "hilbert")


SQL_LAYER_RT = f"""
    WITH pts AS ({SQL_COORDS}),
    z4 AS (SELECT {SQL_KEYS_Z4}, count(*) AS n_docs FROM pts GROUP BY key_col, key_row)
    SELECT key_col, key_row, n_docs FROM z4
    WHERE key_col BETWEEN 4 AND 11 AND key_row BETWEEN 2 AND 6
"""


# ---------------------------------------------------------------------------
# layer-operator queries (rows-only: tile payloads are not SQL-expressible)
# ---------------------------------------------------------------------------

def _toy_layer(sf_dir: str, seed: int = 0):
    """Deterministic 4x4 layer of 16x16 tiles derived from event counts."""
    import ray.data

    from .core.raster import encode_tile
    from .core.sfc import zorder as _z

    rng = np.random.default_rng(seed)
    rows = []
    for c in range(4):
        for r in range(4):
            a = rng.uniform(1.0, 9.0, (16, 16))
            a[rng.random((16, 16)) < 0.1] = np.nan
            cells, cols, trows, ct = encode_tile(a)
            rows.append({"key_col": c, "key_row": r, "sfc": int(_z(c, r)),
                         "cells": cells, "cols": cols, "rows": trows, "cell_type": ct})
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _mix_layer(seed: int):
    """Deterministic 4x4-key layer of 16x16 tiles over a 64x64 world: cell
    (gr, gc) -> value mix32(idx + seed*100000) % 997 + 1 (integer-valued
    float64), NoData (NaN) iff mix32(idx + seed*100000 + 50000) % 7 == 0 —
    both reproducible verbatim in DuckDB (idx + offsets stay < 2^27, the
    sql_mix32 BIGINT bound). Same schema as _toy_layer (sfc = zorder)."""
    import ray.data

    from .core.raster import encode_tile
    from .core.sfc import zorder as _z
    from .stages.sample import mix32

    idx = np.arange(64 * 64, dtype=np.int64)
    v = (mix32(idx + seed * 100000) % 997 + 1).astype(np.float64)
    v[mix32(idx + seed * 100000 + 50000) % 7 == 0] = np.nan
    world = v.reshape(64, 64)
    rows = []
    for c in range(4):
        for r in range(4):
            a = world[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16]
            cells, cols, trows, ct = encode_tile(a)
            rows.append({"key_col": c, "key_row": r, "sfc": int(_z(c, r)),
                         "cells": cells, "cols": cols, "rows": trows, "cell_type": ct})
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _tile_stats_batch(b: pa.Table) -> pa.Table:
    from .core.raster import decode_tile

    nd, sv, mn, mx = [], [], [], []
    for row in b.to_pylist():
        t = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
        fin = t[np.isfinite(t)]
        nd.append(int(fin.size))
        sv.append(int(fin.sum()))
        mn.append(int(fin.min()))
        mx.append(int(fin.max()))
    return pa.table({"key_col": b["key_col"].cast(pa.int64()),
                     "key_row": b["key_row"].cast(pa.int64()),
                     "n_defined": pa.array(nd, pa.int64()),
                     "sum_val": pa.array(sv, pa.int64()),
                     "min_val": pa.array(mn, pa.int64()),
                     "max_val": pa.array(mx, pa.int64())})


def _sql_mix_layer_cells() -> str:
    """Shared CTE: per-cell values + NoData flags of _mix_layer(1)/(2)."""
    from .stages.sample import sql_mix32

    return f"""
    cells AS (
        SELECT CAST(i // 64 AS BIGINT) AS gr, CAST(i % 64 AS BIGINT) AS gc,
               ({sql_mix32('(i + 100000)')}) % 997 + 1 AS va,
               ({sql_mix32('(i + 150000)')}) % 7 = 0 AS na,
               ({sql_mix32('(i + 200000)')}) % 997 + 1 AS vb,
               ({sql_mix32('(i + 250000)')}) % 7 = 0 AS nb
        FROM range(0, 4096) t(i)
    )"""


def q_layer_algebra_sums(sf_dir: str):
    """Local map algebra SQL-bit-exact through the REAL layer paths:
    out = (A * 2) + B with layer_local_scalar (per-batch cube kernel) and
    layer_local_binary (sfc hash-join then cell-wise op), over the
    _mix_layer pair. NoData (NaN) propagates through both ops exactly as
    SQL NULL does through CASE; integer-valued cells keep every sum exact.
    Per-tile (n_defined, sum, min, max)."""
    from .stages.layer_ops import layer_local_binary, layer_local_scalar

    a = layer_local_scalar(_mix_layer(1), "multiply", 2.0)
    out = layer_local_binary(a, _mix_layer(2), "add", num_partitions=4)
    return out.map_batches(_tile_stats_batch, batch_format="pyarrow", zero_copy_batch=True)


def _sql_layer_algebra_sums() -> str:
    return f"""
    WITH {_sql_mix_layer_cells()},
    vals AS (
        SELECT gc // 16 AS key_col, gr // 16 AS key_row,
               CASE WHEN na OR nb THEN NULL ELSE 2 * va + vb END AS v
        FROM cells
    )
    SELECT key_col, key_row, count(v) AS n_defined,
           CAST(sum(v) AS BIGINT) AS sum_val,
           CAST(min(v) AS BIGINT) AS min_val, CAST(max(v) AS BIGINT) AS max_val
    FROM vals GROUP BY 1, 2
    """


def q_merge_layers_sums(sf_dir: str):
    """merge_layers (union + groupby(key) left-wins-non-NoData merge)
    SQL-bit-exact on the _mix_layer pair: cell = A if A defined else B
    else NoData. Per-tile (n_defined, sum, min, max)."""
    from .stages.layer_ops import merge_layers

    out = merge_layers(_mix_layer(1), _mix_layer(2))
    return out.map_batches(_tile_stats_batch, batch_format="pyarrow", zero_copy_batch=True)


def _sql_merge_layers_sums() -> str:
    return f"""
    WITH {_sql_mix_layer_cells()},
    vals AS (
        SELECT gc // 16 AS key_col, gr // 16 AS key_row,
               CASE WHEN NOT na THEN va WHEN NOT nb THEN vb ELSE NULL END AS v
        FROM cells
    )
    SELECT key_col, key_row, count(v) AS n_defined,
           CAST(sum(v) AS BIGINT) AS sum_val,
           CAST(min(v) AS BIGINT) AS min_val, CAST(max(v) AS BIGINT) AS max_val
    FROM vals GROUP BY 1, 2
    """


def q_layer_algebra_toy(sf_dir: str):
    from .stages.layer_ops import layer_local_binary, layer_local_scalar, layer_local_unary

    a = layer_local_scalar(_toy_layer(sf_dir, 0), "multiply", 2.0)
    b = layer_local_unary(_toy_layer(sf_dir, 1), "sqrt")
    out = layer_local_binary(a, b, "add", num_partitions=4)
    return out.select_columns(["key_col", "key_row", "cols", "rows"])


def q_buffer_focal_toy(sf_dir: str):
    from .stages.layer_ops import focal_mean

    out = focal_mean(_toy_layer(sf_dir, 2), margin=1)
    return out.select_columns(["key_col", "key_row", "cols", "rows"])


def q_geojson_cliptogrid(sf_dir: str):
    """GeoJSON as a real pipeline source: fixture polygons exported to
    GeoJSON files under /tmp, read back distributed (read_geojson), then
    ClipToGrid per feature — (polygon_id, n_keys). Rows-only; byte-exact
    geometry round-trips are pytest-verified (test_geojson)."""
    import json
    import os

    from .core import wkb as wkb_mod
    from .core.geojson import geom_to_geojson, read_geojson
    from .stages.clip import clip_to_grid_batch

    d = f"/tmp/graft_geojson_{os_basename(sf_dir)}"
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        tab = gen_polygons_table_cached()
        geoms = [wkb_mod.decode(b) for b in tab["wkb"].to_pylist()]
        pids = tab["polygon_id"].to_pylist()
        for k in range(4):
            feats = [
                {"type": "Feature", "geometry": geom_to_geojson(geoms[i]),
                 "properties": {"polygon_id": pids[i]}}
                for i in range(len(geoms)) if i % 4 == k
            ]
            with open(f"{d}/part-{k}.geojson", "w") as f:
                json.dump({"type": "FeatureCollection", "features": feats}, f)
    layout = LayoutDefinition(Extent(-180.0, -90.0, 180.0, 90.0), TileLayout(16, 16, 32, 32))
    ds = read_geojson(d)

    def with_pid(b: pa.Table) -> pa.Table:
        import json as _json

        pids = pa.array([_json.loads(p)["polygon_id"] for p in b["properties"].to_pylist()], pa.int64())
        return pa.table({"polygon_id": pids, "wkb": b["wkb"]})

    exploded = ds.map_batches(with_pid, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        lambda b: clip_to_grid_batch(b, layout), batch_format="pyarrow", zero_copy_batch=True
    )
    from .stages.agg import partial_groupby

    return partial_groupby(exploded, ["polygon_id"],
                           [("polygon_id", "count", "n_keys")], final="single")


_CD_SOURCES = (131, 3251)  # global cell ids: (gr=2,gc=3), (gr=50,gc=51)


def q_cost_distance_grid(sf_dir: str):
    """IterativeCostDistance SQL-BIT-EXACT. Cost distance is a min-plus
    fixpoint: cell cost = min over 8-neighbor predecessors of
    (pred_cost + (0.5*(f_pred+f_cell))*dist), dist 1 or sqrt(2). Every
    term is float-reproducible — frictions are dyadic ({1.0, 1.25} from
    mix32), sqrt(2) is correctly rounded in both numpy and DuckDB, float
    '+' with a nonneg addend is monotone so the least fixpoint is a min
    over per-path left-folds that both sides compute bit-identically —
    so the engine's BSP collar-exchange rounds (stages/costdistance.py)
    and the oracle's synchronous Bellman-Ford levels (unrolled CTE chain,
    jenks-style) converge to the SAME float surface. Blocked (NoData)
    cells: mix32 %41 (~2.4%), excluded from the graph on both sides.
    Output: (gr, gc, cost) per reached cell."""
    import ray.data

    from .core.raster import encode_tile
    from .core.sfc import zorder as _z
    from .stages.costdistance import cost_distance, cost_tile
    from .stages.sample import mix32

    idx = np.arange(64 * 64, dtype=np.int64)
    f = (1.0 + 0.25 * (mix32(idx + 300000) % 2)).astype(np.float64)
    blocked = (mix32(idx + 350000) % 41 == 0) & ~np.isin(idx, np.array(_CD_SOURCES))
    f[blocked] = np.nan
    world = f.reshape(64, 64)
    rows = []
    for c in range(4):
        for r in range(4):
            cells, cols, trows, ct = encode_tile(world[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16])
            rows.append({"key_col": c, "key_row": r, "sfc": int(_z(c, r)),
                         "cells": cells, "cols": cols, "rows": trows, "cell_type": ct})
    friction = ray.data.from_arrow(pa.Table.from_pylist(rows))
    srcs = [(gid % 64 // 16, gid // 64 // 16, gid // 64 % 16, gid % 64 % 16)
            for gid in _CD_SOURCES]
    out = cost_distance(friction, srcs, max_rounds=16)

    def per_cell(b: pa.Table) -> pa.Table:
        gr, gc, cost = [], [], []
        for row in b.to_pylist():
            ctile = cost_tile(row)
            rr, cc = np.nonzero(np.isfinite(ctile))
            gr.extend((row["key_row"] * 16 + rr).tolist())
            gc.extend((row["key_col"] * 16 + cc).tolist())
            cost.extend(ctile[rr, cc].tolist())
        return pa.table({"gr": pa.array(gr, pa.int64()), "gc": pa.array(gc, pa.int64()),
                         "cost": pa.array(cost, pa.float64())})

    return out.map_batches(per_cell, batch_format="pyarrow", zero_copy_batch=True)


def _sql_cost_distance_grid(levels: int = 160) -> str:
    from .stages.sample import sql_mix32

    src = ", ".join(f"({g}, 0.0)" for g in _CD_SOURCES)
    not_src = ", ".join(str(g) for g in _CD_SOURCES)
    parts = [f"""
    WITH nodes AS (
        SELECT CAST(i AS BIGINT) AS cell, CAST(i // 64 AS BIGINT) AS gr,
               CAST(i % 64 AS BIGINT) AS gc,
               1.0 + 0.25 * (({sql_mix32('(i + 300000)')}) % 2) AS f
        FROM range(0, 4096) t(i)
        WHERE NOT (({sql_mix32('(i + 350000)')}) % 41 = 0
                   AND i NOT IN ({not_src}))
    ),
    moves(dr, dc) AS (VALUES (-1,-1), (-1,0), (-1,1), (0,-1), (0,1),
                             (1,-1), (1,0), (1,1)),
    edges AS MATERIALIZED (
        -- 8-neighbor moves plus a weight-0 self loop (cost + 0.0 == cost
        -- exactly for costs >= 0), so each Bellman-Ford level references
        -- the previous level ONCE. Every chained CTE is MATERIALIZED:
        -- DuckDB 1.0 otherwise inlines the whole chain into one plan
        -- (20 inlined levels = 10.5 s and superlinear; 160 materialized
        -- levels = 2.5 s total, measured)
        SELECT a.cell AS src, b.cell AS dst,
               (0.5 * (a.f + b.f))
                 * (CASE WHEN m.dr != 0 AND m.dc != 0 THEN sqrt(2.0)
                         ELSE 1.0 END) AS w
        FROM nodes a
        JOIN moves m ON TRUE
        JOIN nodes b ON b.gr = a.gr + m.dr AND b.gc = a.gc + m.dc
        UNION ALL
        SELECT cell, cell, 0.0 FROM nodes
    ),
    lvl0(cell, cost) AS (VALUES {src})"""]
    for k in range(1, levels + 1):
        parts.append(f""",
    lvl{k} AS MATERIALIZED (
        SELECT e.dst AS cell, min(l.cost + e.w) AS cost
        FROM lvl{k - 1} l JOIN edges e ON e.src = l.cell
        GROUP BY e.dst
    )""")
    parts.append(f"""
    SELECT n.gr, n.gc, l.cost
    FROM lvl{levels} l JOIN nodes n ON n.cell = l.cell
    """)
    return "".join(parts)


def q_hydrology_grid(sf_dir: str):
    """D8 hydrology SQL-BIT-EXACT (rows-only family member q_hydrology_toy
    remains). Flow direction is an argmax-first scan over drops
    (z_c - z_n) / dist with dist 1 or the correctly-rounded sqrt(2) — every
    drop is float-reproducible on an integer DEM, and strict-> running-max
    semantics equal "min D8 order among drops == max" — and flow
    accumulation over the resulting functional graph is the exact integer
    upstream count, which the oracle recomputes as a recursive-CTE
    transitive closure (heights mix32 % 32, so flow paths are <= 31 steps).
    Output: (gr, gc, dir, acc) per cell."""
    import ray.data

    from .core.raster import decode_tile, encode_tile
    from .core.sfc import zorder as _z
    from .stages.hydrology import acc_tile, flow_accumulation, flow_direction
    from .stages.sample import mix32

    idx = np.arange(64 * 64, dtype=np.int64)
    dem = (mix32(idx + 650000) % 32).astype(np.float64).reshape(64, 64)
    rows = []
    for c in range(4):
        for r in range(4):
            cells, cols, trows, ct = encode_tile(dem[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16])
            rows.append({"key_col": c, "key_row": r, "sfc": int(_z(c, r)),
                         "cells": cells, "cols": cols, "rows": trows, "cell_type": ct})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    dirs = flow_direction(ds).materialize()
    acc = flow_accumulation(dirs, max_rounds=64)

    def per_cell(b: pa.Table) -> pa.Table:
        gr, gc, dcode, av = [], [], [], []
        for row in b.to_pylist():
            d = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
            a = acc_tile(row)
            rr, cc = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
            gr.extend((row["key_row"] * 16 + rr).ravel().tolist())
            gc.extend((row["key_col"] * 16 + cc).ravel().tolist())
            dcode.extend(d.astype(np.int64).ravel().tolist())
            av.extend(a.astype(np.int64).ravel().tolist())
        return pa.table({"gr": pa.array(gr, pa.int64()), "gc": pa.array(gc, pa.int64()),
                         "dir": pa.array(dcode, pa.int64()), "acc": pa.array(av, pa.int64())})

    return acc.map_batches(per_cell, batch_format="pyarrow", zero_copy_batch=True)


def _sql_hydrology_grid() -> str:
    from .stages.sample import sql_mix32

    return f"""
    WITH RECURSIVE nodes AS MATERIALIZED (
        SELECT CAST(i // 64 AS BIGINT) AS gr, CAST(i % 64 AS BIGINT) AS gc,
               CAST(({sql_mix32('(i + 650000)')}) % 32 AS DOUBLE) AS z
        FROM range(0, 4096) t(i)
    ),
    moves(ord, dr, dc, code) AS (
        VALUES (0, 0, 1, 1), (1, 1, 1, 2), (2, 1, 0, 4), (3, 1, -1, 8),
               (4, 0, -1, 16), (5, -1, -1, 32), (6, -1, 0, 64), (7, -1, 1, 128)
    ),
    drops AS MATERIALIZED (
        SELECT a.gr, a.gc, m.ord, m.code,
               (a.z - b.z) / (CASE WHEN m.dr != 0 AND m.dc != 0
                                   THEN sqrt(2.0) ELSE 1.0 END) AS drop
        FROM nodes a JOIN moves m ON TRUE
        JOIN nodes b ON b.gr = a.gr + m.dr AND b.gc = a.gc + m.dc
    ),
    ranked AS MATERIALIZED (
        SELECT gr, gc, code, drop,
               row_number() OVER (PARTITION BY gr, gc
                                  ORDER BY drop DESC, ord ASC) AS rn
        FROM drops
    ),
    dirs AS MATERIALIZED (
        SELECT gr, gc, CASE WHEN drop > 0 THEN code ELSE 0 END AS dir
        FROM ranked WHERE rn = 1
    ),
    edges AS MATERIALIZED (
        SELECT d.gr * 64 + d.gc AS src,
               (d.gr + m.dr) * 64 + (d.gc + m.dc) AS dst
        FROM dirs d JOIN moves m ON m.code = d.dir
        WHERE d.dir != 0
    ),
    paths AS (
        SELECT src AS u, dst AS c FROM edges
        UNION ALL
        SELECT p.u, e.dst FROM paths p JOIN edges e ON e.src = p.c
    ),
    accs AS (
        SELECT c, CAST(count(*) AS BIGINT) AS acc FROM paths GROUP BY c
    )
    SELECT d.gr, d.gc, CAST(d.dir AS BIGINT) AS dir, coalesce(a.acc, 0) AS acc
    FROM dirs d LEFT JOIN accs a ON a.c = d.gr * 64 + d.gc
    """


_VS_VR, _VS_VC, _VS_OBS = 31, 33, 3.0


def q_viewshed_grid(sf_dir: str):
    """Distributed XDraw viewshed SQL-BIT-EXACT (rows-only family member
    q_viewshed_toy remains). The XDraw recurrence is acyclic in Chebyshev
    rings — each cell's horizon is max(own angle, linear interp of the two
    ring-(k-1) upstream horizons) — so the engine's BSP collar-exchange
    fixpoint (stages/viewshed.py) equals strict ring-order evaluation, and
    every float op is reproducible: integer DEM, angles (z - vh) /
    sqrt(dr^2 + dc^2) (correctly-rounded sqrt of an exact integer — NOT
    np.hypot, which is only faithfully rounded), crossing weights
    dc*(adr-1)/adr with one rounding each, and the literal
    (1-w)*h0 + w*h1 interp shape. The oracle (_sql_viewshed_grid) replays
    rings 1..33 as MATERIALIZED CTE levels and matched the full horizon
    plane float-for-float (4096/4096) at build time. Output: (gr, gc,
    horizon, visible) per cell."""
    import ray.data

    from .core.raster import encode_tile
    from .core.sfc import zorder as _z
    from .stages.sample import mix32
    from .stages.viewshed import viewshed, visibility_tile

    idx = np.arange(64 * 64, dtype=np.int64)
    dem = (mix32(idx + 600000) % 400).astype(np.float64).reshape(64, 64)
    rows = []
    for c in range(4):
        for r in range(4):
            cells, cols, trows, ct = encode_tile(dem[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16])
            rows.append({"key_col": c, "key_row": r, "sfc": int(_z(c, r)),
                         "cells": cells, "cols": cols, "rows": trows, "cell_type": ct})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out, (vr, vc, vh) = viewshed(ds, (_VS_VR, _VS_VC), observer_height=_VS_OBS,
                                 max_rounds=24)

    def per_cell(b: pa.Table) -> pa.Table:
        gr, gc, hz, vis = [], [], [], []
        for row in b.to_pylist():
            h = np.frombuffer(row["horizon"], dtype="<f8").reshape(16, 16)
            v = visibility_tile(row, vr, vc, vh, 16, 16)
            rr, cc = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
            gr.extend((row["key_row"] * 16 + rr).ravel().tolist())
            gc.extend((row["key_col"] * 16 + cc).ravel().tolist())
            hz.extend(h.ravel().tolist())
            vis.extend(v.ravel().tolist())
        return pa.table({"gr": pa.array(gr, pa.int64()), "gc": pa.array(gc, pa.int64()),
                         "horizon": pa.array(hz, pa.float64()),
                         "visible": pa.array(vis, pa.bool_())})

    return out.map_batches(per_cell, batch_format="pyarrow", zero_copy_batch=True)


def _sql_viewshed_grid(max_ring: int = 33) -> str:
    from .stages.sample import sql_mix32

    vr, vc, obs = _VS_VR, _VS_VC, _VS_OBS
    parts = [f"""
    WITH cells AS MATERIALIZED (
        SELECT CAST(i // 64 AS BIGINT) AS gr, CAST(i % 64 AS BIGINT) AS gc,
               CAST(({sql_mix32('(i + 600000)')}) % 400 AS DOUBLE) AS z
        FROM range(0, 4096) t(i)
    ),
    vh AS (SELECT z + {obs} AS v FROM cells WHERE gr = {vr} AND gc = {vc}),
    base AS MATERIALIZED (
        SELECT c.gr, c.gc,
               greatest(abs(c.gr - {vr}), abs(c.gc - {vc})) AS ring,
               CASE WHEN c.gr = {vr} AND c.gc = {vc}
                    THEN CAST('-infinity' AS DOUBLE)
                    ELSE (c.z - vh.v) / sqrt(CAST((c.gr - {vr}) * (c.gr - {vr})
                                                + (c.gc - {vc}) * (c.gc - {vc}) AS DOUBLE))
               END AS ang,
               (abs(c.gr - {vr}) >= abs(c.gc - {vc})) AS row_major,
               CAST(c.gr - {vr} AS DOUBLE) AS dr, CAST(c.gc - {vc} AS DOUBLE) AS dc,
               CAST(abs(c.gr - {vr}) AS DOUBLE) AS adr,
               CAST(abs(c.gc - {vc}) AS DOUBLE) AS adc
        FROM cells c CROSS JOIN vh
    ),
    ups AS MATERIALIZED (
        -- upstream pair one step closer along the dominant axis; both
        -- endpoints land exactly on Chebyshev ring (k-1) (in-bounds for this
        -- viewpoint by the |x_cross - vc| <= adr-1 bound)
        SELECT gr, gc, ring, ang, row_major,
               CASE WHEN row_major THEN gr - CAST(sign(dr) AS BIGINT)
                    ELSE CAST(floor({vr} + (dr * (adc - 1.0)) / adc) AS BIGINT) END AS u0r,
               CASE WHEN row_major THEN CAST(floor({vc} + (dc * (adr - 1.0)) / adr) AS BIGINT)
                    ELSE gc - CAST(sign(dc) AS BIGINT) END AS u0c,
               CASE WHEN row_major
                    THEN ({vc} + (dc * (adr - 1.0)) / adr)
                         - floor({vc} + (dc * (adr - 1.0)) / adr)
                    ELSE ({vr} + (dr * (adc - 1.0)) / adc)
                         - floor({vr} + (dr * (adc - 1.0)) / adc) END AS wgt
        FROM base WHERE ring > 0
    ),
    r0 AS MATERIALIZED (
        SELECT CAST({vr} AS BIGINT) AS gr, CAST({vc} AS BIGINT) AS gc,
               CAST('-infinity' AS DOUBLE) AS h
    )"""]
    for k in range(1, max_ring + 1):
        parts.append(f""",
    r{k} AS MATERIALIZED (
        SELECT b.gr, b.gc,
               greatest(b.ang,
                        CASE WHEN b.wgt = 0 THEN h0.h
                             ELSE (1.0 - b.wgt) * h0.h + b.wgt * h1.h END) AS h
        FROM ups b
        JOIN r{k - 1} h0 ON h0.gr = b.u0r AND h0.gc = b.u0c
        LEFT JOIN r{k - 1} h1
               ON h1.gr = (CASE WHEN b.row_major THEN b.u0r ELSE b.u0r + 1 END)
              AND h1.gc = (CASE WHEN b.row_major THEN b.u0c + 1 ELSE b.u0c END)
        WHERE b.ring = {k}
    )""")
    union = " UNION ALL ".join(f"SELECT * FROM r{k}" for k in range(0, max_ring + 1))
    parts.append(f""",
    allh AS ({union})
    SELECT a.gr, a.gc, a.h AS horizon,
           (a.h <= b.ang + 1e-9) OR (a.gr = {vr} AND a.gc = {vc}) AS visible
    FROM allh a JOIN base b ON b.gr = a.gr AND b.gc = a.gc
    """)
    return "".join(parts)


def q_render_png_grid(sf_dir: str):
    """ColorMap + PNG render round-trip SQL-checked: _mix_layer(5) tiles ->
    ColorMap (integer breaks, digitize right=True) -> encode_png_rgba ->
    decode_png (the REAL codec pair from core/render.py + core/media.py),
    then per-tile channel sums over the decoded pixels. NoData renders
    transparent (0,0,0,0), so every output column has an integer closed
    form on the mix32 cell stream."""
    from .core.media import decode_png
    from .core.raster import decode_tile
    from .core.render import ColorMap, render_tile_png

    breaks = [200, 400, 600, 800, 997]
    colors = [(10 + 40 * i, 5 + 50 * i, 20 + 30 * i, 255) for i in range(5)]
    cm = ColorMap(breaks, colors)

    def roundtrip(b: pa.Table) -> pa.Table:
        sums = {"sum_r": [], "sum_g": [], "sum_b": [], "sum_a": []}
        for row in b.to_pylist():
            t = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
            rgba = decode_png(render_tile_png(t, cm))
            for j, k in enumerate(("sum_r", "sum_g", "sum_b", "sum_a")):
                sums[k].append(int(rgba[:, :, j].astype(np.int64).sum()))
        return pa.table({"key_col": b["key_col"].cast(pa.int64()),
                         "key_row": b["key_row"].cast(pa.int64()),
                         **{k: pa.array(v, pa.int64()) for k, v in sums.items()}})

    return _mix_layer(5).map_batches(roundtrip, batch_format="pyarrow", zero_copy_batch=True)


def _sql_render_png_grid() -> str:
    from .stages.sample import sql_mix32

    chan = []
    for name, base, step in (("sum_r", 10, 40), ("sum_g", 5, 50),
                             ("sum_b", 20, 30), ("sum_a", 255, 0)):
        chan.append(f"""CAST(sum(CASE WHEN nd THEN 0
               WHEN v <= 200 THEN {base} WHEN v <= 400 THEN {base + step}
               WHEN v <= 600 THEN {base + 2 * step}
               WHEN v <= 800 THEN {base + 3 * step}
               ELSE {base + 4 * step} END) AS BIGINT) AS {name}""")
    cols = ",\n           ".join(chan)
    return f"""
    WITH cells AS (
        SELECT CAST(i // 64 AS BIGINT) AS gr, CAST(i % 64 AS BIGINT) AS gc,
               ({sql_mix32('(i + 500000)')}) % 997 + 1 AS v,
               ({sql_mix32('(i + 550000)')}) % 7 = 0 AS nd
        FROM range(0, 4096) t(i)
    )
    SELECT gc // 16 AS key_col, gr // 16 AS key_row,
           {cols}
    FROM cells GROUP BY 1, 2
    """


def q_cost_distance_toy(sf_dir: str):
    """IterativeCostDistance (stages/costdistance.py): BSP rounds of collar
    exchange + vectorized in-tile relaxation over the toy friction layer;
    per-tile count of reached cells + sum of finite costs (rows-only;
    exactness pytest-verified against a brute Dijkstra oracle)."""
    from .stages.costdistance import cost_distance, cost_tile

    out = cost_distance(_toy_layer(sf_dir, 4), [(0, 0, 2, 3), (3, 3, 10, 10)], max_rounds=16)

    def summarize(b: pa.Table) -> pa.Table:
        n_reached, cost_sum = [], []
        for row in b.to_pylist():
            c = cost_tile(row)
            finite = np.isfinite(c)
            n_reached.append(int(finite.sum()))
            cost_sum.append(float(np.round(c[finite].sum(), 6)))
        return pa.table({"key_col": b["key_col"], "key_row": b["key_row"],
                         "n_reached": pa.array(n_reached, pa.int64()),
                         "cost_sum": pa.array(cost_sum, pa.float64())})

    return out.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)


def q_hydrology_toy(sf_dir: str):
    """D8 hydrology (stages/hydrology.py): flow direction over a NaN-filled
    toy DEM, then BSP flow accumulation; per-tile max accumulation + pit
    count (rows-only; exactness pytest-verified vs brute D8 + Kahn
    topological accumulation)."""
    from .core.raster import decode_tile as _dt, encode_tile as _et
    from .stages.hydrology import acc_tile, flow_accumulation, flow_direction

    def fill(b: pa.Table) -> pa.Table:
        cells = []
        for row in b.to_pylist():
            a = _dt(row["cells"], row["cols"], row["rows"], row["cell_type"])
            cells.append(_et(np.nan_to_num(a, nan=5.0))[0])
        return b.set_column(b.schema.get_field_index("cells"), "cells",
                            pa.array(cells, pa.binary()))

    dem = _toy_layer(sf_dir, 7).map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
    dirs = flow_direction(dem).materialize()
    acc = flow_accumulation(dirs, max_rounds=32)

    def summarize(b: pa.Table) -> pa.Table:
        mx, pits = [], []
        for row in b.to_pylist():
            a = acc_tile(row)
            d = _dt(row["cells"], row["cols"], row["rows"], row["cell_type"])
            mx.append(float(np.nanmax(a)) if np.isfinite(a).any() else 0.0)
            pits.append(int((d == 0).sum()))
        return pa.table({"key_col": b["key_col"], "key_row": b["key_row"],
                         "max_acc": pa.array(mx, pa.float64()),
                         "n_pits": pa.array(pits, pa.int64())})

    return acc.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)


def q_viewshed_toy(sf_dir: str):
    """Distributed XDraw viewshed (stages/viewshed.py): horizon propagation
    over the toy layer as a DEM; per-tile visible-cell count (rows-only;
    exactness pytest-verified against an independent ring-order reference)."""
    from .stages.viewshed import viewshed, visibility_tile

    base = _toy_layer(sf_dir, 5)

    # the toy layer has NoData holes; viewshed v1 wants a NaN-free DEM
    def fill(b: pa.Table) -> pa.Table:
        from .core.raster import decode_tile as dt, encode_tile as et

        cells = []
        for row in b.to_pylist():
            a = dt(row["cells"], row["cols"], row["rows"], row["cell_type"])
            a = np.nan_to_num(a, nan=5.0)
            cells.append(et(a)[0])
        return b.set_column(b.schema.get_field_index("cells"), "cells",
                            pa.array(cells, pa.binary()))

    dem = base.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
    out, (vr, vc, vh) = viewshed(dem, (17, 22), observer_height=3.0, max_rounds=12)

    def summarize(b: pa.Table) -> pa.Table:
        ns = [int(visibility_tile(r, vr, vc, vh, 16, 16).sum()) for r in b.to_pylist()]
        return pa.table({"key_col": b["key_col"], "key_row": b["key_row"],
                         "n_visible": pa.array(ns, pa.int64())})

    return out.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)


def q_terrain_toy(sf_dir: str):
    """Terrain surface ops (Horn slope / aspect / hillshade over buffered
    collars) + bilinear layer resample — per-tile mean of each product
    (rows-only; exactness pytest-verified against mosaic brute force)."""
    from .stages.layer_ops import batch_to_cube, focal_hillshade, focal_slope, layer_resample

    base = _toy_layer(sf_dir, 3)
    slope = focal_slope(base, 30.0, 30.0)
    hs = focal_hillshade(_toy_layer(sf_dir, 3), 30.0, 30.0)
    resampled = layer_resample(_toy_layer(sf_dir, 3), 8, 8, "bilinear")

    def summarize(tag):
        def f(b: pa.Table) -> pa.Table:
            cube = batch_to_cube(b)
            means = np.nanmean(cube.reshape(cube.shape[0], -1), axis=1) if cube.size else np.array([])
            return pa.table({
                "op": pa.array([tag] * b.num_rows, pa.string()),
                "key_col": b["key_col"], "key_row": b["key_row"],
                "mean_val": pa.array(means, pa.float64()),
            })
        return f

    out = slope.map_batches(summarize("slope"), batch_format="pyarrow", zero_copy_batch=True)
    out = out.union(hs.map_batches(summarize("hillshade"), batch_format="pyarrow", zero_copy_batch=True))
    return out.union(resampled.map_batches(summarize("resample_bilinear"), batch_format="pyarrow", zero_copy_batch=True))


_KD_LAYOUT = None


def _mod_filter(col: str, m: int):
    """Vectorized id %% m == 0 batch filter (Ray's filter(expr=...) grammar
    has no modulo)."""
    def f(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(v % m == 0))
    return f


def _kd_layout():
    """64x64-cell world grid over (-180,-85,180,85): cell w=5.625 and
    h=2.65625 are exact binary doubles, so Ray and DuckDB floor() agree."""
    global _KD_LAYOUT
    if _KD_LAYOUT is None:
        from .core.layout import Extent, LayoutDefinition, TileLayout

        _KD_LAYOUT = LayoutDefinition(Extent(-180.0, -85.0, 180.0, 85.0),
                                      TileLayout(4, 4, 16, 16))
    return _KD_LAYOUT


def _explode_tiles_to_cells(ds, value_cast="int64", drop_zero=True):
    """Tile layer -> (cell_x, cell_y, density) global-cell rows."""
    from .core.raster import decode_tile

    def explode(b: pa.Table) -> pa.Table:
        xs, ys, vs = [], [], []
        kcs = b["key_col"].to_numpy(zero_copy_only=False)
        krs = b["key_row"].to_numpy(zero_copy_only=False)
        for i in range(b.num_rows):
            tc, tr = int(b["cols"][i].as_py()), int(b["rows"][i].as_py())
            t = decode_tile(b["cells"][i].as_py(), tc, tr, b["cell_type"][i].as_py())
            m = (t != 0) & ~np.isnan(t) if drop_zero else ~np.isnan(t)
            ry, rx = np.nonzero(m)
            xs.append(int(kcs[i]) * tc + rx)
            ys.append(int(krs[i]) * tr + ry)
            vs.append(t[ry, rx])
        if not xs:
            return pa.table({"cell_x": pa.array([], pa.int64()),
                             "cell_y": pa.array([], pa.int64()),
                             "density": pa.array([], getattr(pa, value_cast)())})
        v = np.concatenate(vs)
        return pa.table({
            "cell_x": pa.array(np.concatenate(xs).astype(np.int64), pa.int64()),
            "cell_y": pa.array(np.concatenate(ys).astype(np.int64), pa.int64()),
            "density": pa.array(v.astype(np.int64) if value_cast == "int64" else v,
                                getattr(pa, value_cast)()),
        })

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def q_kernel_density(sf_dir: str):
    """KernelDensity (stages/interpolation.kernel_density): every event
    stamps a square kernel (radius 2 cells, weight 1) on the 64x64 world
    grid; slim (key, cell, w) explode -> groupby(key) paint. Integer sums
    with a square kernel -> bit-exact SQL parity (the oracle explodes each
    point to its 5x5 stamp with two unnest ranges)."""
    from .stages.interpolation import kernel_density

    ds = _read(sf_dir, "events", ["event_id"])
    pts = ds.map_batches(lambda b: derive_coords_batch(b, "event_id"),
                         batch_format="pyarrow", zero_copy_batch=True)
    kd = kernel_density(pts, _kd_layout(), radius=2, kernel="square",
                        x_col="lon", y_col="lat")
    return _explode_tiles_to_cells(kd, value_cast="int64")


SQL_KERNEL_DENSITY = f"""
    WITH pts AS ({SQL_COORDS}),
    cell AS (
        SELECT CAST(floor((lon - (-180.0)) / 5.625) AS BIGINT) AS cx,
               CAST(floor((85.0 - lat) / 2.65625) AS BIGINT) AS cy
        FROM pts
    ),
    stamp AS (
        SELECT cx + dx AS x, cy + dy AS y
        FROM cell,
             LATERAL (SELECT unnest(range(-2, 3)) AS dx) a,
             LATERAL (SELECT unnest(range(-2, 3)) AS dy) b
    )
    SELECT x AS cell_x, y AS cell_y, count(*) AS density
    FROM stamp WHERE x BETWEEN 0 AND 63 AND y BETWEEN 0 AND 63
    GROUP BY x, y
"""


def _hash_grid_layer(n_tiles: int = 3, tile: int = 16, mod: int = 3):
    """Deterministic SQL-expressible categorical raster:
    val(x, y) = (x * 2654435761 + y * 40503) % mod over an
    (n_tiles*tile)^2 grid, cut into tiles."""
    import ray.data

    from .core.raster import encode_tile
    from .core.sfc import zorder as _z

    rows = []
    for kr in range(n_tiles):
        for kc in range(n_tiles):
            gy = kr * tile + np.arange(tile)[:, None]
            gx = kc * tile + np.arange(tile)[None, :]
            a = ((gx * 2654435761 + gy * 40503) % mod).astype(np.float64)
            cells, cols, trows, ct = encode_tile(a)
            rows.append({"key_col": kc, "key_row": kr, "sfc": int(_z(kc, kr)),
                         "cells": cells, "cols": cols, "rows": trows,
                         "cell_type": ct})
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _hash_grid_st_layer(n_tiles: int = 3, tile: int = 16, mod: int = 97,
                        nt: int = 5):
    """SpaceTime variant of the hash grid: one layer per time bin t with
    val(x, y, t) = (x*2654435761 + y*40503 + t*69069) % mod."""
    import ray.data

    from .core.raster import encode_tile
    from .core.sfc import zorder as _z

    rows = []
    for t in range(nt):
        for kr in range(n_tiles):
            for kc in range(n_tiles):
                gy = kr * tile + np.arange(tile)[:, None]
                gx = kc * tile + np.arange(tile)[None, :]
                a = ((gx * 2654435761 + gy * 40503 + t * 69069) % mod).astype(np.float64)
                cells, cols, trows, ct = encode_tile(a)
                rows.append({"key_col": kc, "key_row": kr, "time_bin": t,
                             "sfc": int(_z(kc, kr)), "cells": cells,
                             "cols": cols, "rows": trows, "cell_type": ct})
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


_SQL_ST_GRID = """
        SELECT x, y, t, (x * 2654435761 + y * 40503 + t * 69069) % 97 AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y),
             (SELECT unnest(range(0, 5)) AS t)
"""


def q_cluster_eps(sf_dir: str):
    """Distance-threshold point clustering (stages/cluster.py:cluster_eps,
    eps=8 deg over the ~events/397 subsample): grid-bucketed pair
    generation + the shared labels_from_edges component engine.
    SQL-checked bit-exact — DuckDB recomputes the eps-graph with the
    identical float compare and labels components via a recursive
    transitive closure (min reachable id)."""
    from .stages.cluster import cluster_eps

    ds = _read(sf_dir, "events", ["event_id"])
    ds = ds.map_batches(_mod_filter("event_id", 397), batch_format="pyarrow",
                        zero_copy_batch=True)
    pts = ds.map_batches(
        lambda b: (lambda t: pa.table({"pt_id": t["event_id"],
                                       "x": t["lon"], "y": t["lat"]}))(
            derive_coords_batch(b, "event_id")),
        batch_format="pyarrow", zero_copy_batch=True)
    return cluster_eps(pts, 8.0)


SQL_CLUSTER_EPS = f"""
    WITH RECURSIVE pts AS (
        SELECT event_id AS id, lon AS x, lat AS y
        FROM ({SQL_COORDS}) WHERE event_id % 397 = 0
    ),
    edges AS (
        SELECT a.id AS ia, b.id AS ib
        FROM pts a JOIN pts b
          ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             <= 8.0 * 8.0
    ),
    reach(id, lab) AS (
        SELECT id, id FROM pts
        UNION
        SELECT e.ib, r.lab FROM reach r JOIN edges e ON e.ia = r.id
    )
    SELECT id AS pt_id, min(lab) AS cluster_id
    FROM reach GROUP BY id
"""


def q_temporal_theil_sen(sf_dir: str):
    """Per-pixel Theil–Sen robust trend
    (stages/temporal.py:temporal_theil_sen) over the 5-bin SpaceTime hash
    grid. SQL-checked round-9: the 10 pairwise slopes per cell are exact
    integer divisions; only the even-count median interpolation ((m1+m2)/2)
    can differ at the last ulp."""
    import pyarrow.compute as pc

    from .stages.temporal import temporal_theil_sen

    out = temporal_theil_sen(_hash_grid_st_layer())
    cells = _explode_tiles_to_cells(out, value_cast="float64", drop_zero=False)
    return cells.map_batches(
        lambda b: pa.table({"cell_x": b["cell_x"], "cell_y": b["cell_y"],
                            "density": pc.round(b["density"], 9)}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_TEMPORAL_THEIL_SEN = f"""
    WITH st AS ({_SQL_ST_GRID}),
    pairs AS (
        SELECT a.x, a.y,
               CAST(b.v - a.v AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS s
        FROM st a JOIN st b ON a.x = b.x AND a.y = b.y AND b.t > a.t
    )
    SELECT x AS cell_x, y AS cell_y, round(median(s), 9) AS density
    FROM pairs GROUP BY x, y
"""


def q_layer_update(sf_dir: str):
    """LayerWriter.update (sources/layer.py:update_layer): write the
    mod-251 hash grid as a bucketed layer, update ONE tile (key 1,1) with
    a different hash, read back and explode. Only the touched bucket is
    rewritten (pytest asserts byte-identity of the rest); SQL-checked
    bit-exact via a CASE on the updated tile's cell range."""
    import tempfile

    import ray.data

    from .core.raster import encode_tile
    from .core.sfc import zorder as _z
    from .sources.layer import read_layer, update_layer, write_layer

    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        write_layer(_hash_grid_layer(3, 16, mod=251), td, "upd", 4,
                    bucket_shift=1)
        gy = 16 + np.arange(16)[:, None]
        gx = 16 + np.arange(16)[None, :]
        a = ((gx * 7 + gy * 11) % 50).astype(np.float64)
        cells, cols, trows, ct = encode_tile(a)
        upd = ray.data.from_arrow(pa.Table.from_pylist([{
            "key_col": 1, "key_row": 1, "sfc": int(_z(1, 1)), "cells": cells,
            "cols": cols, "rows": trows, "cell_type": ct}]))
        update_layer(upd, td, "upd", 4)
        out = read_layer(td, "upd", 4)
        cells_out = _explode_tiles_to_cells(out, value_cast="int64",
                                            drop_zero=False)
        # materialize inside the tempdir's lifetime
        return cells_out.to_pandas()


SQL_LAYER_UPDATE = """
    SELECT x AS cell_x, y AS cell_y,
           CASE WHEN x BETWEEN 16 AND 31 AND y BETWEEN 16 AND 31
                THEN (x * 7 + y * 11) % 50
                ELSE (x * 2654435761 + y * 40503) % 251 END AS density
    FROM (SELECT unnest(range(0, 48)) AS x),
         (SELECT unnest(range(0, 48)) AS y)
"""


def q_temporal_median(sf_dir: str):
    """Per-pixel temporal MEDIAN composite across 5 time bins
    (stages/temporal.py:temporal_composite — the cloud-free-composite
    pattern): one groupby(key) co-locates each pixel column's tiles, the
    reduce is a vectorized (T,R,C) stack median. SQL-checked bit-exact
    (odd bin count -> the middle element)."""
    from .stages.temporal import temporal_composite

    out = temporal_composite(_hash_grid_st_layer(), "median")
    return _explode_tiles_to_cells(out, value_cast="float64", drop_zero=False)


SQL_TEMPORAL_MEDIAN = f"""
    SELECT x AS cell_x, y AS cell_y, median(v) AS density
    FROM ({_SQL_ST_GRID})
    GROUP BY x, y
"""


def q_temporal_trend(sf_dir: str):
    """Per-pixel OLS slope of value vs time bin
    (stages/temporal.py:temporal_trend). SQL-checked bit-exact: with 5
    integer bins every sum/product is exact in float64 and the single
    division has identical operands on both sides."""
    from .stages.temporal import temporal_trend

    out = temporal_trend(_hash_grid_st_layer())
    return _explode_tiles_to_cells(out, value_cast="float64", drop_zero=False)


SQL_TEMPORAL_TREND = f"""
    SELECT x AS cell_x, y AS cell_y,
           (5.0 * sum(CAST(t AS DOUBLE) * v) - 10.0 * sum(v))
           / (5.0 * 30.0 - 10.0 * 10.0) AS density
    FROM ({_SQL_ST_GRID})
    GROUP BY x, y
"""


def q_convex_hull(sf_dir: str):
    """Distributed convex hull (stages/overlay.py:convex_hull_stage):
    per-block monotone chain + exact single-block merge of the tiny partial
    hulls, over the ~events/211 subsample. SQL-checked with the O(n^3)
    supporting-line characterization: p is on the hull boundary iff some
    other point q has EVERY remaining point left of (or on) the line p->q.
    Collinear edge points are INCLUDED on both sides — the derived
    coordinates contain exact arithmetic-progression collinear runs, and
    only the boundary-point (not strict-vertex) set is block-mergeable."""
    from .stages.overlay import convex_hull_stage

    ds = _read(sf_dir, "events", ["event_id"])
    ds = ds.map_batches(_mod_filter("event_id", 211), batch_format="pyarrow",
                        zero_copy_batch=True)
    pts = ds.map_batches(lambda b: derive_coords_batch(b, "event_id"),
                         batch_format="pyarrow", zero_copy_batch=True)
    return convex_hull_stage(pts, x_col="lon", y_col="lat")


SQL_CONVEX_HULL = f"""
    WITH pts AS (
        SELECT lon, lat FROM ({SQL_COORDS}) WHERE event_id % 211 = 0
    )
    SELECT DISTINCT p.lon, p.lat
    FROM pts p JOIN pts q ON (p.lon != q.lon OR p.lat != q.lat)
    WHERE NOT EXISTS (
        SELECT 1 FROM pts r
        WHERE (r.lon != p.lon OR r.lat != p.lat)
          AND (r.lon != q.lon OR r.lat != q.lat)
          AND (q.lon - p.lon) * (r.lat - p.lat)
            - (q.lat - p.lat) * (r.lon - p.lon) < 0
    )
"""


def q_equalize(sf_dir: str):
    """Histogram equalization over a distributed layer
    (stages/enhance.py:equalize_layer): global value CDF via one slim
    aggregate, broadcast remap per tile. SQL-checked — the mapping
    T(v) = lo + floor((cdf(v)-cdf(lo))*(hi-lo)/(N-cdf(lo))) is exact
    integer arithmetic DuckDB reproduces with a window cumsum."""
    from .stages.enhance import equalize_layer

    eq = equalize_layer(_hash_grid_layer(3, 16, mod=251))
    return _explode_tiles_to_cells(eq, value_cast="int64", drop_zero=False)


SQL_EQUALIZE = """
    WITH grid AS (
        SELECT x, y, (x * 2654435761 + y * 40503) % 251 AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    stats AS (SELECT min(v) AS lo, max(v) AS hi, count(*) AS n FROM grid),
    cum AS (
        SELECT v, sum(cnt) OVER (ORDER BY v) AS cdf
        FROM (SELECT v, count(*) AS cnt FROM grid GROUP BY v)
    ),
    c0 AS (SELECT cdf AS cdf_lo FROM cum ORDER BY v LIMIT 1)
    SELECT g.x AS cell_x, g.y AS cell_y,
           CAST(s.lo + floor((m.cdf - c.cdf_lo) * (s.hi - s.lo)
                             / (s.n - c.cdf_lo)) AS BIGINT) AS density
    FROM grid g JOIN cum m ON g.v = m.v, stats s, c0 c
"""


def q_terrain_slope_grid(sf_dir: str):
    """Horn slope (stages/layer_ops.py:focal_slope) over the mod-251 hash
    grid, cell size 30x30. SQL-checked round-9: the grid value is a closed
    form of (x, y), so DuckDB computes all 8 Horn neighbors directly from
    the formula (out-of-grid neighbors substitute the center value, exactly
    the NaN-collar rule of _horn_gradients); only atan/hypot differ at the
    last ulp, absorbed by rounding an O(1)-magnitude output to 9 dp."""
    import pyarrow.compute as pc

    from .stages.layer_ops import focal_slope

    out = focal_slope(_hash_grid_layer(3, 16, mod=251), 30.0, 30.0)
    cells = _explode_tiles_to_cells(out, value_cast="float64", drop_zero=False)
    return cells.map_batches(
        lambda b: pa.table({"cell_x": b["cell_x"], "cell_y": b["cell_y"],
                            "density": pc.round(b["density"], 9)}),
        batch_format="pyarrow", zero_copy_batch=True)


_SQL_HORN = """
    WITH grid AS (
        SELECT x, y, CAST((x * 2654435761 + y * 40503) % 251 AS DOUBLE) AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    nb AS (
        SELECT x, y, v,
          CASE WHEN x-1 >= 0 AND y-1 >= 0 THEN CAST(((x-1) * 2654435761 + (y-1) * 40503) % 251 AS DOUBLE) ELSE v END AS tl,
          CASE WHEN y-1 >= 0 THEN CAST((x * 2654435761 + (y-1) * 40503) % 251 AS DOUBLE) ELSE v END AS t,
          CASE WHEN x+1 <= 47 AND y-1 >= 0 THEN CAST(((x+1) * 2654435761 + (y-1) * 40503) % 251 AS DOUBLE) ELSE v END AS tr,
          CASE WHEN x-1 >= 0 THEN CAST(((x-1) * 2654435761 + y * 40503) % 251 AS DOUBLE) ELSE v END AS l,
          CASE WHEN x+1 <= 47 THEN CAST(((x+1) * 2654435761 + y * 40503) % 251 AS DOUBLE) ELSE v END AS r,
          CASE WHEN x-1 >= 0 AND y+1 <= 47 THEN CAST(((x-1) * 2654435761 + (y+1) * 40503) % 251 AS DOUBLE) ELSE v END AS bl,
          CASE WHEN y+1 <= 47 THEN CAST((x * 2654435761 + (y+1) * 40503) % 251 AS DOUBLE) ELSE v END AS b,
          CASE WHEN x+1 <= 47 AND y+1 <= 47 THEN CAST(((x+1) * 2654435761 + (y+1) * 40503) % 251 AS DOUBLE) ELSE v END AS br
        FROM grid
    ),
    gr AS (
        SELECT x, y,
          ((tr + 2*r + br) - (tl + 2*l + bl)) / 240.0 AS zx,
          ((tl + 2*t + tr) - (bl + 2*b + br)) / 240.0 AS zy
        FROM nb
    )
"""

SQL_TERRAIN_SLOPE = _SQL_HORN + """
    SELECT x AS cell_x, y AS cell_y,
           round(degrees(atan(sqrt(zx*zx + zy*zy))), 9) AS density
    FROM gr
"""


def q_terrain_aspect_grid(sf_dir: str):
    """Horn aspect (stages/layer_ops.py:focal_aspect; compass degrees,
    0 = north, flat -> 0) over the hash grid — same SQL neighbor scheme as
    q_terrain_slope_grid, round-9."""
    import pyarrow.compute as pc

    from .stages.layer_ops import focal_aspect

    out = focal_aspect(_hash_grid_layer(3, 16, mod=251), 30.0, 30.0)
    cells = _explode_tiles_to_cells(out, value_cast="float64", drop_zero=False)
    return cells.map_batches(
        lambda b: pa.table({"cell_x": b["cell_x"], "cell_y": b["cell_y"],
                            "density": pc.round(b["density"], 9)}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_TERRAIN_ASPECT = _SQL_HORN + """
    SELECT x AS cell_x, y AS cell_y,
           round(CASE WHEN zx = 0 AND zy = 0 THEN 0.0
                      ELSE ((degrees(atan2(-zx, zy)) + 360.0) % 360.0) END,
                 9) AS density
    FROM gr
"""


def q_reclassify_grid(sf_dir: str):
    """Reclassify (stages/layer_ops.py:layer_reclassify): class(v) = number
    of breaks strictly below v, searchsorted per tile, no shuffle.
    SQL-checked bit-exact (integer classes)."""
    from .stages.layer_ops import layer_reclassify

    out = layer_reclassify(_hash_grid_layer(3, 16, mod=251),
                           [50.0, 120.0, 200.0])
    return _explode_tiles_to_cells(out, value_cast="int64", drop_zero=False)


SQL_RECLASSIFY = """
    SELECT x AS cell_x, y AS cell_y,
           (CASE WHEN v > 50 THEN 1 ELSE 0 END)
           + (CASE WHEN v > 120 THEN 1 ELSE 0 END)
           + (CASE WHEN v > 200 THEN 1 ELSE 0 END) AS density
    FROM (
        SELECT x, y, (x * 2654435761 + y * 40503) % 251 AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    )
"""


def q_focal_mode_grid(sf_dir: str):
    """Focal mode (NEW focal_op mode; window majority, ties -> smallest
    value) across tile boundaries over the mod-7 hash grid (small
    categorical range so real ties exercise the tie-break). SQL-checked
    bit-exact via a count + ORDER BY c DESC, v ASC window."""
    from .stages.layer_ops import focal_op

    out = focal_op(_hash_grid_layer(3, 16, mod=7), "mode", margin=1)
    return _explode_tiles_to_cells(out, value_cast="int64", drop_zero=False)


SQL_FOCAL_MODE = """
    WITH grid AS (
        SELECT x, y, (x * 2654435761 + y * 40503) % 7 AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    nbrs AS (
        SELECT a.x, a.y, b.v
        FROM grid a JOIN grid b
          ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
    ),
    cnt AS (SELECT x, y, v, count(*) AS c FROM nbrs GROUP BY x, y, v)
    SELECT x AS cell_x, y AS cell_y, v AS density
    FROM cnt
    QUALIFY row_number() OVER (PARTITION BY x, y ORDER BY c DESC, v ASC) = 1
"""


def q_convolve_grid(sf_dir: str):
    """Kernel convolution (stages/layer_ops.py:focal_convolve — GeoTrellis
    Convolve with an arbitrary Kernel) over the mod-251 hash grid, using a
    deliberately ASYMMETRIC integer 3x3 kernel [[0,1,2],[3,4,5],[6,7,8]] so
    any orientation slip (kernel flip, row/col swap) breaks the hash.
    Cross-tile collars via buffer_tiles; layer-edge neighbors are NoData and
    drop out of the weighted sum. SQL-checked bit-exact (integer kernel x
    integer layer -> every partial sum exact in float64)."""
    from .stages.layer_ops import focal_convolve

    kern = [[0, 1, 2], [3, 4, 5], [6, 7, 8]]
    out = focal_convolve(_hash_grid_layer(3, 16, mod=251), kern)
    return _explode_tiles_to_cells(out, value_cast="int64", drop_zero=False)


SQL_CONVOLVE = """
    WITH grid AS (
        SELECT x, y, (x * 2654435761 + y * 40503) % 251 AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    kern(dx, dy, w) AS (VALUES
        (-1, -1, 0), (0, -1, 1), (1, -1, 2),
        (-1,  0, 3), (0,  0, 4), (1,  0, 5),
        (-1,  1, 6), (0,  1, 7), (1,  1, 8)
    )
    SELECT a.x AS cell_x, a.y AS cell_y,
           CAST(sum(k.w * b.v) AS BIGINT) AS density
    FROM grid a
    JOIN kern k ON true
    JOIN grid b ON b.x = a.x + k.dx AND b.y = a.y + k.dy
    GROUP BY a.x, a.y
"""


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement
    (stages/sample.py:weighted_sample_topk, Efraimidis–Spirakis keys from
    the SQL-reproducible mix32 hash, weight = n_chars): per-batch partial
    top-k + tiny single-block final. SQL-checked — DuckDB computes the
    identical ln(u)/w keys (bit-identical libm) and takes the same top 25."""
    from .stages.sample import weighted_sample_topk

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    out = weighted_sample_topk(ds, "doc_id", "n_chars", 25)
    return out.select_columns(["doc_id"])


def _sql_weighted_sample() -> str:
    from .stages.sample import sql_mix32

    return f"""
    SELECT doc_id FROM (
        SELECT doc_id,
               ln((({sql_mix32('doc_id')}) + 0.5) / 4294967296.0)
               / CAST(n_chars AS DOUBLE) AS es_key
        FROM documents
    )
    ORDER BY es_key DESC, doc_id ASC
    LIMIT 25
"""


def q_focal_circle_mean_grid(sf_dir: str):
    """Focal mean with a Circle(2) disk neighborhood (GeoTrellis
    Circle(radius) semantics; 13 cells) across tile boundaries. SQL-checked
    bit-exact — integer window sums, the disk predicate dx^2+dy^2 <= 4 in
    the neighbor join."""
    from .stages.layer_ops import focal_op

    out = focal_op(_hash_grid_layer(3, 16, mod=251), "mean", margin=2,
                   neighborhood="circle")
    return _explode_tiles_to_cells(out, value_cast="float64", drop_zero=False)


SQL_FOCAL_CIRCLE_MEAN = """
    WITH grid AS (
        SELECT x, y, (x * 2654435761 + y * 40503) % 251 AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    nb AS (
        SELECT a.x, a.y, sum(b.v) AS s, count(*) AS n
        FROM grid a JOIN grid b
          ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4
        GROUP BY a.x, a.y
    )
    SELECT x AS cell_x, y AS cell_y,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS density
    FROM nb
"""


def q_tobler_grid(sf_dir: str):
    """Tobler hiking speed from terrain
    (stages/layer_ops.py:focal_tobler): 6*exp(-3.5*|tan(slope)+0.05|) on
    the Horn collar frame, over the hash grid. SQL-checked round-9 (same
    closed-form-neighbor scheme as q_terrain_slope_grid)."""
    import pyarrow.compute as pc

    from .stages.layer_ops import focal_tobler

    out = focal_tobler(_hash_grid_layer(3, 16, mod=251), 30.0, 30.0)
    cells = _explode_tiles_to_cells(out, value_cast="float64", drop_zero=False)
    return cells.map_batches(
        lambda b: pa.table({"cell_x": b["cell_x"], "cell_y": b["cell_y"],
                            "density": pc.round(b["density"], 9)}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_TOBLER = _SQL_HORN + """
    SELECT x AS cell_x, y AS cell_y,
           round(6.0 * exp(-3.5 * abs(sqrt(zx*zx + zy*zy) + 0.05)), 9) AS density
    FROM gr
"""


def q_focal_mean_grid(sf_dir: str):
    """Focal mean with the Square(1) window ACROSS tile boundaries
    (stages/layer_ops.py:focal_op via buffer_tiles collar exchange), over
    the mod-251 hash grid. SQL-checked bit-exact — window sums of integer
    values are exact in float64, and the single division s/n is the same
    IEEE op in DuckDB."""
    from .stages.layer_ops import focal_op

    out = focal_op(_hash_grid_layer(3, 16, mod=251), "mean", margin=1)
    return _explode_tiles_to_cells(out, value_cast="float64", drop_zero=False)


SQL_FOCAL_MEAN = """
    WITH grid AS (
        SELECT x, y, (x * 2654435761 + y * 40503) % 251 AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    nb AS (
        SELECT a.x, a.y, sum(b.v) AS s, count(*) AS n
        FROM grid a JOIN grid b
          ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
        GROUP BY a.x, a.y
    )
    SELECT x AS cell_x, y AS cell_y,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS density
    FROM nb
"""


def q_focal_stddev_grid(sf_dir: str):
    """Focal population stddev (NEW focal_op mode, integral-image s/s2
    windows) across tile boundaries. SQL-checked bit-exact: the operand
    order sqrt(max(s2/n - (s/n)^2, 0)) is part of the spec, and every
    intermediate is an exact integer in float64."""
    from .stages.layer_ops import focal_op

    out = focal_op(_hash_grid_layer(3, 16, mod=251), "stddev", margin=1)
    return _explode_tiles_to_cells(out, value_cast="float64", drop_zero=False)


SQL_FOCAL_STDDEV = """
    WITH grid AS (
        SELECT x, y, (x * 2654435761 + y * 40503) % 251 AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    nb AS (
        SELECT a.x, a.y, sum(b.v) AS s, count(*) AS n, sum(b.v * b.v) AS s2
        FROM grid a JOIN grid b
          ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
        GROUP BY a.x, a.y
    )
    SELECT x AS cell_x, y AS cell_y,
           sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                         - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0.0))
           AS density
    FROM nb
"""


def q_zonal_fractional_grid(sf_dir: str):
    """Fractional zonal stats against a NON-ALIGNED zone grid
    (stages/stats.zonal_stats_fractional_grid): zone cells 5/2 value cells
    wide, offset by -1/2 and -3/2 cells, over the mod-251 hash grid. Every
    value cell splits its unit area EXACTLY across the <= 4 zone cells it
    overlaps (integer weights in 1/4-cell units), per-tile np.add.at
    scatter, partial+final combiner groupby. SQL bit-exact: weights, sums
    and n_cells are integers; wmean is the one IEEE division sum_wv/sum_w."""
    from .stages.stats import zonal_stats_fractional_grid

    out = zonal_stats_fractional_grid(_hash_grid_layer(3, 16, mod=251),
                                      scale_num=5, scale_den=2,
                                      off_x_num=-1, off_y_num=-3)

    def cast_wv(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        i = b.schema.get_field_index("sum_wv")
        return b.set_column(i, "sum_wv", pc.cast(b["sum_wv"], pa.int64()))

    return out.map_batches(cast_wv, batch_format="pyarrow", zero_copy_batch=True)


SQL_ZONAL_FRACTIONAL = """
    WITH grid AS (
        SELECT x, y, (x * 2654435761 + y * 40503) % 251 AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    -- sub-cell units q = 2 (cell spans [2g, 2g+2)); zone width s = 5 sub-units;
    -- zone j covers [off + j*5, off + (j+1)*5) with off_x = -1, off_y = -3.
    -- numerators 2x+1 / 2y+3 are >= 1, so integer division is floor division
    cells AS (
        SELECT x, y, v,
               (2*x + 1) // 5 AS jx0, (2*y + 3) // 5 AS jy0,
               least(2, -1 + ((2*x + 1) // 5 + 1) * 5 - 2*x) AS wxl,
               least(2, -3 + ((2*y + 3) // 5 + 1) * 5 - 2*y) AS wyl
        FROM grid
    ),
    pieces AS (
        SELECT c.jx0 + dx.d AS zone_x, c.jy0 + dy.d AS zone_y,
               (CASE WHEN dx.d = 0 THEN c.wxl ELSE 2 - c.wxl END)
             * (CASE WHEN dy.d = 0 THEN c.wyl ELSE 2 - c.wyl END) AS w,
               c.v
        FROM cells c, (VALUES (0), (1)) dx(d), (VALUES (0), (1)) dy(d)
    )
    SELECT zone_x, zone_y,
           CAST(sum(w) AS BIGINT) AS sum_w,
           CAST(sum(w * v) AS BIGINT) AS sum_wv,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(w * v) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS wmean
    FROM pieces
    WHERE w > 0
    GROUP BY zone_x, zone_y
"""


def q_image_near_dups(sf_dir: str):
    """Image near-dup pairs (stages/multimodal.py:image_near_dups): REAL
    BMP payloads synthesized per doc (structured gradient image shared by a
    doc-id family + a tiny per-doc edit), actor-pool decode -> dHash ->
    shared band-blocked all-pairs Hamming verify. Pixels never leave the
    decode stage; only (id, dhash) shuffles. SQL-BIT-EXACT (round-4 late
    conversion): BMP is lossless and dHash is integer arithmetic plus one
    correctly-rounded division per box cell, so the oracle
    (_sql_image_near_dups) recomputes pixels -> luma -> 8x9 box averages ->
    gradient bits from the doc ids and verifies the exact (id_a, id_b,
    hamming) pair set — any decode, luma, pooling, banding, or
    boundary-stitch defect changes the pair set. Planted-pair pytest
    (test_media) remains."""
    from .core.media import encode_bmp
    from .stages.multimodal import image_near_dups

    ds = _read(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(_mod_filter("doc_id", 5), batch_format="pyarrow",
                        zero_copy_batch=True)

    def to_media(b: pa.Table) -> pa.Table:
        yy, xx = np.mgrid[0:32, 0:32]
        payloads = []
        for d in b["doc_id"].to_pylist():
            f = int(d) % 150
            img = np.stack([(xx * (f % 7 + 2)) % 256, (yy * (f % 5 + 3)) % 256,
                            ((xx + yy) * (f % 11 + 1)) % 256],
                           axis=2).astype(np.uint8)
            r, c = (int(d) // 150) % 28, (int(d) * 13) % 28
            img[r:r + 2, c:c + 2] = 0  # tiny per-doc edit
            payloads.append(encode_bmp(img))
        return pa.table({"doc_id": b["doc_id"],
                         "media": pa.array(payloads, pa.binary())})

    media = ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)
    return image_near_dups(media, max_hamming=3)


def _sql_image_near_dups() -> str:
    cbs = [(32 * j) // 9 for j in range(10)]
    colmap = ", ".join(
        f"({x}, {next(j for j in range(9) if cbs[j] <= x < cbs[j + 1])})"
        for x in range(32))
    areas = ", ".join(f"({j}, {4 * (cbs[j + 1] - cbs[j])})" for j in range(9))
    patch = ("p.i // 32 >= d.er AND p.i // 32 < d.er + 2"
             " AND p.i % 32 >= d.ec AND p.i % 32 < d.ec + 2")
    return f"""
    WITH docs AS MATERIALIZED (
        SELECT doc_id AS d, doc_id % 150 AS f,
               (doc_id // 150) % 28 AS er, (doc_id * 13) % 28 AS ec
        FROM documents WHERE doc_id % 5 = 0
    ),
    colmap(x, j) AS (VALUES {colmap}),
    areas(j, area) AS (VALUES {areas}),
    px AS MATERIALIZED (
        SELECT d.d, p.i % 32 AS x, p.i // 32 AS y,
               CASE WHEN {patch} THEN 0
                    ELSE ((p.i % 32) * (d.f % 7 + 2)) % 256 END AS r,
               CASE WHEN {patch} THEN 0
                    ELSE ((p.i // 32) * (d.f % 5 + 3)) % 256 END AS g,
               CASE WHEN {patch} THEN 0
                    ELSE (((p.i % 32) + (p.i // 32)) * (d.f % 11 + 1)) % 256
               END AS b
        FROM docs d JOIN range(0, 1024) p(i) ON TRUE
    ),
    luma AS MATERIALIZED (
        SELECT d, x, y, (r * 299 + g * 587 + b * 114) // 1000 AS lum FROM px
    ),
    boxes AS MATERIALIZED (
        SELECT l.d, l.y // 4 AS bi, c.j AS bj,
               CAST(sum(l.lum) AS DOUBLE) / a.area AS small
        FROM luma l JOIN colmap c ON c.x = l.x JOIN areas a ON a.j = c.j
        GROUP BY l.d, l.y // 4, c.j, a.area
    ),
    bits AS MATERIALIZED (
        SELECT b0.d, b0.bi * 8 + b0.bj AS bit, (b0.small < b1.small) AS v
        FROM boxes b0 JOIN boxes b1
          ON b1.d = b0.d AND b1.bi = b0.bi AND b1.bj = b0.bj + 1
        WHERE b0.bj < 8
    ),
    pairs AS (
        SELECT a.d AS id_a, b.d AS id_b,
               CAST(sum(CASE WHEN a.v != b.v THEN 1 ELSE 0 END) AS BIGINT) AS hamming
        FROM bits a JOIN bits b ON b.bit = a.bit AND b.d > a.d
        GROUP BY a.d, b.d
    )
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
    """


def q_script_stats(sf_dir: str):
    """Unicode-script profile per doc
    (functions/text_analysis.py:script_stats_batch): per-script RE2 counts
    + fixed-priority dominant script. SQL-checked bit-exact — DuckDB's
    regexp_extract_all over the same \\p{Script} classes."""
    from .functions.text_analysis import script_stats_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(lambda b: script_stats_batch(b).drop_columns(["text"]),
                         batch_format="pyarrow", zero_copy_batch=True)
    return out


SQL_SCRIPT_STATS = """
    SELECT doc_id,
           len(regexp_extract_all(text, '\\p{Latin}')) AS n_latin,
           len(regexp_extract_all(text, '\\p{Cyrillic}')) AS n_cyrillic,
           len(regexp_extract_all(text, '\\p{Han}')) AS n_han,
           len(regexp_extract_all(text, '[\\p{Hiragana}\\p{Katakana}]')) AS n_kana,
           CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_han AND n_latin >= n_kana THEN 'latin'
                WHEN n_cyrillic >= n_han AND n_cyrillic >= n_kana THEN 'cyrillic'
                WHEN n_han >= n_kana THEN 'han'
                ELSE 'kana' END AS dominant_script
    FROM documents
"""


def q_distinct_users_by_type(sf_dir: str):
    """Grouped approx COUNT(DISTINCT)
    (stages/stats.py:approx_distinct_by): distinct user_id per event_type
    via one HLL sketch per (key, block), sketch-row shuffle only.
    SQL-CHECKED (round-4 late conversion): per-group cardinality (<= 150
    users) forces the linear-counting branch m*ln(m/zeros), whose only
    transcendental is one ln — the oracle replays the splitmix64 registers
    exactly (same machinery as q_hll_registers), counts zero registers,
    and matches the estimate rounded to 6 decimals (cross-libm ln
    deviation ~1e-13 vs a 3.4e-7 boundary margin on this fixture). The
    registers themselves are hash-verified bit-exact by q_hll_registers;
    the 1.6% error bound + merge correctness stay pytest-verified."""
    import pyarrow.compute as pc

    from .stages.stats import approx_distinct_by

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    out = approx_distinct_by(ds, "event_type", "user_id", p=12)
    return out.map_batches(
        lambda b: b.set_column(b.schema.get_field_index("approx_distinct"),
                               "approx_distinct", pc.round(b["approx_distinct"], 6)),
        batch_format="pyarrow", zero_copy_batch=True)


def _sql_distinct_users_by_type() -> str:
    return f"""
    WITH hs AS (
        SELECT DISTINCT event_type, {_sql_splitmix64('user_id')} AS h FROM events
    ),
    reg AS (
        SELECT event_type, CAST(h >> 52 AS BIGINT) AS idx,
               max(53 - (CASE WHEN h % 4503599627370496 = 0 THEN 0
                              ELSE length(bin(CAST(h % 4503599627370496 AS BIGINT)))
                         END)) AS r
        FROM hs GROUP BY 1, 2
    ),
    zeros AS (
        SELECT event_type, 4096 - count(*) AS v FROM reg GROUP BY 1
    )
    SELECT event_type, round(4096.0 * ln(4096.0 / v), 6) AS approx_distinct
    FROM zeros
    """


def q_geom_measures(sf_dir: str):
    """Geometry measures (stages/overlay.py:geom_measures): area /
    perimeter / area-weighted centroid per feature over integer-vertex
    triangles derived from doc_id. SQL-checked bit-exact — every shoelace
    intermediate is an exact integer in float64; the three sqrt edge
    lengths sum left-to-right on both sides."""
    import ray.data

    from .core.wkb import encode_polygon
    from .stages.overlay import geom_measures

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        wkbs = []
        for d in ids:
            d = int(d)
            x0, y0 = d % 50, d % 31
            ring = [(x0, y0), (x0 + 3 + d % 5, y0 + 1), (x0 + 1, y0 + 4 + d % 7)]
            wkbs.append(encode_polygon([ring]))
        return pa.table({"polygon_id": b["doc_id"],
                         "wkb": pa.array(wkbs, pa.binary())})

    tris = ds.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)
    return geom_measures(tris)


SQL_GEOM_MEASURES = """
    WITH v AS (
        SELECT doc_id AS polygon_id,
               CAST(doc_id % 50 AS DOUBLE) AS x0, CAST(doc_id % 31 AS DOUBLE) AS y0,
               CAST(doc_id % 50 + 3 + doc_id % 5 AS DOUBLE) AS x1,
               CAST(doc_id % 31 + 1 AS DOUBLE) AS y1,
               CAST(doc_id % 50 + 1 AS DOUBLE) AS x2,
               CAST(doc_id % 31 + 4 + doc_id % 7 AS DOUBLE) AS y2
        FROM documents
    ),
    c AS (
        SELECT polygon_id, x0, y0, x1, y1, x2, y2,
               x0*y1 - x1*y0 AS cr0, x1*y2 - x2*y1 AS cr1, x2*y0 - x0*y2 AS cr2
        FROM v
    )
    SELECT polygon_id,
           abs((cr0 + cr1 + cr2)) / 2.0 AS area,
           sqrt((x1-x0)*(x1-x0) + (y1-y0)*(y1-y0))
           + sqrt((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1))
           + sqrt((x0-x2)*(x0-x2) + (y0-y2)*(y0-y2)) AS perimeter,
           ((x0+x1)*cr0 + (x1+x2)*cr1 + (x2+x0)*cr2)
               / (6.0 * ((cr0 + cr1 + cr2) / 2.0)) AS centroid_x,
           ((y0+y1)*cr0 + (y1+y2)*cr1 + (y2+y0)*cr2)
               / (6.0 * ((cr0 + cr1 + cr2) / 2.0)) AS centroid_y
    FROM c
"""


def q_jenks_breaks(sf_dir: str):
    """Jenks/Fisher natural breaks over documents.n_chars
    (stages/stats.py:jenks_breaks, k=5): slim distinct-count aggregate +
    exact driver DP. SQL-checked since round 4: the Fisher DP unrolls to 4
    chained CTE levels in DuckDB (SSE from integer-exact prefix sums, argmin
    tie-break = smallest split, scalar-subquery backtrack) — identical IEEE
    arithmetic order, so the chosen splits match bit-exact."""
    import pandas as pd

    from .stages.stats import jenks_breaks

    ds = _read(sf_dir, "documents", ["n_chars"]).map_batches(
        lambda b: pa.table({"v": b["n_chars"].cast(pa.float64())}),
        batch_format="pyarrow", zero_copy_batch=True)
    br = jenks_breaks(ds, "v", 5)
    return pd.DataFrame({"class_idx": list(range(len(br))),
                         "upper_break": br})


# Fisher-Jenks DP unrolled for k=5 over distinct n_chars values. All prefix
# sums are exact integers at this fixture (n_chars <= ~600, 500 docs), the
# only float ops (S*S/W division, dp additions) appear in the identical IEEE
# order as the numpy DP in stages/stats.py:jenks_breaks, and ties break the
# same way (np.argmin = first minimum = smallest split index s).
SQL_JENKS = """
WITH ordered AS (
  SELECT v, c, row_number() OVER (ORDER BY v) AS i
  FROM (SELECT CAST(n_chars AS DOUBLE) AS v, CAST(count(*) AS DOUBLE) AS c
        FROM documents GROUP BY n_chars)
), pre AS (
  SELECT i, v,
         sum(c)       OVER (ORDER BY i) AS w,
         sum(c*v)     OVER (ORDER BY i) AS s,
         sum((c*v)*v) OVER (ORDER BY i) AS s2
  FROM ordered
), lo AS (
  SELECT i,
         coalesce(lag(w)  OVER (ORDER BY i), 0) AS wp,
         coalesce(lag(s)  OVER (ORDER BY i), 0) AS sp,
         coalesce(lag(s2) OVER (ORDER BY i), 0) AS s2p
  FROM pre
), seg AS (
  SELECT lo.i AS a, hi.i AS b,
         (hi.s2 - lo.s2p) - ((hi.s - lo.sp)*(hi.s - lo.sp))/(hi.w - lo.wp) AS e
  FROM pre hi JOIN lo ON lo.i <= hi.i
), dp1 AS (
  SELECT b AS i, e AS d FROM seg WHERE a = 1
), dp2 AS (
  SELECT i, d, s FROM (
    SELECT seg.b AS i, dp1.d + seg.e AS d, seg.a AS s,
           row_number() OVER (PARTITION BY seg.b ORDER BY dp1.d + seg.e ASC, seg.a ASC) AS rn
    FROM seg JOIN dp1 ON dp1.i = seg.a - 1 WHERE seg.a >= 2) t WHERE rn = 1
), dp3 AS (
  SELECT i, d, s FROM (
    SELECT seg.b AS i, dp2.d + seg.e AS d, seg.a AS s,
           row_number() OVER (PARTITION BY seg.b ORDER BY dp2.d + seg.e ASC, seg.a ASC) AS rn
    FROM seg JOIN dp2 ON dp2.i = seg.a - 1 WHERE seg.a >= 3) t WHERE rn = 1
), dp4 AS (
  SELECT i, d, s FROM (
    SELECT seg.b AS i, dp3.d + seg.e AS d, seg.a AS s,
           row_number() OVER (PARTITION BY seg.b ORDER BY dp3.d + seg.e ASC, seg.a ASC) AS rn
    FROM seg JOIN dp3 ON dp3.i = seg.a - 1 WHERE seg.a >= 4) t WHERE rn = 1
), dp5 AS (
  SELECT i, d, s FROM (
    SELECT seg.b AS i, dp4.d + seg.e AS d, seg.a AS s,
           row_number() OVER (PARTITION BY seg.b ORDER BY dp4.d + seg.e ASC, seg.a ASC) AS rn
    FROM seg JOIN dp4 ON dp4.i = seg.a - 1
    WHERE seg.a >= 5 AND seg.b = (SELECT max(i) FROM pre)) t WHERE rn = 1
), bt5 AS (SELECT s FROM dp5
), bt4 AS (SELECT s FROM dp4 WHERE i = (SELECT s - 1 FROM bt5)
), bt3 AS (SELECT s FROM dp3 WHERE i = (SELECT s - 1 FROM bt4)
), bt2 AS (SELECT s FROM dp2 WHERE i = (SELECT s - 1 FROM bt3)
), breaks AS (
  SELECT v FROM ordered
  WHERE i IN ((SELECT s-1 FROM bt5),(SELECT s-1 FROM bt4),
              (SELECT s-1 FROM bt3),(SELECT s-1 FROM bt2))
)
SELECT CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS class_idx,
       v AS upper_break
FROM breaks ORDER BY class_idx
"""


def q_approx_counts(sf_dir: str):
    """Count-min-sketch point frequencies (stages/stats.py:approx_counts)
    for the 20 corpus sources: per-block (5 x 2048) partial tables,
    additive tree-merge, O(1) driver queries. SQL-checked against exact
    GROUP BY counts — deterministic hashes + 20 keys in 2048 columns mean
    the one-sided estimate is collision-free at this fixture (est ==
    truth), which the driver compare proves every round."""
    import pandas as pd

    from .stages.stats import approx_counts

    ds = _read(sf_dir, "documents", ["source"])
    srcs = [f"src{i}" for i in range(20)]
    est = approx_counts(ds, "source", srcs)
    return pd.DataFrame({"source": srcs,
                         "n_docs": [est[s] for s in srcs]}).sort_values(
        "source").reset_index(drop=True)


SQL_APPROX_COUNTS = """
    SELECT source, count(*) AS n_docs FROM documents GROUP BY source
"""


def q_etl_pipeline(sf_dir: str):
    """The composed GeoTrellis-style ETL as ONE JSON pipeline spec
    (pipelines/spec.py:run_spec): synthesize GeoTiffs -> read.geotiffs ->
    tile_to_layout -> pyramid.up_levels into a catalog -> render.png the
    top level. Returns per-zoom tile counts + png byte total (rows-only;
    exactness of every constituent stage is SQL/pytest-checked
    elsewhere)."""
    import os
    import tempfile

    import pandas as pd

    from .core.geotiff import encode_geotiff
    from .core.layout import Extent
    from .pipelines.spec import run_spec
    from .sources.layer import read_layer

    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        tifs = os.path.join(td, "tifs")
        os.makedirs(tifs)
        for gx in range(2):
            for gy in range(2):
                yy, xx = np.mgrid[0:16, 0:16]
                arr = ((xx + 16 * gx) * 3 + (yy + 16 * gy) * 7 + 1).astype(np.float64)
                ext = Extent(gx * 16.0, gy * 16.0, gx * 16.0 + 16, gy * 16.0 + 16)
                with open(os.path.join(tifs, f"r{gx}{gy}.tif"), "wb") as f:
                    f.write(encode_geotiff(ext, arr, epsg=4326, tile_size=None))
        catalog = os.path.join(td, "catalog")
        run_spec([
            {"op": "read.geotiffs", "path": tifs},
            {"op": "transform.tile_to_layout", "extent": [0.0, 0.0, 32.0, 32.0],
             "tile_layout": [4, 4, 8, 8]},
            {"op": "pyramid.up_levels", "catalog": catalog, "name": "etl",
             "zoom": 2, "down_to": 0},
        ])
        rows = []
        for z in (2, 1, 0):
            lvl = read_layer(catalog, "etl", z)
            pngs = run_spec([
                {"op": "read.parquet", "path": os.path.join(catalog, "etl", str(z))},
                {"op": "render.png", "breaks": [300.0, 600.0, 900.0],
                 "colors": [[0, 0, 255, 255], [0, 255, 0, 255], [255, 0, 0, 255]]},
            ]).take_all()
            rows.append({"zoom": z, "n_tiles": lvl.count(),
                         "png_bytes": int(sum(len(r["png"]) for r in pngs))})
    return pd.DataFrame(rows)


def q_etl_grid(sf_dir: str):
    """The composed GeoTrellis ETL spec SQL-BIT-EXACT (round-4 late
    conversion; the byte-count variant q_etl_pipeline remains rows-only):
    ONE JSON pipeline (pipelines/spec.py:run_spec) runs
    read.geotiffs -> tile_to_layout -> pyramid.up_levels(2 -> 0) over a
    32x32 world with the linear plane v = 3*col + 7*row + 1, then
    render.png per zoom. Every stage output has an integer/dyadic closed
    form: pyramid values are nested 2x2 averages (integer sums / 4.0,
    exact dyadics at every level, order-independent), and the PNG pass is
    verified by decode (encode_png -> decode_png round trip) into
    per-tile channel sums of the ColorMap classification. Output per
    (zoom, tile): value sum + decoded RGBA channel sums."""
    import os
    import tempfile

    from .core.layout import Extent as Ext2
    from .core.media import decode_png
    from .core.raster import decode_tile
    from .pipelines.spec import run_spec
    from .sources.layer import read_layer

    from .core.geotiff import encode_geotiff

    rows_out = []
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        tifs = os.path.join(td, "tifs")
        os.makedirs(tifs)
        rr, cc = np.mgrid[0:32, 0:32]
        world = (3 * cc + 7 * rr + 1).astype(np.float64)  # row 0 = world top
        for qx in range(2):
            for qy in range(2):
                sub = world[qy * 16:(qy + 1) * 16, qx * 16:(qx + 1) * 16]
                ext = Ext2(qx * 16.0, 32.0 - (qy + 1) * 16.0,
                           (qx + 1) * 16.0, 32.0 - qy * 16.0)
                with open(os.path.join(tifs, f"q{qx}{qy}.tif"), "wb") as f:
                    f.write(encode_geotiff(ext, sub, epsg=4326, tile_size=None))
        catalog = os.path.join(td, "catalog")
        run_spec([
            {"op": "read.geotiffs", "path": tifs},
            {"op": "transform.tile_to_layout", "extent": [0.0, 0.0, 32.0, 32.0],
             "tile_layout": [4, 4, 8, 8]},
            {"op": "pyramid.up_levels", "catalog": catalog, "name": "etl",
             "zoom": 2, "down_to": 0},
        ])
        for z in (2, 1, 0):
            sums = {}
            for row in read_layer(catalog, "etl", z).take_all():
                t = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
                sums[(row["key_col"], row["key_row"])] = float(t.sum())
            pngs = run_spec([
                {"op": "read.parquet", "path": os.path.join(catalog, "etl", str(z))},
                {"op": "render.png", "breaks": [100.0, 200.0, 1000.0],
                 "colors": [[10, 20, 30, 255], [60, 70, 80, 255],
                            [110, 120, 130, 255]]},
            ]).take_all()
            for row in pngs:
                rgba = decode_png(row["png"]).astype(np.int64)
                k = (row["key_col"], row["key_row"])
                rows_out.append({
                    "zoom": z, "key_col": int(k[0]), "key_row": int(k[1]),
                    "sum_val": sums[k],
                    "sum_r": int(rgba[:, :, 0].sum()), "sum_g": int(rgba[:, :, 1].sum()),
                    "sum_b": int(rgba[:, :, 2].sum()), "sum_a": int(rgba[:, :, 3].sum()),
                })
    import ray.data

    schema = pa.schema([("zoom", pa.int64()), ("key_col", pa.int64()),
                        ("key_row", pa.int64()), ("sum_val", pa.float64()),
                        ("sum_r", pa.int64()), ("sum_g", pa.int64()),
                        ("sum_b", pa.int64()), ("sum_a", pa.int64())])
    return ray.data.from_arrow(pa.Table.from_pylist(rows_out, schema=schema))


def _sql_etl_grid() -> str:
    chan = []
    for name, j in (("sum_r", 0), ("sum_g", 1), ("sum_b", 2)):
        base, step = 10 + 10 * j, 50
        chan.append(f"""CAST(sum(CASE WHEN v <= 100 THEN {base}
               WHEN v <= 200 THEN {base + step}
               ELSE {base + 2 * step} END) AS BIGINT) AS {name}""")
    cols = ",\n           ".join(chan)

    def level(src: str, out: str) -> str:
        return f"""
    {out} AS MATERIALIZED (
        SELECT r // 2 AS r, c // 2 AS c, CAST(sum(v) AS DOUBLE) / 4.0 AS v
        FROM {src} GROUP BY 1, 2
    )"""

    def per_zoom(src: str, z: int) -> str:
        return f"""
    SELECT {z} AS zoom, c // 8 AS key_col, r // 8 AS key_row,
           sum(v) AS sum_val,
           {cols},
           CAST(sum(255) AS BIGINT) AS sum_a
    FROM {src} GROUP BY 2, 3"""

    return f"""
    WITH z2 AS MATERIALIZED (
        SELECT CAST(i // 32 AS BIGINT) AS r, CAST(i % 32 AS BIGINT) AS c,
               CAST(3 * (i % 32) + 7 * (i // 32) + 1 AS DOUBLE) AS v
        FROM range(0, 1024) t(i)
    ),{level('z2', 'z1')},{level('z1', 'z0')}
    {per_zoom('z2', 2)} UNION ALL {per_zoom('z1', 1)} UNION ALL {per_zoom('z0', 0)}
    """


def q_jpeg_features(sf_dir: str):
    """Multimodal pipeline over REAL JPEG payloads (core/jpeg.py — own
    baseline T.81 codec, round 3): deterministic structured image per doc
    -> encode_jpeg -> actor-pool ImageDecoder (real entropy decode + IDCT)
    -> 6-dim channel features. Rows-only (lossy codec output is not
    SQL-expressible); codec exactness bounds are pytest-verified
    (test_media: PSNR, constant-image exactness, quality ordering)."""
    from .core.jpeg import encode_jpeg
    from .stages.multimodal import ImageDecoder

    ds = _read(sf_dir, "documents", ["doc_id"])
    ds = ds.map_batches(_mod_filter("doc_id", 5), batch_format="pyarrow",
                        zero_copy_batch=True)

    def to_media(b: pa.Table) -> pa.Table:
        yy, xx = np.mgrid[0:24, 0:24]
        payloads = []
        for d in b["doc_id"].to_pylist():
            f = int(d) % 11 + 2
            img = np.stack([(xx * f) % 256, (yy * (f + 1)) % 256,
                            ((xx + yy) * (f + 2)) % 256], axis=2).astype(np.uint8)
            payloads.append(encode_jpeg(img, quality=80))
        return pa.table({"doc_id": b["doc_id"],
                         "media": pa.array(payloads, pa.binary())})

    media = ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)
    return media.map_batches(
        ImageDecoder, fn_constructor_kwargs={}, batch_format="pyarrow",
        concurrency=_pool_size(), batch_size=64)


def q_bloom_dedup(sf_dir: str):
    """Cross-corpus exact dedup with a Bloom prefilter
    (stages/dedup.py:bloom_dedup): new corpus = even doc_ids, reference =
    doc_ids % 3 == 0; keep new docs whose text is absent from the
    reference. The Bloom filter (10 bits/key, built distributed, OR
    tree-merged, broadcast once) proves most docs absent with zero shuffle;
    only Bloom positives take the slim exact-verify join, so the result is
    EXACT — SQL-checked against a plain NOT EXISTS text anti-join."""
    from .stages.dedup import bloom_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    new = docs.map_batches(_mod_filter("doc_id", 2), batch_format="pyarrow",
                           zero_copy_batch=True)
    ref = docs.map_batches(_mod_filter("doc_id", 3), batch_format="pyarrow",
                           zero_copy_batch=True)
    return bloom_dedup(new, ref, "doc_id", "text").select_columns(["doc_id"])


SQL_BLOOM_DEDUP = """
    SELECT n.doc_id FROM documents n
    WHERE n.doc_id % 2 = 0
      AND NOT EXISTS (
        SELECT 1 FROM documents r
        WHERE r.doc_id % 3 = 0 AND r.text = n.text
    )
"""


def derive_urls_batch(b: pa.Table) -> pa.Table:
    """Deterministic messy URL per doc_id (vectorized pandas str concat),
    exercising every canonicalization rule: uppercase scheme/host, www.,
    default ports, tracking params, fragments, trailing slashes. The SQL
    twin is SQL_URLS; doc_ids sharing (scheme parity, host, page, query)
    collide after canonicalization."""
    import pandas as pd

    d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)

    def s(arr):
        return pd.Series(arr, dtype="object")

    scheme = s(np.where(d % 2 == 0, "HTTP", "https"))
    www = s(np.where(d % 3 == 0, "www.", ""))
    hostb = s(np.where(d % 7 == 0, "EXAMPLE", "example"))
    hostn = s((d % 20).astype(str))
    port = s(np.where(d % 5 == 0, np.where(d % 2 == 0, ":80", ":443"), ""))
    page = s((d % 50).astype(str))
    slash = s(np.where(d % 4 == 0, "/", ""))
    q1 = s(np.where(d % 3 != 1, "&a=", "")) + s(np.where(d % 3 != 1, (d % 6).astype(str), ""))
    q2 = s(np.where(d % 2 == 0, "&utm_source=feed", ""))
    q3 = s(np.where(d % 5 == 1, "&fbclid=x", "")) + s(np.where(d % 5 == 1, d.astype(str), ""))
    query = (q1 + q2 + q3).str.replace(r"^&", "?", regex=True)
    frag = s(np.where(d % 6 == 0, "#sec", ""))
    url = (scheme + "://" + www + hostb + hostn + ".com" + port
           + "/Page/" + page + slash + query + frag)
    return pa.table({"doc_id": b["doc_id"], "url": pa.array(url, pa.string())})


SQL_URLS = """
    SELECT doc_id,
           (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://'
           || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
           || (CASE WHEN doc_id % 7 = 0 THEN 'EXAMPLE' ELSE 'example' END)
           || (doc_id % 20) || '.com'
           || (CASE WHEN doc_id % 5 = 0
                    THEN (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
                    ELSE '' END)
           || '/Page/' || (doc_id % 50)
           || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
           || regexp_replace(
                  (CASE WHEN doc_id % 3 <> 1 THEN '&a=' || (doc_id % 6) ELSE '' END)
                  || (CASE WHEN doc_id % 2 = 0 THEN '&utm_source=feed' ELSE '' END)
                  || (CASE WHEN doc_id % 5 = 1 THEN '&fbclid=x' || doc_id ELSE '' END),
                  '^&', '?')
           || (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END) AS url
    FROM documents
"""

SQL_CANONICAL = f"""
    WITH raw AS ({SQL_URLS}),
    s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM raw),
    s2 AS (SELECT doc_id,
           lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')) AS head,
           regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS rest
           FROM s1),
    s3 AS (SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(head,
               '^(http://[^:]*):80$', '\\1'),
               '^(https://[^:]*):443$', '\\1'),
               '^(https?://)www\\.', '\\1') || rest AS u FROM s2),
    s4 AS (SELECT doc_id, regexp_replace(u, '\\?', '&') || '&' AS u FROM s3),
    s5 AS (SELECT doc_id,
           regexp_replace(u, '(utm_[^=&]*|fbclid|gclid)=[^&]*&', '', 'g') AS u
           FROM s4),
    s6 AS (SELECT doc_id,
           regexp_replace(regexp_replace(u, '&+$', ''), '&', '?') AS u FROM s5),
    s7 AS (SELECT doc_id, regexp_replace(u, '/+\\?', '?') AS u FROM s6)
    SELECT doc_id, regexp_replace(u, '/+$', '') AS canonical_url FROM s7
"""


def q_url_canonical(sf_dir: str):
    """URL canonicalization (functions/url_ops.py:canonicalize_urls): pure
    RE2 kernel chain over a derived messy-URL column (uppercase
    scheme/host, www., default ports, utm_/fbclid/gclid params, fragments,
    trailing slashes). SQL-checked bit-exact string-for-string — DuckDB
    runs the identical regex chain."""
    from .functions.url_ops import canonicalize_batch

    ds = _read(sf_dir, "documents", ["doc_id"])
    urls = ds.map_batches(derive_urls_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
    return urls.map_batches(
        lambda b: canonicalize_batch(b, "url").drop_columns(["url"]),
        batch_format="pyarrow", zero_copy_batch=True)


def q_url_dedup(sf_dir: str):
    """Canonical-URL dedup rollup (functions/url_ops.py:url_dedup):
    map-side canonicalize + slim (canonical, id) shuffle, groupby with
    count + keep-first min(doc_id). SQL-checked."""
    from .functions.url_ops import url_dedup

    ds = _read(sf_dir, "documents", ["doc_id"])
    urls = ds.map_batches(derive_urls_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
    return url_dedup(urls, "url", "doc_id")


SQL_URL_DEDUP = f"""
    SELECT canonical_url, count(*) AS n_dups, min(doc_id) AS first_doc
    FROM ({SQL_CANONICAL})
    GROUP BY canonical_url
"""


def q_keep_best_docs(sf_dir: str):
    """Quality-ranked canonical-URL dedup (stages/dedup.keep_best_dedup):
    per canonical URL keep the LONGEST document (score = codepoint length,
    ties to the larger doc_id) instead of keep-first — the RefinedWeb-style
    keep-best refinement. Argmax rides as max(score << 32 | id) through
    sort_group_aggregate's one range sort, so it survives unbounded key
    cardinality; text never enters the shuffle. SQL-checked against a
    DuckDB QUALIFY row_number() window."""
    import pyarrow.compute as pc

    from .functions.url_ops import canonicalize_urls
    from .stages.dedup import keep_best_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        urls = derive_urls_batch(b)
        return pa.table({
            "canonical_url": canonicalize_urls(urls["url"]),
            "doc_id": b["doc_id"],
            "score": pc.utf8_length(b["text"]).cast(pa.int64()),
        })

    slim = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return keep_best_dedup(slim, "canonical_url", "score", "doc_id")


SQL_KEEP_BEST = f"""
    WITH canon AS ({SQL_CANONICAL}),
    scored AS (
        SELECT d.doc_id, c.canonical_url, CAST(length(d.text) AS BIGINT) AS score
        FROM documents d JOIN canon c USING (doc_id))
    SELECT canonical_url,
           CAST(count(*) OVER (PARTITION BY canonical_url) AS BIGINT) AS n_dups,
           doc_id, score
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY canonical_url
                               ORDER BY score DESC, doc_id DESC) = 1
"""


def q_grouped_topk_sort(sf_dir: str):
    """Grouped top-k at UNBOUNDED key cardinality (stages/agg.py:
    sort_grouped_top_k): the 2 longest docs per canonical URL with their
    rank — one range sort, interior segments emit in place, only O(k *
    #blocks) edge rows ride the driver side channel (the sort-based
    sibling of grouped_top_k, which pays Ray Aggregate's ~300x per-group
    overhead in this regime). SQL-checked vs QUALIFY ROW_NUMBER() <= 2."""
    import pyarrow.compute as pc

    from .functions.url_ops import canonicalize_urls
    from .stages.agg import sort_grouped_top_k

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        urls = derive_urls_batch(b)
        return pa.table({
            "canonical_url": canonicalize_urls(urls["url"]),
            "doc_id": b["doc_id"],
            "score": pc.utf8_length(b["text"]).cast(pa.int64()),
        })

    slim = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return sort_grouped_top_k(slim, "canonical_url", "score", k=2,
                              descending=True, tie_col="doc_id")


SQL_GROUPED_TOPK_SORT = f"""
    WITH canon AS ({SQL_CANONICAL}),
    scored AS (
        SELECT d.doc_id, c.canonical_url, CAST(length(d.text) AS BIGINT) AS score
        FROM documents d JOIN canon c USING (doc_id))
    SELECT canonical_url, doc_id, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY canonical_url
                                   ORDER BY score DESC, doc_id) AS BIGINT) AS "rank"
    FROM scored
    QUALIFY "rank" <= 2
"""


def q_distinct_cents_per_user(sf_dir: str):
    """EXACT grouped COUNT(DISTINCT) (stages/agg.py:
    sort_group_count_distinct) — distinct spent amounts (integer cents)
    per user: ONE range sort on (user, cents) makes duplicates contiguous,
    blocks count val-change boundaries, and the O(#blocks) edge stitch
    subtracts duplicate runs that straddle block cuts. The exact sibling
    of the HLL path (q_distinct_users_by_type); SQL-checked."""
    from .stages.agg import sort_group_count_distinct

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"],
            "cents": pa.array(_cents(b["value"].to_numpy(zero_copy_only=False)), pa.int64()),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return sort_group_count_distinct(prepped, "user_id", "cents")


SQL_DISTINCT_CENTS = """
    SELECT user_id,
           CAST(count(DISTINCT CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS n_distinct,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM events
    GROUP BY user_id
"""


def q_grouped_median_cents(sf_dir: str):
    """EXACT grouped median (stages/agg.py:exact_grouped_quantile,
    quantile_disc semantics — the element at ceil(n*q)-1, index in exact
    rational arithmetic to match DuckDB where float ceil(n*q) breaks):
    median spent cents per user. Two map passes over ONE materialized
    range sort (the pack_token_shards stable-blocks pattern); interior
    groups answer in place, spanning groups through an O(#blocks)
    side channel + targeted second-pass gather. SQL-checked vs DuckDB
    quantile_disc."""
    from .stages.agg import exact_grouped_quantile

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b["user_id"], "event_id": b["event_id"],
            "cents": pa.array(_cents(b["value"].to_numpy(zero_copy_only=False)), pa.int64()),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return exact_grouped_quantile(prepped, "user_id", "cents", "event_id", q="0.5")


SQL_GROUPED_MEDIAN = """
    SELECT user_id,
           quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) AS q_val,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM events
    GROUP BY user_id
"""


def q_dominant_type_per_user(sf_dir: str):
    """EXACT grouped MODE (stages/agg.py:sort_group_mode) — each user's
    most frequent event_type, ties to the lexicographically smallest:
    one range sort on (user, type) makes every (user, type) pair one
    contiguous run; interior groups answer in place, boundary runs chain
    across block cuts on the O(#blocks) driver side channel. SQL-checked
    vs a QUALIFY argmax over grouped counts."""
    from .stages.agg import sort_group_mode

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return sort_group_mode(ds, "user_id", "event_type")


SQL_DOMINANT_TYPE = """
    WITH c AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id, event_type)
    SELECT user_id, event_type AS mode_val, cnt AS mode_cnt,
           CAST(sum(cnt) OVER (PARTITION BY user_id) AS BIGINT) AS n_rows
    FROM c
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY cnt DESC, event_type) = 1
"""


def q_morans_global(sf_dir: str):
    """Global Moran's I (stages/autocorr.py:morans_i_global) over the
    mod-251 hash grid with queen (8-neighbor) weights: one slim moments
    aggregate + one buffer_tiles collar exchange; four scalars per block to
    the driver. SQL-checked — DuckDB recomputes the statistic with a
    neighbor self-join; the single O(1)-magnitude result rounds to 9
    decimals on both sides (summation order differs, value agrees to
    ~1e-15 relative)."""
    import pandas as pd

    from .stages.autocorr import morans_i_global

    r = morans_i_global(_hash_grid_layer(3, 16, mod=251))
    return pd.DataFrame([{"morans_i": round(r["morans_i"], 9),
                          "w_pairs": int(r["w_pairs"]),
                          "n_cells": int(r["n_cells"])}])


SQL_MORANS_GLOBAL = """
    WITH grid AS (
        SELECT x, y, CAST((x * 2654435761 + y * 40503) % 251 AS DOUBLE) AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    stats AS (SELECT sum(v) / count(*) AS mu, count(*) AS n,
                     sum(v * v) AS s2, sum(v) AS s FROM grid),
    nbr AS (
        SELECT a.x, a.y, a.v, sum(b.v - st.mu) AS sz, count(*) AS w
        FROM grid a JOIN grid b
          ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
         AND NOT (a.x = b.x AND a.y = b.y), stats st
        GROUP BY a.x, a.y, a.v
    )
    SELECT round((st.n / sum(nb.w)) * sum((nb.v - st.mu) * nb.sz)
                 / (st.s2 - st.n * st.mu * st.mu), 9) AS morans_i,
           CAST(sum(nb.w) AS BIGINT) AS w_pairs,
           st.n AS n_cells
    FROM nbr nb, stats st
    GROUP BY st.n, st.s2, st.mu
"""


def q_morans_local(sf_dir: str):
    """Local (Anselin) Moran's I per cell (stages/autocorr.py:
    morans_i_local) — same collar-exchange frame, per-cell
    I_i = z_i * S_i / m2 emitted as a new tile layer, exploded to
    (cell_x, cell_y, local_i) rows, rounded to 9 decimals for the SQL
    compare (per-cell values are O(10))."""
    import pyarrow.compute as pc

    from .stages.autocorr import morans_i_local

    out = morans_i_local(_hash_grid_layer(3, 16, mod=251))
    cells = _explode_tiles_to_cells(out, value_cast="float64", drop_zero=False)
    return cells.map_batches(
        lambda b: pa.table({"cell_x": b["cell_x"], "cell_y": b["cell_y"],
                            "local_i": pc.round(b["density"], 9)}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_MORANS_LOCAL = """
    WITH grid AS (
        SELECT x, y, CAST((x * 2654435761 + y * 40503) % 251 AS DOUBLE) AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    stats AS (SELECT sum(v) / count(*) AS mu, count(*) AS n,
                     sum(v * v) AS s2, sum(v) AS s FROM grid),
    m2 AS (SELECT (s2 - n * mu * mu) / n AS m2 FROM stats),
    nbr AS (
        SELECT a.x, a.y, a.v, sum(b.v - st.mu) AS sz
        FROM grid a JOIN grid b
          ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
         AND NOT (a.x = b.x AND a.y = b.y), stats st
        GROUP BY a.x, a.y, a.v
    )
    SELECT nb.x AS cell_x, nb.y AS cell_y,
           round((nb.v - st.mu) * nb.sz / m2.m2, 9) AS local_i
    FROM nbr nb, stats st, m2
"""


def q_gearys_c(sf_dir: str):
    """Global Geary's C (stages/autocorr.py:gearys_c_global) over the
    mod-251 hash grid with queen weights — the Moran's-I complement
    (squared pairwise differences instead of cross-products). Same slim
    two-pass shape; SQL-checked to 9 decimals (all pairwise terms are
    exact integer-valued doubles; only the final divisions round)."""
    import pandas as pd

    from .stages.autocorr import gearys_c_global

    r = gearys_c_global(_hash_grid_layer(3, 16, mod=251))
    return pd.DataFrame([{"gearys_c": round(r["gearys_c"], 9),
                          "w_pairs": int(r["w_pairs"]),
                          "n_cells": int(r["n_cells"])}])


SQL_GEARYS_C = """
    WITH grid AS (
        SELECT x, y, CAST((x * 2654435761 + y * 40503) % 251 AS DOUBLE) AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    stats AS (SELECT sum(v) / count(*) AS mu, count(*) AS n,
                     sum(v * v) AS s2, sum(v) AS s FROM grid),
    nbr AS (
        SELECT a.x, a.y, sum((a.v - b.v) * (a.v - b.v)) AS d2, count(*) AS w
        FROM grid a JOIN grid b
          ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
         AND NOT (a.x = b.x AND a.y = b.y)
        GROUP BY a.x, a.y
    )
    SELECT round(((st.n - 1) / (2.0 * sum(nb.w))) * sum(nb.d2)
                 / (st.s2 - st.n * st.mu * st.mu), 9) AS gearys_c,
           CAST(sum(nb.w) AS BIGINT) AS w_pairs,
           st.n AS n_cells
    FROM nbr nb, stats st
    GROUP BY st.n, st.s2, st.mu
"""


def q_getis_ord(sf_dir: str):
    """Getis–Ord Gi* hot-spot z-scores per cell (stages/autocorr.py:
    getis_ord_gstar) — 3×3 window INCLUDING the center, same collar
    exchange as the local Moran's. Exploded to (cell_x, cell_y, gi_star)
    rows, rounded to 9 decimals for the SQL compare (window sums are exact
    integers; mean/std divisions and the sqrt are correctly rounded from
    identical operands on both sides)."""
    import pyarrow.compute as pc

    from .stages.autocorr import getis_ord_gstar

    out = getis_ord_gstar(_hash_grid_layer(3, 16, mod=251))
    cells = _explode_tiles_to_cells(out, value_cast="float64", drop_zero=False)
    return cells.map_batches(
        lambda b: pa.table({"cell_x": b["cell_x"], "cell_y": b["cell_y"],
                            "gi_star": pc.round(b["density"], 9)}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_GETIS_ORD = """
    WITH grid AS (
        SELECT x, y, CAST((x * 2654435761 + y * 40503) % 251 AS DOUBLE) AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    stats AS (SELECT sum(v) / count(*) AS mu, count(*) AS n,
                     sqrt(sum(v * v) / count(*)
                          - (sum(v) / count(*)) * (sum(v) / count(*))) AS sd
              FROM grid),
    win AS (
        SELECT a.x, a.y, sum(b.v) AS sv, count(*) AS w
        FROM grid a JOIN grid b
          ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
        GROUP BY a.x, a.y
    )
    SELECT wn.x AS cell_x, wn.y AS cell_y,
           round((wn.sv - st.mu * wn.w)
                 / (st.sd * sqrt((st.n * wn.w - wn.w * wn.w) / (st.n - 1.0))),
                 9) AS gi_star
    FROM win wn, stats st
"""


def q_match_histogram(sf_dir: str):
    """Histogram matching (stages/enhance.py:match_histogram): remap the
    mod-251 hash grid so its value distribution follows the mod-17 hash
    grid's. SQL-checked bit-exact — the transfer rule
    T(v) = min{t : cdf_tgt(t)*N_src >= cdf_src(v)*N_tgt} is pure integer
    arithmetic (cross-multiplied, no float division anywhere)."""
    from .stages.enhance import match_histogram

    out = match_histogram(_hash_grid_layer(3, 16, mod=251),
                          _hash_grid_layer(3, 16, mod=17))
    return _explode_tiles_to_cells(out, value_cast="int64", drop_zero=False)


SQL_MATCH_HISTOGRAM = """
    WITH src AS (
        SELECT x, y, (x * 2654435761 + y * 40503) % 251 AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    tgt AS (
        SELECT (x * 2654435761 + y * 40503) % 17 AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    scum AS (
        SELECT v, sum(cnt) OVER (ORDER BY v) AS c
        FROM (SELECT v, count(*) AS cnt FROM src GROUP BY v)
    ),
    tcum AS (
        SELECT v, sum(cnt) OVER (ORDER BY v) AS c
        FROM (SELECT v, count(*) AS cnt FROM tgt GROUP BY v)
    ),
    ns AS (SELECT count(*) AS n FROM src),
    nt AS (SELECT count(*) AS n FROM tgt),
    xfer AS (
        SELECT s.v AS v, min(t.v) AS tv
        FROM scum s, tcum t, ns, nt
        WHERE t.c * ns.n >= s.c * nt.n
        GROUP BY s.v
    )
    SELECT g.x AS cell_x, g.y AS cell_y, CAST(x.tv AS BIGINT) AS density
    FROM src g JOIN xfer x ON g.v = x.v
"""


def q_normalize_grid(sf_dir: str):
    """Layer normalize/rescale to [0, 1000]
    (stages/enhance.py:normalize_layer): one min/max aggregate +
    shuffle-free linear remap. SQL-checked bit-exact (fixed operand
    order, integer-valued inputs)."""
    from .stages.enhance import normalize_layer

    out = normalize_layer(_hash_grid_layer(3, 16, mod=251), 0.0, 1000.0)
    return _explode_tiles_to_cells(out, value_cast="float64", drop_zero=False)


SQL_NORMALIZE = """
    WITH grid AS (
        SELECT x, y, CAST((x * 2654435761 + y * 40503) % 251 AS DOUBLE) AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    st AS (SELECT min(v) AS lo, max(v) AS hi FROM grid)
    SELECT x AS cell_x, y AS cell_y,
           0.0 + (v - lo) * (1000.0 - 0.0) / (hi - lo) AS density
    FROM grid, st
"""


def q_sigmoidal(sf_dir: str):
    """Sigmoidal contrast stretch (stages/enhance.py:sigmoidal_contrast,
    alpha=0.5 beta=6): layer min/max aggregate + shuffle-free per-cell
    remap. SQL-checked — the closed-form transform is reproduced in DuckDB
    with exp(); both sides round to 9 decimals (pure scalar math, no
    summation-order hazards)."""
    import pyarrow.compute as pc

    from .stages.enhance import sigmoidal_contrast

    sg = sigmoidal_contrast(_hash_grid_layer(3, 16, mod=251),
                            alpha=0.5, beta=6.0)
    out = _explode_tiles_to_cells(sg, value_cast="float64", drop_zero=False)
    return out.map_batches(
        lambda b: pa.table({"cell_x": b["cell_x"], "cell_y": b["cell_y"],
                            "density": pc.round(b["density"], 9)}),
        batch_format="pyarrow", zero_copy_batch=True)


SQL_SIGMOIDAL = """
    WITH grid AS (
        SELECT x, y, CAST((x * 2654435761 + y * 40503) % 251 AS DOUBLE) AS v
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    stats AS (SELECT min(v) AS lo, max(v) AS hi FROM grid)
    SELECT x AS cell_x, y AS cell_y,
           round(lo + (hi - lo)
                 * ((1.0/(1.0 + exp(6.0*(0.5 - (v - lo)/(hi - lo)))) - 1.0/(1.0 + exp(6.0*0.5)))
                    / (1.0/(1.0 + exp(6.0*(0.5 - 1.0))) - 1.0/(1.0 + exp(6.0*0.5)))), 9) AS density
    FROM grid, stats
"""


def q_region_group(sf_dir: str):
    """RegionGroup (stages/regiongroup): distributed connected-component
    labeling (per-tile run-based CCL + edge-equivalence stitch) over a
    deterministic hash-valued 48x48 grid, reported label-free as
    (region_cell = min global cell index, n_cells) so a DuckDB recursive
    transitive-closure oracle can check it exactly."""
    from .core.layout import Extent, LayoutDefinition, TileLayout
    from .stages.regiongroup import region_group, region_stats

    lay = LayoutDefinition(Extent(0, 0, 48, 48), TileLayout(3, 3, 16, 16))
    labeled = region_group(_hash_grid_layer(3, 16), lay)
    return region_stats(labeled, lay)


SQL_REGION_GROUP = """
    WITH RECURSIVE grid AS (
        SELECT x, y, (x * 2654435761 + y * 40503) % 3 AS val,
               y * 48 + x AS id
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    lab AS (
        SELECT x, y, val, id AS lab FROM grid
        UNION
        SELECT g.x, g.y, g.val, l.lab
        FROM lab l
        JOIN grid g ON g.val = l.val
         AND ((abs(g.x - l.x) = 1 AND g.y = l.y)
           OR (abs(g.y - l.y) = 1 AND g.x = l.x))
        WHERE l.lab < g.y * 48 + g.x
    ),
    comp AS (SELECT x, y, min(lab) AS region FROM lab GROUP BY x, y)
    SELECT region AS region_cell, CAST(count(*) AS BIGINT) AS n_cells
    FROM comp GROUP BY region
"""


def q_vectorize(sf_dir: str):
    """Vectorize (stages/vectorize.py — raster regions -> polygons): the
    same 48x48 hash grid as q_region_group is labeled, every region's
    boundary is traced into a Polygon-with-holes, and the polygon AREA is
    reported per region (cell size 1, so a correct trace makes the polygon
    area exactly the region's cell count — holes subtracted). SQL-checked
    against the recursive transitive-closure oracle's region sizes: a
    value-level check of ring assembly, saddle handling and hole signs."""
    import ray

    from .core.layout import Extent, LayoutDefinition, TileLayout
    from .stages.regiongroup import region_group, region_stats
    from .stages.vectorize import vectorize

    lay = LayoutDefinition(Extent(0, 0, 48, 48), TileLayout(3, 3, 16, 16))
    labeled = region_group(_hash_grid_layer(3, 16), lay).materialize()
    ids = region_stats(labeled, lay, keep_label=True).select_columns(
        ["label", "region_cell"])
    polys = vectorize(labeled, lay).select_columns(["lab", "area"])
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    out = polys.join(ids, join_type="inner", on=("lab",), right_on=("label",),
                     num_partitions=max(2, min(8, cpus // 2)))
    return out.select_columns(["region_cell", "area"])


SQL_VECTORIZE = """
    WITH RECURSIVE grid AS (
        SELECT x, y, (x * 2654435761 + y * 40503) % 3 AS val,
               y * 48 + x AS id
        FROM (SELECT unnest(range(0, 48)) AS x),
             (SELECT unnest(range(0, 48)) AS y)
    ),
    lab AS (
        SELECT x, y, val, id AS lab FROM grid
        UNION
        SELECT g.x, g.y, g.val, l.lab
        FROM lab l
        JOIN grid g ON g.val = l.val
         AND ((abs(g.x - l.x) = 1 AND g.y = l.y)
           OR (abs(g.y - l.y) = 1 AND g.x = l.x))
        WHERE l.lab < g.y * 48 + g.x
    ),
    comp AS (SELECT x, y, min(lab) AS region FROM lab GROUP BY x, y)
    SELECT region AS region_cell, CAST(count(*) AS DOUBLE) AS area
    FROM comp GROUP BY region
"""


def q_euclidean_distance(sf_dir: str):
    """EuclideanDistanceTile (stages/interpolation.euclidean_distance):
    per-cell distance to the nearest of ~samples (events subsampled
    event_id %% 211 == 0), sample side broadcast once (ray.put), no shuffle.
    min() is order-independent -> bit-exact SQL parity via a cells x points
    cross join."""
    from .stages.interpolation import euclidean_distance

    ds = _read(sf_dir, "events", ["event_id"])
    ds = ds.map_batches(_mod_filter("event_id", 211), batch_format="pyarrow",
                        zero_copy_batch=True)
    pts = ds.map_batches(lambda b: derive_coords_batch(b, "event_id"),
                         batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    ed = euclidean_distance(pts.rename(columns={"lon": "x", "lat": "y"}),
                            _kd_layout(), (0, 0, 3, 3))
    return _explode_tiles_to_cells(ed, value_cast="float64", drop_zero=False)


SQL_EUCLID = f"""
    WITH pts AS ({SQL_COORDS}),
    sample AS (SELECT lon, lat FROM pts WHERE event_id % 211 = 0),
    cells AS (
        SELECT x, y,
               -180.0 + (CAST(x AS DOUBLE) + 0.5) * 5.625 AS cx,
               85.0 - (CAST(y AS DOUBLE) + 0.5) * 2.65625 AS cy
        FROM (SELECT unnest(range(0, 64)) AS x),
             (SELECT unnest(range(0, 64)) AS y)
    )
    SELECT CAST(x AS BIGINT) AS cell_x, CAST(y AS BIGINT) AS cell_y,
           sqrt(min((cx - lon) * (cx - lon) + (cy - lat) * (cy - lat))) AS density
    FROM cells CROSS JOIN sample
    GROUP BY x, y
"""


def q_idw_toy(sf_dir: str):
    """IDW interpolation surface (stages/interpolation.idw_interpolation)
    over the sampled events; per-tile mean reported (rows-only — float sum
    order varies; exactness is pytest-verified cell-wise)."""
    from .stages.interpolation import idw_interpolation
    from .stages.layer_ops import batch_to_cube

    ds = _read(sf_dir, "events", ["event_id", "value"])
    ds = ds.map_batches(_mod_filter("event_id", 211), batch_format="pyarrow",
                        zero_copy_batch=True)
    pts = ds.map_batches(lambda b: derive_coords_batch(b, "event_id"),
                         batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    pts = pts.rename(columns={"lon": "x", "lat": "y"})
    surf = idw_interpolation(pts, _kd_layout(), (0, 0, 3, 3), power=2.0)

    def summarize(b: pa.Table) -> pa.Table:
        cube = batch_to_cube(b)
        means = np.nanmean(cube.reshape(cube.shape[0], -1), axis=1) if cube.size else np.array([])
        return pa.table({"key_col": b["key_col"], "key_row": b["key_row"],
                         "mean_val": pa.array(means, pa.float64())})

    return surf.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)


def q_idw_grid(sf_dir: str):
    """IDW interpolation SQL-BIT-EXACT (round-4 late conversion; the
    per-tile-mean q_idw_toy remains rows-only). Three levers: (1) the
    _kd_layout cell centers are exact dyadics, so DuckDB recomputes them
    without rounding drift; (2) power=2 takes the reciprocal fast path
    (w = 1/d2 — one correctly-rounded op, no np.power); (3) with EXACTLY 8
    samples, numpy's axis-1 reduction is the fixed pairwise tree
    ((w1+w2)+(w3+w4)) + ((w5+w6)+(w7+w8)) (verified), which the oracle
    spells out literally. Samples: the first 8 events with
    event_id % 97 == 0 (dense enough for sf0.001's 1000 events). Output: (gr, gc, val) per cell."""
    from .core.raster import decode_tile
    from .stages.interpolation import idw_interpolation

    ds = _read(sf_dir, "events", ["event_id", "value"])
    ds = ds.map_batches(_mod_filter("event_id", 97), batch_format="pyarrow",
                        zero_copy_batch=True)
    pts = ds.map_batches(lambda b: derive_coords_batch(b, "event_id"),
                         batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    # first 8 samples by event_id — sf-independent (the 8-term pairwise sum
    # tree is spelled out literally in the oracle, so the count is fixed)
    pts = pts.sort_values("event_id").reset_index(drop=True).head(8)
    if len(pts) != 8:
        raise ValueError(f"q_idw_grid needs exactly 8 samples, got {len(pts)}")
    pts = pts.rename(columns={"lon": "x", "lat": "y"})
    surf = idw_interpolation(pts, _kd_layout(), (0, 0, 3, 3), power=2.0)

    def per_cell(b: pa.Table) -> pa.Table:
        gr, gc, vals = [], [], []
        for row in b.to_pylist():
            t = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
            rr, cc = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
            gr.extend((row["key_row"] * 16 + rr).ravel().tolist())
            gc.extend((row["key_col"] * 16 + cc).ravel().tolist())
            vals.extend(t.ravel().tolist())
        return pa.table({"gr": pa.array(gr, pa.int64()), "gc": pa.array(gc, pa.int64()),
                         "val": pa.array(vals, pa.float64())})

    return surf.map_batches(per_cell, batch_format="pyarrow", zero_copy_batch=True)


def _sql_idw_grid() -> str:
    wexprs = [f"max(CASE WHEN rn = {k} THEN w END)" for k in range(1, 9)]
    nexprs = [f"max(CASE WHEN rn = {k} THEN w * v END)" for k in range(1, 9)]

    def tree(e: list) -> str:
        return (f"((({e[0]}) + ({e[1]})) + (({e[2]}) + ({e[3]})))"
                f" + ((({e[4]}) + ({e[5]})) + (({e[6]}) + ({e[7]})))")

    return f"""
    WITH s AS (
        SELECT value AS v,
               -85.0  + CAST((event_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 * 170.0 AS lat,
               -180.0 + CAST((event_id * 40503) % 65536 AS DOUBLE) / 65536.0 * 360.0 AS lon,
               row_number() OVER (ORDER BY event_id) AS rn
        FROM events WHERE event_id % 97 = 0
        ORDER BY event_id LIMIT 8
    ),
    cells AS (
        SELECT CAST(i // 64 AS BIGINT) AS gr, CAST(i % 64 AS BIGINT) AS gc,
               (-180.0 + (i % 64 // 16) * 90.0)
                 + ((i % 64 % 16) + 0.5) * (90.0 / 16.0) AS cx,
               (85.0 - (i // 64 // 16) * 42.5)
                 - ((i // 64 % 16) + 0.5) * (42.5 / 16.0) AS cy
        FROM range(0, 4096) t(i)
    ),
    wts AS (
        SELECT c.gr, c.gc, s.rn, s.v,
               1.0 / ((c.cx - s.lon) * (c.cx - s.lon)
                     + (c.cy - s.lat) * (c.cy - s.lat)) AS w
        FROM cells c JOIN s ON TRUE
    ),
    piv AS (
        SELECT gr, gc, {tree(wexprs)} AS wsum, {tree(nexprs)} AS num
        FROM wts GROUP BY gr, gc
    )
    SELECT gr, gc, num / wsum AS val FROM piv
    """


def q_approx_distinct(sf_dir: str):
    """HyperLogLog distinct counts (stages/stats.approx_distinct): one ~4 KB
    sketch per block, tree-merged; the data never shuffles. Rows-only (the
    estimate is approximate by design; merge exactness + 5%-error bounds are
    pytest-verified); exact distinct counts reported alongside for scale
    reference via the SAME partial-combine shape."""
    from .stages.stats import approx_distinct

    ests = {}
    for table, col in (("events", "user_id"), ("documents", "source")):
        ests[f"{table}.{col}"] = approx_distinct(_read(sf_dir, table, [col]), col)
    rows = [{"column": k, "approx_distinct": float(v)} for k, v in sorted(ests.items())]
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def q_hll_registers(sf_dir: str):
    """HyperLogLog SQL-BIT-EXACT (round-4 late conversion; the estimate
    query q_approx_distinct stays rows-only): the REAL distributed sketch
    path (stages/stats.approx_distinct_sketch — per-block partials, one
    tree-merge round) over two integer event columns, emitting the merged
    4096-register state. Registers are a pure splitmix64 function of the
    values, which the oracle replays in HUGEINT (split mulmod-2^64,
    xor/shift, bucket = top-12 bits, rho = 53 - bit_length(low 52) via
    bin()) — bit-for-bit. The estimate itself is a driver-local function of
    these registers (pytest-covered); this pins the whole distributed
    machinery: hash, bucketing, rho, partial build, register-max merge."""
    import ray.data

    from .stages.stats import approx_distinct_sketch

    tabs = []
    for col in ("event_id", "user_id"):
        sk = approx_distinct_sketch(_read(sf_dir, "events", [col]), col)
        tabs.append(pa.table({
            "col": pa.array([col] * sk.m, pa.string()),
            "idx": pa.array(np.arange(sk.m, dtype=np.int64), pa.int64()),
            "reg": pa.array(sk.reg.astype(np.int64), pa.int64()),
        }))
    return ray.data.from_arrow(pa.concat_tables(tabs))


def _sql_splitmix64(expr: str) -> str:
    """DuckDB expression computing splitmix64(expr) for nonneg BIGINT input
    — kept next to core/sketch.splitmix64's constants so they cannot drift.
    64x64-bit products overflow HUGEINT, so each multiply is split into
    32-bit halves mod 2^64."""
    g, c1, c2 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

    def mulmod(a: str, b: int) -> str:
        return (f"((({a}) % 4294967296) * {b}"
                f" + (((({a}) // 4294967296) * {b}) % 4294967296) * 4294967296)"
                f" % 18446744073709551616")

    x = f"((CAST({expr} AS HUGEINT) + {g}) % 18446744073709551616)"
    a = f"xor({x}, ({x}) >> 30)"
    b = f"({mulmod(a, c1)})"
    c = f"xor({b}, ({b}) >> 27)"
    d = f"({mulmod(c, c2)})"
    return f"xor({d}, ({d}) >> 31)"


def _sql_hll_registers(p: int = 12) -> str:
    m = 1 << p
    low_mod = 1 << (64 - p)
    nbits = 64 - p

    def one(col: str) -> str:
        return f"""
    SELECT '{col}' AS col, CAST(i AS BIGINT) AS idx,
           CAST(coalesce(reg_{col}.r, 0) AS BIGINT) AS reg
    FROM range(0, {m}) t(i) LEFT JOIN reg_{col} ON reg_{col}.idx = i"""

    def regs(col: str) -> str:
        return f"""
    hs_{col} AS (SELECT DISTINCT {_sql_splitmix64(col)} AS h FROM events),
    reg_{col} AS (
        SELECT CAST(h >> {64 - p} AS BIGINT) AS idx,
               max({nbits} + 1 - (CASE WHEN h % {low_mod} = 0 THEN 0
                                       ELSE length(bin(CAST(h % {low_mod} AS BIGINT)))
                                  END)) AS r
        FROM hs_{col} GROUP BY 1
    )"""

    return (f"WITH {regs('event_id')}, {regs('user_id')}"
            f"{one('event_id')} UNION ALL {one('user_id')}")


def q_kriging_toy(sf_dir: str):
    """Ordinary Kriging surface (stages/interpolation.ordinary_kriging):
    variogram FITTED from the sampled events (grid-search + weighted least
    squares, driver-side on the small sample set), then the actor-pool
    surface with the normal-equation inverse built once per actor. Per-tile
    mean reported (rows-only; cell exactness is pytest-verified against a
    per-cell linear-solve oracle)."""
    from .stages.interpolation import ordinary_kriging
    from .stages.layer_ops import batch_to_cube

    ds = _read(sf_dir, "events", ["event_id", "value"])
    ds = ds.map_batches(_mod_filter("event_id", 211), batch_format="pyarrow",
                        zero_copy_batch=True)
    pts = ds.map_batches(lambda b: derive_coords_batch(b, "event_id"),
                         batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    pts = pts.rename(columns={"lon": "x", "lat": "y"})
    surf = ordinary_kriging(pts, _kd_layout(), (0, 0, 3, 3), model="spherical")

    def summarize(b: pa.Table) -> pa.Table:
        cube = batch_to_cube(b)
        means = np.nanmean(cube.reshape(cube.shape[0], -1), axis=1) if cube.size else np.array([])
        return pa.table({"key_col": b["key_col"], "key_row": b["key_row"],
                         "mean_val": pa.array(means, pa.float64())})

    return surf.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)


def q_flagship_tiles_events(sf_dir: str):
    """The flagship chain's SQL-checkable shape over events (round 4):
    deterministic coords -> STRtree PIP annotate against the FULL
    171-polygon fixture (128 rects + 40 convex rings + the 3-deep
    overlapping z-index stack) -> z4 tile aggregation with hit metrics.
    First driver query to value-check the PIP best-hit priority
    (max zindex, tie max value, tie min id) and general-ring even-odd
    casting bit-exact — q_pip_rect_grid covers only rectangles. The oracle
    carries the fixture's edge arrays as literals generated from the SAME
    _prep_parts precomputation the actors build (cannot drift)."""
    import ray

    from .stages.agg import partial_groupby
    from .stages.pip_join import PipJoiner

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: derive_coords_batch(b, "event_id"),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = ds.map_batches(
        PipJoiner,
        fn_constructor_kwargs={"polygons": ray.put(gen_polygons_table_cached()),
                               "mode": "annotate"},
        batch_format="pyarrow", zero_copy_batch=True, batch_size=4096,
        concurrency=_pool_size())

    def keyed(b: pa.Table) -> pa.Table:
        t = _tile_keys_z4(b)
        pid = t["polygon_id"].to_numpy(zero_copy_only=False)
        hit = pid >= 0
        return pa.table({
            "key_col": t["key_col"], "key_row": t["key_row"],
            "n_hits": t["n_hits"],
            "hit_doc": pa.array(hit.astype(np.int64), pa.int64()),
            "best_pid": pa.array(np.where(hit, pid, 0), pa.int64()),
        })

    return partial_groupby(
        joined.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True),
        ["key_col", "key_row"],
        [("n_hits", "count", "n_docs"), ("n_hits", "sum", "sum_hits"),
         ("hit_doc", "sum", "hit_docs"), ("best_pid", "sum", "sum_best_pid")],
        final="single")


def _sql_flagship_tiles() -> str:
    """Generated oracle for q_flagship_tiles_events: polygon bboxes,
    zindex/value priorities, and the non-horizontal edge arrays are emitted
    as literals FROM the engine's own PolygonIndex precomputation
    (_prep_parts), so the ray-cast arithmetic (lon < x1 + (lat-y1)*dx/dy,
    strict y-crossing test, inclusive bbox candidacy) is evaluated in the
    identical IEEE order DuckDB-side; even-odd = crossing-count parity."""
    from .core.wkb import decode
    from .fixtures import gen_polygons_table
    from .state.polygon_index import _prep_parts

    polys = gen_polygons_table()
    zidx = polys["zindex"].to_numpy()
    val = polys["value"].to_numpy()
    prows, erows = [], []
    for i in range(polys.num_rows):
        g = decode(polys["wkb"][i].as_py())
        pid = int(polys["polygon_id"][i].as_py())
        prows.append(
            f"({pid}, {int(zidx[i])}, {float(val[i])!r}, "
            f"{polys['xmin'][i].as_py()!r}, {polys['ymin'][i].as_py()!r}, "
            f"{polys['xmax'][i].as_py()!r}, {polys['ymax'][i].as_py()!r})")
        for (x1, y1, y2, dx, dy) in zip(*_prep_parts(g)[0]):
            erows.append(f"({pid}, {float(x1)!r}, {float(y1)!r}, {float(y2)!r}, "
                         f"{float(dx)!r}, {float(dy)!r})")
    return f"""
WITH pts AS ({SQL_COORDS}),
polys(polygon_id, zindex, value, xmin, ymin, xmax, ymax) AS (VALUES {', '.join(prows)}),
edges(polygon_id, x1, y1, y2, dx, dy) AS (VALUES {', '.join(erows)}),
cand AS (
  SELECT p.event_id, p.lat, p.lon, g.polygon_id, g.zindex, g.value
  FROM pts p JOIN polys g
    ON p.lon >= g.xmin AND p.lon <= g.xmax AND p.lat >= g.ymin AND p.lat <= g.ymax
), crossings AS (
  SELECT c.event_id, c.polygon_id, count(*) AS ncross
  FROM cand c JOIN edges e ON e.polygon_id = c.polygon_id
   AND ((e.y1 > c.lat) != (e.y2 > c.lat))
   AND c.lon < e.x1 + (c.lat - e.y1) * e.dx / e.dy
  GROUP BY c.event_id, c.polygon_id
), hits AS (
  SELECT c.event_id, c.polygon_id, c.zindex, c.value
  FROM cand c JOIN crossings x ON x.event_id = c.event_id AND x.polygon_id = c.polygon_id
  WHERE x.ncross % 2 = 1
), best AS (
  SELECT event_id, polygon_id,
         row_number() OVER (PARTITION BY event_id ORDER BY zindex DESC, value DESC, polygon_id ASC) AS rn
  FROM hits
), per_event AS (
  SELECT p.event_id, p.lat, p.lon,
         coalesce(b.polygon_id, -1) AS polygon_id,
         coalesce(h.n, 0) AS n_hits
  FROM pts p
  LEFT JOIN (SELECT event_id, count(*) AS n FROM hits GROUP BY event_id) h USING (event_id)
  LEFT JOIN (SELECT event_id, polygon_id FROM best WHERE rn = 1) b USING (event_id)
)
SELECT {SQL_KEYS_Z4},
       count(*) AS n_docs,
       CAST(sum(n_hits) AS BIGINT) AS sum_hits,
       CAST(sum(CASE WHEN polygon_id >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS hit_docs,
       CAST(sum(CASE WHEN polygon_id >= 0 THEN polygon_id ELSE 0 END) AS BIGINT) AS sum_best_pid
FROM per_event GROUP BY key_col, key_row
"""


def q_universal_kriging_toy(sf_dir: str):
    """Universal Kriging with linear drift (round 4,
    stages/interpolation.universal_kriging): OK plus polynomial trend terms
    in the normal equations — reproduces global trends OK flattens. Per-tile
    mean reported (rows-only; exactness pytest-verified against a per-cell
    solve oracle and the exact-plane-reproduction property)."""
    from .stages.interpolation import universal_kriging
    from .stages.layer_ops import batch_to_cube

    ds = _read(sf_dir, "events", ["event_id", "value"])
    ds = ds.map_batches(_mod_filter("event_id", 211), batch_format="pyarrow",
                        zero_copy_batch=True)
    pts = ds.map_batches(lambda b: derive_coords_batch(b, "event_id"),
                         batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    pts = pts.rename(columns={"lon": "x", "lat": "y"})
    surf = universal_kriging(pts, _kd_layout(), (0, 0, 3, 3), model="spherical",
                             drift="linear")

    def summarize(b: pa.Table) -> pa.Table:
        cube = batch_to_cube(b)
        means = np.nanmean(cube.reshape(cube.shape[0], -1), axis=1) if cube.size else np.array([])
        return pa.table({"key_col": b["key_col"], "key_row": b["key_row"],
                         "mean_val": pa.array(np.round(means, 9), pa.float64())})

    return surf.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)


def q_tin_toy(sf_dir: str):
    """Delaunay TIN surface (core/delaunay.py + stages/interpolation
    .tin_interpolation): triangulate the sampled events, rasterize the
    barycentric-linear surface per tile. Per-tile mean reported (rows-only;
    the Delaunay empty-circumcircle property, hull-area identity and exact
    affine reproduction are pytest-verified)."""
    from .stages.interpolation import tin_interpolation
    from .stages.layer_ops import batch_to_cube
    from .stages.sample import mix32

    # derive_coords_batch's lattice coords are affinely dependent (a thin
    # sliver hull — useless for a TIN); scatter with the full integer mix
    def scatter(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h1 = mix32(ids).astype(np.float64) / 4294967296.0
        h2 = mix32(ids + 777).astype(np.float64) / 4294967296.0
        return pa.table({"event_id": b["event_id"], "value": b["value"],
                         "x": pa.array(-180.0 + h1 * 360.0, pa.float64()),
                         "y": pa.array(-85.0 + h2 * 170.0, pa.float64())})

    ds = _read(sf_dir, "events", ["event_id", "value"])
    ds = ds.map_batches(_mod_filter("event_id", 37), batch_format="pyarrow",
                        zero_copy_batch=True)
    pts = ds.map_batches(scatter, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    surf = tin_interpolation(pts, _kd_layout(), (0, 0, 3, 3))

    def summarize(b: pa.Table) -> pa.Table:
        cube = batch_to_cube(b)
        means = np.nanmean(cube.reshape(cube.shape[0], -1), axis=1) if cube.size else np.array([])
        return pa.table({"key_col": b["key_col"], "key_row": b["key_row"],
                         "mean_val": pa.array(means, pa.float64())})

    return surf.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)


def _tin_grid_samples():
    """Integer-lattice sample sites + affine values for q_tin_grid."""
    from .stages.sample import mix32

    ids = np.arange(0, 10000, 400, dtype=np.int64)  # 25 sites
    x = (-180 + (mix32(ids) % 360)).astype(np.float64)
    y = (-85 + (mix32(ids + 777) % 170)).astype(np.float64)
    return ids, x, y, 2.0 * x + 3.0 * y + 7.0


def q_tin_grid(sf_dir: str):
    """Delaunay TIN SQL-CHECKED via the exact-affine-reproduction property
    (round-4 late conversion; q_tin_toy remains rows-only). Samples sit on
    an integer lattice with AFFINE values v = 2x + 3y + 7, so (1) every
    triangulation of the hull interpolates the same plane — the engine's
    jittered Bowyer-Watson choice is value-irrelevant, fp noise ~1e-12 —
    and (2) hull membership is exact integer cross-product arithmetic the
    oracle replays verbatim. Output values round to 6 decimals; the exact
    values have <= 6 decimal digits (dyadic cell centers x integer
    coefficients), so round-6 is exact, the 5e-7 boundary margin dwarfs
    the engine's ~1e-12 fp noise, and hull-edge clearance is pinned at
    1e-3 (test_interpolation).
    Any hole in the triangulation, wrong barycentric weights, or hull
    over/under-coverage flips a cell."""
    from .core.raster import decode_tile
    from .stages.interpolation import tin_interpolation

    import pandas as pd

    ids, x, y, vals = _tin_grid_samples()
    pts = pd.DataFrame({"x": x, "y": y, "value": vals, "event_id": ids})
    surf = tin_interpolation(pts, _kd_layout(), (0, 0, 3, 3))

    def per_cell(b: pa.Table) -> pa.Table:
        gr, gc, out = [], [], []
        for row in b.to_pylist():
            t = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
            rr, cc = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
            gr.extend((row["key_row"] * 16 + rr).ravel().tolist())
            gc.extend((row["key_col"] * 16 + cc).ravel().tolist())
            out.extend(None if np.isnan(v) else float(np.round(v, 6))
                       for v in t.ravel())
        return pa.table({"gr": pa.array(gr, pa.int64()), "gc": pa.array(gc, pa.int64()),
                         "val": pa.array(out, pa.float64())})

    return surf.map_batches(per_cell, batch_format="pyarrow", zero_copy_batch=True)


def _tin_hull() -> list:
    """Convex hull (CCW) of the integer sample lattice — exact monotone
    chain on ints."""
    _ids, x, y, _v = _tin_grid_samples()
    pts = sorted(set(zip(x.astype(int).tolist(), y.astype(int).tolist())))

    def half(ps):
        h = []
        for p in ps:
            while len(h) >= 2 and ((h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                                   - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])) <= 0:
                h.pop()
            h.append(p)
        return h

    lo, hi = half(pts), half(pts[::-1])
    return lo[:-1] + hi[:-1]


def _sql_tin_grid() -> str:
    hull = _tin_hull()
    hull_vals = ", ".join(f"({k}, {px}, {py})" for k, (px, py) in enumerate(hull))
    return f"""
    WITH hull(k, hx, hy) AS (VALUES {hull_vals}),
    cells AS (
        SELECT CAST(i // 64 AS BIGINT) AS gr, CAST(i % 64 AS BIGINT) AS gc,
               (-180.0 + (i % 64 // 16) * 90.0)
                 + ((i % 64 % 16) + 0.5) * (90.0 / 16.0) AS cx,
               (85.0 - (i // 64 // 16) * 42.5)
                 - ((i // 64 % 16) + 0.5) * (42.5 / 16.0) AS cy
        FROM range(0, 4096) t(i)
    ),
    inhull AS (
        SELECT c.gr, c.gc, c.cx, c.cy,
               bool_and((h2.hx - h.hx) * (c.cy - h.hy)
                        - (h2.hy - h.hy) * (c.cx - h.hx) >= 0) AS inside
        FROM cells c JOIN hull h ON TRUE
        JOIN hull h2 ON h2.k = (h.k + 1) % {len(hull)}
        GROUP BY c.gr, c.gc, c.cx, c.cy
    )
    SELECT gr, gc,
           CASE WHEN inside THEN round(2.0 * cx + 3.0 * cy + 7.0, 6) END AS val
    FROM inhull
    """


def q_voronoi_assign(sf_dir: str):
    """Voronoi diagram (core/delaunay.voronoi_cells — the Delaunay dual,
    extent rect ∩ neighbor-bisector half-planes; stages/overlay
    .voronoi_diagram) over the mix32-scattered nation sites, with a
    STREAMED 96x96 world sample grid assigned to cells via the ordinary
    broadcast PIP join (stages/pip_join.PipJoiner). SQL-checkable because
    a sample's containing cell must be its argmin-distance site; samples
    near a bisector are excluded by an IDENTICAL float margin rule on both
    sides (only IEEE add/sub/mul — bit-exact across numpy and DuckDB)."""
    import ray

    from .stages.overlay import voronoi_diagram
    from .stages.pip_join import PipJoiner
    from .stages.sample import mix32

    nk = np.sort(_read(sf_dir, "nation", ["n_nationkey"]).to_pandas()
                 ["n_nationkey"].to_numpy().astype(np.int64))
    sx = -180.0 + mix32(nk).astype(np.float64) / 4294967296.0 * 360.0
    sy = -85.0 + mix32(nk + 777).astype(np.float64) / 4294967296.0 * 170.0
    sites = pa.table({"site_id": pa.array(nk, pa.int64()),
                      "x": pa.array(sx, pa.float64()),
                      "y": pa.array(sy, pa.float64())})
    cells = voronoi_diagram(sites, (-180.0, -85.0, 180.0, 85.0))
    G = 96
    margin = 1e-6 * (360.0 * 360.0)

    def grid(b: pa.Table) -> pa.Table:
        i = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        px = -180.0 + ((i % G).astype(np.float64) + 0.5) * (360.0 / G)
        py = -85.0 + ((i // G).astype(np.float64) + 0.5) * (170.0 / G)
        d2 = (px[:, None] - sx[None, :]) ** 2 + (py[:, None] - sy[None, :]) ** 2
        part = np.partition(d2, 1, axis=1)
        keep = part[:, 1] - part[:, 0] > margin
        return pa.table({"sample_id": pa.array(i[keep], pa.int64()),
                         "lon": pa.array(px[keep], pa.float64()),
                         "lat": pa.array(py[keep], pa.float64())})

    ds = ray.data.range(G * G, override_num_blocks=4).map_batches(
        grid, batch_format="pyarrow", zero_copy_batch=True)
    joined = ds.map_batches(
        PipJoiner,
        fn_constructor_kwargs={"polygons": ray.put(cells), "mode": "inner"},
        batch_format="pyarrow", zero_copy_batch=True, batch_size=4096,
        concurrency=_pool_size(),
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"sample_id": b["sample_id"],
                         "site_id": b["polygon_id"]})

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _sql_voronoi() -> str:
    from .stages.sample import sql_mix32

    return f"""
    WITH sites AS (
        SELECT n_nationkey AS sid,
               -180.0 + ({sql_mix32('n_nationkey')}) / 4294967296.0 * 360.0 AS sx,
               -85.0  + ({sql_mix32('(n_nationkey + 777)')}) / 4294967296.0 * 170.0 AS sy
        FROM nation
    ),
    grid AS (
        SELECT CAST(i AS BIGINT) AS sample_id,
               -180.0 + (CAST(i % 96 AS DOUBLE) + 0.5) * (360.0 / 96) AS px,
               -85.0  + (CAST(i // 96 AS DOUBLE) + 0.5) * (170.0 / 96) AS py
        FROM range(0, 9216) t(i)
    ),
    d AS (
        SELECT sample_id, sid,
               (px - sx) * (px - sx) + (py - sy) * (py - sy) AS d2
        FROM grid, sites
    ),
    r AS (
        SELECT sample_id, sid, d2,
               row_number() OVER (PARTITION BY sample_id ORDER BY d2, sid) AS rk
        FROM d
    )
    SELECT a.sample_id, a.sid AS site_id
    FROM r a JOIN r b USING (sample_id)
    WHERE a.rk = 1 AND b.rk = 2 AND b.d2 - a.d2 > 1e-6 * (360.0 * 360.0)
    """


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic dedup (stages/ann.semantic_dedup): distributed
    k-means (per-batch matmul partials, k*d floats to the driver/iter) then
    in-cluster cosine near-dup drop. Rows-only (iterative float algorithm);
    planted-duplicate recovery is pytest-verified."""
    from .stages.ann import semantic_dedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = semantic_dedup(ds, threshold=0.985, n_centroids=8, iters=2)
    return out.select_columns(["vec_id", "cluster", "keep"])


def q_simplify_geoms(sf_dir: str):
    """Douglas-Peucker simplification (core/geom.simplify_dp) of per-event
    derived zigzag polylines; emits (event_id, n_in, n_out, length_in,
    length_out). Rows-only; DP properties are pytest-verified."""
    from .core.geom import line_length, simplify_dp

    ds = _read(sf_dir, "events", ["event_id"])
    ds = ds.map_batches(_mod_filter("event_id", 97), batch_format="pyarrow",
                        zero_copy_batch=True)

    def build_and_simplify(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False)
        n_in, n_out, len_in, len_out = [], [], [], []
        for eid in ids:
            rng = np.random.default_rng(int(eid) % (2**31))
            n = 30
            xs = np.arange(n, dtype=np.float64)
            ys = np.cumsum(rng.uniform(-1, 1, n))
            coords = np.c_[xs, ys]
            simp = simplify_dp(coords, 0.5)
            n_in.append(n)
            n_out.append(len(simp))
            len_in.append(line_length(coords))
            len_out.append(line_length(simp))
        return pa.table({
            "event_id": pa.array(ids),
            "n_in": pa.array(n_in, pa.int64()),
            "n_out": pa.array(n_out, pa.int64()),
            "length_in": pa.array(len_in, pa.float64()),
            "length_out": pa.array(len_out, pa.float64()),
        })

    return ds.map_batches(build_and_simplify, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_simplify_dp_grid(sf_dir: str):
    """SQL-checked Douglas-Peucker (core/geom.simplify_dp, classic JTS
    |cross|/sqrt(L2) > tol form — bit-exact on integer coords because exact
    ties force perfect-square L2): one INTEGER zigzag polyline per sampled event
    (x_k = k, y_k = (((event_id + k) * 2654435761) % 2147483647) % 21 - 10,
    n = 30, tolerance = 2.0), one output row per KEPT vertex
    (event_id, seq, x, y). With integer coords the keep test and the
    first-max argmax are exact, so the kept set is bit-exact
    vs a recursive-CTE DuckDB replay of the full DP recursion tree
    (ref:vector/src/main/scala/geotrellis/vector/simplify — JTS
    DouglasPeuckerSimplifier semantics; dir empty, path unverified)."""
    from .core.geom import simplify_dp

    ds = _read(sf_dir, "events", ["event_id"])
    ds = ds.map_batches(_mod_filter("event_id", 97), batch_format="pyarrow",
                        zero_copy_batch=True)

    def build_and_simplify(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False)
        n = 30
        k = np.arange(n, dtype=np.int64)
        out_id, out_seq, out_x, out_y = [], [], [], []
        for eid in ids:
            y = (((int(eid) + k) * 2654435761) % 2147483647) % 21 - 10
            coords = np.c_[k, y].astype(np.float64)
            simp = simplify_dp(coords, 2.0)
            xs = simp[:, 0].astype(np.int64)
            out_id.append(np.full(len(simp), eid, np.int64))
            out_seq.append(xs)  # x_k = k, so seq == x
            out_x.append(xs)
            out_y.append(simp[:, 1].astype(np.int64))
        if not out_id:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "seq": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        return pa.table({"event_id": pa.array(np.concatenate(out_id)),
                         "seq": pa.array(np.concatenate(out_seq)),
                         "x": pa.array(np.concatenate(out_x)),
                         "y": pa.array(np.concatenate(out_y))})

    return ds.map_batches(build_and_simplify, batch_format="pyarrow",
                          zero_copy_batch=True)


SQL_SIMPLIFY_DP = """
    WITH RECURSIVE
    eids AS (SELECT DISTINCT event_id AS eid FROM events WHERE event_id % 97 = 0),
    pts AS (
      SELECT e.eid, g.k,
             CAST(g.k AS BIGINT) AS x,
             CAST((((e.eid + g.k) * 2654435761) % 2147483647) % 21 - 10 AS BIGINT) AS y
      FROM eids e, (SELECT unnest(range(30)) AS k) g
    ),
    -- the DP recursion tree: each split segment (i, j) emits its two
    -- children around the first-max-|cross| interior point; the keep test
    -- is the exact integer form cross^2 > tol^2 * L2 with tol = 2
    segs(eid, i, j) AS (
      SELECT eid, 0, 29 FROM eids
      UNION ALL
      SELECT s.eid,
             CASE WHEN sd.side = 0 THEN s.i ELSE m.mk END,
             CASE WHEN sd.side = 0 THEN m.mk ELSE s.j END
      FROM segs s
      JOIN LATERAL (
        SELECT p.k AS mk,
               ((pj.x-pi.x)*(p.y-pi.y) - (pj.y-pi.y)*(p.x-pi.x)) AS cr,
               ((pj.x-pi.x)*(pj.x-pi.x) + (pj.y-pi.y)*(pj.y-pi.y)) AS l2
        FROM pts p, pts pi, pts pj
        WHERE p.eid = s.eid AND pi.eid = s.eid AND pj.eid = s.eid
          AND pi.k = s.i AND pj.k = s.j AND p.k > s.i AND p.k < s.j
        ORDER BY cr*cr DESC, p.k ASC LIMIT 1
      ) m ON TRUE
      CROSS JOIN (VALUES (0),(1)) sd(side)
      WHERE s.j > s.i + 1 AND m.cr*m.cr > 4 * m.l2
    ),
    -- DuckDB 1.0 quirk: a plain UNION inside a WITH RECURSIVE clause does
    -- not dedup; dedup explicitly
    kept AS (
      SELECT DISTINCT eid, k FROM (
        SELECT eid, i AS k FROM segs UNION ALL SELECT eid, j AS k FROM segs)
    )
    SELECT k2.eid AS event_id, k2.k AS seq, p.x, p.y
    FROM kept k2 JOIN pts p ON p.eid = k2.eid AND p.k = k2.k
"""


def q_render_png_toy(sf_dir: str):
    """Render surface: per-tile ColorMap -> PNG (core/render.py) as a
    map_batches sink stage over the toy layer; output per-tile PNG byte size
    + magic check (rows-only; codec round-trip pytest-verified)."""
    from .core.raster import decode_tile
    from .core.render import ColorMap, render_tile_png

    cmap = ColorMap(breaks=[2.0, 4.0, 6.0, 8.0],
                    colors=[(0, 0, 255, 255), (0, 255, 0, 255), (255, 255, 0, 255), (255, 0, 0, 255)])
    base = _toy_layer(sf_dir, 6)

    def render(b: pa.Table) -> pa.Table:
        sizes, ok = [], []
        for row in b.to_pylist():
            a = decode_tile(row["cells"], row["cols"], row["rows"], row["cell_type"])
            png = render_tile_png(a, cmap)
            sizes.append(len(png))
            ok.append(png[:8] == b"\x89PNG\r\n\x1a\n")
        return pa.table({"key_col": b["key_col"], "key_row": b["key_row"],
                         "png_bytes": pa.array(sizes, pa.int64()),
                         "png_magic_ok": pa.array(ok, pa.bool_())})

    return base.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)


def q_merge_layers_toy(sf_dir: str):
    from .stages.layer_ops import merge_layers

    out = merge_layers(_toy_layer(sf_dir, 0), _toy_layer(sf_dir, 1))
    return out.select_columns(["key_col", "key_row", "cols", "rows"])


def q_vector_tiles_rects(sf_dir: str):
    """Real MVT 2.1 protobuf round-trip SQL-checked: rect features ->
    ClipToGrid -> encode_mvt per tile -> decode_mvt back (both directions
    through core/mvt.py, no shortcuts), emitting per tile the decoded
    feature count, the sum of decoded feature IDs, AND the sum of the
    id-tagged property values — all three have integer closed forms from
    the dyadic rect fixture (cover = tile-range membership, no rect edge
    on a tile boundary)."""
    import ray.data

    from .core.mvt import decode_mvt
    from .fixtures import gen_rect_features
    from .stages.vector_tile import vector_tiles

    rects = gen_rect_features()
    layout = LayoutDefinition(Extent(-180.0, -90.0, 180.0, 90.0), TileLayout(16, 8, 32, 32))
    tiles = vector_tiles(ray.data.from_arrow(rects.select(["polygon_id", "wkb"])),
                         layout, fmt="mvt")

    def roundtrip(b: pa.Table) -> pa.Table:
        nf, sid, sprop = [], [], []
        for row in b.to_pylist():
            feats = decode_mvt(row["mvt"])["layer"]["features"]
            nf.append(len(feats))
            sid.append(sum(f["id"] for f in feats))
            sprop.append(sum(int(f["props"]["id"]) for f in feats))
        return pa.table({"key_col": b["key_col"].cast(pa.int64()),
                         "key_row": b["key_row"].cast(pa.int64()),
                         "n_features": pa.array(nf, pa.int64()),
                         "sum_ids": pa.array(sid, pa.int64()),
                         "sum_prop_ids": pa.array(sprop, pa.int64())})

    return tiles.map_batches(roundtrip, batch_format="pyarrow", zero_copy_batch=True)


def _sql_vector_tiles_rects() -> str:
    return f"""
    WITH {_sql_rect_fixture()},
    cover AS (
        SELECT fid, tc.x AS key_col, tr.y AS key_row
        FROM rects, range(0, 16) tc(x), range(0, 8) tr(y)
        WHERE tc.x BETWEEN gx0 // 32 AND (gx1 - 1) // 32
          AND tr.y BETWEEN gy0 // 32 AND (gy1 - 1) // 32
    )
    SELECT key_col, key_row, count(*) AS n_features,
           CAST(sum(fid) AS BIGINT) AS sum_ids,
           CAST(sum(fid) AS BIGINT) AS sum_prop_ids
    FROM cover GROUP BY 1, 2
    """


def q_vector_tiles_toy(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data

    from .stages.vector_tile import vector_tiles

    polys = gen_polygons_table_cached()
    convex = polys.filter(pc.greater_equal(polys["polygon_id"], 128))
    layout = LayoutDefinition(Extent(-180.0, -90.0, 180.0, 90.0), TileLayout(16, 16, 32, 32))
    out = vector_tiles(ray.data.from_arrow(convex.select(["polygon_id", "wkb"])), layout)
    return out.select_columns(["key_col", "key_row", "n_features"])


def q_reproject_utm(sf_dir: str):
    """Vector reproject through the Krüger-series UTM path (core/utm.py):
    events near zone 32's band -> utm:32n easting/northing. Rows-only;
    exactness is pytest-verified against a numerically-integrated
    meridian-arc oracle (test_utm)."""
    from .stages.reproject import reproject_points_batch

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: derive_coords_batch(b, "event_id"), batch_format="pyarrow", zero_copy_batch=True
    ).filter(expr="lon >= 6.0 and lon < 12.0 and lat > -80.0 and lat < 84.0")
    out = ds.map_batches(
        lambda b: reproject_points_batch(b, "latlng", "utm:32n"),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return out.select_columns(["event_id", "x", "y"])


def q_reproject_osgb(sf_dir: str):
    """Vector reproject to a NATIONAL GRID (EPSG:27700 British National
    Grid): generic Transverse Mercator on Airy 1830 + 7-parameter Helmert
    datum shift (core/utm.py:TransverseMercator, round 3). Rows-only;
    exactness is pytest-verified against the Ordnance Survey worked example
    (sub-mm)."""
    from .stages.reproject import reproject_points_batch

    def to_gb(b: pa.Table) -> pa.Table:
        # deterministically squeeze the world coords into the GB extent so
        # every event exercises the national-grid path
        lat = b["lat"].to_numpy(zero_copy_only=False)
        lon = b["lon"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": b["event_id"],
            "lat": pa.array(50.0 + (lat + 90.0) / 180.0 * 8.5, pa.float64()),
            "lon": pa.array(-7.0 + (lon + 180.0) / 360.0 * 8.8, pa.float64()),
        })

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: derive_coords_batch(b, "event_id"), batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(to_gb, batch_format="pyarrow", zero_copy_batch=True)
    out = ds.map_batches(
        lambda b: reproject_points_batch(b, "latlng", "epsg:27700"),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return out.select_columns(["event_id", "x", "y"])


def q_reproject_conic(sf_dir: str):
    """Vector reproject through the round-3 conic/polar grids
    (core/conic.py): each event goes to Lambert-93 (EPSG:2154, LCC 2SP),
    CONUS Albers (EPSG:5070, equal-area) and Antarctic Polar Stereographic
    (EPSG:3031) after a deterministic squeeze into each grid's domain.
    Rows-only; exactness is pytest-verified (EPSG GN7-2 worked example,
    conformality / equal-area numeric oracles, 1e-9-deg round-trips)."""
    from .stages.reproject import reproject_points_batch

    def project_all(b: pa.Table) -> pa.Table:
        lat = b["lat"].to_numpy(zero_copy_only=False)
        lon = b["lon"].to_numpy(zero_copy_only=False)
        u = (lat + 90.0) / 180.0
        v = (lon + 180.0) / 360.0
        out = {"event_id": b["event_id"]}
        for tag, crs, la, lo in [
            ("l93", "epsg:2154", 41.0 + u * 10.0, -4.0 + v * 11.0),
            ("aea", "epsg:5070", 25.0 + u * 24.0, -124.0 + v * 57.0),
            ("aps", "epsg:3031", -85.0 + u * 25.0, -180.0 + v * 360.0),
        ]:
            t = pa.table({"lat": pa.array(la, pa.float64()),
                          "lon": pa.array(lo, pa.float64())})
            p = reproject_points_batch(t, "latlng", crs)
            out[f"x_{tag}"] = p["x"]
            out[f"y_{tag}"] = p["y"]
        return pa.table(out)

    return _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: derive_coords_batch(b, "event_id"), batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(project_all, batch_format="pyarrow", zero_copy_batch=True)


def q_vector_tiles_mvt(sf_dir: str):
    """Real Mapbox Vector Tile output (protobuf, core/mvt.py): per-tile
    feature count + decoded-byte self-check columns (rows-only; wire-level
    exactness incl. the spec's own byte examples is pytest-verified)."""
    import pyarrow.compute as pc
    import ray.data

    from .core.mvt import decode_mvt
    from .stages.vector_tile import vector_tiles

    polys = gen_polygons_table_cached()
    convex = polys.filter(pc.greater_equal(polys["polygon_id"], 128))
    layout = LayoutDefinition(Extent(-180.0, -90.0, 180.0, 90.0), TileLayout(16, 16, 32, 32))
    out = vector_tiles(ray.data.from_arrow(convex.select(["polygon_id", "wkb"])), layout,
                       fmt="mvt", layer_name="polys")

    def summarize(b: pa.Table) -> pa.Table:
        ndec = [len(decode_mvt(m)["polys"]["features"]) for m in b["mvt"].to_pylist()]
        return pa.table({"key_col": b["key_col"], "key_row": b["key_row"],
                         "n_features": b["n_features"],
                         "n_decoded": pa.array(ndec, pa.int64())})

    return out.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)


def q_reproject_webmerc(sf_dir: str):
    """Vector reproject SQL-CHECKED (round-4 late conversion; the
    unrounded q_reproject_points and the UTM/OSGB/conic variants remain
    rows-only — their series expansions are too transcendental-deep for a
    safe margin). latlng -> WebMercator over events %13: x = R*radians(lon)
    is BIT-exact vs DuckDB (one shared pi/180 constant multiply, verified),
    and y = R*ln(tan(pi/4 + lat/2)) is emitted rounded to 2 decimals (cm)
    with a pinned margin — DuckDB's libm differs from numpy's by < 4e-9 m
    on this fixture while no y lands within 2.6e-6 m of a rounding
    boundary (~700x safety, test_reproject_webmerc_margins)."""
    import pyarrow.compute as pc

    from .stages.reproject import reproject_points_batch

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: derive_coords_batch(b, "event_id"), batch_format="pyarrow", zero_copy_batch=True
    )
    ds = ds.map_batches(_mod_filter("event_id", 13), batch_format="pyarrow",
                        zero_copy_batch=True)
    out = ds.map_batches(
        lambda b: reproject_points_batch(b, "latlng", "webmercator"),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return out.map_batches(
        lambda b: pa.table({"event_id": b["event_id"], "x": b["x"],
                            "y": pc.round(b["y"], 2)}),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def _sql_reproject_webmerc() -> str:
    clamp = ("CASE WHEN lat < -85.05112878 THEN -85.05112878 "
             "WHEN lat > 85.05112878 THEN 85.05112878 ELSE lat END")
    return f"""
    WITH pts AS (
        SELECT event_id,
           -85.0  + CAST((event_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296.0 * 170.0 AS lat,
           -180.0 + CAST((event_id * 40503) % 65536 AS DOUBLE) / 65536.0 * 360.0 AS lon
        FROM events WHERE event_id % 13 = 0
    )
    SELECT event_id, 6378137.0 * radians(lon) AS x,
           round(6378137.0 * ln(tan(pi() / 4.0 + radians({clamp}) / 2.0)), 2) AS y
    FROM pts
    """


def q_reproject_points(sf_dir: str):
    from .stages.reproject import reproject_points_batch

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: derive_coords_batch(b, "event_id"), batch_format="pyarrow", zero_copy_batch=True
    )
    out = ds.map_batches(
        lambda b: reproject_points_batch(b, "latlng", "webmercator"),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return out.select_columns(["event_id", "x", "y"])


# ---------------------------------------------------------------------------

def build_queries() -> dict:
    """All registered driver queries. ORDERING MATTERS: the driver snapshots
    the first ~50 queries into CORRECTNESS_r{N}.json, so every query that has
    a DuckDB oracle (build_oracle_sql) is emitted FIRST, rows-only queries and
    toys last (VERDICT r02 next-round #2)."""
    all_queries = {
        "q1_pricing_summary": q1_pricing_summary,
        "q_filter_range": q_filter_range,
        "q_join_customer_orders": q_join_customer_orders,
        "q_join_customer_orders_broadcast": q_join_customer_orders_broadcast,
        "q_join_nation_rollup": q_join_nation_rollup,
        "q_topk_orders": q_topk_orders,
        "q_grouped_topk": q_grouped_topk,
        "q_exact_quantiles": q_exact_quantiles,
        "q_events_hourly": q_events_hourly,
        "q_dedup_docs_exact": q_dedup_docs_exact,
        "q_paragraph_dedup": q_paragraph_dedup,
        "q_line_freq_filter": q_line_freq_filter,
        "q_quality_scorer": q_quality_scorer,
        "q_pack_shards": q_pack_shards,
        "q_pack_spans": q_pack_spans,
        "q_pii_scrub": q_pii_scrub,
        "q_curation_chain": q_curation_chain,
        "q_bm25_rank": q_bm25_rank,
        "q_duplicated_spans": q_duplicated_spans,
        "q_exact_substring_spans": q_exact_substring_spans,
        "q_doc_token_counts": q_doc_token_counts,
        "q_doc_bpe_tokens": q_doc_bpe_tokens,
        "q_tfidf_top_terms": q_tfidf_top_terms,
        "q_line_stats": q_line_stats,
        "q_gopher_repetition": q_gopher_repetition,
        "q_pii_redact": q_pii_redact,
        "q_domain_stats": q_domain_stats,
        "q_top_terms_sketch": q_top_terms_sketch,
        "q_stratified_sample": q_stratified_sample,
        "q_sessionize_events": q_sessionize_events,
        "q_window_rank": q_window_rank,
        "q_window_ntile": q_window_ntile,
        "q_decontaminate": q_decontaminate,
        "q_doc_quality": q_doc_quality,
        "q_lang_stats": q_lang_stats,
        "q_tile_assign_events": q_tile_assign_events,
        "q_pip_rect_grid": q_pip_rect_grid,
        "q_knn_events": q_knn_events,
        "q_knn_cell_pruned": q_knn_cell_pruned,
        "q_pyramid_counts": q_pyramid_counts,
        "q_spatial_join_layers": q_spatial_join_layers,
        "q_flagship_tiles_events": q_flagship_tiles_events,
        "q_flagship_pages": q_flagship_pages,
        "q_flagship_resumable": q_flagship_resumable,
        "q_pages_extract_geocode": q_pages_extract_geocode,
        "q_pages_extract_sql": q_pages_extract_sql,
        "q_cell_counts_hex": q_cell_counts_hex,
        "q_cell_counts_s2": q_cell_counts_s2,
        "q_cell_counts_geohash": q_cell_counts_geohash,
        "q_minhash_dedup_docs": q_minhash_dedup_docs,
        "q_simhash_pairs_docs": q_simhash_pairs_docs,
        "q_ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "q_langid_docs": q_langid_docs,
        "q_doc_fingerprints": q_doc_fingerprints,
        "q_ann_embeddings": q_ann_embeddings,
        "q_ann_lsh_embeddings": q_ann_lsh_embeddings,
        "q_ann_hnsw_embeddings": q_ann_hnsw_embeddings,
        "q_ann_ivf_embeddings": q_ann_ivf_embeddings,
        "q_ann_index_ivf": q_ann_index_ivf,
        "q_ann_pq_embeddings": q_ann_pq_embeddings,
        "q_embedding_near_dups": q_embedding_near_dups,
        "q_kernel_density": q_kernel_density,
        "q_region_group": q_region_group,
        "q_vectorize": q_vectorize,
        "q_equalize": q_equalize,
        "q_sigmoidal": q_sigmoidal,
        "q_match_histogram": q_match_histogram,
        "q_url_canonical": q_url_canonical,
        "q_url_dedup": q_url_dedup,
        "q_keep_best_docs": q_keep_best_docs,
        "q_grouped_topk_sort": q_grouped_topk_sort,
        "q_distinct_cents_per_user": q_distinct_cents_per_user,
        "q_grouped_median_cents": q_grouped_median_cents,
        "q_dominant_type_per_user": q_dominant_type_per_user,
        "q_bloom_dedup": q_bloom_dedup,
        "q_image_near_dups": q_image_near_dups,
        "q_jpeg_features": q_jpeg_features,
        "q_etl_pipeline": q_etl_pipeline,
        "q_etl_grid": q_etl_grid,
        "q_script_stats": q_script_stats,
        "q_normalize_grid": q_normalize_grid,
        "q_temporal_median": q_temporal_median,
        "q_temporal_trend": q_temporal_trend,
        "q_temporal_theil_sen": q_temporal_theil_sen,
        "q_layer_update": q_layer_update,
        "q_cluster_eps": q_cluster_eps,
        "q_approx_counts": q_approx_counts,
        "q_geom_measures": q_geom_measures,
        "q_jenks_breaks": q_jenks_breaks,
        "q_distinct_users_by_type": q_distinct_users_by_type,
        "q_reclassify_grid": q_reclassify_grid,
        "q_focal_mode_grid": q_focal_mode_grid,
        "q_convolve_grid": q_convolve_grid,
        "q_weighted_sample": q_weighted_sample,
        "q_focal_mean_grid": q_focal_mean_grid,
        "q_focal_stddev_grid": q_focal_stddev_grid,
        "q_terrain_slope_grid": q_terrain_slope_grid,
        "q_terrain_aspect_grid": q_terrain_aspect_grid,
        "q_tobler_grid": q_tobler_grid,
        "q_focal_circle_mean_grid": q_focal_circle_mean_grid,
        "q_morans_global": q_morans_global,
        "q_morans_local": q_morans_local,
        "q_gearys_c": q_gearys_c,
        "q_getis_ord": q_getis_ord,
        "q_convex_hull": q_convex_hull,
        "q_euclidean_distance": q_euclidean_distance,
        "q_idw_toy": q_idw_toy,
        "q_idw_grid": q_idw_grid,
        "q_kriging_toy": q_kriging_toy,
        "q_universal_kriging_toy": q_universal_kriging_toy,
        "q_approx_distinct": q_approx_distinct,
        "q_hll_registers": q_hll_registers,
        "q_tin_toy": q_tin_toy,
        "q_tin_grid": q_tin_grid,
        "q_voronoi_assign": q_voronoi_assign,
        "q_rasterize_rects": q_rasterize_rects,
        "q_cliptogrid_rects": q_cliptogrid_rects,
        "q_geojson_rects": q_geojson_rects,
        "q_shapefile_rects": q_shapefile_rects,
        "q_geoparquet_tris": q_geoparquet_tris,
        "q_geotiff_sums": q_geotiff_sums,
        "q_cog_sums": q_cog_sums,
        "q_layer_algebra_sums": q_layer_algebra_sums,
        "q_merge_layers_sums": q_merge_layers_sums,
        "q_cost_distance_grid": q_cost_distance_grid,
        "q_viewshed_grid": q_viewshed_grid,
        "q_hydrology_grid": q_hydrology_grid,
        "q_ann_sqeuclid": q_ann_sqeuclid,
        "q_ann_dot": q_ann_dot,
        "q_vector_tiles_rects": q_vector_tiles_rects,
        "q_render_png_grid": q_render_png_grid,
        "q_semantic_dedup": q_semantic_dedup,
        "q_simplify_geoms": q_simplify_geoms,
        "q_simplify_dp_grid": q_simplify_dp_grid,
        "q_rasterize_toy": q_rasterize_toy,
        "q_cliptogrid_toy": q_cliptogrid_toy,
        "q_multimodal_stub": q_multimodal_stub,
        "q_audio_features": q_audio_features,
        "q_audio_meta": q_audio_meta,
        "q_video_meta": q_video_meta,
        "q_raster_ingest": q_raster_ingest,
        "q_geotiff_ingest": q_geotiff_ingest,
        "q_histogram_breaks": q_histogram_breaks,
        "q_histogram_sketch_breaks": q_histogram_sketch_breaks,
        "q_polygonal_summary": q_polygonal_summary,
        "q_polygonal_summary_fractional": q_polygonal_summary_fractional,
        "q_zonal_fractional_grid": q_zonal_fractional_grid,
        "q_resample_minmax_grid": q_resample_minmax_grid,
        "q_reproject_bilinear_grid": q_reproject_bilinear_grid,
        "q_spacetime_counts": q_spacetime_counts,
        "q_pbsm_join": q_pbsm_join,
        "q_layer_roundtrip_zorder": q_layer_roundtrip_zorder,
        "q_layer_roundtrip_hilbert": q_layer_roundtrip_hilbert,
        "q_events_sliding_window": q_events_sliding_window,
        "q_events_asof_prev": q_events_asof_prev,
        "q_events_asof_next": q_events_asof_next,
        "q_moving_avg_events": q_moving_avg_events,
        "q_range_join": q_range_join,
        "q_semi_anti_join": q_semi_anti_join,
        "q_overlay_rects": q_overlay_rects,
        "q_overlay_general": q_overlay_general,
        "q_buffer_geoms": q_buffer_geoms,
        "q_layer_algebra_toy": q_layer_algebra_toy,
        "q_buffer_focal_toy": q_buffer_focal_toy,
        "q_merge_layers_toy": q_merge_layers_toy,
        "q_render_png_toy": q_render_png_toy,
        "q_terrain_toy": q_terrain_toy,
        "q_cost_distance_toy": q_cost_distance_toy,
        "q_viewshed_toy": q_viewshed_toy,
        "q_hydrology_toy": q_hydrology_toy,
        "q_geojson_cliptogrid": q_geojson_cliptogrid,
        "q_vector_tiles_toy": q_vector_tiles_toy,
        "q_vector_tiles_mvt": q_vector_tiles_mvt,
        "q_reproject_points": q_reproject_points,
        "q_reproject_webmerc": q_reproject_webmerc,
        "q_reproject_utm": q_reproject_utm,
        "q_reproject_osgb": q_reproject_osgb,
        "q_reproject_conic": q_reproject_conic,
    }
    # Round-5 capture ordering (VERDICT r04 next-round #6). The driver
    # snapshots the FIRST ~50 queries into CORRECTNESS_r{N}.json. Capture
    # history union r01-r04: 146 of 157 captured, 117 hash-verified, 0
    # standing failures. Priority:
    #   1. queries whose SQL oracle is NEW this round (first possible hash
    #      verification: fractional polygonal summary, min/max/sum resample),
    #   2. the 11 never-captured queries (completes the 157/157 record —
    #      every one is a rows-only twin of a SQL-green family member),
    #   3. queries through code paths CHANGED this round (Arrow-native tile
    #      merges, buffer-sliced hashing, distributed hot-key probe) —
    #      re-verify the refactors against the driver's own DuckDB pass,
    #   4. the stalest captures (last seen r1, then r2).
    sql_new_r5 = [
        "q_polygonal_summary_fractional", "q_resample_minmax_grid",
        "q_reproject_bilinear_grid", "q_video_meta",
        # late-r5 additions (first possible verification)
        "q_keep_best_docs", "q_events_asof_next", "q_moving_avg_events",
        "q_grouped_topk_sort", "q_distinct_cents_per_user",
        "q_grouped_median_cents", "q_dominant_type_per_user",
        "q_simplify_dp_grid", "q_zonal_fractional_grid",
        "q_curation_chain", "q_shapefile_rects", "q_geoparquet_tris",
        "q_cog_sums", "q_bm25_rank", "q_pack_spans", "q_pii_scrub",
        "q_ann_hnsw_embeddings",
    ]
    never_captured = [
        "q_terrain_toy", "q_cost_distance_toy", "q_viewshed_toy",
        "q_hydrology_toy", "q_geojson_cliptogrid", "q_vector_tiles_mvt",
        "q_reproject_utm", "q_reproject_osgb", "q_reproject_conic",
        "q_universal_kriging_toy", "q_histogram_sketch_breaks",
    ]
    changed_paths_r5 = [
        # tile-merge map_groups -> pyarrow (pyramid/rasterize/merge/ingest/
        # reproject/temporal/vector-tile/cost-distance)
        "q_pyramid_counts", "q_rasterize_rects", "q_cliptogrid_rects",
        "q_merge_layers_sums", "q_raster_ingest", "q_geotiff_ingest",
        "q_geotiff_sums", "q_temporal_median", "q_temporal_trend",
        "q_temporal_theil_sen", "q_vector_tiles_rects", "q_cost_distance_grid",
        "q_reproject_webmerc", "q_etl_grid",
        # buffer-sliced sha256 on the full-corpus passes + hot-key probe
        "q_dedup_docs_exact", "q_pages_extract_sql", "q_pages_extract_geocode",
        "q_tile_assign_events", "q_flagship_tiles_events", "q_flagship_pages",
        "q_url_dedup", "q_bloom_dedup", "q_minhash_dedup_docs",
    ]
    r1_stale = [
        "q_layer_algebra_toy", "q_buffer_focal_toy", "q_merge_layers_toy",
        "q_vector_tiles_toy", "q_reproject_points",
    ]
    r02_stale = [
        "q_filter_range", "q_join_customer_orders",
        "q_join_customer_orders_broadcast", "q_join_nation_rollup",
        "q_topk_orders", "q_grouped_topk", "q_exact_quantiles",
        "q_events_hourly", "q_duplicated_spans",
        "q_doc_token_counts", "q_doc_bpe_tokens", "q_doc_quality",
        "q_lang_stats", "q_pip_rect_grid",
        "q_knn_events", "q_knn_cell_pruned",
        "q_spatial_join_layers", "q_polygonal_summary", "q_spacetime_counts",
        "q_pbsm_join", "q_layer_roundtrip_zorder", "q_layer_roundtrip_hilbert",
        "q_events_sliding_window", "q_events_asof_prev",
    ]
    sql_checked = build_oracle_sql()
    front = sql_new_r5 + never_captured + changed_paths_r5 + r1_stale + r02_stale
    ordered = {k: all_queries[k] for k in front if k in all_queries}
    # remaining SQL-checked (r03-green) next, rows-only last
    ordered.update({k: v for k, v in all_queries.items()
                    if k not in ordered and k in sql_checked})
    ordered.update({k: v for k, v in all_queries.items() if k not in ordered})
    return ordered


def build_oracle_sql() -> dict:
    return {
        "q1_pricing_summary": SQL_Q1,
        "q_filter_range": SQL_FILTER_RANGE,
        "q_join_customer_orders": SQL_JOIN_CO,
        "q_join_customer_orders_broadcast": SQL_JOIN_CO,
        "q_join_nation_rollup": SQL_JOIN_NATION,
        "q_topk_orders": SQL_TOPK,
        "q_grouped_topk": SQL_GROUPED_TOPK,
        "q_exact_quantiles": SQL_EXACT_QUANTILES,
        "q_events_hourly": SQL_EVENTS_HOURLY,
        "q_dedup_docs_exact": SQL_DEDUP_EXACT,
        "q_paragraph_dedup": SQL_PARAGRAPH_DEDUP,
        "q_line_freq_filter": SQL_LINE_FREQ_FILTER,
        "q_quality_scorer": SQL_QUALITY_SCORER,
        "q_pack_shards": SQL_PACK_SHARDS,
        "q_pack_spans": SQL_PACK_SPANS,
        "q_pii_scrub": SQL_PII_SCRUB,
        "q_curation_chain": SQL_CURATION_CHAIN,
        "q_bm25_rank": SQL_BM25_RANK,
        "q_duplicated_spans": SQL_DUP_SPANS,
        "q_exact_substring_spans": SQL_EXACT_SPANS,
        "q_doc_token_counts": SQL_TOKEN_COUNTS,
        "q_doc_bpe_tokens": _sql_bpe(),
        "q_tfidf_top_terms": SQL_TFIDF,
        "q_line_stats": SQL_LINE_STATS,
        "q_gopher_repetition": SQL_GOPHER_REPETITION,
        "q_pii_redact": _sql_pii(),
        "q_domain_stats": _sql_domain_stats(),
        "q_top_terms_sketch": SQL_TOP_TERMS,
        "q_stratified_sample": _sql_stratified_sample(),
        "q_sessionize_events": SQL_SESSIONIZE,
        "q_window_rank": SQL_WINDOW_RANK,
        "q_window_ntile": SQL_WINDOW_NTILE,
        "q_decontaminate": SQL_DECONTAMINATE,
        "q_doc_quality": SQL_DOC_QUALITY,
        "q_lang_stats": SQL_LANG_STATS,
        "q_tile_assign_events": SQL_TILE_ASSIGN,
        "q_pip_rect_grid": SQL_PIP_RECT,
        "q_knn_events": SQL_KNN,
        "q_knn_cell_pruned": SQL_KNN,
        "q_pyramid_counts": SQL_PYRAMID,
        "q_spatial_join_layers": SQL_SPATIAL_JOIN,
        "q_polygonal_summary": SQL_POLY_SUMMARY,
        "q_polygonal_summary_fractional": _sql_poly_summary_frac(),
        "q_zonal_fractional_grid": SQL_ZONAL_FRACTIONAL,
        "q_resample_minmax_grid": SQL_RESAMPLE_MINMAX,
        "q_reproject_bilinear_grid": SQL_REPROJECT_BILINEAR,
        "q_spacetime_counts": SQL_SPACETIME,
        "q_pbsm_join": SQL_PBSM,
        "q_layer_roundtrip_zorder": SQL_LAYER_RT,
        "q_layer_roundtrip_hilbert": SQL_LAYER_RT,
        "q_events_sliding_window": SQL_SLIDING,
        "q_events_asof_prev": SQL_ASOF,
        "q_events_asof_next": SQL_ASOF_NEXT,
        "q_moving_avg_events": SQL_MOVING_AVG,
        "q_range_join": SQL_RANGE_JOIN,
        "q_semi_anti_join": SQL_SEMI_ANTI,
        "q_overlay_rects": SQL_OVERLAY,
        "q_overlay_general": SQL_OVERLAY_GENERAL,
        "q_simplify_dp_grid": SQL_SIMPLIFY_DP,
        "q_buffer_geoms": SQL_BUFFER,
        "q_kernel_density": SQL_KERNEL_DENSITY,
        "q_region_group": SQL_REGION_GROUP,
        "q_vectorize": SQL_VECTORIZE,
        "q_equalize": SQL_EQUALIZE,
        "q_sigmoidal": SQL_SIGMOIDAL,
        "q_match_histogram": SQL_MATCH_HISTOGRAM,
        "q_url_canonical": SQL_CANONICAL,
        "q_url_dedup": SQL_URL_DEDUP,
        "q_keep_best_docs": SQL_KEEP_BEST,
        "q_grouped_topk_sort": SQL_GROUPED_TOPK_SORT,
        "q_distinct_cents_per_user": SQL_DISTINCT_CENTS,
        "q_grouped_median_cents": SQL_GROUPED_MEDIAN,
        "q_dominant_type_per_user": SQL_DOMINANT_TYPE,
        "q_bloom_dedup": SQL_BLOOM_DEDUP,
        "q_focal_mean_grid": SQL_FOCAL_MEAN,
        "q_focal_stddev_grid": SQL_FOCAL_STDDEV,
        "q_terrain_slope_grid": SQL_TERRAIN_SLOPE,
        "q_terrain_aspect_grid": SQL_TERRAIN_ASPECT,
        "q_tobler_grid": SQL_TOBLER,
        "q_focal_circle_mean_grid": SQL_FOCAL_CIRCLE_MEAN,
        "q_reclassify_grid": SQL_RECLASSIFY,
        "q_focal_mode_grid": SQL_FOCAL_MODE,
        "q_convolve_grid": SQL_CONVOLVE,
        "q_script_stats": SQL_SCRIPT_STATS,
        "q_normalize_grid": SQL_NORMALIZE,
        "q_temporal_median": SQL_TEMPORAL_MEDIAN,
        "q_temporal_trend": SQL_TEMPORAL_TREND,
        "q_temporal_theil_sen": SQL_TEMPORAL_THEIL_SEN,
        "q_layer_update": SQL_LAYER_UPDATE,
        "q_cluster_eps": SQL_CLUSTER_EPS,
        "q_approx_counts": SQL_APPROX_COUNTS,
        "q_geom_measures": SQL_GEOM_MEASURES,
        "q_weighted_sample": _sql_weighted_sample(),
        "q_morans_global": SQL_MORANS_GLOBAL,
        "q_morans_local": SQL_MORANS_LOCAL,
        "q_gearys_c": SQL_GEARYS_C,
        "q_getis_ord": SQL_GETIS_ORD,
        "q_convex_hull": SQL_CONVEX_HULL,
        "q_euclidean_distance": SQL_EUCLID,
        "q_cell_counts_hex": SQL_CELL_COUNTS_HEX,
        "q_cell_counts_s2": SQL_CELL_COUNTS_S2,
        "q_cell_counts_geohash": _sql_cell_counts_geohash(5),
        # round-4 conversions (VERDICT r03 next-round #1)
        "q_minhash_dedup_docs": _sql_minhash_dedup(),
        "q_histogram_breaks": SQL_HISTOGRAM_BREAKS,
        "q_jenks_breaks": SQL_JENKS,
        "q_simhash_pairs_docs": _sql_simhash_pairs(),
        "q_ngram_jaccard_pairs": _sql_ngram_jaccard(),
        "q_langid_docs": _sql_langid(),
        "q_flagship_tiles_events": _sql_flagship_tiles(),
        "q_voronoi_assign": _sql_voronoi(),
        "q_rasterize_rects": _sql_rasterize_rects(),
        "q_cliptogrid_rects": _sql_cliptogrid_rects(),
        "q_geotiff_sums": _sql_geotiff_sums(),
        "q_cog_sums": _sql_geotiff_sums(),
        "q_layer_algebra_sums": _sql_layer_algebra_sums(),
        "q_merge_layers_sums": _sql_merge_layers_sums(),
        "q_cost_distance_grid": _sql_cost_distance_grid(),
        "q_viewshed_grid": _sql_viewshed_grid(),
        "q_hydrology_grid": _sql_hydrology_grid(),
        "q_doc_fingerprints": _sql_doc_fingerprints(),
        "q_audio_meta": _sql_audio_meta(),
        "q_video_meta": _sql_video_meta(),
        "q_hll_registers": _sql_hll_registers(),
        "q_ann_dot": _sql_ann_dot(),
        "q_geojson_rects": _sql_cliptogrid_rects(),
        "q_shapefile_rects": _sql_cliptogrid_rects(),
        "q_geoparquet_tris": SQL_GEOM_MEASURES,
        "q_etl_grid": _sql_etl_grid(),
        "q_idw_grid": _sql_idw_grid(),
        "q_pages_extract_sql": _sql_pages_extract(),
        "q_image_near_dups": _sql_image_near_dups(),
        "q_tin_grid": _sql_tin_grid(),
        "q_reproject_webmerc": _sql_reproject_webmerc(),
        "q_distinct_users_by_type": _sql_distinct_users_by_type(),
        "q_ann_sqeuclid": _sql_ann_sqeuclid(),
        "q_vector_tiles_rects": _sql_vector_tiles_rects(),
        "q_render_png_grid": _sql_render_png_grid(),
        # remaining queries are non-SQL-expressible (SFC curves, sketches,
        # ANN, tile payloads, pages corpus synth, stubs) -> rows-only check
    }
