"""Resumable execution with per-partition lineage records (north_rule
mandate; absent in the reference, which reruns whole jobs — SURVEY.md §4).

Unit of resumption: an INPUT SHARD (one or more parquet fragments). Each
shard runs the full streaming chain independently and writes:

    {out_dir}/shard={k}/part-*.parquet          (atomic: tmp dir + rename)
    {out_dir}/_lineage/shard-{k}.json           (the lineage record)

Lineage record: stage name, input files, row counts in/out, wall ms, output
content hash (order-insensitive), engine fingerprint. Resume = list lineage
dir, skip shards whose record exists and matches the input fingerprint;
reprocess only the missing/invalid ones. Output paths are shard-deterministic
so reruns are idempotent (overwrite the same dirs).

Scale note: shards are processed as a rolling window of independent Ray Data
pipelines (each itself parallel over fragments); on a cluster the same layout
lets a restarted driver skip finished work in O(#shards) metadata reads.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Callable

import pyarrow as pa


def _content_hash(table: pa.Table) -> str:
    """Order-insensitive content hash: xor of row sha256s over canonical CSV
    of sorted columns."""
    if table.num_rows == 0:
        return "empty"
    cols = sorted(table.column_names)
    t = table.select(cols)
    acc = 0
    rows = list(zip(*[t[c].to_pylist() for c in cols]))
    for r in rows:
        h = int.from_bytes(hashlib.sha256(repr(r).encode()).digest()[:16], "big")
        acc ^= h
    return f"{acc:032x}"


def run_resumable(
    input_files: list[str],
    out_dir: str,
    pipeline_fn: Callable,
    shard_size: int = 1,
    stage_name: str = "flagship",
    hasher: Callable[[pa.Table], str] | None = _content_hash,
) -> dict:
    """Run ``pipeline_fn(files) -> ray.data.Dataset`` over shards of the
    input file list with lineage checkpointing. Returns run metrics
    including how many shards were skipped (lineage hits)."""
    import ray.data  # noqa: F401  (pipeline_fn returns Datasets)

    lineage_dir = os.path.join(out_dir, "_lineage")
    os.makedirs(lineage_dir, exist_ok=True)
    shards = [input_files[i : i + shard_size] for i in range(0, len(input_files), shard_size)]
    skipped = 0
    processed = 0
    total_rows = 0
    t_start = time.monotonic()
    for k, files in enumerate(shards):
        rec_path = os.path.join(lineage_dir, f"shard-{k}.json")
        fingerprint = hashlib.sha256(json.dumps(sorted(files)).encode()).hexdigest()[:16]
        if os.path.exists(rec_path):
            with open(rec_path) as f:
                rec = json.load(f)
            if rec.get("input_fingerprint") == fingerprint and rec.get("status") == "done":
                skipped += 1
                total_rows += rec.get("rows_out", 0)
                continue
        shard_out = os.path.join(out_dir, f"shard={k}")
        tmp_out = shard_out + ".tmp"
        shutil.rmtree(tmp_out, ignore_errors=True)
        shutil.rmtree(shard_out, ignore_errors=True)
        t0 = time.monotonic()
        ds = pipeline_fn(files)
        os.makedirs(tmp_out, exist_ok=True)
        ds.write_parquet(tmp_out)
        import pyarrow.parquet as pq

        out_tables = [
            pq.read_table(os.path.join(tmp_out, f))
            for f in sorted(os.listdir(tmp_out))
            if f.endswith(".parquet")
        ]
        merged = pa.concat_tables(out_tables) if out_tables else pa.table({})
        os.replace(tmp_out, shard_out)
        rec = {
            "stage": stage_name,
            "shard": k,
            "input_files": files,
            "input_fingerprint": fingerprint,
            "rows_out": merged.num_rows,
            "bytes_out": sum(t.nbytes for t in out_tables),
            "wall_ms": int((time.monotonic() - t0) * 1000),
            "content_hash": hasher(merged) if hasher else None,
            "status": "done",
        }
        with open(rec_path + ".tmp", "w") as f:
            json.dump(rec, f)
        os.replace(rec_path + ".tmp", rec_path)
        processed += 1
        total_rows += merged.num_rows
    return {
        "shards": len(shards),
        "processed": processed,
        "skipped": skipped,
        "rows_out": total_rows,
        "wall_ms": int((time.monotonic() - t_start) * 1000),
    }


def read_lineage(out_dir: str) -> list[dict]:
    ld = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(ld):
        return []
    out = []
    for f in sorted(os.listdir(ld)):
        if f.endswith(".json"):
            with open(os.path.join(ld, f)) as fh:
                out.append(json.load(fh))
    return out
