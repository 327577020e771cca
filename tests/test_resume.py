"""Resumable-runner test (SURVEY.md §5 item 5): crash after K shards, restart,
assert completed shards are NOT recomputed and the final output is identical
to an uninterrupted run."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

ray = pytest.importorskip("ray")
import ray.data  # noqa: E402

from geotrellis_ray.pipelines.resume import read_lineage, run_resumable  # noqa: E402


@pytest.fixture()
def shard_inputs(tmp_path):
    files = []
    for i in range(6):
        p = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(pa.table({"v": pa.array(range(i * 10, i * 10 + 10), pa.int64())}), p)
        files.append(p)
    return files


def _pipeline(files):
    ds = ray.data.read_parquet(files)
    return ds.map_batches(
        lambda b: pa.table({"v": b["v"], "v2": pa.compute.multiply(b["v"], 2)}),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def _read_all(out_dir):
    tabs = [pq.read_table(f) for f in sorted(glob.glob(os.path.join(out_dir, "shard=*/*.parquet")))]
    t = pa.concat_tables(tabs)
    import pandas as pd  # noqa: F401

    return t.to_pandas().sort_values("v").reset_index(drop=True)


def test_resume_skips_completed_shards(ray_session, shard_inputs, tmp_path):
    out_a = str(tmp_path / "out_full")
    full = run_resumable(shard_inputs, out_a, _pipeline, shard_size=1)
    assert full["processed"] == 6 and full["skipped"] == 0 and full["rows_out"] == 60

    # crash mid-run: shard 3 raises
    out_b = str(tmp_path / "out_crash")
    calls = {"n": 0}

    def flaky(files):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("simulated worker loss")
        return _pipeline(files)

    with pytest.raises(RuntimeError):
        run_resumable(shard_inputs, out_b, flaky, shard_size=1)
    done_before = [r for r in read_lineage(out_b) if r["status"] == "done"]
    assert len(done_before) == 3

    # restart: completed shards skipped, rest processed
    second = run_resumable(shard_inputs, out_b, _pipeline, shard_size=1)
    assert second["skipped"] == 3 and second["processed"] == 3

    import pandas as pd

    pd.testing.assert_frame_equal(_read_all(out_a), _read_all(out_b))

    # idempotent re-run: everything skipped, nothing rewritten
    third = run_resumable(shard_inputs, out_b, _pipeline, shard_size=1)
    assert third["skipped"] == 6 and third["processed"] == 0
    # lineage hashes match across the two directories shard-by-shard
    ha = {r["shard"]: r["content_hash"] for r in read_lineage(out_a)}
    hb = {r["shard"]: r["content_hash"] for r in read_lineage(out_b)}
    assert ha == hb


def test_resume_never_collects_output(ray_session, shard_inputs, tmp_path, monkeypatch):
    """Scale guard: lineage bookkeeping must come from parquet FOOTERS, never
    a driver read-back of shard output (at 100 TB a shard's join output is
    GBs). pq.read_table is poisoned for the whole run; rows_out stays exact."""
    import pyarrow.parquet as pq_mod

    def boom(*a, **k):
        raise AssertionError("run_resumable collected shard output on the driver")

    monkeypatch.setattr(pq_mod, "read_table", boom)
    out = str(tmp_path / "out_nocollect")
    m = run_resumable(shard_inputs, out, _pipeline, shard_size=2)
    assert m["processed"] == 3 and m["rows_out"] == 60
    recs = read_lineage(out)
    assert sorted(r["rows_out"] for r in recs) == [20, 20, 20]
    assert all(r["content_hash"] for r in recs)


def test_resume_concurrent_window_matches_sequential(ray_session, shard_inputs, tmp_path):
    """A bounded window of concurrent shards produces identical outputs and
    lineage hashes to the sequential run."""
    out_seq = str(tmp_path / "out_seq")
    out_win = str(tmp_path / "out_win")
    m1 = run_resumable(shard_inputs, out_seq, _pipeline, shard_size=1, window=1)
    m2 = run_resumable(shard_inputs, out_win, _pipeline, shard_size=1, window=3)
    assert m1["rows_out"] == m2["rows_out"] == 60
    import pandas as pd

    pd.testing.assert_frame_equal(_read_all(out_seq), _read_all(out_win))
    ha = {r["shard"]: r["content_hash"] for r in read_lineage(out_seq)}
    hb = {r["shard"]: r["content_hash"] for r in read_lineage(out_win)}
    assert ha == hb


def test_flagship_resumable(ray_session, tmp_path):
    """Flagship over a sharded pages corpus with lineage: crash-free run then
    an idempotent re-run that skips everything."""
    from geotrellis_ray.fixtures import write_pages_parquet
    from geotrellis_ray.pipelines.flagship import flagship_resumable

    pages = str(tmp_path / "pages")
    write_pages_parquet(pages, 2_000, shard_rows=500)  # 4 shard files
    out = str(tmp_path / "out")
    m1 = flagship_resumable(pages, out, shard_size=1)
    assert m1["shards"] == 4 and m1["processed"] == 4 and m1["rows_out"] == 2_000
    m2 = flagship_resumable(pages, out, shard_size=1)
    assert m2["skipped"] == 4 and m2["processed"] == 0
