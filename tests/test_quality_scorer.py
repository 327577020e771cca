"""HashedNgramScorer (functions/text_analysis.py) vs a pure-Python brute
oracle: per-doc hashed char-4-gram weight sums, including short/empty docs
and multi-chunk Arrow columns."""
import hashlib

import numpy as np
import pyarrow as pa


def _sha256_64(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def _brute(texts, seed="quality-v1", n=4, buckets=4096, scale=1000):
    p = 1099511628211
    M = 1 << 64
    pows = [pow(p, j, M) for j in range(n)]
    lut = [_sha256_64(f"{seed}|{j}") % (2 * scale + 1) - scale
           for j in range(buckets)]
    out = []
    for t in texts:
        bs = t.encode()
        score = 0
        g = max(len(bs) - n + 1, 0)
        for i in range(g):
            h = sum(bs[i + j] * pows[j] for j in range(n)) % M
            score += lut[h % buckets]
        out.append((g, score, int(score > 0)))
    return out


def test_scorer_matches_brute(ray_session):
    import ray.data as rd

    from geotrellis_ray.functions.text_analysis import HashedNgramScorer

    rng = np.random.default_rng(11)
    vocab = ["spark", "merge", "window", "batch", "agg", "a", ""]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(0, 30))))
             for _ in range(60)]
    texts += ["", "abc", "abcd", "x"]  # shorter than / exactly gram length
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)})).repartition(5)
    got = {r["doc_id"]: (r["n_grams"], r["score"], r["keep"])
           for r in ds.map_batches(HashedNgramScorer, concurrency=2,
                                   batch_format="pyarrow",
                                   zero_copy_batch=True).take_all()}
    expect = dict(zip(ids, _brute(texts)))
    assert got == expect


def test_scorer_deterministic_across_batching(ray_session):
    """Scores are independent of how docs land in blocks (the flat-buffer
    scan never reads across doc boundaries)."""
    import ray.data as rd

    from geotrellis_ray.functions.text_analysis import HashedNgramScorer

    texts = ["the quick brown fox " * k for k in range(1, 9)]
    tab = pa.table({"doc_id": pa.array(range(8), pa.int64()),
                    "text": pa.array(texts)})

    def run(nparts):
        ds = rd.from_arrow(tab).repartition(nparts)
        return {r["doc_id"]: r["score"]
                for r in ds.map_batches(HashedNgramScorer, concurrency=2,
                                        batch_format="pyarrow",
                                        zero_copy_batch=True).take_all()}

    assert run(1) == run(8)
