"""BloomFilter core (core/bloom.py) + bloom_dedup (stages/dedup.py) vs a
brute set-difference oracle."""
import numpy as np
import pyarrow as pa


def test_bloom_no_false_negatives_and_low_fpr():
    from geotrellis_ray.core.bloom import BloomFilter, bloom_size_bits

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, 20_000, dtype=np.int64).astype(np.uint64)
    other = rng.integers(0, 2**63, 20_000, dtype=np.int64).astype(np.uint64)
    other = other[~np.isin(other, keys)]
    f = BloomFilter(bloom_size_bits(len(keys)), k=7)
    f.add_many(keys)
    assert f.contains_many(keys).all()                       # no false negatives
    assert f.contains_many(other).mean() < 0.03              # ~1% fp at 10 bits/key


def test_bloom_merge_is_union():
    from geotrellis_ray.core.bloom import BloomFilter

    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**62, 500, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, 2**62, 500, dtype=np.int64).astype(np.uint64)
    f1 = BloomFilter(1 << 14)
    f1.add_many(a)
    f2 = BloomFilter(1 << 14)
    f2.add_many(b)
    both = BloomFilter(1 << 14)
    both.add_many(np.concatenate([a, b]))
    f1.merge(f2)
    assert (f1.bits == both.bits).all()
    # round-trips through bytes
    r = BloomFilter.from_bytes(1 << 14, 7, f1.to_bytes())
    assert (r.bits == f1.bits).all()


def test_bloom_dedup_matches_set_difference(ray_session):
    import ray.data as rd

    from geotrellis_ray.stages.dedup import bloom_dedup

    rng = np.random.default_rng(41)
    ref_texts = [f"reference document number {i} body" for i in range(300)]
    # new corpus: 200 unseen + 80 copies of reference texts (some repeated)
    new_texts = [f"fresh document {i} content" for i in range(200)]
    new_texts += [ref_texts[int(i)] for i in rng.integers(0, 300, 80)]
    order = rng.permutation(len(new_texts))
    new_texts = [new_texts[i] for i in order]

    ref = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(1000, 1000 + len(ref_texts)), pa.int64()),
        "text": pa.array(ref_texts)})).repartition(5)
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(new_texts)), pa.int64()),
        "text": pa.array(new_texts)})).repartition(7)

    got = sorted(r["doc_id"] for r in
                 bloom_dedup(new, ref, "doc_id", "text").take_all())
    ref_set = set(ref_texts)
    expect = sorted(i for i, t in enumerate(new_texts) if t not in ref_set)
    assert got == expect
