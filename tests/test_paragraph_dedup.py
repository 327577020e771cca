"""paragraph_dedup (stages/dedup.py) vs a pure-Python keep-first oracle."""
import numpy as np
import pyarrow as pa
import pytest


def _oracle(docs: list[tuple[int, str]], k: int) -> dict[int, str]:
    seen = set()
    out = {}
    for did, text in sorted(docs):
        w = text.split(" ")
        kept = []
        for i in range(-(-len(w) // k)):
            para = " ".join(w[i * k:(i + 1) * k])
            if para not in seen:
                seen.add(para)
                kept.append(para)
        if kept:
            out[did] = " ".join(kept)
    return out


def _mk_docs(n=40, seed=3):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    shared = " ".join(rng.choice(vocab, 12))  # one exact 12-word paragraph
    docs = []
    for i in range(n):
        nw = int(rng.integers(5, 40))
        words = list(rng.choice(vocab, nw))
        text = " ".join(words)
        if i % 3 == 0:  # plant the shared paragraph at a chunk boundary
            text = shared + " " + text
        docs.append((i, text))
    # a full duplicate of doc 1, later id -> loses every paragraph
    docs.append((n + 5, docs[1][1]))
    return docs


@pytest.mark.parametrize("key", ["text", "hash"])
def test_paragraph_dedup_matches_oracle(ray_session, key):
    import ray.data as rd

    from geotrellis_ray.stages.dedup import paragraph_dedup

    docs = _mk_docs()
    tab = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string())})
    # many tiny blocks -> sorted kept stream splits docs across blocks,
    # exercising the edge-doc stitch
    ds = rd.from_arrow(tab).repartition(9)
    got = {r["doc_id"]: r["text_dedup"]
           for r in paragraph_dedup(ds, words_per_para=12, key=key).take_all()}
    expect = _oracle(docs, 12)
    assert got == expect
    # full duplicate doc dropped entirely
    assert 45 not in got and 1 in got


def test_paragraph_dedup_empty_and_single(ray_session):
    import ray.data as rd

    from geotrellis_ray.stages.dedup import paragraph_dedup

    docs = [(0, ""), (1, "solo words here"), (2, "")]
    tab = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string())})
    got = {r["doc_id"]: r["text_dedup"]
           for r in paragraph_dedup(rd.from_arrow(tab)).take_all()}
    assert got == _oracle(docs, 12)  # doc 0 keeps the "" paragraph; doc 2 loses it
