"""line_frequency_filter (stages/dedup.py) vs a pure-Python
frequency-threshold oracle — the CCNet drop-everywhere semantics, as
opposed to paragraph_dedup's keep-first."""
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _oracle(docs: list[tuple[int, str]], min_count: int) -> dict[int, tuple]:
    cnt = Counter()
    for _did, text in docs:
        cnt.update(text.split("\n"))
    out = {}
    for did, text in docs:
        parts = text.split("\n")
        kept = [p for p in parts if cnt[p] < min_count]
        if kept:
            out[did] = (len(parts), len(kept), "\n".join(kept))
    return out


def _mk_docs(n=40, seed=7):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    boiler = ["cookie banner text", "subscribe to newsletter", "nav home about"]
    docs = []
    for i in range(n):
        lines = [" ".join(rng.choice(vocab, int(rng.integers(2, 6))))
                 for _ in range(int(rng.integers(1, 6)))]
        if i % 2 == 0:  # plant boilerplate at varying positions
            lines.insert(int(rng.integers(0, len(lines) + 1)),
                         boiler[i % len(boiler)])
        docs.append((i, "\n".join(lines)))
    # a doc that is ONLY boilerplate -> drops out entirely
    docs.append((n + 5, "\n".join(boiler)))
    return docs


@pytest.mark.parametrize("key", ["text", "hash"])
def test_line_filter_matches_oracle(ray_session, key):
    import ray.data as rd

    from geotrellis_ray.stages.dedup import line_frequency_filter

    docs = _mk_docs()
    tab = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string())})
    # many tiny blocks -> the sorted kept stream splits docs across blocks,
    # exercising the edge-doc stitch
    ds = rd.from_arrow(tab).repartition(9)
    got = {r["doc_id"]: (r["n_lines"], r["n_kept"], r["text_filtered"])
           for r in line_frequency_filter(ds, min_count=2, key=key).take_all()}
    expect = _oracle(docs, 2)
    assert got == expect
    # all-boilerplate doc dropped entirely; boilerplate removed everywhere
    assert 45 not in got
    for _did, (_nl, _nk, t) in got.items():
        assert "cookie banner text" not in t


def test_line_filter_drops_first_occurrence_too(ray_session):
    """The defining contrast with paragraph_dedup: the FIRST copy of a
    too-frequent line is removed as well."""
    import ray.data as rd

    from geotrellis_ray.stages.dedup import line_frequency_filter

    docs = [(0, "dup line\nkeep zero"), (1, "dup line\nkeep one")]
    tab = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string())})
    got = {r["doc_id"]: r["text_filtered"]
           for r in line_frequency_filter(rd.from_arrow(tab), min_count=2).take_all()}
    assert got == {0: "keep zero", 1: "keep one"}


def test_line_filter_threshold(ray_session):
    """min_count=3 keeps a twice-repeated line."""
    import ray.data as rd

    from geotrellis_ray.stages.dedup import line_frequency_filter

    docs = [(0, "twice\na"), (1, "twice\nb"), (2, "thrice\nc"),
            (3, "thrice\nd"), (4, "thrice\ne")]
    tab = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string())})
    got = {r["doc_id"]: r["text_filtered"]
           for r in line_frequency_filter(rd.from_arrow(tab), min_count=3).take_all()}
    assert got == {0: "twice\na", 1: "twice\nb", 2: "c", 3: "d", 4: "e"}
