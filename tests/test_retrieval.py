"""BM25 retrieval (stages/retrieval.py, log-free rational-idf variant):
independent pandas brute oracle, block invariance, tie-break, edge cases."""

import numpy as np
import pyarrow as pa
import pytest


def _corpus():
    rng = np.random.default_rng(5)
    vocab = ["spark", "merge", "window", "table", "scan", "row", "agg", "fast"]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(4, 40))))
             for _ in range(300)]
    texts[7] = texts[3]  # exact dup -> identical score, doc_id tie-break
    return pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                     "text": pa.array(texts, pa.string())})


def _brute(tab, terms, k1=1.2, b=0.75, top_k=20):
    import re

    docs = tab.to_pandas()
    docs["dl"] = docs["text"].str.count(r"\S+")
    for i, t in enumerate(terms):
        docs[f"tf{i}"] = docs["text"].str.count(rf"\b{t}\b")
    n = float(len(docs))
    avgdl = float(docs["dl"].sum()) / n
    score = np.zeros(len(docs))
    for i in range(len(terms)):
        df = float((docs[f"tf{i}"] > 0).sum())
        wf = (n - df + 0.5) / (df + 0.5)
        tf = docs[f"tf{i}"].to_numpy().astype(np.float64)
        score = score + wf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * docs["dl"].to_numpy() / avgdl))
    docs["score"] = score
    docs["tf_total"] = sum(docs[f"tf{i}"] for i in range(len(terms)))
    out = docs[docs["tf_total"] > 0].sort_values(
        ["score", "doc_id"], ascending=[False, True]).head(top_k)
    return out[["doc_id", "dl", "tf_total"]].reset_index(drop=True)


def test_bm25_matches_brute(ray_session):
    import ray.data

    from geotrellis_ray.stages.retrieval import bm25_rank

    tab = _corpus()
    terms = ["spark", "merge", "window"]
    exp = _brute(tab, terms)
    for nblocks in (1, 7):
        got = (bm25_rank(ray.data.from_arrow(tab).repartition(nblocks), terms)
               .to_pandas().sort_values("rank").reset_index(drop=True))
        assert got["rank"].tolist() == list(range(1, len(exp) + 1))
        for col in ("doc_id", "dl", "tf_total"):
            assert got[col].tolist() == exp[col].tolist(), (col, nblocks)
    # the planted dup pair tie-broke by ascending doc_id
    ids = got["doc_id"].tolist()
    if 3 in ids and 7 in ids:
        assert ids.index(3) < ids.index(7)


def test_bm25_no_matches_and_bad_terms(ray_session):
    import ray.data

    from geotrellis_ray.stages.retrieval import bm25_rank

    tab = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["alpha beta", "gamma delta"], pa.string())})
    got = bm25_rank(ray.data.from_arrow(tab), ["zzz"]).to_pandas()
    assert len(got) == 0
    with pytest.raises(ValueError, match="alphanumeric"):
        bm25_rank(ray.data.from_arrow(tab), ["bad term!"])
