"""cluster_eps (stages/cluster.py) vs a brute eps-graph connected-components
oracle, incl. chains crossing grid-cell boundaries."""
import numpy as np
import pyarrow as pa
import pytest


def _brute_components(P, eps):
    n = len(P)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if ((P[i] - P[j]) ** 2).sum() <= eps * eps:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    return [find(i) for i in range(n)]


@pytest.mark.parametrize("nblocks", [1, 6])
def test_cluster_eps_matches_brute(ray_session, nblocks):
    import ray.data as rd

    from geotrellis_ray.stages.cluster import cluster_eps

    rng = np.random.default_rng(33)
    # three dense blobs + a long chain (each link < eps, ends far apart —
    # single-linkage must connect it) + isolated points
    blobs = [rng.normal(c, 0.3, (40, 2)) for c in ((0, 0), (10, 0), (5, 9))]
    chain = np.stack([np.linspace(20, 28, 17), np.zeros(17)], axis=1)  # step 0.5
    iso = np.array([[50.0, 50.0], [-30.0, 7.0]])
    P = np.vstack(blobs + [chain, iso])
    eps = 0.9
    tab = pa.table({"pt_id": pa.array(range(len(P)), pa.int64()),
                    "x": pa.array(P[:, 0]), "y": pa.array(P[:, 1])})
    got = (cluster_eps(rd.from_arrow(tab).repartition(nblocks), eps)
           .to_pandas().sort_values("pt_id").reset_index(drop=True))
    brute = _brute_components(P, eps)
    # same partition: identical grouping (labels are min-ids on both sides)
    assert got["cluster_id"].tolist() == brute
    # the chain is ONE cluster despite spanning many eps-cells
    chain_ids = set(got["cluster_id"][120:137])
    assert len(chain_ids) == 1
    # isolated points label themselves
    assert got["cluster_id"].iloc[-1] == len(P) - 1
