"""convex_hull_stage (stages/overlay.py) vs a brute non-interior-point oracle."""
import numpy as np
import pyarrow as pa
import pytest

from geotrellis_ray.core.geom import convex_hull


def _boundary_oracle(P):
    """p is on the hull boundary iff some q has every r left-of-or-on p->q."""
    out = []
    for i, p in enumerate(P):
        for j, q in enumerate(P):
            if i == j or (q == p).all():
                continue
            r = np.delete(P, [i, j], axis=0)
            cr = (q[0] - p[0]) * (r[:, 1] - p[1]) - (q[1] - p[1]) * (r[:, 0] - p[0])
            if (cr >= 0).all():
                out.append(tuple(p))
                break
    return set(out)


def test_core_hull_collinear_modes():
    P = np.array([[0, 0], [2, 0], [1, 0], [2, 2], [0, 2], [1, 1], [0, 1]], float)
    assert convex_hull(P).tolist() == [[0, 0], [2, 0], [2, 2], [0, 2]]
    withc = convex_hull(P, include_collinear=True)
    assert [list(v) for v in withc] == [[0, 0], [1, 0], [2, 0], [2, 2], [0, 2], [0, 1]]


@pytest.mark.parametrize("nblocks", [1, 7])
def test_distributed_hull_matches_oracle(ray_session, nblocks):
    import ray.data as rd

    from geotrellis_ray.stages.overlay import convex_hull_stage

    rng = np.random.default_rng(17)
    P = rng.uniform(-10, 10, (120, 2))
    # plant an exact collinear run straddling the hull boundary
    t = np.linspace(0.0, 1.0, 9)[:, None]
    P = np.vstack([P, (1 - t) * np.array([[-15.0, -15.0]]) + t * np.array([[15.0, -15.0]])])
    tab = pa.table({"x": pa.array(P[:, 0]), "y": pa.array(P[:, 1])})
    got = convex_hull_stage(rd.from_arrow(tab).repartition(nblocks)).take_all()
    got_set = {(r["x"], r["y"]) for r in got}
    assert got_set == _boundary_oracle(P)
    # the ring is convex CCW (no right turns)
    ring = np.array([[r["x"], r["y"]] for r in got])
    n = len(ring)
    for i in range(n):
        a, b, c = ring[i], ring[(i + 1) % n], ring[(i + 2) % n]
        assert np.cross(b - a, c - a) >= 0
