"""Batched min-plus device shortest path vs the host Dijkstra."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boundplanner_tpu.planner.device_search import (
    NO_EDGE, fleet_shortest_paths, roadmap_adjacency, shortest_path_device)
from boundplanner_tpu.planner.roadmap import Junction, SetRoadmap


def _random_roadmap(rng, n_junctions):
    """A SetRoadmap with random positive edge weights over a random
    connected topology (junction payloads are dummies — only the
    adjacency matters for search)."""
    rm = SetRoadmap(w_size=0.0, w_bias=0.0, c_fit=0.0)
    dummy = lambda: Junction(
        a=np.zeros((1, 3)), b=np.zeros(1), owners=(0, 0),
        anchor=np.zeros(3), via=np.zeros(4), fits=True,
    )
    for _ in range(n_junctions):
        rm.junctions.append(dummy())
        rm._adj.append({})
    # random spanning tree keeps it connected; extra random edges on top
    order = rng.permutation(n_junctions)
    for i in range(1, n_junctions):
        u, v = int(order[i]), int(order[rng.integers(0, i)])
        w = float(rng.uniform(0.1, 2.0))
        rm._adj[u][v] = w
        rm._adj[v][u] = w
    for _ in range(2 * n_junctions):
        u, v = rng.integers(0, n_junctions, 2)
        if u == v:
            continue
        w = float(rng.uniform(0.1, 2.0))
        rm._adj[int(u)][int(v)] = w
        rm._adj[int(v)][int(u)] = w
    return rm


def _path_cost(rm, path):
    return sum(rm._adj[u][v] for u, v in zip(path, path[1:]))


def test_matches_host_dijkstra(rng):
    for trial in range(10):
        n = int(rng.integers(4, 20))
        rm = _random_roadmap(rng, n)
        host = rm.shortest_path()
        adj = roadmap_adjacency(rm, 32)
        dist, path, reached = shortest_path_device(jnp.asarray(adj))
        assert bool(reached)
        dev = [int(x) for x in np.asarray(path) if x >= 0]
        assert dev[0] == 0 and dev[-1] == 1
        # every device edge must exist; total cost must match the optimum
        for u, v in zip(dev, dev[1:]):
            assert v in rm._adj[u]
        np.testing.assert_allclose(_path_cost(rm, dev), _path_cost(rm, host),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(dist), _path_cost(rm, host), rtol=1e-5)


def test_unreachable_reports(rng):
    rm = _random_roadmap(rng, 6)
    # cut node 1 off entirely
    for u in range(6):
        rm._adj[u].pop(1, None)
    rm._adj[1] = {}
    adj = roadmap_adjacency(rm, 16)
    _, path, reached = shortest_path_device(jnp.asarray(adj))
    assert not bool(reached)
    assert np.all(np.asarray(path) == -1)
    with pytest.raises(RuntimeError):
        fleet_shortest_paths([rm], n_pad=16)


def test_fleet_batched(rng):
    rms = [_random_roadmap(rng, int(rng.integers(4, 30))) for _ in range(8)]
    paths = fleet_shortest_paths(rms, n_pad=32)
    for rm, dev in zip(rms, paths):
        host = rm.shortest_path()
        np.testing.assert_allclose(_path_cost(rm, dev), _path_cost(rm, host),
                                   rtol=1e-5)


def test_planner_with_spath_broker_matches(rng):
    """A planner routed through the device search produces an equally
    valid plan (same via-point count and sets contracts)."""
    from boundplanner_tpu.parallel.broker import (BatchBroker,
                                                  register_planner_kernels)
    from boundplanner_tpu.planner import BoundPlanner
    from scipy.spatial.transform import Rotation as R

    obstacles = [[0.2, -1.0, -0.1, 1.0, 1.0, 0.0],
                 [0.35, -0.25, 0.0, 0.55, -0.1, 0.45]]
    kw = dict(e_p_max=0.5, obstacles=obstacles,
              workspace_max=[1.0, 0.38, 1.0], workspace_min=[-0.14, -1.0, 0.0])
    p0 = np.array([0.3, 0.3, 0.6])
    p1 = np.array([0.45, -0.4, 0.25])
    r0 = np.eye(3)
    r1 = R.from_euler("XYZ", [0, 90, 0], degrees=True).as_matrix()

    host = BoundPlanner(seed=0, **kw).plan_convex_set_path(
        p0.copy(), p1.copy(), r0, r1)
    brk = BatchBroker(linger=0.0)
    register_planner_kernels(brk, device_search=True)
    dev = BoundPlanner(seed=0, broker=brk, **kw).plan_convex_set_path(
        p0.copy(), p1.copy(), r0, r1)
    assert len(dev[0]) == len(host[0])
    np.testing.assert_allclose(np.asarray(dev[0]), np.asarray(host[0]),
                               atol=1e-5)
