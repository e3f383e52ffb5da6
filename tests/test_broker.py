"""Cross-scene batching broker: coalescing semantics + planner parity."""

import threading

import numpy as np
import pytest

import jax.numpy as jnp

from boundplanner_tpu.parallel.broker import BatchBroker, register_planner_kernels


def test_coalesces_concurrent_calls():
    brk = BatchBroker(linger=0.05)
    brk.register("sq", lambda x: x * x)

    results = {}

    def worker(i):
        results[i] = brk.call("sq", np.full(3, float(i)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(6):
        np.testing.assert_allclose(results[i], np.full(3, float(i)) ** 2)
    assert brk.calls_served == 6
    assert brk.batches_run < 6  # at least some coalescing happened
    assert brk.coalesced_calls == 6 - brk.batches_run


def test_single_call_does_not_deadlock():
    brk = BatchBroker(linger=0.001)
    brk.register("neg", lambda x: -x)
    out = brk.call("neg", np.arange(4.0))
    np.testing.assert_allclose(out, -np.arange(4.0))
    assert brk.batches_run == 1


def test_brokered_planner_matches_direct():
    """The same scene planned with and without a broker gives identical
    via points and sets."""
    from boundplanner_tpu.planner import BoundPlanner

    obstacles = [
        [0.2, -1.0, -0.1, 1.0, 1.0, 0.0],
        [0.35, -0.25, 0.0, 0.55, -0.1, 0.45],
    ]
    kw = dict(
        e_p_max=0.5,
        obstacles=obstacles,
        workspace_max=[1.0, 0.38, 1.0],
        workspace_min=[-0.14, -1.0, 0.0],
        seed=0,
    )
    p0 = np.array([0.55, 0.0, 0.6])
    p1 = np.array([0.45, -0.4, 0.25])
    from scipy.spatial.transform import Rotation as R

    r0 = R.from_euler("XYZ", [0, 90, 0], degrees=True).as_matrix()

    direct = BoundPlanner(**kw)
    pv0, rv0, bp0, sets0 = direct.plan_convex_set_path(p0, p1, r0, r0)

    brk = BatchBroker(linger=0.0)
    register_planner_kernels(brk, max_set_size=20)
    brokered = BoundPlanner(**kw, broker=brk)
    pv1, rv1, bp1, sets1 = brokered.plan_convex_set_path(p0, p1, r0, r0)

    assert len(pv0) == len(pv1)
    for a, b in zip(pv0, pv1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)
    for (a0, b0), (a1, b1) in zip(sets0, sets1):
        np.testing.assert_allclose(a0, a1, atol=1e-8)
        np.testing.assert_allclose(b0, b1, atol=1e-8)
    assert brk.calls_served > 0


@pytest.mark.slow
def test_threaded_fleet_build():
    from boundplanner_tpu.config import MPCParams
    from boundplanner_tpu.parallel.fleet import build_fleet_threaded

    cfg = MPCParams(sqp_iters=2, qp_iters=5, line_search_steps=2)
    carry_b, q0_b, obs_b, brk = build_fleet_threaded(
        4, cfg, n_obstacles=2, seed=3, n_threads=4, linger=0.02
    )
    assert q0_b.shape == (4, 7)
    assert brk.calls_served > 0
    assert brk.coalesced_calls > 0  # threads actually shared batches
