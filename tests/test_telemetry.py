"""Telemetry recorder and phase timer unit tests."""

import numpy as np

from boundplanner_tpu.telemetry import MPCTickRecord, PhaseTimer, TelemetryRecorder


def make_record(t, success=True):
    return MPCTickRecord(
        t=t, t_comp=0.01, t_loop=0.012, t_overhead=0.002, cost=1.0,
        iterations=5, phi=0.1 * t, dphi=0.1, phi_max=1.0, sector=0,
        success=success, viol=0.0,
        e_p=np.zeros(3), e_r=np.zeros(3), p_ref=np.zeros(6), p=np.zeros(6),
        q=np.zeros(7),
    )


def test_recorder_arrays_and_summary(tmp_path):
    rec = TelemetryRecorder()
    for k in range(5):
        rec.record_tick(make_record(float(k), success=(k != 2)))
    rec.record_event("switch", sector=1)

    arrays = rec.arrays()
    assert arrays["phi"].shape == (5,)
    assert arrays["e_p"].shape == (5, 3)
    s = rec.summary()
    assert s["ticks"] == 5
    assert abs(s["fail_rate"] - 0.2) < 1e-9
    assert s["phi_final"] == 0.4

    out = tmp_path / "telemetry.json"
    rec.dump_json(out)
    assert out.exists() and out.read_text().startswith("{")


def test_phase_timer():
    pt = PhaseTimer()
    with pt.phase("solve"):
        pass
    with pt.phase("solve"):
        pass
    pt.add("prep", 0.5)
    assert pt.counts["solve"] == 2
    assert pt.acc["prep"] == 0.5
    assert "prep" in pt.report()


def test_mpc_node_records_ticks():
    import os
    import numpy as np

    from boundplanner_tpu.config import MPCParams
    from boundplanner_tpu.mpc.node import MPCNode

    q0 = np.array([0.0, 0.0, 0.0, -np.pi / 2, 0.0, np.pi / 2, 0.0])
    node = MPCNode(q0, params=MPCParams(sqp_iters=2, qp_iters=6, line_search_steps=2))
    node.step()
    node.step()
    assert len(node.telemetry.ticks) == 2
    s = node.telemetry.summary()
    assert s["ticks"] == 2
    assert np.isfinite(s["t_comp_mean"])


def test_cartesian_acc_option():
    """cartesian_acc=True reports a = J ddq + dJ dq; finite-difference of
    the velocity trajectory agrees (interior points)."""
    import jax.numpy as jnp
    from boundplanner_tpu.mpc.bound_mpc import _cartesian_acc
    from boundplanner_tpu.robot import kinematics

    rng = np.random.default_rng(3)
    q = rng.normal(size=(5, 7)) * 0.4
    dq = rng.normal(size=(5, 7)) * 0.2
    ddq = rng.normal(size=(5, 7)) * 0.1
    a = np.asarray(_cartesian_acc(jnp.asarray(q), jnp.asarray(dq), jnp.asarray(ddq)))
    assert a.shape == (5, 6)
    # finite-difference check on one state: d/dt (J dq) at fixed ddq=0
    eps = 1e-6
    j0 = np.asarray(kinematics.jacobian_fk(jnp.asarray(q[0])))
    jp = np.asarray(kinematics.jacobian_fk(jnp.asarray(q[0] + eps * dq[0])))
    fd = (jp - j0) / eps @ dq[0] + j0 @ ddq[0]
    np.testing.assert_allclose(a[0], fd, atol=1e-4)
