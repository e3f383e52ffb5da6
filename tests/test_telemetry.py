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
