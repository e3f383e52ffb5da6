"""Full-pipeline acceptance test: plan through obstacles, track with MPC.

Compressed version of `examples/boundplanner_with_mpc_example.py`
(ref `boundplanner_with_mpc_example.py`): a smaller scene and a capped
tick budget keep the CPU runtime manageable while still exercising
planner -> hand-off -> receding-horizon tracking -> segment switching.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from boundplanner_tpu.mpc import MPCNode
from boundplanner_tpu.planner import BoundPlanner


@pytest.mark.slow
def test_plan_and_track():
    q0 = np.zeros(7)
    q0[3] = -np.pi / 2
    q0[5] = np.pi / 2
    node = MPCNode(q0)

    p0fk, _, _ = node.robot_model.forward_kinematics(q0, 0 * q0)
    p0 = p0fk[:3]
    r0 = R.from_rotvec(np.array(p0fk[3:])).as_matrix()
    p1 = np.array([0.45, -0.4, 0.25])
    r1 = R.from_euler("XYZ", [0, 90, 0], degrees=True).as_matrix()

    obstacles = [
        [0.2, -1.0, -0.1, 1.0, 1.0, 0.0],          # floor
        [0.35, -0.25, 0.0, 0.55, -0.1, 0.45],      # pillar in the way
    ]
    planner = BoundPlanner(
        e_p_max=0.5,
        obstacles=obstacles,
        workspace_max=[1.0, 0.38, 1.0],
        workspace_min=[-0.14, -1.0, 0.0],
        seed=0,
    )
    p_via, r_via, bp1_list, sets_via = planner.plan_convex_set_path(p0, p1, r0, r1)
    assert len(p_via) >= 2

    a_sets = [x[0] for x in sets_via]
    b_sets = [x[1] for x in sets_via]
    br1_list = [np.array([0.0, 0.0, 1.0])] * len(bp1_list)
    e_r_bound = [np.array([90, 90, 90, -90, -90, -90]) * np.pi / 180] * len(bp1_list)
    node.update_reference(
        p_via, r_via, bp1_list, br1_list, e_r_bound, a_sets, b_sets, obstacles
    )

    phis = []
    obs_orig = planner.obs_sets_orig
    ticks = 0
    while (
        float(node.mpc.phi_current[0]) < float(node.mpc.phi_max[0]) - 0.001
        and ticks < 60
    ):
        node.step()
        phis.append(float(node.mpc.phi_current[0]))
        # never inside an original obstacle
        for a, b in obs_orig:
            assert np.max(a @ node.p_lie[:3] - b) > -1e-5
        ticks += 1

    assert phis[-1] > float(node.mpc.phi_max[0]) - 0.02, "did not reach path end"
    goal_err = np.linalg.norm(node.p_lie[:3] - p1)
    assert goal_err < 0.02, f"final EE error {goal_err*1000:.1f} mm"
    assert sum(node.fails) <= 2
